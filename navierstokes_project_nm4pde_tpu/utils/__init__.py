from navierstokes_project_nm4pde_tpu.utils.tables import ConvergenceTable  # noqa: F401
from navierstokes_project_nm4pde_tpu.utils.timers import Timer, PhaseTimers  # noqa: F401
from navierstokes_project_nm4pde_tpu.utils.signal import strouhal_number  # noqa: F401
from navierstokes_project_nm4pde_tpu.utils.logging import pcout, is_main_process  # noqa: F401,E402
from navierstokes_project_nm4pde_tpu.utils.profiling import trace, annotate  # noqa: F401,E402

from navierstokes_project_nm4pde_tpu.io.vtu import (  # noqa: F401
    write_pvd,
    write_vtu,
    write_vtu_with_pvtu_record,
)
from navierstokes_project_nm4pde_tpu.io.csvlog import CSVLogger  # noqa: F401
from navierstokes_project_nm4pde_tpu.io.checkpoint import (  # noqa: F401
    load_checkpoint,
    save_checkpoint,
)

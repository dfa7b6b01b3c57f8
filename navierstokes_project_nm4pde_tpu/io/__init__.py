from navierstokes_project_nm4pde_tpu.io.vtu import write_vtu, write_pvd  # noqa: F401
from navierstokes_project_nm4pde_tpu.io.csvlog import CSVLogger  # noqa: F401
from navierstokes_project_nm4pde_tpu.io.checkpoint import (  # noqa: F401
    load_checkpoint,
    save_checkpoint,
)

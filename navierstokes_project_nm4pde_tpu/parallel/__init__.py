from navierstokes_project_nm4pde_tpu.parallel.sharding import (  # noqa: F401
    cell_partitioning,
    make_device_mesh,
    shard_solver,
)
from navierstokes_project_nm4pde_tpu.parallel.ensemble import run_ensemble  # noqa: F401

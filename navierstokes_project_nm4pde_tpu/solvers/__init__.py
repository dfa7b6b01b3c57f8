from navierstokes_project_nm4pde_tpu.solvers.krylov import (  # noqa: F401
    cg,
    cg_fixed,
    fgmres,
    gcr_recycled,
    gmres_fixed,
)

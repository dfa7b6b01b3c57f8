from navierstokes_project_nm4pde_tpu.precond.blocks import (  # noqa: F401
    PRECOND_KINDS,
    PrecondState,
    apply_precond,
    build_precond_state,
)

from navierstokes_project_nm4pde_tpu.ops.operators import (  # noqa: F401
    NSOperator,
    build_operator,
)

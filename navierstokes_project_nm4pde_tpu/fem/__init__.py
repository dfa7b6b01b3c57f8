from navierstokes_project_nm4pde_tpu.fem.reference import (  # noqa: F401
    TET_EDGES,
    TRI_EDGES,
    p1_shape,
    p1_grad,
    p2_shape,
    p2_grad,
    n_p2_nodes,
)
from navierstokes_project_nm4pde_tpu.fem.quadrature import (  # noqa: F401
    cell_rule,
    face_rule,
)

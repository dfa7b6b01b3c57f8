from navierstokes_project_nm4pde_tpu.mesh.core import Mesh  # noqa: F401
from navierstokes_project_nm4pde_tpu.mesh.generators import (  # noqa: F401
    cube_mesh,
    cylinder_channel_2d,
    cylinder_duct_3d,
    rectangle_mesh,
)
from navierstokes_project_nm4pde_tpu.mesh.msh_io import read_msh, write_msh  # noqa: F401

from navierstokes_project_nm4pde_tpu.models.base import (  # noqa: F401
    NavierStokesSolver,
    ProblemSpec,
    State,
    StepDiagnostics,
)
from navierstokes_project_nm4pde_tpu.models.cylinder2d import Cylinder2DProblem  # noqa: F401
from navierstokes_project_nm4pde_tpu.models.cylinder3d import Cylinder3DProblem  # noqa: F401
from navierstokes_project_nm4pde_tpu.models.ethier_steinman import (  # noqa: F401
    EthierSteinmanProblem,
)

"""DFG 3D flow-past-a-cylinder benchmark problem.

Mirrors the reference's 3D setup (ref: include/NavierStokes3D.hpp:17-81,
src/main3D.cpp:31-38): duct 2.5 x 0.41 x 0.41, cylinder r=0.05 at x=0.5,
inlet profile

  case 2 (default): 16 u_m y z (H-y)(H-z) / H^4
  case 3:           the same times sin(pi t / 8)

with u_m = 9.0, H = 0.41; mean velocity 4 u_m / 9 (case 2).  Drag/lift use
the reference's tangent-derivative surface formula and the 3D coefficient
normalisation 2F/(rho U^2 D H) (ref: src/NavierStokes3D.cpp:797-838).
"""

from __future__ import annotations

import jax.numpy as jnp

from navierstokes_project_nm4pde_tpu.models.base import ProblemSpec

H = 0.41
U_M = 9.0
NU = 1e-3
DIAMETER = 0.1
PROBE_A = (0.45, 0.2, 0.205)
PROBE_B = (0.55, 0.2, 0.205)


def _inlet_profile(test_case: int, u_m: float):
    def g(x, t):
        y, z = x[:, 1], x[:, 2]
        para = 16.0 * u_m * y * z * (H - y) * (H - z) / (H**4)
        if test_case == 1:
            ux = jnp.zeros_like(y)
        elif test_case == 3:
            ux = para * jnp.sin(jnp.pi * t / 8.0)
        else:
            ux = para
        zero = jnp.zeros_like(ux)
        return jnp.stack([ux, zero, zero], axis=1)

    return g


def _mean_velocity(test_case: int, u_m: float):
    def U(t):
        if test_case == 1:
            return jnp.asarray(0.0)
        if test_case == 3:
            return 4.0 * u_m * jnp.sin(t * jnp.pi / 8.0) / 9.0
        return jnp.asarray(4.0 * u_m / 9.0)

    return U


def _zero(x, t):
    return jnp.zeros_like(x)


def Cylinder3DProblem(
    test_case: int = 2, nu: float = NU, u_m: float = U_M
) -> ProblemSpec:
    """u_m: peak inlet velocity.  The reference hardcodes 9.0
    (include/NavierStokes3D.hpp); u_m=0.45 gives the published DFG 3D-1Z
    steady case at Re=20 (Schaefer-Turek), used for physics validation."""
    return ProblemSpec(
        dim=3,
        nu=nu,
        dirichlet={
            0: _inlet_profile(test_case, u_m),
            2: _zero,
            3: _zero,
        },
        obstacle_tag=3,
        probe_points=(PROBE_A, PROBE_B),
        mean_velocity=_mean_velocity(test_case, u_m),
        diameter=DIAMETER,
        span=H,
    )

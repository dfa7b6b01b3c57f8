"""DFG 2D flow-past-a-cylinder benchmark problem.

Mirrors the reference's 2D setup: channel 2.2 x 0.41, cylinder r=0.05 at
(0.2, 0.2), P2-P1, nu=1e-3, parabolic inlet with three test cases
(ref: include/NavierStokes2D.hpp:18-81, src/main2D.cpp:14-22):

  case 1: zero inflow
  case 2: 4 u_m y (H-y) sin(pi t / 8) / H^2   (time-ramped, the default)
  case 3: 4 u_m y (H-y) / H^2                 (steady)
  case 4: steady profile with the CORRECT constant mean velocity (new):
          the DFG 2D-2/2D-3 configuration for validation against published
          Schaefer-Turek values (not a reference case).

with u_m = 1.5 (overridable for Reynolds sweeps: Re = (2/3) u_m D / nu),
H = 0.41.  For cases 1-3 `mean_velocity` reproduces the reference's
`getMeanVelocity` switch verbatim -- including its case-2/3 swap of the
sin factor (ref: include/NavierStokes2D.hpp:64-75) -- because the drag/lift
coefficient normalisation must match for benchmark parity.  Case 4 uses the
physically correct U = 2 u_m / 3 so c_d/c_l compare against the DFG tables.

Boundary tags: 0=inlet (Dirichlet inlet profile), 1=outlet (natural),
2=walls (no slip), 3=cylinder (no slip + force integration)
(ref: mesh/Cylinder2D.geo:40-44, src/NavierStokes2D.cpp:332-352).
"""

from __future__ import annotations

import jax.numpy as jnp

from navierstokes_project_nm4pde_tpu.models.base import ProblemSpec

H = 0.41
U_M = 1.5
NU = 1e-3
DIAMETER = 0.1
PROBE_A = (0.45, 0.2)
PROBE_B = (0.55, 0.2)


def _inlet_profile(test_case: int, u_m: float):
    def g(x, t):
        y = x[:, 1]
        para = 4.0 * u_m * y * (H - y) / (H * H)
        if test_case == 1:
            ux = jnp.zeros_like(y)
        elif test_case == 2:
            ux = para * jnp.sin(jnp.pi * t / 8.0)
        else:  # 3 and 4: steady
            ux = para
        return jnp.stack([ux, jnp.zeros_like(ux)], axis=1)

    return g


def _mean_velocity(test_case: int, u_m: float):
    def U(t):
        if test_case == 1:
            return jnp.asarray(0.0)
        if test_case == 3:
            # reference quirk: steady inlet, but sin-ramped normalisation
            # (include/NavierStokes2D.hpp:64-75 swaps cases 2 and 3)
            return 2.0 * u_m * jnp.sin(t * jnp.pi / 8.0) / 3.0
        if test_case == 4:
            return jnp.asarray(2.0 * u_m / 3.0)
        return jnp.asarray(2.0 * u_m / 3.0)

    return U


def _zero(x, t):
    return jnp.zeros_like(x)


def Cylinder2DProblem(
    test_case: int = 2, nu: float = NU, u_m: float = U_M
) -> ProblemSpec:
    return ProblemSpec(
        dim=2,
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
    )

"""Ethier-Steinman manufactured solution on the cube [-1, 1]^3.

Exact unsteady Navier-Stokes solution with a = pi/4, b = pi/2, nu = 1e-2
(ref: include/Convergence3D.hpp:51-148):

  u1 = -a e^{-nu b^2 t} (e^{ax} sin(ay+bz) + e^{az} cos(ax+by))
  u2 = -a e^{-nu b^2 t} (e^{ay} sin(az+bx) + e^{ax} cos(ay+bz))
  u3 = -a e^{-nu b^2 t} (e^{az} sin(ax+by) + e^{ay} cos(az+bx))
  p  = -a^2/2 e^{-2 nu b^2 t} (2 sin(ax+by)cos(az+bx)e^{a(y+z)}
       + 2 sin(ay+bz)cos(ax+by)e^{a(x+z)} + 2 sin(az+bx)cos(ay+bz)e^{a(x+y)}
       + e^{2ax} + e^{2ay} + e^{2az})

Boundary conditions mirror the convergence solver: Dirichlet = exact velocity
on tags {0,1,2,4,5}, genuine Neumann h = nu du/dn - p n on tag 3
(ref: src/Convergence3D.cpp:303-380).  The velocity gradient (for h and for
H1 error norms) comes from `jax.jacfwd` of the exact velocity rather than
hand-copied derivative formulas.

Note on the Neumann face: the reference's code comment says tag 3 is y=-1,
but its hand-written h formulas equal nu*du/dy - p*e_y, i.e. the outward
normal (0, +1, 0) -- the y=+1 face.  Our cube generator tags y=+1 as 3 and
h is computed from the exact solution with the true outward normal, which
reproduces the reference's formulas.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from navierstokes_project_nm4pde_tpu.models.base import ProblemSpec

A = jnp.pi / 4.0
B = jnp.pi / 2.0
NU = 1e-2


def exact_velocity(x, t):
    """x: [..., 3] -> [..., 3]."""
    a, b = A, B
    decay = jnp.exp(-NU * b * b * t)
    X, Y, Z = x[..., 0], x[..., 1], x[..., 2]
    u1 = -a * decay * (jnp.exp(a * X) * jnp.sin(a * Y + b * Z)
                       + jnp.exp(a * Z) * jnp.cos(a * X + b * Y))
    u2 = -a * decay * (jnp.exp(a * Y) * jnp.sin(a * Z + b * X)
                       + jnp.exp(a * X) * jnp.cos(a * Y + b * Z))
    u3 = -a * decay * (jnp.exp(a * Z) * jnp.sin(a * X + b * Y)
                       + jnp.exp(a * Y) * jnp.cos(a * Z + b * X))
    return jnp.stack([u1, u2, u3], axis=-1)


def exact_pressure(x, t):
    a, b = A, B
    decay2 = jnp.exp(-2.0 * NU * b * b * t)
    X, Y, Z = x[..., 0], x[..., 1], x[..., 2]
    t1 = 2.0 * jnp.sin(a * X + b * Y) * jnp.cos(a * Z + b * X) * jnp.exp(a * (Y + Z))
    t2 = 2.0 * jnp.sin(a * Y + b * Z) * jnp.cos(a * X + b * Y) * jnp.exp(a * (X + Z))
    t3 = 2.0 * jnp.sin(a * Z + b * X) * jnp.cos(a * Y + b * Z) * jnp.exp(a * (X + Y))
    t4 = jnp.exp(2 * a * X) + jnp.exp(2 * a * Y) + jnp.exp(2 * a * Z)
    return -(a * a) / 2.0 * decay2 * (t1 + t2 + t3 + t4)


def exact_velocity_gradient(x, t):
    """[..., 3, 3] with entries du_c/dx_d, via forward-mode autodiff."""
    flat = x.reshape(-1, 3)
    jac = jax.vmap(jax.jacfwd(lambda q: exact_velocity(q, t)))(flat)
    return jac.reshape(x.shape[:-1] + (3, 3))


def neumann_h(x, t, normal=(0.0, 1.0, 0.0)):
    """h = nu (grad u) n - p n with the outward normal of the tag-3 face."""
    n = jnp.asarray(normal)
    g = exact_velocity_gradient(x, t)
    p = exact_pressure(x, t)
    return NU * jnp.einsum("...cd,d->...c", g, n) - p[..., None] * n


def EthierSteinmanProblem() -> ProblemSpec:
    def g_exact(x, t):
        return exact_velocity(x, t)

    return ProblemSpec(
        dim=3,
        nu=NU,
        dirichlet={tag: g_exact for tag in (0, 1, 2, 4, 5)},
        neumann_tag=3,
        neumann_value=neumann_h,
        u0=lambda x: exact_velocity(x, 0.0),
        p0=lambda x: exact_pressure(x, 0.0),
    )

"""Krylov solver tests on manufactured SPD / nonsymmetric / saddle systems."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from navierstokes_project_nm4pde_tpu.solvers import cg, cg_fixed, fgmres, gmres_fixed


def make_spd(n, cond=100.0, seed=0):
    rng = np.random.default_rng(seed)
    Q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    d = np.geomspace(1.0, cond, n)
    return Q @ np.diag(d) @ Q.T


def test_cg_spd():
    n = 80
    A = make_spd(n)
    rng = np.random.default_rng(1)
    xex = rng.normal(size=n)
    b = A @ xex
    Aj = jnp.asarray(A)
    x, info = cg(lambda v: Aj @ v, jnp.asarray(b), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(x), xex, rtol=1e-6, atol=1e-7)
    assert int(info.iters) <= n


def test_cg_jacobi_preconditioned():
    n = 80
    A = make_spd(n, cond=1e4)
    A += np.diag(np.linspace(1, 50, n))
    rng = np.random.default_rng(2)
    b = rng.normal(size=n)
    Aj = jnp.asarray(A)
    d = jnp.asarray(1.0 / np.diag(A))
    x_p, info_p = cg(lambda v: Aj @ v, jnp.asarray(b), M=lambda v: d * v, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(Aj @ x_p), b, atol=1e-7)


def test_fgmres_nonsymmetric():
    n = 60
    rng = np.random.default_rng(3)
    A = np.eye(n) * 4 + 0.5 * rng.normal(size=(n, n))
    xex = rng.normal(size=n)
    b = A @ xex
    Aj = jnp.asarray(A)
    x, info = fgmres(lambda v: Aj @ v, jnp.asarray(b), rtol=1e-10, restart=30)
    np.testing.assert_allclose(np.asarray(x), xex, rtol=1e-6, atol=1e-8)


def test_fgmres_aux_linear_accumulation():
    """aux=True: A returning (A v, P v) for a linear P yields aux_x = P x
    across restarts and with a nonzero initial guess (the projection
    stepper's divergence-from-Krylov-gathers contract)."""
    n = 80
    rng = np.random.default_rng(9)
    A = np.eye(n) * 4 + 0.4 * rng.normal(size=(n, n))
    P = rng.normal(size=(2 * n, n))  # any linear map (stand-in for gather)
    xex = rng.normal(size=n)
    b = A @ xex
    Aj, Pj = jnp.asarray(A), jnp.asarray(P)

    def Aop(v):
        return Aj @ v, Pj @ v

    # small restart forces multiple cycles through the aux accumulator
    x, info, aux = fgmres(Aop, jnp.asarray(b), rtol=1e-10, restart=7,
                          maxiter=200, aux=True)
    np.testing.assert_allclose(np.asarray(x), xex, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(aux), P @ np.asarray(x), rtol=1e-5, atol=1e-8
    )
    # nonzero x0: aux must include P x0 from the residual apply
    x0 = jnp.asarray(rng.normal(size=n))
    x, info, aux = fgmres(Aop, jnp.asarray(b), x0=x0, rtol=1e-10, restart=7,
                          maxiter=200, aux=True)
    np.testing.assert_allclose(
        np.asarray(aux), P @ np.asarray(x), rtol=1e-5, atol=1e-8
    )


def test_fgmres_restarts_and_info():
    n = 120
    A = make_spd(n, cond=500.0, seed=4)
    rng = np.random.default_rng(4)
    b = rng.normal(size=n)
    Aj = jnp.asarray(A)
    x, info = fgmres(lambda v: Aj @ v, jnp.asarray(b), rtol=1e-8, restart=20, maxiter=400)
    r = np.linalg.norm(b - A @ np.asarray(x)) / np.linalg.norm(b)
    assert r < 1e-7
    assert int(info.iters) > 20  # must have restarted


def test_fgmres_with_nonstationary_preconditioner():
    """Flexible GMRES must converge when M itself is an inner Krylov solve."""
    n = 100
    A = make_spd(n, cond=1e3, seed=5)
    rng = np.random.default_rng(5)
    b = rng.normal(size=n)
    Aj = jnp.asarray(A)
    d = jnp.asarray(1.0 / np.diag(A))

    def M(v):
        return cg_fixed(lambda w: Aj @ w, v, lambda w: d * w, iters=5)

    x, info = fgmres(lambda v: Aj @ v, jnp.asarray(b), M=M, rtol=1e-8, restart=40)
    r = np.linalg.norm(b - A @ np.asarray(x)) / np.linalg.norm(b)
    assert r < 1e-7
    # inner acceleration should cut outer iterations well below unpreconditioned
    _, info0 = fgmres(lambda v: Aj @ v, jnp.asarray(b), rtol=1e-8, restart=40)
    assert int(info.iters) < int(info0.iters)


def test_gmres_fixed_reduces_residual():
    n = 90
    rng = np.random.default_rng(6)
    A = np.eye(n) * 5 + rng.normal(size=(n, n)) * 0.3
    b = rng.normal(size=n)
    Aj = jnp.asarray(A)
    d = jnp.asarray(1.0 / np.diag(A))
    x = gmres_fixed(lambda v: Aj @ v, jnp.asarray(b), lambda v: d * v, iters=10)
    r = np.linalg.norm(b - A @ np.asarray(x)) / np.linalg.norm(b)
    assert r < 1e-2


def test_cg_fixed_matches_cg():
    n = 50
    A = make_spd(n, cond=50.0, seed=7)
    rng = np.random.default_rng(7)
    b = rng.normal(size=n)
    Aj = jnp.asarray(A)
    x = cg_fixed(lambda v: Aj @ v, jnp.asarray(b), lambda v: v, iters=n)
    np.testing.assert_allclose(np.asarray(Aj @ x), b, atol=1e-6)


def test_solvers_jittable():
    n = 40
    A = make_spd(n, seed=8)
    Aj = jnp.asarray(A)
    b = jnp.asarray(np.random.default_rng(8).normal(size=n))

    @jax.jit
    def solve(b):
        x, info = fgmres(lambda v: Aj @ v, b, rtol=1e-8, restart=20)
        return x, info.iters

    x, iters = solve(b)
    r = np.linalg.norm(np.asarray(b) - A @ np.asarray(x))
    assert r < 1e-6 * np.linalg.norm(np.asarray(b)) * 10


# ----------------------------------------------------------------------
# Recycled-block GCR
# ----------------------------------------------------------------------
def _gcr_system(n=90, seed=7):
    """Diagonally dominant nonsymmetric system (an F-like operator:
    mass-dominated + skew perturbation), Jacobi preconditioner."""
    rng = np.random.default_rng(seed)
    A = np.diag(np.linspace(2.0, 5.0, n)) + 0.15 * rng.normal(size=(n, n))
    d = jnp.asarray(1.0 / np.diag(A))
    Aj = jnp.asarray(A)
    A_block = lambda V: Aj @ V  # noqa: E731
    M = lambda V: d[:, None] * V  # noqa: E731
    return A, A_block, M


def test_gcr_recycled_zero_pool_converges():
    from navierstokes_project_nm4pde_tpu.solvers import gcr_recycled

    n = 90
    A, A_block, M = _gcr_system(n)
    rng = np.random.default_rng(11)
    b = jnp.asarray(rng.normal(size=n))
    pool = jnp.zeros((4, n))
    x, info, D = gcr_recycled(
        A_block, b, M, pool, rtol=1e-8, max_narrow=40
    )
    true_res = np.linalg.norm(A @ np.asarray(x) - np.asarray(b))
    assert true_res <= 1.1e-8 * np.linalg.norm(np.asarray(b))
    assert D.shape == (1 + 4 + 40, n)


def test_gcr_recycled_pool_spans_solution():
    """A pool containing the solution direction converges in the wide
    round alone (iters == 1: zero narrow rounds + the fused wide round)."""
    from navierstokes_project_nm4pde_tpu.solvers import gcr_recycled

    n = 90
    A, A_block, M = _gcr_system(n)
    rng = np.random.default_rng(12)
    xex = rng.normal(size=n)
    b = jnp.asarray(A @ xex)
    pool = jnp.zeros((3, n)).at[1].set(jnp.asarray(xex) * 3.7)
    x, info, _ = gcr_recycled(
        A_block, b, M, pool, rtol=1e-6, max_narrow=10
    )
    assert int(info.iters) == 1
    np.testing.assert_allclose(np.asarray(x), xex, rtol=1e-5, atol=1e-6)


def test_gcr_recycled_matches_fgmres_solution():
    """Same system, same tolerance: gcr_recycled and fgmres agree to the
    tolerance (both solve the SAME exact operator -- recycling must not
    change what is being solved)."""
    from navierstokes_project_nm4pde_tpu.solvers import gcr_recycled

    n = 90
    A, A_block, M = _gcr_system(n)
    rng = np.random.default_rng(13)
    b = jnp.asarray(rng.normal(size=n))
    pool = jnp.asarray(rng.normal(size=(4, n)))  # arbitrary recycled dirs
    x_g, info_g, _ = gcr_recycled(
        A_block, b, M, pool, rtol=1e-9, max_narrow=40
    )
    x_f, _ = fgmres(
        lambda v: A_block(v[:, None]).reshape(-1), b,
        M=lambda v: M(v[:, None]).reshape(-1), rtol=1e-9, restart=40,
    )
    np.testing.assert_allclose(
        np.asarray(x_g), np.asarray(x_f), rtol=1e-6, atol=1e-7
    )


def test_gcr_recycled_abs_tolerance():
    from navierstokes_project_nm4pde_tpu.solvers import gcr_recycled

    n = 60
    A, A_block, M = _gcr_system(n, seed=21)
    rng = np.random.default_rng(22)
    b = jnp.asarray(rng.normal(size=n))
    target = 1e-7 * float(jnp.linalg.norm(b))
    x, info, _ = gcr_recycled(
        A_block, b, M, jnp.zeros((2, n)),
        rtol=target, atol=target, tol_mode="abs", max_narrow=40,
    )
    true_res = np.linalg.norm(A @ np.asarray(x) - np.asarray(b))
    assert true_res <= 1.5 * target


def test_fgmres_return_resid_is_true_residual():
    from navierstokes_project_nm4pde_tpu.solvers.krylov import fgmres as _fg

    n = 50
    A = make_spd(n, cond=50.0, seed=31) + 0.1 * np.eye(n)
    Aj = jnp.asarray(A)
    rng = np.random.default_rng(32)
    b = jnp.asarray(rng.normal(size=n))
    x, info, r = _fg(
        lambda v: Aj @ v, b, rtol=1e-4, restart=10, maxiter=40,
        return_resid=True,
    )
    np.testing.assert_allclose(
        np.asarray(r), np.asarray(b) - A @ np.asarray(x),
        rtol=1e-6, atol=1e-9,
    )


def test_ls_warmstart_exact_in_span_and_guards():
    from navierstokes_project_nm4pde_tpu.solvers.krylov import ls_warmstart

    n, k = 80, 3
    A = make_spd(n, cond=30.0, seed=41)
    rng = np.random.default_rng(42)
    D = rng.normal(size=(k, n))
    Y = D @ A.T  # images Y[i] = A D[i]
    c_true = np.array([0.3, -1.2, 0.7])
    r0 = jnp.asarray(c_true @ Y)  # r0 in span(Y)
    x0, r_new = ls_warmstart(jnp.asarray(D), jnp.asarray(Y), r0)
    # projection recovers the exact combination: residual ~ 0 and
    # A x0 ~ r0
    assert float(jnp.linalg.norm(r_new)) < 1e-6 * float(jnp.linalg.norm(r0))
    np.testing.assert_allclose(
        A @ np.asarray(x0), np.asarray(r0), rtol=1e-5, atol=1e-8
    )
    # zero pool: exact no-op
    z = jnp.zeros((k, n))
    x0z, rz = ls_warmstart(z, z, r0)
    assert float(jnp.linalg.norm(x0z)) == 0.0
    np.testing.assert_array_equal(np.asarray(rz), np.asarray(r0))
    # adversarially wrong images (guard path): projection must not grow
    # the residual
    Ybad = rng.normal(size=(k, n)) * 100.0
    x0b, rb = ls_warmstart(jnp.asarray(D), jnp.asarray(Ybad), r0)
    assert float(jnp.linalg.norm(rb)) <= float(jnp.linalg.norm(r0)) * (1 + 1e-6)

"""Unit tests for P1/P2 shape functions and simplex quadrature.

The reference has no tests at all (SURVEY.md section 4); these validate the
foundations the way deal.II validates FE_SimplexP internally: Kronecker-delta
property, partition of unity, gradient consistency, quadrature exactness.
"""

import numpy as np
import pytest

from navierstokes_project_nm4pde_tpu.fem import quadrature as quad
from navierstokes_project_nm4pde_tpu.fem import reference as ref


@pytest.mark.parametrize("dim", [2, 3])
def test_p2_kronecker_delta(dim):
    nodes = ref.p2_node_ref_coords(dim)
    vals = ref.p2_shape(nodes, dim)
    np.testing.assert_allclose(vals, np.eye(ref.n_p2_nodes(dim)), atol=1e-13)


@pytest.mark.parametrize("dim", [2, 3])
def test_p1_kronecker_delta(dim):
    nodes = ref.p2_node_ref_coords(dim)[: dim + 1]
    vals = ref.p1_shape(nodes, dim)
    np.testing.assert_allclose(vals, np.eye(dim + 1), atol=1e-13)


@pytest.mark.parametrize("dim", [2, 3])
def test_partition_of_unity(dim):
    rng = np.random.default_rng(0)
    pts = rng.dirichlet(np.ones(dim + 1), size=20)[:, 1:]
    np.testing.assert_allclose(ref.p2_shape(pts, dim).sum(axis=1), 1.0, atol=1e-12)
    np.testing.assert_allclose(ref.p1_shape(pts, dim).sum(axis=1), 1.0, atol=1e-12)
    np.testing.assert_allclose(
        ref.p2_grad(pts, dim).sum(axis=1), 0.0, atol=1e-12
    )


@pytest.mark.parametrize("dim", [2, 3])
def test_p2_gradients_finite_difference(dim):
    rng = np.random.default_rng(1)
    pts = rng.dirichlet(np.ones(dim + 1) * 3, size=5)[:, 1:]
    g = ref.p2_grad(pts, dim)
    eps = 1e-6
    for d in range(dim):
        dp = pts.copy()
        dp[:, d] += eps
        dm = pts.copy()
        dm[:, d] -= eps
        fd = (ref.p2_shape(dp, dim) - ref.p2_shape(dm, dim)) / (2 * eps)
        np.testing.assert_allclose(g[:, :, d], fd, atol=1e-8)


@pytest.mark.parametrize("dim,degree", [(2, 1), (2, 2), (2, 4), (2, 5), (3, 1), (3, 2), (3, 5)])
def test_cell_rule_exactness(dim, degree):
    pts, w = quad.cell_rule(dim, degree)
    vol = 0.5 if dim == 2 else 1.0 / 6.0
    np.testing.assert_allclose(w.sum(), vol, rtol=1e-13)
    # Exact integration of monomials x^a y^b (z^c) with a+b+c <= degree.
    # On the reference simplex: int x^a y^b z^c = a! b! c! / (a+b+c+dim)!
    from math import factorial
    from itertools import product

    for powers in product(range(degree + 1), repeat=dim):
        if sum(powers) > degree:
            continue
        approx = np.sum(w * np.prod(pts ** np.array(powers), axis=1))
        num = np.prod([factorial(p) for p in powers])
        exact = num / factorial(sum(powers) + dim)
        np.testing.assert_allclose(approx, exact, rtol=1e-12, atol=1e-15, err_msg=f"powers={powers}")


def test_face_rules():
    # 2D facet = interval, 3D facet = triangle.
    pts, w = quad.face_rule(2, 5)
    np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-13)
    np.testing.assert_allclose(np.sum(w * pts[:, 0] ** 4), 1 / 5, rtol=1e-12)
    pts, w = quad.face_rule(3, 5)
    np.testing.assert_allclose(w.sum(), 0.5, rtol=1e-13)


@pytest.mark.parametrize("dim", [2, 3])
def test_p2_mass_matrix_row_sums(dim):
    """Rows of the reference-cell P2 mass matrix must sum to int N_i."""
    pts, w = quad.cell_rule(dim, 5)
    phi = ref.p2_shape(pts, dim)  # [q, n]
    M = np.einsum("q,qi,qj->ij", w, phi, phi)
    row = M.sum(axis=1)
    int_phi = np.einsum("q,qi->i", w, phi)
    np.testing.assert_allclose(row, int_phi, atol=1e-14)
    vol = 0.5 if dim == 2 else 1 / 6
    np.testing.assert_allclose(M.sum(), vol, rtol=1e-12)

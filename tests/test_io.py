"""I/O layer: VTU export, CSV logs, checkpoint round-trip, tables, signal."""

import numpy as np

from navierstokes_project_nm4pde_tpu.fem.space import build_taylor_hood
from navierstokes_project_nm4pde_tpu.io import (
    CSVLogger,
    load_checkpoint,
    save_checkpoint,
    write_pvd,
    write_vtu,
)
from navierstokes_project_nm4pde_tpu.mesh import cube_mesh, rectangle_mesh
from navierstokes_project_nm4pde_tpu.utils import ConvergenceTable, strouhal_number


def test_vtu_2d(tmp_path):
    space = build_taylor_hood(rectangle_mesh(3, 2))
    u = np.random.default_rng(0).normal(size=(space.n_unodes, 2))
    p = np.random.default_rng(1).normal(size=space.n_pnodes)
    path = str(tmp_path / "out.vtu")
    write_vtu(path, space, u, p, partitioning=np.zeros(space.mesh.n_cells))
    text = open(path).read()
    assert "UnstructuredGrid" in text and "velocity" in text
    write_pvd(str(tmp_path / "series.pvd"), [(0.0, path), (0.1, path)])
    assert "Collection" in open(tmp_path / "series.pvd").read()


def test_vtu_3d(tmp_path):
    space = build_taylor_hood(cube_mesh(2))
    u = np.zeros((space.n_unodes, 3))
    p = np.zeros(space.n_pnodes)
    write_vtu(str(tmp_path / "out3d.vtu"), space, u, p)
    assert (tmp_path / "out3d.vtu").exists()


def test_csv_logger(tmp_path):
    log = CSVLogger(str(tmp_path))
    log.log_gmres([0.01, 0.02], [10, 20], [5, 6])
    log.log_coefficients([1, 2], [3.1, 3.2], [0.1, 0.2])
    log.log_convergence([0.8, 0.4], [1e-2, 1e-3], [1e-1, 2e-2])
    log.log_forces("forces_results_2D_2case.csv", [0.01], [1.0], [0.5], [3.0], [1.0])
    assert open(tmp_path / "gmres.csv").read().startswith("0.01,10,5")
    assert "h,eL2,eH1" in open(tmp_path / "convergence.csv").read()
    assert "Coeff Drag" in open(tmp_path / "forces_results_2D_2case.csv").read()


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    from navierstokes_project_nm4pde_tpu.models.base import State

    st = State(
        u=jnp.ones((10, 2)), p=jnp.zeros(4), t=jnp.asarray(0.5),
        step=jnp.asarray(50, jnp.int32),
    )
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, st, meta={"nu": 1e-3})
    st2 = load_checkpoint(path, dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(st2.u), 1.0)
    assert float(st2.t) == 0.5 and int(st2.step) == 50


def test_convergence_table():
    t = ConvergenceTable()
    t.add_row(0.8, L2=1.0, H1=2.0)
    t.add_row(0.4, L2=0.125, H1=0.5)
    r = t.rates()
    np.testing.assert_allclose(r["L2"], [3.0])
    np.testing.assert_allclose(r["H1"], [2.0])
    assert "rate" in t.format()


def test_strouhal():
    dt = 0.01
    t = np.arange(4000) * dt
    f0 = 0.3 / 0.1  # St=0.3 with D=0.1, U=1
    lift = np.sin(2 * np.pi * f0 * t) + 0.1 * np.cos(2 * np.pi * 0.5 * t)
    st = strouhal_number(lift, dt)
    assert abs(st - 0.3) < 0.02


def test_checkpoint_orbax_roundtrip(tmp_path):
    import jax.numpy as jnp
    import pytest

    from navierstokes_project_nm4pde_tpu.io.checkpoint import (
        load_checkpoint_orbax,
        save_checkpoint_orbax,
    )
    from navierstokes_project_nm4pde_tpu.models.base import State

    try:
        import orbax.checkpoint  # noqa: F401
    except ImportError:
        pytest.skip("orbax not installed")

    st = State(
        u=jnp.full((6, 3), 2.0), p=jnp.zeros(4), t=jnp.asarray(1.5),
        step=jnp.asarray(7, jnp.int32),
    )
    path = str(tmp_path / "orbax_ck")
    save_checkpoint_orbax(path, st)
    st2 = load_checkpoint_orbax(path)
    np.testing.assert_allclose(np.asarray(st2.u), 2.0)
    assert int(st2.step) == 7


def test_resume_legacy_checkpoint_reinitializes_recycle_pools(tmp_path):
    """A checkpoint written before f/s_recycle existed has no pool arrays;
    resuming it with recycling enabled must re-initialize zero pools at run
    entry (models/base.py _ensure_pools, round-4 advisor finding) instead of
    silently disabling recycling, and the resumed trajectory must match a
    plain-CG run to solver tolerance."""
    import dataclasses

    import jax.numpy as jnp

    from navierstokes_project_nm4pde_tpu.config import (
        NumericsConfig,
        PrecondConfig,
        RunConfig,
        SolverConfig,
        TimeConfig,
    )
    from navierstokes_project_nm4pde_tpu.mesh import cylinder_channel_2d
    from navierstokes_project_nm4pde_tpu.models import (
        Cylinder2DProblem,
        NavierStokesSolver,
    )

    mesh = cylinder_channel_2d(lc=0.1)

    def make(s_recycle):
        return RunConfig(
            time=TimeConfig(dt=0.01, t_end=0.05, stepper="projection"),
            solver=SolverConfig(rtol=1e-10, restart=60, maxiter=300),
            precond=PrecondConfig(
                kind="yosida", f_iters=0, s_iters=40, s_solver="mg2_cg",
                s_recycle=s_recycle,
            ),
            numerics=NumericsConfig(
                dtype="float64", precise_dots=False, steps_per_chunk=1
            ),
        )

    # Reference: plain CG, straight 5-step run.
    plain = NavierStokesSolver(mesh, Cylinder2DProblem(test_case=2), make(0))
    st_plain, _ = plain.run(5)

    # Recycling run, interrupted after 3 steps by a LEGACY checkpoint
    # (pools stripped, as written by a pre-recycle build).
    solver = NavierStokesSolver(mesh, Cylinder2DProblem(test_case=2), make(2))
    st_mid, _ = solver.run(3)
    assert st_mid.spool is not None  # sanity: pool engaged before the save
    legacy = dataclasses.replace(st_mid, spool=None, fpool=None, fwpool=None)
    path = str(tmp_path / "legacy.npz")
    save_checkpoint(path, legacy)
    resumed = load_checkpoint(path, dtype=jnp.float64)
    assert resumed.spool is None

    st_end, _ = solver.run(2, state=resumed)
    # The guard must have re-created the pool AND the warm start must have
    # engaged (harvest makes it nonzero after a step).
    assert st_end.spool is not None
    assert float(np.abs(np.asarray(st_end.spool)).max()) > 0.0
    np.testing.assert_allclose(
        np.asarray(st_end.u), np.asarray(st_plain.u), rtol=1e-6, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(st_end.p), np.asarray(st_plain.p), rtol=1e-6, atol=1e-8
    )


def test_pvtu_record(tmp_path):
    """Multi-file parallel record (ref write_vtu_with_pvtu_record,
    src/NavierStokes2D.cpp:669-675): piece files partition the cells with
    locally-renumbered points; the master lists every piece and the
    shared field schema."""
    import base64
    import struct

    from navierstokes_project_nm4pde_tpu.io import write_vtu_with_pvtu_record

    space = build_taylor_hood(cube_mesh(2))
    rng = np.random.default_rng(3)
    u = rng.normal(size=(space.n_unodes, 3))
    p = rng.normal(size=space.n_pnodes)
    master = write_vtu_with_pvtu_record(
        str(tmp_path), "snap", space, u, p, n_pieces=3
    )
    text = open(master).read()
    assert "PUnstructuredGrid" in text
    pieces = [ln.split('"')[1] for ln in text.splitlines() if "<Piece" in ln]
    assert len(pieces) == 3

    def cells_points(fname):
        t = open(tmp_path / fname).read()
        ncells = int(t.split('NumberOfCells="')[1].split('"')[0])
        npts = int(t.split('NumberOfPoints="')[1].split('"')[0])
        # connectivity block: Int64 "connectivity"
        blk = t.split('Name="connectivity" format="binary">')[1].split("<")[0]
        raw = base64.b64decode(blk)
        (nbytes,) = struct.unpack("<I", raw[:4])
        conn = np.frombuffer(raw[4: 4 + nbytes], dtype=np.int64)
        return ncells, npts, conn

    total = 0
    for f in pieces:
        ncells, npts, conn = cells_points(f)
        total += ncells
        # local renumbering must be in-range and dense at the low end
        assert conn.max() < npts and conn.min() >= 0
    assert total == space.mesh.n_cells

    # explicit partitioning array must drive piece assignment
    part = np.arange(space.mesh.n_cells) % 2
    master2 = write_vtu_with_pvtu_record(
        str(tmp_path), "snap2", space, u, p, partitioning=part
    )
    t2 = open(master2).read()
    assert t2.count("<Piece") == 2

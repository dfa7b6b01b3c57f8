"""CLI flag plumbing tests (no solves -- config construction only)."""

import argparse

from navierstokes_project_nm4pde_tpu.cli import _build_config, _common_flags


def _parse(extra):
    p = argparse.ArgumentParser()
    _common_flags(p, dt=2e-4, t_end=4.0, precond="yosida")
    p.add_argument("--test-case", type=int, default=2)
    return p.parse_args(extra)


def test_fast_preset_builds_bench_stack():
    """--fast must reproduce the benchmarked projection configuration
    (bench.py defaults): frozen banded Schur, additive two-level CG,
    plain-Jacobi FGMRES, quadratic warm start, rtol vs ||b||."""
    cfg = _build_config(_parse(["--fast"]), None)
    assert cfg.time.stepper == "projection"
    assert cfg.solver.tol_mode == "b"
    assert cfg.solver.guess_order == 2
    assert cfg.solver.restart == 8
    assert cfg.precond.kind == "yosida"
    assert cfg.precond.f_iters == 0
    assert cfg.precond.s_solver == "mg2_cg"
    assert cfg.precond.mg2_form == "additive"
    assert cfg.precond.freeze_conv_diag
    assert cfg.numerics.proj_schur == "frozen"
    assert cfg.numerics.reduce_plan == "columns"
    assert cfg.numerics.schur_spmv == "auto"
    assert not cfg.numerics.precise_dots


def test_fast_preset_keeps_user_time_and_tolerance():
    cfg = _build_config(
        _parse(["--fast", "--dt", "0.001", "--rtol", "1e-8",
                "--steps-per-chunk", "5"]), None
    )
    assert cfg.time.dt == 0.001
    assert cfg.solver.rtol == 1e-8
    assert cfg.numerics.steps_per_chunk == 5


def test_default_config_unchanged_without_fast():
    cfg = _build_config(_parse([]), None)
    assert cfg.time.stepper == "monolithic"
    assert cfg.precond.kind == "yosida"
    assert cfg.solver.tol_mode == "r0"
    assert cfg.numerics.precise_dots

"""Estimators used by the DFG validation runner (scripts/dfg_validate.py)."""

import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "scripts"),
)
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from dfg_validate import smooth, strouhal_from_lift  # noqa: E402


def test_strouhal_fft_peak_on_clean_signal():
    U, D, f = 1.0, 0.1, 3.0
    t = np.arange(1, 6001) * 1e-3
    cl = 0.2 + np.sin(2 * np.pi * f * t + 0.3)
    st, n_per = strouhal_from_lift(t, cl, U, D)
    assert abs(st - f * D / U) < 2e-3
    assert n_per >= 15


def test_strouhal_robust_to_high_frequency_jitter():
    """The round-1 zero-crossing estimator reported St=2.8 on a jittery
    trace whose true mode was 3 Hz; the FFT peak must not."""
    rng = np.random.default_rng(7)
    U, D, f = 1.0, 0.1, 3.0
    t = np.arange(1, 6001) * 1e-3
    cl = np.sin(2 * np.pi * f * t)
    cl = cl + 0.4 * rng.standard_normal(len(t))  # solver-noise stand-in
    st, _ = strouhal_from_lift(t, cl, U, D)
    assert abs(st - 0.3) < 0.01


def test_smooth_preserves_mode_amplitude():
    t = np.arange(1, 4001) * 1e-3
    cl = np.sin(2 * np.pi * 3.0 * t)
    half = 10  # 21-sample window ~ T/16 at 3 Hz, dt=1e-3
    s = smooth(cl, half)
    interior = s[200:-200]
    assert np.max(interior) > 0.99  # <1% amplitude bias
    assert np.max(np.abs(s)) <= 1.0 + 1e-9


def test_strouhal_too_short_window_is_nan():
    t = np.arange(1, 9) * 1e-3
    st, n = strouhal_from_lift(t, np.sin(t), 1.0, 0.1)
    assert np.isnan(st) and n == 0

"""Harmonic-fit max estimator: recovers noise-free extrema from noisy
periodic series (the on-chip f32 force-certification path,
navierstokes_tpu/utils/signal.py)."""

import numpy as np

from navierstokes_tpu.utils.signal import periodic_eval, periodic_fit


def _series(noise, n=4000, dt=0.005, f=0.30):
    rng = np.random.default_rng(7)
    t = 100.0 + dt * np.arange(n)
    w = 2 * np.pi * f
    y = (3.2 + 0.05 * np.cos(w * t + 0.3) + 0.02 * np.cos(2 * w * t - 1.0)
         + 0.004 * np.sin(3 * w * t))
    return t, y, y + noise * rng.standard_normal(n)


def test_recovers_true_max_under_noise():
    t, y_clean, y_noisy = _series(noise=0.02)
    true_max = y_clean.max()
    # the raw max of the noisy series is biased upward by the extreme-value
    # statistic -- that is the failure mode the fit removes
    assert y_noisy.max() - true_max > 0.04
    fit = periodic_fit(t, y_noisy, K=6)
    assert abs(fit["max"] - true_max) < 0.003  # ~0.1% of 3.2
    assert abs(fit["freq"] - 0.30) < 1e-3
    assert 0.015 < fit["sigma"] < 0.025


def test_noise_free_is_exact():
    t, y_clean, _ = _series(noise=0.0)
    fit = periodic_fit(t, y_clean, K=6)
    assert abs(fit["max"] - y_clean.max()) < 1e-6
    assert fit["sigma"] < 1e-8
    # evaluation reproduces the series
    assert np.allclose(periodic_eval(fit, t[:50]), y_clean[:50], atol=1e-8)


def test_argmax_phase():
    t, y_clean, y_noisy = _series(noise=0.01)
    fit = periodic_fit(t, y_noisy, K=6)
    # fitted argmax lies within the first period and matches the clean
    # signal's peak phase to a small fraction of a period
    T = 1.0 / fit["freq"]
    assert t[0] <= fit["argmax"] < t[0] + T
    i = np.argmax(y_clean[: int(T / 0.005) + 1])
    assert abs(fit["argmax"] - t[i]) < 0.05 * T

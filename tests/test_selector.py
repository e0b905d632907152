"""Pixel-angle extractor accuracy (benchmarks/selector_probe.pixel_angles).

The extractor is load-bearing: it drives unsupervised model selection and
population pruning (time_to_gate.py --prune-by pixel), so its inversion of
the renderer geometry must stay accurate if create_data.render_frame or
the selector ever changes. The dataset renders every trajectory with the
FIXED 19-px visual rod (HIGH_DIM_ARGS[0]); the physical length L enters
the dynamics only, so the extractor is tested at that geometry.
reference: examples/pendulum_friction-less/create_data.jl:90-101 (the
rendered geometry being inverted).
"""
import os
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "benchmarks"))
sys.path.insert(0, os.path.join(ROOT, "examples", "pendulum"))


@pytest.fixture(scope="module")
def rendered():
    from create_data import render_trajectory

    rng = np.random.default_rng(0)
    # Pendulum-like swings: distinct amplitudes/phases/frequencies per
    # trajectory, spanning the dataset's amplitude range.
    t = np.linspace(0.0, 4.95, 100)
    amp = rng.uniform(0.4, 1.3, size=(6, 1))
    freq = rng.uniform(1.5, 3.0, size=(6, 1))
    phase = rng.uniform(-np.pi, np.pi, size=(6, 1))
    theta = amp * np.sin(freq * t[None, :] + phase)
    frames = np.stack([
        np.asarray(render_trajectory(np.asarray(th, np.float32)))
        for th in theta
    ])
    return theta, frames.reshape(6, 100, -1)


def test_pixel_angles_absolute_accuracy(rendered):
    from selector_probe import pixel_angles

    theta, flat = rendered
    est = pixel_angles(flat)
    err = np.abs(est - theta)
    assert err.max() < 0.06, err.max()
    assert np.median(err) < 0.02, np.median(err)


def test_pixel_angles_per_trajectory_correlation(rendered):
    from selector_probe import pixel_angles
    from quality_goku import pearson_rows

    theta, flat = rendered
    est = pixel_angles(flat)
    r = pearson_rows(est, theta)
    assert np.min(r) > 0.999, r

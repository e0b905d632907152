"""Native (C++) component tests."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "examples", "pendulum"))


def _gxx_available():
    import shutil
    return shutil.which("g++") is not None


@pytest.mark.skipif(not _gxx_available(), reason="no g++ toolchain")
def test_native_rasterizer_matches_jax():
    import jax.numpy as jnp
    from create_data import render_trajectory
    from latentdiffeq.utils.native import native_render_trajectories

    angles = np.random.default_rng(0).uniform(-0.7, 0.7, (3, 8)) \
        .astype(np.float32)
    out_c = native_render_trajectories(angles)
    out_j = np.stack([np.asarray(render_trajectory(jnp.asarray(a)))
                      for a in angles])
    assert out_c.shape == (3, 8, 28, 28)
    np.testing.assert_allclose(out_c, out_j, atol=2e-6)


@pytest.mark.skipif(not _gxx_available(), reason="no g++ toolchain")
def test_generate_dataset_native_backend():
    from create_data import generate_dataset

    latent, u0s, ps, frames_j = generate_dataset(n_traj=3, seed=0,
                                                 tspan=(0.0, 0.45))
    _, _, _, frames_c = generate_dataset(n_traj=3, seed=0,
                                         tspan=(0.0, 0.45),
                                         renderer="native")
    np.testing.assert_allclose(frames_c, frames_j, atol=2e-6)

"""Pendulum video dataset generation.

Rebuilds the reference's data pipeline (examples/pendulum_friction-less/
create_data.jl): ensemble-solve the true pendulum ODE, then render each
trajectory to 28x28 grayscale frames. The Luxor vector renderer becomes a
vectorized anti-aliased JAX rasterizer reproducing the same geometry
(create_data.jl:65-117): pivot at canvas offset (0, -8.5), FIXED visual rod
length of 19 px regardless of the true length L (create_data.jl:27 —
"high_dim_args = (19, 1.75, 3.75)"), so L is only inferable from the
dynamics, not the image geometry. Bob/pivot discs radius 1.75, rod thickness
3.75, a small black tick at the rod midpoint (the reference draws the glyph
"|" rotated along the rod, create_data.jl:80-86 — approximated here by a
perpendicular capsule), and a black hub disc of half radius on the pivot.

The entire generation — 450 trajectories x 100 frames, solve + raster —
runs as one jitted/vmapped program on the accelerator.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np

from latentdiffeq import ODEProblem, Tsit5, solve_ensemble

try:
    from .pendulum import Pendulum
except ImportError:  # script usage
    from pendulum import Pendulum

# --- Args_gen (reference: create_data.jl:13-29) ---
TSPAN = (0.0, 4.95)
DT = 0.05                      # -> 100 frames
U0_RANGE = np.array([[-np.pi / 6, np.pi / 6],
                     [-np.pi / 3, np.pi / 3]])
P_RANGE = (1.0, 2.0)
N_TRAJ = 450
SEED = 1
HIGH_DIM_ARGS = (19.0, 1.75, 3.75)   # visual length, disc radius, rod width
H = W = 28


def _aa(dist, edge):
    """1-px anti-aliased coverage for signed distance below `edge`."""
    return jnp.clip(edge - dist + 0.5, 0.0, 1.0)


def render_frame(angle, *, pendulum_length=HIGH_DIM_ARGS[0],
                 radius=HIGH_DIM_ARGS[1], rod_thickness=HIGH_DIM_ARGS[2],
                 h: int = H, w: int = W):
    """Rasterize one pendulum frame at `angle` (radians from vertical-down).

    Mirrors Luxor's `frame()` (create_data.jl:90-101): y axis points down,
    origin at canvas center, pivot offset (0, -8.5).
    """
    # pixel-center grid in canvas coordinates
    ys = jnp.arange(h, dtype=jnp.float32) - (h - 1) / 2.0
    xs = jnp.arange(w, dtype=jnp.float32) - (w - 1) / 2.0
    py, px = jnp.meshgrid(ys, xs, indexing="ij")

    pivot = jnp.array([0.0, -8.5])
    a1 = jnp.pi / 2 + angle
    bob = pivot + pendulum_length * jnp.stack([jnp.cos(a1), jnp.sin(a1)])

    def disc(center, r):
        d = jnp.hypot(px - center[0], py - center[1])
        return _aa(d, r)

    def capsule(p0, p1, half_w):
        v = p1 - p0
        L2 = jnp.dot(v, v)
        t = jnp.clip(((px - p0[0]) * v[0] + (py - p0[1]) * v[1]) / L2, 0, 1)
        cx = p0[0] + t * v[0]
        cy = p0[1] + t * v[1]
        d = jnp.hypot(px - cx, py - cy)
        return _aa(d, half_w)

    # white: bob disc, pivot disc, rod stroke
    white = jnp.maximum(disc(bob, radius), disc(pivot, radius))
    white = jnp.maximum(white, capsule(pivot, bob, rod_thickness / 2))

    # black: "|" tick at rod midpoint, perpendicular to the rod (the
    # reference's rotated text glyph), then hub disc radius/2 on the pivot
    mid = (pivot + bob) / 2
    rod_dir = (bob - pivot) / jnp.maximum(
        jnp.hypot(bob[0] - pivot[0], bob[1] - pivot[1]), 1e-6)
    perp = jnp.stack([-rod_dir[1], rod_dir[0]])
    tick_half = 2.4  # ~fontsize-8 glyph half-height
    tick = capsule(mid - tick_half * perp, mid + tick_half * perp, 0.5)
    hub = disc(pivot, radius / 2)

    img = white * (1 - tick) * (1 - hub)
    return img


@jax.jit
def render_trajectory(angles):
    """(T,) angles -> (T, H, W) frames."""
    return jax.vmap(render_frame)(angles)


def generate_dataset(diffeq=None, *, n_traj: int = N_TRAJ, seed: int = SEED,
                     tspan=TSPAN, dt: float = DT, renderer: str = "jax"):
    """Generate the pendulum video dataset (reference: create_data.jl:31-57).

    Returns ``(latent_data, u0s, ps, high_dim_data)``:
      latent_data: (n, T, 2) true (angle, velocity)
      u0s: (n, 2); ps: (n, 1)
      high_dim_data: (n, T, H, W) float32 frames in [0, 1]
    """
    if diffeq is None:
        diffeq = Pendulum()
    rng = np.random.default_rng(seed)
    T = int(round((tspan[1] - tspan[0]) / dt)) + 1
    saveat = jnp.asarray(tspan[0] + dt * np.arange(T), jnp.float32)

    ps = rng.uniform(P_RANGE[0], P_RANGE[1], (n_traj, 1)).astype(np.float32)
    u0s = np.stack([rng.uniform(U0_RANGE[i, 0], U0_RANGE[i, 1], n_traj)
                    for i in range(2)], axis=1).astype(np.float32)

    prob = ODEProblem(f=diffeq.f, u0=jnp.asarray(u0s[0]), tspan=tspan,
                      p=jnp.asarray(ps[0]))
    sol = solve_ensemble(prob, diffeq.solver, u0s=jnp.asarray(u0s),
                         ps=jnp.asarray(ps), saveat=saveat)
    latent = np.asarray(sol.ys)
    assert np.all(np.asarray(sol.success)), "data-gen solves must succeed"

    if renderer == "native":
        # C++ host-side rasterizer (latentdiffeq/utils/native.py) — same
        # geometry, frees the accelerator during data generation
        from latentdiffeq.utils.native import native_render_trajectories
        frames = native_render_trajectories(latent[:, :, 0])
    else:
        frames = np.asarray(jax.vmap(render_trajectory)(sol.ys[:, :, 0]))
    return latent, u0s, ps, frames


def load_or_generate(path: str = None, **kwargs):
    """Cache the dataset on disk (the reference caches via BSON,
    model_train.jl:86-92)."""
    if path is None:
        path = os.path.join(os.path.dirname(__file__), "data",
                            "pendulum_data.npz")
    if os.path.exists(path):
        with np.load(path) as d:
            return d["latent"], d["u0s"], d["ps"], d["frames"]
    latent, u0s, ps, frames = generate_dataset(**kwargs)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, latent=latent, u0s=u0s, ps=ps, frames=frames)
    return latent, u0s, ps, frames


if __name__ == "__main__":
    latent, u0s, ps, frames = load_or_generate()
    print("latent:", latent.shape, "frames:", frames.shape,
          "mean pixel:", frames.mean())

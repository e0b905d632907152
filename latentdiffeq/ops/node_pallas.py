"""Pallas TPU kernel: batched fixed-grid NeuralODE solve, weights in VMEM.

The mechanistic-workload kernels (ode_pallas.py, recurrent_pallas.py) are
measured LOSERS against XLA at the flagship model size — a dim-2 state
wastes 126/128 lanes and the hand kernel displaces better XLA fusion
(benchmarks/RESULTS.md "perf probe"). The same analysis predicts the
flip for WIDE neural vector fields: an MLP field of width >= 128 does
real MXU matmuls per RK stage, and the XLA scan re-streams the weight
matrices from HBM on every stage of every step (O(T * stages * |W|)
HBM traffic), while a kernel can pin the weights in VMEM for the entire
integration and stream only the trajectory out.

This kernel tests that prediction: the whole batched solve of
``dy/dt = mlp(y)`` runs in one `pallas_call` — grid over batch tiles,
MLP weights resident in VMEM across all T*substeps steps, each RK stage
a (tile, dim) @ (dim, hidden) MXU matmul chain. Measured result in
benchmarks/RESULTS.md ("where Pallas pays").

Gradients: `jax.custom_vjp` with two backward modes — the default
in-VMEM reverse-sweep kernel (f32-rounding-equal grads, no HBM tape;
wins 1.2-2.7x over XLA at every width) or rematerialization through the
pure-JAX `solve_fixed_grid` path (bit-equal grads). Cotangents w.r.t.
``saveat`` are NOT propagated (returned zero) in either mode — use the
pure-JAX path to differentiate through the time grid. Off-TPU the kernel
runs in interpret mode (tests).

reference role: DiffEqFlux NeuralODE solve (nODE.jl:17, LatentODE.jl:61-78)
— the reference delegates this to OrdinaryDiffEq on CPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..nn.layers import Chain, Dense
from ..solve.rk import AbstractSolver, n_solution_stages

__all__ = ["pallas_solve_neural_field"]


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _dense_stack(mlp):
    """(Ws, bs, activations) of a Chain-of-Dense MLP (nn.mlp layout)."""
    layers = mlp.layers if isinstance(mlp, Chain) else tuple(mlp)
    Ws, bs, acts = [], [], []
    for lyr in layers:
        if not isinstance(lyr, Dense):
            raise TypeError(
                "pallas_solve_neural_field supports Chain-of-Dense fields "
                f"(nn.mlp); got layer {type(lyr).__name__}")
        Ws.append(lyr.W)
        bs.append(lyr.b.reshape(1, -1))  # 2-D for VMEM layout
        acts.append(lyr.activation)
    return Ws, bs, acts


def _rk_step_shared(field, tab, y, t, dt):
    """One fixed RK step on the whole tile; shared (weight) parameters."""
    s = n_solution_stages(tab)
    ks = []
    for i in range(s):
        yi = y
        for j, aij in enumerate(tab.a[i]):
            if aij != 0.0:
                yi = yi + (dt * aij) * ks[j]
        ks.append(field(yi, t + tab.c[i] * dt))
    y1 = y
    for bi, k in zip(tab.b, ks):
        if bi != 0.0:
            y1 = y1 + (dt * bi) * k
    return y1


def _node_kernel(acts, tab, substeps, T, n_layers, saveat_ref, u0_ref,
                 *refs):
    wb, out_ref = refs[:-1], refs[-1]

    def field(y, _t):
        h = y
        for li in range(n_layers):
            w = wb[2 * li][:]
            b = wb[2 * li + 1][:]
            h = jnp.dot(h, w, preferred_element_type=jnp.float32) + b
            h = acts[li](h)
        return h

    y = u0_ref[:]                     # (TB, dim), VMEM-resident throughout
    out_ref[pl.ds(0, 1)] = y[None]

    def body(i, y):
        ta = saveat_ref[i]
        tb = saveat_ref[i + 1]
        dt = (tb - ta) / substeps
        for j in range(substeps):
            y = _rk_step_shared(field, tab, y, ta + j * dt, dt)
        out_ref[pl.ds(i + 1, 1)] = y[None]
        return y

    jax.lax.fori_loop(0, T - 1, body, y)


def _lanes(n: int) -> int:
    return -(-n // 128) * 128


def _batch_tile(B: int, T: int, dim: int, weight_bytes: int, itemsize: int,
                budget: int = 8 * 1024 * 1024) -> int:
    """Largest power-of-two tile: lane-padded (T, TB, dim) trajectory block
    + resident weights within the VMEM budget (same accounting as
    ode_pallas._batch_tile — padded trailing dim, measured against
    Mosaic's scoped allocator)."""
    lanes = _lanes(dim)
    tb = 8
    while (tb * 2 <= B
           and T * (tb * 2) * lanes * itemsize + weight_bytes <= budget):
        tb *= 2
    return tb


def _pallas_forward(Ws, bs, acts, solver, substeps, u0s, saveat, interpret):
    B, dim = u0s.shape
    T = saveat.shape[0]
    tab = solver.tableau
    n_layers = len(Ws)

    weight_bytes = sum(w.shape[0] * _lanes(w.shape[1]) * w.dtype.itemsize
                      for w in Ws)
    weight_bytes += sum(_lanes(b.shape[1]) * b.dtype.itemsize for b in bs)
    tb = _batch_tile(B, T, dim, weight_bytes, u0s.dtype.itemsize)
    n_tiles = -(-B // tb)
    b_pad = n_tiles * tb
    if b_pad != B:
        u0s = jnp.concatenate(
            [u0s, jnp.tile(u0s[:1], (b_pad - B, 1))], axis=0)

    kernel = functools.partial(_node_kernel, tuple(acts), tab, substeps, T,
                               n_layers)
    wb_specs, wb_args = [], []
    for w, b in zip(Ws, bs):
        wb_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0)))
        wb_specs.append(pl.BlockSpec(b.shape, lambda i: (0, 0)))
        wb_args.extend([w, b])

    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        out_shape=jax.ShapeDtypeStruct((T, b_pad, dim), u0s.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),       # saveat (T,)
            pl.BlockSpec((tb, dim), lambda i: (i, 0)),   # u0 tile
            *wb_specs,                                   # weights, broadcast
        ],
        out_specs=pl.BlockSpec((T, tb, dim), lambda i: (0, i, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(saveat, u0s, *wb_args)
    return jnp.swapaxes(out, 0, 1)[:B]                   # (B, T, dim)


def _node_bwd_kernel(acts, tab, substeps, T, n_layers, saveat_ref, ys_ref,
                     g_ref, *refs):
    """Reverse sweep of the fixed-grid RK solve for one batch tile.

    Discretize-then-optimize backward: lambda_{T-1} = g_{T-1};
    lambda_i = g_i + (dstep/dy_i)^T lambda_{i+1}, accumulating
    (dstep/dW)^T lambda into per-tile weight grads. Each interval's VJP
    recomputes its stages from the saved state ys[i] (VMEM-resident), so
    nothing is taped to HBM; weights AND their grads stay in VMEM for the
    whole sweep.
    """
    wb = refs[:2 * n_layers]
    du0_ref = refs[2 * n_layers]
    dwb_refs = refs[2 * n_layers + 1:]
    Ws = tuple(wb[2 * li][:] for li in range(n_layers))
    bs = tuple(wb[2 * li + 1][:] for li in range(n_layers))

    def step_fn(y, ta, tb, Ws, bs):
        def field(h, _t):
            for li in range(n_layers):
                h = jnp.dot(h, Ws[li], preferred_element_type=jnp.float32) \
                    + bs[li]
                h = acts[li](h)
            return h

        dt = (tb - ta) / substeps
        for j in range(substeps):
            y = _rk_step_shared(field, tab, y, ta + j * dt, dt)
        return y

    lam = g_ref[pl.ds(T - 1, 1)][0]
    dWs0 = tuple(jnp.zeros_like(w) for w in Ws)
    dbs0 = tuple(jnp.zeros_like(b) for b in bs)

    def body(k, carry):
        lam, dWs, dbs = carry
        i = T - 2 - k
        y_i = ys_ref[pl.ds(i, 1)][0]
        ta = saveat_ref[i]
        tb = saveat_ref[i + 1]
        _, vjp = jax.vjp(
            lambda y, Ws_, bs_: step_fn(y, ta, tb, Ws_, bs_), y_i, Ws, bs)
        dy, dWs_c, dbs_c = vjp(lam)
        lam = dy + g_ref[pl.ds(i, 1)][0]
        dWs = tuple(a + c for a, c in zip(dWs, dWs_c))
        dbs = tuple(a + c for a, c in zip(dbs, dbs_c))
        return lam, dWs, dbs

    lam, dWs, dbs = jax.lax.fori_loop(0, T - 1, body, (lam, dWs0, dbs0))
    du0_ref[:] = lam
    for li in range(n_layers):
        dwb_refs[2 * li][:] = dWs[li][None]
        dwb_refs[2 * li + 1][:] = dbs[li][None]


def _pallas_backward(Ws, bs, acts, solver, substeps, saveat, ys, g,
                     interpret):
    """(du0s, dWs, dbs) via the in-VMEM reverse sweep. ``ys``: the forward
    trajectory (B, T, dim); ``g``: cotangent of the same shape."""
    B, T, dim = ys.shape
    tab = solver.tableau
    n_layers = len(Ws)

    weight_bytes = sum(w.shape[0] * _lanes(w.shape[1]) * w.dtype.itemsize
                      for w in Ws)
    # trajectory + cotangent blocks both live in VMEM, plus weights twice
    # (values + grads): halve the forward's effective budget
    tb = _batch_tile(B, 2 * T, dim, 2 * weight_bytes, ys.dtype.itemsize)
    n_tiles = -(-B // tb)
    b_pad = n_tiles * tb
    if b_pad != B:
        pad = jnp.zeros((b_pad - B,) + ys.shape[1:], ys.dtype)
        ys = jnp.concatenate([ys, pad], axis=0)
        # zero cotangent on padding rows => zero grad contribution
        g = jnp.concatenate([g, pad], axis=0)

    ys_t = jnp.swapaxes(ys, 0, 1)  # (T, B, dim)
    g_t = jnp.swapaxes(g, 0, 1)

    kernel = functools.partial(_node_bwd_kernel, tuple(acts), tab, substeps,
                               T, n_layers)
    wb_specs, wb_args = [], []
    for w, b in zip(Ws, bs):
        wb_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0)))
        wb_specs.append(pl.BlockSpec(b.shape, lambda i: (0, 0)))
        wb_args.extend([w, b])
    dwb_shapes, dwb_specs = [], []
    for w, b in zip(Ws, bs):
        dwb_shapes.append(
            jax.ShapeDtypeStruct((n_tiles,) + w.shape, w.dtype))
        dwb_specs.append(
            pl.BlockSpec((1,) + w.shape, lambda i: (i, 0, 0)))
        dwb_shapes.append(
            jax.ShapeDtypeStruct((n_tiles,) + b.shape, b.dtype))
        dwb_specs.append(
            pl.BlockSpec((1,) + b.shape, lambda i: (i, 0, 0)))

    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        out_shape=[jax.ShapeDtypeStruct((b_pad, dim), ys.dtype)]
        + dwb_shapes,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),           # saveat
            pl.BlockSpec((T, tb, dim), lambda i: (0, i, 0)),  # ys tile
            pl.BlockSpec((T, tb, dim), lambda i: (0, i, 0)),  # g tile
            *wb_specs,
        ],
        out_specs=[pl.BlockSpec((tb, dim), lambda i: (i, 0)), *dwb_specs],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(saveat, ys_t, g_t, *wb_args)
    du0 = out[0][:B]
    dWs = [out[1 + 2 * li].sum(axis=0) for li in range(n_layers)]
    dbs = [out[2 + 2 * li].sum(axis=0) for li in range(n_layers)]
    return du0, dWs, dbs


def pallas_solve_neural_field(mlp, solver: AbstractSolver, u0s, saveat, *,
                              substeps: int = 1, backward: str = "pallas",
                              interpret: bool | None = None):
    """Batched fixed-grid solve of ``dy/dt = mlp(y)`` in one Pallas kernel.

    ``mlp``: a `nn.Chain` of `nn.Dense` (the NODE field layout,
    latent_ode.py::NODE); weights are shared across the batch and live in
    VMEM for the whole integration. ``u0s``: (B, dim). Returns
    ``(ys, success, stats)`` matching the vmapped `solve_fixed_grid`
    exactly (ys: (B, T, dim); NaN-fill semantics downstream unchanged).

    ``backward``: "pallas" = in-VMEM reverse sweep over the saved
    trajectory (_node_bwd_kernel — no HBM tape, weights + grads resident);
    "xla" = rematerialize through the pure-JAX solve. Identical
    discretization either way: "xla" grads are bit-equal to the unrolled
    reference, "pallas" grads agree to f32 rounding (different
    accumulation order; tests pin both).
    """
    if interpret is None:
        interpret = not _on_tpu()
    if backward not in ("pallas", "xla"):
        raise ValueError(f"backward must be 'pallas' or 'xla': {backward}")
    tab = solver.tableau
    n_stage = n_solution_stages(tab)
    T = saveat.shape[0]

    @jax.custom_vjp
    def _run(u0s, mlp, saveat):
        Ws, bs, acts = _dense_stack(mlp)
        return _pallas_forward(Ws, bs, acts, solver, substeps, u0s, saveat,
                               interpret)

    def _fwd(u0s, mlp, saveat):
        out = _run(u0s, mlp, saveat)
        return out, (u0s, mlp, saveat, out)

    def _bwd(res, g):
        u0s, mlp, saveat, ys = res
        if backward == "pallas":
            import dataclasses as _dc
            Ws, bs, acts = _dense_stack(mlp)
            du0, dWs, dbs = _pallas_backward(Ws, bs, acts, solver,
                                             substeps, saveat, ys, g,
                                             interpret)
            layers = (mlp.layers if isinstance(mlp, Chain)
                      else tuple(mlp))
            dlayers = tuple(
                _dc.replace(lyr, W=dw, b=db.reshape(lyr.b.shape))
                for lyr, dw, db in zip(layers, dWs, dbs))
            dmlp = (_dc.replace(mlp, layers=dlayers)
                    if isinstance(mlp, Chain) else dlayers)
            return du0, dmlp, jnp.zeros_like(saveat)

        def ref(u0s_, mlp_):
            from ..solve.fixed import solve_fixed_grid

            def f(u, p, t_):
                return p(u)

            ys_, _, _ = jax.vmap(
                lambda u0: solve_fixed_grid(f, solver, u0, mlp_, saveat,
                                            substeps=substeps))(u0s_)
            return ys_

        _, vjp_fn = jax.vjp(ref, u0s, mlp)
        du0, dmlp = vjp_fn(g)
        return du0, dmlp, jnp.zeros_like(saveat)

    _run.defvjp(_fwd, _bwd)

    ys = _run(u0s, mlp, saveat)
    success = jnp.all(jnp.isfinite(ys), axis=(1, 2))
    stats = {
        "n_rhs_evals": jnp.asarray(
            u0s.shape[0] * (T - 1) * substeps * n_stage, jnp.int32),
        "n_accepted": jnp.asarray(u0s.shape[0] * (T - 1) * substeps,
                                  jnp.int32),
        "n_rejected": jnp.asarray(0, jnp.int32),
    }
    return ys, success, stats

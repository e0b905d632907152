"""Solver tests: convergence order, dense output, failure semantics,
ensembles, SDE statistics (SURVEY.md §4 test plan)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import latentdiffeq as ldq
from latentdiffeq.solve.fixed import solve_fixed_grid
from latentdiffeq.solve.adaptive import solve_adaptive, AdaptiveConfig


def linear_f(u, p, t):
    return p[0] * u


def pendulum_f(u, p, t):
    return jnp.stack([u[1], -10.0 / p[0] * jnp.sin(u[0])])


LAMBDA = -0.7
U0 = jnp.array([1.3])
P = jnp.array([LAMBDA])


def _fixed_err(solver, substeps):
    # Steps large enough that the error sits well above the float32 floor.
    saveat = jnp.array([0.0, 2.0])
    ys, ok, _ = solve_fixed_grid(linear_f, solver, U0, P, saveat,
                                 substeps=substeps)
    exact = U0[None] * jnp.exp(LAMBDA * saveat)[:, None]
    return float(jnp.max(jnp.abs(ys - exact)))


@pytest.mark.parametrize("solver,order", [
    (ldq.Euler(), 1), (ldq.Midpoint(), 2), (ldq.RK4(), 4), (ldq.Tsit5(), 5),
    (ldq.Dopri5(), 5),
])
def test_convergence_order(solver, order):
    """Halving dt must cut the error by ~2^order (exp-decay exact solution)."""
    e1 = _fixed_err(solver, 2)
    e2 = _fixed_err(solver, 4)
    rate = np.log2(e1 / e2)
    # float32 floors the high-order errors; accept >= order - 0.5
    assert rate > order - 0.55, f"{solver}: rate {rate}, expected ~{order}"


def test_fixed_grid_matches_exact_tightly():
    saveat = jnp.arange(50) * 0.05
    ys, ok, stats = solve_fixed_grid(linear_f, ldq.Tsit5(), U0, P, saveat)
    exact = U0[None] * jnp.exp(LAMBDA * saveat)[:, None]
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(exact), atol=1e-5)
    assert int(stats["n_rhs_evals"]) == 49 * 6  # Tsit5: 6 evals/step fixed


def test_interp_stride_halves_rhs_evals():
    """interp_stride=2: one Tsit5 step per two grid intervals, interior
    points from the native interpolant with FSAL reuse — ~half the RHS
    evals at negligible accuracy cost (the real saving VERDICT round-1
    item 7 was after; plain FSAL carry saves nothing in fixed-step mode
    since the skipped FSAL stage IS the next interval's k1)."""
    saveat = jnp.arange(50) * 0.05  # 49 intervals: 24 macro + 1 remainder
    u0 = jnp.array([0.3, 0.2])
    p = jnp.array([1.5])
    ys1, ok1, st1 = solve_fixed_grid(pendulum_f, ldq.Tsit5(), u0, p, saveat)
    ys2, ok2, st2 = solve_fixed_grid(pendulum_f, ldq.Tsit5(), u0, p, saveat,
                                     interp_stride=2)
    assert bool(ok1) and bool(ok2)
    assert int(st1["n_rhs_evals"]) == 49 * 6
    assert int(st2["n_rhs_evals"]) == 1 + 24 * 6 + 1 * 6  # 151 vs 294
    np.testing.assert_allclose(np.asarray(ys2), np.asarray(ys1), atol=2e-5)
    # gradients flow through the strided path
    g = jax.grad(lambda pp: jnp.sum(solve_fixed_grid(
        pendulum_f, ldq.Tsit5(), u0, pp, saveat,
        interp_stride=2)[0] ** 2))(p)
    assert np.all(np.isfinite(np.asarray(g)))
    # stride 3 with a different remainder also lines up
    ys3, ok3, st3 = solve_fixed_grid(pendulum_f, ldq.Tsit5(), u0, p, saveat,
                                     interp_stride=3)
    assert bool(ok3)
    np.testing.assert_allclose(np.asarray(ys3), np.asarray(ys1), atol=2e-4)


def test_adaptive_accuracy_and_tolerance_scaling():
    saveat = jnp.arange(50) * 0.05
    exact_end = None
    errs = {}
    for rtol in (1e-3, 1e-6):
        cfg = AdaptiveConfig(rtol=rtol, atol=rtol * 1e-3, max_steps=2048)
        ys, ok, stats = solve_adaptive(pendulum_f, ldq.Tsit5(),
                                       jnp.array([0.3, 0.2]),
                                       jnp.array([1.5]), saveat, cfg)
        assert bool(ok)
        ref, _, _ = solve_fixed_grid(pendulum_f, ldq.RK4(),
                                     jnp.array([0.3, 0.2]),
                                     jnp.array([1.5]), saveat, substeps=200)
        errs[rtol] = float(jnp.max(jnp.abs(ys - ref)))
    assert errs[1e-3] < 5e-3
    assert errs[1e-6] < 5e-5
    assert errs[1e-6] < errs[1e-3]


def test_adaptive_saveat_includes_endpoints():
    saveat = jnp.array([0.0, 0.3, 1.7, 2.45])
    ys, ok, _ = solve_adaptive(pendulum_f, ldq.Tsit5(), jnp.array([0.3, 0.2]),
                               jnp.array([1.5]), saveat, AdaptiveConfig())
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(ys[0]), [0.3, 0.2], atol=1e-7)
    assert np.all(np.isfinite(np.asarray(ys)))


def test_adaptive_dopri5_dense_output_beats_linear():
    """The Hairer continuous extension must track the true solution at
    off-step save points."""
    saveat = jnp.arange(100) * 0.02
    ys, ok, stats = solve_adaptive(pendulum_f, ldq.Dopri5(),
                                   jnp.array([0.3, 0.2]), jnp.array([1.5]),
                                   saveat, AdaptiveConfig(rtol=1e-4,
                                                          atol=1e-7))
    ref, _, _ = solve_fixed_grid(pendulum_f, ldq.RK4(), jnp.array([0.3, 0.2]),
                                 jnp.array([1.5]), saveat, substeps=100)
    assert bool(ok)
    # far fewer steps than save points, yet accurate everywhere
    assert int(stats["n_accepted"]) < 60
    assert float(jnp.max(jnp.abs(ys - ref))) < 2e-4


def test_tsit5_interpolant_weights_consistent():
    """b_i(0) = 0, b_i(1) = b_i (solution weights), and sum_i b_i(theta) =
    theta (1st-order consistency: exact for constant RHS)."""
    from latentdiffeq.solve.rk import _tsit5_b_theta, _TSIT5
    np.testing.assert_allclose(_tsit5_b_theta(np.float64(0.0)), 0.0,
                               atol=1e-14)
    np.testing.assert_allclose(_tsit5_b_theta(np.float64(1.0)), _TSIT5.b,
                               atol=1e-12)
    th = np.linspace(0.0, 1.0, 17)
    np.testing.assert_allclose(np.sum(_tsit5_b_theta(th), axis=0), th,
                               atol=1e-12)


def test_tsit5_interpolant_is_4th_order():
    """Local interpolation error at mid-step must decay ~O(h^5) (4th-order
    continuous extension), clearly beating cubic Hermite's O(h^4).
    VERDICT round 1 item 2 / SURVEY §7: Tsit5's own interpolant, not the
    Hermite stand-in."""
    import dataclasses as dc
    from latentdiffeq.solve.rk import _TSIT5, rk_step, interpolate_dense

    with jax.enable_x64():
        u0 = jnp.array([0.3, 0.2], jnp.float64)
        p = jnp.array([1.5], jnp.float64)
        hermite_tab = dc.replace(_TSIT5, interpolation="hermite")

        def mid_err(h, tab):
            y1, _, ks = rk_step(pendulum_f, tab, u0, p, 0.0, h)
            ymid = interpolate_dense(tab, u0, y1, ks, h,
                                     jnp.array([0.5], jnp.float64))[0]
            ref, _, _ = solve_fixed_grid(pendulum_f, ldq.RK4(), u0, p,
                                         jnp.array([0.0, h / 2],
                                                   jnp.float64),
                                         substeps=400)
            return float(jnp.max(jnp.abs(ymid - ref[-1])))

        e_big = mid_err(0.4, _TSIT5)
        e_small = mid_err(0.2, _TSIT5)
        rate = np.log2(e_big / e_small)
        assert rate > 4.4, f"tsit5 interpolant local rate {rate}, want ~5"
        # strictly better than the old cubic-Hermite stand-in
        assert e_big < mid_err(0.4, hermite_tab) / 4
        assert e_small < mid_err(0.2, hermite_tab) / 10


def test_adaptive_tsit5_dense_output_tight():
    """Adaptive Tsit5 with its native interpolant: accurate at ~100 off-step
    save points while taking far fewer steps (extends the Dopri5 test per
    VERDICT round 1 item 2, with a tighter bound than the Hermite path
    satisfied)."""
    saveat = jnp.arange(100) * 0.02
    ys, ok, stats = solve_adaptive(pendulum_f, ldq.Tsit5(),
                                   jnp.array([0.3, 0.2]), jnp.array([1.5]),
                                   saveat, AdaptiveConfig(rtol=1e-4,
                                                          atol=1e-7))
    ref, _, _ = solve_fixed_grid(pendulum_f, ldq.RK4(), jnp.array([0.3, 0.2]),
                                 jnp.array([1.5]), saveat, substeps=100)
    assert bool(ok)
    assert int(stats["n_accepted"]) < 60
    assert float(jnp.max(jnp.abs(ys - ref))) < 1e-4


def test_failure_gives_success_false_and_nan_fill():
    def blowup(u, p, t):
        return u * u * p[0]  # finite-time blowup for u0 > 0

    prob = ldq.ODEProblem(f=blowup, u0=jnp.array([2.0]), tspan=(0.0, 5.0),
                          p=jnp.array([3.0]))
    saveat = jnp.linspace(0.0, 5.0, 20)
    sol = ldq.solve(prob, ldq.Tsit5(), saveat=saveat, max_steps=128)
    assert not bool(sol.success)

    # ensemble NaN-fill semantics (reference: GOKU.jl:113-114)
    # u0=0.1 -> blowup at t*=1/(3*0.1)=3.33 > 2 (succeeds on [0,2]);
    # u0=2.0 -> blowup at t*=0.167 (fails).
    saveat = jnp.linspace(0.0, 2.0, 20)
    u0s = jnp.array([[0.1], [2.0]])
    ps = jnp.array([[3.0], [3.0]])
    ens = ldq.solve_ensemble(prob, ldq.Tsit5(), u0s=u0s, ps=ps, saveat=saveat,
                             max_steps=128)
    assert bool(ens.success[0]) and not bool(ens.success[1])
    assert not np.any(np.isnan(np.asarray(ens.ys[0])))
    assert np.all(np.isnan(np.asarray(ens.ys[1])))


def test_ensemble_matches_individual_solves():
    saveat = jnp.arange(30) * 0.05
    u0s = jnp.array([[0.3, 0.2], [-0.4, 0.9], [0.1, -1.0]])
    ps = jnp.array([[1.0], [1.5], [2.0]])
    prob = ldq.ODEProblem(f=pendulum_f, u0=u0s[0], tspan=(0.0, 1.45), p=ps[0])
    ens = ldq.solve_ensemble(prob, ldq.Tsit5(), u0s=u0s, ps=ps, saveat=saveat)
    for i in range(3):
        single = ldq.solve(prob.remake(u0=u0s[i], p=ps[i]), ldq.Tsit5(),
                           saveat=saveat)
        np.testing.assert_allclose(np.asarray(ens.ys[i]),
                                   np.asarray(single.ys), rtol=2e-4,
                                   atol=1e-5)


def test_rhs_eval_counter_adaptive():
    saveat = jnp.arange(50) * 0.05
    ys, ok, stats = solve_adaptive(pendulum_f, ldq.Tsit5(),
                                   jnp.array([0.3, 0.2]), jnp.array([1.5]),
                                   saveat, AdaptiveConfig())
    att = int(stats["n_accepted"]) + int(stats["n_rejected"])
    assert int(stats["n_rhs_evals"]) == 2 + att * 6  # f0 + hinit + 6/attempt


def test_sde_additive_ou_moments():
    """OU process dy = -a y dt + s dW: stationary-ish mean/var check."""
    a, s = 1.0, 0.5

    def f(u, p, t):
        return -p[0] * u

    def g(u, p, t):
        return jnp.full_like(u, s)

    prob = ldq.SDEProblem(f=f, g=g, u0=jnp.array([1.0]), tspan=(0.0, 2.0),
                          p=jnp.array([a]))
    saveat = jnp.linspace(0.0, 2.0, 41)
    n = 4096
    u0s = jnp.ones((n, 1))
    ps = jnp.tile(jnp.array([a]), (n, 1))
    for solver in (ldq.EulerMaruyama(), ldq.StochasticHeun()):
        ens = ldq.solve_ensemble(prob, solver, u0s=u0s, ps=ps, saveat=saveat,
                                 key=jax.random.PRNGKey(0), substeps=4)
        t_end = 2.0
        mean_exact = np.exp(-a * t_end)
        var_exact = s**2 / (2 * a) * (1 - np.exp(-2 * a * t_end))
        y_end = np.asarray(ens.ys[:, -1, 0])
        assert abs(y_end.mean() - mean_exact) < 0.02
        assert abs(y_end.var() - var_exact) < 0.02


def test_sde_heun_stronger_than_em_on_drift():
    """With zero noise, Heun reduces to 2nd-order deterministic; EM to 1st."""
    def f(u, p, t):
        return p[0] * u

    def g(u, p, t):
        return jnp.zeros_like(u)

    prob = ldq.SDEProblem(f=f, g=g, u0=U0, tspan=(0.0, 1.0), p=P)
    saveat = jnp.linspace(0.0, 1.0, 6)
    exact = U0[None] * jnp.exp(LAMBDA * saveat)[:, None]
    errs = {}
    for solver in (ldq.EulerMaruyama(), ldq.StochasticHeun()):
        sol = ldq.solve(prob, solver, saveat=saveat,
                        key=jax.random.PRNGKey(1), substeps=8)
        errs[type(solver).__name__] = float(jnp.max(jnp.abs(sol.ys - exact)))
    assert errs["StochasticHeun"] < errs["EulerMaruyama"] / 10


def test_brownian_bridge_refinement_consistency():
    """VBT property: the same key at any power-of-two refinement samples
    the SAME path — pairwise sums of fine increments equal the coarse
    increments exactly, the space-time integrals compose, and the adaptive
    solver's point queries agree with the vectorized fixed-grid sampling."""
    from latentdiffeq.solve.brownian import bridge_increments, vbt_query
    key = jax.random.PRNGKey(0)
    saveat = jnp.array([0.0, 0.5, 1.2])
    w1, i1 = bridge_increments(key, saveat, 1, (3,))
    w2, i2 = bridge_increments(key, saveat, 2, (3,))
    w4, i4 = bridge_increments(key, saveat, 4, (3,))
    np.testing.assert_allclose(w2.sum(1), w1.sum(1), atol=1e-6)
    np.testing.assert_allclose(w4.sum(1), w1.sum(1), atol=1e-6)
    # I_parent = I_left + I_right + (h/2) W_left
    h0 = 0.5
    np.testing.assert_allclose(i2[0, 0] + i2[0, 1] + h0 / 2 * w2[0, 0],
                               i1[0, 0], atol=1e-6)
    for (k, m, wref, iref) in [(0, 0, w1, i1), (1, 1, w2, i2),
                               (2, 3, w4, i4)]:
        wq, iq = vbt_query(key, 0, h0, k, m, (3,), depth_cap=4)
        np.testing.assert_allclose(wq, wref[0, m], atol=1e-6)
        np.testing.assert_allclose(iq, iref[0, m], atol=1e-6)


def test_brownian_bridge_marginal_stats():
    """W ~ N(0, h); I(1,0) with Var h^3/3 and Cov(W, I) = h^2/2."""
    from latentdiffeq.solve.brownian import bridge_increments
    keys = jax.random.split(jax.random.PRNGKey(1), 20000)
    W, I = jax.vmap(lambda k: bridge_increments(
        k, jnp.array([0.0, 1.0]), 1, ()))(keys)
    W = np.asarray(W).ravel()
    I = np.asarray(I).ravel()
    assert abs(W.var() - 1.0) < 0.03
    assert abs(I.var() - 1 / 3) < 0.02
    assert abs(np.cov(W, I)[0, 1] - 0.5) < 0.02
    # refined halves: Var h/2 each, independent
    W2, _ = jax.vmap(lambda k: bridge_increments(
        k, jnp.array([0.0, 1.0]), 2, ()))(keys)
    W2 = np.asarray(W2)[:, 0, :]
    assert np.all(np.abs(W2.var(axis=0) - 0.5) < 0.03)
    assert abs(np.corrcoef(W2[:, 0], W2[:, 1])[0, 1]) < 0.03


def test_sra1_exact_for_time_dependent_additive_noise():
    """For dy = t dW, SRA1's update u*dW - I(1,0) IS the exact pathwise
    integral of t dW over each step — so refining substeps on the same key
    must not change the answer at all. This pins the tableau's noise-stage
    time placement (c1 = (1, 0))."""
    def f(u, p, t):
        return jnp.zeros_like(u)

    def g(u, p, t):
        return jnp.full_like(u, t)

    prob = ldq.SDEProblem(f=f, g=g, u0=jnp.array([0.0]), tspan=(0.0, 2.0),
                          p=jnp.zeros(1))
    saveat = jnp.linspace(0.0, 2.0, 9)
    key = jax.random.PRNGKey(3)
    y1 = ldq.solve(prob, ldq.SRA1(), saveat=saveat, key=key, substeps=1).ys
    y8 = ldq.solve(prob, ldq.SRA1(), saveat=saveat, key=key, substeps=8).ys
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y8), atol=2e-6)
    # Euler-Maruyama is NOT exact here; it must move under refinement
    e1 = ldq.solve(prob, ldq.EulerMaruyama(), saveat=saveat, key=key,
                   substeps=1).ys
    assert float(jnp.max(jnp.abs(e1 - y1))) > 1e-3


@pytest.mark.slow
def test_sra1_strong_order():
    """Strong order on a nonlinear-drift additive-noise SDE, measured
    pathwise against a fine solve of the SAME path (possible only because
    the Brownian path is refinement-consistent): SRA1 ~1.5, EM ~1.0,
    and SRA1 beats EM outright."""
    def f(u, p, t):
        return jnp.sin(u) - u

    def g(u, p, t):
        return jnp.full_like(u, 0.5)

    prob = ldq.SDEProblem(f=f, g=g, u0=jnp.array([1.0]), tspan=(0.0, 1.0),
                          p=jnp.zeros(1))
    saveat = jnp.array([0.0, 1.0])
    keys = jax.random.split(jax.random.PRNGKey(7), 256)

    def end_err(solver, substeps, ref):
        ys = jax.vmap(lambda k: ldq.solve(prob, solver, saveat=saveat,
                                          key=k, substeps=substeps).ys)(keys)
        return float(jnp.sqrt(jnp.mean((ys[:, -1] - ref[:, -1]) ** 2)))

    refs = {}
    for name, solver in [("sra1", ldq.SRA1()), ("em", ldq.EulerMaruyama())]:
        refs[name] = jax.vmap(lambda k: ldq.solve(
            prob, ldq.SRA1(), saveat=saveat, key=k, substeps=256).ys)(keys)
    e_sra = [end_err(ldq.SRA1(), s, refs["sra1"]) for s in (2, 4, 8)]
    e_em = [end_err(ldq.EulerMaruyama(), s, refs["em"]) for s in (2, 4, 8)]
    slope_sra = np.log2(e_sra[0] / e_sra[2]) / 2
    slope_em = np.log2(e_em[0] / e_em[2]) / 2
    assert slope_sra > 1.3, f"SRA1 strong order {slope_sra}, want ~1.5"
    assert 0.7 < slope_em < 1.3, f"EM strong order {slope_em}, want ~1.0"
    assert e_sra[1] < e_em[1] / 4


def test_sra1_ou_moments():
    """OU mean/variance with SRA1 (same harness as the EM/Heun test)."""
    a, s = 1.0, 0.5

    def f(u, p, t):
        return -p[0] * u

    def g(u, p, t):
        return jnp.full_like(u, s)

    prob = ldq.SDEProblem(f=f, g=g, u0=jnp.array([1.0]), tspan=(0.0, 2.0),
                          p=jnp.array([a]))
    saveat = jnp.linspace(0.0, 2.0, 41)
    n = 4096
    ens = ldq.solve_ensemble(prob, ldq.SRA1(), u0s=jnp.ones((n, 1)),
                             ps=jnp.tile(jnp.array([a]), (n, 1)),
                             saveat=saveat, key=jax.random.PRNGKey(0),
                             substeps=2)
    t_end = 2.0
    y_end = np.asarray(ens.ys[:, -1, 0])
    assert abs(y_end.mean() - np.exp(-a * t_end)) < 0.02
    assert abs(y_end.var() - s**2 / (2 * a) * (1 - np.exp(-2 * a * t_end))) \
        < 0.02


@pytest.mark.slow
def test_sde_adaptive_matches_fine_fixed_grid():
    """Adaptive SRA1 (dyadic VBT stepping) integrates the same path as the
    fixed grid: its solution must sit close to a fine fixed-grid solve with
    the same key, succeed, and report sane step counts."""
    from latentdiffeq.solve.sde import (SDEAdaptiveConfig, SRA1,
                                        solve_sde_adaptive,
                                        solve_sde_fixed_grid)

    def f(u, p, t):
        return jnp.stack([u[1], -10.0 / p[0] * jnp.sin(u[0])])

    def g(u, p, t):
        return jnp.full_like(u, 0.01)

    u0 = jnp.array([0.3, 0.2])
    p = jnp.array([1.5])
    saveat = jnp.arange(20) * 0.05
    key = jax.random.PRNGKey(11)
    ys_f, ok_f, _ = solve_sde_fixed_grid(f, g, SRA1(), u0, p, saveat, key,
                                         substeps=64)
    ys_a, ok_a, st = solve_sde_adaptive(
        f, g, SRA1(), u0, p, saveat, key,
        SDEAdaptiveConfig(rtol=1e-4, atol=1e-6))
    assert bool(ok_f) and bool(ok_a)
    assert float(jnp.max(jnp.abs(ys_a - ys_f))) < 2e-3
    assert int(st["n_accepted"]) >= 19
    # ensembles vmap over it (per-sample step sequences)
    prob = ldq.SDEProblem(f=f, g=g, u0=u0, tspan=(0.0, 0.95), p=p)
    ens = ldq.solve_ensemble(prob, ldq.SRA1(),
                             u0s=jnp.stack([u0, u0 * 0.5]),
                             ps=jnp.stack([p, 2 * p]), saveat=saveat,
                             key=key, adaptive=True, rtol=1e-3, atol=1e-5)
    assert bool(jnp.all(ens.success))
    assert not np.any(np.isnan(np.asarray(ens.ys)))


def test_sde_adaptive_failure_semantics():
    """A drift blow-up drives refinement to the depth cap and lowers the
    success flag (NaN-fill handled by the ensemble wrapper, GOKU.jl:113-114)."""
    from latentdiffeq.solve.sde import (SDEAdaptiveConfig, SRA1,
                                        solve_sde_adaptive)

    def f(u, p, t):
        return u * u * 3.0

    def g(u, p, t):
        return jnp.full_like(u, 0.01)

    ys, ok, _ = solve_sde_adaptive(
        f, g, SRA1(), jnp.array([2.0]), jnp.zeros(1),
        jnp.linspace(0.0, 5.0, 10), jax.random.PRNGKey(0),
        SDEAdaptiveConfig(max_steps=256, depth_cap=8))
    assert not bool(ok)


def test_adaptive_step_to_saveat_mode():
    """tstops-style stepping lands exactly on save points: tighter than
    dense output, at somewhat more steps."""
    saveat = jnp.arange(50) * 0.05
    u0 = jnp.array([0.3, 0.2])
    p = jnp.array([1.5])
    ref, _, _ = solve_fixed_grid(pendulum_f, ldq.RK4(), u0, p, saveat,
                                 substeps=200)
    cfg_d = AdaptiveConfig(rtol=1e-4, atol=1e-7)
    cfg_s = AdaptiveConfig(rtol=1e-4, atol=1e-7, step_to_saveat=True)
    ys_d, ok_d, st_d = solve_adaptive(pendulum_f, ldq.Tsit5(), u0, p,
                                      saveat, cfg_d)
    ys_s, ok_s, st_s = solve_adaptive(pendulum_f, ldq.Tsit5(), u0, p,
                                      saveat, cfg_s)
    assert bool(ok_d) and bool(ok_s)
    err_d = float(jnp.max(jnp.abs(ys_d - ref)))
    err_s = float(jnp.max(jnp.abs(ys_s - ref)))
    assert err_s <= err_d + 1e-6
    assert err_s < 5e-5
    assert int(st_s["n_accepted"]) >= int(st_d["n_accepted"])


@pytest.mark.slow
def test_fixed_grid_unroll_invariant():
    """`unroll` is a pure scheduling knob: the trajectory, success flag and
    RHS-eval counters are identical for any unroll factor (incl. one that
    doesn't divide T-1), with and without interp_stride."""
    saveat = jnp.arange(50) * 0.05
    u0 = jnp.array([0.3, 0.2])
    p = jnp.array([1.5])
    ref, ok, st = solve_fixed_grid(pendulum_f, ldq.Tsit5(), u0, p, saveat)
    for unroll in (7, 49):
        ys, ok_u, st_u = solve_fixed_grid(pendulum_f, ldq.Tsit5(), u0, p,
                                          saveat, unroll=unroll)
        assert jnp.array_equal(ys, ref) and bool(ok_u)
        assert int(st_u["n_rhs_evals"]) == int(st["n_rhs_evals"])
    ref2, _, _ = solve_fixed_grid(pendulum_f, ldq.Tsit5(), u0, p, saveat,
                                  interp_stride=2)
    ys2, _, _ = solve_fixed_grid(pendulum_f, ldq.Tsit5(), u0, p, saveat,
                                 interp_stride=2, unroll=8)
    assert jnp.array_equal(ys2, ref2)


def test_adaptive_early_exit_matches_bounded_scan():
    """early_exit (chunked while_loop) runs the SAME masked body, so the
    trajectory, success flag, and step counts are bitwise identical to the
    bounded scan — only the wall-clock becomes difficulty-bound."""
    saveat = jnp.linspace(0.0, 4.95, 100)
    u0s = jnp.stack([jnp.array([0.3, 0.2]), jnp.array([2.5, 0.0]),
                     jnp.array([-1.0, 1.5])])
    ps = jnp.stack([jnp.array([1.0]), jnp.array([1.5]), jnp.array([2.5])])
    base = AdaptiveConfig(rtol=1e-4, atol=1e-7, max_steps=256)
    ee = AdaptiveConfig(rtol=1e-4, atol=1e-7, max_steps=256,
                        early_exit=True, chunk_size=16)

    run = lambda cfg: jax.vmap(lambda u0, p: solve_adaptive(
        pendulum_f, ldq.Tsit5(), u0, p, saveat, cfg))(u0s, ps)
    ys_a, ok_a, st_a = jax.jit(lambda: run(base))()
    ys_b, ok_b, st_b = jax.jit(lambda: run(ee))()
    assert bool(ok_a.all()) and bool(ok_b.all())
    np.testing.assert_array_equal(np.asarray(ys_a), np.asarray(ys_b))
    np.testing.assert_array_equal(np.asarray(st_a["n_accepted"]),
                                  np.asarray(st_b["n_accepted"]))
    np.testing.assert_array_equal(np.asarray(st_a["n_rejected"]),
                                  np.asarray(st_b["n_rejected"]))


def test_adaptive_early_exit_budget_exhaustion_still_fails():
    """A trajectory that cannot finish within max_steps lowers `success`
    in early-exit mode too (the while_loop exits on the rounded budget)."""
    saveat = jnp.linspace(0.0, 4.95, 100)
    cfg = AdaptiveConfig(rtol=1e-6, atol=1e-9, max_steps=16,
                         early_exit=True, chunk_size=8)
    _, ok, _ = solve_adaptive(pendulum_f, ldq.Tsit5(),
                              jnp.array([2.5, 0.0]), jnp.array([1.0]),
                              saveat, cfg)
    assert not bool(ok)


def test_adaptive_early_exit_composes_with_interpolating_adjoint():
    """Gradients via InterpolatingAdjoint (backward = its own solve; the
    forward loop is opaque) work with early_exit on, and match the
    Unrolled gradients of the bounded-scan path."""
    from latentdiffeq.adjoint.modes import InterpolatingAdjoint, Unrolled
    from latentdiffeq.adjoint.odeint import odeint

    saveat = jnp.linspace(0.0, 2.0, 20)
    u0 = jnp.array([0.8, -0.3])
    p = jnp.array([1.3])

    def loss(p, options, sensealg):
        ys, ok, _ = odeint(pendulum_f, ldq.Tsit5(), u0, p, saveat, options,
                           sensealg)
        return jnp.sum(ys ** 2)

    opt_ee = ldq.make_options(adaptive=True, rtol=1e-6, atol=1e-9,
                              early_exit=True, chunk_size=16)
    g_ee = jax.grad(loss)(p, opt_ee, InterpolatingAdjoint())
    opt_sc = ldq.make_options(adaptive=True, rtol=1e-6, atol=1e-9)
    g_un = jax.grad(loss)(p, opt_sc, Unrolled())
    np.testing.assert_allclose(np.asarray(g_ee), np.asarray(g_un),
                               rtol=1e-3)


def test_autosize_max_steps_shrinks_budget():
    """The probe sizes the budget from measured attempts (difficulty-bound
    configuration); a capped probe leaves the budget alone."""
    saveat = jnp.linspace(0.0, 4.95, 100)
    u0s = jnp.stack([jnp.array([0.3, 0.2]), jnp.array([2.0, 0.0])])
    ps = jnp.stack([jnp.array([1.0]), jnp.array([2.0])])
    options = ldq.make_options(adaptive=True, max_steps=512)
    sized = ldq.autosize_max_steps(pendulum_f, ldq.Tsit5(), u0s, ps,
                                   saveat, options)
    assert sized.adaptive_cfg.max_steps < 512
    # the sized budget still solves successfully
    _, ok, st = jax.vmap(lambda u0, p: solve_adaptive(
        pendulum_f, ldq.Tsit5(), u0, p, saveat,
        sized.adaptive_cfg))(u0s, ps)
    assert bool(ok.all())

    # probe that exhausts its cap: options unchanged
    tight = ldq.make_options(adaptive=True, rtol=1e-7, atol=1e-10,
                             max_steps=16)
    same = ldq.autosize_max_steps(pendulum_f, ldq.Tsit5(), u0s, ps,
                                  saveat, tight)
    assert same.adaptive_cfg.max_steps == 16


def test_sde_adaptive_early_exit_matches_bounded_scan():
    """The SDE dyadic-adaptive solver's early-exit mode is the same masked
    body — identical path, results, and step counts."""
    from latentdiffeq.solve.sde import (SDEAdaptiveConfig, SRA1,
                                        solve_sde_adaptive)

    def f(u, p, t):
        return jnp.stack([u[1], -10.0 / p[0] * jnp.sin(u[0])])

    def g(u, p, t):
        return jnp.full_like(u, 0.01)

    saveat = jnp.linspace(0.0, 2.0, 40)
    u0s = jnp.stack([jnp.array([0.3, 0.2]), jnp.array([1.5, -0.5])])
    ps = jnp.stack([jnp.array([1.0]), jnp.array([2.0])])
    keys = jax.random.split(jax.random.PRNGKey(0), 2)

    base = SDEAdaptiveConfig(max_steps=256, depth_cap=6)
    ee = SDEAdaptiveConfig(max_steps=256, depth_cap=6, early_exit=True,
                           chunk_size=16)
    run = lambda cfg: jax.vmap(lambda u0, p, k: solve_sde_adaptive(
        f, g, SRA1(), u0, p, saveat, k, cfg))(u0s, ps, keys)
    ys_a, ok_a, st_a = jax.jit(lambda: run(base))()
    ys_b, ok_b, st_b = jax.jit(lambda: run(ee))()
    assert bool(ok_a.all()) and bool(ok_b.all())
    np.testing.assert_array_equal(np.asarray(ys_a), np.asarray(ys_b))
    np.testing.assert_array_equal(np.asarray(st_a["n_accepted"]),
                                  np.asarray(st_b["n_accepted"]))


def test_sde_adaptive_depth0_equals_fixed_grid_incl_grads():
    """At tolerances loose enough that every step is a depth-0 cell, the
    adaptive SDE solve IS the fixed grid — same path, same chain, bitwise
    equal values AND gradients (the regression that made training through
    the adaptive path behave differently was over-tight atol forcing
    refinement, not a solver/gradient defect)."""
    from latentdiffeq.solve.sde import (SDEAdaptiveConfig, SRA1,
                                        solve_sde_adaptive,
                                        solve_sde_fixed_grid)

    def f(u, p, t):
        return jnp.stack([u[1], -10.0 / p[0] * jnp.sin(u[0])])

    def g(u, p, t):
        return jnp.full_like(u, 0.01)

    saveat = jnp.linspace(0.0, 4.95, 100)
    key = jax.random.PRNGKey(7)
    u0 = jnp.array([0.8, -0.2])
    p = jnp.array([1.4])
    cfg = SDEAdaptiveConfig(rtol=1e-1, atol=1e-1, max_steps=256,
                            depth_cap=6)

    def loss_ad(u0, p):
        ys, ok, st = solve_sde_adaptive(f, g, SRA1(), u0, p, saveat, key,
                                        cfg)
        return jnp.sum(ys ** 2), st

    def loss_fg(u0, p):
        ys, ok, st = solve_sde_fixed_grid(f, g, SRA1(), u0, p, saveat, key)
        return jnp.sum(ys ** 2), st

    (la, st_a), ga = jax.value_and_grad(loss_ad, argnums=(0, 1),
                                        has_aux=True)(u0, p)
    (lf, st_f), gf = jax.value_and_grad(loss_fg, argnums=(0, 1),
                                        has_aux=True)(u0, p)
    assert int(st_a["n_rejected"]) == 0
    assert int(st_a["n_accepted"]) == int(st_f["n_accepted"])
    np.testing.assert_array_equal(np.asarray(la), np.asarray(lf))
    for a, b in zip(ga, gf):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sriw1_strong_order_multiplicative():
    """SRIW1 (the SOSRI-role diagonal-noise SRI method) on geometric
    Brownian motion — MULTIPLICATIVE noise, where SRA1's additive-only
    contract does not apply — measured against the closed-form solution on
    the SAME Brownian path (W(T) reconstructed exactly from the virtual
    tree's interval roots): strong order ~1.5, vs ~0.5-0.8 for
    Euler-Maruyama, and SRIW1 beats EM outright."""
    from latentdiffeq.solve.brownian import interval_root
    from latentdiffeq.solve.sde import (EulerMaruyama, SRIW1,
                                        solve_sde_fixed_grid)

    mu, sig = 1.5, 0.5

    def f(u, p, t):
        return mu * u

    def g(u, p, t):
        return sig * u

    u0 = jnp.array([1.0])
    saveat = jnp.linspace(0.0, 1.0, 5)
    keys = jax.random.split(jax.random.PRNGKey(42), 256)

    def wT(key):
        hs = saveat[1:] - saveat[:-1]
        iks = jax.vmap(jax.random.fold_in, (None, 0))(key, jnp.arange(4))
        w, _ = jax.vmap(lambda k, h: interval_root(k, h, (1,),
                                                   jnp.float32))(iks, hs)
        return w.sum(axis=0)

    exact = u0 * jnp.exp((mu - 0.5 * sig**2) * 1.0
                         + sig * jax.vmap(wT)(keys))

    def end_err(solver, substeps):
        ys = jax.vmap(lambda k: solve_sde_fixed_grid(
            f, g, solver, u0, jnp.zeros(1), saveat, k,
            substeps=substeps)[0])(keys)
        return float(jnp.sqrt(jnp.mean((ys[:, -1] - exact) ** 2)))

    e_sri = [end_err(SRIW1(), s) for s in (2, 4, 8)]
    e_em = [end_err(EulerMaruyama(), s) for s in (2, 4, 8)]
    slope_sri = np.log2(e_sri[0] / e_sri[2]) / 2
    slope_em = np.log2(e_em[0] / e_em[2]) / 2
    assert slope_sri > 1.3, f"SRIW1 strong order {slope_sri}, want ~1.5"
    assert 0.4 < slope_em < 1.0, f"EM strong order {slope_em}, want ~0.5-0.8"
    assert e_sri[1] < e_em[1] / 10


def test_sriw1_equals_sra1_on_additive_noise():
    """For constant additive noise the SRIW1 tableau collapses onto SRA1
    (the beta2/beta3/beta4 rows sum to zero and H0_2 coincides), so the two
    must agree to f32 rounding (the zero rows cancel in a different
    association order, so bitwise equality is not expected) — SRA1 stays
    the additive default with SRIW1 a strict generalization."""
    from latentdiffeq.solve.sde import SRA1, SRIW1, solve_sde_fixed_grid

    def f(u, p, t):
        return jnp.sin(u) - u

    def g(u, p, t):
        return jnp.full_like(u, 0.3)

    u0 = jnp.array([1.0, -0.4])
    saveat = jnp.linspace(0.0, 2.0, 9)
    key = jax.random.PRNGKey(5)
    y_sra = solve_sde_fixed_grid(f, g, SRA1(), u0, jnp.zeros(1), saveat,
                                 key, substeps=4)[0]
    y_sri = solve_sde_fixed_grid(f, g, SRIW1(), u0, jnp.zeros(1), saveat,
                                 key, substeps=4)[0]
    np.testing.assert_allclose(np.asarray(y_sra), np.asarray(y_sri),
                               atol=1e-6)


@pytest.mark.slow
def test_sriw1_adaptive_matches_fine_fixed_grid():
    """Adaptive SRIW1 on a multiplicative-noise SDE integrates the same
    virtual-Brownian-tree path as the fixed grid: the dyadic-bisection
    solution must track a 64x fixed-grid solve with the same key, succeed,
    and be differentiable (pathwise grads through accepted stages)."""
    from latentdiffeq.solve.sde import (SDEAdaptiveConfig, SRIW1,
                                        solve_sde_adaptive,
                                        solve_sde_fixed_grid)

    def f(u, p, t):
        return p[0] * u - u * u * u

    def g(u, p, t):
        return 0.2 * u

    u0 = jnp.array([0.8])
    p = jnp.array([1.0])
    saveat = jnp.linspace(0.0, 1.0, 11)
    key = jax.random.PRNGKey(11)
    ys_f, ok_f, _ = solve_sde_fixed_grid(f, g, SRIW1(), u0, p, saveat, key,
                                         substeps=64)
    ys_a, ok_a, st = solve_sde_adaptive(
        f, g, SRIW1(), u0, p, saveat, key,
        SDEAdaptiveConfig(rtol=1e-4, atol=1e-6))
    assert bool(ok_f) and bool(ok_a)
    assert float(jnp.max(jnp.abs(ys_a - ys_f))) < 5e-3
    assert int(st["n_accepted"]) >= 10

    def loss(u0, p):
        ys, _, _ = solve_sde_adaptive(f, g, SRIW1(), u0, p, saveat, key,
                                      SDEAdaptiveConfig(rtol=1e-3,
                                                        atol=1e-5))
        return jnp.sum(ys ** 2)

    grads = jax.grad(loss, argnums=(0, 1))(u0, p)
    for gr in grads:
        assert bool(jnp.all(jnp.isfinite(gr)))
        assert float(jnp.max(jnp.abs(gr))) > 0


def test_sde_adaptive_rejects_methods_without_embedded_error():
    from latentdiffeq.solve.sde import (EulerMaruyama, SDEAdaptiveConfig,
                                        solve_sde_adaptive)

    with pytest.raises(ValueError, match="embedded error"):
        solve_sde_adaptive(lambda u, p, t: u, lambda u, p, t: u,
                           EulerMaruyama(), jnp.ones(1), jnp.zeros(1),
                           jnp.linspace(0.0, 1.0, 3), jax.random.PRNGKey(0),
                           SDEAdaptiveConfig())

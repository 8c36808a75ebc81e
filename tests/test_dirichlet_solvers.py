"""The fast Minka solver must reach the same fixed point (and the same task
accuracies) as the reference-exact MM solver."""

import numpy as np
import pytest
from scipy.special import digamma as sp_digamma

import jax.numpy as jnp

from transductive_clip_tpu.core.config import CfgNode
from transductive_clip_tpu.methods import get_zero_shot_method
from transductive_clip_tpu.ops.dirichlet import minka_update_alpha, mm_update_alpha
from transductive_clip_tpu.ops.special import (
    digamma_pos,
    inv_digamma,
    lgamma_pos,
    trigamma_pos,
)


def test_special_functions_vs_scipy(rng):
    from scipy.special import gammaln, polygamma

    x = np.concatenate(
        [np.linspace(1e-5, 1, 40), np.linspace(1, 60, 60),
         np.linspace(60, 4000, 40)]
    )
    xj = jnp.asarray(x, jnp.float32)
    dg = np.abs(np.asarray(digamma_pos(xj)) - sp_digamma(x))
    assert (dg / (np.abs(sp_digamma(x)) + 1.0)).max() < 1e-4
    tg = np.abs(np.asarray(trigamma_pos(xj)) - polygamma(1, x))
    assert (tg / (np.abs(polygamma(1, x)) + 1.0)).max() < 1e-4
    lg = np.abs(np.asarray(lgamma_pos(xj)) - gammaln(x))
    assert (lg / (np.abs(gammaln(x)) + 1.0)).max() < 1e-4


def test_inv_digamma_roundtrip(rng):
    x = np.concatenate([np.linspace(0.01, 1, 50), np.linspace(1, 100, 50)])
    y = sp_digamma(x)
    xi = np.asarray(inv_digamma(jnp.asarray(y, jnp.float32)))
    assert (np.abs(xi - x) / x).max() < 5e-4


def test_minka_matches_mm_fixed_point(rng):
    K = 12
    x = rng.dirichlet(np.ones(K) * 0.3, size=500)
    y = np.log(x + 1e-15).mean(0)
    Y = jnp.asarray(np.tile(y, (2, K, 1)), jnp.float32)
    a0 = jnp.ones((2, K, K), jnp.float32)
    a_mm = np.asarray(mm_update_alpha(a0, Y))
    a_mk = np.asarray(minka_update_alpha(a0, Y))
    # both satisfy the stationarity equation and agree with each other
    for a in (a_mm, a_mk):
        resid = sp_digamma(a[0, 0]) - sp_digamma(a[0, 0].sum()) - y
        assert np.abs(resid).max() < 5e-3
    assert np.abs(a_mm - a_mk).max() / np.abs(a_mm).max() < 1e-3


def test_em_dirichlet_solver_parity_on_accuracy(simplex_tasks):
    x, y = simplex_tasks
    accs = {}
    for solver in ("mm", "minka"):
        cfg = CfgNode(
            dict(num_classes_test=8, n_class=8, n_query=40, iter=8,
                 iter_mm=300, T=30, use_softmax_feature=True,
                 graph_matching=True, dirichlet_solver=solver)
        )
        m = get_zero_shot_method("EM_DIRICHLET", args=cfg)
        accs[solver] = m.run_task({"x_q": x, "y_q": y})["acc"][:, -1]
    np.testing.assert_allclose(accs["mm"], accs["minka"], atol=0.03)
    assert accs["minka"].mean() > 0.9


def test_mm_update_runs_exactly_iter_mm_updates(rng):
    """With the convergence test disabled (tol=0) the solver must execute
    exactly ``iter_mm`` updates for ANY iter_mm — including values that are
    not multiples of the 50-iteration check block — matching the reference's
    ``for l in range(iter_mm)`` bound (reference: em_dirichlet.py:160-177)."""
    import jax

    from transductive_clip_tpu.ops.dirichlet import _mm_iteration

    K = 6
    x = rng.dirichlet(np.ones(K) * 0.5, size=200)
    y = jnp.asarray(np.tile(np.log(x + 1e-15).mean(0), (1, K, 1)), jnp.float32)
    a0 = jnp.full((1, K, K), 2.0, jnp.float32)

    def explicit(n):
        return jax.lax.fori_loop(0, n, lambda _, a: _mm_iteration(a, y), a0)

    for iter_mm in (7, 50, 51, 60, 137):
        got = np.asarray(mm_update_alpha(a0, y, iter_mm=iter_mm, tol=0.0))
        want = np.asarray(explicit(iter_mm))
        np.testing.assert_array_equal(
            got, want, err_msg=f"iter_mm={iter_mm} ran a different count"
        )


def test_update_logits_cache_rows_matches_full_recompute(rng):
    """The incremental one-hot-contraction cache update must reproduce the
    full dirichlet_logits_cache recomputation bit-for-bit at the changed
    rows and leave the rest untouched (the matmul form replaces TPU lane
    scatters; exactness relies on distinct indices and exact 0/1 terms)."""
    from transductive_clip_tpu.ops.dirichlet import (
        dirichlet_logits_cache,
        update_logits_cache_rows,
    )

    N, n, K, C = 3, 7, 40, 9
    log_x = jnp.asarray(np.log(rng.dirichlet(np.ones(K), size=(N, n)) + 1e-15),
                        jnp.float32)
    alpha = jnp.asarray(rng.gamma(2.0, size=(N, K, K)), jnp.float32)
    l12, l3 = dirichlet_logits_cache(log_x, alpha)
    idx = jnp.asarray(
        np.stack([rng.choice(K, C, replace=False) for _ in range(N)]),
        jnp.int32,
    )
    alpha_c = jnp.asarray(rng.gamma(2.0, size=(N, C, K)), jnp.float32)

    l12_inc, l3_inc = update_logits_cache_rows(l12, l3, idx, alpha_c, log_x)

    alpha_full = alpha.at[jnp.arange(N)[:, None], idx].set(alpha_c)
    l12_full, l3_full = dirichlet_logits_cache(log_x, alpha_full)
    np.testing.assert_array_equal(np.asarray(l12_inc), np.asarray(l12_full))
    np.testing.assert_array_equal(np.asarray(l3_inc), np.asarray(l3_full))


def test_unknown_solver_raises(rng):
    """A solver-name typo must raise, not silently select the MM loop."""
    from transductive_clip_tpu.ops.dirichlet import update_alpha

    a0 = jnp.ones((1, 2, 3), jnp.float32)
    y = -jnp.ones((1, 2, 3), jnp.float32)
    with pytest.raises(ValueError, match="unknown dirichlet_solver"):
        update_alpha(a0, y, solver="newton")


def test_minka_newton_matches_mm_fixed_point(rng):
    """The Newton-on-row-sum solver reaches the same stationary point as
    the reference-exact MM loop and the plain Minka fixed point."""
    from transductive_clip_tpu.ops.dirichlet import minka_newton_update_alpha

    K = 12
    x = rng.dirichlet(np.ones(K) * 0.3, size=500)
    y = np.log(x + 1e-15).mean(0)
    Y = jnp.asarray(np.tile(y, (2, K, 1)), jnp.float32)
    a0 = jnp.ones((2, K, K), jnp.float32)
    a_mm = np.asarray(mm_update_alpha(a0, Y))
    a_nw = np.asarray(minka_newton_update_alpha(a0, Y))
    resid = sp_digamma(a_nw[0, 0]) - sp_digamma(a_nw[0, 0].sum()) - y
    assert np.abs(resid).max() < 5e-3
    assert np.abs(a_mm - a_nw).max() / np.abs(a_mm).max() < 1e-3


def test_minka_newton_beats_fixed_point_on_hard_rows(rng):
    """On rows where the plain fixed point exhausts its iteration budget
    before converging (slow linear rate), Newton must still satisfy the
    stationarity equation at least as tightly."""
    from transductive_clip_tpu.ops.dirichlet import minka_newton_update_alpha

    K = 64
    # few-shot-like rows: a handful of sharp log-mean stats per row
    x = rng.dirichlet(np.ones(K) * 0.05 + 10.0 * np.eye(K)[0], size=4)
    y = np.log(x + 1e-15).mean(0)
    Y = jnp.asarray(np.tile(y, (1, 8, 1)), jnp.float32)
    a0 = jnp.ones((1, 8, K), jnp.float32)
    a_fp = np.asarray(minka_update_alpha(a0, Y))
    a_nw = np.asarray(minka_newton_update_alpha(a0, Y))

    def max_resid(a):
        return np.abs(
            sp_digamma(a[0, 0]) - sp_digamma(a[0, 0].sum()) - y
        ).max()

    assert max_resid(a_nw) <= max_resid(a_fp) * 1.5 + 1e-4
    assert max_resid(a_nw) < 5e-3


def test_minka_newton_extreme_stats_stay_finite(rng):
    """Extreme log-mean statistics (deeply peaked and near-uniform rows in
    one batch) must never produce non-finite or non-positive alpha: the
    Newton step's validity guard falls back to the globally-convergent
    fixed-point step A(s)."""
    from transductive_clip_tpu.ops.dirichlet import minka_newton_update_alpha

    K = 32
    y = np.zeros((1, 4, K), np.float32)
    y[0, 0] = -1e4            # impossibly peaked: alpha -> tiny
    y[0, 1] = -1.0 / K - 1e-6  # near the uniform-simplex upper bound
    y[0, 2] = np.linspace(-300.0, -0.5, K)
    y[0, 3] = -3.5
    a0 = jnp.ones((1, 4, K), jnp.float32)
    out = np.asarray(minka_newton_update_alpha(a0, jnp.asarray(y)))
    assert np.isfinite(out).all()
    assert (out > 0).all()
    # the moderate row must actually satisfy stationarity
    resid = sp_digamma(out[0, 3]) - sp_digamma(out[0, 3].sum()) - y[0, 3]
    assert np.abs(resid).max() < 5e-3


def test_minka_newton_row_mask_freezes_exactly(rng):
    """row_mask=False rows come back bit-identical to alpha0, and live rows
    are unaffected by the frozen rows' presence."""
    from transductive_clip_tpu.ops.dirichlet import minka_newton_update_alpha

    K = 16
    R = 6
    y = -np.abs(rng.standard_normal((2, R, K))).astype(np.float32) - 0.5
    a0 = jnp.asarray(1.0 + rng.random((2, R, K)).astype(np.float32))
    mask = jnp.asarray(np.array([[True, True, False, True, False, True]] * 2))
    out = np.asarray(minka_newton_update_alpha(a0, jnp.asarray(y),
                                               row_mask=mask))
    np.testing.assert_array_equal(out[:, 2], np.asarray(a0)[:, 2])
    np.testing.assert_array_equal(out[:, 4], np.asarray(a0)[:, 4])
    # live rows: identical to solving them without any frozen rows present
    live_idx = np.array([0, 1, 3, 5])
    out_live = np.asarray(minka_newton_update_alpha(
        a0[:, live_idx], jnp.asarray(y[:, live_idx])))
    np.testing.assert_array_equal(out[:, live_idx], out_live)

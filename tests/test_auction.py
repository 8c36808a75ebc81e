"""Device auction assignment vs scipy's optimal solver."""

import numpy as np
from scipy.optimize import linear_sum_assignment

import jax.numpy as jnp

from transductive_clip_tpu.ops.auction import auction_assign


def test_auction_matches_scipy_optimum(rng):
    for R, C in [(5, 5), (8, 20), (1, 4), (30, 60)]:
        values = rng.uniform(0, 1, size=(3, R, C)).astype(np.float32)
        cols = np.asarray(auction_assign(jnp.asarray(values)))
        for t in range(3):
            # valid injection
            assert len(set(cols[t].tolist())) == R
            assert (cols[t] >= 0).all() and (cols[t] < C).all()
            got = values[t, np.arange(R), cols[t]].sum()
            r, c = linear_sum_assignment(-values[t])
            opt = values[t, r, c].sum()
            assert got >= opt - R * 1e-5 - 1e-5, (R, C, got, opt)


def test_auction_with_constant_padding_rows(rng):
    """Padded zero-value rows (absent clusters) must not disturb the real
    rows' optimal assignment."""
    R, C, real = 10, 16, 4
    values = np.zeros((1, R, C), np.float32)
    values[0, :real] = rng.uniform(0.2, 1.0, size=(real, C))
    cols = np.asarray(auction_assign(jnp.asarray(values)))[0]
    assert len(set(cols.tolist())) == R
    got = values[0, np.arange(real), cols[:real]].sum()
    r, c = linear_sum_assignment(-values[0, :real])
    opt = values[0, :real][r, c].sum()
    assert got >= opt - R * 1e-5 - 1e-5


def test_device_matching_backend_matches_host(rng, simplex_tasks):
    from transductive_clip_tpu.core.config import CfgNode
    from transductive_clip_tpu.methods import get_zero_shot_method

    x, y = simplex_tasks
    accs = {}
    for backend in ("host", "device"):
        cfg = CfgNode(dict(
            num_classes_test=8, n_class=8, n_query=40, iter=8, iter_mm=200,
            T=30, use_softmax_feature=True, graph_matching=True, seed=0,
            matching_backend=backend,
        ))
        m = get_zero_shot_method("HARD_EM_DIRICHLET", args=cfg)
        accs[backend] = m.run_task({"x_q": x, "y_q": y})["acc"][:, -1]
    np.testing.assert_allclose(accs["host"], accs["device"], atol=1e-6)


def test_auction_randomized_sweep_vs_scipy(rng):
    """~1000 random rectangular costs, including tie-heavy (quantized)
    values: the auction's total assignment value must reach the scipy
    optimum within its R*eps guarantee."""
    checked = 0
    for R, C in [(5, 5), (8, 20), (30, 60), (75, 200)]:
        for quantize in (False, True):
            batch = 125
            values = rng.uniform(0, 1, size=(batch, R, C)).astype(np.float32)
            if quantize:                       # many exact ties
                values = np.round(values * 4) / 4
            cols = np.asarray(auction_assign(jnp.asarray(values)))
            for t in range(batch):
                assert len(set(cols[t].tolist())) == R
                got = values[t, np.arange(R), cols[t]].sum()
                r, c = linear_sum_assignment(-values[t])
                opt = values[t, r, c].sum()
                assert got >= opt - R * 1e-5 - 1e-5, (R, C, quantize, got, opt)
                checked += 1
    assert checked == 1000

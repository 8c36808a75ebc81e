"""Cluster compaction must not change EM-Dirichlet results when K is large
relative to the number of populated clusters."""

import numpy as np

import jax.numpy as jnp

from transductive_clip_tpu.methods.zero_shot.em_dirichlet import em_dirichlet_infer

from conftest import make_simplex_tasks


def test_compact_matches_full(rng):
    # K = 120 classes, only 5 present per task, 20 queries -> compaction on
    x, y = make_simplex_tasks(
        rng, n_task=3, n_query=20, n_class=120, k_eff=5, concentration=80.0
    )
    lambd = float(int(120 / 5) * 20)
    kw = dict(n_iter=6, iter_mm=200, hard=False, solver="minka")
    u_full, _ = em_dirichlet_infer(jnp.asarray(x), jnp.float32(lambd),
                                   compact=False, **kw)
    u_comp, _ = em_dirichlet_infer(jnp.asarray(x), jnp.float32(lambd),
                                   compact=True, **kw)
    pred_full = np.asarray(u_full).argmax(-1)
    pred_comp = np.asarray(u_comp).argmax(-1)
    # identical predictions, near-identical posteriors
    np.testing.assert_array_equal(pred_full, pred_comp)
    np.testing.assert_allclose(
        np.asarray(u_full), np.asarray(u_comp), atol=1e-4
    )


def test_compact_first_iter_flat_features(rng):
    """Iteration-1 compaction must match the exact path even on near-flat
    features (label mass ~7% — the adversarial regime for the dense first
    iteration, where every cluster carries query mass)."""
    x, y = make_simplex_tasks(
        rng, n_task=4, n_query=20, n_class=300, k_eff=6, concentration=20.0
    )
    lambd = float(int(300 / 5) * 20)
    kw = dict(n_iter=8, iter_mm=300, solver="minka", early_stop=False)
    for hard in (False, True):
        u_exact, _ = em_dirichlet_infer(jnp.asarray(x), jnp.float32(lambd),
                                        compact=False, hard=hard, **kw)
        u_cf, _ = em_dirichlet_infer(jnp.asarray(x), jnp.float32(lambd),
                                     compact=True, compact_first=True,
                                     hard=hard, **kw)
        u_nf, _ = em_dirichlet_infer(jnp.asarray(x), jnp.float32(lambd),
                                     compact=True, compact_first=False,
                                     hard=hard, **kw)
        np.testing.assert_array_equal(
            np.asarray(u_exact).argmax(-1), np.asarray(u_cf).argmax(-1),
            err_msg=f"hard={hard} compact_first",
        )
        np.testing.assert_array_equal(
            np.asarray(u_exact).argmax(-1), np.asarray(u_nf).argmax(-1),
            err_msg=f"hard={hard} full-first",
        )


def test_compact_hard_variant(rng):
    x, y = make_simplex_tasks(
        rng, n_task=2, n_query=20, n_class=120, k_eff=4, concentration=80.0
    )
    lambd = float(int(120 / 5) * 20)
    kw = dict(n_iter=4, iter_mm=200, hard=True, solver="minka")
    u_full, _ = em_dirichlet_infer(jnp.asarray(x), jnp.float32(lambd),
                                   compact=False, **kw)
    u_comp, _ = em_dirichlet_infer(jnp.asarray(x), jnp.float32(lambd),
                                   compact=True, **kw)
    np.testing.assert_array_equal(
        np.asarray(u_full).argmax(-1), np.asarray(u_comp).argmax(-1)
    )


def test_early_stop_matches_full_run(rng):
    import jax.numpy as jnp
    x, y = make_simplex_tasks(
        rng, n_task=3, n_query=20, n_class=30, k_eff=5, concentration=80.0
    )
    lambd = float(int(30 / 5) * 20)
    kw = dict(n_iter=20, iter_mm=300, hard=False, solver="minka", compact=False)
    u_full, c_full = em_dirichlet_infer(jnp.asarray(x), jnp.float32(lambd),
                                        early_stop=False, **kw)
    u_es, c_es = em_dirichlet_infer(jnp.asarray(x), jnp.float32(lambd),
                                    early_stop=True, **kw)
    np.testing.assert_array_equal(
        np.asarray(u_full).argmax(-1), np.asarray(u_es).argmax(-1)
    )
    # criterion trace keeps its length and is padded with the final value
    assert np.asarray(c_es).shape == (20,)


def test_few_shot_compact_matches_full(rng):
    import jax.numpy as jnp
    from transductive_clip_tpu.methods.few_shot.em_dirichlet import (
        em_dirichlet_fs_infer,
    )

    n_task, K, shots, n = 2, 120, 1, 20
    ys = np.tile(np.repeat(np.arange(K), shots), (n_task, 1))
    def feats(labels):
        out = np.zeros((*labels.shape, K), np.float32)
        for t in range(labels.shape[0]):
            for i, c in enumerate(labels[t]):
                a = np.ones(K); a[c] += 80
                out[t, i] = rng.dirichlet(a)
        return out
    xs = feats(ys)
    yq = rng.integers(0, 5, (n_task, n))
    xq = feats(yq)
    lambd = float(int(K / 5) * n)
    kw = dict(n_iter=6, iter_mm=200, n_class=K, hard=False, solver="minka",
              early_stop=False)
    u_full, _ = em_dirichlet_fs_infer(
        jnp.asarray(xs), jnp.asarray(xq), jnp.asarray(ys), jnp.float32(lambd),
        compact=False, **kw)
    u_comp, _ = em_dirichlet_fs_infer(
        jnp.asarray(xs), jnp.asarray(xq), jnp.asarray(ys), jnp.float32(lambd),
        compact=True, **kw)
    np.testing.assert_array_equal(
        np.asarray(u_full).argmax(-1), np.asarray(u_comp).argmax(-1)
    )
    np.testing.assert_allclose(np.asarray(u_full), np.asarray(u_comp), atol=2e-3)


def _flat_feature_tasks(rng, n_task=4, n_query=20, n_class=300, conc=5.0):
    """Near-uniform simplex features: the adversarial regime where
    iteration-1 compaction picks the wrong clusters (~46% prediction
    mismatch measured vs the exact first iteration)."""
    g = rng.gamma(1.0, size=(n_task, n_query, n_class)).astype(np.float32)
    labels = rng.integers(0, n_class, (n_task, n_query))
    g[np.arange(n_task)[:, None], np.arange(n_query)[None, :], labels] += conc
    return g / g.sum(-1, keepdims=True), labels


def test_compact_first_guard_falls_back_on_flat_features(rng):
    """The default 'auto' mode must detect an iteration-1 deviation on the
    first batch and permanently fall back to the exact first iteration
    (VERDICT r2 next #5)."""
    from transductive_clip_tpu.core.config import CfgNode
    from transductive_clip_tpu.methods import get_zero_shot_method

    x, y = _flat_feature_tasks(rng)
    n_class = x.shape[2]
    cfg = CfgNode(dict(
        name_method="EM_DIRICHLET", n_class=n_class,
        num_classes_test=n_class, n_query=x.shape[1], T=30,
        use_softmax_feature=True, graph_matching=False, iter=8, iter_mm=300,
        dirichlet_solver="minka", compact_clusters=True, early_stop=False,
    ))
    method = get_zero_shot_method("EM_DIRICHLET", args=cfg)
    assert method.compact_first and method._cf_guard_pending

    import warnings

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        logs = method.run_task({"x_q": x, "y_q": y[..., None]})
    assert any("compact_first_iter deviated" in str(w.message) for w in caught)
    assert method.compact_first is False  # permanently off for this eval

    # the guarded result must equal the exact-first-iteration path
    # (compare through the same matched-prediction pipeline)
    cfg_exact = CfgNode(dict(cfg, compact_first_iter=False))
    logs_exact = get_zero_shot_method("EM_DIRICHLET", args=cfg_exact).run_task(
        {"x_q": x, "y_q": y[..., None]})
    np.testing.assert_array_equal(logs["preds"], logs_exact["preds"])


def test_compact_first_guard_keeps_fast_path_on_peaked_features(rng):
    """On protocol-like peaked features the guard verifies once and keeps
    iteration-1 compaction on for later batches."""
    from transductive_clip_tpu.core.config import CfgNode
    from transductive_clip_tpu.methods import get_zero_shot_method

    x, y = make_simplex_tasks(
        rng, n_task=4, n_query=20, n_class=300, k_eff=6, concentration=60.0
    )
    cfg = CfgNode(dict(
        name_method="EM_DIRICHLET", n_class=300, num_classes_test=300,
        n_query=20, T=30, use_softmax_feature=True, graph_matching=False,
        iter=8, iter_mm=300, dirichlet_solver="minka",
        compact_clusters=True, early_stop=False,
    ))
    method = get_zero_shot_method("EM_DIRICHLET", args=cfg)
    method.run_task({"x_q": x, "y_q": y[..., None]})
    assert method.compact_first is True
    assert method._cf_guard_pending is False


def test_compact_first_guard_periodic_recheck_catches_mid_eval_drift(rng):
    """A flat-feature batch arriving mid-evaluation (after the first-batch
    guard passed) must still be caught by the periodic re-check
    (``compact_first_recheck``) and trigger the permanent fallback
    (VERDICT r3 next #5)."""
    from transductive_clip_tpu.core.config import CfgNode
    from transductive_clip_tpu.methods import get_zero_shot_method

    n_class, n_query = 300, 20
    x_peaked, y_peaked = make_simplex_tasks(
        rng, n_task=4, n_query=n_query, n_class=n_class, k_eff=6,
        concentration=60.0
    )
    x_flat, y_flat = _flat_feature_tasks(
        rng, n_task=4, n_query=n_query, n_class=n_class
    )
    cfg = CfgNode(dict(
        name_method="EM_DIRICHLET", n_class=n_class,
        num_classes_test=n_class, n_query=n_query, T=30,
        use_softmax_feature=True, graph_matching=False, iter=8, iter_mm=300,
        dirichlet_solver="minka", compact_clusters=True, early_stop=False,
        compact_first_recheck=1,   # re-check every other batch
    ))
    method = get_zero_shot_method("EM_DIRICHLET", args=cfg)

    import warnings

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        # batch 0: first-batch guard passes on peaked features
        method.run_task({"x_q": x_peaked, "y_q": y_peaked[..., None]})
        assert method.compact_first is True
        # batch 1: no check due (counter below cadence)
        method.run_task({"x_q": x_peaked, "y_q": y_peaked[..., None]})
        assert method.compact_first is True
        assert not caught
        # batch 2: periodic re-check due — the flat batch must trip it
        logs = method.run_task({"x_q": x_flat, "y_q": y_flat[..., None]})
    assert any("compact_first_iter deviated" in str(w.message)
               for w in caught)
    assert method.compact_first is False

    # the guarded result must equal the exact-first-iteration path
    cfg_exact = CfgNode(dict(cfg, compact_first_iter=False))
    logs_exact = get_zero_shot_method("EM_DIRICHLET", args=cfg_exact).run_task(
        {"x_q": x_flat, "y_q": y_flat[..., None]})
    np.testing.assert_array_equal(logs["preds"], logs_exact["preds"])


def test_compact_first_recheck_zero_is_first_batch_only(rng):
    """``compact_first_recheck: 0`` restores the round-3 first-batch-only
    guard: a mid-evaluation flat batch is NOT re-checked."""
    from transductive_clip_tpu.core.config import CfgNode
    from transductive_clip_tpu.methods import get_zero_shot_method

    n_class, n_query = 300, 20
    x_peaked, y_peaked = make_simplex_tasks(
        rng, n_task=4, n_query=n_query, n_class=n_class, k_eff=6,
        concentration=60.0
    )
    x_flat, y_flat = _flat_feature_tasks(
        rng, n_task=4, n_query=n_query, n_class=n_class
    )
    cfg = CfgNode(dict(
        name_method="EM_DIRICHLET", n_class=n_class,
        num_classes_test=n_class, n_query=n_query, T=30,
        use_softmax_feature=True, graph_matching=False, iter=8, iter_mm=300,
        dirichlet_solver="minka", compact_clusters=True, early_stop=False,
        compact_first_recheck=0,
    ))
    method = get_zero_shot_method("EM_DIRICHLET", args=cfg)
    method.run_task({"x_q": x_peaked, "y_q": y_peaked[..., None]})

    import warnings

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        method.run_task({"x_q": x_flat, "y_q": y_flat[..., None]})
    assert not any("compact_first_iter deviated" in str(w.message)
                   for w in caught)
    assert method.compact_first is True


def test_fast_tier_equals_wide_tier(rng):
    """The two-tier compact step's fast path (n_fast solve rows) must
    produce bit-identical results to the wide tier whenever the
    populated-count gate lets it engage — empty rows are frozen and
    criterion-excluded inside the solver, so the wide tier's extra rows
    are exact no-ops."""
    import transductive_clip_tpu.methods.zero_shot.em_dirichlet as em

    x, y = make_simplex_tasks(
        rng, n_task=4, n_query=20, n_class=300, k_eff=6, concentration=60.0
    )
    lambd = float(int(300 / 5) * 20)
    kw = dict(n_iter=8, iter_mm=300, solver="minka", compact=True,
              compact_first=True, early_stop=False)
    u_fast, c_fast = em.em_dirichlet_infer(
        jnp.asarray(x), jnp.float32(lambd), hard=False, **kw)

    # force the wide tier by disabling the fast one
    orig = em._COMPACT_FAST
    em._COMPACT_FAST = 10**9
    em.em_dirichlet_infer.clear_cache()
    try:
        u_wide, c_wide = em.em_dirichlet_infer(
            jnp.asarray(x), jnp.float32(lambd), hard=False, **kw)
    finally:
        em._COMPACT_FAST = orig
        em.em_dirichlet_infer.clear_cache()
    np.testing.assert_array_equal(np.asarray(u_fast), np.asarray(u_wide))
    np.testing.assert_array_equal(np.asarray(c_fast), np.asarray(c_wide))


def test_fast_tier_gate_rejects_flat_features(rng):
    """Flat features populate more clusters than the fast tier; the exact
    gate must route to the wide tier and keep results identical to a
    wide-only run."""
    import transductive_clip_tpu.methods.zero_shot.em_dirichlet as em

    x, _ = _flat_feature_tasks(rng, n_task=2, n_query=20, n_class=300,
                               conc=5.0)
    lambd = float(int(300 / 5) * 20)
    kw = dict(n_iter=4, iter_mm=300, solver="minka", compact=True,
              compact_first=True, early_stop=False)
    u_auto, _ = em.em_dirichlet_infer(
        jnp.asarray(x), jnp.float32(lambd), hard=False, **kw)
    orig = em._COMPACT_FAST
    em._COMPACT_FAST = 10**9
    em.em_dirichlet_infer.clear_cache()
    try:
        u_wide, _ = em.em_dirichlet_infer(
            jnp.asarray(x), jnp.float32(lambd), hard=False, **kw)
    finally:
        em._COMPACT_FAST = orig
        em.em_dirichlet_infer.clear_cache()
    np.testing.assert_array_equal(np.asarray(u_auto), np.asarray(u_wide))


def _fs_run(em_fs, x_s, y_s, x_q, lambd, **kw):
    import jax.numpy as jnp

    return em_fs.em_dirichlet_fs_infer(
        jnp.asarray(x_s), jnp.asarray(x_q), jnp.asarray(y_s),
        jnp.float32(lambd), **kw)


def test_fs_fast_tier_equals_wide_tier(rng):
    """Few-shot two-tier compact solve: the fast tier must be bit-identical
    to the wide tier when the populated-count gate engages — zero-query-mass
    rows are frozen inside the solver and take the pure-support fixed point
    (alpha_base) from the substitution in both tiers, so the wide tier's
    extra rows are exact no-ops."""
    import transductive_clip_tpu.methods.few_shot.em_dirichlet as em_fs
    from transductive_clip_tpu.utils.synthetic import make_few_shot_tasks

    x_s, y_s, x_q, y_q = make_few_shot_tasks(
        rng, 3, 20, 300, 1, k_eff=5, concentration=60.0)
    lambd = float(int(300 / 5) * 20)
    kw = dict(n_iter=8, iter_mm=300, n_class=300, hard=False, solver="minka",
              early_stop=False, compact=True)
    u_fast, c_fast = _fs_run(em_fs, x_s, y_s, x_q, lambd, **kw)
    # the setup must actually exercise the gate: populated count well under
    # the fast tier, n_compact wider than the fast tier
    pop = np.count_nonzero(np.asarray(u_fast).sum(1) > 0, axis=-1)
    assert pop.max() <= em_fs._COMPACT_FAST < 20 + em_fs._COMPACT_MARGIN

    orig = em_fs._COMPACT_FAST
    em_fs._COMPACT_FAST = 10**9
    em_fs.em_dirichlet_fs_infer.clear_cache()
    try:
        u_wide, c_wide = _fs_run(em_fs, x_s, y_s, x_q, lambd, **kw)
    finally:
        em_fs._COMPACT_FAST = orig
        em_fs.em_dirichlet_fs_infer.clear_cache()
    np.testing.assert_array_equal(np.asarray(u_fast), np.asarray(u_wide))
    np.testing.assert_array_equal(np.asarray(c_fast), np.asarray(c_wide))


def test_fs_fast_tier_gate_rejects_flat_features(rng):
    """Near-flat query features populate more clusters than the fast tier
    early on (the gate must route those iterations to the wide solve), then
    concentrate below it (fast engages) — the mixed-route run must equal a
    wide-only run bit for bit."""
    import transductive_clip_tpu.methods.few_shot.em_dirichlet as em_fs
    from transductive_clip_tpu.utils.synthetic import make_few_shot_tasks

    x_s, y_s, _, _ = make_few_shot_tasks(
        rng, 2, 60, 300, 1, k_eff=5, concentration=60.0)
    x_q, _ = _flat_feature_tasks(rng, n_task=2, n_query=60, n_class=300,
                                 conc=5.0)
    lambd = float(int(300 / 5) * 60)
    kw = dict(n_iter=4, iter_mm=300, n_class=300, hard=False, solver="minka",
              early_stop=False, compact=True)
    # the scenario must actually hit BOTH routes: after iteration 1 the
    # populated count exceeds the fast tier (gate rejects), by the last
    # iteration it fits (gate engages)
    u1, _ = _fs_run(em_fs, x_s, y_s, x_q, lambd,
                    **{**kw, "n_iter": 1})
    pop1 = np.count_nonzero(np.asarray(u1).sum(1) > 0, axis=-1)
    assert pop1.max() > em_fs._COMPACT_FAST
    u_auto, _ = _fs_run(em_fs, x_s, y_s, x_q, lambd, **kw)
    pop4 = np.count_nonzero(np.asarray(u_auto).sum(1) > 0, axis=-1)
    assert pop4.max() <= em_fs._COMPACT_FAST

    orig = em_fs._COMPACT_FAST
    em_fs._COMPACT_FAST = 10**9
    em_fs.em_dirichlet_fs_infer.clear_cache()
    try:
        u_wide, _ = _fs_run(em_fs, x_s, y_s, x_q, lambd, **kw)
    finally:
        em_fs._COMPACT_FAST = orig
        em_fs.em_dirichlet_fs_infer.clear_cache()
    np.testing.assert_array_equal(np.asarray(u_auto), np.asarray(u_wide))


def test_compact_select_rank_matches_topk(rng):
    """`compact_select: rank` (sort-free covering selection) must reproduce
    the top-k path: identical predictions and near-identical posteriors
    (ordering of the compact rows differs, so fp accumulation inside the
    solver criterion may differ in the last bits)."""
    x, y = make_simplex_tasks(
        rng, n_task=3, n_query=20, n_class=120, k_eff=5, concentration=80.0
    )
    lambd = float(int(120 / 5) * 20)
    for hard in (False, True):
        kw = dict(n_iter=6, iter_mm=200, hard=hard, solver="minka",
                  compact=True, compact_first=True)
        u_tk, c_tk = em_dirichlet_infer(
            jnp.asarray(x), jnp.float32(lambd), select="topk", **kw)
        u_rk, c_rk = em_dirichlet_infer(
            jnp.asarray(x), jnp.float32(lambd), select="rank", **kw)
        np.testing.assert_array_equal(
            np.asarray(u_tk).argmax(-1), np.asarray(u_rk).argmax(-1),
            err_msg=f"hard={hard}",
        )
        np.testing.assert_allclose(np.asarray(u_tk), np.asarray(u_rk),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(c_tk), np.asarray(c_rk),
                                   rtol=1e-3, atol=1e-9)


def test_fs_compact_drained_rows_reach_support_fixed_point(rng):
    """Few-shot compaction on near-flat query features: the reference
    re-solves ALL K rows every iteration (few_shot/em_dirichlet.py:195-201),
    so a row whose query mass drains to exact zero moves to the fixed point
    of its pure-support statistics — NOT to a freeze at its iteration-1
    value, which on flat features is strongly contaminated by the dense
    initial u (softmax tails contribute ~n_query/K mass per row vs
    y_s_sum = shots). The compact path must track that re-solve limit
    (code-review r3 finding: the in-solver freeze pinned those rows at the
    contaminated alpha, deviating from the reference in the default
    config)."""
    from transductive_clip_tpu.methods.few_shot.em_dirichlet import (
        em_dirichlet_fs_infer,
    )

    n_task, K, shots, n = 3, 300, 1, 25
    ys = np.tile(np.repeat(np.arange(K), shots), (n_task, 1))

    def feats(labels, conc):
        out = np.zeros((*labels.shape, K), np.float32)
        for t in range(labels.shape[0]):
            for i, c in enumerate(labels[t]):
                a = np.ones(K)
                a[c] += conc
                out[t, i] = rng.dirichlet(a)
        return out

    yq = rng.integers(0, 8, (n_task, n))
    xq = feats(yq, 5.0)            # near-flat: heavy iteration-1 contamination
    lambd = float(int(K / 5) * n)
    # shots=2: the pure-support Dirichlet MLE is finite, so the full path's
    # drained rows settle at the fixed point and the criterion trace must
    # match (pre-fix code deviated 2-4x from iteration 2 on). shots=1 is
    # the degenerate case: a single-sample Dirichlet MLE DIVERGES, the
    # reference's drained rows creep toward infinite concentration by one
    # capped inner-solver budget per outer iteration, and only predictions
    # (saturated u) are comparable — the compact path applies exactly one
    # solve's worth (alpha_base) instead of re-creeping every iteration.
    for shots, check_crit in ((2, True), (1, False)):
        ys_s = np.tile(np.repeat(np.arange(K), shots), (n_task, 1))
        xs = feats(ys_s, 80.0)
        for hard in (False, True):
            kw = dict(n_iter=8, iter_mm=300, n_class=K, hard=hard,
                      solver="minka", early_stop=False)
            u_full, c_full = em_dirichlet_fs_infer(
                jnp.asarray(xs), jnp.asarray(xq), jnp.asarray(ys_s),
                jnp.float32(lambd), compact=False, **kw)
            u_comp, c_comp = em_dirichlet_fs_infer(
                jnp.asarray(xs), jnp.asarray(xq), jnp.asarray(ys_s),
                jnp.float32(lambd), compact=True, **kw)
            msg = f"shots={shots} hard={hard}"
            np.testing.assert_array_equal(
                np.asarray(u_full).argmax(-1), np.asarray(u_comp).argmax(-1),
                err_msg=msg,
            )
            np.testing.assert_allclose(np.asarray(u_full),
                                       np.asarray(u_comp), atol=2e-3,
                                       err_msg=msg)
            if check_crit:
                # the criterion must account for the drained-row
                # transitions too (atol = solver-stop noise floor)
                np.testing.assert_allclose(np.asarray(c_full),
                                           np.asarray(c_comp),
                                           rtol=1e-4, atol=1e-6,
                                           err_msg=msg)


def test_fs_sparsity_warning_catches_intermediate_overflow(rng):
    """The compaction sparsity warning must fire when an INTERMEDIATE
    iteration's populated-cluster count exceeds the selection width, even
    though the final assignments are sparse — a final-u-only check passes
    silently in exactly the regime where compaction can deviate (flat
    features: ~70-90 populated rows at iteration 2 vs 41 slots, collapsing
    to ~10 by the last iteration)."""
    import warnings

    from transductive_clip_tpu.core.config import CfgNode
    from transductive_clip_tpu.methods import get_few_shot_method

    n_task, K, shots, n = 3, 300, 2, 25
    ys = np.tile(np.repeat(np.arange(K), shots), (n_task, 1))

    def feats(labels, conc):
        out = np.zeros((*labels.shape, K), np.float32)
        for t in range(labels.shape[0]):
            for i, c in enumerate(labels[t]):
                a = np.ones(K)
                a[c] += conc
                out[t, i] = rng.dirichlet(a)
        return out

    xs = feats(ys, 80.0)
    yq = rng.integers(0, 8, (n_task, n))
    xq = feats(yq, 5.0)
    cfg = CfgNode(dict(
        name_method="EM_DIRICHLET", n_class=K, num_classes_test=K,
        n_query=n, k_eff=5, T=30, use_softmax_feature=True, shots=shots,
        iter=8, iter_mm=300, dirichlet_solver="minka", early_stop=False,
        compact_clusters=True,
    ))
    method = get_few_shot_method("EM_DIRICHLET", args=cfg)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        logs = method.run_task(
            {"x_s": xs, "y_s": ys, "x_q": xq, "y_q": yq}, shot=shots)
    # final u is sparse (<= selection width) — the warning must come from
    # the per-iteration max, not the final assignments
    final_pop = int((logs["u"].sum(1) > 0).sum(-1).max()) \
        if "u" in logs else None
    assert any("clusters carry mass" in str(w.message) for w in caught), \
        f"intermediate overflow not reported (final populated={final_pop})"


def test_zs_sparsity_warning_intermediate_overflow_and_no_false_positive(rng):
    """Zero-shot counterpart: the per-iteration populated max must trigger
    the sparsity warning on flat features (intermediate overflow) and stay
    silent on protocol-like peaked features."""
    import warnings

    from transductive_clip_tpu.core.config import CfgNode
    from transductive_clip_tpu.methods import get_zero_shot_method

    def run(x, y):
        cfg = CfgNode(dict(
            name_method="EM_DIRICHLET", n_class=x.shape[2],
            num_classes_test=x.shape[2], n_query=x.shape[1], T=30,
            use_softmax_feature=True, graph_matching=False, iter=6,
            iter_mm=300, dirichlet_solver="minka", early_stop=False,
            compact_clusters=True, compact_first_iter=False,
        ))
        method = get_zero_shot_method("EM_DIRICHLET", args=cfg)
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            method.run_task({"x_q": x, "y_q": y[..., None]})
        return [w for w in caught if "clusters carry mass" in str(w.message)]

    x_flat, y_flat = _flat_feature_tasks(rng, n_task=2, n_query=20,
                                         n_class=300, conc=5.0)
    assert run(x_flat, y_flat), "flat-feature overflow not reported"

    x_peak, y_peak = make_simplex_tasks(
        rng, n_task=2, n_query=20, n_class=300, k_eff=6, concentration=60.0)
    assert not run(x_peak, y_peak), "spurious warning on peaked features"


def test_two_tier_never_mixes_solver_families(rng):
    """With solver='pallas' and n_compact above the Pallas row cap, BOTH
    tiers of the compact solve must resolve to the same (XLA Newton) solver
    — results bit-identical to solver='minka' — instead of a data-dependent
    mix of the Pallas kernel (fast tier) and the XLA solver (wide tier)
    that agree only to tolerance (code-review r3 finding)."""
    from transductive_clip_tpu.ops.dirichlet import (
        _PALLAS_SOLVER_MAX_ROWS,
        resolve_solver_for_width,
    )

    assert resolve_solver_for_width("pallas", _PALLAS_SOLVER_MAX_ROWS) == "pallas"
    assert resolve_solver_for_width(
        "pallas", _PALLAS_SOLVER_MAX_ROWS + 1) == "minka"
    assert resolve_solver_for_width(
        "minka", _PALLAS_SOLVER_MAX_ROWS + 1) == "minka"

    # n_query=260 -> n_compact=276 > 256: every solve (full-width iteration 1,
    # wide tier, fast tier) resolves to the XLA Newton path, so the whole
    # program must match solver='minka' exactly
    n_query, n_class = 260, 600
    x, _ = make_simplex_tasks(
        rng, n_task=2, n_query=n_query, n_class=n_class, k_eff=6,
        concentration=60.0
    )
    lambd = float(int(n_class / 5) * n_query)
    kw = dict(n_iter=3, iter_mm=100, hard=True, compact=True,
              compact_first=True, early_stop=False)
    u_p, c_p = em_dirichlet_infer(
        jnp.asarray(x), jnp.float32(lambd), solver="pallas", **kw)
    u_m, c_m = em_dirichlet_infer(
        jnp.asarray(x), jnp.float32(lambd), solver="minka", **kw)
    np.testing.assert_array_equal(np.asarray(u_p), np.asarray(u_m))
    np.testing.assert_array_equal(np.asarray(c_p), np.asarray(c_m))


def test_fs_compact_select_rank_matches_topk(rng):
    from transductive_clip_tpu.methods.few_shot.em_dirichlet import (
        em_dirichlet_fs_infer,
    )
    from transductive_clip_tpu.utils.synthetic import make_few_shot_tasks

    x_s, y_s, x_q, y_q = make_few_shot_tasks(
        rng, 2, 20, 120, 1, k_eff=5, concentration=80.0)
    lambd = float(int(120 / 5) * 20)
    for hard in (False, True):
        kw = dict(n_iter=6, iter_mm=200, n_class=120, hard=hard,
                  solver="minka", compact=True)
        u_tk, _ = em_dirichlet_fs_infer(
            jnp.asarray(x_s), jnp.asarray(x_q), jnp.asarray(y_s),
            jnp.float32(lambd), select="topk", **kw)
        u_rk, _ = em_dirichlet_fs_infer(
            jnp.asarray(x_s), jnp.asarray(x_q), jnp.asarray(y_s),
            jnp.float32(lambd), select="rank", **kw)
        np.testing.assert_array_equal(
            np.asarray(u_tk).argmax(-1), np.asarray(u_rk).argmax(-1),
            err_msg=f"hard={hard}",
        )
        np.testing.assert_allclose(np.asarray(u_tk), np.asarray(u_rk),
                                   atol=1e-5)


def _mixed_convergence_tasks(rng, n_task=8, n_query=20, n_class=120):
    """Tasks with deliberately heterogeneous convergence speed: most are
    sharply peaked (converge in a few EM iterations), the last two are
    flatter (straggle near the tolerance) — the regime task compaction
    targets."""
    x_fast, _ = make_simplex_tasks(
        rng, n_task=n_task - 2, n_query=n_query, n_class=n_class, k_eff=5,
        concentration=80.0)
    x_slow, _ = make_simplex_tasks(
        rng, n_task=2, n_query=n_query, n_class=n_class, k_eff=5,
        concentration=15.0)
    return np.concatenate([x_fast, x_slow], axis=0)


def test_task_compaction_matches_batch_max_schedule(rng):
    """compact_tasks gathers straggler tasks into a narrow buffer once at
    most that many remain unconverged; predictions must match the batch-max
    early-stop schedule (compact_tasks=0) and the no-early-stop run."""
    x = _mixed_convergence_tasks(rng)
    lambd = float(int(120 / 5) * 20)
    for hard in (False, True):
        kw = dict(n_iter=20, iter_mm=200, hard=hard, solver="minka",
                  compact=True, compact_first=True, return_n_iter=True)
        u_ref, c_ref, it_ref, _ = em_dirichlet_infer(
            jnp.asarray(x), jnp.float32(lambd), compact_tasks=0, **kw)
        u_tc, c_tc, it_tc, _ = em_dirichlet_infer(
            jnp.asarray(x), jnp.float32(lambd), compact_tasks=2, **kw)
        np.testing.assert_array_equal(
            np.asarray(u_ref).argmax(-1), np.asarray(u_tc).argmax(-1),
            err_msg=f"hard={hard}",
        )
        # trace keeps length n_iter, stays finite, iteration count bounded
        assert np.asarray(c_tc).shape == (20,)
        assert np.isfinite(np.asarray(c_tc)).all()
        assert int(it_tc) <= 20
        # exact (no-early-stop, no compaction of any kind) cross-check
        u_ex, _ = em_dirichlet_infer(
            jnp.asarray(x), jnp.float32(lambd), n_iter=20, iter_mm=200,
            hard=hard, solver="minka", compact=False, early_stop=False)
        np.testing.assert_array_equal(
            np.asarray(u_ex).argmax(-1), np.asarray(u_tc).argmax(-1),
            err_msg=f"hard={hard} vs exact",
        )


def test_task_compaction_uncompacted_cluster_path(rng):
    """Task compaction composes with compact=False (full-width cluster
    solves): the phase-2 narrow loop reuses the full step."""
    x = _mixed_convergence_tasks(rng, n_class=40)
    lambd = float(int(40 / 5) * 20)
    kw = dict(n_iter=20, iter_mm=200, hard=False, solver="minka",
              compact=False)
    u_ref, _ = em_dirichlet_infer(jnp.asarray(x), jnp.float32(lambd),
                                  compact_tasks=0, **kw)
    u_tc, _ = em_dirichlet_infer(jnp.asarray(x), jnp.float32(lambd),
                                 compact_tasks=2, **kw)
    np.testing.assert_array_equal(
        np.asarray(u_ref).argmax(-1), np.asarray(u_tc).argmax(-1))


def test_task_compaction_on_mesh(rng):
    """The straggler gather/scatter must compose with a (dp, tp) mesh (tasks
    dp-sharded; the narrow buffer respans dp)."""
    import jax
    from jax.sharding import Mesh

    devs = np.array(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devs, ("dp", "tp"))
    x = _mixed_convergence_tasks(rng)
    lambd = float(int(120 / 5) * 20)
    kw = dict(n_iter=12, iter_mm=200, hard=False, solver="minka",
              compact=True, compact_first=True)
    u_1d, _ = em_dirichlet_infer(jnp.asarray(x), jnp.float32(lambd),
                                 compact_tasks=4, **kw)
    u_m, _ = em_dirichlet_infer(jnp.asarray(x), jnp.float32(lambd),
                                compact_tasks=4, mesh=mesh, **kw)
    np.testing.assert_array_equal(
        np.asarray(u_1d).argmax(-1), np.asarray(u_m).argmax(-1))
    np.testing.assert_allclose(np.asarray(u_1d), np.asarray(u_m), atol=1e-5)


def test_guard_does_not_fire_inside_deferred_dispatch(rng):
    """``run_task_deferred`` must never host the compact_first guard: its
    duplicate solve + device_sync would be billed to the deferred
    pipeline's timed tail (the untimed-overhead exclusion only exists in
    blocking ``run_task``). The batch counter still advances, and a later
    blocking batch (the evaluator routes one every
    ``compact_first_recheck`` batches) runs the due check."""
    from transductive_clip_tpu.core.config import CfgNode
    from transductive_clip_tpu.methods import get_zero_shot_method

    n_class, n_query = 300, 20
    x_peaked, y_peaked = make_simplex_tasks(
        rng, n_task=4, n_query=n_query, n_class=n_class, k_eff=6,
        concentration=60.0
    )
    x_flat, y_flat = _flat_feature_tasks(
        rng, n_task=4, n_query=n_query, n_class=n_class
    )
    cfg = CfgNode(dict(
        name_method="EM_DIRICHLET", n_class=n_class,
        num_classes_test=n_class, n_query=n_query, T=30,
        use_softmax_feature=True, graph_matching=False, iter=8, iter_mm=300,
        dirichlet_solver="minka", compact_clusters=True, early_stop=False,
        compact_first_recheck=1,
    ))
    method = get_zero_shot_method("EM_DIRICHLET", args=cfg)
    method.run_task({"x_q": x_peaked, "y_q": y_peaked[..., None]})
    assert method.compact_first is True

    import warnings

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        res = method.run_task_deferred(
            {"x_q": x_flat, "y_q": y_flat[..., None]})
    assert res is not None
    assert not any("compact_first_iter deviated" in str(w.message)
                   for w in caught)
    assert method.compact_first is True          # guard did NOT run here
    assert method._cf_batches_since_check >= 1   # but the cadence advanced

    # the next blocking batch hosts the due re-check and catches the drift
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        method.run_task({"x_q": x_flat, "y_q": y_flat[..., None]})
    assert any("compact_first_iter deviated" in str(w.message)
               for w in caught)
    assert method.compact_first is False


def test_forced_guard_check_runs_on_next_blocking_batch(rng):
    """``request_guard_check`` (the evaluator's routing hook) must force the
    guard on the next blocking batch regardless of the internal counter,
    and a tripped guard must drop any cached fused program (it was traced
    with compact_first=True)."""
    from transductive_clip_tpu.core.config import CfgNode
    from transductive_clip_tpu.methods import get_zero_shot_method

    n_class, n_query = 300, 20
    x_peaked, y_peaked = make_simplex_tasks(
        rng, n_task=4, n_query=n_query, n_class=n_class, k_eff=6,
        concentration=60.0
    )
    x_flat, y_flat = _flat_feature_tasks(
        rng, n_task=4, n_query=n_query, n_class=n_class
    )
    cfg = CfgNode(dict(
        name_method="EM_DIRICHLET", n_class=n_class,
        num_classes_test=n_class, n_query=n_query, T=30,
        use_softmax_feature=True, graph_matching=False, iter=8, iter_mm=300,
        dirichlet_solver="minka", compact_clusters=True, early_stop=False,
        compact_first_recheck=1000,   # cadence alone would never fire
    ))
    method = get_zero_shot_method("EM_DIRICHLET", args=cfg)
    assert method.guard_recheck_batches() == 1000
    method.run_task({"x_q": x_peaked, "y_q": y_peaked[..., None]})
    method._fused_zs = object()       # stand-in for a cached fused program

    import warnings

    method.request_guard_check()
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        method.run_task({"x_q": x_flat, "y_q": y_flat[..., None]})
    assert any("compact_first_iter deviated" in str(w.message)
               for w in caught)
    assert method.compact_first is False
    assert method._fused_zs is None   # stale trace invalidated
    assert method._cf_force_guard is False
    assert method.guard_recheck_batches() == 0   # fast path off -> no cadence

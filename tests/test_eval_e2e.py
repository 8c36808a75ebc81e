"""End-to-end evaluator tests on synthetic feature caches (no CLIP model)."""

import os

import numpy as np
import pytest

from transductive_clip_tpu.core.config import load_full_config
from transductive_clip_tpu.eval import EvaluatorFewShot, EvaluatorZeroShot
from transductive_clip_tpu.features.cache import save_feature_cache

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIG_ROOT = os.path.join(REPO, "config")


def synth_features(rng, n_per_class=40, n_class=10, concentration=60.0):
    feats, labels = [], []
    for c in range(n_class):
        alpha = np.ones(n_class)
        alpha[c] += concentration
        feats.append(rng.dirichlet(alpha, size=n_per_class).astype(np.float32))
        labels.append(np.full(n_per_class, c, np.int64))
    return np.concatenate(feats), np.concatenate(labels)


@pytest.fixture
def cfg_base(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)

    def make(**over):
        opts = []
        for k, v in over.items():
            opts += [k, str(v)]
        cfg = load_full_config(opts=opts, config_root=CONFIG_ROOT)
        cfg.save_results = True
        return cfg

    return make


def test_zero_shot_end_to_end(cfg_base, rng, tmp_path):
    cfg = cfg_base(
        dataset="eurosat", method="hard_em_dirichlet", shots=0,
        number_tasks=4, batch_size=2, n_query=30, seed=0, iter=6, iter_mm=100,
    )
    feats, labels = synth_features(rng)
    save_feature_cache(
        os.path.join("data", "eurosat", "saved_features",
                     "test_softmax_RN50_T30.plk"),
        feats, labels,
    )
    ev = EvaluatorZeroShot(args=cfg)
    acc, t = ev.run_full_evaluation()
    assert acc > 0.9
    out = os.path.join(
        "results_zero_shot", "test", "eurosat",
        "HARD_EM_DIRICHLET_softmax_0shot.txt",
    )
    assert os.path.exists(out)
    assert str(round(100 * acc, 1)) in open(out).read()


def test_few_shot_end_to_end_with_tuning(cfg_base, rng):
    cfg = cfg_base(
        dataset="eurosat", method="paddle", shots=2,
        number_tasks=4, batch_size=2, n_query=30, seed=0, iter=8,
    )
    feats_q, labels_q = synth_features(rng)
    feats_s, labels_s = synth_features(rng)
    save_feature_cache(
        os.path.join("data", "eurosat", "saved_features",
                     "test_softmax_RN50_T30.plk"), feats_q, labels_q)
    save_feature_cache(
        os.path.join("data", "eurosat", "saved_features",
                     "train_softmax_RN50_T30.plk"), feats_s, labels_s)
    # stored val grid -> the tuner must pick lambd = 5.0 (argmax row)
    os.makedirs(os.path.join("results_few_shot", "val", "eurosat"))
    with open(os.path.join("results_few_shot", "val", "eurosat",
                           "PADDLE_softmax_s2.txt"), "w") as f:
        f.write("val_param\tacc\n0.0\t10.0\t\n1.0\t50.0\t\n5.0\t80.0\t\n10.0\t70.0\t\n")
    ev = EvaluatorFewShot(args=cfg)
    acc, t = ev.run_full_evaluation()
    assert cfg.lambd == 5.0
    assert acc > 0.9


def test_few_shot_val_sweep_appends_grid(cfg_base, rng):
    cfg = cfg_base(
        dataset="eurosat", method="bdcspn", shots=2, used_test_set="val",
        number_tasks=2, batch_size=2, n_query=20, seed=0, temp=20.0,
    )
    feats_q, labels_q = synth_features(rng)
    feats_s, labels_s = synth_features(rng)
    save_feature_cache(
        os.path.join("data", "eurosat", "saved_features",
                     "val_softmax_RN50_T30.plk"), feats_q, labels_q)
    save_feature_cache(
        os.path.join("data", "eurosat", "saved_features",
                     "train_softmax_RN50_T30.plk"), feats_s, labels_s)
    ev = EvaluatorFewShot(args=cfg)
    ev.run_full_evaluation()
    grid = open(os.path.join("results_few_shot", "val", "eurosat",
                             "BDCSPN_softmax_s2.txt")).read()
    assert grid.startswith("val_param\tacc")
    assert "20.0\t" in grid


def test_zero_shot_visual_features_end_to_end(cfg_base, rng):
    """Visual-embedding path: cached visual features + cached text
    prototypes flow through init, clustering, and text-sim matching."""
    from transductive_clip_tpu.core.io import save_pickle

    cfg = cfg_base(
        dataset="eurosat", method="hard_kmeans", shots=0,
        number_tasks=4, batch_size=2, n_query=30, seed=0, iter=8,
        use_softmax_feature=False,
    )
    d, K = 16, 10
    text = rng.normal(size=(K, d)).astype(np.float32)
    text /= np.linalg.norm(text, axis=-1, keepdims=True)
    feats, labels = [], []
    for c in range(K):
        f = text[c] + 0.05 * rng.normal(size=(40, d)).astype(np.float32)
        feats.append(f / np.linalg.norm(f, axis=-1, keepdims=True))
        labels.append(np.full(40, c, np.int64))
    save_feature_cache(
        os.path.join("data", "eurosat", "saved_features", "test_visual_RN50.plk"),
        np.concatenate(feats), np.concatenate(labels),
    )
    os.makedirs(os.path.join("data", "eurosat", "saved_features"), exist_ok=True)
    save_pickle(
        os.path.join("data", "eurosat", "saved_features", "text_RN50.plk"),
        {"text_features": text},
    )
    ev = EvaluatorZeroShot(args=cfg)
    acc, _ = ev.run_full_evaluation()   # model=None: everything from caches
    assert acc > 0.9


def test_defer_fetch_matches_blocking(cfg_base, rng):
    """The deferred-fetch pipeline (async dispatch, one end-of-eval
    device_get) must reproduce the blocking per-batch path exactly: same
    seed -> same tasks -> identical mean accuracy."""
    feats_q, labels_q = synth_features(rng)
    feats_s, labels_s = synth_features(rng)

    def zs(defer):
        cfg = cfg_base(dataset="eurosat", method="em_dirichlet", shots=0,
                       number_tasks=6, batch_size=2, n_query=30, seed=3,
                       iter=6, iter_mm=100)
        cfg.defer_fetch = defer
        cfg.matching_backend = "device"   # fully-on-device accuracy path
        return EvaluatorZeroShot(args=cfg).evaluate_tasks(feats_q, labels_q)

    acc_defer, t_defer = zs(True)
    acc_block, _ = zs(False)
    assert abs(acc_defer - acc_block) < 1e-7
    assert t_defer > 0

    def fs(defer):
        cfg = cfg_base(dataset="eurosat", method="em_dirichlet", shots=2,
                       number_tasks=6, batch_size=2, n_query=30, seed=3,
                       iter=6, iter_mm=100, tunable=False)
        cfg.defer_fetch = defer
        return EvaluatorFewShot(args=cfg).evaluate_tasks(
            feats_s, labels_s, feats_q, labels_q)

    acc_defer, _ = fs(True)
    acc_block, _ = fs(False)
    assert abs(acc_defer - acc_block) < 1e-7


def test_defer_fetch_host_matching_falls_back(cfg_base, rng):
    """defer_fetch with a host-side matching backend cannot defer; the
    evaluator must fall back to the blocking path and still be exact."""
    feats_q, labels_q = synth_features(rng)

    def zs(defer, backend):
        cfg = cfg_base(dataset="eurosat", method="em_dirichlet", shots=0,
                       number_tasks=4, batch_size=2, n_query=30, seed=5,
                       iter=6, iter_mm=100)
        cfg.defer_fetch = defer
        cfg.matching_backend = backend
        return EvaluatorZeroShot(args=cfg).evaluate_tasks(feats_q, labels_q)

    acc_defer, _ = zs(True, "host")
    acc_block, _ = zs(False, "host")
    assert abs(acc_defer - acc_block) < 1e-7


def test_device_gather_matches_host_path(cfg_base, rng):
    """Device-resident gather + constant-flip remap must reproduce the host
    generator path exactly (same seed -> same tasks -> same accuracy)."""
    feats_q, labels_q = synth_features(rng)
    feats_s, labels_s = synth_features(rng)

    def zs(dg):
        cfg = cfg_base(dataset="eurosat", method="hard_em_dirichlet", shots=0,
                       number_tasks=4, batch_size=2, n_query=30, seed=7,
                       iter=6, iter_mm=100)
        cfg.device_gather = dg
        return EvaluatorZeroShot(args=cfg).evaluate_tasks(feats_q, labels_q)

    acc_dev, _ = zs(True)
    acc_host, _ = zs(False)
    assert abs(acc_dev - acc_host) < 1e-6

    def fs(dg):
        cfg = cfg_base(dataset="eurosat", method="em_dirichlet", shots=2,
                       number_tasks=4, batch_size=2, n_query=30, seed=7,
                       iter=6, iter_mm=100, tunable=False)
        cfg.device_gather = dg
        return EvaluatorFewShot(args=cfg).evaluate_tasks(
            feats_s, labels_s, feats_q, labels_q)

    acc_dev, _ = fs(True)
    acc_host, _ = fs(False)
    assert abs(acc_dev - acc_host) < 1e-6


def test_fused_dispatch_matches_deferred_and_blocking(cfg_base, rng):
    """run_task_fused (one program per batch: gather + method + accuracy)
    must reproduce both the per-program deferred path and the blocking path
    exactly — same seed -> same tasks -> identical mean accuracy — for a
    clustering-accuracy method and the direct-accuracy baseline."""
    feats_q, labels_q = synth_features(rng)

    def zs(method, fused, defer=True):
        cfg = cfg_base(dataset="eurosat", method=method, shots=0,
                       number_tasks=6, batch_size=2, n_query=30, seed=11,
                       iter=6, iter_mm=100)
        cfg.defer_fetch = defer
        cfg.fused_dispatch = fused
        cfg.matching_backend = "device"
        return EvaluatorZeroShot(args=cfg).evaluate_tasks(feats_q, labels_q)

    for method in ("em_dirichlet", "inductive_clip"):
        acc_fused, t_fused = zs(method, True)
        acc_defer, _ = zs(method, False)
        acc_block, _ = zs(method, False, defer=False)
        assert abs(acc_fused - acc_defer) < 1e-7, method
        assert abs(acc_fused - acc_block) < 1e-7, method
        assert t_fused > 0


def test_fused_dispatch_host_matching_falls_back(cfg_base, rng):
    """A host matching backend cannot fuse; the evaluator must fall back to
    the (blocking) host path and stay exact."""
    feats_q, labels_q = synth_features(rng)

    def zs(fused):
        cfg = cfg_base(dataset="eurosat", method="em_dirichlet", shots=0,
                       number_tasks=4, batch_size=2, n_query=30, seed=5,
                       iter=6, iter_mm=100)
        cfg.defer_fetch = True
        cfg.fused_dispatch = fused
        cfg.matching_backend = "host"
        return EvaluatorZeroShot(args=cfg).evaluate_tasks(feats_q, labels_q)

    acc_fused, _ = zs(True)
    acc_plain, _ = zs(False)
    assert abs(acc_fused - acc_plain) < 1e-7


def test_fused_dispatch_few_shot_matches_deferred_and_blocking(cfg_base, rng):
    """Few-shot run_task_fused (gathers + flip remap + method + accuracy in
    one program) must reproduce the per-program deferred and blocking paths
    exactly, for an EM method and a non-iterative one."""
    feats_q, labels_q = synth_features(rng)
    feats_s, labels_s = synth_features(rng)

    def fs(method, fused, defer=True):
        cfg = cfg_base(dataset="eurosat", method=method, shots=2,
                       number_tasks=6, batch_size=2, n_query=30, seed=13,
                       iter=6, iter_mm=100, tunable=False)
        cfg.defer_fetch = defer
        cfg.fused_dispatch = fused
        return EvaluatorFewShot(args=cfg).evaluate_tasks(
            feats_s, labels_s, feats_q, labels_q)

    for method in ("em_dirichlet", "bdcspn"):
        acc_fused, t_fused = fs(method, True)
        acc_defer, _ = fs(method, False)
        acc_block, _ = fs(method, False, defer=False)
        assert abs(acc_fused - acc_defer) < 1e-7, method
        assert abs(acc_fused - acc_block) < 1e-7, method
        assert t_fused > 0


def test_fused_and_flush_config_parsing():
    """String config spellings from --opts must parse correctly:
    fused_dispatch 'false' disables the fused path (bool('false') is True —
    the raw-bool bug this pins), and the resolvers share semantics."""
    from transductive_clip_tpu.core.config import CfgNode
    from transductive_clip_tpu.eval.zero_shot import resolve_fused_dispatch

    assert resolve_fused_dispatch(CfgNode({}), True) is True        # auto
    assert resolve_fused_dispatch(CfgNode({}), False) is False
    for spelling in ("false", "False", False):
        cfg = CfgNode({"fused_dispatch": spelling})
        assert resolve_fused_dispatch(cfg, True) is False, spelling
    for spelling in ("true", "True", True):
        cfg = CfgNode({"fused_dispatch": spelling})
        assert resolve_fused_dispatch(cfg, True) is True, spelling
        assert resolve_fused_dispatch(cfg, False) is False  # needs gather


def test_defer_flush_batches_is_exact(cfg_base, rng):
    """Flushing the deferred queue every batch must reproduce the
    one-fetch-at-end evaluation exactly (same seed -> same tasks)."""
    feats_q, labels_q = synth_features(rng)

    def zs(flush):
        cfg = cfg_base(dataset="eurosat", method="em_dirichlet", shots=0,
                       number_tasks=8, batch_size=2, n_query=30, seed=17,
                       iter=6, iter_mm=100)
        cfg.defer_fetch = True
        cfg.matching_backend = "device"
        cfg.defer_flush_batches = flush
        return EvaluatorZeroShot(args=cfg).evaluate_tasks(feats_q, labels_q)

    acc_end, _ = zs(0)
    acc_every, _ = zs(1)
    acc_two, _ = zs(2)
    assert abs(acc_end - acc_every) < 1e-7
    assert abs(acc_end - acc_two) < 1e-7


def test_fused_fallback_recomputes_prototype_rows(cfg_base, rng, monkeypatch):
    """When the device auction exhausts its budget (ok=False), the fused
    path re-dispatches the cached program to pull the prototype rows and
    host-solves the exact matching — the handles no longer pin the big
    [N, R, C] buffers per batch. Forcing the auction to fail must still
    give the host-JV answer."""
    import transductive_clip_tpu.ops.auction as auction

    feats_q, labels_q = synth_features(rng)

    def zs(fused, backend, defer=True):
        cfg = cfg_base(dataset="eurosat", method="em_dirichlet", shots=0,
                       number_tasks=4, batch_size=2, n_query=30, seed=23,
                       iter=6, iter_mm=100)
        cfg.defer_fetch = defer
        cfg.fused_dispatch = fused
        cfg.matching_backend = backend
        return EvaluatorZeroShot(args=cfg).evaluate_tasks(feats_q, labels_q)

    acc_host, _ = zs(False, "host", defer=False)    # reference: host JV

    real = auction.auction_assign

    def failing_auction(probs, *a, **kw):
        import jax.numpy as jnp

        return jnp.full(real(probs, *a, **kw).shape, -1, jnp.int32)

    monkeypatch.setattr(auction, "auction_assign", failing_auction)
    acc_fused, _ = zs(True, "device")
    assert abs(acc_fused - acc_host) < 1e-7


def test_few_shot_fused_visual_features_need_text(cfg_base, rng):
    """Visual-feature few-shot methods must refuse the fused path when no
    text features are supplied (run_task raises there; planting zeros would
    silently produce a uniform init)."""
    import jax.numpy as jnp

    from transductive_clip_tpu.methods import get_few_shot_method

    cfg = cfg_base(dataset="eurosat", method="paddle", shots=2,
                   number_tasks=2, batch_size=2, n_query=20, tunable=False)
    cfg.use_softmax_feature = False
    method = get_few_shot_method(cfg.name_method, args=cfg)
    feats = jnp.zeros((40, 8), jnp.float32)
    labs = jnp.zeros((40,), jnp.int32)
    idx = np.zeros((2, 20), np.int32)
    res = method.run_task_fused(feats, feats, labs, labs, idx, idx,
                                shot=2, text_features=None)
    assert res is None


def test_evaluator_routes_periodic_guard_through_blocking_batches(
        cfg_base, rng, monkeypatch):
    """The deferred/fused pipelines never re-execute the method's Python
    ``_infer`` (the fused program is a cached jit trace), so the
    compact_first periodic re-check cannot fire inside them. The evaluator
    must route every ``compact_first_recheck``-th batch through blocking
    ``run_task`` with the guard forced — counted here via the exact
    duplicate solves (``_run_infer(..., compact_first=False)``)."""
    from transductive_clip_tpu.methods.zero_shot import em_dirichlet as em

    feats_q, labels_q = synth_features(rng, n_per_class=10, n_class=120)

    calls = []
    orig = em.EM_DIRICHLET._run_infer

    def spy(self, x_q, compact_first):
        calls.append(bool(compact_first))
        return orig(self, x_q, compact_first)

    monkeypatch.setattr(em.EM_DIRICHLET, "_run_infer", spy)

    cfg = cfg_base(dataset="eurosat", method="em_dirichlet", shots=0,
                   number_tasks=12, batch_size=2, n_query=20, seed=3,
                   iter=6, iter_mm=100)
    cfg.n_class = cfg.num_classes_test = 120
    cfg.matching_backend = "device"
    cfg.compact_first_recheck = 2
    acc, _ = EvaluatorZeroShot(args=cfg).evaluate_tasks(feats_q, labels_q)
    assert acc > 0.9
    # 6 batches at recheck=2: the first-batch guard (batch 0) plus the
    # routed re-check at batch 3 each run one exact duplicate solve; the
    # fused/deferred batches in between run none
    assert calls.count(False) == 2

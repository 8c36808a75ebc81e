"""Golden-task tests: on well-separated synthetic simplex tasks every
zero-shot method must recover the classes with high accuracy (the reference
has no tests; this is the strategy from SURVEY.md §4)."""

import numpy as np
import pytest

from transductive_clip_tpu.core.config import CfgNode
from transductive_clip_tpu.methods import get_zero_shot_method, ZERO_SHOT_METHODS


def make_cfg(n_class=8, **over):
    cfg = CfgNode(
        {
            "num_classes_test": n_class,
            "n_class": n_class,
            "n_query": 40,
            "iter": 10,
            "iter_mm": 400,
            "T": 30,
            "use_softmax_feature": True,
            "graph_matching": True,
            "seed": 0,
        }
    )
    cfg.update(over)
    return cfg


def run_method(name, simplex_tasks, **cfg_over):
    x, y = simplex_tasks
    cfg = make_cfg(**cfg_over)
    method = get_zero_shot_method(name, args=cfg)
    logs = method.run_task({"x_q": x, "y_q": y})
    return logs


@pytest.mark.parametrize(
    "name,min_acc",
    [
        ("EM_DIRICHLET", 0.9),
        ("HARD_EM_DIRICHLET", 0.9),
        ("HARD_KMEANS", 0.8),
        ("KL_KMEANS", 0.8),
        ("EM_GAUSSIAN_COV", 0.5),
        ("CLIP", 0.9),
    ],
)
def test_golden_accuracy(name, simplex_tasks, min_acc):
    logs = run_method(name, simplex_tasks)
    acc = logs["acc"][:, -1].mean()
    assert acc >= min_acc, f"{name}: {acc}"
    assert logs["acc"].shape[0] == simplex_tasks[0].shape[0]
    assert np.isfinite(logs["criterions"]).all()


def test_all_methods_run(simplex_tasks):
    for name in ZERO_SHOT_METHODS:
        logs = run_method(name, simplex_tasks, iter=3, iter_mm=60)
        assert logs["acc"].shape[1] >= 1
        assert 0.0 <= logs["acc"].mean() <= 1.0


def test_em_dirichlet_rejects_visual_features(simplex_tasks):
    x, y = simplex_tasks
    cfg = make_cfg(use_softmax_feature=False)
    method = get_zero_shot_method("EM_DIRICHLET", args=cfg)
    with pytest.raises(ValueError):
        method.run_task({"x_q": x, "y_q": y})


def test_visual_feature_init_path(rng):
    """Methods that accept visual features initialize u from text similarity."""
    n_task, n, d, K = 2, 30, 16, 5
    text_features = rng.normal(size=(K, d)).astype(np.float32)
    text_features /= np.linalg.norm(text_features, axis=-1, keepdims=True)
    y = rng.integers(0, K, size=(n_task, n))
    x = text_features[y] + 0.05 * rng.normal(size=(n_task, n, d)).astype(np.float32)
    cfg = make_cfg(n_class=K, use_softmax_feature=False, iter=5)
    method = get_zero_shot_method("HARD_KMEANS", args=cfg)
    logs = method.run_task({"x_q": x, "y_q": y, "text_features": text_features})
    assert logs["acc"][:, -1].mean() > 0.8


def test_timing_logs_reference_semantics(simplex_tasks):
    """logs carry both the honest total-per-task time and the reference's
    Table-2 metric (mean of cumulative per-iteration times,
    = total*(n+1)/2n under uniform cost). reference: em_dirichlet.py:242-244."""
    from transductive_clip_tpu.core.config import CfgNode
    from transductive_clip_tpu.methods import get_zero_shot_method

    x, y = simplex_tasks
    cfg = CfgNode(dict(
        name_method="EM_DIRICHLET", n_class=8, num_classes_test=8,
        n_query=x.shape[1], T=30, use_softmax_feature=True,
        graph_matching=False, iter=5, iter_mm=50, dirichlet_solver="minka",
        compact_clusters=False, early_stop=False,
    ))
    logs = get_zero_shot_method("EM_DIRICHLET", args=cfg).run_task(
        {"x_q": x, "y_q": y})
    n = len(logs["criterions"])
    assert n == 5
    cum = logs["timestamps_cumulative"]
    assert cum.shape == (n,)
    assert np.all(np.diff(cum) > 0)
    np.testing.assert_allclose(cum[-1], logs["timestamps"], rtol=1e-6)
    np.testing.assert_allclose(
        logs["timestamps_ref"],
        logs["timestamps"] * (n + 1) / (2 * n), rtol=1e-6,
    )


def test_timing_logs_exact_under_early_stop(simplex_tasks):
    """With early stopping, timestamps_ref must use the EXECUTED iteration
    count returned from the compiled loop's carry, not the configured
    schedule length (VERDICT r2 weak #7)."""
    import jax.numpy as jnp

    from transductive_clip_tpu.core.config import CfgNode
    from transductive_clip_tpu.methods import get_zero_shot_method
    from transductive_clip_tpu.methods.zero_shot.em_dirichlet import (
        em_dirichlet_infer,
    )

    x, y = simplex_tasks
    # these synthetic tasks' alpha drifts slowly (near-one-hot clusters push
    # the Dirichlet MLE scale up), so use a loose tolerance the trajectory
    # actually crosses — the mechanism under test is the count plumbing
    tol = 0.05
    kw = dict(n_iter=50, iter_mm=50, hard=False, solver="minka",
              compact=False, early_stop=True, early_stop_tol=jnp.float32(tol))
    _, _, n_exec, _pop = em_dirichlet_infer(
        jnp.asarray(x), jnp.float32(int(8 / 5) * x.shape[1]),
        return_n_iter=True, **kw,
    )
    n_exec = int(n_exec)
    assert 1 <= n_exec < 50, "tasks should converge well before 50 iters"

    cfg = CfgNode(dict(
        name_method="EM_DIRICHLET", n_class=8, num_classes_test=8,
        n_query=x.shape[1], T=30, use_softmax_feature=True,
        graph_matching=False, iter=50, iter_mm=50, dirichlet_solver="minka",
        compact_clusters=False, early_stop=True, early_stop_tol=tol,
    ))
    logs = get_zero_shot_method("EM_DIRICHLET", args=cfg).run_task(
        {"x_q": x, "y_q": y})
    # criterion trace stays padded to the configured length...
    assert len(logs["criterions"]) == 50
    # ...but the synthesized reference metric uses the executed count
    np.testing.assert_allclose(
        logs["timestamps_ref"],
        logs["timestamps"] * (n_exec + 1) / (2 * n_exec), rtol=1e-6,
    )
    assert logs["timestamps_cumulative"].shape == (n_exec,)


def test_accuracy_extras_ride_the_combined_fetch(simplex_tasks):
    """clustering_accuracy/direct_accuracy fetch caller extras in the same
    host round trip as the accuracy outputs, values passed through exactly
    (the run_task fusion that removes per-batch RTTs on tunneled links)."""
    import jax.numpy as jnp

    from transductive_clip_tpu.methods.base import (
        clustering_accuracy,
        direct_accuracy,
    )

    x, y = simplex_tasks
    u = jnp.asarray(x)
    cfg = make_cfg(graph_matching=True)
    ref_acc, ref_preds = clustering_accuracy(u, jnp.asarray(x), y, cfg)
    acc, preds, extras = clustering_accuracy(
        u, jnp.asarray(x), y, cfg, extras=(jnp.arange(3), None),
    )
    np.testing.assert_array_equal(np.asarray(acc), np.asarray(ref_acc))
    np.testing.assert_array_equal(preds, ref_preds)
    np.testing.assert_array_equal(np.asarray(extras[0]), [0, 1, 2])
    assert extras[1] is None

    ref_acc, ref_preds = direct_accuracy(u, y)
    acc, preds, extras = direct_accuracy(u, y, extras=(jnp.float32(2.5),))
    np.testing.assert_array_equal(np.asarray(acc), np.asarray(ref_acc))
    np.testing.assert_array_equal(preds, ref_preds)
    assert float(extras[0]) == 2.5


def test_deferred_compaction_warning_reaches_run_task(simplex_tasks,
                                                      monkeypatch):
    """The compaction sparsity check is deferred to run_task's combined
    fetch; forcing the compact width below the populated-cluster count must
    still surface the warning."""
    import transductive_clip_tpu.methods.zero_shot.em_dirichlet as em

    x, y = simplex_tasks
    monkeypatch.setattr(em, "compaction_geometry", lambda n, k: (2, True))
    em.em_dirichlet_infer.clear_cache()
    cfg = make_cfg(graph_matching=False, compact_clusters=True,
                   dirichlet_solver="minka", early_stop=False, iter=4,
                   compact_first_iter="False")
    method = get_zero_shot_method("EM_DIRICHLET", args=cfg)
    try:
        with pytest.warns(UserWarning, match="clusters carry mass"):
            method.run_task({"x_q": x, "y_q": y})
    finally:
        em.em_dirichlet_infer.clear_cache()


def test_timing_logs_width_weighted_under_task_compaction(rng):
    """With task compaction the phase-2 (narrow straggler) iterations cost
    ~compact_tasks/n_task of a full iteration, so synthesizing the
    reference-semantics cumulative trace as uniform would understate it
    and overstate the implied speedup. The method returns a split executed
    count and timing_logs weights the trace by iteration width."""
    import numpy as np

    from tests.test_compaction import _mixed_convergence_tasks
    from transductive_clip_tpu.core.config import CfgNode
    from transductive_clip_tpu.methods import get_zero_shot_method
    from transductive_clip_tpu.methods.base import timing_logs

    # unit: weighted vs uniform synthesis
    w = [100.0] * 5 + [8.0] * 15
    weighted = timing_logs(2.0, 1, 20, iter_widths=w)
    uniform = timing_logs(2.0, 1, 20)
    assert weighted["timestamps"] == uniform["timestamps"] == 2.0
    np.testing.assert_allclose(weighted["timestamps_cumulative"][-1], 2.0,
                               rtol=1e-9)
    assert weighted["timestamps_ref"] > uniform["timestamps_ref"]
    # hand check: mean of cumsum(w)/sum(w) * total
    expect = 2.0 * (np.cumsum(w) / np.sum(w)).mean()
    np.testing.assert_allclose(weighted["timestamps_ref"], expect, rtol=1e-9)

    # integration: a straggler batch under compact_tasks produces a
    # non-uniform cumulative trace whose late increments are the narrow
    # fraction of the early ones; compact_tasks=0 restores uniform
    n_class, n_query = 120, 20
    x = _mixed_convergence_tasks(rng, n_task=8, n_query=n_query,
                                 n_class=n_class)
    y = np.zeros(x.shape[:2], np.int64)
    base = dict(
        name_method="EM_DIRICHLET", n_class=n_class,
        num_classes_test=n_class, n_query=n_query, T=30,
        use_softmax_feature=True, graph_matching=False, iter=20, iter_mm=200,
        dirichlet_solver="minka", compact_clusters=True, early_stop=True,
        compact_first_iter=True,
    )
    logs_tc = get_zero_shot_method(
        "EM_DIRICHLET", args=CfgNode(dict(base, compact_tasks=2))
    ).run_task({"x_q": x, "y_q": y[..., None]})
    inc = np.diff(np.concatenate([[0.0], logs_tc["timestamps_cumulative"]]))
    assert len(inc) > 2 and inc[-1] < inc[0], \
        "narrow phase-2 increments must be cheaper than full-width ones"
    np.testing.assert_allclose(inc[-1] / inc[0], 2 / 8, rtol=1e-6)

    logs_u = get_zero_shot_method(
        "EM_DIRICHLET", args=CfgNode(dict(base, compact_tasks=0))
    ).run_task({"x_q": x, "y_q": y[..., None]})
    inc_u = np.diff(
        np.concatenate([[0.0], logs_u["timestamps_cumulative"]]))
    np.testing.assert_allclose(inc_u, inc_u[0], rtol=1e-6)


def test_softmax_feature_class_dim_mismatch_raises(simplex_tasks):
    """With softmax features the feature axis IS the class axis; a K !=
    n_class task dict must fail with a clear ValueError at run_task entry,
    not an opaque IndexError inside the cluster->class matching."""
    x, y = simplex_tasks                      # K = 8 columns
    cfg = make_cfg(n_class=12)                # mismatched class count
    method = get_zero_shot_method("EM_DIRICHLET", args=cfg)
    with pytest.raises(ValueError, match="n_class"):
        method.run_task({"x_q": x, "y_q": y})

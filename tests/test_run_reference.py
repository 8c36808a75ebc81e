"""Behavioral parity against the ACTUAL reference implementation.

torch is installed and the reference repo is readable, so these tests import
the reference's method classes (imported at test time — no code is copied)
and run them on the same synthetic task batches as our jitted methods, in
reference-exact configuration (solver='mm', no compaction, no early stop).
Accuracies must match and criterion trajectories must track.

Skipped automatically when /root/reference is not present (e.g. when this
repo is used standalone).
"""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE_ROOT = os.environ.get("REFERENCE_ROOT", "/root/reference")
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE_ROOT, "src")),
    reason="reference repo not available",
)

from transductive_clip_tpu.core.config import load_full_config
from transductive_clip_tpu.methods import (
    get_few_shot_method,
    get_zero_shot_method,
)
from transductive_clip_tpu.utils.synthetic import (
    make_few_shot_tasks,
    make_zero_shot_tasks,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIG_ROOT = os.path.join(REPO, "config")


@pytest.fixture(scope="module")
def reference():
    """Import the reference package (stubbing the absent `clip` wheel —
    only clip_weights touches it, and these tests never call that)."""
    sys.modules.setdefault("clip", types.ModuleType("clip"))
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import importlib

    return importlib.import_module


def make_cfg(method, shots, tmp_path, **over):
    opts = ["dataset", "eurosat", "method", method, "shots", str(shots)]
    for k, v in over.items():
        opts += [k, str(v)]
    cfg = load_full_config(opts=opts, config_root=CONFIG_ROOT)
    # reference-exact execution on our side
    cfg.dirichlet_solver = "mm"
    cfg.compact_clusters = False
    cfg.early_stop = False
    cfg.proto_device = True          # device prototypes are exact
    cfg.matching_backend = "host"    # same LAP optimum as scipy
    return cfg


N_TASK, N_QUERY, K = 4, 40, 8


def _zero_shot_case(reference, tmp_path, config_name, ref_module, ref_class,
                    graph_matching, seed=0, crit_rtol=5e-2):
    rng = np.random.default_rng(seed)
    x, y = make_zero_shot_tasks(rng, N_TASK, N_QUERY, K, k_eff=4,
                                concentration=30.0)
    cfg = make_cfg(config_name, 0, tmp_path,
                   num_classes_test=K, n_query=N_QUERY,
                   graph_matching=graph_matching)

    ours = get_zero_shot_method(cfg.name_method, args=cfg).run_task(
        {"x_q": x, "y_q": y})

    mod = reference(f"src.methods.zero_shot.{ref_module}")
    ref_cls = getattr(mod, ref_class)
    log_file = str(tmp_path / "ref.log")
    ref_method = ref_cls(model=None, device="cpu", log_file=log_file, args=cfg)
    ref_logs = ref_method.run_task({
        "x_q": torch.from_numpy(np.asarray(x, np.float32)),
        "y_q": torch.from_numpy(np.asarray(y)).unsqueeze(2),
    })

    acc_ref = np.asarray(ref_logs["acc"])[:, -1]
    acc_ours = np.asarray(ours["acc"])[:, -1]
    if graph_matching and "dirichlet" not in ref_module:
        # The k-means/Gaussian families collapse duplicate centroids on
        # separable tasks; duplicated clusters give exactly-tied assignments
        # whose argmax flips on fp32 noise (verified: |u_ours - u_ref| stays
        # < 3e-7 for all 20 iterations while argmax ties flip). One-to-one
        # graph matching then maps the tied duplicates to different classes
        # arbitrarily — the reference's own matched accuracy here depends on
        # torch version/hardware. Assert partition equivalence instead:
        # co-clustering agreement of the induced partitions.
        preds_ref = ref_method.u.argmax(2).numpy()
        preds_ours = np.asarray(ours["preds"])
        co_ref = preds_ref[:, :, None] == preds_ref[:, None, :]
        co_ours = preds_ours[:, :, None] == preds_ours[:, None, :]
        assert (co_ours == co_ref).mean() > 0.9
        np.testing.assert_allclose(acc_ours.mean(), acc_ref.mean(), atol=0.2)
    else:
        np.testing.assert_allclose(acc_ours, acc_ref, atol=1e-6)

    # criterion-trace tracking only for the Dirichlet pair: the k-means /
    # Gaussian reference classes record their criterion twice per iteration
    # or before the first update (SURVEY §2.4 quirks we intentionally do not
    # replicate), so their traces are index-shifted by construction.
    if "dirichlet" in ref_module:
        crit_ref = np.asarray(ref_logs["criterions"], np.float64)
        crit_ours = np.asarray(ours["criterions"], np.float64)
        if crit_ref.ndim > 1:
            crit_ref = crit_ref.mean(axis=tuple(range(1, crit_ref.ndim)))
        if crit_ours.ndim > 1:
            crit_ours = crit_ours.mean(axis=tuple(range(1, crit_ours.ndim)))
        n = min(3, len(crit_ref), len(crit_ours))
        # compare only above converged-tail noise
        sel = crit_ref[:n] > 1e-4
        np.testing.assert_allclose(
            crit_ours[:n][sel], crit_ref[:n][sel], rtol=crit_rtol
        )
    return ours, ref_logs


ZS_CASES = [
    ("em_dirichlet", "em_dirichlet", "EM_DIRICHLET"),
    ("hard_em_dirichlet", "hard_em_dirichlet", "HARD_EM_DIRICHLET"),
    ("soft_kmeans", "soft_kmeans", "SOFT_KMEANS"),
    ("hard_kmeans", "hard_kmeans", "HARD_KMEANS"),
    ("kl_kmeans", "kl_kmeans", "KL_KMEANS"),
    ("em_gaussian", "em_gaussian", "EM_GAUSSIAN"),
    ("em_gaussian_cov", "em_gaussian_cov", "EM_GAUSSIAN_COV"),
    ("inductive_clip", "inductive_clip", "CLIP"),
]


@pytest.mark.parametrize("config_name,ref_module,ref_class", ZS_CASES)
@pytest.mark.parametrize("graph_matching", [False, True])
def test_zero_shot_matches_reference(reference, tmp_path, config_name,
                                     ref_module, ref_class, graph_matching):
    _zero_shot_case(reference, tmp_path, config_name, ref_module, ref_class,
                    graph_matching)


FS_CASES = [
    ("em_dirichlet", "em_dirichlet", "EM_DIRICHLET", 1e-6, {}),
    ("hard_em_dirichlet", "hard_em_dirichlet", "HARD_EM_DIRICHLET", 1e-6, {}),
    ("paddle", "paddle", "PADDLE", 1e-6, {}),
    ("bdcspn", "bdcspn", "BDCSPN", 1e-6, {}),
    ("laplacian_shot", "laplacian_shot", "LAPLACIAN_SHOT", 1e-6, {}),
    ("alpha_tim", "tim", "ALPHA_TIM", 0.02, {}),
    # bf16-MXU fast path: must stay accuracy-equivalent to the reference
    ("alpha_tim", "tim", "ALPHA_TIM", 0.02,
     {"tim_matmul_precision": "default"}),
]


@pytest.mark.parametrize("config_name,ref_module,ref_class,acc_tol,extra",
                         FS_CASES)
def test_few_shot_matches_reference(reference, tmp_path, config_name,
                                    ref_module, ref_class, acc_tol, extra):
    shots = 2
    rng = np.random.default_rng(1)
    xs, ys, xq, yq = make_few_shot_tasks(
        rng, N_TASK, n_query=N_QUERY, n_class=K, shots=shots, k_eff=4,
        concentration=30.0,
    )
    cfg = make_cfg(config_name, shots, tmp_path,
                   num_classes_test=K, n_query=N_QUERY, k_eff=4,
                   batch_size=N_TASK)
    for k_, v_ in extra.items():
        cfg[k_] = v_

    ours = get_few_shot_method(cfg.name_method, args=cfg).run_task(
        {"x_s": xs, "y_s": ys, "x_q": xq, "y_q": yq}, shot=shots)

    mod = reference(f"src.methods.few_shot.{ref_module}")
    ref_cls = getattr(mod, ref_class)
    log_file = str(tmp_path / "ref.log")
    # environment shims for reference quirks (SURVEY §2.4): np.float crash
    # in laplacian_shot, and TIM calling model.eval() on the frozen model
    if not hasattr(np, "float"):
        np.float = float  # noqa: NPY001 — removed alias the reference uses
    dummy_model = types.SimpleNamespace(eval=lambda: None, train=lambda: None)
    ref_method = ref_cls(model=dummy_model, device="cpu", log_file=log_file,
                         args=cfg)
    ref_logs = ref_method.run_task({
        "x_s": torch.from_numpy(np.asarray(xs, np.float32)),
        "y_s": torch.from_numpy(np.asarray(ys)).unsqueeze(2),
        "x_q": torch.from_numpy(np.asarray(xq, np.float32)),
        "y_q": torch.from_numpy(np.asarray(yq)).unsqueeze(2),
    }, shot=shots)

    acc_ref = np.asarray(ref_logs["acc"])[:, -1]
    acc_ours = np.asarray(ours["acc"])[:, -1]
    np.testing.assert_allclose(acc_ours, acc_ref, atol=acc_tol)


@pytest.mark.parametrize("hard", [False, True])
def test_few_shot_compact_drained_rows_match_reference(reference, tmp_path,
                                                       hard):
    """The PRODUCTION compact path (not the reference-exact config) against
    the reference torch class, in the drained-row regime: near-flat query
    features at K large enough to engage cluster compaction, where most
    class rows' query mass underflows to exact zero after iteration 1 and
    the reference's full-width re-solve moves them to the pure-support
    fixed point. The compact path's alpha_base substitution must track
    that — accuracies equal, posteriors close, criterion trace tracking
    (methods/few_shot/em_dirichlet.py drained-row design)."""
    shots, n_query, n_class = 2, 20, 120   # K > 2*(n_query+16) -> compaction
    rng = np.random.default_rng(7)
    ys = np.tile(np.repeat(np.arange(n_class), shots), (N_TASK, 1))

    def feats(labels, conc):
        out = np.zeros((*labels.shape, n_class), np.float32)
        for t in range(labels.shape[0]):
            for i, c in enumerate(labels[t]):
                a = np.ones(n_class)
                a[c] += conc
                out[t, i] = rng.dirichlet(a)
        return out

    xs = feats(ys, 60.0)
    yq = rng.integers(0, 5, (N_TASK, n_query))
    xq = feats(yq, 5.0)                    # near-flat: drained-row regime

    config_name = "hard_em_dirichlet" if hard else "em_dirichlet"
    cfg = make_cfg(config_name, shots, tmp_path,
                   num_classes_test=n_class, n_query=n_query, k_eff=5,
                   batch_size=N_TASK, iter=6, iter_mm=200)
    # production shortcuts ON (make_cfg turned them off for exact runs)
    cfg.compact_clusters = True
    cfg.early_stop = False                 # fixed schedule, same as the ref

    ours = get_few_shot_method(cfg.name_method, args=cfg).run_task(
        {"x_s": xs, "y_s": ys, "x_q": xq, "y_q": yq}, shot=shots)

    mod = reference(f"src.methods.few_shot.{config_name}")
    ref_cls = getattr(mod, cfg.name_method)
    dummy_model = types.SimpleNamespace(eval=lambda: None, train=lambda: None)
    ref_method = ref_cls(model=dummy_model, device="cpu",
                         log_file=str(tmp_path / "ref.log"), args=cfg)
    ref_logs = ref_method.run_task({
        "x_s": torch.from_numpy(np.asarray(xs, np.float32)),
        "y_s": torch.from_numpy(np.asarray(ys)).unsqueeze(2),
        "x_q": torch.from_numpy(np.asarray(xq, np.float32)),
        "y_q": torch.from_numpy(np.asarray(yq)).unsqueeze(2),
    }, shot=shots)

    np.testing.assert_allclose(np.asarray(ours["acc"])[:, -1],
                               np.asarray(ref_logs["acc"])[:, -1],
                               atol=1e-6)
    u_ref = ref_method.u.numpy()
    np.testing.assert_array_equal(np.asarray(ours["u"]).argmax(-1)
                                  if "u" in ours else
                                  np.asarray(ours["preds"]),
                                  u_ref.argmax(-1))
    crit_ref = np.asarray(ref_logs["criterions"], np.float64).reshape(-1)
    crit_ours = np.asarray(ours["criterions"], np.float64).reshape(-1)
    n = min(4, len(crit_ref), len(crit_ours))
    sel = crit_ref[:n] > 1e-4
    np.testing.assert_allclose(crit_ours[:n][sel], crit_ref[:n][sel],
                               rtol=5e-2)

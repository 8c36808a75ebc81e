#!/usr/bin/env python
"""Freeze golden parity fixtures from the REFERENCE implementation.

Runs the reference's method classes (torch, CPU — imported from
$REFERENCE_ROOT, default /root/reference) on deterministic synthetic task
batches and stores their outputs (final accuracies, criterion traces,
matched predictions) in tests/fixtures/reference_traces.npz. The committed
fixture lets tests/test_golden_traces.py assert reference parity in
environments where the reference repo and/or torch are NOT available —
tests/test_run_reference.py does the same comparison live when they are.

Inputs are regenerated from seeds at test time, so only outputs are stored.

    JAX_PLATFORM_NAME=cpu python scripts/make_reference_fixtures.py
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REFERENCE_ROOT = os.environ.get("REFERENCE_ROOT", "/root/reference")
OUT = os.path.join(REPO, "tests", "fixtures", "reference_traces.npz")

# deterministic scenario shared with tests/test_golden_traces.py
# (concentration 12: hard enough that accuracies differ from 1.0 and
# fingerprint the exact trajectory)
# seeds match tests/test_run_reference.py (the reference's
# LaplacianShot NaNs on some other seeds via its sklearn KNN input)
N_TASK, N_QUERY, K, SHOTS, ZS_SEED, FS_SEED = 4, 40, 8, 2, 0, 1

ZS_METHODS = [
    ("em_dirichlet", "EM_DIRICHLET"),
    ("hard_em_dirichlet", "HARD_EM_DIRICHLET"),
    ("soft_kmeans", "SOFT_KMEANS"),
    ("hard_kmeans", "HARD_KMEANS"),
    ("kl_kmeans", "KL_KMEANS"),
    ("em_gaussian", "EM_GAUSSIAN"),
    ("em_gaussian_cov", "EM_GAUSSIAN_COV"),
    ("inductive_clip", "CLIP"),
]
FS_METHODS = [
    ("em_dirichlet", "EM_DIRICHLET"),
    ("hard_em_dirichlet", "HARD_EM_DIRICHLET"),
    ("paddle", "PADDLE"),
    ("bdcspn", "BDCSPN"),
    ("laplacian_shot", "LAPLACIAN_SHOT"),
]


def make_cfg(method, shots):
    from transductive_clip_tpu.core.config import load_full_config

    cfg = load_full_config(
        opts=["dataset", "eurosat", "method", method, "shots", str(shots),
              "num_classes_test", str(K), "n_query", str(N_QUERY),
              "k_eff", "4", "batch_size", str(N_TASK)],
        config_root=os.path.join(REPO, "config"),
    )
    return cfg


def main():
    import torch

    sys.modules.setdefault("clip", types.ModuleType("clip"))
    sys.path.insert(0, REFERENCE_ROOT)
    if not hasattr(np, "float"):
        np.float = float  # reference laplacian_shot uses the removed alias

    from transductive_clip_tpu.utils.synthetic import (
        make_few_shot_tasks,
        make_zero_shot_tasks,
    )

    out = {}
    rng = np.random.default_rng(ZS_SEED)
    x, y = make_zero_shot_tasks(rng, N_TASK, N_QUERY, K, k_eff=4,
                                concentration=12.0)
    import importlib

    for module, cls in ZS_METHODS:
        cfg = make_cfg(module, 0)
        cfg.graph_matching = False  # basic matching: tie-break independent
        mod = importlib.import_module(f"src.methods.zero_shot.{module}")
        m = getattr(mod, cls)(model=None, device="cpu",
                              log_file="/tmp/fixt.log", args=cfg)
        # fresh copies per method: the reference mutates inputs in place
        # (few-shot EM-Dirichlet logs features in place, etc.)
        logs = m.run_task({
            "x_q": torch.from_numpy(np.array(x, np.float32)),
            "y_q": torch.from_numpy(np.array(y)).unsqueeze(2),
        })
        out[f"zs_{module}_acc"] = np.asarray(logs["acc"])[:, -1]
        out[f"zs_{module}_crit"] = np.asarray(logs["criterions"], np.float64)

    rng = np.random.default_rng(FS_SEED)
    xs, ys, xq, yq = make_few_shot_tasks(
        rng, N_TASK, n_query=N_QUERY, n_class=K, shots=SHOTS, k_eff=4,
        concentration=12.0,
    )
    dummy = types.SimpleNamespace(eval=lambda: None, train=lambda: None)
    for module, cls in FS_METHODS:
        cfg = make_cfg(module, SHOTS)
        mod = importlib.import_module(f"src.methods.few_shot.{module}")
        m = getattr(mod, cls)(model=dummy, device="cpu",
                              log_file="/tmp/fixt.log", args=cfg)
        logs = m.run_task({
            "x_s": torch.from_numpy(np.array(xs, np.float32)),
            "y_s": torch.from_numpy(np.array(ys)).unsqueeze(2),
            "x_q": torch.from_numpy(np.array(xq, np.float32)),
            "y_q": torch.from_numpy(np.array(yq)).unsqueeze(2),
        }, shot=SHOTS)
        out[f"fs_{module}_acc"] = np.asarray(logs["acc"])[:, -1]

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez(OUT, **out)
    print(f"wrote {OUT} with {len(out)} arrays")
    for k in sorted(out):
        if k.endswith("_acc"):
            print(f"  {k}: {out[k]}")


if __name__ == "__main__":
    main()

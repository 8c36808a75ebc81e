#!/usr/bin/env python
"""Run the full method suite at the paper protocol scale on synthetic
separable features — an end-to-end smoke/benchmark of every method without
needing CLIP weights or datasets.

    python scripts/run_synthetic_protocol.py [--n-class 100] [--tasks 200]
    python scripts/run_synthetic_protocol.py --quick   # < ~2 min on a
                                                       # tunneled chip

Rows stream as each method finishes (each of the 15 methods compiles its
own program first — a progress line marks compile start). ``--quick``
shrinks shapes and iteration counts for a fast demo of all 15 methods. The Dirichlet/hard-kmeans/KL methods should be near 1.0 on
these separable simplex tasks; the Gaussian and soft-kmeans baselines are
expected to score much lower at large K — that is the paper's core finding
(Table 1: Euclidean-geometry methods fit softmax features poorly), and the
reference implementations score identically on the same tasks
(tests/test_run_reference.py).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from transductive_clip_tpu.core.config import CfgNode
from transductive_clip_tpu.utils.synthetic import (
    make_few_shot_tasks,
    make_zero_shot_tasks,
)
from transductive_clip_tpu.methods import (
    FEW_SHOT_METHODS,
    ZERO_SHOT_METHODS,
    get_few_shot_method,
    get_zero_shot_method,
)




def base_cfg(n_class, n_query, batch_size, shots):
    return CfgNode(dict(
        num_classes_test=n_class, n_class=n_class, n_query=n_query,
        k_eff=5, shots=shots, batch_size=batch_size, iter=20, iter_mm=1000,
        T=30, use_softmax_feature=True, graph_matching=True, seed=0,
        lambd=5.0, temp=30.0, norm_type="L2N", knn=3, lmd=0.7,
        loss_weights=[1.0, 1.0, 1.0], entropies=["Shannon", "Alpha", "Alpha"],
        alpha_value=5.0, lr_alpha_tim=1e-4, lr_tim=1e-4,
    ))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-class", type=int, default=100)
    ap.add_argument("--tasks", type=int, default=200)
    ap.add_argument("--batch-size", type=int, default=100)
    ap.add_argument("--n-query", type=int, default=75)
    ap.add_argument("--shots", type=int, default=4)
    ap.add_argument("--quick", action="store_true",
                    help="small shapes + reduced iteration counts: all 15 "
                         "methods in ~2 min on a tunneled TPU")
    args = ap.parse_args()
    if args.quick:
        # 2 batches: the first (compile) batch is excluded from timing
        args.n_class, args.tasks, args.batch_size, args.n_query = 32, 32, 16, 25

    import jax

    rng = np.random.default_rng(0)
    print(f"backend: {jax.default_backend()}, K={args.n_class}, "
          f"{args.tasks} tasks x {args.n_query} queries", flush=True)

    # ---- zero-shot suite ----
    print(f"\n{'zero-shot method':<22} {'acc':>6} {'ms/task':>9}", flush=True)
    for name in ZERO_SHOT_METHODS:
        cfg = base_cfg(args.n_class, args.n_query, args.batch_size, 0)
        if name in ("HARD_EM_DIRICHLET", "HARD_KMEANS", "KL_KMEANS"):
            cfg.iter = 10
        if args.quick:
            cfg.iter, cfg.iter_mm = min(cfg.iter, 10), 100
        print(f"[{name} compiling...]", file=sys.stderr, flush=True)
        method = get_zero_shot_method(name, args=cfg)
        accs, times = [], []
        n_batches = max(1, args.tasks // args.batch_size)
        for b in range(n_batches):
            x, y = make_zero_shot_tasks(rng, args.batch_size, args.n_query, args.n_class)
            logs = method.run_task({"x_q": x, "y_q": y})
            if b > 0 or n_batches == 1:   # skip compile batch when possible
                times.append(logs["timestamps"])
            accs.append(logs["acc"][:, -1].mean())
        print(f"{name:<22} {np.mean(accs):>6.3f} {np.mean(times)*1e3:>9.2f}",
              flush=True)

    # ---- few-shot suite ----
    print(f"\n{'few-shot method':<22} {'acc':>6} {'ms/task':>9}", flush=True)
    fs_batch = min(args.batch_size, max(1, 2000 // args.n_class))
    for name in FEW_SHOT_METHODS:
        cfg = base_cfg(args.n_class, args.n_query, fs_batch, args.shots)
        if name in ("ALPHA_TIM", "TIM-GD"):
            cfg.iter = 1000
        if args.quick:
            cfg.iter = min(cfg.iter, 100)
            cfg.iter_mm = 100
        print(f"[{name} compiling...]", file=sys.stderr, flush=True)
        method = get_few_shot_method(name, args=cfg)
        xs, ys, xq, yq = make_few_shot_tasks(
            rng, fs_batch, args.n_query, args.n_class, args.shots
        )
        logs = method.run_task(
            {"x_s": xs, "y_s": ys, "x_q": xq, "y_q": yq}, shot=args.shots
        )
        # second run for steady-state timing
        logs = method.run_task(
            {"x_s": xs, "y_s": ys, "x_q": xq, "y_q": yq}, shot=args.shots
        )
        print(f"{name:<22} {logs['acc'][:, -1].mean():>6.3f} "
              f"{logs['timestamps']*1e3:>9.2f}", flush=True)


if __name__ == "__main__":
    if os.environ.get("PALLAS_AXON_POOL_IPS"):
        # fail FAST when the tunneled TPU backend is unreachable — its
        # init hangs (not errors) in-process (see utils/backend_probe.py)
        from transductive_clip_tpu.utils.backend_probe import (
            backend_reachable,
        )

        if not backend_reachable():
            sys.exit("run_synthetic_protocol: TPU backend unreachable "
                     "(init probe hung/failed); rerun when the tunnel is "
                     "back, or force CPU with JAX_PLATFORM_NAME=cpu and an "
                     "unset PALLAS_AXON_POOL_IPS")
    main()

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




# --check bounds, vendored for the --quick protocol (K=32, 32 tasks x 25
# queries, shots=4, seed 0): (min final accuracy, max ms/task). Accuracy is
# checked on every backend — the synthetic simplex tasks are separable, so
# the Dirichlet-geometry methods must stay near 1.0 (measured 1.000) and
# even the Euclidean baselines have stable floors (EM_GAUSSIAN 0.86,
# EM_GAUSSIAN_COV/SOFT_KMEANS 0.69 — the paper's Table-1 finding). The
# latency ceiling is checked only on the TPU backend and is deliberately
# loose (quick-protocol steady state measures <5 ms/task; the ceiling
# catches catastrophic regressions like an uncompiled hot loop, while
# tolerating the shared chip's multi-second slowdown windows).
QUICK_CHECK_BOUNDS = {
    # zero-shot
    "KL_KMEANS": (0.95, 1000.0),
    "EM_DIRICHLET": (0.95, 1000.0),
    "HARD_EM_DIRICHLET": (0.95, 1000.0),
    "EM_GAUSSIAN": (0.75, 1000.0),
    "EM_GAUSSIAN_COV": (0.55, 1000.0),
    "SOFT_KMEANS": (0.55, 1000.0),
    "HARD_KMEANS": (0.95, 1000.0),
    "CLIP": (0.95, 1000.0),
    # few-shot
    "FS/EM_DIRICHLET": (0.95, 1000.0),
    "FS/HARD_EM_DIRICHLET": (0.95, 1000.0),
    "FS/PADDLE": (0.95, 1000.0),
    "FS/BDCSPN": (0.95, 1000.0),
    "FS/LAPLACIAN_SHOT": (0.95, 1000.0),
    "FS/ALPHA_TIM": (0.95, 2000.0),
    "FS/TIM-GD": (0.95, 2000.0),
}


def check_results(rows, backend):
    """Acceptance gate for ``--quick --check``: every method present, every
    accuracy above its vendored floor, every TPU latency under its ceiling.
    Returns a list of human-readable failure strings (empty = pass)."""
    failures = []
    seen = {name for name, _, _ in rows}
    for name in sorted(set(QUICK_CHECK_BOUNDS) - seen):
        failures.append(f"{name}: missing from results")
    for name, acc, ms in rows:
        if name not in QUICK_CHECK_BOUNDS:
            failures.append(f"{name}: no vendored bound (update "
                            "QUICK_CHECK_BOUNDS)")
            continue
        min_acc, max_ms = QUICK_CHECK_BOUNDS[name]
        if acc < min_acc:
            failures.append(
                f"{name}: accuracy {acc:.3f} < floor {min_acc:.2f}")
        if backend == "tpu" and ms > max_ms:
            failures.append(
                f"{name}: {ms:.1f} ms/task > ceiling {max_ms:.0f}")
    return failures


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
    ap.add_argument("--check", action="store_true",
                    help="acceptance gate: exit nonzero when any method "
                         "misses its vendored accuracy floor (or, on TPU, "
                         "its latency ceiling). Requires --quick — the "
                         "bounds are vendored for the quick protocol.")
    args = ap.parse_args()
    if args.check and not args.quick:
        ap.error("--check bounds are vendored for the --quick protocol; "
                 "pass --quick too")
    if args.quick:
        # 2 batches: the first (compile) batch is excluded from timing
        args.n_class, args.tasks, args.batch_size, args.n_query = 32, 32, 16, 25

    import jax

    rng = np.random.default_rng(0)
    print(f"backend: {jax.default_backend()}, K={args.n_class}, "
          f"{args.tasks} tasks x {args.n_query} queries", flush=True)

    results = []          # (bound key, final acc, steady ms/task)

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
        results.append((name, float(np.mean(accs)),
                        float(np.mean(times)) * 1e3))

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
        results.append((f"FS/{name}", float(logs["acc"][:, -1].mean()),
                        float(logs["timestamps"]) * 1e3))

    if args.check:
        failures = check_results(results, jax.default_backend())
        if failures:
            print("\n--check FAILED:", flush=True)
            for f in failures:
                print(f"  {f}", flush=True)
            sys.exit(1)
        print(f"\n--check passed: {len(results)} methods within vendored "
              "bounds", flush=True)


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

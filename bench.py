#!/usr/bin/env python
"""Headline benchmark: EM-Dirichlet zero-shot throughput at ImageNet scale.

Task scale matches the paper's Table-2 timing column: batches of 100
transductive tasks, n_query = 75, K = 1000 classes; the reference reports
1.04 s/task for EM-Dirichlet on an (unspecified) GPU. This benchmark times
the full jitted method in its production configuration — the Newton-Minka
solver (same stationary equation as the reference's MM loop, adaptive
iteration counts), cluster + task compaction, and outer-loop early
stopping — i.e. end-to-end time to produce equivalent predictions for the
same tasks, not a re-run of the reference's fixed 20 x 1000-iteration
schedule. The number is AMORTIZED over ``N_BATCH`` distinct-seed batches
(per-batch convergence varies ~4x; a single lucky batch is not a
headline). A cluster-purity assertion guards against perf-only regressions
that break the math. ``vs_baseline`` = speedup over the reference's 1.04
s/task.

Prints exactly one JSON line.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

from transductive_clip_tpu.utils.synthetic import make_zero_shot_tasks

REFERENCE_SECONDS_PER_TASK = 1.04  # Table 2 (BASELINE.md), EM-Dirichlet, ImageNet

N_TASK = 100
N_QUERY = 75
N_CLASS = 1000
N_ITER = 20
ITER_MM = 1000
N_BATCH = 4  # distinct-seed batches; headline = total tasks / total time




def main():
    from transductive_clip_tpu.utils.compile_cache import quarantine_aot_spam

    # stale/foreign XLA:CPU AOT cache entries spew one C++ E-line per
    # rejection, burying the one JSON line the driver records — quarantine
    # them and print the JSON last (utils/compile_cache.py)
    with quarantine_aot_spam():
        row = _bench_body()
    print(json.dumps(row))


def _bench_body():
    import jax
    import jax.numpy as jnp

    from transductive_clip_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache(jax)

    from transductive_clip_tpu.methods.zero_shot.em_dirichlet import (
        em_dirichlet_infer,
    )

    # multiple seeds, amortized: per-batch convergence varies a lot (seed 0
    # happens to early-stop at ~5 EM iterations while typical batches carry
    # 1-2 straggler tasks), so a single-batch number is a lottery draw. The
    # headline is total tasks / total time over N_BATCH distinct batches —
    # what an evaluation actually pays per batch in steady state.
    batches = []
    for seed in range(N_BATCH):
        x_np, y_np = make_zero_shot_tasks(
            np.random.default_rng(seed), N_TASK, N_QUERY, N_CLASS)
        batches.append((jnp.asarray(x_np), y_np))
    lambd = jnp.float32(int(N_CLASS / 5) * N_QUERY)

    from transductive_clip_tpu.ops.common import device_sync

    def run(x):
        # compact_first=True is the production default ('auto'): the
        # evaluator verifies it against the exact first iteration on the
        # first batch of every evaluation (methods/zero_shot/
        # em_dirichlet.py), so steady-state batches run exactly this program.
        return em_dirichlet_infer(
            x, lambd, n_iter=N_ITER, iter_mm=ITER_MM, hard=False,
            solver="minka", compact_first=True,
        )

    # compile + warmup (one compile covers every batch: same shapes)
    u, crit = run(batches[0][0])
    device_sync(u)

    # best of 2 per batch: the shared tunneled chip shows transient
    # multi-second slowdown windows; the per-batch minimum is the
    # uncontended number, summed across batches for the amortized headline.
    # Keep per-batch result handles so the purity guard below covers EVERY
    # timed batch, not just the last one.
    elapsed = 0.0
    batch_results = []
    for x, _ in batches:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            u, crit = run(x)
            device_sync(u)
            best = min(best, time.perf_counter() - t0)
        elapsed += best
        batch_results.append((jnp.argmax(u, axis=-1), crit))

    # correctness guard: the timed computation must actually cluster the
    # separable synthetic tasks (catches perf-only regressions that break
    # the math) — asserted for ALL N_BATCH batches; argmax was taken on
    # device so only [N, n] ints cross the slow link
    for batch_idx, ((_, y_np), (clusters_dev, crit)) in enumerate(
            zip(batches, batch_results)):
        clusters = np.asarray(clusters_dev)
        purities = []
        for t in range(4):
            for c in np.unique(y_np[t]):
                members = clusters[t][y_np[t] == c]
                counts = np.bincount(members)
                purities.append(counts.max() / len(members))
        assert np.mean(purities) > 0.95, (
            f"clustering broke on batch {batch_idx}: "
            f"purity {np.mean(purities)}")
        assert np.isfinite(np.asarray(crit)).all(), (
            f"non-finite criterion trace on batch {batch_idx}")

    tasks_per_sec = N_TASK * N_BATCH / elapsed
    vs_baseline = tasks_per_sec * REFERENCE_SECONDS_PER_TASK
    return {
        "metric": "em_dirichlet_imagenet_zero_shot_throughput",
        "value": round(tasks_per_sec, 3),
        "unit": "tasks/sec",
        "vs_baseline": round(vs_baseline, 2),
        "baseline_note": (
            "reference Table 2: 1.04 s/task on an unspecified GPU; "
            "floor/exact-mode numbers: scripts/bench_suite.py"
            + (f"; backend={jax.default_backend()}"
               " (TPU unreachable, CPU fallback)"
               if os.environ.get("BENCH_CPU_FALLBACK") == "1"
               else (f"; backend={jax.default_backend()}"
                     if jax.default_backend() != "tpu" else ""))
        ),
    }


if __name__ == "__main__":
    import os
    import sys
    import traceback

    # The tunneled TPU backend throws transient FAILED_PRECONDITION /
    # UNAVAILABLE errors, and two outage modes have been observed: errors
    # AND indefinite hangs inside backend/plugin init (an unreachable
    # tunnel blocks jax.devices() forever, which would wedge the driver).
    # So: (1) probe device init in a SUBPROCESS with a hard timeout before
    # importing jax here; (2) on failure, retry with backoff by RE-EXECING
    # the interpreter (a failed backend init is sticky in-process); (3) on
    # budget exhaustion, fall back to a forced-CPU run so the driver still
    # gets its one JSON line (baseline_note marks the fallback backend).
    # Assertions = correctness regressions, never retried.
    _DELAYS = [60, 120, 180, 180, 120]

    def _device_probe_ok() -> bool:
        from transductive_clip_tpu.utils.backend_probe import (
            backend_reachable,
        )

        if backend_reachable():
            return True
        print("bench: device-init probe hung/failed (backend unreachable)",
              file=sys.stderr, flush=True)
        return False

    def _retry_or_cpu_fallback(attempt: int):
        if attempt >= len(_DELAYS):
            if os.environ.get("BENCH_CPU_FALLBACK") == "1":
                sys.exit(1)        # CPU fallback itself failed: give up
            print("bench: retry budget exhausted; falling back to CPU",
                  file=sys.stderr, flush=True)
            env = dict(os.environ, BENCH_CPU_FALLBACK="1",
                       BENCH_ATTEMPT=str(attempt + 1),
                       JAX_PLATFORM_NAME="cpu")
            env.pop("PALLAS_AXON_POOL_IPS", None)  # no TPU plugin at all
            env.pop("JAX_PLATFORMS", None)
            os.execve(sys.executable, [sys.executable] + sys.argv, env)
        print(f"bench attempt {attempt + 1} failed; retrying in "
              f"{_DELAYS[attempt]}s", file=sys.stderr, flush=True)
        time.sleep(_DELAYS[attempt])
        env = dict(os.environ, BENCH_ATTEMPT=str(attempt + 1))
        os.execve(sys.executable, [sys.executable] + sys.argv, env)

    attempt = int(os.environ.get("BENCH_ATTEMPT", "0"))
    if (os.environ.get("BENCH_CPU_FALLBACK") != "1"
            and not _device_probe_ok()):
        _retry_or_cpu_fallback(attempt)
    try:
        main()
    except AssertionError:
        raise                      # real correctness regression: no retry
    except Exception:
        traceback.print_exc()
        _retry_or_cpu_fallback(attempt)

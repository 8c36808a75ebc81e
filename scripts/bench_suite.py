#!/usr/bin/env python
"""Extended benchmark suite at the paper's Table-2 timing scale.

Measures, on the current backend (run on the TPU):

1. headline production mode (Pallas/Minka solver + cluster compaction +
   early stop), soft and hard EM-Dirichlet;
2. reference-exact mode (solver='mm', compact=False, early_stop=False,
   fixed outer schedule: 20 iterations soft / 10 hard — the exact
   computation the reference performs, including its every-50-iteration
   inner convergence stop, reference: em_dirichlet.py:157-177);
3. the full zero-shot accuracy path at K=1000 — method + cluster-prototype
   computation + cluster->class matching (host JV / device auction / basic
   argmax) — and which phase dominates.

bench.py stays the one-JSON-line driver artifact; this script prints one
JSON line per row plus a readable table (capture into README.md).

    python scripts/bench_suite.py [--tasks 100] [--n-class 1000] [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Table 2 (BASELINE.md), ImageNet column, per-task seconds
REF_SOFT = 1.04
REF_HARD = 0.697


def timed(fn, *args, repeats=3, **kw):
    """Minimum over ``repeats`` runs (the shared tunneled chip has transient
    multi-second slowdown windows; the minimum is the uncontended number)."""
    from transductive_clip_tpu.ops.common import device_sync

    out = fn(*args, **kw)          # compile + warmup
    device_sync(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        device_sync(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def save_measured(path, rows, backend):
    """Merge measured rows into the canonical store (keyed by metric).

    ``bench_results/measured.json`` is the single source the README bench
    table is generated from (``scripts/gen_bench_table.py``) — numbers are
    never hand-edited into docs, so they cannot drift between files."""
    import datetime

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    store = {}
    if os.path.exists(path):
        with open(path) as f:
            store = json.load(f)
    stamp = datetime.date.today().isoformat()
    for r in rows:
        if r.get("skipped"):
            continue
        store[r["metric"]] = {**{k: v for k, v in r.items()
                                 if k != "metric"},
                              "backend": backend, "measured_on": stamp}
    with open(path, "w") as f:
        json.dump(store, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"[saved {sum(1 for r in rows if not r.get('skipped'))} rows "
          f"-> {path}]", file=sys.stderr)


def bench_multichip(jax, jnp, devs, n_task, n_query, n_class, lambd,
                    solver, x_single):
    """Weak-scaling sweep over every (dp, tp) layout of the visible devices
    on the production EM-Dirichlet path: ``n_task`` tasks per dp group,
    efficiency = tasks/s vs ``n_devices x`` the single-device baseline, and
    per-device HBM highwater from the compiled executable's memory
    analysis. Returns the measured rows (the caller streams them)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from transductive_clip_tpu.methods.zero_shot.em_dirichlet import (
        em_dirichlet_infer,
    )
    from transductive_clip_tpu.parallel import make_mesh
    from transductive_clip_tpu.utils.synthetic import make_zero_shot_tasks

    n_dev = len(devs)
    kw = dict(n_iter=20, iter_mm=1000, hard=False, solver=solver,
              compact_first=True)

    # single-device baseline at the same per-group width
    t1, _ = timed(lambda: em_dirichlet_infer(x_single, lambd, **kw))
    base_tps = n_task / t1
    rows = [{
        "metric": "multichip_baseline_1dev",
        "value": round(base_tps, 1),
        "unit": "tasks/sec",
        "device_kind": devs[0].device_kind or "",
    }]

    layouts = [(n_dev // tp, tp) for tp in (1, 2, 4, 8)
               if tp <= n_dev and n_dev % tp == 0 and n_class % tp == 0]
    for dp, tp in layouts:
        mesh = make_mesh(n_devices=n_dev, tp=tp)
        global_tasks = n_task * dp
        xg_np, _ = make_zero_shot_tasks(
            np.random.default_rng(97), global_tasks, n_query, n_class)
        xg = jax.device_put(
            jnp.asarray(xg_np), NamedSharding(mesh, P("dp", None, None)))
        hbm_gb = None
        try:
            compiled = em_dirichlet_infer.lower(
                xg, lambd, mesh=mesh, **kw).compile()
            ma = compiled.memory_analysis()
            hbm_gb = round((ma.temp_size_in_bytes + ma.argument_size_in_bytes
                            + ma.output_size_in_bytes) / 2**30, 3)
        except Exception:
            pass          # backends without memory analysis (e.g. some CPU)
        with mesh:
            t, _ = timed(lambda: em_dirichlet_infer(
                xg, lambd, mesh=mesh, **kw))
        tps = global_tasks / t
        row = {
            "metric": f"multichip_dp{dp}_tp{tp}",
            "value": round(tps, 1),
            "unit": "tasks/sec",
            "n_devices": n_dev,
            "scaling_efficiency": round(tps / (base_tps * n_dev), 3),
        }
        if hbm_gb is not None:
            row["hbm_highwater_gb_per_device"] = hbm_gb
        rows.append(row)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tasks", type=int, default=100)
    ap.add_argument("--n-query", type=int, default=75)
    ap.add_argument("--n-class", type=int, default=1000)
    ap.add_argument("--quick", action="store_true",
                    help="small shapes for a smoke run")
    ap.add_argument("--few-shot", action="store_true",
                    help="also run the few-shot methods at the Table-2 "
                         "ImageNet protocol (slow: alpha-TIM is 1000 Adam "
                         "iterations)")
    ap.add_argument("--skip-zero-shot", action="store_true",
                    help="run only the sections selected by other flags")
    ap.add_argument("--extraction", action="store_true",
                    help="benchmark CLIP image encoding: device-resident "
                         "batch (pure compute, reports MFU) vs host batch "
                         "(includes the transfer) for --backbones")
    ap.add_argument("--backbones",
                    default="ViT-B/16,RN50,ViT-L/14,ViT-L/14@336px",
                    help="comma-separated backbone list for --extraction "
                         "(the default covers the paper's strongest tower, "
                         "ViT-L/14, and its 336px variant)")
    ap.add_argument("--multichip", action="store_true",
                    help="sweep (dp, tp) mesh layouts at the protocol "
                         "shapes when >1 device is present: weak-scaling "
                         "tasks/s, efficiency vs the single-device "
                         "baseline, and per-device HBM highwater from the "
                         "compiled executable. On a single-chip host, "
                         "emits one explicit skip row.")
    ap.add_argument("--matching-divergence", action="store_true",
                    help="measure (don't assert) how often the device "
                         "auction's eps-optimal cluster->class assignment "
                         "differs from the exact host JV solution, at "
                         "protocol statistics and on a flat-feature stress "
                         "distribution; reports task/query diff rates and "
                         "the accuracy delta")
    ap.add_argument("--div-tasks", type=int, default=10_000,
                    help="total tasks per distribution for "
                         "--matching-divergence")
    ap.add_argument("--save-measured", metavar="PATH", nargs="?",
                    const=os.path.join(
                        os.path.dirname(os.path.dirname(
                            os.path.abspath(__file__))),
                        "bench_results", "measured.json"),
                    default=None,
                    help="merge this run's rows (keyed by metric) into the "
                         "canonical measured-numbers store the README bench "
                         "table is generated from "
                         "(scripts/gen_bench_table.py); default path "
                         "bench_results/measured.json. Refused for --quick "
                         "runs and non-TPU backends — the store holds "
                         "production-shape chip numbers only.")
    args = ap.parse_args()
    if args.quick:
        args.tasks, args.n_class = 8, 64

    import jax
    import jax.numpy as jnp

    from transductive_clip_tpu.methods.zero_shot.em_dirichlet import (
        em_dirichlet_infer,
    )
    from transductive_clip_tpu.utils.synthetic import make_zero_shot_tasks

    backend = jax.default_backend()
    # the production default on every backend (Newton-on-row-sum XLA solve)
    fast_solver = "minka"
    n_task, n_query, n_class = args.tasks, args.n_query, args.n_class

    rng = np.random.default_rng(0)
    x_np, y_np = make_zero_shot_tasks(rng, n_task, n_query, n_class)
    x = jnp.asarray(x_np)
    lambd = jnp.float32(int(n_class / 5) * n_query)
    # extra distinct-seed batches for the early-stopped (data-dependent
    # schedule) rows: per-batch convergence varies ~4x, so those rows
    # amortize over several batches instead of quoting the seed-0 lottery
    # draw (the fixed-schedule reference-exact rows cost the same on any
    # seed and keep the single batch)
    N_AMORT = 4
    x_batches = [x] + [
        jnp.asarray(make_zero_shot_tasks(
            np.random.default_rng(s), n_task, n_query, n_class)[0])
        for s in range(1, N_AMORT)
    ]

    class _StreamedRows(list):
        """Emit each row's JSON line the moment it is measured — a full run
        is tens of minutes on the tunneled chip and a silent log is
        indistinguishable from a wedged device grant."""

        def append(self, r):
            print(json.dumps(r), flush=True)
            super().append(r)

    rows = _StreamedRows()

    def bench_method(name, ref, amortize=False, **kw):
        if amortize:
            elapsed, total, u = 0.0, 0, None
            for xb in x_batches:
                e, (ub, crit) = timed(em_dirichlet_infer, xb, lambd,
                                      repeats=2, **kw)
                elapsed += e
                total += n_task
                if u is None:
                    u = ub   # downstream acc_path consumes the seed-0 batch
        else:
            elapsed, (u, crit) = timed(em_dirichlet_infer, x, lambd, **kw)
            total = n_task
        per_task = elapsed / total
        rows.append({
            "metric": name,
            "value": round(total / elapsed, 3),
            "unit": "tasks/sec",
            "seconds_per_task": round(per_task, 5),
            "vs_baseline": round(ref / per_task, 2),
            "baseline_note": f"reference {ref}s/task, unspecified GPU"
                             + (f"; amortized over {len(x_batches)} batches"
                                if amortize else ""),
        })
        return u

    # production default: compact_first engages behind the evaluator's
    # first-batch guard (methods/zero_shot/em_dirichlet.py), so steady-state
    # batches run exactly this configuration
    prod = dict(solver=fast_solver, compact=True, early_stop=True,
                compact_first=True)
    floor = dict(solver=fast_solver, compact=True, early_stop=True)
    exact = dict(solver="mm", compact=False, early_stop=False)
    if not args.skip_zero_shot:
        u_soft = bench_method("headline_soft_production", REF_SOFT,
                              amortize=True,
                              n_iter=20, iter_mm=1000, hard=False, **prod)
        bench_method("headline_hard_production", REF_HARD, amortize=True,
                     n_iter=10, iter_mm=1000, hard=True, **prod)
        # guard-tripped fallback configuration (full-width first iteration)
        bench_method("headline_soft_no_compact_first", REF_SOFT,
                     amortize=True,
                     n_iter=20, iter_mm=1000, hard=False, **floor)
        bench_method("headline_hard_no_compact_first", REF_HARD,
                     amortize=True,
                     n_iter=10, iter_mm=1000, hard=True, **floor)
        bench_method("reference_exact_soft", REF_SOFT,
                     n_iter=20, iter_mm=1000, hard=False, **exact)
        bench_method("reference_exact_hard", REF_HARD,
                     n_iter=10, iter_mm=1000, hard=True, **exact)
        # same exact schedule, MM iteration fused into the VMEM kernel
        exact_pl = dict(exact, solver="mm_pallas") if backend == "tpu" else None
        if exact_pl:
            bench_method("reference_exact_soft_mm_pallas", REF_SOFT,
                         n_iter=20, iter_mm=1000, hard=False, **exact_pl)
            bench_method("reference_exact_hard_mm_pallas", REF_HARD,
                         n_iter=10, iter_mm=1000, hard=True, **exact_pl)

    # ---- full accuracy path: prototypes + cluster->class matching --------
    from transductive_clip_tpu.core.config import CfgNode
    from transductive_clip_tpu.methods.base import clustering_accuracy

    if args.skip_zero_shot:
        u_soft = None

    def acc_path(backend_name, graph_matching=True):
        cfg = CfgNode(dict(
            n_class=n_class, T=30, use_softmax_feature=True,
            graph_matching=graph_matching, matching_backend=backend_name,
        ))
        t0 = time.perf_counter()
        acc, _ = clustering_accuracy(u_soft, x, y_np, cfg)
        return time.perf_counter() - t0, float(acc.mean())

    matching_modes = ([] if args.skip_zero_shot else
                      [("host", True), ("device", True), ("basic", False)])
    for name, gm in matching_modes:
        acc_path(name if gm else "host", graph_matching=gm)  # compile/warmup
        elapsed, acc = min(
            (acc_path(name if gm else "host", graph_matching=gm)
             for _ in range(3)),
            key=lambda r: r[0],
        )
        rows.append({
            "metric": f"accuracy_path_matching_{name}",
            "value": round(elapsed / n_task * 1000, 3),
            "unit": "ms/task",
            "acc": round(acc, 4),
        })

    # ---- end-to-end: run_task = method + prototypes + matching -----------
    from transductive_clip_tpu.methods import get_zero_shot_method

    cfg = CfgNode(dict(
        name_method="EM_DIRICHLET", num_classes_test=n_class, n_class=n_class,
        n_query=n_query, T=30, use_softmax_feature=True, graph_matching=True,
        iter=20, iter_mm=1000, dirichlet_solver=fast_solver,
        compact_clusters=True, early_stop=True,
    ))
    if not args.skip_zero_shot:
        method = get_zero_shot_method("EM_DIRICHLET", args=cfg)
        # features device-resident, as the evaluator's device-side feature
        # table keeps them (eval/zero_shot.py gathers tasks on device): the
        # row measures the run_task pipeline, not a 30 MB host->device
        # transfer per batch the production path never performs
        task = {"x_q": x, "y_q": y_np}
        method.run_task(task)                      # compile/warmup
        elapsed = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            logs = method.run_task(task)
            elapsed = min(elapsed, time.perf_counter() - t0)
        rows.append({
            "metric": "end_to_end_zero_shot",
            "value": round(n_task / elapsed, 3),
            "unit": "tasks/sec",
            "seconds_per_task": round(elapsed / n_task, 5),
            "vs_baseline": round(REF_SOFT * n_task / elapsed, 2),
            "acc": round(float(np.mean(logs["acc"][:, -1])), 4),
            "baseline_note": "reference excludes matching from its timing",
        })

        # deferred-fetch pipeline: dispatch B batches back to back, ONE
        # combined device_get at the end (the evaluators' defer_fetch mode;
        # eval/zero_shot.py) — amortizes the per-batch link round trips
        cfg_defer = CfgNode(dict(cfg, matching_backend="device"))
        method_d = get_zero_shot_method("EM_DIRICHLET", args=cfg_defer)
        import jax as _jax

        n_rep = 5
        res0 = method_d.run_task_deferred(task)    # compile/warmup
        _jax.device_get(res0.handles)
        t0 = time.perf_counter()
        pending = [method_d.run_task_deferred(task) for _ in range(n_rep)]
        host = _jax.device_get([r.handles for r in pending])
        elapsed_d = (time.perf_counter() - t0) / n_rep
        logs_d = pending[0].finalize(host[0], elapsed_d / n_task)
        rows.append({
            "metric": "end_to_end_zero_shot_deferred",
            "value": round(n_task / elapsed_d, 3),
            "unit": "tasks/sec",
            "seconds_per_task": round(elapsed_d / n_task, 5),
            "vs_baseline": round(REF_SOFT * n_task / elapsed_d, 2),
            "acc": round(float(np.mean(logs_d["acc"][:, -1])), 4),
            "baseline_note": "defer_fetch pipeline, fetch amortized over "
                             f"{n_rep} batches",
        })

        # fused one-dispatch pipeline (fused_dispatch): the evaluator's
        # steady-state batch = sample indices on host, ship [N, n] int32,
        # ONE program (gather + method + accuracy), combined end fetch.
        # This is the full production e2e loop including sampling.
        import jax.numpy as _jnp

        from transductive_clip_tpu.tasks import (
            CategoriesSamplerZeroShot,
            SamplerQueryZeroShot,
        )

        # feature table drawn from the SAME per-sample distribution as the
        # method rows' tasks (utils/synthetic.py: Dirichlet, label-peaked
        # at the same concentration) so the EM iteration counts — and
        # therefore the e2e rows — are comparable
        n_per_class = 50
        conc = 60.0                 # make_zero_shot_tasks' default peaking
        table_labels = np.repeat(np.arange(n_class), n_per_class)
        a = np.ones((table_labels.size, n_class), np.float32)
        a[np.arange(table_labels.size), table_labels] += conc
        table = rng.gamma(a).astype(np.float32)
        table /= table.sum(1, keepdims=True)
        feats_dev = _jnp.asarray(table)
        labels_dev = _jnp.asarray(table_labels, _jnp.int32)
        sampler = CategoriesSamplerZeroShot(
            n_task, 5, n_class, n_query, force_query_size=True,
            rng=np.random.default_rng(0),
        )
        sampler.create_list_classes(table_labels)

        # one fixed index draw reused across reps: the deferred row above
        # also times a fixed batch, so the two rows differ only in dispatch
        # structure (the ~3 ms/batch host sampling is re-run per rep)
        idx_fixed = np.stack(list(SamplerQueryZeroShot(sampler)))

        method_f = get_zero_shot_method("EM_DIRICHLET", args=cfg_defer)
        # blocking batch 0 first, exactly as the evaluator runs it: it
        # consumes the one-time compact_first_iter guard, whose host
        # comparison cannot execute inside the fused jit trace (there
        # run_task_fused returns None and this row would crash)
        method_f.run_task({
            "x_q": _jnp.take(feats_dev, _jnp.asarray(idx_fixed), axis=0),
            "y_q": table_labels[idx_fixed],
        })
        res0 = method_f.run_task_fused(feats_dev, labels_dev, idx_fixed)
        if res0 is None:
            raise RuntimeError(
                "run_task_fused unexpectedly fell back after the blocking "
                "warmup batch — a host step remains inside the fused trace"
            )
        _jax.device_get(res0.handles)              # compile/warmup
        t0 = time.perf_counter()
        pending = [
            method_f.run_task_fused(feats_dev, labels_dev, idx_fixed)
            for _ in range(n_rep)
        ]
        host = _jax.device_get([r.handles for r in pending])
        elapsed_f = (time.perf_counter() - t0) / n_rep
        logs_f = pending[0].finalize(host[0], elapsed_f / n_task)
        rows.append({
            "metric": "end_to_end_zero_shot_fused",
            "value": round(n_task / elapsed_f, 3),
            "unit": "tasks/sec",
            "seconds_per_task": round(elapsed_f / n_task, 5),
            "vs_baseline": round(REF_SOFT * n_task / elapsed_f, 2),
            "acc": round(float(np.mean(logs_f["acc"][:, -1])), 4),
            "baseline_note": "fused_dispatch pipeline incl. host sampling, "
                             f"one program/batch, fetch amortized over "
                             f"{n_rep} batches",
        })

    # ---- multi-chip (dp, tp) scaling sweep (--multichip) -----------------
    # Readiness harness for real multi-chip hardware (SURVEY §2.2): the
    # moment >1 device is visible, this measures task-DP/class-TP weak
    # scaling with no hand-written sweep needed. Exercised fake-distributed
    # in tests/test_parallel.py on the 8-virtual-CPU-device mesh.
    if args.multichip:
        devs = jax.devices()
        if len(devs) < 2:
            rows.append({
                "metric": "multichip_scaling",
                "skipped": True,
                "reason": f"single {devs[0].device_kind or backend} device "
                          "visible; rerun on a multi-chip host to sweep "
                          "(dp, tp) layouts",
            })
        else:
            for row in bench_multichip(
                    jax, jnp, devs, n_task, n_query, n_class, lambd,
                    fast_solver, x):
                rows.append(row)

    # ---- CLIP extraction throughput + MFU (--extraction) -----------------
    if args.extraction:
        from transductive_clip_tpu.models.clip import (
            CLIP_CONFIGS,
            JaxCLIP,
            init_random_params,
        )
        from transductive_clip_tpu.ops.common import device_sync

        # bf16 peak FLOPs/s by device kind (public spec sheets); MFU is
        # reported only when the kind is recognized
        peak_by_kind = {
            "TPU v4": 275e12,
            "TPU v5e": 197e12, "TPU v5 lite": 197e12, "TPU v5litepod": 197e12,
            "TPU v5p": 459e12, "TPU v5": 459e12,
            "TPU v6e": 918e12, "TPU v6 lite": 918e12,
        }
        kind = jax.devices()[0].device_kind
        peak = next((v for k, v in peak_by_kind.items()
                     if kind.lower().startswith(k.lower())), None)
        # matches the production extract_batch_size (config/main_config.yaml);
        # the giant ResNets (448px/384px inputs, 4x-wide trunks) cap the
        # batch so layer1 activations fit a 16 GB chip — throughput and MFU
        # are batch-insensitive once the MXU is saturated, and each row
        # records the batch it ran at
        batch_cap = {"RN50x64": 128, "RN50x16": 256}
        rng_x = np.random.default_rng(0)
        for backbone in args.backbones.split(","):
            backbone = backbone.strip()
            batch = 8 if args.quick else batch_cap.get(backbone, 512)
            cfg_b = CLIP_CONFIGS[backbone]
            model = JaxCLIP(cfg_b, init_random_params(cfg_b))
            if (jax.default_backend() == "tpu"
                    and not cfg_b.vision.is_resnet):
                # the flagship towers must run the fused Pallas attention —
                # a silent XLA fallback here would invalidate the MFU rows
                assert model.attention_impl == "fused", (
                    backbone, model.attention_impl)
            size = cfg_b.vision.image_size
            imgs_np = rng_x.integers(0, 256, (batch, size, size, 3),
                                     dtype=np.uint8)
            imgs_dev = jnp.asarray(imgs_np)
            device_sync(imgs_dev)
            flops = None
            try:
                cost = model._encode_image.lower(
                    model.params, imgs_dev
                ).compile().cost_analysis()
                if isinstance(cost, (list, tuple)):
                    cost = cost[0]
                flops = float(cost.get("flops", 0.0)) or None
            except Exception:
                pass

            # pure device compute: batch already resident, no transfer.
            # Amortized over n_chain DIFFERENT batches scanned inside ONE
            # jitted program — a single dispatch+sync pays the tunneled
            # link's fixed round trip (measured ~33 ms on degraded days),
            # which would otherwise be billed to "device compute"
            n_chain = 1 if args.quick else 8
            # trailing dims flattened: a [.., 224, 3] minor pair would be
            # lane-tiled 3 -> 128 in HBM (42x the bytes, OOM at batch 512)
            stack = jnp.asarray(rng_x.integers(
                0, 256, (n_chain, batch, size, size * 3), dtype=np.uint8
            ))
            device_sync(stack)

            @jax.jit
            def encode_chain(params, stack):
                def step(_, xb):
                    emb = model._encode_image(
                        params, xb.reshape(batch, size, size, 3)
                    )
                    return None, jnp.sum(emb)
                _, sums = jax.lax.scan(step, None, stack)
                return sums

            elapsed_all, _ = timed(encode_chain, model.params, stack)
            elapsed = elapsed_all / n_chain
            row = {
                "metric": f"extraction_device_only_{backbone.replace('/', '')}",
                "value": round(batch / elapsed, 1),
                "unit": "imgs/sec",
                "device_kind": kind,
                "batch": batch,
            }
            if flops:
                achieved = flops / elapsed
                row["tflops_per_sec"] = round(achieved / 1e12, 2)
                if peak:
                    row["mfu_pct_bf16_peak"] = round(100 * achieved / peak, 2)
            rows.append(row)

            # host batch: includes the host->device uint8 transfer
            elapsed_h, _ = timed(model.encode_image_batch, imgs_np)
            rows.append({
                "metric": f"extraction_with_transfer_{backbone.replace('/', '')}",
                "value": round(batch / elapsed_h, 1),
                "unit": "imgs/sec",
                "transfer_overhead_x": round(elapsed_h / elapsed, 2),
            })

    # ---- few-shot methods at the Table-2 protocol (--few-shot) -----------
    if args.few_shot:
        from transductive_clip_tpu.core.config import load_full_config
        from transductive_clip_tpu.methods import get_few_shot_method

        # Table 2 (BASELINE.md), ImageNet column, per-task seconds
        fs_refs = {
            "paddle": ("PADDLE", 0.404),
            "laplacian_shot": ("LAPLACIAN_SHOT", 0.210),
            "bdcspn": ("BDCSPN", 0.449),
            "em_dirichlet": ("EM_DIRICHLET", 1.04),
            "alpha_tim": ("ALPHA_TIM", 1.65),
            # opt-in prediction-stability early stop + straggler compaction
            # (tim.py tim_infer docstring); the plain alpha_tim row above
            # stays the reference-exact 1000-step schedule
            "alpha_tim_early_stop": ("ALPHA_TIM", 1.65),
        }
        fs_extra_opts = {
            "alpha_tim_early_stop": [
                "method", "alpha_tim", "tim_early_stop", "True",
                "tim_es_patience", "100", "tim_compact_tasks", "8",
            ],
        }
        shots = 4
        # alpha-TIM's [N, K, K] weights + Adam state bound the batch
        fs_tasks = min(args.tasks, 25)
        cfg_root = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "config")

        # vectorized simplex features (gamma draws), peaked on the label.
        # Concentration scales with K so the label's share of the mass
        # (~50%) resembles real CLIP softmax features at T=30 at any K —
        # with a fixed 60 the K=1000 features are near-noise and the
        # gradient methods' accuracy is meaningless (timings unaffected).
        def simplex(labels, conc=float(n_class)):
            g = rng.gamma(1.0, size=(*labels.shape, n_class)).astype(np.float32)
            g[np.arange(labels.shape[0])[:, None],
              np.arange(labels.shape[1])[None, :], labels] += conc
            return g / g.sum(-1, keepdims=True)

        y_s = np.tile(np.repeat(np.arange(n_class), shots), (fs_tasks, 1))
        # protocol: queries concentrate on k_eff classes per task
        k_eff = 5
        y_q = np.stack([
            rng.choice(rng.choice(n_class, k_eff, replace=False), n_query)
            for _ in range(fs_tasks)
        ])
        # tensors device-resident, as the evaluator's device-side feature
        # tables keep them — run_task times compute, not the host link
        task = {
            "x_s": jnp.asarray(simplex(y_s)), "y_s": jnp.asarray(y_s),
            "x_q": jnp.asarray(simplex(y_q)), "y_q": y_q,
        }
        from transductive_clip_tpu.ops.common import device_sync

        device_sync(task["x_s"])
        methods, best, accs, preds = {}, {}, {}, {}
        for name, (reg_name, ref) in fs_refs.items():
            # variant rows (fs_extra_opts) carry their own "method" opt;
            # the later occurrence wins in the double --opts merge
            base_method = name if name not in fs_extra_opts else \
                fs_extra_opts[name][fs_extra_opts[name].index("method") + 1]
            cfg = load_full_config(
                opts=["dataset", "imagenet", "method", base_method, "shots",
                      str(shots), "batch_size", str(fs_tasks),
                      "n_query", str(n_query), "tunable", "False"]
                + fs_extra_opts.get(name, []),
                config_root=cfg_root,
            )
            cfg.n_class = cfg.num_classes_test = n_class
            methods[name] = get_few_shot_method(reg_name, args=cfg)
            methods[name].run_task(dict(task), shot=shots)  # compile/warmup
            best[name] = np.inf
        # round-robin x3, per-method minimum: the shared tunneled chip has
        # transient multi-second slowdown windows; interleaving decorrelates
        # them from any one method's measurement
        for _ in range(3):
            for name in fs_refs:
                t0 = time.perf_counter()
                logs = methods[name].run_task(dict(task), shot=shots)
                best[name] = min(best[name], time.perf_counter() - t0)
                accs[name] = float(np.mean(logs["acc"][:, -1]))
                preds[name] = np.asarray(logs["preds"])
        for name, (reg_name, ref) in fs_refs.items():
            per_task = best[name] / fs_tasks
            row = {
                "metric": f"few_shot_{name}_imagenet_protocol",
                "value": round(per_task * 1000, 2),
                "unit": "ms/task",
                "vs_baseline": round(ref / per_task, 2),
                "acc": round(accs[name], 4),
                "baseline_note": f"reference Table 2: {ref}s/task, "
                                 "unspecified GPU",
            }
            if name == "alpha_tim_early_stop":
                # measured evidence for the opt-in shortcut: prediction
                # agreement with the reference-exact schedule's row
                row["agreement_vs_exact"] = round(float(
                    (preds[name] == preds["alpha_tim"]).mean()), 4)
            rows.append(row)

        # ---- end-to-end fused few-shot pipeline (EM-Dirichlet) ----------
        # The evaluator's steady-state batch: sample support+query indices
        # on host, ship two int32 matrices, ONE program (device gathers +
        # flip remap + method + argmax accuracy), combined end fetch. Note
        # the [N, n_class*shots, K] support statistics are per-BATCH work
        # by protocol design (the sampler redraws the support per task,
        # reference: sampler_few_shot.py:64-76) — inside the program they
        # are computed once per solve, outside the EM loop
        # (methods/few_shot/em_dirichlet.py).
        import jax as _jax

        from transductive_clip_tpu.tasks import (
            CategoriesSamplerFewShot,
            SamplerQueryFewShot,
            SamplerSupportFewShot,
        )

        per_class_s, per_class_q = shots * 2, 16
        labels_s_tab = np.repeat(np.arange(n_class), per_class_s)
        labels_q_tab = np.repeat(np.arange(n_class), per_class_q)
        feats_s_dev = jnp.asarray(simplex(labels_s_tab[None, :])[0])
        feats_q_dev = jnp.asarray(simplex(labels_q_tab[None, :])[0])
        labels_s_dev = jnp.asarray(labels_s_tab, jnp.int32)
        labels_q_dev = jnp.asarray(labels_q_tab, jnp.int32)
        sampler = CategoriesSamplerFewShot(
            fs_tasks, k_eff, n_class, shots, n_query,
            force_query_size=True, rng=np.random.default_rng(0),
        )
        sampler.create_list_classes(labels_s_tab, labels_q_tab)
        idx_s = np.stack(list(SamplerSupportFewShot(sampler)))
        idx_q = np.stack(list(SamplerQueryFewShot(sampler)))

        method_ff = methods["em_dirichlet"]        # warmed blocking above
        res0 = method_ff.run_task_fused(
            feats_s_dev, feats_q_dev, labels_s_dev, labels_q_dev,
            idx_s, idx_q, shot=shots,
        )
        if res0 is None:
            raise RuntimeError(
                "few-shot run_task_fused unexpectedly fell back — a host "
                "step remains inside the fused trace"
            )
        _jax.device_get(res0.handles)              # compile/warmup
        n_rep = 3
        t0 = time.perf_counter()
        pending = [
            method_ff.run_task_fused(
                feats_s_dev, feats_q_dev, labels_s_dev, labels_q_dev,
                idx_s, idx_q, shot=shots,
            )
            for _ in range(n_rep)
        ]
        host = _jax.device_get([r.handles for r in pending])
        elapsed_ff = (time.perf_counter() - t0) / n_rep
        logs_ff = pending[0].finalize(host[0], elapsed_ff / fs_tasks)
        rows.append({
            "metric": "end_to_end_few_shot_fused",
            "value": round(elapsed_ff / fs_tasks * 1000, 2),
            "unit": "ms/task",
            "vs_baseline": round(
                fs_refs["em_dirichlet"][1] * fs_tasks / elapsed_ff, 2
            ),
            "acc": round(float(np.mean(logs_ff["acc"][:, -1])), 4),
            "baseline_note": "EM-Dirichlet 4-shot, fused_dispatch pipeline "
                             f"(gather+remap+method+accuracy, one program/"
                             f"batch), fetch amortized over {n_rep} batches",
        })

    # ---- auction-vs-exact assignment divergence (--matching-divergence) --
    if args.matching_divergence:
        # The device auction terminates at eps-complementary slackness
        # (total value >= optimum - R*eps, ops/auction.py), so near-tied
        # prototype margins CAN yield a different cluster->class assignment
        # than the exact JV solver. This measures how often that actually
        # happens, through the two REAL production paths (the fused device
        # program vs the host JV branch of clustering_accuracy), on the
        # same EM outputs: at protocol statistics and on a deliberately
        # flat stress distribution (concentration 3 -> overlapping
        # clusters, small margins). (reference: src/utils.py:380-417 exact
        # Hungarian; PARITY.md 'Known intentional deviations')
        from transductive_clip_tpu.core.config import CfgNode
        from transductive_clip_tpu.methods.base import clustering_accuracy

        div_batch = min(n_task, 100)
        n_batches = max(1, args.div_tasks // div_batch)
        for label, conc in (("protocol", 60.0), ("flat_conc3", 3.0)):
            diff_tasks = diff_queries = total_q = 0
            acc_dev_sum = acc_host_sum = 0.0
            rng_d = np.random.default_rng(7)
            for b in range(n_batches):
                xb, yb = make_zero_shot_tasks(
                    rng_d, div_batch, n_query, n_class, concentration=conc
                )
                ub, _ = em_dirichlet_infer(
                    jnp.asarray(xb), lambd, n_iter=20, iter_mm=1000,
                    hard=False, solver=fast_solver, compact_first=True,
                )
                base = dict(n_class=n_class, num_classes_test=n_class,
                            T=30, use_softmax_feature=True,
                            graph_matching=True, proto_device=True)
                acc_d, preds_d = clustering_accuracy(
                    ub, jnp.asarray(xb), yb,
                    CfgNode(dict(base, matching_backend="device")),
                )
                acc_h, preds_h = clustering_accuracy(
                    ub, jnp.asarray(xb), yb,
                    CfgNode(dict(base, matching_backend="host")),
                )
                neq = np.asarray(preds_d) != np.asarray(preds_h)
                diff_tasks += int(neq.any(axis=1).sum())
                diff_queries += int(neq.sum())
                total_q += neq.size
                acc_dev_sum += float(np.sum(acc_d))
                acc_host_sum += float(np.sum(acc_h))
            n_total = n_batches * div_batch
            rows.append({
                "metric": f"matching_divergence_{label}",
                "value": round(diff_tasks / n_total, 6),
                "unit": "task_diff_rate",
                "tasks_compared": n_total,
                "tasks_differing": diff_tasks,
                "query_diff_rate": round(diff_queries / total_q, 8),
                "acc_device": round(acc_dev_sum / n_total, 6),
                "acc_host_jv": round(acc_host_sum / n_total, 6),
                "acc_delta": round(
                    (acc_dev_sum - acc_host_sum) / n_total, 8
                ),
                "baseline_note": "device auction (eps=1e-5, gap <= R*eps) "
                                 "vs exact host JV on identical EM outputs",
            })

    if args.save_measured:
        if args.quick or backend != "tpu":
            sys.exit("--save-measured records production-shape TPU numbers "
                     f"only (this run: quick={args.quick}, "
                     f"backend={backend})")
        save_measured(args.save_measured, rows, backend)

    print()
    print(f"backend={backend}  n_task={n_task} n_query={n_query} "
          f"n_class={n_class}")
    if not rows:
        print("(no sections selected)")
        return
    w = max(len(r["metric"]) for r in rows)
    for r in rows:
        if r.get("skipped"):
            print(f"{r['metric']:<{w}}  SKIPPED: {r['reason']}")
            continue
        extra = (f"  vs_baseline={r['vs_baseline']}x"
                 if "vs_baseline" in r else f"  acc={r.get('acc')}")
        print(f"{r['metric']:<{w}}  {r['value']:>10} {r['unit']:<9}{extra}")


if __name__ == "__main__":
    if os.environ.get("PALLAS_AXON_POOL_IPS"):
        # fail FAST when the tunneled TPU backend is unreachable: its init
        # hangs (not errors) in-process, so probe it in a bounded
        # subprocess first. No CPU fallback here — this suite exists to
        # measure the chip; silent CPU numbers would mislead.
        from transductive_clip_tpu.utils.backend_probe import (
            backend_reachable,
        )

        if not backend_reachable():
            sys.exit("bench_suite: TPU backend unreachable (init probe "
                     "hung/failed); rerun when the tunnel is back, or force "
                     "CPU explicitly with JAX_PLATFORM_NAME=cpu and an "
                     "unset PALLAS_AXON_POOL_IPS")
    main()

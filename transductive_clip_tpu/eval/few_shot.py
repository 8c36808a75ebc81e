"""Few-shot evaluator (reference: src/eval_few_shot.py).

Adds to the zero-shot pipeline: support features from the train split,
support/query label remap in the task generator, and hyperparameter
auto-selection from stored validation grids (the argmax-accuracy row of
results_few_shot/val/<ds>/<METHOD>_<word>_s<shots>.txt; ImageNet reuses
caltech101's grid — reference: eval_few_shot.py:130-187).
"""

from __future__ import annotations

import os

import numpy as np

from ..core.logger import Logger
from ..core.metrics import compute_confidence_interval
from ..core.profiling import PhaseTimer, trace_if_requested
from ..features.cache import (
    load_feature_cache,
    softmax_cache_path,
    visual_cache_path,
)
from ..methods import get_few_shot_method
from ..tasks import (
    CategoriesSamplerFewShot,
    SamplerQueryFewShot,
    SamplerSupportFewShot,
    TasksGeneratorFewShot,
)

from .zero_shot import _maybe_task_mesh

# method -> the hyperparameter tuned on the validation set
VAL_PARAM = {
    "LAPLACIAN_SHOT": "lmd",
    "ALPHA_TIM": "alpha_value",
    "PADDLE": "lambd",
    "BDCSPN": "temp",
}


class EvaluatorFewShot:
    def __init__(self, device=None, args=None, log_file=None):
        self.device = device
        self.args = args
        self.log_file = log_file
        self.logger = Logger(__name__, log_file) if log_file else None
        self.val_param = None

    def _log(self, msg):
        if self.logger:
            self.logger.info(msg)

    # ------------------------------------------------------------------
    def cache_paths(self):
        args = self.args
        root = getattr(args, "root", "data")
        store = str(args.get("feature_store", "plk"))
        if args.use_softmax_feature:
            support = softmax_cache_path(args.dataset, "train", args.backbone, args.T, root=root, store=store)
            query = softmax_cache_path(args.dataset, args.used_test_set, args.backbone, args.T, root=root, store=store)
        else:
            support = visual_cache_path(args.dataset, "train", args.backbone, root=root, store=store)
            query = visual_cache_path(args.dataset, args.used_test_set, args.backbone, root=root, store=store)
        return support, query

    def run_full_evaluation(self, model=None, preprocess=None):
        args = self.args
        support_path, query_path = self.cache_paths()
        if not (os.path.exists(support_path) and os.path.exists(query_path)):
            from .extraction import ensure_features

            ensure_features(
                args, model, preprocess, splits=("train", "val", "test")
            )
        text_features = None
        if not args.use_softmax_feature:
            from .extraction import get_text_features

            text_features = get_text_features(args, model)
        support_features, support_labels = load_feature_cache(support_path)
        query_features, query_labels = load_feature_cache(query_path)
        mean_acc, mean_time = self.evaluate_tasks(
            support_features, support_labels, query_features, query_labels,
            text_features=text_features,
        )
        self.report_results(mean_acc, mean_time)
        return mean_acc, mean_time

    # -- validation-grid hyperparameter selection ----------------------
    def get_method_val_param(self):
        name = VAL_PARAM.get(self.args.name_method)
        if name is not None:
            self.val_param = self.args[name]

    def set_value_opt_param(self, opt_param):
        name = VAL_PARAM.get(self.args.name_method)
        if name is not None:
            self.args[name] = opt_param

    def set_method_opt_param(self):
        """Pick the argmax-accuracy row of the stored val grid."""
        args = self.args
        word = "_softmax" if args.use_softmax_feature else "_visual"
        dataset = "caltech101" if args.dataset == "imagenet" else args.dataset
        name_file = os.path.join(
            "results_few_shot", "val", dataset,
            f"{args.name_method}{word}_s{args.shots}.txt",
        )
        try:
            params, accs = [], []
            with open(name_file) as f:
                for i, line in enumerate(f):
                    # the reference skips the header AND the first grid row
                    # (eval_few_shot.py:171-173); kept for selection parity
                    # with the published tables
                    if i < 2 or not line.strip():
                        continue
                    cols = line.split("\t")
                    params.append(float(cols[0]))
                    accs.append(float(cols[1]))
            accs = np.array(accs)
            idx = np.argwhere(accs == accs.max())[-1][0]
            opt_param = params[idx]
            self._log(f"Selected tuned parameter {opt_param} from {name_file}")
            self.set_value_opt_param(opt_param)
        except (OSError, ValueError, IndexError) as e:
            raise ValueError(
                "The optimal parameter was not found "
                f"(looked in {name_file}). Run the validation sweep first "
                "(scripts/opt_parameters.sh)."
            ) from e

    # ------------------------------------------------------------------
    def evaluate_tasks(self, support_features, support_labels,
                       query_features, query_labels, text_features=None):
        args = self.args
        self._log(
            f"=> Running evaluation with method {args.name_method} "
            f"on {args.dataset} ({args.used_test_set} set, {args.shots}-shot)"
        )
        rng = np.random.default_rng(args.seed if args.seed is not None else None)
        if args.used_test_set == "test" and args.tunable:
            self.set_method_opt_param()
        method = get_few_shot_method(
            args.name_method, args=args, log_file=self.log_file
        )
        timer = PhaseTimer()
        mesh = _maybe_task_mesh(args, self.logger)
        if mesh is not None:
            method.set_mesh(mesh)

        # device-resident feature tables + on-device gather/remap: the
        # support table is n_class*shots*d per task (1.6 GB/batch at the
        # ImageNet protocol) — only int32 indices cross the link per batch.
        # The flipped-unique label remap is the constant flip
        # label -> n_class-1-label (support covers every class), and the
        # softmax column permutation is a reversed slice — both exact
        # (tests assert equality with the host generator path).
        # the constant-flip remap/column reversal is exact only when support
        # labels are exactly {0..n_class-1}: check the max too, not just the
        # distinct count (labels {0..998, 1000} would silently corrupt)
        _supp_unique = np.unique(np.asarray(support_labels))
        device_gather = bool(args.get("device_gather", True)) and (
            len(_supp_unique) == int(args.n_class)
            and int(_supp_unique.max()) == int(args.n_class) - 1
            and int(_supp_unique.min()) == 0
        )
        if device_gather:
            import jax.numpy as jnp

            from .zero_shot import _device_gather

            feats_s_dev = jnp.asarray(np.asarray(support_features, np.float32))
            feats_q_dev = jnp.asarray(np.asarray(query_features, np.float32))
            labels_s_np = np.asarray(support_labels)
            labels_q_np = np.asarray(query_labels)
            labels_s_dev = jnp.asarray(labels_s_np, jnp.int32)
            labels_q_dev = jnp.asarray(labels_q_np, jnp.int32)
        # fused one-dispatch path (methods/base.py run_task_fused): per
        # batch only the two index matrices cross the link; gathers, the
        # flip remap, the method, and the accuracy run as one program
        from .zero_shot import resolve_fused_dispatch

        use_fused = resolve_fused_dispatch(args, device_gather)

        results_task, results_time = [], []
        from .zero_shot import _resolve_n_batches

        n_batches = _resolve_n_batches(args, self.logger)
        # sampler pools are RNG-free functions of the constant label arrays:
        # build them once, not per batch (the reference rebuilds per batch,
        # eval_few_shot.py:151-157 — an O(n_class * N) host scan each time;
        # hoisting is draw-order exact since only __iter__ consumes rng)
        sampler = CategoriesSamplerFewShot(
            args.batch_size, args.k_eff, args.n_class, args.shots,
            args.n_query, force_query_size=True, rng=rng,
            support_draw=str(args.get("support_draw", "vectorized")),
        )
        sampler.create_list_classes(support_labels, query_labels)
        def build_tasks_from_idx(idx_s, idx_q):
            x_s = _device_gather(feats_s_dev, idx_s)
            x_q = _device_gather(feats_q_dev, idx_q)
            y_s = labels_s_np[idx_s]
            y_q = labels_q_np[idx_q]
            if args.use_softmax_feature:
                x_s, x_q = x_s[..., ::-1], x_q[..., ::-1]
                y_s = int(args.n_class) - 1 - y_s
                y_q = int(args.n_class) - 1 - y_q
            tasks = {
                "x_s": x_s, "y_s": y_s[..., None],
                "x_q": x_q, "y_q": y_q[..., None],
            }
            if text_features is not None:
                tasks["text_features"] = text_features
            if mesh is not None:
                from ..parallel import shard_task_batch

                tasks["x_s"] = shard_task_batch(tasks["x_s"], mesh)
                tasks["x_q"] = shard_task_batch(tasks["x_q"], mesh)
            return tasks

        def make_batch():
            if device_gather:
                # keep the reference's draw order: query first, then
                # support (matches the host loader construction below).
                # Only the indices are drawn here — the gather is fused
                # into the method program on the fused path
                idx_q = np.stack(list(SamplerQueryFewShot(sampler)))
                idx_s = np.stack(list(SamplerSupportFewShot(sampler)))
                return ("idx", idx_s, idx_q)
            else:
                loader_query = [
                    (query_features[idx], query_labels[idx])
                    for idx in SamplerQueryFewShot(sampler)
                ]
                loader_support = [
                    (support_features[idx], support_labels[idx])
                    for idx in SamplerSupportFewShot(sampler)
                ]
                tasks = TasksGeneratorFewShot(
                    k_eff=args.k_eff, shot=args.shots, n_query=args.n_query,
                    n_class=args.n_class, loader_support=loader_support,
                    loader_query=loader_query, args=args,
                ).generate_tasks()
                if text_features is not None:
                    tasks["text_features"] = text_features
                if mesh is not None:
                    from ..parallel import shard_task_batch

                    tasks["x_s"] = shard_task_batch(tasks["x_s"], mesh)
                    tasks["x_q"] = shard_task_batch(tasks["x_q"], mesh)
                return ("tasks", tasks)

        # prefetch (opt-in): one worker thread samples batch i+1 while the
        # device runs batch i — worthwhile when the train split has
        # ImageNet-sized class pools (sampling ~0.7 s/batch); measured
        # neutral-to-slightly-negative when sampling is cheap, hence
        # default off. The single worker keeps the rng draw order
        # identical to the sequential loop.
        prefetch = bool(args.get("prefetch_sampling", False)) and n_batches > 1
        pool = None
        if prefetch:
            from concurrent.futures import ThreadPoolExecutor

            pool = ThreadPoolExecutor(1)
        from .zero_shot import finalize_deferred, resolve_defer_fetch

        defer = resolve_defer_fetch(args, self.logger)
        deferred, t_tail0 = [], None
        # bound pinned device memory (see eval/zero_shot.py): flush every
        # ``defer_flush_batches`` deferred batches (0 = never)
        flush_n = int(args.get("defer_flush_batches", 32) or 0)

        def _flush_deferred():
            nonlocal deferred, t_tail0
            if flush_n and len(deferred) >= flush_n:
                import time as _t

                finalize_deferred(
                    deferred, t_tail0, int(args.batch_size),
                    results_task, results_time, timer,
                )
                deferred, t_tail0 = [], _t.perf_counter()
        try:
            with trace_if_requested(args.get("profile_dir")):
                pending = pool.submit(make_batch) if prefetch else None
                for b in range(n_batches):
                    with timer.phase("sampling"):
                        item = pending.result() if prefetch else make_batch()
                    if prefetch and b + 1 < n_batches:
                        pending = pool.submit(make_batch)
                    idx_s = idx_q = tasks = None
                    if item[0] == "idx":
                        idx_s, idx_q = item[1], item[2]
                    else:
                        tasks = item[1]
                    # fused one-dispatch path: only the index matrices
                    # cross the link
                    if defer and use_fused and b > 0 and idx_s is not None:
                        with timer.phase("dispatch"):
                            res = method.run_task_fused(
                                feats_s_dev, feats_q_dev, labels_s_dev,
                                labels_q_dev, idx_s, idx_q,
                                shot=args.shots, text_features=text_features,
                            )
                        if res is not None:
                            deferred.append(res)
                            _flush_deferred()
                            continue
                        use_fused = False
                        self._log(
                            "fused_dispatch: configuration needs a host "
                            "step per batch; using per-program deferred "
                            "dispatch"
                        )
                    if tasks is None:
                        with timer.phase("sampling"):
                            tasks = build_tasks_from_idx(idx_s, idx_q)
                    # batch 0 runs blocking (compiles the programs); later
                    # batches dispatch async, fetched together at the end
                    if defer and b > 0:
                        with timer.phase("dispatch"):
                            res = method.run_task_deferred(
                                tasks, shot=args.shots
                            )
                        if res is not None:
                            deferred.append(res)
                            _flush_deferred()
                            continue
                        defer = False
                        self._log(
                            "defer_fetch: configuration needs a host step "
                            "per batch; falling back to blocking run_task"
                        )
                    with timer.phase("method"):
                        logs = method.run_task(tasks, shot=args.shots)
                    acc_mean, _ = compute_confidence_interval(logs["acc"][:, -1])
                    results_task.append(acc_mean)
                    results_time.append(logs["timestamps"])
                    if defer and b == 0 and n_batches > 1:
                        import time as _time

                        if use_fused and idx_s is not None:
                            # warm the fused program's compile cache before
                            # the timed deferred tail (result discarded)
                            if method.run_task_fused(
                                feats_s_dev, feats_q_dev, labels_s_dev,
                                labels_q_dev, idx_s, idx_q,
                                shot=args.shots, text_features=text_features,
                            ) is None:
                                use_fused = False
                        t_tail0 = _time.perf_counter()
        finally:
            if pool is not None:
                pool.shutdown(wait=False)

        if deferred:
            finalize_deferred(
                deferred, t_tail0, int(args.batch_size),
                results_task, results_time, timer,
            )
        self._log("phase timing -- " + timer.summary())
        # the first batch's time includes jit compilation; exclude it from
        # the reported mean when there are later (steady-state) batches
        if len(results_time) > 1:
            results_time = results_time[1:]
        else:
            self._log(
                "note: single-batch run — reported mean time includes "
                "jit compilation"
            )
        return float(np.mean(results_task)), float(np.mean(results_time))

    # ------------------------------------------------------------------
    def report_results(self, mean_accuracies, mean_times):
        args = self.args
        self._log("----- Final results -----")
        word = "_softmax" if args.use_softmax_feature else "_visual"
        path = os.path.join(
            "results_few_shot", str(args.used_test_set), str(args.dataset)
        )
        self._log(
            f"{args.shots}-shot mean test accuracy over "
            f"{args.number_tasks} tasks: {mean_accuracies}"
        )
        self._log(
            f"{args.shots}-shot mean time over "
            f"{args.number_tasks} tasks: {mean_times}"
        )
        if args.used_test_set == "val":
            # validation sweep: append "<param>\t<acc>" to the val grid
            self.get_method_val_param()
            os.makedirs(path, exist_ok=True)
            name_file = os.path.join(
                path, f"{args.name_method}{word}_s{args.shots}.txt"
            )
            new_file = not os.path.isfile(name_file)
            with open(name_file, "a") as f:
                if new_file:
                    f.write("val_param\tacc\n")
                f.write(
                    f"{self.val_param}\t{round(100 * mean_accuracies, 2)}\t\n"
                )
        elif args.used_test_set == "test" and args.save_results:
            os.makedirs(path, exist_ok=True)
            name_file = os.path.join(
                path, f"{args.name_method}{word}_s{args.shots}.txt"
            )
            new_file = not os.path.isfile(name_file)
            with open(name_file, "a") as f:
                if new_file:
                    f.write("shots\tn_query\tk_eff\tacc\n\t\n")
                f.write(
                    f"{args.shots}\t{args.n_query}\t{args.k_eff}\t"
                    f"{round(100 * mean_accuracies, 1)}\t\n"
                )

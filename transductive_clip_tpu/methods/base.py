"""Shared machinery for transductive methods.

Design (TPU-native): every method's math lives in a pure, jitted function
``(arrays, dynamic scalars; static iteration counts) -> (u/preds, criterion
trace)`` built from ``lax.scan`` over EM iterations, batched over the leading
task axis. The classes here are thin host-side wrappers that provide the
reference-compatible ``run_task(task_dic) -> logs`` API
(reference: src/methods/zero_shot/em_dirichlet.py:100-121), handle timing,
and run the (tiny, once-per-batch) cluster->class matching on the host.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from ..core.logger import Logger
from ..ops.common import EPS, device_sync, get_one_hot
from ..ops.matching import basic_matching, cluster_prototypes, hungarian_matching
from ..ops.precision import f32_einsum


def init_soft_assignments(query, cfg, text_features=None):
    """Initial soft assignments u0.

    For softmax features u0 is the features themselves; for visual features
    u0 = softmax(T * normalize(q) @ text_features^T)
    (reference: soft_kmeans.py:185-197).
    """
    if cfg.use_softmax_feature:
        return query
    if text_features is None:
        raise ValueError(
            "Visual-feature initialization requires CLIP text features; "
            "pass them in the task dict under 'text_features'."
        )
    q = query / jnp.linalg.norm(query, axis=-1, keepdims=True)
    sims = f32_einsum("tnd,kd->tnk", q, text_features)
    return jax.nn.softmax(cfg.T * sims, axis=-1)


from functools import partial


def _select_impl(cfg, key):
    """Shared validate-and-resolve for the row-selection knobs ('auto' ->
    'topk'; 'rank' = the sort-free selection)."""
    v = str(cfg.get(key, "auto"))
    if v == "auto":
        return "topk"
    if v not in ("topk", "rank"):
        raise ValueError(
            f"unknown {key} {v!r}; expected 'auto', 'topk' or 'rank'"
        )
    return v


def _proto_select(cfg):
    """Row-selection implementation for the device accuracy path:
    'topk' (sort-based) or 'rank' (sort-free cumsum selection — same row
    set with distinct indices, see `_rank_select_rows`). 'auto' currently
    resolves to 'topk'."""
    return _select_impl(cfg, "proto_select")


def compact_select_impl(cfg):
    """Row-selection implementation for the EM compact step: 'topk'
    (sort-based, mass-ordered) or 'rank' (sort-free covering selection —
    same selected set whenever at most n_compact clusters carry mass, the
    regime where compaction itself is exact; ops.common.rank_select_rows).
    'auto' currently resolves to 'topk' (measured equal-or-faster on the
    tunneled v5e; the knob exists because the winner is shape- and
    backend-dependent)."""
    return _select_impl(cfg, "compact_select")


def _matching_backend(cfg):
    """'auto' (default) -> the on-device auction on TPU (measured 0.4 vs
    ~9 ms/task for the host JV at K=1000; scripts/bench_suite.py), the host
    JV solver elsewhere."""
    backend = str(cfg.get("matching_backend", "auto"))
    if backend == "auto":
        backend = "device" if jax.default_backend() == "tpu" else "host"
    return backend


@partial(jax.jit, static_argnames=("use_softmax", "R", "graph_matching",
                                   "select"))
def _accuracy_device(u, query, y_q, T, text_features, use_softmax: bool,
                     R: int, graph_matching: bool, select: str = "topk"):
    """The full zero-shot accuracy reduction on device: prototypes ->
    cluster->class matching (batched auction / argmax) -> LUT rename ->
    per-task accuracy. Only scalars and [N, n] ints need to cross the host
    link per batch (the [N, R, C] prototype probabilities stay device-
    resident unless the rare auction-budget fallback pulls them)
    (reference: eval_zero_shot.py:176-184 + utils.py:380-417).

    Returns (acc [N, 1], new_preds [N, n], ok scalar bool, preds [N, n],
    idx [N, R], probs [N, R, C]); the last three are only fetched on
    fallback.
    """
    from ..ops.auction import auction_assign

    n_task, _, n_class = u.shape
    preds, idx, probs, present = _proto_rows_device(
        u, query, T, text_features, use_softmax, R, select
    )
    if graph_matching:
        cols = auction_assign(probs * present[..., None])       # [N, R]
        ok = jnp.all(cols >= 0)
        cols = jnp.maximum(cols, 0)
    else:
        cols = jnp.argmax(probs, axis=-1)
        ok = jnp.asarray(True)
    # rename via a dense match-select (each pred matches at most one
    # PRESENT row: top_k rows are distinct, and rank-selected absent rows
    # share idx 0 but are masked out here; unmatched preds -> 0 like the
    # zero-filled LUT). A scatter+gather LUT serializes the scatter on TPU.
    match = (preds[:, :, None] == idx[:, None, :]) \
        & present[:, None, :]                                   # [N, n, R]
    new_preds = jnp.sum(
        jnp.where(match, cols[:, None, :].astype(preds.dtype), 0), axis=2
    )
    acc = jnp.mean((new_preds == y_q).astype(jnp.float32), axis=1,
                   keepdims=True)
    return acc, new_preds, ok, preds, idx, probs


def _rank_select_rows(counts, R):
    """Sort-free populated-row selection (see ``ops.common.rank_select_rows``;
    the selected set contains every populated row because
    R >= the number of distinct predicted clusters — only the ordering
    differs from ``top_k``'s, which nothing downstream depends on)."""
    from ..ops.common import rank_select_rows

    return rank_select_rows(counts, R, thresh=EPS)


@partial(jax.jit, static_argnames=("use_softmax", "R", "select"))
def _proto_rows_device(u, query, T, text_features, use_softmax: bool, R: int,
                       select: str = "topk"):
    """Cluster prototypes -> class probabilities on device, compressed to the
    top-R clusters by population (R = min(K, n_query) always covers every
    cluster present in the predictions — exact, see ops/matching.py).
    ``select='rank'`` picks the same row set sort-free (`_rank_select_rows`).

    Returns (preds [N,n], row_idx [N,R], row_probs [N,R,C], present [N,R]).
    The prototype einsum is the accuracy path's FLOPs hot spot at ImageNet
    scale ([100,1000,1000] contraction); on the MXU it is ~ms, vs ~20 s for
    the host-numpy equivalent (measured; see scripts/bench_suite.py).
    """
    n_class = u.shape[2]
    preds = jnp.argmax(u, axis=2)
    one_hot = get_one_hot(preds, n_class)                       # [N, n, K]
    counts = jnp.sum(one_hot, axis=1)                           # [N, K]
    if select == "rank":
        cnt_c, idx, _ = _rank_select_rows(counts, R)
    else:
        cnt_c, idx = jax.lax.top_k(counts, R)                   # [N, R]
    oh_c = jnp.take_along_axis(one_hot, idx[:, None, :], axis=2)
    protos = f32_einsum("tnr,tnd->trd", oh_c, query)            # [N, R, d]
    present = cnt_c > EPS
    protos = protos / jnp.maximum(cnt_c, EPS)[..., None]
    protos = protos * present[..., None]                        # empty -> 0
    if use_softmax:
        probs = protos
    else:
        norms = jnp.linalg.norm(protos, axis=-1, keepdims=True)
        protos_n = protos / jnp.maximum(norms, EPS)
        probs = jax.nn.softmax(
            T * f32_einsum("trd,cd->trc", protos_n, text_features), axis=-1
        )
    return preds, idx, probs, present


def _accuracy_inputs(u, query, cfg, text_features):
    """Shared device-input preparation for the clustering-accuracy programs."""
    n_class = int(cfg.n_class)
    u = jnp.asarray(u)
    query = jnp.asarray(query, jnp.float32)
    use_softmax = bool(cfg.use_softmax_feature)
    R = min(n_class, u.shape[1], u.shape[2])
    tf = (jnp.zeros((1, query.shape[2]), jnp.float32) if use_softmax
          else jnp.asarray(text_features, jnp.float32))
    return u, query, tf, use_softmax, R, n_class


def clustering_accuracy(u, query, y_q, cfg, text_features=None, extras=()):
    """Zero-shot clustering accuracy with cluster->class matching.

    Mirrors compute_acc_clustering (reference: em_dirichlet.py:61-92):
    cluster prototypes are mean query features (softmax path) or
    text-similarity softmaxes of normalized mean visual features.
    Returns (acc [N, 1], matched_preds [N, n]).

    Prototypes/probabilities are computed on device over the present-cluster
    rows only (exact; ``proto_device: False`` switches to the all-host
    reference-shaped path, equivalence-tested in tests/test_ops.py).

    ``extras``: optional tuple of device values to fetch in the SAME host
    round trip as the accuracy outputs (each separate ``device_get`` on the
    tunneled link costs a full RTT; ``run_task`` folds its criterion trace,
    executed-iteration count, and deferred compaction scalar in here).
    When non-empty the return is (acc, preds, extras_host).
    """
    y_q = np.asarray(y_q)
    if not bool(cfg.get("proto_device", True)):
        out = _clustering_accuracy_host(u, query, y_q, cfg, text_features)
        return out + (jax.device_get(extras),) if extras else out

    from ..ops.matching import hungarian_matching_rows

    graph_matching = bool(cfg.graph_matching)
    u, query, tf, use_softmax, R, n_class = _accuracy_inputs(
        u, query, cfg, text_features
    )

    if graph_matching and _matching_backend(cfg) != "device":
        # host JV matching: the [N, R, C] prototype rows must come back
        preds_d, idx_d, probs_d, _ = _proto_rows_device(
            u, query, jnp.float32(cfg.T), tf, use_softmax, R,
            _proto_select(cfg),
        )
        preds, idx_h, probs_h, extras_h = jax.device_get(
            (preds_d, idx_d, probs_d, extras)
        )
        new_preds = hungarian_matching_rows(preds, idx_h, probs_h, n_class)
        acc = (new_preds == y_q).mean(axis=1, keepdims=True)
        acc = acc.astype(np.float32)
        return (acc, new_preds, extras_h) if extras else (acc, new_preds)

    acc_d, new_preds_d, ok, preds_d, idx_d, probs_d = _accuracy_device(
        u, query, jnp.asarray(y_q, jnp.int32), jnp.float32(cfg.T), tf,
        use_softmax, R, graph_matching, _proto_select(cfg),
    )
    # one combined transfer for everything small — each host round trip on
    # a tunneled link costs whole milliseconds, so acc/preds/ok (and the
    # caller's extras) ship together
    acc, new_preds, ok, extras_h = jax.device_get(
        (acc_d, new_preds_d, ok, extras)
    )
    if graph_matching and not bool(ok):
        # auction hit its iteration budget with unassigned rows
        # (pathological tie structure); fall back to the exact host solver
        # rather than emitting wrong labels
        new_preds = hungarian_matching_rows(
            np.asarray(preds_d), np.asarray(idx_d), np.asarray(probs_d),
            n_class,
        )
        acc = ((new_preds == y_q).mean(axis=1, keepdims=True)
               .astype(np.float32))
    return (acc, new_preds, extras_h) if extras else (acc, new_preds)


def _clustering_accuracy_host(u, query, y_q, cfg, text_features=None):
    """All-host accuracy path, shaped exactly like the reference
    (full-width float64 prototypes; reference: em_dirichlet.py:61-92)."""
    u = np.asarray(u)
    query_np = np.asarray(query)
    n_class = int(cfg.n_class)
    preds = u.argmax(axis=2)
    one_hot = (preds[..., None] == np.arange(n_class)).astype(np.float64)
    prototypes = cluster_prototypes(one_hot, query_np)

    if cfg.use_softmax_feature:
        probs = prototypes
    else:
        tf = np.asarray(text_features)
        norms = np.linalg.norm(prototypes, axis=-1, keepdims=True)
        protos_n = prototypes / np.maximum(norms, EPS)
        logits = cfg.T * protos_n @ tf.T
        logits -= logits.max(axis=-1, keepdims=True)
        e = np.exp(logits)
        probs = e / e.sum(axis=-1, keepdims=True)

    if bool(cfg.graph_matching):
        if _matching_backend(cfg) == "device":
            new_preds = device_matching(preds, one_hot, probs)
        else:
            new_preds = hungarian_matching(preds, probs)
    else:
        new_preds = basic_matching(preds, probs)

    acc = (new_preds == y_q).mean(axis=1, keepdims=True)
    return acc.astype(np.float32), new_preds


@jax.jit
def _max_populated_clusters(u, eps):
    return jnp.max(jnp.sum(jnp.sum(u, axis=1) > eps, axis=-1))


def _warn_compaction(populated, n_compact, logger=None):
    if populated > n_compact:
        msg = (
            f"cluster compaction solved {n_compact} rows but up to "
            f"{populated} clusters carry mass at some iteration; results "
            "may deviate from the exact path — set compact_clusters False "
            "to verify"
        )
        if logger is not None:
            logger.warning(msg)
        else:
            import warnings

            warnings.warn(msg)


def check_compaction_validity(u, n_compact, logger=None, eps=EPS):
    """Blocking form of ``PendingCompactionCheck`` (kept as the simple entry
    point for scripts/tests): post-hoc guard for cluster compaction — if more
    clusters carry mass in the final assignments than the compacted solver
    re-solves, the approximation may have engaged; advise the exact path."""
    return PendingCompactionCheck(u, n_compact, logger=logger, eps=eps).finish()


class PendingCompactionCheck:
    """The compaction sparsity check with its host fetch deferred.

    ``check_compaction_validity`` blocks on a scalar round trip between the
    method program and the accuracy program — a full link RTT per batch on
    the tunneled chip. Method wrappers instead dispatch the device reduction
    here (async) and stash the object on ``self._pending_check``;
    ``run_task`` ships the scalar with its one combined accuracy fetch and
    calls ``finish``."""

    def __init__(self, u=None, n_compact=None, logger=None, eps=EPS,
                 populated=None):
        """Either ``u`` (final assignments; the count reduces on device) or
        ``populated`` (a precomputed count — e.g. the EM loop's max over
        EVERY iteration's incoming populated count, which also catches
        intermediate over-capacity iterations a final-u check would miss)."""
        self.n_compact = n_compact
        self.logger = logger
        if populated is not None:
            self.populated = populated       # device scalar or int
        elif hasattr(u, "devices"):
            self.populated = _max_populated_clusters(u, eps)   # device scalar
        else:
            u_sum = np.asarray(u).sum(axis=1)
            self.populated = int((u_sum > eps).sum(axis=-1).max())

    def finish(self, populated_host=None):
        populated = int(self.populated if populated_host is None
                        else populated_host)
        _warn_compaction(populated, self.n_compact, self.logger)
        return populated


def device_matching(preds, one_hot, probs):
    """Cluster->class matching via the batched on-device auction
    (ops/auction.py): rows = the top-n_query clusters by population (absent
    clusters get constant-zero value rows, which cannot displace real rows
    from their optimum)."""
    import jax.numpy as jnp

    from ..ops.auction import auction_assign

    n_task, n_query, n_class = one_hot.shape
    counts = one_hot.sum(axis=1)                              # [N, K]
    r = min(n_class, n_query)
    idx = np.argsort(-counts, axis=1)[:, :r]                  # [N, R]
    vals = np.take_along_axis(probs, idx[..., None], axis=1)  # [N, R, C]
    present = np.take_along_axis(counts, idx, axis=1) > 0
    vals = vals * present[..., None]
    cols = np.asarray(auction_assign(jnp.asarray(vals, jnp.float32)))
    if (cols < 0).any():
        # iteration budget exhausted: fall back to the exact host solver
        return hungarian_matching(preds, probs)
    lut = np.zeros((n_task, n_class), preds.dtype)
    np.put_along_axis(lut, idx, cols.astype(preds.dtype), axis=1)
    return np.take_along_axis(lut, preds, axis=1)


def direct_accuracy(u, y_q, extras=()):
    """Plain argmax accuracy (few-shot path; reference: few_shot/em_dirichlet.py:50-58).

    The argmax reduces on device when u lives there — only [N, n] int
    predictions cross to the host instead of the [N, n, K] assignments.
    ``extras`` ride the same round trip (see ``clustering_accuracy``);
    when non-empty the return is (acc, preds, extras_host)."""
    if hasattr(u, "devices"):
        preds, extras_h = jax.device_get((jnp.argmax(u, axis=2), extras))
    else:
        preds, extras_h = np.asarray(u).argmax(axis=2), jax.device_get(extras)
    acc = (preds == np.asarray(y_q)).mean(axis=1, keepdims=True)
    acc = acc.astype(np.float32)
    return (acc, preds, extras_h) if extras else (acc, preds)


@jax.jit
def _direct_accuracy_device(u, y_q):
    """Argmax accuracy fully on device (few-shot deferred path)."""
    preds = jnp.argmax(u, axis=2)
    acc = jnp.mean((preds == y_q).astype(jnp.float32), axis=1, keepdims=True)
    return acc, preds


class DeferredTaskResult:
    """One batch's ``run_task`` outputs with every host fetch deferred.

    ``handles`` is a pytree of device values (plus host passthroughs like
    ``None``); the evaluator collects the handles of MANY batches into one
    ``jax.device_get`` — on the tunneled chip each separate fetch or sync
    pays a full link round trip, and deferring them all lets XLA's async
    dispatch overlap batch i's compute with batch i+1's host-side sampling
    (reference cadence: one blocking method + accuracy sync per batch,
    eval_zero_shot.py:160-171). ``finalize(host_values, elapsed_per_task)``
    then builds the same logs dict ``run_task`` returns; accuracy and
    predictions are bit-identical to the blocking path."""

    def __init__(self, handles, finalize):
        self.handles = handles
        self._finalize = finalize

    def finalize(self, host_values, elapsed_per_task):
        return self._finalize(host_values, elapsed_per_task)


def split_infer_out(out):
    """Normalize an ``_infer`` result to (u, criterions, n_exec).

    Methods with early stopping return the executed outer-iteration count
    as a third element (``return_n_iter=True``); fixed-schedule methods
    return two, and ``n_exec`` is None (the criterion-trace length is then
    the executed count)."""
    if isinstance(out, tuple) and len(out) == 3:
        return out
    u, criterions = out
    return u, criterions, None


def timing_logs(elapsed, n_task, n_iter, iter_widths=None):
    """Timing metrics for ``run_task`` logs.

    ``timestamps`` is the honest total wall-clock per task. The reference
    instead records the *cumulative* elapsed time at the end of every outer
    iteration and reports their mean (reference: zero_shot/em_dirichlet.py:
    211,242-244 and get_logs :97) — for n uniform iterations that is
    total * (n+1) / (2n), i.e. about HALF the true per-task cost. The whole
    EM loop here runs inside one compiled program (no host clock per
    iteration), so ``timestamps_cumulative``/``timestamps_ref`` synthesize
    the reference's Table-2 semantics from a per-iteration cost model.

    ``n_iter`` is the EXECUTED outer-iteration count: early-stopping
    methods return it from the compiled loop's carry (``split_infer_out``).
    ``iter_widths`` (optional, length ``n_iter``) is each iteration's
    relative cost: with task compaction the straggler (phase-2) iterations
    run at the narrow buffer width, so modeling them as uniform would
    UNDERSTATE the reference-semantics mean (the true cumulative curve is
    front-loaded) and overstate the implied speedup. Without it, uniform
    cost — exact for fixed schedules and plain early stopping.
    ``timestamps`` (the true total) is always exact.
    """
    per_task = elapsed / n_task
    n = max(int(round(float(n_iter))), 1)
    if iter_widths is not None:
        # a length mismatch is a width-model bug (n_used vs widths-vector
        # rounding drift) — surface it instead of silently going uniform
        assert len(iter_widths) == n, (
            f"iter_widths length {len(iter_widths)} != executed count {n}")
        w = np.asarray(iter_widths, np.float64)
        cumulative = per_task * (np.cumsum(w) / w.sum())
    else:
        cumulative = per_task * (np.arange(1, n + 1) / n)
    return {
        "timestamps": per_task,
        "timestamps_cumulative": cumulative,
        "timestamps_ref": float(cumulative.mean()),
    }


def resolve_exec_count(n_exec):
    """Normalize a method's executed-count output to (n_used, n_full).

    Methods whose outer iterations have non-uniform cost return a length-2
    vector ``[total, full_width]`` (task compaction: iterations after the
    ``full_width``-th ran at the narrow straggler width); the rest return a
    scalar. ``n_full`` is None for the scalar form."""
    if n_exec is None:
        return None, None
    arr = np.asarray(n_exec)
    if arr.ndim == 1 and arr.size == 2:
        return float(arr[0]), int(arr[1])
    return float(arr), None


class TransductiveMethod:
    """Base wrapper. Subclasses set ``acc_mode`` and implement ``_infer``."""

    #: "clustering" -> matched clustering accuracy; "direct" -> argmax accuracy
    acc_mode = "clustering"

    def __init__(self, model=None, device=None, log_file=None, args=None):
        self.model = model
        self.device = device
        self.args = args
        self.log_file = log_file
        self.logger = Logger(type(self).__name__, log_file) if log_file else None
        self.eps = EPS
        self.mesh = None
        #: seconds of verification work (e.g. the compact_first first-batch
        #: guard) a method performed inside _infer that must not count
        #: toward the reported method timing
        self._untimed_overhead_s = 0.0
        #: a PendingCompactionCheck dispatched inside _infer; run_task
        #: fetches its scalar with the combined accuracy transfer
        self._pending_check = None
        #: True only while a blocking run_task executes _infer: exactness
        #: guards (a duplicate solve + host comparison) may only fire there
        #: — their cost is excluded via _untimed_overhead_s, which the
        #: deferred/fused pipelines cannot honor (and a cached fused trace
        #: could not host the comparison at all)
        self._guard_allowed = False

    # -- evaluator guard protocol ------------------------------------------
    def guard_recheck_batches(self):
        """Batches between evaluator-routed blocking guard re-checks.

        0 (default) = the method has no periodic exactness guard. Methods
        whose guards need a host step (EM-Dirichlet's compact_first_iter)
        override this; the evaluator routes every M-th batch through the
        blocking ``run_task`` after :meth:`request_guard_check`, because
        the deferred/fused dispatch paths never re-execute ``_infer``'s
        Python body.
        """
        return 0

    def request_guard_check(self):
        """Ask the next blocking ``_infer`` to re-run its exactness guard.

        No-op for methods without one.
        """

    def _timing_iter_widths(self, n_used, n_full, n_task):
        """Per-iteration relative costs for ``timing_logs``, or None for
        uniform. Methods that return a split executed count (see
        ``resolve_exec_count``) override this with their width model."""
        return None

    def _timing_logs_for(self, elapsed, n_task, n_exec, criterions):
        """The shared executed-count/width plumbing for every logs builder:
        scalar counts get the uniform model, split counts the method's
        width model."""
        n_used, n_full = resolve_exec_count(n_exec)
        if n_used is None:
            n_used = len(criterions)
        return timing_logs(
            elapsed, n_task, n_used,
            iter_widths=self._timing_iter_widths(n_used, n_full, n_task),
        )

    def set_mesh(self, mesh):
        """Attach a (dp, tp) device mesh. Mesh-aware methods annotate their
        jitted state with it; for the rest, dp parallelism still applies via
        the sharded inputs (GSPMD propagates the task-axis sharding)."""
        self.mesh = mesh
        return self

    # -- subclass hook ----------------------------------------------------
    def _infer(self, task):
        """Run the jitted method. Returns (u, criterions [iter] or [iter, ...])."""
        raise NotImplementedError

    def _infer_chunked(self, task):
        """Run ``_infer``, splitting the (independent) task axis into
        ``task_chunk``-sized slices when configured — exact, since tasks
        never interact; lets memory-bound methods (alpha-TIM's autodiff
        residuals at ImageNet scale) run protocol-sized batches on one
        chip. criterion traces are averaged across chunks."""
        chunk = int(self.args.get("task_chunk", 0) or 0)
        n_task = task["x_q"].shape[0]
        if chunk <= 0 or n_task <= chunk or n_task % chunk != 0:
            if chunk > 0 and n_task % chunk != 0:
                self._log(
                    f"task_chunk={chunk} does not divide n_task={n_task}; "
                    "running unchunked"
                )
            return self._infer(task)
        sliced_keys = [
            k for k, v in task.items()
            if hasattr(v, "ndim") and v.ndim >= 1 and v.shape[0] == n_task
            and k != "text_features"
        ]
        us, crits, n_execs = [], [], []
        for s in range(0, n_task, chunk):
            sub = dict(task)
            for k in sliced_keys:
                sub[k] = task[k][s:s + chunk]
            u, crit, n_exec = split_infer_out(self._infer(sub))
            if self._pending_check is not None:
                # chunks would overwrite each other's deferred check; settle
                # each one here (chunked methods are compute-bound — the
                # extra scalar round trip per chunk is noise)
                self._pending_check.finish()
                self._pending_check = None
            us.append(u)
            crits.append(np.asarray(crit))
            n_execs.append(n_exec)
        u_all = np.concatenate([np.asarray(u) for u in us])
        crit_mean = np.mean(crits, axis=0)
        if all(n is not None for n in n_execs):
            # scalar counts and split [total, full_width] vectors both
            # average elementwise (see resolve_exec_count)
            return u_all, crit_mean, np.mean(
                [np.asarray(n) for n in n_execs], axis=0)
        return u_all, crit_mean

    # -- helpers ----------------------------------------------------------
    def _log(self, msg):
        if self.logger is not None:
            self.logger.info(msg)

    def _prepare_zero_shot(self, task_dic):
        query = jnp.asarray(task_dic["x_q"], jnp.float32)
        # with softmax features the feature axis IS the class axis — a
        # mismatched K would otherwise surface as an opaque IndexError deep
        # in the cluster->class matching (ops/matching.py)
        n_class = self.args.get("n_class")
        if (n_class is not None and bool(self.args.get("use_softmax_feature", False))
                and query.shape[-1] != int(n_class)):
            raise ValueError(
                f"x_q feature dim {query.shape[-1]} != n_class {n_class}: "
                "softmax features must have one column per dataset class "
                "(set n_class / dataset to match the feature table)")
        y_q = np.asarray(task_dic["y_q"])
        if y_q.ndim == 3:
            y_q = y_q.squeeze(2)
        text_features = task_dic.get("text_features")
        if text_features is not None:
            text_features = jnp.asarray(text_features, jnp.float32)
        return query, y_q, text_features

    def run_task(self, task_dic, shot=None):
        query, y_q, text_features = self._prepare_zero_shot(task_dic)
        task = dict(task_dic)
        task["x_q"] = query
        task["text_features"] = text_features

        t0 = time.perf_counter()
        self._untimed_overhead_s = 0.0
        self._pending_check = None
        self._guard_allowed = True
        try:
            u, criterions, n_exec = split_infer_out(self._infer_chunked(task))
        finally:
            self._guard_allowed = False
        u = device_sync(u)
        elapsed = time.perf_counter() - t0 - self._untimed_overhead_s
        n_task = query.shape[0]

        # everything small rides ONE host round trip with the accuracy
        # outputs: the criterion trace, the executed-iteration count, and
        # the deferred compaction-check scalar (tunneled links pay whole
        # milliseconds per round trip)
        pend = self._pending_check
        extras = (criterions, n_exec) + (
            (pend.populated,) if pend is not None else ()
        )
        if self.acc_mode == "clustering":
            acc, preds, extras = clustering_accuracy(
                u, query, y_q, self.args, text_features=text_features,
                extras=extras,
            )
        else:
            acc, preds, extras = direct_accuracy(u, y_q, extras=extras)
        criterions, n_exec = extras[0], extras[1]
        if pend is not None:
            pend.finish(extras[2])
        criterions = np.asarray(criterions)
        return {
            "acc": acc,
            "preds": preds,
            "criterions": criterions,
            **self._timing_logs_for(elapsed, n_task, n_exec, criterions),
        }

    def run_task_deferred(self, task_dic, shot=None):
        """Dispatch the method + accuracy programs with NO host sync.

        Returns a :class:`DeferredTaskResult`, or ``None`` when this batch
        needs a host step (host JV matching, host prototype path, task
        chunking, or a host-resident ``u``) — the caller then falls back to
        the blocking ``run_task``. Accuracy/predictions are identical to
        ``run_task``; per-batch method timing is unavailable (the caller
        supplies an amortized per-task time to ``finalize``). The rare
        auction-budget fallback still works: the held device prototype rows
        are only pulled when the fetched ``ok`` flag is False.
        """
        cfg = self.args
        if int(cfg.get("task_chunk", 0) or 0) > 0:
            return None
        if self.acc_mode == "clustering" and not bool(
            cfg.get("proto_device", True)
        ):
            return None
        graph_matching = bool(cfg.graph_matching)
        if (self.acc_mode == "clustering" and graph_matching
                and _matching_backend(cfg) != "device"):
            return None

        query, y_q, text_features = self._prepare_zero_shot(task_dic)
        task = dict(task_dic)
        task["x_q"] = query
        task["text_features"] = text_features

        self._pending_check = None
        u, criterions, n_exec = split_infer_out(self._infer(task))
        if not hasattr(u, "devices"):
            return None
        pend = self._pending_check
        self._pending_check = None
        n_task = query.shape[0]

        if self.acc_mode == "clustering":
            from ..ops.matching import hungarian_matching_rows

            u_d, query_d, tf, use_softmax, R, n_class = _accuracy_inputs(
                u, query, cfg, text_features
            )
            acc_d, new_preds_d, ok, preds_d, idx_d, probs_d = (
                _accuracy_device(
                    u_d, query_d, jnp.asarray(y_q, jnp.int32),
                    jnp.float32(cfg.T), tf, use_softmax, R, graph_matching,
                    _proto_select(cfg),
                )
            )
            handles = (
                acc_d, new_preds_d, ok, criterions, n_exec,
                pend.populated if pend is not None else None,
            )

            def _finalize(host, elapsed_per_task):
                acc, new_preds, ok_h, crit, n_ex, populated = host
                if graph_matching and not bool(ok_h):
                    new_preds = hungarian_matching_rows(
                        np.asarray(preds_d), np.asarray(idx_d),
                        np.asarray(probs_d), n_class,
                    )
                    acc = ((new_preds == y_q).mean(axis=1, keepdims=True)
                           .astype(np.float32))
                return self._deferred_logs(
                    acc, new_preds, crit, n_ex, populated, pend,
                    elapsed_per_task, n_task,
                )
        else:
            acc_d, preds_d2 = _direct_accuracy_device(
                u, jnp.asarray(y_q, jnp.int32)
            )
            handles = (
                acc_d, preds_d2, criterions, n_exec,
                pend.populated if pend is not None else None,
            )

            def _finalize(host, elapsed_per_task):
                acc, preds, crit, n_ex, populated = host
                return self._deferred_logs(
                    np.asarray(acc), preds, crit, n_ex, populated, pend,
                    elapsed_per_task, n_task,
                )

        return DeferredTaskResult(handles, _finalize)

    # -- fused one-dispatch batch --------------------------------------
    #
    # run_task_deferred removes the per-batch host SYNCS, but each batch
    # still pays several dispatch round trips on a tunneled link: the
    # feature-row gather program, the y_q transfer, the method program, the
    # accuracy program, and the compaction-count program (~25 ms RTT floor
    # each on the axon tunnel). run_task_fused folds ALL of them into one
    # jitted program whose only per-batch input is the [n_task, n_query]
    # int32 index matrix — the feature/label tables cross the link once per
    # evaluation. Results are identical to run_task (same traced
    # computations, same dtypes); only the dispatch count changes.
    def _tf_device(self, text_features, d):
        """Device-resident text features for the fused paths, uploaded ONCE
        per distinct host array: the fused program's only per-batch input
        must stay the small idx matrix, and ``jnp.asarray`` on a host array
        re-ships the full [n_class, d] matrix every call (~4 MB/batch at
        CLIP/ImageNet scale over the tunneled link). Identity-keyed; the
        cache holds a reference to the host array so its id can't be
        recycled."""
        if text_features is None:
            return jnp.zeros((1, int(d)), jnp.float32)
        cached = getattr(self, "_tf_dev_cache", None)
        if cached is not None and cached[0] is text_features:
            return cached[1]
        tf = jnp.asarray(text_features, jnp.float32)
        self._tf_dev_cache = (text_features, tf)
        return tf

    def run_task_fused(self, features_dev, labels_dev, idx, shot=None,
                       text_features=None):
        """One-dispatch batch: on-device gather + method + accuracy.

        ``features_dev``/``labels_dev``: device-resident feature table
        [M, d] and labels [M]; ``idx``: host [n_task, n_query] int row
        indices. Returns a :class:`DeferredTaskResult` (same contract as
        ``run_task_deferred``) or ``None`` when the configuration needs a
        host step per batch (task chunking, host prototypes/matching).
        """
        cfg = self.args
        if int(cfg.get("task_chunk", 0) or 0) > 0:
            return None
        graph_matching = bool(cfg.get("graph_matching", False))
        if self.acc_mode == "clustering":
            if not bool(cfg.get("proto_device", True)):
                return None
            if graph_matching and _matching_backend(cfg) != "device":
                return None

        if text_features is None and not bool(cfg.use_softmax_feature):
            return None     # visual-feature methods need the text prototypes
        if getattr(self, "_fused_zs", None) is None:
            self._build_fused_zs()
        tf = self._tf_device(text_features, features_dev.shape[1])
        idx_dev = jnp.asarray(idx, jnp.int32)
        out = self._fused_zs(features_dev, labels_dev, idx_dev, tf)
        if out is None:
            return None
        handles, fallback, pend, n_task = out
        # do NOT hold the fallback triple: probs is [N, R, C] (~35 MB/batch
        # at the ImageNet protocol), and a deferred evaluation holds every
        # batch's handles until the single end fetch — pinning GBs of HBM
        # for buffers only the rare budget-exhausted auction reads. The
        # fused program is a pure function of (table, idx, tf), all of
        # which stay alive anyway, so the fallback recomputes it instead.
        del fallback

        if self.acc_mode == "clustering":
            from ..ops.matching import hungarian_matching_rows

            n_class = int(cfg.n_class)

            def _finalize(host, elapsed_per_task):
                acc, new_preds, ok_h, y_q, crit, n_ex, populated = host
                if graph_matching and not bool(ok_h):
                    # budget-exhausted auction: re-dispatch the (cached)
                    # fused program and pull the big prototype rows only on
                    # this rare path — one extra program call per
                    # fallback batch, no per-batch HBM pinning
                    _, fb, _, _ = self._fused_zs(
                        features_dev, labels_dev, idx_dev, tf
                    )
                    preds_d, idx_d, probs_d = fb
                    new_preds = hungarian_matching_rows(
                        np.asarray(preds_d), np.asarray(idx_d),
                        np.asarray(probs_d), n_class,
                    )
                    acc = ((new_preds == np.asarray(y_q))
                           .mean(axis=1, keepdims=True).astype(np.float32))
                return self._deferred_logs(
                    np.asarray(acc), new_preds, crit, n_ex, populated, pend,
                    elapsed_per_task, n_task,
                )
        else:

            def _finalize(host, elapsed_per_task):
                acc, preds, _y_q, crit, n_ex, populated = host
                return self._deferred_logs(
                    np.asarray(acc), preds, crit, n_ex, populated, pend,
                    elapsed_per_task, n_task,
                )

        return DeferredTaskResult(handles, _finalize)

    def _build_fused_zs(self):
        """Trace-and-cache the fused zero-shot program.

        The method's ``_infer`` runs INSIDE the jit trace (its host-side
        work — logging, config resolution — happens once at trace time;
        exactness guards belong to blocking batches: batch 0, which the
        evaluator always runs before any fused batch, and the periodic
        re-check batches it routes via :meth:`guard_recheck_batches` —
        ``_infer``'s guard logic is gated on ``_guard_allowed``, so the
        trace itself never attempts a host comparison). The deferred
        compaction check created during the trace carries traced scalars;
        its host half (``pend``) is kept and fed the fetched value at
        finalize time.
        """
        cfg = self.args
        graph_matching = bool(cfg.get("graph_matching", False))
        use_clustering = self.acc_mode == "clustering"
        state = {}

        @jax.jit
        def program(feats, labs, idx, tf):
            x_q = jnp.take(feats, idx, axis=0)              # [N, n, d]
            y_q = jnp.take(labs, idx, axis=0).astype(jnp.int32)
            if self.mesh is not None:
                # the per-program path shards the gathered batch over dp
                # (eval/*.py shard_task_batch) BEFORE dispatch; inside the
                # fused program the same resharding is a constraint — it
                # also covers mesh-unaware methods, which otherwise would
                # run the whole batch replicated under GSPMD
                from ..ops.common import constrainer

                con = constrainer(self.mesh)
                x_q = con(x_q, "dp", None, None)
                y_q = con(y_q, "dp", None)
            task = {"x_q": x_q, "y_q": y_q, "text_features": tf}
            self._pending_check = None
            u, criterions, n_exec = split_infer_out(self._infer(task))
            pend = self._pending_check
            self._pending_check = None
            state["pend"] = pend
            populated = pend.populated if pend is not None else None
            if use_clustering:
                u_d, q_d, tf_d, use_softmax, R, _ = _accuracy_inputs(
                    u, x_q, cfg, tf
                )
                acc, new_preds, ok, preds, row_idx, probs = _accuracy_device(
                    u_d, q_d, y_q, jnp.float32(cfg.T), tf_d, use_softmax, R,
                    graph_matching, _proto_select(cfg),
                )
                small = (acc, new_preds, ok, y_q, criterions, n_exec,
                         populated)
                return small, (preds, row_idx, probs)
            acc, preds = _direct_accuracy_device(u, y_q)
            return (acc, preds, y_q, criterions, n_exec, populated), ()

        def runner(feats, labs, idx, tf):
            try:
                handles, fallback = program(feats, labs, idx, tf)
            except (jax.errors.TracerArrayConversionError,
                    jax.errors.ConcretizationTypeError,
                    jax.errors.TracerBoolConversionError):
                # the method's _infer needs a concrete host step (e.g. a
                # host-resident computation); the caller falls back to the
                # per-program deferred path
                return None
            return handles, fallback, state.get("pend"), int(idx.shape[0])

        self._fused_zs = runner

    def _deferred_logs(self, acc, preds, criterions, n_exec, populated,
                       pend, elapsed_per_task, n_task):
        if pend is not None:
            pend.finish(populated)
        criterions = np.asarray(criterions)
        return {
            "acc": np.asarray(acc),
            "preds": np.asarray(preds),
            "criterions": criterions,
            **self._timing_logs_for(
                elapsed_per_task * n_task, n_task, n_exec, criterions),
        }


class FewShotMethod(TransductiveMethod):
    acc_mode = "direct"

    def _prepare_few_shot(self, task_dic):
        support = jnp.asarray(task_dic["x_s"], jnp.float32)
        query = jnp.asarray(task_dic["x_q"], jnp.float32)
        n_class = self.args.get("n_class")
        if (n_class is not None and bool(self.args.get("use_softmax_feature", False))
                and query.shape[-1] != int(n_class)):
            raise ValueError(
                f"x_q feature dim {query.shape[-1]} != n_class {n_class}: "
                "softmax features must have one column per dataset class "
                "(set n_class / dataset to match the feature table)")
        y_s = np.asarray(task_dic["y_s"])
        y_q = np.asarray(task_dic["y_q"])
        if y_s.ndim == 3:
            y_s = y_s.squeeze(2)
        if y_q.ndim == 3:
            y_q = y_q.squeeze(2)
        text_features = task_dic.get("text_features")
        if text_features is not None:
            text_features = jnp.asarray(text_features, jnp.float32)
        return support, query, y_s, y_q, text_features

    def run_task(self, task_dic, shot=None):
        support, query, y_s, y_q, text_features = self._prepare_few_shot(task_dic)
        task = {
            "x_s": support,
            "x_q": query,
            "y_s": jnp.asarray(y_s, jnp.int32),
            "y_q": y_q,
            "text_features": text_features,
        }

        t0 = time.perf_counter()
        self._pending_check = None
        u, criterions, n_exec = split_infer_out(self._infer_chunked(task))
        u = device_sync(u)
        elapsed = time.perf_counter() - t0
        n_task = query.shape[0]

        # one combined fetch: argmax preds + criterions + executed count +
        # the deferred compaction scalar (see TransductiveMethod.run_task)
        pend = self._pending_check
        extras = (criterions, n_exec) + (
            (pend.populated,) if pend is not None else ()
        )
        acc, preds, extras = direct_accuracy(u, y_q, extras=extras)
        criterions, n_exec = extras[0], extras[1]
        if pend is not None:
            pend.finish(extras[2])
        criterions = np.asarray(criterions)
        return {
            "acc": acc,
            "preds": preds,
            "criterions": criterions,
            **self._timing_logs_for(elapsed, n_task, n_exec, criterions),
        }

    def run_task_fused(self, feats_s_dev, feats_q_dev, labels_s_dev,
                       labels_q_dev, idx_s, idx_q, shot=None,
                       text_features=None):
        """One-dispatch few-shot batch: on-device gathers + the softmax
        flip/column-reversal remap + method + argmax accuracy in a single
        jitted program (see ``TransductiveMethod.run_task_fused``). Only
        the two int32 index matrices cross the link per batch.
        """
        cfg = self.args
        if int(cfg.get("task_chunk", 0) or 0) > 0:
            return None
        if text_features is None and not bool(cfg.use_softmax_feature):
            # visual-feature methods need the text prototypes; planting a
            # zeros placeholder would silently produce a uniform init where
            # run_task raises (init_soft_assignments's guard)
            return None
        if getattr(self, "_fused_fs", None) is None:
            self._build_fused_fs()
        tf = self._tf_device(text_features, feats_q_dev.shape[1])
        out = self._fused_fs(
            feats_s_dev, feats_q_dev, labels_s_dev, labels_q_dev,
            jnp.asarray(idx_s, jnp.int32), jnp.asarray(idx_q, jnp.int32), tf,
        )
        if out is None:
            return None
        handles, pend, n_task = out

        def _finalize(host, elapsed_per_task):
            acc, preds, crit, n_ex, populated = host
            return self._deferred_logs(
                np.asarray(acc), preds, crit, n_ex, populated, pend,
                elapsed_per_task, n_task,
            )

        return DeferredTaskResult(handles, _finalize)

    def _build_fused_fs(self):
        cfg = self.args
        flip = bool(cfg.use_softmax_feature)
        n_class = int(cfg.n_class)
        state = {}

        @jax.jit
        def program(feats_s, feats_q, labs_s, labs_q, idx_s, idx_q, tf):
            x_s = jnp.take(feats_s, idx_s, axis=0)
            x_q = jnp.take(feats_q, idx_q, axis=0)
            y_s = jnp.take(labs_s, idx_s, axis=0).astype(jnp.int32)
            y_q = jnp.take(labs_q, idx_q, axis=0).astype(jnp.int32)
            if flip:
                # the generator's flipped-unique label remap reduces to the
                # constant flip + reversed feature columns when support
                # covers {0..K-1} (the evaluator verifies that before
                # enabling device_gather; reference:
                # task_generator_few_shot.py:41-52)
                x_s, x_q = x_s[..., ::-1], x_q[..., ::-1]
                y_s = n_class - 1 - y_s
                y_q = n_class - 1 - y_q
            if self.mesh is not None:
                # mirror the per-program path's shard_task_batch (see the
                # zero-shot fused builder)
                from ..ops.common import constrainer

                con = constrainer(self.mesh)
                x_s = con(x_s, "dp", None, None)
                x_q = con(x_q, "dp", None, None)
                y_s = con(y_s, "dp", None)
                y_q = con(y_q, "dp", None)
            task = {"x_s": x_s, "x_q": x_q, "y_s": y_s, "y_q": y_q,
                    "text_features": tf}
            self._pending_check = None
            u, criterions, n_exec = split_infer_out(self._infer(task))
            pend = self._pending_check
            self._pending_check = None
            state["pend"] = pend
            populated = pend.populated if pend is not None else None
            acc, preds = _direct_accuracy_device(u, y_q)
            return acc, preds, criterions, n_exec, populated

        def runner(*args):
            try:
                handles = program(*args)
            except (jax.errors.TracerArrayConversionError,
                    jax.errors.ConcretizationTypeError,
                    jax.errors.TracerBoolConversionError):
                return None
            return handles, state.get("pend"), int(args[4].shape[0])

        self._fused_fs = runner

    def run_task_deferred(self, task_dic, shot=None):
        """Few-shot deferred dispatch — see ``TransductiveMethod``'s.

        Always fully on-device (argmax accuracy); returns ``None`` for task
        chunking or a host-resident ``u``."""
        cfg = self.args
        if int(cfg.get("task_chunk", 0) or 0) > 0:
            return None
        support, query, y_s, y_q, text_features = self._prepare_few_shot(
            task_dic
        )
        task = {
            "x_s": support,
            "x_q": query,
            "y_s": jnp.asarray(y_s, jnp.int32),
            "y_q": y_q,
            "text_features": text_features,
        }
        self._pending_check = None
        u, criterions, n_exec = split_infer_out(self._infer(task))
        if not hasattr(u, "devices"):
            return None
        pend = self._pending_check
        self._pending_check = None
        n_task = query.shape[0]
        acc_d, preds_d = _direct_accuracy_device(
            u, jnp.asarray(y_q, jnp.int32)
        )
        handles = (
            acc_d, preds_d, criterions, n_exec,
            pend.populated if pend is not None else None,
        )

        def _finalize(host, elapsed_per_task):
            acc, preds, crit, n_ex, populated = host
            return self._deferred_logs(
                np.asarray(acc), preds, crit, n_ex, populated, pend,
                elapsed_per_task, n_task,
            )

        return DeferredTaskResult(handles, _finalize)

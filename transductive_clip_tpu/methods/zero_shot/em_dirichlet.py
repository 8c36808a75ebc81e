"""EM-Dirichlet zero-shot clustering (soft and hard assignment variants).

Clusters softmax features with per-class Dirichlet densities via block
coordinate updates (alpha via a device-side fixed-point solver, dual
v = log class proportions, soft/hard assignments u). Functional port of the
reference algorithm (reference: src/methods/zero_shot/em_dirichlet.py:124-246
and hard_em_dirichlet.py:124-271) re-designed for TPU:

* the whole outer EM loop is one ``lax.scan`` under jit,
* the alpha solve is a device-side ``lax.while_loop`` (ops/dirichlet.py) —
  reference-exact MM surrogate or the fast Minka inverse-digamma fixed point
  (same stationary equation), with no host synchronization anywhere,
* per-cluster statistics and the Dirichlet log-density are batched matmuls,
* **cluster compaction**: the huge lambda*v class-proportion term makes u
  numerically one-hot after one update, so at most ~n_query of the K
  clusters are non-empty. The alpha solve runs only on the top-C clusters
  by mass (C = n_query + margin); the remaining rows keep their previous
  alpha exactly as the reference does for empty clusters (reference:
  em_dirichlet.py:224-226). From iteration 2 on this is exact whenever at
  most C clusters carry query mass (the typical underflow regime;
  guaranteed for the hard variant) and the wrapper's post-run sparsity
  check warns otherwise. ``compact_first_iter`` (~2x again: 291 -> 633
  tasks/s at ImageNet scale) compacts iteration 1 too, using the analytic
  alpha=ones logits cache (l3 = 0, l12 = lgamma(K)) so no full-width solve
  ever runs — but iteration 1's u is the dense raw features, so this rests
  only on the lambda*v concentration argument: it is prediction-identical
  at protocol-like feature peaking (verified up to K=1000,
  tests/test_compaction.py) yet can deviate on very flat features, and no
  post-hoc sparsity check can detect an iteration-1 deviation. The default
  ``'auto'`` therefore runs it behind a guard: the wrapper re-solves the
  first task batch — and every ``compact_first_recheck``-th batch after it
  (default 64; <= 0 restores first-batch-only) — with the exact first
  iteration, compares predictions, and permanently falls back (loudly) on
  any mismatch — one extra batch per check, amortized. ``True`` skips the
  guard; ``False`` disables; ``compact_clusters: False`` is the fully
  exact path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.common import EPS, constrainer, get_one_hot
from ...ops.dirichlet import (
    clamped_cluster_means,
    dirichlet_logits_cache,
    update_alpha,
    update_logits_cache_rows,
    weighted_log_means,
)
from ...ops.precision import f32_einsum
from ..base import TransductiveMethod


# margin on top of n_query for the compacted cluster count
_COMPACT_MARGIN = 16
# fast-tier row count: once assignments concentrate (typically <= k_eff <= 10
# populated clusters at the protocol), the solve runs on this many rows
# instead of n_query+margin — gated EXACTLY on the populated count, so it is
# an execution-plan choice, not an approximation
_COMPACT_FAST = 32


def compaction_geometry(n_query: int, n_class: int):
    """(n_compact, engaged): the compacted row count and whether compaction
    applies at these shapes. The single source of truth shared by
    ``em_dirichlet_infer``, the wrapper's first-batch guard, and the
    post-run sparsity check — hand-copied variants of this predicate can
    silently desynchronize the guard from the kernel."""
    n_compact = min(n_class, n_query + _COMPACT_MARGIN)
    return n_compact, n_class > 2 * n_compact


def _finish(u, logits_12, logits_3, lambd, n_query, n_class, hard, con):
    # v (dual of the class proportions) is a pure function of the incoming
    # u, recomputed here each iteration (reference: em_dirichlet.py:145-151)
    v = jnp.log(jnp.mean(u, axis=1) + EPS) + 1.0
    logits = logits_12[:, None, :] + logits_3
    u = jax.nn.softmax(logits + lambd * v[:, None, :] / n_query, axis=2)
    if hard:
        u = get_one_hot(jnp.argmax(u, axis=-1), n_class)
    return con(u, "dp", None, None)


def _em_step_full(u, alpha_old, log_query, lambd, n_query, n_class,
                  iter_mm, solver, hard, con, mesh=None):
    """One full-width EM iteration (all K cluster rows solved)."""
    y_cst, nonzero = weighted_log_means(u, log_query, eps=EPS)
    y_cst = con(y_cst, "dp", None, "tp")
    alpha = update_alpha(alpha_old, y_cst, iter_mm=iter_mm, solver=solver,
                         mesh=mesh)
    # keep previous alpha rows for empty clusters (reference: :224-226)
    alpha = con(jnp.where(nonzero, alpha, alpha_old), "dp", None, "tp")
    l12, l3 = dirichlet_logits_cache(log_query, alpha)
    u = _finish(u, l12, l3, lambd, n_query, n_class, hard, con)
    return u, alpha, l12, l3


def _em_step_compact(u, alpha_old, l12, l3, log_query, lambd, n_query,
                     n_class, iter_mm, solver, hard, n_compact, con,
                     mesh=None, n_fast=None, select="topk"):
    """EM iteration solving alpha only for the top-``n_compact`` clusters.

    The cluster-row gathers/scatters act on alpha's axis 1; the sharded axes
    (tasks over dp, feature axis over tp) are untouched, so no resharding is
    needed on a mesh. The cached Dirichlet log-density terms (l12 [N, K],
    l3 [N, n, K]) are updated only at the changed rows/columns — at ImageNet
    scale this replaces a [N, K, K] lgamma pass + a [N, n, K]x[N, K, K]
    einsum per iteration with their C/K-sized slices (~10x less work,
    numerically the same values recomputed).

    ``n_fast``: optional two-tier solve width. The gathers/einsums always
    run at ``n_compact`` width (cheap, and a fixed contraction width keeps
    their bits independent of the tier decision); only the alpha solve —
    ~80% of the iteration — is tiered: when every task's populated-cluster
    count fits in ``n_fast``, just the first ``n_fast`` (top-mass) rows are
    solved and the tail keeps its old values. Empty rows are frozen and
    criterion-excluded inside the solver either way (``row_mask``), so the
    gate changes execution cost only, not results.
    """
    n_task = u.shape[0]
    u_sum = jnp.sum(u, axis=1)                                    # [N, K]
    # 'rank' = sort-free covering selection, self-guarded: a lax.cond falls
    # back to top_k in-trace whenever more than n_compact rows carry mass
    # (rank would keep the lowest-INDEXED rows there; top_k keeps the
    # heaviest). In the <= n_compact regime — exactly where compaction
    # itself is exact — the selected SET matches top_k's, and the fast-tier
    # gate below only fires when ALL populated rows fit in n_fast, so
    # populated-first ordering preserves its coverage guarantee too.
    # thresh=EPS matches the ``populated`` predicate
    # (ops.common.select_rows_covering).
    from ...ops.common import select_rows_covering

    mass, idx = select_rows_covering(u_sum, n_compact, EPS, select)
    u_c = jnp.take_along_axis(u, idx[:, None, :], axis=2)         # [N, n, C]
    num_c = f32_einsum("tnc,tnd->tcd", u_c, log_query)
    y_c, nonzero_c = clamped_cluster_means(num_c, mass, eps=EPS)
    y_c = con(y_c, "dp", None, "tp")
    alpha_c_old = jnp.take_along_axis(alpha_old, idx[..., None], axis=1)
    row_mask = nonzero_c[..., 0]                                  # [N, C]
    # resolve the solver family ONCE at the widest (n_compact) width so the
    # fast/wide lax.cond below can never mix two solver families
    # (ops.dirichlet.resolve_solver_for_width)
    from ...ops.dirichlet import resolve_solver_for_width

    solver = resolve_solver_for_width(solver, n_compact)

    def solve(a_old, y, m):
        # empty rows are frozen at a_old inside the solver and excluded
        # from its convergence criterion, so the executed inner iteration
        # count depends only on the populated rows — the wide tier's extra
        # (empty) rows then cannot perturb the stop decision
        return update_alpha(a_old, y, iter_mm=iter_mm, solver=solver,
                            mesh=mesh, row_mask=m)

    populated = jnp.sum(u_sum > EPS, axis=-1)                     # [N]
    if n_fast is None or n_fast >= n_compact:
        alpha_c = solve(alpha_c_old, y_c, row_mask)
    else:
        def fast(ops):
            a_old, y, m = ops
            a = solve(a_old[:, :n_fast], y[:, :n_fast], m[:, :n_fast])
            # the tail rows carry no mass (gate) -> frozen at old values
            return jnp.concatenate([a, a_old[:, n_fast:]], axis=1)

        alpha_c = jax.lax.cond(
            jnp.max(populated) <= n_fast, fast, lambda ops: solve(*ops),
            (alpha_c_old, y_c, row_mask),
        )
    alpha_c = jnp.where(nonzero_c, alpha_c, alpha_c_old)
    alpha = alpha_old.at[jnp.arange(n_task)[:, None], idx].set(alpha_c)
    alpha = con(alpha, "dp", None, "tp")

    # criterion ingredients from the compact rows only: alpha changed
    # nowhere else, so the full-tensor norms reduce to these + the carried
    # sum-of-squares. This also makes alpha_old DEAD after the row scatter,
    # letting XLA update the [N, K, K] buffer in place instead of copying
    # it to keep the old value alive for a full-width criterion
    # (~2 GB/iteration of HBM traffic saved at ImageNet scale).
    diff_ss = jnp.sum((alpha_c - alpha_c_old) ** 2, axis=(1, 2))    # [N]
    # elementwise difference BEFORE the reduction: restored rows are
    # exact zeros, so the sum is bit-identical for any solve-tier width
    delta_ss = jnp.sum(alpha_c ** 2 - alpha_c_old ** 2, axis=(1, 2))

    # incremental logits-cache update at the changed rows only (same
    # row_mask binding as the solver freeze — the two predicates must stay
    # identical for the tier gate's bit-exactness argument)
    l12, l3 = update_logits_cache_rows(l12, l3, idx, alpha_c, log_query,
                                       row_mask=row_mask)
    l3 = con(l3, "dp", None, None)

    u = _finish(u, l12, l3, lambd, n_query, n_class, hard, con)
    # batch-max populated count this step consumed: feeds the sparsity
    # warning so an intermediate over-capacity iteration cannot pass a
    # final-u-only check silently
    return u, alpha, l12, l3, diff_ss, delta_ss, jnp.max(populated)


def _rel_per_task(alpha_old, alpha):
    """Per-task relative alpha change [N]. Its mean matches the reference's
    recorded criterion; its max gates early stopping so no task is frozen
    mid-trajectory; per-task values feed task compaction.

    Axis reductions, NOT ``reshape(n_task, -1)`` + ``linalg.norm``: merging
    the tp-sharded class axis into an unsharded flat axis makes GSPMD
    all-gather the full per-task [K, K] alpha onto every device (measured:
    two 8 MB/device all-gathers at ImageNet shapes on a (4,2) mesh), while a
    ``sum`` over the sharded axes lowers to a partial reduction + an [N]
    all-reduce. ``tests/test_parallel.py::test_hlo_sharding_*`` guards
    this."""
    diff_ss = jnp.sum((alpha_old - alpha) ** 2, axis=(1, 2))
    denom_ss = jnp.sum(alpha_old ** 2, axis=(1, 2))
    return jnp.sqrt(diff_ss) / jnp.sqrt(denom_ss)


def _rel_from_ss(diff_ss, ss_before):
    """The same per-task relative change, from compact-row sums of squares
    (diff is zero outside the re-solved rows; ss_before is the carried
    ||alpha_old||^2). Same value as ``_rel_per_task`` up to fp accumulation
    order."""
    return jnp.sqrt(diff_ss) / jnp.sqrt(ss_before)


@partial(jax.jit, static_argnames=("n_iter", "iter_mm", "hard", "solver",
                                   "compact", "compact_first", "early_stop",
                                   "mesh", "return_n_iter", "select",
                                   "compact_tasks", "return_iter_split"))
def em_dirichlet_infer(query, lambd, n_iter: int, iter_mm: int, hard: bool,
                       solver: str = "mm", compact: bool = True,
                       compact_first: bool = False,
                       early_stop: bool = True,
                       early_stop_tol: float = 1e-6,
                       mesh=None, return_n_iter: bool = False,
                       select: str = "topk", compact_tasks: int = 8,
                       return_iter_split: bool = False):
    """Run EM-Dirichlet on a batch of tasks.

    query: [N, n, K] softmax features. Returns (u [N, n, K], criterions [n_iter]).

    With ``early_stop`` the outer EM loop ends once the batch-max relative
    alpha change drops below ``early_stop_tol`` — the remaining iterations
    are fixed-point no-ops the reference executes blindly (its criterion
    trace shows ~1e-8 by iteration ~4 at ImageNet scale). The criterion
    trace keeps length ``n_iter`` (padded with the last value).

    ``compact_tasks`` (> 0, with ``early_stop``): **task compaction**. At
    protocol statistics most tasks converge in 3-5 iterations but 1-2
    stragglers per 100-task batch sit near the tolerance and run the full
    schedule — and the batch-max gate makes every task pay for them
    (measured: seed-0 batches 5 iters / ~48 ms, typical batches 20 iters /
    ~220 ms at the ImageNet protocol). Tasks are independent along axis 0,
    so once at most ``compact_tasks`` tasks remain unconverged they are
    gathered into a narrow [compact_tasks, n, K] buffer and only they keep
    iterating (phase 2), the rest stay frozen at their sub-tolerance state.
    Same update equations; converged tasks stop at their own convergence
    point instead of the stragglers', so results can differ from the
    batch-max schedule in low-order bits only (both are below ``tol``) —
    prediction-equivalence is tested (tests/test_compaction.py) and
    ``compact_tasks=0`` restores the batch-max schedule. During phase 2 the
    criterion trace records sum(straggler rel)/N: frozen tasks genuinely
    change by exactly 0.

    ``mesh``: optional (dp, tp) ``jax.sharding.Mesh``. Tasks shard over dp;
    alpha's trailing feature axis shards over tp (per-device state
    N/dp * K * K/tp), with the digamma row-sums and Dirichlet-logit
    contraction psumming over ICI. Single-chip (mesh=None) and multi-chip
    runs execute the same step code.
    """
    con = constrainer(mesh)
    n_task, n_query, n_class = query.shape
    query = con(query, "dp", None, None)
    log_query = jnp.log(query + EPS)
    u = query
    alpha = con(jnp.ones((n_task, n_class, n_class), jnp.float32),
                "dp", None, "tp")

    n_compact, engaged = compaction_geometry(n_query, n_class)
    use_compact = compact and engaged
    n_fast = min(_COMPACT_FAST, n_compact)

    def compact_step(u, alpha_old, l12, l3, step_select=select):
        """Two-tier compact iteration: the alpha solve (the Minka solve is
        ~80% of the iteration) runs on only ``n_fast`` top-mass rows when
        every task's populated-cluster count fits — gated exactly inside
        ``_em_step_compact``, bit-identical results either way."""
        return _em_step_compact(
            u, alpha_old, l12, l3, log_query, lambd, n_query, n_class,
            iter_mm, solver, hard, n_compact, con, mesh, n_fast=n_fast,
            select=step_select,
        )

    alpha_old = alpha
    ss = jnp.full((n_task,), float(n_class) * n_class, jnp.float32)
    pop_max0 = jnp.array(0, jnp.int32)
    if use_compact and compact_first:
        # Opt-in: iteration 1 compact too, via the analytic alpha = ones
        # logits cache (l3 = (a-1).log-x = 0, l12 = lgamma(K)); only the
        # top-C clusters by raw-feature mass get solved, the rest keep
        # alpha = 1. Removes the full-width [N, K, K] solve + lgamma pass
        # that dominates the early-stopped runtime (291 -> 633 tasks/s at
        # ImageNet scale). See the module docstring for why this defaults
        # off: iteration 1's u is dense, the approximation rests only on
        # the lambda*v concentration argument, and an iteration-1
        # deviation is not detectable post hoc.
        import math

        l12 = jnp.full((n_task, n_class), math.lgamma(n_class), jnp.float32)
        l3 = con(jnp.zeros((n_task, n_query, n_class), jnp.float32),
                 "dp", None, None)
        # iteration 1's u is the DENSE raw features — every cluster carries
        # mass, so covering selection doesn't apply; the top-C-by-mass sort
        # is what makes compact_first prediction-identical at protocol
        # peaking. 'rank' only ever replaces the sort on the sparse
        # iterations (2+), where the selected SET is provably identical.
        # Its populated count (= K by construction) is excluded from the
        # sparsity warning: iteration-1 compaction is validated by the
        # first-batch guard instead.
        u, alpha, l12, l3, diff_ss, delta_ss, _pop1 = compact_step(
            u, alpha, l12, l3, step_select="topk"
        )
        # ||ones||^2 = K*K exactly; no full-tensor read anywhere
        rel = _rel_from_ss(diff_ss, ss)
        ss = ss + delta_ss
    else:
        u, alpha, l12, l3 = _em_step_full(
            u, alpha, log_query, lambd, n_query, n_class, iter_mm, solver,
            hard, con, mesh,
        )
        rel = _rel_per_task(alpha_old, alpha)
        if use_compact:
            # carried ||alpha||^2 for the compact criterion (one full read,
            # once, fused with the first criterion's reads; axis reduction —
            # see _rel_per_task for why no reshape)
            ss = jnp.sum(alpha ** 2, axis=(1, 2))
    crits0 = jnp.full((n_iter,), jnp.mean(rel), jnp.float32)

    # task compaction engages only with early stopping (it refines the stop
    # schedule) and when the narrow buffer is actually narrower than the
    # batch; compact_tasks=0 disables
    n_narrow = int(compact_tasks)
    use_tc = early_stop and 0 < n_narrow < n_task

    def make_body(lq, trace_n):
        """EM-loop body over whatever task batch ``lq`` ([M, n, K] log
        features) belongs to — phase 1 runs it at the full batch, phase 2
        at the gathered straggler buffer. ``trace_n`` is the criterion
        trace's divisor (always the FULL task count: frozen tasks change
        by exactly 0, so sum(rel)/N stays the batch-mean criterion)."""

        def body(carry):
            u, alpha_old, l12, l3, ss, it, crits, _, pop_max = carry
            if use_compact:
                u, alpha, l12, l3, diff_ss, delta_ss, pop = _em_step_compact(
                    u, alpha_old, l12, l3, lq, lambd, n_query, n_class,
                    iter_mm, solver, hard, n_compact, con, mesh,
                    n_fast=n_fast, select=select,
                )
                rel = _rel_from_ss(diff_ss, ss)
                ss = ss + delta_ss
                pop_max = jnp.maximum(pop_max, pop)
            else:
                u, alpha, l12, l3 = _em_step_full(
                    u, alpha_old, lq, lambd, n_query, n_class,
                    iter_mm, solver, hard, con, mesh,
                )
                rel = _rel_per_task(alpha_old, alpha)
            crit = jnp.sum(rel) / trace_n
            crits = jnp.where(jnp.arange(n_iter) >= it, crit, crits)
            return u, alpha, l12, l3, ss, it + 1, crits, rel, pop_max

        return body

    def cond_phase1(carry):
        rel = carry[7]
        not_done = carry[5] < n_iter
        if not early_stop:
            return not_done
        if use_tc:
            # run full-width only while the stragglers outnumber the narrow
            # buffer; phase 2 picks up the rest
            busy = jnp.sum(rel >= early_stop_tol) > n_narrow
        else:
            busy = jnp.max(rel) >= early_stop_tol
        return jnp.logical_and(not_done, busy)

    u, alpha, l12, l3, ss, it, criterions, rel, pop_max = jax.lax.while_loop(
        cond_phase1, make_body(log_query, n_task),
        (u, alpha, l12, l3, ss, jnp.array(1, jnp.int32), crits0, rel,
         pop_max0),
    )
    # iterations executed at the full batch width (phase 1); phase-2
    # iterations below run at the narrow straggler width, so per-iteration
    # cost is non-uniform — the split lets timing_logs weight its
    # synthesized reference-semantics cumulative trace by width
    it_full = it

    if use_tc:
        # gather the n_narrow most-unconverged tasks (top_k covers every
        # task with rel >= tol by the phase-1 exit condition; converged
        # fillers keep iterating harmlessly, like under the batch-max gate)
        _, t_idx = jax.lax.top_k(rel, n_narrow)
        grab = lambda a: jnp.take(a, t_idx, axis=0)

        def cond_phase2(carry):
            return jnp.logical_and(carry[5] < n_iter,
                                   jnp.max(carry[7]) >= early_stop_tol)

        u_n, _, _, _, _, it, criterions, _, pop_max = jax.lax.while_loop(
            cond_phase2, make_body(grab(log_query), n_task),
            (grab(u), grab(alpha), grab(l12), grab(l3), grab(ss), it,
             criterions, grab(rel), pop_max),
        )
        u = con(u.at[t_idx].set(u_n), "dp", None, None)
    if return_iter_split:
        # [total executed iterations, full-width (phase-1) iterations]:
        # the remainder ran at the narrow compact_tasks width — consumed by
        # the wrapper's width-weighted reference-semantics timing
        return u, criterions, jnp.stack([it, it_full]), pop_max
    if return_n_iter:
        # executed outer-iteration count (makes the synthesized
        # reference-semantics timing metric exact under early stopping) and
        # the max populated-cluster count any compact iteration consumed
        # (feeds the sparsity warning; a final-u check would miss an
        # intermediate over-capacity iteration)
        return u, criterions, it, pop_max
    return u, criterions


class EM_DIRICHLET(TransductiveMethod):
    acc_mode = "clustering"
    hard = False

    def __init__(self, model=None, device=None, log_file=None, args=None):
        super().__init__(model, device, log_file, args)
        # lambda = int(K / 5) * n_query (reference: em_dirichlet.py:14)
        self.lambd = float(int(args.num_classes_test / 5) * args.n_query)
        self.n_iter = int(args.iter)
        self.iter_mm = int(args.iter_mm)
        # 'minka' (Newton-on-row-sum, default) / 'minka_fp' (plain fixed
        # point) / 'pallas' (VMEM-resident kernel) / 'mm' (reference-exact
        # surrogate loop); all solve the same stationary equation
        solver = str(args.get("dirichlet_solver", "auto"))
        if solver == "auto":
            # the XLA Newton-Minka solve wins on every backend measured:
            # quadratic convergence where the fixed-point kernels are
            # linear (headline 1346 -> 2124 tasks/s vs the Pallas kernel
            # on the tunneled v5e; ops/dirichlet.py)
            solver = "minka"
        self.solver = solver
        self.compact = bool(args.get("compact_clusters", True))
        # 'auto' (default): iteration-1 compaction ON, verified against the
        # exact first iteration on the first task batch (see _infer); True:
        # on unguarded (pre-validated by the user); False: off.
        cf = args.get("compact_first_iter", "auto")
        if isinstance(cf, str):
            cf = cf.strip().lower()
            cf = {"true": True, "false": False}.get(cf, cf)
        if cf not in (True, False, "auto"):
            raise ValueError(
                f"compact_first_iter must be True, False, or 'auto'; "
                f"got {cf!r}"
            )
        self.compact_first = cf in (True, "auto")
        self._cf_guard_pending = cf == "auto"
        self._cf_guard_auto = cf == "auto"
        # periodic re-verification cadence (batches between guard re-runs;
        # <= 0 keeps the first-batch-only guard). Tasks are i.i.d. within an
        # evaluation so the first-batch check covers the typical case, but
        # an iteration-1 deviation is the one shortcut undetectable post
        # hoc — re-checking every M batches bounds the exposure at the same
        # amortized (untimed-overhead) cost. The guard runs only inside a
        # blocking ``run_task`` (where its duplicate solve is excluded from
        # the honest timestamps): direct-API loops advance the internal
        # batch counter per call, while the deferred/fused evaluator
        # pipelines — whose cached program never re-executes ``_infer`` —
        # route every M-th batch through blocking ``run_task`` after
        # calling :meth:`request_guard_check` (eval/zero_shot.py).
        self._cf_recheck = int(args.get("compact_first_recheck", 64))
        self._cf_batches_since_check = 0
        self._cf_force_guard = False
        self.early_stop = bool(args.get("early_stop", True))
        self.early_stop_tol = float(args.get("early_stop_tol", 1e-6))
        # task compaction (see em_dirichlet_infer): straggler tasks iterate
        # in a narrow gathered buffer instead of holding the whole batch at
        # full width. True -> default width 8; False/0 -> batch-max schedule.
        ct = args.get("compact_tasks", True)
        if isinstance(ct, str):
            ct = {"true": True, "false": False}.get(ct.strip().lower(), ct)
        if ct is True:
            ct = 8
        self.compact_tasks = int(ct or 0)
        from ..base import compact_select_impl

        self.select = compact_select_impl(args)

    def guard_recheck_batches(self):
        """Periodic-guard cadence for evaluator-driven dispatch paths.

        Returns the configured ``compact_first_recheck`` when the auto
        guard could still need re-running (0 = no periodic checks). The
        deferred and fused evaluator pipelines cannot host the guard —
        the fused program caches ``_infer``'s trace, so its Python-side
        counter never advances — so the evaluator routes every M-th batch
        through blocking ``run_task`` after :meth:`request_guard_check`.
        """
        if self._cf_guard_auto and self.compact_first and self._cf_recheck > 0:
            return self._cf_recheck
        return 0

    def request_guard_check(self):
        """Force the next blocking ``_infer`` to run the exactness guard."""
        self._cf_force_guard = True

    def _timing_iter_widths(self, n_used, n_full, n_task):
        """Per-iteration cost model for the synthesized reference-semantics
        timing: with task compaction the first ``n_full`` iterations ran at
        the full batch width and the rest at the narrow ``compact_tasks``
        width. Modeling phase-2 cost as proportional to width slightly
        UNDERSTATES it (narrow iterations keep fixed dispatch/solve
        overheads), which front-loads the modeled cumulative curve and so
        errs toward OVERSTATING our reference-semantics time — the
        conservative direction for the implied speedup. Uniform (None)
        whenever no narrow phase ran.

        Under ``task_chunk`` the phase-1 iterations execute at the chunk
        width (each chunk solves independently; ``_infer_chunked`` averages
        the split counts), so the full-width cost is the chunk width, not
        ``n_task`` — using ``n_task`` would over-weight phase 1 in the
        synthesized cumulative curve for chunked runs."""
        n = max(int(round(float(n_used))), 1)
        if n_full is None or n_full >= n:
            return None
        chunk = int(self.args.get("task_chunk", 0) or 0)
        full_w = int(n_task)
        if 0 < chunk < n_task and n_task % chunk == 0:
            full_w = chunk           # chunked run: phase 1 ran at chunk width
        narrow = min(max(int(self.compact_tasks), 1), full_w)
        w = np.full(n, float(narrow))
        w[:max(int(n_full), 0)] = float(full_w)
        return w

    def _check_compaction(self, pop_max, n_query, n_class):
        n_compact, engaged = compaction_geometry(n_query, n_class)
        if self.compact and engaged:
            from ..base import PendingCompactionCheck

            # deferred: run_task fetches the scalar with its one combined
            # accuracy transfer instead of paying a round trip here.
            # pop_max is the max populated count over every compact
            # iteration (not just the final u), so an intermediate
            # over-capacity iteration cannot pass silently.
            self._pending_check = PendingCompactionCheck(
                populated=pop_max, n_compact=n_compact, logger=self.logger
            )

    def _run_infer(self, x_q, compact_first: bool):
        return em_dirichlet_infer(
            x_q,
            jnp.float32(self.lambd),
            n_iter=self.n_iter,
            iter_mm=self.iter_mm,
            hard=self.hard,
            solver=self.solver,
            compact=self.compact,
            compact_first=compact_first,
            early_stop=self.early_stop,
            early_stop_tol=jnp.float32(self.early_stop_tol),
            mesh=self.mesh,
            return_iter_split=True,
            select=self.select,
            compact_tasks=self.compact_tasks,
        )

    def _infer(self, task):
        if not self.args.use_softmax_feature:
            raise ValueError(
                "EM-Dirichlet requires features on the unit simplex "
                "(softmax features)."
            )
        self._log(
            f" ==> Executing {'HARD ' if self.hard else ''}EM-DIRICHLET "
            f"with LAMBDA = {self.lambd} and T = {self.args.T}"
        )
        n_query, n_class = task["x_q"].shape[1], task["x_q"].shape[2]
        cf_engaged = (self.compact_first and self.compact
                      and compaction_geometry(n_query, n_class)[1])
        out = self._run_infer(task["x_q"], self.compact_first)
        # the guard may only fire inside a blocking run_task (the flag is
        # set there): its duplicate solve + device_sync would otherwise be
        # billed to the deferred pipeline's timed tail, and inside the
        # fused program's jit trace the prediction comparison would be a
        # tracer-bool error. Deferred/fused evaluations get their periodic
        # re-checks by the evaluator routing every M-th batch through
        # blocking run_task (request_guard_check + guard_recheck_batches).
        guard_allowed = getattr(self, "_guard_allowed", False)
        guard_due = cf_engaged and self._cf_guard_auto and guard_allowed and (
            self._cf_guard_pending
            or self._cf_force_guard
            or (self._cf_recheck > 0
                and self._cf_batches_since_check >= self._cf_recheck)
        )
        if cf_engaged and not guard_due:
            self._cf_batches_since_check += 1
        if guard_due:
            # guard: iteration-1 compaction is the one shortcut whose
            # deviation is undetectable post hoc (the module docstring
            # explains why), so the first batch — and, with
            # ``compact_first_recheck`` > 0, every M-th batch after it — is
            # re-solved with the exact first iteration and the predictions
            # compared. One extra batch per check, amortized across the
            # evaluation. The duplicate solve is verification, not method
            # cost: it is timed here and excluded from run_task's honest
            # timestamps (methods/base.py).
            import time as _time

            from ...ops.common import device_sync

            device_sync(out[0])          # fast solve fully accounted first
            t_guard = _time.perf_counter()
            exact = self._run_infer(task["x_q"], False)
            same = bool(jnp.array_equal(jnp.argmax(out[0], axis=-1),
                                        jnp.argmax(exact[0], axis=-1)))
            self._untimed_overhead_s = _time.perf_counter() - t_guard
            first_check = self._cf_guard_pending
            self._cf_guard_pending = False
            self._cf_force_guard = False
            self._cf_batches_since_check = 0
            which = ("first-batch" if first_check
                     else f"periodic (every {self._cf_recheck} batches)")
            if same:
                self._log(
                    f"compact_first_iter: {which} predictions match the "
                    "exact first iteration; keeping the fast path"
                )
            else:
                msg = (
                    "compact_first_iter deviated from the exact first "
                    f"iteration on a {which} guard check (flat features?); "
                    "falling back to the exact path for this evaluation"
                )
                if self.logger is not None:
                    self.logger.warning(msg)
                else:
                    import warnings

                    warnings.warn(msg)
                self.compact_first = False
                # a cached fused program was traced with compact_first=True
                # — drop it so the next fused dispatch re-traces on the
                # exact path
                self._fused_zs = None
                out = exact
        self._check_compaction(out[3], n_query, n_class)
        return out[:3]

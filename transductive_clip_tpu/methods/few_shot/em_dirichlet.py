"""Few-shot EM-Dirichlet (soft and hard variants).

Same Dirichlet EM as the zero-shot method, but the support one-hot labels
contribute fixed statistics to the alpha update and accuracy is a direct
argmax (reference: src/methods/few_shot/em_dirichlet.py and
hard_em_dirichlet.py). lambda = int(K / k_eff) * n_query
(reference: few_shot/em_dirichlet.py:14).

TPU optimizations (results preserved; see tests/test_compaction.py):

* cluster compaction — from the second EM iteration on, the query soft
  assignments typically underflow to exact zeros outside ~n_query classes,
  so y_cst of every other class row reduces to the constant pure-support
  statistics supp/y_s_sum. The reference re-solves ALL K rows every
  iteration (few_shot/em_dirichlet.py:195-201 — unlike the zero-shot
  variant it has no empty-cluster guard, the support mass keeps every
  denominator positive), sending each zero-query-mass row to the
  pure-support fixed point of its row. The compact path reproduces that
  limit exactly: ``alpha_base`` — the pure-support fixed point, solved ONCE
  full-width right after iteration 1, warm-started from iteration 1's
  alpha exactly like the reference's iteration-2 solve — is substituted
  for every zero-mass row (selected or not), while only the top-C rows by
  query mass (C = n_query + margin) run the per-iteration solver. Rows
  whose query mass later drains to zero transition to ``alpha_base`` the
  moment they leave the populated set (the in-loop step tracks the
  previously-selected rows for this). A post-run sparsity check warns if
  more than C clusters carried mass. One documented limit: at shots=1 the
  single-sample Dirichlet MLE diverges, so the reference's drained rows
  have no fixed point — they creep toward infinite concentration by one
  capped inner-solver budget per outer iteration. ``alpha_base`` applies
  exactly one solve's worth of that creep; predictions are unaffected (the
  creep only further suppresses already-suppressed absent classes;
  equality verified in tests/test_compaction.py) but the recorded
  criterion trace excludes the reference's repeated-creep contribution in
  that degenerate case. For shots >= 2 the fixed point is finite and the
  criterion trace matches the full path to solver-stop noise. At the Table-2 ImageNet protocol this
  removes ~92% of the per-iteration solver work (set
  ``compact_clusters: False`` for the guaranteed-exact path).
* two-tier solve width: gated exactly on the per-task populated-cluster
  count, the per-iteration solve drops from n_query+margin rows to 32 once
  assignments concentrate (<= k_eff clusters at the protocol) — bit-exact
  because zero-mass rows are frozen inside the solver and take
  ``alpha_base`` from the substitution either way
  (tests/test_compaction.py::test_fs_fast_tier*).
* outer-loop early stopping gated on the per-task max relative alpha change.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ...ops.common import EPS, constrainer, get_one_hot
from ...ops.dirichlet import (
    dirichlet_logits_cache,
    update_alpha,
    update_logits_cache_rows,
)
from ...ops.precision import f32_einsum
from ..base import FewShotMethod

_COMPACT_MARGIN = 16
# fast-tier row count for the two-tier compact solve (see the zero-shot
# module): at the protocol only <= k_eff clusters ever carry query mass, so
# once assignments concentrate the solve runs on this many rows instead of
# n_query+margin — gated EXACTLY on the populated count
_COMPACT_FAST = 32


@partial(jax.jit, static_argnames=("n_iter", "iter_mm", "n_class", "hard",
                                   "solver", "early_stop", "compact", "mesh",
                                   "return_n_iter", "select"))
def em_dirichlet_fs_infer(support, query, y_s, lambd,
                          n_iter: int, iter_mm: int, n_class: int, hard: bool,
                          solver: str = "mm", early_stop: bool = True,
                          early_stop_tol: float = 1e-6, compact: bool = True,
                          mesh=None, return_n_iter: bool = False,
                          select: str = "topk"):
    """support/query: [N, s, K] / [N, n, K] softmax features; y_s: [N, s].

    ``mesh``: optional (dp, tp) mesh — tasks shard over dp, alpha's trailing
    feature axis over tp (same layout as the zero-shot path).
    """
    con = constrainer(mesh)
    n_task, n_query, _ = query.shape
    support = con(support, "dp", None, None)
    query = con(query, "dp", None, None)
    log_s = jnp.log(support + EPS)
    log_q = jnp.log(query + EPS)
    y_s_one_hot = get_one_hot(y_s, n_class)                       # [N, s, K]
    y_s_sum = jnp.sum(y_s_one_hot, axis=1)                        # [N, K]
    # support statistics are constant across iterations
    supp_stat = con(f32_einsum("tsk,tsd->tkd", y_s_one_hot, log_s),
                    "dp", None, "tp")

    u0 = query
    alpha0 = con(jnp.ones((n_task, n_class, n_class), jnp.float32),
                 "dp", None, "tp")

    n_compact = min(n_class, n_query + _COMPACT_MARGIN)
    use_compact = compact and n_class > 2 * n_compact

    def finish_step(u, l12, l3):
        # v (class-proportion dual) is a pure function of the incoming u
        v = jnp.log(jnp.mean(u, axis=1) + EPS) + 1.0
        logits = l12[:, None, :] + l3
        u = jax.nn.softmax(logits + lambd * v[:, None, :] / n_query, axis=2)
        if hard:
            u = get_one_hot(jnp.argmax(u, axis=-1), n_class)
        return con(u, "dp", None, None)

    def step_full(u, alpha_old):
        u_sum = jnp.sum(u, axis=1)
        query_stat = f32_einsum("tnk,tnd->tkd", u, log_q)
        y_cst = (supp_stat + query_stat) / (y_s_sum + u_sum)[..., None]
        y_cst = con(y_cst, "dp", None, "tp")
        alpha = update_alpha(alpha_old, y_cst, iter_mm=iter_mm, solver=solver,
                             mesh=mesh)
        alpha = con(alpha, "dp", None, "tp")
        l12, l3 = dirichlet_logits_cache(log_q, alpha)
        u = finish_step(u, l12, l3)
        return u, alpha, l12, l3

    n_fast = min(_COMPACT_FAST, n_compact)
    # resolve the solver family ONCE at the widest (n_compact) width so the
    # fast/wide lax.cond below can never mix two solver families
    # (ops.dirichlet.resolve_solver_for_width)
    from ...ops.dirichlet import resolve_solver_for_width

    solver_c = resolve_solver_for_width(solver, n_compact)

    def compact_rows(u, alpha_old, alpha_base):
        """Select the top-C rows by query mass, solve the populated ones,
        and substitute the pure-support fixed point for zero-mass rows.

        Returns (idx, alpha_c, alpha_c_old, pop): the selected row indices,
        their new values, their previous values (for criterion accounting),
        and the batch-max populated-cluster count (for the sparsity
        warning — an iteration whose populated count exceeds the selection
        width is where compaction can deviate).
        """
        u_sum = jnp.sum(u, axis=1)                                # [N, K]
        # 'rank' = sort-free covering selection, self-guarded: a lax.cond
        # falls back to top_k in-trace whenever more than n_compact rows
        # carry query mass (e.g. an early soft-EM iteration whose softmax
        # has not underflowed yet — rank would keep the lowest-INDEXED
        # rows there). thresh=0 matches this module's populated predicate
        # (u_sum > 0 / mass > 0 below); the fast-tier gate only fires when
        # all populated rows fit in n_fast, which populated-first ordering
        # preserves (ops.common.select_rows_covering).
        from ...ops.common import select_rows_covering

        mass, idx = select_rows_covering(u_sum, n_compact, 0.0, select)
        u_c = jnp.take_along_axis(u, idx[:, None, :], axis=2)
        query_stat_c = f32_einsum("tnc,tnd->tcd", u_c, log_q)
        supp_c = jnp.take_along_axis(supp_stat, idx[..., None], axis=1)
        y_s_sum_c = jnp.take_along_axis(y_s_sum, idx, axis=1)
        y_c = (supp_c + query_stat_c) / (y_s_sum_c + mass)[..., None]
        y_c = con(y_c, "dp", None, "tp")
        alpha_c_old = jnp.take_along_axis(alpha_old, idx[..., None], axis=1)
        row_mask = mass > 0                                       # [N, C]
        populated = jnp.sum(u_sum > 0, axis=-1)                  # [N]

        # The solver freezes zero-mass rows (and excludes them from its
        # convergence criterion) so the two-tier gate below is bit-exact:
        # the gathers/einsums always run at n_compact width (fixed
        # contraction width -> tier-independent bits), and only the solve —
        # the dominant cost — drops to the first n_fast (top-mass) rows
        # when every task's populated count fits.
        def solve(a_old, y, m):
            return update_alpha(a_old, y, iter_mm=iter_mm, solver=solver_c,
                                mesh=mesh, row_mask=m)

        if n_fast >= n_compact:
            alpha_c = solve(alpha_c_old, y_c, row_mask)
        else:
            def fast(ops):
                a_old, y, m = ops
                a = solve(a_old[:, :n_fast], y[:, :n_fast], m[:, :n_fast])
                return jnp.concatenate([a, a_old[:, n_fast:]], axis=1)

            alpha_c = jax.lax.cond(
                jnp.max(populated) <= n_fast, fast,
                lambda ops: solve(*ops), (alpha_c_old, y_c, row_mask),
            )
        # zero-query-mass rows: y_c reduced to the pure support statistics,
        # whose fixed point is alpha_base — substituting it reproduces the
        # reference's re-solve of EVERY row each iteration
        # (few_shot/em_dirichlet.py:195-201) without spending solver work
        base_c = jnp.take_along_axis(alpha_base, idx[..., None], axis=1)
        alpha_c = jnp.where(row_mask[..., None], alpha_c, base_c)
        return idx, alpha_c, alpha_c_old, jnp.max(populated)

    def step_compact(u, alpha_old, l12, l3, prev_idx, alpha_base):
        idx, alpha_c, alpha_c_old, pop = compact_rows(u, alpha_old,
                                                      alpha_base)
        # rows selected last iteration but not now take alpha_base: in the
        # covering regime they carry zero query mass and the reference's
        # re-solve sends them exactly there; in the over-capacity corner
        # (more populated rows than slots — reported by the pop_max
        # sparsity warning) the displaced rows are the SMALLEST-mass ones,
        # whose reference re-solve y is within O(mass) of the pure support
        # statistics, so alpha_base is the closest cheap stand-in there
        # too (measured ~1e-4 vs ~3e-2 for keeping the stale alpha). Rows
        # never selected already hold alpha_base by induction
        # (transition_step).
        base_prev = jnp.take_along_axis(alpha_base, prev_idx[..., None],
                                        axis=1)
        a_prev = jnp.take_along_axis(alpha_old, prev_idx[..., None], axis=1)
        notin = jnp.all(prev_idx[..., None] != idx[:, None, :], axis=-1)
        tidx = jnp.arange(n_task)[:, None]
        # transitions first, current rows second: rows in both sets take
        # alpha_c (chained .at[].set applies in order)
        alpha = alpha_old.at[tidx, prev_idx].set(base_prev)
        alpha = alpha.at[tidx, idx].set(alpha_c)
        alpha = con(alpha, "dp", None, "tp")
        # criterion ingredients from the changed rows only: the selected
        # rows plus the deselected (transitioned) rows — alpha changed
        # nowhere else. Keeping the reductions compact also frees XLA to
        # scatter into alpha in place (a full-width criterion would keep
        # alpha_old alive and force a [N, K, K] copy). notin masks the
        # prev-rows also selected now, which alpha_c already accounts for.
        trans = jnp.where(notin[..., None], base_prev - a_prev, 0.0)
        diff_ss = (jnp.sum((alpha_c - alpha_c_old) ** 2, axis=(1, 2))
                   + jnp.sum(trans * trans, axis=(1, 2)))
        # elementwise difference BEFORE the reduction: unchanged rows are
        # exact zeros, so the sum is bit-identical for any solve-tier width
        delta_ss = (jnp.sum(alpha_c ** 2 - alpha_c_old ** 2, axis=(1, 2))
                    + jnp.sum(jnp.where(notin[..., None],
                                        base_prev ** 2 - a_prev ** 2, 0.0),
                              axis=(1, 2)))
        # one combined incremental cache update: transitioned rows take the
        # base values, selected rows their new alpha (the notin mask kills
        # the duplicate prev-entries of rows also selected now)
        idx_all = jnp.concatenate([prev_idx, idx], axis=1)
        alpha_all = jnp.concatenate([base_prev, alpha_c], axis=1)
        mask_all = jnp.concatenate(
            [notin, jnp.ones(idx.shape, bool)], axis=1)
        l12, l3 = update_logits_cache_rows(l12, l3, idx_all, alpha_all,
                                           log_q, row_mask=mask_all)
        l3 = con(l3, "dp", None, None)
        u = finish_step(u, l12, l3)
        return u, alpha, l12, l3, idx, diff_ss, delta_ss, pop

    def crit_fn(alpha_old, alpha):
        # (mean, max): mean recorded (reference parity), max gates early
        # stop. Axis reductions, NOT reshape(n_task, -1) + linalg.norm:
        # merging the tp-sharded class axis into a flat axis makes GSPMD
        # all-gather the full per-task [K, K] alpha onto every device
        # (see the zero-shot module's _criterion and
        # tests/test_parallel.py::test_hlo_sharding_*).
        diff = jnp.sqrt(jnp.sum((alpha_old - alpha) ** 2, axis=(1, 2)))
        denom = jnp.sqrt(jnp.sum(alpha_old ** 2, axis=(1, 2)))
        rel = diff / denom
        return jnp.mean(rel), jnp.max(rel)

    def crit_from_ss(diff_ss, ss_before):
        rel = jnp.sqrt(diff_ss) / jnp.sqrt(ss_before)
        return jnp.mean(rel), jnp.max(rel)

    # iteration 1 always solves all K rows (every row's y blends support and
    # dense-feature query statistics — reference: few_shot/em_dirichlet.py
    # u init = deepcopy(query), so u_sum > 0 everywhere at iteration 1)
    u, alpha, l12, l3 = step_full(u0, alpha0)
    first_crit, first_max = crit_fn(alpha0, alpha)
    crits0 = jnp.full((n_iter,), first_crit, jnp.float32)
    tidx = jnp.arange(n_task)[:, None]
    idx_dummy = jnp.tile(jnp.arange(n_compact, dtype=jnp.int32)[None, :],
                         (n_task, 1))

    if use_compact and n_iter > 1:
        # the pure-support fixed point: where the reference's per-iteration
        # re-solve sends every zero-query-mass row once u underflows (y
        # reduces to supp/y_s_sum). Solved once, full width, warm-started
        # from iteration 1's alpha exactly like the reference's iteration-2
        # solve (reference: few_shot/em_dirichlet.py:195-201).
        y_pure = con(supp_stat / jnp.maximum(y_s_sum, EPS)[..., None],
                     "dp", None, "tp")
        alpha_base = update_alpha(alpha, y_pure, iter_mm=iter_mm,
                                  solver=solver, mesh=mesh)
        alpha_base = con(alpha_base, "dp", None, "tp")
    else:
        # n_iter == 1 (no compact iteration ever runs) or compact off:
        # a placeholder keeps the (never-executed) loop body traceable
        # without paying the full-width solve
        alpha_base = alpha

    def transition_step(ops):
        """Iteration 2, peeled out of the loop: the first compact iteration,
        where EVERY zero-mass row (typically K - k_eff of them) moves to the
        pure-support fixed point — full-width bookkeeping, paid once."""
        u, alpha1 = ops
        idx, alpha_c, _, pop = compact_rows(u, alpha1, alpha_base)
        alpha2 = alpha_base.at[tidx, idx].set(alpha_c)
        alpha2 = con(alpha2, "dp", None, "tp")
        crit, crit_max = crit_fn(alpha1, alpha2)
        l12, l3 = dirichlet_logits_cache(log_q, alpha2)
        l3 = con(l3, "dp", None, None)
        u = finish_step(u, l12, l3)
        ss = jnp.sum(alpha2 ** 2, axis=(1, 2))
        crits = jnp.where(jnp.arange(n_iter) >= 1, crit, crits0)
        return (u, alpha2, l12, l3, ss, idx, jnp.array(2, jnp.int32),
                crits, crit_max, pop)

    pop0 = jnp.array(0, jnp.int32)
    if use_compact and n_iter > 1:
        def skip2(ops):
            # early stop fired after iteration 1 (first_max < tol): carry
            # everything through unchanged; the while_loop below won't run
            u, alpha1 = ops
            ss = jnp.sum(alpha1 ** 2, axis=(1, 2))
            return (u, alpha1, l12, l3, ss, idx_dummy,
                    jnp.array(1, jnp.int32), crits0, first_max, pop0)

        if early_stop:
            carry0 = jax.lax.cond(first_max >= early_stop_tol,
                                  transition_step, skip2, (u, alpha))
        else:
            carry0 = transition_step((u, alpha))
    else:
        ss = (jnp.sum(alpha ** 2, axis=(1, 2))
              if use_compact else jnp.zeros((n_task,), jnp.float32))
        carry0 = (u, alpha, l12, l3, ss, idx_dummy,
                  jnp.array(1, jnp.int32), crits0, first_max, pop0)

    def body(carry):
        u, alpha_old, l12, l3, ss, prev_idx, it, crits, _, pop_max = carry
        if use_compact:
            u, alpha, l12, l3, idx, diff_ss, delta_ss, pop = step_compact(
                u, alpha_old, l12, l3, prev_idx, alpha_base)
            crit, crit_max = crit_from_ss(diff_ss, ss)
            ss = ss + delta_ss
            prev_idx = idx
            pop_max = jnp.maximum(pop_max, pop)
        else:
            u, alpha, l12, l3 = step_full(u, alpha_old)
            crit, crit_max = crit_fn(alpha_old, alpha)
        crits = jnp.where(jnp.arange(n_iter) >= it, crit, crits)
        return (u, alpha, l12, l3, ss, prev_idx, it + 1, crits, crit_max,
                pop_max)

    def cond(carry):
        *_, it, _, crit_max, _pop = carry
        not_done = it < n_iter
        if not early_stop:
            return not_done
        return jnp.logical_and(not_done, crit_max >= early_stop_tol)

    u, _, _, _, _, _, it, criterions, _, pop_max = jax.lax.while_loop(
        cond, body, carry0,
    )
    if return_n_iter:
        # executed outer-iteration count (makes the synthesized
        # reference-semantics timing metric exact under early stopping) and
        # the max populated-cluster count any compact iteration consumed
        # (feeds the sparsity warning — a FINAL-u check would miss an
        # intermediate iteration whose populated count overflowed the
        # selection width)
        return u, criterions, it, pop_max
    return u, criterions


class EM_DIRICHLET(FewShotMethod):
    hard = False

    def __init__(self, model=None, device=None, log_file=None, args=None):
        super().__init__(model, device, log_file, args)
        self.lambd = float(
            int(args.num_classes_test / args.k_eff) * args.n_query
        )
        self.n_iter = int(args.iter)
        self.iter_mm = int(args.iter_mm)
        solver = str(args.get("dirichlet_solver", "auto"))
        if solver == "auto":
            # XLA Newton-Minka (see the zero-shot module): 6.4 -> 2.0
            # ms/task at the few-shot ImageNet protocol, every backend
            solver = "minka"
        self.solver = solver
        self.early_stop = bool(args.get("early_stop", True))
        self.early_stop_tol = float(args.get("early_stop_tol", 1e-6))
        self.compact = bool(args.get("compact_clusters", True))
        from ..base import compact_select_impl

        self.select = compact_select_impl(args)

    def _check_compaction(self, pop_max, n_query, n_class):
        if self.compact and n_class > 2 * (n_query + _COMPACT_MARGIN):
            from ..base import PendingCompactionCheck

            # deferred: run_task fetches the scalar with its one combined
            # accuracy transfer instead of paying a round trip here.
            # pop_max is the max populated count over every compact
            # iteration (not just the final u), so an intermediate
            # over-capacity iteration cannot pass silently.
            self._pending_check = PendingCompactionCheck(
                populated=pop_max, n_compact=n_query + _COMPACT_MARGIN,
                logger=self.logger,
            )

    def _infer(self, task):
        if not self.args.use_softmax_feature:
            raise ValueError(
                "EM-Dirichlet requires features on the unit simplex "
                "(softmax features)."
            )
        self._log(
            f" ==> Executing few-shot {'HARD ' if self.hard else ''}EM-DIRICHLET "
            f"with LAMBDA = {self.lambd}"
        )
        u, criterions, n_exec, pop_max = em_dirichlet_fs_infer(
            task["x_s"],
            task["x_q"],
            task["y_s"],
            jnp.float32(self.lambd),
            n_iter=self.n_iter,
            iter_mm=self.iter_mm,
            n_class=int(self.args.num_classes_test),
            hard=self.hard,
            solver=self.solver,
            early_stop=self.early_stop,
            early_stop_tol=jnp.float32(self.early_stop_tol),
            compact=self.compact,
            mesh=self.mesh,
            return_n_iter=True,
            select=self.select,
        )
        self._check_compaction(pop_max, task["x_q"].shape[1],
                               task["x_q"].shape[2])
        return u, criterions, n_exec

"""TIM-GD and alpha-TIM: transductive information maximization by gradient
ascent on class weights (reference: src/methods/few_shot/tim.py; NeurIPS 2020
"TIM" and NeurIPS 2021 "Realistic evaluation of transductive few-shot").

The only gradient-based method in the suite. TPU design: the Adam loop is a
``lax.scan`` of jitted steps (optax.adam matches torch.optim.Adam defaults);
the loss is differentiated with ``jax.value_and_grad``. As in the reference,
the reported predictions come from the logits computed *before* the final
optimizer step (reference: tim.py:161-189 keeps ``logits_q`` from the last
loop body).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax

from ...ops.common import TIM_EPS as _EPS, constrainer, get_one_hot
from ..base import FewShotMethod
from .paddle import support_class_means
from ...ops.precision import f32_einsum


def _tim_logits(weights, samples, temp, precision: str = "highest",
                x2=None):
    """temp * (x.w - ||w||^2/2 - ||x||^2/2) (reference: tim.py:99-113).

    ``precision='highest'`` (default) reproduces fp32 matmuls like the
    reference; ``'default'`` lets the MXU run bf16 operands with fp32
    accumulation — the Adam loop is a 1000-step contraction-bound scan, so
    this is the whole method's throughput knob (``tim_matmul_precision``
    config; accuracy equivalence vs the reference is tested).

    ``x2``: optional precomputed 0.5*||x||^2 [N, n]. The samples are
    loop-invariant across the Adam scan, so callers hoist this — at the
    ImageNet protocol the [N, 4000, d] squared-support tensor is ~400 MB of
    HBM traffic per step otherwise.
    """
    if precision == "highest":
        xw = f32_einsum("tnd,tkd->tnk", samples, weights)
    else:
        xw = jnp.einsum("tnd,tkd->tnk", samples, weights)
    w2 = 0.5 * jnp.sum(weights * weights, axis=-1)[:, None, :]
    if x2 is None:
        x2 = 0.5 * jnp.sum(samples * samples, axis=-1)
    return temp * (xw - w2 - x2[:, :, None])


def _cross_entropy(y_one_hot, probs_s, kind: str, alpha_value):
    if kind == "Shannon":
        return -jnp.sum(
            y_one_hot * jnp.log(probs_s + _EPS), axis=2
        ).mean(axis=1).sum(axis=0)
    # Alpha (Tsallis-style) cross entropy
    ce = jnp.power(y_one_hot, alpha_value) * jnp.power(probs_s + _EPS, 1.0 - alpha_value)
    return ((1.0 - jnp.sum(ce, axis=2)) / (alpha_value - 1.0)).mean(axis=1).sum(axis=0)


def _cross_entropy_gather(y_s, logits_s, kind: str, alpha_value):
    """Cross entropy straight from support logits via a label gather.

    For (exactly) one-hot labels the reference's sum over classes reduces to
    the label column: Shannon CE = -log p_label; alpha CE =
    (1 - p_label^(1-alpha)) / (alpha-1) — identical equations, but the
    [N, s, K] one-hot, softmax, and power tensors never materialize. At the
    ImageNet protocol (support 4000 x K=1000) that removes ~5 GB of
    per-step HBM residency (``tim_ce_impl: 'onehot'`` keeps the
    reference-shaped computation).
    """
    import math

    lse = jax.nn.logsumexp(logits_s, axis=-1)                    # [N, s]
    l_lab = jnp.take_along_axis(
        logits_s, y_s[..., None], axis=-1
    )[..., 0]
    # log(p_label + eps) exactly, matching the reference's epsilon semantics
    # (log(p+eps) caps the loss at -log(eps) for saturated samples instead
    # of overflowing exp((alpha-1)*|log p|) for deeply-underflowed p)
    log_p = jnp.logaddexp(l_lab - lse, math.log(_EPS))
    if kind == "Shannon":
        return (-log_p).mean(axis=1).sum(axis=0)
    return ((1.0 - jnp.exp((1.0 - alpha_value) * log_p))
            / (alpha_value - 1.0)).mean(axis=1).sum(axis=0)


def _marginal_entropy(q_probs, kind: str, alpha_value):
    marg = jnp.mean(q_probs, axis=1)
    if kind == "Shannon":
        return -jnp.sum(marg * jnp.log(marg + _EPS), axis=1).sum(axis=0)
    return ((1.0 - jnp.sum(jnp.power(marg, alpha_value), axis=1))
            / (alpha_value - 1.0)).sum(axis=0)


def _conditional_entropy(q_probs, kind: str, alpha_value):
    if kind == "Shannon":
        return -jnp.sum(
            q_probs * jnp.log(q_probs + _EPS), axis=2
        ).mean(axis=1).sum(axis=0)
    return ((1.0 - jnp.sum(jnp.power(q_probs + _EPS, alpha_value), axis=2))
            / (alpha_value - 1.0)).mean(axis=1).sum(axis=0)


def _ce_grad_coef(y_s, logits_s, kind: str, alpha_value):
    """Per-sample coefficient of the CE gradient: dCE/dlogits =
    coef[:, :, None] * (p - onehot(y)) / n_support. Differentiates the
    epsilon-capped log used by ``_cross_entropy_gather`` exactly."""
    import math

    lse = jax.nn.logsumexp(logits_s, axis=-1)
    l_lab = jnp.take_along_axis(logits_s, y_s[..., None], axis=-1)[..., 0]
    z = l_lab - lse
    log_p = jnp.logaddexp(z, math.log(_EPS))     # log(p_label + eps)
    sigma = jnp.exp(z - log_p)                   # p_label / (p_label + eps)
    if kind == "Shannon":
        return sigma, lse
    return -jnp.exp((1.0 - alpha_value) * log_p) * sigma, lse


def _query_grad(p_q, entropies, alpha_value, loss_weights):
    """d(-w1*H_marg + w2*H_cond)/dlogits_q through the softmax jacobian."""
    n_query = p_q.shape[1]
    marg = jnp.mean(p_q, axis=1)
    if entropies[1] == "Shannon":
        a = -(jnp.log(marg + _EPS) + marg / (marg + _EPS))
    else:
        a = (-alpha_value / (alpha_value - 1.0)) * jnp.power(
            marg, alpha_value - 1.0
        )
    pa = jnp.einsum("tnk,tk->tn", p_q, a)
    g_marg = p_q * (a[:, None, :] - pa[..., None]) / n_query

    if entropies[2] == "Shannon":
        b = -(jnp.log(p_q + _EPS) + p_q / (p_q + _EPS)) / n_query
    else:
        b = (-alpha_value / ((alpha_value - 1.0) * n_query)) * jnp.power(
            p_q + _EPS, alpha_value - 1.0
        )
    g_cond = p_q * (b - jnp.sum(b * p_q, axis=2, keepdims=True))
    return -loss_weights[1] * g_marg + loss_weights[2] * g_cond


def _make_grad_fn(grad_impl, support, query, y_s, x2_s, x2_q, temp,
                  alpha_value, loss_weights, entropies, n_class: int,
                  precision: str, ce_impl: str, con, opt_dtype: str):
    """Build the per-step gradient function over the given task buffers.

    Factored out of ``tim_infer`` so the early-stop phase 2 can rebuild the
    same step over a gathered narrow straggler buffer (every tensor here is
    task-leading). The impl-specific one-time preparation (support sort,
    Pallas layout/cast, one-hot) happens HERE — once per phase, outside the
    Adam loop, preserving the hoisting the docstrings below rely on.
    """
    y_one_hot = get_one_hot(y_s, n_class) if ce_impl == "onehot" else None

    def loss_fn(weights):
        # the [N, s, K] / [N, n, K] logits (and, through autodiff, their
        # cotangents — the dominant per-step residuals) stay sharded on the
        # class axis with the weights
        logits_s = con(_tim_logits(weights, support, temp, precision,
                                   x2=x2_s),
                       "dp", None, "tp")
        logits_q = con(_tim_logits(weights, query, temp, precision,
                                   x2=x2_q),
                       "dp", None, "tp")
        q_probs = jax.nn.softmax(logits_q, axis=2)
        if ce_impl == "onehot":
            probs_s = jax.nn.softmax(logits_s, axis=2)
            ce = _cross_entropy(y_one_hot, probs_s, entropies[0], alpha_value)
        else:
            ce = _cross_entropy_gather(y_s, logits_s, entropies[0], alpha_value)
        q_ent = _marginal_entropy(q_probs, entropies[1], alpha_value)
        q_cond_ent = _conditional_entropy(q_probs, entropies[2], alpha_value)
        loss = (
            loss_weights[0] * ce
            - (loss_weights[1] * q_ent - loss_weights[2] * q_cond_ent)
        )
        return loss, logits_q

    if grad_impl == "pallas":
        from ...ops.pallas_tim import (
            pallas_tim_support_grad_prepared,
            prepare_support,
        )

        contract = (f32_einsum if precision == "highest" else jnp.einsum)
        ce_scale = loss_weights[0] / support.shape[1]
        n_support, d_feat = support.shape[1], support.shape[2]
        # layout/cast the loop-invariant support ONCE, outside the scan —
        # not per Adam step inside grad_fn (~400 MB re-pad+cast per step
        # at the ImageNet protocol otherwise, if XLA does not hoist it)
        x_prep, y_prep = prepare_support(support, y_s, precision)

        def grad_fn(weights):
            gs_x, col = pallas_tim_support_grad_prepared(
                x_prep, y_prep, weights, temp, ce_scale, alpha_value,
                n_support, d_feat, ce_kind=entropies[0], precision=precision,
            )
            logits_q = _tim_logits(weights, query, temp, precision,
                                   x2=x2_q)
            g_q = _query_grad(
                jax.nn.softmax(logits_q, axis=2), entropies, alpha_value,
                loss_weights,
            )
            gq_x = contract("tnk,tnd->tkd", g_q, query)
            col = col + g_q.sum(axis=1)
            grads = temp * (gs_x + gq_x - col[..., None] * weights)
            return (None, logits_q), grads
    elif grad_impl == "manual":
        n_support = support.shape[1]
        if n_support % n_class != 0:
            raise ValueError(
                "grad_impl='manual' needs uniform per-class support "
                f"(n_support={n_support} not divisible by K={n_class})"
            )
        shots = n_support // n_class
        # sort support by label once so the one-hot CE term reduces to a
        # [K, shots] segment contraction instead of a scatter
        order = jnp.argsort(y_s, axis=1)
        y_sorted = jnp.take_along_axis(y_s, order, axis=1)
        x_sorted = jnp.take_along_axis(support, order[..., None], axis=1)
        x2_sorted = jnp.take_along_axis(x2_s, order, axis=1)
        contract = (f32_einsum if precision == "highest" else jnp.einsum)

        def grad_fn(weights):
            # support CE: G_s = w0 * coef * (p_s - onehot) / n_support
            logits_s = _tim_logits(weights, x_sorted, temp, precision,
                                   x2=x2_sorted)
            coef, lse = _ce_grad_coef(
                y_sorted, logits_s, entropies[0], alpha_value
            )
            scale = loss_weights[0] / n_support
            g_plain = (scale * coef)[..., None] * jnp.exp(
                logits_s - lse[..., None]
            )
            coef_r = (scale * coef).reshape(-1, n_class, shots)
            x_r = x_sorted.reshape(-1, n_class, shots, x_sorted.shape[-1])
            gs_x = contract("tnk,tnd->tkd", g_plain, x_sorted)
            gs_x -= contract("tks,tksd->tkd", coef_r, x_r)
            col = g_plain.sum(axis=1) - coef_r.sum(axis=2)

            # query entropy terms
            logits_q = _tim_logits(weights, query, temp, precision,
                                   x2=x2_q)
            g_q = _query_grad(
                jax.nn.softmax(logits_q, axis=2), entropies, alpha_value,
                loss_weights,
            )
            gq_x = contract("tnk,tnd->tkd", g_q, query)
            col = col + g_q.sum(axis=1)
            grads = temp * (gs_x + gq_x - col[..., None] * weights)
            return (None, logits_q), grads
    else:
        _grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        def grad_fn(weights):
            (_, logits_q), grads = _grad_fn(weights)
            return (None, logits_q), grads

    return grad_fn


@partial(jax.jit, static_argnames=("n_iter", "n_class", "entropies", "lr",
                                   "precision", "ce_impl", "mesh",
                                   "grad_impl", "opt_dtype", "early_stop",
                                   "es_patience", "compact_tasks"))
def tim_infer(support, query, y_s, temp, alpha_value, loss_weights,
              n_iter: int, n_class: int, entropies: tuple, lr: float,
              precision: str = "highest", ce_impl: str = "gather",
              mesh=None, grad_impl: str = "autodiff",
              opt_dtype: str = "float32", early_stop: bool = False,
              es_patience: int = 100, compact_tasks: int = 8):
    """Returns (u_q [N, n, K] from last-iteration logits, criterions [n_iter]);
    with ``early_stop``, a third element: executed-count split
    ``[total, full_width]`` (see ``resolve_exec_count``).

    ``early_stop`` (opt-in; the reference runs all ``n_iter`` Adam steps
    unconditionally, reference: tim.py:118-189): per-task
    **prediction-stability** stop. Adam with the reference's lr=1e-4 never
    converges in weight space — the weight-change criterion stays ~3e-3
    flat through all 1000 steps at the ImageNet protocol — but the query
    argmax predictions stop changing two orders of magnitude earlier
    (measured on-chip: predictions at step 125 already match step 1000 on
    every task, 100% agreement). A task freezes once its predictions have
    been unchanged for ``es_patience`` consecutive steps; once at most
    ``compact_tasks`` tasks remain active they are gathered into a narrow
    straggler buffer (same two-phase design as
    ``em_dirichlet_infer``'s task compaction) and only they keep stepping.
    Same update equations every step; frozen tasks report the logits they
    had at freeze time, so results can differ from the full schedule only
    if a task's predictions would have flipped after ``es_patience`` stable
    steps — equivalence is tested (tests/test_methods_few_shot.py) and the
    default (``tim_early_stop: False``) keeps the reference-exact schedule.
    Ignored under a mesh (the gather would break the dp layout).

    ``mesh``: optional (dp, tp) mesh — tasks shard over dp; the class
    weights' CLASS axis (and the Adam moments with it) shards over tp, so
    the per-chip optimizer state is N/dp * K/tp * d. Class-row sharding is
    the communication-optimal layout here: the logits contraction keeps d
    local (logits [N, n, K/tp] per device with no collective), the per-step
    autodiff residuals over the [N, n_class*shots, K] support logits shard
    with it, and the only collectives are the O(N*n) softmax row statistics
    psumming over ICI. (Feature-axis sharding — the round-3 layout — forced
    a per-Adam-step O(N*s*K) reduction instead; caught by
    tests/test_parallel.py::test_hlo_sharding_tim.) This is the
    memory-bound method of the suite; TP is how batches that exceed one
    chip's HBM run.

    ``grad_impl='manual'`` computes the loss gradient in closed form (the
    same equations autodiff evaluates: softmax jacobians of the three
    entropy terms chained into dlogits/dW = temp*(x_n - w_k)) in one fused
    pass — no saved residuals, no scatter in the gather-CE backward. It
    requires support with the protocol's uniform per-class counts (the
    few-shot sampler guarantees shots from every class, reference:
    sampler_few_shot.py:64-76); the method wrappers verify and fall back
    to autodiff otherwise. Equivalence vs autodiff is tested.
    """
    con = constrainer(mesh)

    def con_w(tree):
        return jax.tree.map(
            lambda t: con(t, "dp", "tp", None) if getattr(t, "ndim", 0) == 3
            else t,
            tree,
        )

    support = con(support, "dp", None, None)
    query = con(query, "dp", None, None)
    # loop-invariant sample norms, hoisted out of the Adam scan (see
    # _tim_logits)
    x2_s = 0.5 * jnp.sum(support * support, axis=-1)
    x2_q = 0.5 * jnp.sum(query * query, axis=-1)
    w0 = con_w(support_class_means(support, y_s, n_class))
    opt = optax.adam(lr)

    # opt_dtype='bfloat16' stores the Adam moments bf16 between steps
    # (halves the optimizer-state HBM stream — 400 -> 200 MB/step at the
    # ImageNet protocol); the update itself still computes in fp32. The
    # fp32 default is the reference-exact torch.optim.Adam state
    # (reference: tim.py:118-124); equivalence of the bf16 option is
    # tested (tests/test_methods_few_shot.py).
    def compress_state(s):
        if opt_dtype == "float32":
            return s
        return jax.tree.map(
            lambda t: t.astype(jnp.bfloat16)
            if getattr(t, "ndim", 0) == 3 else t, s,
        )

    def expand_state(s):
        if opt_dtype == "float32":
            return s
        return jax.tree.map(
            lambda t: t.astype(jnp.float32)
            if getattr(t, "ndim", 0) == 3 else t, s,
        )

    opt_state0 = compress_state(con_w(opt.init(w0)))

    if grad_impl == "pallas" and mesh is not None:
        grad_impl = "autodiff"     # sharded state: let GSPMD place the work
    if mesh is not None:
        early_stop = False         # gathers would break the dp layout

    def make_step(support_b, query_b, y_s_b, x2_s_b, x2_q_b):
        """One Adam step over the given task buffers (full batch in phase 1,
        the gathered straggler buffer in phase 2)."""
        grad_fn = _make_grad_fn(
            grad_impl, support_b, query_b, y_s_b, x2_s_b, x2_q_b, temp,
            alpha_value, loss_weights, entropies, n_class, precision,
            ce_impl, con, opt_dtype,
        )

        def step(weights, opt_state):
            (_, logits_q), grads = grad_fn(weights)
            updates, opt_state = opt.update(
                con_w(grads), expand_state(opt_state)
            )
            new_weights = con_w(optax.apply_updates(weights, updates))
            opt_state = compress_state(con_w(opt_state))
            # per-task weight change [N], matching the reference's recorded
            # criterion (reference: tim.py weight_diff = norm(dim=-1).mean(-1))
            crit = jnp.mean(
                jnp.linalg.norm(weights - new_weights, axis=-1), axis=-1
            )
            return new_weights, opt_state, logits_q, crit

        return step

    step_full = make_step(support, query, y_s, x2_s, x2_q)
    logits_q0 = _tim_logits(w0, query, temp, precision, x2=x2_q)

    if not early_stop:
        # reference-exact fixed schedule (the default): one scanned program
        def scan_step(carry, _):
            weights, opt_state, _ = carry
            weights, opt_state, logits_q, crit = step_full(weights, opt_state)
            return (weights, opt_state, logits_q), crit

        (_, _, logits_q), criterions = jax.lax.scan(
            scan_step, (w0, opt_state0, logits_q0), None, length=n_iter
        )
        return jax.nn.softmax(logits_q, axis=2), criterions

    n_task = query.shape[0]
    n_narrow = int(compact_tasks)
    use_tc = 0 < n_narrow < n_task
    patience = jnp.int32(es_patience)

    def make_body(step, t_idx=None):
        """While-loop body over whichever buffer ``step`` was built for.
        ``t_idx``: phase 2's straggler indices — criterion contributions
        scatter back into the full-batch trace (frozen tasks genuinely
        change by exactly 0)."""

        def body(carry):
            weights, opt_state, logits_q, preds_prev, stable, it, crits = carry
            weights, opt_state, logits_q, crit = step(weights, opt_state)
            # logits_q is the PRE-update logits of this step — exactly what
            # a stop after this step would report (reference semantics:
            # logits from the last executed loop body)
            preds = jnp.argmax(logits_q, axis=-1).astype(jnp.int32)
            same = jnp.all(preds == preds_prev, axis=-1)
            stable = jnp.where(same, stable + 1, 0)
            if t_idx is None:
                crit_all = crit
            else:
                crit_all = jnp.zeros((n_task,), crit.dtype).at[t_idx].set(crit)
            crits = jnp.where(jnp.arange(n_iter)[:, None] >= it,
                              crit_all[None, :], crits)
            return weights, opt_state, logits_q, preds, stable, it + 1, crits

        return body

    def cond_phase1(carry):
        stable, it = carry[4], carry[5]
        active = jnp.sum(stable < patience)
        busy = active > (n_narrow if use_tc else 0)
        return jnp.logical_and(it < n_iter, busy)

    preds0 = jnp.argmax(logits_q0, axis=-1).astype(jnp.int32)
    crits0 = jnp.zeros((n_iter, n_task), jnp.float32)
    weights, opt_state, logits_q, preds, stable, it, criterions = (
        jax.lax.while_loop(
            cond_phase1, make_body(step_full),
            (w0, opt_state0, logits_q0, preds0,
             jnp.zeros((n_task,), jnp.int32), jnp.array(0, jnp.int32),
             crits0),
        )
    )
    it_full = it

    if use_tc:
        # gather the least-stable tasks (covers every task with
        # stable < patience by the phase-1 exit condition; already-frozen
        # fillers keep stepping harmlessly — extra steps only move them
        # CLOSER to the reference's full schedule)
        _, t_idx = jax.lax.top_k(patience - stable, n_narrow)
        grab = lambda a: jnp.take(a, t_idx, axis=0)
        opt_state_n = jax.tree.map(
            lambda t: t[t_idx] if getattr(t, "ndim", 0) == 3 else t,
            opt_state,
        )
        step_narrow = make_step(
            grab(support), grab(query), grab(y_s), grab(x2_s), grab(x2_q)
        )

        def cond_phase2(carry):
            stable, it = carry[4], carry[5]
            return jnp.logical_and(it < n_iter,
                                   jnp.any(stable < patience))

        _, _, logits_q_n, _, _, it, criterions = jax.lax.while_loop(
            cond_phase2, make_body(step_narrow, t_idx=t_idx),
            (grab(weights), opt_state_n, grab(logits_q), grab(preds),
             grab(stable), it, criterions),
        )
        logits_q = logits_q.at[t_idx].set(logits_q_n)

    return (jax.nn.softmax(logits_q, axis=2), criterions,
            jnp.stack([it, it_full]))


def resolve_matmul_precision(cfg_value: str) -> str:
    """'auto' (the config default) resolves to bf16-operand matmuls
    ('default') on TPU and fp32 ('highest') elsewhere. The 1000-step Adam
    loop is contraction-bound, so this is the method's throughput knob
    (633 -> 204 ms/task at the ImageNet protocol); promotion to the TPU
    default is backed by protocol-scale parity evidence — K=1000,
    1000 iterations, 100% prediction agreement with fp32 autodiff and
    max |delta u| 6.4e-3 (measured on-chip; CPU-scale test:
    tests/test_methods_few_shot.py::test_tim_pallas_grad_protocol_scale_parity).
    Set tim_matmul_precision: highest to force reference-fp32 everywhere."""
    if cfg_value == "auto":
        return "default" if jax.default_backend() == "tpu" else "highest"
    return cfg_value


def resolve_opt_dtype(cfg_value: str) -> str:
    """Adam-moment storage dtype: 'float32' (default, reference-exact
    state) or 'bfloat16' (opt-in; halves optimizer-state HBM traffic)."""
    if cfg_value not in ("float32", "bfloat16"):
        raise ValueError(
            f"Unknown tim_opt_dtype {cfg_value!r}; choose 'float32' or "
            "'bfloat16'"
        )
    return cfg_value


def resolve_grad_impl(cfg_value, y_s, n_class, precision="highest"):
    """'auto' picks the fused Pallas support-gradient on TPU with bf16
    matmuls (any label layout) — the configuration where the step is
    HBM-bound and VMEM fusion pays. At fp32 the step is MXU-compute-bound
    and the kernel measures no faster than autodiff, so 'auto' keeps
    autodiff there. 'manual' (the Pallas kernel's XLA reference
    implementation) additionally requires the protocol's uniform per-class
    support layout."""
    if cfg_value in ("autodiff", "pallas"):
        return cfg_value
    if cfg_value == "auto":
        return ("pallas" if jax.default_backend() == "tpu"
                and precision != "highest" else "autodiff")
    if cfg_value != "manual":
        raise ValueError(
            f"Unknown tim_grad_impl {cfg_value!r}; choose from "
            "'auto', 'pallas', 'manual', 'autodiff'"
        )
    import numpy as np

    y = np.asarray(y_s)
    n_support = y.shape[-1]
    if n_support % n_class:
        return "autodiff"
    shots = n_support // n_class
    counts = np.apply_along_axis(
        np.bincount, 1, y.reshape(-1, n_support), minlength=n_class
    )
    return "manual" if (counts == shots).all() else "autodiff"


class _TIMBase(FewShotMethod):
    """Shared tim_infer plumbing for TIM-GD and alpha-TIM."""

    def _tim_kwargs(self, task):
        args = self.args
        precision = resolve_matmul_precision(
            str(args.get("tim_matmul_precision", "auto")))
        es_patience = int(args.get("tim_es_patience", 100))
        if es_patience < 1:
            raise ValueError(
                f"tim_es_patience must be >= 1, got {es_patience}")
        return dict(
            n_iter=int(args.iter),
            n_class=int(args.num_classes_test),
            precision=precision,
            ce_impl=str(args.get("tim_ce_impl", "gather")),
            mesh=self.mesh,
            grad_impl=resolve_grad_impl(
                str(args.get("tim_grad_impl", "auto")),
                task["y_s"], int(args.num_classes_test),
                precision=precision,
            ),
            opt_dtype=resolve_opt_dtype(
                str(args.get("tim_opt_dtype", "float32"))),
            early_stop=bool(args.get("tim_early_stop", False)),
            es_patience=es_patience,
            compact_tasks=int(args.get("tim_compact_tasks", 8)),
        )

    def _timing_iter_widths(self, n_used, n_full, n_task):
        """Same width model as EM-Dirichlet's task compaction (see
        ``EM_DIRICHLET._timing_iter_widths`` for the conservativeness
        argument): phase-1 iterations at the full (or chunk) width, the
        straggler iterations at the narrow ``tim_compact_tasks`` width."""
        n = max(int(round(float(n_used))), 1)
        if n_full is None or n_full >= n:
            return None
        chunk = int(self.args.get("task_chunk", 0) or 0)
        full_w = int(n_task)
        if 0 < chunk < n_task and n_task % chunk == 0:
            full_w = chunk
        narrow = min(max(int(self.args.get("tim_compact_tasks", 8)), 1),
                     full_w)
        import numpy as np

        w = np.full(n, float(narrow))
        w[:max(int(n_full), 0)] = float(full_w)
        return w


class ALPHA_TIM(_TIMBase):
    entropies_default = ("Shannon", "Alpha", "Alpha")

    def _infer(self, task):
        args = self.args
        self._log(
            f" ==> Executing ALPHA-TIM with ALPHA = {args.alpha_value} "
            f"and temp = {args.temp}"
        )
        return tim_infer(
            task["x_s"],
            task["x_q"],
            task["y_s"],
            jnp.float32(args.temp),
            jnp.float32(args.alpha_value),
            jnp.asarray(args.loss_weights, jnp.float32),
            entropies=tuple(args.entropies),
            lr=float(args.lr_alpha_tim),
            **self._tim_kwargs(task),
        )


class TIM_GD(_TIMBase):
    """Shannon-entropy TIM with gradient descent (reference: tim.py:90-189)."""

    def _infer(self, task):
        args = self.args
        self._log(f" ==> Executing TIM-GD with temp = {args.temp}")
        return tim_infer(
            task["x_s"],
            task["x_q"],
            task["y_s"],
            jnp.float32(args.temp),
            jnp.float32(1.0),
            jnp.asarray(args.loss_weights, jnp.float32),
            entropies=("Shannon", "Shannon", "Shannon"),
            lr=float(args.lr_tim),
            **self._tim_kwargs(task),
        )

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

from ...ops.common import constrainer, get_one_hot
from ..base import FewShotMethod
from .paddle import support_class_means
from ...ops.precision import f32_einsum

_EPS = 1e-12


def _tim_logits(weights, samples, temp, precision: str = "highest"):
    """temp * (x.w - ||w||^2/2 - ||x||^2/2) (reference: tim.py:99-113).

    ``precision='highest'`` (default) reproduces fp32 matmuls like the
    reference; ``'default'`` lets the MXU run bf16 operands with fp32
    accumulation — the Adam loop is a 1000-step contraction-bound scan, so
    this is the whole method's throughput knob (``tim_matmul_precision``
    config; accuracy equivalence vs the reference is tested).
    """
    if precision == "highest":
        xw = f32_einsum("tnd,tkd->tnk", samples, weights)
    else:
        xw = jnp.einsum("tnd,tkd->tnk", samples, weights)
    w2 = 0.5 * jnp.sum(weights * weights, axis=-1)[:, None, :]
    x2 = 0.5 * jnp.sum(samples * samples, axis=-1)[:, :, None]
    return temp * (xw - w2 - x2)


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


@partial(jax.jit, static_argnames=("n_iter", "n_class", "entropies", "lr",
                                   "precision", "ce_impl", "mesh"))
def tim_infer(support, query, y_s, temp, alpha_value, loss_weights,
              n_iter: int, n_class: int, entropies: tuple, lr: float,
              precision: str = "highest", ce_impl: str = "gather",
              mesh=None):
    """Returns (u_q [N, n, K] from last-iteration logits, criterions [n_iter]).

    ``mesh``: optional (dp, tp) mesh — tasks shard over dp; the class
    weights' feature axis (and the Adam moments with it) shards over tp, so
    the per-chip optimizer state is N/dp * K * d/tp and the logits
    contraction psums over ICI. This is the memory-bound method of the
    suite (autodiff residuals over [N, n_class*shots, K] support logits);
    TP is how batches that exceed one chip's HBM run.
    """
    con = constrainer(mesh)

    def con_w(tree):
        return jax.tree.map(
            lambda t: con(t, "dp", None, "tp") if getattr(t, "ndim", 0) == 3
            else t,
            tree,
        )

    support = con(support, "dp", None, None)
    query = con(query, "dp", None, None)
    y_one_hot = get_one_hot(y_s, n_class) if ce_impl == "onehot" else None
    w0 = con_w(support_class_means(support, y_s, n_class))
    opt = optax.adam(lr)
    opt_state0 = con_w(opt.init(w0))

    def loss_fn(weights):
        logits_s = _tim_logits(weights, support, temp, precision)
        logits_q = _tim_logits(weights, query, temp, precision)
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

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    logits_q0 = _tim_logits(w0, query, temp, precision)

    def step(carry, _):
        weights, opt_state, _ = carry
        (_, logits_q), grads = grad_fn(weights)
        updates, opt_state = opt.update(con_w(grads), opt_state)
        new_weights = con_w(optax.apply_updates(weights, updates))
        opt_state = con_w(opt_state)
        crit = jnp.mean(jnp.linalg.norm(weights - new_weights, axis=-1))
        return (new_weights, opt_state, logits_q), crit

    (_, _, logits_q), criterions = jax.lax.scan(
        step, (w0, opt_state0, logits_q0), None, length=n_iter
    )
    return jax.nn.softmax(logits_q, axis=2), criterions


class ALPHA_TIM(FewShotMethod):
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
            n_iter=int(args.iter),
            n_class=int(args.num_classes_test),
            entropies=tuple(args.entropies),
            lr=float(args.lr_alpha_tim),
            precision=str(args.get("tim_matmul_precision", "highest")),
            ce_impl=str(args.get("tim_ce_impl", "gather")),
            mesh=self.mesh,
        )


class TIM_GD(FewShotMethod):
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
            n_iter=int(args.iter),
            n_class=int(args.num_classes_test),
            entropies=("Shannon", "Shannon", "Shannon"),
            lr=float(args.lr_tim),
            precision=str(args.get("tim_matmul_precision", "highest")),
            ce_impl=str(args.get("tim_ce_impl", "gather")),
            mesh=self.mesh,
        )

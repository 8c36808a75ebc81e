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


def fused_attention_supported(n: int, width: int, dtype) -> bool:
    """True when one grid instance's working set fits the VMEM budget."""
    item = jnp.dtype(dtype).itemsize
    qkv_block = n * 3 * width * item * 2          # double-buffered
    out_block = n * width * item
    scores = n * n * 4                            # fp32
    return qkv_block + out_block + scores <= _VMEM_BUDGET


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


@partial(jax.jit, static_argnames=("heads", "interpret"))
def fused_attention(qkv, heads: int, mask=None, *, interpret: bool = False):
    """Multi-head self-attention over a fused qkv projection.

    qkv:  [b, n, 3*width] — the ``in_proj`` output, laid out q|k|v with all
          heads contiguous inside each third (OpenAI CLIP's in_proj layout).
    mask: optional additive attention mask, broadcastable to [n, n]
          (leading singleton dims are squeezed).
    Returns [b, n, width] in qkv's dtype (pre-``out_proj``).
    """
    b, n, three_w = qkv.shape
    width = three_w // 3
    if width * 3 != three_w or width % heads:
        raise ValueError(f"bad qkv shape {qkv.shape} for heads={heads}")
    scale = (width // heads) ** -0.5

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

"""Transformer building blocks shared by the CLIP vision and text towers.

TPU notes: attention and MLPs are plain batched matmuls that XLA tiles onto
the MXU; sequence lengths are fixed (197/50 visual tokens, 77 text tokens) so
everything compiles to static shapes. Computation runs in bf16 on the MXU
with fp32 accumulation (the default TPU policy) — CLIP inference is robust
to this, unlike the EM loops (see ops/precision.py).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp


class QuickGELU(nn.Module):
    @nn.compact
    def __call__(self, x):
        return x * nn.sigmoid(1.702 * x)


class MultiHeadAttention(nn.Module):
    """Fused-qkv multi-head attention, matching OpenAI CLIP's in_proj layout
    so checkpoint conversion is a direct reshape.

    ``attn_impl`` selects the score-matrix computation:
      * ``'xla'`` — plain einsums (every backend; the score tensor and the
        head transposes round-trip HBM);
      * ``'fused'`` — the VMEM-resident Pallas kernel
        (ops/pallas_attention.py, TPU production path);
      * ``'fused_interpret'`` — the same kernel in interpreter mode
        (CPU equivalence tests only).
    Both paths share the in/out projections, so parameters are identical.
    """

    width: int
    heads: int
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None):
        b, n, _ = x.shape
        head_dim = self.width // self.heads
        qkv = nn.Dense(3 * self.width, name="in_proj")(x)        # [b, n, 3w]

        if self.attn_impl in ("fused", "fused_interpret"):
            from transductive_clip_tpu.ops.pallas_attention import (
                fused_attention,
            )

            out = fused_attention(
                qkv, self.heads, mask,
                interpret=self.attn_impl == "fused_interpret",
            )
            return nn.Dense(self.width, name="out_proj")(out)
        if self.attn_impl != "xla":
            raise ValueError(f"unknown attn_impl {self.attn_impl!r}")

        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(t):
            return t.reshape(b, n, self.heads, head_dim).transpose(0, 2, 1, 3)

        q, k, v = map(split_heads, (q, k, v))
        scale = head_dim ** -0.5
        attn = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k)
        if mask is not None:
            attn = attn + mask
        attn = nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, self.width)
        return nn.Dense(self.width, name="out_proj")(out)


class ResidualAttentionBlock(nn.Module):
    width: int
    heads: int
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None):
        y = nn.LayerNorm(epsilon=1e-5, name="ln_1")(x)
        x = x + MultiHeadAttention(
            self.width, self.heads, self.attn_impl, name="attn"
        )(y, mask)
        y = nn.LayerNorm(epsilon=1e-5, name="ln_2")(x)
        y = nn.Dense(4 * self.width, name="c_fc")(y)
        y = QuickGELU()(y)
        y = nn.Dense(self.width, name="c_proj")(y)
        return x + y


class Transformer(nn.Module):
    width: int
    layers: int
    heads: int
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None):
        for i in range(self.layers):
            x = ResidualAttentionBlock(
                self.width, self.heads, self.attn_impl, name=f"resblock_{i}"
            )(x, mask)
        return x

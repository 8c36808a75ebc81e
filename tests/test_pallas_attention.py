"""Equivalence tests for the fused Pallas attention (ops/pallas_attention.py).

The fused kernel must compute the same attention as the XLA einsum path in
models/clip/layers.py — same in_proj layout, same fp32 softmax, same output
dtype. Runs in interpreter mode on the CPU suite; the real-TPU lowering is
exercised by scripts/bench_suite.py --extraction.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transductive_clip_tpu.models.clip.layers import MultiHeadAttention
from transductive_clip_tpu.ops.pallas_attention import (
    fused_attention,
    fused_attention_supported,
)


def _xla_reference(qkv, heads, mask=None):
    """The einsum attention from layers.py, minus the projections."""
    b, n, three_w = qkv.shape
    width = three_w // 3
    head_dim = width // heads
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def split_heads(t):
        return t.reshape(b, n, heads, head_dim).transpose(0, 2, 1, 3)

    q, k, v = map(split_heads, (q, k, v))
    attn = jnp.einsum("bhqd,bhkd->bhqk", q * head_dim ** -0.5, k)
    if mask is not None:
        attn = attn + mask
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(qkv.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
    return out.transpose(0, 2, 1, 3).reshape(b, n, width)


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 1e-5), (jnp.bfloat16, 2e-2)])
@pytest.mark.parametrize("n,width,heads", [(33, 64, 4), (197, 96, 6)])
def test_fused_matches_xla(rng, dtype, tol, n, width, heads):
    qkv = jnp.asarray(
        rng.standard_normal((2, n, 3 * width)).astype(np.float32), dtype
    )
    got = fused_attention(qkv, heads, interpret=True)
    want = _xla_reference(qkv, heads)
    assert got.dtype == qkv.dtype
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=tol, atol=tol,
    )


def test_fused_causal_mask_matches_xla(rng):
    n, width, heads = 17, 48, 3
    qkv = jnp.asarray(rng.standard_normal((2, n, 3 * width)), jnp.float32)
    causal = jnp.triu(jnp.full((n, n), -jnp.inf, jnp.float32), k=1)
    got = fused_attention(qkv, heads, causal[None, None], interpret=True)
    want = _xla_reference(qkv, heads, causal[None, None])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_module_impl_switch_same_params(rng):
    """MultiHeadAttention with attn_impl fused vs xla: identical parameter
    tree, matching outputs — the switch is purely an execution-plan choice."""
    x = jnp.asarray(rng.standard_normal((2, 21, 40)), jnp.float32)
    mod_x = MultiHeadAttention(width=40, heads=4, attn_impl="xla")
    mod_f = MultiHeadAttention(width=40, heads=4, attn_impl="fused_interpret")
    params = mod_x.init(jax.random.PRNGKey(0), x)
    assert jax.tree.structure(params) == jax.tree.structure(
        mod_f.init(jax.random.PRNGKey(0), x)
    )
    np.testing.assert_allclose(
        np.asarray(mod_f.apply(params, x)),
        np.asarray(mod_x.apply(params, x)),
        rtol=1e-5, atol=1e-5,
    )


def test_unknown_impl_rejected(rng):
    x = jnp.zeros((1, 4, 8), jnp.float32)
    mod = MultiHeadAttention(width=8, heads=2, attn_impl="cuda")
    with pytest.raises(ValueError, match="attn_impl"):
        mod.init(jax.random.PRNGKey(0), x)


def test_supported_guard():
    # every real CLIP tower shape fits in bf16
    assert fused_attention_supported(197, 768, jnp.bfloat16)    # ViT-B/16
    assert fused_attention_supported(577, 1024, jnp.bfloat16)   # ViT-L@336
    assert fused_attention_supported(77, 512, jnp.bfloat16)     # text
    # ViT-L@336 in fp32 blows the VMEM budget -> resolver falls back to XLA
    assert not fused_attention_supported(577, 1024, jnp.float32)

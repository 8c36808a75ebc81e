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
    # ViT-L@336 in fp32 exceeds the whole-sequence kernel's VMEM budget but
    # is carried by the q-row-blocked variant — NOT an XLA fallback
    assert fused_attention_supported(577, 1024, jnp.float32)
    from transductive_clip_tpu.ops.pallas_attention import (
        _pick_block_q,
        _rows_working_set,
        _VMEM_BUDGET,
    )

    assert _rows_working_set(577, 1024, 4) > _VMEM_BUDGET
    assert _pick_block_q(577, 1024, jnp.float32) > 0


def test_no_silent_fallback_for_any_production_tower():
    """'auto' must resolve to the fused kernel for EVERY supported backbone
    at BOTH compute dtypes — the paper's strongest backbone (ViT-L/14,
    reference: config/main_config.yaml:14-16) must not silently lose the
    fused path when the user asks for reference-exact fp32 numerics."""
    from transductive_clip_tpu.models.clip.config import CLIP_CONFIGS
    from transductive_clip_tpu.models.clip.model import (
        _resolve_attention_impl,
    )

    class _TpuBackend:
        def __enter__(self):
            import transductive_clip_tpu.models.clip.model as m

            self._orig = m.jax.default_backend
            m.jax.default_backend = lambda: "tpu"
            return self

        def __exit__(self, *exc):
            import transductive_clip_tpu.models.clip.model as m

            m.jax.default_backend = self._orig

    with _TpuBackend():
        for name, cfg in CLIP_CONFIGS.items():
            for dtype in (jnp.bfloat16, jnp.float32):
                impl = _resolve_attention_impl("auto", cfg, dtype)
                assert impl == "fused", (name, dtype, impl)


def test_blocked_variant_matches_xla(rng):
    """The q-row-blocked kernel (forced via a direct call) matches XLA,
    including a non-divisible final block and the additive-mask path."""
    from transductive_clip_tpu.ops.pallas_attention import (
        _fused_attention_blocked,
    )

    n, width, heads = 53, 64, 4                    # 53 = 3*16 + 5: ragged
    qkv = jnp.asarray(rng.standard_normal((2, n, 3 * width)), jnp.float32)
    got = _fused_attention_blocked(qkv, heads, None, 16, interpret=True)
    want = _xla_reference(qkv, heads)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    causal = jnp.triu(jnp.full((n, n), -jnp.inf, jnp.float32), k=1)
    got = _fused_attention_blocked(qkv, heads, causal[None, None], 16,
                                   interpret=True)
    want = _xla_reference(qkv, heads, causal[None, None])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_blocked_dispatch_at_vitl336_fp32_shape(rng):
    """fused_attention at the real ViT-L/14@336px fp32 shape dispatches to
    the blocked variant and matches XLA (interpret mode; the real-TPU
    lowering + timing is bench_suite --extraction)."""
    n, width, heads = 577, 1024, 16
    qkv = jnp.asarray(rng.standard_normal((1, n, 3 * width)), jnp.float32)
    got = fused_attention(qkv, heads, interpret=True)
    want = _xla_reference(qkv, heads)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

"""ops/pallas_bottleneck.py — fused identity bottleneck vs the XLA graph.

The kernel must be a pure performance rewrite: same math as the fold_bn
XLA block (conv1x1 -> relu -> conv3x3(pad 1) -> relu -> conv1x1 -> +x ->
relu) within bf16 tolerance, identical param tree, and exact VMEM gating.
Runs in interpret mode on CPU (the kernel auto-selects it off-TPU).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from transductive_clip_tpu.ops.pallas_bottleneck import (
    fused_bottleneck_supported,
    fused_identity_bottleneck,
)


def _xla_reference(x, w1, b1, w2, b2, w3, b3):
    dn = ("NHWC", "HWIO", "NHWC")
    out = jax.nn.relu(jax.lax.conv_general_dilated(
        x, w1[None, None], (1, 1), [(0, 0), (0, 0)], dimension_numbers=dn
    ) + b1.astype(x.dtype))
    out = jax.nn.relu(jax.lax.conv_general_dilated(
        out, w2, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn
    ) + b2.astype(x.dtype))
    out = jax.lax.conv_general_dilated(
        out, w3[None, None], (1, 1), [(0, 0), (0, 0)], dimension_numbers=dn
    ) + b3.astype(x.dtype)
    return jax.nn.relu(out + x)


def _random_block(rng, b, h, w, c, c_mid, dtype):
    def t(*shape, scale=0.1):
        return jnp.asarray(rng.normal(size=shape) * scale, dtype)

    return (t(b, h, w, c, scale=1.0), t(c, c_mid), t(c_mid, scale=0.01),
            t(3, 3, c_mid, c_mid), t(c_mid, scale=0.01), t(c_mid, c),
            t(c, scale=0.01))


@pytest.mark.parametrize("shape", [
    (2, 8, 8, 32, 8),      # tiny
    (1, 14, 14, 64, 16),   # layer3-like geometry
    (2, 16, 8, 16, 4),     # non-square spatial
], ids=["tiny", "l3geom", "rect"])
def test_kernel_matches_xla_fp32(shape):
    rng = np.random.default_rng(0)
    args = _random_block(rng, *shape, jnp.float32)
    got = fused_identity_bottleneck(*args)
    want = _xla_reference(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_kernel_matches_xla_bf16():
    rng = np.random.default_rng(1)
    args = _random_block(rng, 2, 8, 8, 32, 8, jnp.bfloat16)
    got = np.asarray(fused_identity_bottleneck(*args), np.float32)
    want = np.asarray(_xla_reference(*args), np.float32)
    # bf16 operands, fp32 accumulation on both sides; the fused path adds
    # the residual in fp32 (strictly more accurate), hence the loose-ish tol
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-2)
    assert got.dtype == np.float32 and args[0].dtype == jnp.bfloat16


def test_relu_and_residual_semantics():
    """Zero weights: output must be relu(b3 + x) — locks the bias/residual
    ordering (bias before the residual add, relu after)."""
    x = jnp.asarray(np.linspace(-2, 2, 2 * 4 * 4 * 8), jnp.float32)
    x = x.reshape(2, 4, 4, 8)
    z = jnp.zeros
    out = fused_identity_bottleneck(
        x, z((8, 4)), z((4,)), z((3, 3, 4, 4)), z((4,)), z((4, 8)),
        jnp.full((8,), 0.5),
    )
    np.testing.assert_allclose(np.asarray(out),
                               np.maximum(np.asarray(x) + 0.5, 0.0),
                               rtol=1e-6, atol=1e-6)


def test_vmem_gate():
    assert fused_bottleneck_supported(56, 56, 256, 64, jnp.bfloat16)
    assert fused_bottleneck_supported(28, 28, 512, 128, jnp.bfloat16)
    assert fused_bottleneck_supported(14, 14, 1024, 256, jnp.bfloat16)
    assert fused_bottleneck_supported(7, 7, 2048, 512, jnp.bfloat16)
    # absurd working set must be rejected (falls back to the XLA graph)
    assert not fused_bottleneck_supported(224, 224, 2048, 512, jnp.float32)


def test_fused_tower_matches_unfused(tmp_path):
    """Full ResNet tower: fold_bn + fused blocks vs fold_bn XLA graph on
    converted synthetic weights — the integration path JaxCLIP('auto')
    takes on TPU."""
    torch = pytest.importorskip("torch")  # noqa: F841 (converter dep)
    import sys
    import os

    sys.path.insert(0, os.path.dirname(__file__))
    from test_convert import TINY_RN
    from torch_clip import synth_state_dict

    from transductive_clip_tpu.models.clip import CLIPModule
    from transductive_clip_tpu.models.clip.convert import (
        convert_openai_checkpoint,
    )
    from transductive_clip_tpu.models.clip.resnet import fold_resnet_params

    cfg = TINY_RN
    sd = synth_state_dict(cfg)
    path = tmp_path / "tiny.pt"
    torch.save(sd, str(path))
    params = convert_openai_checkpoint(str(path), cfg)
    folded = {"params": dict(params["params"])}
    folded["params"]["visual"] = fold_resnet_params(params["params"]["visual"])

    rng = np.random.default_rng(2)
    imgs = jnp.asarray(rng.normal(
        size=(3, cfg.vision.image_size, cfg.vision.image_size, 3)
    ), jnp.float32)

    plain = CLIPModule(cfg, fold_bn=True).apply(
        folded, imgs, method=CLIPModule.encode_image
    )
    fused = CLIPModule(cfg, fold_bn=True, fused_resnet=True).apply(
        folded, imgs, method=CLIPModule.encode_image
    )
    np.testing.assert_allclose(np.asarray(fused), np.asarray(plain),
                               rtol=2e-4, atol=2e-4)


def test_param_tree_identical_fused_vs_not():
    """The fused module must create the exact same parameter tree as the
    XLA fold_bn module, so converted checkpoints load interchangeably."""
    from transductive_clip_tpu.models.clip import CLIPModule
    from transductive_clip_tpu.models.clip.config import (
        CLIPConfig,
        CLIPTextConfig,
        CLIPVisionConfig,
    )

    cfg = CLIPConfig(
        name="t", embed_dim=16,
        vision=CLIPVisionConfig(image_size=32, width=8, heads=4,
                                is_resnet=True, resnet_layers=(1, 2, 1, 1)),
        text=CLIPTextConfig(vocab_size=32, context_length=8, width=16,
                            layers=1, heads=4),
    )
    imgs = jnp.zeros((1, 32, 32, 3), jnp.float32)
    toks = jnp.zeros((1, 8), jnp.int32)
    key = jax.random.PRNGKey(0)

    def paths(tree, prefix=()):
        if isinstance(tree, dict):
            out = []
            for k in sorted(tree):
                out += paths(tree[k], prefix + (k,))
            return out
        return [(prefix, jnp.shape(tree))]

    p_plain = CLIPModule(cfg, fold_bn=True).init(key, imgs, toks)
    p_fused = CLIPModule(cfg, fold_bn=True, fused_resnet=True).init(
        key, imgs, toks
    )
    assert paths(p_plain) == paths(p_fused)

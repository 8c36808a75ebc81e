"""CLIP's ModifiedResNet vision tower (RN50).

Differences from a torchvision ResNet, mirrored here:
* 3-layer convolutional stem with an average pool (no maxpool),
* anti-aliasing average pools for all strided convolutions,
* an attention-pool head (multi-head attention over spatial tokens with the
  mean token as query) instead of global average pooling.

BatchNorm runs in frozen inference mode (running statistics are parameters);
the towers are never trained in this framework. Because the model is frozen,
every BN folds *exactly* into the preceding bias-free conv
(``fold_resnet_params``): ``y = conv(x) * inv + (bias - mean * inv)`` with
``inv = scale / sqrt(var + eps)`` is the same affine map as a conv whose
kernel is scaled per output channel by ``inv`` and that carries
``bias - mean * inv`` as its bias. ``fold_bn=True`` builds the tower in that
form (one conv+bias op per conv instead of conv + 4-parameter elementwise
pass); it is the production default, with ``clip_fold_bn: False`` switching
back to the reference-shaped unfolded graph.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .config import CLIPVisionConfig

_BN_EPS = 1e-5


class FrozenBatchNorm(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        inv = scale / jnp.sqrt(var + _BN_EPS)
        return x * inv.astype(x.dtype) + (bias - mean * inv).astype(x.dtype)


def avg_pool(x, window, stride):
    return nn.avg_pool(x, (window, window), strides=(stride, stride))


class _ConvParams(nn.Module):
    """Registers conv kernel+bias params WITHOUT computing — the fused
    bottleneck path needs the raw weights for the Pallas kernel, under the
    exact param-tree names the converter/fold produce (``convN/kernel``,
    ``convN/bias``)."""
    kernel_shape: tuple
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), self.kernel_shape
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    expansion: int = 4
    fold_bn: bool = False
    # fuse=True routes identity blocks (stride 1, no downsample) through the
    # fused Pallas kernel (ops/pallas_bottleneck.py) — requires fold_bn
    # (the kernel consumes conv biases). Falls back to the XLA graph when
    # the block's working set exceeds the kernel's VMEM budget.
    fuse: bool = False

    @nn.compact
    def __call__(self, x):
        if (self.fuse and self.fold_bn and not self.downsample
                and self.stride == 1):
            from ...ops.pallas_bottleneck import (
                fused_bottleneck_supported,
                fused_identity_bottleneck,
            )

            c = x.shape[-1]
            c_mid = self.planes
            if fused_bottleneck_supported(x.shape[1], x.shape[2], c, c_mid,
                                          x.dtype):
                k1, b1 = _ConvParams((1, 1, c, c_mid), c_mid, name="conv1")()
                k2, b2 = _ConvParams((3, 3, c_mid, c_mid), c_mid,
                                     name="conv2")()
                k3, b3 = _ConvParams((1, 1, c_mid, c), c, name="conv3")()
                return fused_identity_bottleneck(
                    x, k1[0, 0].astype(x.dtype), b1,
                    k2.astype(x.dtype), b2, k3[0, 0].astype(x.dtype), b3,
                )

        def conv(features, kernel, name, y, **kw):
            y = nn.Conv(features, kernel, use_bias=self.fold_bn, name=name,
                        **kw)(y)
            if not self.fold_bn:
                y = FrozenBatchNorm(features, name=name.replace("conv", "bn"))(y)
            return y

        identity = x
        out = nn.relu(conv(self.planes, (1, 1), "conv1", x))
        out = nn.relu(conv(self.planes, (3, 3), "conv2", out, padding=1))
        if self.stride > 1:
            out = avg_pool(out, self.stride, self.stride)
        width_out = self.planes * self.expansion
        out = conv(width_out, (1, 1), "conv3", out)

        if self.downsample:
            if self.stride > 1:
                identity = avg_pool(identity, self.stride, self.stride)
            identity = nn.Conv(
                width_out, (1, 1), use_bias=self.fold_bn, name="downsample_conv"
            )(identity)
            if not self.fold_bn:
                identity = FrozenBatchNorm(width_out, name="downsample_bn")(identity)
        return nn.relu(out + identity)


class AttentionPool2d(nn.Module):
    embed_dim: int
    heads: int
    output_dim: int

    @nn.compact
    def __call__(self, x):
        """x: [b, h, w, c] -> [b, output_dim]."""
        b, h, w, c = x.shape
        # c is derived from the input; embed_dim documents/checks the
        # expected stem output so a misconfigured backbone fails loudly
        assert c == self.embed_dim, (c, self.embed_dim)
        tokens = x.reshape(b, h * w, c)
        mean = tokens.mean(axis=1, keepdims=True)
        tokens = jnp.concatenate([mean, tokens], axis=1)         # [b, hw+1, c]
        pos = self.param(
            "positional_embedding", nn.initializers.normal(c ** -0.5),
            (h * w + 1, c),
        )
        tokens = tokens + pos.astype(tokens.dtype)

        head_dim = c // self.heads
        q = nn.Dense(c, name="q_proj")(tokens[:, :1])
        k = nn.Dense(c, name="k_proj")(tokens)
        v = nn.Dense(c, name="v_proj")(tokens)

        def split(t):
            return t.reshape(b, -1, self.heads, head_dim).transpose(0, 2, 1, 3)

        q, k, v = map(split, (q, k, v))
        attn = jnp.einsum("bhqd,bhkd->bhqk", q * head_dim ** -0.5, k)
        attn = nn.softmax(attn.astype(jnp.float32), axis=-1).astype(tokens.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, 1, c)
        out = nn.Dense(self.output_dim, name="c_proj")(out)
        return out[:, 0]


class ModifiedResNet(nn.Module):
    cfg: CLIPVisionConfig
    embed_dim: int
    # fold_bn=True expects parameters produced by fold_resnet_params():
    # biased convs, no FrozenBatchNorm modules. Same math, fewer HBM passes.
    fold_bn: bool = False
    # fuse_blocks=True runs the identity bottlenecks through the fused
    # Pallas kernel (requires fold_bn; see Bottleneck.fuse)
    fuse_blocks: bool = False

    @nn.compact
    def __call__(self, images):
        """images: [b, H, W, 3] -> [b, embed_dim]."""
        c = self.cfg
        width = c.width
        x = images

        def stem_conv(features, name, y, **kw):
            y = nn.Conv(features, (3, 3), padding=1, use_bias=self.fold_bn,
                        name=name, **kw)(y)
            if not self.fold_bn:
                y = FrozenBatchNorm(features, name=name.replace("conv", "bn"))(y)
            return nn.relu(y)

        # 3-conv stem
        x = stem_conv(width // 2, "conv1", x, strides=2)
        x = stem_conv(width // 2, "conv2", x)
        x = stem_conv(width, "conv3", x)
        x = avg_pool(x, 2, 2)

        # residual stages
        planes = width
        for stage, blocks in enumerate(c.resnet_layers):
            stride = 1 if stage == 0 else 2
            for block in range(blocks):
                x = Bottleneck(
                    planes,
                    stride=stride if block == 0 else 1,
                    downsample=(block == 0),
                    fold_bn=self.fold_bn,
                    fuse=self.fuse_blocks,
                    name=f"layer{stage + 1}_{block}",
                )(x)
            planes *= 2

        return AttentionPool2d(
            embed_dim=width * 32, heads=c.heads, output_dim=self.embed_dim,
            name="attnpool",
        )(x)


def fold_resnet_params(visual):
    """Fold every FrozenBatchNorm of an *unfolded* ModifiedResNet visual
    param subtree into its preceding bias-free conv.

    Exact (fp32 host math, same eps): for each ``convX``/``bnX`` pair,
    ``kernel[..., o] *= inv[o]`` and ``bias[o] = bn.bias[o] - mean[o]*inv[o]``
    with ``inv = scale / sqrt(var + eps)``. Returns the param subtree the
    ``fold_bn=True`` module expects; non-BN leaves pass through unchanged.
    """
    out = {}
    for name, sub in visual.items():
        if not isinstance(sub, dict):
            out[name] = sub
        elif name.startswith("bn") or name == "downsample_bn":
            continue
        elif name.startswith("conv") or name == "downsample_conv":
            bn = visual[name.replace("conv", "bn")
                        if name != "downsample_conv" else "downsample_bn"]
            inv = (np.asarray(bn["scale"], np.float64)
                   / np.sqrt(np.asarray(bn["var"], np.float64) + _BN_EPS))
            kernel = np.asarray(sub["kernel"], np.float64) * inv
            bias = np.asarray(bn["bias"], np.float64) - np.asarray(
                bn["mean"], np.float64) * inv
            out[name] = {"kernel": kernel.astype(np.float32),
                         "bias": bias.astype(np.float32)}
        else:
            out[name] = fold_resnet_params(sub)
    return out

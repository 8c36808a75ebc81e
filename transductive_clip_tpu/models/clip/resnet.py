"""CLIP's ModifiedResNet vision tower (RN50).

Differences from a torchvision ResNet, mirrored here:
* 3-layer convolutional stem with an average pool (no maxpool),
* anti-aliasing average pools for all strided convolutions,
* an attention-pool head (multi-head attention over spatial tokens with the
  mean token as query) instead of global average pooling.

BatchNorm runs in frozen inference mode (running statistics are parameters);
the towers are never trained in this framework.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .config import CLIPVisionConfig


class FrozenBatchNorm(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        inv = scale / jnp.sqrt(var + 1e-5)
        return x * inv.astype(x.dtype) + (bias - mean * inv).astype(x.dtype)


def avg_pool(x, window, stride):
    return nn.avg_pool(x, (window, window), strides=(stride, stride))


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        identity = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1")(x)
        out = FrozenBatchNorm(self.planes, name="bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False, name="conv2")(out)
        out = FrozenBatchNorm(self.planes, name="bn2")(out)
        out = nn.relu(out)
        if self.stride > 1:
            out = avg_pool(out, self.stride, self.stride)
        width_out = self.planes * self.expansion
        out = nn.Conv(width_out, (1, 1), use_bias=False, name="conv3")(out)
        out = FrozenBatchNorm(width_out, name="bn3")(out)

        if self.downsample:
            if self.stride > 1:
                identity = avg_pool(identity, self.stride, self.stride)
            identity = nn.Conv(
                width_out, (1, 1), use_bias=False, name="downsample_conv"
            )(identity)
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

    @nn.compact
    def __call__(self, images):
        """images: [b, H, W, 3] -> [b, embed_dim]."""
        c = self.cfg
        width = c.width
        x = images
        # 3-conv stem
        x = nn.Conv(width // 2, (3, 3), strides=2, padding=1, use_bias=False,
                    name="conv1")(x)
        x = nn.relu(FrozenBatchNorm(width // 2, name="bn1")(x))
        x = nn.Conv(width // 2, (3, 3), padding=1, use_bias=False, name="conv2")(x)
        x = nn.relu(FrozenBatchNorm(width // 2, name="bn2")(x))
        x = nn.Conv(width, (3, 3), padding=1, use_bias=False, name="conv3")(x)
        x = nn.relu(FrozenBatchNorm(width, name="bn3")(x))
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
                    name=f"layer{stage + 1}_{block}",
                )(x)
            planes *= 2

        return AttentionPool2d(
            embed_dim=width * 32, heads=c.heads, output_dim=self.embed_dim,
            name="attnpool",
        )(x)

"""CLIP Vision Transformer tower (ViT-B/16, ViT-B/32, ViT-L/14)."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .config import CLIPVisionConfig
from .layers import Transformer


class VisionTransformer(nn.Module):
    cfg: CLIPVisionConfig
    embed_dim: int
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, images):
        """images: [b, H, W, 3] (NHWC, CLIP-normalized) -> [b, embed_dim]."""
        c = self.cfg
        x = nn.Conv(
            c.width,
            kernel_size=(c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size),
            use_bias=False,
            name="conv1",
        )(images)                                               # [b, g, g, w]
        b = x.shape[0]
        x = x.reshape(b, -1, c.width)                           # [b, g*g, w]

        class_embedding = self.param(
            "class_embedding", nn.initializers.normal(0.02), (c.width,)
        )
        cls = jnp.broadcast_to(class_embedding, (b, 1, c.width)).astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=1)

        n_tokens = (c.image_size // c.patch_size) ** 2 + 1
        pos = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            (n_tokens, c.width),
        )
        x = x + pos.astype(x.dtype)

        x = nn.LayerNorm(epsilon=1e-5, name="ln_pre")(x)
        x = Transformer(
            c.width, c.layers, c.heads, self.attn_impl, name="transformer"
        )(x)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_post")(x[:, 0, :])

        proj = self.param(
            "proj", nn.initializers.normal(c.width ** -0.5),
            (c.width, self.embed_dim),
        )
        return x @ proj.astype(x.dtype)

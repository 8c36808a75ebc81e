"""CLIP text tower: token embedding + causal transformer + projection,
pooled at the end-of-text token (highest token id)."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .config import CLIPTextConfig
from .layers import Transformer


class TextTransformer(nn.Module):
    cfg: CLIPTextConfig
    embed_dim: int
    attn_impl: str = "xla"

    @nn.compact
    def __call__(self, tokens):
        """tokens: [b, context_length] int32 -> [b, embed_dim]."""
        c = self.cfg
        tok_emb = self.param(
            "token_embedding", nn.initializers.normal(0.02),
            (c.vocab_size, c.width),
        )
        x = tok_emb[tokens]
        pos = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            (c.context_length, c.width),
        )
        x = x + pos.astype(x.dtype)

        n = c.context_length
        causal = jnp.full((n, n), -jnp.inf, x.dtype)
        causal = jnp.triu(causal, k=1)[None, None]
        x = Transformer(
            c.width, c.layers, c.heads, self.attn_impl, name="transformer"
        )(x, causal)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_final")(x)

        # pool at the EOT token (the highest token id in each sequence)
        eot = jnp.argmax(tokens, axis=-1)
        x = x[jnp.arange(x.shape[0]), eot]

        proj = self.param(
            "text_projection", nn.initializers.normal(c.width ** -0.5),
            (c.width, self.embed_dim),
        )
        return x @ proj.astype(x.dtype)

"""Small shared tensor ops."""

from __future__ import annotations

import jax.numpy as jnp

# Matches the epsilon used throughout the reference methods
# (reference: src/methods/zero_shot/em_dirichlet.py:20).
EPS = 1e-15


def get_one_hot(y, n_class, dtype=jnp.float32):
    """One-hot encode integer labels [..., n] -> [..., n, n_class]."""
    return (y[..., None] == jnp.arange(n_class, dtype=y.dtype)).astype(dtype)


def l2_normalize(x, axis=-1, eps=1e-12):
    """Row-normalize to unit L2 norm (zero rows stay finite)."""
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


def device_sync(x):
    """Block until ``x`` is computed.

    ``block_until_ready`` returns immediately on some remote/tunneled
    backends (observed on the axon TPU plugin), so timing and completion
    barriers instead force a scalar reduction + host transfer, which cannot
    complete before the producing computation does.
    """
    import jax

    leaves = jax.tree.leaves(x)
    if leaves:
        float(jnp.sum(leaves[0].ravel()[:1]))
    return x

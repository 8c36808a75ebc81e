"""Distance kernels, written as matmuls so XLA tiles them onto the MXU.

The reference materializes [n_task, n, K, C] broadcast-subtract tensors
(reference: src/methods/zero_shot/soft_kmeans.py:112-114); on TPU we use the
expansion ||x - w||^2 = ||x||^2 + ||w||^2 - 2 x.w so the dominant cost is a
batched matmul on the systolic array and no rank-4 temporary is ever built.
"""

from __future__ import annotations

import jax.numpy as jnp

from .common import EPS
from .precision import f32_einsum


def sq_euclidean(x, w, impl: str = "matmul"):
    """Pairwise squared euclidean distance.

    x: [..., n, d], w: [..., k, d] -> [..., n, k]

    ``impl='matmul'`` (default) uses the MXU expansion; for nearly-equal
    points the expansion cancels catastrophically in fp32 (relative error on
    tiny distances ~1e-2 after the T=30 temperature), which can flip
    borderline assignments vs the reference over many EM iterations.
    ``impl='direct'`` materializes the broadcast-subtract exactly like the
    reference (soft_kmeans.py:112-114) — reference-exact numerics, rank-4
    temporary; use for parity runs at small K (``distance_impl`` config).
    """
    if impl == "direct":
        diff = x[..., :, None, :] - w[..., None, :, :]
        return jnp.sum(diff * diff, axis=-1)
    x2 = jnp.sum(x * x, axis=-1)[..., :, None]
    w2 = jnp.sum(w * w, axis=-1)[..., None, :]
    xw = f32_einsum("...nd,...kd->...nk", x, w)
    return jnp.maximum(x2 + w2 - 2.0 * xw, 0.0)


def kl_divergence_to_centroids(x, w, eps: float = EPS):
    """KL(x || w) for rows of the simplex vs centroid rows.

    x: [..., n, d], w: [..., k, d] -> [..., n, k]
    KL = sum x log x - x @ log(w)^T, with eps-smoothed arguments
    (reference: src/methods/zero_shot/kl_kmeans.py:123-127).
    """
    xs = x + eps
    ws = w + eps
    ent = jnp.sum(xs * jnp.log(xs), axis=-1)[..., :, None]
    cross = f32_einsum("...nd,...kd->...nk", xs, jnp.log(ws))
    return ent - cross

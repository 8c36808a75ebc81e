"""Matmul precision policy.

TPU MXU matmuls default to bf16 operands; the EM statistics and Dirichlet
log-density contractions are accuracy-critical (they feed criterion tests at
1e-11 and must reproduce reference fp32 numerics), so they run with
``Precision.HIGHEST`` (fp32 via multi-pass bf16). Throughput-critical,
accuracy-tolerant contractions (e.g. CLIP towers) keep the default.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

HIGHEST = jax.lax.Precision.HIGHEST


def f32_einsum(subscripts, *operands):
    """einsum with fp32-faithful MXU operands and fp32 accumulation."""
    return jnp.einsum(
        subscripts,
        *operands,
        precision=HIGHEST,
        preferred_element_type=jnp.float32,
    )

"""Inductive zero-shot CLIP baseline: no transduction, u = softmax features
(or text similarities), prediction = argmax
(reference: src/methods/zero_shot/inductive_clip.py:85-129).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..base import TransductiveMethod, init_soft_assignments


class CLIP(TransductiveMethod):
    acc_mode = "direct"

    def _infer(self, task):
        self._log(" ==> Executing inductive CLIP")
        u = init_soft_assignments(task["x_q"], self.args, task.get("text_features"))
        return u, jnp.zeros((1,), jnp.float32)

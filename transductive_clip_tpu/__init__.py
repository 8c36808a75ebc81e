"""transductive_clip_tpu — a TPU-native framework for transductive zero-shot
and few-shot classification with frozen CLIP features.

Re-designed from scratch for TPU (JAX / XLA / Pallas / shard_map): methods are
pure functions (init_state + lax.scan steps) batched over a task axis, with
optional task-data-parallel and class-tensor-parallel sharding over a device
mesh.  Capability parity target: SegoleneMartin/transductive-CLIP (CVPR 2024,
"Transductive zero-shot and few-shot CLIP").
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy top-level conveniences (avoid importing jax at package import)
    if name in ("get_zero_shot_method", "get_few_shot_method",
                "ZERO_SHOT_METHODS", "FEW_SHOT_METHODS"):
        from . import methods

        return getattr(methods, name)
    if name in ("EvaluatorZeroShot", "EvaluatorFewShot"):
        from . import eval as _eval

        return getattr(_eval, name)
    if name == "load_full_config":
        from .core.config import load_full_config

        return load_full_config
    raise AttributeError(name)

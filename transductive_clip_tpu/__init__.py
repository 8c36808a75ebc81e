"""transductive_clip_tpu — a TPU-native framework for transductive zero-shot
and few-shot classification with frozen CLIP features.

Re-designed from scratch for TPU (JAX / XLA / Pallas / shard_map): methods are
pure functions (init_state + lax.scan steps) batched over a task axis, with
optional task-data-parallel and class-tensor-parallel sharding over a device
mesh.  Capability parity target: SegoleneMartin/transductive-CLIP (CVPR 2024,
"Transductive zero-shot and few-shot CLIP").
"""

__version__ = "0.1.0"

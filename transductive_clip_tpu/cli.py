#!/usr/bin/env python
"""CLI entry point.

Mirrors the reference protocol (reference: main.py):

    python main.py --opts shots 0 dataset eurosat method em_dirichlet \
                   number_tasks 1000 batch_size 100 ...

shots > 0 dispatches the few-shot evaluator, shots == 0 the zero-shot one.
The CLIP model is loaded lazily — cache-only evaluations never touch it.
"""

from __future__ import annotations

import argparse
import random

import numpy as np

from transductive_clip_tpu.core.config import load_full_config
from transductive_clip_tpu.core.logger import Logger, get_log_file
from transductive_clip_tpu.eval import EvaluatorFewShot, EvaluatorZeroShot


def parse_args():
    parser = argparse.ArgumentParser(description="transductive_clip_tpu")
    parser.add_argument("--opts", default=None, nargs=argparse.REMAINDER)
    parser.add_argument("--config-root", default="config")
    args = parser.parse_args()
    return load_full_config(opts=args.opts, config_root=args.config_root)


def maybe_load_clip(args):
    """Load the JAX CLIP model only when caches are missing."""
    import os

    from transductive_clip_tpu.eval.extraction import text_cache_path

    if args.shots > 0:
        paths = EvaluatorFewShot(args=args).cache_paths()
    else:
        paths = (EvaluatorZeroShot(args=args).query_cache_path(),)
    need_model = not all(os.path.exists(p) for p in paths)
    if not args.use_softmax_feature:
        # the visual path needs text features for init/matching
        need_model = need_model or not os.path.exists(text_cache_path(args))
    if not need_model:
        return None, None
    from transductive_clip_tpu.models import clip as clip_jax

    # clip_compute: 'bf16' (default, MXU-native) | 'float32'
    # (reference-exact tower numerics)
    dtype_name = str(args.get("clip_compute", "bf16")).strip().lower()
    if dtype_name in ("bf16", "bfloat16"):
        compute_dtype = None               # loader default (bfloat16)
    elif dtype_name in ("float32", "fp32", "f32"):
        import jax.numpy as jnp

        compute_dtype = jnp.float32
    else:
        raise ValueError(
            f"clip_compute must be 'bf16' or 'float32'; got {dtype_name!r}"
        )
    # clip_attention: 'auto' (fused Pallas attention on TPU, XLA elsewhere)
    # | 'fused' | 'xla' (reference-shaped einsum path)
    attn_impl = str(args.get("clip_attention", "auto")).strip().lower()
    if attn_impl not in ("auto", "fused", "xla"):
        raise ValueError(
            f"clip_attention must be 'auto', 'fused' or 'xla'; got {attn_impl!r}"
        )
    # clip_fold_bn: True (default; exact BN-into-conv fold for the frozen
    # ResNet towers) | False (reference-shaped unfolded graph)
    from transductive_clip_tpu.eval.zero_shot import _parse_flag

    fold_bn = _parse_flag(args.get("clip_fold_bn", True), "clip_fold_bn")
    # clip_fused_resnet: auto (fused Pallas identity bottlenecks on TPU when
    # the BN fold is active) | True | False
    fused = args.get("clip_fused_resnet", "auto")
    if fused != "auto":
        fused = _parse_flag(fused, "clip_fused_resnet")
    return clip_jax.load(args.backbone, compute_dtype=compute_dtype,
                         attention_impl=attn_impl, fold_bn=fold_bn,
                         fused_resnet=fused)


def main():
    args = parse_args()
    # persistent XLA compile cache (CPU-feature-fingerprinted): first
    # compiles on a tunneled TPU cost 30-60 s per program; later CLI runs
    # with the same shapes start from the cache
    import jax

    from transductive_clip_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache(jax)
    if args.seed is not None:
        random.seed(args.seed)
        np.random.seed(args.seed)

    log_file = get_log_file(
        log_path=args.log_path, dataset=args.dataset, method=args.name_method
    )
    Logger(__name__, log_file)

    model, preprocess = maybe_load_clip(args)
    if args.shots > 0:
        evaluator = EvaluatorFewShot(args=args, log_file=log_file)
    else:
        evaluator = EvaluatorZeroShot(args=args, log_file=log_file)
    evaluator.run_full_evaluation(model=model, preprocess=preprocess)


if __name__ == "__main__":
    main()

"""Feature extraction glue: ensures the feature caches exist for the
requested splits, running the jitted CLIP towers over the dataset when
needed (reference: src/utils.py:251-377).

Kept separate from the evaluators so that cache-only runs (the common case:
features extracted once, thousands of task evaluations after) never import
the model or data layers.
"""

from __future__ import annotations

import os

import numpy as np

from ..features.cache import (
    save_feature_cache,
    softmax_cache_path,
    visual_cache_path,
)


def _require_model(model, what):
    if model is None:
        raise ValueError(
            f"{what} requires a CLIP model but none was loaded. "
            "Either provide cached features under data/<dataset>/saved_features/ "
            "or load a model (see transductive_clip_tpu.models.clip.load)."
        )


def get_text_features(args, model, classnames=None, template=None):
    """L2-normalized CLIP text prototypes for the dataset's classnames
    (reference: src/utils.py:363-377). Cached per dataset/backbone."""
    root = getattr(args, "root", "data")
    safe_backbone = str(args.backbone).replace("/", "")
    cache = os.path.join(
        root, args.dataset, "saved_features", f"text_{safe_backbone}.plk"
    )
    if os.path.exists(cache):
        from ..core.io import load_pickle

        return np.asarray(load_pickle(cache)["text_features"], np.float32)

    _require_model(model, "Computing text features")
    if classnames is None or template is None:
        from ..data import build_dataset

        dataset = build_dataset(args.dataset, args.dataset_path)
        classnames, template = dataset.classnames, dataset.template
    prompts = [template.format(c.replace("_", " ")) for c in classnames]
    # np.array (copy): encoders may return read-only views of device arrays
    text_features = np.array(model.encode_text_prompts(prompts), np.float32)
    text_features /= np.linalg.norm(text_features, axis=-1, keepdims=True)

    from ..core.io import save_pickle

    os.makedirs(os.path.dirname(cache), exist_ok=True)
    save_pickle(cache, {"text_features": text_features})
    return text_features


def ensure_features(args, model, preprocess=None, splits=("test",)):
    """Extract and cache features for each split whose cache is missing."""
    root = getattr(args, "root", "data")
    missing = []
    for split in splits:
        if args.use_softmax_feature:
            path = softmax_cache_path(args.dataset, split, args.backbone, args.T, root=root)
        else:
            path = visual_cache_path(args.dataset, split, args.backbone, root=root)
        if not os.path.exists(path):
            missing.append((split, path))
    if not missing:
        return

    _require_model(model, "Feature extraction")
    from ..data import build_dataset, iter_image_batches

    dataset = build_dataset(args.dataset, args.dataset_path)
    text_features = None
    if args.use_softmax_feature:
        text_features = get_text_features(
            args, model, dataset.classnames, dataset.template
        )

    split_sources = {
        "train": dataset.train_x,
        "val": dataset.val,
        "test": dataset.test,
    }
    for split, path in missing:
        feats, labels = [], []
        for images, batch_labels in iter_image_batches(
            split_sources[split], preprocess=preprocess,
            batch_size=getattr(args, "extract_batch_size", 256),
        ):
            image_features = np.array(model.encode_image_batch(images), np.float32)
            image_features /= np.linalg.norm(image_features, axis=-1, keepdims=True)
            if args.use_softmax_feature:
                logits = args.T * image_features @ text_features.T
                logits -= logits.max(axis=-1, keepdims=True)
                e = np.exp(logits)
                feats.append(e / e.sum(axis=-1, keepdims=True))
            else:
                feats.append(image_features)
            labels.append(np.asarray(batch_labels))
        save_feature_cache(path, np.concatenate(feats), np.concatenate(labels))

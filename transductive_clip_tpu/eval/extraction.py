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


def text_cache_path(args):
    """Cache path for the text prototypes (shared with main.maybe_load_clip's
    need-model check so the two can never disagree)."""
    safe_backbone = str(args.backbone).replace("/", "")
    return os.path.join(
        getattr(args, "root", "data"), args.dataset, "saved_features",
        f"text_{safe_backbone}.plk",
    )


def get_text_features(args, model, classnames=None, template=None):
    """L2-normalized CLIP text prototypes for the dataset's classnames
    (reference: src/utils.py:363-377). Cached per dataset/backbone."""
    cache = text_cache_path(args)
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


def ensure_features(args, model, preprocess=None, splits=("test",), list_T=None):
    """Extract and cache features for each split whose cache is missing.

    ``list_T`` extracts softmax features for several temperatures in one
    pass over the images (the reference supports list_T=[10,20,30,40,50];
    reference: src/utils.py:251-264). Defaults to [args.T].
    """
    root = getattr(args, "root", "data")
    store = str(args.get("feature_store", "plk"))
    if list_T is None:
        list_T = [args.T]
    missing = []
    for split in splits:
        if args.use_softmax_feature:
            for T in list_T:
                path = softmax_cache_path(args.dataset, split, args.backbone, T, root=root, store=store)
                if not os.path.exists(path):
                    missing.append((split, T, path))
        else:
            path = visual_cache_path(args.dataset, split, args.backbone, root=root, store=store)
            if not os.path.exists(path):
                missing.append((split, None, path))
    if not missing:
        return

    _require_model(model, "Feature extraction")
    from ..data import build_dataset, iter_image_batches

    # batch-DP: shard image batches across all local devices for the jitted
    # CLIP forward (single-device runs are unaffected)
    if getattr(model, "set_mesh", None) is not None and model.mesh is None:
        import jax

        if len(jax.devices()) > 1:
            from ..parallel import make_mesh

            model.set_mesh(make_mesh(tp=1))

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
    # one image pass per split, all temperatures computed from the same
    # normalized embeddings
    by_split = {}
    for split, T, path in missing:
        by_split.setdefault(split, []).append((T, path))
    for split, targets in by_split.items():
        # dispatch every batch asynchronously (jax overlaps the host->device
        # image transfer of batch i+1 with the encode of batch i); embeddings
        # are tiny, so holding them all on device until the end is cheap
        pending = []
        labels = []
        for images, batch_labels in iter_image_batches(
            split_sources[split], preprocess=preprocess,
            batch_size=getattr(args, "extract_batch_size", 512),
        ):
            pending.append(model.encode_image_batch(images))
            labels.append(np.asarray(batch_labels))
        # ONE combined device_get for every batch: each separate np.array(p)
        # is a blocking transfer paying a full tunnel round trip (thousands
        # of RTTs over an ImageNet split)
        import jax

        pending = jax.device_get(pending)
        embeddings = np.concatenate(
            [np.asarray(p, np.float32) for p in pending])
        embeddings /= np.linalg.norm(embeddings, axis=-1, keepdims=True)
        all_labels = np.concatenate(labels)
        for T, path in targets:
            if T is None:
                out = embeddings
            else:
                # in-place softmax: one [N, n_class] buffer instead of three
                # (logits/exp/normalized are ~5 GB each at ImageNet scale)
                out = embeddings @ text_features.T
                out *= T
                out -= out.max(axis=-1, keepdims=True)
                np.exp(out, out=out)
                out /= out.sum(axis=-1, keepdims=True)
            save_feature_cache(path, out, all_labels)

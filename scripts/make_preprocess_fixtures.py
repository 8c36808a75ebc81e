#!/usr/bin/env python
"""Generate golden fixtures for the CLIP eval preprocessing pipeline.

The reference preprocesses with ``clip.load``'s torchvision transform chain
(reference: src/datasets/utils.py:266-313 consuming the transform built in
OpenAI clip's _transform): Resize(224, BICUBIC) -> CenterCrop(224) ->
convert RGB -> ToTensor -> Normalize. Our host pipeline
(models/clip/preprocess.py) replicates those semantics with PIL alone; the
fixtures pin its output bytes at size combinations that exercise every
rounding branch (even/odd post-resize differences, including the
d % 4 == 3 case where torchvision's int(round(d/2)) differs from d//2).

When torchvision is installed (it is NOT in this environment) the script
instead generates the fixtures through the actual torchvision pipeline and
verifies our implementation against them — run it wherever torchvision
exists to upgrade the fixtures from regression pins to ground truth. The
provenance is recorded in the npz.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from transductive_clip_tpu.models.clip.preprocess import make_preprocess

# (width, height) inputs covering the rounding branches at image_size=64:
#   - square, no crop
#   - portrait/landscape with even post-resize difference
#   - d % 4 == 1 and d % 4 == 3 odd differences (crop offset rounding)
#   - short-side-already-64 (resize long-side truncation only)
SIZES = [(64, 64), (64, 80), (96, 64), (70, 93), (93, 70), (64, 67),
         (67, 64), (128, 74), (74, 128)]
IMAGE_SIZE = 64
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                   "tests", "fixtures", "preprocess_golden.npz")


def torchvision_reference(img, image_size):
    """The reference's exact pipeline, requires torchvision."""
    from torchvision.transforms import (CenterCrop, Compose, InterpolationMode,
                                        Normalize, Resize, ToTensor)

    tf = Compose([
        Resize(image_size, interpolation=InterpolationMode.BICUBIC),
        CenterCrop(image_size),
        lambda im: im.convert("RGB"),
        ToTensor(),
        Normalize((0.48145466, 0.4578275, 0.40821073),
                  (0.26862954, 0.26130258, 0.27577711)),
    ])
    return tf(img).numpy().transpose(1, 2, 0)  # CHW -> HWC


def main():
    from PIL import Image

    try:
        import torchvision  # noqa: F401

        have_tv = True
    except ImportError:
        have_tv = False

    rng = np.random.default_rng(20240817)
    pre_f32 = make_preprocess(IMAGE_SIZE, dtype="float32")
    pre_u8 = make_preprocess(IMAGE_SIZE, dtype="uint8")

    out = {"provenance": np.array(
        "torchvision" if have_tv else "pil-analytic"), "image_size":
        np.array(IMAGE_SIZE)}
    for i, (w, h) in enumerate(SIZES):
        arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        img = Image.fromarray(arr)
        ours = pre_f32(img)
        out[f"in_{i}"] = arr
        out[f"f32_{i}"] = ours
        out[f"u8_{i}"] = pre_u8(Image.fromarray(arr))
        if have_tv:
            ref = torchvision_reference(Image.fromarray(arr), IMAGE_SIZE)
            np.testing.assert_allclose(
                ours, ref, atol=1e-6,
                err_msg=f"size {(w, h)}: our pipeline != torchvision",
            )
            print(f"size {(w, h)}: torchvision-verified")
        else:
            print(f"size {(w, h)}: pinned (torchvision absent)")
    np.savez_compressed(OUT, **out)
    print(f"wrote {os.path.normpath(OUT)} (provenance: "
          f"{'torchvision' if have_tv else 'pil-analytic'})")


if __name__ == "__main__":
    main()

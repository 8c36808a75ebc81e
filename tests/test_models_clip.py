import numpy as np
import pytest

import jax
import jax.numpy as jnp

from transductive_clip_tpu.models.clip import (
    CLIP_CONFIGS,
    CLIPModule,
    init_random_params,
)
from transductive_clip_tpu.models.clip.config import (
    CLIPConfig,
    CLIPTextConfig,
    CLIPVisionConfig,
)

TINY_VIT = CLIPConfig(
    name="tiny-vit",
    embed_dim=32,
    vision=CLIPVisionConfig(image_size=64, patch_size=16, width=48, layers=2, heads=4),
    text=CLIPTextConfig(vocab_size=512, context_length=16, width=32, layers=2, heads=4),
)
TINY_RN = CLIPConfig(
    name="tiny-rn",
    embed_dim=32,
    vision=CLIPVisionConfig(
        image_size=64, width=16, heads=4, is_resnet=True, resnet_layers=(1, 1, 1, 1)
    ),
    text=CLIPTextConfig(vocab_size=512, context_length=16, width=32, layers=2, heads=4),
)


@pytest.mark.parametrize("cfg", [TINY_VIT, TINY_RN], ids=["vit", "resnet"])
def test_towers_shapes_and_determinism(cfg):
    params = init_random_params(cfg, seed=0)
    module = CLIPModule(cfg)
    images = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, cfg.vision.image_size,
                                               cfg.vision.image_size, 3)),
        jnp.float32,
    )
    tokens = jnp.zeros((3, cfg.text.context_length), jnp.int32)
    tokens = tokens.at[:, 0].set(1)
    tokens = tokens.at[:, 5].set(cfg.text.vocab_size - 1)  # eot = max id

    img = module.apply(params, images, method=CLIPModule.encode_image)
    txt = module.apply(params, tokens, method=CLIPModule.encode_text)
    assert img.shape == (2, cfg.embed_dim)
    assert txt.shape == (3, cfg.embed_dim)
    assert np.isfinite(np.asarray(img)).all()
    assert np.isfinite(np.asarray(txt)).all()

    img2 = module.apply(params, images, method=CLIPModule.encode_image)
    np.testing.assert_array_equal(np.asarray(img), np.asarray(img2))

    logits = module.apply(params, images, tokens)
    assert logits.shape == (2, 3)


def test_text_eot_pooling_ignores_padding():
    """Moving the padding content must not change the pooled embedding the
    causal transformer produces at the EOT position."""
    cfg = TINY_VIT
    params = init_random_params(cfg, seed=0)
    module = CLIPModule(cfg)
    t1 = jnp.zeros((1, cfg.text.context_length), jnp.int32)
    t1 = t1.at[:, 0].set(1).at[:, 1].set(7).at[:, 2].set(cfg.text.vocab_size - 1)
    t2 = t1.at[:, 10].set(3)  # padding after EOT differs
    e1 = module.apply(params, t1, method=CLIPModule.encode_text)
    e2 = module.apply(params, t2, method=CLIPModule.encode_text)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-6)


@pytest.mark.slow
def test_param_count_rn50():
    """RN50 CLIP has ~102M params; a big structural error would change this."""
    params = init_random_params(CLIP_CONFIGS["RN50"], seed=0)
    n = sum(x.size for x in jax.tree.leaves(params))
    assert 95e6 < n < 110e6, n


@pytest.mark.slow
def test_param_count_vit_b16():
    """ViT-B/16 CLIP has ~149M params."""
    params = init_random_params(CLIP_CONFIGS["ViT-B/16"], seed=0)
    n = sum(x.size for x in jax.tree.leaves(params))
    assert 140e6 < n < 160e6, n


def test_full_openai_family_architectures():
    """Every OpenAI clip.load backbone has a config whose towers wire up to
    the right embedding dim (shape-level only: jax.eval_shape runs no FLOPs,
    so even RN50x64 is cheap). Reference loads these via clip.load
    (main.py:50)."""
    from transductive_clip_tpu.models.clip import CLIP_CONFIGS

    expected_dims = {
        "RN50": 1024, "RN101": 512, "RN50x4": 640, "RN50x16": 768,
        "RN50x64": 1024, "ViT-B/16": 512, "ViT-B/32": 512,
        "ViT-L/14": 768, "ViT-L/14@336px": 768,
    }
    assert set(CLIP_CONFIGS) == set(expected_dims)
    for name, cfg in CLIP_CONFIGS.items():
        module = CLIPModule(cfg)
        images = jax.ShapeDtypeStruct(
            (2, cfg.vision.image_size, cfg.vision.image_size, 3), jnp.float32
        )
        tokens = jax.ShapeDtypeStruct((2, cfg.text.context_length), jnp.int32)
        params = jax.eval_shape(
            lambda i, t, m=module: m.init(jax.random.PRNGKey(0), i, t),
            images, tokens,
        )
        img = jax.eval_shape(
            lambda p, i, m=module: m.apply(p, i, method=CLIPModule.encode_image),
            params, images,
        )
        txt = jax.eval_shape(
            lambda p, t, m=module: m.apply(p, t, method=CLIPModule.encode_text),
            params, tokens,
        )
        assert img.shape == (2, expected_dims[name]), name
        assert txt.shape == (2, expected_dims[name]), name

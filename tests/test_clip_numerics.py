"""Value-level CLIP tower verification.

The whole framework consumes CLIP features (reference: src/utils.py:289-290,
363-377 — the reference gets bit-correct towers from the `clip` wheel). Here
the Flax towers, fed a synthetic OpenAI-layout checkpoint through the real
converter, must reproduce the outputs of an independent torch implementation
(tests/torch_clip.py) to fp32 tolerance. Covers: fused-qkv attention,
QuickGELU, LN epsilon, class-token + positional embeddings, causal mask, EOT
pooling, projections, frozen BN, anti-aliased strides, and attnpool.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

import torch_clip
from test_convert import TINY_RN, TINY_VIT

from transductive_clip_tpu.models.clip import CLIPModule
from transductive_clip_tpu.models.clip.convert import convert_openai_checkpoint

TOL = dict(rtol=1e-4, atol=1e-4)


def _converted(tmp_path, cfg, seed=0):
    sd = torch_clip.synth_state_dict(cfg, seed=seed)
    path = str(tmp_path / "ckpt.pt")
    torch.save(sd, path)
    return sd, convert_openai_checkpoint(path, cfg)


@pytest.mark.parametrize("cfg", [TINY_VIT, TINY_RN], ids=["vit", "resnet"])
def test_image_tower_matches_torch(tmp_path, cfg):
    sd, params = _converted(tmp_path, cfg)
    rng = np.random.default_rng(0)
    imgs = rng.normal(size=(3, cfg.vision.image_size, cfg.vision.image_size, 3))
    imgs = imgs.astype(np.float32)

    with torch.no_grad():
        want = torch_clip.encode_image(
            sd, cfg, torch.from_numpy(imgs.transpose(0, 3, 1, 2))
        ).numpy()

    got = np.asarray(
        CLIPModule(cfg).apply(
            params, jnp.asarray(imgs), method=CLIPModule.encode_image
        )
    )
    assert got.shape == want.shape == (3, cfg.embed_dim)
    np.testing.assert_allclose(got, want, **TOL)


@pytest.mark.parametrize("cfg", [TINY_VIT, TINY_RN], ids=["vit", "resnet"])
def test_text_tower_matches_torch(tmp_path, cfg):
    sd, params = _converted(tmp_path, cfg)
    tc = cfg.text
    rng = np.random.default_rng(1)
    # CLIP-like sequences: SOT, body, EOT(= highest id), pad zeros
    tokens = np.zeros((4, tc.context_length), np.int64)
    for i in range(4):
        n_body = int(rng.integers(1, tc.context_length - 2))
        tokens[i, 0] = tc.vocab_size - 2                 # SOT
        tokens[i, 1:1 + n_body] = rng.integers(1, tc.vocab_size - 2, n_body)
        tokens[i, 1 + n_body] = tc.vocab_size - 1        # EOT (argmax pool)

    with torch.no_grad():
        want = torch_clip.encode_text(sd, cfg, torch.from_numpy(tokens)).numpy()

    got = np.asarray(
        CLIPModule(cfg).apply(
            params, jnp.asarray(tokens, jnp.int32),
            method=CLIPModule.encode_text,
        )
    )
    assert got.shape == want.shape == (4, cfg.embed_dim)
    np.testing.assert_allclose(got, want, **TOL)


def test_folded_bn_resnet_matches_unfolded_and_torch(tmp_path):
    """fold_resnet_params is an exact rewrite: the fold_bn=True tower on
    folded weights must match both the unfolded Flax tower and the torch
    reimplementation (reference towers keep BN separate; the fold is a
    TPU-side optimization that must not change a single feature)."""
    from transductive_clip_tpu.models.clip.resnet import fold_resnet_params

    cfg = TINY_RN
    sd, params = _converted(tmp_path, cfg)
    rng = np.random.default_rng(3)
    imgs = rng.normal(
        size=(3, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)

    unfolded = np.asarray(
        CLIPModule(cfg).apply(
            params, jnp.asarray(imgs), method=CLIPModule.encode_image
        )
    )
    folded_params = {"params": dict(params["params"])}
    folded_params["params"]["visual"] = fold_resnet_params(
        params["params"]["visual"]
    )
    folded = np.asarray(
        CLIPModule(cfg, fold_bn=True).apply(
            folded_params, jnp.asarray(imgs), method=CLIPModule.encode_image
        )
    )
    np.testing.assert_allclose(folded, unfolded, rtol=3e-5, atol=3e-5)

    with torch.no_grad():
        want = torch_clip.encode_image(
            sd, cfg, torch.from_numpy(imgs.transpose(0, 3, 1, 2))
        ).numpy()
    np.testing.assert_allclose(folded, want, **TOL)


def test_jaxclip_folds_by_default(tmp_path):
    """JaxCLIP(fold_bn=True) (the default) must produce the same embeddings
    as the unfolded reference-shaped graph through the public encode API."""
    from transductive_clip_tpu.models.clip import JaxCLIP

    cfg = TINY_RN
    _, params = _converted(tmp_path, cfg)
    rng = np.random.default_rng(4)
    imgs = rng.normal(
        size=(2, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)
    fast = JaxCLIP(cfg, params, compute_dtype=jnp.float32)
    assert fast.fold_bn
    slow = JaxCLIP(cfg, params, compute_dtype=jnp.float32, fold_bn=False)
    np.testing.assert_allclose(
        np.asarray(fast.encode_image_batch(imgs)),
        np.asarray(slow.encode_image_batch(imgs)),
        rtol=3e-5, atol=3e-5,
    )


def test_softmax_features_match_torch(tmp_path):
    """End-to-end softmax-feature parity: the exact transform the reference
    applies (reference: src/utils.py:281-297) computed from both stacks."""
    cfg = TINY_VIT
    sd, params = _converted(tmp_path, cfg)
    rng = np.random.default_rng(2)
    imgs = rng.normal(
        size=(2, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)
    n_class, T = 5, 30.0
    tokens = np.zeros((n_class, cfg.text.context_length), np.int64)
    tokens[:, 0] = cfg.text.vocab_size - 2
    tokens[:, 1] = rng.integers(1, cfg.text.vocab_size - 2, n_class)
    tokens[:, 2] = cfg.text.vocab_size - 1

    with torch.no_grad():
        f = torch_clip.encode_image(
            sd, cfg, torch.from_numpy(imgs.transpose(0, 3, 1, 2)))
        w = torch_clip.encode_text(sd, cfg, torch.from_numpy(tokens))
        f = f / f.norm(dim=-1, keepdim=True)
        w = w / w.norm(dim=-1, keepdim=True)
        want = (T * f @ w.T).softmax(dim=-1).numpy()

    import jax

    module = CLIPModule(cfg)
    fj = module.apply(params, jnp.asarray(imgs), method=CLIPModule.encode_image)
    wj = module.apply(params, jnp.asarray(tokens, jnp.int32),
                      method=CLIPModule.encode_text)
    fj = fj / jnp.linalg.norm(fj, axis=-1, keepdims=True)
    wj = wj / jnp.linalg.norm(wj, axis=-1, keepdims=True)
    got = np.asarray(jax.nn.softmax(T * fj @ wj.T, axis=-1))
    np.testing.assert_allclose(got, want, **TOL)

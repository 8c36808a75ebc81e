"""Checkpoint converter round-trip: build a synthetic torch state dict with
the OpenAI CLIP key layout, convert to Flax params, and check the tree
structure matches what CLIPModule.init produces (so real checkpoints load
without key errors)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax

from transductive_clip_tpu.models.clip import CLIPModule, init_random_params
from transductive_clip_tpu.models.clip.config import (
    CLIPConfig,
    CLIPTextConfig,
    CLIPVisionConfig,
)
from transductive_clip_tpu.models.clip.convert import convert_openai_checkpoint

TINY_VIT = CLIPConfig(
    name="tiny-vit", embed_dim=16,
    vision=CLIPVisionConfig(image_size=32, patch_size=16, width=24, layers=2, heads=4),
    text=CLIPTextConfig(vocab_size=64, context_length=8, width=16, layers=2, heads=4),
)
TINY_RN = CLIPConfig(
    name="tiny-rn", embed_dim=16,
    vision=CLIPVisionConfig(image_size=32, width=8, heads=4, is_resnet=True,
                            resnet_layers=(1, 1, 1, 1)),
    text=CLIPTextConfig(vocab_size=64, context_length=8, width=16, layers=2, heads=4),
)


def synth_state_dict(cfg):
    """Torch tensors keyed like an OpenAI CLIP checkpoint."""
    g = torch.Generator().manual_seed(0)
    sd = {}

    def t(*shape):
        return torch.randn(*shape, generator=g)

    def add_transformer(prefix, width, layers):
        for i in range(layers):
            p = f"{prefix}.resblocks.{i}"
            sd[f"{p}.ln_1.weight"] = t(width)
            sd[f"{p}.ln_1.bias"] = t(width)
            sd[f"{p}.ln_2.weight"] = t(width)
            sd[f"{p}.ln_2.bias"] = t(width)
            sd[f"{p}.attn.in_proj_weight"] = t(3 * width, width)
            sd[f"{p}.attn.in_proj_bias"] = t(3 * width)
            sd[f"{p}.attn.out_proj.weight"] = t(width, width)
            sd[f"{p}.attn.out_proj.bias"] = t(width)
            sd[f"{p}.mlp.c_fc.weight"] = t(4 * width, width)
            sd[f"{p}.mlp.c_fc.bias"] = t(4 * width)
            sd[f"{p}.mlp.c_proj.weight"] = t(width, 4 * width)
            sd[f"{p}.mlp.c_proj.bias"] = t(width)

    v = cfg.vision
    if v.is_resnet:
        w = v.width

        def add_bn(prefix, ch):
            sd[f"{prefix}.weight"] = t(ch)
            sd[f"{prefix}.bias"] = t(ch)
            sd[f"{prefix}.running_mean"] = t(ch)
            sd[f"{prefix}.running_var"] = torch.rand(ch, generator=g) + 0.5

        sd["visual.conv1.weight"] = t(w // 2, 3, 3, 3)
        add_bn("visual.bn1", w // 2)
        sd["visual.conv2.weight"] = t(w // 2, w // 2, 3, 3)
        add_bn("visual.bn2", w // 2)
        sd["visual.conv3.weight"] = t(w, w // 2, 3, 3)
        add_bn("visual.bn3", w)
        in_ch = w
        planes = w
        for stage, blocks in enumerate(v.resnet_layers):
            for b in range(blocks):
                p = f"visual.layer{stage + 1}.{b}"
                sd[f"{p}.conv1.weight"] = t(planes, in_ch, 1, 1)
                add_bn(f"{p}.bn1", planes)
                sd[f"{p}.conv2.weight"] = t(planes, planes, 3, 3)
                add_bn(f"{p}.bn2", planes)
                sd[f"{p}.conv3.weight"] = t(planes * 4, planes, 1, 1)
                add_bn(f"{p}.bn3", planes * 4)
                if b == 0:
                    sd[f"{p}.downsample.1.weight"] = t(planes * 4, in_ch, 1, 1)
                    add_bn(f"{p}.downsample.2", planes * 4)
                in_ch = planes * 4
            planes *= 2
        c = w * 32
        sd["visual.attnpool.positional_embedding"] = t((v.image_size // 32) ** 2 + 1, c)
        for proj, out in [("q_proj", c), ("k_proj", c), ("v_proj", c),
                          ("c_proj", cfg.embed_dim)]:
            sd[f"visual.attnpool.{proj}.weight"] = t(out, c)
            sd[f"visual.attnpool.{proj}.bias"] = t(out)
    else:
        sd["visual.conv1.weight"] = t(v.width, 3, v.patch_size, v.patch_size)
        sd["visual.class_embedding"] = t(v.width)
        n_tok = (v.image_size // v.patch_size) ** 2 + 1
        sd["visual.positional_embedding"] = t(n_tok, v.width)
        sd["visual.ln_pre.weight"] = t(v.width)
        sd["visual.ln_pre.bias"] = t(v.width)
        add_transformer("visual.transformer", v.width, v.layers)
        sd["visual.ln_post.weight"] = t(v.width)
        sd["visual.ln_post.bias"] = t(v.width)
        sd["visual.proj"] = t(v.width, cfg.embed_dim)

    tc = cfg.text
    sd["token_embedding.weight"] = t(tc.vocab_size, tc.width)
    sd["positional_embedding"] = t(tc.context_length, tc.width)
    add_transformer("transformer", tc.width, tc.layers)
    sd["ln_final.weight"] = t(tc.width)
    sd["ln_final.bias"] = t(tc.width)
    sd["text_projection"] = t(tc.width, cfg.embed_dim)
    sd["logit_scale"] = torch.tensor(2.6593)
    return sd


def tree_paths(tree, prefix=()):
    out = set()
    for k, v in tree.items():
        if isinstance(v, dict):
            out |= tree_paths(v, prefix + (k,))
        else:
            out.add((prefix + (k,), tuple(np.shape(v))))
    return out


@pytest.mark.parametrize("cfg", [TINY_VIT, TINY_RN], ids=["vit", "resnet"])
def test_convert_structure_matches_init(tmp_path, cfg):
    sd = synth_state_dict(cfg)
    path = str(tmp_path / "ckpt.pt")
    torch.save(sd, path)

    params = convert_openai_checkpoint(path, cfg)
    want = init_random_params(cfg, seed=0)
    got_paths = tree_paths(params["params"])
    want_paths = tree_paths(want["params"])
    assert got_paths == want_paths, (
        f"missing: {sorted(want_paths - got_paths)[:4]} "
        f"extra: {sorted(got_paths - want_paths)[:4]}"
    )

    # the converted params must run through the module
    module = CLIPModule(cfg)
    import jax.numpy as jnp

    img = module.apply(params, jnp.zeros(
        (1, cfg.vision.image_size, cfg.vision.image_size, 3), jnp.float32),
        method=CLIPModule.encode_image)
    assert img.shape == (1, cfg.embed_dim)
    assert np.isfinite(np.asarray(img)).all()

"""OpenAI CLIP checkpoint -> Flax parameter conversion.

Handles both TorchScript archives (what openai/CLIP ships) and plain state
dicts. torch is used CPU-only and only at conversion time; the converted
params are pure numpy/jax arrays.
"""

from __future__ import annotations

import numpy as np


def _load_state_dict(path):
    import torch

    try:
        model = torch.jit.load(path, map_location="cpu")
        sd = model.state_dict()
    except Exception:
        obj = torch.load(path, map_location="cpu", weights_only=False)
        sd = obj.state_dict() if hasattr(obj, "state_dict") else obj
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


def _dense(sd, prefix):
    return {
        "kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].T),
        "bias": sd[f"{prefix}.bias"],
    }


def _ln(sd, prefix):
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _conv(sd, key):
    # torch [out, in, kh, kw] -> flax [kh, kw, in, out]
    return {"kernel": np.ascontiguousarray(sd[key].transpose(2, 3, 1, 0))}


def _bn(sd, prefix):
    return {
        "scale": sd[f"{prefix}.weight"],
        "bias": sd[f"{prefix}.bias"],
        "mean": sd[f"{prefix}.running_mean"],
        "var": sd[f"{prefix}.running_var"],
    }


def _attn(sd, prefix):
    return {
        "in_proj": {
            "kernel": np.ascontiguousarray(sd[f"{prefix}.in_proj_weight"].T),
            "bias": sd[f"{prefix}.in_proj_bias"],
        },
        "out_proj": _dense(sd, f"{prefix}.out_proj"),
    }


def _transformer(sd, prefix, layers):
    out = {}
    for i in range(layers):
        p = f"{prefix}.resblocks.{i}"
        out[f"resblock_{i}"] = {
            "ln_1": _ln(sd, f"{p}.ln_1"),
            "ln_2": _ln(sd, f"{p}.ln_2"),
            "attn": _attn(sd, f"{p}.attn"),
            "c_fc": _dense(sd, f"{p}.mlp.c_fc"),
            "c_proj": _dense(sd, f"{p}.mlp.c_proj"),
        }
    return out


def _vit_params(sd, cfg):
    return {
        "conv1": _conv(sd, "visual.conv1.weight"),
        "class_embedding": sd["visual.class_embedding"],
        "positional_embedding": sd["visual.positional_embedding"],
        "ln_pre": _ln(sd, "visual.ln_pre"),
        "transformer": _transformer(sd, "visual.transformer", cfg.vision.layers),
        "ln_post": _ln(sd, "visual.ln_post"),
        "proj": sd["visual.proj"],
    }


def _resnet_params(sd, cfg):
    out = {
        "conv1": _conv(sd, "visual.conv1.weight"),
        "bn1": _bn(sd, "visual.bn1"),
        "conv2": _conv(sd, "visual.conv2.weight"),
        "bn2": _bn(sd, "visual.bn2"),
        "conv3": _conv(sd, "visual.conv3.weight"),
        "bn3": _bn(sd, "visual.bn3"),
    }
    for stage, blocks in enumerate(cfg.vision.resnet_layers):
        for b in range(blocks):
            p = f"visual.layer{stage + 1}.{b}"
            blk = {
                "conv1": _conv(sd, f"{p}.conv1.weight"),
                "bn1": _bn(sd, f"{p}.bn1"),
                "conv2": _conv(sd, f"{p}.conv2.weight"),
                "bn2": _bn(sd, f"{p}.bn2"),
                "conv3": _conv(sd, f"{p}.conv3.weight"),
                "bn3": _bn(sd, f"{p}.bn3"),
            }
            # OpenAI's downsample is Sequential(("-1", AvgPool), ("0", Conv),
            # ("1", BN)) -> state-dict keys downsample.0 (conv), .1 (bn)
            if f"{p}.downsample.0.weight" in sd:
                blk["downsample_conv"] = _conv(sd, f"{p}.downsample.0.weight")
                blk["downsample_bn"] = _bn(sd, f"{p}.downsample.1")
            out[f"layer{stage + 1}_{b}"] = blk
    out["attnpool"] = {
        "positional_embedding": sd["visual.attnpool.positional_embedding"],
        "q_proj": _dense(sd, "visual.attnpool.q_proj"),
        "k_proj": _dense(sd, "visual.attnpool.k_proj"),
        "v_proj": _dense(sd, "visual.attnpool.v_proj"),
        "c_proj": _dense(sd, "visual.attnpool.c_proj"),
    }
    return out


def convert_openai_checkpoint(path, cfg):
    """Returns a flax params pytree {'params': {...}} for CLIPModule."""
    sd = _load_state_dict(path)
    visual = (
        _resnet_params(sd, cfg) if cfg.vision.is_resnet else _vit_params(sd, cfg)
    )
    text = {
        "token_embedding": sd["token_embedding.weight"],
        "positional_embedding": sd["positional_embedding"],
        "transformer": _transformer(sd, "transformer", cfg.text.layers),
        "ln_final": _ln(sd, "ln_final"),
        "text_projection": sd["text_projection"],
    }
    params = {
        "visual": visual,
        "text": text,
        "logit_scale": sd["logit_scale"],
    }
    return {"params": _to_f32(params)}


def _to_f32(tree):
    if isinstance(tree, dict):
        return {k: _to_f32(v) for k, v in tree.items()}
    return np.asarray(tree, np.float32)

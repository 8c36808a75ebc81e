"""Independent PyTorch oracle of the OpenAI CLIP forward pass.

Written from the published architecture description (CLIP paper §2 +
the openai/CLIP model card): ViT with pre-LN residual blocks, fused-qkv
attention and QuickGELU; ModifiedResNet with the 3-conv stem,
anti-aliasing avg-pools and attention pooling; text transformer with a
causal mask and EOT (argmax token id) pooling. Purely functional — every
op reads tensors straight from an OpenAI-layout state dict, so this file
doubles as an executable spec of the checkpoint format the converter
(transductive_clip_tpu/models/clip/convert.py) must consume.

This is the value-level ground truth for tests/test_clip_numerics.py:
the Flax towers fed the converted params must reproduce these outputs.
"""

from __future__ import annotations

import torch
import torch.nn.functional as F

LN_EPS = 1e-5
BN_EPS = 1e-5


# ---------------------------------------------------------------- state dict


def synth_state_dict(cfg, seed=0):
    """Random torch tensors keyed exactly like an OpenAI CLIP checkpoint,
    scaled so activations stay O(1) through the full depth (needed for a
    meaningful fp32 value comparison)."""
    g = torch.Generator().manual_seed(seed)
    sd = {}

    def mat(*shape):
        fan_in = shape[-1]
        return torch.randn(*shape, generator=g) * fan_in ** -0.5

    def vec(n, std=0.02):
        return torch.randn(n, generator=g) * std

    def ln(prefix, n):
        sd[f"{prefix}.weight"] = 1.0 + vec(n, 0.05)
        sd[f"{prefix}.bias"] = vec(n)

    def add_transformer(prefix, width, layers):
        for i in range(layers):
            p = f"{prefix}.resblocks.{i}"
            ln(f"{p}.ln_1", width)
            ln(f"{p}.ln_2", width)
            sd[f"{p}.attn.in_proj_weight"] = mat(3 * width, width)
            sd[f"{p}.attn.in_proj_bias"] = vec(3 * width)
            sd[f"{p}.attn.out_proj.weight"] = mat(width, width)
            sd[f"{p}.attn.out_proj.bias"] = vec(width)
            sd[f"{p}.mlp.c_fc.weight"] = mat(4 * width, width)
            sd[f"{p}.mlp.c_fc.bias"] = vec(4 * width)
            sd[f"{p}.mlp.c_proj.weight"] = mat(width, 4 * width)
            sd[f"{p}.mlp.c_proj.bias"] = vec(width)

    v = cfg.vision
    if v.is_resnet:
        w = v.width

        def bn(prefix, ch):
            sd[f"{prefix}.weight"] = 1.0 + vec(ch, 0.05)
            sd[f"{prefix}.bias"] = vec(ch)
            sd[f"{prefix}.running_mean"] = vec(ch, 0.1)
            sd[f"{prefix}.running_var"] = torch.rand(ch, generator=g) + 0.5

        def conv(key, out_ch, in_ch, k):
            sd[key] = torch.randn(out_ch, in_ch, k, k, generator=g) * (
                (in_ch * k * k) ** -0.5
            )

        conv("visual.conv1.weight", w // 2, 3, 3)
        bn("visual.bn1", w // 2)
        conv("visual.conv2.weight", w // 2, w // 2, 3)
        bn("visual.bn2", w // 2)
        conv("visual.conv3.weight", w, w // 2, 3)
        bn("visual.bn3", w)
        in_ch = w
        planes = w
        for stage, blocks in enumerate(v.resnet_layers):
            for b in range(blocks):
                p = f"visual.layer{stage + 1}.{b}"
                conv(f"{p}.conv1.weight", planes, in_ch, 1)
                bn(f"{p}.bn1", planes)
                conv(f"{p}.conv2.weight", planes, planes, 3)
                bn(f"{p}.bn2", planes)
                conv(f"{p}.conv3.weight", planes * 4, planes, 1)
                bn(f"{p}.bn3", planes * 4)
                if b == 0:
                    # Sequential(("-1", AvgPool), ("0", Conv), ("1", BN))
                    conv(f"{p}.downsample.0.weight", planes * 4, in_ch, 1)
                    bn(f"{p}.downsample.1", planes * 4)
                in_ch = planes * 4
            planes *= 2
        c = w * 32
        n_tok = (v.image_size // 32) ** 2 + 1
        sd["visual.attnpool.positional_embedding"] = mat(n_tok, c)
        for proj, out in [("q_proj", c), ("k_proj", c), ("v_proj", c),
                          ("c_proj", cfg.embed_dim)]:
            sd[f"visual.attnpool.{proj}.weight"] = mat(out, c)
            sd[f"visual.attnpool.{proj}.bias"] = vec(out)
    else:
        sd["visual.conv1.weight"] = torch.randn(
            v.width, 3, v.patch_size, v.patch_size, generator=g
        ) * ((3 * v.patch_size ** 2) ** -0.5)
        sd["visual.class_embedding"] = vec(v.width, v.width ** -0.5)
        n_tok = (v.image_size // v.patch_size) ** 2 + 1
        sd["visual.positional_embedding"] = mat(n_tok, v.width)
        ln("visual.ln_pre", v.width)
        add_transformer("visual.transformer", v.width, v.layers)
        ln("visual.ln_post", v.width)
        sd["visual.proj"] = mat(v.width, cfg.embed_dim)

    tc = cfg.text
    sd["token_embedding.weight"] = mat(tc.vocab_size, tc.width)
    sd["positional_embedding"] = mat(tc.context_length, tc.width)
    add_transformer("transformer", tc.width, tc.layers)
    ln("ln_final", tc.width)
    sd["text_projection"] = mat(tc.width, cfg.embed_dim)
    sd["logit_scale"] = torch.tensor(2.6593)
    return sd


# ------------------------------------------------------------ torch forward


def _ln(x, sd, p):
    return F.layer_norm(
        x, x.shape[-1:], sd[f"{p}.weight"], sd[f"{p}.bias"], eps=LN_EPS
    )


def _bn(x, sd, p):
    return F.batch_norm(
        x,
        sd[f"{p}.running_mean"],
        sd[f"{p}.running_var"],
        sd[f"{p}.weight"],
        sd[f"{p}.bias"],
        training=False,
        eps=BN_EPS,
    )


def _mha(x, sd, p, heads, mask=None):
    """x: [n, b, w] (seq-first, like torch.nn.MultiheadAttention)."""
    n, b, w = x.shape
    hd = w // heads
    qkv = F.linear(x, sd[f"{p}.in_proj_weight"], sd[f"{p}.in_proj_bias"])
    q, k, v = qkv.chunk(3, dim=-1)

    def split(t):
        return t.contiguous().view(t.shape[0], b * heads, hd).transpose(0, 1)

    q, k, v = split(q), split(k), split(v)
    attn = (q * hd ** -0.5) @ k.transpose(1, 2)
    if mask is not None:
        attn = attn + mask
    out = attn.softmax(dim=-1) @ v                      # [b*h, n, hd]
    out = out.transpose(0, 1).contiguous().view(n, b, w)
    return F.linear(out, sd[f"{p}.out_proj.weight"], sd[f"{p}.out_proj.bias"])


def _resblock(x, sd, p, heads, mask=None):
    x = x + _mha(_ln(x, sd, f"{p}.ln_1"), sd, f"{p}.attn", heads, mask)
    y = _ln(x, sd, f"{p}.ln_2")
    y = F.linear(y, sd[f"{p}.mlp.c_fc.weight"], sd[f"{p}.mlp.c_fc.bias"])
    y = y * torch.sigmoid(1.702 * y)                    # QuickGELU
    y = F.linear(y, sd[f"{p}.mlp.c_proj.weight"], sd[f"{p}.mlp.c_proj.bias"])
    return x + y


def _transformer(x, sd, prefix, layers, heads, mask=None):
    for i in range(layers):
        x = _resblock(x, sd, f"{prefix}.resblocks.{i}", heads, mask)
    return x


def encode_image_vit(sd, cfg, images):
    """images: [b, 3, H, W] fp32 -> [b, embed_dim]."""
    v = cfg.vision
    x = F.conv2d(images, sd["visual.conv1.weight"], stride=v.patch_size)
    b = x.shape[0]
    x = x.reshape(b, v.width, -1).permute(0, 2, 1)       # [b, g*g, w]
    cls = sd["visual.class_embedding"].expand(b, 1, v.width)
    x = torch.cat([cls, x], dim=1) + sd["visual.positional_embedding"]
    x = _ln(x, sd, "visual.ln_pre")
    x = x.permute(1, 0, 2)                               # [n, b, w]
    x = _transformer(x, sd, "visual.transformer", v.layers, v.heads)
    x = x.permute(1, 0, 2)
    x = _ln(x[:, 0, :], sd, "visual.ln_post")
    return x @ sd["visual.proj"]


def _bottleneck(x, sd, p, stride):
    out = F.relu(_bn(F.conv2d(x, sd[f"{p}.conv1.weight"]), sd, f"{p}.bn1"))
    out = F.relu(
        _bn(F.conv2d(out, sd[f"{p}.conv2.weight"], padding=1), sd, f"{p}.bn2")
    )
    if stride > 1:
        out = F.avg_pool2d(out, stride)
    out = _bn(F.conv2d(out, sd[f"{p}.conv3.weight"]), sd, f"{p}.bn3")
    if f"{p}.downsample.0.weight" in sd:
        idt = F.avg_pool2d(x, stride) if stride > 1 else x
        idt = _bn(
            F.conv2d(idt, sd[f"{p}.downsample.0.weight"]),
            sd, f"{p}.downsample.1",
        )
    else:
        idt = x
    return F.relu(out + idt)


def encode_image_resnet(sd, cfg, images):
    """images: [b, 3, H, W] fp32 -> [b, embed_dim]."""
    v = cfg.vision
    x = images
    x = F.relu(_bn(
        F.conv2d(x, sd["visual.conv1.weight"], stride=2, padding=1),
        sd, "visual.bn1"))
    x = F.relu(_bn(
        F.conv2d(x, sd["visual.conv2.weight"], padding=1), sd, "visual.bn2"))
    x = F.relu(_bn(
        F.conv2d(x, sd["visual.conv3.weight"], padding=1), sd, "visual.bn3"))
    x = F.avg_pool2d(x, 2)

    for stage, blocks in enumerate(v.resnet_layers):
        stride = 1 if stage == 0 else 2
        for b in range(blocks):
            x = _bottleneck(
                x, sd, f"visual.layer{stage + 1}.{b}",
                stride if b == 0 else 1,
            )

    # attention pooling: mean token as query
    p = "visual.attnpool"
    b, c, h, w = x.shape
    heads = v.heads
    hd = c // heads
    x = x.flatten(2).permute(2, 0, 1)                    # [hw, b, c]
    x = torch.cat([x.mean(dim=0, keepdim=True), x], dim=0)
    x = x + sd[f"{p}.positional_embedding"][:, None, :]
    q = F.linear(x[:1], sd[f"{p}.q_proj.weight"], sd[f"{p}.q_proj.bias"])
    k = F.linear(x, sd[f"{p}.k_proj.weight"], sd[f"{p}.k_proj.bias"])
    v_ = F.linear(x, sd[f"{p}.v_proj.weight"], sd[f"{p}.v_proj.bias"])

    def split(t):
        return t.contiguous().view(t.shape[0], b * heads, hd).transpose(0, 1)

    q, k, v_ = split(q), split(k), split(v_)
    attn = ((q * hd ** -0.5) @ k.transpose(1, 2)).softmax(dim=-1)
    out = (attn @ v_).transpose(0, 1).contiguous().view(1, b, c)
    out = F.linear(out, sd[f"{p}.c_proj.weight"], sd[f"{p}.c_proj.bias"])
    return out[0]


def encode_image(sd, cfg, images):
    if cfg.vision.is_resnet:
        return encode_image_resnet(sd, cfg, images)
    return encode_image_vit(sd, cfg, images)


def encode_text(sd, cfg, tokens):
    """tokens: [b, context_length] int64 -> [b, embed_dim]."""
    tc = cfg.text
    x = sd["token_embedding.weight"][tokens] + sd["positional_embedding"]
    mask = torch.full(
        (tc.context_length, tc.context_length), float("-inf")
    ).triu_(1)
    x = x.permute(1, 0, 2)
    x = _transformer(x, sd, "transformer", tc.layers, tc.heads, mask)
    x = x.permute(1, 0, 2)
    x = _ln(x, sd, "ln_final")
    eot = tokens.argmax(dim=-1)
    x = x[torch.arange(x.shape[0]), eot]
    return x @ sd["text_projection"]

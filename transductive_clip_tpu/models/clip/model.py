"""Top-level CLIP model: frozen image + text towers, jitted encoders, and a
loader mirroring the reference's ``clip.load(backbone, device)``
(reference: main.py:50).

Weights: converted from an OpenAI CLIP checkpoint (.pt) found under
``$CLIP_WEIGHTS_DIR`` (default ``data/clip_weights``); without a checkpoint
``load(..., allow_random=True)`` initializes random weights (tests,
benchmarks, shape checks).
"""

from __future__ import annotations

import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .config import CLIP_CONFIGS, CLIPConfig
from .resnet import ModifiedResNet
from .text import TextTransformer
from .vit import VisionTransformer


class CLIPModule(nn.Module):
    cfg: CLIPConfig
    # attention score-matrix impl for the transformer towers: 'xla' |
    # 'fused' (Pallas, TPU) | 'fused_interpret' (tests). Parameters are
    # identical across impls. The ResNet attention pool always uses XLA
    # (single query token — nothing to fuse).
    attn_impl: str = "xla"
    # fold_bn=True expects fold_resnet_params()-transformed weights (exact
    # BN-into-conv fold; resnet.py). ViT towers ignore it.
    fold_bn: bool = False
    # fused_resnet=True routes identity bottlenecks through the fused
    # Pallas kernel (requires fold_bn; ops/pallas_bottleneck.py)
    fused_resnet: bool = False

    def setup(self):
        if self.cfg.vision.is_resnet:
            self.visual = ModifiedResNet(
                self.cfg.vision, self.cfg.embed_dim, fold_bn=self.fold_bn,
                fuse_blocks=self.fused_resnet,
            )
        else:
            self.visual = VisionTransformer(
                self.cfg.vision, self.cfg.embed_dim, self.attn_impl
            )
        self.text = TextTransformer(
            self.cfg.text, self.cfg.embed_dim, self.attn_impl
        )
        self.logit_scale = self.param(
            "logit_scale", lambda *_: jnp.asarray(np.log(1 / 0.07), jnp.float32), ()
        )

    def encode_image(self, images):
        return self.visual(images)

    def encode_text(self, tokens):
        return self.text(tokens)

    def __call__(self, images, tokens):
        img = self.encode_image(images)
        txt = self.encode_text(tokens)
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        scale = jnp.exp(self.logit_scale)
        return scale * img @ txt.T


def _resolve_attention_impl(impl: str, cfg: CLIPConfig, compute_dtype) -> str:
    """'auto' -> the fused Pallas attention on TPU backends when every
    transformer tower's per-instance working set fits VMEM
    (ops/pallas_attention.py), else plain XLA einsums."""
    if impl != "auto":
        return impl
    if jax.default_backend() != "tpu":
        return "xla"
    from transductive_clip_tpu.ops.pallas_attention import (
        fused_attention_supported,
    )

    shapes = [(cfg.text.context_length, cfg.text.width)]
    if not cfg.vision.is_resnet:
        v = cfg.vision
        shapes.append(((v.image_size // v.patch_size) ** 2 + 1, v.width))
    ok = all(fused_attention_supported(n, w, compute_dtype)
             for n, w in shapes)
    return "fused" if ok else "xla"


class JaxCLIP:
    """Host-side wrapper holding params + jitted encoders."""

    def __init__(self, cfg: CLIPConfig, params, compute_dtype=jnp.bfloat16,
                 attention_impl: str = "auto", fold_bn: bool = True,
                 fused_resnet: str | bool = "auto"):
        self.cfg = cfg
        # the towers are frozen, so BatchNorm folds exactly into the conv
        # weights (resnet.py:fold_resnet_params) — production default; CLI
        # ``clip_fold_bn: False`` keeps the reference-shaped unfolded graph
        self.fold_bn = bool(fold_bn) and cfg.vision.is_resnet
        if self.fold_bn:
            from .resnet import fold_resnet_params

            params = dict(params)
            params["params"] = dict(params["params"])
            params["params"]["visual"] = fold_resnet_params(
                params["params"]["visual"]
            )
        # commit the weight tree to the device ONCE: converted checkpoints
        # arrive as host numpy arrays, and jit re-uploads numpy arguments on
        # EVERY call — ~400 MB of fp32 weights per encode batch over the
        # tunneled link for the real-checkpoint path (values unchanged: the
        # compute_dtype cast still happens in-jit)
        self.params = jax.device_put(params)
        # bf16 compute: params + activations cast to bf16 (MXU-native),
        # attention softmaxes stay fp32 (layers.py), outputs upcast to fp32.
        # CLIP inference is robust to bf16; pass compute_dtype=float32 to
        # disable.
        self.compute_dtype = compute_dtype
        self.attention_impl = _resolve_attention_impl(
            attention_impl, cfg, compute_dtype
        )
        # fused ResNet bottlenecks: measured SLOWER than XLA's conv
        # pipeline at every RN50 identity-block shape on v5e (0.65-0.95x;
        # ops/pallas_bottleneck.py docstring + README roofline note), so
        # 'auto' resolves to OFF — the kernel stays as an explicit opt-in
        # for future hardware/Mosaic generations. Requires fold_bn.
        if fused_resnet == "auto":
            fused_resnet = False
        self.fused_resnet = bool(fused_resnet) and self.fold_bn
        self.module = CLIPModule(cfg, attn_impl=self.attention_impl,
                                 fold_bn=self.fold_bn,
                                 fused_resnet=self.fused_resnet)

        def _cast(tree, dtype):
            return jax.tree.map(
                lambda x: x.astype(dtype)
                if hasattr(x, "astype") and jnp.issubdtype(x.dtype, jnp.floating)
                else x,
                tree,
            )

        def enc_image(p, x):
            if x.dtype == jnp.uint8:
                # device-side CLIP normalization (host ships raw uint8:
                # 4x smaller transfers, no per-pixel host math)
                from .preprocess import CLIP_MEAN, CLIP_STD

                x = x.astype(compute_dtype) / 255.0
                x = (x - jnp.asarray(CLIP_MEAN, compute_dtype)) / jnp.asarray(
                    CLIP_STD, compute_dtype
                )
            out = self.module.apply(
                _cast(p, compute_dtype), x.astype(compute_dtype),
                method=CLIPModule.encode_image,
            )
            return out.astype(jnp.float32)

        def enc_text(p, t):
            out = self.module.apply(
                _cast(p, compute_dtype), t, method=CLIPModule.encode_text
            )
            return out.astype(jnp.float32)

        self._encode_image = jax.jit(enc_image)
        self._encode_text = jax.jit(enc_text)
        self._tokenizer = None
        self.mesh = None

    def set_mesh(self, mesh):
        """Enable batch-data-parallel encoding: image batches shard over the
        mesh's ``dp`` axis (params replicate; GSPMD all-gathers the
        embeddings). SURVEY §2.2 'Batch-DP for feature extraction'."""
        self.mesh = mesh
        return self

    # -- image ---------------------------------------------------------
    def encode_image_batch(self, images):
        """images: [b, H, W, 3] NHWC — float32 (CLIP-normalized) or raw
        uint8 (normalized on device).

        Host arrays go to the device exactly once: the mesh path
        device_puts the HOST array with its dp sharding directly (an eager
        ``jnp.asarray`` first would commit the whole batch to one device
        and then reshard it — double transfer over the tunneled link), and
        the single-device path lets jit do its one transfer."""
        if self.mesh is not None and images.shape[0] % self.mesh.shape["dp"] == 0:
            from jax.sharding import NamedSharding, PartitionSpec as P

            images = jax.device_put(
                images, NamedSharding(self.mesh, P("dp", None, None, None))
            )
        return self._encode_image(self.params, images)

    # -- text ----------------------------------------------------------
    @property
    def tokenizer(self):
        if self._tokenizer is None:
            from .tokenizer import SimpleTokenizer

            self._tokenizer = SimpleTokenizer()
        return self._tokenizer

    def encode_text_prompts(self, prompts):
        tokens = np.stack(
            [self.tokenizer.encode_padded(p, self.cfg.text.context_length)
             for p in prompts]
        )
        return self._encode_text(self.params, jnp.asarray(tokens, jnp.int32))


def init_random_params(cfg: CLIPConfig, seed: int = 0):
    module = CLIPModule(cfg)
    images = jnp.zeros((1, cfg.vision.image_size, cfg.vision.image_size, 3),
                       jnp.float32)
    tokens = jnp.zeros((1, cfg.text.context_length), jnp.int32)
    return module.init(jax.random.PRNGKey(seed), images, tokens)


def checkpoint_path(backbone: str) -> str:
    root = os.environ.get("CLIP_WEIGHTS_DIR", os.path.join("data", "clip_weights"))
    # "ViT-L/14@336px" -> "ViT-L-14-336px.pt", matching OpenAI's filenames
    safe = backbone.replace("/", "-").replace("@", "-")
    return os.path.join(root, f"{safe}.pt")


def load(backbone: str = "RN50", allow_random: bool = False, seed: int = 0,
         compute_dtype=None, attention_impl: str = "auto",
         fold_bn: bool = True, fused_resnet: str | bool = "auto"):
    """Returns (model, preprocess) like the reference's clip.load.

    ``compute_dtype``: ``jnp.bfloat16`` (default; MXU-native, ~1.5x
    extraction throughput) or ``jnp.float32`` for reference-exact tower
    numerics — reachable from the CLI via ``clip_compute: float32``
    (main.py), per the repo rule that every performance shortcut keeps a
    switch back to the reference-exact behavior.

    ``attention_impl``: 'auto' (fused Pallas attention on TPU, XLA
    elsewhere) | 'fused' | 'xla' — CLI: ``clip_attention``.

    ``fold_bn``: fold frozen BatchNorms into the ResNet conv weights (exact;
    resnet.py:fold_resnet_params). CLI: ``clip_fold_bn`` (default True).

    ``fused_resnet``: 'auto' (fused Pallas identity bottlenecks on TPU when
    fold_bn is active) | True | False — CLI: ``clip_fused_resnet``."""
    if backbone not in CLIP_CONFIGS:
        raise ValueError(
            f"Unknown backbone {backbone!r}; choose from {sorted(CLIP_CONFIGS)}"
        )
    cfg = CLIP_CONFIGS[backbone]
    ckpt = checkpoint_path(backbone)
    if os.path.exists(ckpt):
        from .convert import convert_openai_checkpoint

        params = convert_openai_checkpoint(ckpt, cfg)
    elif allow_random:
        params = init_random_params(cfg, seed)
    else:
        raise FileNotFoundError(
            f"No CLIP checkpoint at {ckpt}. Download the OpenAI {backbone} "
            "weights there (offline environments: copy the .pt file), or pass "
            "allow_random=True for architecture-only runs."
        )
    from .preprocess import make_preprocess

    if compute_dtype is None:
        compute_dtype = jnp.bfloat16
    model = JaxCLIP(cfg, params, compute_dtype=compute_dtype,
                    attention_impl=attention_impl, fold_bn=fold_bn,
                    fused_resnet=fused_resnet)
    # uint8 preprocess: normalization happens on device (smaller transfers)
    return model, make_preprocess(cfg.vision.image_size, dtype="uint8")

"""Full CLIP (vision + text + projections) for CLIP-I / CLIP-T scoring.

The BASELINE.md acceptance metric is CLIP-I/CLIP-T parity with the
reference; this module provides a TPU-native open_clip-compatible scorer:
- vision: the same VisionTransformer as the E4T encoder tower, PLUS the
  final projection (the E4T path removes it, /root/reference/e4t/encoder.py:96);
- text: open_clip text transformer (causal, eot-argmax pooling,
  text_projection);
- CLIP-I = cosine(image_emb(gen), image_emb(src));
  CLIP-T = cosine(image_emb(gen), text_emb(prompt)).
"""
from __future__ import annotations

import dataclasses
from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from e4t_diffusion_tpu.models.vit import VisionTransformer, ViTBlock, ViTConfig
from e4t_diffusion_tpu.ops.resize import clip_preprocess


@dataclasses.dataclass(frozen=True)
class OpenCLIPTextConfig:
    vocab_size: int = 49408
    context_length: int = 77
    width: int = 1024      # ViT-H-14 text tower
    num_layers: int = 24
    num_heads: int = 16
    embed_dim: int = 1024  # shared projection space

    @property
    def mlp_dim(self) -> int:
        return self.width * 4

    @classmethod
    def tiny(cls) -> "OpenCLIPTextConfig":
        return cls(vocab_size=600, context_length=16, width=32, num_layers=2,
                   num_heads=4, embed_dim=24)


@dataclasses.dataclass(frozen=True)
class CLIPScoreConfig:
    vit: ViTConfig = dataclasses.field(default_factory=ViTConfig.vit_h_14)
    text: OpenCLIPTextConfig = dataclasses.field(
        default_factory=OpenCLIPTextConfig)
    embed_dim: int = 1024

    @classmethod
    def tiny(cls) -> "CLIPScoreConfig":
        return cls(vit=ViTConfig.tiny(), text=OpenCLIPTextConfig.tiny(),
                   embed_dim=24)


class OpenCLIPTextTower(nn.Module):
    config: OpenCLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jax.Array) -> jax.Array:
        cfg = self.config
        token_embedding = self.param(
            "token_embedding", nn.initializers.normal(0.02),
            (cfg.vocab_size, cfg.width))
        positional_embedding = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            (cfg.context_length, cfg.width))
        x = jnp.take(token_embedding, input_ids, axis=0)
        x = (x + positional_embedding[None, : x.shape[1]]).astype(self.dtype)
        block_cfg = ViTConfig(width=cfg.width, num_layers=cfg.num_layers,
                              num_heads=cfg.num_heads, mlp_dim=cfg.mlp_dim)
        for i in range(cfg.num_layers):
            x = ViTBlock(block_cfg, dtype=self.dtype, causal=True,
                         name=f"resblocks_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_final")(x)
        # eot pooling: features at the argmax token id (open_clip)
        eot = jnp.argmax(input_ids, axis=-1)
        pooled = x[jnp.arange(x.shape[0]), eot]
        text_projection = self.param(
            "text_projection", nn.initializers.normal(cfg.width ** -0.5),
            (cfg.width, cfg.embed_dim))
        return pooled @ text_projection.astype(pooled.dtype)


class CLIPScorer(nn.Module):
    config: CLIPScoreConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.visual = VisionTransformer(self.config.vit, dtype=self.dtype)
        self.text = OpenCLIPTextTower(self.config.text, dtype=self.dtype)
        self.visual_proj = self.param(
            "visual_proj",
            nn.initializers.normal(self.config.vit.width ** -0.5),
            (self.config.vit.width, self.config.embed_dim))

    def image_features(self, pixels: jax.Array) -> jax.Array:
        """pixels: NCHW in [-1, 1] at any resolution (resized on device)."""
        x = clip_preprocess(pixels, self.config.vit.image_size)
        pooled, _ = self.visual(x.astype(self.dtype))
        feats = pooled @ self.visual_proj.astype(pooled.dtype)
        return feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)

    def text_features(self, input_ids: jax.Array) -> jax.Array:
        feats = self.text(input_ids)
        return feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)

    def __call__(self, pixels, input_ids):
        return self.image_features(pixels), self.text_features(input_ids)


def clip_i(image_feats_a: jax.Array, image_feats_b: jax.Array) -> jax.Array:
    """Mean pairwise cosine similarity (features pre-normalized)."""
    return jnp.mean(jnp.sum(image_feats_a * image_feats_b, axis=-1))


def clip_t(image_feats: jax.Array, text_feats: jax.Array) -> jax.Array:
    return jnp.mean(jnp.sum(image_feats * text_feats, axis=-1))


def scorer_from_open_clip(sd: Dict[str, np.ndarray],
                          config: CLIPScoreConfig) -> Dict:
    """Convert a full open_clip checkpoint state dict (visual.* + text
    tower at top level) to CLIPScorer params, strict on the keys we use."""
    from e4t_diffusion_tpu.utils.convert import (
        vit_from_torch, _Converter, _set, _t)

    tree: Dict = {}
    vis_sd = {k: v for k, v in sd.items() if k.startswith("visual.")}
    proj = np.asarray(vis_sd.pop("visual.proj"))
    tree["visual"] = vit_from_torch(vis_sd, config.vit, prefix="visual.")
    tree["visual_proj"] = proj

    rest = {k: np.asarray(v) for k, v in sd.items()
            if not k.startswith("visual.")}
    c = _Converter(rest)
    c.raw("token_embedding.weight", "text.token_embedding")
    c.raw("positional_embedding", "text.positional_embedding")
    c.raw("text_projection", "text.text_projection")
    c.norm("ln_final", "text.ln_final")
    for i in range(config.text.num_layers):
        t = f"transformer.resblocks.{i}."
        f = f"text.resblocks_{i}."
        c.norm(t + "ln_1", f + "ln_1")
        c.norm(t + "ln_2", f + "ln_2")
        _set(c.tree, (f + "attn_in_proj.kernel").split("."),
             _t(c.take(t + "attn.in_proj_weight")))
        _set(c.tree, (f + "attn_in_proj.bias").split("."),
             c.take(t + "attn.in_proj_bias"))
        c.linear(t + "attn.out_proj", f + "attn_out_proj")
        c.linear(t + "mlp.c_fc", f + "mlp_c_fc")
        c.linear(t + "mlp.c_proj", f + "mlp_c_proj")
    head = c.finish(ignore_unused=(r"logit_scale", r"attn_mask"))
    tree.update(head)
    return tree

"""CLIP-I / CLIP-T evaluation of generated samples (BASELINE.md metric).

Computes, with an open_clip ViT-H-14 checkpoint:
- CLIP-I: mean cosine similarity between image embeddings of each
  generated image and the source (domain) image;
- CLIP-T: mean cosine similarity between each generated image's embedding
  and its prompt's text embedding.

Usage:
  python scripts/evaluate_clip_scores.py \
      --generated_dir out/samples --source_image /data/src.jpg \
      --prompt "a photo of *s" --class_word face \
      --open_clip_weights /data/open_clip_vit_h14.pt \
      --tokenizer_dir /data/sd/tokenizer

The placeholder token is replaced by --class_word for text scoring (the
prompt's personalization token has no meaning to the scoring model).
Prints one JSON line.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import json
import os

import numpy as np
import jax.numpy as jnp
from PIL import Image

from e4t_diffusion_tpu.models.clip_score import (
    CLIPScorer, CLIPScoreConfig, clip_i, clip_t, scorer_from_open_clip)
from e4t_diffusion_tpu.utils.convert import load_torch_state_dict
from e4t_diffusion_tpu.utils.tokenizer import CLIPTokenizer
from e4t_diffusion_tpu.data.dataset import list_image_files_recursively


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--generated_dir", type=str, required=True)
    p.add_argument("--source_image", type=str, required=True)
    p.add_argument("--prompt", type=str, required=True)
    p.add_argument("--placeholder_token", type=str, default="*s")
    p.add_argument("--class_word", type=str, default="person")
    p.add_argument("--open_clip_weights", type=str, required=True)
    p.add_argument("--tokenizer_dir", type=str, required=True)
    p.add_argument("--resolution", type=int, default=224)
    return p.parse_args()


def _load_pixels(path, size):
    img = Image.open(path).convert("RGB").resize((size, size))
    arr = np.asarray(img).astype(np.float32) / 127.5 - 1.0
    return arr.transpose(2, 0, 1)[None]


def main():
    args = parse_args()
    config = CLIPScoreConfig()
    params = scorer_from_open_clip(
        load_torch_state_dict(args.open_clip_weights), config)
    scorer = CLIPScorer(config)

    tokenizer = CLIPTokenizer.from_pretrained(args.tokenizer_dir)
    prompt = args.prompt.replace(args.placeholder_token, args.class_word)
    ids = jnp.asarray(tokenizer(prompt, padding="max_length",
                                truncation=True, max_length=77)["input_ids"])

    src = jnp.asarray(_load_pixels(args.source_image, args.resolution))
    src_feats = scorer.apply({"params": params}, src,
                             method=CLIPScorer.image_features)
    text_feats = scorer.apply({"params": params}, ids,
                              method=CLIPScorer.text_features)

    files = list_image_files_recursively(args.generated_dir)
    assert files, f"no images in {args.generated_dir}"
    clip_i_vals, clip_t_vals = [], []
    for f in files:
        gen = jnp.asarray(_load_pixels(f, args.resolution))
        gen_feats = scorer.apply({"params": params}, gen,
                                 method=CLIPScorer.image_features)
        clip_i_vals.append(float(clip_i(gen_feats, src_feats)))
        clip_t_vals.append(float(clip_t(gen_feats, text_feats)))

    print(json.dumps({
        "clip_i": float(np.mean(clip_i_vals)),
        "clip_t": float(np.mean(clip_t_vals)),
        "n_images": len(files),
    }))


if __name__ == "__main__":
    main()

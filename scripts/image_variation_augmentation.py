"""Offline dataset augmentation: N variations per training image, saved as
sha1-named JPEGs.

Parity target: /root/reference/scripts/image_variation_augmentation.py,
which generates Stable-unCLIP image variations (used for the published
FFHQ+CelebA-HQ model, reference README.md:23). This is offline data prep,
not the training path (SURVEY.md §7.2 step 6).

Modes:
- ``geometric`` (default): TPU-host augmentations — random resized crops,
  flips, mild color jitter. Self-contained, no extra model needed.
- ``unclip``: Stable-unCLIP image variations, matching the reference's
  use of diffusers StableUnCLIPImg2ImgPipeline (reference script lines
  95-129). Requires ``--unclip_model_path`` pointing at a local
  diffusers-format stabilityai/stable-diffusion-2-1-unclip directory
  (TPU pods have no network egress; stage it yourself).

Usage:
  python scripts/image_variation_augmentation.py \
      --train_image_dataset /data/ffhq --save_dir /data/ffhq_aug \
      --num_images_per_image 4 --resolution 512
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import argparse
import hashlib
import os

import numpy as np
from PIL import Image

from e4t_diffusion_tpu.data.dataset import (
    list_image_files_recursively, smallest_max_size, random_crop)


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--train_image_dataset", type=str, required=True)
    p.add_argument("--save_dir", type=str, required=True)
    p.add_argument("--num_images_per_image", type=int, default=4)
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--mode", type=str, default="geometric",
                   choices=["geometric", "unclip"])
    p.add_argument("--unclip_model_path", type=str, default=None,
                   help="unclip mode: local diffusers-format "
                        "stable-diffusion-2-1-unclip directory")
    p.add_argument("--guidance_scale", type=float, default=10.0,
                   help="unclip mode only (diffusers default)")
    p.add_argument("--num_inference_steps", type=int, default=20,
                   help="unclip mode only")
    p.add_argument("--noise_level", type=int, default=0,
                   help="unclip mode: image-embedding noise augmentation")
    return p.parse_args()


def geometric_variation(arr: np.ndarray, resolution: int,
                        rng: np.random.Generator) -> np.ndarray:
    # random resized crop: upscale a bit, crop back, maybe flip, jitter
    scale = float(rng.uniform(1.0, 1.25))
    big = smallest_max_size(arr, int(resolution * scale))
    out = random_crop(big, resolution, rng)
    if rng.random() < 0.5:
        out = out[:, ::-1]
    jitter = rng.uniform(0.9, 1.1, size=(1, 1, 3))
    out = np.clip(out.astype(np.float32) * jitter, 0, 255).astype(np.uint8)
    return out


def build_unclip_pipeline(model_path: str):
    """Load a local Stable-unCLIP checkpoint into the TPU-native pipeline."""
    import jax.numpy as jnp

    from e4t_diffusion_tpu.diffusion.unclip_pipeline import (
        StableUnCLIPImg2ImgPipeline, UnCLIPModules)
    from e4t_diffusion_tpu.diffusion.schedulers import (
        DPMSolverMultistepScheduler)
    from e4t_diffusion_tpu.utils.artifacts import load_sd_unclip
    from e4t_diffusion_tpu.utils.tokenizer import CLIPTokenizer
    from e4t_diffusion_tpu.utils.runtime import setup_compilation_cache

    import jax

    setup_compilation_cache()
    dtype = (jnp.bfloat16 if jax.default_backend() == "tpu"
             else jnp.float32)
    loaded = load_sd_unclip(model_path)
    modules = UnCLIPModules.create(
        unet_config=loaded["unet_config"], vae_config=loaded["vae_config"],
        text_config=loaded["text_config"],
        image_config=loaded["image_encoder_config"],
        dtype=dtype)
    if "noise_aug_schedule" in loaded:
        modules.noise_aug_schedule = loaded["noise_aug_schedule"]
    params = {
        "unet": loaded["unet"], "vae": loaded["vae"],
        "text": loaded["text"], "image_encoder": loaded["image_encoder"],
        "image_normalizer": loaded["image_normalizer"],
    }
    # reference parity: DPMSolverMultistepScheduler override
    # (/root/reference/scripts/image_variation_augmentation.py:96-98)
    scheduler = DPMSolverMultistepScheduler(loaded["schedule_config"])
    tokenizer = CLIPTokenizer.from_pretrained(loaded["tokenizer_dir"])
    return StableUnCLIPImg2ImgPipeline(modules, params, tokenizer,
                                       scheduler=scheduler)


def main():
    args = parse_args()
    if args.mode == "unclip" and not args.unclip_model_path:
        raise SystemExit("--mode unclip requires --unclip_model_path "
                         "(a local diffusers-format stable-diffusion-2-1-"
                         "unclip directory)")
    pipe = (build_unclip_pipeline(args.unclip_model_path)
            if args.mode == "unclip" else None)
    os.makedirs(args.save_dir, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    files = list_image_files_recursively(args.train_image_dataset)
    print(f"{len(files)} source images")
    count = 0
    for n, path in enumerate(files):
        arr = np.asarray(Image.open(path).convert("RGB"))
        base = smallest_max_size(arr, args.resolution)
        base = random_crop(base, args.resolution, rng)
        if pipe is not None:
            variations = pipe(
                base, num_images_per_prompt=args.num_images_per_image,
                num_inference_steps=args.num_inference_steps,
                guidance_scale=args.guidance_scale,
                noise_level=args.noise_level,
                seed=args.seed + n, output_type="pil")
        else:
            variations = [
                Image.fromarray(
                    geometric_variation(base, args.resolution, rng))
                for _ in range(args.num_images_per_image)]
        for img in variations:
            name = hashlib.sha1(img.tobytes()).hexdigest()
            img.save(os.path.join(args.save_dir, f"{name}.jpg"))
            count += 1
    print(f"wrote {count} images to {args.save_dir}")


if __name__ == "__main__":
    main()

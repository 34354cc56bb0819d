"""Offline dataset augmentation: N variations per training image, saved as
sha1-named JPEGs.

Parity target: /root/reference/scripts/image_variation_augmentation.py,
which generates Stable-unCLIP image variations (used for the published
FFHQ+CelebA-HQ model, reference README.md:23). This is offline data prep,
not the training path (SURVEY.md §7.2 step 6).

Modes:
- ``geometric`` (default): TPU-host augmentations — random resized crops,
  flips, mild color jitter. Self-contained, no extra model needed.
- ``unclip``: requires a local Stable-unCLIP checkpoint; the unCLIP model
  family is not yet bundled in this framework — the flag is reserved and
  errors with guidance. (Planned follow-up; tracked in README.)

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
    p.add_argument("--guidance_scale", type=float, default=10.0,
                   help="unclip mode only")
    p.add_argument("--num_inference_steps", type=int, default=50,
                   help="unclip mode only")
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


def main():
    args = parse_args()
    if args.mode == "unclip":
        raise NotImplementedError(
            "Stable-unCLIP image variation requires the unCLIP model "
            "family, which is not yet bundled in e4t_diffusion_tpu. Use "
            "--mode geometric, or run the torch reference tooling offline "
            "for unCLIP variations.")
    os.makedirs(args.save_dir, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    files = list_image_files_recursively(args.train_image_dataset)
    print(f"{len(files)} source images")
    count = 0
    for path in files:
        arr = np.asarray(Image.open(path).convert("RGB"))
        base = smallest_max_size(arr, args.resolution)
        base = random_crop(base, args.resolution, rng)
        for _ in range(args.num_images_per_image):
            var = geometric_variation(base, args.resolution, rng)
            img = Image.fromarray(var)
            name = hashlib.sha1(img.tobytes()).hexdigest()
            img.save(os.path.join(args.save_dir, f"{name}.jpg"))
            count += 1
    print(f"wrote {count} images to {args.save_dir}")


if __name__ == "__main__":
    main()

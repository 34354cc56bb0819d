"""Input-pipeline throughput benchmark (round-1 verdict item 9).

Measures host-side loader throughput — JPEG decode + area-resize +
crop + flip + normalize — decoupled from any device work, for both the
C++ fused kernel (native/e4t_image.cc) and the NumPy/cv2 fallback, and
prints one JSON line per variant:

    {"metric": "loader_images_per_sec", "variant": "native", ...}

At phase-1 rates the loader silently becomes the ceiling if it cannot
feed ~2x the train-step rate (the thread-prefetch in E4TDataLoader
overlaps decode with the device step, so loader_rate > step_rate keeps
the chip busy). Usage:

    python scripts/bench_loader.py [--batches 40] [--batch-size 16]
        [--resolution 512] [--source-px 768] [--workers N]
"""
import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_dataset(root: str, n: int, px: int) -> str:
    from PIL import Image

    rng = np.random.default_rng(0)
    os.makedirs(root, exist_ok=True)
    for i in range(n):
        # non-square, photo-like smooth content (JPEG-decode realistic)
        h, w = px, int(px * 4 / 3)
        base = rng.integers(0, 255, (h // 8, w // 8, 3), dtype=np.uint8)
        img = np.asarray(Image.fromarray(base).resize((w, h),
                                                      Image.BILINEAR))
        noise = rng.integers(0, 30, img.shape, dtype=np.uint8)
        Image.fromarray(img + noise).save(
            os.path.join(root, f"{i:04d}.jpg"), quality=92)
    return root


def run_variant(source: str, variant: str, batch_size: int, resolution: int,
                batches: int, num_workers: int = 0) -> dict:
    os.environ["E4T_DISABLE_NATIVE"] = "1" if variant == "numpy" else "0"
    from e4t_diffusion_tpu.data.dataset import E4TDataLoader

    loader = E4TDataLoader(source, batch_size=batch_size,
                           resolution=resolution, random_crop=True,
                           process_index=0, process_count=1,
                           num_workers=num_workers)
    it = iter(loader)
    try:
        for _ in range(3):  # warmup (page cache, JIT-free)
            next(it)
        t0 = time.perf_counter()
        for _ in range(batches):
            b = next(it)
        wall = time.perf_counter() - t0
    finally:
        it.close()  # stop worker threads before the next variant runs
    assert b["pixel_values"].shape == (batch_size, 3, resolution, resolution)
    imgs = batches * batch_size
    return {
        "metric": "loader_images_per_sec",
        "variant": variant,
        "value": round(imgs / wall, 2),
        "unit": "images/sec",
        "batch": batch_size,
        "resolution": resolution,
        "workers": num_workers,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=40)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--resolution", type=int, default=512)
    ap.add_argument("--source-px", type=int, default=768)
    ap.add_argument("--n-images", type=int, default=256)
    ap.add_argument("--source", default=None,
                    help="existing image dir (default: synthesize)")
    ap.add_argument("--workers", type=int, nargs="*", default=[0, 8],
                    help="worker counts to sweep")
    args = ap.parse_args()

    source = args.source
    if source is None:
        source = os.path.join(tempfile.gettempdir(),
                              f"e4t_loader_bench_{args.source_px}")
        if not os.path.isdir(source) or not os.listdir(source):
            make_dataset(source, args.n_images, args.source_px)

    for workers in args.workers:
        for variant in ("native", "numpy"):
            print(json.dumps(run_variant(source, variant, args.batch_size,
                                         args.resolution, args.batches,
                                         num_workers=workers)))


if __name__ == "__main__":
    main()

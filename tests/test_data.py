"""Data pipeline tests: transforms vs cv2 oracle, folder + tar sources."""
import os
import tarfile

import numpy as np
import pytest
from PIL import Image

from e4t_diffusion_tpu.data.dataset import (
    E4TDataLoader, braceexpand, expand_shards, get_dataset_size,
    list_image_files_recursively, make_transform, smallest_max_size,
    center_crop,
)


def test_smallest_max_size_matches_cv2_area():
    import cv2

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (600, 800, 3), dtype=np.uint8)
    out = smallest_max_size(img, 512)
    assert min(out.shape[:2]) == 512
    expected = cv2.resize(img, (round(800 * 512 / 600), 512),
                          interpolation=cv2.INTER_AREA)
    np.testing.assert_array_equal(out, expected)


def test_transform_range_and_shape():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (300, 200, 3), dtype=np.uint8)
    t = make_transform(64, random_crop_flag=True, seed=0)
    out = t(img)
    assert out.shape == (3, 64, 64)
    assert out.dtype == np.float32
    assert out.min() >= -1.0 and out.max() <= 1.0


def test_braceexpand():
    assert braceexpand("s-{00..02}.tar") == ["s-00.tar", "s-01.tar", "s-02.tar"]
    assert braceexpand("{a,b}/x") == ["a/x", "b/x"]
    assert expand_shards("a-{0..1}.tar::b.tar") == ["a-0.tar", "a-1.tar", "b.tar"]


def _write_images(d, n, size=96):
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        arr = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
        Image.fromarray(arr).save(os.path.join(d, f"img_{i}.png"))


def test_folder_loader(tmp_path):
    _write_images(str(tmp_path / "imgs" / "sub"), 5)
    _write_images(str(tmp_path / "imgs"), 3)
    files = list_image_files_recursively(str(tmp_path / "imgs"))
    assert len(files) == 8
    dl = E4TDataLoader(str(tmp_path / "imgs"), batch_size=4, resolution=64,
                       process_index=0, process_count=1)
    it = iter(dl)
    b1 = next(it)
    b2 = next(it)
    assert b1["pixel_values"].shape == (4, 3, 64, 64)
    assert not np.array_equal(b1["pixel_values"], b2["pixel_values"])


def test_tar_shard_loader(tmp_path):
    import io

    shard_dir = tmp_path / "shards"
    os.makedirs(shard_dir)
    rng = np.random.default_rng(0)
    for s in range(2):
        with tarfile.open(shard_dir / f"data-{s:02d}.tar", "w") as tf:
            for i in range(4):
                arr = rng.integers(0, 255, (80, 80, 3), dtype=np.uint8)
                buf = io.BytesIO()
                Image.fromarray(arr).save(buf, format="JPEG")
                data = buf.getvalue()
                info = tarfile.TarInfo(f"{s}_{i}.jpg")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))
            # corrupt member exercises warn_and_continue
            info = tarfile.TarInfo("broken.jpg")
            info.size = 3
            tf.addfile(info, io.BytesIO(b"bad"))
    import json

    with open(shard_dir / "sizes.json", "w") as f:
        json.dump({"data-00.tar": 4, "data-01.tar": 4}, f)

    spec = str(shard_dir / "data-{00..01}.tar")
    total, nshards = get_dataset_size(spec)
    assert (total, nshards) == (8, 2)
    dl = E4TDataLoader(spec, batch_size=3, resolution=32, shuffle_buffer=4,
                       process_index=0, process_count=1)
    it = iter(dl)
    for _ in range(3):
        b = next(it)
        assert b["pixel_values"].shape == (3, 3, 32, 32)


def test_tar_process_sharding(tmp_path):
    """Two processes see disjoint shards (split_by_node semantics)."""
    import io, json

    shard_dir = tmp_path / "shards"
    os.makedirs(shard_dir)
    for s in range(2):
        with tarfile.open(shard_dir / f"d-{s}.tar", "w") as tf:
            arr = np.full((16, 16, 3), s * 200, dtype=np.uint8)
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="PNG")
            data = buf.getvalue()
            info = tarfile.TarInfo(f"{s}.png")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    spec = str(shard_dir / "d-{0..1}.tar")
    vals = []
    for pi in range(2):
        dl = E4TDataLoader(spec, batch_size=1, resolution=16,
                           shuffle_buffer=1, process_index=pi,
                           process_count=2)
        b = next(iter(dl))
        vals.append(float(b["pixel_values"].mean()))
    assert vals[0] != vals[1]


def test_folder_loader_threaded_workers(tmp_path):
    """num_workers>1 path: same batch shape/range, all samples flow, clean
    shutdown (generator close stops the worker pool)."""
    _write_images(str(tmp_path / "imgs"), 6)
    dl = E4TDataLoader(str(tmp_path / "imgs"), batch_size=4, resolution=64,
                       process_index=0, process_count=1, num_workers=3)
    it = iter(dl)
    seen = []
    for _ in range(4):
        b = next(it)
        assert b["pixel_values"].shape == (4, 3, 64, 64)
        assert b["pixel_values"].min() >= -1.0
        assert b["pixel_values"].max() <= 1.0
        seen.append(b["pixel_values"])
    it.close()
    # not all batches identical (shuffle + augmentation active)
    assert not np.array_equal(seen[0], seen[1])


def test_threaded_loader_finite_source_drains(tmp_path):
    """When the raw source is finite the worker pool drains and the
    iterator terminates (sentinel propagation) instead of hanging.
    Training sources are infinite by design (tar resample, folder epoch
    loop), so drive the machinery with a finite _raw_iter directly."""
    _write_images(str(tmp_path / "imgs"), 1)

    class FiniteLoader(E4TDataLoader):
        def _raw_iter(self):
            rng = np.random.default_rng(0)
            for n in range(9):
                img = rng.integers(0, 255, (70, 70, 3), dtype=np.uint8)
                yield f"synthetic #{n}", (lambda img=img: img)

    dl = FiniteLoader(str(tmp_path / "imgs"), batch_size=4, resolution=64,
                      process_index=0, process_count=1, num_workers=2)
    batches = list(iter(dl))
    # 9 images -> 2 full batches of 4, partial dropped (parity with the
    # single-threaded batcher)
    assert len(batches) == 2
    assert batches[0]["pixel_values"].shape == (4, 3, 64, 64)


def test_device_prefetch_order_and_statefulness():
    """device_prefetch preserves iteration order, calls place() in
    order (stateful placement like prompt sampling is safe), keeps at
    most `depth` items ahead, and drains tails shorter than depth."""
    from e4t_diffusion_tpu.data.prefetch import device_prefetch

    calls = []

    def place(x):
        calls.append(x)
        return x * 10

    out = list(device_prefetch(range(5), place, depth=2))
    assert out == [0, 10, 20, 30, 40]
    assert calls == [0, 1, 2, 3, 4]

    # place() runs ahead of the consumer by at most `depth`
    calls.clear()
    gen = device_prefetch(range(5), place, depth=2)
    first = next(gen)
    assert first == 0 and calls == [0, 1]  # depth staged before a yield
    second = next(gen)
    assert second == 10 and calls == [0, 1, 2]  # refilled behind consumer
    assert list(gen) == [20, 30, 40]

    assert list(device_prefetch(range(1), place, depth=4)) == [0]
    assert list(device_prefetch([], place, depth=2)) == []

    import pytest
    with pytest.raises(ValueError):
        next(device_prefetch(range(3), place, depth=0))

"""C++ fused-preprocess kernel vs the cv2/numpy reference path."""
import numpy as np
import pytest

from e4t_diffusion_tpu.data import native_ops
from e4t_diffusion_tpu.data.dataset import smallest_max_size

pytestmark = pytest.mark.skipif(not native_ops.available(),
                                reason="native kernel unavailable")


def _reference(image, target, top, left, flip):
    resized = smallest_max_size(image, target)  # cv2 INTER_AREA
    crop = resized[top:top + target, left:left + target]
    if flip:
        crop = crop[:, ::-1]
    return (crop.astype(np.float32) / 127.5 - 1.0).transpose(2, 0, 1)


@pytest.mark.parametrize("h,w,target", [(600, 800, 512), (512, 512, 512),
                                        (333, 517, 256), (100, 80, 224)])
def test_fused_matches_cv2(h, w, target):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    rh, rw = native_ops.resized_dims(h, w, target)
    assert min(rh, rw) == target
    top, left = (rh - target) // 2, (rw - target) // 2
    for flip in (False, True):
        ours = native_ops.fused_preprocess(img, target, top, left, flip)
        ref = _reference(img, target, top, left, flip)
        assert ours.shape == ref.shape == (3, target, target)
        # cv2 INTER_AREA uses fixed-point; allow ~1.5 LSB in uint8 space
        np.testing.assert_allclose(ours, ref, atol=2.0 / 127.5)


def test_native_transform_shape():
    t = native_ops.make_native_transform(64, random_crop_flag=True, seed=1)
    rng = np.random.default_rng(2)
    out = t(rng.integers(0, 255, (200, 300, 3), dtype=np.uint8))
    assert out.shape == (3, 64, 64)
    assert out.dtype == np.float32
    assert out.min() >= -1.0 and out.max() <= 1.0

"""Bicubic resize parity vs torch (the reference's kornia path resolves to
torch.nn.functional.interpolate bicubic align_corners=True antialias=False)."""
import numpy as np
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from e4t_diffusion_tpu.ops.resize import (
    resize_bicubic_align_corners,
    clip_preprocess,
    CLIP_MEAN,
    CLIP_STD,
)


@pytest.mark.parametrize("in_hw,out_hw", [((512, 512), (224, 224)),
                                          ((64, 48), (224, 224)),
                                          ((224, 224), (224, 224))])
def test_bicubic_matches_torch(in_hw, out_hw):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, *in_hw)).astype(np.float32)
    ours = resize_bicubic_align_corners(jnp.asarray(x), *out_hw)
    theirs = F.interpolate(
        torch.from_numpy(x), size=out_hw, mode="bicubic",
        align_corners=True, antialias=False,
    ).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=3e-4, rtol=1e-3)


def test_clip_preprocess_matches_torch_composition():
    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, (1, 3, 512, 512)).astype(np.float32)
    ours = clip_preprocess(jnp.asarray(x))
    t = F.interpolate(torch.from_numpy(x), size=(224, 224), mode="bicubic",
                      align_corners=True, antialias=False)
    t = (t + 1.0) / 2.0
    mean = torch.tensor(CLIP_MEAN).view(1, 3, 1, 1)
    std = torch.tensor(CLIP_STD).view(1, 3, 1, 1)
    theirs = ((t - mean) / std).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-4, rtol=1e-3)

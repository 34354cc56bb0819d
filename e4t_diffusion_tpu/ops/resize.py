"""On-device image preprocessing for the CLIP-vision path.

TPU-native replacement for the reference's kornia on-GPU pipeline
(/root/reference/e4t/encoder.py:131-139): bicubic resize to 224^2 with
``align_corners=True, antialias=False``, [-1,1] -> [0,1], then CLIP
mean/std normalization.

Design: separable bicubic resampling with *static* shapes is a pair of
sparse row/column weight matrices. We materialize them as dense (out, in)
matrices at trace time and apply the resize as two matmuls — this maps the
whole preprocess onto the MXU and fuses with the normalization, instead of
the gather-heavy formulation a direct port would produce.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

# OpenAI CLIP normalization constants (/root/reference/e4t/encoder.py:128-129)
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def _cubic_kernel(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Keys cubic convolution kernel; a=-0.75 matches torch/kornia bicubic."""
    ax = np.abs(x)
    w = np.where(
        ax <= 1.0,
        (a + 2.0) * ax**3 - (a + 3.0) * ax**2 + 1.0,
        np.where(ax < 2.0, a * (ax**3 - 5.0 * ax**2 + 8.0 * ax - 4.0), 0.0),
    )
    return w


@functools.lru_cache(maxsize=32)
def _bicubic_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """Dense (out_size, in_size) resampling matrix for one axis."""
    m = np.zeros((out_size, in_size), dtype=np.float64)
    if out_size == 1:
        # degenerate: torch takes src coord 0 with align_corners
        m[0, 0] = 1.0
        return m.astype(np.float32)
    for o in range(out_size):
        if align_corners:
            src = o * (in_size - 1) / (out_size - 1)
        else:
            src = (o + 0.5) * in_size / out_size - 0.5
        i0 = int(np.floor(src))
        for tap in range(-1, 3):
            i = i0 + tap
            w = _cubic_kernel(np.array(src - i))
            ic = min(max(i, 0), in_size - 1)  # replicate border (torch behavior)
            m[o, ic] += float(w)
    return m.astype(np.float32)


def resize_bicubic_align_corners(
    x: jax.Array, out_h: int, out_w: int
) -> jax.Array:
    """Bicubic resize of NCHW images, align_corners=True, no antialias.

    Bit-parity target: torch.nn.functional.interpolate(mode='bicubic',
    align_corners=True) == kornia.geometry.resize(..., 'bicubic',
    align_corners=True, antialias=False), the reference's CLIP-path resize.
    """
    n, c, h, w = x.shape
    mh = jnp.asarray(_bicubic_matrix(h, out_h, True))   # (out_h, h)
    mw = jnp.asarray(_bicubic_matrix(w, out_w, True))   # (out_w, w)
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    # (n, c, out_h, w): contract over h
    y = jnp.einsum("oh,nchw->ncow", mh, xf, preferred_element_type=jnp.float32)
    # (n, c, out_h, out_w): contract over w
    y = jnp.einsum("pw,ncow->ncop", mw, y, preferred_element_type=jnp.float32)
    return y.astype(dtype)


def clip_preprocess(x: jax.Array, image_size: int = 224) -> jax.Array:
    """Full CLIP-vision preprocess: resize + [-1,1]->[0,1] + normalize.

    Input NCHW in [-1, 1] (the diffusion-path convention); mirrors
    E4TEncoder.preprocess (/root/reference/e4t/encoder.py:131-139).
    """
    x = resize_bicubic_align_corners(x, image_size, image_size)
    x = (x + 1.0) / 2.0
    mean = jnp.asarray(CLIP_MEAN, dtype=x.dtype).reshape(1, 3, 1, 1)
    std = jnp.asarray(CLIP_STD, dtype=x.dtype).reshape(1, 3, 1, 1)
    return (x - mean) / std

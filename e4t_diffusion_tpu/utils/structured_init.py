"""Name-aware structured random parameter fill.

Generates parameter trees with realistic magnitude structure WITHOUT
running a model's (possibly expensive) init program: kernels are
fan-in-scaled normals, norm scales ones, biases zeros, embeddings
N(0, 0.02^2) — the magnitude profile flax/torch defaults and trained
nets share. Used where weight VALUES matter but trained weights are
unavailable (no network egress): the int8 quality study
(scripts/int8_quality.py) and the full-geometry UNet numerics oracle
(tests/test_unet_full_geometry.py)."""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def structured_params(shapes, key):
    """Fill an ``jax.eval_shape``-produced param tree.

    conv HWIO kernels: fan_in = kh*kw*cin; dense (in, out): fan_in = in;
    'scale'/'gamma' leaves -> 1, 'bias'/'beta' -> 0,
    'embedding' -> N(0, 0.02^2), other 0/1-D leaves -> 0.
    """
    flat, treedef = jax.tree_util.tree_flatten_with_path(shapes)

    def fill(i, path, s):
        name = str(path[-1]).lower()
        k = jax.random.fold_in(key, i)
        if "scale" in name or "gamma" in name:
            return jnp.ones(s.shape, s.dtype)
        if "bias" in name or "beta" in name:
            return jnp.zeros(s.shape, s.dtype)
        if "embedding" in name:
            return 0.02 * jax.random.normal(k, s.shape, s.dtype)
        if s.ndim >= 2:
            fan_in = int(np.prod(s.shape[:-1]))
            return jax.random.normal(k, s.shape, s.dtype) / np.sqrt(fan_in)
        return jnp.zeros(s.shape, s.dtype)

    leaves = [fill(i, path, s) for i, (path, s) in enumerate(flat)]
    return jax.tree_util.tree_unflatten(treedef, leaves)

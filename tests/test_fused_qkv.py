"""E4T_FUSED_QKV=1 computes identical attention with identical params.

The fused mode replaces three per-projection matmuls with one matmul
against the trace-time-concatenated kernels (models/unet.py Attention);
the parameter tree (to_q/to_k/to_v kernels) is unchanged, so both modes
must be bit-compatible consumers of the same checkpoint.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from e4t_diffusion_tpu.models.unet import Attention


@pytest.mark.parametrize("cross", [False, True])
def test_fused_matches_separate(monkeypatch, cross):
    attn = Attention(heads=4, dim_head=8, out_dim=32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 32))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 7, 24)) if cross \
        else None

    monkeypatch.setenv("E4T_FUSED_QKV", "0")
    params = attn.init(jax.random.PRNGKey(2), x, ctx)["params"]
    ref = attn.apply({"params": params}, x, ctx)

    monkeypatch.setenv("E4T_FUSED_QKV", "1")
    params_fused = attn.init(jax.random.PRNGKey(2), x, ctx)["params"]
    # identical tree structure and shapes in both modes
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(params_fused)
    out = attn.apply({"params": params}, x, ctx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)

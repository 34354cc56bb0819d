"""E4T_VIT_GELU=tanh serving knob (round 4): the tanh-approximate GELU
recovers the ViT tower's 6.3 ms erf cost (scripts/bench_vit.py); these
tests pin (a) the knob's parsing/wiring and (b) a quality bound — the
approximation's feature-level deviation is orders below the int8
serving bound already accepted for this tower (--int8_aux).

Reference counterpart: the tower is open_clip's (exact erf), built at
/root/reference/e4t/encoder.py:91-96; exact stays the default.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from e4t_diffusion_tpu.models.vit import ViTConfig, VisionTransformer


def _tower_outputs(cfg, x):
    m = VisionTransformer(cfg)
    p = m.init(jax.random.PRNGKey(0), x)["params"]
    return m.apply({"params": p}, x)


def test_gelu_tanh_feature_bound():
    """tanh vs exact GELU: pooled/token features stay within a tight
    relative bound (same params, same input)."""
    cfg = ViTConfig.tiny()
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 28, 28))
    pooled_e, tok_e = _tower_outputs(cfg, x)
    pooled_t, tok_t = _tower_outputs(
        dataclasses.replace(cfg, gelu_approximate=True), x)
    for a, b in [(pooled_e, pooled_t), (tok_e, tok_t)]:
        a, b = np.asarray(a), np.asarray(b)
        rel = np.linalg.norm(a - b) / max(np.linalg.norm(a), 1e-12)
        # int8 aux serving accepts ~1e-1-level image deltas; the gelu
        # approx is ~100x tighter at feature level
        assert rel < 5e-3, rel


def test_env_knob_wiring(monkeypatch):
    """E4T_VIT_GELU=tanh at trace time flips the MLP to the tanh
    approximation (outputs match gelu_approximate=True exactly)."""
    cfg = ViTConfig.tiny()
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 28, 28))
    m = VisionTransformer(cfg)
    p = m.init(jax.random.PRNGKey(0), x)["params"]

    monkeypatch.setenv("E4T_VIT_GELU", "tanh")
    via_env = m.apply({"params": p}, x)
    monkeypatch.delenv("E4T_VIT_GELU")
    exact = m.apply({"params": p}, x)
    via_cfg = VisionTransformer(
        dataclasses.replace(cfg, gelu_approximate=True)).apply(
        {"params": p}, x)
    assert np.allclose(np.asarray(via_env[0]), np.asarray(via_cfg[0]))
    # and the knob actually changes something vs exact
    assert not np.array_equal(np.asarray(via_env[0]), np.asarray(exact[0]))

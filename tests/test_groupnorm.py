"""Fused GroupNorm(+SiLU) Pallas kernel vs flax nn.GroupNorm oracle.

Runs in interpret mode on the CPU test mesh (ops/groupnorm._use_interpret).
Covers the SD-v1 UNet site geometries (C/G as small as 10, HW from 64 to
4096 incl. the chunked >512-row path) and the flag-gated module dispatch
(param-tree equality between modes — checkpoint compatibility).
"""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from e4t_diffusion_tpu.ops.groupnorm import (
    fused_gn_fits, fused_group_norm)


@pytest.mark.parametrize("shape,groups", [
    ((2, 8, 8, 32), 8),          # cg=4, single chunk
    ((1, 16, 16, 20), 4),        # cg=5 (non-128 lane count)
    ((2, 8, 8, 320), 32),        # SD cg=10 lane geometry
    ((1, 32, 32, 40), 8),        # HW=1024: chunked stats/write loops
])
def test_matches_flax_group_norm(shape, groups):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape), jnp.float32)
    scale = jnp.asarray(rng.rand(shape[-1]) + 0.5, jnp.float32)
    bias = jnp.asarray(rng.randn(shape[-1]), jnp.float32)

    ref_mod = nn.GroupNorm(num_groups=groups, epsilon=1e-5)
    variables = {"params": {"scale": scale, "bias": bias}}
    ref = ref_mod.apply(variables, x)

    got = fused_group_norm(x, scale, bias, groups=groups, eps=1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    got_silu = fused_group_norm(x, scale, bias, groups=groups, eps=1e-5,
                                act="silu")
    np.testing.assert_allclose(np.asarray(got_silu),
                               np.asarray(nn.silu(ref)),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("act", [None, "silu"])
def test_custom_vjp_matches_flax_grads(act):
    """jax.grad through the fused kernel == grad through the flax path
    (the kernel's backward is the analytic VJP of an equivalent jnp
    forward) — E4T_FUSED_GN=1 must be safe inside training traces."""
    rng = np.random.RandomState(1)
    shape, groups = (2, 8, 8, 32), 8
    x = jnp.asarray(rng.randn(*shape), jnp.float32)
    scale = jnp.asarray(rng.rand(shape[-1]) + 0.5, jnp.float32)
    bias = jnp.asarray(rng.randn(shape[-1]), jnp.float32)
    cot = jnp.asarray(rng.randn(*shape), jnp.float32)

    def fused_loss(x, s, b):
        y = fused_group_norm(x, s, b, groups=groups, eps=1e-5, act=act)
        return jnp.sum(y * cot)

    def flax_loss(x, s, b):
        y = nn.GroupNorm(num_groups=groups, epsilon=1e-5).apply(
            {"params": {"scale": s, "bias": b}}, x)
        if act == "silu":
            y = nn.silu(y)
        return jnp.sum(y * cot)

    got = jax.grad(fused_loss, argnums=(0, 1, 2))(x, scale, bias)
    ref = jax.grad(flax_loss, argnums=(0, 1, 2))(x, scale, bias)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   rtol=2e-4, atol=2e-4)


def test_vae_flagged_matches_and_shares_params(monkeypatch):
    """Tiny VAE decode: E4T_FUSED_GN=1 output ~= flag-off output and the
    param trees are identical (the VAE now routes through the shared
    group_norm_act dispatcher)."""
    from e4t_diffusion_tpu.models.vae import AutoencoderKL, VAEConfig

    cfg = VAEConfig.tiny()
    model = AutoencoderKL(cfg)
    rng = jax.random.PRNGKey(0)
    px = cfg.sample_size
    img = jax.random.normal(rng, (1, 3, px, px))

    monkeypatch.delenv("E4T_FUSED_GN", raising=False)
    params = model.init(rng, img, rng)["params"]
    z = jax.random.normal(rng, (1, cfg.latent_channels, px // 4, px // 4))
    ref = model.apply({"params": params}, z, method=AutoencoderKL.decode)

    monkeypatch.setenv("E4T_FUSED_GN", "1")
    params_fused = model.init(rng, img, rng)["params"]
    ref_tree = jax.tree_util.tree_map(lambda x: (x.shape, str(x.dtype)),
                                      params)
    fused_tree = jax.tree_util.tree_map(lambda x: (x.shape, str(x.dtype)),
                                        params_fused)
    assert ref_tree == fused_tree
    got = model.apply({"params": params}, z, method=AutoencoderKL.decode)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_env_flag_parsing(monkeypatch):
    from e4t_diffusion_tpu.ops.groupnorm import fused_gn_enabled

    for off in ("0", "false", "False", "FALSE", ""):
        monkeypatch.setenv("E4T_FUSED_GN", off)
        assert not fused_gn_enabled()
    for on in ("1", "true", "True"):
        monkeypatch.setenv("E4T_FUSED_GN", on)
        assert fused_gn_enabled()


def test_bf16_output_dtype():
    x = jnp.ones((1, 8, 8, 32), jnp.bfloat16)
    out = fused_group_norm(x, jnp.ones((32,)), jnp.zeros((32,)),
                           groups=8, eps=1e-5)
    assert out.dtype == jnp.bfloat16


def test_fits_predicate():
    assert fused_gn_fits((16, 64, 64, 320), jnp.bfloat16)   # UNet level 0
    assert not fused_gn_fits((8, 512, 512, 128), jnp.bfloat16)  # VAE tail


def test_flagged_unet_matches_and_shares_params(monkeypatch):
    """Tiny UNet forward: E4T_FUSED_GN=1 output ~= flag-off output, and
    the param trees are identical (same names/shapes -> same ckpts)."""
    from e4t_diffusion_tpu.models.unet import UNet2DConditionModel, UNetConfig

    cfg = UNetConfig.tiny()
    model = UNet2DConditionModel(cfg)
    rng = jax.random.PRNGKey(0)
    lat = cfg.sample_size
    sample = jax.random.normal(rng, (1, cfg.in_channels, lat, lat))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jax.random.normal(jax.random.fold_in(rng, 1),
                            (1, 7, cfg.cross_attention_dim))

    monkeypatch.delenv("E4T_FUSED_GN", raising=False)
    params = model.init(rng, sample, t, ctx)["params"]
    ref = model.apply({"params": params}, sample, t, ctx)

    monkeypatch.setenv("E4T_FUSED_GN", "1")
    params_fused = model.init(rng, sample, t, ctx)["params"]
    ref_tree = jax.tree_util.tree_map(lambda x: (x.shape, str(x.dtype)),
                                      params)
    fused_tree = jax.tree_util.tree_map(lambda x: (x.shape, str(x.dtype)),
                                        params_fused)
    assert ref_tree == fused_tree
    got = model.apply({"params": params}, sample, t, ctx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

"""8-bit AdamW tests: quantization round-trip + optimization parity."""
import numpy as np
import jax
import jax.numpy as jnp
import optax

from e4t_diffusion_tpu.training.optim8bit import (
    _quantize, _dequantize, adamw_8bit)


def test_quantize_roundtrip_relative_error_bounded():
    rng = np.random.default_rng(0)
    for signed, half_step in ((True, 10 ** (7 / 252.0) - 1),
                              (False, 10 ** (7 / 508.0) - 1)):
        x = jnp.asarray(rng.standard_normal(1000).astype(np.float32))
        if not signed:
            x = jnp.abs(x)
        q = _quantize(x, 256, signed)
        back = np.asarray(_dequantize(q, x.shape, signed))
        x = np.asarray(x)
        # log codebook: bounded RELATIVE error above the 1e-7*absmax floor
        floor = np.abs(x).max() * 1e-6
        mask = np.abs(x) > floor
        rel = np.abs(back[mask] - x[mask]) / np.abs(x[mask])
        assert rel.max() <= half_step * 1.2
        # tiny values may flush to zero but never blow up
        if (~mask).any():
            assert np.abs(back[~mask]).max() <= floor * 2
        # signs preserved
        assert np.all(np.sign(back[mask]) == np.sign(x[mask]))


def test_adamw_8bit_tracks_fp32_adamw():
    """On a quadratic, 8-bit AdamW should follow fp32 AdamW closely."""
    target = jnp.asarray(np.random.default_rng(1)
                         .standard_normal((4, 64)).astype(np.float32))

    def loss(p):
        return jnp.mean((p - target) ** 2)

    def run(tx, steps=60):
        p = jnp.zeros_like(target)
        state = tx.init(p)
        for _ in range(steps):
            g = jax.grad(loss)(p)
            up, state = tx.update(g, state, p)
            p = optax.apply_updates(p, up)
        return p

    p8 = run(adamw_8bit(1e-2))
    p32 = run(optax.adamw(1e-2))
    # both should approach the target; trajectories match to quant noise
    assert float(loss(p8)) < 0.5 * float(loss(jnp.zeros_like(target)))
    np.testing.assert_allclose(np.asarray(p8), np.asarray(p32), atol=1e-1)


def test_adamw_8bit_state_memory_is_int8():
    tx = adamw_8bit(1e-3)
    p = {"w": jnp.zeros((512, 512)), "b": jnp.zeros((7,))}
    state = tx.init(p)
    adam_state = state[0]
    for leaf in jax.tree_util.tree_leaves(adam_state.mu):
        assert leaf.dtype in (jnp.int8, jnp.float32)
    q_bytes = sum(l.size for l in jax.tree_util.tree_leaves(adam_state.mu)
                  if l.dtype == jnp.int8)
    assert q_bytes >= 512 * 512  # payload stored as int8


def test_adamw_8bit_in_train_step():
    """Full tiny train step with the 8-bit optimizer."""
    from e4t_diffusion_tpu.diffusion.pipeline import E4TModules
    from e4t_diffusion_tpu.diffusion.schedulers import DDPMScheduler
    from e4t_diffusion_tpu.models import weight_offsets as wo
    from e4t_diffusion_tpu.training.train_step import (
        E4TTrainConfig, create_train_state, make_optimizer, make_train_step)

    modules = E4TModules.tiny()
    rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 5)
    tcfg = modules.text_encoder.config
    ecfg = modules.e4t_encoder.config
    L = tcfg.max_position_embeddings
    params = {
        "unet": modules.unet.init(
            ks[0], jnp.zeros((1, 4, 8, 8)), jnp.array([0]),
            jnp.zeros((1, L, tcfg.hidden_size)))["params"],
        "vae": modules.vae.init(ks[1], jnp.zeros((1, 3, 32, 32)),
                                ks[1])["params"],
        "text": modules.text_encoder.init(
            ks[2], jnp.zeros((1, L), jnp.int32))["params"],
        "e4t": modules.e4t_encoder.init(
            ks[3], jnp.zeros((1, 3, 32, 32)),
            jnp.zeros((1, ecfg.unet_feature_dim)))["params"],
        "offsets": wo.init_offset_bank(ks[4], modules.unet.config),
    }
    cfg = E4TTrainConfig()
    tx = make_optimizer(1e-3, cfg, use_8bit=True)
    state, frozen = create_train_state(params, cfg, tx)
    step = jax.jit(make_train_step(modules, DDPMScheduler(), cfg, tx))
    batch = {
        "latents": jax.random.normal(rng, (2, 4, 16, 16)),
        "pixel_values": jax.random.uniform(rng, (2, 3, 32, 32), minval=-1),
        "input_ids": jnp.zeros((2, L), jnp.int32).at[:, 3].set(7),
        "placeholder_idx": jnp.full((2,), 3, jnp.int32),
        "uncond_ids": jnp.zeros((1, L), jnp.int32),
        "class_token_id": jnp.asarray(5, jnp.int32),
    }
    state2, metrics = step(state, frozen, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    leaves_a = jax.tree_util.tree_leaves(state.trainable)
    leaves_b = jax.tree_util.tree_leaves(state2.trainable)
    assert any(not np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(leaves_a, leaves_b))

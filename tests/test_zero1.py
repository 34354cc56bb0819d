"""ZeRO-1 optimizer-state sharding: same numerics, sharded placement."""
import numpy as np
import jax
import jax.numpy as jnp

from e4t_diffusion_tpu.diffusion.pipeline import E4TModules
from e4t_diffusion_tpu.diffusion.schedulers import DDPMScheduler
from e4t_diffusion_tpu.models import weight_offsets as wo
from e4t_diffusion_tpu.parallel import mesh as pmesh
from e4t_diffusion_tpu.training.train_step import (
    E4TTrainConfig, create_train_state, make_optimizer, make_train_step,
    TrainState)


def test_zero1_sharded_step_matches_replicated():
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
    mesh = pmesh.get_mesh()
    cfg = E4TTrainConfig()
    tx = make_optimizer(1e-3, cfg)
    state, frozen = create_train_state(params, cfg, tx)
    step = jax.jit(make_train_step(modules, DDPMScheduler(), cfg, tx))

    batch = {
        "latents": jax.random.normal(rng, (8, 4, 16, 16)),
        "pixel_values": jax.random.uniform(rng, (8, 3, 32, 32), minval=-1),
        "input_ids": jnp.zeros((8, L), jnp.int32).at[:, 3].set(77),
        "placeholder_idx": jnp.full((8,), 3, jnp.int32),
        "uncond_ids": jnp.zeros((1, L), jnp.int32),
        "class_token_id": jnp.asarray(5, jnp.int32),
    }

    # replicated reference
    state_ref, metrics_ref = step(state, frozen, batch, jax.random.PRNGKey(1))

    # ZeRO-1: params replicated, opt state sharded over dp
    state_z = TrainState(
        step=jax.device_put(state.step, pmesh.replicated(mesh)),
        trainable=pmesh.replicate(state.trainable, mesh),
        opt_state=pmesh.apply_zero1(state.opt_state, mesh),
    )
    frozen_r = pmesh.replicate(frozen, mesh)
    batch_s = pmesh.shard_batch(batch, mesh)
    state_z2, metrics_z = step(state_z, frozen_r, batch_s,
                               jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(metrics_z["loss"]),
                               float(metrics_ref["loss"]), rtol=1e-4)

    # at least one moment leaf is actually sharded over dp
    shardings = pmesh.zero1_sharding(state.opt_state, mesh)
    specs = [s.spec for s in jax.tree_util.tree_leaves(
        shardings, is_leaf=lambda x: hasattr(x, "spec"))]
    assert any(pmesh.DATA_AXIS in str(s) for s in specs)

    # updated trainables match the replicated run
    la = jax.tree_util.tree_leaves(state_ref.trainable)
    lb = jax.tree_util.tree_leaves(state_z2.trainable)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)

"""Train-step tests on tiny configs.

Mirrors the reference's executable smoke oracle
(/root/reference/e4t/encoder.py:171-296): run full E4T train steps, check
the loss is finite and decreasing-ish, and that exactly the trainable
parameter groups changed. Adds what the reference never had: a sharded
data-parallel step on a fake 8-device mesh.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from e4t_diffusion_tpu.diffusion.pipeline import E4TModules
from e4t_diffusion_tpu.diffusion.schedulers import DDPMScheduler
from e4t_diffusion_tpu.models import weight_offsets as wo
from e4t_diffusion_tpu.parallel import mesh as pmesh
from e4t_diffusion_tpu.training.train_step import (
    E4TTrainConfig, create_train_state, make_optimizer, make_train_step,
    encode_latents, split_trainable,
)


@pytest.fixture(scope="module")
def tiny_world():
    modules = E4TModules.tiny()
    rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 5)
    tcfg = modules.text_encoder.config
    ecfg = modules.e4t_encoder.config
    params = {
        "unet": modules.unet.init(
            ks[0], jnp.zeros((1, 4, 8, 8)), jnp.array([0]),
            jnp.zeros((1, tcfg.max_position_embeddings,
                       tcfg.hidden_size)))["params"],
        "vae": modules.vae.init(ks[1], jnp.zeros((1, 3, 32, 32)),
                                ks[1])["params"],
        "text": modules.text_encoder.init(
            ks[2], jnp.zeros((1, tcfg.max_position_embeddings),
                             jnp.int32))["params"],
        "e4t": modules.e4t_encoder.init(
            ks[3], jnp.zeros((1, 3, 32, 32)),
            jnp.zeros((1, ecfg.unet_feature_dim)))["params"],
        "offsets": wo.init_offset_bank(ks[4], modules.unet.config),
    }
    return modules, params


def _make_batch(modules, params, bsz, seed=0):
    rng = jax.random.PRNGKey(seed)
    tcfg = modules.text_encoder.config
    L = tcfg.max_position_embeddings
    pixels = jax.random.uniform(rng, (bsz, 3, 32, 32), minval=-1, maxval=1)
    latents = encode_latents(modules, params["vae"], pixels, rng)
    input_ids = jnp.zeros((bsz, L), jnp.int32).at[:, 3].set(77)
    return {
        "latents": latents,
        "pixel_values": pixels,
        "input_ids": input_ids,
        "placeholder_idx": jnp.full((bsz,), 3, jnp.int32),
        "uncond_ids": jnp.zeros((1, L), jnp.int32),
        "class_token_id": jnp.asarray(5, jnp.int32),
    }


def _changed(a, b):
    return any(
        not np.array_equal(np.asarray(x), np.asarray(y))
        for x, y in zip(jax.tree_util.tree_leaves(a),
                        jax.tree_util.tree_leaves(b)))


def test_pretrain_step_updates_only_offsets_and_encoder(tiny_world):
    modules, params = tiny_world
    cfg = E4TTrainConfig()  # phase 1: unet+text frozen
    tx = make_optimizer(1e-3, cfg)
    state, frozen = create_train_state(params, cfg, tx)
    step = jax.jit(make_train_step(modules, DDPMScheduler(), cfg, tx))

    batch = _make_batch(modules, params, 2)
    state2, metrics = step(state, frozen, batch, jax.random.PRNGKey(1))
    assert np.isfinite(metrics["loss"])
    assert metrics["loss_reg"] > 0
    assert int(state2.step) == 1
    # offsets and e4t changed; frozen stayed (only trainable exists in state)
    assert _changed(state.trainable["offsets"], state2.trainable["offsets"])
    assert _changed(state.trainable["e4t"], state2.trainable["e4t"])
    assert set(state.trainable.keys()) == {"e4t", "offsets"}
    assert set(frozen.keys()) == {"unet", "vae", "text", "e4t_frozen"}
    # the frozen ViT tower is excluded from the trainables (reference
    # freezes clip_vision by default, encoder.py:98-99)
    assert "clip_vision" not in state.trainable["e4t"]
    assert "clip_vision" in frozen["e4t_frozen"]


def test_tuning_step_trains_full_unet(tiny_world):
    modules, params = tiny_world
    cfg = E4TTrainConfig(train_unet=True, train_text_encoder=True,
                         max_grad_norm=1.0, reg_lambda=1e-4)
    tx = make_optimizer(1e-4, cfg)
    state, frozen = create_train_state(params, cfg, tx)
    step = jax.jit(make_train_step(modules, DDPMScheduler(), cfg, tx))
    batch = _make_batch(modules, params, 2)
    state2, metrics = step(state, frozen, batch, jax.random.PRNGKey(2))
    assert np.isfinite(metrics["loss"])
    assert _changed(state.trainable["unet"], state2.trainable["unet"])
    assert _changed(state.trainable["text"], state2.trainable["text"])
    assert set(frozen.keys()) == {"vae", "e4t_frozen"}
    # clipping active: grad norm metric present and finite
    assert np.isfinite(metrics["grad_norm"])


def test_loss_decreases_over_steps(tiny_world):
    modules, params = tiny_world
    cfg = E4TTrainConfig()
    tx = make_optimizer(3e-3, cfg)
    state, frozen = create_train_state(params, cfg, tx)
    step = jax.jit(make_train_step(modules, DDPMScheduler(), cfg, tx))
    batch = _make_batch(modules, params, 2)
    losses = []
    for i in range(8):
        state, metrics = step(state, frozen, batch, jax.random.PRNGKey(0))
        losses.append(float(metrics["loss"]))
    # reg term is strongly positive at init; training should shrink loss
    assert losses[-1] < losses[0]


def test_data_parallel_step_on_8_device_mesh(tiny_world):
    modules, params = tiny_world
    mesh = pmesh.get_mesh()
    assert mesh.devices.size == 8
    cfg = E4TTrainConfig()
    tx = make_optimizer(1e-3, cfg)
    state, frozen = create_train_state(params, cfg, tx)
    step = jax.jit(make_train_step(modules, DDPMScheduler(), cfg, tx))

    batch = _make_batch(modules, params, 8)
    state_r = pmesh.replicate(state, mesh)
    frozen_r = pmesh.replicate(frozen, mesh)
    batch_s = pmesh.shard_batch(batch, mesh)
    # class_token_id is scalar — replicate it instead
    batch_s["class_token_id"] = jax.device_put(
        batch["class_token_id"], pmesh.replicated(mesh))
    batch_s["uncond_ids"] = jax.device_put(
        batch["uncond_ids"], pmesh.replicated(mesh))

    state2, metrics = step(state_r, frozen_r, batch_s,
                           jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))

    # gradient is the mean over the global batch: compare against the
    # unsharded step on the same batch
    state_ref, metrics_ref = jax.jit(
        make_train_step(modules, DDPMScheduler(), cfg, tx))(
        state, frozen, batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(metrics["loss"]),
                               float(metrics_ref["loss"]), rtol=1e-4)


def test_microbatched_step_matches_manual_chunk_average(tiny_world):
    """micro_batches=2: the accumulated grads equal the mean of per-chunk
    value_and_grad calls under the same rng folding, and the full step
    (optimizer included) matches a step driven by those manual grads."""
    from e4t_diffusion_tpu.training.train_step import (_microbatched_grads,
                                                       e4t_loss_fn)

    modules, params = tiny_world
    cfg = E4TTrainConfig(train_unet=True, max_grad_norm=1.0,
                         reg_lambda=1e-4, micro_batches=2)
    tx = make_optimizer(1e-4, cfg)
    state, frozen = create_train_state(params, cfg, tx)
    batch = _make_batch(modules, params, 4)
    rng = jax.random.PRNGKey(7)

    # manual reference: two chunks of 2, grads averaged
    step_rng = jax.random.fold_in(rng, state.step)
    manual = None
    for idx in range(2):
        chunk = {k: (v[2 * idx:2 * idx + 2]
                     if k in ("latents", "pixel_values", "input_ids",
                              "placeholder_idx") else v)
                 for k, v in batch.items()}
        g = jax.grad(
            lambda t: e4t_loss_fn(modules, ddpm := DDPMScheduler(), cfg, t,
                                  frozen, chunk,
                                  jax.random.fold_in(step_rng, idx))[0]
        )(state.trainable)
        manual = g if manual is None else jax.tree_util.tree_map(
            lambda a, b: a + b, manual, g)
    manual = jax.tree_util.tree_map(lambda x: x / 2, manual)

    from e4t_diffusion_tpu.ops.attention import flash_threshold
    with flash_threshold(0 if cfg.all_flash else (1 << 62)):
        grads, metrics = _microbatched_grads(
            modules, DDPMScheduler(), cfg, state.trainable, frozen, batch,
            step_rng)
    flat_a = jax.tree_util.tree_leaves(grads)
    flat_b = jax.tree_util.tree_leaves(manual)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)
    assert np.isfinite(float(metrics["loss"]))

    # and the jitted end-to-end step runs and updates the UNet
    step = jax.jit(make_train_step(modules, DDPMScheduler(), cfg, tx))
    state2, m2 = step(state, frozen, batch, rng)
    assert np.isfinite(float(m2["loss"]))
    assert _changed(state.trainable["unet"], state2.trainable["unet"])


def test_microbatched_pretrain_step_without_latents(tiny_world):
    """Phase-1 path (per-step VAE encode, latents=None) under
    micro_batches=2."""
    modules, params = tiny_world
    cfg = E4TTrainConfig(micro_batches=2)
    tx = make_optimizer(1e-3, cfg)
    state, frozen = create_train_state(params, cfg, tx)
    batch = dict(_make_batch(modules, params, 4), latents=None)
    step = jax.jit(make_train_step(modules, DDPMScheduler(), cfg, tx))
    state2, metrics = step(state, frozen, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss"]))
    assert _changed(state.trainable["offsets"], state2.trainable["offsets"])

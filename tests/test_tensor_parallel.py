"""Tensor parallelism over the UNet transformer sites (dp x tp mesh).

Beyond reference parity: the reference's only parallelism is DDP data
parallelism (SURVEY.md §2.4). These tests validate that a 2-D (dp, tp)
mesh with Megatron-style column/row-parallel PartitionSpecs on the
attention / feed-forward kernels produces the SAME numerics as the
replicated single-device path — XLA SPMD inserts the collectives.
Runs on the virtual 8-device CPU mesh (conftest).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.sharding import NamedSharding, PartitionSpec as P

from e4t_diffusion_tpu.parallel import mesh as pmesh


@pytest.fixture(scope="module")
def tp_mesh():
    mesh = pmesh.get_mesh(tp=2)
    assert mesh.shape == {"dp": 4, "tp": 2}
    return mesh


@pytest.fixture(scope="module")
def tiny_unet():
    from e4t_diffusion_tpu.models.unet import UNet2DConditionModel, UNetConfig

    cfg = UNetConfig.tiny()
    model = UNet2DConditionModel(cfg)
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jnp.zeros((1, 4, 8, 8)), jnp.array([0]),
                        jnp.zeros((1, 7, cfg.cross_attention_dim)))["params"]
    return model, params


def test_specs_cover_attention_and_ff(tiny_unet, tp_mesh):
    _, params = tiny_unet
    specs = pmesh.tensor_parallel_specs(params, tp_mesh)
    flat = jax.tree_util.tree_flatten_with_path(specs)[0]
    seen = {"col": 0, "row": 0, "rep": 0}
    for path, sharding in flat:
        keys = [getattr(p, "key", "") for p in path]
        spec = sharding.spec
        if "to_q" in keys or "to_k" in keys or "to_v" in keys:
            assert spec[-1] == "tp", keys
            seen["col"] += 1
        elif "to_out_0" in keys and keys[-1] == "kernel":
            assert spec[-2] == "tp", keys
            seen["row"] += 1
        elif "norm1" in keys or "conv1" in keys:
            assert spec == P(), keys
            seen["rep"] += 1
    assert seen["col"] > 0 and seen["row"] > 0 and seen["rep"] > 0


def test_tp_forward_matches_replicated(tiny_unet, tp_mesh):
    model, params = tiny_unet
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 4, 8, 8))
    t = jnp.array([3, 5, 7, 9])
    ctx = jax.random.normal(jax.random.PRNGKey(2), (4, 7,
                            model.config.cross_attention_dim))

    fn = jax.jit(lambda p, x, t, c: model.apply({"params": p}, x, t, c))
    ref = fn(params, x, t, ctx)

    params_tp = pmesh.apply_tensor_parallel(params, tp_mesh)
    xs = jax.device_put(x, NamedSharding(tp_mesh, P("dp")))
    with tp_mesh:
        out = fn(params_tp, xs, t, ctx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_tp_train_step_matches_replicated(tp_mesh):
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
    cfg = E4TTrainConfig(train_unet=True)
    tx = make_optimizer(1e-3, cfg)
    state, frozen = create_train_state(params, cfg, tx)
    step = jax.jit(make_train_step(modules, DDPMScheduler(), cfg, tx))

    batch = {
        "latents": jax.random.normal(ks[0], (8, 4, 16, 16)),
        "pixel_values": jax.random.uniform(ks[1], (8, 3, 32, 32), minval=-1),
        "input_ids": jnp.zeros((8, L), jnp.int32).at[:, 3].set(77),
        "placeholder_idx": jnp.full((8,), 3, jnp.int32),
        "uncond_ids": jnp.zeros((1, L), jnp.int32),
        "class_token_id": jnp.asarray(5, jnp.int32),
    }
    _, metrics_ref = step(state, frozen, batch, jax.random.PRNGKey(1))

    rep = pmesh.replicated(tp_mesh)
    state_tp = jax.device_put(state, rep)
    state_tp.trainable["unet"] = pmesh.apply_tensor_parallel(
        state_tp.trainable["unet"], tp_mesh)
    frozen_tp = jax.device_put(frozen, rep)
    batch_tp = pmesh.shard_batch(batch, tp_mesh)
    batch_tp["class_token_id"] = jax.device_put(batch["class_token_id"], rep)
    batch_tp["uncond_ids"] = jax.device_put(batch["uncond_ids"], rep)

    with tp_mesh:
        state2, metrics = step(state_tp, frozen_tp, batch_tp,
                               jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(metrics["loss"]),
                               float(metrics_ref["loss"]), rtol=2e-4)
    assert np.isfinite(float(metrics["grad_norm"]))

    # all-flash under TP: flash runs head-sharded via shard_map
    # (make_train_step(tp_mesh=...)); same numerics as the plain step
    step_hs = jax.jit(make_train_step(modules, DDPMScheduler(), cfg, tx,
                                      tp_mesh=tp_mesh))
    with tp_mesh:
        _, metrics_hs = step_hs(state_tp, frozen_tp, batch_tp,
                                jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(metrics_hs["loss"]),
                               float(metrics_ref["loss"]), rtol=2e-4)


def test_tp_sampling_matches_replicated(tp_mesh):
    """Tensor-parallel serving: make_sample_fn(tp_mesh=...) with
    TP-sharded UNet params reproduces the replicated sampler, with the
    flash path forced so head-sharded shard_map is genuinely used."""
    from e4t_diffusion_tpu.diffusion.pipeline import (E4TModules,
                                                      make_sample_fn)
    from e4t_diffusion_tpu.diffusion.schedulers import (DDIMScheduler,
                                                        NoiseScheduleConfig)
    from e4t_diffusion_tpu.models import weight_offsets as wo
    from e4t_diffusion_tpu.ops import attention as A

    modules = E4TModules.tiny()
    rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 6)
    tcfg = modules.text_encoder.config
    ecfg = modules.e4t_encoder.config
    L = tcfg.max_position_embeddings
    unet_params = modules.unet.init(
        ks[0], jnp.zeros((1, 4, 8, 8)), jnp.array([0]),
        jnp.zeros((1, L, tcfg.hidden_size)))["params"]
    vae_params = modules.vae.init(ks[1], jnp.zeros((1, 3, 32, 32)),
                                  ks[1])["params"]
    text_params = modules.text_encoder.init(
        ks[2], jnp.zeros((1, L), jnp.int32))["params"]
    e4t_params = modules.e4t_encoder.init(
        ks[3], jnp.zeros((1, 3, 32, 32)),
        jnp.zeros((1, ecfg.unet_feature_dim)))["params"]
    offsets = wo.init_offset_bank(ks[4], modules.unet.config)

    sched = DDIMScheduler(NoiseScheduleConfig())
    latents = jax.random.normal(ks[5], (2, 4, 8, 8))
    pixel = jnp.zeros((1, 3, 32, 32))
    embeds = jnp.zeros((1, L, tcfg.hidden_size))
    call_args = (offsets, vae_params, text_params, e4t_params,
                 latents, pixel, embeds, jnp.full((2,), 3, jnp.int32),
                 jnp.zeros((1, L), jnp.int32),
                 jnp.zeros((tcfg.hidden_size,)), jax.random.PRNGKey(7))

    with A.flash_threshold(0):  # force flash everywhere (trace-time)
        fn_ref = make_sample_fn(modules, sched, 3, 7.5, 0.1)
        ref = np.asarray(fn_ref(unet_params, *call_args))

        unet_tp = pmesh.apply_tensor_parallel(unet_params, tp_mesh)
        fn_tp = make_sample_fn(modules, sched, 3, 7.5, 0.1,
                               tp_mesh=tp_mesh)
        with tp_mesh:
            out = np.asarray(fn_tp(unet_tp, *call_args))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)


def test_head_sharded_flash_matches_plain(tp_mesh):
    from e4t_diffusion_tpu.ops import attention as A

    q = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 256, 40))
    k = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 256, 40))
    v = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 256, 40))
    ref = A.flash_attention(q, k, v)
    ref_grad = jax.grad(lambda q: A.flash_attention(q, k, v).sum())(q)
    with tp_mesh, A.head_sharded_attention(tp_mesh):
        out = jax.jit(lambda q, k, v: A._maybe_head_sharded_flash(
            q, k, v, 1.0 / np.sqrt(40)))(q, k, v)
        g = jax.grad(lambda q: A._maybe_head_sharded_flash(
            q, k, v, 1.0 / np.sqrt(40)).sum())(q)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g), np.asarray(ref_grad),
                               atol=1e-5, rtol=1e-5)


def test_head_sharded_flash_dp_sharded_batch(tp_mesh):
    """With the batch dp-sharded (training layout), the flash shard_map
    must keep the batch dim on dp — no all-gather of q/k/v, no redundant
    global-batch attention per dp group (ADVICE r1, medium)."""
    from e4t_diffusion_tpu.ops import attention as A

    q = jax.random.normal(jax.random.PRNGKey(0), (4, 4, 256, 40))
    k = jax.random.normal(jax.random.PRNGKey(1), (4, 4, 256, 40))
    v = jax.random.normal(jax.random.PRNGKey(2), (4, 4, 256, 40))
    ref = A.flash_attention(q, k, v)
    shd = NamedSharding(tp_mesh, P("dp"))
    qs, ks, vs = (jax.device_put(x, shd) for x in (q, k, v))
    with tp_mesh, A.head_sharded_attention(tp_mesh):
        out = jax.jit(lambda q, k, v: A._maybe_head_sharded_flash(
            q, k, v, 1.0 / np.sqrt(40)))(qs, ks, vs)
        g = jax.grad(lambda q: A._maybe_head_sharded_flash(
            q, k, v, 1.0 / np.sqrt(40)).sum())(qs)
    # batch dim stays sharded over dp end to end
    assert out.sharding.spec[0] == "dp", out.sharding.spec
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
    ref_grad = jax.grad(lambda q: A.flash_attention(q, k, v).sum())(q)
    np.testing.assert_allclose(np.asarray(g), np.asarray(ref_grad),
                               atol=1e-5, rtol=1e-5)

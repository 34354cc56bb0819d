"""int8 serving quantization (ops/quant.py).

Covers: per-channel weight + per-tensor activation int8 error bounds on
the drop-in Dense/Conv layers, exactness of the param rewrite (only
matmul/conv kernels change), UNet forward int8-vs-f32 agreement at tiny
config, and the end-to-end int8 sampling path through make_sample_fn.
Real-checkpoint image-quality validation requires staged weights; these
tests bound the numerical error the scheme introduces.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from e4t_diffusion_tpu.ops import quant


def _rel_err(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12)


def test_dense_int8_close_to_f32():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 64)).astype(np.float32))
    layer = quant.Dense(features=32)
    params = layer.init(jax.random.PRNGKey(0), x)["params"]
    ref = layer.apply({"params": params}, x)
    qparams = quant.quantize_params(dict(params))
    out = layer.apply({"params": qparams}, x)
    # int8 per-channel weights + per-tensor activations: ~1% relative
    assert _rel_err(out, ref) < 2e-2, _rel_err(out, ref)


def test_conv_int8_close_to_f32():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 16)).astype(np.float32))
    layer = quant.Conv(features=24, kernel_size=(3, 3), padding=1)
    params = layer.init(jax.random.PRNGKey(0), x)["params"]
    ref = layer.apply({"params": params}, x)
    qparams = quant.quantize_params(dict(params))
    out = layer.apply({"params": qparams}, x)
    assert out.shape == ref.shape
    assert _rel_err(out, ref) < 2e-2, _rel_err(out, ref)


def test_drop_ins_match_flax_layers_unquantized():
    """The Dense/Conv drop-ins must be numerically identical to
    nn.Dense/nn.Conv on plain params (same init, same math)."""
    from flax import linen as nn

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(3, 10)).astype(np.float32))
    ours = quant.Dense(features=7)
    theirs = nn.Dense(features=7)
    p1 = ours.init(jax.random.PRNGKey(5), x)["params"]
    p2 = theirs.init(jax.random.PRNGKey(5), x)["params"]
    for k in p1:
        np.testing.assert_array_equal(np.asarray(p1[k]), np.asarray(p2[k]))
    np.testing.assert_allclose(
        np.asarray(ours.apply({"params": p1}, x)),
        np.asarray(theirs.apply({"params": p1}, x)), atol=1e-6)

    xc = jnp.asarray(rng.normal(size=(2, 6, 6, 4)).astype(np.float32))
    ours_c = quant.Conv(features=5, kernel_size=(3, 3), padding=1,
                        strides=(2, 2))
    theirs_c = nn.Conv(features=5, kernel_size=(3, 3), padding=1,
                       strides=(2, 2))
    pc1 = ours_c.init(jax.random.PRNGKey(6), xc)["params"]
    pc2 = theirs_c.init(jax.random.PRNGKey(6), xc)["params"]
    for k in pc1:
        np.testing.assert_array_equal(np.asarray(pc1[k]), np.asarray(pc2[k]))
    np.testing.assert_allclose(
        np.asarray(ours_c.apply({"params": pc1}, xc)),
        np.asarray(theirs_c.apply({"params": pc1}, xc)), atol=1e-6)


def test_quantize_params_rewrites_only_kernels():
    tree = {
        "block": {
            "conv1": {"kernel": jnp.ones((3, 3, 4, 8)),
                      "bias": jnp.zeros((8,))},
            "norm": {"scale": jnp.ones((4,)), "bias": jnp.zeros((4,))},
            "dense": {"kernel": jnp.ones((4, 8)), "bias": jnp.zeros((8,))},
        },
    }
    q = quant.quantize_params(tree)
    assert quant.is_quantized(q["block"]["conv1"]["kernel"])
    assert q["block"]["conv1"]["kernel"]["q"].dtype == jnp.int8
    assert quant.is_quantized(q["block"]["dense"]["kernel"])
    np.testing.assert_array_equal(np.asarray(q["block"]["norm"]["scale"]),
                                  np.asarray(tree["block"]["norm"]["scale"]))
    np.testing.assert_array_equal(np.asarray(q["block"]["conv1"]["bias"]),
                                  np.asarray(tree["block"]["conv1"]["bias"]))


def test_quantize_params_default_exclusions(tiny_unet_world, monkeypatch):
    """First/last convs + timestep MLP stay full precision by default
    (advisor r2 / standard diffusion PTQ); E4T_INT8_EXCLUDE= (empty)
    quantizes everything."""
    _, params = tiny_unet_world
    q = quant.quantize_params(params["unet"])
    assert not quant.is_quantized(q["conv_in"]["kernel"])
    assert not quant.is_quantized(q["conv_out"]["kernel"])
    assert not quant.is_quantized(
        q["time_embedding"]["linear_1"]["kernel"])
    # interior sites are still rewritten
    n_q = sum(quant.is_quantized(l) for l in
              jax.tree_util.tree_leaves(
                  q, is_leaf=quant.is_quantized))
    assert n_q > 10

    monkeypatch.setenv("E4T_INT8_EXCLUDE", "")
    q_all = quant.quantize_params(params["unet"])
    assert quant.is_quantized(q_all["conv_in"]["kernel"])
    assert quant.is_quantized(q_all["conv_out"]["kernel"])


def test_unet_forward_int8_close(tiny_unet_world):
    modules, params = tiny_unet_world
    rng = jax.random.PRNGKey(3)
    x = jax.random.normal(rng, (2, 4, 8, 8))
    t = jnp.array([5, 100], jnp.int32)
    ctx = jax.random.normal(rng, (2, 77, modules.text_encoder.config.hidden_size))
    ref = modules.unet.apply({"params": params["unet"]}, x, t, ctx)
    qp = quant.quantize_params(params["unet"])
    out = modules.unet.apply({"params": qp}, x, t, ctx)
    err = _rel_err(out, ref)
    # ~30 quantized matmuls deep at tiny width; random weights are the
    # adversarial case for PTQ (no outlier structure) — bound stays small
    assert err < 8e-2, err


def test_sampling_pipeline_int8_runs(tiny_unet_world):
    from e4t_diffusion_tpu.diffusion.pipeline import make_sample_fn
    from e4t_diffusion_tpu.diffusion.schedulers import DDIMScheduler
    from e4t_diffusion_tpu.models import weight_offsets as wo

    modules, params = tiny_unet_world
    fn = make_sample_fn(modules, DDIMScheduler(), 2, 7.5, 0.1, int8=True)
    tcfg = modules.text_encoder.config
    L = tcfg.max_position_embeddings
    from e4t_diffusion_tpu.models.clip_text import embed_tokens

    ids = jnp.zeros((1, L), jnp.int32).at[0, 3].set(7)
    embeds = embed_tokens(params["text"], ids)
    imgs = fn(params["unet"], params["offsets"], params["vae"],
              params["text"], params["e4t"],
              jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8, 8)),
              jnp.zeros((1, 3, 32, 32)), embeds,
              jnp.asarray([3], jnp.int32), jnp.zeros((1, L), jnp.int32),
              embed_tokens(params["text"], jnp.asarray([[5]]))[0, 0],
              jax.random.PRNGKey(1))
    assert np.all(np.isfinite(np.asarray(imgs)))


@pytest.fixture(scope="module")
def tiny_unet_world():
    from e4t_diffusion_tpu.diffusion.pipeline import E4TModules
    from e4t_diffusion_tpu.models import weight_offsets as wo

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
    return modules, params


def test_calibration_records_act_amax():
    """Under calibration_trace(), the drop-ins sow each site's input
    abs-max into a mutable "calib" collection aligned with the param
    tree; outside the context the traced program is unchanged."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32))
    layer = quant.Dense(features=8)
    params = layer.init(jax.random.PRNGKey(0), x)["params"]
    with quant.calibration_trace():
        _, cvars = layer.apply({"params": params}, x, mutable=["calib"])
    amax = np.asarray(cvars["calib"]["amax"])
    np.testing.assert_allclose(amax, np.abs(np.asarray(x)).max(), rtol=1e-6)
    # outside the context: no calib collection is produced
    _, cvars2 = layer.apply({"params": params}, x, mutable=["calib"])
    assert "amax" not in cvars2.get("calib", {})


def test_static_act_scale_matches_dynamic_at_true_max():
    """With sa baked from the exact abs-max, the static path must agree
    bit-for-bit with the dynamic path (same scale, same rounding)."""
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.normal(size=(4, 32)).astype(np.float32))
    layer = quant.Dense(features=16)
    params = layer.init(jax.random.PRNGKey(0), x)["params"]
    q_dyn = quant.quantize_params(dict(params))
    amax_tree = {"amax": jnp.max(jnp.abs(x))}
    q_static = quant.quantize_params(dict(params), act_amax=amax_tree)
    assert "sa" in q_static["kernel"] and quant.is_quantized(
        q_static["kernel"])
    out_d = layer.apply({"params": q_dyn}, x)
    out_s = layer.apply({"params": q_static}, x)
    np.testing.assert_array_equal(np.asarray(out_d), np.asarray(out_s))


def test_static_act_clips_beyond_calibrated_range():
    """Activations beyond the calibrated range saturate (no wraparound,
    bounded error): quantized input is clipped to ±127·sa."""
    x = jnp.asarray([[0.5, -0.25, 2.0]], jnp.float32)  # 2.0 > calib max 1.0
    params = {"kernel": jnp.eye(3), "bias": jnp.zeros((3,))}
    q = quant.quantize_params(dict(params), act_amax={"amax": jnp.float32(1.0)})
    out = np.asarray(quant.Dense(features=3).apply({"params": q}, x))
    np.testing.assert_allclose(out[0, :2], [0.5, -0.25], atol=1e-2)
    np.testing.assert_allclose(out[0, 2], 1.0, atol=1e-2)  # clipped to 1.0


def test_int8_sampling_close_to_bf16(tiny_unet_world):
    """Quality proxy: an 8-step CFG DDIM run with int8 UNet serving must
    track the full-precision run closely even on random weights (the
    adversarial case for PTQ — no trained-weight outlier structure).
    Measured: corr 0.9946, mean|diff| 0.021 on [0,1] images."""
    from e4t_diffusion_tpu.diffusion.pipeline import make_sample_fn
    from e4t_diffusion_tpu.diffusion.schedulers import DDIMScheduler
    from e4t_diffusion_tpu.models.clip_text import embed_tokens

    modules, params = tiny_unet_world
    tcfg = modules.text_encoder.config
    L = tcfg.max_position_embeddings
    ids = jnp.zeros((1, L), jnp.int32).at[0, 3].set(7)
    embeds = embed_tokens(params["text"], ids)
    args = (params["unet"], params["offsets"], params["vae"],
            params["text"], params["e4t"],
            jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8, 8)),
            jnp.zeros((1, 3, 32, 32)), embeds, jnp.asarray([3], jnp.int32),
            jnp.zeros((1, L), jnp.int32),
            embed_tokens(params["text"], jnp.asarray([[5]]))[0, 0],
            jax.random.PRNGKey(1))
    ref = np.asarray(make_sample_fn(modules, DDIMScheduler(), 8, 7.5,
                                    0.1)(*args))
    q = np.asarray(make_sample_fn(modules, DDIMScheduler(), 8, 7.5, 0.1,
                                  int8=True)(*args))
    corr = np.corrcoef(ref.ravel(), q.ravel())[0, 1]
    assert corr > 0.97, corr
    assert np.abs(ref - q).mean() < 0.05


def test_act_scales_persistence_roundtrip(tiny_unet_world, tmp_path):
    """save_act_scales/load_act_scales: f32 ranges roundtrip exactly
    (via f64 JSON), so a deployment serving from the file quantizes
    bit-identically to the one that calibrated."""
    from e4t_diffusion_tpu.diffusion.pipeline import (make_calibration_fn,
                                                      make_sample_fn)
    from e4t_diffusion_tpu.diffusion.schedulers import DDIMScheduler
    from e4t_diffusion_tpu.models.clip_text import embed_tokens

    modules, params = tiny_unet_world
    tcfg = modules.text_encoder.config
    L = tcfg.max_position_embeddings
    ids = jnp.zeros((1, L), jnp.int32).at[0, 3].set(7)
    embeds = embed_tokens(params["text"], ids)
    common = (jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8, 8)),
              jnp.zeros((1, 3, 32, 32)), embeds, jnp.asarray([3], jnp.int32),
              jnp.zeros((1, L), jnp.int32),
              embed_tokens(params["text"], jnp.asarray([[5]]))[0, 0],
              jax.random.PRNGKey(1))
    amax = make_calibration_fn(modules, DDIMScheduler(), 2, 7.5, 0.1)(
        params["unet"], params["offsets"], params["text"], params["e4t"],
        *common)
    path = str(tmp_path / "scales.json")
    quant.save_act_scales(jax.device_get(amax), path)
    loaded = quant.load_act_scales(path)
    flat_a = jax.tree_util.tree_leaves_with_path(amax)
    flat_b = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(loaded)}
    assert len(flat_a) == len(flat_b) > 0
    for k, v in flat_a:
        np.testing.assert_array_equal(np.float32(np.asarray(v)),
                                      np.asarray(flat_b[jax.tree_util.keystr(k)]))

    args = (params["unet"], params["offsets"], params["vae"],
            params["text"], params["e4t"], *common)
    fn = make_sample_fn(modules, DDIMScheduler(), 2, 7.5, 0.1,
                        int8="static")
    np.testing.assert_array_equal(np.asarray(fn(*args, amax)),
                                  np.asarray(fn(*args, loaded)))

    with pytest.raises(ValueError, match="e4t-act-amax-v1"):
        import json

        with open(path) as f:
            payload = json.load(f)
        payload["format"] = "bogus"
        with open(path, "w") as f:
            json.dump(payload, f)
        quant.load_act_scales(path)


def test_int8_static_act_no_cfg(tiny_unet_world):
    """guidance_scale <= 1.0 (inference.py's DEFAULT) takes the non-CFG
    path whose tap call early-exits after the mid block — its calib
    collection is PARTIAL. Regression: the max-merge must handle the
    partial tree (round-2 review finding: tree_map crashed here)."""
    from e4t_diffusion_tpu.diffusion.pipeline import (make_calibration_fn,
                                                      make_sample_fn)
    from e4t_diffusion_tpu.diffusion.schedulers import DDIMScheduler
    from e4t_diffusion_tpu.models.clip_text import embed_tokens

    modules, params = tiny_unet_world
    tcfg = modules.text_encoder.config
    L = tcfg.max_position_embeddings
    ids = jnp.zeros((1, L), jnp.int32).at[0, 3].set(7)
    embeds = embed_tokens(params["text"], ids)
    common = (jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8, 8)),
              jnp.zeros((1, 3, 32, 32)), embeds, jnp.asarray([3], jnp.int32),
              jnp.zeros((1, L), jnp.int32),
              embed_tokens(params["text"], jnp.asarray([[5]]))[0, 0],
              jax.random.PRNGKey(1))
    cfn = make_calibration_fn(modules, DDIMScheduler(), 4, 1.0, 0.1)
    amax = cfn(params["unet"], params["offsets"], params["text"],
               params["e4t"], *common)
    # leaves mix scalar "amax" and per-channel "amax_c" (round 4) —
    # per-site max>0 means the cond pass covered the site
    amax_vals = np.asarray(
        [np.max(np.asarray(v)) for v in jax.tree_util.tree_leaves(amax)])
    assert (amax_vals > 0).all()  # cond pass covers every site

    args = (params["unet"], params["offsets"], params["vae"],
            params["text"], params["e4t"], *common)
    ref = np.asarray(make_sample_fn(modules, DDIMScheduler(), 4, 1.0,
                                    0.1)(*args))
    q = np.asarray(make_sample_fn(modules, DDIMScheduler(), 4, 1.0, 0.1,
                                  int8="static")(*args, amax))
    assert np.corrcoef(ref.ravel(), q.ravel())[0, 1] > 0.97


def test_int8_static_act_sampling_close_to_bf16(tiny_unet_world):
    """Static-activation quality proxy: calibrate ranges on a SHORT
    (4-step) trajectory, serve 8 steps with int8="static" — the range
    mismatch between calibration and serving exercises the clipping
    path — and require the same closeness to bf16 as dynamic int8."""
    from e4t_diffusion_tpu.diffusion.pipeline import (make_calibration_fn,
                                                      make_sample_fn)
    from e4t_diffusion_tpu.diffusion.schedulers import DDIMScheduler
    from e4t_diffusion_tpu.models.clip_text import embed_tokens

    modules, params = tiny_unet_world
    tcfg = modules.text_encoder.config
    L = tcfg.max_position_embeddings
    ids = jnp.zeros((1, L), jnp.int32).at[0, 3].set(7)
    embeds = embed_tokens(params["text"], ids)
    common = (jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8, 8)),
              jnp.zeros((1, 3, 32, 32)), embeds, jnp.asarray([3], jnp.int32),
              jnp.zeros((1, L), jnp.int32),
              embed_tokens(params["text"], jnp.asarray([[5]]))[0, 0],
              jax.random.PRNGKey(1))
    cfn = make_calibration_fn(modules, DDIMScheduler(), 4, 7.5, 0.1)
    amax = cfn(params["unet"], params["offsets"], params["text"],
               params["e4t"], *common)
    # every site saw data: a zero amax means a dead calib path (leaves
    # mix scalar "amax" and per-channel "amax_c" vectors — round 4)
    amax_vals = np.asarray(
        [np.max(np.asarray(v)) for v in jax.tree_util.tree_leaves(amax)])
    assert (amax_vals > 0).all()

    args = (params["unet"], params["offsets"], params["vae"],
            params["text"], params["e4t"], *common)
    ref = np.asarray(make_sample_fn(modules, DDIMScheduler(), 8, 7.5,
                                    0.1)(*args))
    q = np.asarray(make_sample_fn(modules, DDIMScheduler(), 8, 7.5, 0.1,
                                  int8="static")(*args, amax))
    corr = np.corrcoef(ref.ravel(), q.ravel())[0, 1]
    assert corr > 0.97, corr
    assert np.abs(ref - q).mean() < 0.05

def test_int8_aux_sampling_close_to_bf16(tiny_unet_world):
    """--int8_aux quality proxy: int8 ViT tower + VAE decode (dynamic
    act scales) must track the full-precision run on random weights.
    The aux towers run once per sampling run, so the scheme needs no
    calibration; this guards the exclusion wiring (VAE conv_in/conv_out
    and the encoder/quant_conv stay fp) and the rescale math."""
    from e4t_diffusion_tpu.diffusion.pipeline import make_sample_fn
    from e4t_diffusion_tpu.diffusion.schedulers import DDIMScheduler
    from e4t_diffusion_tpu.models.clip_text import embed_tokens

    modules, params = tiny_unet_world
    tcfg = modules.text_encoder.config
    L = tcfg.max_position_embeddings
    ids = jnp.zeros((1, L), jnp.int32).at[0, 3].set(7)
    embeds = embed_tokens(params["text"], ids)
    pixels = jax.random.uniform(jax.random.PRNGKey(5), (1, 3, 32, 32),
                                jnp.float32, -1.0, 1.0)
    args = (params["unet"], params["offsets"], params["vae"],
            params["text"], params["e4t"],
            jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8, 8)),
            pixels, embeds, jnp.asarray([3], jnp.int32),
            jnp.zeros((1, L), jnp.int32),
            embed_tokens(params["text"], jnp.asarray([[5]]))[0, 0],
            jax.random.PRNGKey(1))
    ref = np.asarray(make_sample_fn(modules, DDIMScheduler(), 8, 7.5,
                                    0.1)(*args))
    q = np.asarray(make_sample_fn(modules, DDIMScheduler(), 8, 7.5, 0.1,
                                  int8_aux=True)(*args))
    corr = np.corrcoef(ref.ravel(), q.ravel())[0, 1]
    assert corr > 0.97, corr
    assert np.abs(ref - q).mean() < 0.05


def test_int8_aux_static_sampling_close_to_dynamic(tiny_unet_world):
    """int8_aux="static" (calibrated aux-tower activation scales, round
    4): the aux calibration fn returns per-site amax for the ViT tower
    and the VAE decode path, make_sample_fn consumes it as the trailing
    aux_amax arg, and the output stays close to the dynamic-aux run."""
    from e4t_diffusion_tpu.diffusion.pipeline import (
        make_aux_calibration_fn, make_sample_fn)
    from e4t_diffusion_tpu.diffusion.schedulers import DDIMScheduler
    from e4t_diffusion_tpu.models.clip_text import embed_tokens

    modules, params = tiny_unet_world
    tcfg = modules.text_encoder.config
    L = tcfg.max_position_embeddings
    ids = jnp.zeros((1, L), jnp.int32).at[0, 3].set(7)
    embeds = embed_tokens(params["text"], ids)
    latents = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8, 8))
    pixel = jnp.zeros((1, 3, 32, 32))
    common = (latents, pixel, embeds, jnp.asarray([3], jnp.int32),
              jnp.zeros((1, L), jnp.int32),
              embed_tokens(params["text"], jnp.asarray([[5]]))[0, 0],
              jax.random.PRNGKey(1))

    # calibrate the VAE-decode range on DENOISED latents (what serving
    # decodes) — the pipeline class uses its calibration run's final
    # latents the same way; initial noise under-covers the CFG-amplified
    # range and clips
    final_latents = make_sample_fn(
        modules, DDIMScheduler(), 4, 7.5, 0.1, return_latents=True)(
        params["unet"], params["offsets"], params["vae"], params["text"],
        params["e4t"], *common)
    aux_amax = make_aux_calibration_fn(modules)(
        params["e4t"], params["vae"], pixel, final_latents)
    # the tree covers both towers with positive per-site ranges
    assert "clip_vision" in aux_amax["e4t"]
    leaves = jax.tree_util.tree_leaves(aux_amax["vae"])
    assert leaves and all(float(np.max(np.asarray(x))) > 0.0
                          for x in leaves)

    dyn = np.asarray(make_sample_fn(
        modules, DDIMScheduler(), 4, 7.5, 0.1, int8_aux=True)(
        params["unet"], params["offsets"], params["vae"], params["text"],
        params["e4t"], *common))
    stat = np.asarray(make_sample_fn(
        modules, DDIMScheduler(), 4, 7.5, 0.1, int8_aux="static")(
        params["unet"], params["offsets"], params["vae"], params["text"],
        params["e4t"], *common, aux_amax))
    assert np.all(np.isfinite(stat))
    # calibrated on the exact serving inputs -> scales match the live
    # ranges; outputs should be near-identical up to re-rounding
    rel = (np.linalg.norm(stat - dyn)
           / max(np.linalg.norm(dyn), 1e-12))
    assert rel < 0.15, rel


def test_unet_static_exclude_default(tiny_unet_world, monkeypatch):
    """Serving default (round 4): under static-act int8, the clip-prone
    residual convs (quant.UNET_STATIC_EXCLUDE) keep DYNAMIC activation
    scales — int8 kernel ("q"/"s") but no "sa" — while ordinary sites
    get the calibrated static scale. Attribution: calib_gap found those
    sites' live ranges exceed an 8-step calibration by up to 1.8x and
    excluding them recovers near-dynamic quality at no measured cost
    (scripts/int8_quality.py, docs/KERNELS.md)."""
    from jax.tree_util import keystr, tree_flatten_with_path

    from e4t_diffusion_tpu.ops.quant import UNET_STATIC_EXCLUDE

    monkeypatch.delenv("E4T_INT8_STATIC_EXCLUDE", raising=False)
    modules, params = tiny_unet_world
    # a synthetic amax tree: every site in range
    with quant.calibration_trace():
        tcfg = modules.text_encoder.config
        _, v = modules.unet.apply(
            {"params": params["unet"]}, jnp.ones((1, 4, 8, 8)),
            jnp.zeros((1,), jnp.int32),
            jnp.ones((1, tcfg.max_position_embeddings, tcfg.hidden_size)),
            mutable=["calib"])
        amax = v["calib"]
    q = quant.quantize_params(params["unet"], act_amax=amax,
                              static_exclude=UNET_STATIC_EXCLUDE)
    flat = tree_flatten_with_path(q)[0]
    sa_paths = {keystr(k) for k, _ in flat if keystr(k).endswith("['sa']")}
    qk_paths = {keystr(k) for k, _ in flat if keystr(k).endswith("['q']")}
    # the excluded groups are quantized (q) but carry no static scale
    for group in UNET_STATIC_EXCLUDE:
        g_q = [p for p in qk_paths if group in p]
        assert g_q, f"tiny UNet has no quantized {group} site"
        assert not any(group in p for p in sa_paths), group
    # ordinary attention projections DO get the static scale
    assert any("to_q" in p for p in sa_paths)


def test_static_exclude_regime(monkeypatch):
    """_static_exclude_for: the quality exclusions apply in EVERY
    regime (round-5 re-measurement overturned the round-4 latency
    rows — exclusions are free at batch 1 and 1024px too); the
    explicit static_pc flavor serves all sites static; env override
    wins (returns None so quantize_params reads the env)."""
    import jax.numpy as jnp

    from e4t_diffusion_tpu.diffusion.pipeline import _static_exclude_for
    from e4t_diffusion_tpu.ops.quant import UNET_STATIC_EXCLUDE

    monkeypatch.delenv("E4T_INT8_STATIC_EXCLUDE", raising=False)
    lat = lambda b, res: jnp.zeros((b, 4, res // 8, res // 8))
    for shape in ((8, 512), (4, 512), (1, 512), (2, 1024), (4, 768)):
        assert _static_exclude_for(lat(*shape)) == UNET_STATIC_EXCLUDE
    assert _static_exclude_for(lat(1, 512), act_pc=True) == ()
    monkeypatch.setenv("E4T_INT8_STATIC_EXCLUDE", "conv_shortcut")
    assert _static_exclude_for(lat(8, 512)) is None


def test_serving_int8_mode_regime_upgrade(monkeypatch):
    """_serving_int8_mode: "static" passes through in EVERY regime
    (the round-5 static_pc auto-upgrade was retired the same round
    once re-measurement showed the exclusions are free at small
    batch / hi-res and dominate static_pc on both axes); only the
    explicit E4T_INT8_ACT_PC pin selects the per-channel flavor."""
    from e4t_diffusion_tpu.diffusion.pipeline import _serving_int8_mode

    monkeypatch.delenv("E4T_INT8_STATIC_EXCLUDE", raising=False)
    monkeypatch.delenv("E4T_INT8_ACT_PC", raising=False)
    for batch, res in ((8, 512), (4, 512), (1, 512), (2, 1024),
                       (4, 768)):
        assert _serving_int8_mode("static", batch, res, res) == "static"
    # non-"static" modes are never touched
    for mode in (False, True, "static_pc"):
        assert _serving_int8_mode(mode, 1, 512, 512) == mode
    # explicit flavor selection wins in both directions
    monkeypatch.setenv("E4T_INT8_ACT_PC", "1")
    assert _serving_int8_mode("static", 8, 512, 512) == "static_pc"
    assert _serving_int8_mode("static", 1, 512, 512) == "static_pc"
    monkeypatch.setenv("E4T_INT8_ACT_PC", "0")
    assert _serving_int8_mode("static", 1, 512, 512) == "static"


def test_static_pc_fold_exact_and_beats_per_tensor_on_outliers(
        monkeypatch):
    """Per-channel static activation scales (act_pc): the calibrated
    per-channel range is folded into the kernel's contraction axis
    (x @ W = (x/s_c) @ (W*s_c)), so serving costs the same as per-tensor
    static (broadcast divide, no reduction) while channel outliers keep
    their own resolution. On an input with one 50x-outlier channel the
    per-tensor static scale burns ~all int8 resolution on that channel;
    the balanced alpha=0.5 fold (pinned — the serving DEFAULT is 0.75,
    chosen on the round-5 real-net sweep, docs/KERNELS.md) must cut the
    error by >3x (measured 5.1x; the full alpha=1 fold only reaches
    2.2x — the folded outlier inflates the weight range instead)."""
    monkeypatch.setenv("E4T_INT8_PC_ALPHA", "0.5")
    rng = np.random.default_rng(42)
    x_np = rng.normal(size=(16, 64)).astype(np.float32)
    x_np[:, 7] *= 50.0  # the outlier channel
    x = jnp.asarray(x_np)
    layer = quant.Dense(features=48)
    params = layer.init(jax.random.PRNGKey(0), x)["params"]
    ref = layer.apply({"params": params}, x)

    calib = {"amax": jnp.max(jnp.abs(x)),
             "amax_c": jnp.max(jnp.abs(x), axis=0)}
    q_pt = quant.quantize_params(dict(params), act_amax=calib,
                                 act_pc=False)
    q_pc = quant.quantize_params(dict(params), act_amax=calib,
                                 act_pc=True)
    assert "sa" in q_pt["kernel"] and "sac" not in q_pt["kernel"]
    assert "sac" in q_pc["kernel"] and "sa" not in q_pc["kernel"]
    assert quant.is_quantized(q_pc["kernel"])
    assert q_pc["kernel"]["sac"].shape == (64,)

    err_pt = _rel_err(layer.apply({"params": q_pt}, x), ref)
    err_pc = _rel_err(layer.apply({"params": q_pc}, x), ref)
    assert err_pc < 2e-2, err_pc
    assert err_pc * 3 < err_pt, (err_pc, err_pt)


def test_static_pc_conv_close_to_f32():
    """act_pc on a conv: the fold runs along HWIO axis 2 (input
    channels) and the activation divide broadcasts over NHWC's last
    axis; with exact calibration the error matches the per-tensor
    dynamic bound."""
    rng = np.random.default_rng(43)
    x_np = rng.normal(size=(2, 8, 8, 16)).astype(np.float32)
    x_np[..., 3] *= 20.0
    x = jnp.asarray(x_np)
    layer = quant.Conv(features=24, kernel_size=(3, 3), padding=1)
    params = layer.init(jax.random.PRNGKey(0), x)["params"]
    ref = layer.apply({"params": params}, x)
    calib = {"amax": jnp.max(jnp.abs(x)),
             "amax_c": jnp.max(jnp.abs(x),
                               axis=(0, 1, 2))}
    q = quant.quantize_params(dict(params), act_amax=calib, act_pc=True)
    assert "sac" in q["kernel"] and q["kernel"]["sac"].shape == (16,)
    err = _rel_err(layer.apply({"params": q}, x), ref)
    assert err < 2e-2, err


def test_static_pc_falls_back_without_amax_c():
    """A pre-round-4 --act_scales file has only the scalar "amax":
    act_pc=True must gracefully serve the per-tensor static path (sa)
    instead of crashing."""
    rng = np.random.default_rng(44)
    x = jnp.asarray(rng.normal(size=(4, 32)).astype(np.float32))
    layer = quant.Dense(features=16)
    params = layer.init(jax.random.PRNGKey(0), x)["params"]
    q = quant.quantize_params(dict(params),
                              act_amax={"amax": jnp.max(jnp.abs(x))},
                              act_pc=True)
    assert "sa" in q["kernel"] and "sac" not in q["kernel"]
    out = layer.apply({"params": q}, x)
    assert _rel_err(out, layer.apply({"params": params}, x)) < 2e-2


def test_int8_static_pc_sampling_close_to_bf16(tiny_unet_world):
    """End-to-end int8="static_pc": calibrate on a SHORT (4-step)
    trajectory (the calib collection sows both "amax" and the
    per-channel "amax_c"), serve 8 steps with per-channel static scales
    — all sites static, no regime exclusions — and require the same
    closeness to bf16 as the other int8 modes."""
    from e4t_diffusion_tpu.diffusion.pipeline import (make_calibration_fn,
                                                      make_sample_fn)
    from e4t_diffusion_tpu.diffusion.schedulers import DDIMScheduler
    from e4t_diffusion_tpu.models.clip_text import embed_tokens

    modules, params = tiny_unet_world
    tcfg = modules.text_encoder.config
    L = tcfg.max_position_embeddings
    ids = jnp.zeros((1, L), jnp.int32).at[0, 3].set(7)
    embeds = embed_tokens(params["text"], ids)
    common = (jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8, 8)),
              jnp.zeros((1, 3, 32, 32)), embeds, jnp.asarray([3], jnp.int32),
              jnp.zeros((1, L), jnp.int32),
              embed_tokens(params["text"], jnp.asarray([[5]]))[0, 0],
              jax.random.PRNGKey(1))
    cfn = make_calibration_fn(modules, DDIMScheduler(), 4, 7.5, 0.1)
    amax = cfn(params["unet"], params["offsets"], params["text"],
               params["e4t"], *common)
    # the collection carries per-channel vectors alongside the scalars
    has_vec = any(np.asarray(v).ndim == 1
                  for v in jax.tree_util.tree_leaves(amax))
    assert has_vec

    args = (params["unet"], params["offsets"], params["vae"],
            params["text"], params["e4t"], *common)
    ref = np.asarray(make_sample_fn(modules, DDIMScheduler(), 8, 7.5,
                                    0.1)(*args))
    q = np.asarray(make_sample_fn(modules, DDIMScheduler(), 8, 7.5, 0.1,
                                  int8="static_pc")(*args, amax))
    corr = np.corrcoef(ref.ravel(), q.ravel())[0, 1]
    assert corr > 0.97, corr
    assert np.abs(ref - q).mean() < 0.05

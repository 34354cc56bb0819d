"""Data-parallel multi-chip serving (pipeline dp_shard_batch).

The sampling batch is sharded over the mesh's dp axis (params
replicated; flash attention's shard_map specs are dp-aware), so N chips
serve one batch cooperatively. Validated against the single-device
pipeline on the virtual 8-device CPU mesh: identical numerics.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from e4t_diffusion_tpu.config import AttributeDict
from e4t_diffusion_tpu.diffusion.pipeline import (
    E4TModules, StableDiffusionE4TPipeline)
from e4t_diffusion_tpu.models import weight_offsets as wo
from e4t_diffusion_tpu.parallel import mesh as pmesh
from e4t_diffusion_tpu.utils.tokenizer import (
    CLIPTokenizer, make_tiny_tokenizer_files)


@pytest.fixture(scope="module")
def world(tmp_path_factory):
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
    from e4t_diffusion_tpu.models.clip_text import resize_token_embeddings

    tok_dir = make_tiny_tokenizer_files(
        str(tmp_path_factory.mktemp("tok")),
        extra_words=["photo", "of", "a", "face"])
    tokenizer = CLIPTokenizer.from_pretrained(
        tok_dir, model_max_length=L)
    params["text"] = resize_token_embeddings(params["text"],
                                             len(tokenizer) + 1)
    tokenizer.add_tokens("*s")  # all tests pass already_added=True
    e4t_config = AttributeDict({
        "placeholder_token": "*s",
        "domain_class_token": "face",
        "domain_embed_scale": 0.1,
    })
    image = (np.random.default_rng(0)
             .uniform(0, 255, (32, 32, 3)).astype(np.uint8))
    return modules, params, tokenizer, e4t_config, image


def test_dp_serving_matches_single_device(world):
    modules, params, tokenizer, e4t_config, image = world
    mesh = pmesh.get_mesh(tp=1)
    dp = mesh.shape[pmesh.DATA_AXIS]
    assert dp == 8  # conftest forces 8 virtual devices

    lats = np.asarray(jax.random.normal(jax.random.PRNGKey(5),
                                        (dp, 4, 8, 8), jnp.float32))
    ref_pipe = StableDiffusionE4TPipeline(
        modules, params, tokenizer, e4t_config,
        already_added_placeholder_token=True)
    ref = ref_pipe("a photo of *s", image, num_inference_steps=2, seed=3,
                   num_images_per_prompt=dp, latents=lats)

    params_dp = dict(params)
    params_dp["unet"] = pmesh.apply_tensor_parallel(params["unet"], mesh)
    dp_pipe = StableDiffusionE4TPipeline(
        modules, params_dp, tokenizer, e4t_config,
        already_added_placeholder_token=True, tp_mesh=mesh,
        dp_shard_batch=True)
    out = dp_pipe("a photo of *s", image, num_inference_steps=2, seed=3,
                  num_images_per_prompt=dp, latents=lats)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_dp_serving_batched_prompts(world):
    """dp sharding composes with the batched-distinct-prompts path
    (per-sample embeddings sharded alongside the latents)."""
    modules, params, tokenizer, e4t_config, image = world
    mesh = pmesh.get_mesh(tp=1)
    prompts = ["a photo of *s", "a *s face"] * 4  # batch 8 over dp 8
    lats = np.asarray(jax.random.normal(jax.random.PRNGKey(6),
                                        (8, 4, 8, 8), jnp.float32))
    ref_pipe = StableDiffusionE4TPipeline(
        modules, params, tokenizer, e4t_config,
        already_added_placeholder_token=True)
    ref = ref_pipe(prompts, image, num_inference_steps=2, seed=3,
                   latents=lats)
    dp_pipe = StableDiffusionE4TPipeline(
        modules, params, tokenizer, e4t_config,
        already_added_placeholder_token=True, tp_mesh=mesh,
        dp_shard_batch=True)
    out = dp_pipe(prompts, image, num_inference_steps=2, seed=3,
                  latents=lats)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_dp_serving_composes_with_int8(world):
    """int8 UNet serving on a dp-only mesh (tp=1) runs (the tp>1-only
    assert must not fire) and tracks the single-device int8 output.

    Not bitwise: the dynamic per-tensor activation scale is the same
    global max either way, but x/s sits on int8 rounding cliffs, and
    the dp program's different fusion flips ulp-close codes which then
    compound — so the bar is the same tracking-closeness standard as
    int8-vs-bf16 (tests/test_quant.py), not allclose."""
    modules, params, tokenizer, e4t_config, image = world
    mesh = pmesh.get_mesh(tp=1)
    lats = np.asarray(jax.random.normal(jax.random.PRNGKey(7),
                                        (8, 4, 8, 8), jnp.float32))
    ref_pipe = StableDiffusionE4TPipeline(
        modules, params, tokenizer, e4t_config,
        already_added_placeholder_token=True, int8=True)
    ref = ref_pipe("a photo of *s", image, num_inference_steps=2, seed=3,
                   num_images_per_prompt=8, latents=lats)
    dp_pipe = StableDiffusionE4TPipeline(
        modules, params, tokenizer, e4t_config,
        already_added_placeholder_token=True, tp_mesh=mesh,
        dp_shard_batch=True, int8=True)
    out = dp_pipe("a photo of *s", image, num_inference_steps=2, seed=3,
                  num_images_per_prompt=8, latents=lats)
    assert out.shape == ref.shape
    corr = np.corrcoef(np.asarray(ref).ravel(),
                       np.asarray(out).ravel())[0, 1]
    assert corr > 0.99, corr
    assert np.abs(np.asarray(out) - np.asarray(ref)).mean() < 0.02


def test_tp_serving_composes_with_int8(world):
    """int8 with tp=2 (kernels column/row-sharded BEFORE the in-jit
    quantization): per-out-channel weight scales are exact under both
    sharding styles (column-sharded reduces shard-locally, row-sharded
    all-reduce-maxes over the input axis), so numerics track the
    single-device int8 run to fusion-ulp level."""
    modules, params, tokenizer, e4t_config, image = world
    mesh = pmesh.get_mesh(tp=2)
    lats = np.asarray(jax.random.normal(jax.random.PRNGKey(8),
                                        (4, 4, 8, 8), jnp.float32))
    ref_pipe = StableDiffusionE4TPipeline(
        modules, params, tokenizer, e4t_config,
        already_added_placeholder_token=True, int8=True)
    ref = ref_pipe("a photo of *s", image, num_inference_steps=2, seed=3,
                   num_images_per_prompt=4, latents=lats)
    params_tp = dict(params)
    params_tp["unet"] = pmesh.apply_tensor_parallel(params["unet"], mesh)
    tp_pipe = StableDiffusionE4TPipeline(
        modules, params_tp, tokenizer, e4t_config,
        already_added_placeholder_token=True, tp_mesh=mesh,
        dp_shard_batch=True, int8=True)
    out = tp_pipe("a photo of *s", image, num_inference_steps=2, seed=3,
                  num_images_per_prompt=4, latents=lats)
    corr = np.corrcoef(np.asarray(ref).ravel(),
                       np.asarray(out).ravel())[0, 1]
    assert corr > 0.99, corr
    assert np.abs(np.asarray(out) - np.asarray(ref)).mean() < 0.02


def test_static_act_int8_under_tp_mesh(world):
    """int8='static' on a (dp, tp=2) mesh. With the SAME calibrated
    scales injected into both pipelines, the tp serving path must track
    the single-device one (isolates serving correctness; two
    independently-calibrated deployments legitimately diverge more —
    their 8-step calibration trajectories drift apart by compounded
    fusion ulps, shifting every static rounding boundary)."""
    modules, params, tokenizer, e4t_config, image = world
    mesh = pmesh.get_mesh(tp=2)
    lats = np.asarray(jax.random.normal(jax.random.PRNGKey(9),
                                        (4, 4, 8, 8), jnp.float32))
    ref_pipe = StableDiffusionE4TPipeline(
        modules, params, tokenizer, e4t_config,
        already_added_placeholder_token=True, int8="static")
    ref = ref_pipe("a photo of *s", image, num_inference_steps=2, seed=3,
                   num_images_per_prompt=4, latents=lats)
    assert ref_pipe._act_amax is not None  # calibration ran lazily

    params_tp = dict(params)
    params_tp["unet"] = pmesh.apply_tensor_parallel(params["unet"], mesh)
    tp_pipe = StableDiffusionE4TPipeline(
        modules, params_tp, tokenizer, e4t_config,
        already_added_placeholder_token=True, tp_mesh=mesh,
        dp_shard_batch=True, int8="static")
    tp_pipe._act_amax = ref_pipe._act_amax  # shared calibration
    out = tp_pipe("a photo of *s", image, num_inference_steps=2, seed=3,
                  num_images_per_prompt=4, latents=lats)
    corr = np.corrcoef(np.asarray(ref).ravel(),
                       np.asarray(out).ravel())[0, 1]
    assert corr > 0.99, corr
    assert np.abs(np.asarray(out) - np.asarray(ref)).mean() < 0.02


def test_static_act_calibration_runs_under_tp_mesh(world):
    """The lazy calibration path itself must execute under a tp mesh
    (shard_map attention specs) and produce positive finite ranges."""
    modules, params, tokenizer, e4t_config, image = world
    mesh = pmesh.get_mesh(tp=2)
    params_tp = dict(params)
    params_tp["unet"] = pmesh.apply_tensor_parallel(params["unet"], mesh)
    pipe = StableDiffusionE4TPipeline(
        modules, params_tp, tokenizer, e4t_config,
        already_added_placeholder_token=True, tp_mesh=mesh,
        dp_shard_batch=True, int8="static")
    out = pipe("a photo of *s", image, num_inference_steps=2, seed=3,
               num_images_per_prompt=8)
    assert np.isfinite(out).all()
    # leaves mix scalar "amax" and per-channel "amax_c" (round 4)
    leaves = [np.asarray(v) for v in
              jax.tree_util.tree_leaves(pipe._act_amax)]
    assert leaves and all(np.isfinite(v).all() for v in leaves)
    assert all(np.max(v) > 0 for v in leaves)


def test_dp_serving_batch_divisibility(world):
    modules, params, tokenizer, e4t_config, image = world
    mesh = pmesh.get_mesh(tp=1)
    pipe = StableDiffusionE4TPipeline(
        modules, params, tokenizer, e4t_config,
        already_added_placeholder_token=True, tp_mesh=mesh,
        dp_shard_batch=True)
    with pytest.raises(ValueError, match="divisible"):
        pipe("a photo of *s", image, num_inference_steps=1,
             num_images_per_prompt=3)

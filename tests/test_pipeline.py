"""End-to-end pipeline tests on matched tiny model configs."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from e4t_diffusion_tpu.config import AttributeDict
from e4t_diffusion_tpu.diffusion.pipeline import (
    E4TModules, StableDiffusionE4TPipeline, preprocess_image)
from e4t_diffusion_tpu.models import weight_offsets as wo
from e4t_diffusion_tpu.utils.tokenizer import (
    CLIPTokenizer, make_tiny_tokenizer_files)


@pytest.fixture(scope="module")
def tiny_setup(tmp_path_factory):
    modules = E4TModules.tiny()
    rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 5)
    ucfg = modules.unet.config
    tcfg = modules.text_encoder.config

    unet_params = modules.unet.init(
        ks[0], jnp.zeros((1, 4, 8, 8)), jnp.array([0]),
        jnp.zeros((1, tcfg.max_position_embeddings, tcfg.hidden_size)))["params"]
    vae_params = modules.vae.init(ks[1], jnp.zeros((1, 3, 32, 32)), ks[1])["params"]
    text_params = modules.text_encoder.init(
        ks[2], jnp.zeros((1, tcfg.max_position_embeddings), jnp.int32))["params"]
    ecfg = modules.e4t_encoder.config
    e4t_params = modules.e4t_encoder.init(
        ks[3], jnp.zeros((1, 3, 32, 32)),
        jnp.zeros((1, ecfg.unet_feature_dim)))["params"]
    offsets = wo.init_offset_bank(ks[4], ucfg)

    tok_dir = make_tiny_tokenizer_files(
        str(tmp_path_factory.mktemp("tok")),
        extra_words=["photo", "of", "a", "face"])
    tokenizer = CLIPTokenizer.from_pretrained(
        tok_dir, model_max_length=tcfg.max_position_embeddings)

    # grow vocab for the placeholder like the reference does
    from e4t_diffusion_tpu.models.clip_text import resize_token_embeddings
    text_params = resize_token_embeddings(text_params, len(tokenizer) + 1)

    params = {"unet": unet_params, "offsets": offsets, "vae": vae_params,
              "text": text_params, "e4t": e4t_params}
    e4t_config = AttributeDict({
        "placeholder_token": "*s",
        "domain_class_token": "face",
        "domain_embed_scale": 0.1,
    })
    pipe = StableDiffusionE4TPipeline(modules, params, tokenizer, e4t_config)
    image = (np.random.default_rng(0)
             .uniform(0, 255, (32, 32, 3)).astype(np.uint8))
    return pipe, image


def test_pipeline_generates_images(tiny_setup):
    pipe, image = tiny_setup
    out = pipe("a photo of *s", image, num_inference_steps=3,
               guidance_scale=7.5, num_images_per_prompt=2, seed=42)
    # tiny configs: unet sample_size 8 x vae scale 2 -> 16px default
    assert out.shape == (2, 3, 16, 16)
    assert np.isfinite(out).all()
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_pipeline_deterministic_with_seed(tiny_setup):
    pipe, image = tiny_setup
    a = pipe("a photo of *s", image, num_inference_steps=2, seed=7)
    b = pipe("a photo of *s", image, num_inference_steps=2, seed=7)
    np.testing.assert_array_equal(a, b)


def test_pipeline_guidance_changes_output(tiny_setup):
    pipe, image = tiny_setup
    a = pipe("a photo of *s", image, num_inference_steps=2, seed=7,
             guidance_scale=1.0)
    b = pipe("a photo of *s", image, num_inference_steps=2, seed=7,
             guidance_scale=7.5)
    assert not np.allclose(a, b)


def test_pipeline_plms(tiny_setup):
    pipe, image = tiny_setup
    out = pipe("a photo of *s", image, num_inference_steps=3, seed=1,
               scheduler_type="plms", height=32, width=32)
    assert out.shape == (1, 3, 32, 32)
    assert np.isfinite(out).all()


def test_pipeline_batched_prompts_match_individual_runs(tiny_setup):
    """A list of distinct prompts runs as ONE batch with per-sample
    embeddings, and must reproduce the per-prompt runs (per-sample
    GroupNorm/attention — no cross-batch coupling)."""
    pipe, image = tiny_setup
    p1, p2 = "a photo of *s", "a *s face"
    lats = np.asarray(jax.random.normal(jax.random.PRNGKey(5),
                                        (2, 4, 8, 8), jnp.float32))
    batched = pipe([p1, p2], image, num_inference_steps=2, seed=7,
                   latents=lats)
    a = pipe(p1, image, num_inference_steps=2, seed=7, latents=lats[0:1])
    b = pipe(p2, image, num_inference_steps=2, seed=7, latents=lats[1:2])
    assert batched.shape == (2, 3, 16, 16)
    np.testing.assert_allclose(batched[0], a[0], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(batched[1], b[0], rtol=1e-4, atol=1e-4)
    # the two prompts genuinely produce different images
    assert not np.allclose(batched[0], batched[1])


def test_pipeline_batched_prompts_seed_matches_standalone(tiny_setup):
    """Without explicit latents, each prompt's block draws the SAME
    seed-derived noise its standalone run would (round-2 review finding:
    the batched path used to give prompt k>0 different latents)."""
    pipe, image = tiny_setup
    batched = pipe(["a photo of *s", "a *s face"], image,
                   num_inference_steps=2, seed=9)
    solo = pipe("a *s face", image, num_inference_steps=2, seed=9)
    np.testing.assert_allclose(batched[1], solo[0], rtol=1e-4, atol=1e-4)


def test_pipeline_batched_stochastic_seed_reproducible(tiny_setup):
    """Stochastic schedulers deviate from standalone runs in batched
    mode (documented) but must stay seed-reproducible: same call twice
    gives identical images."""
    pipe, image = tiny_setup
    kwargs = dict(num_inference_steps=2, seed=13,
                  scheduler_type="euler_ancestral")
    a = pipe(["a photo of *s", "a *s face"], image, **kwargs)
    b = pipe(["a photo of *s", "a *s face"], image, **kwargs)
    np.testing.assert_array_equal(a, b)
    assert not np.allclose(a[0], a[1])  # prompts differ


def test_pipeline_batched_prompts_all_need_placeholder(tiny_setup):
    pipe, image = tiny_setup
    with pytest.raises(ValueError, match="placeholder"):
        pipe(["a photo of *s", "a photo of face"], image,
             num_inference_steps=1)


def test_pipeline_pil_output_matches_np(tiny_setup):
    """output_type='pil' rounds to uint8 ON DEVICE (4x smaller host
    fetch); the bytes must match the host-side conversion of the f32
    output."""
    pipe, image = tiny_setup
    arr = pipe("a photo of *s", image, num_inference_steps=2, seed=11)
    pils = pipe("a photo of *s", image, num_inference_steps=2, seed=11,
                output_type="pil")
    assert len(pils) == 1 and pils[0].size == (16, 16)
    want = (np.asarray(arr[0]).transpose(1, 2, 0) * 255).round()
    got = np.asarray(pils[0]).astype(np.float64)
    # identical up to one code of rounding jitter at the f32/bf16 boundary
    assert np.abs(got - want).max() <= 1.0


def test_pipeline_requires_placeholder(tiny_setup):
    pipe, image = tiny_setup
    with pytest.raises(ValueError, match="placeholder"):
        pipe("a photo of face", image, num_inference_steps=1)


def test_preprocess_image_range():
    img = np.zeros((8, 8, 3), np.uint8)
    img[0, 0] = 255
    out = preprocess_image(img)
    assert out.shape == (1, 3, 8, 8)
    assert out.max() == 1.0 and out.min() == -1.0


@pytest.mark.parametrize("scheduler_type",
                         ["ddim", "plms", "lms", "euler", "euler_ancestral",
                          "dpm_solver++"])
def test_pipeline_all_schedulers(tiny_setup, scheduler_type):
    """Every SCHEDULER_MAPPING entry drives the full pipeline
    (/root/reference/inference.py:65-72 parity)."""
    pipe, image = tiny_setup
    out = pipe("a photo of *s", image, num_inference_steps=2, seed=3,
               scheduler_type=scheduler_type)
    assert out.shape[1:] == (3, 16, 16)
    assert np.isfinite(out).all()


def test_pipeline_eta_changes_ddim(tiny_setup):
    pipe, image = tiny_setup
    a = pipe("a photo of *s", image, num_inference_steps=2, seed=5, eta=0.0)
    b = pipe("a photo of *s", image, num_inference_steps=2, seed=5, eta=1.0)
    assert not np.allclose(a, b)


def test_pipeline_rejects_negative_prompt(tiny_setup):
    pipe, image = tiny_setup
    with pytest.raises(AssertionError, match="negative_prompt"):
        pipe("a photo of *s", image, negative_prompt="ugly",
             num_inference_steps=1)


def test_pipeline_call_applies_regime_int8_upgrade(tiny_setup,
                                                   monkeypatch):
    """__call__ threads the resolved static-int8 flavor into
    make_sample_fn: with the explicit E4T_INT8_ACT_PC=1 pin an
    int8="static" pipeline must trace the "static_pc" program
    (pipeline._serving_int8_mode — the only remaining flavor switch
    after round 5 retired the regime auto-upgrade), and the generated
    image must still track bf16 (the per-channel path end-to-end
    through the public API, not just make_sample_fn)."""
    from e4t_diffusion_tpu.diffusion import pipeline as pl

    pipe, image = tiny_setup
    ref = pipe("a photo of *s", image, num_inference_steps=2, seed=11)

    monkeypatch.delenv("E4T_INT8_STATIC_EXCLUDE", raising=False)
    monkeypatch.setenv("E4T_INT8_ACT_PC", "1")
    q_pipe = pl.StableDiffusionE4TPipeline(
        pipe.modules, pipe.params, pipe.tokenizer, pipe.e4t_config,
        already_added_placeholder_token=True, int8="static")
    seen = []
    real = pl.make_sample_fn

    def spy(*args, **kwargs):
        seen.append(kwargs.get("int8"))
        return real(*args, **kwargs)

    monkeypatch.setattr(pl, "make_sample_fn", spy)
    out = q_pipe("a photo of *s", image, num_inference_steps=2, seed=11)
    assert seen == ["static_pc"]
    assert q_pipe._act_amax is not None  # calibration ran lazily
    # loose sanity only — per-channel int8 accuracy bounds live in
    # tests/test_quant.py (this tiny 2-step random-net run measures
    # the MECHANISM, not quality; int8-vs-bf16 pixel corr on it is
    # legitimately noisy)
    out = np.asarray(out)
    assert np.isfinite(out).all()
    assert np.abs(out - np.asarray(ref)).mean() < 0.15


def test_pipeline_fn_cache_keys_on_resolved_int8_flavor(tiny_setup,
                                                        monkeypatch):
    """Flipping E4T_INT8_ACT_PC between calls on a LIVE pipeline must
    re-trace with the new flavor, not serve the stale cached program
    (the fn cache keys on the RESOLVED mode + exclusion env — round-5
    review finding: before the fix the first-traced flavor won
    silently, so env sweeps recorded mislabeled numbers)."""
    from e4t_diffusion_tpu.diffusion import pipeline as pl

    pipe, image = tiny_setup
    monkeypatch.delenv("E4T_INT8_STATIC_EXCLUDE", raising=False)
    monkeypatch.delenv("E4T_INT8_ACT_PC", raising=False)
    q_pipe = pl.StableDiffusionE4TPipeline(
        pipe.modules, pipe.params, pipe.tokenizer, pipe.e4t_config,
        already_added_placeholder_token=True, int8="static")
    seen = []
    real = pl.make_sample_fn

    def spy(*args, **kwargs):
        seen.append(kwargs.get("int8"))
        return real(*args, **kwargs)

    monkeypatch.setattr(pl, "make_sample_fn", spy)
    q_pipe("a photo of *s", image, num_inference_steps=2, seed=3)
    monkeypatch.setenv("E4T_INT8_ACT_PC", "1")
    q_pipe("a photo of *s", image, num_inference_steps=2, seed=3)
    assert seen == ["static", "static_pc"], seen
    # and the unchanged-env repeat still cache-hits (no third trace)
    q_pipe("a photo of *s", image, num_inference_steps=2, seed=3)
    assert len(seen) == 2, seen

"""Stable-unCLIP stack tests: SD2-flavor UNet oracle parity, HF image
encoder parity, noise augmentation semantics, pipeline smoke.

Parity target: the diffusers StableUnCLIPImg2ImgPipeline stack used by
/root/reference/scripts/image_variation_augmentation.py:95-99.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from e4t_diffusion_tpu.models.unet import UNet2DConditionModel, UNetConfig
from e4t_diffusion_tpu.models.unclip import (
    CLIPVisionModelWithProjection, CLIPVisionProjectionConfig,
    noise_image_embeddings, UNCLIP_NOISE_AUG_SCHEDULE)
from e4t_diffusion_tpu.models.clip_text import CLIPTextModel, CLIPTextConfig
from e4t_diffusion_tpu.diffusion.unclip_pipeline import (
    UnCLIPModules, StableUnCLIPImg2ImgPipeline)
from e4t_diffusion_tpu.diffusion.schedulers import (
    NoiseScheduleConfig, DPMSolverMultistepScheduler, alphas_cumprod)
from e4t_diffusion_tpu.utils import convert
from e4t_diffusion_tpu.utils.tokenizer import (
    CLIPTokenizer, make_tiny_tokenizer_files)
from torch_unet_oracle import TorchTinyUNet


def _tiny_unclip_unet_config():
    return dataclasses.replace(
        UNetConfig.tiny(),
        use_linear_projection=True,
        class_embed_type="projection",
        projection_class_embeddings_input_dim=32,
    )


def test_sd2_flavor_unet_matches_torch_oracle():
    """Linear transformer projections + projection class embedding, vs the
    independent torch oracle through the emitted state dict."""
    cfg = _tiny_unclip_unet_config()
    m = UNet2DConditionModel(cfg)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 8, 8)),
                    jnp.array([0]), jnp.zeros((1, 7, 32)),
                    class_labels=jnp.zeros((1, 32)))["params"]

    sd = {k: torch.from_numpy(np.array(v, copy=True))
          for k, v in convert.unet_to_torch(params).items()}
    oracle = TorchTinyUNet(ctx_dim=32, linear_proj=True,
                           class_proj_dim=32).eval()
    missing, unexpected = oracle.load_state_dict(sd, strict=False)
    assert not missing, f"missing: {missing}"
    assert not unexpected, f"unexpected: {unexpected}"

    r = np.random.default_rng(0)
    x = r.standard_normal((2, 4, 8, 8)).astype(np.float32)
    t = np.array([3, 800], dtype=np.int64)
    ctx = r.standard_normal((2, 7, 32)).astype(np.float32)
    cls = r.standard_normal((2, 32)).astype(np.float32)

    ours = m.apply({"params": params}, jnp.asarray(x), jnp.asarray(t),
                   jnp.asarray(ctx), class_labels=jnp.asarray(cls))
    with torch.no_grad():
        theirs = oracle(torch.from_numpy(x), torch.from_numpy(t),
                        torch.from_numpy(ctx), torch.from_numpy(cls))
    np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                               atol=3e-5, rtol=3e-5)


def test_sd2_unet_converter_roundtrip():
    """torch->flax->torch round trip preserves every tensor (strict key
    accounting incl. class_embedding + linear proj_in/out)."""
    cfg = _tiny_unclip_unet_config()
    m = UNet2DConditionModel(cfg)
    params = m.init(jax.random.PRNGKey(1), jnp.zeros((1, 4, 8, 8)),
                    jnp.array([0]), jnp.zeros((1, 7, 32)),
                    class_labels=jnp.zeros((1, 32)))["params"]
    sd = convert.unet_to_torch(params)
    back = convert.unet_from_torch(sd, cfg)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_allclose(np.asarray(leaf),
                                   np.asarray(flat_b[path]), atol=0, rtol=0)


def test_image_encoder_matches_hf():
    """CLIPVisionModelWithProjection parity vs HF transformers on a tiny
    config, through the HF-layout converter."""
    from transformers import CLIPVisionConfig as HFVisionConfig
    from transformers import CLIPVisionModelWithProjection as HFVisionProj

    hf_cfg = HFVisionConfig(
        hidden_size=32, num_hidden_layers=4, num_attention_heads=4,
        intermediate_size=64, image_size=28, patch_size=14,
        projection_dim=16)
    hf = HFVisionProj(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}

    cfg = CLIPVisionProjectionConfig.tiny()
    ours = CLIPVisionModelWithProjection(cfg)
    params = convert.clip_vision_with_projection_from_torch(
        sd, cfg.vision.num_layers)

    r = np.random.default_rng(0)
    x = r.standard_normal((2, 3, 28, 28)).astype(np.float32)
    out = ours.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        ref = hf(pixel_values=torch.from_numpy(x)).image_embeds
    np.testing.assert_allclose(np.asarray(out), ref.numpy(),
                               atol=2e-5, rtol=2e-5)


def test_sd2_text_encoder_matches_hf_gelu():
    """hidden_act='gelu' (SD v2 text tower) parity vs HF CLIPTextModel."""
    from transformers import CLIPTextConfig as HFTextConfig
    from transformers import CLIPTextModel as HFTextModel

    hf_cfg = HFTextConfig(
        vocab_size=1000, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=16, hidden_act="gelu")
    hf = HFTextModel(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}

    cfg = dataclasses.replace(CLIPTextConfig.tiny(), hidden_act="gelu")
    ours = CLIPTextModel(cfg)
    params = convert.clip_text_from_torch(sd, cfg.num_layers)

    ids = np.array([[0, 5, 9, 200, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1]],
                   dtype=np.int32)
    out, _ = ours.apply({"params": params}, jnp.asarray(ids))
    with torch.no_grad():
        ref = hf(input_ids=torch.from_numpy(ids.astype(np.int64)))
    np.testing.assert_allclose(np.asarray(out),
                               ref.last_hidden_state.numpy(),
                               atol=2e-5, rtol=2e-5)


def test_noise_image_embeddings_semantics():
    """scale -> DDPM add_noise -> unscale -> concat sinusoidal noise-level
    embedding, against a direct numpy transcription of the diffusers
    pipeline_stable_unclip_img2img.noise_image_embeddings math."""
    r = np.random.default_rng(0)
    d = 16
    embeds = r.standard_normal((2, d)).astype(np.float32)
    noise = r.standard_normal((2, d)).astype(np.float32)
    mean = r.standard_normal((d,)).astype(np.float32)
    std = (0.5 + r.uniform(0.5, 1.0, (d,))).astype(np.float32)
    level = np.array([0, 700], dtype=np.int32)

    out = noise_image_embeddings(
        jnp.asarray(embeds), jnp.asarray(level), jnp.asarray(noise),
        {"mean": jnp.asarray(mean), "std": jnp.asarray(std)})
    out = np.asarray(out)
    assert out.shape == (2, 2 * d)

    acp = alphas_cumprod(UNCLIP_NOISE_AUG_SCHEDULE)
    x = (embeds - mean) / std
    a = acp[level][:, None]
    x = np.sqrt(a) * x + np.sqrt(1 - a) * noise
    x = x * std + mean
    np.testing.assert_allclose(out[:, :d], x.astype(np.float32),
                               atol=1e-5, rtol=1e-5)

    # sinusoidal part: exact diffusers get_timestep_embedding formula
    half = d // 2
    freqs = np.exp(-np.log(10000) * np.arange(half) / half)
    ang = level[:, None].astype(np.float32) * freqs[None]
    sincos = np.concatenate([np.sin(ang), np.cos(ang)], axis=-1)
    flipped = np.concatenate([sincos[:, half:], sincos[:, :half]], axis=-1)
    np.testing.assert_allclose(out[:, d:], flipped.astype(np.float32),
                               atol=1e-5, rtol=1e-5)


@pytest.fixture(scope="module")
def tiny_unclip(tmp_path_factory):
    modules = UnCLIPModules.tiny()
    rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 4)
    tcfg = modules.text_encoder.config
    icfg = modules.image_encoder.config

    unet_params = modules.unet.init(
        ks[0], jnp.zeros((1, 4, 8, 8)), jnp.array([0]),
        jnp.zeros((1, tcfg.max_position_embeddings, tcfg.hidden_size)),
        class_labels=jnp.zeros((1, 2 * icfg.projection_dim)))["params"]
    vae_params = modules.vae.init(ks[1], jnp.zeros((1, 3, 16, 16)),
                                  ks[1])["params"]
    text_params = modules.text_encoder.init(
        ks[2], jnp.zeros((1, tcfg.max_position_embeddings), jnp.int32))["params"]
    img_params = modules.image_encoder.init(
        ks[3], jnp.zeros((1, 3, icfg.vision.image_size,
                          icfg.vision.image_size)))["params"]
    params = {
        "unet": unet_params, "vae": vae_params, "text": text_params,
        "image_encoder": img_params,
        "image_normalizer": {
            "mean": jnp.zeros((icfg.projection_dim,)),
            "std": jnp.ones((icfg.projection_dim,)),
        },
    }
    tok_dir = make_tiny_tokenizer_files(
        str(tmp_path_factory.mktemp("tok")), extra_words=["photo"])
    tokenizer = CLIPTokenizer.from_pretrained(
        tok_dir, model_max_length=tcfg.max_position_embeddings)
    scheduler = DPMSolverMultistepScheduler(
        NoiseScheduleConfig(prediction_type="v_prediction"))
    pipe = StableUnCLIPImg2ImgPipeline(modules, params, tokenizer,
                                       scheduler=scheduler)
    image = (np.random.default_rng(0)
             .uniform(0, 255, (32, 32, 3)).astype(np.uint8))
    return pipe, image


def test_unclip_pipeline_generates_images(tiny_unclip):
    pipe, image = tiny_unclip
    out = pipe(image, num_inference_steps=3, guidance_scale=10.0,
               num_images_per_prompt=2, seed=0, output_type="np")
    assert out.shape == (2, 3, 16, 16)
    assert np.all(out >= 0) and np.all(out <= 1)
    assert np.isfinite(out).all()


def test_unclip_pipeline_no_cfg_and_noise_level(tiny_unclip):
    pipe, image = tiny_unclip
    a = pipe(image, num_inference_steps=2, guidance_scale=1.0,
             noise_level=0, seed=1, output_type="np")
    b = pipe(image, num_inference_steps=2, guidance_scale=1.0,
             noise_level=500, seed=1, output_type="np")
    assert a.shape == b.shape == (1, 3, 16, 16)
    # noise level must change the conditioning, hence the output
    assert np.abs(a - b).max() > 1e-6


def test_unclip_pipeline_prompt_conditioning(tiny_unclip):
    pipe, image = tiny_unclip
    a = pipe(image, prompt="", num_inference_steps=2, guidance_scale=5.0,
             seed=2, output_type="np")
    b = pipe(image, prompt="photo", num_inference_steps=2,
             guidance_scale=5.0, seed=2, output_type="np")
    assert np.abs(a - b).max() > 1e-6

"""End-to-end proof that E4T personalization LEARNS (composed system).

The reference's only evidence is its published model + README samples
(/root/reference/README.md:22-27); every other repo test proves parity
of parts. This composes them: phase-1 pretrain a tiny stack on a
synthetic solid-color domain, then phase-2 tune on one HELD-OUT color
(reference flow /root/reference/tuning_e4t.py:270-358), sample, and
assert the output moved toward the target vs the untuned baseline
(prototype margin 98 -> 21 latent MSE). A train-vs-sample
inconsistency in the embed blend, a broken offset co-training, or a
sign-flipped reg term fails one of these even though each still
decreases the training loss.

Runtime: ~8-12 min on one CPU core (tiny configs, 250+2x80+60 steps).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from e4t_diffusion_tpu.config import AttributeDict
from e4t_diffusion_tpu.diffusion.pipeline import (E4TModules,
                                                  StableDiffusionE4TPipeline)
from e4t_diffusion_tpu.diffusion.schedulers import DDPMScheduler
from e4t_diffusion_tpu.models import weight_offsets as wo
from e4t_diffusion_tpu.models.clip_text import resize_token_embeddings
from e4t_diffusion_tpu.models.vae import AutoencoderKL
from e4t_diffusion_tpu.training.train_step import (
    E4TTrainConfig, create_train_state, e4t_loss_fn, encode_latents,
    make_optimizer, make_train_step, merge_params)
from e4t_diffusion_tpu.utils.tokenizer import (CLIPTokenizer,
                                               make_tiny_tokenizer_files)

PALETTE = [(1, 0, 0), (0, 1, 0), (0, 0, 1), (1, 1, 0)]
HELD = (1, 0, 1)  # never seen in phase 1
N_PHASE1, N_PHASE2 = 250, 60


def _color_image(rgb):
    img = np.zeros((32, 32, 3), np.float32)
    img[:] = np.asarray(rgb, np.float32)
    return img * 2.0 - 1.0  # [-1, 1]


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
    tok_dir = make_tiny_tokenizer_files(
        str(tmp_path_factory.mktemp("tok")),
        extra_words=["photo", "of", "a", "face"])
    tokenizer = CLIPTokenizer.from_pretrained(tok_dir, model_max_length=L)
    params["text"] = resize_token_embeddings(params["text"],
                                             len(tokenizer) + 1)
    e4t_config = AttributeDict({"placeholder_token": "*s",
                                "domain_class_token": "face",
                                "domain_embed_scale": 0.1})
    pipe = StableDiffusionE4TPipeline(modules, params, tokenizer, e4t_config)
    prompt_ids, ph_idx, uncond_ids = pipe._prepare_prompt("a photo of *s")

    def make_batch(colors):
        pixels = jnp.asarray(np.stack([_color_image(c) for c in colors]))
        pixels = jnp.transpose(pixels, (0, 3, 1, 2))
        b = len(colors)
        return {
            "latents": None,
            "pixel_values": pixels,
            "input_ids": jnp.tile(jnp.asarray(prompt_ids)[None], (b, 1)),
            "placeholder_idx": jnp.full((b,), ph_idx, jnp.int32),
            "uncond_ids": jnp.asarray(uncond_ids)[None],
            "class_token_id": jnp.asarray(pipe.class_token_id, jnp.int32),
        }

    # ---- phase 1: offsets + E4T encoder on the color domain ----
    cfg1 = E4TTrainConfig()
    tx1 = make_optimizer(3e-3, cfg1)
    state, frozen = create_train_state(params, cfg1, tx1)
    step1 = jax.jit(make_train_step(modules, DDPMScheduler(), cfg1, tx1))
    batch = make_batch(PALETTE)
    loss0 = None
    for i in range(N_PHASE1):
        state, m = step1(state, frozen, batch, jax.random.PRNGKey(i))
        if i == 0:
            loss0 = float(m["loss"])
    loss_end = float(m["loss"])
    p1 = merge_params(state.trainable, frozen)
    p1 = {k: p1[k] for k in ("unet", "vae", "text", "e4t", "offsets")}
    return {"modules": modules, "tokenizer": tokenizer,
            "e4t_config": e4t_config, "params0": params, "p1": p1,
            "make_batch": make_batch, "loss0": loss0, "loss_end": loss_end}


def test_phase1_loss_decreases(world):
    assert world["loss_end"] < 0.7 * world["loss0"], (world["loss0"],
                                                      world["loss_end"])


def test_reg_term_sign_shrinks_word_embedding(world):
    """The ||word||^2 regularizer must PUSH DOWN the predicted word
    embedding's norm: two short phase-1 runs differing only in
    reg_lambda (0 vs large) are compared under one probe metric — the
    high-reg run must end with the smaller norm. A sign flip on the reg
    term (which still decreases total training loss) fails here.

    (A loss-based conditioning-discrimination check was tried instead
    and is unlearnable at this scale: the per-sample conditioning
    margin is ~2e-4 while the diffusion-loss noise floor is ~1e-3 —
    probed across domain_embed_scale 0.1/1.0, pinned high-noise
    timesteps, and spatial vs color identities. The composed
    conditioning path is instead covered by
    test_phase2_tuning_moves_sample_toward_target, which fails on any
    train-vs-sample blend inconsistency.)"""
    modules, make_batch = world["modules"], world["make_batch"]
    base = make_batch(PALETTE)

    def train_short(reg_lambda, steps=80):
        cfg = E4TTrainConfig(reg_lambda=reg_lambda)
        tx = make_optimizer(3e-3, cfg)
        state, frozen = create_train_state(world["params0"], cfg, tx)
        step = jax.jit(make_train_step(modules, DDPMScheduler(), cfg, tx))
        for i in range(steps):
            state, _ = step(state, frozen, base, jax.random.PRNGKey(i))
        return state.trainable, frozen

    probe_cfg = E4TTrainConfig(reg_lambda=1.0)  # shared probe metric

    def word_norm(trainable, frozen, n=8):
        vals = []
        for s in range(n):
            _, m = e4t_loss_fn(modules, DDPMScheduler(), probe_cfg,
                               trainable, frozen, base,
                               jax.random.PRNGKey(100 + s))
            vals.append(float(m["loss_reg"]))
        return np.mean(vals)

    t0, f0 = train_short(reg_lambda=0.0)
    t1, f1 = train_short(reg_lambda=1.0)
    n0, n1 = word_norm(t0, f0), word_norm(t1, f1)
    assert n1 < n0, (n0, n1)


def test_phase2_tuning_moves_sample_toward_target(world):
    modules, tokenizer = world["modules"], world["tokenizer"]
    e4t_config, p1 = world["e4t_config"], world["p1"]
    make_batch = world["make_batch"]

    def latent_target(rgb):
        px = jnp.transpose(jnp.asarray(_color_image(rgb))[None],
                           (0, 3, 1, 2))
        mean, _ = modules.vae.apply({"params": p1["vae"]}, px,
                                    method=AutoencoderKL.encode)
        return np.asarray(mean) * modules.vae.config.scaling_factor

    def sample_latents(p, rgb, seed):
        pipe = StableDiffusionE4TPipeline(
            modules, p, tokenizer, e4t_config,
            already_added_placeholder_token=True)
        img = ((np.asarray(_color_image(rgb)) + 1) / 2 * 255).astype(np.uint8)
        return pipe("a photo of *s", img, num_inference_steps=8,
                    guidance_scale=7.5, seed=seed, output_type="latent",
                    height=32, width=32)

    def mse(a, b):
        return float(np.mean((np.asarray(a) - np.asarray(b)) ** 2))

    target = latent_target(HELD)
    before = sample_latents(p1, HELD, seed=1)

    cfg2 = E4TTrainConfig(train_unet=True, train_text_encoder=True,
                          max_grad_norm=1.0, reg_lambda=1e-4)
    tx2 = make_optimizer(1e-3, cfg2)
    state2, frozen2 = create_train_state(p1, cfg2, tx2)
    step2 = jax.jit(make_train_step(modules, DDPMScheduler(), cfg2, tx2))
    held_batch = make_batch([HELD])
    # phase-2 quirk: VAE encodes ONCE outside the step (reference
    # tuning_e4t.py samples the posterior a single time)
    held_batch["latents"] = encode_latents(modules, p1["vae"],
                                           held_batch["pixel_values"],
                                           jax.random.PRNGKey(99))
    for i in range(N_PHASE2):
        state2, _ = step2(state2, frozen2, held_batch,
                          jax.random.PRNGKey(1000 + i))
    p2 = merge_params(state2.trainable, frozen2)
    p2 = {k: p2[k] for k in ("unet", "vae", "text", "e4t", "offsets")}
    after = sample_latents(p2, HELD, seed=1)

    m_before, m_after = mse(before, target), mse(after, target)
    # prototype margin: 98 -> 21 (4.5x); assert a conservative 2x
    assert m_after < 0.5 * m_before, (m_before, m_after)

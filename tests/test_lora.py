"""LoRA attention adapters (models/lora.py).

Covers: init contract (zero-up no-op, rank bound, torch-matching init
distribution), fold math vs an independent torch oracle of the
reference's LoRACrossAttnProcessor projection
(/root/reference/e4t/models/cross_attention.py:325-395 — additive LoRA
AFTER the multiplicative weight offset), the diffusers-0.14 attn-procs
key interchange at SD-v1 geometry, and end-to-end sampling behavior.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from e4t_diffusion_tpu.models import lora
from e4t_diffusion_tpu.models import weight_offsets as wo
from e4t_diffusion_tpu.models.unet import UNetConfig


def test_init_contract():
    layer = lora.init_lora_layer(jax.random.PRNGKey(0), 16, 8, rank=4)
    assert layer["down"].shape == (16, 4)
    assert layer["up"].shape == (4, 8)
    np.testing.assert_array_equal(np.asarray(layer["up"]), 0.0)
    # down ~ N(0, 1/rank): std of 64 samples around 0.25
    std = np.asarray(layer["down"]).std()
    assert 0.1 < std < 0.5, std
    with pytest.raises(ValueError):
        lora.init_lora_layer(jax.random.PRNGKey(0), 16, 8, rank=9)


def test_fresh_bank_folds_to_identity():
    cfg = UNetConfig.tiny()
    key = jax.random.PRNGKey(0)
    bank = lora.init_lora_bank(key, cfg, rank=2)
    # fake minimal params holding just the adapted kernels
    params = {}
    for site in bank:
        node = params
        for p in site.split("."):
            node = node.setdefault(p, {})
        for proj, lk in (("to_q", "to_q_lora"), ("to_k", "to_k_lora"),
                         ("to_v", "to_v_lora"), ("to_out_0", "to_out_lora")):
            d = bank[site][lk]["down"].shape[0]
            o = bank[site][lk]["up"].shape[1]
            node[proj] = {"kernel": jax.random.normal(
                jax.random.fold_in(key, hash((site, proj)) % 2**31), (d, o))}
    folded = lora.fold_lora_bank(params, bank, scale=1.0)
    for site in bank:
        node_i, node_f = params, folded
        for p in site.split("."):
            node_i, node_f = node_i[p], node_f[p]
        for proj in ("to_q", "to_k", "to_v", "to_out_0"):
            np.testing.assert_array_equal(
                np.asarray(node_i[proj]["kernel"]),
                np.asarray(node_f[proj]["kernel"]))


def test_fold_matches_torch_oracle():
    """kernel*(1+O) + scale*down@up applied to x must equal the torch
    computation F.linear(x, W*(1+O), b) + scale*up(down(x)) — the exact
    reference processor math (cross_attention.py:369-371)."""
    torch = pytest.importorskip("torch")

    rng = np.random.default_rng(0)
    din, dout, r, scale = 12, 10, 3, 0.7
    W = rng.normal(size=(dout, din)).astype(np.float32)   # torch (out,in)
    b = rng.normal(size=(dout,)).astype(np.float32)
    O = rng.normal(size=(dout, din)).astype(np.float32) * 0.1
    down = rng.normal(size=(r, din)).astype(np.float32)   # torch (r, in)
    up = rng.normal(size=(dout, r)).astype(np.float32)    # torch (out, r)
    x = rng.normal(size=(5, din)).astype(np.float32)

    with torch.no_grad():
        tx = torch.from_numpy(x)
        ref = torch.nn.functional.linear(
            tx, torch.from_numpy(W * (1 + O)), torch.from_numpy(b))
        ref = ref + scale * torch.nn.functional.linear(
            torch.nn.functional.linear(tx, torch.from_numpy(down)),
            torch.from_numpy(up))
        ref = ref.numpy()

    # JAX side: (in, out) layout; offset-folded base kernel, then the
    # LoRA delta — the fold math make_sample_fn applies
    kernel_base = jnp.asarray(W.T) * (1 + jnp.asarray(O.T))
    layer = {"down": jnp.asarray(down.T), "up": jnp.asarray(up.T)}
    delta = layer["down"] @ layer["up"]
    k_eff = kernel_base + scale * delta
    out = np.asarray(jnp.asarray(x) @ k_eff + jnp.asarray(b))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_fold_lora_bank_applies_delta():
    cfg = UNetConfig.tiny()
    key = jax.random.PRNGKey(1)
    bank = lora.init_lora_bank(key, cfg, rank=2)
    # randomize the zero 'up' factors so the fold is non-trivial
    bank = jax.tree_util.tree_map(
        lambda x: x + 0.01 * jax.random.normal(key, x.shape), bank)
    site = next(iter(bank))
    params = {}
    node = params
    for p in site.split("."):
        node = node.setdefault(p, {})
    d = bank[site]["to_q_lora"]["down"].shape[0]
    o = bank[site]["to_q_lora"]["up"].shape[1]
    node["to_q"] = {"kernel": jnp.zeros((d, o))}
    node["to_k"] = {"kernel": jnp.zeros(
        (bank[site]["to_k_lora"]["down"].shape[0], o))}
    node["to_v"] = {"kernel": jnp.zeros(
        (bank[site]["to_v_lora"]["down"].shape[0], o))}
    node["to_out_0"] = {"kernel": jnp.zeros(
        (bank[site]["to_out_lora"]["down"].shape[0],
         bank[site]["to_out_lora"]["up"].shape[1]))}
    folded = lora.fold_lora_bank(params, {site: bank[site]}, scale=2.0)
    node_f = folded
    for p in site.split("."):
        node_f = node_f[p]
    expect = 2.0 * np.asarray(bank[site]["to_q_lora"]["down"]
                              @ bank[site]["to_q_lora"]["up"])
    np.testing.assert_allclose(np.asarray(node_f["to_q"]["kernel"]),
                               expect, rtol=1e-6)


def test_torch_interchange_roundtrip_and_keys():
    cfg = UNetConfig()  # full SD-v1 geometry
    bank = lora.init_lora_bank(jax.random.PRNGKey(0), cfg, rank=4)
    sd = lora.lora_to_torch(bank)
    # SD v1: 32 attention sites x 4 adapters x 2 factors
    assert len(sd) == 32 * 4 * 2, len(sd)
    assert ("down_blocks.0.attentions.0.transformer_blocks.0.attn1"
            ".processor.to_q_lora.down.weight") in sd
    assert ("mid_block.attentions.0.transformer_blocks.0.attn2"
            ".processor.to_out_lora.up.weight") in sd
    assert ("up_blocks.3.attentions.2.transformer_blocks.0.attn2"
            ".processor.to_v_lora.down.weight") in sd
    # torch layout is (out, in)
    k = ("down_blocks.0.attentions.0.transformer_blocks.0.attn1"
         ".processor.to_q_lora.down.weight")
    assert sd[k].shape == (4, 320)

    back = lora.lora_from_torch(sd, cfg)
    for site in bank:
        for lk in bank[site]:
            for leaf in ("down", "up"):
                np.testing.assert_array_equal(
                    np.asarray(bank[site][lk][leaf]),
                    np.asarray(back[site][lk][leaf]))

    sd.pop(k)
    with pytest.raises(ValueError, match="missing"):
        lora.lora_from_torch(sd, cfg)


def test_sampling_with_lora(tiny_world):
    """End-to-end: zero-up bank is a no-op at any scale; a perturbed
    bank changes the output; scale=0 restores the baseline."""
    from e4t_diffusion_tpu.diffusion.pipeline import make_sample_fn
    from e4t_diffusion_tpu.diffusion.schedulers import DDIMScheduler
    from e4t_diffusion_tpu.models.clip_text import embed_tokens

    modules, params = tiny_world
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
    base = np.asarray(make_sample_fn(modules, DDIMScheduler(), 2, 7.5,
                                     0.1)(*args))

    bank = lora.init_lora_bank(jax.random.PRNGKey(3),
                               modules.unet.config, rank=2)
    fn = make_sample_fn(modules, DDIMScheduler(), 2, 7.5, 0.1,
                        lora_scale=1.0)
    np.testing.assert_allclose(np.asarray(fn(*args, bank)), base,
                               rtol=1e-5, atol=1e-5)  # zero-up: no-op

    bank_live = jax.tree_util.tree_map(
        lambda x: x + 0.05 * jax.random.normal(jax.random.PRNGKey(4),
                                               x.shape), bank)
    out_live = np.asarray(fn(*args, bank_live))
    assert np.abs(out_live - base).max() > 1e-4

    fn0 = make_sample_fn(modules, DDIMScheduler(), 2, 7.5, 0.1,
                         lora_scale=0.0)
    np.testing.assert_allclose(np.asarray(fn0(*args, bank_live)), base,
                               rtol=1e-5, atol=1e-5)


def test_lora_composes_with_int8_static(tiny_world):
    """LoRA + int8='static': calibration folds the bank (same effective
    kernels as serving), and the quantized run tracks the bf16 LoRA
    run."""
    from e4t_diffusion_tpu.diffusion.pipeline import (make_calibration_fn,
                                                      make_sample_fn)
    from e4t_diffusion_tpu.diffusion.schedulers import DDIMScheduler
    from e4t_diffusion_tpu.models.clip_text import embed_tokens

    modules, params = tiny_world
    tcfg = modules.text_encoder.config
    L = tcfg.max_position_embeddings
    ids = jnp.zeros((1, L), jnp.int32).at[0, 3].set(7)
    embeds = embed_tokens(params["text"], ids)
    common = (jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8, 8)),
              jnp.zeros((1, 3, 32, 32)), embeds, jnp.asarray([3], jnp.int32),
              jnp.zeros((1, L), jnp.int32),
              embed_tokens(params["text"], jnp.asarray([[5]]))[0, 0],
              jax.random.PRNGKey(1))
    bank = lora.init_lora_bank(jax.random.PRNGKey(3),
                               modules.unet.config, rank=2)
    bank = jax.tree_util.tree_map(
        lambda x: x + 0.05 * jax.random.normal(jax.random.PRNGKey(4),
                                               x.shape), bank)
    args = (params["unet"], params["offsets"], params["vae"],
            params["text"], params["e4t"], *common)
    ref = np.asarray(make_sample_fn(modules, DDIMScheduler(), 4, 7.5, 0.1,
                                    lora_scale=1.0)(*args, bank))
    amax = make_calibration_fn(modules, DDIMScheduler(), 4, 7.5, 0.1,
                               lora_scale=1.0)(
        params["unet"], params["offsets"], params["text"], params["e4t"],
        *common, bank)
    q = np.asarray(make_sample_fn(modules, DDIMScheduler(), 4, 7.5, 0.1,
                                  int8="static", lora_scale=1.0)(
        *args, amax, bank))
    corr = np.corrcoef(ref.ravel(), q.ravel())[0, 1]
    assert corr > 0.97, corr


@pytest.fixture(scope="module")
def tiny_world():
    from e4t_diffusion_tpu.diffusion.pipeline import E4TModules

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

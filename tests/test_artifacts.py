"""Artifact contract tests: 3-artifact .pt layout, SD-base loading, orbax."""
import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from e4t_diffusion_tpu.config import AttributeDict, load_config
from e4t_diffusion_tpu.diffusion.pipeline import E4TModules
from e4t_diffusion_tpu.models import weight_offsets as wo
from e4t_diffusion_tpu.utils import artifacts, convert


@pytest.fixture(scope="module")
def tiny_params():
    modules = E4TModules.tiny()
    rng = jax.random.PRNGKey(0)
    ks = jax.random.split(rng, 5)
    tcfg = modules.text_encoder.config
    ecfg = modules.e4t_encoder.config
    return modules, {
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


def _write_sd_base(path, modules, params):
    """Synthesize a diffusers-format SD checkpoint dir from tiny params."""
    ucfg = modules.unet.config
    os.makedirs(os.path.join(path, "unet"), exist_ok=True)
    with open(os.path.join(path, "unet", "config.json"), "w") as f:
        json.dump({
            "sample_size": ucfg.sample_size, "in_channels": 4,
            "out_channels": 4,
            "down_block_types": list(ucfg.down_block_types),
            "up_block_types": list(ucfg.up_block_types),
            "block_out_channels": list(ucfg.block_out_channels),
            "layers_per_block": ucfg.layers_per_block,
            "attention_head_dim": ucfg.attention_head_dim,
            "cross_attention_dim": ucfg.cross_attention_dim,
            "norm_num_groups": ucfg.norm_num_groups,
        }, f)
    convert.save_torch_state_dict(
        convert.unet_to_torch(params["unet"]),
        os.path.join(path, "unet", "diffusion_pytorch_model.bin"))

    vcfg = modules.vae.config
    os.makedirs(os.path.join(path, "vae"), exist_ok=True)
    with open(os.path.join(path, "vae", "config.json"), "w") as f:
        json.dump({"block_out_channels": list(vcfg.block_out_channels),
                   "layers_per_block": vcfg.layers_per_block,
                   "norm_num_groups": vcfg.norm_num_groups,
                   "sample_size": vcfg.sample_size}, f)
    convert.save_torch_state_dict(
        convert.vae_to_torch(params["vae"]),
        os.path.join(path, "vae", "diffusion_pytorch_model.bin"))

    tcfg = modules.text_encoder.config
    os.makedirs(os.path.join(path, "text_encoder"), exist_ok=True)
    with open(os.path.join(path, "text_encoder", "config.json"), "w") as f:
        json.dump({"vocab_size": tcfg.vocab_size,
                   "hidden_size": tcfg.hidden_size,
                   "num_hidden_layers": tcfg.num_layers,
                   "num_attention_heads": tcfg.num_heads,
                   "intermediate_size": tcfg.intermediate_size,
                   "max_position_embeddings": tcfg.max_position_embeddings},
                  f)
    convert.save_torch_state_dict(
        convert.clip_text_to_torch(params["text"], tcfg.num_layers),
        os.path.join(path, "text_encoder", "pytorch_model.bin"))

    os.makedirs(os.path.join(path, "scheduler"), exist_ok=True)
    with open(os.path.join(path, "scheduler", "scheduler_config.json"), "w") as f:
        json.dump({"beta_start": 0.00085, "beta_end": 0.012,
                   "beta_schedule": "scaled_linear",
                   "num_train_timesteps": 1000, "steps_offset": 1,
                   "set_alpha_to_one": False}, f)
    return path


def _trees_equal(a, b):
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = jax.tree_util.tree_leaves_with_path(b)
    assert len(la) == len(lb)
    for (pa, va), (pb, vb) in zip(sorted(la, key=lambda x: str(x[0])),
                                  sorted(lb, key=lambda x: str(x[0]))):
        assert str(pa) == str(pb)
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))


def test_sd_base_roundtrip(tiny_params, tmp_path):
    modules, params = tiny_params
    base_dir = _write_sd_base(str(tmp_path / "sd"), modules, params)
    base = artifacts.load_sd_base(base_dir)
    _trees_equal(base["unet"], params["unet"])
    _trees_equal(base["vae"], params["vae"])
    _trees_equal(base["text"], params["text"])
    assert base["schedule_config"].steps_offset == 1


def test_pretrain_artifact_roundtrip(tiny_params, tmp_path):
    modules, params = tiny_params
    base_dir = _write_sd_base(str(tmp_path / "sd"), modules, params)
    ecfg = modules.e4t_encoder.config
    cfg = {"placeholder_token": "*s", "domain_class_token": "face",
           "pretrained_model_name_or_path": base_dir}
    out = artifacts.save_e4t_weights(
        str(tmp_path / "run"), 100, cfg, params["e4t"], ecfg,
        offsets=params["offsets"])
    assert os.path.exists(os.path.join(out, "weight_offsets.pt"))
    assert os.path.exists(os.path.join(out, "encoder.pt"))
    assert load_config(out).placeholder_token == "*s"

    base = artifacts.load_sd_base(base_dir)
    loaded = artifacts.load_e4t_weights(out, base, ecfg)
    _trees_equal(loaded["offsets"], params["offsets"])
    _trees_equal(loaded["e4t"], params["e4t"])
    _trees_equal(loaded["unet"], params["unet"])  # base unet untouched


def test_tuning_artifact_roundtrip(tiny_params, tmp_path):
    modules, params = tiny_params
    base_dir = _write_sd_base(str(tmp_path / "sd"), modules, params)
    ecfg = modules.e4t_encoder.config
    tcfg = modules.text_encoder.config
    cfg = {"pretrained_args": {"placeholder_token": "*s"}}
    out = artifacts.save_e4t_weights(
        str(tmp_path / "run"), 30, cfg, params["e4t"], ecfg,
        offsets=params["offsets"], unet_params=params["unet"],
        text_params=params["text"], text_num_layers=tcfg.num_layers)
    assert os.path.exists(os.path.join(out, "unet.pt"))
    assert os.path.exists(os.path.join(out, "text_encoder.pt"))
    # the unet.pt embeds offsets with the reference "wo" key convention
    sd = convert.load_torch_state_dict(os.path.join(out, "unet.pt"))
    assert any(".wo_q." in k for k in sd)

    base = artifacts.load_sd_base(base_dir)
    loaded = artifacts.load_e4t_weights(out, base, ecfg)
    _trees_equal(loaded["unet"], params["unet"])
    _trees_equal(loaded["offsets"], params["offsets"])
    _trees_equal(loaded["text"], params["text"])


def test_orbax_train_state_roundtrip(tiny_params, tmp_path):
    from e4t_diffusion_tpu.diffusion.schedulers import DDPMScheduler
    from e4t_diffusion_tpu.training.train_step import (
        E4TTrainConfig, create_train_state, make_optimizer)

    modules, params = tiny_params
    cfg = E4TTrainConfig()
    tx = make_optimizer(1e-3, cfg)
    state, frozen = create_train_state(params, cfg, tx)
    rng = jax.random.PRNGKey(3)
    path = artifacts.save_train_state(str(tmp_path / "out"), 7, state, rng)
    assert artifacts.find_latest_checkpoint(str(tmp_path / "out")) == path

    state2, rng2, step = artifacts.restore_train_state(path, state, rng)
    assert step == 0  # saved state.step was 0; dir name says 7
    _trees_equal(state2.trainable, state.trainable)
    np.testing.assert_array_equal(np.asarray(rng2), np.asarray(rng))


def test_orbax_async_train_state_roundtrip(tiny_params, tmp_path):
    """async_save hands Orbax the live arrays and returns while the
    write runs in background threads; after wait_for_checkpoints the
    checkpoint is committed, restorable, and a second async save (which
    first drains the in-flight one) works too."""
    from e4t_diffusion_tpu.training.train_step import (
        E4TTrainConfig, create_train_state, make_optimizer)

    modules, params = tiny_params
    cfg = E4TTrainConfig()
    tx = make_optimizer(1e-3, cfg)
    state, frozen = create_train_state(params, cfg, tx)
    rng = jax.random.PRNGKey(3)
    out = str(tmp_path / "out")
    path = artifacts.save_train_state(out, 5, state, rng, async_save=True)
    path2 = artifacts.save_train_state(out, 9, state, rng, async_save=True)
    artifacts.wait_for_checkpoints()
    assert artifacts.find_latest_checkpoint(out) == path2

    state2, rng2, _ = artifacts.restore_train_state(path, state, rng)
    _trees_equal(state2.trainable, state.trainable)
    state3, rng3, _ = artifacts.restore_train_state(path2, state, rng)
    _trees_equal(state3.opt_state, state.opt_state)
    np.testing.assert_array_equal(np.asarray(rng2), np.asarray(rng))


def test_find_latest_checkpoint_ordering(tmp_path):
    for s in (100, 20, 3):
        os.makedirs(tmp_path / f"checkpoint-{s}")
    assert artifacts.find_latest_checkpoint(str(tmp_path)).endswith(
        "checkpoint-100")
    assert artifacts.find_latest_checkpoint(str(tmp_path / "nope")) is None

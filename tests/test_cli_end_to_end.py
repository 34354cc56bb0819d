"""Full CLI chain on tiny configs: pretrain -> tuning -> inference.

Exercises the three entry points exactly as a user would
(subprocess, flag surfaces), against a synthetic local SD base +
tiny ViT geometry (--vit_config tiny / persisted in config.json).
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

from e4t_diffusion_tpu.diffusion.pipeline import E4TModules
from e4t_diffusion_tpu.utils.tokenizer import make_tiny_tokenizer_files
from test_artifacts import _write_sd_base, tiny_params  # noqa: F401

# E4T_PLATFORM is honored by the CLIs via utils/runtime even on images
# whose sitecustomize pins the TPU plugin (JAX_PLATFORMS env is silently
# ignored there — previously these subprocesses actually ran on the TPU
# and could time out when the chip was busy).
ENV = {**os.environ, "JAX_PLATFORMS": "cpu",
       "E4T_PLATFORM": "cpu", "E4T_NUM_CPU_DEVICES": "2",
       "XLA_FLAGS": "--xla_force_host_platform_device_count=2"}


def _run(args, cwd):
    proc = subprocess.run([sys.executable] + args, cwd=cwd, env=ENV,
                          capture_output=True, text=True, timeout=1200)
    if proc.returncode != 0:
        raise AssertionError(
            f"CLI failed ({args[0]}):\nSTDOUT:\n{proc.stdout[-4000:]}\n"
            f"STDERR:\n{proc.stderr[-4000:]}")
    return proc


@pytest.mark.slow
def test_pretrain_tuning_inference_chain(tiny_params, tmp_path):  # noqa: F811
    modules, params = tiny_params
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    # synthetic local SD base (+ tokenizer subfolder)
    sd_dir = _write_sd_base(str(tmp_path / "sd"), modules, params)
    make_tiny_tokenizer_files(
        os.path.join(sd_dir, "tokenizer"),
        extra_words=["photo", "of", "a", "the", "face", "monet", "style",
                     "in"])

    # tiny training images
    data_dir = tmp_path / "data"
    os.makedirs(data_dir)
    rng = np.random.default_rng(0)
    for i in range(4):
        Image.fromarray(rng.integers(0, 255, (48, 48, 3), dtype=np.uint8)
                        ).save(data_dir / f"{i}.png")

    # 1) pretrain: 2 steps, tiny vit, sample logging at step 1 (2 ddim steps)
    pre_out = str(tmp_path / "pretrain_out")
    _run(["pretrain_e4t.py",
          "--pretrained_model_name_or_path", sd_dir,
          "--train_image_dataset", str(data_dir),
          "--domain_class_token", "face",
          "--prompt_template", "normal",
          "--resolution", "32",
          "--train_batch_size", "2",
          "--max_train_steps", "2",
          "--checkpointing_steps", "2",
          "--log_steps", "1000",
          "--n_save_sample", "1",
          "--save_inference_steps", "2",
          "--save_sample_prompt", "a photo of *s",
          "--report_to", "tensorboard",
          "--output_dir", pre_out,
          "--vit_config", "tiny",
          "--seed", "0"], cwd=repo)
    art = os.path.join(pre_out, "2")
    assert os.path.exists(os.path.join(art, "weight_offsets.pt"))
    assert os.path.exists(os.path.join(art, "encoder.pt"))
    assert os.path.exists(os.path.join(pre_out, "checkpoint-2"))
    assert os.path.exists(os.path.join(pre_out, "samples", "sample-1.png"))
    with open(os.path.join(art, "config.json")) as f:
        cfg = json.load(f)
    assert cfg["placeholder_token"] == "*s"
    assert cfg["vit_config"] == "tiny"

    # 2) tuning: 2 steps on one image
    tune_out = str(tmp_path / "tune_out")
    _run(["tuning_e4t.py",
          "--pretrained_model_name_or_path", art,
          "--train_image_path", str(data_dir / "0.png"),
          "--resolution", "32",
          "--train_batch_size", "2",
          "--max_train_steps", "2",
          "--train_text_encoder",
          "--output_dir", tune_out,
          "--seed", "0"], cwd=repo)
    tuned = os.path.join(tune_out, "2")
    for f in ("unet.pt", "encoder.pt", "text_encoder.pt", "domain.png",
              "config.json"):
        assert os.path.exists(os.path.join(tuned, f)), f
    with open(os.path.join(tuned, "config.json")) as f:
        tcfg = json.load(f)
    assert tcfg["pretrained_args"]["placeholder_token"] == "*s"

    # 3) inference on the tuned artifacts
    grid = str(tmp_path / "grid.png")
    _run(["inference.py",
          "--pretrained_model_name_or_path", tuned,
          "--image_path_or_url", str(data_dir / "1.png"),
          "--prompt", "a photo of *s",
          "--num_inference_steps", "2",
          "--guidance_scale", "2.0",
          "--height", "32", "--width", "32",
          "--seed", "1",
          "--output", grid], cwd=repo)
    img = Image.open(grid)
    assert img.size == (32, 32)


@pytest.mark.slow
def test_pretrain_sigterm_checkpoints(tiny_params, tmp_path):  # noqa: F811
    """Preemption handling (beyond reference parity): SIGTERM mid-run
    must checkpoint at the next step boundary and exit 0 — TPU pod
    preemptions deliver SIGTERM with a grace window."""
    import signal
    import threading
    import time

    modules, params = tiny_params
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sd_dir = _write_sd_base(str(tmp_path / "sd"), modules, params)
    make_tiny_tokenizer_files(
        os.path.join(sd_dir, "tokenizer"),
        extra_words=["photo", "of", "a", "the", "face"])
    data_dir = tmp_path / "data"
    os.makedirs(data_dir)
    rng = np.random.default_rng(0)
    for i in range(4):
        Image.fromarray(rng.integers(0, 255, (48, 48, 3), dtype=np.uint8)
                        ).save(data_dir / f"{i}.png")

    out_dir = str(tmp_path / "pre_sigterm")
    proc = subprocess.Popen(
        [sys.executable, "pretrain_e4t.py",
         "--pretrained_model_name_or_path", sd_dir,
         "--train_image_dataset", str(data_dir),
         "--domain_class_token", "face",
         "--prompt_template", "normal",
         "--resolution", "32", "--train_batch_size", "2",
         "--max_train_steps", "500", "--checkpointing_steps", "1000",
         "--log_steps", "1000", "--report_to", "tensorboard",
         "--output_dir", out_dir, "--vit_config", "tiny", "--seed", "0"],
        cwd=repo, env=ENV, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT)
    buf = bytearray()

    def _drain():
        for chunk in iter(lambda: proc.stdout.read(256), b""):
            buf.extend(chunk)

    t = threading.Thread(target=_drain, daemon=True)
    t.start()
    # wait for the first optimization step (tqdm prints a rate after it)
    deadline = time.time() + 900
    while time.time() < deadline:
        snap = bytes(buf)
        if b"s/it" in snap or b"it/s" in snap:
            break
        assert proc.poll() is None, \
            f"pretrain died early:\n{snap[-4000:].decode(errors='replace')}"
        time.sleep(2)
    else:
        proc.kill()
        raise AssertionError("no training step completed before deadline")

    proc.send_signal(signal.SIGTERM)
    rc = proc.wait(timeout=600)
    t.join(timeout=10)
    out = bytes(buf).decode(errors="replace")
    assert rc == 0, f"exit {rc}:\n{out[-4000:]}"
    assert "Preemption" in out, out[-4000:]
    entries = os.listdir(out_dir)
    assert any(e.startswith("checkpoint-") for e in entries), entries
    # final weights were saved through the normal path too
    step_dirs = [e for e in entries if e.isdigit()]
    assert step_dirs, entries

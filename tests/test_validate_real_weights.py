"""CI proof that the one-command real-weights validation chain executes
end-to-end (scripts/validate_real_weights.py) on a tiny synthetic SD
base — so the day real SD-v1-4 + E4T weights can be staged, the
validation is a 5-minute run, not a scripting project (VERDICT r3 #5).

The staged checkpoint's config deliberately points at the UNREACHABLE
hub name ("CompVis/stable-diffusion-v1-4"), proving the --sd_dir rewrite
works — exactly the situation with the published checkpoint
(/root/reference/README.md:22-27) on a no-egress machine.
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

from e4t_diffusion_tpu.utils import artifacts
from e4t_diffusion_tpu.utils.tokenizer import make_tiny_tokenizer_files
from test_artifacts import _write_sd_base, tiny_params  # noqa: F401


@pytest.mark.slow
def test_validation_chain_tiny(tiny_params, tmp_path):  # noqa: F811
    modules, params = tiny_params
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    sd_dir = _write_sd_base(str(tmp_path / "sd"), modules, params)
    make_tiny_tokenizer_files(
        os.path.join(sd_dir, "tokenizer"),
        extra_words=["photo", "of", "a", "the", "face", "in", "beach"])

    # a pretrain-flavor E4T checkpoint whose config references the hub
    ckpt_dir = artifacts.save_e4t_weights(
        str(tmp_path / "ckpt"), 100,
        {"placeholder_token": "*s", "domain_class_token": "face",
         "pretrained_model_name_or_path": "CompVis/stable-diffusion-v1-4",
         "vit_config": "tiny", "domain_embed_scale": 0.1,
         "clip_model_name_or_path": None, "unfreeze_clip_vision": False},
        params["e4t"], modules.e4t_encoder.config,
        offsets=params["offsets"])

    domain = tmp_path / "domain.png"
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 255, (48, 48, 3), dtype=np.uint8)
                    ).save(domain)

    out_dir = str(tmp_path / "validation")
    r = subprocess.run(
        [sys.executable, "scripts/validate_real_weights.py",
         "--e4t_ckpt", ckpt_dir,
         "--sd_dir", sd_dir,
         "--domain_image", str(domain),
         "--prompt", "a photo of *s in the beach",
         "--num_inference_steps", "2",
         "--resolution", "32",
         "--seed", "0",
         "--out_dir", out_dir],
        cwd=repo, capture_output=True, text=True, timeout=1800)
    assert r.returncode == 0, r.stdout + r.stderr

    with open(os.path.join(out_dir, "validation.json")) as f:
        report = json.load(f)
    # staged config was rewritten to the local SD dir
    with open(os.path.join(report["staged_ckpt"], "config.json")) as f:
        assert json.load(f)["pretrained_model_name_or_path"] == sd_dir
    # both configs generated and the image-level int8 delta is reported
    assert os.path.exists(report["bf16_sample"])
    assert os.path.exists(report["int8_sample"])
    assert 0.0 <= report["int8_vs_bf16"]["rel_l2"] < 1.0
    assert report["clip_scores"].startswith("skipped")

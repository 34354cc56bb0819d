"""scripts/int8_quality.py tiny-mode CPU coverage.

The quality study itself needs the real TPU (full SD-v1 geometry), but
its machinery — trajectory capture, calibration, the static/static_pc
config plumbing, and the round-5 image-space columns (final latents
decoded through one shared bf16 VAE; the metric
scripts/validate_real_weights.py scores real checkpoints with) — must
stay exercised per commit. The reference ships its fp16 serving path
with no quality study at all (/root/reference/inference.py:139-149);
this repo's standard is measured bounds, so the measuring code is
tested.
"""
import importlib.util
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_script():
    p = os.path.join(REPO, "scripts", "int8_quality.py")
    spec = importlib.util.spec_from_file_location("int8_quality_script", p)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("image_space", ["1", "0"])
def test_tiny_quality_run(monkeypatch, capsys, image_space):
    monkeypatch.setenv("E4T_QUAL_TINY", "1")
    monkeypatch.setenv("E4T_QUAL_STEPS", "4")
    monkeypatch.setenv("E4T_QUAL_MODE", "static,static_pc")
    monkeypatch.setenv("E4T_QUAL_IMAGE", image_space)
    monkeypatch.delenv("E4T_INT8_STATIC_EXCLUDE", raising=False)
    results = _load_script().main()
    assert [r["metric"] for r in results] == [
        "int8_static_vs_bf16_rel_l2_final",
        "int8_static_pc_vs_bf16_rel_l2_final"]
    for r in results:
        assert len(r["per_step_rel_l2"]) == 4
        # quantization error must be well inside the unrelated-samples
        # anchor even on the tiny net
        assert 0.0 < r["value"] < r["anchor_unrelated_rel_l2"]
        assert r["calib_steps"] == 4
        if image_space == "1":
            # image-space columns ride beside the latent bounds
            assert 0.0 < r["image_rel_l2"] < r["image_anchor_rel_l2"]
            assert r["image_psnr_db"] > 10.0
            assert 0.0 < r["image_fraction_of_unrelated"] < 1.0
        else:
            assert "image_rel_l2" not in r


def test_tiny_quality_dpmpp(monkeypatch):
    """The fast-sampler bound path (E4T_QUAL_SCHEDULER=dpmpp) drives the
    2nd-order multistep scheduler through the same machinery."""
    monkeypatch.setenv("E4T_QUAL_TINY", "1")
    monkeypatch.setenv("E4T_QUAL_STEPS", "4")
    monkeypatch.setenv("E4T_QUAL_MODE", "static_pc")
    monkeypatch.setenv("E4T_QUAL_IMAGE", "0")
    monkeypatch.setenv("E4T_QUAL_SCHEDULER", "dpmpp")
    monkeypatch.delenv("E4T_INT8_STATIC_EXCLUDE", raising=False)
    (r,) = _load_script().main()
    assert r["scheduler"] == "DPMSolverMultistepScheduler"
    assert 0.0 < r["value"] < r["anchor_unrelated_rel_l2"]

"""Coverage for hub registry, trackers, profiling, image utils, config."""
import json
import os

import numpy as np
import pytest
from PIL import Image

from e4t_diffusion_tpu.config import (
    AttributeDict, get_e4t_config, getattr_from_config, load_config,
    save_config)
from e4t_diffusion_tpu.utils import hub
from e4t_diffusion_tpu.utils.image import image_grid, load_image, to_pil
from e4t_diffusion_tpu.utils.profiling import StepTimer
from e4t_diffusion_tpu.utils.trackers import (
    NullTracker, TensorBoardTracker, make_tracker)


def test_attribute_dict_permissive():
    d = AttributeDict({"a": 1})
    assert d.a == 1
    assert d.missing is None  # reference AttributeDict semantics
    d.b = 2
    assert d.to_dict() == {"a": 1, "b": 2}


def test_config_roundtrip_and_nesting(tmp_path):
    cfg = {"placeholder_token": "*s", "pretrained_args": {"reg_lambda": 0.01}}
    save_config(cfg, str(tmp_path))
    loaded = load_config(str(tmp_path))
    assert get_e4t_config(loaded).reg_lambda == 0.01
    assert getattr_from_config(loaded, "reg_lambda") == 0.01
    flat = AttributeDict({"x": 5, "pretrained_args": None})
    assert getattr_from_config(flat, "x") == 5


def test_hub_resolves_local_paths_and_mirror(tmp_path, monkeypatch):
    p = tmp_path / "model"
    os.makedirs(p)
    assert hub.resolve_model_dir(str(p)) == str(p)
    # registry name against a local mirror
    mirror = tmp_path / "mirror"
    os.makedirs(mirror / "e4t-diffusion-ffhq-celebahq-v1")
    monkeypatch.setenv("E4T_MODELS_DIR", str(mirror))
    out = hub.resolve_model_dir("e4t-diffusion-ffhq-celebahq-v1")
    assert out.endswith("e4t-diffusion-ffhq-celebahq-v1")
    with pytest.raises(AssertionError):
        hub.resolve_model_dir("not-a-model")


def test_tensorboard_tracker_writes_events(tmp_path):
    t = make_tracker("tensorboard", str(tmp_path / "logs"), config={"a": 1})
    assert isinstance(t, TensorBoardTracker)
    t.log({"train/loss": 1.0}, step=1)
    t.log_images({"grid": np.zeros((4, 4, 3), np.uint8)}, step=1)
    t.finish()
    assert any(f.startswith("events") for f in os.listdir(tmp_path / "logs"))
    assert isinstance(make_tracker(None, str(tmp_path)), NullTracker)
    assert isinstance(make_tracker("tensorboard", str(tmp_path),
                                   is_main=False), NullTracker)


def test_step_timer_warmup_and_rates():
    import time

    t = StepTimer(warmup_steps=1, batch_size=4)
    for _ in range(4):
        t.step()
        time.sleep(0.01)
    m = t.metrics()
    assert m["perf/steps_per_sec"] > 0
    assert m["perf/samples_per_sec"] == pytest.approx(
        4 * m["perf/steps_per_sec"])
    assert StepTimer().metrics() == {}


def test_image_grid_and_load(tmp_path):
    imgs = [Image.new("RGB", (8, 8), (i * 40, 0, 0)) for i in range(6)]
    grid = image_grid(imgs, rows=2, cols=3)
    assert grid.size == (24, 16)
    path = tmp_path / "x.png"
    Image.new("RGB", (30, 20), (1, 2, 3)).save(path)
    img = load_image(str(path), resolution=16)
    assert img.size == (16, 16)
    with pytest.raises(ValueError, match="egress"):
        load_image("https://example.com/a.png")
    arr = to_pil(np.zeros((2, 3, 8, 8), np.float32))
    assert len(arr) == 2 and arr[0].size == (8, 8)


def test_graceful_shutdown_flag_and_restore():
    """SIGTERM sets the checkpoint-at-next-boundary flag without raising;
    restore() reinstates the previous handler."""
    import os
    import signal

    from e4t_diffusion_tpu.utils.runtime import GracefulShutdown

    prev = signal.getsignal(signal.SIGTERM)
    g = GracefulShutdown()
    try:
        assert not g.requested
        os.kill(os.getpid(), signal.SIGTERM)  # delivered synchronously
        assert g.requested
        assert "SIGTERM" in g.describe()
    finally:
        g.restore()
    assert signal.getsignal(signal.SIGTERM) is prev

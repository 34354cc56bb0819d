"""Experiment trackers: wandb / tensorboard / null, accelerate.log parity.

The reference logs train/loss, train/loss_diff, train/loss_reg, train/lr
scalars plus input/sample image grids (/root/reference/pretrain_e4t.py:
436-437,500-510,671-678). wandb is optional (not in the TPU image);
tensorboard uses tensorboardX which is baked in.
"""
from __future__ import annotations

import os
from typing import Dict, Optional


class NullTracker:
    def log(self, values: Dict, step: int) -> None:
        pass

    def log_images(self, images: Dict, step: int) -> None:
        pass

    def finish(self) -> None:
        pass


class TensorBoardTracker(NullTracker):
    def __init__(self, logging_dir: str, config: Optional[Dict] = None):
        from tensorboardX import SummaryWriter

        os.makedirs(logging_dir, exist_ok=True)
        self.writer = SummaryWriter(logging_dir)
        if config:
            self.writer.add_text("config", str(config), 0)

    def log(self, values: Dict, step: int) -> None:
        for k, v in values.items():
            self.writer.add_scalar(k, float(v), step)

    def log_images(self, images: Dict, step: int) -> None:
        import numpy as np

        for k, img in images.items():
            self.writer.add_image(k, np.asarray(img).transpose(2, 0, 1), step)

    def finish(self) -> None:
        self.writer.close()


class WandbTracker(NullTracker):
    def __init__(self, project: str, config: Optional[Dict] = None):
        import wandb

        self.wandb = wandb
        self.run = wandb.init(project=project, config=config)

    def log(self, values: Dict, step: int) -> None:
        self.wandb.log(values, step=step)

    def log_images(self, images: Dict, step: int) -> None:
        self.wandb.log({k: self.wandb.Image(v) for k, v in images.items()})

    def finish(self) -> None:
        self.run.finish()


def make_tracker(report_to: Optional[str], logging_dir: str,
                 project: str = "e4t", config: Optional[Dict] = None,
                 is_main: bool = True):
    if not is_main or report_to is None:
        return NullTracker()
    if report_to == "wandb":
        try:
            return WandbTracker(project, config)
        except ImportError:
            print("[trackers] wandb unavailable; falling back to tensorboard")
            report_to = "tensorboard"
    if report_to == "tensorboard":
        return TensorBoardTracker(logging_dir, config)
    return NullTracker()

"""Optimizer and schedule.

Replicates the reference recipe (mvsdet_res50_2x_low_res_depth.py:179-193):
AdamW lr 2e-4 / wd 1e-4, backbone lr x0.1, stem+stage1 frozen
(frozen_stages=1, ..._depth.py:22), global-norm grad clip 35, MultiStepLR
x0.1 at epochs (8, 11) over 12 epochs — built as optax transforms.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import optax

from mvsdet_tpu.config import OptimConfig

FROZEN_BACKBONE_PREFIXES = ("stem_", "layer1_")


def _param_label(path) -> str:
    keys = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    if keys and keys[0] == "backbone":
        if len(keys) > 1 and str(keys[1]).startswith(FROZEN_BACKBONE_PREFIXES):
            return "frozen"
        return "backbone"
    return "default"


def param_labels(params) -> Any:
    """Per-leaf optimizer group labels (default / backbone / frozen)."""
    return jax.tree_util.tree_map_with_path(lambda p, _: _param_label(p),
                                            params)


def lr_schedule(cfg: OptimConfig, steps_per_epoch: int):
    """MultiStepLR: x gamma at each milestone epoch."""
    boundaries = {m * steps_per_epoch: cfg.gamma for m in cfg.milestones}
    return optax.piecewise_constant_schedule(cfg.lr, boundaries)


def build_optimizer(cfg: OptimConfig, params, steps_per_epoch: int = 1000):
    """AdamW with lr-mult groups, freezing, and global-norm clipping."""
    sched = lr_schedule(cfg, steps_per_epoch)

    def adamw(mult: float):
        return optax.adamw(
            learning_rate=lambda step: sched(step) * mult,
            weight_decay=cfg.weight_decay)

    tx = optax.multi_transform(
        {
            "default": adamw(1.0),
            "backbone": adamw(cfg.backbone_lr_mult),
            "frozen": optax.set_to_zero(),
        },
        param_labels(params),
    )
    return optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm), tx)

"""Logging + metrics: timestamped text log, JSON lines, TensorBoard.

Replaces the reference's TextLoggerHook/TensorboardLoggerHook wiring
(config log_config, reference :402-408) and get_root_logger provenance dump
(tools/train_UniBEV.py:171-193).  Loss keys keep the reference's
``d{i}.loss_cls`` naming for comparability.
"""

from __future__ import annotations

import json
import logging
import os
import os.path as osp
import time
from typing import Any, Dict, Optional


def get_root_logger(log_file: Optional[str] = None,
                    log_level: str = "INFO") -> logging.Logger:
    logger = logging.getLogger("unibev_tpu")
    if logger.handlers:
        return logger
    logger.setLevel(getattr(logging, log_level))
    fmt = logging.Formatter("%(asctime)s - %(name)s - %(levelname)s - %(message)s")
    sh = logging.StreamHandler()
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_file:
        os.makedirs(osp.dirname(osp.abspath(log_file)), exist_ok=True)
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


def collect_env() -> Dict[str, Any]:
    import platform
    import jax
    env = dict(python=platform.python_version(),
               platform=platform.platform(),
               jax=jax.__version__,
               devices=[str(d) for d in jax.devices()])
    try:
        import flax
        env["flax"] = flax.__version__
    except ImportError:
        pass
    return env


class MetricsLogger:
    """Per-step scalar logging: text every ``interval`` iters + JSONL +
    optional TensorBoard."""

    def __init__(self, work_dir: str, logger: logging.Logger,
                 interval: int = 10, use_tensorboard: bool = True):
        self.logger = logger
        self.interval = interval
        self.work_dir = work_dir
        os.makedirs(work_dir, exist_ok=True)
        self.jsonl_path = osp.join(work_dir, "metrics.jsonl")
        self.tb = None
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter
                self.tb = SummaryWriter(osp.join(work_dir, "tf_logs"))
            except ImportError:
                pass
        self._t_last = time.time()

    def log_step(self, step: int, epoch: int, metrics: Dict[str, Any],
                 lr: float = None):
        scalars = {k: float(v) for k, v in metrics.items()}
        if lr is not None:
            scalars["lr"] = float(lr)
        now = time.time()
        scalars["time"] = now - self._t_last
        self._t_last = now
        with open(self.jsonl_path, "a") as f:
            f.write(json.dumps(dict(step=step, epoch=epoch, **scalars)) + "\n")
        if self.tb is not None:
            for k, v in scalars.items():
                self.tb.add_scalar(k, v, step)
        if step % self.interval == 0:
            parts = ", ".join(f"{k}: {v:.4f}" for k, v in scalars.items())
            self.logger.info(f"Epoch [{epoch}] Iter [{step}] {parts}")

    def log_eval(self, step: int, metrics: Dict[str, Any]):
        """Epoch-end scalars (val losses, eval metrics) to JSONL + TB."""
        scalars = {k: float(v) for k, v in metrics.items()}
        with open(self.jsonl_path, "a") as f:
            f.write(json.dumps(dict(step=step, **scalars)) + "\n")
        if self.tb is not None:
            for k, v in scalars.items():
                self.tb.add_scalar(k, v, step)

"""Orbax checkpointing: save/restore {params, opt_state, step, rng, stats}.

Replaces mmcv CheckpointHook / load_checkpoint / --resume-from
(SURVEY §5 checkpoint/resume): periodic saves every ``interval`` epochs
(config checkpoint_config.interval, reference :401), the late-stage
every-epoch hook (CheckpointLateStageHook, reference
models/hooks/checkpoint_hook.py:60-79), warm start (load_from) and full
resume (optimizer + step + rng restored).
"""

from __future__ import annotations

import logging
import os
import os.path as osp
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

logger = logging.getLogger("unibev")


class CheckpointManager:
    def __init__(self, directory: str, interval: int = 6,
                 late_stage_start: Optional[int] = None, max_to_keep: int = 10):
        self.directory = osp.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.interval = interval
        self.late_stage_start = late_stage_start
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                                 create=True))

    def should_save(self, epoch: int) -> bool:
        """Reference cadence: every ``interval`` epochs, plus every epoch from
        ``late_stage_start`` (CheckpointLateStageHook semantics)."""
        if (epoch + 1) % self.interval == 0:
            return True
        if self.late_stage_start is not None and (epoch + 1) >= self.late_stage_start:
            return True
        return False

    def save(self, step: int, state: Any, metadata: Optional[dict] = None):
        self.manager.save(step, args=ocp.args.StandardSave(state))
        self.manager.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        step = step if step is not None else self.manager.latest_step()
        if step is None:
            return None
        return self.manager.restore(step,
                                    args=ocp.args.StandardRestore(state_template))


def restore_state_from(path: str, state_template: Any) -> Any:
    """Restore a full TrainState from an EXPLICIT checkpoint path.

    Mirrors the reference's ``--resume-from <path>`` (train_UniBEV.py:36-37 ->
    runner.resume): the path may be either an orbax CheckpointManager root
    (work_dir/checkpoints — latest step is used) or a single step directory.
    Raises FileNotFoundError rather than silently training from scratch.
    """
    path = osp.abspath(path)
    if not osp.isdir(path):
        raise FileNotFoundError(f"--resume-from: no checkpoint at {path}")
    step_dirs = [d for d in os.listdir(path) if d.isdigit()]
    if step_dirs:  # CheckpointManager root layout
        mgr = ocp.CheckpointManager(path)
        step = mgr.latest_step()
        return mgr.restore(step, args=ocp.args.StandardRestore(state_template))
    return ocp.StandardCheckpointer().restore(path, state_template)


def save_params(path: str, variables: Any) -> None:
    """One-shot save of model variables (for test-CLI style checkpoints)."""
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(osp.abspath(path), variables, force=True)
    ckpt.wait_until_finished()


def load_params(path: str, template: Any = None) -> Any:
    """Restore a checkpoint, tolerating tree mismatches — LOUDLY.

    The UniBEV workflow evaluates single-modality models from an L+C-trained
    checkpoint (reference inference configs, SURVEY §3.4): the checkpoint
    holds MORE subtrees than the eval model (e.g. camera backbone params for
    an L-only model).  Matching paths are copied; template-only leaves keep
    their initialization; extra checkpoint subtrees are ignored.  Every
    kept-init / dropped / shape-mismatched path is logged (a converter bug
    must never silently become an accuracy loss).
    """
    ckpt = ocp.StandardCheckpointer()
    if template is None:
        return ckpt.restore(osp.abspath(path))
    raw = ckpt.restore(osp.abspath(path))
    kept, dropped = [], []
    merged = _merge_intersection(template, raw, "", kept, dropped)
    for p in kept:
        logger.warning(f"load_params: '{p}' missing/mismatched in checkpoint "
                       f"{path} — keeping initialization")
    for p in dropped:
        logger.info(f"load_params: checkpoint subtree '{p}' not in model — "
                    f"ignored")
    if kept:
        logger.warning(f"load_params: {len(kept)} leaves kept init, "
                       f"{len(dropped)} checkpoint subtrees ignored")
    return merged


def _merge_intersection(template: Any, raw: Any, path: str = "",
                        kept: Optional[list] = None,
                        dropped: Optional[list] = None) -> Any:
    import numpy as np
    kept = kept if kept is not None else []
    dropped = dropped if dropped is not None else []
    if isinstance(template, dict) or hasattr(template, "keys"):
        out = {}
        raw_d = dict(raw) if (isinstance(raw, dict) or hasattr(raw, "keys")) \
            else {}
        for k, v in dict(template).items():
            sub = f"{path}/{k}" if path else str(k)
            if k in raw_d:
                out[k] = _merge_intersection(v, raw_d[k], sub, kept, dropped)
            else:
                out[k] = v
                kept.append(sub)
        for k in raw_d:
            if k not in dict(template):
                dropped.append(f"{path}/{k}" if path else str(k))
        return out
    if raw is None:
        kept.append(path)
        return template
    rv = np.asarray(raw)
    tv = np.asarray(template)
    if rv.shape != tv.shape:
        kept.append(f"{path} (shape {rv.shape} != {tv.shape})")
        return template
    return rv.astype(tv.dtype)

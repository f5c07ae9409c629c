"""Orbax checkpointing: save/restore {params, opt_state, step, rng, stats}.

Replaces mmcv CheckpointHook / load_checkpoint / --resume-from
(SURVEY §5 checkpoint/resume): periodic saves every ``interval`` epochs
(config checkpoint_config.interval, reference :401), the late-stage
every-epoch hook (CheckpointLateStageHook, reference
models/hooks/checkpoint_hook.py:60-79), warm start (load_from) and full
resume (optimizer + step + rng restored).
"""

from __future__ import annotations

import os
import os.path as osp
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


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


def save_params(path: str, variables: Any) -> None:
    """One-shot save of model variables (for test-CLI style checkpoints)."""
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(osp.abspath(path), variables, force=True)
    ckpt.wait_until_finished()


def load_params(path: str, template: Any = None) -> Any:
    """Restore a checkpoint, tolerating tree mismatches.

    The UniBEV workflow evaluates single-modality models from an L+C-trained
    checkpoint (reference inference configs, SURVEY §3.4): the checkpoint
    holds MORE subtrees than the eval model (e.g. camera backbone params for
    an L-only model).  Matching paths are copied; template-only leaves keep
    their initialization; extra checkpoint subtrees are ignored.
    """
    ckpt = ocp.StandardCheckpointer()
    if template is None:
        return ckpt.restore(osp.abspath(path))
    try:
        return ckpt.restore(osp.abspath(path), template)
    except (ValueError, KeyError, TypeError):
        raw = ckpt.restore(osp.abspath(path))
        return _merge_intersection(template, raw)


def _merge_intersection(template: Any, raw: Any) -> Any:
    import numpy as np
    if isinstance(template, dict) or hasattr(template, "keys"):
        out = {}
        raw_d = raw if (isinstance(raw, dict) or hasattr(raw, "keys")) else {}
        for k, v in dict(template).items():
            out[k] = _merge_intersection(v, dict(raw_d).get(k)) \
                if k in dict(raw_d) else v
        return out
    if raw is None:
        return template
    rv = np.asarray(raw)
    tv = np.asarray(template)
    if rv.shape != tv.shape:
        return template
    return rv.astype(tv.dtype)

"""LR schedules matching the reference optimizer config.

Reference (/root/reference/projects/UniBEV/configs/unibev/
unibev_nus_LC_cnw_256_modality_dropout.py:391-396): CosineAnnealing with
linear warmup over 500 iters at warmup_ratio 1/3 and min_lr_ratio 1e-3.
"""

from __future__ import annotations

import jax.numpy as jnp


def cosine_with_linear_warmup(base_lr: float, total_steps: int,
                              warmup_iters: int = 500,
                              warmup_ratio: float = 1.0 / 3,
                              min_lr_ratio: float = 1e-3):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm_frac = jnp.clip(step / max(warmup_iters, 1), 0.0, 1.0)
        warm_lr = base_lr * (warmup_ratio + (1 - warmup_ratio) * warm_frac)
        t = jnp.clip((step - warmup_iters) / max(total_steps - warmup_iters, 1),
                     0.0, 1.0)
        min_lr = base_lr * min_lr_ratio
        cos_lr = min_lr + (base_lr - min_lr) * 0.5 * (1 + jnp.cos(jnp.pi * t))
        return jnp.where(step < warmup_iters, warm_lr, cos_lr)

    return schedule

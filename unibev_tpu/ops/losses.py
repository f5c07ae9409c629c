"""Detection losses — XLA-fused jnp expressions.

Replaces the reference's CUDA ``sigmoid_focal_loss`` (config loss_cls at
/root/reference/projects/UniBEV/configs/unibev/
unibev_nus_LC_cnw_256_modality_dropout.py:362-367) and mmdet ``L1Loss``.
All losses are mask-aware so padded queries/boxes contribute exactly zero.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from unibev_tpu.registry import LOSSES


def sigmoid_focal_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                       num_classes: int, alpha: float = 0.25,
                       gamma: float = 2.0) -> jnp.ndarray:
    """Per-element focal loss. ``labels == num_classes`` means background.

    logits: (..., num_classes); labels: (...,) int32.
    Returns (..., num_classes) elementwise loss (sum over classes = per-sample
    loss, matching mmcv's convention of weighting before the class sum).
    """
    onehot = jax.nn.one_hot(labels, num_classes, dtype=logits.dtype)
    p = jax.nn.sigmoid(logits)
    ce = optax_sigmoid_ce(logits, onehot)
    p_t = p * onehot + (1 - p) * (1 - onehot)
    alpha_t = alpha * onehot + (1 - alpha) * (1 - onehot)
    return alpha_t * ((1 - p_t) ** gamma) * ce


def optax_sigmoid_ce(logits, labels):
    """Numerically-stable sigmoid cross entropy."""
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(pred - target)


@LOSSES.register_module()
class FocalLoss:
    def __init__(self, use_sigmoid: bool = True, gamma: float = 2.0,
                 alpha: float = 0.25, loss_weight: float = 1.0):
        assert use_sigmoid
        self.gamma = gamma
        self.alpha = alpha
        self.loss_weight = loss_weight

    def __call__(self, logits, labels, weight=None, avg_factor=None):
        num_classes = logits.shape[-1]
        loss = sigmoid_focal_loss(logits, labels, num_classes,
                                  alpha=self.alpha, gamma=self.gamma)
        loss = loss.sum(-1)
        if weight is not None:
            loss = loss * weight
        total = loss.sum()
        if avg_factor is not None:
            total = total / jnp.maximum(avg_factor, 1e-6)
        return total * self.loss_weight


@LOSSES.register_module()
class L1Loss:
    def __init__(self, loss_weight: float = 1.0):
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        loss = l1_loss(pred, target)
        if weight is not None:
            loss = loss * weight
        total = loss.sum()
        if avg_factor is not None:
            total = total / jnp.maximum(avg_factor, 1e-6)
        return total * self.loss_weight


@LOSSES.register_module()
class GIoULoss:
    """Placeholder — weight 0.0 in every reference config."""

    def __init__(self, loss_weight: float = 0.0):
        self.loss_weight = loss_weight

    def __call__(self, *args, **kwargs):
        return jnp.float32(0.0)

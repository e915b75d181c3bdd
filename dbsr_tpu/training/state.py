"""Train state + optimizer construction.

Replaces the reference's torch Adam + StepLR + mutable-module state
(`train_settings/dbsr/default_synthetic.py:96-98`) with a pure pytree
TrainState and an optax step-indexed schedule (the StepLR epoch semantics
are expressed as a per-step piecewise-constant schedule, jit-friendly).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    """Pure training state pytree. ``epoch`` is tracked host-side by the
    trainer (not part of the jitted step); ``step`` increments per update."""
    step: jax.Array
    params: Any
    opt_state: Any

    @classmethod
    def create(cls, params, tx):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params))


def step_lr_schedule(base_lr: float, step_size_epochs: int, gamma: float,
                     steps_per_epoch: int) -> optax.Schedule:
    """StepLR as a step-indexed schedule: lr * gamma^(epoch // step_size).

    Matches torch ``optim.lr_scheduler.StepLR(step_size, gamma)`` stepped
    once per epoch (reference ``default_synthetic.py:98``,
    ``simple_trainer.py:147``).
    """

    def schedule(count):
        epoch = count // steps_per_epoch
        return base_lr * gamma ** (epoch // step_size_epochs)

    return schedule


def make_optimizer(base_lr: float = 1e-4, step_size_epochs: int = 40,
                   gamma: float = 0.2, steps_per_epoch: int = 1000,
                   clip_norm: Optional[float] = None,
                   ) -> optax.GradientTransformation:
    """Adam with the reference's StepLR decay (lr 1e-4, x0.2 every 40
    epochs for the synthetic config).

    ``clip_norm`` prepends global-norm gradient clipping — OFF by default
    (the reference protocol doesn't clip); available as a bf16-spike
    guard via ``--set grad_clip=1.0`` on the training CLI."""
    adam = optax.adam(
        step_lr_schedule(base_lr, step_size_epochs, gamma, steps_per_epoch))
    if clip_norm is None:
        return adam
    return optax.chain(optax.clip_by_global_norm(clip_norm), adam)

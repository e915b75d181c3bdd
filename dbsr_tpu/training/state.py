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
                   freeze_subtree: Optional[str] = None,
                   ) -> optax.GradientTransformation:
    """Adam with the reference's StepLR decay (lr 1e-4, x0.2 every 40
    epochs for the synthetic config).

    ``clip_norm`` prepends global-norm gradient clipping — OFF by default
    (the reference protocol doesn't clip); available as a bf16-spike
    guard via ``--set grad_clip=1.0`` on the training CLI.

    ``freeze_subtree`` masks Adam off every param whose tree path
    contains the substring (e.g. ``"alignment_net"`` under the
    frozen-flow protocol): frozen params' gradients are already zero via
    stop_gradient, but UNMASKED Adam still carries two full f32 moment
    arrays per frozen param — ~75 MB of zeros in every checkpoint
    save/fetch for the 9.4M-param aligner. WARNING: masking changes the
    opt_state STRUCTURE, so checkpoints written with and without it do
    not cross-restore — only enable for fresh runs
    (``--set masked_adam=True``)."""
    adam = optax.adam(
        step_lr_schedule(base_lr, step_size_epochs, gamma, steps_per_epoch))
    if freeze_subtree is not None:
        # multi_transform (not optax.masked: masked PASSES THROUGH the
        # raw gradient as the update for masked-out leaves — only safe
        # under stop_gradient; set_to_zero is robust regardless)
        def labels(params):
            return jax.tree_util.tree_map_with_path(
                lambda path, _: "freeze" if freeze_subtree in
                jax.tree_util.keystr(path) else "train", params)
        adam = optax.multi_transform(
            {"train": adam, "freeze": optax.set_to_zero()}, labels)
    if clip_norm is None:
        return adam
    return optax.chain(optax.clip_by_global_norm(clip_norm), adam)


def default_masked_adam(workspace_dir: str, net_name: str, frozen: bool,
                        explicit: Optional[bool] = None) -> bool:
    """Resolve whether Adam is masked off the frozen aligner for this
    run. An explicit ``--set masked_adam=...`` always wins. Fresh runs
    (no checkpoint in the workspace) default to MASKED when the aligner
    is frozen — the moments are provably zero and cost ~75 MB per
    checkpoint save/fetch otherwise. Resumes must rebuild the optimizer
    with the STRUCTURE the checkpoint was written with (masked and
    unmasked opt_states do not cross-restore): the recorded
    ``settings["masked_adam"]`` header flag decides, with a serialized
    opt_state sniff (`checkpoint.opt_state_is_masked`) for legacy
    checkpoints that predate the flag."""
    if explicit is not None:
        return bool(explicit)
    from dbsr_tpu.training import checkpoint as ckpt

    path = ckpt.resolve_checkpoint(workspace_dir, net_name)
    if not frozen:
        # masked opt_states do not cross-restore into plain Adam: fail
        # HERE with the actual constraint instead of letting flax
        # from_bytes raise an opaque structure mismatch later
        if path is not None:
            recorded = ckpt.read_header(path).get("settings",
                                                  {}).get("masked_adam")
            was_masked = recorded if recorded is not None \
                else ckpt.opt_state_is_masked(path)
            if was_masked:
                raise ValueError(
                    f"{path} was written with a MASKED (frozen-aligner) "
                    "optimizer, but this run asks for a trainable "
                    "aligner (train_alignment=True): masked and unmasked "
                    "opt_states cannot cross-restore. Either keep the "
                    "aligner frozen, or start a fresh workspace for the "
                    "end-to-end run.")
        return False
    if path is None:
        return True
    recorded = ckpt.read_header(path).get("settings", {}).get("masked_adam")
    if recorded is not None:
        return bool(recorded)
    return ckpt.opt_state_is_masked(path)

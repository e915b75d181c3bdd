"""Convenience network loading (reference ``utils/loading.py:6-18``).

Thin wrappers over ``dbsr_tpu.training.checkpoint``: resolve a checkpoint
by workspace path / project / epoch and rebuild (net, params) from the
embedded network spec.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

from dbsr_tpu.environment import env_settings
from dbsr_tpu.training.checkpoint import load_network, resolve_checkpoint


def load_trained_network(module: str, name: str, net_name: str = None,
                         epoch: Optional[int] = None,
                         workspace_dir: Optional[str] = None) -> Tuple:
    """Load e.g. ``load_trained_network('dbsr', 'default_synthetic')``.

    Returns (net, params, header). ``net_name`` defaults to
    ``dbsr_<name-prefix>`` conventions used by the shipped configs.
    """
    ws = workspace_dir or env_settings().workspace_dir
    d = os.path.join(ws, module, name)
    if net_name is None:
        # shipped configs use dbsr_synthetic / dbsr_realworld / smoke
        for cand in ("dbsr_synthetic", "dbsr_realworld", "smoke", "dbsr"):
            if resolve_checkpoint(d, cand) is not None:
                net_name = cand
                break
        else:
            raise FileNotFoundError(f"no checkpoints under {d}")
    path = resolve_checkpoint(d, net_name, epoch)
    if path is None:
        raise FileNotFoundError(f"no checkpoint for {net_name} under {d}")
    return load_network(path)

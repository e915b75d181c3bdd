"""Machine-local environment settings (datasets, workspace, pretrained nets).

Re-design of reference ``admin/environment.py:6-51`` + ``admin/settings.py``:
instead of generating an ``admin/local.py`` module, paths live in a JSON
file (``DBSR_TPU_ENV`` env var, default ``~/.dbsr_tpu/env.json``) that is
auto-created with empty defaults on first use; individual entries can be
overridden by ``DBSR_TPU_<KEY>`` environment variables.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional

_ENV_KEYS = (
    "workspace_dir",          # checkpoints + logs
    "tensorboard_dir",
    "pretrained_nets_dir",
    "zurichraw2rgb_dir",
    "burstsr_dir",
    "synburstval_dir",
)


@dataclasses.dataclass
class EnvSettings:
    workspace_dir: str = ""
    tensorboard_dir: str = ""
    pretrained_nets_dir: str = ""
    zurichraw2rgb_dir: str = ""
    burstsr_dir: str = ""
    synburstval_dir: str = ""

    def save_dir(self) -> str:
        return self.workspace_dir


def _env_file() -> str:
    return os.environ.get(
        "DBSR_TPU_ENV", os.path.expanduser("~/.dbsr_tpu/env.json"))


def env_settings() -> EnvSettings:
    """Load env settings, creating a template file on first use (the
    reference raises until ``admin/local.py`` is edited; we default to a
    workspace under the env file's directory so zero-config runs work)."""
    path = _env_file()
    data = {}
    if os.path.exists(path):
        with open(path) as f:
            data = json.load(f)
    else:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        data = {k: "" for k in _ENV_KEYS}
        with open(path, "w") as f:
            json.dump(data, f, indent=2)

    for k in _ENV_KEYS:
        ov = os.environ.get(f"DBSR_TPU_{k.upper()}")
        if ov:
            data[k] = ov

    if not data.get("workspace_dir"):
        data["workspace_dir"] = os.path.join(os.path.dirname(path),
                                             "workspace")
    if not data.get("tensorboard_dir"):
        data["tensorboard_dir"] = os.path.join(data["workspace_dir"],
                                               "tensorboard")
    return EnvSettings(**{k: data.get(k, "") for k in _ENV_KEYS})


class Settings:
    """Open settings container (reference ``admin/settings.py:4-12``):
    holds ``env`` plus whatever the experiment config sets."""

    def __init__(self):
        self.env = env_settings()
        self.use_gpu = True  # kept for API parity; device policy is JAX's

    def __repr__(self):
        return f"Settings({self.__dict__})"

"""TensorBoard logging (re-design of reference ``admin/tensorboard.py``).

One SummaryWriter per loader name; epoch-level scalar writes + a one-time
run-info text record. Gated on torch tensorboard availability so headless
environments degrade to no-op.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

try:
    from torch.utils.tensorboard import SummaryWriter
    _HAVE_TB = True
except Exception:  # pragma: no cover
    SummaryWriter = None
    _HAVE_TB = False


class TensorboardWriter:
    def __init__(self, directory: str, loader_names):
        self.directory = directory
        self.writers = {}
        if _HAVE_TB:
            for name in loader_names:
                self.writers[name] = SummaryWriter(
                    os.path.join(directory, name))
        self._info_written = False

    def write_info(self, script_name: str, description: str):
        if not self.writers or self._info_written:
            return
        w = next(iter(self.writers.values()))
        w.add_text("script_name", script_name)
        w.add_text("description", description)
        self._info_written = True

    def write_epoch(self, loader_name: str,
                    scalars: Dict[str, float], epoch: int):
        w = self.writers.get(loader_name)
        if w is None:
            return
        for k, v in scalars.items():
            w.add_scalar(k, v, epoch)
        w.flush()

    def close(self):
        for w in self.writers.values():
            w.close()

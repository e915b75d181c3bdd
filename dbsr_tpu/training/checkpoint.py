"""Checkpoint save/restore with architecture reconstruction.

Re-design of the reference checkpoint subsystem
(`trainers/base_trainer.py:92-201`, `admin/model_constructor.py:5-45`,
`admin/loading.py:10-101`):

  * one file per epoch: ``<net_name>_ep{epoch:04d}.ckpt`` — a msgpack blob
    (flax.serialization) of {params, opt_state, step} plus a JSON header
    with epoch, stats, settings, and a **network spec** (module path, class
    name, constructor kwargs) so the architecture can be rebuilt from the
    checkpoint alone (the reference's ``NetConstructor`` capability);
  * atomic write via tmp-file + rename;
  * resolution semantics: latest (glob highest epoch) / by-epoch /
    absolute path — matching ``admin/loading.py:24-93``.

No orbax dependency: flax.serialization keeps the format simple, portable
and dependency-light (checkpoints are host-RAM-sized for this model class).
"""

from __future__ import annotations

import dataclasses
import glob
import json
import os
import re
import struct as _struct
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization

_MAGIC = b"DBSRTPU1"


def network_spec(net) -> Dict[str, Any]:
    """Serializable spec of a flax module: import path + dataclass kwargs
    (the equivalent of the reference's ``net.constructor`` record,
    ``admin/model_constructor.py:24-37``)."""
    kwargs = {}
    for f in dataclasses.fields(net):
        if f.name in ("parent", "name"):
            continue
        v = getattr(net, f.name)
        if v is not None and not isinstance(
                v, (bool, int, float, str, list, tuple, dict)):
            # dtype-like fields (jnp.bfloat16 etc.) -> tagged string
            v = {"__dtype__": np.dtype(v).name}
        kwargs[f.name] = v
    return {
        "module": type(net).__module__,
        "cls": type(net).__name__,
        "kwargs": kwargs,
    }


def build_network(spec: Dict[str, Any]):
    """Rebuild a flax module from a ``network_spec`` record
    (the equivalent of ``NetConstructor.get``,
    ``admin/model_constructor.py:39-45``). ``kwargs`` may be overridden by
    the caller merging into ``spec['kwargs']`` first."""
    import importlib

    import jax.numpy as jnp

    mod = importlib.import_module(spec["module"])
    cls = getattr(mod, spec["cls"])
    kwargs = {}
    for k, v in spec["kwargs"].items():
        if isinstance(v, dict) and "__dtype__" in v:
            v = jnp.dtype(v["__dtype__"])
        kwargs[k] = v
    return cls(**kwargs)


def save_checkpoint(directory: str, net_name: str, epoch: int, state,
                    net=None, stats: Optional[dict] = None,
                    settings: Optional[dict] = None) -> str:
    """Atomically write ``<dir>/<net_name>_ep{epoch:04d}.ckpt``."""
    os.makedirs(directory, exist_ok=True)
    header = {
        "epoch": int(epoch),
        "net_name": net_name,
        "stats": stats or {},
        "settings": settings or {},
    }
    if net is not None:
        header["net_spec"] = network_spec(net)
    header_bytes = json.dumps(header).encode()
    blob = serialization.to_bytes(state)

    path = os.path.join(directory, f"{net_name}_ep{epoch:04d}.ckpt")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(_MAGIC)
        f.write(_struct.pack("<Q", len(header_bytes)))
        f.write(header_bytes)
        f.write(blob)
    os.rename(tmp, path)
    return path


class AsyncCheckpointWriter:
    """Background checkpoint writer: the epoch loop hands a save thunk
    off and keeps training while the device->host state fetch and the
    disk write proceed on this thread (~20-30 s of the steady-state
    epoch wall time over a relayed runtime is synchronous checkpoint
    overhead otherwise).

    Safety relies on two properties of the surrounding system: JAX
    arrays are immutable and the train step does not donate its state
    buffers, so a late fetch reads exactly the epoch-end values; and
    every checkpoint CONSUMER in the trainer (resume, divergence
    rollback) calls :meth:`flush` before resolving files, so readers
    never observe a half-landed epoch. Write errors surface at the next
    submit/flush (the epoch loop's fail-safe handles them like any
    other crash). Depth-1 queue: at most one save queued behind the one
    being written, bounding host RAM to ~2 serialized states.
    """

    def __init__(self):
        import queue as _queue
        import threading
        self._q: "_queue.Queue" = _queue.Queue(maxsize=1)
        self._err: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="ckpt-writer")
        self._thread.start()

    def _run(self):
        while True:
            fn = self._q.get()
            if fn is None:
                self._q.task_done()
                return
            try:
                fn()
            except BaseException as e:  # surfaced on the train thread
                self._err = e
            finally:
                self._q.task_done()

    def _raise_if_failed(self):
        if self._err is not None:
            err, self._err = self._err, None
            raise RuntimeError("async checkpoint write failed") from err

    def submit(self, fn) -> None:
        self._raise_if_failed()
        self._q.put(fn)

    def flush(self, raise_on_error: bool = True) -> None:
        """Block until every submitted save is on disk (or raised).
        ``raise_on_error=False`` logs a pending write error instead of
        raising — for flushes INSIDE failure handlers (divergence/crash
        rollback), where raising would escape the fail-safe retry
        budget; the rollback then simply resumes from the last
        successfully written epoch."""
        self._q.join()
        if raise_on_error:
            self._raise_if_failed()
        elif self._err is not None:
            err, self._err = self._err, None
            print(f"WARNING: async checkpoint write failed ({err!r}); "
                  "resuming from the last successfully written epoch",
                  flush=True)

    def close(self) -> None:
        self.flush()
        self._q.put(None)
        self._thread.join()


def save_params_artifact(path: str, src_header: dict, state) -> str:
    """Write a PARAMS-ONLY checkpoint (same container format, header
    flagged ``params_only``) — graft/eval material small enough to keep
    in git so it survives workspace wipes. Trainers refuse to resume
    from it (no optimizer state)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    header = {k: src_header[k] for k in
              ("epoch", "net_name", "stats", "settings", "net_spec")
              if k in src_header}
    header["params_only"] = True
    header_bytes = json.dumps(header).encode()
    blob = serialization.msgpack_serialize(
        serialization.to_state_dict(state))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(_MAGIC)
        f.write(_struct.pack("<Q", len(header_bytes)))
        f.write(header_bytes)
        f.write(blob)
    os.rename(tmp, path)
    return path


def read_header(path: str) -> dict:
    """Header only — no blob read/decode (cheap structure/metadata
    sniffs on multi-hundred-MB checkpoints)."""
    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError(f"{path}: not a dbsr_tpu checkpoint")
        (hlen,) = _struct.unpack("<Q", f.read(8))
        return json.loads(f.read(hlen).decode())


def opt_state_is_masked(path: str) -> bool:
    """Whether ``path``'s serialized opt_state was written by a
    masked (``optax.multi_transform``) optimizer — its state pytree
    carries an ``inner_states`` mapping that plain Adam's tuple-of-
    ScaleByAdamState does not. Legacy fallback for checkpoints that
    predate the ``settings["masked_adam"]`` header flag; costs one full
    blob restore."""
    _, blob = _read(path)
    raw = serialization.msgpack_restore(blob)
    opt = raw.get("opt_state", {}) if isinstance(raw, dict) else {}
    stack = [opt]
    while stack:
        node = stack.pop()
        if isinstance(node, dict):
            if "inner_states" in node:
                return True
            stack.extend(node.values())
    return False


def _read(path: str) -> Tuple[dict, bytes]:
    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError(f"{path}: not a dbsr_tpu checkpoint")
        (hlen,) = _struct.unpack("<Q", f.read(8))
        header = json.loads(f.read(hlen).decode())
        blob = f.read()
    return header, blob


def list_checkpoints(directory: str, net_name: str):
    """Sorted (epoch, path) pairs for ``net_name`` in ``directory``."""
    pat = os.path.join(directory, f"{net_name}_ep*.ckpt")
    out = []
    for p in glob.glob(pat):
        m = re.search(r"_ep(\d+)\.ckpt$", p)
        if m:
            out.append((int(m.group(1)), p))
    return sorted(out)


def resolve_checkpoint(directory: str, net_name: str,
                       epoch: Optional[int] = None) -> Optional[str]:
    """latest (epoch=None) / by-epoch / None if absent — reference
    ``base_trainer.py:141-160`` semantics."""
    ckpts = list_checkpoints(directory, net_name)
    if not ckpts:
        return None
    if epoch is None:
        return ckpts[-1][1]
    for e, p in ckpts:
        if e == epoch:
            return p
    raise FileNotFoundError(
        f"no checkpoint for epoch {epoch} of {net_name} in {directory}")


def load_checkpoint(path: str, state_template=None):
    """Load (header, state). With a ``state_template`` pytree the blob is
    deserialized into it; otherwise the raw msgpack dict is returned
    (useful with ``build_network`` to reconstruct params without source
    config — the reference's ``load_network`` path)."""
    header, blob = _read(path)
    if state_template is not None:
        if header.get("params_only"):
            raise ValueError(
                f"{path} is a params-only artifact (graft/eval material, "
                "no optimizer state) — cannot restore a train state from "
                "it; load without a template and use the params subtree")
        state = serialization.from_bytes(state_template, blob)
    else:
        state = serialization.msgpack_restore(blob)
    return header, state


def load_network(path: str, **kwarg_overrides):
    """Rebuild (net, params) from a checkpoint alone (reference
    ``admin/loading.py:24-93`` + ``NetConstructor.get``)."""
    header, raw = load_checkpoint(path)
    if "net_spec" not in header:
        raise ValueError(f"{path} has no net_spec; cannot rebuild network")
    spec = dict(header["net_spec"])
    spec["kwargs"] = {**spec["kwargs"], **kwarg_overrides}
    # JSON round-trips tuples to lists; normalize common fields
    for k, v in spec["kwargs"].items():
        if isinstance(v, list):
            spec["kwargs"][k] = tuple(v)
    net = build_network(spec)
    params = raw["params"] if "params" in raw else raw
    return net, params, header

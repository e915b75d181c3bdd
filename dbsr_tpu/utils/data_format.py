"""Array format helpers (reference ``utils/data_format_utils.py:20-66``).

The reference's cross-layer ``TensorDict`` (method-broadcasting dict,
``admin/tensordict.py``) has no equivalent here by design: JAX pytrees are
the native batch currency (``jax.tree_util`` replaces method broadcasting),
so samples/batches are plain dicts throughout.
"""

from __future__ import annotations

from typing import Dict, List

import jax.numpy as jnp
import numpy as np


def numpy_to_jax(a: np.ndarray) -> jnp.ndarray:
    return jnp.asarray(a)


def jax_to_numpy(a) -> np.ndarray:
    return np.asarray(a)


def chw_to_hwc(a):
    """Convert torch-layout arrays for interop (leading batch dims kept)."""
    return jnp.moveaxis(jnp.asarray(a), -3, -1)


def hwc_to_chw(a):
    return jnp.moveaxis(jnp.asarray(a), -1, -3)


def rggb_to_rgb(packed):
    """Packed RGGB -> pseudo-RGB channel select (R, G1, B), matching the
    reference's convention of using channels [0, 1, 3]."""
    return packed[..., jnp.array([0, 1, 3])]


def split_batch(batch: Dict, axis: int = 0) -> List[Dict]:
    """Split a dict-of-batched-arrays into per-sample dicts (reference
    ``utils/data_format_utils.py`` dict splitter)."""
    import jax

    n = jax.tree_util.tree_leaves(batch)[0].shape[axis]
    return [jax.tree.map(lambda x: jnp.take(x, i, axis=axis), batch)
            for i in range(n)]

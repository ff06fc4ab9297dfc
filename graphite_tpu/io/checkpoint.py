"""Parameter checkpointing.

The reference has no disk checkpointing (its backup/restore is the
device-side trust-region mechanism, graph.hpp:302-318). With functional
parameter pytrees it is trivial to provide: save/load the params dict (and
optionally optimizer state) as .npz, so long optimizations can resume.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np


def save(path: str, params: Dict[str, jnp.ndarray], **extra) -> None:
    arrays = {f"param:{k}": np.asarray(v) for k, v in params.items()}
    for k, v in extra.items():
        arrays[f"extra:{k}"] = np.asarray(v)
    np.savez_compressed(path, **arrays)


def load(path: str, dtype=None):
    """Returns (params dict, extras dict)."""
    with np.load(path) as data:
        params = {}
        extra = {}
        for k in data.files:
            kind, name = k.split(":", 1)
            arr = data[k]
            if kind == "param":
                params[name] = jnp.asarray(
                    arr if dtype is None else arr.astype(dtype)
                )
            else:
                extra[name] = arr
    return params, extra

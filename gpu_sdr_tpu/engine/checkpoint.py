"""Carry-state checkpointing: resume a streaming demodulation mid-stream.

The reference has no in-stream checkpointing — the H5 file is the
checkpoint and carried DSP state (phase indices, FIR tails, PFB spares) is
lost on stop (SURVEY.md section 5).  Here the demodulator state is an
explicit pytree, so it serializes losslessly: a replay can stop after block
k and resume at block k+1 bit-identically.

Format: npz with flattened pytree leaves + a json treedef descriptor.
"""

from __future__ import annotations

import json
from typing import Any

import jax
import numpy as np


def save_state(state: Any, path: str, block_index: int = 0) -> None:
    """Serialize a demodulator carry-state pytree to `path` (.npz)."""
    leaves, treedef = jax.tree.flatten(state)
    arrays = {f"leaf_{i}": np.asarray(v) for i, v in enumerate(leaves)}
    arrays["__meta__"] = np.frombuffer(
        json.dumps({"n_leaves": len(leaves),
                    "block_index": int(block_index),
                    "treedef": str(treedef)}).encode(), dtype=np.uint8)
    np.savez(path, **arrays)


def load_state(path: str, like: Any):
    """Restore a carry-state pytree saved by :func:`save_state`.

    `like` is a template state (from demod.init_state()) providing the
    treedef; returns (state, block_index).
    """
    if not path.endswith(".npz"):
        path = path + ".npz"
    data = np.load(path)
    meta = json.loads(bytes(data["__meta__"]).decode())
    leaves_t, treedef = jax.tree.flatten(like)
    n = meta["n_leaves"]
    if n != len(leaves_t):
        raise ValueError(
            f"checkpoint has {n} leaves, expected {len(leaves_t)} — "
            "was it saved for a different measurement configuration?")
    leaves = []
    for i, tmpl in enumerate(leaves_t):
        arr = data[f"leaf_{i}"]
        tmpl_arr = np.asarray(tmpl)
        if arr.shape != tmpl_arr.shape or arr.dtype != tmpl_arr.dtype:
            raise ValueError(
                f"checkpoint leaf {i} mismatch: {arr.shape}/{arr.dtype} vs "
                f"{tmpl_arr.shape}/{tmpl_arr.dtype}")
        leaves.append(arr)
    return treedef.unflatten(leaves), meta["block_index"]

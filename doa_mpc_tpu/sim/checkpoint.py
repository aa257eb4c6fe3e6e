"""Checkpoint / resume for long Monte-Carlo sweeps.

The reference has no checkpointing (SURVEY.md section 5); its only
persistence is the final CSV per experiment (``experiments.py:38-43``) — a
crashed 100-seed run restarts from zero. Here any closed-loop pytree
(:class:`~doa_mpc_tpu.sim.closed_loop.LoopState`, batched or not) can be
snapshotted mid-rollout and resumed: the carried scan state IS the full
solver state (warm starts included), so resuming is exact.

Format: a single ``.npz`` with flattened pytree leaves plus a treedef
fingerprint; no framework dependencies, works across hosts.
"""

from __future__ import annotations

import json
import os

import numpy as np
import jax


_MAGIC = "doa_mpc_tpu/ckpt/v1"


def _leaf_key(i: int) -> str:
    return f"leaf_{i:04d}"


def save_state(path: str, state, meta: dict | None = None) -> None:
    """Snapshot a pytree of arrays (device -> host) atomically."""
    leaves, treedef = jax.tree.flatten(state)
    payload = {_leaf_key(i): np.asarray(l) for i, l in enumerate(leaves)}
    header = {
        "magic": _MAGIC,
        "n_leaves": len(leaves),
        "treedef": str(treedef),
        "meta": meta or {},
    }
    payload["header"] = np.frombuffer(
        json.dumps(header).encode(), dtype=np.uint8)
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(tmp, "wb") as f:
        np.savez(f, **payload)
    os.replace(tmp, path)


def load_state(path: str, like):
    """Restore a snapshot into the structure of ``like`` (same treedef).

    Returns (state, meta). Shapes and dtypes are validated against ``like``
    so a config change cannot silently resume from an incompatible snapshot.
    """
    with np.load(path) as data:
        header = json.loads(bytes(data["header"]).decode())
        if header.get("magic") != _MAGIC:
            raise ValueError(f"{path} is not a doa_mpc_tpu checkpoint")
        leaves_like, treedef = jax.tree.flatten(like)
        if header["n_leaves"] != len(leaves_like):
            raise ValueError(
                f"checkpoint has {header['n_leaves']} leaves, expected "
                f"{len(leaves_like)} — config mismatch?")
        leaves = []
        for i, ref in enumerate(leaves_like):
            arr = data[_leaf_key(i)]
            if tuple(arr.shape) != tuple(ref.shape):
                raise ValueError(
                    f"leaf {i}: checkpoint shape {arr.shape} != "
                    f"expected {ref.shape}")
            leaves.append(arr.astype(ref.dtype))
        state = jax.tree.unflatten(treedef, leaves)
        return state, header.get("meta", {})


def rollout_with_checkpoints(rollout_chunk, state, n_chunks: int,
                             path: str, meta: dict | None = None,
                             resume: bool = True):
    """Run ``rollout_chunk`` (state -> state) ``n_chunks`` times, saving a
    snapshot after each chunk; resumes from ``path`` if present.

    The chunked structure trades scan length for checkpoint granularity —
    e.g. 400 ticks as 8 x 50-tick chunks.
    """
    start_chunk = 0
    if resume and os.path.exists(path):
        state, saved = load_state(path, state)
        start_chunk = int(saved.get("chunk", 0))
    for chunk in range(start_chunk, n_chunks):
        state = rollout_chunk(state)
        save_state(path, state, {**(meta or {}), "chunk": chunk + 1})
    return state

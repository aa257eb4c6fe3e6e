"""Multi-host (multi-process) orchestration.

The reference's only "multi-process" story is ``os.system`` re-exec with the
filesystem as a config bus (``/root/reference/main.py:12-15``,
``run_multiple_experiments.py:21``). Here multi-host execution is ONE SPMD
program (SURVEY.md section 2.3, row "Multi-host orchestration"):

- :func:`initialize` — ``jax.distributed.initialize`` entry, driven by
  explicit arguments or the standard environment variables; idempotent and a
  no-op in single-process runs, so every driver can call it unconditionally.
- :func:`host_shard_bounds` / :func:`make_global_batch` — per-host scenario
  shard construction: each process materializes only its contiguous block of
  the scenario axis and the blocks are assembled into one globally-sharded
  ``jax.Array`` via ``jax.make_array_from_process_local_data``.
- :func:`gather_rows` — all-gather of per-row metric arrays so artifact
  writers can see the full batch (paired with :func:`is_host0` so only
  process 0 writes CSV/JSON, matching the "host-0 metrics/IO" plan).

The compute path is unchanged: the same ``shard_map`` rollout
(``parallel/mesh.py``) runs on a single-process 8-device virtual mesh in
tests and on N processes x M local devices in production — only array
construction differs. ``tests/test_multihost.py`` runs a real 2-process x
4-virtual-device CPU job and checks its global statistics equal the
1-process 8-device run.
"""

from __future__ import annotations

import os

import numpy as np
import jax
from jax.sharding import NamedSharding, PartitionSpec as P


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               local_device_ids=None) -> bool:
    """Join the distributed runtime; returns True if initialization ran.

    Configuration precedence: explicit arguments, then the environment
    (``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID``
    — also read automatically by JAX on supported clusters). With neither,
    this is a single-process run and the call is a no-op. Calling twice is
    harmless (the second call is ignored).
    """
    env = os.environ
    coordinator_address = (coordinator_address
                           or env.get("JAX_COORDINATOR_ADDRESS"))
    if num_processes is None and env.get("JAX_NUM_PROCESSES"):
        num_processes = int(env["JAX_NUM_PROCESSES"])
    if process_id is None and env.get("JAX_PROCESS_ID"):
        process_id = int(env["JAX_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        return False
    if jax._src.distributed.global_state.client is not None:  # already up
        return True
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id,
                               local_device_ids=local_device_ids)
    return True


def is_host0() -> bool:
    """True on the process responsible for artifact IO."""
    return jax.process_index() == 0


def host_shard_bounds(global_n: int) -> tuple[int, int]:
    """[start, stop) of this process's contiguous scenario rows.

    The data mesh orders devices process-major (``jax.devices()`` lists
    process 0's devices first), so a ``P("data")`` sharding maps contiguous
    row blocks to processes in process-index order.
    """
    p, i = jax.process_count(), jax.process_index()
    if global_n % p:
        raise ValueError(f"global batch {global_n} not divisible by "
                         f"{p} processes")
    k = global_n // p
    return i * k, (i + 1) * k


def make_global_batch(local_tree, mesh):
    """Assemble a globally-sharded batch from per-process local rows.

    Every leaf of ``local_tree`` holds ONLY this process's rows (leading
    axis = local scenario count); the result's leaves are global
    ``jax.Array``s sharded ``P("data")`` over ``mesh``. In single-process
    runs this degrades to a plain ``device_put`` sharding.
    """
    sharding = NamedSharding(mesh, P("data"))

    def put(x):
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(x))

    return jax.tree.map(put, local_tree)


def gather_rows(tree):
    """All-gather sharded per-row arrays so every process sees every row
    (CSV writing needs the full batch on host 0)."""
    from jax.experimental import multihost_utils

    def gather(x):
        return np.asarray(
            multihost_utils.process_allgather(x, tiled=True))

    return jax.tree.map(gather, tree)

"""Multi-host initialisation and cross-host pose distribution.

Replaces the reference's Boost.MPI process topology (object_recognizer.cpp
ctor broadcast of model bank/camera + master/slave planning protocol): in
the TPU rebuild every host runs the same program (`jax.distributed`), the
model bank and observed scene are computed identically everywhere (no
broadcast needed — inputs are read from shared storage), and candidate
batches shard over the global device mesh.
"""

from __future__ import annotations

import os


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """`jax.distributed.initialize` with environment fallbacks.

    No-op on single-host (the common case and the only one testable here);
    on a multi-host slice, call before any jax usage, then build the global
    pose mesh with `make_global_pose_mesh`.
    """
    import jax

    if num_processes is None:
        num_processes = int(os.environ.get("PT_NUM_PROCESSES", "1"))
    if num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address
        or os.environ.get("PT_COORDINATOR", "localhost:12345"),
        num_processes=num_processes,
        process_id=process_id
        if process_id is not None
        else int(os.environ.get("PT_PROCESS_ID", "0")))


def make_global_pose_mesh():
    """1-D pose mesh over every device in the slice (all hosts)."""
    import jax
    import numpy as np
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()), axis_names=("pose",))


def local_pose_slice(n_poses: int) -> tuple[int, int]:
    """[start, end) of the candidate range this process should materialise
    when inputs are generated host-locally (equal chunks, like the
    reference's MPI scatter with dummy padding)."""
    import jax

    pcount = jax.process_count()
    pid = jax.process_index()
    per = -(-n_poses // pcount)
    return pid * per, min((pid + 1) * per, n_poses)

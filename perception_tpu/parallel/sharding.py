"""Multi-chip scaling: shard the candidate-pose axis over a device mesh.

TPU-native replacement for the reference's two distribution mechanisms:

  * the CUDA batch loop (`gpu_batch_size` chunks, search_env.cpp:2504-2525)
    becomes a pose-axis sharding annotation — every chip renders/scores its
    slice of the candidate grid in one SPMD program;
  * the Boost.MPI scatter/gather master-slave protocol
    (ComputeCostsInParallel, search_env.cpp:920-1023; object_recognizer.cpp:
    484-511) disappears: model bank and observed scene are replicated,
    per-pose costs are all-gathered over ICI for the global argmin
    (SURVEY §5 "allgather only per-pose scalar costs").

Works identically on a real multi-chip topology and on the virtual
`--xla_force_host_platform_device_count` CPU mesh used in tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from perception_tpu.pipeline.scorer import PoseScores, ScorerConfig, score_pose_batch


def make_pose_mesh(n_devices: int | None = None,
                   devices: list | None = None) -> Mesh:
    """1-D device mesh over the candidate-pose axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=("pose",))


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("cfg", "mesh"))
def _sharded_call(bank_tri_verts, bank_tri_colors, bank_tri_valid,
                  poses, model_ids, pose_labels, observed_total,
                  proj, scene,
                  cfg: ScorerConfig, mesh: Mesh,
                  aux_banks: dict | None = None) -> PoseScores:
    pose_sharded = NamedSharding(mesh, P("pose"))
    replicated = NamedSharding(mesh, P())

    def shard(x):
        return jax.lax.with_sharding_constraint(x, pose_sharded)

    def repl(x):
        return jax.lax.with_sharding_constraint(x, replicated)

    aux = {k: (None if v is None else repl(v))
           for k, v in (aux_banks or {}).items()}
    scores = score_pose_batch(
        repl(bank_tri_verts), repl(bank_tri_colors), repl(bank_tri_valid),
        shard(poses), shard(model_ids), shard(pose_labels),
        shard(observed_total),
        repl(proj), jax.tree_util.tree_map(repl, scene),
        cfg, **aux)
    # Gather the per-pose scalars so the host argmin sees one replicated
    # vector (cheap: N scalars over ICI).
    return PoseScores(*[repl(x) for x in scores])


def score_pose_batch_multichip(
    mesh: Mesh,
    bank_tri_verts, bank_tri_colors, bank_tri_valid,
    poses, model_ids, pose_labels, observed_total,
    proj, scene,
    cfg: ScorerConfig,
    bank_backface=None,
    bank_icp_samples=None,
    bank_icp_normals=None,
    bank_tri_lab=None,
) -> PoseScores:
    """Pose-sharded scoring. Pads the pose axis to a multiple of the mesh
    size (dummy-padding like the reference's MPI chunk padding,
    search_env.cpp:934-947); padded entries come back with cost -1 and are
    sliced off.

    The per-model aux banks (backface-cull flags, explain-only ICP surface
    samples/normals for cost_cloud="transform", Lab triangle colours for
    the fused colour cost) replicate across the mesh like the triangle
    bank; omitting one that the single-device path uses changes the
    scores, so callers should forward whatever they pass to
    score_pose_batch.
    """
    n = poses.shape[0]
    n_dev = mesh.devices.size
    n_pad = pad_to_multiple(max(n, n_dev), n_dev)

    def pad(x):
        if x.shape[0] == n_pad:
            return x
        widths = [(0, n_pad - n)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths)

    aux_banks = {
        "bank_backface": bank_backface,
        "bank_icp_samples": bank_icp_samples,
        "bank_icp_normals": bank_icp_normals,
        "bank_tri_lab": bank_tri_lab,
    }
    aux_banks = {k: (None if v is None else jnp.asarray(v))
                 for k, v in aux_banks.items()}
    with mesh:
        scores = _sharded_call(
            bank_tri_verts, bank_tri_colors, bank_tri_valid,
            pad(jnp.asarray(poses)), pad(jnp.asarray(model_ids)),
            pad(jnp.asarray(pose_labels)), pad(jnp.asarray(observed_total)),
            jnp.asarray(proj),
            jax.tree_util.tree_map(jnp.asarray, scene),
            cfg, mesh, aux_banks)
    return PoseScores(*[x[:n] for x in scores])

"""Masked batched 1-nearest-neighbour search.

Replaces the reference's brute-force KNN (fast_gicp `brute_force_knn_search`
with label-partitioned index ranges, called at renderer.cu:1852-1871, and the
in-repo knncuda.cu library). Distances are squared euclidean — the reference
compares squared distances against a squared sensor resolution
(renderer.cu:1876-1877).

Per pose the query cloud is [P, 3] and the reference cloud is that pose's
observed label segment [S, 3]; the whole batch reduces to tiled
|q|^2 + |r|^2 - 2 q.r with running min over reference tiles, keeping live
intermediates at [chunk, P, tile].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("ref_tile",))
def nn1_batch(
    query_xyz: jax.Array,    # [N, P, 3]
    query_valid: jax.Array,  # [N, P] bool
    ref_xyz: jax.Array,      # [N, S, 3]
    ref_valid: jax.Array,    # [N, S] bool
    ref_tile: int = 512,
) -> tuple[jax.Array, jax.Array]:
    """1-NN of each query point in its pose's reference set.

    Returns (dist_sq [N, P] float32, idx [N, P] int32). Invalid reference
    points never match (distance inf); queries with no valid reference get
    dist inf / idx 0. Query validity does not change the result values
    (callers mask downstream), keeping the kernel branch-free.
    """
    del query_valid
    n, p, _ = query_xyz.shape
    s = ref_xyz.shape[1]
    if s % ref_tile != 0:
        pad = ref_tile - s % ref_tile
        ref_xyz = jnp.pad(ref_xyz, ((0, 0), (0, pad), (0, 0)))
        ref_valid = jnp.pad(ref_valid, ((0, 0), (0, pad)))
        s += pad
    num_tiles = s // ref_tile

    ref_t = ref_xyz.reshape(n, num_tiles, ref_tile, 3).transpose(1, 0, 2, 3)
    refv_t = ref_valid.reshape(n, num_tiles, ref_tile).transpose(1, 0, 2)
    q_sq = (query_xyz**2).sum(-1)  # [N, P]

    def body(carry, inputs):
        best_d, best_i = carry
        tile_idx, r, rv = inputs
        # |q|^2 + |r|^2 - 2 q.r with the cross term on the MXU at HIGHEST
        # precision (f32-accurate multi-pass; default bf16 would be unusable
        # against (sensor_resolution)^2 ~ 1e-4 thresholds — measured cross-
        # term error ~7e-7 at HIGHEST vs ~1e-2 at default on v5e).
        r_sq = (r**2).sum(-1)  # [N, T]
        cross = jax.lax.dot_general(
            query_xyz, r, (((2,), (2,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGHEST)
        d = q_sq[:, :, None] + r_sq[:, None, :] - 2.0 * cross
        d = jnp.maximum(d, 0.0)
        d = jnp.where(rv[:, None, :], d, jnp.inf)
        tmin = d.min(axis=2)
        targ = d.argmin(axis=2).astype(jnp.int32) + tile_idx * ref_tile
        take = tmin < best_d
        return (jnp.where(take, tmin, best_d),
                jnp.where(take, targ, best_i)), None

    init = (jnp.full((n, p), jnp.inf, dtype=jnp.float32),
            jnp.zeros((n, p), dtype=jnp.int32))
    (best_d, best_i), _ = jax.lax.scan(
        body, init, (jnp.arange(num_tiles, dtype=jnp.int32), ref_t, refv_t))
    return best_d, best_i


@functools.partial(jax.jit, static_argnames=("k", "ref_tile"))
def knn_self(
    xyz: jax.Array,    # [N, P, 3]
    valid: jax.Array,  # [N, P]
    k: int,
    ref_tile: int = 512,
) -> tuple[jax.Array, jax.Array]:
    """k-NN of each point within its own cloud (self excluded).

    Used for GICP covariance estimation (fast_gicp covariance_estimation with
    k_correspondences=10; renderer.cu:1697). Returns (dists [N, P, k],
    idx [N, P, k]). Simple full-distance-matrix top-k per pose — P is the
    (small) ICP-downsampled cloud capacity.
    """
    n, p, _ = xyz.shape
    diff = xyz[:, :, None, :] - xyz[:, None, :, :]
    d = (diff * diff).sum(-1)
    eye = jnp.eye(p, dtype=bool)
    d = jnp.where(valid[:, None, :] & ~eye[None], d, jnp.inf)
    neg_d, idx = jax.lax.top_k(-d, k)
    return -neg_d, idx.astype(jnp.int32)

"""Fused 1-NN + cost-count Pallas kernel.

For the depth-only cost types (0 / 2 — the flagship 6-DoF path), the cost
stage needs only three per-pose scalars: rendered point count, unexplained
count, and the number of *distinct* observed points explained
(compute_costs.cuh:161-290). The composed path materialises [N, P]
distances + indices in HBM and scatters an [N, S] explained matrix; here
everything reduces in VMEM in two passes over the target tiles:

  pass 1: running min distance per rendered point;
  pass 2: one-hot winner recovery (first tile, first sublane — matching the
          deterministic argmin of ops/pallas_knn) -> per-observed-row "was
          explained" max -> scalar count.

RGBD colour cost (type 1) stays on the composed path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R_TILE = 256


def _cost_kernel(cloud_ref, cadd_ref, tgt_ref, tadd_ref, out_ref, *,
                 p, s, r_tile, max_dist_sq):
    cx = cloud_ref[0, 0:1, :]
    cy = cloud_ref[0, 1:2, :]
    cz = cloud_ref[0, 2:3, :]
    cadd = cadd_ref[0, :, :]                       # [1, P]; inf = invalid
    n_tiles = s // r_tile

    def dist_tile(ri):
        tx = tgt_ref[0, pl.ds(ri * r_tile, r_tile), 0:1]
        ty = tgt_ref[0, pl.ds(ri * r_tile, r_tile), 1:2]
        tz = tgt_ref[0, pl.ds(ri * r_tile, r_tile), 2:3]
        tadd = tadd_ref[0, pl.ds(ri * r_tile, r_tile), :]
        dx = tx - cx
        dy = ty - cy
        dz = tz - cz
        return dx * dx + dy * dy + dz * dz + tadd  # [Rt, P]

    def pass1(ri, dmin):
        return jnp.minimum(dmin, dist_tile(ri).min(axis=0, keepdims=True))

    dmin = jax.lax.fori_loop(
        0, n_tiles, pass1, jnp.full((1, p), jnp.inf, dtype=jnp.float32))

    valid = cadd == 0.0                             # [1, P]
    close = (dmin <= max_dist_sq) & valid
    point_num = valid.astype(jnp.float32).sum()
    unexplained = (valid & (dmin > max_dist_sq)).astype(jnp.float32).sum()

    iota = jax.lax.broadcasted_iota(jnp.int32, (r_tile, p), 0)

    def pass2(ri, carry):
        explained_count, claimed = carry            # claimed: f32 0/1 [1, P]
        d = dist_tile(ri)
        is_min = (d <= dmin) & (claimed == 0.0)     # [Rt, P]
        first = jnp.where(is_min, iota, jnp.int32(r_tile)).min(
            axis=0, keepdims=True)
        onehot = is_min & (iota <= first) & close
        explained_rows = onehot.astype(jnp.float32).max(
            axis=1, keepdims=True)                  # [Rt, 1]
        explained_count = explained_count + explained_rows.sum()
        claimed = jnp.maximum(
            claimed, is_min.astype(jnp.float32).max(axis=0, keepdims=True))
        return explained_count, claimed

    explained, _ = jax.lax.fori_loop(
        0, n_tiles, pass2,
        (jnp.float32(0.0), jnp.zeros((1, p), dtype=jnp.float32)))

    rows = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    out = jnp.zeros((8, 128), jnp.float32)
    out = jnp.where((rows == 0) & (cols == 0), point_num, out)
    out = jnp.where((rows == 0) & (cols == 1), unexplained, out)
    out = jnp.where((rows == 0) & (cols == 2), explained, out)
    out_ref[0, :, :] = out


@functools.partial(jax.jit, static_argnames=("sensor_resolution", "interpret"))
def nn_cost_fused_pallas(
    cloud_xyz: jax.Array,   # [N, P, 3]
    cloud_valid: jax.Array, # [N, P]
    tgt_xyz: jax.Array,     # [N, S, 3]
    tgt_valid: jax.Array,   # [N, S]
    sensor_resolution: float,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """(point_num [N], unexplained [N], observed_explained [N]) float32."""
    n, p, _ = cloud_xyz.shape
    s = tgt_xyz.shape[1]
    p_pad = ((p + 127) // 128) * 128
    r_tile = min(R_TILE, s)
    s_pad = ((s + r_tile - 1) // r_tile) * r_tile

    cloud_t = jnp.transpose(cloud_xyz, (0, 2, 1))
    cadd = jnp.where(cloud_valid, 0.0, jnp.inf).astype(jnp.float32)[:, None, :]
    if p_pad != p:
        cloud_t = jnp.pad(cloud_t, ((0, 0), (0, 0), (0, p_pad - p)))
        cadd = jnp.pad(cadd, ((0, 0), (0, 0), (0, p_pad - p)),
                       constant_values=jnp.inf)
    tgt4 = jnp.pad(tgt_xyz, ((0, 0), (0, s_pad - s), (0, 1)))
    tadd = jnp.pad(
        jnp.where(tgt_valid, 0.0, jnp.inf).astype(jnp.float32)[..., None],
        ((0, 0), (0, s_pad - s), (0, 0)), constant_values=jnp.inf)

    kernel = functools.partial(
        _cost_kernel, p=p_pad, s=s_pad, r_tile=r_tile,
        max_dist_sq=sensor_resolution * sensor_resolution)
    out = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, 3, p_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 8, 128), jnp.float32),
        interpret=interpret,
    )(cloud_t, cadd, tgt4, tadd)
    return out[:, 0, 0], out[:, 0, 1], out[:, 0, 2]

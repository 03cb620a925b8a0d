"""Pallas TPU kernel for masked batched 1-NN.

The XLA scan in knn.py materialises [N, P, tile] distance blocks in HBM
(~50 ms for 512x1024x4096 on v5e — bandwidth-bound). Here distances never
leave VMEM: per pose, loop (query-tile x reference-tile), compute the
difference-form squared distance on the VPU (exact f32 — no |q|^2+|r|^2-2qr
cancellation, no MXU precision concerns at K=3), and keep running
(min-distance, argmin-index) carries.

Layout: queries on lanes, references on sublanes —
  * q stored [N, 3, P]: coordinate rows slice as [1, Ptile] lane vectors;
  * r stored [N, S, 3]: coordinate columns slice as [Stile, 1] sublane
    vectors; invalid references carry +inf in a [N, S, 1] additive mask;
  * d tile [Stile, Ptile] reduces over sublanes straight to the [1, Ptile]
    output row.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Q_TILE = 512
R_TILE = 256
_BIG_I = np.int32(2**31 - 1)


def _knn_kernel(q_ref, r_ref, radd_ref, dist_ref, idx_ref, *,
                n_q_tiles, n_r_tiles, q_tile, r_tile):
    """q_ref [1, 3, P]; r_ref [1, S, 3]; radd_ref [1, S, 1];
    dist_ref [1, n_q_tiles, q_tile]; idx_ref [1, n_q_tiles, q_tile]."""

    def q_body(qi, _):
        qx = q_ref[0, 0:1, pl.ds(qi * q_tile, q_tile)]  # [1, Qt]
        qy = q_ref[0, 1:2, pl.ds(qi * q_tile, q_tile)]
        qz = q_ref[0, 2:3, pl.ds(qi * q_tile, q_tile)]

        def r_body(ri, carry):
            best_d, best_i = carry
            rs = r_ref[0, pl.ds(ri * r_tile, r_tile), :]      # [Rt, 3]
            radd = radd_ref[0, pl.ds(ri * r_tile, r_tile), :]  # [Rt, 1]
            dx = qx - rs[:, 0:1]
            dy = qy - rs[:, 1:2]
            dz = qz - rs[:, 2:3]
            d = dx * dx + dy * dy + dz * dz + radd            # [Rt, Qt]
            tile_min = d.min(axis=0, keepdims=True)            # [1, Qt]
            ids = (ri * r_tile + jax.lax.broadcasted_iota(
                jnp.int32, (r_tile, q_tile), 0))
            tile_arg = jnp.where(d <= tile_min, ids, _BIG_I).min(
                axis=0, keepdims=True)
            take = tile_min < best_d
            return (jnp.where(take, tile_min, best_d),
                    jnp.where(take, tile_arg, best_i))

        init = (jnp.full((1, q_tile), jnp.inf, dtype=jnp.float32),
                jnp.zeros((1, q_tile), dtype=jnp.int32))
        best_d, best_i = jax.lax.fori_loop(0, n_r_tiles, r_body, init)
        dist_ref[0, qi, :] = best_d[0, :]
        idx_ref[0, qi, :] = best_i[0, :]
        return 0

    jax.lax.fori_loop(0, n_q_tiles, q_body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def nn1_batch_pallas(
    query_xyz: jax.Array,    # [N, P, 3]
    query_valid: jax.Array,  # [N, P] (unused; kept for API parity)
    ref_xyz: jax.Array,      # [N, S, 3]
    ref_valid: jax.Array,    # [N, S]
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    del query_valid
    n, p, _ = query_xyz.shape
    s = ref_xyz.shape[1]

    q_tile = min(Q_TILE, max(128, p))
    p_pad = ((p + q_tile - 1) // q_tile) * q_tile
    r_tile = min(R_TILE, s)
    s_pad = ((s + r_tile - 1) // r_tile) * r_tile

    q_t = jnp.transpose(query_xyz, (0, 2, 1))
    if p_pad != p:
        q_t = jnp.pad(q_t, ((0, 0), (0, 0), (0, p_pad - p)))
    r = ref_xyz
    rv = ref_valid
    if s_pad != s:
        r = jnp.pad(r, ((0, 0), (0, s_pad - s), (0, 0)))
        rv = jnp.pad(rv, ((0, 0), (0, s_pad - s)))
    radd = jnp.where(rv, 0.0, jnp.inf).astype(jnp.float32)[..., None]

    n_q_tiles = p_pad // q_tile
    n_r_tiles = s_pad // r_tile

    kernel = functools.partial(
        _knn_kernel, n_q_tiles=n_q_tiles, n_r_tiles=n_r_tiles,
        q_tile=q_tile, r_tile=r_tile)
    dist, idx = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, 3, p_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, 3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, n_q_tiles, q_tile), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_q_tiles, q_tile), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, n_q_tiles, q_tile), jnp.float32),
            jax.ShapeDtypeStruct((n, n_q_tiles, q_tile), jnp.int32),
        ),
        interpret=interpret,
    )(q_t, r, radd)
    dist = dist.reshape(n, p_pad)[:, :p]
    idx = idx.reshape(n, p_pad)[:, :p]
    # Clamp padded-reference hits (possible only when every reference in a
    # pose is invalid -> inf distance, index 0 preference preserved).
    idx = jnp.minimum(idx, s - 1)
    return dist, idx

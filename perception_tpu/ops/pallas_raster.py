"""Pallas TPU kernel for the batched rasteriser's hot loop.

The XLA `lax.scan` formulation in rasterizer.py materialises per-tile
[N*Npix, tile] intermediates in HBM, making rendering bandwidth-bound.
This kernel fuses the affine functional evaluation, coverage test, depth
interpolation and packed (depth, tri-id) min entirely in VMEM: HBM traffic
drops to the per-pose coefficient table in and one packed key per pixel out.

Layout choices (v5e VPU is 8x128):
  * triangles on sublanes, pixels on lanes — coefficient slices broadcast
    as [TT, 1] against pixel rows [1, TILE_PIX];
  * per-triangle data packed as [T, 12] rows:
    (bx, by, bc, gx, gy, gc, ax, ay, ac, wx, wy, wc), with
    alpha_c = -inf encoding culled triangles;
  * pixel coordinates derived in-kernel from the flat pixel index (strided
    sample grid), so the only input is the coefficient table.

Grid: one pose per step; the kernel loops pixel tiles x triangle chunks
with a running packed min per tile (all in VMEM/registers).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from perception_tpu.ops.rasterizer import (
    _INVALID_KEY,
    _MAX_DEPTH,
    MAX_TRIS,
    TRI_ID_BITS,
)

TILE_PIX = 512
TRI_CHUNK = 256


def _raster_kernel(anchor_ref, coef_ref, bbox_ref, out_ref, *, width, height,
                   stride, n_chunks, n_tiles, tri_chunk, roi_w, tile_pix):
    """anchor_ref [N, 2] int32 (SMEM, scalar-prefetched strided ROI origin);
    coef_ref [1, T, 12] f32; bbox_ref [1, n_chunks_pad, 4] f32 per-chunk
    screen bboxes (xmin, xmax, ymin, ymax);
    out_ref [1, n_tiles, tile_pix] int32."""
    pose = pl.program_id(0)
    x0 = anchor_ref[pose, 0]
    y0 = anchor_ref[pose, 1]
    id_mask = jnp.int32(MAX_TRIS - 1)

    def tile_body(j, _):
        flat = j * tile_pix + jax.lax.broadcasted_iota(
            jnp.int32, (1, tile_pix), 1)
        # Written pixel (x_w, y_w) -> screen P = (x_w, H-1-y_w).
        px = ((x0 + flat % roi_w) * stride).astype(jnp.float32)
        py = (height - 1 - (y0 + flat // roi_w) * stride).astype(jnp.float32)
        # Screen-space rect of this pixel tile (tiles span full ROI rows).
        r0 = (j * tile_pix) // roi_w
        r1 = (j * tile_pix + tile_pix - 1) // roi_w
        tx_min = (x0 * stride).astype(jnp.float32)
        tx_max = ((x0 + roi_w - 1) * stride).astype(jnp.float32)
        ty_max = (height - 1 - (y0 + r0) * stride).astype(jnp.float32)
        ty_min = (height - 1 - (y0 + r1) * stride).astype(jnp.float32)

        def chunk_body(k, best):
            # Exact cull: a covered sample lies inside its triangle's bbox,
            # so a chunk whose united bbox misses the tile rect contributes
            # nothing.
            overlap = ((bbox_ref[0, k, 0] <= tx_max)
                       & (bbox_ref[0, k, 1] >= tx_min)
                       & (bbox_ref[0, k, 2] <= ty_max)
                       & (bbox_ref[0, k, 3] >= ty_min))

            def compute(best):
                # Inverse-depth (w) max packing — see
                # pallas_raster_direct._kernel for the derivation; depth
                # resolution happens once per pixel in the epilogue.
                c = coef_ref[0, pl.ds(k * tri_chunk, tri_chunk), :]  # [TT, 12]
                beta = c[:, 0:1] * px + c[:, 1:2] * py + c[:, 2:3]
                gamma = c[:, 3:4] * px + c[:, 4:5] * py + c[:, 5:6]
                alpha = c[:, 6:7] * px + c[:, 7:8] * py + c[:, 8:9]
                w = c[:, 9:10] * px + c[:, 10:11] * py + c[:, 11:12]
                covered = jnp.minimum(alpha, jnp.minimum(beta, gamma)) >= 0.0
                ids = (k * tri_chunk + jax.lax.broadcasted_iota(
                    jnp.int32, (tri_chunk, tile_pix), 0))
                wkey = ((jax.lax.bitcast_convert_type(w, jnp.int32)
                         & ~id_mask) | (id_mask - ids))
                cand = jnp.where(covered, wkey, 0)
                return jnp.maximum(best, cand.max(axis=0, keepdims=True))

            return jax.lax.cond(overlap, compute, lambda b: b, best)

        init = jnp.zeros((1, tile_pix), dtype=jnp.int32)
        best = jax.lax.fori_loop(0, n_chunks, chunk_body, init)
        found = best > 0
        w_win = jax.lax.bitcast_convert_type(
            (best & ~id_mask) | jnp.int32(1 << (TRI_ID_BITS - 1)),
            jnp.float32)
        tid = id_mask - (best & id_mask)
        depth_i = jnp.clip(jnp.round(1.0 / w_win), 1.0,
                           float(_MAX_DEPTH)).astype(jnp.int32)
        keys = jnp.where(found, (depth_i << TRI_ID_BITS) | tid,
                         jnp.int32(_INVALID_KEY))
        out_ref[0, j, :] = keys[0, :]
        return 0

    jax.lax.fori_loop(0, n_tiles, tile_body, 0)


@functools.partial(jax.jit, static_argnames=("width", "height", "stride",
                                             "roi_shape", "interpret"))
def rasterize_keys_pallas(
    coefs: jax.Array,   # [N, T, 12] packed per-triangle rows
    *,
    width: int,
    height: int,
    stride: int,
    anchors: jax.Array | None = None,   # [N, 2] int32 strided ROI origin
    roi_shape: tuple[int, int] | None = None,  # (roi_h, roi_w) strided
    tri_bboxes: jax.Array | None = None,  # [N, T, 4] screen bboxes
    interpret: bool = False,
) -> jax.Array:
    """Packed (depth << TRI_ID_BITS | tri_id) keys [N, Npix] (unpadded).

    With anchors/roi_shape, each pose rasterises only its
    roi_h x roi_w strided window (origin anchors[i], strided coords) —
    the per-pose region-of-interest optimisation (the reference carries an
    unused ROI through its kernels, image_renderer.cuh Model::ROI; here it
    is the primary work-reduction lever).
    """
    n, t, _ = coefs.shape
    tri_chunk = min(TRI_CHUNK, t)
    if t % tri_chunk:
        pad = tri_chunk - t % tri_chunk
        fill = jnp.zeros((n, pad, 12), coefs.dtype).at[:, :, 8].set(-jnp.inf)
        coefs = jnp.concatenate([coefs, fill], axis=1)
        if tri_bboxes is not None:
            bfill = jnp.tile(
                jnp.asarray([jnp.inf, -jnp.inf, jnp.inf, -jnp.inf],
                            jnp.float32), (n, pad, 1))
            tri_bboxes = jnp.concatenate([tri_bboxes, bfill], axis=1)
        t += pad
    n_chunks = t // tri_chunk

    # Per-chunk screen bboxes (with a 1px safety margin); without
    # per-triangle boxes, use all-overlapping sentinels (no culling).
    if tri_bboxes is not None:
        cb = tri_bboxes.reshape(n, n_chunks, tri_chunk, 4)
        chunk_bboxes = jnp.stack([
            cb[..., 0].min(axis=2) - 1.0,
            cb[..., 1].max(axis=2) + 1.0,
            cb[..., 2].min(axis=2) - 1.0,
            cb[..., 3].max(axis=2) + 1.0,
        ], axis=-1)
    else:
        chunk_bboxes = jnp.tile(
            jnp.asarray([-jnp.inf, jnp.inf, -jnp.inf, jnp.inf], jnp.float32),
            (n, n_chunks, 1))

    if roi_shape is None:
        roi_h, roi_w = height // stride, width // stride
        anchors = jnp.zeros((n, 2), jnp.int32)
    else:
        roi_h, roi_w = roi_shape
        assert anchors is not None
    npix = roi_h * roi_w
    tile_pix = min(TILE_PIX, max(128, npix))
    n_tiles = (npix + tile_pix - 1) // tile_pix

    kernel = functools.partial(
        _raster_kernel, width=width, height=height, stride=stride,
        n_chunks=n_chunks, n_tiles=n_tiles, tri_chunk=tri_chunk, roi_w=roi_w,
        tile_pix=tile_pix)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n,),
        in_specs=[pl.BlockSpec((1, t, 12), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, n_chunks, 4), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, n_tiles, tile_pix), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, n_tiles, tile_pix), jnp.int32),
        interpret=interpret,
    )(anchors.astype(jnp.int32), coefs, chunk_bboxes)
    return out.reshape(n, n_tiles * tile_pix)[:, :npix]


def pack_coefficients(coefs: jax.Array, aux: jax.Array,
                      ok: jax.Array) -> jax.Array:
    """(coefs [.., T, 3, 3], aux [.., T, 3], ok [.., T]) -> packed [.., T, 12]
    rows (bx, by, bc, gx, gy, gc, ax, ay, ac, wx, wy, wc), where alpha is its
    own affine function (alpha = |base| - beta - gamma) so the kernel's
    coverage test is a single min-sign check.

    Invalid triangles get alpha_c = -inf so coverage always fails.
    """
    flat = coefs.reshape(*coefs.shape[:-2], 9)
    abs_base = jnp.where(ok, aux[..., 0], -jnp.inf)[..., None]
    alpha = jnp.concatenate([
        -flat[..., 0:1] - flat[..., 3:4],
        -flat[..., 1:2] - flat[..., 4:5],
        abs_base - flat[..., 2:3] - flat[..., 5:6],
    ], axis=-1)
    return jnp.concatenate([flat[..., :6], alpha, flat[..., 6:9]], axis=-1)

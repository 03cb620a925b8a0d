"""Depth-image -> point-cloud conversion with static-shape compaction.

Replaces the reference's thrust scan-compaction pipeline
(cuda_renderer/include/cuda_renderer/cuda/compute_point_clouds.cuh:37-367:
`depth_to_mask` -> exclusive_scan -> `depth_to_2d_cloud`) and the observed
input path `depth2cloud_global` (renderer.cu:1936-2069). XLA needs static
shapes, so dynamic compaction becomes: stable-sort pixels by validity, keep
the first P_cap, and carry a validity mask everywhere downstream.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class CloudBatch(NamedTuple):
    xyz: jax.Array       # [N, P, 3] float32 camera frame (m)
    rgb: jax.Array       # [N, P, 3] float32 0..255
    valid: jax.Array     # [N, P] bool
    count: jax.Array     # [N] int32 valid points per pose
    pixel: jax.Array     # [N, P] int32 flat strided-pixel index of each point


@functools.lru_cache(maxsize=None)
def _interleave_perm(n: int) -> np.ndarray:
    """Deterministic low-discrepancy permutation of range(n).

    Multiplicative stride near n/phi, forced coprime to n: consecutive
    positions in the permuted order are ~golden-ratio-spaced in the
    original (scan) order, so every prefix of the permutation is an
    evenly-spread subsample of the whole range.
    """
    g = max(1, round(n * 0.6180339887)) | 1
    while np.gcd(g, n) != 1:
        g += 2
    return (np.arange(n, dtype=np.int64) * g % n).astype(np.int32)


def _strided_pixel_coords(width: int, height: int, stride: int):
    w_s, h_s = width // stride, height // stride
    xs = (np.arange(w_s) * stride).astype(np.float32)
    ys = (np.arange(h_s) * stride).astype(np.float32)
    px = np.tile(xs, h_s)
    py = np.repeat(ys, w_s)
    return px, py  # full-resolution pixel coordinates of strided samples


@functools.partial(jax.jit, static_argnames=("width", "height", "stride",
                                             "max_points", "depth_factor"))
def depth_to_cloud_batch(
    depth: jax.Array,   # [N, h_s, w_s] int32 (render units, depth_factor per m)
    color: jax.Array,   # [N, h_s, w_s, 3] float32
    *,
    fx: float, fy: float, cx: float, cy: float,
    width: int, height: int, stride: int,
    depth_factor: float = 100.0,
    max_points: int = 1024,
) -> CloudBatch:
    """Unproject strided depth images into fixed-capacity point clouds.

    Matches `transform_point` (compute_point_clouds.cuh:14-35): pixel (x, y)
    in full-res coordinates, z = depth/depth_factor metres. Points beyond
    max_points are dropped (reference sizes exactly; we cap — callers size
    max_points so drops only occur for degenerate all-foreground scenes).
    """
    n = depth.shape[0]
    npix = depth.shape[1] * depth.shape[2]
    px, py = _strided_pixel_coords(width, height, stride)
    px = jnp.asarray(px)
    py = jnp.asarray(py)

    d = depth.reshape(n, npix)
    valid = d > 0
    # Stable partition: valid pixels first, original order preserved.
    order = jnp.argsort(~valid, axis=1, stable=True)[:, :max_points]
    sel_valid = jnp.take_along_axis(valid, order, axis=1)
    sel_d = jnp.take_along_axis(d, order, axis=1).astype(jnp.float32)
    sel_px = px[order]
    sel_py = py[order]

    z = sel_d / depth_factor
    x = (sel_px - cx) / fx * z
    y = (sel_py - cy) / fy * z
    xyz = jnp.stack([x, y, z], axis=-1)
    xyz = jnp.where(sel_valid[..., None], xyz, 0.0)

    rgb = color.reshape(n, npix, 3)
    rgb = jnp.take_along_axis(rgb, order[..., None], axis=1)
    rgb = jnp.where(sel_valid[..., None], rgb, 0.0)

    return CloudBatch(
        xyz=xyz,
        rgb=rgb,
        valid=sel_valid,
        count=valid.sum(axis=1).astype(jnp.int32),
        pixel=jnp.where(sel_valid, order, -1).astype(jnp.int32),
    )


@functools.partial(jax.jit, static_argnames=("width", "height", "stride",
                                             "depth_factor"))
def depth_to_cloud_roi(
    depth: jax.Array,    # [N, rh, rw] int32 (render units)
    color: jax.Array,    # [N, rh, rw, 3] float32
    anchors: jax.Array,  # [N, 2] int32 strided ROI origin (x0, y0)
    *,
    fx: float, fy: float, cx: float, cy: float,
    width: int, height: int, stride: int,
    depth_factor: float = 100.0,
) -> CloudBatch:
    """ROI depth windows -> point clouds with NO compaction.

    The ROI already bounds the point count (rh*rw), so the argsort-based
    compaction of `depth_to_cloud_batch` is unnecessary — every window pixel
    becomes a (possibly invalid) point in place. Downstream ops are fully
    masked, so the only cost of the empties is the fixed capacity.
    """
    n, rh, rw = depth.shape
    npix = rh * rw
    lx = jnp.tile(jnp.arange(rw), rh)
    ly = jnp.repeat(jnp.arange(rh), rw)
    px = (anchors[:, 0:1] + lx[None, :]).astype(jnp.float32) * stride  # [N, Npix]
    py = (anchors[:, 1:2] + ly[None, :]).astype(jnp.float32) * stride

    d = depth.reshape(n, npix).astype(jnp.float32)
    valid = d > 0
    z = d / depth_factor
    x = (px - cx) / fx * z
    y = (py - cy) / fy * z
    xyz = jnp.where(valid[..., None], jnp.stack([x, y, z], axis=-1), 0.0)
    rgb = jnp.where(valid[..., None], color.reshape(n, npix, 3), 0.0)
    w_s = width // stride
    global_pix = ((anchors[:, 1:2] + ly[None, :]) * w_s
                  + anchors[:, 0:1] + lx[None, :])
    return CloudBatch(
        xyz=xyz, rgb=rgb, valid=valid,
        count=valid.sum(axis=1).astype(jnp.int32),
        pixel=jnp.where(valid, global_pix, -1).astype(jnp.int32))


class ObservedCloud(NamedTuple):
    """Observed scene cloud, flat + label-partitioned layouts.

    The label-partitioned layout replaces the reference's sort-by-label +
    index-range extraction (renderer.cu:1674-1686 via fast_gicp
    `extract_pose_indices`): segment `l` holds up to seg_cap points of mask
    label l (0-based), so a pose with segmentation label l scores against
    exactly its segment — one gather instead of range bookkeeping.
    """

    xyz: jax.Array         # [O, 3]
    rgb: jax.Array         # [O, 3]
    label: jax.Array       # [O] int32 0-based (-1 invalid)
    valid: jax.Array       # [O] bool
    count: jax.Array       # [] int32
    pixel: jax.Array       # [O] int32 strided-grid pixel index (-1 invalid)
    seg_xyz: jax.Array     # [L, S, 3]
    seg_rgb: jax.Array     # [L, S, 3]
    seg_valid: jax.Array   # [L, S] bool
    seg_count: jax.Array   # [L] int32  (= segmented_observed_point_count)


@functools.partial(jax.jit, static_argnames=(
    "width", "height", "stride", "max_points", "seg_cap", "num_labels",
    "use_label_filter", "use_bounds_filter"))
def observed_cloud_from_depth(
    depth: jax.Array,          # [H, W] float32/int32 raw sensor units
    color: jax.Array,          # [H, W, 3] float32
    label_mask: jax.Array,     # [H, W] int32, 1-based labels, 0 = background
    *,
    fx: float, fy: float, cx: float, cy: float,
    width: int, height: int, stride: int,
    depth_factor: float,
    max_points: int,
    seg_cap: int,
    num_labels: int,
    use_label_filter: bool = True,
    use_bounds_filter: bool = False,
    bounds: jax.Array | None = None,        # [6]: x_max,x_min,y_max,y_min,z_max,z_min
    cam_to_world: jax.Array | None = None,  # [4,4] for bounds filtering frame
) -> ObservedCloud:
    """Observed RGB-D image -> strided, filtered, label-partitioned cloud.

    Mirrors `depth2cloud_global` semantics: 6-DoF filters by the instance
    mask; 3-DoF filters by world-frame bounds after cam->world transform
    (compute_point_clouds.cuh:63-92). Output points stay in camera frame.
    """
    d = depth[::stride, ::stride].astype(jnp.float32)
    rgb = color[::stride, ::stride].astype(jnp.float32)
    lab = label_mask[::stride, ::stride].astype(jnp.int32)
    h_s, w_s = d.shape
    npix = h_s * w_s

    px, py = _strided_pixel_coords(width, height, stride)
    px = jnp.asarray(px[:npix])
    py = jnp.asarray(py[:npix])

    d = d.reshape(npix)
    rgb = rgb.reshape(npix, 3)
    lab = lab.reshape(npix)

    z = d / depth_factor
    x = (px - cx) / fx * z
    y = (py - cy) / fy * z
    xyz = jnp.stack([x, y, z], axis=-1)

    valid = d > 0
    if use_label_filter:
        valid &= lab > 0
    if use_bounds_filter:
        world = xyz
        if cam_to_world is not None:
            world = xyz @ cam_to_world[:3, :3].T + cam_to_world[:3, 3]
        valid &= (world[:, 0] <= bounds[0]) & (world[:, 0] >= bounds[1])
        valid &= (world[:, 1] <= bounds[2]) & (world[:, 1] >= bounds[3])
        valid &= (world[:, 2] <= bounds[4]) & (world[:, 2] >= bounds[5])

    order = jnp.argsort(~valid, stable=True)[:max_points]
    sel_valid = valid[order]
    sel_xyz = jnp.where(sel_valid[:, None], xyz[order], 0.0)
    sel_rgb = jnp.where(sel_valid[:, None], rgb[order], 0.0)
    sel_lab = jnp.where(sel_valid, lab[order] - 1, -1)
    sel_pix = jnp.where(sel_valid, order, -1).astype(jnp.int32)

    # Label partition: for each label l, up to seg_cap points with that
    # label. Points are taken in INTERLEAVED (coprime-stride) order rather
    # than scan order, so that any downstream static prefix crop
    # (cost_crop_targets / icp_crop_targets) is a spatially uniform
    # subsample of the segment instead of a row-major top-of-mask slab.
    perm = jnp.asarray(_interleave_perm(max_points))

    def one_segment(l):
        m = sel_valid & (sel_lab == l)
        seg_order = perm[jnp.argsort(~m[perm], stable=True)[:seg_cap]]
        seg_v = m[seg_order]
        return (jnp.where(seg_v[:, None], sel_xyz[seg_order], 0.0),
                jnp.where(seg_v[:, None], sel_rgb[seg_order], 0.0),
                seg_v,
                m.sum().astype(jnp.int32))

    seg_xyz, seg_rgb, seg_valid, seg_count = jax.vmap(one_segment)(
        jnp.arange(num_labels))

    return ObservedCloud(
        xyz=sel_xyz, rgb=sel_rgb, label=sel_lab.astype(jnp.int32),
        valid=sel_valid, count=sel_valid.sum().astype(jnp.int32),
        pixel=sel_pix,
        seg_xyz=seg_xyz, seg_rgb=seg_rgb, seg_valid=seg_valid,
        seg_count=seg_count)

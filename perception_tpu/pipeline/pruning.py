"""Successor pruning: colour-histogram and occupancy (octomap-analogue)
filters for 3-DoF candidate generation.

Reference semantics (search_env.cpp:7331-7420, kUseHistogramPruning /
kUseOctomapPruning; IsValidHistogram search_env.cpp:2994-3046):

  * histogram: render the candidate alone, crop both the rendered image
    and the observed colour image to the rendered object's bounding box,
    compare 50x60 hue-saturation histograms (min-max normalised) by
    Bhattacharyya distance; keep if distance < threshold (0.85).
  * octomap: render the candidate alone, voxelize at 2 cm, count rendered
    points that land in voxels NOT occupied by the observed cloud; keep if
    that changed fraction (relative to the observed cloud size, as the
    reference computes it) stays below 0.8.

TPU-native re-design: the reference renders candidates ONE AT A TIME
through its OpenGL simulator inside the nested (x, y, theta) loop; here
every candidate is rendered in one batched `render_pose_batch` dispatch
and the histogram/voxel tests are vectorised numpy on the host (they are
O(pixels) epilogues, not device-scale work). The octree change detector
becomes an exact voxel-key membership test at the same resolution —
equivalent for the fraction-of-new-points statistic the reference
thresholds.
"""

from __future__ import annotations

import numpy as np


def rgb_to_hs(rgb: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorised RGB [..., 3] (0..255) -> OpenCV-convention hue (0..180)
    and saturation (0..255)."""
    rgb = rgb.astype(np.float32)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = np.maximum(np.maximum(r, g), b)
    minc = np.minimum(np.minimum(r, g), b)
    delta = maxc - minc
    s = np.where(maxc > 0, delta / np.maximum(maxc, 1e-9) * 255.0, 0.0)
    # Hue in degrees (0..360), OpenCV stores H/2 for uint8.
    safe = np.maximum(delta, 1e-9)
    h = np.where(
        maxc == r, (g - b) / safe % 6.0,
        np.where(maxc == g, (b - r) / safe + 2.0, (r - g) / safe + 4.0))
    h = np.where(delta > 0, h * 30.0, 0.0)   # *60 deg / 2 (OpenCV scale)
    return h, s


def hs_histogram(rgb: np.ndarray, mask: np.ndarray,
                 h_bins: int = 50, s_bins: int = 60) -> np.ndarray:
    """Min-max-normalised HS histogram over masked pixels
    (calcHist + NORM_MINMAX in IsValidHistogram)."""
    h, s = rgb_to_hs(rgb[mask])
    hist, _, _ = np.histogram2d(
        h, s, bins=(h_bins, s_bins), range=((0, 180), (0, 256)))
    lo, hi = hist.min(), hist.max()
    if hi > lo:
        hist = (hist - lo) / (hi - lo)
    return hist.astype(np.float64)


def bhattacharyya(h1: np.ndarray, h2: np.ndarray) -> float:
    """OpenCV HISTCMP_BHATTACHARYYA (lower = more similar)."""
    s1, s2 = h1.sum(), h2.sum()
    if s1 <= 0 or s2 <= 0:
        return 1.0
    bc = np.sum(np.sqrt(h1 * h2)) / np.sqrt(s1 * s2)
    return float(np.sqrt(max(0.0, 1.0 - bc)))


def histogram_scores(rendered_color: np.ndarray, rendered_depth: np.ndarray,
                     observed_color: np.ndarray,
                     h_bins: int = 50, s_bins: int = 60) -> np.ndarray:
    """Bhattacharyya distance per candidate between the rendered object's
    bbox crop and the observed image's same crop.

    rendered_color [N, h, w, 3], rendered_depth [N, h, w] (0 = empty),
    observed_color [h, w, 3] (same strided grid).
    """
    n = rendered_color.shape[0]
    out = np.ones(n)
    for i in range(n):
        mask = rendered_depth[i] > 0
        if not mask.any():
            continue
        ys, xs = np.nonzero(mask)
        y0, y1 = ys.min(), ys.max() + 1
        x0, x1 = xs.min(), xs.max() + 1
        # Reference crops BOTH images to the same bbox and histograms all
        # bbox pixels (mask only defines the bbox).
        box = np.s_[y0:y1, x0:x1]
        full = np.ones((y1 - y0, x1 - x0), bool)
        h_obs = hs_histogram(observed_color[box], full, h_bins, s_bins)
        h_ren = hs_histogram(rendered_color[i][box], full, h_bins, s_bins)
        out[i] = bhattacharyya(h_obs, h_ren)
    return out


def voxel_keys(points: np.ndarray, resolution: float) -> np.ndarray:
    """Unique int64 voxel keys for [P, 3] points."""
    cells = np.floor(points / resolution).astype(np.int64) + (1 << 20)
    return (cells[:, 0] << 42) | (cells[:, 1] << 21) | cells[:, 2]


def voxel_changed_fraction(rendered_points_world: list[np.ndarray],
                           observed_points_world: np.ndarray,
                           resolution: float = 0.02) -> np.ndarray:
    """Per candidate: (# rendered points in voxels unoccupied by the
    observed cloud) / observed cloud size — the statistic the reference's
    OctreePointCloudChangeDetector pass thresholds at 0.8."""
    occupied = np.unique(voxel_keys(observed_points_world, resolution))
    denom = max(1, len(observed_points_world))
    out = np.zeros(len(rendered_points_world))
    for i, pts in enumerate(rendered_points_world):
        if len(pts) == 0:
            out[i] = 1.0
            continue
        keys = voxel_keys(pts, resolution)
        new = ~np.isin(keys, occupied)
        out[i] = float(new.sum()) / denom
    return out


def prune_successors(env, states: list, *,
                     use_histogram: bool = False,
                     use_voxels: bool = False,
                     histogram_threshold: float = 0.85,
                     voxel_resolution: float = 0.02,
                     max_changed_fraction: float = 0.8,
                     batch: int = 256) -> list:
    """Filter candidate ObjectStates by the enabled pruning tests.

    One batched full-frame render per `batch` candidates replaces the
    reference's per-candidate simulator renders.
    """
    import jax.numpy as jnp

    from perception_tpu.ops.rasterizer import render_pose_batch

    if not states or not (use_histogram or use_voxels):
        return list(states)

    cam, stride = env.camera, int(env.perch.gpu_stride)
    observed_color = None
    if use_histogram:
        if env._input is None or env._input.color_image is None:
            return list(states)
        observed_color = np.asarray(
            env._input.color_image)[::stride, ::stride]

    keep: list = []
    c2w = env._input.cam_to_world
    for lo in range(0, len(states), batch):
        chunk = states[lo:lo + batch]
        poses = np.stack([env.pose_to_camera(s) for s in chunk]).astype(
            np.float32)
        ids = np.asarray([s.id for s in chunk], np.int32)
        out = render_pose_batch(
            env._bank_tri_verts, env._bank_tri_colors, env._bank_tri_valid,
            jnp.asarray(poses), jnp.asarray(ids), env._proj,
            width=cam.width, height=cam.height, stride=stride,
            backend=env.env.kernel_backend,
            bank_backface=env._bank_backface)
        depth = np.asarray(out.depth)
        ok = np.ones(len(chunk), bool)
        if use_histogram:
            color = np.asarray(out.color)
            dist = histogram_scores(color, depth, observed_color)
            ok &= dist < histogram_threshold
        if use_voxels:
            clouds = []
            ys, xs = np.mgrid[0:depth.shape[1], 0:depth.shape[2]]
            for i in range(len(chunk)):
                m = depth[i] > 0
                z = depth[i][m] / env.env.gpu_depth_factor
                px = xs[m] * stride
                py = ys[m] * stride
                x = (px - cam.cx) * z / cam.fx
                y = (py - cam.cy) * z / cam.fy
                pts_cam = np.stack([x, y, z], axis=1)
                pts_w = pts_cam @ c2w[:3, :3].T + c2w[:3, 3]
                clouds.append(pts_w)
            frac = voxel_changed_fraction(
                clouds, env._world_points, voxel_resolution)
            ok &= frac < max_changed_fraction
        keep.extend(s for s, k in zip(chunk, ok) if k)
    return keep

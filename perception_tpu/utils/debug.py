"""Debug-by-artifact helpers.

The reference debugs by dumping artefacts everywhere: expansion images,
per-successor renders, GPU batch images (PrintGPUImages,
search_env.cpp:1025-1092), cost dumps. Equivalent helpers here; enabled by
the same vis_expanded_states / vis_successors flags.
"""

from __future__ import annotations

import os

import numpy as np


def colorize_depth(depth: np.ndarray, max_depth: float | None = None) -> np.ndarray:
    """int/float depth -> uint8 heatmap-ish RGB (utils.cpp EncodeDepthImage)."""
    d = np.asarray(depth, dtype=np.float64)
    valid = d > 0
    if max_depth is None:
        max_depth = d.max() if valid.any() else 1.0
    norm = np.where(valid, np.clip(d / max(max_depth, 1e-9), 0, 1), 0)
    r = (255 * norm).astype(np.uint8)
    b = (255 * (1 - norm) * valid).astype(np.uint8)
    g = np.where(valid, 80, 0).astype(np.uint8)
    return np.stack([r, g, b], axis=-1)


def save_depth_image(depth: np.ndarray, path: str,
                     max_depth: float | None = None) -> None:
    import cv2

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    cv2.imwrite(path, colorize_depth(depth, max_depth)[..., ::-1])


def save_batch_grid(
    depth_batch: np.ndarray,    # [N, h, w]
    path: str,
    color_batch: np.ndarray | None = None,
    costs: list | None = None,
    cols: int = 8,
) -> None:
    """Tile a pose batch's renders into one annotated image
    (PrintGPUImages equivalent)."""
    import cv2

    n, h, w = depth_batch.shape
    cols = min(cols, n)
    rows = (n + cols - 1) // cols
    if color_batch is not None:
        cell = np.asarray(color_batch, dtype=np.uint8)
    else:
        cell = np.stack([colorize_depth(d) for d in depth_batch])
    grid = np.zeros((rows * h, cols * w, 3), np.uint8)
    for i in range(n):
        r, c = divmod(i, cols)
        img = cell[i].copy()
        if costs is not None and i < len(costs):
            cv2.putText(img, str(costs[i]), (2, 12),
                        cv2.FONT_HERSHEY_PLAIN, 0.8, (255, 255, 255), 1)
        grid[r * h:(r + 1) * h, c * w:(c + 1) * w] = img
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    cv2.imwrite(path, grid[..., ::-1])

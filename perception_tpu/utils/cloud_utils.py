"""Point-cloud utilities: plane removal, clustering, filters.

NumPy/SciPy re-implementation of the reference's PCL helper layer
(perception_utils/src/perception_utils.cpp: GetRemovedPlane/SegmentPlane,
DoEuclideanClustering, DownsamplePointCloud, passthrough/outlier filters)
used for tabletop scene preprocessing in the 3-DoF pipeline and the robot
interface (object_recognition_node perception_interface).
"""

from __future__ import annotations

import numpy as np


def fit_plane_ransac(
    points: np.ndarray,
    distance_threshold: float = 0.01,
    max_iterations: int = 200,
    rng: np.random.Generator | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """RANSAC plane fit -> (coefficients [4] with |n|=1, inlier mask).

    Mirrors pcl::SACSegmentation with SACMODEL_PLANE (perception_utils.cpp
    SegmentPlane).
    """
    rng = rng or np.random.default_rng(0)
    pts = np.asarray(points, dtype=np.float64)
    n = len(pts)
    if n < 3:
        return np.array([0, 0, 1, 0.0]), np.zeros(n, bool)
    best_mask = np.zeros(n, bool)
    best_coeffs = np.array([0, 0, 1, 0.0])
    for _ in range(max_iterations):
        idx = rng.choice(n, 3, replace=False)
        p0, p1, p2 = pts[idx]
        normal = np.cross(p1 - p0, p2 - p0)
        norm = np.linalg.norm(normal)
        if norm < 1e-12:
            continue
        normal /= norm
        d = -normal @ p0
        dist = np.abs(pts @ normal + d)
        mask = dist < distance_threshold
        if mask.sum() > best_mask.sum():
            best_mask = mask
            best_coeffs = np.array([*normal, d])
    # Refine with least squares on inliers.
    if best_mask.sum() >= 3:
        inl = pts[best_mask]
        centroid = inl.mean(axis=0)
        _, _, vt = np.linalg.svd(inl - centroid, full_matrices=False)
        normal = vt[2]
        d = -normal @ centroid
        dist = np.abs(pts @ normal + d)
        best_mask = dist < distance_threshold
        best_coeffs = np.array([*normal, d])
    return best_coeffs, best_mask


def remove_plane(points: np.ndarray, distance_threshold: float = 0.01,
                 **kwargs) -> tuple[np.ndarray, np.ndarray]:
    """Remove the dominant plane -> (remaining points, plane coefficients)
    (perception_utils RemoveGroundPlane / GetRemovedPlane)."""
    coeffs, mask = fit_plane_ransac(points, distance_threshold, **kwargs)
    return np.asarray(points)[~mask], coeffs


def euclidean_clusters(
    points: np.ndarray,
    tolerance: float = 0.02,
    min_size: int = 10,
    max_size: int = 10**9,
) -> list[np.ndarray]:
    """Connected components under a distance tolerance -> index arrays,
    largest first (pcl EuclideanClusterExtraction,
    perception_utils DoEuclideanClustering)."""
    from scipy.spatial import cKDTree

    pts = np.asarray(points)
    n = len(pts)
    if n == 0:
        return []
    tree = cKDTree(pts)
    pairs = tree.query_pairs(tolerance, output_type="ndarray")
    # Union-find.
    parent = np.arange(n)

    def find(a):
        root = a
        while parent[root] != root:
            root = parent[root]
        while parent[a] != root:
            parent[a], a = root, parent[a]
        return root

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra
    roots = np.array([find(i) for i in range(n)])
    clusters = []
    for r in np.unique(roots):
        idx = np.nonzero(roots == r)[0]
        if min_size <= len(idx) <= max_size:
            clusters.append(idx)
    clusters.sort(key=len, reverse=True)
    return clusters


def voxel_downsample(points: np.ndarray, leaf_size: float,
                     attributes: np.ndarray | None = None):
    """Voxel-grid downsampling to per-cell centroids (pcl VoxelGrid,
    perception_utils DownsamplePointCloud)."""
    pts = np.asarray(points, dtype=np.float64)
    if len(pts) == 0:
        return (pts, attributes) if attributes is not None else pts
    keys = np.floor(pts / leaf_size).astype(np.int64)
    _, inverse = np.unique(keys, axis=0, return_inverse=True)
    k = inverse.max() + 1
    counts = np.bincount(inverse, minlength=k).astype(np.float64)
    out = np.stack([np.bincount(inverse, weights=pts[:, i], minlength=k)
                    for i in range(pts.shape[1])], axis=1) / counts[:, None]
    if attributes is not None:
        attr = np.asarray(attributes, dtype=np.float64)
        aout = np.stack(
            [np.bincount(inverse, weights=attr[:, i], minlength=k)
             for i in range(attr.shape[1])], axis=1) / counts[:, None]
        return out, aout
    return out


def passthrough_filter(points: np.ndarray, axis: int,
                       lo: float, hi: float) -> np.ndarray:
    """Keep points with lo <= p[axis] <= hi (pcl PassThrough)."""
    pts = np.asarray(points)
    mask = (pts[:, axis] >= lo) & (pts[:, axis] <= hi)
    return pts[mask]


def statistical_outlier_removal(points: np.ndarray, k: int = 20,
                                std_ratio: float = 2.0) -> np.ndarray:
    """Drop points whose mean k-NN distance exceeds mean + std_ratio*std
    (pcl StatisticalOutlierRemoval)."""
    from scipy.spatial import cKDTree

    pts = np.asarray(points)
    if len(pts) <= k:
        return pts
    tree = cKDTree(pts)
    dists, _ = tree.query(pts, k=k + 1)
    mean_d = dists[:, 1:].mean(axis=1)
    thresh = mean_d.mean() + std_ratio * mean_d.std()
    return pts[mean_d <= thresh]


def organized_cloud_from_depth(depth: np.ndarray, fx: float, fy: float,
                               cx: float, cy: float,
                               depth_factor: float = 1000.0) -> np.ndarray:
    """Depth image -> [H, W, 3] organised cloud (invalid -> nan), mirroring
    kinect-style conversions in utils/utils.cpp."""
    h, w = depth.shape
    ys, xs = np.mgrid[0:h, 0:w]
    z = depth.astype(np.float64) / depth_factor
    with np.errstate(invalid="ignore"):
        x = (xs - cx) / fx * z
        y = (ys - cy) / fy * z
    cloud = np.stack([x, y, z], axis=-1)
    cloud[depth <= 0] = np.nan
    return cloud

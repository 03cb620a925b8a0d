"""Mesh loading, preprocessing, and the padded triangle-soup model bank.

TPU-native replacement for the reference's assimp-based `cuda_renderer::Model`
(cuda_renderer/include/cuda_renderer/model.h:22-205, src/model.cpp) and
`ObjectModel` preprocessing (sbpl_perception/src/object_model.cpp:49-135,
326-470):

  * a self-contained PLY (ascii / binary-little-endian) and OBJ reader —
    no assimp;
  * `preprocess_model`: centroid / min-z shift to the origin, optional
    mm->m scaling and z-flip, returned as the 4x4 `preprocessing_transform`
    the output contract needs (output_poses.txt records it);
  * vertex-clustering decimation so every model fits a static per-model
    triangle budget — rendering happens at strided resolution (80x60 for the
    flagship config) where sub-millimetre triangles are invisible, so a
    deterministic cluster-collapse loses nothing while XLA gets one padded
    [num_models, T_cap] triangle tensor;
  * bbox-derived inscribed/circumscribed radii and the convex-hull footprint
    used by 3-DoF validity checks (object_model.cpp:376-460).
"""

from __future__ import annotations

import dataclasses
import os
import struct

import numpy as np

# Additive inflation applied to radii when validating poses
# (object_model.cpp:43 kMeshAdditiveInflation).
MESH_ADDITIVE_INFLATION = 0.01


# --------------------------------------------------------------------------
# File readers
# --------------------------------------------------------------------------

_PLY_DTYPES = {
    "char": "i1", "int8": "i1",
    "uchar": "u1", "uint8": "u1",
    "short": "i2", "int16": "i2",
    "ushort": "u2", "uint16": "u2",
    "int": "i4", "int32": "i4",
    "uint": "u4", "uint32": "u4",
    "float": "f4", "float32": "f4",
    "double": "f8", "float64": "f8",
}


def read_ply(path: str) -> tuple[np.ndarray, np.ndarray, np.ndarray | None]:
    """Read a PLY mesh -> (vertices [V,3] f64, faces [F,3] i64, colors [V,3] u8|None).

    Supports ascii and binary_little_endian, vertex colors, and polygonal
    faces (fan-triangulated). Covers the YCB `textured.ply` family the
    reference consumes via assimp (model.cpp LoadModel).
    """
    with open(path, "rb") as f:
        data = f.read()

    header_end = data.find(b"end_header")
    if header_end < 0:
        raise ValueError(f"{path}: not a PLY file (no end_header)")
    header_end = data.index(b"\n", header_end) + 1
    header = data[:header_end].decode("ascii", errors="replace").splitlines()
    body = data[header_end:]

    fmt = None
    elements = []  # list of (name, count, [(prop_name, dtype)|('list', cdt, idt, name)])
    cur = None
    for line in header:
        parts = line.strip().split()
        if not parts:
            continue
        if parts[0] == "format":
            fmt = parts[1]
        elif parts[0] == "element":
            cur = (parts[1], int(parts[2]), [])
            elements.append(cur)
        elif parts[0] == "property" and cur is not None:
            if parts[1] == "list":
                cur[2].append(("list", _PLY_DTYPES[parts[2]], _PLY_DTYPES[parts[3]], parts[4]))
            else:
                cur[2].append((parts[2], _PLY_DTYPES[parts[1]]))

    if fmt not in ("ascii", "binary_little_endian"):
        raise ValueError(f"{path}: unsupported PLY format {fmt}")

    verts = None
    colors = None
    faces: list[list[int]] = []

    offset = 0
    text_lines = None
    if fmt == "ascii":
        text_lines = body.decode("ascii", errors="replace").split("\n")
        line_idx = 0

    for name, count, props in elements:
        has_list = any(p[0] == "list" for p in props)
        if fmt == "binary_little_endian" and not has_list:
            dtype = np.dtype([(p[0], "<" + p[1]) for p in props])
            arr = np.frombuffer(body, dtype=dtype, count=count, offset=offset)
            offset += dtype.itemsize * count
            if name == "vertex":
                verts = np.stack(
                    [arr["x"], arr["y"], arr["z"]], axis=1).astype(np.float64)
                if "red" in dtype.names:
                    colors = np.stack(
                        [arr["red"], arr["green"], arr["blue"]], axis=1
                    ).astype(np.uint8)
        elif fmt == "binary_little_endian":
            # Element with list property, read row by row (faces).
            rows = []
            for _ in range(count):
                row_vals = []
                for p in props:
                    if p[0] == "list":
                        cdt = np.dtype("<" + p[1])
                        n = int(np.frombuffer(body, cdt, 1, offset)[0])
                        offset += cdt.itemsize
                        idt = np.dtype("<" + p[2])
                        vals = np.frombuffer(body, idt, n, offset)
                        offset += idt.itemsize * n
                        row_vals.append(vals)
                    else:
                        dt = np.dtype("<" + p[1])
                        row_vals.append(np.frombuffer(body, dt, 1, offset)[0])
                        offset += dt.itemsize
                rows.append(row_vals)
            if name == "face":
                for row in rows:
                    idx = [v for v in row if isinstance(v, np.ndarray)][0]
                    faces.extend(_fan_triangulate(idx))
        else:  # ascii
            prop_names = [p[0] if p[0] != "list" else p[3] for p in props]
            vrows = []
            for _ in range(count):
                while text_lines[line_idx].strip() == "":
                    line_idx += 1
                vals = text_lines[line_idx].split()
                line_idx += 1
                if has_list:
                    n = int(vals[0])
                    faces.extend(_fan_triangulate([int(v) for v in vals[1:1 + n]]))
                else:
                    vrows.append([float(v) for v in vals])
            if name == "vertex":
                arr = np.asarray(vrows, dtype=np.float64)
                verts = arr[:, :3]
                ci = [i for i, pn in enumerate(prop_names) if pn in ("red", "green", "blue")]
                if len(ci) == 3:
                    colors = arr[:, ci].astype(np.uint8)

    if verts is None:
        raise ValueError(f"{path}: PLY has no vertex element")
    faces_arr = np.asarray(faces, dtype=np.int64).reshape(-1, 3)
    return verts, faces_arr, colors


def _fan_triangulate(idx) -> list[list[int]]:
    idx = list(idx)
    return [[idx[0], idx[i], idx[i + 1]] for i in range(1, len(idx) - 1)]


def read_obj(path: str) -> tuple[np.ndarray, np.ndarray, np.ndarray | None]:
    """Minimal OBJ reader (v / f records, fan triangulation)."""
    verts, faces = [], []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "v":
                verts.append([float(x) for x in parts[1:4]])
            elif parts[0] == "f":
                idx = [int(tok.split("/")[0]) - 1 for tok in parts[1:]]
                faces.extend(_fan_triangulate(idx))
    return (np.asarray(verts, dtype=np.float64),
            np.asarray(faces, dtype=np.int64).reshape(-1, 3), None)


def read_mesh(path: str, prefer_native: bool = True):
    """Read a mesh file; uses the C++ loader when built (the Python binary
    PLY reader loops faces row-by-row — far too slow for full-resolution
    YCB meshes), falling back to the pure-Python parsers."""
    if prefer_native:
        try:
            from perception_tpu.native.loader import (
                load_mesh_native,
                native_available,
            )

            if native_available():
                return load_mesh_native(path)
        except Exception:
            pass
    if path.endswith(".ply"):
        return read_ply(path)
    if path.endswith(".obj"):
        return read_obj(path)
    raise ValueError(f"unsupported mesh format: {path}")


# --------------------------------------------------------------------------
# Preprocessing (reference PreprocessModel, object_model.cpp:49-129)
# --------------------------------------------------------------------------

def preprocess_model(
    verts: np.ndarray,
    mesh_in_mm: bool = False,
    scaling_factor: float = 0.001,
    flipped: bool = False,
    use_external_pose_list: bool = False,
) -> tuple[np.ndarray, np.ndarray]:
    """Shift/scale/flip model vertices; return (new_verts, preprocessing_transform).

    6-DoF mode centres the full centroid; 3-DoF mode drops the model so its
    minimum z sits at 0 (table contact). The returned 4x4 satisfies
    `new = T @ old` and is recorded in output_poses.txt, matching the
    reference's `preprocessing_transform_`.
    """
    verts = np.asarray(verts, dtype=np.float64)
    centroid = verts.mean(axis=0)

    flip = np.eye(4)
    if flipped:
        flip[2, 2] = -1.0
        verts = verts @ flip[:3, :3].T
    vmin = verts.min(axis=0)

    x_t, y_t = centroid[0], centroid[1]
    z_t = centroid[2] if use_external_pose_list else vmin[2]
    # Note: the reference flips first, but computes the x/y centroid from the
    # pre-flip cloud (they are equal: the flip only negates z) and min-z from
    # the post-flip cloud, as here.
    scale = scaling_factor if mesh_in_mm else 1.0
    x_t, y_t, z_t = x_t * scale, y_t * scale, z_t * scale

    transform = np.eye(4)
    transform[:3, :3] *= scale
    transform[:3, 3] = [-x_t, -y_t, -z_t]

    new_verts = verts * scale + transform[:3, 3]
    return new_verts, transform @ flip


# --------------------------------------------------------------------------
# Decimation
# --------------------------------------------------------------------------

def decimate_vertex_clustering(
    verts: np.ndarray,
    faces: np.ndarray,
    colors: np.ndarray | None,
    target_triangles: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray | None]:
    """Deterministic vertex-clustering decimation to <= target_triangles.

    Snaps vertices to a uniform grid (binary-search on cell size), merges
    clusters at their mean, and drops degenerate/duplicate faces. Good enough
    fidelity for strided depth rendering; avoids any dependence on external
    mesh libraries.
    """
    if len(faces) <= target_triangles:
        return verts, faces, colors

    extent = float((verts.max(axis=0) - verts.min(axis=0)).max())
    lo_cells, hi_cells = 2, 512  # grid resolution along the longest axis

    def cluster(num_cells: int):
        cell = extent / num_cells
        keys = np.floor((verts - verts.min(axis=0)) / cell).astype(np.int64)
        # Unique cluster id per occupied cell.
        _, inverse = np.unique(keys, axis=0, return_inverse=True)
        n_clusters = inverse.max() + 1
        # Cluster means.
        sums = np.zeros((n_clusters, 3))
        counts = np.zeros(n_clusters)
        np.add.at(sums, inverse, verts)
        np.add.at(counts, inverse, 1)
        new_verts = sums / counts[:, None]
        new_colors = None
        if colors is not None:
            csums = np.zeros((n_clusters, 3))
            np.add.at(csums, inverse, colors.astype(np.float64))
            new_colors = (csums / counts[:, None]).astype(np.uint8)
        new_faces = inverse[faces]
        # Drop degenerate faces (two verts collapsed together).
        keep = (
            (new_faces[:, 0] != new_faces[:, 1])
            & (new_faces[:, 1] != new_faces[:, 2])
            & (new_faces[:, 0] != new_faces[:, 2])
        )
        new_faces = new_faces[keep]
        # Drop duplicate faces (ignoring winding would risk flipping normals;
        # keep orientation-sensitive uniqueness).
        new_faces = np.unique(new_faces, axis=0)
        return new_verts, new_faces, new_colors

    best = None
    while lo_cells <= hi_cells:
        mid = (lo_cells + hi_cells) // 2
        nv, nf, nc = cluster(mid)
        if len(nf) <= target_triangles:
            best = (nv, nf, nc)
            lo_cells = mid + 1
        else:
            hi_cells = mid - 1
    if best is None:
        best = cluster(2)
        if len(best[1]) > target_triangles:
            best = (best[0], best[1][:target_triangles], best[2])
    return best


def decimate_qem(
    verts: np.ndarray,
    faces: np.ndarray,
    colors: np.ndarray | None,
    target_triangles: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray | None]:
    """Quadric-error-metric edge-collapse decimation (Garland-Heckbert).

    Much higher geometric fidelity per triangle than vertex clustering —
    collapses are ordered by the plane-distance error they introduce, so
    flat regions give up their triangles first and curvature/feature
    edges survive. This prices directly into the render-LOD throughput
    ladder (ARCHITECTURE.md): the LOD a given AUC budget affords is set
    by decimation quality. Boundary edges (open rims: mug top, bowl lip)
    are held by perpendicular constraint quadrics; collapses that flip
    an incident face normal are rejected.

    Deterministic. O(E log E) with lazy heap invalidation; Python-level,
    amortised by io/model_cache for file-loaded models.
    """
    import heapq

    faces = np.asarray(faces, np.int64)
    if len(faces) <= target_triangles:
        return verts, faces, colors
    pos = np.asarray(verts, np.float64).copy()
    nv = len(pos)

    # Per-face plane quadrics, area-weighted.
    tri = pos[faces]
    fn = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    area2 = np.linalg.norm(fn, axis=1)
    ok = area2 > 1e-18
    nrm = np.where(ok[:, None], fn / np.maximum(area2, 1e-18)[:, None], 0.0)
    dpl = -(nrm * tri[:, 0]).sum(axis=1)
    p4 = np.c_[nrm, dpl]
    kf = (p4[:, :, None] * p4[:, None, :]) * area2[:, None, None]
    quad = np.zeros((nv, 4, 4))
    for c in range(3):
        np.add.at(quad, faces[:, c], kf)

    # Boundary constraint quadrics: for each edge incident to exactly ONE
    # face, a plane through the edge perpendicular to its face, weighted
    # by the squared edge length (keeps open rims in place). Incidence is
    # counted on UNDIRECTED edges — a reverse-twin test would misclassify
    # every edge of an inconsistently-wound mesh (e.g. scipy ConvexHull
    # output) as boundary and shrink it under bogus constraints.
    e_all = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]],
                            faces[:, [2, 0]]])
    e_face = np.tile(np.arange(len(faces)), 3)
    und = np.sort(e_all, axis=1)
    key_u = und[:, 0] * (nv + 1) + und[:, 1]
    uniq, counts = np.unique(key_u, return_counts=True)
    boundary = np.isin(key_u, uniq[counts == 1])
    for (a, b), fi in zip(e_all[boundary], e_face[boundary]):
        ev = pos[b] - pos[a]
        cn = np.cross(ev, nrm[fi])
        ln = np.linalg.norm(cn)
        if ln < 1e-18:
            continue
        cn = cn / ln
        cp4 = np.r_[cn, -np.dot(cn, pos[a])]
        w = float(np.dot(ev, ev)) * 100.0
        quad[a] += w * np.outer(cp4, cp4)
        quad[b] += w * np.outer(cp4, cp4)

    vcol = (np.asarray(colors, np.float64).copy()
            if colors is not None else None)
    vweight = np.ones(nv)   # merged-vertex count for colour averaging

    # Mutable connectivity.
    vfaces: list[set] = [set() for _ in range(nv)]
    for fi, f in enumerate(faces):
        for c in range(3):
            vfaces[f[c]].add(fi)
    fvert = faces.copy()
    alive_f = np.ones(len(faces), bool)
    alive_f &= ok    # drop degenerate-input faces from the count
    alive_v = np.ones(nv, bool)
    version = np.zeros(nv, np.int64)
    n_alive = int(alive_f.sum())

    def edge_cost(a: int, b: int):
        q = quad[a] + quad[b]
        a3, b3 = q[:3, :3], -q[:3, 3]
        scale = np.trace(a3) + 1e-30
        cands = []
        try:
            if abs(np.linalg.det(a3)) > 1e-12 * scale**3:
                cands.append(np.linalg.solve(a3, b3))
        except np.linalg.LinAlgError:
            pass
        cands.extend((0.5 * (pos[a] + pos[b]), pos[a], pos[b]))
        best, best_c = None, np.inf
        for v in cands:
            h = np.r_[v, 1.0]
            cst = float(h @ q @ h)
            if cst < best_c:
                best, best_c = v, cst
        return best_c, best

    heap: list = []
    pushed = set()
    for a, b in e_all:
        ea, eb = (int(a), int(b)) if a < b else (int(b), int(a))
        if (ea, eb) in pushed:
            continue
        pushed.add((ea, eb))
        cst, _ = edge_cost(ea, eb)
        heapq.heappush(heap, (cst, ea, eb, 0, 0))

    while n_alive > target_triangles and heap:
        cst, a, b, va, vb = heapq.heappop(heap)
        if (not alive_v[a] or not alive_v[b]
                or version[a] != va or version[b] != vb):
            continue
        cst2, vbar = edge_cost(a, b)
        shared = vfaces[a] & vfaces[b]
        if not shared:
            continue   # connectivity changed; no longer an edge
        # Reject collapses that flip a surviving incident face.
        flip = False
        for fi in (vfaces[a] | vfaces[b]) - shared:
            if not alive_f[fi]:
                continue
            f = fvert[fi]
            old = np.cross(pos[f[1]] - pos[f[0]], pos[f[2]] - pos[f[0]])
            moved = [vbar if v in (a, b) else pos[v] for v in f]
            new = np.cross(moved[1] - moved[0], moved[2] - moved[0])
            if np.dot(old, new) <= 0:
                flip = True
                break
        if flip:
            continue
        # Merge b into a at vbar.
        pos[a] = vbar
        quad[a] = quad[a] + quad[b]
        if vcol is not None:
            wa, wb = vweight[a], vweight[b]
            vcol[a] = (wa * vcol[a] + wb * vcol[b]) / (wa + wb)
            vweight[a] = wa + wb
        alive_v[b] = False
        for fi in shared:
            if alive_f[fi]:
                alive_f[fi] = False
                n_alive -= 1
            for v in fvert[fi]:
                vfaces[v].discard(fi)
        for fi in list(vfaces[b]):
            fvert[fi][fvert[fi] == b] = a
            vfaces[a].add(fi)
        vfaces[b] = set()
        version[a] += 1
        version[b] += 1
        # Re-key the merged vertex's edges.
        nbrs = set()
        for fi in vfaces[a]:
            if alive_f[fi]:
                nbrs.update(int(v) for v in fvert[fi] if v != a)
        for b2 in nbrs:
            cst3, _ = edge_cost(a, b2)
            ea, eb = (a, b2) if a < b2 else (b2, a)
            heapq.heappush(
                heap, (cst3, ea, eb, int(version[ea]), int(version[eb])))

    out_faces = fvert[alive_f]
    # Drop degenerates introduced by rejected-flip edge cases.
    keep = ((out_faces[:, 0] != out_faces[:, 1])
            & (out_faces[:, 1] != out_faces[:, 2])
            & (out_faces[:, 0] != out_faces[:, 2]))
    out_faces = out_faces[keep]
    remap = -np.ones(nv, np.int64)
    used = np.unique(out_faces)
    remap[used] = np.arange(len(used))
    out_faces = remap[out_faces]
    out_verts = pos[used]
    out_colors = (vcol[used].clip(0, 255).astype(np.uint8)
                  if vcol is not None else None)
    if len(out_faces) > target_triangles:
        # Heap exhausted above target (all remaining collapses would flip
        # a face): fall back to clustering for the remainder.
        return decimate_vertex_clustering(
            out_verts, out_faces, out_colors, target_triangles)
    return out_verts, out_faces, out_colors


def decimate_mode(mode: str | None = None) -> str:
    """The single resolver for the active decimator ("qem" | "cluster").

    Every consumer of PT_DECIMATE (decimate() itself, the model .npz cache
    key, the hires-zoo cache filename tag) must go through this so an
    unset-env run and an explicit PT_DECIMATE=qem run hash identically and
    never serve each other the wrong geometry."""
    return mode or os.environ.get("PT_DECIMATE", "qem")


def decimate(
    verts: np.ndarray,
    faces: np.ndarray,
    colors: np.ndarray | None,
    target_triangles: int,
    mode: str | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray | None]:
    """Decimation dispatcher: mode = "qem" (default) | "cluster" (env
    override PT_DECIMATE).

    QEM became the default in round 3: 20-45x lower surface error at
    equal triangle budgets on the hires zoo (0.02/0.05/0.10 mm mean at
    1024/512/256 vs clustering's 0.90/1.57/2.20 mm), no paired AUC
    regression (+0.55 [-4.6, +6.4] n.s., 30-scene hires zoo), and the
    native implementation (pt_decimate_qem) costs ~20 ms/model."""
    mode = decimate_mode(mode)
    if mode == "qem":
        if len(faces) > target_triangles:
            try:
                from perception_tpu.native.loader import decimate_qem_native
                return decimate_qem_native(verts, faces, colors,
                                           target_triangles)
            except (RuntimeError, ImportError, OSError):
                pass   # no toolchain / stale .so: Python implementation
        return decimate_qem(verts, faces, colors, target_triangles)
    return decimate_vertex_clustering(verts, faces, colors, target_triangles)


# --------------------------------------------------------------------------
# Footprint / radii helpers
# --------------------------------------------------------------------------

def convex_hull_2d(points: np.ndarray) -> np.ndarray:
    """Monotone-chain convex hull of 2D points, CCW, no repeated endpoint."""
    pts = np.unique(points[:, :2], axis=0)
    if len(pts) <= 2:
        return pts
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    pts = pts[order]

    def cross2(a, b):
        return a[0] * b[1] - a[1] * b[0]

    def half(iterable):
        hull: list[np.ndarray] = []
        for p in iterable:
            while len(hull) >= 2 and cross2(hull[-1] - hull[-2], p - hull[-2]) <= 0:
                hull.pop()
            hull.append(p)
        return hull

    lower = half(pts)
    upper = half(pts[::-1])
    return np.asarray(lower[:-1] + upper[:-1])


def points_in_convex_poly(points: np.ndarray, hull: np.ndarray) -> np.ndarray:
    """Vectorised point-in-convex-polygon (CCW hull)."""
    if len(hull) < 3:
        return np.zeros(len(points), dtype=bool)
    a = hull
    b = np.roll(hull, -1, axis=0)
    # cross((b-a), (p-a)) >= 0 for all edges.
    edge = b - a  # [E,2]
    rel = points[:, None, :2] - a[None, :, :]  # [P,E,2]
    cross = edge[None, :, 0] * rel[:, :, 1] - edge[None, :, 1] * rel[:, :, 0]
    return (cross >= -1e-12).all(axis=1)


# --------------------------------------------------------------------------
# MeshModel / ModelBank
# --------------------------------------------------------------------------

@dataclasses.dataclass
class MeshModel:
    """One preprocessed object model as a flat triangle soup (metres).

    Replaces reference `ObjectModel` + `cuda_renderer::Model` (triangle
    vectors, bbox, radii, convex footprint).
    """

    name: str
    tri_verts: np.ndarray          # [T, 3, 3] float32, model frame
    tri_colors: np.ndarray         # [T, 3] uint8 (per-face color)
    preprocessing_transform: np.ndarray  # [4, 4]
    symmetric: bool = False
    symmetry_mode: int = 0         # 0 none, 1 semi (pi), 2 full yaw symmetry
    full_tri_verts: np.ndarray | None = None  # pre-decimation (for metrics)
    search_resolution: float = 0.0
    num_original_triangles: int = 0
    backface_cullable: bool = False   # watertight + consistently wound

    @property
    def num_triangles(self) -> int:
        return len(self.tri_verts)

    @property
    def bounds(self) -> tuple[np.ndarray, np.ndarray]:
        v = self.tri_verts.reshape(-1, 3)
        return v.min(axis=0), v.max(axis=0)

    # Radii follow object_model.cpp:460-470 (bbox-derived).
    @property
    def inscribed_radius(self) -> float:
        vmin, vmax = self.bounds
        return float(min(vmax[0] - vmin[0], vmax[1] - vmin[1]) / 2.0)

    @property
    def circumscribed_radius(self) -> float:
        vmin, vmax = self.bounds
        return float(max(vmax[0] - vmin[0], vmax[1] - vmin[1]) / 2.0)

    @property
    def circumscribed_radius_3d(self) -> float:
        vmin, vmax = self.bounds
        return float(max(vmax - vmin) / 2.0)

    @property
    def inflation_factor(self) -> float:
        r = self.inscribed_radius
        if r < 1e-5:
            return 1.0
        return 1.0 + MESH_ADDITIVE_INFLATION / r

    def footprint_hull(self) -> np.ndarray:
        return convex_hull_2d(self.tri_verts.reshape(-1, 3)[:, :2])

    def sample_surface_points(self, max_points: int = 4096) -> np.ndarray:
        """Vertices of the (undecimated) mesh, subsampled — for ADD/ADD-S."""
        src = self.full_tri_verts if self.full_tri_verts is not None else self.tri_verts
        pts = np.unique(src.reshape(-1, 3), axis=0)
        if len(pts) > max_points:
            step = int(np.ceil(len(pts) / max_points))
            pts = pts[::step]
        return pts.astype(np.float32)

    def points_inside(self, points: np.ndarray,
                      transform: np.ndarray | None = None,
                      inflation: float = 1.0) -> np.ndarray:
        """Boolean mask of points enclosed by the mesh surface.

        Replaces `ObjectModel::PointsInsideMesh` (object_model.cpp — VTK
        vtkSelectEnclosedPoints) with a vectorised +z ray-crossing parity
        test against the (optionally transformed) triangle soup. Exact for
        closed meshes; an open mesh (backface_cullable False) gives the
        parity of crossings through whatever surface exists, like the VTK
        filter it replaces.

        points [P, 3] in model frame, or in the target frame of the given
        [4, 4] model->target transform. inflation > 1 scales the mesh
        about the transform origin (the reference multiplies the rotation
        block by inflation_factor_, object_model.cpp:528-531, so
        boundary/sensor-quantised surface points still test inside).
        """
        tv = self.tri_verts.astype(np.float64) * inflation  # [T, 3, 3]
        if transform is not None:
            tv = tv @ np.asarray(transform)[:3, :3].T + transform[:3, 3]
        p = np.asarray(points, np.float64).copy()       # [P, 3]
        # Deterministic sub-micron ray jitter: a ray through a shared
        # triangle edge would hit both incident triangles and flip the
        # crossing parity (e.g. the quad diagonal of a box face).
        p[:, 0] += 1.172e-7
        p[:, 1] += 2.387e-7

        a, b, c = tv[:, 0], tv[:, 1], tv[:, 2]          # [T, 3]
        # 2D (x, y) barycentric containment, broadcast [P, T].
        d = ((b[:, 1] - c[:, 1]) * (a[:, 0] - c[:, 0])
             + (c[:, 0] - b[:, 0]) * (a[:, 1] - c[:, 1]))
        safe = np.where(np.abs(d) > 1e-15, d, 1.0)
        px = p[:, 0:1] - c[None, :, 0]                  # [P, T]
        py = p[:, 1:2] - c[None, :, 1]
        l1 = ((b[:, 1] - c[:, 1]) * px + (c[:, 0] - b[:, 0]) * py) / safe
        l2 = ((c[:, 1] - a[:, 1]) * px + (a[:, 0] - c[:, 0]) * py) / safe
        l3 = 1.0 - l1 - l2
        hit = ((np.abs(d) > 1e-15)
               & (l1 >= 0) & (l2 >= 0) & (l3 >= 0))
        z_int = (l1 * a[:, 2] + l2 * b[:, 2] + l3 * c[:, 2])
        above = z_int > p[:, 2:3]
        crossings = (hit & above).sum(axis=1)
        return (crossings % 2).astype(bool)

    def points_inside_footprint(self, points_xy: np.ndarray,
                                yaw_cos_sin: tuple[float, float] = (1.0, 0.0),
                                xy: tuple[float, float] = (0.0, 0.0),
                                ) -> np.ndarray:
        """Boolean mask of 2D points inside the (posed) convex footprint
        hull (`ObjectModel::PointsInsideFootprint`)."""
        hull = self.footprint_hull()
        cy, sy = yaw_cos_sin
        rot = np.array([[cy, -sy], [sy, cy]])
        hull = hull @ rot.T + np.asarray(xy)
        p = np.asarray(points_xy, np.float64)
        # Inside a convex CCW polygon iff left of (or on) every edge.
        nxt = np.roll(hull, -1, axis=0)
        edge = nxt - hull                               # [E, 2]
        rel = p[:, None, :] - hull[None, :, :]          # [P, E, 2]
        cross = edge[:, 0] * rel[..., 1] - edge[:, 1] * rel[..., 0]
        # Hull orientation may be CW or CCW: accept a consistent sign.
        return (cross >= -1e-12).all(axis=1) | (cross <= 1e-12).all(axis=1)


def load_model(
    path: str,
    name: str | None = None,
    mesh_in_mm: bool = False,
    scaling_factor: float = 0.001,
    flipped: bool = False,
    use_external_pose_list: bool = False,
    target_triangles: int = 1024,
    symmetric: bool = False,
    symmetry_mode: int = 0,
) -> MeshModel:
    verts, faces, colors = read_mesh(path)
    verts, pre_transform = preprocess_model(
        verts, mesh_in_mm, scaling_factor, flipped, use_external_pose_list)
    num_original = len(faces)
    full_tris = verts[faces].astype(np.float32)
    dverts, dfaces, dcolors = decimate(
        verts, faces, colors, target_triangles)
    cullable, dfaces = analyze_winding(dverts, dfaces)
    tri_verts = dverts[dfaces].astype(np.float32)
    if dcolors is not None:
        tri_colors = dcolors[dfaces].astype(np.float32).mean(axis=1).astype(np.uint8)
    else:
        tri_colors = np.full((len(dfaces), 3), 128, dtype=np.uint8)
    return MeshModel(
        name=name or path,
        tri_verts=tri_verts,
        tri_colors=tri_colors,
        preprocessing_transform=pre_transform,
        symmetric=symmetric,
        symmetry_mode=symmetry_mode,
        full_tri_verts=full_tris,
        num_original_triangles=num_original,
        backface_cullable=cullable,
    )


def mesh_model_from_arrays(
    name: str,
    verts: np.ndarray,
    faces: np.ndarray,
    colors: np.ndarray | None = None,
    symmetric: bool = False,
    symmetry_mode: int = 0,
    target_triangles: int | None = None,
    **preprocess_kwargs,
) -> MeshModel:
    """Build a MeshModel from in-memory arrays (tests / synthetic scenes).

    target_triangles decimates like the file-load path does (keeping the
    undecimated triangles as full_tri_verts for ADD/ADD-S metrics) —
    needed for high-resolution procedural models (zoo resolution>1)."""
    verts, pre_transform = preprocess_model(np.asarray(verts, np.float64),
                                            **preprocess_kwargs)
    faces = np.asarray(faces, np.int64)
    num_original = len(faces)
    full_tris = verts[faces].astype(np.float32)
    vcolors = (np.asarray(colors, np.float64) if colors is not None
               else None)
    if target_triangles is not None and len(faces) > target_triangles:
        verts, faces, vcolors = decimate(
            verts, faces, vcolors, target_triangles)
    cullable, faces = analyze_winding(verts, faces)
    tri_verts = verts[faces].astype(np.float32)
    if vcolors is not None:
        tri_colors = vcolors[faces].mean(axis=1).clip(0, 255).astype(np.uint8)
    else:
        tri_colors = np.full((len(faces), 3), 128, dtype=np.uint8)
    return MeshModel(name=name, tri_verts=tri_verts, tri_colors=tri_colors,
                     preprocessing_transform=pre_transform,
                     symmetric=symmetric, symmetry_mode=symmetry_mode,
                     full_tri_verts=full_tris,
                     num_original_triangles=num_original,
                     backface_cullable=cullable)


def analyze_winding(verts: np.ndarray, faces: np.ndarray) -> tuple[bool, np.ndarray]:
    """(watertight_and_consistent, faces_oriented_outward).

    A mesh qualifies for exact backface culling iff it is closed with
    consistent winding: every directed edge appears exactly once and its
    reverse exactly once. If consistent but wound inward (majority of face
    normals point at the centroid), the returned faces are flipped to
    outward orientation.
    """
    faces = np.asarray(faces, np.int64)
    if len(faces) == 0:
        return False, faces
    edges = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]],
                            faces[:, [2, 0]]], axis=0)
    keys = edges[:, 0] * (verts.shape[0] + 1) + edges[:, 1]
    uniq, counts = np.unique(keys, return_counts=True)
    if (counts != 1).any():
        return False, faces
    rev = edges[:, 1] * (verts.shape[0] + 1) + edges[:, 0]
    if not np.isin(rev, uniq).all():
        return False, faces
    # Orientation: majority of normals should point away from the centroid.
    tri = verts[faces]
    normals = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    outward = ((tri.mean(axis=1) - verts.mean(axis=0)) * normals).sum(axis=1)
    if np.sign(outward).sum() < 0:
        faces = faces[:, [0, 2, 1]]
    return True, faces


def _morton_order(centroids: np.ndarray, bits: int = 10) -> np.ndarray:
    """Z-order sort of 3D points (interleaved quantised coordinates)."""
    if len(centroids) == 0:
        return np.arange(0)
    lo = centroids.min(axis=0)
    span = np.maximum(centroids.max(axis=0) - lo, 1e-12)
    q = np.minimum(((centroids - lo) / span * (2**bits - 1)).astype(np.uint64),
                   2**bits - 1)
    code = np.zeros(len(centroids), dtype=np.uint64)
    for b in range(bits):
        for d in range(3):
            code |= ((q[:, d] >> b) & 1) << np.uint64(3 * b + d)
    return np.argsort(code, kind="stable")


@dataclasses.dataclass
class ModelBank:
    """All scene models stacked into padded arrays for one-tensor dispatch.

    Replaces the reference's concatenated triangle vector + per-model count
    ranges (search_env.cpp LoadObjFiles -> tris / tris_model_count; the
    rasteriser selects a model's range via exclusive/inclusive scans,
    image_renderer.cuh:371-380). Padding with degenerate triangles keeps
    shapes static; degenerate triangles never cover a sample point.
    """

    models: list[MeshModel]
    tri_verts: np.ndarray   # [M, T_cap, 3, 3] float32
    tri_colors: np.ndarray  # [M, T_cap, 3] float32 (0..255)
    tri_valid: np.ndarray   # [M, T_cap] bool
    backface_cull: np.ndarray  # [M] bool (watertight, outward-wound)

    @classmethod
    def from_models(cls, models: list[MeshModel], t_cap: int | None = None) -> "ModelBank":
        if t_cap is None:
            t_cap = max(m.num_triangles for m in models)
        # The rasterisers pack (depth << TRI_ID_BITS | tri_id) into one int32
        # key; a triangle id >= MAX_TRIS would silently corrupt the depth
        # bits in all three backends.
        from perception_tpu.ops.rasterizer import MAX_TRIS
        if t_cap > MAX_TRIS:
            raise ValueError(
                f"t_cap={t_cap} exceeds the rasterizer's packed-key triangle "
                f"capacity MAX_TRIS={MAX_TRIS}; decimate models harder "
                "(target_triangles) or lower max_triangles_per_model")
        m_count = len(models)
        tri_verts = np.zeros((m_count, t_cap, 3, 3), dtype=np.float32)
        tri_colors = np.zeros((m_count, t_cap, 3), dtype=np.float32)
        tri_valid = np.zeros((m_count, t_cap), dtype=bool)
        backface_cull = np.asarray(
            [m.backface_cullable for m in models], dtype=bool)
        for i, m in enumerate(models):
            t = min(m.num_triangles, t_cap)
            if m.num_triangles > t_cap:
                raise ValueError(
                    f"model {m.name} has {m.num_triangles} triangles > cap {t_cap}; "
                    "raise t_cap or lower target_triangles at load time")
            # Spatially sort triangles (morton order over centroids): gives
            # triangle *chunks* tight screen bounding boxes, which the
            # rasteriser's chunk-culling exploits.
            order = _morton_order(m.tri_verts[:t].mean(axis=1))
            tri_verts[i, :t] = m.tri_verts[:t][order]
            tri_colors[i, :t] = m.tri_colors[:t][order]
            tri_valid[i, :t] = True
        return cls(models=models, tri_verts=tri_verts, tri_colors=tri_colors,
                   tri_valid=tri_valid, backface_cull=backface_cull)

    def decimated(self, target_triangles: int) -> "ModelBank":
        """Render-LOD bank: every model re-decimated to <= target_triangles.

        TPU-native optimisation with no reference analogue: the reference
        rasterises full-resolution meshes at full image resolution and
        strides only at cloud extraction, but this framework rasterises the
        strided SAMPLE GRID directly — at stride 8 a YCB-scale model's
        triangles are sub-sample-size, so a resolution-matched decimation
        renders the same sampled surface for a fraction of the
        (triangle x pixel) coverage work. Accuracy-priced on the paired
        zoo harness before being defaulted (see ARCHITECTURE.md).
        """
        lod_models = []
        for m in self.models:
            tri = m.tri_verts[:m.num_triangles].astype(np.float64)
            soup = tri.reshape(-1, 3)
            verts, inv = np.unique(soup.round(decimals=7), axis=0,
                                   return_inverse=True)
            faces = inv.reshape(-1, 3)
            vcol = np.full((len(verts), 3), 128.0)
            for c in range(3):
                vcol[faces[:, c]] = m.tri_colors[:m.num_triangles]
            dverts, dfaces, dcol = decimate(
                verts, faces, vcol, target_triangles)
            cullable, dfaces = analyze_winding(dverts, dfaces)
            tri_verts = dverts[dfaces].astype(np.float32)
            tri_colors = (dcol[dfaces].mean(axis=1)
                          if dcol is not None
                          else np.full((len(dfaces), 3), 128.0))
            lod_models.append(dataclasses.replace(
                m, tri_verts=tri_verts,
                tri_colors=tri_colors.astype(np.uint8),
                backface_cullable=bool(cullable and m.backface_cullable)))
        return ModelBank.from_models(lod_models, t_cap=target_triangles)

    @property
    def names(self) -> list[str]:
        return [m.name for m in self.models]

    def index_of(self, name: str) -> int:
        """Model index by name. `name#k` instance-suffixed names (the
        same-shape/crate multi-instance convention, reference
        run_sameshape_gpu) resolve to the base model."""
        names = self.names
        if name in names:
            return names.index(name)
        return names.index(name.split("#", 1)[0])

    def surface_samples(self, k: int = 256) -> tuple[np.ndarray, np.ndarray]:
        """Deterministic area-weighted surface samples [M, k, 3] with face
        normals [M, k, 3] (outward for winding-consistent models, see
        `backface_cull`; arbitrary sign otherwise).

        Used by the render-free ICP source mode (ScorerConfig.icp_source=
        "model"): the pre-ICP render exists in the reference only to produce
        a self-occlusion-aware source cloud (renderer.cu:1740-1817 renders,
        clouds, then feeds GICP); for mostly-convex objects the front-facing
        hemisphere test n . p < 0 is an adequate visibility proxy and skips
        an entire render pass.
        """
        m_count, t_cap = self.tri_valid.shape
        pts = np.zeros((m_count, k, 3), np.float32)
        nrm = np.zeros((m_count, k, 3), np.float32)
        for i in range(m_count):
            tv = self.tri_verts[i][self.tri_valid[i]]     # [t, 3, 3]
            cross = np.cross(tv[:, 1] - tv[:, 0], tv[:, 2] - tv[:, 0])
            area = 0.5 * np.linalg.norm(cross, axis=1)
            n = cross / np.maximum(np.linalg.norm(cross, axis=1,
                                                  keepdims=True), 1e-12)
            cum = np.cumsum(area)
            total = max(cum[-1], 1e-12)
            # Stratified area-weighted triangle picks with deterministic
            # low-discrepancy (R2 sequence) barycentric jitter — centroids
            # alone collapse to num_triangles distinct points on low-poly
            # meshes.
            ticks = (np.arange(k) + 0.5) / k * total
            sel = np.searchsorted(cum, ticks).clip(0, len(tv) - 1)
            j = np.arange(k)
            u = np.mod(j * 0.7548776662466927, 1.0)
            v = np.mod(j * 0.5698402909980532, 1.0)
            over = u + v > 1.0
            u[over], v[over] = 1.0 - u[over], 1.0 - v[over]
            t = tv[sel]
            pts[i] = (t[:, 0] * (1 - u - v)[:, None] + t[:, 1] * u[:, None]
                      + t[:, 2] * v[:, None])
            nrm[i] = n[sel]
        return pts, nrm

"""Unit tests for core geometry/mesh (mirrors reference states_test.cpp scope)."""

import numpy as np
import pytest

from perception_tpu.core import mesh as mesh_lib
from perception_tpu.core.config import CameraIntrinsics
from perception_tpu.core.pose import (
    CAM_TO_BODY,
    ContPose,
    euler_xyz_to_matrix,
    matrix_to_quat,
    quat_to_matrix,
    world_to_optical_cam,
)


def test_quat_matrix_roundtrip(rng):
    for _ in range(20):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        rot = quat_to_matrix(*q)
        assert np.allclose(rot @ rot.T, np.eye(3), atol=1e-9)
        q2 = np.array(matrix_to_quat(rot))
        # Same rotation up to sign.
        assert np.allclose(quat_to_matrix(*q2), rot, atol=1e-9)


def test_euler_convention_matches_eigen():
    # yaw about z by 90deg maps x->y.
    rot = euler_xyz_to_matrix(0, 0, np.pi / 2)
    assert np.allclose(rot @ [1, 0, 0], [0, 1, 0], atol=1e-12)
    # Composition order: R = Rz @ Ry @ Rx.
    r = euler_xyz_to_matrix(0.3, -0.2, 0.7)
    expected = (euler_xyz_to_matrix(0, 0, 0.7)
                @ euler_xyz_to_matrix(0, -0.2, 0)
                @ euler_xyz_to_matrix(0.3, 0, 0))
    assert np.allclose(r, expected, atol=1e-12)


def test_cont_pose_euler_vs_quat():
    p_euler = ContPose.from_euler(0.1, 0.2, 0.3, 0.0, 0.0, np.pi / 3)
    q = matrix_to_quat(p_euler.rotation())
    p_quat = ContPose.from_quat(0.1, 0.2, 0.3, *q)
    assert np.allclose(p_euler.transform(), p_quat.transform(), atol=1e-9)
    assert p_euler.uses_euler and not p_quat.uses_euler


def test_cam_to_body_frame():
    # Optical frame: +z forward = body +x; +x right = body -y.
    assert np.allclose(CAM_TO_BODY[:3, :3] @ [0, 0, 1], [1, 0, 0])
    cam_to_world = np.eye(4)
    w2c = world_to_optical_cam(cam_to_world)
    pt_world = np.array([2.0, 0.0, 0.0, 1.0])  # 2m in front of camera body-x
    pt_cam = w2c @ pt_world
    assert np.allclose(pt_cam[:3], [0, 0, 2])


def test_projection_matches_pinhole():
    cam = CameraIntrinsics(fx=500.0, fy=480.0, cx=320.0, cy=240.0,
                           width=640, height=480)
    proj = cam.projection()
    # A camera-frame point projected through the reference's matrix+viewport
    # pipeline must land at the pinhole location (with their y-flip dance).
    pt = np.array([0.1, -0.05, 1.5])
    z = pt[2]
    clip = proj[:3, :3] @ pt + proj[:3, 3]
    sx = clip[0] / z * cam.width / 2 + cam.width / 2
    sy = clip[1] / z * cam.height / 2 + cam.height / 2
    x_img = sx
    y_img = cam.height - 1 - sy
    assert np.isclose(x_img, cam.fx * pt[0] / z + cam.cx, atol=1e-4)
    assert np.isclose(y_img, cam.fy * pt[1] / z + cam.cy - 1.0, atol=1e-4)


def make_box(w=0.06, d=0.08, h=0.1):
    """Axis-aligned box mesh centred in x/y, base at z=0."""
    x, y = w / 2, d / 2
    verts = np.array([
        [-x, -y, 0], [x, -y, 0], [x, y, 0], [-x, y, 0],
        [-x, -y, h], [x, -y, h], [x, y, h], [-x, y, h],
    ])
    faces = np.array([
        [0, 2, 1], [0, 3, 2],      # bottom
        [4, 5, 6], [4, 6, 7],      # top
        [0, 1, 5], [0, 5, 4],      # front
        [2, 3, 7], [2, 7, 6],      # back
        [1, 2, 6], [1, 6, 5],      # right
        [3, 0, 4], [3, 4, 7],      # left
    ])
    return verts, faces


def test_preprocess_model_3dof():
    verts, _ = make_box()
    shifted = verts + [0.5, -0.2, 0.3]
    new_verts, transform = mesh_lib.preprocess_model(shifted)
    # x/y centroid at origin, min z at 0.
    assert np.allclose(new_verts[:, :2].mean(axis=0), 0, atol=1e-12)
    assert np.isclose(new_verts[:, 2].min(), 0, atol=1e-12)
    # Transform reproduces the mapping.
    hom = np.concatenate([shifted, np.ones((len(shifted), 1))], axis=1)
    assert np.allclose((transform @ hom.T).T[:, :3], new_verts, atol=1e-12)


def test_preprocess_model_6dof_mm():
    verts, _ = make_box()
    mm_verts = verts * 1000.0 + [100.0, 0, 0]
    new_verts, transform = mesh_lib.preprocess_model(
        mm_verts, mesh_in_mm=True, scaling_factor=0.001,
        use_external_pose_list=True)
    assert np.allclose(new_verts.mean(axis=0), 0, atol=1e-9)
    # Scale recovered: box height 0.1m.
    assert np.isclose(np.ptp(new_verts[:, 2]), 0.1, atol=1e-9)
    hom = np.concatenate([mm_verts, np.ones((len(mm_verts), 1))], axis=1)
    assert np.allclose((transform @ hom.T).T[:, :3], new_verts, atol=1e-9)


def test_preprocess_model_flip_matches_reference():
    # The reference computes the 6-DoF z-shift from the PRE-flip centroid
    # (object_model.cpp:62-82: compute3DCentroid runs before the flip) —
    # preserved verbatim for output-contract parity.
    verts, _ = make_box()
    new_verts, transform = mesh_lib.preprocess_model(
        verts, flipped=True, use_external_pose_list=True)
    assert np.isclose(new_verts[:, 2].mean(), -0.1, atol=1e-12)
    hom = np.concatenate([verts, np.ones((len(verts), 1))], axis=1)
    assert np.allclose((transform @ hom.T).T[:, :3], new_verts, atol=1e-12)


def test_mesh_model_radii():
    verts, faces = make_box(w=0.06, d=0.08, h=0.1)
    model = mesh_lib.mesh_model_from_arrays("box", verts, faces)
    assert np.isclose(model.inscribed_radius, 0.03)
    assert np.isclose(model.circumscribed_radius, 0.04)
    assert np.isclose(model.circumscribed_radius_3d, 0.05)
    assert model.inflation_factor > 1.0


def test_decimation_reduces_and_preserves_bbox(rng):
    # Dense random sphere-ish mesh.
    n = 2000
    pts = rng.normal(size=(n, 3))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    # Triangulate arbitrarily into many faces.
    faces = rng.integers(0, n, size=(6000, 3))
    faces = faces[(faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2])
                  & (faces[:, 0] != faces[:, 2])]
    dv, df, _ = mesh_lib.decimate_vertex_clustering(pts, faces, None, 1024)
    assert len(df) <= 1024
    assert np.allclose(np.abs(dv).max(), 1.0, atol=0.2)


def _icosphere(subdiv=3, radius=0.05):
    t = (1 + 5 ** 0.5) / 2
    v = np.array([[-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
                  [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
                  [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1]], float)
    f = np.array([[0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
                  [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
                  [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
                  [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]])
    for _ in range(subdiv):
        mids, verts, out = {}, list(v), []

        def mid(a, b):
            k = (min(a, b), max(a, b))
            if k not in mids:
                mids[k] = len(verts)
                verts.append((verts[a] + verts[b]) / 2)
            return mids[k]

        for (a, b, c) in f:
            ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
            out += [[a, ab, ca], [ab, b, bc], [ca, bc, c], [ab, bc, ca]]
        v, f = np.asarray(verts, float), np.asarray(out)
    v = v / np.linalg.norm(v, axis=1, keepdims=True) * radius
    return v, f


def test_decimate_qem_budget_fidelity_watertight():
    """QEM hits the face budget, keeps the surface far closer than
    clustering at the same budget, and preserves watertightness."""
    v, f = _icosphere(3)          # 1280 faces on a 5 cm sphere
    colors = np.tile([200, 30, 30], (len(v), 1)).astype(float)
    qv, qf, qc = mesh_lib.decimate_qem(v, f, colors, 256)
    assert len(qf) <= 256
    assert qc.shape == (len(qv), 3) and qc.dtype == np.uint8
    cv, cf, _ = mesh_lib.decimate_vertex_clustering(v, f, colors, 256)
    # Radial error of surviving vertices against the true sphere. (A
    # weak lower bound on the fidelity gap: QEM's optimal points sit
    # deliberately slightly off-sphere to minimise plane distance; the
    # surface-sampled error gap measured on the hires zoo is ~20-45x,
    # see ARCHITECTURE.md.)
    q_err = np.abs(np.linalg.norm(qv, axis=1) - 0.05).mean()
    c_err = np.abs(np.linalg.norm(cv, axis=1) - 0.05).mean()
    assert q_err < c_err and q_err < 1e-3
    # Closed input stays closed and outward-consistent.
    cullable, _ = mesh_lib.analyze_winding(qv, qf)
    assert cullable


def test_decimate_qem_preserves_open_boundary():
    """Boundary constraint quadrics hold an open rim in place (mug/bowl
    rims must not shrink inward)."""
    ang = np.linspace(0, 2 * np.pi, 64, endpoint=False)
    rows = []
    for z in np.linspace(0, 0.08, 9):
        rows.append(np.c_[0.04 * np.cos(ang), 0.04 * np.sin(ang),
                          np.full(64, z)])
    v = np.vstack(rows)
    f = []
    for i in range(8):
        a0, b0 = i * 64, (i + 1) * 64
        for j in range(64):
            jn = (j + 1) % 64
            f += [[a0 + j, a0 + jn, b0 + j], [a0 + jn, b0 + jn, b0 + j]]
    f = np.asarray(f)                        # open cylinder, 1024 faces
    qv, qf, _ = mesh_lib.decimate_qem(v, f, None, 256)
    assert len(qf) <= 256
    # All surviving vertices stay on the r=0.04 shell (no rim collapse).
    r = np.linalg.norm(qv[:, :2], axis=1)
    assert np.abs(r - 0.04).max() < 2e-3
    zr = qv[:, 2]
    assert zr.min() > -1e-6 and zr.max() < 0.08 + 1e-6


def test_decimate_qem_inconsistent_winding():
    """Closed meshes with inconsistent winding (e.g. scipy ConvexHull
    simplices) must not be treated as all-boundary: the round-3 shrink
    bug pulled a 6 cm sphere hull to 4.4 cm mean radius under bogus
    rim constraints."""
    rng = np.random.default_rng(3)
    pts = rng.normal(size=(400, 3))
    pts = 0.06 * pts / np.linalg.norm(pts, axis=1, keepdims=True)
    from scipy.spatial import ConvexHull

    faces = ConvexHull(pts).simplices          # inconsistent winding
    cullable, _ = mesh_lib.analyze_winding(pts, faces)
    assert not cullable                        # the premise of this test
    qv, qf, _ = mesh_lib.decimate_qem(pts, faces, None, 199)
    r = np.linalg.norm(qv, axis=1)
    assert len(qf) <= 199
    assert abs(r.mean() - 0.06) < 2e-3 and r.min() > 0.055


def test_decimate_dispatcher_env(monkeypatch):
    v, f = _icosphere(2)                     # 320 faces
    monkeypatch.setenv("PT_DECIMATE", "qem")
    qv, qf, _ = mesh_lib.decimate(v, f, None, 80)
    monkeypatch.setenv("PT_DECIMATE", "cluster")
    cv, cf, _ = mesh_lib.decimate(v, f, None, 80)
    assert len(qf) <= 80 and len(cf) <= 80
    q_err = np.abs(np.linalg.norm(qv, axis=1) - 0.05).mean()
    c_err = np.abs(np.linalg.norm(cv, axis=1) - 0.05).mean()
    assert q_err < c_err


def test_ply_roundtrip(tmp_path):
    verts, faces = make_box()
    colors = np.tile([200, 100, 50], (len(verts), 1)).astype(np.uint8)
    # Write a binary_little_endian PLY by hand.
    path = tmp_path / "box.ply"
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {len(verts)}\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property uchar red\nproperty uchar green\nproperty uchar blue\n"
        f"element face {len(faces)}\n"
        "property list uchar int vertex_indices\nend_header\n"
    ).encode()
    body = b""
    for v, c in zip(verts, colors):
        body += np.asarray(v, "<f4").tobytes() + np.asarray(c, "u1").tobytes()
    for f in faces:
        body += np.uint8(3).tobytes() + np.asarray(f, "<i4").tobytes()
    path.write_bytes(header + body)

    rv, rf, rc = mesh_lib.read_ply(str(path))
    assert np.allclose(rv, verts, atol=1e-6)
    assert np.array_equal(rf, faces)
    assert np.array_equal(rc, colors)


def test_convex_hull_and_point_in_poly():
    square = np.array([[0, 0], [1, 0], [1, 1], [0, 1], [0.5, 0.5]])
    hull = mesh_lib.convex_hull_2d(square)
    assert len(hull) == 4
    inside = mesh_lib.points_in_convex_poly(
        np.array([[0.5, 0.5], [1.5, 0.5]]), hull)
    assert inside.tolist() == [True, False]


def test_model_bank_padding():
    v1, f1 = make_box()
    v2, f2 = make_box(0.1, 0.1, 0.2)
    m1 = mesh_lib.mesh_model_from_arrays("a", v1, f1)
    m2 = mesh_lib.mesh_model_from_arrays("b", v2, f2[:6])
    bank = mesh_lib.ModelBank.from_models([m1, m2], t_cap=16)
    assert bank.tri_verts.shape == (2, 16, 3, 3)
    assert bank.tri_valid[0].sum() == 12
    assert bank.tri_valid[1].sum() == 6
    assert bank.index_of("b") == 1

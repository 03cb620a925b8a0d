"""Native C++ mesh loader: build, parity with the Python reader, speed."""

import time

import numpy as np
import pytest

from perception_tpu.core import mesh as mesh_lib
from perception_tpu.native.loader import load_mesh_native, native_available

from tests.test_core import make_box


pytestmark = pytest.mark.skipif(
    not native_available(), reason="no C++ toolchain / build failed")


def _write_binary_ply(path, verts, faces, colors=None):
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {len(verts)}\n"
        "property float x\nproperty float y\nproperty float z\n"
        + ("property uchar red\nproperty uchar green\nproperty uchar blue\n"
           if colors is not None else "")
        + f"element face {len(faces)}\n"
        "property list uchar int vertex_indices\nend_header\n").encode()
    body = b""
    for i, v in enumerate(verts):
        body += np.asarray(v, "<f4").tobytes()
        if colors is not None:
            body += np.asarray(colors[i], "u1").tobytes()
    for f in faces:
        body += np.uint8(3).tobytes() + np.asarray(f, "<i4").tobytes()
    path.write_bytes(header + body)


def test_native_matches_python_binary(tmp_path):
    verts, faces = make_box()
    colors = np.tile([17, 120, 250], (len(verts), 1)).astype(np.uint8)
    p = tmp_path / "box.ply"
    _write_binary_ply(p, verts, faces, colors)

    pv, pf, pc = mesh_lib.read_ply(str(p))
    nv, nf, nc = load_mesh_native(str(p))
    np.testing.assert_allclose(nv, pv, atol=1e-6)
    np.testing.assert_array_equal(nf, pf)
    np.testing.assert_array_equal(nc, pc)


def test_native_matches_python_ascii(tmp_path):
    from tests.test_search_e2e import _write_box_ply

    p = tmp_path / "box.ply"
    _write_box_ply(p, 0.1, 0.08, 0.12, (9, 8, 7))
    pv, pf, pc = mesh_lib.read_ply(str(p))
    nv, nf, nc = load_mesh_native(str(p))
    np.testing.assert_allclose(nv, pv, atol=1e-6)
    np.testing.assert_array_equal(nf, pf)
    np.testing.assert_array_equal(nc, pc)


def test_native_obj(tmp_path):
    p = tmp_path / "tri.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\nf 1 2 3 4\n")
    nv, nf, _ = load_mesh_native(str(p))
    assert nv.shape == (4, 3)
    assert nf.tolist() == [[0, 1, 2], [0, 2, 3]]  # fan triangulated


def test_native_decimation(tmp_path, rng):
    # Large random mesh: decimated to budget, bbox preserved.
    n = 3000
    pts = rng.normal(size=(n, 3)).astype(np.float64)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    faces = rng.integers(0, n, size=(9000, 3))
    faces = faces[(faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2])
                  & (faces[:, 0] != faces[:, 2])]
    p = tmp_path / "blob.ply"
    _write_binary_ply(p, pts.astype(np.float32), faces)
    nv, nf, _ = load_mesh_native(str(p), target_faces=1000)
    assert len(nf) <= 1000
    assert np.abs(nv).max() <= 1.01


def test_native_qem_matches_python_fidelity():
    """C++ QEM hits the face budget with the same surface fidelity class
    as the Python implementation (exact parity not required: tie-breaks
    in the collapse order may differ)."""
    from perception_tpu.core.mesh import decimate_qem
    from perception_tpu.native.loader import decimate_qem_native, qem_available

    if not qem_available():
        import pytest
        pytest.skip("native toolchain unavailable")
    from tests.test_core import _icosphere

    v, f = _icosphere(3)          # 1280 faces on a 5 cm sphere
    colors = np.tile([120, 200, 30], (len(v), 1)).astype(np.uint8)
    nv2, nf2, nc2 = decimate_qem_native(v, f, colors, 256)
    pv, pf, _ = decimate_qem(v, f, colors.astype(float), 256)
    assert len(nf2) <= 256 and len(pf) <= 256
    assert nc2.shape == (len(nv2), 3) and nc2.dtype == np.uint8
    n_err = np.abs(np.linalg.norm(nv2, axis=1) - 0.05).mean()
    p_err = np.abs(np.linalg.norm(pv, axis=1) - 0.05).mean()
    assert n_err < 1e-3 and abs(n_err - p_err) < 5e-4
    # Watertight input stays watertight.
    from perception_tpu.core.mesh import analyze_winding
    cullable, _ = analyze_winding(nv2, nf2)
    assert cullable


def test_native_speed_on_large_mesh(tmp_path, rng):
    n = 60000
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    faces = rng.integers(0, n, size=(120000, 3)).astype(np.int64)
    p = tmp_path / "big.ply"
    _write_binary_ply(p, pts, faces)
    t0 = time.perf_counter()
    nv, nf, _ = load_mesh_native(str(p))
    native_time = time.perf_counter() - t0
    assert len(nf) == 120000
    # The whole point: a 120k-face binary mesh loads in well under a second.
    assert native_time < 1.5, f"native load took {native_time}s"


def test_read_mesh_prefers_native(tmp_path, monkeypatch):
    verts, faces = make_box()
    p = tmp_path / "box.ply"
    _write_binary_ply(p, verts, faces)
    called = {}
    import perception_tpu.native.loader as nl

    real = nl.load_mesh_native

    def spy(path, target_faces=0):
        called["yes"] = True
        return real(path, target_faces)

    monkeypatch.setattr(nl, "load_mesh_native", spy)
    v, f, c = mesh_lib.read_mesh(str(p))
    assert called.get("yes")
    assert v.shape == (8, 3)

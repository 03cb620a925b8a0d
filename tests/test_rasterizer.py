"""Rasteriser numerical tests against the loop-based CPU oracle and analytic
expectations (the reference validates by eyeballing dumped images —
cuda_renderer/src/test.cpp; here we assert exact depth parity instead)."""

import numpy as np
import pytest

from perception_tpu.core.config import CameraIntrinsics
from perception_tpu.core.mesh import ModelBank, mesh_model_from_arrays
from perception_tpu.ops.rasterizer import render_oracle_numpy, render_pose_batch

from tests.test_core import make_box

CAM = CameraIntrinsics(fx=200.0, fy=200.0, cx=64.0, cy=48.0, width=128, height=96)


def pose_at(x=0.0, y=0.0, z=1.0, rot=None):
    m = np.eye(4, dtype=np.float32)
    if rot is not None:
        m[:3, :3] = rot
    m[:3, 3] = [x, y, z]
    return m


@pytest.fixture(scope="module")
def box_bank():
    verts, faces = make_box(w=0.2, d=0.2, h=0.2)
    model = mesh_model_from_arrays("box", verts, faces)
    return ModelBank.from_models([model], t_cap=16)


def _render(bank, poses, stride=1, **kw):
    proj = CAM.projection()
    out = render_pose_batch(
        bank.tri_verts, bank.tri_colors, bank.tri_valid,
        np.asarray(poses, np.float32),
        np.zeros(len(poses), np.int32),
        proj, width=CAM.width, height=CAM.height, stride=stride, tile=16, **kw)
    return out


def test_matches_oracle_frontal(box_bank):
    pose = pose_at(z=1.0)
    out = _render(box_bank, [pose])
    oracle = render_oracle_numpy(
        box_bank.models[0].tri_verts, pose, CAM.projection(), CAM.width, CAM.height)
    got = np.asarray(out.depth[0])
    assert got.shape == oracle.shape
    # Exact parity away from edges; allow a tiny number of boundary pixels to
    # differ by coverage tie-breaks.
    mismatch = got != oracle
    assert mismatch.mean() < 0.005, f"{mismatch.sum()} mismatched pixels"
    # Depth where covered: box front face at z=1.0m minus... box spans z in
    # [0, 0.2] model frame, posed at 1.0 -> nearest face at 100cm.
    assert got[got > 0].min() == 100


def test_matches_oracle_rotated(box_bank, rng):
    from perception_tpu.core.pose import euler_xyz_to_matrix
    for i in range(5):
        rot = euler_xyz_to_matrix(*rng.uniform(-1.5, 1.5, 3))
        pose = pose_at(x=rng.uniform(-0.1, 0.1), y=rng.uniform(-0.1, 0.1),
                       z=rng.uniform(0.8, 1.5), rot=rot)
        out = _render(box_bank, [pose])
        oracle = render_oracle_numpy(
            box_bank.models[0].tri_verts, pose, CAM.projection(),
            CAM.width, CAM.height)
        got = np.asarray(out.depth[0])
        mismatch = got != oracle
        assert mismatch.mean() < 0.01, f"pose {i}: {mismatch.sum()} mismatches"


def test_strided_equals_subsampled_full(box_bank):
    pose = pose_at(z=0.9)
    full = _render(box_bank, [pose], stride=1)
    strided = _render(box_bank, [pose], stride=4)
    sub = np.asarray(full.depth[0])[::4, ::4]
    assert np.array_equal(np.asarray(strided.depth[0]), sub)


def test_batch_poses_independent(box_bank):
    poses = [pose_at(z=1.0), pose_at(z=2.0), pose_at(x=0.3, z=1.0)]
    out = _render(box_bank, poses)
    d = np.asarray(out.depth)
    assert d[0][d[0] > 0].min() == 100
    assert d[1][d[1] > 0].min() == 200
    # Each equals its own single render.
    single = _render(box_bank, [poses[2]])
    assert np.array_equal(d[2], np.asarray(single.depth[0]))


def test_empty_behind_camera(box_bank):
    out = _render(box_bank, [pose_at(z=-1.0)])
    assert np.asarray(out.depth).max() == 0


def test_occlusion_source_occludes_render(box_bank):
    # Source depth closer than render everywhere -> rendered pixels removed.
    pose = pose_at(z=1.0)
    base = _render(box_bank, [pose])
    src = np.where(np.asarray(base.depth[0]) > 0, 50, 0).astype(np.int32)
    out = _render(box_bank, [pose], source_depth=src)
    assert np.asarray(out.depth).max() == 0       # all removed
    assert int(out.pose_occluded[0]) == 0


def test_occlusion_render_occludes_source(box_bank):
    # Source depth farther than render -> pixels kept. The pose flag is
    # only raised in tree mode; the reference's greedy build compiles it
    # out (USE_TREE 0, model.h:17).
    pose = pose_at(z=1.0)
    base = _render(box_bank, [pose])
    src = np.where(np.asarray(base.depth[0]) > 0, 500, 0).astype(np.int32)
    out = _render(box_bank, [pose], source_depth=src)
    assert np.array_equal(np.asarray(out.depth[0]), np.asarray(base.depth[0]))
    assert int(out.pose_occluded[0]) == 0        # greedy default: no flag
    out = _render(box_bank, [pose], source_depth=src, use_tree_occlusion=True)
    assert int(out.pose_occluded[0]) == 1


def test_occlusion_within_threshold_kept(box_bank):
    # Source == render depth -> no removal, no flag.
    pose = pose_at(z=1.0)
    base = _render(box_bank, [pose])
    src = np.asarray(base.depth[0]).astype(np.int32)
    out = _render(box_bank, [pose], source_depth=src, occlusion_threshold=1.0)
    assert np.array_equal(np.asarray(out.depth[0]), np.asarray(base.depth[0]))
    assert int(out.pose_occluded[0]) == 0


def test_occlusion_segmentation_label_exempt(box_bank):
    # With matching segmentation labels, even large depth differences are
    # exempt from occlusion handling (image_renderer.cuh:163-165).
    pose = pose_at(z=1.0)
    base = _render(box_bank, [pose])
    d0 = np.asarray(base.depth[0])
    src = np.where(d0 > 0, 50, 0).astype(np.int32)
    lab = np.where(d0 > 0, 3, 0).astype(np.int32)  # 1-based label 3
    out = _render(box_bank, [pose], source_depth=src, source_label=lab,
                  pose_labels=np.array([2], np.int32),
                  use_segmentation_label=True)
    assert np.array_equal(np.asarray(out.depth[0]), d0)
    # Mismatched label -> removed.
    out2 = _render(box_bank, [pose], source_depth=src, source_label=lab,
                   pose_labels=np.array([0], np.int32),
                   use_segmentation_label=True)
    assert np.asarray(out2.depth).max() == 0


def test_color_output(box_bank):
    verts, faces = make_box(w=0.2, d=0.2, h=0.2)
    colors = np.tile([10, 200, 30], (len(verts), 1))
    model = mesh_model_from_arrays("cbox", verts, faces, colors=colors)
    bank = ModelBank.from_models([model], t_cap=16)
    out = _render(bank, [pose_at(z=1.0)])
    covered = np.asarray(out.depth[0]) > 0
    rgb = np.asarray(out.color[0])
    assert np.allclose(rgb[covered], [10, 200, 30])
    assert np.allclose(rgb[~covered], 0)

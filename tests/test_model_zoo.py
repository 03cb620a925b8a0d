"""Evaluation model zoo: mesh integrity + 6-DoF RGB cost type."""

import numpy as np
import pytest

from perception_tpu.eval.model_zoo import build_zoo_models


@pytest.fixture(scope="module")
def zoo():
    return build_zoo_models(use_external_pose_list=True)


def test_zoo_builds_all(zoo):
    names = {m.name for m in zoo}
    assert names == {"mug", "bowl", "l_bracket", "elbow", "cracker_box",
                     "soup_can"}
    for m in zoo:
        assert m.num_triangles > 0
        v = m.tri_verts.reshape(-1, 3)
        assert np.isfinite(v).all()
        ext = v.max(axis=0) - v.min(axis=0)
        # Hand-held scale: 3 cm .. 25 cm extents.
        assert (ext > 0.02).all() and (ext < 0.26).all(), (m.name, ext)


def test_zoo_hires_decimated(tmp_path, monkeypatch):
    """resolution>1 + target_triangles: hires generation, decimation via
    the configured decimator, npz caching, metrics on the UNDECIMATED
    surface."""
    monkeypatch.setenv("HOME", str(tmp_path))   # fresh cache dir
    monkeypatch.setenv("PT_DECIMATE", "qem")
    models = build_zoo_models(["mug", "soup_can"], resolution=2.0,
                              target_triangles=256,
                              use_external_pose_list=True)
    for m in models:
        assert m.num_triangles <= 256
        assert m.num_original_triangles > 256          # genuinely hires
        assert len(m.full_tri_verts) == m.num_original_triangles
        ext = m.tri_verts.reshape(-1, 3).max(0) - \
            m.tri_verts.reshape(-1, 3).min(0)
        assert (ext > 0.02).all() and (ext < 0.26).all()
    # Second build hits the cache and reproduces the same arrays.
    again = build_zoo_models(["mug", "soup_can"], resolution=2.0,
                             target_triangles=256,
                             use_external_pose_list=True)
    for a, b in zip(models, again):
        np.testing.assert_array_equal(a.tri_verts, b.tri_verts)
        assert a.symmetric == b.symmetric


def test_zoo_nonconvex_and_textured(zoo):
    by_name = {m.name: m for m in zoo}
    # Closed shapes get exact backface culling; the open-top mug cannot.
    assert by_name["soup_can"].backface_cullable
    assert by_name["bowl"].backface_cullable
    assert not by_name["mug"].backface_cullable
    # Symmetry flags drive the ADD vs ADD-S metric choice.
    assert by_name["soup_can"].symmetric and by_name["bowl"].symmetric
    assert not by_name["mug"].symmetric
    # Textures: per-face colours must actually vary (CIEDE2000 signal).
    for name in ("mug", "cracker_box", "soup_can"):
        colors = by_name[name].tri_colors
        assert len(np.unique(colors, axis=0)) >= 3, name


def test_zoo_mug_is_nonconvex(zoo):
    """Concavity check: the mug interior lies inside the convex hull but
    outside the mesh surface (a hull-volume vs sampled test without VTK):
    hull volume must exceed 2x the 'solid' voxelised volume."""
    mug = next(m for m in zoo if m.name == "mug")
    from scipy.spatial import ConvexHull

    v = mug.tri_verts.reshape(-1, 3)
    hull = ConvexHull(v)
    # Mesh surface area-weighted thin-shell volume is far below hull volume
    # for an open mug; approximate mesh volume by divergence theorem.
    tv = mug.tri_verts.astype(np.float64)
    vol = np.abs(np.einsum("ij,ij->i", tv[:, 0],
                           np.cross(tv[:, 1], tv[:, 2])).sum() / 6.0)
    assert hull.volume > 1.5 * vol


def test_zoo_renders_with_occlusion():
    """A zoo scene renders; overlapping placements occlude."""
    from perception_tpu.core.config import CameraIntrinsics, EnvConfig, PerchConfig
    from perception_tpu.core.mesh import ModelBank
    from perception_tpu.core.pose import ContPose
    from perception_tpu.core.state import ObjectState
    from perception_tpu.pipeline.env import PerceptionEnv

    cam = CameraIntrinsics(fx=320.0, fy=320.0, cx=128.0, cy=96.0,
                           width=256, height=192)
    models = build_zoo_models(["mug", "cracker_box"],
                              use_external_pose_list=True)
    bank = ModelBank.from_models(models, t_cap=512)
    env = PerceptionEnv(
        bank, cam, PerchConfig(gpu_stride=4, gpu_batch_size=64),
        EnvConfig(width=cam.width, height=cam.height, max_labels=4,
                  max_points_per_label=1024, max_observed_points=4096))
    # Box in front, mug directly behind it along +x (the optical axis).
    states = [
        ObjectState(id=1, symmetric=False,
                    pose=ContPose.from_euler(0.55, 0.0, -0.05, 0, 0, 0),
                    segmentation_label_id=1),
        ObjectState(id=0, symmetric=False,
                    pose=ContPose.from_euler(0.75, 0.0, -0.02, 0, 0, 0.4),
                    segmentation_label_id=2),
    ]
    depth, color, label = env.render_composite(states)
    box_px = (label == 1).sum()
    mug_px = (label == 2).sum()
    assert box_px > 200
    assert mug_px > 0
    # Render the mug alone: it must have more pixels than in the composite
    # (i.e. the box occludes part of it).
    _, _, label_solo = env.render_composite([states[1]])
    solo_px = (label_solo > 0).sum()
    assert solo_px > mug_px


def test_cost_type_6dof_rgb_gates_on_color():
    import jax.numpy as jnp

    from perception_tpu.ops.cost import COST_TYPE_6DOF, COST_TYPE_6DOF_RGB, compute_costs

    # One pose, two rendered points, both within the distance threshold but
    # point 1's colour is wrong: 6-DoF counts both explained; 6-DoF RGB
    # counts one unexplained.
    dist = jnp.array([[1e-6, 1e-6]])
    idx = jnp.array([[0, 1]])
    valid = jnp.array([[True, True]])
    occ = jnp.array([0])
    rendered_rgb = jnp.array([[[255, 0, 0], [0, 255, 0]]], jnp.float32)
    observed_rgb = jnp.array([[[255, 0, 0], [200, 40, 255]]], jnp.float32)
    tot = jnp.array([2.0])
    kw = dict(sensor_resolution=0.01, color_distance_threshold=15.0)
    plain = compute_costs(dist, idx, valid, occ, rendered_rgb, observed_rgb,
                          tot, cost_type=COST_TYPE_6DOF, **kw)
    gated = compute_costs(dist, idx, valid, occ, rendered_rgb, observed_rgb,
                          tot, cost_type=COST_TYPE_6DOF_RGB, **kw)
    assert float(plain.rendered_cost[0]) == 0.0
    assert float(gated.rendered_cost[0]) == 50.0
    assert float(gated.observed_explained[0]) == 1.0

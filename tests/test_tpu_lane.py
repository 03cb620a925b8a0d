"""Opt-in real-TPU test lane: `PT_TPU_TESTS=1 pytest tests/test_tpu_lane.py`.

Runs the pallas kernels COMPILED on the real chip (everywhere else in the
suite they run in interpret mode under the forced-CPU conftest), plus one
GSPMD-sharded scorer dispatch, so compiled-kernel regressions surface in
tests rather than only in bench/verify runs. Skipped automatically unless
PT_TPU_TESTS=1 (see conftest.pytest_collection_modifyitems).
"""

import os

import numpy as np
import pytest

requires_tpu = pytest.mark.skipif(
    os.environ.get("PT_TPU_TESTS") != "1", reason="needs PT_TPU_TESTS=1")


@pytest.fixture(scope="module")
def tpu_backend():
    import jax

    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip(f"no TPU backend (got {jax.default_backend()})")
    return jax.default_backend()


@requires_tpu
def test_compiled_direct_raster_matches_xla(tpu_backend):
    import jax.numpy as jnp

    from perception_tpu.ops.rasterizer import render_pose_batch
    from tests.test_perf_kernels import CAM, _setup_two_models

    bank, poses, ids = _setup_two_models()
    proj = jnp.asarray(CAM.projection())
    kwargs = dict(width=CAM.width, height=CAM.height, stride=2, tile=16,
                  bank_backface=jnp.asarray(bank.backface_cull))
    ref = render_pose_batch(
        bank.tri_verts, bank.tri_colors, bank.tri_valid, poses, ids, proj,
        backend="xla", **kwargs)
    out = render_pose_batch(
        bank.tri_verts, bank.tri_colors, bank.tri_valid, poses, ids, proj,
        backend="pallas_direct", **kwargs)
    d_ref, d_out = np.asarray(ref.depth), np.asarray(out.depth)
    assert (d_ref > 0).any()
    # Compiled Mosaic vs XLA differ in f32 FMA contraction: coverage may
    # flip on a handful of silhouette-edge pixels (measured 0.016% here;
    # interpret-mode tests match exactly because interpret IS XLA).
    cov_mismatch = ((d_out > 0) != (d_ref > 0))
    assert cov_mismatch.mean() < 0.001, cov_mismatch.mean()
    both = (d_out > 0) & (d_ref > 0)
    dd = np.abs(d_out.astype(np.int64) - d_ref.astype(np.int64))[both]
    # +-1 int-cm unit at w-rounding boundaries; compiled FMA contraction
    # pushes more pixels across .5 cm boundaries than interpret (measured
    # 1.7% at +-1 unit, none beyond).
    assert dd.max() <= 1 and (dd > 0).mean() < 0.03
    tri_mismatch = (np.asarray(out.tri_id) != np.asarray(ref.tri_id))
    assert (tri_mismatch & ~cov_mismatch).mean() < 0.001


@requires_tpu
def test_compiled_two_stage_raster_matches_xla(tpu_backend):
    import jax
    import jax.numpy as jnp

    from perception_tpu.ops.pallas_raster import (
        pack_coefficients,
        rasterize_keys_pallas,
    )
    from perception_tpu.ops.rasterizer import (
        _INVALID_KEY,
        TRI_ID_BITS,
        render_pose_batch,
        screen_vertices,
        triangle_coefficients,
    )
    from tests.test_perf_kernels import CAM, _setup

    bank, poses = _setup()
    ids = np.zeros(len(poses), np.int32)
    proj = jnp.asarray(CAM.projection())
    ref = render_pose_batch(
        bank.tri_verts, bank.tri_colors, bank.tri_valid, poses, ids, proj,
        width=CAM.width, height=CAM.height, stride=2, tile=16, backend="xla")

    def setup_one(tv, ok, pose):
        v_cam = (jnp.einsum("ij,tvj->tvi", pose[:3, :3], tv)
                 + pose[:3, 3]) * 100.0
        pts2, z = screen_vertices(v_cam, proj, CAM.width, CAM.height)
        return triangle_coefficients(pts2, z, ok)

    coefs, aux, cok = jax.vmap(setup_one)(
        jnp.asarray(bank.tri_verts[ids]), jnp.asarray(bank.tri_valid[ids]),
        jnp.asarray(poses))
    keys = rasterize_keys_pallas(
        pack_coefficients(coefs, aux, cok),
        width=CAM.width, height=CAM.height, stride=2)
    depth = np.where(np.asarray(keys) == _INVALID_KEY, 0,
                     np.asarray(keys) >> TRI_ID_BITS)
    d_ref = np.asarray(ref.depth)
    d_out = depth.reshape(d_ref.shape)
    np.testing.assert_array_equal(d_out > 0, d_ref > 0)
    dd = np.abs(d_out.astype(np.int64) - d_ref.astype(np.int64))
    assert dd.max() <= 1 and (dd > 0).mean() < 0.005


@requires_tpu
def test_compiled_fused_icp_matches_composed(tpu_backend, rng):
    import jax.numpy as jnp

    from perception_tpu.ops.icp import icp_point_to_plane_batch
    from perception_tpu.ops.pallas_icp import icp_fused_pallas, pack_targets

    n, p, s = 5, 64, 128
    gx = rng.uniform(-0.1, 0.1, (n, s)).astype(np.float32)
    gy = rng.uniform(-0.1, 0.1, (n, s)).astype(np.float32)
    gz = (0.6 + 0.2 * gx + 0.1 * gy).astype(np.float32)
    tgt = np.stack([gx, gy, gz], axis=-1)
    nrm = np.tile(np.asarray([-0.2, -0.1, 1.0], np.float32) / np.sqrt(1.05),
                  (n, s, 1))
    tv = np.ones((n, s), bool)
    true_shift = np.asarray([0.004, -0.003, 0.008], np.float32)
    src = tgt[:, :p] - true_shift
    sv = np.ones((n, p), bool)

    delta = np.asarray(icp_fused_pallas(
        jnp.asarray(src), jnp.asarray(sv),
        pack_targets(jnp.asarray(tgt), jnp.asarray(tv), jnp.asarray(nrm)),
        max_iterations=15, max_correspondence=0.05))
    ref = icp_point_to_plane_batch(
        jnp.asarray(src), jnp.asarray(sv), jnp.asarray(tgt),
        jnp.asarray(tv), jnp.asarray(nrm),
        max_iterations=15, max_correspondence=0.05, crop_k=0)
    ref_t = np.asarray(ref.delta)[:, :3, 3]
    for i in range(n):
        resid = np.dot(nrm[0, 0], true_shift - delta[i, :3, 3])
        assert abs(resid) < 5e-4
        assert abs(np.dot(nrm[0, 0], delta[i, :3, 3] - ref_t[i])) < 1e-3


@requires_tpu
def test_gather_rows_onehot_bit_exact_on_chip(tpu_backend, rng):
    """On-chip bit-exactness of the one-hot MXU gather. The CPU suite's
    copy of this assertion cannot catch TPU-specific XLA rewrites: round 5
    caught the algebraic simplifier factoring the three part-dots into one
    bf16 dot (rounding every gathered value to bf16, ~2e-3 rel — enough to
    walk a single-plane ICP segment 53 mm off GT). gather_rows_onehot now
    pins the split with an optimization_barrier; this test is the on-chip
    regression guard."""
    import jax.numpy as jnp

    from perception_tpu.ops.pallas_icp import gather_rows_onehot

    n, s, k, a = 64, 1024, 256, 8
    tile = rng.normal(0, 1.0, (n, s, a)).astype(np.float32)
    tile[:, :, 7] = np.where(rng.uniform(size=(n, s)) < 0.3, 1e30, 0.0)
    tile[:, ::5, 2] *= 1e-6
    tile[:, ::7, 6] *= 1e4
    idx = rng.integers(0, s, (n, k)).astype(np.int32)
    got = np.asarray(gather_rows_onehot(jnp.asarray(tile), jnp.asarray(idx)))
    ref = np.take_along_axis(tile, idx[..., None], axis=1)
    np.testing.assert_array_equal(got, ref)

    # Same elision hazard in the colour-cost hi/lo packs: the split must
    # reconstruct the Lab plane exactly when COMPILED (not interpreted).
    import jax

    from perception_tpu.ops.pallas_cost import pack_bank_lab

    lab = rng.uniform(-110, 110, (3, 3, 256)).astype(np.float32)
    lab_in = jnp.transpose(jnp.asarray(lab), (0, 2, 1))   # [M, T, 3]
    packed = np.asarray(jax.jit(pack_bank_lab)(lab_in))
    np.testing.assert_array_equal(packed[:, 0:3] + packed[:, 3:6], lab)


@requires_tpu
def test_compiled_fused_cost_matches_composed(tpu_backend, rng):
    import jax.numpy as jnp

    from perception_tpu.ops.cost import compute_costs
    from perception_tpu.ops.knn import nn1_batch
    from perception_tpu.ops.pallas_cost import nn_cost_fused_pallas

    n, p, s = 3, 40, 72
    cloud = rng.normal(0, 0.05, (n, p, 3)).astype(np.float32)
    cloud[..., 2] += 0.6
    cvalid = rng.random((n, p)) > 0.25
    tgt = rng.normal(0, 0.05, (n, s, 3)).astype(np.float32)
    tgt[..., 2] += 0.6
    tvalid = rng.random((n, s)) > 0.25
    totals = np.full(n, 50.0, np.float32)

    pn, ue, ex = nn_cost_fused_pallas(
        jnp.asarray(cloud), jnp.asarray(cvalid), jnp.asarray(tgt),
        jnp.asarray(tvalid), sensor_resolution=0.03)
    d, i = nn1_batch(jnp.asarray(cloud), jnp.asarray(cvalid),
                     jnp.asarray(tgt), jnp.asarray(tvalid), ref_tile=24)
    ref = compute_costs(d, i, jnp.asarray(cvalid), jnp.zeros(n, jnp.int32),
                        jnp.zeros((n, p, 3)), jnp.zeros((n, s, 3)),
                        jnp.asarray(totals), sensor_resolution=0.03)
    np.testing.assert_allclose(np.asarray(pn), np.asarray(ref.pose_point_num))
    np.testing.assert_allclose(np.asarray(ex),
                               np.asarray(ref.observed_explained))


@requires_tpu
def test_sharded_scorer_on_device_mesh(tpu_backend):
    """GSPMD-sharded score_pose_batch over a real device mesh (1 chip in
    the bench environment — still exercises sharded pallas_call lowering)."""
    from perception_tpu.parallel.sharding import (
        make_pose_mesh,
        score_pose_batch_multichip,
    )
    from tests.test_pipeline import gt_states, make_env

    env = make_env()
    env.set_observation_from_states(gt_states())
    gt = gt_states()
    rng = np.random.default_rng(3)
    from perception_tpu.core.pose import ContPose
    from perception_tpu.core.state import ObjectState

    cands = []
    for obj in gt:
        for _ in range(5):
            j = rng.normal(0, 0.02, 3)
            p = ContPose.from_quat(obj.pose.x + j[0], obj.pose.y + j[1],
                                   obj.pose.z + j[2], *obj.pose.quaternion())
            cands.append(ObjectState(
                id=obj.id, symmetric=False, pose=p,
                segmentation_label_id=obj.segmentation_label_id))

    ref = env.score_object_states(cands, do_icp=False)
    cfg = env._scorer_config(do_icp=False)
    obs = env._observed
    poses = np.stack([env.pose_to_camera(s) for s in cands]).astype(np.float32)
    ids = np.asarray([s.id for s in cands], np.int32)
    labels = np.asarray([s.segmentation_label_id - 1 for s in cands], np.int32)
    totals = np.asarray(obs.seg_count, np.float32)[labels]

    mesh = make_pose_mesh()
    scores = score_pose_batch_multichip(
        mesh, env._bank_tri_verts, env._bank_tri_colors, env._bank_tri_valid,
        poses, ids, labels, totals, env._proj, env._scene, cfg,
        bank_backface=env._render_bank[3],
        bank_icp_samples=env._bank_icp_samples,
        bank_icp_normals=env._bank_icp_normals,
        bank_tri_lab=env._render_bank_lab)
    got = np.asarray(scores.total_cost)
    want = np.asarray([s.cost for s in ref])
    np.testing.assert_array_equal(got, want)


@requires_tpu
def test_compiled_particle_likelihood(tpu_backend):
    """The likelihood op is plain-XLA; check the compiled TPU result
    matches the CPU-computed reference on a rendered particle stack."""
    import jax.numpy as jnp

    from perception_tpu.ops.likelihood import particle_log_likelihood

    rng = np.random.default_rng(3)
    obs = rng.uniform(0.5, 2.5, size=(32, 40)).astype(np.float32)
    obs[0, :5] = 0.0
    rend = obs[None] + rng.normal(0, 0.1, size=(16, 32, 40)).astype(np.float32)
    rend[3, 1, 1] = np.nan
    got = np.asarray(particle_log_likelihood(jnp.asarray(obs),
                                             jnp.asarray(rend)))
    # CPU float64 reference of the same closed form.
    import math
    want = np.zeros(16)
    for n in range(16):
        for o, r in zip(obs.ravel(), rend[n].ravel()):
            if not (o > 0 and np.isfinite(o) and r > 0 and np.isfinite(r)):
                continue
            d = min(abs(float(o) - float(r)), 3.0)
            hn = 2 / (0.5 * math.sqrt(2 * math.pi)) * math.exp(-d * d / 0.5)
            want[n] += math.log(0.99 / 3.0 + 0.01 * hn)
    np.testing.assert_allclose(got, want, rtol=2e-4)

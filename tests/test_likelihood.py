"""Particle depth-likelihood scoring (ops/likelihood.py) vs a direct
table-based re-derivation of the reference's costFunction2 semantics
(kinect_sim/src/range_likelihood.cpp:521-552,657-712) and behavioural
expectations on rendered particle stacks."""

import math

import numpy as np
import pytest

from perception_tpu.core.config import CameraIntrinsics
from perception_tpu.core.mesh import ModelBank, mesh_model_from_arrays
from perception_tpu.ops.likelihood import (best_particle, depth_cm_to_m,
                                           particle_log_likelihood)
from perception_tpu.ops.rasterizer import render_pose_batch

from tests.test_core import make_box

CAM = CameraIntrinsics(fx=200.0, fy=200.0, cx=64.0, cy=48.0, width=128,
                       height=96)


def reference_cost2_numpy(obs, rend, sigma=0.5, ratio=0.99, r_max=3.0):
    """Reference costFunction2 as the per-pixel scoring loop computes it:
    301-entry baked half-normal table, ceil(d*100) lookup capped at 300,
    uniform floor mixture, invalid pixels -> log(1)=0."""
    table = np.array([2.0 / (sigma * math.sqrt(2 * math.pi))
                      * math.exp(-(0.01 * i) ** 2 / (2 * sigma * sigma))
                      for i in range(301)])
    out = np.zeros(rend.shape[0])
    for n in range(rend.shape[0]):
        total = 0.0
        for o, r in zip(obs.ravel(), rend[n].ravel()):
            if not (o > 0 and np.isfinite(o) and r > 0 and np.isfinite(r)):
                continue
            lup = min(int(math.ceil(abs(o - r) * 100)), 300)
            lhood = ratio / r_max + (1 - ratio) * table[lup]
            total += math.log(lhood)
        out[n] = total
    return out


def test_matches_reference_table_semantics():
    rng = np.random.default_rng(0)
    obs = rng.uniform(0.5, 2.5, size=(8, 10)).astype(np.float32)
    obs[0, :3] = 0.0                       # sensor holes
    rend = obs[None] + rng.normal(0, 0.2, size=(5, 8, 10)).astype(np.float32)
    rend[1, 2, 2] = np.nan                 # model hole
    rend[2] = obs + 5.0                    # far outlier -> capped distance
    got = np.asarray(particle_log_likelihood(obs, rend))
    want = reference_cost2_numpy(obs, rend)
    # The reference quantises |obs-rend| at 0.01 m via the lookup texture;
    # the closed form is the same function without that quantisation.
    np.testing.assert_allclose(got, want, rtol=0, atol=0.05 * obs.size)
    # The capped-outlier particle scores exactly the uniform floor per pixel.
    n_valid = int(((obs > 0)).sum())
    assert got[2] == pytest.approx(n_valid * math.log(0.99 / 3.0), rel=1e-5)


def test_invalid_pixels_are_neutral():
    obs = np.full((4, 4), 1.5, np.float32)
    rend = np.full((2, 4, 4), 1.5, np.float32)
    rend[1] = 0.0                          # empty particle render
    ll = np.asarray(particle_log_likelihood(obs, rend))
    assert ll[1] == 0.0                    # all-invalid = log(1) everywhere
    # A perfect match scores exactly the mixture value at d=0 per pixel
    # (negative at the reference's 0.99 floor — coverage bias is faithful).
    per_pix = math.log(0.99 / 3.0 + 0.01 * 2.0 / (0.5 * math.sqrt(2 * math.pi)))
    assert ll[0] == pytest.approx(16 * per_pix, rel=1e-5)


def test_disparity_mode_orders_particles():
    obs = np.full((6, 6), 1.2, np.float32)
    offsets = np.array([0.0, 0.05, 0.3, 1.0], np.float32)
    rend = obs[None] + offsets[:, None, None]
    ll = np.asarray(particle_log_likelihood(
        obs, rend, mode="disparity_truncated", sigma=0.1, floor_ratio=0.9))
    assert np.all(np.isfinite(ll))
    assert np.all(np.diff(ll) < 0)         # likelihood decreases with error
    assert int(best_particle(ll)) == 0


def test_rendered_particle_stack_selects_gt_pose():
    verts, faces = make_box(w=0.2, d=0.2, h=0.2)
    bank = ModelBank.from_models(
        [mesh_model_from_arrays("box", verts, faces)], t_cap=16)
    zs = [1.0, 1.02, 1.05, 0.98]
    poses = []
    for z in zs:
        m = np.eye(4, dtype=np.float32)
        m[:3, 3] = [0.0, 0.0, z]
        poses.append(m)
    out = render_pose_batch(
        bank.tri_verts, bank.tri_colors, bank.tri_valid,
        np.asarray(poses, np.float32), np.zeros(len(poses), np.int32),
        CAM.projection(), width=CAM.width, height=CAM.height, stride=1,
        tile=16)
    depths_m = np.asarray(depth_cm_to_m(out.depth))
    obs = depths_m[0]                      # GT = particle 0's render
    # A discriminative sigma/floor (the reference exposes both knobs; its
    # 0.99 floor makes the score coverage-dominated for localisation use).
    ll = np.asarray(particle_log_likelihood(
        obs, depths_m, sigma=0.05, floor_ratio=0.5))
    assert int(best_particle(ll)) == 0
    assert ll[0] > ll[1] > ll[2]           # monotone in pose error

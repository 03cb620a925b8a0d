"""Micro-decomposition of the fused-ICP stage at the bench shapes.

The round-4 profile (benchmarks/profile_ablate.py) showed the ICP stage
owning ~17.6 ms of the 34 ms bumpy1024 batch: ~6.7 ms fixed + ~0.57 ms
per GN iteration. This bench splits those blocks at EXACTLY the bench
shapes (N=2048 poses, P=256 source points, S_full=1024 segment targets,
crop k=256) so kernel work is optimised against measurements, not
guesses:

  * crop+gather+pack: centers -> crop_targets (approx_max_k) -> packed
    row gather — the pre-kernel block from pipeline/scorer.py;
  * kernel at iterations 1/5/10/20: the marginal is the per-iteration
    cost, the intercept is kernel entry + the first association;
  * group-size sweep (PT_ICP_GROUP / icp_fused_pallas(group=...)): the
    ~400-op 6x6 solve chain runs on [G, 1] sublane vectors, so G sets
    its vreg utilisation (G=8 fills one f32 vreg's sublanes).

Usage: python benchmarks/icp_micro.py [n_poses]   (TPU; ~2 min)
Prints one line per measurement: label, ms/batch, us/pose.
"""

from __future__ import annotations

import os
import sys

import numpy as np

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _here)
sys.path.insert(0, os.path.dirname(_here))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from harness import time_op
    from perception_tpu.ops.icp import crop_targets
    from perception_tpu.ops.pallas_icp import (
        gather_rows_onehot, icp_fused_pallas, pack_targets)

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    p, s_full, k = 256, 1024, 256
    rng = np.random.default_rng(0)

    # Synthetic but bench-shaped inputs: a smooth target surface patch with
    # normals, sources = perturbed subsets (so the GN iterations behave like
    # refinement, not divergence).
    # Curved target patch (so the GN system is well-conditioned) with
    # bench-like perturbations: sources are a rotated+shifted subset
    # (0.15 rad / 2 cm, the bench candidate jitter) — small-noise sources
    # converge in ~2 iterations and hide the per-iteration marginal
    # (first run of this script did exactly that).
    u = rng.uniform(0, 1, (s_full,))
    v = rng.uniform(0, 1, (s_full,))
    tgt = np.stack([0.55 + 0.25 * (u - 0.5),
                    0.5 * (v - 0.5),
                    0.08 * np.sin(6 * u) * np.cos(5 * v)], -1)
    nrm = np.stack([-0.48 * np.cos(6 * u) * np.cos(5 * v),
                    0.4 * np.sin(6 * u) * np.sin(5 * v),
                    np.ones(s_full)], -1)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    tgt_xyz = jnp.asarray(np.tile(tgt[None], (n, 1, 1)), jnp.float32)
    tgt_valid = jnp.ones((n, s_full), bool)
    seg_pk_full = pack_targets(tgt_xyz, tgt_valid,
                               jnp.asarray(np.tile(nrm[None], (n, 1, 1)),
                                           jnp.float32))

    def rot(angles):
        cx, cy, cz = np.cos(angles)
        sx, sy, sz = np.sin(angles)
        rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
        ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
        rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
        return rz @ ry @ rx

    src = tgt[rng.integers(0, s_full, (n, p))]
    centers0 = src.mean(axis=1, keepdims=True)
    rots = np.stack([rot(rng.normal(0, 0.15, 3)) for _ in range(n)])
    src = (np.einsum("nij,npj->npi", rots, src - centers0) + centers0
           + rng.normal(0, 0.02, (n, 1, 3)))
    src_xyz = jnp.asarray(src, jnp.float32)
    src_valid = jnp.ones((n, p), bool)

    def block(label, fn, perturb, *args, **kw):
        sec = time_op(fn, perturb, *args, **kw)
        print(f"{label:28s} {sec * 1e3:9.3f} ms/batch "
              f"{sec / n * 1e6:7.2f} us/pose", flush=True)
        return sec

    # --- pre-kernel block: centers + crop + gather, decomposed ---------
    def dist_only(sxyz):
        centers = jnp.mean(sxyz, axis=1)
        d = jnp.sum((tgt_xyz - centers[:, None, :]) ** 2, axis=-1)
        return jnp.where(tgt_valid, d, jnp.inf)

    def dist_topk(sxyz):
        _, idx = jax.lax.approx_max_k(-dist_only(sxyz), k)
        return idx

    def crop_block(sxyz, mode="near", kk=k, gather="onehot"):
        centers = jnp.mean(sxyz, axis=1)
        cidx = crop_targets(tgt_xyz, tgt_valid, centers, kk, mode=mode)
        if gather == "take":
            return jnp.take_along_axis(seg_pk_full, cidx[..., None], axis=1)
        return gather_rows_onehot(seg_pk_full, cidx)

    block("crop: distances only", dist_only, src_xyz)
    block("crop: dist+approx_max_k", dist_topk, src_xyz)
    block("crop+gather take (k=256)", crop_block, src_xyz, gather="take")
    block("crop+gather onehot (k=256)", crop_block, src_xyz)
    block("crop+gather spread k=256", crop_block, src_xyz, mode="spread")
    block("crop+gather spread k=128", crop_block, src_xyz, mode="spread",
          kk=128)

    # --- label-shared crop: L selections + one contiguous row gather ----
    # (icp_crop_share="label"). The seg arrays get a tiny dependence on
    # the perturbed arg so the harness's fori_loop cannot hoist the
    # selection as loop-invariant — this prices the per-BATCH cost; in
    # serving, the selection is genuinely loop-invariant across a frame's
    # search batches and costs less than measured here.
    n_labels = 4
    lab = jnp.asarray(rng.integers(0, n_labels, (n,)), jnp.int32)
    seg_xyz_l = tgt_xyz[:n_labels]
    seg_valid_l = tgt_valid[:n_labels]
    seg_pk_l = seg_pk_full[:n_labels]

    def crop_label(sxyz, kk=k):
        eps = (jnp.sum(sxyz) * 1e-30).astype(jnp.float32)
        sxl = seg_xyz_l + eps
        segc = jnp.mean(sxl, axis=1)
        cidx_l = crop_targets(sxl, seg_valid_l, segc, kk)
        return jnp.take_along_axis(
            seg_pk_l + eps, cidx_l[..., None], axis=1)[lab]

    block("crop label-share (k=256)", crop_label, src_xyz)
    block("crop label-share (k=128)", crop_label, src_xyz, kk=128)

    # Precomputed frame-invariant crop (ObservedScene.seg_pk_crop): the
    # per-batch prologue is ONLY the [labels] row gather.
    seg_ck = jax.block_until_ready(crop_label(src_xyz))[
        :n_labels]                                       # [L, k, 8]

    def crop_label_precomp(sxyz):
        eps = (jnp.sum(sxyz) * 1e-30).astype(jnp.float32)
        return (seg_ck + eps)[lab]

    block("crop label precomp gather", crop_label_precomp, src_xyz)

    tgt_pk = jax.block_until_ready(crop_block(src_xyz))

    # --- kernel: iteration sweep (group=4, the shipped default) --------
    secs = {}
    for iters in (1, 5, 10, 20):
        secs[iters] = block(
            f"kernel g=4 iters={iters}",
            lambda sx, it=iters: icp_fused_pallas(
                sx, src_valid, tgt_pk, max_iterations=it, nn_every=2,
                stagnation_streak=10_000.0, group=4),
            src_xyz)
    slope = (secs[20] - secs[5]) / 15.0
    print(f"  -> per-iteration marginal {slope * 1e3:.3f} ms, intercept "
          f"~{(secs[1] - slope) * 1e3:.3f} ms")

    # --- group-size sweep at 20 iterations (g=16 OOMs scoped vmem) ------
    for grp in (4, 8):
        block(
            f"kernel g={grp} iters=20",
            lambda sx, g=grp: icp_fused_pallas(
                sx, src_valid, tgt_pk, max_iterations=20, nn_every=2,
                stagnation_streak=10_000.0, group=g),
            src_xyz)

    # --- cropped-sweep size (S = crop k) at 20 iterations ----------------
    tgt_pk128 = jax.block_until_ready(crop_block(src_xyz, kk=128))
    block(
        "kernel g=4 iters=20 S=128",
        lambda sx: icp_fused_pallas(
            sx, src_valid, tgt_pk128, max_iterations=20, nn_every=2,
            stagnation_streak=10_000.0, group=4),
        src_xyz)

    # --- nn_every at the default group ----------------------------------
    for ne in (1, 2, 4):
        block(
            f"kernel g=4 nn_every={ne}",
            lambda sx, e=ne: icp_fused_pallas(
                sx, src_valid, tgt_pk, max_iterations=20, nn_every=e,
                stagnation_streak=10_000.0, group=4),
            src_xyz)

    # --- adaptive association (nn_every=0) at g=8, bench-like early exit:
    # the sweep count now depends on the data (bench-like perturbations),
    # so measure with the shipped streak-8 exit where it actually runs.
    for trig in (0.002, 0.004, 0.008):
        block(
            f"kernel g=8 adaptive t={trig}",
            lambda sx, t=trig: icp_fused_pallas(
                sx, src_valid, tgt_pk, max_iterations=20, nn_every=0,
                assoc_trigger=t, stagnation_streak=8.0, group=8),
            src_xyz)
    for ne in (1, 2):
        block(
            f"kernel g=8 nn_every={ne} strk8",
            lambda sx, e=ne: icp_fused_pallas(
                sx, src_valid, tgt_pk, max_iterations=20, nn_every=e,
                stagnation_streak=8.0, group=8),
            src_xyz)


if __name__ == "__main__":
    main()

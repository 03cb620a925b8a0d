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
    from perception_tpu.ops.pallas_icp import icp_fused_pallas, pack_targets

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    p, s_full, k = 256, 1024, 256
    rng = np.random.default_rng(0)

    # Synthetic but bench-shaped inputs: a smooth target surface patch with
    # normals, sources = perturbed subsets (so the GN iterations behave like
    # refinement, not divergence).
    tgt = np.stack([rng.uniform(0.4, 0.8, (s_full,)),
                    rng.uniform(-0.3, 0.3, (s_full,)),
                    0.05 * np.sin(8 * rng.uniform(0, 1, (s_full,)))], -1)
    nrm = np.tile([0.0, 0.0, 1.0], (s_full, 1))
    tgt_xyz = jnp.asarray(np.tile(tgt[None], (n, 1, 1)), jnp.float32)
    tgt_valid = jnp.ones((n, s_full), bool)
    seg_pk_full = pack_targets(tgt_xyz, tgt_valid,
                               jnp.asarray(np.tile(nrm[None], (n, 1, 1)),
                                           jnp.float32))
    src = tgt[rng.integers(0, s_full, (n, p))] + rng.normal(0, 0.01, (n, p, 3))
    src_xyz = jnp.asarray(src, jnp.float32)
    src_valid = jnp.ones((n, p), bool)

    def block(label, fn, perturb, *args, **kw):
        sec = time_op(fn, perturb, *args, **kw)
        print(f"{label:28s} {sec * 1e3:9.3f} ms/batch "
              f"{sec / n * 1e6:7.2f} us/pose", flush=True)
        return sec

    # --- pre-kernel block: centers + crop + gather ---------------------
    def crop_block(sxyz):
        centers = jnp.mean(sxyz, axis=1)
        cidx = crop_targets(tgt_xyz, tgt_valid, centers, k)
        return jnp.take_along_axis(seg_pk_full, cidx[..., None], axis=1)

    block("crop+gather (k=256)", crop_block, src_xyz)

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

    # --- group-size sweep at 20 iterations ------------------------------
    for grp in (4, 8, 16, 32):
        block(
            f"kernel g={grp} iters=20",
            lambda sx, g=grp: icp_fused_pallas(
                sx, src_valid, tgt_pk, max_iterations=20, nn_every=2,
                stagnation_streak=10_000.0, group=g),
            src_xyz)

    # --- nn_every at the default group ----------------------------------
    for ne in (1, 2, 4):
        block(
            f"kernel g=4 nn_every={ne}",
            lambda sx, e=ne: icp_fused_pallas(
                sx, src_valid, tgt_pk, max_iterations=20, nn_every=e,
                stagnation_streak=10_000.0, group=4),
            src_xyz)


if __name__ == "__main__":
    main()

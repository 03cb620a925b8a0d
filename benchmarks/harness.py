"""Honest on-device timing for a high-latency host<->device tunnel.

The axon TPU tunnel has ~27 ms host-readback round-trip latency and
`block_until_ready` does not actually block, so naive per-call timing is
meaningless. This harness runs the operation `inner` times inside one jitted
`lax.fori_loop` with a forced data dependency between iterations (so XLA
cannot hoist or deduplicate), reads back a single scalar, and subtracts
nothing: the one round trip amortises over all iterations.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


def time_op(fn: Callable, perturb_arg, *args, inner: int = 10,
            outer: int = 3, **kwargs) -> float:
    """Seconds per single `fn(perturb_arg, *args)` execution.

    `perturb_arg` must be a float array input of fn; each iteration adds a
    tiny output-dependent perturbation to it to chain the iterations.
    fn must return a pytree whose first leaf is float-summable.
    """

    @jax.jit
    def repeated(p, *rest):
        def body(_, carry):
            p_cur, acc = carry
            out = fn(p_cur, *rest, **kwargs)
            leaves = jax.tree_util.tree_leaves(out)
            s = jnp.asarray(leaves[0], jnp.float32).sum()
            return p_cur + (s * 1e-30).astype(p_cur.dtype), acc + s

        _, acc = jax.lax.fori_loop(0, inner, body, (p, jnp.float32(0.0)))
        return acc

    # Warm up / compile.
    float(repeated(perturb_arg, *args))
    best = float("inf")
    for _ in range(outer):
        t0 = time.perf_counter()
        float(repeated(perturb_arg, *args))
        best = min(best, time.perf_counter() - t0)
    return best / inner


def sustained_throughput(fn: Callable, perturb_arg, *args, inner: int = 10,
                         **kwargs) -> float:
    """Items/sec is left to the caller; returns seconds/op like time_op."""
    return time_op(fn, perturb_arg, *args, inner=inner, **kwargs)

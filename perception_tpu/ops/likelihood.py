"""Per-particle depth-image log-likelihood scoring.

TPU-native replacement for the reference's tiled particle-likelihood
machinery in kinect_sim (`RangeLikelihood::computeLikelihoods` /
`computeScores`, kinect_sim/src/range_likelihood.cpp:480-712): the
reference renders rows x cols particle poses tiled into one FBO texture
and sums a per-pixel likelihood per tile on the CPU (or a GLSL
sum-reduction shader). Here the particle axis is simply the leading
batch dimension of the rendered depth stack — the TPU-native analogue
of FBO tiling — and the reduction is one masked `sum` that XLA fuses
with the per-pixel likelihood math.

Two scoring modes, matching the reference's live cost functions:

  * ``gaussian_mixture`` (= costFunction2, range_likelihood.cpp:521-552,
    the "by far most commonly used" default, which_cost_function_=2):
    per-pixel ``log(ratio/(r_max-r_min) + (1-ratio)*HN(|obs-rend|))``
    where HN is a half-normal pdf ``2*N(d; 0, sigma)``. The reference
    bakes this pdf into a 301-entry lookup texture
    (normal_sigma0x5_normal1x0_range0to3_step0x01; verified numerically
    equal to ``2*N(d; 0, 0.5)`` sampled at 0.01 m) and clamps the
    distance at 3 m; we evaluate the same function in closed form on
    the VPU and keep the clamp so the "hole in the model" cap survives.
  * ``disparity_truncated`` (= costFunction5, :628-652): truncated
    Gaussian in normalised-disparity space with a uniform floor
    (``floor_proportion``), the reference's "THE likelihood function"
    candidate with its ctor defaults sigma=0.1, floor_proportion=0.9
    (:201-202). Its disparity mapping ``disp = -0.7253/depth + 1.0360``
    is the freenect depth-buffer calibration the reference hard-codes.

Invalid pixels score log(1)=0 in both modes exactly as the reference
treats NaN render / negative reference pixels — so empty particles and
sensor holes are likelihood-neutral, not penalised. Note the faithful
consequence: at the reference's default floor (0.99) the per-pixel
log-likelihood of even a perfect match is negative, so scores are
coverage-dominated across particles with very different footprints —
appropriate for its original camera-localisation use (all particles
render the full scene); for object-pose particles lower the floor /
sigma (both are exposed, as in the reference's ctor).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

# freenect depth-buffer -> disparity calibration constants used by
# costFunction4/5 (range_likelihood.cpp:581,636).
_DISP_A = -0.7253
_DISP_B = 1.0360


def _half_normal_pdf(d: jax.Array, sigma: float) -> jax.Array:
    return (2.0 / (sigma * math.sqrt(2.0 * math.pi))) * jnp.exp(
        -(d * d) / (2.0 * sigma * sigma))


def _norm_cdf(x: jax.Array) -> jax.Array:
    return 0.5 * (1.0 + jax.lax.erf(x / math.sqrt(2.0)))


@functools.partial(jax.jit, static_argnames=("mode",))
def particle_log_likelihood(
    observed_depth: jax.Array,   # [...pix] metres, <=0 or NaN = invalid
    rendered_depth: jax.Array,   # [N, ...pix] metres, <=0 or NaN = invalid
    *,
    mode: str = "gaussian_mixture",
    sigma: float = 0.5,
    floor_ratio: float = 0.99,
    r_max: float = 3.0,
) -> jax.Array:
    """Summed per-pixel depth log-likelihood for each particle: [N].

    ``observed_depth`` broadcasts against the particle axis; both inputs
    are metres with non-positive/NaN marking invalid pixels (the int32-cm
    render convention converts via :func:`depth_cm_to_m`).
    """
    obs = observed_depth[None] if observed_depth.ndim == rendered_depth.ndim - 1 \
        else observed_depth
    obs = obs.astype(jnp.float32)
    rend = rendered_depth.astype(jnp.float32)
    obs_ok = jnp.isfinite(obs) & (obs > 0.0)
    rend_ok = jnp.isfinite(rend) & (rend > 0.0)
    valid = obs_ok & rend_ok

    if mode == "gaussian_mixture":
        # costFunction2: mixture of a uniform floor over [0, r_max] and a
        # half-normal on the absolute range difference, clamped at r_max
        # (the reference's lup>300 cap — holes cost the floor, not -inf).
        d = jnp.minimum(jnp.abs(jnp.where(valid, obs, 0.0)
                                - jnp.where(valid, rend, 0.0)), r_max)
        lhood = floor_ratio / r_max + (1.0 - floor_ratio) * _half_normal_pdf(
            d, sigma)
    elif mode == "disparity_truncated":
        # costFunction5: Gaussian in normalised disparity space, truncated
        # renormalised over the [0, 1] depth-buffer range, mixed with a
        # uniform floor of weight floor_ratio.
        safe_obs = jnp.where(obs_ok, obs, 1.0)
        measured_disp = _DISP_A / safe_obs + _DISP_B
        model_disp = jnp.clip(
            jnp.where(rend_ok, _DISP_A / jnp.where(rend_ok, rend, 1.0)
                      + _DISP_B, 0.0), 0.0, 1.0)
        z = (measured_disp - model_disp) / sigma
        gauss = jnp.exp(-0.5 * z * z) / (sigma * math.sqrt(2.0 * math.pi))
        trunc = 1.0 / jnp.maximum(
            _norm_cdf((1.0 - model_disp) / sigma)
            - _norm_cdf((0.0 - model_disp) / sigma), 1e-12)
        lhood = floor_ratio + (1.0 - floor_ratio) * trunc * gauss
    else:
        raise ValueError(f"unknown likelihood mode {mode!r}")

    log_l = jnp.where(valid, jnp.log(lhood), 0.0)
    return jnp.sum(log_l.reshape(log_l.shape[0], -1), axis=-1)


def depth_cm_to_m(depth_cm: jax.Array) -> jax.Array:
    """int32-cm render depth (0 = empty) -> metres f32 (0 = invalid)."""
    return depth_cm.astype(jnp.float32) * 0.01


def best_particle(log_likelihoods: jax.Array) -> jax.Array:
    """Argmax particle index — the reference consumer's selection step."""
    return jnp.argmax(log_likelihoods)

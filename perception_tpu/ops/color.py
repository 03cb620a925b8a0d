"""Colour-space conversion and CIEDE2000 distance (vectorised).

Port of the maths used by the reference cost kernel
(cuda_renderer/include/cuda_renderer/cuda/compute_costs.cuh:57-159
`rgb2lab` / `color_distance`) and the CPU ColorSpace library
(sbpl_perception/src/ColorSpace/). Pure jnp, usable inside jit and on batches
of arbitrary shape [..., 3].
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def rgb_to_lab(rgb: jnp.ndarray) -> jnp.ndarray:
    """sRGB (0..255, [..., 3]) -> CIELAB, D65 (compute_costs.cuh:57-88)."""
    c = rgb / 255.0
    c = jnp.where(c > 0.04045, ((c + 0.055) / 1.055) ** 2.4, c / 12.92) * 100.0
    r, g, b = c[..., 0], c[..., 1], c[..., 2]
    x = r * 0.4124564 + g * 0.3575761 + b * 0.1804375
    y = r * 0.2126729 + g * 0.7151522 + b * 0.0721750
    z = r * 0.0193339 + g * 0.1191920 + b * 0.9503041
    x = x / 95.047
    y = y / 100.0
    z = z / 108.883

    def f(t):
        return jnp.where(t > 0.008856, jnp.cbrt(t), 7.787 * t + 16.0 / 116.0)

    fx, fy, fz = f(x), f(y), f(z)
    l = 116.0 * fy - 16.0
    a = 500.0 * (fx - fy)
    bb = 200.0 * (fy - fz)
    return jnp.stack([l, a, bb], axis=-1)


def ciede2000(lab1: jnp.ndarray, lab2: jnp.ndarray) -> jnp.ndarray:
    """CIEDE2000 colour distance, matching the reference device code
    (compute_costs.cuh:90-159) including its branch structure.
    """
    return ciede2000_components(
        lab1[..., 0], lab1[..., 1], lab1[..., 2],
        lab2[..., 0], lab2[..., 1], lab2[..., 2])


def _atan_poly(z):
    """Minimax polynomial atan on [-1, 1] (max err ~1.5e-7 rad)."""
    z2 = z * z
    return z * (0.99997726 + z2 * (-0.33262347 + z2 * (0.19354346
                + z2 * (-0.11643287 + z2 * (0.05265332
                + z2 * -0.01172120)))))


def atan2_poly(y, x):
    """Branch-free polynomial atan2 from VPU-native ops (Mosaic has no
    atan2 primitive; used by the colour-gated fused cost kernel). Range
    (-pi, pi], atan2(0, 0) = 0; error ~1e-6 rad — far below the CIEDE2000
    gate's sensitivity."""
    ax, ay = jnp.abs(x), jnp.abs(y)
    mx = jnp.maximum(ax, ay)
    mn = jnp.minimum(ax, ay)
    z = mn / jnp.maximum(mx, 1e-30)
    a = _atan_poly(z)
    a = jnp.where(ay > ax, np.pi / 2 - a, a)
    a = jnp.where(x < 0, np.pi - a, a)
    return jnp.where(y < 0, -a, a)


def ciede2000_components(l1, a1, b1, l2, a2, b2, *,
                         kernel_safe: bool = False) -> jnp.ndarray:
    """ciede2000 on separate same-shape component arrays (the form the
    fused Pallas cost kernel consumes: [1, P] lane vectors). kernel_safe
    substitutes Mosaic-lowerable ops (polynomial atan2, where-based mod)
    for the unsupported primitives."""
    eps = 1e-5
    if kernel_safe:
        _at2 = atan2_poly
        def _mod2pi(v):
            # v = atan2 + 2pi is in (pi, 3pi]; one conditional subtract
            # equals jnp.mod on that range.
            return jnp.where(v >= 2 * np.pi, v - 2 * np.pi, v)
    else:
        _at2 = jnp.arctan2
        def _mod2pi(v):
            return jnp.mod(v, 2 * np.pi)

    c1 = jnp.sqrt(a1**2 + b1**2)
    c2 = jnp.sqrt(a2**2 + b2**2)
    mean_c = (c1 + c2) / 2.0
    mean_c7 = mean_c**7
    pow25_7 = 6103515625.0

    g = 0.5 * (1 - jnp.sqrt(mean_c7 / (mean_c7 + pow25_7)))
    a1p = a1 * (1 + g)
    a2p = a2 * (1 + g)

    c1 = jnp.sqrt(a1p**2 + b1**2)
    c2 = jnp.sqrt(a2p**2 + b2**2)
    two_pi = 2 * np.pi
    h1 = _mod2pi(_at2(b1, a1p) + two_pi)
    h2 = _mod2pi(_at2(b2, a2p) + two_pi)

    delta_l = l2 - l1
    delta_c = c2 - c1
    # Reference branch chain (note: the c1*c2<eps branch is overridden by the
    # following abs(h2-h1)<=pi check in the original code; replicated).
    delta_h_angle = jnp.where(
        jnp.abs(h2 - h1) <= np.pi,
        h2 - h1,
        jnp.where(h2 > h1, h2 - h1 - two_pi, h2 - h1 + two_pi),
    )
    delta_h_angle = jnp.where(c1 * c2 < eps,
                              jnp.where(jnp.abs(h2 - h1) <= np.pi, h2 - h1, delta_h_angle),
                              delta_h_angle)
    delta_hh = 2 * jnp.sqrt(c1 * c2) * jnp.sin(delta_h_angle / 2)

    mean_l = (l1 + l2) / 2
    mean_c = (c1 + c2) / 2.0
    mean_c7 = mean_c**7

    mean_h = jnp.where(
        jnp.abs(h1 - h2) <= np.pi + eps,
        (h1 + h2) / 2,
        jnp.where(h1 + h2 < two_pi, (h1 + h2 + two_pi) / 2, (h1 + h2 - two_pi) / 2),
    )
    mean_h = jnp.where((c1 * c2 < eps) & (jnp.abs(h1 - h2) > np.pi + eps),
                       mean_h, mean_h)

    def deg(x):
        return x * np.pi / 180.0

    t = (1
         - 0.17 * jnp.cos(mean_h - deg(30))
         + 0.24 * jnp.cos(2 * mean_h)
         + 0.32 * jnp.cos(3 * mean_h + deg(6))
         - 0.2 * jnp.cos(4 * mean_h - deg(63)))
    sl = 1 + (0.015 * (mean_l - 50) ** 2) / jnp.sqrt(20 + (mean_l - 50) ** 2)
    sc = 1 + 0.045 * mean_c
    sh = 1 + 0.015 * mean_c * t
    rc = 2 * jnp.sqrt(mean_c7 / (mean_c7 + pow25_7))
    rt = -jnp.sin(deg(60 * jnp.exp(-(((mean_h / np.pi * 180.0) - 275) / 25) ** 2))) * rc

    return jnp.sqrt(
        (delta_l / sl) ** 2
        + (delta_c / sc) ** 2
        + (delta_hh / sh) ** 2
        + rt * (delta_c / sc) * (delta_hh / sh)
    )

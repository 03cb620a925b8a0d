"""Batched candidate-pose depth/color rasterisation on TPU.

TPU-native re-design of the reference CUDA rasteriser
(cuda_renderer/include/cuda_renderer/cuda/image_renderer.cuh:59-321
`render_triangle_multi` / `rasterization_with_source`). Differences driven by
the hardware:

  * The CUDA kernel parallelises over triangles and resolves pixel ownership
    with a per-pixel spin lock + atomicMin on int32 depth — racy but
    converging. Here each (pose, pixel) gathers over triangles and takes a
    deterministic min of packed (depth << 11 | triangle_id) keys: same result,
    no atomics, fully vectorisable.
  * Coverage/depth per (pixel, triangle) are affine functionals of the screen
    position, so a triangle tile reduces to three small matmuls against the
    pixel matrix [Npix, 3] followed by VPU compares — XLA/Mosaic-friendly,
    with a `lax.scan` over triangle tiles keeping live memory bounded.
  * Only the strided sample points consumed by the depth->cloud stage are
    rasterised (the reference renders 640x480 then strides in
    compute_point_clouds.cuh:47-58; point-sampled coverage commutes with
    subsampling, and the per-pixel USE_TREE/USE_CLUTTER accounting is
    compile-time disabled in the reference's live path).

Depth semantics match the reference exactly: perspective-correct
`1 / (alpha/z0 + beta/z1 + gamma/z2)` in integer centimetres
(image_renderer.cuh:117-129), 0 = empty.

The occlusion-vs-source pass (source occludes render -> pixel removed;
render occludes source -> pose_occluded flag) is applied deterministically
per pixel after the min-reduction, mirroring the *converged* fixed point of
the reference's in-raster source comparison (image_renderer.cuh:160-206).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# Triangle-id bits in the packed z-buffer key. depth_cm < 2^20, tri_id < 2^11.
TRI_ID_BITS = 11
MAX_TRIS = 1 << TRI_ID_BITS
_MAX_DEPTH = (1 << 20) - 2
_INVALID_KEY = np.int32(2**31 - 1)


class RenderOutput(NamedTuple):
    depth: jax.Array          # [N, h, w] int32 cm, 0 = empty
    color: jax.Array          # [N, h, w, 3] float32 0..255
    pose_occluded: jax.Array  # [N] int32: render occludes observed scene
    tri_id: jax.Array         # [N, h, w] int32 winning triangle (-1 = empty)
    anchors: jax.Array        # [N, 2] int32 strided ROI origin (x0, y0);
                              # zeros in full-frame mode
    clutter_ratio: jax.Array  # [N] float32 % of rendered pixels occluded by
                              # closer source geometry (USE_CLUTTER
                              # accounting, image_renderer.cuh:189-206,
                              # counted per winning pixel not per fragment)


def screen_vertices(tri_v_cam_cm: jax.Array, proj: jax.Array,
                    width: int, height: int) -> tuple[jax.Array, jax.Array]:
    """Project camera-frame (cm) triangle vertices to screen space.

    Mirrors render_triangle_multi's projection step (image_renderer.cuh:
    296-305 + 82-84): clip = proj @ v, then viewport divide by the *pre-
    projection* z (`last_row`).
    """
    v = tri_v_cam_cm  # [..., 3(vert), 3(xyz)]
    z = v[..., 2]
    clip_x = v[..., 0] * proj[0, 0] + v[..., 1] * proj[0, 1] + v[..., 2] * proj[0, 2] + proj[0, 3]
    clip_y = v[..., 1] * proj[1, 1] + v[..., 2] * proj[1, 2] + proj[1, 3]
    sx = clip_x / z * (width / 2.0) + width / 2.0
    sy = clip_y / z * (height / 2.0) + height / 2.0
    return jnp.stack([sx, sy], axis=-1), z  # [..., 3, 2], [..., 3]


def triangle_coefficients(pts2: jax.Array, z: jax.Array, tri_ok: jax.Array):
    """Per-triangle affine functionals of screen position P=(px,py).

    Returns (coefs [T, 3, 3], abs_base [T], ok [T]). Coefficient rows are the
    *sign-adjusted unnormalised* barycentric edge functions (beta_s, gamma_s)
    plus the perspective-depth functional w; columns multiply (px, py, 1).

    Coverage at P:  beta_s >= 0, gamma_s >= 0, abs_base - beta_s - gamma_s >= 0
    (equivalent to normalised alpha,beta,gamma >= 0, image_renderer.cuh:112-115,
    but evaluated without dividing by the signed base area — near-degenerate
    edge-on triangles would otherwise blow up the normalised functionals into
    catastrophic f32 cancellation and phantom coverage).
    Depth at a covered P: 1/w (perspective-correct, cuh:117-125).
    """
    p0, p1, p2 = pts2[..., 0, :], pts2[..., 1, :], pts2[..., 2, :]
    z0, z1, z2 = z[..., 0], z[..., 1], z[..., 2]

    e20 = p2 - p0
    e10 = p1 - p0
    base = 0.5 * (e20[..., 0] * e10[..., 1] - e10[..., 0] * e20[..., 1])
    # Cull triangles with projected area < 0.01 px^2: they can only cover a
    # sample point through f32 round-off, and their interpolated depth is
    # numerically meaningless (the reference rasterises them into the same
    # garbage via its normalised barycentric path).
    ok = tri_ok & (jnp.abs(base) > 1e-2) & (z0 > 1e-3) & (z1 > 1e-3) & (z2 > 1e-3)
    sign = jnp.where(base >= 0, 1.0, -1.0)
    inv_base = jnp.where(ok, 1.0 / jnp.where(ok, base, 1.0), 0.0)

    # Unnormalised: beta_u(P) = A(p0, P, p2), gamma_u(P) = A(p0, p1, P), with
    # A(a,b,c) = 0.5*((c.x-a.x)(b.y-a.y) - (b.x-a.x)(c.y-a.y))  (cuh:40-41).
    beta_x = -0.5 * e20[..., 1]
    beta_y = 0.5 * e20[..., 0]
    beta_c = 0.5 * (p0[..., 0] * e20[..., 1] - p0[..., 1] * e20[..., 0])
    gamma_x = 0.5 * e10[..., 1]
    gamma_y = -0.5 * e10[..., 0]
    gamma_c = 0.5 * (p0[..., 1] * e10[..., 0] - p0[..., 0] * e10[..., 1])

    iz0 = jnp.where(ok, 1.0 / jnp.where(ok, z0, 1.0), 0.0)
    iz1 = jnp.where(ok, 1.0 / jnp.where(ok, z1, 1.0), 0.0)
    iz2 = jnp.where(ok, 1.0 / jnp.where(ok, z2, 1.0), 0.0)
    d1, d2 = iz1 - iz0, iz2 - iz0
    # w = alpha/z0 + beta/z1 + gamma/z2 = 1/z0 + (beta_u*d1 + gamma_u*d2)/base.
    w_x = (beta_x * d1 + gamma_x * d2) * inv_base
    w_y = (beta_y * d1 + gamma_y * d2) * inv_base
    w_c = iz0 + (beta_c * d1 + gamma_c * d2) * inv_base

    coefs = jnp.stack(
        [
            jnp.stack([beta_x, beta_y, beta_c], axis=-1) * sign[..., None],
            jnp.stack([gamma_x, gamma_y, gamma_c], axis=-1) * sign[..., None],
            jnp.stack([w_x, w_y, w_c], axis=-1),
        ],
        axis=-2,
    )  # [T, 3, 3]
    # Aux per-triangle data: |base| for the coverage test plus the vertex
    # depth range — interpolated depth is clamped into [zmin, zmax], which is
    # exact-arithmetic-neutral but stops f32 slivers from under-cutting the
    # z-buffer.
    zmin = jnp.minimum(z0, jnp.minimum(z1, z2))
    zmax = jnp.maximum(z0, jnp.maximum(z1, z2))
    aux = jnp.stack([jnp.abs(base), zmin, zmax], axis=-1)  # [T, 3]
    return coefs, aux, ok


def _pixel_matrix(width: int, height: int, stride: int) -> np.ndarray:
    """Screen-space sample positions for the strided written-pixel grid.

    Written pixel (x_w, y_w) corresponds to screen P=(x_w, H-1-y_w)
    (the y flip at image_renderer.cuh:128).
    """
    w_s, h_s = width // stride, height // stride
    xs = np.arange(w_s) * stride
    ys = np.arange(h_s) * stride
    px = np.tile(xs, h_s).astype(np.float32)
    py = np.repeat((height - 1 - ys).astype(np.float32), w_s)
    ones = np.ones_like(px)
    return np.stack([px, py, ones], axis=1)  # [Npix, 3]


def _roi_pixel_matrix(roi_h: int, roi_w: int) -> np.ndarray:
    """Local strided (x, y) offsets of an ROI window, row-major [Npix, 2]."""
    xs = np.tile(np.arange(roi_w), roi_h)
    ys = np.repeat(np.arange(roi_h), roi_w)
    return np.stack([xs, ys], axis=1).astype(np.int32)


def _rasterize_keys(coefs: jax.Array, aux: jax.Array, ok: jax.Array,
                    pix: jax.Array, tile: int) -> jax.Array:
    """Packed (depth, tri-id) min over triangles for one pose.

    coefs [T, 3, 3]; aux [T, 3] = (|base|, zmin, zmax); pix [Npix, 3].
    Scans triangle tiles to bound live intermediates at [Npix, tile].
    """
    t_cap = coefs.shape[0]
    tile = min(tile, t_cap)
    if t_cap % tile:
        pad = tile - t_cap % tile
        coefs = jnp.pad(coefs, ((0, pad), (0, 0), (0, 0)))
        aux = jnp.pad(aux, ((0, pad), (0, 0)))
        ok = jnp.pad(ok, (0, pad))
        t_cap += pad
    num_tiles = t_cap // tile
    coefs_t = coefs.reshape(num_tiles, tile, 3, 3)
    ok_t = ok.reshape(num_tiles, tile)
    aux_t = aux.reshape(num_tiles, tile, 3)
    base_ids = jnp.arange(tile, dtype=jnp.int32)

    def body(carry, inputs):
        tile_idx, (c, a, o) = inputs
        # Affine evaluation as explicit f32 FMAs — a K=3 matmul would hit
        # XLA's low-precision dot path (bf16 on the TPU MXU), which is fatal
        # for cm-quantised depth. VPU-bound broadcast is also faster here.
        vals = (pix[:, None, None, 0] * c[None, :, :, 0]
                + pix[:, None, None, 1] * c[None, :, :, 1]
                + c[None, :, :, 2])  # [Npix, tile, 3]
        beta_s, gamma_s, w = vals[..., 0], vals[..., 1], vals[..., 2]
        abs_base, zmin, zmax = a[:, 0], a[:, 1], a[:, 2]
        alpha_s = abs_base[None, :] - beta_s - gamma_s
        covered = (alpha_s >= 0.0) & (beta_s >= 0.0) & (gamma_s >= 0.0) & o[None, :]
        covered &= w > 1e-9
        depth = 1.0 / jnp.where(covered, w, 1.0)
        depth = jnp.round(jnp.clip(depth, zmin[None, :], zmax[None, :]))
        depth_i = jnp.clip(depth, 1, _MAX_DEPTH).astype(jnp.int32)
        ids = base_ids[None, :] + tile_idx * tile
        keys = jnp.where(covered, (depth_i << TRI_ID_BITS) | ids, _INVALID_KEY)
        return jnp.minimum(carry, keys.min(axis=1)), None

    init = jnp.full((pix.shape[0],), _INVALID_KEY, dtype=jnp.int32)
    keys, _ = jax.lax.scan(
        body, init,
        (jnp.arange(num_tiles, dtype=jnp.int32), (coefs_t, aux_t, ok_t)))
    return keys


def compute_roi_anchors(pose_mats: jax.Array, proj: jax.Array,
                        width: int, height: int, stride: int,
                        roi_shape: tuple[int, int],
                        model_centers: jax.Array | None = None) -> jax.Array:
    """Strided ROI origins [N, 2] (x0, y0) centred on each pose's projected
    object centre, clamped inside the image.

    model_centers [N, 3]: bbox centre in the model frame (3-DoF preprocessing
    puts the origin at the object's base, so projecting the origin would
    mis-centre the window).
    """
    roi_h, roi_w = roi_shape
    w_s, h_s = width // stride, height // stride
    if model_centers is not None:
        centers = (jnp.einsum("nij,nj->ni", pose_mats[:, :3, :3], model_centers)
                   + pose_mats[:, :3, 3]) * 100.0
    else:
        centers = pose_mats[:, :3, 3] * 100.0  # cm, camera frame
    z = jnp.maximum(centers[:, 2], 1e-3)
    clip_x = (centers[:, 0] * proj[0, 0] + centers[:, 1] * proj[0, 1]
              + centers[:, 2] * proj[0, 2] + proj[0, 3])
    clip_y = centers[:, 1] * proj[1, 1] + centers[:, 2] * proj[1, 2] + proj[1, 3]
    sx = clip_x / z * (width / 2.0) + width / 2.0       # screen x = written x
    sy = clip_y / z * (height / 2.0) + height / 2.0
    x_img = sx
    y_img = (height - 1) - sy                            # written-pixel y
    x0 = jnp.round(x_img / stride).astype(jnp.int32) - roi_w // 2
    y0 = jnp.round(y_img / stride).astype(jnp.int32) - roi_h // 2
    x0 = jnp.clip(x0, 0, max(w_s - roi_w, 0))
    y0 = jnp.clip(y0, 0, max(h_s - roi_h, 0))
    return jnp.stack([x0, y0], axis=1)


def default_backend() -> str:
    """'pallas' on TPU, 'xla' elsewhere (CPU pallas would interpret slowly)."""
    try:
        return "pallas" if jax.default_backend() == "tpu" else "xla"
    except Exception:
        return "xla"


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "stride", "tile",
                     "use_segmentation_label", "use_tree_occlusion",
                     "backend", "roi_shape"),
)
def render_pose_batch(
    bank_tri_verts: jax.Array,    # [M, T, 3, 3] float32 model frame (m)
    bank_tri_colors: jax.Array,   # [M, T, 3] float32 0..255
    bank_tri_valid: jax.Array,    # [M, T] bool
    pose_mats: jax.Array,         # [N, 4, 4] model->camera (m)
    pose_model_ids: jax.Array,    # [N] int32
    proj: jax.Array,              # [4, 4] projection (cm near/far)
    *,
    width: int,
    height: int,
    stride: int = 1,
    source_depth: jax.Array | None = None,   # [h, w] int32 cm at strided pixels
    source_label: jax.Array | None = None,   # [h, w] int32 mask labels (1-based)
    pose_labels: jax.Array | None = None,    # [N] int32 0-based segment labels
    occlusion_threshold: float = 1.0,        # cm
    use_segmentation_label: bool = False,
    use_tree_occlusion: bool = False,
    tile: int = 256,
    backend: str = "auto",   # "pallas_direct" | "pallas" | "xla" | "auto"
    roi_shape: tuple[int, int] | None = None,  # (roi_h, roi_w) strided window
    bank_backface: jax.Array | None = None,  # [M] bool: watertight models
) -> RenderOutput:
    """Render N candidate poses as strided depth+color images with occlusion.

    Equivalent of `image_render` (image_renderer.cuh:336-496) for the
    multi-image case. Depth is int32 cm (gpu depth factor 100); the pose
    matrices are in metres — the cm scaling the reference bakes into
    `mat4x4::init_from_eigen(pose, 100)` happens here at the camera-transform
    stage instead.

    With roi_shape, each pose renders only a per-pose window centred on its
    projected origin; outputs are [N, roi_h, roi_w] and `anchors` gives each
    window's strided origin.
    """
    h_s, w_s = height // stride, width // stride
    n_poses = pose_mats.shape[0]

    tri_v = bank_tri_verts[pose_model_ids]      # [N, T, 3, 3]
    tri_ok = bank_tri_valid[pose_model_ids]     # [N, T]
    cullable = (bank_backface[pose_model_ids] if bank_backface is not None
                else None)                      # [N]

    if backend == "auto":
        # On TPU the fully-fused direct kernel wins (measured ~4% over the
        # two-stage pallas path, and it removes the ~25 MB/batch HBM
        # coefficient tables); accuracy parity verified (synthetic ADD-S
        # AUC 57.90 vs 57.93 over identical scenes).
        backend = ("pallas_direct" if default_backend() == "pallas"
                   else "xla")

    if roi_shape is not None:
        out_h, out_w = roi_shape
        # Per-model bbox centres from the (masked) triangle verts.
        counts = jnp.maximum(bank_tri_valid.sum(axis=1), 1)[:, None]
        centers_m = (
            (bank_tri_verts * bank_tri_valid[..., None, None]).sum(axis=(1, 2))
            / (3.0 * counts))
        anchors = compute_roi_anchors(
            pose_mats, proj, width, height, stride, roi_shape,
            model_centers=centers_m[pose_model_ids])
    else:
        out_h, out_w = h_s, w_s
        anchors = jnp.zeros((n_poses, 2), jnp.int32)

    def setup_one(tv, ok, pose, cull):
        rot = pose[:3, :3]
        t = pose[:3, 3]
        v_cam = jnp.einsum("ij,tvj->tvi", rot, tv) + t
        if cull is not None:
            # Backface cull (exact for watertight outward-wound meshes: a
            # back face can never win the depth min). Camera at the origin:
            # facing iff normal . v0 < 0.
            normal = jnp.cross(v_cam[:, 1] - v_cam[:, 0],
                               v_cam[:, 2] - v_cam[:, 0])
            facing = jnp.sum(normal * v_cam[:, 0], axis=-1) < 0.0
            ok = ok & (facing | ~cull)
        v_cam = v_cam * 100.0  # m -> cm render units
        pts2, z = screen_vertices(v_cam, proj, width, height)
        return triangle_coefficients(pts2, z, ok)

    if backend in ("pallas_bin", "pallas_bin_interpret"):
        # Scatter-bin variant of the direct kernel: per-tile subchunk
        # lists built by a scalar prepass replace chunk-bbox culling
        # (pallas_raster_bin.py).
        from perception_tpu.ops.pallas_raster_bin import rasterize_bin_pallas
        from perception_tpu.ops.pallas_raster_direct import pack_bank_verts

        verts12 = pack_bank_verts(bank_tri_verts, bank_tri_valid,
                                  bank_backface)
        keys = rasterize_bin_pallas(
            verts12, pose_mats, pose_model_ids, anchors, proj,
            width=width, height=height, stride=stride, roi_shape=roi_shape,
            interpret=backend.endswith("interpret"))
    elif backend in ("pallas_direct", "pallas_direct_interpret"):
        # Fully-fused path: camera transform + coefficients + raster in one
        # kernel reading the model bank directly (no [N, T] gather, no HBM
        # coefficient tables). The *_interpret variant runs the Pallas
        # interpreter (CPU tests).
        from perception_tpu.ops.pallas_raster_direct import (
            pack_bank_verts,
            rasterize_direct_pallas,
        )

        verts12 = pack_bank_verts(bank_tri_verts, bank_tri_valid,
                                  bank_backface)
        keys = rasterize_direct_pallas(
            verts12, pose_mats, pose_model_ids, anchors, proj,
            width=width, height=height, stride=stride, roi_shape=roi_shape,
            interpret=backend.endswith("interpret"))
    elif backend == "pallas":
        from perception_tpu.ops.pallas_raster import (
            pack_coefficients,
            rasterize_keys_pallas,
        )

        def setup_pallas(tv, ok, pose, cull):
            rot = pose[:3, :3]
            t = pose[:3, 3]
            v_cam = jnp.einsum("ij,tvj->tvi", rot, tv) + t
            if cull is not None:
                normal = jnp.cross(v_cam[:, 1] - v_cam[:, 0],
                                   v_cam[:, 2] - v_cam[:, 0])
                facing = jnp.sum(normal * v_cam[:, 0], axis=-1) < 0.0
                ok = ok & (facing | ~cull)
            v_cam = v_cam * 100.0
            pts2, z = screen_vertices(v_cam, proj, width, height)
            coefs, aux, cok = triangle_coefficients(pts2, z, ok)
            # Per-triangle screen bbox for chunk culling in the kernel.
            bbox = jnp.stack([
                jnp.where(cok, pts2[..., 0].min(axis=-1), jnp.inf),
                jnp.where(cok, pts2[..., 0].max(axis=-1), -jnp.inf),
                jnp.where(cok, pts2[..., 1].min(axis=-1), jnp.inf),
                jnp.where(cok, pts2[..., 1].max(axis=-1), -jnp.inf),
            ], axis=-1)
            return coefs, aux, cok, bbox

        coefs, aux, cok, bboxes = jax.vmap(
            setup_pallas, in_axes=(0, 0, 0, None if cullable is None else 0))(
            tri_v, tri_ok, pose_mats, cullable)
        packed = pack_coefficients(coefs, aux, cok)
        keys = rasterize_keys_pallas(
            packed, width=width, height=height, stride=stride,
            anchors=anchors, roi_shape=roi_shape, tri_bboxes=bboxes)
    else:
        base_pix = jnp.asarray(_roi_pixel_matrix(out_h, out_w))

        def render_one(tv, ok, pose, anchor, cull):
            coefs, aux, cok = setup_one(tv, ok, pose, cull)
            px = (anchor[0] + base_pix[:, 0]) * stride
            py = (height - 1) - (anchor[1] + base_pix[:, 1]) * stride
            pix = jnp.stack(
                [px.astype(jnp.float32), py.astype(jnp.float32),
                 jnp.ones_like(px, jnp.float32)], axis=1)
            return _rasterize_keys(coefs, aux, cok, pix, tile)

        keys = jax.vmap(
            render_one, in_axes=(0, 0, 0, 0,
                                 None if cullable is None else 0))(
            tri_v, tri_ok, pose_mats, anchors, cullable)

    empty = keys == _INVALID_KEY
    depth = jnp.where(empty, 0, keys >> TRI_ID_BITS).astype(jnp.int32)
    tri_id = jnp.where(empty, -1, keys & (MAX_TRIS - 1)).astype(jnp.int32)
    colors_per_pose = bank_tri_colors[pose_model_ids]   # [N, T, 3]
    color = jnp.take_along_axis(
        colors_per_pose, jnp.maximum(tri_id, 0)[..., None], axis=1)
    color = jnp.where(empty[..., None], 0.0, color)

    pose_occluded = jnp.zeros((n_poses,), dtype=jnp.int32)
    clutter_ratio = jnp.zeros((n_poses,), dtype=jnp.float32)
    if source_depth is not None:
        if roi_shape is not None:
            src2d = jax.vmap(
                lambda a: jax.lax.dynamic_slice(
                    source_depth, (a[1], a[0]), roi_shape))(anchors)
            src = src2d.reshape(n_poses, -1).astype(jnp.int32)
            if use_segmentation_label:
                slab2d = jax.vmap(
                    lambda a: jax.lax.dynamic_slice(
                        source_label, (a[1], a[0]), roi_shape))(anchors)
                slab = slab2d.reshape(n_poses, -1).astype(jnp.int32)
        else:
            src = source_depth.reshape(-1)[None, :].astype(jnp.int32)
            if use_segmentation_label:
                slab = source_label.reshape(-1)[None, :].astype(jnp.int32)
        d = depth.astype(jnp.int32)
        diff = jnp.abs(d - src).astype(jnp.float32)
        if use_segmentation_label:
            plab = pose_labels[:, None].astype(jnp.int32)
            mismatch = (plab != slab - 1) & (diff > 0.5)
        else:
            mismatch = diff > occlusion_threshold
        present = ~empty
        src_pos = src > 0
        # Source occludes render: drop the pixel (blacken + empty depth).
        removed = present & mismatch & (d > src) & src_pos
        if use_tree_occlusion:
            # Render occludes source -> hard-flag the pose. The reference
            # compiles this OUT of its shipped greedy path (USE_TREE 0,
            # model.h:17; the atomicOr at image_renderer.cuh:199-204 is
            # dead code there): a candidate whose render pokes in front of
            # distant background — e.g. any object near a table edge seen
            # against the floor — must NOT be invalidated in greedy mode;
            # its protruding pixels just count as unexplained.
            occluding = present & mismatch & (d <= src) & src_pos
            pose_occluded = occluding.any(axis=1).astype(jnp.int32)
        # Clutter accounting: fraction of rendered pixels hidden behind
        # clearly-closer source geometry (>= 5 cm, cuh:191).
        clutter = removed & (src <= d - 5)
        total = present.sum(axis=1).astype(jnp.float32)
        clutter_ratio = (clutter.sum(axis=1) / jnp.maximum(total, 1.0) * 100.0)
        depth = jnp.where(removed, 0, depth)
        tri_id = jnp.where(removed, -1, tri_id)
        color = jnp.where(removed[..., None], 0.0, color)

    return RenderOutput(
        depth=depth.reshape(n_poses, out_h, out_w),
        color=color.reshape(n_poses, out_h, out_w, 3),
        pose_occluded=pose_occluded,
        tri_id=tri_id.reshape(n_poses, out_h, out_w),
        anchors=anchors,
        clutter_ratio=clutter_ratio,
    )


# --------------------------------------------------------------------------
# NumPy oracle (CPU reference for tests)
# --------------------------------------------------------------------------

def render_oracle_numpy(
    tri_verts: np.ndarray,   # [T, 3, 3] model frame (m)
    pose_mat: np.ndarray,    # [4, 4]
    proj: np.ndarray,
    width: int,
    height: int,
) -> np.ndarray:
    """Loop-based full-resolution raster mirroring the reference CPU renderer
    (cuda_renderer/src/renderer.cpp `rasterization`, same math as the CUDA
    path minus source-occlusion). Returns int32 cm depth, 0 = empty.
    """
    depth = np.full((height, width), np.iinfo(np.int32).max, dtype=np.int64)
    v_cam = (tri_verts @ pose_mat[:3, :3].T + pose_mat[:3, 3]) * 100.0
    for tri in v_cam:
        z = tri[:, 2]
        if np.any(z <= 1e-3):
            continue
        clip = tri @ proj[:3, :3].T + proj[:3, 3]
        sx = clip[:, 0] / z * width / 2.0 + width / 2.0
        sy = clip[:, 1] / z * height / 2.0 + height / 2.0
        pts = np.stack([sx, sy], axis=1)

        def area(a, b, c):
            return 0.5 * ((c[0] - a[0]) * (b[1] - a[1]) - (b[0] - a[0]) * (c[1] - a[1]))

        base = area(pts[0], pts[1], pts[2])
        if abs(base) < 1e-12:
            continue
        bmin = np.maximum([0, 0], np.minimum(pts.min(axis=0), [width - 1, height - 1]))
        bmax = np.minimum([width - 1, height - 1], np.maximum(pts.max(axis=0), [0, 0]))
        for py in range(int(bmin[1] + 0.5), int(bmax[1]) + 1):
            for px in range(int(bmin[0] + 0.5), int(bmax[0]) + 1):
                p = (float(px), float(py))
                beta = area(pts[0], p, pts[2]) / base
                gamma = area(pts[0], pts[1], p) / base
                alpha = 1.0 - beta - gamma
                if alpha < 0 or beta < 0 or gamma < 0:
                    continue
                w = alpha / z[0] + beta / z[1] + gamma / z[2]
                if w <= 1e-9:
                    continue
                d = int(round(1.0 / w))
                x_w = px
                y_w = height - 1 - py
                if d < depth[y_w, x_w]:
                    depth[y_w, x_w] = d
    depth[depth == np.iinfo(np.int32).max] = 0
    return depth.astype(np.int32)

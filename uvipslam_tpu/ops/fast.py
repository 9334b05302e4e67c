"""FAST-9/16 corner detection as dense, branch-free tensor ops.

TPU-native equivalent of the reference's per-cell OpenCV FAST with
threshold fallback (reference: src/ORBextractor.cc:646-659) — but
instead of scalar pixel loops, the whole image is tested at once:
16 statically-shifted views, a packed-bit contiguous-arc test on the
VPU, 3x3 max-pool NMS, and grid-cell selection via reshapes. A low
threshold score map doubles as the "fallback" detector: cells that
have no high-threshold corner use their best low-threshold one
(same intent as the reference's 20 -> 5 retry, evaluated in parallel
instead of sequentially).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

# Bresenham circle of radius 3, clockwise from 12 o'clock: (dx, dy)
CIRCLE16 = (
    (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
    (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3),
)


def _shifted_views(img: jax.Array) -> jax.Array:
    """Return [16, H, W]: the circle-16 neighbor intensity of each pixel.

    Implemented as static pad+slice (no dynamic shapes); border pixels see
    replicated values but are masked out of detection anyway.
    """
    H, W = img.shape
    p = jnp.pad(img, 3, mode="edge")
    views = [p[3 + dy : 3 + dy + H, 3 + dx : 3 + dx + W] for (dx, dy) in CIRCLE16]
    return jnp.stack(views, axis=0)


def _arc9_mask(bits: jax.Array) -> jax.Array:
    """Given int32 bit-packed 16 circle flags per pixel, return True where
    there exists a contiguous circular run of >= 9 set bits.

    Wrap-around handled by doubling the ring: m32 = bits | bits << 16,
    then run-length collapse with shift-ANDs: runs >= 9 iff
    (m & m>>1 & m>>2 & ... & m>>8) has any bit set in the low 16.
    The 9-AND chain is done in log steps: r2 = m & m>>1 (runs>=2),
    r4 = r2 & r2>>2 (>=4), r8 = r4 & r4>>4 (>=8), r9 = r8 & m>>8 (>=9).
    """
    m = bits | (bits << 16)
    r2 = m & (m >> 1)
    r4 = r2 & (r2 >> 2)
    r8 = r4 & (r4 >> 4)
    r9 = r8 & (m >> 8)
    return (r9 & 0xFFFF) != 0


def _fast_score_from_diff(diff, interior, threshold, dtype):
    t = jnp.asarray(threshold, dtype)
    bright = diff > t
    dark = diff < -t

    weights = (1 << jnp.arange(16, dtype=jnp.int32))[:, None, None]
    bright_bits = jnp.sum(jnp.where(bright, weights, 0), axis=0)
    dark_bits = jnp.sum(jnp.where(dark, weights, 0), axis=0)

    is_bright = _arc9_mask(bright_bits)
    is_dark = _arc9_mask(dark_bits)

    bright_score = jnp.sum(jnp.where(bright, diff - t, 0.0), axis=0)
    dark_score = jnp.sum(jnp.where(dark, -diff - t, 0.0), axis=0)
    score = jnp.where(is_bright, bright_score, 0.0) + jnp.where(is_dark, dark_score, 0.0)
    return jnp.where(interior, score, 0.0).astype(dtype)


def _interior_mask(H, W):
    # exclude a 3px border (circle support) like the reference's edge margin
    ys = jnp.arange(H)[:, None]
    xs = jnp.arange(W)[None, :]
    return (ys >= 3) & (ys < H - 3) & (xs >= 3) & (xs < W - 3)


def fast_response(img: jax.Array, threshold: float) -> jax.Array:
    """Dense FAST-9 response map [H, W]: 0 where not a corner, else a
    positive score for NMS/ranking.

    Score: sum over circle points of |I_p - I_c| - t restricted to the
    passing polarity (the SAD-style score standard in parallel FAST
    implementations; equivalent ranking to OpenCV's for NMS purposes).
    """
    dtype = img.dtype
    views = _shifted_views(img)              # [16, H, W]
    diff = views - img[None]                 # neighbor - center
    H, W = img.shape
    return _fast_score_from_diff(diff, _interior_mask(H, W), threshold, dtype)


def fast_response2(img: jax.Array, t_hi: float, t_lo: float):
    """Both threshold response maps from ONE set of shifted views/diffs
    (the extractor always evaluates the 20/5 pair; the ring gather +
    differencing is the expensive half of the dense test)."""
    dtype = img.dtype
    views = _shifted_views(img)
    diff = views - img[None]
    H, W = img.shape
    interior = _interior_mask(H, W)
    return (_fast_score_from_diff(diff, interior, t_hi, dtype),
            _fast_score_from_diff(diff, interior, t_lo, dtype))


def harris_response(img: jax.Array, block: int = 7, k: float = 0.04) -> jax.Array:
    """Harris corner response (the reference's default score type,
    nScoreType=0; reference: src/ORBextractor.cc:655-659 HarrisResponses)."""
    from uvipslam_tpu.ops.image import box_filter, sobel_gradients

    gx, gy = sobel_gradients(img)
    a = box_filter(gx * gx, block)
    b = box_filter(gy * gy, block)
    c = box_filter(gx * gy, block)
    det = a * b - c * c
    tr = a + b
    return det - k * tr * tr


def nms(score: jax.Array, radius: int = 1) -> jax.Array:
    """Zero out non-local-maxima (window (2r+1)^2), keeping ties by
    top-left preference via strict comparison on a jittered copy."""
    w = 2 * radius + 1
    pooled = lax.reduce_window(
        score, jnp.asarray(-jnp.inf, score.dtype), lax.max, (w, w), (1, 1), "SAME"
    )
    return jnp.where(score >= pooled, score, 0.0)


def occupancy_suppress(
    score: jax.Array,
    occupied_xy: jax.Array,
    occupied_mask: jax.Array,
    radius: float,
) -> jax.Array:
    """Zero the response within `radius` pixels of existing tracked
    features — the reference's occupancy-grid suppression of KLT-tracked
    points during re-detection (reference: src/ORBextractor.cc:886-891,
    grid of Px_distance cells).

    Implemented by scattering occupied points into a binary image and
    dilating with a max-pool of the right window — O(HW), fully on device.
    """
    H, W = score.shape
    xi = jnp.round(occupied_xy[..., 0]).astype(jnp.int32)
    yi = jnp.round(occupied_xy[..., 1]).astype(jnp.int32)
    valid = occupied_mask & (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
    occ = jnp.zeros((H, W), dtype=jnp.float32)
    occ = occ.at[jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1)].max(
        jnp.where(valid, 1.0, 0.0)
    )
    r = int(radius)
    w = 2 * r + 1
    # separable dilation: two 1D max-pools instead of one (2r+1)^2 window
    # (same square structuring element, ~20x cheaper at these radii)
    zero = jnp.asarray(0.0, occ.dtype)
    dil = lax.reduce_window(occ, zero, lax.max, (w, 1), (1, 1), "SAME")
    dil = lax.reduce_window(dil, zero, lax.max, (1, w), (1, 1), "SAME")
    return jnp.where(dil > 0, 0.0, score)


def grid_topk(
    score: jax.Array,
    cell: int,
    max_feats: int,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Pick at most one winner per cell, then the global top `max_feats`.

    Returns (xy [N, 2] f32, score [N], valid [N] bool). This replaces the
    reference's quad-tree DistributeOctTree with a fixed grid — same goal
    (spatially even coverage), but a fixed-shape, single-pass reduction
    that maps onto TPU reshapes instead of a recursive tree.
    """
    H, W = score.shape
    gy = -(-H // cell)
    gx = -(-W // cell)
    Hp, Wp = gy * cell, gx * cell
    sp = jnp.pad(score, ((0, Hp - H), (0, Wp - W)), constant_values=0.0)
    cells = sp.reshape(gy, cell, gx, cell).transpose(0, 2, 1, 3).reshape(gy * gx, cell * cell)

    best = jnp.argmax(cells, axis=1)                      # [C]
    best_val = jnp.take_along_axis(cells, best[:, None], axis=1)[:, 0]
    cy = best // cell + (jnp.arange(gy * gx) // gx) * cell
    cx = best % cell + (jnp.arange(gy * gx) % gx) * cell

    k = min(max_feats, gy * gx)
    top_val, top_idx = lax.top_k(best_val, k)
    xy = jnp.stack([cx[top_idx].astype(score.dtype), cy[top_idx].astype(score.dtype)], axis=-1)
    valid = top_val > 0.0
    if k < max_feats:
        pad = max_feats - k
        xy = jnp.concatenate([xy, jnp.zeros((pad, 2), score.dtype)], axis=0)
        top_val = jnp.concatenate([top_val, jnp.zeros((pad,), score.dtype)], axis=0)
        valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)], axis=0)
    return xy, top_val, valid

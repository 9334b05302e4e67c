"""Pyramidal Lucas-Kanade optical flow, batched over features.

TPU-native equivalent of the reference's cv::calcOpticalFlowPyrLK with
21x21 windows over 5 pyramid levels with motion-model initial guesses
(reference: src/Tracking.cc:1043-1047 + cv::buildOpticalFlowPyramid in
src/FrameKTL.cc:76).

Design: classic coarse-to-fine inverse-compositional LK. Per level the
template patch + gradients are gathered once per feature (vmap over
features -> batched gathers), then a fixed-iteration Gauss-Newton loop
updates the flow. No per-feature early exit (lock-step iterations keep
shapes static); convergence is handled by the step-size damping that a
converged feature naturally reaches (updates ~0).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from uvipslam_tpu.ops.image import bilinear_sample, pyr_down, scharr_gradients


def build_flow_pyramid(img: jax.Array, levels: int = 5) -> list[jax.Array]:
    """[H, W] -> list of `levels` images, each 2x downsampled."""
    pyr = [img]
    for _ in range(1, levels):
        pyr.append(pyr_down(pyr[-1]))
    return pyr


def _patch_coords(win: int, dtype):
    r = win // 2
    ys, xs = jnp.mgrid[-r : r + 1, -r : r + 1]
    return xs.reshape(-1).astype(dtype), ys.reshape(-1).astype(dtype)


@functools.partial(jax.jit, static_argnames=("win", "iters", "levels"))
def klt_track(
    pyr_prev: tuple,
    pyr_next: tuple,
    pts_prev: jax.Array,        # [N, 2] level-0 coords in prev frame
    pts_guess: jax.Array,       # [N, 2] initial guess in next frame
    valid: jax.Array,           # [N] bool
    win: int = 21,
    iters: int = 10,
    levels: int = 5,
    min_eig_threshold: float = 1e-4,
    max_residual: float = 20.0,
) -> tuple[jax.Array, jax.Array]:
    """Track features from prev to next frame.

    Returns (pts_next [N, 2], ok [N] bool). `ok` mirrors OpenCV's status:
    in-bounds, well-conditioned gradient matrix, and bounded residual.
    """
    dtype = pts_prev.dtype
    px, py = _patch_coords(win, dtype)  # [win*win]
    n_px = win * win

    flow = (pts_guess - pts_prev) / (2.0 ** (levels - 1))
    ok = valid

    min_eig_ok = jnp.ones_like(valid)
    resid = jnp.zeros(pts_prev.shape[0], dtype)

    for l in range(levels - 1, -1, -1):
        scale = 2.0**l
        imA = pyr_prev[l]
        imB = pyr_next[l]
        gx, gy = scharr_gradients(imA)
        p_l = pts_prev / scale

        def gather(img, centers):
            xy = jnp.stack(
                [centers[:, 0:1] + px[None, :], centers[:, 1:2] + py[None, :]],
                axis=-1,
            )  # [N, win*win, 2]
            return bilinear_sample(img, xy)

        T = gather(imA, p_l)            # template [N, P]
        Tx = gather(gx, p_l)
        Ty = gather(gy, p_l)

        # 2x2 normal matrix per feature (inverse-compositional: constant)
        Gxx = jnp.sum(Tx * Tx, axis=1)
        Gxy = jnp.sum(Tx * Ty, axis=1)
        Gyy = jnp.sum(Ty * Ty, axis=1)
        det = Gxx * Gyy - Gxy * Gxy
        tr = Gxx + Gyy
        min_eig = (tr - jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0))) * 0.5 / n_px
        good_G = min_eig > min_eig_threshold
        safe_det = jnp.where(jnp.abs(det) < 1e-12, 1.0, det)

        if l == levels - 1:
            flow_l = flow
        else:
            flow_l = flow * 2.0

        def body(_, fl):
            I = gather(imB, p_l + fl)
            err = I - T
            bx = jnp.sum(err * Tx, axis=1)
            by = jnp.sum(err * Ty, axis=1)
            dx = -(Gyy * bx - Gxy * by) / safe_det
            dy = -(-Gxy * bx + Gxx * by) / safe_det
            step = jnp.stack([dx, dy], axis=-1)
            step = jnp.clip(step, -win, win)
            return fl + jnp.where(good_G[:, None], step, 0.0)

        flow_l = jax.lax.fori_loop(0, iters, body, flow_l)
        flow = flow_l
        min_eig_ok = min_eig_ok & good_G

        if l == 0:
            I = gather(imB, p_l + flow_l)
            resid = jnp.sum(jnp.abs(I - T), axis=1) / n_px

    pts_next = pts_prev + flow
    H, W = pyr_next[0].shape
    r = win // 2
    inb = (
        (pts_next[:, 0] >= r) & (pts_next[:, 0] < W - r)
        & (pts_next[:, 1] >= r) & (pts_next[:, 1] < H - r)
    )
    ok = ok & inb & min_eig_ok & (resid < max_residual)
    return pts_next, ok


def extract_templates(img: jax.Array, pts: jax.Array, win: int = 21):
    """Gather per-feature template patches + gradients for anchor
    refinement. Returns (T [N, P], Tx [N, P], Ty [N, P])."""
    dtype = pts.dtype
    px, py = _patch_coords(win, dtype)
    gx, gy = scharr_gradients(img)

    def gather(im):
        xy = jnp.stack(
            [pts[:, 0:1] + px[None, :], pts[:, 1:2] + py[None, :]], axis=-1
        )
        return bilinear_sample(im, xy)

    return gather(img), gather(gx), gather(gy)


@functools.partial(jax.jit, static_argnames=("win", "iters"))
def anchor_refine(
    img: jax.Array,          # current level-0 image
    T: jax.Array,            # [N, P] birth templates
    Tx: jax.Array,           # [N, P] template x-gradients
    Ty: jax.Array,           # [N, P] template y-gradients
    pts: jax.Array,          # [N, 2] chained-KLT positions (start)
    valid: jax.Array,        # [N]
    win: int = 21,
    iters: int = 8,
    max_correction: float = 2.5,
    max_residual: float = 12.0,
):
    """Refine feature positions against their BIRTH templates
    (inverse-compositional LK with a fixed anchor template).

    This eliminates the frame-chaining drift inherent to the reference's
    calcOpticalFlowPyrLK pipeline (each ~0.05-0.1 px/frame of template
    slide compounds into systematic pose bias over long-lived tracks).
    Falls back to the chained position when the template has gone stale
    (large residual) or the correction is implausibly large.

    Returns (pts_refined [N, 2], refined [N] bool).
    """
    dtype = pts.dtype
    px, py = _patch_coords(win, dtype)
    n_px = win * win

    Gxx = jnp.sum(Tx * Tx, axis=1)
    Gxy = jnp.sum(Tx * Ty, axis=1)
    Gyy = jnp.sum(Ty * Ty, axis=1)
    det = Gxx * Gyy - Gxy * Gxy
    safe_det = jnp.where(jnp.abs(det) < 1e-12, 1.0, det)
    good_G = det > 1e-9

    def gather(centers):
        xy = jnp.stack(
            [centers[:, 0:1] + px[None, :], centers[:, 1:2] + py[None, :]],
            axis=-1,
        )
        return bilinear_sample(img, xy)

    def body(_, p):
        I = gather(p)
        err = I - T
        bx = jnp.sum(err * Tx, axis=1)
        by = jnp.sum(err * Ty, axis=1)
        dx = -(Gyy * bx - Gxy * by) / safe_det
        dy = -(-Gxy * bx + Gxx * by) / safe_det
        step = jnp.clip(jnp.stack([dx, dy], axis=-1), -3.0, 3.0)
        return p + jnp.where(good_G[:, None], step, 0.0)

    refined_pts = jax.lax.fori_loop(0, iters, body, pts)
    resid = jnp.sum(jnp.abs(gather(refined_pts) - T), axis=1) / n_px
    corr = jnp.linalg.norm(refined_pts - pts, axis=-1)
    accept = valid & good_G & (corr <= max_correction) & (resid < max_residual)
    out = jnp.where(accept[:, None], refined_pts, pts)
    return out, accept

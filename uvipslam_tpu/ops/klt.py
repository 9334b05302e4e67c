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


def global_shift(img_a: jax.Array, img_b: jax.Array, radius: int = 8):
    """Estimate the dominant integer translation a->b on small images by
    brute-force SSD over (2r+1)^2 shifts (one fused VPU pass; replaces
    the capture-range role of the multi-level KLT pyramid for the
    translation-dominant inter-frame motion of video).

    Returns (dx, dy) such that b(x) ~= a(x - d) => features move by +d.

    Formulation:  SSD(d) = sum(a^2) - 2 corr(b, a)[d] + boxsum(b^2)[d]
    with corr computed by FFT (circular correlation is exactly linear
    here because b's size equals crop + 2r) and boxsum by an integral
    image — both O(HW log HW) / O(HW). The naive big-kernel
    `conv_general_dilated` forms run at <1 GFLOP/s on TPU (measured
    ~47 ms/frame at 128x160 — half the tracker's whole frame budget)."""
    H, W = img_a.shape
    # clamp radius so the center crop stays non-empty on tiny images
    r = min(radius, (min(H, W) - 2) // 2)
    n = 2 * r + 1
    Hc, Wc = H - 2 * r, W - 2 * r
    a = img_a[r:H - r, r:W - r]

    # cross-correlation corr[dy, dx] = sum_{y,x} a[y,x] b[y+dy, x+dx]:
    # b is (Hc + n - 1, Wc + n - 1), so circular correlation with a
    # zero-padded to b's shape has NO wraparound in the first n x n block
    fb = jnp.fft.rfft2(img_b)
    fa = jnp.fft.rfft2(a, s=img_b.shape)
    corr = jnp.fft.irfft2(fb * jnp.conj(fa), s=img_b.shape)[:n, :n]

    # boxsum(b^2) over Hc x Wc windows via integral image
    b2 = img_b * img_b
    ii = jnp.pad(jnp.cumsum(jnp.cumsum(b2, axis=0), axis=1), ((1, 0), (1, 0)))
    box = (ii[Hc:Hc + n, Wc:Wc + n] - ii[Hc:Hc + n, :n]
           - ii[:n, Wc:Wc + n] + ii[:n, :n])

    costs = box - 2.0 * corr                                      # + const
    k = jnp.argmin(costs)
    dy = k // n - r
    dx = k % n - r
    return jnp.stack([dx, dy]).astype(img_a.dtype)


def _interp_operator(off: jax.Array, size_out: int, size_in: int) -> jax.Array:
    """[N] fractional start offsets -> [N, size_out, size_in] separable
    bilinear sampling operators (hat-function rows: each output position
    j reads input coordinate off + j with linear weights). Built from
    iota comparisons — NO gathers; applying it is a small matmul."""
    j = jnp.arange(size_out, dtype=off.dtype)[None, :, None]
    k = jnp.arange(size_in, dtype=off.dtype)[None, None, :]
    x = off[:, None, None] + j
    return jnp.clip(1.0 - jnp.abs(x - k), 0.0, 1.0)


def _extract_patches(img: jax.Array, pts: jax.Array, psize: int):
    """Per-feature [psize, psize] patches whose top-left integer corner is
    floor(pts) - psize//2, via two chained dynamic-slices (row block then
    column block) — coalesced vector loads instead of scalar gathers.
    (Measured: a direct [N, P, P] element gather is 2x SLOWER on TPU than
    this slab form despite the [N, P, W] intermediate — TPU gathers are
    scalar-indexed, the slices are vector loads.)
    Returns (patches [N, P, P], local [N, 2] fractional feature position
    inside the patch)."""
    H, W = img.shape
    half = psize // 2
    x0 = jnp.clip(jnp.floor(pts[:, 0]).astype(jnp.int32) - half, 0, W - psize)
    y0 = jnp.clip(jnp.floor(pts[:, 1]).astype(jnp.int32) - half, 0, H - psize)

    rows = jax.vmap(lambda y: jax.lax.dynamic_slice_in_dim(img, y, psize, 0))(y0)
    patches = jax.vmap(
        lambda r, x: jax.lax.dynamic_slice_in_dim(r, x, psize, 1)
    )(rows, x0)
    local = pts - jnp.stack([x0, y0], -1).astype(pts.dtype)
    return patches, local


def _sample_patch(patches: jax.Array, center: jax.Array, win: int) -> jax.Array:
    """Bilinear-sample a [win, win] window centered at fractional `center`
    [N, 2] (patch coords) from [N, Py, Px] patches — two interpolation
    matmuls, zero gathers. Returns [N, win, win]."""
    Py = patches.shape[-2]
    Px = patches.shape[-1]
    r = win // 2
    Wy = _interp_operator(center[:, 1] - r, win, Py)   # [N, win, Py]
    Wx = _interp_operator(center[:, 0] - r, win, Px)
    tmp = jnp.einsum("nip,npq->niq", Wy, patches)
    return jnp.einsum("niq,njq->nij", tmp, Wx)


# ---------------------------------------------------------------------------
# Pallas patch extraction (TPU): the slab form above materializes an
# [N, P, W] HBM intermediate (~21 MB at bench shapes) and re-reads it for
# the column slice; the kernel keeps the IMAGE resident in VMEM and each
# program emits its [P_rows, 128] window directly — HBM traffic drops to
# the image (once) + the packed patches.

_PATCH_LANES = 128          # patch width = one lane tile
_FEATS_PER_PROG = 8


def _extract_patches_pallas(img: jax.Array, pts: jax.Array, psize: int):
    """TPU kernel form of `_extract_patches`. Returns
    (patches [N, PR, 128], local [N, 2]) where PR = roundup(psize+8, 8);
    the guaranteed-real content covers at least the [psize, psize]
    neighborhood of each point recorded by `local` (patch coords).

    Alignment rules (Mosaic): dynamic row starts must be sublane (8)
    aligned -> snap y down and carry the remainder in `local`; dynamic
    column starts must be lane (128) aligned -> slice an aligned 256-wide
    window and rotate the residual offset with a dynamic `pltpu.roll`."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    H, W = img.shape
    N = pts.shape[0]
    PR = ((psize + 8) + 7) // 8 * 8
    PL = _PATCH_LANES
    G = _FEATS_PER_PROG
    assert psize <= PL - 1, psize
    # pad the image so the aligned slices below always exist
    Hp = max((H + 7) // 8 * 8, PR)
    Wp = max((W + 127) // 128 * 128, 2 * PL)
    if (Hp, Wp) != (H, W):
        img = jnp.pad(img, ((0, Hp - H), (0, Wp - W)))
    Np = (N + G - 1) // G * G

    half = psize // 2
    x0 = jnp.clip(jnp.floor(pts[:, 0]).astype(jnp.int32) - half, 0, W - psize)
    y0 = jnp.clip(jnp.floor(pts[:, 1]).astype(jnp.int32) - half, 0, H - psize)
    # content window start actually extracted
    x0c = jnp.minimum(x0, Wp - PL)
    ya = jnp.minimum((y0 // 8) * 8, Hp - PR)
    local = pts - jnp.stack([x0c, ya], -1).astype(pts.dtype)
    if Np != N:
        pad = Np - N
        x0c = jnp.concatenate([x0c, jnp.zeros((pad,), jnp.int32)])
        ya = jnp.concatenate([ya, jnp.zeros((pad,), jnp.int32)])

    def kernel(x0_ref, ya_ref, img_ref, out_ref):
        g = pl.program_id(0)
        for j in range(G):
            i = g * G + j
            x0i = x0_ref[i]
            yai = pl.multiple_of(ya_ref[i], 8)
            xa = pl.multiple_of(
                jnp.minimum((x0i // PL) * PL, Wp - 2 * PL), PL)
            blk = img_ref[pl.ds(yai, PR), pl.ds(xa, 2 * PL)]
            rolled = pltpu.roll(blk, shift=2 * PL - (x0i - xa), axis=1)
            out_ref[j] = rolled[:, :PL]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(Np // G,),
        in_specs=[pl.BlockSpec((Hp, Wp), lambda g, xr, yr: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((G, PR, PL), lambda g, xr, yr: (g, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    patches = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Np, PR, PL), img.dtype),
        grid_spec=grid_spec,
    )(x0c, ya, img)
    return patches[:N], local


def _use_pallas() -> bool:
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


def extract_patches_any(img: jax.Array, pts: jax.Array, psize: int):
    """Backend dispatch: Pallas kernel on TPU (image stays in VMEM, no
    [N, P, W] slab), chained dynamic-slice slabs elsewhere (CPU tests)."""
    if _use_pallas():
        return _extract_patches_pallas(img, pts, psize)
    return _extract_patches(img, pts, psize)


@functools.partial(jax.jit, static_argnames=("win", "iters", "max_correction"))
def anchor_refine_fast(
    img: jax.Array,
    T: jax.Array,            # [N, win*win] templates
    Tx: jax.Array,           # [N, win*win]
    Ty: jax.Array,           # [N, win*win]
    pts: jax.Array,          # [N, 2] start positions
    valid: jax.Array,
    win: int = 13,
    iters: int = 8,
    max_correction: float = 4.0,
    max_residual: float = 32.0,
):
    """Gather-free drop-in for `anchor_refine`: one coalesced patch
    extraction per track, then fixed GN iterations whose bilinear
    sampling is expressed as separable interpolation matmuls (MXU/VPU
    work; TPU scalar gathers are ~100x slower than this)."""
    dtype = pts.dtype
    N = pts.shape[0]
    margin = int(max_correction) + 2
    psize = win + 2 * margin

    patches, local = extract_patches_any(img, pts, psize)

    Gxx = jnp.sum(Tx * Tx, axis=1)
    Gxy = jnp.sum(Tx * Ty, axis=1)
    Gyy = jnp.sum(Ty * Ty, axis=1)
    det = Gxx * Gyy - Gxy * Gxy
    safe_det = jnp.where(jnp.abs(det) < 1e-12, 1.0, det)
    good_G = det > 1e-9

    # per-axis clamp bounds from the ACTUAL patch shape (the Pallas form
    # returns [PR, 128] patches; the slab form [psize, psize])
    r = win // 2
    lo = jnp.asarray(r, dtype)
    hi = jnp.asarray(
        [patches.shape[-1] - r - 2, patches.shape[-2] - r - 2], dtype)

    def body(_, p):
        I = _sample_patch(patches, p, win).reshape(N, -1)
        err = I - T
        bx = jnp.sum(err * Tx, axis=1)
        by = jnp.sum(err * Ty, axis=1)
        dx = -(Gyy * bx - Gxy * by) / safe_det
        dy = -(-Gxy * bx + Gxx * by) / safe_det
        step = jnp.clip(jnp.stack([dx, dy], axis=-1), -3.0, 3.0)
        p2 = p + jnp.where(good_G[:, None], step, 0.0)
        return jnp.clip(p2, lo, hi)

    p = jax.lax.fori_loop(0, iters, body, local)
    resid = jnp.sum(jnp.abs(_sample_patch(patches, p, win).reshape(N, -1) - T), axis=1) / (win * win)
    corr = jnp.linalg.norm(p - local, axis=-1)
    accept = valid & good_G & (corr <= max_correction) & (resid < max_residual)
    out_pts = pts + (p - local)
    out = jnp.where(accept[:, None], out_pts, pts)
    return out, accept


def extract_templates_fast(img: jax.Array, pts: jax.Array, win: int = 13):
    """Gather-free template + gradient extraction (pairs with
    anchor_refine_fast): patch pull + interpolation-matmul sampling of a
    (win+2) window, central differences for the gradients."""
    N = pts.shape[0]
    psize = win + 6
    patches, local = extract_patches_any(img, pts, psize)
    big = _sample_patch(patches, local, win + 2)       # [N, win+2, win+2]
    T = big[:, 1:-1, 1:-1]
    Tx = 0.5 * (big[:, 1:-1, 2:] - big[:, 1:-1, :-2])
    Ty = 0.5 * (big[:, 2:, 1:-1] - big[:, :-2, 1:-1])
    return (T.reshape(N, -1), Tx.reshape(N, -1), Ty.reshape(N, -1))


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

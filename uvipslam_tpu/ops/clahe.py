"""CLAHE (contrast-limited adaptive histogram equalization) on device.

TPU-native equivalent of the reference's cv::createCLAHE(clip=4,
tiles=12x12) image enhancement applied to every frame when Enhance=1
(reference: src/Tracking.cc:425-431).

Design: per-tile 256-bin histograms via batched bincount, clip +
uniform redistribution (one-shot, as OpenCV does), per-tile CDF LUTs,
then bilinearly interpolated LUT application — all fixed-shape tensor
ops that XLA fuses; no host round trips.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("clip_limit", "tiles"))
def clahe(img: jax.Array, clip_limit: float = 4.0, tiles: tuple[int, int] = (12, 12)) -> jax.Array:
    """Apply CLAHE to a [H, W] image with values in [0, 255] (f32).

    Image dims need not divide the tile grid; edge tiles absorb the
    remainder via BORDER_REFLECT_101-style padding to a divisible size,
    exactly as OpenCV extends the image.
    """
    H, W = img.shape
    ty, tx = tiles
    th = -(-H // ty)  # ceil
    tw = -(-W // tx)
    Hp, Wp = th * ty, tw * tx
    imgp = jnp.pad(img, ((0, Hp - H), (0, Wp - W)), mode="reflect")

    iv = jnp.clip(imgp, 0, 255).astype(jnp.int32)
    tiles_px = iv.reshape(ty, th, tx, tw).transpose(0, 2, 1, 3).reshape(ty * tx, th * tw)

    hist = jax.vmap(lambda x: jnp.bincount(x, length=256))(tiles_px)  # [T, 256]

    # clip limit in counts (OpenCV: max(int(clip*area/256), 1)) and OpenCV's
    # exact integer redistribution: excess // 256 to every bin, then the
    # residual dropped one count at a time on bins 0, s, 2s, ... with
    # s = max(256 // residual, 1).
    area = th * tw
    limit = max(int(clip_limit * area / 256.0), 1)
    clipped = jnp.minimum(hist, limit)
    excess = jnp.sum(hist - clipped, axis=1, keepdims=True)  # [T, 1] int
    batch = excess // 256
    residual = excess - batch * 256
    idx = jnp.arange(256, dtype=jnp.int32)[None, :]
    step = jnp.maximum(256 // jnp.maximum(residual, 1), 1)
    bump = ((idx % step) == 0) & ((idx // step) < residual)
    redist = clipped + batch + bump.astype(hist.dtype)

    cdf = jnp.cumsum(redist, axis=1).astype(img.dtype)
    # scale so the LUT maps to [0, 255]
    lut = jnp.clip(jnp.round(cdf * (255.0 / area)), 0, 255)  # [T, 256]
    lut = lut.reshape(ty, tx, 256)

    # --- bilinear interpolation between neighboring tile LUTs -------------
    ys = jnp.arange(Hp, dtype=img.dtype)
    xs = jnp.arange(Wp, dtype=img.dtype)
    # OpenCV tile coordinate convention: txf = x / tileW - 0.5, with the
    # fractional weight taken BEFORE index clamping.
    fy = ys / th - 0.5
    fx = xs / tw - 0.5
    y0f = jnp.floor(fy)
    x0f = jnp.floor(fx)
    wy = (fy - y0f)[:, None]
    wx = (fx - x0f)[None, :]
    y0 = jnp.clip(y0f, 0, ty - 1).astype(jnp.int32)
    x0 = jnp.clip(x0f, 0, tx - 1).astype(jnp.int32)
    y1 = jnp.clip(y0f + 1, 0, ty - 1).astype(jnp.int32)
    x1 = jnp.clip(x0f + 1, 0, tx - 1).astype(jnp.int32)

    pix = iv  # [Hp, Wp] intensities as LUT indices

    def lut_at(tyi, txi):
        # gather LUT values: lut[tyi[y], txi[x], pix[y, x]]
        return lut[tyi[:, None], txi[None, :], pix]

    v00 = lut_at(y0, x0)
    v01 = lut_at(y0, x1)
    v10 = lut_at(y1, x0)
    v11 = lut_at(y1, x1)
    out = (
        v00 * (1 - wy) * (1 - wx)
        + v01 * (1 - wy) * wx
        + v10 * wy * (1 - wx)
        + v11 * wy * wx
    )
    return out[:H, :W].astype(img.dtype)

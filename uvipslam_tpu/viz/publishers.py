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


def plot_map(path: str, m, trajectory=None, covis_th: int = 30,
             frustum_scale: float = 0.15) -> None:
    """Top-down map figure with the reference MapPublisher's marker set
    (reference: src/MapPublisher.cc:29-131 — points, keyframes,
    COVISIBILITY graph edges, SPANNING tree, current-camera frustum,
    pose trail)."""
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

    # covisibility graph (green web, reference :84-107) + spanning tree
    # (kf_prev chain, reference MST markers :109-127)
    if kfv.sum() >= 2:
        W = np.asarray(m.covisibility_matrix())
        ii, jj = np.nonzero(np.triu(W, 1) >= covis_th)
        for a, b in zip(ii, jj):
            if kfv[a] and kfv[b]:
                ax.plot([kfp[a, 0], kfp[b, 0]], [kfp[a, 1], kfp[b, 1]],
                        c="limegreen", lw=0.4, alpha=0.5, zorder=1)
        prev = np.asarray(m.kf_prev)
        for k in np.nonzero(kfv)[0]:
            p = prev[k]
            if p >= 0 and kfv[p]:
                ax.plot([kfp[k, 0], kfp[p, 0]], [kfp[k, 1], kfp[p, 1]],
                        c="navy", lw=0.7, zorder=2)

    if kfv.any():
        ax.plot(kfp[kfv, 0], kfp[kfv, 1], "b^", ms=4, label="keyframes")
        # current-camera frustum at the newest keyframe (reference
        # PublishCurrentCamera :140-163): a wedge along the optical axis
        k_last = int(np.nonzero(kfv)[0].max())
        from uvipslam_tpu.frontend.tracker import _ns_to_cam_pose
        import jax.tree_util as jtu
        Rcw, tcw = _ns_to_cam_pose(jtu.tree_map(lambda x: x[k_last], m.kf_ns))
        Rcw, tcw = np.asarray(Rcw), np.asarray(tcw)
        C = -Rcw.T @ tcw
        z = Rcw.T @ np.asarray([0.0, 0.0, 1.0])   # optical axis in world
        x = Rcw.T @ np.asarray([1.0, 0.0, 0.0])
        f = frustum_scale
        corners = [C + f * (2 * z + x), C + f * (2 * z - x)]
        for c in corners:
            ax.plot([C[0], c[0]], [C[1], c[1]], c="red", lw=1.2, zorder=3)
        ax.plot([corners[0][0], corners[1][0]],
                [corners[0][1], corners[1][1]], c="red", lw=1.2, zorder=3)

    if trajectory is not None and len(trajectory):
        traj = np.asarray(trajectory)
        ax.plot(traj[:, 0], traj[:, 1], "g-", lw=1.0, label="trajectory")
    ax.set_aspect("equal")
    ax.legend(loc="best", fontsize=8)
    ax.set_xlabel("x [m]")
    ax.set_ylabel("y [m]")
    fig.savefig(path, dpi=110, bbox_inches="tight")
    plt.close(fig)

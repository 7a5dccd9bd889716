"""Independent NumPy (float64) oracles of the reference math, used to verify
the JAX kernels numerically. These are deliberately written in plain NumPy
from the published equations (RA-L 2022 paper / SURVEY.md §2), structured
differently from both the reference and the framework under test.
"""
import numpy as np
from scipy.spatial import ConvexHull


def quat_normalize(q, eps=1e-12):
    return q / max(np.linalg.norm(q), eps)


def quat_rotmat(q):
    """wxyz quaternion -> 3x3 rotation matrix (R @ v rotates by q)."""
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def world_to_cam(pts, q_wxyz, t):
    """cam = R(q)^T (p - t), q normalized first."""
    q = quat_normalize(np.asarray(q_wxyz, dtype=np.float64))
    R = quat_rotmat(q)
    return (np.asarray(pts, dtype=np.float64) - np.asarray(t, dtype=np.float64)) @ R


def smooth_dist_mask(cam_pts, min_dist=1.0, max_dist=5.0):
    c = (min_dist + max_dist) / 2.0
    s = (max_dist - min_dist) / 2.0
    d = np.linalg.norm(cam_pts - c, axis=1)  # note: scalar center on all coords
    return np.exp(-0.5 * (d / s) ** 2)


def smooth_fov_mask(cam_pts, K, width, height, eps=1e-6):
    ph = cam_pts @ np.asarray(K, dtype=np.float64).T
    u, v, z = ph[:, 0], ph[:, 1], ph[:, 2]
    sig = 1.0 / (1.0 + np.exp(-z))
    wg = np.exp(-0.5 * ((u / (z + eps) - width / 2.0) / width) ** 2)
    hg = np.exp(-0.5 * ((v / (z + eps) - height / 2.0) / height) ** 2)
    return sig * wg * hg


def binary_fov_mask(cam_pts, K, width, height):
    ph = cam_pts @ np.asarray(K, dtype=np.float64).T
    with np.errstate(divide="ignore", invalid="ignore"):
        u = ph[:, 0] / ph[:, 2]
        v = ph[:, 1] / ph[:, 2]
    return (ph[:, 2] > 0) & (u > 1) & (u < width - 1) & (v > 1) & (v < height - 1)


def pose_loss(pts, q, t, K, width, height, min_dist=1.0, max_dist=5.0, eps=1e-6):
    cam = world_to_cam(pts, q, t)
    obs = smooth_dist_mask(cam, min_dist, max_dist) * smooth_fov_mask(cam, K, width, height, eps)
    return 1.0 / (obs.sum() + eps), obs


def traj_length(poses):
    return np.linalg.norm(np.diff(poses, axis=0), axis=1).sum()


def traj_mean_angle(poses, eps=1e-6):
    total = 0.0
    for i in range(1, len(poses) - 1):
        ab = poses[i - 1] - poses[i]
        ac = poses[i + 1] - poses[i]
        total += np.arccos(
            np.clip(ab @ ac / (np.linalg.norm(ab) * np.linalg.norm(ac) + eps), -1, 1)
        )
    return total / (len(poses) - 2)


def traj_loss(
    pts,
    poses,
    quats,
    poses0,
    K,
    width,
    height,
    min_dist=1.0,
    max_dist=5.0,
    smooth_w=14.0,
    length_w=0.02,
    eps=1e-6,
    wps_step=1,
):
    """Full ModelTraj criterion in float64. Returns (loss, terms, rewards)."""
    lo_sum = np.zeros(len(pts))
    for i in range(0, len(poses), wps_step):
        cam = world_to_cam(pts, quats[i], poses[i])
        p = smooth_dist_mask(cam, min_dist, max_dist) * smooth_fov_mask(
            cam, K, width, height, eps
        )
        p = p - p.min()
        p = p / p.max()
        p = np.clip(p, 0.5, 1.0 - eps)
        lo_sum += np.log(p / (1.0 - p))
    rewards = 1.0 / (1.0 + np.exp(-lo_sum))
    terms = {
        "vis": 1.0 / (rewards.mean() + eps),
        "l2": np.linalg.norm(poses[0] - poses0[0]),
        "smooth": smooth_w / (traj_mean_angle(poses, eps) + eps),
        "length": length_w * abs(traj_length(poses) - traj_length(poses0)),
    }
    return sum(terms.values()), terms, rewards


def spherical_flip(pts, R_param=2):
    norms = np.linalg.norm(pts, axis=1)
    radius = norms.max() * 10.0 ** R_param
    return pts * ((2.0 * (radius - norms) / norms) + 1.0)[:, None]


def hpr_visible_mask(pts, R_param=2):
    """Exact Katz HPR via Qhull: flip, add origin, hull vertices = visible."""
    flipped = spherical_flip(np.asarray(pts, dtype=np.float64), R_param)
    aug = np.vstack([flipped, np.zeros(3)])
    hull = ConvexHull(aug)
    vis = np.zeros(len(pts), dtype=bool)
    vis[[v for v in hull.vertices if v < len(pts)]] = True
    return vis

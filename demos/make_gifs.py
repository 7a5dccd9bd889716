#!/usr/bin/env python
"""Regenerate the reference README's demo GIFs from the real sample data.

The reference documents each mode with an rviz screen recording
(`/root/reference/README.md:27,52,64,71,80`: hpr.gif, cam_pose_opt.gif,
cam_wps_opt.gif, cam_traj_eval.gif, cam_traj_opt.gif). This demo produces
the same five artifacts headless: the actual optimizers run on cloud/path
index 10, frames come from ops.render (the Pulsar-equivalent splatter),
and the files are packed by the from-spec GIF89a encoder (bus/gif.py) —
no rviz, no PIL, no matplotlib.

  hpr.gif          visible (HPR) vs culled cloud from each waypoint camera
  cam_pose_opt.gif the view from a single camera pose as it optimizes
  cam_wps_opt.gif  one waypoint camera's view during X/Y/yaw refinement
  cam_traj_eval.gif log-odds reward fusion accumulating waypoint by waypoint
  cam_traj_opt.gif  overview of the path + rewards during optimization

Run: python demos/make_gifs.py [out_dir=demos/gifs] [frames=20]
     [opt_steps=200] [scale=4] [pc_index=10]
(scale divides the reference 1232x1616 camera resolution.)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

# ---------------------------------------------------------------------------
# small self-contained helpers (colors, cameras)

_VIRIDIS = np.array(  # 6-anchor approximation, enough for 8-bit GIF frames
    [[68, 1, 84], [59, 82, 139], [33, 145, 140],
     [94, 201, 98], [186, 222, 40], [253, 231, 37]], np.float32) / 255.0


def colormap(x: np.ndarray) -> np.ndarray:
    """Map values in [0, 1] to (…, 3) viridis-like RGB floats."""
    x = np.clip(np.asarray(x, np.float32), 0.0, 1.0) * (len(_VIRIDIS) - 1)
    lo = np.floor(x).astype(np.int32)
    hi = np.minimum(lo + 1, len(_VIRIDIS) - 1)
    t = (x - lo)[..., None]
    return _VIRIDIS[lo] * (1.0 - t) + _VIRIDIS[hi] * t


def overview_camera(points: np.ndarray, elev_deg=38.0, azim_deg=-50.0,
                    dist_scale=1.25):
    """A fixed scene-overview camera (C, R): cam = (p − C) @ R, +z forward,
    world +z up in the image — the rviz orbit view of the reference GIFs."""
    lo, hi = points.min(axis=0), points.max(axis=0)
    at = 0.5 * (lo + hi)
    dist = dist_scale * float(np.linalg.norm(hi - lo))
    e, a = np.deg2rad(elev_deg), np.deg2rad(azim_deg)
    C = at + dist * np.array(
        [np.cos(e) * np.cos(a), np.cos(e) * np.sin(a), np.sin(e)], np.float32)
    z = at - C
    z = z / np.linalg.norm(z)
    x = np.cross(z, [0.0, 0.0, 1.0])
    x = x / max(np.linalg.norm(x), 1e-9)
    y = np.cross(z, x)  # = −world-up for a level camera: v grows downward
    R = np.stack([x, y, z], axis=1).astype(np.float32)
    return C.astype(np.float32), R, dist


def to_uint8(img) -> np.ndarray:
    return np.clip(np.asarray(img) * 255.0, 0, 255).astype(np.uint8)


def main(argv=None):
    from trajectory_optimization_tpu.bus.launch import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from trajectory_optimization_tpu.bus.gif import encode_gif
    from trajectory_optimization_tpu.models.pose import (
        PoseProblem, init_pose_params, pose_forward)
    from trajectory_optimization_tpu.models.traj import (
        TrajProblem, init_traj_params, traj_forward)
    from trajectory_optimization_tpu.models.wps_opt import (
        WpsOptProblem, init_wps_params, wps_forward, wps_path)
    from trajectory_optimization_tpu.opt.engine import OptimizerConfig, OptimizerLoop
    from trajectory_optimization_tpu.ops.geometry import frustum_cull, to_camera_frame
    from trajectory_optimization_tpu.ops.hpr import hpr_mask_approx
    from trajectory_optimization_tpu.ops.render import render_point_cloud
    from trajectory_optimization_tpu.utils.data import (
        identity_quaternions, load_path, load_point_cloud)
    from trajectory_optimization_tpu.utils.intrinsics import default_intrinsics

    args = dict(a.split("=", 1) for a in (argv or sys.argv[1:]))
    here = os.path.dirname(os.path.abspath(__file__))
    out_dir = args.get("out_dir", os.path.join(here, "gifs"))
    n_frames = int(args.get("frames", 20))
    opt_steps = int(args.get("opt_steps", 200))
    scale = int(args.get("scale", 4))
    idx = int(args.get("pc_index", 10))
    os.makedirs(out_dir, exist_ok=True)

    root = os.path.join(here, "..")
    pts = load_point_cloud(
        os.path.join(root, f"data/points/point_cloud_{idx}.npz")).astype(np.float32)
    path = load_path(
        os.path.join(root, f"data/paths/path_poses_{idx}.npz")).astype(np.float32)
    quats0 = identity_quaternions(len(path)).astype(np.float32)

    intr = default_intrinsics()
    H, W = int(intr.height) // scale, int(intr.width) // scale
    Kc = np.asarray(intr.matrix(), np.float32).copy() / scale  # camera views
    Kc[2, 2] = 1.0
    P = jnp.asarray(pts)

    render = jax.jit(render_point_cloud, static_argnums=(2, 3),
                     static_argnames=("max_radius_px",))

    def cam_view(quat, trans, colors=None, zfar=12.0):
        cam = to_camera_frame(P, jnp.asarray(quat), jnp.asarray(trans))
        img = render(cam, jnp.asarray(Kc), H, W, colors=colors,
                     znear=0.3, zfar=zfar)
        return to_uint8(img)

    # one overview camera shared by the eval/traj GIFs
    C_ov, R_ov, dist = overview_camera(pts)
    Ho, Wo = 320, 426
    Ko = np.array([[1.1 * Ho, 0, Wo / 2], [0, 1.1 * Ho, Ho / 2], [0, 0, 1]],
                  np.float32)
    cam_ov = jnp.asarray((pts - C_ov) @ R_ov)

    def overlay_path(img, poses, rgb=(0.9, 0.1, 0.1)):
        """Splat the polyline through ``poses`` over an overview frame."""
        seg = np.repeat(poses, 2, axis=0)[1:-1].reshape(-1, 2, 3)
        t = np.linspace(0.0, 1.0, 12, dtype=np.float32)[None, :, None]
        line = (seg[:, :1] * (1 - t) + seg[:, 1:] * t).reshape(-1, 3)
        line = np.concatenate([poses, line]).astype(np.float32)
        cam = jnp.asarray((line - C_ov) @ R_ov)
        col = jnp.broadcast_to(jnp.asarray(rgb, jnp.float32), (len(line), 3))
        pimg = render(cam, jnp.asarray(Ko), Ho, Wo, colors=col,
                      znear=0.3, zfar=4.0 * dist, point_radius=0.35)
        pimg = np.asarray(pimg)
        hit = (pimg < 0.999).any(axis=2, keepdims=True)
        return np.where(hit, to_uint8(pimg), img)

    def overview(rewards=None, paths=()):
        col = None
        if rewards is not None:
            r = np.asarray(rewards, np.float32)
            col = jnp.asarray(colormap((r - 0.5) * 2.0))  # rewards live in [.5,1)
        img = to_uint8(render(cam_ov, jnp.asarray(Ko), Ho, Wo, colors=col,
                              znear=0.3, zfar=4.0 * dist))
        for poses, rgb in paths:
            img = overlay_path(img, poses, rgb)
        return img

    t00 = time.time()

    # ---- hpr.gif: per-waypoint visible cloud ------------------------------
    frames = []
    hpr_jit = jax.jit(lambda cam: hpr_mask_approx(cam))
    for w in range(len(path)):
        cam = to_camera_frame(P, jnp.asarray(quats0[w]), jnp.asarray(path[w]))
        vis = hpr_jit(cam)
        # hidden points in dim gray, visible in xyz colors — the reference
        # GIF's before/after contrast in one frame
        base = np.asarray(cam)
        lo, hi = base.min(), base.max()
        col = (base - lo) / max(hi - lo, 1e-9)
        col = np.where(np.asarray(vis)[:, None] > 0, col, 0.85)
        frames.append(cam_view(quats0[w], path[w], colors=jnp.asarray(col)))
    gif = os.path.join(out_dir, "hpr.gif")
    with open(gif, "wb") as f:
        f.write(encode_gif(frames, delay_cs=25))
    print(f"[make_gifs] {gif}: {len(frames)} frames {frames[0].shape[:2]}")

    # ---- cam_pose_opt.gif: the optimizing camera's own view ---------------
    prob_pose = PoseProblem(img_width=intr.width, img_height=intr.height)
    params = init_pose_params(path[len(path) // 2], quats0[0])
    loop = OptimizerLoop(
        lambda p: pose_forward(p, P, jnp.asarray(intr.matrix()), prob_pose),
        params, OptimizerConfig(lr_pose=0.02, lr_quat=0.02),
        pose_key="trans", quat_key="quat")
    seg = max(1, opt_steps // n_frames)
    frames = []
    for _ in range(n_frames):
        loop.run(seg)
        q, t = np.asarray(loop.params["quat"])[0], np.asarray(loop.params["trans"])[0]
        obs = np.asarray(loop.last_aux["observations"])
        frames.append(cam_view(q, t, colors=jnp.asarray(
            colormap(obs / max(obs.max(), 1e-9)))))
    gif = os.path.join(out_dir, "cam_pose_opt.gif")
    with open(gif, "wb") as f:
        f.write(encode_gif(frames, delay_cs=8))
    print(f"[make_gifs] {gif}: {len(frames)} frames")

    # ---- cam_wps_opt.gif: one waypoint during X/Y/yaw refinement ----------
    prob_wps = WpsOptProblem(img_width=intr.width, img_height=intr.height)
    wparams, frozen = init_wps_params(path, quats0)
    wloop = OptimizerLoop(
        lambda p: wps_forward(p, frozen, P, jnp.asarray(intr.matrix()), prob_wps),
        wparams, OptimizerConfig(lr_pose=0.05, lr_quat=0.05),
        pose_key="xy", quat_key="yaw")
    show = len(path) // 2
    frames = []
    for _ in range(n_frames):
        wloop.run(seg)
        trans, quats = wps_path(wloop.params, frozen)
        obs = np.asarray(wloop.last_aux["observations"][show])
        frames.append(cam_view(np.asarray(quats)[show], np.asarray(trans)[show],
                               colors=jnp.asarray(colormap(obs / max(obs.max(), 1e-9)))))
    gif = os.path.join(out_dir, "cam_wps_opt.gif")
    with open(gif, "wb") as f:
        f.write(encode_gif(frames, delay_cs=8))
    print(f"[make_gifs] {gif}: {len(frames)} frames")

    # ---- cam_traj_eval.gif: log-odds fusion accumulating along the path ---
    from trajectory_optimization_tpu.models.traj import observation_logodds
    from trajectory_optimization_tpu.ops.scores import waypoint_scores

    obs = jax.jit(waypoint_scores, static_argnums=(4, 5))(
        P, jnp.asarray(quats0), jnp.asarray(path), jnp.asarray(intr.matrix()),
        intr.width, intr.height)  # (W, N)
    # the model's own normalize→clip→log-odds (pinned quirks live there)
    lo = np.asarray(observation_logodds(
        obs, TrajProblem(img_width=intr.width, img_height=intr.height).eps))
    lo_cum = np.cumsum(lo, axis=0)  # per-prefix fusion
    frames = []
    for w in range(len(path)):
        rewards = 1.0 / (1.0 + np.exp(-lo_cum[w]))
        frames.append(overview(rewards, paths=[(path[: w + 1], (0.9, 0.1, 0.1))]))
    gif = os.path.join(out_dir, "cam_traj_eval.gif")
    with open(gif, "wb") as f:
        f.write(encode_gif(frames, delay_cs=20))
    print(f"[make_gifs] {gif}: {len(frames)} frames {frames[0].shape[:2]}")

    # ---- cam_traj_opt.gif: overview of the optimizing trajectory ----------
    prob_traj = TrajProblem(img_width=intr.width, img_height=intr.height)
    tparams = init_traj_params(path, quats0)
    tloop = OptimizerLoop(
        lambda p: traj_forward(p, P, jnp.asarray(intr.matrix()),
                               jnp.asarray(path), jnp.asarray(quats0), prob_traj),
        tparams, OptimizerConfig(lr_pose=0.1, lr_quat=0.02))
    frames = []
    for _ in range(n_frames):
        tloop.run(seg)
        rewards = np.asarray(tloop.last_aux["rewards"])
        cur = np.asarray(tloop.params["poses"])
        frames.append(overview(rewards, paths=[
            (path, (0.55, 0.55, 0.55)), (cur, (0.9, 0.1, 0.1))]))
    gif = os.path.join(out_dir, "cam_traj_opt.gif")
    with open(gif, "wb") as f:
        f.write(encode_gif(frames, delay_cs=8))
    print(f"[make_gifs] {gif}: {len(frames)} frames; total {time.time()-t00:.1f}s")
    return out_dir


if __name__ == "__main__":
    main()

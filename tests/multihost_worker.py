"""Subprocess worker for the real multi-process multihost test.

Launched (not imported) by tests/test_multihost_process.py, twice, with
argv = [pid, nproc, port, outdir]. Each process owns 2 virtual CPU devices;
together they form the 4-device ('wps'=1, 'pts'=4) multihost mesh that
parallel.multihost builds over the distributed runtime, with cross-process
collectives riding Gloo — the CPU stand-in for DCN.

The worker runs N full sharded-Pallas train steps (the production multi-chip
path, parallel.sharded.make_sharded_train_step backend='pallas') on per-
process cloud slices assembled via shard_points_multihost, then process 0
saves the final params next to a single-device ground truth computed from
the full cloud (models.traj.traj_forward + the same optimizer) for the
parent test to compare.
"""
import os
import sys


def main() -> None:
    pid, nproc, port, outdir = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]

    os.environ["JAX_PLATFORMS"] = "cpu"
    xla_flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in xla_flags:
        os.environ["XLA_FLAGS"] = (
            xla_flags + " --xla_force_host_platform_device_count=2"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")  # sitecustomize registers the TPU plugin
    jax.distributed.initialize(f"localhost:{port}", num_processes=nproc, process_id=pid)

    import jax.numpy as jnp
    import numpy as np
    import optax

    from trajectory_optimization_tpu.models.traj import (
        TrajProblem,
        init_traj_params,
        traj_forward,
    )
    from trajectory_optimization_tpu.opt.engine import OptimizerConfig, make_optimizer
    from trajectory_optimization_tpu.parallel.multihost import (
        make_multihost_mesh,
        shard_points_multihost,
    )
    from trajectory_optimization_tpu.parallel.sharded import make_sharded_train_step
    from trajectory_optimization_tpu.parallel.sharded_pallas import pad_multiple
    from trajectory_optimization_tpu.utils.data import identity_quaternions
    from trajectory_optimization_tpu.utils.intrinsics import default_intrinsics

    assert len(jax.devices()) == 2 * nproc, jax.devices()
    mesh = make_multihost_mesh()
    assert dict(mesh.shape) == {"wps": 1, "pts": 2 * nproc}

    # Deterministic shared workload: every process regenerates the same full
    # cloud and takes its own contiguous slice (as a real multi-host loader
    # would read its own shard of a dataset).
    n_pts = pad_multiple(mesh)  # smallest legal cloud: 8*128*4 = 4096
    rng = np.random.default_rng(7)
    full = rng.uniform(-10.0, 10.0, size=(n_pts, 3)).astype(np.float32)
    t = np.linspace(0.0, 1.0, 8, dtype=np.float32)
    poses0 = np.stack([12.0 * t, 4.0 * np.sin(3.0 * t), np.zeros_like(t)], axis=1)
    quats0 = identity_quaternions(len(poses0))

    n_local = n_pts // nproc
    local = full[pid * n_local : (pid + 1) * n_local]
    pts, valid = shard_points_multihost(mesh, local, np.ones(n_local, np.float32))

    intr = default_intrinsics()
    problem = TrajProblem(
        img_width=intr.width, img_height=intr.height, wps_step=1, backend="pallas"
    )
    cfg = OptimizerConfig(lr_pose=0.1, lr_quat=0.02)
    init_fn, step_fn = make_sharded_train_step(mesh, problem, cfg)
    params = init_traj_params(poses0, quats0)
    opt_state = init_fn(params)
    K = intr.matrix()
    p0, q0 = jnp.asarray(poses0), jnp.asarray(quats0)

    n_steps = 3
    for _ in range(n_steps):
        params, opt_state, loss, _ = step_fn(params, opt_state, pts, valid, K, p0, q0)
    loss_f = float(loss)  # replicated scalar: addressable from every process
    assert np.isfinite(loss_f), loss_f

    if pid == 0:
        # Single-device ground truth on the full cloud (XLA batched path).
        prob_x = TrajProblem(
            img_width=intr.width, img_height=intr.height, wps_step=1, backend="xla"
        )
        tx = make_optimizer(cfg)

        @jax.jit
        def ref_step(state):
            p, o = state
            (l, _), g = jax.value_and_grad(
                lambda q: traj_forward(q, jnp.asarray(full), K, p0, q0, prob_x), has_aux=True
            )(p)
            up, o = tx.update(g, o, p)
            return (optax.apply_updates(p, up), o), l

        state = (init_traj_params(poses0, quats0), tx.init(init_traj_params(poses0, quats0)))
        for _ in range(n_steps):
            state, ref_loss = ref_step(state)
        np.savez(
            os.path.join(outdir, "result.npz"),
            poses=np.asarray(params["poses"]),
            quats=np.asarray(params["quats"]),
            ref_poses=np.asarray(state[0]["poses"]),
            ref_quats=np.asarray(state[0]["quats"]),
            loss=loss_f,
            ref_loss=float(ref_loss),
        )
    print(f"[worker {pid}] ok loss={loss_f}", flush=True)


if __name__ == "__main__":
    main()

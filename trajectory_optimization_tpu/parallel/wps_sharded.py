"""Multi-chip Waypoints Optimization: per-waypoint X/Y/yaw over a point mesh.

Scales ``models.wps_opt`` (the reference README's cam_wps_opt mode,
`README.md:66-71`) to clouds larger than one chip: the point axis is sharded
over the mesh, every shard scores ALL W waypoints against its point slice
((W, N_local) local work — the waypoint axis stays replicated because the
per-waypoint parameter state is tiny), and the only cross-chip traffic is
ONE ``psum`` of the (W,) per-waypoint observation sums. Gradients transpose
that psum to an identity, so the backward is as local as the forward.

The optimizable params ({'xy': (W, 2), 'yaw': (W,)}), frozen path parts,
Adam state and per-waypoint losses are replicated; points/valid and the
(W, N) observations stay sharded. Parity with the single-chip
``wps_forward`` is pinned on the virtual CPU mesh in tests/test_wps_eval.py.

``soft_hpr`` is not offered here: the reference's waypoints mode has no
occlusion gating, and occlusion-aware multi-chip refinement of a single
pose is already served by ``parallel.pose_sharded`` (run it per waypoint,
or use the trajectory step ``parallel.traj_sharded`` for the fused model).
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from trajectory_optimization_tpu.models.wps_opt import WpsOptProblem, wps_path
from trajectory_optimization_tpu.ops.scores import waypoint_scores
from trajectory_optimization_tpu.opt.engine import OptimizerConfig, make_optimizer
from trajectory_optimization_tpu.parallel.mesh import replicated

__all__ = ["wps_loss_sharded", "make_sharded_wps_step"]


def _build_local(problem: WpsOptProblem, axis: str):
    """Per-shard loss body (runs under shard_map over ``axis``)."""
    if problem.soft_hpr:
        raise NotImplementedError(
            "wps_sharded has no soft_hpr path (see module docstring; use "
            "parallel.pose_sharded per waypoint or parallel.traj_sharded)")

    def local(params, frozen, points_l, valid_l, K):
        trans, quats = wps_path(params, frozen)  # replicated tiny math
        mask = waypoint_scores(
            points_l, quats, trans, K,
            problem.img_width, problem.img_height,
            min_dist=problem.min_dist, max_dist=problem.max_dist,
            eps=problem.eps,
        ) * valid_l[None, :]  # (W, N_local)
        per_wp = jax.lax.psum(jnp.sum(mask, axis=-1), axis)  # (W,) replicated
        losses = 1.0 / (per_wp + problem.eps)
        aux = {
            "losses": losses,
            "observations": mask,
            "mean_reward": jnp.mean(per_wp),
        }
        return jnp.sum(losses), aux

    return local


def wps_loss_sharded(
    mesh: Mesh,
    params,
    frozen,
    points,
    valid,
    K,
    problem: WpsOptProblem,
    *,
    axis: str = "pts",
    occlusion_mask=None,
):
    """Summed per-waypoint loss with the point axis sharded over ``axis``.

    Traceable under an outer jit / value_and_grad. Returns (loss, aux) with
    aux = {'losses' (W,), 'observations' (W, N) sharded on the point axis,
    'mean_reward' scalar} — the single-chip ``wps_forward`` contract.

    ``occlusion_mask`` is the single-chip ``wps_forward`` static hard-HPR
    gate, an (N,) weight multiplied into every waypoint's scores. Here it
    folds into ``valid`` (both multiply the (W, N) mask elementwise —
    exactly equivalent), so it shards along ``axis`` with the points.
    """
    n, d = points.shape[0], mesh.shape[axis]
    if n % d != 0:
        raise ValueError(
            f"cloud size {n} not divisible by mesh axis '{axis}'={d}; "
            "pad with a valid mask first (utils.data.pad_points)")
    valid = jnp.asarray(valid, jnp.float32)
    if occlusion_mask is not None:
        valid = valid * jnp.asarray(occlusion_mask, jnp.float32)
    local = _build_local(problem, axis)
    f = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(axis, None), P(axis), P()),
        out_specs=(
            P(),
            {"losses": P(), "observations": P(None, axis), "mean_reward": P()},
        ),
    )
    return f(params, frozen, points, valid, K)


def make_sharded_wps_step(
    mesh: Mesh,
    problem: WpsOptProblem,
    cfg: OptimizerConfig,
    *,
    axis: str = "pts",
) -> Tuple[Callable, Callable]:
    """Build (init_fn, step_fn) for multi-chip waypoint refinement.

    ``step_fn(params, opt_state, frozen, points, valid, K) -> (params,
    opt_state, losses, observations)`` — one jitted dispatch per Adam step;
    ``losses`` is the replicated (W,) per-waypoint vector, observations stay
    sharded for lazy fetching. Two-group Adam on ('xy', 'yaw') exactly like
    the single-chip engine path. A static hard-occlusion gate (single-chip
    ``wps_forward(occlusion_mask=...)``) folds into ``valid`` before the
    step — exactly equivalent (both multiply the scores elementwise).
    """
    if problem.soft_hpr:
        # fail at build, not first trace — same contract as
        # make_sharded_traj_step's build-time soft_hpr validation
        raise NotImplementedError(
            "wps_sharded has no soft_hpr path (see module docstring; use "
            "parallel.pose_sharded per waypoint or parallel.traj_sharded)")
    tx = make_optimizer(cfg, pose_key="xy", quat_key="yaw")
    rep = replicated(mesh)
    ps_1d = NamedSharding(mesh, P(axis))
    ps_2d = NamedSharding(mesh, P(axis, None))
    ps_wn = NamedSharding(mesh, P(None, axis))

    def loss_fn(params, frozen, points, valid, K):
        return wps_loss_sharded(
            mesh, params, frozen, points, valid, K, problem, axis=axis)

    def init_fn(params):
        return jax.device_put(tx.init(params), rep)

    @partial(
        jax.jit,
        donate_argnums=(0, 1),
        in_shardings=(rep, rep, rep, ps_2d, ps_1d, rep),
        out_shardings=(rep, rep, rep, ps_wn),
    )
    def step_fn(params, opt_state, frozen, points, valid, K):
        (_, aux), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, frozen, points, valid, K)
        losses, obs = aux["losses"], aux["observations"]
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, losses, obs

    return init_fn, step_fn

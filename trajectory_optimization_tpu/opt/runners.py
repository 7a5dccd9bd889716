"""Cached problem runners: compile once per (problem, config, shapes),
reuse across messages.

The naive serving pattern — build a fresh loss closure per message and call
the jitted engine — recompiles every callback (closures hash by identity),
turning a 15 ms optimization into a 25 s one. These factories take the
*data as arguments* and are memoized on the hashable problem/config
dataclasses, so the node/facade layers hit the XLA executable cache for
every message of the same shape bucket.
"""
from __future__ import annotations

import functools


import jax
import jax.numpy as jnp
import optax

from trajectory_optimization_tpu.models.pose import PoseProblem, pose_forward
from trajectory_optimization_tpu.models.traj import TrajProblem, traj_forward
from trajectory_optimization_tpu.opt.engine import EarlyStop, OptimizerConfig, make_optimizer


@functools.lru_cache(maxsize=64)
def traj_runner(
    problem: TrajProblem,
    cfg: OptimizerConfig,
    stop: EarlyStop,
    n_steps: int,
):
    """Jitted full trajectory optimization:
    run(params, points, valid, K, poses0, quats0)
      -> (params, n_iters, final_loss, final_aux)
    Early-stops on device; the final forward's aux (rewards etc.) is computed
    inside the same executable.
    """
    tx = make_optimizer(cfg)

    @jax.jit
    def run(params, points, valid, K, poses0, quats0):
        def loss_fn(p):
            return traj_forward(p, points, K, poses0, quats0, problem, valid=valid)

        vg = jax.value_and_grad(loss_fn, has_aux=True)

        def cond(c):
            return jnp.logical_and(c["i"] < n_steps, jnp.logical_not(c["done"]))

        def body(c):
            (loss, aux), grads = vg(c["params"])
            updates, opt_state = tx.update(grads, c["opt_state"], c["params"])
            new_params = optax.apply_updates(c["params"], updates)
            first = c["i"] == 0
            reward0 = jnp.where(first, aux[stop.reward_key], c["reward0"])
            smooth0 = jnp.where(first, aux[stop.smooth_key], c["smooth0"])
            done = jnp.logical_and(
                aux[stop.reward_key] / reward0 > stop.rewards_th,
                smooth0 / aux[stop.smooth_key] > stop.smoothness_th,
            )
            return {
                "i": c["i"] + 1,
                "params": new_params,
                "opt_state": opt_state,
                "reward0": reward0,
                "smooth0": smooth0,
                "done": done,
            }

        init = {
            "i": jnp.asarray(0),
            "params": params,
            "opt_state": tx.init(params),
            "reward0": jnp.asarray(1e-6, jnp.float32),
            "smooth0": jnp.asarray(0.0, jnp.float32),
            "done": jnp.asarray(False),
        }
        out = jax.lax.while_loop(cond, body, init)
        final_loss, final_aux = loss_fn(out["params"])
        final_aux["reward0"] = out["reward0"]  # first-step gains, for free
        final_aux["smooth0"] = out["smooth0"]
        return out["params"], out["i"], final_loss, final_aux

    return run


@functools.lru_cache(maxsize=64)
def pose_runner(
    problem: PoseProblem,
    cfg: OptimizerConfig,
    seg_steps: int,
):
    """Jitted segmented pose optimization (for mid-loop publishing):
    init(params) -> opt_state;
    advance(params, opt_state, points, valid, K[, occlusion])
      -> (params, opt_state, loss, aux)   — advances seg_steps.
    """
    tx = make_optimizer(cfg, pose_key="trans", quat_key="quat")

    def _loss(params, points, valid, K, occlusion):
        loss, aux = pose_forward(
            params, points, K, problem, valid=valid, occlusion_mask=occlusion
        )
        return loss, aux

    @jax.jit
    def advance(params, opt_state, points, valid, K, occlusion=None):
        def body(_, carry):
            params, opt_state, _, _ = carry
            (loss, aux), grads = jax.value_and_grad(_loss, has_aux=True)(
                params, points, valid, K, occlusion
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, aux

        loss0, aux0 = _loss(params, points, valid, K, occlusion)
        return jax.lax.fori_loop(0, seg_steps, body, (params, opt_state, loss0, aux0))

    return tx.init, advance

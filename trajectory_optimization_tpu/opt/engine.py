"""Jitted optimization engine: Adam with per-group LRs, exponential decay,
and on-device early stopping.

Replaces the reference's torch.optim machinery:
  * two-param-group Adam (lr_pose / lr_quat), reference
    `src/pose_optimization.py:93-96`, `src/trajectory_optimization.py:91-94`
    → optax.multi_transform keyed on parameter names;
  * ExponentialLR stepped every N//10 iterations, reference
    `src/pose_optimization_sample.py:80-98` → a step-indexed optax schedule
    (:func:`exponential_every`);
  * the host-side optimization loop with early stopping on visibility /
    smoothness gains, reference `src/trajectory_optimization.py:100-124`
    → one jitted lax.while_loop: zero host↔device traffic until convergence.

Adam parity: optax.adam with eps_root=0 applies the identical update rule to
torch.optim.Adam's defaults (bias-corrected moments, eps added outside the
sqrt).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax


LossFn = Callable[[Dict], Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]]


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    """Learning-rate / schedule knobs (the reference's rosparam set)."""

    lr_pose: float = 0.1
    lr_quat: float = 0.0
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8
    decay_gamma: Optional[float] = None  # ExponentialLR gamma; None = constant LR
    decay_every: Optional[int] = None  # decay period in steps (samples use N//10)


def exponential_every(base_lr: float, gamma: float, every: int) -> optax.Schedule:
    """LR schedule matching torch ExponentialLR stepped on iterations
    {0, k, 2k, ...} *after* the optimizer step: the LR used at update i is
    base·γ^d(i) with d(0)=0, d(i)=⌊(i−1)/k⌋+1 (reference
    `src/pose_optimization_sample.py:97-98`).
    """
    every = max(int(every), 1)

    def schedule(count):
        decays = jnp.where(count == 0, 0, (count - 1) // every + 1)
        return base_lr * gamma ** decays.astype(jnp.float32)

    return schedule


def make_optimizer(
    cfg: OptimizerConfig,
    pose_key: str = "poses",
    quat_key: str = "quats",
) -> optax.GradientTransformation:
    """Two-group Adam over a {pose_key: ..., quat_key: ...} parameter pytree."""

    def adam(lr):
        if cfg.decay_gamma is not None and cfg.decay_every is not None:
            lr = exponential_every(lr, cfg.decay_gamma, cfg.decay_every)
        return optax.adam(lr, b1=cfg.b1, b2=cfg.b2, eps=cfg.eps, eps_root=0.0)

    return optax.multi_transform(
        {"pose": adam(cfg.lr_pose), "quat": adam(cfg.lr_quat)},
        param_labels={pose_key: "pose", quat_key: "quat"},
    )


@dataclasses.dataclass(frozen=True)
class EarlyStop:
    """Stop when mean-reward gain and smoothness gain clear thresholds
    (reference `src/trajectory_optimization.py:100,119-124`). Gains are
    measured against the values recorded on the first forward pass; requires
    the loss aux dict to carry ``reward_key`` and ``smooth_key``.
    """

    rewards_th: float = 1.2
    smoothness_th: float = 0.9
    reward_key: str = "mean_reward"
    smooth_key: str = "loss_smooth"


@partial(jax.jit, static_argnums=(0, 1, 3, 4), donate_argnums=(2,))
def _optimize_while(
    loss_fn: LossFn,
    tx: optax.GradientTransformation,
    params: Dict,
    n_steps: int,
    stop: EarlyStop,
):
    vg = jax.value_and_grad(loss_fn, has_aux=True)
    opt_state = tx.init(params)

    def cond(c):
        return jnp.logical_and(c["i"] < n_steps, jnp.logical_not(c["done"]))

    def body(c):
        (loss, aux), grads = vg(c["params"])
        updates, opt_state = tx.update(grads, c["opt_state"], c["params"])
        params = optax.apply_updates(c["params"], updates)
        first = c["i"] == 0
        reward0 = jnp.where(first, aux[stop.reward_key], c["reward0"])
        smooth0 = jnp.where(first, aux[stop.smooth_key], c["smooth0"])
        vis_gain = aux[stop.reward_key] / reward0
        smooth_gain = smooth0 / aux[stop.smooth_key]
        done = jnp.logical_and(vis_gain > stop.rewards_th, smooth_gain > stop.smoothness_th)
        return {
            "i": c["i"] + 1,
            "params": params,
            "opt_state": opt_state,
            "reward0": reward0,
            "smooth0": smooth0,
            "done": done,
            "loss": loss,
        }

    init = {
        "i": jnp.asarray(0),
        "params": params,
        "opt_state": opt_state,
        "reward0": jnp.asarray(1e-6, jnp.float32),
        "smooth0": jnp.asarray(0.0, jnp.float32),
        "done": jnp.asarray(False),
        "loss": jnp.asarray(jnp.inf, jnp.float32),
    }
    out = jax.lax.while_loop(cond, body, init)
    return out["params"], out["i"], out["loss"]


def optimize(
    loss_fn: LossFn,
    params: Dict,
    cfg: OptimizerConfig,
    n_steps: int,
    *,
    early_stop: Optional[EarlyStop] = None,
    pose_key: str = "poses",
    quat_key: str = "quats",
):
    """Run the full optimization on device; return (params, n_iters, loss).

    With ``early_stop`` the loop exits as soon as the gain thresholds clear
    (node behavior); without, it runs exactly ``n_steps`` (sample behavior,
    use :func:`optimize_with_history` when per-step logs are wanted).
    """
    tx = make_optimizer(cfg, pose_key=pose_key, quat_key=quat_key)
    if early_stop is None:  # thresholds no loop can clear ⇒ plain n-step run
        early_stop = EarlyStop(rewards_th=float("inf"), smoothness_th=float("inf"))
    params, i, loss = _optimize_while(loss_fn, tx, params, int(n_steps), early_stop)
    return params, int(i), float(loss)


@partial(jax.jit, static_argnums=(0, 1, 3))
def _optimize_scan(
    loss_fn: LossFn,
    tx: optax.GradientTransformation,
    params: Dict,
    n_steps: int,
):
    vg = jax.value_and_grad(loss_fn, has_aux=True)
    opt_state = tx.init(params)

    def step(carry, _):
        params, opt_state = carry
        (loss, aux), grads = vg(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        scalars = {k: v for k, v in aux.items() if jnp.ndim(v) == 0}
        scalars["loss"] = loss
        return (params, opt_state), scalars

    (params, _), history = jax.lax.scan(step, (params, opt_state), None, length=n_steps)
    return params, history


class OptimizerLoop:
    """Stepwise optimization with persistent state — for callers that
    interleave device steps with host work (the nodes publish rewards every
    n/20 iterations, reference `src/pose_optimization.py:140-143`).

    ``run(n)`` advances n steps in one jitted lax.fori_loop (per distinct n,
    one compile); state persists across calls.
    """

    def __init__(
        self,
        loss_fn: LossFn,
        params: Dict,
        cfg: OptimizerConfig,
        *,
        pose_key: str = "poses",
        quat_key: str = "quats",
    ):
        self._tx = make_optimizer(cfg, pose_key=pose_key, quat_key=quat_key)
        self._loss_fn = loss_fn
        self._state = (params, self._tx.init(params))
        self._aux = None

        vg = jax.value_and_grad(loss_fn, has_aux=True)

        @partial(jax.jit, static_argnums=(1,), donate_argnums=(0,))
        def run_n(state, n):
            def body(_, carry):
                params, opt_state, _, _ = carry
                (loss, aux), grads = vg(params)
                updates, opt_state = self._tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return params, opt_state, loss, aux

            params, opt_state = state
            loss0, aux0 = loss_fn(params)
            params, opt_state, loss, aux = jax.lax.fori_loop(
                0, n, body, (params, opt_state, loss0, aux0)
            )
            return (params, opt_state), loss, aux

        self._run_n = run_n

    @property
    def params(self) -> Dict:
        return self._state[0]

    @property
    def last_aux(self):
        return self._aux

    def run(self, n: int):
        """Advance n optimization steps; returns (loss, aux) of the LAST
        forward evaluation inside the segment."""
        self._state, loss, aux = self._run_n(self._state, int(n))
        self._aux = aux
        return loss, aux


def optimize_with_history(
    loss_fn: LossFn,
    params: Dict,
    cfg: OptimizerConfig,
    n_steps: int,
    *,
    pose_key: str = "poses",
    quat_key: str = "quats",
):
    """Fixed-length optimization returning per-step scalar history (loss and
    every scalar aux term) — the engine behind sample-style convergence plots
    (reference `src/trajectory_optimization_sample.py:111-171`)."""
    tx = make_optimizer(cfg, pose_key=pose_key, quat_key=quat_key)
    params, history = _optimize_scan(loss_fn, tx, params, int(n_steps))
    return params, {k: jax.device_get(v) for k, v in history.items()}

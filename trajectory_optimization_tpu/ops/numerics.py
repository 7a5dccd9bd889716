"""Gradient-safe numerical primitives.

torch defines the subgradient of the 2-norm at 0 to be 0, which the reference
silently relies on: its l2 anchor ‖p₀ − p₀⁰‖ (`src/model.py:249`) is exactly
zero on the first optimization step. jnp.linalg.norm would propagate NaN
there; these helpers reproduce the torch semantics (identical values,
well-defined gradients at the singular points).
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def safe_norm(x: jnp.ndarray, axis=None, keepdims: bool = False) -> jnp.ndarray:
    """L2 norm with subgradient 0 at x == 0 (torch parity).

    Implemented with the double-where trick so both value and gradient are
    exact everywhere else.
    """
    sq = jnp.sum(jnp.square(x), axis=axis, keepdims=keepdims)
    is_zero = sq == 0
    # gradient of sqrt at 0 is inf; evaluate sqrt on a safe operand and select
    safe_sq = jnp.where(is_zero, 1.0, sq)
    return jnp.where(is_zero, 0.0, jnp.sqrt(safe_sq))


def acos_clipped(cos: jnp.ndarray, grad_margin: float = 1e-6) -> jnp.ndarray:
    """arccos with the argument clipped to [-1, 1] for the value and to
    [-1+m, 1-m] for the gradient.

    The value is bit-identical to arccos(clip(cos, -1, 1)); only the gradient
    at exactly ±1 (where d/dx arccos = ∓∞) is replaced by the finite slope at
    ±(1−m). Exactly-collinear waypoints (straight-line initial paths) hit this
    in float32.
    """
    value_arg = jnp.clip(cos, -1.0, 1.0)
    grad_arg = jnp.clip(cos, -1.0 + grad_margin, 1.0 - grad_margin)
    # value from the exact arg, gradient from the safe arg
    return jnp.arccos(grad_arg) + lax.stop_gradient(
        jnp.arccos(value_arg) - jnp.arccos(grad_arg)
    )

"""Sharded fused-Pallas visibility: the multi-chip hot path.

GSPMD has no partitioning rule for the fused Pallas kernel, so this module
shards it manually: ONE shard_map region per direction, whose local body
runs the Pallas passes on the shard's point planes and crosses shards only
through ``lax`` collectives on (W,)-sized quantities — the score min/max
between pass A and pass B (pmin/pmax), and the gradient partial sums in the
backward (psum). Point data never leaves its chip, and the collectives are
compiled INTO the program (riding ICI), not staged through host-level
reshapes between separate shard_map calls.

Structure (mirrors ops.pallas_vis):

  fwd:  shard_map[ pass A → pmin/pmax(2·W) → pass B ]
  bwd:  shard_map[ B1 stats → psum(4·W) → B2 apply → psum(12·W) → dwp ]

Wrapped in one custom_vjp so ``sharded_fused_lo_sum`` drops into jax.grad.
Validated against the single-device kernel on the virtual CPU mesh
(tests/test_sharded_pallas.py).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from trajectory_optimization_tpu.ops import quat as quat_ops
from trajectory_optimization_tpu.ops.pallas_vis import (
    LANES,
    SCORE_CACHE_MAX_BYTES,
    TILE_ROWS_CACHE,
    _consts,
    _pad_wp,
    fused_acc_to_sums,
    make_norm,
    run_bwd_apply,
    run_bwd_fused_acc,
    run_bwd_stats,
    run_pass_a,
    run_pass_b,
    sums_to_param_grads,
)

MIN_TILE_ROWS = 8  # f32 sublane granularity — smallest legal plane tile


def _tile_rows_for(m_local: int) -> int:
    """Largest multiple of 8 ≤ TILE_ROWS_CACHE dividing the per-shard plane
    rows, so small dryrun shapes work without 64-row padding per shard."""
    tr = TILE_ROWS_CACHE
    while tr > MIN_TILE_ROWS and m_local % tr:
        tr -= MIN_TILE_ROWS
    if m_local % tr:
        raise ValueError(
            f"per-shard plane rows {m_local} not a multiple of {MIN_TILE_ROWS}"
        )
    return tr


def pad_multiple(mesh: Mesh) -> int:
    """Point-count multiple required by :func:`sharded_fused_lo_sum` on this
    mesh (pass as ``multiple=`` to utils.data.pad_points/bucket_size)."""
    return MIN_TILE_ROWS * LANES * int(mesh.shape["pts"])


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 5, 6, 7))
def _sharded_lo_planes(mesh, wp, kp, planes, valid_plane, img_wh, dist_lims, eps):
    lo, _ = _sharded_fwd(mesh, wp, kp, planes, valid_plane, img_wh, dist_lims, eps)
    return lo


def _shmap(mesh, fn, in_specs, out_specs):
    # check_vma=False: pallas_call outputs carry no varying-mesh-axes
    # metadata, so shard_map's replication checker cannot verify them
    return jax.shard_map(
        fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False
    )


def _sharded_fwd(mesh, wp, kp, planes, valid_plane, img_wh, dist_lims, eps):
    """Forward over a ('wps', 'pts') mesh: waypoint rows shard over 'wps'
    (each shard runs the Pallas passes for ITS waypoints only), points over
    'pts'. Per-waypoint min/max all-reduce over 'pts'; the per-point log-odds
    partials all-reduce over 'wps' (the log-odds fusion is a sum over
    waypoints). With wps=1 both collectives are identities and this is pure
    point sharding."""
    consts = _consts(img_wh, dist_lims, eps)
    m_local = planes.shape[1] // mesh.shape["pts"]
    tr = _tile_rows_for(m_local)
    # honor the single-device HBM budget PER SHARD: past it, fall back to the
    # fused no-cache kernels (recompute scores) instead of materializing the
    # (W_local, M_local, LANES) cache and its backward residency
    w_local = -(-wp.shape[0] // mesh.shape["wps"])
    cache = w_local * m_local * LANES * 4 <= SCORE_CACHE_MAX_BYTES

    def local(wp, kp, planes_l, valid_l):
        mins, maxs, scores = run_pass_a(
            wp, kp, planes_l, valid_l, consts, cache_scores=cache, tr=tr
        )
        m = jax.lax.pmin(mins, "pts")  # (W_local,) all-reduce over ICI
        mx = jax.lax.pmax(maxs, "pts")
        norm = make_norm(m, mx)
        lo = run_pass_b(wp, kp, norm, planes_l, scores, consts, eps, tr=tr)
        lo = jax.lax.psum(lo, "wps")  # Σ over the waypoint shards
        if cache:
            return lo, norm, scores
        return lo, norm

    if cache:
        lo, norm, scores = _shmap(
            mesh,
            local,
            in_specs=(P("wps"), P(), P(None, "pts"), P("pts")),
            out_specs=(P("pts"), P("wps"), P("wps", "pts")),
        )(wp, kp, planes, valid_plane)
    else:
        lo, norm = _shmap(
            mesh,
            local,
            in_specs=(P("wps"), P(), P(None, "pts"), P("pts")),
            out_specs=(P("pts"), P("wps")),
        )(wp, kp, planes, valid_plane)
        scores = None
    return lo, (wp, kp, planes, valid_plane, norm, scores)


def _sharded_bwd(mesh, img_wh, dist_lims, eps, res, g):
    wp, kp, planes, valid_plane, norm, scores = res
    consts = _consts(img_wh, dist_lims, eps)
    tr = _tile_rows_for(planes.shape[1] // mesh.shape["pts"])
    g_plane = g.reshape(valid_plane.shape)

    def local(wp, kp, norm, planes_l, valid_l, g_l, scores_l):
        st = run_bwd_stats(norm, scores_l, valid_l, g_l, eps, tr=tr)
        st = jax.lax.psum(st, "pts")  # (W_local, 4) all-reduce
        alpha = st[:, 0] / jnp.maximum(st[:, 2], 1.0)
        beta = st[:, 1] / jnp.maximum(st[:, 3], 1.0)
        norm2 = jnp.concatenate([norm, alpha[:, None], beta[:, None]], axis=1)
        sums = run_bwd_apply(
            wp, kp, norm2, planes_l, valid_l, g_l, scores_l, consts, eps, tr=tr
        )
        sums = jax.lax.psum(sums, "pts")  # (W_local, 3, 4) all-reduce
        return sums_to_param_grads(wp, sums)

    def local_nocache(wp, kp, norm, planes_l, valid_l, g_l):
        # fused no-cache kernel on the local slice; every accumulator entry
        # is a per-point sum, so one psum recovers the global (W, 40) acc
        acc = run_bwd_fused_acc(
            wp, kp, norm, planes_l, valid_l, g_l, consts, eps, tr=tr
        )
        acc = jax.lax.psum(acc, "pts")
        return sums_to_param_grads(wp, fused_acc_to_sums(acc, wp.shape[0]))

    if scores is not None:
        dwp = _shmap(
            mesh,
            local,
            in_specs=(P("wps"), P(), P("wps"), P(None, "pts"), P("pts"), P("pts"),
                      P("wps", "pts")),
            out_specs=P("wps"),
        )(wp, kp, norm, planes, valid_plane, g_plane, scores)
    else:
        dwp = _shmap(
            mesh,
            local_nocache,
            in_specs=(P("wps"), P(), P("wps"), P(None, "pts"), P("pts"), P("pts")),
            out_specs=P("wps"),
        )(wp, kp, norm, planes, valid_plane, g_plane)
    return dwp, jnp.zeros_like(kp), jnp.zeros_like(planes), jnp.zeros_like(valid_plane)


_sharded_lo_planes.defvjp(_sharded_fwd, _sharded_bwd)


def sharded_fused_lo_sum(
    mesh: Mesh,
    points: jnp.ndarray,
    quats: jnp.ndarray,
    trans: jnp.ndarray,
    K: jnp.ndarray,
    img_width: float,
    img_height: float,
    *,
    min_dist: float = 1.0,
    max_dist: float = 5.0,
    eps: float = 1e-6,
    valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """(N,) log-odds over W waypoints with the point axis sharded on
    mesh axis 'pts'; differentiable w.r.t. quats/trans.

    N must be a multiple of :func:`pad_multiple`(mesh) = 8·128·D — pad with
    utils.data.pad_points to a suitable bucket first (padding entries carry
    valid=0). Tile rows per grid step adapt to the shard size (up to
    TILE_ROWS_CACHE).

    On a 2D ('wps', 'pts') mesh the waypoint rows shard over 'wps' too
    (padded with inert dummy waypoints to a multiple of the axis size) —
    each chip evaluates its waypoint subset over its point slice, so memory
    and compute scale down along both axes.
    """
    if "wps" not in mesh.shape or "pts" not in mesh.shape:
        # the shard_map regions below name both axes unconditionally (psum
        # over 'wps', pmin/pmax over 'pts') — a partial mesh would fail at
        # trace time with an opaque unbound-axis error. A 1-device 'wps'
        # axis is fine: make it explicit (parallel.mesh.make_mesh does).
        raise ValueError(
            f"sharded_fused_lo_sum needs a ('wps', 'pts') mesh, got axes "
            f"{tuple(mesh.shape)}; build one with parallel.mesh.make_mesh."
        )
    D = mesh.shape["pts"]
    W_axis = mesh.shape["wps"]
    N = points.shape[0]
    W = quats.shape[0]
    tile = MIN_TILE_ROWS * LANES * D
    if N % tile:
        raise ValueError(f"N={N} must be a multiple of {tile} (pad the cloud)")
    if valid is None:
        valid = jnp.ones((N,), jnp.float32)

    planes = points.T.reshape(3, N // LANES, LANES)
    valid_plane = valid.astype(jnp.float32).reshape(N // LANES, LANES)

    R = quat_ops.to_matrix(quat_ops.normalize(quats))
    wp = jnp.concatenate([R.reshape(W, 9), trans, jnp.zeros((W, 4), jnp.float32)], axis=1)
    if W % W_axis:
        # inert dummy waypoints (ops.pallas_vis semantics: zero scores, zero
        # gradients) even out the waypoint shards; their dwp rows are
        # discarded by concatenate's VJP
        wp = _pad_wp(wp, -(-W // W_axis) * W_axis)
    kp = jnp.stack([K[0, 0], K[1, 1], K[0, 2], K[1, 2]]).reshape(1, 4)

    lo = _sharded_lo_planes(
        mesh, wp, kp, planes, valid_plane,
        (float(img_width), float(img_height)),
        (float(min_dist), float(max_dist)),
        float(eps),
    )
    return lo.reshape(N)

"""On-device nearest-neighbor distances & Chamfer losses (Pallas).

The reference's training/optimization losses need NN distances between
~100k-point clouds; its eval uses host cKDTrees (eval.py:50-62) and the CUDA
submodule for training. On TPU we use a streaming-min Pallas kernel instead:

- queries and references are tiled into VMEM blocks;
- each (query-tile, ref-tile) grid step computes a (TQ, TR) squared-distance
  block via the MXU (``|q|^2 + |r|^2 - 2 q.r`` with coordinates padded to
  K=8 lanes) and folds it into a running per-query min;
- the full (N, M) distance matrix is never materialized — HBM traffic is
  O(N + M) instead of O(N*M), which is what makes 100k x 100k tractable.

Padding contract: callers pad clouds to multiples of the tile sizes and mark
invalid rows by placing them at ``SENTINEL`` (1e6 m away) — no mask plumbing
inside the kernel, invalid refs simply lose every min race. Distances for
invalid queries are garbage and must be masked by the caller (the helpers
here do it).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SENTINEL = 1.0e6  # coordinates of padded rows; ~1e12 squared distance
_QT = 128  # query tile (one VMEM sublane-dim tile)
_RT = 512  # reference tile
_K = 8  # coordinate lanes after padding (3 real + 5 zero)


def _pad_coords(pts: jax.Array, tile: int, valid: jax.Array | None) -> jax.Array:
    """(N, 3) -> (ceil(N/tile)*tile, 8) with invalid rows at the sentinel."""
    n = pts.shape[0]
    if valid is not None:
        pts = jnp.where(valid[:, None], pts[:, :3], SENTINEL)
    else:
        pts = pts[:, :3]
    n_pad = -n % tile
    pts = jnp.pad(pts, ((0, n_pad), (0, _K - 3)), constant_values=0.0)
    if n_pad:
        pts = pts.at[n:, :3].set(SENTINEL)
    return pts


def _nn_kernel(q_ref, r_ref, o_ref):
    # The output stays fully VMEM-resident (N * 4 bytes); row i holds the
    # running min for query tile i while the j (reference-tile) loop streams.
    i = pl.program_id(0)
    j = pl.program_id(1)
    q = q_ref[:]  # (QT, 8)
    r = r_ref[:]  # (RT, 8)
    # HIGHEST precision: the TPU MXU truncates fp32 operands to bf16 by
    # default, and the |q|^2+|r|^2-2qr cancellation amplifies that rounding
    # into meter-scale distance errors. K=8 keeps the exact dot cheap.
    dot = jax.lax.dot_general(
        q,
        r,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (QT, RT)
    qn = jnp.sum(q * q, axis=1, keepdims=True)
    rn = jnp.sum(r * r, axis=1)[None, :]
    d2 = qn + rn - 2.0 * dot
    tile_min = jnp.min(d2, axis=1)  # (QT,)

    @pl.when(j == 0)
    def _():
        o_ref[i, :] = tile_min

    @pl.when(j > 0)
    def _():
        o_ref[i, :] = jnp.minimum(o_ref[i, :], tile_min)


@jax.jit
def _nn_distance_sq_padded(q: jax.Array, r: jax.Array):
    nq, nr = q.shape[0], r.shape[0]
    grid = (nq // _QT, nr // _RT)
    out = pl.pallas_call(
        _nn_kernel,
        out_shape=jax.ShapeDtypeStruct((grid[0], _QT), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((_QT, _K), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((_RT, _K), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (nq // _QT, _QT), lambda i, j: (0, 0), memory_space=pltpu.VMEM
            ),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * nq * nr * _K,
            bytes_accessed=4 * (nq * _K + nr * _K + nq),
            transcendentals=0,
        ),
    )(q, r)
    return out.reshape(-1)


@jax.jit
def _nn_distance_sq_xla(q: jax.Array, r: jax.Array) -> jax.Array:
    """Streaming-min in pure XLA: same tiling as the Pallas kernel, expressed
    as a scan over reference tiles inside a map over query tiles. Used on
    non-TPU backends and as the cross-check for the kernel."""
    r_tiles = r.reshape(-1, _RT, _K)

    def per_query_tile(q_tile):  # (QT, K)
        qn = jnp.sum(q_tile * q_tile, axis=1, keepdims=True)

        def fold(carry, r_tile):
            dot = jax.lax.dot_general(
                q_tile,
                r_tile,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            rn = jnp.sum(r_tile * r_tile, axis=1)[None, :]
            tile_min = jnp.min(qn + rn - 2.0 * dot, axis=1)
            return jnp.minimum(carry, tile_min), None

        init = jnp.full((q_tile.shape[0],), jnp.inf, dtype=jnp.float32)
        out, _ = jax.lax.scan(fold, init, r_tiles)
        return out

    q_tiles = q.reshape(-1, _QT, _K)
    return jax.lax.map(per_query_tile, q_tiles).reshape(-1)


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _nn_idx_kernel(q_ref, r_ref, d_ref, i_ref):
    """Streaming min + argmin: like _nn_kernel but also tracks the index of
    the winning reference point (global index = tile offset + local)."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    q = q_ref[:]
    r = r_ref[:]
    dot = jax.lax.dot_general(
        q,
        r,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    qn = jnp.sum(q * q, axis=1, keepdims=True)
    rn = jnp.sum(r * r, axis=1)[None, :]
    d2 = qn + rn - 2.0 * dot
    tile_min = jnp.min(d2, axis=1)
    tile_arg = jnp.argmin(d2, axis=1).astype(jnp.int32) + j * _RT

    @pl.when(j == 0)
    def _():
        d_ref[i, :] = tile_min
        i_ref[i, :] = tile_arg

    @pl.when(j > 0)
    def _():
        better = tile_min < d_ref[i, :]
        d_ref[i, :] = jnp.where(better, tile_min, d_ref[i, :])
        i_ref[i, :] = jnp.where(better, tile_arg, i_ref[i, :])


@jax.jit
def _nn_argmin_padded(q: jax.Array, r: jax.Array):
    nq, nr = q.shape[0], r.shape[0]
    grid = (nq // _QT, nr // _RT)
    d2, idx = pl.pallas_call(
        _nn_idx_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((grid[0], _QT), jnp.float32),
            jax.ShapeDtypeStruct((grid[0], _QT), jnp.int32),
        ),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((_QT, _K), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((_RT, _K), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec(
                    (nq // _QT, _QT), lambda i, j: (0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(
                    (nq // _QT, _QT), lambda i, j: (0, 0), memory_space=pltpu.VMEM
                ),
            ),
        ),
    )(q, r)
    return d2.reshape(-1), idx.reshape(-1)


@jax.jit
def _nn_argmin_xla(q: jax.Array, r: jax.Array):
    r_tiles = r.reshape(-1, _RT, _K)

    def per_query_tile(q_tile):
        qn = jnp.sum(q_tile * q_tile, axis=1, keepdims=True)

        def fold(carry, inp):
            best_d, best_i = carry
            r_tile, offset = inp
            dot = jax.lax.dot_general(
                q_tile,
                r_tile,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            rn = jnp.sum(r_tile * r_tile, axis=1)[None, :]
            d2 = qn + rn - 2.0 * dot
            tile_min = jnp.min(d2, axis=1)
            tile_arg = jnp.argmin(d2, axis=1).astype(jnp.int32) + offset
            better = tile_min < best_d
            return (
                jnp.where(better, tile_min, best_d),
                jnp.where(better, tile_arg, best_i),
            ), None

        init = (
            jnp.full((q_tile.shape[0],), jnp.inf, jnp.float32),
            jnp.zeros((q_tile.shape[0],), jnp.int32),
        )
        offsets = jnp.arange(r_tiles.shape[0], dtype=jnp.int32) * _RT
        (d, idx), _ = jax.lax.scan(fold, init, (r_tiles, offsets))
        return d, idx

    q_tiles = q.reshape(-1, _QT, _K)
    d, idx = jax.lax.map(per_query_tile, q_tiles)
    return d.reshape(-1), idx.reshape(-1)


def nn_argmin(
    query: jax.Array,
    ref: jax.Array,
    query_valid: jax.Array | None = None,
    ref_valid: jax.Array | None = None,
):
    """(min squared distance, index of nearest reference point) per query.

    Invalid refs never win the min race; invalid queries return (0, 0)."""
    n = query.shape[0]
    q = _pad_coords(query, _QT, query_valid)
    r = _pad_coords(ref, _RT, ref_valid)
    if _on_tpu():
        d2, idx = _nn_argmin_padded(q, r)
    else:
        d2, idx = _nn_argmin_xla(q, r)
    d2 = jnp.maximum(d2[:n], 0.0)
    idx = jnp.minimum(idx[:n], ref.shape[0] - 1)
    if query_valid is not None:
        d2 = jnp.where(query_valid, d2, 0.0)
        idx = jnp.where(query_valid, idx, 0)
    return d2, idx


def _nn_argmin_dispatch(q3: jax.Array, r3: jax.Array):
    """(d2, idx) on padded-to-tile inputs of raw (N, 3)/(M, 3) coords."""
    n = q3.shape[0]
    q = _pad_coords(q3, _QT, None)
    r = _pad_coords(r3, _RT, None)
    if _on_tpu():
        d2, idx = _nn_argmin_padded(q, r)
    else:
        d2, idx = _nn_argmin_xla(q, r)
    return jnp.maximum(d2[:n], 0.0), jnp.minimum(idx[:n], r3.shape[0] - 1)


@jax.custom_vjp
def _nn_core(q3: jax.Array, r3: jax.Array) -> jax.Array:
    """Min squared distance per query, differentiable in both clouds.

    The kernels aren't autodiffable; the gradient is analytic at the argmin:
    d/dq |q - r*|^2 = 2 (q - r*), and refs accumulate the negatives via a
    segment scatter — an O(N) backward instead of replaying the search.
    The undifferentiated primal uses the cheaper min-only kernel; the VJP
    forward pays for argmin tracking only when gradients are requested.
    """
    n = q3.shape[0]
    q = _pad_coords(q3, _QT, None)
    r = _pad_coords(r3, _RT, None)
    if _on_tpu():
        d2 = _nn_distance_sq_padded(q, r)[:n]
    else:
        d2 = _nn_distance_sq_xla(q, r)[:n]
    return jnp.maximum(d2, 0.0)


def _nn_core_fwd(q3, r3):
    d2, idx = _nn_argmin_dispatch(q3, r3)
    return d2, (q3, r3, idx)


def _nn_core_bwd(residuals, g):
    q3, r3, idx = residuals
    diff = q3 - r3[idx]
    dq = 2.0 * g[:, None] * diff
    dr = -jax.ops.segment_sum(dq, idx, num_segments=r3.shape[0])
    return dq, dr


_nn_core.defvjp(_nn_core_fwd, _nn_core_bwd)


def nn_distance_sq(
    query: jax.Array,
    ref: jax.Array,
    query_valid: jax.Array | None = None,
    ref_valid: jax.Array | None = None,
) -> jax.Array:
    """Per-query squared distance to the nearest reference point.

    Differentiable in both clouds (custom VJP through the argmin). Masks are
    applied OUTSIDE the custom core by moving invalid points to the sentinel
    — ``where`` blocks their gradients.

    Args:
        query: (N, >=3) points.
        ref: (M, >=3) points.
        query_valid / ref_valid: optional masks; invalid refs never win,
            invalid queries return 0.

    Returns:
        (N,) float32 min squared distances (0 for invalid queries).
    """
    q3 = query[:, :3]
    r3 = ref[:, :3]
    if query_valid is not None:
        q3 = jnp.where(query_valid[:, None], q3, SENTINEL)
    if ref_valid is not None:
        r3 = jnp.where(ref_valid[:, None], r3, SENTINEL)
    d2 = _nn_core(q3, r3)
    if query_valid is not None:
        d2 = jnp.where(query_valid, d2, 0.0)
    return d2


def chamfer_distance(
    pc1: jax.Array,
    pc2: jax.Array,
    valid1: jax.Array | None = None,
    valid2: jax.Array | None = None,
) -> jax.Array:
    """Symmetric mean-NN Chamfer, matching the eval definition
    (mean of both directions' mean NN distance, NOT squared)."""
    d12 = jnp.sqrt(nn_distance_sq(pc1, pc2, valid1, valid2))
    d21 = jnp.sqrt(nn_distance_sq(pc2, pc1, valid2, valid1))

    def masked_mean(d, valid):
        if valid is None:
            return jnp.mean(d)
        return jnp.sum(jnp.where(valid, d, 0.0)) / jnp.maximum(
            jnp.sum(valid.astype(d.dtype)), 1.0
        )

    return 0.5 * (masked_mean(d12, valid1) + masked_mean(d21, valid2))


def truncated_chamfer(
    pc1: jax.Array,
    pc2: jax.Array,
    valid1: jax.Array | None = None,
    valid2: jax.Array | None = None,
    max_dist: float = 2.0,
) -> jax.Array:
    """Truncated symmetric Chamfer on SQUARED distances — the classic scene
    flow optimization loss (distances beyond ``max_dist`` are clipped so
    outliers and occlusions don't dominate)."""
    cap = max_dist * max_dist
    d12 = jnp.minimum(nn_distance_sq(pc1, pc2, valid1, valid2), cap)
    d21 = jnp.minimum(nn_distance_sq(pc2, pc1, valid2, valid1), cap)

    def masked_mean(d, valid):
        if valid is None:
            return jnp.mean(d)
        return jnp.sum(jnp.where(valid, d, 0.0)) / jnp.maximum(
            jnp.sum(valid.astype(d.dtype)), 1.0
        )

    return masked_mean(d12, valid1) + masked_mean(d21, valid2)


def nn_distance_sq_reference(query, ref, query_valid=None, ref_valid=None):
    """O(N*M) dense-matrix reference implementation (tests only)."""
    q = query[:, :3]
    r = ref[:, :3]
    d2 = jnp.sum((q[:, None, :] - r[None, :, :]) ** 2, axis=-1)
    if ref_valid is not None:
        d2 = jnp.where(ref_valid[None, :], d2, jnp.inf)
    out = jnp.min(d2, axis=1)
    if query_valid is not None:
        out = jnp.where(query_valid, out, 0.0)
    return out

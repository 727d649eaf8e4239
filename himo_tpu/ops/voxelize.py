"""Pillar (2-D voxel) encoding of point clouds — scatter-free on TPU.

The feed-forward flow models rasterize clouds into a birds-eye pseudo-image
(PointPillars-style; reference training config ``voxel_size=[0.2,0.2,6]``,
``point_cloud_range=[-51.2,-51.2,-3,51.2,51.2,3]`` — assets/slurm/
ssl-train-av2.sh:32). The reference submodule does this with CUDA scatter
kernels; on TPU random-access scatter is slow, so we use
``jax.ops.segment_sum``/``segment_max`` with a static segment count — XLA
lowers these to sorted-segment reductions that vectorize on the VPU.

All shapes static: N points in, H*W pillars out; out-of-range or padded
points route to a trash segment that is sliced off.
"""

from __future__ import annotations

import dataclasses
import functools
from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# ---------------------------------------------------------------------------
# Pallas scatter/gather: XLA's scatter is per-point latency-bound (~70 ns per
# point on v5e regardless of channel width); keeping the whole pillar image
# VMEM-resident and issuing per-point dynamic row stores from a fori_loop is
# ~10x faster (0.47 ms vs 4.5 ms for 65k points x 32ch x 65k pillars).
# Used when the image fits comfortably in VMEM; XLA segment ops otherwise.

_SCATTER_CHUNK = 2048
_NEG = -3.0e38
_VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def _pallas_fits(num_rows: int, channels: int, itemsize: int = 4) -> bool:
    return (num_rows + 8) * channels * itemsize <= _VMEM_BUDGET_BYTES


def _scatter_kernel(combine):
    """Per-point dynamic row stores into the VMEM-resident output image.

    The output block (index map ignoring the grid step) stays resident in
    VMEM while the point-chunk grid streams; grid step 0 initializes it."""

    def kernel(pid_ref, feat_ref, o_ref):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            o_ref[:, :] = jnp.full_like(o_ref, _NEG if combine == "max" else 0.0)

        def body(i, _):
            pid = pid_ref[step * _SCATTER_CHUNK + i]
            row = feat_ref[i, :][None, :]
            cur = o_ref[pl.ds(pid, 1), :]
            if combine == "max":
                o_ref[pl.ds(pid, 1), :] = jnp.maximum(cur, row)
            else:
                o_ref[pl.ds(pid, 1), :] = cur + row
            return 0

        jax.lax.fori_loop(0, _SCATTER_CHUNK, body, 0)

    return kernel


def _banded_scatter_kernel(combine, rows_per_band: int):
    """Band variant: only pids inside [lo, lo + rows_per_band) store."""

    def kernel(lo_ref, pid_ref, feat_ref, o_ref):
        step = pl.program_id(0)
        lo = lo_ref[0]

        @pl.when(step == 0)
        def _():
            o_ref[:, :] = jnp.full_like(o_ref, _NEG if combine == "max" else 0.0)

        def body(i, _):
            pid = pid_ref[step * _SCATTER_CHUNK + i]
            local = pid - lo

            @pl.when((local >= 0) & (local < rows_per_band))
            def _():
                row = feat_ref[i, :][None, :]
                cur = o_ref[pl.ds(local, 1), :]
                if combine == "max":
                    o_ref[pl.ds(local, 1), :] = jnp.maximum(cur, row)
                else:
                    o_ref[pl.ds(local, 1), :] = cur + row
            return 0

        jax.lax.fori_loop(0, _SCATTER_CHUNK, body, 0)

    return kernel


@functools.lru_cache(maxsize=None)
def _scatter_rows_banded_fn(num_rows: int, combine: str, bands: int):
    """Images beyond the VMEM budget: lax.map over row bands, each band a
    full pass over the points with predicated stores (band work is
    sequential anyway — the kernel is per-point latency-bound)."""

    def band_rows() -> int:
        return -(-(num_rows + 8) // (bands * 8)) * 8

    rows = band_rows()

    def band_call(lo, pids, feats):
        n, c = feats.shape
        return pl.pallas_call(
            _banded_scatter_kernel(combine, rows),
            out_shape=jax.ShapeDtypeStruct((rows, c), feats.dtype),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(n // _SCATTER_CHUNK,),
                in_specs=[
                    pl.BlockSpec(
                        (_SCATTER_CHUNK, c),
                        lambda i, *_: (i, 0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=pl.BlockSpec(
                    (rows, c), lambda i, *_: (0, 0), memory_space=pltpu.VMEM
                ),
            ),
        )(lo, pids, feats)

    @jax.custom_batching.custom_vmap
    def scatter(pids, feats):
        los = (jnp.arange(bands, dtype=jnp.int32) * rows)[:, None]

        def one(lo):
            return jax.lax.optimization_barrier(band_call(lo, pids, feats))

        out = jax.lax.map(one, los)  # (bands, rows, c)
        return out.reshape(bands * rows, -1)[: num_rows + 8]

    @scatter.def_vmap
    def _vmap_rule(axis_size, in_batched, pids, feats):
        if not all(in_batched):
            raise NotImplementedError("banded scatter expects both args batched")
        out = jax.lax.map(lambda ab: scatter(*ab), (pids, feats))
        return out, True

    return scatter


@functools.lru_cache(maxsize=None)
def _scatter_rows_fn(num_rows: int, combine: str):
    """Per-(rows, combine) scatter function (custom_vmap needs positional
    binding, hence the factory). Batching lowers to a sequential lax.map with
    an optimization barrier per iteration — without the barrier XLA fuses the
    per-frame VMEM image into the scan's stacked [B, rows, C] buffer and
    blows the 16 MB scoped-VMEM limit."""

    @jax.custom_batching.custom_vmap
    def scatter(pids, feats):
        n, c = feats.shape
        assert n % _SCATTER_CHUNK == 0, n
        return pl.pallas_call(
            _scatter_kernel(combine),
            out_shape=jax.ShapeDtypeStruct((num_rows + 8, c), feats.dtype),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n // _SCATTER_CHUNK,),
                in_specs=[
                    pl.BlockSpec(
                        (_SCATTER_CHUNK, c),
                        lambda i, *_: (i, 0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=pl.BlockSpec(
                    (num_rows + 8, c), lambda i, *_: (0, 0), memory_space=pltpu.VMEM
                ),
            ),
        )(pids, feats)

    @scatter.def_vmap
    def _vmap_rule(axis_size, in_batched, pids, feats):
        pids_b, feats_b = in_batched

        def one(args):
            p, f = args
            return jax.lax.optimization_barrier(scatter(p, f))

        if not (pids_b and feats_b):
            raise NotImplementedError("scatter expects both args batched")
        out = jax.lax.map(one, (pids, feats))
        return out, True

    return jax.jit(scatter)


def _float0_like(x):
    """Zero cotangent for integer/bool primal inputs of custom VJPs."""
    import numpy as onp

    return onp.zeros(onp.shape(x), dtype=jax.dtypes.float0)


@functools.lru_cache(maxsize=None)
def _diff_scatter_fn(num_rows: int, combine: str, bands: int = 1):
    """custom_vjp wrapper around the Pallas scatter: the kernel itself has no
    autodiff rule, but the gradients are analytic —
    max: the winning point(s) per (pillar, channel) receive the cotangent;
    sum: every in-range point receives its pillar's cotangent (linear)."""
    if bands > 1:
        kernel_fn = _scatter_rows_banded_fn(num_rows, combine, bands)
    else:
        kernel_fn = _scatter_rows_fn(num_rows, combine)

    @jax.custom_vjp
    def core(pids, feats):
        return kernel_fn(pids, feats)

    def fwd(pids, feats):
        out = kernel_fn(pids, feats)
        return out, (pids, feats, out)

    def bwd(residuals, g):
        pids, feats, out = residuals
        g_at = jnp.take(g, pids, axis=0)
        if combine == "max":
            winner = feats == jnp.take(out, pids, axis=0)
            dfeat = jnp.where(winner, g_at, 0.0)
        else:
            dfeat = g_at
        return _float0_like(pids), dfeat

    core.defvjp(fwd, bwd)
    return core


def _num_bands(num_rows: int, channels: int, budget: int = _VMEM_BUDGET_BYTES) -> int:
    """Row bands needed so each band's image slice fits the VMEM budget."""
    bands = 1
    while (
        (-(-(num_rows + 8) // bands) + 8) * channels * 4 > budget and bands < 64
    ):
        bands *= 2
    return bands


def _scatter_rows_pallas(pids, feats, *, num_rows: int, combine: str = "max"):
    """Scatter (N, C) rows into (num_rows + 8, C); trash rows go at the end.

    N must be a multiple of the chunk size (callers pad with trash ids).
    The kernel is fp32-only (single-row bf16 dynamic stores crash Mosaic);
    lower precisions are routed through fp32 — scatter is latency-bound, so
    the conversion is free. Differentiable via the analytic custom VJP.
    Images beyond the VMEM budget split into row bands."""
    dtype = feats.dtype
    bands = _num_bands(num_rows, feats.shape[1])
    out = _diff_scatter_fn(num_rows, combine, bands)(pids, feats.astype(jnp.float32))
    return out.astype(dtype)


def _gather_kernel(pid_ref, img_ref, o_ref):
    step = pl.program_id(0)

    def body(i, _):
        pid = pid_ref[step * _SCATTER_CHUNK + i]
        o_ref[i, :] = img_ref[pl.ds(pid, 1), :][0, :]
        return 0

    jax.lax.fori_loop(0, _SCATTER_CHUNK, body, 0)


@jax.custom_batching.custom_vmap
def _gather_rows_pallas(pids, image):
    """Gather rows of the VMEM-resident pillar image per point id."""
    n = pids.shape[0]
    rows, c = image.shape
    assert n % _SCATTER_CHUNK == 0, n
    return pl.pallas_call(
        _gather_kernel,
        out_shape=jax.ShapeDtypeStruct((n, c), image.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n // _SCATTER_CHUNK,),
            in_specs=[
                pl.BlockSpec((rows, c), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (_SCATTER_CHUNK, c), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
            ),
        ),
    )(pids, image)


@_gather_rows_pallas.def_vmap
def _gather_vmap_rule(axis_size, in_batched, pids, image):
    def one(args):
        return jax.lax.optimization_barrier(_gather_rows_pallas(*args))

    if not all(in_batched):
        raise NotImplementedError("gather expects both args batched")
    out = jax.lax.map(one, (pids, image))
    return out, True


@jax.custom_vjp
def _gather_rows_diff(pids, image):
    """Differentiable Pallas gather: the transpose of a gather is a
    scatter-add, served by the sum-scatter kernel. Wide images (beyond the
    VMEM budget) stream in row bands."""
    return _gather_dispatch(pids, image)


def _gather_dispatch(pids, image):
    # Resident-image kernel only: a banded-input variant does NOT stream —
    # Mosaic materializes the whole window for input blocks revisited
    # non-consecutively across the outer grid dim (measured: 512^2 x 32ch
    # allocates the full 32 MiB image and OOMs scoped VMEM). Wide images
    # take the XLA gather via the caller's gate. See TODO.md.
    return _gather_rows_pallas(pids, image)


def _gather_rows_diff_fwd(pids, image):
    return _gather_dispatch(pids, image), (pids, image.shape[0])


def _gather_rows_diff_bwd(residuals, g):
    pids, rows = residuals
    dimage = _diff_scatter_fn(rows, "sum")(pids, g)[:rows]
    return _float0_like(pids), dimage


_gather_rows_diff.defvjp(_gather_rows_diff_fwd, _gather_rows_diff_bwd)


def _pad_for_scatter(pids, feats, trash_row: int):
    n = feats.shape[0]
    pad = -n % _SCATTER_CHUNK
    if pad:
        pids = jnp.concatenate([pids, jnp.full((pad,), trash_row, pids.dtype)])
        feats = jnp.concatenate(
            [feats, jnp.zeros((pad, feats.shape[1]), feats.dtype)]
        )
    return pids, feats


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


@dataclasses.dataclass(frozen=True)
class PillarConfig:
    """Geometry of the pillar grid."""

    x_range: Tuple[float, float] = (-51.2, 51.2)
    y_range: Tuple[float, float] = (-51.2, 51.2)
    z_range: Tuple[float, float] = (-3.0, 3.0)
    voxel_size: Tuple[float, float] = (0.2, 0.2)

    @property
    def grid_shape(self) -> Tuple[int, int]:
        h = round((self.y_range[1] - self.y_range[0]) / self.voxel_size[1])
        w = round((self.x_range[1] - self.x_range[0]) / self.voxel_size[0])
        return h, w

    @property
    def num_pillars(self) -> int:
        h, w = self.grid_shape
        return h * w


class PillarGrid(NamedTuple):
    """Result of pillar assignment for one cloud."""

    pillar_ids: jax.Array  # (N,) int32 flat pillar index; num_pillars = trash
    in_range: jax.Array  # (N,) bool — inside the grid AND caller-valid
    centers_offset: jax.Array  # (N, 3) offset of each point from pillar center
    grid_shape: Tuple[int, int]


def voxelize_pillars(
    points: jax.Array,
    valid: jax.Array | None = None,
    config: PillarConfig = PillarConfig(),
) -> PillarGrid:
    """Assign each point to a pillar; no scatter happens here.

    Not individually jitted: callers trace it inside their own jit, which
    keeps ``grid_shape`` a static Python tuple (a nested jit would return it
    as traced arrays and break downstream segment reductions)."""
    h, w = config.grid_shape
    xyz = points[:, :3]
    vx, vy = config.voxel_size
    ix = jnp.floor((xyz[:, 0] - config.x_range[0]) / vx).astype(jnp.int32)
    iy = jnp.floor((xyz[:, 1] - config.y_range[0]) / vy).astype(jnp.int32)
    in_range = (
        (ix >= 0)
        & (ix < w)
        & (iy >= 0)
        & (iy < h)
        & (xyz[:, 2] >= config.z_range[0])
        & (xyz[:, 2] <= config.z_range[1])
    )
    if valid is not None:
        in_range &= valid
    flat = jnp.where(in_range, iy * w + ix, h * w)  # trash segment = h*w
    cx = (ix.astype(jnp.float32) + 0.5) * vx + config.x_range[0]
    cy = (iy.astype(jnp.float32) + 0.5) * vy + config.y_range[0]
    cz = jnp.full_like(cx, 0.5 * (config.z_range[0] + config.z_range[1]))
    offset = xyz - jnp.stack([cx, cy, cz], axis=1)
    return PillarGrid(flat, in_range, offset, (h, w))


def scatter_mean(
    features: jax.Array, grid: PillarGrid
) -> jax.Array:
    """Per-pillar mean of point features -> (H, W, C) dense image."""
    h, w = grid.grid_shape
    feats = jnp.where(grid.in_range[:, None], features, 0.0)
    if _on_tpu():
        # Fuse sums and counts into one scatter pass (ones column appended).
        aug = jnp.concatenate(
            [feats, grid.in_range.astype(feats.dtype)[:, None]], axis=1
        )
        pids, aug = _pad_for_scatter(grid.pillar_ids, aug, h * w)
        out = _scatter_rows_pallas(pids, aug, num_rows=h * w, combine="sum")[: h * w]
        sums, counts = out[:, :-1], out[:, -1]
    else:
        sums = jax.ops.segment_sum(feats, grid.pillar_ids, num_segments=h * w + 1)[
            : h * w
        ]
        counts = jax.ops.segment_sum(
            grid.in_range.astype(feats.dtype),
            grid.pillar_ids,
            num_segments=h * w + 1,
        )[: h * w]
    mean = sums / jnp.maximum(counts, 1.0)[:, None]
    return mean.reshape(h, w, -1)


def scatter_max(features: jax.Array, grid: PillarGrid) -> jax.Array:
    """Per-pillar max of point features -> (H, W, C) dense image.

    Empty pillars come out as 0 (not -inf)."""
    h, w = grid.grid_shape
    neg = jnp.finfo(features.dtype).min
    if _on_tpu():
        feats = jnp.where(grid.in_range[:, None], features, _NEG)
        pids, feats = _pad_for_scatter(grid.pillar_ids, feats, h * w)
        mx = _scatter_rows_pallas(pids, feats, num_rows=h * w, combine="max")[: h * w]
        mx = jnp.where(mx <= _NEG / 2, 0.0, mx)
        return mx.reshape(h, w, -1)
    feats = jnp.where(grid.in_range[:, None], features, neg)
    mx = jax.ops.segment_max(feats, grid.pillar_ids, num_segments=h * w + 1)
    # Empty segments come back as -inf; masked-point segments as finfo.min.
    mx = jnp.where(mx <= neg, 0.0, mx)
    return mx[: h * w].reshape(h, w, -1)


def gather_pillars(image: jax.Array, grid: PillarGrid) -> jax.Array:
    """Gather each point's pillar feature back from the dense image.

    Out-of-range points get zeros."""
    h, w = grid.grid_shape
    flat = image.reshape(h * w, -1)
    if _on_tpu() and _pallas_fits(h * w, flat.shape[1], 4):
        n = grid.pillar_ids.shape[0]
        safe = jnp.minimum(grid.pillar_ids, h * w - 1)
        pad = -n % _SCATTER_CHUNK
        if pad:
            safe = jnp.concatenate([safe, jnp.zeros((pad,), safe.dtype)])
        out = _gather_rows_diff(safe, flat.astype(jnp.float32))[:n].astype(
            flat.dtype
        )
    else:
        safe = jnp.minimum(grid.pillar_ids, h * w - 1)
        out = flat[safe]
    return jnp.where(grid.in_range[:, None], out, 0.0)

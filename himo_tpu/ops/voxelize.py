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
from typing import NamedTuple, Sequence, Tuple

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
# v5e VMEM is 128 MiB physical (measured: window allocations are checked
# against 134217728 bytes) and every VMEM window is lane-padded to 128
# floats — a (rows, 33) f32 window costs rows * 512 bytes, NOT rows * 132.
# Budgets below are in PADDED bytes via _window_bytes. The default 16 MiB
# scoped-stack limit is separate; kernels raise it with vmem_limit_bytes.
_VMEM_PHYSICAL_BYTES = 128 * 1024 * 1024
_VMEM_LIMIT_BYTES = 110 * 1024 * 1024  # per-kernel scoped limit we request
_VMEM_BUDGET_BYTES = 72 * 1024 * 1024  # resident image window budget
_BAND_BUDGET_BYTES = 48 * 1024 * 1024  # one band window (leaves table room)


def _window_bytes(rows: int, channels: int, itemsize: int = 4) -> int:
    """VMEM cost of a (rows, channels) window: (8, 128)-tile padded."""
    lanes = -(-channels // 128) * 128
    return (-(-rows // 8) * 8) * lanes * itemsize


def _interpret() -> bool:
    """Run the Pallas kernels through the interpreter (CPU test coverage)."""
    import os

    return os.environ.get("HIMO_PALLAS_INTERPRET") == "1"


def _pallas_fits(num_rows: int, channels: int, itemsize: int = 4) -> bool:
    return _window_bytes(num_rows + 8, channels, itemsize) <= _VMEM_BUDGET_BYTES


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


@functools.lru_cache(maxsize=None)
def _scatter_rows_fn(num_rows: int, combine: str, interpret: bool = False):
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
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT_BYTES
            ),
            interpret=interpret,
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
def _diff_scatter_fn(num_rows: int, combine: str, interpret: bool = False):
    """custom_vjp wrapper around the Pallas scatter: the kernel itself has no
    autodiff rule, but the gradients are analytic —
    max: the winning point(s) per (pillar, channel) receive the cotangent;
    sum: every in-range point receives its pillar's cotangent (linear)."""
    kernel_fn = _scatter_rows_fn(num_rows, combine, interpret)

    @jax.custom_vjp
    def core(pids, feats):
        return kernel_fn(pids, feats)

    def fwd(pids, feats):
        out = kernel_fn(pids, feats)
        return out, (pids, feats, out)

    def bwd(residuals, g):
        pids, feats, out = residuals
        if combine == "max":
            c = feats.shape[1]
            both = jnp.take(jnp.concatenate([g, out], axis=1), pids, axis=0)
            winner = feats == both[:, c:]
            dfeat = jnp.where(winner, both[:, :c], 0.0)
        else:
            dfeat = jnp.take(g, pids, axis=0)
        return _float0_like(pids), dfeat

    core.defvjp(fwd, bwd)
    return core


# ---------------------------------------------------------------------------
# Sorted-banded kernels: images beyond the VMEM budget split into row bands.
# Points are pre-sorted by pillar id (cheap XLA argsort), so each band's
# points form one contiguous index range: ``starts[b] = searchsorted(pids,
# b * band_rows)``. The kernels loop over EXACTLY the points of the current
# (band, chunk) intersection — total per-point work is N, not bands * N, and
# there are no per-point predicates. The gather additionally selects which
# image band to fetch through a scalar-prefetch index map; with sorted pids
# the mapped band index is monotone over the grid, so Pallas re-fetches each
# band only at chunk boundaries (~bands + chunks fetches total).


def _band_partition(num_rows: int, channels: int) -> Tuple[int, int, int]:
    """(bands, band_rows, total_rows): one band's PADDED window fits the
    band budget (512^2 C<=128 => 2 bands of ~64 MB)."""
    lanes = -(-channels // 128) * 128
    limit = max(_BAND_BUDGET_BYTES // (lanes * 4), 8)
    bands = -(-(num_rows + 8) // limit)
    band_rows = -(-(num_rows + 8) // (bands * 8)) * 8
    return bands, band_rows, bands * band_rows


def _band_starts(pids_sorted, bands: int, band_rows: int):
    """starts[b] = first sorted index with pid >= b * band_rows."""
    n = pids_sorted.shape[0]
    bounds = jnp.arange(1, bands, dtype=pids_sorted.dtype) * band_rows
    inner = jnp.searchsorted(pids_sorted, bounds, side="left").astype(jnp.int32)
    return jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), inner, jnp.full((1,), n, jnp.int32)]
    )


def _pad_sorted(pids_sorted, pad_pid: int, feats=None):
    """Pad sorted pids (and row-aligned feats) to a chunk multiple; the pad
    id must be >= every real pid to preserve sortedness."""
    n = pids_sorted.shape[0]
    pad = -n % _SCATTER_CHUNK
    if pad:
        pids_sorted = jnp.concatenate(
            [pids_sorted, jnp.full((pad,), pad_pid, pids_sorted.dtype)]
        )
        if feats is not None:
            feats = jnp.concatenate(
                [feats, jnp.zeros((pad, feats.shape[1]), feats.dtype)]
            )
    return (pids_sorted, feats) if feats is not None else pids_sorted


def _sorted_scatter_band_kernel(combine: str):
    """One band: the output block is the whole band (constant index map —
    multi-block output windows materialize fully in Mosaic, see TODO.md);
    the grid streams point chunks, and each step only loops over the sorted
    index range [s, e) that intersects this band — no per-point predicates."""

    def kernel(meta_ref, pids_ref, feat_ref, o_ref):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            o_ref[:, :] = jnp.full_like(o_ref, _NEG if combine == "max" else 0.0)

        s = jnp.maximum(meta_ref[0], step * _SCATTER_CHUNK)
        e = jnp.minimum(meta_ref[1], (step + 1) * _SCATTER_CHUNK)
        lo = meta_ref[2]
        base = step * _SCATTER_CHUNK

        def body(i, _):
            local = pids_ref[i] - lo
            row = feat_ref[pl.ds(i - base, 1), :]
            cur = o_ref[pl.ds(local, 1), :]
            if combine == "max":
                o_ref[pl.ds(local, 1), :] = jnp.maximum(cur, row)
            else:
                o_ref[pl.ds(local, 1), :] = cur + row
            return 0

        jax.lax.fori_loop(s, e, body, 0)

    return kernel


@functools.lru_cache(maxsize=None)
def _sorted_scatter_call(num_rows: int, channels: int, combine: str, interpret: bool):
    bands, band_rows, total_rows = _band_partition(num_rows, channels)

    def band_call(meta, pids, feats):
        n, c = feats.shape
        return pl.pallas_call(
            _sorted_scatter_band_kernel(combine),
            out_shape=jax.ShapeDtypeStruct((band_rows, c), feats.dtype),
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
                    (band_rows, c), lambda i, *_: (0, 0), memory_space=pltpu.VMEM
                ),
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT_BYTES
            ),
            interpret=interpret,
        )(meta, pids, feats)

    @jax.custom_batching.custom_vmap
    def scatter(starts, pids, feats):
        n, c = feats.shape
        assert n % _SCATTER_CHUNK == 0 and c == channels, (n, c)
        los = jnp.arange(bands, dtype=jnp.int32) * band_rows
        metas = jnp.stack([starts[:-1], starts[1:], los], axis=1)

        def one(meta):
            return jax.lax.optimization_barrier(band_call(meta, pids, feats))

        out = jax.lax.map(one, metas)  # (bands, band_rows, c)
        return out.reshape(total_rows, c)[: num_rows + 8]

    @scatter.def_vmap
    def _vmap_rule(axis_size, in_batched, starts, pids, feats):
        if not all(in_batched):
            raise NotImplementedError("sorted scatter expects batched args")
        out = jax.lax.map(lambda abc: scatter(*abc), (starts, pids, feats))
        return out, True

    return scatter


def _sort_rows_by_key(keys, rows):
    """Sort (N,) keys and (N, C) rows together.

    argsort + row takes: the takes are per-row latency-bound (~20 ns/row on
    v5e) but a multi-operand ``lax.sort`` carrying every feature column is
    far worse (~350 ms/frame at C=33 and minutes of compile time), so this
    is the fastest known composition."""
    order = jnp.argsort(keys)
    return jnp.take(keys, order), jnp.take(rows, order, axis=0)


# Feats tables up to this size (PADDED window bytes) stay fully
# VMEM-resident in the table-variant scatter (no row takes at all — the
# kernel reads rows via the argsort order from SMEM). Table + one band must
# leave scratch headroom under the 128 MiB physical VMEM.
_TABLE_BUDGET_BYTES = 40 * 1024 * 1024


_UNROLL = 8


def _sorted_scatter_table_band_kernel(combine: str):
    """One band, feats table resident: for sorted position i in [s, e), the
    point's feat row sits at order[i] in the UNSORTED table and its pillar in
    the SORTED spids table — two INDEPENDENT SMEM loads (chasing
    pids[order[i]] serializes on the dependent scalar load; presorting the
    pids on the XLA side broke the chain for a measured 14%) plus an
    ``_UNROLL``-wide body so Mosaic can overlap the row stores."""

    def rmw(o_ref, feat_ref, local, j):
        row = feat_ref[pl.ds(j, 1), :]
        cur = o_ref[pl.ds(local, 1), :]
        if combine == "max":
            o_ref[pl.ds(local, 1), :] = jnp.maximum(cur, row)
        else:
            o_ref[pl.ds(local, 1), :] = cur + row

    def kernel(meta_ref, spids_ref, order_ref, feat_ref, o_ref):
        o_ref[:, :] = jnp.full_like(o_ref, _NEG if combine == "max" else 0.0)
        lo = meta_ref[2]
        s, e = meta_ref[0], meta_ref[1]
        n_main = (e - s) // _UNROLL

        def body(t, _):
            base = s + t * _UNROLL
            for u in range(_UNROLL):
                i = base + u
                rmw(o_ref, feat_ref, spids_ref[i] - lo, order_ref[i])
            return 0

        jax.lax.fori_loop(0, n_main, body, 0)

        def tail(i, _):
            rmw(o_ref, feat_ref, spids_ref[i] - lo, order_ref[i])
            return 0

        jax.lax.fori_loop(s + n_main * _UNROLL, e, tail, 0)

    return kernel


@functools.lru_cache(maxsize=None)
def _sorted_scatter_table_call(
    num_rows: int, channels: int, combine: str, interpret: bool
):
    bands, band_rows, total_rows = _band_partition(num_rows, channels)

    def band_call(meta, spids, order, feats):
        n, c = feats.shape
        return pl.pallas_call(
            _sorted_scatter_table_band_kernel(combine),
            out_shape=jax.ShapeDtypeStruct((band_rows, c), feats.dtype),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(1,),
                in_specs=[
                    pl.BlockSpec(
                        (n, c), lambda i, *_: (0, 0), memory_space=pltpu.VMEM
                    ),
                ],
                out_specs=pl.BlockSpec(
                    (band_rows, c), lambda i, *_: (0, 0), memory_space=pltpu.VMEM
                ),
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT_BYTES
            ),
            interpret=interpret,
        )(meta, spids, order, feats)

    @jax.custom_batching.custom_vmap
    def scatter(starts, spids, order, feats):
        los = jnp.arange(bands, dtype=jnp.int32) * band_rows
        metas = jnp.stack([starts[:-1], starts[1:], los], axis=1)

        def one(meta):
            return jax.lax.optimization_barrier(band_call(meta, spids, order, feats))

        out = jax.lax.map(one, metas)  # (bands, band_rows, c)
        # Second barrier: without it XLA may place the stacked band buffer
        # itself in scoped VMEM at the consumer (33+ MB at 512^2) — measured
        # inside the model's vmap(batch) x map(bands) nesting.
        out = jax.lax.optimization_barrier(out)
        return out.reshape(total_rows, -1)[: num_rows + 8]

    @scatter.def_vmap
    def _vmap_rule(axis_size, in_batched, *args):
        if not all(in_batched):
            raise NotImplementedError("table scatter expects batched args")
        out = jax.lax.map(lambda a: scatter(*a), tuple(args))
        return out, True

    return scatter


def _count_band_starts(pids, n_total: int, bands: int, band_rows: int):
    """starts WITHOUT sorting: starts[b] = #pids < b*band_rows (+ the padded
    tail, which sorts above every real pid)."""
    bounds = jnp.arange(1, bands, dtype=pids.dtype) * band_rows
    inner = jnp.sum(pids[None, :] < bounds[:, None], axis=1).astype(jnp.int32)
    return jnp.concatenate(
        [
            jnp.zeros((1,), jnp.int32),
            inner,
            jnp.full((1,), n_total, jnp.int32),
        ]
    )


def _sorted_scatter_forward(pids, feats, *, num_rows, combine, interpret):
    """Non-differentiable sorted scatter beyond the VMEM budget.

    Two variants:
    - table: feats stay UNSORTED and fully VMEM-resident; the kernel chases
      ``order`` from SMEM (zero row takes). Used when the table fits.
    - streamed: argsort + row takes reorder (pids, feats), point chunks
      stream through VMEM. Used for wide tables (e.g. C=64 gradients).
    """
    n, channels = feats.shape
    bands, band_rows, _ = _band_partition(num_rows, channels)
    n_pad = n + (-n % _SCATTER_CHUNK)
    if _window_bytes(n_pad, channels) <= _TABLE_BUDGET_BYTES:
        order = jnp.argsort(pids).astype(jnp.int32)
        spids = jnp.take(pids, order)
        if n_pad > n:
            # Padding: pid = num_rows sorts above every real pid (trash).
            spids = jnp.concatenate(
                [spids, jnp.full((n_pad - n,), num_rows, spids.dtype)]
            )
            feats = jnp.concatenate(
                [feats, jnp.zeros((n_pad - n, channels), feats.dtype)]
            )
            order = jnp.concatenate(
                [order, jnp.arange(n, n_pad, dtype=jnp.int32)]
            )
        starts = _band_starts(spids, bands, band_rows)
        # Trash/padded points (pid >= num_rows) land in discarded rows —
        # skip them entirely: the last band ends at the first trash pid
        # (8-12% fewer scalar iterations on masked LiDAR clouds).
        n_live = jnp.searchsorted(spids, jnp.asarray(num_rows, spids.dtype))
        starts = jnp.minimum(starts, n_live.astype(jnp.int32))
        call = _sorted_scatter_table_call(num_rows, channels, combine, interpret)
        return call(starts, spids, order, feats)
    ps, fs = _sort_rows_by_key(pids, feats)
    ps, fs = _pad_sorted(ps, num_rows, fs)
    starts = _band_starts(ps, bands, band_rows)
    call = _sorted_scatter_call(num_rows, channels, combine, interpret)
    return call(starts, ps, fs)


@functools.lru_cache(maxsize=None)
def _diff_scatter_sorted_fn(num_rows: int, combine: str, interpret: bool = False):
    """Differentiable sorted-banded scatter over (pids, feats)."""

    @jax.custom_vjp
    def core(pids, feats):
        return _sorted_scatter_forward(
            pids, feats, num_rows=num_rows, combine=combine, interpret=interpret
        )

    def fwd(pids, feats):
        out = core(pids, feats)
        return out, (pids, feats, out)

    def bwd(residuals, g):
        pids, feats, out = residuals
        if combine == "max":
            # One fused row-take instead of two: XLA row gathers are
            # per-row latency-bound, so width is nearly free while a second
            # take doubles the cost.
            c = feats.shape[1]
            both_img = jnp.concatenate([g, out], axis=1)
            if _maxbwd_pallas():
                both = _sorted_gather_forward(
                    pids, both_img, num_rows=num_rows, interpret=interpret
                )
            else:
                both = jnp.take(both_img, pids, axis=0)
            winner = feats == both[:, c:]
            dfeat = jnp.where(winner, both[:, :c], 0.0)
        else:
            dfeat = jnp.take(g, pids, axis=0)
        return _float0_like(pids), dfeat

    core.defvjp(fwd, bwd)
    return core


def _maxbwd_pallas() -> bool:
    """Route the scatter-max backward's fused (g, out) row-take through the
    sorted-banded Pallas gather instead of XLA's take. A/B toggle: the XLA
    take measured ~42 ns/pt vs the ~21 ns/pt Pallas scalar floor on one
    chip microbench, but tunnel timing noise is large — flip
    HIMO_MAXBWD_PALLAS to compare on real workloads."""
    import os

    return os.environ.get("HIMO_MAXBWD_PALLAS", "0") == "1"


def _scatter_rows_pallas(pids, feats, *, num_rows: int, combine: str = "max"):
    """Scatter (N, C) rows into (num_rows + 8, C); trash rows go at the end.

    The kernels are fp32-only (single-row bf16 dynamic stores crash Mosaic);
    lower precisions are routed through fp32 — scatter is latency-bound, so
    the conversion is free. Differentiable via the analytic custom VJPs.
    Images beyond the VMEM budget use the sorted-banded kernel."""
    dtype = feats.dtype
    interpret = _interpret()
    if _pallas_fits(num_rows, feats.shape[1]):
        pids, feats32 = _pad_for_scatter(pids, feats.astype(jnp.float32), num_rows)
        out = _diff_scatter_fn(num_rows, combine, interpret)(pids, feats32)
    else:
        out = _diff_scatter_sorted_fn(num_rows, combine, interpret)(
            pids, feats.astype(jnp.float32)
        )
    return out.astype(dtype)


# ------------------------------------------------------------------- gather


def _gather_kernel(pid_ref, img_ref, o_ref):
    step = pl.program_id(0)

    def body(i, _):
        pid = pid_ref[step * _SCATTER_CHUNK + i]
        o_ref[i, :] = img_ref[pl.ds(pid, 1), :][0, :]
        return 0

    jax.lax.fori_loop(0, _SCATTER_CHUNK, body, 0)


@functools.lru_cache(maxsize=None)
def _gather_rows_fn(interpret: bool = False):
    @jax.custom_batching.custom_vmap
    def gather_rows(pids, image):
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
                    pl.BlockSpec(
                        (rows, c), lambda i, *_: (0, 0), memory_space=pltpu.VMEM
                    ),
                ],
                out_specs=pl.BlockSpec(
                    (_SCATTER_CHUNK, c), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
                ),
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT_BYTES
            ),
            interpret=interpret,
        )(pids, image)

    @gather_rows.def_vmap
    def _gather_vmap_rule(axis_size, in_batched, pids, image):
        def one(args):
            return jax.lax.optimization_barrier(gather_rows(*args))

        if not all(in_batched):
            raise NotImplementedError("gather expects both args batched")
        out = jax.lax.map(one, (pids, image))
        return out, True

    return gather_rows


@functools.lru_cache(maxsize=None)
def _diff_gather_resident_fn(interpret: bool = False):
    kernel_fn = _gather_rows_fn(interpret)

    @jax.custom_vjp
    def core(pids, image):
        """Differentiable Pallas gather (VMEM-resident image): the transpose
        of a gather is a scatter-add, served by the sum-scatter kernel."""
        return kernel_fn(pids, image)

    def fwd(pids, image):
        return kernel_fn(pids, image), (pids, image.shape[0])

    def bwd(residuals, g):
        pids, rows = residuals
        g_pad_pids, g_pad = _pad_for_scatter(pids, g, rows)
        dimage = _diff_scatter_fn(rows, "sum", interpret)(g_pad_pids, g_pad)[:rows]
        return _float0_like(pids), dimage

    core.defvjp(fwd, bwd)
    return core


def _sorted_gather_band_kernel():
    """One band: the band image is the resident input (constant index map);
    the grid streams output point chunks. Rows outside this band's sorted
    range [s, e) are zeroed so the caller can sum the disjoint band parts."""

    def kernel(meta_ref, pids_ref, img_ref, o_ref):
        step = pl.program_id(0)
        o_ref[:, :] = jnp.zeros_like(o_ref)
        s = jnp.maximum(meta_ref[0], step * _SCATTER_CHUNK)
        e = jnp.minimum(meta_ref[1], (step + 1) * _SCATTER_CHUNK)
        lo = meta_ref[2]
        base = step * _SCATTER_CHUNK

        def body(i, _):
            local = pids_ref[i] - lo
            o_ref[pl.ds(i - base, 1), :] = img_ref[pl.ds(local, 1), :]
            return 0

        jax.lax.fori_loop(s, e, body, 0)

    return kernel


@functools.lru_cache(maxsize=None)
def _sorted_gather_call(num_rows: int, channels: int, interpret: bool):
    bands, band_rows, total_rows = _band_partition(num_rows, channels)

    def band_call(meta, pids, band_img):
        n = pids.shape[0]
        return pl.pallas_call(
            _sorted_gather_band_kernel(),
            out_shape=jax.ShapeDtypeStruct((n, channels), band_img.dtype),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(n // _SCATTER_CHUNK,),
                in_specs=[
                    pl.BlockSpec(
                        (band_rows, channels),
                        lambda i, *_: (0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=pl.BlockSpec(
                    (_SCATTER_CHUNK, channels),
                    lambda i, *_: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT_BYTES
            ),
            interpret=interpret,
        )(meta, pids, band_img)

    @jax.custom_batching.custom_vmap
    def gather(starts, pids, image):
        n = pids.shape[0]
        rows, c = image.shape
        assert n % _SCATTER_CHUNK == 0 and c == channels, (n, c)
        if total_rows > rows:
            image = jnp.pad(image, ((0, total_rows - rows), (0, 0)))
        los = jnp.arange(bands, dtype=jnp.int32) * band_rows
        metas = jnp.stack([starts[:-1], starts[1:], los], axis=1)

        def band_step(acc, meta):
            band_img = jax.lax.dynamic_slice(
                image, (meta[2], jnp.int32(0)), (band_rows, c)
            )
            part = jax.lax.optimization_barrier(band_call(meta, pids, band_img))
            return acc + part, None

        out, _ = jax.lax.scan(
            band_step, jnp.zeros((n, c), image.dtype), metas
        )
        return out

    @gather.def_vmap
    def _vmap_rule(axis_size, in_batched, *args):
        if not all(in_batched):
            raise NotImplementedError("sorted gather expects batched args")
        out = jax.lax.map(lambda a: gather(*a), tuple(args))
        return out, True

    return gather


def _sorted_gather_forward(pids, image, *, num_rows, interpret):
    """Banded gather of image rows at (unsorted) pids; pids < num_rows.

    Kept for parity/testing; ``_diff_gather_sorted_fn`` uses the XLA row
    take in its forward (same speed, simpler graph) and reserves the Pallas
    banded machinery for the backward scatter-add, where XLA's unsorted
    scatter is ~6x slower."""
    channels = image.shape[1]
    bands, band_rows, _ = _band_partition(num_rows, channels)
    n = pids.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    ps, order = jax.lax.sort((pids, iota), dimension=0, num_keys=1)
    ps = _pad_sorted(ps, num_rows - 1)
    starts = _band_starts(ps, bands, band_rows)
    call = _sorted_gather_call(num_rows, channels, interpret)
    out_sorted = call(starts, ps, image)[:n]
    inv = jnp.argsort(order)
    return jnp.take(out_sorted, inv, axis=0)


@functools.lru_cache(maxsize=None)
def _diff_gather_sorted_fn(num_rows: int, interpret: bool = False):
    """Differentiable wide-image gather over (pids, image): XLA row take
    forward (latency-bound either way), sorted-banded Pallas scatter-add
    backward (the XLA transpose would be an unsorted scatter, ~6x slower)."""

    @jax.custom_vjp
    def core(pids, image):
        return jnp.take(image, pids, axis=0)

    def fwd(pids, image):
        return core(pids, image), (pids, image.shape[0])

    def bwd(residuals, g):
        pids, rows = residuals
        dimage = _sorted_scatter_forward(
            pids, g, num_rows=rows, combine="sum", interpret=interpret
        )[:rows]
        return _float0_like(pids), dimage

    core.defvjp(fwd, bwd)
    return core


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


def _use_pallas() -> bool:
    return _on_tpu() or _interpret()


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
    if _use_pallas():
        # Fuse sums and counts into one scatter pass (ones column appended).
        aug = jnp.concatenate(
            [feats, grid.in_range.astype(feats.dtype)[:, None]], axis=1
        )
        out = _scatter_rows_pallas(
            grid.pillar_ids, aug, num_rows=h * w, combine="sum"
        )[: h * w]
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


# ------------------------------------------- gather-composed scatter (max)
# REJECTED BY EXPERIMENT — kept (env-gated off, tested) as the measured
# record so the transpose idea isn't retried. Hypothesis: escape the scalar
# unit's ~20-cycle random-row store floor by transposing scatter into
# vectorizable forms — segmented running max over the pid-sorted stream
# (associative_scan), one 1-D int scatter-max for per-pillar end indices,
# per-column 1-D takes to build the image. Chip A/B (v5e, B8 N65k C33
# rows 512², scripts/kernel_bench.py HIMO_BENCH_PRIMS=1): 1-D column takes
# do NOT vectorize (252.8 ns/row = C x 7.9; a single ROW take is 7.9
# ns/row with width free — the opposite of the _take_cols hypothesis),
# seg-cummax costs 55.3 ns/pt (17 associative_scan passes), searchsorted
# 539 ns/pt, XLA sorted segment_max 117.9 ns/pt. Composite: 2908 ns/pt vs
# the Pallas kernel's 30.1 — 96x slower. Only the 1-D INT scatter is
# vector-fast (6.96 ns/pt), which cannot carry C feature channels.
# Selected by HIMO_SCATTER=gather (default: pallas).


def _scatter_engine() -> str:
    import os

    return os.environ.get("HIMO_SCATTER", "pallas")


def _column_takes(src: jax.Array, idx: jax.Array) -> jax.Array:
    """(N, C) rows reordered/gathered by (M,) idx via C separate 1-D takes
    (candidate vector-unit lowering; row takes are per-row latency-bound)."""
    return jnp.stack(
        [jnp.take(src[:, c], idx) for c in range(src.shape[1])], axis=1
    )


def _seg_cummax(vals: jax.Array, reset: jax.Array) -> jax.Array:
    """Inclusive running max over (N, C) with segment restarts where
    ``reset`` is True (segmented-scan combine is associative)."""

    def comb(a, b):
        va, ra = a
        vb, rb = b
        return jnp.where(rb[..., None], vb, jnp.maximum(va, vb)), ra | rb

    out, _ = jax.lax.associative_scan(comb, (vals, reset), axis=0)
    return out


def _seg_cumsum(vals: jax.Array, reset: jax.Array) -> jax.Array:
    """Inclusive running sum over (N, C) with segment restarts."""

    def comb(a, b):
        va, ra = a
        vb, rb = b
        return jnp.where(rb[..., None], vb, va + vb), ra | rb

    out, _ = jax.lax.associative_scan(comb, (vals, reset), axis=0)
    return out


def _seggather_forward(pids, feats, num_rows: int, combine: str):
    """Raw (num_rows, C) per-pillar reduction via the gather composition;
    empty pillars at _NEG (max) / 0 (sum). Trash pids (>= num_rows) are
    dropped by the index scatter."""
    n = feats.shape[0]
    order = jnp.argsort(pids).astype(jnp.int32)
    spids = jnp.take(pids, order)
    fs = _column_takes(feats, order)
    reset = jnp.concatenate(
        [jnp.ones((1,), bool), spids[1:] != spids[:-1]]
    )
    scan = (_seg_cummax if combine == "max" else _seg_cumsum)(fs, reset)
    idx_map = (
        jnp.full((num_rows,), -1, jnp.int32)
        .at[spids]
        .max(jnp.arange(n, dtype=jnp.int32), mode="drop")
    )
    out = _column_takes(scan, jnp.maximum(idx_map, 0))
    empty = _NEG if combine == "max" else 0.0
    return jnp.where((idx_map >= 0)[:, None], out, empty)


def _segmax_gather_forward(pids, feats, num_rows: int):
    return _seggather_forward(pids, feats, num_rows, "max")


def _diff_scatter_gather_fn(num_rows: int):
    @jax.custom_vjp
    def core(pids, feats):
        return _segmax_gather_forward(pids, feats, num_rows)

    def fwd(pids, feats):
        out = core(pids, feats)
        return out, (pids, feats, out)

    def bwd(residuals, g):
        pids, feats, out = residuals
        c = feats.shape[1]
        safe = jnp.minimum(pids, num_rows - 1)
        both = _column_takes(jnp.concatenate([g, out], axis=1), safe)
        winner = (feats == both[:, c:]) & (pids < num_rows)[:, None]
        return _float0_like(pids), jnp.where(winner, both[:, :c], 0.0)

    core.defvjp(fwd, bwd)
    return core


def scatter_max(features: jax.Array, grid: PillarGrid) -> jax.Array:
    """Per-pillar max of point features -> (H, W, C) dense image.

    Empty pillars come out as 0 (not -inf)."""
    h, w = grid.grid_shape
    neg = jnp.finfo(features.dtype).min
    if _scatter_engine() == "gather":
        feats = jnp.where(grid.in_range[:, None], features.astype(jnp.float32), _NEG)
        mx = _diff_scatter_gather_fn(h * w)(grid.pillar_ids, feats)
        mx = jnp.where(mx <= _NEG / 2, 0.0, mx)
        return mx.reshape(h, w, -1).astype(features.dtype)
    if _use_pallas():
        feats = jnp.where(grid.in_range[:, None], features, _NEG)
        mx = _scatter_rows_pallas(
            grid.pillar_ids, feats, num_rows=h * w, combine="max"
        )[: h * w]
        mx = jnp.where(mx <= _NEG / 2, 0.0, mx)
        return mx.reshape(h, w, -1)
    feats = jnp.where(grid.in_range[:, None], features, neg)
    mx = jax.ops.segment_max(feats, grid.pillar_ids, num_segments=h * w + 1)
    # Empty segments come back as -inf; masked-point segments as finfo.min.
    mx = jnp.where(mx <= neg, 0.0, mx)
    return mx[: h * w].reshape(h, w, -1)


def scatter_max_multi(
    features: Sequence[jax.Array], grids: Sequence[PillarGrid]
) -> list:
    """Per-pillar max for K sweeps in ONE fused scatter -> K (H, W, C) images.

    Equivalent to ``[scatter_max(f, g) for f, g in zip(features, grids)]``
    but concatenates the K point streams with per-sweep row offsets
    (sweep k's trash remapped past every real row) so the sort/band prep
    and the per-call launch overhead are paid once instead of K times.
    The scalar-store count is unchanged — this trims the fixed costs
    around the ~21 ns/point kernel floor (see TODO.md "scatter floor").

    Fusion is gated so it never demotes the scatter off a faster path
    (measured regression when it did: 512² bench 5.53 -> 2.83 Mpts/s):

    - if one sweep's image already rides the RESIDENT kernel (no sorting at
      all), concatenating k*hw rows would push it to the sorted variant;
    - if the concatenated point stream overflows ``_TABLE_BUDGET_BYTES``,
      the sorted scatter falls from the table-resident kernel (zero row
      takes) into the argsort + row-take stream — each take is ~20 ns/row,
      far more than the per-call overhead the fusion saves.

    Either way the per-sweep calls win; fuse only when every sweep would
    take the sorted-table path anyway AND the fused table still fits."""
    assert len(features) == len(grids) and features
    h, w = grids[0].grid_shape
    hw = h * w
    k = len(features)
    channels = features[0].shape[1]
    n_total = sum(f.shape[0] for f in features)
    n_total_pad = n_total + (-n_total % _SCATTER_CHUNK)
    fused_ok = (
        not _pallas_fits(hw, channels)
        and _window_bytes(n_total_pad, channels) <= _TABLE_BUDGET_BYTES
    )
    if k == 1 or not _use_pallas() or not fused_ok:
        return [scatter_max(f, g) for f, g in zip(features, grids)]
    pids = []
    feats = []
    for i, (f, g) in enumerate(zip(features, grids)):
        assert g.grid_shape == (h, w), (g.grid_shape, (h, w))
        # Trash pid (== hw) would collide with sweep i+1's row 0: remap all
        # trash to the shared segment past the last real row.
        pids.append(
            jnp.where(g.pillar_ids >= hw, k * hw, g.pillar_ids + i * hw)
        )
        feats.append(jnp.where(g.in_range[:, None], f, _NEG))
    out = _scatter_rows_pallas(
        jnp.concatenate(pids),
        jnp.concatenate(feats),
        num_rows=k * hw,
        combine="max",
    )
    out = jnp.where(out <= _NEG / 2, 0.0, out)
    return [
        out[i * hw : (i + 1) * hw].reshape(h, w, -1).astype(features[i].dtype)
        for i in range(k)
    ]


def gather_pillars(image: jax.Array, grid: PillarGrid) -> jax.Array:
    """Gather each point's pillar feature back from the dense image.

    Out-of-range points get zeros. VMEM-resident Pallas kernel for small
    images, sorted-banded streaming kernel beyond the budget, XLA take on
    CPU."""
    h, w = grid.grid_shape
    flat = image.reshape(h * w, -1)
    safe = jnp.minimum(grid.pillar_ids, h * w - 1)
    n = safe.shape[0]
    if _use_pallas() and _pallas_fits(h * w, flat.shape[1], 4):
        pad = -n % _SCATTER_CHUNK
        if pad:
            safe = jnp.concatenate([safe, jnp.zeros((pad,), safe.dtype)])
        out = _diff_gather_resident_fn(_interpret())(safe, flat.astype(jnp.float32))[
            :n
        ].astype(flat.dtype)
    elif _use_pallas():
        out = _diff_gather_sorted_fn(h * w, _interpret())(
            safe, flat.astype(jnp.float32)
        ).astype(flat.dtype)
    else:
        out = flat[safe]
    return jnp.where(grid.in_range[:, None], out, 0.0)

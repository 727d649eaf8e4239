"""MXU one-hot scatter/gather over a SORTED point stream.

The pillar rasterizer's floor on TPU is the scalar unit: a random-row VMEM
store costs ~20 cycles and one core has ONE scalar port, so the per-point
dynamic-store kernels in ops/voxelize.py bottom out at ~21 ns/point no
matter how wide the row is (measured round 3; see TODO.md "scatter floor").

For SUM combining there is a way off the scalar unit entirely: with points
sorted by pillar id, a chunk of 128 consecutive points touches a narrow,
monotonically advancing row window, and the scatter of that chunk is a
ONE-HOT MATMUL — ``mask(W, 128) @ feats(128, C)`` accumulated into a
resident (W, C) window, where ``mask[w, p] = (pid[p] == win_start + w)``.
The MXU does all C channels at once, so the cost per point is ~1-3 cycles
(HIGHEST precision) instead of ~20, independent of C. Gather is the
transpose: ``mask^T(128, W) @ window(W, C)`` reads 128 rows per matmul.
Max-combining has no MXU semiring, which is why the max kernels in
voxelize.py keep the scalar path — the pillar encoder grows a mean-pooling
mode to ride this one (models/feedforward.py).

Structure per band (same banding contract as ops/voxelize.py — Mosaic
materializes multi-block output windows, so each band is one pallas_call
with a constant out index map):
- the grid streams 128-point chunks; a (W, C) scratch accumulator follows
  the sorted stream, flushed by read-modify-write block stores whenever the
  next chunk leaves the window (overlap-safe: flushes ADD);
- chunks whose in-band pid span exceeds W fall back to per-point scalar
  stores straight into the band (sum commutes with the pending window);
- chunks straddling a band boundary contribute only their in-band points:
  out-of-band pids never match a window constrained to the band.

Replaces the role of the reference's CUDA ``scatter_max``/``scatter_mean``
voxelizers (OpenSceneFlow submodule, SURVEY.md §2.9) for the mean path.

Chip A/B (v5e, B8 N65536 C32 rows 512², LiDAR-like pid mix): MXU scatter
38.3 ns/pt vs scalar sorted-banded 31.9; MXU gather 44.5 vs XLA row-take
42.2. The one-hot mask build ((win, 128) iota+compare per chunk) plus the
HIGHEST-precision matmul outweigh the scalar stores saved at C=32, so the
scalar kernels stay the default; this pair is kept (tested, differentiable)
for wide-C / dense-stream regimes where the matmul amortizes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from himo_tpu.ops.voxelize import (
    _VMEM_LIMIT_BYTES,
    _band_partition,
    _band_starts,
    _interpret,
)

_CHUNK = 128  # points per MXU chunk (one lane tile)


def _default_win() -> int:
    """Accumulator window rows (sublane dim; multiple of 8). Tunable via
    HIMO_MXU_WIN: the (win, 128) mask build and the mask@feats matmul both
    scale linearly in win, while smaller windows push more sparse-region
    chunks onto the scalar fallback."""
    import os

    return int(os.environ.get("HIMO_MXU_WIN", "1024"))


def _win_rows(band_rows: int) -> int:
    return min(_default_win(), band_rows)


def _scatter_sum_band_kernel(win: int, band_rows: int, bf16: bool):
    def kernel(meta_ref, spids_ref, pidv_ref, feat_ref, o_ref, acc_ref, st_ref):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            o_ref[:, :] = jnp.zeros_like(o_ref)
            acc_ref[:, :] = jnp.zeros_like(acc_ref)
            st_ref[0] = -1  # no live window

        s, e, lo = meta_ref[0], meta_ref[1], meta_ref[2]
        c0 = step * _CHUNK
        c_lo = jnp.maximum(c0, s)
        c_hi = jnp.minimum(c0 + _CHUNK, e)  # exclusive

        def flush():
            w = st_ref[0]

            @pl.when(w >= 0)
            def _():
                ws = pl.multiple_of(w, 8)
                o_ref[pl.ds(ws, win), :] = (
                    o_ref[pl.ds(ws, win), :] + acc_ref[:, :]
                )
                acc_ref[:, :] = jnp.zeros_like(acc_ref)

        @pl.when(c_lo < c_hi)
        def _():
            # Local (band-relative) pid bounds of this chunk's in-band span.
            p_lo = jnp.maximum(spids_ref[c_lo] - lo, 0)
            p_hi = jnp.minimum(spids_ref[c_hi - 1] - lo, band_rows - 1)
            w = st_ref[0]
            fits_cur = (w >= 0) & (p_lo >= w) & (p_hi < w + win)
            fits_new = (p_hi - p_lo) < win

            @pl.when(jnp.logical_not(fits_cur) & fits_new)
            def _():
                flush()
                st_ref[0] = jnp.minimum(
                    (p_lo // 8) * 8, jnp.maximum(band_rows - win, 0)
                )

            @pl.when(fits_cur | fits_new)
            def _():
                w2 = st_ref[0]
                local = (
                    pidv_ref[pl.ds(step, 1), :][0, :]
                    - jnp.float32(lo)
                    - jnp.float32(w2)
                )
                rows = jax.lax.broadcasted_iota(
                    jnp.int32, (win, _CHUNK), 0
                ).astype(jnp.float32)  # Mosaic iota must be integer
                mm = jnp.bfloat16 if bf16 else jnp.float32
                mask = (rows == local[None, :]).astype(mm)
                acc_ref[:, :] += jax.lax.dot_general(
                    mask,
                    feat_ref[:, :].astype(mm),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=(
                        jax.lax.Precision.DEFAULT
                        if bf16
                        else jax.lax.Precision.HIGHEST
                    ),
                )

            @pl.when(jnp.logical_not(fits_cur | fits_new))
            def _():
                # Wide-span chunk (sparse region): per-point scalar stores.
                # Sum commutes with the pending window, so mixing is safe.
                def body(i, _):
                    local = spids_ref[i] - lo

                    @pl.when((local >= 0) & (local < band_rows))
                    def _():
                        o_ref[pl.ds(local, 1), :] = (
                            o_ref[pl.ds(local, 1), :]
                            + feat_ref[pl.ds(i - c0, 1), :]
                        )
                    return 0

                jax.lax.fori_loop(c_lo, c_hi, body, 0)

        @pl.when(step == pl.num_programs(0) - 1)
        def _():
            flush()

    return kernel


@functools.lru_cache(maxsize=None)
def _scatter_sum_call(num_rows: int, channels: int, interpret: bool, bf16: bool):
    bands, band_rows, total_rows = _band_partition(num_rows, channels)
    win = _win_rows(band_rows)

    def band_call(meta, spids, pidv, feats):
        n, c = feats.shape
        return pl.pallas_call(
            _scatter_sum_band_kernel(win, band_rows, bf16),
            out_shape=jax.ShapeDtypeStruct((band_rows, c), feats.dtype),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(n // _CHUNK,),
                in_specs=[
                    # pid vectors stay fully resident ((n/128, 128) f32, a
                    # few hundred KB): Mosaic rejects (1, 128) sublane
                    # blocks, and a dynamic fp32 row read is allowed.
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(
                        (_CHUNK, c), lambda i, *_: (i, 0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=pl.BlockSpec(
                    (band_rows, c), lambda i, *_: (0, 0),
                    memory_space=pltpu.VMEM,
                ),
                scratch_shapes=[
                    pltpu.VMEM((win, c), jnp.float32),
                    pltpu.SMEM((1,), jnp.int32),
                ],
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT_BYTES
            ),
            interpret=interpret,
        )(meta, spids, pidv, feats)

    @jax.custom_batching.custom_vmap
    def scatter(starts, spids, pidv, feats):
        los = jnp.arange(bands, dtype=jnp.int32) * band_rows
        metas = jnp.stack([starts[:-1], starts[1:], los], axis=1)

        def one(meta):
            return jax.lax.optimization_barrier(
                band_call(meta, spids, pidv, feats)
            )

        out = jax.lax.map(one, metas)  # (bands, band_rows, c)
        out = jax.lax.optimization_barrier(out)
        return out.reshape(total_rows, -1)[: num_rows + 8]

    @scatter.def_vmap
    def _vmap_rule(axis_size, in_batched, *args):
        if not all(in_batched):
            raise NotImplementedError("mxu scatter expects batched args")
        out = jax.lax.map(lambda a: scatter(*a), tuple(args))
        return out, True

    return scatter


def _prep_sorted(spids, num_rows: int):
    """(spids_padded, pid_vector (n/128, 128) f32, starts) for a sorted
    stream; padding pids (= num_rows) land in the trash rows."""
    n = spids.shape[0]
    pad = -n % _CHUNK
    if pad:
        spids = jnp.concatenate(
            [spids, jnp.full((pad,), num_rows, spids.dtype)]
        )
    pidv = spids.astype(jnp.float32).reshape(-1, _CHUNK)
    return spids, pidv


def _scatter_sum_impl(spids, feats, num_rows: int, bf16: bool = False):
    n, c = feats.shape
    if not (jax.default_backend() == "tpu" or _interpret()):
        return jax.ops.segment_sum(
            feats, jnp.minimum(spids, num_rows + 7), num_segments=num_rows + 8
        )
    bands, band_rows, _ = _band_partition(num_rows, c)
    spids_p, pidv = _prep_sorted(spids, num_rows)
    if spids_p.shape[0] > n:
        feats = jnp.concatenate(
            [feats, jnp.zeros((spids_p.shape[0] - n, c), feats.dtype)]
        )
    starts = _band_starts(spids_p, bands, band_rows)
    call = _scatter_sum_call(num_rows, c, _interpret(), bf16)
    return call(starts, spids_p, pidv, feats)


@functools.lru_cache(maxsize=None)
def _scatter_sum_vjp_fn(num_rows: int, bf16: bool = False):
    @jax.custom_vjp
    def core(spids, feats):
        return _scatter_sum_impl(spids, feats, num_rows, bf16)

    def fwd(spids, feats):
        return core(spids, feats), spids

    def bwd(spids, g):
        import numpy as onp

        dfeats = _gather_rows_impl(spids, g, num_rows, bf16)
        return (
            onp.zeros(onp.shape(spids), dtype=jax.dtypes.float0),
            dfeats,
        )

    core.defvjp(fwd, bwd)
    return core


def scatter_sum_sorted(spids, feats, *, num_rows: int, mxu_bf16: bool = False):
    """Sum-scatter SORTED (N,) pids / (N, C) rows into (num_rows + 8, C).

    pids must be ascending; rows >= num_rows are trash (sliced by callers).
    fp32 in/out; the one-hot matmul runs at HIGHEST precision, so sums match
    the XLA segment_sum reference to fp32 rounding. Non-TPU backends (no
    interpret flag) fall back to XLA's sorted segment_sum.

    Differentiable in ``feats``: the transpose is :func:`gather_rows_sorted`
    — the whole scatter/gather pair backpropagates through MXU matmuls.

    ``mxu_bf16=True`` runs the one-hot matmul at DEFAULT precision on bf16
    operands (fp32 accumulate): ~6x MXU throughput for ~3 mantissa digits
    of the inputs — right for bf16 models; keep fp32 for loss-grade sums."""
    return _scatter_sum_vjp_fn(num_rows, mxu_bf16)(spids, feats)


# ------------------------------------------------------------------ gather


def _gather_band_kernel(win: int, band_rows: int, bf16: bool):
    def kernel(meta_ref, spids_ref, pidv_ref, img_ref, o_ref):
        step = pl.program_id(0)
        s, e, lo = meta_ref[0], meta_ref[1], meta_ref[2]
        c0 = step * _CHUNK
        c_lo = jnp.maximum(c0, s)
        c_hi = jnp.minimum(c0 + _CHUNK, e)

        @pl.when(c_lo >= c_hi)
        def _():
            # Chunk outside this band's point range: its out block must
            # still be written (streamed out blocks hold garbage otherwise).
            o_ref[:, :] = jnp.zeros_like(o_ref)

        @pl.when(c_lo < c_hi)
        def _():
            p_lo = jnp.maximum(spids_ref[c_lo] - lo, 0)
            p_hi = jnp.minimum(spids_ref[c_hi - 1] - lo, band_rows - 1)
            fits = (p_hi - p_lo) < win

            @pl.when(fits)
            def _():
                w = jnp.minimum((p_lo // 8) * 8, jnp.maximum(band_rows - win, 0))
                ws = pl.multiple_of(w, 8)
                local = (
                    pidv_ref[pl.ds(step, 1), :][0, :]
                    - jnp.float32(lo)
                    - jnp.float32(w)
                )
                rows = jax.lax.broadcasted_iota(
                    jnp.int32, (win, _CHUNK), 0
                ).astype(jnp.float32)  # Mosaic iota must be integer
                mm = jnp.bfloat16 if bf16 else jnp.float32
                mask = (rows == local[None, :]).astype(mm)
                o_ref[:, :] = jax.lax.dot_general(
                    mask,
                    img_ref[pl.ds(ws, win), :].astype(mm),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=(
                        jax.lax.Precision.DEFAULT
                        if bf16
                        else jax.lax.Precision.HIGHEST
                    ),
                )

            @pl.when(jnp.logical_not(fits))
            def _():
                o_ref[:, :] = jnp.zeros_like(o_ref)

                def body(i, _):
                    local = spids_ref[i] - lo

                    @pl.when((local >= 0) & (local < band_rows))
                    def _():
                        o_ref[pl.ds(i - c0, 1), :] = img_ref[
                            pl.ds(local, 1), :
                        ]
                    return 0

                jax.lax.fori_loop(c_lo, c_hi, body, 0)

    return kernel


@functools.lru_cache(maxsize=None)
def _gather_call(num_rows: int, channels: int, interpret: bool, bf16: bool):
    bands, band_rows, total_rows = _band_partition(num_rows, channels)
    win = _win_rows(band_rows)

    def band_call(meta, spids, pidv, img_band):
        n = spids.shape[0]
        return pl.pallas_call(
            _gather_band_kernel(win, band_rows, bf16),
            out_shape=jax.ShapeDtypeStruct((n, channels), jnp.float32),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(n // _CHUNK,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),  # pidv resident
                    pl.BlockSpec(
                        (band_rows, channels), lambda i, *_: (0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                out_specs=pl.BlockSpec(
                    (_CHUNK, channels), lambda i, *_: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT_BYTES
            ),
            interpret=interpret,
        )(meta, spids, pidv, img_band)

    @jax.custom_batching.custom_vmap
    def gather(starts, spids, pidv, image):
        # image: (num_rows + 8, C); pad to the banded layout.
        pad_rows = total_rows - image.shape[0]
        img = jnp.concatenate(
            [image, jnp.zeros((pad_rows, image.shape[1]), image.dtype)]
        ).reshape(bands, band_rows, -1)
        los = jnp.arange(bands, dtype=jnp.int32) * band_rows
        metas = jnp.stack([starts[:-1], starts[1:], los], axis=1)

        def one(args):
            meta, band = args
            return jax.lax.optimization_barrier(
                band_call(meta, spids, pidv, band)
            )

        parts = jax.lax.map(one, (metas, img))  # (bands, n, C)
        return jnp.sum(parts, axis=0)

    @gather.def_vmap
    def _vmap_rule(axis_size, in_batched, *args):
        if not all(in_batched):
            raise NotImplementedError("mxu gather expects batched args")
        out = jax.lax.map(lambda a: gather(*a), tuple(args))
        return out, True

    return gather


def _gather_rows_impl(spids, image, num_rows: int, bf16: bool = False):
    n = spids.shape[0]
    c = image.shape[1]
    if not (jax.default_backend() == "tpu" or _interpret()):
        return jnp.take(image, jnp.minimum(spids, image.shape[0] - 1), axis=0)
    bands, band_rows, _ = _band_partition(num_rows, c)
    spids_p, pidv = _prep_sorted(spids, num_rows)
    starts = _band_starts(spids_p, bands, band_rows)
    call = _gather_call(num_rows, c, _interpret(), bf16)
    out = call(starts, spids_p, pidv, image)
    return out[:n]


@functools.lru_cache(maxsize=None)
def _gather_rows_vjp_fn(num_rows: int, bf16: bool = False):
    @jax.custom_vjp
    def core(spids, image):
        return _gather_rows_impl(spids, image, num_rows, bf16)

    def fwd(spids, image):
        return core(spids, image), spids

    def bwd(spids, g):
        import numpy as onp

        dimage = _scatter_sum_impl(spids, g, num_rows, bf16)
        return (
            onp.zeros(onp.shape(spids), dtype=jax.dtypes.float0),
            dimage,
        )

    core.defvjp(fwd, bwd)
    return core


def gather_rows_sorted(spids, image, *, num_rows: int, mxu_bf16: bool = False):
    """Per-point rows of ``image`` ((num_rows + 8, C)) for a SORTED pid
    stream -> (N, C).

    The transpose of :func:`scatter_sum_sorted`: one-hot^T @ window matmuls
    instead of per-row dynamic loads. pids >= num_rows read the trash rows
    (content is caller don't-care; their gradient still routes to the trash
    rows, which callers slice off). Non-TPU backends (no interpret flag)
    fall back to an XLA row take. ``mxu_bf16`` as in
    :func:`scatter_sum_sorted`."""
    return _gather_rows_vjp_fn(num_rows, mxu_bf16)(spids, image)

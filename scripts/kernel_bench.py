"""Repeatable chip microbench for the TODO.md kernel A/Bs.

Times the hot kernels at the 512^2-training shapes on the default device,
honoring the env knobs they A/B:

- pillar scatter-max forward + backward (HIMO_MAXBWD_PALLAS routes the
  max-backward's fused row-take through the Pallas gather vs XLA take);
- the NN loss kernels: plain min pass vs the min+argmin pass
  (HIMO_NN_RT sweeps the reference tile);
- the MXU one-hot scatter/gather pair vs the scalar sorted-banded kernels
  (HIMO_MXU_WIN sweeps the accumulator window rows).

Section selection via HIMO_BENCH_ONLY:
    (unset/'')  scatter fwd+bwd, then the NN section
    'scatter'   scatter fwd+bwd only
    'nn'        NN section only (sweep HIMO_NN_RT cheaply)
    'mxu'       MXU one-hot scatter/gather A/B only (sweep HIMO_MXU_WIN)
    'store'     store-only scatter probes: does removing the RMW read
                (read-modify-write alias hazard on the output window) let
                Mosaic pipeline the per-point dynamic-row stores? Times the
                RMW table kernel vs write-only variants (table order-chase
                and presorted stream, +/- the in-kernel segmented
                prefix-max that makes ordered write-only stores correct).
Any other value exits with an error (a typo must not silently run the
wrong section). HIMO_BENCH_PRIMS=1 adds the XLA-primitive probes to the
scatter section.

Timing follows the CLAUDE.md rules for the axon tunnel: K dependent
iterations per dispatch inside one jit, scalar readback with np.asarray,
median-of-5, RTT subtracted. Prints one line per measurement:

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/kernel_bench.py
"""

from __future__ import annotations

import os
import time

import numpy as np

B = 8
N = 65536
ROWS = 512 * 512
C = 33
CHAIN = 8


def _rtt(jnp, jax):
    @jax.jit
    def tiny(x):
        return x + 1.0

    np.asarray(tiny(jnp.ones(())))
    ts = []
    for _ in range(5):
        t = time.perf_counter()
        np.asarray(tiny(jnp.ones(())))
        ts.append(time.perf_counter() - t)
    return float(np.median(ts))


def _time(fn, *args, rtt=0.0):
    np.asarray(fn(*args))  # compile + warm
    ts = []
    for _ in range(5):
        t = time.perf_counter()
        np.asarray(fn(*args))
        ts.append(time.perf_counter() - t)
    return max(float(np.median(ts)) - rtt, 1e-9) / CHAIN


def _primitive_probes(jax, jnp, rng, rtt):
    """Cost of the XLA primitives the gather-composed scatter rides
    (HIMO_BENCH_PRIMS=1): 1-D take, row take, 1-D scatter-max, segmented
    cummax, and XLA's own sorted segment_max — per element, batched B."""
    from himo_tpu.ops.voxelize import _seg_cummax

    n, c = N, 32
    src = jnp.asarray(rng.normal(size=(B, n, c)), jnp.float32)
    idx_n = jnp.asarray(rng.integers(0, n, (B, n)), jnp.int32)
    idx_hw = jnp.asarray(rng.integers(0, n, (B, ROWS)), jnp.int32)
    spids = jnp.sort(jnp.asarray(rng.integers(0, ROWS, (B, n)), jnp.int32))

    def chain(fn, consume, *args):
        @jax.jit
        def run(*a):
            def body(carry, _):
                out = fn(carry, *a[1:])
                return consume(carry, out), None

            o, _ = jax.lax.scan(body, a[0], None, length=CHAIN)
            return jnp.sum(o[:, 0, 0] if o.ndim > 2 else o[:, 0])

        return _time(run, *args, rtt=rtt)

    # 1-D column take: C separate takes of (n,) by (n,) indices.
    def col_takes(s, ix):
        return jnp.stack(
            [jnp.take(s[:, k], ix) for k in range(s.shape[1])], axis=1
        )

    t = chain(
        lambda s, ix: jax.vmap(col_takes)(s, ix),
        lambda s, o: s + 1e-12 * o,
        src, idx_n,
    )
    print(f"  1-D col takes (B{B} n{n} C{c}):     {1e3 * t:.2f} ms = "
          f"{1e9 * t / (B * n):.2f} ns/row ({1e9 * t / (B * n * c):.2f} ns/elem)")

    t = chain(
        lambda s, ix: jax.vmap(lambda a, b: jnp.take(a, b, axis=0))(s, ix),
        lambda s, o: s + 1e-12 * o,
        src, idx_n,
    )
    print(f"  row take (B{B} n{n} C{c}):          {1e3 * t:.2f} ms = "
          f"{1e9 * t / (B * n):.2f} ns/row")

    # wide 1-D take: image build (ROWS indices into an n-sized column)
    def col_takes_hw(s, ix):
        return jnp.stack(
            [jnp.take(s[:, k], ix) for k in range(s.shape[1])], axis=1
        )

    t = chain(
        lambda s, ix: jax.vmap(col_takes_hw)(s, ix),
        lambda s, o: s + 1e-12 * o[:, : s.shape[1]],
        src, idx_hw,
    )
    print(f"  1-D col takes to rows{ROWS}:        {1e3 * t:.2f} ms = "
          f"{1e9 * t / (B * ROWS):.2f} ns/row")

    # 1-D int scatter-max into ROWS
    def idx_scatter(s, sp):
        m = (
            jnp.full((ROWS,), -1, jnp.int32)
            .at[sp]
            .max(jnp.arange(n, dtype=jnp.int32), mode="drop")
        )
        return m

    t = chain(
        lambda s, sp: jax.vmap(idx_scatter)(s, sp).astype(jnp.float32),
        lambda s, o: s + 1e-12 * o[:, :1][:, None, :],
        src, spids,
    )
    print(f"  1-D scatter-max idx map (n{n} -> rows{ROWS}): {1e3 * t:.2f} ms = "
          f"{1e9 * t / (B * n):.2f} ns/pt")

    # segmented cummax over the sorted stream
    def segscan(s, sp):
        reset = jnp.concatenate([jnp.ones((1,), bool), sp[1:] != sp[:-1]])
        return _seg_cummax(s, reset)

    t = chain(
        lambda s, sp: jax.vmap(segscan)(s, sp),
        lambda s, o: s + 1e-12 * o,
        src, spids,
    )
    print(f"  seg cummax (B{B} n{n} C{c}):        {1e3 * t:.2f} ms = "
          f"{1e9 * t / (B * n):.2f} ns/pt")

    # searchsorted alternative to the 1-D index scatter: per-pillar end
    # index = searchsorted(spids, row, 'right') - 1 (17 rounds of 1-D takes)
    def ssorted(s, sp):
        e = jnp.searchsorted(sp, jnp.arange(ROWS, dtype=sp.dtype), side="right")
        return (e - 1).astype(jnp.float32)

    t = chain(
        lambda s, sp: jax.vmap(ssorted)(s, sp),
        lambda s, o: s + 1e-12 * o[:, :1][:, None, :],
        src, spids,
    )
    print(f"  searchsorted idx map (n{n} -> rows{ROWS}): {1e3 * t:.2f} ms = "
          f"{1e9 * t / (B * n):.2f} ns/pt")

    # XLA segment_max with sorted hint (the straight alternative)
    def seg_max(s, sp):
        return jax.ops.segment_max(
            s, sp, num_segments=ROWS, indices_are_sorted=True
        )

    t = chain(
        lambda s, sp: jax.vmap(seg_max)(s, sp),
        lambda s, o: s + 1e-12 * o[:, : s.shape[1]],
        src, spids,
    )
    print(f"  XLA segment_max sorted (n{n} -> rows{ROWS}): {1e3 * t:.2f} ms = "
          f"{1e9 * t / (B * n):.2f} ns/pt")


def main():
    import jax
    import jax.numpy as jnp

    from himo_tpu.ops.voxelize import PillarConfig, voxelize_pillars

    rtt = _rtt(jnp, jax)
    print(f"device={jax.devices()[0].platform} rtt={1e3 * rtt:.1f} ms")
    rng = np.random.default_rng(0)
    only = os.environ.get("HIMO_BENCH_ONLY", "")
    if only not in ("", "scatter", "nn", "mxu", "store"):
        raise SystemExit(
            f"HIMO_BENCH_ONLY={only!r} is not one of "
            "'', 'scatter', 'nn', 'mxu', 'store'"
        )

    # ---- scatter fwd+bwd at training shapes (B, N, C) -> 512^2 rows
    if only == "mxu":
        _mxu_section(jax, jnp, rng, rtt)
        return
    if only == "store":
        _store_section(jax, jnp, rng, rtt)
        return
    if only == "nn":
        _nn_section(jax, jnp, rng, rtt)
        return
    pc = jnp.asarray(rng.uniform(-50, 50, (B, N, 3)), jnp.float32)
    valid = jnp.asarray(rng.uniform(size=(B, N)) < 0.92)
    feats = jnp.asarray(rng.normal(size=(B, N, C)), jnp.float32)
    pillar = PillarConfig(voxel_size=(0.2, 0.2))

    from himo_tpu.ops.voxelize import scatter_max

    def one_scatter(p, v, f):
        return scatter_max(f, voxelize_pillars(p, v, pillar))

    @jax.jit
    def scatter_chain(pc, valid, feats):
        def body(f, _):
            img = jax.vmap(one_scatter)(pc, valid, f)
            # feed a slice of the image back into feats: real dependency
            f2 = f + img[:, 0, 0, 0].reshape(B, 1, 1) * 1e-9
            return f2, None

        out, _ = jax.lax.scan(body, feats, None, length=CHAIN)
        return jnp.sum(out[:, 0, 0])

    t = _time(scatter_chain, pc, valid, feats, rtt=rtt)
    print(f"scatter_max fwd (B{B} N{N} C{C} rows{ROWS}, "
          f"engine={os.environ.get('HIMO_SCATTER', 'pallas')}): {1e3 * t:.1f} ms "
          f"= {1e9 * t / (B * N):.1f} ns/pt")

    if os.environ.get("HIMO_BENCH_PRIMS", "0") == "1":
        _primitive_probes(jax, jnp, rng, rtt)

    @jax.jit
    def scatter_grad_chain(pc, valid, feats):
        def loss(f):
            img = jax.vmap(one_scatter)(pc, valid, f)
            return jnp.sum(img * img)

        def body(f, _):
            g = jax.grad(loss)(f)
            return f + 1e-12 * g, None

        out, _ = jax.lax.scan(body, feats, None, length=CHAIN)
        return jnp.sum(out[:, 0, 0])

    t = _time(scatter_grad_chain, pc, valid, feats, rtt=rtt)
    print(f"scatter_max fwd+bwd (MAXBWD_PALLAS="
          f"{os.environ.get('HIMO_MAXBWD_PALLAS', '0')}): {1e3 * t:.1f} ms")

    if only != "scatter":
        _nn_section(jax, jnp, rng, rtt)


def _store_section(jax, jnp, rng, rtt):
    """Write-only scatter probes (HIMO_BENCH_ONLY=store).

    Hypothesis: the ~21 ns/pt scalar floor of the table RMW kernel is the
    READ side of its read-modify-write — Mosaic must serialize dynamic-row
    RMWs on the same window (any two might alias), while pure stores to
    unknown rows can overlap (write-after-write ordering is free). With
    pid-SORTED streams write-only is made CORRECT by a segmented inclusive
    prefix-combine first (each segment's last row holds its total; stores
    issue in ascending order so the last write per pillar wins). Probes:

      rmw table      — the production kernel (order-chase, RMW), baseline
      store table    — order-chase, o_ref write only (dup-INCORRECT; floor)
      store stream   — presorted feats streamed, write only (dup-INCORRECT)
      store stream+scan — + in-kernel log2(CHUNK) segmented prefix-max
                       (chunk-correct; cross-chunk carry not in the probe)
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import bench as _bench
    from himo_tpu.ops import voxelize as V
    from himo_tpu.ops.voxelize import PillarConfig, voxelize_pillars

    pillar = PillarConfig(voxel_size=(0.2, 0.2))
    rows = 512 * 512
    c = 32
    pc = jnp.asarray(_bench.lidar_like_cloud(np.random.default_rng(0), B, N))
    valid = jnp.asarray(rng.uniform(size=(B, N)) < 0.92)
    feats = jnp.asarray(rng.normal(size=(B, N, c)), jnp.float32)
    bands, band_rows, total_rows = V._band_partition(rows, c)
    chunk = V._SCATTER_CHUNK
    print(f"bands={bands} band_rows={band_rows} chunk={chunk}")

    def prep(p, v, f):
        grid = voxelize_pillars(p, v, pillar)
        pids = grid.pillar_ids
        f = jnp.where(grid.in_range[:, None], f, V._NEG)
        order = jnp.argsort(pids).astype(jnp.int32)
        spids = jnp.take(pids, order)
        fsort = jnp.take(f, order, axis=0)
        starts = V._band_starts(spids, bands, band_rows)
        n_live = jnp.searchsorted(spids, jnp.asarray(rows, spids.dtype))
        starts = jnp.minimum(starts, n_live.astype(jnp.int32))
        return spids, order, f, fsort, starts

    spids, order, ftab, fsort, starts = jax.jit(jax.vmap(prep))(pc, valid, feats)

    # --- kernel variants (single band call; lax.map over bands like prod)
    def table_kernel(rmw):
        def kernel(meta_ref, spids_ref, order_ref, feat_ref, o_ref):
            o_ref[:, :] = jnp.full_like(o_ref, V._NEG)
            lo = meta_ref[2]
            s, e = meta_ref[0], meta_ref[1]
            n_main = (e - s) // V._UNROLL

            def one(i):
                row = feat_ref[pl.ds(order_ref[i], 1), :]
                local = spids_ref[i] - lo
                if rmw:
                    cur = o_ref[pl.ds(local, 1), :]
                    o_ref[pl.ds(local, 1), :] = jnp.maximum(cur, row)
                else:
                    o_ref[pl.ds(local, 1), :] = row

            def body(t, _):
                base = s + t * V._UNROLL
                for u in range(V._UNROLL):
                    one(base + u)
                return 0

            jax.lax.fori_loop(0, n_main, body, 0)

            def tail(i, _):
                one(i)
                return 0

            jax.lax.fori_loop(s + n_main * V._UNROLL, e, tail, 0)

        return kernel

    def stream_kernel(scan):
        def kernel(meta_ref, spids_ref, pidv_ref, feat_ref, o_ref, scr_ref):
            step = pl.program_id(0)

            @pl.when(step == 0)
            def _():
                o_ref[:, :] = jnp.full_like(o_ref, V._NEG)

            vals = feat_ref[:, :]
            if scan:
                pidv = pidv_ref[:, :]
                idx = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)
                d = 1
                while d < chunk:
                    sv = pltpu.roll(vals, d, 0)
                    sp = pltpu.roll(pidv, d, 0)
                    ok = (sp == pidv) & (idx >= d)
                    vals = jnp.where(ok, jnp.maximum(vals, sv), vals)
                    d *= 2
            scr_ref[:, :] = vals
            s = jnp.maximum(meta_ref[0], step * chunk)
            e = jnp.minimum(meta_ref[1], (step + 1) * chunk)
            lo = meta_ref[2]
            base = step * chunk
            n_main = (e - s) // V._UNROLL

            def one(i):
                o_ref[pl.ds(spids_ref[i] - lo, 1), :] = scr_ref[
                    pl.ds(i - base, 1), :
                ]

            def body(t, _):
                bs = s + t * V._UNROLL
                for u in range(V._UNROLL):
                    one(bs + u)
                return 0

            jax.lax.fori_loop(0, n_main, body, 0)

            def tail(i, _):
                one(i)
                return 0

            jax.lax.fori_loop(s + n_main * V._UNROLL, e, tail, 0)

        return kernel

    params = pltpu.CompilerParams(vmem_limit_bytes=V._VMEM_LIMIT_BYTES)

    def table_call(kern):
        def band_call(meta, sp, od, ft):
            n = ft.shape[0]
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((band_rows, c), ft.dtype),
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=3,
                    grid=(1,),
                    in_specs=[pl.BlockSpec((n, c), lambda i, *_: (0, 0),
                                           memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec((band_rows, c), lambda i, *_: (0, 0),
                                           memory_space=pltpu.VMEM),
                ),
                compiler_params=params,
            )(meta, sp, od, ft)

        def one_frame(sp, od, ft, st):
            los = jnp.arange(bands, dtype=jnp.int32) * band_rows
            metas = jnp.stack([st[:-1], st[1:], los], axis=1)
            out = jax.lax.map(
                lambda m: jax.lax.optimization_barrier(band_call(m, sp, od, ft)),
                metas,
            )
            return jax.lax.optimization_barrier(out).reshape(total_rows, c)

        return one_frame

    def stream_call(kern):
        def band_call(meta, sp, fs):
            n = fs.shape[0]
            return pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((band_rows, c), fs.dtype),
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=2,
                    grid=(n // chunk,),
                    in_specs=[
                        pl.BlockSpec((chunk, 1), lambda i, *_: (i, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((chunk, c), lambda i, *_: (i, 0),
                                     memory_space=pltpu.VMEM),
                    ],
                    scratch_shapes=[pltpu.VMEM((chunk, c), jnp.float32)],
                    out_specs=pl.BlockSpec((band_rows, c), lambda i, *_: (0, 0),
                                           memory_space=pltpu.VMEM),
                ),
                compiler_params=params,
            )(meta, sp, sp[:, None].astype(jnp.int32), fs)

        def one_frame(sp, fs, st):
            los = jnp.arange(bands, dtype=jnp.int32) * band_rows
            metas = jnp.stack([st[:-1], st[1:], los], axis=1)
            out = jax.lax.map(
                lambda m: jax.lax.optimization_barrier(band_call(m, sp, fs)),
                metas,
            )
            return jax.lax.optimization_barrier(out).reshape(total_rows, c)

        return one_frame

    def chain(one_frame, *inputs):
        @jax.jit
        def run(*args):
            def body(f, _):
                img = jax.vmap(one_frame)(*args[:-1], f)
                f2 = args[-1] + img[:, 0, 0].reshape(B, 1, 1) * 1e-9
                return f2, None

            # thread the LAST input (feats-like) through the scan
            out, _ = jax.lax.scan(body, args[-1], None, length=CHAIN)
            return jnp.sum(out[:, 0, 0])

        return _time(run, *inputs, rtt=rtt)

    t = chain(lambda sp, od, st, ft: table_call(table_kernel(True))(sp, od, ft, st),
              spids, order, starts, ftab)
    print(f"rmw table   (B{B} N{N} C{c}): {1e3 * t:.1f} ms = {1e9 * t / (B * N):.1f} ns/pt")
    t = chain(lambda sp, od, st, ft: table_call(table_kernel(False))(sp, od, ft, st),
              spids, order, starts, ftab)
    print(f"store table (dup-incorrect): {1e3 * t:.1f} ms = {1e9 * t / (B * N):.1f} ns/pt")
    t = chain(lambda sp, st, fs: stream_call(stream_kernel(False))(sp, fs, st),
              spids, starts, fsort)
    print(f"store stream (dup-incorrect): {1e3 * t:.1f} ms = {1e9 * t / (B * N):.1f} ns/pt")
    t = chain(lambda sp, st, fs: stream_call(stream_kernel(True))(sp, fs, st),
              spids, starts, fsort)
    print(f"store stream+scan (chunk-correct): {1e3 * t:.1f} ms = {1e9 * t / (B * N):.1f} ns/pt")


def _mxu_section(jax, jnp, rng, rtt):
    """MXU one-hot scatter/gather vs the scalar sorted-banded kernels, on
    LiDAR-like (realistically clustered) pid streams at the 512^2 grid.
    HIMO_BENCH_ONLY=mxu; sweep HIMO_MXU_WIN across runs. The fp32 variant
    runs the one-hot matmul at HIGHEST precision (6 passes); bf16 runs
    DEFAULT on bf16 operands with fp32 accumulate — exact for 0/1 masks,
    so only the feats carry bf16 rounding (the bf16 model's native dtype)."""
    import bench as _bench
    from himo_tpu.ops.mxu_scatter import gather_rows_sorted, scatter_sum_sorted
    from himo_tpu.ops.voxelize import PillarConfig, scatter_max, voxelize_pillars

    pillar = PillarConfig(voxel_size=(0.2, 0.2))
    pc = jnp.asarray(_bench.lidar_like_cloud(np.random.default_rng(0), B, N))
    valid = jnp.asarray(rng.uniform(size=(B, N)) < 0.92)
    feats = jnp.asarray(rng.normal(size=(B, N, C - 1)), jnp.float32)

    def prep(p, v, f):
        grid = voxelize_pillars(p, v, pillar)
        order = jnp.argsort(grid.pillar_ids).astype(jnp.int32)
        spids = jnp.take(grid.pillar_ids, order)
        fs = jnp.take(f, order, axis=0)
        return spids, fs

    spids, fsort = jax.jit(jax.vmap(prep))(pc, valid, feats)
    win = os.environ.get("HIMO_MXU_WIN", "1024")

    def chain(fn):
        @jax.jit
        def run(spids, fs):
            def body(f, _):
                img = fn(spids, f)
                f2 = f + img[:, 0, 0].reshape(B, 1, 1) * 1e-9
                return f2, None

            out, _ = jax.lax.scan(body, fs, None, length=CHAIN)
            return jnp.sum(out[:, 0, 0])

        return run

    rows = 512 * 512
    for name, fn in [
        ("mxu sum fp32", lambda s, f: jax.vmap(
            lambda si, fi: scatter_sum_sorted(si, fi, num_rows=rows)
        )(s, f)),
        ("mxu sum bf16", lambda s, f: jax.vmap(
            lambda si, fi: scatter_sum_sorted(
                si, fi, num_rows=rows, mxu_bf16=True
            )
        )(s, f)),
    ]:
        t = _time(chain(fn), spids, fsort, rtt=rtt)
        print(f"{name} (B{B} N{N} C{C - 1} rows 512², win={win}): "
              f"{1e3 * t:.1f} ms = {1e9 * t / (B * N):.1f} ns/pt")

    # Symmetric variant: the MXU sum paying its OWN prep (voxelize + argsort
    # + takes) inside the chain, so its ns/pt compares the same work as the
    # "scalar max incl. prep" line below (the kernel-only lines above time
    # presorted streams).
    @jax.jit
    def mxu_prep_chain(pc, valid, feats):
        def body(f, _):
            sp, fs = jax.vmap(prep)(pc, valid, f)
            img = jax.vmap(
                lambda si, fi: scatter_sum_sorted(
                    si, fi, num_rows=rows, mxu_bf16=True
                )
            )(sp, fs)
            f2 = f + img[:, 0, 0].reshape(B, 1, 1) * 1e-9
            return f2, None

        out, _ = jax.lax.scan(body, feats, None, length=CHAIN)
        return jnp.sum(out[:, 0, 0])

    t = _time(mxu_prep_chain, pc, valid, feats, rtt=rtt)
    print(f"mxu sum bf16 incl. prep (same clouds): {1e3 * t:.1f} ms "
          f"= {1e9 * t / (B * N):.1f} ns/pt")

    # Scalar sorted-banded max on the SAME clouds, for a clean baseline.
    def smax(p, v, f):
        return scatter_max(f, voxelize_pillars(p, v, pillar))

    @jax.jit
    def max_chain(pc, valid, feats):
        def body(f, _):
            img = jax.vmap(smax)(pc, valid, f)
            f2 = f + img[:, 0, 0, 0].reshape(B, 1, 1) * 1e-9
            return f2, None

        out, _ = jax.lax.scan(body, feats, None, length=CHAIN)
        return jnp.sum(out[:, 0, 0])

    t = _time(max_chain, pc, valid, feats, rtt=rtt)
    print(f"scalar max incl. prep (same clouds): {1e3 * t:.1f} ms "
          f"= {1e9 * t / (B * N):.1f} ns/pt")

    # Gather pair at UNet-output width (C=64), both precisions.
    img = jnp.asarray(rng.normal(size=(B, rows + 8, 64)), jnp.float32)

    def gchain(bf16):
        @jax.jit
        def run(spids, img):
            def body(im, _):
                g = jax.vmap(
                    lambda si, ii: gather_rows_sorted(
                        si, ii, num_rows=rows, mxu_bf16=bf16
                    )
                )(spids, im)
                im2 = im + g[:, 0, 0].reshape(B, 1, 1) * 1e-9
                return im2, None

            out, _ = jax.lax.scan(body, img, None, length=CHAIN)
            return jnp.sum(out[:, 0, 0])

        return run

    for name, bf in [("mxu gather fp32", False), ("mxu gather bf16", True)]:
        t = _time(gchain(bf), spids, img, rtt=rtt)
        print(f"{name} (C64, win={win}): {1e3 * t:.1f} ms "
              f"= {1e9 * t / (B * N):.1f} ns/pt")


def _nn_section(jax, jnp, rng, rtt):
    """NN loss kernels at 16k x 16k; split out so HIMO_BENCH_ONLY=nn can
    sweep HIMO_NN_RT without paying the scatter compiles."""
    from himo_tpu.ops.nn import nn_argmin, nn_distance_sq

    # ---- NN kernels at loss shapes (16k x 16k)
    q = jnp.asarray(rng.uniform(-50, 50, (B, 16384, 3)), jnp.float32)
    r = jnp.asarray(rng.uniform(-50, 50, (B, 16384, 3)), jnp.float32)
    vq = jnp.asarray(rng.uniform(size=(B, 16384)) < 0.92)
    vr = jnp.asarray(rng.uniform(size=(B, 16384)) < 0.92)

    @jax.jit
    def min_chain(q, r, vq, vr):
        def body(c, _):
            d = jax.vmap(nn_distance_sq)(c, r, vq, vr)
            return c + d[..., None] * 1e-12, None

        out, _ = jax.lax.scan(body, q, None, length=CHAIN)
        return jnp.sum(out[:, 0, 0])

    @jax.jit
    def argmin_chain(q, r, vq, vr):
        def body(c, _):
            d, ix = jax.vmap(nn_argmin)(c, r, vq, vr)
            return c + (d + ix)[..., None] * 1e-12, None

        out, _ = jax.lax.scan(body, q, None, length=CHAIN)
        return jnp.sum(out[:, 0, 0])

    t_min = _time(min_chain, q, r, vq, vr, rtt=rtt)
    t_arg = _time(argmin_chain, q, r, vq, vr, rtt=rtt)
    print(f"nn min pass (B{B} 16k x 16k, RT={os.environ.get('HIMO_NN_RT', 'default')}): "
          f"{1e3 * t_min:.1f} ms; min+argmin: {1e3 * t_arg:.1f} ms "
          f"(ratio {t_arg / t_min:.2f})")


if __name__ == "__main__":
    main()

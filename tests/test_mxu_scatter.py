"""MXU one-hot scatter/gather (ops/mxu_scatter.py) — interpret-mode parity
against XLA segment ops, including the band-straddle, wide-span-fallback,
trash-pid, and vmap paths the kernels special-case."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setenv("HIMO_PALLAS_INTERPRET", "1")


def _sorted_case(rng, num_rows, n, c, trash=5, clustered=False):
    if clustered:
        # Heavy-tailed pid distribution: dense object blobs + sparse tail,
        # so some 128-point chunks span far beyond the window (scalar
        # fallback path) while most ride the MXU.
        dense = rng.integers(0, num_rows // 50, size=n // 2)
        sparse = rng.integers(0, num_rows, size=n - n // 2)
        pids = np.sort(np.concatenate([dense, sparse])).astype(np.int32)
    else:
        pids = np.sort(rng.integers(0, num_rows, size=n)).astype(np.int32)
    if trash:
        pids[-trash:] = num_rows
    feats = rng.normal(size=(n, c)).astype(np.float32)
    return pids, feats


@pytest.mark.parametrize(
    "num_rows,n,c,clustered",
    [
        (4000, 2000, 32, False),
        (300, 700, 8, False),  # window == band
        (65536, 4096, 33, True),  # scalar-fallback chunks
    ],
)
def test_scatter_sum_matches_segment_sum(num_rows, n, c, clustered):
    from himo_tpu.ops.mxu_scatter import scatter_sum_sorted

    rng = np.random.default_rng(0)
    pids, feats = _sorted_case(rng, num_rows, n, c, clustered=clustered)
    out = np.asarray(
        scatter_sum_sorted(jnp.asarray(pids), jnp.asarray(feats), num_rows=num_rows)
    )
    live = pids < num_rows
    ref = np.asarray(
        jax.ops.segment_sum(
            jnp.asarray(feats[live]), jnp.asarray(pids[live]), num_segments=num_rows
        )
    )
    np.testing.assert_allclose(out[:num_rows], ref, atol=1e-4)


def test_gather_matches_rows():
    from himo_tpu.ops.mxu_scatter import gather_rows_sorted

    rng = np.random.default_rng(1)
    num_rows, n, c = 8192, 3000, 16
    pids, _ = _sorted_case(rng, num_rows, n, c, clustered=True)
    img = rng.normal(size=(num_rows + 8, c)).astype(np.float32)
    out = np.asarray(
        gather_rows_sorted(jnp.asarray(pids), jnp.asarray(img), num_rows=num_rows)
    )
    live = pids < num_rows
    np.testing.assert_allclose(out[live], img[pids[live]], atol=1e-5)


def test_multi_band_straddle():
    """Force multiple bands (channel width blows the band budget at a tall
    grid) and check pids crossing the band boundary inside one chunk."""
    from himo_tpu.ops.voxelize import _band_partition
    from himo_tpu.ops.mxu_scatter import gather_rows_sorted, scatter_sum_sorted

    num_rows, c = 262144, 128  # 512^2-style
    bands, band_rows, _ = _band_partition(num_rows, c)
    assert bands >= 2, (bands, band_rows)
    rng = np.random.default_rng(2)
    # Concentrate points around every band boundary.
    edges = np.arange(1, bands) * band_rows
    pids = np.sort(
        np.concatenate(
            [rng.integers(e - 200, e + 200, size=400) for e in edges]
            + [rng.integers(0, num_rows, size=1000)]
        )
    ).astype(np.int32)
    feats = rng.normal(size=(len(pids), c)).astype(np.float32)
    out = np.asarray(
        scatter_sum_sorted(jnp.asarray(pids), jnp.asarray(feats), num_rows=num_rows)
    )
    ref = np.asarray(
        jax.ops.segment_sum(jnp.asarray(feats), jnp.asarray(pids), num_segments=num_rows)
    )
    np.testing.assert_allclose(out[:num_rows], ref, atol=1e-4)

    img = rng.normal(size=(num_rows + 8, c)).astype(np.float32)
    g = np.asarray(
        gather_rows_sorted(jnp.asarray(pids), jnp.asarray(img), num_rows=num_rows)
    )
    np.testing.assert_allclose(g, img[pids], atol=1e-5)


def test_vmap_batches():
    from himo_tpu.ops.mxu_scatter import scatter_sum_sorted

    rng = np.random.default_rng(3)
    num_rows, n, c, b = 2048, 1024, 8, 3
    pids = np.sort(rng.integers(0, num_rows, size=(b, n)), axis=1).astype(np.int32)
    feats = rng.normal(size=(b, n, c)).astype(np.float32)
    out = np.asarray(
        jax.vmap(lambda p, f: scatter_sum_sorted(p, f, num_rows=num_rows))(
            jnp.asarray(pids), jnp.asarray(feats)
        )
    )
    for i in range(b):
        ref = np.asarray(
            jax.ops.segment_sum(
                jnp.asarray(feats[i]), jnp.asarray(pids[i]), num_segments=num_rows
            )
        )
        np.testing.assert_allclose(out[i, :num_rows], ref, atol=1e-4)


def test_gradients_transpose_pair():
    """scatter's VJP is gather and vice versa; check against XLA autodiff."""
    from himo_tpu.ops.mxu_scatter import gather_rows_sorted, scatter_sum_sorted

    rng = np.random.default_rng(4)
    num_rows, n, c = 1024, 512, 8
    pids, feats = _sorted_case(rng, num_rows, n, c, trash=3)
    pids_j, feats_j = jnp.asarray(pids), jnp.asarray(feats)
    img = jnp.asarray(rng.normal(size=(num_rows + 8, c)).astype(np.float32))

    def loss_scatter(f):
        out = scatter_sum_sorted(pids_j, f, num_rows=num_rows)
        return jnp.sum(out[:num_rows] ** 2)

    def loss_scatter_ref(f):
        live = jnp.asarray(pids < num_rows)
        out = jax.ops.segment_sum(
            jnp.where(live[:, None], f, 0.0),
            jnp.minimum(pids_j, num_rows),
            num_segments=num_rows + 1,
        )
        return jnp.sum(out[:num_rows] ** 2)

    g = jax.grad(loss_scatter)(feats_j)
    g_ref = jax.grad(loss_scatter_ref)(feats_j)
    live = pids < num_rows
    np.testing.assert_allclose(np.asarray(g)[live], np.asarray(g_ref)[live],
                               atol=1e-3)

    def loss_gather(im):
        out = gather_rows_sorted(pids_j, im, num_rows=num_rows)
        live = jnp.asarray(pids < num_rows)
        return jnp.sum(jnp.where(live[:, None], out, 0.0) ** 2)

    def loss_gather_ref(im):
        out = jnp.take(im, jnp.minimum(pids_j, num_rows + 7), axis=0)
        live = jnp.asarray(pids < num_rows)
        return jnp.sum(jnp.where(live[:, None], out, 0.0) ** 2)

    gi = jax.grad(loss_gather)(img)
    gi_ref = jax.grad(loss_gather_ref)(img)
    np.testing.assert_allclose(
        np.asarray(gi)[:num_rows], np.asarray(gi_ref)[:num_rows], atol=1e-3
    )


def test_scatter_sum_bf16_mode():
    """mxu_bf16=True: one-hot mask is exact in bf16, feats are truncated —
    sums must match a bf16-truncated segment_sum to fp32-accumulate slack."""
    from himo_tpu.ops.mxu_scatter import scatter_sum_sorted

    rng = np.random.default_rng(7)
    num_rows, n, c = 8192, 4096, 32
    pids, feats = _sorted_case(rng, num_rows, n, c, clustered=True)
    out = np.asarray(
        scatter_sum_sorted(
            jnp.asarray(pids), jnp.asarray(feats), num_rows=num_rows,
            mxu_bf16=True,
        )
    )
    live = pids < num_rows
    tr = np.asarray(
        jnp.asarray(feats[live]).astype(jnp.bfloat16).astype(jnp.float32)
    )
    ref = np.asarray(
        jax.ops.segment_sum(
            jnp.asarray(tr), jnp.asarray(pids[live]), num_segments=num_rows
        )
    )
    np.testing.assert_allclose(out[:num_rows], ref, atol=2e-2, rtol=1e-2)


def test_gather_bf16_mode():
    from himo_tpu.ops.mxu_scatter import gather_rows_sorted

    rng = np.random.default_rng(8)
    num_rows, n, c = 4096, 2048, 16
    pids, _ = _sorted_case(rng, num_rows, n, c, clustered=True)
    img = rng.normal(size=(num_rows + 8, c)).astype(np.float32)
    out = np.asarray(
        gather_rows_sorted(
            jnp.asarray(pids), jnp.asarray(img), num_rows=num_rows,
            mxu_bf16=True,
        )
    )
    live = pids < num_rows
    tr = np.asarray(jnp.asarray(img).astype(jnp.bfloat16).astype(jnp.float32))
    np.testing.assert_allclose(out[live], tr[pids[live]], atol=1e-6)

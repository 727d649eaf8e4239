"""On-device per-slot translation refinement (ops/refine.py).

Covers the jittable trimmed-ICP analog of the host matcher: recovery of a
known rigid translation from a poor seed, the null test's static snap, the
confidence fallback when no reference geometry exists, and the end-to-end
path through the seflowpp flagship (FlowNetConfig.refine_head)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from himo_tpu.ops.refine import (
    RefineConfig,
    dilated_dynamic_mask,
    refine_flow,
    refine_slot_translations,
    select_topk,
)


SWEEP_DT = 0.1


def _box_points(rng, n, center, size=(4.5, 2.0, 1.6)):
    """Surface-sampled box shell — the synthetic generator's object model
    (data/synthetic._sample_box_points)."""
    size = np.asarray(size)
    pts = rng.uniform(-0.5, 0.5, size=(n, 3)) * size
    ax = rng.integers(0, 3, size=n)
    sign = rng.choice([-1.0, 1.0], size=n)
    pts[np.arange(n), ax] = 0.5 * size[ax] * sign
    return (center + pts).astype(np.float32)


def test_select_topk_stable_and_masked():
    mask = jnp.array([False, True, False, True, True, False])
    idx, valid = select_topk(mask, 4)
    assert idx.tolist()[:3] == [1, 3, 4]
    assert valid.tolist() == [True, True, True, False]


def test_dilated_dynamic_mask_reaches_displaced_points():
    h = w = 64
    logit = jnp.full((h, w), -1.0).at[30:34, 30:34].set(1.0)
    # A pc1 point 8 cells away from the dynamic blob (within reach 24)
    # and one 30 cells away (outside even the coarse-pool slack).
    pids = jnp.array([32 * w + 42, 32 * w + 0], dtype=jnp.int32)
    in_range = jnp.ones(2, bool)
    hit = dilated_dynamic_mask(logit, pids, in_range, reach_cells=24, pool=4)
    assert bool(hit[0])
    assert not bool(hit[1])


def _two_cluster_scene(rng, v0, v1, n_obj=300, n_bg=2000):
    """pc0/pc1 with two rigid movers (velocities m/s, rolling-shutter
    smeared like data/synthetic.make_scene: pos = base + local + v*dt,
    independent surface resampling per frame) plus static background.
    Returns (p0, dt0, p1, dt1, slot); GT translations are v*SWEEP_DT."""
    c0 = np.array([8.0, 3.0, 1.0])
    c1 = np.array([-6.0, -5.0, 1.0])
    v0 = np.asarray(v0, np.float64)
    v1 = np.asarray(v1, np.float64)
    dt0 = rng.uniform(0.0, SWEEP_DT, size=2 * n_obj + n_bg).astype(np.float32)
    dt1 = rng.uniform(0.0, SWEEP_DT, size=2 * n_obj + n_bg).astype(np.float32)
    o0a = _box_points(rng, n_obj, c0) + v0 * dt0[:n_obj, None]
    o0b = _box_points(rng, n_obj, c1) + v1 * dt0[n_obj : 2 * n_obj, None]
    o1a = (
        _box_points(rng, n_obj, c0)
        + v0 * SWEEP_DT
        + v0 * dt1[:n_obj, None]
    )
    o1b = (
        _box_points(rng, n_obj, c1)
        + v1 * SWEEP_DT
        + v1 * dt1[n_obj : 2 * n_obj, None]
    )
    bg0 = rng.uniform(-30, 30, size=(n_bg, 3)).astype(np.float32)
    bg1 = rng.uniform(-30, 30, size=(n_bg, 3)).astype(np.float32)
    p0 = np.concatenate([o0a, o0b, bg0]).astype(np.float32)
    p1 = np.concatenate([o1a, o1b, bg1]).astype(np.float32)
    slot = np.full(len(p0), -1, np.int32)
    slot[:n_obj] = 0
    slot[n_obj : 2 * n_obj] = 1
    return p0, dt0, p1, dt1, slot


def test_refine_recovers_smeared_translations_from_bad_seed():
    rng = np.random.default_rng(0)
    v0 = np.array([24.0, 6.0, 0.0])  # 2.4 m / frame
    v1 = np.array([-11.0, 15.0, 0.0])
    d0, d1 = v0 * SWEEP_DT, v1 * SWEEP_DT
    p0, dt0, p1, dt1, slot = _two_cluster_scene(rng, v0, v1)
    n_obj = 300
    max_slots = 8
    q = jnp.asarray(p0[: 2 * n_obj])
    qslot = jnp.asarray(slot[: 2 * n_obj])
    qvalid = jnp.ones(2 * n_obj, bool)
    # Seeds off by up to ~0.8 m — the measured pooled-regression error band.
    seed = jnp.zeros((max_slots, 3)).at[0].set(d0 + np.array([0.7, -0.4, 0.0]))
    seed = seed.at[1].set(d1 + np.array([-0.5, 0.6, 0.0]))
    seed_ok = jnp.zeros(max_slots, bool).at[:2].set(True)
    r = jnp.asarray(p1[: 2 * n_obj])  # dynamic reference points only
    rvalid = jnp.ones(2 * n_obj, bool)
    delta, conf, snapped = jax.jit(
        lambda *a, **k: refine_slot_translations(*a, max_slots=max_slots, **k)
    )(q, qslot, qvalid, seed, seed_ok, r, rvalid,
      qdt=jnp.asarray(dt0[: 2 * n_obj]), rdt=jnp.asarray(dt1[: 2 * n_obj]))
    assert bool(conf[0]) and bool(conf[1])
    assert not bool(snapped[0]) and not bool(snapped[1])
    np.testing.assert_allclose(np.asarray(delta[0]), d0, atol=0.1)
    np.testing.assert_allclose(np.asarray(delta[1]), d1, atol=0.1)
    # Slots with no members stay unconfident.
    assert not bool(conf[2])


def test_null_test_snaps_static_component_to_exact_zero():
    rng = np.random.default_rng(1)
    # Slot 0 truly static (stop-and-go car at rest); seed claims motion.
    p0, dt0, p1, dt1, slot = _two_cluster_scene(
        rng, np.zeros(3), np.array([20.0, 0.0, 0.0])
    )
    n_obj = 300
    max_slots = 4
    q = jnp.asarray(p0[: 2 * n_obj])
    qslot = jnp.asarray(slot[: 2 * n_obj])
    qvalid = jnp.ones(2 * n_obj, bool)
    seed = jnp.zeros((max_slots, 3)).at[0].set(jnp.array([0.45, -0.2, 0.0]))
    seed = seed.at[1].set(jnp.array([2.0, 0.0, 0.0]))
    seed_ok = jnp.zeros(max_slots, bool).at[:2].set(True)
    r = jnp.asarray(p1[: 2 * n_obj])
    rvalid = jnp.ones(2 * n_obj, bool)
    delta, conf, snapped = refine_slot_translations(
        q, qslot, qvalid, seed, seed_ok, r, rvalid, max_slots,
        qdt=jnp.asarray(dt0[: 2 * n_obj]), rdt=jnp.asarray(dt1[: 2 * n_obj]),
    )
    assert bool(conf[0]) and bool(snapped[0])
    np.testing.assert_array_equal(np.asarray(delta[0]), np.zeros(3))
    # The real mover must NOT snap.
    assert bool(conf[1]) and not bool(snapped[1])
    np.testing.assert_allclose(
        np.asarray(delta[1]), [2.0, 0.0, 0.0], atol=0.1
    )


def test_refine_flow_falls_back_without_reference_geometry():
    rng = np.random.default_rng(2)
    n = 512
    p0 = rng.uniform(-20, 20, size=(n, 3)).astype(np.float32)
    p1 = rng.uniform(-20, 20, size=(n, 3)).astype(np.float32)
    slot = np.full(n, -1, np.int32)
    slot[:64] = 0
    base = rng.normal(0, 0.1, size=(n, 3)).astype(np.float32)
    out = refine_flow(
        jnp.asarray(base),
        jnp.asarray(p0),
        jnp.asarray(slot),
        jnp.ones(n, bool),
        jnp.ones(n),
        jnp.asarray(p1),
        jnp.ones(n, bool),
        jnp.full((32, 32), -1.0),  # no dynamic evidence -> empty reference
        jnp.zeros(n, jnp.int32),
        jnp.ones(n, bool),
        max_slots=8,
    )
    np.testing.assert_array_equal(np.asarray(out), base)


def test_refine_flow_overrides_member_points_only():
    rng = np.random.default_rng(3)
    v = np.array([18.0, -9.0, 0.0])
    d0 = (v * SWEEP_DT).astype(np.float32)
    p0, dt0, p1, dt1, slot = _two_cluster_scene(rng, v, v, n_obj=256, n_bg=1024)
    n = len(p0)
    base = np.zeros((n, 3), np.float32)
    base[slot >= 0] = d0 + np.array([0.5, 0.3, 0.0])  # coarse net output
    # Dynamic logit image: mark everything dynamic so pc1 selection keeps
    # object points (background is there too, but trimming rejects it).
    cfg = RefineConfig(num_query=1024, num_ref=2048)
    out = np.asarray(
        refine_flow(
            jnp.asarray(base),
            jnp.asarray(p0),
            jnp.asarray(slot),
            jnp.ones(n, bool),
            jnp.ones(n),
            jnp.asarray(p1),
            jnp.ones(n, bool),
            jnp.full((32, 32), 1.0),
            jnp.zeros(n, jnp.int32),
            jnp.ones(n, bool),
            max_slots=8,
            cfg=cfg,
            dt0=jnp.asarray(dt0),
            dt1=jnp.asarray(dt1),
        )
    )
    member = slot >= 0
    np.testing.assert_allclose(
        out[member], np.broadcast_to(d0, (member.sum(), 3)), atol=0.12
    )
    np.testing.assert_array_equal(out[~member], base[~member])


@pytest.mark.parametrize("preset", ["seflowpp"])
def test_flagship_refine_head_end_to_end(preset):
    from himo_tpu.models.feedforward import init_params, make_model

    model, config = make_model(
        preset,
        **{
            "pillar.voxel_size": (0.4, 0.4),
            "pillar.x_range": (-12.8, 12.8),
            "pillar.y_range": (-12.8, 12.8),
            "depths": (16, 32),
            "instance_slots": 16,
            "refine.num_query": 256,
            "refine.num_ref": 512,
        },
    )
    assert config.refine_head and config.instance_head
    n = 768
    params = init_params(model, jax.random.PRNGKey(0), num_points=n)
    rng = np.random.default_rng(4)
    pc0 = rng.uniform(-12, 12, size=(n, 3)).astype(np.float32)
    pc1 = rng.uniform(-12, 12, size=(n, 3)).astype(np.float32)
    sweeps = (jnp.asarray(pc0), jnp.asarray(pc1), jnp.asarray(pc0))
    valids = (jnp.ones(n, bool),) * 3
    flow_r = model.apply(params, sweeps, valids)
    flow_nr = model.apply(params, sweeps, valids, refine=False)
    assert flow_r.shape == (n, 3)
    assert np.isfinite(np.asarray(flow_r)).all()
    assert np.isfinite(np.asarray(flow_nr)).all()
    # Training path (soft_gate) must not invoke the refiner by default:
    # gradients flow through the pooled composition unchanged.
    flow_t, aux = model.apply(
        params, sweeps, valids, with_aux=True, soft_gate=True
    )
    assert "slot" in aux and np.isfinite(np.asarray(flow_t)).all()


def test_fixed_point_veto_keeps_overlapping_slab_movers():
    """Round-5 regression: a long dense mover whose rolling-shutter slab
    overlaps its next-frame slab (displacement < object length) makes the
    RAW zero-offset residual nearly as small as the refined one — the old
    null test snapped such objects (15-24 m/s crossing / stop-and-go
    movers in the adversarial tranche) to exact zero. The de-smeared WLS
    from a zero seed still recovers the motion, so zero fails the
    fixed-point veto and the mover must survive with its translation."""
    rng = np.random.default_rng(3)
    v = np.array([15.0, 0.0, 0.0])  # 1.5 m/frame, 12 m long -> 87% overlap
    n_obj, n_bg = 800, 1000
    size = (12.0, 2.5, 2.5)
    c = np.array([5.0, 2.0, 1.0])
    dt0 = rng.uniform(0.0, SWEEP_DT, size=n_obj + n_bg).astype(np.float32)
    dt1 = rng.uniform(0.0, SWEEP_DT, size=n_obj + n_bg).astype(np.float32)
    o0 = _box_points(rng, n_obj, c, size) + v * dt0[:n_obj, None]
    o1 = (
        _box_points(rng, n_obj, c, size)
        + v * SWEEP_DT
        + v * dt1[:n_obj, None]
    )
    bg0 = rng.uniform(-30, 30, size=(n_bg, 3)).astype(np.float32)
    bg1 = rng.uniform(-30, 30, size=(n_bg, 3)).astype(np.float32)
    p0 = np.concatenate([o0, bg0]).astype(np.float32)
    p1 = np.concatenate([o1, bg1]).astype(np.float32)
    slot = np.full(len(p0), -1, np.int32)
    slot[:n_obj] = 0
    max_slots = 4
    seed = jnp.zeros((max_slots, 3)).at[0].set(jnp.asarray(v * SWEEP_DT * 0.6))
    seed_ok = jnp.zeros(max_slots, bool).at[0].set(True)
    delta, conf, snapped = refine_slot_translations(
        jnp.asarray(p0), jnp.asarray(slot), jnp.ones(len(p0), bool),
        seed, seed_ok, jnp.asarray(p1), jnp.ones(len(p1), bool), max_slots,
        qdt=jnp.asarray(dt0), rdt=jnp.asarray(dt1),
    )
    assert bool(conf[0])
    assert not bool(snapped[0]), "overlapping-slab mover snapped to zero"
    np.testing.assert_allclose(
        np.asarray(delta[0]), v * SWEEP_DT, atol=0.12
    )

"""On-device connected components + per-component pooling (ops/components.py)
— the instance head's building blocks. Verified against brute-force numpy
component labeling on random grids."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from himo_tpu.ops.components import (
    component_slots,
    connected_components_grid,
    pool_by_slot,
)


def _numpy_components(occ: np.ndarray, reach: int) -> np.ndarray:
    """Brute-force flood fill: cells within Chebyshev ``reach`` connect."""
    h, w = occ.shape
    lab = np.full((h, w), h * w, np.int32)
    next_id = 0
    for y in range(h):
        for x in range(w):
            if not occ[y, x] or lab[y, x] != h * w:
                continue
            stack = [(y, x)]
            lab[y, x] = next_id
            while stack:
                cy, cx = stack.pop()
                for dy in range(-reach, reach + 1):
                    for dx in range(-reach, reach + 1):
                        ny, nx = cy + dy, cx + dx
                        if (
                            0 <= ny < h
                            and 0 <= nx < w
                            and occ[ny, nx]
                            and lab[ny, nx] == h * w
                        ):
                            lab[ny, nx] = next_id
                            stack.append((ny, nx))
            next_id += 1
    return lab


def _same_partition(a: np.ndarray, b: np.ndarray, occ: np.ndarray) -> bool:
    """Two labelings induce the same partition of occupied cells."""
    av, bv = a[occ], b[occ]
    return len(np.unique(av * 100000 + bv)) == len(np.unique(av)) == len(
        np.unique(bv)
    )


class TestConnectedComponents:
    def test_two_blobs_separate_labels(self):
        occ = np.zeros((16, 16), bool)
        occ[2:5, 2:6] = True
        occ[10:13, 9:14] = True
        lab = np.asarray(
            jax.jit(lambda o: connected_components_grid(o, iters=8, reach=1))(
                jnp.asarray(occ)
            )
        )
        assert len(np.unique(lab[occ])) == 2
        assert np.all(lab[~occ] == 256)
        # Each blob's label is uniform and equals its min flat index.
        assert np.all(lab[2:5, 2:6] == 2 * 16 + 2)
        assert np.all(lab[10:13, 9:14] == 10 * 16 + 9)

    def test_reach_bridges_gap(self):
        occ = np.zeros((8, 16), bool)
        occ[3, 2:5] = True
        occ[3, 6:9] = True  # one empty cell between: Chebyshev distance 2
        lab1 = np.asarray(connected_components_grid(jnp.asarray(occ), 8, reach=1))
        lab2 = np.asarray(connected_components_grid(jnp.asarray(occ), 8, reach=2))
        assert len(np.unique(lab1[occ])) == 2
        assert len(np.unique(lab2[occ])) == 1

    def test_labels_never_cross_empty_cells_at_reach1(self):
        # A label may only travel through occupied cells: an empty ring
        # isolates the inside from the outside.
        occ = np.ones((12, 12), bool)
        occ[4, 2:9] = False
        occ[8, 2:9] = False
        occ[4:9, 2] = False
        occ[4:9, 8] = False
        lab = np.asarray(connected_components_grid(jnp.asarray(occ), 24, reach=1))
        inside = np.zeros_like(occ)
        inside[5:8, 3:8] = True
        assert len(np.unique(lab[inside & occ])) == 1
        assert set(np.unique(lab[inside & occ])) != set(
            np.unique(lab[occ & ~inside])
        )

    @pytest.mark.parametrize("reach", [1, 2])
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_numpy_flood_fill(self, reach, seed):
        rng = np.random.default_rng(seed)
        occ = rng.random((24, 24)) < 0.25
        lab = np.asarray(
            connected_components_grid(jnp.asarray(occ), iters=40, reach=reach)
        )
        ref = _numpy_components(occ, reach)
        assert _same_partition(lab, ref, occ)

    def test_vmap(self):
        rng = np.random.default_rng(3)
        occ = rng.random((4, 16, 16)) < 0.3
        lab = jax.vmap(lambda o: connected_components_grid(o, 16, 1))(
            jnp.asarray(occ)
        )
        for b in range(4):
            ref = _numpy_components(occ[b], 1)
            assert _same_partition(np.asarray(lab[b]), ref, occ[b])


class TestComponentSlots:
    def test_compacts_roots_in_scan_order(self):
        occ = np.zeros((16, 16), bool)
        occ[1:3, 1:3] = True  # root 17 -> slot 0
        occ[5:7, 10:12] = True  # root 5*16+10 -> slot 1
        occ[12:14, 4:6] = True  # slot 2
        lab = connected_components_grid(jnp.asarray(occ), 8, 1)
        slot_enc, n = component_slots(lab, max_slots=8)
        slot_enc = np.asarray(slot_enc)
        assert int(n) == 3
        assert np.all(slot_enc[~occ] == 0)
        assert np.all(slot_enc[1:3, 1:3] == 1)
        assert np.all(slot_enc[5:7, 10:12] == 2)
        assert np.all(slot_enc[12:14, 4:6] == 3)

    def test_overflow_components_get_zero(self):
        occ = np.zeros((8, 8), bool)
        for i in range(4):
            occ[2 * i, 2 * i] = True  # 4 singleton components
        lab = connected_components_grid(jnp.asarray(occ), 4, 1)
        slot_enc, n = component_slots(lab, max_slots=2)
        slot_enc = np.asarray(slot_enc)
        assert int(n) == 4
        assert sorted(slot_enc[occ].tolist()) == [0, 0, 1, 2]


class TestPoolBySlot:
    def test_weighted_mean_and_distribution(self):
        values = jnp.asarray(
            [[1.0, 0, 0], [3.0, 0, 0], [10.0, 0, 0], [20.0, 0, 0], [99.0, 0, 0]]
        )
        weights = jnp.asarray([1.0, 1.0, 3.0, 1.0, 1.0])
        slot = jnp.asarray([0, 0, 1, 1, -1], jnp.int32)
        pooled, ok = pool_by_slot(values, weights, slot, 4, min_weight=1.5)
        pooled = np.asarray(pooled)
        ok = np.asarray(ok)
        assert ok.tolist() == [True, True, True, True, False]
        np.testing.assert_allclose(pooled[0, 0], 2.0, rtol=1e-6)
        np.testing.assert_allclose(pooled[1, 0], 2.0, rtol=1e-6)
        np.testing.assert_allclose(pooled[2, 0], 12.5, rtol=1e-6)  # (30+20)/4

    def test_min_weight_rejects_thin_components(self):
        values = jnp.ones((3, 3))
        weights = jnp.asarray([0.5, 5.0, 5.0])
        slot = jnp.asarray([0, 1, 1], jnp.int32)
        _, ok = pool_by_slot(values, weights, slot, 4, min_weight=3.0)
        assert np.asarray(ok).tolist() == [False, True, True]

    def test_gradients_flow_to_members(self):
        values = jnp.asarray([[1.0, 0, 0], [3.0, 0, 0], [7.0, 0, 0]])
        weights = jnp.ones((3,))
        slot = jnp.asarray([0, 0, -1], jnp.int32)

        def f(v):
            pooled, ok = pool_by_slot(v, weights, slot, 2, min_weight=1.0)
            return jnp.sum(jnp.where(ok[:, None], pooled, 0.0))

        g = np.asarray(jax.grad(f)(values))
        # Each member's value contributes 1/2 to each of the 2 member
        # outputs -> total gradient 1.0; the non-member gets none.
        np.testing.assert_allclose(g[:, 0], [1.0, 1.0, 0.0], atol=1e-6)


class TestInstanceHeadEndToEnd:
    def test_member_points_emit_component_mean(self):
        """A net with a hand-opened dynamic image + gates must emit the same
        flow for every point of one blob (the pooled mean), and exact zeros
        where the gate is closed."""
        from himo_tpu.models.feedforward import make_model, init_params
        from himo_tpu.ops.voxelize import PillarConfig

        pillar = PillarConfig(
            x_range=(-6.4, 6.4), y_range=(-6.4, 6.4), voxel_size=(0.4, 0.4)
        )
        model, cfg = make_model(
            "seflowpp", pillar=pillar, depths=(16, 32), point_feat_dim=8,
            base_channels=8, instance_iters=8, instance_min_pts=2.0,
        )
        rng = np.random.default_rng(0)
        n = 256
        # Two tight clusters + scattered background.
        pc = rng.uniform(-6, 6, (n, 3)).astype(np.float32)
        pc[:40] = np.array([3.0, 3.0, 0.0]) + 0.3 * rng.standard_normal((40, 3))
        pc[40:80] = np.array([-4.0, -4.0, 0.0]) + 0.3 * rng.standard_normal(
            (40, 3)
        )
        pc = jnp.asarray(pc)
        valid = jnp.ones((n,), bool)
        params = init_params(model, jax.random.PRNGKey(0), num_points=n)

        flow, aux = model.apply(
            params, (pc, pc, pc), (valid, valid, valid), with_aux=True
        )
        slot = np.asarray(aux["slot"])
        flow = np.asarray(flow)
        gate_open = np.asarray(aux["gate_logit"]) > 0.0
        # Whatever the random net decided: points sharing a slot with the
        # gate open must share IDENTICAL flow (the pooled mean).
        for s in np.unique(slot[slot >= 0]):
            member = (slot == s) & gate_open
            if member.sum() >= 2 and np.any(np.abs(flow[member]) > 0):
                np.testing.assert_allclose(
                    flow[member], np.tile(flow[member][0], (member.sum(), 1)),
                    rtol=1e-5, atol=1e-6,
                )
        # Gate-closed points are exactly zero.
        assert np.all(flow[~gate_open] == 0.0)

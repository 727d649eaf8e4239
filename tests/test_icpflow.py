"""ICP-Flow: NN-argmin op, Kabsch, and cluster registration."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from himo_tpu.models.icp_flow import (
    ICPFlowConfig,
    icpflow_estimate,
    weighted_kabsch,
)
from himo_tpu.ops.nn import nn_argmin


class TestNNArgmin:
    def test_matches_bruteforce(self, rng):
        q = rng.normal(scale=5, size=(200, 3)).astype(np.float32)
        r = rng.normal(scale=5, size=(600, 3)).astype(np.float32)
        d2, idx = nn_argmin(q, r)
        brute = ((q[:, None, :] - r[None, :, :]) ** 2).sum(-1)
        np.testing.assert_allclose(
            np.asarray(d2), brute.min(1), rtol=1e-3, atol=2e-3
        )
        # Indices must point at (one of) the argmin rows.
        picked = brute[np.arange(len(q)), np.asarray(idx)]
        np.testing.assert_allclose(picked, brute.min(1), rtol=1e-3, atol=2e-3)

    def test_ref_valid_excludes(self):
        q = np.zeros((3, 3), np.float32)
        r = np.array([[0, 0, 0], [1, 0, 0]], np.float32)
        d2, idx = nn_argmin(q, r, ref_valid=np.array([False, True]))
        assert np.all(np.asarray(idx) == 1)


class TestKabsch:
    def test_recovers_known_transform(self, rng):
        src = jnp.asarray(rng.normal(size=(50, 3)), jnp.float32)
        angle = 0.4
        c, s = np.cos(angle), np.sin(angle)
        rot_true = jnp.asarray([[c, -s, 0], [s, c, 0], [0, 0, 1]], jnp.float32)
        t_true = jnp.asarray([1.0, -2.0, 0.5])
        dst = src @ rot_true.T + t_true
        rot, t = weighted_kabsch(src, dst, jnp.ones(50))
        np.testing.assert_allclose(np.asarray(rot), np.asarray(rot_true), atol=1e-5)
        np.testing.assert_allclose(np.asarray(t), np.asarray(t_true), atol=1e-5)

    def test_degenerate_returns_identity(self):
        src = jnp.zeros((10, 3))
        rot, t = weighted_kabsch(src, src + 1.0, jnp.zeros(10))
        np.testing.assert_allclose(np.asarray(rot), np.eye(3))
        np.testing.assert_allclose(np.asarray(t), 0.0)


class TestICPFlow:
    def test_recovers_cluster_motion(self, rng):
        from himo_tpu.data.synthetic import _sample_box_points

        static = rng.uniform(-12, 0, size=(500, 3)).astype(np.float32)
        # A box SHELL: rotationally asymmetric, so ICP is well-constrained
        # (a Gaussian blob leaves rotation unobservable).
        box = _sample_box_points(rng, 150, np.array([4.5, 2.0, 1.6]))
        blob0 = (box + [6, 3, 1]).astype(np.float32)
        shift = np.array([1.2, -0.4, 0.0], np.float32)
        pc0 = np.concatenate([static, blob0])
        pc1 = np.concatenate([static, blob0 + shift])
        valid = np.ones(len(pc0), bool)
        cfg = ICPFlowConfig(
            max_clusters=8, cluster_capacity=256, icp_iters=12, dbscan_eps=1.2
        )
        flow, _ = icpflow_estimate(pc0, pc1, valid, valid, cfg)
        clustered = np.linalg.norm(flow[500:], axis=1) > 1e-6
        assert clustered.mean() > 0.8  # most box points got a cluster
        err = np.linalg.norm(flow[500:][clustered] - shift, axis=1)
        assert err.mean() < 0.2
        # Static points keep zero flow.
        np.testing.assert_allclose(flow[:500], 0.0)

    def test_capacity_overflow_gets_rigid_flow(self, rng):
        """A cluster larger than cluster_capacity: overflow points receive
        the cluster's RIGID transform, not zero (full-density trucks exceed
        any fixed capacity — round-3 verdict density item)."""
        from himo_tpu.data.synthetic import _sample_box_points

        static = rng.uniform(-12, 0, size=(400, 3)).astype(np.float32)
        box = _sample_box_points(rng, 600, np.array([6.5, 2.4, 2.4]))
        blob0 = (box + [6, 3, 1]).astype(np.float32)
        shift = np.array([1.1, -0.5, 0.0], np.float32)
        pc0 = np.concatenate([static, blob0])
        pc1 = np.concatenate([static, blob0 + shift])
        valid = np.ones(len(pc0), bool)
        cfg = ICPFlowConfig(
            max_clusters=8, cluster_capacity=256, icp_iters=12, dbscan_eps=1.2
        )
        flow, _ = icpflow_estimate(pc0, pc1, valid, valid, cfg)
        covered = np.linalg.norm(flow[400:], axis=1) > 1e-6
        # MORE points than the registration slots carry flow (the rigid
        # transform covers the overflow; before the fix coverage was hard-
        # capped at cluster_capacity). Coverage below ~100% here is the
        # dynamic MASK's self-overlap recall, not the capacity.
        assert covered.sum() > cfg.cluster_capacity + 40, covered.sum()
        err = np.linalg.norm(flow[400:][covered] - shift, axis=1)
        assert err.mean() < 0.2

    def test_no_dynamic_points_returns_zero(self, rng):
        pc = rng.uniform(-10, 10, size=(300, 3)).astype(np.float32)
        valid = np.ones(300, bool)
        flow, _ = icpflow_estimate(pc, pc, valid, valid)
        np.testing.assert_allclose(flow, 0.0)

    def test_registry_integration(self, rng):
        from himo_tpu.models.registry import get_estimator

        est = get_estimator("icpflow", max_clusters=4, cluster_capacity=128)
        pc = rng.uniform(-10, 10, size=(200, 3)).astype(np.float32)
        valid = np.ones(200, bool)
        flow, loss = est(pc, pc, valid, valid, None)
        assert flow.shape == (200, 3)

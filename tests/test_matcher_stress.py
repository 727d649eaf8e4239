"""Adversarial stress tests for the fast-object prior matcher.

The bucket-complete diagnostic (scripts/prior_diagnostic.py: 156/156 ok)
draws scenes from the same generator the matcher was tuned on. These tests
pin the matcher's behavior on the failure modes real driving data serves up
(the robustness the reference buys with 110k real frames,
/root/reference/dataprocess/extract_sca.py:95-145):

- objects ENTERING / LEAVING the field of view mid-pair (one-sided clusters
  must not steal a wrong match);
- PARTIAL OCCLUSION (a ray-shadowed half-cluster still matches, and the
  visible half must carry a correct delta);
- CROSSING trajectories (two fast objects whose paths intersect between the
  sweeps must not swap deltas);
- STOP-AND-GO (a tracked fast object that halts: the stale track must not
  impose its old delta);
- NO-FAST-OBJECTS scenes (false-positive pressure: an all-static scene must
  produce no large priors).

Each test runs the FULL labeling path (``label_scene``: dynamic mask ->
HDBSCAN -> de-smeared matching -> tracker -> backcast repair) on hand-built
frame dicts, then scores priors against the analytic deltas — same protocol
as prior_diagnostic.py. Documented failure envelope lives in the assertions'
tolerances.
"""

import numpy as np
import pytest

from himo_tpu.data.synthetic import _sample_box_points

PERIOD = 0.1


class World:
    """Tiny scene simulator: static background + boxes with per-frame
    velocity schedules and visibility windows. Frames share the same world
    background points (as the synthetic dataset generator does); each
    object's surface is RE-SAMPLED per frame and rolling-shutter smeared
    with its current velocity."""

    def __init__(self, seed=0, n_background=1600, extent=30.0):
        self.rng = np.random.default_rng(seed)
        r = np.sqrt(self.rng.uniform(0.02, 1.0, n_background)) * extent
        a = self.rng.uniform(0, 2 * np.pi, n_background)
        self.bg = np.stack(
            [r * np.cos(a), r * np.sin(a), self.rng.uniform(0.0, 3.0, n_background)],
            axis=1,
        ).astype(np.float32)
        self.objects = []  # dicts

    def add_object(self, center, velocities, n=220, size=(4.2, 1.9, 1.6),
                   visible=None, occlude=None):
        """``velocities``: per-frame (F, 3) m/s schedule. ``visible``:
        optional per-frame bool; ``occlude``: optional {frame: keep_fn}
        mapping to drop points (ray-shadow stand-in)."""
        self.objects.append(
            dict(
                center=np.asarray(center, np.float64),
                vel=np.asarray(velocities, np.float64),
                n=n,
                size=np.asarray(size),
                visible=visible,
                occlude=occlude or {},
            )
        )

    def _positions(self, obj):
        """Object base position per frame (cumulative velocity integral)."""
        steps = np.concatenate([[np.zeros(3)], obj["vel"][:-1] * PERIOD])
        return obj["center"][None] + np.cumsum(steps, axis=0)

    def frame(self, f):
        """One sweep: (points, dt, instance_id)."""
        rng = self.rng
        chunks = [self.bg]
        dts = [rng.uniform(0, PERIOD, len(self.bg)).astype(np.float32)]
        inst = [np.zeros(len(self.bg), np.int32)]
        for oi, obj in enumerate(self.objects):
            if obj["visible"] is not None and not obj["visible"][f]:
                continue
            pos = self._positions(obj)[f]
            local = _sample_box_points(rng, obj["n"], obj["size"])
            dt = rng.uniform(0, PERIOD, obj["n"]).astype(np.float32)
            pts = pos[None] + local + obj["vel"][f][None] * dt[:, None]
            keep = np.ones(obj["n"], bool)
            if f in obj["occlude"]:
                keep = obj["occlude"][f](pts)
            chunks.append(pts[keep].astype(np.float32))
            dts.append(dt[keep])
            inst.append(np.full(int(keep.sum()), oi + 1, np.int32))
        return (
            np.concatenate(chunks).astype(np.float32),
            np.concatenate(dts),
            np.concatenate(inst),
        )

    def frame_dicts(self, num_frames):
        """label_scene-ready frame dicts (identity ego; last has no next)."""
        sweeps = [self.frame(f) for f in range(num_frames)]
        eye = np.eye(4, dtype=np.float64)
        out = []
        for f in range(num_frames):
            pc0, dt0, inst0 = sweeps[f]
            has_next = f + 1 < num_frames
            pc1, dt1, _ = sweeps[f + 1] if has_next else sweeps[f]
            out.append(
                dict(
                    pc0=pc0, pc1=pc1,
                    gm0=np.zeros(len(pc0), bool), gm1=np.zeros(len(pc1), bool),
                    pose0=eye, pose1=eye,
                    lidar_dt=dt0, lidar_dt1=dt1,
                    has_next=has_next,
                    _inst=inst0,
                )
            )
        return out

    def expected_delta(self, oi, f):
        pos = self._positions(self.objects[oi])
        return (pos[f + 1] - pos[f]).astype(np.float32)


def run_labeler(world, num_frames):
    from himo_tpu.training.ssl_labels import label_scene

    frames = world.frame_dicts(num_frames)
    return frames, label_scene(frames)


def prior_stats(frames, results, oi, f):
    """(coverage, mean error vs analytic delta) for object ``oi`` at pair
    ``f`` — np.nan error when uncovered."""
    data = frames[f]
    _, _, prior, prior_valid = results[f]
    m = data["_inst"] == oi + 1
    if m.sum() == 0:
        return 0.0, np.nan
    cov = prior_valid[m]
    if cov.sum() == 0:
        return 0.0, np.nan
    return float(cov.mean()), None  # error filled by caller with its delta


def prior_error(frames, results, oi, f, delta):
    data = frames[f]
    _, _, prior, prior_valid = results[f]
    m = (data["_inst"] == oi + 1) & prior_valid
    if m.sum() == 0:
        return np.nan
    return float(np.linalg.norm(prior[m] - delta[None], axis=1).mean())


class TestEnterLeave:
    def test_leaving_object_gets_no_wrong_prior(self):
        """An object present in pc0 but GONE from pc1 (left the FOV) has no
        true match; any prior it carries is fabricated. The matcher must
        leave it uncovered or (failure envelope) claim < 20% of its points."""
        w = World(seed=1)
        vel = np.tile([25.0, 0.0, 0.0], (4, 1))
        w.add_object((8.0, 4.0, 1.0), vel,
                     visible=[True, True, False, False])
        frames, results = run_labeler(w, 4)
        # Pair 1 = (frame1, frame2): object in pc0 only.
        data = frames[1]
        _, _, prior, prior_valid = results[1]
        m = data["_inst"] == 1
        assert m.sum() > 0
        claimed = prior_valid[m]
        big = claimed & (np.linalg.norm(prior[m], axis=1) > 0.5)
        assert big.mean() < 0.2, (
            f"{big.mean():.0%} of a vanished object's points carry a "
            "fabricated fast prior"
        )

    def test_entering_object_matches_next_pair(self):
        """An object that appears at frame 1 must carry a correct prior on
        the (1, 2) pair — fresh objects can't wait for track confirmation."""
        w = World(seed=2)
        vel = np.tile([25.0, 3.0, 0.0], (4, 1))
        w.add_object((6.0, -5.0, 1.0), vel,
                     visible=[False, True, True, True])
        frames, results = run_labeler(w, 4)
        err = prior_error(frames, results, 0, 1, w.expected_delta(0, 1))
        cov, _ = prior_stats(frames, results, 0, 1)
        assert cov > 0.5 and err < 0.35, (cov, err)


class TestOcclusion:
    def test_half_occluded_target_still_matches(self):
        """pc1 sees only the leading half of the object (ray shadow): the
        de-smeared trimmed matching must still land the true delta on the
        pc0 points."""
        w = World(seed=3)
        vel = np.tile([25.0, 0.0, 0.0], (3, 1))
        pos1 = np.array([8.0 + 2.5, 2.0, 1.0])  # base at frame 1

        def keep_front(pts):
            return pts[:, 0] > pos1[0]  # only the +x half survives

        w.add_object((8.0, 2.0, 1.0), vel, occlude={1: keep_front})
        frames, results = run_labeler(w, 3)
        err = prior_error(frames, results, 0, 0, w.expected_delta(0, 0))
        cov, _ = prior_stats(frames, results, 0, 0)
        assert cov > 0.5 and err < 0.45, (cov, err)

    def test_half_occluded_source_still_matches(self):
        """pc0 sees half the object, pc1 all of it."""
        w = World(seed=4)
        vel = np.tile([22.0, 5.0, 0.0], (3, 1))

        def keep_left(pts):
            return pts[:, 1] < 2.0

        w.add_object((8.0, 2.0, 1.0), vel, occlude={0: keep_left})
        frames, results = run_labeler(w, 3)
        err = prior_error(frames, results, 0, 0, w.expected_delta(0, 0))
        cov, _ = prior_stats(frames, results, 0, 0)
        assert cov > 0.5 and err < 0.45, (cov, err)


class TestCrossing:
    def test_crossing_objects_keep_their_deltas(self):
        """Two fast objects on intersecting diagonal paths (passing within
        ~3 m without colliding): the 1-1 matching must not swap them (the
        two-sided verification residual breaks the tie — a swapped claim
        explains neither smear), and if the clusterer merges the close pair,
        split recovery must still assign each its own delta."""
        w = World(seed=5)
        velA = np.tile([20.0, 20.0, 0.0], (5, 1))
        velB = np.tile([-20.0, -20.0, 0.0], (5, 1))
        # A: (5,-5) -> (13,3); B: (17,10) -> (9,2). Closest approach ~3 m
        # at frame 4 (scene end) — near-miss, not a collision.
        w.add_object((5.0, -5.0, 1.0), velA, size=(4.5, 2.0, 1.6))
        w.add_object((17.0, 10.0, 1.2), velB, size=(6.5, 2.4, 2.4))
        frames, results = run_labeler(w, 5)
        for f in range(4):
            for oi in range(2):
                err = prior_error(frames, results, oi, f,
                                  w.expected_delta(oi, f))
                cov, _ = prior_stats(frames, results, oi, f)
                assert cov > 0.5, (f, oi, cov)
                assert err < 0.6, (f, oi, err)


class TestStopAndGo:
    def test_emergency_brake_tracks_decaying_velocity(self):
        """Emergency braking at 15 m/s² (1.5 m/s per 10 Hz pair — already
        beyond most vehicles): every decelerating pair must carry a prior
        tracking the CURRENT velocity, and once stopped, no stale track may
        impose its old delta."""
        w = World(seed=6)
        speeds = [15.0, 13.5, 12.0, 10.5, 9.0]
        vel = np.array([[s, 0.0, 0.0] for s in speeds])
        w.add_object((5.0, 3.0, 1.0), vel)
        frames, results = run_labeler(w, 5)
        for f in range(4):
            err = prior_error(frames, results, 0, f, w.expected_delta(0, f))
            assert err < 0.4, (f, err)

    def test_stopped_object_gets_no_stale_prior(self):
        """Hard stop to rest: once the object is static, the confirmed
        track's prediction must not override the geometry."""
        w = World(seed=6)
        vel = np.array(
            [[6.0, 0, 0], [4.0, 0, 0], [2.0, 0, 0], [0.0, 0, 0], [0.0, 0, 0]]
        )
        w.add_object((5.0, 3.0, 1.0), vel)
        frames, results = run_labeler(w, 5)
        data = frames[3]  # stopped pair (frame 3 -> 4)
        _, _, prior, prior_valid = results[3]
        m = (data["_inst"] == 1) & prior_valid
        if m.sum():
            mags = np.linalg.norm(prior[m], axis=1)
            assert mags.mean() < 0.3, mags.mean()

    def test_instant_stop_failure_envelope(self):
        """ADVERSARIAL (beyond vehicle physics): an instantaneous 25 m/s -> 0
        stop violates the de-smear model's constant-velocity-across-the-pair
        assumption (the boundary pair's pc1 carries no smear while its delta
        says 2.5 m). Documented envelope: the boundary pair's claim either
        (a) survives degraded but directionally right, or (b) is demoted by
        the zero-motion null test (the self-overlapping un-smeared pair
        genuinely fits the null; the 1-frame-old track is deliberately too
        young to veto). What must NEVER happen: a WRONG-direction prior, or
        a fast prior persisting once stopped."""
        w = World(seed=7)
        vel = np.array(
            [[25.0, 0, 0], [25.0, 0, 0], [0.0, 0, 0], [0.0, 0, 0]]
        )
        w.add_object((5.0, 3.0, 1.0), vel)
        frames, results = run_labeler(w, 4)
        # Clean pair: full quality.
        assert prior_error(frames, results, 0, 0, w.expected_delta(0, 0)) < 0.4
        # Boundary pair: zeroed (null demotion) or degraded-but-directional.
        data = frames[1]
        _, _, prior, prior_valid = results[1]
        m = (data["_inst"] == 1) & prior_valid
        if m.sum():
            mags = np.linalg.norm(prior[m], axis=1)
            moving = mags > 0.3
            if moving.any():
                mean_prior = prior[m][moving].mean(0)
                assert mean_prior[0] > 0.8, mean_prior  # right direction
                err = float(
                    np.linalg.norm(
                        prior[m][moving] - w.expected_delta(0, 1)[None], axis=1
                    ).mean()
                )
                assert err < 1.6, err  # measured ~1.26; pin the envelope
        # Stopped pair: no fast prior survives.
        data = frames[2]
        _, _, prior, prior_valid = results[2]
        m = (data["_inst"] == 1) & prior_valid
        if m.sum():
            assert np.linalg.norm(prior[m], axis=1).mean() < 0.5


class TestFalsePositivePressure:
    def test_all_static_scene_has_no_fast_priors(self):
        """No dynamic objects at all: the matcher must not fabricate fast
        priors out of background (clustered sensor-noise) points."""
        w = World(seed=8)
        frames, results = run_labeler(w, 4)
        for f in range(3):
            _, _, prior, prior_valid = results[f]
            big = prior_valid & (np.linalg.norm(prior, axis=1) > 0.5)
            assert big.sum() == 0, f"{big.sum()} fabricated fast priors"

    def test_slow_objects_only(self):
        """Slow movers (1.5 m/s) must not trigger fast (>1 m) priors; a
        small correct prior is fine."""
        w = World(seed=9)
        vel = np.tile([1.5, 0.5, 0.0], (4, 1))
        w.add_object((7.0, 2.0, 1.0), vel)
        frames, results = run_labeler(w, 4)
        for f in range(3):
            _, _, prior, prior_valid = results[f]
            mags = np.linalg.norm(prior[prior_valid], axis=1)
            assert (mags > 1.0).sum() == 0


class TestSlowMoverRecovery:
    """Measured-velocity continuity (ClusterTracker.predict_measured): a
    slow mover's per-frame delta sits INSIDE the verification tolerance, so
    single-frame evidence cannot tell it from re-sampled static structure
    and the null/snap demote it to zero — but its MEASURED deltas agree
    frame over frame while fabrications have random direction. A
    measured-confirmed track vetoes the demotions; the scene-start repair
    (label_scene re-labels the first TWO pairs with backcast tracks)
    extends the recovery to the frames before confirmation exists."""

    def test_slow_mover_keeps_its_motion(self):
        # 6 m/s -> 0.6 m/frame: squarely in the null/snap demotion band.
        w = World(seed=11)
        vel = np.tile([4.2, 4.2, 0.0], (5, 1))  # |v| = 5.9 m/s
        w.add_object((8.0, -3.0, 1.0), vel, n=320)
        frames, results = run_labeler(w, 5)
        for f in range(4):
            delta = w.expected_delta(0, f)
            err = prior_error(frames, results, 0, f, delta)
            assert np.isfinite(err), f"pair {f}: slow mover uncovered"
            assert err <= 0.25, (
                f"pair {f}: slow mover prior err {err:.2f} "
                f"(zeroed = {np.linalg.norm(delta):.2f})"
            )

    def test_static_object_stays_zero_in_snap_band(self):
        """The veto must NOT shelter the fabrication the snap exists for: a
        moderately sparse STATIC object re-sampled by successive sweeps
        verifies spurious sub-tolerance deltas. Fabricated deltas have
        random direction per frame, so no measured-confirmed track forms
        and every pair's prior stays ~zero.

        (ULTRA-sparse lone objects — tens of points at ~0.7 m spacing —
        are a documented envelope: a multi-meter fabrication can pass the
        null's big-delta bypass there; see the null_verdict comment in
        training/ssl_labels.py for the measured reason the bypass stays.)"""
        w = World(seed=12)
        vel = np.zeros((5, 3))
        w.add_object((9.0, 4.0, 1.0), vel, n=170, size=(5.0, 2.2, 1.8))
        frames, results = run_labeler(w, 5)
        for f in range(4):
            _, _, prior, prior_valid = results[f]
            m = (frames[f]["_inst"] == 1) & prior_valid
            if m.sum() == 0:
                continue
            mags = np.linalg.norm(prior[m], axis=1)
            assert float(mags.mean()) <= 0.25, (
                f"pair {f}: static object acquired prior {mags.mean():.2f}"
            )


if __name__ == "__main__":
    pytest.main([__file__, "-v"])

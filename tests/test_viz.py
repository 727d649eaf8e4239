"""Headless visualization layer tests."""

import numpy as np
import pytest


def test_render_bev_shapes(rng):
    from himo_tpu.viz.render import render_bev

    pts = rng.uniform(-40, 40, size=(1000, 3)).astype(np.float32)
    img = render_bev(pts, resolution=240)
    assert img.shape == (240, 240, 3)
    assert img.dtype == np.uint8
    assert img.max() > 16  # something was drawn


def test_render_color_by_id(rng):
    from himo_tpu.viz.render import render_bev

    pts = rng.uniform(-10, 10, size=(500, 3)).astype(np.float32)
    ids = rng.integers(0, 3, size=500)
    img = render_bev(pts, color_by=ids, extent=12.0, resolution=240)
    assert img.max() > 16


def test_interpolate_trajectory():
    from himo_tpu.viz.animation import default_trajectory, interpolate_trajectory

    keys = default_trajectory(4)
    out = interpolate_trajectory(keys, sample_step=5)
    assert len(out) == 4 * 5 - 4
    for f in out:
        assert set(f) == {"front", "lookat", "up", "zoom"}
    # Endpoint interpolation hits the keyframes.
    np.testing.assert_allclose(out[0]["front"], keys[0]["front"], atol=1e-9)
    np.testing.assert_allclose(out[-1]["front"], keys[-1]["front"], atol=1e-6)


def test_instance_viewer_and_animation(tmp_path, synthetic_dataset):
    from himo_tpu.viz.animation import save_animation
    from himo_tpu.viz.view_instance import print_refine_ins, vis_refine_ins

    chams, mpes = print_refine_ins(
        data_dir=str(synthetic_dataset), flow_mode="perfect", start_id=0, ins_id=[1, 2]
    )
    assert len(chams) == 2
    assert max(mpes) < 1e-5  # perfect flow

    saved = vis_refine_ins(
        data_dir=str(synthetic_dataset),
        flow_mode="perfect",
        start_id=0,
        ins_id=[1],
        out_dir=str(tmp_path / "panels"),
    )
    assert len(saved) == 1

    video = save_animation(
        data_dir=str(synthetic_dataset),
        flow_mode="perfect",
        output=str(tmp_path / "anim.mp4"),
        max_frames=3,
        resolution=240,
    )
    import os

    assert os.path.getsize(video) > 1000


def test_visualize_cli(tmp_path, synthetic_dataset):
    from himo_tpu.viz.visualize import main as viz_main

    saved = viz_main(
        data_dir=str(synthetic_dataset),
        flow_mode="perfect",
        color="flow",
        out_dir=str(tmp_path / "frames"),
        num_frames=2,
        resolution=240,
    )
    assert len(saved) == 2


class TestO3DViewer:
    """MyVisualizer logic against a mock open3d (the real package is an
    optional dependency, absent in CI)."""

    class _FakeViewControl:
        def __init__(self):
            self.calls = []

        def set_front(self, v): self.calls.append(("front", v))
        def set_lookat(self, v): self.calls.append(("lookat", v))
        def set_up(self, v): self.calls.append(("up", v))
        def set_zoom(self, v): self.calls.append(("zoom", v))
        def convert_to_pinhole_camera_parameters(self): return {"cam": 1}
        def convert_from_pinhole_camera_parameters(self, p, allow_arbitrary=True):
            self.calls.append(("pinhole", p))

    class _FakeVis:
        def __init__(self):
            self.keys = {}
            self.geoms = []
            self.polls = 0
            self.ctl = TestO3DViewer._FakeViewControl()

        def create_window(self, window_name=""): self.title = window_name
        def register_key_callback(self, key, cb): self.keys[key] = cb
        def clear_geometries(self): self.geoms = []
        def add_geometry(self, g, reset_bounding_box=True): self.geoms.append(g)
        def poll_events(self): self.polls += 1; return True
        def update_renderer(self): pass
        def get_view_control(self): return self.ctl
        def get_render_option(self): return self
        def destroy_window(self): pass

    def _fake_o3d(self):
        import types

        fake = types.SimpleNamespace()
        vis_mod = types.SimpleNamespace(VisualizerWithKeyCallback=TestO3DViewer._FakeVis)
        written = {}
        io_mod = types.SimpleNamespace(
            write_pinhole_camera_parameters=lambda path, p: written.update({path: p}),
            read_pinhole_camera_parameters=lambda path: {"cam": "fromfile"},
        )
        fake.visualization = vis_mod
        fake.io = io_mod
        fake._written = written
        return fake

    def test_space_toggles_and_step(self, tmp_path):
        from himo_tpu.viz.o3d_view import MyVisualizer, _KEY_N, _KEY_SPACE

        v = MyVisualizer(o3d=self._fake_o3d())
        assert not v.playing
        v.vis.keys[_KEY_SPACE](v.vis)
        assert v.playing  # SPACE starts playback
        assert v.update(["pcd"], wait=True)  # returns immediately while playing
        v.vis.keys[_KEY_SPACE](v.vis)
        assert not v.playing
        v.vis.keys[_KEY_N](v.vis)  # queue a single-step
        assert v.update(["pcd"], wait=True)
        assert v.vis.geoms == ["pcd"]

    def test_viewpoint_roundtrip_simple_json(self, tmp_path):
        import json

        from himo_tpu.viz.o3d_view import MyVisualizer

        view = tmp_path / "view.json"
        view.write_text(json.dumps({"front": [0, 0, 1], "zoom": 0.5}))
        v = MyVisualizer(view_file=str(view), o3d=self._fake_o3d())
        v.playing = True
        v.update(["pcd"])
        calls = dict(v.vis.ctl.calls)
        assert calls["front"] == [0, 0, 1]
        assert calls["zoom"] == 0.5

    def test_viewpoint_pinhole_json_and_save(self, tmp_path):
        import json

        from himo_tpu.viz.o3d_view import MyVisualizer, _KEY_V

        view = tmp_path / "cam.json"
        view.write_text(json.dumps({"intrinsic": {}, "extrinsic": []}))
        fake = self._fake_o3d()
        v = MyVisualizer(view_file=str(view), o3d=fake)
        v.playing = True
        v.update(["pcd"])
        assert ("pinhole", {"cam": "fromfile"}) in v.vis.ctl.calls
        v.vis.keys[_KEY_V](v.vis)  # save current view to the json
        assert str(view) in fake._written

    def test_close_key_ends_updates(self):
        from himo_tpu.viz.o3d_view import MyVisualizer, _KEY_ESC

        v = MyVisualizer(o3d=self._fake_o3d())
        v.vis.keys[_KEY_ESC](v.vis)
        assert v.update(["pcd"]) is False

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

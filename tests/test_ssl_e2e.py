"""Full SSL quality loop (slow, opt in with ``pytest -m slow``):
pseudo-labels -> train SeFlow++ -> write flow -> eval beats raw.

Reproduces the round-1 experiment: on synthetic scenes with 15-22 m/s
objects, 30 epochs of the tiny recipe reached MPE 0.62 vs raw 0.92.
"""

import os

import numpy as np
import pytest


@pytest.mark.slow
def test_ssl_training_beats_raw(tmp_path):
    from himo_tpu.cli.eval import main as eval_main
    from himo_tpu.data.synthetic import make_dataset
    from himo_tpu.models.runner import estimate_scene_flow
    from himo_tpu.ops.voxelize import PillarConfig
    from himo_tpu.training.ssl_labels import write_ssl_labels
    from himo_tpu.training.trainer import TrainConfig, train

    root = tmp_path / "av2_ssl_e2e"
    make_dataset(root, num_scenes=2, num_frames=8, seed=42, num_background=1500)
    write_ssl_labels(root, verbose=False)

    overrides = dict(
        pillar=PillarConfig(
            x_range=(-51.2, 51.2), y_range=(-51.2, 51.2), voxel_size=(0.8, 0.8)
        ),
        depths=(32, 64),
        point_feat_dim=16,
        base_channels=16,
    )
    config = TrainConfig(
        model="seflowpp",
        batch_size=8,  # divisible across the 8-device test mesh
        epochs=40,
        num_points=4096,
        lr=2e-3,
        log_every=50,
    )
    result = train(
        str(root),
        config,
        run_dir=str(tmp_path / "run"),
        model_overrides=overrides,
        resume=False,
    )
    assert np.isfinite(result["final_metrics"]["total"])

    estimate_scene_flow(
        str(root),
        model="seflowpp",
        params=result["params"],
        output_key="seflowpp_ssl",
        verbose=False,
        **overrides,
    )
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        est = eval_main(data_dir=str(root), res_name="seflowpp_ssl").total_summary()
        raw = eval_main(data_dir=str(root), res_name="raw").total_summary()
    finally:
        os.chdir(cwd)
    assert est["mpe"] < raw["mpe"]
    assert est["cd"] < raw["cd"]

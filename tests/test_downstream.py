"""Downstream segmentation harness: train -> segment -> score end to end."""

import numpy as np
import pytest
import jax

from himo_tpu.ops.voxelize import PillarConfig

SMALL_PILLAR = PillarConfig(
    x_range=(-25.6, 25.6), y_range=(-25.6, 25.6), voxel_size=(0.8, 0.8)
)


@pytest.fixture(scope="module")
def seg_dataset(tmp_path_factory):
    from himo_tpu.data.synthetic import make_dataset

    root = tmp_path_factory.mktemp("seg") / "av2_seg"
    make_dataset(root, num_scenes=2, num_frames=4, seed=21, num_background=1200)
    return root


def test_segnet_forward(rng):
    from himo_tpu.downstream.segmentation import init_seg_params, make_seg_model

    model, _ = make_seg_model(pillar=SMALL_PILLAR, depths=(16, 32), point_feat_dim=8)
    params = init_seg_params(model, jax.random.PRNGKey(0), 512)
    pts = rng.uniform(-20, 20, size=(512, 3)).astype(np.float32)
    logits = model.apply(params, pts, np.ones(512, bool))
    assert logits.shape == (512, 3)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_seg_pipeline_end_to_end(seg_dataset):
    """Train a tiny SegNet on GT labels, write seg_* keys, score with
    eval_seg; the trained net must beat all-background (mIoU > 0)."""
    from himo_tpu.cli.eval_seg import main as eval_seg_main
    from himo_tpu.downstream.segmentation import (
        make_seg_model,
        segment_dataset,
        train_segmentation,
    )

    model, _ = make_seg_model(
        pillar=SMALL_PILLAR, depths=(16, 32), point_feat_dim=8, base_channels=8
    )
    params = train_segmentation(
        str(seg_dataset),
        model=model,
        num_points=8192,
        epochs=6,
        lr=2e-3,
        verbose=False,
    )
    n = segment_dataset(
        str(seg_dataset), model, params, flow_mode="raw", num_points=8192, verbose=False
    )
    assert n > 0
    results = eval_seg_main(data_dir=str(seg_dataset), res_names=["seg_raw"])
    car_iou = results["seg_raw"]["per_class"]["car"]
    other_iou = results["seg_raw"]["per_class"]["other_vehicle"]
    # The synthetic scene has one car + one truck; a few epochs should find
    # some of them (any IoU > 0.05 proves the full loop works).
    assert car_iou + other_iou > 0.1


def test_seg_gt_mode_and_missing_flow_fallback(seg_dataset):
    """flow_mode='gt' de-skews with the GT motion flow; a flow_mode whose h5
    key exists on NO frame falls back to raw for every frame (each scene's
    last sweep never has a stored flow — the save path skips it)."""
    import jax

    from himo_tpu.downstream.segmentation import (
        init_seg_params,
        make_seg_model,
        segment_dataset,
    )

    model, _ = make_seg_model(
        pillar=SMALL_PILLAR, depths=(16, 32), point_feat_dim=8, base_channels=8
    )
    params = init_seg_params(model, jax.random.PRNGKey(0), 2048)
    n = segment_dataset(
        str(seg_dataset), model, params, flow_mode="gt", num_points=2048,
        verbose=False,
    )
    assert n > 0
    # No 'nosuchflow' key exists anywhere: every frame must fall back to raw
    # instead of raising KeyError.
    n = segment_dataset(
        str(seg_dataset), model, params, flow_mode="nosuchflow",
        num_points=2048, verbose=False,
    )
    assert n > 0


def test_det_learned_gt_mode(seg_dataset):
    """evaluate_detection_learned(flow_mode='gt') scores detection on
    GT-compensated clouds (the upper-bound control) without a stored key."""
    import jax

    from himo_tpu.downstream.det_net import (
        evaluate_detection_learned,
        init_det_params,
        make_det_model,
    )

    model, _ = make_det_model(
        pillar=SMALL_PILLAR, depths=(16, 32), point_feat_dim=8, base_channels=8
    )
    params = init_det_params(model, jax.random.PRNGKey(0), 2048)
    r = evaluate_detection_learned(
        str(seg_dataset), model, params, flow_mode="gt", num_points=2048,
        verbose=False,
    )
    assert set(r) >= {"precision", "recall", "f1"}


def test_seg_training_deskew_gt_runs(tmp_path):
    """deskew_gt=True trains on GT-undistorted clouds (the WaffleIron role)
    and produces a usable net."""
    import numpy as np

    from himo_tpu.data.synthetic import make_dataset
    from himo_tpu.downstream.segmentation import (
        make_seg_model,
        segment_dataset,
        train_segmentation,
    )
    from himo_tpu.ops.voxelize import PillarConfig

    root = tmp_path / "av2_seg_gt"
    make_dataset(root, num_scenes=1, num_frames=4, seed=13, num_background=500)
    model, _ = make_seg_model(
        pillar=PillarConfig(
            x_range=(-25.6, 25.6), y_range=(-25.6, 25.6), voxel_size=(0.8, 0.8)
        ),
        depths=(16, 32),
        point_feat_dim=8,
        base_channels=8,
    )
    params = train_segmentation(
        str(root), model=model, num_points=2048, epochs=3, verbose=False,
        deskew_gt=True,
    )
    n = segment_dataset(
        str(root), model, params, flow_mode="raw", num_points=2048, verbose=False
    )
    assert n > 0
    leaves = [np.asarray(x) for x in __import__("jax").tree.leaves(params)]
    assert all(np.isfinite(x).all() for x in leaves)

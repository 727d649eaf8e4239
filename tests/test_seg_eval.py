"""Segmentation IoU evaluator tests."""

import numpy as np
import pytest

from himo_tpu.eval.seg import IoUEvaluator, remap_to_three_classes
from himo_tpu.core.categories import CATEGORY_TO_INDEX


def test_perfect_prediction_gives_iou_one():
    ev = IoUEvaluator(n_classes=3)
    labels = np.array([0, 1, 2, 1, 0, 2, 2, 1])
    ev.add_batch(labels, labels)
    mean, per_class = ev.iou()
    np.testing.assert_allclose(per_class, 1.0, rtol=1e-9)
    assert mean == pytest.approx(1.0, rel=1e-9)


def test_confusion_matrix_matches_manual():
    ev = IoUEvaluator(n_classes=3)
    pred = np.array([0, 1, 1, 2, 2, 2])
    gt = np.array([0, 1, 2, 2, 2, 1])
    ev.add_batch(pred, gt)
    expected = np.zeros((3, 3), dtype=np.int64)
    for p, g in zip(pred, gt):
        expected[p, g] += 1
    np.testing.assert_array_equal(ev.confusion, expected)
    _, per_class = ev.iou()
    # class 1: tp=1, fp=1, fn=1 -> 1/3 ; class 2: tp=2, fp=1, fn=1 -> 1/2
    np.testing.assert_allclose(per_class[1], 1 / 3, rtol=1e-9)
    np.testing.assert_allclose(per_class[2], 1 / 2, rtol=1e-9)


def test_remap_three_classes():
    labels = np.array(
        [
            0,
            CATEGORY_TO_INDEX["REGULAR_VEHICLE"],
            CATEGORY_TO_INDEX["TRUCK"],
            CATEGORY_TO_INDEX["PEDESTRIAN"],
            CATEGORY_TO_INDEX["BUS"],
        ]
    )
    np.testing.assert_array_equal(remap_to_three_classes(labels), [0, 1, 2, 0, 2])


def test_seg_pipeline_on_h5(tmp_path):
    """Write seg_* keys into a synthetic scene and score them end-to-end."""
    from himo_tpu.cli.eval_seg import main as eval_seg_main
    from himo_tpu.data.synthetic import make_dataset
    from himo_tpu.data.schema import write_method_flow
    from himo_tpu.data.dataset import SceneFlowDataset
    import h5py

    root = tmp_path / "av2_seg"
    make_dataset(root, num_scenes=1, num_frames=3, seed=5)
    # seg_gtcopy = the GT labels; seg_flip = background everywhere.
    ds = SceneFlowDataset(root, eval=True)
    for i in range(len(ds)):
        data = ds[i]
        labels = data["flow_category_indices"]
        with h5py.File(root / f"{data['scene_id']}.h5", "a") as f:
            g = f[str(data["timestamp"])]
            g.create_dataset("seg_gtcopy", data=labels)
            g.create_dataset("seg_zero", data=np.zeros_like(labels))
    # The scene-final frame has no successor but eval index skips it already.
    results = eval_seg_main(data_dir=str(root), res_names=["seg_gtcopy", "seg_zero"])
    assert results["seg_gtcopy"]["per_class"]["car"] > 0.999
    assert results["seg_gtcopy"]["per_class"]["other_vehicle"] > 0.999
    assert results["seg_zero"]["per_class"]["car"] == 0.0

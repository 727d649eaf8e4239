"""Leaderboard scorer tests: GT-vs-GT ~0 gate and scorer/eval agreement."""

import numpy as np
import pytest

from himo_tpu.cli.save_zip import main as save_zip_main
from himo_tpu.cli.save_zip_gt import main as save_zip_gt_main
from himo_tpu.eval.score import score


@pytest.fixture(scope="module")
def archives(tmp_path_factory):
    from himo_tpu.data.synthetic import make_dataset

    root = tmp_path_factory.mktemp("score") / "av2_demo"
    make_dataset(
        root,
        num_scenes=1,
        num_frames=4,
        seed=3,
        method_flows={"perfect": 0.0, "noisy": 0.05},
    )
    gt_zip = save_zip_gt_main(
        data_dir=str(root), output_dir=str(root / "gt_out"), res_name="flow"
    )
    pred_zip = save_zip_main(data_dir=str(root), res_name="noisy")
    perfect_zip = save_zip_main(data_dir=str(root), res_name="perfect")
    return {"root": root, "gt": gt_zip, "noisy": pred_zip, "perfect": perfect_zip}


def test_gt_vs_gt_scores_zero(archives, tmp_path):
    scores = score(archives["gt"], archives["gt"], output_dir=str(tmp_path))
    assert scores["mpe"] < 1e-6
    assert scores["chamfer"] < 1e-6
    assert scores["num_frames"] == 3
    assert (tmp_path / "scores.json").exists()
    assert (tmp_path / "res-av2.json").exists()


def test_unknown_dataset_raises(archives, tmp_path):
    """Ambiguous archive names must raise (reference check_valid
    utils/__init__.py:10-11), not silently score under scania's min_vel."""
    import shutil

    anon = tmp_path / "anonymous-submit.zip"
    shutil.copy(archives["gt"], anon)
    with pytest.raises(ValueError, match="Cannot infer dataset"):
        score(str(anon), str(anon))
    # Explicit override restores scoring on anonymous archives.
    scores = score(str(anon), str(anon), data_name="av2")
    assert scores["mpe"] < 1e-6
    with pytest.raises(ValueError, match="Unknown data_name"):
        score(str(anon), str(anon), data_name="kitti")


def test_perfect_prediction_scores_zero(archives):
    scores = score(archives["gt"], archives["perfect"])
    assert scores["mpe"] < 1e-6


def test_noisy_worse_than_perfect(archives):
    noisy = score(archives["gt"], archives["noisy"])
    perfect = score(archives["gt"], archives["perfect"])
    assert noisy["mpe"] > perfect["mpe"]
    assert noisy["mpe"] > 0.01
    assert noisy["car_num_pts"] > 0
    assert noisy["others_num_pts"] > 0


def test_scorer_matches_instance_metrics(archives, tmp_path, monkeypatch):
    """Zip-based scoring must agree with flow-mode eval on MPE (the scorer
    documents itself as matching eval.py exactly — score.py:203-208)."""
    monkeypatch.chdir(tmp_path)
    from himo_tpu.cli.eval import main as eval_main

    flow_mode = eval_main(data_dir=str(archives["root"]), res_name="noisy")
    zip_mode = score(archives["gt"], archives["noisy"])
    assert zip_mode["mpe"] == pytest.approx(flow_mode.total_summary()["mpe"], rel=1e-5)


def test_missing_sweep_warns_and_continues(archives, capsys):
    import shutil
    from zipfile import ZipFile

    partial = str(archives["root"] / "partial.zip")
    with ZipFile(archives["noisy"]) as src, ZipFile(partial, "w") as dst:
        names = src.namelist()
        for name in names[1:]:  # drop the first sweep
            dst.writestr(name, src.read(name))
    scores = score(archives["gt"], partial)
    out = capsys.readouterr().out
    assert "Missing prediction" in out
    assert scores["num_frames"] == 2


def test_score_extracted_directories(archives, tmp_path):
    """The scorer accepts extracted directories as well as zips."""
    from zipfile import ZipFile

    gt_dir = tmp_path / "gt_av2_extracted"
    with ZipFile(archives["gt"]) as zf:
        zf.extractall(gt_dir)
    pred_dir = tmp_path / "pred_extracted"
    with ZipFile(archives["perfect"]) as zf:
        zf.extractall(pred_dir)
    scores = score(str(gt_dir), str(pred_dir))
    assert scores["mpe"] < 1e-6
    assert scores["num_frames"] == 3


def test_save_zip_on_test_split_without_gt(tmp_path):
    """Leaderboard test splits carry no GT flow; save_zip must still export."""
    import h5py

    from himo_tpu.cli.save_zip import main as save_zip_main
    from himo_tpu.data.synthetic import make_dataset
    from himo_tpu.io.submission import list_sweep_uuids

    root = tmp_path / "av2_test_split"
    make_dataset(root, num_scenes=1, num_frames=3, seed=9, method_flows={"m": 0.0})
    # Strip every GT field, as a held-out split would ship.
    for h5_path in root.glob("*.h5"):
        with h5py.File(h5_path, "a") as f:
            for key in f:
                g = f[key]
                for gt_key in (
                    "flow",
                    "flow_is_valid",
                    "flow_category_indices",
                    "flow_instance_id",
                    "ego_motion",
                ):
                    if gt_key in g:
                        del g[gt_key]
    zip_path = save_zip_main(data_dir=str(root), res_name="m")
    assert len(list_sweep_uuids(zip_path)) == 2

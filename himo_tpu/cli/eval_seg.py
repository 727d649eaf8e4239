"""Downstream segmentation-result evaluation CLI.

Drop-in surface for the reference's ``downstream/eval_seg.py::main``
(:234-286): scores ``seg_*`` keys in the .h5 scenes against GT categories on
the 3-class {ignore, car, other_vehicle} remap.

    python -m himo_tpu.cli.eval_seg data_dir=... res_names='["seg_raw","seg_flow"]'
"""

from __future__ import annotations

from himo_tpu.data.dataset import SceneFlowDataset
from himo_tpu.eval.seg import evaluate_segmentation
from himo_tpu.utils.cli import run_cli


def main(
    data_dir: str = "",
    res_names=("seg_raw", "seg_flow"),
    mask_only: bool = False,
):
    if isinstance(res_names, str):
        res_names = [res_names]
    dataset = SceneFlowDataset(
        data_dir, eval=True, extra_keys=list(res_names) + ["seg_valid"]
    )
    return evaluate_segmentation(dataset, list(res_names), mask_only=mask_only)


if __name__ == "__main__":
    run_cli(main)

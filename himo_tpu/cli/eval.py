"""Flow-mode / zip-mode compensation evaluation CLI.

Drop-in surface for the reference's ``eval.py::main`` (eval.py:270-312):

    python -m himo_tpu.cli.eval data_dir=/path/to/av2 res_name=seflowpp_best
    python -m himo_tpu.cli.eval data_dir=... comp_dis_zip=pred-submit.zip

Prints the fancy_grid metric table and appends ``res-{data_name}.json``.
"""

from __future__ import annotations

from tqdm import tqdm

from himo_tpu.core.dataset_id import EvalSource, check_valid
from himo_tpu.data.dataset import SceneFlowDataset
from himo_tpu.eval.instance_metrics import InstanceMetrics
from himo_tpu.eval.pipeline import prepare_frame
from himo_tpu.io.submission import read_comp_dis_zip
from himo_tpu.utils.cli import run_cli


def main(
    data_dir: str = "",
    res_name: str = "",
    comp_dis_zip: str = "",
    strict_parity: bool = False,  # reference 4-column distance-bucket norm
    scene_filter: str = "",  # scene-id substring, e.g. "scene_adv"
) -> InstanceMetrics:
    data_name, source = check_valid(data_dir, res_name, comp_dis_zip)
    metrics = InstanceMetrics(data_name=data_name, strict_parity=strict_parity)
    dataset = SceneFlowDataset(
        data_dir, vis_name=res_name if source == EvalSource.FLOW else "", eval=True
    )

    for i in tqdm(
        range(len(dataset)), ncols=80, desc=f"Evaluating {res_name} on {data_name}"
    ):
        data = dataset[i]
        if scene_filter and scene_filter not in str(data["scene_id"]):
            continue
        frame = prepare_frame(
            data, data_name, res_name=res_name if source == EvalSource.FLOW else None
        )
        m = frame["mask_eval"]
        common = dict(
            pc=frame["pc_full"][m] if strict_parity else frame["xyz"][m],
            gt_flow=frame["gt_flow"][m],
            dt0=frame["dt0"][m],
            category_indices=data["flow_category_indices"][m],
            instance_ids=data["flow_instance_id"][m],
        )
        if source == EvalSource.FLOW:
            metrics.step(est_flow=frame["est_flow"][m], **common)
        else:
            comp_dis = read_comp_dis_zip(
                comp_dis_zip, (data["scene_id"], str(data["timestamp"]))
            )
            metrics.step(est_dis=comp_dis[m], **common)

    suffix = f"-{scene_filter.strip('_')}" if scene_filter else ""
    metrics.print(res_name=res_name, file_name=f"res-{data_name}{suffix}.json")
    return metrics


def _entry():
    """console_scripts entry point."""
    run_cli(main)


if __name__ == "__main__":
    run_cli(main)

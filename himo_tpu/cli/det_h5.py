"""Detection-on-compensated-clouds harness CLI.

Surface of the reference's OpenPCDet ``tools/h5sf.py`` experiment
(downstream/README.md:13-18): run detection over raw vs de-skewed clouds and
compare quality.

    python -m himo_tpu.cli.det_h5 data_dir=... flow_modes='["raw","seflowpp"]'
"""

from __future__ import annotations

from himo_tpu.downstream.detection import DetectionConfig, evaluate_detection
from himo_tpu.utils.cli import run_cli


def main(
    data_dir: str = "",
    flow_modes=("raw", "flow"),
    iou_threshold: float = 0.3,
    dynamic_only: bool = True,
):
    if isinstance(flow_modes, str):
        flow_modes = [flow_modes]
    config = DetectionConfig(iou_threshold=iou_threshold)
    results = {}
    for mode in flow_modes:
        results[mode] = evaluate_detection(
            data_dir, flow_mode=mode, config=config, dynamic_only=dynamic_only
        )
    print("\nmode        P      R      F1     meanIoU")
    for mode, r in results.items():
        print(
            f"{mode:<10} {r['precision']:.3f}  {r['recall']:.3f}  "
            f"{r['f1']:.3f}  {r['mean_iou']:.3f}"
        )
    return results


if __name__ == "__main__":
    run_cli(main)

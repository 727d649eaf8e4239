"""Generate SSL pseudo-labels (dynamic masks + clusters) for a dataset.

The ``+ssl_label=seflowpp_auto`` surface of the reference training recipe
(assets/slurm/ssl-train-av2.sh:33):

    python -m himo_tpu.cli.ssl_label dataset_path=/path/to/av2
    python -m himo_tpu.cli.ssl_label dataset_path=... method=dufo   # DUFOMap-style
"""

from __future__ import annotations

from himo_tpu.training.ssl_labels import write_ssl_labels, write_ssl_labels_dufo
from himo_tpu.utils.cli import run_cli


def main(
    dataset_path: str = "",
    threshold: float = 0.18,
    method: str = "nn",  # 'nn' (frame-pair residual) | 'dufo' (occupancy)
    voxel: float = 0.4,
):
    if method == "dufo":
        n = write_ssl_labels_dufo(dataset_path, voxel=voxel, threshold=threshold)
    else:
        n = write_ssl_labels(dataset_path, threshold=threshold)
    print(f"Labeled {n} frames in {dataset_path} ({method})")
    return n


if __name__ == "__main__":
    run_cli(main)

"""SSL training CLI.

Drop-in surface for the reference's OpenSceneFlow ``train.py`` hydra recipe
(assets/slurm/ssl-train-av2.sh:31-34):

    python -m himo_tpu.cli.train dataset_path=/path/to/av2 model=seflowpp \\
        batch_size=8 epochs=12 lr=6e-5 wandb_mode=disabled

Run ``python -m himo_tpu.cli.ssl_label dataset_path=...`` first to produce
the ``+ssl_label`` pseudo-labels the losses consume.
"""

from __future__ import annotations

from himo_tpu.training.trainer import TrainConfig, train
from himo_tpu.utils.cli import run_cli
from himo_tpu.utils.config import apply_overrides, split_known_overrides


def main(
    dataset_path: str = "",
    model: str = "seflowpp",
    batch_size: int = 8,
    epochs: int = 12,
    lr: float = 6e-5,
    num_points: int = 65536,
    run_dir: str = "runs/seflowpp",
    wandb_mode: str = "disabled",
    seed: int = 0,
    dtype: str = "bfloat16",  # backbone dtype; flow head & losses stay fp32
    **overrides,
):
    config = TrainConfig(
        model=model,
        batch_size=batch_size,
        epochs=epochs,
        lr=lr,
        num_points=num_points,
        seed=seed,
    )
    known, model_overrides = split_known_overrides(TrainConfig, overrides)
    config = apply_overrides(config, known)
    model_overrides.setdefault("dtype", dtype)
    result = train(
        dataset_path,
        config,
        run_dir=run_dir,
        wandb_mode=wandb_mode,
        model_overrides=model_overrides or None,
    )
    print(f"Trained {result['steps']} steps in {result['seconds']:.1f}s")
    return result


if __name__ == "__main__":
    run_cli(main)

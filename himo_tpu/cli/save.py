"""Flow inference CLI — write method flow into the .h5 scenes.

Drop-in surface for the reference's OpenSceneFlow ``save.py`` (README.md:46-53):

    # optimization-based (no checkpoint needed)
    python -m himo_tpu.cli.save model=fastnsf dataset_path=/path/to/av2

    # feed-forward from a trained checkpoint
    python -m himo_tpu.cli.save checkpoint=ckpts/seflowpp dataset_path=... model=seflowpp

    # mesh-sharded fleet inference (one batch per device shard)
    python -m himo_tpu.cli.save fleet=true checkpoint=... dataset_path=... model=seflowpp

Hydra-style ``key=value`` overrides are accepted; extra keys are forwarded to
the estimator config (e.g. ``iterations=200``).
"""

from __future__ import annotations

from himo_tpu.models.runner import estimate_scene_flow
from himo_tpu.utils.cli import run_cli


def main(
    dataset_path: str = "",
    model: str = "fastnsf",
    checkpoint: str = "",
    output_key: str = "",
    seed: int = 0,
    fleet: bool = False,
    batch_per_device: int = 1,
    num_points: int = 65536,
    static_gate: float = 0.0,  # zero sub-threshold residual flow (m/frame)
    **overrides,
):
    if fleet:
        # Mesh-sharded batched inference (feed-forward models): the config-5
        # chain's public surface — every device shard runs frames in
        # parallel, flow lands back in the .h5 scenes.
        from himo_tpu.parallel.fleet import FleetConfig, fleet_save

        return fleet_save(
            dataset_path,
            model=model,
            checkpoint=checkpoint or None,
            output_key=output_key or None,
            config=FleetConfig(
                num_points=num_points,
                batch_per_device=batch_per_device,
                static_gate=static_gate,
            ),
            model_overrides=overrides or None,
        )
    return estimate_scene_flow(
        dataset_path,
        model=model,
        output_key=output_key or None,
        checkpoint=checkpoint or None,
        seed=seed,
        **overrides,
    )


if __name__ == "__main__":
    run_cli(main)

"""Fleet pipeline: sharded batched de-distortion over the 8-device mesh."""

import numpy as np
import jax


def test_fleet_sharded_inference(tmp_path, rng):
    from himo_tpu.data.dataset import SceneFlowDataset
    from himo_tpu.data.synthetic import make_dataset
    from himo_tpu.models.feedforward import init_params, make_model
    from himo_tpu.ops.voxelize import PillarConfig
    from himo_tpu.parallel.fleet import FleetConfig, run_fleet
    from himo_tpu.parallel.mesh import make_mesh

    assert len(jax.devices()) == 8
    root = tmp_path / "av2_fleet"
    make_dataset(root, num_scenes=2, num_frames=6, seed=9, num_background=700)
    dataset = SceneFlowDataset(root, with_pc1=True, with_history=True)

    model, _ = make_model(
        "seflowpp",
        pillar=PillarConfig(
            x_range=(-25.6, 25.6), y_range=(-25.6, 25.6), voxel_size=(0.8, 0.8)
        ),
        depths=(16, 32),
        point_feat_dim=8,
        base_channels=8,
    )
    num_points = 2048
    params = init_params(model, jax.random.PRNGKey(0), num_points)
    mesh = make_mesh(8)

    received = {}

    def consumer(i, host, out):
        received[i] = out

    stats = run_fleet(
        dataset,
        model,
        params,
        mesh=mesh,
        config=FleetConfig(num_points=num_points, batch_per_device=1),
        consumer=consumer,
    )
    assert stats["frames"] == len(dataset)
    assert stats["mesh_shards"] == 8
    assert set(received) == set(range(len(dataset)))
    for out in received.values():
        assert out["comp_dis"].shape[1] == 3
        assert np.all(np.isfinite(out["comp_dis"]))
        assert out["flow"].shape == out["refined"].shape


def test_fleet_save_cli_end_to_end(tmp_path):
    """cli.save fleet=true: checkpointed model -> mesh-sharded inference ->
    flow written into the scenes -> flow-mode eval reads it back."""
    from himo_tpu.cli.save import main as save_main
    from himo_tpu.data.dataset import SceneFlowDataset
    from himo_tpu.data.synthetic import make_dataset
    from himo_tpu.models.feedforward import init_params, make_model
    from himo_tpu.ops.voxelize import PillarConfig
    from himo_tpu.training.checkpoints import save_checkpoint

    root = tmp_path / "av2_fleet_cli"
    make_dataset(root, num_scenes=2, num_frames=4, seed=11, num_background=600)
    overrides = dict(
        pillar=PillarConfig(
            x_range=(-25.6, 25.6), y_range=(-25.6, 25.6), voxel_size=(0.8, 0.8)
        ),
        depths=(16, 32),
        point_feat_dim=8,
        base_channels=8,
    )
    model, _ = make_model("seflowpp", **overrides)
    params = init_params(model, jax.random.PRNGKey(0), 2048)
    ckpt = tmp_path / "ckpt"
    save_checkpoint(ckpt, {"params": params})

    stats = save_main(
        dataset_path=str(root),
        model="seflowpp",
        checkpoint=str(ckpt),
        output_key="fleet_cli",
        fleet=True,
        num_points=2048,
        **overrides,
    )
    assert stats["frames"] == len(SceneFlowDataset(root, with_pc1=True))
    assert stats["mesh_shards"] == 8

    ds = SceneFlowDataset(root, vis_name="fleet_cli")
    d = ds[0]
    assert d["fleet_cli"].shape == (len(d["pc0"]), 3)

"""Driver config-5 chain (BASELINE.json): sharded multi-scene de-distortion
feeding segmentation and IoU eval, on the virtual 8-device mesh."""

import numpy as np
import jax

from himo_tpu.ops.voxelize import PillarConfig

SMALL_PILLAR = PillarConfig(
    x_range=(-25.6, 25.6), y_range=(-25.6, 25.6), voxel_size=(0.8, 0.8)
)
TINY = dict(pillar=SMALL_PILLAR, depths=(16, 32), point_feat_dim=8, base_channels=8)


def test_fleet_to_segmentation_chain(tmp_path):
    from himo_tpu.cli.eval_seg import main as eval_seg_main
    from himo_tpu.data.dataset import SceneFlowDataset
    from himo_tpu.data.schema import write_method_flow
    from himo_tpu.data.synthetic import make_dataset
    from himo_tpu.downstream.segmentation import (
        make_seg_model,
        segment_dataset,
        train_segmentation,
    )
    from himo_tpu.models.feedforward import init_params, make_model
    from himo_tpu.parallel.fleet import FleetConfig, run_fleet
    from himo_tpu.parallel.mesh import make_mesh

    assert len(jax.devices()) == 8
    root = tmp_path / "av2_cfg5"
    make_dataset(root, num_scenes=2, num_frames=6, seed=77, num_background=800)

    # Stage 1: sharded batched flow inference + de-skew over the mesh,
    # writing total flow back into the scenes through the consumer.
    dataset = SceneFlowDataset(root, with_pc1=True, with_history=True)
    model, _ = make_model("seflowpp", **TINY)
    params = init_params(model, jax.random.PRNGKey(0), 2048)
    mesh = make_mesh(8)

    def consumer(i, host, out):
        data = dataset[i]
        n = len(data["pc0"])
        flow = out["flow"][:n]
        if n > len(flow):
            flow = np.concatenate([flow, np.zeros((n - len(flow), 3), np.float32)])
        write_method_flow(root, data["scene_id"], data["timestamp"], "fleet_flow", flow)

    stats = run_fleet(
        dataset,
        model,
        params,
        mesh=mesh,
        config=FleetConfig(num_points=2048, batch_per_device=1),
        consumer=consumer,
    )
    assert stats["frames"] == len(dataset)
    assert stats["mesh_shards"] == 8

    # Stage 2: segmentation over the de-skewed clouds (writes seg_fleet_flow).
    seg_model, _ = make_seg_model(**TINY)
    seg_params = train_segmentation(
        str(root), model=seg_model, num_points=2048, epochs=4, lr=2e-3, verbose=False
    )
    n = segment_dataset(
        str(root),
        seg_model,
        seg_params,
        flow_mode="fleet_flow",
        num_points=2048,
        verbose=False,
    )
    assert n > 0

    # Stage 3: IoU eval of the written labels.
    results = eval_seg_main(data_dir=str(root), res_names=["seg_fleet_flow"])
    per_class = results["seg_fleet_flow"]["per_class"]
    assert per_class["car"] + per_class["other_vehicle"] > 0.05

from himo_tpu.ops.nn import nn_distance_sq, chamfer_distance, truncated_chamfer  # noqa: F401
from himo_tpu.ops.voxelize import voxelize_pillars, PillarGrid  # noqa: F401
from himo_tpu.ops.points_in_boxes import points_in_boxes  # noqa: F401

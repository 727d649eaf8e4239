from himo_tpu.eval.instance_metrics import InstanceMetrics  # noqa: F401
from himo_tpu.eval.chamfer import chamfer_distance_host  # noqa: F401

"""Scene-flow estimators.

Optimization-based (per frame-pair, jitted inner loops):
- :mod:`himo_tpu.models.nsfp` — Neural Scene Flow Prior (coordinate MLP +
  truncated Chamfer, reference surface ``model=nsfp``).
- :mod:`himo_tpu.models.fastnsf` — Fast Neural Scene Flow (distance-transform
  loss, ``model=fastnsf`` / h5 key ``fastnsf10``).

Feed-forward (trained, pillar pseudo-image backbones):
- :mod:`himo_tpu.models.fastflow3d` — FastFlow3D (linear decoder).
- :mod:`himo_tpu.models.deflow` — DeFlow / DeFlow++ (GRU iterative decoder;
  SeFlow++ is DeFlow++ trained with the SSL losses, reference
  assets/slurm/ssl-train-av2.sh:31-34).

``get_estimator(name)`` resolves a method name (as used in h5 flow keys and
the save CLI) to a callable.
"""

from himo_tpu.models.registry import get_estimator, register_estimator, available_estimators  # noqa: F401

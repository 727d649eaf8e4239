"""Method-name registry mapping h5 flow keys / CLI names to estimators.

The reference exposes estimators by hydra name (``model=fastnsf`` etc.,
README.md:46-53) and stores results under method keys like ``nsfp``,
``fastnsf10``, ``seflowpp_best`` (tools/animation_video.py:328-332). This
registry is the single lookup for both.
"""

from __future__ import annotations

from typing import Callable, Dict

_REGISTRY: Dict[str, Callable] = {}


def register_estimator(name: str):
    def wrap(factory: Callable):
        _REGISTRY[name] = factory
        return factory

    return wrap


def get_estimator(name: str, **overrides):
    """Instantiate an estimator by name; ``overrides`` feed its config."""
    _load_builtin_estimators()
    if name not in _REGISTRY:
        raise KeyError(
            f"Unknown estimator {name!r}; available: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[name](**overrides)


def _load_builtin_estimators():
    # Imported lazily so registry imports stay light.
    import himo_tpu.models.nsfp  # noqa: F401
    import himo_tpu.models.fastnsf  # noqa: F401
    import himo_tpu.models.icp_flow  # noqa: F401
    import himo_tpu.models.feedforward  # noqa: F401


def available_estimators():
    _load_builtin_estimators()
    return sorted(_REGISTRY)

from himo_tpu.utils.cli import run_cli  # noqa: F401
from himo_tpu.utils.profiling import Timer, stage_timer  # noqa: F401

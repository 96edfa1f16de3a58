from xalm_tpu.obs.table import Table  # noqa: F401
from xalm_tpu.obs.profiler import profile, report, reset  # noqa: F401
from xalm_tpu.obs.console import ProgressBar, SystemUsage, scoped_usage  # noqa: F401

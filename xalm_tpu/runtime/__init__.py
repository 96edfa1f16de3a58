from xalm_tpu.runtime.cache import KVCache, ring_indices  # noqa: F401
from xalm_tpu.runtime.engine import Engine  # noqa: F401

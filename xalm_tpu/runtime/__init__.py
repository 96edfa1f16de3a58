# Engine is imported from xalm_tpu.runtime.engine directly — re-exporting it
# here would cycle (engine -> models.llama -> runtime.cache -> this package).
from xalm_tpu.runtime.cache import KVCache, ring_indices  # noqa: F401

# NOTE: xalm_tpu.models.llama is imported directly (not re-exported here) to
# avoid an import cycle: llama -> runtime.cache -> models.config -> (this).
from xalm_tpu.models.config import ModelConfig  # noqa: F401
from xalm_tpu.models.params import ModelParams, LayerParams, QWeight, load_params  # noqa: F401

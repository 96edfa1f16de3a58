from xalm_tpu.io.container import TensorInfo, XalmFile, write_xalm  # noqa: F401

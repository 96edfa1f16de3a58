from xalm_tpu.serve.batching import ContinuousBatcher, Request  # noqa: F401

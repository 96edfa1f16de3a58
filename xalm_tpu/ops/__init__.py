from xalm_tpu.ops.linear import qmatmul  # noqa: F401

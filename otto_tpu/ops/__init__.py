from otto_tpu.ops import segment  # noqa: F401

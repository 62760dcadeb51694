from otto_tpu.data.schema import Events  # noqa: F401

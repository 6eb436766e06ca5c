from histogan_tpu.optim.diffgrad import diffgrad  # noqa: F401

from ldso_tpu.math import lie  # noqa: F401

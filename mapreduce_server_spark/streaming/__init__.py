from . import twins  # noqa: F401

from . import tp  # noqa: F401

from . import engine, kv_cache  # noqa: F401

from . import generate, llama, loader  # noqa: F401

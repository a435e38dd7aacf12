from . import checkpoint, generate, llama, loader, mixtral, opt  # noqa: F401

from . import (checkpoint, fuse, generate, llama, loader, mixtral,  # noqa: F401
               opt)

from . import formats, packing, quant  # noqa: F401

from . import perplexity  # noqa: F401

from . import anyq, kmeans  # noqa: F401

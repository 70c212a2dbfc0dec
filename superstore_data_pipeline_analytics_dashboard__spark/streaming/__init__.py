from . import incremental  # noqa: F401

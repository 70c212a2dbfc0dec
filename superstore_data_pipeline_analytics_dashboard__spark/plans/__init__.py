from . import catalog_queries  # noqa: F401

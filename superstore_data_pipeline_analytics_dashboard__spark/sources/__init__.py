from .catalog import TABLES, load_star, register_views  # noqa: F401

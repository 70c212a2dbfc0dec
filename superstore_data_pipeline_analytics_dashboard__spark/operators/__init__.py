from . import append, date_spine, dedup, quality, scd2, similarity, windows  # noqa: F401

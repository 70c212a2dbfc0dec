from . import append, date_spine, dedup, joins, quality, scd2, similarity, windows  # noqa: F401

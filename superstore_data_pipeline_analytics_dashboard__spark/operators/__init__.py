from . import append, date_spine, dedup, graph, joins, quality, scd2, similarity, windows  # noqa: F401

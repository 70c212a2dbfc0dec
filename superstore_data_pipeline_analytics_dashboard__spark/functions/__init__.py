from . import cleaning, dates, hashing, text, vectors  # noqa: F401

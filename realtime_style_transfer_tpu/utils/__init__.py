from .stats import describe, comparison_table  # noqa: F401

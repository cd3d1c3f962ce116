from .temporal import (
    date_parts,
    minutes_between,
    month_windows,
    parse_timestamps,
    with_date_parts,
)
from .scalar import composite_key, null_percent_exprs, to_numeric

__all__ = [
    "composite_key",
    "date_parts",
    "minutes_between",
    "month_windows",
    "null_percent_exprs",
    "parse_timestamps",
    "to_numeric",
    "with_date_parts",
]

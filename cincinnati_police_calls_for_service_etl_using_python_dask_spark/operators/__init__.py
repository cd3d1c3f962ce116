from .relational import (
    keep_columns,
    multiway_join,
    rename_all,
    salted_join,
    semi_join,
    anti_join,
    top_k,
    union_all,
)
from .aggregates import (
    group_agg,
    group_agg_single_distinct,
    null_profile,
    pivot_count_distinct,
    value_counts,
)
from .dedup import latest_per_key

__all__ = [
    "anti_join",
    "group_agg",
    "group_agg_single_distinct",
    "keep_columns",
    "latest_per_key",
    "multiway_join",
    "null_profile",
    "pivot_count_distinct",
    "rename_all",
    "salted_join",
    "semi_join",
    "top_k",
    "union_all",
    "value_counts",
]

from .files import read_csv_with_schema, read_parquet, read_testdata, write_parquet

__all__ = [
    "read_csv_with_schema",
    "read_parquet",
    "read_testdata",
    "write_parquet",
]

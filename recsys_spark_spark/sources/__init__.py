from .readers import (
    RATINGS_SCHEMA,
    load_tables,
    ratings_from_events,
    ratings_from_sales,
    read_features_csv,
    read_ratings_csv,
    table,
)

__all__ = [
    "RATINGS_SCHEMA",
    "load_tables",
    "ratings_from_events",
    "ratings_from_sales",
    "read_features_csv",
    "read_ratings_csv",
    "table",
]

from .readers import (
    load_events,
    load_table,
    read_csv_table,
    write_append,
    write_overwrite,
)

__all__ = [
    "load_events",
    "load_table",
    "read_csv_table",
    "write_append",
    "write_overwrite",
]

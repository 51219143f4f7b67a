from .readers import (  # noqa: F401
    ensure_timestamp,
    load_testdata,
    memory_table,
    nanos_to_timestamp,
    read_csv,
    read_jdbc,
    read_parquet,
)
from .writers import write_csv_single_file, write_jdbc, write_parquet  # noqa: F401

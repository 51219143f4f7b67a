from .readers import (  # noqa: F401
    ensure_timestamp,
    load_testdata,
    memory_table,
    nanos_to_timestamp,
    read_csv,
    read_csv_quarantine,
    read_jdbc,
    read_jsonl,
    read_jsonl_quarantine,
    read_orc,
    read_parquet,
)
from .writers import (  # noqa: F401
    compact_parquet,
    upsert_parquet,
    write_bucketed_table,
    write_csv_single_file,
    write_jdbc,
    write_jsonl,
    write_orc,
    write_parquet,
)

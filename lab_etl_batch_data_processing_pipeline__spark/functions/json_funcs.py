"""JSON Column-expression builders (events.props-style payload columns).

``get_json_object`` evaluates JVM-side with a streaming JSON parser; for
hot paths extracting many keys, prefer one ``from_json`` with an explicit
schema (single parse) — both provided here.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def json_get(col: Column, key: str) -> Column:
    """Extract a top-level key as string (NULL if absent/malformed)."""
    return F.get_json_object(col, f"$.{key}")


def json_get_int(col: Column, key: str) -> Column:
    return json_get(col, key).try_cast("bigint")


def json_struct(col: Column, schema: str) -> Column:
    """Parse the whole payload once with a declared schema, e.g.
    ``json_struct(F.col('props'), 'k INT, tag STRING')``."""
    return F.from_json(col, schema)

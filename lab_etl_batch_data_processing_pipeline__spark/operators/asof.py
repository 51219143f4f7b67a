"""As-of (point-in-time) join — an operator Spark has no native form of.

``asof_join(left, right, ...)`` attaches, to every left row, the right row
with the greatest timestamp <= the left row's timestamp within the same
key (the standard "latest state as of this moment" lookup: price as of
trade time, profile as of event time, ...).

Implementation is the scalable union+window composition, NOT a range
join: tag both sides, union, sort within key by (ts, side, tiebreak), and
carry the last non-null right payload forward with
``last(ignorenulls=True)``. Cost: ONE shuffle on the key + an in-partition
sort — O((|L|+|R|) log p) — versus the O(|L| x |R|) blowup of the naive
``left.ts >= right.ts`` theta-join. Equal timestamps: the right side sorts
before the left side, so a right row at exactly left.ts is visible
("at or before"); among equal right timestamps the tiebreak column wins.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    right_tiebreak: str | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join. Every left row survives; right payload columns come
    back suffixed (NULL when no right row is at-or-before).

    ``right_tiebreak``: column deciding among right rows sharing one
    timestamp (highest wins) — required for deterministic output when the
    right side can have same-key-same-ts duplicates.
    """
    keys = [on] if isinstance(on, str) else list(on)
    payload_cols = [c for c in right.columns if c not in keys]

    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("__ts"),
        (F.col(right_tiebreak) if right_tiebreak else F.lit(0)).alias("__tb"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("__payload"),
        F.lit(0).alias("__side"),
    )
    l = left.select(
        "*",
        F.col(left_ts).alias("__ts"),
        F.lit(None).cast(r.schema["__tb"].dataType).alias("__tb"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        F.lit(1).alias("__side"),
    )
    combined = l.select(
        *[F.col(k) for k in keys],
        "__ts",
        "__tb",
        "__payload",
        "__side",
        F.struct(*[F.col(c) for c in left.columns]).alias("__left"),
    ).unionByName(
        r.select(
            *[F.col(k) for k in keys],
            "__ts",
            "__tb",
            "__payload",
            "__side",
            F.lit(None).cast(
                "struct<" + ",".join(f"{f.name}:{f.dataType.simpleString()}" for f in left.schema.fields) + ">"
            ).alias("__left"),
        )
    )

    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc(), F.col("__tb").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = combined.withColumn(
        "__match", F.last("__payload", ignorenulls=True).over(w)
    ).filter(F.col("__side") == 1)

    out_cols = [F.col(f"__left.{c}").alias(c) for c in left.columns]
    out_cols += [
        F.col(f"__match.{c}").alias(f"{c}{suffix}") for c in payload_cols
    ]
    return matched.select(*out_cols)

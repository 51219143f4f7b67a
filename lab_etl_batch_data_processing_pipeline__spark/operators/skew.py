"""Skew-mitigation operators: salted aggregation and salted broadcast join.

At 100 TB, one hot key (a null join key, a default user id, an 'unknown'
category) concentrates a shuffle partition onto one executor and the whole
stage waits for it. Two standard remedies, both pure DataFrame:

- :func:`salted_agg` — two-phase aggregation: first aggregate on
  (key, random-salt) so the hot key's rows split across ``salt`` reducers,
  then merge the partials per key. Works for any algebraic aggregate
  (here: count/sum pairs, the partial forms of count/sum/avg).
- :func:`replicated_broadcast_join` — for a skewed fact⟕dim join where the
  dim is small: explode the dim ``salt`` ways and give each fact row a
  random salt, turning one hot hash bucket into ``salt`` buckets.
  (With AQE's skew-join handling on — session.py — Spark often does this
  automatically for sort-merge joins; the explicit form covers aggregates
  and deterministic plans.)

Note: ``rand``-based salting is intentionally *not* value-deterministic
per row — only the final aggregate is deterministic, which is the point
of algebraic merging.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str] = (),
    salt: int = 16,
) -> DataFrame:
    """Two-phase count/sum aggregation with a random salt on the first hop.

    Output: one row per key with ``n_rows`` and ``sum_<col>`` for each
    requested sum column. Equivalent to a direct groupBy (verified in
    tests) but the first shuffle distributes each key over ``salt``
    partitions.
    """
    salted = df.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    partial_aggs = [F.count(F.lit(1)).alias("__pn")] + [
        F.sum(F.col(c).cast("decimal(18,4)")).alias(f"__ps_{c}") for c in sum_cols
    ]
    partial = salted.groupBy(*keys, "__salt").agg(*partial_aggs)
    final_aggs = [F.sum("__pn").alias("n_rows")] + [
        F.sum(f"__ps_{c}").cast("double").alias(f"sum_{c}") for c in sum_cols
    ]
    return partial.groupBy(*keys).agg(*final_aggs)


def replicated_broadcast_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "left",
) -> DataFrame:
    """Skew-proof fact⟕dim equi-join: replicate the dim per salt value,
    join on (key, salt). The dim side must be broadcastable (it is
    replicated ``salt``x)."""
    dim_rep = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    fact_salted = fact.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    return fact_salted.join(
        F.broadcast(dim_rep), on=[on, "__salt"], how=how
    ).drop("__salt")

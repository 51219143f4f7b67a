from . import (  # noqa: F401
    asof,
    cleaning,
    dedup_fuzzy,
    enrich,
    joins,
    metrics,
    metrics_sql,
    multimodal,
    sessions,
    similarity,
    skew,
    text,
)

from . import (  # noqa: F401
    cleaning,
    dedup_fuzzy,
    enrich,
    joins,
    metrics,
    multimodal,
    sessions,
    similarity,
    text,
)

from .pipeline import curate, present, run_pipeline  # noqa: F401

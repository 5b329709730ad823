"""Data pipeline, profiling, naming, checkpointing, JAX environment helpers."""

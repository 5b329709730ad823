"""Core tensor-network operations: gates, truncated SVD, MPS evolution, overlaps."""

"""Alternative execution backends (native CPU engine)."""

"""Command-line entry points preserving the reference's argv contracts."""

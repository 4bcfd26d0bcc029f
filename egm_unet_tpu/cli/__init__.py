"""Command-line entry points preserving the reference's CLI contracts."""

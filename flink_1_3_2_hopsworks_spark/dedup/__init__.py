"""dedup — see package docstring."""

"""functions — see package docstring."""

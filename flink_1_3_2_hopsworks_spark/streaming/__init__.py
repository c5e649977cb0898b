"""streaming — see package docstring."""

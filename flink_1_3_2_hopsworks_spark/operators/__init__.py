"""operators — see package docstring."""

"""sources — see package docstring."""

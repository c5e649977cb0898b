"""similarity — see package docstring."""

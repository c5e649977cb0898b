"""graph — see package docstring."""

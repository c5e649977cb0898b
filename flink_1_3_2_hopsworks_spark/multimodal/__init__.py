"""multimodal — see package docstring."""

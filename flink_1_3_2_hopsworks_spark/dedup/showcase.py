"""Registry showcase queries for this domain (filled in as operators land)."""

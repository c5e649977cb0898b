"""End-to-end relational query plans (TPC-H-style) over the test corpus."""

"""Test utilities: DuckDB-oracle parity harness mirroring the driver."""

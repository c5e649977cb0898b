"""DuckDB oracle SQL for this domain's showcase queries."""

ORACLE: dict[str, str] = {}

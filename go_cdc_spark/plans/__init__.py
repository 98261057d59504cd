"""Query registry: named operators with DuckDB-oracle SQL."""

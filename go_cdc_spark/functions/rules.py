"""(schema, table) include/exclude rule filter — compiler to Spark Column.

Behavioral parity with the reference's FilterRule
(`pkg/config/db.go:101-165`), verified against its decision tree:

- a per-schema pattern, when present for the event's schema, fully
  overrides the global pattern (`db.go:111-124`);
- within a pattern: exclude-over-include — a table matching
  ``exclude_tables`` is rejected before ``include_tables`` is consulted
  (`db.go:133-143`); a non-empty ``include_tables`` is an allowlist;
- pattern syntax: exact match, or trailing underscore = prefix wildcard
  with the underscore stripped, i.e. ``foo_`` matches anything starting
  with ``foo`` (`db.go:155-165`);
- ``include_schemas`` (global pattern only) is an exact-match allowlist;
- no configuration at all ⇒ allow everything (`db.go:119-123`).

Two surfaces, same semantics:

- :meth:`FilterRules.allow` — planning-time pruning of the discovered
  table list (the Spark analog of partition pruning: don't even read
  what the rules reject);
- :meth:`FilterRules.to_column` — compiles the decision tree into a
  boolean Column expression (``isin`` / ``startswith`` / ``when``
  chains), so stream-time filtering runs JVM-side inside codegen, never
  through a Python UDF.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F


def _split(v: str | list[str] | None) -> list[str]:
    if v is None:
        return []
    if isinstance(v, str):
        return [p.strip() for p in v.split(",") if p.strip()]
    return list(v)


@dataclass
class FilterPattern:
    include_schemas: list[str] = field(default_factory=list)
    include_tables: list[str] = field(default_factory=list)
    exclude_tables: list[str] = field(default_factory=list)

    @classmethod
    def parse(cls, cfg: dict) -> FilterPattern:
        return cls(
            include_schemas=_split(cfg.get("include_schemas")),
            include_tables=_split(cfg.get("include_tables")),
            exclude_tables=_split(cfg.get("exclude_tables")),
        )

    # -- python-side evaluation ----------------------------------------

    @staticmethod
    def _matches(patterns: list[str], name: str) -> bool:
        for p in patterns:
            if p.endswith("_") and name.startswith(p[:-1]):
                return True
            if p == name:
                return True
        return False

    def allow(self, schema: str, table: str) -> bool:
        if schema and self.include_schemas and schema not in self.include_schemas:
            return False
        if table:
            if self._matches(self.exclude_tables, table):
                return False
            if self.include_tables:
                return self._matches(self.include_tables, table)
        return True

    # -- column compilation ---------------------------------------------

    @staticmethod
    def _match_col(patterns: list[str], col: Column) -> Column:
        exact = [p for p in patterns if not p.endswith("_")]
        prefixes = [p[:-1] for p in patterns if p.endswith("_")]
        expr = F.lit(False)
        if exact:
            expr = expr | col.isin(exact)
        for pre in prefixes:
            expr = expr | col.startswith(pre)
        return expr

    def to_column(self, schema_col: Column | None, table_col: Column) -> Column:
        expr = F.lit(True)
        if schema_col is not None and self.include_schemas:
            expr = expr & schema_col.isin(self.include_schemas)
        expr = expr & ~self._match_col(self.exclude_tables, table_col)
        if self.include_tables:
            expr = expr & self._match_col(self.include_tables, table_col)
        return expr


@dataclass
class FilterRules:
    global_pattern: FilterPattern | None = None
    by_schema: dict[str, FilterPattern] = field(default_factory=dict)

    @classmethod
    def parse(cls, cfg: dict) -> FilterRules:
        """Parse ``{"global": {...}, "schemas": {"db1": {...}}}`` where each
        pattern dict has include_schemas/include_tables/exclude_tables as
        comma-separated strings or lists."""
        return cls(
            global_pattern=(
                FilterPattern.parse(cfg["global"]) if cfg.get("global") else None
            ),
            by_schema={
                s: FilterPattern.parse(p) for s, p in (cfg.get("schemas") or {}).items()
            },
        )

    def allow(self, schema: str, table: str = "") -> bool:
        pattern = self.by_schema.get(schema)
        if pattern is not None:
            # per-schema pattern overrides global; schema check is moot
            return pattern.allow("", table)
        if self.global_pattern is not None:
            return self.global_pattern.allow(schema, table)
        return True

    def allow_schemas(self, schemas: list[str]) -> list[str]:
        return [s for s in schemas if self.allow(s)]

    def allow_tables(self, tables: dict[str, list[str]]) -> dict[str, list[str]]:
        """Planning-time pruning of a {schema: [tables]} catalog listing."""
        out: dict[str, list[str]] = {}
        for schema, tbls in tables.items():
            if not self.allow(schema):
                continue
            kept = [t for t in tbls if self.allow(schema, t)]
            if kept:
                out[schema] = kept
        return out

    def to_column(self, schema_col: Column, table_col: Column) -> Column:
        """Compile to one boolean Column (JVM-evaluated, codegen-friendly)."""
        if self.global_pattern is not None:
            expr = self.global_pattern.to_column(schema_col, table_col)
        else:
            expr = F.lit(True)
        for schema, pattern in self.by_schema.items():
            expr = F.when(
                schema_col == F.lit(schema), pattern.to_column(None, table_col)
            ).otherwise(expr)
        return expr

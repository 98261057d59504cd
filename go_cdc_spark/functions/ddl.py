"""MySQL DDL → Spark schema evolution.

The reference classifies replication query events as DDL by prefix
(`internal/cannal/incremental.go:210-223`) and forwards them downstream;
a materializing consumer must then evolve the target table or silently
drop the new columns' data. This module is that consumer-side half:
parse the ALTER statements a MySQL binlog actually emits and fold them
into a Spark ``StructType``.

Scope: ``ALTER TABLE … ADD [COLUMN] name type``, ``DROP [COLUMN]
name``, ``RENAME COLUMN old TO new``, and ``CHANGE [COLUMN] old new
type`` (comma-separated multi-clause supported) — the evolutions a
latest-wins materialized table can apply retroactively (old rows read
NULL for added columns; renamed columns carry their data, CHANGE's
type re-declaration casts it). MODIFY (in-place type change with no
rename anchor) and table-level RENAME TO change history semantics and
are surfaced as unsupported rather than guessed at.

Everything here is driver-side, O(statement length) — DDL events are
catalog-rate, not row-rate.
"""

from __future__ import annotations

import re

from pyspark.sql import types as T

__all__ = [
    "UnsupportedDdl",
    "mysql_to_spark_type",
    "parse_alter",
    "evolve_schema",
    "is_widening",
]


class UnsupportedDdl(ValueError):
    """ALTER clause whose semantics we refuse to guess (MODIFY, table
    RENAME TO)."""


_ALTER_RE = re.compile(r"^\s*ALTER\s+TABLE\s+`?([\w$]+)`?(?:\.`?([\w$]+)`?)?\s+(.*)$",
                       re.IGNORECASE | re.DOTALL)
_ADD_RE = re.compile(
    r"^ADD\s+(?:COLUMN\s+)?`?([\w$]+)`?\s+([A-Za-z]+(?:\s*\(\s*\d+(?:\s*,\s*\d+)?\s*\))?)",
    re.IGNORECASE,
)
# DEFAULT literal inside an ADD clause: quoted string ('' escapes),
# NULL, booleans, numbers. CURRENT_TIMESTAMP-family defaults are
# matched so they can be REFUSED: MySQL stamps existing rows with the
# DDL execution time, which a replayed changelog cannot reproduce —
# guessing would diverge from the source table.
_DEFAULT_RE = re.compile(
    r"\bDEFAULT\s+('(?:[^']|'')*'"
    r"|NULL\b|TRUE\b|FALSE\b"
    r"|[-+]?\d+(?:\.\d+)?"
    r"|CURRENT_TIMESTAMP(?:\s*\(\d*\))?|NOW\s*\(\))",
    re.IGNORECASE,
)
_DROP_RE = re.compile(r"^DROP\s+(?:COLUMN\s+)?`?([\w$]+)`?\s*$", re.IGNORECASE)
_RENAME_COL_RE = re.compile(
    r"^RENAME\s+(?:COLUMN\s+)?`?([\w$]+)`?\s+TO\s+`?([\w$]+)`?\s*$",
    re.IGNORECASE,
)
_CHANGE_RE = re.compile(
    r"^CHANGE\s+(?:COLUMN\s+)?`?([\w$]+)`?\s+`?([\w$]+)`?\s+"
    r"([A-Za-z]+(?:\s*\(\s*\d+(?:\s*,\s*\d+)?\s*\))?)",
    re.IGNORECASE,
)
# Table-level renames change history semantics: both the standard
# `RENAME TO|AS name` and MySQL's bare `RENAME name` (TO/AS optional)
# forms must be refused, not silently ignored — the materializer would
# keep applying events under the old table identity otherwise. The
# bare form is one identifier ending the clause, distinguished from
# column/index renames by the COLUMN/INDEX/KEY keyword lookahead.
_UNSUPPORTED_RE = re.compile(
    r"^(MODIFY\b"
    r"|RENAME\s+(TO|AS)\b"
    r"|RENAME\s+(?!COLUMN\b|INDEX\b|KEY\b)`?[\w$]+`?\s*$)",
    re.IGNORECASE,
)
# non-column ADD/DROP targets a binlog can carry inside ALTER
_NONCOLUMN = {
    "primary", "foreign", "unique", "fulltext", "spatial",
    "index", "key", "constraint", "partition",
}

_INT_TYPES = {"tinyint", "smallint", "mediumint", "int", "integer", "bigint", "year"}
_STRING_TYPES = {
    "varchar", "char", "text", "tinytext", "mediumtext", "longtext",
    "enum", "set", "json", "time",
}
_BINARY_TYPES = {"blob", "tinyblob", "mediumblob", "longblob", "binary", "varbinary"}


def mysql_to_spark_type(decl: str) -> T.DataType:
    """Map a MySQL column type declaration to the Spark type the
    changelog envelope decodes into (`sources/changelog.py
    decode_image_value`). Integer families widen to LONG — the envelope
    is stringly and widening costs nothing, while a narrow guess
    overflows silently."""
    m = re.match(r"\s*([A-Za-z]+)\s*(?:\(\s*(\d+)(?:\s*,\s*(\d+))?\s*\))?", decl)
    if not m:
        raise UnsupportedDdl(f"unparseable type {decl!r}")
    base, p, s = m.group(1).lower(), m.group(2), m.group(3)
    if base == "tinyint" and p == "1":
        return T.BooleanType()
    if base in ("bool", "boolean"):
        return T.BooleanType()
    if base in _INT_TYPES:
        return T.LongType()
    if base in ("float", "double", "real"):
        return T.DoubleType()
    if base in ("decimal", "numeric"):
        return T.DecimalType(int(p or 10), int(s or 0))
    if base in ("datetime", "timestamp"):
        return T.TimestampNTZType()
    if base == "date":
        return T.DateType()
    if base in _STRING_TYPES:
        return T.StringType()
    if base in _BINARY_TYPES:
        return T.BinaryType()
    raise UnsupportedDdl(f"unmapped MySQL type {base!r}")


_INT_RANK = {T.ByteType: 1, T.ShortType: 2, T.IntegerType: 3, T.LongType: 4}
# max decimal digits an integer type can need (for int → DECIMAL)
_INT_DIGITS = {T.ByteType: 3, T.ShortType: 5, T.IntegerType: 10, T.LongType: 19}


def is_widening(src: T.DataType, dst: T.DataType) -> bool:
    """True when casting every ``src`` value through the stringly
    envelope into ``dst`` is lossless — the only type drifts capture
    may forward automatically (VERDICT r12 #4). Conservative by
    design: anything not provably lossless is False (the caller warns
    instead of guessing).

    - integer rank widening (TINYINT < SMALLINT < INT < BIGINT);
    - FLOAT → DOUBLE; integers up to INT → DOUBLE (exact below 2^53 —
      LONG → DOUBLE is NOT widening, values past 2^53 round);
    - integer → DECIMAL with enough integer digits;
    - DECIMAL(p1,s1) → DECIMAL(p2,s2) with p2-s2 ≥ p1-s1 and s2 ≥ s1;
    - any non-binary type → STRING (the envelope already proves the
      string form is faithful — binary is excluded because its
      envelope form is base64, not the value itself).
    """
    if src == dst:
        return False
    if isinstance(dst, T.StringType):
        return not isinstance(src, T.BinaryType)
    sr, dr = _INT_RANK.get(type(src)), _INT_RANK.get(type(dst))
    if sr is not None and dr is not None:
        return dr > sr
    if isinstance(dst, T.DoubleType):
        if isinstance(src, T.FloatType):
            return True
        return sr is not None and sr <= _INT_RANK[T.IntegerType]
    if isinstance(dst, T.DecimalType):
        if sr is not None:
            return dst.precision - dst.scale >= _INT_DIGITS[type(src)]
        if isinstance(src, T.DecimalType):
            return (
                dst.precision - dst.scale >= src.precision - src.scale
                and dst.scale >= src.scale
            )
    return False


def _parse_default(clause: str):
    """The DEFAULT literal of an ADD clause as a Python value, or None
    when absent (or explicitly NULL — same effect). Time-derived
    defaults are refused, not guessed (see _DEFAULT_RE note)."""
    m = _DEFAULT_RE.search(clause)
    if not m:
        return None
    lit = m.group(1)
    up = lit.upper()
    if up.startswith("CURRENT_TIMESTAMP") or up.startswith("NOW"):
        raise UnsupportedDdl(
            f"time-derived DEFAULT {lit!r}: existing-row backfill would "
            "need the source's DDL execution time, which replay cannot "
            "reproduce"
        )
    if up == "NULL":
        return None
    if up in ("TRUE", "FALSE"):
        return up == "TRUE"
    if lit.startswith("'"):
        return lit[1:-1].replace("''", "'")
    return float(lit) if "." in lit else int(lit)


def parse_alter(query: str):
    """Parse an ALTER TABLE statement into
    ``(table, [("add", name, type, default) | ("drop", name), ...])``.
    Returns ``None`` for non-ALTER DDL (CREATE/DROP TABLE/TRUNCATE are
    table-lifecycle events the materializer handles elsewhere)."""
    m = _ALTER_RE.match(query.strip().rstrip(";"))
    if not m:
        return None
    table = m.group(2) or m.group(1)
    actions = []
    # split multi-clause ALTER on top-level commas (type args hold no
    # commas except inside parens)
    depth, start, clauses = 0, 0, []
    body = m.group(3)
    for i, ch in enumerate(body):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            clauses.append(body[start:i])
            start = i + 1
    clauses.append(body[start:])
    for clause in (c.strip() for c in clauses):
        if not clause:
            continue
        if _UNSUPPORTED_RE.match(clause):
            raise UnsupportedDdl(f"unsupported ALTER clause {clause!r}")
        ren = _RENAME_COL_RE.match(clause)
        if ren and ren.group(1).upper() != "TO":
            actions.append(("rename", ren.group(1), ren.group(2), None))
            continue
        chg = _CHANGE_RE.match(clause)
        if chg:
            actions.append(
                ("rename", chg.group(1), chg.group(2),
                 mysql_to_spark_type(chg.group(3)))
            )
            continue
        add = _ADD_RE.match(clause)
        if add and add.group(1).lower() not in _NONCOLUMN:
            actions.append(
                (
                    "add",
                    add.group(1),
                    mysql_to_spark_type(add.group(2)),
                    _parse_default(clause),
                )
            )
            continue
        drop = _DROP_RE.match(clause)
        if drop and drop.group(1).lower() not in _NONCOLUMN:
            actions.append(("drop", drop.group(1)))
            continue
        # index/key/constraint clauses don't touch the row schema
    return table, actions


def evolve_schema(schema: T.StructType, query: str, table: str | None = None):
    """Apply an ALTER statement to ``schema``; returns the (possibly
    unchanged) schema. ``table`` filters cross-table DDL. Idempotent:
    re-adding an existing column or re-dropping a missing one is a no-op
    (redelivered DDL events must not error)."""
    parsed = parse_alter(query)
    if parsed is None:
        return schema
    target, actions = parsed
    if table is not None and target != table:
        return schema
    fields = list(schema.fields)
    names = {f.name for f in fields}
    for action in actions:
        if action[0] == "add" and action[1] not in names:
            fields.append(T.StructField(action[1], action[2]))
            names.add(action[1])
        elif action[0] == "drop" and action[1] in names:
            fields = [f for f in fields if f.name != action[1]]
            names.discard(action[1])
        elif action[0] == "rename" and action[1] in names:
            # in-place, position preserved; CHANGE re-declares the type
            old, new, dtype = action[1], action[2], action[3]
            fields = [
                T.StructField(new, dtype or f.dataType, f.nullable)
                if f.name == old
                else f
                for f in fields
            ]
            names.discard(old)
            names.add(new)
            # ("rename", old, NEW-already-present) is the redelivered
            # form: old absent → falls through as a no-op (idempotent)
    # compare (name, type): CHANGE a a BIGINT renames a→a with a new
    # type — a name-only comparison would silently drop the retype
    if [(f.name, f.dataType) for f in fields] == [
        (f.name, f.dataType) for f in schema.fields
    ]:
        return schema
    return T.StructType(fields)

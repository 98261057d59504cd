"""Aggregated query surface: import all operator modules (each module
registers its queries on import) and expose the driver-contract dicts.
"""

from __future__ import annotations

from ..operators import (  # noqa: F401  (registers on import)
    behavior,
    cdc,
    curation,
    dedup,
    graph,
    layout,
    linalg,
    multimodal,
    quality,
    relational,
    sampling,
    semistruct,
    similarity,
    skew,
    stats,
    text,
    timeseries,
    tpch,
    tpch_supply,
)

from .registry import ORACLE, QUERIES

__all__ = ["QUERIES", "ORACLE"]

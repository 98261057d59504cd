"""Property-based tests (hypothesis): GTID-set algebra laws and
filter-rule compiler equivalence — the SURVEY §5.5 strategy applied to
the two custom-logic kernels, where example tests can't cover the
input space."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from go_cdc_spark.functions.gtid import GtidSet
from go_cdc_spark.functions.rules import FilterPattern

UUIDS = st.sampled_from(["u1-0000", "u2-0000", "u3-0000"])
GNOS = st.integers(min_value=1, max_value=60)
EVENTS = st.lists(st.tuples(UUIDS, GNOS), max_size=40)


def _build(events: list[tuple[str, int]]) -> GtidSet:
    gs = GtidSet()
    for u, g in events:
        gs.add(u, g)
    return gs


@given(EVENTS)
def test_add_then_covers_exactly(events):
    """The set covers precisely the added (uuid, gno) pairs."""
    gs = _build(events)
    seen = set(events)
    for u in ("u1-0000", "u2-0000", "u3-0000"):
        for g in range(1, 62):
            assert gs.covers(u, g) == ((u, g) in seen)


@given(EVENTS)
def test_ranges_normalized(events):
    """Ranges are sorted, non-overlapping, non-adjacent (the reference's
    extend-else-append invariant, generalized to arbitrary arrival order)."""
    gs = _build(events)
    for ranges in gs.to_map().values():
        ranges = [tuple(int(x) for x in r.split("-")) for r in ranges]
        for (s1, e1), (s2, e2) in zip(ranges, ranges[1:]):
            assert e1 + 1 < s2, ranges  # gap strictly > adjacency
        assert all(s <= e for s, e in ranges)


@given(EVENTS)
def test_string_roundtrip(events):
    gs = _build(events)
    assert GtidSet.parse(str(gs)) == gs
    assert GtidSet.from_json(gs.to_json()) == gs


@given(EVENTS, EVENTS)
def test_union_is_lub(a, b):
    """union = least upper bound: contains both operands, is commutative,
    and covers exactly the union of events."""
    ga, gb = _build(a), _build(b)
    u = ga.union(gb)
    assert ga <= u and gb <= u
    assert u == gb.union(ga)
    seen = set(a) | set(b)
    for uu, g in seen:
        assert u.covers(uu, g)


@given(EVENTS)
def test_subset_reflexive_and_empty_bottom(events):
    gs = _build(events)
    assert gs <= gs
    assert GtidSet() <= gs


# --- filter rules: compiled Column ≡ python decision tree --------------

NAMES = st.sampled_from(["orders", "orders_2024", "tmp", "tmp_x", "users", "t"])
PATTERNS = st.lists(
    st.sampled_from(["orders", "orders_", "tmp_", "users", "t"]), max_size=3
)


@settings(max_examples=30, deadline=None)
@given(PATTERNS, PATTERNS, st.lists(NAMES, min_size=1, max_size=6, unique=True))
def test_rule_python_matches_compiled_column(spark, include, exclude, tables):
    pat = FilterPattern(include_tables=include, exclude_tables=exclude)
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(t,) for t in tables], ["tb"])
    got = {
        r.tb: bool(r.ok)
        for r in df.select("tb", pat.to_column(None, F.col("tb")).alias("ok")).collect()
    }
    want = {t: pat.allow("", t) for t in tables}
    assert got == want

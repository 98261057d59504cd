"""GTID-set algebra unit tests (SURVEY.md §5.3): round-trips, the
extend-vs-append branches of the reference's SetGTID
(`internal/model/gtid.go:58-72`), normalization, covers/containment."""

from __future__ import annotations

import pytest

from go_cdc_spark.functions.gtid import GtidSet

U1 = "3e11fa47-71ca-11e1-9e33-c80aa9429562"
U2 = "aaaaaaaa-bbbb-cccc-dddd-eeeeeeeeeeee"


def test_parse_str_roundtrip():
    s = f"{U1}:1-5:7-9,{U2}:3"
    g = GtidSet.parse(s)
    assert str(g) == s
    assert GtidSet.parse(str(g)) == g


def test_parse_single_and_empty():
    assert str(GtidSet.parse(f"{U1}:42")) == f"{U1}:42"
    assert str(GtidSet.parse("")) == ""
    assert GtidSet.parse("") == GtidSet()


def test_from_map_roundtrip():
    g = GtidSet.from_map({U1: ["1-5", "7-9"], U2: ["3-3"]})
    assert g.to_map() == {U1: ["1-5", "7-9"], U2: ["3-3"]}


def test_add_extends_last_range():
    g = GtidSet.parse(f"{U1}:1-5")
    g.add(U1, 6)
    assert str(g) == f"{U1}:1-6"


def test_add_appends_on_gap():
    g = GtidSet.parse(f"{U1}:1-5")
    g.add(U1, 8)
    assert str(g) == f"{U1}:1-5:8"


def test_add_new_uuid():
    g = GtidSet.parse(f"{U1}:1-5")
    g.add(U2, 1)
    assert g.covers(U2, 1)
    assert str(g) == f"{U1}:1-5,{U2}:1"


def test_add_duplicate_is_noop():
    # the reference would append an overlapping range here; we normalize
    g = GtidSet.parse(f"{U1}:1-5")
    g.add(U1, 3)
    assert str(g) == f"{U1}:1-5"


def test_add_fills_gap_and_coalesces():
    g = GtidSet.parse(f"{U1}:1-5:7-9")
    g.add(U1, 6)
    assert str(g) == f"{U1}:1-9"


def test_covers():
    g = GtidSet.parse(f"{U1}:1-5:7-9")
    assert g.covers(U1, 1) and g.covers(U1, 5) and g.covers(U1, 8)
    assert not g.covers(U1, 6)
    assert not g.covers(U1, 10)
    assert not g.covers(U2, 1)


def test_contains_set_and_le():
    big = GtidSet.parse(f"{U1}:1-10,{U2}:1-3")
    small = GtidSet.parse(f"{U1}:2-5,{U2}:3")
    assert big.contains_set(small)
    assert small <= big
    assert not big <= small


def test_union():
    a = GtidSet.parse(f"{U1}:1-5")
    b = GtidSet.parse(f"{U1}:4-9,{U2}:1")
    assert str(a.union(b)) == f"{U1}:1-9,{U2}:1"


def test_json_roundtrip():
    g = GtidSet.parse(f"{U1}:1-5:7-9,{U2}:3")
    assert GtidSet.from_json(g.to_json()) == g


def test_invalid_range_rejected():
    with pytest.raises(ValueError):
        GtidSet({U1: [(5, 1)]})


def test_gtid_covers_column(spark):
    from go_cdc_spark.functions.gtid import gtid_covers_column

    g = GtidSet.parse(f"{U1}:1-5:7-9")
    df = spark.createDataFrame(
        [(f"{U1}:3",), (f"{U1}:6",), (f"{U1}:8",), (f"{U2}:1",), (None,)],
        ["pos"],
    )
    got = [
        r.covered
        for r in df.select(
            gtid_covers_column(df.pos, g.to_json()).alias("covered")
        ).collect()
    ]
    assert got == [True, False, True, False, False]


def test_subtract_interval_arithmetic():
    a = GtidSet.parse("u1:1-10,u2:5-8")
    b = GtidSet.parse("u1:3-4:7,u3:1-9")
    d = a.subtract(b)
    assert str(d) == "u1:1-2:5-6:8-10,u2:5-8"
    # total overlap -> empty; empty - x -> empty
    assert str(a.subtract(a)) == ""
    assert str(GtidSet().subtract(a)) == ""
    # adjacent-but-disjoint stays whole
    assert str(GtidSet.parse("u1:5-9").subtract(GtidSet.parse("u1:1-4"))) == "u1:5-9"


def test_attach_check_resumable_and_purged():
    from go_cdc_spark.functions.gtid import PurgedBinlogError, attach_check

    watermark = GtidSet.parse("u1:1-100")
    executed = GtidSet.parse("u1:1-150")
    # purged range fully applied here -> resumable, to-read = the gap
    to_read = attach_check(watermark, executed, GtidSet.parse("u1:1-80"))
    assert str(to_read) == "u1:101-150"
    # source purged past our watermark -> refuse with the exact hole
    with pytest.raises(PurgedBinlogError) as ei:
        attach_check(watermark, executed, GtidSet.parse("u1:1-120"))
    assert str(ei.value.missing) == "u1:101-120"
    # no purged info -> plain difference
    assert str(attach_check(watermark, executed)) == "u1:101-150"

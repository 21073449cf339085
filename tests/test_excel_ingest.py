"""Excel ingest path (S1–S4, S13): xlsx_lite round-trip, discover →
sniff → read end-to-end on generated fixtures, tiered parallel read,
and input archival."""

from __future__ import annotations

import threading

import pytest

from train_reports_etl_spark.plans.schemas import HEADERS, TRAIN_LIST_HEADER
from train_reports_etl_spark.sinks.archival import archive_inputs
from train_reports_etl_spark.sources import xlsx_lite
from train_reports_etl_spark.sources.report_reader import (
    MIN_ROWS_PER_TASK,
    SheetRef,
    discover_reports,
    read_report,
    read_sheet_as_strings,
    tier_plan,
)
from train_reports_etl_spark.sources.sniffer import SniffResult


def test_xlsx_lite_roundtrip(tmp_path):
    rows = [
        ["a&b <c>", 1, 2.5, True, None, "tail"],
        [],  # entirely empty row must survive as a gap
        [None, "x"],
        ["", 0],
    ]
    path = xlsx_lite.write_xlsx(str(tmp_path / "t.xlsx"), {"S1": rows, "Später": [["ü"]]})
    assert xlsx_lite.sheet_names(path) == ["S1", "Später"]
    got = list(xlsx_lite.iter_rows(path, "S1"))
    assert got[0] == ["a&b <c>", 1, 2.5, True, None, "tail"]
    assert got[1] == []
    assert got[2] == [None, "x"]
    assert got[3] == ["", 0]
    assert list(xlsx_lite.iter_rows(path, "Später")) == [["ü"]]
    assert xlsx_lite.sheet_max_row(path, "S1") == 4
    # bounded range read (the S4 tier primitive)
    assert list(xlsx_lite.iter_rows(path, "S1", min_row=3, max_row=3)) == [[None, "x"]]


def _tl_fixture_rows(n=3):
    """Title + blank + exact header + n data rows (ticket Txxxx)."""
    width = len(TRAIN_LIST_HEADER)
    data = []
    for i in range(n):
        row = [""] * width
        row[TRAIN_LIST_HEADER.index("Departure Date")] = "2024-03-05 10:30:00"
        row[TRAIN_LIST_HEADER.index("Train Number")] = "AB123"
        row[TRAIN_LIST_HEADER.index("OD")] = "XX-YY"
        row[TRAIN_LIST_HEADER.index("Ticket Number")] = f"T{i:04d}"
        data.append(row)
    return [["Train List Report", None], [], list(TRAIN_LIST_HEADER)] + data


def test_discover_sniff_read_end_to_end(spark, tmp_path):
    xlsx_lite.write_xlsx(
        str(tmp_path / "march.xlsx"),
        {"TL": _tl_fixture_rows(3), "notes": [["not a report"], ["at all"]]},
    )
    xlsx_lite.write_xlsx(str(tmp_path / "occ.xlsx"), {"O": [list(HEADERS["occupancy_list_hist"])]})

    found = discover_reports(str(tmp_path))
    assert set(found) == {"train_list", "occupancy_list_hist"}
    [ref] = found["train_list"]
    assert ref.sheet == "TL" and ref.sniff.header_row == 2

    df = read_report(spark, found["train_list"])
    assert df.columns == list(TRAIN_LIST_HEADER)
    assert df.schema["Ticket Number"].dataType.simpleString() == "string"
    tickets = sorted(r["Ticket Number"] for r in df.collect())
    assert tickets == ["T0000", "T0001", "T0002"]


def test_read_sheet_tiered_matches_sequential(spark, tmp_path):
    # enough rows that tier_plan(min_rows_per_task=10) makes >1 tier
    rows = [["junk"], list(TRAIN_LIST_HEADER)] + [
        [f"v{i}"] + [""] * (len(TRAIN_LIST_HEADER) - 1) for i in range(50)
    ]
    path = xlsx_lite.write_xlsx(str(tmp_path / "big.xlsx"), {"TL": rows})
    ref = SheetRef(path, "TL", SniffResult("train_list", 1))
    df = read_sheet_as_strings(spark, ref, max_workers=4)
    vals = sorted(r[0] for r in df.select("Departure Date").collect())
    assert vals == sorted(f"v{i}" for i in range(50))
    assert df.count() == 50


def test_tier_plan_reference_constants():
    # below the 3000-row floor: a single tier
    assert tier_plan(2, 100) == [(2, 100)]
    # 9000 rows, 3 workers: three 3000-row tiers, exact disjoint cover
    tiers = tier_plan(1, 9000, max_workers=3)
    assert tiers == [(1, 3000), (3001, 6000), (6001, 9000)]
    # worker cap binds before the row floor on huge inputs
    tiers = tier_plan(1, 10 * MIN_ROWS_PER_TASK, max_workers=4)
    assert len(tiers) == 4
    # any plan covers the range exactly, in order, without overlap
    flat = [r for t in tiers for r in range(t[0], t[1] + 1)]
    assert flat == list(range(1, 10 * MIN_ROWS_PER_TASK + 1))
    assert tier_plan(5, 4) == []


def test_read_report_reads_sheets_concurrently(spark):
    """S4 probe: two reader calls must be in flight at once — a
    2-party barrier deadlocks (and times out) under sequential reads."""
    barrier = threading.Barrier(2, timeout=10)

    def reader(ref):
        barrier.wait()
        return spark.createDataFrame([(ref.sheet,)], ["s"])

    refs = [SheetRef("f", s, SniffResult("train_list", 0)) for s in ("a", "b")]
    out = read_report(spark, refs, reader=reader)
    assert sorted(r.s for r in out.collect()) == ["a", "b"]


def test_distributed_read_matches_driver_path(spark, tmp_path):
    """S4 executor path: `read_report_distributed` (tiers as RDD tasks
    via parallelize().flatMap) must produce the IDENTICAL frame as the
    driver-thread path on a multi-file, multi-sheet fixture with mixed
    headers, NULL gaps, and enough rows for multiple tiers per sheet."""
    from train_reports_etl_spark.sources.report_reader import read_report_distributed

    width = len(TRAIN_LIST_HEADER)

    def sheet_rows(tag, n):
        data = []
        for i in range(n):
            row = [f"{tag}{i}"] + [""] * (width - 1)
            row[2] = None  # NULL gap must survive the round trip
            data.append(row)
        return [["junk title"], list(TRAIN_LIST_HEADER)] + data

    p1 = xlsx_lite.write_xlsx(
        str(tmp_path / "a.xlsx"), {"S1": sheet_rows("a", 40), "S2": sheet_rows("b", 25)}
    )
    p2 = xlsx_lite.write_xlsx(str(tmp_path / "b.xlsx"), {"S1": sheet_rows("c", 10)})
    refs = [
        SheetRef(p1, "S1", SniffResult("train_list", 1)),
        SheetRef(p1, "S2", SniffResult("train_list", 1)),
        SheetRef(p2, "S1", SniffResult("train_list", 1)),
    ]
    # small min_rows_per_task so every sheet splits into several tiers
    dist = read_report_distributed(spark, refs, min_rows_per_task=8)
    drv = read_report(spark, refs, distributed=False)
    assert dist.columns == drv.columns == list(TRAIN_LIST_HEADER)
    assert dist.count() == 75
    assert dist.exceptAll(drv).count() == 0
    assert drv.exceptAll(dist).count() == 0
    # the executor path really fans out: one RDD partition per tier
    assert dist.rdd.getNumPartitions() >= 6

    # auto dispatch: multi-sheet refs take the executor path and agree
    auto = read_report(spark, refs)
    assert auto.exceptAll(drv).count() == 0 and auto.count() == 75


def test_distributed_read_mixed_headers_union_by_name(spark, tmp_path):
    """Sheets with different sniffed headers group into separate RDD
    jobs and union by name, matching the driver path's semantics."""
    from train_reports_etl_spark.sources.report_reader import read_report_distributed

    h1 = ["x", "y"]
    h2 = ["y", "x"]  # same names, different order → by-name union
    p = xlsx_lite.write_xlsx(
        str(tmp_path / "m.xlsx"),
        {
            "A": [h1] + [[f"ax{i}", f"ay{i}"] for i in range(5)],
            "B": [h2] + [[f"by{i}", f"bx{i}"] for i in range(4)],
        },
    )
    refs = [
        SheetRef(p, "A", SniffResult("t", 0)),
        SheetRef(p, "B", SniffResult("t", 0)),
    ]
    dist = read_report_distributed(spark, refs, min_rows_per_task=2)
    drv = read_report(spark, refs, distributed=False)
    assert sorted(dist.columns) == ["x", "y"]
    assert dist.exceptAll(drv).count() == 0
    assert drv.exceptAll(dist).count() == 0
    rows = {(r["x"], r["y"]) for r in dist.collect()}
    assert ("bx2", "by2") in rows and ("ax0", "ay0") in rows


def test_archive_inputs_moves_and_overwrites(tmp_path):
    src = tmp_path / "in"
    dest = tmp_path / "data"
    src.mkdir()
    f1 = src / "a.xlsx"
    f2 = src / "b.xlsx"
    f1.write_text("new-a")
    f2.write_text("new-b")
    dest.mkdir()
    (dest / "a.xlsx").write_text("stale")  # overwritten, as in the reference

    moved = archive_inputs([str(f1), str(f2), str(src / "missing.xlsx")], str(dest))
    assert sorted(moved) == [str(dest / "a.xlsx"), str(dest / "b.xlsx")]
    assert not f1.exists() and not f2.exists()
    assert (dest / "a.xlsx").read_text() == "new-a"
    # second call with already-moved sources is a no-op (idempotent)
    assert archive_inputs([str(f1)], str(dest)) == []


def test_ooxml_escape_sequences_roundtrip(tmp_path):
    """OOXML _xHHHH_ escaping (ECMA-376 §22.4.2.4): control chars and
    CR survive the write→read round trip, literal text that merely
    LOOKS like an escape is protected (_x005F_), and a file written by
    another tool with such escapes decodes correctly."""
    vals = [
        "bell\x07bs\x08",
        "cr\rlf\n tab\t",
        "_x0041_",          # literal text shaped like an escape — not an 'A'
        "_x005F_x0041_",    # pre-escaped literal
        "__x__", "_x12_", "_x12345_",  # near-misses stay untouched
    ]
    path = xlsx_lite.write_xlsx(str(tmp_path / "esc.xlsx"), {"S": [[v] for v in vals]})
    got = [r[0] for r in xlsx_lite.iter_rows(path, "S")]
    assert got == vals
    # decode path against foreign-written escapes
    from train_reports_etl_spark.sources.xlsx_lite import _ooxml_unescape

    assert _ooxml_unescape("a_x000D_b") == "a\rb"
    assert _ooxml_unescape("_x005F_x0041_") == "_x0041_"
    assert _ooxml_unescape("_x0041_") == "A"

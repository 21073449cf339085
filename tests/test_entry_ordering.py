"""Driver-window ordering of ``__spark_entry__.queries()``.

The driver's correctness gate only records the first ~50 entries of
``queries()``, so ordering is load-bearing: never-driver-checked
queries must lead, queries whose most recent driver attempt FAILED come
next (a fix shipped locally but the driver never re-confirmed — the
``w4_rolling_hour_window`` r03 scenario), and green queries follow,
stalest round first. No SparkSession needed — the priority function is
pure file parsing.
"""

from __future__ import annotations

import json

import __spark_entry__ as entry


def _write(tmp_path, rnd: int, rows: dict) -> None:
    (tmp_path / f"CORRECTNESS_r{rnd:02d}.json").write_text(json.dumps(rows))


GREEN = {"rows_match": True, "schema_match": True, "hash_match": True,
         "spark_rows": 1, "oracle_rows": 1, "err": None}
FAIL = {"rows_match": False, "schema_match": None, "hash_match": None,
        "spark_rows": None, "oracle_rows": None, "err": "boom"}
ROWS_ONLY = {"rows_match": None, "schema_match": None, "hash_match": None,
             "spark_rows": 4, "oracle_rows": None, "err": "no_oracle"}


def test_priority_tiers(tmp_path):
    _write(tmp_path, 2, {"old_green": GREEN, "failed_then_fixed": GREEN,
                         "rows_only": ROWS_ONLY})
    _write(tmp_path, 3, {"failed_then_fixed": FAIL, "fresh_green": GREEN})
    prio = entry._verification_priority(str(tmp_path))
    # Tier 1: last driver attempt failed (r03 FAIL outranks its r02 green).
    assert prio["failed_then_fixed"] == (1, 2)
    # Tier 2: green, keyed by last green round.
    assert prio["old_green"] == (2, 2)
    assert prio["fresh_green"] == (2, 3)
    # A completed rows-only (no_oracle) check counts as green — it must
    # not clog the window every round.
    assert prio["rows_only"] == (2, 2)
    # Never-checked queries (absent from the dict) sort before everything.
    never = (0, -1)
    assert never < prio["failed_then_fixed"] < prio["old_green"] < prio["fresh_green"]


def test_corrupt_artifact_files_are_skipped(tmp_path):
    """A torn/corrupt CORRECTNESS file degrades to 'skip that file',
    never to an exception or a poisoned ordering."""
    _write(tmp_path, 2, {"good": GREEN})
    (tmp_path / "CORRECTNESS_r03.json").write_text("{not json")
    (tmp_path / "CORRECTNESS_rXX.json").write_text("{}")  # no round number
    prio = entry._verification_priority(str(tmp_path))
    assert prio == {"good": (2, 2)}


def test_backlog_drain_progression(tmp_path):
    """Simulate the r05→r06 drain: once a synthetic r05 records the 50
    stalest never-checked names green, the next window's head must be
    exactly (remaining never-checked, then last-attempt-failed, then
    stale greens) — the guarantee the backlog plan rests on."""
    import re
    import shutil

    # start from the real committed artifacts
    here = entry.os.path.dirname(entry.os.path.abspath(entry.__file__))
    rounds = [0]
    for f in sorted(entry.__dict__["os"].listdir(here)):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", f)
        if m:
            shutil.copy(entry.os.path.join(here, f), tmp_path / f)
            rounds.append(int(m.group(1)))
    names = list(entry.queries())
    prio_now = entry._verification_priority(str(tmp_path))
    never_now = [n for n in names if n not in prio_now]
    window = never_now[:50]
    # synthetic NEXT round (max existing + 1): a hard-coded number
    # would clobber the copy of a real artifact once that round lands
    _write(tmp_path, max(rounds) + 1, {n: GREEN for n in window})
    prio_after = entry._verification_priority(str(tmp_path))
    never = (0, -1)
    reordered = sorted(names, key=lambda n: prio_after.get(n, never))
    leftover = [n for n in never_now if n not in window]
    # r06 head: the 18 still-never-checked, then every query whose last
    # attempt failed (w4_rolling_hour_window), before any green query
    assert reordered[: len(leftover)] == leftover
    failed = [n for n in names if prio_after.get(n, never)[0] == 1]
    assert "w4_rolling_hour_window" in failed or prio_after.get(
        "w4_rolling_hour_window", never
    )[0] == 2  # already re-verified in a real window by then
    n_head = len(leftover) + len(failed)
    assert set(reordered[len(leftover): n_head]) == set(failed)
    assert n_head <= 50, "the r06 window must cover the whole backlog"


def test_queries_order_matches_committed_artifacts():
    names = list(entry.queries())
    prio = entry._verification_priority()
    never = (0, -1)
    keys = [prio.get(n, never) for n in names]
    assert keys == sorted(keys), "queries() must be sorted by verification priority"
    assert set(names) == set(entry.__dict__["registry"].QUERIES)


def test_oracle_keys_subset_of_queries():
    q, o = entry.queries(), entry.oracle_sql()
    assert set(o) <= set(q)

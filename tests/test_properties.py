"""Property-based tests (hypothesis) for the scalar layer: instead of
golden examples, assert the INVARIANTS the pipelines rely on, over
generated inputs. One Spark job per hypothesis example is too slow, so
each example is a BATCH of strings compared against a driver-side
Python model of the reference semantics."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from train_reports_etl_spark.functions import blank_to_null, clean_phone, coerce_double

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# Strings that stress the coercion paths: numbers, junk, blanks,
# unicode, and — deliberately, after the round-9 F2 find — the whole
# Java Double.parseDouble lenience class (type-suffixed literals, hex
# floats, Infinity spellings) that pd.to_numeric / DuckDB TRY_CAST
# reject but an ungated Spark cast would accept.
weird_text = st.one_of(
    st.text(max_size=20),
    st.from_regex(r"-?[0-9]{1,10}(\.[0-9]{1,8})?", fullmatch=True),
    st.from_regex(r"[+-]?[0-9]{1,6}(\.[0-9]{0,4})?[dDfFlL]", fullmatch=True),
    st.from_regex(r"0[xX][0-9a-fA-F]{1,6}(\.[0-9a-fA-F]{1,4})?([pP][+-]?[0-9]{1,2})?", fullmatch=True),
    st.sampled_from([
        "", " ", "  ", "\t", "NaN", "null", "1e309", "-", "+", "1e3",
        "0d", "1f", "2D", "3F", "12.5d", "7l", "8L", "0x1.8p1",
        "Infinity", "-Infinity", "+Infinity", "infinityd",
        " 12.5 ", "1.", ".5", "1.e3", "+.5e-2", "1_000", "+-1",
    ]),
)


@given(st.lists(weird_text, min_size=1, max_size=150))
@settings(**SETTINGS)
def test_coerce_double_matches_float_model(spark, xs):
    """F2 invariant: parses exactly when Python float() does (modulo
    Spark's stricter rejection of inf-y literals), NULL otherwise —
    never an error, on any session."""
    df = spark.createDataFrame([(x,) for x in xs], ["v"])
    got = [r.d for r in df.select(coerce_double("v").alias("d")).collect()]
    for x, g in zip(xs, got):
        try:
            expect = float(x)
        except ValueError:
            assert g is None, (x, g)
            continue
        if expect != expect or expect in (float("inf"), float("-inf")):
            continue  # NaN/inf spellings: engine-specific acceptance
        if g is not None:
            assert abs(g - expect) < 1e-9 or g == expect, (x, g, expect)


@given(st.lists(weird_text, min_size=1, max_size=150))
@settings(**SETTINGS)
def test_blank_to_null_iff_trim_empty(spark, xs):
    """F10 invariant: NULL exactly when the value is empty after
    SPACE-trim — the contract both engines share (Spark `trim` and
    DuckDB `TRIM` strip only ASCII 0x20; Python's str.strip() also
    strips \\r\\t\\n, which is NOT the reference semantic — the
    reference replaces only "" and " ", `reports_exporter_v0.83.py:
    997-998`). Every non-blank value passes through unchanged."""
    df = spark.createDataFrame([(x,) for x in xs], ["v"])
    got = [r.o for r in df.select(blank_to_null("v").alias("o")).collect()]
    for x, g in zip(xs, got):
        if x.strip(" ") == "":
            assert g is None, (x, g)
        else:
            assert g == x, (x, g)


@given(
    st.lists(
        st.tuples(
            st.from_regex(r"(\+?[0-9]{1,3})?", fullmatch=True),
            st.from_regex(r"[\+0-9\- ]{0,20}", fullmatch=True),
        ),
        min_size=1,
        max_size=100,
    )
)
@settings(**SETTINGS)
def test_clean_phone_invariants(spark, rows):
    """X1 invariants: output ≤ 14 chars, contains no '-', and is a
    fixpoint (cleaning a cleaned number with the same prefix changes
    nothing further when the prefix no longer matches)."""
    df = spark.createDataFrame(rows, ["prefix", "tel"])
    out = df.select(
        "prefix", "tel", clean_phone(F.col("tel"), F.col("prefix")).alias("c")
    )
    for r in out.collect():
        if r.c is None:
            continue
        assert len(r.c) <= 14, r
        assert "-" not in r.c, r


@given(
    st.lists(
        st.datetimes(
            min_value=dt.datetime(1990, 1, 1), max_value=dt.datetime(2099, 12, 31)
        ),
        min_size=1,
        max_size=100,
    )
)
@settings(**SETTINGS)
def test_coerce_timestamp_roundtrips_valid(spark, ts):
    """F1 invariant: every %Y-%m-%d %H:%M:%S rendering parses back to
    the same wall-clock instant (the reference's to_datetime format)."""
    from train_reports_etl_spark.functions import coerce_timestamp

    xs = [t.replace(microsecond=0) for t in ts]
    df = spark.createDataFrame(
        [(t.strftime("%Y-%m-%d %H:%M:%S"), t) for t in xs], ["s", "expect"]
    )
    bad = df.filter(
        coerce_timestamp("s").isNull()
        | (coerce_timestamp("s") != F.col("expect"))
    ).count()
    assert bad == 0


# ------------------------------------------------------- CDC replay

# A changelog is a list of (key, seq, op, payload). The Python model
# replays it per key: entry with the highest (seq, op) wins (op desc
# breaks seq ties deterministically — D < I < U lexicographically, so
# U beats D at equal seq, matching latest_change_per_key); a winning
# non-delete upserts, a winning delete removes.
_ops = st.sampled_from(["I", "U", "D"])
changelog_entries = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),   # key (collides often)
        st.integers(min_value=0, max_value=9),   # seq (ties possible)
        _ops,
    ),
    min_size=0,
    max_size=25,
)


@given(changelog_entries)
@settings(**SETTINGS)
def test_cdc_apply_matches_python_replay(spark, entries):
    from train_reports_etl_spark.operators.cdc import apply_changelog

    base_rows = [(k, f"base{k}") for k in range(4)]
    base = spark.createDataFrame(base_rows, "doc_id long, text string")
    expected = dict(base_rows)
    winners: dict[int, tuple[int, str]] = {}
    # payload is a FUNCTION of (seq, op): duplicate (key, seq, op)
    # entries then carry identical payloads, so the keep-last window's
    # arbitrary choice among exact ties cannot diverge from the model
    for k, seq, op in entries:
        cand = (seq, op)
        if k not in winners or cand > winners[k]:
            winners[k] = cand
    for k, (seq, op) in winners.items():
        if op == "D":
            expected.pop(k, None)
        else:
            expected[k] = f"p{seq}{op}"
    if entries:
        ch = spark.createDataFrame(
            [(k, f"p{s}{o}", s, o) for k, s, o in entries],
            "doc_id long, text string, seq int, op string",
        )
    else:
        ch = spark.createDataFrame([], "doc_id long, text string, seq int, op string")
    got = {
        r.doc_id: r.text
        for r in apply_changelog(base, ch, ["doc_id"]).collect()
    }
    assert got == expected


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_000_00),  # price cents
            st.integers(min_value=0, max_value=10),  # discount %
        ),
        min_size=1,
        max_size=100,
    )
)
@settings(**SETTINGS)
def test_rev_centicents_is_exact_integer_arithmetic(spark, rows):
    """The TPC-H revenue canonicalization invariant: for any 2-dp price
    and whole-percent discount, cents × (100 − disc%) recovered from
    the DOUBLE columns equals the pure-integer model exactly — no
    half-cent drift, no float accumulation, at any row order."""
    from train_reports_etl_spark.extensions.ext_queries import _rev_centicents

    df = spark.createDataFrame(
        [(c / 100.0, d / 100.0) for c, d in rows],
        "l_extendedprice double, l_discount double",
    )
    got = df.agg(F.sum(_rev_centicents()).alias("s")).head()[0]
    assert got == sum(c * (100 - d) for c, d in rows)


@given(
    st.lists(
        st.lists(
            st.floats(min_value=-2.0, max_value=2.0, allow_nan=False, width=32),
            min_size=8,
            max_size=8,
        ),
        min_size=1,
        max_size=12,
    )
)
@settings(**SETTINGS)
def test_pq_adc_equals_distance_to_reconstruction(spark, vecs):
    """The ADC identity: because the subspaces partition the
    coordinates, the summed per-subspace lookup distances equal
    −2·q·v̂ + |v̂|² against the RECONSTRUCTED vector v̂ (codes decoded
    back to centroids) — ADC is exact FOR THE QUANTIZED POINT, the
    property the FAISS cascade relies on. Checked against a driver-
    side Python model within float-regrouping tolerance."""
    from train_reports_etl_spark.extensions.similarity import (
        pq_adc_topk,
        pq_codebooks,
        pq_encode,
    )

    books = pq_codebooks(m=2, sub_dim=4, k=3, seed=7)
    q = [0.25, -1.0, 0.5, 2.0, -0.75, 1.5, 0.0, -2.0]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    codes = {r.vec_id: (r.code_0, r.code_1) for r in pq_encode(df, books).collect()}
    adc = {
        r.vec_id: r.approx_l2
        for r in pq_adc_topk(df, q, books, k=len(vecs)).collect()
    }
    for i in range(len(vecs)):
        recon = books[0][codes[i][0]] + books[1][codes[i][1]]
        expect = -2.0 * sum(a * b for a, b in zip(q, recon)) + sum(
            x * x for x in recon
        )
        assert abs(adc[i] - expect) < 1e-9


# COPY CSV round-trip: any mix of None / text (quotes, commas, CR/LF,
# unicode, leading/trailing space) must survive encode → parse exactly,
# with None (unquoted empty) never conflated with "" (quoted empty).
copy_field = st.one_of(
    st.none(),
    st.text(max_size=30),
    st.sampled_from(['', '"', '""', ',', '\r\n', '\n', 'a,"b"\r\nc', ' x ']),
)


@given(st.lists(st.lists(copy_field, min_size=1, max_size=5), min_size=0, max_size=40))
@settings(max_examples=300, deadline=None)  # pure Python — no Spark-job budget
def test_copy_csv_encode_parse_roundtrip(rows):
    """S9 invariant: tests/pg_loopback.parse_copy_csv is the exact
    inverse of jdbc_copy.encode_csv_rows (no Spark job needed)."""
    from tests.pg_loopback import parse_copy_csv
    from train_reports_etl_spark.sinks.jdbc_copy import encode_csv_rows

    text, n = encode_csv_rows(iter([tuple(r) for r in rows]))
    assert n == len(rows)
    parsed = parse_copy_csv(text)
    expect = [[None if v is None else str(v) for v in r] for r in rows]
    assert parsed == expect


# Typed COPY round-trip: Python values → encode_csv_rows (what the
# executor streams) → parse_copy_csv → coerce_pg_value per declared
# type must recover the ORIGINAL typed values — the full server-side
# conversion path the loopback double now enforces for S9.
_typed_row = st.tuples(
    st.integers(min_value=-(2**63), max_value=2**63 - 1),  # bigint
    st.decimals(min_value=-(10**8), max_value=10**8, places=2),  # numeric(12,2)
    st.booleans(),
    st.dates(),
    st.one_of(st.none(), st.text(max_size=20).filter(lambda s: "\x00" not in s)),
)


@given(st.lists(_typed_row, min_size=0, max_size=25))
@settings(max_examples=200, deadline=None)  # pure Python — no Spark-job budget
def test_copy_typed_coercion_roundtrip(rows):
    """S9 invariant: server-side COPY input conversion inverts the CSV
    encoding for every declared type (int/numeric/bool/date/text)."""
    from tests.pg_loopback import coerce_pg_value, parse_copy_csv
    from train_reports_etl_spark.sinks.jdbc_copy import encode_csv_rows

    types = ["bigint", "numeric(12,2)", "boolean", "date", "text"]
    text, n = encode_csv_rows(iter(rows))
    assert n == len(rows)
    parsed = parse_copy_csv(text)
    assert len(parsed) == len(rows)
    for want, raw in zip(rows, parsed):
        got = tuple(
            coerce_pg_value(v, t, c) for v, t, c in zip(raw, types, "abcde")
        )
        assert got == want


# xlsx round-trip: the stdlib OOXML writer/reader pair must preserve
# strings (XML-escaping, whitespace, unicode), ints, floats, bools and
# None gaps exactly, for any sheet shape.
xlsx_cell = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(10**12), max_value=10**12),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.text(max_size=25),
    st.sampled_from([
        "a&b <c> \"d\" 'e'", "  leading/trailing  ", "line\nbreak", "ü✓漢",
        # OOXML escape-convention stress: literal escape shapes and the
        # control chars / CR that must store as _xHHHH_
        "_x0041_", "_x005F_x0041_", "_x005F_", "bell\x07", "cr\rcrlf\r\n",
    ]),
)


@given(st.lists(st.lists(xlsx_cell, min_size=0, max_size=6), min_size=0, max_size=12))
@settings(max_examples=60, deadline=None)  # pure Python — no Spark-job budget
def test_xlsx_lite_write_read_roundtrip(tmp_path_factory, rows):
    """S1/S3 invariant: xlsx_lite.iter_rows(write_xlsx(rows)) == rows,
    modulo the format's own trailing-None truncation per row."""
    from train_reports_etl_spark.sources import xlsx_lite

    path = str(tmp_path_factory.mktemp("xlsx") / "t.xlsx")
    xlsx_lite.write_xlsx(path, {"S": rows})
    got = list(xlsx_lite.iter_rows(path, "S"))
    assert len(got) == len(rows)
    for want, have in zip(rows, got):
        # a row's trailing None cells have no stored cell at all, so the
        # reader cannot know they existed: compare after rstripping None
        trimmed = list(want)
        while trimmed and trimmed[-1] is None:
            trimmed.pop()
        assert have == trimmed

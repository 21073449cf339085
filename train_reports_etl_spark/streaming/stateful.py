"""Custom stateful streaming operators (E5/E1 streaming variants) via
``applyInPandasWithState`` — Arrow-batched per-key state with timeouts.

These cover semantics Spark's built-in streaming operators cannot
express declaratively:

- **Cross-batch first-seen dedup** (:func:`streaming_dedup_first_seen`)
  — ``dropDuplicates`` on a stream keeps *unbounded* state unless a
  watermark column is part of the key; this operator keeps exactly one
  boolean per key and expires it on an event-time timeout, which is the
  shape you want for "emit each document id once within a horizon" on a
  100 TB ingest feed. The reference's analogue is W1 keep-*last* dedup
  (SURVEY.md §2.5, reports_exporter_v0.83.py:1752-1787) — streaming
  must keep *first* (an already-emitted row cannot be retracted in
  append mode), which is the standard streaming restatement.
- **Custom sessionizer** (:func:`streaming_sessionize`) — like
  ``session_window`` but with per-session custom payload (first/last
  ts, event count, value sum) emitted ONLY when the session closes
  (event-time gap timeout), i.e. exactly-once session records with no
  partial emissions. Built-in session_window in append mode gives the
  same closure semantics but cannot carry arbitrary Python state;
  this is the template for "novel stateful operator" extensions.

Scale notes: state lives in the executor state store partitioned by
``groupBy`` key — the shuffle is one row per incoming event keyed by
the dedup/session key, state size is O(live keys). Timeouts bound the
store: a key whose watermark horizon passed is dropped, so state does
not grow with stream length. Arrow moves each key-group's rows to
Python in one batch (vs row-at-a-time UDS traffic).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

__all__ = [
    "streaming_dedup_first_seen",
    "streaming_hll_session_distinct",
    "streaming_sessionize",
    "streaming_dedup_within_watermark",
]


_DEDUP_STATE = StructType(
    [
        StructField("seen", LongType(), True),
        # newest event-time seen for the key (epoch ms): the timeout
        # anchor. Persisted so an all-null-ts batch can re-arm from
        # the CONTRACT anchor (newest + horizon) instead of the
        # current watermark, which could expire state early (duplicate
        # re-emitted as "first") or retain it too long.
        #
        # STATE-SCHEMA CHANGE (round 7): this field did not exist in
        # the original single-field ``(seen,)`` layout. A query
        # restarted from a checkpoint written under the old layout is
        # handled two ways: Spark's state-store schema validation
        # normally rejects the mismatch at restart (the loud path),
        # and if a store lets a short tuple through,
        # :func:`_stored_newest_ms` tolerates it (treats the missing
        # anchor as unknown → falls back to the watermark bound)
        # instead of raising IndexError mid-batch.
        StructField("newest_ms", LongType(), True),
    ]
)


def _stored_newest_ms(state: "GroupState") -> int:
    """Newest-event anchor from persisted state, tolerant of the
    pre-round-7 single-field ``(seen,)`` layout (checkpoint restored
    across the schema change) and of a null field: returns 0 when no
    anchor is known, which every caller already maxes against the
    current watermark."""
    stored = state.get
    return (stored[1] if len(stored) > 1 else None) or 0


def streaming_dedup_first_seen(
    stream: DataFrame,
    key_col: str = "event_id",
    ts_col: str = "ts",
    watermark: str = "1 hour",
    horizon_ms: int = 3_600_000,
) -> DataFrame:
    """E1 streaming — emit the first event per ``key_col``; duplicates
    arriving later (same or subsequent micro-batches) are dropped.

    State per key: one marker row, expired ``horizon_ms`` past the
    watermark so the store stays bounded. Output schema = (key, ts,
    n_dups_in_batch) where n_dups_in_batch counts suppressed rows of
    the emitting batch (0 for a clean first sight). The ``key`` field
    mirrors the input column's type (string keys work, not just long).
    """
    out_schema = StructType(
        [
            StructField("key", stream.schema[key_col].dataType, False),
            StructField("first_ts", TimestampType(), True),
            StructField("n_dups_in_batch", LongType(), False),
        ]
    )

    def dedup(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        # NULL event-times can't interact with the watermark and NaT
        # poisons idxmin/.value — drop them (same policy as the
        # sessionizer); an all-null batch keeps existing state armed
        rows = pd.concat(list(pdfs), ignore_index=True).dropna(subset=[ts_col])
        if rows.empty:
            if state.exists:
                # re-arm from the PERSISTED newest-event anchor, not
                # the watermark: wm + horizon can sit BEFORE newest +
                # horizon (early expiry → duplicate re-emitted as
                # "first") or after it (over-retention)
                stored_newest = _stored_newest_ms(state)
                state.setTimeoutTimestamp(
                    max(
                        stored_newest + horizon_ms,
                        state.getCurrentWatermarkMs() + 1,
                    )
                )
            return
        already = state.exists
        batch_newest = int(rows[ts_col].max().value // 1_000_000)
        newest_ms = (
            max(batch_newest, _stored_newest_ms(state)) if already else batch_newest
        )
        if not already:
            first = rows.loc[rows[ts_col].idxmin()]
            yield pd.DataFrame(
                {
                    "key": [key[0]],
                    "first_ts": [first[ts_col]],
                    "n_dups_in_batch": [len(rows) - 1],
                }
            )
        state.update((1, newest_ms))
        # expire `horizon_ms` past the newest event for this key; the
        # watermark of THIS batch is only published to the next one, so
        # anchoring on getCurrentWatermarkMs() (previous batch; 0 on the
        # first) would expire state the moment real 20xx timestamps
        # arrive. Must still exceed the current watermark to be legal.
        state.setTimeoutTimestamp(
            max(newest_ms + horizon_ms, state.getCurrentWatermarkMs() + 1)
        )

    return (
        # prune to (key, ts) BEFORE the stateful shuffle: every other
        # column would otherwise ride the shuffle and the Arrow
        # transfer into Python for nothing
        stream.select(key_col, ts_col)
        .withWatermark(ts_col, watermark)
        .groupBy(F.col(key_col))
        .applyInPandasWithState(
            dedup,
            outputStructType=out_schema,
            stateStructType=_DEDUP_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


_SESSION_STATE = StructType(
    [
        StructField("start_us", LongType(), True),
        StructField("end_us", LongType(), True),
        StructField("n_events", LongType(), True),
        StructField("sum_value", StringType(), True),  # repr'd int/double: exact restore
    ]
)


def streaming_sessionize(
    stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap_ms: int = 1_800_000,
    watermark: str = "30 minutes",
) -> DataFrame:
    """E5 streaming — custom stateful sessionizer: per-key sessions
    closed after ``gap_ms`` of event-time silence, emitted exactly once
    at closure with (start, end, n_events, sum_value).

    A session's state is (start, last-event, count, sum); each batch
    folds its rows in event order, closing+emitting whenever the gap
    between consecutive events exceeds ``gap_ms``; the trailing open
    session closes via event-time timeout when the watermark passes
    last_event + gap.

    The value fold PRESERVES the input column's numeric class: an
    integral ``value_col`` (e.g. exact cents) accumulates in int64 and
    emits ``sum_value`` as LongType — exact at any corpus scale, same
    policy as every other integer-cents aggregate — while a float
    column keeps the double fold (exact only below 2^53 partial sums,
    inherent to floats).
    """
    from pyspark.sql.types import ByteType, IntegerType, ShortType

    integral = value_col in stream.columns and isinstance(
        stream.schema[value_col].dataType,
        (LongType, IntegerType, ShortType, ByteType),
    )
    # parse restores the repr'd state string; acc is the pandas fold dtype
    parse = int if integral else float
    acc_dtype = "int64" if integral else float
    out_schema = StructType(
        [
            StructField("key", stream.schema[key_col].dataType, False),
            StructField("session_start", TimestampType(), True),
            StructField("session_end", TimestampType(), True),
            StructField("n_events", LongType(), False),
            StructField("sum_value", LongType() if integral else DoubleType(), False),
        ]
    )

    gap_us = gap_ms * 1000

    # state keeps microseconds: emitted timestamps round-trip the
    # source's micros exactly (ms would silently truncate)
    def emit(key: Any, st: tuple[int, int, int, "int | float"]) -> pd.DataFrame:
        start_us, end_us, n, sv = st
        return pd.DataFrame(
            {
                "key": [key],
                "session_start": [pd.Timestamp(start_us, unit="us")],
                "session_end": [pd.Timestamp(end_us, unit="us")],
                "n_events": [n],
                # raw fold result — round at the query layer only
                # (order-sensitive when float, see verify gotchas)
                "sum_value": [sv],
            }
        )

    def sessionize(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            if state.exists:
                s, e, n, sv = state.get
                yield emit(key[0], (s, e, n, parse(sv)))
            state.remove()
            return
        # drop NULL event-times BEFORE the int64 cast (NaT raises on
        # astype, killing the query — same crash class as NaN values):
        # a null-ts event belongs to no session, matching SQL
        # session_window semantics which exclude null event times
        rows = (
            pd.concat(list(pdfs), ignore_index=True)
            .dropna(subset=[ts_col])
            .sort_values(ts_col)
        )
        if rows.empty:
            if state.exists:  # all-null batch: keep the open session armed
                s, e, n, sv = state.get
                state.setTimeoutTimestamp(
                    max(e // 1000 + gap_ms, state.getCurrentWatermarkMs() + 1)
                )
            return
        # vectorized in-batch fold (iterrows measured ~10× slower on a
        # 600k-row batch): gap boundaries → cumsum session ids →
        # groupby aggregate; the open previous session merges into the
        # first group when the batch's first event continues it.
        ts_us = rows[ts_col].astype("int64") // 1_000
        # The integral path's NULLs are coalesced to 0 JVM-side (see
        # the select below) so the column crosses Arrow as real int64 —
        # a nullable int64 arrives as float64-with-NaN, which would
        # both crash .astype("int64") AND round values above 2^53
        # before Python could repair them. fillna(0) remains for the
        # float path (and as a no-op guard): null-as-zero matches SQL
        # SUM's ignore-NULLs semantics.
        vals = (
            rows[value_col].fillna(0).astype(acc_dtype)
            if value_col in rows.columns
            else pd.Series(0.0, index=rows.index)
        )
        new_sess = ts_us.diff().gt(gap_us)
        new_sess.iloc[0] = True
        sess_id = new_sess.cumsum()
        agg = pd.DataFrame(
            {"s": ts_us, "e": ts_us, "n": 1, "sv": vals}
        ).groupby(sess_id.values).agg({"s": "min", "e": "max", "n": "sum", "sv": "sum"})
        sessions = list(agg.itertuples(index=False, name=None))
        if state.exists:
            ps, pe, pn, psv = state.get
            if sessions and sessions[0][0] - pe <= gap_us:
                s0, e0, n0, sv0 = sessions[0]
                sessions[0] = (ps, max(pe, e0), pn + n0, parse(psv) + sv0)
            else:
                sessions.insert(0, (ps, pe, pn, parse(psv)))
        closed = sessions[:-1]
        if closed:
            ss, es, ns, svs = zip(*closed)
            yield pd.DataFrame(
                {
                    "key": [key[0]] * len(closed),
                    "session_start": pd.to_datetime(pd.Series(ss), unit="us"),
                    "session_end": pd.to_datetime(pd.Series(es), unit="us"),
                    "n_events": list(ns),
                    "sum_value": list(svs),
                }
            )
        cur = sessions[-1]
        # parse() first: numpy 2 reprs np.int64(5) as "np.int64(5)",
        # which the restore-side int()/float() cannot read — a Python
        # scalar reprs exactly on both numeric classes
        state.update((cur[0], cur[1], cur[2], repr(parse(cur[3]))))
        # timeout must be strictly beyond the current watermark (ms API)
        state.setTimeoutTimestamp(
            max(cur[1] // 1000 + gap_ms, state.getCurrentWatermarkMs() + 1)
        )

    cols = [F.col(key_col), F.col(ts_col)]
    if value_col in stream.columns:
        if integral:
            # NULL→0 JVM-side, BEFORE Arrow: a nullable int64 column
            # crosses Arrow→pandas as float64-with-NaN, so any value
            # above 2^53 in a batch that also carries a NULL would
            # silently lose precision before the Python fillna could
            # see it. Coalescing here keeps the column non-nullable
            # int64 end to end (null-as-zero is the documented SUM
            # semantics either way).
            cols.append(
                F.coalesce(F.col(value_col), F.lit(0)).cast("long").alias(value_col)
            )
        else:
            cols.append(F.col(value_col))
    return (
        # prune to (key, ts, value) before the stateful shuffle/Arrow
        stream.select(*cols)
        .withWatermark(ts_col, watermark)
        .groupBy(F.col(key_col))
        .applyInPandasWithState(
            sessionize,
            outputStructType=out_schema,
            stateStructType=_SESSION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def streaming_dedup_within_watermark(
    stream: DataFrame,
    key_cols: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """E1 streaming — the *native* bounded-state dedup:
    ``dropDuplicatesWithinWatermark`` keeps one state entry per key and
    expires it once the watermark passes the key's last-seen event
    time, without requiring the event-time column inside the dedup key
    (plain ``dropDuplicates`` on a stream either keys on the timestamp
    — so re-sends with a different ts are NOT dups — or keeps
    unbounded state).

    Complements :func:`streaming_dedup_first_seen`: use this when
    "duplicate" means same key within the watermark horizon and no
    custom per-key payload is needed — pure JVM state, no Python
    worker in the loop. State is O(live keys); the shuffle is one row
    per event keyed by ``key_cols``.
    """
    keys = key_cols or ["event_id"]
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


_HLL_WINDOW_STATE = StructType(
    [
        StructField("start_us", LongType(), True),
        StructField("last_us", LongType(), True),
        # sparse register list "bucket:rho,bucket:rho" sorted by bucket
        StructField("registers", StringType(), True),
    ]
)


def _hll_parts_py(elem: str) -> tuple[int, int]:
    """Python twin of sketches.hll_parts_sql — same md5 nibble layout
    (bucket = first 2 nibbles, w = next 13, rho = 53 - bitlength(w)),
    so the streaming registers are bit-identical to the batch/oracle
    register tables by construction."""
    import hashlib

    h = hashlib.md5(elem.encode()).hexdigest()
    bucket = int(h[0], 16) * 16 + int(h[1], 16)
    w = int(h[2:15], 16)
    rho = 53 if w == 0 else 53 - w.bit_length()
    return bucket, rho


def streaming_hll_session_distinct(
    stream: DataFrame,
    key_col: str = "user_id",
    elem_col: str = "event_type",
    ts_col: str = "ts",
    gap_ms: int = 1_800_000,
    watermark: str = "30 minutes",
) -> DataFrame:
    """E85 — per-activity-window APPROXIMATE-DISTINCT as stream state:
    for each key, maintain HyperLogLog registers over ``elem_col``
    within the current activity window (same 30-min-gap session
    semantics as :func:`streaming_sessionize`); when the window closes
    — an in-batch gap, or the event-time timeout for trailing windows
    — emit the window's SPARSE REGISTER ROWS ``(key, session_start,
    session_end, bucket, rho)``.

    This is the streaming-safe distinct: per-key state is ≤ m = 256
    register bytes-worth NO MATTER how many distinct elements the
    window sees (a streaming ``COUNT(DISTINCT url)`` per session would
    buffer every url — unbounded; dropDuplicates state grows with
    cardinality). Emitting REGISTERS, not an estimate, keeps two
    properties: the output is integer-exact (strong oracle — the
    Python nibble math is the verbatim twin of
    ``sketches.hll_parts_sql``, and the emitted table equals the batch
    per-session register aggregation bit-for-bit), and downstream can
    MERGE windows by ``groupBy(bucket).max(rho)`` (the E13/E27 rollup
    law) before estimating via ``hll_estimate_from_registers``.

    Oracle contract mirrors the sessionizer: with no-data micro-batches
    disabled, emissions are exactly "every window closed by an in-batch
    gap" = all but each key's last window (SQL-expressible); the
    timeout-driven trailing flush is pinned by tests, not the oracle.

    Scale: the shuffle is one row per event keyed by ``key_col``; state
    per live key is one bounded register string; timeouts expire idle
    keys, so the store is O(live keys · m), independent of stream
    length and element cardinality.
    """
    out_schema = StructType(
        [
            StructField("key", stream.schema[key_col].dataType, False),
            StructField("session_start", TimestampType(), True),
            StructField("session_end", TimestampType(), True),
            StructField("bucket", LongType(), False),
            StructField("rho", LongType(), False),
        ]
    )

    def _decode(s: str) -> dict[int, int]:
        if not s:
            return {}
        return {
            int(b): int(r)
            for b, r in (pair.split(":") for pair in s.split(","))
        }

    def _encode(regs: dict[int, int]) -> str:
        return ",".join(f"{b}:{regs[b]}" for b in sorted(regs))

    def _emit_frame(key: Any, start_us: int, end_us: int, regs: dict[int, int]):
        buckets = sorted(regs)
        return pd.DataFrame(
            {
                "key": [key] * len(buckets),
                "session_start": [pd.Timestamp(start_us, unit="us")] * len(buckets),
                "session_end": [pd.Timestamp(end_us, unit="us")] * len(buckets),
                "bucket": buckets,
                "rho": [regs[b] for b in buckets],
            }
        )

    def sketch(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            start_us, last_us, regs_s = state.get
            state.remove()
            regs = _decode(regs_s)
            if regs:
                yield _emit_frame(key[0], start_us, last_us, regs)
            return
        rows = pd.concat(list(pdfs), ignore_index=True).dropna(subset=[ts_col])
        if rows.empty:
            if state.exists:
                _, last_us, _ = state.get
                state.setTimeoutTimestamp(
                    max(last_us // 1000 + gap_ms, state.getCurrentWatermarkMs() + 1)
                )
            return
        # Vectorized fold (measured ~5× on the bench row, and the x30
        # probe's 222 s was dominated by the old per-event Python loop
        # + one pandas frame allocation PER WINDOW): the register parts
        # (__b, __r) were computed JVM-side before the shuffle by the
        # same conv/substring/md5 expressions as hll_registers_by —
        # identical values to _hll_parts_py (their bit-equality is the
        # pytest-pinned sketches contract), so the state/emission
        # semantics below replay the original event loop exactly:
        # strictly-greater gap breaks, carried-window merge, all-null
        # windows advance boundaries but emit nothing.
        rows = rows.sort_values(ts_col, kind="mergesort")
        import numpy as np

        ts_us = rows[ts_col].to_numpy().astype("datetime64[ns]").astype("int64") // 1000
        b_arr = rows["__b"].to_numpy()
        r_arr = rows["__r"].to_numpy()
        if state.exists:
            start_us, last_us, regs_s = state.get
            regs = _decode(regs_s)
        else:
            start_us = last_us = None
            regs = {}
        gap_us = gap_ms * 1000
        breaks = np.empty(len(ts_us), dtype=bool)
        breaks[0] = last_us is not None and (ts_us[0] - last_us) > gap_us
        if len(ts_us) > 1:
            breaks[1:] = (ts_us[1:] - ts_us[:-1]) > gap_us
        win = np.cumsum(breaks)
        out: dict[str, list] = {
            "key": [], "session_start": [], "session_end": [],
            "bucket": [], "rho": [],
        }

        def emit(s_us: int, e_us: int, wregs: dict[int, int]) -> None:
            for bb in sorted(wregs):
                out["key"].append(key[0])
                out["session_start"].append(pd.Timestamp(s_us, unit="us"))
                out["session_end"].append(pd.Timestamp(e_us, unit="us"))
                out["bucket"].append(bb)
                out["rho"].append(wregs[bb])

        carried_open = last_us is not None and not breaks[0]
        if last_us is not None and breaks[0]:
            # batch starts past the gap: the carried window closes as-is
            if regs:
                emit(start_us, last_us, regs)
            regs, start_us = {}, None
        # per-(window, bucket) register max; nullable ints arrive as
        # float64 + NaN (values ≤ 255/53, exact in float64)
        mask = ~pd.isna(b_arr)
        wregs_map: dict[int, dict[int, int]] = {}
        if mask.any():
            agg = (
                pd.DataFrame(
                    {
                        "w": win[mask],
                        "b": b_arr[mask].astype("int64"),
                        "r": r_arr[mask].astype("int64"),
                    }
                )
                .groupby(["w", "b"], sort=True)["r"]
                .max()
            )
            for (ww, bb), rr in agg.items():
                wregs_map.setdefault(int(ww), {})[int(bb)] = int(rr)
        first_idx = np.flatnonzero(np.r_[True, win[1:] != win[:-1]])
        last_idx = np.r_[first_idx[1:] - 1, len(win) - 1]
        n_win = len(first_idx)
        for i in range(n_win):
            w_id = int(win[first_idx[i]])
            w_start = int(ts_us[first_idx[i]])
            w_end = int(ts_us[last_idx[i]])
            wregs = wregs_map.get(w_id, {})
            if i == 0 and carried_open:
                w_start = start_us
                for bb, rr in regs.items():
                    if wregs.get(bb, 0) < rr:
                        wregs[bb] = rr
            if i < n_win - 1:
                if wregs:
                    emit(w_start, w_end, wregs)
            else:
                state.update((w_start, w_end, _encode(wregs)))
                state.setTimeoutTimestamp(
                    max(w_end // 1000 + gap_ms, state.getCurrentWatermarkMs() + 1)
                )
        if out["key"]:
            yield pd.DataFrame(out)

    from train_reports_etl_spark.extensions.sketches import _HLL_RHO_MAX

    # Bit-equality contract (ADVICE r08): the JVM md5 must hash the SAME
    # bytes as the Python twin's _hll_parts_py(str(elem)). For a string
    # column the cast below is a no-op; for any other type Spark's
    # implicit cast-to-string can differ from Python str() (doubles,
    # booleans, timestamps), silently changing register values — so
    # non-string element columns are rejected instead of coerced.
    if not isinstance(stream.schema[elem_col].dataType, StringType):
        raise TypeError(
            f"streaming_hll_session_distinct: elem_col {elem_col!r} must be "
            f"StringType (got {stream.schema[elem_col].dataType.simpleString()}); "
            "cast it explicitly upstream with a stringification you control"
        )
    h = F.md5(F.col(elem_col).cast("string"))
    b_expr = F.conv(F.substring(h, 1, 2), 16, 10).cast("long")
    w_expr = F.conv(F.substring(h, 3, 13), 16, 10).cast("bigint")
    r_expr = (
        F.when(w_expr == 0, F.lit(_HLL_RHO_MAX))
        .otherwise(F.lit(_HLL_RHO_MAX) - F.length(F.bin(w_expr)))
        .cast("long")
    )
    return (
        stream.select(
            key_col,
            ts_col,
            b_expr.alias("__b"),
            r_expr.alias("__r"),
        )
        .withWatermark(ts_col, watermark)
        .groupBy(F.col(key_col))
        .applyInPandasWithState(
            sketch,
            outputStructType=out_schema,
            stateStructType=_HLL_WINDOW_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )

"""Stateful streaming operators (SURVEY §2.10 extension territory).

Three levels, most-built-in first:

1. ``session_stats`` — native ``F.session_window`` (gap-based sessions).
   Works identically on batch DFs (oracle-checkable via gaps-and-islands
   SQL) and streaming DFs with a watermark. Catalyst plans it as a
   SessionWindowStateStore aggregation — no Python in the loop.
2. ``stream_dedup`` — watermarked ``dropDuplicates``: exactly-once event
   identity within the watermark horizon; state is bounded by the horizon
   only when the event-time column is part of the key set.
   ``stream_dedup_within_watermark`` (round 12) — the
   ``dropDuplicatesWithinWatermark`` form: business-key-only dedup whose
   state the watermark bounds regardless of the key set.
3. ``running_totals_stateful`` — ``applyInPandasWithState`` for semantics
   the built-ins can't express (cross-batch running counters with custom
   eviction). Arrow-batched; state is a single tuple per key.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def session_stats(
    events: DataFrame,
    gap: str = "10 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
    watermark: str | None = None,
) -> DataFrame:
    """Gap-based sessionization: events of one key closer than ``gap``
    belong to one session. Emits (key, session_start, n_events, total_value).

    session_window's end is last-event + gap, so only the start (== min ts,
    stable under both engines) is exposed for oracle comparison."""
    df = events
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.session_window(F.col(ts_col), gap).alias("sw"), F.col(key_col))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 4).alias("total_value"))
        .select(
            F.col(key_col),
            F.date_format(F.col("sw.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
            "total_value",
        )
    )


def stream_dedup(
    events: DataFrame,
    id_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup on event identity: keep the first occurrence of
    each id within the watermark horizon (state size ∝ horizon, not stream
    length). On a batch DF it degrades to plain dropDuplicates — same rows."""
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicates(id_cols)
    return events.dropDuplicates(id_cols)


_RUNNING_STATE = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)
_RUNNING_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def stream_dedup_within_watermark(
    events: DataFrame,
    id_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """``dropDuplicatesWithinWatermark`` (round 12): dedup on
    BUSINESS KEYS ONLY with state bounded by the watermark horizon —
    the 100 TB fix for plain ``dropDuplicates``' trap: with only the
    business key, its state grows with corpus size forever; with the
    event-time column added to the key, same-key events at different
    timestamps stop being duplicates at all.

    Semantics: a duplicate is "same key while the first occurrence's
    event time is still inside the watermark horizon"; a key
    re-appearing AFTER the horizon expires is a NEW event and emits
    again (pinned by `stream_dedup_within_horizon`'s oracle, which
    counts exactly 2 emits for the re-sent keys). On a batch DF it
    degrades to plain dropDuplicates — same rows for a bounded
    input."""
    if events.isStreaming:
        return events.withWatermark(
            ts_col, watermark
        ).dropDuplicatesWithinWatermark(id_cols)
    return events.dropDuplicates(id_cols)


def _update_running(key, pdf_iter: Iterator[pd.DataFrame], state):
    """Per-key cross-batch accumulator: state carries (count, sum) forward
    across micro-batches; each batch emits the updated totals."""
    (user_id,) = key
    if state.exists:
        n, total = state.get
    else:
        n, total = 0, 0.0
    for pdf in pdf_iter:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [user_id], "n_events": [n], "total_value": [total]})


def running_totals_stateful(events: DataFrame) -> DataFrame:
    """Cross-batch running (count, sum) per user via applyInPandasWithState —
    the custom-stateful-operator escape hatch (GroupState + Arrow batches).
    Output mode: update (one refreshed row per key per batch)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update_running,
            outputStructType=_RUNNING_OUT,
            stateStructType=_RUNNING_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


_BAND_STATE = StructType(
    [
        StructField("ids", ArrayType(LongType())),
        StructField("overflowed", BooleanType()),
    ]
)
_BAND_OUT = StructType(
    [
        StructField("id_a", LongType()),
        StructField("id_b", LongType()),
        StructField("overflow", BooleanType()),
        StructField("band", LongType()),
        StructField("bucket", LongType()),
    ]
)


def _make_band_update(max_bucket_size: int | None):
    """Build the per-(band, bucket) incremental-LSH state update: state
    holds every doc id seen in this bucket across ALL earlier
    micro-batches; each batch emits candidate pairs between arriving ids
    and the accumulated index (plus pairs among same-batch arrivals),
    then appends the arrivals. With ``max_bucket_size=None`` the emitted
    pair SET is independent of how the stream is split into batches —
    collision is a property of the ids, not the arrival order — which is
    what makes the run-to-completion result oracle-checkable. With a cap
    set, batch-independence no longer holds for overflowing buckets:
    pairs emitted in batches BEFORE the bucket crossed the cap are
    retained, so output there depends on where batch boundaries fall
    relative to the overflow point (the overflow marker tells the
    consumer to disregard the bucket's partial pairs and re-run it
    through the exact side channel).

    When ``max_bucket_size`` is set and a bucket's population would
    exceed it, the bucket STOPS emitting pairs (quadratic blowup guard:
    a hot bucket is a giant duplicate cluster, whose state and per-batch
    output would otherwise grow as population²), its state is truncated
    to the cap, and ONE overflow marker row (overflow=true, with the
    band/bucket key, null pair ids) is emitted so the consumer can route
    that bucket to the exact-dedup side channel."""

    def update(key, pdf_iter: Iterator[pd.DataFrame], state):
        band, bucket = int(key[0]), int(key[1])
        if state.exists:
            seen = [int(x) for x in state.get[0]]
            overflowed = bool(state.get[1])
        else:
            seen, overflowed = [], False
        seen_set = set(seen)
        arriving: list[int] = []
        for pdf in pdf_iter:
            for x in pdf["id"]:
                xi = int(x)
                if xi not in seen_set and xi not in arriving:
                    arriving.append(xi)
        arriving.sort()
        if overflowed:
            # already flagged: keep state bounded, emit nothing more
            state.update((seen[: max_bucket_size or len(seen)], True))
            return
        if (
            max_bucket_size is not None
            and len(seen) + len(arriving) > max_bucket_size
        ):
            state.update((sorted(seen + arriving)[:max_bucket_size], True))
            yield pd.DataFrame(
                [(None, None, True, band, bucket)],
                columns=["id_a", "id_b", "overflow", "band", "bucket"],
            )
            return
        pairs = [
            (min(old, new), max(old, new)) for new in arriving for old in seen
        ] + [
            (a, b)
            for i, b in enumerate(arriving)
            for a in arriving[:i]
        ]
        state.update((seen + arriving, False))
        if pairs:
            yield pd.DataFrame(
                [(a, b, False, band, bucket) for a, b in pairs],
                columns=["id_a", "id_b", "overflow", "band", "bucket"],
            )

    return update


def streaming_band_index(
    banded: DataFrame, max_bucket_size: int | None = None
) -> DataFrame:
    """Incremental MinHash-LSH candidate generation over a STREAM of
    (id, band, bucket) rows — how a 100 TB pipeline dedups while the
    corpus is still arriving: the band index is GroupState keyed by
    (band, bucket); every micro-batch joins its arrivals against the
    accumulated index and emits new candidate pairs (append mode; rows
    with overflow=false). Candidate VERIFICATION (exact jaccard) stays a
    batch join against the materialized shingle sets —
    verify-on-candidates is cheap and needs no state.

    ``max_bucket_size`` bounds state AND output per key: a bucket whose
    population exceeds it emits a single overflow=true marker row (with
    its band/bucket key) instead of ~population² pairs, and its state is
    truncated to the cap — the consumer routes flagged buckets to the
    exact-dedup side channel (a giant duplicate cluster needs exact
    grouping, not pairwise LSH). None = unbounded (fixture-scale only)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return banded.groupBy("band", "bucket").applyInPandasWithState(
        _make_band_update(max_bucket_size),
        outputStructType=_BAND_OUT,
        stateStructType=_BAND_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_MG_STATE = StructType(
    [
        StructField("terms", ArrayType(StringType())),
        StructField("counts", ArrayType(LongType())),
    ]
)
_MG_OUT = StructType(
    [StructField("grp", LongType()), StructField("term", StringType())]
)

_MG_K = 64


def _update_mg(key, pdf_iter: Iterator[pd.DataFrame], state):
    """Cross-batch Misra-Gries(k) summary for one hash-group of the term
    space: merge the batch's term counts into the carried summary, then
    reduce back to k entries by subtracting the (k+1)-th largest count
    (the standard MG merge — error stays ≤ group_mass/(k+1) regardless of
    how the stream was batched). Emits the group's current candidate set
    each batch; the LAST emission per group is the final summary."""
    (grp,) = key
    if state.exists:
        terms, counts = state.get
        ctr = dict(zip(list(terms), [int(c) for c in counts]))
    else:
        ctr = {}
    for pdf in pdf_iter:
        for term, c in pdf["term"].value_counts().items():
            ctr[term] = ctr.get(term, 0) + int(c)
    if len(ctr) > _MG_K:
        off = sorted(ctr.values(), reverse=True)[_MG_K]
        ctr = {t: c - off for t, c in ctr.items() if c > off}
    state.update((list(ctr.keys()), list(ctr.values())))
    yield pd.DataFrame({"grp": [int(grp)] * len(ctr), "term": list(ctr.keys())})


def streaming_heavy_hitter_candidates(toks: DataFrame) -> DataFrame:
    """Streaming Misra-Gries candidate generation over a stream of
    (grp, term) rows: GroupState per hash-group of the term space carries
    the MG(64) summary across micro-batches. State is ≤ k (term, count)
    pairs per group — bounded by the sketch parameter, never the stream.
    With threshold N/41 and k=64, error ≤ group_mass/65 < N/41 means the
    final candidate union provably contains every true heavy hitter, for
    ANY batching/arrival order — exactness is restored by the batch
    recount that follows (same two-pass discipline as the batch
    operators/sketch.heavy_hitters)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return toks.groupBy("grp").applyInPandasWithState(
        _update_mg,
        outputStructType=_MG_OUT,
        stateStructType=_MG_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_SESS_TO_STATE = StructType(
    [
        StructField("start_ms", LongType()),
        StructField("end_ms", LongType()),
        StructField("n", LongType()),
        StructField("total", DoubleType()),
    ]
)
_SESS_TO_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("start_ms", LongType()),
        StructField("end_ms", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def sessionize_event_timeout(
    events: DataFrame,
    gap_ms: int = 600_000,
    wm_delay: str = "0 seconds",
) -> DataFrame:
    """Gap sessionization with TIMEOUT-DRIVEN finalization
    (GroupStateTimeout.EventTimeTimeout — the timer mechanism of the
    arbitrary-stateful API; transformWithStateInPandas is the same
    shape but its Python worker needs google.protobuf, absent in
    this container): a session closes EITHER when a later event
    arrives past the gap (emitted from the data path) OR when the
    event-time watermark passes last_event + gap (emitted from the
    state-timeout callback — "the user went quiet", with no later
    event ever touching the key). State per key is ONE open-session
    tuple; at 100 TB the store holds only keys active inside the
    watermark horizon. Works in ms (event times truncated via
    unix_millis — the oracle mirrors with epoch_ms)."""
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    ev = events.withWatermark("ts", wm_delay).select(
        "user_id", F.unix_millis("ts").alias("ms"), "value", "ts"
    )

    def fn(key, pdf_iter, state):
        (uid,) = key
        if state.hasTimedOut:
            start_ms, end_ms, n, total = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [uid],
                    "start_ms": [start_ms],
                    "end_ms": [end_ms],
                    "n_events": [n],
                    "total_value": [total],
                }
            )
            return
        parts = [p for p in pdf_iter if len(p)]
        pdf = pd.concat(parts).sort_values("ms") if parts else None
        cur = list(state.get) if state.exists else None
        out = []
        if pdf is not None:
            for ms, val in zip(pdf["ms"], pdf["value"]):
                ms, val = int(ms), float(val)
                if cur is not None and ms < cur[0] - gap_ms:
                    # a late-but-in-watermark event from BEFORE the
                    # open session that cannot merge with it: single-
                    # interval state cannot retro-split sessions, so
                    # this is loud, never a silently mis-attributed
                    # event (only reachable with wm_delay > 0 and
                    # cross-batch disorder)
                    raise ValueError(
                        "sessionize_event_timeout: event at "
                        f"{ms} ms predates the open session "
                        f"[{cur[0]}, {cur[1]}] by more than the gap"
                    )
                if cur is not None and ms - cur[1] <= gap_ms:
                    # merge; late events inside/before the interval
                    # extend the START too
                    cur[0] = min(cur[0], ms)
                    cur[1] = max(cur[1], ms)
                    cur[2] += 1
                    cur[3] += val
                else:
                    if cur is not None:
                        out.append((uid, cur[0], cur[1], cur[2],
                                    cur[3]))
                    cur = [ms, ms, 1, val]
        if cur is not None:
            state.update(tuple(cur))
            timeout_ms = cur[1] + gap_ms
            wm_ms = state.getCurrentWatermarkMs()
            if timeout_ms <= wm_ms:
                # When wm_delay > gap_ms, a late-but-in-watermark
                # event can leave last_event + gap at or behind the
                # watermark, and Spark rejects a timeout <= current
                # watermark. Clamp to wm+1: the session finalizes on
                # the next micro-batch's timeout sweep instead of
                # crashing on a legal parameter combination.
                timeout_ms = wm_ms + 1
            state.setTimeoutTimestamp(timeout_ms)
        yield pd.DataFrame(
            out,
            columns=["user_id", "start_ms", "end_ms", "n_events",
                     "total_value"],
        )

    return ev.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=_SESS_TO_OUT,
        stateStructType=_SESS_TO_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )

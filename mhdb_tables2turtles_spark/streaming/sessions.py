"""Custom stateful streaming operator: event-time sessionization of the
mention stream via ``applyInPandasWithState``.

Spark's built-in session windows (``F.session_window``) cover the
count-per-session case; this operator exists for the general stateful
shape the reference-scale pipeline needs — arbitrary per-session state
carried across micro-batches (first/last event time, mention count, and
any future per-session features) with explicit timeout-driven emission.

Semantics: a *session* for a surface form is a maximal run of mentions
where consecutive event times are ≤ ``gap_seconds`` apart.  Closed
sessions are emitted as soon as the operator sees the gap that closes
them; the still-open session per key lives in the state store and is
flushed when the event-time watermark passes ``last + gap`` (timeout),
so state is bounded by (#active keys in the gap horizon) regardless of
stream length.

Scale: state is keyed by surface — hub surfaces receive many mentions
per batch but state per key stays O(1) (three longs).  The per-batch
work is a vectorized numpy pass over the key's sorted timestamps.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Tuple

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

__all__ = ["SESSION_SCHEMA", "mention_sessions"]

SESSION_SCHEMA = StructType(
    [
        StructField("surface", StringType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_mentions", LongType()),
    ]
)

# open-session state: epoch-second start/last + running count (longs —
# timestamps in the state tuple would round-trip through Arrow less
# predictably than integers)
_STATE_SCHEMA = StructType(
    [
        StructField("start_s", LongType()),
        StructField("last_s", LongType()),
        StructField("n", LongType()),
    ]
)


def mention_sessions(
    mentions: DataFrame,
    gap_seconds: int = 300,
    watermark: str = "30 minutes",
    ts_col: str = "warc_ts",
    key_col: str = "surface",
) -> DataFrame:
    """(surface, session_start, session_end, n_mentions) — closed
    sessions only (append mode); the open session per key is held in
    state and emitted on event-time timeout."""
    import numpy as np
    import pandas as pd

    def fn(
        key: Tuple[str],
        pdfs: Iterable["pd.DataFrame"],
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:
        (surface,) = key

        def emit(rows):
            if not rows:
                return None
            return pd.DataFrame(
                {
                    "surface": surface,
                    "session_start": pd.to_datetime(
                        [r[0] for r in rows], unit="s"
                    ),
                    "session_end": pd.to_datetime(
                        [r[1] for r in rows], unit="s"
                    ),
                    "n_mentions": np.asarray(
                        [r[2] for r in rows], dtype="int64"
                    ),
                }
            )

        if state.hasTimedOut:
            start_s, last_s, n = state.get
            state.remove()
            out = emit([(start_s, last_s, n)])
            if out is not None:
                yield out
            return

        batch = pd.concat(list(pdfs), ignore_index=True)
        ts = np.sort(
            batch[ts_col].astype("datetime64[ns]").to_numpy().astype("int64")
            // 1_000_000_000
        )
        if state.exists:
            start_s, last_s, n = state.get
        else:
            start_s = last_s = None
            n = 0

        closed = []
        if len(ts):
            # True where a new session starts; carried-over open state
            # absorbs the first run when it is within the gap
            first_prev = (
                last_s if last_s is not None else ts[0] - gap_seconds - 1
            )
            new_sess = (ts - np.concatenate(([first_prev], ts[:-1]))) > gap_seconds
            sid = np.cumsum(new_sess)  # 0 = continues the open session
            for s in np.unique(sid):
                seg = ts[sid == s]
                if s == 0:
                    # merge into carried-over open session (late rows
                    # within the watermark may precede last_s — extend
                    # BOTH boundaries, else a late mention before the
                    # open session's start yields a wrong session_start).
                    # Remaining approximation: a late row older than
                    # start_s - gap still merges here instead of forming
                    # a separate earlier session; resegmenting would need
                    # the full per-key timestamp history in state, which
                    # is unbounded — the sessionizer trades that corner
                    # (already watermark-bounded) for O(1) state per key.
                    start_s = min(int(start_s), int(seg[0]))
                    last_s = max(int(last_s), int(seg[-1]))
                    n += len(seg)
                else:
                    if start_s is not None:
                        closed.append((start_s, last_s, n))
                    start_s, last_s, n = int(seg[0]), int(seg[-1]), len(seg)

        state.update((int(start_s), int(last_s), int(n)))
        state.setTimeoutTimestamp((int(last_s) + gap_seconds) * 1000)
        out = emit(closed)
        if out is not None:
            yield out

    return (
        mentions.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            SESSION_SCHEMA,
            _STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )

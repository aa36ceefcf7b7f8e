"""Temporal operators a training-data pipeline needs that Spark lacks natively.

- **as-of join**: for each left row, the latest right row with
  ``right.ts <= left.ts`` per key. Spark has no native ASOF JOIN (DuckDB does —
  the oracle mirrors with one); implemented with ``cogroup().applyInPandas``:
  both sides hash-exchange once on the key (same cost as the equi-join it
  replaces), then ``pd.merge_asof`` does the two-pointer sweep per group.
- **sessionization**: gap-based session ids via lag + cumulative sum windows —
  pure native expressions (the batch analog of streaming session_window).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the nearest earlier (``backward``) right row's
    columns per key; right columns come back prefixed ``r_``. Left rows with
    no match keep nulls (left-join semantics). Deterministic: ties on the
    right timestamp resolve to the last row in (ts, remaining cols) order."""
    l_cols = left.columns
    r_cols = [c for c in right.columns if c != key]
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in left.schema.fields]
        + [
            f"r_{f.name} {f.dataType.simpleString()}"
            for f in right.schema.fields
            if f.name != key
        ]
    )

    def merge(lp: pd.DataFrame, rp: pd.DataFrame) -> pd.DataFrame:
        if len(lp) == 0:
            return pd.DataFrame(columns=l_cols + [f"r_{c}" for c in r_cols])
        lp = lp.sort_values(left_ts, kind="mergesort")
        if len(rp) == 0:
            out = lp.copy()
            for c in r_cols:
                out[f"r_{c}"] = None
            return out[l_cols + [f"r_{c}" for c in r_cols]]
        rp = rp[r_cols].rename(columns={c: f"r_{c}" for c in r_cols})
        rp = rp.sort_values([f"r_{right_ts}"] + [c for c in rp.columns if c != f"r_{right_ts}"], kind="mergesort")
        merged = pd.merge_asof(
            lp, rp, left_on=left_ts, right_on=f"r_{right_ts}", direction=direction
        )
        return merged[l_cols + [f"r_{c}" for c in r_cols]]

    return (
        left.groupBy(key)
        .cogroup(right.groupBy(key))
        .applyInPandas(merge, schema=out_schema)
    )


def _epoch_us(ts_col: str) -> "F.Column":
    """Exact epoch MICROseconds for TIMESTAMP or TIMESTAMP_NTZ (second-level
    truncation would misplace session boundaries on sub-second gaps; with the
    session pinned to UTC the NTZ->LTZ hop is value-preserving)."""
    return F.unix_micros(F.col(ts_col).cast("timestamp_ltz"))


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Assign gap-based session ids: a new session starts when the time since
    the previous event of the same key exceeds ``gap_seconds``. Adds
    ``session_id`` (0-based per key). Pure window expressions."""
    order_cols = [F.col(ts_col)] + ([F.col(order_tiebreak)] if order_tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order_cols)
    epoch = _epoch_us(ts_col)
    gap = epoch - F.lag(epoch).over(w)
    new_session = F.when(gap.isNull() | (gap > gap_seconds * 1_000_000), 1).otherwise(0)
    return events.withColumn(
        "session_id",
        F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1,
    )


def session_stats(sessions: DataFrame, key: str = "user_id") -> DataFrame:
    """Per-session aggregates over a sessionized frame."""
    return sessions.groupBy(key, "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        (F.max(_epoch_us("ts")) - F.min(_epoch_us("ts"))).alias("duration_us"),
    )

"""Gaps-and-islands sessionization.

Reference semantics (SURVEY.md §2.5 W1–W4; reference
parser/parse_matches.sh:298-337): per key, order events by timestamp; a
gap >= ``gap_seconds`` (strictly: the reference tests ``delta >=
threshold``) starts a new session, and the first event of a key always
starts one (null lag coalesced to a huge sentinel).

Spark-first: one window pass computes lag, the new-session flag, and a
running sum that becomes the session ordinal — no self-join back to the
fact table (the reference's J3/J5 joins are avoided entirely by carrying
``session_id`` on each row).

Scale: the single window = one shuffle on the session key. At 100 TB the
key (user/player id) is high-cardinality and un-skewed, so the shuffle
partitions evenly; there is no global ordering anywhere.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cod_stats_spark.operators._util import epoch_us


def sessionize(
    df: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    gap_seconds: int,
    session_number_col: str = "session_number",
    session_id_col: str = "session_id",
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Annotate each row with a per-key session ordinal and a session id.

    ``tiebreak_cols`` make the ordering total when timestamps can tie
    (determinism for the oracle comparison).
    """
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in tiebreak_cols]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    # Exact integer microseconds when the column is a timestamp — the
    # gap comparison must be exact at the boundary (delta == gap starts
    # a new session), and double epoch loses sub-µs precision at 2024
    # magnitudes. epoch_us handles TIMESTAMP_NTZ (plain parquet
    # timestamp[us]) by hopping through TIMESTAMP under the pinned-UTC
    # session tz.
    epoch, per_sec = epoch_us(df, ts_col)
    gap = F.lit(int(gap_seconds) * per_sec)
    delta = epoch - F.lag(epoch).over(w)
    # First row per key (null delta) always starts a session; gap >= threshold
    # starts a new one (reference uses ifnull(delta, huge) >= threshold).
    is_new = F.when(delta.isNull() | (delta >= gap), F.lit(1)).otherwise(F.lit(0))
    running = F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    out = df.withColumn(session_number_col, running)
    sid = F.concat_ws("_", *[F.col(c).cast("string") for c in key_cols], F.col(session_number_col).cast("string"))
    return out.withColumn(session_id_col, sid)


def session_rollup(
    sessionized: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    session_number_col: str = "session_number",
    aggs: Sequence = (),
) -> DataFrame:
    """Per-session rollup (SURVEY.md A1): group by key + session ordinal.

    Always emits session start/end timestamps and event count; extra
    aggregate expressions are appended verbatim.
    """
    base = [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    return sessionized.groupBy(*key_cols, session_number_col).agg(*base, *aggs)

"""Event path analysis — top n-event sequences within sessions.

The product-analytics "what do users actually do" query (funnels
answer "do they follow MY hypothesis"; paths surface the sequences
that exist): sessionize the event stream, form the ordered
event-type n-grams inside each session, count them, rank. One
composition of already-verified pieces — gaps-and-islands
sessionization (one key shuffle), a per-session ordered collect
(same key, same exchange), an n-gram explode (the shingle pattern on
type sequences instead of words), and a count/distinct aggregation.

Determinism: equal-timestamp events order by the tiebreak column
(the sessionize contract), so the per-session sequence — and every
n-gram — is a pure function of the data in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cod_stats_spark.operators.sessionize import sessionize


def event_path_ngrams(
    events: DataFrame,
    n: int = 2,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """(path, n_occurrences, n_sessions) — every within-session run
    of ``n`` consecutive event types, rendered 'a>b>…'. Sessions
    shorter than n contribute nothing; a path repeating inside one
    session counts every occurrence but one session."""
    if n < 1:
        raise ValueError("event_path_ngrams: n must be >= 1")
    s = sessionize(
        events, ts_col, [user_col], gap_seconds, tiebreak_cols=[tiebreak_col]
    )
    seqs = (
        s.groupBy(user_col, "session_number")
        .agg(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            F.col(ts_col).alias("t"),
                            F.col(tiebreak_col).alias("tb"),
                            F.col(type_col).alias("e"),
                        )
                    )
                ),
                lambda x: x["e"],
            ).alias("_seq")
        )
    )
    grams = F.when(
        F.size("_seq") >= n,
        F.transform(
            F.sequence(F.lit(0), F.size("_seq") - n),
            lambda i: F.concat_ws(">", F.slice("_seq", i + 1, n)),
        ),
    ).otherwise(F.expr("cast(array() as array<string>)"))
    exploded = seqs.select(
        user_col,
        "session_number",
        F.explode(grams).alias("path"),
    )
    return exploded.groupBy("path").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.countDistinct(
            F.concat_ws(
                ":",
                F.col(user_col).cast("string"),
                F.col("session_number").cast("string"),
            )
        ).alias("n_sessions"),
    )


def path_oracle_sql(
    n: int,
    gap_seconds: int,
    src: str = "events",
    user_sql: str = "user_id",
    type_sql: str = "event_type",
    ts_sql: str = "ts",
    tiebreak_sql: str = "event_id",
) -> str:
    """DuckDB replica: the sessionize CTE (gap >= threshold splits,
    tiebreak ordering), ordered per-session sequences, n-gram slices,
    identical counts."""
    return f"""
WITH flagged AS (
  SELECT {user_sql} AS u, {ts_sql} AS t, {tiebreak_sql} AS tb,
         {type_sql} AS e,
         CASE WHEN date_diff('microsecond', lag({ts_sql}) OVER w, {ts_sql})
                   >= {gap_seconds} * 1000000
              OR lag({ts_sql}) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
  FROM {src}
  WINDOW w AS (PARTITION BY {user_sql} ORDER BY {ts_sql}, {tiebreak_sql})
), numbered AS (
  SELECT *, sum(is_new) OVER (PARTITION BY u ORDER BY t, tb
                              ROWS UNBOUNDED PRECEDING) AS sn
  FROM flagged
), seqs AS (
  SELECT u, sn, list(e ORDER BY t, tb) AS seq
  FROM numbered GROUP BY u, sn
), grams AS (
  SELECT u, sn, array_to_string(seq[i + 1 : i + {n}], '>') AS path
  FROM seqs, UNNEST(CASE WHEN len(seq) >= {n}
                    THEN generate_series(0, len(seq) - {n})
                    ELSE [] END) AS g(i)
)
SELECT path, count(*) AS n_occurrences,
       count(DISTINCT u::VARCHAR || ':' || sn::VARCHAR) AS n_sessions
FROM grams GROUP BY path
"""

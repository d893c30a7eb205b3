"""DuckDB oracle SQL — one ANSI-SQL twin per queries.py entry.

Conventions mirrored from queries.py so value hashes match exactly:
integer-epoch bucket floors via ``epoch_ms(ts)//1000`` (floor), naive
timestamps via ``make_timestamp(us)``, double SUMs through
DECIMAL(20,6)/(24,8), averages as one double division, explicit BIGINT
casts (DuckDB sum(BIGINT) is HUGEINT), total-order ORDER BY under any
LIMIT.
"""

from __future__ import annotations

_B60 = "make_timestamp(((epoch_ms(ts)//1000) - (epoch_ms(ts)//1000) % {s}) * 1000000)"


def _bucket(s: int, ts: str = "ts") -> str:
    return (
        f"make_timestamp(((epoch_ms({ts})//1000) - (epoch_ms({ts})//1000) % {s})"
        " * 1000000)"
    )


def _rollup_sql(seconds: int) -> str:
    return f"""
SELECT user_id, event_type, {_bucket(seconds)} AS bucket_start,
       count(*)::BIGINT AS n_events,
       CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS value_sum,
       CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE) / count(*) AS value_avg,
       count(*) / {float(seconds)} AS event_rate
FROM events GROUP BY 1,2,3
"""


ORACLES: dict[str, str] = {}

ORACLES["rollup_1m"] = _rollup_sql(60)
# the Spark side cascades 1h from 1m and 1d from 1h; the oracle rolls
# up directly from raw — agreement proves the cascade is exact
ORACLES["rollup_1h_cascade"] = _rollup_sql(3600)
ORACLES["rollup_1d_cascade"] = _rollup_sql(86400)

ORACLES["gap_detect"] = """
WITH lagged AS (
  SELECT user_id, event_type, ts,
         lag(ts) OVER (PARTITION BY user_id, event_type ORDER BY ts) AS prev_ts
  FROM events)
SELECT user_id, event_type,
       prev_ts AS gap_start, ts AS gap_end,
       ((epoch_ms(ts)//1000) - (epoch_ms(prev_ts)//1000))::BIGINT AS gap_seconds
FROM lagged
WHERE (epoch_ms(ts)//1000) - (epoch_ms(prev_ts)//1000) > 21600
"""

_HOURLY_SUBSET = f"""
  SELECT user_id, event_type, {_bucket(3600)} AS bucket_start,
         count(*)::BIGINT AS n_events,
         CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS value_sum
  FROM events WHERE user_id < 15 GROUP BY 1,2,3
"""

_DENSE_1H = f"""
tier AS ({_HOURLY_SUBSET}),
extents AS (
  SELECT user_id, event_type, min(bucket_start) b_min, max(bucket_start) b_max
  FROM tier GROUP BY 1,2),
grid AS (
  SELECT user_id, event_type,
         unnest(generate_series(b_min, b_max, INTERVAL 1 HOUR)) AS bucket_start
  FROM extents),
dense AS (
  SELECT g.user_id, g.event_type, g.bucket_start,
         t.n_events, t.value_sum,
         t.n_events IS NULL AS gap_filled
  FROM grid g LEFT JOIN tier t
    USING (user_id, event_type, bucket_start))
"""

ORACLES["gapfill_locf_1h"] = f"""
WITH {_DENSE_1H}
SELECT user_id, event_type, bucket_start,
       coalesce(n_events, 0)::BIGINT AS n_events,
       last_value(value_sum IGNORE NULLS) OVER (
         PARTITION BY user_id, event_type ORDER BY bucket_start
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_sum,
       gap_filled
FROM dense
"""

ORACLES["gapfill_linear_1h"] = f"""
WITH {_DENSE_1H},
marked AS (
  SELECT *, (epoch_ms(bucket_start)//1000)::BIGINT AS t,
         CASE WHEN NOT gap_filled THEN (epoch_ms(bucket_start)//1000)::BIGINT END AS obs_t
  FROM dense),
surround AS (
  SELECT *,
    last_value(obs_t IGNORE NULLS) OVER w0 AS t0,
    last_value(value_sum IGNORE NULLS) OVER w0 AS v0,
    first_value(obs_t IGNORE NULLS) OVER w1 AS t1,
    first_value(value_sum IGNORE NULLS) OVER w1 AS v1
  FROM marked
  WINDOW
    w0 AS (PARTITION BY user_id, event_type ORDER BY bucket_start
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    w1 AS (PARTITION BY user_id, event_type ORDER BY bucket_start
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
SELECT user_id, event_type, bucket_start,
       CAST(CASE
         WHEN NOT gap_filled THEN value_sum
         WHEN t0 IS NULL THEN v1
         WHEN t1 IS NULL THEN v0
         WHEN t1 = t0 THEN v0
         ELSE (v1 - v0) / (t1 - t0) * (t - t0) + v0
       END AS DOUBLE) AS value_fill,
       gap_filled
FROM surround
"""

ORACLES["stencil_diff"] = """
SELECT user_id, event_type, event_id,
       CAST(value - coalesce(
         lag(value) OVER (PARTITION BY user_id, event_type ORDER BY event_id), 0)
       AS DOUBLE) AS value_diff
FROM events
"""

ORACLES["stencil_bounds"] = """
WITH pts AS (
  SELECT DISTINCT user_id, event_type,
         CAST((epoch_ms(ts)//1000) AS DOUBLE) AS t
  FROM events),
nb AS (
  SELECT *, lag(t) OVER w AS prev, lead(t) OVER w AS next
  FROM pts WINDOW w AS (PARTITION BY user_id, event_type ORDER BY t))
SELECT user_id, event_type, t,
       CASE WHEN prev IS NULL THEN t - (next - t)/2 ELSE (prev + t)/2 END AS t_lb,
       CASE WHEN next IS NULL THEN t + (t - prev)/2 ELSE (t + next)/2 END AS t_ub
FROM nb
"""

ORACLES["running_sum"] = """
SELECT user_id, event_type, event_id,
       CAST(sum(CAST(value AS DECIMAL(20,6))) OVER (
         PARTITION BY user_id, event_type ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS value_cum
FROM events
"""

ORACLES["weighted_downsample_1d"] = f"""
SELECT user_id, event_type, {_bucket(86400)} AS bucket_start,
       CAST(sum(CAST(value * (event_id % 5 + 1) AS DECIMAL(24,8))) AS DOUBLE)
         / CAST(sum(event_id % 5 + 1) AS DOUBLE) AS value_wmean
FROM events GROUP BY 1,2,3
"""

ORACLES["sessionize"] = """
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL THEN 1
              WHEN (epoch_ms(ts)//1000) - (epoch_ms(lag(ts) OVER w)//1000) > 1800 THEN 1
              ELSE 0 END AS new_sess
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sessed AS (
  SELECT user_id, event_id,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged)
SELECT user_id, session_id::BIGINT AS session_id, count(*)::BIGINT AS n_events
FROM sessed GROUP BY 1,2
"""

ORACLES["heavy_series"] = """
SELECT user_id, event_type, count(*)::BIGINT AS n_rows
FROM events GROUP BY 1,2
HAVING count(*) >= greatest(1, CAST((SELECT count(*) FROM events) * 0.002 AS BIGINT))
"""

ORACLES["limit_clamp"] = """
SELECT event_id,
       least(greatest(value, 50.0), 500.0) AS value_clamped,
       CAST(CASE WHEN value < 10.0 OR value > 900.0 THEN NULL ELSE value END
            AS DOUBLE) AS value_masked
FROM events
"""

ORACLES["unit_convert"] = """
SELECT event_id, value / 1000.0 AS value_s,
       ts + INTERVAL 1 HOUR AS ts_shifted
FROM events
"""

ORACLES["tpch_q1"] = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(20,6))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,8))) AS DOUBLE)
         AS sum_disc_price,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                AS DECIMAL(24,8))) AS DOUBLE) AS sum_charge,
       CAST(sum(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE) / count(*) AS avg_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(20,6))) AS DOUBLE) / count(*)
         AS avg_price,
       count(*)::BIGINT AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY 1,2
"""

ORACLES["top_revenue_orders"] = """
SELECT o.o_orderkey, c.c_name,
       CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(24,8)))
            AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY 1,2
ORDER BY revenue DESC, o.o_orderkey ASC
LIMIT 20
"""

# codec round trip: the Spark side compresses the hourly tier to
# Gorilla/DoD blobs and decompresses; the oracle is the tier itself.
ORACLES["compress_roundtrip"] = f"""
SELECT user_id, event_type, bucket_start, value_sum
FROM ({_HOURLY_SUBSET})
"""

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

# ---------------------------------------------- widened operator coverage
ORACLES["stencil_lead_diff"] = """
SELECT user_id, event_type, event_id,
       CAST(value - coalesce(
         lead(value) OVER (PARTITION BY user_id, event_type ORDER BY event_id),
         0) AS DOUBLE) AS value_absorb
FROM events
"""

ORACLES["stencil_deriv3"] = f"""
WITH tier AS ({_HOURLY_SUBSET}),
pts AS (
  SELECT user_id, event_type,
         (epoch_ms(bucket_start)//1000)::DOUBLE AS t, value_sum AS y
  FROM tier
),
nb AS (
  SELECT user_id, event_type, t, y,
         lag(t)  OVER w AS x0,  lag(y)  OVER w AS y0,
         lead(t) OVER w AS x2,  lead(y) OVER w AS y2,
         lead(t, 2) OVER w AS x3, lead(y, 2) OVER w AS y3,
         lag(t, 2)  OVER w AS xm2, lag(y, 2) OVER w AS ym2
  FROM pts
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY t)
)
SELECT user_id, event_type, t,
  CASE
    WHEN x0 IS NULL THEN
      y * ((t - x2) + (t - x3)) / ((t - x2) * (t - x3))
      - y2 * ((t - x3) / ((t - x2) * (x2 - x3)))
      + y3 * ((t - x2) / ((t - x3) * (x2 - x3)))
    WHEN x2 IS NULL THEN
      -ym2 * ((x0 - t) / ((xm2 - x0) * (xm2 - t)))
      + y0 * ((xm2 - t) / ((xm2 - x0) * (x0 - t)))
      - y * ((xm2 - t) + (x0 - t)) / ((xm2 - t) * (x0 - t))
    ELSE
      y0 * ((t - x2) / ((x0 - t) * (x0 - x2)))
      + y * (1.0 / (t - x2) - 1.0 / (x0 - t))
      - y2 * ((x0 - t) / ((x0 - x2) * (t - x2)))
  END AS deriv
FROM nb
"""

_PIVOT_TYPES = ["click", "view", "purchase", "login", "error"]
ORACLES["pivot_event_types"] = (
    "SELECT user_id, "
    + ", ".join(
        f"CAST(sum(CASE WHEN event_type = '{t}' THEN CAST(value AS DECIMAL(20,6))"
        f" END) AS DOUBLE) AS sum_{t}"
        for t in _PIVOT_TYPES
    )
    + " FROM events GROUP BY user_id"
)

ORACLES["unpivot_lineitem"] = """
SELECT l_orderkey, l_linenumber, 'quantity' AS measure,
       l_quantity::DOUBLE AS value
FROM lineitem WHERE l_orderkey < 100
UNION ALL
SELECT l_orderkey, l_linenumber, 'price', l_extendedprice::DOUBLE
FROM lineitem WHERE l_orderkey < 100
UNION ALL
SELECT l_orderkey, l_linenumber, 'discount', l_discount::DOUBLE
FROM lineitem WHERE l_orderkey < 100
"""

ORACLES["expand_grid"] = f"""
WITH daily AS (
  SELECT {_bucket(86400)} AS day, count(*)::BIGINT AS n_events
  FROM events GROUP BY 1
)
SELECT day, r_regionkey, r_name, n_events
FROM daily CROSS JOIN (SELECT r_regionkey, r_name FROM region) r
"""

ORACLES["conditional_select"] = """
SELECT event_id,
       CASE WHEN value >= 500.0 THEN value ELSE -1.0 END AS value_where
FROM events
"""

ORACLES["skew_salted_rollup"] = """
SELECT user_id, event_type, count(*)::BIGINT AS n_events,
       min(value) AS value_min, max(value) AS value_max
FROM events GROUP BY 1, 2
"""

ORACLES["topk_per_group"] = """
WITH ranked AS (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY value DESC, event_id ASC) AS rk
  FROM events
)
SELECT user_id, event_id, value::DOUBLE AS value, rk::INT AS rk
FROM ranked WHERE rk <= 3
"""

ORACLES["orders_without_lineitem"] = """
SELECT o_orderkey, o_custkey FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
"""

ORACLES["rollup_grouping_sets"] = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE) AS sum_qty,
       count(*)::BIGINT AS n_rows
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""

# the pandas-UDF linear fill must agree with the closed-form SQL fill
ORACLES["gapfill_linear_pandas_1h"] = ORACLES["gapfill_linear_1h"]

ORACLES["infer_cadence"] = """
WITH deltas AS (
  SELECT user_id, event_type,
         (epoch_ms(ts)//1000)
         - lag(epoch_ms(ts)//1000) OVER (PARTITION BY user_id, event_type
                                         ORDER BY ts, event_id) AS delta
  FROM events
),
counted AS (
  SELECT user_id, event_type, delta, count(*) AS n
  FROM deltas WHERE delta IS NOT NULL GROUP BY 1, 2, 3
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                               ORDER BY n DESC, delta ASC) AS rk
  FROM counted
)
SELECT user_id, event_type, delta::BIGINT AS cadence_seconds, n::BIGINT AS n_obs
FROM ranked WHERE rk = 1
"""

ORACLES["climatology_hourly"] = """
SELECT user_id, event_type, hour(ts)::INT AS hour_of_day,
       CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE) / count(*) AS value_clim,
       count(*)::BIGINT AS n_obs
FROM events GROUP BY 1, 2, 3
"""

ORACLES["value_algebra"] = """
SELECT event_id,
       -value AS neg,
       value + 1.5 AS "add",
       value - 2.5 AS sub,
       value * 2.0 AS mul,
       value / 4.0 AS div,
       value * value AS pow2,
       sqrt(value) AS sqrt_v,
       least(greatest(value, 100.0), 400.0) AS clamp,
       CASE WHEN isnan(value / (value - 100.0))
                 OR abs(value / (value - 100.0)) = 'inf'::DOUBLE
            THEN NULL ELSE value / (value - 100.0) END AS masked_ratio
FROM events
"""

ORACLES["distinct_users_per_day"] = f"""
SELECT {_bucket(86400)} AS day,
       count(DISTINCT user_id)::BIGINT AS n_users,
       count(DISTINCT event_type)::BIGINT AS n_types,
       count(*)::BIGINT AS n_events
FROM events GROUP BY 1
"""

ORACLES["json_extract_props"] = """
SELECT event_id, json_extract_string(props, '$.k')::INT AS k
FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL
"""

# as-of join, same union-window formulation as the Spark operator so
# tie-breaks are identical (window last_value ignore nulls)
ORACLES["asof_join_tier"] = f"""
WITH tier AS ({_HOURLY_SUBSET}),
tagged AS (
  SELECT user_id, event_type, bucket_start AS t, 1 AS side,
         NULL::BIGINT AS tie, NULL::DOUBLE AS rv, bucket_start
  FROM tier
  UNION ALL
  SELECT user_id, event_type, ts AS t, 0 AS side,
         event_id AS tie, value AS rv, NULL AS bucket_start
  FROM events WHERE user_id < 15
),
filled AS (
  SELECT *, last_value(rv IGNORE NULLS) OVER (
           PARTITION BY user_id, event_type
           ORDER BY t, side, tie ASC NULLS LAST
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_value
  FROM tagged
)
SELECT user_id, event_type, bucket_start, asof_value::DOUBLE AS asof_value
FROM filled WHERE side = 1
"""

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


from pyconform_spark.operators.cluster import (
    kmeans_embeddings_sql as _kmeans_embeddings_sql,
)

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

ORACLES["stencil_bounds_locations"] = """
WITH pts AS (
  SELECT DISTINCT user_id, event_type,
         CAST((epoch_ms(ts)//1000) AS DOUBLE) AS t
  FROM events),
nb AS (
  SELECT *, lag(t) OVER w AS prev, lead(t) OVER w AS next
  FROM pts WINDOW w AS (PARTITION BY user_id, event_type ORDER BY t))
SELECT user_id, event_type, t,
       t AS lb0,
       CASE WHEN next IS NULL THEN t + (t - prev) ELSE next END AS ub0,
       CASE WHEN prev IS NULL THEN t - (next - t)/2 ELSE (prev + t)/2 END AS lb1,
       CASE WHEN next IS NULL THEN t + (t - prev)/2 ELSE (t + next)/2 END AS ub1,
       CASE WHEN prev IS NULL THEN t - (next - t) ELSE prev END AS lb2,
       t AS ub2
FROM nb
"""

ORACLES["stencil_bounds_interfaces"] = """
WITH pts AS (
  SELECT DISTINCT user_id, event_type,
         CAST((epoch_ms(ts)//1000) AS DOUBLE) AS t
  FROM events),
nb AS (
  SELECT *, lead(t) OVER w AS next,
         row_number() OVER w - 1 AS i,
         count(*) OVER (PARTITION BY user_id, event_type) AS n
  FROM pts WINDOW w AS (PARTITION BY user_id, event_type ORDER BY t)),
inner_ifc AS (
  SELECT user_id, event_type, 0.25*t + 0.75*next AS v, i + 1 AS j
  FROM nb WHERE next IS NOT NULL),
stats AS (
  SELECT user_id, event_type, n,
         min(CASE WHEN i = 0 THEN t END) AS x0,
         min(CASE WHEN i = n-1 THEN t END) AS xm1
  FROM nb GROUP BY user_id, event_type, n),
istats AS (
  SELECT user_id, event_type, min(v) AS i_lo, max(v) AS i_hi
  FROM inner_ifc GROUP BY 1, 2),
pads AS (
  SELECT s.user_id, s.event_type, 2.0*x0 - i_lo AS v, 0 AS j
  FROM stats s JOIN istats t ON s.user_id = t.user_id AND s.event_type = t.event_type
  UNION ALL
  SELECT s.user_id, s.event_type, 2.0*xm1 - i_hi AS v, n AS j
  FROM stats s JOIN istats t ON s.user_id = t.user_id AND s.event_type = t.event_type),
edges AS (
  SELECT user_id, event_type, v, j FROM inner_ifc
  UNION ALL SELECT user_id, event_type, v, j FROM pads),
paired AS (
  SELECT *, lead(v) OVER (PARTITION BY user_id, event_type ORDER BY j) AS vn
  FROM edges)
SELECT c.user_id, c.event_type, c.t,
       p.v::DOUBLE AS t_lb, p.vn::DOUBLE AS t_ub
FROM nb c JOIN paired p
  ON c.user_id = p.user_id AND c.event_type = p.event_type AND c.i = p.j
"""

ORACLES["vertical_interp_linear"] = f"""
WITH tier AS ({_HOURLY_SUBSET}),
ranked AS (
  SELECT user_id, event_type, value_sum,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY bucket_start) - 1 AS i
  FROM tier),
col_air AS (
  -- every literal cast to DOUBLE: DuckDB otherwise evaluates 0.1*i in
  -- exact DECIMAL, while Spark's doubles round (444.0000000000001)
  SELECT user_id, event_type,
         (0.1::DOUBLE * i) * 1000.0::DOUBLE
           + (0.05::DOUBLE * i + 0.01::DOUBLE) * (900.0::DOUBLE + user_id) AS p,
         value_sum::DOUBLE AS v
  FROM ranked),
tgt AS (SELECT unnest([500.0, 5000.0, 20000.0, 40000.0]) AS plev),
x AS (SELECT * FROM col_air, tgt),
agg AS (
  SELECT user_id, event_type, plev,
         max(CASE WHEN p <= plev THEN {{'p': p, 'v': v}} END) AS lo,
         min(CASE WHEN p >= plev THEN {{'p': p, 'v': v}} END) AS hi
  FROM x GROUP BY 1, 2, 3)
SELECT user_id, event_type, plev,
       CAST(CASE
         WHEN lo IS NULL OR hi IS NULL THEN NULL
         WHEN hi.p = lo.p THEN lo.v
         ELSE lo.v + (hi.v - lo.v) * ((plev - lo.p) / (hi.p - lo.p))
       END AS DOUBLE) AS v_interp
FROM agg
"""

ORACLES["media_decoded_props"] = """
WITH ids AS (SELECT event_id FROM events WHERE event_id < 500),
audio AS (
  SELECT event_id, (event_id % 50 + 1) * 40 AS n, event_id % 7 + 1 AS k
  FROM ids WHERE event_id % 2 = 0),
g AS (SELECT unnest(generate_series(0, 1999)) AS i),
asum AS (
  SELECT a.event_id, a.n,
         sum(((g.i * a.k) % 256) - 128)::BIGINT AS s
  FROM audio a JOIN g ON g.i < a.n
  GROUP BY a.event_id, a.n),
image AS (
  SELECT event_id, event_id % 16 + 1 AS w, event_id % 8 + 1 AS h
  FROM ids WHERE event_id % 2 = 1),
isum AS (
  SELECT im.event_id, im.w, im.h, im.w * im.h * 3 AS n,
         sum((g.i + im.event_id) % 256)::BIGINT AS s
  FROM image im JOIN g ON g.i < im.w * im.h * 3
  GROUP BY im.event_id, im.w, im.h)
SELECT event_id::BIGINT AS event_id, 'audio' AS kind,
       n::BIGINT AS n_units, ((n * 1000) // 8000)::BIGINT AS duration_ms,
       NULL::INT AS width, NULL::INT AS height,
       CAST(s AS DOUBLE) / n AS mean_value
FROM asum
UNION ALL
SELECT event_id::BIGINT, 'image', n::BIGINT, NULL::BIGINT,
       w::INT, h::INT, CAST(s AS DOUBLE) / n
FROM isum
"""

ORACLES["media_video_props"] = """
WITH ids AS (SELECT event_id FROM events WHERE event_id < 300),
geom AS (
  SELECT event_id,
         event_id % 8 + 2 AS w,
         event_id % 4 + 1 AS h,
         event_id % 5 + 2 AS nf
  FROM ids),
g AS (SELECT unnest(generate_series(0, 35)) AS k),
luma AS (
  SELECT ge.event_id, ge.w, ge.h, ge.nf,
         sum(  299 * ((3 * g.k     + ge.event_id) % 256)
             + 587 * ((3 * g.k + 1 + ge.event_id) % 256)
             + 114 * ((3 * g.k + 2 + ge.event_id) % 256))::BIGINT AS s
  FROM geom ge JOIN g ON g.k < ge.w * ge.h
  GROUP BY ge.event_id, ge.w, ge.h, ge.nf)
SELECT event_id::BIGINT AS event_id,
       nf::BIGINT AS n_frames,
       ((nf * 1000) // 10)::BIGINT AS duration_ms,
       w::INT AS width, h::INT AS height,
       CAST(s AS DOUBLE) / (1000 * w * h) AS mean_luma_frame0
FROM luma
"""

ORACLES["media_resize_props"] = """
WITH ids AS (SELECT event_id FROM events
             WHERE event_id < 500 AND event_id % 2 = 1),
geom AS (
  SELECT event_id, event_id % 16 + 1 AS w, event_id % 8 + 1 AS h
  FROM ids),
o AS (SELECT unnest(generate_series(0, 23)) AS o),
v AS (
  SELECT g.event_id, g.w, g.h,
         (( ((o.o // 12) * g.h // 2) * g.w
          + ((o.o % 12) // 3) * g.w // 4 ) * 3
          + o.o % 3 + g.event_id) % 256 AS val
  FROM geom g CROSS JOIN o)
SELECT event_id::BIGINT AS event_id,
       w::INT AS width, h::INT AS height,
       4::INT AS out_w, 2::INT AS out_h,
       35::BIGINT AS resized_bytes,
       sum(val)::BIGINT AS pixel_sum,
       CAST(sum(val) AS DOUBLE) / 24 AS mean_value
FROM v GROUP BY 1, 2, 3
"""

ORACLES["media_frame_sample"] = """
WITH ids AS (SELECT event_id FROM events WHERE event_id < 300),
geom AS (
  SELECT event_id,
         event_id % 8 + 2 AS w,
         event_id % 4 + 1 AS h,
         event_id % 5 + 2 AS nf
  FROM ids),
fr AS (SELECT unnest(generate_series(0, 5)) AS f),
px AS (SELECT unnest(generate_series(0, 35)) AS p),
sampled AS (
  SELECT g.event_id, g.w, g.h, fr.f
  FROM geom g JOIN fr ON fr.f < g.nf AND fr.f % 2 = 0),
sums AS (
  SELECT s.event_id, s.w, s.h, s.f,
         sum(  (3 * px.p     + s.f + s.event_id) % 256
             + (3 * px.p + 1 + s.f + s.event_id) % 256
             + (3 * px.p + 2 + s.f + s.event_id) % 256)::BIGINT AS fsum,
         sum(  299 * ((3 * px.p     + s.f + s.event_id) % 256)
             + 587 * ((3 * px.p + 1 + s.f + s.event_id) % 256)
             + 114 * ((3 * px.p + 2 + s.f + s.event_id) % 256))::BIGINT AS ls
  FROM sampled s JOIN px ON px.p < s.w * s.h
  GROUP BY 1, 2, 3, 4)
SELECT event_id::BIGINT AS event_id,
       f::INT AS frame_idx,
       w::INT AS width, h::INT AS height,
       fsum AS frame_sum,
       CAST(ls AS DOUBLE) / (1000 * w * h) AS mean_luma
FROM sums
"""

# ---------------------------------------------- int_tabulated (spline)
# The one catalog entry that was rows-only in r1/r2: the natural-cubic
# spline's forward/back recurrences ARE expressible as recursive CTEs
# (each step is a closed-form function of the previous row), the
# uniform resample is an ASOF-join bracket, and the 5-point
# Newton-Cotes total is an ordered aggregate.  Every float op mirrors
# gapfill.int_tabulated_np in order (which pins cubes to a*a*a and the
# final sum to sequential cumsum for exactly this reason).
ORACLES["int_tabulated_series"] = f"""
WITH RECURSIVE
tier AS ({_HOURLY_SUBSET}),
knots AS (
  SELECT user_id, event_type,
         CAST(epoch_ms(bucket_start)//1000 AS DOUBLE) AS x,
         value_sum::DOUBLE AS y,
         row_number() OVER w - 1 AS j,
         count(*) OVER (PARTITION BY user_id, event_type) AS n
  FROM tier
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY bucket_start)),
kn AS (
  SELECT *, lag(x) OVER w2 AS xm, lead(x) OVER w2 AS xp,
         lag(y) OVER w2 AS ym, lead(y) OVER w2 AS yp
  FROM knots WINDOW w2 AS (PARTITION BY user_id, event_type ORDER BY j)),
fwd AS (
  SELECT user_id, event_type, j, n, 0.0::DOUBLE AS y2f, 0.0::DOUBLE AS u
  FROM knots WHERE j = 0
  UNION ALL
  SELECT k.user_id, k.event_type, k.j, k.n,
         CASE WHEN k.j >= k.n - 1 THEN 0.0
              ELSE ((k.x - k.xm)/(k.xp - k.xm) - 1.0)
                   / ((k.x - k.xm)/(k.xp - k.xm) * f.y2f + 2.0) END,
         CASE WHEN k.j >= k.n - 1 THEN 0.0
              ELSE (6.0*((k.yp - k.y)/(k.xp - k.x) - (k.y - k.ym)/(k.x - k.xm))
                      /(k.xp - k.xm)
                    - (k.x - k.xm)/(k.xp - k.xm) * f.u)
                   / ((k.x - k.xm)/(k.xp - k.xm) * f.y2f + 2.0) END
  FROM kn k JOIN fwd f
    ON k.user_id = f.user_id AND k.event_type = f.event_type
   AND k.j = f.j + 1),
nmax AS (SELECT DISTINCT user_id, event_type, n FROM knots),
bwd AS (
  SELECT user_id, event_type, n - 1 AS j, 0.0::DOUBLE AS y2 FROM nmax
  UNION ALL
  SELECT f.user_id, f.event_type, f.j, f.y2f * b.y2 + f.u
  FROM fwd f JOIN bwd b
    ON f.user_id = b.user_id AND f.event_type = b.event_type
   AND f.j = b.j - 1),
params AS (
  SELECT user_id, event_type, n, min(x) AS xmin, max(x) AS xmax,
         ((n - 1 + 3)//4)*4 AS nseg
  FROM knots GROUP BY user_id, event_type, n),
gs AS (SELECT unnest(generate_series(0, 20000)) AS gi),
grid AS (
  SELECT p.user_id, p.event_type, p.n, p.nseg, g.gi,
         (p.xmax - p.xmin)/p.nseg AS h,
         CASE WHEN g.gi = p.nseg THEN p.xmax
              ELSE g.gi * ((p.xmax - p.xmin)/p.nseg) + p.xmin END AS xq
  FROM params p JOIN gs g ON g.gi <= p.nseg
  WHERE p.n >= 2),
br AS (
  SELECT g.*, k.j AS kj, k.x AS kx
  FROM grid g ASOF JOIN knots k
    ON g.user_id = k.user_id AND g.event_type = k.event_type
   AND k.x <= g.xq),
idx AS (
  SELECT *, greatest(0, least(n - 2,
           CASE WHEN kx = xq THEN kj - 1 ELSE kj END)) AS ib
  FROM br),
ev AS (
  SELECT i.user_id, i.event_type, i.gi, i.n, i.nseg, i.h, i.xq,
         kl.x AS xl, kl.y AS yl, kr.x AS xr, kr.y AS yr,
         bl.y2 AS y2l, br2.y2 AS y2r
  FROM idx i
  JOIN knots kl ON i.user_id = kl.user_id AND i.event_type = kl.event_type
               AND kl.j = i.ib
  JOIN knots kr ON i.user_id = kr.user_id AND i.event_type = kr.event_type
               AND kr.j = i.ib + 1
  JOIN bwd bl  ON i.user_id = bl.user_id AND i.event_type = bl.event_type
               AND bl.j = i.ib
  JOIN bwd br2 ON i.user_id = br2.user_id AND i.event_type = br2.event_type
               AND br2.j = i.ib + 1),
terms AS (
  SELECT user_id, event_type, gi, n, nseg, h,
         ((xr - xq)/(xr - xl)) AS a,
         ((xq - xl)/(xr - xl)) AS b,
         (xr - xl) AS hj,
         (a*yl + b*yr + ((a*a*a - a)*y2l + (b*b*b - b)*y2r)*(hj*hj)/6.0)
           * ((2.0*h) * (CASE WHEN gi = 0 OR gi = nseg THEN 7.0
                              WHEN gi % 4 = 0 THEN 14.0
                              WHEN gi % 4 = 2 THEN 12.0
                              ELSE 32.0 END) / 45.0) AS term
  FROM ev),
integ AS (
  SELECT user_id, event_type, sum(term ORDER BY gi) AS integral
  FROM terms GROUP BY user_id, event_type)
SELECT m.user_id, m.event_type,
       CAST(CASE WHEN m.n < 2 THEN 0.0 ELSE ig.integral END AS DOUBLE)
         AS integral,
       m.n::BIGINT AS n_points
FROM nmax m
LEFT JOIN integ ig
  ON m.user_id = ig.user_id AND m.event_type = ig.event_type
"""

ORACLES["tpch_q3"] = """
SELECT l.l_orderkey,
       CAST(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(24,8))) AS VARCHAR)
            AS DOUBLE) AS revenue,
       o.o_orderdate AS o_orderdate,
       o.o_orderpriority
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1995-03-15'
  AND l.l_shipdate  > TIMESTAMP '1995-03-15'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
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
       CAST(CAST(sum(CAST(value * (event_id % 5 + 1) AS DECIMAL(24,8))) AS VARCHAR) AS DOUBLE)
         / CAST(sum(event_id % 5 + 1) AS DOUBLE) AS value_wmean
FROM events GROUP BY 1,2,3
"""

ORACLES["counter_rate"] = f"""
WITH q AS (
  SELECT user_id, event_type, ts, event_id,
         floor(value * 100)::BIGINT AS vq
  FROM events),
inc AS (
  SELECT user_id, event_type, ts,
         CASE
           WHEN lag(vq) OVER w IS NULL THEN 0::BIGINT
           WHEN vq >= lag(vq) OVER w THEN vq - lag(vq) OVER w
           ELSE vq
         END AS inc
  FROM q
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id))
SELECT user_id, event_type, {_bucket(3600)} AS bucket_start,
       sum(inc)::BIGINT / 100.0 AS increase,
       sum(inc)::BIGINT / 360000.0 AS rate_per_sec,
       count(*)::BIGINT AS n_samples
FROM inc
GROUP BY 1, 2, 3
"""

ORACLES["m4_downsample"] = f"""
WITH b AS (
  SELECT user_id, event_type, {_bucket(21600)} AS bucket_start,
         ts, event_id, value
  FROM events),
r AS (
  SELECT *,
         row_number() OVER (PARTITION BY user_id, event_type, bucket_start
                            ORDER BY ts ASC, event_id ASC) AS ra,
         row_number() OVER (PARTITION BY user_id, event_type, bucket_start
                            ORDER BY ts DESC, event_id DESC) AS rd
  FROM b)
SELECT user_id, event_type, bucket_start,
       min(value) AS v_min, max(value) AS v_max,
       max(CASE WHEN ra = 1 THEN value END) AS v_first,
       max(CASE WHEN rd = 1 THEN value END) AS v_last,
       count(*)::BIGINT AS n_points
FROM r GROUP BY 1, 2, 3
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
HAVING count(*) >= greatest(1, CAST(floor((SELECT count(*) FROM events) * 0.002) AS BIGINT))
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

ORACLES["tpch_q6"] = """
SELECT CAST(CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(24,8))) AS VARCHAR) AS DOUBLE)
         AS revenue,
       count(*)::BIGINT AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""

ORACLES["tpch_q5"] = """
SELECT n.n_name,
       CAST(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(24,8))) AS VARCHAR)
            AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
               AND c.c_nationkey = s.s_nationkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n.n_name
ORDER BY revenue DESC, n_name ASC
"""

ORACLES["tpch_q1"] = """
-- the wide (24,8) sums cast DECIMAL -> VARCHAR -> DOUBLE: once the
-- unscaled value exceeds 2^53, DuckDB 1.0.0's direct DECIMAL->DOUBLE
-- cast double-rounds (int128 / 10^s computed in doubles) and can land
-- 1 ulp off Spark's correctly-rounded BigDecimal cast (the r5
-- full-catalog sf0.1 sweep's catch: one group's sum_charge);
-- the VARCHAR hop is exact and its string->double parse is correctly
-- rounded.  The (20,6) sums stay under 2^53 unscaled and cast clean.
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(20,6))) AS DOUBLE) AS sum_base_price,
       CAST(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,8))) AS VARCHAR) AS DOUBLE)
         AS sum_disc_price,
       CAST(CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                AS DECIMAL(24,8))) AS VARCHAR) AS DOUBLE) AS sum_charge,
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
       CAST(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(24,8))) AS VARCHAR)
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

ORACLES["hll_distinct_users"] = """
WITH hashed AS (
  SELECT event_type,
         (md5_number_lower(user_id::VARCHAR)::HUGEINT % 512)::BIGINT AS b,
         ((md5_number_lower(user_id::VARCHAR)::HUGEINT // 512)
           % 4294967296)::BIGINT AS w
  FROM events
),
ranked AS (
  SELECT event_type, b,
         CASE WHEN w = 0 THEN 33 WHEN w % 2 = 1 THEN 1 WHEN w % 4 = 2 THEN 2 WHEN w % 8 = 4 THEN 3 WHEN w % 16 = 8 THEN 4 WHEN w % 32 = 16 THEN 5 WHEN w % 64 = 32 THEN 6 WHEN w % 128 = 64 THEN 7 WHEN w % 256 = 128 THEN 8 WHEN w % 512 = 256 THEN 9 WHEN w % 1024 = 512 THEN 10 WHEN w % 2048 = 1024 THEN 11 WHEN w % 4096 = 2048 THEN 12 WHEN w % 8192 = 4096 THEN 13 WHEN w % 16384 = 8192 THEN 14 WHEN w % 32768 = 16384 THEN 15 WHEN w % 65536 = 32768 THEN 16 WHEN w % 131072 = 65536 THEN 17 WHEN w % 262144 = 131072 THEN 18 WHEN w % 524288 = 262144 THEN 19 WHEN w % 1048576 = 524288 THEN 20 WHEN w % 2097152 = 1048576 THEN 21 WHEN w % 4194304 = 2097152 THEN 22 WHEN w % 8388608 = 4194304 THEN 23 WHEN w % 16777216 = 8388608 THEN 24 WHEN w % 33554432 = 16777216 THEN 25 WHEN w % 67108864 = 33554432 THEN 26 WHEN w % 134217728 = 67108864 THEN 27 WHEN w % 268435456 = 134217728 THEN 28 WHEN w % 536870912 = 268435456 THEN 29 WHEN w % 1073741824 = 536870912 THEN 30 WHEN w % 2147483648 = 1073741824 THEN 31 WHEN w % 4294967296 = 2147483648 THEN 32 END AS rank
  FROM hashed
),
buckets AS (
  SELECT event_type, b, max(rank) AS m FROM ranked GROUP BY 1, 2
),
agg AS (
  SELECT event_type, sum(pow(2.0, -m)) AS s, count(*) AS nb
  FROM buckets GROUP BY 1
)
SELECT a.event_type,
       (CASE WHEN ('188686.82445861166'::DOUBLE / (s + (512 - nb))) <= 1280.0 AND (512 - nb) > 0 THEN (['3194.022208020228'::DOUBLE, '2839.130851573536'::DOUBLE, '2631.5327162221556'::DOUBLE, '2484.239495126844'::DOUBLE, '2369.9899968539685'::DOUBLE, '2276.6413597754636'::DOUBLE, '2197.7162117039074'::DOUBLE, '2129.348138680152'::DOUBLE, '2069.0432244240837'::DOUBLE, '2015.0986404072767'::DOUBLE, '1966.2998283474624'::DOUBLE, '1921.7500033287718'::DOUBLE, '1880.7681369999211'::DOUBLE, '1842.8248552572156'::DOUBLE, '1807.5005050558964'::DOUBLE, '1774.45678223346'::DOUBLE, '1743.4169758634453'::DOUBLE, '1714.1518679773917'::DOUBLE, '1686.4694506870105'::DOUBLE, '1660.2072839605846'::DOUBLE, '1635.2267199058354'::DOUBLE, '1611.4084719007703'::DOUBLE, '1588.6491694645033'::DOUBLE, '1566.8586468820797'::DOUBLE, '1545.9577856877092'::DOUBLE, '1525.8767805532293'::DOUBLE, '1506.5537326260114'::DOUBLE, '1487.9334988105236'::DOUBLE, '1469.9667430671532'::DOUBLE, '1452.6091486092043'::DOUBLE, '1435.820759323833'::DOUBLE, '1419.565425786768'::DOUBLE, '1403.81033654939'::DOUBLE, '1388.5256194167534'::DOUBLE, '1373.6840005376482'::DOUBLE, '1359.2605115306997'::DOUBLE, '1345.232236746385'::DOUBLE, '1331.5780942403185'::DOUBLE, '1318.278645201849'::DOUBLE, '1305.3159275138926'::DOUBLE, '1292.6733098676225'::DOUBLE, '1280.3353634591433'::DOUBLE, '1268.287748785124'::DOUBLE, '1256.5171154540783'::DOUBLE, '1245.0110132578243'::DOUBLE, '1233.7578130178113'::DOUBLE, '1222.746635944678'::DOUBLE, '1211.967290435388'::DOUBLE, '1201.4102153875872'::DOUBLE, '1191.0664292410172'::DOUBLE, '1180.9274840653732'::DOUBLE, '1170.9854241065373'::DOUBLE, '1161.2327482815415'::DOUBLE, '1151.6623761793194'::DOUBLE, '1142.267617181203'::DOUBLE, '1133.0421423638315'::DOUBLE, '1123.9799588889382'::DOUBLE, '1115.0753866204614'::DOUBLE, '1106.3230367404997'::DOUBLE, '1097.7177921625125'::DOUBLE, '1089.2547895634927'::DOUBLE, '1080.929402877141'::DOUBLE, '1072.7372281077633'::DOUBLE, '1064.674069340076'::DOUBLE, '1056.735925833662'::DOUBLE, '1048.918980102698'::DOUBLE, '1041.2195868920533'::DOUBLE, '1033.6342629700614'::DOUBLE, '1026.1596776664312'::DOUBLE, '1018.7926440909562'::DOUBLE, '1011.5301109750745'::DOUBLE, '1004.3691550840076'::DOUBLE, '997.3069741522517'::DOUBLE, '990.3408802996931'::DOUBLE, '983.468293889637'::DOUBLE, '976.6867377936264'::DOUBLE, '969.9938320311419'::DOUBLE, '963.387288755157'::DOUBLE, '956.8649075571129'::DOUBLE, '950.4245710672006'::DOUBLE, '944.0642408279393'::DOUBLE, '937.7819534209304'::DOUBLE, '931.5758168283699'::DOUBLE, '925.4440070124514'::DOUBLE, '919.3847646971859'::DOUBLE, '913.3963923384321'::DOUBLE, '907.4772512690811'::DOUBLE, '901.6257590073863'::DOUBLE, '895.8403867173723'::DOUBLE, '890.1196568111322'::DOUBLE, '884.4621406836008'::DOUBLE, '878.8664565711193'::DOUBLE, '873.331267525761'::DOUBLE, '867.855279497986'::DOUBLE, '862.4372395207511'::DOUBLE, '857.0759339886959'::DOUBLE, '851.7701870264959'::DOUBLE, '846.5188589408951'::DOUBLE, '841.320844751318'::DOUBLE, '836.1750727943252'::DOUBLE, '831.0805033975032'::DOUBLE, '826.0361276186812'::DOUBLE, '821.0409660466544'::DOUBLE, '816.0940676598452'::DOUBLE, '811.1945087395761'::DOUBLE, '806.3413918348496'::DOUBLE, '801.533844775732'::DOUBLE, '796.7710197326275'::DOUBLE, '792.0520923189065'::DOUBLE, '787.3762607345109'::DOUBLE, '782.7427449483129'::DOUBLE, '778.1507859171395'::DOUBLE, '773.5996448395096'::DOUBLE, '769.0886024422463'::DOUBLE, '764.616958298244'::DOUBLE, '760.1840301737693'::DOUBLE, '755.7891534037769'::DOUBLE, '751.4316802938076'::DOUBLE, '747.1109795471249'::DOUBLE, '742.8264357158205'::DOUBLE, '738.5774486746966'::DOUBLE, '734.3634331168007'::DOUBLE, '730.1838180695503'::DOUBLE, '726.0380464304491'::DOUBLE, '721.9255745214498'::DOUBLE, '717.8458716610712'::DOUBLE, '713.7984197534292'::DOUBLE, '709.782712893384'::DOUBLE, '705.7982569870519'::DOUBLE, '701.8445693869699'::DOUBLE, '697.9211785412384'::DOUBLE, '694.0276236560061'::DOUBLE, '690.16345437069'::DOUBLE, '686.3282304453613'::DOUBLE, '682.5215214597521'::DOUBLE, '678.7429065233694'::DOUBLE, '674.991973996228'::DOUBLE, '671.2683212197392'::DOUBLE, '667.5715542573138'::DOUBLE, '663.9012876442641'::DOUBLE, '660.2571441466058'::DOUBLE, '656.6387545283825'::DOUBLE, '653.0457573271555'::DOUBLE, '649.4777986373157'::DOUBLE, '645.9345319008938'::DOUBLE, '642.4156177055597'::DOUBLE, '638.920723589515'::DOUBLE, '635.4495238530011'::DOUBLE, '632.0016993761529'::DOUBLE, '628.5769374429451'::DOUBLE, '625.1749315709867'::DOUBLE, '621.7953813469344'::DOUBLE, '618.4379922673011'::DOUBLE, '615.1024755844498'::DOUBLE, '611.7885481575737'::DOUBLE, '608.495932308465'::DOUBLE, '605.2243556818943'::DOUBLE, '601.973551110421'::DOUBLE, '598.7432564834695'::DOUBLE, '595.5332146205086'::DOUBLE, '592.3431731481829'::DOUBLE, '589.1728843812473'::DOUBLE, '586.0221052071657'::DOUBLE, '582.8905969742384'::DOUBLE, '579.7781253831307'::DOUBLE, '576.6844603816779'::DOUBLE, '573.6093760628494'::DOUBLE, '570.5526505657593'::DOUBLE, '567.5140659796143'::DOUBLE, '564.493408250494'::DOUBLE, '561.4904670908661'::DOUBLE, '558.50503589174'::DOUBLE, '555.5369116373652'::DOUBLE, '552.5858948223892'::DOUBLE, '549.6517893713888'::DOUBLE, '546.7344025606943'::DOUBLE, '543.8335449424275'::DOUBLE, '540.9490302706804'::DOUBLE, '538.0806754297614'::DOUBLE, '535.2283003644403'::DOUBLE, '532.3917280121252'::DOUBLE, '529.5707842369088'::DOUBLE, '526.7652977654204'::DOUBLE, '523.9751001244273'::DOUBLE, '521.2000255801257'::DOUBLE, '518.439911079069'::DOUBLE, '515.6945961906796'::DOUBLE, '512.9639230512939'::DOUBLE, '510.24773630969105'::DOUBLE, '507.5458830740591'::DOUBLE, '504.85821286035355'::DOUBLE, '502.1845775420038'::DOUBLE, '499.5248313009266'::DOUBLE, '496.87883057980395'::DOUBLE, '494.24643403558963'::DOUBLE, '491.6275024942031'::DOUBLE, '489.0218989063778'::DOUBLE, '486.429488304626'::DOUBLE, '483.8501377612879'::DOUBLE, '481.28371634763323'::DOUBLE, '478.7300950939812'::DOUBLE, '476.18914695081116'::DOUBLE, '473.66074675083286'::DOUBLE, '471.1447711719892'::DOUBLE, '468.641098701363'::DOUBLE, '466.14960959996245'::DOUBLE, '463.670185868359'::DOUBLE, '461.20271121315324'::DOUBLE, '458.74707101424474'::DOUBLE, '456.3031522928841'::DOUBLE, '453.870843680482'::DOUBLE, '451.4500353881576'::DOUBLE, '449.0406191770023'::DOUBLE, '446.64248832903996'::DOUBLE, '444.25553761886465'::DOUBLE, '441.87966328593546'::DOUBLE, '439.51476300751267'::DOUBLE, '437.16073587221445'::DOUBLE, '434.81748235417956'::DOUBLE, '432.48490428781884'::DOUBLE, '430.16290484313856'::DOUBLE, '427.85138850162093'::DOUBLE, '425.5502610326472'::DOUBLE, '423.25942947044757'::DOUBLE, '420.9788020915649'::DOUBLE, '418.7082883928176'::DOUBLE, '416.44779906974986'::DOUBLE, '414.1972459955543'::DOUBLE, '411.95654220045725'::DOUBLE, '409.72560185155197'::DOUBLE, '407.5043402330697'::DOUBLE, '405.2926737270773'::DOUBLE, '403.0905197945893'::DOUBLE, '400.8977969570849'::DOUBLE, '398.7144247784186'::DOUBLE, '396.54032384711564'::DOUBLE, '394.3754157590408'::DOUBLE, '392.2196231004329'::DOUBLE, '390.07286943129446'::DOUBLE, '387.93507926912844'::DOUBLE, '385.80617807301263'::DOUBLE, '383.68609222800455'::DOUBLE, '381.57474902986723'::DOUBLE, '379.47207667010866'::DOUBLE, '377.37800422132784'::DOUBLE, '375.2924616228583'::DOUBLE, '373.21537966670365'::DOUBLE, '371.1466899837571'::DOUBLE, '369.08632503029764'::DOUBLE, '367.0342180747578'::DOUBLE, '364.9903031847546'::DOUBLE, '362.9545152143792'::DOUBLE, '360.9267897917376'::DOUBLE, '358.90706330673726'::DOUBLE, '356.8952728991138'::DOUBLE, '354.891356446692'::DOUBLE, '352.8952525538755'::DOUBLE, '350.90690054035986'::DOUBLE, '348.9262404300647'::DOUBLE, '346.9532129402778'::DOUBLE, '344.9877594710089'::DOUBLE, '343.0298220945464'::DOUBLE, '341.0793435452125'::DOUBLE, '339.1362672093141'::DOUBLE, '337.2005371152822'::DOUBLE, '335.27209792399805'::DOUBLE, '333.35089491930023'::DOUBLE, '331.43687399866934'::DOUBLE, '329.52998166408634'::DOUBLE, '327.63016501306015'::DOUBLE, '325.7373717298211'::DOUBLE, '323.85155007667737'::DOUBLE, '321.9726488855286'::DOUBLE, '320.100617549536'::DOUBLE, '318.23540601494346'::DOUBLE, '316.3769647730472'::DOUBLE, '314.52524485231066'::DOUBLE, '312.68019781062185'::DOUBLE, '310.8417757276888'::DOUBLE, '309.00993119757214'::DOUBLE, '307.1846173213501'::DOUBLE, '305.3657876999138'::DOUBLE, '303.5533964268903'::DOUBLE, '301.7473980816905'::DOUBLE, '299.9477477226789'::DOUBLE, '298.15440088046347'::DOUBLE, '296.367313551302'::DOUBLE, '294.58644219062364'::DOUBLE, '292.81174370666275'::DOUBLE, '291.0431754542019'::DOUBLE, '289.2806952284238'::DOUBLE, '287.5242612588677'::DOUBLE, '285.7738322034895'::DOUBLE, '284.029367142823'::DOUBLE, '282.2908255742402'::DOUBLE, '280.5581674063091'::DOUBLE, '278.83135295324576'::DOUBLE, '277.1103429294609'::DOUBLE, '275.39509844419655'::DOUBLE, '273.68558099625307'::DOUBLE, '271.9817524688036'::DOUBLE, '270.2835751242947'::DOUBLE, '268.591011599431'::DOUBLE, '266.90402490024246'::DOUBLE, '265.22257839723324'::DOUBLE, '263.546635820609'::DOUBLE, '261.87616125558304'::DOUBLE, '260.2111191377579'::DOUBLE, '258.55147424858234'::DOUBLE, '256.8971917108817'::DOUBLE, '255.2482369844601'::DOUBLE, '253.60457586177301'::DOUBLE, '251.96617446366952'::DOUBLE, '250.3329992352023'::DOUBLE, '248.70501694150386'::DOUBLE, '247.08219466372898'::DOUBLE, '245.4644997950603'::DOUBLE, '243.85190003677747'::DOUBLE, '242.24436339438753'::DOUBLE, '240.64185817381664'::DOUBLE, '239.04435297765986'::DOUBLE, '237.4518167014909'::DOUBLE, '235.86421853022787'::DOUBLE, '234.2815279345553'::DOUBLE, '232.70371466740238'::DOUBLE, '231.1307487604737'::DOUBLE, '229.56260052083425'::DOUBLE, '227.99924052754642'::DOUBLE, '226.4406396283576'::DOUBLE, '224.88676893643873'::DOUBLE, '223.33759982717177'::DOUBLE, '221.79310393498588'::DOUBLE, '220.25325315024074'::DOUBLE, '218.7180196161574'::DOUBLE, '217.18737572579397'::DOUBLE, '215.66129411906738'::DOUBLE, '214.1397476798188'::DOUBLE, '212.62270953292236'::DOUBLE, '211.11015304143746'::DOUBLE, '209.60205180380197'::DOUBLE, '208.09837965106738'::DOUBLE, '206.59911064417412'::DOUBLE, '205.10421907126675'::DOUBLE, '203.61367944504804'::DOUBLE, '202.1274665001718'::DOUBLE, '200.64555519067315'::DOUBLE, '199.16792068743604'::DOUBLE, '197.6945383756971'::DOUBLE, '196.22538385258525'::DOUBLE, '194.7604329246968'::DOUBLE, '193.29966160570473'::DOUBLE, '191.84304611400228'::DOUBLE, '190.39056287038005'::DOUBLE, '188.94218849573548'::DOUBLE, '187.49789980881513'::DOUBLE, '186.05767382398838'::DOUBLE, '184.6214877490528'::DOUBLE, '183.18931898306946'::DOUBLE, '181.7611451142292'::DOUBLE, '180.3369439177483'::DOUBLE, '178.91669335379297'::DOUBLE, '177.50037156543317'::DOUBLE, '176.0879568766244'::DOUBLE, '174.6794277902168'::DOUBLE, '173.27476298599234'::DOUBLE, '171.87394131872847'::DOUBLE, '170.476941816288'::DOUBLE, '169.08374367773533'::DOUBLE, '167.69432627147808'::DOUBLE, '166.3086691334337'::DOUBLE, '164.92675196522123'::DOUBLE, '163.54855463237698'::DOUBLE, '162.17405716259444'::DOUBLE, '160.8032397439876'::DOUBLE, '159.43608272337764'::DOUBLE, '158.07256660460197'::DOUBLE, '156.71267204684645'::DOUBLE, '155.35637986299906'::DOUBLE, '154.00367101802567'::DOUBLE, '152.65452662736706'::DOUBLE, '151.3089279553571'::DOUBLE, '149.96685641366153'::DOUBLE, '148.62829355973724'::DOUBLE, '147.2932210953118'::DOUBLE, '145.96162086488246'::DOUBLE, '144.6334748542346'::DOUBLE, '143.30876518897972'::DOUBLE, '141.987474133112'::DOUBLE, '140.66958408758344'::DOUBLE, '139.35507758889761'::DOUBLE, '138.04393730772074'::DOUBLE, '136.7361460475111'::DOUBLE, '135.43168674316627'::DOUBLE, '134.13054245968584'::DOUBLE, '132.83269639085358'::DOUBLE, '131.538131857934'::DOUBLE, '130.24683230838647'::DOUBLE, '128.95878131459588'::DOUBLE, '127.67396257261787'::DOUBLE, '126.39235990094122'::DOUBLE, '125.11395723926455'::DOUBLE, '123.83873864728919'::DOUBLE, '122.5666883035263'::DOUBLE, '121.29779050411916'::DOUBLE, '120.03202966167994'::DOUBLE, '118.76939030414088'::DOUBLE, '117.50985707361934'::DOUBLE, '116.25341472529719'::DOUBLE, '115.00004812631349'::DOUBLE, '113.749742254671'::DOUBLE, '112.50248219815587'::DOUBLE, '111.25825315327043'::DOUBLE, '110.01704042417924'::DOUBLE, '108.778829421667'::DOUBLE, '107.54360566211051'::DOUBLE, '106.3113547664612'::DOUBLE, '105.08206245924161'::DOUBLE, '103.85571456755274'::DOUBLE, '102.63229702009349'::DOUBLE, '101.41179584619206'::DOUBLE, '100.19419717484872'::DOUBLE, '98.97948723378998'::DOUBLE, '97.76765234853366'::DOUBLE, '96.55867894146559'::DOUBLE, '95.35255353092653'::DOUBLE, '94.14926273031034'::DOUBLE, '92.94879324717222'::DOUBLE, '91.75113188234799'::DOUBLE, '90.55626552908329'::DOUBLE, '89.36418117217262'::DOUBLE, '88.17486588710909'::DOUBLE, '86.98830683924348'::DOUBLE, '85.80449128295318'::DOUBLE, '84.6234065608207'::DOUBLE, '83.44504010282172'::DOUBLE, '82.26937942552244'::DOUBLE, '81.09641213128583'::DOUBLE, '79.92612590748755'::DOUBLE, '78.75850852574023'::DOUBLE, '77.59354784112685'::DOUBLE, '76.43123179144285'::DOUBLE, '75.27154839644659'::DOUBLE, '74.1144857571185'::DOUBLE, '72.9600320549289'::DOUBLE, '71.80817555111304'::DOUBLE, '70.65890458595517'::DOUBLE, '69.51220757808073'::DOUBLE, '68.36807302375556'::DOUBLE, '67.22648949619376'::DOUBLE, '66.08744564487289'::DOUBLE, '64.95093019485667'::DOUBLE, '63.816931946125614'::DOUBLE, '62.68543977291457'::DOUBLE, '61.55644262305786'::DOUBLE, '60.42992951734137'::DOUBLE, '59.30588954886228'::DOUBLE, '58.184311882395164'::DOUBLE, '57.06518575376526'::DOUBLE, '55.94850046922892'::DOUBLE, '54.83424540485996'::DOUBLE, '53.722410005943956'::DOUBLE, '52.6129837863777'::DOUBLE, '51.505956328076174'::DOUBLE, '50.401317280385285'::DOUBLE, '49.299056359501556'::DOUBLE, '48.1991633478973'::DOUBLE, '47.10162809375259'::DOUBLE, '46.006440510392906'::DOUBLE, '44.91359057573294'::DOUBLE, '43.82306833172661'::DOUBLE, '42.73486388382209'::DOUBLE, '41.64896740042363'::DOUBLE, '40.565369112358326'::DOUBLE, '39.484059312348776'::DOUBLE, '38.40502835449168'::DOUBLE, '37.32826665374092'::DOUBLE, '36.25376468539731'::DOUBLE, '35.181512984602485'::DOUBLE, '34.11150214583933'::DOUBLE, '33.043722822436436'::DOUBLE, '31.97816572607829'::DOUBLE, '30.91482162632063'::DOUBLE, '29.853681350110808'::DOUBLE, '28.794735781312568'::DOUBLE, '27.737975860236602'::DOUBLE, '26.68339258317522'::DOUBLE, '25.630977001942032'::DOUBLE, '24.58072022341666'::DOUBLE, '23.532613409093557'::DOUBLE, '22.486647774635816'::DOUBLE, '21.4428145894334'::DOUBLE, '20.401105176166286'::DOUBLE, '19.361510910370644'::DOUBLE, '18.324023220011668'::DOUBLE, '17.28863358505855'::DOUBLE, '16.2553335370651'::DOUBLE, '15.224114658754122'::DOUBLE, '14.194968583605641'::DOUBLE, '13.167886995450386'::DOUBLE, '12.142861628065825'::DOUBLE, '11.119884264777166'::DOUBLE, '10.09894673806263'::DOUBLE, '9.08004092916146'::DOUBLE, '8.063158767687225'::DOUBLE, '7.048292231243761'::DOUBLE, '6.035433345045592'::DOUBLE, '5.024574181542231'::DOUBLE, '4.01570686004525'::DOUBLE, '3.008823546360305'::DOUBLE, '2.003916452421793'::DOUBLE, '1.000977835931287'::DOUBLE, '0.0'::DOUBLE])[512 - nb] ELSE '188686.82445861166'::DOUBLE / (s + (512 - nb)) END)::DOUBLE
         AS hll_estimate,
       e.exact_distinct
FROM agg a
JOIN (SELECT event_type, count(DISTINCT user_id)::BIGINT AS exact_distinct
      FROM events GROUP BY 1) e USING (event_type)
"""

ORACLES["set_ops_users"] = f"""
WITH d1 AS (SELECT user_id FROM events
            WHERE {_bucket(86400)} = TIMESTAMP '2024-01-01'),
d2 AS (SELECT user_id FROM events
       WHERE {_bucket(86400)} = TIMESTAMP '2024-01-02')
SELECT 'both' AS segment, user_id FROM (SELECT user_id FROM d1 INTERSECT SELECT user_id FROM d2)
UNION ALL
SELECT 'day1_only', user_id FROM (SELECT DISTINCT user_id FROM d1 EXCEPT SELECT user_id FROM d2)
"""

# ----------------------------------- expression-definition front-end
# Twin of queries.DERIVED_DEFS: each SQL expression mirrors the
# compiled Catalyst expression's evaluation order exactly (v**2
# compiles to v*v; convert ms->s is value*0.001 + 0.0).
ORACLES["derived_defs"] = """
SELECT event_id,
       value::DOUBLE AS v0,
       (-value)::DOUBLE AS v_neg,
       (value*value - 3.0*value + 2.0)::DOUBLE AS v_poly,
       least(greatest(value, 50.0), 500.0)::DOUBLE AS v_clamped,
       sqrt(value)::DOUBLE AS v_root,
       value > 250.0 AS v_big,
       9.5::DOUBLE AS v_fold,
       ((value + (-value)) * 0.5)::DOUBLE AS v_mix,
       (CASE WHEN value > 250.0 THEN value ELSE -value END)::DOUBLE AS v_where,
       (value * 0.001 + 0.0)::DOUBLE AS v_s
FROM events
"""

ORACLES["derived_agg_defs"] = """
SELECT event_type,
       count(value)::BIGINT AS n,
       CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE) / count(value) AS v_mean,
       CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS v_sum,
       (max(value) - min(value))::DOUBLE AS v_span
FROM events GROUP BY 1
"""


# ----------------------------------------- TEM diagnostics (DynVarMIP)
def _deriv_case_sql(y: str) -> str:
    """The 3-point nonuniform derivative of column family {y, y0, y2,
    y3, ym2} over the shared t-lags (x0, x2, x3, xm2) — identical op
    order to operators/stencil.deriv3 (bit-exact, proven by the
    stencil_deriv3 gate)."""
    y0, y2, y3, ym2 = f"{y}0", f"{y}2", f"{y}3", f"{y}m2"
    return f"""CASE
    WHEN x0 IS NULL THEN
      {y} * ((t - x2) + (t - x3)) / ((t - x2) * (t - x3))
      - {y2} * ((t - x3) / ((t - x2) * (x2 - x3)))
      + {y3} * ((t - x2) / ((t - x3) * (x2 - x3)))
    WHEN x2 IS NULL THEN
      -{ym2} * ((x0 - t) / ((xm2 - x0) * (xm2 - t)))
      + {y0} * ((xm2 - t) / ((xm2 - x0) * (x0 - t)))
      - {y} * ((xm2 - t) + (x0 - t)) / ((xm2 - t) * (x0 - t))
    ELSE
      {y0} * ((t - x2) / ((x0 - t) * (x0 - x2)))
      + {y} * (1.0 / (t - x2) - 1.0 / (x0 - t))
      - {y2} * ((x0 - t) / ((x0 - x2) * (t - x2)))
  END"""


def _lags_sql(cols: list[str]) -> str:
    """t-lags plus per-column neighbor lags over the shared window."""
    parts = [
        "lag(t) OVER w AS x0",
        "lead(t) OVER w AS x2",
        "lead(t, 2) OVER w AS x3",
        "lag(t, 2) OVER w AS xm2",
    ]
    for y in cols:
        parts += [
            f"lag({y}) OVER w AS {y}0",
            f"lead({y}) OVER w AS {y}2",
            f"lead({y}, 2) OVER w AS {y}3",
            f"lag({y}, 2) OVER w AS {y}m2",
        ]
    return ",\n         ".join(parts)


_H_SCALE_LIT = "'0.014285714285714285'::DOUBLE"  # 100.0/7000.0, exact double

ORACLES["tem_diagnostics_series"] = f"""
WITH tier AS ({_HOURLY_SUBSET}),
pts AS (
  SELECT user_id, event_type,
         (epoch_ms(bucket_start)//1000)::DOUBLE AS t,
         value_sum AS u,
         n_events::DOUBLE AS th,
         value_sum / n_events AS v,
         1.0 + user_id / 100.0 AS c,
         user_id / 50.0 AS f,
         value_sum * (1.0 + user_id / 100.0) AS uc
  FROM tier
),
nb1 AS (
  SELECT *, {_lags_sql(["th", "u", "uc"])}
  FROM pts WINDOW w AS (PARTITION BY user_id, event_type ORDER BY t)
),
d1 AS (
  SELECT user_id, event_type, t, u, th, v, c, f,
         {_deriv_case_sql("th")} AS dth,
         {_deriv_case_sql("u")} AS du,
         {_deriv_case_sql("uc")} AS duc
  FROM nb1
),
d1b AS (
  SELECT *, CASE WHEN dth <> 0.0 AND isfinite(u / dth) THEN u / dth END AS psi
  FROM d1
),
d1c AS (
  SELECT *, psi * c AS psic,
         c * (du * psi - u * v) AS epfy,
         c * (f - duc / (2.0 * c)) * psi AS epfz
  FROM d1b
),
d1d AS (SELECT *, epfy * c AS epfyc FROM d1c),
nb2 AS (
  SELECT user_id, event_type, t, u, v, c, f, du, duc, epfy, epfz,
         psi, psic, epfyc,
         {_lags_sql(["psi", "psic", "epfyc", "epfz"])}
  FROM d1d WINDOW w AS (PARTITION BY user_id, event_type ORDER BY t)
),
fin AS (
  SELECT user_id, event_type, t, u, v, c, f, du, duc, epfy, epfz,
         {_deriv_case_sql("psi")} AS dpsi,
         {_deriv_case_sql("psic")} AS dpsic,
         {_deriv_case_sql("epfyc")} AS depfyc,
         {_deriv_case_sql("epfz")} AS depfz
  FROM nb2
)
SELECT user_id, event_type, t,
       (-u * {_H_SCALE_LIT} + dpsic / (2.0 * c))::DOUBLE AS wtem,
       (v - dpsi)::DOUBLE AS vtem,
       ((v - dpsi) * (f - duc / (2.0 * c)))::DOUBLE AS utendvtem,
       (-(-u * {_H_SCALE_LIT} + dpsic / (2.0 * c)) * du)::DOUBLE AS utendwtem,
       epfy::DOUBLE AS epfy,
       epfz::DOUBLE AS epfz,
       ((depfyc / c + depfz) / 2.0)::DOUBLE AS utendepfd
FROM fin
"""

# ----------------------------------------------- multimodal binary meta
# Twin of queries.media_binary_meta: DuckDB sha256 takes VARCHAR and
# hashes its UTF-8 bytes — identical to Spark's sha2 over the encoded
# payload; strlen counts bytes.
ORACLES["media_binary_meta"] = """
SELECT event_id,
       ['image','audio','video'][(event_id % 3 + 1)::INT] AS kind,
       strlen(repeat('blob-' || event_id || '|', (event_id % 7 + 1)::INT))::BIGINT
         AS n_bytes,
       sha256(repeat('blob-' || event_id || '|', (event_id % 7 + 1)::INT))
         AS payload_sha
FROM events
"""

# ------------------------------------- defs-driven tier rollup (1h)
ORACLES["defs_rollup_1h"] = f"""
SELECT user_id, event_type, {_bucket(3600)} AS bucket_start,
       count(value)::BIGINT AS n_events,
       CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS v_sum,
       CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE) / count(value) AS v_mean,
       (max(value) - min(value))::DOUBLE AS v_span,
       (count(value) / 3600.0)::DOUBLE AS v_rate
FROM events GROUP BY 1,2,3
"""

# ------------------------------------------- range (interval) join
ORACLES["range_join_windows"] = """
WITH users AS (SELECT DISTINCT user_id FROM events),
iv AS (
  SELECT user_id, k,
         TIMESTAMP '2024-01-01 00:00:00'
           + (k * 7) * INTERVAL 1 DAY
           + (user_id % 24) * INTERVAL 1 HOUR AS w_start,
         TIMESTAMP '2024-01-01 00:00:00'
           + (k * 7) * INTERVAL 1 DAY
           + (user_id % 24 + user_id % 3 + 1) * INTERVAL 1 HOUR AS w_end
  FROM users, (SELECT unnest([0, 1, 2, 3]) AS k) ks
)
SELECT e.user_id, e.event_id::BIGINT AS event_id, iv.k::INT AS k
FROM events e
JOIN iv ON e.user_id = iv.user_id
       AND e.ts >= iv.w_start AND e.ts <= iv.w_end
"""

# -------------------------------------------- exact discrete percentiles
ORACLES["percentiles_by_type"] = """
WITH ranked AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rk,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
),
p50 AS (
  SELECT event_type, min(value) AS p50 FROM ranked
  WHERE rk = CAST(floor((n - 1) * 0.5) AS BIGINT) + 1 GROUP BY 1
),
p95 AS (
  SELECT event_type, min(value) AS p95 FROM ranked
  WHERE rk = CAST(floor((n - 1) * 0.95) AS BIGINT) + 1 GROUP BY 1
)
SELECT p50.event_type, p50::DOUBLE AS p50, p95::DOUBLE AS p95
FROM p50 JOIN p95 ON p50.event_type = p95.event_type
"""


# ---------------------------------------- Count-Min Sketch estimates
def _cms_hash_sql(i: int) -> str:
    return f"(md5_number_lower('cms{i}|' || user_id::VARCHAR) % 512)"


_CMS_CELLS = "\nUNION ALL\n".join(
    f"SELECT {i} AS r, {_cms_hash_sql(i)}::BIGINT AS b FROM events"
    for i in range(4)
)
_CMS_KEYED = "\nUNION ALL\n".join(
    f"SELECT user_id, exact_count, {i} AS r, {_cms_hash_sql(i)}::BIGINT AS b FROM keys"
    for i in range(4)
)

ORACLES["cms_user_counts"] = f"""
WITH cells AS ({_CMS_CELLS}),
sketch AS (SELECT r, b, count(*)::BIGINT AS cell_count FROM cells GROUP BY 1, 2),
keys AS (SELECT user_id, count(*)::BIGINT AS exact_count FROM events GROUP BY 1),
keyed AS ({_CMS_KEYED})
SELECT k.user_id, min(s.cell_count)::BIGINT AS cms_estimate,
       k.exact_count::BIGINT AS exact_count
FROM keyed k JOIN sketch s ON k.r = s.r AND k.b = s.b
GROUP BY k.user_id, k.exact_count
"""

ORACLES["tpch_q4"] = """
SELECT o_orderpriority, count(*)::BIGINT AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate <  TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY 1 ORDER BY 1
"""

ORACLES["tpch_q10"] = """
WITH by_cust AS (
  SELECT o.o_custkey,
         sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(24,8))) AS rev
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_returnflag = 'R'
    AND o.o_orderdate >= TIMESTAMP '1996-01-01'
    AND o.o_orderdate <  TIMESTAMP '1996-04-01'
  GROUP BY 1)
SELECT c.c_custkey::BIGINT AS c_custkey, c.c_name,
       CAST(b.rev AS DOUBLE) AS revenue, c.c_acctbal, n.n_name
FROM by_cust b
JOIN customer c ON b.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""

ORACLES["tpch_q14"] = """
SELECT CAST(sum(CASE WHEN p.p_type = 'PROMO'
                     THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(24,8))
                     ELSE CAST(0 AS DECIMAL(24,8)) END) * 100 AS DOUBLE)
       / CAST(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(24,8))) AS VARCHAR)
              AS DOUBLE) AS promo_pct,
       CAST(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(24,8))) AS VARCHAR)
            AS DOUBLE) AS total_revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
  AND l.l_shipdate <  TIMESTAMP '1996-04-01'
"""

ORACLES["tpch_q18"] = """
WITH big AS (
  SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(20,6))) AS sq
  FROM lineitem GROUP BY 1
  HAVING sum(CAST(l_quantity AS DECIMAL(20,6))) > 300)
SELECT c.c_name, c.c_custkey::BIGINT AS c_custkey,
       o.o_orderkey::BIGINT AS o_orderkey, o.o_orderdate, o.o_totalprice,
       CAST(b.sq AS DOUBLE) AS sum_qty
FROM big b
JOIN orders o   ON b.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY o.o_totalprice DESC, o_orderkey ASC
"""

ORACLES["anomaly_zscore"] = f"""
WITH q AS (
  SELECT user_id, event_type, ts, event_id, value,
         floor(value * 100)::BIGINT AS vq
  FROM events),
agg AS (
  SELECT user_id, event_type, ts, event_id, value,
         count(*) OVER w AS n,
         sum(vq) OVER w AS s,
         sum(vq * vq) OVER w AS qq,
         vq
  FROM q
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id
               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)),
z AS (
  SELECT user_id, event_type, ts, event_id::BIGINT AS event_id, value,
         CASE WHEN (n - 1) > 0 AND (n * (n * qq - s * s)) > 0
              THEN (n * vq - s) / sqrt((n * (n * qq - s * s)) / (n - 1))
         END AS zscore
  FROM agg)
SELECT user_id, event_type, ts, event_id, value, zscore,
       coalesce(abs(zscore) > 3.0, FALSE) AS is_anomaly
FROM z
"""

_EWMA_TERMS = " + ".join(
    f"coalesce(lag(vq, {k}) OVER w * {1 << (16 - 1 - k)}, 0)" if k
    else f"vq * {1 << 15}"
    for k in range(16)
)
ORACLES["ewma_smooth"] = f"""
WITH q AS (
  SELECT user_id, event_type, ts, event_id, value,
         floor(value * 100)::BIGINT AS vq
  FROM events),
s AS (
  SELECT user_id, event_type, ts, event_id::BIGINT AS event_id, value,
         ({_EWMA_TERMS}) AS s_scaled,
         least(row_number() OVER w, 16) AS m
  FROM q
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id))
SELECT user_id, event_type, ts, event_id, value,
       s_scaled / CAST((65536 - (1 << (16 - m)::INTEGER)) * 100 AS DOUBLE)
         AS ewma
FROM s
"""

ORACLES["slo_burn_rate"] = f"""
WITH hourly AS (
  SELECT user_id, {_bucket(3600)} AS bucket_start,
         count(*)::BIGINT AS t1,
         sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS e1
  FROM events GROUP BY 1, 2),
win AS (
  SELECT user_id, bucket_start, t1, e1,
         sum(t1) OVER w6::BIGINT AS t6,
         sum(e1) OVER w6::BIGINT AS e6
  FROM hourly
  WINDOW w6 AS (PARTITION BY user_id, {_bucket(21600, "bucket_start")}))
SELECT user_id, bucket_start,
       t1 AS total_1h, e1 AS err_1h, t6 AS total_6h, e6 AS err_6h,
       e1 / CAST(t1 AS DOUBLE) AS ratio_1h,
       CASE WHEN e6 > 0 AND t1 > 0
            THEN (e1 * t6) / CAST(t1 * e6 AS DOUBLE) END AS burn_rate
FROM win
"""

ORACLES["lttb_downsample"] = f"""
WITH pts AS (
  SELECT user_id, event_type, ts, event_id, value,
         {_bucket(21600)} AS bucket_start,
         (epoch_ms(ts)//1000) AS x,
         floor(value * 100)::BIGINT AS y
  FROM events),
cent AS (
  SELECT user_id, event_type, bucket_start,
         sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy, count(*)::BIGINT AS n
  FROM pts GROUP BY 1, 2, 3),
nbr AS (
  SELECT user_id, event_type, bucket_start,
         lag(sx) OVER w AS sxp, lag(sy) OVER w AS syp, lag(n) OVER w AS np,
         lead(sx) OVER w AS sxn, lead(sy) OVER w AS syn, lead(n) OVER w AS nn
  FROM cent
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY bucket_start)),
keyed AS (
  SELECT p.user_id, p.event_type, p.bucket_start, p.ts, p.event_id::BIGINT AS event_id,
         p.value,
         CASE WHEN b.np IS NOT NULL AND b.nn IS NOT NULL THEN abs(
           ( (b.sxp - b.np * (epoch_ms(p.bucket_start)//1000))::HUGEINT * b.nn::HUGEINT
             - (b.sxn - b.nn * (epoch_ms(p.bucket_start)//1000))::HUGEINT * b.np::HUGEINT )
           * (p.y::HUGEINT * b.np::HUGEINT - b.syp::HUGEINT)
           - ( (b.sxp - b.np * (epoch_ms(p.bucket_start)//1000))::HUGEINT
               - (p.x - (epoch_ms(p.bucket_start)//1000))::HUGEINT * b.np::HUGEINT )
           * (b.syn::HUGEINT * b.np::HUGEINT - b.syp::HUGEINT * b.nn::HUGEINT) )
         ELSE -(p.x - (epoch_ms(p.bucket_start)//1000))::HUGEINT
         END AS k
  FROM pts p
  JOIN nbr b USING (user_id, event_type, bucket_start)),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY user_id, event_type, bucket_start
                               ORDER BY k DESC, ts ASC, event_id ASC) AS rn
  FROM keyed)
SELECT user_id, event_type, bucket_start, ts, event_id, value
FROM ranked WHERE rn = 1
"""

_HIST_CASE = ("CASE "
    + " ".join(f"WHEN value <= {int(b)} THEN CAST({int(b)} AS DOUBLE)"
               for b in [1, 2, 5, 10, 20, 50, 100, 200, 500])
    + " END")
_HIST_LO = ("CASE "
    + " ".join(f"WHEN le_q = {int(b)} THEN CAST({int(p)} AS DOUBLE)"
               for p, b in zip([0, 1, 2, 5, 10, 20, 50, 100, 200],
                               [1, 2, 5, 10, 20, 50, 100, 200, 500]))
    + " END")
ORACLES["histogram_quantile"] = f"""
WITH binned AS (
  SELECT event_type, {_HIST_CASE} AS le FROM events),
bins AS (
  SELECT event_type, le, count(*)::BIGINT AS cnt FROM binned GROUP BY 1, 2),
cum AS (
  SELECT event_type, le, cnt,
         sum(cnt) OVER (PARTITION BY event_type ORDER BY le NULLS LAST
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum,
         sum(cnt) OVER (PARTITION BY event_type)::BIGINT AS total
  FROM bins),
targets AS (
  SELECT c.*, qs.q, qs.q * c.total AS target
  FROM cum c CROSS JOIN (SELECT unnest(['0.5'::DOUBLE, '0.9'::DOUBLE,
                                        '0.99'::DOUBLE]) AS q) qs),
picked AS (
  SELECT event_type, q, le AS le_q, cnt, cum, target,
         row_number() OVER (PARTITION BY event_type, q ORDER BY le NULLS LAST) AS rn
  FROM targets WHERE cum >= target)
SELECT event_type, q,
       CASE WHEN le_q IS NULL THEN CAST(500.0 AS DOUBLE)
            ELSE {_HIST_LO} + (le_q - {_HIST_LO})
              * (target - (cum - cnt)) / CAST(cnt AS DOUBLE) END AS q_value
FROM picked WHERE rn = 1
"""

ORACLES["tpch_q7"] = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
       CAST(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(24,8))) AS VARCHAR)
            AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
WHERE n1.n_name IN ('NATION_9', 'NATION_10')
  AND n2.n_name IN ('NATION_9', 'NATION_10')
  AND n1.n_name <> n2.n_name
  AND l.l_shipdate >= TIMESTAMP '1995-01-01'
  AND l.l_shipdate <  TIMESTAMP '1997-01-01'
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""

ORACLES["tpch_q8"] = """
WITH j AS (
  SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
         CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(24,8)) AS rev,
         ns.n_name AS supp_nation
  FROM lineitem l
  JOIN part p     ON l.l_partkey = p.p_partkey
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation nc  ON c.c_nationkey = nc.n_nationkey
  JOIN region r   ON nc.n_regionkey = r.r_regionkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
  WHERE r.r_name = 'AMERICA'
    AND p.p_type = 'STANDARD'
    AND o.o_orderdate >= TIMESTAMP '1995-01-01'
    AND o.o_orderdate <  TIMESTAMP '1997-01-01')
SELECT o_year,
       CAST(sum(CASE WHEN supp_nation = 'NATION_9' THEN rev
                     ELSE CAST(0 AS DECIMAL(24,8)) END) AS DOUBLE)
         / CAST(sum(rev) AS DOUBLE) AS mkt_share,
       CAST(sum(rev) AS DOUBLE) AS total_revenue
FROM j GROUP BY 1 ORDER BY 1
"""

ORACLES["tpch_q13"] = """
WITH per_cust AS (
  SELECT c.c_custkey, count(o.o_orderkey)::BIGINT AS c_count
  FROM customer c
  LEFT OUTER JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY 1)
SELECT c_count, count(*)::BIGINT AS custdist
FROM per_cust GROUP BY 1
ORDER BY custdist DESC, c_count DESC
"""

ORACLES["flatline_detect"] = """
WITH q AS (
  SELECT user_id, event_type, ts, event_id,
         floor(value / 10)::BIGINT AS vq
  FROM events),
flagged AS (
  SELECT user_id, event_type, ts, event_id, vq,
         CASE WHEN lag(vq) OVER w IS NULL OR lag(vq) OVER w <> vq
              THEN 1 ELSE 0 END AS changed
  FROM q
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)),
runs AS (
  SELECT user_id, event_type, ts, vq,
         sum(changed) OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS run_id
  FROM flagged)
SELECT user_id, event_type, run_id::BIGINT AS run_id,
       min(ts) AS run_start, max(ts) AS run_end,
       count(*)::BIGINT AS run_len,
       (min(vq) * 10)::BIGINT AS band_low
FROM runs GROUP BY 1, 2, 3
HAVING count(*) >= 2
"""

ORACLES["tiered_read"] = f"""
SELECT '1m' AS tier, user_id, event_type, {_bucket(60)} AS bucket_start,
       count(*)::BIGINT AS n_events,
       CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS value_sum
FROM events WHERE ts >= TIMESTAMP '2024-01-24' GROUP BY 2, 3, 4
UNION ALL
SELECT '1h', user_id, event_type, {_bucket(3600)},
       count(*)::BIGINT,
       CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE)
FROM events WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-24'
GROUP BY 2, 3, 4
UNION ALL
SELECT '1d', user_id, event_type, {_bucket(86400)},
       count(*)::BIGINT,
       CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE)
FROM events WHERE ts < TIMESTAMP '2024-01-10' GROUP BY 2, 3, 4
"""

ORACLES["seasonal_baseline"] = f"""
WITH hourly AS (
  SELECT user_id, event_type, {_bucket(3600)} AS bucket_start,
         CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS value_sum,
         count(*)::BIGINT AS n_events
  FROM events GROUP BY 1, 2, 3)
SELECT c.user_id, c.event_type, c.bucket_start, c.n_events, c.value_sum,
       b.value_sum AS baseline_sum,
       c.value_sum - b.value_sum AS residual
FROM hourly c
LEFT OUTER JOIN hourly b
  ON c.user_id = b.user_id AND c.event_type = b.event_type
 AND (epoch_ms(c.bucket_start)//1000) = (epoch_ms(b.bucket_start)//1000) + 86400
"""

ORACLES["interarrival_stats"] = """
WITH gaps AS (
  SELECT user_id, event_type,
         (epoch_ms(ts)//1000) - (epoch_ms(lag(ts) OVER w)//1000) AS gap_s
  FROM events
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id))
SELECT user_id, event_type,
       count(gap_s)::BIGINT AS n_gaps,
       min(gap_s)::BIGINT AS gap_min_s,
       max(gap_s)::BIGINT AS gap_max_s,
       sum(gap_s)::BIGINT / CAST(count(gap_s) AS DOUBLE) AS gap_avg_s
FROM gaps WHERE gap_s IS NOT NULL
GROUP BY 1, 2
"""

ORACLES["window_rank_suite"] = """
SELECT user_id, event_type, event_id::BIGINT AS event_id, value,
       rank() OVER wv::BIGINT AS rnk,
       dense_rank() OVER wv::BIGINT AS dense_rnk,
       ntile(4) OVER wv::BIGINT AS quartile,
       (rank() OVER wv - 1) / CAST(count(*) OVER wp - 1 AS DOUBLE) AS pct_rank,
       row_number() OVER wv / CAST(count(*) OVER wp AS DOUBLE) AS cume_frac
FROM events
WINDOW wv AS (PARTITION BY user_id, event_type ORDER BY value, event_id),
       wp AS (PARTITION BY user_id, event_type)
"""

ORACLES["series_correlation"] = f"""
WITH hourly AS (
  SELECT user_id, event_type, {_bucket(3600)} AS bucket_start,
         sum(floor(value * 100)::BIGINT)::BIGINT AS vq
  FROM events GROUP BY 1, 2, 3),
j AS (
  SELECT a.user_id, a.event_type AS type_a, b.event_type AS type_b,
         a.vq AS xa, b.vq AS xb
  FROM hourly a
  JOIN hourly b ON a.user_id = b.user_id
               AND a.bucket_start = b.bucket_start
               AND a.event_type < b.event_type),
agg AS (
  SELECT user_id, type_a, type_b,
         count(*)::BIGINT AS n,
         sum(xa)::BIGINT AS sx, sum(xb)::BIGINT AS sy,
         sum(xa * xb)::BIGINT AS sxy,
         sum(xa * xa)::BIGINT AS sxx,
         sum(xb * xb)::BIGINT AS syy
  FROM j GROUP BY 1, 2, 3)
SELECT user_id, type_a, type_b, n AS n_buckets,
       CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
            THEN (n * sxy - sx * sy)
                 / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
       END AS pearson_r
FROM agg
"""

# ------------------------- HLL tier-merge (register max composition)
import math as _math

_HM = 512
_HALPHA = 0.7213 / (1 + 1.079 / _HM)
_HRANK_CASE = ("CASE WHEN w = 0 THEN 33 " + " ".join(
    f"WHEN w % {1 << (k + 1)} = {1 << k} THEN {k + 1}" for k in range(32)
) + " END")
_HCORR_LIST = "[" + ", ".join(
    f"'{repr(float(_HM) * _math.log(float(_HM) / z))}'::DOUBLE"
    for z in range(1, _HM + 1)
) + "]"


def _hll_estimate_sql(regs_cte: str, out: str) -> str:
    """Estimator over a (event_type, m) register CTE — same dyadic
    raw estimate + literal-table linear-counting correction as the
    Spark side.  The alpha constant is a QUOTED string cast: DuckDB
    1.0.0 parses unquoted numeric literals through DECIMAL and lands
    1 ulp high on this value (measured ~16% of shortest-repr doubles),
    while '...'::DOUBLE string casts parse correctly — the raw path
    only activates at larger cardinalities, so this surfaced in the
    sf0.1 sweep, not at sf0.01."""
    raw = f"'{repr(_HALPHA * _HM * _HM)}'::DOUBLE / (s + ({_HM} - nb))"
    return f"""
  SELECT event_type,
         (CASE WHEN ({raw}) <= {2.5 * _HM} AND ({_HM} - nb) > 0
               THEN {_HCORR_LIST}[{_HM} - nb]
               ELSE {raw} END)::DOUBLE AS {out}
  FROM (SELECT event_type, sum(pow(2.0, -m)) AS s, count(*) AS nb
        FROM {regs_cte} GROUP BY 1)"""


ORACLES["hll_tier_merge"] = f"""
WITH hashed AS (
  SELECT event_type,
         make_timestamp(((epoch_ms(ts)//1000) - (epoch_ms(ts)//1000) % 86400)
                        * 1000000) AS day,
         (md5_number_lower(user_id::VARCHAR)::HUGEINT % {_HM})::BIGINT AS b,
         ((md5_number_lower(user_id::VARCHAR)::HUGEINT // {_HM})
           % 4294967296)::BIGINT AS w
  FROM events),
ranked AS (
  SELECT event_type, day, b, {_HRANK_CASE} AS rank FROM hashed),
daily AS (
  SELECT event_type, day, b, max(rank) AS m FROM ranked GROUP BY 1, 2, 3),
merged AS (
  SELECT event_type, b, max(m) AS m FROM daily GROUP BY 1, 2),
direct AS (
  SELECT event_type, b, max(rank) AS m FROM ranked GROUP BY 1, 2),
est_m AS ({_hll_estimate_sql("merged", "merged_estimate")}),
est_d AS ({_hll_estimate_sql("direct", "direct_estimate")})
SELECT m.event_type, m.merged_estimate, d.direct_estimate,
       m.merged_estimate = d.direct_estimate AS merge_exact
FROM est_m m JOIN est_d d USING (event_type)
"""

ORACLES["quantile_sketch_tier_merge"] = f"""
WITH buckets AS (
  SELECT event_type, {_bucket(86400)} AS day,
         CAST(floor(value * 4) AS BIGINT) AS b,
         count(*)::BIGINT AS c
  FROM events GROUP BY 1, 2, 3
), cum AS (
  SELECT event_type, day, b,
         sum(c) OVER (PARTITION BY event_type, day ORDER BY b
                      ROWS UNBOUNDED PRECEDING)::BIGINT AS _cum,
         sum(c) OVER (PARTITION BY event_type, day)::BIGINT AS _tot
  FROM buckets
)
SELECT event_type, day,
       (min(CASE WHEN _cum >= ceil(0.5::DOUBLE  * _tot) THEN b END) + 1)
         ::DOUBLE * 0.25::DOUBLE AS p50_est,
       (min(CASE WHEN _cum >= ceil(0.95::DOUBLE * _tot) THEN b END) + 1)
         ::DOUBLE * 0.25::DOUBLE AS p95_est,
       (min(CASE WHEN _cum >= ceil(0.99::DOUBLE * _tot) THEN b END) + 1)
         ::DOUBLE * 0.25::DOUBLE AS p99_est,
       max(_tot) AS n_points
FROM cum GROUP BY 1, 2
ORDER BY 1, 2
"""

_BLOOM_POS = lambda j, col: (  # noqa: E731
    f"(md5_number_lower('bloom{j}|' || {col}::VARCHAR)::HUGEINT"
    f" % 16384)::BIGINT"
)
ORACLES["bloom_join_prune"] = f"""
WITH build AS (
  SELECT user_id FROM events WHERE event_type = 'purchase'),
bits AS (
  SELECT DISTINCT pos FROM (
    SELECT {_BLOOM_POS(0, 'user_id')} AS pos FROM build
    UNION ALL SELECT {_BLOOM_POS(1, 'user_id')} FROM build
    UNION ALL SELECT {_BLOOM_POS(2, 'user_id')} FROM build)),
probe AS (
  SELECT user_id, event_type, event_id::BIGINT AS event_id FROM events),
exploded AS (
  SELECT user_id, event_type, event_id, {_BLOOM_POS(0, 'user_id')} AS pos
  FROM probe
  UNION ALL
  SELECT user_id, event_type, event_id, {_BLOOM_POS(1, 'user_id')} FROM probe
  UNION ALL
  SELECT user_id, event_type, event_id, {_BLOOM_POS(2, 'user_id')} FROM probe),
hits AS (
  SELECT e.user_id, e.event_type, e.event_id, count(*) AS h
  FROM exploded e JOIN bits b USING (pos)
  GROUP BY 1, 2, 3),
exact AS (SELECT DISTINCT user_id FROM build)
SELECT p.user_id, p.event_type, p.event_id,
       coalesce(h.h = 3, FALSE) AS bloom_pass,
       (x.user_id IS NOT NULL) AS exact_member
FROM probe p
LEFT OUTER JOIN hits h
  ON p.user_id = h.user_id AND p.event_type = h.event_type
 AND p.event_id = h.event_id
LEFT OUTER JOIN exact x ON p.user_id = x.user_id
"""

# the chunked variant must be row-identical to the sequential one
ORACLES["anomaly_zscore_chunked"] = ORACLES["anomaly_zscore"]
ORACLES["ewma_chunked_frame"] = ORACLES["ewma_smooth"]

ORACLES["cmor_tier_1h"] = f"""
SELECT user_id, event_type, {_bucket(3600)} AS bucket_start,
       count(*)::BIGINT AS n_samples,
       CAST(CAST(sum(CAST(value * 2 AS DECIMAL(24,8))) AS VARCHAR) AS DOUBLE) / count(*)
         AS v_scaled,
       CAST(CAST(sum(CAST(value + 100 AS DECIMAL(24,8))) AS VARCHAR) AS DOUBLE) / count(*)
         AS v_shift
FROM events GROUP BY 1, 2, 3
"""

ORACLES["promql_rate_increase"] = """
WITH base AS (
  SELECT user_id, event_type, ts, event_id::BIGINT AS event_id,
         floor(value * 100)::BIGINT AS vq,
         epoch_us(ts) AS us
  FROM events),
staged AS (
  SELECT *,
    CASE WHEN lag(vq) OVER w IS NULL THEN 0
         WHEN vq >= lag(vq) OVER w THEN vq - lag(vq) OVER w
         ELSE vq END AS inc,
    CASE WHEN lag(vq) OVER w IS NOT NULL AND vq < lag(vq) OVER w
         THEN 1 ELSE 0 END AS is_reset
  FROM base
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts)),
final AS (
  SELECT user_id, event_type, ts, event_id,
    sum(inc) OVER wf AS inc_sum,
    sum(is_reset) OVER wf AS n_resets,
    us - min(us) OVER wf AS dt_us
  FROM staged
  WINDOW wf AS (PARTITION BY user_id, event_type ORDER BY ts
                ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
SELECT user_id, event_type, ts, event_id,
       inc_sum::DOUBLE / CAST(100.0 AS DOUBLE) AS increase_20,
       CASE WHEN dt_us = 0 THEN NULL
            ELSE (inc_sum * 10000)::DOUBLE / dt_us::DOUBLE END AS rate_20,
       n_resets::BIGINT AS resets_20
FROM final
"""

ORACLES["promql_over_time_suite"] = """
WITH base AS (
  SELECT user_id, event_type, ts, event_id::BIGINT AS event_id,
         floor(value * 100)::BIGINT AS vq
  FROM events),
staged AS (
  SELECT *,
    CASE WHEN lag(vq) OVER w IS NOT NULL AND vq <> lag(vq) OVER w
         THEN 1 ELSE 0 END AS chg
  FROM base
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts))
SELECT user_id, event_type, ts, event_id,
       (min(vq) OVER wf)::DOUBLE / CAST(100.0 AS DOUBLE) AS min_20,
       (max(vq) OVER wf)::DOUBLE / CAST(100.0 AS DOUBLE) AS max_20,
       (sum(vq) OVER wf)::DOUBLE / CAST(100.0 AS DOUBLE) AS sum_20,
       (sum(vq) OVER wf)::DOUBLE
         / ((count(*) OVER wf) * 100)::DOUBLE AS avg_20,
       (sum(chg) OVER wf)::BIGINT AS changes_20
FROM staged
WINDOW wf AS (PARTITION BY user_id, event_type ORDER BY ts
              ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
"""

ORACLES["promql_slope_trend"] = """
WITH base AS (
  SELECT user_id, event_type, ts, event_id::BIGINT AS event_id,
         floor(value * 100)::HUGEINT AS vq,
         (epoch_ms(ts) // 1000)::HUGEINT AS x
  FROM events),
s AS (
  SELECT user_id, event_type, ts, event_id, x,
         (count(*) OVER wf)::HUGEINT AS n,
         min(x) OVER wf AS a,
         sum(x) OVER wf AS sxr, sum(vq) OVER wf AS sy,
         sum(x * vq) OVER wf AS sxyr, sum(x * x) OVER wf AS sxxr
  FROM base
  WINDOW wf AS (PARTITION BY user_id, event_type ORDER BY ts
                ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)),
d AS (
  SELECT user_id, event_type, ts, event_id, n, sy,
         (sxr - n * a) AS sx,
         (sxyr - a * sy) AS sxy,
         (sxxr - 2 * a * sxr + n * a * a) AS sxx
  FROM s)
SELECT user_id, event_type, ts, event_id,
       CASE WHEN (n * sxx - sx * sx) = 0 THEN NULL
            ELSE (n * sxy - sx * sy)::BIGINT::DOUBLE
                 / ((n * sxx - sx * sx)::BIGINT::DOUBLE
                    * CAST(100.0 AS DOUBLE)) END AS slope_20
FROM d
"""

ORACLES["holt_smoothing"] = """
WITH RECURSIVE base AS (
  SELECT user_id, event_type, ts, event_id::BIGINT AS event_id, value,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS rn
  FROM events),
hw AS (
  SELECT user_id, event_type, ts, event_id, value, rn,
         value::DOUBLE AS s, 0.0::DOUBLE AS b
  FROM base WHERE rn = 1
  UNION ALL
  SELECT n.user_id, n.event_type, n.ts, n.event_id, n.value, n.rn,
         0.5::DOUBLE * n.value + 0.5::DOUBLE * (h.s + h.b) AS s,
         0.25::DOUBLE * ((0.5::DOUBLE * n.value
                          + 0.5::DOUBLE * (h.s + h.b)) - h.s)
           + 0.75::DOUBLE * h.b AS b
  FROM hw h JOIN base n
    ON n.user_id = h.user_id AND n.event_type = h.event_type
   AND n.rn = h.rn + 1)
SELECT user_id, event_type, ts, event_id, value,
       s AS holt_level, b AS holt_trend
FROM hw
"""

ORACLES["robust_anomaly_mad"] = """
WITH base AS (
  SELECT user_id, event_type, ts, event_id::BIGINT AS event_id, value,
         floor(value * 100)::BIGINT AS vq,
         list(floor(value * 100)::BIGINT)
           OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id
                 ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS arr
  FROM events),
m AS (
  SELECT *, list_extract(list_sort(arr), (len(arr) + 1) // 2) AS med
  FROM base),
d AS (
  SELECT *, list_extract(
              list_sort(list_transform(arr, x -> abs(x - med))),
              (len(arr) + 1) // 2) AS mad
  FROM m)
SELECT user_id, event_type, ts, event_id, value,
       med::DOUBLE / CAST(100.0 AS DOUBLE) AS rolling_median,
       mad::DOUBLE / CAST(100.0 AS DOUBLE) AS rolling_mad,
       CASE WHEN mad = 0 THEN NULL
            ELSE (vq - med)::DOUBLE / mad::DOUBLE END AS robust_z,
       (CASE WHEN abs(CASE WHEN mad = 0 THEN NULL
                           ELSE (vq - med)::DOUBLE / mad::DOUBLE END) > 3
             THEN 1 ELSE 0 END)::INT AS is_outlier
FROM d
"""

ORACLES["sequence_dedup"] = f"""
WITH per AS (
  SELECT user_id, {_bucket(86400)} AS day,
         md5(string_agg(event_type, '|' ORDER BY ts, event_id)) AS seq_hash,
         count(*)::BIGINT AS seq_len
  FROM events GROUP BY 1, 2)
SELECT seq_hash, seq_len, count(*)::BIGINT AS n_userdays
FROM per GROUP BY 1, 2
ORDER BY n_userdays DESC, seq_hash
LIMIT 20
"""

ORACLES["promql_quantile_over_time"] = """
WITH base AS (
  SELECT user_id, event_type, ts, event_id::BIGINT AS event_id,
         floor(value * 100)::BIGINT AS vq
  FROM events),
f AS (
  SELECT user_id, event_type, ts, event_id,
         list_sort(list(vq) OVER wf) AS arr
  FROM base
  WINDOW wf AS (PARTITION BY user_id, event_type ORDER BY ts
                ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
SELECT user_id, event_type, ts, event_id,
       list_extract(arr, (50 * len(arr) + 99) // 100)::DOUBLE
         / CAST(100.0 AS DOUBLE) AS p50_20,
       list_extract(arr, (95 * len(arr) + 99) // 100)::DOUBLE
         / CAST(100.0 AS DOUBLE) AS p95_20
FROM f
"""

ORACLES["ohlc_1h"] = f"""
WITH b AS (
  SELECT user_id, event_type, {_bucket(3600)} AS bucket_start,
         ts, event_id, value
  FROM events),
r AS (
  SELECT *,
         row_number() OVER (PARTITION BY user_id, event_type, bucket_start
                            ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (PARTITION BY user_id, event_type, bucket_start
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM b)
SELECT user_id, event_type, bucket_start,
       max(CASE WHEN rn_a = 1 THEN value END) AS open,
       max(value) AS high,
       min(value) AS low,
       max(CASE WHEN rn_d = 1 THEN value END) AS close,
       count(*)::BIGINT AS n_points
FROM r GROUP BY 1, 2, 3
"""

ORACLES["time_weighted_avg_1d"] = f"""
WITH q AS (
  SELECT user_id, event_type, {_bucket(86400)} AS bucket_start,
         ts, event_id, floor(value * 100)::BIGINT AS vq, epoch_us(ts) AS us
  FROM events),
d AS (
  SELECT user_id, event_type, bucket_start, vq,
         lead(us) OVER (PARTITION BY user_id, event_type, bucket_start
                        ORDER BY ts, event_id) - us AS dt
  FROM q)
SELECT user_id, event_type, bucket_start,
       CASE WHEN coalesce(sum(dt), 0) = 0 THEN NULL
            ELSE CAST(sum(vq * dt) AS DOUBLE) / CAST(sum(dt) * 100 AS DOUBLE)
       END AS twa,
       sum(dt)::BIGINT AS held_us,
       count(*)::BIGINT AS n_points
FROM d GROUP BY 1, 2, 3
"""

ORACLES["state_durations"] = """
WITH q AS (
  SELECT user_id, event_type, ts, event_id, epoch_us(ts) AS us FROM events),
d AS (
  SELECT user_id, event_type,
         lead(us) OVER (PARTITION BY user_id ORDER BY ts, event_id) - us AS dt
  FROM q)
SELECT user_id, event_type, sum(dt)::BIGINT AS held_us,
       count(*)::BIGINT AS n_visits
FROM d WHERE dt IS NOT NULL GROUP BY 1, 2
"""

ORACLES["cusum_changepoints"] = """
WITH q AS (
  SELECT user_id, event_type, ts, event_id, value,
         floor(value * 100)::BIGINT - 10500 AS xc
  FROM events),
c AS (
  SELECT user_id, event_type, ts, event_id, value,
         sum(xc) OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
  FROM q),
s AS (
  SELECT user_id, event_type, ts, event_id::BIGINT AS event_id, value,
         (c - least(0, min(c) OVER (
             PARTITION BY user_id, event_type ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)))::BIGINT
           AS cusum_cu
  FROM c)
SELECT user_id, event_type, ts, event_id, value, cusum_cu,
       cusum_cu > 80000 AS is_alarm
FROM s
"""

ORACLES["tpch_q17"] = """
WITH pf AS (
  SELECT p_partkey FROM part WHERE p_brand = 'Brand#23' AND p_size < 15),
lp AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN pf ON l_partkey = p_partkey),
a AS (
  SELECT l_partkey,
         CAST(sum(CAST(l_quantity AS DECIMAL(20,6))) AS DOUBLE) / count(*)
           AS _avg_qty
  FROM lp GROUP BY 1)
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(20,6))) AS DOUBLE)
         / CAST(7.0 AS DOUBLE) AS avg_yearly
FROM lp JOIN a USING (l_partkey)
WHERE l_quantity < CAST(0.2 AS DOUBLE) * _avg_qty
"""

ORACLES["tpch_q21"] = """
WITH late AS (
  SELECT l.l_orderkey, l.l_suppkey
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderstatus = 'F'
    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
)
SELECT s.s_name, count(*)::BIGINT AS numwait
FROM late l1
JOIN supplier s ON l1.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE n.n_name = 'NATION_3'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 100
"""

ORACLES["tpch_q20"] = """
WITH agg AS (
  SELECT l_partkey, l_suppkey,
         sum(floor(l_quantity)::BIGINT) AS qall,
         sum(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
                   AND l_shipdate <  TIMESTAMP '1996-04-01'
                  THEN floor(l_quantity)::BIGINT ELSE 0 END) AS qw
  FROM lineitem GROUP BY 1, 2
)
SELECT s.s_name, s.s_acctbal
FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE n.n_name = 'NATION_2'
  AND s.s_suppkey IN (
    SELECT a.l_suppkey FROM agg a
    WHERE a.qw * 3 > a.qall
      AND a.l_partkey IN (SELECT p_partkey FROM part
                          WHERE p_name LIKE 'small%'))
ORDER BY s.s_name
"""

ORACLES["tpch_q2"] = """
WITH s_r AS (
  SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
  FROM supplier s
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'EUROPE'
), pairs AS (
  SELECT l_partkey, l_suppkey,
         min(CAST(l_extendedprice AS DECIMAL(18,2))) AS supplycost
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size = 15)
    AND l_suppkey IN (SELECT s_suppkey FROM s_r)
  GROUP BY 1, 2
), mn AS (
  SELECT *, min(supplycost) OVER (PARTITION BY l_partkey) AS _mn
  FROM pairs
)
SELECT s.s_acctbal, s.s_name, s.n_name,
       m.l_partkey AS p_partkey,
       CAST(m.supplycost AS DOUBLE) AS supplycost
FROM mn m JOIN s_r s ON m.l_suppkey = s.s_suppkey
WHERE m.supplycost = m._mn
ORDER BY s.s_acctbal DESC, s.n_name, s.s_name, p_partkey
LIMIT 100
"""

ORACLES["tpch_q9"] = """
SELECT n.n_name AS nation,
       CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
       CAST(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                     - 0.1::DOUBLE * p.p_retailprice * l.l_quantity
                AS DECIMAL(24,8))) AS VARCHAR) AS DOUBLE) AS sum_profit
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE p.p_name LIKE 'red%'
GROUP BY 1, 2
ORDER BY nation, o_year DESC
"""

ORACLES["tpch_q11"] = """
WITH per_part AS (
  SELECT l_partkey,
         sum(CAST(l_extendedprice AS DECIMAL(24,8))) AS _value
  FROM lineitem
  WHERE l_suppkey IN (
    SELECT s.s_suppkey FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name = 'NATION_3')
  GROUP BY 1
)
SELECT l_partkey AS p_partkey, CAST(_value AS DOUBLE) AS part_value
FROM per_part
WHERE CAST(_value AS DOUBLE) >
      (SELECT CAST(sum(_value) AS DOUBLE) FROM per_part) * 0.001::DOUBLE
ORDER BY part_value DESC, p_partkey
"""

ORACLES["tpch_q12"] = """
SELECT l.l_linestatus AS ship_class,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate <  TIMESTAMP '1997-01-01'
  AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
GROUP BY 1
ORDER BY 1
"""

ORACLES["tpch_q16"] = """
SELECT p.p_brand, p.p_type, p.p_size,
       count(DISTINCT pr.l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pr
JOIN part p ON p.p_partkey = pr.l_partkey
WHERE p.p_brand <> 'Brand#5'
  AND p.p_type NOT LIKE 'PROMO%'
  AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
  AND pr.l_suppkey NOT IN
      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""

ORACLES["tpch_q19"] = """
SELECT CAST(CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                     AS DECIMAL(24,8))) AS VARCHAR) AS DOUBLE) AS revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)
"""

ORACLES["tpch_q15"] = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(24,8)))
           AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, s.s_acctbal,
       CAST(r.total_revenue AS DOUBLE) AS total_revenue
FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s.s_suppkey
"""

ORACLES["tpch_q22"] = """
WITH base AS (
  SELECT * FROM customer WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)),
a AS (
  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(20,6))) AS DOUBLE) / count(*)
           AS _avg_bal
  FROM base WHERE c_acctbal > 0),
rich AS (
  SELECT c_custkey, c_nationkey, c_acctbal FROM base, a
  WHERE c_acctbal > _avg_bal),
no_orders AS (
  SELECT * FROM rich
  WHERE NOT EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = rich.c_custkey
                      AND o.o_orderpriority = '1-URGENT'))
SELECT c_nationkey::BIGINT AS c_nationkey, count(*)::BIGINT AS numcust,
       CAST(sum(CAST(c_acctbal AS DECIMAL(20,6))) AS DOUBLE) AS totacctbal
FROM no_orders GROUP BY 1
"""

ORACLES["transition_matrix"] = """
WITH q AS (
  SELECT user_id, event_type, ts, event_id, epoch_us(ts) AS us FROM events),
l AS (
  SELECT lag(event_type) OVER w AS prev_state,
         event_type AS curr_state,
         us - lag(us) OVER w AS lat_us
  FROM q WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT prev_state, curr_state, count(*)::BIGINT AS n_transitions,
       sum(lat_us)::BIGINT AS latency_us_sum,
       CAST(sum(lat_us) AS DOUBLE) / count(*) AS latency_us_mean
FROM l WHERE prev_state IS NOT NULL GROUP BY 1, 2
"""

ORACLES["heartbeat_uptime"] = """
WITH q AS (
  SELECT user_id, ts, event_id, epoch_us(ts) AS us FROM events),
d AS (
  SELECT user_id,
         lead(us) OVER (PARTITION BY user_id ORDER BY ts, event_id) - us AS dt
  FROM q)
SELECT user_id,
       (coalesce(sum(least(dt, 21600000000)), 0) + 21600000000)::BIGINT
         AS live_us,
       coalesce(sum(greatest(dt - 21600000000, 0)), 0)::BIGINT AS dead_us,
       coalesce(sum(CASE WHEN dt > 21600000000 THEN 1 ELSE 0 END), 0)::BIGINT
         AS n_outages,
       count(*)::BIGINT AS n_heartbeats
FROM d GROUP BY 1
"""

# materialized + raw-tail union must equal the direct full rollup
ORACLES["realtime_rollup_1h"] = f"""
SELECT user_id, event_type, {_bucket(3600)} AS bucket_start,
       count(*)::BIGINT AS n_events,
       CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS value_sum
FROM events GROUP BY 1, 2, 3
"""

ORACLES["funnel_conversion"] = """
WITH fs AS (
  SELECT user_id, min(epoch_us(ts)) AS s_us
  FROM events WHERE event_type = 'signup' GROUP BY 1),
conv AS (
  SELECT DISTINCT f.user_id
  FROM fs f JOIN events e
    ON e.user_id = f.user_id
   AND e.event_type = 'purchase'
   AND epoch_us(e.ts) > f.s_us
   AND epoch_us(e.ts) <= f.s_us + 604800000000),
cohorts AS (
  SELECT make_timestamp(((f.s_us // 1000000) - (f.s_us // 1000000) % 86400)
           * 1000000) AS cohort_day,
         CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END AS conv
  FROM fs f LEFT JOIN conv c USING (user_id))
SELECT cohort_day, count(*)::BIGINT AS n_signups,
       sum(conv)::BIGINT AS n_converted,
       CAST(sum(conv) AS DOUBLE) / count(*) AS conversion_rate
FROM cohorts GROUP BY 1
"""

ORACLES["cohort_retention"] = f"""
WITH ev AS (
  SELECT user_id, {_bucket(86400)} AS day FROM events),
fd AS (
  SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY 1),
active AS (
  SELECT DISTINCT user_id, day FROM ev)
SELECT f.cohort_day, date_diff('day', f.cohort_day, a.day)::BIGINT AS day_offset,
       count(*)::BIGINT AS n_active_users
FROM active a JOIN fd f USING (user_id)
GROUP BY 1, 2
"""

ORACLES["acf_lags"] = """
WITH base AS (
  SELECT user_id, event_type,
         floor(value * 100)::HUGEINT AS vq,
         lag(floor(value * 100)::HUGEINT, 1) OVER w AS l1,
         lag(floor(value * 100)::HUGEINT, 2) OVER w AS l2,
         lag(floor(value * 100)::HUGEINT, 3) OVER w AS l3
  FROM events
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)),
g AS (
  SELECT user_id, event_type,
         count(*)::HUGEINT AS n,
         sum(vq) AS s, sum(vq * vq) AS q,
         sum(vq * l1) AS sxy1,
         sum(CASE WHEN l1 IS NOT NULL THEN vq END) AS sx1, sum(l1) AS sy1,
         sum(vq * l2) AS sxy2,
         sum(CASE WHEN l2 IS NOT NULL THEN vq END) AS sx2, sum(l2) AS sy2,
         sum(vq * l3) AS sxy3,
         sum(CASE WHEN l3 IS NOT NULL THEN vq END) AS sx3, sum(l3) AS sy3
  FROM base GROUP BY 1, 2)
SELECT user_id, event_type, n::BIGINT AS n_obs,
       CASE WHEN (n*n*q - n*s*s) = 0 THEN NULL
            ELSE (n*n*sxy1 - n*s*(sx1+sy1) + (n-1)*s*s)::DOUBLE
                 / (n*n*q - n*s*s)::DOUBLE END AS acf_1,
       CASE WHEN (n*n*q - n*s*s) = 0 THEN NULL
            ELSE (n*n*sxy2 - n*s*(sx2+sy2) + (n-2)*s*s)::DOUBLE
                 / (n*n*q - n*s*s)::DOUBLE END AS acf_2,
       CASE WHEN (n*n*q - n*s*s) = 0 THEN NULL
            ELSE (n*n*sxy3 - n*s*(sx3+sy3) + (n-3)*s*s)::DOUBLE
                 / (n*n*q - n*s*s)::DOUBLE END AS acf_3
FROM g
"""

ORACLES["promql_predict_linear"] = """
WITH base AS (
  SELECT user_id, event_type, ts, event_id::BIGINT AS event_id,
         floor(value * 100)::HUGEINT AS vq,
         (epoch_ms(ts) // 1000)::HUGEINT AS x
  FROM events),
s AS (
  SELECT user_id, event_type, ts, event_id, x,
         (count(*) OVER wf)::HUGEINT AS n,
         min(x) OVER wf AS a,
         sum(x) OVER wf AS sxr, sum(vq) OVER wf AS sy,
         sum(x * vq) OVER wf AS sxyr, sum(x * x) OVER wf AS sxxr
  FROM base
  WINDOW wf AS (PARTITION BY user_id, event_type ORDER BY ts
                ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)),
d AS (
  SELECT user_id, event_type, ts, event_id, n, sy,
         (x - a) AS x0m,
         (sxr - n * a) AS sx,
         (sxyr - a * sy) AS sxy,
         (sxxr - 2 * a * sxr + n * a * a) AS sxx
  FROM s)
SELECT user_id, event_type, ts, event_id,
       CASE WHEN (n * sxx - sx * sx) = 0 THEN NULL
            ELSE (sy::BIGINT::DOUBLE
                    * (n * sxx - sx * sx)::BIGINT::DOUBLE
                  + (n * sxy - sx * sy)::BIGINT::DOUBLE
                    * (n * (x0m + 300) - sx)::BIGINT::DOUBLE)
                 / (n::BIGINT::DOUBLE
                    * (n * sxx - sx * sx)::BIGINT::DOUBLE
                    * CAST(100.0 AS DOUBLE)) END AS pred_5m,
       CASE WHEN (n * sxx - sx * sx) = 0 THEN NULL
            ELSE (sy::BIGINT::DOUBLE
                    * (n * sxx - sx * sx)::BIGINT::DOUBLE
                  + (n * sxy - sx * sy)::BIGINT::DOUBLE
                    * (n * (x0m + 3600) - sx)::BIGINT::DOUBLE)
                 / (n::BIGINT::DOUBLE
                    * (n * sxx - sx * sx)::BIGINT::DOUBLE
                    * CAST(100.0 AS DOUBLE)) END AS pred_1h
FROM d
"""

ORACLES["calendar_profile"] = """
SELECT event_type,
       dayofweek(ts)::INT AS dow,
       hour(ts)::INT AS hour_of_day,
       CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE) / count(*)
         AS value_mean,
       count(*)::BIGINT AS n_obs
FROM events GROUP BY 1, 2, 3
"""

ORACLES["sax_symbols"] = """
WITH base AS (
  SELECT user_id, event_type,
         floor(value * 100)::HUGEINT AS vq,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS rn,
         (count(*) OVER p)::HUGEINT AS n,
         sum(floor(value * 100)::HUGEINT) OVER p AS s,
         sum(floor(value * 100)::HUGEINT
             * floor(value * 100)::HUGEINT) OVER p AS q
  FROM events
  WINDOW p AS (PARTITION BY user_id, event_type)),
g AS (
  SELECT user_id, event_type,
         (((rn - 1) * 4) // n)::BIGINT AS seg, n, s, q,
         count(*)::BIGINT AS seglen,
         sum(n * vq - s) AS segsum
  FROM base GROUP BY 1, 2, 3, n, s, q),
p AS (
  SELECT user_id, event_type, seg, seglen,
         CASE WHEN (n*q - s*s) = 0 THEN NULL
              ELSE segsum::DOUBLE
                   / (seglen::DOUBLE * sqrt((n*q - s*s)::DOUBLE)) END AS paa
  FROM g)
SELECT user_id, event_type, seg, seglen, paa,
       CASE WHEN paa IS NULL THEN NULL
            WHEN paa < CAST(-0.6745 AS DOUBLE) THEN 'a'
            WHEN paa < CAST(0 AS DOUBLE) THEN 'b'
            WHEN paa < CAST(0.6745 AS DOUBLE) THEN 'c'
            ELSE 'd' END AS symbol
FROM p
"""

ORACLES["seasonal_decompose"] = """
WITH base AS (
  SELECT user_id, event_type, ts, event_id::BIGINT AS event_id, value,
         floor(value * 100)::BIGINT AS vq,
         row_number() OVER w AS rn,
         CASE WHEN count(*) OVER wc = 5
              THEN sum(floor(value * 100)::BIGINT) OVER wc END AS trend_num
  FROM events
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id),
         wc AS (PARTITION BY user_id, event_type ORDER BY ts, event_id
                ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)),
staged AS (
  SELECT user_id, event_type, ts, event_id, value, trend_num,
         ((rn - 1) % 5)::INT AS phase,
         5 * vq - trend_num AS d
  FROM base),
sea AS (
  SELECT *,
         sum(d) OVER p AS s_num,
         count(d) OVER p AS s_cnt
  FROM staged
  WINDOW p AS (PARTITION BY user_id, event_type, phase))
SELECT user_id, event_type, ts, event_id, value, phase,
       trend_num::DOUBLE / CAST(500.0 AS DOUBLE) AS trend,
       CASE WHEN s_cnt = 0 THEN NULL
            ELSE s_num::DOUBLE / (s_cnt * 500)::DOUBLE END AS seasonal,
       value - (trend_num::DOUBLE / CAST(500.0 AS DOUBLE))
             - (CASE WHEN s_cnt = 0 THEN NULL
                     ELSE s_num::DOUBLE / (s_cnt * 500)::DOUBLE END)
         AS residual
FROM sea
"""

ORACLES["cross_corr_lagged"] = """
WITH ranked AS (
  SELECT user_id, event_type,
         floor(value * 100)::BIGINT AS vq,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS rn
  FROM events),
a AS (SELECT user_id, rn, vq AS va FROM ranked WHERE event_type = 'view'),
b AS (SELECT user_id, rn, vq AS vb FROM ranked WHERE event_type = 'click'),
g0 AS (
  SELECT a.user_id, count(*)::BIGINT AS n,
         sum(va)::BIGINT AS sx, sum(vb)::BIGINT AS sy,
         sum(va * vb)::BIGINT AS sxy,
         sum(va * va)::BIGINT AS sxx, sum(vb * vb)::BIGINT AS syy
  FROM a JOIN b ON a.user_id = b.user_id AND a.rn = b.rn
  GROUP BY 1),
g1 AS (
  SELECT a.user_id, count(*)::BIGINT AS n,
         sum(va)::BIGINT AS sx, sum(vb)::BIGINT AS sy,
         sum(va * vb)::BIGINT AS sxy,
         sum(va * va)::BIGINT AS sxx, sum(vb * vb)::BIGINT AS syy
  FROM a JOIN b ON a.user_id = b.user_id AND a.rn = b.rn - 1
  GROUP BY 1),
r0 AS (
  SELECT user_id, n AS n_pairs_0,
         CASE WHEN (n*sxx - sx*sx) <= 0 OR (n*syy - sy*sy) <= 0 THEN NULL
              ELSE (n*sxy - sx*sy)::DOUBLE
                   / (sqrt((n*sxx - sx*sx)::DOUBLE)
                      * sqrt((n*syy - sy*sy)::DOUBLE)) END AS xcorr_0
  FROM g0),
r1 AS (
  SELECT user_id, n AS n_pairs_1,
         CASE WHEN (n*sxx - sx*sx) <= 0 OR (n*syy - sy*sy) <= 0 THEN NULL
              ELSE (n*sxy - sx*sy)::DOUBLE
                   / (sqrt((n*sxx - sx*sx)::DOUBLE)
                      * sqrt((n*syy - sy*sy)::DOUBLE)) END AS xcorr_1
  FROM g1)
SELECT COALESCE(r0.user_id, r1.user_id) AS user_id,
       n_pairs_0, xcorr_0, n_pairs_1, xcorr_1
FROM r0 FULL JOIN r1 ON r0.user_id = r1.user_id
"""

ORACLES["hw_seasonal"] = """
WITH RECURSIVE base AS (
  SELECT user_id, event_type, ts, event_id::BIGINT AS event_id, value,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS rn
  FROM events),
hw AS (
  SELECT user_id, event_type, ts, event_id, value, rn,
         value::DOUBLE AS fitted, value::DOUBLE AS lvl,
         CAST(0 AS DOUBLE) AS sj,
         [CAST(0 AS DOUBLE), CAST(0 AS DOUBLE),
          CAST(0 AS DOUBLE), CAST(0 AS DOUBLE)] AS sea
  FROM base WHERE rn = 1
  UNION ALL
  SELECT n.user_id, n.event_type, n.ts, n.event_id, n.value, n.rn,
         h.lvl + h.sea[((n.rn - 1) % 4 + 1)::INT] AS fitted,
         (CAST(0.5 AS DOUBLE)
            * (n.value - h.sea[((n.rn - 1) % 4 + 1)::INT])
          + CAST(0.5 AS DOUBLE) * h.lvl) AS lvl,
         (CAST(0.25 AS DOUBLE)
            * (n.value
               - (CAST(0.5 AS DOUBLE)
                    * (n.value - h.sea[((n.rn - 1) % 4 + 1)::INT])
                  + CAST(0.5 AS DOUBLE) * h.lvl))
          + CAST(0.75 AS DOUBLE) * h.sea[((n.rn - 1) % 4 + 1)::INT])
           AS sj,
         list_transform([1, 2, 3, 4], i ->
           CASE WHEN i = ((n.rn - 1) % 4 + 1)::INT
                THEN (CAST(0.25 AS DOUBLE)
                        * (n.value
                           - (CAST(0.5 AS DOUBLE)
                                * (n.value
                                   - h.sea[((n.rn - 1) % 4 + 1)::INT])
                              + CAST(0.5 AS DOUBLE) * h.lvl))
                      + CAST(0.75 AS DOUBLE)
                        * h.sea[((n.rn - 1) % 4 + 1)::INT])
                ELSE h.sea[i] END) AS sea
  FROM hw h JOIN base n
    ON n.user_id = h.user_id AND n.event_type = h.event_type
   AND n.rn = h.rn + 1)
SELECT user_id, event_type, ts, event_id, value,
       fitted AS hw_fitted, lvl AS hw_level, sj AS hw_season
FROM hw
"""

ORACLES["interval_merge"] = """
WITH base AS (
  SELECT user_id,
         epoch_us(ts) AS s_us,
         epoch_us(ts) + 300000000 AS e_us,
         event_id::BIGINT AS event_id
  FROM events),
flagged AS (
  SELECT user_id, s_us, e_us,
         CASE WHEN max(e_us) OVER (PARTITION BY user_id
                                   ORDER BY s_us, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                            AND 1 PRECEDING) IS NULL
                OR s_us > max(e_us) OVER (PARTITION BY user_id
                                          ORDER BY s_us, event_id
                                          ROWS BETWEEN UNBOUNDED PRECEDING
                                                   AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS new_island,
         event_id
  FROM base),
islands AS (
  SELECT user_id, s_us, e_us,
         sum(new_island) OVER (PARTITION BY user_id
                               ORDER BY s_us, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) AS island
  FROM flagged)
SELECT user_id, island::BIGINT AS island,
       make_timestamp(min(s_us)) AS interval_start,
       make_timestamp(max(e_us)) AS interval_end,
       (max(e_us) - min(s_us)) / CAST(1000000.0 AS DOUBLE) AS duration_s,
       count(*)::BIGINT AS n_events
FROM islands
GROUP BY 1, 2
"""

ORACLES["backtest_models"] = """
WITH staged AS (
  SELECT user_id, event_type,
         floor(value * 100)::BIGINT AS vq,
         lag(floor(value * 100)::BIGINT, 1) OVER w AS l1,
         lag(floor(value * 100)::BIGINT, 4) OVER w AS l4
  FROM events
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)),
g AS (
  SELECT user_id, event_type,
         count(l1)::BIGINT AS n_naive,
         sum(abs(vq - l1))::BIGINT AS ae1,
         count(l4)::BIGINT AS n_snaive,
         sum(abs(vq - l4))::BIGINT AS ae4
  FROM staged GROUP BY 1, 2),
m AS (
  SELECT user_id, event_type, n_naive, n_snaive,
         CASE WHEN n_naive = 0 THEN NULL
              ELSE ae1::DOUBLE / (n_naive * 100)::DOUBLE END AS mae_naive,
         CASE WHEN n_snaive = 0 THEN NULL
              ELSE ae4::DOUBLE / (n_snaive * 100)::DOUBLE END AS mae_snaive
  FROM g)
SELECT user_id, event_type, n_naive, mae_naive, n_snaive, mae_snaive,
       CASE WHEN mae_naive IS NULL OR mae_snaive IS NULL THEN NULL
            WHEN mae_naive <= mae_snaive THEN 'naive'
            ELSE 'seasonal_naive' END AS winner
FROM m
"""

ORACLES["series_align_spread"] = f"""
WITH tier AS (
  SELECT user_id, event_type, {_bucket(3600)} AS bucket_start,
         CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS value_sum
  FROM events
  WHERE user_id < 15 AND event_type IN ('view', 'click')
  GROUP BY 1, 2, 3),
extents AS (
  SELECT user_id, event_type, min(bucket_start) b_min, max(bucket_start) b_max
  FROM tier GROUP BY 1, 2),
grid AS (
  SELECT user_id, event_type,
         unnest(generate_series(b_min, b_max, INTERVAL 1 HOUR)) AS bucket_start
  FROM extents),
dense AS (
  SELECT g.user_id, g.event_type, g.bucket_start, t.value_sum
  FROM grid g LEFT JOIN tier t
    USING (user_id, event_type, bucket_start)),
filled AS (
  SELECT user_id, event_type, bucket_start,
         last_value(value_sum IGNORE NULLS) OVER (
           PARTITION BY user_id, event_type ORDER BY bucket_start
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_fill
  FROM dense),
v AS (SELECT user_id, bucket_start, value_fill AS v_view
      FROM filled WHERE event_type = 'view'),
c AS (SELECT user_id, bucket_start, value_fill AS v_click
      FROM filled WHERE event_type = 'click')
SELECT COALESCE(v.user_id, c.user_id) AS user_id,
       COALESCE(v.bucket_start, c.bucket_start) AS bucket_start,
       v_view, v_click,
       v_view - v_click AS spread
FROM v FULL JOIN c
  ON v.user_id = c.user_id AND v.bucket_start = c.bucket_start
"""

ORACLES["deadband_compress"] = """
WITH RECURSIVE base AS (
  SELECT user_id, event_type, ts, event_id::BIGINT AS event_id, value,
         floor(value * 100)::BIGINT AS q,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS rn
  FROM events),
db AS (
  SELECT user_id, event_type, ts, event_id, value, rn,
         TRUE AS kept, 1::BIGINT AS seq, q AS anchor
  FROM base WHERE rn = 1
  UNION ALL
  SELECT n.user_id, n.event_type, n.ts, n.event_id, n.value, n.rn,
         abs(n.q - d.anchor) > 500 AS kept,
         CASE WHEN abs(n.q - d.anchor) > 500
              THEN d.seq + 1 ELSE d.seq END AS seq,
         CASE WHEN abs(n.q - d.anchor) > 500
              THEN n.q ELSE d.anchor END AS anchor
  FROM db d JOIN base n
    ON n.user_id = d.user_id AND n.event_type = d.event_type
   AND n.rn = d.rn + 1)
SELECT user_id, event_type, ts, event_id, value, kept,
       CASE WHEN kept THEN seq END AS kept_seq
FROM db
"""

_SDT_BREACH = """greatest(d.uu,
            ((n.value - CAST(5 AS DOUBLE)) - d.va) / (n.t - d.ta))
          > least(d.ll,
            ((n.value + CAST(5 AS DOUBLE)) - d.va) / (n.t - d.ta))"""

ORACLES["sdt_compress"] = f"""
WITH RECURSIVE base AS (
  SELECT user_id, event_type, ts, event_id::BIGINT AS event_id, value,
         epoch_us(ts)::DOUBLE AS t,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS rn
  FROM events),
sdt AS (
  SELECT user_id, event_type, ts, event_id, value, rn,
         FALSE AS prev_kept,
         t AS ta, value AS va, t AS tp, value AS vp,
         CAST('-infinity' AS DOUBLE) AS uu,
         CAST('infinity' AS DOUBLE) AS ll
  FROM base WHERE rn = 1
  UNION ALL
  SELECT n.user_id, n.event_type, n.ts, n.event_id, n.value, n.rn,
         ({_SDT_BREACH}) AS prev_kept,
         CASE WHEN {_SDT_BREACH} THEN d.tp ELSE d.ta END AS ta,
         CASE WHEN {_SDT_BREACH} THEN d.vp ELSE d.va END AS va,
         n.t AS tp, n.value AS vp,
         CASE WHEN {_SDT_BREACH}
              THEN ((n.value - CAST(5 AS DOUBLE)) - d.vp) / (n.t - d.tp)
              ELSE greatest(d.uu,
                ((n.value - CAST(5 AS DOUBLE)) - d.va) / (n.t - d.ta)) END
           AS uu,
         CASE WHEN {_SDT_BREACH}
              THEN ((n.value + CAST(5 AS DOUBLE)) - d.vp) / (n.t - d.tp)
              ELSE least(d.ll,
                ((n.value + CAST(5 AS DOUBLE)) - d.va) / (n.t - d.ta)) END
           AS ll
  FROM sdt d JOIN base n
    ON n.user_id = d.user_id AND n.event_type = d.event_type
   AND n.rn = d.rn + 1)
SELECT user_id, event_type, ts, event_id, value,
       CASE WHEN rn = 1 THEN TRUE
            ELSE coalesce(
              lead(prev_kept) OVER (PARTITION BY user_id, event_type
                                    ORDER BY rn), TRUE) END AS kept
FROM sdt
"""

ORACLES["hysteresis_alerts"] = """
WITH staged AS (
  SELECT user_id, event_type, ts, event_id::BIGINT AS event_id, value,
         CASE WHEN value > CAST(400 AS DOUBLE) THEN 1
              WHEN value < CAST(100 AS DOUBLE) THEN 0 END AS flag
  FROM events),
latched AS (
  SELECT user_id, event_type, ts, event_id, value,
         coalesce(last_value(flag IGNORE NULLS) OVER (
           PARTITION BY user_id, event_type ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0)
           AS alert_on
  FROM staged)
SELECT user_id, event_type, ts, event_id, value,
       alert_on::INT AS alert_on,
       CASE WHEN alert_on = 1 AND coalesce(lag(alert_on) OVER w, 0) = 0
              THEN 'fire'
            WHEN alert_on = 0 AND coalesce(lag(alert_on) OVER w, 0) = 1
              THEN 'resolve' END AS edge
FROM latched
WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
"""


ORACLES["concurrency_timeline"] = """
WITH edges AS (
  SELECT epoch_us(ts) AS t_us, 1::BIGINT AS delta,
         event_id::BIGINT AS event_id
  FROM events
  UNION ALL
  SELECT epoch_us(ts) + 300000000, -1::BIGINT, event_id::BIGINT
  FROM events)
SELECT make_timestamp(t_us) AS edge_ts,
       delta,
       event_id,
       sum(delta) OVER (ORDER BY t_us, delta, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW)::BIGINT AS concurrency
FROM edges
"""

ORACLES["theil_sen_slope"] = """
WITH recent AS (
  SELECT user_id, event_type, epoch_us(ts) AS t_us,
         floor(value * 100)::BIGINT AS vq,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events),
k AS (SELECT * FROM recent WHERE rn <= 24),
pairs AS (
  SELECT a.user_id, a.event_type,
         a.vq - b.vq AS dv,
         a.t_us - b.t_us AS dt_us
  FROM k a JOIN k b
    ON a.user_id = b.user_id AND a.event_type = b.event_type
  WHERE a.rn < b.rn AND a.t_us <> b.t_us),
sl AS (
  SELECT user_id, event_type, dv, dt_us,
         CAST(dv AS DOUBLE) / CAST(dt_us AS DOUBLE) AS slope
  FROM pairs),
ranked AS (
  SELECT user_id, event_type, dv, dt_us, slope,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY slope, dv, dt_us) AS rn,
         count(*) OVER (PARTITION BY user_id, event_type) AS n_pairs
  FROM sl)
SELECT user_id, event_type, n_pairs::BIGINT AS n_pairs,
       dv AS dv_med, dt_us AS dt_us_med, slope,
       slope * CAST('864000000' AS DOUBLE) AS slope_per_day
FROM ranked WHERE rn = (n_pairs + 1) // 2
"""

ORACLES["burst_detect"] = """
WITH base AS (
  SELECT event_type, (epoch_ms(ts)//1000)::BIGINT AS t_s,
         event_id::BIGINT AS event_id
  FROM events),
counted AS (
  SELECT event_type, t_s, event_id,
         count(*) OVER (PARTITION BY event_type ORDER BY t_s
                        RANGE BETWEEN 3599 PRECEDING
                                  AND CURRENT ROW) AS rate_1h
  FROM base),
flagged AS (
  SELECT event_type, t_s, event_id, rate_1h,
         CASE WHEN rate_1h >= 7 THEN 1 ELSE 0 END AS flag
  FROM counted),
edges AS (
  SELECT *,
         CASE WHEN flag = 1
               AND coalesce(lag(flag) OVER w, 0) = 0
              THEN 1 ELSE 0 END AS starts
  FROM flagged
  WINDOW w AS (PARTITION BY event_type ORDER BY t_s, event_id)),
islands AS (
  SELECT *,
         sum(starts) OVER (PARTITION BY event_type
                           ORDER BY t_s, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS island
  FROM edges)
SELECT event_type, island::BIGINT AS episode,
       make_timestamp(min(t_s) * 1000000) AS burst_start,
       make_timestamp(max(t_s) * 1000000) AS burst_end,
       (max(t_s) - min(t_s))::BIGINT AS duration_s,
       max(rate_1h)::BIGINT AS peak_rate,
       count(*)::BIGINT AS n_hits
FROM islands WHERE flag = 1
GROUP BY 1, 2
"""

ORACLES["promql_topk_bottomk"] = f"""
WITH agg AS (
  SELECT {_bucket(3600)} AS bucket_start, user_id, event_type,
         count(*)::BIGINT AS n_events,
         CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE)
           / count(*) AS value_avg
  FROM events GROUP BY 1,2,3),
ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY bucket_start
                            ORDER BY value_avg DESC,
                                     user_id, event_type) AS rank_top,
         count(*) OVER (PARTITION BY bucket_start) AS n_series
  FROM agg)
SELECT bucket_start, user_id, event_type, n_events, value_avg,
       rank_top::BIGINT AS rank_top,
       (n_series - rank_top + 1)::BIGINT AS rank_bottom
FROM ranked
WHERE rank_top <= 3 OR n_series - rank_top + 1 <= 3
"""


def _routed_block(rid: str, tier: str, step: int, s: str, e: str) -> str:
    return f"""
SELECT '{rid}' AS req_id, '{tier}' AS tier, event_type,
       {_bucket(step)} AS bucket_start,
       count(*)::BIGINT AS n_events,
       CAST(sum(CAST(value AS DECIMAL(20,6))) AS DOUBLE)
         / count(*) AS value_avg
FROM events
WHERE ts >= TIMESTAMP '{s}' AND ts < TIMESTAMP '{e}'
GROUP BY 1,2,3,4
"""


# the oracle PINS the routed tier for each request — if choose_tier's
# arithmetic regresses, the Spark side unions different granularities
# and the value hash breaks
ORACLES["tier_router_read"] = " UNION ALL ".join(
    [
        _routed_block("r1", "1m", 60, "2024-01-05 00:00:00", "2024-01-05 02:00:00"),
        _routed_block("r2", "1h", 3600, "2024-01-08 00:00:00", "2024-01-15 00:00:00"),
        _routed_block("r3", "1d", 86400, "2024-01-01 00:00:00", "2024-01-31 00:00:00"),
    ]
)


ORACLES["heavy_hitters_sketch"] = """
SELECT user_id, count(*)::BIGINT AS n_rows
FROM events
GROUP BY 1
HAVING count(*) >= 80
"""


ORACLES["sliding_distinct_users"] = """
WITH uh AS (
  SELECT DISTINCT user_id,
         ((epoch_ms(ts)//1000) - (epoch_ms(ts)//1000) % 3600) AS h_s
  FROM events),
uw AS (
  SELECT DISTINCT user_id, w_s
  FROM (SELECT user_id,
               unnest(generate_series(h_s - 18000, h_s, 3600)) AS w_s
        FROM uh))
SELECT make_timestamp(w_s * 1000000) AS window_start,
       make_timestamp((w_s + 21600) * 1000000) AS window_end,
       count(*)::BIGINT AS distinct_users
FROM uw GROUP BY 1,2
"""


ORACLES["asof_nearest_join"] = """
WITH l AS (
  SELECT user_id, ts, event_id::BIGINT AS event_id
  FROM events WHERE event_type = 'view'),
r AS (
  SELECT user_id, ts, max(floor(value * 100)::BIGINT) AS vq
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
b AS (
  SELECT l.user_id, l.ts, l.event_id, r.vq AS b_vq, r.ts AS b_ts
  FROM l ASOF LEFT JOIN r
    ON l.user_id = r.user_id AND l.ts >= r.ts),
f AS (
  SELECT l.user_id, l.ts, l.event_id, r.vq AS f_vq, r.ts AS f_ts
  FROM l ASOF LEFT JOIN r
    ON l.user_id = r.user_id AND l.ts <= r.ts)
SELECT b.user_id, b.ts, b.event_id,
       CASE WHEN f.f_ts IS NULL
              OR (b.b_ts IS NOT NULL AND
                  (epoch_us(b.ts) - epoch_us(b.b_ts))
                    <= (epoch_us(f.f_ts) - epoch_us(b.ts)))
            THEN b.b_vq ELSE f.f_vq END AS asof_vq
FROM b JOIN f USING (user_id, ts, event_id)
"""


ORACLES["token_bucket_throttle"] = """
WITH RECURSIVE base AS (
  SELECT user_id, ts, event_id::BIGINT AS event_id, epoch_us(ts) AS t_us,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events),
tb AS (
  SELECT user_id, ts, event_id, t_us, rn,
         1 AS allowed,
         5000000 - 1000000 AS lvl
  FROM base WHERE rn = 1
  UNION ALL
  SELECT n.user_id, n.ts, n.event_id, n.t_us, n.rn,
         CASE WHEN least(5000000, t.lvl + (n.t_us - t.t_us) // 50000)
                   >= 1000000 THEN 1 ELSE 0 END,
         least(5000000, t.lvl + (n.t_us - t.t_us) // 50000)
           - CASE WHEN least(5000000,
                             t.lvl + (n.t_us - t.t_us) // 50000)
                       >= 1000000 THEN 1000000 ELSE 0 END
  FROM tb t JOIN base n
    ON n.user_id = t.user_id AND n.rn = t.rn + 1)
SELECT user_id, ts, event_id,
       allowed::INT AS allowed, lvl::BIGINT AS tokens_after
FROM tb
"""


ORACLES["repeat_run_detect"] = """
WITH base AS (
  SELECT user_id, event_type, ts, event_id::BIGINT AS event_id,
         CASE WHEN lag(event_type) OVER w IS NULL
                OR lag(event_type) OVER w <> event_type
              THEN 1 ELSE 0 END AS chg
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
runs AS (
  SELECT *,
         sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS run_id
  FROM base)
SELECT user_id, run_id::BIGINT AS run_id, event_type,
       count(*)::BIGINT AS run_len,
       min(ts) AS run_start, max(ts) AS run_end
FROM runs
GROUP BY 1, 2, 3
HAVING count(*) >= 4
"""

ORACLES["stale_series"] = """
WITH per AS (
  SELECT user_id, event_type,
         max(epoch_ms(ts)//1000) AS last_s,
         count(*)::BIGINT AS n_events
  FROM events GROUP BY 1, 2),
g AS (SELECT max(last_s) AS now_s FROM per)
SELECT user_id, event_type,
       make_timestamp(last_s * 1000000) AS last_seen,
       (now_s - last_s)::BIGINT AS silent_for_s,
       n_events,
       (CASE WHEN now_s - last_s > 172800 THEN 1 ELSE 0 END)::INT AS is_stale
FROM per, g
"""


ORACLES["out_of_order_stats"] = """
WITH base AS (
  SELECT user_id, event_type,
         (epoch_ms(ts)//1000)::BIGINT AS t_s,
         max((epoch_ms(ts)//1000)::BIGINT)
           OVER (PARTITION BY user_id, event_type ORDER BY event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS seen
  FROM events),
flagged AS (
  SELECT user_id, event_type,
         CASE WHEN seen IS NOT NULL AND t_s < seen THEN 1 ELSE 0 END AS late,
         CASE WHEN seen IS NOT NULL AND t_s < seen
              THEN seen - t_s ELSE 0 END AS lt
  FROM base)
SELECT user_id, event_type,
       count(*)::BIGINT AS n_events,
       sum(late)::BIGINT AS n_late,
       max(lt)::BIGINT AS max_lateness_s,
       sum(lt)::BIGINT AS total_lateness_s
FROM flagged GROUP BY 1, 2
"""

ORACLES["type_gini_diversity"] = """
WITH per_type AS (
  SELECT user_id, event_type, count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2)
SELECT user_id,
       sum(n)::BIGINT AS n_events,
       count(*)::BIGINT AS n_types,
       CAST('1' AS DOUBLE)
         - CAST(sum(n * n) AS DOUBLE)
           / CAST(sum(n) * sum(n) AS DOUBLE) AS gini_impurity,
       CAST(max(n) AS DOUBLE) / CAST(sum(n) AS DOUBLE) AS majority_share
FROM per_type GROUP BY 1
"""


ORACLES["anomaly_ensemble"] = """
WITH base AS (
  SELECT user_id, event_type, ts, event_id::BIGINT AS event_id, value,
         floor(value * 100)::BIGINT AS vq,
         count(*) OVER wz AS n,
         sum(floor(value * 100)::BIGINT) OVER wz AS s,
         sum(floor(value * 100)::BIGINT
             * floor(value * 100)::BIGINT) OVER wz AS q,
         list(floor(value * 100)::BIGINT) OVER wz AS arr,
         list(floor(value * 100)::BIGINT) OVER we AS arr_e
  FROM events
  WINDOW
    wz AS (PARTITION BY user_id, event_type ORDER BY ts, event_id
           ROWS BETWEEN 19 PRECEDING AND CURRENT ROW),
    we AS (PARTITION BY user_id, event_type ORDER BY ts, event_id
           ROWS BETWEEN 16 PRECEDING AND 1 PRECEDING)),
derived AS (
  SELECT *,
         (n * vq - s)::BIGINT AS num,
         (n * (n * q - s * s))::BIGINT AS varnum,
         (n - 1)::BIGINT AS nm1,
         list_extract(list_sort(arr), (len(arr) + 1) // 2) AS med,
         list_extract(
           list_sort(list_transform(arr,
             x -> abs(x - list_extract(list_sort(arr),
                                       (len(arr) + 1) // 2)))),
           (len(arr) + 1) // 2) AS mad,
         coalesce(list_sum(list_transform(arr_e,
             (x, i) -> x * (1::BIGINT << (i - 1))))::BIGINT, 0) AS ws,
         ((1::BIGINT << len(arr_e)) - 1)::BIGINT AS norm
  FROM base),
flags AS (
  SELECT user_id, event_type, ts, event_id, value, vq,
         (CASE WHEN nm1 > 0 AND varnum > 0
                AND num * num * nm1 > 9 * varnum
               THEN 1 ELSE 0 END)::INT AS flag_z,
         (CASE WHEN mad > 0 AND abs(vq - med) > 3 * mad
               THEN 1 ELSE 0 END)::INT AS flag_mad,
         (CASE WHEN norm > 0 AND mad > 0
                AND abs(vq * norm - ws) > 3 * mad * norm
               THEN 1 ELSE 0 END)::INT AS flag_ewma
  FROM derived)
SELECT user_id, event_type, ts, event_id, value,
       flag_z, flag_mad, flag_ewma,
       (flag_z + flag_mad + flag_ewma)::INT AS votes,
       (CASE WHEN flag_z + flag_mad + flag_ewma >= 2
             THEN 1 ELSE 0 END)::INT AS is_anomaly
FROM flags
"""


from pyconform_spark.textops import containment_pairs_sql as _containment_sql

ORACLES["containment_dedup_pairs"] = _containment_sql()


ORACLES["period_over_period"] = f"""
WITH hourly AS (
  SELECT user_id, event_type, {_bucket(3600)} AS bucket_start,
         count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2, 3)
SELECT c.user_id, c.event_type, c.bucket_start,
       c.n AS n_events,
       p.n AS n_prev_day,
       CAST(c.n - p.n AS DOUBLE) / CAST(p.n AS DOUBLE) AS pct_change
FROM hourly c LEFT JOIN hourly p
  ON p.user_id = c.user_id AND p.event_type = c.event_type
 AND p.bucket_start + INTERVAL 1 DAY = c.bucket_start
"""


ORACLES["daily_utilization"] = """
WITH flagged AS (
  SELECT user_id, ts, (epoch_ms(ts)//1000)::BIGINT AS t_s, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR (epoch_ms(ts)//1000) - (epoch_ms(lag(ts) OVER w)//1000)
                   > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sess AS (
  SELECT *,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS session_id
  FROM flagged),
sessions AS (
  SELECT user_id, session_id,
         min(t_s) AS start_s, max(t_s) AS end_s,
         count(*)::BIGINT AS n_events
  FROM sess GROUP BY 1, 2)
SELECT user_id,
       make_timestamp((start_s - start_s % 86400) * 1000000) AS day,
       count(*)::BIGINT AS n_sessions,
       sum(end_s - start_s)::BIGINT AS busy_s,
       sum(n_events)::BIGINT AS n_events,
       CAST(sum(end_s - start_s) AS DOUBLE)
         / CAST('86400' AS DOUBLE) AS busy_frac
FROM sessions GROUP BY 1, 2
"""

ORACLES["changepoint_binseg"] = """
WITH base AS (
  SELECT event_type, ts, event_id,
         CAST(floor(value * 100) AS BIGINT) AS vq
  FROM events),
staged AS (
  SELECT event_type, ts,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY ts, event_id) AS i,
         sum(vq) OVER (PARTITION BY event_type ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS s_i,
         count(*) OVER (PARTITION BY event_type) AS n,
         sum(vq) OVER (PARTITION BY event_type) AS s_n
  FROM base),
cand1 AS (
  SELECT event_type, ts, i, s_i, n, s_n,
         abs(n * s_i - i * s_n) AS d
  FROM staged WHERE i < n),
cp1 AS (
  SELECT event_type, i AS cp, ts AS cp_ts, s_i AS s_cp, n, s_n, d
  FROM (SELECT *, row_number() OVER (PARTITION BY event_type
                                     ORDER BY d DESC, i) AS r
        FROM cand1)
  WHERE r = 1),
lvl1 AS (
  SELECT event_type, 1::BIGINT AS level, 0::BIGINT AS seg,
         cp::BIGINT AS cp_i, cp_ts, d::BIGINT AS d_stat,
         cp::BIGINT AS n_left, (n - cp)::BIGINT AS n_right,
         s_cp::DOUBLE / (cp * 100) AS mean_left,
         (s_n - s_cp)::DOUBLE / ((n - cp) * 100) AS mean_right
  FROM cp1),
seg2 AS (
  SELECT s.event_type, s.ts, s.i AS gi,
         CASE WHEN s.i <= c.cp THEN 0 ELSE 1 END AS seg,
         CASE WHEN s.i <= c.cp THEN s.i ELSE s.i - c.cp END AS i_loc,
         CASE WHEN s.i <= c.cp THEN s.s_i ELSE s.s_i - c.s_cp END AS s_loc,
         CASE WHEN s.i <= c.cp THEN c.cp ELSE s.n - c.cp END AS n_seg,
         CASE WHEN s.i <= c.cp THEN c.s_cp ELSE s.s_n - c.s_cp END AS s_seg
  FROM staged s JOIN cp1 c USING (event_type)),
cand2 AS (
  SELECT event_type, ts, gi, seg, i_loc, s_loc, n_seg, s_seg,
         abs(n_seg * s_loc - i_loc * s_seg) AS d
  FROM seg2 WHERE i_loc < n_seg),
lvl2 AS (
  SELECT event_type, 2::BIGINT AS level, seg::BIGINT AS seg,
         gi::BIGINT AS cp_i, ts AS cp_ts, d::BIGINT AS d_stat,
         i_loc::BIGINT AS n_left, (n_seg - i_loc)::BIGINT AS n_right,
         s_loc::DOUBLE / (i_loc * 100) AS mean_left,
         (s_seg - s_loc)::DOUBLE / ((n_seg - i_loc) * 100) AS mean_right
  FROM (SELECT *, row_number() OVER (PARTITION BY event_type, seg
                                     ORDER BY d DESC, gi) AS r
        FROM cand2)
  WHERE r = 1)
SELECT * FROM lvl1 UNION ALL SELECT * FROM lvl2
"""

ORACLES["motif_sax_pairs"] = """
WITH base AS (
  SELECT event_type, ts, event_id,
         CAST(floor(value * 100) AS BIGINT) AS vq
  FROM events),
staged AS (
  SELECT event_type, ts, vq AS v0,
         row_number() OVER w AS rn,
         lead(vq, 1) OVER w AS v1,
         lead(vq, 2) OVER w AS v2,
         lead(vq, 3) OVER w AS v3,
         lead(vq, 4) OVER w AS v4,
         lead(vq, 5) OVER w AS v5,
         lead(vq, 6) OVER w AS v6,
         lead(vq, 7) OVER w AS v7
  FROM base
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)),
summed AS (
  SELECT *, v0 + v1 + v2 + v3 + v4 + v5 + v6 + v7 AS sw
  FROM staged WHERE v7 IS NOT NULL),
centered AS (
  SELECT event_type, rn, ts,
         v0 * 8 - sw AS c0,
         v1 * 8 - sw AS c1,
         v2 * 8 - sw AS c2,
         v3 * 8 - sw AS c3,
         v4 * 8 - sw AS c4,
         v5 * 8 - sw AS c5,
         v6 * 8 - sw AS c6,
         v7 * 8 - sw AS c7
  FROM summed),
wins AS (
  SELECT event_type, rn, ts,
         (((c1 < c0)::BIGINT + (c2 < c0)::BIGINT + (c3 < c0)::BIGINT + (c4 < c0)::BIGINT + (c5 < c0)::BIGINT + (c6 < c0)::BIGINT + (c7 < c0)::BIGINT) // 2) * 1
       + (((c0 < c1)::BIGINT + (c2 < c1)::BIGINT + (c3 < c1)::BIGINT + (c4 < c1)::BIGINT + (c5 < c1)::BIGINT + (c6 < c1)::BIGINT + (c7 < c1)::BIGINT) // 2) * 4
       + (((c0 < c2)::BIGINT + (c1 < c2)::BIGINT + (c3 < c2)::BIGINT + (c4 < c2)::BIGINT + (c5 < c2)::BIGINT + (c6 < c2)::BIGINT + (c7 < c2)::BIGINT) // 2) * 16
       + (((c0 < c3)::BIGINT + (c1 < c3)::BIGINT + (c2 < c3)::BIGINT + (c4 < c3)::BIGINT + (c5 < c3)::BIGINT + (c6 < c3)::BIGINT + (c7 < c3)::BIGINT) // 2) * 64
       + (((c0 < c4)::BIGINT + (c1 < c4)::BIGINT + (c2 < c4)::BIGINT + (c3 < c4)::BIGINT + (c5 < c4)::BIGINT + (c6 < c4)::BIGINT + (c7 < c4)::BIGINT) // 2) * 256
       + (((c0 < c5)::BIGINT + (c1 < c5)::BIGINT + (c2 < c5)::BIGINT + (c3 < c5)::BIGINT + (c4 < c5)::BIGINT + (c6 < c5)::BIGINT + (c7 < c5)::BIGINT) // 2) * 1024
       + (((c0 < c6)::BIGINT + (c1 < c6)::BIGINT + (c2 < c6)::BIGINT + (c3 < c6)::BIGINT + (c4 < c6)::BIGINT + (c5 < c6)::BIGINT + (c7 < c6)::BIGINT) // 2) * 4096
       + (((c0 < c7)::BIGINT + (c1 < c7)::BIGINT + (c2 < c7)::BIGINT + (c3 < c7)::BIGINT + (c4 < c7)::BIGINT + (c5 < c7)::BIGINT + (c6 < c7)::BIGINT) // 2) * 16384
       + ((greatest(c0, c1, c2, c3, c4, c5, c6, c7)
           - least(c0, c1, c2, c3, c4, c5, c6, c7)) // 512) * 65536 AS word,
         c0, c1, c2, c3, c4, c5, c6, c7
  FROM centered),
pairs AS (
  SELECT a.event_type, a.rn AS r1, b.rn AS r2, a.ts AS ts1, b.ts AS ts2,
         a.word AS word,
         (a.c0 - b.c0) * (a.c0 - b.c0) + (a.c1 - b.c1) * (a.c1 - b.c1) + (a.c2 - b.c2) * (a.c2 - b.c2) + (a.c3 - b.c3) * (a.c3 - b.c3) + (a.c4 - b.c4) * (a.c4 - b.c4) + (a.c5 - b.c5) * (a.c5 - b.c5) + (a.c6 - b.c6) * (a.c6 - b.c6) + (a.c7 - b.c7) * (a.c7 - b.c7) AS dist
  FROM wins a JOIN wins b
    ON a.event_type = b.event_type AND a.word = b.word
   AND b.rn >= a.rn + 8)
SELECT event_type, rank::BIGINT AS rank, r1::BIGINT AS r1, r2::BIGINT AS r2,
       ts1, ts2, word::BIGINT AS word, dist::BIGINT AS dist
FROM (SELECT *, row_number() OVER (PARTITION BY event_type
                                   ORDER BY dist, r1, r2) AS rank
      FROM pairs)
WHERE rank <= 3
"""

ORACLES["cooccurrence_lift"] = """
WITH flags AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
               OR (epoch_ms(ts)//1000) - (epoch_ms(lag(ts) OVER w)//1000)
                  > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
st AS (
  SELECT DISTINCT user_id, session_id, event_type
  FROM (SELECT user_id, event_type,
               sum(new_sess) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                            AND CURRENT ROW) AS session_id
        FROM flags)),
n_total AS (
  SELECT count(*)::BIGINT AS n_sessions
  FROM (SELECT DISTINCT user_id, session_id FROM st)),
singles AS (
  SELECT event_type, count(*)::BIGINT AS n_single
  FROM st GROUP BY 1),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         count(*)::BIGINT AS n_ab
  FROM st a JOIN st b
    ON a.user_id = b.user_id AND a.session_id = b.session_id
   AND a.event_type < b.event_type
  GROUP BY 1, 2)
SELECT type_a, type_b, n_sessions,
       sa.n_single AS n_a, sb.n_single AS n_b, n_ab,
       n_ab::DOUBLE / n_sessions AS support,
       n_ab::DOUBLE / sa.n_single AS conf_a_to_b,
       n_ab::DOUBLE / sb.n_single AS conf_b_to_a,
       (n_ab * n_sessions)::DOUBLE / (sa.n_single * sb.n_single) AS lift
FROM pairs
JOIN singles sa ON sa.event_type = type_a
JOIN singles sb ON sb.event_type = type_b
CROSS JOIN n_total
"""

ORACLES["spearman_rank_corr"] = f"""
WITH hourly AS (
  SELECT user_id, event_type, {_bucket(3600)} AS bucket_start,
         sum(floor(value * 100)::BIGINT)::BIGINT AS vq
  FROM events GROUP BY 1, 2, 3),
j AS (
  SELECT a.user_id, a.event_type AS type_a, b.event_type AS type_b,
         a.vq AS xa, b.vq AS xb
  FROM hourly a
  JOIN hourly b ON a.user_id = b.user_id
               AND a.bucket_start = b.bucket_start
               AND a.event_type < b.event_type),
ranked AS (
  SELECT user_id, type_a, type_b,
         (2 * rank() OVER (PARTITION BY user_id, type_a, type_b
                           ORDER BY xa)
          + count(*) OVER (PARTITION BY user_id, type_a, type_b, xa)
          - 1)::BIGINT AS rx,
         (2 * rank() OVER (PARTITION BY user_id, type_a, type_b
                           ORDER BY xb)
          + count(*) OVER (PARTITION BY user_id, type_a, type_b, xb)
          - 1)::BIGINT AS ry
  FROM j),
agg AS (
  SELECT user_id, type_a, type_b,
         count(*)::BIGINT AS n,
         sum(rx)::BIGINT AS sx, sum(ry)::BIGINT AS sy,
         sum(rx * ry)::BIGINT AS sxy,
         sum(rx * rx)::BIGINT AS sxx,
         sum(ry * ry)::BIGINT AS syy
  FROM ranked GROUP BY 1, 2, 3)
SELECT user_id, type_a, type_b, n AS n_buckets,
       CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
            THEN (n * sxy - sx * sy)
                 / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
       END AS spearman_rho
FROM agg
"""

from pyconform_spark.operators.graph import pagerank_handoff_sql as _pr_sql

ORACLES["pagerank_handoff"] = _pr_sql()

from pyconform_spark.operators.graph import triangle_count_sql as _tri_sql

ORACLES["triangle_count_handoff"] = _tri_sql()

ORACLES["decayed_leaderboard"] = """
WITH daily AS (
  SELECT user_id, date_trunc('day', ts)::DATE AS d,
         sum(floor(value * 100)::BIGINT)::BIGINT AS vq
  FROM events GROUP BY 1, 2),
ref AS (SELECT max(d) AS ref_d FROM daily),
j AS (
  SELECT user_id, vq, date_diff('day', d, ref_d) AS age
  FROM daily CROSS JOIN ref
  WHERE date_diff('day', d, ref_d) <= 30),
agg AS (
  SELECT user_id,
         sum(vq * (1::BIGINT << (30 - age)))::BIGINT AS decayed_num
  FROM j GROUP BY user_id)
SELECT user_id, decayed_num,
       decayed_num / ((1::BIGINT << 30) * 100)::BIGINT AS decayed_score
FROM agg
ORDER BY decayed_num DESC, user_id
LIMIT 20
"""

from pyconform_spark.operators.graph import khop_distances_sql as _khop_sql

ORACLES["khop_reach"] = _khop_sql()

ORACLES["media_png_props"] = """
WITH ids AS (SELECT event_id FROM events WHERE event_id < 400),
dims AS (
  SELECT event_id, event_id % 12 + 1 AS w, event_id % 6 + 1 AS h
  FROM ids),
g AS (SELECT unnest(generate_series(0, 215)) AS k),
psum AS (
  SELECT d.event_id, d.w, d.h, d.w * d.h * 3 AS n,
         sum((3 * g.k + d.event_id) % 256)::BIGINT AS s
  FROM dims d JOIN g ON g.k < d.w * d.h * 3
  GROUP BY d.event_id, d.w, d.h)
SELECT event_id::BIGINT AS event_id, n::BIGINT AS n_pixels3,
       w::INT AS width, h::INT AS height,
       CAST(s AS DOUBLE) / n AS mean_value
FROM psum
"""

from pyconform_spark.operators.dtw import dtw_pairs_sql as _dtw_sql

ORACLES["dtw_profile_pairs"] = _dtw_sql()

from pyconform_spark.operators.smooth import isotonic_minimax_sql as _iso_sql

ORACLES["isotonic_trend"] = _iso_sql(
    "SELECT event_type AS series, date_trunc('day', ts) AS d, "
    "sum(floor(value * 100)::BIGINT)::BIGINT AS y FROM events GROUP BY 1, 2"
)


# ------------------------------------- dyadic Count-Min rank sketch
def _dyadic_rank_sql() -> str:
    from pyconform_spark.queries import (
        _DY_D,
        _DY_L,
        _DY_PROBES,
        _DY_W,
        _dy_bucket,
        _dyadic_cells,
    )

    branches = "\nUNION ALL\n".join(
        f"SELECT {r} AS r, {l} AS l, "
        f"(md5_number_lower('dy{r}|{l}|' || (vq >> {l})::VARCHAR) "
        f"% {_DY_W})::BIGINT AS b FROM ev"
        for r in range(_DY_D)
        for l in range(_DY_L)
    )
    pc_rows = ",\n    ".join(
        f"({p}, {r}, {l}, {prefix}, {_dy_bucket(r, l, prefix)})"
        for p in _DY_PROBES
        for (l, prefix) in _dyadic_cells(p)
        for r in range(_DY_D)
    )
    probes = ", ".join(f"({p})" for p in _DY_PROBES)
    return f"""
WITH ev AS MATERIALIZED (
  SELECT floor(value * 100)::BIGINT AS vq FROM events),
cells AS ({branches}),
sketch AS (
  SELECT r, l, b, count(*)::BIGINT AS cnt FROM cells GROUP BY 1, 2, 3),
pc AS (SELECT * FROM (VALUES
    {pc_rows}
  ) t(probe_vq, r, l, prefix, b)),
cell_est AS (
  SELECT probe_vq, l, prefix,
         min(coalesce(s.cnt, 0)) AS cell_est
  FROM pc LEFT JOIN sketch s USING (r, l, b)
  GROUP BY 1, 2, 3),
est AS (
  SELECT probe_vq, sum(cell_est)::BIGINT AS est_rank
  FROM cell_est GROUP BY 1),
probes AS (SELECT * FROM (VALUES {probes}) t(probe_vq)),
exact AS (
  SELECT p.probe_vq,
         sum(CASE WHEN ev.vq < p.probe_vq THEN 1 ELSE 0 END)::BIGINT
           AS exact_rank
  FROM ev, probes p GROUP BY 1)
SELECT est.probe_vq::BIGINT AS probe_vq, est_rank, exact_rank
FROM est JOIN exact USING (probe_vq)
"""


ORACLES["dyadic_rank_sketch"] = _dyadic_rank_sql()

ORACLES["attribution_credit"] = """
WITH touches AS (
  SELECT user_id, ts AS touch_ts, event_id AS touch_id,
         event_type AS channel
  FROM events WHERE event_type IN ('click', 'view', 'signup')),
convs AS (
  SELECT user_id, ts AS conv_ts, event_id AS conv_id
  FROM events WHERE event_type = 'purchase'),
paired AS (
  SELECT c.conv_id, t.channel, t.touch_ts, t.touch_id
  FROM convs c JOIN touches t USING (user_id)
  WHERE t.touch_ts < c.conv_ts
    AND t.touch_ts >= c.conv_ts - INTERVAL 7 DAY),
ranked AS (
  SELECT conv_id, channel,
         row_number() OVER (PARTITION BY conv_id
                            ORDER BY touch_ts DESC, touch_id DESC) AS rn,
         count(*) OVER (PARTITION BY conv_id) AS n_touch
  FROM paired)
SELECT channel,
       sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END)::BIGINT AS conv_last_touch,
       sum(1000000000000 // n_touch)::BIGINT AS linear_credit_1e12,
       (sum(1000000000000 // n_touch)::BIGINT)::DOUBLE / 1000000000000
         AS linear_credit
FROM ranked GROUP BY channel
"""

ORACLES["record_breaks"] = """
WITH base AS (
  SELECT event_type, ts, event_id,
         floor(value * 100)::BIGINT AS vq,
         max(floor(value * 100)::BIGINT) OVER (
           PARTITION BY event_type ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
  FROM events)
SELECT event_type, ts, event_id::BIGINT AS event_id,
       vq AS record_vq, prev_max AS prev_record_vq,
       (vq - coalesce(prev_max, 0))::BIGINT AS gap_vq
FROM base WHERE prev_max IS NULL OR vq > prev_max
"""

ORACLES["sequential_pattern_support"] = """
WITH base AS (
  SELECT user_id, ts, event_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS pos,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) IS NULL
                OR (epoch_ms(ts)//1000) - (epoch_ms(lag(ts) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id))//1000)
                   > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events),
sess AS (
  SELECT user_id, event_type, pos,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY pos)
           AS session_id
  FROM base),
spans AS (
  SELECT user_id, session_id, event_type,
         min(pos) AS min_pos, max(pos) AS max_pos
  FROM sess GROUP BY 1, 2, 3)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       count(*)::BIGINT AS n_cooccur,
       sum(CASE WHEN a.min_pos < b.max_pos THEN 1 ELSE 0 END)::BIGINT
         AS n_seq,
       (sum(CASE WHEN a.min_pos < b.max_pos THEN 1 ELSE 0 END)::BIGINT)
         ::DOUBLE / count(*) AS seq_ratio
FROM spans a JOIN spans b
  ON a.user_id = b.user_id AND a.session_id = b.session_id
 AND a.event_type <> b.event_type
GROUP BY 1, 2
"""


ORACLES["scd2_dim_join"] = """
WITH ch AS (
  SELECT user_id, ts, max(floor(value * 100)::BIGINT) AS plan_q
  FROM events WHERE event_type = 'signup' GROUP BY 1, 2),
dim AS (
  SELECT user_id, ts AS valid_from,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to,
         row_number() OVER (PARTITION BY user_id ORDER BY ts)::INT
           AS scd_version,
         plan_q
  FROM ch),
f AS (
  SELECT user_id, ts, event_id::BIGINT AS event_id
  FROM events WHERE event_type = 'purchase')
SELECT f.user_id, f.ts, f.event_id,
       d.plan_q AS plan_q, d.scd_version AS scd_version
FROM f LEFT JOIN dim d
  ON f.user_id = d.user_id AND f.ts >= d.valid_from
 AND (d.valid_to IS NULL OR f.ts < d.valid_to)
"""


ORACLES["cdc_apply_latest"] = """
WITH cdc AS (
  SELECT user_id, event_type, ts, event_id::BIGINT AS event_id,
         CASE WHEN event_id % 10 = 0 THEN 'D' ELSE 'U' END AS op,
         floor(value * 100)::BIGINT AS vq,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events)
SELECT user_id, event_type, ts AS last_ts,
       event_id AS last_event_id, vq AS last_vq
FROM cdc WHERE rn = 1 AND op = 'U'
"""


ORACLES["ivm_join_view"] = """
SELECT c.c_mktsegment,
       date_trunc('month', o.o_orderdate) AS order_month,
       CAST(sum(CAST(o.o_totalprice AS DECIMAL(20,6))) AS DOUBLE)
         AS revenue,
       count(*)::BIGINT AS n_orders
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY 1, 2
"""


ORACLES["variant_props_rollup"] = """
WITH x AS (
  SELECT event_type,
         json_extract(props, '$.k')::INT AS k,
         json_extract(props, '$.missing')::INT AS m
  FROM events)
SELECT event_type,
       count(*)::BIGINT AS n_rows,
       sum(k)::BIGINT AS k_sum,
       max(k)::INT AS k_max,
       sum(CASE WHEN k > 50 THEN 1 ELSE 0 END)::BIGINT AS n_big,
       count(m)::BIGINT AS n_missing_path
FROM x GROUP BY 1
"""


ORACLES["matrix_profile_series"] = """
WITH b AS (
  SELECT min(epoch_ms(ts)//1000 - (epoch_ms(ts)//1000) % 3600) AS mn,
         max(epoch_ms(ts)//1000 - (epoch_ms(ts)//1000) % 3600) AS mx
  FROM events),
sl AS (SELECT DISTINCT event_type AS series FROM events),
g0 AS (
  SELECT sl.series, unnest(generate_series(b.mn, b.mx, 3600)) AS h_s
  FROM sl, b),
g AS (
  SELECT series, h_s,
         ((h_s - (SELECT mn FROM b)) // 3600)::INT AS pos
  FROM g0),
vv AS (
  SELECT event_type AS series,
         epoch_ms(ts)//1000 - (epoch_ms(ts)//1000) % 3600 AS h_s,
         sum(floor(value * 100)::BIGINT)::BIGINT AS vq
  FROM events GROUP BY 1, 2),
sv AS (
  SELECT g.series, g.pos, g.h_s, coalesce(vv.vq, 0)::BIGINT AS v
  FROM g LEFT JOIN vv USING (series, h_s)),
n AS (SELECT max(pos) + 1 AS n FROM sv),
wk AS (
  SELECT sv.series, sv.pos - t.k AS w, t.k, sv.v
  FROM sv, generate_series(0, 23) AS t(k)
  WHERE sv.pos - t.k BETWEEN 0 AND (SELECT n FROM n) - 24),
d AS (
  SELECT a.series, a.w AS i, bb.w AS j,
         sum((a.v - bb.v) * (a.v - bb.v))::BIGINT AS dist
  FROM wk a JOIN wk bb
    ON bb.series = a.series AND bb.k = a.k AND bb.w >= a.w + 24
  GROUP BY 1, 2, 3),
p AS (
  SELECT series, i AS w, j AS nb, dist FROM d
  UNION ALL
  SELECT series, j AS w, i AS nb, dist FROM d),
r AS (
  SELECT series, w, nb, dist,
         row_number() OVER (PARTITION BY series, w
                            ORDER BY dist, nb) AS rn
  FROM p)
SELECT r.series, make_timestamp(sv.h_s * 1000000) AS window_start,
       r.w::INT AS pos, r.dist AS mp_dist, r.nb::INT AS nn_pos
FROM r JOIN sv ON sv.series = r.series AND sv.pos = r.w
WHERE r.rn = 1
"""


ORACLES["window_join_context"] = """
WITH l AS (
  SELECT user_id, ts, event_id::BIGINT AS event_id, epoch_us(ts) AS t
  FROM events WHERE event_type = 'error'),
r AS (
  SELECT user_id, epoch_us(ts) AS t, floor(value * 100)::BIGINT AS vq
  FROM events WHERE event_type = 'purchase')
SELECT l.user_id, l.ts, l.event_id,
       count(r.vq)::BIGINT AS n_nearby,
       sum(r.vq)::BIGINT AS vq_sum,
       min(r.vq)::BIGINT AS vq_min,
       max(r.vq)::BIGINT AS vq_max
FROM l LEFT JOIN r
  ON r.user_id = l.user_id
 AND r.t BETWEEN l.t - 7200000000 AND l.t + 7200000000
GROUP BY 1, 2, 3
"""


# The tiled (SCAMP) matrix profile must equal the single-group form,
# so it shares the identical oracle — a green row proves the tiling.
ORACLES["matrix_profile_tiled_series"] = ORACLES["matrix_profile_series"]

ORACLES["mann_kendall_trend"] = """
WITH recent AS (
  SELECT user_id, event_type, ts, event_id::BIGINT AS event_id,
         floor(value * 100)::BIGINT AS vq,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events),
k AS (SELECT * FROM recent WHERE rn <= 24),
ordered AS (
  SELECT user_id, event_type, vq,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS r
  FROM k),
s AS (
  SELECT a.user_id, a.event_type,
         sum(CASE WHEN b.vq > a.vq THEN 1
                  WHEN b.vq < a.vq THEN -1 ELSE 0 END)::BIGINT AS s_stat
  FROM ordered a JOIN ordered b
    ON a.user_id = b.user_id AND a.event_type = b.event_type
   AND a.r < b.r
  GROUP BY 1, 2),
tg AS (
  SELECT user_id, event_type, vq, count(*)::BIGINT AS t
  FROM ordered GROUP BY 1, 2, 3),
ties AS (
  SELECT user_id, event_type, sum(t)::BIGINT AS n,
         sum(t * (t - 1) * (2 * t + 5))::BIGINT AS tie18
  FROM tg GROUP BY 1, 2),
j AS (
  SELECT s.user_id, s.event_type, s.s_stat, ties.n,
         (ties.n * (ties.n - 1) * (2 * ties.n + 5)
          - ties.tie18)::BIGINT AS var18
  FROM s JOIN ties USING (user_id, event_type)),
zc AS (
  SELECT *,
         CASE WHEN s_stat = 0 THEN 0.0
              ELSE (s_stat - CASE WHEN s_stat > 0 THEN 1 ELSE -1 END)::DOUBLE
                   / sqrt(var18::DOUBLE / 18.0) END AS z
  FROM j)
SELECT user_id, event_type, n, s_stat, var18, z,
       CASE WHEN z > 1.959963984540054 THEN 'increasing'
            WHEN z < -1.959963984540054 THEN 'decreasing'
            ELSE 'no_trend' END AS trend
FROM zc
"""

# Motif/discord read-off shares the profile construction: nest the
# matrix-profile oracle as a CTE and rank it both ways.
ORACLES["mp_motifs_discords"] = f"""
WITH mp AS (
{ORACLES["matrix_profile_series"]}
),
mo AS (
  SELECT series, 'motif' AS kind,
         row_number() OVER (PARTITION BY series
                            ORDER BY mp_dist, pos)::BIGINT AS rnk,
         pos, window_start, nn_pos, mp_dist
  FROM mp),
di AS (
  SELECT series, 'discord' AS kind,
         row_number() OVER (PARTITION BY series
                            ORDER BY mp_dist DESC, pos)::BIGINT AS rnk,
         pos, window_start, nn_pos, mp_dist
  FROM mp)
SELECT * FROM mo WHERE rnk = 1
UNION ALL
SELECT * FROM di WHERE rnk <= 3
"""


ORACLES["ordinal_patterns"] = """
WITH base AS (
  SELECT user_id, event_type, ts, event_id::BIGINT AS event_id,
         floor(value * 100)::BIGINT AS v1
  FROM events),
tri AS (
  SELECT user_id, event_type, v1,
         lead(v1, 1) OVER w AS v2,
         lead(v1, 2) OVER w AS v3
  FROM base
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)),
coded AS (
  SELECT user_id, event_type,
         concat(
           CASE WHEN v2 > v1 THEN '+' WHEN v2 < v1 THEN '-' ELSE '0' END,
           CASE WHEN v3 > v2 THEN '+' WHEN v3 < v2 THEN '-' ELSE '0' END,
           CASE WHEN v3 > v1 THEN '+' WHEN v3 < v1 THEN '-' ELSE '0' END
         ) AS pattern
  FROM tri WHERE v3 IS NOT NULL),
counted AS (
  SELECT user_id, event_type, pattern, count(*)::BIGINT AS cnt
  FROM coded GROUP BY 1, 2, 3)
SELECT user_id, event_type, pattern, cnt,
       (sum(cnt) OVER (PARTITION BY user_id, event_type))::BIGINT AS n_triples,
       cnt::DOUBLE
         / (sum(cnt) OVER (PARTITION BY user_id, event_type))::DOUBLE AS frac
FROM counted
"""

ORACLES["kmv_user_jaccard"] = f"""
WITH dus AS (
  SELECT DISTINCT event_type AS etype, user_id FROM events),
hashed AS (
  SELECT DISTINCT etype,
         (md5_number_lower(user_id::VARCHAR) % 2147483647)::BIGINT AS h
  FROM dus),
sk AS (
  SELECT etype, h FROM (
    SELECT etype, h,
           row_number() OVER (PARTITION BY etype ORDER BY h) AS rn
    FROM hashed) WHERE rn <= 64),
pairs AS (
  SELECT a.etype AS type_a, b.etype AS type_b
  FROM (SELECT DISTINCT etype FROM dus) a,
       (SELECT DISTINCT etype FROM dus) b
  WHERE a.etype < b.etype),
merged AS (
  SELECT p.type_a, p.type_b, s.h,
         max(CASE WHEN s.etype = p.type_a THEN 1 ELSE 0 END) AS in_a,
         max(CASE WHEN s.etype = p.type_b THEN 1 ELSE 0 END) AS in_b
  FROM pairs p JOIN sk s ON s.etype IN (p.type_a, p.type_b)
  GROUP BY 1, 2, 3),
kmv AS (
  SELECT type_a, type_b,
         sum(in_a * in_b)::BIGINT AS kmv_inter,
         count(*)::BIGINT AS kmv_k
  FROM (
    SELECT *,
           row_number() OVER (PARTITION BY type_a, type_b ORDER BY h) AS rn
    FROM merged) WHERE rn <= 64
  GROUP BY 1, 2),
counts AS (
  SELECT etype, count(*)::BIGINT AS n_users FROM dus GROUP BY 1),
inter AS (
  SELECT a.etype AS type_a, b.etype AS type_b,
         count(*)::BIGINT AS inter_exact
  FROM dus a JOIN dus b
    ON a.user_id = b.user_id AND a.etype < b.etype
  GROUP BY 1, 2)
SELECT i.type_a, i.type_b, ca.n_users AS n_a, cb.n_users AS n_b,
       i.inter_exact,
       (ca.n_users + cb.n_users - i.inter_exact)::BIGINT AS union_exact,
       i.inter_exact::DOUBLE
         / (ca.n_users + cb.n_users - i.inter_exact)::DOUBLE AS jacc_exact,
       k.kmv_inter, k.kmv_k,
       k.kmv_inter::DOUBLE / k.kmv_k::DOUBLE AS jacc_kmv
FROM inter i
JOIN counts ca ON ca.etype = i.type_a
JOIN counts cb ON cb.etype = i.type_b
JOIN kmv k ON k.type_a = i.type_a AND k.type_b = i.type_b
"""

ORACLES["peak_detect"] = """
WITH sums AS (
  SELECT event_type AS series,
         ((epoch_ms(ts)//1000 - (epoch_ms(ts)//1000) % 3600) // 3600)::BIGINT AS h,
         sum(floor(value * 100)::BIGINT)::BIGINT AS v
  FROM events GROUP BY 1, 2),
staged AS (
  SELECT series, h, v,
         max({'v': v, 'nh': -h}) OVER (PARTITION BY series ORDER BY h
             RANGE BETWEEN 12 PRECEDING AND 12 FOLLOWING) AS mx,
         count(*) OVER (PARTITION BY series ORDER BY h
             RANGE BETWEEN 12 PRECEDING AND 12 FOLLOWING)::BIGINT AS n_window
  FROM sums)
SELECT series, make_timestamp(h * 3600 * 1000000) AS ts, v, n_window
FROM staged
WHERE v = mx.v AND -h = mx.nh
"""

ORACLES["ams_f2_sketch"] = """
WITH signed AS (
  SELECT t.lane,
         (md5_number_lower(user_id::VARCHAR || '|' || t.lane::VARCHAR)
           % 2147483647)::BIGINT % 2 * 2 - 1 AS sign
  FROM events, generate_series(0, 15) AS t(lane)),
xs AS (
  SELECT lane, sum(sign)::BIGINT AS x FROM signed GROUP BY 1),
est AS (
  SELECT count(*)::BIGINT AS n_lanes, sum(x * x)::BIGINT AS sum_x2 FROM xs),
exact AS (
  SELECT sum(c * c)::BIGINT AS f2_exact
  FROM (SELECT count(*)::BIGINT AS c FROM events GROUP BY user_id))
SELECT n_lanes, sum_x2,
       sum_x2::DOUBLE / n_lanes::DOUBLE AS f2_est,
       f2_exact,
       (sum_x2::DOUBLE / n_lanes::DOUBLE) / f2_exact::DOUBLE AS est_over_exact
FROM est, exact
"""

ORACLES["allan_variance"] = """
WITH ordered AS (
  SELECT user_id, event_type,
         floor(value * 100)::BIGINT AS vq,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS r
  FROM events),
fanned AS (
  SELECT o.user_id, o.event_type, o.vq, taus.tau,
         (o.r - 1) // taus.tau AS blk
  FROM ordered o CROSS JOIN (VALUES (1), (2), (4)) taus(tau)),
blocks AS (
  SELECT user_id, event_type, tau, blk,
         sum(vq)::BIGINT AS s, count(*)::BIGINT AS cnt
  FROM fanned GROUP BY 1, 2, 3, 4),
full_blocks AS (SELECT * FROM blocks WHERE cnt = tau),
diffed AS (
  SELECT user_id, event_type, tau,
         s - lag(s) OVER (PARTITION BY user_id, event_type, tau
                          ORDER BY blk) AS d
  FROM full_blocks),
agg AS (
  SELECT user_id, event_type, tau,
         count(*)::BIGINT AS m_blocks,
         sum(d * d)::BIGINT AS sum_d2
  FROM diffed GROUP BY 1, 2, 3
  HAVING count(*) >= 2)
SELECT user_id, event_type, tau::INTEGER AS tau, m_blocks, sum_d2,
       sum_d2::DOUBLE
       / (2 * (m_blocks - 1) * tau * tau * 10000)::DOUBLE AS allan_var
FROM agg
"""

ORACLES["tvd_drift"] = """
WITH base AS (
  SELECT event_type,
         (epoch_ms(ts)//1000)::BIGINT AS es,
         floor(value * 100)::BIGINT AS vq
  FROM events),
spans AS (
  SELECT event_type, ((min(es) + max(es)) // 2)::BIGINT AS mid
  FROM base GROUP BY 1),
tagged AS (
  SELECT b.event_type,
         CASE WHEN b.es <= s.mid THEN 1 ELSE 0 END AS in_a,
         b.vq // 5000 AS bin
  FROM base b JOIN spans s USING (event_type)),
bins AS (
  SELECT event_type, bin,
         sum(in_a)::BIGINT AS c_a,
         sum(1 - in_a)::BIGINT AS c_b
  FROM tagged GROUP BY 1, 2),
per_bin AS (
  SELECT event_type, bin, c_a, c_b,
         sum(c_a) OVER (PARTITION BY event_type)::BIGINT AS n_a,
         sum(c_b) OVER (PARTITION BY event_type)::BIGINT AS n_b
  FROM bins)
SELECT event_type,
       max(n_a)::BIGINT AS n_a,
       max(n_b)::BIGINT AS n_b,
       count(*)::BIGINT AS n_bins,
       sum(abs(c_a * n_b - c_b * n_a))::BIGINT AS tvd_num,
       CASE WHEN max(n_a) > 0 AND max(n_b) > 0
            THEN sum(abs(c_a * n_b - c_b * n_a))::DOUBLE
                 / (2 * max(n_a) * max(n_b))::DOUBLE
       END AS tvd
FROM per_bin GROUP BY 1
"""

ORACLES["availability_sla"] = f"""
WITH base AS (
  SELECT event_type,
         {_bucket(86400)} AS day,
         ((epoch_ms(ts)//1000) - (epoch_ms(ts)//1000) % 60)::BIGINT
           AS minute_slot
  FROM events)
SELECT event_type, day,
       count(DISTINCT minute_slot)::BIGINT AS minutes_up,
       count(*)::BIGINT AS n_events,
       count(DISTINCT minute_slot)::DOUBLE / 1440.0 AS availability,
       count(DISTINCT minute_slot) * 1000 >= 43200 AS sla_met
FROM base GROUP BY 1, 2
"""

ORACLES["ordinal_complexity"] = """
WITH base AS (
  SELECT user_id, event_type, ts, event_id::BIGINT AS event_id,
         floor(value * 100)::BIGINT AS v1
  FROM events),
tri AS (
  SELECT user_id, event_type, v1,
         lead(v1, 1) OVER w AS v2,
         lead(v1, 2) OVER w AS v3
  FROM base
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)),
coded AS (
  SELECT user_id, event_type,
         concat(
           CASE WHEN v2 - v1 > 0 THEN '+' WHEN v2 - v1 < 0 THEN '-' ELSE '0' END,
           CASE WHEN v3 - v2 > 0 THEN '+' WHEN v3 - v2 < 0 THEN '-' ELSE '0' END,
           CASE WHEN v3 - v1 > 0 THEN '+' WHEN v3 - v1 < 0 THEN '-' ELSE '0' END
         ) AS pattern
  FROM tri WHERE v3 IS NOT NULL),
counted AS (
  SELECT user_id, event_type, pattern, count(*)::BIGINT AS cnt
  FROM coded GROUP BY 1, 2, 3),
agg AS (
  SELECT user_id, event_type,
         sum(cnt)::BIGINT AS n_triples,
         count(*)::BIGINT AS n_patterns,
         max(cnt)::BIGINT AS max_cnt,
         sum(cnt * (cnt - 1))::BIGINT AS pair_num
  FROM counted GROUP BY 1, 2
  HAVING sum(cnt) >= 2)
SELECT user_id, event_type, n_triples, n_patterns,
       max_cnt::DOUBLE / n_triples::DOUBLE AS dominant_frac,
       1.0 - pair_num::DOUBLE
             / (n_triples * (n_triples - 1))::DOUBLE AS simpson_diversity
FROM agg
"""

ORACLES["max_drawdown"] = """
WITH base AS (
  SELECT user_id, event_type,
         floor(value * 100)::BIGINT AS vq,
         max(floor(value * 100)::BIGINT) OVER (
           PARTITION BY user_id, event_type ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS runmax
  FROM events)
SELECT user_id, event_type,
       count(*)::BIGINT AS n,
       max(vq)::BIGINT AS peak_cq,
       max(runmax - vq)::BIGINT AS max_dd_cq,
       max((runmax - vq)::DOUBLE / runmax::DOUBLE) AS max_dd_rel
FROM base GROUP BY 1, 2
"""

_DAILY_TYPE_SUMS = """
  SELECT event_type,
         ((epoch_ms(ts)//1000) - (epoch_ms(ts)//1000) % 86400)::BIGINT AS day,
         sum(floor(value * 100)::BIGINT)::BIGINT AS sv
  FROM events GROUP BY 1, 2
"""

ORACLES["spearman_daily_pairs"] = f"""
WITH daily AS ({_DAILY_TYPE_SUMS}),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, a.day,
         a.sv AS sv_a, b.sv AS sv_b
  FROM daily a JOIN daily b ON a.day = b.day
  WHERE a.event_type < b.event_type),
ranked AS (
  SELECT type_a, type_b, day,
         2 * rank() OVER (PARTITION BY type_a, type_b ORDER BY sv_a)
           + count(*) OVER (PARTITION BY type_a, type_b, sv_a) - 2 AS ra2,
         2 * rank() OVER (PARTITION BY type_a, type_b ORDER BY sv_b)
           + count(*) OVER (PARTITION BY type_a, type_b, sv_b) - 2 AS rb2
  FROM pairs),
mom AS (
  SELECT type_a, type_b,
         count(*)::BIGINT AS n_days,
         sum(ra2)::BIGINT AS sx, sum(rb2)::BIGINT AS sy,
         sum(ra2 * ra2)::BIGINT AS sxx, sum(rb2 * rb2)::BIGINT AS syy,
         sum(ra2 * rb2)::BIGINT AS sxy
  FROM ranked GROUP BY 1, 2
  HAVING count(*) >= 3)
SELECT type_a, type_b, n_days,
       CASE WHEN (n_days * sxx - sx * sx) > 0
             AND (n_days * syy - sy * sy) > 0
            THEN (n_days * sxy - sx * sy)::DOUBLE
                 / (sqrt((n_days * sxx - sx * sx)::DOUBLE)
                    * sqrt((n_days * syy - sy * sy)::DOUBLE))
       END AS spearman_rho
FROM mom
"""

ORACLES["kendall_tau_pairs"] = f"""
WITH daily AS ({_DAILY_TYPE_SUMS}),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, a.day,
         a.sv AS sv_a, b.sv AS sv_b
  FROM daily a JOIN daily b ON a.day = b.day
  WHERE a.event_type < b.event_type),
dp AS (
  SELECT i.type_a, i.type_b,
         i.sv_a AS xa1, i.sv_b AS xb1, j.sv_a AS xa2, j.sv_b AS xb2
  FROM pairs i JOIN pairs j
    ON i.type_a = j.type_a AND i.type_b = j.type_b AND i.day < j.day),
cd AS (
  SELECT type_a, type_b,
         sum((sign(xa2 - xa1) * sign(xb2 - xb1))::BIGINT)::BIGINT
           AS c_minus_d,
         count(*)::BIGINT AS n0,
         sum(CASE WHEN xa1 = xa2 THEN 1 ELSE 0 END)::BIGINT AS n1,
         sum(CASE WHEN xb1 = xb2 THEN 1 ELSE 0 END)::BIGINT AS n2
  FROM dp GROUP BY 1, 2)
SELECT type_a, type_b, n0, c_minus_d,
       CASE WHEN n0 > n1 AND n0 > n2
            THEN c_minus_d::DOUBLE
                 / sqrt(((n0 - n1) * (n0 - n2))::DOUBLE)
       END AS kendall_tau_b
FROM cd
"""

ORACLES["benford_digit_profile"] = """
WITH digits AS (
  SELECT event_type,
         substring(floor(value * 100)::BIGINT::VARCHAR, 1, 1)::INTEGER
           AS digit
  FROM events),
counted AS (
  SELECT event_type, digit, count(*)::BIGINT AS observed
  FROM digits GROUP BY 1, 2),
with_n AS (
  SELECT event_type, digit, observed,
         sum(observed) OVER (PARTITION BY event_type)::BIGINT AS n,
         CASE digit
           WHEN 1 THEN 0.3010299956639812
           WHEN 2 THEN 0.17609125905568124
           WHEN 3 THEN 0.12493873660829992
           WHEN 4 THEN 0.09691001300805642
           WHEN 5 THEN 0.07918124604762482
           WHEN 6 THEN 0.06694678963061322
           WHEN 7 THEN 0.05799194697768673
           WHEN 8 THEN 0.05115252244738129
           WHEN 9 THEN 0.04575749056067514
         END AS benford_p
  FROM counted)
SELECT event_type, digit, observed, n,
       observed::DOUBLE / n::DOUBLE AS obs_frac,
       benford_p,
       (observed::DOUBLE - n::DOUBLE * benford_p)
       * (observed::DOUBLE - n::DOUBLE * benford_p)
       / (n::DOUBLE * benford_p) AS chi2_component
FROM with_n
"""

_PER_USER_TOTALS = """
  SELECT event_type, user_id,
         sum(floor(value * 100)::BIGINT)::BIGINT AS x
  FROM events GROUP BY 1, 2
"""

ORACLES["pareto_concentration"] = f"""
WITH per_user AS ({_PER_USER_TOTALS}),
ranked AS (
  SELECT event_type, x,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY x DESC, user_id) AS rnk,
         sum(x) OVER (PARTITION BY event_type
                      ORDER BY x DESC, user_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum,
         sum(x) OVER (PARTITION BY event_type) AS total,
         count(*) OVER (PARTITION BY event_type) AS n_users
  FROM per_user),
hit AS (
  SELECT event_type,
         min(rnk)::BIGINT AS users_for_80pct,
         max(n_users)::BIGINT AS n_users,
         max(total)::BIGINT AS total_cq
  FROM ranked WHERE 5 * cum >= 4 * total
  GROUP BY 1),
top1 AS (
  SELECT event_type, max(x)::BIGINT AS top1_cq FROM per_user GROUP BY 1)
SELECT h.event_type, h.n_users, h.users_for_80pct,
       h.users_for_80pct::DOUBLE / h.n_users::DOUBLE
         AS user_frac_for_80pct,
       t.top1_cq::DOUBLE / h.total_cq::DOUBLE AS top1_share
FROM hit h JOIN top1 t USING (event_type)
"""

ORACLES["gini_user_concentration"] = f"""
WITH per_user AS ({_PER_USER_TOTALS}),
ranked AS (
  SELECT event_type, x,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY x, user_id)::BIGINT AS i
  FROM per_user),
agg AS (
  SELECT event_type,
         count(*)::BIGINT AS n_users,
         sum(x)::BIGINT AS total_cq,
         sum(i * x)::BIGINT AS iwx
  FROM ranked GROUP BY 1)
SELECT event_type, n_users, total_cq,
       CASE WHEN total_cq > 0
            THEN (2 * iwx - (n_users + 1) * total_cq)::DOUBLE
                 / (n_users * total_cq)::DOUBLE
       END AS gini
FROM agg
"""

ORACLES["longest_streaks"] = """
WITH base AS (
  SELECT user_id, event_type, ts, event_id::BIGINT AS event_id,
         floor(value * 100)::BIGINT AS vq
  FROM events),
stepped AS (
  SELECT user_id, event_type, ts, event_id,
         sign(vq - lag(vq) OVER w)::INTEGER AS s,
         row_number() OVER w AS rn
  FROM base
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)),
islands AS (
  SELECT user_id, event_type, s,
         rn - row_number() OVER (PARTITION BY user_id, event_type, s
                                 ORDER BY ts, event_id) AS isl
  FROM stepped WHERE s IS NOT NULL),
runs AS (
  SELECT user_id, event_type, s, isl, count(*)::BIGINT AS len
  FROM islands GROUP BY 1, 2, 3, 4)
SELECT user_id, event_type,
       coalesce(max(CASE WHEN s = 1 THEN len END), 0)::BIGINT
         AS longest_up_steps,
       coalesce(max(CASE WHEN s = -1 THEN len END), 0)::BIGINT
         AS longest_down_steps,
       sum(len)::BIGINT AS n_steps
FROM runs GROUP BY 1, 2
"""

ORACLES["savgol_smooth"] = """
WITH base AS (
  SELECT user_id, event_type, ts, event_id::BIGINT AS event_id,
         floor(value * 100)::BIGINT AS vq
  FROM events),
k AS (
  SELECT user_id, event_type, ts, event_id, vq,
         lag(vq, 2) OVER w AS m2, lag(vq, 1) OVER w AS m1,
         lead(vq, 1) OVER w AS p1, lead(vq, 2) OVER w AS p2
  FROM base
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id))
SELECT user_id, event_type, ts, event_id, vq,
       (m2 IS NOT NULL AND m1 IS NOT NULL
        AND p1 IS NOT NULL AND p2 IS NOT NULL) AS smoothed,
       (CASE WHEN m2 IS NOT NULL AND m1 IS NOT NULL
              AND p1 IS NOT NULL AND p2 IS NOT NULL
             THEN -3 * m2 + 12 * m1 + 17 * vq + 12 * p1 - 3 * p2
             ELSE vq * 35 END)::BIGINT AS sg_num,
       (CASE WHEN m2 IS NOT NULL AND m1 IS NOT NULL
              AND p1 IS NOT NULL AND p2 IS NOT NULL
             THEN -3 * m2 + 12 * m1 + 17 * vq + 12 * p1 - 3 * p2
             ELSE vq * 35 END)::DOUBLE / 3500.0 AS sg_value
FROM k
"""

ORACLES["median_filter"] = """
WITH base AS (
  SELECT user_id, event_type, ts, event_id::BIGINT AS event_id,
         floor(value * 100)::BIGINT AS vq
  FROM events),
k AS (
  SELECT user_id, event_type, ts, event_id, vq,
         list_sort(list(vq) OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id
                                  ROWS BETWEEN 2 PRECEDING
                                           AND 2 FOLLOWING)) AS win
  FROM base)
SELECT user_id, event_type, ts, event_id, vq,
       len(win) = 5 AS filtered,
       (CASE WHEN len(win) = 5 THEN win[3] ELSE vq END)::BIGINT
         AS median_cq,
       (CASE WHEN len(win) = 5 THEN win[3] ELSE vq END)::DOUBLE / 100.0
         AS median_value
FROM k
"""

ORACLES["hampel_filter"] = """
WITH base AS (
  SELECT user_id, event_type, ts, event_id::BIGINT AS event_id,
         floor(value * 100)::BIGINT AS vq
  FROM events),
k AS (
  SELECT user_id, event_type, ts, event_id, vq,
         list_sort(list(vq) OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id
                                  ROWS BETWEEN 2 PRECEDING
                                           AND 2 FOLLOWING)) AS win
  FROM base),
m AS (
  SELECT *, win[3] AS med,
         list_sort(list_transform(win, x -> abs(x - win[3])))[3] AS mad,
         len(win) = 5 AS full_win
  FROM k)
SELECT user_id, event_type, ts, event_id, vq,
       (CASE WHEN full_win THEN med END)::BIGINT AS med_cq,
       (CASE WHEN full_win THEN mad END)::BIGINT AS mad_cq,
       (full_win AND abs(vq - med) > 3 * mad) AS is_outlier,
       (CASE WHEN full_win AND abs(vq - med) > 3 * mad
             THEN med ELSE vq END)::BIGINT AS cleaned_cq
FROM m
"""

ORACLES["variance_ratio_test"] = """
WITH base AS (
  SELECT user_id, event_type,
         floor(value * 100)::BIGINT AS vq,
         floor(value * 100)::BIGINT
           - lag(floor(value * 100)::BIGINT, 1) OVER w AS d1,
         floor(value * 100)::BIGINT
           - lag(floor(value * 100)::BIGINT, 4) OVER w AS dq
  FROM events
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)),
agg AS (
  SELECT user_id, event_type,
         count(d1)::BIGINT AS n1, sum(d1)::BIGINT AS s1,
         sum(d1 * d1)::BIGINT AS q1,
         count(dq)::BIGINT AS nq, sum(dq)::BIGINT AS sq,
         sum(dq * dq)::BIGINT AS qq
  FROM base GROUP BY 1, 2),
mom AS (
  SELECT user_id, event_type, n1, nq,
         (n1 * q1 - s1 * s1)::BIGINT AS v1,
         (nq * qq - sq * sq)::BIGINT AS vq_m
  FROM agg WHERE n1 >= 6),
r AS (
  SELECT user_id, event_type, n1, nq,
         CASE WHEN nq >= 2 AND v1 > 0
              THEN (vq_m * n1 * n1)::BIGINT END AS vr_num,
         CASE WHEN nq >= 2 AND v1 > 0
              THEN (4 * v1 * nq * nq)::BIGINT END AS vr_den
  FROM mom)
SELECT user_id, event_type, n1, nq, vr_num, vr_den,
       vr_num::DOUBLE / vr_den::DOUBLE AS variance_ratio,
       CASE WHEN vr_num IS NULL THEN NULL
            WHEN vr_num > vr_den THEN 'trending'
            WHEN vr_num < vr_den THEN 'mean_reverting'
            ELSE 'random_walk' END AS regime
FROM r
"""

ORACLES["ks_drift"] = """
WITH base AS (
  SELECT event_type,
         (epoch_ms(ts)//1000)::BIGINT AS es,
         floor(value * 100)::BIGINT AS vq
  FROM events),
spans AS (
  SELECT event_type, ((min(es) + max(es)) // 2)::BIGINT AS mid
  FROM base GROUP BY 1),
tagged AS (
  SELECT b.event_type, b.vq,
         CASE WHEN b.es <= s.mid THEN 1 ELSE 0 END AS in_a
  FROM base b JOIN spans s USING (event_type)),
grid AS (
  SELECT event_type, vq,
         sum(in_a)::BIGINT AS c_a,
         sum(1 - in_a)::BIGINT AS c_b
  FROM tagged GROUP BY 1, 2),
cdf AS (
  SELECT event_type,
         sum(c_a) OVER (PARTITION BY event_type ORDER BY vq
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_a,
         sum(c_b) OVER (PARTITION BY event_type ORDER BY vq
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_b,
         sum(c_a) OVER (PARTITION BY event_type) AS n_a,
         sum(c_b) OVER (PARTITION BY event_type) AS n_b
  FROM grid),
agg AS (
  SELECT event_type,
         max(n_a)::BIGINT AS n_a, max(n_b)::BIGINT AS n_b,
         max(abs(cum_a * n_b - cum_b * n_a))::BIGINT AS ks_num
  FROM cdf GROUP BY 1)
SELECT event_type, n_a, n_b, ks_num,
       CASE WHEN n_a > 0 AND n_b > 0
            THEN ks_num::DOUBLE / (n_a * n_b)::DOUBLE END AS ks_stat,
       CASE WHEN n_a > 0 AND n_b > 0
            THEN 1.358 * sqrt((n_a + n_b)::DOUBLE / (n_a * n_b)::DOUBLE)
       END AS ks_crit_5pct,
       CASE WHEN n_a > 0 AND n_b > 0
            THEN ks_num::DOUBLE / (n_a * n_b)::DOUBLE
                 > 1.358 * sqrt((n_a + n_b)::DOUBLE / (n_a * n_b)::DOUBLE)
       END AS drifted
FROM agg
"""

ORACLES["rolling_p90"] = """
WITH base AS (
  SELECT user_id, event_type, ts, event_id::BIGINT AS event_id,
         floor(value * 100)::BIGINT AS vq
  FROM events),
k AS (
  SELECT user_id, event_type, ts, event_id, vq,
         list_sort(list(vq) OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id
                                  ROWS BETWEEN 19 PRECEDING
                                           AND CURRENT ROW)) AS win
  FROM base)
SELECT user_id, event_type, ts, event_id, vq,
       len(win)::BIGINT AS n_win,
       win[((9 * len(win) + 9) // 10)::INTEGER]::BIGINT AS p90_cq,
       win[((9 * len(win) + 9) // 10)::INTEGER]::DOUBLE / 100.0
         AS p90_value
FROM k
"""

ORACLES["topk_churn"] = """
WITH base AS (
  SELECT event_type, user_id,
         (epoch_ms(ts)//1000)::BIGINT AS es,
         floor(value * 100)::BIGINT AS vq
  FROM events),
spans AS (
  SELECT event_type, ((min(es) + max(es)) // 2)::BIGINT AS mid
  FROM base GROUP BY 1),
tagged AS (
  SELECT b.event_type, b.user_id,
         CASE WHEN b.es <= s.mid THEN 'a' ELSE 'b' END AS half, b.vq
  FROM base b JOIN spans s USING (event_type)),
totals AS (
  SELECT event_type, half, user_id, sum(vq)::BIGINT AS x
  FROM tagged GROUP BY 1, 2, 3),
top AS (
  SELECT * FROM (
    SELECT event_type, half, user_id,
           row_number() OVER (PARTITION BY event_type, half
                              ORDER BY x DESC, user_id) AS rnk
    FROM totals) WHERE rnk <= 20),
ta AS (SELECT event_type, user_id FROM top WHERE half = 'a'),
tb AS (SELECT event_type, user_id FROM top WHERE half = 'b'),
common AS (
  SELECT ta.event_type, count(*)::BIGINT AS n_common
  FROM ta JOIN tb ON ta.event_type = tb.event_type
                 AND ta.user_id = tb.user_id
  GROUP BY 1),
sizes AS (
  SELECT a.event_type,
         (SELECT count(*) FROM ta WHERE ta.event_type = a.event_type)::BIGINT
           AS k_a,
         (SELECT count(*) FROM tb WHERE tb.event_type = a.event_type)::BIGINT
           AS k_b
  FROM (SELECT DISTINCT event_type FROM top) a)
SELECT s.event_type, s.k_a, s.k_b,
       coalesce(c.n_common, 0)::BIGINT AS n_common,
       (s.k_b - coalesce(c.n_common, 0))::BIGINT AS entered,
       (s.k_a - coalesce(c.n_common, 0))::BIGINT AS exited,
       coalesce(c.n_common, 0)::DOUBLE
         / (s.k_a + s.k_b - coalesce(c.n_common, 0))::DOUBLE
         AS topk_jaccard
FROM sizes s LEFT JOIN common c USING (event_type)
"""

ORACLES["label_centroid_separation"] = """
WITH sums AS (
  SELECT label, u.dim - 1 AS dim, sum(u.qx)::BIGINT AS s
  FROM (
    SELECT label,
           unnest(list_transform(embedding,
                                 x -> floor(x::DOUBLE * 1000)::BIGINT))
             AS qx,
           generate_subscripts(embedding, 1) AS dim
    FROM embeddings) u(label, qx, dim)
  GROUP BY 1, 2),
norms AS (
  SELECT label, sum(s * s)::BIGINT AS nrm2 FROM sums GROUP BY 1),
dots AS (
  SELECT a.label AS label_a, b.label AS label_b,
         sum(a.s * b.s)::BIGINT AS sxy
  FROM sums a JOIN sums b ON a.dim = b.dim AND a.label < b.label
  GROUP BY 1, 2)
SELECT d.label_a, d.label_b, d.sxy,
       CASE WHEN na.nrm2 > 0 AND nb.nrm2 > 0
            THEN d.sxy::DOUBLE
                 / (sqrt(na.nrm2::DOUBLE) * sqrt(nb.nrm2::DOUBLE))
       END AS centroid_cosine
FROM dots d
JOIN norms na ON na.label = d.label_a
JOIN norms nb ON nb.label = d.label_b
"""

ORACLES["wavelet_energy"] = """
WITH ranked AS (
  SELECT user_id, event_type,
         floor(value * 100)::BIGINT AS a0,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS r
  FROM events),
k AS (SELECT * FROM ranked WHERE r <= 16),
full_series AS (
  SELECT user_id, event_type FROM k GROUP BY 1, 2 HAVING count(*) = 16),
l0 AS (
  SELECT k.user_id, k.event_type, k.r, k.a0
  FROM k JOIN full_series USING (user_id, event_type)),
l1 AS (
  SELECT user_id, event_type, ((r - 1) // 2) + 1 AS r1,
         sum(a0)::BIGINT AS a1,
         sum(CASE WHEN r % 2 = 1 THEN -a0 ELSE a0 END)::BIGINT AS d1
  FROM l0 GROUP BY 1, 2, 3),
l2 AS (
  SELECT user_id, event_type, ((r1 - 1) // 2) + 1 AS r2,
         sum(a1)::BIGINT AS a2,
         sum(CASE WHEN r1 % 2 = 1 THEN -a1 ELSE a1 END)::BIGINT AS d2
  FROM l1 GROUP BY 1, 2, 3),
l3 AS (
  SELECT user_id, event_type, ((r2 - 1) // 2) + 1 AS r3,
         sum(a2)::BIGINT AS a3,
         sum(CASE WHEN r2 % 2 = 1 THEN -a2 ELSE a2 END)::BIGINT AS d3
  FROM l2 GROUP BY 1, 2, 3),
e AS (
  SELECT e1.user_id, e1.event_type, e1.e1, e2.e2, e3.e3
  FROM (SELECT user_id, event_type, sum(d1 * d1)::BIGINT AS e1
        FROM l1 GROUP BY 1, 2) e1
  JOIN (SELECT user_id, event_type, sum(d2 * d2)::BIGINT AS e2
        FROM l2 GROUP BY 1, 2) e2 USING (user_id, event_type)
  JOIN (SELECT user_id, event_type, sum(d3 * d3)::BIGINT AS e3
        FROM l3 GROUP BY 1, 2) e3 USING (user_id, event_type))
SELECT user_id, event_type, e1, e2, e3,
       CASE WHEN (8 * e1 + 4 * e2 + 2 * e3) > 0
            THEN (8 * e1)::DOUBLE / (8 * e1 + 4 * e2 + 2 * e3)::DOUBLE
       END AS share_l1,
       CASE WHEN (8 * e1 + 4 * e2 + 2 * e3) > 0
            THEN (4 * e2)::DOUBLE / (8 * e1 + 4 * e2 + 2 * e3)::DOUBLE
       END AS share_l2,
       CASE WHEN (8 * e1 + 4 * e2 + 2 * e3) > 0
            THEN (2 * e3)::DOUBLE / (8 * e1 + 4 * e2 + 2 * e3)::DOUBLE
       END AS share_l3
FROM e
"""

ORACLES["tier_reconstruction_error"] = f"""
WITH pts AS (
  SELECT user_id, event_type,
         {_bucket(3600)} AS bucket_start,
         floor(value * 100)::BIGINT AS vq
  FROM events),
hourly AS (
  SELECT user_id, event_type, bucket_start,
         sum(vq)::BIGINT AS s, count(*)::BIGINT AS n
  FROM pts GROUP BY 1, 2, 3)
SELECT p.user_id, p.event_type, p.bucket_start,
       max(h.n)::BIGINT AS n,
       max(h.s)::BIGINT AS sum_cq,
       sum(abs(h.n * p.vq - h.s))::BIGINT AS err_num,
       sum(abs(h.n * p.vq - h.s))::DOUBLE
         / (max(h.n) * max(h.n) * 100)::DOUBLE AS mae_value
FROM pts p JOIN hourly h
  USING (user_id, event_type, bucket_start)
GROUP BY 1, 2, 3
"""

ORACLES["turning_points_test"] = """
WITH base AS (
  SELECT user_id, event_type, ts, event_id::BIGINT AS event_id,
         floor(value * 100)::BIGINT AS v1
  FROM events),
tri AS (
  SELECT user_id, event_type, v1,
         lead(v1, 1) OVER w AS v2,
         lead(v1, 2) OVER w AS v3
  FROM base
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)),
agg AS (
  SELECT user_id, event_type,
         count(*)::BIGINT AS n_rows,
         sum(CASE WHEN v3 IS NOT NULL AND
                       ((v2 > v1 AND v2 > v3) OR (v2 < v1 AND v2 < v3))
                  THEN 1 ELSE 0 END)::BIGINT AS t_count
  FROM tri GROUP BY 1, 2
  HAVING count(*) >= 3)
SELECT user_id, event_type, n_rows, t_count,
       (3 * t_count - 2 * (n_rows - 2))::DOUBLE
         / (3.0 * sqrt((16 * n_rows - 29)::DOUBLE / 90.0)) AS z,
       abs((3 * t_count - 2 * (n_rows - 2))::DOUBLE
           / (3.0 * sqrt((16 * n_rows - 29)::DOUBLE / 90.0)))
         > 1.959963984540054 AS nonrandom_5pct
FROM agg
"""

ORACLES["croston_forecast"] = """
WITH hourly AS (
  SELECT user_id, event_type,
         ((epoch_ms(ts)//1000) - (epoch_ms(ts)//1000) % 3600)::BIGINT
           AS bucket,
         sum(floor(value * 100)::BIGINT)::BIGINT AS d
  FROM events GROUP BY 1, 2, 3),
paired AS (
  SELECT user_id, event_type, bucket, d,
         ((bucket - lag(bucket) OVER (PARTITION BY user_id, event_type
                                      ORDER BY bucket)) // 3600)::BIGINT
           AS interval_h
  FROM hourly),
recent AS (
  SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                               ORDER BY bucket DESC) AS rn
  FROM paired WHERE interval_h IS NOT NULL),
k AS (SELECT * FROM recent WHERE rn <= 16),
agg AS (
  SELECT user_id, event_type,
         count(*)::BIGINT AS n_used,
         sum(1::BIGINT << (16 - rn))::BIGINT AS den,
         sum((1::BIGINT << (16 - rn)) * d)::BIGINT AS num_z,
         sum((1::BIGINT << (16 - rn)) * interval_h)::BIGINT AS num_p
  FROM k GROUP BY 1, 2
  HAVING count(*) >= 2)
SELECT user_id, event_type, n_used, num_z, num_p,
       num_z::DOUBLE / den::DOUBLE AS z_cq,
       num_p::DOUBLE / den::DOUBLE AS p_hours,
       num_z::DOUBLE / num_p::DOUBLE AS croston_cq_per_hour
FROM agg
"""

ORACLES["chi2_independence"] = """
WITH cells AS (
  SELECT event_type,
         ((epoch_ms(ts) // 1000 // 86400 + 4) % 7)::BIGINT AS dow,
         count(*)::BIGINT AS o
  FROM events GROUP BY 1, 2),
tot AS (
  SELECT event_type, dow, o,
         sum(o) OVER (PARTITION BY event_type)::BIGINT AS r,
         sum(o) OVER (PARTITION BY dow)::BIGINT AS c,
         sum(o) OVER ()::BIGINT AS n
  FROM cells)
SELECT event_type, dow, o, r, c, n,
       (n * o - r * c)::BIGINT AS dev,
       ((n * o - r * c)::DOUBLE * (n * o - r * c)::DOUBLE)
         / (r * c * n)::DOUBLE AS chi2_contrib,
       CASE WHEN n * o - r * c > 0 THEN 'over'
            WHEN n * o - r * c < 0 THEN 'under'
            ELSE 'exact' END AS cell_bias
FROM tot
"""

ORACLES["mannwhitney_u"] = """
WITH base AS (
  SELECT event_type,
         (epoch_ms(ts) // 1000)::BIGINT AS es,
         floor(value * 100)::BIGINT AS vq
  FROM events),
spans AS (
  SELECT event_type, ((min(es) + max(es)) // 2)::BIGINT AS mid
  FROM base GROUP BY 1),
groups AS (
  SELECT b.event_type, b.vq,
         count(*)::BIGINT AS c,
         sum(CASE WHEN b.es <= s.mid THEN 1 ELSE 0 END)::BIGINT AS c1
  FROM base b JOIN spans s USING (event_type)
  GROUP BY 1, 2),
ranked AS (
  SELECT event_type, c, c1,
         (2 * coalesce(sum(c) OVER (PARTITION BY event_type ORDER BY vq
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          + c + 1)::BIGINT AS rank2
  FROM groups),
agg AS (
  SELECT event_type,
         sum(c1)::BIGINT AS n1,
         (sum(c) - sum(c1))::BIGINT AS n2,
         sum(c1 * rank2)::BIGINT AS r1x2
  FROM ranked GROUP BY 1)
SELECT event_type, n1, n2,
       (r1x2 - n1 * (n1 + 1))::BIGINT AS u2,
       (n1 * n2)::BIGINT AS e_u2,
       (r1x2 - n1 * (n1 + 1))::DOUBLE / 2.0 AS u,
       CASE WHEN r1x2 - n1 * (n1 + 1) > n1 * n2 THEN 'early_higher'
            WHEN r1x2 - n1 * (n1 + 1) < n1 * n2 THEN 'late_higher'
            ELSE 'no_shift' END AS shift
FROM agg WHERE n1 >= 1 AND n2 >= 1
"""

ORACLES["welch_t2_segments"] = """
WITH base AS (
  SELECT event_type,
         (epoch_ms(ts) // 1000)::BIGINT AS es,
         floor(value * 10)::BIGINT AS vq
  FROM events),
spans AS (
  SELECT event_type, ((min(es) + max(es)) // 2)::BIGINT AS mid
  FROM base GROUP BY 1),
agg AS (
  SELECT b.event_type,
         sum(CASE WHEN b.es <= s.mid THEN 1 ELSE 0 END)::BIGINT AS n1,
         sum(CASE WHEN b.es <= s.mid THEN b.vq ELSE 0 END)::BIGINT AS s1,
         sum(CASE WHEN b.es <= s.mid THEN b.vq * b.vq ELSE 0 END)::BIGINT AS q1,
         sum(CASE WHEN b.es > s.mid THEN 1 ELSE 0 END)::BIGINT AS n2,
         sum(CASE WHEN b.es > s.mid THEN b.vq ELSE 0 END)::BIGINT AS s2,
         sum(CASE WHEN b.es > s.mid THEN b.vq * b.vq ELSE 0 END)::BIGINT AS q2
  FROM base b JOIN spans s USING (event_type)
  GROUP BY 1),
alg AS (
  SELECT event_type, n1, n2,
         (n1::HUGEINT * q1 - s1::HUGEINT * s1) AS a,
         (n2::HUGEINT * q2 - s2::HUGEINT * s2) AS b,
         (s1::HUGEINT * n2 - s2::HUGEINT * n1) AS d
  FROM agg),
fin AS (
  SELECT event_type, n1, n2, d,
         (d * d * (n1 - 1) * (n2 - 1)) AS num,
         (a * n2 * n2 * (n2 - 1) + b * n1 * n1 * (n1 - 1)) AS den
  FROM alg)
SELECT event_type, n1, n2,
       CASE WHEN n1 >= 2 AND n2 >= 2 AND den > 0
            THEN num::DOUBLE END AS t2_num,
       CASE WHEN n1 >= 2 AND n2 >= 2 AND den > 0
            THEN den::DOUBLE END AS t2_den,
       CASE WHEN n1 >= 2 AND n2 >= 2 AND den > 0
            THEN num::DOUBLE / den::DOUBLE END AS t2,
       CASE WHEN n1 >= 2 AND n2 >= 2 AND den > 0
            THEN CASE WHEN d > 0 THEN 'early_higher'
                      WHEN d < 0 THEN 'late_higher'
                      ELSE 'no_shift' END END AS shift
FROM fin
"""

ORACLES["pacf_lag2"] = """
WITH staged AS (
  SELECT event_type,
         floor(value * 10)::BIGINT AS x,
         lead(floor(value * 10)::BIGINT, 1) OVER w AS x1,
         lead(floor(value * 10)::BIGINT, 2) OVER w AS x2,
         row_number() OVER w AS rn
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)),
agg AS (
  SELECT event_type,
         count(*)::BIGINT AS n,
         sum(x)::BIGINT AS s,
         sum(x * x)::BIGINT AS q,
         sum(x * x1)::BIGINT AS l1,
         sum(x * x2)::BIGINT AS l2,
         sum(CASE WHEN rn <= 1 THEN x ELSE 0 END)::BIGINT AS head1,
         sum(CASE WHEN rn <= 2 THEN x ELSE 0 END)::BIGINT AS head2,
         max(CASE WHEN x1 IS NULL THEN x END)::BIGINT AS tail_last,
         sum(CASE WHEN x2 IS NULL AND x1 IS NOT NULL THEN x ELSE 0 END)::BIGINT AS tail_penult
  FROM staged GROUP BY 1),
cov AS (
  SELECT event_type, n,
         (n::HUGEINT * n * q - n::HUGEINT * s * s) AS c0,
         (n::HUGEINT * n * l1
          - n::HUGEINT * s * ((s - tail_last) + (s - head1))
          + (n - 1)::HUGEINT * s * s) AS c1,
         (n::HUGEINT * n * l2
          - n::HUGEINT * s * ((s - tail_last - tail_penult) + (s - head2))
          + (n - 2)::HUGEINT * s * s) AS c2
  FROM agg),
d AS (
  SELECT event_type, n,
         CASE WHEN n >= 5 AND c0 > 0 THEN c0::DOUBLE END AS c0,
         CASE WHEN n >= 5 AND c0 > 0 THEN c1::DOUBLE END AS c1,
         CASE WHEN n >= 5 AND c0 > 0 THEN c2::DOUBLE END AS c2
  FROM cov)
SELECT event_type, n, c0, c1, c2,
       c1 / c0 AS r1,
       c2 / c0 AS r2,
       ((c2 / c0) - (c1 / c0) * (c1 / c0))
         / (1.0 - (c1 / c0) * (c1 / c0)) AS phi22
FROM d
"""

ORACLES["sample_entropy_counts"] = """
WITH t AS (
  SELECT user_id, event_type,
         row_number() OVER w AS rn,
         floor(value * 100)::BIGINT AS x0,
         lead(floor(value * 100)::BIGINT, 1) OVER w AS x1,
         lead(floor(value * 100)::BIGINT, 2) OVER w AS x2
  FROM events
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)),
tt AS (SELECT * FROM t WHERE x1 IS NOT NULL),
pairs AS (
  SELECT a.user_id, a.event_type,
         CASE WHEN greatest(abs(a.x0 - b.x0), abs(a.x1 - b.x1)) <= 500
              THEN 1 ELSE 0 END AS bm,
         CASE WHEN greatest(abs(a.x0 - b.x0), abs(a.x1 - b.x1)) <= 500
                   AND a.x2 IS NOT NULL AND b.x2 IS NOT NULL
                   AND abs(a.x2 - b.x2) <= 500
              THEN 1 ELSE 0 END AS am
  FROM tt a JOIN tt b
    ON a.user_id = b.user_id AND a.event_type = b.event_type
   AND a.rn < b.rn),
agg AS (
  SELECT user_id, event_type,
         sum(bm)::BIGINT AS b_count,
         sum(am)::BIGINT AS a_count
  FROM pairs GROUP BY 1, 2)
SELECT user_id, event_type, b_count, a_count,
       a_count::DOUBLE / b_count::DOUBLE AS match_ratio,
       CASE WHEN a_count * 2 >= b_count THEN 'regular'
            ELSE 'irregular' END AS regularity
FROM agg WHERE b_count > 0
"""

ORACLES["dispersion_index"] = """
WITH hourly AS (
  SELECT event_type,
         (epoch_ms(ts) // 1000 - (epoch_ms(ts) // 1000) % 3600)::BIGINT AS bucket,
         count(*)::BIGINT AS c
  FROM events GROUP BY 1, 2),
agg AS (
  SELECT event_type,
         sum(c)::BIGINT AS n_events,
         sum(c * c)::BIGINT AS sum_c2,
         ((max(bucket) - min(bucket)) // 3600 + 1)::BIGINT AS h_hours,
         count(*)::BIGINT AS present_hours
  FROM hourly GROUP BY 1)
SELECT event_type, n_events, h_hours, present_hours,
       (h_hours * sum_c2 - n_events * n_events)::BIGINT AS fano_num,
       (h_hours * n_events)::BIGINT AS fano_den,
       (h_hours * sum_c2 - n_events * n_events)::DOUBLE
         / (h_hours * n_events)::DOUBLE AS fano,
       CASE WHEN h_hours * sum_c2 - n_events * n_events > h_hours * n_events
            THEN 'over_dispersed'
            WHEN h_hours * sum_c2 - n_events * n_events < h_hours * n_events
            THEN 'under_dispersed'
            ELSE 'poisson_like' END AS dispersion
FROM agg WHERE n_events >= 2
"""

ORACLES["seasonal_mann_kendall"] = """
WITH keyed AS (
  SELECT event_type,
         ((epoch_ms(ts) // 1000) % 86400 // 3600)::BIGINT AS season,
         ts, event_id::BIGINT AS event_id,
         floor(value * 100)::BIGINT AS vq
  FROM events),
recent AS (
  SELECT * FROM (
    SELECT event_type, season, ts, event_id, vq,
           row_number() OVER (PARTITION BY event_type, season
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM keyed) WHERE rn <= 24),
ordered AS (
  SELECT event_type, season, vq,
         row_number() OVER (PARTITION BY event_type, season
                            ORDER BY ts, event_id) AS r
  FROM recent),
s_season AS (
  SELECT a.event_type, a.season,
         sum(CASE WHEN b.vq > a.vq THEN 1
                  WHEN b.vq < a.vq THEN -1 ELSE 0 END)::BIGINT AS s
  FROM ordered a JOIN ordered b
    ON a.event_type = b.event_type AND a.season = b.season AND a.r < b.r
  GROUP BY 1, 2),
ties AS (
  SELECT event_type, season,
         sum(t)::BIGINT AS n,
         sum(t * (t - 1) * (2 * t + 5))::BIGINT AS tie18
  FROM (SELECT event_type, season, vq, count(*)::BIGINT AS t
        FROM ordered GROUP BY 1, 2, 3)
  GROUP BY 1, 2),
per_season AS (
  SELECT s.event_type, s.season, s.s,
         (t.n * (t.n - 1) * (2 * t.n + 5) - t.tie18)::BIGINT AS v18
  FROM s_season s JOIN ties t
    ON s.event_type = t.event_type AND s.season = t.season),
agg AS (
  SELECT event_type,
         count(*)::BIGINT AS n_seasons,
         sum(s)::BIGINT AS s_total,
         sum(v18)::BIGINT AS var18
  FROM per_season GROUP BY 1)
SELECT event_type, n_seasons, s_total, var18,
       CASE WHEN s_total = 0 THEN 0.0
            ELSE (s_total::DOUBLE - sign(s_total)::DOUBLE)
                 / sqrt(var18::DOUBLE / 18.0) END AS z,
       CASE WHEN abs(CASE WHEN s_total = 0 THEN 0.0
                 ELSE (s_total::DOUBLE - sign(s_total)::DOUBLE)
                      / sqrt(var18::DOUBLE / 18.0) END) <= 1.959963984540054
            THEN 'no_trend'
            WHEN s_total > 0 THEN 'increasing'
            ELSE 'decreasing' END AS trend
FROM agg WHERE var18 > 0
"""

ORACLES["granger_lag1"] = """
WITH hourly AS (
  SELECT event_type,
         (epoch_ms(ts) // 1000 - (epoch_ms(ts) // 1000) % 3600)::BIGINT AS bucket,
         sum(floor(value * 10)::BIGINT)::BIGINT AS hv
  FROM events GROUP BY 1, 2),
ylane AS (
  SELECT event_type AS y_type, bucket, hv AS y,
         lag(hv) OVER w AS a,
         lag(bucket) OVER w AS bprev
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY bucket)),
yok AS (
  SELECT y_type, bucket, y, a FROM ylane WHERE bprev = bucket - 3600),
xlane AS (
  SELECT event_type AS x_type, (bucket + 3600)::BIGINT AS bucket, hv AS b
  FROM hourly),
trip AS (
  SELECT x.x_type, y.y_type, y.y, y.a, x.b
  FROM yok y JOIN xlane x USING (bucket)
  WHERE x.x_type <> y.y_type),
agg AS (
  SELECT x_type, y_type,
         count(*)::BIGINT AS n,
         sum(y)::BIGINT AS sy, sum(a)::BIGINT AS sa, sum(b)::BIGINT AS sb,
         sum(y * y)::BIGINT AS syy, sum(a * a)::BIGINT AS saa,
         sum(b * b)::BIGINT AS sbb, sum(a * y)::BIGINT AS say,
         sum(b * y)::BIGINT AS sby, sum(a * b)::BIGINT AS sab
  FROM trip GROUP BY 1, 2),
c AS (
  SELECT x_type, y_type, n,
         (n * saa - sa * sa)::DOUBLE AS caa,
         (n * sbb - sb * sb)::DOUBLE AS cbb,
         (n * sab - sa * sb)::DOUBLE AS cab,
         (n * say - sa * sy)::DOUBLE AS cay,
         (n * sby - sb * sy)::DOUBLE AS cby,
         (n * syy - sy * sy)::DOUBLE AS cyy
  FROM agg),
alg AS (
  SELECT x_type, y_type, n, caa,
         (caa * cbb - cab * cab) AS det,
         (cyy - cay * cay / caa) AS rss0,
         (cyy - (cay * cay * cbb - 2.0 * cay * cby * cab + cby * cby * caa)
                / (caa * cbb - cab * cab)) AS rss1
  FROM c)
SELECT x_type, y_type, n,
       CASE WHEN n >= 8 AND caa > 0 AND det > 0 AND rss1 > 0
            THEN (rss0 - rss1) * (n::DOUBLE - 3.0) / rss1 END AS f_stat,
       CASE WHEN n >= 8 AND caa > 0 AND det > 0 AND rss0 > 0
            THEN (rss0 - rss1) / rss0 END AS rss_gain,
       CASE WHEN n >= 8 AND caa > 0 AND det > 0 AND rss1 > 0
            THEN CASE WHEN (rss0 - rss1) * (n::DOUBLE - 3.0) / rss1 > 3.841
                      THEN 'predictive' ELSE 'not_predictive' END END AS granger
FROM alg
"""

ORACLES["cvm_drift"] = """
WITH base AS (
  SELECT event_type,
         (epoch_ms(ts) // 1000)::BIGINT AS es,
         floor(value * 100)::BIGINT AS vq
  FROM events),
spans AS (
  SELECT event_type, ((min(es) + max(es)) // 2)::BIGINT AS mid
  FROM base GROUP BY 1),
cells AS (
  SELECT b.event_type, b.vq,
         sum(CASE WHEN b.es <= s.mid THEN 1 ELSE 0 END)::BIGINT AS c1,
         sum(CASE WHEN b.es > s.mid THEN 1 ELSE 0 END)::BIGINT AS c2
  FROM base b JOIN spans s USING (event_type)
  GROUP BY 1, 2),
cum AS (
  SELECT event_type, (c1 + c2)::BIGINT AS c,
         sum(c1) OVER w::BIGINT AS cum1,
         sum(c2) OVER w::BIGINT AS cum2
  FROM cells
  WINDOW w AS (PARTITION BY event_type ORDER BY vq
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
tot AS (
  SELECT event_type, c, cum1, cum2,
         max(cum1) OVER (PARTITION BY event_type)::BIGINT AS n1,
         max(cum2) OVER (PARTITION BY event_type)::BIGINT AS n2
  FROM cum),
agg AS (
  SELECT event_type, n1, n2,
         sum(c::HUGEINT * (n2 * cum1 - n1 * cum2)
                        * (n2 * cum1 - n1 * cum2)) AS cvm_num
  FROM tot GROUP BY 1, 2, 3)
SELECT event_type, n1, n2,
       cvm_num::DOUBLE AS cvm_num,
       n1::DOUBLE * n1::DOUBLE * n2::DOUBLE * n2::DOUBLE
         * (n1 + n2)::DOUBLE AS cvm_den,
       cvm_num::DOUBLE
         / (n1::DOUBLE * n1::DOUBLE * n2::DOUBLE * n2::DOUBLE
            * (n1 + n2)::DOUBLE) AS cvm_t
FROM agg WHERE n1 >= 1 AND n2 >= 1
"""

ORACLES["runs_test"] = """
WITH base AS (
  SELECT event_type, ts, event_id::BIGINT AS event_id,
         floor(value * 100)::BIGINT AS vq
  FROM events),
ranked AS (
  SELECT event_type, vq,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY vq, ts, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type)::BIGINT AS n_all
  FROM base),
med AS (
  SELECT event_type, vq AS med FROM ranked
  WHERE rn = (n_all + 1) // 2),
signed AS (
  SELECT b.event_type, b.ts, b.event_id,
         CASE WHEN b.vq > m.med THEN 1 ELSE -1 END AS sgn
  FROM base b JOIN med m USING (event_type)
  WHERE b.vq <> m.med),
flips AS (
  SELECT event_type, sgn,
         CASE WHEN lag(sgn) OVER w IS NOT NULL
                   AND lag(sgn) OVER w <> sgn THEN 1 ELSE 0 END AS flip
  FROM signed
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)),
agg AS (
  SELECT event_type,
         sum(CASE WHEN sgn = 1 THEN 1 ELSE 0 END)::BIGINT AS n_plus,
         sum(CASE WHEN sgn = -1 THEN 1 ELSE 0 END)::BIGINT AS n_minus,
         (1 + sum(flip))::BIGINT AS runs
  FROM flips GROUP BY 1),
alg AS (
  SELECT event_type, n_plus, n_minus, runs,
         n_plus::DOUBLE AS a, n_minus::DOUBLE AS b,
         (n_plus::DOUBLE + n_minus::DOUBLE) AS n
  FROM agg WHERE n_plus >= 2 AND n_minus >= 2)
SELECT event_type, n_plus, n_minus, runs,
       1.0 + 2.0 * a * b / n AS expected_runs,
       (runs::DOUBLE - (1.0 + 2.0 * a * b / n))
         / sqrt(2.0 * a * b * (2.0 * a * b - n) / (n * n * (n - 1.0))) AS z,
       CASE WHEN abs((runs::DOUBLE - (1.0 + 2.0 * a * b / n))
              / sqrt(2.0 * a * b * (2.0 * a * b - n) / (n * n * (n - 1.0))))
              <= 1.959963984540054 THEN 'random'
            WHEN runs::DOUBLE < 1.0 + 2.0 * a * b / n THEN 'clustered'
            ELSE 'oscillating' END AS pattern
FROM alg
"""

ORACLES["kaplan_meier_sessions"] = """
WITH RECURSIVE base AS (
  SELECT user_id, event_id,
         (epoch_ms(ts) // 1000)::BIGINT AS es, ts
  FROM events),
flagged AS (
  SELECT user_id, es, ts, event_id,
         CASE WHEN es - lag(es) OVER w > 1800 OR lag(es) OVER w IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM base
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sess_tag AS (
  SELECT user_id, es,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged),
sessions AS (
  SELECT user_id, session_id,
         min(es)::BIGINT AS s_start, max(es)::BIGINT AS s_end
  FROM sess_tag GROUP BY 1, 2),
horizon AS (SELECT max(s_end)::BIGINT AS t_max FROM sessions),
tagged AS (
  SELECT ((s_end - s_start) // 60)::BIGINT AS dur,
         (t_max - s_end < 1800) AS censored
  FROM sessions, horizon),
grid AS (
  SELECT dur,
         count(*)::BIGINT AS cnt_all,
         sum(CASE WHEN NOT censored THEN 1 ELSE 0 END)::BIGINT AS d_events,
         sum(CASE WHEN censored THEN 1 ELSE 0 END)::BIGINT AS c_censored
  FROM tagged GROUP BY 1),
staged AS (
  SELECT dur, d_events, c_censored,
         (sum(cnt_all) OVER ()
          - sum(cnt_all) OVER (ORDER BY dur
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          + cnt_all)::BIGINT AS n_risk
  FROM grid),
ev AS (
  SELECT dur, d_events, c_censored, n_risk,
         (n_risk - d_events)::DOUBLE / n_risk::DOUBLE AS factor,
         row_number() OVER (ORDER BY dur) AS k
  FROM staged WHERE d_events >= 1),
rec AS (
  SELECT k, dur, d_events, c_censored, n_risk,
         1.0 * factor AS km
  FROM ev WHERE k = 1
  UNION ALL
  SELECT e.k, e.dur, e.d_events, e.c_censored, e.n_risk,
         r.km * e.factor
  FROM ev e JOIN rec r ON e.k = r.k + 1)
SELECT dur AS duration_min, n_risk, d_events, c_censored,
       km AS km_survival
FROM rec
"""

ORACLES["qq_shift_profile"] = """
WITH base AS (
  SELECT event_type,
         (epoch_ms(ts) // 1000)::BIGINT AS es,
         floor(value * 100)::BIGINT AS vq
  FROM events),
spans AS (
  SELECT event_type, ((min(es) + max(es)) // 2)::BIGINT AS mid
  FROM base GROUP BY 1),
halves AS (
  SELECT b.event_type,
         CASE WHEN b.es <= s.mid THEN 'early' ELSE 'late' END AS half,
         b.vq
  FROM base b JOIN spans s USING (event_type)),
cells AS (
  SELECT event_type, half, vq, count(*)::BIGINT AS cnt
  FROM halves GROUP BY 1, 2, 3),
ranked AS (
  SELECT event_type, half, vq, cnt,
         sum(cnt) OVER (PARTITION BY event_type, half ORDER BY vq
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum,
         sum(cnt) OVER (PARTITION BY event_type, half)::BIGINT AS n
  FROM cells),
deciles AS (
  SELECT r.event_type, r.half, d.decile, min(r.vq)::BIGINT AS v
  FROM ranked r
  JOIN (SELECT unnest(generate_series(1, 9)) AS k) ks ON true
  JOIN LATERAL (SELECT ks.k * 10 AS decile,
                       (floor((r.n - 1) * ks.k / 10) + 1)::BIGINT AS mark) d
    ON r.cum - r.cnt < d.mark AND d.mark <= r.cum
  GROUP BY 1, 2, 3)
SELECT event_type, decile::BIGINT AS decile,
       max(CASE WHEN half = 'early' THEN v END)::BIGINT AS early_cq,
       max(CASE WHEN half = 'late' THEN v END)::BIGINT AS late_cq,
       (max(CASE WHEN half = 'late' THEN v END)
        - max(CASE WHEN half = 'early' THEN v END))::BIGINT AS shift_cq
FROM deciles GROUP BY 1, 2
"""

ORACLES["transition_latency_quantiles"] = """
WITH hops AS (
  SELECT lag(event_type) OVER w AS from_type,
         event_type AS to_type,
         ((epoch_ms(ts) // 1000)
          - lag(epoch_ms(ts) // 1000) OVER w)::BIGINT AS gap_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
cells AS (
  SELECT from_type, to_type, gap_s, count(*)::BIGINT AS cnt
  FROM hops WHERE from_type IS NOT NULL
  GROUP BY 1, 2, 3),
ranked AS (
  SELECT from_type, to_type, gap_s, cnt,
         sum(cnt) OVER (PARTITION BY from_type, to_type ORDER BY gap_s
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum,
         sum(cnt) OVER (PARTITION BY from_type, to_type)::BIGINT AS n
  FROM cells)
SELECT from_type, to_type,
       max(n)::BIGINT AS n_hops,
       min(CASE WHEN cum - cnt < (floor((n - 1) * 0.5) + 1)::BIGINT
                 AND (floor((n - 1) * 0.5) + 1)::BIGINT <= cum
            THEN gap_s END)::BIGINT AS p50_gap_s,
       min(CASE WHEN cum - cnt < (floor((n - 1) * 0.9) + 1)::BIGINT
                 AND (floor((n - 1) * 0.9) + 1)::BIGINT <= cum
            THEN gap_s END)::BIGINT AS p90_gap_s
FROM ranked GROUP BY 1, 2
"""

ORACLES["ljung_box_q"] = """
WITH staged AS (
  SELECT event_type,
         floor(value * 10)::BIGINT AS x,
         lead(floor(value * 10)::BIGINT, 1) OVER w AS x1,
         lead(floor(value * 10)::BIGINT, 2) OVER w AS x2,
         lead(floor(value * 10)::BIGINT, 3) OVER w AS x3,
         row_number() OVER w AS rn,
         count(*) OVER (PARTITION BY event_type)::BIGINT AS nn
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)),
agg AS (
  SELECT event_type,
         count(*)::BIGINT AS n, sum(x)::BIGINT AS s,
         sum(x * x)::BIGINT AS q,
         sum(x * x1)::BIGINT AS l1, sum(x * x2)::BIGINT AS l2,
         sum(x * x3)::BIGINT AS l3,
         sum(CASE WHEN rn <= 1 THEN x ELSE 0 END)::BIGINT AS head1,
         sum(CASE WHEN rn <= 2 THEN x ELSE 0 END)::BIGINT AS head2,
         sum(CASE WHEN rn <= 3 THEN x ELSE 0 END)::BIGINT AS head3,
         sum(CASE WHEN rn > nn - 1 THEN x ELSE 0 END)::BIGINT AS tail1,
         sum(CASE WHEN rn > nn - 2 THEN x ELSE 0 END)::BIGINT AS tail2,
         sum(CASE WHEN rn > nn - 3 THEN x ELSE 0 END)::BIGINT AS tail3
  FROM staged GROUP BY 1),
cov AS (
  SELECT event_type, n,
         (n::HUGEINT * n * q - n::HUGEINT * s * s) AS c0,
         (n::HUGEINT * n * l1 - n::HUGEINT * s * ((s - tail1) + (s - head1))
          + (n - 1)::HUGEINT * s * s) AS c1,
         (n::HUGEINT * n * l2 - n::HUGEINT * s * ((s - tail2) + (s - head2))
          + (n - 2)::HUGEINT * s * s) AS c2,
         (n::HUGEINT * n * l3 - n::HUGEINT * s * ((s - tail3) + (s - head3))
          + (n - 3)::HUGEINT * s * s) AS c3
  FROM agg),
r AS (
  SELECT event_type, n,
         CASE WHEN n >= 8 AND c0 > 0 THEN c1::DOUBLE / c0::DOUBLE END AS r1,
         CASE WHEN n >= 8 AND c0 > 0 THEN c2::DOUBLE / c0::DOUBLE END AS r2,
         CASE WHEN n >= 8 AND c0 > 0 THEN c3::DOUBLE / c0::DOUBLE END AS r3
  FROM cov)
SELECT event_type, n, r1, r2, r3,
       n::DOUBLE * (n::DOUBLE + 2.0)
         * (r1 * r1 / (n::DOUBLE - 1.0)
            + r2 * r2 / (n::DOUBLE - 2.0)
            + r3 * r3 / (n::DOUBLE - 3.0)) AS lb_q,
       CASE WHEN n::DOUBLE * (n::DOUBLE + 2.0)
                 * (r1 * r1 / (n::DOUBLE - 1.0)
                    + r2 * r2 / (n::DOUBLE - 2.0)
                    + r3 * r3 / (n::DOUBLE - 3.0)) > 7.814727903251179
            THEN 'autocorrelated'
            WHEN r1 IS NOT NULL THEN 'white' END AS whiteness
FROM r
"""

ORACLES["extremal_index"] = """
WITH base AS (
  SELECT event_type, ts, event_id::BIGINT AS event_id,
         (epoch_ms(ts) // 1000)::BIGINT AS es,
         floor(value * 100)::BIGINT AS vq
  FROM events),
cells AS (
  SELECT event_type, vq, count(*)::BIGINT AS cnt
  FROM base GROUP BY 1, 2),
ranked AS (
  SELECT event_type, vq, cnt,
         sum(cnt) OVER (PARTITION BY event_type ORDER BY vq
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum,
         sum(cnt) OVER (PARTITION BY event_type)::BIGINT AS n
  FROM cells),
thresh AS (
  SELECT event_type, min(vq)::BIGINT AS u
  FROM ranked
  WHERE cum - cnt < (floor((n - 1) * 0.9) + 1)::BIGINT
    AND (floor((n - 1) * 0.9) + 1)::BIGINT <= cum
  GROUP BY 1),
exc AS (
  SELECT b.event_type, b.ts, b.event_id, b.es, t.u
  FROM base b JOIN thresh t USING (event_type)
  WHERE b.vq > t.u),
flagged AS (
  SELECT event_type, u,
         CASE WHEN lag(es) OVER w IS NULL OR es - lag(es) OVER w > 3600
              THEN 1 ELSE 0 END AS new_cluster
  FROM exc
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)),
agg AS (
  SELECT event_type,
         max(u)::BIGINT AS threshold_cq,
         count(*)::BIGINT AS n_exceedances,
         sum(new_cluster)::BIGINT AS n_clusters
  FROM flagged GROUP BY 1)
SELECT event_type, threshold_cq, n_exceedances, n_clusters,
       n_clusters::DOUBLE / n_exceedances::DOUBLE AS theta,
       n_exceedances::DOUBLE / n_clusters::DOUBLE AS mean_cluster_size,
       CASE WHEN n_clusters * 2 < n_exceedances THEN 'clustered_extremes'
            ELSE 'isolated_extremes' END AS regime
FROM agg WHERE n_exceedances >= 2
"""

ORACLES["kpss_level_stat"] = """
WITH staged AS (
  SELECT event_type,
         floor(value * 10)::BIGINT AS x,
         sum(floor(value * 10)::BIGINT) OVER (
             PARTITION BY event_type ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS p,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY ts, event_id)::BIGINT AS t,
         count(*) OVER (PARTITION BY event_type)::BIGINT AS n,
         sum(floor(value * 10)::BIGINT)
           OVER (PARTITION BY event_type)::BIGINT AS s
  FROM events),
agg AS (
  SELECT event_type,
         max(n)::BIGINT AS n, max(s)::BIGINT AS s,
         sum(x * x)::BIGINT AS q,
         sum((n::HUGEINT * p - t::HUGEINT * s)
             * (n::HUGEINT * p - t::HUGEINT * s)) AS num
  FROM staged GROUP BY 1),
alg AS (
  SELECT event_type, n, num,
         (n::HUGEINT * n * (n::HUGEINT * q - s::HUGEINT * s)) AS den
  FROM agg)
SELECT event_type, n,
       CASE WHEN n >= 5 AND den > 0 THEN num::DOUBLE END AS kpss_num,
       CASE WHEN n >= 5 AND den > 0 THEN den::DOUBLE END AS kpss_den,
       CASE WHEN n >= 5 AND den > 0
            THEN num::DOUBLE / den::DOUBLE END AS kpss_eta,
       CASE WHEN n >= 5 AND den > 0
            THEN CASE WHEN num::DOUBLE / den::DOUBLE > 0.463
                      THEN 'nonstationary' ELSE 'level_stationary' END
       END AS stationarity
FROM alg
"""

ORACLES["dominant_period_folding"] = """
WITH base AS (
  SELECT event_type,
         (epoch_ms(ts) // 1000)::BIGINT AS es,
         floor(value * 10)::BIGINT AS x
  FROM events),
folded AS (
  SELECT event_type, p.period_s, x,
         ((es % p.period_s) * 8 // p.period_s)::BIGINT AS bin
  FROM base
  CROSS JOIN (SELECT unnest([21600, 43200, 86400, 604800]) AS period_s) p),
cells AS (
  SELECT event_type, period_s, bin,
         count(*)::BIGINT AS c, sum(x)::BIGINT AS s,
         sum(x * x)::BIGINT AS q
  FROM folded GROUP BY 1, 2, 3),
tot AS (
  SELECT event_type, period_s, bin, c, s,
         sum(c) OVER w::BIGINT AS n,
         sum(s) OVER w::BIGINT AS st,
         sum(q) OVER w::BIGINT AS qt
  FROM cells
  WINDOW w AS (PARTITION BY event_type, period_s)),
terms AS (
  SELECT event_type, period_s, max(n)::BIGINT AS n,
         max(st)::BIGINT AS st, max(qt)::BIGINT AS qt,
         coalesce(max(CASE WHEN bin = 0 THEN
           (n * s - st * c)::DOUBLE * (n * s - st * c)::DOUBLE / c::DOUBLE
         END), 0.0) AS b0,
         coalesce(max(CASE WHEN bin = 1 THEN
           (n * s - st * c)::DOUBLE * (n * s - st * c)::DOUBLE / c::DOUBLE
         END), 0.0) AS b1,
         coalesce(max(CASE WHEN bin = 2 THEN
           (n * s - st * c)::DOUBLE * (n * s - st * c)::DOUBLE / c::DOUBLE
         END), 0.0) AS b2,
         coalesce(max(CASE WHEN bin = 3 THEN
           (n * s - st * c)::DOUBLE * (n * s - st * c)::DOUBLE / c::DOUBLE
         END), 0.0) AS b3,
         coalesce(max(CASE WHEN bin = 4 THEN
           (n * s - st * c)::DOUBLE * (n * s - st * c)::DOUBLE / c::DOUBLE
         END), 0.0) AS b4,
         coalesce(max(CASE WHEN bin = 5 THEN
           (n * s - st * c)::DOUBLE * (n * s - st * c)::DOUBLE / c::DOUBLE
         END), 0.0) AS b5,
         coalesce(max(CASE WHEN bin = 6 THEN
           (n * s - st * c)::DOUBLE * (n * s - st * c)::DOUBLE / c::DOUBLE
         END), 0.0) AS b6,
         coalesce(max(CASE WHEN bin = 7 THEN
           (n * s - st * c)::DOUBLE * (n * s - st * c)::DOUBLE / c::DOUBLE
         END), 0.0) AS b7
  FROM tot GROUP BY 1, 2),
scored AS (
  SELECT event_type, period_s, n,
         (b0 + b1 + b2 + b3 + b4 + b5 + b6 + b7)
           / (n::DOUBLE * (n::DOUBLE * qt::DOUBLE - st::DOUBLE * st::DOUBLE))
           AS fold_r
  FROM terms
  WHERE n >= 16 AND n * qt - st * st > 0),
ranked AS (
  SELECT event_type, period_s, n, fold_r,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY fold_r DESC, period_s ASC) AS rk
  FROM scored)
SELECT event_type, period_s::BIGINT AS dominant_period_s, n, fold_r
FROM ranked WHERE rk = 1
"""

ORACLES["conformal_interval"] = """
WITH base AS (
  SELECT event_type,
         (epoch_ms(ts) // 1000)::BIGINT AS es,
         ((epoch_ms(ts) // 1000) % 86400 // 3600)::BIGINT AS hod,
         floor(value * 100)::BIGINT AS vq
  FROM events),
spans AS (
  SELECT event_type, ((min(es) + max(es)) // 2)::BIGINT AS mid
  FROM base GROUP BY 1),
tagged AS (
  SELECT b.event_type, b.hod, b.vq, (b.es <= s.mid) AS is_cal
  FROM base b JOIN spans s USING (event_type)),
cal_cells AS (
  SELECT event_type, hod, vq, count(*)::BIGINT AS cnt
  FROM tagged WHERE is_cal GROUP BY 1, 2, 3),
ranked AS (
  SELECT event_type, hod, vq, cnt,
         sum(cnt) OVER (PARTITION BY event_type, hod ORDER BY vq
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum,
         sum(cnt) OVER (PARTITION BY event_type, hod)::BIGINT AS n
  FROM cal_cells),
med AS (
  SELECT event_type, hod, min(vq)::BIGINT AS med
  FROM ranked
  WHERE cum - cnt < (n + 1) // 2 AND (n + 1) // 2 <= cum
  GROUP BY 1, 2),
resid AS (
  SELECT t.event_type, t.is_cal, abs(t.vq - m.med)::BIGINT AS r
  FROM tagged t JOIN med m ON t.event_type = m.event_type
                          AND t.hod = m.hod),
rcells AS (
  SELECT event_type, r, count(*)::BIGINT AS cnt
  FROM resid WHERE is_cal GROUP BY 1, 2),
rranked AS (
  SELECT event_type, r, cnt,
         sum(cnt) OVER (PARTITION BY event_type ORDER BY r
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum,
         sum(cnt) OVER (PARTITION BY event_type)::BIGINT AS n_cal
  FROM rcells),
qhat AS (
  SELECT event_type, min(r)::BIGINT AS qhat_cq, max(n_cal)::BIGINT AS n_cal
  FROM rranked
  WHERE cum - cnt < least(n_cal, (9 * (n_cal + 1) + 9) // 10)
    AND least(n_cal, (9 * (n_cal + 1) + 9) // 10) <= cum
  GROUP BY 1),
test AS (
  SELECT re.event_type, q.n_cal, q.qhat_cq, re.r
  FROM resid re JOIN qhat q USING (event_type)
  WHERE NOT re.is_cal)
SELECT event_type,
       max(n_cal)::BIGINT AS n_cal,
       max(qhat_cq)::BIGINT AS qhat_cq,
       count(*)::BIGINT AS n_test,
       sum(CASE WHEN r <= qhat_cq THEN 1 ELSE 0 END)::BIGINT AS n_covered,
       sum(CASE WHEN r <= qhat_cq THEN 1 ELSE 0 END)::DOUBLE
         / count(*)::DOUBLE AS coverage
FROM test GROUP BY 1 HAVING count(*) >= 1
"""

ORACLES["trimmed_mean"] = """
WITH cells AS (
  SELECT event_type, floor(value * 100)::BIGINT AS vq,
         count(*)::BIGINT AS cnt
  FROM events GROUP BY 1, 2),
ranked AS (
  SELECT event_type, vq, cnt,
         sum(cnt) OVER (PARTITION BY event_type ORDER BY vq
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum,
         sum(cnt) OVER (PARTITION BY event_type)::BIGINT AS n
  FROM cells),
kept AS (
  SELECT event_type, n, vq,
         greatest(0, least(cum, n - n // 10)
                     - greatest(cum - cnt, n // 10))::BIGINT AS k
  FROM ranked)
SELECT event_type,
       max(n)::BIGINT AS n,
       sum(k)::BIGINT AS n_kept,
       sum(k * vq)::BIGINT AS kept_sum_cq,
       sum(k * vq)::DOUBLE / sum(k)::DOUBLE / 100.0 AS trimmed_mean
FROM kept GROUP BY 1 HAVING sum(k) >= 1
"""

ORACLES["jarque_bera_normality"] = """
WITH base AS (
  SELECT event_type, floor(value * 10)::BIGINT AS vq
  FROM events),
agg AS (
  SELECT event_type,
         count(*)::BIGINT AS n,
         sum(vq)::BIGINT AS s1,
         sum(vq * vq)::BIGINT AS s2,
         sum((vq * vq * vq)::HUGEINT)::HUGEINT AS s3,
         sum((vq * vq * vq * vq)::HUGEINT)::HUGEINT AS s4
  FROM base GROUP BY 1),
staged AS (
  SELECT event_type, n,
         (n::HUGEINT * s2 - s1::HUGEINT * s1) AS m2,
         (n::HUGEINT * n * s3 - 3 * n::HUGEINT * s1 * s2
            + 2 * s1::HUGEINT * s1 * s1) AS m3,
         (n::HUGEINT * n * n * s4 - 4 * n::HUGEINT * n * s1 * s3
            + 6 * n::HUGEINT * s1 * s1 * s2
            - 3 * s1::HUGEINT * s1 * s1 * s1) AS m4
  FROM agg
  WHERE n >= 8 AND (n::HUGEINT * s2 - s1::HUGEINT * s1) > 0)
SELECT event_type, n,
       m3::DOUBLE * m3::DOUBLE / (m2::DOUBLE * m2::DOUBLE * m2::DOUBLE)
         AS skew_g1sq,
       m4::DOUBLE / (m2::DOUBLE * m2::DOUBLE) AS kurtosis_g2,
       n::DOUBLE * (
         m3::DOUBLE * m3::DOUBLE / (m2::DOUBLE * m2::DOUBLE * m2::DOUBLE) / 6.0
         + (m4::DOUBLE / (m2::DOUBLE * m2::DOUBLE) - 3.0)
           * (m4::DOUBLE / (m2::DOUBLE * m2::DOUBLE) - 3.0) / 24.0
       ) AS jb_stat,
       CASE WHEN m3 > 0 THEN 'right_skew'
            WHEN m3 < 0 THEN 'left_skew'
            ELSE 'symmetric' END AS skew_dir
FROM staged
"""

ORACLES["bootstrap_ci_mean"] = """
WITH base AS (
  SELECT event_type, event_id::BIGINT AS eid,
         floor(value * 10)::BIGINT AS vq
  FROM events),
rep AS (
  SELECT event_type, eid, vq, j.j,
         md5_number_lower('boot:' || eid::VARCHAR || ':' || j::VARCHAR)
           ::HUGEINT AS lo,
         md5_number_upper('boot:' || eid::VARCHAR || ':' || j::VARCHAR)
           ::HUGEINT AS up
  FROM base
  CROSS JOIN (SELECT unnest(range(16)) AS j) j),
drawn AS (
  SELECT event_type, vq, j * 4 + f.f AS b,
         (CASE f.f
            WHEN 0 THEN lo % 1000000
            WHEN 1 THEN (lo // 1000000) % 1000000
            WHEN 2 THEN up % 1000000
            ELSE (up // 1000000) % 1000000
          END)::BIGINT AS r
  FROM rep CROSS JOIN (SELECT unnest(range(4)) AS f) f),
weighted AS (
  SELECT event_type, b, vq,
         CASE
           WHEN r < 367879 THEN 0
           WHEN r < 735759 THEN 1
           WHEN r < 919699 THEN 2
           WHEN r < 981012 THEN 3
           WHEN r < 996340 THEN 4
           WHEN r < 999406 THEN 5
           ELSE 6
         END::BIGINT AS m
  FROM drawn),
cells AS (
  SELECT event_type, b,
         sum(m)::BIGINT AS rn,
         sum(m * vq)::BIGINT AS rs,
         count(*)::BIGINT AS n,
         sum(vq)::BIGINT AS s
  FROM weighted GROUP BY 1, 2),
ranked AS (
  SELECT event_type, b, n, s,
         rs::DOUBLE / rn::DOUBLE AS mean_b,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY rs::DOUBLE / rn::DOUBLE, b) AS rk
  FROM cells WHERE rn > 0),
agg AS (
  SELECT event_type,
         max(n)::BIGINT AS n, max(s)::BIGINT AS s,
         max(CASE WHEN rk = 2 THEN mean_b END) AS lo_dq,
         max(CASE WHEN rk = 63 THEN mean_b END) AS hi_dq,
         count(*)::BIGINT AS b_used
  FROM ranked GROUP BY 1)
SELECT event_type, n,
       s::DOUBLE / n::DOUBLE / 10.0 AS mean_value,
       lo_dq / 10.0 AS ci95_lo,
       hi_dq / 10.0 AS ci95_hi,
       b_used
FROM agg WHERE n >= 30
"""

ORACLES["newey_west_lrv"] = """
WITH base AS (
  SELECT user_id, event_type,
         floor(value * 100)::HUGEINT AS vq,
         lag(floor(value * 100)::HUGEINT, 1) OVER w AS l1,
         lag(floor(value * 100)::HUGEINT, 2) OVER w AS l2,
         lag(floor(value * 100)::HUGEINT, 3) OVER w AS l3,
         lag(floor(value * 100)::HUGEINT, 4) OVER w AS l4
  FROM events
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)),
g AS (
  SELECT user_id, event_type,
         count(*)::HUGEINT AS n,
         sum(vq) AS s, sum(vq * vq) AS q,
         sum(vq * l1) AS sxy1,
         sum(CASE WHEN l1 IS NOT NULL THEN vq END) AS sx1, sum(l1) AS sy1,
         sum(vq * l2) AS sxy2,
         sum(CASE WHEN l2 IS NOT NULL THEN vq END) AS sx2, sum(l2) AS sy2,
         sum(vq * l3) AS sxy3,
         sum(CASE WHEN l3 IS NOT NULL THEN vq END) AS sx3, sum(l3) AS sy3,
         sum(vq * l4) AS sxy4,
         sum(CASE WHEN l4 IS NOT NULL THEN vq END) AS sx4, sum(l4) AS sy4
  FROM base GROUP BY 1, 2),
staged AS (
  SELECT user_id, event_type, n,
         (n*n*q - n*s*s) AS g0,
         (n*n*sxy1 - n*s*(sx1+sy1) + (n-1)*s*s) AS g1,
         (n*n*sxy2 - n*s*(sx2+sy2) + (n-2)*s*s) AS g2,
         (n*n*sxy3 - n*s*(sx3+sy3) + (n-3)*s*s) AS g3,
         (n*n*sxy4 - n*s*(sx4+sy4) + (n-4)*s*s) AS g4
  FROM g)
SELECT user_id, event_type, n::BIGINT AS n_obs,
       (5*g0 + 8*g1 + 6*g2 + 4*g3 + 2*g4)::DOUBLE
         / (5*n*n*n)::DOUBLE AS lrv_cq2,
       (5*g0 + 8*g1 + 6*g2 + 4*g3 + 2*g4)::DOUBLE
         / (5*g0)::DOUBLE AS hac_inflation
FROM staged
WHERE n >= 12 AND g0 > 0
"""

ORACLES["cusumsq_variance_change"] = """
WITH base AS (
  SELECT event_type, ts, event_id,
         floor(value * 10)::BIGINT * floor(value * 10)::BIGINT AS sq
  FROM events),
staged AS (
  SELECT event_type, ts,
         row_number() OVER wo AS k,
         sum(sq) OVER (PARTITION BY event_type ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING)::BIGINT AS ck,
         count(*) OVER (PARTITION BY event_type)::BIGINT AS n,
         sum(sq) OVER (PARTITION BY event_type)::BIGINT AS cn
  FROM base
  WINDOW wo AS (PARTITION BY event_type ORDER BY ts, event_id)),
scored AS (
  SELECT event_type, ts, k, n, cn,
         abs(n * ck - k * cn)::BIGINT AS d
  FROM staged WHERE n >= 16 AND cn > 0),
ranked AS (
  SELECT event_type, ts, k, n, cn, d,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY d DESC, k ASC) AS rk
  FROM scored)
SELECT event_type, n, k AS split_k, ts AS split_ts,
       d::DOUBLE / (n::DOUBLE * cn::DOUBLE) AS cusumsq_stat
FROM ranked WHERE rk = 1
"""

ORACLES["kruskal_wallis_contrib"] = """
WITH base AS (
  SELECT event_type, floor(value * 100)::BIGINT AS vq
  FROM events),
cells AS (
  SELECT vq, event_type, count(*)::BIGINT AS cnt
  FROM base GROUP BY 1, 2),
enriched AS (
  SELECT vq, event_type, cnt,
         sum(cnt) OVER (PARTITION BY vq)::BIGINT AS cnt_v,
         coalesce(sum(cnt) OVER (ORDER BY vq
             RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           0)::BIGINT AS cum_below
  FROM cells),
per_type AS (
  SELECT event_type,
         sum(cnt)::BIGINT AS n_i,
         sum(cnt * (2 * cum_below + cnt_v + 1))::BIGINT AS dr_i
  FROM enriched GROUP BY 1),
ties AS (
  SELECT sum(c * c * c - c)::BIGINT AS ties_t,
         sum(c)::BIGINT AS n_total
  FROM (SELECT vq, max(cnt_v)::BIGINT AS c FROM enriched GROUP BY 1)),
joined AS (
  SELECT p.*, t.ties_t, t.n_total FROM per_type p CROSS JOIN ties t),
alg AS (
  SELECT event_type, n_i, dr_i, n_total, ties_t,
         (3::HUGEINT * dr_i * dr_i) AS num,
         (n_i::HUGEINT * n_total * (n_total + 1)) AS den,
         (n_total::HUGEINT * n_total * n_total - n_total) AS ncube
  FROM joined)
SELECT event_type, n_i, dr_i, n_total, ties_t,
       dr_i::DOUBLE / n_i::DOUBLE AS mean_rank2,
       num::DOUBLE / den::DOUBLE AS h_contrib,
       (num * ncube)::DOUBLE / (den * (ncube - ties_t))::DOUBLE AS h_corr
FROM alg
WHERE n_total >= 8 AND den * (ncube - ties_t) > 0
"""

ORACLES["tile_stability_lumpiness"] = """
WITH base AS (
  SELECT event_type,
         floor(value * 10)::BIGINT AS vq,
         ((row_number() OVER (PARTITION BY event_type
                              ORDER BY ts, event_id) - 1) // 24)::BIGINT
           AS tile
  FROM events),
tiles AS (
  SELECT event_type, tile,
         count(*)::BIGINT AS cnt,
         sum(vq)::BIGINT AS s,
         sum(vq * vq)::BIGINT AS q
  FROM base GROUP BY 1, 2
  HAVING count(*) = 24),
agg AS (
  SELECT event_type,
         count(*)::HUGEINT AS k,
         sum(s)::HUGEINT AS ss,
         sum(s::HUGEINT * s)::HUGEINT AS ss2,
         sum(24 * q - s * s)::HUGEINT AS su,
         sum((24 * q - s * s)::HUGEINT * (24 * q - s * s))::HUGEINT AS su2
  FROM tiles GROUP BY 1)
SELECT event_type, k::BIGINT AS k,
       -- ::VARCHAR::DOUBLE: DuckDB's direct int128->double conversion
       -- double-rounds past 2^53 (1-ulp off); the string path is
       -- correctly rounded and matches Spark's BigDecimal.doubleValue
       (k * ss2 - ss * ss)::VARCHAR::DOUBLE
         / (k * k * 576)::VARCHAR::DOUBLE AS stability_dq2,
       (k * su2 - su * su)::VARCHAR::DOUBLE
         / (k * k * 576 * 576)::VARCHAR::DOUBLE AS lumpiness_dq4
FROM agg WHERE k >= 4
"""

ORACLES["siegel_tukey_scale"] = """
WITH base AS (
  SELECT event_type,
         (epoch_ms(ts) // 1000)::BIGINT AS es,
         event_id::BIGINT AS event_id,
         floor(value * 100)::BIGINT AS vq
  FROM events),
spans AS (
  SELECT event_type, ((min(es) + max(es)) // 2)::BIGINT AS mid
  FROM base GROUP BY 1),
ranked AS (
  SELECT b.event_type,
         (b.es <= s.mid) AS early,
         row_number() OVER (PARTITION BY b.event_type
                            ORDER BY b.vq, b.es, b.event_id)::BIGINT AS r,
         count(*) OVER (PARTITION BY b.event_type)::BIGINT AS n
  FROM base b JOIN spans s USING (event_type)),
scored AS (
  SELECT event_type, early, n,
         CASE WHEN r <= n + 1 - r
              THEN CASE WHEN r % 2 = 1 THEN 2 * r - 1 ELSE 2 * r END
              ELSE CASE WHEN (n + 1 - r) % 2 = 1 THEN 2 * (n + 1 - r)
                        ELSE 2 * (n + 1 - r) - 1 END
         END::BIGINT AS score
  FROM ranked),
agg AS (
  SELECT event_type, max(n)::BIGINT AS n,
         sum(CASE WHEN early THEN 1 ELSE 0 END)::BIGINT AS n1,
         sum(CASE WHEN early THEN score ELSE 0 END)::BIGINT AS m_score
  FROM scored GROUP BY 1),
alg AS (
  SELECT event_type, n, n1, (n - n1)::BIGINT AS n2, m_score,
         (n::HUGEINT * (n + 1) // 2) AS t1,
         (n::HUGEINT * (n + 1) * (2 * n + 1) // 6) AS t2
  FROM agg),
fin AS (
  SELECT event_type, n, n1, n2, m_score,
         (n::HUGEINT * m_score - n1::HUGEINT * t1) AS dev,
         (n::HUGEINT * t2 - t1 * t1) AS spread
  FROM alg)
SELECT event_type, n, n1, m_score,
       (dev * dev * (n - 1))::VARCHAR::DOUBLE
         / (n1::HUGEINT * n2 * spread)::VARCHAR::DOUBLE AS st_z2,
       CASE WHEN dev < 0 THEN 'early_more_spread'
            WHEN dev > 0 THEN 'late_more_spread'
            ELSE 'no_scale_shift' END AS spread_shift
FROM fin
WHERE n >= 8 AND n1 >= 2 AND n2 >= 2
  AND (n1::HUGEINT * n2 * spread) > 0
"""

ORACLES["cliffs_delta_effect"] = """
WITH base AS (
  SELECT event_type,
         (epoch_ms(ts) // 1000)::BIGINT AS es,
         floor(value * 100)::BIGINT AS vq
  FROM events),
spans AS (
  SELECT event_type, ((min(es) + max(es)) // 2)::BIGINT AS mid
  FROM base GROUP BY 1),
groups AS (
  SELECT b.event_type, b.vq,
         count(*)::BIGINT AS c,
         sum(CASE WHEN b.es <= s.mid THEN 1 ELSE 0 END)::BIGINT AS c1
  FROM base b JOIN spans s USING (event_type)
  GROUP BY 1, 2),
cum AS (
  SELECT event_type, c1, (c - c1)::BIGINT AS c2,
         coalesce(sum(c - c1) OVER (PARTITION BY event_type ORDER BY vq
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS lt2,
         coalesce(sum(c - c1) OVER (PARTITION BY event_type ORDER BY vq
            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0)::BIGINT AS gt2
  FROM groups),
agg AS (
  SELECT event_type,
         sum(c1)::BIGINT AS n1,
         sum(c2)::BIGINT AS n2,
         sum(c1 * lt2)::BIGINT AS gt_pairs,
         sum(c1 * gt2)::BIGINT AS lt_pairs,
         sum(c1 * c2)::BIGINT AS tie_pairs
  FROM cum GROUP BY 1),
alg AS (
  SELECT event_type, n1, n2, gt_pairs, lt_pairs, tie_pairs,
         (n1::HUGEINT * n2) AS nn,
         (gt_pairs::HUGEINT - lt_pairs) AS dev,
         abs(gt_pairs::HUGEINT - lt_pairs) AS adev
  FROM agg)
SELECT event_type, n1, n2, gt_pairs, lt_pairs, tie_pairs,
       dev::VARCHAR::DOUBLE / nn::VARCHAR::DOUBLE AS cliffs_delta,
       (2::HUGEINT * gt_pairs + tie_pairs)::VARCHAR::DOUBLE
         / (2 * nn)::VARCHAR::DOUBLE AS ps_a,
       CASE WHEN adev * 1000 < 147 * nn THEN 'negligible'
            WHEN adev * 1000 < 330 * nn THEN 'small'
            WHEN adev * 1000 < 474 * nn THEN 'medium'
            ELSE 'large' END AS magnitude
FROM alg WHERE n1 >= 1 AND n2 >= 1
"""

ORACLES["wilcoxon_signed_rank"] = """
WITH base AS (
  SELECT event_type,
         (epoch_ms(ts) // 1000)::BIGINT AS es,
         event_id::BIGINT AS event_id,
         floor(value * 100)::BIGINT AS vq
  FROM events),
pos AS (
  SELECT event_type, vq,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY es, event_id)::BIGINT AS rn,
         count(*) OVER (PARTITION BY event_type)::BIGINT AS n
  FROM base),
tagged AS (
  SELECT event_type,
         CASE WHEN rn <= n // 2 THEN rn ELSE rn - n // 2 END::BIGINT AS pair_id,
         (rn <= n // 2) AS is_first, vq
  FROM pos WHERE rn <= 2 * (n // 2)),
pairs AS (
  SELECT event_type, pair_id,
         (max(CASE WHEN NOT is_first THEN vq END)
          - max(CASE WHEN is_first THEN vq END))::BIGINT AS d
  FROM tagged GROUP BY 1, 2),
ranked AS (
  SELECT event_type, d,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY abs(d), pair_id)::BIGINT AS r
  FROM pairs WHERE d <> 0),
agg AS (
  SELECT event_type, count(*)::BIGINT AS m,
         sum(CASE WHEN d > 0 THEN r ELSE 0 END)::BIGINT AS w_plus
  FROM ranked GROUP BY 1),
alg AS (
  SELECT event_type, m, w_plus,
         (4::HUGEINT * w_plus - m::HUGEINT * (m + 1)) AS dev
  FROM agg)
SELECT event_type, m, w_plus,
       (3::HUGEINT * dev * dev)::VARCHAR::DOUBLE
         / (2::HUGEINT * m * (m + 1) * (2 * m + 1))::VARCHAR::DOUBLE AS wsr_z2,
       CASE WHEN dev > 0 THEN 'late_higher'
            WHEN dev < 0 THEN 'late_lower'
            ELSE 'no_median_change' END AS median_shift
FROM alg WHERE m >= 6
"""

ORACLES["wasserstein_drift"] = """
WITH base AS (
  SELECT event_type,
         (epoch_ms(ts) // 1000)::BIGINT AS es,
         event_id::BIGINT AS event_id,
         floor(value * 100)::BIGINT AS vq
  FROM events),
pos AS (
  SELECT event_type, vq,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY es, event_id)::BIGINT AS rn,
         count(*) OVER (PARTITION BY event_type)::BIGINT AS n
  FROM base),
mark AS (
  SELECT event_type, vq, (rn <= n // 2) AS is_early,
         (n // 2)::BIGINT AS a, (n - n // 2)::BIGINT AS b
  FROM pos),
cnt AS (
  SELECT event_type, vq, max(a) AS a, max(b) AS b,
         sum(CASE WHEN is_early THEN 1 ELSE 0 END)::BIGINT AS ca,
         sum(CASE WHEN is_early THEN 0 ELSE 1 END)::BIGINT AS cb
  FROM mark GROUP BY 1, 2),
cum AS (
  SELECT event_type, a, b,
         sum(ca) OVER w::BIGINT AS cum_a,
         sum(cb) OVER w::BIGINT AS cum_b,
         (lead(vq) OVER w - vq)::BIGINT AS gap
  FROM cnt
  WINDOW w AS (PARTITION BY event_type ORDER BY vq)),
agg AS (
  SELECT event_type, max(a)::BIGINT AS n_early, max(b)::BIGINT AS n_late,
         sum(abs(b::HUGEINT * cum_a - a::HUGEINT * cum_b)
             * coalesce(gap, 0))::HUGEINT AS num
  FROM cum GROUP BY 1)
SELECT event_type, n_early, n_late,
       num::VARCHAR::DOUBLE
         / (n_early::HUGEINT * n_late * 100)::VARCHAR::DOUBLE AS w1
FROM agg WHERE n_early >= 1 AND n_late >= 1
"""

ORACLES["energy_distance_halves"] = """
WITH base AS (
  SELECT event_type,
         (epoch_ms(ts) // 1000)::BIGINT AS es,
         event_id::BIGINT AS event_id,
         floor(value * 100)::BIGINT AS vq
  FROM events),
pos AS (
  SELECT event_type, vq,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY es, event_id)::BIGINT AS rn,
         count(*) OVER (PARTITION BY event_type)::BIGINT AS n
  FROM base),
mark AS (
  SELECT event_type, vq, n, (rn <= n // 2) AS is_early,
         (n // 2)::BIGINT AS a, (n - n // 2)::BIGINT AS b
  FROM pos),
ranked AS (
  SELECT event_type, vq, n, is_early, a, b,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY vq)::BIGINT AS rp,
         row_number() OVER (PARTITION BY event_type, is_early
                            ORDER BY vq)::BIGINT AS rh
  FROM mark),
agg AS (
  SELECT event_type, max(a)::BIGINT AS n_early, max(b)::BIGINT AS n_late,
         sum((2 * rp - n - 1)::HUGEINT * vq)::HUGEINT AS p,
         sum(CASE WHEN is_early
                  THEN (2 * rh - a - 1)::HUGEINT * vq ELSE 0 END)::HUGEINT AS x,
         sum(CASE WHEN NOT is_early
                  THEN (2 * rh - b - 1)::HUGEINT * vq ELSE 0 END)::HUGEINT AS y
  FROM ranked GROUP BY 1),
alg AS (
  SELECT event_type, n_early, n_late,
         (2::HUGEINT * n_early * n_late * (p - x - y)
          - 2::HUGEINT * n_late * n_late * x
          - 2::HUGEINT * n_early * n_early * y) AS num
  FROM agg)
SELECT event_type, n_early, n_late,
       num::VARCHAR::DOUBLE
         / (n_early::HUGEINT * n_early * n_late * n_late
            * 100)::VARCHAR::DOUBLE AS e_dist,
       num::VARCHAR::DOUBLE
         / (n_early::HUGEINT * n_late * (n_early + n_late)
            * 100)::VARCHAR::DOUBLE AS t_stat
FROM alg WHERE n_early >= 1 AND n_late >= 1
"""

ORACLES["friedman_page_blocked"] = """
WITH scores AS (
  SELECT event_type, ts::DATE AS day,
         sum(floor(value * 100)::BIGINT)::BIGINT AS score
  FROM events GROUP BY 1, 2),
kd AS (
  SELECT *, count(DISTINCT event_type) OVER ()::BIGINT AS k FROM scores),
cb AS (
  SELECT *, count(*) OVER (PARTITION BY day)::BIGINT AS tcnt FROM kd),
rk AS (
  SELECT event_type, k,
         row_number() OVER (PARTITION BY day
                            ORDER BY score, event_type)::BIGINT AS r
  FROM cb WHERE tcnt = k),
ag AS (
  SELECT event_type, max(k)::BIGINT AS k, count(*)::BIGINT AS n_blocks,
         sum(r)::BIGINT AS rank_sum
  FROM rk GROUP BY 1),
fin AS (
  SELECT event_type, k, n_blocks, rank_sum,
         row_number() OVER (ORDER BY event_type)::BIGINT AS ord,
         sum((2::HUGEINT * rank_sum - n_blocks * (k + 1))
             * (2::HUGEINT * rank_sum - n_blocks * (k + 1))) OVER () AS sum_dev2
  FROM ag),
fin2 AS (
  SELECT *, sum(ord::HUGEINT * rank_sum) OVER () AS page_l FROM fin),
alg AS (
  SELECT *, (4::HUGEINT * page_l
             - n_blocks::HUGEINT * k * (k + 1) * (k + 1)) AS dev_l
  FROM fin2)
SELECT event_type, k, n_blocks, rank_sum,
       (3::HUGEINT * sum_dev2)::VARCHAR::DOUBLE
         / (n_blocks::HUGEINT * k * (k + 1))::VARCHAR::DOUBLE AS friedman_q,
       page_l::BIGINT AS page_l,
       (9::HUGEINT * dev_l * dev_l)::VARCHAR::DOUBLE
         / (n_blocks::HUGEINT * k * k * (k + 1)
            * (k * k - 1))::VARCHAR::DOUBLE AS page_z2,
       CASE WHEN dev_l > 0 THEN 'increasing_with_type_order'
            WHEN dev_l < 0 THEN 'decreasing_with_type_order'
            ELSE 'no_ordered_trend' END AS page_trend
FROM alg WHERE k >= 2 AND n_blocks >= 2
"""

ORACLES["hjorth_parameters"] = """
WITH base AS (
  SELECT event_type,
         (epoch_ms(ts) // 1000)::BIGINT AS es,
         event_id::BIGINT AS event_id,
         floor(value * 100)::BIGINT AS vq
  FROM events),
lev AS (
  SELECT event_type, es, event_id, vq,
         (vq - lag(vq) OVER w)::BIGINT AS d1
  FROM base
  WINDOW w AS (PARTITION BY event_type ORDER BY es, event_id)),
dd AS (
  SELECT event_type, vq, d1,
         (d1 - lag(d1) OVER w)::BIGINT AS d2
  FROM lev
  WINDOW w AS (PARTITION BY event_type ORDER BY es, event_id)),
agg AS (
  SELECT event_type,
         count(vq)::BIGINT AS m0_n, sum(vq)::BIGINT AS m0_s1,
         sum(vq::HUGEINT * vq)::HUGEINT AS m0_s2,
         count(d1)::BIGINT AS m1_n, sum(d1)::BIGINT AS m1_s1,
         sum(d1::HUGEINT * d1)::HUGEINT AS m1_s2,
         count(d2)::BIGINT AS m2_n, sum(d2)::BIGINT AS m2_s1,
         sum(d2::HUGEINT * d2)::HUGEINT AS m2_s2
  FROM dd GROUP BY 1),
alg AS (
  SELECT event_type, m0_n,
         (m0_n::HUGEINT * m0_s2 - m0_s1::HUGEINT * m0_s1) AS ssd0,
         (m1_n::HUGEINT * m1_s2 - m1_s1::HUGEINT * m1_s1) AS ssd1,
         (m2_n::HUGEINT * m2_s2 - m2_s1::HUGEINT * m2_s1) AS ssd2,
         m0_n::HUGEINT AS n0, m1_n::HUGEINT AS n1, m2_n::HUGEINT AS n2,
         m2_n AS m2n
  FROM agg)
SELECT event_type, m0_n AS n,
       ssd0::VARCHAR::DOUBLE / (n0 * n0 * 10000)::VARCHAR::DOUBLE AS activity,
       (n0 * n0 * ssd1)::VARCHAR::DOUBLE
         / (n1 * n1 * ssd0)::VARCHAR::DOUBLE AS mobility2,
       ((n1 * n1 * ssd2)::VARCHAR::DOUBLE
          / (n2 * n2 * ssd1)::VARCHAR::DOUBLE)
         / ((n0 * n0 * ssd1)::VARCHAR::DOUBLE
              / (n1 * n1 * ssd0)::VARCHAR::DOUBLE) AS complexity2
FROM alg WHERE m2n >= 2 AND ssd0 > 0 AND ssd1 > 0
"""

ORACLES["grubbs_max_deviate"] = """
WITH base AS (
  SELECT event_type, event_id::BIGINT AS event_id,
         floor(value * 100)::BIGINT AS vq
  FROM events),
mom AS (
  SELECT event_type, event_id, vq,
         count(*) OVER w::BIGINT AS n,
         sum(vq) OVER w::BIGINT AS s1,
         sum(vq::HUGEINT * vq) OVER w AS s2
  FROM base
  WINDOW w AS (PARTITION BY event_type)),
scored AS (
  SELECT *, (n * vq - s1)::BIGINT AS dev,
         ((n * vq - s1)::HUGEINT * (n * vq - s1)) AS dev2
  FROM mom),
top AS (
  SELECT *, max(dev2) OVER (PARTITION BY event_type) AS maxdev2 FROM scored),
agg AS (
  SELECT event_type, max(n)::BIGINT AS n, max(s1)::BIGINT AS s1,
         max(s2) AS s2, max(maxdev2) AS maxdev2,
         max(CASE WHEN dev2 = maxdev2 THEN event_id END)::BIGINT
           AS outlier_event_id,
         max(CASE WHEN dev2 = maxdev2
                  THEN CASE WHEN dev > 0 THEN 'high' ELSE 'low' END END)
           AS outlier_side
  FROM top GROUP BY 1),
alg AS (
  SELECT *, (n::HUGEINT * s2 - s1::HUGEINT * s1) AS ssd FROM agg)
SELECT event_type, n,
       ((n - 1)::HUGEINT * maxdev2)::VARCHAR::DOUBLE
         / (n::HUGEINT * ssd)::VARCHAR::DOUBLE AS g2,
       outlier_event_id, outlier_side
FROM alg WHERE n >= 3 AND ssd > 0
"""

ORACLES["boxplot_profile"] = """
WITH counted AS (
  SELECT event_type, floor(value * 100)::BIGINT AS vq,
         count(*)::BIGINT AS cnt
  FROM events GROUP BY 1, 2),
ranked AS (
  SELECT event_type, vq, cnt,
         sum(cnt) OVER (PARTITION BY event_type ORDER BY vq
                        ROWS UNBOUNDED PRECEDING)::BIGINT AS cum,
         sum(cnt) OVER (PARTITION BY event_type)::BIGINT AS n
  FROM counted),
quart AS (
  SELECT event_type, max(n)::BIGINT AS n,
         min(vq)::BIGINT AS vmin, max(vq)::BIGINT AS vmax,
         min(CASE WHEN cum - cnt < floor((n - 1) * 0.25)::BIGINT + 1
                   AND floor((n - 1) * 0.25)::BIGINT + 1 <= cum
                  THEN vq END)::BIGINT AS q1,
         min(CASE WHEN cum - cnt < floor((n - 1) * 0.50)::BIGINT + 1
                   AND floor((n - 1) * 0.50)::BIGINT + 1 <= cum
                  THEN vq END)::BIGINT AS q2,
         min(CASE WHEN cum - cnt < floor((n - 1) * 0.75)::BIGINT + 1
                   AND floor((n - 1) * 0.75)::BIGINT + 1 <= cum
                  THEN vq END)::BIGINT AS q3
  FROM ranked GROUP BY 1),
joined AS (
  SELECT r.event_type, r.vq, r.cnt, q.n, q.vmin, q.vmax, q.q1, q.q2, q.q3,
         (2 * r.vq < 5 * q.q1 - 3 * q.q3) AS lo_out,
         (2 * r.vq > 5 * q.q3 - 3 * q.q1) AS hi_out
  FROM ranked r JOIN quart q USING (event_type))
SELECT event_type, max(n)::BIGINT AS n,
       max(vmin)::DOUBLE / 100.0 AS vmin,
       max(q1)::DOUBLE / 100.0 AS q1,
       max(q2)::DOUBLE / 100.0 AS q2,
       max(q3)::DOUBLE / 100.0 AS q3,
       max(vmax)::DOUBLE / 100.0 AS vmax,
       min(CASE WHEN NOT lo_out AND NOT hi_out THEN vq END)::DOUBLE / 100.0
         AS whisker_lo,
       max(CASE WHEN NOT lo_out AND NOT hi_out THEN vq END)::DOUBLE / 100.0
         AS whisker_hi,
       sum(CASE WHEN lo_out THEN cnt ELSE 0 END)::BIGINT AS n_low_outliers,
       sum(CASE WHEN hi_out THEN cnt ELSE 0 END)::BIGINT AS n_high_outliers
FROM joined GROUP BY 1 HAVING max(n) >= 4
"""

ORACLES["robust_moments"] = """
WITH counted AS (
  SELECT event_type, floor(value * 100)::BIGINT AS vq,
         count(*)::BIGINT AS cnt
  FROM events GROUP BY 1, 2),
ranked AS (
  SELECT event_type, vq, cnt,
         sum(cnt) OVER (PARTITION BY event_type ORDER BY vq
                        ROWS UNBOUNDED PRECEDING)::BIGINT AS cum,
         sum(cnt) OVER (PARTITION BY event_type)::BIGINT AS n
  FROM counted),
oct AS (
  SELECT event_type, max(n)::BIGINT AS n,
         min(CASE WHEN cum - cnt < floor((n - 1) * 1 / 8)::BIGINT + 1
                   AND floor((n - 1) * 1 / 8)::BIGINT + 1 <= cum
                  THEN vq END)::BIGINT AS e1,
         min(CASE WHEN cum - cnt < floor((n - 1) * 2 / 8)::BIGINT + 1
                   AND floor((n - 1) * 2 / 8)::BIGINT + 1 <= cum
                  THEN vq END)::BIGINT AS e2,
         min(CASE WHEN cum - cnt < floor((n - 1) * 3 / 8)::BIGINT + 1
                   AND floor((n - 1) * 3 / 8)::BIGINT + 1 <= cum
                  THEN vq END)::BIGINT AS e3,
         min(CASE WHEN cum - cnt < floor((n - 1) * 4 / 8)::BIGINT + 1
                   AND floor((n - 1) * 4 / 8)::BIGINT + 1 <= cum
                  THEN vq END)::BIGINT AS e4,
         min(CASE WHEN cum - cnt < floor((n - 1) * 5 / 8)::BIGINT + 1
                   AND floor((n - 1) * 5 / 8)::BIGINT + 1 <= cum
                  THEN vq END)::BIGINT AS e5,
         min(CASE WHEN cum - cnt < floor((n - 1) * 6 / 8)::BIGINT + 1
                   AND floor((n - 1) * 6 / 8)::BIGINT + 1 <= cum
                  THEN vq END)::BIGINT AS e6,
         min(CASE WHEN cum - cnt < floor((n - 1) * 7 / 8)::BIGINT + 1
                   AND floor((n - 1) * 7 / 8)::BIGINT + 1 <= cum
                  THEN vq END)::BIGINT AS e7
  FROM ranked GROUP BY 1)
SELECT event_type, n,
       e2::DOUBLE / 100.0 AS q1,
       e4::DOUBLE / 100.0 AS q2,
       e6::DOUBLE / 100.0 AS q3,
       (e6 - 2 * e4 + e2)::DOUBLE / nullif(e6 - e2, 0)::DOUBLE
         AS bowley_skew,
       ((e7 - e5) + (e3 - e1))::DOUBLE / nullif(e6 - e2, 0)::DOUBLE
         AS moors_kurtosis,
       (e6 - e2)::DOUBLE / nullif(e6 + e2, 0)::DOUBLE AS qcd
FROM oct WHERE n >= 8
"""

ORACLES["anderson_darling_drift"] = """
WITH base AS (
  SELECT event_type, floor(epoch(ts))::BIGINT AS es,
         floor(value * 100)::BIGINT AS vq
  FROM events),
spans AS (
  SELECT event_type, floor((min(es) + max(es)) / 2)::BIGINT AS mid
  FROM base GROUP BY 1),
cells AS (
  SELECT b.event_type, b.vq,
         sum(CASE WHEN b.es <= s.mid THEN 1 ELSE 0 END)::BIGINT AS c1,
         sum(CASE WHEN b.es > s.mid THEN 1 ELSE 0 END)::BIGINT AS c2
  FROM base b JOIN spans s USING (event_type)
  GROUP BY 1, 2),
cum AS (
  SELECT event_type, vq, (c1 + c2)::BIGINT AS l,
         sum(c1) OVER (PARTITION BY event_type ORDER BY vq
                       ROWS UNBOUNDED PRECEDING)::BIGINT AS cum1,
         sum(c2) OVER (PARTITION BY event_type ORDER BY vq
                       ROWS UNBOUNDED PRECEDING)::BIGINT AS cum2,
         sum(c1) OVER (PARTITION BY event_type)::BIGINT AS n1,
         sum(c2) OVER (PARTITION BY event_type)::BIGINT AS n2
  FROM cells),
terms AS (
  SELECT event_type, vq, n1, n2,
         (l::DOUBLE * (n2 * cum1 - n1 * cum2)::DOUBLE
            * (n2 * cum1 - n1 * cum2)::DOUBLE)
           / ((cum1 + cum2) * (n1 + n2 - cum1 - cum2))::DOUBLE AS term
  FROM cum WHERE cum1 + cum2 < n1 + n2),
agg AS (
  SELECT event_type, max(n1)::BIGINT AS n1, max(n2)::BIGINT AS n2,
         list_reduce(list(term ORDER BY vq), (a, b) -> a + b) AS ad_sum
  FROM terms GROUP BY 1)
SELECT event_type, n1, n2, ad_sum,
       ad_sum / (n1::DOUBLE * n2::DOUBLE) AS ad_stat
FROM agg WHERE n1 >= 2 AND n2 >= 2
"""

ORACLES["kuiper_drift"] = """
WITH base AS (
  SELECT event_type, floor(epoch(ts))::BIGINT AS es,
         floor(value * 100)::BIGINT AS vq
  FROM events),
spans AS (
  SELECT event_type, floor((min(es) + max(es)) / 2)::BIGINT AS mid
  FROM base GROUP BY 1),
grid AS (
  SELECT b.event_type, b.vq,
         sum(CASE WHEN b.es <= s.mid THEN 1 ELSE 0 END)::BIGINT AS c_a,
         sum(CASE WHEN b.es > s.mid THEN 1 ELSE 0 END)::BIGINT AS c_b
  FROM base b JOIN spans s USING (event_type)
  GROUP BY 1, 2),
cdf AS (
  SELECT event_type,
         sum(c_a) OVER (PARTITION BY event_type)::BIGINT AS n_a,
         sum(c_b) OVER (PARTITION BY event_type)::BIGINT AS n_b,
         (sum(c_a) OVER (PARTITION BY event_type ORDER BY vq
                         ROWS UNBOUNDED PRECEDING)
            * sum(c_b) OVER (PARTITION BY event_type)
          - sum(c_b) OVER (PARTITION BY event_type ORDER BY vq
                           ROWS UNBOUNDED PRECEDING)
            * sum(c_a) OVER (PARTITION BY event_type))::BIGINT AS dev
  FROM grid),
agg AS (
  SELECT event_type, max(n_a)::BIGINT AS n_a, max(n_b)::BIGINT AS n_b,
         greatest(max(dev), 0)::BIGINT AS dplus_num,
         greatest(max(-dev), 0)::BIGINT AS dminus_num
  FROM cdf GROUP BY 1)
SELECT event_type, n_a, n_b,
       dplus_num::DOUBLE / (n_a * n_b)::DOUBLE AS d_plus,
       dminus_num::DOUBLE / (n_a * n_b)::DOUBLE AS d_minus,
       (dplus_num + dminus_num)::DOUBLE / (n_a * n_b)::DOUBLE AS kuiper_v,
       CASE WHEN dplus_num > dminus_num THEN 'late_higher'
            WHEN dplus_num < dminus_num THEN 'late_lower'
            ELSE 'balanced' END AS dominant_direction
FROM agg WHERE n_a >= 1 AND n_b >= 1
"""

ORACLES["engle_granger_coint"] = """
WITH hourly AS (
  SELECT event_type, floor(floor(epoch(ts))::BIGINT / 3600)::BIGINT AS hr,
         sum(floor(value * 100)::BIGINT)::BIGINT AS sv,
         count(*)::BIGINT AS cnt
  FROM events GROUP BY 1, 2),
pairs AS (
  SELECT a.event_type AS type_y, b.event_type AS type_x, a.hr,
         a.sv::DOUBLE / a.cnt::DOUBLE AS ym,
         b.sv::DOUBLE / b.cnt::DOUBLE AS xm
  FROM hourly a JOIN hourly b USING (hr)
  WHERE a.event_type < b.event_type),
arr0 AS (
  SELECT type_y, type_x,
         list(struct_pack(hr := hr, xm := xm, ym := ym) ORDER BY hr) AS arr,
         count(*)::BIGINT AS n
  FROM pairs GROUP BY 1, 2),
st1 AS (
  SELECT type_y, type_x, arr, n,
         list_reduce(list_transform(arr, v -> v.xm), (p, q) -> p + q) AS sx,
         list_reduce(list_transform(arr, v -> v.ym), (p, q) -> p + q) AS sy,
         list_reduce(list_transform(arr, v -> v.xm * v.xm),
                     (p, q) -> p + q) AS sxx,
         list_reduce(list_transform(arr, v -> v.xm * v.ym),
                     (p, q) -> p + q) AS sxy
  FROM arr0 WHERE n >= 4),
st2 AS (
  SELECT type_y, type_x, arr, n, sx, sy,
         (n::DOUBLE * sxy - sx * sy)
           / nullif(n::DOUBLE * sxx - sx * sx, 0.0) AS beta
  FROM st1),
st3 AS (
  SELECT type_y, type_x, arr, n, beta,
         (sy - beta * sx) / n::DOUBLE AS alpha
  FROM st2),
st4 AS (
  SELECT type_y, type_x, n, beta, alpha,
         list_transform(arr, v -> (v.ym - alpha) - beta * v.xm) AS e
  FROM st3),
st5 AS (
  SELECT type_y, type_x, n, beta, alpha,
         list_slice(e, 1, n - 1) AS ep,
         list_transform(list_zip(list_slice(e, 2, n),
                                 list_slice(e, 1, n - 1)),
                        s -> s[1] - s[2]) AS de
  FROM st4),
st6 AS (
  SELECT type_y, type_x, n, beta, alpha, ep, de,
         list_reduce(list_transform(list_zip(ep, de), s -> s[1] * s[2]),
                     (p, q) -> p + q) AS spd,
         list_reduce(list_transform(ep, p -> p * p), (p, q) -> p + q) AS spp
  FROM st5),
st7 AS (
  SELECT type_y, type_x, n, beta, alpha, ep, de, spp,
         spd / nullif(spp, 0.0) AS df_phi
  FROM st6),
st8 AS (
  SELECT type_y, type_x, n, beta, alpha, spp, df_phi,
         list_reduce(list_transform(list_zip(de, ep),
                                    s -> (s[1] - df_phi * s[2])
                                         * (s[1] - df_phi * s[2])),
                     (p, q) -> p + q) AS ssr
  FROM st7)
SELECT type_y, type_x, n AS n_hours, beta, alpha, df_phi,
       df_phi / sqrt((ssr / (n::DOUBLE - 2.0)) / spp) AS df_t,
       (df_phi / sqrt((ssr / (n::DOUBLE - 2.0)) / spp)) < -3.34
         AS cointegrated
FROM st8
"""

ORACLES["vocab_growth_heaps"] = """
WITH spans AS (
  SELECT source, floor((min(doc_id) + max(doc_id)) / 2)::BIGINT AS mid
  FROM documents GROUP BY 1),
exploded AS (
  SELECT d.source,
         CASE WHEN d.doc_id <= s.mid THEN 1 ELSE 0 END AS in_a,
         unnest(CASE WHEN trim(d.text) = '' THEN []::VARCHAR[]
                     ELSE regexp_split_to_array(trim(d.text), '\\s+')
                END) AS tok
  FROM documents d JOIN spans s USING (source)),
agg AS (
  SELECT source,
         sum(in_a)::BIGINT AS n_tokens_half,
         count(*)::BIGINT AS n_tokens_full,
         count(DISTINCT CASE WHEN in_a = 1 THEN tok END)::BIGINT
           AS vocab_half,
         count(DISTINCT tok)::BIGINT AS vocab_full
  FROM exploded GROUP BY 1)
SELECT source, n_tokens_half, n_tokens_full, vocab_half, vocab_full,
       n_tokens_full::DOUBLE / n_tokens_half::DOUBLE AS token_growth,
       vocab_full::DOUBLE / vocab_half::DOUBLE AS vocab_growth,
       vocab_half::DOUBLE / n_tokens_half::DOUBLE AS ttr_half,
       vocab_full::DOUBLE / n_tokens_full::DOUBLE AS ttr_full
FROM agg
WHERE n_tokens_half >= 1 AND n_tokens_full > n_tokens_half
"""

ORACLES["zipf_decay_profile"] = """
WITH terms AS (
  SELECT source, unnest(CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                             ELSE regexp_split_to_array(trim(text), '\\s+')
                        END) AS tok
  FROM documents),
counted AS (
  SELECT source, tok, count(*)::BIGINT AS freq
  FROM terms GROUP BY 1, 2),
ranked AS (
  SELECT source, tok, freq,
         row_number() OVER (PARTITION BY source
                            ORDER BY freq DESC, tok ASC)::BIGINT AS rank,
         max(freq) OVER (PARTITION BY source)::BIGINT AS f1
  FROM counted)
SELECT source, rank, tok AS term, freq,
       (rank * freq)::BIGINT AS rank_x_freq,
       freq::DOUBLE / f1::DOUBLE AS decay_from_top,
       (rank * freq)::DOUBLE / f1::DOUBLE AS zipf_flatness
FROM ranked WHERE rank IN (1, 2, 4, 8, 16, 32, 64)
"""

ORACLES["sign_transfer_qmi"] = """
WITH hourly AS (
  SELECT event_type, floor(floor(epoch(ts))::BIGINT / 3600)::BIGINT AS hr,
         sum(floor(value * 100)::BIGINT)::DOUBLE / count(*)::DOUBLE AS m
  FROM events GROUP BY 1, 2),
sig AS (
  SELECT event_type, hr,
         CASE WHEN lag(hr) OVER w = hr - 1
              THEN sign(m - lag(m) OVER w)::INT END AS sc
  FROM hourly WINDOW w AS (PARTITION BY event_type ORDER BY hr)),
sig2 AS (
  SELECT event_type, hr, sc,
         CASE WHEN lag(hr) OVER w = hr - 1
              THEN lag(sc) OVER w END AS sp
  FROM sig WINDOW w AS (PARTITION BY event_type ORDER BY hr)),
pairs AS (
  SELECT a.event_type AS type_y, b.event_type AS type_x,
         b.sp AS i, a.sc AS j
  FROM sig2 a JOIN sig2 b USING (hr)
  WHERE a.event_type <> b.event_type
    AND b.sp IS NOT NULL AND a.sc IS NOT NULL),
cells AS (
  SELECT type_y, type_x, i, j, count(*)::BIGINT AS o
  FROM pairs GROUP BY 1, 2, 3, 4),
rc AS (
  SELECT type_y, type_x, i, j, o,
         sum(o) OVER (PARTITION BY type_y, type_x, i)::BIGINT AS r,
         sum(o) OVER (PARTITION BY type_y, type_x, j)::BIGINT AS c,
         sum(o) OVER (PARTITION BY type_y, type_x)::BIGINT AS n
  FROM cells),
devs AS (
  SELECT *,
         (n::HUGEINT * o::HUGEINT - r::HUGEINT * c::HUGEINT) AS dev,
         row_number() OVER (
           PARTITION BY type_y, type_x
           ORDER BY (n::HUGEINT * o::HUGEINT - r::HUGEINT * c::HUGEINT)
                    * (n::HUGEINT * o::HUGEINT - r::HUGEINT * c::HUGEINT)
                    DESC, i DESC, j DESC) AS rn
  FROM rc),
agg AS (
  SELECT type_y, type_x, max(n)::BIGINT AS n_pairs,
         sum(o::HUGEINT * o::HUGEINT) AS so2,
         sum(o::HUGEINT * r::HUGEINT * c::HUGEINT) AS sorc,
         sum(o::HUGEINT * r::HUGEINT) AS sr2,
         sum(o::HUGEINT * c::HUGEINT) AS sc2,
         max(CASE WHEN rn = 1 THEN
           (CASE WHEN i = -1 THEN 'down' WHEN i = 0 THEN 'flat'
                 ELSE 'up' END) || '_then_' ||
           (CASE WHEN j = -1 THEN 'down' WHEN j = 0 THEN 'flat'
                 ELSE 'up' END) END) AS dominant_pattern
  FROM devs GROUP BY 1, 2)
SELECT type_y, type_x, n_pairs,
       (n_pairs::HUGEINT * n_pairs::HUGEINT * so2
        - 2::HUGEINT * n_pairs::HUGEINT * sorc
        + sr2 * sc2)::DOUBLE
         / (n_pairs::DOUBLE * n_pairs::DOUBLE
            * n_pairs::DOUBLE * n_pairs::DOUBLE) AS qmi,
       dominant_pattern
FROM agg WHERE n_pairs >= 8
"""

ORACLES["hellinger_decile_drift"] = """
WITH base AS (
  SELECT event_type, floor(epoch(ts))::BIGINT AS es,
         floor(value * 100)::BIGINT AS vq
  FROM events),
spans AS (
  SELECT event_type, floor((min(es) + max(es)) / 2)::BIGINT AS mid,
         min(vq)::BIGINT AS vmin, max(vq)::BIGINT AS vmax
  FROM base GROUP BY 1),
binned AS (
  SELECT b.event_type,
         floor(10 * (b.vq - s.vmin) / (s.vmax - s.vmin + 1))::BIGINT AS bin,
         CASE WHEN b.es <= s.mid THEN 1 ELSE 0 END AS in_a
  FROM base b JOIN spans s USING (event_type)),
cells AS (
  SELECT event_type, bin,
         sum(in_a)::BIGINT AS c1,
         sum(1 - in_a)::BIGINT AS c2
  FROM binned GROUP BY 1, 2),
agg AS (
  SELECT event_type,
         sum(c1)::BIGINT AS n1, sum(c2)::BIGINT AS n2,
         list_reduce(list(sqrt((c1 * c2)::DOUBLE) ORDER BY bin),
                     (a, b) -> a + b) AS s_bc
  FROM cells GROUP BY 1)
SELECT event_type, n1, n2,
       s_bc / sqrt((n1 * n2)::DOUBLE) AS bhattacharyya,
       sqrt(greatest(1.0 - s_bc / sqrt((n1 * n2)::DOUBLE), 0.0))
         AS hellinger
FROM agg WHERE n1 >= 1 AND n2 >= 1
"""

ORACLES["equidepth_histogram"] = """
WITH counted AS (
  SELECT event_type, floor(value * 100)::BIGINT AS vq,
         count(*)::BIGINT AS cnt
  FROM events GROUP BY 1, 2),
ranked AS (
  SELECT event_type, vq, cnt,
         sum(cnt) OVER (PARTITION BY event_type ORDER BY vq
                        ROWS UNBOUNDED PRECEDING)::BIGINT AS cum,
         sum(cnt) OVER (PARTITION BY event_type)::BIGINT AS n
  FROM counted),
oct AS (
  SELECT event_type, max(n)::BIGINT AS n,
         min(CASE WHEN cum - cnt < floor((n - 1) * 1 / 8)::BIGINT + 1
                   AND floor((n - 1) * 1 / 8)::BIGINT + 1 <= cum
                  THEN vq END)::BIGINT AS e1,
         min(CASE WHEN cum - cnt < floor((n - 1) * 2 / 8)::BIGINT + 1
                   AND floor((n - 1) * 2 / 8)::BIGINT + 1 <= cum
                  THEN vq END)::BIGINT AS e2,
         min(CASE WHEN cum - cnt < floor((n - 1) * 3 / 8)::BIGINT + 1
                   AND floor((n - 1) * 3 / 8)::BIGINT + 1 <= cum
                  THEN vq END)::BIGINT AS e3,
         min(CASE WHEN cum - cnt < floor((n - 1) * 4 / 8)::BIGINT + 1
                   AND floor((n - 1) * 4 / 8)::BIGINT + 1 <= cum
                  THEN vq END)::BIGINT AS e4,
         min(CASE WHEN cum - cnt < floor((n - 1) * 5 / 8)::BIGINT + 1
                   AND floor((n - 1) * 5 / 8)::BIGINT + 1 <= cum
                  THEN vq END)::BIGINT AS e5,
         min(CASE WHEN cum - cnt < floor((n - 1) * 6 / 8)::BIGINT + 1
                   AND floor((n - 1) * 6 / 8)::BIGINT + 1 <= cum
                  THEN vq END)::BIGINT AS e6,
         min(CASE WHEN cum - cnt < floor((n - 1) * 7 / 8)::BIGINT + 1
                   AND floor((n - 1) * 7 / 8)::BIGINT + 1 <= cum
                  THEN vq END)::BIGINT AS e7,
         min(CASE WHEN cum - cnt < floor((n - 1) * 1 / 8)::BIGINT + 1
                   AND floor((n - 1) * 1 / 8)::BIGINT + 1 <= cum
                  THEN cum END)::BIGINT AS c1,
         min(CASE WHEN cum - cnt < floor((n - 1) * 2 / 8)::BIGINT + 1
                   AND floor((n - 1) * 2 / 8)::BIGINT + 1 <= cum
                  THEN cum END)::BIGINT AS c2,
         min(CASE WHEN cum - cnt < floor((n - 1) * 3 / 8)::BIGINT + 1
                   AND floor((n - 1) * 3 / 8)::BIGINT + 1 <= cum
                  THEN cum END)::BIGINT AS c3,
         min(CASE WHEN cum - cnt < floor((n - 1) * 4 / 8)::BIGINT + 1
                   AND floor((n - 1) * 4 / 8)::BIGINT + 1 <= cum
                  THEN cum END)::BIGINT AS c4,
         min(CASE WHEN cum - cnt < floor((n - 1) * 5 / 8)::BIGINT + 1
                   AND floor((n - 1) * 5 / 8)::BIGINT + 1 <= cum
                  THEN cum END)::BIGINT AS c5,
         min(CASE WHEN cum - cnt < floor((n - 1) * 6 / 8)::BIGINT + 1
                   AND floor((n - 1) * 6 / 8)::BIGINT + 1 <= cum
                  THEN cum END)::BIGINT AS c6,
         min(CASE WHEN cum - cnt < floor((n - 1) * 7 / 8)::BIGINT + 1
                   AND floor((n - 1) * 7 / 8)::BIGINT + 1 <= cum
                  THEN cum END)::BIGINT AS c7
  FROM ranked GROUP BY 1),
rows_ AS (
  SELECT event_type, n, t.k::BIGINT AS k,
         CASE t.k WHEN 1 THEN e1 WHEN 2 THEN e2 WHEN 3 THEN e3
                  WHEN 4 THEN e4 WHEN 5 THEN e5 WHEN 6 THEN e6
                  ELSE e7 END AS eb,
         CASE t.k WHEN 1 THEN c1 WHEN 2 THEN c2 WHEN 3 THEN c3
                  WHEN 4 THEN c4 WHEN 5 THEN c5 WHEN 6 THEN c6
                  ELSE c7 END AS cum_le
  FROM oct CROSS JOIN (VALUES (1),(2),(3),(4),(5),(6),(7)) t(k)
  WHERE n >= 8)
SELECT event_type, n, k,
       (floor((n - 1) * k / 8)::BIGINT + 1)::BIGINT AS target_rank,
       eb::DOUBLE / 100.0 AS boundary,
       cum_le,
       (cum_le - (floor((n - 1) * k / 8)::BIGINT + 1))::BIGINT AS tie_excess,
       cum_le::DOUBLE / n::DOUBLE AS depth_share
FROM rows_
"""

ORACLES["brown_forsythe_scale"] = """
WITH counted AS (
  SELECT event_type, floor(value * 100)::BIGINT AS vq,
         count(*)::BIGINT AS cnt
  FROM events GROUP BY 1, 2),
ranked AS (
  SELECT event_type, vq, cnt,
         sum(cnt) OVER (PARTITION BY event_type ORDER BY vq
                        ROWS UNBOUNDED PRECEDING)::BIGINT AS cum,
         sum(cnt) OVER (PARTITION BY event_type)::BIGINT AS n
  FROM counted),
dev AS (
  SELECT event_type, cnt,
         abs(vq - min(CASE WHEN cum - cnt < floor((n - 1) / 2)::BIGINT + 1
                            AND floor((n - 1) / 2)::BIGINT + 1 <= cum
                           THEN vq END)
                 OVER (PARTITION BY event_type))::BIGINT AS z
  FROM ranked),
per_type AS (
  SELECT event_type,
         sum(cnt)::BIGINT AS n_i,
         sum(cnt * z)::BIGINT AS s_i,
         sum(cnt * z * z)::BIGINT AS q_i
  FROM dev GROUP BY 1),
gall AS (
  SELECT count(*)::BIGINT AS k,
         sum(n_i)::BIGINT AS n_total,
         sum(s_i)::BIGINT AS t_sum,
         sum(q_i)::BIGINT AS q_sum,
         list_reduce(list(s_i::DOUBLE * s_i::DOUBLE / n_i::DOUBLE
                          ORDER BY event_type), (a, b) -> a + b) AS ssb_sum,
         max(struct_pack(mz := s_i::DOUBLE / n_i::DOUBLE,
                         t := event_type)) AS top
  FROM per_type)
SELECT k, n_total,
       ssb_sum - (t_sum::DOUBLE * t_sum::DOUBLE) / n_total::DOUBLE
         AS ss_between,
       q_sum::DOUBLE - ssb_sum AS ss_within,
       ((ssb_sum - (t_sum::DOUBLE * t_sum::DOUBLE) / n_total::DOUBLE)
          / (k::DOUBLE - 1.0))
         / nullif((q_sum::DOUBLE - ssb_sum)
                  / (n_total::DOUBLE - k::DOUBLE), 0.0) AS bf_f,
       k::DOUBLE - 1.0 AS df1,
       n_total::DOUBLE - k::DOUBLE AS df2,
       top.t AS most_dispersed_type,
       top.mz AS max_mean_absdev_centi
FROM gall WHERE k >= 2 AND n_total > k
"""

ORACLES["durbin_watson_trend"] = """
WITH hourly AS (
  SELECT event_type, floor(floor(epoch(ts))::BIGINT / 3600)::BIGINT AS hr,
         sum(floor(value * 100)::BIGINT)::DOUBLE / count(*)::DOUBLE AS m
  FROM events GROUP BY 1, 2),
arr0 AS (
  SELECT event_type,
         list(struct_pack(hr := hr, m := m) ORDER BY hr) AS arr,
         count(*)::BIGINT AS n
  FROM hourly GROUP BY 1),
st0 AS (
  SELECT event_type, n,
         list_transform(arr, v -> struct_pack(
           t := (v.hr - arr[1].hr)::DOUBLE, m := v.m)) AS tm
  FROM arr0 WHERE n >= 4),
st1 AS (
  SELECT event_type, n, tm,
         list_reduce(list_transform(tm, v -> v.t), (p, q) -> p + q) AS st,
         list_reduce(list_transform(tm, v -> v.m), (p, q) -> p + q) AS sm,
         list_reduce(list_transform(tm, v -> v.t * v.t),
                     (p, q) -> p + q) AS stt,
         list_reduce(list_transform(tm, v -> v.t * v.m),
                     (p, q) -> p + q) AS stm
  FROM st0),
st2 AS (
  SELECT event_type, n, tm, sm, st,
         (n::DOUBLE * stm - st * sm)
           / nullif(n::DOUBLE * stt - st * st, 0.0) AS beta
  FROM st1),
st3 AS (
  SELECT event_type, n, tm, beta,
         (sm - beta * st) / n::DOUBLE AS alpha
  FROM st2),
st4 AS (
  SELECT event_type, n, beta, alpha,
         list_transform(tm, v -> (v.m - alpha) - beta * v.t) AS e
  FROM st3),
st5 AS (
  SELECT event_type, n, beta, alpha,
         list_reduce(list_transform(e, r -> r * r), (p, q) -> p + q) AS see,
         list_reduce(list_transform(
             list_zip(list_slice(e, 2, n), list_slice(e, 1, n - 1)),
             s -> (s[1] - s[2]) * (s[1] - s[2])), (p, q) -> p + q) AS sdd
  FROM st4)
SELECT event_type, n AS n_hours,
       beta AS trend_slope_centi_per_hr,
       sdd / nullif(see, 0.0) AS dw,
       1.0 - (sdd / nullif(see, 0.0)) / 2.0 AS rho1,
       CASE WHEN sdd / nullif(see, 0.0) < 1.5 THEN 'positive_autocorr'
            WHEN sdd / nullif(see, 0.0) > 2.5 THEN 'negative_autocorr'
            ELSE 'white' END AS residual_verdict
FROM st5
"""

ORACLES["shortest_half_interval"] = """
WITH counted AS (
  SELECT event_type, floor(value * 100)::BIGINT AS vq,
         count(*)::BIGINT AS cnt
  FROM events GROUP BY 1, 2),
ranked AS (
  SELECT event_type, vq, cnt,
         sum(cnt) OVER (PARTITION BY event_type ORDER BY vq
                        ROWS UNBOUNDED PRECEDING)::BIGINT AS cum,
         sum(cnt) OVER (PARTITION BY event_type)::BIGINT AS n
  FROM counted),
unioned AS (
  SELECT event_type, n, (floor(n / 2)::BIGINT + 1)::BIGINT AS h,
         (cum - cnt + floor(n / 2)::BIGINT + 1)::BIGINT AS key,
         1 AS kind, vq AS qvq, NULL::BIGINT AS vvq
  FROM ranked WHERE cum - cnt + floor(n / 2)::BIGINT + 1 <= n
  UNION ALL
  SELECT event_type, n, (floor(n / 2)::BIGINT + 1)::BIGINT AS h,
         (cum - cnt + 1)::BIGINT AS key,
         0 AS kind, NULL::BIGINT AS qvq, vq AS vvq
  FROM ranked),
looked AS (
  SELECT event_type, n, h, kind, qvq,
         last_value(vvq IGNORE NULLS)
           OVER (PARTITION BY event_type ORDER BY key, kind
                 ROWS UNBOUNDED PRECEDING) AS rvq
  FROM unioned),
agg AS (
  SELECT event_type, max(n)::BIGINT AS n, max(h)::BIGINT AS h,
         min(struct_pack(w := (rvq - qvq)::BIGINT,
                         lo := qvq, hi := rvq)) AS best
  FROM looked WHERE kind = 1 GROUP BY 1)
SELECT event_type, n, h,
       best.lo::DOUBLE / 100.0 AS shorth_lo,
       best.hi::DOUBLE / 100.0 AS shorth_hi,
       best.w::DOUBLE / 100.0 AS shorth_width,
       (best.lo + best.hi)::DOUBLE / 200.0 AS shorth_mode
FROM agg WHERE n >= 2
"""

ORACLES["logrank_survival_drift"] = """
WITH base AS (
  SELECT user_id, event_id,
         (epoch_ms(ts) // 1000)::BIGINT AS es, ts
  FROM events),
flagged AS (
  SELECT user_id, es, ts, event_id,
         CASE WHEN es - lag(es) OVER w > 1800 OR lag(es) OVER w IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM base
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sess_tag AS (
  SELECT user_id, es,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged),
sessions AS (
  SELECT user_id, session_id,
         min(es)::BIGINT AS s_start, max(es)::BIGINT AS s_end
  FROM sess_tag GROUP BY 1, 2),
horizon AS (
  SELECT max(s_end)::BIGINT AS t_max,
         floor((min(s_start) + max(s_start)) / 2)::BIGINT AS mid
  FROM sessions),
tagged AS (
  SELECT ((s_end - s_start) // 60)::BIGINT AS dur,
         (t_max - s_end < 1800) AS censored,
         (s_start <= mid) AS in_a
  FROM sessions, horizon),
grid AS (
  SELECT dur,
         sum(CASE WHEN in_a THEN 1 ELSE 0 END)::BIGINT AS a1,
         sum(CASE WHEN NOT in_a THEN 1 ELSE 0 END)::BIGINT AS a2,
         sum(CASE WHEN in_a AND NOT censored THEN 1 ELSE 0 END)::BIGINT
           AS d1,
         sum(CASE WHEN NOT in_a AND NOT censored THEN 1 ELSE 0 END)::BIGINT
           AS d2
  FROM tagged GROUP BY 1),
risk AS (
  SELECT dur, d1, d2,
         sum(a1) OVER (ORDER BY dur
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)::BIGINT AS n1,
         sum(a2) OVER (ORDER BY dur
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)::BIGINT AS n2
  FROM grid),
terms AS (
  SELECT dur, d1, (d1 + d2)::BIGINT AS d, n1, n2, (n1 + n2)::BIGINT AS n
  FROM risk WHERE d1 + d2 >= 1 AND n1 + n2 >= 2),
gall AS (
  SELECT count(*)::BIGINT AS n_times,
         list_reduce(list(
             d1::DOUBLE - (d::DOUBLE * n1::DOUBLE) / n::DOUBLE
             ORDER BY dur), (a, b) -> a + b) AS o_minus_e,
         list_reduce(list(
             CASE WHEN n >= 2 THEN
               ((d * n1)::HUGEINT * n2::HUGEINT * (n - d)::HUGEINT)::DOUBLE
                 / (n * n * (n - 1))::DOUBLE
             ELSE 0.0 END ORDER BY dur), (a, b) -> a + b) AS variance
  FROM terms)
SELECT n_times, o_minus_e, variance,
       (o_minus_e * o_minus_e) / nullif(variance, 0.0) AS logrank_chi2,
       ((o_minus_e * o_minus_e) / nullif(variance, 0.0)) > 3.841
         AS survival_drifted
FROM gall WHERE n_times >= 1
"""

ORACLES["nelson_aalen_hazard"] = """
WITH RECURSIVE base AS (
  SELECT user_id, event_id,
         (epoch_ms(ts) // 1000)::BIGINT AS es, ts
  FROM events),
flagged AS (
  SELECT user_id, es, ts, event_id,
         CASE WHEN es - lag(es) OVER w > 1800 OR lag(es) OVER w IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM base
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sess_tag AS (
  SELECT user_id, es,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged),
sessions AS (
  SELECT user_id, session_id,
         min(es)::BIGINT AS s_start, max(es)::BIGINT AS s_end
  FROM sess_tag GROUP BY 1, 2),
horizon AS (SELECT max(s_end)::BIGINT AS t_max FROM sessions),
tagged AS (
  SELECT ((s_end - s_start) // 60)::BIGINT AS dur,
         (t_max - s_end < 1800) AS censored
  FROM sessions, horizon),
grid AS (
  SELECT dur,
         count(*)::BIGINT AS cnt_all,
         sum(CASE WHEN NOT censored THEN 1 ELSE 0 END)::BIGINT AS d_events
  FROM tagged GROUP BY 1),
staged AS (
  SELECT dur, d_events,
         (sum(cnt_all) OVER ()
          - sum(cnt_all) OVER (ORDER BY dur
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          + cnt_all)::BIGINT AS n_risk
  FROM grid),
ev AS (
  SELECT dur, d_events, n_risk,
         d_events::DOUBLE / n_risk::DOUBLE AS inc,
         d_events::DOUBLE / (n_risk::DOUBLE * n_risk::DOUBLE) AS vinc,
         row_number() OVER (ORDER BY dur) AS k
  FROM staged WHERE d_events >= 1),
rec AS (
  SELECT k, dur, d_events, n_risk,
         0.0 + inc AS na, 0.0 + vinc AS nav
  FROM ev WHERE k = 1
  UNION ALL
  SELECT e.k, e.dur, e.d_events, e.n_risk,
         r.na + e.inc, r.nav + e.vinc
  FROM ev e JOIN rec r ON e.k = r.k + 1)
SELECT dur AS duration_min, n_risk, d_events,
       na AS na_hazard, nav AS na_variance
FROM rec
"""

ORACLES["range_partition_planner"] = """
WITH sample_u AS (
  SELECT user_id::BIGINT AS uid
  FROM events WHERE user_id % 20 = 3 GROUP BY 1),
ranked AS (
  SELECT uid, row_number() OVER (ORDER BY uid)::BIGINT AS r,
         count(*) OVER ()::BIGINT AS m
  FROM sample_u),
bounds AS (
  SELECT max(m)::BIGINT AS m_sample,
         min(CASE WHEN r = floor((m - 1) * 1 / 8)::BIGINT + 1
                  THEN uid END)::BIGINT AS b1,
         min(CASE WHEN r = floor((m - 1) * 2 / 8)::BIGINT + 1
                  THEN uid END)::BIGINT AS b2,
         min(CASE WHEN r = floor((m - 1) * 3 / 8)::BIGINT + 1
                  THEN uid END)::BIGINT AS b3,
         min(CASE WHEN r = floor((m - 1) * 4 / 8)::BIGINT + 1
                  THEN uid END)::BIGINT AS b4,
         min(CASE WHEN r = floor((m - 1) * 5 / 8)::BIGINT + 1
                  THEN uid END)::BIGINT AS b5,
         min(CASE WHEN r = floor((m - 1) * 6 / 8)::BIGINT + 1
                  THEN uid END)::BIGINT AS b6,
         min(CASE WHEN r = floor((m - 1) * 7 / 8)::BIGINT + 1
                  THEN uid END)::BIGINT AS b7
  FROM ranked),
tagged AS (
  SELECT ((CASE WHEN e.user_id > b.b1 THEN 1 ELSE 0 END)
        + (CASE WHEN e.user_id > b.b2 THEN 1 ELSE 0 END)
        + (CASE WHEN e.user_id > b.b3 THEN 1 ELSE 0 END)
        + (CASE WHEN e.user_id > b.b4 THEN 1 ELSE 0 END)
        + (CASE WHEN e.user_id > b.b5 THEN 1 ELSE 0 END)
        + (CASE WHEN e.user_id > b.b6 THEN 1 ELSE 0 END)
        + (CASE WHEN e.user_id > b.b7 THEN 1 ELSE 0 END))::BIGINT AS bucket,
         e.user_id AS uid
  FROM events e, bounds b),
hist AS (
  SELECT bucket, count(*)::BIGINT AS n_rows,
         count(DISTINCT uid)::BIGINT AS n_users
  FROM tagged GROUP BY 1),
tot AS (
  SELECT bucket, n_rows, n_users,
         sum(n_rows) OVER ()::BIGINT AS total
  FROM hist)
SELECT bucket, n_rows, n_users,
       n_rows::DOUBLE / total::DOUBLE AS row_share,
       (8 * n_rows)::DOUBLE / total::DOUBLE AS skew_factor,
       (8 * n_rows > 2 * total) AS straggler_risk
FROM tot
"""

ORACLES["salt_factor_planner"] = """
WITH counted AS (
  SELECT user_id::BIGINT AS uid, count(*)::BIGINT AS c
  FROM events GROUP BY 1),
exploded AS (
  SELECT t.s::BIGINT AS s,
         ((c + t.s - 1) // t.s)::BIGINT AS ceilc,
         c
  FROM counted CROSS JOIN (VALUES (1),(2),(4),(8),(16)) t(s)),
per_s AS (
  SELECT s, max(ceilc)::BIGINT AS max_task_rows,
         sum(c)::BIGINT AS total_rows
  FROM exploded GROUP BY 1),
outp AS (
  SELECT s, max_task_rows, total_rows,
         first_value(max_task_rows) OVER (ORDER BY s
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
           ::BIGINT AS unsalted
  FROM per_s)
SELECT s, max_task_rows, total_rows,
       max_task_rows::DOUBLE / total_rows::DOUBLE AS max_task_share,
       unsalted::DOUBLE / max_task_rows::DOUBLE AS straggler_speedup
FROM outp
"""

ORACLES["aqe_coalesce_simulator"] = """
WITH buckets AS (
  SELECT (user_id % 64)::BIGINT AS b, count(*)::BIGINT AS c
  FROM events GROUP BY 1),
gall AS (
  SELECT count(*)::BIGINT AS n_buckets,
         sum(c)::BIGINT AS total_rows,
         list(struct_pack(b := b, c := c) ORDER BY b, c) AS arr
  FROM buckets),
st AS (
  SELECT n_buckets, total_rows, arr,
         floor((total_rows + 15) / 16)::BIGINT AS target
  FROM gall),
st2 AS (
  SELECT n_buckets, total_rows, target,
         list_reduce(
           list_transform(arr, e -> struct_pack(
             cur := e.c, grp := 0::BIGINT, mx := 0::BIGINT)),
           (a, e) -> CASE WHEN a.cur > 0 AND a.cur + e.cur > target
             THEN struct_pack(cur := e.cur, grp := a.grp + 1,
                              mx := greatest(a.mx, a.cur))
             ELSE struct_pack(cur := a.cur + e.cur, grp := a.grp,
                              mx := a.mx) END) AS f
  FROM st)
SELECT n_buckets, total_rows, target,
       (f.grp + 1)::BIGINT AS n_coalesced,
       greatest(f.mx, f.cur)::BIGINT AS max_group_rows,
       total_rows::DOUBLE / (f.grp + 1)::DOUBLE AS avg_group_rows,
       greatest(f.mx, f.cur)::DOUBLE / target::DOUBLE AS balance_vs_target
FROM st2 WHERE n_buckets >= 1
"""

ORACLES["arch_effect_lag1"] = """
WITH hourly AS (
  SELECT event_type, floor(floor(epoch(ts))::BIGINT / 3600)::BIGINT AS hr,
         sum(floor(value * 100)::BIGINT)::DOUBLE / count(*)::DOUBLE AS m
  FROM events GROUP BY 1, 2),
st1 AS (
  SELECT event_type, hr,
         (CASE WHEN lag(hr) OVER w = hr - 1
               THEN m - lag(m) OVER w END)
         * (CASE WHEN lag(hr) OVER w = hr - 1
                 THEN m - lag(m) OVER w END) AS a
  FROM hourly WINDOW w AS (PARTITION BY event_type ORDER BY hr)),
st2 AS (
  SELECT event_type, hr, a,
         CASE WHEN lag(hr) OVER w = hr - 1 THEN lag(a) OVER w END AS ap
  FROM st1 WINDOW w AS (PARTITION BY event_type ORDER BY hr)),
pairs AS (
  SELECT event_type, hr, ap, a FROM st2
  WHERE a IS NOT NULL AND ap IS NOT NULL),
arr0 AS (
  SELECT event_type, count(*)::BIGINT AS n,
         list_reduce(list(ap ORDER BY hr), (p, q) -> p + q) AS sx,
         list_reduce(list(a ORDER BY hr), (p, q) -> p + q) AS sy,
         list_reduce(list(ap * ap ORDER BY hr), (p, q) -> p + q) AS sxx,
         list_reduce(list(a * a ORDER BY hr), (p, q) -> p + q) AS syy,
         list_reduce(list(ap * a ORDER BY hr), (p, q) -> p + q) AS sxy
  FROM pairs GROUP BY 1)
SELECT event_type, n AS n_pairs,
       ((n::DOUBLE * sxy - sx * sy) * (n::DOUBLE * sxy - sx * sy))
         / nullif((n::DOUBLE * sxx - sx * sx)
                  * (n::DOUBLE * syy - sy * sy), 0.0) AS arch_r2,
       n::DOUBLE * (((n::DOUBLE * sxy - sx * sy)
                     * (n::DOUBLE * sxy - sx * sy))
         / nullif((n::DOUBLE * sxx - sx * sx)
                  * (n::DOUBLE * syy - sy * sy), 0.0)) AS arch_lm,
       (n::DOUBLE * (((n::DOUBLE * sxy - sx * sy)
                      * (n::DOUBLE * sxy - sx * sy))
         / nullif((n::DOUBLE * sxx - sx * sx)
                  * (n::DOUBLE * syy - sy * sy), 0.0))) > 3.841
         AS volatility_clustered
  FROM arr0 WHERE n >= 4
"""

ORACLES["rescaled_range_profile"] = """
WITH hourly AS (
  SELECT event_type, floor(floor(epoch(ts))::BIGINT / 3600)::BIGINT AS hr,
         sum(floor(value * 100)::BIGINT)::DOUBLE / count(*)::DOUBLE AS m
  FROM events GROUP BY 1, 2),
seq AS (
  SELECT event_type, m,
         row_number() OVER (PARTITION BY event_type ORDER BY hr)::BIGINT
           AS rn
  FROM hourly),
expanded AS (
  SELECT event_type, t.k::BIGINT AS k, m,
         floor((rn - 1) / t.k)::BIGINT AS blk,
         ((rn - 1) % t.k + 1)::BIGINT AS idx
  FROM seq CROSS JOIN (VALUES (8),(16),(32),(64)) t(k)),
blocks AS (
  SELECT event_type, k, blk,
         list(struct_pack(idx := idx, m := m) ORDER BY idx) AS arr,
         count(*)::BIGINT AS cnt
  FROM expanded GROUP BY 1, 2, 3),
st1 AS (
  SELECT event_type, k, blk, arr,
         list_reduce(list_transform(arr, v -> v.m), (p, q) -> p + q)
           / k::DOUBLE AS mu
  FROM blocks WHERE cnt = k),
st2 AS (
  SELECT event_type, k, blk,
         (list_max(list_transform(arr, e ->
            list_reduce(list_transform(list_slice(arr, 1, e.idx),
                                       v -> v.m), (p, q) -> p + q)
            - e.idx::DOUBLE * mu))
          - list_min(list_transform(arr, e ->
            list_reduce(list_transform(list_slice(arr, 1, e.idx),
                                       v -> v.m), (p, q) -> p + q)
            - e.idx::DOUBLE * mu))) AS r,
         sqrt(list_reduce(list_transform(arr,
                v -> (v.m - mu) * (v.m - mu)), (p, q) -> p + q)
              / k::DOUBLE) AS s
  FROM st1),
st3 AS (
  SELECT event_type, k, blk, r / nullif(s, 0.0) AS rs
  FROM st2 WHERE r / nullif(s, 0.0) IS NOT NULL),
perk AS (
  SELECT event_type, k, count(*)::BIGINT AS n_blocks,
         list_reduce(list(rs ORDER BY blk), (p, q) -> p + q) AS s_rs
  FROM st3 GROUP BY 1, 2),
st4 AS (
  SELECT event_type, k, n_blocks,
         s_rs / n_blocks::DOUBLE AS mean_rs
  FROM perk WHERE n_blocks >= 2)
SELECT event_type, k, n_blocks, mean_rs,
       mean_rs / lag(mean_rs) OVER (PARTITION BY event_type ORDER BY k)
         AS rs_growth_vs_half
FROM st4
"""

ORACLES["poisson_rate_drift"] = """
WITH base AS (
  SELECT event_type, floor(epoch(ts))::BIGINT AS es FROM events),
spans AS (
  SELECT event_type, floor((min(es) + max(es)) / 2)::BIGINT AS mid
  FROM base GROUP BY 1),
agg AS (
  SELECT b.event_type,
         sum(CASE WHEN b.es <= s.mid THEN 1 ELSE 0 END)::BIGINT AS n1,
         sum(CASE WHEN b.es > s.mid THEN 1 ELSE 0 END)::BIGINT AS n2
  FROM base b JOIN spans s USING (event_type)
  GROUP BY 1)
SELECT event_type, n1, n2,
       n2::DOUBLE / nullif(n1, 0)::DOUBLE AS rate_ratio,
       (2 * n1 - (n1 + n2))::DOUBLE / sqrt((n1 + n2)::DOUBLE) AS rate_z,
       (10000 * (2 * n1 - (n1 + n2)) * (2 * n1 - (n1 + n2))
          > 38416 * (n1 + n2)) AS rate_drifted
FROM agg WHERE n1 + n2 >= 4
"""

_HOURLY_RANKS = """
hourly AS (
  SELECT event_type, floor(floor(epoch(ts))::BIGINT / 3600)::BIGINT AS hr,
         sum(floor(value * 100)::BIGINT)::DOUBLE / count(*)::DOUBLE AS m
  FROM events GROUP BY 1, 2),
seq AS (
  SELECT event_type, hr, m,
         row_number() OVER (PARTITION BY event_type ORDER BY hr)::BIGINT
           AS t,
         (2 * rank() OVER (PARTITION BY event_type ORDER BY m)
          + count(*) OVER (PARTITION BY event_type, m) - 1)::BIGINT AS r2,
         count(*) OVER (PARTITION BY event_type)::BIGINT AS n
  FROM hourly)"""

ORACLES["pettitt_changepoint"] = f"""
WITH {_HOURLY_RANKS},
u AS (
  SELECT event_type, hr, t, n,
         ((sum(r2) OVER (PARTITION BY event_type ORDER BY t))::BIGINT
          - t * (n + 1))::BIGINT AS u
  FROM seq),
best AS (
  SELECT event_type, n, t, hr, u,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY abs(u) DESC, t) AS rn
  FROM u WHERE t < n)
SELECT event_type, n, abs(u)::BIGINT AS k_stat, t AS tau_t, hr AS tau_hr,
       (2 * abs(u))::DOUBLE / (n * (n + 1))::DOUBLE AS k_frac,
       (60000 * abs(u) * abs(u) > 36889 * (n * n * n + n * n)) AS changed
FROM best WHERE rn = 1 AND n >= 8
"""

ORACLES["cox_stuart_trend"] = f"""
WITH {_HOURLY_RANKS},
g AS (
  SELECT event_type, list(m ORDER BY t) AS arr, count(*)::BIGINT AS n
  FROM seq GROUP BY 1),
st AS (
  SELECT event_type, n,
         list_sum(list_transform(
           generate_series(1, (n - (n + 1) // 2)::INT),
           i -> CASE WHEN arr[(i + (n + 1) // 2)::INT] > arr[i]
                     THEN 1 ELSE 0 END))::BIGINT AS pos,
         list_sum(list_transform(
           generate_series(1, (n - (n + 1) // 2)::INT),
           i -> CASE WHEN arr[(i + (n + 1) // 2)::INT] < arr[i]
                     THEN 1 ELSE 0 END))::BIGINT AS neg
  FROM g WHERE n >= 8)
SELECT event_type, n, pos, neg,
       (2 * pos - (pos + neg))::DOUBLE / sqrt((pos + neg)::DOUBLE)
         AS trend_z,
       (10000 * (2 * pos - (pos + neg)) * (2 * pos - (pos + neg))
          > 38416 * (pos + neg)) AS trended,
       CASE WHEN 10000 * (2 * pos - (pos + neg)) * (2 * pos - (pos + neg))
                   > 38416 * (pos + neg)
            THEN CASE WHEN 2 * pos - (pos + neg) > 0
                      THEN 'increasing' ELSE 'decreasing' END
            ELSE 'none' END AS direction
FROM st WHERE pos + neg >= 4
"""

ORACLES["bartels_rank_ratio"] = f"""
WITH {_HOURLY_RANKS},
st AS (
  SELECT event_type, n,
         (r2 - lead(r2) OVER (PARTITION BY event_type ORDER BY t))
           AS d,
         (r2 - (n + 1)) AS e
  FROM seq),
agg AS (
  SELECT event_type, max(n)::BIGINT AS n,
         sum(d * d)::BIGINT AS num4, sum(e * e)::BIGINT AS den4
  FROM st GROUP BY 1)
SELECT event_type, n, num4, den4,
       num4::DOUBLE / den4::DOUBLE AS rvn,
       (num4::DOUBLE / den4::DOUBLE - 2.0)
         / sqrt((4 * (n - 2) * (5 * n * n - 2 * n - 9))::DOUBLE
                / (5 * n * (n + 1) * (n - 1) * (n - 1))::DOUBLE) AS rvn_z,
       (abs(num4::DOUBLE / den4::DOUBLE - 2.0)
         / sqrt((4 * (n - 2) * (5 * n * n - 2 * n - 9))::DOUBLE
                / (5 * n * (n + 1) * (n - 1) * (n - 1))::DOUBLE)
        > 1.96) AS nonrandom
FROM agg WHERE n >= 10 AND den4 > 0
"""

ORACLES["teager_kaiser_energy"] = """
WITH base AS (
  SELECT event_type, event_id, floor(epoch(ts))::BIGINT AS es,
         floor(value * 100)::BIGINT AS vq
  FROM events),
st AS (
  SELECT event_type, event_id, es,
         (vq * vq - lag(vq) OVER w * lead(vq) OVER w)::BIGINT AS psi
  FROM base
  WINDOW w AS (PARTITION BY event_type ORDER BY es, event_id)),
ranked AS (
  SELECT event_type, event_id, es, psi,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY psi DESC, es, event_id) AS rn
  FROM st WHERE psi IS NOT NULL),
agg AS (
  SELECT event_type, count(*)::BIGINT AS n_psi,
         sum(psi)::BIGINT AS sum_psi,
         sum(CASE WHEN psi < 0 THEN 1 ELSE 0 END)::BIGINT AS n_negative,
         max(CASE WHEN rn = 1 THEN psi END)::BIGINT AS max_psi,
         max(CASE WHEN rn = 1 THEN event_id END)::BIGINT AS peak_event_id
  FROM ranked GROUP BY 1)
SELECT event_type, n_psi,
       sum_psi::DOUBLE / n_psi::DOUBLE AS mean_psi,
       n_negative, max_psi, peak_event_id
FROM agg
"""

ORACLES["dickey_fuller_level"] = f"""
WITH {_HOURLY_RANKS},
arr0 AS (
  SELECT event_type,
         list(struct_pack(t := t, m := m) ORDER BY t) AS arr,
         max(n)::BIGINT AS n
  FROM seq GROUP BY 1),
st1 AS (
  SELECT event_type, n,
         list_transform(list_slice(arr, 1, (n - 1)::INT), v -> v.m) AS lv,
         list_transform(list_zip(list_slice(arr, 2, n::INT),
                                 list_slice(arr, 1, (n - 1)::INT)),
                        s -> s[1].m - s[2].m) AS dd
  FROM arr0 WHERE n >= 8),
st2 AS (
  SELECT event_type, n, lv, dd,
         list_reduce(lv, (p, q) -> p + q) AS sx,
         list_reduce(dd, (p, q) -> p + q) AS sd,
         list_reduce(list_transform(lv, x -> x * x), (p, q) -> p + q)
           AS sxx,
         list_reduce(list_transform(list_zip(lv, dd), s -> s[1] * s[2]),
                     (p, q) -> p + q) AS sxd
  FROM st1),
st3 AS (
  SELECT event_type, n, lv, dd, sx, sd, sxx,
         ((n - 1)::DOUBLE * sxd - sx * sd)
           / nullif((n - 1)::DOUBLE * sxx - sx * sx, 0.0) AS phi
  FROM st2),
st4 AS (
  SELECT event_type, n, lv, dd, sx, sxx, phi,
         (sd - phi * sx) / (n - 1)::DOUBLE AS alpha
  FROM st3),
st5 AS (
  SELECT event_type, n, sx, sxx, phi, alpha,
         list_reduce(list_transform(list_zip(dd, lv),
                       s -> ((s[1] - alpha) - phi * s[2])
                            * ((s[1] - alpha) - phi * s[2])),
                     (p, q) -> p + q) AS ssr
  FROM st4)
SELECT event_type, n, phi, alpha,
       phi / nullif(sqrt((ssr / ((n - 1)::DOUBLE - 2.0))
                  / nullif(sxx - sx * sx / (n - 1)::DOUBLE, 0.0)), 0.0)
         AS df_t,
       (phi / nullif(sqrt((ssr / ((n - 1)::DOUBLE - 2.0))
                   / nullif(sxx - sx * sx / (n - 1)::DOUBLE, 0.0)), 0.0))
         < -2.86 AS mean_reverting
FROM st5
"""

ORACLES["dfa_profile"] = """
WITH hourly AS (
  SELECT event_type, floor(floor(epoch(ts))::BIGINT / 3600)::BIGINT AS hr,
         sum(floor(value * 100)::BIGINT)::DOUBLE / count(*)::DOUBLE AS m
  FROM events GROUP BY 1, 2),
seq AS (
  SELECT event_type, m,
         row_number() OVER (PARTITION BY event_type ORDER BY hr)::BIGINT
           AS rn
  FROM hourly),
expanded AS (
  SELECT event_type, t.k::BIGINT AS k, m,
         floor((rn - 1) / t.k)::BIGINT AS blk,
         ((rn - 1) % t.k + 1)::BIGINT AS idx
  FROM seq CROSS JOIN (VALUES (8),(16),(32),(64)) t(k)),
blocks AS (
  SELECT event_type, k, blk,
         list(struct_pack(idx := idx, m := m) ORDER BY idx) AS arr,
         count(*)::BIGINT AS cnt
  FROM expanded GROUP BY 1, 2, 3),
st1 AS (
  SELECT event_type, k, blk, arr,
         list_reduce(list_transform(arr, v -> v.m), (p, q) -> p + q)
           / k::DOUBLE AS mu
  FROM blocks WHERE cnt = k),
st2 AS (
  SELECT event_type, k, blk,
         list_transform(arr, e -> struct_pack(
           x := e.idx::DOUBLE,
           y := list_reduce(list_transform(list_slice(arr, 1, e.idx),
                                           v -> v.m), (p, q) -> p + q)
                - e.idx::DOUBLE * mu)) AS p
  FROM st1),
st3 AS (
  SELECT event_type, k, blk, p,
         (k::DOUBLE * list_reduce(list_transform(p, v -> v.x * v.y),
                                  (a, b) -> a + b)
          - (k * (k + 1) / 2)::DOUBLE
            * list_reduce(list_transform(p, v -> v.y), (a, b) -> a + b))
         / nullif(k::DOUBLE * (k * (k + 1) * (2 * k + 1) / 6)::DOUBLE
                  - (k * (k + 1) / 2)::DOUBLE * (k * (k + 1) / 2)::DOUBLE,
                  0.0) AS beta,
         list_reduce(list_transform(p, v -> v.y), (a, b) -> a + b) AS sy
  FROM st2),
st4 AS (
  SELECT event_type, k, blk, p, beta,
         (sy - beta * (k * (k + 1) / 2)::DOUBLE) / k::DOUBLE AS a0
  FROM st3),
st5 AS (
  SELECT event_type, k, blk,
         sqrt(list_reduce(list_transform(p,
                v -> (v.y - a0 - beta * v.x) * (v.y - a0 - beta * v.x)),
              (a, b) -> a + b) / k::DOUBLE) AS f_blk
  FROM st4),
perk AS (
  SELECT event_type, k, count(*)::BIGINT AS n_blocks,
         list_reduce(list(f_blk ORDER BY blk), (a, b) -> a + b) AS s_f
  FROM st5 WHERE f_blk IS NOT NULL GROUP BY 1, 2),
st6 AS (
  SELECT event_type, k, n_blocks, s_f / n_blocks::DOUBLE AS mean_f
  FROM perk WHERE n_blocks >= 2)
SELECT event_type, k, n_blocks, mean_f,
       mean_f / lag(mean_f) OVER (PARTITION BY event_type ORDER BY k)
         AS f_growth_vs_half
FROM st6
"""

ORACLES["hodges_lehmann_shift"] = f"""
WITH {_HOURLY_RANKS},
arr0 AS (
  SELECT event_type, list(m ORDER BY t) AS arr, max(n)::BIGINT AS n
  FROM seq GROUP BY 1),
st1 AS (
  SELECT event_type, n,
         list_slice(arr, 1, (n // 2)::INT) AS early,
         list_slice(arr, (n // 2 + 1)::INT, n::INT) AS late
  FROM arr0 WHERE n >= 8),
st2 AS (
  SELECT event_type, n,
         len(early)::BIGINT AS n_early, len(late)::BIGINT AS n_late,
         list_sort(flatten(list_transform(late,
           l -> list_transform(early, e -> l - e)))) AS d
  FROM st1)
SELECT event_type, n, n_early, n_late,
       (n_early * n_late)::BIGINT AS n_pairs,
       CASE WHEN (n_early * n_late) % 2 = 1
            THEN d[((n_early * n_late + 1) // 2)::INT]
            ELSE (d[((n_early * n_late) // 2)::INT]
                  + d[((n_early * n_late) // 2 + 1)::INT]) / 2.0
       END AS hl_shift
FROM st2
"""


def _chow_stage() -> str:
    """Build the chow_break_midpoint oracle: the same fold-exact
    SSR(y ~ t) staged per segment (pooled / first half / second
    half), suffixed columns."""
    sums = """
         list_reduce(list_transform({a}, v -> v.t::DOUBLE),
                     (p, q) -> p + q) AS sx_{s},
         list_reduce(list_transform({a}, v -> v.m), (p, q) -> p + q)
           AS sy_{s},
         list_reduce(list_transform({a}, v -> v.t::DOUBLE * v.t::DOUBLE),
                     (p, q) -> p + q) AS sxx_{s},
         list_reduce(list_transform({a}, v -> v.t::DOUBLE * v.m),
                     (p, q) -> p + q) AS sxy_{s},
         len({a})::DOUBLE AS cnt_{s}"""
    beta = """
         (cnt_{s} * sxy_{s} - sx_{s} * sy_{s})
           / nullif(cnt_{s} * sxx_{s} - sx_{s} * sx_{s}, 0.0) AS beta_{s},
         {a} AS keep_{s}"""
    alpha = "(sy_{s} - beta_{s} * sx_{s}) / cnt_{s} AS alpha_{s}"
    ssr = """
         list_reduce(list_transform(keep_{s},
             v -> ((v.m - alpha_{s}) - beta_{s} * v.t::DOUBLE)
                  * ((v.m - alpha_{s}) - beta_{s} * v.t::DOUBLE)),
           (p, q) -> p + q) AS ssr_{s}"""
    segs = [("p", "arr"), ("a", "arr1"), ("b", "arr2")]
    s1 = ",".join(sums.format(a=a, s=s) for s, a in segs)
    s2 = ",".join(beta.format(a=a, s=s) for s, a in segs)
    s2b = ",\n".join(
        f"sx_{s}, sy_{s}, cnt_{s}" for s, _ in segs
    )
    s3 = ",".join(alpha.format(s=s) for s, _ in segs)
    s3b = ",\n".join(f"beta_{s}, keep_{s}, cnt_{s}" for s, _ in segs)
    s4 = ",".join(ssr.format(s=s) for s, _ in segs)
    return f"""
arr0 AS (
  SELECT event_type,
         list(struct_pack(t := t, m := m) ORDER BY t) AS arr,
         max(n)::BIGINT AS n
  FROM seq GROUP BY 1),
cut AS (
  SELECT event_type, n, arr,
         list_slice(arr, 1, (n // 2)::INT) AS arr1,
         list_slice(arr, (n // 2 + 1)::INT, n::INT) AS arr2
  FROM arr0 WHERE n >= 12),
sm AS (
  SELECT event_type, n, arr, arr1, arr2,{s1}
  FROM cut),
bt AS (
  SELECT event_type, n,
{s2b},{s2}
  FROM sm),
al AS (
  SELECT event_type, n,
{s3b},{s3}
  FROM bt),
sr AS (
  SELECT event_type, n,{s4}
  FROM al)"""


ORACLES["chow_break_midpoint"] = f"""
WITH {_HOURLY_RANKS},{_chow_stage()}
SELECT event_type, n, ssr_p AS ssr_pooled, ssr_a AS ssr1, ssr_b AS ssr2,
       ((ssr_p - ssr_a - ssr_b) / 2.0)
         / nullif((ssr_a + ssr_b) / (n::DOUBLE - 4.0), 0.0) AS f_stat,
       (((ssr_p - ssr_a - ssr_b) / 2.0)
         / nullif((ssr_a + ssr_b) / (n::DOUBLE - 4.0), 0.0)) > 2.996
         AS broke
FROM sr
"""

ORACLES["gumbel_moments_extremes"] = """
WITH daily AS (
  SELECT event_type, floor(floor(epoch(ts))::BIGINT / 86400)::BIGINT
           AS day,
         max(floor(value * 100)::BIGINT)::BIGINT AS mx
  FROM events GROUP BY 1, 2),
agg AS (
  SELECT event_type, count(*)::BIGINT AS n_days,
         sum(mx)::BIGINT AS s1, sum(mx * mx)::BIGINT AS s2,
         max(mx)::BIGINT AS max_of_max
  FROM daily GROUP BY 1)
SELECT event_type, n_days, max_of_max,
       s1::DOUBLE / n_days::DOUBLE AS mean_max,
       sqrt(6.0 * ((n_days * s2 - s1 * s1)::DOUBLE
                   / (n_days * n_days)::DOUBLE)) / 3.141592653589793
         AS gumbel_scale,
       s1::DOUBLE / n_days::DOUBLE
         - 0.5772156649015329
           * (sqrt(6.0 * ((n_days * s2 - s1 * s1)::DOUBLE
                          / (n_days * n_days)::DOUBLE))
              / 3.141592653589793) AS gumbel_location
FROM agg WHERE n_days >= 8
"""

ORACLES["lz76_complexity"] = f"""
WITH {_HOURLY_RANKS},
arr0 AS (
  SELECT event_type, list(m ORDER BY t) AS arr, max(n)::BIGINT AS n
  FROM seq GROUP BY 1),
st1 AS (
  SELECT event_type, n, arr,
         list_reduce(arr, (p, q) -> p + q) / n::DOUBLE AS mu
  FROM arr0 WHERE n >= 16),
st2 AS (
  SELECT event_type, n,
         array_to_string(list_transform(arr,
           v -> CASE WHEN v > mu THEN '1' ELSE '0' END), '') AS s
  FROM st1),
st3 AS (
  SELECT event_type, n, s,
         list_reduce(
           list_transform(generate_series(2, n), j -> struct_pack(
             c := (CASE WHEN contains(substr(s, 1, 1), substr(s, 2, 1))
                        THEN 1 ELSE 2 END)::BIGINT,
             i := (CASE WHEN contains(substr(s, 1, 1), substr(s, 2, 1))
                        THEN 2 ELSE 3 END)::BIGINT,
             j := j)),
           (a, e) -> CASE WHEN contains(
                            substr(s, 1, (e.j - 1)::INT),
                            substr(s, a.i::INT, (e.j - a.i + 1)::INT))
                     THEN struct_pack(c := a.c, i := a.i, j := e.j)
                     ELSE struct_pack(c := a.c + 1, i := e.j + 1,
                                      j := e.j) END) AS f
  FROM st2)
SELECT event_type, n, length(s)::BIGINT AS n_symbols,
       (f.c + CASE WHEN f.i <= n THEN 1 ELSE 0 END)::BIGINT AS lz_phrases,
       (f.c + CASE WHEN f.i <= n THEN 1 ELSE 0 END)::DOUBLE / n::DOUBLE
         AS c_over_n
FROM st3
"""

ORACLES["page_hinkley_drift"] = f"""
WITH RECURSIVE {_HOURLY_RANKS},
walk AS (
  SELECT event_type, n, 1::BIGINT AS k, m AS s,
         0.0::DOUBLE AS ph, 0.0::DOUBLE AS mn, 0.0::DOUBLE AS alarm
  FROM seq WHERE t = 1 AND n >= 8
  UNION ALL
  -- NOTE: a list_reduce struct-accumulator fold (the
  -- aqe_coalesce_simulator trick) silently corrupts this recurrence
  -- in DuckDB 1.0.0 when the lambda repeats a large subexpression
  -- across struct fields (verified: single step fine, chained fold
  -- reads neighbouring state) — hence the recursive CTE, which reads
  -- the previous row's columns by construction.
  SELECT w.event_type, w.n, w.k + 1, w.s + x.m,
         w.ph + (x.m - (w.s + x.m) / (w.k + 1)::DOUBLE - 5.0),
         least(w.mn,
               w.ph + (x.m - (w.s + x.m) / (w.k + 1)::DOUBLE - 5.0)),
         greatest(w.alarm,
               w.ph + (x.m - (w.s + x.m) / (w.k + 1)::DOUBLE - 5.0)
               - least(w.mn,
                   w.ph + (x.m - (w.s + x.m) / (w.k + 1)::DOUBLE
                           - 5.0)))
  FROM walk w JOIN seq x
    ON x.event_type = w.event_type AND x.t = w.k + 1
  WHERE w.k < w.n)
SELECT event_type, n, ph AS ph_final, alarm AS ph_alarm,
       alarm / n::DOUBLE AS alarm_rate,
       (alarm / n::DOUBLE > 150.0) AS drifted
FROM walk WHERE k = n
"""


_HOURLY_CANDLES = """
cndl0 AS (
  SELECT event_type, floor(floor(epoch(ts))::BIGINT / 3600)::BIGINT AS hr,
         floor(value * 100)::BIGINT AS vq, ts, event_id
  FROM events),
cndl1 AS (
  SELECT event_type, hr, vq,
         row_number() OVER (PARTITION BY event_type, hr
                            ORDER BY ts, event_id) AS ra,
         row_number() OVER (PARTITION BY event_type, hr
                            ORDER BY ts DESC, event_id DESC) AS rd
  FROM cndl0),
candles0 AS (
  SELECT event_type, hr,
         max(CASE WHEN ra = 1 THEN vq END)::BIGINT AS o,
         max(vq)::BIGINT AS h,
         min(vq)::BIGINT AS l,
         max(CASE WHEN rd = 1 THEN vq END)::BIGINT AS c,
         sum(vq)::BIGINT AS s
  FROM cndl1 GROUP BY 1, 2),
candles AS (
  SELECT *,
         row_number() OVER (PARTITION BY event_type ORDER BY hr)::BIGINT
           AS t,
         count(*) OVER (PARTITION BY event_type)::BIGINT AS n
  FROM candles0)"""


def _dyadic_sql(col: str, span: int) -> str:
    """Truncated alpha=1/2 EWMA numerator: exact integer weighted sum
    sum_k 2^(span-1-k) * lag(col, k), matching queries.macd_signal's
    left-associated fold (integers, so association is irrelevant)."""
    w = "OVER (PARTITION BY event_type ORDER BY hr)"
    terms = []
    for k in range(span):
        weight = 1 << (span - 1 - k)
        base = col if k == 0 else f"lag({col}, {k}) {w}"
        terms.append(f"({base}) * {weight}")
    return "(" + " + ".join(terms) + ")"


ORACLES["macd_signal"] = f"""
WITH {_HOURLY_CANDLES},
m1 AS (
  SELECT event_type, hr, t,
         ({_dyadic_sql('s', 8)} * 65535
          - {_dyadic_sql('s', 16)} * 255)::BIGINT AS macd_scaled
  FROM candles),
m2 AS (SELECT * FROM m1 WHERE t >= 16),
m3 AS (
  SELECT event_type, hr, t, macd_scaled,
         ({_dyadic_sql('macd_scaled', 4)})::BIGINT AS signal_scaled
  FROM m2),
m4 AS (SELECT * FROM m3 WHERE t >= 19),
m5 AS (
  SELECT event_type, hr, macd_scaled, signal_scaled,
         (macd_scaled * 15 - signal_scaled)::BIGINT AS hist_scaled,
         lag(macd_scaled * 15 - signal_scaled)
           OVER (PARTITION BY event_type ORDER BY hr)::BIGINT
           AS prev_hist_scaled
  FROM m4)
SELECT event_type, hr,
       macd_scaled::DOUBLE / (1671142500)::DOUBLE AS macd,
       signal_scaled::DOUBLE / (25067137500)::DOUBLE AS macd_sig,
       hist_scaled::DOUBLE / (25067137500)::DOUBLE AS hist,
       (hist_scaled > 0 AND coalesce(prev_hist_scaled <= 0, FALSE))
         AS cross_up,
       (hist_scaled < 0 AND coalesce(prev_hist_scaled >= 0, FALSE))
         AS cross_down
FROM m5
"""

ORACLES["bollinger_breach"] = f"""
WITH {_HOURLY_CANDLES},
b1 AS (
  SELECT event_type, hr, t, s,
         sum(s) OVER (PARTITION BY event_type ORDER BY hr
                      ROWS BETWEEN 15 PRECEDING AND CURRENT ROW)::BIGINT
           AS s_w,
         sum(s * s) OVER (PARTITION BY event_type ORDER BY hr
                      ROWS BETWEEN 15 PRECEDING AND CURRENT ROW)::BIGINT
           AS q_w
  FROM candles),
b2 AS (SELECT * FROM b1 WHERE t >= 16),
b3 AS (
  SELECT event_type, hr,
         s::DOUBLE / (100)::DOUBLE AS sval,
         s_w::DOUBLE / (1600)::DOUBLE AS boll_mean,
         sqrt((16 * q_w - s_w * s_w)::DOUBLE) / (1600)::DOUBLE AS boll_std
  FROM b2)
SELECT event_type, hr, sval, boll_mean, boll_std,
       boll_mean + (2)::DOUBLE * boll_std AS boll_up,
       boll_mean - (2)::DOUBLE * boll_std AS boll_dn,
       (sval > boll_mean + (2)::DOUBLE * boll_std) AS breach_up,
       (sval < boll_mean - (2)::DOUBLE * boll_std) AS breach_dn
FROM b3
"""

ORACLES["atr_cutler"] = f"""
WITH {_HOURLY_CANDLES},
a1 AS (
  SELECT event_type, hr, t, c, h, l,
         lag(c) OVER (PARTITION BY event_type ORDER BY hr)::BIGINT AS pc
  FROM candles),
a2 AS (
  SELECT event_type, hr, t, c,
         greatest(h - l, abs(h - pc), abs(l - pc))::BIGINT AS trq
  FROM a1 WHERE t >= 2),
a3 AS (
  SELECT event_type, hr, t, c, trq,
         sum(trq) OVER (PARTITION BY event_type ORDER BY hr
                      ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)::BIGINT
           AS sum_tr
  FROM a2)
SELECT event_type, hr,
       trq::DOUBLE / (100)::DOUBLE AS tr,
       sum_tr::DOUBLE / (1400)::DOUBLE AS atr,
       (sum_tr * 100)::DOUBLE / nullif(14 * c, 0)::DOUBLE AS natr
FROM a3 WHERE t >= 15
"""

ORACLES["stochastic_oscillator"] = f"""
WITH {_HOURLY_CANDLES},
k1 AS (
  SELECT event_type, hr, t, c,
         max(h) OVER (PARTITION BY event_type ORDER BY hr
                      ROWS BETWEEN 15 PRECEDING AND CURRENT ROW)::BIGINT
           AS hh,
         min(l) OVER (PARTITION BY event_type ORDER BY hr
                      ROWS BETWEEN 15 PRECEDING AND CURRENT ROW)::BIGINT
           AS ll
  FROM candles),
k2 AS (
  SELECT event_type, hr, t,
         (100 * (c - ll))::DOUBLE / nullif(hh - ll, 0)::DOUBLE AS pct_k
  FROM k1 WHERE t >= 16),
k3 AS (
  SELECT event_type, hr, t, pct_k,
         (pct_k
          + lag(pct_k, 1) OVER (PARTITION BY event_type ORDER BY hr)
          + lag(pct_k, 2) OVER (PARTITION BY event_type ORDER BY hr))
           / (3)::DOUBLE AS pct_d
  FROM k2)
SELECT event_type, hr, pct_k, pct_d,
       (pct_k > (80)::DOUBLE) AS overbought,
       (pct_k < (20)::DOUBLE) AS oversold
FROM k3 WHERE t >= 18
"""

ORACLES["aroon_indicator"] = f"""
WITH {_HOURLY_CANDLES},
ar1 AS (
  SELECT event_type, hr, t,
         (max(struct_pack(h := h, th := t))
            OVER (PARTITION BY event_type ORDER BY hr
                  ROWS BETWEEN 15 PRECEDING AND CURRENT ROW)).th
           ::BIGINT AS t_hi,
         (min(struct_pack(l := l, mt := -t))
            OVER (PARTITION BY event_type ORDER BY hr
                  ROWS BETWEEN 15 PRECEDING AND CURRENT ROW)).mt
           ::BIGINT AS neg_t_lo
  FROM candles),
ar2 AS (
  SELECT event_type, hr,
         (100 * (15 - (t - t_hi)))::DOUBLE / (15)::DOUBLE AS aroon_up,
         (100 * (15 - (t + neg_t_lo)))::DOUBLE / (15)::DOUBLE AS aroon_down
  FROM ar1 WHERE t >= 16)
SELECT event_type, hr, aroon_up, aroon_down,
       aroon_up - aroon_down AS aroon_osc
FROM ar2
"""

ORACLES["xmr_western_electric"] = f"""
WITH {_HOURLY_CANDLES},
x1 AS (
  SELECT event_type, hr, t, n, s,
         sum(s) OVER (PARTITION BY event_type)::BIGINT AS sum_s,
         lag(s) OVER (PARTITION BY event_type ORDER BY hr)::BIGINT AS ps
  FROM candles),
x2 AS (
  SELECT event_type, hr, t, n, s, sum_s,
         (CASE WHEN s * n > sum_s THEN 1
               WHEN s * n < sum_s THEN -1 ELSE 0 END)::BIGINT AS side,
         (CASE WHEN ps IS NULL THEN NULL
               WHEN s > ps THEN 1 WHEN s < ps THEN -1
               ELSE 0 END)::BIGINT AS dsgn,
         abs(s - ps)::BIGINT AS mr
  FROM x1),
x3 AS (
  SELECT *,
         t - row_number() OVER (PARTITION BY event_type, side
                                ORDER BY hr) AS isl,
         CASE WHEN dsgn * lag(dsgn) OVER (PARTITION BY event_type
                                          ORDER BY hr) = -1
              THEN 1 ELSE 0 END AS alt
  FROM x2),
x4 AS (
  SELECT *,
         row_number() OVER (PARTITION BY event_type, side, isl
                            ORDER BY hr) AS run_pos,
         sum(dsgn) OVER (PARTITION BY event_type ORDER BY hr
                         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
           ::BIGINT AS d5,
         count(dsgn) OVER (PARTITION BY event_type ORDER BY hr
                         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
           ::BIGINT AS c5,
         sum(alt)
           OVER (PARTITION BY event_type ORDER BY hr
                 ROWS BETWEEN 12 PRECEDING AND CURRENT ROW)
           ::BIGINT AS a13,
         count(*) OVER (PARTITION BY event_type ORDER BY hr
                 ROWS BETWEEN 12 PRECEDING AND CURRENT ROW)
           ::BIGINT AS c13
  FROM x3),
x5 AS (
  SELECT event_type,
         max(n)::BIGINT AS n,
         max(sum_s)::BIGINT AS sum_s,
         sum(mr)::BIGINT AS sum_mr,
         sum(CASE WHEN run_pos >= 9 AND side != 0 THEN 1 ELSE 0 END)
           ::BIGINT AS n_rule2,
         sum(CASE WHEN c5 = 5 AND abs(d5) = 5 THEN 1 ELSE 0 END)
           ::BIGINT AS n_rule3,
         sum(CASE WHEN c13 = 13 AND a13 = 13 THEN 1 ELSE 0 END)
           ::BIGINT AS n_rule4
  FROM x4 GROUP BY 1),
x6 AS (
  SELECT event_type, n, n_rule2, n_rule3, n_rule4, sum_s, sum_mr,
         sum_s::DOUBLE / (n * 100)::DOUBLE AS center,
         sum_mr::DOUBLE / ((n - 1) * 100)::DOUBLE AS mrbar
  FROM x5),
x7 AS (
  SELECT event_type, n, center, mrbar,
         center + (2.66)::DOUBLE * mrbar AS ucl,
         center - (2.66)::DOUBLE * mrbar AS lcl,
         n_rule2, n_rule3, n_rule4
  FROM x6)
SELECT x7.event_type, x7.n, x7.center, x7.mrbar, x7.ucl, x7.lcl,
       (SELECT count(*) FROM x2
        WHERE x2.event_type = x7.event_type
          AND (x2.s::DOUBLE / (100)::DOUBLE > x7.ucl
               OR x2.s::DOUBLE / (100)::DOUBLE < x7.lcl))::BIGINT
         AS n_rule1,
       x7.n_rule2, x7.n_rule3, x7.n_rule4
FROM x7
"""


ORACLES["mood_median_test"] = f"""
WITH {_HOURLY_RANKS},
mood_ranked AS (
  SELECT event_type, m,
         row_number() OVER (ORDER BY m, event_type, hr) AS pos,
         count(*) OVER () AS nn
  FROM seq),
mood_med AS (
  SELECT max(CASE WHEN pos = (nn + 1) // 2 THEN m END) AS med
  FROM mood_ranked),
flagged AS (
  SELECT event_type, (m > med) AS above FROM mood_ranked, mood_med),
cells AS (
  SELECT event_type, above, count(*)::BIGINT AS o
  FROM flagged GROUP BY 1, 2),
staged AS (
  SELECT event_type, above, o,
         sum(o) OVER (PARTITION BY event_type)::BIGINT AS r,
         sum(o) OVER (PARTITION BY above)::BIGINT AS c,
         sum(o) OVER ()::BIGINT AS n
  FROM cells)
SELECT event_type, above, o, r, c, n,
       (n * o - r * c)::BIGINT AS dev,
       ((n * o - r * c)::DOUBLE * (n * o - r * c)::DOUBLE)
         / (r * c * n)::DOUBLE AS chi2_contrib
FROM staged
"""

ORACLES["cochran_q_shifts"] = """
WITH base AS (
  SELECT event_type,
         floor(floor(epoch(ts))::BIGINT / 86400)::BIGINT AS day,
         (floor(floor(epoch(ts))::BIGINT / 28800)::BIGINT % 3)::BIGINT
           AS shift,
         floor(value * 100)::BIGINT AS vq
  FROM events),
totals AS (
  SELECT event_type, day, shift, sum(vq)::BIGINT AS tot
  FROM base GROUP BY 1, 2, 3),
days AS (SELECT DISTINCT event_type, day FROM base),
grid AS (
  SELECT d.event_type, d.day, s.shift
  FROM days d CROSS JOIN
       (SELECT unnest([0, 1, 2])::BIGINT AS shift) s),
filled AS (
  SELECT g.event_type, g.day, g.shift, coalesce(t.tot, 0)::BIGINT AS tot
  FROM grid g LEFT JOIN totals t USING (event_type, day, shift)),
ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY tot, day, shift) AS pos,
         count(*) OVER (PARTITION BY event_type) AS cnt
  FROM filled),
med AS (
  SELECT event_type,
         max(CASE WHEN pos = (cnt + 1) // 2 THEN tot END) AS med
  FROM ranked GROUP BY 1),
x AS (
  SELECT f.event_type, f.day, f.shift,
         (CASE WHEN f.tot > m.med THEN 1 ELSE 0 END)::BIGINT AS x
  FROM filled f JOIN med m USING (event_type)),
pb AS (SELECT event_type, day, sum(x)::BIGINT AS bb FROM x GROUP BY 1, 2),
ps AS (SELECT event_type, shift, sum(x)::BIGINT AS tt FROM x GROUP BY 1, 2),
aggb AS (
  SELECT event_type, count(*)::BIGINT AS n_blocks,
         sum(bb)::BIGINT AS t_total, sum(bb * bb)::BIGINT AS sb2
  FROM pb GROUP BY 1),
aggt AS (
  SELECT event_type, sum(tt * tt)::BIGINT AS st2,
         max(CASE WHEN shift = 0 THEN tt END)::BIGINT AS t_night,
         max(CASE WHEN shift = 1 THEN tt END)::BIGINT AS t_day,
         max(CASE WHEN shift = 2 THEN tt END)::BIGINT AS t_evening
  FROM ps GROUP BY 1)
SELECT aggb.event_type, n_blocks, t_night, t_day, t_evening,
       (2 * (3 * st2 - t_total * t_total))::DOUBLE
         / nullif(3 * t_total - sb2, 0)::DOUBLE AS q_stat
FROM aggb JOIN aggt USING (event_type)
"""

ORACLES["mcnemar_daily_flip"] = """
WITH daily AS (
  SELECT event_type,
         floor(floor(epoch(ts))::BIGINT / 86400)::BIGINT AS day,
         sum(floor(value * 100)::BIGINT)::BIGINT AS sq
  FROM events GROUP BY 1, 2),
ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY sq, day) AS pos,
         count(*) OVER (PARTITION BY event_type) AS cnt
  FROM daily),
med AS (
  SELECT event_type,
         max(CASE WHEN pos = (cnt + 1) // 2 THEN sq END) AS med
  FROM ranked GROUP BY 1),
flags AS (
  SELECT d.event_type, d.day, (d.sq > m.med) AS hi
  FROM daily d JOIN med m USING (event_type)),
pairs AS (
  SELECT e.event_type, e.hi AS hi_early, l.hi AS hi_late
  FROM flags e JOIN flags l
    ON l.event_type = e.event_type AND l.day - 15 = e.day),
agg AS (
  SELECT event_type, count(*)::BIGINT AS n_pairs,
         sum(CASE WHEN hi_early AND NOT hi_late THEN 1 ELSE 0 END)
           ::BIGINT AS b,
         sum(CASE WHEN NOT hi_early AND hi_late THEN 1 ELSE 0 END)
           ::BIGINT AS c
  FROM pairs GROUP BY 1)
SELECT event_type, n_pairs, b, c,
       ((b - c) * (b - c))::DOUBLE / nullif(b + c, 0)::DOUBLE
         AS mcnemar_stat,
       coalesce(((b - c) * (b - c))::DOUBLE / nullif(b + c, 0)::DOUBLE
                > (3.84)::DOUBLE, FALSE) AS flipped
FROM agg
"""

ORACLES["cramers_v_association"] = """
WITH cells AS (
  SELECT event_type,
         ((floor(floor(epoch(ts))::BIGINT / 86400)::BIGINT + 4) % 7)
           ::BIGINT AS dow,
         count(*)::BIGINT AS o
  FROM events GROUP BY 1, 2),
staged AS (
  SELECT event_type, dow, o,
         sum(o) OVER (PARTITION BY event_type)::BIGINT AS r,
         sum(o) OVER (PARTITION BY dow)::BIGINT AS c,
         sum(o) OVER ()::BIGINT AS n
  FROM cells),
terms AS (
  SELECT event_type, dow, n,
         ((n * o - r * c)::DOUBLE * (n * o - r * c)::DOUBLE)
           / (r * c * n)::DOUBLE AS term
  FROM staged),
agg AS (
  SELECT max(n)::BIGINT AS n,
         count(DISTINCT event_type)::BIGINT AS nr,
         count(DISTINCT dow)::BIGINT AS nc,
         list_reduce(list(term ORDER BY event_type, dow),
                     (a, b) -> a + b) AS chi2
  FROM terms)
SELECT n, nr, nc, chi2,
       sqrt(chi2 / (n * least(nr - 1, nc - 1))::DOUBLE) AS cramers_v
FROM agg
"""

ORACLES["adjusted_rand_kmeans"] = f"""
WITH km AS ({_kmeans_embeddings_sql()}),
cont AS (
  SELECT k.cluster, e.label, count(*)::BIGINT AS nij
  FROM km k JOIN embeddings e USING (vec_id) GROUP BY 1, 2),
p AS (
  SELECT sum(nij * (nij - 1))::BIGINT AS p2, sum(nij)::BIGINT AS n
  FROM cont),
a AS (
  SELECT sum(ai * (ai - 1))::BIGINT AS a2
  FROM (SELECT sum(nij)::BIGINT AS ai FROM cont GROUP BY cluster)),
b AS (
  SELECT sum(bj * (bj - 1))::BIGINT AS b2
  FROM (SELECT sum(nij)::BIGINT AS bj FROM cont GROUP BY label))
SELECT n, p2, a2, b2,
       (n * (n - 1) * p2 - a2 * b2)::DOUBLE
         / nullif((n * (n - 1) * (a2 + b2)) // 2 - a2 * b2, 0)::DOUBLE
         AS ari
FROM p, a, b
"""

ORACLES["lb_keogh_pairs"] = f"""
WITH dtwres AS ({_dtw_sql()}),
lkcounts AS (
  SELECT event_type AS series, extract(hour FROM ts)::INT AS h,
         count(*)::BIGINT AS cnt
  FROM events GROUP BY 1, 2),
lkgrid AS (SELECT unnest(generate_series(0, 23)) AS h),
lkprof AS (
  SELECT s.series, list(coalesce(c.cnt, 0) ORDER BY g.h) AS profile
  FROM (SELECT DISTINCT series FROM lkcounts) s
  CROSS JOIN lkgrid g
  LEFT JOIN lkcounts c ON c.series = s.series AND c.h = g.h
  GROUP BY s.series),
lkpairs AS (
  SELECT a.series AS series_a, b.series AS series_b,
         a.profile AS pa, b.profile AS pb
  FROM lkprof a JOIN lkprof b ON a.series < b.series),
lkbound AS (
  SELECT series_a, series_b,
         list_sum(list_transform(generate_series(1, 24), j ->
           greatest(0::BIGINT,
             pa[j] - list_max(pb[greatest(1, j - 6):least(24, j + 6)]),
             list_min(pb[greatest(1, j - 6):least(24, j + 6)]) - pa[j])
         ))::BIGINT AS lb_l1
  FROM lkpairs)
SELECT b.series_a, b.series_b, b.lb_l1, d.dtw_dist,
       b.lb_l1::DOUBLE / nullif(d.dtw_dist, 0)::DOUBLE AS lb_ratio
FROM lkbound b JOIN dtwres d USING (series_a, series_b)
"""

ORACLES["demand_classification"] = """
WITH hourly AS (
  SELECT event_type,
         floor(floor(epoch(ts))::BIGINT / 3600)::BIGINT AS hr,
         count(*)::BIGINT AS cnt
  FROM events GROUP BY 1, 2),
agg AS (
  SELECT event_type,
         (max(hr) - min(hr) + 1)::BIGINT AS span_hours,
         count(*)::BIGINT AS n_demand,
         sum(cnt)::BIGINT AS s_sz,
         sum(cnt * cnt)::BIGINT AS q_sz
  FROM hourly GROUP BY 1)
SELECT event_type, span_hours, n_demand,
       span_hours::DOUBLE / n_demand::DOUBLE AS adi,
       (n_demand * q_sz - s_sz * s_sz)::DOUBLE
         / (s_sz * s_sz)::DOUBLE AS cv2,
       CASE
         WHEN 100 * span_hours < 132 * n_demand
              AND 100 * (n_demand * q_sz - s_sz * s_sz)
                  < 49 * s_sz * s_sz THEN 'smooth'
         WHEN 100 * span_hours < 132 * n_demand THEN 'erratic'
         WHEN 100 * (n_demand * q_sz - s_sz * s_sz)
              < 49 * s_sz * s_sz THEN 'intermittent'
         ELSE 'lumpy' END AS quadrant
FROM agg
"""

ORACLES["backfill_job_planner"] = """
WITH hours AS (
  SELECT DISTINCT event_type,
         floor(floor(epoch(ts))::BIGINT / 3600)::BIGINT AS hr
  FROM events),
gaps AS (
  SELECT event_type,
         (hr + 1)::BIGINT AS gap_start_hr,
         (next_hr - 1)::BIGINT AS gap_end_hr,
         (next_hr - hr - 1)::BIGINT AS n_missing
  FROM (
    SELECT event_type, hr,
           lead(hr) OVER (PARTITION BY event_type ORDER BY hr) AS next_hr
    FROM hours)
  WHERE next_hr - hr > 1),
planned AS (
  SELECT *,
         (sum(n_missing) OVER (PARTITION BY event_type
                               ORDER BY gap_start_hr)
          - n_missing)::BIGINT AS missing_before
  FROM gaps)
SELECT event_type, gap_start_hr, gap_end_hr, n_missing,
       (missing_before // 24)::BIGINT AS batch_id
FROM planned
"""

ORACLES["optimal_two_changepoints"] = f"""
WITH {_HOURLY_CANDLES},
pre AS (
  SELECT event_type, t, n,
         sum(s) OVER (PARTITION BY event_type ORDER BY hr
                      ROWS UNBOUNDED PRECEDING)::BIGINT AS p
  FROM candles),
tot AS (
  SELECT event_type, p AS ptot, n AS nn FROM pre WHERE t = n),
pairs AS (
  SELECT f1.event_type, f1.t AS t1, f2.t AS t2, tt.nn,
         f1.p AS p1, f2.p AS p2, tt.ptot
  FROM pre f1
  JOIN pre f2 ON f2.event_type = f1.event_type AND f2.t > f1.t
  JOIN tot tt ON tt.event_type = f1.event_type AND f2.t < tt.nn),
scored AS (
  SELECT event_type, t1, t2, nn,
         p1 AS a, (p2 - p1) AS b, (ptot - p2) AS c,
         ((p1 * p1) // t1
          + ((p2 - p1) * (p2 - p1)) // (t2 - t1)
          + ((ptot - p2) * (ptot - p2)) // (nn - t2))::BIGINT AS obj_q,
         t1 AS l1, (t2 - t1) AS l2, (nn - t2) AS l3
  FROM pairs),
best AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY obj_q DESC, t1, t2) AS rn
  FROM scored)
SELECT event_type, nn::BIGINT AS n, t1::BIGINT AS t1, t2::BIGINT AS t2,
       obj_q,
       a::DOUBLE / (l1 * 100)::DOUBLE AS seg1_mean,
       b::DOUBLE / (l2 * 100)::DOUBLE AS seg2_mean,
       c::DOUBLE / (l3 * 100)::DOUBLE AS seg3_mean
FROM best WHERE rn = 1
"""

ORACLES["ewma_control_chart"] = f"""
WITH {_HOURLY_CANDLES},
e1 AS (
  SELECT event_type, hr, t, n, s,
         ({_dyadic_sql('s', 16)})::BIGINT AS es,
         sum(s) OVER (PARTITION BY event_type)::BIGINT AS sum_s,
         sum(s * s) OVER (PARTITION BY event_type)::BIGINT AS sum_q
  FROM candles),
e2 AS (SELECT * FROM e1 WHERE t >= 16),
e3 AS (
  SELECT event_type, hr,
         es::DOUBLE / (6553500)::DOUBLE AS ewma,
         sum_s::DOUBLE / (n * 100)::DOUBLE AS center,
         sqrt((n * sum_q - sum_s * sum_s)::DOUBLE)
           / (n * 100)::DOUBLE AS sigma
  FROM e2),
e4 AS (
  SELECT event_type, hr, ewma, center,
         center + (3)::DOUBLE * sigma
           * sqrt((4294967295)::DOUBLE / (12884508675)::DOUBLE) AS ucl,
         center - (3)::DOUBLE * sigma
           * sqrt((4294967295)::DOUBLE / (12884508675)::DOUBLE) AS lcl
  FROM e3)
SELECT event_type, hr, ewma, center, ucl, lcl,
       (ewma > ucl) AS breach_up,
       (ewma < lcl) AS breach_dn
FROM e4
"""

ORACLES["theta_forecast"] = f"""
WITH {_HOURLY_CANDLES},
t1c AS (
  SELECT event_type, t, n, s,
         ({_dyadic_sql('s', 16)})::BIGINT AS es
  FROM candles),
tagg AS (
  SELECT event_type, max(n)::BIGINT AS n,
         max(CASE WHEN t = n THEN es END)::BIGINT AS es_tail,
         sum(s)::BIGINT AS sy, sum(t * s)::BIGINT AS sxy,
         sum(t)::BIGINT AS sx, sum(t * t)::BIGINT AS sxx
  FROM t1c GROUP BY 1 HAVING max(n) >= 16),
tb AS (
  SELECT event_type, n,
         es_tail::DOUBLE / (6553500)::DOUBLE AS ses,
         (n * sxy - sx * sy)::DOUBLE
           / ((n * sxx - sx * sx) * 100)::DOUBLE AS slope_hr
  FROM tagg),
hs AS (
  SELECT tb.*, hh.h FROM tb CROSS JOIN
    (SELECT unnest(generate_series(1, 6))::BIGINT AS h) hh)
SELECT event_type, n, h, ses, slope_hr,
       ses + (slope_hr / (2)::DOUBLE) * (h + 1)::DOUBLE AS theta_fcst
FROM hs
"""

ORACLES["higuchi_lengths_profile"] = f"""
WITH {_HOURLY_CANDLES},
hlag AS (
  SELECT event_type, t, n,
         abs(s - lag(s, 1) OVER w)::BIGINT AS d1,
         abs(s - lag(s, 2) OVER w)::BIGINT AS d2,
         abs(s - lag(s, 4) OVER w)::BIGINT AS d4,
         abs(s - lag(s, 8) OVER w)::BIGINT AS d8
  FROM candles WINDOW w AS (PARTITION BY event_type ORDER BY hr)),
hex AS (
  SELECT event_type, t, n, kk.k,
         CASE kk.k WHEN 1 THEN d1 WHEN 2 THEN d2
                   WHEN 4 THEN d4 ELSE d8 END AS dk
  FROM hlag CROSS JOIN (SELECT unnest([1, 2, 4, 8])::BIGINT AS k) kk),
hoff AS (
  SELECT event_type, n, k, ((t - 1) % k) + 1 AS m, dk
  FROM hex WHERE dk IS NOT NULL),
hper AS (
  SELECT event_type, k, m, sum(dk)::BIGINT AS sm, max(n)::BIGINT AS n
  FROM hoff GROUP BY 1, 2, 3),
hterm AS (
  SELECT event_type, k, m, n,
         (sm * (n - 1))::DOUBLE
           / ((((n - m) // k) * k) * 100)::DOUBLE AS term
  FROM hper),
hfold AS (
  SELECT event_type, k, max(n)::BIGINT AS n,
         list_reduce(list(term ORDER BY m), (a, b) -> a + b) AS lsum
  FROM hterm GROUP BY 1, 2)
SELECT event_type, n, k::BIGINT AS k,
       lsum / (k * k)::DOUBLE AS length_k
FROM hfold
"""

ORACLES["cardinality_explosion"] = """
WITH active AS (
  SELECT DISTINCT event_type, user_id,
         floor(floor(epoch(ts))::BIGINT / 86400)::BIGINT AS day
  FROM events),
fs AS (
  SELECT event_type, user_id, min(day)::BIGINT AS born
  FROM active GROUP BY 1, 2),
da AS (SELECT day, count(*)::BIGINT AS n_active FROM active GROUP BY 1),
bi AS (SELECT born AS day, count(*)::BIGINT AS n_new FROM fs GROUP BY 1),
j AS (
  SELECT da.day, da.n_active, coalesce(bi.n_new, 0)::BIGINT AS n_new
  FROM da LEFT JOIN bi USING (day)),
st AS (
  SELECT *, sum(n_new) OVER (ORDER BY day)::BIGINT AS cum_series FROM j)
SELECT day, n_active, n_new, cum_series,
       n_new::DOUBLE / nullif(cum_series - n_new, 0)::DOUBLE
         AS birth_ratio,
       (5 * n_new > cum_series - n_new) AS explosion
FROM st
"""

ORACLES["goodman_kruskal_gamma"] = """
WITH base AS (
  SELECT floor((floor(epoch(ts))::BIGINT % 86400) / 21600)::BIGINT AS hq,
         floor(value * 100)::BIGINT AS vq
  FROM events),
vc AS (SELECT vq, count(*)::BIGINT AS cnt FROM base GROUP BY 1),
cum AS (
  SELECT vq,
         sum(cnt) OVER (ORDER BY vq)::BIGINT AS cum,
         sum(cnt) OVER ()::BIGINT AS nn
  FROM vc),
th AS (
  SELECT min(CASE WHEN 4 * cum >= nn THEN vq END)::BIGINT AS th1,
         min(CASE WHEN 4 * cum >= 2 * nn THEN vq END)::BIGINT AS th2,
         min(CASE WHEN 4 * cum >= 3 * nn THEN vq END)::BIGINT AS th3
  FROM cum),
bk AS (
  SELECT hq,
         ((vq > th1)::BIGINT + (vq > th2)::BIGINT + (vq > th3)::BIGINT)
           AS vquart
  FROM base, th),
cells AS (SELECT hq, vquart, count(*)::BIGINT AS o FROM bk GROUP BY 1, 2),
agg AS (
  SELECT sum(CASE WHEN b.hq > a.hq AND b.vquart > a.vquart
                  THEN a.o * b.o ELSE 0 END)::BIGINT AS c_pairs,
         sum(CASE WHEN b.hq > a.hq AND b.vquart < a.vquart
                  THEN a.o * b.o ELSE 0 END)::BIGINT AS d_pairs
  FROM cells a CROSS JOIN cells b)
SELECT c_pairs, d_pairs,
       (c_pairs - d_pairs)::DOUBLE
         / nullif(c_pairs + d_pairs, 0)::DOUBLE AS gamma
FROM agg
"""


ORACLES["burstiness_memory"] = """
WITH ev AS (
  SELECT event_type, ts, event_id, floor(epoch(ts))::BIGINT AS es
  FROM events),
gaps AS (
  SELECT event_type, ts, event_id,
         es - lag(es) OVER (PARTITION BY event_type
                            ORDER BY ts, event_id) AS g
  FROM ev),
g2 AS (SELECT * FROM gaps WHERE g IS NOT NULL),
paired AS (
  SELECT event_type, g,
         lag(g) OVER (PARTITION BY event_type ORDER BY ts, event_id)
           AS pg
  FROM g2),
agg AS (
  SELECT event_type, count(*)::BIGINT AS n, sum(g)::BIGINT AS s,
         sum(g * g)::BIGINT AS q, count(pg)::BIGINT AS m,
         sum(CASE WHEN pg IS NOT NULL THEN g END)::BIGINT AS sy,
         sum(CASE WHEN pg IS NOT NULL THEN g * g END)::BIGINT AS syy,
         sum(pg)::BIGINT AS sx, sum(pg * pg)::BIGINT AS sxx,
         sum(pg * g)::BIGINT AS sxy
  FROM paired GROUP BY 1)
SELECT event_type, n,
       s::DOUBLE / n::DOUBLE AS gap_mean_s,
       sqrt((n * q - s * s)::DOUBLE) / n::DOUBLE AS gap_std_s,
       (sqrt((n * q - s * s)::DOUBLE) / n::DOUBLE
          - s::DOUBLE / n::DOUBLE)
         / (sqrt((n * q - s * s)::DOUBLE) / n::DOUBLE
            + s::DOUBLE / n::DOUBLE) AS burstiness,
       (m * sxy - sx * sy)::DOUBLE
         / nullif(sqrt((m * sxx - sx * sx)::DOUBLE)
                  * sqrt((m * syy - sy * sy)::DOUBLE), 0)
         AS memory
FROM agg
"""

ORACLES["decomposition_strengths"] = f"""
WITH {_HOURLY_CANDLES},
dsx AS (
  SELECT event_type, hr, s, (hr % 24)::BIGINT AS phase,
         (CASE WHEN count(*) OVER wc = 25
               THEN sum(s) OVER wc END)::BIGINT AS trend_num
  FROM candles
  WINDOW wc AS (PARTITION BY event_type ORDER BY hr
                ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
df1 AS (SELECT * FROM dsx WHERE trend_num IS NOT NULL),
df2 AS (
  SELECT *,
         sum(25 * s - trend_num)
           OVER (PARTITION BY event_type, phase)::BIGINT AS s_num,
         count(*) OVER (PARTITION BY event_type, phase)::BIGINT AS s_cnt
  FROM df1),
rows0 AS (
  SELECT event_type, hr,
         (s::DOUBLE / (100)::DOUBLE
          - trend_num::DOUBLE / (2500)::DOUBLE
          - s_num::DOUBLE / (s_cnt * 2500)::DOUBLE) AS resid,
         (s::DOUBLE / (100)::DOUBLE
          - s_num::DOUBLE / (s_cnt * 2500)::DOUBLE) AS deseason,
         (s::DOUBLE / (100)::DOUBLE
          - trend_num::DOUBLE / (2500)::DOUBLE) AS detrend
  FROM df2),
folds AS (
  SELECT event_type, count(*)::BIGINT AS n,
         list_reduce(list(resid ORDER BY hr), (a, b) -> a + b) AS sr,
         list_reduce(list(resid * resid ORDER BY hr),
                     (a, b) -> a + b) AS qr,
         list_reduce(list(deseason ORDER BY hr), (a, b) -> a + b) AS ss,
         list_reduce(list(deseason * deseason ORDER BY hr),
                     (a, b) -> a + b) AS qs,
         list_reduce(list(detrend ORDER BY hr), (a, b) -> a + b) AS st,
         list_reduce(list(detrend * detrend ORDER BY hr),
                     (a, b) -> a + b) AS qt
  FROM rows0 GROUP BY 1),
vars0 AS (
  SELECT event_type, n,
         (n::DOUBLE * qr - sr * sr) / (n::DOUBLE * n::DOUBLE) AS vr,
         (n::DOUBLE * qs - ss * ss) / (n::DOUBLE * n::DOUBLE) AS vds,
         (n::DOUBLE * qt - st * st) / (n::DOUBLE * n::DOUBLE) AS vdt
  FROM folds)
SELECT event_type, n, vr AS var_resid,
       greatest((0)::DOUBLE, (1)::DOUBLE - vr / nullif(vds, 0))
         AS trend_strength,
       greatest((0)::DOUBLE, (1)::DOUBLE - vr / nullif(vdt, 0))
         AS seasonal_strength
FROM vars0
"""

ORACLES["walsh_band_energy"] = f"""
WITH {_HOURLY_CANDLES},
wh0 AS MATERIALIZED (
  SELECT event_type, list(s ORDER BY t) AS a, max(n) AS n
  FROM (SELECT * FROM candles WHERE t <= 256) GROUP BY 1
  HAVING max(n) >= 256),
wh1 AS MATERIALIZED (
  SELECT event_type, list_transform(generate_series(0, 255), i ->
    CASE WHEN (i & 1) = 0
         THEN a[(i - (i & 1) + 1)::INT] + a[((i | 1) + 1)::INT]
         ELSE a[(i - (i & 1) + 1)::INT] - a[((i | 1) + 1)::INT]
    END) AS a
  FROM wh0),
wh2 AS MATERIALIZED (
  SELECT event_type, list_transform(generate_series(0, 255), i ->
    CASE WHEN (i & 2) = 0
         THEN a[(i - (i & 2) + 1)::INT] + a[((i | 2) + 1)::INT]
         ELSE a[(i - (i & 2) + 1)::INT] - a[((i | 2) + 1)::INT]
    END) AS a
  FROM wh1),
wh3 AS MATERIALIZED (
  SELECT event_type, list_transform(generate_series(0, 255), i ->
    CASE WHEN (i & 4) = 0
         THEN a[(i - (i & 4) + 1)::INT] + a[((i | 4) + 1)::INT]
         ELSE a[(i - (i & 4) + 1)::INT] - a[((i | 4) + 1)::INT]
    END) AS a
  FROM wh2),
wh4 AS MATERIALIZED (
  SELECT event_type, list_transform(generate_series(0, 255), i ->
    CASE WHEN (i & 8) = 0
         THEN a[(i - (i & 8) + 1)::INT] + a[((i | 8) + 1)::INT]
         ELSE a[(i - (i & 8) + 1)::INT] - a[((i | 8) + 1)::INT]
    END) AS a
  FROM wh3),
wh5 AS MATERIALIZED (
  SELECT event_type, list_transform(generate_series(0, 255), i ->
    CASE WHEN (i & 16) = 0
         THEN a[(i - (i & 16) + 1)::INT] + a[((i | 16) + 1)::INT]
         ELSE a[(i - (i & 16) + 1)::INT] - a[((i | 16) + 1)::INT]
    END) AS a
  FROM wh4),
wh6 AS MATERIALIZED (
  SELECT event_type, list_transform(generate_series(0, 255), i ->
    CASE WHEN (i & 32) = 0
         THEN a[(i - (i & 32) + 1)::INT] + a[((i | 32) + 1)::INT]
         ELSE a[(i - (i & 32) + 1)::INT] - a[((i | 32) + 1)::INT]
    END) AS a
  FROM wh5),
wh7 AS MATERIALIZED (
  SELECT event_type, list_transform(generate_series(0, 255), i ->
    CASE WHEN (i & 64) = 0
         THEN a[(i - (i & 64) + 1)::INT] + a[((i | 64) + 1)::INT]
         ELSE a[(i - (i & 64) + 1)::INT] - a[((i | 64) + 1)::INT]
    END) AS a
  FROM wh6),
wh8 AS MATERIALIZED (
  SELECT event_type, list_transform(generate_series(0, 255), i ->
    CASE WHEN (i & 128) = 0
         THEN a[(i - (i & 128) + 1)::INT] + a[((i | 128) + 1)::INT]
         ELSE a[(i - (i & 128) + 1)::INT] - a[((i | 128) + 1)::INT]
    END) AS a
  FROM wh7),
ex AS (
  SELECT event_type, unnest(a) AS coef,
         generate_subscripts(a, 1) - 1 AS i
  FROM wh8),
banded AS (
  SELECT event_type,
         (CASE WHEN i = 0 THEN 0 WHEN i <= 1 THEN 1 WHEN i <= 3 THEN 2
               WHEN i <= 7 THEN 3 WHEN i <= 15 THEN 4 WHEN i <= 31 THEN 5
               WHEN i <= 63 THEN 6 WHEN i <= 127 THEN 7 ELSE 8 END)
           ::BIGINT AS band,
         (coef * coef)::BIGINT AS e
  FROM ex),
be AS (
  SELECT event_type, band, sum(e)::BIGINT AS energy
  FROM banded GROUP BY 1, 2)
SELECT event_type, band, energy,
       energy::DOUBLE
         / (sum(energy) OVER (PARTITION BY event_type))::BIGINT::DOUBLE
         AS energy_frac
FROM be
"""

ORACLES["yue_pilon_mk"] = f"""
WITH {_HOURLY_CANDLES},
ypl AS (
  SELECT event_type, t, n, s,
         lag(s) OVER (PARTITION BY event_type ORDER BY hr)::BIGINT AS ps
  FROM candles),
ypl2 AS (SELECT * FROM ypl WHERE ps IS NOT NULL),
reg AS (
  SELECT event_type, count(*)::BIGINT AS m,
         sum(ps)::BIGINT AS sx, sum(s)::BIGINT AS sy,
         sum(ps * ps)::BIGINT AS sxx, sum(s * s)::BIGINT AS syy,
         sum(ps * s)::BIGINT AS sxy
  FROM ypl2 GROUP BY 1),
rframe AS (
  SELECT event_type,
         (m * sxy - sx * sy)::DOUBLE
           / nullif(sqrt((m * sxx - sx * sx)::DOUBLE)
                    * sqrt((m * syy - sy * sy)::DOUBLE), 0) AS r1
  FROM reg),
pw AS (
  SELECT l.event_type, l.t, (l.s::DOUBLE - r.r1 * l.ps::DOUBLE) AS y
  FROM ypl2 l JOIN rframe r USING (event_type)),
mk AS (
  SELECT a.event_type,
         sum(CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1
                  ELSE 0 END)::BIGINT AS s_mk
  FROM pw a JOIN pw b
    ON b.event_type = a.event_type AND b.t > a.t
  GROUP BY 1),
nn AS (SELECT event_type, count(*)::BIGINT AS n FROM pw GROUP BY 1)
SELECT mk.event_type, nn.n, rframe.r1, mk.s_mk,
       CASE WHEN mk.s_mk > 0 THEN (mk.s_mk - 1)::DOUBLE
              / sqrt((nn.n * (nn.n - 1) * (2 * nn.n + 5))::DOUBLE
                     / (18)::DOUBLE)
            WHEN mk.s_mk < 0 THEN (mk.s_mk + 1)::DOUBLE
              / sqrt((nn.n * (nn.n - 1) * (2 * nn.n + 5))::DOUBLE
                     / (18)::DOUBLE)
            ELSE (0)::DOUBLE END AS z_mk
FROM mk JOIN nn USING (event_type) JOIN rframe USING (event_type)
"""

ORACLES["interrupted_time_series"] = f"""
WITH {_HOURLY_CANDLES},
its AS (
  SELECT event_type, t, n, s, (t <= (n + 1) // 2) AS pre
  FROM candles),
nrow AS (SELECT event_type, max(n)::BIGINT AS n FROM its GROUP BY 1),
segp AS (
  SELECT event_type, count(*)::BIGINT AS n_pre,
         sum(t)::BIGINT AS sx_pre, sum(s)::BIGINT AS sy_pre,
         sum(t * t)::BIGINT AS sxx_pre, sum(t * s)::BIGINT AS sxy_pre
  FROM its WHERE pre GROUP BY 1),
segq AS (
  SELECT event_type, count(*)::BIGINT AS n_post,
         sum(t)::BIGINT AS sx_post, sum(s)::BIGINT AS sy_post,
         sum(t * t)::BIGINT AS sxx_post, sum(t * s)::BIGINT AS sxy_post
  FROM its WHERE NOT pre GROUP BY 1),
lines AS (
  SELECT nrow.event_type, nrow.n,
         (n_pre * sxy_pre - sx_pre * sy_pre)::DOUBLE
           / ((n_pre * sxx_pre - sx_pre * sx_pre)::DOUBLE
              * (100)::DOUBLE) AS b_pre,
         (sy_pre * sxx_pre - sx_pre * sxy_pre)::DOUBLE
           / ((n_pre * sxx_pre - sx_pre * sx_pre)::DOUBLE
              * (100)::DOUBLE) AS a_pre,
         (n_post * sxy_post - sx_post * sy_post)::DOUBLE
           / ((n_post * sxx_post - sx_post * sx_post)::DOUBLE
              * (100)::DOUBLE) AS b_post,
         (sy_post * sxx_post - sx_post * sxy_post)::DOUBLE
           / ((n_post * sxx_post - sx_post * sx_post)::DOUBLE
              * (100)::DOUBLE) AS a_post
  FROM nrow JOIN segp USING (event_type) JOIN segq USING (event_type))
SELECT event_type, n,
       b_pre AS pre_slope, b_post AS post_slope,
       b_post - b_pre AS slope_change,
       (a_post + b_post * ((n + 1) // 2 + 1)::DOUBLE)
         - (a_pre + b_pre * ((n + 1) // 2 + 1)::DOUBLE) AS level_change
FROM lines
"""

ORACLES["pot_gpd_moments"] = f"""
WITH {_HOURLY_CANDLES},
ranked AS (
  SELECT event_type, hr, s, n,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY s, hr) AS pos
  FROM candles),
u AS (
  SELECT event_type,
         max(CASE WHEN pos = (9 * n) // 10 THEN s END)::BIGINT AS u
  FROM ranked GROUP BY 1),
exc AS (
  SELECT c.event_type, u.u, (c.s - u.u)::BIGINT AS e
  FROM candles c JOIN u USING (event_type)
  WHERE c.s > u.u),
agg AS (
  SELECT event_type, max(u)::BIGINT AS u, count(*)::BIGINT AS n_exc,
         sum(e)::BIGINT AS se, sum(e * e)::BIGINT AS qe
  FROM exc GROUP BY 1)
SELECT event_type,
       u::DOUBLE / (100)::DOUBLE AS threshold,
       n_exc,
       se::DOUBLE / (n_exc * 100)::DOUBLE AS mean_excess,
       (0.5)::DOUBLE * ((1)::DOUBLE
         - (se * se)::DOUBLE
           / nullif(n_exc * qe - se * se, 0)::DOUBLE) AS gpd_xi,
       (0.5)::DOUBLE * (se::DOUBLE / (n_exc * 100)::DOUBLE)
         * ((se * se)::DOUBLE
            / nullif(n_exc * qe - se * se, 0)::DOUBLE + (1)::DOUBLE)
         AS gpd_beta
FROM agg
"""

ORACLES["dod_bucket_profile"] = """
WITH ev AS (
  SELECT event_type, ts, event_id, floor(epoch(ts))::BIGINT AS es
  FROM events),
d1 AS (
  SELECT event_type, ts, event_id,
         es - lag(es) OVER (PARTITION BY event_type
                            ORDER BY ts, event_id) AS delta
  FROM ev),
d2 AS (
  SELECT event_type,
         delta - lag(delta) OVER (PARTITION BY event_type
                                  ORDER BY ts, event_id) AS dod
  FROM d1),
d3 AS (SELECT event_type, dod FROM d2 WHERE dod IS NOT NULL),
classed AS (
  SELECT event_type,
         (CASE WHEN dod = 0 THEN 0
               WHEN dod >= -63 AND dod <= 64 THEN 1
               WHEN dod >= -255 AND dod <= 256 THEN 2
               WHEN dod >= -2047 AND dod <= 2048 THEN 3
               ELSE 4 END)::BIGINT AS cls
  FROM d3),
cb AS (
  SELECT event_type, cls,
         (CASE cls WHEN 0 THEN 1 WHEN 1 THEN 9 WHEN 2 THEN 12
                   WHEN 3 THEN 16 ELSE 68 END)::BIGINT AS bits
  FROM classed),
per_cls AS (
  SELECT event_type, cls, count(*)::BIGINT AS n_tokens,
         sum(bits)::BIGINT AS bits_cls
  FROM cb GROUP BY 1, 2)
SELECT event_type, cls, n_tokens,
       n_tokens::DOUBLE
         / (sum(n_tokens) OVER (PARTITION BY event_type))
             ::BIGINT::DOUBLE AS frac,
       (sum(bits_cls) OVER (PARTITION BY event_type))::BIGINT::DOUBLE
         / (sum(n_tokens) OVER (PARTITION BY event_type))
             ::BIGINT::DOUBLE AS bits_per_sample
FROM per_cls
"""

ORACLES["xor_meaningful_bits"] = """
WITH ev AS (
  SELECT event_type, ts, event_id,
         floor(value * 100)::BIGINT AS vq
  FROM events),
x1 AS (
  SELECT event_type,
         xor(vq, lag(vq) OVER (PARTITION BY event_type
                               ORDER BY ts, event_id)) AS x
  FROM ev),
x2 AS (SELECT event_type, x FROM x1 WHERE x IS NOT NULL),
x3 AS (
  SELECT event_type, x,
         (CASE WHEN x < 0 THEN 64
               ELSE list_sum(list_transform(generate_series(0, 62),
                      k -> CASE WHEN x >= (1::BIGINT << k)
                                THEN 1 ELSE 0 END))
          END)::BIGINT AS width
  FROM x2),
x4 AS (
  SELECT event_type, width, ((width + 7) // 8)::BIGINT AS band,
         (CASE WHEN width = 0 THEN 1 ELSE 14 + width END)::BIGINT AS bits
  FROM x3),
per_band AS (
  SELECT event_type, band, count(*)::BIGINT AS n_xors,
         sum(bits)::BIGINT AS bits_band
  FROM x4 GROUP BY 1, 2)
SELECT event_type, band, n_xors,
       n_xors::DOUBLE
         / (sum(n_xors) OVER (PARTITION BY event_type))
             ::BIGINT::DOUBLE AS frac,
       (sum(bits_band) OVER (PARTITION BY event_type))::BIGINT::DOUBLE
         / (sum(n_xors) OVER (PARTITION BY event_type))
             ::BIGINT::DOUBLE AS bits_per_sample
FROM per_band
"""

ORACLES["rle_compressibility"] = f"""
WITH {_HOURLY_CANDLES},
rrank AS (
  SELECT event_type, hr, s, n,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY s, hr) AS pos
  FROM candles),
rmed AS (
  SELECT event_type,
         max(CASE WHEN pos = (n + 1) // 2 THEN s END)::BIGINT AS med
  FROM rrank GROUP BY 1),
rflags AS (
  SELECT c.event_type, c.hr, c.n,
         (CASE WHEN c.s > m.med THEN 1 ELSE 0 END)::BIGINT AS flag
  FROM candles c JOIN rmed m USING (event_type)),
rruns AS (
  SELECT event_type, n,
         CASE WHEN lag(flag) OVER w IS NULL
                   OR flag != lag(flag) OVER w
              THEN 1 ELSE 0 END AS is_start
  FROM rflags
  WINDOW w AS (PARTITION BY event_type ORDER BY hr)),
ragg AS (
  SELECT event_type, max(n)::BIGINT AS n,
         sum(is_start)::BIGINT AS n_runs
  FROM rruns GROUP BY 1)
SELECT event_type, n, n_runs,
       n::DOUBLE / n_runs::DOUBLE AS avg_run_len,
       (11 * n_runs)::BIGINT AS rle_bits,
       n AS bitmap_bits,
       (11 * n_runs)::DOUBLE / n::DOUBLE AS rle_ratio
FROM ragg
"""


ORACLES["l_moments_profile"] = f"""
WITH {_HOURLY_CANDLES},
lmr AS (
  SELECT event_type, s, n,
         (row_number() OVER (PARTITION BY event_type ORDER BY s, hr)
          - 1)::BIGINT AS i
  FROM candles),
lma AS (
  SELECT event_type, max(n)::BIGINT AS n,
         sum(s)::BIGINT AS s0, sum(i * s)::BIGINT AS s1,
         sum(i * (i - 1) * s)::BIGINT AS s2,
         sum(i * (i - 1) * (i - 2) * s)::BIGINT AS s3
  FROM lmr GROUP BY 1 HAVING max(n) >= 4),
lmb AS (
  SELECT event_type, n,
         (s0 * (n - 1) * (n - 2) * (n - 3))::BIGINT AS b0,
         (s1 * (n - 2) * (n - 3))::BIGINT AS b1,
         (s2 * (n - 3))::BIGINT AS b2,
         s3 AS b3
  FROM lma),
lmc AS (
  SELECT event_type, n, b0,
         (2 * b1 - b0)::BIGINT AS lam2,
         (6 * b2 - 6 * b1 + b0)::BIGINT AS lam3,
         (20 * b3 - 30 * b2 + 12 * b1 - b0)::BIGINT AS lam4
  FROM lmb)
SELECT event_type, n,
       b0::DOUBLE
         / (n * (n - 1) * (n - 2) * (n - 3) * 100)::DOUBLE AS l_loc,
       lam2::DOUBLE
         / (n * (n - 1) * (n - 2) * (n - 3) * 100)::DOUBLE AS l_scale,
       lam3::DOUBLE / nullif(lam2, 0)::DOUBLE AS l_skew,
       lam4::DOUBLE / nullif(lam2, 0)::DOUBLE AS l_kurt
FROM lmc
"""

ORACLES["ar2_yule_walker"] = f"""
WITH {_HOURLY_CANDLES},
a2l AS (
  SELECT event_type, s,
         lag(s, 1) OVER w::BIGINT AS p1,
         lag(s, 2) OVER w::BIGINT AS p2
  FROM candles WINDOW w AS (PARTITION BY event_type ORDER BY hr)),
reg1 AS (
  SELECT event_type, count(*)::BIGINT AS m,
         sum(p1)::BIGINT AS sx, sum(s)::BIGINT AS sy,
         sum(p1 * p1)::BIGINT AS sxx, sum(s * s)::BIGINT AS syy,
         sum(p1 * s)::BIGINT AS sxy
  FROM a2l WHERE p1 IS NOT NULL GROUP BY 1),
reg2 AS (
  SELECT event_type, count(*)::BIGINT AS m,
         sum(p2)::BIGINT AS sx, sum(s)::BIGINT AS sy,
         sum(p2 * p2)::BIGINT AS sxx, sum(s * s)::BIGINT AS syy,
         sum(p2 * s)::BIGINT AS sxy
  FROM a2l WHERE p2 IS NOT NULL GROUP BY 1),
r1f AS (
  SELECT event_type,
         (m * sxy - sx * sy)::DOUBLE
           / nullif(sqrt((m * sxx - sx * sx)::DOUBLE)
                    * sqrt((m * syy - sy * sy)::DOUBLE), 0) AS r1
  FROM reg1),
r2f AS (
  SELECT event_type,
         (m * sxy - sx * sy)::DOUBLE
           / nullif(sqrt((m * sxx - sx * sx)::DOUBLE)
                    * sqrt((m * syy - sy * sy)::DOUBLE), 0) AS r2
  FROM reg2)
SELECT event_type, r1, r2,
       (r1 * ((1)::DOUBLE - r2))
         / nullif((1)::DOUBLE - r1 * r1, 0) AS phi1,
       (r2 - r1 * r1) / nullif((1)::DOUBLE - r1 * r1, 0) AS phi2,
       ((r2 - r1 * r1) / nullif((1)::DOUBLE - r1 * r1, 0)
        < (0)::DOUBLE) AS oscillatory
FROM r1f JOIN r2f USING (event_type)
"""

ORACLES["seasonal_esd_outliers"] = f"""
WITH {_HOURLY_CANDLES},
sstg AS (
  SELECT event_type, hr, s, n, (hr % 24)::BIGINT AS phase
  FROM candles),
srank AS (
  SELECT *,
         row_number() OVER (PARTITION BY event_type, phase
                            ORDER BY s, hr) AS ppos,
         count(*) OVER (PARTITION BY event_type, phase) AS pcnt
  FROM sstg),
spmed AS (
  SELECT event_type, phase,
         max(CASE WHEN ppos = (pcnt + 1) // 2 THEN s END)::BIGINT AS pm
  FROM srank GROUP BY 1, 2),
r0 AS (
  SELECT g.event_type, g.hr, (g.s - m.pm)::BIGINT AS r
  FROM sstg g JOIN spmed m USING (event_type, phase)),
st1 AS (
  SELECT event_type, count(*)::BIGINT AS m, sum(r)::BIGINT AS sr,
         sum(r * r)::BIGINT AS qr
  FROM r0 GROUP BY 1),
b1 AS (
  SELECT * FROM (
    SELECT p.event_type, p.hr, p.r, t.m, t.sr, t.qr,
           abs(t.m * p.r - t.sr)::BIGINT AS dev,
           row_number() OVER (PARTITION BY p.event_type
                              ORDER BY abs(t.m * p.r - t.sr) DESC, p.hr)
             AS rk
    FROM r0 p JOIN st1 t USING (event_type))
  WHERE rk = 1),
r1 AS (
  SELECT p.event_type, p.hr, p.r
  FROM r0 p JOIN b1 b USING (event_type)
  WHERE p.hr != b.hr),
st2 AS (
  SELECT event_type, count(*)::BIGINT AS m, sum(r)::BIGINT AS sr,
         sum(r * r)::BIGINT AS qr
  FROM r1 GROUP BY 1),
b2 AS (
  SELECT * FROM (
    SELECT p.event_type, p.hr, p.r, t.m, t.sr, t.qr,
           abs(t.m * p.r - t.sr)::BIGINT AS dev,
           row_number() OVER (PARTITION BY p.event_type
                              ORDER BY abs(t.m * p.r - t.sr) DESC, p.hr)
             AS rk
    FROM r1 p JOIN st2 t USING (event_type))
  WHERE rk = 1),
r2 AS (
  SELECT p.event_type, p.hr, p.r
  FROM r1 p JOIN b2 b USING (event_type)
  WHERE p.hr != b.hr),
st3 AS (
  SELECT event_type, count(*)::BIGINT AS m, sum(r)::BIGINT AS sr,
         sum(r * r)::BIGINT AS qr
  FROM r2 GROUP BY 1),
b3 AS (
  SELECT * FROM (
    SELECT p.event_type, p.hr, p.r, t.m, t.sr, t.qr,
           abs(t.m * p.r - t.sr)::BIGINT AS dev,
           row_number() OVER (PARTITION BY p.event_type
                              ORDER BY abs(t.m * p.r - t.sr) DESC, p.hr)
             AS rk
    FROM r2 p JOIN st3 t USING (event_type))
  WHERE rk = 1)
SELECT event_type, 1::BIGINT AS round, hr,
       r::DOUBLE / (100)::DOUBLE AS residual,
       dev::DOUBLE / nullif(sqrt((m * qr - sr * sr)::DOUBLE), 0)
         AS deviate
FROM b1
UNION ALL
SELECT event_type, 2::BIGINT AS round, hr,
       r::DOUBLE / (100)::DOUBLE AS residual,
       dev::DOUBLE / nullif(sqrt((m * qr - sr * sr)::DOUBLE), 0)
         AS deviate
FROM b2
UNION ALL
SELECT event_type, 3::BIGINT AS round, hr,
       r::DOUBLE / (100)::DOUBLE AS residual,
       dev::DOUBLE / nullif(sqrt((m * qr - sr * sr)::DOUBLE), 0)
         AS deviate
FROM b3
"""

ORACLES["join_size_estimate_audit"] = """
WITH span AS (
  SELECT min(o_orderkey)::BIGINT AS lo, max(o_orderkey)::BIGINT AS hi
  FROM orders),
ob AS (
  SELECT least(63, ((o_orderkey - lo) * 64) // (hi - lo + 1))::BIGINT
           AS bucket,
         o_orderkey AS k
  FROM orders, span),
lb AS (
  SELECT least(63, ((l_orderkey - lo) * 64) // (hi - lo + 1))::BIGINT
           AS bucket,
         l_orderkey AS k
  FROM lineitem, span),
osb AS (
  SELECT bucket, count(*)::BIGINT AS r1,
         count(DISTINCT k)::BIGINT AS d1
  FROM ob GROUP BY 1),
lsb AS (
  SELECT bucket, count(*)::BIGINT AS r2,
         count(DISTINCT k)::BIGINT AS d2
  FROM lb GROUP BY 1),
okc AS (SELECT bucket, k, count(*)::BIGINT AS c1 FROM ob GROUP BY 1, 2),
lkc AS (SELECT bucket, k, count(*)::BIGINT AS c2 FROM lb GROUP BY 1, 2),
act AS (
  SELECT bucket, sum(c1 * c2)::BIGINT AS actual
  FROM okc JOIN lkc USING (bucket, k) GROUP BY 1),
j AS (
  SELECT osb.bucket, r1, r2,
         ((r1 * r2) // greatest(d1, d2))::BIGINT AS est_rows,
         coalesce(act.actual, 0)::BIGINT AS actual_rows
  FROM osb JOIN lsb USING (bucket) LEFT JOIN act USING (bucket))
SELECT bucket, r1, r2, est_rows, actual_rows,
       (est_rows - actual_rows)::DOUBLE
         / nullif(actual_rows, 0)::DOUBLE AS rel_error
FROM j
"""

ORACLES["zonemap_skip_audit"] = """
WITH zones AS (
  SELECT event_type, (event_id // 256)::BIGINT AS zone,
         min(floor(epoch(ts))::BIGINT)::BIGINT AS zmin,
         max(floor(epoch(ts))::BIGINT)::BIGINT AS zmax
  FROM events GROUP BY 1, 2),
spans AS (
  SELECT event_type, min(zmin)::BIGINT AS lo, max(zmax)::BIGINT AS hi
  FROM zones GROUP BY 1),
probed AS (
  SELECT z.event_type, z.zone, z.zmin, z.zmax,
         (s.lo + ((s.hi - s.lo) * 45) // 100)::BIGINT AS wlo,
         (s.lo + ((s.hi - s.lo) * 55) // 100)::BIGINT AS whi
  FROM zones z JOIN spans s USING (event_type)),
agg AS (
  SELECT event_type, count(*)::BIGINT AS n_zones,
         sum(CASE WHEN zmin <= whi AND zmax >= wlo THEN 1 ELSE 0 END)
           ::BIGINT AS n_hit
  FROM probed GROUP BY 1)
SELECT event_type, n_zones, n_hit,
       (n_zones - n_hit)::BIGINT AS n_skipped,
       (n_zones - n_hit)::DOUBLE / n_zones::DOUBLE AS skip_frac
FROM agg
"""


ORACLES["sprt_conversion"] = f"""
WITH {_HOURLY_CANDLES},
sprank AS (
  SELECT event_type, hr, s, n,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY s, hr) AS pos
  FROM candles),
spmed AS (
  SELECT event_type,
         max(CASE WHEN pos = (n + 1) // 2 THEN s END)::BIGINT AS med
  FROM sprank GROUP BY 1),
spflags AS (
  SELECT c.event_type, c.hr, c.t, c.n,
         CASE WHEN c.s > m.med THEN 1 ELSE 0 END AS x
  FROM candles c JOIN spmed m USING (event_type)),
spcum AS (
  SELECT *,
         sum(x) OVER (PARTITION BY event_type ORDER BY hr)::BIGINT
           AS succ
  FROM spflags),
spllr AS (
  SELECT event_type, t, n,
         succ::DOUBLE * ('0.1823215567939546')::DOUBLE
           + (t - succ)::DOUBLE * ('-0.2231435513142097')::DOUBLE AS llr
  FROM spcum),
spcross AS (
  SELECT event_type, t, n, llr,
         CASE WHEN llr >= ('2.9444389791664403')::DOUBLE THEN t END AS t_h1,
         CASE WHEN llr <= -(('2.9444389791664403')::DOUBLE) THEN t END AS t_h0
  FROM spllr),
spagg AS (
  SELECT event_type, max(n)::BIGINT AS n,
         min(t_h1)::BIGINT AS t_h1, min(t_h0)::BIGINT AS t_h0,
         max(CASE WHEN t = n THEN llr END) AS llr_final
  FROM spcross GROUP BY 1)
SELECT event_type, n,
       CASE WHEN t_h1 IS NOT NULL
                 AND (t_h0 IS NULL OR t_h1 < t_h0) THEN 'accept_h1'
            WHEN t_h0 IS NOT NULL THEN 'accept_h0'
            ELSE 'continue' END AS decision,
       least(t_h1, t_h0)::BIGINT AS t_decision,
       llr_final
FROM spagg
"""

ORACLES["watermark_planner"] = """
WITH late AS (
  SELECT event_type, event_id,
         (max(floor(epoch(ts))::BIGINT)
            OVER (PARTITION BY event_type ORDER BY event_id
                  ROWS UNBOUNDED PRECEDING)
          - floor(epoch(ts))::BIGINT)::BIGINT AS late_s
  FROM events),
wrank AS (
  SELECT event_type, late_s,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY late_s, event_id) AS pos,
         count(*) OVER (PARTITION BY event_type) AS cnt
  FROM late),
picks AS (
  SELECT event_type, max(cnt)::BIGINT AS n,
         sum(CASE WHEN late_s > 0 THEN 1 ELSE 0 END)::BIGINT AS n_late,
         max(CASE WHEN pos = (cnt + 1) // 2 THEN late_s END)::BIGINT
           AS p50_s,
         max(CASE WHEN pos = (19 * cnt) // 20 + 1 THEN late_s END)
           ::BIGINT AS p95_s,
         max(CASE WHEN pos = (99 * cnt) // 100 + 1 THEN late_s END)
           ::BIGINT AS p99_s
  FROM wrank GROUP BY 1),
dropped AS (
  SELECT l.event_type,
         sum(CASE WHEN l.late_s > p.p95_s THEN 1 ELSE 0 END)::BIGINT
           AS n_dropped_p95
  FROM late l JOIN picks p USING (event_type) GROUP BY 1)
SELECT p.event_type, p.n, p.n_late, p.p50_s, p.p95_s, p.p99_s,
       (((p.p99_s + 59) // 60) * 60)::BIGINT AS watermark_s,
       d.n_dropped_p95::DOUBLE / p.n::DOUBLE AS drop_frac_p95
FROM picks p JOIN dropped d USING (event_type)
"""

ORACLES["lead_lag_argmax"] = f"""
WITH {_HOURLY_CANDLES},
lla AS (
  SELECT event_type AS type_a, hr AS hr_a, s AS sa FROM candles),
llb AS (
  SELECT event_type AS type_b, hr AS hr_b, s AS sb FROM candles),
lagged AS (
  SELECT a.type_a, a.hr_a, a.sa, lg.lag
  FROM lla a CROSS JOIN
       (SELECT unnest(generate_series(-6, 6))::BIGINT AS lag) lg),
joined AS (
  SELECT l.type_a, b.type_b, l.lag, l.sa, b.sb
  FROM lagged l JOIN llb b
    ON b.type_b > l.type_a AND b.hr_b = l.hr_a + l.lag),
sums AS (
  SELECT type_a, type_b, lag, count(*)::BIGINT AS m,
         sum(sa)::BIGINT AS sx, sum(sb)::BIGINT AS sy,
         sum(sa * sa)::BIGINT AS sxx, sum(sb * sb)::BIGINT AS syy,
         sum(sa * sb)::BIGINT AS sxy
  FROM joined GROUP BY 1, 2, 3),
scored AS (
  SELECT type_a, type_b, lag,
         (m * sxy - sx * sy)::DOUBLE
           / nullif(sqrt((m * sxx - sx * sx)::DOUBLE)
                    * sqrt((m * syy - sy * sy)::DOUBLE), 0) AS corr
  FROM sums),
sc2 AS (SELECT * FROM scored WHERE corr IS NOT NULL)
SELECT type_a, type_b,
       -((max(struct_pack(c := corr, nl := -lag))).nl)::BIGINT
         AS best_lag,
       (max(struct_pack(c := corr, nl := -lag))).c AS best_corr,
       max(CASE WHEN lag = 0 THEN corr END) AS corr_lag0
FROM sc2 GROUP BY 1, 2
"""


ORACLES["mmr_diverse_topk"] = """
WITH mcodes AS MATERIALIZED (
  SELECT vec_id, label,
         list_transform(embedding,
                        x -> floor(x::DOUBLE * 1000000)::BIGINT) AS q
  FROM embeddings),
mqc AS (
  SELECT list(c ORDER BY pos) AS qv FROM (
    SELECT pos, (sum(v) // count(*))::BIGINT AS c FROM (
      SELECT generate_subscripts(q, 1) AS pos, unnest(q) AS v
      FROM mcodes WHERE label = 0) GROUP BY pos)),
msc AS MATERIALIZED (
  SELECT vec_id, label, q,
         list_sum(list_transform(generate_series(1, 64),
                  j -> q[j] * qv[j]))::BIGINT AS dotq
  FROM mcodes, mqc),
mb1 AS (
  SELECT 1::BIGINT AS round, (-(b.nvid))::BIGINT AS vec_id,
         b.lb AS label, b.dq AS dotq, b.rd AS redundancy,
         b.sc AS score, b.qq AS q
  FROM (SELECT max(struct_pack(sc := dotq, nvid := -vec_id,
                               lb := label, dq := dotq,
                               rd := NULL::BIGINT, qq := q)) AS b
        FROM msc) t),
mr1 AS (SELECT s.* FROM msc s, mb1 WHERE s.vec_id != mb1.vec_id),
mc2 AS (
  SELECT s.vec_id, s.label, s.q, s.dotq,
         list_sum(list_transform(generate_series(1, 64),
                  j -> s.q[j] * mb1.q[j]))::BIGINT AS red
  FROM mr1 s, mb1),
mb2 AS (
  SELECT 2::BIGINT AS round, (-(b.nvid))::BIGINT AS vec_id,
         b.lb AS label, b.dq AS dotq, b.rd AS redundancy,
         b.sc AS score, b.qq AS q
  FROM (SELECT max(struct_pack(sc := dotq - red, nvid := -vec_id,
                               lb := label, dq := dotq, rd := red,
                               qq := q)) AS b
        FROM mc2) t),
mr2 AS (SELECT s.* FROM mr1 s, mb2 WHERE s.vec_id != mb2.vec_id),
mc3 AS (
  SELECT s.vec_id, s.label, s.q, s.dotq,
         greatest(
           list_sum(list_transform(generate_series(1, 64),
                    j -> s.q[j] * mb1.q[j]))::BIGINT,
           list_sum(list_transform(generate_series(1, 64),
                    j -> s.q[j] * mb2.q[j]))::BIGINT) AS red
  FROM mr2 s, mb1, mb2),
mb3 AS (
  SELECT 3::BIGINT AS round, (-(b.nvid))::BIGINT AS vec_id,
         b.lb AS label, b.dq AS dotq, b.rd AS redundancy,
         b.sc AS score, b.qq AS q
  FROM (SELECT max(struct_pack(sc := dotq - red, nvid := -vec_id,
                               lb := label, dq := dotq, rd := red,
                               qq := q)) AS b
        FROM mc3) t)
SELECT round, vec_id, label, dotq, redundancy, score FROM mb1
UNION ALL
SELECT round, vec_id, label, dotq, redundancy, score FROM mb2
UNION ALL
SELECT round, vec_id, label, dotq, redundancy, score FROM mb3
"""

ORACLES["intra_hour_uniformity"] = """
WITH base AS (
  SELECT event_type,
         (floor(epoch(ts))::BIGINT % 3600)::BIGINT AS o,
         event_id
  FROM events),
ranked AS (
  SELECT event_type, o,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY o, event_id)::BIGINT AS i,
         count(*) OVER (PARTITION BY event_type)::BIGINT AS n
  FROM base),
agg AS (
  SELECT event_type, max(n)::BIGINT AS n,
         max(greatest(i * 3600 - n * o, n * o - (i - 1) * 3600))
           ::BIGINT AS d_scaled
  FROM ranked GROUP BY 1)
SELECT event_type, n, d_scaled,
       d_scaled::DOUBLE / (n * 3600)::DOUBLE AS ks_stat,
       (d_scaled::DOUBLE / (n * 3600)::DOUBLE) * sqrt(n::DOUBLE)
         AS ks_scaled,
       ((d_scaled::DOUBLE / (n * 3600)::DOUBLE) * sqrt(n::DOUBLE)
        > ('1.36')::DOUBLE) AS non_uniform
FROM agg
"""

ORACLES["retention_expiry_audit"] = """
WITH base AS (
  SELECT event_type, floor(epoch(ts))::BIGINT AS es FROM events),
now_s AS (
  SELECT event_type, max(es)::BIGINT AS now_s FROM base GROUP BY 1),
tier1m AS (
  SELECT event_type, (es // 60)::BIGINT AS bucket,
         count(*)::BIGINT AS rows
  FROM base GROUP BY 1, 2),
tier1h AS (
  SELECT event_type, (es // 3600)::BIGINT AS bucket,
         count(*)::BIGINT AS rows
  FROM base GROUP BY 1, 2),
a1m AS (
  SELECT t.event_type, '1m' AS tier, count(*)::BIGINT AS n_buckets,
         sum(CASE WHEN t.bucket * 60 < n.now_s - 604800
                  THEN 1 ELSE 0 END)::BIGINT AS n_expired,
         sum(CASE WHEN t.bucket * 60 < n.now_s - 604800
                  THEN t.rows ELSE 0 END)::BIGINT AS rows_expired,
         sum(t.rows)::BIGINT AS rows_total
  FROM tier1m t JOIN now_s n USING (event_type) GROUP BY 1),
a1h AS (
  SELECT t.event_type, '1h' AS tier, count(*)::BIGINT AS n_buckets,
         sum(CASE WHEN t.bucket * 3600 < n.now_s - 2592000
                  THEN 1 ELSE 0 END)::BIGINT AS n_expired,
         sum(CASE WHEN t.bucket * 3600 < n.now_s - 2592000
                  THEN t.rows ELSE 0 END)::BIGINT AS rows_expired,
         sum(t.rows)::BIGINT AS rows_total
  FROM tier1h t JOIN now_s n USING (event_type) GROUP BY 1)
SELECT event_type, tier, n_buckets, n_expired, rows_expired,
       rows_expired::DOUBLE / rows_total::DOUBLE AS reclaim_frac
FROM a1m
UNION ALL
SELECT event_type, tier, n_buckets, n_expired, rows_expired,
       rows_expired::DOUBLE / rows_total::DOUBLE AS reclaim_frac
FROM a1h
"""

ORACLES["climatology_bands"] = """
WITH cells AS (
  SELECT event_type,
         floor(floor(epoch(ts))::BIGINT / 86400)::BIGINT AS day,
         floor((floor(epoch(ts))::BIGINT % 86400) / 3600)::BIGINT AS hod,
         sum(floor(value * 100)::BIGINT)::BIGINT AS tot
  FROM events GROUP BY 1, 2, 3),
ranked AS (
  SELECT event_type, hod, tot,
         row_number() OVER (PARTITION BY event_type, hod
                            ORDER BY tot, day) AS pos,
         count(*) OVER (PARTITION BY event_type, hod) AS cnt
  FROM cells),
agg AS (
  SELECT event_type, hod, max(cnt)::BIGINT AS n_days,
         max(CASE WHEN pos = cnt // 10 + 1 THEN tot END)::BIGINT AS p10q,
         max(CASE WHEN pos = (cnt + 1) // 2 THEN tot END)::BIGINT AS p50q,
         max(CASE WHEN pos = (9 * cnt) // 10 + 1 THEN tot END)::BIGINT
           AS p90q
  FROM ranked GROUP BY 1, 2)
SELECT event_type, hod, n_days,
       p10q::DOUBLE / (100)::DOUBLE AS p10,
       p50q::DOUBLE / (100)::DOUBLE AS p50,
       p90q::DOUBLE / (100)::DOUBLE AS p90,
       (p90q - p10q)::DOUBLE / (100)::DOUBLE AS band_width
FROM agg
"""

ORACLES["partial_correlation_triples"] = f"""
WITH {_HOURLY_CANDLES},
pca AS (SELECT event_type AS ta, hr, s AS sa FROM candles),
pcb AS (SELECT event_type AS tb, hr, s AS sb FROM candles),
psums AS (
  SELECT ta, tb, count(*)::BIGINT AS m,
         sum(sa)::BIGINT AS sx, sum(sb)::BIGINT AS sy,
         sum(sa * sa)::BIGINT AS sxx, sum(sb * sb)::BIGINT AS syy,
         sum(sa * sb)::BIGINT AS sxy
  FROM pca JOIN pcb USING (hr) WHERE ta < tb GROUP BY 1, 2),
pcorr AS (
  SELECT ta, tb,
         (m * sxy - sx * sy)::DOUBLE
           / nullif(sqrt((m * sxx - sx * sx)::DOUBLE)
                    * sqrt((m * syy - sy * sy)::DOUBLE), 0) AS r
  FROM psums),
ptypes AS (SELECT DISTINCT event_type AS tz FROM candles),
ptriples AS (
  SELECT c.ta AS tx, c.tb AS ty, z.tz
  FROM pcorr c CROSS JOIN ptypes z
  WHERE z.tz != c.ta AND z.tz != c.tb),
pj AS (
  SELECT t.tx, t.ty, t.tz,
         cxy.r AS r_xy, cxz.r AS r_xz, cyz.r AS r_yz
  FROM ptriples t
  JOIN pcorr cxy ON cxy.ta = t.tx AND cxy.tb = t.ty
  JOIN pcorr cxz ON cxz.ta = least(t.tx, t.tz)
                AND cxz.tb = greatest(t.tx, t.tz)
  JOIN pcorr cyz ON cyz.ta = least(t.ty, t.tz)
                AND cyz.tb = greatest(t.ty, t.tz))
SELECT tx, ty, tz, r_xy,
       (r_xy - r_xz * r_yz)
         / nullif(sqrt((1)::DOUBLE - r_xz * r_xz)
                  * sqrt((1)::DOUBLE - r_yz * r_yz), 0)
         AS r_xy_given_z,
       (abs((r_xy - r_xz * r_yz)
            / nullif(sqrt((1)::DOUBLE - r_xz * r_xz)
                     * sqrt((1)::DOUBLE - r_yz * r_yz), 0))
        < abs(r_xy)) AS z_explains
FROM pj
"""

ORACLES["tail_dependence_pairs"] = f"""
WITH {_HOURLY_CANDLES},
tdrank AS (
  SELECT event_type, hr, s, n,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY s, hr) AS pos
  FROM candles),
tdu AS (
  SELECT event_type,
         max(CASE WHEN pos = (9 * n) // 10 THEN s END)::BIGINT AS u
  FROM tdrank GROUP BY 1),
tdf AS (
  SELECT c.event_type, c.hr,
         (CASE WHEN c.s > u.u THEN 1 ELSE 0 END)::BIGINT AS exc
  FROM candles c JOIN tdu u USING (event_type)),
tda AS (SELECT event_type AS ta, hr, exc AS ea FROM tdf),
tdb AS (SELECT event_type AS tb, hr, exc AS eb FROM tdf),
tagg AS (
  SELECT ta, tb, count(*)::BIGINT AS n_aligned,
         sum(eb)::BIGINT AS n_b_exc,
         sum(ea * eb)::BIGINT AS n_joint
  FROM tda JOIN tdb USING (hr) WHERE ta < tb GROUP BY 1, 2)
SELECT ta, tb, n_aligned, n_b_exc, n_joint,
       n_joint::DOUBLE / nullif(n_b_exc, 0)::DOUBLE AS chi_u
FROM tagg
"""

ORACLES["poincare_sd"] = f"""
WITH {_HOURLY_CANDLES},
pp AS (
  SELECT event_type, s,
         lead(s) OVER (PARTITION BY event_type ORDER BY hr)::BIGINT AS nx
  FROM candles),
pp2 AS (SELECT * FROM pp WHERE nx IS NOT NULL),
pagg AS (
  SELECT event_type, count(*)::BIGINT AS m,
         sum(s - nx)::BIGINT AS sd_, sum((s - nx) * (s - nx))::BIGINT AS qd,
         sum(s + nx)::BIGINT AS st_, sum((s + nx) * (s + nx))::BIGINT AS qt
  FROM pp2 GROUP BY 1),
psd AS (
  SELECT event_type, m,
         sqrt((m * qd - sd_ * sd_)::DOUBLE)
           / (m::DOUBLE * (100)::DOUBLE * sqrt((2)::DOUBLE)) AS sd1,
         sqrt((m * qt - st_ * st_)::DOUBLE)
           / (m::DOUBLE * (100)::DOUBLE * sqrt((2)::DOUBLE)) AS sd2
  FROM pagg)
SELECT event_type, m AS n_pairs, sd1, sd2,
       sd1 / nullif(sd2, 0) AS sd1_sd2_ratio
FROM psd
"""

ORACLES["rqa_determinism"] = f"""
WITH {_HOURLY_CANDLES},
rqp AS (
  SELECT a.event_type, a.t AS i, b.t AS j,
         (abs(a.s - b.s) < 10) AS rec
  FROM candles a JOIN candles b
    ON b.event_type = a.event_type AND b.t > a.t),
rqr AS (SELECT event_type, i, j FROM rqp WHERE rec),
rqd AS (
  SELECT r.event_type,
         CASE WHEN n.i IS NULL THEN 0 ELSE 1 END AS cont
  FROM rqr r LEFT JOIN rqr n
    ON n.event_type = r.event_type
   AND n.i = r.i + 1 AND n.j = r.j + 1),
rqc AS (
  SELECT event_type, count(*)::BIGINT AS n_pairs,
         sum(CASE WHEN rec THEN 1 ELSE 0 END)::BIGINT AS n_rec
  FROM rqp GROUP BY 1),
rqdet AS (
  SELECT event_type, sum(cont)::BIGINT AS n_diag FROM rqd GROUP BY 1)
SELECT c.event_type, c.n_pairs, c.n_rec,
       coalesce(d.n_diag, 0)::BIGINT AS n_diag,
       c.n_rec::DOUBLE / c.n_pairs::DOUBLE AS recurrence_rate,
       coalesce(d.n_diag, 0)::DOUBLE / nullif(c.n_rec, 0)::DOUBLE
         AS determinism
FROM rqc c LEFT JOIN rqdet d USING (event_type)
"""

ORACLES["spike_triggered_average"] = f"""
WITH {_HOURLY_CANDLES},
strank AS (
  SELECT event_type, hr, s, n,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY s, hr) AS pos
  FROM candles),
stu AS (
  SELECT event_type,
         max(CASE WHEN pos = (9 * n) // 10 THEN s END)::BIGINT AS u
  FROM strank GROUP BY 1),
sttrig AS (
  SELECT c.event_type AS trigger_type, c.hr AS t_hr
  FROM candles c JOIN stu u USING (event_type)
  WHERE c.s > u.u),
stoffs AS (
  SELECT t.*, o.off
  FROM sttrig t CROSS JOIN
       (SELECT unnest(generate_series(-3, 3))::BIGINT AS off) o),
stj AS (
  SELECT o.trigger_type, r.event_type AS response_type, o.off,
         r.s AS rs
  FROM stoffs o JOIN candles r
    ON r.hr = o.t_hr + o.off AND r.event_type != o.trigger_type)
SELECT trigger_type, response_type, off,
       count(*)::BIGINT AS n_obs,
       sum(rs)::BIGINT::DOUBLE / (count(*) * 100)::DOUBLE AS sta_mean
FROM stj GROUP BY 1, 2, 3
"""

ORACLES["hourly_mix_hhi"] = """
WITH cells AS (
  SELECT floor((floor(epoch(ts))::BIGINT % 86400) / 3600)::BIGINT
           AS hod,
         event_type, count(*)::BIGINT AS c
  FROM events GROUP BY 1, 2),
agg AS (
  SELECT hod, count(*)::BIGINT AS n_types, sum(c)::BIGINT AS tot,
         sum(c * c)::BIGINT AS sq
  FROM cells GROUP BY 1)
SELECT hod, n_types, tot,
       sq::DOUBLE / (tot * tot)::DOUBLE AS hhi,
       (tot * tot)::DOUBLE / sq::DOUBLE AS effective_types
FROM agg
"""

ORACLES["kz_smooth"] = """
WITH hourly AS (
  SELECT event_type,
         floor(floor(epoch(ts))::BIGINT / 3600)::BIGINT AS hb,
         sum(floor(value * 100)::BIGINT)::BIGINT AS vsum
  FROM events GROUP BY 1, 2),
p1 AS (
  SELECT event_type, hb, vsum,
         CASE WHEN count(*) OVER w = 5
              THEN sum(vsum) OVER w END::BIGINT AS s1
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY hb
               ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)),
p2 AS (
  SELECT event_type, hb, vsum,
         CASE WHEN count(s1) OVER w = 5
              THEN sum(s1) OVER w END::BIGINT AS s2
  FROM p1
  WINDOW w AS (PARTITION BY event_type ORDER BY hb
               ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)),
p3 AS (
  SELECT event_type, hb, vsum,
         CASE WHEN count(s2) OVER w = 5
              THEN sum(s2) OVER w END::BIGINT AS s3
  FROM p2
  WINDOW w AS (PARTITION BY event_type ORDER BY hb
               ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING))
SELECT event_type, hb, vsum, s3::DOUBLE / 125 AS kz
FROM p3 WHERE s3 IS NOT NULL
"""

ORACLES["ess_autocorr"] = """
WITH base AS (
  SELECT user_id, event_type,
         floor(value * 100)::HUGEINT AS vq,
         lag(floor(value * 100)::HUGEINT, 1) OVER w AS l1,
         lag(floor(value * 100)::HUGEINT, 2) OVER w AS l2,
         lag(floor(value * 100)::HUGEINT, 3) OVER w AS l3
  FROM events
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)),
g AS (
  SELECT user_id, event_type,
         count(*)::HUGEINT AS n,
         sum(vq) AS s, sum(vq * vq) AS q,
         sum(vq * l1) AS sxy1,
         sum(CASE WHEN l1 IS NOT NULL THEN vq END) AS sx1, sum(l1) AS sy1,
         sum(vq * l2) AS sxy2,
         sum(CASE WHEN l2 IS NOT NULL THEN vq END) AS sx2, sum(l2) AS sy2,
         sum(vq * l3) AS sxy3,
         sum(CASE WHEN l3 IS NOT NULL THEN vq END) AS sx3, sum(l3) AS sy3
  FROM base GROUP BY 1, 2),
alg AS (
  SELECT user_id, event_type, n,
         (n*n*q - n*s*s) AS den,
         (n*n*q - n*s*s)
           + 2 * ((n*n*sxy1 - n*s*(sx1+sy1) + (n-1)*s*s)
                + (n*n*sxy2 - n*s*(sx2+sy2) + (n-2)*s*s)
                + (n*n*sxy3 - n*s*(sx3+sy3) + (n-3)*s*s)) AS tau_num
  FROM g)
SELECT user_id, event_type, n::BIGINT AS n_obs,
       CASE WHEN den = 0 THEN NULL
            ELSE tau_num::DOUBLE / den::DOUBLE END AS tau_int,
       CASE WHEN tau_num = 0 THEN NULL
            ELSE (n * den)::DOUBLE / tau_num::DOUBLE END AS ess
FROM alg
"""

ORACLES["siegel_repeated_median"] = """
WITH recent AS (
  SELECT user_id, event_type, epoch_us(ts) AS t_us,
         floor(value * 100)::BIGINT AS vq,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events),
k AS (SELECT * FROM recent WHERE rn <= 24),
pairs AS (
  SELECT a.user_id, a.event_type, a.rn AS r1,
         a.vq - b.vq AS dv,
         a.t_us - b.t_us AS dt_us
  FROM k a JOIN k b
    ON a.user_id = b.user_id AND a.event_type = b.event_type
  WHERE a.rn <> b.rn AND a.t_us <> b.t_us),
sl AS (
  SELECT user_id, event_type, r1, dv, dt_us,
         CAST(dv AS DOUBLE) / CAST(dt_us AS DOUBLE) AS slope
  FROM pairs),
inner_ranked AS (
  SELECT user_id, event_type, r1, slope,
         row_number() OVER (PARTITION BY user_id, event_type, r1
                            ORDER BY slope, dv, dt_us) AS irn,
         count(*) OVER (PARTITION BY user_id, event_type, r1) AS inp
  FROM sl),
inner_med AS (
  SELECT user_id, event_type, r1, slope AS med_i
  FROM inner_ranked WHERE irn = (inp + 1) // 2),
outer_ranked AS (
  SELECT user_id, event_type, med_i, r1,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY med_i, r1) AS orn,
         count(*) OVER (PARTITION BY user_id, event_type) AS n_anchors
  FROM inner_med)
SELECT user_id, event_type, n_anchors::BIGINT AS n_anchors,
       med_i AS slope,
       med_i * CAST('864000000' AS DOUBLE) AS slope_per_day
FROM outer_ranked WHERE orn = (n_anchors + 1) // 2
"""

ORACLES["roc_youden_threshold"] = """
WITH cells AS (
  SELECT event_type, floor(value * 100)::BIGINT AS vq,
         sum(CASE WHEN floor((floor(epoch(ts))::BIGINT % 86400) / 3600)
                       BETWEEN 8 AND 17 THEN 1 ELSE 0 END)::BIGINT AS p_c,
         sum(CASE WHEN floor((floor(epoch(ts))::BIGINT % 86400) / 3600)
                       BETWEEN 8 AND 17 THEN 0 ELSE 1 END)::BIGINT AS n_c
  FROM events GROUP BY 1, 2),
staged AS (
  SELECT event_type, vq, p_c, n_c,
         sum(p_c) OVER w AS tp, sum(n_c) OVER w AS fp,
         sum(p_c) OVER wt AS pos, sum(n_c) OVER wt AS neg
  FROM cells
  WINDOW w AS (PARTITION BY event_type ORDER BY vq DESC),
         wt AS (PARTITION BY event_type)),
scored AS (
  SELECT event_type, vq, tp, fp, pos, neg,
         n_c::HUGEINT * (2 * tp::HUGEINT - p_c::HUGEINT) AS term,
         tp * neg - fp * pos AS j_scaled
  FROM staged),
agg AS (
  SELECT event_type, count(*)::BIGINT AS n_thresholds,
         sum(term) AS auc_num,
         max(pos)::BIGINT AS pos, max(neg)::BIGINT AS neg
  FROM scored GROUP BY 1),
best AS (
  SELECT event_type, vq AS best_vq, tp AS best_tp, fp AS best_fp,
         j_scaled AS best_j_scaled,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY j_scaled DESC, vq ASC) AS rk
  FROM scored)
SELECT a.event_type, a.pos, a.neg, a.n_thresholds,
       CASE WHEN a.pos = 0 OR a.neg = 0 THEN NULL
            ELSE a.auc_num::DOUBLE
                 / (2::HUGEINT * a.pos::HUGEINT * a.neg::HUGEINT)::DOUBLE
       END AS auc,
       b.best_vq,
       CASE WHEN a.pos = 0 THEN NULL
            ELSE b.best_tp::DOUBLE / a.pos::DOUBLE END AS best_tpr,
       CASE WHEN a.neg = 0 THEN NULL
            ELSE b.best_fp::DOUBLE / a.neg::DOUBLE END AS best_fpr,
       CASE WHEN a.pos * a.neg = 0 THEN NULL
            ELSE b.best_j_scaled::DOUBLE / (a.pos * a.neg)::DOUBLE
       END AS best_j
FROM agg a JOIN best b ON a.event_type = b.event_type AND b.rk = 1
"""

ORACLES["cohen_kappa_detectors"] = """
WITH base AS (
  SELECT event_type, event_id::BIGINT AS event_id,
         floor(value * 100)::BIGINT AS vq
  FROM events),
stats AS (
  SELECT event_type, count(*)::HUGEINT AS n,
         sum(vq::HUGEINT) AS s, sum(vq::HUGEINT * vq::HUGEINT) AS q
  FROM base GROUP BY 1),
medr AS (
  SELECT event_type, vq,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY vq, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS cnt
  FROM base),
med AS (SELECT event_type, vq AS med FROM medr WHERE rn = (cnt + 1) // 2),
devs AS (
  SELECT b.event_type, b.event_id, b.vq, abs(b.vq - m.med) AS dev
  FROM base b JOIN med m ON b.event_type = m.event_type),
madr AS (
  SELECT event_type, dev,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY dev, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS cnt
  FROM devs),
mad AS (SELECT event_type, dev AS mad FROM madr WHERE rn = (cnt + 1) // 2),
flagged AS (
  SELECT d.event_type,
         ((d.vq::HUGEINT * st.n - st.s) * (d.vq::HUGEINT * st.n - st.s)
            > 4 * (st.n * st.q - st.s * st.s)) AS af,
         (d.dev > 4 * m.mad) AS bf
  FROM devs d
  JOIN mad m ON d.event_type = m.event_type
  JOIN stats st ON d.event_type = st.event_type),
conf AS (
  SELECT event_type,
         sum(CASE WHEN af AND bf THEN 1 ELSE 0 END)::BIGINT AS a,
         sum(CASE WHEN af AND NOT bf THEN 1 ELSE 0 END)::BIGINT AS b,
         sum(CASE WHEN NOT af AND bf THEN 1 ELSE 0 END)::BIGINT AS c,
         sum(CASE WHEN NOT af AND NOT bf THEN 1 ELSE 0 END)::BIGINT AS d
  FROM flagged GROUP BY 1)
SELECT event_type, (a + b + c + d)::BIGINT AS n_obs, a, b, c, d,
       CASE WHEN (a+b+c+d)::HUGEINT * (a+b+c+d)::HUGEINT
                 - ((a+b)::HUGEINT*(a+c)::HUGEINT
                    + (c+d)::HUGEINT*(b+d)::HUGEINT) = 0 THEN NULL
            ELSE ((a+b+c+d)::HUGEINT * (a+d)::HUGEINT
                  - ((a+b)::HUGEINT*(a+c)::HUGEINT
                     + (c+d)::HUGEINT*(b+d)::HUGEINT))::DOUBLE
                 / ((a+b+c+d)::HUGEINT * (a+b+c+d)::HUGEINT
                    - ((a+b)::HUGEINT*(a+c)::HUGEINT
                       + (c+d)::HUGEINT*(b+d)::HUGEINT))::DOUBLE
       END AS kappa,
       CASE WHEN a + b + c + d = 0 THEN NULL
            ELSE (a + d)::DOUBLE / (a + b + c + d)::DOUBLE
       END AS agree_rate
FROM conf
"""

ORACLES["bh_fdr_alerts"] = """
WITH base AS (
  SELECT user_id, event_type, floor(epoch(ts))::BIGINT AS es,
         floor(value * 100)::HUGEINT AS vq
  FROM events),
spans AS (
  SELECT user_id, event_type,
         floor((min(es) + max(es)) / 2)::BIGINT AS mid
  FROM base GROUP BY 1, 2),
g AS (
  SELECT b.user_id, b.event_type,
         sum(CASE WHEN b.es <= sp.mid THEN 1 ELSE 0 END)::HUGEINT AS n1,
         sum(CASE WHEN b.es <= sp.mid THEN b.vq END) AS s1,
         sum(CASE WHEN b.es <= sp.mid THEN b.vq * b.vq END) AS q1,
         sum(CASE WHEN b.es > sp.mid THEN 1 ELSE 0 END)::HUGEINT AS n2,
         sum(CASE WHEN b.es > sp.mid THEN b.vq END) AS s2,
         sum(CASE WHEN b.es > sp.mid THEN b.vq * b.vq END) AS q2
  FROM base b
  JOIN spans sp ON b.user_id = sp.user_id AND b.event_type = sp.event_type
  GROUP BY 1, 2
  HAVING n1 > 0 AND n2 > 0 AND n1 + n2 >= 3),
alg AS (
  SELECT user_id, event_type, n1, n2,
         (s1*n2 - s2*n1) * (s1*n2 - s2*n1) * (n1 + n2 - 2) AS zn,
         (n1*n2*(q1+q2) - n2*s1*s1 - n1*s2*s2) * (n1 + n2) AS zd
  FROM g),
staged AS (
  SELECT user_id, event_type, n1::BIGINT AS n_early, n2::BIGINT AS n_late,
         zn, zd,
         CASE WHEN zn = 0 THEN 1.0
              ELSE least(1.0, zd::DOUBLE / zn::DOUBLE) END AS p_bound
  FROM alg),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY p_bound, user_id, event_type) AS k,
         count(*) OVER () AS m_tests
  FROM staged),
flagged AS (
  SELECT user_id, event_type, n_early, n_late, p_bound, k, m_tests,
         CASE WHEN zn > 0 AND zd * 20 * m_tests <= zn * k
              THEN k END AS k_ok
  FROM ranked)
SELECT user_id, event_type, n_early, n_late, p_bound,
       k::BIGINT AS bh_rank, m_tests::BIGINT AS m_tests,
       (k <= coalesce(max(k_ok) OVER (), 0)) AS significant
FROM flagged
"""

ORACLES["tail_expected_shortfall"] = """
WITH ranked AS (
  SELECT event_type, floor(value * 100)::BIGINT AS vq,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY floor(value * 100)::BIGINT,
                                     event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events),
staged AS (
  SELECT event_type, vq, rn, n,
         (19 * n + 19) // 20 AS k95,
         (99 * n + 99) // 100 AS k99
  FROM ranked)
SELECT event_type, max(n)::BIGINT AS n,
       max(CASE WHEN rn = k95 THEN vq END)::BIGINT AS var95,
       sum(CASE WHEN rn >= k95 THEN 1 ELSE 0 END)::BIGINT AS t95_n,
       CASE WHEN sum(CASE WHEN rn >= k95 THEN 1 ELSE 0 END) = 0 THEN NULL
            ELSE sum(CASE WHEN rn >= k95 THEN vq END)::BIGINT::DOUBLE
                 / sum(CASE WHEN rn >= k95 THEN 1 ELSE 0 END)::BIGINT::DOUBLE
       END AS es95,
       max(CASE WHEN rn = k99 THEN vq END)::BIGINT AS var99,
       sum(CASE WHEN rn >= k99 THEN 1 ELSE 0 END)::BIGINT AS t99_n,
       CASE WHEN sum(CASE WHEN rn >= k99 THEN 1 ELSE 0 END) = 0 THEN NULL
            ELSE sum(CASE WHEN rn >= k99 THEN vq END)::BIGINT::DOUBLE
                 / sum(CASE WHEN rn >= k99 THEN 1 ELSE 0 END)::BIGINT::DOUBLE
       END AS es99
FROM staged GROUP BY event_type
"""

ORACLES["median_of_means"] = """
WITH base AS (
  SELECT user_id, event_type, floor(value * 100)::BIGINT AS vq,
         (row_number() OVER (PARTITION BY user_id, event_type
                             ORDER BY ts, event_id) - 1) % 8 AS blk
  FROM events),
blocks AS (
  SELECT user_id, event_type, blk,
         sum(vq)::BIGINT AS bs, count(*)::BIGINT AS bn
  FROM base GROUP BY 1, 2, 3),
means AS (
  SELECT user_id, event_type, blk, bs, bn,
         bs::DOUBLE / bn::DOUBLE AS bmean
  FROM blocks),
ranked AS (
  SELECT user_id, event_type, bmean,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY bmean, blk) AS rn,
         count(*) OVER (PARTITION BY user_id, event_type) AS nb,
         sum(bs) OVER (PARTITION BY user_id, event_type) AS s_tot,
         sum(bn) OVER (PARTITION BY user_id, event_type) AS n_tot
  FROM means)
SELECT user_id, event_type, n_tot::BIGINT AS n_obs, nb::BIGINT AS n_blocks,
       bmean AS mom,
       s_tot::DOUBLE / n_tot::DOUBLE AS plain_mean
FROM ranked WHERE rn = (nb + 1) // 2
"""

ORACLES["did_estimator"] = """
WITH base AS (
  SELECT event_type, floor(epoch(ts))::BIGINT AS es,
         floor(value * 100)::HUGEINT AS vq,
         (user_id % 2 = 0) AS treated
  FROM events),
spans AS (
  SELECT event_type, floor((min(es) + max(es)) / 2)::BIGINT AS mid
  FROM base GROUP BY 1),
g AS (
  SELECT b.event_type,
         sum(CASE WHEN b.treated AND b.es <= sp.mid THEN 1 ELSE 0 END)::HUGEINT AS n_t1,
         sum(CASE WHEN b.treated AND b.es <= sp.mid THEN b.vq END) AS s_t1,
         sum(CASE WHEN b.treated AND b.es > sp.mid THEN 1 ELSE 0 END)::HUGEINT AS n_t2,
         sum(CASE WHEN b.treated AND b.es > sp.mid THEN b.vq END) AS s_t2,
         sum(CASE WHEN NOT b.treated AND b.es <= sp.mid THEN 1 ELSE 0 END)::HUGEINT AS n_c1,
         sum(CASE WHEN NOT b.treated AND b.es <= sp.mid THEN b.vq END) AS s_c1,
         sum(CASE WHEN NOT b.treated AND b.es > sp.mid THEN 1 ELSE 0 END)::HUGEINT AS n_c2,
         sum(CASE WHEN NOT b.treated AND b.es > sp.mid THEN b.vq END) AS s_c2
  FROM base b JOIN spans sp ON b.event_type = sp.event_type
  GROUP BY 1)
SELECT event_type,
       n_t1::BIGINT AS n_t1, n_t2::BIGINT AS n_t2,
       n_c1::BIGINT AS n_c1, n_c2::BIGINT AS n_c2,
       CASE WHEN n_t1 = 0 THEN NULL ELSE s_t1::DOUBLE / n_t1::DOUBLE END AS mean_t1,
       CASE WHEN n_t2 = 0 THEN NULL ELSE s_t2::DOUBLE / n_t2::DOUBLE END AS mean_t2,
       CASE WHEN n_c1 = 0 THEN NULL ELSE s_c1::DOUBLE / n_c1::DOUBLE END AS mean_c1,
       CASE WHEN n_c2 = 0 THEN NULL ELSE s_c2::DOUBLE / n_c2::DOUBLE END AS mean_c2,
       CASE WHEN n_t1 * n_t2 * n_c1 * n_c2 = 0 THEN NULL
            ELSE (s_t2 * n_t1 * n_c1 * n_c2
                  - s_t1 * n_t2 * n_c1 * n_c2
                  - s_c2 * n_t1 * n_t2 * n_c1
                  + s_c1 * n_t1 * n_t2 * n_c2)::DOUBLE
                 / (n_t1 * n_t2 * n_c1 * n_c2)::DOUBLE
       END AS did
FROM g
"""

ORACLES["pfor_pack_profile"] = """
WITH staged AS (
  SELECT user_id, event_type, row_number() OVER w AS rn,
         floor(value * 100)::BIGINT
           - lag(floor(value * 100)::BIGINT) OVER w AS d
  FROM events
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)),
zz AS (
  SELECT user_id, event_type, (rn - 2) // 16 AS blk,
         CASE WHEN d >= 0 THEN 2 * d ELSE -2 * d - 1 END AS z
  FROM staged WHERE d IS NOT NULL),
blocks AS (
  SELECT user_id, event_type, blk, count(*)::BIGINT AS cnt,
         max(z)::BIGINT AS zmax
  FROM zz GROUP BY 1, 2, 3),
wb AS (
  SELECT user_id, event_type, cnt,
         CASE WHEN zmax <= 1 THEN 1 WHEN zmax < 4 THEN 2
              WHEN zmax < 8 THEN 3 WHEN zmax < 16 THEN 4
              WHEN zmax < 32 THEN 5 WHEN zmax < 64 THEN 6
              WHEN zmax < 128 THEN 7 WHEN zmax < 256 THEN 8
              WHEN zmax < 1024 THEN 10 WHEN zmax < 4096 THEN 12
              WHEN zmax < 32768 THEN 15 WHEN zmax < 1048576 THEN 20
              WHEN zmax < 1073741824 THEN 30 ELSE 60 END::BIGINT AS width
  FROM blocks),
wb2 AS (
  SELECT user_id, event_type, cnt, width,
         (cnt + (60 // width) - 1) // (60 // width) AS words_blk
  FROM wb)
SELECT user_id, event_type,
       sum(cnt)::BIGINT AS n_deltas,
       count(*)::BIGINT AS n_blocks,
       sum(words_blk)::BIGINT AS words,
       max(width)::BIGINT AS max_width,
       (sum(words_blk) * 64)::BIGINT AS packed_bits,
       (sum(words_blk) * 64)::DOUBLE / sum(cnt)::DOUBLE AS bits_per_point,
       (sum(cnt) * 64)::DOUBLE / (sum(words_blk) * 64)::DOUBLE
         AS compression_ratio
FROM wb2 GROUP BY 1, 2
"""

ORACLES["age_of_information"] = """
WITH staged AS (
  SELECT user_id, event_type, floor(epoch(ts))::BIGINT AS es,
         floor(epoch(ts))::BIGINT - lag(floor(epoch(ts))::BIGINT) OVER w
           AS gap
  FROM events
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY
               floor(epoch(ts))::BIGINT, event_id)),
g AS (
  SELECT user_id, event_type, count(*)::BIGINT AS n_obs,
         sum(CASE WHEN gap IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_gaps,
         sum(gap::HUGEINT * gap::HUGEINT) AS sq,
         (max(es) - min(es))::BIGINT AS span_s,
         max(gap)::BIGINT AS aoi_peak_s
  FROM staged GROUP BY 1, 2)
SELECT user_id, event_type, n_obs, span_s, aoi_peak_s,
       CASE WHEN span_s = 0 THEN NULL
            ELSE sq::DOUBLE / (2::HUGEINT * span_s::HUGEINT)::DOUBLE
       END AS aoi_avg_s
FROM g WHERE n_gaps >= 1
"""

ORACLES["abc_classification"] = """
WITH mass AS (
  SELECT event_type, user_id, sum(floor(value * 100)::BIGINT)::BIGINT AS m
  FROM events GROUP BY 1, 2),
staged AS (
  SELECT event_type, user_id, m,
         sum(m) OVER (PARTITION BY event_type
                      ORDER BY m DESC, user_id ASC) AS cum,
         sum(m) OVER (PARTITION BY event_type) AS tot
  FROM mass),
classed AS (
  SELECT event_type,
         CASE WHEN 5 * cum <= 4 * tot THEN 'A'
              WHEN 20 * cum <= 19 * tot THEN 'B'
              ELSE 'C' END AS abc,
         m, tot
  FROM staged)
SELECT event_type, abc, count(*)::BIGINT AS n_users,
       sum(m)::BIGINT AS class_mass,
       CASE WHEN max(tot) = 0 THEN NULL
            ELSE sum(m)::BIGINT::DOUBLE / max(tot)::DOUBLE
       END AS mass_share
FROM classed GROUP BY 1, 2
"""

def _markov_sql(iters: int = 5) -> str:
    steps = []
    for i in range(iters):
        steps.append(f"""v{i + 1} AS (
  SELECT s.state,
         (coalesce(c.s, 0)
          + CASE WHEN o.frm IS NULL THEN v.v ELSE 0 END)::HUGEINT AS v
  FROM states s
  JOIN v{i} v ON v.state = s.state
  LEFT JOIN outdeg o ON o.frm = s.state
  LEFT JOIN (
    SELECT e.dst, sum((v.v * e.c) // e.r)::HUGEINT AS s
    FROM e JOIN v{i} v ON v.state = e.frm GROUP BY e.dst
  ) c ON c.dst = s.state)""")
    chain = ",\n".join(steps)
    return f"""
WITH pairs AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS frm,
         event_type AS dst
  FROM events),
trans AS (
  SELECT frm, dst, count(*)::HUGEINT AS c
  FROM pairs WHERE frm IS NOT NULL GROUP BY 1, 2),
outdeg AS (SELECT frm, sum(c)::HUGEINT AS r FROM trans GROUP BY 1),
e AS (SELECT t.frm, t.dst, t.c, o.r FROM trans t JOIN outdeg o USING (frm)),
states AS (SELECT DISTINCT event_type AS state FROM events),
v0 AS (SELECT state, 1000000000000::HUGEINT AS v FROM states),
{chain},
tot AS (SELECT sum(v)::HUGEINT AS t FROM v{iters})
SELECT state, v::BIGINT AS mass_scaled,
       CASE WHEN tot.t = 0 THEN NULL
            ELSE v::DOUBLE / tot.t::DOUBLE END AS stationary_share
FROM v{iters}, tot
"""

ORACLES["markov_stationary"] = _markov_sql()

def _cov_mode_sql(iters: int = 5) -> str:
    steps = []
    for i in range(iters):
        steps.append(f"""f{i + 1} AS (
  SELECT m.i AS state,
         list_reduce(list(m.mij * v.v ORDER BY m.j), (p, q) -> p + q) AS mv
  FROM m JOIN v{i} v ON v.state = m.j GROUP BY m.i),
r{i + 1} AS (
  SELECT state, mv,
         row_number() OVER (ORDER BY abs(mv) DESC, state ASC) AS rk
  FROM f{i + 1}),
v{i + 1} AS (
  SELECT state, mv / (SELECT abs(mv) FROM r{i + 1} WHERE rk = 1) AS v
  FROM r{i + 1})""")
    chain = ",\n".join(steps)
    return f"""
WITH hourly AS (
  SELECT event_type AS t,
         floor(floor(epoch(ts))::BIGINT / 3600)::BIGINT AS hb,
         sum(floor(value * 100)::BIGINT)::BIGINT AS v
  FROM events GROUP BY 1, 2),
pairs AS (
  SELECT a.t AS i, b.t AS j, count(*)::HUGEINT AS n,
         sum(a.v::HUGEINT) AS sx, sum(b.v::HUGEINT) AS sy,
         sum(a.v::HUGEINT * b.v::HUGEINT) AS sxy
  FROM hourly a JOIN hourly b USING (hb)
  GROUP BY 1, 2),
m AS (
  SELECT i, j,
         CASE WHEN n = 0 THEN NULL
              ELSE (n * sxy - sx * sy)::DOUBLE / (n * n)::DOUBLE
         END AS mij
  FROM pairs),
states AS (SELECT DISTINCT t AS state FROM hourly),
v0 AS (SELECT state, 1.0::DOUBLE AS v FROM states),
{chain}
SELECT state, v AS loading FROM v{iters}
"""

ORACLES["covariance_dominant_mode"] = _cov_mode_sql()

ORACLES["var1_coupling"] = """
WITH hourly AS (
  SELECT event_type AS t,
         floor(floor(epoch(ts))::BIGINT / 3600)::BIGINT AS hb,
         count(*)::BIGINT AS c
  FROM events GROUP BY 1, 2),
rows_ AS (
  SELECT ci.t AS ti, cj.t AS tj,
         li.c::HUGEINT AS u, lj.c::HUGEINT AS w,
         ci.c::HUGEINT AS p, cj.c::HUGEINT AS q
  FROM hourly ci
  JOIN hourly cj ON cj.hb = ci.hb AND ci.t < cj.t
  JOIN hourly li ON li.t = ci.t AND li.hb = ci.hb - 1
  JOIN hourly lj ON lj.t = cj.t AND lj.hb = ci.hb - 1),
g AS (
  SELECT ti, tj, count(*)::HUGEINT AS n,
         sum(u) AS su, sum(w) AS sw, sum(p) AS sp, sum(q) AS sq,
         sum(u*u) AS suu, sum(w*w) AS sww, sum(u*w) AS suw,
         sum(u*p) AS sup, sum(w*p) AS swp,
         sum(u*q) AS suq, sum(w*q) AS swq
  FROM rows_ GROUP BY 1, 2),
m AS (
  SELECT ti, tj, n::BIGINT AS n_hours,
         (n*suu - su*su) AS cuu, (n*sww - sw*sw) AS cww,
         (n*suw - su*sw) AS cuw,
         (n*sup - su*sp) AS cup, (n*swp - sw*sp) AS cwp,
         (n*suq - su*sq) AS cuq, (n*swq - sw*sq) AS cwq
  FROM g),
m2 AS (
  SELECT ti, tj, n_hours,
         (cuu*cww - cuw*cuw) AS d,
         (cww*cup - cuw*cwp) AS n11,
         (cuu*cwp - cuw*cup) AS n12,
         (cww*cuq - cuw*cwq) AS n21,
         (cuu*cwq - cuw*cuq) AS n22,
         (cup*cwq - cuq*cwp) AS ndet
  FROM m)
SELECT ti, tj, n_hours,
       CASE WHEN d > 0 THEN n11::DOUBLE / d::DOUBLE END AS a11,
       CASE WHEN d > 0 THEN n12::DOUBLE / d::DOUBLE END AS a12,
       CASE WHEN d > 0 THEN n21::DOUBLE / d::DOUBLE END AS a21,
       CASE WHEN d > 0 THEN n22::DOUBLE / d::DOUBLE END AS a22,
       CASE WHEN d > 0 THEN (n11 + n22)::DOUBLE / d::DOUBLE END AS trace_a,
       CASE WHEN d > 0 THEN ndet::DOUBLE / d::DOUBLE END AS det_a,
       CASE WHEN d > 0 THEN (abs(ndet) < d
                             AND d - (n11 + n22) + ndet > 0
                             AND d + (n11 + n22) + ndet > 0) END AS stable
FROM m2 ORDER BY ti, tj
"""

ORACLES["cuped_adjustment"] = """
WITH base AS (
  SELECT floor(epoch(ts))::BIGINT AS es, user_id AS uid,
         (user_id % 2 = 0) AS treated
  FROM events),
span AS (SELECT floor((min(es) + max(es)) / 2)::BIGINT AS mid FROM base),
per_user AS (
  SELECT uid, treated,
         sum(CASE WHEN es <= mid THEN 1 ELSE 0 END)::BIGINT AS x,
         sum(CASE WHEN es > mid THEN 1 ELSE 0 END)::BIGINT AS y
  FROM base, span GROUP BY 1, 2),
pooled AS (
  SELECT count(*)::HUGEINT AS n,
         sum(x::HUGEINT) AS sx, sum(y::HUGEINT) AS sy,
         sum(x::HUGEINT * x::HUGEINT) AS sxx,
         sum(x::HUGEINT * y::HUGEINT) AS sxy,
         sum(y::HUGEINT * y::HUGEINT) AS syy
  FROM per_user),
stats AS (
  SELECT CASE WHEN (n*sxx - sx*sx) > 0
              THEN (n*sxy - sx*sy)::DOUBLE / (n*sxx - sx*sx)::DOUBLE END
           AS theta,
         CASE WHEN (n*sxx - sx*sx) > 0 AND (n*syy - sy*sy) > 0
              THEN ((n*sxy - sx*sy) * (n*sxy - sx*sy))::DOUBLE
                   / ((n*sxx - sx*sx) * (n*syy - sy*sy))::DOUBLE END
           AS rho2,
         sx::DOUBLE / n::DOUBLE AS mean_x_all
  FROM pooled),
arms AS (
  SELECT treated, count(*)::BIGINT AS n_users,
         sum(x::HUGEINT) AS gsx, sum(y::HUGEINT) AS gsy
  FROM per_user GROUP BY 1)
SELECT treated, n_users,
       gsy::DOUBLE / n_users::DOUBLE AS mean_y,
       gsy::DOUBLE / n_users::DOUBLE
         - theta * (gsx::DOUBLE / n_users::DOUBLE - mean_x_all)
         AS adj_mean_y,
       theta, rho2
FROM arms, stats ORDER BY treated
"""

ORACLES["pareto_skyline"] = """
WITH per_user AS (
  SELECT user_id, count(*)::BIGINT AS n_events,
         sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT
           AS n_errors
  FROM events GROUP BY 1)
SELECT user_id, n_events, n_errors
FROM per_user s
WHERE NOT EXISTS (
  SELECT 1 FROM per_user o
  WHERE o.n_events >= s.n_events AND o.n_errors <= s.n_errors
    AND (o.n_events > s.n_events OR o.n_errors < s.n_errors))
ORDER BY user_id
"""

ORACLES["zorder_layout_audit"] = """
WITH base AS (
  SELECT event_id, (user_id % 16)::BIGINT AS ub,
         floor(floor(epoch(ts))::BIGINT / 3600)::BIGINT AS hb
  FROM events),
span AS (SELECT min(hb) AS h0, max(hb) AS h1 FROM base),
rows_ AS (
  SELECT event_id, ub,
         least(15, ((hb - h0) * 16) // (h1 - h0 + 1))::BIGINT AS tb
  FROM base, span),
rows2 AS (
  SELECT event_id, ub, tb,
         (((tb >> 0) & 1) << 0) + (((ub >> 0) & 1) << 1)
       + (((tb >> 1) & 1) << 2) + (((ub >> 1) & 1) << 3)
       + (((tb >> 2) & 1) << 4) + (((ub >> 2) & 1) << 5)
       + (((tb >> 3) & 1) << 6) + (((ub >> 3) & 1) << 7) AS mz
  FROM rows_),
lin AS (
  SELECT 'linear_time_user' AS layout, ub, tb,
         ((row_number() OVER (ORDER BY tb, ub, event_id) - 1) * 32)
           // (count(*) OVER ()) AS file_id
  FROM rows2),
zo AS (
  SELECT 'zorder' AS layout, ub, tb,
         ((row_number() OVER (ORDER BY mz, event_id) - 1) * 32)
           // (count(*) OVER ()) AS file_id
  FROM rows2),
lays AS (SELECT * FROM lin UNION ALL SELECT * FROM zo),
files AS (
  SELECT layout, file_id, min(ub) AS ub_lo, max(ub) AS ub_hi,
         min(tb) AS tb_lo, max(tb) AS tb_hi
  FROM lays GROUP BY 1, 2),
probes AS (
  SELECT * FROM (VALUES ('user_and_time', 4, 7, 4, 7),
                        ('user_only', 4, 7, 0, 15))
    p(probe, pu0, pu1, pt0, pt1)),
agg AS (
  SELECT layout, probe,
         sum(CASE WHEN ub_hi >= pu0 AND ub_lo <= pu1
                   AND tb_hi >= pt0 AND tb_lo <= pt1
                  THEN 1 ELSE 0 END)::BIGINT AS files_scanned,
         count(*)::BIGINT AS files_total
  FROM files, probes GROUP BY 1, 2)
SELECT layout, probe, files_scanned, files_total,
       files_scanned::DOUBLE / files_total::DOUBLE AS scan_frac
FROM agg ORDER BY layout, probe
"""

ORACLES["rendezvous_shard_audit"] = """
WITH keys AS (SELECT DISTINCT user_id AS k FROM events),
shards AS (SELECT unnest(range(0, 9)) AS s),
mmix AS (
  SELECT k, s,
         (k * 2654435761 + s * 40503 + 104729) % 2147483647 AS m
  FROM keys, shards),
w AS (SELECT k, s, (m * m) % 2147483647 AS wt FROM mmix),
old AS (
  SELECT k, s AS old_shard FROM (
    SELECT k, s,
           row_number() OVER (PARTITION BY k ORDER BY wt DESC, s ASC) AS rn
    FROM w WHERE s < 8) WHERE rn = 1),
new AS (
  SELECT k, s AS new_shard FROM (
    SELECT k, s,
           row_number() OVER (PARTITION BY k ORDER BY wt DESC, s ASC) AS rn
    FROM w) WHERE rn = 1)
SELECT old_shard::BIGINT AS old_shard, new_shard::BIGINT AS new_shard,
       count(*)::BIGINT AS n_keys,
       (old_shard = new_shard OR new_shard = 8) AS invariant_ok
FROM old JOIN new USING (k)
GROUP BY old.old_shard, new.new_shard ORDER BY 1, 2
"""

ORACLES["join_order_planner"] = """
WITH c_stats AS (
  SELECT count(*)::HUGEINT AS n_c,
         count(DISTINCT c_custkey)::HUGEINT AS ndv_c_ck FROM customer),
o_stats AS (
  SELECT count(*)::HUGEINT AS n_o,
         count(DISTINCT o_custkey)::HUGEINT AS ndv_o_ck,
         count(DISTINCT o_orderkey)::HUGEINT AS ndv_o_ok FROM orders),
l_stats AS (
  SELECT count(*)::HUGEINT AS n_l,
         count(DISTINCT l_orderkey)::HUGEINT AS ndv_l_ok FROM lineitem),
tco AS (
  SELECT sum(c1 * c2)::HUGEINT AS t_co FROM
    (SELECT c_custkey AS k, count(*)::HUGEINT AS c1
       FROM customer GROUP BY 1) a
  JOIN (SELECT o_custkey AS k, count(*)::HUGEINT AS c2
          FROM orders GROUP BY 1) b USING (k)),
tol AS (
  SELECT sum(c1 * c2)::HUGEINT AS t_ol FROM
    (SELECT o_orderkey AS k, count(*)::HUGEINT AS c1
       FROM orders GROUP BY 1) a
  JOIN (SELECT l_orderkey AS k, count(*)::HUGEINT AS c2
          FROM lineitem GROUP BY 1) b USING (k)),
tcol AS (
  SELECT sum(c1 * col_cnt)::HUGEINT AS t_col FROM
    (SELECT c_custkey AS k, count(*)::HUGEINT AS c1
       FROM customer GROUP BY 1) a
  JOIN (SELECT o.o_custkey AS ck, sum(b.c2)::HUGEINT AS col_cnt
          FROM orders o
          JOIN (SELECT l_orderkey AS k, count(*)::HUGEINT AS c2
                  FROM lineitem GROUP BY 1) b ON b.k = o.o_orderkey
          GROUP BY 1) w ON w.ck = a.k),
s AS (
  SELECT *, (n_c * n_o // greatest(ndv_c_ck, ndv_o_ck)) AS e_co,
            (n_o * n_l // greatest(ndv_o_ok, ndv_l_ok)) AS e_ol
  FROM c_stats, o_stats, l_stats, tco, tol, tcol),
s2 AS (
  SELECT *,
         (e_co * n_l // greatest(least(e_co, ndv_o_ok), ndv_l_ok)) AS ef_co,
         (e_ol * n_c // greatest(least(e_ol, ndv_o_ck), ndv_c_ck)) AS ef_ol
  FROM s),
plans AS (
  SELECT 'customer_orders_then_lineitem' AS plan, e_co::BIGINT AS est_first,
         ef_co::BIGINT AS est_final, t_co::BIGINT AS true_first,
         t_col::BIGINT AS true_final FROM s2
  UNION ALL
  SELECT 'orders_lineitem_then_customer', e_ol::BIGINT, ef_ol::BIGINT,
         t_ol::BIGINT, t_col::BIGINT FROM s2)
SELECT plan, est_first, est_final, true_first, true_final,
       est_first = min(est_first) OVER () AS chosen_by_estimate,
       true_first = min(true_first) OVER () AS truly_optimal,
       (est_first = min(est_first) OVER ())
         = (true_first = min(true_first) OVER ()) AS agree
FROM plans ORDER BY plan
"""

ORACLES["fsst_symbol_profile"] = """
WITH docs AS (SELECT text FROM documents WHERE length(text) >= 3),
grams AS (
  SELECT substring(text, i, 3) AS g
  FROM docs, unnest(range(1, length(text) - 1)) AS t(i)),
top AS (
  SELECT g, count(*)::BIGINT AS overlap_count
  FROM grams GROUP BY g
  ORDER BY overlap_count DESC, g ASC LIMIT 16),
ranked AS (
  SELECT g, overlap_count,
         row_number() OVER (ORDER BY overlap_count DESC, g ASC)::BIGINT
           AS rank
  FROM top),
total AS (SELECT sum(length(text))::BIGINT AS total_chars FROM documents),
gains AS (
  SELECT g, rank, overlap_count,
         sum((length(text) - length(replace(text, g, ''))) // 3)::BIGINT
           AS nonoverlap_count
  FROM docs, ranked GROUP BY 1, 2, 3)
SELECT g AS gram, rank, overlap_count, nonoverlap_count,
       (nonoverlap_count * 2)::BIGINT AS chars_saved,
       (nonoverlap_count * 2)::DOUBLE / total_chars::DOUBLE AS savings_frac
FROM gains, total ORDER BY rank
"""

ORACLES["lru_stack_distance"] = """
WITH acc AS (
  SELECT user_id,
         row_number() OVER (ORDER BY ts, event_id)::BIGINT AS pos
  FROM events),
pairs AS (
  SELECT user_id, pos,
         lag(pos) OVER (PARTITION BY user_id ORDER BY pos) AS ppos
  FROM acc),
d AS (
  SELECT p.pos, count(DISTINCT a.user_id)::BIGINT AS d
  FROM pairs p JOIN acc a ON a.pos > p.ppos AND a.pos < p.pos
  WHERE p.ppos IS NOT NULL
  GROUP BY p.pos),
dist AS (
  SELECT CASE WHEN p.ppos IS NULL THEN NULL
              ELSE coalesce(d.d, 0) + 1 END AS stack_distance
  FROM pairs p LEFT JOIN d ON d.pos = p.pos),
caps AS (SELECT unnest([1, 2, 4, 8, 16, 32]) AS capacity),
agg AS (
  SELECT capacity::BIGINT AS capacity,
         sum(CASE WHEN stack_distance <= capacity THEN 1 ELSE 0 END)::BIGINT
           AS hits,
         sum(CASE WHEN stack_distance IS NULL THEN 1 ELSE 0 END)::BIGINT
           AS cold_misses,
         count(*)::BIGINT AS total_accesses
  FROM dist, caps GROUP BY 1)
SELECT capacity, hits, cold_misses, total_accesses,
       hits::DOUBLE / total_accesses::DOUBLE AS hit_ratio
FROM agg ORDER BY capacity
"""

ORACLES["roaring_container_profile"] = """
WITH chunks AS (
  SELECT event_type, event_id // 256 AS chunk,
         count(DISTINCT event_id)::BIGINT AS card
  FROM events GROUP BY 1, 2),
per_chunk AS (
  SELECT event_type, card, (card <= 16) AS is_array,
         CASE WHEN card <= 16 THEN card * 2 ELSE 32 END::BIGINT AS bytes
  FROM chunks),
agg AS (
  SELECT event_type,
         count(*)::BIGINT AS n_chunks,
         sum(CASE WHEN is_array THEN 1 ELSE 0 END)::BIGINT AS n_array,
         sum(CASE WHEN is_array THEN 0 ELSE 1 END)::BIGINT AS n_bitmap,
         sum(bytes)::BIGINT AS bytes_roaring,
         (sum(card) * 2)::BIGINT AS bytes_flat_array
  FROM per_chunk GROUP BY 1)
SELECT *, bytes_roaring::DOUBLE / bytes_flat_array::DOUBLE
         AS compression_ratio
FROM agg ORDER BY event_type
"""

ORACLES["ewma_time_decay_1h"] = """
WITH hourly AS (
  SELECT user_id, floor(floor(epoch(ts))::BIGINT / 3600)::BIGINT AS hb,
         sum(floor(value * 100)::BIGINT)::HUGEINT AS vsum,
         count(*)::HUGEINT AS cnt
  FROM events GROUP BY 1, 2),
contrib AS (
  SELECT user_id, vsum, cnt, hb AS src_hb,
         unnest(range(hb, hb + 41)) AS hb2
  FROM hourly),
joined AS (
  SELECT t.user_id, t.hb,
         sum(c.vsum * (1::HUGEINT << (40 - (t.hb - c.src_hb))::INT)) AS num,
         sum(c.cnt  * (1::HUGEINT << (40 - (t.hb - c.src_hb))::INT)) AS den
  FROM hourly t
  JOIN contrib c ON c.user_id = t.user_id AND c.hb2 = t.hb
  GROUP BY 1, 2)
SELECT user_id, to_timestamp(hb * 3600)::TIMESTAMP AS bucket_ts,
       num::DOUBLE / den::DOUBLE AS decayed_mean
FROM joined ORDER BY user_id, bucket_ts
"""

ORACLES["cow_mor_cost_audit"] = """
WITH base AS (
  SELECT floor(floor(epoch(ts))::BIGINT / 86400)::BIGINT AS day,
         floor(floor(epoch(ts))::BIGINT / 3600)::BIGINT AS hour,
         (event_type = 'error') AS is_update
  FROM events),
sizes AS (SELECT day, count(*)::BIGINT AS part_rows FROM base GROUP BY 1),
upd AS (
  SELECT day, count(*)::BIGINT AS n_updates,
         count(DISTINCT hour)::BIGINT AS n_update_hours
  FROM base WHERE is_update GROUP BY 1),
j AS (
  SELECT s.day, s.part_rows,
         coalesce(u.n_updates, 0)::BIGINT AS n_updates,
         coalesce(u.n_update_hours, 0)::BIGINT AS n_update_hours
  FROM sizes s LEFT JOIN upd u ON u.day = s.day)
SELECT to_timestamp(day * 86400)::TIMESTAMP AS day_ts,
       part_rows, n_updates, n_update_hours,
       (n_update_hours * part_rows)::BIGINT AS cow_write_rows,
       n_updates AS mor_write_rows,
       (part_rows + n_updates)::DOUBLE / part_rows::DOUBLE AS mor_read_amp,
       (n_update_hours * part_rows > n_updates * 10) AS recommend_mor
FROM j ORDER BY day_ts
"""

ORACLES["unseen_vocab_estimate"] = """
WITH toks AS (
  SELECT source, unnest(string_split_regex(trim(text), '\\s+')) AS tok
  FROM documents),
counts AS (
  SELECT source, tok, count(*)::BIGINT AS c
  FROM toks WHERE tok <> '' GROUP BY 1, 2),
spectrum AS (
  SELECT source,
         count(*)::BIGINT AS vocab,
         sum(c)::BIGINT AS n_tokens,
         sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)::BIGINT AS f1,
         sum(CASE WHEN c = 2 THEN 1 ELSE 0 END)::BIGINT AS f2
  FROM counts GROUP BY 1)
SELECT source, n_tokens, vocab, f1, f2,
       (vocab + (f1 * (f1 - 1)) // (2 * (f2 + 1)))::BIGINT
         AS chao1_richness,
       f1::DOUBLE / n_tokens::DOUBLE AS unseen_mass,
       1.0 - f1::DOUBLE / n_tokens::DOUBLE AS coverage
FROM spectrum ORDER BY source
"""

ORACLES["morans_i_hourweek"] = """
WITH counts AS (
  SELECT (floor(floor(epoch(ts))::BIGINT / 3600)::BIGINT % 168) AS c,
         count(*)::BIGINT AS x
  FROM events GROUP BY 1),
cells AS (SELECT unnest(range(0, 168))::BIGINT AS c),
grid AS (
  SELECT cells.c, coalesce(counts.x, 0)::BIGINT AS x
  FROM cells LEFT JOIN counts ON counts.c = cells.c),
tot AS (SELECT sum(x)::BIGINT AS sx FROM grid),
z AS (
  SELECT c, (168 * x - sx)::HUGEINT AS z FROM grid, tot),
nb AS (
  SELECT c, sum(zn) AS nbsum FROM (
    SELECT (c + 1) % 168 AS c, z AS zn FROM z
    UNION ALL
    SELECT (c + 167) % 168 AS c, z AS zn FROM z) u
  GROUP BY 1),
s AS (
  SELECT sum(z.z * nb.nbsum) AS s_cross, sum(z.z * z.z) AS s_zz
  FROM z JOIN nb ON nb.c = z.c)
SELECT 168::BIGINT AS n_cells,
       s_cross::DOUBLE AS s_cross, s_zz::DOUBLE AS s_zz,
       (168::HUGEINT * s_cross)::DOUBLE / (336::HUGEINT * s_zz)::DOUBLE
         AS morans_i,
       -1.0 / 167.0 AS expected_i
FROM s
"""

ORACLES["shapley_attribution"] = """
WITH per_user AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS hc,
         max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS hv,
         max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS hs,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY 1),
cells AS (
  SELECT hc, hv, hs, count(*)::BIGINT AS users, sum(conv)::BIGINT AS convs
  FROM per_user GROUP BY 1, 2, 3),
v AS (
  SELECT
    coalesce(max(CASE WHEN hc=1 AND hv=0 AND hs=0
                 THEN convs::DOUBLE / users::DOUBLE END), 0.0) AS v_100,
    coalesce(max(CASE WHEN hc=0 AND hv=1 AND hs=0
                 THEN convs::DOUBLE / users::DOUBLE END), 0.0) AS v_010,
    coalesce(max(CASE WHEN hc=0 AND hv=0 AND hs=1
                 THEN convs::DOUBLE / users::DOUBLE END), 0.0) AS v_001,
    coalesce(max(CASE WHEN hc=1 AND hv=1 AND hs=0
                 THEN convs::DOUBLE / users::DOUBLE END), 0.0) AS v_110,
    coalesce(max(CASE WHEN hc=1 AND hv=0 AND hs=1
                 THEN convs::DOUBLE / users::DOUBLE END), 0.0) AS v_101,
    coalesce(max(CASE WHEN hc=0 AND hv=1 AND hs=1
                 THEN convs::DOUBLE / users::DOUBLE END), 0.0) AS v_011,
    coalesce(max(CASE WHEN hc=1 AND hv=1 AND hs=1
                 THEN convs::DOUBLE / users::DOUBLE END), 0.0) AS v_111
  FROM cells)
SELECT channel, shapley_value FROM (
  SELECT 'click' AS channel,
         (2.0 * v_100 + (v_110 - v_010) + (v_101 - v_001)
          + 2.0 * (v_111 - v_011)) / 6.0 AS shapley_value FROM v
  UNION ALL
  SELECT 'view',
         (2.0 * v_010 + (v_110 - v_100) + (v_011 - v_001)
          + 2.0 * (v_111 - v_101)) / 6.0 FROM v
  UNION ALL
  SELECT 'signup',
         (2.0 * v_001 + (v_101 - v_100) + (v_011 - v_010)
          + 2.0 * (v_111 - v_110)) / 6.0 FROM v)
ORDER BY channel
"""

ORACLES["littles_law_audit"] = """
WITH ev AS (
  SELECT user_id, floor(epoch(ts))::BIGINT AS es FROM events),
marked AS (
  SELECT user_id, es,
         CASE WHEN es - lag(es) OVER (PARTITION BY user_id ORDER BY es)
                   > 1800 THEN 1 ELSE 0 END AS brk
  FROM ev),
sess AS (
  SELECT user_id, sid, min(es) AS s0, max(es) AS s1 FROM (
    SELECT user_id, es,
           sum(brk) OVER (PARTITION BY user_id ORDER BY es
                          ROWS UNBOUNDED PRECEDING) AS sid
    FROM marked) g
  GROUP BY 1, 2),
stats AS (
  SELECT count(*)::BIGINT AS n_sessions,
         sum(s1 - s0)::BIGINT AS busy_direct FROM sess),
bounds AS (
  SELECT s0 AS t, 1 AS delta FROM sess
  UNION ALL
  SELECT s1 AS t, -1 AS delta FROM sess),
sweep AS (
  SELECT sum(conc * coalesce(gap, 0))::BIGINT AS busy_sweep FROM (
    SELECT sum(delta) OVER (ORDER BY t, delta
                            ROWS UNBOUNDED PRECEDING) AS conc,
           lead(t) OVER (ORDER BY t, delta) - t AS gap
    FROM bounds) x),
span AS (SELECT (max(es) - min(es))::BIGINT AS span_seconds FROM ev)
SELECT n_sessions, busy_direct, busy_sweep,
       (busy_direct = busy_sweep) AS identity_ok,
       span_seconds,
       (n_sessions * 3600)::DOUBLE / span_seconds::DOUBLE
         AS lambda_per_hour,
       busy_direct::DOUBLE / n_sessions::DOUBLE AS w_mean_seconds,
       busy_direct::DOUBLE / span_seconds::DOUBLE AS l_avg_concurrency
FROM stats, sweep, span
"""

ORACLES["rmst_survival"] = """
WITH RECURSIVE base AS (
  SELECT user_id, event_id,
         (epoch_ms(ts) // 1000)::BIGINT AS es, ts
  FROM events),
flagged AS (
  SELECT user_id, es, ts, event_id,
         CASE WHEN es - lag(es) OVER w > 1800 OR lag(es) OVER w IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM base
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sess_tag AS (
  SELECT user_id, es,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged),
sessions AS (
  SELECT user_id, session_id,
         min(es)::BIGINT AS s_start, max(es)::BIGINT AS s_end
  FROM sess_tag GROUP BY 1, 2),
horizon AS (
  SELECT max(s_end)::BIGINT AS t_max,
         floor((min(s_start) + max(s_start)) / 2)::BIGINT AS mid
  FROM sessions),
tagged AS (
  SELECT CASE WHEN s_start <= mid THEN 'early' ELSE 'late' END AS cohort,
         ((s_end - s_start) // 60)::BIGINT AS dur,
         (t_max - s_end < 1800) AS censored
  FROM sessions, horizon),
grid AS (
  SELECT cohort, dur, count(*)::BIGINT AS cnt_all,
         sum(CASE WHEN NOT censored THEN 1 ELSE 0 END)::BIGINT AS d_events
  FROM tagged GROUP BY 1, 2),
staged AS (
  SELECT cohort, dur, d_events,
         (sum(cnt_all) OVER (PARTITION BY cohort)
          - sum(cnt_all) OVER (PARTITION BY cohort ORDER BY dur
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          + cnt_all)::BIGINT AS n_risk
  FROM grid),
ev AS (
  SELECT cohort, dur, d_events, n_risk,
         (n_risk - d_events)::DOUBLE / n_risk::DOUBLE AS factor,
         row_number() OVER (PARTITION BY cohort ORDER BY dur)::BIGINT AS k
  FROM staged WHERE d_events >= 1),
rec AS (
  SELECT cohort, k, dur, d_events, n_risk, 1.0 * factor AS km
  FROM ev WHERE k = 1
  UNION ALL
  SELECT e.cohort, e.k, e.dur, e.d_events, e.n_risk, r.km * e.factor
  FROM ev e JOIN rec r ON e.cohort = r.cohort AND e.k = r.k + 1),
seg AS (
  SELECT cohort, k,
         coalesce(lag(km) OVER w2, 1.0)
           * (least(dur::DOUBLE, 60.0)
              - least(coalesce(lag(dur) OVER w2, 0)::DOUBLE, 60.0))
         + CASE WHEN lead(dur) OVER w2 IS NULL
                THEN km * (60.0 - least(dur::DOUBLE, 60.0))
                ELSE 0.0 END AS contrib
  FROM rec
  WINDOW w2 AS (PARTITION BY cohort ORDER BY dur)),
counts AS (
  SELECT cohort, count(*)::BIGINT AS n_sessions,
         sum(CASE WHEN NOT censored THEN 1 ELSE 0 END)::BIGINT AS n_deaths
  FROM tagged GROUP BY 1),
rmst AS (
  SELECT cohort,
         list_reduce(list(contrib ORDER BY k), (a, b) -> a + b) AS rmst_min
  FROM seg GROUP BY 1)
SELECT c.cohort, c.n_sessions, c.n_deaths, 60::BIGINT AS tau_min,
       coalesce(r.rmst_min, 60.0) AS rmst_min
FROM counts c LEFT JOIN rmst r ON r.cohort = c.cohort
ORDER BY c.cohort
"""

ORACLES["simpson_paradox_audit"] = """
WITH base AS (
  SELECT (floor(floor(epoch(ts))::BIGINT / 86400)::BIGINT % 7) AS dow,
         (user_id % 2 = 0) AS treated,
         (event_type = 'error') AS is_err
  FROM events),
cells AS (
  SELECT dow, treated, count(*)::BIGINT AS n,
         sum(CASE WHEN is_err THEN 1 ELSE 0 END)::BIGINT AS e
  FROM base GROUP BY 1, 2),
strata AS (
  SELECT 'dow_' || dow::VARCHAR AS stratum,
         sum(CASE WHEN treated THEN n END)::BIGINT AS n_treated,
         sum(CASE WHEN treated THEN e END)::BIGINT AS err_treated,
         sum(CASE WHEN NOT treated THEN n END)::BIGINT AS n_control,
         sum(CASE WHEN NOT treated THEN e END)::BIGINT AS err_control
  FROM cells GROUP BY dow),
pooled AS (
  SELECT 'pooled' AS stratum,
         sum(CASE WHEN treated THEN n END)::BIGINT AS n_treated,
         sum(CASE WHEN treated THEN e END)::BIGINT AS err_treated,
         sum(CASE WHEN NOT treated THEN n END)::BIGINT AS n_control,
         sum(CASE WHEN NOT treated THEN e END)::BIGINT AS err_control
  FROM cells),
pd AS (
  SELECT sign((err_treated * n_control
               - err_control * n_treated)::DOUBLE)::BIGINT AS pooled_dir
  FROM pooled),
unioned AS (
  SELECT * FROM strata UNION ALL SELECT * FROM pooled)
SELECT stratum, n_treated, err_treated, n_control, err_control,
       err_treated::DOUBLE / n_treated::DOUBLE AS rate_treated,
       err_control::DOUBLE / n_control::DOUBLE AS rate_control,
       sign((err_treated * n_control
             - err_control * n_treated)::DOUBLE)::BIGINT AS direction,
       (stratum <> 'pooled'
        AND sign((err_treated * n_control
                  - err_control * n_treated)::DOUBLE)::BIGINT <> 0
        AND pooled_dir <> 0
        AND sign((err_treated * n_control
                  - err_control * n_treated)::DOUBLE)::BIGINT
            = -pooled_dir) AS reversed_vs_pooled
FROM unioned, pd ORDER BY stratum
"""

ORACLES["ttl_cache_hit_curve"] = """
WITH gaps AS (
  SELECT floor(epoch(ts))::BIGINT
         - lag(floor(epoch(ts))::BIGINT)
             OVER (PARTITION BY user_id
                   ORDER BY floor(epoch(ts))::BIGINT, event_id) AS gap
  FROM events),
ttls AS (SELECT unnest([60, 600, 1800, 3600, 14400])::BIGINT
           AS ttl_seconds)
SELECT ttl_seconds,
       sum(CASE WHEN gap <= ttl_seconds THEN 1 ELSE 0 END)::BIGINT AS hits,
       sum(CASE WHEN gap IS NULL THEN 1 ELSE 0 END)::BIGINT AS cold_misses,
       count(*)::BIGINT AS total_accesses,
       sum(CASE WHEN gap <= ttl_seconds THEN 1 ELSE 0 END)::DOUBLE
         / count(*)::DOUBLE AS hit_ratio
FROM gaps, ttls GROUP BY 1 ORDER BY 1
"""

ORACLES["hierarchy_reconcile"] = """
WITH daily AS (
  SELECT event_type,
         floor(floor(epoch(ts))::BIGINT / 86400)::BIGINT AS day,
         count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2),
last AS (SELECT max(day) AS last_day FROM daily),
hist AS (
  SELECT event_type, sum(n)::BIGINT AS hist,
         count(DISTINCT day)::BIGINT AS n_days
  FROM daily, last WHERE day < last_day GROUP BY 1),
actual AS (
  SELECT event_type, sum(n)::BIGINT AS actual
  FROM daily, last WHERE day = last_day GROUP BY 1),
top AS (
  SELECT sum(hist)::BIGINT AS hist_total,
         max(n_days)::BIGINT AS n_days_top FROM hist),
leaves AS (
  SELECT h.event_type, h.n_days,
         coalesce(a.actual, 0)::BIGINT AS actual,
         ((100 * h.hist) // h.n_days)::BIGINT AS base_fc_centi,
         ((((100 * t.hist_total) // t.n_days_top) * h.hist)
            // t.hist_total)::BIGINT AS td_fc_centi
  FROM hist h LEFT JOIN actual a ON a.event_type = h.event_type, top t),
total_row AS (
  SELECT '__total__' AS event_type,
         max(n_days)::BIGINT AS n_days,
         sum(actual)::BIGINT AS actual,
         sum(base_fc_centi)::BIGINT AS base_fc_centi,
         (SELECT ((100 * hist_total) // n_days_top)::BIGINT FROM top)
           AS td_fc_centi
  FROM leaves),
unioned AS (
  SELECT * FROM leaves UNION ALL SELECT * FROM total_row)
SELECT event_type, n_days,
       (actual * 100)::BIGINT AS actual_centi,
       base_fc_centi, td_fc_centi,
       abs(actual * 100 - base_fc_centi)::BIGINT AS base_abs_err_centi,
       abs(actual * 100 - td_fc_centi)::BIGINT AS td_abs_err_centi
FROM unioned ORDER BY event_type
"""

ORACLES["settling_time_estimate"] = """
WITH hourly AS (
  SELECT event_type,
         floor(floor(epoch(ts))::BIGINT / 3600)::BIGINT AS hb,
         count(*)::BIGINT AS x
  FROM events GROUP BY 1, 2),
ranked AS (
  SELECT event_type, x,
         row_number() OVER (PARTITION BY event_type ORDER BY hb)::BIGINT
           AS idx,
         count(*) OVER (PARTITION BY event_type)::BIGINT AS n_hours
  FROM hourly),
tail AS (
  SELECT event_type, sum(x)::BIGINT AS s_tail,
         count(*)::BIGINT AS n_tail
  FROM ranked WHERE idx > n_hours - 24 GROUP BY 1),
flagged AS (
  SELECT r.event_type, r.n_hours, t.s_tail, t.n_tail,
         CASE WHEN abs(t.n_tail * r.x - t.s_tail) * 5 > t.s_tail
              THEN r.idx ELSE 0 END AS viol_idx
  FROM ranked r JOIN tail t ON t.event_type = r.event_type)
SELECT event_type, n_hours,
       s_tail::DOUBLE / n_tail::DOUBLE AS final_level,
       (max(viol_idx) + 1)::BIGINT AS settle_idx,
       (n_hours - max(viol_idx))::DOUBLE / n_hours::DOUBLE
         AS settled_frac
FROM flagged GROUP BY event_type, n_hours, s_tail, n_tail
ORDER BY event_type
"""

ORACLES["population_estimators"] = """
WITH base AS (
  SELECT user_id,
         (floor(floor(epoch(ts))::BIGINT / 86400)::BIGINT % 2 = 0)
           AS even_day
  FROM events),
per_user AS (
  SELECT user_id,
         max(CASE WHEN even_day THEN 1 ELSE 0 END) AS in1,
         max(CASE WHEN NOT even_day THEN 1 ELSE 0 END) AS in2
  FROM base GROUP BY 1),
agg AS (
  SELECT sum(in1)::BIGINT AS n1, sum(in2)::BIGINT AS n2,
         sum(in1 * in2)::BIGINT AS m_both,
         count(*)::BIGINT AS true_distinct_users,
         max(CASE WHEN in1 = 1 THEN user_id + 1 END)::BIGINT
           AS gt_max_serial,
         max(user_id + 1)::BIGINT AS true_id_space
  FROM per_user)
SELECT n1, n2, m_both,
       (((n1 + 1) * (n2 + 1)) // (m_both + 1) - 1)::BIGINT
         AS chapman_estimate,
       true_distinct_users, gt_max_serial,
       (gt_max_serial + gt_max_serial // n1 - 1)::BIGINT
         AS german_tank_estimate,
       true_id_space
FROM agg
"""

ORACLES["median_polish_dowhour"] = """
WITH counts AS (
  SELECT (floor(floor(epoch(ts))::BIGINT / 86400)::BIGINT % 7) AS d,
         (floor(floor(epoch(ts))::BIGINT / 3600)::BIGINT % 24) AS h,
         count(*)::BIGINT AS x
  FROM events GROUP BY 1, 2),
cells AS (
  SELECT dd.d, hh.h
  FROM (SELECT unnest(range(0, 7))::BIGINT AS d) dd,
       (SELECT unnest(range(0, 24))::BIGINT AS h) hh),
g0 AS (
  SELECT cells.d, cells.h, coalesce(counts.x, 0)::BIGINT AS r
  FROM cells LEFT JOIN counts
    ON counts.d = cells.d AND counts.h = cells.h),
rm1 AS (
  SELECT d, r AS med FROM (
    SELECT d, r, row_number() OVER (PARTITION BY d ORDER BY r) AS rn,
           count(*) OVER (PARTITION BY d) AS n FROM g0) q
  WHERE rn = (n + 1) // 2),
g1 AS (SELECT g0.d, g0.h, g0.r - rm1.med AS r
       FROM g0 JOIN rm1 ON rm1.d = g0.d),
cm1 AS (
  SELECT h, r AS med FROM (
    SELECT h, r, row_number() OVER (PARTITION BY h ORDER BY r) AS rn,
           count(*) OVER (PARTITION BY h) AS n FROM g1) q
  WHERE rn = (n + 1) // 2),
g2 AS (SELECT g1.d, g1.h, g1.r - cm1.med AS r
       FROM g1 JOIN cm1 ON cm1.h = g1.h),
rm2 AS (
  SELECT d, r AS med FROM (
    SELECT d, r, row_number() OVER (PARTITION BY d ORDER BY r) AS rn,
           count(*) OVER (PARTITION BY d) AS n FROM g2) q
  WHERE rn = (n + 1) // 2),
g3 AS (SELECT g2.d, g2.h, g2.r - rm2.med AS r
       FROM g2 JOIN rm2 ON rm2.d = g2.d),
cm2 AS (
  SELECT h, r AS med FROM (
    SELECT h, r, row_number() OVER (PARTITION BY h ORDER BY r) AS rn,
           count(*) OVER (PARTITION BY h) AS n FROM g3) q
  WHERE rn = (n + 1) // 2),
g4 AS (SELECT g3.d, g3.h, g3.r - cm2.med AS r
       FROM g3 JOIN cm2 ON cm2.h = g3.h),
row_eff AS (
  SELECT rm1.d, (rm1.med + rm2.med)::BIGINT AS e
  FROM rm1 JOIN rm2 ON rm2.d = rm1.d),
col_eff AS (
  SELECT cm1.h, (cm1.med + cm2.med)::BIGINT AS e
  FROM cm1 JOIN cm2 ON cm2.h = cm1.h),
resid AS (
  SELECT max(abs(r))::BIGINT AS max_abs, sum(abs(r))::BIGINT AS sum_abs
  FROM g4)
SELECT * FROM (
  SELECT 'row' AS component, d::BIGINT AS idx, e AS effect FROM row_eff
  UNION ALL
  SELECT 'col', h::BIGINT, e FROM col_eff
  UNION ALL
  SELECT 'resid_max_abs', -1::BIGINT, max_abs FROM resid
  UNION ALL
  SELECT 'resid_sum_abs', -1::BIGINT, sum_abs FROM resid)
ORDER BY component, idx
"""

ORACLES["calibration_bins_audit"] = """
WITH span AS (
  SELECT floor((min(floor(epoch(ts))::BIGINT)
                + max(floor(epoch(ts))::BIGINT)) / 2)::BIGINT AS mid
  FROM events),
per_user AS (
  SELECT user_id,
         sum(CASE WHEN floor(epoch(ts))::BIGINT <= mid
                  THEN 1 ELSE 0 END)::BIGINT AS n1,
         sum(CASE WHEN floor(epoch(ts))::BIGINT <= mid
                   AND event_type = 'error'
                  THEN 1 ELSE 0 END)::BIGINT AS e1,
         sum(CASE WHEN floor(epoch(ts))::BIGINT > mid
                  THEN 1 ELSE 0 END)::BIGINT AS n2,
         sum(CASE WHEN floor(epoch(ts))::BIGINT > mid
                   AND event_type = 'error'
                  THEN 1 ELSE 0 END)::BIGINT AS e2
  FROM events, span GROUP BY user_id
  HAVING n1 > 0 AND n2 > 0),
scored AS (
  SELECT least(((100 * e1) // n1) // 10, 9)::BIGINT AS bin,
         ((100 * e1) // n1)::BIGINT AS score_centi, n2, e2
  FROM per_user),
agg AS (
  SELECT bin, count(*)::BIGINT AS n_users,
         sum(score_centi)::BIGINT AS s_score,
         sum(n2)::BIGINT AS n_post, sum(e2)::BIGINT AS e_post
  FROM scored GROUP BY 1)
SELECT bin, n_users,
       s_score::DOUBLE / (n_users * 100)::DOUBLE AS mean_predicted,
       e_post::DOUBLE / n_post::DOUBLE AS empirical_rate,
       s_score::DOUBLE / (n_users * 100)::DOUBLE
         - e_post::DOUBLE / n_post::DOUBLE AS calibration_gap
FROM agg ORDER BY bin
"""

ORACLES["lift_gain_curve"] = """
WITH span AS (
  SELECT floor((min(floor(epoch(ts))::BIGINT)
                + max(floor(epoch(ts))::BIGINT)) / 2)::BIGINT AS mid
  FROM events),
per_user AS (
  SELECT user_id,
         sum(CASE WHEN floor(epoch(ts))::BIGINT <= mid
                  THEN 1 ELSE 0 END)::BIGINT AS score,
         sum(CASE WHEN floor(epoch(ts))::BIGINT > mid
                   AND event_type = 'error'
                  THEN 1 ELSE 0 END)::BIGINT AS e2
  FROM events, span GROUP BY user_id),
ranked AS (
  SELECT row_number() OVER (ORDER BY score DESC, user_id ASC)::BIGINT
           AS rn,
         count(*) OVER ()::BIGINT AS n_users,
         sum(e2) OVER (ORDER BY score DESC, user_id ASC
                       ROWS UNBOUNDED PRECEDING)::BIGINT AS e_cum,
         sum(e2) OVER ()::BIGINT AS e_tot
  FROM per_user),
per_dec AS (
  SELECT (((rn - 1) * 10) // n_users + 1)::BIGINT AS decile,
         max(rn)::BIGINT AS users_cum,
         max(e_cum)::BIGINT AS errors_cum,
         max(e_tot)::BIGINT AS e_tot,
         max(n_users)::BIGINT AS n_users
  FROM ranked GROUP BY 1)
SELECT decile, users_cum, errors_cum,
       errors_cum::DOUBLE / e_tot::DOUBLE AS capture_frac,
       (errors_cum * n_users)::DOUBLE / (e_tot * users_cum)::DOUBLE
         AS lift
FROM per_dec ORDER BY decile
"""

ORACLES["qte_deciles"] = """
WITH base AS (
  SELECT (user_id % 2 = 0) AS treated,
         floor(value * 100)::BIGINT AS vq
  FROM events),
cells AS (
  SELECT treated, vq, count(*)::BIGINT AS c FROM base GROUP BY 1, 2),
cum AS (
  SELECT treated, vq,
         sum(c) OVER (PARTITION BY treated ORDER BY vq
                      ROWS UNBOUNDED PRECEDING)::BIGINT AS cum,
         sum(c) OVER (PARTITION BY treated)::BIGINT AS n
  FROM cells),
qs AS (SELECT unnest(range(1, 10))::BIGINT AS q),
picks AS (
  SELECT treated, q, min(vq)::BIGINT AS v
  FROM cum, qs WHERE cum >= (q * n + 9) // 10
  GROUP BY 1, 2)
SELECT t.q, t.v AS treated_centi, c.v AS control_centi,
       (t.v - c.v)::BIGINT AS qte_centi
FROM picks t JOIN picks c ON c.q = t.q AND NOT c.treated
WHERE t.treated ORDER BY t.q
"""

ORACLES["degree_assortativity"] = """
WITH ordered AS (
  SELECT ts::DATE AS d, ts, event_id, user_id FROM events),
raw AS (
  SELECT lag(user_id) OVER (PARTITION BY d ORDER BY ts, event_id) AS src,
         user_id AS dst
  FROM ordered),
edges0 AS (
  SELECT least(src, dst)::BIGINT AS u, greatest(src, dst)::BIGINT AS v
  FROM raw WHERE src IS NOT NULL AND src <> dst
  GROUP BY 1, 2),
bidir AS (
  SELECT u, v FROM edges0 UNION ALL SELECT v AS u, u AS v FROM edges0),
deg AS (SELECT u, count(*)::BIGINT AS deg FROM bidir GROUP BY 1),
s AS (
  SELECT count(*)::HUGEINT AS n,
         sum(du.deg::HUGEINT) AS sx,
         sum(du.deg::HUGEINT * du.deg::HUGEINT) AS sxx,
         sum(du.deg::HUGEINT * dv.deg::HUGEINT) AS sxy
  FROM bidir b
  JOIN deg du ON du.u = b.u
  JOIN deg dv ON dv.u = b.v)
SELECT (n / 2)::BIGINT AS n_edges,
       CASE WHEN (n * sxx - sx * sx) <> 0
            THEN (n * sxy - sx * sx)::DOUBLE
                 / (n * sxx - sx * sx)::DOUBLE END AS assortativity
FROM s
"""

ORACLES["edge_reciprocity"] = """
WITH ordered AS (
  SELECT ts::DATE AS d, ts, event_id, user_id FROM events),
raw AS (
  SELECT lag(user_id) OVER (PARTITION BY d ORDER BY ts, event_id) AS src,
         user_id AS dst
  FROM ordered),
edges AS (
  SELECT src::BIGINT AS src, dst::BIGINT AS dst, count(*)::BIGINT AS w
  FROM raw WHERE src IS NOT NULL AND src <> dst
  GROUP BY 1, 2),
j AS (
  SELECT e.w, r.w AS w_rev
  FROM edges e
  LEFT JOIN edges r ON r.src = e.dst AND r.dst = e.src)
SELECT count(*)::BIGINT AS n_edges,
       sum(CASE WHEN w_rev IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
         AS n_reciprocated,
       sum(CASE WHEN w_rev IS NOT NULL THEN 1 ELSE 0 END)::DOUBLE
         / count(*)::DOUBLE AS reciprocity,
       sum(w)::BIGINT AS w_total,
       sum(least(w, coalesce(w_rev, 0)))::BIGINT AS w_min_sum,
       sum(least(w, coalesce(w_rev, 0)))::DOUBLE / sum(w)::DOUBLE
         AS weighted_reciprocity
FROM j
"""

ORACLES["weighted_quantile_revenue"] = """
WITH cells AS (
  SELECT floor(l_extendedprice * 100)::BIGINT AS price_centi,
         count(*)::BIGINT AS cnt
  FROM lineitem GROUP BY 1),
revs AS (
  SELECT price_centi, (price_centi::HUGEINT * cnt::HUGEINT) AS rev
  FROM cells),
cum AS (
  SELECT price_centi,
         sum(rev) OVER (ORDER BY price_centi
                        ROWS UNBOUNDED PRECEDING) AS cum,
         sum(rev) OVER () AS total
  FROM revs),
qs AS (SELECT unnest(range(1, 10))::BIGINT AS q),
picks AS (
  SELECT q, min(price_centi)::BIGINT AS price_centi
  FROM cum, qs WHERE cum * 10 >= q * total
  GROUP BY 1)
SELECT p.q, p.price_centi,
       c.cum::DOUBLE / c.total::DOUBLE AS cum_share
FROM picks p JOIN cum c ON c.price_centi = p.price_centi
ORDER BY p.q
"""

ORACLES["rich_club_profile"] = """
WITH ordered AS (
  SELECT ts::DATE AS d, ts, event_id, user_id FROM events),
raw AS (
  SELECT lag(user_id) OVER (PARTITION BY d ORDER BY ts, event_id) AS src,
         user_id AS dst
  FROM ordered),
edges AS (
  SELECT least(src, dst)::BIGINT AS u, greatest(src, dst)::BIGINT AS v
  FROM raw WHERE src IS NOT NULL AND src <> dst
  GROUP BY 1, 2),
bidir AS (
  SELECT u, v FROM edges UNION ALL SELECT v, u FROM edges),
deg AS (SELECT u, count(*)::BIGINT AS deg FROM bidir GROUP BY 1),
ks AS (SELECT unnest(range(1, 6))::BIGINT AS k),
nk0 AS (
  SELECT k, count(*)::BIGINT AS n_k
  FROM deg, ks WHERE deg > k GROUP BY 1),
nk AS (
  SELECT ks.k, coalesce(nk0.n_k, 0)::BIGINT AS n_k
  FROM ks LEFT JOIN nk0 ON nk0.k = ks.k),
ek AS (
  SELECT k, count(*)::BIGINT AS e_k
  FROM edges e
  JOIN deg du ON du.u = e.u
  JOIN deg dv ON dv.u = e.v, ks
  WHERE du.deg > k AND dv.deg > k
  GROUP BY 1)
SELECT nk.k, nk.n_k, coalesce(ek.e_k, 0)::BIGINT AS e_k,
       CASE WHEN nk.n_k >= 2
            THEN (coalesce(ek.e_k, 0) * 2)::DOUBLE
                 / (nk.n_k * (nk.n_k - 1))::DOUBLE END AS phi
FROM nk LEFT JOIN ek ON ek.k = nk.k
ORDER BY nk.k
"""

ORACLES["backoff_pattern_detect"] = """
WITH ev AS (
  SELECT user_id, floor(epoch(ts))::BIGINT AS es, event_id FROM events),
gaps AS (
  SELECT user_id, es, event_id,
         es - lag(es) OVER (PARTITION BY user_id ORDER BY es, event_id)
           AS g
  FROM ev),
gaps2 AS (SELECT * FROM gaps WHERE g IS NOT NULL),
steps AS (
  SELECT user_id, es, event_id, g AS g2,
         lag(g) OVER (PARTITION BY user_id ORDER BY es, event_id) AS g1
  FROM gaps2),
steps2 AS (
  SELECT user_id, es, event_id,
         (g1 > 0 AND g2 * 2 >= g1 * 3 AND g2 <= g1 * 3) AS q
  FROM steps WHERE g1 IS NOT NULL),
runs AS (
  SELECT user_id, q,
         sum(CASE WHEN q THEN 0 ELSE 1 END)
           OVER (PARTITION BY user_id ORDER BY es, event_id
                 ROWS UNBOUNDED PRECEDING) AS island
  FROM steps2),
run_lens AS (
  SELECT user_id, island, count(*)::BIGINT AS run_len
  FROM runs WHERE q GROUP BY 1, 2),
per_user AS (
  SELECT user_id, count(*)::BIGINT AS n_gaps FROM gaps2 GROUP BY 1),
agg AS (
  SELECT user_id, sum(run_len)::BIGINT AS n_backoff_steps,
         max(run_len)::BIGINT AS max_backoff_run
  FROM run_lens GROUP BY 1)
SELECT p.user_id, p.n_gaps,
       coalesce(a.n_backoff_steps, 0)::BIGINT AS n_backoff_steps,
       coalesce(a.max_backoff_run, 0)::BIGINT AS max_backoff_run,
       (coalesce(a.max_backoff_run, 0) >= 3) AS suspect
FROM per_user p LEFT JOIN agg a ON a.user_id = p.user_id
ORDER BY p.user_id
"""

ORACLES["lsm_compaction_planner"] = """
WITH days AS (
  SELECT floor(floor(epoch(ts))::BIGINT / 86400)::BIGINT AS day,
         count(*)::BIGINT AS rows_,
         sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT
           AS updates
  FROM events GROUP BY 1),
ladder AS (
  SELECT lv::BIGINT AS lv, (1000 * power(10, lv))::BIGINT AS cap
  FROM (SELECT unnest(range(0, 9)) AS lv)),
leveled AS (
  SELECT day, rows_, updates, min(lv)::BIGINT AS levels
  FROM days, ladder WHERE cap >= rows_
  GROUP BY 1, 2, 3)
SELECT to_timestamp(day * 86400)::TIMESTAMP AS day_ts,
       rows_ AS rows, updates, levels,
       (levels * 10 // 2)::BIGINT AS wa_leveled,
       levels AS wa_tiered,
       1::BIGINT AS ra_leveled,
       greatest(levels, 1)::BIGINT AS ra_tiered,
       (updates * 10 > rows_) AS recommend_tiered
FROM leveled ORDER BY day_ts
"""

def _kcore_sql(rounds: int = 8) -> str:
    steps = []
    for i in range(rounds):
        # MATERIALIZED: DuckDB inlines plain CTEs, which would expand
        # the peel chain ~3^rounds times (the dtw oracle precedent)
        steps.append(f"""n{i + 1} AS MATERIALIZED (
  SELECT u FROM (
    SELECT u FROM e{i} UNION ALL SELECT v FROM e{i}) b
  GROUP BY u HAVING count(*) >= 2),
e{i + 1} AS MATERIALIZED (
  SELECT e.u, e.v FROM e{i} e
  WHERE e.u IN (SELECT u FROM n{i + 1})
    AND e.v IN (SELECT u FROM n{i + 1}))""")
    chain = ",\n".join(steps)
    return f"""
WITH ordered AS (
  SELECT ts::DATE AS d, ts, event_id, user_id FROM events),
raw AS (
  SELECT lag(user_id) OVER (PARTITION BY d ORDER BY ts, event_id) AS src,
         user_id AS dst
  FROM ordered),
e0 AS MATERIALIZED (
  SELECT least(src, dst)::BIGINT AS u, greatest(src, dst)::BIGINT AS v
  FROM raw WHERE src IS NOT NULL AND src <> dst
  GROUP BY 1, 2),
{chain}
SELECT DISTINCT u AS user_id FROM (
  SELECT u FROM e{rounds} UNION ALL SELECT v FROM e{rounds}) m
ORDER BY user_id
"""

ORACLES["kcore_membership"] = _kcore_sql()

ORACLES["link_prediction_scores"] = """
WITH ordered AS (
  SELECT ts::DATE AS d, ts, event_id, user_id FROM events),
raw AS (
  SELECT lag(user_id) OVER (PARTITION BY d ORDER BY ts, event_id) AS src,
         user_id AS dst
  FROM ordered),
edges AS (
  SELECT least(src, dst)::BIGINT AS u, greatest(src, dst)::BIGINT AS v
  FROM raw WHERE src IS NOT NULL AND src <> dst
  GROUP BY 1, 2),
bidir AS (
  SELECT u, v FROM edges UNION ALL SELECT v, u FROM edges),
deg AS (SELECT u, count(*)::BIGINT AS deg FROM bidir GROUP BY 1),
nb AS (SELECT u AS z, v AS n FROM bidir),
wedges AS (
  SELECT l.n AS a, r.n AS b, l.z
  FROM nb l JOIN nb r ON r.z = l.z AND l.n < r.n),
scored AS (
  SELECT a, b, count(*)::BIGINT AS common_neighbors,
         sum(1000000 // deg)::BIGINT AS ra_micro
  FROM wedges w JOIN deg ON deg.u = w.z
  GROUP BY 1, 2),
nonadj AS (
  SELECT s.* FROM scored s
  WHERE NOT EXISTS (
    SELECT 1 FROM edges e WHERE e.u = s.a AND e.v = s.b))
SELECT a, b, common_neighbors, ra_micro
FROM nonadj
ORDER BY common_neighbors DESC, ra_micro DESC, a, b
LIMIT 20
"""

ORACLES["icc_user_repeatability"] = """
WITH counts AS (
  SELECT user_id, floor(floor(epoch(ts))::BIGINT / 86400)::BIGINT AS day,
         count(*)::BIGINT AS x
  FROM events GROUP BY 1, 2),
users AS (SELECT DISTINCT user_id FROM counts),
days AS (SELECT DISTINCT day FROM counts),
grid AS (
  SELECT u.user_id, d.day, coalesce(c.x, 0)::BIGINT AS x
  FROM users u CROSS JOIN days d
  LEFT JOIN counts c ON c.user_id = u.user_id AND c.day = d.day),
per_user AS (
  SELECT user_id, sum(x)::HUGEINT AS t_u,
         sum(x::HUGEINT * x::HUGEINT) AS s2_u,
         count(*)::HUGEINT AS d
  FROM grid GROUP BY 1),
s AS (
  SELECT count(*)::HUGEINT AS u, max(d) AS d, sum(t_u) AS t,
         sum(t_u * t_u) AS s1, sum(s2_u) AS s2
  FROM per_user),
f AS (
  SELECT u, d,
         (u * s1 - t * t) AS ssb,
         (u * d * s2 - u * s1) AS ssw
  FROM s)
SELECT u::BIGINT AS n_users, d::BIGINT AS n_days,
       CASE WHEN (u * (d - 1) * ssb + (d - 1) * (u - 1) * ssw) <> 0
            THEN (u * (d - 1) * ssb - (u - 1) * ssw)::DOUBLE
                 / (u * (d - 1) * ssb
                    + (d - 1) * (u - 1) * ssw)::DOUBLE
       END AS icc
FROM f
"""

ORACLES["mann_whitney_u"] = """
WITH base AS (
  SELECT event_type,
         floor(value * 100)::BIGINT AS vq,
         CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS we
  FROM events),
counts AS (
  SELECT event_type, vq,
         count(*)::BIGINT AS t,
         sum(we)::BIGINT AS t_we
  FROM base GROUP BY 1, 2),
staged AS (
  SELECT event_type, t, t_we,
         coalesce(sum(t) OVER (PARTITION BY event_type ORDER BY vq
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             0)::BIGINT AS c_less
  FROM counts),
agg AS (
  SELECT event_type,
         sum(t)::DECIMAL(38,0) AS n,
         sum(t_we)::DECIMAL(38,0) AS n1,
         sum(t_we::DECIMAL(38,0)
             * (2 * c_less + t + 1)::DECIMAL(38,0)) AS r2_we,
         sum(t::DECIMAL(38,0) * t::DECIMAL(38,0) * t::DECIMAL(38,0)
             - t::DECIMAL(38,0)) AS tie_t
  FROM staged GROUP BY 1),
alg AS (
  SELECT event_type, n, n1, (n - n1) AS n2,
         (r2_we - n1 * (n1 + 1)) AS u2,
         ((r2_we - n1 * (n1 + 1)) - n1 * (n - n1))::DOUBLE AS num,
         (n1 * (n - n1))::DOUBLE AS a,
         (n * n * n - n - tie_t)::DOUBLE AS b,
         (12 * n * (n - 1))::DOUBLE AS c
  FROM agg)
SELECT event_type,
       n2::BIGINT AS n_weekday,
       n1::BIGINT AS n_weekend,
       u2::BIGINT AS u2_weekend,
       num / (2.0 * sqrt(a * b / c)) AS z,
       num / a AS rank_biserial
FROM alg
WHERE n1 >= 2 AND n2 >= 2 AND b > 0
ORDER BY event_type
"""

ORACLES["runs_up_down"] = """
WITH base AS (
  SELECT event_type, ts, event_id::BIGINT AS event_id,
         floor(value * 100)::BIGINT AS vq
  FROM events),
stepped AS (
  SELECT event_type, ts, event_id,
         vq - lag(vq) OVER (PARTITION BY event_type
                            ORDER BY ts, event_id) AS d
  FROM base),
nz AS (
  SELECT event_type, ts, event_id,
         CASE WHEN d > 0 THEN 1 ELSE -1 END AS sgn
  FROM stepped WHERE d IS NOT NULL AND d <> 0),
flagged AS (
  SELECT event_type, sgn,
         CASE WHEN lag(sgn) OVER w IS NOT NULL
                   AND lag(sgn) OVER w <> sgn THEN 1 ELSE 0 END AS flip
  FROM nz
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)),
agg AS (
  SELECT event_type,
         (count(*) + 1)::BIGINT AS n_eff,
         (1 + sum(flip))::BIGINT AS runs
  FROM flagged GROUP BY 1),
alg AS (
  SELECT event_type, n_eff, runs,
         (2.0 * n_eff::DOUBLE - 1.0) / 3.0 AS er,
         (16.0 * n_eff::DOUBLE - 29.0) / 90.0 AS varr
  FROM agg WHERE n_eff >= 3)
SELECT event_type, n_eff, runs,
       er AS expected_runs,
       (runs::DOUBLE - er) / sqrt(varr) AS z,
       CASE WHEN abs((runs::DOUBLE - er) / sqrt(varr))
                 <= 1.959963984540054 THEN 'random'
            WHEN runs::DOUBLE < er THEN 'trending'
            ELSE 'oscillating' END AS pattern
FROM alg
ORDER BY event_type
"""

ORACLES["phi_association"] = """
WITH base AS (
  SELECT event_type, ts, event_id::BIGINT AS event_id,
         floor(value * 100)::BIGINT AS vq,
         CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS we
  FROM events),
ranked AS (
  SELECT event_type, vq,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY vq, ts, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type)::BIGINT AS n_all
  FROM base),
med AS (
  SELECT event_type, vq AS med FROM ranked
  WHERE rn = (n_all + 1) // 2),
cells AS (
  SELECT b.event_type,
         sum(CASE WHEN b.vq > m.med AND b.we = 1 THEN 1 ELSE 0 END)
           ::BIGINT AS a,
         sum(CASE WHEN b.vq > m.med AND b.we = 0 THEN 1 ELSE 0 END)
           ::BIGINT AS b,
         sum(CASE WHEN b.vq <= m.med AND b.we = 1 THEN 1 ELSE 0 END)
           ::BIGINT AS c,
         sum(CASE WHEN b.vq <= m.med AND b.we = 0 THEN 1 ELSE 0 END)
           ::BIGINT AS d
  FROM base b JOIN med m USING (event_type)
  GROUP BY 1)
SELECT event_type, a, b, c, d,
       (a::DOUBLE * d::DOUBLE - b::DOUBLE * c::DOUBLE)
         / (sqrt(((a + b) * (c + d))::DOUBLE)
            * sqrt(((a + c) * (b + d))::DOUBLE)) AS phi
FROM cells
WHERE a + b > 0 AND c + d > 0 AND a + c > 0 AND b + d > 0
ORDER BY event_type
"""

ORACLES["friedman_test"] = """
WITH counts AS (
  SELECT (epoch_ms(ts) // 86400000)::BIGINT AS day, event_type,
         count(*)::BIGINT AS x
  FROM events GROUP BY 1, 2),
days AS (SELECT DISTINCT day FROM counts),
types AS (SELECT DISTINCT event_type FROM counts),
grid AS (
  SELECT d.day, t.event_type, coalesce(c.x, 0)::BIGINT AS x
  FROM days d CROSS JOIN types t
  LEFT JOIN counts c ON c.day = d.day AND c.event_type = t.event_type),
tallies AS (
  SELECT day, x, count(*)::BIGINT AS t FROM grid GROUP BY 1, 2),
staged AS (
  SELECT day, x, t,
         coalesce(sum(t) OVER (PARTITION BY day ORDER BY x
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             0)::BIGINT AS c_less
  FROM tallies),
ranked AS (
  SELECT g.day, g.event_type,
         (2 * s.c_less + s.t + 1)::BIGINT AS s2
  FROM grid g JOIN staged s ON s.day = g.day AND s.x = g.x),
per_type AS (
  SELECT event_type,
         sum(s2)::DECIMAL(38,0) AS r2,
         count(*)::DECIMAL(38,0) AS n
  FROM ranked GROUP BY 1),
ties AS (
  SELECT sum(t::DECIMAL(38,0) * t::DECIMAL(38,0) * t::DECIMAL(38,0)
             - t::DECIMAL(38,0)) AS tie_t
  FROM staged),
km AS (
  SELECT count(*)::DECIMAL(38,0) AS k, max(n) AS n FROM per_type),
s4 AS (
  SELECT km.k, km.n,
         sum((p.r2 - p.n * (km.k + 1)) * (p.r2 - p.n * (km.k + 1)))
           AS s4
  FROM per_type p CROSS JOIN km
  GROUP BY 1, 2)
SELECT s4.n::BIGINT AS n_days,
       s4.k::BIGINT AS k_types,
       (3 * (s4.k - 1) * s4.s4)::DOUBLE
         / ((s4.k - 1) * s4.n * s4.k * (s4.k + 1) - t.tie_t)::DOUBLE
         AS q
FROM s4 CROSS JOIN ties t
WHERE (s4.k - 1) * s4.n * s4.k * (s4.k + 1) - t.tie_t > 0
"""

ORACLES["ansari_bradley"] = """
WITH base AS (
  SELECT event_type, ts, event_id::BIGINT AS event_id,
         floor(value * 100)::BIGINT AS vq,
         CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END AS we
  FROM events),
scored AS (
  SELECT event_type, we,
         least(rn, n_all + 1 - rn)::BIGINT AS a
  FROM (
    SELECT event_type, we,
           row_number() OVER (PARTITION BY event_type
                              ORDER BY vq, ts, event_id)::BIGINT AS rn,
           count(*) OVER (PARTITION BY event_type)::BIGINT AS n_all
    FROM base)),
agg AS (
  SELECT event_type,
         count(*)::DECIMAL(38,0) AS n,
         sum(we)::DECIMAL(38,0) AS n1,
         sum(a * we)::DECIMAL(38,0) AS w,
         sum(a)::DECIMAL(38,0) AS s,
         sum(a::DECIMAL(38,0) * a::DECIMAL(38,0)) AS s2
  FROM scored GROUP BY 1),
alg AS (
  SELECT event_type, n, n1, (n - n1) AS n2, w,
         (n * w - n1 * s)::DOUBLE AS num,
         (n * s2 - s * s)::DOUBLE AS d1,
         (n1 * (n - n1))::DOUBLE AS d2
  FROM agg)
SELECT event_type,
       n2::BIGINT AS n_weekday,
       n1::BIGINT AS n_weekend,
       w::BIGINT AS w_weekend,
       num / sqrt(d2 * d1 / (n - 1)::DOUBLE) AS z,
       CASE WHEN num / sqrt(d2 * d1 / (n - 1)::DOUBLE)
                 < -1.959963984540054 THEN 'weekend_wider'
            WHEN num / sqrt(d2 * d1 / (n - 1)::DOUBLE)
                 > 1.959963984540054 THEN 'weekend_narrower'
            ELSE 'similar' END AS spread
FROM alg
WHERE n1 >= 2 AND n2 >= 2 AND d1 > 0
ORDER BY event_type
"""

ORACLES["jonckheere_trend"] = """
WITH base AS (
  SELECT event_type, (hour(ts) // 6)::INT AS band,
         floor(value * 100)::BIGINT AS vq
  FROM events),
c AS (
  SELECT event_type, band, vq, count(*)::BIGINT AS c
  FROM base GROUP BY 1, 2, 3),
axis AS (SELECT DISTINCT event_type, vq FROM c),
bands AS (SELECT unnest([0, 1, 2, 3])::INT AS band),
grid AS (
  SELECT a.event_type, b.band, a.vq, coalesce(c.c, 0)::BIGINT AS c
  FROM axis a CROSS JOIN bands b
  LEFT JOIN c ON c.event_type = a.event_type AND c.band = b.band
             AND c.vq = a.vq),
cum AS (
  SELECT event_type, band, vq, c,
         coalesce(sum(c) OVER (PARTITION BY event_type, band
             ORDER BY vq
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             0)::BIGINT AS cl
  FROM grid),
u2j AS (
  SELECT g2.event_type,
         sum(g2.c::DECIMAL(38,0)
             * (2 * g1.cl + g1.c)::DECIMAL(38,0)) AS u2j
  FROM cum g2 JOIN cum g1
    ON g1.event_type = g2.event_type AND g1.vq = g2.vq
   AND g1.band < g2.band
  GROUP BY 1),
ng AS (
  SELECT event_type, band, sum(c)::BIGINT AS ng
  FROM c GROUP BY 1, 2),
gsum AS (
  SELECT event_type,
         sum(ng)::DECIMAL(38,0) AS nn,
         sum(ng::DECIMAL(38,0) * ng::DECIMAL(38,0)) AS sum_n2,
         sum(ng::DECIMAL(38,0) * (ng - 1)::DECIMAL(38,0)
             * (2 * ng + 5)::DECIMAL(38,0)) AS a_g,
         sum(ng::DECIMAL(38,0) * (ng - 1)::DECIMAL(38,0)
             * (ng - 2)::DECIMAL(38,0)) AS b_g,
         sum(ng::DECIMAL(38,0) * (ng - 1)::DECIMAL(38,0)) AS c_g
  FROM ng GROUP BY 1),
tt AS (
  SELECT event_type, vq, sum(c)::BIGINT AS t
  FROM c GROUP BY 1, 2),
tsum AS (
  SELECT event_type,
         sum(t::DECIMAL(38,0) * (t - 1)::DECIMAL(38,0)
             * (2 * t + 5)::DECIMAL(38,0)) AS a_t,
         sum(t::DECIMAL(38,0) * (t - 1)::DECIMAL(38,0)
             * (t - 2)::DECIMAL(38,0)) AS b_t,
         sum(t::DECIMAL(38,0) * (t - 1)::DECIMAL(38,0)) AS c_t
  FROM tt GROUP BY 1),
alg AS (
  SELECT j.event_type, g.nn, j.u2j,
         (2 * j.u2j - (g.nn * g.nn - g.sum_n2))::DOUBLE AS num,
         (g.nn * (g.nn - 1) * (2 * g.nn + 5) - g.a_g - t.a_t)::DOUBLE
           / 72.0 AS term1,
         g.b_g::DOUBLE * (t.b_t::DOUBLE
           / (36 * g.nn * (g.nn - 1) * (g.nn - 2))::DOUBLE) AS term2,
         (g.c_g::DOUBLE * t.c_t::DOUBLE)
           / (8 * g.nn * (g.nn - 1))::DOUBLE AS term3
  FROM u2j j JOIN gsum g USING (event_type)
  JOIN tsum t USING (event_type))
SELECT event_type,
       nn::BIGINT AS n_total,
       u2j::BIGINT AS u2j,
       num / (4.0 * sqrt(term1 + term2 + term3)) AS z,
       CASE WHEN num / (4.0 * sqrt(term1 + term2 + term3))
                 > 1.959963984540054 THEN 'increasing'
            WHEN num / (4.0 * sqrt(term1 + term2 + term3))
                 < -1.959963984540054 THEN 'decreasing'
            ELSE 'none' END AS trend
FROM alg
WHERE nn >= 3 AND term1 + term2 + term3 > 0
ORDER BY event_type
"""

ORACLES["croston_intermittent"] = """
WITH RECURSIVE c AS (
  SELECT user_id, event_type,
         (epoch_ms(ts) // 3600000)::BIGINT AS h,
         count(*)::BIGINT AS d
  FROM events GROUP BY 1, 2, 3),
pts AS (
  SELECT user_id, event_type, h, d,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY h) AS rn,
         coalesce(h - lag(h) OVER (PARTITION BY user_id, event_type
                                   ORDER BY h), 1)::BIGINT AS gap
  FROM c),
cr AS (
  SELECT user_id, event_type, h, d, rn,
         d::DOUBLE AS z,
         CAST(1 AS DOUBLE) AS p
  FROM pts WHERE rn = 1
  UNION ALL
  SELECT n.user_id, n.event_type, n.h, n.d, n.rn,
         0.5 * n.d::DOUBLE + 0.5 * s.z AS z,
         0.5 * n.gap::DOUBLE + 0.5 * s.p AS p
  FROM cr s JOIN pts n
    ON n.user_id = s.user_id AND n.event_type = s.event_type
   AND n.rn = s.rn + 1)
SELECT user_id, event_type,
       to_timestamp(h * 3600)::TIMESTAMP AS bucket_ts,
       d AS demand,
       z AS croston_z,
       p AS croston_p,
       z / p AS croston_forecast
FROM cr
"""

ORACLES["promql_over_time"] = """
WITH base AS (
  SELECT user_id, event_type, ts, event_id::BIGINT AS event_id,
         floor(value * 100)::BIGINT AS vq
  FROM events)
SELECT user_id, event_type, ts, event_id,
       (min(vq) OVER wf)::DOUBLE / 100.0 AS mn_10,
       (max(vq) OVER wf)::DOUBLE / 100.0 AS mx_10,
       (sum(vq) OVER wf)::DOUBLE / 100.0 AS sum_10,
       (sum(vq) OVER wf)::DOUBLE
         / ((count(vq) OVER wf) * 100)::DOUBLE AS avg_10,
       (count(vq) OVER wf)::BIGINT AS cnt_10
FROM base
WINDOW wf AS (PARTITION BY user_id, event_type ORDER BY ts
              ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
"""

ORACLES["dau_wau_mau_stickiness"] = """
WITH ud AS (
  SELECT DISTINCT user_id,
         (epoch_ms(ts) // 86400000)::BIGINT AS day
  FROM events),
dau AS (
  SELECT day, count(*)::BIGINT AS dau FROM ud GROUP BY 1),
wau AS (
  SELECT day, count(*)::BIGINT AS wau FROM (
    SELECT DISTINCT user_id, unnest(generate_series(day, day + 6)) AS day
    FROM ud) GROUP BY 1),
mau AS (
  SELECT day, count(*)::BIGINT AS mau FROM (
    SELECT DISTINCT user_id, unnest(generate_series(day, day + 29)) AS day
    FROM ud) GROUP BY 1)
SELECT to_timestamp(dau.day * 86400)::TIMESTAMP AS day_ts,
       dau.dau, wau.wau, mau.mau,
       dau.dau::DOUBLE / mau.mau::DOUBLE AS stickiness
FROM dau JOIN wau ON wau.day = dau.day
JOIN mau ON mau.day = dau.day
ORDER BY day_ts
"""

ORACLES["apdex_daily"] = """
WITH base AS (
  SELECT event_type,
         (epoch_ms(ts) // 86400000)::BIGINT AS day,
         floor(value * 100)::BIGINT AS vq
  FROM events),
agg AS (
  SELECT event_type, day,
         count(*)::BIGINT AS n,
         sum(CASE WHEN vq <= 150 THEN 1 ELSE 0 END)::BIGINT AS s,
         sum(CASE WHEN vq > 150 AND vq <= 600 THEN 1 ELSE 0 END)::BIGINT
           AS t
  FROM base GROUP BY 1, 2)
SELECT event_type,
       to_timestamp(day * 86400)::TIMESTAMP AS day_ts,
       n, s AS satisfied, t AS tolerating,
       (n - s - t)::BIGINT AS frustrated,
       (2 * s + t)::DOUBLE / (2 * n)::DOUBLE AS apdex,
       CASE WHEN (2 * s + t)::DOUBLE / (2 * n)::DOUBLE >= 0.94
              THEN 'excellent'
            WHEN (2 * s + t)::DOUBLE / (2 * n)::DOUBLE >= 0.85
              THEN 'good'
            WHEN (2 * s + t)::DOUBLE / (2 * n)::DOUBLE >= 0.70
              THEN 'fair'
            WHEN (2 * s + t)::DOUBLE / (2 * n)::DOUBLE >= 0.50
              THEN 'poor'
            ELSE 'unacceptable' END AS rating
FROM agg
ORDER BY event_type, day_ts
"""

ORACLES["tail_at_scale_fanout"] = """
WITH counts AS (
  SELECT event_type, floor(value * 100)::BIGINT AS vq,
         count(*)::BIGINT AS c
  FROM events GROUP BY 1, 2),
cum AS (
  SELECT event_type, vq,
         sum(c) OVER (PARTITION BY event_type ORDER BY vq
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
           AS cum
  FROM counts),
totals AS (
  SELECT event_type, sum(c)::BIGINT AS n FROM counts GROUP BY 1),
ks AS (SELECT unnest([1, 2, 4, 8])::INT AS k),
staged AS (
  SELECT c.event_type, k.k, t.n, c.vq
  FROM cum c JOIN totals t USING (event_type)
  CROSS JOIN ks k
  WHERE 100 * (CASE WHEN k.k = 1 THEN c.cum::DECIMAL(38,0)
                    WHEN k.k = 2 THEN c.cum::DECIMAL(38,0)
                                      * c.cum::DECIMAL(38,0)
                    WHEN k.k = 4 THEN (c.cum::DECIMAL(38,0)
                                       * c.cum::DECIMAL(38,0))
                                      * (c.cum::DECIMAL(38,0)
                                         * c.cum::DECIMAL(38,0))
                    ELSE ((c.cum::DECIMAL(38,0) * c.cum::DECIMAL(38,0))
                          * (c.cum::DECIMAL(38,0) * c.cum::DECIMAL(38,0)))
                         * ((c.cum::DECIMAL(38,0) * c.cum::DECIMAL(38,0))
                            * (c.cum::DECIMAL(38,0)
                               * c.cum::DECIMAL(38,0))) END)
        >= 99 * (CASE WHEN k.k = 1 THEN t.n::DECIMAL(38,0)
                      WHEN k.k = 2 THEN t.n::DECIMAL(38,0)
                                        * t.n::DECIMAL(38,0)
                      WHEN k.k = 4 THEN (t.n::DECIMAL(38,0)
                                         * t.n::DECIMAL(38,0))
                                        * (t.n::DECIMAL(38,0)
                                           * t.n::DECIMAL(38,0))
                      ELSE ((t.n::DECIMAL(38,0) * t.n::DECIMAL(38,0))
                            * (t.n::DECIMAL(38,0) * t.n::DECIMAL(38,0)))
                           * ((t.n::DECIMAL(38,0) * t.n::DECIMAL(38,0))
                              * (t.n::DECIMAL(38,0)
                                 * t.n::DECIMAL(38,0))) END))
SELECT event_type, k, max(n)::BIGINT AS n_samples,
       min(vq)::DOUBLE / 100.0 AS p99_effective
FROM staged GROUP BY 1, 2
ORDER BY event_type, k
"""

ORACLES["hedged_request_planner"] = """
WITH counts AS (
  SELECT event_type, floor(value * 100)::BIGINT AS vq,
         count(*)::BIGINT AS c
  FROM events GROUP BY 1, 2),
bounds AS (
  SELECT event_type, max(vq) AS mx, sum(c)::BIGINT AS n
  FROM counts GROUP BY 1),
axis AS (
  SELECT event_type, n, unnest(generate_series(0, mx)) AS t
  FROM bounds),
surv AS (
  SELECT a.event_type, a.n, a.t,
         (a.n - sum(coalesce(c.c, 0)) OVER (
             PARTITION BY a.event_type ORDER BY a.t
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT
           AS s
  FROM axis a LEFT JOIN counts c
    ON c.event_type = a.event_type AND c.vq = a.t),
dsel AS (
  SELECT event_type, min(t) AS d FROM surv
  WHERE 20 * (n - s) >= 19 * n GROUP BY 1),
base AS (
  SELECT s.event_type, max(s.n)::BIGINT AS n, max(d.d)::BIGINT AS d,
         sum(s.s)::DECIMAL(38,0) AS ex_num,
         sum(CASE WHEN s.t < d.d THEN s.s ELSE 0 END)::DECIMAL(38,0)
           AS head_num
  FROM surv s JOIN dsel d USING (event_type) GROUP BY 1),
tailsum AS (
  SELECT l.event_type,
         sum(l.s::DECIMAL(38,0) * r.s)::DECIMAL(38,0) AS tail_num
  FROM (SELECT s.event_type, s.t, s.s, d.d
        FROM surv s JOIN dsel d USING (event_type)
        WHERE s.t >= d.d) l
  JOIN surv r ON r.event_type = l.event_type AND r.t = l.t - l.d
  GROUP BY 1),
alg AS (
  SELECT b.event_type, b.n, b.d,
         b.ex_num::DOUBLE / b.n::DOUBLE AS e_base,
         (b.n::DECIMAL(38,0) * b.head_num + t.tail_num)::DOUBLE
           / (b.n::DECIMAL(38,0) * b.n::DECIMAL(38,0))::DOUBLE
           AS e_hedged
  FROM base b JOIN tailsum t USING (event_type))
SELECT event_type, n AS n_samples,
       d::DOUBLE / 100.0 AS hedge_at_p95,
       e_base / 100.0 AS mean_latency,
       e_hedged / 100.0 AS mean_latency_hedged,
       1.0 - e_hedged / e_base AS latency_reduction
FROM alg
ORDER BY event_type
"""

ORACLES["tied_request_planner"] = """
WITH counts AS (
  SELECT event_type, floor(value * 100)::BIGINT AS vq,
         count(*)::BIGINT AS c
  FROM events GROUP BY 1, 2),
bounds AS (
  SELECT event_type, max(vq) AS mx, sum(c)::BIGINT AS n
  FROM counts GROUP BY 1),
axis AS (
  SELECT event_type, n, unnest(generate_series(0, mx)) AS t
  FROM bounds),
surv AS (
  SELECT a.event_type, a.n, a.t,
         (a.n - sum(coalesce(c.c, 0)) OVER (
             PARTITION BY a.event_type ORDER BY a.t
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT
           AS s
  FROM axis a LEFT JOIN counts c
    ON c.event_type = a.event_type AND c.vq = a.t),
agg AS (
  SELECT event_type, max(n)::BIGINT AS n,
         sum(s)::HUGEINT AS ex_num,
         sum(s::HUGEINT * s::HUGEINT)::HUGEINT AS tied_num,
         min(CASE WHEN 100 * (n - s) >= 99 * n THEN t END) AS p99q,
         min(CASE WHEN (n::HUGEINT * n - s::HUGEINT * s) * 100
                       >= n::HUGEINT * n * 99 THEN t END) AS p99q_tied
  FROM surv GROUP BY 1),
alg AS (
  SELECT event_type, n, p99q, p99q_tied,
         ex_num::DOUBLE / n::DOUBLE AS e_base,
         tied_num::DOUBLE / (n::HUGEINT * n)::DOUBLE AS e_tied
  FROM agg)
SELECT event_type, n AS n_samples,
       e_base / 100.0 AS mean_latency,
       e_tied / 100.0 AS mean_latency_tied,
       1.0 - e_tied / e_base AS latency_reduction,
       p99q::DOUBLE / 100.0 AS p99,
       p99q_tied::DOUBLE / 100.0 AS p99_tied
FROM alg
ORDER BY event_type
"""

ORACLES["kll_range_sketch_readouts"] = """
WITH q AS (
  SELECT event_type, floor(value * 100)::BIGINT AS vq FROM events),
b AS (
  SELECT event_type, floor(vq / 5000)::BIGINT AS bucket, vq FROM q),
agg AS (
  SELECT event_type, bucket, count(*)::BIGINT AS n_bucket,
         min(vq) AS mn, max(vq) AS mx
  FROM b GROUP BY 1, 2)
SELECT event_type, bucket,
       bucket::DOUBLE * 50.0 AS bucket_lo,
       n_bucket,
       mn::DOUBLE / 100.0 AS sketch_min,
       mx::DOUBLE / 100.0 AS sketch_max,
       (sum(n_bucket) OVER (
          PARTITION BY event_type ORDER BY bucket
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT
         AS rank_at_upper
FROM agg
ORDER BY event_type, bucket
"""

ORACLES["kalman_hourly_rate"] = """
WITH RECURSIVE c AS (
  SELECT event_type, (epoch_ms(ts) // 3600000)::BIGINT AS h,
         count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2),
bounds AS (
  SELECT event_type, min(h) AS mh, max(h) AS xh FROM c GROUP BY 1),
axis AS (
  SELECT event_type, unnest(generate_series(mh, xh)) AS h FROM bounds),
dense AS (
  SELECT a.event_type, a.h, coalesce(c.n, 0)::BIGINT AS n,
         coalesce(c.n, 0)::DOUBLE AS y,
         row_number() OVER (PARTITION BY a.event_type ORDER BY a.h) AS rn
  FROM axis a LEFT JOIN c
    ON c.event_type = a.event_type AND c.h = a.h),
kf AS (
  SELECT event_type, h, n, rn,
         y AS l,
         CAST(NULL AS DOUBLE) AS k,
         CAST(1.0 AS DOUBLE) AS p
  FROM dense WHERE rn = 1
  UNION ALL
  SELECT n2.event_type, n2.h, n2.n, n2.rn,
         s.l + ((s.p + 0.25) / ((s.p + 0.25) + 1.0)) * (n2.y - s.l) AS l,
         (s.p + 0.25) / ((s.p + 0.25) + 1.0) AS k,
         (1.0 - (s.p + 0.25) / ((s.p + 0.25) + 1.0)) * (s.p + 0.25) AS p
  FROM kf s JOIN dense n2
    ON n2.event_type = s.event_type AND n2.rn = s.rn + 1)
SELECT event_type,
       to_timestamp(h * 3600)::TIMESTAMP AS bucket_ts,
       n AS n_events,
       l AS kalman_level,
       k AS kalman_gain,
       p AS kalman_var
FROM kf
"""

ORACLES["erlang_c_staffing"] = """
WITH RECURSIVE base AS (
  SELECT event_type, count(*)::BIGINT AS n_arrivals,
         sum(floor(value * 100)::BIGINT)::BIGINT AS sum_vq,
         (max(epoch_ms(ts) // 1000) - min(epoch_ms(ts) // 1000))::BIGINT
           AS span_s
  FROM events GROUP BY 1),
feas AS (
  SELECT event_type, sum_vq::DOUBLE / (100 * span_s)::DOUBLE AS a
  FROM base WHERE span_s > 0),
erl AS (
  SELECT event_type, a, 0 AS c, CAST(1.0 AS DOUBLE) AS b
  FROM feas
  UNION ALL
  SELECT event_type, a, c + 1, a * b / ((c + 1) + a * b)
  FROM erl WHERE c < 64),
pwrows AS (
  SELECT event_type, a, c, b,
         c * b / (c - a * (1.0 - b)) AS pw
  FROM erl WHERE c >= 1 AND c > a),
pick AS (
  SELECT event_type, min(c) AS c_min FROM pwrows
  WHERE pw <= 0.2 GROUP BY 1)
SELECT bs.event_type, bs.n_arrivals,
       f.a AS offered_load,
       p.c_min::BIGINT AS c_min,
       w.b AS erlang_b,
       w.pw AS p_wait,
       f.a / p.c_min AS utilization
FROM base bs
LEFT JOIN feas f USING (event_type)
LEFT JOIN pick p USING (event_type)
LEFT JOIN pwrows w
  ON w.event_type = bs.event_type AND w.c = p.c_min
ORDER BY event_type
"""

ORACLES["backlog_drain_planner"] = """
WITH c AS (
  SELECT event_type, (epoch_ms(ts) // 60000)::BIGINT AS m,
         count(*)::BIGINT AS a
  FROM events GROUP BY 1, 2),
bounds AS (
  SELECT event_type, min(m) AS mm, max(m) AS xm,
         sum(a)::BIGINT AS n
  FROM c GROUP BY 1),
axis AS (
  SELECT event_type, n, (xm - mm + 1)::BIGINT AS mcount, mm AS m0,
         unnest(generate_series(mm, xm)) AS m
  FROM bounds),
dense AS (
  SELECT a2.event_type, a2.n, a2.mcount, a2.m0, a2.m,
         coalesce(c.a, 0)::BIGINT AS a,
         ((a2.n + a2.mcount - 1) // a2.mcount)::BIGINT AS cap
  FROM axis a2 LEFT JOIN c
    ON c.event_type = a2.event_type AND c.m = a2.m),
swept AS (
  SELECT event_type, m, cap,
         (sum(a) OVER w - cap * (m - m0 + 1))::BIGINT AS drift
  FROM dense
  WINDOW w AS (PARTITION BY event_type ORDER BY m
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
backlog AS (
  SELECT event_type, m, cap,
         (drift - least(0, min(drift) OVER w))::BIGINT AS b
  FROM swept
  WINDOW w AS (PARTITION BY event_type ORDER BY m
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
mx AS (
  SELECT event_type, m, cap, b,
         max(b) OVER (PARTITION BY event_type) AS mxb
  FROM backlog)
SELECT event_type,
       max(cap) AS capacity_per_min,
       max(b) AS max_backlog,
       to_timestamp(min(CASE WHEN b = mxb THEN m END) * 60)::TIMESTAMP
         AS peak_minute,
       sum(CASE WHEN b > 0 THEN 1 ELSE 0 END)::BIGINT AS congested_minutes,
       sum(b)::BIGINT AS queued_request_minutes,
       to_timestamp(max(CASE WHEN b > 0 THEN m END) * 60)::TIMESTAMP
         AS last_congested_minute
FROM mx
GROUP BY event_type
ORDER BY event_type
"""

ORACLES["retry_budget_planner"] = """
WITH base AS (
  SELECT event_type, count(*)::BIGINT AS n,
         sum(CASE WHEN floor(value * 100)::BIGINT >= 200
                  THEN 1 ELSE 0 END)::BIGINT AS s
  FROM events GROUP BY 1),
ks AS (
  SELECT event_type, n, s, unnest(generate_series(0, 3)) AS k
  FROM base),
pw AS (
  SELECT event_type, n, s, k,
         n::HUGEINT AS n1, s::HUGEINT AS s1,
         n::HUGEINT * n AS n2, s::HUGEINT * s AS s2,
         n::HUGEINT * n * n AS n3, s::HUGEINT * s * s AS s3,
         n::HUGEINT * n * n * n AS n4, s::HUGEINT * s * s * s AS s4
  FROM ks),
alg AS (
  SELECT event_type, n, s, k,
         CASE k WHEN 0 THEN 1::HUGEINT
                WHEN 1 THEN n1 + s1
                WHEN 2 THEN n2 + s1 * n1 + s2
                ELSE n3 + s1 * n2 + s2 * n1 + s3 END AS att_num,
         CASE k WHEN 0 THEN 1::HUGEINT WHEN 1 THEN n1
                WHEN 2 THEN n2 ELSE n3 END AS att_den,
         CASE k WHEN 0 THEN s1 WHEN 1 THEN s2
                WHEN 2 THEN s3 ELSE s4 END AS fail_num,
         CASE k WHEN 0 THEN n1 WHEN 1 THEN n2
                WHEN 2 THEN n3 ELSE n4 END AS fail_den
  FROM pw)
SELECT event_type, n, s, k,
       s::DOUBLE / n::DOUBLE AS fail_rate,
       fail_num::DOUBLE / fail_den::DOUBLE AS p_all_fail,
       att_num::DOUBLE / att_den::DOUBLE AS exp_attempts,
       fail_num * 1000 <= fail_den AS meets_999
FROM alg
ORDER BY event_type, k
"""

ORACLES["mg1_wait_audit"] = """
WITH base AS (
  SELECT event_type, count(*)::BIGINT AS n,
         sum(floor(value * 100)::BIGINT)::BIGINT AS s1,
         sum(floor(value * 100)::BIGINT * floor(value * 100)::BIGINT)::BIGINT
           AS s2,
         (max(epoch_ms(ts) // 1000) - min(epoch_ms(ts) // 1000))::BIGINT AS t
  FROM events GROUP BY 1),
alg AS (
  SELECT event_type, n, s1, s2, t,
         100::HUGEINT * t AS ht,
         100::HUGEINT * t - s1 AS slack
  FROM base WHERE t > 0)
SELECT event_type, n AS n_arrivals,
       s1::DOUBLE / (n::DOUBLE * 100.0) AS mean_service,
       s1::DOUBLE / ht::DOUBLE AS rho,
       CASE WHEN slack > 0
            THEN s2::DOUBLE / (slack * 200)::DOUBLE END AS mean_wait,
       CASE WHEN slack > 0
            THEN (n::HUGEINT * s2)::DOUBLE
                 / (slack * 200 * t)::DOUBLE END AS mean_queue_len
FROM alg
ORDER BY event_type
"""

ORACLES["mgc_wait_estimate"] = """
WITH RECURSIVE base AS (
  SELECT event_type, count(*)::BIGINT AS n,
         sum(floor(value * 100)::BIGINT)::BIGINT AS s1,
         sum(floor(value * 100)::BIGINT * floor(value * 100)::BIGINT)::BIGINT
           AS s2,
         (max(epoch_ms(ts) // 1000) - min(epoch_ms(ts) // 1000))::BIGINT AS t
  FROM events GROUP BY 1),
feas AS (
  SELECT event_type,
         s1::DOUBLE / (100 * t)::DOUBLE AS a,
         n::DOUBLE / t::DOUBLE AS lam,
         (100 * n)::DOUBLE / s1::DOUBLE AS mu,
         (n::HUGEINT * s2 - s1::HUGEINT * s1)::DOUBLE
           / (s1::HUGEINT * s1)::DOUBLE AS cv2
  FROM base WHERE t > 0 AND s1 > 0),
erl AS (
  SELECT event_type, a, lam, mu, cv2, 0 AS c, CAST(1.0 AS DOUBLE) AS b
  FROM feas
  UNION ALL
  SELECT event_type, a, lam, mu, cv2, c + 1, a * b / ((c + 1) + a * b)
  FROM erl WHERE c < 64),
pwrows AS (
  SELECT event_type, a, lam, mu, cv2, c, b,
         c * b / (c - a * (1.0 - b)) AS pw
  FROM erl WHERE c >= 1 AND c > a),
pick AS (
  SELECT event_type, min(c) AS c_min FROM pwrows
  WHERE pw <= 0.2 GROUP BY 1),
alg AS (
  SELECT w.event_type, w.a, w.cv2, w.c,
         w.pw / (w.c * w.mu - w.lam) AS wm
  FROM pwrows w JOIN pick p
    ON p.event_type = w.event_type AND w.c = p.c_min)
SELECT bs.event_type,
       f.a AS offered_load,
       f.cv2 AS cv2_service,
       g.c::BIGINT AS c_min,
       g.wm AS wait_mmc,
       g.wm * ((1.0 + g.cv2) / 2.0) AS wait_mgc
FROM base bs
LEFT JOIN feas f USING (event_type)
LEFT JOIN (SELECT event_type, c, cv2, wm FROM alg) g USING (event_type)
ORDER BY event_type
"""

ORACLES["harmonic_centrality_2hop"] = """
WITH ordered AS (
  SELECT event_id, ts, user_id, date_trunc('day', ts) AS d FROM events),
raw AS (
  SELECT lag(user_id) OVER (PARTITION BY d ORDER BY ts, event_id) AS src,
         user_id AS dst
  FROM ordered),
euv AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
        FROM raw WHERE src IS NOT NULL AND src <> dst),
adj AS (SELECT u AS a, v AS b FROM euv UNION ALL SELECT v AS a, u AS b FROM euv),
c1 AS (SELECT a, count(*)::BIGINT AS c1 FROM adj GROUP BY 1),
wedges AS (
  SELECT DISTINCT w.a, x.b AS c
  FROM adj w JOIN adj x ON x.a = w.b
  WHERE x.b <> w.a),
d2 AS (
  SELECT w.a, count(*)::BIGINT AS c2
  FROM wedges w
  WHERE NOT EXISTS (
    SELECT 1 FROM adj e WHERE e.a = w.a AND e.b = w.c)
  GROUP BY 1)
SELECT c1.a AS user_id, c1.c1,
       coalesce(d2.c2, 0)::BIGINT AS c2,
       (2 * c1.c1 + coalesce(d2.c2, 0))::BIGINT AS harmonic_x2,
       (2 * c1.c1 + coalesce(d2.c2, 0))::DOUBLE / 2.0 AS harmonic
FROM c1 LEFT JOIN d2 ON d2.a = c1.a
ORDER BY user_id
"""

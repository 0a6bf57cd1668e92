"""DuckDB oracle SQL — one ANSI-SQL equivalent per query in
:mod:`astrospectro_spark.queries`. The driver runs these on the same
parquet tables (pre-registered views) and compares row-count + schema +
order-insensitive value-hash against the Spark result.

Conventions (mirror queries.py): epoch-microsecond BIGINTs for
timestamps, ``round(x, 6)`` on float aggregates, explicit BIGINT casts
on DuckDB window SUMs (they default to HUGEINT).

Negative-zero convention: DuckDB ``round()`` preserves the sign of zero
(``round(-1e-7, 6) = -0.0``) while Spark's ``round`` normalizes to
``+0.0``; the driver hashes raw value bytes, so a single ``-0.0`` row
flips the hash. Every rounded expression that can be negative therefore
carries a trailing ``+ 0`` (IEEE: ``-0.0 + 0 = +0.0``; identity on all
other values incl. NULL/NaN). NumPy-kernel queries (savgol) normalize
on BOTH sides because ``ndarray.round`` also preserves ``-0.0``.
"""

SESSION_CTE = """
WITH gaps AS (
  SELECT event_id, user_id, ts, value, event_type,
         (epoch_us(ts) - lag(epoch_us(ts)) OVER w)::DOUBLE / 1e6 AS gap_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT event_id, user_id, ts, value, event_type,
         CAST(sum(CASE WHEN gap_s > 1800 THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS session_id
  FROM gaps
)
"""

ASOF_CTE = """
WITH anchors AS (
  SELECT user_id, event_id AS anchor_id, ts AS anchor_ts
  FROM events WHERE event_type = 'purchase'
), clicks AS (
  SELECT user_id, event_id, value, ts
  FROM events WHERE event_type = 'click'
), ranked AS (
  SELECT a.anchor_id, a.user_id, c.event_id AS click_id, c.value AS click_value,
         c.ts AS click_ts,
         row_number() OVER (PARTITION BY a.anchor_id
                            ORDER BY c.ts DESC, c.event_id DESC) AS rn
  FROM anchors a LEFT JOIN clicks c
    ON a.user_id = c.user_id AND c.ts <= a.anchor_ts
)
"""

ORACLE_SQL: dict[str, str] = {
    "sessionize": SESSION_CTE
    + """
SELECT event_id, user_id, epoch_us(ts) AS ts_us, session_id,
       CAST(row_number() OVER (PARTITION BY user_id, session_id
                               ORDER BY ts, event_id) AS BIGINT) AS turn_in_session
FROM sess
""",
    "lag_delta": """
SELECT event_id, user_id,
       round(value - lag(value) OVER w, 6) + 0 AS lag1_value_delta,
       round((epoch_us(ts) - lag(epoch_us(ts)) OVER w)::DOUBLE / 1e6, 6) AS lag1_ts_gap_s,
       round(lead(value) OVER w - value, 6) + 0 AS label_lead1_value_delta
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
    "backfill": """
SELECT event_id, user_id,
       last_value(CASE WHEN event_type IN ('purchase','signup') THEN event_type END
                  IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS backfill_marker
FROM events
""",
    "rolling_rate": """
SELECT event_id, user_id,
       count(*) OVER wr AS rate_1d,
       round(sum(value) OVER wr, 6) AS value_sum_1d
FROM events
WINDOW wr AS (PARTITION BY user_id ORDER BY epoch_us(ts)
              RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)
""",
    "cum_role_counts": """
SELECT event_id, user_id,
       CAST(sum(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) OVER w AS BIGINT) AS cum_click,
       CAST(sum(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) OVER w AS BIGINT) AS cum_view,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) OVER w AS BIGINT) AS cum_purchase,
       CAST(sum(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) OVER w AS BIGINT) AS cum_signup,
       CAST(sum(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) OVER w AS BIGINT) AS cum_error
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
    "roll_mean": """
SELECT event_id, user_id,
       round(avg(value) OVER w5, 6) AS roll_mean_value_5,
       round(min(value) OVER w5, 6) AS roll_min_value_5,
       round(max(value) OVER w5, 6) AS roll_max_value_5
FROM events
WINDOW w5 AS (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
""",
    "asof_join": ASOF_CTE
    + """
SELECT anchor_id AS event_id, user_id, click_id AS asof_click_id,
       round(click_value, 6) AS asof_click_value,
       epoch_us(click_ts) AS asof_click_ts_us
FROM ranked WHERE rn = 1
""",
    "asof_join_grouped": ASOF_CTE
    + """
SELECT anchor_id AS event_id, user_id, click_id AS asof_click_id,
       round(click_value, 6) AS asof_click_value,
       epoch_us(click_ts) AS asof_click_ts_us
FROM ranked WHERE rn = 1
""",
    "asof_tolerance": ASOF_CTE.replace("c.ts <= a.anchor_ts", "c.ts <= a.anchor_ts")
    + """
SELECT anchor_id AS event_id, user_id,
       CASE WHEN epoch_us(anchor_ts) - epoch_us(click_ts) <= 21600::BIGINT * 1000000
            THEN click_id END AS asof_click_id,
       CASE WHEN epoch_us(anchor_ts) - epoch_us(click_ts) <= 21600::BIGINT * 1000000
            THEN round(click_value, 6) END AS asof_click_value
FROM (SELECT r.*, a2.anchor_ts
      FROM ranked r JOIN (SELECT event_id AS anchor_id, ts AS anchor_ts
                          FROM events WHERE event_type='purchase') a2 USING (anchor_id))
WHERE rn = 1
""",
    "session_stats": SESSION_CTE
    + """
SELECT user_id, session_id,
       count(*) AS n_events,
       round((max(epoch_us(ts)) - min(epoch_us(ts)))::DOUBLE / 1e6, 6) AS duration_s,
       round(avg(value), 6) AS mean_value,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors
FROM sess GROUP BY user_id, session_id
""",
    "best_match": """
SELECT l_orderkey, first_partkey, first_linenumber, first_shipdate_us
FROM (
  SELECT l_orderkey, l_partkey AS first_partkey,
         CAST(l_linenumber AS BIGINT) AS first_linenumber,
         epoch_us(l_shipdate) AS first_shipdate_us,
         row_number() OVER (PARTITION BY l_orderkey
                            ORDER BY l_shipdate, l_linenumber, l_partkey) AS rn
  FROM lineitem
) WHERE rn = 1
""",
    "ledger_anti_join": """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
    "broadcast_enrich": """
SELECT p_brand,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       count(*) AS n_lines,
       count(DISTINCT s_suppkey) AS n_suppliers
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
GROUP BY p_brand
""",
    "rare_class_filter": """
SELECT user_id, count(*) AS n_events, round(avg(value), 6) AS avg_value
FROM events
WHERE user_id IN (SELECT user_id FROM events GROUP BY user_id HAVING count(*) >= 60)
GROUP BY user_id
""",
    "class_exclusion": """
SELECT event_type, count(*) AS n_events, round(avg(value), 6) AS avg_value
FROM events
WHERE event_type IS NOT NULL AND event_type NOT IN ('error', 'signup')
GROUP BY event_type
""",
    "sentinel_nullify": """
SELECT event_type,
       CAST(sum(CASE WHEN value >= 190.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_nulled,
       round(avg(CASE WHEN value >= 190.0 THEN NULL ELSE value END), 6) AS avg_value_clean
FROM events GROUP BY event_type
""",
    "topk_classes": """
SELECT p_type, count(*) AS n
FROM part GROUP BY p_type
ORDER BY n DESC, p_type ASC LIMIT 10
""",
    "pricing_summary": """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4) AS sum_qty,
       round(sum(l_extendedprice), 4) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
       round(avg(l_quantity), 6) AS avg_qty,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
    "regex_extract": r"""
SELECT regexp_extract(p_type, '^(\w+)', 1) AS type_class,
       count(*) AS n, round(avg(p_retailprice), 6) AS avg_price
FROM part GROUP BY 1
""",
    "regression_slope": """
WITH c AS (
  SELECT user_id, value,
         (epoch_us(ts) - min(epoch_us(ts)) OVER (PARTITION BY user_id))::DOUBLE / 1e6 AS x
  FROM events
)
SELECT user_id,
       round(covar_pop(x, value) / var_pop(x), 6) + 0 AS slope,
       round(corr(x, value), 6) + 0 AS pearson_r,
       count(*) AS n
FROM c GROUP BY user_id
""",
    "class_median_transform": """
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS m
  FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type,
       round(m, 6) AS class_median,
       round(e.value - m, 6) + 0 AS value_dev_class
FROM events e JOIN med USING (event_type)
""",
    "seeded_sample": """
SELECT event_id, user_id, md5('seed42|' || event_id::VARCHAR) AS sample_key
FROM events ORDER BY sample_key LIMIT 100
""",
    "session_profiles": SESSION_CTE
    + """
, wts AS (
  SELECT user_id, session_id, value, greatest(value, 0.0) AS wv,
         (epoch_us(ts) - min(epoch_us(ts))
            OVER (PARTITION BY user_id, session_id))::DOUBLE / 1e6 AS t
  FROM sess
), m AS (
  SELECT user_id, session_id, count(*) AS n_events, max(wv) AS amp,
         sum(t * wv) AS stw, sum(wv) AS tot
  FROM wts GROUP BY user_id, session_id
), mu AS (
  SELECT *, CASE WHEN tot > 0 THEN stw / tot END AS mu FROM m
), v AS (
  SELECT w.user_id, w.session_id,
         sum((w.t - mu.mu) * (w.t - mu.mu) * w.wv) AS svar
  FROM wts w JOIN mu USING (user_id, session_id)
  GROUP BY w.user_id, w.session_id
)
SELECT mu.user_id, mu.session_id, mu.n_events,
       round(CASE WHEN tot > 0 THEN amp END, 6) AS amp,
       round(mu.mu, 4) AS mu_s,
       round(CASE WHEN tot > 0 THEN (2 * sqrt(2 * ln(2))) * sqrt(svar / tot) END, 4)
         AS fwhm_s
FROM mu JOIN v USING (user_id, session_id)
""",
    "poly_residuals": """
WITH xx AS (
  SELECT event_id, user_id, value,
         (epoch_us(ts) - min(epoch_us(ts)) OVER w)::DOUBLE
           / (greatest(max(epoch_us(ts)) OVER w - min(epoch_us(ts)) OVER w, 1))::DOUBLE AS x
  FROM events
  WINDOW w AS (PARTITION BY user_id)
), g AS (
  SELECT user_id, count(*)::DOUBLE AS n,
         sum(x) AS s1, sum(x*x) AS s2, sum(x*x*x) AS s3, sum(x*x*x*x) AS s4,
         sum(value) AS t0, sum(x*value) AS t1, sum(x*x*value) AS t2
  FROM xx GROUP BY user_id
), c AS (
  SELECT user_id, n,
         n*(s2*s4 - s3*s3) - s1*(s1*s4 - s3*s2) + s2*(s1*s3 - s2*s2) AS det,
         t0*(s2*s4 - s3*s3) - s1*(t1*s4 - s3*t2) + s2*(t1*s3 - s2*t2) AS d0,
         n*(t1*s4 - s3*t2) - t0*(s1*s4 - s3*s2) + s2*(s1*t2 - t1*s2) AS d1,
         n*(s2*t2 - s3*t1) - s1*(s1*t2 - s3*t0) + t0*(s1*s3 - s2*s2) AS d2
  FROM g
)
SELECT e.event_id, e.user_id,
       round(CASE WHEN c.n >= 10 AND c.det <> 0
             THEN e.value - (c.d0/c.det + (c.d1/c.det)*e.x + (c.d2/c.det)*e.x*e.x)
             END, 4) + 0 AS residual
FROM xx e JOIN c USING (user_id)
""",
    "sigma_clip_slope": """
WITH xx AS (
  SELECT user_id, value,
         (epoch_us(ts) - min(epoch_us(ts)) OVER (PARTITION BY user_id))::DOUBLE / 1e6 AS x
  FROM events
), f1 AS (
  SELECT user_id, covar_pop(x, value) / var_pop(x) AS sl,
         avg(value) - covar_pop(x, value) / var_pop(x) * avg(x) AS ic
  FROM xx GROUP BY user_id
), r AS (
  SELECT xx.user_id, xx.x, xx.value,
         xx.value - (f1.sl * xx.x + f1.ic) AS resid
  FROM xx JOIN f1 USING (user_id)
), s AS (
  SELECT user_id, stddev_pop(resid) AS sd FROM r GROUP BY user_id
), kept AS (
  SELECT r.user_id, r.x, r.value
  FROM r JOIN s USING (user_id)
  WHERE s.sd = 0 OR abs(r.resid) <= 2.5 * s.sd
)
SELECT user_id,
       round(covar_pop(x, value) / var_pop(x), 8) + 0 AS slope,
       round(avg(value) - covar_pop(x, value) / var_pop(x) * avg(x), 4) + 0 AS intercept
FROM kept GROUP BY user_id
""",
    "winsorize": """
WITH q AS (
  SELECT quantile_cont(value, 0.005) AS lo, quantile_cont(value, 0.995) AS hi
  FROM events
)
SELECT event_type,
       round(avg(ln(1 + least(greatest(value, lo), hi))), 6) AS avg_log1p_winsor,
       round(stddev_pop(least(greatest(value, lo), hi)), 6) AS std_winsor
FROM events CROSS JOIN q
GROUP BY event_type
""",
    "distinct_counts": """
SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
FROM events GROUP BY event_type
""",
    "feature_vector": """
WITH gaps AS (
  SELECT *, (epoch_us(ts) - lag(epoch_us(ts)) OVER w)::DOUBLE / 1e6 AS gap_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT *, CAST(sum(CASE WHEN gap_s > 1800 THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
              AS session_id
  FROM gaps
)
SELECT event_id, user_id, epoch_us(ts) AS ts_us, session_id,
       CAST(row_number() OVER (PARTITION BY user_id, session_id
                               ORDER BY ts, event_id) AS BIGINT) AS turn_in_session,
       round(gap_s, 6) AS lag1_ts_gap_s,
       round(value - lag(value) OVER w, 6) + 0 AS lag1_value_delta,
       last_value(CASE WHEN event_type IN ('purchase','signup') THEN event_type END
                  IGNORE NULLS) OVER wc AS backfill_marker,
       count(*) OVER wr AS rate_1d,
       round(avg(value) OVER w5, 6) AS roll_mean_value_5,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) OVER wc AS BIGINT)
         AS cum_error,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) OVER wc AS BIGINT)
         AS cum_purchase,
       round(lead(value) OVER w - value, 6) + 0 AS label_lead1_value_delta
FROM sess
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
       wc AS (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       wr AS (PARTITION BY user_id ORDER BY epoch_us(ts)
              RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW),
       w5 AS (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
""",
    "feature_vector_wide": """
WITH g AS (
  SELECT *, epoch_us(ts) AS u,
         (epoch_us(ts) - lag(epoch_us(ts)) OVER w)::DOUBLE / 1e6 AS gap_s,
         row_number() OVER w AS rn,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
         CAST(round(value * 100, 0) AS BIGINT) AS vc,
         epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us,
         CASE WHEN event_type IS DISTINCT FROM lag(event_type) OVER w
              THEN 1 ELSE 0 END AS tc
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT *, CASE WHEN gap_s > 1800 THEN 1 ELSE 0 END AS sb,
         least(vc // 100, 1000) AS vi,
         lag(vc) OVER w AS lagvc,
         CASE WHEN value > 150 THEN 1 ELSE 0 END AS hi,
         CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS ef
  FROM g
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s2 AS (
  SELECT *,
         CAST(sum(vc) OVER wc AS BIGINT) AS cvc,
         CAST(sum(vc * vc) OVER wc AS BIGINT) AS cvc2,
         CAST(sum(sb) OVER wc AS BIGINT) AS sid,
         CAST(sum(vi) OVER wc AS BIGINT) AS cvi,
         CAST(sum(vi * vi) OVER wc AS BIGINT) AS cvi2,
         CAST(sum(vi * vi * vi) OVER wc AS BIGINT) AS cvi3,
         CAST(sum(vi * vi * vi * vi) OVER wc AS BIGINT) AS cvi4,
         (u - min(u) OVER wp)::DOUBLE
           / greatest(max(u) OVER wp - min(u) OVER wp, 1)::DOUBLE AS x,
         CASE WHEN sb = 1 OR rn = 1 THEN 0
              ELSE (vc + lagvc) * gap_us END AS seg_sess
  FROM s
  WINDOW wc AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wp AS (PARTITION BY user_id)
), s3 AS (
  SELECT *,
         CAST(rn - coalesce(last_value(CASE WHEN sb = 1 THEN rn - 1 END IGNORE NULLS)
                            OVER wc, 0) AS BIGINT) AS tis,
         cvc - coalesce(last_value(CASE WHEN sb = 1 THEN cvc - vc END IGNORE NULLS)
                        OVER wc, 0) AS sess_cents,
         CAST(rn - coalesce(last_value(CASE WHEN tc = 1 THEN rn - 1 END IGNORE NULLS)
                            OVER wc, 0) AS BIGINT) AS streak,
         (u - coalesce(last_value(CASE WHEN sb = 1 THEN u END IGNORE NULLS) OVER wc,
                       min(u) OVER wp))::DOUBLE / 1e6 AS elapsed_raw,
         (count(*) OVER wp)::DOUBLE AS pn,
         sum(x) OVER wp AS ps1,
         sum(x * x) OVER wp AS ps2,
         sum(x * x * x) OVER wp AS ps3,
         sum(x * x * x * x) OVER wp AS ps4,
         sum(value) OVER wp AS pt0,
         sum(x * value) OVER wp AS pt1,
         sum(x * x * value) OVER wp AS pt2
  FROM s2
  WINDOW wc AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wp AS (PARTITION BY user_id)
), s4 AS (
  SELECT *,
         CAST(sum(hi) OVER ws AS BIGINT) AS s_hi,
         CAST(sum(ef) OVER ws AS BIGINT) AS s_ef,
         CAST(sum(vc) OVER ws AS BIGINT) AS s_c1,
         CAST(sum(vc * vc) OVER ws AS BIGINT) AS s_c2,
         CAST(sum(vi) OVER ws AS BIGINT) AS s_i1,
         CAST(sum(vi * vi) OVER ws AS BIGINT) AS s_i2,
         CAST(sum(vi * vi * vi) OVER ws AS BIGINT) AS s_i3,
         CAST(sum(vi * vi * vi * vi) OVER ws AS BIGINT) AS s_i4,
         CAST(sum(seg_sess) OVER ws AS BIGINT) AS s_auc,
         max(CASE WHEN sb = 0 AND rn > 1 THEN gap_us END) OVER ws AS s_gapmax,
         first_value(value) OVER ws AS s_first,
         max(vc) OVER ws AS s_vmax,
         min(vc) OVER ws AS s_vmin,
         pn * (ps2 * ps4 - ps3 * ps3) - ps1 * (ps1 * ps4 - ps3 * ps2)
           + ps2 * (ps1 * ps3 - ps2 * ps2) AS det,
         pt0 * (ps2 * ps4 - ps3 * ps3) - ps1 * (pt1 * ps4 - ps3 * pt2)
           + ps2 * (pt1 * ps3 - ps2 * pt2) AS dd0,
         pn * (pt1 * ps4 - ps3 * pt2) - pt0 * (ps1 * ps4 - ps3 * ps2)
           + ps2 * (ps1 * pt2 - pt1 * ps2) AS dd1,
         pn * (ps2 * pt2 - ps3 * pt1) - ps1 * (ps1 * pt2 - ps3 * pt0)
           + pt0 * (ps1 * ps3 - ps2 * ps2) AS dd2
  FROM s3
  WINDOW ws AS (PARTITION BY user_id, sid ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id, u AS ts_us,
  CAST(sum(sb) OVER wc AS BIGINT) AS session_id,
  tis AS turn_in_session,
  CAST(rn AS BIGINT) AS turn_idx_user,
  round(gap_s, 6) AS lag1_ts_gap_s,
  round(value - lag(value, 1) OVER w, 6) + 0 AS lag1_value_delta,
  round(value - lag(value, 2) OVER w, 6) + 0 AS lag2_value_delta,
  round(value - lag(value, 3) OVER w, 6) + 0 AS lag3_value_delta,
  last_value(CASE WHEN event_type IN ('purchase','signup') THEN event_type END
             IGNORE NULLS) OVER wc AS backfill_marker,
  count(*) OVER wr1 AS rate_1d,
  count(*) OVER wr7 AS rate_7d,
  round(avg(value) OVER w5, 6) AS roll_mean_value_5,
  round(min(value) OVER w5, 6) AS roll_min_value_5,
  round(max(value) OVER w5, 6) AS roll_max_value_5,
  round(sum(value) OVER w5, 6) AS roll_sum_value_5,
  CAST(sum(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) OVER wc AS BIGINT) AS cum_click,
  CAST(sum(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) OVER wc AS BIGINT) AS cum_view,
  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) OVER wc AS BIGINT) AS cum_purchase,
  CAST(sum(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) OVER wc AS BIGINT) AS cum_signup,
  CAST(sum(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) OVER wc AS BIGINT) AS cum_error,
  round(sum(value) OVER wc, 6) AS cum_value_sum,
  round((u - coalesce(last_value(CASE WHEN sb = 1 THEN u END IGNORE NULLS) OVER wc,
                      min(u) OVER wp))::DOUBLE / 1e6, 6) AS session_elapsed_s,
  round((u - min(u) OVER wp)::DOUBLE / 1e6, 6) AS time_since_start_s,
  hour(ts)::INT AS hour_of_day,
  (dayofweek(ts) + 1)::INT AS day_of_week,
  (CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END)::INT AS is_click,
  (CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END)::INT AS is_view,
  (CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::INT AS is_purchase,
  (CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END)::INT AS is_signup,
  (CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END)::INT AS is_error,
  k AS k_value,
  k IS NULL AS k_is_null,
  round(ln(1 + value), 6) AS log1p_value,
  round(1.0 / (1.0 + exp(-(value - 100) / 25)), 6) AS sigmoid_value,
  round(exp(-0.5 * ((value - 120) / 30) * ((value - 120) / 30)), 6) AS gauss_value,
  round(greatest(0.0, least(1.0, (value - 80) / 40)), 6) AS ramp_value,
  round(least(greatest(value, 50.0), 150.0), 6) AS clip_value,
  sign(value - 100)::DOUBLE AS sign_dev,
  round(pow(10.0, value / 500), 6) AS pow10_scaled,
  CAST(floor(value / 50) * 50 AS BIGINT) AS value_bin,
  substr(event_type, 1, 1) AS type_prefix,
  round(value - avg(value) OVER w5, 6) + 0 AS value_vs_roll,
  round(value - round(avg(value) OVER wp, 6), 6) + 0 AS value_dev_user,
  round(max(value) OVER wc, 6) AS run_max_value,
  round(min(value) OVER wc, 6) AS run_min_value,
  round(CASE WHEN max(value) OVER wc > 0 THEN value / (max(value) OVER wc) END, 6)
    AS value_norm_run,
  round(CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) OVER wc AS BIGINT)::DOUBLE
        / rn, 6) AS pct_error_so_far,
  round(value - lag(value, 4) OVER w, 6) + 0 AS lag4_value_delta,
  round(value - lag(value, 5) OVER w, 6) + 0 AS lag5_value_delta,
  round((u - lag(u, 2) OVER w)::DOUBLE / 1e6, 6) AS lag2_ts_gap_s,
  round(round(CAST(sum(gap_us) OVER w5 AS BIGINT) / count(gap_us) OVER w5, 0) / 1e6, 6)
    AS gap_roll_mean_5,
  round(max(gap_s) OVER w5, 6) AS gap_roll_max_5,
  round(avg(value) OVER w10, 6) AS roll_mean_value_10,
  round(min(value) OVER w10, 6) AS roll_min_value_10,
  round(max(value) OVER w10, 6) AS roll_max_value_10,
  round(sum(value) OVER w10, 6) AS roll_sum_value_10,
  round(sqrt(greatest(0.0, avg(vc * vc) OVER w5 - avg(vc) OVER w5 * avg(vc) OVER w5))
        / 100, 6) AS roll_std_value_5,
  round(CAST(sum(vc) OVER wr1 AS BIGINT) / 100.0, 6) AS value_sum_1d,
  round(round((CAST(sum(vc) OVER wr1 AS BIGINT) / 100.0 / count(*) OVER wr1) * 1e6, 0) / 1e6, 6) AS value_mean_1d,
  round(CAST(sum(vc) OVER wr7 AS BIGINT) / 100.0, 6) AS value_sum_7d,
  round(max(value) OVER wc - min(value) OVER wc, 6) AS run_depth,
  round(value - min(value) OVER wc, 6) AS run_range_pos,
  round(CASE WHEN max(value) OVER wc - min(value) OVER wc > 0
        THEN (value - min(value) OVER wc)
             / (max(value) OVER wc - min(value) OVER wc) END, 6) AS run_range_norm,
  round(CASE WHEN cvc2 / rn - (cvc / rn) * (cvc / rn) > 0
        THEN (vc - cvc / rn) / sqrt(cvc2 / rn - (cvc / rn) * (cvc / rn))
        ELSE 0.0 END, 6) + 0 AS value_zscore_run,
  CAST(sum(CASE WHEN value > 150 THEN 1 ELSE 0 END) OVER wc AS BIGINT) AS cum_high_value,
  round(round((CAST(sum(CASE WHEN value > 150 THEN 1 ELSE 0 END) OVER wc AS BIGINT)::DOUBLE / rn) * 1e6, 0) / 1e6, 6) AS emission_idx_run,
  lag(event_type) OVER w AS prev_event_type,
  tc::INT AS event_type_changed,
  streak AS same_type_streak,
  round(sess_cents / 100.0, 6) AS sess_cum_value,
  round(round((sess_cents / 100.0 / tis) * 1e6, 0) / 1e6, 6) AS sess_mean_value,
  round(value - round(round((sess_cents / 100.0 / tis) * 1e6, 0) / 1e6, 6), 6) + 0 AS sess_value_dev,
  round(round((tis / (elapsed_raw + 1.0)) * 1e6, 0) / 1e6, 6) AS turn_rate_session,
  (tis = 1)::INT AS is_first_in_session,
  round(round((tis / rn) * 1e6, 0) / 1e6, 6) AS sess_frac_of_turns,
  minute(ts)::INT AS minute_of_hour,
  day(ts)::INT AS day_of_month,
  month(ts)::INT AS month,
  quarter(ts)::INT AS quarter,
  (CASE WHEN dayofweek(ts) IN (0, 6) THEN 1 ELSE 0 END)::INT AS is_weekend,
  CAST(floor(hour(ts) / 6) AS BIGINT) AS hour_bucket,
  k % 7 AS k_mod_7,
  (k % 2 = 0)::INT AS k_is_even,
  round(value * k, 6) AS value_times_k,
  round(round((value / (k + 1)) * 1e6, 0) / 1e6, 6) AS value_per_k1,
  round(round((((value - 100) / 50) / (1 + abs((value - 100) / 50))) * 1e6, 0) / 1e6, 6) + 0 AS softsign_value,
  round(sqrt(value), 6) AS sqrt_value,
  round(round((1.0 / (1 + value)) * 1e6, 0) / 1e6, 6) AS inv1p_value,
  round(exp(-value / 200), 6) AS exp_decay_value,
  round(round((value * value / 1000) * 1e6, 0) / 1e6, 6) AS value_sq_scaled,
  round(CASE WHEN value > 0 THEN log2(value) END, 6) + 0 AS log2_value,
  round(last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
        OVER wc, 6) AS last_purchase_value,
  CAST(rn - coalesce(last_value(CASE WHEN event_type = 'purchase' THEN rn END IGNORE NULLS)
                     OVER wc, 0) AS BIGINT) AS rows_since_purchase,
  round(round((CASE WHEN lag(value) OVER w > 0 THEN value / lag(value) OVER w END) * 1e6, 0) / 1e6, 6) AS value_vs_prev_ratio,
  round(round((CASE WHEN count(*) OVER wp > 1 THEN (rn - 1) / (count(*) OVER wp - 1) ELSE 0.0 END) * 1e6, 0) / 1e6, 6) AS pct_rank_in_conv,
  CAST(sum(k) OVER wc AS BIGINT) AS cum_k_sum,
  round(round((CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) OVER wc AS BIGINT)::DOUBLE / rn) * 1e6, 0) / 1e6, 6) AS k_null_rate_so_far,
  round(avg(value) OVER w20, 6) AS roll_mean_value_20,
  round(min(value) OVER w20, 6) AS roll_min_value_20,
  round(max(value) OVER w20, 6) AS roll_max_value_20,
  round(sum(value) OVER w20, 6) AS roll_sum_value_20,
  round(sqrt(greatest(0.0, avg(vc * vc) OVER w10 - avg(vc) OVER w10 * avg(vc) OVER w10))
        / 100, 6) AS roll_std_value_10,
  round(round(CAST(sum(gap_us) OVER w10 AS BIGINT) / count(gap_us) OVER w10, 0) / 1e6, 6)
    AS gap_roll_mean_10,
  round(max(gap_s) OVER w10, 6) AS gap_roll_max_10,
  count(*) OVER wr30 AS rate_30d,
  round(CAST(sum(vc) OVER wr30 AS BIGINT) / 100.0, 6) AS value_sum_30d,
  round(CASE WHEN cvc2 / rn - (cvc / rn) * (cvc / rn) > 0 AND cvc / rn > 0
        THEN sqrt(cvc2 / rn - (cvc / rn) * (cvc / rn)) / (cvc / rn)
        ELSE 0.0 END, 6) AS value_cv_run,
  round(round((CAST(sum(k) OVER w5 AS BIGINT) / count(k) OVER w5) * 1e6, 0) / 1e6, 6)
    AS k_roll_mean_5,
  round(round((CAST(sum(k) OVER wc AS BIGINT) / count(k) OVER wc) * 1e6, 0) / 1e6, 6)
    AS cum_k_mean,
  (CASE WHEN k IS DISTINCT FROM lag(k) OVER w THEN 1 ELSE 0 END)::INT AS k_changed,
  concat_ws('>', lag(event_type) OVER w, event_type) AS type_pair,
  CAST(floor((day(ts) - 1) / 7) + 1 AS BIGINT) AS week_of_month,
  (day(ts) = 1)::INT AS is_month_start,
  (dayofweek(ts) * 24 + hour(ts))::INT AS hour_of_week,
  CAST(floor((u - min(u) OVER wp)::DOUBLE / 1e6 / 86400) AS BIGINT) AS days_since_start,
  round(first_value(value) OVER wc, 6) AS conv_first_value,
  round(value - first_value(value) OVER wc, 6) + 0 AS value_vs_first,
  round(max(gap_s) OVER wc, 6) AS gap_max_run,
  round(CAST(sum(gap_us) OVER wc AS BIGINT) / 1e6, 6) AS active_time_run_s,
  round(round(CAST(sum(gap_us) OVER wc AS BIGINT) / count(gap_us) OVER wc, 0) / 1e6, 6)
    AS mean_gap_run,
  (CASE WHEN (u // 86400000000) IS DISTINCT FROM lag(u // 86400000000) OVER w
        THEN 1 ELSE 0 END)::INT AS is_new_day,
  round(1.0 / (1.0 + exp(-(value - 100) / 10)), 6) AS sigmoid_steep_value,
  round(exp(-0.5 * ((value - 120) / 10) * ((value - 120) / 10)), 6) AS gauss_narrow_value,
  round(round((value * value * value / 100000) * 1e6, 0) / 1e6, 6) AS value_cube_scaled,
  round(greatest(0.0, value - 100), 6) AS relu_value,
  round(round((value / count(*) OVER wr1) * 1e6, 0) / 1e6, 6) AS value_over_rate,
  CAST(sum(CASE WHEN gap_s > 3600 THEN 1 ELSE 0 END) OVER wc AS BIGINT)
    AS high_gap_count_run,
  round(s_vmax / 100.0, 6) AS sess_run_max_value,
  round(s_vmin / 100.0, 6) AS sess_run_min_value,
  round((s_vmax - s_vmin) / 100.0, 6) AS sess_depth_run,
  s_hi AS sess_high_count,
  round(round((s_hi::DOUBLE / tis) * 1e6, 0) / 1e6, 6) AS sess_emission_idx,
  s_ef AS sess_n_errors,
  round(sqrt(greatest(0.0, s_c2 / tis - (s_c1 / tis) * (s_c1 / tis))) / 100, 6)
    AS sess_std_value,
  round(CASE WHEN s_i2 / tis - (s_i1 / tis) * (s_i1 / tis) > 0
        THEN (s_i3 / tis - 3 * (s_i1 / tis) * (s_i2 / tis)
              + 2 * (s_i1 / tis) * (s_i1 / tis) * (s_i1 / tis))
             / ((s_i2 / tis - (s_i1 / tis) * (s_i1 / tis))
                * sqrt(s_i2 / tis - (s_i1 / tis) * (s_i1 / tis))) END, 6) + 0
    AS sess_skew_value,
  round(s_auc / 2e8, 4) + 0 AS sess_auc_trapezoid,
  round(CASE WHEN s_gapmax >= 0 THEN s_gapmax / 1e6 END, 6) AS sess_gap_max_s,
  round(s_first, 6) AS sess_first_value,
  round(value - s_first, 6) + 0 AS value_vs_sess_first,
  round(CASE WHEN cvi2 / rn - (cvi / rn) * (cvi / rn) > 0
        THEN (cvi3 / rn - 3 * (cvi / rn) * (cvi2 / rn)
              + 2 * (cvi / rn) * (cvi / rn) * (cvi / rn))
             / ((cvi2 / rn - (cvi / rn) * (cvi / rn))
                * sqrt(cvi2 / rn - (cvi / rn) * (cvi / rn))) END, 6) + 0
    AS run_skew_value,
  round(round((CASE WHEN cvi2 / rn - (cvi / rn) * (cvi / rn) > 0
        THEN (cvi4 / rn - 4 * (cvi / rn) * (cvi3 / rn)
              + 6 * (cvi / rn) * (cvi / rn) * (cvi2 / rn)
              - 3 * (cvi / rn) * (cvi / rn) * (cvi / rn) * (cvi / rn))
             / ((cvi2 / rn - (cvi / rn) * (cvi / rn))
                * (cvi2 / rn - (cvi / rn) * (cvi / rn))) - 3 END) * 1e6, 0) / 1e6, 6) + 0
    AS run_kurt_value,
  round(CASE WHEN pn >= 10 AND det <> 0
        THEN dd0 / det + (dd1 / det) * x + (dd2 / det) * x * x END, 4) + 0
    AS ms_poly_pred,
  round(CASE WHEN pn >= 10 AND det <> 0
        THEN value - (dd0 / det + (dd1 / det) * x + (dd2 / det) * x * x) END, 4) + 0
    AS ms_delta_resid,
  round(0.5 * (1.0 / (1.0 + exp(-(value - 100) / 25)))
        + 0.3 * exp(-0.5 * ((value - 120) / 30) * ((value - 120) / 30))
        + 0.2 * greatest(0.0, least(1.0, (value - 80) / 40)), 6) AS grp_sigmoid_blend,
  round(0.6 * ln(1 + value) + 0.4 * sqrt(value), 6) AS grp_log_sqrt_blend,
  round(exp(-0.5 * ((value - 120) / 30) * ((value - 120) / 30))
        - exp(-0.5 * ((value - 120) / 10) * ((value - 120) / 10)), 6) + 0
    AS grp_gauss_contrast,
  round(greatest(0.0, value - 100) / 100 * (1.0 / (1.0 + exp(-(value - 100) / 25))), 6)
    AS line_blend_idx,
  round(round(((value - 120) / (value + 120)) * 1e6, 0) / 1e6, 6) + 0 AS ew_balance_idx,
  (CASE event_type WHEN 'click' THEN 1 WHEN 'view' THEN 2 WHEN 'purchase' THEN 3
        WHEN 'signup' THEN 4 WHEN 'error' THEN 5 ELSE 0 END)::INT AS grp_count_idx,
  round(value - lag(value, 6) OVER w, 6) + 0 AS lag6_value_delta,
  round(value - lag(value, 7) OVER w, 6) + 0 AS lag7_value_delta,
  round((u - lag(u, 3) OVER w)::DOUBLE / 1e6, 6) AS lag3_ts_gap_s,
  round(round((CAST(sum(vc) OVER w50 AS BIGINT) / count(*) OVER w50 / 100) * 1e6, 0) / 1e6, 6)
    AS roll_mean_value_50,
  round(CAST(sum(vc) OVER w50 AS BIGINT) / 100.0, 6) AS roll_sum_value_50,
  round(min(value) OVER w50, 6) AS roll_min_value_50,
  round(max(value) OVER w50, 6) AS roll_max_value_50,
  round(sqrt(greatest(0.0, avg(vc * vc) OVER w20 - avg(vc) OVER w20 * avg(vc) OVER w20))
        / 100, 6) AS roll_std_value_20,
  round(max(gap_s) OVER w20, 6) AS gap_roll_max_20,
  round(round(CAST(sum(gap_us) OVER w20 AS BIGINT) / count(gap_us) OVER w20, 0) / 1e6, 6)
    AS gap_roll_mean_20,
  count(*) OVER wr12 AS rate_12h,
  round(CAST(sum(vc) OVER wr12 AS BIGINT) / 100.0, 6) AS value_sum_12h,
  round(CASE WHEN avg(vc * vc) OVER w5 - avg(vc) OVER w5 * avg(vc) OVER w5 > 0
        THEN (vc - avg(vc) OVER w5)
             / sqrt(avg(vc * vc) OVER w5 - avg(vc) OVER w5 * avg(vc) OVER w5)
        ELSE 0.0 END, 6) + 0 AS value_zscore_roll_5,
  round(round((CASE WHEN lag(value, 5) OVER w > 0
        THEN (value - lag(value, 5) OVER w) / lag(value, 5) OVER w END) * 1e6, 0) / 1e6, 6) + 0
    AS pct_change_5,
  round((vc - 2 * lagvc + lag(vc, 2) OVER w) / 100.0, 6) + 0 AS accel_value,
  round(round((CASE WHEN lag(gap_us) OVER w > 0
        THEN gap_us / (lag(gap_us) OVER w) END) * 1e6, 0) / 1e6, 6) AS gap_ratio,
  dayofyear(ts)::INT AS day_of_year,
  year(ts)::INT AS "year",
  (CASE WHEN month(ts) IN (1, 4, 7, 10) AND day(ts) = 1 THEN 1 ELSE 0 END)::INT
    AS is_quarter_start,
  k * k AS k_sq,
  CAST(floor(k / 10) AS BIGINT) AS k_bucket,
  max(k) OVER wc AS run_k_max,
  k - lag(k) OVER w AS k_lag1_delta,
  (event_type IS NOT DISTINCT FROM lag(event_type) OVER w)::INT AS is_repeat_type,
  round(sin(6.283185307179586 * hour(ts) / 24), 6) + 0 AS sin_hour,
  round(cos(6.283185307179586 * hour(ts) / 24), 6) + 0 AS cos_hour,
  round(value - lag(value, 8) OVER w, 6) + 0 AS lag8_value_delta,
  round(sqrt(greatest(0.0, avg(vc * vc) OVER w50 - avg(vc) OVER w50 * avg(vc) OVER w50))
        / 100, 6) AS roll_std_value_50,
  round(min(gap_s) OVER w10, 6) AS gap_roll_min_10,
  round(sign(value - lag(value) OVER w) * ln(1 + abs(value - lag(value) OVER w)), 6) + 0
    AS signed_log1p_delta_value,
  round(round((CASE WHEN s_i2 / tis - (s_i1 / tis) * (s_i1 / tis) > 0
        THEN (s_i4 / tis - 4 * (s_i1 / tis) * (s_i3 / tis)
              + 6 * (s_i1 / tis) * (s_i1 / tis) * (s_i2 / tis)
              - 3 * (s_i1 / tis) * (s_i1 / tis) * (s_i1 / tis) * (s_i1 / tis))
             / ((s_i2 / tis - (s_i1 / tis) * (s_i1 / tis))
                * (s_i2 / tis - (s_i1 / tis) * (s_i1 / tis))) - 3 END) * 1e6, 0) / 1e6, 6) + 0
    AS sess_kurt_value,
  round(lead(value) OVER w - value, 6) + 0 AS label_lead1_value_delta
FROM s4
WINDOW w  AS (PARTITION BY user_id ORDER BY ts, event_id),
       wc AS (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       wp AS (PARTITION BY user_id),
       wr1 AS (PARTITION BY user_id ORDER BY u
               RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW),
       wr7 AS (PARTITION BY user_id ORDER BY u
               RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW),
       w5 AS (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
       w10 AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 9 PRECEDING AND CURRENT ROW),
       w20 AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW),
       w50 AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 49 PRECEDING AND CURRENT ROW),
       wr12 AS (PARTITION BY user_id ORDER BY u
                RANGE BETWEEN 43200000000 PRECEDING AND CURRENT ROW),
       wr30 AS (PARTITION BY user_id ORDER BY u
                RANGE BETWEEN 2592000000000 PRECEDING AND CURRENT ROW)
""",
    "median_normalize": """
WITH med AS (
  SELECT user_id, quantile_cont(value, 0.5) AS m FROM events GROUP BY user_id
)
SELECT e.event_id, e.user_id,
       round(CASE WHEN m > 0 THEN e.value / m ELSE e.value END, 6) AS value_norm
FROM events e JOIN med USING (user_id)
""",
    "embedding_neardup": """
WITH s AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         round(
           list_sum(list_transform(range(1, len(a.embedding) + 1),
                                   i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
           / (sqrt(list_sum(list_transform(range(1, len(a.embedding) + 1),
                                           i -> a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE)))
              * sqrt(list_sum(list_transform(range(1, len(b.embedding) + 1),
                                             i -> b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)))),
           6) AS cosine
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
)
SELECT id_a, id_b, cosine FROM s WHERE cosine >= 0.3
""",
    "trapezoid_auc": """
WITH seg AS (
  SELECT user_id,
         (value + lag(value) OVER w) / 2
           * (epoch_us(ts)::DOUBLE / 1e6 - lag(epoch_us(ts)::DOUBLE / 1e6) OVER w) AS s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, round(sum(s), 4) AS auc_trapezoid, count(*) AS n
FROM seg GROUP BY user_id
""",
    "moments": """
WITH r AS (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id DESC) AS rmx,
         row_number() OVER (PARTITION BY user_id ORDER BY value ASC, event_id DESC) AS rmn
  FROM events
), g AS (
  SELECT user_id, count(*)::DOUBLE AS n,
         avg(value) AS m1, avg(value*value) AS m2,
         avg(value*value*value) AS m3, avg(value*value*value*value) AS m4,
         max(CASE WHEN rmx = 1 THEN event_id END) AS argmax_event_id,
         max(CASE WHEN rmn = 1 THEN event_id END) AS argmin_event_id,
         round(max(value), 6) AS max_value,
         round(min(value), 6) AS min_value
  FROM r GROUP BY user_id
)
SELECT user_id,
       round(sqrt(m2 - m1*m1), 5) AS std_pop,
       round((m3 - 3*m1*m2 + 2*m1*m1*m1) / pow(m2 - m1*m1, 1.5), 5) + 0 AS skewness_pop,
       round((m4 - 4*m1*m3 + 6*m1*m1*m2 - 3*m1*m1*m1*m1) / pow(m2 - m1*m1, 2) - 3, 5) + 0
         AS kurtosis_excess,
       argmax_event_id, argmin_event_id, max_value, min_value
FROM g
""",
    "profile_morphology": """
WITH rr AS (
  SELECT user_id, event_id, value, ts, epoch_us(ts) AS u,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY value DESC, event_id DESC) AS rmx
  FROM events
), w AS (
  SELECT user_id, event_id, value, u,
         max(value) OVER wp AS peak,
         min(value) OVER wp AS base,
         avg(value) OVER wp AS m1,
         avg(value * value) OVER wp AS m2,
         max(CASE WHEN rmx = 1 THEN u END) OVER wp AS center_us,
         lag(value) OVER wo AS lv,
         lag(u) OVER wo AS lu
  FROM rr
  WINDOW wp AS (PARTITION BY user_id),
         wo AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT *,
         base + (peak - base) / 2 AS half,
         base + (peak - base) * 0.05 AS base5,
         ((value - base) + (lv - base)) / 2 * ((u - lu)::DOUBLE / 1e6) AS seg,
         (u + lu)::DOUBLE / 2 AS mid
  FROM w
), g AS (
  SELECT user_id, count(*) AS n,
         round(max(peak) - max(base), 6) AS depth,
         max(center_us) AS center_us,
         round((max(CASE WHEN value >= half THEN u END)
                - min(CASE WHEN value >= half THEN u END))::DOUBLE / 1e6, 6) AS core_width_s,
         round((max(CASE WHEN value >= base5 THEN u END)
                - min(CASE WHEN value >= base5 THEN u END))::DOUBLE / 1e6, 6) AS base_width_s,
         round(coalesce(sum(CASE WHEN mid <= center_us THEN seg END), 0.0), 4) AS left_wing,
         round(coalesce(sum(CASE WHEN mid > center_us THEN seg END), 0.0), 4) AS right_wing,
         round(avg(CASE WHEN value > m1 + 2 * sqrt(m2 - m1 * m1)
                   THEN 1.0 ELSE 0.0 END), 6) AS emission_idx
  FROM s GROUP BY user_id
)
SELECT user_id, n, depth, center_us, core_width_s, base_width_s,
       left_wing, right_wing, emission_idx,
       round(CASE WHEN left_wing + right_wing <> 0
             THEN (right_wing - left_wing) / (right_wing + left_wing) END, 6) + 0 AS asymmetry
FROM g
""",
    "composite_features": """
SELECT event_id, user_id,
       round(1.0 / (1.0 + exp(-(value - 100) / 25)), 6) AS sigmoid_value,
       round(exp(-0.5 * ((value - 120) / 30) * ((value - 120) / 30)), 6) AS gauss_value,
       round(greatest(0.0, least(1.0, (value - 80) / 40)), 6) AS ramp_value,
       round(CASE WHEN value > 0 THEN log10(value) END, 6) + 0 AS log10_value,
       round(pow(10.0, value / 500), 6) AS pow10_scaled,
       CAST(floor(value / 50) * 50 AS BIGINT) AS value_bin,
       substr(event_type, 1, 1) AS type_prefix,
       sign(value - 100)::DOUBLE AS sign_dev,
       round(least(greatest(value, 50.0), 150.0), 6) AS clip_value,
       round(value - CAST(json_extract_string(props, '$.k') AS BIGINT), 6) + 0 AS delta_value_k
FROM events
""",
    "pivot_avg": """
SELECT user_id,
       round(avg(CASE WHEN event_type = 'click'    THEN value END), 6) AS avg_click,
       round(avg(CASE WHEN event_type = 'view'     THEN value END), 6) AS avg_view,
       round(avg(CASE WHEN event_type = 'purchase' THEN value END), 6) AS avg_purchase,
       round(avg(CASE WHEN event_type = 'signup'   THEN value END), 6) AS avg_signup,
       round(avg(CASE WHEN event_type = 'error'    THEN value END), 6) AS avg_error
FROM events GROUP BY user_id
""",
    "union_dedup": """
SELECT o_custkey AS custkey FROM orders
UNION
SELECT c_custkey AS custkey FROM customer
""",
    "json_extract": """
SELECT event_type,
       round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 6) AS avg_k,
       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
       CAST(sum(CASE WHEN json_extract_string(props, '$.k') IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null_k
FROM events GROUP BY event_type
""",
    "token_stats": r"""
WITH base AS (
  SELECT doc_id, text,
         CASE WHEN len(trim(text)) = 0 THEN 0
              ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tokens
  FROM documents
)
SELECT doc_id, n_tokens, len(text)::BIGINT AS n_chars_measured,
       CASE WHEN n_tokens > 0
            THEN round(len(regexp_replace(trim(text), '\s+', '', 'g'))::DOUBLE / n_tokens, 6)
       END AS avg_token_len
FROM base
""",
    "quality_score": r"""
WITH base AS (
  SELECT doc_id, text,
         greatest(len(text), 1)::DOUBLE AS l,
         ' ' || lower(text) || ' ' AS padded,
         CASE WHEN len(trim(text)) = 0 THEN 0
              ELSE len(string_split_regex(trim(text), '\s+')) END AS n_tok
  FROM documents
), ratios AS (
  SELECT doc_id, n_tok,
         (len(text) - len(regexp_replace(text, '[\.,;:!\?]', '', 'g'))) / l AS punct,
         (len(text) - len(regexp_replace(text, '[0-9]', '', 'g'))) / l AS digit,
         (len(text) - len(regexp_replace(text, '[A-Z]', '', 'g'))) / l AS upper_r,
         ( (len(padded) - len(replace(padded, ' the ', ''))) / 5.0
         + (len(padded) - len(replace(padded, ' a ', ''))) / 3.0
         + (len(padded) - len(replace(padded, ' and ', ''))) / 5.0
         + (len(padded) - len(replace(padded, ' of ', ''))) / 4.0
         + (len(padded) - len(replace(padded, ' to ', ''))) / 4.0
         + (len(padded) - len(replace(padded, ' in ', ''))) / 4.0
         + (len(padded) - len(replace(padded, ' is ', ''))) / 4.0
         + (len(padded) - len(replace(padded, ' it ', ''))) / 4.0 ) AS sw_hits
  FROM base
)
SELECT doc_id,
       round(punct, 6) AS punct_ratio,
       round(digit, 6) AS digit_ratio,
       round(upper_r, 6) AS upper_ratio,
       round(CASE WHEN n_tok > 0 THEN sw_hits / n_tok ELSE 0.0 END, 6) AS stopword_ratio,
       round(least(1.0 - least(punct * 4, 0.25) - least(digit * 4, 0.25)
             + least(CASE WHEN n_tok > 0 THEN sw_hits / n_tok ELSE 0.0 END, 0.25), 1.0), 6)
         AS quality_score
FROM ratios
""",
    "lang_id": """
WITH pad AS (
  SELECT doc_id, lang, ' ' || lower(text) || ' ' AS p FROM documents
), scores AS (
  SELECT doc_id, lang,
    ((len(p)-len(replace(p,' der ','')))/5.0 + (len(p)-len(replace(p,' die ','')))/5.0
     + (len(p)-len(replace(p,' und ','')))/5.0 + (len(p)-len(replace(p,' das ','')))/5.0) AS s_de,
    ((len(p)-len(replace(p,' the ','')))/5.0 + (len(p)-len(replace(p,' and ','')))/5.0
     + (len(p)-len(replace(p,' of ','')))/4.0 + (len(p)-len(replace(p,' a ','')))/3.0) AS s_en,
    ((len(p)-len(replace(p,' el ','')))/4.0 + (len(p)-len(replace(p,' los ','')))/5.0
     + (len(p)-len(replace(p,' que ','')))/5.0 + (len(p)-len(replace(p,' y ','')))/3.0) AS s_es,
    ((len(p)-len(replace(p,' le ','')))/4.0 + (len(p)-len(replace(p,' la ','')))/4.0
     + (len(p)-len(replace(p,' et ','')))/4.0 + (len(p)-len(replace(p,' les ','')))/5.0) AS s_fr,
    ((len(p)-len(replace(p,' 的 ','')))/3.0 + (len(p)-len(replace(p,' 是 ','')))/3.0
     + (len(p)-len(replace(p,' 了 ','')))/3.0 + (len(p)-len(replace(p,' 在 ','')))/3.0) AS s_zh
  FROM pad
)
SELECT doc_id,
       CASE WHEN s_zh >= s_fr AND s_zh >= s_es AND s_zh >= s_en AND s_zh >= s_de THEN 'zh'
            WHEN s_fr >= s_es AND s_fr >= s_en AND s_fr >= s_de THEN 'fr'
            WHEN s_es >= s_en AND s_es >= s_de THEN 'es'
            WHEN s_en >= s_de THEN 'en'
            ELSE 'de' END AS pred_lang,
       round(greatest(s_de, s_en, s_es, s_fr, s_zh), 6) AS lang_score,
       (CASE WHEN s_zh >= s_fr AND s_zh >= s_es AND s_zh >= s_en AND s_zh >= s_de THEN 'zh'
            WHEN s_fr >= s_es AND s_fr >= s_en AND s_fr >= s_de THEN 'fr'
            WHEN s_es >= s_en AND s_es >= s_de THEN 'es'
            WHEN s_en >= s_de THEN 'en'
            ELSE 'de' END) = lang AS is_match
FROM scores
""",
    "dedup_exact": r"""
WITH f AS (
  SELECT doc_id, md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint
  FROM documents
), g AS (
  SELECT fingerprint, count(*) AS group_size, min(doc_id) AS keeper_id
  FROM f GROUP BY fingerprint
)
SELECT f.doc_id, f.fingerprint, g.group_size, g.keeper_id,
       f.doc_id <> g.keeper_id AS is_duplicate
FROM f JOIN g USING (fingerprint)
""",
    "fingerprint_stats": r"""
SELECT source,
       count(DISTINCT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))) AS n_fingerprints,
       count(*) AS n_docs
FROM documents GROUP BY source
""",
    "ngram_jaccard": r"""
WITH toks AS (
  SELECT doc_id, lang, source,
         string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
  FROM documents
), sh AS (
  SELECT doc_id, lang, source,
         CASE WHEN len(t) >= 3 THEN
           list_distinct(list_transform(range(1, len(t) - 1),
             i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
         ELSE [array_to_string(t, ' ')] END AS s
  FROM toks
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.lang AS lang, a.source AS source,
         round(CASE WHEN len(list_distinct(list_concat(a.s, b.s))) > 0
               THEN len(list_intersect(a.s, b.s))::DOUBLE
                    / len(list_distinct(list_concat(a.s, b.s)))
               ELSE 0.0 END, 6) AS jaccard
  FROM sh a JOIN sh b
    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, lang, source, jaccard FROM pairs WHERE jaccard >= 0.2
""",
    "simhash": r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
), hw AS (
  SELECT doc_id,
         list_transform(t, tok -> {'w1': ('0x' || substr(md5(tok), 1, 8))::BIGINT,
                                   'w2': ('0x' || substr(md5(tok), 9, 8))::BIGINT}) AS hs
  FROM toks
)
SELECT doc_id,
  CAST(list_sum(list_transform(range(0, 64), b ->
    CASE WHEN list_sum(list_transform(hs, h ->
           CASE WHEN ((CASE WHEN b < 32 THEN (h.w1 >> b) ELSE (h.w2 >> (b - 32)) END) & 1) = 1
                THEN 1 ELSE -1 END)) > 0
         THEN CASE WHEN b = 63 THEN (-9223372036854775807 - 1) ELSE (1::BIGINT << b) END
         ELSE 0 END)) AS BIGINT) AS simhash
FROM hw
""",
    "minhash_lsh": r"""
WITH toks AS (
  SELECT doc_id,
         string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS t
  FROM documents
), sh AS (
  SELECT doc_id,
         CASE WHEN len(t) >= 3 THEN
           list_distinct(list_transform(range(1, len(t) - 1),
             i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
         ELSE [array_to_string(t, ' ')] END AS s
  FROM toks
), sig AS (
  -- one md5 per shingle (28-bit), k integer universal hashes over it:
  -- identical literal coefficients to minhash_coeffs() in Spark
  SELECT doc_id, s,
         list_transform(range(1, 33), k ->
           list_min(list_transform(s,
             x -> (MINHASH_A[k] * (('0x' || substr(md5(x), 1, 7))::BIGINT)
                   + MINHASH_B[k]) % 2147483647))) AS sig
  FROM sh
), bands AS (
  SELECT doc_id, b AS band_id,
         ('0x' || substr(md5(array_to_string(sig[b*4+1 : b*4+4], ',')), 1, 15))::BIGINT
           AS band_hash
  FROM sig CROSS JOIN range(0, 8) t(b)
), cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
), verified AS (
  SELECT c.id_a, c.id_b,
         round(CASE WHEN len(list_distinct(list_concat(sa.s, sb.s))) > 0
               THEN len(list_intersect(sa.s, sb.s))::DOUBLE
                    / len(list_distinct(list_concat(sa.s, sb.s)))
               ELSE 0.0 END, 6) AS jaccard
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.id_a
  JOIN sh sb ON sb.doc_id = c.id_b
)
SELECT id_a, id_b, jaccard FROM verified WHERE jaccard >= 0.3
""",
    "media_features": """
WITH m AS (
  SELECT doc_id AS media_id,
         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         (256 + (doc_id % 7) * 97) AS nb,
         (doc_id % 30)::DOUBLE + 0.5 AS dur
  FROM documents
)
SELECT media_id, kind, nb::BIGINT AS n_bytes,
       round(list_sum(list_transform(range(0, nb),
               i -> ((31 * media_id + 7 * i) % 256)::DOUBLE)) / nb, 6) AS mean_byte,
       (CASE kind WHEN 'image' THEN 1 WHEN 'audio' THEN 0
             ELSE greatest(1, media_id % 30) END)::INTEGER AS n_frames_sampled
FROM m
""",
    "cosine_topk": """
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10
), s AS (
  SELECT q.query_id, c.vec_id AS cand_id,
         round(
           list_sum(list_transform(range(1, len(c.embedding) + 1),
                                   i -> q.qv[i]::DOUBLE * c.embedding[i]::DOUBLE))
           / (sqrt(list_sum(list_transform(range(1, len(q.qv) + 1),
                                           i -> q.qv[i]::DOUBLE * q.qv[i]::DOUBLE)))
              * sqrt(list_sum(list_transform(range(1, len(c.embedding) + 1),
                                             i -> c.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE)))),
           6) AS cosine
  FROM embeddings c CROSS JOIN q
  WHERE c.vec_id <> q.query_id
), r AS (
  SELECT query_id, cand_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, cand_id ASC) AS rank
  FROM s
)
SELECT query_id, cand_id, cosine + 0 AS cosine, rank FROM r WHERE rank <= 5
""",
}


# ----------------------------------------------------------------
# Generated oracles: these embed the engine's OWN deterministic
# constants (Savitzky-Golay projection rows; Rademacher hyperplanes) as
# SQL literals, so both engines run the identical arithmetic.
# ----------------------------------------------------------------


def _fmt(v: float) -> str:
    return repr(float(v))


def _mac_sql(coeffs, samples) -> str:
    """Left-assoc multiply-accumulate: matches kernels._mac bit-for-bit."""
    return " + ".join(f"({_fmt(c)}) * {s}" for c, s in zip(coeffs, samples))


def _savgol_sql() -> str:
    from astrospectro_spark.engine.kernels import savgol_projection

    h5 = savgol_projection(5, 2)
    h4 = savgol_projection(4, 2)
    y4 = [  # n=4 sample refs for rn=1..4
        ["value", "f1", "f2", "f3"],
        ["l1", "value", "f1", "f2"],
        ["l2", "l1", "value", "f1"],
        ["l3", "l2", "l1", "value"],
    ]
    n4 = " ".join(
        f"WHEN {i+1} THEN {_mac_sql(h4[i], y4[i])}" for i in range(3)
    ) + f" ELSE {_mac_sql(h4[3], y4[3])}"
    head0 = _mac_sql(h5[0], ["value", "f1", "f2", "f3", "f4"])
    head1 = _mac_sql(h5[1], ["l1", "value", "f1", "f2", "f3"])
    mid = _mac_sql(h5[2], ["l2", "l1", "value", "f1", "f2"])
    tail0 = _mac_sql(h5[3], ["l3", "l2", "l1", "value", "f1"])
    tail1 = _mac_sql(h5[4], ["l4", "l3", "l2", "l1", "value"])
    return f"""
WITH o AS (
  SELECT event_id, user_id, value,
         row_number() OVER w AS rn,
         count(*) OVER (PARTITION BY user_id) AS n,
         lag(value, 1) OVER w AS l1, lag(value, 2) OVER w AS l2,
         lag(value, 3) OVER w AS l3, lag(value, 4) OVER w AS l4,
         lead(value, 1) OVER w AS f1, lead(value, 2) OVER w AS f2,
         lead(value, 3) OVER w AS f3, lead(value, 4) OVER w AS f4
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sm AS (
  SELECT event_id, user_id, value,
    CASE
      WHEN n <= 3 THEN value
      WHEN n = 4 THEN CASE rn {n4} END
      WHEN rn = 1 THEN {head0}
      WHEN rn = 2 THEN {head1}
      WHEN rn = n - 1 THEN {tail0}
      WHEN rn = n THEN {tail1}
      ELSE {mid}
    END AS s
  FROM o
)
SELECT event_id, user_id, round(s, 6) + 0 AS value_smooth,
       round(value - s, 6) + 0 AS value_resid
FROM sm
"""


def _lsh_cosine_sql(n_planes: int = 8, n_tables: int = 4, dim: int = 64, k: int = 5) -> str:
    from astrospectro_spark.functions.similarity import rademacher_plane

    def sig_expr(t: int) -> str:
        terms = []
        for p in range(n_planes):
            arr = "[" + ", ".join(_fmt(v) for v in rademacher_plane(t, p, dim)) + "]::DOUBLE[]"
            proj = (
                f"list_reduce(list_transform(range(1, {dim + 1}), "
                f"j -> (embedding)[j]::DOUBLE * ({arr})[j]), (a, x) -> a + x)"
            )
            terms.append(f"CASE WHEN round({proj}, 6) >= 0 THEN {1 << p}::BIGINT ELSE 0::BIGINT END")
        return " + ".join(terms)

    n_probes = n_planes + 1  # exact bucket + one flip per plane
    sigs = "\nUNION ALL\n".join(
        f"SELECT vec_id, {t} AS tbl, {sig_expr(t)} AS sig FROM embeddings"
        for t in range(n_tables)
    )
    cos = """
         list_sum(list_transform(range(1, 65),
                  i -> qe.embedding[i]::DOUBLE * ce.embedding[i]::DOUBLE))
         / (sqrt(list_sum(list_transform(range(1, 65),
                  i -> qe.embedding[i]::DOUBLE * qe.embedding[i]::DOUBLE)))
            * sqrt(list_sum(list_transform(range(1, 65),
                  i -> ce.embedding[i]::DOUBLE * ce.embedding[i]::DOUBLE))))"""
    return f"""
WITH sigs AS (
{sigs}
), q AS (
  -- multi-probe: the exact bucket plus every Hamming-1 bucket
  SELECT vec_id AS query_id, tbl,
         CASE WHEN pr = 0 THEN sig
              ELSE xor(sig, 1::BIGINT << (pr - 1)) END AS sig
  FROM sigs CROSS JOIN range(0, {n_probes}) t(pr)
  WHERE vec_id < 10
), cand AS (
  SELECT DISTINCT q.query_id, c.vec_id AS cand_id
  FROM q JOIN sigs c ON q.tbl = c.tbl AND q.sig = c.sig AND c.vec_id <> q.query_id
), scored AS (
  SELECT cand.query_id, cand.cand_id,
         round({cos}, 6) AS cosine
  FROM cand
  JOIN embeddings qe ON qe.vec_id = cand.query_id
  JOIN embeddings ce ON ce.vec_id = cand.cand_id
), r AS (
  SELECT query_id, cand_id, cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, cand_id ASC) AS rank
  FROM scored
)
SELECT query_id, cand_id, cosine + 0 AS cosine, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= {k}
"""


ORACLE_SQL["savgol_smooth"] = _savgol_sql()
ORACLE_SQL["cosine_topk_lsh"] = _lsh_cosine_sql()


def _splice_minhash_coeffs(sql: str) -> str:
    """Replace MINHASH_A / MINHASH_B markers with the literal
    coefficient lists — single source of truth is minhash_coeffs()."""
    from astrospectro_spark.functions.dedup import minhash_coeffs

    a, b = minhash_coeffs(32)
    return sql.replace("MINHASH_A", f"{list(a)}").replace(
        "MINHASH_B", f"{list(b)}"
    )


ORACLE_SQL["minhash_lsh"] = _splice_minhash_coeffs(ORACLE_SQL["minhash_lsh"])


def _dup_clusters_sql() -> str:
    """Transitive duplicate clusters = the minhash_lsh pair SQL (same
    CTE chain, byte-identical hashes) + a recursive-CTE transitive
    closure labelling every node with its component's min id — the
    oracle for the iterative large-star/small-star Spark job."""
    mh = ORACLE_SQL["minhash_lsh"]
    body = mh[mh.index("WITH") + len("WITH"): mh.rindex("SELECT")].rstrip()
    return (
        "WITH RECURSIVE "
        + body
        + """,
sym AS (
  SELECT id_a AS u, id_b AS v FROM verified WHERE jaccard >= 0.3
  UNION
  SELECT id_b, id_a FROM verified WHERE jaccard >= 0.3
), reach(id, t) AS (
  SELECT u, v FROM sym
  UNION
  SELECT r.id, s.v FROM reach r JOIN sym s ON r.t = s.u
)
SELECT id, least(id, min(t)) AS component FROM reach GROUP BY id
"""
    )


ORACLE_SQL["dup_clusters"] = _dup_clusters_sql()

"""DuckDB oracle SQL for the sequential monitor catalog queries.

The five monitors are order-sensitive recursions, but over the driver's
``events`` table their exact semantics are SQL-expressible because the
process trajectory up to the first boundary crossing does not depend on
the post-break freeze: we compute the *unfrozen* trajectory with window
functions, locate the first crossing, and read the frozen state there.

Conventions replicated exactly from the engine
(:mod:`nrt_ray.kernels.monitors`, :mod:`nrt_ray.stages.fit_monitor`):

* history = observations strictly before ``monitor_start``; the fit runs
  per user over the history only;
* fit residuals carry the ``X·β − y`` sign (reference fit convention,
  ``/root/reference/nrt/fit_methods.py:58-71``), monitoring residuals are
  ``y − ŷ`` — seed/window/quantile state is built from the former,
  updates consume the latter;
* trend fits are solved by centering on the unweighted means (the same
  algebra as the engine's centered normal equations — the 1×1 solve is a
  division on both sides);
* ``days`` is whole days since 1970-01-01 (timestamp truncation);
* status codes: 1 monitored, 2 unstable, 3 break (first
  ``|process| ≥ boundary`` in the monitor window, state frozen there),
  4 too-short history (< 1.5·k valid observations);
* the final ``process`` is rounded half-away-from-zero to 6 digits, like
  the Ray side's ``round_away``.

Critical values (OLS-CUSUM, MOSUM) are computed once at import by the
same solvers the engine uses and inlined into the SQL as literals,
mirroring the reference's driver-side pre-computation of ``crit``
(``/root/reference/nrt/monitor/__init__.py:222-223``).
"""

from __future__ import annotations

from nrt_ray.kernels.efp import mosum_crit, ols_cusum_crit

MONITOR_START = "2024-01-22 00:00:00"

#: shared CTE prefix: per-user history rows (time-indexed) + monitor rows
_BASE = f"""
WITH hist AS (
    SELECT user_id, value,
           CAST(floor(epoch(ts)/86400) AS DOUBLE) AS d,
           row_number() OVER (PARTITION BY user_id ORDER BY ts) AS i
    FROM events WHERE ts < TIMESTAMP '{MONITOR_START}'
),
mon AS (
    SELECT user_id, value, ts,
           CAST(floor(epoch(ts)/86400) AS BIGINT) AS days,
           CAST(floor(epoch(ts)/86400) AS DOUBLE) AS d,
           row_number() OVER (PARTITION BY user_id ORDER BY ts) AS j
    FROM events WHERE ts >= TIMESTAMP '{MONITOR_START}'
),
users AS (SELECT DISTINCT user_id FROM events)
"""


def _fit_k1(ddof_expr: str) -> str:
    """Intercept-only fit (k=1): beta0 = history mean; residual std via an
    explicit two-pass (mean of residuals, then mean squared deviation) —
    the same op sequence as ``np.nanstd``."""
    return f"""
f1 AS (
    SELECT user_id, count(*) AS nh, avg(value) AS beta0 FROM hist
    GROUP BY user_id
),
f2 AS (
    SELECT h.user_id, avg(f.beta0 - h.value) AS mean_r
    FROM hist h JOIN f1 f USING (user_id) GROUP BY h.user_id
),
fit AS (
    SELECT h.user_id, any_value(f.nh) AS nh, any_value(f.beta0) AS beta0,
           sqrt(sum(power((f.beta0 - h.value) - f2.mean_r, 2))
                / ({ddof_expr})) AS sigma
    FROM hist h JOIN f1 f USING (user_id) JOIN f2 USING (user_id)
    GROUP BY h.user_id
)"""


#: trend fit (k=2): centered 1×1 solve; fit residuals X·β − y
_FIT_TREND = """
f1 AS (
    SELECT user_id, count(*) AS nh, avg(d) AS ad, avg(value) AS av
    FROM hist GROUP BY user_id
),
fit0 AS (
    SELECT h.user_id, any_value(f.nh) AS nh, any_value(f.ad) AS ad,
           any_value(f.av) AS av,
           any_value(f.av) - any_value(f.ad)
               * (sum((h.d - f.ad) * (h.value - f.av))
                  / sum((h.d - f.ad) * (h.d - f.ad))) AS b0,
           sum((h.d - f.ad) * (h.value - f.av))
               / sum((h.d - f.ad) * (h.d - f.ad)) AS b1
    FROM hist h JOIN f1 f USING (user_id) GROUP BY h.user_id
),
hresid AS (
    SELECT h.user_id, h.i, (f.b0 + f.b1 * h.d) - h.value AS r
    FROM hist h JOIN fit0 f USING (user_id)
)"""


#: shared tail over a `traj(user_id, days, j, p, bound)` CTE: first
#: crossing (state frozen there) else last value
_CROSS_FINAL = """
final AS (
    SELECT user_id,
           min(j) FILTER (WHERE abs(p) >= bound) AS jstar,
           arg_min(days, j) FILTER (WHERE abs(p) >= bound) AS det_days,
           coalesce(arg_min(p, j) FILTER (WHERE abs(p) >= bound),
                    arg_max(p, j)) AS p,
           arg_max(p, j) AS plast
    FROM traj GROUP BY user_id
)"""


def ewma_sql(lambda_: float = 0.3, sensitivity: float = 2.0,
             threshold_outlier: float = 10.0,
             freeze: bool = True) -> str:
    lam = repr(float(lambda_))
    om = repr(1.0 - float(lambda_))  # (1 − λ)
    freeze_lit = "TRUE" if freeze else "FALSE"
    return _BASE + "," + _fit_k1("any_value(f.nh)") + f""",
fitb AS (
    SELECT *, {repr(float(sensitivity))} * sigma
              * sqrt({lam} / (2.0 - {lam})) AS bound
    FROM fit
),
seedt AS (
    -- EWMA recursion over history fit residuals (beta0 − y), closed form
    SELECT h.user_id,
           {lam} * sum((f.beta0 - h.value) * power({om}, f.nh - h.i)) AS seed
    FROM hist h JOIN fitb f USING (user_id) GROUP BY h.user_id
),
mval AS (
    -- valid monitor obs: extreme residuals (|r| > thr·σ) are skipped
    SELECT m.user_id, m.days, (m.value - f.beta0) AS r,
           row_number() OVER (PARTITION BY m.user_id ORDER BY m.ts) AS v
    FROM mon m JOIN fitb f USING (user_id)
    WHERE NOT (abs(m.value - f.beta0)
               > {repr(float(threshold_outlier))} * f.sigma)
),
traj AS (
    SELECT mv.user_id, mv.days, mv.v AS j,
           power({om}, mv.v)
           * (s.seed + {lam} * sum(mv.r * power({om}, -mv.v))
                  OVER (PARTITION BY mv.user_id ORDER BY mv.v)) AS p,
           f.bound
    FROM mval mv JOIN seedt s USING (user_id)
    JOIN fitb f USING (user_id)
),
{_CROSS_FINAL}
SELECT u.user_id,
       CASE WHEN f.nh IS NULL OR f.nh <= 1 THEN 4
            WHEN s.seed > f.bound THEN 2
            WHEN {freeze_lit} AND fin.jstar IS NOT NULL THEN 3
            ELSE 1 END AS status,
       CAST(CASE WHEN {freeze_lit} AND f.nh IS NOT NULL AND f.nh > 1
                 AND NOT (s.seed > f.bound) AND fin.jstar IS NOT NULL
                 THEN fin.det_days ELSE 0 END AS BIGINT) AS detection_date,
       round(CASE WHEN f.nh IS NULL OR f.nh <= 1 THEN 0.0
                  WHEN s.seed > f.bound THEN s.seed
                  WHEN {freeze_lit} THEN coalesce(fin.p, s.seed)
                  ELSE coalesce(fin.plast, s.seed) END, 6) AS process
FROM users u
LEFT JOIN fitb f USING (user_id)
LEFT JOIN seedt s USING (user_id)
LEFT JOIN final fin USING (user_id)
"""


def cusum_sql(sensitivity: float = 0.05, freeze: bool = True) -> str:
    crit = repr(float(ols_cusum_crit(sensitivity)))
    freeze_lit = "TRUE" if freeze else "FALSE"
    x = "((f.nh + m.j) / CAST(f.nh AS DOUBLE))"
    return _BASE + "," + _fit_k1("any_value(f.nh) - 1") + f""",
seedt AS (
    SELECT h.user_id,
           sum((f.beta0 - h.value) / (f.sigma * sqrt(f.nh))) AS seed
    FROM hist h JOIN fit f USING (user_id) GROUP BY h.user_id
),
traj AS (
    SELECT m.user_id, m.days, m.j,
           s.seed + sum((m.value - f.beta0) / (f.sigma * sqrt(f.nh)))
               OVER (PARTITION BY m.user_id ORDER BY m.j) AS p,
           sqrt({x} * ({x} - 1.0)
                * ({crit} * {crit} + ln({x} / ({x} - 1.0)))) AS bound
    FROM mon m JOIN fit f USING (user_id) JOIN seedt s USING (user_id)
),
{_CROSS_FINAL}
SELECT u.user_id,
       CASE WHEN f.nh IS NULL OR f.nh <= 1 THEN 4
            WHEN {freeze_lit} AND fin.jstar IS NOT NULL THEN 3
            ELSE 1 END AS status,
       CAST(CASE WHEN {freeze_lit} THEN coalesce(fin.det_days, 0)
                 ELSE 0 END AS BIGINT) AS detection_date,
       round(CASE WHEN f.nh IS NULL OR f.nh <= 1 THEN 0.0
                  WHEN {freeze_lit} THEN coalesce(fin.p, s.seed)
                  ELSE coalesce(fin.plast, s.seed) END, 6) AS process
FROM users u
LEFT JOIN fit f USING (user_id)
LEFT JOIN seedt s USING (user_id)
LEFT JOIN final fin USING (user_id)
"""


def iqr_sql(sensitivity: float = 1.5, boundary: int = 3,
            freeze: bool = True) -> str:
    s = repr(float(sensitivity))
    freeze_lit = "TRUE" if freeze else "FALSE"
    return _BASE + f""",
f1 AS (
    SELECT user_id, count(*) AS nh, avg(value) AS beta0 FROM hist
    GROUP BY user_id
),
fit AS (
    SELECT h.user_id, any_value(f.nh) AS nh, any_value(f.beta0) AS beta0,
           quantile_cont(f.beta0 - h.value, 0.25) AS q25,
           quantile_cont(f.beta0 - h.value, 0.75) AS q75
    FROM hist h JOIN f1 f USING (user_id) GROUP BY h.user_id
),
mout AS (
    SELECT m.user_id, m.days, m.j,
           ((m.value - f.beta0) > f.q75 + {s} * (f.q75 - f.q25)
            OR (m.value - f.beta0) < f.q25 - {s} * (f.q75 - f.q25)) AS outl
    FROM mon m JOIN fit f USING (user_id)
),
traj AS (
    SELECT user_id, days, j,
           CAST(j - coalesce(max(CASE WHEN NOT outl THEN j END)
               OVER (PARTITION BY user_id ORDER BY j), 0) AS DOUBLE) AS p,
           {float(int(boundary))!r} AS bound
    FROM mout
),
{_CROSS_FINAL}
SELECT u.user_id,
       CASE WHEN f.nh IS NULL OR f.nh <= 1 THEN 4
            WHEN {freeze_lit} AND fin.jstar IS NOT NULL THEN 3
            ELSE 1 END AS status,
       CAST(CASE WHEN {freeze_lit} THEN coalesce(fin.det_days, 0)
                 ELSE 0 END AS BIGINT) AS detection_date,
       round(CASE WHEN {freeze_lit} THEN coalesce(fin.p, 0.0)
                  ELSE coalesce(fin.plast, 0.0) END, 6) AS process
FROM users u
LEFT JOIN fit f USING (user_id)
LEFT JOIN final fin USING (user_id)
"""


def ccdc_sql(sensitivity: float = 3.0, boundary: int = 3,
             threshold: float = 3.0, freeze: bool = True) -> str:
    s = repr(float(sensitivity))
    t = repr(float(threshold))
    freeze_lit = "TRUE" if freeze else "FALSE"
    return _BASE + "," + _FIT_TREND + f""",
fstat AS (
    SELECT hr.user_id, sqrt(avg(hr.r * hr.r)) AS rmse,
           arg_min(hr.r, hr.i) AS r_first, arg_max(hr.r, hr.i) AS r_last
    FROM hresid hr GROUP BY hr.user_id
),
fit AS (
    SELECT f.user_id, f.nh, f.b0, f.b1, fs.rmse,
           (abs(f.b1) / fs.rmse < {t}
            AND abs(fs.r_first) / fs.rmse < {t}
            AND abs(fs.r_last) / fs.rmse < {t}) AS stable
    FROM fit0 f JOIN fstat fs USING (user_id)
),
mout AS (
    SELECT m.user_id, m.days, m.j,
           CASE WHEN f.rmse = 0 THEN abs(m.value - (f.b0 + f.b1 * m.d)) > 0
                ELSE abs(m.value - (f.b0 + f.b1 * m.d)) / f.rmse > {s}
           END AS outl
    FROM mon m JOIN fit f USING (user_id)
    WHERE f.stable
),
traj AS (
    SELECT user_id, days, j,
           CAST(j - coalesce(max(CASE WHEN NOT outl THEN j END)
               OVER (PARTITION BY user_id ORDER BY j), 0) AS DOUBLE) AS p,
           {float(int(boundary))!r} AS bound
    FROM mout
),
{_CROSS_FINAL}
SELECT u.user_id,
       CASE WHEN f.nh IS NULL OR f.nh < 3 THEN 4
            WHEN NOT f.stable THEN 2
            WHEN {freeze_lit} AND fin.jstar IS NOT NULL THEN 3
            ELSE 1 END AS status,
       CAST(CASE WHEN {freeze_lit} THEN coalesce(fin.det_days, 0)
                 ELSE 0 END AS BIGINT) AS detection_date,
       round(CASE WHEN {freeze_lit} THEN coalesce(fin.p, 0.0)
                  ELSE coalesce(fin.plast, 0.0) END, 6) AS process
FROM users u
LEFT JOIN fit f USING (user_id)
LEFT JOIN final fin USING (user_id)
"""


def rirls_sql(tune: float = 4.685, scale_constant: float = 0.6745,
              maxiter: int = 50, tol: float = 1e-8) -> str:
    """Unrolled robust IRLS (Tukey bisquare, MAD scale) over the trend
    design — a faithful replay of :func:`nrt_ray.kernels.fit.rirls`
    (reference ``/root/reference/nrt/fit_methods.py:74-140``).

    Each of the (up to) ``maxiter − 1`` iterations is one CTE stage
    carrying per-user state ``(b0, b1, scale, active)``: weighted
    centered fit from the previous state, median / MAD of the new
    residuals, the reference's *signed* convergence test, and a frozen
    pass-through once inactive — exactly the kernel's control flow, so
    non-converged users (the cap is real on this data) match too.
    Emits the fit *level* at the per-user mean day plus the slope: both
    are conditioned ~1, unlike the intercept-at-epoch whose ~19700-day
    lever arm amplifies solver noise beyond rounding precision.
    """
    eps = repr(float(__import__("numpy").finfo("float32").eps))
    tn = repr(float(tune))
    sc = repr(float(scale_constant))
    tl = repr(float(tol))
    parts = [f"""
WITH ev AS MATERIALIZED (
    SELECT user_id, value,
           CAST(floor(epoch(ts)/86400) AS DOUBLE) AS d
    FROM events
),
g0 AS (
    SELECT user_id, count(*) AS n, avg(d) AS ad, avg(value) AS av
    FROM ev GROUP BY user_id
),
ft0 AS (
    SELECT e.user_id, any_value(g.ad) AS ad,
           any_value(g.av) - any_value(g.ad)
               * (sum((e.d - g.ad) * (e.value - g.av))
                  / sum((e.d - g.ad) * (e.d - g.ad))) AS b0,
           sum((e.d - g.ad) * (e.value - g.av))
               / sum((e.d - g.ad) * (e.d - g.ad)) AS b1
    FROM ev e JOIN g0 g USING (user_id) GROUP BY e.user_id
),
md0 AS (
    SELECT e.user_id,
           quantile_cont(e.value - (f.b0 + f.b1 * e.d), 0.5) AS med
    FROM ev e JOIN ft0 f USING (user_id) GROUP BY e.user_id
),
p0 AS MATERIALIZED (
    SELECT e.user_id, any_value(f.b0) AS b0, any_value(f.b1) AS b1,
           CASE WHEN quantile_cont(abs((e.value - (f.b0 + f.b1 * e.d))
                                       - m.med), 0.5) / {sc} >= {eps}
                THEN quantile_cont(abs((e.value - (f.b0 + f.b1 * e.d))
                                       - m.med), 0.5) / {sc}
                ELSE 1.0 END AS scale,
           (quantile_cont(abs((e.value - (f.b0 + f.b1 * e.d))
                              - m.med), 0.5) / {sc} >= {eps}) AS active
    FROM ev e JOIN ft0 f USING (user_id) JOIN md0 m USING (user_id)
    GROUP BY e.user_id
)"""]
    for i in range(1, int(maxiter)):
        p = f"p{i - 1}"
        r = f"(e.value - (p.b0 + p.b1 * e.d))"
        w = (f"(CASE WHEN abs({r} / p.scale) < {tn} THEN "
             f"power(1.0 - power({r} / p.scale / {tn}, 2), 2) "
             f"ELSE 0.0 END)")
        parts.append(f""",
w{i} AS MATERIALIZED (
    SELECT e.user_id, sum({w}) AS sw,
           sum({w} * e.d) AS swd, sum({w} * e.value) AS swy
    FROM ev e JOIN {p} p USING (user_id) GROUP BY e.user_id
),
f{i} AS MATERIALIZED (
    SELECT e.user_id,
           CASE WHEN g.sw = 0 THEN 0.0 ELSE
               (g.swy / g.sw) - (g.swd / g.sw)
               * (sum({w} * (e.d - g.swd / g.sw)
                      * (e.value - g.swy / g.sw))
                  / sum({w} * (e.d - g.swd / g.sw)
                        * (e.d - g.swd / g.sw))) END AS nb0,
           CASE WHEN g.sw = 0 THEN 0.0 ELSE
               sum({w} * (e.d - g.swd / g.sw)
                   * (e.value - g.swy / g.sw))
               / sum({w} * (e.d - g.swd / g.sw)
                     * (e.d - g.swd / g.sw)) END AS nb1
    FROM ev e JOIN {p} p USING (user_id) JOIN w{i} g USING (user_id)
    GROUP BY e.user_id, g.sw, g.swd, g.swy
),
m{i} AS MATERIALIZED (
    SELECT e.user_id,
           quantile_cont(e.value - (f.nb0 + f.nb1 * e.d), 0.5) AS med
    FROM ev e JOIN f{i} f USING (user_id) GROUP BY e.user_id
),
p{i} AS MATERIALIZED (
    SELECT e.user_id,
           CASE WHEN any_value(p.active) THEN any_value(f.nb0)
                ELSE any_value(p.b0) END AS b0,
           CASE WHEN any_value(p.active) THEN any_value(f.nb1)
                ELSE any_value(p.b1) END AS b1,
           CASE WHEN any_value(p.active) THEN
               greatest({eps},
                   quantile_cont(abs((e.value - (f.nb0 + f.nb1 * e.d))
                                     - m.med), 0.5) / {sc})
                ELSE any_value(p.scale) END AS scale,
           (any_value(p.active)
            AND ((any_value(f.nb0) - any_value(p.b0)) > {tl}
                 OR (any_value(f.nb1) - any_value(p.b1)) > {tl}))
               AS active
    FROM ev e JOIN {p} p USING (user_id) JOIN f{i} f USING (user_id)
    JOIN m{i} m USING (user_id)
    GROUP BY e.user_id
)""")
    parts.append(f"""
SELECT p.user_id,
       round(p.b0 + p.b1 * g.ad, 5) AS level,
       round(p.b1, 6) AS slope,
       true AS stable
FROM p{int(maxiter) - 1} p JOIN g0 g USING (user_id)
""")
    return "".join(parts)


def mosum_sql(sensitivity: float = 0.05, h: float = 0.25,
              freeze: bool = True) -> str:
    crit = repr(float(mosum_crit(sensitivity, h=h, period=10,
                                 functional="max")))
    freeze_lit = "TRUE" if freeze else "FALSE"
    hh = repr(float(h))
    x = "((f.nh + m.j) / CAST(f.nh AS DOUBLE))"
    return _BASE + "," + _FIT_TREND + f""",
fs1 AS (
    SELECT user_id, avg(r) AS mean_r FROM hresid GROUP BY user_id
),
fstat AS (
    SELECT hr.user_id,
           sqrt(sum(power(hr.r - fs1.mean_r, 2))
                / (any_value(f.nh) - 2)) AS sigma
    FROM hresid hr JOIN fs1 USING (user_id)
    JOIN fit0 f USING (user_id)
    GROUP BY hr.user_id
),
fit AS (
    SELECT f.user_id, f.nh, f.b0, f.b1, fs.sigma,
           CAST(floor(f.nh * {hh}) AS BIGINT) AS winsize
    FROM fit0 f JOIN fstat fs USING (user_id)
),
-- combined normalized-residual sequence: history (fit sign X·β − y) then
-- monitoring (y − ŷ); the ring buffer of the last `winsize` writes equals
-- a rolling window over this sequence
combined AS (
    SELECT hr.user_id, hr.i AS g,
           hr.r / (f.sigma * sqrt(f.nh)) AS norm
    FROM hresid hr JOIN fit f USING (user_id)
    UNION ALL
    SELECT m.user_id, f.nh + m.j AS g,
           (m.value - (f.b0 + f.b1 * m.d)) / (f.sigma * sqrt(f.nh)) AS norm
    FROM mon m JOIN fit f USING (user_id)
),
traj AS (
    SELECT m.user_id, m.days, m.j, sum(c.norm) AS p,
           any_value({crit} * sqrt(2.0 *
               CASE WHEN {x} > exp(1.0) THEN ln({x}) ELSE 1.0 END)) AS bound
    FROM mon m JOIN fit f USING (user_id)
    JOIN combined c ON c.user_id = m.user_id
         AND c.g > f.nh + m.j - f.winsize AND c.g <= f.nh + m.j
    GROUP BY m.user_id, m.days, m.j
),
{_CROSS_FINAL},
-- a user with no monitor rows reports the nansum of its init window
initsum AS (
    SELECT c.user_id, sum(c.norm) AS p0
    FROM combined c JOIN fit f USING (user_id)
    WHERE c.g > f.nh - f.winsize AND c.g <= f.nh
    GROUP BY c.user_id
)
SELECT u.user_id,
       CASE WHEN f.nh IS NULL OR f.nh < 3 THEN 4
            WHEN {freeze_lit} AND fin.jstar IS NOT NULL THEN 3
            ELSE 1 END AS status,
       CAST(CASE WHEN {freeze_lit} THEN coalesce(fin.det_days, 0)
                 ELSE 0 END AS BIGINT) AS detection_date,
       round(CASE WHEN f.nh IS NULL OR f.nh < 3 THEN 0.0
                  WHEN {freeze_lit} THEN coalesce(fin.p, i.p0, 0.0)
                  ELSE coalesce(fin.plast, i.p0, 0.0) END, 6) AS process
FROM users u
LEFT JOIN fit f USING (user_id)
LEFT JOIN final fin USING (user_id)
LEFT JOIN initsum i USING (user_id)
"""


def roc_sql(crit: float | None = None, min_daily: int = 5,
            min_span_days: int = 14, span: int = 3) -> str:
    """Reverse-Ordered-CUSUM stable fit replayed with window functions.

    Replays :func:`nrt_ray.kernels.fit.roc_stable_fit` over per-day
    composite means (reference ``/root/reference/nrt/fit_methods.py:141``,
    stable-history search ``nrt/utils_efp.py:67-100``):

    * per-day composite = ``(sum(cents)/100.0)/count`` — the identical
      correctly-rounded op sequence as the pipeline's integer-cents mean;
    * Brown-Durbin-Evans recursive residuals of the *time-reversed*
      series in closed form — distinct days make every prefix design
      nonsingular, so the rank-one-update recursion equals prefix OLS
      computed from window cumulative sums (span = k+1 = 3);
    * the Rec-CUSUM significance test ``p-value < alpha`` is equivalent
      to "some process point exceeds the linear boundary
      ``crit·(1+2t)``" (the sup-statistic and the boundary use the same
      time grid, and the p-value is monotone in the statistic with
      ``crit`` its root at alpha) — so crossings alone decide;
    * stable suffix refit via the same centered normal equations as
      ``_solve_normal``; level reported at the full-series mean day.
    """
    if crit is None:
        from nrt_ray.kernels.efp import REC_CUSUM_CRIT_005
        crit = REC_CUSUM_CRIT_005
    from nrt_ray.pipelines.relational import round_away_tol_sql
    cr = repr(float(crit))
    sp = int(span)
    _lvl = round_away_tol_sql(
        "coalesce((f.av - f.ad * f.b1) + f.b1 * c.adf, 0.0)", 5)
    _slp = round_away_tol_sql("coalesce(f.b1, 0.0)", 6)
    return f"""
WITH daily AS MATERIALIZED (
    SELECT user_id,
           CAST(floor(epoch(ts)/86400) AS BIGINT) AS d,
           (sum(CAST(round(value * 100, 0) AS BIGINT)) / 100.0)
               / count(*) AS y
    FROM events
    GROUP BY user_id, CAST(floor(epoch(ts)/86400) AS BIGINT)
),
flt AS MATERIALIZED (
    SELECT user_id, d, CAST(d AS DOUBLE) AS dd, y
    FROM daily
    QUALIFY count(*) OVER (PARTITION BY user_id) >= {min_daily}
),
ord AS (
    SELECT user_id, d, dd, y,
           row_number() OVER w AS q,
           count(*) OVER (PARTITION BY user_id) AS n,
           count(*) OVER wp AS s,
           sum(dd) OVER wp AS sd,
           sum(dd * dd) OVER wp AS sdd,
           sum(y) OVER wp AS sy,
           sum(dd * y) OVER wp AS sdy
    FROM flt
    WINDOW w AS (PARTITION BY user_id ORDER BY d DESC),
           wp AS (PARTITION BY user_id ORDER BY d DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
rr AS (
    -- standardized recursive residual of the reversed series at q>span:
    -- prediction error from the prefix OLS over rows 1..q-1, scaled by
    -- sqrt(1 + x'(X'X)^-1 x) (closed form for the [1, day] design)
    SELECT user_id, q, n,
           (y - ((sdd * sy - sd * sdy) / det
                 + (s * sdy - sd * sy) / det * dd))
           / sqrt(1 + (sdd - 2 * dd * sd + s * dd * dd) / det) AS w
    FROM (SELECT *, s * sdd - sd * sd AS det FROM ord)
    WHERE q > {sp}
),
sg AS (
    SELECT user_id, any_value(n) AS n, stddev_pop(w) AS sigma
    FROM rr GROUP BY user_id
),
proc AS (
    -- Rec-CUSUM process p_j, j = 1..n-span (leading p_0 = 0 omitted:
    -- it can never cross the boundary crit·(1+2t) >= crit > 0)
    SELECT r.user_id, r.q - {sp} AS j, g.n - {sp} AS m,
           sum(r.w) OVER (PARTITION BY r.user_id ORDER BY r.q)
               / (g.sigma * sqrt(g.n - {sp})) AS p
    FROM rr r JOIN sg g USING (user_id)
),
crs AS (
    SELECT user_id, min(j) AS jmin
    FROM proc
    WHERE abs(p) > {cr} * (1 + 2.0 * j / m)
    GROUP BY user_id
),
sidx AS (
    SELECT g.user_id, g.n,
           CASE WHEN c.jmin IS NULL THEN 0
                ELSE (g.n - {sp} + 1) - c.jmin END AS stable_idx
    FROM sg g LEFT JOIN crs c USING (user_id)
),
fwd AS (
    SELECT user_id, d, dd, y,
           row_number() OVER (PARTITION BY user_id ORDER BY d ASC) AS fq
    FROM flt
),
gg AS (
    SELECT user_id, max(d) AS dlast, avg(dd) AS adf
    FROM flt GROUP BY user_id
),
cond AS (
    SELECT s.user_id, s.stable_idx, st.d AS start_d,
           (s.n - s.stable_idx >= {sp}
            AND g.dlast - st.d >= {min_span_days}) AS ok,
           g.adf
    FROM sidx s
    JOIN gg g USING (user_id)
    JOIN fwd st ON st.user_id = s.user_id AND st.fq = s.stable_idx + 1
),
g1 AS (
    SELECT w.user_id, avg(w.dd) AS ad, avg(w.y) AS av
    FROM fwd w JOIN cond c USING (user_id)
    WHERE c.ok AND w.fq >= c.stable_idx + 1
    GROUP BY w.user_id
),
fit AS (
    SELECT w.user_id,
           any_value(g.av) AS av, any_value(g.ad) AS ad,
           sum((w.dd - g.ad) * (w.y - g.av))
               / sum((w.dd - g.ad) * (w.dd - g.ad)) AS b1
    FROM fwd w JOIN cond c USING (user_id) JOIN g1 g USING (user_id)
    WHERE c.ok AND w.fq >= c.stable_idx + 1
    GROUP BY w.user_id
)
SELECT c.user_id,
       {_lvl} AS level,
       {_slp} AS slope,
       c.ok AS stable,
       CAST(CASE WHEN c.ok THEN c.start_d ELSE 0 END AS BIGINT)
           AS fit_start
FROM cond c LEFT JOIN fit f USING (user_id)
"""

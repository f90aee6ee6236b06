"""Time-series operators: gap-fill densification, SCD2 interval
construction, consecutive-event deltas, fixed-width histograms.

These extend the reference's event-report surface (P: = /root/reference/
modules/src/prisma_report/lambda.py builds daily report frames, P:218-226
date-window math) with the time-series shapes a warehouse user expects on
top of the same events data. Everything is built-in Catalyst operators —
window functions, ``sequence``/``explode`` densification, floor-bucket
aggregation — so whole-stage codegen and partial aggregation apply; no
Python UDFs, no driver-side loops.

Scale notes (100 TB posture):
- ``gap_fill`` shuffles once on the group key for the per-key span, and
  the grid⋈actual join re-uses the same key so AQE co-partitions it; the
  grid is at most (days-in-span) rows per key — output-sized, never a
  cross join.
- ``scd2_intervals`` and ``event_deltas`` are single-shuffle window
  scans: state per key is one row (lag/lead), so executor memory is
  bounded by the sort spill, not the key's history.
- ``fixed_histogram`` is a map-side-combinable groupBy on a computed
  bucket — the shuffle carries at most ``nbins`` rows per map partition.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def gap_fill(df: DataFrame, key: str, date_col: str, value_col: str,
             out: str = "filled") -> DataFrame:
    """Densify a per-key daily series and forward-fill missing values.

    ``df`` holds at most one row per (key, date). Emits one row per key
    per calendar day between that key's min and max date; days absent
    from ``df`` carry the most recent preceding value (classic
    last-observation-carried-forward). The dense grid is built per key
    with ``sequence(min, max)`` + ``explode`` — sized by the key's own
    span, so no global calendar cross join — and the fill is a running
    ``last(ignorenulls)`` window, one shuffle on ``key``.
    """
    spans = df.groupBy(key).agg(F.min(date_col).alias("_lo"),
                                F.max(date_col).alias("_hi"))
    grid = spans.select(key, F.explode(F.sequence("_lo", "_hi")).alias(date_col))
    joined = grid.join(df, [key, date_col], "left")
    w = (Window.partitionBy(key).orderBy(date_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return joined.withColumn(out, F.last(value_col, ignorenulls=True).over(w)) \
                 .drop(value_col)


def scd2_intervals(df: DataFrame, keys: Sequence[str], ts_col: str,
                   tiebreak: str,
                   valid_from: str = "valid_from",
                   valid_to: str = "valid_to",
                   current_flag: str = "is_current") -> DataFrame:
    """Slowly-changing-dimension type-2 intervals from a change log.

    Each row of ``df`` is one observed version of the entity identified
    by ``keys``. Emits the row plus ``valid_from`` (= its ``ts_col``),
    ``valid_to`` (= the next version's ``ts_col``, NULL for the latest)
    and ``is_current`` (1 where ``valid_to`` IS NULL). ``tiebreak`` must
    totalize the order among same-timestamp versions (e.g. a change id)
    so the interval chain is deterministic. Single window shuffle on
    ``keys``; ``lead`` keeps one row of state per key.
    """
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col).asc(),
                                          F.col(tiebreak).asc())
    nxt = F.lead(F.col(ts_col)).over(w)
    return (df.withColumn(valid_from, F.col(ts_col))
              .withColumn(valid_to, nxt)
              .withColumn(current_flag,
                          F.col(valid_to).isNull().cast("int")))


def event_deltas(df: DataFrame, key: str, ts_col: str, tiebreak: str,
                 value_col: str,
                 gap_out: str = "gap", delta_out: str = "delta") -> DataFrame:
    """Consecutive-event gaps and value deltas per key (lag window).

    ``gap_out`` = ts − previous ts, ``delta_out`` = value − previous
    value; both NULL on each key's first event. ``tiebreak`` totalizes
    same-timestamp order. One shuffle on ``key``; O(1) window state.
    """
    w = Window.partitionBy(key).orderBy(F.col(ts_col).asc(),
                                        F.col(tiebreak).asc())
    return (df.withColumn(gap_out, F.col(ts_col) - F.lag(ts_col).over(w))
              .withColumn(delta_out,
                          F.col(value_col) - F.lag(value_col).over(w)))


def fixed_histogram(df: DataFrame, col: str, lo: float, width: float,
                    nbins: int,
                    bucket_out: str = "bucket",
                    count_out: str = "cnt") -> DataFrame:
    """Fixed-width histogram: bucket = floor((x − lo) / width), clamped
    to [0, nbins−1] so outliers land in the edge buckets. A plain
    map-side-combinable groupBy — the shuffle moves ≤ nbins rows per map
    partition regardless of input size. The floor-of-one-division
    formulation is a single IEEE double op, so an external system
    computing the same expression buckets rows identically.
    """
    b = F.floor((F.col(col) - F.lit(float(lo))) / F.lit(float(width)))
    b = F.least(F.greatest(b, F.lit(0)), F.lit(nbins - 1))
    return (df.groupBy(b.cast("long").alias(bucket_out))
              .agg(F.count(F.lit(1)).alias(count_out)))


def merge_intervals(df: DataFrame, key: str, start_col: str, end_col: str,
                    tiebreak: str,
                    out_start: str = "island_start",
                    out_end: str = "island_end",
                    count_out: str = "n_intervals") -> DataFrame:
    """Merge overlapping/touching intervals per key into islands
    (classic gap-and-islands over VARIABLE-LENGTH intervals — unlike
    ``relational.sessionize``, which gaps between points, this handles
    nested and back-dated intervals via a running max of interval ends).

    An interval starts a new island iff its start exceeds the running max
    of all previous ends; the island id is the running count of such
    breaks. Emits one row per island: key, min start, max end, interval
    count. ``tiebreak`` totalizes same-start order. One shuffle on
    ``key``; two stacked windows share the sort, then a
    map-side-combinable groupBy on (key, island).
    """
    w = Window.partitionBy(key).orderBy(F.col(start_col).asc(),
                                        F.col(tiebreak).asc())
    prev_max_end = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1))
    brk = F.when(prev_max_end.isNull()
                 | (F.col(start_col) > prev_max_end), 1).otherwise(0)
    island = F.sum(brk).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (df.withColumn("_island", island)
              .groupBy(key, "_island")
              .agg(F.min(start_col).alias(out_start),
                   F.max(end_col).alias(out_end),
                   F.count(F.lit(1)).alias(count_out))
              .drop("_island"))


def seasonal_anomaly(events: DataFrame, ts_col: str = "ts",
                     z_threshold: float = 2.0) -> DataFrame:
    """Seasonal-profile anomaly detection on event volume: hourly counts
    are compared to the mean/stddev of the SAME hour-of-day across all
    days (the seasonal baseline), and (day, hour) cells whose z-score
    crosses the threshold are flagged — the on-call 'traffic looks wrong
    for 3am' primitive, purely declarative.

    Timestamps reduce to integer epoch seconds first (``unix_seconds`` —
    timezone-free, the repo-wide rule for ts determinism), so the
    day/hour bucketing is exact integer math. The per-hour-of-day
    mean/std come from exact integer sums (sample stddev, one sqrt at
    the edge); z is a fixed double chain. Hours observed on fewer than 2
    days, or with zero variance, are skipped (z undefined).

    Scale design: the raw scan collapses map-side to one row per
    (day, hour); the seasonal profile is a 24-row frame broadcast back.
    Returns (day, hod, n, mean_r, z_r) for flagged cells.
    """
    sec = F.unix_seconds(F.col(ts_col))
    cells = (events
             .select((sec - (sec % 86400)).alias("day"),
                     ((sec % 86400) / 3600).cast("long").alias("hod"))
             .groupBy("day", "hod")
             .agg(F.count(F.lit(1)).alias("n")))
    prof = cells.groupBy("hod").agg(
        F.count(F.lit(1)).alias("_d"),
        F.sum("n").alias("_s"),
        F.sum(F.col("n") * F.col("n")).alias("_ss"))
    d = F.col("_d").cast("double")
    s, ss = F.col("_s").cast("double"), F.col("_ss").cast("double")
    mean = s / d
    var = (d * ss - s * s) / (d * (d - 1))
    prof = (prof.filter(F.col("_d") >= 2)
                .select("hod", mean.alias("_mean"),
                        F.sqrt(var).alias("_std"))
                .filter(F.col("_std") > 0))
    z = (F.col("n").cast("double") - F.col("_mean")) / F.col("_std")
    return (cells.join(F.broadcast(prof), "hod")
                 .withColumn("_z", z)
                 .filter(F.abs(F.col("_z")) >= F.lit(float(z_threshold)))
                 .select("day", "hod", "n",
                         F.round("_mean", 6).alias("mean_r"),
                         F.round("_z", 6).alias("z_r")))


def weighted_moving_average(df: DataFrame, key_col: str,
                            order_cols: Sequence[str],
                            value_col: str, k: int = 4) -> DataFrame:
    """Per-key exponentially-weighted moving average over the last ``k``
    observations (weights 2^(k-1)..2^0, newest heaviest) — the finite-
    window form of EWMA smoothing. True recursive EWMA is inherently
    sequential per key (each output depends on the previous output);
    the k-tap form is the same smoother truncated where the geometric
    weights vanish, and unlike the recursion it is ONE window scan of
    lag() expressions — whole-stage codegen, state per key = k rows in
    the window buffer, no Python, no per-key iteration.

    Exactness: values quantize to cents once (round(v*100) — the
    stats._cents contract), every tap is cents * 2^j in LONG, and the
    variable-width head (rows with fewer than k predecessors) divides
    by the sum of the weights ACTUALLY present, half-up sign-aware in
    exact integer space, emitted at micro precision (x1e6). A row whose
    value AND all k-1 predecessors are NULL has no weight mass at all
    (_d = 0) and yields wma_micro = NULL — guarded explicitly, because
    Spark's non-ANSI DIV returns NULL on /0 while DuckDB's // raises,
    so an unguarded division diverges between engines. Returns
    (key, order cols..., wma_micro).
    """
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    cents = F.round(F.col(value_col) * 100).cast("long")
    num = None
    den = None
    for j in range(k):
        tap = F.lag(cents, j).over(w)
        wt = 1 << (k - 1 - j)
        t_num = F.coalesce(tap, F.lit(0)) * wt
        t_den = F.when(tap.isNotNull(), F.lit(wt)).otherwise(F.lit(0))
        num = t_num if num is None else num + t_num
        den = t_den if den is None else den + t_den
    out_cols = [F.col(key_col), *[F.col(c) for c in order_cols]]
    return (df.select(*out_cols, num.alias("_n"), den.alias("_d"))
              .select(*out_cols,
                      # half-up of (_n * 1e4) / _d, sign-aware, exact;
                      # _d = 0 (all taps NULL) => NULL, same in oracle
                      F.expr("CAST(CASE WHEN _d = 0 THEN NULL "
                             "WHEN _n >= 0 "
                             "THEN (2 * _n * 10000 + _d) DIV (2 * _d) "
                             "ELSE -((2 * -_n * 10000 + _d) DIV (2 * _d)) "
                             "END AS BIGINT)").alias("wma_micro")))

"""Relational / dataflow operators — SURVEY.md §2.2 + §2.3 IDs.

Each function is a pure, composable ``DataFrame -> DataFrame`` transform.
Everything here is built-in Catalyst operators: predicate pushdown, column
pruning, partial aggregation (map-side combine) and whole-stage codegen
come for free. No Python UDFs, no collect() in the data path — the single
deliberate exception is ``foreach_group`` which replicates the reference's
*driver-side dependent fan-out* (see its docstring).

Reference citations (P: = /root/reference/modules/src/prisma_report/lambda.py,
A: = /root/reference/modules/src/aler_report/lambda.py) identify the behavior
each operator re-expresses; the implementations are Spark-native, not ports.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping, Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..cache import tracked_persist


# --- pushdown-class operators (P:229-248,272-273 serialized these into ----
# --- API payloads; here they are ordinary Catalyst ops that reach the scan)

def filter_eq(df: DataFrame, col: str, value: object) -> DataFrame:
    """Equality predicate (pd-filter-eq, P:229-237). Pushed to the scan."""
    return df.filter(F.col(col) == F.lit(value))


def filter_in(df: DataFrame, col: str, values: Sequence[object]) -> DataFrame:
    """Disjunctive membership (pd-filter-in, P:232-236)."""
    return df.filter(F.col(col).isin(list(values)))


def filter_range(df: DataFrame, col: str, lo: object, hi: object) -> DataFrame:
    """Inclusive range predicate (pd-filter-range, P:238-244).

    The reference computes month-start..end-of-today epoch-ms bounds
    (P:218-226); callers pass explicit bounds so runs stay pure functions
    of (config, run_date).
    """
    return df.filter(F.col(col).between(lo, hi))


def sort_desc(df: DataFrame, keys: Sequence[str], ascending: Sequence[bool] | None = None,
              tiebreak: Sequence[str] = ()) -> DataFrame:
    """Multi-key sort (pd-sort, P:245-248). ``tiebreak`` keys make the
    order total so limit() results are deterministic."""
    asc = list(ascending) if ascending is not None else [False] * len(keys)
    cols = [F.col(k).asc() if a else F.col(k).desc() for k, a in zip(keys, asc)]
    cols += [F.col(t).asc() for t in tiebreak]
    return df.orderBy(*cols)


def limit_page(df: DataFrame, n: int) -> DataFrame:
    """Limit (pd-limit-page, P:272-273). Pagination itself is connector-
    internal (sources/rest.py); a global limit is all the query sees."""
    return df.limit(n)


# --- local operators (executed in pandas/python loops by the reference) ---

def group_agg_count(df: DataFrame, keys: Sequence[str],
                    aggs: Mapping[str, Column]) -> DataFrame:
    """Group-by + aggregate (op-groupagg-count, P:320-334; pd-groupby, P:13).

    The reference accumulates dicts row-at-a-time and keeps the *first seen*
    value per group — an order-dependent accident (SURVEY §2.5.5). We take
    deterministic aggregates (min/max/count) instead; Spark executes this
    with partial aggregation before the shuffle, so cardinality reduction
    happens map-side — the property that makes it scale to 100 TB.
    """
    return df.groupBy(*keys).agg(*[c.alias(name) for name, c in aggs.items()])


def project_rename(df: DataFrame, mapping: Mapping[str, Column | str]) -> DataFrame:
    """Projection + rename + literal enrichment (op-project-rename, P:335-348).

    ``mapping`` is {output_name: source_col_name_or_Column}; plain strings
    are treated as column references.
    """
    cols = [
        (F.col(src) if isinstance(src, str) else src).alias(out)
        for out, src in mapping.items()
    ]
    return df.select(*cols)


def upper_cols(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Uppercase string columns in place (op-upper, P:340-341)."""
    return df.withColumns({c: F.upper(F.col(c)) for c in cols})


def fill_nulls(df: DataFrame, value: object = 0,
               subset: Sequence[str] | None = None) -> DataFrame:
    """Null replacement (op-fillna, P:178,354,405).

    Parity note (FIXTURES.md): pandas ``fillna(0)`` hits every dtype;
    Spark ``na.fill(0)`` only fills numeric columns — the sane behavior,
    documented as a deviation.
    """
    return df.na.fill(value, subset=list(subset) if subset else None)


def union_all(dfs: Sequence[DataFrame]) -> DataFrame:
    """Union-all of N homogeneous frames (op-union-all, P:403).

    By-name with missing-column tolerance, because the reference's
    ``pd.concat`` aligns on column names, not position.
    """
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs)


def empty_guard(df: DataFrame) -> DataFrame:
    """Empty-input short-circuit (op-empty-guard, P:350-351).

    In Spark an empty DataFrame with an explicit schema unions and writes
    fine; this is the identity, kept as a named op so pipelines can assert
    schema-stability on the empty path.
    """
    return df


def foreach_group(df: DataFrame, key: str,
                  scan_for_key: Callable[[object], DataFrame]) -> DataFrame:
    """Driver-side dependent fan-out (op-foreach-group, P:394-401).

    The reference iterates distinct ``serviceName`` values and issues a new
    *remote* scan per value — a dependent join against a source that only
    answers parameterized queries. That driver-side loop is inherent to the
    access pattern (not a Spark shortcoming): the distinct-key set is tiny
    (#services), each scan is an independent job, and the per-key frames
    union lazily. When the source is local data, use a real groupBy/join
    instead — see catalog.py's op-foreach-group query, whose oracle shows
    the fan-out is semantically a group-by.
    """
    keys = [r[0] for r in df.select(key).distinct().collect()]
    frames = [scan_for_key(k) for k in sorted(keys, key=str)]
    return union_all(frames)


def top_k_per_group(df: DataFrame, part_keys: Sequence[str], order_col: str,
                    k: int, descending: bool = True,
                    tiebreak: Sequence[str] = ()) -> DataFrame:
    """Per-group top-k via window row_number (north-star extension).

    Scale note: Spark pushes a per-partition ``WindowGroupLimit`` (rank
    limit) before the shuffle in recent versions; for extreme skew, a
    two-phase approach (map-side partial top-k via groupBy + slice) is the
    fallback. Deterministic given ``tiebreak`` totalizes the order.
    """
    order = [F.col(order_col).desc() if descending else F.col(order_col).asc()]
    order += [F.col(t).asc() for t in tiebreak]
    from pyspark.sql.window import Window
    w = Window.partitionBy(*part_keys).orderBy(*order)
    return (df.withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") <= k)
              .drop("_rn"))


def salted_join(left: DataFrame, right: DataFrame, on: Sequence[str],
                salt: int = 8, left_unique: str | None = None) -> DataFrame:
    """Inner equi-join with hand-salting for hot keys (the explicit skew
    strategy; AQE's skew-join split is the automatic one — use this when
    a single key is so hot that even split shuffle blocks overwhelm one
    executor, e.g. a null-ish default key owning 10% of a 100 TB fact).

    The big (left) side gets a DETERMINISTIC salt derived from
    ``left_unique`` (any high-cardinality column; defaults to all left
    columns), splitting each hot key into ``salt`` shuffle partitions; the
    small (right) side is replicated once per salt value via a tiny
    explode. Result set is identical to the plain join — verified by the
    op-salted-join oracle.
    """
    keys = list(on)
    salt_src = [F.col(left_unique)] if left_unique else [F.col(c) for c in left.columns]
    lt = left.withColumn("_salt", F.pmod(F.xxhash64(*salt_src), F.lit(salt)))
    rt = right.withColumn("_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    return lt.join(rt, keys + ["_salt"]).drop("_salt")


def sessionize(df: DataFrame, key: str, ts_col: str, gap: int) -> DataFrame:
    """Gap-based sessionization (north-star extension; no reference
    analog): rows for the same ``key`` belong to one session while
    consecutive timestamps are within ``gap`` (same units as ``ts_col``).

    Classic gap-and-islands, all window functions: lag -> new-session flag
    -> running sum = session index -> per-session aggregate. One shuffle
    on the key, linear in input; the batch twin of a streaming
    applyInPandasWithState sessionizer (streaming/windows.py handles the
    windowed path).

    Returns (key, session_id, session_start, session_end, n_events).
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(key).orderBy(F.col(ts_col).asc())
    flagged = df.withColumn(
        "_new", F.when(
            (F.col(ts_col) - F.lag(ts_col).over(w) > gap)
            | F.lag(ts_col).over(w).isNull(), 1).otherwise(0))
    numbered = flagged.withColumn(
        "session_id", F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    return (numbered.groupBy(key, "session_id")
            .agg(F.min(ts_col).alias("session_start"),
                 F.max(ts_col).alias("session_end"),
                 F.count("*").alias("n_events")))


def grouped_demean(df: DataFrame, key: str, value_col: str,
                   out: str = "value_centered") -> DataFrame:
    """Per-group centering against the group MINIMUM via Arrow-batched
    applyInPandas (north-star extension): the UDF-registration surface
    demo where Python semantics are genuinely wanted per group.

    Centering on min (not mean) keeps the result exactly reproducible by
    the SQL oracle: min is order-independent, while a pandas float mean
    would differ from the engine's in the last bits.
    """
    import pandas as pd

    schema = f"{key} STRING, {value_col} DOUBLE, {out} DOUBLE"

    def center(pdf: "pd.DataFrame") -> "pd.DataFrame":
        m = pdf[value_col].min()
        return pd.DataFrame({
            key: pdf[key],
            value_col: pdf[value_col],
            out: pdf[value_col] - m,
        })

    return df.select(key, value_col).groupBy(key).applyInPandas(center, schema)


def asof_join(left: DataFrame, right: DataFrame, on: Sequence[str],
              left_ts: str, right_ts: str,
              right_cols: Mapping[str, str],
              direction: str = "backward",
              tiebreak: Sequence[str] = ()) -> DataFrame:
    """As-of join: for each left row, the nearest right row within the
    same ``on`` keys — ``direction="backward"`` (default) takes the most
    recent right row with ``right_ts <= left_ts``; ``"forward"`` takes
    the next right row with ``right_ts >= left_ts`` (next-event
    attribution: e.g. each click picks up the FOLLOWING purchase).
    North-star extension; no reference analog.

    Spark-first implementation: union the two sides tagged, sort within
    each key partition by timestamp, and fill the right side's values
    with ``last/first(..., ignorenulls=True)`` over a one-sided window.
    One shuffle on the join keys, no O(n·m) expansion — unlike the
    naive join+filter+max approach, this scales linearly and handles 100 TB
    fact tables as long as keys distribute (salt if a key is hot).

    ``right_cols``: {right_col: output_name} values carried onto left rows.
    Left rows with no matching right row keep nulls.

    **Ties:** when several right rows share the same ``(on, right_ts)``
    the winner is otherwise arbitrary (whatever order the sort happens to
    leave tied rows in). Pass ``tiebreak`` — right-side column names —
    to totalize the order: the tied right row with the GREATEST tiebreak
    values wins in both directions (nulls lose). Without ``tiebreak``,
    callers should ensure ``right_ts`` is unique per key (e.g. pre-
    aggregate the right side) if run-to-run determinism matters.
    """
    from pyspark.sql.window import Window

    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    back = direction == "backward"
    tag = "_asof_side"
    lt = left.withColumn(tag, F.lit(1)).withColumn("_ts", F.col(left_ts))
    rsel = dict.fromkeys(list(right_cols) + list(tiebreak))
    rcols = [F.col(c).alias(f"_r_{c}") for c in rsel]
    rt = (right.select(*[F.col(k) for k in on], F.col(right_ts).alias("_ts"), *rcols)
               .withColumn(tag, F.lit(0)))
    merged = lt.unionByName(rt, allowMissingColumns=True)
    # tie handling makes the bound inclusive on both directions: backward
    # sorts right rows BEFORE left at equal _ts (tag 0 < 1) so an equal-ts
    # right row is inside the preceding frame; forward sorts them AFTER
    # (tag desc) so it is inside the following frame. Tag dominates the
    # tiebreak columns at equal _ts, so the tiebreak only orders right
    # rows among themselves: backward fills with last() so ASC puts the
    # greatest tied row at the frame edge; forward fills with first() so
    # DESC does — greatest-wins in both directions.
    order = [F.col("_ts").asc(), F.col(tag).asc() if back else F.col(tag).desc()]
    order += [F.col(f"_r_{c}").asc() if back else F.col(f"_r_{c}").desc()
              for c in tiebreak]
    w = Window.partitionBy(*on).orderBy(*order)
    w = (w.rowsBetween(Window.unboundedPreceding, Window.currentRow) if back
         else w.rowsBetween(Window.currentRow, Window.unboundedFollowing))
    fill = (lambda c: F.last(c, ignorenulls=True)) if back else \
           (lambda c: F.first(c, ignorenulls=True))
    for c, out in right_cols.items():
        merged = merged.withColumn(out, fill(F.col(f"_r_{c}")).over(w))
    return (merged.filter(F.col(tag) == 1)
                  .drop(tag, "_ts", *[f"_r_{c}" for c in rsel]))


def range_join(points: DataFrame, intervals: DataFrame, point_col: str,
               lo_col: str, hi_col: str, bin_width: int) -> DataFrame:
    """Point-in-interval range join via bin blocking (north-star
    extension; no reference analog — the nearest thing is the pushed-down
    time-range filter, P:238-244, which is point-vs-constant).

    A naive ``points.join(intervals, point BETWEEN lo AND hi)`` has no
    equality key, so Spark plans BroadcastNestedLoopJoin — O(n·m) and
    driver-bound; it falls over long before 100 TB. Instead both sides are
    blocked onto an integer bin grid: each interval is exploded to every
    bin it covers (±1 bin of slack so floating-point ``floor`` can never
    drop an edge pair), each point lands in exactly one bin, and the join
    becomes a plain shuffled equi-join on ``_bin`` followed by the exact
    BETWEEN filter. Each qualifying (point, interval) pair is emitted
    exactly once because a point owns exactly one bin. Pick ``bin_width``
    near the typical interval length: cost is then O(points + intervals ·
    avg_span/bin_width) with ordinary hash-shuffle parallelism, and AQE
    handles residual bin skew.
    """
    pb = points.withColumn(
        "_bin", F.floor(F.col(point_col) / F.lit(bin_width)).cast("long"))
    ib = intervals.withColumn(
        "_bin", F.explode(F.sequence(
            F.floor(F.col(lo_col) / F.lit(bin_width)).cast("long") - 1,
            F.floor(F.col(hi_col) / F.lit(bin_width)).cast("long") + 1)))
    return (pb.join(ib, "_bin")
              .filter(F.col(point_col).between(F.col(lo_col), F.col(hi_col)))
              .drop("_bin"))


def time_rollup(df: DataFrame, ts_sec_col: str, value_col: str,
                grains: Sequence[tuple[int, str]] = (
                    (60, "minute"), (3600, "hour"), (86400, "day"))) -> DataFrame:
    """Hypertable-style multi-resolution rollup (north-star extension):
    one pass aggregates the raw stream at the finest grain; every coarser
    grain is re-aggregated FROM THE PREVIOUS LEVEL, never from the raw
    table. At 100 TB that is the difference between one full-scan shuffle
    plus tiny cascades (minute rows ≈ seconds/60 of the input) and
    len(grains) full scans — the same continuous-aggregate trick
    TimescaleDB/Druid use, expressed as plain Catalyst aggregates.

    Sums stay exact DECIMAL through every level (addition is associative
    in decimals, so cascaded totals are bit-identical to direct ones —
    this is what lets a single DuckDB oracle verify all levels) and are
    surfaced as DOUBLE only at the edge.

    Returns (grain, bucket_start, n_events, sum_value); ``grains`` must be
    ascending and each a multiple of the previous.
    """
    g0, label0 = grains[0]
    cur = (df.withColumn("_b", F.col(ts_sec_col) - F.col(ts_sec_col) % g0)
             .groupBy("_b")
             .agg(F.count(F.lit(1)).alias("_n"),
                  F.sum(F.col(value_col).cast("decimal(18,6)")).alias("_s"))
             # the persist barrier is LOAD-BEARING: each level feeds both
             # its own union branch and the next level; without it Spark
             # re-expands the whole cascade per branch and the raw table
             # is scanned once PER GRAIN (verified via FileScan count in
             # tests/test_plans_scale.py) — the exact failure mode this
             # operator exists to avoid at 100 TB
             .transform(tracked_persist))
    levels = [cur.select(F.lit(label0).alias("grain"),
                         F.col("_b").alias("bucket_start"),
                         F.col("_n").alias("n_events"),
                         F.col("_s").cast("double").alias("sum_value"))]
    for g, label in grains[1:]:
        cur = (cur.withColumn("_b", F.col("_b") - F.col("_b") % g)
                  .groupBy("_b")
                  .agg(F.sum("_n").alias("_n"), F.sum("_s").alias("_s"))
                  .transform(tracked_persist))
        levels.append(cur.select(F.lit(label).alias("grain"),
                                 F.col("_b").alias("bucket_start"),
                                 F.col("_n").alias("n_events"),
                                 F.col("_s").cast("double").alias("sum_value")))
    return reduce(lambda a, b: a.unionByName(b), levels)


def merge_upsert(target: DataFrame, updates: DataFrame, keys: Sequence[str],
                 seq_cols: Sequence[str]) -> DataFrame:
    """Latest-wins MERGE (Delta-style upsert without a table format):
    union the current snapshot with a batch of updates and keep, per
    ``keys``, the single row with the greatest ``seq_cols`` (compared
    lexicographically; make the last one a unique id so the winner is
    deterministic). New keys insert, existing keys update — the batch
    CDC-compaction shape.

    One shuffle on ``keys`` with a partial WindowGroupLimit below the
    exchange (same rank<=1 pushdown as top_k_per_group): each map
    partition forwards only its local winner per key, so the shuffle
    carries ~|keys| rows, not |target|+|updates|. At 100 TB this is the
    standard snapshot-compaction job; pair it with a partitioned sink to
    make the re-written snapshot (P:26-30's layout) queryable in place.
    """
    from pyspark.sql.window import Window

    merged = target.unionByName(updates)
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(
        *[F.col(c).desc() for c in seq_cols])
    return (merged.withColumn("_rn", F.row_number().over(w))
                  .filter(F.col("_rn") == 1).drop("_rn"))


def stratified_sample_hash(df: DataFrame, stratum_col: str, key_col: str,
                           rates: Mapping[str, float],
                           default_rate: float = 0.0,
                           denom: int = 1000) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff its md5-derived
    bucket (stable across engines, partitioning, and retries — the same
    primitive as op-sample-hash) falls under the stratum's rate. The
    LLM-corpus source-mixing shape: down-weight over-represented sources
    without a shuffle — this is a pure map-side filter, and unlike
    ``df.sampleBy`` the selection is reproducible row-identity sampling,
    so reruns and backfills pick the identical subset.
    """
    bucket = (F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 15),
                     16, 10).cast("long") % denom)
    rate = F.lit(float(default_rate))
    for s, r in sorted(rates.items()):
        rate = F.when(F.col(stratum_col) == s, F.lit(float(r))).otherwise(rate)
    # round-to-nearest, not truncate: 0.1*1000 is 99.999…/100.000…1 in
    # IEEE, and an external system computing CASE…THEN 100 must agree
    return df.filter(bucket < F.round(rate * denom).cast("long"))


def asof_join_nearest(left: DataFrame, right: DataFrame, on: Sequence[str],
                      left_ts: str, right_ts: str,
                      right_cols: Mapping[str, str],
                      dist_out: str = "asof_dist") -> DataFrame:
    """Nearest-event as-of join: for each left row, the right row whose
    timestamp is CLOSEST in either direction (equal distance — including
    the simultaneous case — resolves to the earlier/backward row).
    Completes the as-of family: backward = last-cause, forward =
    next-effect, nearest = closest-context attribution.

    Same single-exchange union+fill formulation as ``asof_join``, run in
    BOTH directions over one merged frame: the two window frames share
    the key exchange (different sort orders re-sort within partitions,
    no second shuffle), then a per-row distance compare picks the side.
    ``dist_out`` carries the winning |Δts| (NULL when no match at all).

    Right rows must be unique per (on, right_ts) — pre-aggregate the
    right side (as the catalog queries do) so tied-timestamp picks can't
    arise in either direction.
    """
    from pyspark.sql.window import Window

    tag = "_asof_side"
    lt = left.withColumn(tag, F.lit(1)).withColumn("_ts", F.col(left_ts))
    rcols = [F.col(c).alias(f"_r_{c}") for c in right_cols]
    rt = (right.select(*[F.col(k) for k in on], F.col(right_ts).alias("_ts"), *rcols)
               .withColumn(tag, F.lit(0)))
    merged = lt.unionByName(rt, allowMissingColumns=True)
    # backward: right rows sort BEFORE left at equal _ts (equal-ts right
    # row visible in the preceding frame); forward mirrors it
    wb = (Window.partitionBy(*on)
          .orderBy(F.col("_ts").asc(), F.col(tag).asc())
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wf = (Window.partitionBy(*on)
          .orderBy(F.col("_ts").asc(), F.col(tag).desc())
          .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    rts = F.when(F.col(tag) == 0, F.col("_ts"))
    bts = F.last(rts, ignorenulls=True).over(wb)
    fts = F.first(rts, ignorenulls=True).over(wf)
    bdist, fdist = F.col("_ts") - bts, fts - F.col("_ts")
    use_f = bts.isNull() | (fts.isNotNull() & (fdist < bdist))
    for c, out in right_cols.items():
        bval = F.last(F.col(f"_r_{c}"), ignorenulls=True).over(wb)
        fval = F.first(F.col(f"_r_{c}"), ignorenulls=True).over(wf)
        merged = merged.withColumn(out, F.when(use_f, fval).otherwise(bval))
    merged = merged.withColumn(dist_out, F.when(use_f, fdist).otherwise(bdist))
    return (merged.filter(F.col(tag) == 1)
            .drop(tag, "_ts", *[f"_r_{c}" for c in right_cols]))


def fuzzy_join(left: DataFrame, right: DataFrame,
               left_col: str, right_col: str,
               block_left: Column, block_right: Column,
               max_dist: int, dist_out: str = "edit_dist") -> DataFrame:
    """Blocked fuzzy (edit-distance) join: equi-join on a cheap blocking
    key, then Levenshtein-verify the string pair within the block.

    The classic entity-resolution shape (no reference analog — the
    reference joins only on exact keys): an UNBLOCKED fuzzy join is a
    cartesian product with a per-pair O(len²) distance — dead at any
    scale. Blocking turns it into an ordinary shuffled equi-join whose
    candidate set is  Σ_b |L_b|·|R_b|: pick a block function (last token,
    phonetic code, length bucket, …) coarse enough to catch true matches
    and fine enough to bound the per-block product. Recall is bounded by
    the blocker (pairs disagreeing on the block key are never compared) —
    that trade-off is the published blocking-based ER design, not a
    shortcut. Skewed hot blocks behave exactly like hot join keys: AQE
    skew-split or salt them (see salted_join).

    Levenshtein runs JVM-side (``F.levenshtein``) inside the join's
    post-filter, so the whole operator is one exchange + codegen verify —
    no Python, no UDF.
    """
    lt = left.withColumn("_blk", block_left)
    rt = right.withColumn("_blk", block_right)
    dist = F.levenshtein(F.col(f"l.{left_col}"), F.col(f"r.{right_col}"))
    return (lt.alias("l")
            .join(rt.alias("r"), F.col("l._blk") == F.col("r._blk"))
            .withColumn(dist_out, dist)
            .filter(F.col(dist_out) <= max_dist)
            .drop("_blk"))


def table_diff(old: DataFrame, new: DataFrame, keys: Sequence[str],
               compare_cols: Sequence[str]) -> DataFrame:
    """Snapshot diff of two versions of a table: one row per difference,
    labeled 'added' (key only in new), 'removed' (key only in old), or
    'changed' (key in both, any compare column differs — null-safe).

    The report-regression primitive that pairs with
    stats.table_checksum: the checksum says WHETHER two snapshots
    differ, this says WHERE. One full outer shuffled hash join on the
    key — both sides scan once, unchanged rows drop out in the join
    filter, so the output is difference-sized, not table-sized. At
    100 TB partition both snapshots the same way (or bucket by key) and
    the exchange is the only data movement; add a date/partition
    predicate to diff only the slice that could have changed.
    """
    oc = [F.col(c).alias(f"_o_{c}") for c in compare_cols]
    nc = [F.col(c).alias(f"_n_{c}") for c in compare_cols]
    o = old.select(*[F.col(k) for k in keys], *oc,
                   F.lit(1).alias("_in_old"))
    n = new.select(*[F.col(k) for k in keys], *nc,
                   F.lit(1).alias("_in_new"))
    j = o.join(n, list(keys), "full_outer")
    any_change = reduce(
        lambda a, b: a | b,
        [~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
         for c in compare_cols])
    change_type = (
        F.when(F.col("_in_old").isNull(), "added")
         .when(F.col("_in_new").isNull(), "removed")
         .when(any_change, "changed"))
    out_cols = [F.col(k) for k in keys] + [
        F.col(f"_{s}_{c}").alias(f"{s}_{c}")
        for c in compare_cols for s in ("o", "n")]
    return (j.withColumn("change_type", change_type)
             .filter(F.col("change_type").isNotNull())
             .select("change_type", *out_cols))


def skyline_2d(df: DataFrame, cost_col: str, benefit_col: str) -> DataFrame:
    """2-D skyline (Pareto frontier): rows not DOMINATED by any other —
    y dominates x when y.cost <= x.cost AND y.benefit >= x.benefit with
    at least one strict. The preference-query primitive ("cheapest for
    its size class") behind product/catalog shortlists.

    The naive formulation is a NOT EXISTS self-join — O(n²) and exactly
    what the DuckDB oracle runs to PROVE this rewrite. The distributed
    plan instead: (1) per-cost max benefit (one map-side-combinable
    aggregation — all same-cost domination resolves here), (2) a running
    max over the DISTINCT costs in ascending order (a single-reducer
    window, but over the grouped frame — |distinct costs| rows, not
    |rows|), (3) join back. A row survives iff it carries its cost
    group's max benefit AND that max strictly exceeds every cheaper
    group's best. Two shuffles total; the only unpartitioned sort sees
    the collapsed per-cost frame.

    Ties at the same (cost, benefit) all survive (neither dominates —
    no strict inequality), matching the NOT EXISTS semantics exactly.

    NULL contract: rows with a NULL cost or benefit are dropped up
    front. Under a raw NOT EXISTS such rows are vacuously undominated
    (NULL comparisons are never true) and would survive, but they carry
    no position in the preference order, so this operator excludes them
    EXPLICITLY — the paired oracle states the same `IS NOT NULL`
    predicate, keeping the divergence from the textbook formulation a
    documented choice rather than a silent join-drop.
    """
    from pyspark.sql.window import Window

    df = df.filter(F.col(cost_col).isNotNull()
                   & F.col(benefit_col).isNotNull())
    grp = (df.groupBy(F.col(cost_col).alias("_c"))
             .agg(F.max(benefit_col).alias("_gmax")))
    w = (Window.orderBy(F.col("_c").asc())
         .rowsBetween(Window.unboundedPreceding, -1))
    frontier = (grp.withColumn("_prev", F.max("_gmax").over(w))
                   .filter(F.col("_prev").isNull()
                           | (F.col("_gmax") > F.col("_prev")))
                   .select("_c", "_gmax"))
    # no broadcast hint: the frontier is usually tiny but is
    # data-dependent (worst case O(distinct costs)) — stats decide
    return (df.join(frontier,
                    (F.col(cost_col) == F.col("_c"))
                    & (F.col(benefit_col) == F.col("_gmax")))
              .drop("_c", "_gmax"))

def bloom_prefilter_semi_join(big: DataFrame, small: DataFrame,
                              big_key: str, small_key: str,
                              m_bits: int = 1 << 17, k: int = 3,
                              hash_fn: str = "xx") -> DataFrame:
    """Exact semi-join executed through a portable Bloom-filter
    prefilter: build a k-hash bitmap over the small side's keys, drop
    big-side rows map-side when any probe bit is absent, then finish
    with the exact semi-join over the (tiny) survivor set.

    This is the join-pruning pattern that matters at 100 TB: when the
    semi-join is selective, the expensive join machinery sees only
    matches + Bloom false positives instead of the whole fact table.
    Spark's built-in runtime Bloom pushdown (InjectRuntimeFilter) covers
    simple shuffle-join cases; this operator makes the filter EXPLICIT
    (own m/k dials, own bit-position hash) so it survives caches,
    checkpoints, and non-parquet sources, and so its false-positive rate
    is a queryable number ((1 - e^(-kn/m))^k) instead of an engine
    internal. Correctness never depends on the filter — false positives
    die in the final exact join, which is why the DuckDB oracle is the
    plain semi-join, and why the probe hash is a pure COST dial:
    ``hash_fn='xx'`` (default) derives the k positions from seeded
    xxhash64 — measured 6x cheaper per probe pass than md5 (0.28s vs
    1.68s over 600k rows, r11) since the probe is the operator's only
    per-fact-row CPU; ``hash_fn='md5'`` keeps bit positions
    reproducible OUTSIDE Spark for cross-engine bitmap exchange.

    Plan shape: the bitmap is m_bits/64 longs (ONE small aggregation,
    broadcast); each of the k probes is a BroadcastHashJoin LEFT SEMI
    with a bitwise residual — zero shuffle of the big side; only
    survivors reach the exact semi-join (broadcast as well, since
    ``small`` is small by contract).
    """
    from .dedup import md5_hash60

    if hash_fn == "xx":
        def positions(key_col: Column) -> list[Column]:
            # pmod, not abs-then-%: abs(Long.MIN_VALUE) is still
            # negative, so abs-% could emit a bit position outside
            # [0, m_bits) in a ~2^-64 corner — harmless to the exact
            # result (build and probe compute the identical
            # expression) but off the advertised FPR formula's domain
            return [F.pmod(F.xxhash64(F.lit(i), key_col),
                           F.lit(m_bits)) for i in range(k)]
    elif hash_fn == "md5":
        def positions(key_col: Column) -> list[Column]:
            return [md5_hash60(F.concat(F.lit(f"bf{i}:"),
                                        key_col.cast("string"))) % m_bits
                    for i in range(k)]
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}")

    # build side: distinct keys -> k (word, mask) rows -> OR per word
    sk = small.select(F.col(small_key).alias("_k")).distinct()
    rows = None
    for h in positions(F.col("_k")):
        part = (sk.select(h.alias("_h"))
                  .select(F.expr("_h DIV 64").alias("_w"),
                          F.expr("shiftleft(1L, cast(_h % 64 as int))")
                           .alias("_m")))
        rows = part if rows is None else rows.unionByName(part)
    bitmap = rows.groupBy("_w").agg(F.bit_or("_m").alias("_bits"))

    # the probe is CPU-shaped (k md5 hashes per row), so a small-file
    # scan that parquet splits into a few byte-sized partitions
    # serializes it onto a few cores — the parallel.fan_out case
    # (measured: sf0.1 lineitem = 3 partitions, 5.6s wall; the 10x
    # corpus in 28 splits ran FASTER at 3.6s). No-op on real clusters
    # where the fact table is thousands of splits.
    from ..parallel import fan_out
    probed = fan_out(big)
    for i, h in enumerate(positions(F.col(big_key))):
        probed = (probed
                  .withColumn(f"_ph{i}", h)
                  .withColumn(f"_pw{i}", F.expr(f"_ph{i} DIV 64"))
                  .withColumn(f"_pm{i}", F.expr(
                      f"shiftleft(1L, cast(_ph{i} % 64 as int))")))
    for i in range(k):
        bm = F.broadcast(bitmap
                         .withColumnRenamed("_w", f"_w{i}")
                         .withColumnRenamed("_bits", f"_bits{i}"))
        probed = probed.join(
            bm, (F.col(f"_pw{i}") == F.col(f"_w{i}"))
            & (F.col(f"_pm{i}").bitwiseAND(F.col(f"_bits{i}"))
               == F.col(f"_pm{i}")), "left_semi")
    survivors = probed.drop(*[c for i in range(k)
                              for c in (f"_ph{i}", f"_pw{i}", f"_pm{i}")])
    return survivors.join(F.broadcast(sk),
                          F.col(big_key) == F.col("_k"), "left_semi")

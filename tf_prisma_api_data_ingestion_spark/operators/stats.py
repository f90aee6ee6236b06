"""Grouped statistics operators: closed-form linear regression, robust
(median/MAD) outlier detection, and order-independent table fingerprints.

North-star extensions (no reference analog — the reference's pandas layer
stops at groupby-count, `P:243-252`); these are the next analytics asks a
pipeline team makes once grouped counts exist: trend per segment, anomaly
flags per segment, and a cheap way to prove two table copies are identical.

Determinism design (shared with catalog.py's oracle rules): every
accumulation happens over EXACT integer/decimal values (money in cents as
BIGINT, timestamps as integer seconds), and floating point enters only at
the output edge as single IEEE operations (one divide / one sqrt), which
are correctly rounded and therefore bit-identical across engines. This is
what makes the DuckDB differential check meaningful for statistics that
would otherwise hash-mismatch on float accumulation order.

Scale notes (100 TB posture):
- ``grouped_linreg`` is ONE map-side-combinable aggregation (six exact
  sums per group) — the textbook closed form, no second pass, no window.
- ``mad_outliers`` needs the group median joined back to rows, so it is
  two aggregations and one broadcast join (group cardinality is the
  number of segments, always tiny next to the fact table).
- ``table_checksum`` is a full scan reduced to one row via XOR/sum — the
  partial aggregation happens map-side per partition, so the shuffle
  carries one row per partition regardless of table size.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cents(col: Column) -> Column:
    """Exact integer cents from a 2-decimal double column.

    round() first: the double nearest 6.55*100 is 654.9999…, and a bare
    cast would truncate to 654 (and DuckDB's round-to-even cast would
    disagree on exact .5 — which round() removes).
    """
    return F.round(col * 100).cast("long")


def grouped_linreg(df: DataFrame, group_col: str, x_int: Column,
                   y_2dec: Column) -> DataFrame:
    """Per-group least-squares fit of y on x via the closed form, with all
    six sufficient statistics (n, Σx, Σy, Σx², Σxy, Σy²) accumulated as
    exact BIGINTs (y in cents), so the result is reproducible regardless
    of row order or partitioning — the property float-accumulating
    ``regr_slope`` style built-ins cannot give you.

    ``x_int`` must be an integer-valued expression (hour-of-day, epoch
    seconds, …); ``y_2dec`` a 2-decimal metric. Returns one row per group:
    n, slope, intercept, r2 (doubles, rounded to 6), computed as
    single-step IEEE ops over the exact sums:

        slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)
        r²    = (nΣxy − ΣxΣy)² / ((nΣx² − (Σx)²)(nΣy² − (Σy)²))

    The six SUMS accumulate in DECIMAL(38,0) — exact and overflow-free
    up to 1e38, still map-side combinable — because BIGINT sums of
    cents-squared terms pass 2^63 at a few hundred thousand $100k-scale
    rows (ANSI ArithmeticException on Spark 4, silent wrap elsewhere,
    and a DuckDB oracle error — divergence exactly where determinism is
    advertised). Each exact sum is then cast to DOUBLE once (correctly
    rounded in both engines: Java BigDecimal and DuckDB HUGEINT both
    round half-even) and the cross products are single IEEE ops, so the
    slope/intercept/r² hashes still match DuckDB bit-for-bit.
    """
    y = _cents(y_2dec)
    x = x_int.cast("long")
    # per-row products in decimal(18,0)x(18,0) -> decimal(37,0): exact
    # for |x|,|y| < 1e18, never a per-row long overflow either
    xd, yd = x.cast("decimal(18,0)"), y.cast("decimal(18,0)")
    agg = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xd).alias("_sx"),
        F.sum(yd).alias("_sy"),
        F.sum(xd * xd).alias("_sxx"),
        F.sum(xd * yd).alias("_sxy"),
        F.sum(yd * yd).alias("_syy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("_sx").cast("double"), F.col("_sy").cast("double")
    sxx = F.col("_sxx").cast("double")
    sxy = F.col("_sxy").cast("double")
    syy = F.col("_syy").cast("double")
    cov_n = n * sxy - sx * sy
    varx_n = n * sxx - sx * sx
    vary_n = n * syy - sy * sy
    # Degenerate-group guard: the n·Σ−Σ·Σ differences are computed in
    # DOUBLE, so a near-constant column (variance << mean²) can cancel
    # to a TINY NEGATIVE where the exact value is ~0, yielding a garbage
    # slope or a negative / >1 r². Groups with a non-positive variance
    # term get NULL (a fit on a constant axis is undefined), and r² is
    # capped at 1.0 against last-ulp overshoot — both mirrored verbatim
    # in the DuckDB oracle, so the guard itself is differential-tested.
    slope_cents = cov_n / varx_n                      # cents per x unit
    slope = F.when(varx_n > 0, slope_cents / 100.0)
    intercept = F.when(varx_n > 0,
                       (sy / 100.0 - slope_cents * sx / 100.0) / n)
    r2 = F.when((varx_n > 0) & (vary_n > 0),
                F.least((cov_n * cov_n) / (varx_n * vary_n), F.lit(1.0)))
    return agg.select(
        group_col, "n",
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
        F.round(r2, 6).alias("r2"),
    )


# Exact F.percentile buffers a whole group's values in one aggregation
# buffer — at or below this many rows per group that is the right
# trade (bit-stable medians, oracle-replayable); above it, one giant
# group is an executor-OOM risk and median_mode='auto' switches to
# the percentile_approx sketch (bounded memory, value drawn from the
# group rather than interpolated).
EXACT_MEDIAN_MAX_GROUP = 2_000_000


def _median_fn(median_mode: str, accuracy: int = 10_000):
    """The median aggregator behind the exact/approx dial shared by
    mad_outliers and similarity.embedding_outliers. 'approx' casts to
    double so both modes agree on output schema; with odd-sized
    groups the sketch returns the same element the exact path
    interpolates to, which is what the demo-scale equivalence test
    pins (tests/test_median_dial.py)."""
    if median_mode == "exact":
        return lambda c: F.percentile(c, F.lit(0.5))
    if median_mode == "approx":
        return lambda c: (F.percentile_approx(c, F.lit(0.5),
                                              F.lit(accuracy))
                          .cast("double"))
    raise ValueError(f"unknown median_mode {median_mode!r}")


def mad_outliers(df: DataFrame, group_col: str, y_2dec: Column,
                 k: float = 3.0, median_mode: str = "exact",
                 exact_max_group: int = EXACT_MEDIAN_MAX_GROUP
                 ) -> DataFrame:
    """Robust per-group outlier summary: median, MAD (median absolute
    deviation) and the count of rows with |y − median| > k·MAD.

    Everything runs on exact integer cents; the two medians are exact
    linear interpolations of integers (dyadic rationals — .0/.5 for the
    median, .25 steps for the MAD), so every comparison is exact double
    arithmetic and the outlier count is bit-stable across engines and
    partitionings. Contrast with z-scores on mean/stddev, where one hot
    row drags the threshold and float order changes the verdict.

    Plan shape: agg(median) → broadcast join back (group cardinality is
    tiny) → agg(MAD) → broadcast join → final agg. Three aggregations,
    each map-side combinable except the exact percentiles, which shuffle
    the group's values to one reducer — the documented exact-median
    trade-off, now size-gated: ``median_mode`` is 'exact' (the
    oracle-gated default), 'approx' (percentile_approx — bounded
    aggregation buffers, the 100 TB hygiene-pass setting), or 'auto'
    (one cheap group-size probe on the materialized rows picks exact
    at or below ``exact_max_group`` rows in the largest group —
    the dedup_clusters_auto idiom).
    """
    y = _cents(y_2dec).alias("_yc")
    rows = df.select(F.col(group_col), y)
    if median_mode == "auto":
        rows = rows.localCheckpoint(eager=False)
        top = (rows.groupBy(group_col).count()
               .agg(F.max("count")).first()[0]) or 0
        median_mode = "exact" if top <= exact_max_group else "approx"
    med_of = _median_fn(median_mode)
    med = rows.groupBy(group_col).agg(med_of("_yc").alias("_med"))
    dev = (rows.join(F.broadcast(med), group_col)
               .withColumn("_dev", F.abs(F.col("_yc") - F.col("_med"))))
    mad = dev.groupBy(group_col).agg(
        med_of("_dev").alias("_mad"),
        F.first("_med").alias("_med2"))
    flagged = (dev.join(F.broadcast(mad.select(group_col, "_mad")), group_col)
                  .groupBy(group_col)
                  .agg(F.sum(F.when(F.col("_dev") > F.lit(k) * F.col("_mad"),
                                    1).otherwise(0)).alias("n_outliers"),
                       F.count(F.lit(1)).alias("n")))
    return (flagged.join(F.broadcast(mad), group_col)
            .select(group_col, "n", "n_outliers",
                    F.round(F.col("_med2") / 100.0, 4).alias("median_value"),
                    F.round(F.col("_mad") / 100.0, 4).alias("mad_value")))


def table_checksum(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Order-independent fingerprint of a table: one row with the count
    and two commutative digests (XOR and modular sum) of a 60-bit hash of
    each row's canonical string form.

    The per-row hash is the first 15 hex chars of md5 over a '|'-joined
    rendering of ``cols`` (callers must pre-render floats to fixed
    decimals — see catalog.op-table-checksum — since raw float-to-string
    is engine-specific). XOR and sum-mod-2^32 are both commutative and
    associative, so the digest is independent of row order, partition
    count, and merge order — two copies of a table match iff (count, xor,
    sum) match, no sort needed. This is the standard cross-system
    migration-validation primitive (e.g. validating a 100 TB copy without
    shuffling either side).
    """
    canon = F.concat_ws("|", *[F.col(c).cast("string") for c in cols])
    h = F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast("long")
    # coalesce: over zero rows xor/sum aggregate to NULL — an empty
    # table's fingerprint is defined as (0, 0, 0) so two empty copies
    # compare equal instead of null-propagating.
    # sum_digest accumulates in DECIMAL(38,0) — a LONG sum of 32-bit
    # terms overflows past ~2^31 rows (ANSI exception; silent wrap
    # elsewhere), exactly the table sizes this validates. DECIMAL sum is
    # still commutative/associative; the mod-2^32 reduction happens once
    # AFTER the aggregate, so the digest fits a LONG and both engines
    # (DuckDB sums BIGINT into HUGEINT) reduce the identical exact sum.
    sum_dec = F.sum((h % F.lit(2 ** 32)).cast("decimal(38,0)"))
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.coalesce(F.bit_xor(h), F.lit(0)).alias("xor_digest"),
        F.coalesce((sum_dec % F.lit(2 ** 32)).cast("long"), F.lit(0))
         .alias("sum_digest"),
    )


def expect(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Data-quality expectation battery: evaluate named per-row boolean
    rules in ONE scan and return one row per rule with its violation
    count and pass flag — the constraint-validation primitive (deequ /
    dbt-test shape) a production ingest runs before publishing a
    partition.

    All rules aggregate in a single map-side-combinable pass (sum of
    failed-row indicators), then the wide 1-row result is unpivoted with
    ``stack`` — so a 100-rule battery over 100 TB costs exactly one scan
    and a one-row-per-partition shuffle, not one job per rule. NULL rule
    results count as violations (a rule that cannot evaluate did not
    pass — the conservative contract).
    """
    aggs = [F.count(F.lit(1)).alias("_n")]
    for name, rule in rules.items():
        # coalesce: sum over ZERO rows is NULL — an empty partition must
        # read as "0 violations, passed", not a null verdict
        aggs.append(F.coalesce(F.sum(F.when(rule, 0).otherwise(1)),
                               F.lit(0)).alias(f"_v_{name}"))
    wide = df.agg(*aggs)
    pairs = ", ".join(f"'{n}', _v_{n}" for n in rules)
    tall = wide.select(
        F.col("_n").alias("n_rows"),
        F.expr(f"stack({len(rules)}, {pairs}) AS (rule, n_violations)"))
    return tall.select(
        "rule", "n_rows", "n_violations",
        (F.col("n_violations") == 0).cast("long").alias("passed"))


def winsorized_mean(df: DataFrame, group_col: str, y_2dec: Column,
                    lo: float = 0.05, hi: float = 0.95) -> DataFrame:
    """Per-group winsorized mean: clamp values to the group's [lo, hi]
    exact percentiles, then average — the robust location estimate that
    keeps every row (unlike trimming) while capping tail influence.

    Exactness argument (why this hash-matches DuckDB): values are exact
    integer cents; the two percentile bounds are linear interpolations
    of integers (dyadic rationals, .25 steps at worst for quartile-like
    fractions); every clamped value is therefore an exact multiple of
    2^-2 well under 2^53, so the group sum is EXACT in double regardless
    of accumulation order — the mean is then a single IEEE division.
    Plan: one exact-percentile agg, tiny bounds broadcast back, one
    map-side-combinable sum. Same exact-median trade-off as mad_outliers:
    the percentile shuffles each group's values to one reducer; swap in
    percentile_approx for huge groups at 100 TB.
    """
    y = _cents(y_2dec).alias("_yc")
    rows = df.select(F.col(group_col), y)
    bounds = rows.groupBy(group_col).agg(
        F.percentile("_yc", F.lit(lo)).alias("_plo"),
        F.percentile("_yc", F.lit(hi)).alias("_phi"))
    clamped = (rows.join(F.broadcast(bounds), group_col)
               .withColumn("_cl", F.least(F.greatest(F.col("_yc"),
                                                     F.col("_plo")),
                                          F.col("_phi"))))
    return (clamped.groupBy(group_col)
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("_cl").alias("_s"),
                 F.min("_plo").alias("_plo"),
                 F.min("_phi").alias("_phi"))
            .select(group_col, "n",
                    F.round(F.col("_plo") / 100.0, 4).alias("p_lo"),
                    F.round(F.col("_phi") / 100.0, 4).alias("p_hi"),
                    F.round((F.col("_s") / F.col("n")) / 100.0, 4)
                     .alias("win_mean")))


def benford_profile(df: DataFrame, amount_2dec) -> DataFrame:
    """First-significant-digit distribution of a positive money column
    against Benford's law — the classic fraud / synthetic-data smoke
    test (real transactional amounts follow log10(1+1/d); generated or
    tampered ones usually don't).

    Determinism: the digit is extracted from the STRING of the exact
    BIGINT cents value (integer-to-string renders identically in every
    engine; a double-to-string rendering would not), and the expected
    shares are hardcoded literals — no log10 at query time, whose last
    ulp is libm-specific. One map-side-combinable 9-row aggregation.

    Returns (digit, n, obs_r, exp_r, dev_r) — observed vs expected share
    and the signed deviation, all rounded at the edge.
    """
    cents = _cents(amount_2dec)
    digit = F.substring(cents.cast("string"), 1, 1).cast("long")
    per = (df.filter(amount_2dec > 0)
             .select(digit.alias("digit"))
             .groupBy("digit").agg(F.count(F.lit(1)).alias("n")))
    tot = per.agg(F.sum("n").alias("_t"))
    # log10(1 + 1/d) to 6 places, as literals (same constants both engines)
    exp = (F.when(F.col("digit") == 1, 0.301030)
            .when(F.col("digit") == 2, 0.176091)
            .when(F.col("digit") == 3, 0.124939)
            .when(F.col("digit") == 4, 0.096910)
            .when(F.col("digit") == 5, 0.079181)
            .when(F.col("digit") == 6, 0.066947)
            .when(F.col("digit") == 7, 0.057992)
            .when(F.col("digit") == 8, 0.051153)
            .otherwise(0.045757))
    obs = F.col("n").cast("double") / F.col("_t").cast("double")
    return (per.crossJoin(F.broadcast(tot))
               .select("digit", "n",
                       F.round(obs, 6).alias("obs_r"),
                       exp.alias("exp_r"),
                       F.round(obs - exp, 6).alias("dev_r")))


def key_profile(df: DataFrame, key_col: str) -> DataFrame:
    """Join-key skew profile: the one-row diagnostic to read BEFORE
    picking a join strategy at 100 TB — distinct keys, rows, the heaviest
    key's share, quartile/tail per-key counts, and the max/mean skew
    ratio that decides between a plain shuffle join, AQE skew split, and
    explicit salting (operators/relational.py salted_join).

    Two aggregations: per-key counts (map-side-combinable), then a
    single-row reduction over the (distinct-key-sized) count frame.
    Percentiles interpolate over exact integer counts — at most one
    binary fraction of precision, recovered exactly by round(4) in both
    engines (same argument as catalog op-percentiles).
    """
    per = df.groupBy(F.col(key_col)).agg(F.count(F.lit(1)).alias("_c"))
    pct = F.percentile("_c", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)))
    return per.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("_c").alias("n_rows"),
        F.max("_c").alias("max_cnt"),
        pct.alias("_p"),
    ).select(
        "n_keys", "n_rows", "max_cnt",
        F.round(F.element_at("_p", 1), 4).alias("p50_cnt"),
        F.round(F.element_at("_p", 2), 4).alias("p90_cnt"),
        F.round(F.element_at("_p", 3), 4).alias("p99_cnt"),
        F.round(F.col("max_cnt").cast("double")
                / (F.col("n_rows").cast("double")
                   / F.col("n_keys").cast("double")), 4).alias("skew_ratio"),
        F.round(F.col("max_cnt").cast("double")
                / F.col("n_rows").cast("double"), 6).alias("top_share"))


def grouped_linreg2(df: DataFrame, group_col: str, x1_int: Column,
                    x2_int: Column, y_2dec: Column) -> DataFrame:
    """Per-group TWO-feature least squares (y on x1, x2) via the closed
    2x2 normal equations over exact sufficient statistics — the
    multivariate extension of ``grouped_linreg`` (same determinism
    contract, same single-aggregation scale posture).

    One map-side-combinable aggregation accumulates the ten exact sums
    (n, Σx1, Σx2, Σy, Σx1², Σx2², Σx1x2, Σx1y, Σx2y, Σy²) in
    DECIMAL(38,0); each is cast to DOUBLE once, and the centered Gram
    entries / solution are plain IEEE ops in a FIXED order mirrored
    verbatim in the DuckDB oracle:

        A11 = nΣx1² − (Σx1)²   A12 = nΣx1x2 − Σx1Σx2
        A22 = nΣx2² − (Σx2)²   C1  = nΣx1y − Σx1Σy   C2 = nΣx2y − Σx2Σy
        det = A11·A22 − A12²
        b1  = (C1·A22 − C2·A12)/det      b2 = (C2·A11 − C1·A12)/det
        b0  = (Σy − b1Σx1 − b2Σx2)/n
        R²  = (b1·C1 + b2·C2)/Vy,  Vy = nΣy² − (Σy)²

    Degenerate guard (same philosophy as grouped_linreg): collinear or
    constant features make the Gram determinant cancel to ≤ 0 in double
    — those groups get NULL coefficients (the fit is not identifiable),
    and R² is clamped to [0, 1] against last-ulp overshoot. Groups need
    n ≥ 3 (two slopes + intercept) — smaller groups are NULL too.
    """
    y = _cents(y_2dec)
    x1 = x1_int.cast("long").cast("decimal(18,0)")
    x2 = x2_int.cast("long").cast("decimal(18,0)")
    yd = y.cast("decimal(18,0)")
    agg = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x1).alias("_s1"), F.sum(x2).alias("_s2"),
        F.sum(yd).alias("_sy"),
        F.sum(x1 * x1).alias("_s11"), F.sum(x2 * x2).alias("_s22"),
        F.sum(x1 * x2).alias("_s12"),
        F.sum(x1 * yd).alias("_s1y"), F.sum(x2 * yd).alias("_s2y"),
        F.sum(yd * yd).alias("_syy"),
    )
    n = F.col("n").cast("double")
    s1, s2 = F.col("_s1").cast("double"), F.col("_s2").cast("double")
    sy = F.col("_sy").cast("double")
    s11, s22 = F.col("_s11").cast("double"), F.col("_s22").cast("double")
    s12 = F.col("_s12").cast("double")
    s1y, s2y = F.col("_s1y").cast("double"), F.col("_s2y").cast("double")
    syy = F.col("_syy").cast("double")
    a11 = n * s11 - s1 * s1
    a12 = n * s12 - s1 * s2
    a22 = n * s22 - s2 * s2
    c1 = n * s1y - s1 * sy
    c2 = n * s2y - s2 * sy
    vy = n * syy - sy * sy
    det = a11 * a22 - a12 * a12
    ok = (F.col("n") >= 3) & (det > 0)
    b1c = (c1 * a22 - c2 * a12) / det          # cents per x1 unit
    b2c = (c2 * a11 - c1 * a12) / det          # cents per x2 unit
    b1 = F.when(ok, b1c / 100.0)
    b2 = F.when(ok, b2c / 100.0)
    b0 = F.when(ok, (sy / 100.0 - b1c * s1 / 100.0
                     - b2c * s2 / 100.0) / n)
    r2 = F.when(ok & (vy > 0),
                F.greatest(F.least((b1c * c1 + b2c * c2) / vy,
                                   F.lit(1.0)), F.lit(0.0)))
    return agg.select(
        F.col(group_col), "n",
        F.round(b1, 6).alias("b1"),
        F.round(b2, 6).alias("b2"),
        F.round(b0, 6).alias("intercept"),
        F.round(r2, 6).alias("r2"),
    )


def k_anonymity_audit(df: DataFrame, quasi_cols: Sequence[str],
                      k: int = 5,
                      sensitive_col: str | None = None) -> DataFrame:
    """k-anonymity (and optional l-diversity) audit over a set of
    quasi-identifier columns — the privacy gate run before a tabular
    extract joins a training corpus: every equivalence class (unique
    quasi-identifier combination) should contain at least k rows, or the
    rows in it are re-identifiable by joining public attributes. With
    ``sensitive_col``, also reports the worst-class l-diversity (min
    distinct sensitive values per class): a k-anonymous class whose
    sensitive value is constant still leaks it.

    Returns ONE row: (k, n_rows, n_classes, min_class_size,
    n_violating_classes, n_violating_rows[, min_l]) — the summary a
    release checklist consumes; the violating classes themselves are
    recoverable by re-grouping with HAVING count < k.

    Scale shape: one hash aggregation on the quasi-identifier tuple
    (map-side combinable; class count is the output cardinality) and a
    1-row reduce over it. l-diversity adds a distinct-count inside the
    same first aggregation — no extra pass. Entirely exact integers.
    """
    aggs = [F.count(F.lit(1)).alias("_n")]
    if sensitive_col is not None:
        aggs.append(F.countDistinct(F.col(sensitive_col)).alias("_l"))
    cls = df.groupBy(*[F.col(c) for c in quasi_cols]).agg(*aggs)
    out = [
        F.lit(k).cast("long").alias("k"),
        F.sum("_n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.min("_n").cast("long").alias("min_class_size"),
        F.sum(F.when(F.col("_n") < k, 1).otherwise(0))
         .cast("long").alias("n_violating_classes"),
        F.sum(F.when(F.col("_n") < k, F.col("_n")).otherwise(0))
         .cast("long").alias("n_violating_rows"),
    ]
    if sensitive_col is not None:
        out.append(F.min("_l").cast("long").alias("min_l"))
    return cls.agg(*out)


def corr_matrix(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Pairwise Pearson correlations over 2-decimal numeric columns in
    ONE aggregation pass — the column-profiling companion to
    grouped_linreg (same exact-sufficient-stats policy: every Σx, Σx²,
    Σxy accumulates integer cents in DECIMAL(38,0), so the statistics
    are partition-order independent; the single sqrt at the edge is
    IEEE-deterministic on identical integers in both engines, and the
    result rounds to 6dp like linreg's r²). Degenerate pairs (either
    variance <= 0) yield NULL, not a division blow-up.

    Scale shape: one map-side-combinable global aggregate computing all
    |cols| + C(|cols|, 2) sums in a single scan — never a pass per
    pair; output is the upper triangle, C(|cols|, 2) rows via a literal
    values frame. Returns (col_a, col_b, n, corr6).
    """
    if len(cols) < 2:
        # with < 2 columns there are zero pairs; the explode would be
        # built over an empty NullType array and fail at analysis time
        # with an opaque field-access error instead of this message
        raise ValueError("corr_matrix needs >= 2 cols, got "
                         f"{list(cols)!r}")
    cents = {c: _cents(F.col(c)).cast("decimal(38,0)") for c in cols}
    aggs = [F.count(F.lit(1)).cast("decimal(38,0)").alias("_n")]
    for c in cols:
        aggs.append(F.sum(cents[c]).alias(f"_s_{c}"))
        aggs.append(F.sum(cents[c] * cents[c]).alias(f"_q_{c}"))
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1:]]
    for a, b in pairs:
        aggs.append(F.sum(cents[a] * cents[b]).alias(f"_x_{a}_{b}"))
    g = df.agg(*aggs)
    # one explode over the 1-row aggregate: a union-of-selects here
    # would re-execute the whole scan once PER PAIR
    entries = []
    for a, b in pairs:
        num = F.col("_n") * F.col(f"_x_{a}_{b}") \
            - F.col(f"_s_{a}") * F.col(f"_s_{b}")
        va = F.col("_n") * F.col(f"_q_{a}") - F.col(f"_s_{a}") * F.col(f"_s_{a}")
        vb = F.col("_n") * F.col(f"_q_{b}") - F.col(f"_s_{b}") * F.col(f"_s_{b}")
        corr = F.when((va > 0) & (vb > 0),
                      F.round(num.cast("double")
                              / F.sqrt(va.cast("double") * vb.cast("double")),
                              6))
        entries.append(F.struct(F.lit(a).alias("col_a"),
                                F.lit(b).alias("col_b"),
                                corr.alias("corr6")))
    return (g.select(F.col("_n").cast("long").alias("n"),
                     F.explode(F.array(*entries)).alias("_e"))
             .select("_e.col_a", "_e.col_b", "n", "_e.corr6"))


# Poisson(1) CDF at k = 0..8 in exact ppm — the shared literal table
# behind poisson_bootstrap_ci (weight = how many thresholds the row's
# md5 ppm bucket clears; k >= 9 truncates at ~1e-6 total mass). Baked
# as integers so the Spark expression and the DuckDB twin compare the
# SAME constants — no per-engine exp()/factorial float boundary.
POISSON1_CDF_PPM = (367879, 735759, 919699, 981012, 996340,
                    999406, 999917, 999990, 999999)


def poisson_bootstrap_ci(df: DataFrame, value_col: str, id_col: str,
                         replicas: int = 64,
                         salt: str = "boot") -> DataFrame:
    """Bootstrap confidence interval for the mean of a 2-decimal metric
    via the DETERMINISTIC Poisson bootstrap — the resampling scheme that
    actually works on a shuffle engine: classical bootstrap needs a
    global multinomial draw (one shared counter per resample, a driver
    bottleneck), while the Poisson approximation gives every row an
    independent Poisson(1) replication count per replica, exact in
    expectation and standard practice for massive datasets precisely
    because it is embarrassingly parallel.

    Determinism contract: row r's weight in replica b is read off the
    md5 ppm bucket of (salt, b, id) against the literal Poisson(1) CDF
    table above — reruns, retries, partitionings, and ENGINES all deal
    identical resamples, so the DuckDB twin replays the whole
    procedure bit-for-bit (no RNG state anywhere). ``salt``
    decorrelates independent bootstrap runs, same contract as
    selection.train_val_test_split.

    Exactness: values quantize once to cents (stats._cents); each
    replica mean is the half-up integer micro ratio of DECIMAL(38,0)
    sums; the CI bounds are ORDER STATISTICS of the replica means
    (indices floor(0.025B)+1 / ceil(0.975B) of the sorted array, the
    conventional percentile bootstrap) — no float quantile
    interpolation to diverge between engines.

    Scale shape: ONE scan — each row fans out to ``replicas`` + 1
    lightweight (replica, weight, cents) tuples IN the projection
    (replica -1 is the identity weight-1 pass for the point estimate),
    feeding a map-side-combinable aggregation with ``replicas`` + 1
    output groups; the order-statistic step sorts a B-element array on
    one row. No shuffle wider than B+1 groups, no driver loop, no RNG.
    Returns one row: (n_rows, mean_micro, ci_lo_micro, ci_hi_micro,
    n_replicas).
    """
    cents = _cents(F.col(value_col)).cast("decimal(38,0)")
    bucket = (F.conv(F.substring(F.md5(F.concat_ws(
        ",", F.lit(salt), F.col("_b").cast("string"),
        F.col(id_col).cast("string"))), 1, 15), 16, 10).cast("long")
        % 1_000_000)
    w = F.lit(0)
    for t in POISSON1_CDF_PPM:
        w = w + F.when(F.col("_bkt") >= t, 1).otherwise(0)
    rep = (df.select(cents.alias("_c"), F.col(id_col).alias(id_col),
                     F.explode(F.sequence(
                         F.lit(-1), F.lit(replicas - 1))).alias("_b"))
             .withColumn("_bkt", bucket)
             .withColumn("_w", F.when(F.col("_b") == -1, F.lit(1))
                               .otherwise(w).cast("decimal(38,0)")))
    agg = (rep.groupBy("_b")
              .agg(F.sum(F.col("_w") * F.col("_c")).alias("_s"),
                   F.sum("_w").alias("_n"),
                   F.count(F.lit(1)).cast("long").alias("_rows")))
    mean_micro = F.expr(
        "CASE WHEN _n = 0 THEN NULL ELSE CAST(CASE WHEN _s >= 0 "
        "THEN (2 * _s * 10000 + _n) DIV (2 * _n) "
        "ELSE -((2 * -_s * 10000 + _n) DIV (2 * _n)) END AS BIGINT) END")
    per = agg.select("_b", mean_micro.alias("_mm"), "_rows")
    lo_i = int(0.025 * replicas) + 1          # 1-based order statistics
    hi_i = -(-975 * replicas // 1000)         # ceil(0.975 * B)
    return (per.groupBy()
               .agg(F.max(F.when(F.col("_b") == -1, F.col("_rows")))
                     .alias("n_rows"),
                    F.max(F.when(F.col("_b") == -1, F.col("_mm")))
                     .alias("mean_micro"),
                    F.array_sort(F.collect_list(
                        F.when(F.col("_b") >= 0, F.col("_mm"))))
                     .alias("_ms"))
               .select("n_rows", "mean_micro",
                       F.element_at("_ms", lo_i).alias("ci_lo_micro"),
                       F.element_at("_ms", hi_i).alias("ci_hi_micro"),
                       F.lit(replicas).cast("long").alias("n_replicas")))

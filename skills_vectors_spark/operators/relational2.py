"""Second relational wave: as-of join, pivot/unpivot, percentiles,
grouped-map pandas op, vector-literal round trip (SURVEY §2.B
completions).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from skills_vectors_spark import sources
from skills_vectors_spark.registry import register


@register(
    "join_asof",
    """
    WITH purchases AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
      WHERE event_type = 'purchase'
    ), views AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id FROM events
      WHERE event_type = 'view'
    ), ranked AS (
      SELECT p.event_id, p.user_id, v.ts AS view_ts, v.event_id AS view_event_id,
             row_number() OVER (PARTITION BY p.event_id
                                ORDER BY v.ts DESC, v.event_id DESC) AS rn
      FROM purchases p JOIN views v
        ON v.user_id = p.user_id AND v.ts <= p.ts
    )
    SELECT p.event_id, p.user_id, r.view_event_id,
           CAST(date_diff('second', r.view_ts, p.ts) AS BIGINT) AS secs_since_view
    FROM purchases p LEFT JOIN (SELECT * FROM ranked WHERE rn = 1) r
      ON r.event_id = p.event_id
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join — for each purchase, the most recent prior view by
    the same user. Spark has no native ASOF JOIN (DuckDB does; the
    oracle uses the window formulation for identical tie-breaks):
    implemented with the union-and-carry-forward pattern — ONE sort
    per user instead of a per-row backward scan, which is the
    partition-friendly shape at 100 TB (sort within user_id
    partitions; no range join blow-up)."""
    ev = sources.load(spark, sf_dir, "events")
    tagged = ev.filter(F.col("event_type").isin("purchase", "view")).select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
    )
    # carry the latest view (ts, event_id) forward within each user's
    # timeline; ties on ts resolved by event_id so the carried view is
    # deterministic and matches the oracle's ORDER BY ts DESC, id DESC
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    view_struct = F.when(
        F.col("event_type") == "view", F.struct(F.col("ts").alias("ts"), F.col("event_id").alias("id"))
    )
    carried = tagged.withColumn("last_view", F.last(view_struct, ignorenulls=True).over(w))
    out = carried.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.col("last_view.id").alias("view_event_id"),
        (F.unix_timestamp("ts") - F.unix_timestamp("last_view.ts")).alias("secs_since_view"),
    )
    return out


_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]


@register(
    "agg_pivot",
    f"""
    SELECT c_nationkey,
           {", ".join(f"round(coalesce(sum(CASE WHEN c_mktsegment = '{s}' THEN c_acctbal END), 0) * 100) / 100 AS {s.lower()}" for s in _SEGMENTS)}
    FROM customer GROUP BY c_nationkey
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-to-wide pivot with an explicit, sorted value list (the
    reference's wide report A19; explicit values keep column order
    deterministic AND skip the extra distinct-values job Spark runs
    when the list is omitted — at scale that job is a full shuffle)."""
    c = sources.load(spark, sf_dir, "customer")
    wide = (
        c.groupBy("c_nationkey")
        .pivot("c_mktsegment", _SEGMENTS)
        .agg(F.sum("c_acctbal"))
    )
    return wide.select(
        "c_nationkey",
        *[
            (F.round(F.coalesce(F.col(s), F.lit(0.0)) * 100) / 100).alias(s.lower())
            for s in _SEGMENTS
        ],
    )


@register(
    "agg_unpivot",
    """
    SELECT o_orderkey, metric, round(val * 100) / 100 AS val
    FROM (
      SELECT o_orderkey, 'totalprice' AS metric, o_totalprice AS val FROM orders
      UNION ALL
      SELECT o_orderkey, 'custkey', CAST(o_custkey AS DOUBLE) FROM orders
    )
    """,
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long unpivot (melt) via the native unpivot API —
    narrow transform, no shuffle."""
    o = sources.load(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", F.col("o_totalprice"), F.col("o_custkey").cast("double"))
        .unpivot(
            "o_orderkey",
            [F.col("o_totalprice").alias("totalprice"), F.col("o_custkey").alias("custkey")],
            "metric",
            "raw",
        )
        .select("o_orderkey", "metric", (F.round(F.col("raw") * 100) / 100).alias("val"))
    )


# log-bucket resolution for the two-pass exact quantile: buckets have
# RELATIVE width gamma-1 (DDSketch-style, Masson et al. 2019), so the
# bucket index needs no min/max pre-pass — floor(ln|v|/ln(gamma)) is a
# fixed monotone mapping any executor computes locally. ln(1.002)
# ~= 0.002 -> ~500 buckets per decade of value range; driver state is
# occupied buckets only.
PCTL_GAMMA_LN = math.log(1.002)
# sign-partitioned encoding keeping the index monotone across
# negatives/zero/positives: |log index| < 2^20 for any finite double,
# so +/-2^21 separates the three ranges
PCTL_SIGN_OFFSET = 1 << 21
# the final pick pass materializes the still-needed regions' rows;
# refinement levels (below) keep splitting regions until the total
# fits under this, so the driver/executor collect stays bounded
PCTL_MAX_PICK_ROWS = 5_000_000
# each refinement level splits an over-full region into this many
# equal-width sub-ranges of its measured [lo, hi] — one extra codegen
# scan narrows the candidate rows by up to 4096x
PCTL_NSUB = 4096
# ~6 levels take a region's width below one ulp of any double (then
# every sub-range is single-valued and resolves for free), so hitting
# this bound means arithmetic is broken, not the data
PCTL_MAX_REFINE_LEVELS = 8


def _pctl_resolve_zero_width(regions, kval):
    """Resolve un-splittable regions before a refinement scan: lo ==
    hi (single-valued — every row carries that one value) or a
    sub-range width (hi - lo) / PCTL_NSUB that underflows to 0.0
    (lo, hi within a few sub-subnormal ulps), where the sub-index
    expression floor((v - lo) / 0.0) would evaluate NaN and the split
    would depend on Spark's incidental NaN-floor behavior. Picks of
    such a region all resolve to lo without a scan (for the underflow
    case lo and hi differ by < PCTL_NSUB ulps of 0 — far below any
    output rounding). Returns the still-splittable regions."""
    out = []
    for g, b, pred, cnt, lo, hi, picks in regions:
        if lo == hi or (hi - lo) / PCTL_NSUB == 0.0:
            for k, _off in picks:
                kval[g][k] = lo
        else:
            out.append((g, b, pred, cnt, lo, hi, picks))
    return out


def _pctl_bucket_expr() -> F.Column:
    """Sign-partitioned DDSketch bucket index of column ``v``: a fixed
    monotone value->long mapping (no min/max pre-pass), computable
    locally on any executor. Negatives mirror below -2^21, zero maps
    to 0, positives sit above +2^21."""
    pos = F.lit(PCTL_SIGN_OFFSET) + F.floor(F.log(F.col("v")) / F.lit(PCTL_GAMMA_LN))
    neg = F.lit(-PCTL_SIGN_OFFSET) - F.floor(F.log(-F.col("v")) / F.lit(PCTL_GAMMA_LN))
    return (
        F.when(F.col("v") > 0, pos)
        .when(F.col("v") < 0, neg)
        .otherwise(F.lit(0))
        .cast("long")
    )


def exact_group_quantiles(gv, qs, return_frags=False):
    """Exact interpolated per-group quantiles of a (g, v) frame via
    the two-pass log-bucket machinery (full design rationale in
    agg_percentile's docstring): one map-side-combinable (g, bucket)
    histogram over the fixed DDSketch index, a driver walk that
    resolves single-valued buckets for free, a bounded pick pass over
    only the needed buckets, and equal-width refinement levels if a
    bucket packs. Returns {group: (value per q, in qs order)}.
    Shared by agg_percentile and agg_winsorized_mean (clip bounds) —
    never an ObjectHashAggregate percentile buffer, so no pass ever
    shuffles the raw value column.

    With ``return_frags=True`` returns ``(quantiles, frags)`` where
    frags — when available — is {group: [(cnt, lo, hi, sum, vals)]}:
    one fragment per occupied bucket carrying its exact count / value
    hull / value SUM, plus the bucket's full sorted value list for
    every bucket the pick pass collected (vals is None elsewhere).
    This is everything a consumer needs to finish a clipped/trimmed
    aggregate DRIVER-side without a third fact scan: any bucket not
    straddling a clip bound resolves from (cnt, hull, sum) alone, and
    a straddling bucket always holds an unresolved order statistic —
    the bound interpolates between order stats that live in it — so
    its rows are exactly the ones the pick pass already collected.
    frags comes back None (consumer falls back to its own scan) on
    the pathological paths where fragment sums stop being exact:
    refinement levels engaged, or a sub-ulp-width region resolved
    without a scan."""
    li = gv
    lib = li.withColumn("b", _pctl_bucket_expr())

    hist: dict[str, dict[int, tuple[int, float, float, float]]] = {}
    for r in (
        lib.groupBy("g", "b")
        .agg(
            F.count("*").alias("cnt"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
            F.sum("v").alias("sm"),
        )
        .collect()
    ):
        hist.setdefault(r["g"], {})[r["b"]] = (
            r["cnt"],
            float(r["lo"]),
            float(r["hi"]),
            float(r["sm"]),
        )
    # fragment exactness: refinement / zero-width shortcuts replace
    # whole-bucket collections with partial ones, so frags go None
    frag_exact = True
    vals_by_gb: dict[tuple, list] = {}

    # needed 0-based order-statistic indices per group: floor(h) and
    # floor(h)+1 (clamped) for each quantile's virtual index h
    need: dict[str, dict[float, tuple[int, int, float]]] = {}
    kval: dict[str, dict[int, float]] = {}
    sel: dict[tuple[str, int], list[tuple[int, int]]] = {}  # (g,b) -> [(k, off)]
    for g, buckets in hist.items():
        n = sum(c for c, *_ in buckets.values())
        need[g] = {}
        kval[g] = {}
        for q in qs:
            h = q * (n - 1)
            k = int(math.floor(h))
            need[g][q] = (k, min(k + 1, n - 1), h - k)
        ks = sorted({k for pair in need[g].values() for k in pair[:2]})
        cum, i = 0, 0
        for b in sorted(buckets):
            cnt, lo, hi, _sm = buckets[b]
            while i < len(ks) and ks[i] < cum + cnt:
                if lo == hi:  # single-valued bucket: resolved for free
                    kval[g][ks[i]] = lo
                else:
                    sel.setdefault((g, b), []).append((ks[i], ks[i] - cum))
                i += 1
            cum += cnt

    if sel:
        # region = one driver-tracked value subrange of a group that
        # still holds unresolved order statistics: (group, bucket b,
        # row predicate, row count, lo, hi, [(k, offset-in-region)]).
        # Level 0 regions are whole log buckets; each refinement level
        # splits over-full regions into PCTL_NSUB equal-width
        # sub-ranges of their measured [lo, hi] with ONE extra codegen
        # scan, resolving sub-ranges that come back single-valued for
        # free — duplicate-packed distributions (the pathological case
        # for relative-width buckets) collapse at the first level
        # because their packed sub-range has min == max.
        regions: list[tuple[str, int, F.Column, int, float, float, list[tuple[int, int]]]] = [
            (
                g,
                b,
                (F.col("g") == g) & (F.col("b") == b),
                hist[g][b][0],
                hist[g][b][1],
                hist[g][b][2],
                picks,
            )
            for (g, b), picks in sorted(sel.items())
        ]
        if any(
            lo != hi and (hi - lo) / PCTL_NSUB == 0.0
            for _, _, _, _, lo, hi, _ in regions
        ):
            frag_exact = False  # sub-ulp region resolves without a scan
        regions = _pctl_resolve_zero_width(regions, kval)
        level = 0
        while regions and sum(r[3] for r in regions) > PCTL_MAX_PICK_ROWS:
            frag_exact = False  # refinement splits buckets into sub-scans
            if level >= PCTL_MAX_REFINE_LEVELS:
                raise ValueError(
                    f"agg_percentile: {sum(r[3] for r in regions)} rows still "
                    f"needed after {level} refinement levels (> "
                    f"{PCTL_MAX_PICK_ROWS}) — sub-ulp region widths should "
                    "have resolved; refusing to collect unbounded state"
                )
            level += 1
            # one scan for ALL over-full regions: chained CASE columns
            # assign each matching row its region id and equal-width
            # sub-index; the same sub expression later reappears in the
            # child predicate, so both sides of the split use identical
            # JVM double arithmetic
            sub_exprs: list[F.Column] = []
            rid_col, sub_col, pred_total = None, None, None
            for i, (g, b, pred, cnt, lo, hi, picks) in enumerate(regions):
                width = (hi - lo) / PCTL_NSUB
                e = F.least(
                    F.floor((F.col("v") - F.lit(lo)) / F.lit(width)),
                    F.lit(PCTL_NSUB - 1),
                ).cast("long")
                sub_exprs.append(e)
                rid_col = F.when(pred, i) if rid_col is None else rid_col.when(pred, i)
                sub_col = F.when(pred, e) if sub_col is None else sub_col.when(pred, e)
                pred_total = pred if pred_total is None else pred_total | pred
            by_rid: dict[int, dict[int, tuple[int, float, float]]] = {}
            for r in (
                lib.filter(F.col("b").isin(sorted({b for _, b, *_ in regions})) & pred_total)
                .select(rid_col.alias("rid"), sub_col.alias("s"), "v")
                .groupBy("rid", "s")
                .agg(F.count("*").alias("cnt"), F.min("v").alias("lo"), F.max("v").alias("hi"))
                .collect()
            ):
                by_rid.setdefault(r["rid"], {})[r["s"]] = (
                    r["cnt"],
                    float(r["lo"]),
                    float(r["hi"]),
                )
            nxt: list[tuple[str, int, F.Column, int, float, float, list[tuple[int, int]]]] = []
            for i, (g, b, pred, cnt, lo, hi, picks) in enumerate(regions):
                subs = by_rid.get(i, {})
                todo = sorted(picks, key=lambda t: t[1])
                cum, j = 0, 0
                for s in sorted(subs):
                    scnt, slo, shi = subs[s]
                    child: list[tuple[int, int]] = []
                    while j < len(todo) and todo[j][1] < cum + scnt:
                        k, off = todo[j]
                        if slo == shi:  # single-valued sub-range: free
                            kval[g][k] = slo
                        else:
                            child.append((k, off - cum))
                        j += 1
                    if child:
                        nxt.append(
                            (g, b, pred & (sub_exprs[i] == s), scnt, slo, shi, child)
                        )
                    cum += scnt
            regions = _pctl_resolve_zero_width(nxt, kval)

        if regions:
            rid_col, pred_total = None, None
            for i, (g, b, pred, cnt, lo, hi, picks) in enumerate(regions):
                rid_col = F.when(pred, i) if rid_col is None else rid_col.when(pred, i)
                pred_total = pred if pred_total is None else pred_total | pred
            # cheap long-typed prefilter so most rows fail one IN over
            # a few longs instead of evaluating the full CASE chain
            prefilter = F.col("b").isin(sorted({b for _, b, *_ in regions}))
            for r in (
                lib.filter(prefilter & pred_total)
                .select(rid_col.alias("rid"), "v")
                .groupBy("rid")
                .agg(F.sort_array(F.collect_list("v")).alias("vals"))
                .collect()
            ):
                g, b, _, _, _, _, picks = regions[r["rid"]]
                vals = r["vals"]
                # level-0 region == whole bucket, so vals is the
                # bucket's complete sorted multiset (frag consumers
                # need that; under refinement frag_exact is False and
                # the stash is unused)
                vals_by_gb[(g, b)] = vals
                for k, off in picks:
                    kval[g][k] = float(vals[off])

    result = {
        g: tuple(
            kval[g][k] + frac * (kval[g][k1] - kval[g][k])
            for (k, k1, frac) in (need[g][q] for q in qs)
        )
        for g in sorted(hist)
    }
    if not return_frags:
        return result
    if not frag_exact:
        return result, None
    frags = {
        g: [(*buckets[b], vals_by_gb.get((g, b))) for b in sorted(buckets)]
        for g, buckets in hist.items()
    }
    return result, frags


@register(
    "agg_percentile",
    """
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5) * 1e4) / 1e4 AS p50,
           round(quantile_cont(l_extendedprice, 0.9) * 1e4) / 1e4 AS p90,
           round(quantile_cont(l_extendedprice, 0.99) * 1e4) / 1e4 AS p99
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group in TWO passes
    (continuous-quantile definition: lower + frac*(higher-lower) at
    virtual index q*(n-1) — the same formula as DuckDB's quantile_cont
    and numpy's 'linear').

    Pass 1: one map-side-combinable agg over (group, log-bucket)
    computing count/min/max per bucket. The DDSketch-style
    relative-width bucket index (Masson et al. 2019, public) is a
    FIXED monotone mapping, so — unlike an equal-width histogram — no
    min/max pre-scan is needed, which is what removes the r4 design's
    third job. The driver walks cumulative counts (occupied buckets
    only, logarithmic in value range, constant in data size) to
    locate which bucket holds each needed order statistic (<=2 per
    quantile); any needed bucket with min==max resolves immediately
    (constant and duplicate-heavy groups never reach pass 2).
    Pass 2 (only if some bucket is mixed-value): rescan, keep rows of
    the <=6 needed buckets per group — ~n*(gamma-1) rows each — and
    sort each inside a JVM collect_list agg; the driver indexes the
    exact order statistics by offset. No Python workers, no
    broadcast-join staging: the needed-bucket predicate is a literal
    codegen filter.

    If the needed buckets together exceed PCTL_MAX_PICK_ROWS (a
    distribution that packs one log bucket — e.g. millions of
    near-identical prices), refinement levels engage instead of
    failing: each level splits the over-full regions into PCTL_NSUB
    equal-width sub-ranges of their measured [lo, hi] with one extra
    codegen scan, resolves single-valued sub-ranges for free
    (duplicate-heavy packing collapses at level 1), and re-checks the
    bound. Width shrinks 4096x per level, so ~6 levels reach one ulp
    — the PCTL_MAX_REFINE_LEVELS=8 guard is unreachable for real data.

    Earlier rounds: r3 shipped every group row through one Python
    worker (6.4x DuckDB); r4's equal-width histogram needed 3 jobs +
    an applyInPandas pick (measured 3.7 s / 9.7x at the 10x tier once
    benched in isolation). Two scans is the floor for exact quantiles
    without per-value hashmap memory (plus one scan per engaged
    refinement level). Driver state: occupied-bucket counts only.
    At 100 TB: two codegen scans, two tiny shuffles.

    Plain load, NOT load_spread (measured round-9, both tiers): the
    per-row work here is one log+floor bucket expression — cheap
    enough that the few-partition local scan beats paying a full
    round-robin row shuffle to fan it out (sf0.1: 0.53 s plain vs
    1.46 s spread; 10x: 0.61 vs 0.89). The spread belongs on
    CPU-HEAVY per-row stages (tokenization, shingling, interpreted
    vector folds), where compute per partition dwarfs one extra
    exchange; on a real multi-split cluster read the scan is already
    parallel and neither form shuffles."""
    li = (
        sources.load(spark, sf_dir, "lineitem")
        .select(F.col("l_returnflag").alias("g"), F.col("l_extendedprice").alias("v"))
        .filter(F.col("v").isNotNull())
    )
    qs = (0.5, 0.9, 0.99)
    out = [
        (g, *vals) for g, vals in sorted(exact_group_quantiles(li, qs).items())
    ]
    if not out:  # empty input: VALUES needs >= 1 tuple
        return spark.createDataFrame(
            [], "l_returnflag string, p50 double, p90 double, p99 double"
        )
    # literal VALUES -> LocalRelation: no parallelize job for the
    # 3-row result (createDataFrame costs a full job at action time).
    # repr() is the shortest round-tripping decimal form of a double,
    # so parsing it back yields the bit-identical value.
    vals = ", ".join(
        "('%s', CAST(%r AS DOUBLE), CAST(%r AS DOUBLE), CAST(%r AS DOUBLE))"
        % (g.replace("'", "''"), p50, p90, p99)
        for g, p50, p90, p99 in out
    )
    ps = spark.sql(
        f"SELECT * FROM VALUES {vals} AS t(l_returnflag, p50, p90, p99)"
    )
    return ps.select(
        "l_returnflag",
        *[(F.round(F.col(c) * 1e4) / 1e4).alias(c) for c in ["p50", "p90", "p99"]],
    )


@register(
    "agg_approx_percentile",
    """
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5) * 1e4) / 1e4 AS p50_exact,
           TRUE AS within_5pct
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles — the constant-memory sketch the exact
    version trades into at scale. The sketch value itself is
    engine-specific, so the deterministic contract is the exact p50
    plus a boolean asserting the sketch landed within 5% of it (the
    same emit-the-gate shape as agg_approx_distinct)."""
    li = sources.load(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", F.lit(0.5)).alias("p50_exact"),
        F.approx_percentile("l_extendedprice", F.lit(0.5), F.lit(10000)).alias("approx"),
    )
    return agg.select(
        "l_returnflag",
        (F.round(F.col("p50_exact") * 1e4) / 1e4).alias("p50_exact"),
        (
            F.abs(F.col("approx") - F.col("p50_exact")) / F.col("p50_exact") <= 0.05
        ).alias("within_5pct"),
    )


def approx_percentile_production(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-ONLY form of agg_approx_percentile — the operator to run
    at 100 TB. The registered query also computes the exact percentile
    so the oracle can verify sketch accuracy; that exact pass is the
    cost the sketch exists to avoid, so production uses this form."""
    return (
        sources.load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_percentile("l_extendedprice", F.lit(0.5), F.lit(10000)).alias(
                "p50_approx"
            )
        )
    )


_ZSCORE_SCHEMA = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_mktsegment", T.StringType()),
        T.StructField("zscore", T.DoubleType()),
    ]
)


@register(
    "grouped_zscore",
    """
    WITH stats AS (
      SELECT c_custkey, c_mktsegment, c_acctbal,
             avg(c_acctbal) OVER (PARTITION BY c_mktsegment) AS mu,
             stddev_samp(c_acctbal) OVER (PARTITION BY c_mktsegment) AS sigma
      FROM customer
    )
    SELECT c_custkey, c_mktsegment,
           round((c_acctbal - mu) / sigma * 1e6) / 1e6 AS zscore
    FROM stats
    """,
)
def grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group normalization via applyInPandas (grouped-map UDF —
    the per-group pandas escape hatch A19's pivot alternatives call
    for). Each group becomes one pandas DataFrame on one executor:
    fine for bounded groups (segments), the wrong tool for skewed
    billion-row groups — that regime belongs to the window-function
    oracle formulation, which is also the 100 TB path."""

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["c_acctbal"].mean()
        # ddof=1 matches stddev_samp in both engines
        sigma = pdf["c_acctbal"].std(ddof=1)
        import numpy as np

        z = (pdf["c_acctbal"] - mu) / sigma
        return pd.DataFrame(
            {
                "c_custkey": pdf["c_custkey"],
                "c_mktsegment": pdf["c_mktsegment"],
                "zscore": np.round(z * 1e6) / 1e6,
            }
        )

    c = sources.load(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").applyInPandas(zscore, _ZSCORE_SCHEMA)


@register(
    "fn_vector_literal",
    """
    WITH parsed AS (
      SELECT vec_id,
             list_transform(embedding::DOUBLE[],
                            x -> CAST(CAST(x AS VARCHAR) AS DOUBLE)) AS p
      FROM embeddings
    )
    SELECT vec_id,
           CAST(len(p) AS BIGINT) AS n_parsed,
           round(list_aggregate(p, 'sum') * 1e6) / 1e6 AS sum_parsed
    FROM parsed
    """,
)
def fn_vector_literal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector <-> string-literal round trip (ref A22: pgvector '[...]'
    literals built at load_skill_vectors_pg.py:38 and parsed back with
    ast.literal_eval at skills_for_jobs.py:313,385). Each engine
    formats with its own float repr then parses its own format — the
    parsed NUMBERS must round-trip exactly; only those are compared.
    Internally the engine never stringifies vectors (SURVEY §1.3)."""
    e = sources.load(spark, sf_dir, "embeddings")
    literal = F.concat(
        F.lit("["),
        F.concat_ws(",", F.transform("embedding", lambda x: x.cast("double").cast("string"))),
        F.lit("]"),
    )
    parsed = F.from_json(literal, "array<double>")
    return e.select(
        "vec_id",
        F.size(parsed).cast("long").alias("n_parsed"),
        (F.round(F.aggregate(parsed, F.lit(0.0), lambda s, x: s + x) * 1e6) / 1e6).alias(
            "sum_parsed"
        ),
    )


@register(
    "join_full_outer",
    """
    SELECT s.s_suppkey, s.s_name, n.n_nationkey, n.n_name
    FROM supplier s FULL OUTER JOIN nation n ON s.s_nationkey = n.n_nationkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join — unmatched rows on BOTH sides survive with
    nulls (completes the join family: inner/broadcast/outer/semi/
    anti/theta/cross/asof). Full outer cannot broadcast either side
    (both must be shuffle-complete), so it is always a shuffled
    SMJ/hash join — the one join shape where AQE skew handling is
    the only skew lever."""
    s = sources.load(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = sources.load(spark, sf_dir, "nation")
    return s.join(n, s.s_nationkey == n.n_nationkey, "full_outer").select(
        "s_suppkey", "s_name", "n_nationkey", "n_name"
    )


@register(
    "agg_stats",
    """
    SELECT l_returnflag,
           round(stddev_samp(l_extendedprice) * 1e4) / 1e4 AS price_stddev,
           round(var_samp(l_quantity) * 1e4) / 1e4 AS qty_var,
           round(corr(l_extendedprice, l_quantity) * 1e6) / 1e6 AS price_qty_corr,
           round(covar_samp(l_extendedprice, l_discount) * 1e4) / 1e4 AS price_disc_covar
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (stddev/variance/correlation/covariance)
    — single-pass streaming moments, partial-aggregated map-side like
    any hash agg: the per-group state is O(1) (sum, sum-of-squares,
    co-moments), so 100 TB costs one shuffle of 5 tiny rows per
    mapper."""
    li = sources.load(spark, sf_dir, "lineitem")
    # corr spelled from covar/stddev with a nullif guard: Spark's
    # built-in corr RAISES under ANSI when either side has zero
    # variance, while SQL engines return NULL (found by the r13
    # zero-variance-corpus differential). Same co-moment
    # accumulators, identical value where defined.
    corr_safe = F.covar_samp("l_extendedprice", "l_quantity") / F.nullif(
        F.stddev_samp("l_extendedprice") * F.stddev_samp("l_quantity"), F.lit(0.0)
    )
    return li.groupBy("l_returnflag").agg(
        (F.round(F.stddev_samp("l_extendedprice") * 1e4) / 1e4).alias("price_stddev"),
        (F.round(F.var_samp("l_quantity") * 1e4) / 1e4).alias("qty_var"),
        (F.round(corr_safe * 1e6) / 1e6).alias("price_qty_corr"),
        (F.round(F.covar_samp("l_extendedprice", "l_discount") * 1e4) / 1e4).alias(
            "price_disc_covar"
        ),
    )


@register(
    "win_first_last",
    """
    SELECT o_orderkey, o_custkey, o_totalprice,
           round(first_value(o_totalprice) OVER w * 100) / 100 AS first_price,
           round(last_value(o_totalprice) OVER w * 100) / 100 AS last_price,
           round(nth_value(o_totalprice, 2) OVER w * 100) / 100 AS second_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value/nth_value over a full-partition frame —
    each customer's first, latest, and second order price on every
    row. Unbounded-both-ends frames evaluate once per partition, not
    per row."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    o = sources.load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        (F.round(F.first("o_totalprice").over(w) * 100) / 100).alias("first_price"),
        (F.round(F.last("o_totalprice").over(w) * 100) / 100).alias("last_price"),
        (F.round(F.nth_value("o_totalprice", 2).over(w) * 100) / 100).alias("second_price"),
    )


@register(
    "sample_stratified",
    """
    SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_total,
           TRUE AS within_bounds
    FROM customer
    WHERE c_mktsegment IN
      ('AUTOMOBILE', 'BUILDING', 'FURNITURE', 'HOUSEHOLD', 'MACHINERY')
    GROUP BY c_mktsegment
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling — per-stratum fractions via sampleBy (the
    training-data curation primitive: rebalance a corpus by source/
    language/quality bucket without a shuffle; sampling is a narrow
    map-side filter). The sampled row set is RNG output, so the
    deterministic contract is per-stratum: the exact population count
    plus a boolean asserting the seeded sample size sits inside
    6-sigma binomial bounds of fraction x population (exact for the
    degenerate fractions 0.0 and 1.0)."""
    c = sources.load(spark, sf_dir, "customer")
    fractions = {
        "AUTOMOBILE": 0.5,
        "BUILDING": 0.25,
        "FURNITURE": 1.0,
        "HOUSEHOLD": 0.1,
        "MACHINERY": 0.0,
    }
    sampled = (
        c.sampleBy("c_mktsegment", fractions, seed=42)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_sampled"))
    )
    frac = F.create_map(
        *[F.lit(x) for kv in fractions.items() for x in kv]
    )[F.col("c_mktsegment")]
    totals = (
        c.filter(F.col("c_mktsegment").isin(*fractions))
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_total"))
    )
    joined = (
        totals.join(sampled, "c_mktsegment", "left")
        .withColumn("n_sampled", F.coalesce("n_sampled", F.lit(0)))
        .withColumn("mean", frac * F.col("n_total"))
        .withColumn("slack", 6 * F.sqrt(frac * (1 - frac) * F.col("n_total")) + 0.5)
    )
    return joined.select(
        "c_mktsegment",
        "n_total",
        (F.abs(F.col("n_sampled") - F.col("mean")) <= F.col("slack")).alias(
            "within_bounds"
        ),
    )


@register(
    "win_range_interval",
    """
    SELECT event_id, user_id,
           round(sum(value) OVER (
             PARTITION BY user_id
             ORDER BY date_trunc('second', CAST(ts AS TIMESTAMP))
             RANGE BETWEEN INTERVAL 10 MINUTE PRECEDING AND CURRENT ROW
           ) * 100) / 100 AS v_10min
    FROM events
    """,
)
def win_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval RANGE frame: each event's rolling 10-minute value
    total per user — the frame is defined by the ORDER-BY value (event
    time in seconds), not row offsets, so gaps and bursts are handled
    correctly. Both engines order by second-truncated time so their
    inclusive frame boundaries agree. One sort per user partition at
    any scale."""
    ev = sources.load(spark, sf_dir, "events")
    secs = F.unix_timestamp(F.date_trunc("second", F.col("ts")))
    w = (
        Window.partitionBy("user_id")
        .orderBy(secs)
        .rangeBetween(-600, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        (F.round(F.sum("value").over(w) * 100) / 100).alias("v_10min"),
    )


@register(
    "agg_median_bool",
    """
    SELECT l_returnflag,
           round(median(l_quantity) * 100) / 100 AS med_qty,
           round(median(l_extendedprice) * 1e4) / 1e4 AS med_price,
           CAST(bool_and(l_quantity > 0) AS VARCHAR) AS all_positive,
           CAST(bool_or(l_discount > 0.09) AS VARCHAR) AS any_deep_discount
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_median_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median (exact continuous, = percentile 0.5) and boolean
    every/any aggregates per group. Booleans compare as strings
    (engine<->pandas bool dtype mismatch)."""
    li = sources.load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        (F.round(F.median("l_quantity") * 100) / 100).alias("med_qty"),
        (F.round(F.median("l_extendedprice") * 1e4) / 1e4).alias("med_price"),
        F.bool_and(F.col("l_quantity") > 0).cast("string").alias("all_positive"),
        F.bool_or(F.col("l_discount") > 0.09).cast("string").alias("any_deep_discount"),
    )


@register(
    "sql_api_topk_revenue",
    """
    SELECT o.o_orderkey,
           round(sum(l.l_extendedprice * (1 - l.l_discount)) * 100) / 100 AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o.o_orderkey
    LIMIT 10
    """,
)
def sql_api_topk_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The engine's SQL entry point: a TPC-H Q3-shaped query submitted
    as literal SQL over registered views (the same Catalyst plan the
    DataFrame API builds — one parser in front of one optimizer).
    Segment filter pushes to the customer scan; the global top-10
    becomes TakeOrderedAndProject, so only 10 rows per partition ever
    reach the driver-side merge. Join-strategy hints state the scale
    invariant (filtered customer broadcasts, the lineitem fact
    shuffles) — without them Catalyst's size estimate can pick
    lineitem as a broadcast side at tiers where its pruned columns
    slip under the threshold (the q5 hazard, see _Q5_SQL_SPARK)."""
    sources.register_views(spark, sf_dir, ["customer", "orders", "lineitem"])
    return spark.sql(
        """
        SELECT /*+ BROADCAST(c), SHUFFLE_HASH(l) */ o.o_orderkey,
               round(sum(l.l_extendedprice * (1 - l.l_discount)) * 100) / 100 AS revenue,
               o.o_orderdate
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
        GROUP BY o.o_orderkey, o.o_orderdate
        ORDER BY revenue DESC, o.o_orderkey
        LIMIT 10
        """
    )


_Q5_SQL = """
    SELECT n.n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)) * 100) / 100 AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n.n_name
"""


# Spark-side variant of _Q5_SQL: same semantics, two deliberate plan
# statements the optimizer doesn't make on its own here:
#
# 1. Join ORDER — region -> nation -> customer -> orders -> lineitem.
#    The syntactic order in _Q5_SQL (c,o,l,s,n,r) leaves the region
#    filter to apply AFTER the fact join, so every lineitem row
#    shuffles regardless of region; leading with the filtered
#    region/nation dims prunes customers (and therefore orders) 5x
#    BEFORE any fact row moves — the selective-dim-first reduction a
#    cost-based optimizer would find, stated explicitly.
# 2. Strategy hints — dims broadcast; the orders->lineitem fact join
#    is SHUFFLE_HASH with the (5x-reduced) orders subtree as build
#    side. Without hints Catalyst's size estimate can pick LINEITEM
#    as a broadcast side (its pruned 4-column estimate slips under
#    the 64 MB threshold at the 10x bench tier) — broadcasting the
#    fact table is the one plan that cannot survive scale.
#    The customer->orders join inside the subquery carries NO hint:
#    at local tiers the cost model broadcasts pruned orders (under
#    threshold, locally optimal), and at scale the same estimate
#    flips it to a shuffle — reversibility a forced hint would lose.
_Q5_SQL_SPARK = """
    SELECT /*+ SHUFFLE_HASH(co) */
           co.n_name AS n_name,
           round(sum(l.l_extendedprice * (1 - l.l_discount)) * 100) / 100 AS revenue
    FROM (
      SELECT /*+ BROADCAST(n), BROADCAST(r) */
             o.o_orderkey, c.c_nationkey, n.n_name
      FROM region r
      JOIN nation n   ON n.n_regionkey = r.r_regionkey
      JOIN customer c ON c.c_nationkey = n.n_nationkey
      JOIN orders o   ON o.o_custkey = c.c_custkey
      WHERE r.r_name = 'ASIA'
    ) co
    JOIN lineitem l ON l.l_orderkey = co.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND co.c_nationkey = s.s_nationkey
    GROUP BY co.n_name
    ORDER BY revenue DESC, n_name
"""


@register("sql_api_region_revenue", _Q5_SQL)
def sql_api_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped local-supplier-volume query as literal SQL —
    the 6-table join exercise for Catalyst's join reordering +
    broadcast selection over registered views (nation/region/customer/
    supplier broadcast, the local-supplier equi-condition rides the
    big join, region filter prunes before any fact row moves). The
    ORDER BY on a 5-row result is driver-trivial; everything expensive
    is one reordered join tree. The oracle runs the same statement in
    DuckDB minus the Spark join-strategy hints (hint comments are the
    single divergence between the two texts — see _Q5_SQL_SPARK)."""
    sources.register_views(
        spark, sf_dir, ["customer", "orders", "lineitem", "supplier", "nation", "region"]
    )
    return spark.sql(_Q5_SQL_SPARK)


@register(
    "seq_funnel",
    """
    WITH v AS (
      SELECT user_id, min(epoch_us(ts)) AS t FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS t
      FROM events e JOIN v ON v.user_id = e.user_id AND epoch_us(e.ts) > v.t
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, min(epoch_us(e.ts)) AS t
      FROM events e JOIN c ON c.user_id = e.user_id AND epoch_us(e.ts) > c.t
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS n_view,
           CAST((SELECT count(*) FROM c) AS BIGINT) AS n_click,
           CAST((SELECT count(*) FROM p) AS BIGINT) AS n_purchase
    """,
)
def seq_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel analysis: users who viewed, then clicked AFTER
    their first view, then purchased AFTER that click — the canonical
    event-sequence query (the time-ordering makes it a different
    beast from three independent counts). ONE shuffle on user_id:
    the per-user first-passage times chain as three window minimums
    over the same partitioning (each stage's threshold is the
    previous stage's column, so no joins ever form), then a per-user
    collapse and a single global count — vs the naive three
    filtered-aggregate-plus-join stages, which shuffle the events
    table three times. Timestamps compare as integer epoch-µs
    (events.ts is µs-aligned, so Spark and the oracle agree)."""
    ev = sources.load(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros(F.col("ts").cast("timestamp")).alias("t")
    )
    w = Window.partitionBy("user_id")
    staged = (
        ev.withColumn(
            "vt", F.min(F.when(F.col("event_type") == "view", F.col("t"))).over(w)
        )
        .withColumn(
            "ct",
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (F.col("t") > F.col("vt")),
                    F.col("t"),
                )
            ).over(w),
        )
        .withColumn(
            "pt",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("t") > F.col("ct")),
                    F.col("t"),
                )
            ).over(w),
        )
    )
    per_user = staged.groupBy("user_id").agg(
        F.first("vt").alias("vt"), F.first("ct").alias("ct"), F.first("pt").alias("pt")
    )
    return per_user.agg(
        F.count("vt").alias("n_view"),
        F.count("ct").alias("n_click"),
        F.count("pt").alias("n_purchase"),
    )


HIGH_VALUE = 400.0


@register(
    "agg_filtered",
    f"""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(CASE WHEN value > {HIGH_VALUE} THEN 1 END) AS BIGINT) AS n_high,
           round(sum(CASE WHEN value > {HIGH_VALUE} THEN value ELSE 0 END) * 100) / 100
             AS sum_high,
           round(count(CASE WHEN value > {HIGH_VALUE} THEN 1 END)
                 / count(*) * 1e6) / 1e6 AS share_high
    FROM events GROUP BY event_type
    """,
)
def agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered aggregates (conditional count/sum/share) in one pass —
    the SQL FILTER clause expressed as CASE-guarded aggs so one scan
    feeds every conditional metric (vs one scan per WHERE). All
    map-side combinable."""
    ev = sources.load(spark, sf_dir, "events")
    high = F.when(F.col("value") > HIGH_VALUE, 1)
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.count(high).alias("n_high"),
        (
            F.round(F.sum(F.when(F.col("value") > HIGH_VALUE, F.col("value")).otherwise(0.0)) * 100)
            / 100
        ).alias("sum_high"),
        (F.round(F.count(high).cast("double") / F.count("*") * 1e6) / 1e6).alias("share_high"),
    )


@register(
    "win_islands",
    """
    WITH days AS (
      SELECT DISTINCT user_id,
             CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day_num
      FROM events
    ), grp AS (
      SELECT user_id, day_num,
             day_num - row_number() OVER (PARTITION BY user_id ORDER BY day_num)
               AS anchor
      FROM days
    ), islands AS (
      SELECT user_id, anchor, count(*) AS streak
      FROM grp GROUP BY user_id, anchor
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_islands,
           CAST(max(streak) AS BIGINT) AS max_streak,
           CAST(sum(streak) AS BIGINT) AS active_days
    FROM islands GROUP BY user_id
    """,
)
def win_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per-user runs of CONSECUTIVE active days
    (streaks). The anchor trick — day_number minus row_number is
    constant within a consecutive run — turns run detection into a
    plain group-by: no self-join, no iteration, one window + two
    aggs all sharing the user_id partitioning (a single shuffle).
    Day numbers are integer epoch-days so both engines agree
    exactly."""
    ev = sources.load(spark, sf_dir, "events")
    days = ev.select(
        "user_id",
        F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 86400000000)
        .cast("long")
        .alias("day_num"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day_num")
    grp = days.withColumn("anchor", F.col("day_num") - F.row_number().over(w))
    islands = grp.groupBy("user_id", "anchor").agg(F.count("*").alias("streak"))
    return islands.groupBy("user_id").agg(
        F.count("*").alias("n_islands"),
        F.max("streak").cast("long").alias("max_streak"),
        F.sum("streak").cast("long").alias("active_days"),
    )


@register(
    "agg_mode",
    """
    WITH counts AS (
      SELECT user_id, event_type, count(*) AS c FROM events
      WHERE event_type IS NOT NULL
      GROUP BY user_id, event_type
    ), ranked AS (
      SELECT user_id, event_type, c,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY c DESC, event_type ASC) AS r
      FROM counts
    )
    SELECT user_id, event_type AS mode_type, CAST(c AS BIGINT) AS n
    FROM ranked WHERE r = 1
    """,
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group mode (most frequent event type per
    user): count + lexicographic struct-max instead of the builtin
    `mode()`, whose tie-breaking is engine-arbitrary — here ties break
    toward the alphabetically-first type in BOTH engines. One
    aggregation tree, no window in the Spark plan (the oracle uses
    row_number for clarity; the struct-max is the same argmax trick
    as agg_minmax_by)."""
    ev = sources.load(spark, sf_dir, "events")
    # SQL mode() semantics: NULL is not a candidate value (and a NULL
    # type would also sort engine-differently inside the struct-min)
    counts = (
        ev.filter(F.col("event_type").isNotNull())
        .groupBy("user_id", "event_type")
        .agg(F.count("*").alias("c"))
    )
    # argmax by (c DESC, event_type ASC) in one pass: min over
    # struct(-c, event_type) sorts count-descending then type-
    # ascending, and the winning struct already CARRIES the count —
    # no join back to the counts table
    best = counts.groupBy("user_id").agg(
        F.min(F.struct((-F.col("c")).alias("negc"), F.col("event_type"))).alias("m")
    )
    return best.select(
        "user_id",
        F.col("m.event_type").alias("mode_type"),
        (-F.col("m.negc")).alias("n"),
    )


@register(
    "fn_try_arith",
    """
    SELECT event_id,
           CASE WHEN CAST(floor(value) AS BIGINT) % 7 = 0 THEN NULL
                ELSE round(value / (CAST(floor(value) AS BIGINT) % 7), 6) END AS safe_div,
           TRY_CAST(event_type AS DOUBLE) AS bad_cast,
           TRY_CAST(CAST(user_id AS VARCHAR) AS BIGINT) AS good_cast
    FROM events
    """,
)
def fn_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe error handling family: this engine runs with
    spark.sql.ansi.enabled=true (arithmetic errors THROW, the
    correctness-first posture), so recoverable per-row failures use
    the try_* forms — try_divide yields NULL on /0, try_cast yields
    NULL on malformed input (the A21 continue-on-error pattern as
    expressions instead of exception handlers)."""
    ev = sources.load(spark, sf_dir, "events")
    den = F.pmod(F.floor("value").cast("long"), F.lit(7))
    return ev.select(
        "event_id",
        F.round(F.try_divide(F.col("value"), F.when(den != 0, den)), 6).alias("safe_div"),
        F.try_to_number(F.col("event_type"), F.lit("999.99")).cast("double").alias("bad_cast"),
        F.col("user_id").cast("string").try_cast("long").alias("good_cast"),
    )


CORR_PAIRS = (
    ("l_quantity", "l_extendedprice"),
    ("l_quantity", "l_discount"),
    ("l_extendedprice", "l_discount"),
    ("l_extendedprice", "l_tax"),
)


@register(
    "agg_corr_matrix",
    """
    SELECT l_returnflag, x, y, corr_xy, n FROM (
    """
    + "\n    UNION ALL\n".join(
        f"""
      SELECT l_returnflag, '{x}' AS x, '{y}' AS y,
             round(corr({x}, {y}) * 1e6) / 1e6 AS corr_xy,
             CAST(count(*) AS BIGINT) AS n
      FROM lineitem GROUP BY l_returnflag"""
        for x, y in CORR_PAIRS
    )
    + "\n    )",
)
def agg_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group Pearson correlation matrix in long form: each
    (return-flag group, numeric-column pair) row carries the sample
    correlation and the group size — the feature-screening pass a
    modeling pipeline runs before deciding which columns carry
    independent signal.

    Scale shape: ONE map-side-combinable aggregation computes every
    pair's co-moments simultaneously (|groups| x |pairs| cells of
    constant-size state — Pearson is a streaming mergeable statistic);
    the long-form unpivot is a stack over those few cells, never a
    second pass over the fact. Correlation is scale-free, so the
    sample-vs-population normalization cancels and both engines'
    one-pass co-moment formulas agree to rounding.
    """
    li = sources.load(spark, sf_dir, "lineitem")
    aggs = []
    for i, (x, y) in enumerate(CORR_PAIRS):
        # covar/stddev spelling with a nullif guard: built-in corr
        # RAISES under ANSI on a zero-variance column; SQL returns
        # NULL (see agg_stats)
        safe = F.covar_samp(x, y) / F.nullif(
            F.stddev_samp(x) * F.stddev_samp(y), F.lit(0.0)
        )
        aggs.append((F.round(safe * 1e6) / 1e6).alias(f"c{i}"))
    wide = li.groupBy("l_returnflag").agg(
        *aggs, F.count("*").cast("long").alias("n")
    )
    stack = ", ".join(
        f"'{x}', '{y}', c{i}" for i, (x, y) in enumerate(CORR_PAIRS)
    )
    return wide.select(
        "l_returnflag",
        F.expr(
            f"stack({len(CORR_PAIRS)}, {stack}) AS (x, y, corr_xy)"
        ),
        "n",
    )


# shift for the moment sums: skewness/kurtosis are translation
# invariant, so centering near the data's magnitude (l_extendedprice
# ~ 1e3..1e5) before raising to the 4th power keeps the power sums
# small and (in integer cents) exactly representable
MOMENTS_SHIFT = 40000.0
MOMENTS_SHIFT_CENTS = 4_000_000  # MOMENTS_SHIFT on the exact cent grid
# 2^52: split radix for exact wide-integer -> double assembly. q = s
# div 2^52 and r = s mod 2^52 each fit an int64, CAST(int AS DOUBLE)
# is correctly rounded in both engines, and multiplying by a POWER OF
# TWO only shifts the exponent (no mantissa rounding) — so
# q*2^52.0 + r re-assembles the SAME double bit-for-bit on both
# sides. Valid while q fits an int64, i.e. |s| < 2^115 ~ 4e34: ~1e9
# rows per group at lineitem magnitudes; past that the split gains a
# second level, it does not change shape.
_MOMENTS_P52 = 4503599627370496


def _dec_double_sql(col: str, div: str) -> str:
    """Exact wide-integer -> double SQL fragment (see _MOMENTS_P52).
    `div` is the engine's integer-division spelling — 'DIV' for Spark
    SQL over DECIMAL(38,0), '//' for DuckDB over HUGEINT; everything
    else is identical text, and the produced double is bit-identical
    across engines, which is what makes the downstream moment
    arithmetic engine- and order-independent."""
    p = _MOMENTS_P52
    return (
        f"(CASE WHEN {col} < 0 THEN -1.0 ELSE 1.0 END) * "
        f"(CAST(CAST(abs({col}) {div} {p} AS BIGINT) AS DOUBLE) * {p}.0 "
        f"+ CAST(CAST(abs({col}) % {p} AS BIGINT) AS DOUBLE))"
    )


# final-step expressions shared VERBATIM by the Spark selectExpr and
# the DuckDB oracle: the m1..m4 inputs are bit-identical doubles, so
# running the same literal arithmetic yields bit-identical outputs
# (modulo power(), which both engines round within 1 ulp of exact on
# O(1)-magnitude operands — harmless against the 1e-6 rounding)
_MOMENTS_FINAL_EXPRS = (
    "l_returnflag",
    "n",
    f"round((m1 / 100.0 + {MOMENTS_SHIFT!r}) * 1e6) / 1e6 AS mean",
    "round((m2 - m1 * m1) / 1e4 * 1e6) / 1e6 AS variance",
    # nullif: zero central variance (constant column) must yield NULL
    # skewness/kurtosis in both engines, not an ANSI divide error
    "round((m3 - 3 * m1 * m2 + 2 * m1 * m1 * m1)"
    " / nullif(power(m2 - m1 * m1, 1.5), 0) * 1e6) / 1e6 AS skewness",
    "round(((m4 - 4 * m1 * m3 + 6 * m1 * m1 * m2"
    " - 3 * m1 * m1 * m1 * m1)"
    " / nullif(power(m2 - m1 * m1, 2.0), 0) - 3) * 1e6) / 1e6 AS kurtosis",
)


def _moments_spark_sql() -> str:
    """The Spark-side moments query as ONE SQL string (a single py4j
    parse instead of ~50 driver-side Column constructions, which cost
    ~0.26 s of plan build per invocation — measured round-9).

    Hot-path representation: u^3 and u^4 never materialize per row —
    each is carried as base-2^23 LIMBS of its exact value, computed
    with plain int64 DIV/% arithmetic that whole-stage codegen
    compiles to primitive longs (the earlier DECIMAL(38,0) per-row
    multiplies ran on JVM Decimal objects and cost ~2.4x the whole
    query: 1.24 s vs 0.51 s at the 10x tier, against a 0.35 s scan
    floor). |u| <= ~7.1e6 < 2^23 (cent grid, shifted), so
    u2 = |u|^2 <= 2^46 splits as ah*2^23 + al with ah <= 2^23,
    al < 2^23; every per-row limb is a product of two <=2^24-bounded
    halves (<= 2^47), re-split once so each SUMMED column stays under
    2^24 — long-safe to ~5e11 rows PER GROUP (a second split level
    extends it; same growth path the DECIMAL form documented). Signs
    ride the limbs: the sign multiplies AFTER the abs-value DIV/%
    split, so integer truncation toward zero never skews a limb. The
    exact integer power sums are reassembled from the limb sums in
    DECIMAL(38,0) on the |groups| output rows only, where they equal
    the oracle's HUGEINT totals digit-for-digit — the 2^52 double
    assembly and the final expressions stay shared verbatim with the
    oracle."""
    B = 1 << 23  # split radix for per-row limbs (2^52 stays the
    # radix for the final integer->double assembly, _MOMENTS_P52)
    # |u3| = au*u2 = (au*ah)*2^23 + au*al ; u4 = u2*u2
    #      = (ah^2)*2^46 + (2*ah*al)*2^23 + al^2
    comps = (
        ("s2", "u2", False),
        ("s3h", "au * ah", True),
        ("s3l", "au * al", True),
        ("s4a", "ah * ah", False),
        ("s4b", "2 * ah * al", False),
        ("s4c", "al * al", False),
    )
    limb_exprs = ", ".join(
        f"{'sg * ' if signed else ''}(({c}) % {B}) AS {nm}_lo, "
        f"{'sg * ' if signed else ''}(({c}) DIV {B}) AS {nm}_hi"
        for nm, c, signed in comps
    )
    limb_sums = ", ".join(
        f"CAST(sum({nm}_{half}) AS BIGINT) AS {nm}_{half}"
        for nm, _, _ in comps
        for half in ("lo", "hi")
    )
    return f"""
    WITH c AS (
      SELECT l_returnflag,
             CAST(round(l_extendedprice * 100) AS BIGINT)
               - {MOMENTS_SHIFT_CENTS} AS u
      FROM svs_moments_lineitem
    ), d AS (
      SELECT l_returnflag, u, abs(u) AS au,
             CASE WHEN u < 0 THEN -1 ELSE 1 END AS sg,
             abs(u) * abs(u) AS u2
      FROM c
    ), e AS (
      SELECT l_returnflag, u, au, sg, u2,
             u2 DIV {B} AS ah, u2 % {B} AS al
      FROM d
    ), f AS (
      SELECT l_returnflag, u, {limb_exprs} FROM e
    ), s AS (
      SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(u) AS BIGINT) AS s1, {limb_sums}
      FROM f GROUP BY l_returnflag
    ), dec AS (
      SELECT l_returnflag, n, s1,
             CAST(s2_hi AS DECIMAL(38,0)) * {B} + s2_lo AS s2,
             (CAST(s3h_hi AS DECIMAL(38,0)) * {B} + s3h_lo + s3l_hi)
               * {B} + s3l_lo AS s3,
             ((CAST(s4a_hi AS DECIMAL(38,0)) * {B} + s4a_lo + s4b_hi)
               * {B} + s4b_lo + s4c_hi) * {B} + s4c_lo AS s4
      FROM s
    ), m AS (
      SELECT l_returnflag, n,
             CAST(s1 AS DOUBLE) / n AS m1,
             {_dec_double_sql("s2", "DIV")} / n AS m2,
             {_dec_double_sql("s3", "DIV")} / n AS m3,
             {_dec_double_sql("s4", "DIV")} / n AS m4
      FROM dec
    )
    SELECT {", ".join(_MOMENTS_FINAL_EXPRS)}
    FROM m
    """


_MOMENTS_SPARK_SQL = _moments_spark_sql()


@register(
    "agg_moments",
    f"""
    WITH c AS (
      SELECT l_returnflag,
             CAST(round(l_extendedprice * 100) AS BIGINT)
               - {MOMENTS_SHIFT_CENTS} AS u
      FROM lineitem
    ), p AS (
      SELECT l_returnflag, u, u * u AS u2,
             CAST(u * u AS HUGEINT) * u AS u3,
             CAST(u * u AS HUGEINT) * CAST(u * u AS HUGEINT) AS u4
      FROM c
    ), s AS (
      SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(u) AS BIGINT) AS s1,
             sum(CAST(u2 AS HUGEINT)) AS s2,
             sum(u3) AS s3, sum(u4) AS s4
      FROM p GROUP BY l_returnflag
    ), m AS (
      SELECT l_returnflag, n,
             CAST(s1 AS DOUBLE) / n AS m1,
             {_dec_double_sql("s2", "//")} / n AS m2,
             {_dec_double_sql("s3", "//")} / n AS m3,
             {_dec_double_sql("s4", "//")} / n AS m4
      FROM s
    )
    SELECT {", ".join(_MOMENTS_FINAL_EXPRS)}
    FROM m
    """,
)
def agg_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group distribution moments — mean, population variance,
    skewness, excess kurtosis — from ONE pass of EXACT integer power
    sums. Prices live on the cent grid (verified: the corpus is
    2-decimal to within double representation error), so each row
    contributes u and u^2 exactly in int64 and u^3, u^4 exactly in
    DECIMAL(38,0) (HUGEINT on the oracle side); the grouped sums are
    exact integers, which makes the aggregation ORDER-INDEPENDENT —
    any partitioning, any partial-merge order, any engine produces
    the same sums. That is the property the earlier double-avg
    formulation lacked: at ~1e9 variance magnitude every reordering
    of the FP sum moved the 6th decimal, so cross-engine agreement
    (and determinism on a real multi-executor cluster) held only
    while both sides happened to add in the same sequential order.
    The exact sums become doubles through the 2^52 split
    (_dec_double_sql — bit-identical on both engines), then the
    textbook population-moment formulas run as the SAME literal SQL
    text on both sides (_MOMENTS_FINAL_EXPRS; the engines' built-in
    skewness/kurtosis disagree on sample-vs-population
    normalization, so the formulas are spelled out).

    Scale shape: one map-side-combinable aggregation (count + 13
    long sums per group — constant mergeable state), |groups| result
    rows; no second pass, no shuffle beyond the group exchange.
    Plain load, NOT load_spread (measured round-9 A/B, both tiers):
    the r8 register row blamed the 12.5x 10x-tier ratio on row-group
    starvation, but the dominant term was the per-row DECIMAL
    arithmetic — with the limb representation the few-partition scan
    wins at both tiers (sf0.1: 0.36 s plain vs 0.90 s spread; 10x:
    0.46 vs 0.58) because a round-robin row shuffle costs more than
    the residual starvation. The exact integer sums keep ANY
    partitioning order-safe, so a cluster's multi-split read needs no
    spread either.

    Hot-path representation (round-9): u^3 and u^4 never materialize
    per row — each is carried as base-2^23 LIMBS of its exact value,
    computed with plain int64 arithmetic that whole-stage codegen
    compiles to primitive longs (the earlier DECIMAL(38,0) per-row
    multiplies ran on JVM Decimal objects and cost ~2.4x the whole
    query: 1.24 s vs 0.51 s at the 10x tier, against a 0.35 s scan
    floor). |u| <= ~7.1e6 < 2^23 (cent grid, shifted), so
    u2 = |u|^2 <= 2^46 splits as a_hi*2^23 + a_lo with both halves
    < 2^24; every per-row limb is then a product of <=2^24-bounded
    halves (<= 2^47), re-split once more so each SUMMED column stays
    under 2^24 * n — long-safe to n ~ 5e11 rows PER GROUP (a second
    split level extends it, same as the decimal form's documented
    growth path). Signs ride the limbs (sign applied AFTER the
    abs-value split, so integer truncation never skews a limb). The
    exact integer power sums are reassembled from the limb sums in
    DECIMAL(38,0) on the |groups| output rows only, where they equal
    the oracle's HUGEINT totals digit-for-digit — the 2^52 double
    assembly and the shared final expressions are unchanged."""
    sources.bind_view(
        spark,
        "svs_moments_lineitem",
        sf_dir,
        lambda: sources.load(spark, sf_dir, "lineitem"),
    )
    return spark.sql(_MOMENTS_SPARK_SQL)


# ONE oracle literal shared by the headline agg_gini and its
# registered 100 TB twin agg_gini_distributed (operators/
# scale_twins.py imports it): the twin's correctness contract is
# "same oracle", so the SQL must not be able to desynchronize
# (advisor r8). The isNotNull pin mirrors the explicit filter both
# Spark forms apply — DuckDB's row_number orders NULLS LAST while
# Spark ranks NULLs FIRST, so an unpinned NULL o_totalprice would
# shift every rank in the group (advisor r8; current corpora carry
# none — the pin makes the agreement a contract, not an accident).
GINI_ORACLE = """
    WITH r AS (
      SELECT o_orderpriority, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice, o_orderkey) AS rk
      FROM orders WHERE o_totalprice IS NOT NULL
    )
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
           round((2.0 * sum(rk * o_totalprice)
                  - (count(*) + 1) * sum(o_totalprice))
                 / (count(*) * sum(o_totalprice)) * 1e6) / 1e6 AS gini
    FROM r GROUP BY o_orderpriority
"""


@register("agg_gini", GINI_ORACLE)
def agg_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group Gini coefficient of the value distribution (the
    inequality measure a corpus planner runs over per-source token
    budgets or spend): rank values within the group, then
    G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)) — the exact
    closed form over sorted order statistics, identical arithmetic
    both engines, deterministic tie-break by key.

    Scale shape: one exchange on the group key feeds the ranking
    window, then the Gini sum is a map-side-combinable aggregate over
    the SAME partitioning; |groups| output rows. KNOWN LIMIT: with a
    5-value partition key each group's sort lands on one task, so at
    extreme scale this collapses parallelism — agg_gini_distributed
    (benched alongside, tested equal) is the bucket-offset exact-rank
    form that spreads the sort over (group, bucket) partitions; at
    the benched tiers the plain window wins (min-of-2 cold 1.33 s vs
    2.05 s at 1M orders), which is why it stays the headline, the
    anomaly_mad/_production precedent."""
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    r = (
        sources.load(spark, sf_dir, "orders")
        .select("o_orderpriority", "o_totalprice", "o_orderkey")
        # explicit NULL pin (advisor r8): Spark ranks NULLs first,
        # DuckDB's row_number orders them last — exclude them on both
        # sides (oracle WHERE) so the ranks can never diverge
        .filter(F.col("o_totalprice").isNotNull())
        .withColumn("rk", F.row_number().over(w))
    )
    return r.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("n"),
        (
            F.round(
                (
                    2.0 * F.sum(F.col("rk") * F.col("o_totalprice"))
                    - (F.count("*") + 1) * F.sum("o_totalprice")
                )
                / (F.count("*") * F.sum("o_totalprice"))
                * 1e6
            )
            / 1e6
        ).alias("gini"),
    )


def agg_gini_distributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB form of agg_gini — DISTRIBUTED exact ranking, no
    per-group single-task sort. The global within-group rank is
    assembled the agg_percentile way: (1) one map-side-combinable agg
    counts rows per (group, log-bucket) — the fixed DDSketch
    value->bucket mapping, no pre-scan; (2) a window over those tiny
    cells turns counts into per-bucket cumulative OFFSETS (|groups| x
    |occupied buckets| rows, broadcast back); (3) rows rank LOCALLY
    within their (group, bucket) — thousands of window partitions
    instead of five — and global rank = offset + local rank (exact:
    equal values share a bucket, so the (value, key) tie-break never
    crosses a bucket boundary). The fact shuffles once, on the
    well-spread (group, bucket) key. Identical output to agg_gini
    (equality-tested); benched in bench.py _extras as the swap-in at
    scales where the 5-partition window binds."""
    rows = (
        sources.load(spark, sf_dir, "orders")
        .select("o_orderpriority", F.col("o_totalprice").alias("v"), "o_orderkey")
        # same NULL pin as the headline (advisor r8): without it a
        # NULL totalprice would fall through the bucket expression's
        # otherwise(0) into bucket 0 and shift every rank vs the
        # oracle's NULLS-LAST row_number
        .filter(F.col("v").isNotNull())
        .withColumn("b", _pctl_bucket_expr())
    )
    per_gb = rows.groupBy("o_orderpriority", "b").agg(F.count("*").alias("cnt"))
    off_w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = per_gb.select(
        "o_orderpriority",
        "b",
        F.coalesce(F.sum("cnt").over(off_w), F.lit(0)).alias("off"),
    )
    local_w = Window.partitionBy("o_orderpriority", "b").orderBy("v", "o_orderkey")
    ranked = (
        rows.join(F.broadcast(offsets), ["o_orderpriority", "b"])
        .withColumn("rk", F.col("off") + F.row_number().over(local_w))
    )
    return ranked.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("n"),
        (
            F.round(
                (
                    2.0 * F.sum(F.col("rk") * F.col("v"))
                    - (F.count("*") + 1) * F.sum("v")
                )
                / (F.count("*") * F.sum("v"))
                * 1e6
            )
            / 1e6
        ).alias("gini"),
    )


@register(
    "agg_winsorized_mean",
    """
    WITH b AS (
      SELECT l_returnflag,
             quantile_cont(l_extendedprice, 0.05) AS lo,
             quantile_cont(l_extendedprice, 0.95) AS hi
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_returnflag, CAST(count(*) AS BIGINT) AS n,
           round(avg(least(greatest(l_extendedprice, lo), hi)) * 1e4) / 1e4
             AS wins_mean,
           round(avg(l_extendedprice) * 1e4) / 1e4 AS raw_mean
    FROM lineitem l JOIN b USING (l_returnflag)
    GROUP BY l.l_returnflag
    """,
)
def agg_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group 5/95-winsorized mean next to the raw mean — the
    robust central-tendency readout a metrics pipeline publishes when
    heavy tails would let a handful of outliers move the raw average
    (completing the robust-stats seats next to anomaly_mad's
    median/MAD and grouped_zscore's moments). Spark's exact
    interpolated `percentile` and DuckDB's `quantile_cont` share the
    same definition on DOUBLE, so the clip bounds agree bit-for-bit.

    Scale shape: the clip bounds come from `exact_group_quantiles`
    (the agg_percentile log-bucket machinery) — one map-side-
    combinable histogram pass + a bounded pick pass — NOT from
    Spark's `percentile` aggregate, whose ObjectHashAggregate buffer
    has no map-side reduction and therefore shuffles the entire
    value column. Since r13 the winsorized mean itself ALSO resolves
    from those same two passes: the histogram carries each bucket's
    exact value SUM, so every bucket cleanly below lo / above hi /
    inside [lo, hi] contributes lo*cnt / hi*cnt / sum in closed form,
    and a bucket straddling a bound always holds the order statistics
    that bound interpolates between — meaning the pick pass already
    collected its full sorted value list, which resolves the boundary
    rows exactly. The third full-fact clip+avg scan of the r7 shape
    is gone (cold 1.44 -> ~0.95 s at sf0.1; at 100 TB this deletes
    one complete fact pass). Driver arithmetic uses math.fsum —
    correctly-rounded summation, at least as accurate as either
    engine's fold — and the pathological paths where fragment sums
    stop being exact (refinement levels, sub-ulp regions) fall back
    to the r7 clip-scan plan unchanged. The fact never shuffles at
    all: plain load, not load_spread — the per-row work is too cheap
    to be worth a round-robin row shuffle at local tiers, and a
    cluster read is already multi-split."""
    import math

    li = sources.load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    bounds, frags = exact_group_quantiles(
        li.select(
            F.col("l_returnflag").alias("g"),
            F.col("l_extendedprice").alias("v"),
        ).filter(F.col("v").isNotNull()),
        (0.05, 0.95),
        return_frags=True,
    )

    def _closed_form():
        """(g, n, wins_mean, raw_mean) rows from the fragment stats;
        None when a straddling fragment lacks its value list (cannot
        happen per the interpolation argument above — belt-and-braces
        fallback to the scan plan rather than a wrong answer)."""
        rows = []
        for g in sorted(bounds):
            lo_v, hi_v = bounds[g]
            n = 0
            raw_parts: list[float] = []
            wins_parts: list[float] = []
            for cnt, bmin, bmax, bsum, vals in frags[g]:
                n += cnt
                raw_parts.append(bsum)
                if bmax <= lo_v:
                    wins_parts.append(lo_v * cnt)
                elif bmin >= hi_v:
                    wins_parts.append(hi_v * cnt)
                elif bmin >= lo_v and bmax <= hi_v:
                    wins_parts.append(bsum)
                elif vals is not None:
                    wins_parts.append(
                        math.fsum(min(max(v, lo_v), hi_v) for v in vals)
                    )
                else:
                    return None
            rows.append(
                (g, n, math.fsum(wins_parts) / n, math.fsum(raw_parts) / n)
            )
        return rows

    out = _closed_form() if frags is not None else None
    if out is not None:
        if not out:  # empty input: VALUES needs >= 1 tuple
            return spark.createDataFrame(
                [], "l_returnflag string, n bigint, wins_mean double, raw_mean double"
            )
        vals_sql = ", ".join(
            "('%s', CAST(%d AS BIGINT), CAST(%r AS DOUBLE), CAST(%r AS DOUBLE))"
            % (g.replace("'", "''"), n, wm, rm)
            for g, n, wm, rm in out
        )
        ps = spark.sql(
            f"SELECT * FROM VALUES {vals_sql} AS t(l_returnflag, n, wins_mean, raw_mean)"
        )
        return ps.select(
            "l_returnflag",
            "n",
            (F.round(F.col("wins_mean") * 1e4) / 1e4).alias("wins_mean"),
            (F.round(F.col("raw_mean") * 1e4) / 1e4).alias("raw_mean"),
        )

    # fallback: the r7 clip-scan plan (one extra fact pass)
    lo_col, hi_col = None, None
    for g, (lo, hi) in sorted(bounds.items()):
        pred = F.col("l_returnflag") == g
        lo_col = F.when(pred, lo) if lo_col is None else lo_col.when(pred, lo)
        hi_col = F.when(pred, hi) if hi_col is None else hi_col.when(pred, hi)
    if lo_col is None:  # empty input
        lo_col = hi_col = F.lit(None).cast("double")
    clipped = li.select(
        "l_returnflag",
        "l_extendedprice",
        F.least(F.greatest(F.col("l_extendedprice"), lo_col), hi_col).alias("w"),
    )
    return clipped.groupBy("l_returnflag").agg(
        F.count("*").cast("long").alias("n"),
        (F.round(F.avg("w") * 1e4) / 1e4).alias("wins_mean"),
        (F.round(F.avg("l_extendedprice") * 1e4) / 1e4).alias("raw_mean"),
    )

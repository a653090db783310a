"""Joins (SURVEY.md §2 B8–B15).

Strategy notes for 100 TB:
- Equi-joins on fact tables shuffle on the join key; Catalyst + AQE
  pick sort-merge vs shuffled-hash and split skewed partitions.
- Dimension joins (nation, region, bands) are explicitly
  ``F.broadcast`` so no shuffle of the fact side happens at all.
- The interval join anchors on an equi-key (user_id) so it is a
  shuffle-equi-join with a range residual — NOT a nested-loop.
- The as-of join is the union-timeline construction: one sort per
  user partition, no pairwise blowup (O(n log n) instead of the
  O(n·m) join+filter form).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stellarsql_spark.catalog import load_table, register_views
from stellarsql_spark.functions.exact import cents, dsum, sql_csum, sql_dsum
from stellarsql_spark.registry import register

_B8_ORACLE = f"""
SELECT r_name, n_name, COUNT(*) AS n_orders, {sql_csum("o_totalprice")} AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE o_orderstatus = 'F'
GROUP BY r_name, n_name
"""


@register("b_join_inner", oracle=_B8_ORACLE, tags=("join",))
def b_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-table inner equi-join chain, pre-aggregated before the join.

    Because the final grouping keys (r_name, n_name) are functionally
    determined by the join key, the fact side is aggregated down to
    o_custkey granularity FIRST (one slim shuffle of (key, count,
    cent-long) triples), so the customer join processes |customer|
    rows instead of |orders| rows and the dims fold in afterwards. At
    100 TB this is the eager-aggregation rewrite that turns a
    fact-×-dim shuffle join into a dim-×-dim join.

    This is the EXCHANGE-BEARING form, kept as the measured contrast:
    its two fact-side exchanges are the entire gap vs an embedded
    engine at depth (3.1× @300×, 4.6× @1000×, BENCH_r07), and
    ``b_join_inner_bucketed`` (sources/bucketed.py, C150) removes
    them at rest — same result set, custkey-co-bucketed layout, only
    the 25-row rollup still shuffles, ≤2× at both depths. At 100 TB
    the layout is the answer; this form is what you pay when the
    fact table arrives unbucketed.

    Measured round-5 negative result, recorded so it isn't re-tried:
    the hash-build-on-customer form (broadcast the slim
    (c_custkey, c_nationkey) map, one pass over orders, partial agg to
    25 nationkey groups — the embedded-engine plan shape) LOST to this
    form at every tier (best-of-5 min, same session: base 0.27 vs
    0.19 s, 30× 0.71 vs 0.61 s, 100× 2.05 vs 1.69 s) and its run
    variance was far worse (per-execution TorrentBroadcast
    build/cleanup churn).  What actually cleared the 100× ratio was
    AQE-on at the ≥768 MiB tier plus a right-sized driver heap — see
    session.tune_for_data_size and bench.py.

    Three measured hot-path choices (30×/100× probes, best-of-3):
    - money sums ride as integer cents (exact — see functions.exact):
      the pre-agg has |customer| groups, where SUM(DECIMAL(28,2))'s
      Decimal-object adds cost ~15% of the whole query vs long adds;
    - the pre-agg repartitions on the group key FIRST, so the
      exchange moves raw (key, cents) pairs and the partial+final
      aggregate pair runs FUSED in one stage on key-local data:
      with ~3 orders per customer scattered across input partitions,
      a pre-exchange partial map reduces almost nothing — every
      input row still crosses the exchange — while paying
      |customer|-sized hash-map build/drain per task. Post-exchange,
      the partial map achieves full reduction and the final dedup is
      trivial (2.57 s → 1.92 s at 100×);
    - the customer join is hinted shuffle_hash: both sides are
      |customer|-sized so neither should broadcast, and sort-merge
      would pay two full sorts that hash probing skips (~10%)."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    pre = (
        o.select("o_custkey", cents("o_totalprice").alias("cts"))
        .repartition(F.col("o_custkey"))
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders_p"), F.sum("cts").alias("rev_p"))
    )
    return (
        pre.join(c.hint("shuffle_hash"), pre.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum("n_orders_p").alias("n_orders"),
            (F.sum("rev_p") / 100.0).cast("double").alias("revenue"),
        )
    )


_B9_ORACLE = f"""
WITH stats AS (
  SELECT o_custkey, COUNT(*) AS n_orders, {sql_dsum("o_totalprice")} AS spend
  FROM orders WHERE o_orderstatus = 'O' GROUP BY o_custkey
),
segment AS (
  SELECT c_custkey, c_name FROM customer WHERE c_mktsegment = 'BUILDING'
)
SELECT c_custkey, c_name, o_custkey, COALESCE(n_orders, 0) AS n_orders, spend
FROM segment FULL OUTER JOIN stats ON c_custkey = o_custkey
"""


@register("b_join_outer", oracle=_B9_ORACLE, tags=("join", "outer"))
def b_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join producing nulls on both sides (left/right are the
    degenerate one-sided cases of the same exchange+merge plan)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    stats = (
        o.where(F.col("o_orderstatus") == "O")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders_raw"), dsum("o_totalprice").alias("spend"))
    )
    segment = c.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey", "c_name")
    return segment.join(stats, segment.c_custkey == stats.o_custkey, "full_outer").select(
        "c_custkey",
        "c_name",
        "o_custkey",
        F.coalesce(F.col("n_orders_raw"), F.lit(0)).alias("n_orders"),
        "spend",
    )


_B10_ORACLE = """
SELECT c_custkey, 'has_urgent' AS tag FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
UNION ALL
SELECT c_custkey, 'no_orders' AS tag FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


@register("b_join_semi_anti", oracle=_B10_ORACLE, tags=("join", "semi"))
def b_join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI (EXISTS) and LEFT ANTI (NOT EXISTS) joins."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    urgent = o.where(F.col("o_orderpriority") == "1-URGENT")
    semi = (
        c.join(urgent, c.c_custkey == urgent.o_custkey, "left_semi")
        .select("c_custkey")
        .withColumn("tag", F.lit("has_urgent"))
    )
    anti = (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey")
        .withColumn("tag", F.lit("no_orders"))
    )
    return semi.unionByName(anti)


_B11_ORACLE = """
SELECT r_name, n_name FROM region CROSS JOIN nation
"""


@register("b_join_cross", oracle=_B11_ORACLE, tags=("join", "cross"))
def b_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cross join (bounded: 5 × 25 rows)."""
    r = load_table(spark, sf_dir, "region").select("r_name")
    n = load_table(spark, sf_dir, "nation").select("n_name")
    return r.crossJoin(n)


_B12_ORACLE = f"""
SELECT p_brand, COUNT(*) AS n_items, {sql_dsum("l_extendedprice")} AS gross
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_type LIKE 'PROMO%'
GROUP BY p_brand
"""


@register("b_join_broadcast", oracle=_B12_ORACLE, tags=("join", "broadcast"))
def b_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast-hash join: fact side never shuffles — the
    canonical dimension-join plan at any scale where part fits in RAM."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_type").like("PROMO%"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_items"), dsum("l_extendedprice").alias("gross"))
    )


# Value bands for the theta/range join — a literal dimension table.
_BANDS = [
    ("tiny", 0.0, 2.0),
    ("small", 2.0, 5.0),
    ("mid", 5.0, 10.0),
    ("large", 10.0, 15.0),
    ("huge", 15.0, 1e9),
]

_B13_ORACLE = """
SELECT b.band, COUNT(*) AS n_events, COUNT(DISTINCT e.user_id) AS n_users
FROM events e
JOIN (VALUES ('tiny',0.0,2.0),('small',2.0,5.0),('mid',5.0,10.0),
             ('large',10.0,15.0),('huge',15.0,1e9)) AS b(band, lo, hi)
  ON e.value >= b.lo AND e.value < b.hi
GROUP BY b.band
"""


@register("b_join_range", oracle=_B13_ORACLE, tags=("join", "theta"))
def b_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta (non-equi) join against a broadcast band table →
    BroadcastNestedLoopJoin, which is the right plan: the streamed fact
    side scans once, bands live on every executor."""
    e = load_table(spark, sf_dir, "events")
    bands = spark.createDataFrame(_BANDS, schema="band string, lo double, hi double")
    cond = (e.value >= bands.lo) & (e.value < bands.hi)
    return (
        e.join(F.broadcast(bands), cond)
        .groupBy("band")
        .agg(F.count("*").alias("n_events"), F.countDistinct("user_id").alias("n_users"))
    )


_B14_ORACLE = """
SELECT e.user_id, COUNT(*) AS n_nearby
FROM events e
JOIN events p
  ON e.user_id = p.user_id
 AND p.event_type = 'purchase'
 AND e.event_id <> p.event_id
 AND e.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts + INTERVAL 1 HOUR
GROUP BY e.user_id
"""


@register("b_join_interval", oracle=_B14_ORACLE, tags=("join", "interval"))
def b_join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal overlap join anchored on an equi-key: shuffles on
    user_id (equi) and applies the ±1h interval as a residual range
    predicate — no nested loop over the full fact table."""
    e = load_table(spark, sf_dir, "events").alias("e")
    p = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .alias("p")
    )
    cond = (
        (F.col("e.user_id") == F.col("p.user_id"))
        & (F.col("e.event_id") != F.col("p.event_id"))
        & (F.col("e.ts") >= F.col("p.ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("e.ts") <= F.col("p.ts") + F.expr("INTERVAL 1 HOUR"))
    )
    return e.join(p, cond).groupBy(F.col("e.user_id").alias("user_id")).agg(
        F.count("*").alias("n_nearby")
    )


_B15_ORACLE = """
SELECT p.event_id, p.user_id, p.ts, c.ts AS click_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
"""


@register("b_join_asof", oracle=_B15_ORACLE, tags=("join", "asof"))
def b_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the latest click at-or-before it
    by the same user (inner: purchases with no prior click drop out).

    Implementation is the union-timeline construction, the scalable
    form Spark lacks natively: tag both sides, union, and run
    ``last(click_ts, ignorenulls)`` over a per-user ordered window.
    One shuffle + one sort per user partition — O(n log n), no
    pairwise O(n·m) blowup, matching DuckDB ASOF JOIN semantics
    (ties: p.ts >= c.ts, so an equal-timestamp click matches — the
    side ordering puts clicks before purchases at the same ts).
    """
    e = load_table(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.lit(0).alias("side"), F.lit(None).cast("long").alias("event_id")
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(1).alias("side"), "event_id"
    )
    timeline = clicks.unionByName(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    click_ts = F.last(F.when(F.col("side") == 0, F.col("ts")), ignorenulls=True).over(w)
    return (
        timeline.withColumn("click_ts", click_ts)
        .where((F.col("side") == 1) & F.col("click_ts").isNotNull())
        .select("event_id", "user_id", "ts", "click_ts")
    )


# C82 — NEAREST-event join: each click pairs with the temporally
# closest purchase by the same user, either direction; ties prefer
# the earlier purchase, then the smaller purchase_id.  The backward
# as-of join (b_join_asof) is the one-sided case; nearest needs both
# candidates.  Scale shape: the same union-timeline construction —
# one per-user sort each direction, never a pairwise click×purchase
# blowup (the nearest purchase is by definition either the latest
# ≤-click or the earliest ≥-click purchase, so two windowed
# candidates suffice).  The DuckDB oracle IS the pairwise form —
# fine at oracle SF, and exactly the blowup this operator avoids.
_NEAREST_ORACLE = """
WITH c AS (SELECT user_id, event_id AS cid, ts AS cts FROM events WHERE event_type = 'click'),
p AS (SELECT user_id, event_id AS pid, ts AS pts FROM events WHERE event_type = 'purchase'),
ranked AS (
  SELECT c.user_id, c.cid AS click_id, c.cts AS click_ts,
         p.pid AS purchase_id, p.pts AS purchase_ts,
         ABS(epoch_us(p.pts) - epoch_us(c.cts)) AS diff_us,
         ROW_NUMBER() OVER (
           PARTITION BY c.cid
           ORDER BY ABS(epoch_us(p.pts) - epoch_us(c.cts)), p.pts, p.pid
         ) AS rn
  FROM c JOIN p ON c.user_id = p.user_id
)
SELECT user_id, click_id, click_ts, purchase_id, purchase_ts, diff_us
FROM ranked WHERE rn = 1
"""


@register("b_join_nearest", oracle=_NEAREST_ORACLE, tags=("join", "asof", "nearest"))
def b_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C82: nearest-neighbor time join via two union-timeline passes
    (backward candidate + forward candidate), then a deterministic
    pick: smaller |Δt| wins, ties to the earlier purchase.  Sort-key
    construction: purchases order before clicks at equal ts (kind 0 <
    1) so a same-microsecond purchase is eligible both directions,
    and pid rides DESC so last() lands on the SMALLEST pid among
    equal-ts candidates — matching the oracle's (diff, pts, pid)
    tie-break exactly."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(1).alias("kind"),
        F.col("event_id").alias("cid"),
        F.lit(None).cast("bigint").alias("pid"),
        F.lit(None).cast("timestamp").alias("pts"),
    )
    purch = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(0).alias("kind"),
        F.lit(None).cast("bigint").alias("cid"),
        F.col("event_id").alias("pid"),
        F.col("ts").alias("pts"),
    )
    tl = clicks.unionByName(purch)
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy(F.col("t").asc(), F.col("kind").asc(), F.col("pid").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("user_id")
        .orderBy(F.col("t").desc(), F.col("kind").asc(), F.col("pid").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cand = tl.select(
        "user_id",
        "kind",
        "cid",
        F.col("t").alias("cts"),
        F.last("pid", ignorenulls=True).over(w_prev).alias("prev_pid"),
        F.last("pts", ignorenulls=True).over(w_prev).alias("prev_pts"),
        F.last("pid", ignorenulls=True).over(w_next).alias("next_pid"),
        F.last("pts", ignorenulls=True).over(w_next).alias("next_pts"),
    ).where(F.col("kind") == 1)
    prev_diff = F.unix_micros("cts") - F.unix_micros("prev_pts")
    next_diff = F.unix_micros("next_pts") - F.unix_micros("cts")
    take_prev = F.col("prev_pid").isNotNull() & (
        F.col("next_pid").isNull() | (prev_diff <= next_diff)
    )
    return (
        cand.where(F.col("prev_pid").isNotNull() | F.col("next_pid").isNotNull())
        .select(
            "user_id",
            F.col("cid").alias("click_id"),
            F.col("cts").alias("click_ts"),
            F.when(take_prev, F.col("prev_pid")).otherwise(F.col("next_pid")).alias("purchase_id"),
            F.when(take_prev, F.col("prev_pts")).otherwise(F.col("next_pts")).alias("purchase_ts"),
            F.when(take_prev, prev_diff).otherwise(next_diff).alias("diff_us"),
        )
    )


# --- USING-join key coalescing ---------------------------------------

_USING_SQL = """
WITH c AS (
  SELECT c_nationkey AS nationkey, COUNT(*) AS n_cust
  FROM customer WHERE c_custkey < 100 GROUP BY c_nationkey
),
s AS (
  SELECT s_nationkey AS nationkey, COUNT(*) AS n_supp
  FROM supplier WHERE s_suppkey % 7 = 0 GROUP BY s_nationkey
)
SELECT nationkey, n_cust, n_supp
FROM c FULL JOIN s USING (nationkey)
"""


@register("b_join_using", oracle=_USING_SQL, tags=("join", "using", "outer"))
def b_join_using(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C125: FULL OUTER JOIN ... USING — the ANSI form whose output
    carries ONE coalesced key column (COALESCE(left.key, right.key)),
    the semantics NATURAL JOIN desugars to. The two side filters are
    chosen so each side holds nations the other lacks, making the
    coalescing observable in both directions (a plain join would
    return NULL keys). Runs as identical SQL text on both engines;
    Catalyst plans the two small aggregates then a full-outer hash
    join — at scale both sides pre-aggregate to nation granularity
    (25 rows) before the join, so the outer join itself is trivial
    regardless of corpus size."""
    register_views(spark, sf_dir, ("customer", "supplier"))
    return spark.sql(_USING_SQL)


# --- Null-safe equality join (C231) ----------------------------------------------------

# Joining on a NULLABLE key with `=` silently drops every NULL row
# (NULL = NULL is NULL) — the classic missing-rows bug.  The
# null-safe operator (<=> in Spark, IS NOT DISTINCT FROM in
# DuckDB/ANSI) matches NULL to NULL as one group.  The key derives a
# nullable bucket (NULLIF of a modulus) on both sides so exactly one
# bucket is NULL, and counts pair cardinalities per bucket — the
# NULL row's presence IS the contract.
_NULL_SAFE_ORACLE = """
WITH a AS (
  SELECT NULLIF(c_nationkey % 5, 0) AS k, COUNT(*) AS n_a
  FROM customer GROUP BY 1
),
b AS (
  SELECT NULLIF(s_nationkey % 5, 0) AS k, COUNT(*) AS n_b
  FROM supplier GROUP BY 1
)
SELECT a.k, CAST(a.n_a AS BIGINT) AS n_a, CAST(b.n_b AS BIGINT) AS n_b,
       CAST(a.n_a * b.n_b AS BIGINT) AS n_pairs
FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
ORDER BY a.k NULLS FIRST
"""


@register("b_join_null_safe", oracle=_NULL_SAFE_ORACLE, tags=("join", "nullsafe"))
def b_join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C231: null-safe equality join — Spark's <=> / ANSI IS NOT
    DISTINCT FROM.  A plain `=` join on the derived nullable bucket
    would silently drop the NULL group (NULL = NULL -> NULL -> no
    match); the null-safe form keeps it, and this key's hash fails if
    the NULL row goes missing.

    Scale shape: <=> compiles to an EqualNullSafe hash-join key (the
    null bucket hashes like any value — still a shuffle-hash/broadcast
    join, never a nested loop; pre-aggregated here so the join is
    5x5)."""
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    a = c.groupBy(
        F.nullif((F.col("c_nationkey") % 5).cast("bigint"), F.lit(0)).alias("k")
    ).agg(F.count("*").cast("bigint").alias("n_a"))
    b = s.groupBy(
        F.nullif((F.col("s_nationkey") % 5).cast("bigint"), F.lit(0)).alias("kb")
    ).agg(F.count("*").cast("bigint").alias("n_b"))
    return (
        a.join(b, F.col("k").eqNullSafe(F.col("kb")))
        .select("k", "n_a", "n_b", (F.col("n_a") * F.col("n_b")).cast("bigint").alias("n_pairs"))
    )


# --- As-of join with staleness tolerance (C249) --------------------------------------------

# The feature-store form of the as-of join: the latest click
# at-or-before each purchase COUNTS ONLY IF it is fresh enough
# (within 1 hour) — a stale feature is worse than a missing one, so
# the match nulls out rather than silently shipping old state.  LEFT
# semantics: every purchase row survives.  Same union-timeline
# construction as b_join_asof (one per-user sort, never pairwise);
# the tolerance is a residual predicate on the matched timestamp.
_ASOF_TOL_US = 3_600_000_000

_ASOF_TOL_ORACLE = f"""
SELECT p.event_id, p.user_id, epoch_us(p.ts) AS t_p,
       CASE WHEN epoch_us(p.ts) - epoch_us(c.ts) <= {_ASOF_TOL_US}
            THEN epoch_us(c.ts) END AS t_click
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
"""


@register("b_join_asof_tolerance", oracle=_ASOF_TOL_ORACLE, tags=("join", "asof", "tolerance"))
def b_join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C249: as-of join with a 1-hour staleness tolerance — the
    feature-store lookup rule ("join the latest feature value, but
    never one older than the SLA").  LEFT semantics keep every
    purchase; a match older than the tolerance NULLS OUT instead of
    shipping stale state.  The oracle is DuckDB's native ASOF LEFT
    JOIN plus the tolerance predicate; the Spark side is the
    b_join_asof union-timeline (one user-keyed sort, no pairwise
    blowup) with the tolerance as a post-window null-out.

    Scale shape: identical to b_join_asof — union, one window per
    user partition, map-side tolerance check."""
    e = load_table(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.lit(0).alias("side"), F.lit(None).cast("long").alias("event_id")
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(1).alias("side"), "event_id"
    )
    timeline = clicks.unionByName(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    click_ts = F.last(F.when(F.col("side") == 0, F.col("ts")), ignorenulls=True).over(w)
    t_p = F.unix_micros("ts")
    t_c = F.unix_micros("click_ts")
    return (
        timeline.withColumn("click_ts", click_ts)
        .where(F.col("side") == 1)
        .select(
            "event_id",
            "user_id",
            t_p.alias("t_p"),
            F.when(t_p - t_c <= _ASOF_TOL_US, t_c).alias("t_click"),
        )
    )

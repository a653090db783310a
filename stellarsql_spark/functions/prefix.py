"""Scalable global ordered prefix aggregation (SURVEY.md §4 "windows
at scale").

A `Window.orderBy(...)` with no PARTITION BY forces every row through
ONE task — fine for |days|- or |groups|-sized intermediates, fatal for
data-sized inputs (Spark even warns: "No Partition Defined for Window
operation").  Several operators document the standard fix ("range-
partition the running sum — two passes, same values"); this module
SHIPS it, so data-sized global running sums / ranks stop being a
narrated mitigation:

  pass 1  range-repartition on the TOTAL order (caller must include a
          unique tiebreak column — with a total order, no key ever
          straddles a range boundary, so partition placement cannot
          change any prefix), then compute ordinary intra-partition
          running aggregates with a partition-local window.
  pass 2  per-partition totals (npart rows, one tiny agg); the
          exclusive prefix over THEM — one window over npart rows —
          is each partition's offset, broadcast-joined back and
          added.

Values are bit-identical to the single-partition window for ANY total
order, because a prefix over a totally ordered sequence is invariant
to where the sequence is cut.  Cost: one range exchange (same as the
sort the single-partition window needs anyway) + an npart-row agg +
a broadcast join — but the running work itself is npart-way parallel
and no task ever materializes more than ~1/npart of the rows, which
is the difference between "works at sf0.1" and "works at 100 TB".
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__prefix_pid"
_LRN = "__prefix_lrn"


def ordered_running(
    df: DataFrame,
    order: list[Column],
    sums: dict[str, Column],
    *,
    npart: int = 32,
    row_number_as: str | None = None,
    total_count_as: str | None = None,
    reliable: bool = False,
) -> DataFrame:
    """Append inclusive global running SUM column(s) (and optionally a
    global ROW_NUMBER) over a total order, without a single-partition
    window.

    ``order``   total-order sort expressions (include a unique
                tiebreak, or prefixes at ties are underdetermined in
                ANY engine).  Relaxation: duplicate order-keys are
                fine when the duplicated rows are FULLY identical —
                the range partitioner never splits equal keys across
                partitions, and permuting identical rows permutes
                identical prefix contributions, so the (row, prefix)
                multiset is invariant (the sweep-line delta stream is
                the canonical case).
    ``sums``    {out_col: value_expr} — each out_col becomes the
                inclusive running sum of value_expr in ``order``.
    ``row_number_as``  optional column name for the 1-based global
                row number in ``order``.

    ``total_count_as``  optional column name for the broadcast grand
                row count (computed from the already-materialized
                per-partition totals — npart rows — NOT by re-scanning
                df's lineage; ordered_ntile uses this to avoid a
                second input pass).

    ``reliable``  pin the partitioned frame with a RELIABLE
                checkpoint (cluster-FS, survives executor loss)
                instead of localCheckpoint (executor-local blocks,
                loss is a loud job failure).  The right setting for
                multi-tenant clusters where executor churn is routine;
                local is the right cost point for a single-app
                deployment.  Requires a checkpoint dir — if the
                SparkContext has none set, one is created under the
                engine scratch root (on a real cluster, set it to a
                durable DFS path first via
                ``sc.setCheckpointDir('hdfs://...')``).

    Returns df's columns + the requested prefix columns.  Row order of
    the RESULT is unspecified (as with any DataFrame); the prefix
    VALUES are exactly those of the equivalent global window.
    """
    reserved = {_PID, _LRN, "__rn_off", "__cnt"}
    reserved |= {f"__l_{n}" for n in sums} | {f"__t_{n}" for n in sums}
    reserved |= {f"__off_{n}" for n in sums}
    requested_list = list(sums)
    if row_number_as:
        requested_list.append(row_number_as)
    if total_count_as:
        requested_list.append(total_count_as)
    if len(requested_list) != len(set(requested_list)):
        # duplicates AMONG the requested names would collapse in a set
        # and then emit an ambiguous duplicate column (r10 ADVICE)
        dupes = sorted({n for n in requested_list if requested_list.count(n) > 1})
        raise ValueError(
            f"ordered_running: duplicate requested output name(s): {dupes}"
        )
    requested = set(requested_list)
    clash = (requested | reserved) & set(df.columns)
    clash |= requested & reserved
    if clash:
        raise ValueError(
            "ordered_running: output/internal column name(s) collide "
            f"with input columns or reserved internals: {sorted(clash)}"
        )
    part = df.repartitionByRange(npart, *order)
    with_pid = part.withColumn(_PID, F.spark_partition_id())
    w_rank = Window.partitionBy(_PID).orderBy(*order)
    w_run = w_rank.rowsBetween(Window.unboundedPreceding, 0)
    # The LINEAGE TRUNCATION here is load-bearing, not an optimization:
    # `local` feeds two plan branches (the rows themselves and the
    # per-partition totals the offsets come from).  Range-exchange
    # boundary sampling is not guaranteed stable across independent
    # recomputations, and spark_partition_id() is explicitly
    # nondeterministic — if each branch recomputed `local` itself, a
    # row near a boundary could land in partition k in one branch and
    # k+1 in the other, and its prefix would silently shift by the
    # straddling rows (observed on b_ev_auc at sf0.01 when the frame
    # was unpinned).  A plain persist() pins one assignment only while
    # the cached blocks survive; on block LOSS (executor failure,
    # eviction under a stage retry) Spark transparently recomputes
    # through the range exchange with FRESH boundary sampling — the
    # silent-drift failure mode again.  localCheckpoint() instead cuts
    # the lineage at the materialized blocks (MEMORY_AND_DISK): both
    # branches read one pinned assignment, and losing a block is a
    # LOUD job failure ("Checkpoint block not found"), never a silent
    # value shift.  (For multi-tenant clusters where executor loss is
    # routine, reliable checkpoint() to the cluster FS is the drop-in
    # upgrade; local checkpoint is the right cost point for this
    # engine's single-app deployment.)  eager=False defers
    # materialization to the first action — the broadcast-offsets job
    # below — so no extra job is spawned.  Spark's ContextCleaner
    # releases checkpoint blocks once the returned DataFrame is
    # garbage-collected, so repeated invocations (bench trials, gate
    # reruns) do not accumulate live storage unboundedly.
    staged = with_pid.select(
        "*",
        F.row_number().over(w_rank).alias(_LRN),
        *[F.sum(v).over(w_run).alias(f"__l_{name}") for name, v in sums.items()],
    )
    if reliable:
        # reliable checkpoint = same lineage cut, but the pinned blocks
        # live on the (cluster) filesystem and survive executor loss —
        # the graduation of the multi-tenant note above into an option
        # (r10 VERDICT #6).  eager=False keeps the no-extra-job
        # property; RDD checkpointing materializes on the first action
        # either way.
        sc = df.sparkSession.sparkContext
        if sc._jsc.sc().getCheckpointDir().isEmpty():
            import os

            from stellarsql_spark.sources.io import SCRATCH_ROOT

            ckpt = os.path.join(SCRATCH_ROOT, "prefix_ckpt")
            os.makedirs(ckpt, exist_ok=True)
            sc.setCheckpointDir(ckpt)
        local = staged.checkpoint(eager=False)
    else:
        local = staged.localCheckpoint(eager=False)
    # npart-row pass 2: each partition's row count and value total
    # (F.sum of the value expr, NOT max of the running column — a
    # signed series' running sum is not monotone), then the EXCLUSIVE
    # prefix over those totals ordered by partition id.  Range
    # partitions are handed out in key order, so ascending _PID IS the
    # global order.  This one window runs over npart rows — the
    # justified single-partition window — and computing it in Spark
    # (not on the driver) keeps exact carrier types (BIGINT and
    # DECIMAL(38,0) alike) end to end.
    totals = local.groupBy(_PID).agg(
        F.count(F.lit(1)).alias("__cnt"),
        *[F.sum(v).alias(f"__t_{name}") for name, v in sums.items()],
    )
    w_off = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    off_df = totals.select(
        _PID,
        F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).alias("__rn_off"),
        *[F.sum(f"__t_{name}").over(w_off).alias(f"__off_{name}") for name in sums],
    )
    joined = local.join(F.broadcast(off_df), _PID)
    if total_count_as:
        # grand total from the npart-row totals frame — local is
        # already checkpointed, so this never re-reads df's lineage
        grand = totals.agg(
            F.coalesce(F.sum("__cnt"), F.lit(0)).cast("bigint").alias(total_count_as)
        )
        joined = joined.join(F.broadcast(grand))
    out_cols = [c for c in df.columns]
    proj = [F.col(c) for c in out_cols]
    for name in sums:
        proj.append(
            (
                F.col(f"__l_{name}")
                + F.coalesce(F.col(f"__off_{name}"), F.lit(0))
            ).alias(name)
        )
    if row_number_as:
        proj.append(
            (F.col(_LRN) + F.col("__rn_off")).cast("bigint").alias(row_number_as)
        )
    if total_count_as:
        proj.append(F.col(total_count_as))
    return joined.select(*proj)


def ordered_ntile(
    df: DataFrame,
    order: list[Column],
    k: int,
    out: str,
    *,
    npart: int = 32,
    reliable: bool = False,
) -> DataFrame:
    """NTILE(k) over a total order without a single-partition window.

    NTILE is pure rank arithmetic: with n rows, q = n div k and
    r = n mod k, the first r buckets take q+1 rows and the rest take
    q (the SQL-standard rule both Spark and DuckDB implement).  So a
    scalable global rank (ordered_running's two-pass row_number) plus
    a broadcast 1-row count reproduces it exactly:

        bucket(rn) = ceil(rn / (q+1))                  if rn <= r*(q+1)
                     r + ceil((rn - r*(q+1)) / q)      otherwise

    The q = 0 edge (n < k) takes the first branch for every row.
    ``order`` must be a total order (NTILE itself is underdetermined
    at ties otherwise).

    n comes from ordered_running's own per-partition totals
    (total_count_as), NOT a separate df.agg(count) — a second agg
    would re-execute df's full lineage and double the input scan."""
    j = ordered_running(
        df,
        order=order,
        sums={},
        npart=npart,
        row_number_as="__ntile_rn",
        total_count_as="__ntile_n",
        reliable=reliable,
    )
    # exact integer arithmetic throughout (div, not double /): bucket
    # boundaries must never ride a float truncation
    bucket = F.expr(
        f"CAST(CASE WHEN __ntile_rn <= (__ntile_n % {k}) * (__ntile_n div {k} + 1) "
        f"THEN (__ntile_rn + __ntile_n div {k}) div (__ntile_n div {k} + 1) "
        f"ELSE __ntile_n % {k} + (__ntile_rn - (__ntile_n % {k}) * (__ntile_n div {k} + 1) "
        f"+ __ntile_n div {k} - 1) div (__ntile_n div {k}) END AS INT)"
    )
    return j.select(*[F.col(c) for c in df.columns], bucket.alias(out))

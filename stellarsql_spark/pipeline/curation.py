"""Training-corpus curation operators (SURVEY.md §2 C-curation
family): repetition profiling, benchmark-contamination detection, and
deterministic stratified sampling — the filters a large-scale LLM
data pipeline runs between raw crawl and training shards (Gopher /
C4-style corpus hygiene).

Reference parity note: /root/reference is an empty checkout (SURVEY.md
§0); these follow the published data-curation recipes (Rae et al.
Gopher §A1.1 repetition filters, benchmark n-gram decontamination),
re-expressed as Spark relational plans.

Scale shape: everything is split/explode/groupBy with map-side
partial aggregation — no self-joins over the corpus. Contamination
joins the corpus's exploded n-grams against a BROADCAST benchmark
gram set (benchmarks are thousands of docs, not terabytes), so the
100 TB side never shuffles; stratified sampling is a stateless
per-row md5 predicate (embarrassingly parallel, reproducible across
engines and runs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stellarsql_spark.catalog import load_table
from stellarsql_spark.registry import register

# --- repetition profile ----------------------------------------------

_REPETITION_ORACLE = """
WITH base AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n_words,
         len(list_distinct(string_split(text, ' '))) AS n_distinct_words
  FROM documents
),
wc AS (
  SELECT doc_id, word, COUNT(*) AS n
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
  GROUP BY 1, 2
),
top AS (
  SELECT doc_id, word AS top_word, n AS top_word_n
  FROM (SELECT doc_id, word, n,
               ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY n DESC, word) AS rn
        FROM wc)
  WHERE rn = 1
),
w AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS word,
         unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
  FROM documents
),
bg AS (
  SELECT a.doc_id, a.word || ' ' || b.word AS g
  FROM w a JOIN w b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
),
bstats AS (
  SELECT doc_id, COUNT(*) AS n_bigrams, COUNT(DISTINCT g) AS n_distinct_bigrams
  FROM bg GROUP BY 1
)
SELECT base.doc_id, n_words, n_distinct_words, top_word, top_word_n,
       1.0 - n_distinct_words / n_words AS dup_word_frac,
       COALESCE(n_distinct_bigrams, 0) AS n_distinct_bigrams,
       CASE WHEN COALESCE(n_bigrams, 0) > 0
            THEN 1.0 - n_distinct_bigrams / n_bigrams
            ELSE CAST(0.0 AS DOUBLE) END AS dup_bigram_frac
FROM base
LEFT JOIN top USING (doc_id)
LEFT JOIN bstats USING (doc_id)
"""


@register("b_llm_repetition", oracle=_REPETITION_ORACLE, tags=("pipeline", "curation", "repetition"))
def b_llm_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition profile per document: duplicate-word
    and duplicate-bigram fractions plus the dominant word (ties broken
    lexicographically). Word/bigram structure is computed array-side
    with JVM higher-order functions; only the dominant-word pick
    explodes, and it re-aggregates on the already-present doc_id key.
    The fractions are single IEEE divisions — engine-identical bits."""
    d = load_table(spark, sf_dir, "documents").withColumn("words", F.split("text", " "))
    base = d.select(
        "doc_id",
        "words",
        F.size("words").alias("n_words"),
        F.size(F.array_distinct("words")).alias("n_distinct_words"),
        # zip_with over two clamped slices is total: a 1-token doc gives
        # two empty slices -> zero bigrams (a sequence(0, size-2) form
        # would DESCEND to [0,-1] and trip ANSI array indexing).
        F.expr(
            "zip_with(slice(words, 1, size(words) - 1), slice(words, 2, size(words) - 1),"
            " (a, b) -> concat(a, ' ', b))"
        ).alias("bigrams"),
    )
    from pyspark.sql import Window

    wc = (
        d.select("doc_id", F.explode("words").alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("n"))
    )
    rn = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(F.col("n").desc(), "word")
    )
    top = (
        wc.withColumn("rn", rn)
        .where(F.col("rn") == 1)
        .select("doc_id", F.col("word").alias("top_word"), F.col("n").alias("top_word_n"))
    )
    n_bigrams = F.size("bigrams")
    n_dbg = F.size(F.array_distinct("bigrams"))
    return (
        base.join(top, "doc_id", "left")
        .select(
            "doc_id",
            "n_words",
            "n_distinct_words",
            "top_word",
            "top_word_n",
            (F.lit(1.0) - F.col("n_distinct_words") / F.col("n_words")).alias("dup_word_frac"),
            F.greatest(n_dbg, F.lit(0)).alias("n_distinct_bigrams"),
            F.when(n_bigrams > 0, F.lit(1.0) - n_dbg / n_bigrams)
            .otherwise(F.lit(0.0))
            .alias("dup_bigram_frac"),
        )
    )


# --- benchmark contamination -----------------------------------------

_NGRAM = 4  # word n-gram length for the decontamination check
_BENCH_MOD = 10  # every 10th doc stands in for the benchmark set

_CONTAMINATION_ORACLE = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
sh AS (
  SELECT DISTINCT doc_id, md5(array_to_string(words[i:i+{_NGRAM - 1}], ' ')) AS g
  FROM w, unnest(range(1, len(words) - {_NGRAM - 2})) t(i)
),
bench AS (SELECT DISTINCT g FROM sh WHERE doc_id % {_BENCH_MOD} = 0),
gst AS (SELECT doc_id, COUNT(*) AS n_grams FROM sh GROUP BY 1)
SELECT s.doc_id, gst.n_grams, COUNT(*) AS n_shared,
       COUNT(*) / gst.n_grams AS contam_frac
FROM sh s JOIN bench USING (g) JOIN gst ON s.doc_id = gst.doc_id
WHERE s.doc_id % {_BENCH_MOD} != 0
GROUP BY s.doc_id, gst.n_grams
"""


@register("b_llm_contamination", oracle=_CONTAMINATION_ORACLE, tags=("pipeline", "curation", "contamination"))
def b_llm_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing any
    4-word shingle with the benchmark set (stand-in: every 10th doc).
    Shingles are md5-hashed JVM-side (transform + slice — no Python),
    the benchmark gram set is BROADCAST (benchmarks are small by
    construction), and the corpus side stays a map-only explode +
    re-aggregate on doc_id — the 100 TB side never shuffles for the
    membership test."""
    d = load_table(spark, sf_dir, "documents").withColumn("words", F.split("text", " "))
    grams = d.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                # CASE keeps the transform total: short docs get an empty
                # gram list instead of a descending sequence whose
                # slice(words, 0, ..) throws under ANSI.
                F.expr(
                    f"CASE WHEN size(words) >= {_NGRAM} THEN"
                    f" transform(sequence(1, size(words) - {_NGRAM - 1}),"
                    f" i -> md5(array_join(slice(words, i, {_NGRAM}), ' ')))"
                    f" ELSE CAST(array() AS array<string>) END"
                )
            )
        ).alias("g"),
    )
    bench = (
        grams.where(F.col("doc_id") % _BENCH_MOD == 0).select("g").distinct()
    )
    gst = grams.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    return (
        grams.where(F.col("doc_id") % _BENCH_MOD != 0)
        .join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared"))
        .join(gst, "doc_id")
        .select(
            "doc_id",
            "n_grams",
            "n_shared",
            (F.col("n_shared") / F.col("n_grams")).alias("contam_frac"),
        )
    )


# --- deterministic stratified sampling -------------------------------

_STRATIFIED_ORACLE = """
SELECT doc_id, lang, source, n_chars,
       COUNT(*) OVER (PARTITION BY lang) AS n_sampled_in_lang
FROM documents
WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0', '1')
"""


@register("b_llm_stratified", oracle=_STRATIFIED_ORACLE, tags=("pipeline", "curation", "sampling"))
def b_llm_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~12.5% sample via an md5(doc_id) digest
    predicate, annotated with its per-language stratum size. Unlike
    engine RNG sampling (b_sample_seeded), the digest predicate is
    reproducible across engines, runs, and partitionings — the
    property a training-data pipeline needs to re-derive the exact
    same held-out split years later. Stateless per-row filter:
    map-only over 100 TB; the window count shuffles only the
    already-sampled rows."""
    d = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    sampled = d.where(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).isin("0", "1")
    )
    return sampled.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.count("*").over(Window.partitionBy("lang")).alias("n_sampled_in_lang"),
    )


# --- the curation funnel (composition key) ---------------------------
#
# C92: the end-to-end pre-training filter chain every corpus runs —
# language ID → quality gate → exact dedup → benchmark
# decontamination — with the KEPT count after each cumulative stage.
# Every stage reuses the exact rule its standalone key tests
# (b_llm_langid, b_llm_quality, b_llm_dedup_exact,
# b_llm_contamination), so this key certifies the COMPOSITION:
# stage predicates computed per-doc in one pass (map-side), dedup
# canonicalization and gram membership as the same bounded joins the
# standalone keys use, then a single 5-way conditional aggregate.

_FUNNEL_ORACLE = f"""
WITH base AS (
  SELECT doc_id, text,
         len(list_filter(string_split(text, ' '),
             w -> list_contains(['the', 'a', 'and', 'of', 'to', 'in', 'is', 'on'], w))) AS sw_hits,
         len(string_split(text, ' ')) AS n_tokens,
         len(list_distinct(string_split(text, ' '))) AS n_unique,
         md5(text) AS h
  FROM documents
),
flags AS (
  SELECT doc_id, h,
         CAST(sw_hits AS DOUBLE) / n_tokens >= 0.02 AS is_en,
         (n_tokens >= 30 AND CAST(n_unique AS DOUBLE) / n_tokens >= 0.3) AS is_q
  FROM base
),
canon AS (
  SELECT h, MIN(doc_id) AS keeper FROM flags WHERE is_en AND is_q GROUP BY h
),
w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
sh AS (
  SELECT DISTINCT doc_id, md5(array_to_string(words[i:i+{_NGRAM - 1}], ' ')) AS g
  FROM w, unnest(range(1, len(words) - {_NGRAM - 2})) t(i)
),
bench AS (SELECT DISTINCT g FROM sh WHERE doc_id % {_BENCH_MOD} = 0),
contam AS (SELECT DISTINCT s.doc_id FROM sh s JOIN bench USING (g)),
scored AS (
  SELECT f.doc_id, f.is_en, f.is_q,
         (c.keeper = f.doc_id) AS is_canon,
         (f.doc_id % {_BENCH_MOD} != 0 AND ct.doc_id IS NULL) AS is_clean
  FROM flags f
  LEFT JOIN canon c ON f.h = c.h
  LEFT JOIN contam ct ON f.doc_id = ct.doc_id
),
agg AS (
  SELECT COUNT(*) AS s0,
         COUNT(*) FILTER (WHERE is_en) AS s1,
         COUNT(*) FILTER (WHERE is_en AND is_q) AS s2,
         COUNT(*) FILTER (WHERE is_en AND is_q AND is_canon) AS s3,
         COUNT(*) FILTER (WHERE is_en AND is_q AND is_canon AND is_clean) AS s4
  FROM scored
)
SELECT 0 AS stage, 'total' AS stage_name, s0 AS n_kept FROM agg
UNION ALL SELECT 1, 'langid', s1 FROM agg
UNION ALL SELECT 2, 'quality', s2 FROM agg
UNION ALL SELECT 3, 'exact_dedup', s3 FROM agg
UNION ALL SELECT 4, 'decontaminated', s4 FROM agg
"""


@register("b_llm_curation_funnel", oracle=_FUNNEL_ORACLE, tags=("pipeline", "curation", "funnel", "composition"))
def b_llm_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C92: cumulative kept-count after each curation stage (see the
    module comment).  The decontamination stage drops benchmark
    stand-in docs themselves AND anything sharing a 4-gram with them
    — both are excluded from a training corpus."""
    from stellarsql_spark.pipeline.textstats import _STOPWORDS

    d = load_table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    sw = F.array(*[F.lit(w) for w in _STOPWORDS])
    hits = F.size(F.filter(words, lambda w: F.array_contains(sw, w)))
    n_tokens = F.size(words)
    ttr = F.size(F.array_distinct(words)).cast("double") / n_tokens
    flags = d.select(
        "doc_id",
        F.md5("text").alias("h"),
        (hits.cast("double") / n_tokens >= 0.02).alias("is_en"),
        ((n_tokens >= 30) & (ttr >= 0.3)).alias("is_q"),
    )
    canon = (
        flags.where(F.col("is_en") & F.col("is_q"))
        .groupBy("h")
        .agg(F.min("doc_id").alias("keeper"))
    )
    grams = (
        d.withColumn("words", words)
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    # total form — see b_llm_contamination's gram builder
                    F.expr(
                        f"CASE WHEN size(words) >= {_NGRAM} THEN"
                        f" transform(sequence(1, size(words) - {_NGRAM - 1}),"
                        f" i -> md5(array_join(slice(words, i, {_NGRAM}), ' ')))"
                        f" ELSE CAST(array() AS array<string>) END"
                    )
                )
            ).alias("g"),
        )
    )
    bench = grams.where(F.col("doc_id") % _BENCH_MOD == 0).select("g").distinct()
    contam = (
        grams.join(F.broadcast(bench), "g")
        .select("doc_id")
        .distinct()
        .withColumn("is_contam", F.lit(True))
    )
    scored = (
        flags.join(canon, "h", "left")
        .join(contam, "doc_id", "left")
        .select(
            "is_en",
            "is_q",
            (F.col("keeper") == F.col("doc_id")).alias("is_canon"),
            (
                (F.col("doc_id") % _BENCH_MOD != 0)
                & F.col("is_contam").isNull()
            ).alias("is_clean"),
        )
    )
    cnt = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("bigint")
    agg = scored.agg(
        F.count("*").alias("s0"),
        cnt(F.col("is_en")).alias("s1"),
        cnt(F.col("is_en") & F.col("is_q")).alias("s2"),
        cnt(F.col("is_en") & F.col("is_q") & F.col("is_canon")).alias("s3"),
        cnt(
            F.col("is_en") & F.col("is_q") & F.col("is_canon") & F.col("is_clean")
        ).alias("s4"),
    )
    stages = "stack(5, 0, 'total', s0, 1, 'langid', s1, 2, 'quality', s2, 3, 'exact_dedup', s3, 4, 'decontaminated', s4) AS (stage, stage_name, n_kept)"
    return agg.selectExpr(stages)

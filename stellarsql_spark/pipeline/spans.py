"""Span-level corpus curation (SURVEY.md §2 C-curation widening):
exact substring-window deduplication, hashed-n-gram importance
weighting (DSIR-style domain relevance), and temperature-scaled
domain-mixture budgeting — the three ops that sit between near-dup
filtering and shard writing in a large-scale training-data pipeline.

Reference parity note: /root/reference is an empty checkout
(SURVEY.md §0); these follow the published recipes — Lee et al. 2022
"Deduplicating Training Data Makes Language Models Better" (window-
granularity exact substring dedup), Xie et al. 2023 DSIR (hashed
n-gram importance resampling), and the UniMax/temperature-mixing rule
(w_i ∝ n_i^alpha) used for multi-domain corpus balancing —
re-expressed as Spark relational plans with DuckDB hash oracles.

Scale shape: every op explodes windows/grams map-side and shuffles
16-byte md5 digests or 4096-bucket feature ids, never document text
and never an all-pairs space. The DSIR count tables are bounded by
the feature-bucket count (4096 rows), so both LM-count joins are
broadcasts — the 100 TB corpus side stays shuffle-free for scoring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stellarsql_spark.catalog import load_table
from stellarsql_spark.registry import register

# --- exact substring-window dedup -----------------------------------

# Window/stride of the duplicated-span scan. Lee et al. use 50-token
# windows over the token stream; the synthetic corpus's docs are
# ~40-400 words, so a 16-token window at stride 8 keeps several
# windows per doc while still being long enough that cross-doc
# collisions mean real shared substrings, not chance.
_SUB_W = 16
_SUB_S = 8

_SUBSTRING_ORACLE = f"""
WITH t AS (
  SELECT doc_id, source, string_split(text, ' ') AS l FROM documents
),
wins AS (
  SELECT doc_id, source,
         md5(array_to_string(l[p : p + {_SUB_W - 1}], ' ')) AS h
  FROM (SELECT doc_id, source, l,
               unnest(range(1, greatest(len(l) - {_SUB_W - 1}, 1) + 1, {_SUB_S})) AS p
        FROM t)
),
flags AS (
  SELECT h, COUNT(DISTINCT doc_id) AS nd FROM wins GROUP BY h
)
SELECT source,
       COUNT(DISTINCT doc_id) AS n_docs,
       COUNT(*) AS n_windows,
       CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS dup_windows,
       COUNT(DISTINCT CASE WHEN nd >= 2 THEN h END) AS dup_contents,
       ROUND(CAST(SUM(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) / COUNT(*), 6) AS dup_fraction
FROM wins JOIN flags USING (h)
GROUP BY source
"""


@register("b_llm_substring_dedup", oracle=_SUBSTRING_ORACLE, tags=("pipeline", "dedup", "substring"))
def b_llm_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C120: exact substring dedup at window granularity (Lee et al.
    2022): every doc is scanned with a 16-token window at stride 8,
    each window md5-hashed, and a window is a duplicated SPAN when
    its exact text occurs in ≥2 distinct docs — the op that catches
    shared boilerplate/quotes that whole-doc near-dup (MinHash) and
    doc-level exact dedup both miss. Reported per source: window
    volume, duplicated-window count/fraction, and distinct duplicated
    contents.

    Scale shape: windows explode map-side from the token array (rows
    ≈ n_tokens/stride) and immediately reduce to (doc_id, md5) — the
    shuffle carries 16-byte digests, never window text. One digest-
    keyed aggregation finds cross-doc collisions; the flag join is
    digest-keyed equi-join (AQE handles hot boilerplate digests); the
    per-source rollup shuffles 20 groups. Nothing quadratic, no
    driver-side state — the Lee et al. suffix-array step is replaced
    by the window-hash equi-join, trading sub-window granularity for
    a pure shuffle-join plan that scales linearly.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", "source", F.split("text", " ").alias("l"))
    wins = toks.select(
        "doc_id",
        "source",
        F.explode(
            F.expr(
                f"transform(sequence(1, greatest(size(l) - {_SUB_W - 1}, 1), {_SUB_S}), "
                f"p -> md5(array_join(slice(l, p, {_SUB_W}), ' ')))"
            )
        ).alias("h"),
    )
    flags = wins.groupBy("h").agg(F.count_distinct("doc_id").alias("nd"))
    dup = F.when(F.col("nd") >= 2, 1).otherwise(0)
    return (
        wins.join(flags, "h")
        .groupBy("source")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_windows"),
            F.sum(dup).alias("dup_windows"),
            F.count_distinct(F.when(F.col("nd") >= 2, F.col("h"))).alias("dup_contents"),
            F.round(F.sum(dup) / F.count("*"), 6).alias("dup_fraction"),
        )
    )


# --- DSIR-style hashed-n-gram importance weights ---------------------

_DSIR_B = 4096  # feature buckets (3 hex chars of md5)
_DSIR_TOPK = 50

# hex→int without engine-specific conv(): position of each of the
# first 3 md5 hex chars in the hex alphabet. Spark spells position
# `instr`, DuckDB spells it `strpos`; the arithmetic is identical.
_HEX = "0123456789abcdef"


def _bucket_sql(fn: str, h: str) -> str:
    return (
        f"(({fn}('{_HEX}', substring({h}, 1, 1)) - 1) * 256"
        f" + ({fn}('{_HEX}', substring({h}, 2, 1)) - 1) * 16"
        f" + ({fn}('{_HEX}', substring({h}, 3, 1)) - 1))"
    )


_DSIR_ORACLE = f"""
WITH bg AS (
  SELECT doc_id, source, lang,
         {_bucket_sql("strpos", "md5(w || ' ' || nxt)")} AS b
  FROM (
    SELECT doc_id, source, lang,
           unnest(l[1 : len(l) - 1]) AS w,
           unnest(l[2 : len(l)]) AS nxt
    FROM (SELECT doc_id, source, lang, string_split(text, ' ') AS l FROM documents)
  )
),
tc AS (SELECT b, COUNT(*) AS tn FROM bg WHERE lang = 'en' GROUP BY b),
pc AS (SELECT b, COUNT(*) AS pn FROM bg WHERE lang <> 'en' GROUP BY b),
tot AS (
  SELECT (SELECT COUNT(*) FROM bg WHERE lang = 'en') AS tt,
         (SELECT COUNT(*) FROM bg WHERE lang <> 'en') AS pt
),
scored AS (
  SELECT doc_id,
         COUNT(*) AS n_grams,
         CAST(SUM(CAST(ROUND(1000000 * (
              ln(COALESCE(tn, 0) + 1.0) - ln(tt + {_DSIR_B}.0)
            - ln(COALESCE(pn, 0) + 1.0) + ln(pt + {_DSIR_B}.0)
         )) AS BIGINT)) AS BIGINT) AS score_scaled
  FROM bg LEFT JOIN tc USING (b) LEFT JOIN pc USING (b) CROSS JOIN tot
  WHERE bg.lang <> 'en'
  GROUP BY doc_id
)
SELECT doc_id, n_grams,
       CAST(score_scaled / 1000000.0 AS DOUBLE) AS dsir_score
FROM scored
ORDER BY score_scaled DESC, doc_id
LIMIT {_DSIR_TOPK}
"""


@register("b_llm_dsir", oracle=_DSIR_ORACLE, tags=("pipeline", "curation", "importance"))
def b_llm_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C121: DSIR-style importance weighting (Xie et al. 2023): score
    every out-of-domain doc by the log-likelihood ratio of two hashed
    bigram unigram-LMs — target LM from the in-domain slice (lang =
    'en' here), pool LM from the rest, features hashed into 4096
    buckets via md5, add-one smoothing — and return the top-50 pool
    docs a resampling pass would promote into the training mix.

    Determinism contract: each gram's log-ratio depends only on
    integer bucket counts, is rounded to 1e-6 and summed as BIGINT,
    so per-doc scores are exact integers in both engines regardless
    of partitioning/order; top-k ties break on doc_id.

    Scale shape: gram→bucket hashing is map-side; the two LM count
    tables are bounded at 4096 rows each, so Spark BROADCASTS both
    onto the exploded gram stream (the 100 TB corpus side is never
    shuffled for scoring — tested in tests/test_round6.py); the only
    corpus-keyed shuffle is the per-doc score aggregation, keyed by
    doc_id with ~n_tokens fan-in. The totals ride the same broadcast
    (a 1-row cross join). At cluster scale the count tables would be
    computed once per corpus snapshot and reused across scoring runs.
    """
    d = load_table(spark, sf_dir, "documents")
    # size(l) >= 2 guard: a 1-token doc has no bigram — the oracle's
    # unnest(l[1:len-1]) emits zero rows, and an unguarded sequence(1, 0)
    # would descend in Spark (and l[1] would trip ANSI array-index checks).
    toks = d.select("doc_id", "lang", F.split("text", " ").alias("l")).where(
        F.size("l") >= 2
    )
    bg = toks.select(
        "doc_id",
        "lang",
        F.explode(
            # zip_with over clamped slices is total (1-token doc -> zero
            # bigrams) — the upstream .where alone is not enough, since
            # inferred-filter-from-generate can run this expression on
            # unfiltered rows, where sequence(1, 0) would descend.
            F.expr(
                "zip_with(slice(l, 1, size(l) - 1), slice(l, 2, size(l) - 1),"
                " (a, b) -> concat(a, ' ', b))"
            )
        ).alias("g"),
    ).select("doc_id", "lang", F.expr(_bucket_sql("instr", "md5(g)")).alias("b"))
    tgt = bg.where(F.col("lang") == "en")
    pool = bg.where(F.col("lang") != "en")
    tc = tgt.groupBy("b").agg(F.count("*").alias("tn"))
    pc = pool.groupBy("b").agg(F.count("*").alias("pn"))
    tot = tgt.agg(F.count("*").alias("tt")).crossJoin(pool.agg(F.count("*").alias("pt")))
    term = F.round(
        1_000_000
        * (
            F.log(F.coalesce(F.col("tn"), F.lit(0)) + 1.0)
            - F.log(F.col("tt") + float(_DSIR_B))
            - F.log(F.coalesce(F.col("pn"), F.lit(0)) + 1.0)
            + F.log(F.col("pt") + float(_DSIR_B))
        )
    ).cast("bigint")
    scored = (
        pool.join(F.broadcast(tc), "b", "left")
        .join(F.broadcast(pc), "b", "left")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_grams"), F.sum(term).alias("score_scaled"))
    )
    return (
        scored.orderBy(F.col("score_scaled").desc(), "doc_id")
        .limit(_DSIR_TOPK)
        .select(
            "doc_id",
            "n_grams",
            (F.col("score_scaled") / 1_000_000.0).cast("double").alias("dsir_score"),
        )
    )


# --- temperature-scaled domain mixture budgeting ---------------------

_MIX_ALPHA = 0.3
_MIX_BUDGET = 1_000_000

_MIX_ORACLE = f"""
WITH s AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
tot AS (SELECT CAST(SUM(pow(n_tokens, {_MIX_ALPHA})) AS DOUBLE) AS z FROM s)
SELECT source, n_docs, n_tokens,
       ROUND(pow(n_tokens, {_MIX_ALPHA}) / z, 6) AS mix_weight,
       CAST(ROUND({_MIX_BUDGET} * pow(n_tokens, {_MIX_ALPHA}) / z) AS BIGINT) AS token_quota
FROM s CROSS JOIN tot
"""


@register("b_llm_domain_mix", oracle=_MIX_ORACLE, tags=("pipeline", "curation", "mixing"))
def b_llm_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C122: domain-mixture budgeting under temperature scaling —
    per-source token counts are reweighted as w_i ∝ n_i^0.3 (the
    UniMax-style exponent that upweights small domains relative to
    proportional sampling) and a fixed token budget is allocated as
    quota_i = round(B · w_i). This is the sampling-weights table a
    multi-domain training run is launched with.

    Scale shape: one map-side token count + a 20-row aggregate; the
    normalizer is a scalar over the per-source table, so the corpus
    is read exactly once and everything after the first aggregation
    is driver-trivial. Weights are pow/division of identical integer
    inputs in both engines, rounded at 1e-6.
    """
    d = load_table(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).alias("n_tokens"),
    )
    z = s.agg(F.sum(F.pow("n_tokens", _MIX_ALPHA)).cast("double").alias("z"))
    w = F.pow("n_tokens", _MIX_ALPHA) / F.col("z")
    return (
        s.crossJoin(F.broadcast(z))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.round(w, 6).alias("mix_weight"),
            # Same association as the oracle: ROUND(BUDGET * pow / z).
            # The 20-term double SUM for z is the one accepted float
            # accumulation in this key (identical operand sets on both
            # engines; certified stable at 1e-6 rounding).
            F.round(F.lit(_MIX_BUDGET) * F.pow("n_tokens", _MIX_ALPHA) / F.col("z"))
            .cast("bigint")
            .alias("token_quota"),
        )
    )


# --- bigram-LM perplexity scoring (CCNet-style quality) --------------

_PPL_ORACLE = """
WITH grams AS (
  SELECT doc_id, source, lang,
         unnest(l[1 : len(l) - 1]) AS prev,
         unnest(l[2 : len(l)]) AS w
  FROM (SELECT doc_id, source, lang, string_split(text, ' ') AS l FROM documents)
),
ref AS (SELECT prev, w FROM grams WHERE lang = 'en'),
bgc AS (SELECT prev, w, COUNT(*) AS cbg FROM ref GROUP BY prev, w),
ugc AS (SELECT prev, COUNT(*) AS cu FROM ref GROUP BY prev),
vocab AS (SELECT COUNT(DISTINCT w) AS v FROM ref),
terms AS (
  SELECT g.source,
         CAST(ROUND(1000000 * ln(
           (COALESCE(cbg, 0) + 1.0) / (COALESCE(cu, 0) + v)
         )) AS BIGINT) AS t
  FROM grams g
  LEFT JOIN bgc USING (prev, w)
  LEFT JOIN ugc USING (prev)
  CROSS JOIN vocab
)
SELECT source,
       COUNT(*) AS n_bigrams,
       ROUND(CAST(-SUM(t) AS DOUBLE) / (1000000.0 * COUNT(*)), 6) AS mean_nll
FROM terms
GROUP BY source
"""


@register("b_llm_perplexity", oracle=_PPL_ORACLE, tags=("pipeline", "curation", "lm"))
def b_llm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C132: LM-perplexity quality scoring (the CCNet recipe: score
    crawl text under a reference-corpus language model; low
    perplexity ⇒ fluent). The reference LM is an add-one-smoothed
    bigram model trained on the in-domain slice (lang='en'); every
    source's text is scored as mean negative log-likelihood
    P(w|prev) = (c(prev,w)+1)/(c(prev)+V).

    Determinism contract: each gram's log-prob depends only on
    integer counts, is rounded at 1e-6 and summed as BIGINT, so the
    per-source totals are exact integers in both engines; the only
    doubles are the final two divisions of identical operands.

    Scale shape: the LM tables are vocabulary-bounded (|V| unigram
    contexts, observed-bigram count table) — small enough to
    BROADCAST here; at web scale the bigram join flips to a gram-
    keyed shuffle with a document-frequency cap (the dedup.py df_cap
    pattern) while the plan is otherwise unchanged. Scoring itself is
    map-side: explode grams, probe the broadcast maps, aggregate by
    source."""
    d = load_table(spark, sf_dir, "documents")
    # size(l) >= 2 guard mirrors the oracle's unnest(l[1:len-1]) (zero
    # bigrams for 1-token docs) and avoids ANSI out-of-bounds on l[1].
    toks = d.select("doc_id", "source", "lang", F.split("text", " ").alias("l")).where(
        F.size("l") >= 2
    )
    grams = toks.select(
        "doc_id",
        "source",
        "lang",
        F.explode(
            # total bigram form (see b_llm_dsir): zip_with over clamped
            # slices never descends for 1-token docs
            F.expr(
                "zip_with(slice(l, 1, size(l) - 1), slice(l, 2, size(l) - 1),"
                " (a, b) -> struct(a AS prev, b AS w))"
            )
        ).alias("g"),
    ).select("doc_id", "source", "lang", F.col("g.prev").alias("prev"), F.col("g.w").alias("w"))
    ref = grams.where(F.col("lang") == "en")
    bgc = ref.groupBy("prev", "w").agg(F.count("*").alias("cbg"))
    ugc = ref.groupBy("prev").agg(F.count("*").alias("cu"))
    vocab = ref.agg(F.count_distinct("w").alias("v"))
    term = F.round(
        1_000_000
        * F.log(
            (F.coalesce(F.col("cbg"), F.lit(0)) + 1.0)
            / (F.coalesce(F.col("cu"), F.lit(0)) + F.col("v"))
        )
    ).cast("bigint")
    return (
        grams.join(F.broadcast(bgc), ["prev", "w"], "left")
        .join(F.broadcast(ugc), ["prev"], "left")
        .crossJoin(F.broadcast(vocab))
        .groupBy("source")
        .agg(F.count("*").alias("n_bigrams"), F.sum(term).alias("t"))
        .select(
            "source",
            "n_bigrams",
            F.round((-F.col("t")).cast("double") / (1_000_000.0 * F.col("n_bigrams")), 6).alias(
                "mean_nll"
            ),
        )
    )


# --- unigram entropy / lexical diversity -----------------------------

_ENTROPY_ORACLE = """
WITH words AS (
  SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
),
wc AS (SELECT source, w, COUNT(*) AS c FROM words GROUP BY source, w),
s AS (
  SELECT source,
         CAST(SUM(c) AS BIGINT) AS n_tokens,
         COUNT(*) AS n_types,
         CAST(SUM(c * CAST(ROUND(1000000 * ln(c)) AS BIGINT)) AS BIGINT) AS t
  FROM wc GROUP BY source
)
SELECT source, n_tokens, n_types,
       ROUND(ln(n_tokens) - CAST(t AS DOUBLE) / (1000000.0 * n_tokens), 6) AS entropy,
       ROUND(n_types / n_tokens, 6) AS type_token_ratio
FROM s
"""


@register("b_llm_entropy", oracle=_ENTROPY_ORACLE, tags=("pipeline", "text", "entropy"))
def b_llm_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C137: unigram Shannon entropy + type-token ratio per source —
    the lexical-diversity features quality filters threshold on
    (machine-generated or template text shows depressed entropy;
    Gopher's repetition rules are the n-gram cousin). Uses the
    algebraic identity H = ln(n) − (Σ c·ln c)/n so the per-type terms
    are integers (c × round(1e6·ln c)), summed exactly — both engines
    derive the entropy from identical integer sufficient statistics.
    Scale shape: one word-keyed count aggregation (map-side combine
    does the heavy lifting on repeated words) then a 20-row rollup;
    nothing but (source, word) counts ever shuffles."""
    d = load_table(spark, sf_dir, "documents")
    wc = (
        d.select("source", F.explode(F.split("text", " ")).alias("w"))
        .groupBy("source", "w")
        .agg(F.count("*").alias("c"))
    )
    t = F.col("c") * F.round(1_000_000 * F.log("c")).cast("bigint")
    s = wc.groupBy("source").agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("n_types"),
        F.sum(t).alias("t"),
    )
    return s.select(
        "source",
        "n_tokens",
        "n_types",
        F.round(
            F.log("n_tokens") - F.col("t").cast("double") / (1_000_000.0 * F.col("n_tokens")), 6
        ).alias("entropy"),
        F.round(F.col("n_types") / F.col("n_tokens"), 6).alias("type_token_ratio"),
    )


# --- winnowing fingerprints (Schleimer et al. 2003) ------------------

_WIN_K = 3   # shingle width (tokens)
_WIN_W = 4   # winnowing window (consecutive shingle hashes)

# 16-bit shingle hash from 4 md5 hex chars, engine-portable.
def _hash16(fn: str, expr: str) -> str:
    h = f"md5({expr})"
    cs = [
        f"({fn}('{_HEX}', substring({h}, {i}, 1)) - 1)" for i in (1, 2, 3, 4)
    ]
    return f"((({cs[0]} * 16 + {cs[1]}) * 16 + {cs[2]}) * 16 + {cs[3]})"


_WINNOW_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents
  WHERE len(string_split(text, ' ')) >= {_WIN_K}
),
sh AS (
  SELECT doc_id,
         unnest(range(1, len(l) - {_WIN_K - 1} + 1)) AS pos,
         unnest(list_transform(range(1, len(l) - {_WIN_K - 1} + 1),
                p -> {_hash16("strpos", f"array_to_string(l[p : p + {_WIN_K - 1}], ' ')")})) AS h
  FROM toks
),
keyed AS (
  SELECT doc_id, pos, h, h * 65536 + (65535 - pos) AS key,
         COUNT(*) OVER (PARTITION BY doc_id) AS n_sh
  FROM sh
),
sel AS (
  SELECT doc_id, n_sh,
         MIN(key) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN CURRENT ROW AND {_WIN_W - 1} FOLLOWING) AS sel_key,
         pos
  FROM keyed
)
SELECT doc_id,
       MIN(n_sh) AS n_shingles,
       CAST(COUNT(*) AS BIGINT) AS n_windows,
       COUNT(DISTINCT sel_key) AS n_fingerprints,
       CAST(SUM(DISTINCT sel_key) AS BIGINT) AS fp_checksum,
       ROUND(COUNT(DISTINCT sel_key) / COUNT(*), 6) AS density
FROM sel
WHERE pos <= n_sh - {_WIN_W - 1}
GROUP BY doc_id
"""


@register("b_llm_winnowing", oracle=_WINNOW_ORACLE, tags=("pipeline", "dedup", "fingerprint"))
def b_llm_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C148: winnowing fingerprints (Schleimer et al. 2003, the MOSS
    algorithm): hash every 3-token shingle, slide a 4-hash window,
    select each window's rightmost minimal hash — the selection is
    GUARANTEED to share fingerprints between any two docs with a
    common substring of ≥ w+k−1 tokens, the locality property plain
    min-sampling (b_llm_fingerprint) lacks. The rightmost-min
    tiebreak is encoded order-theoretically (key = h·65536 +
    (65535 − pos), minimized), so one windowed MIN does the whole
    selection; per-doc output = fingerprint count, density (≈ 2/(w+1)
    expected), and an order-independent checksum of the selected set.
    Scale shape: shingle/hash/window all run partition-local per doc
    (one doc-keyed window sort), map-side before the per-doc rollup —
    the fingerprint sets, not documents, are what a plagiarism/dedup
    index shuffles downstream."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("l")).where(
        F.size("l") >= _WIN_K
    )
    sh = toks.select(
        "doc_id",
        F.posexplode(
            # CASE keeps the transform total for sub-K-token docs (the
            # upstream .where does NOT protect: inferred-filter-from-
            # generate can inline this expression into a predicate run
            # on unfiltered rows, and sequence(1, size-2) DESCENDS).
            F.expr(
                f"CASE WHEN size(l) >= {_WIN_K} THEN "
                f"transform(sequence(1, size(l) - {_WIN_K - 1}), "
                f"p -> {_hash16('instr', f'array_join(slice(l, p, {_WIN_K}), chr(32))')})"
                f" ELSE CAST(array() AS array<int>) END"
            )
        ).alias("p0", "h"),
    ).select("doc_id", (F.col("p0") + 1).alias("pos"), "h")
    from pyspark.sql import Window

    keyed = sh.select(
        "doc_id",
        "pos",
        (F.col("h").cast("bigint") * 65536 + (65535 - F.col("pos"))).alias("key"),
        F.count("*").over(Window.partitionBy("doc_id")).alias("n_sh"),
    )
    wsel = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, _WIN_W - 1)
    sel = keyed.select(
        "doc_id", "n_sh", "pos", F.min("key").over(wsel).alias("sel_key")
    ).where(F.col("pos") <= F.col("n_sh") - (_WIN_W - 1))
    return sel.groupBy("doc_id").agg(
        F.min("n_sh").alias("n_shingles"),
        F.count("*").alias("n_windows"),
        F.count_distinct("sel_key").alias("n_fingerprints"),
        F.sum_distinct("sel_key").alias("fp_checksum"),
        F.round(F.count_distinct("sel_key") / F.count("*"), 6).alias("density"),
    )


# --- batch padding-waste census --------------------------------------

_BATCH_N = 32

_PADDING_ORACLE = f"""
WITH lens AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n FROM documents
),
naive AS (
  SELECT n, CAST(FLOOR((ROW_NUMBER() OVER (ORDER BY doc_id) - 1) / {_BATCH_N}.0) AS BIGINT) AS b
  FROM lens
),
sorted_b AS (
  SELECT n, CAST(FLOOR((ROW_NUMBER() OVER (ORDER BY n, doc_id) - 1) / {_BATCH_N}.0) AS BIGINT) AS b
  FROM lens
),
stats AS (
  SELECT 'naive' AS strategy, b, COUNT(*) AS k, MAX(n) AS mx, CAST(SUM(n) AS BIGINT) AS s
  FROM naive GROUP BY b
  UNION ALL
  SELECT 'length_sorted', b, COUNT(*), MAX(n), CAST(SUM(n) AS BIGINT)
  FROM sorted_b GROUP BY b
)
SELECT strategy,
       COUNT(*) AS n_batches,
       CAST(SUM(s) AS BIGINT) AS real_tokens,
       CAST(SUM(k * mx) AS BIGINT) AS padded_tokens,
       ROUND(1.0 - CAST(SUM(s) AS BIGINT) / CAST(SUM(k * mx) AS BIGINT), 6) AS waste_pct
FROM stats
GROUP BY strategy
"""


@register("b_llm_batch_padding", oracle=_PADDING_ORACLE, tags=("pipeline", "batching", "efficiency"))
def b_llm_batch_padding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C149: padding-waste census for training-batch construction —
    fixed batches of 32 docs padded to the batch max, comparing
    arrival-order batching against length-sorted batching (the
    bucketed-batching trick every trainer uses: sorting by length
    collapses the per-batch max toward the mean and reclaims the
    padding FLOPs). Output is the two-strategy census: real vs padded
    token totals and the waste fraction — deterministic integers plus
    one rounded division. Cross-engine trap pinned here: batch id
    must be FLOOR((rn−1)/N) explicitly — DuckDB CASTs double→BIGINT
    by rounding-to-nearest while Spark truncates, so the bare
    CAST((rn−1)/N AS BIGINT) silently assigns boundary rows to
    different batches in the two engines.

    Scale shape: the length projection is map-side; each strategy's
    global batch ordinal now comes from the SHIPPED two-pass
    range-partitioned rank (functions/prefix.py), so neither ordering
    funnels through a single window task at any corpus size; the
    per-batch rollup is keyed by batch ordinal."""
    d = load_table(spark, sf_dir, "documents")
    from stellarsql_spark.functions.prefix import ordered_running

    lens = d.select("doc_id", F.size(F.split("text", " ")).alias("n"))
    naive = ordered_running(
        lens, order=[F.col("doc_id")], sums={}, row_number_as="rn"
    ).select(
        "n",
        F.expr(f"CAST((rn - 1) div {_BATCH_N} AS BIGINT)").alias("b"),
        F.lit("naive").alias("strategy"),
    )
    slen = ordered_running(
        lens, order=[F.col("n"), F.col("doc_id")], sums={}, row_number_as="rn"
    ).select(
        "n",
        F.expr(f"CAST((rn - 1) div {_BATCH_N} AS BIGINT)").alias("b"),
        F.lit("length_sorted").alias("strategy"),
    )
    stats = (
        naive.unionByName(slen)
        .groupBy("strategy", "b")
        .agg(F.count("*").alias("k"), F.max("n").alias("mx"), F.sum("n").alias("s"))
    )
    return stats.groupBy("strategy").agg(
        F.count("*").alias("n_batches"),
        F.sum("s").alias("real_tokens"),
        F.sum(F.col("k") * F.col("mx")).alias("padded_tokens"),
        F.round(
            1.0 - F.sum("s") / F.sum(F.col("k") * F.col("mx")), 6
        ).alias("waste_pct"),
    )

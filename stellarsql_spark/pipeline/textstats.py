"""Text analysis operators (SURVEY.md §2 B53–B54 + langid / quality /
token counting / fingerprinting).

All scoring is integer-ratio or md5-derived arithmetic so every query
carries a full DuckDB hash oracle. Everything is built-in-function
JVM code — at 100 TB these are embarrassingly parallel scans with one
small aggregation shuffle at the end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stellarsql_spark.catalog import load_table
from stellarsql_spark.registry import register

_B53_ORACLE = """
SELECT word, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS n_docs
FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
GROUP BY word
ORDER BY n DESC, word
LIMIT 20
"""


@register("b_llm_wordcount", oracle=_B53_ORACLE, tags=("pipeline", "text"))
def b_llm_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize → explode → count: global top-20 words (ties broken
    alphabetically). The explode is map-side; only (word, partial
    counts) shuffle."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"), F.countDistinct("doc_id").alias("n_docs"))
        .orderBy(F.col("n").desc(), "word")
        .limit(20)
    )


_B54_ORACLE = """
SELECT source,
       COUNT(*) AS n_docs,
       CAST(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_chars,
       CAST(MIN(n_chars) AS BIGINT) AS min_chars,
       CAST(MAX(n_chars) AS BIGINT) AS max_chars,
       CAST(quantile_cont(n_chars, 0.5) AS DOUBLE) AS median_chars,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
FROM documents
GROUP BY source
"""


@register("b_llm_textstats", oracle=_B54_ORACLE, tags=("pipeline", "text"))
def b_llm_textstats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document stats with an exact median (linear
    interpolation over ints is exact in double in both engines)."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        (F.sum("n_chars").cast("double") / F.count("*")).cast("double").alias("avg_chars"),
        F.min("n_chars").cast("bigint").alias("min_chars"),
        F.max("n_chars").cast("bigint").alias("max_chars"),
        F.expr("percentile(n_chars, 0.5)").cast("double").alias("median_chars"),
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("total_tokens"),
    )


# Language ID: n-gram/stopword heuristic. The corpus vocabulary is
# English query-engine words, so English function words are the signal.
_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "on")
_SW_SQL = "[" + ", ".join(f"'{w}'" for w in _STOPWORDS) + "]"

_LANGID_ORACLE = f"""
WITH scored AS (
  SELECT doc_id, lang,
         len(list_filter(string_split(text, ' '), w -> list_contains({_SW_SQL}, w))) AS sw_hits,
         len(string_split(text, ' ')) AS n_tokens
  FROM documents
)
SELECT doc_id, lang, sw_hits, n_tokens,
       CAST(sw_hits AS DOUBLE) / n_tokens AS sw_ratio,
       CASE WHEN CAST(sw_hits AS DOUBLE) / n_tokens >= 0.02 THEN 'en' ELSE 'und' END AS lang_pred
FROM scored
"""


@register("b_llm_langid", oracle=_LANGID_ORACLE, tags=("pipeline", "text", "langid"))
def b_llm_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: stopword-hit ratio thresholding (exact
    integer ratio; a real system would extend to char-n-gram profiles
    per language — same plan shape)."""
    d = load_table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    sw = F.array(*[F.lit(w) for w in _STOPWORDS])
    hits = F.size(F.filter(words, lambda w: F.array_contains(sw, w)))
    ratio = hits.cast("double") / F.size(words)
    return d.select(
        "doc_id",
        "lang",
        hits.alias("sw_hits"),
        F.size(words).alias("n_tokens"),
        ratio.alias("sw_ratio"),
        F.when(ratio >= 0.02, "en").otherwise("und").alias("lang_pred"),
    )


_QUALITY_ORACLE = """
WITH m AS (
  SELECT doc_id, n_chars,
         len(string_split(text, ' ')) AS n_tokens,
         length(replace(text, ' ', '')) AS n_nonspace,
         len(list_distinct(string_split(text, ' '))) AS n_unique
  FROM documents
)
SELECT doc_id, n_tokens, n_unique,
       CAST(n_nonspace AS DOUBLE) / n_tokens AS mean_word_len,
       CAST(n_unique AS DOUBLE) / n_tokens AS ttr,
       CASE WHEN n_tokens >= 30 AND CAST(n_unique AS DOUBLE) / n_tokens >= 0.3
            THEN 'keep' ELSE 'drop' END AS quality
FROM m
"""


@register("b_llm_quality", oracle=_QUALITY_ORACLE, tags=("pipeline", "text", "quality"))
def b_llm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length, mean word length, type-token ratio →
    keep/drop gate (the standard pre-training corpus filter shape)."""
    d = load_table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    n_tokens = F.size(words)
    n_unique = F.size(F.array_distinct(words))
    mean_wl = F.length(F.regexp_replace("text", " ", "")).cast("double") / n_tokens
    ttr = n_unique.cast("double") / n_tokens
    return d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_unique.alias("n_unique"),
        mean_wl.alias("mean_word_len"),
        ttr.alias("ttr"),
        F.when((n_tokens >= 30) & (ttr >= 0.3), "keep").otherwise("drop").alias("quality"),
    )


_TOKENS_ORACLE = """
SELECT doc_id,
       len(string_split(text, ' ')) AS ws_tokens,
       len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS bpe_ish_tokens,
       CAST(ceil(n_chars / 4.0) AS BIGINT) AS est_llm_tokens
FROM documents
"""


@register("b_llm_tokens", oracle=_TOKENS_ORACLE, tags=("pipeline", "text", "tokens"))
def b_llm_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace, BPE-ish regex pieces, and the
    chars/4 LLM estimate."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("ws_tokens"),
        F.size(F.expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)")).alias(
            "bpe_ish_tokens"
        ),
        F.ceil(F.col("n_chars") / 4.0).cast("bigint").alias("est_llm_tokens"),
    )


# Rolling-hash fingerprint: min/max of md5-derived 60-bit shingle
# hashes — a 2-value winnowing-style sketch, cross-engine exact.
_FP_ORACLE = """
WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
shin AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(w) - 1),
                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
  FROM words WHERE len(w) >= 3
)
SELECT doc_id,
       MIN(CAST(concat('0x', substring(md5(sh), 1, 15)) AS BIGINT)) AS fp_min,
       MAX(CAST(concat('0x', substring(md5(sh), 1, 15)) AS BIGINT)) AS fp_max,
       COUNT(DISTINCT sh) AS n_shingles
FROM shin
GROUP BY doc_id
"""


@register("b_llm_fingerprint", oracle=_FP_ORACLE, tags=("pipeline", "text", "fingerprint"))
def b_llm_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: extrema of rolling 3-gram shingle hashes
    (md5-based 60-bit values → identical in any engine)."""
    from stellarsql_spark.pipeline.dedup import shingles

    d = load_table(spark, sf_dir, "documents")
    sh = (
        d.where(F.size(F.split("text", " ")) >= 3)
        .select("doc_id", F.explode(shingles(F.col("text"))).alias("sh"))
    )
    h = F.conv(F.substring(F.md5("sh"), 1, 15), 16, 10).cast("bigint")
    return sh.groupBy("doc_id").agg(
        F.min(h).alias("fp_min"),
        F.max(h).alias("fp_max"),
        F.countDistinct("sh").alias("n_shingles"),
    )


_INVIDX_ORACLE = """
SELECT word,
       COUNT(DISTINCT doc_id) AS df,
       array_to_string(list_sort(list(DISTINCT doc_id)), ',') AS postings
FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
WHERE word <> ''
GROUP BY word
HAVING COUNT(DISTINCT doc_id) >= 5
"""


@register("b_llm_inverted_index", oracle=_INVIDX_ORACLE, tags=("pipeline", "text", "index"))
def b_llm_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index build: word → sorted postings list + document
    frequency (df ≥ 5 keeps the hapax tail out). One shuffle keyed by
    word; postings are collect_set + array_sort for determinism. The
    100 TB form writes postings partitioned by hash(word) — this IS
    the candidate-index structure the Jaccard dedup joins on."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(
            F.countDistinct("doc_id").alias("df"),
            F.array_join(F.array_sort(F.collect_set("doc_id")), ",").alias("postings"),
        )
        .where(F.col("df") >= 5)
    )


_TFIDF_ORACLE = """
WITH tf AS (
  SELECT doc_id, word, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE word <> ''
  GROUP BY doc_id, word
),
df AS (
  SELECT word, COUNT(*) AS df FROM tf GROUP BY word
),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, word,
         ROUND(tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0), 6) AS tfidf
  FROM tf JOIN df USING (word) CROSS JOIN n
),
ranked AS (
  SELECT doc_id, word, tfidf,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, word) AS rn
  FROM scored
)
SELECT doc_id, word, tfidf, CAST(rn AS INT) AS rn FROM ranked WHERE rn <= 3
"""


@register("b_llm_tfidf", oracle=_TFIDF_ORACLE, tags=("pipeline", "text", "tfidf"))
def b_llm_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-3 terms per document (smoothed idf, sklearn-style
    ln((N+1)/(df+1))+1). The df table is tiny (vocabulary-sized) and
    broadcasts; tf shuffles once on (doc, word); ranking is one window
    per doc partition. Rounded to 6 dp so ln() last-ulp differences
    can't flip the hash — ties break on the word."""
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("word").agg(F.count("*").alias("df"))
    n_docs = d.count()  # scalar: one number, not a collect of data rows
    tfidf = F.round(
        F.col("tf") * (F.log((n_docs + 1.0) / (F.col("df") + 1.0)) + 1.0), 6
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "word")
    return (
        tf.join(F.broadcast(df), "word")
        .select("doc_id", "word", tfidf.alias("tfidf"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("doc_id", "word", "tfidf", "rn")
    )


# BM25 ranked retrieval (Robertson/Sparck Jones; Lucene's
# ln(1 + (N-df+0.5)/(df+0.5)) idf so every term is positive),
# k1 = 1.2, b = 0.75.  Per-term scores are scaled to integer
# millionths BEFORE the per-(query, doc) sum, so the sum is exact
# long arithmetic and ranking compares integers — float addition
# order can never flip the hash (same convention family as the
# scaled-integer sums in functions/exact.py; the only double ops are
# the identical-expression idf/tfnorm both engines evaluate on
# identical integer inputs, with one ROUND at the term boundary —
# the same exposure b_llm_tfidf already carries).
_BM25_QUERIES = (
    (1, "join"), (1, "filter"),
    (2, "shuffle"), (2, "merge"), (2, "slow"),
    (3, "customer"), (3, "order"),
)
_BM25_TOPK = 5

_BM25_ORACLE = f"""
WITH tf AS (
  SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE word <> ''
  GROUP BY doc_id, word
),
dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(dl) AS BIGINT) AS sum_dl FROM dl
),
df AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY word),
q(query_id, word) AS (VALUES {", ".join(f"({i}, '{w}')" for i, w in _BM25_QUERIES)}),
terms AS (
  SELECT q.query_id, tf.doc_id,
         CAST(ROUND(1000000 * ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
              * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl * n_docs / sum_dl)))
              AS BIGINT) AS term_m
  FROM q JOIN tf USING (word) JOIN df USING (word)
       JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats
),
ranked AS (
  SELECT query_id, doc_id, CAST(SUM(term_m) AS BIGINT) AS score_m,
         ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY CAST(SUM(term_m) AS BIGINT) DESC, doc_id
         ) AS rank
  FROM terms GROUP BY query_id, doc_id
)
SELECT CAST(query_id AS INT) AS query_id, doc_id,
       score_m / 1000000.0 AS score, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= {_BM25_TOPK}
"""


def _term_stats(spark: SparkSession, sf_dir: str, words: DataFrame | None = None):
    """Shared BM25 statistics: (tf, dl, dfreq, n_docs, sum_dl).

    Scale-critical shape (r8 re-measure at 300×: the original
    full-corpus (doc, word) groupBy shuffled ~90M postings and ran
    6.6× slower than DuckDB's one-statement plan; this form is the
    fix):

    - ``dl`` (per-doc length) never needs word-level grouping — it is
      the map-side non-empty token count of each doc, zero shuffle;
      n_docs/sum_dl are one scalar rollup over it.
    - ``tf`` postings are broadcast-semi-filtered to the query
      vocabulary (``words``) BEFORE the (doc, word) groupBy, so the
      only shuffle carries postings of queried words (df-sized), not
      the corpus vocabulary.  ``dfreq`` falls out of that filtered
      tf for free (tf rows are distinct (doc, word) pairs).
    - With ``words=None`` the unfiltered corpus shuffle is kept (the
      index-build shape, for callers that genuinely need every
      posting).

    Values are identical either way — the oracle's full-vocabulary
    CTEs compute the same dl/df/tf for every surviving row."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("word")).where(
        F.col("word") != ""
    )
    if words is not None:
        toks = toks.join(F.broadcast(words.select("word").distinct()), "word")
    tf = toks.groupBy("doc_id", "word").agg(F.count("*").cast("bigint").alias("tf"))
    dl = d.select(
        "doc_id",
        F.size(F.filter(F.split("text", " "), lambda w: w != "")).cast("bigint").alias("dl"),
    )
    n_docs, sum_dl = dl.agg(
        F.count("*").cast("bigint"), F.sum("dl").cast("bigint")
    ).first()
    dfreq = tf.groupBy("word").agg(F.count("*").cast("bigint").alias("df"))
    return tf, dl, dfreq, n_docs, sum_dl


def _bm25_term_m(n_docs: int, sum_dl: int, tf=None, df=None, dl=None):
    """Integer-millionth BM25 term weight column (see _BM25_ORACLE's
    convention note — parenthesization mirrors the oracle exactly).
    tf/df/dl default to the long-format column names; the map-side
    wide form passes its per-word columns explicitly."""
    tf = F.col("tf") if tf is None else tf
    df = F.col("df") if df is None else df
    dl = F.col("dl") if dl is None else dl
    idf = F.log(1.0 + (F.lit(n_docs) - df + 0.5) / (df + 0.5))
    denom = tf + 1.2 * (0.25 + 0.75 * dl * F.lit(n_docs) / F.lit(sum_dl))
    return F.round(1_000_000 * idf * (tf * 2.2) / denom).cast("bigint")


_BM25_BASE_PIN = None


@register("b_llm_bm25", oracle=_BM25_ORACLE, tags=("pipeline", "text", "retrieval", "eager"))
def b_llm_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C156: BM25 top-5 ranked retrieval for a fixed query set —
    the lexical half of a retrieval pipeline (the dense half is
    b_llm_cosine_topk / b_llm_ann_lsh; TF-IDF's term weighting is the
    degenerate no-length-normalization case above).

    100 TB shape (r8 redesign — the original (doc, word) groupBy
    shuffled the full corpus vocabulary and measured 6.6× DuckDB at
    300×): for a LITERAL query set the per-doc counts of the queried
    words are array expressions on the token list, so scoring is
    entirely MAP-SIDE — one corpus scan, zero corpus-sized shuffle.
    Per doc the wide row is (dl, tf per queried word); corpus stats
    (n_docs, sum_dl) and per-word df are |words|-sized rollups whose
    1-row pivot is broadcast back; per-query scores are exact-long
    sums of the same term_m expression the oracle rounds, stacked to
    (query_id, score) rows map-side. The only exchange is the top-5
    window, which Spark executes with WindowGroupLimit: each task
    ships at most 5 rows per query — the shuffle is |tasks|×|q|×5,
    corpus-size-independent. (A data-dependent query set falls back
    to _term_stats' broadcast-filtered postings join — the hybrid
    arm's shape.) Ranking compares exact integer millionths — see
    _BM25_ORACLE's convention note."""
    from pyspark.sql import Window

    words = tuple(dict.fromkeys(w for _, w in _BM25_QUERIES))
    widx = {w: i for i, w in enumerate(words)}
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda t: t != "")
    base = d.select(
        "doc_id",
        F.size(toks).cast("long").alias("dl"),
        *[
            F.size(F.filter(toks, (lambda w_: lambda t: t == F.lit(w_))(w)))
            .cast("long")
            .alias(f"tf_{i}")
            for i, w in enumerate(words)
        ],
    ).where(F.col("dl") > 0)
    # Pin the tokenized stats frame: stats, df, and scoring all read
    # it, and without a persist each reference re-runs the tokenize
    # scan (the oracle's engine materializes its tf CTE once — three
    # Spark scans measured 3x its latency at 300x). ~9 longs/doc, so
    # the pinned artifact is ~1/50th of the text it summarizes. The
    # previous call's pin is dropped here (module-level handle): a
    # repeated-execution harness would otherwise accumulate one
    # cached copy per trial.
    global _BM25_BASE_PIN
    if _BM25_BASE_PIN is not None:
        _BM25_BASE_PIN.unpersist(blocking=False)
    base = base.persist()
    _BM25_BASE_PIN = base
    n_docs, sum_dl = base.agg(
        F.count("*").cast("bigint"), F.sum("dl").cast("bigint")
    ).first()
    dfrow = base.agg(
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).cast("long").alias(f"df_{i}")
            for i in range(len(words))
        ]
    )
    scored = base.crossJoin(F.broadcast(dfrow))

    def term(i):
        return F.when(
            F.col(f"tf_{i}") > 0,
            _bm25_term_m(
                n_docs, sum_dl,
                tf=F.col(f"tf_{i}"), df=F.col(f"df_{i}"), dl=F.col("dl"),
            ),
        ).otherwise(F.lit(0).cast("bigint"))

    by_query: dict[int, list[str]] = {}
    for qid, w_ in _BM25_QUERIES:
        by_query.setdefault(qid, []).append(w_)
    qcols = []
    for qid, qwords in sorted(by_query.items()):
        idxs = [widx[w_] for w_ in qwords]
        score_expr = term(idxs[0])
        hit_expr = F.col(f"tf_{idxs[0]}") > 0
        for i in idxs[1:]:
            score_expr = score_expr + term(i)
            hit_expr = hit_expr | (F.col(f"tf_{i}") > 0)
        qcols.append(F.lit(qid).alias(f"q_{qid}"))
        qcols.append(score_expr.cast("bigint").alias(f"s_{qid}"))
        qcols.append(hit_expr.alias(f"h_{qid}"))
    stacked = scored.select("doc_id", *qcols).selectExpr(
        "doc_id",
        "stack({n}, {args}) AS (query_id, score_m, hit)".format(
            n=len(by_query),
            args=", ".join(
                f"q_{qid}, s_{qid}, h_{qid}" for qid in sorted(by_query)
            ),
        ),
    ).where("hit")
    w = Window.partitionBy("query_id").orderBy(F.col("score_m").desc(), "doc_id")
    return (
        stacked.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= _BM25_TOPK)
        .select(
            F.col("query_id").cast("int").alias("query_id"),
            "doc_id",
            (F.col("score_m") / 1_000_000.0).alias("score"),
            "rank",
        )
    )


# Denylist scrubbing: the corpus text is synthetic word soup, so the
# redaction surface is modeled as a term denylist (the same machinery
# as PII masking — word-boundary regex alternation, one pass, no UDF;
# for real email/phone patterns only the regex literal changes).
_SCRUB_PATTERN = r"\b(join|filter|shuffle)\b"

_SCRUB_ORACLE = rf"""
SELECT doc_id,
       CAST(LENGTH(regexp_replace(text, '{_SCRUB_PATTERN}', '[MASK]', 'g'))
            - LENGTH(text) AS BIGINT) AS len_delta,
       md5(regexp_replace(text, '{_SCRUB_PATTERN}', '[MASK]', 'g')) AS scrubbed_md5,
       CAST(LENGTH(text) - LENGTH(regexp_replace(text, '{_SCRUB_PATTERN}', '', 'g'))
            AS BIGINT) AS chars_redacted
FROM documents
WHERE regexp_matches(text, '{_SCRUB_PATTERN}')
"""


@register("b_llm_scrub", oracle=_SCRUB_ORACLE, tags=("pipeline", "scrub", "redaction"))
def b_llm_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Denylist/PII-style scrubbing: mask denylisted terms with a
    single vectorized regexp_replace (JVM-side, codegen — never a
    Python UDF), emit only affected docs with the masked-text md5 as
    the cross-engine proof of the exact rewritten bytes. At 100 TB
    this is a map-only pass: no shuffle, fully pushdown-composable
    with upstream filters."""
    d = load_table(spark, sf_dir, "documents")
    scrubbed = F.regexp_replace("text", _SCRUB_PATTERN, "[MASK]")
    removed = F.regexp_replace("text", _SCRUB_PATTERN, "")
    return (
        d.where(F.col("text").rlike(_SCRUB_PATTERN))
        .select(
            "doc_id",
            (F.length(scrubbed) - F.length("text")).cast("bigint").alias("len_delta"),
            F.md5(scrubbed).alias("scrubbed_md5"),
            (F.length("text") - F.length(removed)).cast("bigint").alias("chars_redacted"),
        )
    )


_PACK_BUDGET = 256

_PACK_ORACLE = f"""
WITH sized AS (
  SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens
  FROM documents
),
placed AS (
  SELECT source, doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS start_tok
  FROM sized
)
SELECT source,
       CAST(FLOOR(start_tok / {_PACK_BUDGET}) AS BIGINT) AS chunk_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS chunk_tokens,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM placed
GROUP BY source, chunk_id
"""


@register("b_llm_pack", oracle=_PACK_ORACLE, tags=("pipeline", "packing", "tokens"))
def b_llm_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget document packing (concat-then-chunk): per source,
    documents are laid end-to-end in doc_id order and cut into
    fixed-budget context chunks — each doc's chunk is
    floor(running_start / budget), the exclusive prefix sum of token
    counts. One window over a per-source ordering, no stateful loop,
    so it scales as a single shuffle on source; the greedy no-straddle
    variant needs sequential state (applyInPandas per source) but this
    closed form is what large pretraining pipelines actually use."""
    d = load_table(spark, sf_dir, "documents")
    sized = d.select(
        "doc_id", "source", F.size(F.split("text", " ")).alias("n_tokens")
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    placed = sized.withColumn("start_tok", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
    return (
        placed.groupBy(
            "source",
            F.floor(F.col("start_tok") / _PACK_BUDGET).cast("bigint").alias("chunk_id"),
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("chunk_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


# Corpus-frequency quality features — the exact-arithmetic form of
# unigram-LM quality scoring. A log-probability score would be the
# textbook formulation, but ln() is not bit-stable across engines
# (libm vs StrictMath differ by ulps), so the hash-checkable features
# are the integer-exact ones every frequency-based filter actually
# thresholds on: mean corpus-frequency of the doc's tokens, the
# fraction of hapax/rare tokens, and coverage by the corpus top-1000
# vocabulary. Rank ties in the top-1000 cut are broken by word so the
# vocabulary set is deterministic in both engines.
_FREQQ_ORACLE = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
vocab AS (SELECT word, COUNT(*) AS c FROM tok GROUP BY word),
top1k AS (
  SELECT word FROM vocab ORDER BY c DESC, word LIMIT 1000
),
scored AS (
  SELECT t.doc_id, v.c,
         CASE WHEN v.c <= 2 THEN 1 ELSE 0 END AS is_rare,
         CASE WHEN k.word IS NOT NULL THEN 1 ELSE 0 END AS in_top
  FROM tok t JOIN vocab v USING (word) LEFT JOIN top1k k USING (word)
)
SELECT doc_id,
       COUNT(*) AS n_tokens,
       CAST(SUM(c) AS BIGINT) AS freq_sum,
       CAST(CAST(SUM(c) AS BIGINT) AS DOUBLE) / COUNT(*) AS mean_freq,
       CAST(CAST(SUM(is_rare) AS BIGINT) AS DOUBLE) / COUNT(*) AS rare_frac,
       CAST(CAST(SUM(in_top) AS BIGINT) AS DOUBLE) / COUNT(*) AS top1k_frac
FROM scored GROUP BY doc_id
"""


@register("b_llm_freq_quality", oracle=_FREQQ_ORACLE, tags=("pipeline", "text", "quality"))
def b_llm_freq_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency quality features per document: mean token
    corpus-frequency, rare-token (count<=2) fraction, and top-1000
    vocabulary coverage — the frequency-heuristic tier of an LLM data
    quality pipeline (the integer-exact stand-in for unigram-LM
    log-prob scoring; see oracle note).

    Scale shape: one (word) shuffle builds the vocabulary, the
    token->vocab join shuffles on word (power-law skew is bounded:
    counts, not texts, ride the wire), and the top-1000 set is a
    broadcast membership probe. At 100 TB the vocabulary table is
    millions of rows — still broadcastable after the top-k cut, while
    the full vocab join stays a shuffle equi-join."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    vocab = tok.groupBy("word").agg(F.count("*").alias("c"))
    top1k = (
        vocab.orderBy(F.col("c").desc(), "word")
        .limit(1000)
        .select("word", F.lit(1).alias("in_top_flag"))
    )
    scored = (
        tok.join(vocab, "word")
        .join(F.broadcast(top1k), "word", "left")
        .select(
            "doc_id",
            "c",
            F.when(F.col("c") <= 2, 1).otherwise(0).alias("is_rare"),
            F.when(F.col("in_top_flag").isNotNull(), 1).otherwise(0).alias("in_top"),
        )
    )
    n = F.count("*")
    return scored.groupBy("doc_id").agg(
        n.alias("n_tokens"),
        F.sum("c").alias("freq_sum"),
        (F.sum("c").cast("double") / n).alias("mean_freq"),
        (F.sum("is_rare").cast("double") / n).alias("rare_frac"),
        (F.sum("in_top").cast("double") / n).alias("top1k_frac"),
    )


_BIGRAM_NOVELTY_ORACLE = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS l FROM documents
),
bg AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, len(l)),
                               i -> l[i] || ' ' || l[i + 1])) AS b
  FROM t
),
df AS (SELECT b, COUNT(*) AS n_docs FROM bg GROUP BY b)
SELECT bg.doc_id,
       COUNT(*) AS n_bigrams,
       CAST(SUM(CASE WHEN df.n_docs = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique
FROM bg JOIN df ON bg.b = df.b
GROUP BY bg.doc_id
"""


@register("b_llm_bigram_novelty", oracle=_BIGRAM_NOVELTY_ORACLE, tags=("pipeline", "text", "dedup"))
def b_llm_bigram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C103: per-document bigram novelty — of a doc's distinct word
    bigrams, how many appear in NO other document (corpus document
    frequency 1). The integer-exact unigram-LM companion at the
    phrase level: a low unique fraction marks boilerplate/template
    text (every phrase seen elsewhere), a high one marks novel
    content — one of the standard cheap curation signals between
    exact dedup (identical text) and MinHash (near-identical text).

    Scale shape: bigrams explode map-side from the token array
    (distinct WITHIN doc first, shrinking the shuffle), the document
    frequency is one bigram-keyed aggregation, and the per-doc rollup
    joins the exploded bigrams back to their df — every shuffle is
    keyed by bigram or doc_id, nothing quadratic, and a df cap (as in
    the Jaccard inverted index) would bound hot-bigram fan-in at
    100 TB. Counts are integers; the oracle recomputes them verbatim
    in DuckDB."""
    d = load_table(spark, sf_dir, "documents")
    bg = (
        d.select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.expr(
                        "CASE WHEN size(split(text, ' ')) >= 2 THEN "
                        "transform(sequence(0, size(split(text, ' ')) - 2), "
                        "i -> concat(split(text, ' ')[i], ' ', split(text, ' ')[i + 1])) "
                        "ELSE array() END"
                    )
                )
            ).alias("b"),
        )
    )
    df_counts = bg.groupBy("b").agg(F.count("*").alias("n_docs"))
    return (
        bg.join(df_counts, "b")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum(F.when(F.col("n_docs") == 1, 1).otherwise(0)).alias("n_unique"),
        )
    )


# Sliding token-window chunking: window CHUNK_W tokens, stride
# CHUNK_S (CHUNK_W - CHUNK_S tokens of overlap between neighbors) —
# the standard pre-embedding / pre-training document splitter.
CHUNK_W = 64
CHUNK_S = 48

_CHUNK_ORACLE = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS l, len(string_split(text, ' ')) AS n
  FROM documents
),
starts AS (
  SELECT doc_id, l, n, unnest(range(1, n + 1, {CHUNK_S})) AS s
  FROM t
)
SELECT doc_id,
       CAST((s - 1) / {CHUNK_S} AS INT) AS chunk_idx,
       CAST(len(l[s : s + {CHUNK_W} - 1]) AS INT) AS n_chunk_tokens,
       md5(array_to_string(l[s : s + {CHUNK_W} - 1], ' ')) AS chunk_md5
FROM starts
"""


@register("b_llm_chunking", oracle=_CHUNK_ORACLE, tags=("pipeline", "text", "chunking"))
def b_llm_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C112: sliding-window document chunking — every doc splits into
    64-token windows at a 48-token stride (16 tokens of overlap), the
    shape every embedding/pre-training pipeline feeds its encoder.
    Implementation is one generate-and-slice projection: sequence()
    emits the start offsets, posexplode yields (chunk_idx, start),
    slice() clamps the final partial window — pure map-side JVM work,
    rows fan out by ~n_tokens/stride with NO shuffle, so at 100 TB
    chunking rides the ingest scan for free. Chunks are verified by
    md5 (identical hex in both engines), token count, and index, so
    the oracle certifies the exact text of every chunk without
    shipping it."""
    d = load_table(spark, sf_dir, "documents")
    # Form chosen by interleaved A/B at the 100× probe (min-of-4):
    # explode-the-starts-then-slice = 5.26 s beats building the
    # (n, md5) structs inside a transform() lambda = 6.55 s — the
    # higher-order-function lambda dispatch costs more than carrying
    # the token array into the generator output (the array column is
    # a pointer-sized attribute inside one codegen stage, not a
    # per-chunk copy). DuckDB on the same corpus/shape: 3.76 s →
    # ~1.4× at the data-dominated tier.
    arr = F.split("text", " ")
    chunked = d.select(
        "doc_id",
        F.posexplode(
            F.expr(f"sequence(1, size(split(text, ' ')), {CHUNK_S})")
        ).alias("chunk_idx", "s"),
        arr.alias("l"),
    )
    piece = F.slice(F.col("l"), F.col("s"), CHUNK_W)
    return chunked.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.size(piece).cast("int").alias("n_chunk_tokens"),
        F.md5(F.array_join(piece, " ")).alias("chunk_md5"),
    )


# --- BPE tokenization (Sennrich 2016 / GPT-2-style pair merges) ------

# Vendored merge table, rank order = priority. Well-formed: every
# operand is a single character or the result of an earlier merge —
# the property that makes one-pass-per-merge-in-rank-order equivalent
# to the classic iterative best-pair loop (see b_llm_bpe_tokens).
# Pairs follow common English digram/affix frequency (public
# knowledge: Sennrich et al. 2016 report merges like th/the/in/ing/
# an/and/er/re emerging first on English corpora).
BPE_MERGES: tuple[tuple[str, str], ...] = (
    ("t", "h"), ("th", "e"),
    ("i", "n"), ("a", "n"), ("an", "d"), ("in", "g"),
    ("e", "r"), ("o", "n"), ("r", "e"), ("o", "r"),
    ("e", "n"), ("a", "t"), ("e", "s"), ("o", "u"),
    ("i", "t"), ("i", "s"), ("o", "f"), ("a", "l"),
    ("e", "d"), ("a", "r"), ("s", "t"), ("t", "o"),
    ("n", "t"), ("l", "l"), ("c", "h"), ("r", "o"),
    ("i", "l"), ("d", "e"), ("c", "t"), ("u", "s"),
    ("s", "e"), ("l", "e"), ("m", "e"), ("h", "a"),
    ("w", "h"), ("wh", "i"), ("whi", "ch"),
    ("th", "at"), ("f", "or"), ("w", "it"), ("wit", "h"),
    ("a", "s"), ("b", "e"), ("w", "e"), ("y", "ou"),
    ("p", "ro"), ("o", "m"), ("c", "om"),
)

# Word separator symbol: never appears in any merge pair, so merges
# cannot cross word boundaries (word-internal BPE).
_BPE_SEP = "¶"


def bpe_merge_pass(syms: list[str], a: str, b: str) -> list[str]:
    """One merge pass: fuse all non-overlapping (a, b) occurrences
    left to right — the convention both the oracle's replace() replay
    and the textbook iterative algorithm share. Module-level so the
    equivalence test in tests/test_round7.py exercises THIS code,
    not a private copy."""
    out, i, n = [], 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out

# The oracle replays the merge table as nested non-overlapping
# left-to-right replace() calls over a DOUBLE-SPACE symbol encoding:
# symbols are separated by two spaces and the string is wrapped in
# one space per side, so each " a  b " -> " ab " replacement consumes
# one boundary space from each side and the doubled separators keep
# adjacent matches from sharing a delimiter (with single spacing,
# ' a b a b ' matches ' a b ' only ONCE because the shared middle
# space is consumed — the classic replace-merge bug).
def _bpe_oracle_expr(col: str) -> str:
    # [\s\S] not '.': RE2's '.' skips newlines, which would glue the
    # symbols around a '\n' into one token on the oracle side only
    expr = f"regexp_replace(replace({col}, ' ', '{_BPE_SEP}'), '([\\s\\S])', ' \\1 ', 'g')"
    for a, b in BPE_MERGES:
        expr = f"replace({expr}, ' {a}  {b} ', ' {a}{b} ')"
    return expr


_BPE_ORACLE = f"""
WITH sym AS (
  SELECT doc_id,
         list_filter(string_split(trim({_bpe_oracle_expr("text")}), '  '),
                     s -> s <> '{_BPE_SEP}') AS toks,
         len(string_split(text, ' ')) AS n_words
  FROM documents WHERE length(text) > 0
)
SELECT doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       CAST(len(toks) AS BIGINT) AS n_bpe_tokens,
       CAST(COALESCE(list_sum(list_transform(toks, s -> len(s) * len(s))), 0) AS BIGINT) AS seg_checksum
FROM sym
"""


@register("b_llm_bpe_tokens", oracle=_BPE_ORACLE, tags=("pipeline", "text", "tokens", "bpe"))
def b_llm_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C151: real BPE tokenization (Sennrich et al. 2016, the GPT-2
    tokenizer family): per document, split to characters and apply the
    vendored merge table — every training-token budget in the pipeline
    tier is whitespace-denominated; this key prices documents in the
    unit a pretraining run actually spends.

    Kernel: one pass per merge in rank order, each pass merging all
    non-overlapping occurrences left to right. For a WELL-FORMED merge
    table (each operand is a char or an earlier merge's result) this
    is provably equivalent to the classic iterative best-ranked-pair
    loop: a merge at rank r only creates pairs involving its new
    symbol, and any such pair in the table must rank after r (its
    operand did not exist earlier), so when the single pass reaches
    rank r every occurrence of that pair that will ever exist is
    already present. The DuckDB oracle replays the same table as
    nested replace() calls over a double-space symbol encoding (see
    _bpe_oracle_expr) — same left-to-right non-overlap convention —
    so token counts AND the length-squared segmentation checksum (it
    distinguishes [ab,c] from [a,bc]) must agree exactly.

    Scale shape: pure map-side Arrow-batched Python, no shuffle at
    all — the kernel rides the ingest scan like the multimodal codec
    keys. Divergence from production GPT-2: byte-level pre-tokenizer
    and the space-prefix (Ġ) convention are dropped; word boundaries
    are hard (the separator symbol joins no merge pair)."""
    import pyarrow as pa

    ranks = list(BPE_MERGES)
    merge_pass = bpe_merge_pass  # local binding for the task closure

    def tokenize(batches):
        for batch in batches:
            doc_ids = batch.column(0).to_pylist()
            texts = batch.column(1).to_pylist()
            ids, words, toks, cks = [], [], [], []
            for doc_id, text in zip(doc_ids, texts):
                if not text:
                    continue
                syms = list(text.replace(" ", _BPE_SEP))
                for a, b in ranks:
                    if a in text or a == _BPE_SEP:  # cheap skip; correctness-neutral
                        syms = merge_pass(syms, a, b)
                tok = [s for s in syms if s != _BPE_SEP]
                ids.append(doc_id)
                words.append(text.count(" ") + 1)
                toks.append(len(tok))
                cks.append(sum(len(s) * len(s) for s in tok))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, pa.int64()),
                    pa.array(words, pa.int64()),
                    pa.array(toks, pa.int64()),
                    pa.array(cks, pa.int64()),
                ],
                names=["doc_id", "n_words", "n_bpe_tokens", "seg_checksum"],
            )

    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", "text").mapInArrow(
        tokenize, "doc_id long, n_words long, n_bpe_tokens long, seg_checksum long"
    )


# --- hybrid retrieval: BM25 ⊕ dense cosine via RRF (C159) ------------

# Reciprocal-rank fusion (Cormack et al. 2009): each arm contributes
# round(1e6/(K+rank)) — an exact integer, because ranks are small ints
# and the division is one correctly-rounded IEEE op — so the fused
# score is exact long arithmetic and the final ranking compares
# integers.  RRF is the standard way to merge rankings whose scores
# live on incomparable scales (BM25 term weights vs cosine), which is
# exactly the lexical⊕dense situation.
_RRF_K = 60
_ARM_TOPK = 20
_FUSED_TOPK = 10
_N_MLT_QUERIES = 5  # doc_id < 5 are the more-like-this query docs

_RRF_ORACLE = f"""
WITH tf AS (
  SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE word <> ''
  GROUP BY doc_id, word
),
dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(dl) AS BIGINT) AS sum_dl FROM dl
),
df AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY word),
qwords AS (
  SELECT doc_id AS query_id, word FROM tf WHERE doc_id < {_N_MLT_QUERIES}
),
lex_scored AS (
  SELECT qw.query_id, tf.doc_id,
         CAST(SUM(CAST(ROUND(1000000 * ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
              * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl * n_docs / sum_dl)))
              AS BIGINT)) AS BIGINT) AS score_m
  FROM qwords qw
       JOIN tf ON tf.word = qw.word AND tf.doc_id <> qw.query_id
       JOIN df ON df.word = tf.word
       JOIN dl ON dl.doc_id = tf.doc_id
       CROSS JOIN stats
  GROUP BY qw.query_id, tf.doc_id
),
lex AS (
  SELECT query_id, doc_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score_m DESC, doc_id) AS rank
  FROM lex_scored
),
dense AS (
  SELECT a.vec_id AS query_id, b.vec_id AS doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY a.vec_id
           ORDER BY ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                                 CAST(b.embedding AS DOUBLE[])), 6) DESC,
                    b.vec_id
         ) AS rank
  FROM embeddings a CROSS JOIN embeddings b
  WHERE a.vec_id < {_N_MLT_QUERIES} AND a.vec_id <> b.vec_id
),
arms AS (
  SELECT query_id, doc_id, rank FROM lex WHERE rank <= {_ARM_TOPK}
  UNION ALL
  SELECT query_id, doc_id, rank FROM dense WHERE rank <= {_ARM_TOPK}
),
fused AS (
  SELECT query_id, doc_id,
         CAST(SUM(CAST(ROUND(1000000.0 / ({_RRF_K} + rank)) AS BIGINT)) AS BIGINT) AS rrf_m,
         CAST(COUNT(*) AS INT) AS n_arms
  FROM arms GROUP BY query_id, doc_id
)
SELECT query_id, doc_id, rrf_m / 1000000.0 AS rrf, n_arms, CAST(rank AS INT) AS rank
FROM (
  SELECT query_id, doc_id, rrf_m, n_arms,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY rrf_m DESC, doc_id) AS rank
  FROM fused
) WHERE rank <= {_FUSED_TOPK}
"""


@register("b_llm_hybrid_rrf", oracle=_RRF_ORACLE, tags=("pipeline", "retrieval", "hybrid"))
def b_llm_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C159: hybrid retrieval — BM25 more-like-this (query = a
    document's own terms) ⊕ dense cosine, fused by reciprocal rank.

    The lexical and dense arms return rankings on incomparable score
    scales; RRF merges them using only the RANKS, each arm
    contributing an exact integer round(1e6/(60+rank)).  docs found
    by both arms (n_arms = 2) accumulate both contributions — the
    agreement signal hybrid search exists for.  100 TB shape: the
    lexical arm is the BM25 broadcast-terms join (candidates =
    postings of the query's terms), the dense arm is the broadcast-
    queries cosine scan (or its int8/IVF approximations upstream),
    and the fusion itself touches only 2×{_ARM_TOPK} rows per query —
    rank-merge cost is independent of corpus size."""
    from pyspark.sql import Window

    from stellarsql_spark.catalog import load_table as _lt
    from stellarsql_spark.pipeline.similarity import N_QUERIES, dot, norm

    # Query terms come from a doc_id-pruned scan of the query docs
    # alone (pushed-down bounded filter), then the corpus postings
    # are broadcast-filtered to that vocabulary inside _term_stats —
    # the corpus-sized (doc, word) shuffle never happens.
    qw = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < _N_MLT_QUERIES)
        .select(
            F.col("doc_id").alias("query_id"),
            F.explode(F.split("text", " ")).alias("qword"),
        )
        .where(F.col("qword") != "")
        .distinct()
    )
    tf, dl, dfreq, n_docs, sum_dl = _term_stats(
        spark, sf_dir, words=qw.select(F.col("qword").alias("word"))
    )
    term_m = _bm25_term_m(n_docs, sum_dl)
    lex_w = Window.partitionBy("query_id").orderBy(F.col("score_m").desc(), "doc_id")
    lex = (
        tf.join(
            F.broadcast(qw),
            (tf.word == qw.qword) & (tf.doc_id != qw.query_id),
        )
        .join(F.broadcast(dfreq), "word")
        .join(dl, "doc_id")
        .select("query_id", "doc_id", term_m.alias("term_m"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum("term_m").cast("bigint").alias("score_m"))
        .withColumn("rank", F.row_number().over(lex_w))
        .where(F.col("rank") <= _ARM_TOPK)
        .select("query_id", "doc_id", "rank")
    )
    e = _lt(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < _N_MLT_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    sim = F.round(dot(F.col("qe"), F.col("embedding")) / (norm(F.col("qe")) * norm(F.col("embedding"))), 6)
    dense_w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), "doc_id")
    dense = (
        e.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("vec_id"))
        .select("query_id", F.col("vec_id").alias("doc_id"), sim.alias("sim"))
        .withColumn("rank", F.row_number().over(dense_w))
        .where(F.col("rank") <= _ARM_TOPK)
        .select("query_id", "doc_id", "rank")
    )
    contrib = F.round(1_000_000.0 / (_RRF_K + F.col("rank"))).cast("bigint")
    fused_w = Window.partitionBy("query_id").orderBy(F.col("rrf_m").desc(), "doc_id")
    return (
        lex.unionByName(dense)
        .select("query_id", "doc_id", contrib.alias("contrib"))
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum("contrib").cast("bigint").alias("rrf_m"),
            F.count("*").cast("int").alias("n_arms"),
        )
        .withColumn("rank", F.row_number().over(fused_w))
        .where(F.col("rank") <= _FUSED_TOPK)
        .select(
            "query_id",
            "doc_id",
            (F.col("rrf_m") / 1_000_000.0).alias("rrf"),
            "n_arms",
            "rank",
        )
    )


# --- Tokenizer vocabulary coverage / OOV rate (C164) -----------------

_OOV_VOCAB_K = 200

_OOV_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, source, unnest(string_split(text, ' ')) AS word FROM documents
),
toks AS (SELECT * FROM tok WHERE word <> ''),
vocab AS (
  SELECT word FROM (
    SELECT word, ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, word) AS rn
    FROM toks WHERE (doc_id // 20) % 2 = 0
    GROUP BY word
  ) WHERE rn <= {_OOV_VOCAB_K}
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       ROUND(CAST(SUM(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS oov_rate
FROM toks t LEFT JOIN vocab v USING (word)
WHERE (t.doc_id // 20) % 2 = 1
GROUP BY source
"""


@register("b_llm_oov_rate", oracle=_OOV_ORACLE, tags=("pipeline", "text", "vocab"))
def b_llm_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C164: vocabulary-coverage audit — build a top-K frequency
    vocabulary on the training half of the corpus (alternating
    doc-id blocks, so every source contributes to both halves — plain
    doc_id parity is constant per source here), then measure each
    source's out-of-vocabulary token rate on the held-out half.  This is the pre-tokenizer check a data pipeline
    runs before committing a vocab: a source whose OOV rate spikes
    will fragment into byte-fallback tokens and blow up sequence
    lengths (deterministic twin of the real fragmentation measure,
    b_llm_bpe_tokens).

    100 TB shape: one tokenize+count pass (the b_llm_bm25 shuffle on
    word), the K-row vocabulary broadcasts into a map-side left join,
    and the per-source rollup carries |sources| rows.  Tie-break on
    the word makes the vocabulary itself deterministic — the hash
    certifies vocab selection AND coverage arithmetic."""
    from pyspark.sql import Window

    toks = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "source", F.explode(F.split("text", " ")).alias("word"))
        .where(F.col("word") != "")
    )
    # top-K pick is sort+limit (TakeOrderedAndProject), so the rank
    # window below runs over K rows, never the vocab frame
    w = Window.orderBy(F.col("f").desc(), "word")
    vocab = (
        toks.where((F.col("doc_id") / 20).cast("long") % 2 == 0)
        .groupBy("word")
        .agg(F.count("*").alias("f"))
        .orderBy(F.col("f").desc(), "word")
        .limit(_OOV_VOCAB_K)
        .withColumn("rn", F.row_number().over(w))
        .select("word", F.lit(True).alias("in_vocab"))
    )
    return (
        toks.where((F.col("doc_id") / 20).cast("long") % 2 == 1)
        .join(F.broadcast(vocab), "word", "left")
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_oov"),
            F.round(
                F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0)).cast("double")
                / F.count("*"),
                6,
            ).alias("oov_rate"),
        )
    )


# --- BLEU-2 pairwise overlap between neighbor docs (C166) ------------

# Clipped n-gram precision (Papineni et al. 2002, public): for each
# (candidate, reference) pair the per-gram contribution is
# min(count_cand, count_ref) — exact integers — and only the final
# geometric mean / brevity penalty is double math on those integers,
# scaled to integer millionths at the boundary (the b_llm_bm25
# convention).  Pairs are each doc vs its successor within the same
# source (doc_id + 20 stride — the generator's per-source step).
_BLEU_ORACLE = """
WITH pairs AS (
  SELECT a.doc_id AS cand_id, b.doc_id AS ref_id
  FROM documents a JOIN documents b
    ON b.doc_id = a.doc_id + 20 AND b.source = a.source
),
uni AS (
  SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS c
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS g FROM documents)
  GROUP BY doc_id, g
),
big AS (
  SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS c
  FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i + 1])) AS g
    FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
  )
  GROUP BY doc_id, g
),
tot1 AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS t FROM uni GROUP BY doc_id),
tot2 AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS t FROM big GROUP BY doc_id),
clip1 AS (
  SELECT p.cand_id, CAST(SUM(LEAST(uc.c, ur.c)) AS BIGINT) AS c1
  FROM pairs p
  JOIN uni uc ON uc.doc_id = p.cand_id
  JOIN uni ur ON ur.doc_id = p.ref_id AND ur.g = uc.g
  GROUP BY p.cand_id
),
clip2 AS (
  SELECT p.cand_id, CAST(SUM(LEAST(bc.c, br.c)) AS BIGINT) AS c2
  FROM pairs p
  JOIN big bc ON bc.doc_id = p.cand_id
  JOIN big br ON br.doc_id = p.ref_id AND br.g = bc.g
  GROUP BY p.cand_id
)
SELECT p.cand_id, p.ref_id,
       t1.t AS t1, COALESCE(c1.c1, 0) AS c1,
       t2.t AS t2, COALESCE(c2.c2, 0) AS c2,
       CAST(ROUND(1000000 * (CASE WHEN t1.t >= r1.t THEN 1.0
                 ELSE exp(1 - CAST(r1.t AS DOUBLE) / t1.t) END)) AS BIGINT) AS bp_m,
       CASE WHEN COALESCE(c1.c1, 0) = 0 OR COALESCE(c2.c2, 0) = 0 THEN 0
            ELSE CAST(ROUND(1000000 * (CASE WHEN t1.t >= r1.t THEN 1.0
                      ELSE exp(1 - CAST(r1.t AS DOUBLE) / t1.t) END)
                 * exp(0.5 * (ln(CAST(c1.c1 AS DOUBLE) / t1.t)
                            + ln(CAST(c2.c2 AS DOUBLE) / t2.t)))) AS BIGINT)
       END AS bleu2_m
FROM pairs p
JOIN tot1 t1 ON t1.doc_id = p.cand_id
JOIN tot1 r1 ON r1.doc_id = p.ref_id
JOIN tot2 t2 ON t2.doc_id = p.cand_id
LEFT JOIN clip1 c1 ON c1.cand_id = p.cand_id
LEFT JOIN clip2 c2 ON c2.cand_id = p.cand_id
"""


@register("b_llm_bleu_pairs", oracle=_BLEU_ORACLE, tags=("pipeline", "text", "overlap"))
def b_llm_bleu_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C166: BLEU-2 (clipped unigram+bigram precision, brevity
    penalty) between each document and its same-source successor —
    the asymmetric overlap metric that complements the symmetric
    Jaccard (b_llm_jaccard) and edit-distance (b_llm_editdist)
    detectors: clipping catches verbatim phrase reuse that set
    overlap dilutes, which is how eval-contamination reports score
    match strength.

    100 TB shape: n-gram count tables are built in ONE tokenize+count
    pass each (shuffle on (doc, gram)); the clipped intersection is a
    gram-keyed join between candidate and reference counts — at scale
    this joins on the gram hash, never materializing doc×doc score
    matrices, and pairs come from an id-stride self-join that a
    sorted-by-doc_id layout makes co-partitioned. All counts are
    exact longs; see _BLEU_ORACLE's convention note."""
    d = load_table(spark, sf_dir, "documents")
    pairs = (
        d.alias("a")
        .join(
            d.alias("b"),
            (F.col("b.doc_id") == F.col("a.doc_id") + 20)
            & (F.col("b.source") == F.col("a.source")),
        )
        .select(F.col("a.doc_id").alias("cand_id"), F.col("b.doc_id").alias("ref_id"))
    )
    uni = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    big = (
        d.select(
            "doc_id",
            F.explode(
                F.expr(
                    "zip_with(slice(split(text, ' '), 1, size(split(text, ' ')) - 1),"
                    "         slice(split(text, ' '), 2, size(split(text, ' ')) - 1),"
                    "         (a, b) -> concat(a, ' ', b))"
                )
            ).alias("g"),
        )
        .groupBy("doc_id", "g")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    tot1 = uni.groupBy("doc_id").agg(F.sum("c").cast("bigint").alias("t"))
    tot2 = big.groupBy("doc_id").agg(F.sum("c").cast("bigint").alias("t"))

    def clipped(counts: DataFrame, out: str) -> DataFrame:
        cc = counts.select(F.col("doc_id").alias("cand_id"), "g", F.col("c").alias("cc"))
        rc = counts.select(F.col("doc_id").alias("ref_id"), "g", F.col("c").alias("rc"))
        return (
            pairs.join(cc, "cand_id")
            .join(rc, ["ref_id", "g"])
            .groupBy("cand_id")
            .agg(F.sum(F.least("cc", "rc")).cast("bigint").alias(out))
        )
    c1 = clipped(uni, "c1")
    c2 = clipped(big, "c2")
    j = (
        pairs.join(tot1.select(F.col("doc_id").alias("cand_id"), F.col("t").alias("t1")), "cand_id")
        .join(tot1.select(F.col("doc_id").alias("ref_id"), F.col("t").alias("r1")), "ref_id")
        .join(tot2.select(F.col("doc_id").alias("cand_id"), F.col("t").alias("t2")), "cand_id")
        .join(c1, "cand_id", "left")
        .join(c2, "cand_id", "left")
        .select(
            "cand_id", "ref_id", "t1",
            F.coalesce("c1", F.lit(0).cast("bigint")).alias("c1"),
            "t2",
            F.coalesce("c2", F.lit(0).cast("bigint")).alias("c2"),
            "r1",
        )
    )
    bp = F.when(F.col("t1") >= F.col("r1"), F.lit(1.0)).otherwise(
        F.exp(1 - F.col("r1").cast("double") / F.col("t1"))
    )
    bleu = F.when((F.col("c1") == 0) | (F.col("c2") == 0), F.lit(0).cast("bigint")).otherwise(
        F.round(
            1_000_000
            * bp
            * F.exp(
                0.5
                * (
                    F.log(F.col("c1").cast("double") / F.col("t1"))
                    + F.log(F.col("c2").cast("double") / F.col("t2"))
                )
            )
        ).cast("bigint")
    )
    return j.select(
        "cand_id", "ref_id", "t1", "c1", "t2", "c2",
        F.round(1_000_000 * bp).cast("bigint").alias("bp_m"),
        bleu.alias("bleu2_m"),
    )


# --- PMI word co-occurrence (C172) -----------------------------------

_PMI_MIN_COOC = 5   # support floor: pairs must co-occur in >= 5 docs
_PMI_TOPN = 20

_PMI_ORACLE = f"""
WITH dw AS (
  SELECT DISTINCT doc_id, word
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE word <> ''
),
n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs FROM dw),
dfreq AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS df FROM dw GROUP BY word),
cooc AS (
  SELECT a.word AS w1, b.word AS w2, CAST(COUNT(*) AS BIGINT) AS c12
  FROM dw a JOIN dw b ON a.doc_id = b.doc_id AND a.word < b.word
  GROUP BY a.word, b.word
  HAVING COUNT(*) >= {_PMI_MIN_COOC}
),
scored AS (
  SELECT w1, w2, c12, d1.df AS df1, d2.df AS df2,
         CAST(ROUND(1000000 * ln(CAST(n_docs * c12 AS DOUBLE) / (d1.df * d2.df)))
              AS BIGINT) AS pmi_m
  FROM cooc JOIN dfreq d1 ON d1.word = w1
            JOIN dfreq d2 ON d2.word = w2
            CROSS JOIN n
)
SELECT w1, w2, c12, df1, df2, pmi_m, CAST(rn AS INT) AS rn FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY pmi_m DESC, w1, w2) AS rn FROM scored
) WHERE rn <= {_PMI_TOPN}
"""


@register("b_llm_pmi_cooc", oracle=_PMI_ORACLE, tags=("pipeline", "text", "cooccurrence"))
def b_llm_pmi_cooc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C172: document-level pointwise mutual information between word
    pairs — PMI = ln(N·c12/(df1·df2)) — the association statistic
    under phrase mining, collocation extraction, and count-based
    embedding matrices (PMI-SVD). The support floor keeps the
    rare-pair PMI explosion (c12=1 pairs dominate raw PMI) out of
    the ranking, the standard mitigation.

    100 TB shape: the doc-word incidence dedups in one (doc, word)
    shuffle; the co-occurrence self-join co-partitions on doc_id so
    each doc expands its own pair list locally (per-doc cost bounded
    by distinct-words²; a vocabulary cap or per-doc top-terms filter
    bounds the hot docs — same skew playbook as the graph wedge
    join); the pair rollup is the only vocabulary²-keyed exchange
    and the HAVING floor prunes it before ranking. PMI itself is one
    ln on identical exact-integer ratios, rounded at the millionth
    boundary (the b_llm_bm25 convention)."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    dw = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .where(F.col("word") != "")
        .distinct()
    )
    n_docs = dw.select("doc_id").distinct().count()
    dfreq = dw.groupBy("word").agg(F.count("*").cast("bigint").alias("df"))
    a = dw.select("doc_id", F.col("word").alias("w1"))
    b = dw.select(F.col("doc_id").alias("db"), F.col("word").alias("w2"))
    cooc = (
        a.join(b, (a.doc_id == b.db) & (F.col("w1") < F.col("w2")))
        .groupBy("w1", "w2")
        .agg(F.count("*").cast("bigint").alias("c12"))
        .where(F.col("c12") >= _PMI_MIN_COOC)
    )
    pmi_m = F.round(
        1_000_000
        * F.log(
            (F.lit(n_docs) * F.col("c12")).cast("double") / (F.col("df1") * F.col("df2"))
        )
    ).cast("bigint")
    w = Window.orderBy(F.col("pmi_m").desc(), "w1", "w2")
    return (
        cooc.join(F.broadcast(dfreq.select(F.col("word").alias("w1"), F.col("df").alias("df1"))), "w1")
        .join(F.broadcast(dfreq.select(F.col("word").alias("w2"), F.col("df").alias("df2"))), "w2")
        .select("w1", "w2", "c12", "df1", "df2", pmi_m.alias("pmi_m"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _PMI_TOPN)
    )


# --- Zipf-law fit of the term-frequency distribution (C178) -----------

_ZIPF_TOPN = 100

# Corpus health diagnostic: natural-language term frequencies follow
# freq ~ rank^(-s) with s ~= 1; template-heavy or synthetic corpora
# bend the log-log line.  The fit is OLS of ln(freq) on ln(rank) over
# the top-100 ranks.  Cross-engine exactness: each ln lands on an
# exact integer input and is rounded to integer millionths at the
# term boundary (the b_llm_perplexity convention), so the moment sums
# (Sx, Sy, Sxy, Sxx over n=100 rows of ~1e6-scaled values) are exact
# longs and the slope/intercept are single divisions on identical
# longs.
_ZIPF_ORACLE = f"""
WITH words AS (
  SELECT unnest(string_split(text, ' ')) AS word FROM documents
),
freq AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS f
  FROM words WHERE word <> '' GROUP BY word
),
top AS (
  SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY f DESC, word) AS BIGINT) AS r
  FROM freq QUALIFY r <= {_ZIPF_TOPN}
),
pts AS (
  SELECT CAST(ROUND(1000000 * ln(r)) AS BIGINT) AS x_m,
         CAST(ROUND(1000000 * ln(f)) AS BIGINT) AS y_m
  FROM top
),
mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x_m) AS BIGINT) AS sx, CAST(SUM(y_m) AS BIGINT) AS sy,
         CAST(SUM(x_m * y_m) AS BIGINT) AS sxy,
         CAST(SUM(x_m * x_m) AS BIGINT) AS sxx
  FROM pts
)
SELECT n, sx, sy, sxy, sxx,
       CAST(ROUND(1000000.0 * (n * sxy - sx * sy) / (n * sxx - sx * sx))
            AS BIGINT) AS slope_m,
       CAST(ROUND((1.0 * sy - 1.0 * (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx)
                  / n) AS BIGINT) AS intercept_m
FROM mom
"""


@register("b_llm_zipf", oracle=_ZIPF_ORACLE, tags=("pipeline", "text", "zipf"))
def b_llm_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C178: Zipf-law fit of the corpus term-frequency distribution —
    OLS slope of ln(freq) vs ln(rank) over the top-100 ranks.  The
    one-number corpus-health diagnostic (natural text gives slope
    ~ -1; boilerplate floods or dedup failures flatten the head and
    steepen the tail), complementing b_llm_freq_quality's per-doc
    form with a corpus-level statistic.

    Scale shape: the term rollup is the one data-sized shuffle; the
    top-100 head is a TakeOrderedAndProject (per-partition heaps — no
    vocabulary-sized global sort); the fit reduces 100 rows to one.
    Exactness: see _ZIPF_ORACLE's note."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    freq = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("f"))
    )
    top = (
        freq.orderBy(F.col("f").desc(), "word")
        .limit(_ZIPF_TOPN)
        .withColumn(
            "r",
            F.row_number()
            .over(Window.orderBy(F.col("f").desc(), "word"))
            .cast("bigint"),
        )
    )
    pts = top.select(
        F.round(1_000_000 * F.log("r")).cast("bigint").alias("x_m"),
        F.round(1_000_000 * F.log("f")).cast("bigint").alias("y_m"),
    )
    mom = pts.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x_m").cast("bigint").alias("sx"),
        F.sum("y_m").cast("bigint").alias("sy"),
        F.sum(F.col("x_m") * F.col("y_m")).cast("bigint").alias("sxy"),
        F.sum(F.col("x_m") * F.col("x_m")).cast("bigint").alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = num.cast("double") / den.cast("double")
    return mom.select(
        "n",
        "sx",
        "sy",
        "sxy",
        "sxx",
        F.round(1_000_000 * slope).cast("bigint").alias("slope_m"),
        F.round((F.col("sy").cast("double") - slope * F.col("sx")) / F.col("n"))
        .cast("bigint")
        .alias("intercept_m"),
    )


# --- Boilerplate chunk mining (C183) -----------------------------------

_BP_CHUNK = 10      # words per aligned chunk
_BP_MIN_DOCS = 3    # chunk must recur in >= 3 distinct docs
_BP_TOPN = 15

# CCNet-style paragraph-hash boilerplate mining, adapted to this
# corpus's structure (no newlines — "paragraphs" are the aligned
# 10-word chunks b_llm_chunking uses).  Catalogs the chunks recurring
# across >= 3 distinct documents: headers, navigation strings, and
# license blurbs are exactly what this surfaces in a web corpus, and
# removing them (rather than whole near-dup docs) is the CCNet
# pipeline's first cleaning stage.  Different output contract from
# b_llm_substring_dedup (sliding-window pair detection): this emits
# the boilerplate CATALOG — the chunk text itself, its document
# reach, and its repetition count.
_BOILERPLATE_ORACLE = f"""
WITH words AS (
  SELECT doc_id, w.word AS word, w.pos AS pos
  FROM documents,
       LATERAL (
         SELECT UNNEST(string_split(text, ' ')) AS word,
                generate_subscripts(string_split(text, ' '), 1) AS pos
       ) AS w
),
chunks AS (
  SELECT doc_id, (pos - 1) // {_BP_CHUNK} AS cid,
         string_agg(word, ' ' ORDER BY pos) AS chunk,
         COUNT(*) AS n_words
  FROM words GROUP BY doc_id, (pos - 1) // {_BP_CHUNK}
  HAVING COUNT(*) = {_BP_CHUNK}
),
stats AS (
  SELECT chunk,
         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
         CAST(COUNT(*) AS BIGINT) AS n_occ
  FROM chunks GROUP BY chunk
  HAVING COUNT(DISTINCT doc_id) >= {_BP_MIN_DOCS}
)
SELECT chunk, n_docs, n_occ, CAST(rn AS INT) AS rn FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY n_docs DESC, n_occ DESC, chunk) AS rn
  FROM stats
) WHERE rn <= {_BP_TOPN}
"""


@register("b_llm_boilerplate", oracle=_BOILERPLATE_ORACLE, tags=("pipeline", "text", "boilerplate"))
def b_llm_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C183: boilerplate chunk catalog — aligned {chunk}-word segments
    recurring in >= {mind} distinct documents, ranked by document
    reach.  The CCNet cleaning stage that precedes document-level
    dedup: repeated segments are removed from otherwise-unique pages.

    100 TB shape: chunking is map-side (posexplode + integer-divide
    group); the only data-sized exchange keys on (doc, chunk-id) and
    immediately reduces again on the chunk hash — in production the
    md5 of the chunk shuffles, not the text (the b_llm_dedup_exact
    move); here the chunk strings are 10 words and the catalog is
    support-floored before ranking."""
    d = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    words = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word")
    )
    chunks = (
        words.groupBy("doc_id", (F.col("pos") / _BP_CHUNK).cast("int").alias("cid"))
        .agg(
            F.concat_ws(" ", F.array_sort(F.collect_list(F.struct("pos", "word")))
                        .getField("word")).alias("chunk"),
            F.count("*").alias("n_words"),
        )
        .where(F.col("n_words") == _BP_CHUNK)
    )
    stats = (
        chunks.groupBy("chunk")
        .agg(
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
            F.count("*").cast("bigint").alias("n_occ"),
        )
        .where(F.col("n_docs") >= _BP_MIN_DOCS)
    )
    w = Window.orderBy(F.col("n_docs").desc(), F.col("n_occ").desc(), "chunk")
    return (
        stats.orderBy(F.col("n_docs").desc(), F.col("n_occ").desc(), "chunk")
        .limit(_BP_TOPN)
        .withColumn("rn", F.row_number().over(w).cast("int"))
    )


b_llm_boilerplate.__doc__ = b_llm_boilerplate.__doc__.format(
    chunk=_BP_CHUNK, mind=_BP_MIN_DOCS
)


# --- RAKE keyword extraction (C187) --------------------------------------

_RAKE_STOP = ("a", "the")   # the corpus's function words
_RAKE_MAX_LEN = 6
_RAKE_TOPN = 15

# Rapid Automatic Keyword Extraction (Rose et al. 2010): candidate
# phrases are maximal stopword-delimited word runs (capped at 6
# words); each word scores degree/frequency over all candidate
# OCCURRENCES (degree sums the lengths of phrases containing it),
# and a distinct phrase scores the sum of its member words' scores.
# Word scores round to integer millionths BEFORE the phrase sum, so
# the phrase score is an order-independent exact long sum.
_RAKE_ORACLE = f"""
WITH words AS (
  SELECT doc_id, w.word AS word, w.pos AS pos
  FROM documents,
       LATERAL (
         SELECT UNNEST(string_split(text, ' ')) AS word,
                generate_subscripts(string_split(text, ' '), 1) AS pos
       ) AS w
),
runs AS (
  SELECT doc_id, word, pos,
         SUM(CASE WHEN word IN ('a', 'the') THEN 1 ELSE 0 END)
             OVER (PARTITION BY doc_id ORDER BY pos) AS pid
  FROM words
),
occurrences AS (
  SELECT doc_id, pid,
         string_agg(word, ' ' ORDER BY pos) AS phrase,
         CAST(COUNT(*) AS BIGINT) AS plen
  FROM runs WHERE word NOT IN ('a', 'the') AND word <> ''
  GROUP BY doc_id, pid
  HAVING COUNT(*) <= {_RAKE_MAX_LEN}
),
wstats AS (
  SELECT m.word, CAST(COUNT(*) AS BIGINT) AS freq, CAST(SUM(o.plen) AS BIGINT) AS deg
  FROM occurrences o,
       LATERAL (SELECT UNNEST(string_split(o.phrase, ' ')) AS word) AS m
  GROUP BY m.word
),
wscore AS (
  SELECT word, CAST(ROUND(1000000 * CAST(deg AS DOUBLE) / freq) AS BIGINT) AS score_m
  FROM wstats
),
cand AS (
  SELECT phrase, CAST(MAX(plen) AS BIGINT) AS plen, CAST(COUNT(*) AS BIGINT) AS n_occ
  FROM occurrences GROUP BY phrase
),
pscore AS (
  SELECT c.phrase, c.plen, c.n_occ, CAST(SUM(s.score_m) AS BIGINT) AS rake_m
  FROM cand c,
       LATERAL (SELECT UNNEST(string_split(c.phrase, ' ')) AS word) AS m
       JOIN wscore s ON s.word = m.word
  GROUP BY c.phrase, c.plen, c.n_occ
)
SELECT phrase, plen, n_occ, rake_m, CAST(rn AS INT) AS rn FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY rake_m DESC, phrase) AS rn FROM pscore
) WHERE rn <= {_RAKE_TOPN}
"""


@register("b_llm_rake", oracle=_RAKE_ORACLE, tags=("pipeline", "text", "keywords"))
def b_llm_rake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C187: RAKE keyword extraction — stopword-delimited candidate
    phrases scored by the sum of member-word degree/frequency ratios.
    The zero-training keyphrase miner used for corpus tagging and
    topic labeling; complements b_llm_pmi_cooc (pairwise association)
    with multi-word unit extraction.

    100 TB shape: the phrase segmentation is a per-doc window over
    the (doc, pos) exploded stream (doc-co-partitioned, the text
    ops' standard shuffle); word stats key on the vocabulary and the
    phrase rollup on distinct phrase text — both support-bounded;
    the word-score join broadcasts the vocabulary-sized score table.
    Exactness: see _RAKE_ORACLE's note."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word")
    )
    is_stop = F.col("word").isin(*_RAKE_STOP)
    wrun = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, 0
    )
    runs = words.withColumn("pid", F.sum(is_stop.cast("int")).over(wrun))
    occurrences = (
        runs.where(~is_stop & (F.col("word") != ""))
        .groupBy("doc_id", "pid")
        .agg(
            F.concat_ws(
                " ",
                F.array_sort(F.collect_list(F.struct("pos", "word"))).getField("word"),
            ).alias("phrase"),
            F.count("*").cast("bigint").alias("plen"),
        )
        .where(F.col("plen") <= _RAKE_MAX_LEN)
    )
    members = occurrences.select(
        "phrase", "plen", F.explode(F.split("phrase", " ")).alias("word")
    )
    wscore = (
        members.groupBy("word")
        .agg(
            F.count("*").cast("bigint").alias("freq"),
            F.sum("plen").cast("bigint").alias("deg"),
        )
        .select(
            "word",
            F.round(1_000_000 * F.col("deg").cast("double") / F.col("freq"))
            .cast("bigint")
            .alias("score_m"),
        )
    )
    cand = occurrences.groupBy("phrase").agg(
        F.max("plen").cast("bigint").alias("plen"),
        F.count("*").cast("bigint").alias("n_occ"),
    )
    pscore = (
        cand.select("phrase", "plen", "n_occ", F.explode(F.split("phrase", " ")).alias("word"))
        .join(F.broadcast(wscore), "word")
        .groupBy("phrase", "plen", "n_occ")
        .agg(F.sum("score_m").cast("bigint").alias("rake_m"))
    )
    w = Window.orderBy(F.col("rake_m").desc(), "phrase")
    return (
        pscore.orderBy(F.col("rake_m").desc(), "phrase")
        .limit(_RAKE_TOPN)
        .withColumn("rn", F.row_number().over(w).cast("int"))
    )


# --- Positional phrase search (C191) --------------------------------------

_PHRASE_TOPQ = 5   # search the corpus's 5 most frequent bigrams

# Exact phrase search via a positional inverted index — the search
# primitive bag-of-words indexes can't answer ("new york" is not
# "york new").  Postings carry (doc, term, pos); a two-term phrase
# match joins term-1 postings at pos with term-2 postings at pos+1,
# co-partitioned on doc.  Query phrases are the corpus's own top
# bigrams so the key stays self-contained and support is guaranteed.
_PHRASE_ORACLE = f"""
WITH postings AS (
  SELECT doc_id, w.word AS term, w.pos AS pos
  FROM documents,
       LATERAL (
         SELECT UNNEST(string_split(text, ' ')) AS word,
                generate_subscripts(string_split(text, ' '), 1) AS pos
       ) AS w
  WHERE w.word <> ''
),
bigrams AS (
  SELECT a.term AS t1, b.term AS t2, CAST(COUNT(*) AS BIGINT) AS bf
  FROM postings a JOIN postings b
       ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  GROUP BY a.term, b.term
),
queries AS (
  SELECT t1, t2, bf, CAST(qid AS INT) AS qid FROM (
    SELECT *, ROW_NUMBER() OVER (ORDER BY bf DESC, t1, t2) AS qid FROM bigrams
  ) WHERE qid <= {_PHRASE_TOPQ}
),
hits AS (
  SELECT q.qid, q.t1, q.t2, a.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_hits,
         CAST(MIN(a.pos) AS BIGINT) AS first_pos
  FROM queries q
       JOIN postings a ON a.term = q.t1
       JOIN postings b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1 AND b.term = q.t2
  GROUP BY q.qid, q.t1, q.t2, a.doc_id
)
SELECT qid, t1, t2, doc_id, n_hits, first_pos,
       CAST(ROW_NUMBER() OVER (PARTITION BY qid
            ORDER BY n_hits DESC, doc_id) AS INT) AS rn
FROM hits
QUALIFY rn <= 10
"""


@register("b_llm_phrase_search", oracle=_PHRASE_ORACLE, tags=("pipeline", "search", "phrase"))
def b_llm_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C191: exact phrase search over a positional inverted index —
    per query phrase, the top-10 documents by phrase-hit count with
    the first match position.  Extends b_llm_inverted_index (term →
    docs) with the positions a phrase/proximity query needs; the
    query set is the corpus's 5 hottest bigrams (self-contained, like
    b_llm_bm25's more-like-this queries).

    100 TB shape: postings explode map-side and shuffle once on doc
    (the adjacency self-join is doc-co-partitioned — each doc matches
    its own positions locally); query phrases broadcast into the
    term-1 postings scan, so the candidate stream is postings-of-t1
    sized, never corpus-sized; per-query ranking is a WindowGroupLimit
    top-10."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    postings = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "term")
    ).where(F.col("term") != "")
    a = postings.select("doc_id", F.col("term").alias("t1"), F.col("pos").alias("p1"))
    b = postings.select(
        F.col("doc_id").alias("doc_b"), F.col("term").alias("t2b"), F.col("pos").alias("p2")
    )
    bigrams = (
        a.join(b, (a.doc_id == b.doc_b) & (F.col("p2") == F.col("p1") + 1))
        .groupBy("t1", F.col("t2b").alias("t2"))
        .agg(F.count("*").cast("bigint").alias("bf"))
    )
    wq = Window.orderBy(F.col("bf").desc(), "t1", "t2")
    queries = (
        bigrams.orderBy(F.col("bf").desc(), "t1", "t2")
        .limit(_PHRASE_TOPQ)
        .withColumn("qid", F.row_number().over(wq).cast("int"))
    )
    cand = a.join(
        F.broadcast(queries.select("qid", "t1", "t2")), "t1"
    )  # postings of t1 joined to the tiny query table
    hits = (
        cand.join(
            b,
            (F.col("doc_b") == F.col("doc_id"))
            & (F.col("p2") == F.col("p1") + 1)
            & (F.col("t2b") == F.col("t2")),
        )
        .groupBy("qid", "t1", "t2", "doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_hits"),
            (F.min("p1") + 1).cast("bigint").alias("first_pos"),  # 1-based like the oracle
        )
    )
    wr = Window.partitionBy("qid").orderBy(F.col("n_hits").desc(), "doc_id")
    return (
        hits.withColumn("rn", F.row_number().over(wr).cast("int"))
        .where(F.col("rn") <= 10)
        .select("qid", "t1", "t2", "doc_id", "n_hits", "first_pos", "rn")
    )


# --- Content-defined chunking (C202) ----------------------------------------

_CDC_MASK = 8      # boundary when md5(word) % 8 == 0 → ~8-word chunks
_CDC_MIN_DOCS = 3
_CDC_TOPN = 15

# FastCDC-style content-defined chunking on the word stream: a chunk
# boundary falls AFTER any word whose (md5-derived) hash satisfies
# the mask — boundaries depend only on local content, so an insertion
# near the head re-chunks O(1) chunks instead of shifting every
# aligned window (the property that makes CDC the storage-dedup
# standard; b_llm_boilerplate's aligned chunks lack it, and the test
# demonstrates the difference).  The chunk id is the running count of
# boundaries before each word — one window per doc, map-side hashing.
_CDC_ORACLE = f"""
WITH words AS (
  SELECT doc_id, w.word AS word, w.pos AS pos,
         CASE WHEN CAST(concat('0x', substring(md5(w.word), 1, 8)) AS BIGINT)
                   % {_CDC_MASK} = 0 THEN 1 ELSE 0 END AS bnd
  FROM documents,
       LATERAL (
         SELECT UNNEST(string_split(text, ' ')) AS word,
                generate_subscripts(string_split(text, ' '), 1) AS pos
       ) AS w
  WHERE w.word <> ''
),
cid AS (
  SELECT doc_id, word, pos,
         SUM(bnd) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS c
  FROM words
),
chunks AS (
  SELECT doc_id, COALESCE(c, 0) AS c,
         string_agg(word, ' ' ORDER BY pos) AS chunk,
         CAST(COUNT(*) AS BIGINT) AS n_words
  FROM cid GROUP BY doc_id, COALESCE(c, 0)
),
stats AS (
  SELECT chunk, CAST(MAX(n_words) AS BIGINT) AS n_words,
         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
         CAST(COUNT(*) AS BIGINT) AS n_occ
  FROM chunks GROUP BY chunk
  HAVING COUNT(DISTINCT doc_id) >= {_CDC_MIN_DOCS}
)
SELECT chunk, n_words, n_docs, n_occ, CAST(rn AS INT) AS rn FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY n_docs DESC, n_occ DESC, chunk) AS rn
  FROM stats
) WHERE rn <= {_CDC_TOPN}
"""


@register("b_llm_cdc_chunks", oracle=_CDC_ORACLE, tags=("pipeline", "text", "cdc"))
def b_llm_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C202: content-defined chunking (FastCDC normal form) — chunk
    boundaries fall where a word's hash satisfies the mask, so chunk
    identity survives insertions/deletions elsewhere in the document
    (the shift-robustness aligned chunking lacks — demonstrated in
    the test).  Emits the recurring-chunk catalog, the
    storage/dedup view of the corpus.

    100 TB shape: hashing and boundary flags are map-side; the chunk
    assembly shuffles once on (doc, chunk-id); the catalog rollup
    keys on chunk text (md5 of it at production scale) with the
    support floor pruning before ranking."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word")
    ).where(F.col("word") != "")
    bnd = (
        F.conv(F.substring(F.md5("word"), 1, 8), 16, 10).cast("bigint") % _CDC_MASK
        == 0
    ).cast("int")
    wprev = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cid = words.withColumn(
        "c", F.coalesce(F.sum(bnd).over(wprev), F.lit(0))
    )
    chunks = cid.groupBy("doc_id", "c").agg(
        F.concat_ws(
            " ", F.array_sort(F.collect_list(F.struct("pos", "word"))).getField("word")
        ).alias("chunk"),
        F.count("*").cast("bigint").alias("n_words"),
    )
    stats = (
        chunks.groupBy("chunk")
        .agg(
            F.max("n_words").cast("bigint").alias("n_words"),
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
            F.count("*").cast("bigint").alias("n_occ"),
        )
        .where(F.col("n_docs") >= _CDC_MIN_DOCS)
    )
    w = Window.orderBy(F.col("n_docs").desc(), F.col("n_occ").desc(), "chunk")
    return (
        stats.orderBy(F.col("n_docs").desc(), F.col("n_occ").desc(), "chunk")
        .limit(_CDC_TOPN)
        .withColumn("rn", F.row_number().over(w).cast("int"))
        .select("chunk", "n_words", "n_docs", "n_occ", "rn")
    )


# --- Lexical diversity: type-token ratio + hapax rate (C213) -------------------

# Per-language roll-up of per-document lexical diversity — the
# third classic text-quality axis next to b_llm_quality's surface
# ratios and b_llm_freq_quality's corpus-frequency score: low TTR
# flags template/boilerplate docs, high hapax share flags OCR noise
# and gibberish.  Ratios are exact integer millionths (integer div),
# summed as BIGINTs.
_TTR_ORACLE = """
WITH tok AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word FROM documents
),
perword AS (
  SELECT doc_id, lang, word, COUNT(*) AS c FROM tok GROUP BY 1, 2, 3
),
perdoc AS (
  SELECT doc_id, lang,
         CAST(SUM(c) AS BIGINT) AS n_tokens,
         CAST(COUNT(*) AS BIGINT) AS n_types,
         CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
  FROM perword GROUP BY 1, 2
)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
       CAST(SUM(n_types) AS BIGINT) AS sum_types,
       CAST(SUM(n_hapax) AS BIGINT) AS sum_hapax,
       CAST(SUM((1000000 * n_types) // n_tokens) AS BIGINT) AS sum_ttr_m,
       CAST(SUM((1000000 * n_hapax) // n_types) AS BIGINT) AS sum_hapax_m
FROM perdoc GROUP BY lang ORDER BY lang
"""


@register("b_llm_ttr", oracle=_TTR_ORACLE, tags=("pipeline", "textstats", "quality"))
def b_llm_ttr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C213: type-token ratio and hapax-legomenon rate per document,
    rolled up by language — lexical diversity, the standard
    boilerplate/gibberish axis the surface-ratio quality score
    (b_llm_quality) can't see.

    Scale shape: the per-doc type/hapax counts are computed MAP-SIDE
    from one sort_array pass (a type is a run start in the sorted
    token array, a hapax a run of length 1) — the oracle's
    (doc, word) explode+rollup never materializes as a shuffle on the
    Spark side; the only exchange is the |langs|-row final rollup.
    Ratios are exact integer millionths; every sum is a BIGINT."""
    d = load_table(spark, sf_dir, "documents")
    sw = F.sort_array(F.split("text", " "))
    perdoc = d.select(
        "lang",
        F.size(sw).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(F.split("text", " "))).cast("bigint").alias("n_types"),
        F.expr(
            """CAST(size(filter(sequence(1, size(sort_array(split(text, ' ')))),
                 i -> (i = 1 OR element_at(sort_array(split(text, ' ')), i)
                              != element_at(sort_array(split(text, ' ')), i - 1))
                  AND (i = size(sort_array(split(text, ' '))) OR
                       element_at(sort_array(split(text, ' ')), i)
                              != element_at(sort_array(split(text, ' ')), i + 1))))
               AS BIGINT)"""
        ).alias("n_hapax"),
    )
    return (
        perdoc.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
            F.sum("n_types").cast("bigint").alias("sum_types"),
            F.sum("n_hapax").cast("bigint").alias("sum_hapax"),
            F.sum(F.expr("(1000000 * n_types) div n_tokens"))
            .cast("bigint")
            .alias("sum_ttr_m"),
            F.sum(F.expr("(1000000 * n_hapax) div n_types"))
            .cast("bigint")
            .alias("sum_hapax_m"),
        )
    )


# --- Vocabulary coverage curve (C226) -----------------------------------------------

# Tokenizer/vocab design's first question: what fraction of corpus
# tokens does a top-k vocabulary cover?  Rank words by (count DESC,
# word) — a total order, so the curve is deterministic — and read the
# cumulative coverage at k = 10 / 100 / 1000 / 10000.
_VOCAB_COVERAGE_ORACLE = """
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS word FROM documents
),
freq AS (SELECT word, COUNT(*) AS c FROM tok GROUP BY word),
ranked AS (
  SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, word) AS rnk,
         CAST(SUM(c) OVER (ORDER BY c DESC, word ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ccum,
         CAST(SUM(c) OVER () AS BIGINT) AS ctot,
         CAST(COUNT(*) OVER () AS BIGINT) AS vocab_size
  FROM freq
)
SELECT k, vocab_size, ctot AS total_tokens,
       CAST(MAX(CASE WHEN rnk <= k THEN ccum END) AS BIGINT) AS covered,
       CAST((1000000 * MAX(CASE WHEN rnk <= k THEN ccum END)) // ctot AS BIGINT)
           AS coverage_m
FROM ranked CROSS JOIN (VALUES (10), (100), (1000), (10000)) ks(k)
GROUP BY k, vocab_size, ctot ORDER BY k
"""


@register("b_llm_vocab_coverage", oracle=_VOCAB_COVERAGE_ORACLE, tags=("pipeline", "text", "vocab"))
def b_llm_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C226: vocabulary coverage curve — corpus-token share covered by
    the top-k most frequent words, k = 10/100/1000/10000, ranked by
    the total order (count DESC, word).  THE sizing curve for a
    tokenizer vocab or a stopword list; exact integer millionths.

    Scale shape: word-frequency rollup (map-side partials), then the
    rank window runs over only the TOP max-k candidates — fetched by
    a TakeOrdered limit (per-partition top-k + merge), never a global
    sort of the full vocabulary — while the two totals come from a
    1-row aggregate of the full frequency table."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    freq = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("c"))
    )
    totals = freq.agg(
        F.sum("c").cast("bigint").alias("ctot"),
        F.count("*").cast("bigint").alias("vocab_size"),
    )
    top = freq.orderBy(F.desc("c"), F.asc("word")).limit(10000)
    w = Window.orderBy(F.desc("c"), F.asc("word"))
    ranked = top.select(
        "c",
        F.row_number().over(w).alias("rnk"),
        F.sum("c").over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint")
        .alias("ccum"),
    ).crossJoin(F.broadcast(totals))
    ks = d.sparkSession.createDataFrame([(10,), (100,), (1000,), (10000,)], "k int")
    return (
        ranked.crossJoin(F.broadcast(ks))
        .groupBy("k", "vocab_size", F.col("ctot").alias("total_tokens"))
        .agg(
            F.max(F.when(F.col("rnk") <= F.col("k"), F.col("ccum")))
            .cast("bigint")
            .alias("covered"),
            F.expr(
                "CAST((1000000 * max(CASE WHEN rnk <= k THEN ccum END)) div max(ctot)"
                " AS BIGINT)"
            ).alias("coverage_m"),
        )
    )


# --- BPE tokenizer fertility by language (C227) ---------------------------------------

# Fertility = BPE tokens per whitespace word; chars-per-token is its
# cost-side twin.  THE tokenizer-efficiency report (a vocab that
# fragments one language 2x inflates that language's training cost
# 2x) — composed directly on the C151 BPE kernel and its
# replay-in-SQL oracle, so the merges are the real ones.
_FERTILITY_ORACLE = f"""
WITH bpe AS ({_BPE_ORACLE})
SELECT d.lang, COUNT(*) AS n_docs,
       CAST(SUM(b.n_words) AS BIGINT) AS sum_words,
       CAST(SUM(b.n_bpe_tokens) AS BIGINT) AS sum_bpe,
       CAST(SUM(d.n_chars) AS BIGINT) AS sum_chars,
       CAST((1000000 * SUM(b.n_bpe_tokens)) // SUM(b.n_words) AS BIGINT) AS fertility_m,
       CAST((1000000 * SUM(d.n_chars)) // SUM(b.n_bpe_tokens) AS BIGINT) AS chars_per_tok_m
FROM bpe b JOIN documents d ON b.doc_id = d.doc_id
GROUP BY d.lang ORDER BY d.lang
"""


@register("b_llm_fertility", oracle=_FERTILITY_ORACLE, tags=("pipeline", "text", "bpe", "tokens"))
def b_llm_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C227: tokenizer fertility — BPE tokens per whitespace word and
    characters per BPE token, rolled up by language over the REAL
    C151 merge kernel (this builder composes b_llm_bpe_tokens, the
    oracle wraps its replay-in-SQL CTE).  Ratios are exact integer
    millionths of exact BIGINT sums.

    Scale shape: the BPE kernel is the zero-shuffle Arrow map pass it
    always was; this adds one doc_id-keyed join against the slim
    (lang, n_chars) projection and a |langs|-row rollup."""
    d = load_table(spark, sf_dir, "documents")
    bpe = b_llm_bpe_tokens(spark, sf_dir)
    joined = bpe.join(d.select("doc_id", "lang", "n_chars"), "doc_id")
    agg = joined.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_words").cast("bigint").alias("sum_words"),
        F.sum("n_bpe_tokens").cast("bigint").alias("sum_bpe"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
    )
    return agg.select(
        "lang",
        "n_docs",
        "sum_words",
        "sum_bpe",
        "sum_chars",
        F.expr("(1000000 * sum_bpe) div sum_words").cast("bigint").alias("fertility_m"),
        F.expr("(1000000 * sum_chars) div sum_bpe")
        .cast("bigint")
        .alias("chars_per_tok_m"),
    )

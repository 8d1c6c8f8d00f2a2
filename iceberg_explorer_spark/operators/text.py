"""Text-analysis operators for training-data pipelines (north-star extension).

Language ID, quality scoring, token counting, and document fingerprinting —
all as JVM-side DataFrame pipelines (split/explode/agg/window), no Python in
the hot path. Every metric is derived from integer counts and lengths so the
ratios are bit-identical doubles across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from iceberg_explorer_spark.operators.registry import query
from iceberg_explorer_spark.sources.registry import load_table

PROFILE_TOP_N = 10
PUNCT_CLASS = r"[.,!?;:]"


def _tokens(col: str = "text"):
    return F.split(F.lower(F.trim(F.col(col))), r"\s+")


# ---------------------------------------------------------------------------
@query(
    "text_language_id",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang,
             UNNEST(regexp_split_to_array(lower(trim(text)), '\\s+')) AS word
      FROM documents
    ),
    profile AS (
      SELECT lang AS p_lang, word, cnt FROM (
        SELECT lang, word, COUNT(*) AS cnt,
               RANK() OVER (PARTITION BY lang ORDER BY COUNT(*) DESC, word) AS r
        FROM toks WHERE doc_id % 5 = 0
        GROUP BY lang, word
      ) WHERE r <= {PROFILE_TOP_N}
    ),
    scores AS (
      SELECT t.doc_id, t.lang AS actual_lang, p.p_lang,
             CAST(SUM(p.cnt) AS BIGINT) AS score
      FROM (SELECT DISTINCT doc_id, lang, word FROM toks WHERE doc_id % 5 <> 0) t
      JOIN profile p ON t.word = p.word
      GROUP BY t.doc_id, t.lang, p.p_lang
    )
    SELECT doc_id, actual_lang, p_lang AS predicted_lang, score
    FROM (
      SELECT *, RANK() OVER (PARTITION BY doc_id
                             ORDER BY score DESC, p_lang) AS r
      FROM scores
    ) WHERE r = 1
    """,
    doc="N-gram-profile language ID: learn top-N word profiles per language "
    "from a 20% training split, score held-out docs by profile overlap, "
    "argmax with deterministic tie-break. Train and inference are both "
    "aggregations — the profile is tiny and broadcasts.",
)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", "lang", F.explode(_tokens()).alias("word"))
    train = toks.filter(F.col("doc_id") % 5 == 0)
    wr = W.partitionBy("lang").orderBy(F.col("cnt").desc(), "word")
    profile = (
        train.groupBy("lang", "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("r", F.rank().over(wr))
        .filter(F.col("r") <= PROFILE_TOP_N)
        .select(F.col("lang").alias("p_lang"), "word", "cnt")
    )
    test = toks.filter(F.col("doc_id") % 5 != 0).distinct()
    scores = (
        test.join(F.broadcast(profile), "word")
        .groupBy("doc_id", F.col("lang").alias("actual_lang"), "p_lang")
        .agg(F.sum("cnt").cast("bigint").alias("score"))
    )
    wbest = W.partitionBy("doc_id").orderBy(F.col("score").desc(), "p_lang")
    return (
        scores.withColumn("r", F.rank().over(wbest))
        .filter(F.col("r") == 1)
        .select("doc_id", "actual_lang", F.col("p_lang").alias("predicted_lang"), "score")
    )


# ---------------------------------------------------------------------------
@query(
    "text_quality_score",
    oracle=f"""
    SELECT doc_id,
           CAST(LENGTH(text) AS BIGINT) AS n_chars_measured,
           CAST(LEN(regexp_split_to_array(lower(trim(text)), '\\s+')) AS BIGINT)
             AS n_words,
           CAST(LENGTH(text) - LENGTH(regexp_replace(text, '{PUNCT_CLASS}', '', 'g'))
                AS BIGINT) AS n_punct,
           (LENGTH(text) - LENGTH(regexp_replace(text, '{PUNCT_CLASS}', '', 'g')))
             * 1.0 / LENGTH(text) AS punct_ratio,
           LENGTH(text) * 1.0
             / LEN(regexp_split_to_array(lower(trim(text)), '\\s+'))
             AS avg_word_span
    FROM documents
    WHERE LENGTH(text) > 0
    """,
    doc="Quality scoring: length, word count, punctuation ratio, mean word "
    "span — per-row JVM expressions, trivially parallel (no shuffle at all).",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    n_chars = F.length("text").cast("bigint")
    n_words = F.size(_tokens()).cast("bigint")
    n_punct = (
        F.length("text") - F.length(F.regexp_replace("text", PUNCT_CLASS, ""))
    ).cast("bigint")
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars_measured"),
        n_words.alias("n_words"),
        n_punct.alias("n_punct"),
        (n_punct * 1.0 / n_chars).alias("punct_ratio"),
        (n_chars * 1.0 / n_words).alias("avg_word_span"),
    )


# ---------------------------------------------------------------------------
@query(
    "text_token_count",
    oracle="""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(LEN(regexp_split_to_array(lower(trim(text)), '\\s+')))
                AS BIGINT) AS total_words,
           CAST(SUM(CAST(CEIL(LENGTH(text) / 4.0) AS BIGINT)) AS BIGINT)
             AS est_bpe_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY source
    """,
    doc="Token counting per corpus source: whitespace words + a BPE-style "
    "chars/4 estimate. One partial-aggregated shuffle on source.",
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(_tokens())).cast("bigint").alias("total_words"),
        F.sum(F.ceil(F.length("text") / 4.0).cast("bigint"))
        .cast("bigint")
        .alias("est_bpe_tokens"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


# ---------------------------------------------------------------------------
@query(
    "text_fingerprint",
    oracle="""
    WITH grams AS (
      SELECT doc_id, md5(substr(text, i, 8)) AS g
      FROM documents, UNNEST(generate_series(1, LENGTH(text) - 7)) AS t(i)
      WHERE LENGTH(text) >= 8
    )
    SELECT doc_id,
           MIN(g) AS fingerprint,
           COUNT(DISTINCT g) AS n_distinct_grams
    FROM grams GROUP BY doc_id
    """,
    doc="Winnowing-style fingerprint: min-of-md5 over sliding 8-char grams "
    "plus distinct-gram cardinality. The gram expansion is map-side "
    "(sequence+transform, no Python); only (doc, digest) aggregates shuffle.",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") >= 8)
    grams = docs.select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(1, length(text) - 7), i -> md5(substr(text, i, 8)))")
        ).alias("g"),
    )
    return grams.groupBy("doc_id").agg(
        F.min("g").alias("fingerprint"),
        F.countDistinct("g").alias("n_distinct_grams"),
    )

"""Text-analysis operators over the documents table (north-star §4).

Language-ID heuristic, quality scoring, token counting (whitespace + BPE-ish
regex), and document statistics — all built-in string/array functions, no
UDFs, so the whole hot path stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table
from ..plans.registry import register

# Shared stopword list (tiny, engine-portable).
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")
_STOP_SQL = "(" + ", ".join(f"'{w}'" for w in STOPWORDS) + ")"


@register(
    "q47_text_stats",
    sql=f"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT)                       AS n_chars_computed,
           n_chars                                            AS n_chars_stored,
           CAST(len(string_split(text, ' ')) AS BIGINT)       AS n_tokens,
           CAST(len(list_filter(string_split(text, ' '),
                                t -> t IN {_STOP_SQL})) AS BIGINT) AS n_stopwords,
           round(len(list_filter(string_split(text, ' '),
                                 t -> t IN {_STOP_SQL}))::DOUBLE
                 / len(string_split(text, ' ')), 6)           AS stopword_ratio,
           round((length(text) - length(replace(text, ' ', '')))::DOUBLE
                 / length(text), 6)                           AS space_ratio
    FROM documents
    """,
)
def q47_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-scoring primitives: char/token counts, stopword ratio, space
    ratio; cross-checks the stored n_chars column against length(text)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    return docs.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars_computed"),
        F.col("n_chars").alias("n_chars_stored"),
        F.size(toks).cast("bigint").alias("n_tokens"),
        n_stop.cast("bigint").alias("n_stopwords"),
        F.round(n_stop.cast("double") / F.size(toks), 6).alias("stopword_ratio"),
        F.round(
            (F.length("text") - F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))))
            .cast("double") / F.length("text"), 6)
        .alias("space_ratio"),
    )


@register(
    "q48_token_counting",
    sql=r"""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT)            AS ws_tokens,
           CAST(len(regexp_extract_all(text, '[a-z0-9]+|[^a-z0-9\s]')) AS BIGINT)
             AS bpe_ish_tokens,
           CAST(ceil(length(text) / 4.0) AS BIGINT)                AS byte_est_tokens
    FROM documents
    """,
)
def q48_token_counting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting three ways: whitespace split, BPE-ish regex (word /
    punctuation pieces), and the chars/4 budget heuristic used for LLM
    context estimation."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("ws_tokens"),
        F.regexp_count("text", F.lit(r"[a-z0-9]+|[^a-z0-9\s]")).cast("bigint")
        .alias("bpe_ish_tokens"),
        F.ceil(F.length("text") / 4.0).cast("bigint").alias("byte_est_tokens"),
    )


@register(
    "q49_lang_quality_rollup",
    sql=f"""
    SELECT lang, source,
           count(*) AS n_docs,
           round(avg(length(text)), 4) AS avg_chars,
           round(avg(len(string_split(text, ' '))), 4) AS avg_tokens,
           round(avg(len(list_filter(string_split(text, ' '),
                                     t -> t IN {_STOP_SQL}))::DOUBLE
                     / len(string_split(text, ' '))), 6) AS avg_stopword_ratio,
           CAST(sum(CASE WHEN length(text) BETWEEN 50 AND 2000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_length_ok
    FROM documents
    GROUP BY lang, source
    ORDER BY lang, source
    """,
)
def q49_lang_quality_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus quality dashboard: per (lang, source) doc counts, length/token
    averages, stopword ratio, and a length-window quality gate — the grouped
    rollup a training-data pipeline runs before sampling."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    stop_ratio = (
        F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))).cast("double")
        / F.size(toks)
    )
    return (
        docs.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg(F.length("text")), 4).alias("avg_chars"),
            F.round(F.avg(F.size(toks)), 4).alias("avg_tokens"),
            F.round(F.avg(stop_ratio), 6).alias("avg_stopword_ratio"),
            F.sum(F.when(F.length("text").between(50, 2000), 1).otherwise(0))
            .cast("bigint").alias("n_length_ok"),
        )
        .orderBy("lang", "source")
    )


def rolling_fingerprint(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 16,
                        keep: int = 3, base: int = 31,
                        mod: int = 1_000_000_007) -> DataFrame:
    """Winnowing-style document fingerprint: polynomial (Rabin-Karp) hash of
    every k-char gram, keep the ``keep`` smallest as the doc's fingerprint.

    Pure integer arithmetic (base-31 mod 1e9+7) so any engine reproduces the
    bits exactly — unlike md5/xxhash this fingerprint is portable across the
    Spark/DuckDB boundary and any future backend. All work is built-in
    higher-order functions inside codegen; min-k selection keeps output
    constant-size per doc regardless of doc length, which is what makes the
    downstream fingerprint self-join (dedup at 100 TB) a bounded shuffle.
    """
    chars = F.split(F.col(text_col), "")
    n = F.size(chars)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(n - k, F.lit(0))),
        lambda i: F.aggregate(
            F.slice(chars, i + 1, k), F.lit(0).cast("long"),
            lambda acc, c: (acc * base + F.ascii(c)) % mod))
    return docs.select(
        F.col(id_col),
        F.slice(F.array_sort(grams), 1, keep).alias("fingerprint"),
        F.size(grams).alias("n_grams"))


@register(
    "q73_rolling_fingerprint",
    sql="""
    WITH c AS (
      SELECT doc_id, string_split(text, '') AS ch, length(text) AS n
      FROM documents
    ),
    g AS (
      SELECT doc_id,
             list_transform(range(0, greatest(n - 16, 0) + 1),
               i -> list_reduce(
                      list_prepend(0::BIGINT,
                        list_transform(list_slice(ch, i + 1, i + 16),
                                       x -> unicode(x)::BIGINT)),
                      (acc, x) -> (acc * 31 + x) % 1000000007)) AS gh
      FROM c
    )
    SELECT doc_id,
           list_sort(gh)[1] AS fp1, list_sort(gh)[2] AS fp2,
           list_sort(gh)[3] AS fp3,
           CAST(len(gh) AS INTEGER) AS n_grams
    FROM g
    """,
)
def q73_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star document fingerprinting: rolling-hash winnowing (3 smallest
    16-gram Rabin-Karp hashes per doc), bit-identical to the DuckDB oracle.
    Scalar fp columns (not an array) so order-insensitive value hashing works
    in any comparison harness."""
    docs = load_table(spark, sf_dir, "documents")
    fp = rolling_fingerprint(docs)
    return fp.select(
        "doc_id",
        F.col("fingerprint")[0].alias("fp1"),
        F.col("fingerprint")[1].alias("fp2"),
        F.col("fingerprint")[2].alias("fp3"),
        "n_grams")

"""WordPiece-style subword tokenization as an Arrow-batched pandas UDF —
the U2 surface doing real LLM-pipeline work (tokenize text to subword
pieces), pinned by an INDEPENDENT implementation of the same greedy
algorithm as a recursive CTE in the DuckDB oracle.

Greedy longest-match (the WordPiece inference rule): at each position take
the longest vocabulary piece that prefixes the remainder; pieces that
continue a word carry the ``##`` marker. The vocabulary ships with every
single character (plus its ``##`` form), so no word needs an [UNK] and the
algorithm always terminates.

Scale shape: tokenization is embarrassingly parallel — one Arrow-batched
scalar UDF, no shuffle at all; the digest/stat aggregation underneath is a
plain groupBy. The vocabulary is a Python-side constant closed over by the
UDF (at real scale: a broadcast variable holding the 30-100k-entry trie).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from ..plans.registry import register
from ..sources.readers import load_table

_CHARS = "abcdefghijklmnopqrstuvwxyz0123456789"
# Multi-char pieces chosen so common fixture words split into 2+ pieces;
# single chars (and their ## forms) are the guaranteed fallback.
_MULTI = ["wind", "##ow", "sp", "##ark", "jo", "##in", "quer", "##y",
          "mer", "##ge", "filt", "##er"]
VOCAB = (_MULTI
         + [c for c in _CHARS]
         + ["##" + c for c in _CHARS])

# Longest-first match tables, split by word-start vs continuation.
_START = sorted((v for v in VOCAB if not v.startswith("##")),
                key=len, reverse=True)
_CONT = sorted(((v[2:], v) for v in VOCAB if v.startswith("##")),
               key=lambda t: len(t[0]), reverse=True)


def wordpiece_word(word: str) -> list[str]:
    """Greedy longest-match pieces for one word (pure-Python reference)."""
    pieces: list[str] = []
    rest = word
    at_start = True
    while rest:
        if at_start:
            best = next(v for v in _START if rest.startswith(v))
            rest = rest[len(best):]
        else:
            core, best = next((c, v) for c, v in _CONT if rest.startswith(c))
            rest = rest[len(core):]
        pieces.append(best)
        at_start = False
    return pieces


def wordpiece_tokenize_udf():
    @F.pandas_udf(ArrayType(StringType()))
    def tok(texts: pd.Series) -> pd.Series:
        out = []
        for text in texts:
            pieces: list[str] = []
            for word in text.split(" "):
                pieces.append(" ".join(wordpiece_word(word)))
            out.append(pieces)
        return pd.Series(out)
    return tok


_VOCAB_SQL = "[" + ", ".join(f"'{v}'" for v in _MULTI) + "]"

@register(
    "q220_wordpiece_tokenize",
    sql=f"""
    WITH RECURSIVE
    vocab(v) AS (SELECT unnest({_VOCAB_SQL})),
    chars(c) AS (SELECT unnest(string_split('{_CHARS}', ''))),
    allvocab(v) AS (
        SELECT v FROM vocab
        UNION ALL SELECT c FROM chars
        UNION ALL SELECT '##' || c FROM chars
    ),
    words AS (
        SELECT doc_id, w.wpos, w.word
        FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents) d,
             LATERAL (SELECT unnest(generate_series(1, len(ws))) AS wpos,
                             unnest(ws) AS word) w
    ),
    rec(doc_id, wpos, rest, pieces, at_start) AS (
        SELECT doc_id, wpos, word, CAST([] AS VARCHAR[]), true FROM words
        UNION ALL
        SELECT doc_id, wpos,
               substr(rest, length(CASE WHEN at_start THEN best
                                        ELSE substr(best, 3) END) + 1),
               list_append(pieces, best),
               false
        FROM (
          SELECT doc_id, wpos, rest, pieces, at_start,
                 (SELECT max_by(v, length(v)) FROM allvocab
                  WHERE CASE WHEN at_start
                             THEN v NOT LIKE '##%' AND starts_with(rest, v)
                             ELSE v LIKE '##%'
                                  AND starts_with(rest, substr(v, 3)) END)
                     AS best
          FROM rec WHERE rest <> ''
        )
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT)          AS n_words,
           CAST(sum(len(pieces)) AS BIGINT)  AS n_pieces,
           round(sum(len(pieces))::DOUBLE / count(*), 6) AS pieces_per_word,
           substr(md5(string_agg(array_to_string(pieces, ' '), ' | '
                                 ORDER BY wpos)), 1, 16) AS digest
    FROM rec WHERE rest = ''
    GROUP BY doc_id
    """,
)
def q220_wordpiece_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WordPiece greedy subword tokenization over every document, as an
    Arrow-batched pandas UDF, with the md5 digest of the full piece
    sequence in the output — so the oracle (the SAME greedy algorithm
    written as a DuckDB recursive CTE) pins every single piece boundary,
    not just counts. Two independent implementations of the tokenizer
    agreeing on a per-document digest is the strongest correctness check
    in the text plane."""
    docs = load_table(spark, sf_dir, "documents")
    tok = wordpiece_tokenize_udf()
    pieced = docs.select("doc_id", tok(F.col("text")).alias("word_pieces"))
    n_pieces = F.aggregate(
        F.transform("word_pieces",
                    lambda wp: F.size(F.split(wp, " "))),
        F.lit(0), lambda acc, x: acc + x)
    return pieced.select(
        "doc_id",
        F.size("word_pieces").cast("bigint").alias("n_words"),
        n_pieces.cast("bigint").alias("n_pieces"),
        F.round(n_pieces.cast("double") / F.size("word_pieces"), 6)
        .alias("pieces_per_word"),
        F.substring(F.md5(F.concat_ws(" | ", "word_pieces")), 1, 16)
        .alias("digest"))

"""Unigram-LM subword tokenizer training (SentencePiece-style Viterbi-EM)
over the documents corpus — the third tokenizer trainer next to BPE
(tokenize.py:bpe_train) and WordPiece inference (tokenize.py:wordpiece).

Algorithm (Kudo 2018, hard-EM variant): seed a candidate vocabulary from
substring frequencies, then alternate (E) Viterbi-segment every word under
the current piece log-probabilities and (M) re-estimate probabilities from
the segmentation's weighted piece counts, pruning multi-char pieces whose
count drops to zero (single-char pieces are floored at count 1 so every
word stays segmentable — SentencePiece's required-character rule).

Scale contract — the q390/q394 amortization: ALL corpus-sized work is the
ONE distinct-word scan (words + counts). Everything after runs against the
distinct-word table weighted by counts: candidate generation is a bounded
explode (<= len*4 substrings per word), the E-step is an Arrow-batched
Viterbi over distinct words (vocabulary dict in the closure; a broadcast
trie at real scale), and the M-step is one vocabulary-sized aggregation
collected to the driver (<= TOP_PIECES + alphabet rows). Corpus growth
changes word WEIGHTS, not EM cost — the property that makes tokenizer
training viable at 100 TB.

Replayability: the Viterbi DP runs on FIXED-POINT integer log-probs
(floor(ln(p) * 1e6 + 0.5), the registry's exact-cents idiom) so every DP
comparison and tie-break ((score DESC, k ASC) — shortest last piece wins
ties) is integer-exact in both engines; piece counts are integers; the
only libm call is the ln() inside the quantization, where a 1-ulp
cross-engine difference would need to land within ~1e-10 of a rounding
boundary to matter.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from ..plans.registry import register
from ..sources.readers import load_table

MAX_WORD_LEN = 12   # words longer than this are excluded from EM (none in
                    # the fixture; at scale they are tail noise by weight)
KMAX = 4            # max candidate piece length
TOP_PIECES = 48     # multi-char candidate budget (chars ride along free)
EM_ROUNDS = 2
SCALE = 1_000_000   # fixed-point log-prob quantization


def _q_logprob(c: int, total: int) -> int:
    """floor(ln(c/total)*SCALE + 0.5) — the exact-cents rounding idiom so
    Python and SQL quantize the same double to the same integer."""
    return int(math.floor(math.log(c / float(total)) * SCALE + 0.5))


def distinct_words(docs: DataFrame) -> DataFrame:
    """(w, wc): distinct whitespace words with corpus counts — the one
    corpus-sized pass. Empty tokens from ragged whitespace are filtered
    (Spark split('','')=[''] vs DuckDB [] — the q390 hygiene rule)."""
    return (docs.select(F.explode(F.split("text", " ")).alias("w"))
            .filter((F.col("w") != "")
                    & (F.length("w") <= MAX_WORD_LEN))
            .groupBy("w").agg(F.count("*").cast("bigint").alias("wc")))


def seed_vocab(words: DataFrame) -> dict[str, int]:
    """Candidate pieces and integer seed weights: every substring of length
    1..KMAX of every distinct word, weighted by word count and occurrence
    position; the TOP_PIECES heaviest (weight DESC, piece ASC) plus ALL
    single characters (coverage guarantee). Bounded driver state."""
    cand = (words
            .select("w", "wc",
                    F.explode(F.expr("sequence(1, length(w))")).alias("s"))
            .select("w", "wc", "s",
                    F.explode(F.expr(f"sequence(1, {KMAX})")).alias("k"))
            .filter(F.col("s") + F.col("k") - 1 <= F.length("w"))
            .select(F.expr("substring(w, s, k)").alias("piece"), "wc")
            .groupBy("piece").agg(F.sum("wc").alias("weight")))
    top = cand.orderBy(F.col("weight").desc(), "piece").limit(TOP_PIECES)
    chars = cand.filter(F.length("piece") == 1)
    rows = top.unionByName(chars).distinct().collect()
    return {r.piece: int(r.weight) for r in rows}


def _viterbi_udf(logq: dict[str, int]):
    """Arrow-batched integer Viterbi: best segmentation of each word under
    the fixed-point log-probs. Ties break to the SHORTEST last piece
    (k ascending, strict improvement required) — the rule the SQL replay
    states as ORDER BY score DESC, k ASC."""

    @F.pandas_udf(ArrayType(StringType()))
    def seg(ws: pd.Series) -> pd.Series:
        out = []
        for w in ws:
            best: list[tuple[int, list[str]] | None] = [(0, [])]
            best += [None] * len(w)
            for i in range(1, len(w) + 1):
                pick = None
                for k in range(1, min(KMAX, i) + 1):
                    prev = best[i - k]
                    lq = logq.get(w[i - k:i])
                    if prev is None or lq is None:
                        continue
                    sc = prev[0] + lq
                    if pick is None or sc > pick[0]:
                        pick = (sc, prev[1] + [w[i - k:i]])
                best[i] = pick
            final = best[len(w)]
            if final is None:   # unreachable: single chars are always kept
                raise ValueError(f"unsegmentable word: {w!r}")
            out.append(final[1])
        return pd.Series(out)

    return seg


def unigram_train(docs: DataFrame, rounds: int = EM_ROUNDS
                  ) -> list[tuple[str, int, float]]:
    """Train the unigram LM vocabulary; returns the final
    [(piece, weighted_count, prob)] sorted by piece. Driver state is the
    vocabulary table throughout; each EM round costs one Arrow-batched
    segmentation of the distinct-word table plus one vocabulary-sized
    aggregation."""
    words = distinct_words(docs).localCheckpoint()
    weights = seed_vocab(words)
    if not weights:
        raise ValueError("unigram_train: empty corpus (no eligible words)")
    total = sum(weights.values())
    state = {p: c for p, c in weights.items()}          # current counts
    logq = {p: _q_logprob(c, total) for p, c in state.items()}
    for _ in range(rounds):
        segd = words.withColumn("pieces", _viterbi_udf(logq)(F.col("w")))
        counts = {r.piece: int(r.c) for r in
                  (segd.select(F.explode("pieces").alias("piece"), "wc")
                   .groupBy("piece").agg(F.sum("wc").alias("c"))
                   .collect())}
        new_state: dict[str, int] = {}
        for p in state:
            c = counts.get(p, 0)
            if len(p) == 1:
                c = max(c, 1)   # required-character floor
            if c > 0:
                new_state[p] = c
        state = new_state
        total = sum(state.values())
        logq = {p: _q_logprob(c, total) for p, c in state.items()}
    return sorted((p, c, c / float(total)) for p, c in state.items())


def _unigram_ctes(rounds: int = EM_ROUNDS) -> str:
    """CTE body replaying the trainer: seed weights, then per round the
    unrolled per-position Viterbi DP (stage CTE per string position
    carrying the best (score, pieces) path — integer scores, (score DESC,
    k ASC) tie-break), weighted piece counts, the required-character floor
    and zero-count prune, and the fixed-point requantization. Ends with
    ``v{rounds}`` (final vocab) and ``seg{rounds}`` (final distinct-word
    segmentation)."""
    stages = []
    for r in range(1, rounds + 1):
        stages.append(f"""
    s{r}_0 AS (SELECT w, wc, CAST(0 AS BIGINT) AS score,
                      CAST([] AS VARCHAR[]) AS pieces FROM words),""")
        for i in range(1, MAX_WORD_LEN + 1):
            branches = " UNION ALL ".join(f"""
            SELECT s.w, s.wc, s.score + l.lq AS score,
                   list_append(s.pieces, substr(s.w, {i - k + 1}, {k}))
                       AS pieces, {k} AS k
            FROM s{r}_{i - k} s JOIN l{r - 1} l
              ON l.piece = substr(s.w, {i - k + 1}, {k})
            WHERE length(s.w) >= {i}""" for k in range(1, min(KMAX, i) + 1))
            stages.append(f"""
    s{r}_{i} AS MATERIALIZED (
        SELECT w, wc, score, pieces FROM (
            SELECT *, row_number() OVER (PARTITION BY w
                                         ORDER BY score DESC, k ASC) AS rn
            FROM ({branches})
        ) WHERE rn = 1
    ),""")
        finals = " UNION ALL ".join(
            f"SELECT w, wc, pieces FROM s{r}_{i} WHERE length(w) = {i}"
            for i in range(1, MAX_WORD_LEN + 1))
        stages.append(f"""
    seg{r} AS ({finals}),
    cnt{r} AS (SELECT piece, CAST(sum(wc) AS BIGINT) AS c
               FROM (SELECT unnest(pieces) AS piece, wc FROM seg{r})
               GROUP BY piece),
    v{r} AS MATERIALIZED (
        SELECT piece, c FROM (
            SELECT vp.piece,
                   CASE WHEN length(vp.piece) = 1
                        THEN greatest(COALESCE(cn.c, 0), 1)
                        ELSE COALESCE(cn.c, 0) END AS c
            FROM v{r - 1} vp LEFT JOIN cnt{r} cn USING (piece)
        ) WHERE c > 0
    ),
    l{r} AS (SELECT piece,
                    CAST(floor(ln(c / t.total) * {SCALE} + 0.5) AS BIGINT)
                        AS lq
             FROM v{r}, (SELECT sum(c)::DOUBLE AS total FROM v{r}) t),""")
    return f"""
    WITH words AS MATERIALIZED (
        SELECT w, count(*)::BIGINT AS wc
        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        WHERE w <> '' AND length(w) <= {MAX_WORD_LEN}
        GROUP BY w
    ),
    cand AS MATERIALIZED (
        SELECT piece, CAST(sum(wc) AS BIGINT) AS weight
        FROM (SELECT substr(w, st.s, kk.k) AS piece, wc
              FROM words,
                   LATERAL (SELECT unnest(range(1, length(w) + 1)) AS s) st,
                   LATERAL (SELECT unnest(range(1, {KMAX + 1})) AS k) kk
              WHERE st.s + kk.k - 1 <= length(w))
        GROUP BY piece
    ),
    v0 AS MATERIALIZED (
        SELECT piece, weight AS c FROM (
            SELECT piece, weight FROM
                (SELECT piece, weight FROM cand
                 ORDER BY weight DESC, piece ASC LIMIT {TOP_PIECES})
            UNION
            SELECT piece, weight FROM cand WHERE length(piece) = 1
        )
    ),
    l0 AS (SELECT piece,
                  CAST(floor(ln(c / t.total) * {SCALE} + 0.5) AS BIGINT)
                      AS lq
           FROM v0, (SELECT sum(c)::DOUBLE AS total FROM v0) t),
    {''.join(stages)}
    _uni_end AS (SELECT 1)"""


def _unigram_oracle(rounds: int = EM_ROUNDS) -> str:
    return f"""
    {_unigram_ctes(rounds)}
    SELECT piece, CAST(c AS BIGINT) AS n,
           round(c / t.total, 6) AS prob
    FROM v{rounds}, (SELECT sum(c)::DOUBLE AS total FROM v{rounds}) t
    ORDER BY piece
    """


@register("q404_unigram_lm_tokenizer", sql=_unigram_oracle())
def q404_unigram_lm_tokenizer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM tokenizer training (2 Viterbi-EM rounds) over the
    documents corpus: the final piece vocabulary with weighted counts and
    probabilities. The oracle replays substring seeding, both EM rounds'
    integer Viterbi DPs (one stage CTE per string position), the
    required-character floor / zero-count prune, and the fixed-point
    requantization — piece-for-piece, count-for-count."""
    docs = load_table(spark, sf_dir, "documents")
    vocab = unigram_train(docs)
    return spark.createDataFrame(
        [(p, c, round(prob, 6)) for p, c, prob in vocab],
        "piece string, n bigint, prob double",
    ).orderBy("piece")


# trained unigram vocab per fixture state — q404 (train) and q405 (encode)
# share one training run per session, same convention as _cached_merges
_unigram_cache: dict[tuple[str, float], list[tuple[str, int, float]]] = {}


def _cached_unigram(spark: SparkSession,
                    sf_dir: str) -> list[tuple[str, int, float]]:
    from ..sources.readers import source_stamp

    key = (sf_dir, source_stamp(f"{sf_dir}/documents.parquet"))
    if key not in _unigram_cache:
        _unigram_cache[key] = unigram_train(
            load_table(spark, sf_dir, "documents"))
    return _unigram_cache[key]


def _unigram_encode_oracle(rounds: int = EM_ROUNDS) -> str:
    """q405 oracle: the training replay's final distinct-word segmentation
    (seg{rounds}) joined back onto every document's word stream — q394's
    digest idiom over the unigram pieces."""
    return f"""
    {_unigram_ctes(rounds)}
    SELECT d.doc_id,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(len(seg.pieces)) AS BIGINT) AS n_pieces,
           round(sum(len(seg.pieces))::DOUBLE / count(*), 6)
               AS pieces_per_word,
           substr(md5(string_agg(array_to_string(seg.pieces, ' '), ' | '
                                 ORDER BY d.wpos)), 1, 16) AS digest
    FROM (SELECT doc_id, w.wpos, w.word
          FROM (SELECT doc_id, string_split(text, ' ') AS ws
                FROM documents) x,
               LATERAL (SELECT unnest(generate_series(1, len(ws))) AS wpos,
                               unnest(ws) AS word) w
          WHERE w.word <> '' AND length(w.word) <= {MAX_WORD_LEN}) d
    JOIN seg{rounds} seg ON d.word = seg.w
    GROUP BY d.doc_id
    ORDER BY d.doc_id
    """


def _encode_report(docs: DataFrame, logq: dict[str, int]) -> DataFrame:
    """Shared encode body for q405/q406: Viterbi-segment the distinct-word
    vocab once under ``logq``, hash-join onto the word stream, per-doc
    counts + position-ordered digest (q394's idiom)."""
    seg = (distinct_words(docs)
           .withColumn("pcs", _viterbi_udf(logq)(F.col("w")))
           .select(F.col("w").alias("token"),
                   F.size("pcs").alias("n_syms"),
                   F.array_join("pcs", " ").alias("pieces")))
    words = (docs.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("wpos0", "word"))
        .filter((F.col("word") != "")
                & (F.length("word") <= MAX_WORD_LEN))
        .select("doc_id", (F.col("wpos0") + 1).alias("wpos"), "word"))
    # broadcast the SEGMENTED VOCAB side explicitly (q394's round-12 §3.1
    # fix: the planner's width estimate for the Viterbi-segmented frame
    # made it broadcast the word STREAM instead — backwards at scale)
    return (words.join(F.broadcast(seg), words.word == seg.token)
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_words"),
                 F.sum("n_syms").cast("bigint").alias("n_pieces"),
                 F.round(F.sum("n_syms").cast("double") / F.count(F.lit(1)),
                         6).alias("pieces_per_word"),
                 F.substring(F.md5(F.concat_ws(" | ", F.transform(
                     F.array_sort(F.collect_list(
                         F.struct("wpos", "pieces"))),
                     lambda s: s["pieces"]))), 1, 16).alias("digest"))
            .orderBy("doc_id"))


@register("q405_unigram_encode", sql=_unigram_encode_oracle())
def q405_unigram_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the TRAINED unigram LM (q404's vocabulary, one cached training
    run per fixture) to the whole corpus: Viterbi-segment the distinct-word
    vocab once (Arrow-batched, vocabulary-sized — the q394 amortization),
    hash-join the segmentation onto the word stream, and emit per-doc word
    and piece counts plus the md5 digest of the full piece sequence in
    position order. Words longer than MAX_WORD_LEN are outside the model's
    contract and are excluded from the stream in both engines (the fixture
    has none)."""
    docs = load_table(spark, sf_dir, "documents")
    vocab = _cached_unigram(spark, sf_dir)
    total = sum(c for _, c, _ in vocab)
    logq = {p: _q_logprob(c, total) for p, c, _ in vocab}
    return _encode_report(docs, logq)


# ---------------------------------------------------------------------------
# Versioned tokenizer artifact: publish the trained vocab, load, encode
# ---------------------------------------------------------------------------

def publish_unigram_artifact(spark: SparkSession, docs, store_dir: str,
                             rounds: int = EM_ROUNDS) -> int:
    """Train (or retrain) the unigram vocabulary and publish it as an
    immutable versioned table (sources/versioned.py: the write lands in
    ``v=N`` and the manifest swap is the atomic publish — the same
    contract the IVF rebuild uses). The artifact stores (piece, c): the
    integer counts ARE the model; log-probs are requantized at load so a
    loader can never desync from the stored state."""
    from ..sources.versioned import write_version

    vocab = unigram_train(docs, rounds=rounds)
    df = spark.createDataFrame(
        [(p, c) for p, c, _ in vocab], "piece string, c bigint")
    return write_version(df, store_dir)


def load_unigram_artifact(spark: SparkSession, store_dir: str,
                          version: int | None = None) -> dict[str, int]:
    """Resolve the published (or an explicit time-travel) version and
    rebuild the fixed-point log-prob table — vocabulary-sized driver
    state, exactly what the Viterbi UDF broadcasts."""
    from ..sources.versioned import read_version

    rows = read_version(spark, store_dir, version).collect()
    state = {r.piece: int(r.c) for r in rows}
    total = sum(state.values())
    return {p: _q_logprob(c, total) for p, c in state.items()}


# one published artifact per fixture state (temp store, removed at exit)
_artifact_cache: dict[tuple[str, float], str] = {}


def _cached_artifact_store(spark: SparkSession, sf_dir: str) -> str:
    import atexit
    import shutil
    import tempfile

    from ..sources.readers import source_stamp

    key = (sf_dir, source_stamp(f"{sf_dir}/documents.parquet"))
    if key not in _artifact_cache:
        d = tempfile.mkdtemp(prefix="unigram_artifact_")
        atexit.register(shutil.rmtree, d, ignore_errors=True)
        publish_unigram_artifact(
            spark, load_table(spark, sf_dir, "documents"), d)
        _artifact_cache[key] = d
    return _artifact_cache[key]


@register("q406_unigram_artifact_encode", sql=_unigram_encode_oracle())
def q406_unigram_artifact_encode(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """The production artifact loop: the trained vocabulary is PUBLISHED as
    a versioned parquet table (atomic manifest swap, cached per fixture),
    then LOADED back — counts only; log-probs requantized at load — and
    applied to the corpus. Output and oracle are exactly q405's: the store
    round-trip must be invisible to every piece boundary, count and digest.
    At 100 TB this is how trainers hand tokenizers to encode fleets:
    immutable versions, time-travel rollback (unit-pinned), no shared
    mutable state."""
    docs = load_table(spark, sf_dir, "documents")
    logq = load_unigram_artifact(
        spark, _cached_artifact_store(spark, sf_dir))
    return _encode_report(docs, logq)

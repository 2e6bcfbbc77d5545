"""BPE merge-table training as an iterative Spark job.

Classic byte-pair-encoding vocabulary learning (the tokenizer-training step
of an LLM data pipeline): start from characters (+ an end-of-word marker),
repeatedly count adjacent symbol pairs across the corpus weighted by word
frequency, and merge the most frequent pair.

Spark shape — what makes this scale:
- The corpus is touched ONCE: ``explode(tokens) → groupBy word`` collapses
  100 TB of text to a |vocab|-sized frequency table, and every merge round
  runs on that table only (classic BPE trainers do exactly this collapse).
- Each round is one shuffle (pair groupBy) + one Arrow-batched merge pass;
  the running vocabulary is ``localCheckpoint``-ed eagerly per round so
  lineage stays flat across iterations (same pattern as
  ``connected_components``).
- The only driver traffic per round is the single winning pair (collect of
  one row) — no corpus data ever reaches the driver.

Determinism: ties broken by (pair count desc, left, right), so the merge
sequence is reproducible — the unit test checks it against a pure-Python
reference implementation.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from healthcare_etl_pipeline_spark.operators.text import tokens

END_MARK = "</w>"


def _word_vocab(docs: DataFrame, text_col: str) -> DataFrame:
    """(word, freq, syms): corpus collapsed to word frequencies, each word
    split into characters + end marker."""
    words = docs.select(F.explode(F.split(F.col(text_col), r"\s+")).alias("word")).filter(
        F.col("word") != ""
    )
    freq = words.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
    syms = F.concat(
        F.filter(F.split(F.col("word"), ""), lambda x: x != ""),
        F.array(F.lit(END_MARK)),
    )
    return freq.withColumn("syms", syms)


def _make_merge_udf(left: str, right: str):
    merged = left + right

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _merge(s: pd.Series) -> pd.Series:
        def run(syms):
            out = []
            i = 0
            n = len(syms)
            while i < n:
                if i + 1 < n and syms[i] == left and syms[i + 1] == right:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            return out

        return s.map(run)

    return _merge


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    *,
    n_merges: int = 20,
    min_pair_count: int = 2,
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges; returns [(left, right, pair_count)]
    in merge order. Stops early when the best pair drops below
    ``min_pair_count``.

    Driver-loop cost model: each merge round launches one Spark job
    (vocab-table pair count, 1-row collect), so wall-clock is
    O(n_merges × job latency) regardless of corpus size. Real tokenizer
    training runs tens of thousands of merges — do that on a corpus
    SAMPLE (``hash_sample``; vocabulary statistics converge long before
    1% of a 100 TB corpus) rather than pointing n_merges=30000 at the
    full table."""
    vocab = _word_vocab(docs, text_col).localCheckpoint(eager=True)
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs = (
            vocab.select(
                "freq",
                F.explode(
                    F.zip_with(
                        F.slice(F.col("syms"), 1, F.size("syms") - 1),
                        F.slice(F.col("syms"), 2, F.size("syms") - 1),
                        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                    )
                ).alias("p"),
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("n"))
        )
        top = pairs.orderBy(F.desc("n"), F.asc("l"), F.asc("r")).limit(1).collect()
        if not top or top[0]["n"] < min_pair_count:
            break
        left, right, n = top[0]["l"], top[0]["r"], int(top[0]["n"])
        merges.append((left, right, n))
        vocab = vocab.withColumn(
            "syms", _make_merge_udf(left, right)(F.col("syms"))
        ).localCheckpoint(eager=True)
    return merges


def bpe_merges_df(
    docs: DataFrame,
    text_col: str = "text",
    *,
    n_merges: int = 20,
    min_pair_count: int = 2,
) -> DataFrame:
    """The learned merge table as a DataFrame (rank, left, right, pair_count)."""
    merges = bpe_train(
        docs, text_col, n_merges=n_merges, min_pair_count=min_pair_count
    )
    schema = T.StructType(
        [
            T.StructField("rank", T.IntegerType()),
            T.StructField("left", T.StringType()),
            T.StructField("right", T.StringType()),
            T.StructField("pair_count", T.LongType()),
        ]
    )
    rows = [(i, l, r, n) for i, (l, r, n) in enumerate(merges)]
    return docs.sparkSession.createDataFrame(rows, schema)


def _make_encode_udf(ranked: dict[tuple[str, str], int]):
    """Arrow-batched word→BPE-symbols encoder for a trained merge table.

    Greedy rank-priority encode (the standard BPE inference rule): at each
    step merge the pair with the LOWEST training rank present in the word,
    until no trainable pair remains. The merge table is tiny (tens of
    entries) — shipped to executors inside the closure, no join needed.
    """

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _encode(words: pd.Series) -> pd.Series:
        def run(word):
            syms = list(word) + [END_MARK]
            while len(syms) > 1:
                best_rank, best_i = None, None
                for i in range(len(syms) - 1):
                    r = ranked.get((syms[i], syms[i + 1]))
                    if r is not None and (best_rank is None or r < best_rank):
                        best_rank, best_i = r, i
                if best_i is None:
                    break
                syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
            return syms

        return words.map(run)

    return _encode


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenize documents with a trained BPE merge table.

    Output: (id, n_words, n_tokens, compression) where compression =
    characters-per-token (rounded 4dp) — the metric a tokenizer sweep
    optimizes. Per-word encode runs as ONE Arrow-batched pass over the
    exploded word stream, then re-aggregates per document — the same
    map-side-combinable shape as every other corpus operator; the merge
    table rides in the UDF closure (broadcast-sized, no shuffle).
    """
    ranked = {(l, r): i for i, (l, r, _) in enumerate(merges)}
    enc = _make_encode_udf(ranked)
    words = docs.select(
        F.col(id_col),
        F.explode(tokens(F.col(text_col))).alias("word"),
    )
    encoded = words.select(
        F.col(id_col),
        F.length("word").alias("n_chars"),
        F.size(enc(F.col("word"))).alias("word_tokens"),
    )
    return (
        encoded.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("word_tokens").alias("n_tokens"),
            F.round(
                F.sum("n_chars") / F.sum("word_tokens"), 4
            ).alias("chars_per_token"),
        )
    )

def bpe_encode_contract(
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc VALUE CONTRACT for the greedy encoder — the oracle-checkable
    face of ``bpe_encode``.

    An external SQL engine cannot replay the merge table, but it CAN
    compute the exact word and character counts, and the encoder owes three
    invariants that only hold when it behaves:

    - ``roundtrip_ok``: concatenating a word's BPE tokens reproduces the
      word + end marker exactly (merges only ever concatenate adjacent
      symbols — any dropped/duplicated/corrupted symbol breaks this);
    - ``tokens_ge_words``: ≥1 token per word;
    - ``tokens_le_syms``: ≤ chars+1 tokens per word (the unmerged maximum).

    Output: (id, n_words, n_chars, roundtrip_ok, tokens_ge_words,
    tokens_le_syms) — exact counts hash-match the oracle, booleans flip the
    hash red if the encoder misbehaves.
    """
    ranked = {(l, r): i for i, (l, r, _) in enumerate(merges)}
    enc = _make_encode_udf(ranked)
    words = docs.select(
        F.col(id_col),
        F.explode(tokens(F.col(text_col))).alias("word"),
    )
    checked = words.select(
        F.col(id_col),
        F.length("word").alias("n_chars"),
        F.size(enc(F.col("word"))).alias("word_tokens"),
        (
            F.concat_ws("", enc(F.col("word")))
            == F.concat(F.col("word"), F.lit(END_MARK))
        ).alias("rt_ok"),
    )
    return checked.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum("n_chars").alias("n_chars"),
        F.bool_and("rt_ok").alias("roundtrip_ok"),
        (F.sum("word_tokens") >= F.count(F.lit(1))).alias("tokens_ge_words"),
        (
            F.sum("word_tokens") <= F.sum("n_chars") + F.count(F.lit(1))
        ).alias("tokens_le_syms"),
    )


def merge_table_invariants(
    merges: list[tuple[str, str, int]], *, min_pair_count: int = 2
) -> dict[str, bool]:
    """Driver-side invariants of a trained merge table (tiny — tens of
    rows, already collected by the trainer):

    - ``well_founded``: every merge's left/right symbol is a single
      character, the end marker, or the output of an EARLIER merge;
    - ``counts_ge_min``: every winning pair met the frequency floor.
    """
    seen: set[str] = set()
    well_founded = True
    for left, right, _ in merges:
        ok = (len(left) == 1 or left == END_MARK or left in seen) and (
            len(right) == 1 or right == END_MARK or right in seen
        )
        well_founded = well_founded and ok
        seen.add(left + right)
    return {
        "well_founded": well_founded,
        "counts_ge_min": all(n >= min_pair_count for _, _, n in merges),
    }

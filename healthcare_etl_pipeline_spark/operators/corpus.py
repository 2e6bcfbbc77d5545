"""Corpus-level statistical operators for LLM training-data preparation:
repetition quality rules, unigram language-model scoring, sequence packing,
TF-IDF salient terms, and a bounded inverted index.

These complement operators/text.py (per-document, expression-only metrics)
with the operators that need CORPUS context — aggregations over exploded
tokens/n-grams — and are the standard second tier of a data-quality
pipeline (Gopher/C4-style repetition filters, KenLM-style perplexity
proxies, GPT-style sequence packing).

Scale posture shared by all five:
- One explode of the token stream per operator, aggregated with map-side
  combine (groupBy on (doc, gram) or (token) keys) — no per-doc windows
  over the whole corpus, no driver collects.
- Per-doc gram arrays are derived from a localCheckpoint'd token-array
  frame: higher-order expressions are CodegenFallback and not
  subexpression-eliminated, so each consumer must read STORED arrays, not
  re-run the tokenizer (bounded_persist — LRU-capped cache, nothing
  accumulates in the executor cache across queries).
- Every fraction is rounded to 6 dp so DuckDB oracles match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from healthcare_etl_pipeline_spark.operators.cache import bounded_persist

from healthcare_etl_pipeline_spark.operators.sampling import hash_bucket
from healthcare_etl_pipeline_spark.operators.text import tokens
from healthcare_etl_pipeline_spark.queries.helpers import spread


def _token_arrays(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, tk): tokenized docs, spread to cores and checkpointed so every
    downstream gram derivation reads stored arrays."""
    return (
        spread(df, df.sparkSession)
        .select(F.col(id_col), tokens(F.col(text_col)).alias("tk"))
        .transform(bounded_persist)
    )


def _grams(tk: Column, n: int) -> Column:
    """Non-distinct n-gram strings (space-joined) from a token array."""
    if n == 1:
        return tk
    idx = F.when(
        F.size(tk) >= n, F.sequence(F.lit(1), F.size(tk) - (n - 1))
    ).otherwise(F.expr("array()").cast("array<int>"))
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(tk, (i + j).cast("int")) for j in range(n)]
        ),
    )


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition metrics per document.

    - ``top_unigram_frac``: count of the most frequent token / n_tokens —
      high values mean one token dominates (boilerplate, keyword stuffing).
    - ``top_bigram_frac``: same for 2-grams.
    - ``dup_trigram_frac``: fraction of 3-gram OCCURRENCES whose 3-gram
      appears more than once in the doc — phrase-level self-repetition.

    The Gopher paper's repetition filters (Rae et al. 2021, table A1) use
    exactly these shapes (fraction-of-characters variants) with thresholds
    like 0.2/0.18; ``keep`` applies illustrative thresholds (documented in
    the query spec) so the operator is usable as a gate directly.

    Shape: one explode per gram order over checkpointed token arrays, each
    aggregated by (doc, gram) with map-side combine, then a per-doc agg —
    the max/sum never sees more than one doc's grams per key. Docs too
    short for a gram order get 0.0 (no repetition evidence).
    """
    tk = _token_arrays(df, id_col, text_col)

    def gram_metrics(n: int, top_name: str, dup: bool = False) -> DataFrame:
        g = tk.select(
            F.col(id_col), F.explode(_grams(F.col("tk"), n)).alias("g")
        )
        per_gram = g.groupBy(id_col, "g").agg(F.count(F.lit(1)).alias("cnt"))
        aggs = [
            F.max("cnt").alias("max_cnt"),
            F.sum("cnt").alias("tot"),
        ]
        if dup:
            aggs.append(
                F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0)).alias(
                    "dup_cnt"
                )
            )
        per_doc = per_gram.groupBy(id_col).agg(*aggs)
        frac = (
            F.round(F.col("dup_cnt") / F.col("tot"), 6)
            if dup
            else F.round(F.col("max_cnt") / F.col("tot"), 6)
        )
        return per_doc.select(F.col(id_col), frac.alias(top_name))

    uni = gram_metrics(1, "top_unigram_frac")
    bi = gram_metrics(2, "top_bigram_frac")
    tri = gram_metrics(3, "dup_trigram_frac", dup=True)
    base = tk.select(F.col(id_col), F.size("tk").alias("n_tokens"))
    out = (
        base.join(uni, id_col, "left")
        .join(bi, id_col, "left")
        .join(tri, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            F.coalesce("top_unigram_frac", F.lit(0.0)).alias("top_unigram_frac"),
            F.coalesce("top_bigram_frac", F.lit(0.0)).alias("top_bigram_frac"),
            F.coalesce("dup_trigram_frac", F.lit(0.0)).alias("dup_trigram_frac"),
        )
    )
    keep = (
        (F.col("top_unigram_frac") <= 0.20)
        & (F.col("top_bigram_frac") <= 0.18)
        & (F.col("dup_trigram_frac") <= 0.30)
    )
    return out.withColumn("keep", keep)


def unigram_logprob(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document mean unigram log-probability under the CORPUS unigram
    distribution — the cheapest member of the KenLM-perplexity family of
    quality scores (a doc of globally-rare tokens scores low; natural
    prose scores near the corpus mode).

    Two aggregations over one exploded token stream: (1) the corpus
    vocabulary with counts (shuffle on token, map-side combined), (2) the
    per-doc mean of ``ln(count/total)`` after re-joining tokens to the
    vocabulary. The vocabulary is orders of magnitude smaller than the
    corpus; the join shuffles on the token key. ``total`` is attached as a
    broadcast scalar, never collected to Python.
    """
    tk = _token_arrays(df, id_col, text_col)
    tok = tk.select(F.col(id_col), F.explode("tk").alias("tok"))
    vocab = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("total"))
    vocab = vocab.crossJoin(F.broadcast(total)).select(
        "tok", F.log(F.col("cnt") / F.col("total")).alias("logp")
    )
    scored = (
        tok.join(vocab, "tok")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg("logp"), 6).alias("avg_token_logprob"),
        )
    )
    return scored


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    context: int = 512,
    shards: int = 8,
) -> DataFrame:
    """GPT-style concat-then-chunk sequence packing assignment.

    Training batches are built by concatenating documents in a
    deterministic order and cutting fixed-``context``-token sequences; this
    operator computes, WITHOUT materializing any concatenation, where each
    document lands: its shard, the global token offset within the shard's
    stream, the first pack (sequence) index it touches, and how many packs
    it spans (documents crossing a boundary are split across sequences, as
    in standard GPT packing).

    Scale: a single global running sum would be one giant window partition.
    Instead docs are deterministically sharded (portable multiplicative
    hash of the id), and the running sum is per-shard — shards are
    independent, so the sort parallelizes across the cluster and the
    assignment stays reproducible on any cluster size. Pack ids are
    namespaced per shard (``shard * 2^40 + local_pack``).
    """
    tk = _token_arrays(df, id_col, text_col)
    base = tk.select(
        F.col(id_col),
        F.size("tk").alias("n_tokens"),
        (hash_bucket(F.col(id_col)) % shards).alias("shard"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long")
    out = base.withColumn("start_offset", start)
    first_pack = F.floor(F.col("start_offset") / context)
    last_pack = F.floor(
        (F.col("start_offset") + F.greatest(F.col("n_tokens"), F.lit(1)) - 1)
        / context
    )
    return out.select(
        id_col,
        "shard",
        "n_tokens",
        "start_offset",
        (F.col("shard").cast("long") * F.lit(1 << 40) + first_pack).alias(
            "pack_id"
        ),
        (F.col("start_offset") % context).alias("offset_in_pack"),
        (last_pack - first_pack + 1).cast("int").alias("n_packs_spanned"),
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    k: int = 3,
) -> DataFrame:
    """Top-``k`` salient terms per document by TF-IDF (idf = ln(N/df), no
    smoothing — every token present in the corpus has df ≥ 1).

    Shape: term frequencies by (doc, token) with map-side combine; document
    frequencies are a second aggregation OF THE TF TABLE (already one row
    per (doc, token) — no second corpus scan); N is a broadcast scalar.
    The final top-k is a per-doc window over the scored TF table (each
    partition holds one doc's distinct terms, bounded by doc length).
    Ties break by token string so results are deterministic.
    """
    tk = _token_arrays(df, id_col, text_col)
    tf = (
        tk.select(F.col(id_col), F.explode("tk").alias("tok"))
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
        .transform(bounded_persist)
    )
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n_docs = tk.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "tok")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            "tok",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("tfidf"), F.asc("tok")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "rank", "tok", "tf", "df", "tfidf")
    )


def inverted_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_df: int = 5,
    max_postings: int = 20,
) -> DataFrame:
    """Bounded inverted index: for each token with document frequency ≥
    ``min_df``, the total df and the first ``max_postings`` posting ids
    (smallest doc ids — deterministic sample of the posting list).

    The bound is enforced BEFORE any list is built: distinct (token, doc)
    pairs get a per-token ``row_number`` ordered by doc id, rows beyond
    ``max_postings`` are dropped, and only then does ``collect_list`` run —
    so no aggregation state ever exceeds ``max_postings`` entries per
    token, no matter how hot the token (an unbounded ``collect_set`` on a
    stop-word would hold the whole corpus's doc ids in one task). df is
    counted in the same window pass (count over the token partition), and
    both window functions share one shuffle on the token key.
    """
    tk = _token_arrays(df, id_col, text_col)
    pairs = (
        tk.select(F.col(id_col), F.explode("tk").alias("tok"))
        .select("tok", id_col)
        .distinct()
    )
    wtok = Window.partitionBy("tok")
    worder = wtok.orderBy(id_col)
    ranked = pairs.select(
        "tok",
        F.col(id_col),
        F.row_number().over(worder).alias("rn"),
        F.count(F.lit(1)).over(wtok).alias("df"),
    )
    return (
        ranked.filter((F.col("df") >= min_df) & (F.col("rn") <= max_postings))
        .groupBy("tok", "df")
        .agg(F.sort_array(F.collect_list(id_col)).alias("postings"))
        .select("tok", "df", "postings")
    )


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 10,
) -> DataFrame:
    """Top-``k`` documents for a bag-of-words query by BM25 (Lucene idf
    form: ln(1 + (N - df + 0.5)/(df + 0.5))).

    Robertson & Walker's Okapi BM25 — the ranked-retrieval baseline every
    search stack starts from. Scale shape: the corpus token stream is cut
    to the query's terms BEFORE the (doc, term) aggregation (an IN filter
    over a literal list, pushed into the scan projection), so the tf table
    is |docs matching any term| × |query| at most, never corpus-sized;
    df and N are one tiny agg + broadcast each; the final top-k is
    TakeOrderedAndProject (per-partition heads, no global sort). Scores
    round to 6 dp so the DuckDB oracle compares on identical values.
    """
    tk = _token_arrays(df, id_col, text_col)
    lens = tk.select(F.col(id_col), F.size("tk").alias("dl"))
    stats = lens.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        tk.select(F.col(id_col), F.explode("tk").alias("tok"))
        .filter(F.col("tok").isin(query_terms))
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    return _bm25_score(tf, dfreq, lens, stats, id_col, k1=k1, b=b, k=k)


def _bm25_score(
    tf: DataFrame,
    dfreq: DataFrame,
    stats_lens: DataFrame,
    stats_global: DataFrame,
    id_col: str,
    *,
    k1: float,
    b: float,
    k: int,
) -> DataFrame:
    """Shared BM25 scoring tail: identical expression tree whether the
    df/N/avgdl inputs were computed per-query (``bm25_topk``) or read
    from an incrementally maintained stats view
    (``bm25_topk_from_stats``) — bit-identical doubles by construction,
    so the two paths carry the same oracle."""
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    norm = F.col("tf") * (k1 + 1) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        tf.join(F.broadcast(dfreq), "tok")
        .join(stats_lens, id_col)
        .crossJoin(F.broadcast(stats_global))
        .groupBy(id_col)
        .agg(
            F.round(F.sum(idf * norm), 6).alias("bm25"),
            F.count(F.lit(1)).alias("terms_matched"),
        )
    )
    return scored.orderBy(F.desc("bm25"), F.asc(id_col)).limit(k)


class Bm25CorpusStats:
    """Incrementally maintained BM25 corpus statistics — per-token
    document frequency plus global (N, Σdl) — via the mergeable-agg
    algebra (operators/incremental_agg.py).

    The steady-state shape of a retrieval corpus at 100 TB: documents
    arrive (and are erased) in batches, and recomputing df/idf/avgdl
    from scratch per refresh is a full-corpus token scan. Both stats
    here are invertible aggregates (counts and a sum), so a batch
    applies as one map-side-combined partial + one full-outer delta
    merge — O(|batch| + |vocab|) per increment, never a history re-scan
    — and a DELETED batch applies with ``sign=-1`` (the CDC retraction
    form, same signed-partial machinery as the change-feed consumer);
    tokens whose df hits zero drop from the view exactly as a
    recomputation would drop them.

    State is eagerly checkpointed per batch (lineage must not chain
    across arbitrarily many increments); in a lakehouse deployment the
    two frames persist as tables and the merge becomes MERGE INTO.
    ``bm25_topk_from_stats`` then serves queries from the view:
    value-identical to ``bm25_topk``'s from-scratch recompute (driver-
    gated by the ``bm25_incremental_update`` registry query).
    """

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        from healthcare_etl_pipeline_spark.operators.incremental_agg import (
            AggSpec,
        )

        self.id_col = id_col
        self.text_col = text_col
        self.tok_specs = [AggSpec("df", "count")]
        self.glob_specs = [
            AggSpec("n_docs", "count"),
            AggSpec("dl_sum", "sum", "dl"),
        ]
        self.tok_state: DataFrame | None = None
        self.glob_state: DataFrame | None = None

    def apply_batch(self, docs: DataFrame, *, sign: int = 1) -> None:
        """Merge one document batch into the stats (+1) or retract a
        previously applied batch (-1)."""
        from healthcare_etl_pipeline_spark.operators.incremental_agg import (
            merge_state,
            signed_partial_exprs,
        )

        tk = _token_arrays(docs, self.id_col, self.text_col)
        s = F.lit(sign)
        per_tok = (
            tk.select(F.explode(F.array_distinct("tk")).alias("tok"))
            .groupBy("tok")
            .agg(*signed_partial_exprs(self.tok_specs, s))
        )
        glob = (
            tk.select(F.size("tk").alias("dl"))
            .withColumn("__all", F.lit(0))
            .groupBy("__all")
            .agg(*signed_partial_exprs(self.glob_specs, s))
        )
        self.tok_state = merge_state(
            self.tok_state, per_tok, ["tok"], self.tok_specs
        ).localCheckpoint(eager=True)
        self.glob_state = merge_state(
            self.glob_state, glob, ["__all"], self.glob_specs
        ).localCheckpoint(eager=True)

    def token_stats(self) -> DataFrame:
        """(tok, df) for tokens with surviving documents."""
        from healthcare_etl_pipeline_spark.operators.incremental_agg import (
            non_empty_filter,
        )

        if self.tok_state is None:
            raise ValueError("no batches applied")
        return self.tok_state.filter(non_empty_filter(self.tok_specs))

    def global_stats(self) -> DataFrame:
        """One row: (n_docs, avgdl) — same derivation (Σdl / N) as the
        from-scratch ``avg``."""
        if self.glob_state is None:
            raise ValueError("no batches applied")
        return self.glob_state.select(
            F.col("n_docs"),
            (F.col("dl_sum") / F.col("n_docs")).alias("avgdl"),
        )


def bm25_topk_from_stats(
    df: DataFrame,
    stats: Bm25CorpusStats,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 10,
) -> DataFrame:
    """BM25 top-k serving df/N/avgdl from the incrementally maintained
    view instead of recomputing them: per-query work is the tf scan of
    matching docs only — the corpus-wide token aggregation happened at
    ingest time, once per increment."""
    tk = _token_arrays(df, id_col, text_col)
    lens = tk.select(F.col(id_col), F.size("tk").alias("dl"))
    tf = (
        tk.select(F.col(id_col), F.explode("tk").alias("tok"))
        .filter(F.col("tok").isin(query_terms))
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = stats.token_stats().filter(F.col("tok").isin(query_terms))
    return _bm25_score(
        tf, dfreq, lens, stats.global_stats(), id_col, k1=k1, b=b, k=k
    )


def hashed_features(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    dim: int = 256,
) -> DataFrame:
    """Hashing-trick features (Weinberger et al., ICML 2009): each token
    maps to bucket h(tok) mod ``dim`` with sign ±1 from an independent
    hash bit; a document's feature vector is the signed token-count sum
    per bucket, emitted sparse as (id, idx, val) rows (val may be 0 when
    signs cancel — kept, so the output is exactly the groupBy image).

    The fixed-dimension projection needs NO vocabulary build — no global
    dictionary shuffle, new tokens at 100 TB hash to the same space, and
    the signed sum keeps E[x·y] equal to the exact inner product. One
    explode + one map-side-combined groupBy; portable md5 hashes give the
    exact DuckDB oracle.
    """
    from healthcare_etl_pipeline_spark.operators.text import (
        portable_char_hash,
    )

    toks = _token_arrays(df, id_col, text_col).select(
        F.col(id_col), F.explode("tk").alias("tok")
    )
    idx = portable_char_hash(F.col("tok")) % dim
    sign = (portable_char_hash(F.concat(F.col("tok"), F.lit("#s"))) % 2) * 2 - 1
    return (
        toks.select(F.col(id_col), idx.alias("idx"), sign.alias("sign"))
        .groupBy(id_col, "idx")
        .agg(F.sum("sign").alias("val"))
    )


def segment_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    seg_tokens: int = 4,
    min_df: int = 2,
) -> DataFrame:
    """Boilerplate-segment removal (CCNet / RefinedWeb line-dedup adapted to
    unstructured text): split each document into NON-overlapping
    ``seg_tokens``-token segments, drop every segment whose corpus-wide
    document frequency reaches ``min_df``, and reassemble the survivors in
    document order.

    Output: (id, n_segments, n_kept, clean_text) — documents whose every
    segment was boilerplate drop out entirely (inner-join image), the same
    contract as the C4 "discard boilerplate-only pages" rule.

    Scale posture:
    - one explode of start positions (cheap ints), segment text sliced per
      OUTPUT row — the same Generate-safe shape as chunk_documents;
    - document frequency via one map-side-combined groupBy on the segment
      string (bounded by corpus vocab, not corpus size);
    - the df table joins back on the segment key — an equi-join Catalyst
      can broadcast when the distinct-segment table is small, else
      shuffle-hash on the same key the groupBy just used;
    - reassembly is one groupBy(id) with an order-struct collect_list —
      segments of one doc co-locate, no window over the corpus.
    """
    toks = _token_arrays(df, id_col, text_col)
    starts = F.when(
        F.size("tk") > 0, F.sequence(F.lit(1), F.size("tk"), F.lit(seg_tokens))
    ).otherwise(F.expr("array()").cast("array<int>"))
    segs = (
        toks.select(F.col(id_col), F.col("tk"), F.explode(starts).alias("s"))
        .select(
            F.col(id_col),
            (((F.col("s") - 1) / seg_tokens).cast("int")).alias("seg_index"),
            F.concat_ws(" ", F.slice(F.col("tk"), F.col("s"), seg_tokens)).alias(
                "seg"
            ),
        )
        # Generate's child is a plain int sequence; slice/concat run post-
        # explode. Checkpoint so the df-count pass and the join-back pass
        # read stored segments instead of re-tokenizing (HOFs are not CSE'd).
        .transform(bounded_persist)
    )
    seg_df = segs.groupBy("seg").agg(
        F.count_distinct(F.col(id_col)).alias("df")
    )
    kept = (
        segs.join(seg_df, "seg")
        .where(F.col("df") < min_df)
        .select(F.col(id_col), "seg_index", "seg")
    )
    totals = segs.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_segments"))
    return (
        kept.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("seg_index", "seg"))
                    ),
                    lambda x: x["seg"],
                ),
                " ",
            ).alias("clean_text"),
        )
        .join(totals, id_col)
        .select(id_col, "n_segments", "n_kept", "clean_text")
    )


def select_until_budget(
    df: DataFrame,
    id_col: str = "doc_id",
    quality_col: str = "quality",
    weight_col: str = "n_tokens",
    *,
    budget: int,
) -> DataFrame:
    """Budget-constrained data selection: take documents in quality order
    (best first, id tie-break) until the cumulative token budget fills —
    the selection step between scoring and tokenization in a training-data
    pipeline ("best B tokens", not "all docs above a threshold").

    A document is kept when the budget was not already exhausted BEFORE it
    (cumsum - own weight < budget), so the boundary doc that straddles the
    budget line is kept and selection is a deterministic prefix of the
    quality ordering.

    Scale note: a ``Window.orderBy`` with no partitionBy would move the
    WHOLE corpus into one partition (advisor finding, round 2). This is the
    real two-phase distributed prefix-sum instead: (1) range-partition on
    the selection order (sampled split points, no single-machine sort) and
    take per-partition running sums under a ``partitionBy(partition)``
    window; (2) aggregate one total per partition (``n_parts`` rows),
    running-sum THOSE on the driver-sized frame, and broadcast the offsets
    back. Each row's global cumsum = its local running sum + the offset of
    everything in earlier range partitions. The ordered frame is persisted
    so both consumers see one materialization (and one consistent
    ``spark_partition_id`` assignment — range sampling must not re-run
    between the offset and final branches).
    """
    spark = df.sparkSession
    n_parts = max(int(spark.conf.get("spark.sql.shuffle.partitions", "32")), 1)
    ordered = bounded_persist(
        df.select(id_col, quality_col, weight_col)
        .repartitionByRange(n_parts, F.desc(quality_col), F.asc(id_col))
        .sortWithinPartitions(F.desc(quality_col), F.asc(id_col))
        .withColumn("_pid", F.spark_partition_id())
    )
    # one row per range partition — running-summing these through a global
    # window is fine: the frame is n_parts rows, not the corpus
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        ordered.groupBy("_pid")
        .agg(F.sum(weight_col).alias("_part_w"))
        .withColumn("_off", F.coalesce(F.sum("_part_w").over(w_off), F.lit(0)))
        .select("_pid", "_off")
    )
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(F.desc(quality_col), F.asc(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ordered.withColumn("_local", F.sum(weight_col).over(w_local))
        .join(F.broadcast(offsets), "_pid")
        .withColumn("cum_tokens", F.col("_local") + F.col("_off"))
        .filter((F.col("cum_tokens") - F.col(weight_col)) < F.lit(budget))
        .select(id_col, quality_col, weight_col, "cum_tokens")
    )


def importance_weights(
    docs: DataFrame,
    target_pred: Column,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 512,
) -> DataFrame:
    """DSIR-style importance weights: hashed-n-gram log-likelihood ratio of
    a TARGET domain over the RAW domain, per document.

    Data Selection via Importance Resampling (Xie et al., 2023) scores raw
    documents by how target-like they look under cheap hashed n-gram LMs:
    weight(doc) = mean over tokens of
    ``ln p_target(bucket(tok)) − ln p_raw(bucket(tok))`` with add-1
    smoothing over ``buckets`` hash buckets. Positive → more target-like;
    resample/threshold on the weight to select pretraining data.

    Scale shape (the whole point of the hashed formulation):
    - ONE shuffle of (bucket) keys builds both domain LMs simultaneously —
      conditional map-side-combined counts, ``buckets`` output rows total,
      independent of corpus size.
    - The per-bucket log-ratio table (``buckets`` rows) broadcasts; the
      doc-side pass is explode → broadcast-join → per-doc re-aggregation,
      shuffling only (doc, partial-sum) pairs.
    - No vocabulary is materialized: hashing bounds LM size by construction
      (the published recipe's trick for 100 TB-scale selection).

    Output: (id, n_tokens, importance round-6). Empty docs drop out (no
    tokens → no LM evidence), mirroring the oracle's join semantics.
    """
    spark = docs.sparkSession
    tok = spread(docs, spark).select(
        F.col(id_col),
        target_pred.alias("__is_target"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    )
    from healthcare_etl_pipeline_spark.operators.text import portable_char_hash

    tok = tok.select(
        id_col,
        "__is_target",
        (portable_char_hash(F.col("tok")) % buckets).alias("bucket"),
    )
    stats = tok.groupBy("bucket").agg(
        F.sum(F.when(F.col("__is_target"), 1).otherwise(0)).alias("t_cnt"),
        F.sum(F.when(F.col("__is_target"), 0).otherwise(1)).alias("r_cnt"),
    )
    totals = stats.agg(
        F.sum("t_cnt").alias("t_total"), F.sum("r_cnt").alias("r_total")
    )
    log_ratio = (
        stats.crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            (
                F.log((F.col("t_cnt") + 1.0) / (F.col("t_total") + F.lit(buckets)))
                - F.log((F.col("r_cnt") + 1.0) / (F.col("r_total") + F.lit(buckets)))
            ).alias("lr"),
        )
    )
    return (
        tok.join(F.broadcast(log_ratio), "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg("lr"), 6).alias("importance"),
        )
    )

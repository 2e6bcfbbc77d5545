"""BPE trainer: Spark iterative implementation vs pure-Python reference."""

from collections import Counter

from healthcare_etl_pipeline_spark.operators.bpe import END_MARK, bpe_train


def _ref_bpe(word_freqs: dict[str, int], n_merges: int, min_count: int):
    """Straightforward single-machine BPE for cross-checking."""
    vocab = {w: list(w) + [END_MARK] for w in word_freqs}
    merges = []
    for _ in range(n_merges):
        counts: Counter = Counter()
        for w, syms in vocab.items():
            f = word_freqs[w]
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += f
        if not counts:
            break
        # max count; ties -> lexicographically smallest (left, right)
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), n = best
        if n < min_count:
            break
        merges.append((left, right, n))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges


def test_bpe_matches_reference(spark):
    words = {
        "low": 5, "lower": 2, "lowest": 6, "newer": 3, "wider": 2,
        "new": 4, "widest": 1, "lowly": 2,
    }
    text_rows = []
    for w, f in words.items():
        text_rows.extend([w] * f)
    # spread words across a few documents
    docs = spark.createDataFrame(
        [(i, " ".join(text_rows[i::3])) for i in range(3)], ["doc_id", "text"]
    )
    got = bpe_train(docs, "text", n_merges=8, min_pair_count=2)
    want = _ref_bpe(words, 8, 2)
    assert got == want


def test_bpe_overlapping_pairs(spark):
    # "aaaa" -> pair (a,a) counted per adjacent position; merge is
    # left-to-right non-overlapping: aaaa -> (aa)(aa)
    docs = spark.createDataFrame([(1, "aaaa aaaa aa")], ["doc_id", "text"])
    got = bpe_train(docs, "text", n_merges=2, min_pair_count=2)
    want = _ref_bpe({"aaaa": 2, "aa": 1}, 2, 2)
    assert got == want
    assert got[0][0] == "a" and got[0][1] == "a"


def test_bpe_encode_matches_python_reference(spark):
    from healthcare_etl_pipeline_spark.operators.bpe import (
        END_MARK,
        bpe_encode,
        bpe_train,
    )

    rows = [(1, "low low lower lowest"), (2, "new newer newest low")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    merges = bpe_train(docs, n_merges=6, min_pair_count=2)
    ranked = {(l, r): i for i, (l, r, _) in enumerate(merges)}

    def ref_encode(word):
        syms = list(word) + [END_MARK]
        while len(syms) > 1:
            cand = [
                (ranked[(syms[i], syms[i + 1])], i)
                for i in range(len(syms) - 1)
                if (syms[i], syms[i + 1]) in ranked
            ]
            if not cand:
                break
            _, i = min(cand)
            syms[i : i + 2] = [syms[i] + syms[i + 1]]
        return syms

    out = {r.doc_id: r for r in bpe_encode(docs, merges).collect()}
    for doc_id, text in rows:
        words = text.split()
        exp_tokens = sum(len(ref_encode(w)) for w in words)
        assert out[doc_id].n_words == len(words)
        assert out[doc_id].n_tokens == exp_tokens

"""BPE tokenizer prep (operators/bpe.py): distributed word stats + driver
merge loop + Arrow encode — differential against an independent naive
implementation."""

from __future__ import annotations

from collections import Counter

from scalligraph_spark.operators import encode_bpe, train_bpe, word_frequencies


def naive_bpe(texts: list[str], n_merges: int) -> list[tuple[str, str]]:
    """Independent reference: corpus-as-a-list BPE with the same
    determinism contract (max count, then lexicographically smallest)."""
    vocab = Counter()
    for t in texts:
        for w in t.split():
            vocab[tuple(w)] += 1
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for sym, freq in vocab.items():
            for p in zip(sym, sym[1:]):
                pairs[p] += freq
        if not pairs:
            break
        mc = max(pairs.values())
        best = min(p for p, c in pairs.items() if c == mc)
        merges.append(best)
        nv = Counter()
        for sym, freq in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i < len(sym) - 1 and (sym[i], sym[i + 1]) == best:
                    out.append(sym[i] + sym[i + 1])
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            nv[tuple(out)] += freq
        vocab = nv
    return merges


TEXTS = [
    "low low low lower lowest",
    "new newer newest low",
    "widest wide wider new",
    "the the the them theme",
]


def _docs(spark):
    return spark.createDataFrame(list(enumerate(TEXTS)), "doc_id long, text string")


def test_word_frequencies_exact(spark):
    got = {r["word"]: r["freq"] for r in word_frequencies(_docs(spark)).collect()}
    want = Counter(w for t in TEXTS for w in t.split())
    assert got == dict(want)


def test_train_matches_naive_reference(spark):
    assert train_bpe(_docs(spark), n_merges=12, max_words=100) == naive_bpe(TEXTS, 12)


def test_train_partitioning_invariant(spark):
    a = train_bpe(_docs(spark), n_merges=8)
    b = train_bpe(_docs(spark).repartition(5), n_merges=8)
    assert a == b


def test_encode_known_example(spark):
    docs = spark.createDataFrame([(1, "low lower lowest")], "doc_id long, text string")
    merges = [("l", "o"), ("lo", "w"), ("e", "r")]
    rows = encode_bpe(docs, merges).collect()
    assert rows[0]["tokens"] == ["low", "low", "er", "low", "e", "s", "t"]
    assert rows[0]["n_tokens"] == 7


def test_encode_applies_lowest_rank_first(spark):
    # ranks: ("a","b") before ("b","c") — "abc" must become ["ab","c"]
    docs = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    rows = encode_bpe(docs, [("a", "b"), ("b", "c")]).collect()
    assert rows[0]["tokens"] == ["ab", "c"]


def test_encode_vocab_cap_truncation(spark):
    """max_words keeps the most frequent words only — rare words still
    ENCODE (char fallback), they just don't influence training."""
    texts = ["aa aa aa aa", "zz"]
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    merges = train_bpe(docs, n_merges=2, max_words=1)
    assert merges == [("a", "a")]
    out = {r["doc_id"]: r["tokens"] for r in encode_bpe(docs, merges).collect()}
    assert out[0] == ["aa"] * 4 and out[1] == ["z", "z"]


def test_merges_roundtrip_through_store(spark, tmp_path):
    from scalligraph_spark.operators.bpe import merges_from_df, merges_to_df
    from scalligraph_spark.store import LabelStore

    merges = train_bpe(_docs(spark), n_merges=5)
    store = LabelStore(str(tmp_path))
    store.write("bpe_merges", merges_to_df(spark, merges))
    back = merges_from_df(store.read(spark, "bpe_merges"))
    assert back == merges

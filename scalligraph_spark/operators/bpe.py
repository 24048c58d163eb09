"""BPE tokenizer preparation: distributed corpus statistics + merge
training + distributed encoding.

The tokenizer-prep step of an LLM data pipeline (Sennrich et al. 2016;
the sentencepiece / HF-tokenizers architecture): merge TRAINING runs on
the word-frequency table, not the corpus — the distributed work is the
word count (one map-side-combined aggregate over 100 TB) and the ENCODE
pass (map-only, merges broadcast); the merge loop itself is in-memory on
a bounded vocabulary, exactly like every production trainer.

* :func:`word_frequencies` — the one corpus-wide shuffle.
* :func:`train_bpe` — TakeOrdered caps the vocab at ``max_words`` (most
  frequent; deterministic tie-break), then the classic greedy loop:
  repeatedly merge the highest-count adjacent symbol pair.  Pure Python
  on ≤ ``max_words`` rows — driver-side by design, not an afterthought.
* :func:`encode_bpe` — Arrow-batched ``pandas_udf``: applies the learned
  merge ranks per word (lowest-rank pair first, the standard BPE apply)
  with a per-batch word cache; merges ship once via closure broadcast.

Determinism: pair-count ties break lexicographically, so the same corpus
always learns the same merges regardless of partitioning.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over whitespace-split text — one partial-aggregated
    count; the only pass over the full corpus that training needs."""
    w = F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("word")
    return docs.select(w).where(F.col("word") != "").groupBy("word").agg(
        F.count(F.lit(1)).alias("freq")
    )


def train_bpe(
    docs: DataFrame,
    n_merges: int = 100,
    max_words: int = 50_000,
    text_col: str = "text",
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus.

    The vocab cap (``max_words`` most frequent words, TakeOrdered — no
    full sort) bounds driver memory no matter the corpus size; rare-word
    truncation is the standard trainer trade (HF ``limit_alphabet`` /
    sentencepiece sampling do the same).  Returns merges in learned order.
    """
    rows = (
        word_frequencies(docs, text_col)
        .orderBy(F.desc("freq"), F.asc("word"))
        .limit(max_words)
        .collect()
    )
    vocab = {tuple(r["word"]): r["freq"] for r in rows}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for symbols, freq in vocab.items():
            for a, b in zip(symbols, symbols[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + freq
        if not pairs:
            break
        # deterministic: max count, ties broken by lexicographically smallest pair
        max_count = max(pairs.values())
        best_pair = min(p for p, c in pairs.items() if c == max_count)
        merges.append(best_pair)
        merged = best_pair[0] + best_pair[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for symbols, freq in vocab.items():
            out = []
            i = 0
            while i < len(symbols):
                if i < len(symbols) - 1 and symbols[i] == best_pair[0] and symbols[i + 1] == best_pair[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(symbols[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + freq
        vocab = new_vocab
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    symbols = list(word)
    while len(symbols) > 1:
        best_rank, best_i = None, None
        for i, pair in enumerate(zip(symbols, symbols[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        symbols[best_i : best_i + 2] = [symbols[best_i] + symbols[best_i + 1]]
    return symbols


def encode_bpe(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "tokens",
) -> DataFrame:
    """Encode each document with learned merges → token array + count.

    Arrow-batched ``pandas_udf`` (BPE apply is inherently per-word
    sequential — the legitimate Python hot path); the merge table ships
    once in the closure, and a per-batch word→tokens cache makes cost
    proportional to DISTINCT words per batch, not tokens.
    """
    from pyspark.sql.functions import pandas_udf

    ranks = {pair: i for i, pair in enumerate(merges)}

    @pandas_udf("array<string>")
    def enc(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def run(t):
            out: list[str] = []
            for w in (t or "").split():
                got = cache.get(w)
                if got is None:
                    got = cache[w] = _encode_word(w, ranks)
                out.extend(got)
            return out

        return texts.map(run)

    out = docs.withColumn(out_col, enc(F.col(text_col)))
    return out.withColumn(f"n_{out_col}", F.size(F.col(out_col)).cast("long"))


def merges_to_df(spark, merges: list[tuple[str, str]]) -> DataFrame:
    """Tokenizer artifact → table ``(rank, left, right)`` for
    LabelStore-versioned persistence (the trained tokenizer ships WITH the
    data drop it encoded)."""
    return spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)], "rank long, left string, right string"
    )


def merges_from_df(df: DataFrame) -> list[tuple[str, str]]:
    """Load merges back in rank order (inverse of :func:`merges_to_df`)."""
    return [(r["left"], r["right"]) for r in df.orderBy("rank").collect()]

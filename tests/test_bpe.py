"""BPE training + tokenization (ops/bpe.py): hand-computed classic
example, incremental-vs-naive recount equivalence, greedy encoding,
and the distributed train/tokenize round trip."""

import random
from collections import Counter

import pytest

from whylogs_spark.ops import bpe


def test_classic_merge_sequence():
    # Sennrich et al. example shape: 'es' -> 'est' -> 'est</w>' lead
    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = bpe.learn_bpe_merges(freqs, 4)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", "</w>")
    assert merges[3] == ("l", "o")


def _naive_learn(word_freqs, num_merges):
    """Recount-everything reference implementation."""
    words = [[list(bpe._word_symbols(w)), c]
             for w, c in word_freqs.items() if w]
    merges = []
    for _ in range(num_merges):
        counts = Counter()
        for sym, c in words:
            for i in range(len(sym) - 1):
                counts[(sym[i], sym[i + 1])] += c
        if not counts:
            break
        best_c = max(counts.values())
        if best_c <= 0:
            break
        pair = min(p for p, c in counts.items() if c == best_c)
        merges.append(pair)
        for w in words:
            sym = w[0]
            out, i = [], 0
            while i < len(sym):
                if (i < len(sym) - 1 and sym[i] == pair[0]
                        and sym[i + 1] == pair[1]):
                    out.append(pair[0] + pair[1])
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            w[0] = out
    return merges


def test_incremental_matches_naive_recount():
    rng = random.Random(7)
    alphabet = "abcdef"
    freqs = {}
    for _ in range(120):
        w = "".join(rng.choice(alphabet)
                    for _ in range(rng.randint(1, 8)))
        freqs[w] = freqs.get(w, 0) + rng.randint(1, 20)
    a = bpe.learn_bpe_merges(dict(freqs), 60)
    b = _naive_learn(freqs, 60)
    assert a == b


def test_encode_applies_lowest_rank_first():
    merges = [("a", "b"), ("ab", "c"), ("b", "c")]
    ranks = {p: i for i, p in enumerate(merges)}
    # 'abc' -> ab|c (rank 0) -> abc (rank 1), never b|c
    assert bpe.bpe_encode_word("abc", ranks)[:1] == ("abc",)
    # unmergeable word stays characters + </w>
    assert bpe.bpe_encode_word("xyz", ranks) == ("x", "y", "z", "</w>")


def test_train_and_tokenize_roundtrip(spark):
    rows = [(i, "the cat sat on the mat " * 3) for i in range(20)]
    rows += [(100 + i, "dogs chase cats every day") for i in range(10)]
    rows += [(200, ""), (201, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    model = bpe.train_bpe(df, num_merges=50, max_word_types=1000)
    assert len(model.merges) > 0
    # frequent whole words become single tokens ('the' + </w>)
    ranks = model.ranks
    assert bpe.bpe_encode_word("the", ranks) == ("the</w>",)
    out = {r.doc_id: r for r in
           bpe.tokenize_bpe(df, model).collect()}
    assert out[200].n_tokens == 0 and out[201].n_tokens == 0
    # distributed kernel equals driver encoding
    want = sum(len(bpe.bpe_encode_word(w, ranks))
               for w in ("the cat sat on the mat " * 3).split())
    assert out[0].n_tokens == want
    toks = {r.doc_id: r.tokens for r in
            bpe.tokenize_bpe(df, model, emit_tokens=True).collect()}
    assert toks[100][:1] != []


def test_tokenize_deterministic_under_repartition(spark):
    rows = [(i, f"alpha beta gamma delta {i % 5}") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    model = bpe.train_bpe(df, num_merges=30, max_word_types=100)
    a = sorted((r.doc_id, r.n_tokens) for r in
               bpe.tokenize_bpe(df, model).collect())
    b = sorted((r.doc_id, r.n_tokens) for r in
               bpe.tokenize_bpe(df.repartition(7), model).collect())
    assert a == b


def test_tokenize_matches_training_on_unicode_whitespace(spark):
    # NBSP is NOT a Java \s whitespace: training sees one word type;
    # the tokenize kernel must agree (Python \s would split it)
    rows = [(0, "café bar"), (1, "café bar")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    model = bpe.train_bpe(df, num_merges=20, max_word_types=10)
    out = {r.doc_id: r.n_tokens for r in
           bpe.tokenize_bpe(df, model).collect()}
    want = len(bpe.bpe_encode_word("café bar", model.ranks))
    assert out[0] == want


def test_case_fold_parity_non_ascii(spark):
    """Train and tokenize must agree on case folding for non-ASCII
    letters: both sides use the locale-free ASCII translate map, so
    U+0130 (I-with-dot), ß and uppercase ASCII fold identically —
    trained word types and kernel tokens line up exactly."""
    rows = [(0, "İstanbul STRASSE straße Iı İstanbul STRASSE")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    model = bpe.train_bpe(df, num_merges=30, max_word_types=20)
    out = {r.doc_id: r.n_tokens for r in
           bpe.tokenize_bpe(df, model).collect()}
    folded = ["İstanbul", "strasse", "straße", "iı", "İstanbul",
              "strasse"]
    want = sum(len(bpe.bpe_encode_word(w, model.ranks)) for w in folded)
    assert out[0] == want
    # non-ASCII uppercase survives UNfolded in the learned vocabulary
    assert any("İ" in s for s in model.vocab)

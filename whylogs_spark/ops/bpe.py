"""Byte-pair-encoding (BPE) tokenizer: distributed training pass +
Arrow-batched tokenization.

Sennrich et al. 2016 subword BPE with GPT-2-style greedy rank merging
at encode time. The design follows how production tokenizer trainers
(sentencepiece, HF tokenizers) actually scale: the corpus is collapsed
to a WORD-TYPE FREQUENCY table first — one distributed
explode+groupBy(word) pass with map-side partial aggregation, capped at
``max_word_types`` rows via a distributed top-K (TakeOrderedAndProject,
deterministic tie-break) — and the merge loop runs over that bounded
table on the driver. At 100 TB the word-count pass is the only thing
that touches the corpus; the merge loop's input is <= max_word_types
rows no matter the input size (and standard practice is to train on a
``hash_split`` sample anyway — compose with ops/sampling.py for that).

Tokenization broadcasts the merge ranks (a list of string pairs, a few
hundred KB) into an Arrow ``mapInPandas`` kernel with per-word
memoization — zero shuffle, linear in corpus size.

The merge loop uses the standard incremental pair-count maintenance
(only words containing the merged pair are re-counted), verified in
tests against an independent recount-everything implementation.

No SQL engine expresses the iterative merge loop, so the gate entry for
this operator is rows-only (the driver records the weaker check); the
algorithmic correctness evidence is the cross-implementation test.
"""

from __future__ import annotations

from collections import Counter, defaultdict
from dataclasses import dataclass
from typing import Dict, Iterator, List, Sequence, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_EOW = "</w>"  # end-of-word marker: lets merges learn word-final units

# ASCII-only case folding, applied IDENTICALLY on both sides of the
# train/tokenize boundary. JVM F.lower falls back to Java
# toLowerCase() with the executor's DEFAULT locale for non-ASCII input
# (tr_TR turns I into dotless i; U+0130 maps one-to-many), while the
# Python kernel's str.lower() follows Unicode rules — so a plain
# lower() on each side can disagree on the very word types the model
# was trained on. translate() is a pure character map with no locale
# and no one-to-many expansion: non-ASCII letters keep their case on
# BOTH sides, deterministically (pinned by the parity test with
# U+0130/ß/İ inputs).
_ASCII_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_ASCII_LOWER = "abcdefghijklmnopqrstuvwxyz"
_PY_FOLD = str.maketrans(_ASCII_UPPER, _ASCII_LOWER)


@dataclass(frozen=True)
class BpeModel:
    """Learned merge list (in order) and the derived vocabulary."""

    merges: Tuple[Tuple[str, str], ...]
    vocab: Tuple[str, ...]

    @property
    def ranks(self) -> Dict[Tuple[str, str], int]:
        return {pair: i for i, pair in enumerate(self.merges)}


def _word_symbols(word: str) -> Tuple[str, ...]:
    return tuple(word) + (_EOW,)


def _pairs_of(sym: Sequence[str]) -> Iterator[Tuple[str, str]]:
    for i in range(len(sym) - 1):
        yield (sym[i], sym[i + 1])


def learn_bpe_merges(
    word_freqs: Dict[str, int], num_merges: int
) -> List[Tuple[str, str]]:
    """Classic BPE merge learning over a word-type frequency table.

    Incremental bookkeeping: a global pair Counter plus a pair->word
    index; each merge re-counts only the words that contain the merged
    pair. Ties break on (count desc, pair lexicographic) so training is
    deterministic regardless of dict iteration order.
    """
    words: List[Tuple[Tuple[str, ...], int]] = [
        (_word_symbols(w), c) for w, c in word_freqs.items() if w
    ]
    pair_counts: Counter = Counter()
    pair_words: defaultdict = defaultdict(set)
    for wi, (sym, c) in enumerate(words):
        for p in _pairs_of(sym):
            pair_counts[p] += c
            pair_words[p].add(wi)
    merges: List[Tuple[str, str]] = []
    for _ in range(num_merges):
        best = None
        for p, c in pair_counts.items():
            if c <= 0:
                continue
            if best is None or c > best[1] or (c == best[1] and p < best[0]):
                best = (p, c)
        if best is None:
            break
        pair = best[0]
        merges.append(pair)
        merged = pair[0] + pair[1]
        for wi in list(pair_words[pair]):
            sym, c = words[wi]
            for p in _pairs_of(sym):
                pair_counts[p] -= c
                pair_words[p].discard(wi)
            out: List[str] = []
            i = 0
            while i < len(sym):
                if (i < len(sym) - 1 and sym[i] == pair[0]
                        and sym[i + 1] == pair[1]):
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_sym = tuple(out)
            words[wi] = (new_sym, c)
            for p in _pairs_of(new_sym):
                pair_counts[p] += c
                pair_words[p].add(wi)
    return merges


def bpe_encode_word(
    word: str, ranks: Dict[Tuple[str, str], int]
) -> Tuple[str, ...]:
    """GPT-2-style greedy encoding: repeatedly apply the LOWEST-rank
    applicable merge. Unmergeable characters remain single symbols."""
    sym: List[str] = list(_word_symbols(word))
    while len(sym) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i:best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return tuple(sym)


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 200,
    max_word_types: int = 100_000,
) -> BpeModel:
    """Train BPE merges from a corpus DataFrame.

    ONE distributed pass: ASCII-case-folded whitespace word counts
    (map-side partial agg bounds the shuffle at
    distinct-words-per-partition),
    distributed top-``max_word_types`` by (count desc, word) — never a
    single-task global sort — then the driver merge loop over the
    bounded table. This is the only ``collect`` and it is capped at
    ``max_word_types`` rows by construction.
    """
    t = F.translate(F.trim(F.col(text_col)), _ASCII_UPPER, _ASCII_LOWER)
    words = df.select(
        F.explode(
            F.when(F.length(t) == 0, F.array().cast("array<string>"))
            .otherwise(F.split(t, r"\s+"))).alias("w"))
    # drop empty tokens (leading/trailing non-space whitespace that
    # trim leaves behind) so training and the tokenize kernel agree on
    # word boundaries exactly
    counts = words.filter(F.col("w") != "") \
        .groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    top = counts.orderBy(F.col("c").desc(), F.col("w").asc()) \
        .limit(max_word_types).collect()
    freqs = {r.w: r.c for r in top}
    merges = learn_bpe_merges(freqs, num_merges)
    ranks = {p: i for i, p in enumerate(merges)}
    vocab = sorted({s for w in freqs
                    for s in bpe_encode_word(w, ranks)})
    return BpeModel(merges=tuple(merges), vocab=tuple(vocab))


TOKENIZE_SCHEMA_COUNT = "n_tokens long"


def tokenize_bpe(
    df: DataFrame,
    model: BpeModel,
    text_col: str = "text",
    id_col: str = "doc_id",
    emit_tokens: bool = False,
) -> DataFrame:
    """Tokenize a corpus with a trained model: (id, n_tokens) or
    (id, n_tokens, tokens) with ``emit_tokens=True``.

    The merge ranks ship in the task closure (a few hundred KB — same
    size class as a broadcast variable) into an Arrow ``mapInPandas``
    kernel that memoizes per word type, so each distinct word is
    encoded once per partition. Zero shuffle; empty/null text yields 0
    tokens.
    """
    ranks = model.ranks
    fields = [df.schema[id_col],
              T.StructField("n_tokens", T.LongType())]
    if emit_tokens:
        fields.append(
            T.StructField("tokens", T.ArrayType(T.StringType())))
    schema = T.StructType(fields)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: Dict[str, Tuple[str, ...]] = {}

        def enc(word: str) -> Tuple[str, ...]:
            got = cache.get(word)
            if got is None:
                got = bpe_encode_word(word, ranks)
                cache[word] = got
            return got

        import re as _re

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                # mirror the training tokenizer EXACTLY: JVM trim
                # strips ASCII spaces only, Java \s+ is ASCII-only
                # (Python's \s is Unicode-aware — re.ASCII matches),
                # and case folding is the locale-free ASCII translate
                # map shared with train_bpe
                text = (r[text_col] or "").strip(" ").translate(_PY_FOLD)
                toks: List[str] = []
                if text:
                    for w in _re.split(r"\s+", text, flags=_re.ASCII):
                        if w:
                            toks.extend(enc(w))
                if emit_tokens:
                    rows.append((r[id_col], len(toks), toks))
                else:
                    rows.append((r[id_col], len(toks)))
            cols = [id_col, "n_tokens"] + (["tokens"] if emit_tokens
                                           else [])
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, text_col).mapInPandas(kernel, schema)

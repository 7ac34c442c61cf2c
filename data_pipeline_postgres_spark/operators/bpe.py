"""Byte-pair-encoding tokenizer: train + distributed apply.

Completes the tokenizer family (SURVEY.md §2.11): the corpus-wide
word-pair trainers (``bpe_pair_merges``, ``docs_bpe_train_merges``)
demonstrate merge SELECTION at corpus scale; this module holds the
classic CHARACTER-level BPE (Sennrich et al. 2016) used by the
``tokenizer_bpe_apply`` query — train on a frequency-weighted word-type
table, then encode arbitrary words by applying merges in rank order
(the GPT-2 ``bpe()`` loop).

Division of labor at 100 TB:

- TRAINING runs on the word-TYPE table, which is vocabulary-bounded
  (and here capped to the top-N types by frequency — what real
  tokenizer trainers do too); the capped table is a bounded driver
  artifact in the same class as the Markov transition matrix and the
  d x d Gram collects documented in the anti-pattern sweep.
- APPLY is the distributed path: encode DISTINCT word types (never
  the token stream — identical words encode identically) with an
  Arrow-batched pandas UDF, then join the per-type piece counts back
  to the per-(source, type) frequency relation. The Python kernel
  touches |vocab| rows regardless of corpus size.
"""

from __future__ import annotations

import pandas as pd


def make_n_pieces_udf(ranks: dict[tuple[str, str], int]):
    """Arrow-batched piece-count kernel: a pandas UDF closing over the
    (tiny) merge-rank table. Defined here — with pandas imported at
    module scope — so the UDF's type hints resolve under PEP 563
    (``from __future__ import annotations`` stringifies them and
    ``pandas_udf`` re-resolves against the defining module's
    globals)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("bigint")
    def n_pieces(col: pd.Series) -> pd.Series:
        return col.map(lambda w: len(encode(w, ranks)))

    return n_pieces


def train_merges(
    weighted_types: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str]]:
    """Classic BPE training over a (word, frequency) table: repeatedly
    merge the adjacent symbol pair with the highest frequency-weighted
    count. Deterministic: ties break on the lexicographically smallest
    pair. Returns the ordered merge list (rank = list position)."""
    seqs: list[tuple[list[str], int]] = [
        (list(w), n) for w, n in weighted_types if len(w) >= 2
    ]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for sym, n in seqs:
            for a, b in zip(sym, sym[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + n
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        ab = a + b
        for sym, _ in seqs:
            i = 0
            while i < len(sym) - 1:
                if sym[i] == a and sym[i + 1] == b:
                    sym[i : i + 2] = [ab]
                else:
                    i += 1
    return merges


def encode(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode one word with a trained merge table: repeatedly apply
    the lowest-rank applicable merge until none applies (the standard
    greedy-by-priority BPE apply loop)."""
    sym = list(word)
    while len(sym) >= 2:
        pairs = {(a, b) for a, b in zip(sym, sym[1:])}
        ranked = [(ranks[p], p) for p in pairs if p in ranks]
        if not ranked:
            break
        _, (a, b) = min(ranked)
        ab = a + b
        i = 0
        while i < len(sym) - 1:
            if sym[i] == a and sym[i + 1] == b:
                sym[i : i + 2] = [ab]
            else:
                i += 1
    return sym

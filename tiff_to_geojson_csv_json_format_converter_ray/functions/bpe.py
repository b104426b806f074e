"""Byte-pair-encoding merge training over a distributed corpus.

The industry-standard BPE trainer (Sennrich et al. 2016) never touches
the corpus after one counting pass: it operates on the DISTINCT-WORD
frequency table, which is token-vocabulary bounded -- at 100 TB the
corpus streams once through the distributed word-count combiner and the
merge loop runs on the (small) vocabulary table.  This module provides
that split: ``corpus_word_counts`` is the Ray Data pass,
``train_merges`` the deterministic driver-side loop.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

END = "</w>"


def corpus_word_counts(ds, text_col: str = "text") -> pa.Table:
    """Distinct-word frequency table via the combiner pattern: each
    batch collapses to its local word histogram (Arrow RE2 split +
    group_by, no Python loop), partials combine over the vocab-bounded
    intermediate."""
    import pyarrow.compute as pc

    from ..pipelines.relational import hash_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(
            pc.split_pattern_regex(batch[text_col], pattern=r"\s+")
        )
        toks = toks.filter(pc.not_equal(toks, ""))
        t = pa.table({"word": toks})
        out = t.group_by("word").aggregate([("word", "count")])
        return out.rename_columns(["word", "n"])

    return hash_aggregate(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None),
        ["word"],
        [("n", "sum", "n")],
    )


def train_merges(word_counts: pa.Table, num_merges: int = 20) -> pa.Table:
    """Learn ``num_merges`` BPE merges from a (word, n) frequency
    table.  Words are split to characters plus the ``</w>`` end marker;
    each round counts frequency-weighted adjacent symbol pairs, merges
    the max (ties broken by lexicographic pair for determinism), and
    rewrites only the words containing that pair.  Cost is bounded by
    |vocab| x max word length x num_merges -- corpus-size independent.

    Returns (rank:int64, left:string, right:string, pair_count:int64).
    """
    words = word_counts["word"].to_pylist()
    freqs = word_counts["n"].to_pylist()
    symbolized = [tuple(w) + (END,) for w in words]

    ranks, lefts, rights, counts = [], [], [], []
    for rank in range(num_merges):
        pair_n: dict[tuple[str, str], int] = {}
        for sym, f in zip(symbolized, freqs):
            for a, b in zip(sym, sym[1:]):
                pair_n[(a, b)] = pair_n.get((a, b), 0) + f
        if not pair_n:
            break
        best = max(pair_n.items(), key=lambda kv: (kv[1], kv[0]))
        # deterministic: highest count, then lexicographically LAST
        # pair (max over the tuple) -- a fixed total order either way
        (left, right), n = best
        merged = left + right
        new_syms = []
        for sym in symbolized:
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == left and sym[i + 1] == right:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_syms.append(tuple(out))
        symbolized = new_syms
        ranks.append(rank)
        lefts.append(left)
        rights.append(right)
        counts.append(n)

    return pa.table(
        {
            "rank": pa.array(ranks, pa.int64()),
            "left": pa.array(lefts, pa.string()),
            "right": pa.array(rights, pa.string()),
            "pair_count": pa.array(counts, pa.int64()),
        }
    )


def apply_merges_tokens(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Tokenize one word with a learned merge list (training-order
    priority, the standard BPE inference rule)."""
    sym = list(word) + [END]
    rank = {m: i for i, m in enumerate(merges)}
    while len(sym) > 1:
        best_i, best_r = -1, None
        for i, pair in enumerate(zip(sym, sym[1:])):
            r = rank.get(pair)
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_r is None:
            break
        sym[best_i:best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym

"""Text-analysis stages over a documents table: language-ID, quality
scoring, token counting, document fingerprinting -- the training-data
operators (all deterministic pure functions from functions/text.py and
functions/hashing.py, applied per batch)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions import hashing as H
from .shuffle import grouped_by_key
from ..functions import text as T


class TextClean:
    """C4-style line-level cleaning stage: appends ``text_clean`` and
    ``n_lines_kept`` (deterministic; config frozen per stage)."""

    def __init__(self, text_col: str = "text", min_words_per_line: int = 3,
                 require_terminal_punct: bool = True, dedupe_lines: bool = True):
        self.text_col = text_col
        self.kw = dict(
            min_words_per_line=min_words_per_line,
            require_terminal_punct=require_terminal_punct,
            dedupe_lines=dedupe_lines,
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch[self.text_col].to_pylist()]
        cleaned = [T.clean_text(t, **self.kw) for t in texts]
        batch = batch.append_column("text_clean", pa.array(cleaned))
        batch = batch.append_column(
            "n_lines_kept",
            pa.array(
                np.fromiter(
                    (len(c.split("\n")) if c else 0 for c in cleaned),
                    np.int64, len(cleaned),
                )
            ),
        )
        return batch


class TextAnnotate:
    """Append lang_id / token counts / quality / fingerprint columns.

    ``features`` picks the column families:
      'lang'     -> lang_id
      'tokens'   -> n_tokens_ws, n_tokens_bpe
      'quality'  -> n_chars_f, mean_word_len, punct_ratio, digit_ratio,
                    upper_ratio, stopword_ratio, unique_token_ratio, quality
      'fingerprint' -> simhash64, winnow_min (min winnowing hash)
    """

    def __init__(self, text_col: str = "text",
                 features: tuple[str, ...] = ("lang", "tokens", "quality", "fingerprint")):
        self.text_col = text_col
        self.features = features

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch[self.text_col].to_pylist()]
        n = len(texts)
        if "lang" in self.features:
            batch = batch.append_column(
                "lang_id", pa.array([T.detect_language(t) for t in texts])
            )
        if "tokens" in self.features:
            batch = batch.append_column(
                "n_tokens_ws",
                pa.array(np.fromiter((len(t.split()) for t in texts), np.int64, n)),
            )
            batch = batch.append_column(
                "n_tokens_bpe",
                pa.array(
                    np.fromiter((T.token_count(t, "bpe") for t in texts), np.int64, n)
                ),
            )
        if "quality" in self.features:
            feats = [T.quality_features(t) for t in texts]
            for name in (
                "mean_word_len", "punct_ratio", "digit_ratio", "upper_ratio",
                "stopword_ratio", "unique_token_ratio", "quality",
            ):
                batch = batch.append_column(
                    name, pa.array(np.array([f[name] for f in feats]))
                )
        if "fingerprint" in self.features:
            toks = [t.split() for t in texts]
            flat = [w for d in toks for w in d]
            bounds = np.r_[0, np.cumsum([len(d) for d in toks])].astype(np.int64)
            sims = H.simhash_batch(H.fnv1a_array(flat), bounds)
            wins = np.empty(n, dtype=np.uint64)
            for i, t in enumerate(texts):
                fp = H.winnow_fingerprint(t)
                wins[i] = fp.min() if len(fp) else 0
            batch = batch.append_column("simhash64", pa.array(sims.view(np.int64)))
            batch = batch.append_column("winnow_min", pa.array(wins.view(np.int64)))
        return batch


# ------------------------------------------------------------------ TF-IDF
def _explode_tokens(batch: pa.Table, text_col: str, doc_col: str) -> pa.Table:
    """(doc, token) pairs via Arrow C kernels: RE2 \\s+ split, flatten
    with list_parent_indices carrying the doc key -- no Python loop."""
    import pyarrow.compute as pc

    lists = pc.split_pattern_regex(batch[text_col], pattern=r"\s+")
    toks = pc.list_flatten(lists)
    parents = pc.list_parent_indices(lists)
    did = batch[doc_col].take(parents)
    t = pa.table({doc_col: did, "token": toks})
    return t.filter(pc.not_equal(t["token"], ""))


def token_doc_frequencies(
    ds, text_col: str = "text", doc_col: str = "doc_id"
):
    """Pass 1 of TF-IDF: (token, document-frequency) over the corpus.
    Per-batch distinct (doc, token) pairs collapse to token counts;
    partials sum exactly because a document never spans batches (one
    row per doc).  Driver combine is VOCAB-bounded, not corpus-bounded
    -- the same justification as the word-count combiner; for an
    unbounded vocab route the partials through
    ``hash_aggregate(distributed_combine=True)`` instead."""
    from ..pipelines.relational import collect_tables

    def partial(batch: pa.Table) -> pa.Table:
        pairs = _explode_tokens(batch, text_col, doc_col).group_by(
            [doc_col, "token"]
        ).aggregate([])
        out = pairs.group_by("token").aggregate([("token", "count")])
        return out.rename_columns(["token", "df"])

    parts = collect_tables(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    )
    if parts is None:
        return pa.table({"token": pa.array([], pa.string()),
                         "df": pa.array([], pa.int64())})
    return (
        parts.group_by("token").aggregate([("df", "sum")])
        .rename_columns(["token", "df"])
    )


class TfIdfScore:
    """Pass 2 of TF-IDF: per-document score sum_t (tf_t * idf_t) with
    tf_t = count(t in doc) / len(doc) and idf_t = ln(n_docs / df_t).
    The idf table (vocab-sized) is the broadcast side -- the canonical
    two-phase pattern: a global-statistics pass feeds a per-row scoring
    pass through the object store, never through a shuffle of the
    corpus.  Docs with zero tokens emit no row (matches the SQL
    formulation).  In-batch joins/groupbys are Arrow C kernels."""

    def __init__(self, idf_table, text_col: str = "text",
                 doc_col: str = "doc_id", ndigits: int = 6):
        from .joins import _resolve

        self.idf = _resolve(idf_table)  # columns: token, idf
        self.text_col = text_col
        self.doc_col = doc_col
        self.ndigits = ndigits

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..pipelines.relational import round_like_sql

        t = _explode_tokens(batch, self.text_col, self.doc_col)
        dc = self.doc_col
        tf = (
            t.group_by([dc, "token"]).aggregate([("token", "count")])
            .rename_columns([dc, "token", "cnt"])
        )
        lens = (
            t.group_by([dc]).aggregate([("token", "count")])
            .rename_columns([dc, "n_toks"])
        )
        j = tf.join(self.idf, keys="token").join(lens, keys=dc)
        score = (
            j["cnt"].to_numpy(zero_copy_only=False)
            / j["n_toks"].to_numpy(zero_copy_only=False)
        ) * j["idf"].to_numpy(zero_copy_only=False)
        per_doc = (
            pa.table({dc: j[dc], "s": pa.array(score)})
            .group_by(dc).aggregate([("s", "sum")])
        )
        return pa.table(
            {
                dc: per_doc[dc],
                "tfidf": round_like_sql(per_doc["s_sum"], self.ndigits),
            }
        )


def ngram_repetition(
    batch: pa.Table,
    text_col: str = "text",
    doc_col: str = "doc_id",
    n: int = 3,
    ndigits: int = 6,
) -> pa.Table:
    """Within-document duplicate n-gram fraction (the Gopher/C4 rep-
    etition quality signal): ``1 - distinct_ngrams / total_ngrams``
    per doc, over whitespace tokens.  Fully vectorized in-batch: one
    explode, shifted-slice equality masks for doc boundaries,
    ``binary_join_element_wise`` to materialize the n-gram strings,
    then two Arrow group_bys.  Docs with fewer than n tokens emit no
    row (matches the SQL formulation).  Per-batch is exact because a
    document never spans batches."""
    import pyarrow.compute as pc

    t = _explode_tokens(batch, text_col, doc_col).combine_chunks()
    m = t.num_rows
    empty = pa.table(
        {doc_col: pa.array([], batch[doc_col].type),
         f"dup{n}": pa.array([], pa.float64())}
    )
    if m < n:
        return empty
    did = t[doc_col].to_numpy(zero_copy_only=False)
    k = m - n + 1
    same = np.ones(k, dtype=bool)
    for j in range(1, n):
        same &= did[j:j + k] == did[:k]
    if not same.any():
        return empty
    toks = t["token"]
    parts = [toks.slice(j, k) for j in range(n)]
    tri = pc.binary_join_element_wise(*parts, " ")
    rows = pa.table(
        {doc_col: t[doc_col].slice(0, k), "g": tri}
    ).filter(pa.array(same))
    uniq = (
        rows.group_by([doc_col, "g"]).aggregate([])
        .group_by(doc_col).aggregate([(doc_col, "count")])
        .rename_columns([doc_col, "uniq"])
    )
    total = (
        rows.group_by(doc_col).aggregate([(doc_col, "count")])
        .rename_columns([doc_col, "total"])
    )
    j = uniq.join(total, keys=doc_col)
    from ..pipelines.relational import round_like_sql

    ratio = 1.0 - (
        j["uniq"].to_numpy(zero_copy_only=False).astype(np.float64)
        / j["total"].to_numpy(zero_copy_only=False).astype(np.float64)
    )
    return pa.table({doc_col: j[doc_col], f"dup{n}": round_like_sql(ratio, ndigits)})


# ------------------------------------------------------- corpus n-grams
def _explode_ngrams(
    batch: pa.Table, n: int, text_col: str, doc_col: str
) -> pa.Table:
    """(doc, gram) rows for every word-level n-gram: Arrow RE2 split,
    flatten, then the slice trick -- n shifted views joined by one
    ``binary_join_element_wise`` C call; a gram is kept only when all
    n tokens share a document (boolean mask, no Python loop)."""
    import pyarrow.compute as pc

    t = _explode_tokens(batch, text_col, doc_col).combine_chunks()
    m = t.num_rows
    empty = pa.table(
        {
            doc_col: pa.array([], batch[doc_col].type),
            "gram": pa.array([], pa.string()),
        }
    )
    if m < n:
        return empty
    did = t[doc_col].to_numpy(zero_copy_only=False)
    k = m - n + 1
    same = np.ones(k, dtype=bool)
    for j in range(1, n):
        same &= did[j:j + k] == did[:k]
    if not same.any():
        return empty
    toks = t["token"]
    gram = pc.binary_join_element_wise(
        *(toks.slice(j, k) for j in range(n)), " "
    )
    return pa.table(
        {doc_col: t[doc_col].slice(0, k), "gram": gram}
    ).filter(pa.array(same))


def ngram_counts(
    ds,
    n: int = 2,
    text_col: str = "text",
    doc_col: str = "doc_id",
    distributed_combine: bool = True,
):
    """Global n-gram language-model counts over the corpus (the
    classic count-based LM / corpus-statistics pass).  Per-batch Arrow
    group_by collapses each batch to its local gram histogram (the
    combiner), so only pre-aggregated partials enter the final
    combine.  The gram vocabulary is corpus-scale at 100 TB, so the
    default routes the combine through the distributed groupby
    shuffle and returns a Dataset; flip ``distributed_combine=False``
    for a driver-side table when the vocabulary is known-small."""
    from ..pipelines.relational import hash_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        g = _explode_ngrams(batch, n, text_col, doc_col)
        out = g.group_by("gram").aggregate([("gram", "count")])
        return out.rename_columns(["gram", "cnt"])

    partials = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=None
    )
    return hash_aggregate(
        partials,
        ["gram"],
        [("cnt", "sum", "n")],
        distributed_combine=distributed_combine,
    )


def shared_ngram_docs(
    ds,
    n: int = 3,
    text_col: str = "text",
    doc_col: str = "doc_id",
    distributed_combine: bool = True,
):
    """Cross-document duplicate-passage detection: for every n-gram,
    the number of DISTINCT documents containing it (grams in >= 2 docs
    are boilerplate / copied-passage candidates -- the corpus-level
    signal behind suffix-array dedup).  Per-batch distinct (doc, gram)
    pairs collapse to per-gram doc counts; partials sum exactly
    because a document never spans batches (one row per doc, the
    token_doc_frequencies invariant).  Returns (gram, nd)."""
    from ..pipelines.relational import hash_aggregate

    def partial(batch: pa.Table) -> pa.Table:
        g = _explode_ngrams(batch, n, text_col, doc_col)
        pairs = g.group_by([doc_col, "gram"]).aggregate([])
        out = pairs.group_by("gram").aggregate([("gram", "count")])
        return out.rename_columns(["gram", "cnt"])

    partials = ds.map_batches(
        partial, batch_format="pyarrow", batch_size=None
    )
    return hash_aggregate(
        partials,
        ["gram"],
        [("cnt", "sum", "nd")],
        distributed_combine=distributed_combine,
    )


# ------------------------------------------------------- PII redaction
#: public-recipe defaults: email, then long digit runs (phone/account
#: numbers).  Email runs FIRST so its digits are not pre-mangled.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("number", r"\d{3,}", "<NUM>"),
]


def pii_redact(
    batch: pa.Table,
    text_col: str = "text",
    patterns: list[tuple[str, str, str]] | None = None,
    out_col: str = "redacted",
) -> pa.Table:
    """Vectorized PII scrubbing (the standard pre-training cleaning
    pass): for each (name, regex, token) pattern, count matches and
    replace them, entirely in Arrow RE2 C kernels
    (``count_substring_regex`` + ``replace_substring_regex``) -- the
    same regex engine DuckDB uses, so redactions are bit-reproducible
    against a SQL oracle.  Patterns apply in order (email before
    digit-runs, so addresses are not pre-mangled).  Appends
    ``out_col`` plus one ``n_<name>`` count column per pattern."""
    import pyarrow.compute as pc

    if patterns is None:
        patterns = PII_PATTERNS
    s = batch[text_col]
    for name, pat, token in patterns:
        cnt = pc.count_substring_regex(s, pattern=pat)
        batch = batch.append_column(f"n_{name}", cnt.cast(pa.int64()))
        s = pc.replace_substring_regex(s, pattern=pat, replacement=token)
    return batch.append_column(out_col, s)


def pmi_bigrams(
    ds,
    text_col: str = "text",
    doc_col: str = "doc_id",
    min_count: int = 5,
    ndigits: int = 6,
):
    """Collocation mining: pointwise mutual information per bigram,
    PMI = ln( P(w1 w2) / (P(w1) P(w2)) ) with probabilities from the
    corpus unigram/bigram counts -- the classic corpus-statistics pass
    behind phrase detection.  Three-legged plan, all corpus passes
    streaming: (1) unigram counts via the combiner pattern (vocab-
    bounded driver table, the broadcast side); (2) bigram counts
    through the distributed groupby combine, materialized ONCE in the
    object store (the post-shuffle aggregate, never the corpus);
    (3) a per-batch Arrow join of bigrams against the broadcast
    unigram table scores PMI in place.  Returns a Dataset of
    (gram, n, pmi) with n >= min_count."""
    import pyarrow.compute as pc
    import ray

    from ..pipelines.relational import hash_aggregate, round_like_sql

    def upartial(batch: pa.Table) -> pa.Table:
        t = _explode_tokens(batch, text_col, doc_col)
        out = t.group_by("token").aggregate([("token", "count")])
        return out.rename_columns(["token", "c"])

    uni = hash_aggregate(
        ds.map_batches(upartial, batch_format="pyarrow", batch_size=None),
        ["token"],
        [("c", "sum", "c")],
    )
    n_uni = float(
        uni["c"].to_numpy(zero_copy_only=False).astype(np.int64).sum()
    )

    bigrams = ngram_counts(
        ds, n=2, text_col=text_col, doc_col=doc_col,
        distributed_combine=True,
    ).materialize()
    n_big = float(bigrams.sum("n"))
    uref = ray.put(uni)

    def score(batch: pa.Table) -> pa.Table:
        u = ray.get(uref)
        batch = batch.filter(
            pc.greater_equal(batch["n"], pa.scalar(min_count))
        )
        parts = pc.split_pattern(batch["gram"], " ")
        t = pa.table(
            {
                "gram": batch["gram"],
                "n": batch["n"],
                "w1": pc.list_element(parts, 0),
                "w2": pc.list_element(parts, 1),
                "_row": pa.array(np.arange(batch.num_rows, dtype=np.int64)),
            }
        )
        j = (
            t.join(u.rename_columns(["w1", "c1"]), keys="w1")
            .join(u.rename_columns(["w2", "c2"]), keys="w2")
            .sort_by("_row")
        )
        cb = j["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        c1 = j["c1"].to_numpy(zero_copy_only=False).astype(np.float64)
        c2 = j["c2"].to_numpy(zero_copy_only=False).astype(np.float64)
        pmi = np.log((cb / n_big) / ((c1 / n_uni) * (c2 / n_uni)))
        return pa.table(
            {
                "gram": j["gram"],
                "n": j["n"].cast(pa.int64()),
                "pmi": round_like_sql(pmi, ndigits),
            }
        )

    return bigrams.map_batches(score, batch_format="pyarrow", batch_size=None)


def greedy_pack_kernel(
    group: pa.Table,
    budget: int,
    key_col: str = "lang",
    order_col: str = "doc_id",
    tok_col: str = "n_tok",
) -> pa.Table:
    """Greedy sequence packing for ONE key's docs (run inside
    ``groupby(key).map_groups``): docs ordered by ``order_col`` fill
    bins of at most ``budget`` tokens; a doc that would overflow the
    open bin starts a new one (a doc longer than the budget occupies a
    bin alone).  The scan is inherently prefix-dependent -- the one
    order-dependent loop in the packing path, O(group) ints, same cost
    class as the reference-shape session kernel.  At corpus scale
    packing applies per (key, shard) partition independently, which is
    how training pipelines shard packing anyway."""
    idx = pc.sort_indices(group, sort_keys=[(order_col, "ascending")])
    g = group.take(idx)
    toks = g[tok_col].to_numpy(zero_copy_only=False)
    bins = np.empty(len(toks), np.int64)
    b, acc = 0, 0
    for i, t in enumerate(toks):
        t = int(t)
        if acc and acc + t > budget:
            b += 1
            acc = t
        else:
            acc += t
        bins[i] = b
    return pa.table(
        {
            order_col: g[order_col],
            key_col: g[key_col],
            tok_col: g[tok_col],
            "bin_id": pa.array(bins),
        }
    )


def pack_sequences(
    ds,
    budget: int,
    key_col: str = "lang",
    order_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Sequence packing over a document Dataset: count whitespace
    tokens per doc (vectorized map_batches), shuffle by ``key_col``,
    greedy-pack each group in deterministic ``order_col`` order.
    Returns (order_col, key_col, n_tok, bin_id) -- the assignment used
    to build fixed-budget training rows."""

    def count_tokens(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        n = len(texts)
        toks = np.fromiter(
            (len((t or "").split()) for t in texts), np.int64, n
        )
        return pa.table(
            {
                order_col: batch[order_col],
                key_col: batch[key_col],
                "n_tok": pa.array(toks),
            }
        )

    counted = ds.map_batches(count_tokens, batch_format="pyarrow", batch_size=None)
    return counted.groupby(key_col).map_groups(
        lambda g: greedy_pack_kernel(
            g, budget, key_col=key_col, order_col=order_col
        ),
        batch_format="pyarrow",
    )


# -------------------------------------------- benchmark decontamination
def benchmark_ngram_set(
    ds,
    n: int = 5,
    text_col: str = "text",
    doc_col: str = "doc_id",
    pred=None,
):
    """Collect the distinct word n-grams of the BENCHMARK slice of a
    corpus (rows where ``pred(doc_id)`` holds) into one driver-side
    Arrow array, ready to ``ray.put`` as the broadcast side of the
    decontamination scan.  Benchmark/eval suites are small by
    construction -- this is the canonical broadcast-small-side case."""
    from ..pipelines.relational import collect_tables

    def grams(batch: pa.Table) -> pa.Table:
        if pred is not None:
            batch = batch.filter(pred(batch[doc_col]))
        g = _explode_ngrams(batch, n, text_col, doc_col)
        return g.group_by("gram").aggregate([])

    parts = collect_tables(
        ds.map_batches(grams, batch_format="pyarrow", batch_size=None)
    )
    if parts is None:
        return pa.array([], pa.string())
    return parts.group_by("gram").aggregate([])["gram"].combine_chunks()


class ContaminationTag:
    """Benchmark decontamination scan: per document, the number of
    DISTINCT word n-grams shared with a broadcast benchmark gram set
    (docs with n_contam > 0 are candidates for removal before
    training).  Actor-pool stage: the gram set is ``ray.get`` once in
    ``__init__``; ``__call__`` explodes n-grams vectorized and counts
    hits with one ``pc.is_in`` C call.  Benchmark docs themselves are
    excluded from the output when ``exclude_pred`` is given."""

    def __init__(
        self,
        bench_ref,
        n: int = 5,
        text_col: str = "text",
        doc_col: str = "doc_id",
        exclude_pred=None,
    ):
        import ray

        bench = (
            ray.get(bench_ref)
            if isinstance(bench_ref, ray.ObjectRef)
            else bench_ref
        )
        self.bench = bench if isinstance(bench, (pa.Array, pa.ChunkedArray)) else pa.array(list(bench), pa.string())
        self.n = n
        self.text_col = text_col
        self.doc_col = doc_col
        self.exclude_pred = exclude_pred

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if self.exclude_pred is not None:
            batch = batch.filter(self.exclude_pred(batch[self.doc_col]))
        g = _explode_ngrams(batch, self.n, self.text_col, self.doc_col)
        hits = g.filter(pc.is_in(g["gram"], value_set=self.bench))
        per = hits.group_by([self.doc_col, "gram"]).aggregate([])
        per = per.group_by(self.doc_col).aggregate([("gram", "count")])
        hit_ids = per[self.doc_col].to_numpy(zero_copy_only=False)
        hit_n = per["gram_count"].to_numpy(zero_copy_only=False).astype(np.int64)
        ids = batch[self.doc_col].to_numpy(zero_copy_only=False)
        order = np.argsort(hit_ids)
        pos = np.searchsorted(hit_ids[order], ids)
        pos_c = np.clip(pos, 0, max(len(hit_ids) - 1, 0))
        n_contam = np.zeros(len(ids), np.int64)
        if len(hit_ids):
            found = hit_ids[order][pos_c] == ids
            n_contam[found] = hit_n[order][pos_c[found]]
        return pa.table(
            {
                self.doc_col: batch[self.doc_col],
                "n_contam": pa.array(n_contam),
            }
        )


# ------------------------------------------------- fuzzy vocab pairs
def _is_edit1(a: str, b: str) -> bool:
    """Exact test for unit edit distance (one substitution, insertion
    or deletion) -- O(len) two-pointer, no DP table."""
    la, lb = len(a), len(b)
    if la == lb:
        # exactly one substitution
        diff = sum(1 for x, y in zip(a, b) if x != y)
        return diff == 1
    if abs(la - lb) != 1:
        return False
    if la > lb:
        a, b, la, lb = b, a, lb, la
    # a is shorter: b must equal a with one char inserted
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


def edit1_vocab_pairs(
    ds,
    text_col: str = "text",
    min_len: int = 4,
):
    """Fuzzy-vocabulary join: every pair of DISTINCT corpus tokens at
    edit distance exactly 1 (typo/variant detection, the string form
    of near-dedup).  Deletion-neighborhood blocking: each token emits
    itself plus its single-char deletions as bucket keys -- two words
    at distance 1 ALWAYS share a key (delete-the-edit argument), so a
    ``groupby(key)`` shuffle co-locates every true pair; the per-
    bucket kernel verifies candidates with the exact O(len) edit-1
    test and a final distinct pass drops pairs found under several
    keys.  No stage holds more than a bucket; bucket size is bounded
    by the deletion-variant collision count, not the vocab."""
    from ..pipelines.relational import distinct, collect_tables
    import ray.data

    def batch_tokens(b: pa.Table) -> pa.Table:
        b = b.select([text_col]).append_column(
            "_d", pa.array(np.zeros(b.num_rows, np.int64))
        )
        return _explode_tokens(b, text_col, "_d").select(["token"])

    toks = ds.map_batches(batch_tokens, batch_format="pyarrow", batch_size=None)
    vocab_t = distinct(toks, ["token"])
    vocab_t = vocab_t.filter(
        pc.greater_equal(pc.utf8_length(vocab_t["token"]), min_len)
    )

    def variants(batch: pa.Table) -> pa.Table:
        keys, words = [], []
        for w in batch["token"].to_pylist():
            keys.append(w)
            words.append(w)
            for i in range(len(w)):
                keys.append(w[:i] + w[i + 1:])
                words.append(w)
        return pa.table({"k": pa.array(keys), "w": pa.array(words)})

    var_ds = ray.data.from_arrow(vocab_t).map_batches(
        variants, batch_format="pyarrow", batch_size=None
    )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ws = sorted(set(group["w"].to_pylist()))
        a_out, b_out = [], []
        for i in range(len(ws)):
            for j in range(i + 1, len(ws)):
                if _is_edit1(ws[i], ws[j]):
                    a_out.append(ws[i])
                    b_out.append(ws[j])
        return pa.table({"w1": pa.array(a_out, pa.string()),
                         "w2": pa.array(b_out, pa.string())})

    pair_ds = grouped_by_key(var_ds, "k", bucket_pairs)
    return distinct(pair_ds, ["w1", "w2"])


def bigram_lm_logprob(
    ds,
    text_col: str = "text",
    doc_col: str = "doc_id",
    ndigits: int = 6,
    num_partitions: int = 8,
    broadcast_threshold: int = 2_000_000,
):
    """Per-document average bigram log-likelihood under the corpus's
    own bigram LM -- the CCNet-style fluency signal used to filter
    web text for training data.  P(w2|w1) = c2(w1,w2) / c1(w1) with
    c1 summed over bigram-FIRST positions, so each row's conditional
    distribution normalizes exactly.

    Scale plan: (1) bigram counts via the distributed groupby combine
    (corpus-vocabulary sized -- never assumed small); (2) TIERED count
    lookup: when the bigram table is under ``broadcast_threshold``
    rows it broadcasts once via ``ray.put`` and joins per batch in
    Arrow (also sidesteps Ray's join failing on schema-less EMPTY hash
    partitions when rows << partitions); above it, per-doc bigram rows
    stream into a big-big shuffle join on ``gram``; (3) first-token
    totals are token-vocabulary bounded, so they always broadcast;
    (4) per-doc sum/count partials combine through the standard
    aggregate.  Returns a Dataset of (doc_id, n_bigrams, avg_logp)."""
    import pyarrow.compute as pc
    import ray

    from ..pipelines.relational import (
        coerce_empty_blocks, hash_aggregate, round_like_sql,
    )

    gram_schema = pa.schema([("gram", pa.string()), ("n", pa.int64())])
    bigrams = coerce_empty_blocks(
        ngram_counts(
            ds, n=2, text_col=text_col, doc_col=doc_col,
            distributed_combine=True,
        ),
        gram_schema,
    ).materialize()

    # first-token totals: vocab-bounded driver table (the broadcast side)
    def first_tok(batch: pa.Table) -> pa.Table:
        w1 = pc.list_element(pc.split_pattern(batch["gram"], " "), 0)
        t = pa.table({"w1": w1, "n": batch["n"]})
        out = t.group_by("w1").aggregate([("n", "sum")])
        return out.rename_columns(["w1", "c1"])

    c1 = hash_aggregate(
        bigrams.map_batches(first_tok, batch_format="pyarrow", batch_size=None),
        ["w1"],
        [("c1", "sum", "c1")],
    )
    c1_ref = ray.put(c1)

    doc_grams = ds.map_batches(
        lambda b: _explode_ngrams(b, 2, text_col, doc_col),
        batch_format="pyarrow", batch_size=None,
    )
    if bigrams.count() <= broadcast_threshold:
        big_tbl = pa.concat_tables(
            bigrams.iter_batches(batch_format="pyarrow", batch_size=None)
        )
        big_ref = ray.put(big_tbl)

        def lookup(batch: pa.Table) -> pa.Table:
            return batch.join(ray.get(big_ref), keys="gram")

        joined = doc_grams.map_batches(
            lookup, batch_format="pyarrow", batch_size=None
        )
    else:
        joined = doc_grams.join(
            bigrams, join_type="inner", num_partitions=num_partitions,
            on=("gram",),
        )

    def score(batch: pa.Table) -> pa.Table:
        if batch.num_columns == 0 or batch.num_rows == 0:
            # empty join partitions arrive schema-less
            return pa.schema(
                [(doc_col, pa.int64()), ("_s", pa.float64()),
                 ("_c", pa.int64())]
            ).empty_table()
        u = ray.get(c1_ref)
        w1 = pc.list_element(pc.split_pattern(batch["gram"], " "), 0)
        t = pa.table(
            {
                doc_col: batch[doc_col],
                "n2": batch["n"],
                "w1": w1,
            }
        )
        j = t.join(u, keys="w1")
        n2 = j["n2"].to_numpy(zero_copy_only=False).astype(np.float64)
        cc = j["c1"].to_numpy(zero_copy_only=False).astype(np.float64)
        logp = np.log(n2 / cc)
        return pa.table(
            {
                doc_col: j[doc_col],
                "_s": pa.array(logp),
                "_c": pa.array(np.ones(len(logp), np.int64)),
            }
        )

    agg = hash_aggregate(
        joined.map_batches(score, batch_format="pyarrow", batch_size=None),
        [doc_col],
        [("_s", "sum", "_s"), ("_c", "sum", "n_bigrams")],
    )
    s = agg["_s"].to_numpy(zero_copy_only=False)
    c = agg["n_bigrams"].to_numpy(zero_copy_only=False).astype(np.float64)
    return pa.table(
        {
            doc_col: agg[doc_col],
            "n_bigrams": agg["n_bigrams"].cast(pa.int64()),
            "avg_logp": round_like_sql(s / c, ndigits),
        }
    )


def bm25_scores(
    ds,
    query_terms: list[str],
    text_col: str = "text",
    doc_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    ndigits: int = 6,
):
    """Okapi BM25 relevance of every document to a fixed query -- the
    classic retrieval scorer.  One streaming pass explodes each batch
    to (doc, dl, tf_per_term) rows (term list is fixed and small, so
    term frequencies are wide int columns via vectorized ``pc.equal``);
    that narrow per-doc table materializes ONCE in the object store,
    corpus stats (N, avgdl, df_t) come off it via the combiner, and a
    second map scores in place.  idf = ln((N - df + .5)/(df + .5) + 1).

    Returns (doc_id, score) for docs matching any term."""
    import pyarrow.compute as pc

    from ..pipelines.relational import hash_aggregate, round_like_sql

    terms = list(query_terms)

    def tf_row(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(batch[text_col], pattern=r"\s+")
        flat = pc.list_flatten(toks)
        keep = pc.not_equal(flat, "")
        # doc index per token via list parent offsets
        sizes = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        parent = np.repeat(np.arange(len(sizes), dtype=np.int64), sizes)
        flat_np_keep = keep.to_numpy(zero_copy_only=False)
        parent = parent[flat_np_keep]
        flat = flat.filter(keep)
        cols = {
            doc_col: batch[doc_col],
            "dl": pa.array(
                np.bincount(parent, minlength=batch.num_rows).astype(
                    np.int64
                )
            ),
        }
        for i, t in enumerate(terms):
            hit = pc.equal(flat, t).to_numpy(zero_copy_only=False)
            cols[f"tf{i}"] = pa.array(
                np.bincount(
                    parent[hit], minlength=batch.num_rows
                ).astype(np.int64)
            )
        return pa.table(cols)

    perdoc = ds.map_batches(
        tf_row, batch_format="pyarrow", batch_size=None
    ).materialize()

    def stat_partial(batch: pa.Table) -> pa.Table:
        cols = {
            "_k": pa.array(np.zeros(batch.num_rows, np.int64)),
            "n": pa.array(np.ones(batch.num_rows, np.int64)),
            "dl": batch["dl"],
        }
        for i in range(len(terms)):
            cols[f"df{i}"] = pc.cast(
                pc.greater(batch[f"tf{i}"], 0), pa.int64()
            )
        return pa.table(cols)

    stats = hash_aggregate(
        perdoc.map_batches(stat_partial, batch_format="pyarrow", batch_size=None),
        ["_k"],
        [("n", "sum", "n"), ("dl", "sum", "sdl")]
        + [(f"df{i}", "sum", f"df{i}") for i in range(len(terms))],
    )
    n = float(stats["n"][0].as_py())
    avgdl = float(stats["sdl"][0].as_py()) / n
    idf = [
        np.log((n - float(stats[f"df{i}"][0].as_py()) + 0.5)
               / (float(stats[f"df{i}"][0].as_py()) + 0.5) + 1.0)
        for i in range(len(terms))
    ]

    def score(batch: pa.Table) -> pa.Table:
        dl = batch["dl"].to_numpy(zero_copy_only=False).astype(np.float64)
        s = np.zeros(len(dl))
        any_hit = np.zeros(len(dl), dtype=bool)
        for i in range(len(terms)):
            tf = batch[f"tf{i}"].to_numpy(zero_copy_only=False).astype(
                np.float64
            )
            s += idf[i] * tf * (k1 + 1) / (
                tf + k1 * (1 - b + b * dl / avgdl)
            )
            any_hit |= tf > 0
        return pa.table(
            {
                doc_col: batch[doc_col],
                "score": round_like_sql(s, ndigits),
            }
        ).filter(pa.array(any_hit))

    return perdoc.map_batches(score, batch_format="pyarrow", batch_size=None)


# ------------------------------------------------------- passage dedup (C4)
def passage_dedup_stats(
    ds, doc_col: str = "doc_id", text_col: str = "text", chunk: int = 10,
) -> pa.Table:
    """Exact passage-level dedup accounting (the C4/RefinedWeb
    repeated-span rule adapted to unstructured text): each document
    splits into DISJOINT ``chunk``-token spans (tail partial span
    dropped); a span's first occurrence corpus-wide -- lexicographic
    min (doc_id, span_idx) -- is the keeper, every other occurrence
    (including repeats inside one document) counts as duplicated.

    Distribution: spans explode to (hash, doc, idx) rows -- hashes
    only, the corpus body never reshuffles; one groupby(hash) finds
    each span's winner (group-bounded), one combiner aggregation
    yields per-doc totals.

    Returns (doc_id, n_spans, n_dup, dup_ratio) for docs with >= 1
    span; dup_ratio = n_dup / n_spans (single exact int division)."""
    from ..pipelines.relational import hash_aggregate

    def spans(batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch[text_col].to_pylist()]
        ids = batch[doc_col].to_numpy(zero_copy_only=False)
        out_doc, out_idx, out_txt = [], [], []
        for i, t in enumerate(texts):
            toks = t.split()
            n = len(toks) // chunk
            for j in range(n):
                out_doc.append(ids[i])
                out_idx.append(j)
                out_txt.append(" ".join(toks[j * chunk:(j + 1) * chunk]))
        h = H.fnv1a_array(out_txt)
        return pa.table(
            {
                doc_col: pa.array(np.asarray(out_doc, np.int64)),
                "span_idx": pa.array(np.asarray(out_idx, np.int64)),
                "h": pa.array(h.view(np.int64)),
            }
        )

    span_ds = ds.map_batches(spans, batch_format="pyarrow", batch_size=None)

    def mark_winner(group: pa.Table) -> pa.Table:
        d = group[doc_col].to_numpy(zero_copy_only=False)
        s = group["span_idx"].to_numpy(zero_copy_only=False)
        w = np.lexsort((s, d))[0]
        dup = np.ones(len(d), dtype=np.int64)
        dup[w] = 0
        return pa.table(
            {doc_col: group[doc_col], "_one": pa.array(
                np.ones(len(d), np.int64)), "dup": pa.array(dup)}
        )

    per_doc = hash_aggregate(
        grouped_by_key(span_ds, "h", mark_winner),
        [doc_col],
        [("_one", "sum", "n_spans"), ("dup", "sum", "n_dup")],
    )
    n_spans = per_doc["n_spans"].to_numpy(zero_copy_only=False)
    n_dup = per_doc["n_dup"].to_numpy(zero_copy_only=False)
    out = pa.table(
        {
            doc_col: per_doc[doc_col],
            "n_spans": pa.array(n_spans),
            "n_dup": pa.array(n_dup),
            "dup_ratio": pa.array(n_dup / n_spans.astype(np.float64)),
        }
    )
    order = pc.sort_indices(out, sort_keys=[(doc_col, "ascending")])
    return out.take(order)


def lang_temperature_sample(
    docs: "ray.data.Dataset",
    alpha: float = 0.3,
    seed: int = 29,
    lang_col: str = "lang",
    id_col: str = "doc_id",
) -> pa.Table:
    """Temperature-balanced language resampling (the multilingual
    pretraining-corpus rebalance of XLM-R / mT5: sample languages with
    probability proportional to ``share**alpha``, flattening the head
    so low-resource languages keep coverage).

    Two passes, corpus never shuffled:

    1. per-batch combiner counts by language (tiny driver table);
    2. per-language keep rate ``r_l = min(1, (n_l**alpha / S) * N /
       n_l)`` (S = sum of ``n**alpha``; downsampling-only -- languages
       whose target exceeds their count keep everything), ROUNDed to
       6 dp so engine and SQL compare the hash against the identical
       double; a stateless ``map_batches`` keeps rows where
       ``mix32(id, seed) / 2**32 < r_l`` and emits per-batch partial
       (lang, n, sum(id)) rows, combined driver-side.

    Returns the per-language audit table: ``lang, n_before, n_after,
    sum_kept_ids`` (the id checksum pins the exact kept set).  The
    language dimension is bounded (ISO codes), so the driver combine
    is scale-safe; rates broadcast in the task closure (a dict of
    ~100 floats).
    """
    import ray.data  # noqa: F401  (type only)

    from ..functions.rounding import round_like_sql
    from ..functions.sketch import mix32
    from .shuffle import partial_count

    counts = partial_count(docs, [lang_col])
    langs = counts[lang_col].to_pylist()
    n = counts["count"].to_numpy(zero_copy_only=False).astype(np.float64)
    big_n = float(n.sum())
    pw = np.power(n, alpha)
    s = float(pw.sum())
    rate = np.minimum(1.0, pw / s * big_n / n)
    rate = np.asarray(round_like_sql(pa.array(rate), 6))
    rates = dict(zip(langs, rate.tolist()))

    def keep_partials(batch: pa.Table) -> pa.Table:
        lv = batch[lang_col].to_pylist()
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        r = np.fromiter((rates.get(x, 1.0) for x in lv), np.float64, len(lv))
        keep = mix32(ids, seed).astype(np.float64) / 4294967296.0 < r
        t = pa.table(
            {
                lang_col: pa.array(lv, pa.string()),
                "_k": pa.array(keep.astype(np.int64)),
                "_sid": pa.array(np.where(keep, ids, 0)),
            }
        )
        out = t.group_by(lang_col).aggregate([("_k", "sum"), ("_sid", "sum")])
        return out.rename_columns([lang_col, "n_after", "sum_kept_ids"])

    parts = []
    for b in docs.select_columns([id_col, lang_col]).map_batches(
        keep_partials, batch_format="pyarrow", batch_size=None
    ).iter_batches(batch_format="pyarrow", batch_size=None):
        t = b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
        if t.num_rows:
            parts.append(t)
    merged = (
        pa.concat_tables(parts)
        .group_by(lang_col)
        .aggregate([("n_after", "sum"), ("sum_kept_ids", "sum")])
        .rename_columns([lang_col, "n_after", "sum_kept_ids"])
    )
    joined = counts.rename_columns([lang_col, "n_before"]).join(
        merged, keys=lang_col
    )
    return joined.sort_by(lang_col)


def readability_scores(docs, text_col: str = "text", id_col: str = "doc_id"):
    """Flesch reading-ease per document from regex-countable proxies:
    words = ``\\S+`` runs, sentences = ``[.!?]+`` runs (min 1),
    syllables ~ vowel-group runs ``[aeiouyAEIOUY]+``; score =
    ``206.835 - 1.015*(W/S) - 84.6*(V/W)`` -- counts are exact
    integers, the score three float ops in SQL-identical order.
    Stateless vectorized map_batches; module-level compiled regexes."""
    import re as _re

    import pyarrow as pa

    w_re = _re.compile(r"\S+")
    s_re = _re.compile(r"[.!?]+")
    v_re = _re.compile(r"[aeiouyAEIOUY]+")

    from ..functions.rounding import round_like_sql

    def score(batch: pa.Table) -> pa.Table:
        ids, ws, ss, vs, scores = [], [], [], [], []
        for i in range(batch.num_rows):
            t = batch[text_col][i].as_py() or ""
            w = len(w_re.findall(t))
            s = max(len(s_re.findall(t)), 1)
            v = len(v_re.findall(t))
            ids.append(batch[id_col][i].as_py())
            ws.append(w)
            ss.append(s)
            vs.append(v)
            if w == 0:
                scores.append(0.0)
            else:
                scores.append(
                    206.835 - 1.015 * (w / s) - 84.6 * (v / w)
                )
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "n_words": pa.array(ws, pa.int64()),
                "n_sentences": pa.array(ss, pa.int64()),
                "n_vowel_groups": pa.array(vs, pa.int64()),
                "flesch": round_like_sql(scores, 6),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow", batch_size=None)


def phrase_search(
    ds,
    words: list[str],
    text_col: str = "text",
    doc_col: str = "doc_id",
    distributed_combine: bool = False,
):
    """Positional-index exact phrase search (the IR primitive behind
    `"multi word"` queries): per-doc counts of positions where the
    phrase words appear CONSECUTIVELY.

    Shape: the map stage tokenizes with positions (Arrow split +
    flatten; position-in-doc from list offsets, no Python loop) and
    emits only phrase-word hits -- word ``k`` at document position
    ``p`` becomes ``(doc, p - k, 1 << k)``, so a full match makes all
    n bits meet at one anchor.  One distributed ``(doc, anchor)`` sum
    then replaces the classic positional-postings self-join: an
    anchor whose bit-sum is ``2**n - 1`` is a phrase occurrence
    (words are required distinct, so no bit can double-fire).  Only
    phrase tokens ever leave the scan -- at 100 TB the shuffle
    carries the postings of n terms, not the corpus.

    Returns an Arrow table (doc, n_hits) sorted by doc.
    """
    from ..pipelines.relational import hash_aggregate

    n = len(words)
    if n < 2 or len(set(words)) != n:
        raise ValueError("phrase must be >=2 distinct words")
    full = (1 << n) - 1

    def emit(batch: pa.Table) -> pa.Table:
        lists = pc.split_pattern(batch[text_col], pattern=" ")
        lengths = pc.list_value_length(lists).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        total = int(lengths.sum())
        ends = np.cumsum(lengths)
        starts = np.repeat(ends - lengths, lengths)
        pos = np.arange(total, dtype=np.int64) - starts
        toks = pc.list_flatten(lists)
        parents = pc.list_parent_indices(lists)
        did = batch[doc_col].take(parents).to_numpy(zero_copy_only=False)
        out_doc, out_anchor, out_bit = [], [], []
        for k, w in enumerate(words):
            m = pc.equal(toks, w).to_numpy(zero_copy_only=False)
            m = np.asarray(m, dtype=bool)
            anchor = pos[m] - k
            keep = anchor >= 0
            out_doc.append(did[m][keep])
            out_anchor.append(anchor[keep])
            out_bit.append(np.full(int(keep.sum()), 1 << k, np.int64))
        return pa.table(
            {
                doc_col: pa.array(np.concatenate(out_doc)),
                "anchor": pa.array(np.concatenate(out_anchor)),
                "bit": pa.array(np.concatenate(out_bit)),
            }
        )

    hits = hash_aggregate(
        ds.map_batches(emit, batch_format="pyarrow", batch_size=None),
        [doc_col, "anchor"],
        [("bit", "sum", "bits")],
        distributed_combine=distributed_combine,
    )
    if not isinstance(hits, pa.Table):
        def fullmask(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.equal(batch["bits"], full))

        matched = hits.map_batches(
            fullmask, batch_format="pyarrow", batch_size=None
        )
        agg = hash_aggregate(
            matched, [doc_col], [("bits", "count", "n_hits")]
        )
    else:
        matched = hits.filter(pc.equal(hits["bits"], full))
        agg = (
            matched.group_by(doc_col)
            .aggregate([("anchor", "count")])
            .rename_columns([doc_col, "n_hits"])
        )
    return agg.sort_by(doc_col).select([doc_col, "n_hits"])


def _lev(a: str, b: str) -> int:
    """Exact Levenshtein distance (two-row DP; vocab-bounded use)."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def symspell_pairs(
    ds,
    max_dist: int = 2,
    min_len: int = 4,
    text_col: str = "text",
):
    """Fuzzy vocabulary self-join at edit distance <= 2 via the
    SymSpell deletion-blocking scheme: every word emits all deletion
    variants up to depth ``max_dist``; two words within edit distance
    d always share a depth-d deletion variant, so candidate pairs
    fall out of ONE groupby on the variant key -- no all-pairs scan.
    Candidates are then verified with the exact DP.  At 100 TB the
    variant table is vocab x O(len^2) rows, hash-partitioned by
    variant; per-bucket candidate emission is bounded by bucket size
    (same contract as the MinHash-LSH dedup tiers).

    Returns an Arrow table (w1, w2, dist) with w1 < w2,
    1 <= dist <= max_dist, sorted."""
    from ..pipelines.relational import distinct, hash_aggregate

    vocab = distinct(ds, [text_col])

    def variants(batch: pa.Table) -> pa.Table:
        words = [
            w for w in batch[text_col].to_pylist()
            if w is not None and len(w) >= min_len
        ]
        out_v, out_w = [], []
        for w in words:
            seen = {w}
            frontier = {w}
            for _ in range(max_dist):
                nxt = set()
                for v in frontier:
                    for i in range(len(v)):
                        nxt.add(v[:i] + v[i + 1:])
                nxt -= seen
                seen |= nxt
                frontier = nxt
            for v in seen:
                out_v.append(v)
                out_w.append(w)
        return pa.table(
            {"variant": pa.array(out_v), "word": pa.array(out_w)}
        )

    import ray.data

    var_ds = ray.data.from_arrow(variants(vocab))

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ws = sorted(set(group["word"].to_pylist()))
        w1, w2 = [], []
        for i in range(len(ws)):
            for j in range(i + 1, len(ws)):
                w1.append(ws[i])
                w2.append(ws[j])
        return pa.table({"w1": pa.array(w1, pa.string()),
                         "w2": pa.array(w2, pa.string())})

    cand = (
        var_ds.groupby("variant")
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )
    pairs = distinct(cand, ["w1", "w2"])
    a = pairs["w1"].to_pylist()
    b = pairs["w2"].to_pylist()
    keep_w1, keep_w2, dist = [], [], []
    for x, y in zip(a, b):
        d = _lev(x, y)
        if 1 <= d <= max_dist:
            keep_w1.append(x)
            keep_w2.append(y)
            dist.append(d)
    out = pa.table(
        {
            "w1": pa.array(keep_w1, pa.string()),
            "w2": pa.array(keep_w2, pa.string()),
            "dist": pa.array(dist, pa.int64()),
        }
    )
    return out.sort_by([("w1", "ascending"), ("w2", "ascending")])

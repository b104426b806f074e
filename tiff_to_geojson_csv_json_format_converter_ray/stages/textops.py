"""Text-analysis stages over a documents table: language-ID, quality
scoring, token counting, document fingerprinting -- the training-data
operators (all deterministic pure functions from functions/text.py and
functions/hashing.py, applied per batch)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import hashing as H
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

"""Text kernels: HTML extraction, geo-span parsing, lang-ID, quality,
tokenization, fingerprints.

The extraction stage implements the per-row invariant mandated by
BASELINE.json input_hint: for every page row, ``extract_text(html)``
must reproduce the stored ``text`` column byte-identically per url.
All functions are deterministic pure functions of their inputs
(no wall-clock, no RNG), so any partitioning yields identical output.
"""

from __future__ import annotations

import html as _html
import re

import numpy as np

# Compiled once at import; actor-pool stages reuse them per worker.
_P_RE = re.compile(r"<p(?:\s[^>]*)?>(.*?)</p>", re.DOTALL | re.IGNORECASE)
_GEO_RE = re.compile(
    r'<span\s+class="geo">\s*(-?\d+(?:\.\d+)?)\s*,\s*(-?\d+(?:\.\d+)?)\s*</span>',
    re.IGNORECASE,
)
_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")
# BPE-ish pre-tokenizer (GPT-2-style pattern, ASCII classes only --
# environment has no regex module with \p support)
_BPE_RE = re.compile(
    r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-zÀ-ɏऀ-ॿ]+| ?[0-9]+| ?[^\sA-Za-z0-9À-ɏऀ-ॿ]+|\s+"
)

# frozen character classes for quality features (compiled once;
# C-speed scans instead of per-char Python loops)
_PUNCT_RE = re.compile(r"[.,;:!?\"'()\-]")
_DIGIT_RE = re.compile(r"[0-9]")
_UPPER_RE = re.compile(r"[A-ZÀ-ÖØ-Þ]")
_DEVANAGARI_RE = re.compile(r"[ऀ-ॿ]")
_ALPHA_RE = re.compile(r"[^\W\d_]", re.UNICODE)

_STOPWORDS = {
    "en": frozenset(
        "the of and to in a is that for it as with on be are this was at by an".split()
    ),
    "de": frozenset(
        "der die das und ist von zu mit den nicht ein eine auf im des sich".split()
    ),
    "fr": frozenset(
        "le la les de des et un une est dans que pour sur avec ne pas au du".split()
    ),
}


def extract_text(html_bytes: bytes | str) -> str:
    """Deterministic HTML -> text: concatenate the contents of all
    ``<p>`` elements (joined by "\\n"), strip nested tags, unescape
    entities, collapse inner whitespace.  This is the engine's T14
    extractor; byte-identical per url by construction."""
    if isinstance(html_bytes, bytes):
        doc = html_bytes.decode("utf-8", errors="replace")
    else:
        doc = html_bytes
    parts = []
    for m in _P_RE.finditer(doc):
        inner = m.group(1)
        # exact no-op guards: the sub/unescape calls only change the
        # string when their trigger char is present, and the substring
        # checks are far cheaper than the C regex scans they skip
        if "<" in inner:
            inner = _TAG_RE.sub("", inner)
        if "&" in inner:
            inner = _html.unescape(inner)
        # " ".join(split()) == _WS_RE.sub(" ", ...).strip() byte-for-
        # byte (str.split and \s agree on Unicode whitespace; property-
        # checked over all codepoints < 0x3001) and is ~2.3x faster
        parts.append(" ".join(inner.split()))
    return "\n".join(parts)


# --- vectorized batch form of extract_text ---------------------------
# RE2 patterns reproducing _P_RE finditer semantics on the fragments
# of a case-insensitive '</p>' split: within each fragment, content
# runs from the FIRST '<p>'/'<p ...>' opening tag to the fragment end
# (the non-greedy leading .*? anchors the first match position, like
# finditer's scan), and the split guarantees no '</p>' inside.
_P_SPLIT_RE2 = r"(?i)</p>"
_P_OPEN_RE2 = r"(?is)^.*?<p(?:\s[^>]*)?>(?P<c>.*)$"
# every code point str.split() treats as whitespace (CPython
# str.isspace set) -- property-checked against str.split in tests so
# the RE2 collapse is byte-identical to " ".join(s.split())
_UNI_WS = (
    "\t\n\x0b\x0c\r\x1c\x1d\x1e\x1f "
    "\x85\xa0 "
    "           "
    "    　"
)
_WS_RUN_RE2 = "[" + _UNI_WS + "]+"
# detects any string that whitespace collapse/trim would CHANGE: a
# non-space whitespace char, a double space, or a leading/trailing
# space.  Matching is ~10x cheaper than replacing, and real corpora
# leave most paragraphs untouched -- so the replace runs on the dirty
# subset only.
_WS_DIRTY_RE2 = (
    "[" + _UNI_WS.replace(" ", "") + "]|  |^ | $"
)


def extract_text_batch(col) -> "pa.Array":
    """Vectorized :func:`extract_text` over an Arrow string array --
    byte-identical per row (the pages pipeline's invariant check
    compares every output against the stored golden text), with all
    scans in RE2/Arrow C kernels instead of per-row Python.  Entity
    unescape (stdlib, Python) runs only on the fragments that contain
    '&', before whitespace collapse (entities like &nbsp; decode TO
    whitespace)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    lists = pc.split_pattern_regex(col, pattern=_P_SPLIT_RE2)
    flat = pc.list_flatten(lists)
    parents = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
    lens = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
    offsets = np.r_[0, np.cumsum(lens, dtype=np.int64)]
    # a doc's LAST fragment follows its last '</p>': never a paragraph
    not_last = np.ones(len(flat), dtype=bool)
    not_last[offsets[1:] - 1] = False
    # unanchored search == leftmost-first match, same as the anchored
    # (?s)^.*?<p... form but ~1.5x faster
    ext = pc.extract_regex(
        flat, pattern=r"(?is)<p(?:\s[^>]*)?>(?P<c>.*)$"
    )
    c = pc.struct_field(ext, "c")
    valid = pc.is_valid(c).to_numpy(zero_copy_only=False) & not_last
    kept = c.filter(pa.array(valid))
    kept = pc.replace_substring_regex(kept, pattern="<[^>]+>", replacement="")
    amp = pc.match_substring(kept, "&").to_numpy(zero_copy_only=False)
    if amp.any():
        vals = kept.to_pylist()
        for i in np.flatnonzero(amp):
            vals[i] = _html.unescape(vals[i])
        kept = pa.array(vals, pa.string())
    dirty = pc.match_substring_regex(kept, pattern=_WS_DIRTY_RE2)
    if pc.any(dirty).as_py():
        sub = kept.filter(dirty)
        sub = pc.replace_substring_regex(
            sub, pattern=_WS_RUN_RE2, replacement=" "
        )
        sub = pc.utf8_trim(sub, characters=" ")
        kept = pc.replace_with_mask(kept, dirty, sub)
    counts = np.bincount(parents[valid], minlength=n)
    out_off = np.r_[0, np.cumsum(counts, dtype=np.int64)]
    la = pa.ListArray.from_arrays(
        pa.array(out_off, pa.int32()), kept.combine_chunks()
        if isinstance(kept, pa.ChunkedArray) else kept
    )
    return pc.binary_join(la, "\n")


def extract_geo(html_bytes: bytes | str) -> tuple[float, float] | None:
    """Parse the ``<span class="geo">lat,lon</span>`` microformat ->
    (lat, lon) or None (the geocoder input for the pages pipeline)."""
    if isinstance(html_bytes, bytes):
        doc = html_bytes.decode("utf-8", errors="replace")
    else:
        doc = html_bytes
    m = _GEO_RE.search(doc)
    if m is None:
        return None
    return float(m.group(1)), float(m.group(2))


# RE2 form of _GEO_RE for pyarrow.compute.extract_regex (named groups,
# (?i) flag instead of re.IGNORECASE; first-match semantics like search)
_GEO_RE2 = (
    r'(?i)<span\s+class="geo">\s*(?P<glat>-?\d+(?:\.\d+)?)'
    r"\s*,\s*(?P<glon>-?\d+(?:\.\d+)?)\s*</span>"
)


def extract_geo_batch(col) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized :func:`extract_geo` over a string Array/ChunkedArray:
    one C-level RE2 scan for the whole batch (pyarrow.compute
    extract_regex) instead of a Python loop of re.search calls.
    -> (lat, lon, has_geo) with NaN where no span matched."""
    import pyarrow as pa
    import pyarrow.compute as pc

    res = pc.extract_regex(col, pattern=_GEO_RE2)
    lat_s = pc.struct_field(res, "glat")
    lon_s = pc.struct_field(res, "glon")
    has = pc.is_valid(res).to_numpy(zero_copy_only=False).astype(bool)
    lat = pc.cast(lat_s, pa.float64()).to_numpy(zero_copy_only=False)
    lon = pc.cast(lon_s, pa.float64()).to_numpy(zero_copy_only=False)
    lat = np.where(has, lat, np.nan)
    lon = np.where(has, lon, np.nan)
    return lat, lon, has


def whitespace_tokens(text: str) -> list[str]:
    """Whitespace tokenizer -- semantics = str.split() (no empty tokens)."""
    return text.split()


def bpe_ish_tokens(text: str) -> list[str]:
    """GPT-2-style pre-tokenization (public regex pattern); used for
    token counting of training-data budgets."""
    return _BPE_RE.findall(text)


def token_count(text: str, mode: str = "whitespace") -> int:
    if mode == "whitespace":
        return len(text.split())
    if mode == "bpe":
        return len(_BPE_RE.findall(text))
    raise ValueError(f"unknown token mode: {mode}")


def detect_language(text: str) -> str:
    """Deterministic n-gram/stopword language heuristic.

    devanagari-dominant -> 'hi'; else best stopword-hit ratio among
    en/de/fr; 'zz' when nothing matches."""
    if not text:
        return "zz"
    n_dev = len(_DEVANAGARI_RE.findall(text))
    alpha = len(_ALPHA_RE.findall(text))
    if alpha > 0 and n_dev / alpha > 0.3:
        return "hi"
    toks = [t.lower() for t in text.split()]
    if not toks:
        return "zz"
    best_lang, best_hits = "zz", 0
    for lang, sw in _STOPWORDS.items():
        hits = sum(1 for t in toks if t in sw)
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    if best_hits * 20 < len(toks):  # <5% stopwords -> unknown
        return "zz"
    return best_lang


def clean_text(
    text: str,
    min_words_per_line: int = 3,
    require_terminal_punct: bool = True,
    dedupe_lines: bool = True,
) -> str:
    """C4-style line-level cleaning (public recipe: Raffel et al. 2020):
    keep lines with >= ``min_words_per_line`` words and terminal
    punctuation; drop exact duplicate lines within the document.
    Deterministic pure function."""
    seen: set[str] = set()
    out: list[str] = []
    for line in text.split("\n"):
        stripped = line.strip()
        if not stripped:
            continue
        if len(stripped.split()) < min_words_per_line:
            continue
        if require_terminal_punct and stripped[-1] not in ".!?\"'":
            continue
        if dedupe_lines:
            key = stripped.lower()
            if key in seen:
                continue
            seen.add(key)
        out.append(stripped)
    return "\n".join(out)


def quality_features(text: str) -> dict[str, float]:
    """Deterministic quality-scoring features (Gopher/C4-style heuristics,
    public recipes): length, mean word length, punctuation/digit/upper
    ratios, stopword ratio, repetition ratio."""
    n_chars = len(text)
    toks = text.split()
    n_tokens = len(toks)
    if n_chars == 0:
        return {
            "n_chars": 0.0, "n_tokens": 0.0, "mean_word_len": 0.0,
            "punct_ratio": 0.0, "digit_ratio": 0.0, "upper_ratio": 0.0,
            "stopword_ratio": 0.0, "unique_token_ratio": 0.0, "quality": 0.0,
        }
    n_punct = len(_PUNCT_RE.findall(text))
    n_digit = len(_DIGIT_RE.findall(text))
    n_upper = len(_UPPER_RE.findall(text))
    low = [t.lower() for t in toks]
    sw = _STOPWORDS["en"]
    n_sw = sum(1 for t in low if t in sw)
    uniq = len(set(low)) / n_tokens if n_tokens else 0.0
    mwl = (sum(len(t) for t in toks) / n_tokens) if n_tokens else 0.0
    feats = {
        "n_chars": float(n_chars),
        "n_tokens": float(n_tokens),
        "mean_word_len": mwl,
        "punct_ratio": n_punct / n_chars,
        "digit_ratio": n_digit / n_chars,
        "upper_ratio": n_upper / n_chars,
        "stopword_ratio": (n_sw / n_tokens) if n_tokens else 0.0,
        "unique_token_ratio": uniq,
    }
    # simple monotone score in [0, 1]
    score = 1.0
    if n_tokens < 5:
        score *= 0.2
    if mwl < 2.0 or mwl > 12.0:
        score *= 0.5
    score *= 1.0 - min(feats["digit_ratio"] * 2.0, 0.5)
    score *= 0.5 + 0.5 * min(uniq * 1.5, 1.0)
    feats["quality"] = score
    return feats


# ------------------------------------------------------- JSON field probe
def json_probe_int(col, key: str):
    """Vectorized single-field probe of a JSON string column: extracts
    the integer value of top-level ``key`` with one RE2
    ``pc.extract_regex`` pass -- the webtext fast path for metadata
    columns where full JSON parsing per row would dominate the stage
    (probe-then-parse: rows the probe misses can fall back to a real
    parser).  Returns int64 with NULL where the key is absent /
    non-integer."""
    import pyarrow as pa
    import pyarrow.compute as pc

    pat = '"' + key + '"\\s*:\\s*(?P<v>-?[0-9]+)'
    st = pc.extract_regex(col, pattern=pat)
    v = pc.struct_field(st, "v")
    return pc.cast(v, pa.int64())


def json_probe_str(col, key: str):
    """String-valued sibling of :func:`json_probe_int`: extracts
    ``"key": "value"`` (no escape handling -- documented probe
    semantics; escaped strings need the fallback parser)."""
    import pyarrow.compute as pc

    pat = '"' + key + '"\\s*:\\s*"(?P<v>[^"\\\\]*)"'
    st = pc.extract_regex(col, pattern=pat)
    return pc.struct_field(st, "v")

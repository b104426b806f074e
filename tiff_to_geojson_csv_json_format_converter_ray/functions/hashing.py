"""Deterministic hashing kernels for dedup families, pure NumPy.

Implements the standard published constructions (Broder's MinHash,
Charikar's SimHash, Rabin-Karp rolling hashes, winnowing fingerprints)
used by the engine's large-scale dedup operators.  All arithmetic is
mod 2**64 via natural uint64 wraparound, so signatures are bit-stable
across runs, partitions and machines.
"""

from __future__ import annotations

import numpy as np

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)
_ROLL_BASE = np.uint64(1099511628211)


def fnv1a_bytes(data: bytes) -> int:
    """Scalar FNV-1a 64-bit (stable across processes, unlike hash())."""
    h = _FNV_OFFSET
    for b in data:
        h = np.uint64((int(h) ^ b) * int(_FNV_PRIME) & 0xFFFFFFFFFFFFFFFF)
    return int(h)


def fnv1a_array(strings: list[str] | np.ndarray) -> np.ndarray:
    """FNV-1a over each utf-8 string -> uint64 array.

    Vectorized: strings are packed into a padded byte matrix and the
    per-byte FNV recurrence runs over max-length columns (masked), so
    cost scales with max(len) vectorized steps, not total bytes in
    Python.  Bit-identical to :func:`fnv1a_bytes` per string."""
    n = len(strings)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    enc = [s.encode("utf-8") for s in strings]
    lens = np.fromiter((len(b) for b in enc), np.int64, n)
    total = int(lens.sum())
    if total == 0:
        return np.full(n, _FNV_OFFSET, dtype=np.uint64)
    flat = np.frombuffer(b"".join(enc), dtype=np.uint8)
    starts = np.r_[0, np.cumsum(lens)][:-1]
    rows = np.repeat(np.arange(n), lens)
    cols = np.arange(total) - np.repeat(starts, lens)
    maxlen = int(lens.max())
    m = np.zeros((n, maxlen), dtype=np.uint8)
    m[rows, cols] = flat
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(maxlen):
            active = lens > j
            h[active] = (h[active] ^ m[active, j].astype(np.uint64)) * _FNV_PRIME
    return h


def char_shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Vectorized Rabin-Karp rolling hashes of all k-char shingles.

    uint64 polynomial hash with natural wraparound; O(n) via the
    rolling update h' = (h - b0 * B^(k-1)) * B + b_new.
    """
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    n = len(data)
    if n < k:
        if n == 0:
            return np.empty(0, dtype=np.uint64)
        k = n
    with np.errstate(over="ignore"):
        powers = np.empty(k, dtype=np.uint64)
        powers[0] = np.uint64(1)
        for i in range(1, k):
            powers[i] = powers[i - 1] * _ROLL_BASE
        # h_i = sum_j data[i+j] * B^(k-1-j); computed via correlation
        n_sh = n - k + 1
        out = np.zeros(n_sh, dtype=np.uint64)
        for j in range(k):
            out += data[j : j + n_sh] * powers[k - 1 - j]
    return out


def char_shingle_hashes_batch(
    texts: list[str], k: int = 5
) -> tuple[np.ndarray, np.ndarray]:
    """Rolling k-shingle hashes for MANY texts in one vectorized pass:
    texts are concatenated, hashed once, and shingles crossing document
    boundaries are dropped.  Returns (hashes_concat, boundaries) where
    ``boundaries`` has n+1 offsets into ``hashes_concat``.

    Exactly equivalent to calling :func:`char_shingle_hashes` per text
    for texts of length >= k; shorter texts fall back to the per-text
    path (their effective k shrinks)."""
    enc = [t.encode("utf-8") for t in texts]
    lens = np.array([len(b) for b in enc], dtype=np.int64)
    short = lens < k
    blob = b"".join(enc)
    data = np.frombuffer(blob, dtype=np.uint8).astype(np.uint64)
    n = len(data)
    out_parts: list[np.ndarray] = []
    boundaries = np.zeros(len(texts) + 1, dtype=np.int64)
    if n >= k:
        with np.errstate(over="ignore"):
            powers = np.empty(k, dtype=np.uint64)
            powers[0] = np.uint64(1)
            for i in range(1, k):
                powers[i] = powers[i - 1] * _ROLL_BASE
            n_sh = n - k + 1
            all_h = np.zeros(n_sh, dtype=np.uint64)
            for j in range(k):
                all_h += data[j : j + n_sh] * powers[k - 1 - j]
    else:
        all_h = np.zeros(0, dtype=np.uint64)
    starts = np.r_[0, np.cumsum(lens)][:-1]
    for i, (st, ln) in enumerate(zip(starts, lens)):
        if short[i]:
            h = char_shingle_hashes(texts[i], k)
        else:
            h = all_h[st : st + ln - k + 1]
        out_parts.append(h)
        boundaries[i + 1] = boundaries[i] + len(h)
    return (
        np.concatenate(out_parts) if out_parts else np.zeros(0, np.uint64),
        boundaries,
    )


def word_ngram_hashes(tokens: list[str], n: int = 3) -> np.ndarray:
    """Hashes of word n-grams (joined by \\x1f) -> uint64 array."""
    if len(tokens) < n:
        grams = [" ".join(tokens)] if tokens else []
    else:
        grams = ["\x1f".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)]
    return fnv1a_array(grams)


class MinHasher:
    """Broder MinHash with ``num_perm`` universal-hash permutations
    h_j(x) = a_j * x + b_j (mod 2**64); seeded, frozen."""

    def __init__(self, num_perm: int = 64, seed: int = 42):
        rng = np.random.RandomState(seed)
        # odd multipliers for bijectivity mod 2^64
        self.a = (
            rng.randint(1, 2**62, size=num_perm).astype(np.uint64) * np.uint64(2)
            + np.uint64(1)
        )
        self.b = rng.randint(0, 2**62, size=num_perm).astype(np.uint64)
        self.num_perm = num_perm

    def signature(self, hashes: np.ndarray) -> np.ndarray:
        """(m,) uint64 element hashes -> (num_perm,) uint64 signature."""
        if len(hashes) == 0:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        with np.errstate(over="ignore"):
            m = hashes[:, None] * self.a[None, :] + self.b[None, :]
        return m.min(axis=0)

    def signatures_concat(
        self, hashes: np.ndarray, boundaries: np.ndarray, chunk: int = 200_000
    ) -> np.ndarray:
        """Batched signatures: ``hashes`` is the concatenation of all
        docs' element hashes, ``boundaries`` the (n_docs+1,) offsets.
        One (chunked) permute + ``minimum.reduceat`` per doc -- the
        vectorized form of calling :meth:`signature` per doc."""
        n_docs = len(boundaries) - 1
        out = np.full(
            (n_docs, self.num_perm), np.iinfo(np.uint64).max, dtype=np.uint64
        )
        starts = boundaries[:-1]
        ends = boundaries[1:]
        # process docs in groups whose total shingle count <= chunk
        d0 = 0
        while d0 < n_docs:
            d1 = d0
            while d1 < n_docs and ends[d1] - starts[d0] <= chunk:
                d1 += 1
            d1 = max(d1, d0 + 1)
            lo, hi = starts[d0], ends[d1 - 1]
            if hi > lo:
                with np.errstate(over="ignore"):
                    m = hashes[lo:hi, None] * self.a[None, :] + self.b[None, :]
                nonempty = ends[d0:d1] > starts[d0:d1]
                red_at = (starts[d0:d1] - lo)[nonempty]
                if len(red_at):
                    red = np.minimum.reduceat(m, red_at, axis=0)
                    out[np.arange(d0, d1)[nonempty]] = red
            d0 = d1
        return out

    def band_keys_batch(self, sigs: np.ndarray, bands: int) -> np.ndarray:
        """(n, num_perm) signatures -> (n, bands) band keys, vectorized;
        identical values to per-row :meth:`band_keys`."""
        n = sigs.shape[0]
        rows = self.num_perm // bands
        s = sigs[:, : bands * rows].reshape(n, bands, rows)
        with np.errstate(over="ignore"):
            keys = np.full((n, bands), _FNV_OFFSET, dtype=np.uint64)
            for r in range(rows):
                keys = (keys ^ s[:, :, r]) * _FNV_PRIME
        return keys ^ (np.arange(bands, dtype=np.uint64)[None, :] << np.uint64(56))

    def band_keys(self, sig: np.ndarray, bands: int) -> np.ndarray:
        """Split signature into ``bands`` bands; hash each band -> uint64.
        Equal band key => LSH bucket candidate pair."""
        rows = self.num_perm // bands
        sig = sig[: bands * rows].reshape(bands, rows)
        with np.errstate(over="ignore"):
            keys = np.full(bands, _FNV_OFFSET, dtype=np.uint64)
            for r in range(rows):
                keys = (keys ^ sig[:, r]) * _FNV_PRIME
        # mix in the band index so identical bands in different slots differ
        return keys ^ (np.arange(bands, dtype=np.uint64) << np.uint64(56))


def simhash_batch(
    token_hashes: np.ndarray, boundaries: np.ndarray, chunk: int = 200_000
) -> np.ndarray:
    """SimHash for MANY documents: ``token_hashes`` is the concatenation
    of all docs' token hashes, ``boundaries`` the (n_docs+1,) offsets.
    Identical values to calling :func:`simhash` per doc (unit weights).
    Chunked bit-matrix + ``add.reduceat``."""
    n_docs = len(boundaries) - 1
    out = np.zeros(n_docs, dtype=np.uint64)
    starts = boundaries[:-1]
    ends = boundaries[1:]
    d0 = 0
    bit_idx = np.arange(64, dtype=np.uint64)[None, :]
    while d0 < n_docs:
        d1 = d0
        while d1 < n_docs and ends[d1] - starts[d0] <= chunk:
            d1 += 1
        d1 = max(d1, d0 + 1)
        lo, hi = starts[d0], ends[d1 - 1]
        if hi > lo:
            # LSB-first bit expansion via unpackbits (no 64 shifts)
            bits = np.unpackbits(
                token_hashes[lo:hi].view(np.uint8).reshape(-1, 8),
                axis=1, bitorder="little",
            ).astype(np.int32)
            nonempty = ends[d0:d1] > starts[d0:d1]
            red_at = (starts[d0:d1] - lo)[nonempty]
            if len(red_at):
                ones = np.add.reduceat(bits, red_at, axis=0)  # (docs, 64)
                counts = (ends[d0:d1] - starts[d0:d1])[nonempty][:, None]
                # majority of +1/-1 == ones > tokens/2
                words = (2 * ones > counts).astype(np.uint64) << bit_idx
                out[np.arange(d0, d1)[nonempty]] = words.sum(
                    axis=1, dtype=np.uint64
                )
        d0 = d1
    return out


def simhash(token_hashes: np.ndarray, weights: np.ndarray | None = None) -> int:
    """Charikar 64-bit SimHash of a weighted token-hash bag."""
    if len(token_hashes) == 0:
        return 0
    if weights is None:
        weights = np.ones(len(token_hashes))
    bits = (
        (token_hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
        & np.uint64(1)
    ).astype(np.float64)
    acc = ((bits * 2.0 - 1.0) * weights[:, None]).sum(axis=0)
    out = np.uint64(0)
    for i in range(64):
        if acc[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized Hamming distance between uint64 arrays (popcount of
    xor via byte-wise unpackbits -- no per-bit loop)."""
    x = np.bitwise_xor(np.asarray(a, np.uint64), np.asarray(b, np.uint64))
    flat = np.atleast_1d(x).ravel()
    bits = np.unpackbits(flat.view(np.uint8).reshape(len(flat), 8), axis=1)
    out = bits.sum(axis=1).astype(np.int64).reshape(np.shape(x))
    return out if np.ndim(x) else np.int64(out)


def jaccard(hashes_a: np.ndarray, hashes_b: np.ndarray) -> float:
    """Exact Jaccard similarity of two hash sets."""
    sa = np.unique(hashes_a)
    sb = np.unique(hashes_b)
    if len(sa) == 0 and len(sb) == 0:
        return 1.0
    inter = len(np.intersect1d(sa, sb, assume_unique=True))
    return inter / float(len(sa) + len(sb) - inter)


def winnow_fingerprint(text: str, k: int = 8, window: int = 16) -> np.ndarray:
    """Winnowing (Schleimer et al. 2003): min shingle hash per sliding
    window -> compact document fingerprint set."""
    h = char_shingle_hashes(text, k)
    if len(h) == 0:
        return h
    if len(h) <= window:
        return np.unique(h.min(keepdims=True))
    sw = np.lib.stride_tricks.sliding_window_view(h, window)
    return np.unique(sw.min(axis=1))

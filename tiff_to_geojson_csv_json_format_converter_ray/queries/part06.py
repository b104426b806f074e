"""Query implementations, part 06 of 11.

Split from the single-file driver contract (VERDICT r3 item 5);
definitions keep their original order, cross-part names are
imported explicitly, and the thin registry lives in registry.py.

Contains: bartlett_test, partial_corr, calinski_harabasz, davies_bouldin, rrf_fusion, lang_confusion, gopher_rules, badword_filter, cronbach_alpha, conditional_entropy, mean_center_drift, adamic_adar, closeness_seeds, f_function, kpss_stat, ipw_estimate, transfer_entropy, engle_granger, l_moments, isotonic_fit, markov_stationary, permutation_test, pca_power, dtw_distance, trigram_sim_pairs, fiedler_value, tsp_cells, bradley_terry, jenks_breaks, betweenness_seeds, ipf_balance, nb_lang_eval, item_cf_pairs, label_prop_communities, enclosing_circle, densest_subgraph, graph_bridges, delaunay_triangles, knapsack_cells, convex_layers ...
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa

from tiff_to_geojson_csv_json_format_converter_ray.stages.shuffle import (
    grouped_by_key as _grouped_by_key,
)

from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
    round_half_away,
    scaled_int,
)
from .part01 import (  # noqa: F401
    OG_H,
    OG_W,
    _og_tiles_table,
    _read_pq,
)
from .part02 import (  # noqa: F401
    _q_bm25_search,
)
from .part04 import (  # noqa: F401
    _q_ql_retrieval,
)


def _q_bartlett_test(sf_dir: str) -> pa.Table:
    """Bartlett variance-homogeneity test of the hundreds-of-dollars
    price across return flags: per-group (n, s1, s2) exact int64, A2 =
    n*s2 - s1^2 exact, per-group ln / reciprocal terms quantized at
    1e9 / 1e15 so the cross-group sums are exact integers; the final
    statistic is one shared float expression."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        round_like_sql,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_extendedprice"],
    )

    def powers(batch: pa.Table) -> pa.Table:
        k = round_half_away(
            batch["l_extendedprice"].to_numpy(zero_copy_only=False) / 100.0
        ).astype(np.int64)
        return pa.table(
            {
                "flag": batch["l_returnflag"],
                "_n": pa.array(np.ones(len(k), np.int64)),
                "s1": pa.array(k),
                "s2": pa.array(k * k),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(powers, batch_format="pyarrow", batch_size=None),
        ["flag"],
        [(c, "sum", c) for c in ("_n", "s1", "s2")],
    )
    order = np.argsort(agg["flag"].to_numpy(zero_copy_only=False))
    flags, ns, s2s = [], [], []
    sum_ln_q = 0  # sum of ROUND((n_i-1)*ln(s_i^2)*1e9) terms
    sum_inv_q = 0  # sum of ROUND(1e15/(n_i-1)) terms
    sum_a2n_q = 0  # sum of ROUND(a2_i/n_i*1e6) terms (pooled numerator)
    for i in order.tolist():
        n = int(agg["_n"][i].as_py())
        s1 = int(agg["s1"][i].as_py())
        s2 = int(agg["s2"][i].as_py())
        a2 = n * s2 - s1 * s1
        si2 = float(a2) / float(n * (n - 1))
        sum_ln_q += int(
            round_half_away(np.array([(n - 1) * np.log(si2) * 1e9]))[0]
        )
        sum_inv_q += int(round_half_away(np.array([1e15 / (n - 1)]))[0])
        sum_a2n_q += int(
            round_half_away(np.array([float(a2) / float(n) * 1e6]))[0]
        )
        flags.append(agg["flag"][i].as_py())
        ns.append(n)
        s2s.append(si2)
    k = len(flags)
    ntot = int(sum(ns))
    sp2 = float(sum_a2n_q) / 1e6 / float(ntot - k)
    c = 1.0 + (float(sum_inv_q) / 1e15 - 1.0 / float(ntot - k)) / (
        3.0 * float(k - 1)
    )
    stat = (float(ntot - k) * np.log(sp2) - float(sum_ln_q) / 1e9) / c
    return pa.table(
        {
            "flag": pa.array(flags),
            "n": pa.array(ns, pa.int64()),
            "group_var": round_like_sql(s2s, 6),
            "bartlett_stat": round_like_sql([float(stat)] * k, 6),
        }
    )


def _q_partial_corr(sf_dir: str) -> pa.Table:
    """Partial correlation of (value cents, hour-of-day) controlling
    for ISO day-of-week: all ten raw moments exact int64 per block,
    cross products exact arbitrary-precision integers on the driver
    (HUGEINT in SQL), three pairwise correlations and the partial-r
    recombination as shared float expressions."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        round_like_sql,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["ts", "value"]
    )

    def moments(batch: pa.Table) -> pa.Table:
        us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        x = scaled_int(batch["value"], 100.0)
        y = us // 3600000000 % 24
        days = us // 86400000000
        z = (days + 3) % 7 + 1
        return pa.table(
            {
                "_g": pa.array(np.zeros(len(x), np.int64)),
                "_n": pa.array(np.ones(len(x), np.int64)),
                "sx": pa.array(x),
                "sy": pa.array(y),
                "sz": pa.array(z),
                "sxx": pa.array(x * x),
                "syy": pa.array(y * y),
                "szz": pa.array(z * z),
                "sxy": pa.array(x * y),
                "sxz": pa.array(x * z),
                "syz": pa.array(y * z),
            }
        )

    cols = ["_n", "sx", "sy", "sz", "sxx", "syy", "szz", "sxy", "sxz", "syz"]
    agg = hash_aggregate(
        ds.map_batches(moments, batch_format="pyarrow", batch_size=None),
        ["_g"],
        [(c, "sum", c) for c in cols],
    )
    m = {c: int(agg[c][0].as_py()) for c in cols}
    n = m["_n"]

    def corr(sa, sb, saa, sbb, sab) -> float:
        num = n * sab - sa * sb
        da = n * saa - sa * sa
        db = n * sbb - sb * sb
        return float(num) / (np.sqrt(float(da)) * np.sqrt(float(db)))

    rxy = corr(m["sx"], m["sy"], m["sxx"], m["syy"], m["sxy"])
    rxz = corr(m["sx"], m["sz"], m["sxx"], m["szz"], m["sxz"])
    ryz = corr(m["sy"], m["sz"], m["syy"], m["szz"], m["syz"])
    pr = (rxy - rxz * ryz) / (
        np.sqrt(1.0 - rxz * rxz) * np.sqrt(1.0 - ryz * ryz)
    )
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "r_xy": round_like_sql([rxy], 6),
            "r_xz": round_like_sql([rxz], 6),
            "r_yz": round_like_sql([ryz], 6),
            "partial_r": round_like_sql([float(pr)], 6),
        }
    )


def _label_tick_sums(sf_dir: str):
    """Shared helper for the cluster-quality indices: per-label count,
    per-dim integer tick sums (1e4 quantization, the
    simplified_silhouette convention) and the per-label sum of squared
    tick norms -- one distributed pass, combiner-shaped."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.ann import (
        list_col_to_matrix,
    )

    ds = _read_pq(os.path.join(sf_dir, "embeddings.parquet"))

    def sums(batch: pa.Table) -> pa.Table:
        m = list_col_to_matrix(batch["embedding"])
        vq = round_half_away(m.astype(np.float64) * 1e4).astype(np.int64)
        lab = batch["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        rows = []
        for l in np.unique(lab).tolist():
            sel = vq[lab == l]
            rows.append(
                (l, int(sel.shape[0]), sel.sum(axis=0), int((sel * sel).sum()))
            )
        return pa.table(
            {
                "label": pa.array([r[0] for r in rows], pa.int64()),
                "n": pa.array([r[1] for r in rows], pa.int64()),
                "csum": pa.array(
                    [r[2].tolist() for r in rows], pa.list_(pa.int64())
                ),
                "t2": pa.array([r[3] for r in rows], pa.int64()),
            }
        )

    parts = collect_tables(
        ds.map_batches(sums, batch_format="pyarrow", batch_size=None)
    )
    lab_n: dict[int, int] = {}
    lab_c: dict[int, np.ndarray] = {}
    lab_t: dict[int, int] = {}
    for i in range(parts.num_rows):
        l = int(parts["label"][i].as_py())
        lab_n[l] = lab_n.get(l, 0) + int(parts["n"][i].as_py())
        c = np.asarray(parts["csum"][i].as_py(), np.int64)
        lab_c[l] = lab_c.get(l, 0) + c
        lab_t[l] = lab_t.get(l, 0) + int(parts["t2"][i].as_py())
    labels = sorted(lab_n)
    nvec = np.array([lab_n[l] for l in labels], np.int64)
    cmat = np.stack([lab_c[l] for l in labels])
    tvec = np.array([lab_t[l] for l in labels], np.int64)
    return ds, labels, nvec, cmat, tvec


def _q_calinski_harabasz(sf_dir: str) -> pa.Table:
    """Calinski-Harabasz variance-ratio index of the embeddings'
    labels: within-scatter A_i = n_i*T_i - |S_i|^2 and between-scatter
    |n*S_i - n_i*S|^2 are exact arbitrary-precision integers (HUGEINT
    in SQL) from the 1e4-tick sums; per-label terms quantized to
    integers so the cross-label sums are exact; one shared float ratio
    at the end."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        round_like_sql,
    )

    _, labels, nvec, cmat, tvec = _label_tick_sums(sf_dir)
    k = len(labels)
    ntot = int(nvec.sum())
    gsum = [int(x) for x in cmat.sum(axis=0).tolist()]
    wq, bq = [], []
    for i in range(k):
        ni = int(nvec[i])
        s = [int(x) for x in cmat[i].tolist()]
        a2 = ni * int(tvec[i]) - sum(x * x for x in s)
        wq.append(int(round_half_away(np.array([float(a2) / float(ni)]))[0]))
        bn = sum(
            (ntot * x - ni * g) ** 2 for x, g in zip(s, gsum)
        )
        bq.append(
            int(
                round_half_away(
                    np.array(
                        [float(bn) / float(ni) / float(ntot * ntot)]
                    )
                )[0]
            )
        )
    sw, sb = sum(wq), sum(bq)
    ch = (float(sb) / float(k - 1)) / (float(sw) / float(ntot - k))
    return pa.table(
        {
            "label": pa.array(labels, pa.int64()),
            "n": pa.array(nvec),
            "within_q": pa.array(wq, pa.int64()),
            "between_q": pa.array(bq, pa.int64()),
            "ch_index": round_like_sql([ch] * k, 6),
        }
    )


def _q_davies_bouldin(sf_dir: str) -> pa.Table:
    """Davies-Bouldin index: per-label mean point-to-centroid distance
    (exact integer quadratics under the sqrt, per-point terms
    quantized at 1e9 -- the silhouette discipline), exact-integer
    centroid separations, R_ij = (s_i+s_j)/d_ij maxed per label, DB =
    mean of 1e9-quantized row maxima."""
    import ray as _ray

    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        round_like_sql,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.ann import (
        list_col_to_matrix,
    )

    ds, labels, nvec, cmat, _ = _label_tick_sums(sf_dir)
    k = len(labels)
    bref = _ray.put((np.array(labels, np.int64), nvec, cmat))

    def scatter(batch: pa.Table) -> pa.Table:
        labs, nv, cm = _ray.get(bref)
        m = list_col_to_matrix(batch["embedding"])
        vq = round_half_away(m.astype(np.float64) * 1e4).astype(np.int64)
        lab = batch["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        lidx = np.searchsorted(labs, lab)
        ni = nv[lidx]
        v2 = (vq * vq).sum(axis=1)
        vc = (vq * cm[lidx]).sum(axis=1)
        c2 = (cm * cm).sum(axis=1)[lidx]
        d2 = ni * ni * v2 - 2 * ni * vc + c2
        d = np.sqrt(d2.astype(np.float64)) / (ni.astype(np.float64) * 1e4)
        return pa.table(
            {
                "label": pa.array(lab),
                "dq": pa.array(
                    round_half_away(d * 1e9).astype(np.int64)
                ),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(scatter, batch_format="pyarrow", batch_size=None),
        ["label"],
        [("dq", "sum", "sq")],
    )
    al = agg["label"].to_numpy(zero_copy_only=False).astype(np.int64)
    asq = agg["sq"].to_numpy(zero_copy_only=False).astype(np.int64)
    sq = np.zeros(k, np.int64)
    sq[np.searchsorted(np.array(labels), al)] = asq
    s = sq.astype(np.float64) / 1e9 / nvec.astype(np.float64)
    # exact integer centroid separations (python ints -- HUGEINT scale)
    rmax = np.full(k, -np.inf)
    for i in range(k):
        ni = int(nvec[i])
        ci = [int(x) for x in cmat[i].tolist()]
        for j in range(k):
            if j == i:
                continue
            nj = int(nvec[j])
            cj = [int(x) for x in cmat[j].tolist()]
            num = sum((nj * a - ni * b) ** 2 for a, b in zip(ci, cj))
            d = np.sqrt(float(num)) / (float(ni * nj) * 1e4)
            r = (s[i] + s[j]) / d
            if r > rmax[i]:
                rmax[i] = r
    dbq = sum(int(round_half_away(np.array([r * 1e9]))[0]) for r in rmax)
    db = float(dbq) / 1e9 / float(k)
    return pa.table(
        {
            "label": pa.array(labels, pa.int64()),
            "n": pa.array(nvec),
            "scatter": round_like_sql(s, 6),
            "r_max": round_like_sql(rmax, 6),
            "db_index": round_like_sql([db] * k, 6),
        }
    )


def _q_rrf_fusion(sf_dir: str) -> pa.Table:
    """Reciprocal-rank fusion (k=60) of the BM25 top-20 and
    query-likelihood top-10 retrieval lists: each list's ranks are
    deterministic (rounded score desc, doc_id), per-list contributions
    ROUND(1e12/(60+rank)) are exact integers -- the standard hybrid-
    retrieval combiner over two already-distributed scorers."""
    b = _q_bm25_search(sf_dir)
    q = _q_ql_retrieval(sf_dir)
    bd = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    bs = b["score"].to_numpy(zero_copy_only=False).astype(np.float64)
    qd = q["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    qs = q["score_q"].to_numpy(zero_copy_only=False).astype(np.int64)
    border = np.lexsort((bd, -bs))
    qorder = np.lexsort((qd, -qs))
    brank = {int(bd[i]): r + 1 for r, i in enumerate(border.tolist())}
    qrank = {int(qd[i]): r + 1 for r, i in enumerate(qorder.tolist())}
    docs = sorted(set(brank) | set(qrank))
    br, qr, rrf = [], [], []
    for d in docs:
        rb = brank.get(d, 0)
        rq = qrank.get(d, 0)
        t = 0
        if rb:
            t += int(round_half_away(np.array([1e12 / (60 + rb)]))[0])
        if rq:
            t += int(round_half_away(np.array([1e12 / (60 + rq)]))[0])
        br.append(rb)
        qr.append(rq)
        rrf.append(t)
    return pa.table(
        {
            "doc_id": pa.array(docs, pa.int64()),
            "bm25_rank": pa.array(br, pa.int64()),
            "ql_rank": pa.array(qr, pa.int64()),
            "rrf_q": pa.array(rrf, pa.int64()),
        }
    )


def _q_lang_confusion(sf_dir: str) -> pa.Table:
    """Confusion matrix of the declared lang column vs the n-gram
    lang-ID heuristic (stages/textops.py::TextAnnotate) -- the
    model-audit counts, grouped distributed."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.textops import (
        TextAnnotate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang"],
    )
    ann = ds.map_batches(
        TextAnnotate(features=("lang",)), batch_format="pyarrow",
        batch_size=None,
    )
    out = hash_aggregate(
        ann.map_batches(
            lambda b: pa.table(
                {
                    "lang": b["lang"],
                    "lang_id": b["lang_id"],
                    "_one": pa.array(np.ones(b.num_rows, np.int64)),
                }
            ),
            batch_format="pyarrow",
            batch_size=None,
        ),
        ["lang", "lang_id"],
        [("_one", "sum", "n")],
    )
    return pa.table(
        {
            "lang": out["lang"],
            "lang_id": out["lang_id"],
            "n": out["n"].cast(pa.int64()),
        }
    )


_GOPHER_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "that")


def _q_gopher_rules(sf_dir: str) -> pa.Table:
    """Gopher-style hard-threshold document filter with a per-source
    audit: R1 token count in [5, 1000], R2 mean word length in [3, 10]
    via cross-multiplied INTEGER comparisons (3*n_tok <= sum_chars <=
    10*n_tok -- no float ratios anywhere), R3 digit ratio < 0.2 as
    5*n_digit < n_chars, R4 at least 2 distinct stopwords.  Output per
    source: docs, per-rule fail counts, kept count -- pure integer
    end-to-end."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["text", "source"],
    )
    sw = set(_GOPHER_STOPWORDS)

    def audit(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        srcs = batch["source"].to_pylist()
        f1 = np.zeros(len(texts), np.int64)
        f2 = np.zeros(len(texts), np.int64)
        f3 = np.zeros(len(texts), np.int64)
        f4 = np.zeros(len(texts), np.int64)
        for i, t in enumerate(texts):
            toks = t.split()
            nt = len(toks)
            schars = sum(len(x) for x in toks)
            nd = sum(c.isdigit() for c in t)
            nsw = len(sw.intersection(x.lower() for x in toks))
            if not (5 <= nt <= 1000):
                f1[i] = 1
            if not (3 * nt <= schars <= 10 * nt):
                f2[i] = 1
            if not (5 * nd < len(t)):
                f3[i] = 1
            if nsw < 2:
                f4[i] = 1
        kept = ((f1 + f2 + f3 + f4) == 0).astype(np.int64)
        return pa.table(
            {
                "source": pa.array(srcs),
                "_one": pa.array(np.ones(len(texts), np.int64)),
                "f1": pa.array(f1),
                "f2": pa.array(f2),
                "f3": pa.array(f3),
                "f4": pa.array(f4),
                "kept": pa.array(kept),
            }
        )

    out = hash_aggregate(
        ds.map_batches(audit, batch_format="pyarrow", batch_size=None),
        ["source"],
        [
            ("_one", "sum", "n_docs"),
            ("f1", "sum", "fail_tokens"),
            ("f2", "sum", "fail_word_len"),
            ("f3", "sum", "fail_digits"),
            ("f4", "sum", "fail_stopwords"),
            ("kept", "sum", "n_kept"),
        ],
    )
    return pa.table({c: out[c].cast(pa.int64()) if c != "source" else out[c]
                     for c in out.column_names})


def _q_badword_filter(sf_dir: str) -> pa.Table:
    """Broadcast term-blocklist audit per source (the wordlist-filter
    shape of C4's badwords pass): docs containing any blocked term,
    plus total blocked-term occurrences -- integer counts only."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    blocklist = ("slow", "vector", "spark")
    bset = set(blocklist)

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["text", "source"],
    )

    def audit(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        srcs = batch["source"].to_pylist()
        flagged = np.zeros(len(texts), np.int64)
        occ = np.zeros(len(texts), np.int64)
        for i, t in enumerate(texts):
            c = sum(1 for x in t.split() if x in bset)
            occ[i] = c
            flagged[i] = 1 if c > 0 else 0
        return pa.table(
            {
                "source": pa.array(srcs),
                "_one": pa.array(np.ones(len(texts), np.int64)),
                "flagged": pa.array(flagged),
                "occ": pa.array(occ),
            }
        )

    out = hash_aggregate(
        ds.map_batches(audit, batch_format="pyarrow", batch_size=None),
        ["source"],
        [
            ("_one", "sum", "n_docs"),
            ("flagged", "sum", "n_flagged"),
            ("occ", "sum", "n_occurrences"),
        ],
    )
    return pa.table({c: out[c].cast(pa.int64()) if c != "source" else out[c]
                     for c in out.column_names})


def _q_cronbach_alpha(sf_dir: str) -> pa.Table:
    """Cronbach's alpha internal-consistency of four integer document
    'items' (token count, char count, distinct tokens, stopword hits):
    per-item and total-score raw moments exact int64, variances as
    exact A = n*s2 - s1^2 integers (the n factors cancel in the
    ratio), alpha = k/(k-1) * (1 - sum(A_i)/A_t) as one shared float
    expression."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        round_like_sql,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    sw = set(_GOPHER_STOPWORDS)
    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    )

    def moments(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        n = len(texts)
        x = np.zeros((n, 4), np.int64)
        for i, t in enumerate(texts):
            toks = t.split()
            x[i, 0] = len(toks)
            x[i, 1] = len(t)
            x[i, 2] = len(set(toks))
            x[i, 3] = sum(1 for w in toks if w.lower() in sw)
        tot = x.sum(axis=1)
        cols = {"_g": pa.array(np.zeros(n, np.int64)),
                "_n": pa.array(np.ones(n, np.int64))}
        for j in range(4):
            cols[f"s{j}"] = pa.array(x[:, j])
            cols[f"q{j}"] = pa.array(x[:, j] * x[:, j])
        cols["st"] = pa.array(tot)
        cols["qt"] = pa.array(tot * tot)
        return pa.table(cols)

    names = (
        ["_n"]
        + [f"s{j}" for j in range(4)]
        + [f"q{j}" for j in range(4)]
        + ["st", "qt"]
    )
    agg = hash_aggregate(
        ds.map_batches(moments, batch_format="pyarrow", batch_size=None),
        ["_g"],
        [(c, "sum", c) for c in names],
    )
    m = {c: int(agg[c][0].as_py()) for c in names}
    n = m["_n"]
    a_items = sum(
        n * m[f"q{j}"] - m[f"s{j}"] * m[f"s{j}"] for j in range(4)
    )
    a_tot = n * m["qt"] - m["st"] * m["st"]
    alpha = (4.0 / 3.0) * (1.0 - float(a_items) / float(a_tot))
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "k_items": pa.array([4], pa.int64()),
            "sum_item_var_q": pa.array([a_items], pa.int64()),
            "total_var_q": pa.array([a_tot], pa.int64()),
            "alpha": round_like_sql([alpha], 6),
        }
    )


def _q_conditional_entropy(sf_dir: str) -> pa.Table:
    """Conditional entropy H(lang | source) in nats: per-(source,
    lang) counts exact, per-cell terms (n_sl/N)*ln(n_s/n_sl)
    quantized at 1e12 for an exact cross-cell sum -- the information
    leakage of source onto language."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        round_like_sql,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["lang", "source"],
    )
    agg = hash_aggregate(
        ds.map_batches(
            lambda b: pa.table(
                {
                    "source": b["source"],
                    "lang": b["lang"],
                    "_one": pa.array(np.ones(b.num_rows, np.int64)),
                }
            ),
            batch_format="pyarrow",
            batch_size=None,
        ),
        ["source", "lang"],
        [("_one", "sum", "n")],
    )
    src = np.asarray(agg["source"].to_numpy(zero_copy_only=False))
    nv = agg["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    ntot = int(nv.sum())
    ns = {s: int(nv[src == s].sum()) for s in np.unique(src)}
    qsum = 0
    for i in range(len(nv)):
        nsl = int(nv[i])
        nss = ns[str(src[i])]
        term = (float(nsl) / float(ntot)) * np.log(
            float(nss) / float(nsl)
        )
        qsum += int(round_half_away(np.array([term * 1e12]))[0])
    h = float(qsum) / 1e12
    order = np.argsort(src, kind="stable")
    return pa.table(
        {
            "source": pa.array(src[order]),
            "lang": agg["lang"].take(pa.array(order)),
            "n": pa.array(nv[order]),
            "cond_entropy": round_like_sql([h] * len(nv), 6),
        }
    )


def _q_mean_center_drift(sf_dir: str) -> pa.Table:
    """Temporal centrography: monthly mean center of the event fixes
    (exact integer coordinate sums) and the month-over-month drift
    distance -- the cross-month numerator |n1*s2 - n2*s1|^2 is an
    exact arbitrary-precision integer (HUGEINT in SQL), one shared
    sqrt/division at the end."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        round_like_sql,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id", "ts"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        days = (
            batch["ts"].to_numpy(zero_copy_only=False)
            .astype("datetime64[D]")
            .view("int64")
        )
        week = days // 7
        return pa.table(
            {
                "week": pa.array(week),
                "_one": pa.array(np.ones(len(eid), np.int64)),
                "sx": pa.array(eid % 96),
                "sy": pa.array(eid // 96 % 96),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["week"],
        [("_one", "sum", "n"), ("sx", "sum", "sx"), ("sy", "sum", "sy")],
    ).sort_by([("week", "ascending")])
    ym = agg["week"].to_numpy(zero_copy_only=False).astype(np.int64)
    nv = agg["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    sx = agg["sx"].to_numpy(zero_copy_only=False).astype(np.int64)
    sy = agg["sy"].to_numpy(zero_copy_only=False).astype(np.int64)
    cx = [0.01 * float(int(sx[i])) / float(int(nv[i])) for i in range(len(ym))]
    cy = [0.01 * float(int(sy[i])) / float(int(nv[i])) for i in range(len(ym))]
    drift = [np.nan]
    for i in range(1, len(ym)):
        n1, n2 = int(nv[i - 1]), int(nv[i])
        dx = n1 * int(sx[i]) - n2 * int(sx[i - 1])
        dy = n1 * int(sy[i]) - n2 * int(sy[i - 1])
        num = dx * dx + dy * dy
        drift.append(0.01 * np.sqrt(float(num)) / float(n1 * n2))
    return pa.table(
        {
            "week": pa.array(ym),
            "n": pa.array(nv),
            "cx": round_like_sql(cx, 6),
            "cy": round_like_sql(cy, 6),
            "drift": round_like_sql(drift, 6),
        }
    )


def _q_adamic_adar(sf_dir: str) -> pa.Table:
    """Adamic-Adar link prediction over the edit-1 word graph:
    distance-2 non-edge pairs scored by sum over common neighbors of
    1/ln(deg), each term ROUND(1e9/ln(deg)) so the pair score is an
    exact integer sum.  The distributed tier is the deletion-blocked
    edge join (stages/textops.py::edit1_vocab_pairs); the scored pair
    set is vocabulary-bounded."""
    from tiff_to_geojson_csv_json_format_converter_ray.stages.textops import (
        edit1_vocab_pairs,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["source"]
    ).map_batches(
        lambda b: b.rename_columns(["text"]),
        batch_format="pyarrow", batch_size=None,
    )
    pairs = edit1_vocab_pairs(ds, min_len=4)
    adj: dict[str, set[str]] = {}
    for a, b in zip(pairs["w1"].to_pylist(), pairs["w2"].to_pylist()):
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    scores: dict[tuple[str, str], list[int]] = {}
    for v in sorted(adj):
        deg = len(adj[v])
        if deg < 2:
            continue
        term = int(round_half_away(np.array([1e9 / np.log(float(deg))]))[0])
        nb = sorted(adj[v])
        for i in range(len(nb)):
            for j in range(i + 1, len(nb)):
                u, w = nb[i], nb[j]
                if w in adj.get(u, ()):  # already an edge
                    continue
                st = scores.setdefault((u, w), [0, 0])
                st[0] += 1
                st[1] += term
    keys = sorted(scores)
    return pa.table(
        {
            "w1": pa.array([k[0] for k in keys]),
            "w2": pa.array([k[1] for k in keys]),
            "n_common": pa.array([scores[k][0] for k in keys], pa.int64()),
            "aa_q": pa.array([scores[k][1] for k in keys], pa.int64()),
        }
    )


def _q_closeness_seeds(sf_dir: str) -> pa.Table:
    """Closeness centrality of the five smallest vocabulary words over
    the edit-1 word graph: BFS per seed (vocabulary-bounded), c =
    n_reached / sum_hops with exact integer operands -- the seed-set
    variant that stays tractable when the graph is corpus-scale."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        round_like_sql,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.textops import (
        edit1_vocab_pairs,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["source"]
    ).map_batches(
        lambda b: b.rename_columns(["text"]),
        batch_format="pyarrow", batch_size=None,
    )
    pairs = edit1_vocab_pairs(ds, min_len=4)
    adj: dict[str, set[str]] = {}
    vocab: set[str] = set()
    for a, b in zip(pairs["w1"].to_pylist(), pairs["w2"].to_pylist()):
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
        vocab.add(a)
        vocab.add(b)
    # seeds = 5 smallest vocab words INCLUDING isolated ones: the SQL
    # tok CTE ranks the full distinct-source vocabulary
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    voc = hash_aggregate(
        _read_pq(os.path.join(sf_dir, "documents.parquet"), columns=["source"])
        .map_batches(
            lambda b: pa.table(
                {
                    "w": b["source"],
                    "_one": pa.array(np.ones(b.num_rows, np.int64)),
                }
            ),
            batch_format="pyarrow",
            batch_size=None,
        ),
        ["w"],
        [("_one", "sum", "n")],
    )
    all_words = sorted(
        w for w in voc["w"].to_pylist() if len(w) >= 4
    )
    seeds = all_words[:5]
    out_w, out_r, out_s, out_c = [], [], [], []
    for s in seeds:
        dist = {s: 0}
        frontier = [s]
        while frontier:
            nxt = []
            for u in frontier:
                for v in adj.get(u, ()):
                    if v not in dist:
                        dist[v] = dist[u] + 1
                        nxt.append(v)
            frontier = nxt
        reached = len(dist) - 1
        hops = sum(dist.values())
        out_w.append(s)
        out_r.append(reached)
        out_s.append(hops)
        out_c.append(
            float(reached) / float(hops) if hops > 0 else np.nan
        )
    return pa.table(
        {
            "word": pa.array(out_w),
            "n_reached": pa.array(out_r, pa.int64()),
            "sum_hops": pa.array(out_s, pa.int64()),
            "closeness": round_like_sql(out_c, 6),
        }
    )


def _q_f_function(sf_dir: str) -> pa.Table:
    """Empty-space F-function of the event point pattern: squared
    nearest-neighbor distance from each of 100 lattice probes to the
    distinct event cells, exact integer d^2 end-to-end (per-batch
    partial mins, combiner min), CDF counts at integer radii -- the
    spatial-statistics complement of the NN G-function."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    px = np.repeat(np.arange(4, 100, 10), 10).astype(np.int64)
    py = np.tile(np.arange(4, 100, 10), 10).astype(np.int64)

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id"]
    )

    def partial_min(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ix = np.unique(eid % 96 + (eid // 96 % 96) * 96)
        x = ix % 96
        y = ix // 96
        dx = px[:, None] - x[None, :]
        dy = py[:, None] - y[None, :]
        d2 = (dx * dx + dy * dy).min(axis=1)
        return pa.table(
            {
                "probe": pa.array(np.arange(100, dtype=np.int64)),
                "d2": pa.array(d2),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(partial_min, batch_format="pyarrow", batch_size=None),
        ["probe"],
        [("d2", "min", "d2")],
    )
    d2 = agg["d2"].to_numpy(zero_copy_only=False).astype(np.int64)
    ts = [1, 2, 4, 8, 16]
    counts = [int((d2 <= t * t).sum()) for t in ts]
    return pa.table(
        {
            "radius": pa.array(ts, pa.int64()),
            "n_within": pa.array(counts, pa.int64()),
            "n_probes": pa.array([100] * len(ts), pa.int64()),
        }
    )


def _q_kpss_stat(sf_dir: str) -> pa.Table:
    """KPSS level-stationarity statistic (lag-0 long-run variance) on
    the dense daily event-count series: with P_t the prefix sum and S
    the total, the demeaned partial sums scale to exact integers
    n*S_t = n*P_t - t*S, so eta = A / (n^2 * (n*sxx - S^2)) with the
    numerator A = sum_t (n*P_t - t*S)^2 an exact arbitrary-precision
    integer (HUGEINT in SQL) -- one float division at the end.  The
    complement of the dickey_fuller unit-root screen."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(os.path.join(sf_dir, "events.parquet"), columns=["ts"])

    def daily(batch: pa.Table) -> pa.Table:
        d = (
            batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 86_400_000_000
        )
        return pa.table(
            {
                "d": pa.array(d),
                "_one": pa.array(np.ones(len(d), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(daily, batch_format="pyarrow", batch_size=None),
        ["d"],
        [("_one", "sum", "x")],
    )
    dd = agg["d"].to_numpy(zero_copy_only=False).astype(np.int64)
    xx = agg["x"].to_numpy(zero_copy_only=False).astype(np.int64)
    lo, hi = int(dd.min()), int(dd.max())
    series = np.zeros(hi - lo + 1, np.int64)
    series[dd - lo] = xx
    n = len(series)
    S = int(series.sum())
    sxx = int((series * series).sum())
    num = 0
    pt = 0
    for t in range(1, n + 1):  # n is the day count -- tiny
        pt += int(series[t - 1])
        st = n * pt - t * S
        num += st * st
    den = n * n * (n * sxx - S * S)
    return pa.table(
        {
            "n_obs": pa.array([n], pa.int64()),
            "eta": round_like_sql([float(num) / float(den)], 6),
        }
    )


def _q_ipw_estimate(sf_dir: str) -> pa.Table:
    """Inverse-propensity-weighted average treatment effect on event
    value cents: treatment = user_id % 2, stratum = hour-of-day,
    propensity = exact stratum proportion.  Per-stratum integer sums
    (n, n1, sum-cents per arm) make the IPW term a pinned float
    expression per stratum, quantized at 1e6 ticks so the cross-stratum
    sum is an exact integer; strata missing an arm are excluded on both
    sides.  Contrast column: the naive unadjusted difference."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        scaled_int,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "value"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        hod = (
            batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 3_600_000_000
            % 24
        )
        return pa.table(
            {
                "stratum": pa.array(hod),
                "treat": pa.array(uid % 2),
                "_one": pa.array(np.ones(len(uid), np.int64)),
                "y": pa.array(scaled_int(batch["value"], 100.0)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["stratum", "treat"],
        [("_one", "sum", "n"), ("y", "sum", "sy")],
    )
    st = agg["stratum"].to_numpy(zero_copy_only=False).astype(np.int64)
    tr = agg["treat"].to_numpy(zero_copy_only=False).astype(np.int64)
    nv = agg["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    sy = agg["sy"].to_numpy(zero_copy_only=False).astype(np.int64)
    arms: dict[int, dict[int, tuple[int, int]]] = {}
    for i in range(len(st)):
        arms.setdefault(int(st[i]), {})[int(tr[i])] = (int(nv[i]), int(sy[i]))
    term_q = 0
    n_tot = n1_tot = n0_tot = 0
    sy1_tot = sy0_tot = 0
    for s in sorted(arms):
        a = arms[s]
        if 0 not in a or 1 not in a:
            continue
        (n1, s1), (n0, s0) = a[1], a[0]
        ns = n1 + n0
        term = float(ns * s1) / float(n1) - float(ns * s0) / float(n0)
        term_q += int(round_half_away(np.array([term * 1e6]))[0])
        n_tot += ns
        n1_tot += n1
        n0_tot += n0
        sy1_tot += s1
        sy0_tot += s0
    ate = float(term_q) / 1e6 / float(n_tot)
    naive = float(sy1_tot) / float(n1_tot) - float(sy0_tot) / float(n0_tot)
    return pa.table(
        {
            "n_treat": pa.array([n1_tot], pa.int64()),
            "n_control": pa.array([n0_tot], pa.int64()),
            "ate_ipw": round_like_sql([ate], 6),
            "diff_naive": round_like_sql([naive], 6),
        }
    )


def _q_transfer_entropy(sf_dir: str) -> pa.Table:
    """Transfer entropy (bits) between the hourly click and purchase
    count series, both directions: series binarized against their
    exact integer mean (n*x_t > sum compare -- no float threshold),
    lag-1 triples (dst_{t+1}, dst_t, src_t) counted, and each
    plug-in log2 term quantized at 1e9 ticks so the weighted sum is an
    exact integer; one float division per direction at the end.  The
    directed counterpart of the lagged cross-correlation operator."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["ts", "event_type"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        h = (
            batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 3_600_000_000
        )
        m = (et == "click") | (et == "purchase")
        return pa.table(
            {
                "h": pa.array(h[m]),
                "is_x": pa.array((et[m] == "click").astype(np.int64)),
                "_one": pa.array(np.ones(int(m.sum()), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["h", "is_x"],
        [("_one", "sum", "c")],
    )
    hv = agg["h"].to_numpy(zero_copy_only=False).astype(np.int64)
    ix = agg["is_x"].to_numpy(zero_copy_only=False).astype(np.int64)
    cv = agg["c"].to_numpy(zero_copy_only=False).astype(np.int64)
    lo, hi = int(hv.min()), int(hv.max())
    n = hi - lo + 1
    x = np.zeros(n, np.int64)
    y = np.zeros(n, np.int64)
    x[hv[ix == 1] - lo] = cv[ix == 1]
    y[hv[ix == 0] - lo] = cv[ix == 0]
    xb = (n * x > int(x.sum())).astype(np.int64)
    yb = (n * y > int(y.sum())).astype(np.int64)

    def te_q(src: np.ndarray, dst: np.ndarray) -> tuple[int, int]:
        from collections import Counter

        a = dst[1:].tolist()
        b = dst[:-1].tolist()
        c = src[:-1].tolist()
        nt = len(a)
        c3 = Counter(zip(a, b, c))
        cab = Counter(zip(a, b))
        cbc = Counter(zip(b, c))
        cb = Counter(b)
        tq = 0
        for (ai, bi, ci), n3 in sorted(c3.items()):
            ratio = float(n3 * cb[bi]) / float(cbc[(bi, ci)] * cab[(ai, bi)])
            tq += n3 * int(
                round_half_away(np.array([1e9 * np.log2(ratio)]))[0]
            )
        return nt, tq

    nt, q_xy = te_q(xb, yb)
    _, q_yx = te_q(yb, xb)
    return pa.table(
        {
            "n_trans": pa.array([nt], pa.int64()),
            "te_xy": round_like_sql([float(q_xy) / 1e9 / float(nt)], 6),
            "te_yx": round_like_sql([float(q_yx) / 1e9 / float(nt)], 6),
        }
    )


def _q_engle_granger(sf_dir: str) -> pa.Table:
    """Engle-Granger two-step cointegration screen between the daily
    order count and daily revenue-cents series: stage-1 OLS from exact
    integer moments, residuals quantized at 1e4 ticks (pinned float
    expression, then an exact integer series), stage-2 Dickey-Fuller
    regression on the quantized residuals entirely in arbitrary-
    precision integers (HUGEINT in SQL) with the same pinned t-stat
    chain as the dickey_fuller operator."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        scaled_int,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderdate", "o_totalprice"],
    )

    def daily(batch: pa.Table) -> pa.Table:
        d = (
            batch["o_orderdate"].cast(pa.int64())
            .to_numpy(zero_copy_only=False)
            // 86_400_000_000
        )
        return pa.table(
            {
                "d": pa.array(d),
                "_one": pa.array(np.ones(len(d), np.int64)),
                "y": pa.array(scaled_int(batch["o_totalprice"], 100.0)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(daily, batch_format="pyarrow", batch_size=None),
        ["d"],
        [("_one", "sum", "x"), ("y", "sum", "y")],
    )
    dd = agg["d"].to_numpy(zero_copy_only=False).astype(np.int64)
    lo, hi = int(dd.min()), int(dd.max())
    n = hi - lo + 1
    xs = np.zeros(n, np.int64)
    ys = np.zeros(n, np.int64)
    xs[dd - lo] = agg["x"].to_numpy(zero_copy_only=False).astype(np.int64)
    ys[dd - lo] = agg["y"].to_numpy(zero_copy_only=False).astype(np.int64)
    sx = int(xs.sum())
    sy = int(ys.sum())
    sxx = int((xs * xs).sum())
    sxy = sum(int(a) * int(b) for a, b in zip(xs.tolist(), ys.tolist()))
    b = float(n * sxy - sx * sy) / float(n * sxx - sx * sx)
    a = (float(sy) - b * float(sx)) / float(n)
    resid = round_half_away(
        (ys.astype(np.float64) - a - b * xs.astype(np.float64)) * 1e4
    )
    r = [int(v) for v in resid.tolist()]
    rlag = r[:-1]
    dr = [r[i + 1] - r[i] for i in range(n - 1)]
    n2 = n - 1
    s1 = sum(rlag)
    s2 = sum(dr)
    s11 = sum(v * v for v in rlag)
    s12 = sum(u * v for u, v in zip(rlag, dr))
    s22 = sum(v * v for v in dr)
    b2 = float(n2 * s12 - s1 * s2) / float(n2 * s11 - s1 * s1)
    a2 = (float(s2) - b2 * float(s1)) / float(n2)
    sse = float(s22) - a2 * float(s2) - b2 * float(s12)
    se = np.sqrt(
        sse / float(n2 - 2)
        / (float(s11) - float(s1) * float(s1) / float(n2))
    )
    return pa.table(
        {
            "n_obs": pa.array([n], pa.int64()),
            "beta_coint": round_like_sql([b], 6),
            "adf_t": round_like_sql([b2 / se], 6),
        }
    )


def _q_l_moments(sf_dir: str) -> pa.Table:
    """Sample L-moments (l1, l2) and L-moment ratios (L-skew t3,
    L-kurt t4) of the event value cents: the order-statistic weighted
    sums S_k = sum_i C(i-1,k) x_(i) collapse per distinct value by the
    hockey-stick identity (C(hi,k+1) - C(lo,k+1) over each run), so
    the distributed tier is a value-cardinality-bounded aggregate and
    every numerator/denominator is an exact arbitrary-precision
    integer; float division only at the final l/tau expressions."""
    import math

    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        scaled_int,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(os.path.join(sf_dir, "events.parquet"), columns=["value"])

    def prep(batch: pa.Table) -> pa.Table:
        x = scaled_int(batch["value"], 100.0)
        return pa.table(
            {
                "x": pa.array(x),
                "_one": pa.array(np.ones(len(x), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["x"],
        [("_one", "sum", "c")],
    ).sort_by([("x", "ascending")])
    xv = agg["x"].to_numpy(zero_copy_only=False).astype(np.int64)
    cv = agg["c"].to_numpy(zero_copy_only=False).astype(np.int64)
    s = [0, 0, 0, 0]  # S_k = sum_i C(i-1, k) * x_(i), k = 0..3
    cum = 0
    for x, c in zip(xv.tolist(), cv.tolist()):
        hi = cum + c
        for k in range(4):
            s[k] += x * (math.comb(hi, k + 1) - math.comb(cum, k + 1))
        cum = hi
    n = cum
    num2 = 2 * s[1] - (n - 1) * s[0]
    den2 = n * (n - 1)
    num3 = 12 * s[2] - 6 * (n - 2) * s[1] + (n - 1) * (n - 2) * s[0]
    den3 = n * (n - 1) * (n - 2)
    num4 = (
        120 * s[3]
        - 60 * (n - 3) * s[2]
        + 12 * (n - 2) * (n - 3) * s[1]
        - (n - 1) * (n - 2) * (n - 3) * s[0]
    )
    den4 = n * (n - 1) * (n - 2) * (n - 3)
    l2 = float(num2) / float(den2)
    return pa.table(
        {
            "n_obs": pa.array([n], pa.int64()),
            "l1": round_like_sql([float(s[0]) / float(n)], 6),
            "l2": round_like_sql([l2], 6),
            "tau3": round_like_sql([float(num3) / float(den3) / l2], 6),
            "tau4": round_like_sql([float(num4) / float(den4) / l2], 6),
        }
    )


def _q_isotonic_fit(sf_dir: str) -> pa.Table:
    """Isotonic (non-decreasing) regression of the daily event revenue
    cents on time via the exact minimax characterization fit_t =
    max_{a<=t} min_{b>=t} avg(y[a..b]) -- every block average is one
    pinned integer-over-integer double division, so PAVA's sequential
    pooling is replaced by an order-free O(n^2) reduction both sides
    compute identically (n = day count)."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        scaled_int,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["ts", "value"]
    )

    def daily(batch: pa.Table) -> pa.Table:
        d = (
            batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 86_400_000_000
        )
        return pa.table(
            {
                "d": pa.array(d),
                "y": pa.array(scaled_int(batch["value"], 100.0)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(daily, batch_format="pyarrow", batch_size=None),
        ["d"],
        [("y", "sum", "y")],
    )
    dd = agg["d"].to_numpy(zero_copy_only=False).astype(np.int64)
    lo, hi = int(dd.min()), int(dd.max())
    n = hi - lo + 1
    ys = np.zeros(n, np.int64)
    ys[dd - lo] = agg["y"].to_numpy(zero_copy_only=False).astype(np.int64)
    cp = np.cumsum(ys)
    # avg[a, b] = (cp[b] - cp[a] + y[a]) / (b - a + 1), a <= b
    num = cp[None, :] - cp[:, None] + ys[:, None]
    length = np.arange(n)[None, :] - np.arange(n)[:, None] + 1
    avg = num.astype(np.float64) / length.astype(np.float64)
    avg[length < 1] = np.inf  # mask a > b
    # suffix-min over b >= t for each a, then max over a <= t
    smin = np.minimum.accumulate(avg[:, ::-1], axis=1)[:, ::-1]
    fit = np.array(
        [float(np.max(smin[: t + 1, t])) for t in range(n)], np.float64
    )
    return pa.table(
        {
            "t": pa.array(np.arange(n, dtype=np.int64)),
            "y": pa.array(ys),
            "fit": round_like_sql(fit, 6),
        }
    )


_MARKOV_STATES = ["click", "error", "purchase", "signup", "view"]


def _q_markov_stationary(sf_dir: str) -> pa.Table:
    """Stationary distribution of the per-user event-type Markov chain
    via the Markov-chain tree theorem: pi_i proportional to r_i * A_i
    where r_i is the integer out-count of state i and A_i the i-th
    principal minor of the self-loop-free count Laplacian -- 4x4
    integer determinants, so the whole computation is exact
    arbitrary-precision integers (HUGEINT in SQL) with one float
    division per state at the end.  No power iteration, no float
    accumulation order."""
    from itertools import permutations

    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        markov_transitions, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_id", "event_type"],
    )
    out = markov_transitions(ds, "user_id", "event_type", ["ts", "event_id"])
    sidx = {s: i for i, s in enumerate(_MARKOV_STATES)}
    c = [[0] * 5 for _ in range(5)]
    for s, d, n in zip(
        out["src"].to_pylist(), out["dst"].to_pylist(), out["n"].to_pylist()
    ):
        c[sidx[s]][sidx[d]] = int(n)
    r = [sum(c[j]) for j in range(5)]  # row sums incl. self-loops
    # Laplacian of the self-loop-free graph: m[j][j] = sum_{k!=j} c_jk
    m = [
        [
            (r[j] - c[j][j]) if j == k else -c[j][k]
            for k in range(5)
        ]
        for j in range(5)
    ]

    def minor_det(i: int) -> int:
        idx = [j for j in range(5) if j != i]
        tot = 0
        for perm in permutations(range(4)):
            inv = sum(
                1
                for a in range(4)
                for b in range(a + 1, 4)
                if perm[a] > perm[b]
            )
            prod = 1
            for a in range(4):
                prod *= m[idx[a]][idx[perm[a]]]
            tot += -prod if inv % 2 else prod
        return tot

    s_i = [r[i] * minor_det(i) for i in range(5)]
    tot = sum(s_i)
    return pa.table(
        {
            "state": pa.array(_MARKOV_STATES),
            "n_out": pa.array(r, pa.int64()),
            "pi": round_like_sql(
                [float(v) / float(tot) for v in s_i], 6
            ),
        }
    )


def _q_permutation_test(sf_dir: str) -> pa.Table:
    """Two-sample permutation test on event value cents (treatment =
    user_id % 2): 200 deterministic label permutations via the
    bit-reproducible mix32 hash of event_id, per-permutation integer
    sums (a (perm, n1, s1) combiner aggregate -- the corpus streams
    once), mean-difference statistics as pinned double chains, and the
    add-one permutation p-value."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        scaled_int,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.functions.sketch import (
        mix32,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    n_perms = 200
    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "user_id", "value"],
    )

    def partials(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = scaled_int(batch["value"], 100.0)
        rows_p = []
        rows_n1 = []
        rows_s1 = []
        # perm -1 = the observed labeling (user_id % 2)
        lab = uid % 2
        rows_p.append(-1)
        rows_n1.append(int(lab.sum()))
        rows_s1.append(int((lab * y).sum()))
        for p in range(n_perms):
            plab = mix32(eid, p) % 2
            rows_p.append(p)
            rows_n1.append(int(plab.sum()))
            rows_s1.append(int((plab * y).sum()))
        rows_p.append(-2)  # totals row
        rows_n1.append(len(eid))
        rows_s1.append(int(y.sum()))
        return pa.table(
            {
                "p": pa.array(rows_p, pa.int64()),
                "n1": pa.array(rows_n1, pa.int64()),
                "s1": pa.array(rows_s1, pa.int64()),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(partials, batch_format="pyarrow", batch_size=None),
        ["p"],
        [("n1", "sum", "n1"), ("s1", "sum", "s1")],
    )
    pv = agg["p"].to_numpy(zero_copy_only=False).astype(np.int64)
    n1v = agg["n1"].to_numpy(zero_copy_only=False).astype(np.int64)
    s1v = agg["s1"].to_numpy(zero_copy_only=False).astype(np.int64)
    by = {int(p): (int(a), int(b)) for p, a, b in zip(pv, n1v, s1v)}
    n, s = by[-2]

    def tstat(n1: int, s1: int) -> float:
        return float(s1) / float(n1) - float(s - s1) / float(n - n1)

    t_obs = tstat(*by[-1])
    n_extreme = sum(
        1
        for p in range(n_perms)
        if abs(tstat(*by[p])) >= abs(t_obs)
    )
    return pa.table(
        {
            "n_perms": pa.array([n_perms], pa.int64()),
            "t_obs": round_like_sql([t_obs], 6),
            "n_extreme": pa.array([n_extreme], pa.int64()),
            "p_value": round_like_sql(
                [(1.0 + float(n_extreme)) / 201.0], 6
            ),
        }
    )


_PCA_ITERS = 40
_PCA_SCALE = 1_000_000


def _q_pca_power(sf_dir: str) -> pa.Table:
    """Top principal eigenpair of the embedding covariance by FULLY
    INTEGER power iteration: values quantized at 1e4 ticks, the
    64x64 scatter matrix C = n*Sxy - Sx*Sy built from distributed
    int64 partial matmuls, then 40 iterations of w = C.v with
    max-abs renormalization to 1e6 ticks via sign-split truncating
    division (identical in Python and DuckDB //) -- every step is
    exact arbitrary-precision integer arithmetic, so both sides
    produce bit-identical vectors regardless of convergence; the
    Rayleigh quotient is one float chain at the end."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.ann import (
        list_col_to_matrix,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["embedding"]
    )

    def partials(batch: pa.Table) -> pa.Table:
        m = list_col_to_matrix(batch["embedding"]).astype(np.float64)
        vq = round_half_away(m * 1e4).astype(np.int64)
        d = vq.shape[1]
        spp = vq.T @ vq  # d x d int64 partial scatter
        sv = vq.sum(axis=0)
        keys = np.concatenate(
            [np.arange(d * d, dtype=np.int64), d * d + np.arange(d), [d * d + d]]
        )
        vals = np.concatenate([spp.ravel(), sv, [np.int64(vq.shape[0])]])
        return pa.table({"k": pa.array(keys), "v": pa.array(vals)})

    agg = hash_aggregate(
        ds.map_batches(partials, batch_format="pyarrow", batch_size=None),
        ["k"],
        [("v", "sum", "v")],
    )
    kv = dict(
        zip(
            agg["k"].to_numpy(zero_copy_only=False).tolist(),
            agg["v"].to_numpy(zero_copy_only=False).tolist(),
        )
    )
    d = 64
    n = int(kv[d * d + d])
    sv = [int(kv[d * d + i]) for i in range(d)]
    c = [
        [n * int(kv[i * d + j]) - sv[i] * sv[j] for j in range(d)]
        for i in range(d)
    ]
    v = [_PCA_SCALE] * d
    for _ in range(_PCA_ITERS):
        w = [sum(c[i][j] * v[j] for j in range(d)) for i in range(d)]
        mx = max(abs(x) for x in w)
        v = [
            -((-x * _PCA_SCALE) // mx) if x < 0 else (x * _PCA_SCALE) // mx
            for x in w
        ]
    num = sum(v[i] * c[i][j] * v[j] for i in range(d) for j in range(d))
    den = sum(x * x for x in v)
    eig = (
        float(num) / float(den)
        / (float(n) * float(n) * 1e8)
    )
    return pa.table(
        {
            "dim": pa.array(np.arange(1, d + 1, dtype=np.int64)),
            "vq": pa.array(v, pa.int64()),
            "eigval": round_like_sql([eig] * d, 6),
        }
    )


def _q_dtw_distance(sf_dir: str) -> pa.Table:
    """Dynamic-time-warping distance between the hour-of-day count
    profiles of click vs view events: |a_i - b_j| integer costs and
    the classic 24x24 DP, so the whole alignment is exact integer
    arithmetic end-to-end.  The SQL mirror unrolls the DP by
    anti-diagonal (47 generated CTE levels) -- same recurrence, no
    float anywhere."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["ts", "event_type"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        hod = (
            batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 3_600_000_000
            % 24
        )
        m = (et == "click") | (et == "view")
        return pa.table(
            {
                "hod": pa.array(hod[m]),
                "is_a": pa.array((et[m] == "click").astype(np.int64)),
                "_one": pa.array(np.ones(int(m.sum()), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["hod", "is_a"],
        [("_one", "sum", "c")],
    )
    a = np.zeros(24, np.int64)
    b = np.zeros(24, np.int64)
    for h, isa, c in zip(
        agg["hod"].to_pylist(), agg["is_a"].to_pylist(), agg["c"].to_pylist()
    ):
        (a if isa else b)[int(h)] = int(c)
    dp = [[0] * 24 for _ in range(24)]
    for i in range(24):
        for j in range(24):
            cost = abs(int(a[i]) - int(b[j]))
            if i == 0 and j == 0:
                prev = 0
            elif i == 0:
                prev = dp[0][j - 1]
            elif j == 0:
                prev = dp[i - 1][0]
            else:
                prev = min(dp[i - 1][j], dp[i][j - 1], dp[i - 1][j - 1])
            dp[i][j] = cost + prev
    return pa.table(
        {
            "n_a": pa.array([int(a.sum())], pa.int64()),
            "n_b": pa.array([int(b.sum())], pa.int64()),
            "dtw": pa.array([dp[23][23]], pa.int64()),
        }
    )


def _q_trigram_sim_pairs(sf_dir: str) -> pa.Table:
    """Trigram-cosine string-similarity join over the distinct corpus
    vocabulary (tokens of length >= 4): per-word trigram count
    vectors, candidate pairs blocked by shared trigram through the
    bucketed groupby shuffle (partial dot products per bucket, summed
    by a combiner aggregate -- no all-pairs stage), and the exact
    integer acceptance predicate 25*dot^2 >= |u|^2*|v|^2
    (cosine >= 0.2) so no float enters the filter."""
    import pyarrow.compute as pc
    import ray.data as rd

    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        distinct, hash_aggregate, round_like_sql,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.shuffle import (
        grouped_by_key,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.textops import (
        _explode_tokens,
    )

    ds = _read_pq(os.path.join(sf_dir, "documents.parquet"), columns=["text"])

    def batch_tokens(batch: pa.Table) -> pa.Table:
        batch = batch.append_column(
            "_d", pa.array(np.zeros(batch.num_rows, np.int64))
        )
        return _explode_tokens(batch, "text", "_d").select(["token"])

    vocab = distinct(
        ds.map_batches(batch_tokens, batch_format="pyarrow", batch_size=None),
        ["token"],
    )
    vocab = vocab.filter(pc.greater_equal(pc.utf8_length(vocab["token"]), 4))

    def tri_rows(batch: pa.Table) -> pa.Table:
        ws, ts, cs = [], [], []
        for w in batch["token"].to_pylist():
            from collections import Counter

            cnt = Counter(w[i : i + 3] for i in range(len(w) - 2))
            for t, c in cnt.items():
                ws.append(w)
                ts.append(t)
                cs.append(c)
        return pa.table(
            {
                "w": pa.array(ws, pa.string()),
                "tri": pa.array(ts, pa.string()),
                "c": pa.array(cs, pa.int64()),
            }
        )

    tri_ds = rd.from_arrow(vocab).map_batches(
        tri_rows, batch_format="pyarrow", batch_size=None
    )

    def bucket_dots(group: pa.Table) -> pa.Table:
        ws = group["w"].to_pylist()
        cs = group["c"].to_pylist()
        w1o, w2o, d = [], [], []
        order = sorted(range(len(ws)), key=lambda i: ws[i])
        for x in range(len(order)):
            for y in range(x + 1, len(order)):
                i, j = order[x], order[y]
                w1o.append(ws[i])
                w2o.append(ws[j])
                d.append(int(cs[i]) * int(cs[j]))
        return pa.table(
            {
                "w1": pa.array(w1o, pa.string()),
                "w2": pa.array(w2o, pa.string()),
                "dot": pa.array(d, pa.int64()),
            }
        )

    dots = hash_aggregate(
        grouped_by_key(tri_ds, "tri", bucket_dots),
        ["w1", "w2"],
        [("dot", "sum", "dot")],
    )
    norms_t = hash_aggregate(
        tri_ds.map_batches(
            lambda b: pa.table(
                {
                    "w": b["w"],
                    "c2": pa.array(
                        (
                            b["c"].to_numpy(zero_copy_only=False) ** 2
                        ).astype(np.int64)
                    ),
                }
            ),
            batch_format="pyarrow",
            batch_size=None,
        ),
        ["w"],
        [("c2", "sum", "n2")],
    )
    nrm = {
        w: int(v)
        for w, v in zip(norms_t["w"].to_pylist(), norms_t["n2"].to_pylist())
    }
    w1o, w2o, dd, sim = [], [], [], []
    for w1, w2, dot in sorted(
        zip(
            dots["w1"].to_pylist(),
            dots["w2"].to_pylist(),
            dots["dot"].to_pylist(),
        )
    ):
        dot = int(dot)
        q = nrm[w1] * nrm[w2]
        if 25 * dot * dot >= q:
            w1o.append(w1)
            w2o.append(w2)
            dd.append(dot)
            sim.append(float(dot) / np.sqrt(float(q)))
    return pa.table(
        {
            "w1": pa.array(w1o, pa.string()),
            "w2": pa.array(w2o, pa.string()),
            "dot": pa.array(dd, pa.int64()),
            "cos_sim": round_like_sql(sim, 6),
        }
    )


_FIEDLER_ITERS = 30


def _q_fiedler_value(sf_dir: str) -> pa.Table:
    """Algebraic connectivity (Fiedler value, second-smallest Laplacian
    eigenvalue) of the edit-1 word graph by FULLY INTEGER power
    iteration on M = cI - L (c = 2*max_deg + 1) with exact deflation:
    each step re-centers n*Mv - sum(Mv) so truncation drift off the
    all-ones eigenspace is removed in integer arithmetic, then
    renormalizes by max-abs with the same sign-split truncating
    division as pca_power.  lambda2 = c - Rayleigh(M); the final
    vector's sign pattern is the spectral bipartition (n_pos).  The
    distributed tier is the deletion-blocked edge join
    (stages/textops.py::edit1_vocab_pairs); iteration state is
    vocabulary-bounded."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.textops import (
        edit1_vocab_pairs,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["source"]
    ).map_batches(
        lambda b: b.rename_columns(["text"]),
        batch_format="pyarrow", batch_size=None,
    )
    pairs = edit1_vocab_pairs(ds, min_len=4)
    # node set = every distinct vocab word (incl. isolated), ranked
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        distinct,
    )

    full = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["source"]
    )
    vt = distinct(full, ["source"])
    vocab = sorted(
        w for w in vt["source"].to_pylist() if len(w) >= 4
    )
    rank = {w: i for i, w in enumerate(vocab)}
    n = len(vocab)
    adj: list[list[int]] = [[] for _ in range(n)]
    n_edges = 0
    for w1, w2 in zip(pairs["w1"].to_pylist(), pairs["w2"].to_pylist()):
        a, b = rank[w1], rank[w2]
        adj[a].append(b)
        adj[b].append(a)
        n_edges += 1
    deg = [len(x) for x in adj]
    c = 2 * max(deg) + 1 if n else 1
    sr = sum(range(n))
    v = [n * r - sr for r in range(n)]
    scale = 1_000_000

    def matvec(vv: list[int]) -> list[int]:
        return [
            (c - deg[i]) * vv[i] + sum(vv[j] for j in adj[i])
            for i in range(n)
        ]

    for _ in range(_FIEDLER_ITERS):
        mv = matvec(v)
        sm = sum(mv)
        t = [n * x - sm for x in mv]
        mx = max(abs(x) for x in t)
        v = [
            -((-x * scale) // mx) if x < 0 else (x * scale) // mx
            for x in t
        ]
    mvf = matvec(v)
    num = sum(a * b for a, b in zip(v, mvf))
    den = sum(x * x for x in v)
    lam2 = float(c) - float(num) / float(den)
    return pa.table(
        {
            "n_nodes": pa.array([n], pa.int64()),
            "n_edges": pa.array([n_edges], pa.int64()),
            "lambda2": round_like_sql([lam2], 6),
            "n_pos": pa.array([sum(1 for x in v if x > 0)], pa.int64()),
        }
    )


def _q_tsp_cells(sf_dir: str) -> pa.Table:
    """Exact Held-Karp TSP over the top-8 event grid cells (by count,
    ties broken by cell id): integer Manhattan distances on the frozen
    96x96 grid, bitmask subset DP -- every state cost is an exact
    integer, the SQL mirror unrolls the DP by subset size (7 generated
    CTE levels over (mask, last) rows).  Reports both the optimal
    cycle (return to the smallest cell) and the optimal open path."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(os.path.join(sf_dir, "events.parquet"), columns=["event_id"])

    def prep(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cell = eid % 96 + (eid // 96 % 96) * 96
        return pa.table(
            {
                "cell": pa.array(cell),
                "_one": pa.array(np.ones(len(eid), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["cell"],
        [("_one", "sum", "n")],
    )
    rows = sorted(
        zip(
            agg["n"].to_pylist(),
            agg["cell"].to_pylist(),
        ),
        key=lambda t: (-int(t[0]), int(t[1])),
    )[:8]
    cells = sorted(int(c) for _, c in rows)  # node 0 = smallest cell
    k = len(cells)
    xs = [c % 96 for c in cells]
    ys = [c // 96 for c in cells]
    d = [
        [abs(xs[i] - xs[j]) + abs(ys[i] - ys[j]) for j in range(k)]
        for i in range(k)
    ]
    inf = 1 << 60
    dp = {(1, 0): 0}
    for mask in range(1, 1 << k):
        if not mask & 1:
            continue
        for last in range(k):
            if not (mask >> last) & 1 or (mask, last) not in dp:
                continue
            base = dp[(mask, last)]
            for nxt in range(1, k):
                if (mask >> nxt) & 1:
                    continue
                key = (mask | (1 << nxt), nxt)
                cand = base + d[last][nxt]
                if cand < dp.get(key, inf):
                    dp[key] = cand
    full = (1 << k) - 1
    cycle = min(dp[(full, j)] + d[j][0] for j in range(k) if (full, j) in dp)
    path = min(dp[(full, j)] for j in range(k) if (full, j) in dp)
    return pa.table(
        {
            "n_cells": pa.array([k], pa.int64()),
            "tsp_cycle": pa.array([cycle], pa.int64()),
            "tsp_path": pa.array([path], pa.int64()),
        }
    )


_BT_ITERS = 20
_BT_SCALE = 1_000_000


def _q_bradley_terry(sf_dir: str) -> pa.Table:
    """Bradley-Terry skill ranking of the five event types from
    pairwise (user, day) count comparisons (type i beats j in a
    context when it has strictly more events): Hunter's MM update
    p_i' = W_i / sum_j n_ij/(p_i+p_j) run as a FULLY INTEGER fixed-
    point iteration -- each reciprocal term, the re-estimate, and the
    sum-normalization are truncating divisions on 1e6-tick integers,
    so 20 unrolled steps are bit-identical in Python and SQL.
    Distributed tier: the (user, day, type) count combiner; the win
    matrix is 5x5."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_type"],
    )
    tmap = {t: i for i, t in enumerate(_MARKOV_STATES)}

    def prep(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        day = (
            batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 86_400_000_000
        )
        et = batch["event_type"].to_pylist()
        ti = np.array([tmap[t] for t in et], np.int64)
        return pa.table(
            {
                "u": pa.array(uid),
                "d": pa.array(day),
                "t": pa.array(ti),
                "_one": pa.array(np.ones(len(uid), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["u", "d", "t"],
        [("_one", "sum", "c")],
    )
    u = agg["u"].to_numpy(zero_copy_only=False).astype(np.int64)
    dday = agg["d"].to_numpy(zero_copy_only=False).astype(np.int64)
    tv = agg["t"].to_numpy(zero_copy_only=False).astype(np.int64)
    cv = agg["c"].to_numpy(zero_copy_only=False).astype(np.int64)
    _, inv = np.unique(
        np.stack([u, dday], axis=1), axis=0, return_inverse=True
    )
    mat = np.zeros((int(inv.max()) + 1, 5), np.int64)
    mat[inv, tv] = cv
    w = [[0] * 5 for _ in range(5)]
    for i in range(5):
        for j in range(5):
            if i != j:
                # both types must occur in the context (inner-join
                # comparison semantics, mirrored in SQL)
                w[i][j] = int(
                    ((mat[:, i] > mat[:, j]) & (mat[:, j] > 0)).sum()
                )
    wins = [sum(w[i]) for i in range(5)]
    nmat = [[w[i][j] + w[j][i] for j in range(5)] for i in range(5)]
    sc = _BT_SCALE
    p = [sc] * 5
    for _ in range(_BT_ITERS):
        praw = []
        for i in range(5):
            denom = sum(
                (nmat[i][j] * sc * sc) // (p[i] + p[j])
                for j in range(5)
                if j != i and nmat[i][j] > 0
            )
            praw.append((wins[i] * sc * sc) // denom if denom else 0)
        tot = sum(praw)
        p = [(x * 5 * sc) // tot for x in praw]
    return pa.table(
        {
            "event_type": pa.array(_MARKOV_STATES),
            "wins": pa.array(wins, pa.int64()),
            "pq": pa.array(p, pa.int64()),
            "skill": round_like_sql([float(x) / 1e6 for x in p], 6),
        }
    )


def _q_jenks_breaks(sf_dir: str) -> pa.Table:
    """Jenks natural-breaks (optimal 1-D 4-class) segmentation of the
    daily event-revenue series -- the classic choropleth classifier.
    Segment SSD numerators N = len*Sum(y^2) - Sum(y)^2 are exact
    integers; costs quantized as N // len (cent^2 resolution) so the
    O(n^2 k) DP and its smallest-boundary argmin reconstruction are
    pure integer arithmetic on both sides."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        scaled_int,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["ts", "value"]
    )

    def daily(batch: pa.Table) -> pa.Table:
        d = (
            batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 86_400_000_000
        )
        return pa.table(
            {
                "d": pa.array(d),
                "y": pa.array(scaled_int(batch["value"], 100.0)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(daily, batch_format="pyarrow", batch_size=None),
        ["d"],
        [("y", "sum", "y")],
    )
    dd = agg["d"].to_numpy(zero_copy_only=False).astype(np.int64)
    lo, hi = int(dd.min()), int(dd.max())
    n = hi - lo + 1
    ys = [0] * n
    for d, y in zip((dd - lo).tolist(), agg["y"].to_pylist()):
        ys[d] = int(y)
    p1 = [0] * (n + 1)
    p2 = [0] * (n + 1)
    for i in range(n):
        p1[i + 1] = p1[i] + ys[i]
        p2[i + 1] = p2[i] + ys[i] * ys[i]

    def cq(a: int, b: int) -> int:
        ln = b - a + 1
        s1 = p1[b + 1] - p1[a]
        s2 = p2[b + 1] - p2[a]
        return (ln * s2 - s1 * s1) // ln

    inf = 1 << 200
    k_classes = 4
    b = [[inf] * n for _ in range(k_classes + 1)]
    for t in range(n):
        b[1][t] = cq(0, t)
    for k in range(2, k_classes + 1):
        for t in range(k - 1, n):
            b[k][t] = min(
                b[k - 1][s] + cq(s + 1, t) for s in range(k - 2, t)
            )
    # reconstruct boundaries (smallest-s argmin at each level)
    ends = [n - 1]
    for k in range(k_classes, 1, -1):
        t = ends[-1]
        best = min(
            b[k - 1][s] + cq(s + 1, t) for s in range(k - 2, t)
        )
        s_star = min(
            s
            for s in range(k - 2, t)
            if b[k - 1][s] + cq(s + 1, t) == best
        )
        ends.append(s_star)
    ends = ends[::-1]  # e1 < e2 < e3 < n-1
    starts = [0] + [e + 1 for e in ends[:-1]]
    return pa.table(
        {
            "class": pa.array(list(range(1, k_classes + 1)), pa.int64()),
            "t_start": pa.array(starts, pa.int64()),
            "t_end": pa.array(ends, pa.int64()),
            "n_days": pa.array(
                [e - s + 1 for s, e in zip(starts, ends)], pa.int64()
            ),
            "cost_q": pa.array(
                [cq(s, e) for s, e in zip(starts, ends)], pa.int64()
            ),
        }
    )


_BETW_LEVELS = 6
_BETW_SCALE = 1_000_000_000


def _q_betweenness_seeds(sf_dir: str) -> pa.Table:
    """Seed-set betweenness (Brandes dependency accumulation from the
    five smallest vocabulary words) over the edit-1 word graph: exact
    integer shortest-path counts sigma via layered BFS (6 unrolled
    levels), and the backward pass delta(v) = sum_w sigma_v*(SC +
    delta_w) // sigma_w with 1e9-tick truncating divisions so the
    per-node accumulation is an exact integer both sides.  The
    distributed tier is the deletion-blocked edge join; per-seed state
    is vocabulary-bounded."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        distinct, round_like_sql,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.textops import (
        edit1_vocab_pairs,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["source"]
    ).map_batches(
        lambda b: b.rename_columns(["text"]),
        batch_format="pyarrow", batch_size=None,
    )
    pairs = edit1_vocab_pairs(ds, min_len=4)
    full = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["source"]
    )
    vt = distinct(full, ["source"])
    vocab = sorted(w for w in vt["source"].to_pylist() if len(w) >= 4)
    rank = {w: i for i, w in enumerate(vocab)}
    n = len(vocab)
    adj: list[list[int]] = [[] for _ in range(n)]
    for w1, w2 in zip(pairs["w1"].to_pylist(), pairs["w2"].to_pylist()):
        a, b = rank[w1], rank[w2]
        adj[a].append(b)
        adj[b].append(a)
    sc = _BETW_SCALE
    bc = [0] * n
    for s in range(min(5, n)):
        dist = {s: 0}
        sigma = {s: 1}
        levels: list[list[int]] = [[s]]
        for lvl in range(1, _BETW_LEVELS + 1):
            nxt: dict[int, int] = {}
            for u in levels[lvl - 1]:
                for v in adj[u]:
                    if v in dist and dist[v] < lvl:
                        continue
                    dist[v] = lvl
                    nxt[v] = nxt.get(v, 0) + sigma[u]
            level_nodes = sorted(nxt)
            for v in level_nodes:
                sigma[v] = nxt[v]
            levels.append(level_nodes)
        dqs: dict[int, int] = {v: 0 for v in levels[_BETW_LEVELS]}
        for lvl in range(_BETW_LEVELS - 1, 0, -1):
            for u in levels[lvl]:
                tot = 0
                for w in adj[u]:
                    if dist.get(w) == lvl + 1:
                        tot += (sigma[u] * (sc + dqs.get(w, 0))) // sigma[w]
                dqs[u] = tot
        for v, dq in dqs.items():
            bc[v] += dq
    return pa.table(
        {
            "word": pa.array(vocab, pa.string()),
            "bc_q": pa.array(bc, pa.int64()),
            "bc": round_like_sql([float(x) / 1e9 for x in bc], 6),
        }
    )


_IPF_ITERS = 10
_IPF_SCALE = 1_000_000


def _q_ipf_balance(sf_dir: str) -> pa.Table:
    """Iterative proportional fitting (RAS matrix balancing): the
    (event_type x 4h-bucket) count matrix seeded from the first seven
    days is balanced to the full month's row/column margins.  Cells
    live in 1e6 ticks; each row/column scaling is a truncating integer
    division (X * target * SC // current-sum), 10 unrolled double
    steps, so both sides produce bit-identical matrices.  The same
    combiner aggregate feeds seed and margins in one pass."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["ts", "event_type"]
    )
    tmap = {t: i for i, t in enumerate(_MARKOV_STATES)}

    def prep(batch: pa.Table) -> pa.Table:
        us = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = us // 86_400_000_000
        bkt = us // 3_600_000_000 % 24 // 4
        ti = np.array(
            [tmap[t] for t in batch["event_type"].to_pylist()], np.int64
        )
        return pa.table(
            {
                "i": pa.array(ti),
                "j": pa.array(bkt),
                "d": pa.array(day),
                "_one": pa.array(np.ones(len(ti), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["i", "j", "d"],
        [("_one", "sum", "c")],
    )
    iv = agg["i"].to_numpy(zero_copy_only=False).astype(np.int64)
    jv = agg["j"].to_numpy(zero_copy_only=False).astype(np.int64)
    dv = agg["d"].to_numpy(zero_copy_only=False).astype(np.int64)
    cv = agg["c"].to_numpy(zero_copy_only=False).astype(np.int64)
    d0 = int(dv.min())
    seed = [[0] * 6 for _ in range(5)]
    rt = [0] * 5
    ct = [0] * 6
    for i, j, d, c in zip(
        iv.tolist(), jv.tolist(), dv.tolist(), cv.tolist()
    ):
        if d - d0 < 7:
            seed[i][j] += int(c)
        rt[i] += int(c)
        ct[j] += int(c)
    sc = _IPF_SCALE
    x = [[seed[i][j] * sc for j in range(6)] for i in range(5)]
    for _ in range(_IPF_ITERS):
        for i in range(5):
            rs = sum(x[i])
            x[i] = [
                (v * rt[i] * sc) // rs if rs else 0 for v in x[i]
            ]
        for j in range(6):
            cs = sum(x[i][j] for i in range(5))
            for i in range(5):
                x[i][j] = (x[i][j] * ct[j] * sc) // cs if cs else 0
    ii, jj, xq = [], [], []
    for i in range(5):
        for j in range(6):
            ii.append(_MARKOV_STATES[i])
            jj.append(j)
            xq.append(x[i][j])
    return pa.table(
        {
            "event_type": pa.array(ii, pa.string()),
            "bucket": pa.array(jj, pa.int64()),
            "x_q": pa.array(xq, pa.int64()),
            "x": round_like_sql([float(v) / 1e6 for v in xq], 6),
        }
    )


def _q_nb_lang_eval(sf_dir: str) -> pa.Table:
    """Multinomial naive-Bayes language classifier trained on per-lang
    letter counts (a-z, Laplace +1) and evaluated on the same corpus:
    log-probabilities quantized at 1e9 ticks so each document's score
    is an exact integer sum; argmax with smallest-lang tie-break;
    output is the actual-vs-predicted confusion.  Two distributed
    passes: a (lang, letter) count combiner, then a scoring pass with
    the 5x26 model broadcast per batch."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang"],
    )

    def letter_counts(text: str) -> np.ndarray:
        b = np.frombuffer(text.encode(), np.uint8).astype(np.int64)
        b = b[(b >= 97) & (b <= 122)] - 97
        return np.bincount(b, minlength=26)

    def train_partial(batch: pa.Table) -> pa.Table:
        langs, cs, ns = [], [], []
        acc: dict[str, np.ndarray] = {}
        nd: dict[str, int] = {}
        for text, lang in zip(
            batch["text"].to_pylist(), batch["lang"].to_pylist()
        ):
            acc[lang] = acc.get(lang, np.zeros(26, np.int64)) + letter_counts(
                text
            )
            nd[lang] = nd.get(lang, 0) + 1
        for lang, vec in acc.items():
            for c in range(26):
                langs.append(lang)
                cs.append(c)
                ns.append(int(vec[c]))
            langs.append(lang)
            cs.append(-1)  # doc-count row
            ns.append(nd[lang])
        return pa.table(
            {
                "lang": pa.array(langs, pa.string()),
                "c": pa.array(cs, pa.int64()),
                "n": pa.array(ns, pa.int64()),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(train_partial, batch_format="pyarrow", batch_size=None),
        ["lang", "c"],
        [("n", "sum", "n")],
    )
    counts: dict[str, np.ndarray] = {}
    ndocs: dict[str, int] = {}
    for lang, c, nn in zip(
        agg["lang"].to_pylist(), agg["c"].to_pylist(), agg["n"].to_pylist()
    ):
        if int(c) == -1:
            ndocs[lang] = int(nn)
        else:
            counts.setdefault(lang, np.zeros(26, np.int64))[int(c)] = int(nn)
    langs = sorted(ndocs)
    n_total = sum(ndocs.values())
    cond = {}
    pri = {}
    for lang in langs:
        vec = counts.get(lang, np.zeros(26, np.int64))
        tot = int(vec.sum())
        cond[lang] = np.array(
            [
                int(
                    round_half_away(
                        np.array(
                            [1e9 * np.log(float(int(v) + 1) / float(tot + 26))]
                        )
                    )[0]
                )
                for v in vec
            ],
            np.int64,
        )
        pri[lang] = int(
            round_half_away(
                np.array([1e9 * np.log(float(ndocs[lang]) / float(n_total))])
            )[0]
        )

    def score_partial(batch: pa.Table) -> pa.Table:
        out: dict[tuple[str, str], int] = {}
        for text, lang in zip(
            batch["text"].to_pylist(), batch["lang"].to_pylist()
        ):
            vec = letter_counts(text)
            best_lang = None
            best = None
            for lg in langs:
                s = pri[lg] + int(np.dot(vec, cond[lg]))
                if best is None or s > best:
                    best, best_lang = s, lg
            key = (lang, best_lang)
            out[key] = out.get(key, 0) + 1
        ks = sorted(out)
        return pa.table(
            {
                "actual": pa.array([k[0] for k in ks], pa.string()),
                "predicted": pa.array([k[1] for k in ks], pa.string()),
                "n": pa.array([out[k] for k in ks], pa.int64()),
            }
        )

    conf = hash_aggregate(
        ds.map_batches(score_partial, batch_format="pyarrow", batch_size=None),
        ["actual", "predicted"],
        [("n", "sum", "n_docs")],
    )
    return conf.sort_by([("actual", "ascending"), ("predicted", "ascending")])


def _q_item_cf_pairs(sf_dir: str) -> pa.Table:
    """Item-item collaborative filtering over the user x cell visit
    matrix: distinct (user, cell) visits, per-user co-visit pair
    partials through the bucketed groupby shuffle (the classic
    recsys co-occurrence fan-out -- bounded per user, never
    all-pairs over items), combiner-summed dots, and the top-20
    pairs by (co-visitors DESC, cell ids) with the pinned cosine."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.shuffle import (
        grouped_by_key,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "event_id"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "u": batch["user_id"],
                "cell": pa.array(eid % 96 + (eid // 96 % 96) * 96),
                "_one": pa.array(np.ones(len(eid), np.int64)),
            }
        )

    uc = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["u", "cell"],
        [("_one", "sum", "_n")],
    )
    import ray.data as rd

    uc_ds = rd.from_arrow(uc.select(["u", "cell"]))

    def user_pairs(group: pa.Table) -> pa.Table:
        cells = sorted(group["cell"].to_pylist())
        c1, c2 = [], []
        for i in range(len(cells)):
            for j in range(i + 1, len(cells)):
                c1.append(cells[i])
                c2.append(cells[j])
        return pa.table(
            {
                "c1": pa.array(c1, pa.int64()),
                "c2": pa.array(c2, pa.int64()),
                "_one": pa.array(np.ones(len(c1), np.int64)),
            }
        )

    dots = hash_aggregate(
        grouped_by_key(uc_ds, "u", user_pairs),
        ["c1", "c2"],
        [("_one", "sum", "dot")],
    )
    nv = {}
    nt = hash_aggregate(
        uc_ds.map_batches(
            lambda b: pa.table(
                {
                    "cell": b["cell"],
                    "_one": pa.array(np.ones(b.num_rows, np.int64)),
                }
            ),
            batch_format="pyarrow",
            batch_size=None,
        ),
        ["cell"],
        [("_one", "sum", "nv")],
    )
    nv = dict(
        zip(nt["cell"].to_pylist(), (int(x) for x in nt["nv"].to_pylist()))
    )
    c1v = dots["c1"].to_numpy(zero_copy_only=False)
    c2v = dots["c2"].to_numpy(zero_copy_only=False)
    dv = dots["dot"].to_numpy(zero_copy_only=False)
    order = np.lexsort((c2v, c1v, -dv))[:20]
    c1o = c1v[order].tolist()
    c2o = c2v[order].tolist()
    do = dv[order].tolist()
    cs = [
        float(int(d)) / np.sqrt(float(nv[a] * nv[b]))
        for a, b, d in zip(c1o, c2o, do)
    ]
    return pa.table(
        {
            "c1": pa.array(c1o, pa.int64()),
            "c2": pa.array(c2o, pa.int64()),
            "dot": pa.array([int(x) for x in do], pa.int64()),
            "cos_sim": round_like_sql(cs, 6),
        }
    )


_LPA_ROUNDS = 10


def _q_label_prop_communities(sf_dir: str) -> pa.Table:
    """Synchronous label-propagation communities on the edit-1 word
    graph: every node starts with its own rank label; each of 10
    rounds replaces it with the most frequent neighbor label
    (smallest label on ties, isolated nodes keep theirs) -- a fully
    deterministic integer process, so 10 unrolled rounds are
    bit-identical in Python and SQL."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        distinct,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.textops import (
        edit1_vocab_pairs,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["source"]
    ).map_batches(
        lambda b: b.rename_columns(["text"]),
        batch_format="pyarrow", batch_size=None,
    )
    pairs = edit1_vocab_pairs(ds, min_len=4)
    full = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["source"]
    )
    vt = distinct(full, ["source"])
    vocab = sorted(w for w in vt["source"].to_pylist() if len(w) >= 4)
    rank = {w: i for i, w in enumerate(vocab)}
    n = len(vocab)
    adj: list[list[int]] = [[] for _ in range(n)]
    for w1, w2 in zip(pairs["w1"].to_pylist(), pairs["w2"].to_pylist()):
        a, b = rank[w1], rank[w2]
        adj[a].append(b)
        adj[b].append(a)
    lab = list(range(n))
    for _ in range(_LPA_ROUNDS):
        new = list(lab)
        for v in range(n):
            if not adj[v]:
                continue
            freq: dict[int, int] = {}
            for u in adj[v]:
                freq[lab[u]] = freq.get(lab[u], 0) + 1
            new[v] = min(
                (l for l in freq), key=lambda l: (-freq[l], l)
            )
        lab = new
    return pa.table(
        {
            "word": pa.array(vocab, pa.string()),
            "community": pa.array(lab, pa.int64()),
        }
    )


def _q_enclosing_circle(sf_dir: str) -> pa.Table:
    """Smallest enclosing circle of the top-20 event cells: brute
    certificate enumeration (every diameter pair and non-collinear
    circumcircle triple) with EXACT integer containment tests --
    |2q-(p1+p2)|^2 <= |p1-p2|^2 for pairs, |dq-u|^2 <= |da-u|^2 for
    triples -- so validity never touches a float; the winning
    candidate is the (float r^2, candidate id) minimum with identical
    pinned doubles on both sides."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(os.path.join(sf_dir, "events.parquet"), columns=["event_id"])

    def prep(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cell = eid % 96 + (eid // 96 % 96) * 96
        return pa.table(
            {
                "cell": pa.array(cell),
                "_one": pa.array(np.ones(len(eid), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["cell"],
        [("_one", "sum", "n")],
    )
    top = sorted(
        zip(agg["n"].to_pylist(), agg["cell"].to_pylist()),
        key=lambda t: (-int(t[0]), int(t[1])),
    )[:20]
    cells = sorted(int(c) for _, c in top)
    pts = [(c % 96, c // 96) for c in cells]
    n = len(pts)
    best = None  # (r2f, i, j, k, num, den, cxf, cyf)
    for i in range(n):
        for j in range(i + 1, n):
            (x1, y1), (x2, y2) = pts[i], pts[j]
            num = (x1 - x2) ** 2 + (y1 - y2) ** 2
            ok = all(
                (2 * qx - x1 - x2) ** 2 + (2 * qy - y1 - y2) ** 2 <= num
                for qx, qy in pts
            )
            if ok:
                cand = (
                    float(num) / 4.0,
                    i, j, -1,
                    float(x1 + x2) / 2.0,
                    float(y1 + y2) / 2.0,
                )
                if best is None or cand < best:
                    best = cand
    for i in range(n):
        for j in range(i + 1, n):
            for k in range(j + 1, n):
                (ax, ay), (bx, by), (cx, cy) = pts[i], pts[j], pts[k]
                d = 2 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
                if d == 0:
                    continue
                a2 = ax * ax + ay * ay
                b2 = bx * bx + by * by
                c2 = cx * cx + cy * cy
                ux = a2 * (by - cy) + b2 * (cy - ay) + c2 * (ay - by)
                uy = a2 * (cx - bx) + b2 * (ax - cx) + c2 * (bx - ax)
                rnum = (d * ax - ux) ** 2 + (d * ay - uy) ** 2
                ok = all(
                    (d * qx - ux) ** 2 + (d * qy - uy) ** 2 <= rnum
                    for qx, qy in pts
                )
                if ok:
                    cand = (
                        float(rnum) / float(d * d),
                        i, j, k,
                        float(ux) / float(d),
                        float(uy) / float(d),
                    )
                    if best is None or cand < best:
                        best = cand
    r2f, _, _, _, cxf, cyf = best
    return pa.table(
        {
            "n_points": pa.array([n], pa.int64()),
            "radius": round_like_sql([np.sqrt(r2f)], 6),
            "cx": round_like_sql([cxf], 6),
            "cy": round_like_sql([cyf], 6),
        }
    )


_PEEL_STEPS = 19


def _q_densest_subgraph(sf_dir: str) -> pa.Table:
    """Greedy-peel densest subgraph (Charikar 1/2-approximation) on
    the edit-1 word graph: repeatedly remove the min-degree node
    (smallest rank on ties) and keep the prefix maximizing
    edges/nodes.  Degrees, removals and edge counts are integers;
    density comparisons happen on pinned doubles whose rationals
    (den <= |V|) cannot collide, so the 19 unrolled peel steps are
    deterministic on both sides."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        distinct, round_like_sql,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.textops import (
        edit1_vocab_pairs,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["source"]
    ).map_batches(
        lambda b: b.rename_columns(["text"]),
        batch_format="pyarrow", batch_size=None,
    )
    pairs = edit1_vocab_pairs(ds, min_len=4)
    full = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["source"]
    )
    vt = distinct(full, ["source"])
    vocab = sorted(w for w in vt["source"].to_pylist() if len(w) >= 4)
    rank = {w: i for i, w in enumerate(vocab)}
    n = len(vocab)
    edges = sorted(
        (min(rank[w1], rank[w2]), max(rank[w1], rank[w2]))
        for w1, w2 in zip(pairs["w1"].to_pylist(), pairs["w2"].to_pylist())
    )
    alive = set(range(n))
    cur_edges = set(edges)
    best = (float(len(cur_edges)) / float(n), 0, n, len(cur_edges))
    for step in range(1, min(_PEEL_STEPS, n - 1) + 1):
        deg: dict[int, int] = {v: 0 for v in alive}
        for a, b in cur_edges:
            deg[a] += 1
            deg[b] += 1
        victim = min(alive, key=lambda v: (deg[v], v))
        alive.discard(victim)
        cur_edges = {
            (a, b) for a, b in cur_edges if a != victim and b != victim
        }
        dens = float(len(cur_edges)) / float(len(alive))
        # max density; earliest step on ties
        if dens > best[0]:
            best = (dens, -step, len(alive), len(cur_edges))
    return pa.table(
        {
            "n_nodes": pa.array([best[2]], pa.int64()),
            "n_edges": pa.array([best[3]], pa.int64()),
            "density": round_like_sql([best[0]], 6),
        }
    )


def _q_graph_bridges(sf_dir: str) -> pa.Table:
    """Bridge edges of the edit-1 word graph by the definition itself:
    an edge is a bridge iff removing it disconnects its endpoints --
    checked with a 6-level BFS from the edge's smaller endpoint in the
    graph minus that edge, run for every edge simultaneously (the
    (edge, frontier) state is edges x nodes bounded).  Pure set/count
    arithmetic; no DFS ordering anywhere."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        distinct,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.textops import (
        edit1_vocab_pairs,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["source"]
    ).map_batches(
        lambda b: b.rename_columns(["text"]),
        batch_format="pyarrow", batch_size=None,
    )
    pairs = edit1_vocab_pairs(ds, min_len=4)
    full = _read_pq(
        os.path.join(sf_dir, "documents.parquet"), columns=["source"]
    )
    vt = distinct(full, ["source"])
    vocab = sorted(w for w in vt["source"].to_pylist() if len(w) >= 4)
    rank = {w: i for i, w in enumerate(vocab)}
    n = len(vocab)
    edges = sorted(
        (min(rank[w1], rank[w2]), max(rank[w1], rank[w2]))
        for w1, w2 in zip(pairs["w1"].to_pylist(), pairs["w2"].to_pylist())
    )
    adj: list[set[int]] = [set() for _ in range(n)]
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    flags = []
    for a, b in edges:
        seen = {a}
        frontier = {a}
        for _ in range(6):
            nxt = set()
            for u in frontier:
                for v in adj[u]:
                    if (u, v) in ((a, b), (b, a)):
                        continue
                    if v not in seen:
                        nxt.add(v)
            seen |= nxt
            frontier = nxt
        flags.append(0 if b in seen else 1)
    return pa.table(
        {
            "w1": pa.array([vocab[a] for a, _ in edges], pa.string()),
            "w2": pa.array([vocab[b] for _, b in edges], pa.string()),
            "is_bridge": pa.array(flags, pa.int64()),
        }
    )


def _q_delaunay_triangles(sf_dir: str) -> pa.Table:
    """Delaunay triangle candidates of the top-20 event cells by the
    EXACT empty-circumcircle certificate: triple (i,j,k) qualifies iff
    no other point lies strictly inside its circumcircle, tested with
    the integer incircle inequality (d*q - u)^2 < rnum -- no floats,
    no incremental construction, deterministic even on cocircular
    grid degeneracies.  The point set is the top-20 cells by summed
    value cents (count ties would pick one collinear grid row).
    Returns the triangle list plus the implied Delaunay edge count."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        scaled_int,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id", "value"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cell = eid % 96 + (eid // 96 % 96) * 96
        return pa.table(
            {
                "cell": pa.array(cell),
                "v": pa.array(scaled_int(batch["value"], 100.0)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["cell"],
        [("v", "sum", "n")],
    )
    top = sorted(
        zip(agg["n"].to_pylist(), agg["cell"].to_pylist()),
        key=lambda t: (-int(t[0]), int(t[1])),
    )[:20]
    cells = sorted(int(c) for _, c in top)
    pts = [(c % 96, c // 96) for c in cells]
    n = len(pts)
    tris = []
    edge_set = set()
    for i in range(n):
        for j in range(i + 1, n):
            for k in range(j + 1, n):
                (ax, ay), (bx, by), (cx, cy) = pts[i], pts[j], pts[k]
                d = 2 * (ax * (by - cy) + bx * (cy - ay) + cx * (ay - by))
                if d == 0:
                    continue
                a2 = ax * ax + ay * ay
                b2 = bx * bx + by * by
                c2 = cx * cx + cy * cy
                ux = a2 * (by - cy) + b2 * (cy - ay) + c2 * (ay - by)
                uy = a2 * (cx - bx) + b2 * (ax - cx) + c2 * (bx - ax)
                rnum = (d * ax - ux) ** 2 + (d * ay - uy) ** 2
                empty = all(
                    (d * qx - ux) ** 2 + (d * qy - uy) ** 2 >= rnum
                    for m, (qx, qy) in enumerate(pts)
                    if m not in (i, j, k)
                )
                if empty:
                    tris.append((i, j, k))
                    edge_set |= {(i, j), (i, k), (j, k)}
    return pa.table(
        {
            "i": pa.array([t[0] for t in tris], pa.int64()),
            "j": pa.array([t[1] for t in tris], pa.int64()),
            "k": pa.array([t[2] for t in tris], pa.int64()),
            "n_edges": pa.array([len(edge_set)] * len(tris), pa.int64()),
        }
    )


_KNAP_CAP = 600


def _top_value_cells(sf_dir: str, k: int = 20) -> list[int]:
    """Top-k grid cells by summed value cents (ties by cell id) --
    the scattered point set shared by the computational-geometry
    and combinatorial-optimization operators."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        scaled_int,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id", "value"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cell = eid % 96 + (eid // 96 % 96) * 96
        return pa.table(
            {
                "cell": pa.array(cell),
                "v": pa.array(scaled_int(batch["value"], 100.0)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["cell"],
        [("v", "sum", "n")],
    )
    top = sorted(
        zip(agg["n"].to_pylist(), agg["cell"].to_pylist()),
        key=lambda t: (-int(t[0]), int(t[1])),
    )[:k]
    return [(int(c), int(v)) for v, c in top]


def _q_knapsack_cells(sf_dir: str) -> pa.Table:
    """0/1 knapsack over the top-20 value cells: weight = integer
    Manhattan distance from the grid center (doubled coordinates so
    the 47.5 center stays integral), value = summed cents, capacity
    600.  The classic DP over capacities is exact integer arithmetic;
    the SQL mirror unrolls the 20 item levels over a 601-row capacity
    table."""
    items = _top_value_cells(sf_dir)
    cells = sorted(c for c, _ in items)
    vals = dict(items)
    w = {c: abs(2 * (c % 96) - 95) + abs(2 * (c // 96) - 95) for c in cells}
    cap = _KNAP_CAP
    dp = [0] * (cap + 1)
    for c in cells:
        wi, vi = w[c], vals[c]
        new = list(dp)
        for cc in range(wi, cap + 1):
            cand = dp[cc - wi] + vi
            if cand > new[cc]:
                new[cc] = cand
        dp = new
    return pa.table(
        {
            "capacity": pa.array([cap], pa.int64()),
            "n_items": pa.array([len(cells)], pa.int64()),
            "best_value": pa.array([dp[cap]], pa.int64()),
        }
    )


_LAYERS = 6


def _q_convex_layers(sf_dir: str) -> pa.Table:
    """Convex onion-peeling of the top-20 value cells: layer 1 = the
    extreme points of the set, layer 2 = extreme points of the rest,
    ... 6 peels.  Extremeness uses the EXACT integer Caratheodory
    certificate -- p is non-extreme iff it lies in some triangle of
    remaining points (three same-sign cross products, boundary
    allowed) or strictly within a segment -- so layer assignment
    never touches a float."""
    items = _top_value_cells(sf_dir)
    cells = sorted(c for c, _ in items)
    pts = {c: (c % 96, c // 96) for c in cells}

    def non_extreme(p: int, others: list[int]) -> bool:
        px, py = pts[p]
        ot = [pts[q] for q in others]
        m = len(ot)
        for a in range(m):
            qx, qy = ot[a]
            for bidx in range(a + 1, m):
                rx, ry = ot[bidx]
                cr = (rx - qx) * (py - qy) - (ry - qy) * (px - qx)
                if cr == 0 and (px - qx) * (px - rx) + (py - qy) * (
                    py - ry
                ) <= 0:
                    return True  # on segment qr
                for cdx in range(bidx + 1, m):
                    sx, sy = ot[cdx]
                    if (rx - qx) * (sy - qy) - (ry - qy) * (sx - qx) == 0:
                        continue  # degenerate triangle: segment case
                    d1 = (rx - qx) * (py - qy) - (ry - qy) * (px - qx)
                    d2 = (sx - rx) * (py - ry) - (sy - ry) * (px - rx)
                    d3 = (qx - sx) * (py - sy) - (qy - sy) * (px - sx)
                    if (d1 >= 0 and d2 >= 0 and d3 >= 0) or (
                        d1 <= 0 and d2 <= 0 and d3 <= 0
                    ):
                        return True
        return False

    layer = {c: 0 for c in cells}
    remaining = list(cells)
    for lv in range(1, _LAYERS + 1):
        if not remaining:
            break
        ext = [
            p
            for p in remaining
            if not non_extreme(p, [q for q in remaining if q != p])
        ]
        for p in ext:
            layer[p] = lv
        remaining = [p for p in remaining if p not in ext]
    return pa.table(
        {
            "cell": pa.array(cells, pa.int64()),
            "layer": pa.array([layer[c] for c in cells], pa.int64()),
        }
    )


_ATTR_ITERS = 60
_ATTR_SCALE = 1_000_000_000_000


def _q_markov_attribution(sf_dir: str) -> pa.Table:
    """Markov-chain removal-effect attribution: user paths (ordered by
    ts, event_id, truncated at the first purchase) feed a first-order
    chain with absorbing conv/null states; P(conv) is evaluated by 60
    value-iteration steps with 1e12-tick truncating divisions (exact
    integers both sides), once for the full chain and once per channel
    with that channel's value pinned to zero -- removal_effect = 1 -
    P_removed/P_full.  Distributed tier: per-user path kernels through
    the bucketed groupby shuffle, then a (src, dst) count combiner."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.shuffle import (
        grouped_by_key,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_id", "event_type"],
    )

    def path_edges(group: pa.Table) -> pa.Table:
        order = sorted(
            zip(
                group["ts"].cast(pa.int64()).to_pylist(),
                group["event_id"].to_pylist(),
                group["event_type"].to_pylist(),
            )
        )
        seq = [t for _, _, t in order]
        if "purchase" in seq:
            seq = seq[: seq.index("purchase") + 1]
        out_s, out_t = [], []
        prev = "_start"
        for t in seq:
            out_s.append(prev)
            out_t.append("_conv" if t == "purchase" else t)
            prev = t
        if seq[-1] != "purchase":
            out_s.append(seq[-1])
            out_t.append("_null")
        return pa.table(
            {
                "s": pa.array(out_s, pa.string()),
                "t": pa.array(out_t, pa.string()),
                "_one": pa.array(np.ones(len(out_s), np.int64)),
            }
        )

    tr = hash_aggregate(
        grouped_by_key(ds, "user_id", path_edges),
        ["s", "t"],
        [("_one", "sum", "c")],
    )
    trans: dict[str, dict[str, int]] = {}
    for s, t, c in zip(
        tr["s"].to_pylist(), tr["t"].to_pylist(), tr["c"].to_pylist()
    ):
        trans.setdefault(s, {})[t] = int(c)
    rs = {s: sum(d.values()) for s, d in trans.items()}
    states = ["_start", "click", "error", "signup", "view"]
    sc = _ATTR_SCALE

    def p_conv(removed: str) -> int:
        vq = {s: 0 for s in states}
        for _ in range(_ATTR_ITERS):
            new = {}
            for s in states:
                if s == removed:
                    new[s] = 0
                    continue
                d = trans.get(s)
                if not d:
                    new[s] = 0
                    continue
                tot = 0
                for t, c in d.items():
                    if t == "_conv":
                        tot += c * sc
                    elif t == removed or t == "_null":
                        pass
                    else:
                        tot += c * vq.get(t, 0)
                new[s] = tot // rs[s]
            vq = new
        return vq["_start"]

    p_full = p_conv("")
    channels = ["click", "error", "signup", "view"]
    p_rm = [p_conv(ch) for ch in channels]
    return pa.table(
        {
            "channel": pa.array(channels, pa.string()),
            "p_full": round_like_sql([float(p_full) / 1e12] * 4, 6),
            "p_removed": round_like_sql(
                [float(v) / 1e12 for v in p_rm], 6
            ),
            "removal_effect": round_like_sql(
                [1.0 - float(v) / float(p_full) for v in p_rm], 6
            ),
        }
    )


def _daily_revenue_returns(sf_dir: str) -> list[int]:
    """Shared helper: dense daily event-revenue cents -> day-over-day
    returns quantized at 1e6 ticks (pinned double ratio, then exact
    integers).  Days with zero prior revenue are skipped on both
    sides."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        scaled_int,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["ts", "value"]
    )

    def daily(batch: pa.Table) -> pa.Table:
        d = (
            batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 86_400_000_000
        )
        return pa.table(
            {
                "d": pa.array(d),
                "y": pa.array(scaled_int(batch["value"], 100.0)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(daily, batch_format="pyarrow", batch_size=None),
        ["d"],
        [("y", "sum", "y")],
    )
    dd = agg["d"].to_numpy(zero_copy_only=False).astype(np.int64)
    lo, hi = int(dd.min()), int(dd.max())
    ys = [0] * (hi - lo + 1)
    for d, y in zip((dd - lo).tolist(), agg["y"].to_pylist()):
        ys[d] = int(y)
    out = []
    for t in range(1, len(ys)):
        if ys[t - 1] > 0:
            r = float(ys[t] - ys[t - 1]) / float(ys[t - 1])
            out.append(int(round_half_away(np.array([r * 1e6]))[0]))
    return out


def _q_sharpe_sortino(sf_dir: str) -> pa.Table:
    """Sharpe and Sortino ratios of the daily revenue return series:
    returns quantized at 1e6 ticks so all moments (including the
    downside-only second moment) are exact integers; mean / std /
    downside-dev assembled with one pinned double chain."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )

    rq = _daily_revenue_returns(sf_dir)
    n = len(rq)
    s1 = sum(rq)
    s2 = sum(v * v for v in rq)
    d2 = sum(v * v for v in rq if v < 0)
    mean = float(s1) / float(n)
    var = float(s2) / float(n) - mean * mean
    dvar = float(d2) / float(n)
    return pa.table(
        {
            "n_ret": pa.array([n], pa.int64()),
            "mean_ret": round_like_sql([mean / 1e6], 6),
            "sharpe": round_like_sql([mean / np.sqrt(var)], 6),
            "sortino": round_like_sql([mean / np.sqrt(dvar)], 6),
        }
    )


def _q_var_cvar(sf_dir: str) -> pa.Table:
    """Historical VaR / CVaR at 5% on the daily revenue returns: the
    k = n*5//100 + 1 smallest quantized return is the VaR order
    statistic and the exact integer mean of the k smallest is CVaR --
    order statistics on integers, no interpolation ambiguity."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        round_like_sql,
    )

    rq = sorted(_daily_revenue_returns(sf_dir))
    n = len(rq)
    k = (n * 5) // 100 + 1
    var05 = rq[k - 1]
    tail = sum(rq[:k])
    return pa.table(
        {
            "n_ret": pa.array([n], pa.int64()),
            "k_tail": pa.array([k], pa.int64()),
            "var05": round_like_sql([float(var05) / 1e6], 6),
            "cvar05": round_like_sql(
                [float(tail) / float(k) / 1e6], 6
            ),
        }
    )


def _q_reg_discontinuity(sf_dir: str) -> pa.Table:
    """Sharp regression discontinuity at user_id % 100 = 50: separate
    OLS of value cents on the running variable on each side (exact
    integer moments), effect = difference of the two fitted values at
    the cutoff -- the causal-inference sibling of the ipw_estimate
    operator."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        scaled_int,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id", "value"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        x = uid % 100
        y = scaled_int(batch["value"], 100.0)
        return pa.table(
            {
                "side": pa.array((x >= 50).astype(np.int64)),
                "_one": pa.array(np.ones(len(x), np.int64)),
                "x": pa.array(x),
                "y": pa.array(y),
                "xx": pa.array(x * x),
                "xy": pa.array(x * y),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["side"],
        [
            ("_one", "sum", "n"),
            ("x", "sum", "sx"),
            ("y", "sum", "sy"),
            ("xx", "sum", "sxx"),
            ("xy", "sum", "sxy"),
        ],
    )
    fits = {}
    ns = {}
    for i in range(agg.num_rows):
        side = int(agg["side"][i].as_py())
        n = int(agg["n"][i].as_py())
        sx = int(agg["sx"][i].as_py())
        sy = int(agg["sy"][i].as_py())
        sxx = int(agg["sxx"][i].as_py())
        sxy = int(agg["sxy"][i].as_py())
        b = float(n * sxy - sx * sy) / float(n * sxx - sx * sx)
        a = (float(sy) - b * float(sx)) / float(n)
        fits[side] = a + b * 50.0
        ns[side] = n
    return pa.table(
        {
            "n_left": pa.array([ns[0]], pa.int64()),
            "n_right": pa.array([ns[1]], pa.int64()),
            "y_left": round_like_sql([fits[0]], 6),
            "y_right": round_like_sql([fits[1]], 6),
            "rd_effect": round_like_sql([fits[1] - fits[0]], 6),
        }
    )


def _q_chain_ladder(sf_dir: str) -> pa.Table:
    """Chain-ladder reserving on the purchase development triangle:
    cohort = week of a user's first event, dev = purchase week -
    cohort week, upper triangle (i + j <= 4) observed.  Development
    factors are 1e9-tick quantized ratios of exact cumulative sums;
    ultimates apply them with truncating integer multiplies, so the
    projection chain is bit-identical in SQL.  Reports predicted
    ultimate vs the actual full-month count per cohort."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_type"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        day = (
            batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 86_400_000_000
        )
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "u": batch["user_id"],
                "d": pa.array(day),
                "is_p": pa.array((et == "purchase").astype(np.int64)),
                "_one": pa.array(np.ones(len(day), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["u", "d"],
        [("is_p", "sum", "np"), ("_one", "sum", "n")],
    )
    uv = agg["u"].to_numpy(zero_copy_only=False).astype(np.int64)
    dv = agg["d"].to_numpy(zero_copy_only=False).astype(np.int64)
    pv = agg["np"].to_numpy(zero_copy_only=False).astype(np.int64)
    d0 = int(dv.min())
    wk = (dv - d0) // 7
    first_wk: dict[int, int] = {}
    for u, w in zip(uv.tolist(), wk.tolist()):
        if u not in first_wk or w < first_wk[u]:
            first_wk[u] = w
    inc = [[0] * 5 for _ in range(5)]  # cohort x dev purchase counts
    for u, w, p in zip(uv.tolist(), wk.tolist(), pv.tolist()):
        i = first_wk[u]
        j = w - i
        if 0 <= i <= 4 and 0 <= j <= 4:
            inc[i][j] += int(p)
    cum = [
        [sum(inc[i][: j + 1]) for j in range(5)] for i in range(5)
    ]
    sc = 1_000_000_000
    fq = []
    for j in range(4):
        num = sum(cum[i][j + 1] for i in range(5) if i + j + 1 <= 4)
        den = sum(cum[i][j] for i in range(5) if i + j + 1 <= 4)
        fq.append(
            int(
                round_half_away(
                    np.array([1e9 * float(num) / float(den)])
                )[0]
            )
        )
    cohorts = list(range(5))
    latest = [cum[i][4 - i] for i in cohorts]
    ult = list(latest)
    for j in range(4):
        ult = [
            (ult[i] * fq[j]) // sc if 4 - i <= j else ult[i]
            for i in cohorts
        ]
    return pa.table(
        {
            "cohort": pa.array(cohorts, pa.int64()),
            "latest_known": pa.array(latest, pa.int64()),
            "ultimate": pa.array(ult, pa.int64()),
            "actual_full": pa.array(
                [cum[i][4] for i in cohorts], pa.int64()
            ),
        }
    )


_ITEMSET_NAMES = {
    1 << i: t for i, t in enumerate(_MARKOV_STATES)
}


def _q_closed_itemsets(sf_dir: str) -> pa.Table:
    """Frequent + closed itemset mining over (user, day) baskets of
    event types: all 31 non-empty subsets of the 5-type alphabet,
    exact basket-containment supports (bitmask tests), and the closed
    flag (no strict superset with equal support).  Distributed tier:
    the (user, day, type) distinct combiner; baskets are
    user-day-bounded."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_type"],
    )
    tmap = {t: i for i, t in enumerate(_MARKOV_STATES)}

    def prep(batch: pa.Table) -> pa.Table:
        day = (
            batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 86_400_000_000
        )
        ti = np.array(
            [tmap[t] for t in batch["event_type"].to_pylist()], np.int64
        )
        return pa.table(
            {
                "u": batch["user_id"],
                "d": pa.array(day),
                "t": pa.array(ti),
                "_one": pa.array(np.ones(len(day), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["u", "d", "t"],
        [("_one", "sum", "_n")],
    )
    uv = agg["u"].to_numpy(zero_copy_only=False).astype(np.int64)
    dv = agg["d"].to_numpy(zero_copy_only=False).astype(np.int64)
    tv = agg["t"].to_numpy(zero_copy_only=False).astype(np.int64)
    _, inv = np.unique(np.stack([uv, dv], axis=1), axis=0, return_inverse=True)
    masks = np.zeros(int(inv.max()) + 1, np.int64)
    np.bitwise_or.at(masks, inv, np.int64(1) << tv)
    sup = {
        m: int(((masks & m) == m).sum()) for m in range(1, 32)
    }
    names = {
        m: "+".join(
            _MARKOV_STATES[i] for i in range(5) if (m >> i) & 1
        )
        for m in range(1, 32)
    }
    rows = []
    for m in range(1, 32):
        closed = all(
            sup[m2] != sup[m]
            for m2 in range(1, 32)
            if m2 != m and (m2 & m) == m
        )
        rows.append((names[m], bin(m).count("1"), sup[m], 1 if closed else 0))
    rows.sort()
    return pa.table(
        {
            "itemset": pa.array([r[0] for r in rows], pa.string()),
            "size": pa.array([r[1] for r in rows], pa.int64()),
            "support": pa.array([r[2] for r in rows], pa.int64()),
            "is_closed": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


def _hough_mask_points() -> tuple[np.ndarray, np.ndarray]:
    """Binary mask of the oracle raster (integer formula predicate:
    value band >= 45.0 and valid under the default nodata rule),
    shared by the Hough and RLE operators."""
    rr, cc = np.meshgrid(np.arange(OG_H), np.arange(OG_W), indexing="ij")
    m = ((rr * 73 + cc * 31) % 500 >= 450) & ((rr * 7 + cc * 13) % 11 >= 3)
    return cc[m].astype(np.int64), rr[m].astype(np.int64)


def _q_hough_lines(sf_dir: str) -> pa.Table:
    """Hough line detection over the oracle raster's high-value mask:
    8 theta bins with 1e6-tick quantized cos/sin, rho binned by one
    pinned ROUND per (point, theta) vote, exact accumulator counts,
    top-5 peaks by (votes DESC, theta, rho).  Distributed tier: votes
    are emitted per tile batch and summed by the combiner aggregate."""
    import ray.data

    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    cq = round_half_away(1e6 * np.cos(np.arange(8) * np.pi / 8)).astype(
        np.int64
    )
    sq = round_half_away(1e6 * np.sin(np.arange(8) * np.pi / 8)).astype(
        np.int64
    )
    tiles = ray.data.from_arrow(_og_tiles_table())

    def votes(batch: pa.Table) -> pa.Table:
        ks, rhos = [], []
        for i in range(batch.num_rows):
            r0 = int(batch["row_off"][i].as_py())
            c0 = int(batch["col_off"][i].as_py())
            h = int(batch["height"][i].as_py())
            w = int(batch["width"][i].as_py())
            rr, cc = np.meshgrid(
                np.arange(r0, r0 + h), np.arange(c0, c0 + w), indexing="ij"
            )
            m = ((rr * 73 + cc * 31) % 500 >= 450) & (
                (rr * 7 + cc * 13) % 11 >= 3
            )
            x = cc[m].astype(np.int64)
            y = rr[m].astype(np.int64)
            for k in range(8):
                rho = round_half_away(
                    (x * cq[k] + y * sq[k]).astype(np.float64) / 1e6
                ).astype(np.int64)
                ks.append(np.full(len(rho), k, np.int64))
                rhos.append(rho)
        kk = np.concatenate(ks) if ks else np.zeros(0, np.int64)
        rr_ = np.concatenate(rhos) if rhos else np.zeros(0, np.int64)
        return pa.table(
            {
                "k": pa.array(kk),
                "rho": pa.array(rr_),
                "_one": pa.array(np.ones(len(kk), np.int64)),
            }
        )

    acc = hash_aggregate(
        tiles.map_batches(votes, batch_format="pyarrow", batch_size=None),
        ["k", "rho"],
        [("_one", "sum", "votes")],
    )
    kv = acc["k"].to_numpy(zero_copy_only=False)
    rv = acc["rho"].to_numpy(zero_copy_only=False)
    vv = acc["votes"].to_numpy(zero_copy_only=False)
    order = np.lexsort((rv, kv, -vv))[:5]
    return pa.table(
        {
            "theta_k": pa.array(kv[order].tolist(), pa.int64()),
            "rho": pa.array(rv[order].tolist(), pa.int64()),
            "votes": pa.array(vv[order].tolist(), pa.int64()),
        }
    )


def _q_rle_runs(sf_dir: str) -> pa.Table:
    """Run-length histogram of the oracle raster's high-value mask:
    per-row maximal runs of masked pixels (gaps-and-islands), exact
    integer lengths.  Distributed tier: per-row kernels through the
    bucketed groupby shuffle (rows are the keys, so tile-boundary
    runs stitch naturally)."""
    import ray.data as rd

    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.shuffle import (
        grouped_by_key,
    )

    x, y = _hough_mask_points()
    pts = rd.from_arrow(
        pa.table({"y": pa.array(y), "x": pa.array(x)})
    )

    def row_runs(group: pa.Table) -> pa.Table:
        xs = sorted(group["x"].to_pylist())
        lens = []
        run = 1
        for i in range(1, len(xs)):
            if xs[i] == xs[i - 1] + 1:
                run += 1
            else:
                lens.append(run)
                run = 1
        lens.append(run)
        return pa.table(
            {
                "run_length": pa.array(lens, pa.int64()),
                "_one": pa.array(np.ones(len(lens), np.int64)),
            }
        )

    hist = hash_aggregate(
        grouped_by_key(pts, "y", row_runs),
        ["run_length"],
        [("_one", "sum", "n_runs")],
    )
    return hist.sort_by([("run_length", "ascending")])


def _q_catchment_2sfca(sf_dir: str) -> pa.Table:
    """Two-step floating catchment area accessibility: supply = the
    top-10 cells by value cents, demand = per-cell event counts,
    catchment = squared Euclidean grid distance <= 100 (exact integer
    predicate).  Step-1 provider ratios quantized at 1e9 ticks
    (supply * 1e9 // in-range demand), step-2 accessibility is the
    exact integer sum of in-range ratios; top-20 demand cells by
    (accessibility DESC, cell)."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        scaled_int,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id", "value"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        eid = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cell = eid % 96 + (eid // 96 % 96) * 96
        return pa.table(
            {
                "cell": pa.array(cell),
                "_one": pa.array(np.ones(len(eid), np.int64)),
                "v": pa.array(scaled_int(batch["value"], 100.0)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["cell"],
        [("_one", "sum", "n"), ("v", "sum", "sv")],
    )
    cells = agg["cell"].to_numpy(zero_copy_only=False).astype(np.int64)
    nv = agg["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    sv = agg["sv"].to_numpy(zero_copy_only=False).astype(np.int64)
    supply = sorted(
        zip(sv.tolist(), cells.tolist()), key=lambda t: (-t[0], t[1])
    )[:10]
    xs = cells % 96
    ys = cells // 96
    ratios = []
    for s_val, s_cell in supply:
        sx, sy = s_cell % 96, s_cell // 96
        inr = (xs - sx) ** 2 + (ys - sy) ** 2 <= 100
        dem = int(nv[inr].sum())
        ratios.append((s_cell, (int(s_val) * 1_000_000_000) // dem))
    acc = np.zeros(len(cells), np.int64)
    for s_cell, rq in ratios:
        sx, sy = s_cell % 96, s_cell // 96
        inr = (xs - sx) ** 2 + (ys - sy) ** 2 <= 100
        acc[inr] += np.int64(rq)
    order = sorted(
        range(len(cells)),
        key=lambda i: (-int(acc[i]), int(cells[i])),
    )[:20]
    return pa.table(
        {
            "cell": pa.array([int(cells[i]) for i in order], pa.int64()),
            "access_q": pa.array([int(acc[i]) for i in order], pa.int64()),
            "access": round_like_sql(
                [float(int(acc[i])) / 1e9 for i in order], 6
            ),
        }
    )


def _q_mean_excess(sf_dir: str) -> pa.Table:
    """Mean-excess function (EVT threshold diagnostics) of event value
    cents at five doubling thresholds: exact integer exceedance sums
    and counts per threshold via one combiner pass, one float division
    each at the end."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        scaled_int,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    thresholds = [1000, 2000, 4000, 8000, 16000]
    ds = _read_pq(os.path.join(sf_dir, "events.parquet"), columns=["value"])

    def prep(batch: pa.Table) -> pa.Table:
        y = scaled_int(batch["value"], 100.0)
        us, ns, ss = [], [], []
        for u in thresholds:
            m = y > u
            us.append(u)
            ns.append(int(m.sum()))
            ss.append(int((y[m] - u).sum()))
        return pa.table(
            {
                "u": pa.array(us, pa.int64()),
                "n": pa.array(ns, pa.int64()),
                "s": pa.array(ss, pa.int64()),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["u"],
        [("n", "sum", "n"), ("s", "sum", "s")],
    ).sort_by([("u", "ascending")])
    return pa.table(
        {
            "threshold": agg["u"],
            "n_exceed": agg["n"],
            "mean_excess": round_like_sql(
                [
                    float(int(s)) / float(int(n))
                    for s, n in zip(
                        agg["s"].to_pylist(), agg["n"].to_pylist()
                    )
                ],
                6,
            ),
        }
    )


def _q_epoch_folding(sf_dir: str) -> pa.Table:
    """Epoch-folding periodicity search on the hourly event series:
    for candidate periods P in {6, 12, 24, 168} hours the folded-bin
    chi-square statistic has the exact integer numerator
    sum_b (P*O_b - T)^2 over denominator P*T, so the whole scan is one
    combiner pass plus a float division per period."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    periods = [6, 12, 24, 168]
    ds = _read_pq(os.path.join(sf_dir, "events.parquet"), columns=["ts"])

    def prep(batch: pa.Table) -> pa.Table:
        h = (
            batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 3_600_000_000
        )
        ps, bs, ns = [], [], []
        for p in periods:
            b = h % p
            ub, cb = np.unique(b, return_counts=True)
            ps.append(np.full(len(ub), p, np.int64))
            bs.append(ub)
            ns.append(cb.astype(np.int64))
        return pa.table(
            {
                "p": pa.array(np.concatenate(ps)),
                "b": pa.array(np.concatenate(bs)),
                "n": pa.array(np.concatenate(ns)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["p", "b"],
        [("n", "sum", "n")],
    )
    pv = agg["p"].to_pylist()
    nv = agg["n"].to_pylist()
    tot: dict[int, int] = {}
    bins: dict[int, list[int]] = {p: [] for p in periods}
    for p, n in zip(pv, nv):
        tot[int(p)] = tot.get(int(p), 0) + int(n)
        bins[int(p)].append(int(n))
    rows = []
    for p in periods:
        t = tot[p]
        # empty bins contribute (0*P - T)^2 each
        obs = bins[p] + [0] * (p - len(bins[p]))
        num = sum((p * o - t) ** 2 for o in obs)
        rows.append((p, t, float(num) / float(p * t)))
    return pa.table(
        {
            "period_h": pa.array([r[0] for r in rows], pa.int64()),
            "n_events": pa.array([r[1] for r in rows], pa.int64()),
            "chi2": round_like_sql([r[2] for r in rows], 6),
        }
    )


def _q_seat_apportionment(sf_dir: str) -> pa.Table:
    """Apportion 100 seats across event types by event count under
    two classic rules: D'Hondt (top-100 quotients c/k, float compare
    safe -- cross products fit a double exactly -- with type
    tie-break) and Hamilton largest remainder (floor(c*100/T) plus
    remainders c*100 mod T ranked with type tie-break).  All integer
    arithmetic except the collision-free quotient ordering."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type"]
    )

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch["event_type"],
                "_one": pa.array(np.ones(batch.num_rows, np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["event_type"],
        [("_one", "sum", "c")],
    )
    counts = dict(
        zip(
            agg["event_type"].to_pylist(),
            (int(x) for x in agg["c"].to_pylist()),
        )
    )
    types = sorted(counts)
    total = sum(counts.values())
    seats = 100
    # D'Hondt: top-100 quotients
    quot = [
        (float(counts[t]) / float(k), t, k)
        for t in types
        for k in range(1, seats + 1)
    ]
    quot.sort(key=lambda q: (-q[0], q[1], q[2]))
    dh = {t: 0 for t in types}
    for _, t, _ in quot[:seats]:
        dh[t] += 1
    # Hamilton largest remainder
    base = {t: (counts[t] * seats) // total for t in types}
    rem = sorted(
        types, key=lambda t: (-((counts[t] * seats) % total), t)
    )
    ham = dict(base)
    left = seats - sum(base.values())
    for t in rem[:left]:
        ham[t] += 1
    return pa.table(
        {
            "event_type": pa.array(types, pa.string()),
            "n_events": pa.array([counts[t] for t in types], pa.int64()),
            "dhondt": pa.array([dh[t] for t in types], pa.int64()),
            "hamilton": pa.array([ham[t] for t in types], pa.int64()),
        }
    )


_HUFF_STEPS = 25


def _q_huffman_code(sf_dir: str) -> pa.Table:
    """Huffman code construction over corpus letter frequencies: the
    greedy merge (two smallest groups by (weight, min-symbol), fully
    deterministic) is unrolled as 25 guarded steps -- each either
    merges or passes through when fewer than two groups remain -- and
    per-leaf code lengths increment when their group participates.
    All integer; the SQL mirror replays the identical merge schedule.
    Distributed tier: the (letter) count combiner."""
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(os.path.join(sf_dir, "documents.parquet"), columns=["text"])

    def prep(batch: pa.Table) -> pa.Table:
        acc = np.zeros(26, np.int64)
        for text in batch["text"].to_pylist():
            b = np.frombuffer(text.encode(), np.uint8).astype(np.int64)
            b = b[(b >= 97) & (b <= 122)] - 97
            acc += np.bincount(b, minlength=26)
        return pa.table(
            {
                "c": pa.array(np.arange(26, dtype=np.int64)),
                "n": pa.array(acc),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["c"],
        [("n", "sum", "n")],
    )
    w0 = {}
    for c, n in zip(agg["c"].to_pylist(), agg["n"].to_pylist()):
        if int(n) > 0:
            w0[int(c)] = int(n)
    groups = {c: w for c, w in w0.items()}  # grp id = min symbol idx
    leaf_grp = {c: c for c in w0}
    length = {c: 0 for c in w0}
    for _ in range(_HUFF_STEPS):
        if len(groups) < 2:
            continue
        order = sorted(groups.items(), key=lambda t: (t[1], t[0]))
        (g1, wa), (g2, wb) = order[0], order[1]
        ng = min(g1, g2)
        for c in w0:
            if leaf_grp[c] in (g1, g2):
                leaf_grp[c] = ng
                length[c] += 1
        del groups[g1], groups[g2]
        groups[ng] = wa + wb
    total_bits = sum(w0[c] * length[c] for c in w0)
    syms = sorted(w0)
    return pa.table(
        {
            "letter": pa.array([chr(97 + c) for c in syms], pa.string()),
            "weight": pa.array([w0[c] for c in syms], pa.int64()),
            "code_len": pa.array([length[c] for c in syms], pa.int64()),
            "total_bits": pa.array([total_bits] * len(syms), pa.int64()),
        }
    )


_LIS_LEVELS = 30


def _q_lis_daily(sf_dir: str) -> pa.Table:
    """Longest strictly-increasing subsequence of the daily revenue
    series: level-set formulation (a day reaches level k iff some
    earlier smaller day reaches k-1), 30 unrolled levels of pure
    integer joins; reports the LIS length and how many days can end
    such a chain."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        scaled_int,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["ts", "value"]
    )

    def daily(batch: pa.Table) -> pa.Table:
        d = (
            batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 86_400_000_000
        )
        return pa.table(
            {
                "d": pa.array(d),
                "y": pa.array(scaled_int(batch["value"], 100.0)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(daily, batch_format="pyarrow", batch_size=None),
        ["d"],
        [("y", "sum", "y")],
    )
    dd = agg["d"].to_numpy(zero_copy_only=False).astype(np.int64)
    lo, hi = int(dd.min()), int(dd.max())
    ys = [0] * (hi - lo + 1)
    for d, y in zip((dd - lo).tolist(), agg["y"].to_pylist()):
        ys[d] = int(y)
    n = len(ys)
    level = [{t for t in range(n)}]
    for _ in range(1, _LIS_LEVELS):
        prev = level[-1]
        nxt = {
            t
            for t in range(n)
            if any(s < t and ys[s] < ys[t] for s in prev)
        }
        level.append(nxt)
        if not nxt:
            break
    lis = max(k + 1 for k, s in enumerate(level) if s)
    return pa.table(
        {
            "n_days": pa.array([n], pa.int64()),
            "lis_len": pa.array([lis], pa.int64()),
            "n_endings": pa.array([len(level[lis - 1])], pa.int64()),
        }
    )


_KAL_SC = 1_000_000
_KAL_Q = _KAL_SC // 4
_KAL_R = 4 * _KAL_SC


def _q_kalman_1d(sf_dir: str) -> pa.Table:
    """1-D Kalman level filter on the daily revenue cents series,
    entirely in 1e6-tick integers: predict P+Q, gain K = P*SC //
    (P+R), update x += K*(m - x) // SC, P = (SC-K)*P // SC -- every
    step a truncating division, so the 29 unrolled scalar-state CTE
    steps in SQL replay the identical filter."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        scaled_int,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["ts", "value"]
    )

    def daily(batch: pa.Table) -> pa.Table:
        d = (
            batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 86_400_000_000
        )
        return pa.table(
            {
                "d": pa.array(d),
                "y": pa.array(scaled_int(batch["value"], 100.0)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(daily, batch_format="pyarrow", batch_size=None),
        ["d"],
        [("y", "sum", "y")],
    )
    dd = agg["d"].to_numpy(zero_copy_only=False).astype(np.int64)
    lo, hi = int(dd.min()), int(dd.max())
    ys = [0] * (hi - lo + 1)
    for d, y in zip((dd - lo).tolist(), agg["y"].to_pylist()):
        ys[d] = int(y)
    sc, q, r = _KAL_SC, _KAL_Q, _KAL_R
    x = ys[0] * sc
    p = 4 * sc
    xs = [x]
    for t in range(1, len(ys)):
        pp = p + q
        k = (pp * sc) // (pp + r)
        d = k * (ys[t] * sc - x)
        # sign-split truncating division (DuckDB // truncates, Python
        # // floors -- split keeps them identical on negatives)
        x = x + (-((-d) // sc) if d < 0 else d // sc)
        p = ((sc - k) * pp) // sc
        xs.append(x)
    return pa.table(
        {
            "t": pa.array(list(range(len(ys))), pa.int64()),
            "y": pa.array(ys, pa.int64()),
            "x_filt": round_like_sql(
                [float(v) / 1e6 for v in xs], 6
            ),
        }
    )


def _q_secretary_rule(sf_dir: str) -> pa.Table:
    """Secretary-problem 37%-rule evaluation over 200 deterministic
    mix32 permutations of the daily revenue series: observe the first
    11 of 30 days, then accept the first later day strictly exceeding
    that maximum (else take the last).  Success = the accepted day's
    revenue equals the global maximum.  All comparisons integer; the
    permutation keys reproduce bit-exactly in SQL."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        scaled_int,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.functions.sketch import (
        mix32,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"), columns=["ts", "value"]
    )

    def daily(batch: pa.Table) -> pa.Table:
        d = (
            batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            // 86_400_000_000
        )
        return pa.table(
            {
                "d": pa.array(d),
                "y": pa.array(scaled_int(batch["value"], 100.0)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(daily, batch_format="pyarrow", batch_size=None),
        ["d"],
        [("y", "sum", "y")],
    )
    dd = agg["d"].to_numpy(zero_copy_only=False).astype(np.int64)
    lo, hi = int(dd.min()), int(dd.max())
    n = hi - lo + 1
    ys = np.zeros(n, np.int64)
    for d, y in zip((dd - lo).tolist(), agg["y"].to_pylist()):
        ys[d] = int(y)
    best = int(ys.max())
    t_arr = np.arange(n, dtype=np.int64)
    obs = 11
    n_perms = 200
    wins = 0
    for p in range(n_perms):
        keys = mix32(t_arr, p * 7919)
        order = np.lexsort((t_arr, keys))
        perm_y = ys[order]
        thr = int(perm_y[:obs].max())
        pick = None
        for i in range(obs, n):
            if int(perm_y[i]) > thr:
                pick = int(perm_y[i])
                break
        if pick is None:
            pick = int(perm_y[n - 1])
        if pick == best:
            wins += 1
    return pa.table(
        {
            "n_perms": pa.array([n_perms], pa.int64()),
            "n_success": pa.array([wins], pa.int64()),
            "success_rate": round_like_sql(
                [float(wins) / float(n_perms)], 6
            ),
        }
    )


def _q_dist_transform(sf_dir: str) -> pa.Table:
    """Manhattan distance transform of the oracle raster's high-value
    mask, capped at 16: per-pixel exact integer min distance to the
    nearest masked pixel (brute min against the broadcast mask point
    set -- the per-tile map_batches shape at scale), histogrammed.
    The classic proximity-surface GIS operator."""
    import ray.data

    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate,
    )

    mx, my = _hough_mask_points()
    tiles = ray.data.from_arrow(_og_tiles_table())

    def dists(batch: pa.Table) -> pa.Table:
        outs = []
        for i in range(batch.num_rows):
            r0 = int(batch["row_off"][i].as_py())
            c0 = int(batch["col_off"][i].as_py())
            h = int(batch["height"][i].as_py())
            w = int(batch["width"][i].as_py())
            rr, cc = np.meshgrid(
                np.arange(r0, r0 + h), np.arange(c0, c0 + w), indexing="ij"
            )
            x = cc.ravel()[:, None]
            y = rr.ravel()[:, None]
            d = (
                np.abs(x - mx[None, :]) + np.abs(y - my[None, :])
            ).min(axis=1)
            outs.append(np.minimum(d, 16))
        dd = np.concatenate(outs)
        return pa.table(
            {
                "dist": pa.array(dd.astype(np.int64)),
                "_one": pa.array(np.ones(len(dd), np.int64)),
            }
        )

    hist = hash_aggregate(
        tiles.map_batches(dists, batch_format="pyarrow", batch_size=None),
        ["dist"],
        [("_one", "sum", "n_pixels")],
    )
    return hist.sort_by([("dist", "ascending")])


def _q_energy_distance(sf_dir: str) -> pa.Table:
    """Two-sample energy distance between click and purchase value
    cents: all three pairwise |x-y| sums are computed EXACTLY from
    one merged ordering with running opposite-label counts/sums
    (integer identity sum_pairs |a-b| = sum_e v_e*cnt_before -
    sum_before) -- no O(n^2) pair materialization -- then one pinned
    float assembly of E = 2*Sab/nm - 2*Saa/n^2 - 2*Sbb/m^2."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.rounding import (
        scaled_int,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        hash_aggregate, round_like_sql,
    )

    ds = _read_pq(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_type", "value"],
    )

    def prep(batch: pa.Table) -> pa.Table:
        et = batch["event_type"].to_numpy(zero_copy_only=False)
        m = (et == "click") | (et == "purchase")
        y = scaled_int(batch["value"], 100.0)[m]
        return pa.table(
            {
                "lab": pa.array((et[m] == "click").astype(np.int64)),
                "y": pa.array(y),
                "_one": pa.array(np.ones(int(m.sum()), np.int64)),
            }
        )

    agg = hash_aggregate(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        ["lab", "y"],
        [("_one", "sum", "c")],
    )
    lab = agg["lab"].to_numpy(zero_copy_only=False).astype(np.int64)
    yv = agg["y"].to_numpy(zero_copy_only=False).astype(np.int64)
    cv = agg["c"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((lab, yv))
    lab, yv, cv = lab[order], yv[order], cv[order]

    def pair_sum(sel_a, sel_b) -> int:
        """sum over pairs (one from a-side, one from b-side, a != b
        groups) of |ya - yb| -- exact, via running sums over the
        value-sorted distinct rows with multiplicities."""
        tot = 0
        cnt_a = cnt_b = 0
        sum_a = sum_b = 0
        for v, c, ia, ib in zip(
            yv.tolist(), cv.tolist(), sel_a.tolist(), sel_b.tolist()
        ):
            v, c = int(v), int(c)
            if ia:
                tot += c * (v * cnt_b - sum_b)
            if ib:
                tot += c * (v * cnt_a - sum_a)
            if ia:
                cnt_a += c
                sum_a += c * v
            if ib:
                cnt_b += c
                sum_b += c * v
        return tot

    is_a = lab == 1
    is_b = lab == 0
    sab = pair_sum(is_a, is_b)
    # within-sample sums: pairs within one label
    def within(sel) -> int:
        tot = 0
        cnt = 0
        ssum = 0
        for v, c, s in zip(yv.tolist(), cv.tolist(), sel.tolist()):
            if not s:
                continue
            v, c = int(v), int(c)
            tot += c * (v * cnt - ssum)
            cnt += c
            ssum += c * v
        return tot

    saa = within(is_a)
    sbb = within(is_b)
    n = int(cv[is_a].sum())
    m = int(cv[is_b].sum())
    e = (
        2.0 * float(sab) / float(n * m)
        - 2.0 * float(saa) / float(n * n)
        - 2.0 * float(sbb) / float(m * m)
    )
    return pa.table(
        {
            "n_click": pa.array([n], pa.int64()),
            "n_purchase": pa.array([m], pa.int64()),
            "energy_cents": round_like_sql([e / 100.0], 6),
        }
    )


def _q_random_projection_audit(sf_dir: str) -> pa.Table:
    """Johnson-Lindenstrauss audit: embeddings (1e4-tick quantized)
    projected to 8 dims by the deterministic mix32 +/-1 sign matrix;
    for the first 100 consecutive vec_id pairs, the original and
    projected squared distances are exact integers and the distortion
    ratio proj/8/orig is one pinned float.  Distributed tier: the
    projection is a per-batch int matmul against the broadcast sign
    matrix."""
    from tiff_to_geojson_csv_json_format_converter_ray.functions.sketch import (
        mix32,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.pipelines.relational import (
        collect_tables, round_like_sql,
    )
    from tiff_to_geojson_csv_json_format_converter_ray.stages.ann import (
        list_col_to_matrix,
    )

    d_in, d_out = 64, 8
    j = np.repeat(np.arange(d_in, dtype=np.int64), d_out)
    k = np.tile(np.arange(d_out, dtype=np.int64), d_in)
    signs = (
        1 - 2 * (mix32(j * 8 + k) % 2)
    ).reshape(d_in, d_out).astype(np.int64)

    ds = _read_pq(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )

    def proj(batch: pa.Table) -> pa.Table:
        m = list_col_to_matrix(batch["embedding"]).astype(np.float64)
        vq = round_half_away(m * 1e4).astype(np.int64)
        pj = vq @ signs
        cols = {"vec_id": batch["vec_id"]}
        for c in range(d_out):
            cols[f"p{c}"] = pa.array(pj[:, c])
        for c in range(d_in):
            cols[f"v{c}"] = pa.array(vq[:, c])
        return pa.table(cols)

    tab = collect_tables(
        ds.map_batches(proj, batch_format="pyarrow", batch_size=None)
    )
    vid = tab["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(vid)
    vq = np.stack(
        [
            tab[f"v{c}"].to_numpy(zero_copy_only=False)[order]
            for c in range(d_in)
        ],
        axis=1,
    )
    pj = np.stack(
        [
            tab[f"p{c}"].to_numpy(zero_copy_only=False)[order]
            for c in range(d_out)
        ],
        axis=1,
    )
    vid = vid[order]
    rows = []
    for i in range(100):
        a, b = 2 * i, 2 * i + 1
        dv = (vq[a] - vq[b]).astype(np.int64)
        dp = (pj[a] - pj[b]).astype(np.int64)
        od = int((dv * dv).sum())
        pd_ = int((dp * dp).sum())
        rows.append(
            (
                int(vid[a]),
                int(vid[b]),
                od,
                pd_,
                float(pd_) / 8.0 / float(od),
            )
        )
    return pa.table(
        {
            "id1": pa.array([r[0] for r in rows], pa.int64()),
            "id2": pa.array([r[1] for r in rows], pa.int64()),
            "orig_d2": pa.array([r[2] for r in rows], pa.int64()),
            "proj_d2": pa.array([r[3] for r in rows], pa.int64()),
            "ratio": round_like_sql([r[4] for r in rows], 6),
        }
    )

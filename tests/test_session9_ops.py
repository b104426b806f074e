"""Property tests for the session-9 exact-iteration operators: each
checks the algorithmic core against an independent brute-force or
closed-form reference on small random instances (seeded), independent
of the SQL-parity suite which replays the full pipelines."""

from __future__ import annotations

import math
from itertools import permutations

import numpy as np


def _bareiss_det(mat: list[list[int]]) -> int:
    """Fraction-free Bareiss determinant (mirrors the engine's
    spanning-tree kernel)."""
    n = len(mat)
    m = {(i, j): mat[i - 1][j - 1] for i in range(1, n + 1) for j in range(1, n + 1)}
    prev = 1
    for k in range(1, n):
        piv = m[(k, k)]
        if piv == 0:
            # tests only use PD matrices; guard anyway
            raise ZeroDivisionError
        new = {}
        for i in range(k + 1, n + 1):
            for j in range(k + 1, n + 1):
                new[(i, j)] = (piv * m[(i, j)] - m[(i, k)] * m[(k, j)]) // prev
        m = new
        prev = piv
    return m[(n, n)]


def test_bareiss_matches_permanent_definition():
    rng = np.random.RandomState(7)
    for _ in range(20):
        n = int(rng.randint(2, 6))
        a = rng.randint(-4, 5, size=(n, n))
        a = (a @ a.T + n * np.eye(n, dtype=np.int64)).astype(np.int64)
        # brute-force determinant by signed permutation expansion
        det = 0
        for perm in permutations(range(n)):
            inv = sum(
                1
                for x in range(n)
                for y in range(x + 1, n)
                if perm[x] > perm[y]
            )
            prod = 1
            for x in range(n):
                prod *= int(a[x, perm[x]])
            det += -prod if inv % 2 else prod
        assert _bareiss_det(a.tolist()) == det


def test_spanning_tree_count_cycle_and_complete():
    """Kirchhoff sanity: C_n has n spanning trees, K_n has n^(n-2)."""
    import sys

    sys.path.insert(0, "/root/repo")

    def count(n_nodes, edges):
        lap = [[0] * n_nodes for _ in range(n_nodes)]
        for a, b in edges:
            lap[a][b] -= 1
            lap[b][a] -= 1
            lap[a][a] += 1
            lap[b][b] += 1
        minor = [
            [lap[i][j] for j in range(1, n_nodes)]
            for i in range(1, n_nodes)
        ]
        return _bareiss_det(minor)

    for n in range(3, 7):
        cyc = [(i, (i + 1) % n) for i in range(n)]
        assert count(n, cyc) == n
        comp = [(i, j) for i in range(n) for j in range(i + 1, n)]
        assert count(n, comp) == n ** (n - 2)


def test_held_karp_matches_brute_force():
    rng = np.random.RandomState(11)
    for _ in range(10):
        k = 6
        xs = rng.randint(0, 50, size=k)
        ys = rng.randint(0, 50, size=k)
        d = [
            [abs(int(xs[i] - xs[j])) + abs(int(ys[i] - ys[j])) for j in range(k)]
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
                for nxt in range(1, k):
                    if (mask >> nxt) & 1:
                        continue
                    key = (mask | (1 << nxt), nxt)
                    cand = dp[(mask, last)] + d[last][nxt]
                    if cand < dp.get(key, inf):
                        dp[key] = cand
        full = (1 << k) - 1
        hk = min(
            dp[(full, j)] + d[j][0]
            for j in range(k)
            if (full, j) in dp
        )
        brute = min(
            sum(d[p[i]][p[i + 1]] for i in range(k - 2))
            + d[0][p[0]]
            + d[p[-1]][0]
            for p in permutations(range(1, k))
        )
        assert hk == brute


def test_huffman_total_bits_optimality_bounds():
    """Huffman code length is within [H, H+1) of the entropy bound and
    satisfies Kraft equality for the deterministic merge schedule."""
    rng = np.random.RandomState(3)
    for _ in range(10):
        k = int(rng.randint(3, 12))
        w = rng.randint(1, 100, size=k).astype(int).tolist()
        groups = {i: w[i] for i in range(k)}
        leaf_grp = {i: i for i in range(k)}
        length = {i: 0 for i in range(k)}
        while len(groups) > 1:
            order = sorted(groups.items(), key=lambda t: (t[1], t[0]))
            (g1, wa), (g2, wb) = order[0], order[1]
            ng = min(g1, g2)
            for c in range(k):
                if leaf_grp[c] in (g1, g2):
                    leaf_grp[c] = ng
                    length[c] += 1
            del groups[g1], groups[g2]
            groups[ng] = wa + wb
        total = sum(w[i] * length[i] for i in range(k))
        wsum = sum(w)
        ent = sum(
            -wi * math.log2(wi / wsum) for wi in w
        )
        assert ent <= total + 1e-9
        assert total < ent + wsum  # H <= L < H + 1 per symbol
        assert abs(sum(2.0 ** -length[i] for i in range(k)) - 1.0) < 1e-9


def test_lis_levels_match_quadratic_dp():
    rng = np.random.RandomState(5)
    for _ in range(20):
        ys = rng.randint(0, 40, size=25).astype(int).tolist()
        n = len(ys)
        # classic O(n^2) DP
        best = [1] * n
        for t in range(n):
            for s in range(t):
                if ys[s] < ys[t] and best[s] + 1 > best[t]:
                    best[t] = best[s] + 1
        # level-set formulation (engine shape)
        level = [{t for t in range(n)}]
        while True:
            prev = level[-1]
            nxt = {
                t
                for t in range(n)
                if any(s < t and ys[s] < ys[t] for s in prev)
            }
            if not nxt:
                break
            level.append(nxt)
        assert len(level) == max(best)
        assert len(level[-1]) == sum(1 for b in best if b == max(best))


def test_markov_stationary_tree_theorem_vs_power_iteration():
    rng = np.random.RandomState(9)
    for _ in range(10):
        k = 4
        c = rng.randint(1, 20, size=(k, k)).astype(int)
        r = c.sum(axis=1)
        # tree theorem (engine kernel shape)
        m = [
            [
                int(r[j] - c[j][j]) if j == kk else -int(c[j][kk])
                for kk in range(k)
            ]
            for j in range(k)
        ]

        def minor_det(i):
            idx = [j for j in range(k) if j != i]
            tot = 0
            for perm in permutations(range(k - 1)):
                inv = sum(
                    1
                    for a in range(k - 1)
                    for b in range(a + 1, k - 1)
                    if perm[a] > perm[b]
                )
                prod = 1
                for a in range(k - 1):
                    prod *= m[idx[a]][idx[perm[a]]]
                tot += -prod if inv % 2 else prod
            return tot

        s = [int(r[i]) * minor_det(i) for i in range(k)]
        pi_tree = np.array(s, dtype=np.float64)
        pi_tree /= pi_tree.sum()
        # reference: high-precision power iteration
        p = c / r[:, None]
        v = np.full(k, 1.0 / k)
        for _ in range(10_000):
            v = v @ p
        assert np.allclose(v, pi_tree, atol=1e-9)


def test_isotonic_minimax_equals_pava():
    rng = np.random.RandomState(13)
    for _ in range(20):
        ys = rng.randint(0, 100, size=15).astype(float)
        n = len(ys)
        # PAVA reference
        blocks = [[y, 1] for y in ys]
        i = 0
        while i < len(blocks) - 1:
            if blocks[i][0] / blocks[i][1] > blocks[i + 1][0] / blocks[i + 1][1]:
                blocks[i][0] += blocks[i + 1][0]
                blocks[i][1] += blocks[i + 1][1]
                del blocks[i + 1]
                i = max(0, i - 1)
            else:
                i += 1
        pava = []
        for s, c in blocks:
            pava.extend([s / c] * c)
        # minimax formulation (engine shape)
        cp = np.concatenate([[0.0], np.cumsum(ys)])
        fit = []
        for t in range(n):
            best = -np.inf
            for a in range(t + 1):
                mn = min(
                    (cp[b + 1] - cp[a]) / (b - a + 1) for b in range(t, n)
                )
                best = max(best, mn)
            fit.append(best)
        assert np.allclose(fit, pava, atol=1e-9)

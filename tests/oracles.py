"""Pure-Python/numpy oracles mirroring the reference verifiers
(/root/reference/test/verifiers/): cc_verifier.cpp, tc_verifier.cpp, and a
numpy Jacobi PageRank matching apps/pagerank.gt exactly."""

from __future__ import annotations

import numpy as np


def squish(edges):
    """GAPBS SquishGraph semantics: drop self loops, dedup (builder.h:147-149)."""
    return sorted({(s, d) for s, d in edges if s != d})


def num_vertices(edges):
    """GAPBS FindMaxNodeID(el)+1 on the RAW edge list (builder.h:210-211) —
    computed BEFORE squish, so a vertex appearing only in a self-loop still
    exists in the universe."""
    return max(max(s, d) for s, d in edges) + 1 if edges else 0


def pagerank_oracle(edges, damp=0.85, iters=20):
    """Dense Jacobi iteration matching apps/pagerank.gt:13-27 (no dangling
    redistribution). edges: raw (pre-squish) pairs."""
    es = squish(edges)
    n = num_vertices(edges)
    out_deg = np.zeros(n, dtype=np.int64)
    for s, _ in es:
        out_deg[s] += 1
    rank = np.full(n, 1.0 / n)
    beta = (1.0 - damp) / n
    for _ in range(iters):
        contrib = np.where(out_deg > 0, rank / np.maximum(out_deg, 1), 0.0)
        new = np.zeros(n)
        for s, d in es:
            new[d] += contrib[s]
        rank = beta + damp * new
    return rank


def cc_oracle(edges):
    """Union-find over the symmetrized squished graph; component label =
    min vertex id in the component (cc.gt fixpoint; cc_verifier.cpp)."""
    es = squish(edges)
    n = num_vertices(edges)
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in es:
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[max(rs, rd)] = min(rs, rd)
    # normalize: label = min id in component
    comp = {}
    labels = np.zeros(n, dtype=np.int64)
    for v in range(n):
        r = find(v)
        if r not in comp:
            comp[r] = r  # roots are minimal by union rule (min wins)
        labels[v] = comp[r]
    return labels


def lpa_oracle(edges, rounds=5):
    """Synchronous mode-label propagation, min tie-break, over the
    symmetrized squished graph. Vertices w/o neighbors keep their label."""
    es = squish(edges)
    n = num_vertices(edges)
    nbrs = [set() for _ in range(n)]
    for s, d in es:
        nbrs[s].add(d)
        nbrs[d].add(s)
    labels = list(range(n))
    for _ in range(rounds):
        new = list(labels)
        for v in range(n):
            if not nbrs[v]:
                continue
            counts = {}
            for u in nbrs[v]:
                counts[labels[u]] = counts.get(labels[u], 0) + 1
            best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        labels = new
    return np.array(labels, dtype=np.int64)


def triangle_oracle(edges):
    """Brute-force triangle count on the symmetrized squished simple graph
    (tc_verifier.cpp:13-32: closed-triple count / 6 == oriented count)."""
    es = squish(edges)
    n = num_vertices(edges)
    nbrs = [set() for _ in range(n)]
    for s, d in es:
        nbrs[s].add(d)
        nbrs[d].add(s)
    count = 0
    for v in range(n):
        for u in nbrs[v]:
            if u > v:
                count += len(nbrs[v] & nbrs[u] & set(range(u + 1, n)))
    # count only triples v<u<w
    return count


def bfs_oracle(edges, source=0):
    """Hop distances on the DIRECTED squished graph; -1 = unreachable."""
    from collections import deque

    es = squish(edges)
    n = num_vertices(edges)
    adj = [[] for _ in range(n)]
    for s, d in es:
        adj[s].append(d)
    dist = [-1] * n
    dist[source] = 0
    q = deque([source])
    while q:
        v = q.popleft()
        for u in adj[v]:
            if dist[u] == -1:
                dist[u] = dist[v] + 1
                q.append(u)
    return np.array(dist, dtype=np.int64)


def sssp_oracle(weighted_edges, source=0):
    """Bellman-Ford on directed weighted edges (first-wins dedup NOT
    applied — caller must pre-dedup consistently); -1 = unreachable."""
    # squish keeping min weight per (s,d) to be deterministic
    best = {}
    for s, d, w in weighted_edges:
        if s == d:
            continue
        k = (s, d)
        if k not in best or w < best[k]:
            best[k] = w
    n = max(max(s, d) for s, d in best) + 1
    INF = float("inf")
    dist = [INF] * n
    dist[source] = 0
    for _ in range(n):
        changed = False
        for (s, d), w in best.items():
            if dist[s] + w < dist[d]:
                dist[d] = dist[s] + w
                changed = True
        if not changed:
            break
    return np.array([-1 if x == INF else int(x) for x in dist], dtype=np.int64)


def bc_oracle(edges, source=0):
    """Single-source Brandes dependency accumulation (unweighted,
    directed squished graph) — reference apps/bc.gt semantics."""
    from collections import deque

    es = squish(edges)
    n = num_vertices(edges)
    adj = [[] for _ in range(n)]
    for s, d in es:
        adj[s].append(d)
    sigma = [0.0] * n
    dist = [-1] * n
    sigma[source] = 1.0
    dist[source] = 0
    order = []
    q = deque([source])
    while q:
        v = q.popleft()
        order.append(v)
        for u in adj[v]:
            if dist[u] == -1:
                dist[u] = dist[v] + 1
                q.append(u)
            if dist[u] == dist[v] + 1:
                sigma[u] += sigma[v]
    delta = [0.0] * n
    for v in reversed(order):
        for u in adj[v]:
            if dist[u] == dist[v] + 1:
                delta[v] += sigma[v] / sigma[u] * (1.0 + delta[u])
    delta[source] = 0.0
    return np.array(delta)


def eigenvector_oracle(edges, rounds=9):
    """Un-normalized power iteration matching
    test/input/eigenvector_centrality.gt (init 1/n, ec'[dst] = Σ ec[src])."""
    es = squish(edges)
    n = num_vertices(edges)
    ec = np.full(n, 1.0 / n)
    for _ in range(rounds):
        new = np.zeros(n)
        for s, d in es:
            new[d] += ec[s]
        ec = new
    return ec


def katz_oracle(edges, alpha=0.1, beta=1.0, rounds=6):
    """Fixed-round Katz recurrence matching
    kernels/centrality.py::katz_centrality (init beta,
    katz'[dst] = alpha * Σ katz[src] + beta)."""
    es = squish(edges)
    n = num_vertices(edges)
    katz = np.full(n, float(beta))
    for _ in range(rounds):
        new = np.zeros(n)
        for s, d in es:
            new[d] += katz[s]
        katz = alpha * new + beta
    return katz


def closeness_oracle(weighted_edges, source=0):
    """SSSP distances with unreached -> 0
    (apps/closeness_centrality_weighted.gt final_vertex_f)."""
    d = sssp_oracle(weighted_edges, source)
    return np.where(d < 0, 0, d)


def cf_oracle(weighted_edges, iters=10, k=20, step=0.00000035, lam=0.001):
    """numpy twin of apps/cf.gt synchronous GD (min-weight dedup like
    LinkGraph weighted squish)."""
    best = {}
    for s, d, w in weighted_edges:
        if s == d:
            continue
        kk = (s, d)
        if kk not in best or w < best[kk]:
            best[kk] = w
    n = max(max(s, d) for s, d in best) + 1
    lat = np.full((n, k), 0.5)
    for _ in range(iters):
        err_v = np.zeros((n, k))
        for (s, d), w in best.items():
            est = float(lat[s] @ lat[d])
            err = w - est
            err_v[d] += lat[s] * err
        lat = lat + step * (-lam * lat + err_v)
    return lat


def msf_oracle(weighted_edges):
    """Kruskal under the strict total order (w, u, v) on canonical
    undirected edges — the unique MSF for that order (reference intrinsic:
    serialMinimumSpanningTree, infra_gapbs/minimum_spanning_tree.h:22)."""
    canon = {}
    for s, d, w in weighted_edges:
        if s == d:
            continue
        u, v = (s, d) if s < d else (d, s)
        if (u, v) not in canon or w < canon[(u, v)]:
            canon[(u, v)] = w
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    forest = set()
    for (u, v), w in sorted(canon.items(), key=lambda kv: (kv[1], kv[0])):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
            forest.add((u, v, w))
    return forest


def prim_total_weight(weighted_edges, start):
    """Reference-style lazy Prim (minimum_spanning_tree.h:22-52) from
    `start`; returns the tree's total weight over start's component."""
    import heapq

    adj = {}
    for s, d, w in weighted_edges:
        if s == d:
            continue
        adj.setdefault(s, []).append((w, d))
        adj.setdefault(d, []).append((w, s))
    seen = {start}
    heap = list(adj.get(start, []))
    heapq.heapify(heap)
    total = 0
    while heap:
        w, v = heapq.heappop(heap)
        if v in seen:
            continue
        seen.add(v)
        total += w
        for wn in adj.get(v, []):
            if wn[1] not in seen:
                heapq.heappush(heap, wn)
    return total


def set_cover_oracle(edges, epsilon=0.01):
    """Pure-Python mirror of the Julienne bucketed greedy MaxCover
    (test/input_with_schedules/set_cover_extern.cpp:25-75)."""
    import math

    sets = {}
    for s, d in squish(edges):
        sets.setdefault(s, set()).add(d)
    x = 1.0 / math.log1p(epsilon)
    covered = set()
    out = []
    rounds = 0
    while True:
        rounds += 1
        rdeg = {s: len(elms - covered) for s, elms in sets.items()}
        rdeg = {s: d for s, d in rdeg.items() if d > 0}
        if not rdeg:
            break
        p = max(int(math.floor(x * math.log(d))) for d in rdeg.values())
        threshold = math.ceil((1.0 + epsilon) ** p)
        low = max(math.ceil((1.0 + epsilon) ** (p - 1)), 1)
        active = sorted(s for s, d in rdeg.items() if d >= threshold)
        winner = {}
        for s in active:
            for e in sets[s] - covered:
                if e not in winner or s < winner[e]:
                    winner[e] = s
        wins = {}
        for e, s in winner.items():
            wins[s] = wins.get(s, 0) + 1
        admitted = sorted(s for s, n in wins.items() if n >= low)
        if not admitted:
            break
        for s in admitted:
            out.append((s, rounds))
        covered |= {e for e, s in winner.items() if s in set(admitted)}
    return out


def coreness_oracle(edges):
    """Textbook peeling on the symmetrized squished graph — mirrors the
    reference's bucket-queue semantics (apps/k_core.gt)."""
    und = {(min(s, d), max(s, d)) for s, d in squish(edges)}
    und |= {(b, a) for a, b in und}
    n = num_vertices(edges)
    adj = {v: set() for v in range(n)}
    for a, b in und:
        adj[a].add(b)
    deg = {v: len(adj[v]) for v in range(n)}
    core = {}
    remaining = set(range(n))
    while remaining:
        k = min(deg[v] for v in remaining)
        while True:
            bucket = [v for v in remaining if deg[v] <= k]
            if not bucket:
                break
            for v in bucket:
                core[v] = k
                remaining.discard(v)
            for v in bucket:
                for u in adj[v]:
                    if u in remaining:
                        deg[u] -= 1
    return core


def random_walks_oracle(edges, walk_len, seed=0):
    """Pure-Python mirror of kernels/walks.py::random_walks: seeded
    md5-prefix draw over the sorted out-adjacency (the reference's
    getRandomOutNgh made deterministic)."""
    import hashlib

    adj = {}
    for s, d in squish(edges):
        adj.setdefault(s, []).append(d)
    for s in adj:
        adj[s].sort()
    out = []
    for start in range(num_vertices(edges)):
        v = start
        out.append((start, 0, v))
        for t in range(1, walk_len + 1):
            nbrs = adj.get(v)
            if not nbrs:
                break
            h = int(
                hashlib.md5(f"{start}_{t}_{seed}".encode()).hexdigest()[:8],
                16,
            )
            v = nbrs[h % len(nbrs)]
            out.append((start, t, v))
    return sorted(out)


def sweep_cut_oracle(edges, vals):
    """Direct transliteration of serialSweepCut (intrinsics.h:358-410)
    over the squished directed graph; `vals` maps subset ids to scores.
    Ties sort (val desc, id asc) — the engine's fixed total order."""
    adj = {}
    for s, d in squish(edges):
        adj.setdefault(s, []).append(d)
    m = sum(len(v) for v in adj.values())
    order = sorted(vals, key=lambda v: (-vals[v], v))
    S, vol, crossing = set(), 0, 0
    best_cond, best_cut = float("inf"), -1
    for i, v in enumerate(order):
        S.add(v)
        vol += len(adj.get(v, []))
        denom = min(vol, m - vol)
        for w in adj.get(v, []):
            crossing += -1 if w in S else 1
        cond = 1.0 if (crossing == 0 or denom == 0) else crossing / denom
        if cond < best_cond:
            best_cond, best_cut = cond, i
    return sorted(order[:best_cut]), best_cond


def weighted_random_walks_oracle(edges, walk_len, seed=0):
    """Mirror of kernels/walks.py::weighted_random_walks — the
    inverse-CDF draw over the (min-weight-deduped) out-adjacency."""
    import hashlib

    best = {}
    for s, d, w in edges:
        if s != d:
            key = (s, d)
            best[key] = min(best.get(key, w), w)
    adj = {}
    for (s, d), w in best.items():
        adj.setdefault(s, []).append((d, w))
    for s in adj:
        adj[s].sort()
    n = max(max(s, d) for s, d, _ in edges) + 1 if edges else 0
    out = []
    for start in range(n):
        v = start
        out.append((start, 0, v))
        for t in range(1, walk_len + 1):
            nbrs = adj.get(v)
            if not nbrs:
                break
            tw = sum(w for _, w in nbrs)
            target = int(
                hashlib.md5(f"{start}_{t}_{seed}".encode()).hexdigest()[:8],
                16,
            ) % tw
            cum = 0
            for d, w in nbrs:
                cum += w
                if cum > target:
                    v = d
                    break
            out.append((start, t, v))
    return sorted(out)


def node2vec_walks_oracle(edges, walk_len, p=4.0, q=0.25, seed=0):
    """Mirror of kernels/walks.py::node2vec_walks — uniform first hop,
    then the 1/p (return) / 1 (neighbor-of-prev) / 1/q (explore)
    inverse-CDF draw over dst-ascending out-edges."""
    import hashlib

    sq = squish(edges)
    adj = {}
    for s, d in sq:
        adj.setdefault(s, []).append(d)
    for s in adj:
        adj[s].sort()
    eset = set(sq)
    prec = (1 << 31) - 1
    out = []
    for start in range(num_vertices(edges)):
        v = start
        out.append((start, 0, v))
        nbrs = adj.get(v)
        if not nbrs:
            continue
        h = int(hashlib.md5(f"{start}_1_{seed}".encode()).hexdigest()[:8], 16)
        prev, v = v, nbrs[h % len(nbrs)]
        out.append((start, 1, v))
        for t in range(2, walk_len + 1):
            nbrs = adj.get(v)
            if not nbrs:
                break
            biases = [
                1.0 / p if d == prev
                else (1.0 if (prev, d) in eset else 1.0 / q)
                for d in nbrs
            ]
            tot = 0.0
            for b in biases:
                tot += b
            h = int(
                hashlib.md5(f"{start}_{t}_{seed}".encode()).hexdigest()[:8],
                16,
            )
            target = (h % prec) / float(prec) * tot
            cum, pick = 0.0, None
            for d, b in zip(nbrs, biases):
                cum += b
                if cum > target:
                    pick = d
                    break
            prev, v = v, pick
            out.append((start, t, v))
    return sorted(out)


def alias_walks_oracle(edges, walk_len, seed=0):
    """Mirror of kernels/walks.py::random_walks_alias — identical Vose
    construction (sorted dsts, in-order stack draining) and the
    slot/accept double-hash draw."""
    import hashlib

    best = {}
    weighted = edges and len(edges[0]) == 3
    for e in edges:
        s, d = e[0], e[1]
        w = e[2] if weighted else 1
        if s != d:
            best[(s, d)] = min(best.get((s, d), w), w)
    adj = {}
    for (s, d), w in best.items():
        adj.setdefault(s, []).append((d, w))
    prec = (1 << 31) - 1
    tables = {}
    for s, lst in adj.items():
        lst.sort()
        dsts = [d for d, _ in lst]
        ws = [w for _, w in lst]
        n = len(dsts)
        total = float(sum(ws))
        scaled = [w * n / total for w in ws]
        import heapq

        small = [i for i in range(n) if scaled[i] < 1.0]
        large = [i for i in range(n) if scaled[i] >= 1.0]
        heapq.heapify(small)
        heapq.heapify(large)
        prob = [1.0] * n
        alias = list(range(n))
        while small and large:
            sm = heapq.heappop(small)
            lg = large[0]
            prob[sm] = scaled[sm]
            alias[sm] = lg
            scaled[lg] = (scaled[lg] + scaled[sm]) - 1.0
            if scaled[lg] < 1.0:
                heapq.heappop(large)
                heapq.heappush(small, lg)
        tables[s] = (dsts, prob, alias)
    nv = max(max(e[0], e[1]) for e in edges) + 1 if edges else 0

    def h(sfx, w, t):
        return int(
            hashlib.md5(f"{w}{sfx}_{t}_{seed}".encode()).hexdigest()[:8], 16
        )

    out = []
    for start in range(nv):
        v = start
        out.append((start, 0, v))
        for t in range(1, walk_len + 1):
            tab = tables.get(v)
            if tab is None:
                break
            dsts, prob, alias = tab
            slot = h("i", start, t) % len(dsts)
            u = (h("u", start, t) % prec) / float(prec)
            v = dsts[slot] if u < prob[slot] else dsts[alias[slot]]
            out.append((start, t, v))
    return sorted(out)


def node2vec_alias_walks_oracle(edges, walk_len, p=4.0, q=0.25, seed=0):
    """Mirror of kernels/walks.py::node2vec_walks_alias — uniform first
    hop, then per-(prev, cur) Vose alias blocks (min-index pairing,
    dst-ascending slots) with the slot/accept double-hash draw."""
    import hashlib
    import heapq

    sq = squish(edges)
    adj = {}
    for s, d in sq:
        adj.setdefault(s, []).append(d)
    for s in adj:
        adj[s].sort()
    eset = set(sq)
    prec = (1 << 31) - 1

    def table(prev, cur):
        nbrs = adj.get(cur)
        if not nbrs:
            return None
        ws = [
            1.0 / p if d == prev
            else (1.0 if (prev, d) in eset else 1.0 / q)
            for d in nbrs
        ]
        n = len(nbrs)
        total = float(sum(ws))
        scaled = [w * n / total for w in ws]
        small = [i for i in range(n) if scaled[i] < 1.0]
        large = [i for i in range(n) if scaled[i] >= 1.0]
        heapq.heapify(small)
        heapq.heapify(large)
        prob = [1.0] * n
        alias = list(range(n))
        while small and large:
            sm = heapq.heappop(small)
            lg = large[0]
            prob[sm] = scaled[sm]
            alias[sm] = lg
            scaled[lg] = (scaled[lg] + scaled[sm]) - 1.0
            if scaled[lg] < 1.0:
                heapq.heappop(large)
                heapq.heappush(small, lg)
        return nbrs, prob, alias

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    out = []
    for start in range(num_vertices(edges)):
        v = start
        out.append((start, 0, v))
        nbrs = adj.get(v)
        if not nbrs:
            continue
        prev, v = v, nbrs[h(f"{start}_1_{seed}") % len(nbrs)]
        out.append((start, 1, v))
        for t in range(2, walk_len + 1):
            tab = table(prev, v)
            if tab is None:
                break
            dsts, prob, alias = tab
            slot = h(f"{start}i_{t}_{seed}") % len(dsts)
            u = (h(f"{start}u_{t}_{seed}") % prec) / float(prec)
            nxt = dsts[slot] if u < prob[slot] else dsts[alias[slot]]
            prev, v = v, nxt
            out.append((start, t, v))
    return sorted(out)


def scc_oracle(edges):
    """Iterative Tarjan over the squished directed graph; label = min
    vertex id in the SCC — an algorithmically independent check of the
    kernel's FW-BW peel (and of the DuckDB closure twin)."""
    es = squish(edges)
    n = num_vertices(edges)
    adj = [[] for _ in range(n)]
    for s, d in es:
        adj[s].append(d)
    index = [None] * n
    low = [0] * n
    on_stack = [False] * n
    stack = []
    labels = [0] * n
    counter = [0]

    def strongconnect(root):
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack[v] = True
            recurse = False
            for i in range(pi, len(adj[v])):
                w = adj[v][i]
                if index[w] is None:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                if on_stack[w]:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            work.pop()
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on_stack[w] = False
                    comp.append(w)
                    if w == v:
                        break
                m = min(comp)
                for w in comp:
                    labels[w] = m
            if work:
                pv = work[-1][0]
                low[pv] = min(low[pv], low[v])

    for v in range(n):
        if index[v] is None:
            strongconnect(v)
    return labels


def truss_oracle(edges, k):
    """Naive set-based triangle-support peel to fixpoint; returns
    {(u, v): support} for the k-truss of the symmetrized simple graph
    (u < v, support measured at the fixpoint)."""
    es = squish(edges)
    cur = {(min(s, d), max(s, d)) for s, d in es}
    while True:
        adj = {}
        for a, b in cur:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        sup = {
            (a, b): len(adj[a] & adj[b]) for a, b in cur
        }
        keep = {e for e in cur if sup[e] >= k - 2}
        if keep == cur:
            return sup
        cur = keep


def influence_max_oracle(edges, k=5, p=0.05):
    """Serial degree-discount greedy (Chen/Wang/Yang KDD'09) over the
    squished symmetrized graph; ties break toward the smaller id.
    Returns [(seed, round, dd)] with dd rounded to 6."""
    sym = set()
    for s, d in squish(edges):
        sym.add((s, d))
        sym.add((d, s))
    n = num_vertices(edges)
    adj = {v: set() for v in range(n)}
    for s, d in sym:
        adj.setdefault(s, set()).add(d)
    deg = {v: len(adj.get(v, ())) for v in range(n)}
    t = {v: 0 for v in range(n)}
    chosen, out = set(), []
    for r in range(1, k + 1):
        best = None
        for v in range(n):
            if v in chosen:
                continue
            dd = deg[v] - 2 * t[v] - (deg[v] - t[v]) * t[v] * p
            if best is None or dd > best[0] or (dd == best[0] and v < best[1]):
                best = (dd, v)
        if best is None:
            break
        dd, v = best
        chosen.add(v)
        out.append((v, r, round(dd, 6)))
        for u in adj.get(v, ()):
            t[u] += 1
    return out

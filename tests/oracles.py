"""Sequential CPU reference implementations for algorithm tests.

The same role as the in-test oracles the reference uses
(``cpp/tests/link_analysis/pagerank_test.cpp:43-120`` pagerank_reference;
``weakly_connected_components_test.cpp:40`` + bijective canonicalization
:178-190).  Pure numpy / python, deliberately naive.
"""

from __future__ import annotations

import numpy as np


def ref_pagerank(edges, V, alpha=0.85, tol=1e-6, max_iter=100,
                 personalization=None, nstart=None):
    """edges: (src, dst, w) arrays. Mirrors pagerank_impl.cuh semantics."""
    src, dst, w = (np.asarray(e) for e in edges)
    out_wsum = np.zeros(V)
    np.add.at(out_wsum, src, w)
    pr = np.full(V, 1.0 / V) if nstart is None else np.asarray(nstart, float)
    if nstart is not None:
        pr = pr / pr.sum()
    pers = None
    if personalization is not None:
        pers = np.zeros(V)
        for k, v in personalization.items():
            pers[k] = v
        pers = pers / pers.sum()
    dangling = out_wsum == 0
    for _ in range(max_iter):
        dangling_sum = pr[dangling].sum()
        if pers is None:
            unvarying = np.full(V, (alpha * dangling_sum + (1 - alpha)) / V)
        else:
            unvarying = (alpha * dangling_sum + (1 - alpha)) * pers
        contrib = np.where(out_wsum > 0, pr / np.where(out_wsum > 0, out_wsum, 1), 0.0)
        gather = np.zeros(V)
        np.add.at(gather, dst, contrib[src] * w)
        pr_new = unvarying + alpha * gather
        l1 = np.abs(pr_new - pr).sum()
        pr = pr_new
        if l1 < tol:
            return pr
    raise RuntimeError("oracle pagerank did not converge")


def ref_wcc(edges, V):
    """Union-find; labels canonicalized to min vertex id per component."""
    parent = np.arange(V)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    src, dst = np.asarray(edges[0]), np.asarray(edges[1])
    for u, v in zip(src, dst):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return np.array([find(v) for v in range(V)])


def ref_lpa(edges, V, max_iter=30):
    """Synchronous weighted-majority LPA, min-label ties (engine contract)."""
    src, dst, w = (np.asarray(e) for e in edges)
    labels = np.arange(V)
    for _ in range(max_iter):
        votes = [dict() for _ in range(V)]
        for u, v, wt in zip(src, dst, w):
            lab = labels[u]
            votes[v][lab] = votes[v].get(lab, 0.0) + wt
        new = labels.copy()
        for v in range(V):
            if votes[v]:
                best = max(votes[v].items(), key=lambda kv: (kv[1], -kv[0]))
                new[v] = best[0]
        if (new == labels).all():
            return new
        labels = new
    return labels


def ref_triangles(edges, V):
    """Exact per-vertex triangle counts over an undirected simple graph.

    edges: symmetrized (both directions present), no self loops.
    """
    adj = [set() for _ in range(V)]
    for u, v in zip(np.asarray(edges[0]), np.asarray(edges[1])):
        if u != v:
            adj[u].add(int(v))
    counts = np.zeros(V, dtype=np.int64)
    for v in range(V):
        nbrs = sorted(adj[v])
        for i in range(len(nbrs)):
            for j in range(i + 1, len(nbrs)):
                if nbrs[j] in adj[nbrs[i]]:
                    counts[v] += 1
    return counts


def canonical_map_equal(a: np.ndarray, b: np.ndarray) -> bool:
    """Labels equal up to bijection (weakly_connected_components_test.cpp:178-190)."""
    a, b = np.asarray(a), np.asarray(b)
    if a.shape != b.shape:
        return False
    fwd, bwd = {}, {}
    for x, y in zip(a.tolist(), b.tolist()):
        if fwd.setdefault(x, y) != y:
            return False
        if bwd.setdefault(y, x) != x:
            return False
    return True


def ref_scc(edges, V):
    """Canonical SCC labels (min member id) via iterative Kosaraju."""
    src = np.asarray(edges[0], dtype=np.int64)
    dst = np.asarray(edges[1], dtype=np.int64)
    fwd = [[] for _ in range(V)]
    bwd = [[] for _ in range(V)]
    for u, v in zip(src.tolist(), dst.tolist()):
        fwd[u].append(v)
        bwd[v].append(u)
    # pass 1: finish order on the forward graph (iterative DFS)
    seen = np.zeros(V, dtype=bool)
    order = []
    for s in range(V):
        if seen[s]:
            continue
        stack = [(s, 0)]
        seen[s] = True
        while stack:
            v, i = stack.pop()
            if i < len(fwd[v]):
                stack.append((v, i + 1))
                w = fwd[v][i]
                if not seen[w]:
                    seen[w] = True
                    stack.append((w, 0))
            else:
                order.append(v)
    # pass 2: reverse-graph DFS in reverse finish order
    comp = np.full(V, -1, dtype=np.int64)
    for s in reversed(order):
        if comp[s] != -1:
            continue
        members = [s]
        comp[s] = s
        stack = [s]
        while stack:
            v = stack.pop()
            for w in bwd[v]:
                if comp[w] == -1:
                    comp[w] = s
                    members.append(w)
                    stack.append(w)
        m = min(members)
        for v in members:
            comp[v] = m
    return comp


def ref_betweenness(edges, V, sources=None):
    """Exact Brandes dependency sums (unweighted), endpoints excluded —
    unnormalized Σ_{s∈sources} δ_s(v)."""
    import collections

    src = np.asarray(edges[0], dtype=np.int64)
    dst = np.asarray(edges[1], dtype=np.int64)
    adj = [[] for _ in range(V)]
    for u, v in zip(src.tolist(), dst.tolist()):
        adj[u].append(v)
    bc = np.zeros(V)
    for s in (range(V) if sources is None else sources):
        sigma = np.zeros(V)
        dist = np.full(V, -1, dtype=np.int64)
        sigma[s] = 1.0
        dist[s] = 0
        order = []
        q = collections.deque([s])
        while q:
            v = q.popleft()
            order.append(v)
            for w in adj[v]:
                if dist[w] == -1:
                    dist[w] = dist[v] + 1
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
        delta = np.zeros(V)
        for w in reversed(order):
            for x in adj[w]:
                if dist[x] == dist[w] + 1:
                    delta[w] += sigma[w] / sigma[x] * (1.0 + delta[x])
            if w != s:
                bc[w] += delta[w]
    return bc


def ref_edge_betweenness(edges, V, sources=None):
    """Exact Brandes edge dependencies over the stored (directed) edge list:
    ebc[(u,v)] = Σ_s σ_s(u)/σ_s(v)·(1+δ_s(v)) over DAG edges."""
    import collections

    src = np.asarray(edges[0], dtype=np.int64)
    dst = np.asarray(edges[1], dtype=np.int64)
    adj = [[] for _ in range(V)]
    for u, v in zip(src.tolist(), dst.tolist()):
        adj[u].append(v)
    ebc = collections.defaultdict(float)
    for s in (range(V) if sources is None else sources):
        sigma = np.zeros(V)
        dist = np.full(V, -1, dtype=np.int64)
        sigma[s] = 1.0
        dist[s] = 0
        order = []
        q = collections.deque([s])
        while q:
            v = q.popleft()
            order.append(v)
            for w in adj[v]:
                if dist[w] == -1:
                    dist[w] = dist[v] + 1
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
        delta = np.zeros(V)
        for w in reversed(order):
            for x in adj[w]:
                if dist[x] == dist[w] + 1:
                    c = sigma[w] / sigma[x] * (1.0 + delta[x])
                    ebc[(w, x)] += c
                    delta[w] += c
    return ebc

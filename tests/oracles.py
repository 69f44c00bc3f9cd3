"""Pure-NumPy golden oracles (FIXTURES.md §4) — independent of raylink."""

import numpy as np


def pr_oracle(n, edges, alpha=0.85, iters=None, eps=None, max_iters=500):
    """Dense power iteration matching the reference update rule exactly:
    rank = alpha * sum(in) + (1-alpha)/n, no dangling redistribution."""
    src, dst = edges[:, 0], edges[:, 1]
    outdeg = np.bincount(src, minlength=n)
    rank = np.full(n, 1.0 / n)
    it = 0
    while True:
        contrib = np.zeros(n)
        w = rank[src] / outdeg[src]
        np.add.at(contrib, dst, w)
        new = alpha * contrib + (1 - alpha) / n
        delta = np.abs(new - rank).max()
        rank = new
        it += 1
        if iters is not None and it >= iters:
            break
        if eps is not None and delta <= eps:
            break
        if it >= max_iters:
            break
    return rank


def cc_oracle(n, edges):
    """Union-find; label = min vid of component."""
    parent = np.arange(n)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in edges:
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[max(rs, rd)] = min(rs, rd)
    return np.array([find(i) for i in range(n)])


def bfs_oracle(n, edges, source):
    """Undirected hop distances; -1 unreachable."""
    adj = [[] for _ in range(n)]
    for s, d in edges:
        adj[s].append(d)
        adj[d].append(s)
    dist = np.full(n, -1, dtype=np.int64)
    dist[source] = 0
    frontier = [source]
    while frontier:
        nxt = []
        for v in frontier:
            for w in adj[v]:
                if dist[w] < 0:
                    dist[w] = dist[v] + 1
                    nxt.append(w)
        frontier = nxt
    return dist


def triangle_oracle(n, edges):
    """Brute force over adjacency sets (undirected simple graph)."""
    nbrs = [set() for _ in range(n)]
    for s, d in edges:
        if s != d:
            nbrs[s].add(d)
            nbrs[d].add(s)
    count = 0
    for a in range(n):
        for b in nbrs[a]:
            if b <= a:
                continue
            count += sum(1 for c in (nbrs[a] & nbrs[b]) if c > b)
    return count


def kcore_oracle(n, edges, k):
    """Peeling; returns boolean membership in the k-core."""
    nbrs = [set() for _ in range(n)]
    for s, d in edges:
        if s != d:
            nbrs[s].add(d)
            nbrs[d].add(s)
    alive = np.ones(n, dtype=bool)
    changed = True
    while changed:
        changed = False
        for v in range(n):
            if alive[v] and sum(1 for w in nbrs[v] if alive[w]) < k:
                alive[v] = False
                changed = True
    return alive


def scc_oracle(n, edges):
    """scc_id(v) = MAX vid of v's strongly connected component (matches
    algos.scc's root-id convention), via boolean-closure matrix squaring."""
    import numpy as np

    A = np.eye(n, dtype=bool)
    for s, d in edges:
        A[int(s), int(d)] = True
    for _ in range(max(1, int(np.ceil(np.log2(max(n, 2)))))):
        A = A | (A @ A)
    mutual = A & A.T
    return np.array([np.flatnonzero(mutual[v]).max() for v in range(n)],
                    dtype=np.int64)


def betweenness_oracle(n, edges, seeds):
    """Brandes betweenness from a seed sample (directed, unweighted):
    bc(v) = sum over seeds s of delta_s(v), v != s."""
    import collections

    import numpy as np

    adj = [[] for _ in range(n)]
    for s, d in edges:
        adj[int(s)].append(int(d))
    bc = np.zeros(n, dtype=np.float64)
    for s in seeds:
        dist = np.full(n, -1, dtype=np.int64)
        sigma = np.zeros(n, dtype=np.float64)
        dist[s], sigma[s] = 0, 1.0
        order = [s]
        q = collections.deque([s])
        while q:
            u = q.popleft()
            for w in adj[u]:
                if dist[w] < 0:
                    dist[w] = dist[u] + 1
                    q.append(w)
                    order.append(w)
                if dist[w] == dist[u] + 1:
                    sigma[w] += sigma[u]
        delta = np.zeros(n, dtype=np.float64)
        for w in reversed(order):
            for x in adj[w]:
                if dist[x] == dist[w] + 1:
                    delta[w] += sigma[w] / sigma[x] * (1.0 + delta[x])
            if w != s:
                bc[w] += delta[w]
    return bc


def four_cycle_oracle(n, edges):
    """Brute 4-cycle count: C4 = 1/2 * sum over u<w of C(common_nbrs, 2)
    on the undirected simple graph."""
    import numpy as np

    A = np.zeros((n, n), dtype=bool)
    for s, d in edges:
        if s != d:
            A[int(s), int(d)] = A[int(d), int(s)] = True
    total = 0
    for u in range(n):
        for w in range(u + 1, n):
            k = int((A[u] & A[w]).sum())
            total += k * (k - 1) // 2
    assert total % 2 == 0
    return total // 2

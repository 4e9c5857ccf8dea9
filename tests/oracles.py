"""Driver-side reference implementations (NumPy / union-find) used as
test oracles. Independent of the Spark code paths by construction.

pagerank_delta_numpy is a straight-line transcription of the Rust at
/root/reference/src/algos.rs:169-295 including its quirks (SURVEY
§2.5) — it is the parity pin for kernels/pagerank_delta.py.
"""

from __future__ import annotations

import numpy as np


def _degrees(n: int, src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    out_deg = np.zeros(n, dtype=np.int64)
    np.add.at(out_deg, src, 1)
    return out_deg


def pagerank_numpy(
    n: int,
    src: np.ndarray,
    dst: np.ndarray,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 200,
) -> tuple[np.ndarray, int]:
    """Power iteration + dangling-mass redistribution — must mirror
    kernels/pagerank.py update-for-update."""
    out_deg = _degrees(n, src, dst)
    rank = np.full(n, 1.0 / n)
    iterations = 0
    for _ in range(max_iter):
        contrib = np.zeros(n)
        w = rank[src] / out_deg[src]
        np.add.at(contrib, dst, w)
        dm = rank[out_deg == 0].sum()
        new = (1.0 - damping) / n + damping * (contrib + dm / n)
        diff = np.abs(new - rank).max()
        rank = new
        iterations += 1
        if diff < tol:
            break
    return rank, iterations


def pagerank_delta_numpy(
    n: int, src: np.ndarray, dst: np.ndarray, max_iterations: int = 20
) -> np.ndarray:
    """Straight-line transcription of algos.rs:169-295 (quirks intact)."""
    damping, tolerance, thresh, alpha = 0.85, 1e-7, 1e-2, 0.15
    out_deg = _degrees(n, src, dst).astype(float)
    deltas = np.full(n, 1.0 / n)
    page_rank = np.zeros(n)
    one_over_n = 1.0 / n

    def scatter(frontier_mask: np.ndarray) -> np.ndarray:
        gathered = np.zeros(n)
        m = frontier_mask[src]
        np.add.at(gathered, dst[m], deltas[src[m]] / out_deg[src[m]])
        return gathered

    # round 0: full frontier scatter + FirstRound apply (algos.rs:277-278)
    gathered = scatter(np.ones(n, dtype=bool))
    delta = gathered * damping + alpha
    page_rank += delta
    delta = delta - one_over_n
    deltas = delta.copy()
    sum_of_delta = delta.sum()
    active = np.abs(delta) > (page_rank + thresh)  # quirk 1 (algos.rs:203)

    remaining = max_iterations
    while True:
        error = sum_of_delta  # swap-and-reset (algos.rs:263-265)
        sum_of_delta = 0.0
        remaining -= 1
        if error < tolerance or remaining == 0:
            break
        gathered = scatter(active)
        delta = gathered * damping
        deltas = delta.copy()
        sum_of_delta = delta.sum()
        keep = np.abs(page_rank) > page_rank * thresh  # quirk 2 (algos.rs:215)
        page_rank = np.where(keep, page_rank + delta, page_rank)
        active = keep
    return page_rank


def cc_numpy(n: int, src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Union-find over the symmetrized edge set; component label =
    min vertex id in component."""
    parent = np.arange(n)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in zip(src.tolist(), dst.tolist()):
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[max(rs, rd)] = min(rs, rd)
    return np.array([find(v) for v in range(n)])


def cc_directed_hashmin_numpy(n: int, src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Directed hash-min fixpoint (min over ancestors) — pins the
    asymmetric-input behavior of SURVEY §2.5(4)."""
    labels = np.arange(n)
    changed = True
    while changed:
        new = labels.copy()
        np.minimum.at(new, dst, labels[src])
        changed = bool((new != labels).any())
        labels = new
    return labels


def labelprop_numpy(
    n: int, src: np.ndarray, dst: np.ndarray, max_iter: int = 20
) -> np.ndarray:
    """Synchronous LP per SURVEY §2.6: adopt most frequent in-neighbor
    label, ties -> smallest label; no in-neighbors -> keep own."""
    labels = np.arange(n)
    for _ in range(max_iter):
        new = labels.copy()
        incoming: dict[int, dict[int, int]] = {}
        for s, d in zip(src.tolist(), dst.tolist()):
            incoming.setdefault(d, {})
            lab = int(labels[s])
            incoming[d][lab] = incoming[d].get(lab, 0) + 1
        for v, cnts in incoming.items():
            best = sorted(cnts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            new[v] = best
        if (new == labels).all():
            labels = new
            break
        labels = new
    return labels


def triangle_count_numpy(n: int, src: np.ndarray, dst: np.ndarray) -> int:
    """Exact triangle count over the symmetrized, self-loop-free graph."""
    adj: list[set[int]] = [set() for _ in range(n)]
    for s, d in zip(src.tolist(), dst.tolist()):
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    count = 0
    for u in range(n):
        for v in adj[u]:
            if v > u:
                count += len(adj[u] & adj[v] & set(range(v + 1, n)))
    return count


def bfs_levels_numpy(n: int, src: np.ndarray, dst: np.ndarray, root: int) -> dict[int, int]:
    """Level sets of directed BFS from root."""
    adj: list[list[int]] = [[] for _ in range(n)]
    for s, d in zip(src.tolist(), dst.tolist()):
        adj[s].append(d)
    levels = {root: 0}
    frontier = [root]
    level = 0
    while frontier:
        level += 1
        nxt = []
        for u in frontier:
            for v in adj[u]:
                if v not in levels:
                    levels[v] = level
                    nxt.append(v)
        frontier = nxt
    return levels


def kcore_numpy(n: int, src: np.ndarray, dst: np.ndarray, k: int) -> dict[int, int]:
    """{id: in-core degree} of the k-core via sequential peeling over
    the given (assumed symmetric) edge list."""
    edges = set(zip(src.tolist(), dst.tolist()))
    while True:
        deg: dict[int, int] = {}
        for s, _ in edges:
            deg[s] = deg.get(s, 0) + 1
        bad = {v for v, d in deg.items() if d < k}
        if not bad:
            return deg
        edges = {(s, d) for s, d in edges if s not in bad and d not in bad}


def coreness_numpy(src: np.ndarray, dst: np.ndarray) -> dict[int, int]:
    """{id: core number} via SEQUENTIAL min-degree peeling (Batagelj &
    Zaveršnik 2003) over the given (assumed symmetric) edge list —
    the textbook serial algorithm the parallel bucket kernel must
    agree with exactly."""
    edges = set(zip(src.tolist(), dst.tolist()))
    verts = {s for s, _ in edges} | {d for _, d in edges}
    core: dict[int, int] = {}
    k = 0
    while verts:
        deg = {v: 0 for v in verts}
        for s, _ in edges:
            deg[s] += 1
        v = min(verts, key=lambda x: (deg[x], x))
        k = max(k, deg[v])
        core[v] = k
        verts.remove(v)
        edges = {(s, d) for s, d in edges if s != v and d != v}
    return core


def betweenness_numpy(
    n: int, src: np.ndarray, dst: np.ndarray, sources: list[int]
) -> dict[int, float]:
    """Brandes BC summed over the given source sample (directed-pair
    dependency sums, endpoints excluded). Returns {id: round(bc, 9)}
    for every vertex reached by at least one lane other than its own."""
    adj: list[list[int]] = [[] for _ in range(n)]
    for s, d in zip(src.tolist(), dst.tolist()):
        adj[s].append(d)
    bc: dict[int, float] = {}
    for s in sources:
        dist = [-1] * n
        sigma = [0.0] * n
        preds: list[list[int]] = [[] for _ in range(n)]
        dist[s] = 0
        sigma[s] = 1.0
        order: list[int] = []
        frontier = [s]
        while frontier:
            nxt = []
            for u in frontier:
                order.append(u)
                for v in adj[u]:
                    if dist[v] == -1:
                        dist[v] = dist[u] + 1
                        nxt.append(v)
                    if dist[v] == dist[u] + 1:
                        sigma[v] += sigma[u]
                        preds[v].append(u)
            # dedupe nxt preserving first-seen order
            seen = set()
            frontier = [v for v in nxt if not (v in seen or seen.add(v))]
        delta = [0.0] * n
        for w in reversed(order):
            for u in preds[w]:
                delta[u] += (sigma[u] / sigma[w]) * (1.0 + delta[w])
            if w != s:
                bc[w] = bc.get(w, 0.0) + delta[w]
    return {v: round(x, 9) for v, x in bc.items()}


def sssp_numpy(
    n: int, src: np.ndarray, dst: np.ndarray, w: np.ndarray, root: int
) -> dict[int, float]:
    """Dijkstra shortest distances from root (non-negative weights)."""
    import heapq

    adj: list[list[tuple[int, float]]] = [[] for _ in range(n)]
    for s, d, x in zip(src.tolist(), dst.tolist(), w.tolist()):
        adj[s].append((d, float(x)))
    dist = {root: 0.0}
    pq = [(0.0, root)]
    while pq:
        du, u = heapq.heappop(pq)
        if du > dist.get(u, float("inf")):
            continue
        for v, x in adj[u]:
            nd = du + x
            if nd < dist.get(v, float("inf")):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    return dist


def mis_key(v: int) -> int:
    """The MIS priority key (kernels/mis.py): Knuth multiplicative hash
    tie-broken by id — must match priority_key() and the DuckDB oracle
    literally."""
    return ((v * 2654435761) % 1_000_000_007) * 2_147_483_648 + v


def mis_greedy(vertices, src: np.ndarray, dst: np.ndarray) -> set[int]:
    """Sequential greedy MIS in ascending mis_key order over the given
    vertex set + (assumed symmetric) edge list — the fixpoint the
    parallel priority-greedy kernel must reproduce exactly (Blelloch,
    Fineman & Shun SPAA'12: priority-parallel greedy == sequential
    greedy)."""
    nbrs: dict[int, set[int]] = {}
    for u, v in zip(src.tolist(), dst.tolist()):
        nbrs.setdefault(u, set()).add(v)
        nbrs.setdefault(v, set()).add(u)
    chosen: set[int] = set()
    blocked: set[int] = set()
    for v in sorted(vertices, key=mis_key):
        if v in blocked:
            continue
        chosen.add(v)
        blocked |= nbrs.get(v, set())
    return chosen


def coloring_layered(vertices, src: np.ndarray, dst: np.ndarray) -> dict[int, int]:
    """Sequential replay of iterated-MIS (Luby) coloring: repeatedly
    take the greedy MIS in ascending mis_key order of the residual,
    assign it the next color, delete it — the fixpoint the layered
    coloring kernel (kernels/coloring.py) must reproduce exactly."""
    nbrs: dict[int, set[int]] = {}
    for u, v in zip(src.tolist(), dst.tolist()):
        nbrs.setdefault(u, set()).add(v)
        nbrs.setdefault(v, set()).add(u)
    remaining = set(vertices)
    color: dict[int, int] = {}
    c = 0
    while remaining:
        chosen: set[int] = set()
        blocked: set[int] = set()
        for v in sorted(remaining, key=mis_key):
            if v in blocked:
                continue
            chosen.add(v)
            blocked |= nbrs.get(v, set()) & remaining
        for v in chosen:
            color[v] = c
        remaining -= chosen
        c += 1
    return color


ANF_A = [2654435761, 2246822519, 3266489917, 668265263,
         374761393, 3779747731, 1300027183, 2043430169]
ANF_B = [17, 31, 47, 61, 79, 101, 131, 151]
_ANF_MASK = (1 << 62) - 1
_ANF_GUARD = 1 << 61


def anf_fm_sketches(
    vertices, src: np.ndarray, dst: np.ndarray,
    registers: int = 8, rounds: int | None = None,
) -> tuple[dict[int, list[int]], int]:
    """Exact replay of the FM sketch propagation in kernels/anf.py:
    seed = lowest set bit of the multiplicative hash, per-round bit-or
    over out-neighbors. Returns (final masks per vertex, rounds run to
    fixpoint or `rounds`)."""
    adj: dict[int, list[int]] = {}
    for u, v in zip(src.tolist(), dst.tolist()):
        adj.setdefault(u, []).append(v)
    masks = {}
    for v in vertices:
        ms = []
        for k in range(registers):
            h = ((v * ANF_A[k] + ANF_B[k]) & _ANF_MASK) | _ANF_GUARD
            ms.append(h & -h)
        masks[v] = ms
    r = 0
    while rounds is None or r < rounds:
        nxt = {v: list(ms) for v, ms in masks.items()}
        for u, vs in adj.items():
            for v in vs:
                for k in range(registers):
                    nxt[u][k] |= masks[v][k]
        r += 1
        changed = nxt != masks
        masks = nxt
        if rounds is None and not changed:
            break
    return masks, r


def hits_numpy(
    n: int,
    src: np.ndarray,
    dst: np.ndarray,
    tol: float = 1e-6,
    max_iter: int = 50,
) -> tuple[np.ndarray, np.ndarray, int]:
    """Two-phase L2-normalized HITS — must mirror kernels/hits.py
    update-for-update (auth first, hub reads the normalized auth)."""
    hub = np.ones(n)
    auth = np.ones(n)
    iterations = 0
    for _ in range(max_iter):
        a_raw = np.zeros(n)
        np.add.at(a_raw, dst, hub[src])
        an = np.sqrt((a_raw * a_raw).sum())
        new_auth = a_raw / an if an > 0 else np.zeros(n)
        h_raw = np.zeros(n)
        np.add.at(h_raw, src, new_auth[dst])
        hn = np.sqrt((h_raw * h_raw).sum())
        new_hub = h_raw / hn if hn > 0 else np.zeros(n)
        diff = np.abs(new_hub - hub).max() + np.abs(new_auth - auth).max()
        hub, auth = new_hub, new_auth
        iterations += 1
        if diff < tol:
            break
    return hub, auth, iterations


def katz_numpy(
    n: int,
    src: np.ndarray,
    dst: np.ndarray,
    alpha: float = 0.05,
    beta: float = 1.0,
    tol: float = 1e-6,
    max_iter: int = 100,
) -> tuple[np.ndarray, int]:
    """Katz recurrence x' = beta + alpha * A^T x from x0 = beta — must
    mirror kernels/katz.py update-for-update."""
    x = np.full(n, beta)
    iterations = 0
    for _ in range(max_iter):
        raw = np.zeros(n)
        np.add.at(raw, dst, x[src])
        new_x = beta + alpha * raw
        diff = np.abs(new_x - x).max()
        x = new_x
        iterations += 1
        if diff < tol:
            break
    return x, iterations


def salsa_numpy(
    n: int,
    src: np.ndarray,
    dst: np.ndarray,
    tol: float = 1e-6,
    max_iter: int = 50,
) -> tuple[np.ndarray, np.ndarray, int]:
    """Two-phase L1-normalized SALSA — must mirror kernels/salsa.py
    update-for-update (degree-weighted gathers; auth first, hub reads
    the normalized auth)."""
    out_deg = np.zeros(n, dtype=np.int64)
    in_deg = np.zeros(n, dtype=np.int64)
    np.add.at(out_deg, src, 1)
    np.add.at(in_deg, dst, 1)
    hub = np.ones(n)
    auth = np.ones(n)
    iterations = 0
    for _ in range(max_iter):
        a_raw = np.zeros(n)
        np.add.at(a_raw, dst, hub[src] / out_deg[src])
        an = a_raw.sum()
        new_auth = a_raw / an if an > 0 else np.zeros(n)
        h_raw = np.zeros(n)
        np.add.at(h_raw, src, new_auth[dst] / in_deg[dst])
        hn = h_raw.sum()
        new_hub = h_raw / hn if hn > 0 else np.zeros(n)
        diff = np.abs(new_hub - hub).max() + np.abs(new_auth - auth).max()
        hub, auth = new_hub, new_auth
        iterations += 1
        if diff < tol:
            break
    return hub, auth, iterations


def modularity_numpy(
    src: np.ndarray, dst: np.ndarray, labels: dict[int, int]
) -> float:
    """Directed Leicht-Newman modularity replay — must mirror
    kernels/modularity.py: Q = Σ_c e_c/m − Σ_c out_c·in_c/m²."""
    m = len(src)
    if m == 0:
        return 0.0
    intra: dict[int, int] = {}
    out_c: dict[int, int] = {}
    in_c: dict[int, int] = {}
    for u, v in zip(src.tolist(), dst.tolist()):
        cu, cv = labels[u], labels[v]
        out_c[cu] = out_c.get(cu, 0) + 1
        in_c[cv] = in_c.get(cv, 0) + 1
        if cu == cv:
            intra[cu] = intra.get(cu, 0) + 1
    e_sum = sum(intra.values())
    null_sum = sum(
        out_c.get(c, 0) * in_c.get(c, 0) for c in set(out_c) | set(in_c)
    )
    return e_sum / m - null_sum / m / m


def random_walks_replay(
    src: np.ndarray,
    dst: np.ndarray,
    starts: list[int],
    length: int,
    walks_per_vertex: int = 1,
    seed: int = 0,
) -> set[tuple[int, int, int, int]]:
    """Sequential replay of kernels/walks.py's deterministic walks —
    same mix constants, same (hash, dst) argmin successor rule."""
    mask, p, mult = 1048576, 2147483647, 2654435761
    seed = int(seed) % p

    def mix(s: int, r: int, t: int, d: int) -> int:
        x = (s % mask) * 2097169 + r * 131071 + t * 8191 + (d % mask) + seed
        return ((x % p) * mult) % p

    adj: dict[int, list[int]] = {}
    for u, v in zip(src.tolist(), dst.tolist()):
        adj.setdefault(u, []).append(v)
    rows: set[tuple[int, int, int, int]] = set()
    for s in starts:
        for r in range(walks_per_vertex):
            v = s
            rows.add((s, r, 0, s))
            for t in range(1, length + 1):
                nbrs = adj.get(v)
                if not nbrs:
                    break
                v = min(nbrs, key=lambda d: (mix(s, r, t, d), d))
                rows.add((s, r, t, v))
    return rows


def neighbor_sample_replay(
    src: np.ndarray,
    dst: np.ndarray,
    seeds: list[int],
    fanouts: list[int],
    seed: int = 0,
) -> set[tuple[int, int, int]]:
    """Sequential replay of kernels/sampling.py: layer l keeps the
    fanout[l] out-neighbors minimizing (mix(src, layer, dst), dst);
    next frontier = distinct sampled dsts."""
    mask, p, mult = 1048576, 2147483647, 2654435761
    seed = int(seed) % p

    def mix(s: int, layer: int, d: int) -> int:
        x = (s % mask) * 2097169 + layer * 8191 + (d % mask) + seed
        return ((x % p) * mult) % p

    # the Graph dedups edges (build_graph_from_edges) — mirror that
    adj: dict[int, set[int]] = {}
    for u, v in zip(src.tolist(), dst.tolist()):
        adj.setdefault(u, set()).add(v)
    rows: set[tuple[int, int, int]] = set()
    frontier = set(seeds)
    for layer, fanout in enumerate(fanouts, start=1):
        nxt: set[int] = set()
        for s in frontier:
            kept = sorted(adj.get(s, []), key=lambda d: (mix(s, layer, d), d))[
                :fanout
            ]
            for d in kept:
                rows.add((layer, s, d))
                nxt.add(d)
        if not nxt:
            break
        frontier = nxt
    return rows


def negative_sample_replay(
    src: np.ndarray,
    dst: np.ndarray,
    k: int,
    seed: int = 0,
    overgen: int = 4,
    srcs: list[int] | None = None,
    n: int | None = None,
) -> set[tuple[int, int, int]]:
    """Sequential replay of kernels/sampling.py:negative_sample:
    cand(s, j) = draw(s, j) % (max_id + 1); drop holes / self /
    positives / per-src dupes; first k survivors by (j, cand) win,
    slot = 0..k-1. `n` mirrors build_graph_from_edges(n=...): the
    vertex universe is 0..n-1 when given, else the edge endpoints."""
    mask, p, mult = 1048576, 2147483647, 2654435761
    seed = int(seed) % p

    def draw(s: int, j: int) -> int:
        # full-src mix (r5): low 20 bits direct, high bits via one
        # Lehmer round — mirror of kernels/sampling.py:draw_expr
        s1 = (((s >> 20) % p) * mult % p + s % mask) % p
        x = s1 * 2097169 + j * 131071 + seed
        return ((x % p) * mult) % p

    verts = (
        set(range(n)) if n is not None else set(src.tolist()) | set(dst.tolist())
    )
    n_ids = max(verts) + 1
    adj: dict[int, set[int]] = {}
    for u, v in zip(src.tolist(), dst.tolist()):
        adj.setdefault(u, set()).add(v)
    sources = sorted(adj) if srcs is None else sorted(set(srcs))
    rows: set[tuple[int, int, int]] = set()
    for s in sources:
        first: dict[int, int] = {}
        for j in range(k * overgen):
            c = draw(s, j) % n_ids
            if c == s or c not in verts or c in adj.get(s, ()):
                continue
            if c not in first:
                first[c] = j
        kept = sorted(first.items(), key=lambda it: (it[1], it[0]))[:k]
        for slot, (c, _) in enumerate(kept):
            rows.add((s, slot, c))
    return rows


def ppr_numpy(
    n: int,
    src: np.ndarray,
    dst: np.ndarray,
    sources: list[int],
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
) -> tuple[np.ndarray, int]:
    """Personalized PageRank replay — must mirror kernels/ppr.py
    update-for-update (dangling mass teleports to the seeds)."""
    out_deg = _degrees(n, src, dst)
    base = np.zeros(n)
    base[np.asarray(sorted(set(sources)))] = 1.0 / len(set(sources))
    rank = base.copy()
    iterations = 0
    for _ in range(max_iter):
        contrib = np.zeros(n)
        np.add.at(contrib, dst, rank[src] / out_deg[src])
        dm = rank[out_deg == 0].sum()
        new = (1.0 - damping) * base + damping * (contrib + dm * base)
        diff = np.abs(new - rank).max()
        rank = new
        iterations += 1
        if diff < tol:
            break
    return rank, iterations


def condensation_replay(
    vertices, src: np.ndarray, dst: np.ndarray
) -> dict[int, tuple[int, int]]:
    """Sequential replay of kernels/condense.py: Tarjan labels,
    condensed DAG, longest-path level per component (memoized DP).
    Returns {scc_label: (level, size)}."""
    labels = scc_tarjan(vertices, src, dst)
    comps: dict[int, int] = {}
    for v, c in labels.items():
        comps[c] = comps.get(c, 0) + 1
    preds: dict[int, set[int]] = {c: set() for c in comps}
    for s, d in zip(src.tolist(), dst.tolist()):
        cs, cd = labels[s], labels[d]
        if cs != cd:
            preds[cd].add(cs)
    level: dict[int, int] = {}

    def resolve(c: int) -> int:
        stack = [c]
        while stack:
            cur = stack[-1]
            if cur in level:
                stack.pop()
                continue
            pending = [p for p in preds[cur] if p not in level]
            if pending:
                stack.extend(pending)
            else:
                level[cur] = (
                    1 + max(level[p] for p in preds[cur]) if preds[cur] else 0
                )
                stack.pop()
        return level[c]

    return {c: (resolve(c), comps[c]) for c in comps}


def scc_tarjan(
    vertices, src: np.ndarray, dst: np.ndarray
) -> dict[int, int]:
    """Strongly connected components by iterative Tarjan; returns
    {vertex: min member id of its SCC} — the label convention of
    kernels/scc.py (which normalizes its Orzan coloring output the
    same way)."""
    adj: dict[int, list[int]] = {int(v): [] for v in vertices}
    for s, d in zip(src, dst):
        adj.setdefault(int(s), []).append(int(d))
        adj.setdefault(int(d), [])
    index: dict[int, int] = {}
    low: dict[int, int] = {}
    on_stack: set[int] = set()
    stack: list[int] = []
    out: dict[int, int] = {}
    counter = 0
    for root in adj:
        if root in index:
            continue
        work: list[tuple[int, int]] = [(root, 0)]
        while work:
            node, ptr = work.pop()
            if ptr == 0:
                index[node] = low[node] = counter
                counter += 1
                stack.append(node)
                on_stack.add(node)
            descended = False
            for i in range(ptr, len(adj[node])):
                w = adj[node][i]
                if w not in index:
                    work.append((node, i + 1))
                    work.append((w, 0))
                    descended = True
                    break
                if w in on_stack:
                    low[node] = min(low[node], index[w])
            if descended:
                continue
            if low[node] == index[node]:
                comp = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    comp.append(w)
                    if w == node:
                        break
                rep = min(comp)
                for w in comp:
                    out[w] = rep
            if work:
                parent = work[-1][0]
                low[parent] = min(low[parent], low[node])
    return out


def bowtie_classes(
    vertices, src: np.ndarray, dst: np.ndarray
) -> dict[int, str]:
    """Bow-tie replay: largest SCC by (size DESC, min-member label
    ASC) is CORE; BFS reach sets give IN (reaches core) and OUT
    (reached from core); rest OTHER — mirrors kernels/bowtie.py."""
    from collections import defaultdict, deque

    scc = scc_tarjan(vertices, src, dst)
    sizes: dict[int, int] = defaultdict(int)
    for rep in scc.values():
        sizes[rep] += 1
    core_label = min(sizes, key=lambda r: (-sizes[r], r))
    core = {v for v, rep in scc.items() if rep == core_label}

    fadj: dict[int, list[int]] = defaultdict(list)
    badj: dict[int, list[int]] = defaultdict(list)
    for s, d in zip(src, dst):
        fadj[int(s)].append(int(d))
        badj[int(d)].append(int(s))

    def reach(adj) -> set[int]:
        seen = set(core)
        q = deque(core)
        while q:
            v = q.popleft()
            for w in adj[v]:
                if w not in seen:
                    seen.add(w)
                    q.append(w)
        return seen

    fwd, bwd = reach(fadj), reach(badj)
    out: dict[int, str] = {}
    for v in scc:
        if v in core:
            out[v] = "CORE"
        elif v in bwd:
            out[v] = "IN"
        elif v in fwd:
            out[v] = "OUT"
        else:
            out[v] = "OTHER"
    return out


def clustering_replay(src: np.ndarray, dst: np.ndarray) -> dict[int, tuple[int, float]]:
    """Brute-force local clustering: symmetrize + drop self-loops,
    T(v) = adjacent neighbor pairs, C(v) = 2T/(d(d-1)) — mirrors
    kernels/clustering.py."""
    from collections import defaultdict
    from itertools import combinations

    nbr: dict[int, set] = defaultdict(set)
    for s, d in zip(src, dst):
        s, d = int(s), int(d)
        if s != d:
            nbr[s].add(d)
            nbr[d].add(s)
    out: dict[int, tuple[int, float]] = {}
    for v, ns in nbr.items():
        t = sum(1 for a, b in combinations(sorted(ns), 2) if b in nbr[a])
        d = len(ns)
        out[v] = (t, 2.0 * t / (d * (d - 1)) if d >= 2 else 0.0)
    return out


def linkpred_replay(
    src: np.ndarray, dst: np.ndarray, min_cn: int = 1,
    max_center_deg: int | None = None,
) -> dict[tuple[int, int], tuple[int, float]]:
    """Brute-force CN/Adamic-Adar over non-adjacent pairs — mirrors
    kernels/linkpred.py (u < w; centers above the degree cap dropped)."""
    import math
    from collections import defaultdict
    from itertools import combinations

    nbr: dict[int, set] = defaultdict(set)
    for s, d in zip(src, dst):
        s, d = int(s), int(d)
        if s != d:
            nbr[s].add(d)
            nbr[d].add(s)
    out: dict[tuple[int, int], tuple[int, float]] = {}
    for v, ns in nbr.items():
        if max_center_deg is not None and len(ns) > max_center_deg:
            continue
        for a, b in combinations(sorted(ns), 2):
            cn, aa = out.get((a, b), (0, 0.0))
            out[(a, b)] = (cn + 1, aa + 1.0 / math.log(len(ns)))
    return {
        p: s
        for p, s in out.items()
        if s[0] >= min_cn and p[1] not in nbr[p[0]]
    }


def densest_replay(
    src: np.ndarray, dst: np.ndarray, eps: float = 0.1
) -> tuple[dict[int, int], int, float, list[float]]:
    """Bahmani peeling replay: per-vertex peel round, argmax round
    (earliest tie), its density, per-round densities — mirrors
    kernels/densest.py."""
    from collections import defaultdict

    nbr: dict[int, set] = defaultdict(set)
    for s, d in zip(src, dst):
        s, d = int(s), int(d)
        if s != d:
            nbr[s].add(d)
            nbr[d].add(s)
    alive = set(nbr)
    peel: dict[int, int] = {}
    densities: list[float] = []
    best, best_r, r = -1.0, 0, 0
    while alive:
        r += 1
        degs = {v: len(nbr[v] & alive) for v in alive}
        m2, n = sum(degs.values()), len(alive)
        rho = m2 / (2.0 * n)
        densities.append(rho)
        if rho > best:
            best, best_r = rho, r
        thr = (1.0 + eps) * m2 / n
        rm = {v for v in alive if degs[v] <= thr}
        for v in rm:
            peel[v] = r
        alive -= rm
    return peel, best_r, best, densities


def graphstats_replay(src: np.ndarray, dst: np.ndarray) -> dict:
    """Brute-force n/m/reciprocity/max/avg degree/assortativity —
    mirrors kernels/graphstats.py (Newman r over symmetric edge rows)."""
    from collections import defaultdict

    e = {(int(s), int(d)) for s, d in zip(src, dst) if s != d}
    nbr: dict[int, set] = defaultdict(set)
    for s, d in e:
        nbr[s].add(d)
        nbr[d].add(s)
    recip = sum(1 for s, d in e if (d, s) in e)
    deg = {v: len(ns) for v, ns in nbr.items()}
    rows = [(deg[s], deg[d]) for s in nbr for d in nbr[s]]
    bigm = len(rows)
    sjk = sum(j * k for j, k in rows)
    sj = sum(j for j, _ in rows)
    sjj = sum(j * j for j, _ in rows)
    return {
        "n": len(nbr),
        "m": len(e),
        "recip_edges": recip,
        "reciprocity": recip / len(e),
        "max_deg": max(deg.values()),
        "avg_deg": bigm / len(nbr),
        "assortativity": (bigm * sjk - sj * sj) / (bigm * sjj - sj * sj),
    }


def ktruss_replay(
    src: np.ndarray, dst: np.ndarray, k: int
) -> dict[tuple[int, int], int]:
    """Edge-support peeling replay: canonical (u<w) k-truss edges with
    their in-truss support — mirrors kernels/truss.py."""
    from collections import defaultdict

    E = {tuple(sorted((int(s), int(d)))) for s, d in zip(src, dst) if s != d}
    nbr: dict[int, set] = defaultdict(set)
    for u, v in E:
        nbr[u].add(v)
        nbr[v].add(u)
    while True:
        sup = {(u, v): len(nbr[u] & nbr[v]) for u, v in E}
        rm = [e for e in E if sup[e] < k - 2]
        if not rm:
            return sup
        for u, v in rm:
            E.discard((u, v))
            nbr[u].discard(v)
            nbr[v].discard(u)


def egonet_replay(
    src: np.ndarray, dst: np.ndarray, seeds, radius: int, direction: str
) -> tuple[dict[int, int], set]:
    """BFS-ball + induced-edge replay — mirrors kernels/egonet.py."""
    from collections import defaultdict, deque

    fadj, badj = defaultdict(set), defaultdict(set)
    edges = set()
    for s, d in zip(src, dst):
        s, d = int(s), int(d)
        edges.add((s, d))
        fadj[s].add(d)
        badj[d].add(s)
    dist = {int(v): 0 for v in seeds}
    q = deque(dist)
    while q:
        v = q.popleft()
        if dist[v] >= radius:
            continue
        nxt = set()
        if direction in ("out", "both"):
            nxt |= fadj[v]
        if direction in ("in", "both"):
            nxt |= badj[v]
        for w in nxt:
            if w not in dist:
                dist[w] = dist[v] + 1
                q.append(w)
    ball = set(dist)
    induced = {(s, d) for s, d in edges if s in ball and d in ball}
    return dist, induced


def matching_key(u: int, v: int) -> tuple[int, int, int]:
    """The matching edge-priority key (kernels/matching.py): a
    two-multiplier hash folded into [0, 1e9+7), tie-broken by (u, v) —
    must match edge_priority() and the DuckDB oracle literally."""
    h = (
        (u % 1_000_000_007) * 2654435761 % 1_000_000_007
        + (v % 1_000_000_007) * 2246822519 % 1_000_000_007
    ) % 1_000_000_007
    return (h, u, v)


def matching_greedy(src: np.ndarray, dst: np.ndarray) -> set[tuple[int, int]]:
    """Sequential greedy maximal matching in ascending matching_key
    order over canonical (u < v) edges — the fixpoint the parallel
    priority-greedy kernel (kernels/matching.py) must reproduce
    exactly (SPAA'12 priority-greedy == greedy, on the line graph)."""
    canon = sorted(
        {(min(u, v), max(u, v)) for u, v in zip(src.tolist(), dst.tolist()) if u != v},
        key=lambda e: matching_key(*e),
    )
    used: set[int] = set()
    out: set[tuple[int, int]] = set()
    for u, v in canon:
        if u not in used and v not in used:
            out.add((u, v))
            used.add(u)
            used.add(v)
    return out


def msf_kruskal(
    src: np.ndarray, dst: np.ndarray, w: np.ndarray | None = None
) -> set[tuple[int, int, int]]:
    """Kruskal with union-find under the strict (w, u, v) total order
    over canonical (u < v) edges (min weight per pair) — since the
    order is strict, the MSF is unique, so this must equal Borůvka's
    output (kernels/msf.py) edge-for-edge."""
    canon: dict[tuple[int, int], int] = {}
    ws = [1] * len(src) if w is None else [int(x) for x in w.tolist()]
    for u, v, ew in zip(src.tolist(), dst.tolist(), ws):
        if u == v:
            continue
        key = (min(u, v), max(u, v))
        if key not in canon or ew < canon[key]:
            canon[key] = ew
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out: set[tuple[int, int, int]] = set()
    for (u, v), ew in sorted(canon.items(), key=lambda kv: (kv[1], kv[0])):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
            out.add((u, v, ew))
    return out


def eigen_numpy(
    n: int,
    src: np.ndarray,
    dst: np.ndarray,
    tol: float = 1e-6,
    max_iter: int = 100,
) -> tuple[np.ndarray, int]:
    """L2-normalized power iteration x' = A^T x — must mirror
    kernels/eigen.py update-for-update."""
    x = np.ones(n)
    iterations = 0
    for _ in range(max_iter):
        raw = np.zeros(n)
        np.add.at(raw, dst, x[src])
        nv = np.sqrt((raw * raw).sum())
        new_x = raw / nv if nv > 0 else np.zeros(n)
        diff = np.abs(new_x - x).max()
        x = new_x
        iterations += 1
        if diff < tol:
            break
    return x, iterations


def ppr_sweep_replay(
    n: int,
    src: np.ndarray,
    dst: np.ndarray,
    sources: list[int],
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
    max_sweep: int = 1024,
) -> tuple[list[int], int | None, float | None]:
    """Sequential replay of kernels/pprsweep.py (ACL FOCS'06 sweep):
    PPR scores -> degree-normalized order (ROUND-half-up 9, matching
    Spark's ROUND) -> incremental prefix cut/vol -> min-conductance
    prefix. Returns (sweep order, best_k, best_phi)."""
    from collections import defaultdict
    import math

    rank, _ = ppr_numpy(n, src, dst, sources, damping, tol, max_iter)
    und: set[tuple[int, int]] = set()
    for s, d in zip(src.tolist(), dst.tolist()):
        if s != d:
            und.add((min(s, d), max(s, d)))
    deg: dict[int, int] = defaultdict(int)
    adj: dict[int, set] = defaultdict(set)
    for u, v in und:
        deg[u] += 1
        deg[v] += 1
        adj[u].add(v)
        adj[v].add(u)

    def round9(x: float) -> float:  # HALF_UP for x >= 0, like Spark ROUND
        return math.floor(x * 1e9 + 0.5) / 1e9

    cands = sorted(
        ((-round9(float(rank[i]) / deg[i]), i) for i in deg if rank[i] > 0)
    )[:max_sweep]
    order = [i for _, i in cands]
    twom = 2 * len(und)
    in_s: set[int] = set()
    vol = cut = 0
    best_phi: float | None = None
    best_k: int | None = None
    for k, v in enumerate(order, start=1):
        in_s.add(v)
        vol += deg[v]
        for w in adj[v]:
            cut += -1 if w in in_s else 1
        den = min(vol, twom - vol)
        if den > 0:
            phi = cut / den
            if best_phi is None or phi < best_phi:
                best_phi, best_k = phi, k
    return order, best_k, best_phi


def node2vec_replay(
    src: np.ndarray,
    dst: np.ndarray,
    starts: list[int],
    length: int,
    walks_per_vertex: int = 1,
    alphas: tuple[int, int, int] = (1, 4, 2),
    seed: int = 0,
    max_neighbors: int | None = None,
) -> set[tuple[int, int, int, int]]:
    """Sequential replay of kernels/node2vec.py's biased walks — same
    mix constants, same integer-weight classes, same cumulative-sum
    modular draw over dst-ascending candidates (prev initialized to
    the start, making step 1 uniform-by-alpha_common)."""
    mask, p, mult = 1048576, 2147483647, 2654435761
    seed = int(seed) % p
    a_ret, a_com, a_fwd = alphas

    def mix(s: int, r: int, t: int, d: int) -> int:
        x = (s % mask) * 2097169 + r * 131071 + t * 8191 + (d % mask) + seed
        return ((x % p) * mult) % p

    adj: dict[int, list[int]] = {}
    eset = set()
    for u, v in zip(src.tolist(), dst.tolist()):
        adj.setdefault(u, []).append(v)
        eset.add((u, v))
    rows: set[tuple[int, int, int, int]] = set()
    for s in starts:
        for r in range(walks_per_vertex):
            prev, v = s, s
            rows.add((s, r, 0, s))
            for t in range(1, length + 1):
                nbrs = sorted(set(adj.get(v, ())))
                if not nbrs:
                    break
                if max_neighbors is not None and len(nbrs) > max_neighbors:
                    nbrs = sorted(
                        nbrs, key=lambda d: (mix(s, r, t, d), d)
                    )[:max_neighbors]
                    nbrs.sort()
                ws = [
                    a_ret if d == prev else (a_com if (prev, d) in eset else a_fwd)
                    for d in nbrs
                ]
                draw = mix(s, r, t, 0) % sum(ws)
                cum = 0
                for d, w in zip(nbrs, ws):
                    cum += w
                    if draw < cum:
                        prev, v = v, d
                        break
                rows.add((s, r, t, v))
    return rows


def trussness_py(src: np.ndarray, dst: np.ndarray) -> dict[tuple[int, int], int]:
    """{(u, w): truss number} via SEQUENTIAL min-support peeling over
    the given (assumed symmetric) edge list, canonical u < w — the
    textbook serial edge-peeling the parallel bucket kernel must agree
    with exactly (Cohen 2008; any valid peel order yields the same
    truss numbers)."""
    edges = {
        (min(s, d), max(s, d))
        for s, d in zip(src.tolist(), dst.tolist())
        if s != d
    }
    t = 2
    truss: dict[tuple[int, int], int] = {}
    adj: dict[int, set[int]] = {}
    for u, w in edges:
        adj.setdefault(u, set()).add(w)
        adj.setdefault(w, set()).add(u)
    while edges:
        sup = {(u, w): len(adj[u] & adj[w]) for u, w in edges}
        e = min(edges, key=lambda x: (sup[x], x))
        t = max(t, sup[e] + 2)
        truss[e] = t
        edges.remove(e)
        adj[e[0]].discard(e[1])
        adj[e[1]].discard(e[0])
    return truss


def bfs_dists_py(
    adj: dict[int, list[int]], source: int
) -> dict[int, int]:
    """Hop distances from `source` over the given adjacency dict."""
    from collections import deque

    dist = {source: 0}
    q = deque([source])
    while q:
        v = q.popleft()
        for nb in adj.get(v, ()):
            if nb not in dist:
                dist[nb] = dist[v] + 1
                q.append(nb)
    return dist


def louvain_moves_py(
    src: np.ndarray,
    dst: np.ndarray,
    batch_of: dict[int, int],
    n_batches: int,
    max_iter: int,
) -> dict[int, int]:
    """{id: community} after synchronous batched modularity-ascent
    moves — mirrors kernels/louvain.py move-for-move: candidates =
    neighbor communities ∪ own, exact integer score
    M2·k_vc − k_v·(tot(c) − [own]·k_v), argmax with smaller-community
    tie-break, move iff strictly better than staying, round r moves
    only batch r % n_batches, stop on a quiet full batch cycle."""
    sym = set()
    for s, d in zip(src.tolist(), dst.tolist()):
        if s != d:
            sym.add((s, d))
            sym.add((d, s))
    adj: dict[int, set[int]] = {}
    for s, d in sym:
        adj.setdefault(s, set()).add(d)
    k = {v: len(ns) for v, ns in adj.items()}
    m2 = len(sym)
    comm = {v: v for v in adj}
    quiet = 0
    for r in range(max_iter):
        tot: dict[int, int] = {}
        for v in adj:
            tot[comm[v]] = tot.get(comm[v], 0) + k[v]
        new = dict(comm)
        moves = 0
        for v in adj:
            if batch_of.get(v, 0) % n_batches != r % n_batches:
                continue
            kvc: dict[int, int] = {comm[v]: 0}
            for u in adj[v]:
                kvc[comm[u]] = kvc.get(comm[u], 0) + 1
            best_s = best_c = stay = None
            for c, x in kvc.items():
                s_ = m2 * x - k[v] * (tot[c] - (k[v] if c == comm[v] else 0))
                if c == comm[v]:
                    stay = s_
                if best_s is None or s_ > best_s or (s_ == best_s and c < best_c):
                    best_s, best_c = s_, c
            if best_s > stay:
                new[v] = best_c
                moves += 1
        comm = new
        quiet = quiet + 1 if moves == 0 else 0
        if quiet >= n_batches:
            break
    return comm


def louvain_py(
    src: np.ndarray,
    dst: np.ndarray,
    n_batches: int,
    max_iter: int,
    max_levels: int = 10,
) -> dict[int, int]:
    """{orig_id: community} after full multilevel Louvain under the
    PARITY batch schedule — weighted move phases (self-loop weights in
    k_v / Σ_tot, excluded from candidates) + community contraction,
    mirroring kernels/louvain.louvain stage-for-stage."""
    sym: dict[tuple[int, int], int] = {}
    for s, d in zip(src.tolist(), dst.tolist()):
        if s != d:
            sym[(s, d)] = 1
            sym[(d, s)] = 1
    mapping: dict[int, int] | None = None
    for _level in range(max_levels):
        verts = sorted({s for s, _ in sym} | {d for _, d in sym})
        k = {v: 0 for v in verts}
        for (s, d), w in sym.items():
            k[s] += w
        m2 = sum(sym.values())
        comm = {v: v for v in verts}
        quiet = 0
        total_moves = 0
        for r in range(max_iter):
            tot: dict[int, int] = {}
            for v in verts:
                tot[comm[v]] = tot.get(comm[v], 0) + k[v]
            new = dict(comm)
            moves = 0
            for v in verts:
                if v % 2 != r % n_batches and n_batches > 1:
                    continue
                kvc: dict[int, int] = {comm[v]: 0}
                for (s, d), w in sym.items():
                    if s == v and d != v:
                        kvc[comm[d]] = kvc.get(comm[d], 0) + w
                best_s = best_c = stay = None
                for c, x in kvc.items():
                    s_ = m2 * x - k[v] * (tot[c] - (k[v] if c == comm[v] else 0))
                    if c == comm[v]:
                        stay = s_
                    if best_s is None or s_ > best_s or (
                        s_ == best_s and c < best_c
                    ):
                        best_s, best_c = s_, c
                if best_s > stay:
                    new[v] = best_c
                    moves += 1
            comm = new
            total_moves += moves
            quiet = quiet + 1 if moves == 0 else 0
            if quiet >= n_batches:
                break
        if mapping is None:
            mapping = dict(comm)
        else:
            mapping = {o: comm[c] for o, c in mapping.items()}
        if total_moves == 0:
            break
        contracted: dict[tuple[int, int], int] = {}
        for (s, d), w in sym.items():
            key = (comm[s], comm[d])
            contracted[key] = contracted.get(key, 0) + w
        sym = contracted
    return mapping or {}

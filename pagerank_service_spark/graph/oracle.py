"""NumPy oracle reimplementing the reference PageRank semantics.

Faithful to ``/root/reference/project/utils/network_util.py:503-724``
(behavior only — written from scratch against the observed algorithm):

* collapse multi-edges: weight = sum of importance per (src,dst), keep >0;
* virtual node vid = max(vid)+1 with BIDIRECTIONAL edges to every node,
  weighted ``in_strength(node)/10`` (lines 544-564). With alpha=1 the
  (1-alpha)/N teleport term vanishes — the virtual node IS the teleport;
* row-normalized weighted transition matrix (lines 598-602);
* power iteration with uniform redistribution of dangling mass
  ``alpha * sum(rank[dangling])`` (lines 607-649), L-inf convergence;
* post-pass (lines 655-719): delete virtual node and redistribute its
  rank proportionally (pr += pr/(1-vpr)*vpr), normalize, add
  ``0.5 * in_weight/sum_in_weight`` bonus, normalize again.

Deviations (documented, deliberate):
* no fixed-digit string truncation — our match gate is allclose 1e-6,
  far looser than the reference's byte-equality consensus;
* nodes with zero in-strength get NO virtual edges (the reference would
  KeyError on them; its real data is bidirectional so they never occur).
  This keeps pure-source nodes non-teleporting and pure-sink nodes
  connected, and the engine applies the identical convention.
"""

from __future__ import annotations

import numpy as np


def collapse_edges(edges: list[tuple[int, int, float]]) -> dict[tuple[int, int], float]:
    ew: dict[tuple[int, int], float] = {}
    for s, d, w in edges:
        ew[(s, d)] = ew.get((s, d), 0.0) + float(w)
    return {e: w for e, w in ew.items() if w > 0}


def reference_pagerank(
    edges: list[tuple[int, int, float]],
    alpha: float = 1.0,
    max_iter: int = 1000,
    tol: float = 1e-9,
) -> dict[int, float]:
    ew = collapse_edges(edges)
    if not ew:
        return {}
    nodes = sorted({n for e in ew for n in e})
    in_strength: dict[int, float] = {}
    for (s, d), w in ew.items():
        in_strength[d] = in_strength.get(d, 0.0) + w

    virtual = max(nodes) + 1
    for n in nodes:
        st = in_strength.get(n, 0.0)
        if st > 0:
            ew[(virtual, n)] = st / 10.0
            ew[(n, virtual)] = ew.get((n, virtual), 0.0) + st / 10.0

    all_nodes = nodes + [virtual]
    N = len(all_nodes)
    idx = {n: i for i, n in enumerate(all_nodes)}

    W = np.zeros((N, N))
    for (s, d), w in ew.items():
        W[idx[s], idx[d]] = w
    rowsum = W.sum(axis=1)
    S = np.divide(W, rowsum[:, None], out=np.zeros_like(W), where=rowsum[:, None] > 0)
    dangling = np.where(rowsum == 0)[0]

    x = np.ones(N) / N
    for _ in range(max_iter):
        danglesum = alpha * x[dangling].sum()
        x_new = alpha * (x @ S) + danglesum / N + (1 - alpha) / N
        err = np.abs(x_new - x).max()
        x = x_new
        if err < tol:
            break

    pr = {n: x[idx[n]] for n in nodes}
    vpr = x[idx[virtual]]
    denom = 1.0 - vpr
    pr = {n: v + (v / denom) * vpr for n, v in pr.items()}
    total = sum(pr.values())
    pr = {n: v / total for n, v in pr.items()}

    sum_w = sum(in_strength.values())
    pr_new = {n: v + 0.5 * in_strength.get(n, 0.0) / sum_w for n, v in pr.items()}
    total2 = sum(pr_new.values())
    return {n: v / total2 for n, v in pr_new.items()}


def standard_pagerank(
    edges: list[tuple[int, int, float]],
    alpha: float = 0.85,
    max_iter: int = 1000,
    tol: float = 1e-9,
) -> dict[int, float]:
    """Classic weighted damped PageRank with dangling-mass redistribution
    (no virtual node, no post-pass) — oracle for the engine's generic mode."""
    ew = collapse_edges(edges)
    if not ew:
        return {}
    nodes = sorted({n for e in ew for n in e})
    N = len(nodes)
    idx = {n: i for i, n in enumerate(nodes)}
    W = np.zeros((N, N))
    for (s, d), w in ew.items():
        W[idx[s], idx[d]] = w
    rowsum = W.sum(axis=1)
    S = np.divide(W, rowsum[:, None], out=np.zeros_like(W), where=rowsum[:, None] > 0)
    dangling = np.where(rowsum == 0)[0]
    x = np.ones(N) / N
    for _ in range(max_iter):
        danglesum = alpha * x[dangling].sum()
        x_new = alpha * (x @ S) + danglesum / N + (1 - alpha) / N
        err = np.abs(x_new - x).max()
        x = x_new
        if err < tol:
            break
    return {n: x[idx[n]] for n in nodes}

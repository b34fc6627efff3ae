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


def _trunc_fns(trunc_digits: int | None):
    """(scalar, vector) truncate-to-k-fraction-digits fns, or identities."""
    if trunc_digits:
        from ..functions.truncate import trunc_py

        def tr(v):
            return trunc_py(float(v), trunc_digits)

        def tl(a):
            return np.array([tr(v) for v in a])
    else:
        def tr(v):
            return v

        def tl(a):
            return a
    return tr, tl


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
    trunc_digits: int | None = None,
) -> dict[int, float]:
    """``trunc_digits=14`` reproduces the reference's per-ITERATION
    numeric regime (network_util.py:604,624-645): every intermediate is
    string-truncated to 14 fraction digits inside the power iteration
    (step1 = trunc(alpha*x), matvec then trunc, step2 =
    trunc(uniform*danglesum), step3 = trunc(trunc(1-alpha)/N), sum then
    trunc) — truncation, never rounding. The POST-pass keeps plain
    float64 even in trunc mode: the reference truncates its post-pass
    sums after EACH addition in dict order (:670-674, :701-704,
    :714-716) — a sequential order-dependent fold no distributed
    aggregation can reproduce, so the engine matches the loop regime
    byte-exactly (testable via standard mode, which has no post-pass)
    and the post-pass at allclose. Default None keeps plain float64."""
    tr, tl = _trunc_fns(trunc_digits)
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
    if trunc_digits:  # network_util.py:604: trans entries truncated once
        S = np.vectorize(tr)(S)
        # dangling detected AFTER truncating weighted_S, the reference's
        # operation order (network_util.py:604-613) — with row-normalized
        # probabilities this only differs at out-degree > 10^trunc_digits
        dangling = np.where(S.sum(axis=1) == 0)[0]
    else:
        dangling = np.where(rowsum == 0)[0]

    x = np.ones(N) / N
    u = np.ones(N) / N  # the reference's constant `_init` vector
    for _ in range(max_iter):
        danglesum = alpha * x[dangling].sum()
        if trunc_digits:
            s1 = tl(tl(alpha * x) @ S)
            s2 = tl(u * danglesum)
            s3 = tl(tl(np.full(N, 1.0 - alpha)) / N)
            x_new = tl(s1 + s2 + s3)
        else:
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
    trunc_digits: int | None = None,
) -> dict[int, float]:
    """Classic weighted damped PageRank with dangling-mass redistribution
    (no virtual node, no post-pass) — oracle for the engine's generic
    mode. ``trunc_digits`` applies the reference's per-iteration
    truncation regime (see reference_pagerank); with no post-pass the
    returned vector IS the loop output, so byte equality with the
    engine's trunc mode is well-defined here."""
    tr, tl = _trunc_fns(trunc_digits)
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
    if trunc_digits:
        S = np.vectorize(tr)(S)
        dangling = np.where(S.sum(axis=1) == 0)[0]  # post-trunc, as above
    else:
        dangling = np.where(rowsum == 0)[0]
    x = np.ones(N) / N
    u = np.ones(N) / N
    for _ in range(max_iter):
        danglesum = alpha * x[dangling].sum()
        if trunc_digits:
            s1 = tl(tl(alpha * x) @ S)
            s2 = tl(u * danglesum)
            s3 = tl(tl(np.full(N, 1.0 - alpha)) / N)
            x_new = tl(s1 + s2 + s3)
        else:
            x_new = alpha * (x @ S) + danglesum / N + (1 - alpha) / N
        err = np.abs(x_new - x).max()
        x = x_new
        if err < tol:
            break
    return {n: x[idx[n]] for n in nodes}

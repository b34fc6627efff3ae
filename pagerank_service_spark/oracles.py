"""Programmatic DuckDB oracle SQL for the iterative graph kernels.

The driver's correctness gate compares every ``queries()`` entry against
ANSI SQL run in DuckDB (rows + schema + order-insensitive value hash).
Iterative algorithms ARE SQL-expressible:

* connected components — recursive CTE computing the reachability
  closure over the symmetrized edges; component = MIN(reachable label);
* BFS distances — recursive CTE over (vertex, dist) pairs with a hop
  cap; distance = MIN(dist);
* triangle counting — the classic a<b<c three-way self-join;
* PageRank (standard + reference mode) and label propagation — a FIXED
  number of iterations unrolled as a chain of CTEs, generated here.
  The matching ``queries()`` entries run the engine with ``tol=0`` and
  the same iteration count, so both sides compute the identical
  fixed-point prefix. (Convergence-to-tolerance mode is exercised by
  the pytest oracles and the bench; iteration-for-iteration equality at
  fixed k is the stronger cross-engine parity statement anyway.)

Floating-point discipline: both engines do IEEE-754 double arithmetic;
the only divergence is summation ORDER inside aggregates (~1e-15
relative per iteration). Scalar expression trees below mirror the
engine's exact association (e.g. ``0.85*c + (0.85*dm*u + (1.0-0.85)*u)``
with u = fl(1/n)), and final ranks are rounded to 6 decimals on both
sides, orders of magnitude above the accumulated noise but far below
any semantic difference (a wrong dangling term or a missing
normalization shifts ranks at the 1e-3 scale on these graphs).

Every CTE that is referenced more than once is MATERIALIZED so the
unrolled chain stays linear in DuckDB's planner.
"""

from __future__ import annotations

# The customer->supplier interaction graph — identical to the
# `extract_edges_relational` oracle (already driver-green), reused as
# the base of every graph-kernel oracle.
EDGES_SQL = """
  SELECT o.o_custkey AS src, l.l_suppkey AS dst,
         ROUND(SUM(l.l_quantity), 4) AS weight
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY o.o_custkey, l.l_suppkey
  HAVING SUM(l.l_quantity) > 0
"""

# Per-symbol variant (J2/per-symbol PageRank analogue): the same graph
# restricted to one "symbol" partition of the interaction table.
EDGES_SYMBOL_SQL = """
  SELECT o.o_custkey AS src, l.l_suppkey AS dst,
         ROUND(SUM(l.l_quantity), 4) AS weight
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE l.l_returnflag = 'N'
  GROUP BY o.o_custkey, l.l_suppkey
  HAVING SUM(l.l_quantity) > 0
"""


def connected_components_sql(edges_sql: str = EDGES_SQL) -> str:
    return f"""
WITH RECURSIVE e AS MATERIALIZED ({edges_sql}),
sym AS MATERIALIZED (SELECT src AS s, dst AS d FROM e
                     UNION SELECT dst, src FROM e),
reach(v, lbl) AS (
  SELECT s, s FROM sym
  UNION
  SELECT sym.d, reach.lbl FROM reach JOIN sym ON sym.s = reach.v
)
SELECT v::BIGINT AS vid, MIN(lbl)::BIGINT AS component
FROM reach GROUP BY v
"""


def bfs_distances_sql(edges_sql: str = EDGES_SQL, max_hops: int = 21) -> str:
    """Single-source undirected BFS from the strongest-out-weight vertex
    (the engine's bfs_distances demo root), bounded at max_hops."""
    return f"""
WITH RECURSIVE e AS MATERIALIZED ({edges_sql}),
root AS MATERIALIZED (SELECT src AS r FROM e GROUP BY src
                      ORDER BY SUM(weight) DESC, src LIMIT 1),
sym AS MATERIALIZED (SELECT src AS s, dst AS d FROM e
                     UNION SELECT dst, src FROM e),
bfs(v, dist) AS (
  SELECT r, 0 FROM root
  UNION
  SELECT sym.d, bfs.dist + 1 FROM bfs JOIN sym ON sym.s = bfs.v
  WHERE bfs.dist < {max_hops}
)
SELECT (SELECT r FROM root)::BIGINT AS source, v::BIGINT AS vid,
       MIN(dist)::INT AS dist
FROM bfs GROUP BY v
"""


def triangle_count_sql(edges_sql: str = EDGES_SQL) -> str:
    return f"""
WITH e AS MATERIALIZED ({edges_sql}),
canon AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM e WHERE src <> dst),
tri AS MATERIALIZED (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM canon e1
  JOIN canon e2 ON e2.a = e1.b
  JOIN canon e3 ON e3.a = e1.a AND e3.b = e2.b),
allv AS (SELECT a AS vid FROM canon UNION SELECT b FROM canon),
cnt AS (SELECT vid, COUNT(*) AS c FROM (
          SELECT x AS vid FROM tri
          UNION ALL SELECT y FROM tri
          UNION ALL SELECT z FROM tri)
        GROUP BY vid)
SELECT v.vid::BIGINT AS vid, COALESCE(c.c, 0)::BIGINT AS triangles
FROM allv v LEFT JOIN cnt c ON c.vid = v.vid
"""


def pagerank_standard_sql(
    iters: int, alpha: float = 0.85, edges_sql: str = EDGES_SQL,
    round_digits: int = 6,
) -> str:
    """Damped PageRank, ``iters`` unrolled iterations.

    Mirrors graph/pagerank.py exactly: uniform init, row-normalized
    transition, dangling mass redistributed uniformly, rank =
    a*contrib + (a*dmass*u + (1-a)*u) with u = fl(1/n).
    """
    a = repr(alpha)
    parts = [f"""
WITH e AS MATERIALIZED ({edges_sql}),
tr AS MATERIALIZED (
  SELECT src, dst, weight / (SUM(weight) OVER (PARTITION BY src)) AS p
  FROM e),
v AS MATERIALIZED (SELECT src AS vid FROM e UNION SELECT dst FROM e),
un AS MATERIALIZED (SELECT 1.0 / COUNT(*) AS u FROM v),
outv AS MATERIALIZED (SELECT DISTINCT src AS vid FROM e),
r0 AS MATERIALIZED (SELECT vid, (SELECT u FROM un) AS rank FROM v)"""]
    for i in range(1, iters + 1):
        p = i - 1
        parts.append(f""",
d{i} AS MATERIALIZED (
  SELECT COALESCE(SUM(rank), 0.0) AS dm FROM r{p}
  WHERE vid NOT IN (SELECT vid FROM outv)),
c{i} AS MATERIALIZED (
  SELECT tr.dst AS vid, SUM(tr.p * r.rank) AS c
  FROM tr JOIN r{p} r ON r.vid = tr.src GROUP BY tr.dst),
r{i} AS MATERIALIZED (
  SELECT v.vid,
         ({a} * COALESCE(c.c, 0.0))
         + (({a} * (SELECT dm FROM d{i}) * (SELECT u FROM un))
            + ((1.0 - {a}) * (SELECT u FROM un))) AS rank
  FROM v LEFT JOIN c{i} c ON c.vid = v.vid)""")
    parts.append(f"""
SELECT vid::BIGINT AS vid, ROUND(rank, {round_digits}) AS rank FROM r{iters}
""")
    return "".join(parts)


def pagerank_reference_body(iters: int, edges_sql: str = EDGES_SQL) -> str:
    """Reference-mode weighted PageRank (network_util.py:503-724
    semantics) as a composable WITH-chain ending in CTE
    ``prfinal(vid, rank)``:

    alpha=1, virtual node max(vid)+1 bidirectionally linked to every
    positive-in-strength vertex at weight in_strength/10, dangling mass
    uniform; afterwards the virtual rank is redistributed
    proportionally (rank/(1-vpr)), normalized, the 0.5*in_w/sum(in_w)
    bonus added, and normalized again.
    """
    parts = [f"""
WITH e0 AS MATERIALIZED ({edges_sql}),
instr AS MATERIALIZED (SELECT dst AS vid, SUM(weight) AS in_w
                       FROM e0 GROUP BY dst),
vv AS MATERIALIZED (
  SELECT (SELECT GREATEST(MAX(src), MAX(dst)) FROM e0) + 1 AS v),
ve AS MATERIALIZED (SELECT vid, in_w / 10.0 AS weight
                    FROM instr WHERE in_w > 0),
e AS MATERIALIZED (
  SELECT src, dst, weight FROM e0
  UNION ALL SELECT (SELECT v FROM vv), vid, weight FROM ve
  UNION ALL SELECT vid, (SELECT v FROM vv), weight FROM ve),
tr AS MATERIALIZED (
  SELECT src, dst, weight / (SUM(weight) OVER (PARTITION BY src)) AS p
  FROM e),
v AS MATERIALIZED (SELECT src AS vid FROM e UNION SELECT dst FROM e),
un AS MATERIALIZED (SELECT 1.0 / COUNT(*) AS u FROM v),
outv AS MATERIALIZED (SELECT DISTINCT src AS vid FROM e),
r0 AS MATERIALIZED (SELECT vid, (SELECT u FROM un) AS rank FROM v)"""]
    for i in range(1, iters + 1):
        p = i - 1
        parts.append(f""",
d{i} AS MATERIALIZED (
  SELECT COALESCE(SUM(rank), 0.0) AS dm FROM r{p}
  WHERE vid NOT IN (SELECT vid FROM outv)),
c{i} AS MATERIALIZED (
  SELECT tr.dst AS vid, SUM(tr.p * r.rank) AS c
  FROM tr JOIN r{p} r ON r.vid = tr.src GROUP BY tr.dst),
r{i} AS MATERIALIZED (
  SELECT v.vid,
         (1.0 * COALESCE(c.c, 0.0))
         + ((1.0 * (SELECT dm FROM d{i}) * (SELECT u FROM un))
            + ((1.0 - 1.0) * (SELECT u FROM un))) AS rank
  FROM v LEFT JOIN c{i} c ON c.vid = v.vid)""")
    parts.append(f""",
vpr AS MATERIALIZED (
  SELECT COALESCE(SUM(rank), 0.0) AS vp FROM r{iters}
  WHERE vid = (SELECT v FROM vv)),
p1 AS MATERIALIZED (
  SELECT vid, rank / (1.0 - (SELECT vp FROM vpr)) AS rank
  FROM r{iters} WHERE vid <> (SELECT v FROM vv)),
t1 AS MATERIALIZED (SELECT SUM(rank) AS t FROM p1),
p2 AS MATERIALIZED (
  SELECT vid, rank / (SELECT t FROM t1) AS rank FROM p1),
si AS MATERIALIZED (SELECT SUM(in_w) AS s FROM instr),
p3 AS MATERIALIZED (
  SELECT p.vid,
         p.rank + ((0.5 * COALESCE(i.in_w, 0.0)) / (SELECT s FROM si)) AS rank
  FROM p2 p LEFT JOIN instr i ON i.vid = p.vid),
t2 AS MATERIALIZED (SELECT SUM(rank) AS t FROM p3),
prfinal AS MATERIALIZED (
  SELECT vid, rank / (SELECT t FROM t2) AS rank FROM p3)""")
    return "".join(parts)


def pagerank_reference_sql(
    iters: int, edges_sql: str = EDGES_SQL, round_digits: int = 6,
) -> str:
    return (
        pagerank_reference_body(iters, edges_sql)
        + f"""
SELECT vid::BIGINT AS vid, ROUND(rank, {round_digits}) AS rank FROM prfinal
"""
    )


def agf_daily_sql(iters: int, reward_pool: float = 10000.0) -> str:
    """The daily composition after PageRank (calcalate_util.py:149-197 +
    earnings_pr_job.py:89-121): rank x capped AGF multiplier,
    renormalize, reward = share x pool, drop zeros."""
    return (
        pagerank_reference_body(iters)
        + f""",
m AS MATERIALIZED (
  SELECT c_custkey AS vid,
         CASE WHEN c_acctbal / 1000.0 > 1.5 THEN 1.0
              ELSE GREATEST(c_acctbal / 1000.0, 0.1) END AS mult
  FROM customer),
adj AS MATERIALIZED (
  SELECT p.vid, p.rank * COALESCE(m.mult, 1.0) AS v
  FROM prfinal p LEFT JOIN m ON m.vid = p.vid),
t3 AS MATERIALIZED (SELECT SUM(v) AS t FROM adj)
SELECT vid::BIGINT AS vid,
       ROUND((v / (SELECT t FROM t3)) * {reward_pool!r}, 6) AS amount
FROM adj
WHERE ROUND((v / (SELECT t FROM t3)) * {reward_pool!r}, 6) > 0
"""
    )


def label_propagation_sql(iters: int, edges_sql: str = EDGES_SQL) -> str:
    """Deterministic synchronous LP, ``iters`` unrolled rounds (weighted
    plurality, ties toward the smaller label). Extra rounds past the
    fixpoint are identity, so engine early-stop at the fixpoint still
    matches the fully-unrolled SQL. All-integer result — exact."""
    parts = [f"""
WITH e AS MATERIALIZED ({edges_sql}),
und AS MATERIALIZED (
  SELECT src, dst, SUM(weight) AS w FROM (
    SELECT src, dst, weight FROM e
    UNION ALL SELECT dst AS src, src AS dst, weight FROM e)
  GROUP BY src, dst),
v AS MATERIALIZED (SELECT DISTINCT src AS vid FROM und),
l0 AS MATERIALIZED (SELECT vid, vid AS label FROM v)"""]
    for i in range(1, iters + 1):
        p = i - 1
        parts.append(f""",
vt{i} AS MATERIALIZED (
  SELECT und.dst AS vid, l.label, SUM(und.w) AS w
  FROM und JOIN l{p} l ON l.vid = und.src
  GROUP BY und.dst, l.label),
b{i} AS MATERIALIZED (
  SELECT vid, label AS new_label FROM (
    SELECT vid, label,
           ROW_NUMBER() OVER (PARTITION BY vid
                              ORDER BY w DESC, label ASC) AS rn
    FROM vt{i}) WHERE rn = 1),
l{i} AS MATERIALIZED (
  SELECT l.vid, COALESCE(b.new_label, l.label) AS label
  FROM l{p} l LEFT JOIN b{i} b ON b.vid = l.vid)""")
    parts.append(f"""
SELECT vid::BIGINT AS vid, label::BIGINT AS label FROM l{iters}
""")
    return "".join(parts)

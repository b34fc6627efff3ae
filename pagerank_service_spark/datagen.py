"""Deterministic synthetic inputs (FIXTURES.md).

Two families:

1. ``repos_df`` — the BASELINE.json input_hint table
   ``repos(repo, path, commit, lang, content)``. Generated *distributed*
   (``spark.range`` -> ``mapInPandas``) so the bench can synthesize
   500k+ files in parallel; every row's content is a pure function of
   its file index (per-row hash-seeded RNG), so the table is
   byte-deterministic regardless of partitioning or parallelism level —
   the property the scaling-efficiency benchmark depends on.

2. ``fixture_edges`` — named deterministic graphs with known structure
   (chain, star hub, cliques+bridge, bidirectional pairs, seeded Zipf
   random digraph) used by the graph-kernel tests and the bench.

A few files are "hubs" imported by thousands of others (Zipf target
choice) to exercise the skew-salting path, mirroring the hub wallets the
reference's link graph develops.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from .schemas import REPOS

_EXT = {"python": "py", "go": "go", "rust": "rs"}
_LANGS = ("python", "go", "rust")


def _zipf_idx(rng: np.random.Generator, n: int, size: int, a: float = 1.5) -> np.ndarray:
    """Zipf-distributed indices in [0, n) — index 0 is the hottest."""
    ranks = rng.zipf(a, size=size)
    return np.minimum(ranks - 1, n - 1)


def _gen_rows(indices: np.ndarray, files_per_repo: int, n_repos: int,
              repos_per_org: int, seed: int) -> pd.DataFrame:
    rows = {"repo": [], "path": [], "commit": [], "lang": [], "content": []}
    for i in indices:
        i = int(i)
        repo_idx = i // files_per_repo
        mod_idx = i % files_per_repo
        org = repo_idx // repos_per_org
        repo = f"org{org}/repo{repo_idx}"
        lang = _LANGS[hash_u64(f"{seed}:{i}:lang") % 3]
        path = f"src/mod_{mod_idx:03d}.{_EXT[lang]}"
        rng = np.random.default_rng(hash_u64(f"{seed}:{i}:rng"))
        # K import statements, Zipf so a few files import heavily
        k = int(min(rng.zipf(1.4), 40))
        lines = [f"# module mod_{mod_idx:03d} of {repo}", f'"""file {i}"""']
        # same-repo imports target Zipf-hot modules (mod_000 is the repo hub)
        n_same = int(rng.integers(0, k + 1))
        for t in _zipf_idx(rng, files_per_repo, n_same):
            if int(t) != mod_idx:
                lines.append(f"import mod_{int(t):03d}")
        # cross-repo imports target Zipf-hot repos (org0/repo0 is global hub)
        for t in _zipf_idx(rng, n_repos, k - n_same):
            tr = int(t)
            if tr != repo_idx:
                t_org = tr // repos_per_org
                t_mod = int(_zipf_idx(rng, files_per_repo, 1)[0])
                lines.append(f"from org{t_org}.repo{tr}.mod_{t_mod:03d} import x")
        lines.append(f"def fn_{i}():")
        lines.append(f"    return {i}")
        content = "\n".join(lines)
        rows["repo"].append(repo)
        rows["path"].append(path)
        rows["commit"].append(hashlib.sha256(f"{repo}/{path}".encode()).hexdigest()[:40])
        rows["lang"].append(lang)
        rows["content"].append(content)
    return pd.DataFrame(rows)


def hash_u64(s: str) -> int:
    """Deterministic 64-bit hash (stable across processes, unlike hash())."""
    return int.from_bytes(hashlib.sha256(s.encode()).digest()[:8], "big")


def repos_df(
    spark: SparkSession,
    n_files: int = 200,
    files_per_repo: int = 100,
    repos_per_org: int = 50,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic ``repos`` table."""
    n_repos = max(1, (n_files + files_per_repo - 1) // files_per_repo)
    parts = partitions or max(1, min(n_files // 1000, 256)) or 1

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield _gen_rows(b["id"].to_numpy(), files_per_repo, n_repos,
                            repos_per_org, seed)

    return spark.range(0, n_files, numPartitions=parts).mapInPandas(gen, schema=REPOS)


def repos_sql_df(spark: SparkSession, n_files: int = 1000,
                 files_per_repo: int = 100) -> DataFrame:
    """A ``repos`` table whose content is a pure SQL function of the row
    id (md5-derived pseudo-randomness, no RNG) — byte-identically
    reproducible by any ANSI engine, which lets the driver's DuckDB
    oracle re-derive the ground-truth import graph independently and
    check the whole regex-extraction pipeline against it.

    Each file i imports k = 1 + (H('k:i') % 6) targets
    t_j = H('t:i:j') % n_files (self-imports skipped): same-repo targets
    as ``import mod_XXX`` lines, cross-repo as
    ``from org0.repoR.mod_XXX import x`` — the two reference-statement
    shapes extract.py parses. Entirely whole-stage codegen.
    """
    fpr = files_per_repo
    h = "cast(conv(substring(md5({x}), 1, 15), 16, 10) as bigint)"
    h_k = h.format(x="concat('k:', id)")
    h_t = h.format(x="concat('t:', id, ':', j)")
    k = f"(1 + pmod({h_k}, 6))"
    t = f"pmod({h_t}, {n_files})"
    line = (
        f"CASE WHEN {t} = id THEN NULL "
        f"WHEN {t} div {fpr} = id div {fpr} "
        f"THEN concat('import mod_', lpad(cast({t} % {fpr} as string), 3, '0')) "
        f"ELSE concat('from org0.repo', cast({t} div {fpr} as string), "
        f"'.mod_', lpad(cast({t} % {fpr} as string), 3, '0'), ' import x') END"
    )
    content = (
        f"array_join(concat(array(concat('# module ', id)), "
        f"filter(transform(sequence(0, {k} - 1), j -> {line}), "
        f"x -> x IS NOT NULL)), '\\n')"
    )
    return spark.range(n_files).select(
        F.expr(f"concat('org0/repo', cast(id div {fpr} as string))").alias("repo"),
        F.expr(f"concat('src/mod_', lpad(cast(id % {fpr} as string), 3, '0'), "
               f"'.py')").alias("path"),
        F.expr("md5(concat('commit:', id))").alias("commit"),
        F.lit("python").alias("lang"),
        F.expr(content).alias("content"),
    )


# ---------------------------------------------------------------------------
# Named fixture graphs (FIXTURES.md §3): (src, dst, weight) triples.
# ---------------------------------------------------------------------------

def fixture_edges(name: str, seed: int = 42) -> list[tuple[int, int, float]]:
    if name == "chain10":
        return [(i, i + 1, 1.0) for i in range(1, 10)]
    if name == "bipair":
        # disjoint bidirectional pairs i <-> i+1 — the reference's minimal
        # real case (every link materialized as two directed edges,
        # network_util.py:280-286)
        out = []
        for i in range(1, 11, 2):
            out.append((i, i + 1, 1.0))
            out.append((i + 1, i, 1.0))
        return out
    if name == "star_hub":
        out = []
        for i in range(2, 1002):
            out.append((1, i, 1.0))
            out.append((i, 1, 1.0))
        return out
    if name == "two_cliques_bridge":
        out = []
        for base in (0, 10):
            for a in range(base + 1, base + 6):
                for b in range(base + 1, base + 6):
                    if a != b:
                        out.append((a, b, 1.0))
        out.append((3, 13, 1.0))  # bridge
        return out
    if name.startswith("zipf_rand"):
        n_edges = int(name.split(":")[1]) if ":" in name else 1000
        return zipf_random_edges(n_edges, seed=seed)
    raise ValueError(f"unknown fixture graph {name!r}")


def zipf_random_edges(n_edges: int, n_nodes: int | None = None,
                      seed: int = 42) -> list[tuple[int, int, float]]:
    """Seeded Zipf-degree random digraph; dst is Zipf-hot (hub skew)."""
    rng = np.random.default_rng(seed)
    n_nodes = n_nodes or max(4, n_edges // 8)
    src = rng.integers(0, n_nodes, size=n_edges)
    dst = np.minimum(rng.zipf(1.3, size=n_edges) - 1, n_nodes - 1)
    w = rng.uniform(0.1, 10.0, size=n_edges)
    mask = src != dst
    # collapse duplicates (sum weights) for a clean weighted simple digraph
    agg: dict[tuple[int, int], float] = {}
    for s, d, ww in zip(src[mask].tolist(), dst[mask].tolist(), w[mask].tolist()):
        agg[(s, d)] = agg.get((s, d), 0.0) + ww
    return [(s, d, ww) for (s, d), ww in sorted(agg.items())]


def zipf_random_edges_df(spark: SparkSession, n_edges: int,
                         n_nodes: int | None = None, seed: int = 42,
                         partitions: int = 32) -> DataFrame:
    """Distributed variant for bench-scale graphs.

    Each spark.range row deterministically expands to a block of edges
    (per-block seeded RNG) — duplicates are NOT collapsed here; callers
    run the engine's own groupBy(src,dst).sum first, which is itself part
    of the measured pipeline (operator A1 in SURVEY.md §2.4).
    """
    from .schemas import EDGES

    n_nodes_ = n_nodes or max(4, n_edges // 8)
    block = 65536
    n_blocks = (n_edges + block - 1) // block

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            for blk in b["id"].to_numpy():
                blk = int(blk)
                size = min(block, n_edges - blk * block)
                if size <= 0:
                    continue
                rng = np.random.default_rng(hash_u64(f"{seed}:{blk}"))
                src = rng.integers(0, n_nodes_, size=size)
                dst = np.minimum(rng.zipf(1.3, size=size) - 1, n_nodes_ - 1)
                w = rng.uniform(0.1, 10.0, size=size)
                mask = src != dst
                yield pd.DataFrame(
                    {"src": src[mask], "dst": dst[mask], "weight": w[mask]}
                )

    return spark.range(0, n_blocks, numPartitions=min(partitions, n_blocks)).mapInPandas(
        gen, schema=EDGES
    )


def link_events_df(
    spark: SparkSession,
    n_events: int,
    n_users: int | None = None,
    day: int = 0,
    seed: int = 42,
    partitions: int = 32,
    removal_rate: float = 0.02,
) -> DataFrame:
    """Deterministic day of link events for the lifecycle bench: Zipf-hot
    user pairs (hub skew), link ids ``L{day}:{i}``, plus ``removal_rate``
    rescission events (``is_award=false``) naming links created the
    PREVIOUS day — so a multi-day run exercises state growth AND
    contraction. Same block-expansion shape as zipf_random_edges_df."""
    from .schemas import LINK_EVENTS

    n_users_ = n_users or max(8, n_events // 4)
    block = 32768
    n_blocks = (n_events + block - 1) // block
    day_start = 1_700_000_000 + day * 86_400

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            for blk in b["id"].to_numpy():
                blk = int(blk)
                size = min(block, n_events - blk * block)
                if size <= 0:
                    continue
                rng = np.random.default_rng(hash_u64(f"ev:{seed}:{day}:{blk}"))
                base = blk * block
                ua = rng.integers(0, n_users_, size=size)
                ub = np.minimum(rng.zipf(1.4, size=size) - 1, n_users_ - 1)
                ub = np.where(ub == ua, (ua + 1) % n_users_, ub)
                amt = rng.uniform(50.0, 500.0, size=size)
                lock = rng.integers(1, 31, size=size)
                n_rm = int(size * removal_rate) if day > 0 else 0
                rm_ref = rng.integers(0, n_events, size=n_rm)
                rows = {
                    "link_contract": [f"L{day}:{base + i}" for i in range(size)],
                    "user_a": [f"0xu{u:06d}" for u in ua],
                    "user_b": [f"0xu{u:06d}" for u in ub],
                    "symbol": ["LUCA"] * size,
                    "amount_a": amt,
                    "amount_b": amt,
                    "percent_a": np.full(size, 50, dtype="int32"),
                    "lock_days": lock.astype("int32"),
                    "start_time": np.full(size, day_start, dtype="int64")
                    + rng.integers(0, 86_400, size=size),
                    "is_award": np.ones(size, dtype=bool),
                    "chain": ["bsc"] * size,
                    "event_seq": np.arange(base, base + size, dtype="int64")
                    + day * 10 * n_events,
                }
                df = pd.DataFrame(rows)
                if n_rm:
                    rm = pd.DataFrame(
                        {
                            "link_contract": [f"L{day - 1}:{r}" for r in rm_ref],
                            "user_a": ["0x"] * n_rm,  # removal keys on link
                            "user_b": ["0x"] * n_rm,
                            "symbol": ["LUCA"] * n_rm,
                            "amount_a": np.zeros(n_rm),
                            "amount_b": np.zeros(n_rm),
                            "percent_a": np.full(n_rm, 50, dtype="int32"),
                            "lock_days": np.full(n_rm, 1, dtype="int32"),
                            "start_time": np.full(n_rm, day_start, dtype="int64"),
                            "is_award": np.zeros(n_rm, dtype=bool),
                            "chain": ["bsc"] * n_rm,
                            "event_seq": np.arange(n_rm, dtype="int64")
                            + day * 10 * n_events + 9 * n_events,
                        }
                    )
                    df = pd.concat([df, rm], ignore_index=True)
                yield df

    return spark.range(0, n_blocks, numPartitions=min(partitions, n_blocks)).mapInPandas(
        gen, schema=LINK_EVENTS
    )

#!/usr/bin/env python
"""Round-6 headline-loop experiment (measurement only; bench.py frozen).

Builds the exact headline graph (sf from $SPARK_GRAFT_SF_DIR), then runs
fixed-work pagerank_on_context (tol=0, fixed iters) across variants:
partition count x rank-side join strategy. Reports min/median chunk secs
per variant, interleaved repeats. Also prints the steady-state step plan
for the chosen variants.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bench import CPUS, SF_DIR, _session, sf_of  # noqa: E402


def main() -> None:
    import pagerank_service_spark.graph.pagerank as prmod
    from pagerank_service_spark.datagen import repos_df
    from pagerank_service_spark.extract import build_edges
    from pagerank_service_spark.graph.pagerank import (
        pagerank_on_context,
        prepare_graph,
    )

    iters = int(os.environ.get("EXP_ITERS", "9"))
    repeats = int(os.environ.get("EXP_REPEATS", "3"))
    sf = sf_of(SF_DIR)
    spark = _session(CPUS)
    n_files = max(20_000, int(1_500_000 * sf))
    repos = repos_df(spark, n_files=n_files, files_per_repo=100,
                     partitions=2 * CPUS).persist()
    repos.count()
    _, edges = build_edges(repos)
    edges = edges.persist()
    n_edges = edges.count()
    print(f"# edges={n_edges}", flush=True)

    orig_messages = prmod._messages

    def hinted_messages(ctx, ranks, kernel, salt):
        rank_side = ranks.withColumnRenamed("vid", "src").hint("shuffle_hash")
        joined = ctx.trans.join(rank_side, "src").select(
            "dst", (F.col("p") * F.col("rank")).alias("c")
        )
        if kernel == "arrow":
            joined = prmod._arrow_partial_agg(joined)
        return joined

    variants = []
    for p in (None, 32, 64):
        for hint in (False, True):
            variants.append((p, hint))

    ctxs = {}
    results: dict[str, list] = {}
    for p, hint in variants:
        key = f"p={p or 'auto'},hint={hint}"
        results[key] = []
    for rep in range(repeats):
        for p, hint in variants:
            key = f"p={p or 'auto'},hint={hint}"
            if p not in ctxs:
                ctxs[p] = prepare_graph(edges, num_partitions=p)
            prmod._messages = hinted_messages if hint else orig_messages
            t0 = time.time()
            r = pagerank_on_context(ctxs[p], mode="reference", tol=0.0,
                                    max_iter=iters, chunk=3, metric_every=1,
                                    unpersist=False)
            el = time.time() - t0
            # skip the first chunk (JIT warmup) for the steady-state stat
            steady = r.iter_secs[1:] or r.iter_secs
            results[key].append({
                "wall": round(el, 2),
                "chunks": [round(s, 3) for s in r.iter_secs],
                "steady_min": round(min(steady), 3),
            })
            print(f"rep{rep} {key}: wall={el:.2f} chunks="
                  f"{[round(s, 2) for s in r.iter_secs]}", flush=True)
    prmod._messages = orig_messages
    summary = {
        k: {
            "steady_min": min(s["steady_min"] for s in v),
            "walls": [s["wall"] for s in v],
        }
        for k, v in results.items()
    }
    print(json.dumps(summary, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()

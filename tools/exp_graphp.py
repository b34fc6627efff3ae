#!/usr/bin/env python
"""Round-6 partition-count A/B for connected components / triangles /
label propagation over the bench edge table (measurement only)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import CPUS, SF_DIR, _session  # noqa: E402


def main() -> None:
    from pagerank_service_spark.graph.components import connected_components
    from pagerank_service_spark.graph.labelprop import label_propagation
    from pagerank_service_spark.graph.triangles import triangle_counts
    from pagerank_service_spark.operators.graph_queries import _edges

    repeats = int(os.environ.get("EXP_REPEATS", "2"))
    spark = _session(CPUS)
    e = _edges(spark, SF_DIR).persist()
    print(f"# edges={e.count()}", flush=True)

    runs = {
        "cc": lambda p: connected_components(e, num_partitions=p).components.count(),
        "tri": lambda p: triangle_counts(e, num_partitions=p).per_vertex.count(),
        "lp": lambda p: label_propagation(e, max_iter=10,
                                          num_partitions=p).labels.count(),
    }
    out: dict[str, dict] = {k: {} for k in runs}
    for rep in range(repeats):
        for name, fn in runs.items():
            for p in (None, 16, 32, 64):
                key = str(p or "auto")
                t0 = time.time()
                fn(p)
                el = round(time.time() - t0, 2)
                cur = out[name].setdefault(key, [])
                cur.append(el)
                print(f"rep{rep} {name} p={key}: {el}s", flush=True)
    print(json.dumps({k: {p: min(v) for p, v in d.items()}
                      for k, d in out.items()}, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()

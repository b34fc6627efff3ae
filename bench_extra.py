#!/usr/bin/env python
"""Round-6 optimization-round instrumentation (bench.py is FROZEN for
measurement, so all extra benchmarking lives here — guide §1).

Modes:
  --queries       time each bench.py HEADLINE query (same count()
                  methodology, interleaved repeats) and dump
                  .explain("formatted") into plans/r06/<q>_<tag>.txt
  --headline      the bench.py headline pagerank path (prepare once,
                  best-of-repeats convergence loop)
  --noop QUERY    time one query with the noop sink (computation only)

Usage: python bench_extra.py --queries --tag before
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import CPUS, HEADLINE_QUERIES, SF_DIR, _session, sf_of  # noqa: E402


def capture_plans(spark, sf_dir: str, tag: str, names: list[str]) -> None:
    from pagerank_service_spark.registry import all_queries

    os.makedirs("plans/r06", exist_ok=True)
    qs = all_queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(f"plans/r06/{name}_{tag}.txt", "w") as f:
            f.write(plan)


def time_queries(spark, sf_dir: str, repeats: int, names: list[str]) -> dict:
    from pagerank_service_spark.registry import all_queries

    qs = all_queries()
    times: dict[str, float] = {}
    samples: dict[str, list] = {n: [] for n in names}
    for _ in range(repeats):
        for name in names:
            spark.sparkContext.setJobDescription(f"bench_extra: {name}")
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            el = time.time() - t0
            samples[name].append(round(el, 2))
            if name not in times or el < times[name]:
                times[name] = el
            spark.sparkContext.setJobDescription(None)
    return {"min": {k: round(v, 2) for k, v in times.items()},
            "samples": samples}


def noop_time(spark, sf_dir: str, name: str, repeats: int) -> dict:
    from pagerank_service_spark.registry import all_queries

    qs = all_queries()
    out = []
    for _ in range(repeats):
        spark.sparkContext.setJobDescription(f"noop: {name}")
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        out.append(round(time.time() - t0, 2))
        spark.sparkContext.setJobDescription(None)
    return {"query": name, "noop_secs": out}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", action="store_true")
    ap.add_argument("--headline", action="store_true")
    ap.add_argument("--noop", default=None)
    ap.add_argument("--tag", default="before")
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--only", default=None,
                    help="comma-separated subset of HEADLINE_QUERIES")
    ap.add_argument("--no-plans", action="store_true")
    args = ap.parse_args()

    names = (args.only.split(",") if args.only else HEADLINE_QUERIES)
    spark = _session(CPUS)
    if args.noop:
        print(json.dumps(noop_time(spark, SF_DIR, args.noop, args.repeats)))
    elif args.headline:
        from bench import headline_pagerank

        print(json.dumps(headline_pagerank(spark, sf_of(SF_DIR),
                                           repeats=args.repeats)))
    elif args.queries:
        if not args.no_plans:
            capture_plans(spark, SF_DIR, args.tag, names)
        r = time_queries(spark, SF_DIR, args.repeats, names)
        print(json.dumps(r))
    spark.stop()


if __name__ == "__main__":
    main()

"""Re-measure the scaling-efficiency pairs and splice them into the
existing BENCH artifacts (RESULT_full.json + regenerated BASELINE.md).

The full bench's scaling section is occasionally poisoned by hypervisor
CPU-steal on this shared VM (non-monotonic per-level minima are the
tell).  This tool re-runs ONLY the scaling phase — same protocol as
bench.main: graph prepared once, fresh JVM per level, interleaved
repeats, per-level MIN — and rewrites the scaling keys of
BENCH/RESULT_full.json, then regenerates BENCH/BASELINE.md from the
merged result.

Usage: python tools/rerun_scaling.py [--repeats 2] [--iters 5]
"""
import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--scale-n", type=int, default=1)
    ap.add_argument("--edges", type=int, default=None,
                    help="default: same count as the recorded run")
    ap.add_argument("--graph-dir", default="/tmp/spark-graft-scaling-graph")
    args = ap.parse_args()

    with open("BENCH/RESULT_full.json") as f:
        result = json.load(f)

    sf = result.get("sf", 0.1)
    edges = args.edges or max(1_000_000, int(120_000_000 * sf / 0.1))
    print(f"preparing {edges:,}-edge graph in {args.graph_dir}", flush=True)
    bench._run_sub(["--prepare-graph", "--edges", str(edges),
                    "--graph-dir", args.graph_dir])

    best = {}
    for r in range(args.repeats):
        for name, cpus in (("lo", args.scale_n), ("hi", args.scale_n * 4),
                           ("lo2", args.scale_n * 2), ("hi2", args.scale_n * 8)):
            run = bench.run_scaling_subprocess(cpus, args.graph_dir, args.iters)
            print(f"repeat {r} local[{cpus}]: min_iter {run['min_iter_secs']}s "
                  f"{run['iter_secs']}", flush=True)
            if name not in best or run["min_iter_secs"] < best[name]["min_iter_secs"]:
                best[name] = run
    shutil.rmtree(args.graph_dir, ignore_errors=True)

    lo, hi, lo2, hi2 = best["lo"], best["hi"], best["lo2"], best["hi2"]
    eff = round((lo["min_iter_secs"] / hi["min_iter_secs"]) / 4, 3)
    eff2 = round((lo2["min_iter_secs"] / hi2["min_iter_secs"]) / 4, 3)
    print(f"eff(1->4)={eff}  eff(2->8)={eff2}", flush=True)

    result["scaling"] = {"low": lo, "high": hi, "low2": lo2, "high2": hi2}
    result["scaling_efficiency"] = eff
    result["scaling_efficiency_2n"] = eff2
    best = bench.merge_scaling_history([lo, hi, lo2, hi2])
    result["scaling_efficiency_best_known"] = bench.best_known_efficiency(
        best, lo["cpus"])
    result["scaling_efficiency_2n_best_known"] = bench.best_known_efficiency(
        best, lo2["cpus"])
    result["scaling_best_known"] = {str(k): v for k, v in best.items()}
    with open("BENCH/RESULT_full.json", "w") as f:
        json.dump(result, f, indent=1)
    bench.write_baseline_md(result, lo, hi, lo2, hi2)
    print("BENCH/RESULT_full.json + BENCH/BASELINE.md updated", flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Round-6 evidence tool: count Spark jobs per query via statusTracker.

Usage: python tools/exp_jobcount.py  (repo root; SPARK_GRAFT_SF_DIR honored).
Run against two checkouts (e.g. a git worktree at the baseline commit)
for the A/B in OPTIMIZATION_r06.md section 4 - job counts are immune to
this VM hypervisor latency noise, walls are not.
"""
import os, sys, time, json, urllib.request
sys.path.insert(0, '/root/repo'); os.chdir('/root/repo')
from bench import CPUS, SF_DIR, _session
spark = _session(CPUS)
sc = spark.sparkContext
st = sc.statusTracker()

def njobs():
    return len(st.getJobIdsForGroup(None))
from pagerank_service_spark.registry import all_queries
qs = all_queries()
out = {}
for name in ("connected_components", "triangle_count"):
    qs[name](spark, SF_DIR).count()  # warm (codegen)
    j0 = njobs(); t0 = time.time()
    qs[name](spark, SF_DIR).count()
    out[name] = {"jobs": njobs()-j0, "secs": round(time.time()-t0,2)}
# one pagerank_reference-style call (registry query, tol=0 fixed)
qs["pagerank_reference"](spark, SF_DIR).count()
j0 = njobs(); t0=time.time()
qs["pagerank_reference"](spark, SF_DIR).count()
out["pagerank_reference(tol0,30it)"] = {"jobs": njobs()-j0, "secs": round(time.time()-t0,2)}
# convergence-mode pagerank like the daily path: tol=1e-6 chunk=3 metric_every=3
from pagerank_service_spark.operators.graph_queries import _edges
from pagerank_service_spark.graph.pagerank import pagerank
r = pagerank(_edges(spark, SF_DIR), mode="reference", tol=1e-6, max_iter=60, chunk=3, metric_every=3)
j0 = njobs(); t0=time.time()
r = pagerank(_edges(spark, SF_DIR), mode="reference", tol=1e-6, max_iter=60, chunk=3, metric_every=3)
out["pagerank(tol1e-6,chunk3,me3)"] = {"jobs": njobs()-j0, "secs": round(time.time()-t0,2), "iters": r.iterations}
print(json.dumps(out, indent=1))
spark.stop()

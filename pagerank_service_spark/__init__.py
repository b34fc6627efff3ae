"""pagerank_service_spark — a PySpark-native link-graph analytics engine.

Built from scratch with the computational capabilities of the reference
service ``ATM-Developer/pagerank-service`` (studied read-only at
``/root/reference``): edge extraction from a table of source-code
repositories, weighted PageRank matching the reference's converged
per-vertex scores (``project/utils/network_util.py:503-724`` semantics)
to allclose 1e-6, plus connected components, label propagation and
triangle counting — all expressed as DataFrame transforms so Catalyst /
Tungsten / AQE pick the physical strategy, with vectorized Arrow kernels
only where DataFrame ops genuinely cannot express the semantics.

Layout:
    session.py    SparkSession factory (Arrow, AQE, shuffle-partition knobs)
    schemas.py    explicit StructTypes for every table the engine touches
    datagen.py    deterministic synthetic inputs (repos table, fixture graphs)
    extract.py    repos -> (vertices, edges) with sha256 row invariant
    graph/        pagerank, components, labelprop, triangles, bfs, loop harness
    operators/    relational operator library (SURVEY.md §2 coverage)
    functions/    text analysis, dedup (minhash/simhash), similarity, truncation
    checkpoint.py rank-vector checkpoints w/ per-partition lineage + metrics
    cli.py        spark-submit entry point
"""

__version__ = "0.1.0"

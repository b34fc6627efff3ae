"""Graph algorithms: PageRank, connected components, label propagation,
triangle counting, bounded BFS — all as DataFrame transforms driven by a
shared iteration harness (``loop.py``).

Import submodules directly (``from pagerank_service_spark.graph import
pagerank``) — the package re-exports nothing so module names never get
shadowed by same-named functions.
"""

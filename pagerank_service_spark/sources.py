"""Input-source resolution (SURVEY §2.1 S1/S2): one reader for every
location the ``repos`` table can live in.

The production input is an Iceberg table (BASELINE.json input_hint /
north rule); this sandbox ships no Iceberg runtime jar, so resolution is
format-agnostic behind a URI scheme:

* ``iceberg:<catalog.db.table>`` or ``table:<name>`` ->
  ``spark.read.table`` against whatever catalog the cluster configures
  (Iceberg, Hive metastore, or a registered view — which is how the
  local tests exercise this path without the jar).
* anything else -> a parquet path/glob.

Two things matter at 10^12-file scale and are handled here, not left to
callers:

* **snapshot pinning** — a multi-hour extraction must read ONE immutable
  table state, not a moving head; ``snapshot_id`` / ``as_of_ms`` map to
  Iceberg's ``snapshot-id`` / ``as-of-timestamp`` read options (the
  reference's analogue is the per-day frozen snapshot directory,
  ``/root/reference/project/utils/cache_util.py:17-64``);
* **column pruning at the source** — the projection is applied directly
  on the scan so ReadSchema carries only the requested columns (for
  extraction: repo/path/content — the 2-of-5 to 3-of-5 column scans the
  physical-plan audit in PLANS.md verifies).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# the input_hint schema; extraction itself needs only the first three
REPOS_COLUMNS = ("repo", "path", "commit", "lang", "content")
EXTRACT_COLUMNS = ("repo", "path", "content")


def _quote_ident(name: str) -> str:
    """Backtick-quote each part of a (possibly dotted) identifier so a
    raw URI string can never inject into the DESCRIBE statement."""
    return ".".join("`" + p.replace("`", "``") + "`" for p in name.split("."))


def _table_provider(spark: SparkSession, name: str) -> str | None:
    """The catalog provider of ``name``: ``"iceberg"``/``"parquet"``/...
    for provider-backed tables, ``"view"`` for (temp) views, ``None``
    when the catalog exposes no provider metadata (external v2 catalogs
    whose tables the session-catalog metadata APIs can miss)."""
    try:
        t = spark.catalog.getTable(name)
    except Exception:
        return None  # let spark.read.table raise its own not-found error
    if (t.tableType or "").upper() in ("VIEW", "TEMPORARY", "TEMP"):
        return "view"
    try:
        rows = spark.sql(
            f"DESCRIBE TABLE EXTENDED {_quote_ident(name)}").collect()
    except Exception:
        return None
    for r in rows:
        if (r["col_name"] or "").strip() == "Provider":
            return (r["data_type"] or "").strip().lower()
    return None


def read_table(
    spark: SparkSession,
    source: str,
    snapshot_id: int | None = None,
    as_of_ms: int | None = None,
    columns: tuple[str, ...] | list[str] | None = None,
    allow_unverified_snapshot: bool = False,
) -> DataFrame:
    """Resolve ``source`` to a DataFrame, optionally time-traveled and
    column-pruned. Snapshot options are only meaningful for catalog
    tables; passing them with a parquet path raises (silent ignoring
    would fake reproducibility).

    ``allow_unverified_snapshot`` (or env
    ``SPARK_GRAFT_ALLOW_UNVERIFIED_SNAPSHOT=1``) opts in to attempting a
    pinned read on a table whose provider the session catalog cannot
    determine (external v2 catalogs). Off by default: parquet/Hive and
    many DSv2 connectors silently IGNORE snapshot read options, so
    proceeding on a warning could return current data as if pinned —
    the exact fake reproducibility this check exists to prevent."""
    is_catalog = source.startswith(("iceberg:", "table:"))
    pinned = snapshot_id is not None or as_of_ms is not None
    if pinned and not is_catalog:
        raise ValueError(
            "snapshot pinning requires a catalog table "
            f"(iceberg:/table: URI), got path {source!r}"
        )
    if is_catalog:
        name = source.split(":", 1)[1]
        if pinned:
            # Spark silently IGNORES snapshot-id/as-of-timestamp read
            # options on tables whose provider cannot honor them (views,
            # Hive/parquet tables) — exactly the fake reproducibility
            # this function exists to prevent, so verify the provider.
            # A KNOWN non-Iceberg provider is a hard error; an UNKNOWN
            # one (external v2 catalogs can hide from the session
            # catalog's metadata APIs) is ALSO a hard error unless the
            # caller explicitly opts in — "the pinned read will fail at
            # the connector layer" is not guaranteed for non-Iceberg
            # DSv2 sources, which can silently drop the option.
            import os as _os

            allow = allow_unverified_snapshot or _os.environ.get(
                "SPARK_GRAFT_ALLOW_UNVERIFIED_SNAPSHOT") == "1"
            prov = _table_provider(spark, name)
            if prov is None and not allow:
                raise ValueError(
                    f"cannot determine catalog provider for {name!r}; "
                    "refusing the snapshot-pinned read (a non-Iceberg "
                    "provider could silently ignore the pin). Pass "
                    "allow_unverified_snapshot=True or set "
                    "SPARK_GRAFT_ALLOW_UNVERIFIED_SNAPSHOT=1 to attempt "
                    "it anyway"
                )
            if prov is None:
                import warnings

                warnings.warn(
                    f"cannot determine catalog provider for {name!r}; "
                    "attempting the snapshot-pinned read anyway "
                    "(allow_unverified_snapshot) — verify the snapshot "
                    "actually took effect",
                    stacklevel=2,
                )
            elif prov != "iceberg":
                raise ValueError(
                    f"snapshot pinning requested but {name!r} resolves to "
                    f"provider {prov!r}; only Iceberg tables honor "
                    "snapshot-id/as-of-timestamp read options"
                )
        reader = spark.read
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        if as_of_ms is not None:
            reader = reader.option("as-of-timestamp", str(as_of_ms))
        df = reader.table(name)
    else:
        df = spark.read.parquet(source)
    if columns:
        missing = [c for c in columns if c not in df.columns]
        if missing:
            raise ValueError(
                f"source {source!r} is missing required columns {missing}; "
                f"has {df.columns}"
            )
        df = df.select(*columns)
    return df


def read_repos(
    spark: SparkSession,
    source: str,
    snapshot_id: int | None = None,
    as_of_ms: int | None = None,
    full_schema: bool = False,
    allow_unverified_snapshot: bool = False,
) -> DataFrame:
    """The ``repos`` input table, pruned to what extraction reads
    (``full_schema=True`` keeps commit/lang for lineage-carrying
    sinks)."""
    cols = REPOS_COLUMNS if full_schema else EXTRACT_COLUMNS
    return read_table(spark, source, snapshot_id=snapshot_id,
                      as_of_ms=as_of_ms, columns=cols,
                      allow_unverified_snapshot=allow_unverified_snapshot)

"""Deduplication operators over ``documents`` — exact, n-gram Jaccard,
MinHash+LSH, SimHash. The large-scale-training-pipeline quartet.

Scale design:
* exact dedup: hash-groupBy, one shuffle on the 32-byte digest, never on
  raw text;
* n-gram Jaccard: shingle-explode + self-join on shingle — the exact
  verifier. At 100 TB you run it only on LSH candidate pairs; here it is
  also exposed standalone (SQL-oracle-able) since the driver tables are
  small;
* MinHash: shingles hashed with 32 seeded hashes; signature = 32
  per-doc mins computed in ONE hash-aggregate (no k-times blowup);
  LSH: 8 bands x 4 rows, band-key equi-join -> candidate pairs;
  signature agreement estimates Jaccard;
* SimHash: 60-bit majority-of-token-hash-bits computed ENTIRELY in
  whole-stage codegen: explode tokens, hash JVM-side, 60 conditional
  SUMs per doc (one hash-aggregate), assemble bits; near-dup pairs via
  4x15-bit band pigeonhole (hamming<=3 guarantee). No Python in the
  path at all.

Hash function: every hash here is the first 60 bits of md5, which both
Spark (``conv(substring(md5(x),1,15),16,10)``) and ANSI engines
(``('0x' || substring(md5(x),1,15))::BIGINT``) compute identically —
that makes MinHash signatures, LSH candidates, and SimHash values
bit-reproducible across engines, so the driver's DuckDB gate checks
them exactly (no recall hand-waving). xxhash64 is ~3x cheaper per call
if cross-engine reproducibility is ever not needed; swap ``_H60`` then.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import FRONT, TAIL, load, op

N_MINHASH = 32
N_BANDS = 8
ROWS_PER_BAND = 4
SIMHASH_BITS = 60

# 60-bit md5-derived hash of a string SQL expression (see module doc)
_H60 = "cast(conv(substring(md5({x}), 1, 15), 16, 10) as bigint)"
_H60_DUCK = "('0x' || substring(md5({x}), 1, 15))::BIGINT"


@op(
    "exact_dedup_groups",
    survey_ids="training-data: exact dedup (hash-groupBy); A13",
    oracle="""
    SELECT MD5(REGEXP_REPLACE(REGEXP_REPLACE(LOWER(text), '[^a-z0-9 ]', '', 'g'),
                              ' +', ' ', 'g')) AS fingerprint,
           COUNT(*) AS n_docs,
           MIN(doc_id) AS canonical_doc_id
    FROM documents
    GROUP BY 1
    """,
)
def exact_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.regexp_replace(F.lower("text"), r"[^a-z0-9 ]", ""), " +", " ")
    return d.groupBy(F.md5(norm).alias("fingerprint")).agg(
        F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("canonical_doc_id")
    )


def shingles(df: DataFrame, text_col: str = "text", n: int = 3,
             fan_out: int | None = None) -> DataFrame:
    """(doc_id, shingle) distinct word n-grams, built-in expressions only.

    ``fan_out`` repartitions the input first — use it when the source is
    a handful of small files (the driver tables) so the explode
    parallelizes; leave None at scale, where the input is already
    partitioned and shuffling raw text would be the wrong trade."""
    if fan_out:
        df = df.repartition(fan_out, "doc_id")
    words = df.select("doc_id", F.split(F.trim(text_col), r"\s+").alias("w"))
    return (
        words.filter(F.size("w") >= n)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(w) - {n - 1}), "
                    f"i -> concat_ws(' ', slice(w, i, {n})))"
                )
            ).alias("s"),
        )
        .distinct()
    )


@op(
    "ngram_jaccard_pairs",
    survey_ids="training-data: n-gram Jaccard near-dup pairs (DEMO: the "
               "UNCAPPED exact verifier, corpus-global self-join — fine "
               "at driver-table scale, a skew bomb at 100x; production "
               "runs dedup_verified_pairs, which verifies on LSH "
               "candidates only with a shingle df-cap)",
    oracle="""
    WITH words AS (SELECT doc_id, regexp_split_to_array(TRIM(text), '\\s+') AS w
                   FROM documents),
    sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
           FROM words, UNNEST(generate_series(1, len(w) - 2)) AS t(i)
           WHERE len(w) >= 3),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    common AS (SELECT a.doc_id AS da, b.doc_id AS db, COUNT(*) AS c
               FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
               GROUP BY a.doc_id, b.doc_id)
    SELECT da AS doc_a, db AS doc_b,
           ROUND(c * 1.0 / (sa.n + sb.n - c), 6) AS jaccard
    FROM common
    JOIN sizes sa ON sa.doc_id = da
    JOIN sizes sb ON sb.doc_id = db
    WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.2
    """,
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry demo: UNCAPPED (df_cap=None) so the oracle stays the
    plain all-shingles Jaccard; standalone production callers pass
    df_cap to ngram_jaccard_pairs_df (or use dedup_verified_pairs)."""
    return ngram_jaccard_pairs_df(
        load(spark, sf_dir, "documents"),
        fan_out=spark.sparkContext.defaultParallelism)


def ngram_jaccard_pairs_df(
    d: DataFrame, tau: float = 0.2, df_cap: int | None = None,
    fan_out: int | None = None,
) -> DataFrame:
    # no session-global cache: query paths must leave zero persistent
    # RDDs behind (resident-engine hygiene). The shingle plan feeds
    # three branches; the band self-join's two sides share one Exchange
    # (ReusedExchange), so the recompute cost is one extra pass — at
    # orchestration scale, persist explicitly around the call instead.
    sh = shingles(d, fan_out=fan_out)
    if df_cap is not None:
        # stop-shingle guard: bounds the self-join's per-shingle fan-out
        # at df_cap (see df_capped_shingles) — REQUIRED at scale when
        # running this corpus-global form instead of the candidates-only
        # dedup_verified_pairs pipeline
        sh = df_capped_shingles(sh, df_cap)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("doc_id").alias("da"), "s")
    b = sh.select(F.col("doc_id").alias("db"), "s")
    common = (
        a.join(b, "s")
        .filter(F.col("da") < F.col("db"))
        .groupBy("da", "db")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    out = (
        common.join(sizes.withColumnRenamed("doc_id", "da").withColumnRenamed("n", "na"), "da")
        .join(sizes.withColumnRenamed("doc_id", "db").withColumnRenamed("n", "nb"), "db")
        .select(
            F.col("da").alias("doc_a"),
            F.col("db").alias("doc_b"),
            F.round(F.col("c") / (F.col("na") + F.col("nb") - F.col("c")), 6).alias(
                "jaccard"
            ),
        )
        .filter(F.col("jaccard") >= tau)
    )
    return out


# Carter-Wegman universal family over the Mersenne prime 2^31-1: each
# shingle is md5-hashed ONCE (the expensive step), then the 32 seeded
# hashes are h_k(b) = (a_k*b + c_k) mod p — pure integer ops, identical
# in any engine, and products stay < 2^62 (no ANSI-mode long overflow).
MH_P = 2_147_483_647
MH_SEEDS = [((2 * k + 1) * 2_654_435_761 % MH_P, (k * 40_503 + 17) % MH_P)
            for k in range(N_MINHASH)]


def df_capped_shingles(sh: DataFrame, df_cap: int) -> DataFrame:
    """Drop shingles whose document frequency exceeds ``df_cap`` —
    standard stop-shingle suppression. This is the scale guard for
    every shingle equi-join downstream: one stop-shingle present in
    10^6 docs would fan ~10^12 join rows; after the cap, per-shingle
    fan-out is bounded by df_cap (so a self-join by df_cap^2). The hot
    set is tiny by construction (few shingles exceed a sane cap), so
    the anti-join broadcasts."""
    hot = (
        sh.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > df_cap)
        .select("s")
    )
    return sh.join(F.broadcast(hot), "s", "left_anti")


def signatures_from_shingles(sh: DataFrame) -> DataFrame:
    """(doc_id, sig array<long>) — 32 universal-hash mins in one
    aggregate over the per-shingle md5 base hash."""
    sb = sh.withColumn("b", F.expr(_H60.format(x="s")) % MH_P)
    mins = [
        F.min((F.lit(a) * F.col("b") + F.lit(c)) % MH_P).alias(f"h{k}")
        for k, (a, c) in enumerate(MH_SEEDS)
    ]
    agg = sb.groupBy("doc_id").agg(*mins)
    return agg.select(
        "doc_id", F.array(*[F.col(f"h{k}") for k in range(N_MINHASH)]).alias("sig")
    )


def minhash_signatures(df: DataFrame, text_col: str = "text",
                       fan_out: int | None = None) -> DataFrame:
    """(doc_id, sig array<long>) over a raw document table."""
    return signatures_from_shingles(shingles(df, text_col, fan_out=fan_out))


def lsh_candidates(sigs: DataFrame) -> DataFrame:
    """(doc_a < doc_b) distinct pairs whose signatures collide in >= 1
    of the 8 4-row bands — the bucketed (never all-pairs) candidate
    generator."""
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, {N_BANDS - 1}), "
                f"b -> struct(b AS band, concat_ws(',', "
                f"slice(sig, b * {ROWS_PER_BAND} + 1, {ROWS_PER_BAND})) AS bh))"
            )
        ).alias("x"),
    ).select("doc_id", "x.band", "x.bh")
    return (
        bands.alias("l")
        .join(bands.alias("r"), ["band", "bh"])
        .filter(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b"))
        .distinct()
    )


_MH_SEED_VALUES = ", ".join(f"({k}, {a}, {c})"
                            for k, (a, c) in enumerate(MH_SEEDS))
_MINHASH_ORACLE = f"""
    WITH words AS (SELECT doc_id, regexp_split_to_array(TRIM(text), '\\s+') AS w
                   FROM documents),
    sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
           FROM words, UNNEST(generate_series(1, len(w) - 2)) AS t(i)
           WHERE len(w) >= 3),
    sb AS (SELECT doc_id, ({_H60_DUCK.format(x="s")}) % {MH_P} AS b FROM sh),
    seeds(k, a, c) AS (VALUES {_MH_SEED_VALUES}),
    hs AS (SELECT doc_id, k, MIN((a * b + c) % {MH_P}) AS m
           FROM sb, seeds
           GROUP BY doc_id, k),
    bands AS (SELECT doc_id, k // {ROWS_PER_BAND} AS band,
                     STRING_AGG(m::VARCHAR, ',' ORDER BY k) AS bh
              FROM hs GROUP BY doc_id, k // {ROWS_PER_BAND}),
    cand AS (SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
             FROM bands l JOIN bands r
               ON l.band = r.band AND l.bh = r.bh AND l.doc_id < r.doc_id),
    agree AS (SELECT c.doc_a, c.doc_b,
                     SUM(CASE WHEN ha.m = hb.m THEN 1 ELSE 0 END) AS eq
              FROM cand c
              JOIN hs ha ON ha.doc_id = c.doc_a
              JOIN hs hb ON hb.doc_id = c.doc_b AND hb.k = ha.k
              GROUP BY c.doc_a, c.doc_b)
    SELECT doc_a, doc_b, eq / {N_MINHASH}.0 AS est_jaccard FROM agree
"""


@op(
    "minhash_lsh_pairs",
    survey_ids="training-data: MinHash+LSH near-dup candidates "
               "(shingle->minhash->band->bucket-join)",
    oracle=_MINHASH_ORACLE,
)
def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate pairs whose signatures collide in >=1 of 8 bands, with
    the signature-agreement Jaccard estimate. The md5-derived hashes
    make signatures (and therefore candidates and estimates)
    bit-identical to the DuckDB oracle; recall/precision vs exact
    Jaccard is asserted in tests/test_dedup.py."""
    return minhash_lsh_pairs_df(load(spark, sf_dir, "documents"),
                                fan_out=spark.sparkContext.defaultParallelism)


def minhash_lsh_pairs_df(d: DataFrame, fan_out: int | None = None) -> DataFrame:
    # unpersisted by design — see ngram_jaccard_pairs note
    sigs = minhash_signatures(d, fan_out=fan_out)
    cand = lsh_candidates(sigs)
    est = (
        cand.join(sigs.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sa")), "doc_a")
        .join(sigs.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sb")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.expr(
                    "size(filter(zip_with(sa, sb, (x, y) -> x = y), v -> v))"
                ).cast("double")
                / N_MINHASH
            ).alias("est_jaccard"),
        )
    )
    return est


def simhash(df: DataFrame, text_col: str = "text",
            fan_out: int | None = None) -> DataFrame:
    """(doc_id, simhash) — 60-bit SimHash entirely in whole-stage
    codegen: one explode, one JVM hash per token occurrence, one
    hash-aggregate with 60 conditional sums (per-bit +/-1 votes), bits
    assembled from the vote signs. Documents with no tokens produce no
    row (matching the reference of skipping empty docs)."""
    if fan_out:
        df = df.repartition(fan_out, "doc_id")
    toks = (
        df.select("doc_id", F.explode(F.split(F.trim(text_col), r"\s+")).alias("t"))
        .filter(F.col("t") != "")
        .withColumn("h", F.expr(_H60.format(x="t")))
    )
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{j}")
        for j in range(SIMHASH_BITS)
    ]
    agg = toks.groupBy("doc_id").agg(*votes)
    bits = None
    for j in range(SIMHASH_BITS):
        term = F.when(F.col(f"v{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        bits = term if bits is None else bits + term
    return agg.select("doc_id", bits.cast("long").alias("simhash"))


def _simhash_oracle(max_hamming: int) -> str:
    h = _H60_DUCK.format(x="t")
    vs = ",\n           ".join(
        f"SUM(CASE WHEN ((h >> {j}) & 1) = 1 THEN 1 ELSE -1 END) AS v{j}"
        for j in range(SIMHASH_BITS)
    )
    asm = " + ".join(
        f"CASE WHEN v{j} > 0 THEN {1 << j} ELSE 0 END" for j in range(SIMHASH_BITS)
    )
    # brute-force all-pairs oracle: the engine's banded join must equal
    # it exactly (4 bands pigeonhole-guarantee hamming<=3 recall)
    return f"""
    WITH toks AS (SELECT doc_id,
                         UNNEST(regexp_split_to_array(TRIM(text), '\\s+')) AS t
                  FROM documents),
    th AS (SELECT doc_id, {h} AS h FROM toks WHERE t <> ''),
    votes AS (SELECT doc_id, {vs}
              FROM th GROUP BY doc_id),
    sims AS (SELECT doc_id, ({asm})::BIGINT AS simhash FROM votes)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           bit_count(xor(a.simhash, b.simhash))::INT AS hamming
    FROM sims a JOIN sims b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
    """


@op(
    "simhash_near_dups",
    survey_ids="training-data: SimHash near-dup pairs",
    oracle=_simhash_oracle(3),
)
def simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs with hamming(simhash) <= 3 via the 4x15-bit band pigeonhole:
    any pair within hamming 3 must agree on at least one band. The
    DuckDB oracle is the brute-force all-pairs comparison — equality
    also certifies the pigeonhole recall argument on real data."""
    return simhash_near_dups_df(load(spark, sf_dir, "documents"), max_hamming=3,
                                fan_out=spark.sparkContext.defaultParallelism)


def simhash_near_dups_df(
    d: DataFrame, max_hamming: int = 3, n_bands: int | None = None,
    fan_out: int | None = None,
) -> DataFrame:
    """Banded SimHash join. Pigeonhole: a pair within hamming h is
    guaranteed to collide on >=1 band when n_bands > h; default bands =
    max_hamming + 1 (band width = SIMHASH_BITS // n_bands bits)."""
    n_bands = n_bands or (max_hamming + 1)
    width = SIMHASH_BITS // n_bands
    mask = (1 << width) - 1
    # unpersisted by design — see ngram_jaccard_pairs note
    sims = simhash(d, fan_out=fan_out)
    bands = sims.select(
        "doc_id",
        "simhash",
        F.explode(
            F.expr(
                f"transform(sequence(0, {n_bands - 1}), b -> struct(b AS band, "
                f"(shiftright(simhash, b * {width}) & {mask}) AS bh))"
            )
        ).alias("x"),
    ).select("doc_id", "simhash", "x.band", "x.bh")
    cand = (
        bands.alias("l")
        .join(bands.alias("r"), ["band", "bh"])
        .filter(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
            F.col("l.simhash").alias("ha"),
            F.col("r.simhash").alias("hb"),
        )
        .distinct()
    )
    return cand.select(
        "doc_a",
        "doc_b",
        F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).cast("int").alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)


# ---------------------------------------------------------------------------
# The COMPOSED production dedup pipeline: LSH candidates -> exact n-gram
# Jaccard verification ON CANDIDATES ONLY -> survivor selection. This is
# the chain a training-data pipeline runs daily (reference shape: the
# dedupe-then-apply flow of data_job.py:302-348); the standalone ops
# above are its stages exposed individually.
DEDUP_DF_CAP = 50      # shingle document-frequency cap (stop-shingle guard)
DEDUP_JACCARD_TAU = 0.2  # verification threshold (matches ngram_jaccard_pairs)


def dedup_verified_pairs_df(
    d: DataFrame,
    df_cap: int = DEDUP_DF_CAP,
    tau: float = DEDUP_JACCARD_TAU,
    fan_out: int | None = None,
) -> DataFrame:
    """(doc_id, keep_id) for EVERY document: keep_id = min(doc_id over
    the doc and its verified near-dup partners); keep_id == doc_id
    means the doc survives dedup.

    Scale design — every stage is bounded:

    1. shingle df-cap (``df_capped_shingles``): shingles with document
       frequency > df_cap are dropped BEFORE anything joins on shingle,
       so per-shingle fan-out is <= df_cap everywhere downstream (the
       uncapped standalone ``ngram_jaccard_pairs`` is a demo/verifier —
       one stop-shingle in 10^6 docs would fan ~10^12 join rows there);
    2. candidates come from banded MinHash LSH (bucket equi-join,
       never all-pairs);
    3. exact Jaccard runs ONLY on candidate pairs: the common-shingle
       count joins candidates to the capped shingle table twice —
       per-candidate work is O(shingles per doc), not corpus-global;
    4. survivor choice is a single min-aggregate over the verified
       pairs' adjacency (single-hop min-neighbor; feed the verified
       pairs to graph.components.connected_components when a
       transitive-closure grouping is required).
    """
    sh = df_capped_shingles(shingles(d, fan_out=fan_out), df_cap)
    cand = lsh_candidates(signatures_from_shingles(sh))
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    common = (
        cand.join(sh.select(F.col("doc_id").alias("doc_a"), "s"), "doc_a")
        .join(sh.select(F.col("doc_id").alias("doc_b"), "s"), ["doc_b", "s"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    verified = (
        common.join(sizes.select(F.col("doc_id").alias("doc_a"),
                                 F.col("n").alias("na")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"),
                           F.col("n").alias("nb")), "doc_b")
        .filter(F.col("c") / (F.col("na") + F.col("nb") - F.col("c")) >= tau)
        .select("doc_a", "doc_b")
    )
    neigh = verified.select(
        F.col("doc_a").alias("doc_id"), F.col("doc_b").alias("nbr")
    ).unionByName(verified.select(
        F.col("doc_b").alias("doc_id"), F.col("doc_a").alias("nbr")))
    keep = neigh.groupBy("doc_id").agg(F.min("nbr").alias("mn"))
    return d.select("doc_id").join(keep, "doc_id", "left").select(
        "doc_id",
        F.least(F.col("doc_id"), F.coalesce("mn", F.col("doc_id"))).alias("keep_id"),
    )


_DEDUP_PIPELINE_ORACLE = f"""
    WITH words AS (SELECT doc_id, regexp_split_to_array(TRIM(text), '\\s+') AS w
                   FROM documents),
    sh0 AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
            FROM words, UNNEST(generate_series(1, len(w) - 2)) AS t(i)
            WHERE len(w) >= 3),
    hot AS (SELECT s FROM sh0 GROUP BY s HAVING COUNT(*) > {DEDUP_DF_CAP}),
    sh AS MATERIALIZED (SELECT * FROM sh0 WHERE s NOT IN (SELECT s FROM hot)),
    sb AS (SELECT doc_id, ({_H60_DUCK.format(x="s")}) % {MH_P} AS b FROM sh),
    seeds(k, a, c) AS (VALUES {_MH_SEED_VALUES}),
    hs AS (SELECT doc_id, k, MIN((a * b + c) % {MH_P}) AS m
           FROM sb, seeds GROUP BY doc_id, k),
    bands AS (SELECT doc_id, k // {ROWS_PER_BAND} AS band,
                     STRING_AGG(m::VARCHAR, ',' ORDER BY k) AS bh
              FROM hs GROUP BY doc_id, k // {ROWS_PER_BAND}),
    cand AS (SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
             FROM bands l JOIN bands r
               ON l.band = r.band AND l.bh = r.bh AND l.doc_id < r.doc_id),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    common AS (SELECT c.doc_a, c.doc_b, COUNT(*) AS cnt
               FROM cand c
               JOIN sh a ON a.doc_id = c.doc_a
               JOIN sh b ON b.doc_id = c.doc_b AND b.s = a.s
               GROUP BY c.doc_a, c.doc_b),
    verified AS (SELECT doc_a, doc_b
                 FROM common
                 JOIN sizes sa ON sa.doc_id = doc_a
                 JOIN sizes sb2 ON sb2.doc_id = doc_b
                 WHERE cnt * 1.0 / (sa.n + sb2.n - cnt) >= {DEDUP_JACCARD_TAU}),
    neigh AS (SELECT doc_a AS doc_id, doc_b AS nbr FROM verified
              UNION ALL
              SELECT doc_b AS doc_id, doc_a AS nbr FROM verified),
    keep AS (SELECT doc_id, MIN(nbr) AS mn FROM neigh GROUP BY doc_id)
    SELECT d.doc_id, LEAST(d.doc_id, COALESCE(k.mn, d.doc_id)) AS keep_id
    FROM documents d LEFT JOIN keep k ON k.doc_id = d.doc_id
"""


@op(
    "dedup_verified_pairs",
    priority=TAIL,  # r06 rotation: fresh r05 green row -> rotate out
    survey_ids="training-data: COMPOSED dedup pipeline (MinHash-LSH "
               "candidates -> df-capped exact n-gram Jaccard verify on "
               "candidates only -> min-doc_id survivors; the production "
               "chain, data_job.py:302-348 shape)",
    oracle=_DEDUP_PIPELINE_ORACLE,
)
def dedup_verified_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed candidate->verify->survive dedup decision for the
    whole corpus — see dedup_verified_pairs_df for the scale argument.
    md5-derived hashing keeps candidates bit-identical to the DuckDB
    oracle, so the full pipeline (cap, signatures, banding, exact
    verify, survivor choice) is value-checked end to end."""
    return dedup_verified_pairs_df(
        load(spark, sf_dir, "documents"),
        fan_out=spark.sparkContext.defaultParallelism)

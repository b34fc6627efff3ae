"""Deduplication operators over ``documents`` — exact, n-gram Jaccard,
MinHash+LSH, SimHash. The large-scale-training-pipeline quartet.

Scale design:
* exact dedup: hash-groupBy, one shuffle on the 32-byte digest, never on
  raw text;
* n-gram Jaccard: shingle-explode + self-join on shingle — the exact
  verifier. At 100 TB you run it only on LSH candidate pairs; here it is
  also exposed standalone (SQL-oracle-able) since the driver tables are
  small;
* MinHash: shingles hashed with 32 independent xxhash64 seeds; signature
  = 32 per-doc mins computed in ONE hash-aggregate (no k-times blowup);
  LSH: 8 bands x 4 rows, band hash join -> candidate pairs; signature
  agreement estimates Jaccard;
* SimHash: 64-bit majority-of-token-hash-bits, computed per Arrow batch
  with numpy bit tricks (vectorized pandas UDF — the one place
  DataFrame expressions can't express a per-bit majority cleanly);
  near-dup pairs via 4x16-bit band pigeonhole (hamming<=3 guarantee).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import load, op

N_MINHASH = 32
N_BANDS = 8
ROWS_PER_BAND = 4


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


def shingles(df: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """(doc_id, shingle) distinct word n-grams, built-in expressions only."""
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
    survey_ids="training-data: n-gram Jaccard near-dup pairs",
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
    d = load(spark, sf_dir, "documents")
    sh = shingles(d).persist()
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
        .filter(F.col("jaccard") >= 0.2)
    )
    return out


def minhash_signatures(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, sig array<long>) — 32 seeded-xxhash64 mins in one aggregate."""
    sh = shingles(df, text_col)
    mins = [
        F.min(F.xxhash64(F.col("s"), F.lit(k))).alias(f"h{k}") for k in range(N_MINHASH)
    ]
    agg = sh.groupBy("doc_id").agg(*mins)
    return agg.select(
        "doc_id", F.array(*[F.col(f"h{k}") for k in range(N_MINHASH)]).alias("sig")
    )


@op(
    "minhash_lsh_pairs",
    survey_ids="training-data: MinHash+LSH near-dup candidates (shingle->minhash->band->bucket-join)",
)
def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate pairs whose signatures collide in >=1 of 8 bands, with
    the signature-agreement Jaccard estimate. Rows-only driver check;
    recall/precision asserted in tests/test_dedup.py."""
    return minhash_lsh_pairs_df(load(spark, sf_dir, "documents"))


def minhash_lsh_pairs_df(d: DataFrame) -> DataFrame:
    sigs = minhash_signatures(d).persist()
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, {N_BANDS - 1}), "
                f"b -> struct(b AS band, xxhash64(concat_ws(',', "
                f"slice(sig, b * {ROWS_PER_BAND} + 1, {ROWS_PER_BAND}))) AS bh))"
            )
        ).alias("x"),
    ).select("doc_id", "x.band", "x.bh")
    cand = (
        bands.alias("l")
        .join(bands.alias("r"), ["band", "bh"])
        .filter(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b"))
        .distinct()
    )
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


def _simhash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """64-bit SimHash per doc: per-token FNV-ish hash, per-bit majority.

    Vectorized per Arrow batch: all tokens of the batch hashed in one
    numpy pass; per-bit +/-1 votes accumulated with np.add.at into a
    (docs x 64) matrix.
    """
    FNV_OFFSET = np.uint64(0xCBF29CE484222325)
    FNV_PRIME = np.uint64(0x100000001B3)
    np.seterr(over="ignore")  # uint64 wraparound is the hash semantics
    for b in batches:
        doc_ids = b["doc_id"].to_numpy()
        hashes = []
        doc_idx = []
        for i, text in enumerate(b["text"].tolist()):
            toks = text.split()
            if not toks:
                continue
            hs = np.empty(len(toks), dtype=np.uint64)
            for j, t in enumerate(toks):
                h = FNV_OFFSET
                for ch in t.encode():
                    h = (h ^ np.uint64(ch)) * FNV_PRIME
                hs[j] = h
            hashes.append(hs)
            doc_idx.append(np.full(len(toks), i))
        if not hashes:
            yield pd.DataFrame({"doc_id": [], "simhash": []}).astype(
                {"doc_id": "int64", "simhash": "int64"}
            )
            continue
        h = np.concatenate(hashes)
        di = np.concatenate(doc_idx)
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
            np.int64
        )
        votes = np.zeros((len(doc_ids), 64), dtype=np.int64)
        np.add.at(votes, di, 2 * bits - 1)
        sim = (votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)
        out = sim.sum(axis=1).astype(np.int64)  # two's-complement reinterpret
        yield pd.DataFrame({"doc_id": doc_ids, "simhash": out})


def simhash(df: DataFrame) -> DataFrame:
    return df.select("doc_id", "text").mapInPandas(
        _simhash_batch, "doc_id long, simhash long"
    )


@op("simhash_near_dups", survey_ids="training-data: SimHash near-dup pairs")
def simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs with hamming(simhash) <= 3 via the 4x16-bit band pigeonhole:
    any pair within hamming 3 must agree on at least one band."""
    return simhash_near_dups_df(load(spark, sf_dir, "documents"), max_hamming=3)


def simhash_near_dups_df(
    d: DataFrame, max_hamming: int = 3, n_bands: int | None = None
) -> DataFrame:
    """Banded SimHash join. Pigeonhole: a pair within hamming h is
    guaranteed to collide on >=1 band when n_bands > h; default bands =
    max_hamming + 1 (band width = 64 // n_bands bits)."""
    n_bands = n_bands or (max_hamming + 1)
    width = 64 // n_bands
    mask = (1 << width) - 1
    sims = simhash(d).persist()
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
        F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)

"""End-to-end training-data curation pipeline — the composition the extras
exist for: quality filter → exact dedup → MinHash-LSH near-dup removal →
curated corpus + per-group budget.

Every stage is one of the already-verified operators (textstats.quality_score,
dedup.exact_duplicates, dedup.minhash_signatures → lsh_candidate_pairs →
jaccard_pairs); this module only wires them so one call yields the curated
corpus a pretraining run would read. Scale shape: no stage self-joins the
corpus — pair generation is LSH-banded, removals are anti-joins.

Determinism/cross-engine notes: the quality gate compares round(quality, 6)
(both engines round identically; an unrounded threshold could flip on a
one-ulp difference); the Jaccard gate compares the raw ratio (identical
integer inputs → identical IEEE division in both engines). Near-dup removal
keeps the smaller doc_id of every verified pair (drop all doc_b) — a
deterministic greedy that keeps ≥1 representative per duplicate chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fusion_spark.extras import dedup, textstats


def curate_corpus(
    docs: DataFrame,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    min_quality: float = 0.05,
    jaccard_threshold: float = 0.6,
    shingle_n: int = 3,
    num_hashes: int = 4,
    band_size: int = 2,
) -> DataFrame:
    """Returns the curated (doc_id, quality) survivors:

      1. quality gate: round(quality, 6) >= min_quality;
      2. exact dedup: canonical (min doc_id) row per content hash;
      3. near-dup removal among the remainder: MinHash → banded LSH
         candidates → exact Jaccard verify >= jaccard_threshold → drop the
         larger doc_id of every verified pair.
    """
    d = docs.select(F.col(doc_id_col).alias("doc_id"), F.col(text_col).alias("text"))

    q = textstats.quality_score(d).select(
        "doc_id", F.round("quality", 6).alias("quality")
    ).filter(F.col("quality") >= min_quality)
    stage1 = d.join(q, "doc_id")

    # persisted: three consumers below (signatures, shingles, final
    # anti-join) would otherwise re-run the quality gate + dedup joins
    # over the full corpus — the dominant cost at scale
    stage2 = dedup.drop_exact_duplicates(stage1).persist()

    sigs = dedup.minhash_signatures(stage2, n=shingle_n, num_hashes=num_hashes)
    cands = dedup.lsh_candidate_pairs(sigs, band_size=band_size)
    sh = dedup.shingles(stage2, n=shingle_n)
    near = dedup.jaccard_pairs(sh, min_jaccard=jaccard_threshold, candidates=cands)
    drops = near.select(F.col("doc_b").alias("doc_id")).distinct()
    survivors = stage2.join(drops, "doc_id", "left_anti").select("doc_id", "quality")
    # materialize the (small: doc_id, quality) result through the stage2
    # cache, then RELEASE stage2 — repeated curate_corpus calls in a
    # long-lived driver must not accumulate cached corpus blocks (ADVICE r2)
    survivors = survivors.persist()
    survivors.count()
    stage2.unpersist()
    return survivors

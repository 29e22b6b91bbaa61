"""Rank fusion — Borda / RRF / normalized-score fusion as window expressions.

Reference: class Aggregator, /root/reference/src/retrievers/hybrid.py:166-307.
Every transform operates per (system, qid) group on a ranked list; weighted
scores are then summed per (qid, doc_id) across systems (a union +
hash-aggregate — the relational form of the reference's defaultdict sum,
hybrid.py:293-307).

Preserved reference quirks (SURVEY.md §7):
  * Borda top-1 scores (n+1)/n — the (n − idx + 1)/n off-by-one
    (hybrid.py:247-249).
  * RRF constant 60 hard-coded (hybrid.py:251-252).
  * min-max degenerate (min==max) → all ones (hybrid.py:257);
    z-score degenerate (std==0) → all zeros (hybrid.py:263).
  * z-score std is the torch default SAMPLE std (ddof=1) → `stddev_samp`.
    DOCUMENTED DIVERGENCE: on a single-element group torch.std(ddof=1) is
    NaN and NaN != 0 passes the reference's zero-gate, so reference scores
    go NaN; we map the NULL stddev_samp to the all-zeros branch instead
    (a NaN fused score is useless downstream). Same choice encoded in the
    test oracle (oracle.py).
  * percentile-rank: nearest quantile index (first on ties) / len(distr);
    normal-curve-equivalent applies Φ⁻¹(p/100)·21.06+50 including the /100
    quirk (hybrid.py:271-278).
  * NSF weights default to equal 1/num_systems (hybrid.py:448).

Scale notes: all transforms are single-pass window functions partitioned by
(system, qid) — one shuffle keyed by the window partition, no skew (per-query
lists are bounded by return_topk). The final fuse aggregate is a partial+final
hash aggregate on (qid, doc_id). float32 mode reproduces the reference's
torch-float32 arithmetic for score-equality tests; float64 (default) is the
production/SQL-parity path.
"""

from __future__ import annotations

import math
from statistics import NormalDist

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

SYS_Q = ("system", "qid")


def _score_col(dtype: str):
    c = F.col("score")
    return c.cast("float") if dtype == "float32" else c.cast("double")


def borda_count(df: DataFrame) -> DataFrame:
    """score := (n − rank + 2)/n with 1-based rank ≡ the reference's
    (n − idx + 1)/n with 0-based idx (hybrid.py:247-249)."""
    w = Window.partitionBy(*SYS_Q)
    n = F.count(F.lit(1)).over(w).cast("double")
    return df.withColumn("score", (n - F.col("rank") + F.lit(2.0)) / n)


def reciprocal_rank(df: DataFrame) -> DataFrame:
    return df.withColumn("score", F.lit(1.0) / (F.lit(60.0) + F.col("rank")))


def minmax_normalize(df: DataFrame, dtype: str = "float64") -> DataFrame:
    w = Window.partitionBy(*SYS_Q)
    s = _score_col(dtype)
    lo, hi = F.min(s).over(w), F.max(s).over(w)
    out = F.when(lo == hi, F.lit(1.0)).otherwise((s - lo) / (hi - lo))
    return df.withColumn("score", out.cast("double"))


def zscore_normalize(df: DataFrame, dtype: str = "float64") -> DataFrame:
    w = Window.partitionBy(*SYS_Q)
    s = _score_col(dtype)
    mu, sd = F.avg(s).over(w), F.stddev_samp(s).over(w)
    out = F.when(sd.isNull() | (sd == 0), F.lit(0.0)).otherwise((s - mu) / sd)
    if dtype == "float32":
        out = out.cast("float")
    return df.withColumn("score", out.cast("double"))


def arctan_normalize(df: DataFrame, dtype: str = "float64") -> DataFrame:
    s = _score_col(dtype)
    out = F.lit(2.0 / math.pi) * F.atan(F.lit(0.1) * s)
    return df.withColumn("score", out.cast("double"))


def make_percentile_udf(distributions: dict[str, list[float]], nce: bool = False):
    """Vectorized nearest-quantile lookup (hybrid.py:271-278). The per-system
    quantile vectors are tiny (≤100k floats) → closed over and shipped with
    the UDF (broadcast-by-closure)."""
    # float64 throughout: the nearest-index argmin must match the float64
    # abs(d − score) the SQL oracles compute — a float32 cast here could pick
    # a different index for a score near a quantile midpoint (ADVICE r2)
    distrs = {k: np.asarray(v, dtype=np.float64) for k, v in distributions.items()}

    @F.pandas_udf(DoubleType())
    def percentile_lookup(system: pd.Series, score: pd.Series) -> pd.Series:
        out = np.empty(len(score), dtype=np.float64)
        sc = score.to_numpy(dtype=np.float64)
        for sys_name in system.unique():
            mask = (system == sys_name).to_numpy()
            d = distrs[sys_name]
            idx = np.abs(d[:, None] - sc[mask][None, :]).argmin(axis=0)
            p = idx / d.shape[0]
            if nce:
                nd = NormalDist()
                p = np.asarray(
                    [nd.inv_cdf(min(max(x / 100, 1e-12), 1 - 1e-12)) for x in p]
                ) * 21.06 + 50
            out[mask] = p
        return pd.Series(out)

    return percentile_lookup


def percentile_normalize(
    df: DataFrame, distributions: dict[str, list[float]], nce: bool = False
) -> DataFrame:
    udf = make_percentile_udf(distributions, nce)
    return df.withColumn("score", udf(F.col("system"), F.col("score")))


def normalize_scores(
    df: DataFrame,
    normalization: str | None,
    distributions: dict[str, list[float]] | None = None,
    dtype: str = "float64",
) -> DataFrame:
    """The NSF normalization dispatch shared by fuse() and the fused weight
    grid (normalization is weight-independent, so grids compute it once)."""
    if normalization == "min-max":
        return minmax_normalize(df, dtype)
    if normalization == "z-score":
        return zscore_normalize(df, dtype)
    if normalization == "arctan":
        return arctan_normalize(df, dtype)
    if normalization in ("percentile-rank", "normal-curve-equivalent"):
        return percentile_normalize(
            df, distributions, nce=(normalization == "normal-curve-equivalent")
        )
    if normalization in (None, "none"):
        return df
    raise ValueError(f"unknown normalization {normalization}")


def weight_scores(df: DataFrame, weights: dict[str, float]) -> DataFrame:
    """Per-system convex-combination weights (hybrid.py:282-291) via a
    broadcast map literal — no join, stays in codegen. A system missing from
    `weights` fails LOUDLY at evaluation time (the reference raises KeyError,
    hybrid.py:289; a silent NULL would drop that system's contribution) —
    raise_error costs no extra job, unlike a distinct-collect validation."""
    mapping = F.create_map(*[F.lit(x) for kv in weights.items() for x in kv])
    w = mapping[F.col("system")]
    checked = F.when(
        w.isNull(),
        F.raise_error(F.concat(F.lit("missing fusion weight for system: "), F.col("system"))),
    ).otherwise(w)
    return df.withColumn("score", F.col("score") * checked)


def aggregate_scores(df: DataFrame, return_topk: int | None = None) -> DataFrame:
    """Sum per (qid, doc_id) across systems — absent systems contribute 0
    implicitly (hybrid.py:293-307) — then rank (score DESC, doc_id ASC)."""
    agg = df.groupBy("qid", "doc_id").agg(F.sum("score").alias("score"))
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    out = agg.withColumn("rank", F.row_number().over(w))
    if return_topk is not None:
        out = out.filter(F.col("rank") <= return_topk)
    return out


def fuse(
    score_lists: DataFrame,
    method: str,
    normalization: str | None = None,
    weights: dict[str, float] | None = None,
    distributions: dict[str, list[float]] | None = None,
    return_topk: int | None = 1000,
    dtype: str = "float64",
) -> DataFrame:
    """Aggregator.fuse (hybrid.py:170-220) over a relational
    (system, qid, doc_id, score, rank) input. The reference's
    `final_results[:return_topk]` slices *queries* (a documented no-op,
    hybrid.py:220); ours applies the intended per-query top-k.

    Shuffle plan: one upfront repartition by qid. HashPartitioning(qid)
    satisfies ClusteredDistribution for the (system, qid) normalization
    windows, the (qid, doc_id) fusion aggregate, AND the final per-qid rank
    window (subset rule) — so the whole fuse pipeline runs with a single
    exchange instead of three (verified via .explain: 3 exchanges → 1).
    Per-qid skew is bounded by |systems| × list length."""
    df = score_lists.repartition("qid")
    if method == "bcf":
        df = borda_count(df)
    elif method == "rrf":
        df = reciprocal_rank(df)
    elif method == "nsf":
        df = normalize_scores(df, normalization, distributions, dtype)
        if weights is None:
            systems = [r["system"] for r in score_lists.select("system").distinct().collect()]
            weights = {s: 1.0 / len(systems) for s in systems}  # hybrid.py:448
        df = weight_scores(df, weights)
    else:
        raise ValueError(f"unknown fusion method {method}")
    return aggregate_scores(df, return_topk)


def score_distribution(
    score_lists: DataFrame, n_points: int, exclude_smallest: int = 2
) -> DataFrame:
    """F12 (hybrid.py:389-397): per system drop zero scores and rows whose
    score is among the `exclude_smallest` smallest DISTINCT values — the
    distinct-nsmallest set is computed over ALL scores INCLUDING zeros
    (reference quirk: `nsmallest` runs on the unfiltered group, so a zero
    typically occupies one of the two slots) — then take n_points+1 equally
    spaced exact quantiles (linear interpolation — same rule as pandas
    `.quantile`). Returns (system, quantiles array)."""
    dw = Window.partitionBy("system").orderBy("score")
    distinct_rank = (
        score_lists.select("system", "score")
        .distinct()
        .withColumn("dr", F.row_number().over(dw))
    )
    kept = score_lists.filter(F.col("score") != 0.0).join(
        distinct_rank.filter(F.col("dr") <= exclude_smallest).select("system", "score"),
        ["system", "score"],
        "left_anti",
    )
    probs = [i / n_points for i in range(n_points + 1)]
    return kept.groupBy("system").agg(
        F.percentile("score", F.array(*[F.lit(p) for p in probs])).alias("quantiles")
    )

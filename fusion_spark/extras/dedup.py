"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design notes:
  * exact: one shuffle keyed by content hash — near-uniform keys.
  * minhash: the per-(doc, seed) min is a partial+final aggregate, so hot
    shingles never concentrate on one reducer; signatures are |docs|×k rows.
  * LSH: candidate generation joins docs on band keys — bounded by bucket
    sizes, the standard sub-quadratic near-dup path for 10^9+ docs.
  * n-gram Jaccard: exact pair verification; quadratic in bucket size, so
    at scale it runs AFTER LSH banding (verify_pairs), with an optional
    hot-shingle cap for the un-banded variant.

MinHash uses md5 hex strings ordered lexicographically as the hash universe
(uniform, engine-portable — the same function exists in DuckDB for the
oracle cross-checks).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from fusion_spark.tokenize import tokenize


def exact_duplicates(docs: DataFrame, text_col: str = "text", doc_id_col: str = "doc_id") -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct content with the
    canonical (min) doc_id and the duplicate count."""
    return (
        docs.select(F.col(doc_id_col).alias("doc_id"), F.md5(F.col(text_col)).alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
    )


def drop_exact_duplicates(
    docs: DataFrame, text_col: str = "text", doc_id_col: str = "doc_id"
) -> DataFrame:
    """Materialize the deduplicated corpus: keep the canonical (min doc_id)
    row of every exact-content group. Plan: the hash-groupBy of
    exact_duplicates produces (text_hash, canonical_doc_id); a semi-join on
    doc_id keeps the winners — the big side shuffles once on the content
    hash and once on doc_id, never self-joins."""
    canon = exact_duplicates(docs, text_col, doc_id_col).select(
        F.col("canonical_doc_id").alias(doc_id_col)
    )
    return docs.join(canon, doc_id_col, "left_semi")


def shingles(
    docs: DataFrame,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    n: int = 3,
    mode: str = "simple",
    distinct: bool = True,
) -> DataFrame:
    """Token n-gram shingles per doc: (doc_id, shingle). Shingle = n
    consecutive tokens joined by single spaces. `distinct=True` (set
    semantics — required for Jaccard sizes/intersections) costs a full
    shuffle; pass distinct=False for consumers that are duplicate-invariant
    (minhash: min over a multiset == min over its set) to skip it.

    explode_OUTER + null-filter, not explode: a plain explode makes
    Catalyst infer `size(sh) > 0` and push it below the scan-side Project
    with the whole tokenize+shingle expression spliced in — every doc then
    builds its shingle array twice (interpreted — higher-order lambdas
    never codegen), serially when the input is a single file. Filter
    inference through an outer generate is unsound, so Catalyst leaves the
    cheap isnotnull above the Generate. Row set identical."""
    toks = tokenize(docs.select(doc_id_col, text_col), text_col=text_col, mode=mode)
    # guard: sequence(1, 0) generates a DESCENDING [1, 0] in ANSI Spark, so
    # docs with < n tokens must short-circuit to an empty shingle array
    sh = F.when(
        F.size("tokens") >= n,
        F.transform(
            F.sequence(F.lit(1), F.size("tokens") - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at("tokens", (i + j).cast("int")) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    out = toks.select(
        F.col(doc_id_col).alias("doc_id"), F.explode_outer(sh).alias("shingle")
    ).filter(F.col("shingle").isNotNull())
    return out.distinct() if distinct else out


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 8,
) -> DataFrame:
    """(doc_id, seed, minhash): per seed s, min over shingles of
    md5('s<seed>:' || shingle). Partial+final min aggregate — skew-proof.
    Uses multiset shingles (min is duplicate-invariant) — one exchange
    fewer than the set-semantics path."""
    sh = shingles(docs, text_col, doc_id_col, n, distinct=False)
    # One row per shingle carrying num_hashes md5 COLUMNS instead of a
    # num_hashes-way explode: the per-(doc, seed) min becomes num_hashes
    # parallel min aggregates over 1/num_hashes as many rows (identical
    # hash strings, identical mins — only the plan shape changes). The
    # explode multiplied every shingle row 8× through the aggregate
    # machinery; here the multiplicity lives in columns, which partial
    # aggregation reduces per doc before the (now much smaller) shuffle.
    hcols = [
        F.min(F.md5(F.concat(F.lit(f"s{s}:"), F.col("shingle")))).alias(f"_m{s}")
        for s in range(num_hashes)
    ]
    mins = sh.groupBy("doc_id").agg(*hcols)
    return mins.select(
        "doc_id",
        F.posexplode(F.array(*[F.col(f"_m{s}") for s in range(num_hashes)])).alias(
            "seed", "minhash"
        ),
    )


def banded_candidate_pairs(
    banded: DataFrame,
    key_cols: list[str],
    id_col: str = "doc_id",
    max_bucket_size: int | None = 10_000,
    distinct: bool = True,
    oversize_policy: str = "star",
) -> DataFrame:
    """Bucket-key self-join with a HOT-BUCKET GUARD — the shared candidate
    generator for every banded LSH path (MinHash bands, hyperplane bands,
    simhash prefixes).

    Buckets with ≤ max_bucket_size members pair all-vs-all (the normal LSH
    candidate join — COMPLETE within the bucket). Oversized buckets — a
    viral near-dup family (boilerplate licenses, templated pages) can land
    10⁵–10⁷ members in ONE bucket, whose self-join emits up to 10¹⁴ pairs
    on a single reducer — switch to STAR pairing: every member pairs with
    the bucket's representative (min id) only, linear in bucket size.

    The exact recall contract of star pairing: on the CANDIDATE graph,
    transitive connectivity inside the bucket is fully preserved (any two
    members connect through the representative), so connected-components
    over raw candidates is unchanged. When candidates are VERIFIED
    downstream (Jaccard/hamming/cosine filters), member↔member pairs whose
    members pass verification against EACH OTHER but not against the
    representative lose their edge — i.e. recall inside an oversized
    bucket is guaranteed only for coherent near-dup families (everything
    similar to the representative), not for heterogeneous buckets where
    the banding itself is too coarse. For pipelines that cannot accept
    that, pass oversize_policy="error" to fail loudly when any bucket
    exceeds the cap (then re-band with more/narrower bands), and use
    `oversized_buckets` to audit. max_bucket_size=None disables the
    guard."""
    from pyspark.sql import Window

    if oversize_policy not in ("star", "error"):
        raise ValueError(f"unknown oversize_policy {oversize_policy}")
    if max_bucket_size is None and oversize_policy == "error":
        raise ValueError(
            "oversize_policy='error' requires a max_bucket_size — with the "
            "guard disabled the strict policy would silently never fire"
        )
    out_sel = [F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")]
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    for kc in key_cols:
        cond = (F.col(f"a.{kc}") == F.col(f"b.{kc}")) & cond
    if max_bucket_size is None:
        banded = banded.localCheckpoint(eager=False)
        pairs = banded.alias("a").join(banded.alias("b"), cond).select(*out_sel)
        return pairs.distinct() if distinct else pairs
    # bucket size/representative via WINDOW functions (not agg + re-join),
    # then the tagged frame is materialized ONCE with a lazy localCheckpoint
    # before fanning out to the three consumers (small-a, small-b, star).
    # ReuseExchange was supposed to share the upstream subtree across the
    # branches, but AQE does not reliably reuse it (event-log-measured r11:
    # the full banding lineage — tokenize, shingle, hash, minhash — ran 2-3×
    # per action, concurrently, the dominant cost of the whole dedup path).
    # The checkpoint pins the banded table (a few dozen bytes per doc·band —
    # metadata-sized at any corpus scale, the standard LSH materialization
    # point) so the expensive lineage runs exactly once and the join/star
    # branches read the persisted blocks.
    w = Window.partitionBy(*key_cols)
    tagged = banded.withColumn("_bucket_n", F.count(F.lit(1)).over(w)).withColumn(
        "_rep", F.min(id_col).over(w)
    ).localCheckpoint(eager=False)
    small = tagged.filter(F.col("_bucket_n") <= max_bucket_size).select(*banded.columns)
    big = tagged.filter(F.col("_bucket_n") > max_bucket_size)
    if oversize_policy == "error":
        # fail loudly instead of degrading recall: the representative column
        # itself raises on the first oversized-bucket row evaluated (it is a
        # USED output column, so the optimizer cannot prune the check; an
        # empty big side raises nothing — exactly the wanted semantics)
        rep_col = F.raise_error(
            F.concat(
                F.lit(
                    "banded_candidate_pairs: bucket over max_bucket_size "
                    f"({max_bucket_size}) with "
                ),
                F.col("_bucket_n").cast("string"),
                F.lit(" members — re-band, or use oversize_policy='star'"),
            )
        ).cast(banded.schema[id_col].dataType)
    else:
        rep_col = F.col("_rep")
    star = (
        big.filter(F.col(id_col) != F.col("_rep"))
        .select(rep_col.alias("id_a"), F.col(id_col).alias("id_b"))
    )
    pairs = small.alias("a").join(small.alias("b"), cond).select(*out_sel).unionByName(star)
    return pairs.distinct() if distinct else pairs


def oversized_buckets(
    banded: DataFrame, key_cols: list[str], max_bucket_size: int = 10_000
) -> DataFrame:
    """Audit companion to banded_candidate_pairs: (key_cols..., n_members)
    for every bucket the guard will star-pair — log/persist this next to the
    dedup output so capping is visible, never silent."""
    return (
        banded.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n_members"))
        .filter(F.col("n_members") > max_bucket_size)
    )


def lsh_candidate_pairs(
    signatures: DataFrame, band_size: int = 2, max_bucket_size: int | None = 10_000
) -> DataFrame:
    """Band the signature (seeds grouped `band_size` at a time), bucket-join
    docs sharing any band value → candidate pairs (doc_a < doc_b). Buckets
    over `max_bucket_size` are star-paired through their min-doc_id
    representative (see banded_candidate_pairs)."""
    # band_key via per-slot min(when(...)) instead of sort_array(collect_list):
    # value-identical (each (doc, band, slot) has exactly ONE row, so the min
    # IS that row; array_sort of the slots == sort_array of the collected
    # list), but DETERMINISTIC — collect_list is flagged nondeterministic, so
    # the three identical Exchange subtrees downstream (join side a, side b,
    # star branch) never canonicalized equal and ReuseExchange could not fire:
    # the whole shingle→md5→minhash→banding upstream ran THREE times per
    # action (event-log-verified r11). Deterministic aggregates restore the
    # single shared shuffle.
    slots = [
        F.min(
            F.when(F.pmod(F.col("seed"), F.lit(band_size)) == j, F.col("minhash"))
        ).alias(f"_s{j}")
        for j in range(band_size)
    ]
    banded = (
        signatures.withColumn("band", (F.col("seed") / band_size).cast("int"))
        .groupBy("doc_id", "band")
        .agg(*slots)
        .withColumn(
            "band_key",
            F.concat_ws(
                "|", F.array_sort(F.array(*[F.col(f"_s{j}") for j in range(band_size)]))
            ),
        )
        .select("doc_id", "band", "band_key")
    )
    return banded_candidate_pairs(
        banded, ["band", "band_key"], "doc_id", max_bucket_size
    ).select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"))


def jaccard_pairs(
    sh: DataFrame,
    min_jaccard: float = 0.0,
    candidates: DataFrame | None = None,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard per doc pair sharing ≥1 shingle:
    |A∩B| / (|A|+|B|−|A∩B|).

    If `candidates` (doc_a, doc_b) is given — the MinHash-LSH scale path —
    intersections are computed ONLY for those pairs: candidates join the
    shingle table once per side, so cost is |candidates| × avg shingles,
    never the quadratic shared-shingle self-join (which at corpus scale is
    generated AFTER banding, not before). Without candidates, the exact
    shared-shingle join runs (quadratic in hot-shingle bucket size — the
    small-N verifier). `max_shingle_df` drops shingles occurring in more
    than that many docs from the pair-GENERATING join only (the standard
    hot-shingle cap: a shingle in 10^6 docs would emit 10^12 pairs); sizes
    always use all shingles. Both paths emit only pairs sharing ≥1
    surviving shingle."""
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    if candidates is not None:
        inter = (
            candidates.select("doc_a", "doc_b")
            .distinct()
            .join(sh.select(F.col("doc_id").alias("doc_a"), "shingle"), "doc_a")
            .join(sh.select(F.col("doc_id").alias("doc_b"), "shingle"), ["doc_b", "shingle"])
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("n_shared"))
        )
    else:
        if max_shingle_df is not None:
            hot = (
                sh.groupBy("shingle")
                .agg(F.count(F.lit(1)).alias("df"))
                .filter(F.col("df") > max_shingle_df)
                .select("shingle")
            )
            sh_gen = sh.join(hot, "shingle", "left_anti")
        else:
            sh_gen = sh
        a = sh_gen.alias("a")
        b = sh_gen.alias("b")
        inter = (
            a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
            .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
            .agg(F.count(F.lit(1)).alias("n_shared"))
        )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    out = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_shared") / (F.col("n_a") + F.col("n_b") - F.col("n_shared")),
        )
    )
    return out.filter(F.col("jaccard") >= min_jaccard).select("doc_a", "doc_b", "n_shared", "jaccard")


def duplicate_clusters(
    pairs: DataFrame,
    nodes: DataFrame | None = None,
    max_iters: int = 20,
    stats_out: dict | None = None,
    policy: str = "propagate",
) -> DataFrame:
    """Connected components over a duplicate-pair graph — the standard
    web-dedup primitive (union-find at cluster scale): every doc in a
    near-dup component gets the component's min doc_id as `cluster_rep`,
    so keep-one-representative decisions are TRANSITIVE (a~b, b~c ⇒ one
    survivor among {a,b,c}), unlike the greedy drop-doc_b-of-each-pair.

    Algorithm: iterative min-label propagation (the classic MapReduce/
    Pregel CC): labels start as doc_id; each round every node takes the
    min of its own and its neighbors' labels; converges in O(component
    diameter) rounds — with `banded_candidate_pairs`' star-shaped
    mega-buckets the diameter is ≤ 2·bands, so a handful of rounds.
    Each round is one join + one partial+final min aggregate (no
    single-reducer stage); the label frame is checkpointed eagerly every
    round — iterative plans otherwise grow without bound, and the
    convergence probe (a changed-label existence check) then runs on
    materialized blocks instead of recomputing the whole chain. When the
    session has a checkpoint dir configured (sc.setCheckpointDir) the
    rounds use RELIABLE df.checkpoint — localCheckpoint blocks die with
    their executors, which on a real cluster kills a long CC job halfway;
    without one, localCheckpoint (fine in local mode / short jobs).
    Superseded rounds' reliable checkpoint files are deleted as soon as the
    next round materializes (Spark itself only cleans them with
    spark.cleaner.referenceTracking.cleanCheckpoints=true, off by default),
    so the job holds at most two label-frame copies on the checkpoint store
    instead of one per round.

    `pairs`: (doc_a, doc_b) undirected edges. `nodes`: optional (doc_id)
    universe — isolated docs (no pair) appear with cluster_rep = doc_id;
    without it only paired docs are returned.
    `stats_out`: optional dict filled with {"cc_rounds": n, "cc_round_secs":
    [...], "cc_converged": bool} — rounds-to-convergence and per-round wall
    are the numbers a 100-TB extrapolation of an iterative job needs.

    `policy` (r8, long-chain insurance): "propagate" (default) is the
    min-label propagation above — O(diameter) rounds, the right cost model
    for `banded_candidate_pairs`' star-shaped output (measured diameter ≤ 2
    at 1.2M and 12M docs). "jump" adds POINTER JUMPING after each
    propagation step (L ← L∘L, one extra self-join of the label frame per
    round — Shiloach-Vishkin-style path compression), collapsing label
    chains geometrically: O(log diameter) rounds, so a verified-pair graph
    with a deep chain (crawl near-dup chains, transitive shingle overlaps)
    fits a small max_iters where propagate would need diameter rounds.
    Same fixpoint, same output, same convergence probe — use it when the
    pair graph did NOT come from star-pairing.
    Output: (doc_id, cluster_rep)."""
    if policy not in ("propagate", "jump"):
        raise ValueError(f"unknown policy: {policy!r} (propagate|jump)")
    import time as _time
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionByName(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    ).distinct()
    if nodes is None:
        universe = edges.select(F.col("src").alias("doc_id")).distinct()
    else:
        universe = nodes.select("doc_id").distinct()

    spark = pairs.sparkSession
    reliable = spark.sparkContext.getCheckpointDir() is not None

    def _ckpt(df: DataFrame) -> DataFrame:
        return df.checkpoint(eager=True) if reliable else df.localCheckpoint(eager=True)

    def _rm_ckpt(df: DataFrame) -> None:
        """Reclaim a superseded round's reliable checkpoint files. Spark only
        deletes them itself with spark.cleaner.referenceTracking.cleanCheckpoints
        (off by default), so a long CC job would otherwise accumulate one full
        label-frame copy per round on the checkpoint store."""
        if not reliable:
            return  # localCheckpoint blocks are lineage-managed, nothing on disk
        try:
            # toRdd() of a checkpointed frame is a projection wrapper over the
            # checkpointed internal RDD — walk up the (linear) dependency
            # chain to the RDD that actually owns the checkpoint file
            j = df._jdf.queryExecution().toRdd()
            for _ in range(8):
                opt = j.getCheckpointFile()
                if opt.isDefined():
                    jvm = spark._jvm
                    hpath = jvm.org.apache.hadoop.fs.Path(opt.get())
                    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
                    fs.delete(hpath, True)
                    return
                deps = j.dependencies()
                if deps.size() == 0:
                    return
                j = deps.apply(0).rdd()
        except Exception:
            pass  # cleanup is best-effort; correctness never depends on it

    labels = _ckpt(universe.withColumn("lab", F.col("doc_id")))
    converged = False
    # max_iters + 1 rounds: a diameter-D component needs D propagation
    # rounds PLUS one zero-change round to confirm convergence, so a
    # max_iters budget genuinely covers diameter-max_iters components
    round_secs: list[float] = []
    for _ in range(max_iters + 1):
        t0 = _time.time()
        neigh = (
            edges.join(labels.select(F.col("doc_id").alias("src"), "lab"), "src")
            .groupBy(F.col("dst").alias("doc_id"))
            .agg(F.min("lab").alias("nlab"))
        )
        stepped = (
            labels.join(neigh, "doc_id", "left")
            .select("doc_id", F.least(F.col("lab"), F.coalesce("nlab", F.col("lab"))).alias("lab"))
        )
        if policy == "jump":
            # pointer jumping: L(v) ← L(L(v)). Labels are doc_ids of
            # universe members (mins of seen doc_ids), so the lookup self-
            # join always hits; chains halve per round instead of shrinking
            # by one. Monotone (labels only decrease toward the component
            # min), so the fixpoint and the zero-change probe are unchanged.
            lut = stepped.select(
                F.col("doc_id").alias("lab"), F.col("lab").alias("lab2")
            )
            stepped = stepped.join(lut, "lab", "left").select(
                "doc_id", F.coalesce("lab2", F.col("lab")).alias("lab")
            )
        new_labels = _ckpt(stepped)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.lab") != F.col("o.lab"))
            .limit(1)
            .count()
        )
        _rm_ckpt(labels)  # probe done — the superseded round's files can go
        labels = new_labels
        round_secs.append(round(_time.time() - t0, 2))
        if changed == 0:
            converged = True
            break
    if stats_out is not None:
        stats_out["cc_rounds"] = len(round_secs)
        stats_out["cc_round_secs"] = round_secs
        stats_out["cc_converged"] = converged
    if not converged:
        # a silent non-converged return would split components and let extra
        # duplicates survive with no signal — fail loudly instead (a 20-round
        # budget covers diameter-20 components; verified-pair chains longer
        # than that are rare but possible, so the remedy is a bigger budget)
        raise RuntimeError(
            f"duplicate_clusters did not converge in max_iters={max_iters} "
            "rounds (component diameter exceeds the budget) — raise max_iters"
        )
    return labels.select("doc_id", F.col("lab").alias("cluster_rep"))


def _simhash_one(tokens: list[str], bits: int = 60) -> int:
    """Per-doc reference formulation (kept as the test oracle for the
    vectorized batch kernel below)."""
    acc = [0] * bits
    for t in tokens:
        h = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)  # 60 bits
        for i in range(bits):
            acc[i] += 1 if (h >> i) & 1 else -1
    out = 0
    for i in range(bits):
        if acc[i] > 0:
            out |= 1 << i
    return out


def simhash(docs: DataFrame, text_col: str = "text", doc_id_col: str = "doc_id", mode: str = "simple") -> DataFrame:
    """60-bit SimHash per doc (token-occurrence weighted) — (doc_id, simhash).
    Near-dup detection then compares hamming distance on the integer.

    Hashing is PURE JVM: per-token 60-bit values come from the builtin
    md5 → conv(hex, 16, 10) → long inside whole-stage codegen (the r2 Arrow
    UDF's per-unique-token Python hashlib call was its hot line at scale).
    The Arrow UDF receives the ready array<long> and only does the
    vectorized bit-matrix accumulation: flatten the batch once, expand to a
    ±1 sign matrix, scatter into per-doc accumulators with np.add.at — no
    per-token Python anywhere."""
    toks = tokenize(docs.select(doc_id_col, text_col), text_col=text_col, mode=mode)
    h60s = F.transform(
        "tokens", lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")
    )

    @F.pandas_udf(LongType())
    def sh_udf(hs_arrays: pd.Series) -> pd.Series:
        n_docs = len(hs_arrays)
        lens = np.fromiter((len(a) for a in hs_arrays), dtype=np.int64, count=n_docs)
        out = np.zeros(n_docs, dtype=np.int64)
        if lens.sum():
            hs = np.concatenate([np.asarray(a, dtype=np.uint64) for a in hs_arrays if len(a)])
            doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
            shifts = np.arange(60, dtype=np.uint64)
            signs = (((hs[:, None] >> shifts) & np.uint64(1)).astype(np.int8) * 2 - 1)
            acc = np.zeros((n_docs, 60), dtype=np.int64)
            np.add.at(acc, doc_idx, signs)
            out = ((acc > 0).astype(np.uint64) << shifts).sum(axis=1).astype(np.int64)
        return pd.Series(out)

    return toks.select(F.col(doc_id_col).alias("doc_id"), sh_udf(h60s).alias("simhash"))


def simhash_near_dups(
    sim: DataFrame,
    max_hamming: int = 3,
    prefix_bits: int = 16,
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """Bucket by the top `prefix_bits` bits (blocking), then verify hamming
    distance within buckets — the scale-path for simhash near-dup pairs.
    Oversized buckets (identical-prefix mega-families) are star-paired
    through their min-doc_id representative (see banded_candidate_pairs)."""
    bucketed = sim.withColumn("bucket", F.shiftright("simhash", 60 - prefix_bits))
    cand = banded_candidate_pairs(
        bucketed.select("doc_id", "bucket"), ["bucket"], "doc_id",
        max_bucket_size, distinct=False,  # one bucket per doc → pairs unique
    )
    sa = sim.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("_sh_a"))
    sb = sim.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("_sh_b"))
    pairs = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            F.col("id_a").alias("doc_a"),
            F.col("id_b").alias("doc_b"),
            F.bit_count(F.col("_sh_a").bitwiseXOR(F.col("_sh_b"))).alias("hamming"),
        )
    )
    return pairs.filter(F.col("hamming") <= max_hamming)

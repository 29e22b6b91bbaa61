"""External source/sink formats (SURVEY §2 S3/S10) — the ir_datasets-shaped
TSV/JSONL boundary the reference reads and writes.

Reference shapes (cited):
  * id⭾text TSV for queries/documents, ids 0-based line ids
    (/root/reference/src/data/lleqa.py:337-345, `_to_disk`);
  * 4-column TREC qrels TSV `qid 0 doc_id rel`
    (/root/reference/src/data/lleqa.py:340-341);
  * JSONL for training tuples / hard negatives
    (/root/reference/src/data/mmarco.py:131-171).

All are thin `spark.read`/`df.write` wrappers — the value is the pinned
schema contract, not the IO. Readers take explicit schemas (no inference
job over a 100 TB landing dir); writers are plain distributed sinks (one
file per partition — use .coalesce(1) only for tiny artifacts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_corpus_table(
    spark: SparkSession, ref: str, fmt: str | None = None
) -> DataFrame:
    """The documents-table entry point (SURVEY §2 S1; north-rule source is an
    Iceberg table of source-code repositories `(repo, path, commit, lang,
    content)`). Dispatch:

      * catalog table name (e.g. `prod.code.documents`) →
        `spark.read.table(...)` — with an Iceberg catalog configured this IS
        the Iceberg scan, inheriting snapshot isolation, hidden-partition
        pruning, and column-pruned scans from the table format;
      * `fmt="iceberg"` + path → `spark.read.format("iceberg").load(...)`
        (requires the Iceberg runtime jars on the cluster);
      * otherwise → parquet directory/file (the sandbox stand-in — same
        schema contract, same plans above the scan).

    Dispatch is PURELY LEXICAL (no filesystem probes — routing must not
    depend on the driver's working directory): a ref containing a path
    separator or ending in .parquet is a path; anything else is a catalog
    name. Force a specific route with fmt="table" / fmt="parquet" when a
    bare name is ambiguous. Every downstream operator sees an identical
    DataFrame either way; the table format only changes the scan node."""
    if fmt == "iceberg":
        return spark.read.format("iceberg").load(ref)
    if fmt == "table":
        return spark.read.table(ref)
    if fmt == "parquet":
        return spark.read.parquet(ref)
    if fmt is not None:
        raise ValueError(f"unknown fmt {fmt}")
    if "/" in ref or "\\" in ref or ref.endswith(".parquet"):
        return spark.read.parquet(ref)
    return spark.read.table(ref)


def read_id_text_tsv(
    spark: SparkSession,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    ids_increment: bool = False,
) -> DataFrame:
    """queries.tsv / collection.tsv: `id⭾text`, no header (lleqa.py:343-345;
    the mMARCO collection uses the same shape). Quote/escape handling is
    DISABLED: the reference writes raw bytes (csv.writer with tab delimiter
    on newline-flattened text), so a leading '\"' in a document must not be
    interpreted as a CSV quote character. ids_increment=True undoes the
    reference writer's `id - 1` line-id quirk (see write_id_text_tsv)."""
    df = (
        spark.read.option("sep", "\t")
        .option("quote", "")
        .option("escape", "")
        .schema(f"{id_col} long, {text_col} string")
        .csv(path)
    )
    if ids_increment:
        df = df.withColumn(id_col, F.col(id_col) + 1)
    return df


def read_qrels_tsv(spark: SparkSession, path: str) -> DataFrame:
    """TREC qrels: `qid⭾0⭾doc_id⭾rel` (lleqa.py:340-341). Returns
    (qid, doc_id, rel); compose with .filter("rel > 0") for positives."""
    df = (
        spark.read.option("sep", "\t")
        .schema("qid long, iter int, doc_id long, rel int")
        .csv(path)
    )
    return df.select("qid", "doc_id", "rel")


def read_jsonl(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    """JSONL source (mmarco.py:131-141 hard-negatives shape, or any landing
    feed). Pass `schema` in production — schema inference scans the data."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_id_text_tsv(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    ids_decrement: bool = False,
) -> None:
    """id⭾text TSV sink; newlines flattened to spaces exactly like the
    reference writer (lleqa.py:345 `.replace('\\n',' ').replace('\\r',' ')`);
    tabs flattened too (the raw no-quote contract has no way to escape the
    delimiter), quoting disabled to emit raw bytes.

    ids_decrement=True reproduces the reference's ColBERT line-id quirk
    byte-for-byte: `_to_disk` writes `text_id - 1` (lleqa.py:342-345), so
    files produced here interleave with reference-produced ones. Compose
    with read_id_text_tsv(ids_increment=True) for a lossless roundtrip."""
    id_out = (F.col(id_col) - 1) if ids_decrement else F.col(id_col)
    (
        df.select(
            id_out.cast("string"),
            F.regexp_replace(F.col(text_col), r"[\n\r\t]", " ").alias("text"),
        )
        .write.mode("overwrite")
        .option("sep", "\t")
        .option("quote", "")
        .option("escape", "")
        .csv(path)
    )


def write_qrels_tsv(
    qrels: DataFrame, path: str, rel: int = 1, ids_decrement: bool = False
) -> None:
    """4-column TREC qrels sink (lleqa.py:340-341). ids_decrement=True
    writes `qid - 1` and `doc_id - 1` (the reference's `qid-1, pos_pid-1`
    line-id convention, lleqa.py:340-343); rel is untouched."""
    dec = F.lit(1) if ids_decrement else F.lit(0)
    (
        qrels.select(
            (F.col("qid") - dec).cast("string"),
            F.lit("0"),
            (F.col("doc_id") - dec).cast("string"),
            (F.col("rel") if "rel" in qrels.columns else F.lit(rel)).cast("string"),
        )
        .write.mode("overwrite")
        .option("sep", "\t")
        .csv(path)
    )


def write_jsonl(df: DataFrame, path: str) -> None:
    """JSONL sink (training tuples, negatives, metrics dumps)."""
    df.write.mode("overwrite").json(path)


def write_trec_run(ranked: DataFrame, path: str, run_tag: str = "fusion_spark") -> None:
    """Standard 6-column TREC run sink: `qid Q0 doc_id rank score tag` —
    the interchange format for the (qid, doc_id, score, rank) ranked lists
    every scorer here emits."""
    (
        ranked.select(
            F.col("qid").cast("string"),
            F.lit("Q0"),
            F.col("doc_id").cast("string"),
            F.col("rank").cast("string"),
            F.col("score").cast("string"),
            F.lit(run_tag),
        )
        .write.mode("overwrite")
        .option("sep", " ")
        .csv(path)
    )


def read_lleqa_dataset(
    spark: SparkSession, root: str, name: str = "corpus", split: str | None = None
) -> DataFrame:
    """Local-layout counterpart of the reference's HuggingFace-hub loads
    (lleqa.py:176-210). The network fetch itself is out of scope by design
    (SURVEY S11: no external data), but the SHAPES, column renames, and
    split mapping are reproduced exactly, so a locally exported dump of the
    dataset — one parquet per config/split under `root`: corpus.parquet,
    questions_{train,validation,test}.parquet, negatives_<system>.parquet —
    drops straight into the engine:

      * name="corpus"    → (doc_id long, text string) from the reference's
                           (id, article) columns (lleqa.py:176);
      * name="questions" → (qid long, question string,
                           article_ids array<long>); the caller's split
                           'dev' maps to the stored 'validation' split
                           (lleqa.py:191);
      * name="negatives" → (qid long, neg_ids array<long>); `split` names
                           the negatives system. The stored shape mirrors
                           the reference's quirk — ONE row whose columns
                           are question ids and whose cells are doc-id
                           lists (lleqa.py:210 reads it with
                           .to_dict(orient='records')[0]) — melted here to
                           one row per question.
    """
    if name == "corpus":
        df = spark.read.parquet(f"{root}/corpus.parquet")
        return df.select(
            F.col("id").cast("long").alias("doc_id"), F.col("article").alias("text")
        )
    if name == "questions":
        if split is None:
            raise ValueError(
                "read_lleqa_dataset(name='questions') needs split= "
                "('train' | 'dev'/'validation' | 'test')"
            )
        stored = "validation" if split == "dev" else split
        df = spark.read.parquet(f"{root}/questions_{stored}.parquet")
        return df.select(
            F.col("id").cast("long").alias("qid"),
            "question",
            F.col("article_ids").cast("array<long>").alias("article_ids"),
        )
    if name == "negatives":
        if split is None:
            raise ValueError(
                "read_lleqa_dataset(name='negatives') needs split=<system name> "
                "(names the negatives file negatives_<system>.parquet)"
            )
        df = spark.read.parquet(f"{root}/negatives_{split}.parquet")
        # the stored one-row shape's column NAMES are question ids — a
        # non-numeric column means a malformed dump; casting it to a NULL
        # qid would silently drop it instead
        bad = [c for c in df.columns if not c.lstrip("-").isdigit()]
        if bad:
            raise ValueError(
                f"negatives dump has non-integer question-id columns {bad[:5]!r} "
                "— expected one column per question id (lleqa.py:210 shape)"
            )
        melted = df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).cast("long").alias("qid"),
                            F.col(c).cast("array<long>").alias("neg_ids"),
                        )
                        for c in df.columns
                    ]
                )
            ).alias("kv")
        )
        return melted.select("kv.qid", "kv.neg_ids")
    raise ValueError(f"unknown lleqa config {name!r} (corpus|questions|negatives)")

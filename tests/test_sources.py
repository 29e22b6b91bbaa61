"""S3/S10 source/sink formats: TSV/JSONL/TREC roundtrips + T2 split dedup."""

import pytest
from pyspark.sql import functions as F

from fusion_spark.corpus import dedup_splits
from fusion_spark.sources import (
    read_id_text_tsv,
    read_jsonl,
    read_qrels_tsv,
    write_id_text_tsv,
    write_jsonl,
    write_qrels_tsv,
    write_trec_run,
)


def test_id_text_tsv_roundtrip(spark, tmp_path):
    docs = spark.createDataFrame(
        [(0, "hello world"), (1, "line with\nnewline"), (2, "tab\there"),
         (3, '"quoted" text with, comma'), (4, '"leading quote')],
        "doc_id long, text string",
    )
    p = str(tmp_path / "docs_tsv")
    write_id_text_tsv(docs, p)
    back = {r["doc_id"]: r["text"] for r in read_id_text_tsv(spark, p).collect()}
    assert back[0] == "hello world"
    assert back[1] == "line with newline"  # reference writer flattens newlines
    assert back[2] == "tab here"  # delimiter flattened (raw no-quote contract)
    # quotes pass through as raw bytes — never CSV-interpreted
    assert back[3] == '"quoted" text with, comma'
    assert back[4] == '"leading quote'
    assert len(back) == 5


def test_qrels_tsv_roundtrip(spark, tmp_path):
    qrels = spark.createDataFrame([(1, 10), (1, 20), (2, 30)], "qid long, doc_id long")
    p = str(tmp_path / "qrels_tsv")
    write_qrels_tsv(qrels, p)
    back = read_qrels_tsv(spark, p)
    assert sorted((r["qid"], r["doc_id"], r["rel"]) for r in back.collect()) == [
        (1, 10, 1), (1, 20, 1), (2, 30, 1),
    ]


def test_jsonl_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, [10, 20]), (2, [30])], "qid long, negs array<long>")
    p = str(tmp_path / "jl")
    write_jsonl(df, p)
    back = read_jsonl(spark, p, schema="qid long, negs array<long>")
    assert sorted((r["qid"], tuple(r["negs"])) for r in back.collect()) == [
        (1, (10, 20)), (2, (30,)),
    ]


def test_trec_run_format(spark, tmp_path):
    ranked = spark.createDataFrame(
        [(1, 5, 2.5, 1), (1, 7, 1.0, 2)], "qid long, doc_id long, score double, rank long"
    )
    p = str(tmp_path / "run")
    write_trec_run(ranked, p, run_tag="t")
    lines = sorted(
        r["value"] for r in spark.read.text(p).collect()
    )
    assert lines == ["1 Q0 5 1 2.5 t", "1 Q0 7 2 1.0 t"]


def test_dedup_splits_anti_join(spark):
    train = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "qid long, x string")
    dev = spark.createDataFrame([(2,), (2,), (9,)], "qid long")
    kept = sorted(r["qid"] for r in dedup_splits(train, dev).collect())
    assert kept == [1, 3]


def test_s_stemmer_rules():
    from fusion_spark.tokenize import s_stem

    assert s_stem("policies") == "policy"
    assert s_stem("caches") == "cache"
    assert s_stem("tables") == "table"
    assert s_stem("columns") == "column"
    assert s_stem("corpus") == "corpus"  # -us guard
    assert s_stem("class") == "class"  # -ss guard
    # -oes blocks rule 2 but the token falls through to rule 3 (plain -s):
    # rules are tried in order until one APPLIES, exceptions included
    assert s_stem("toes") == "toe"
    assert s_stem("as") == "as"  # short-token guard


def test_ids_decrement_byte_parity_with_reference_format(spark, tmp_path):
    """ids_decrement=True reproduces the reference `_to_disk` line-id quirk
    (lleqa.py:342-345: text_id-1 / qid-1,pos_pid-1) BYTE-identically, and
    ids_increment on the reader inverts it losslessly."""
    import glob

    docs = spark.createDataFrame(
        [(1, "premier document"), (2, "second text"), (3, "troisieme")],
        "doc_id long, text string",
    )
    p = str(tmp_path / "dec_tsv")
    write_id_text_tsv(docs.coalesce(1).sortWithinPartitions("doc_id"), p, ids_decrement=True)
    data = b"".join(open(f, "rb").read() for f in sorted(glob.glob(p + "/part-*")))
    # exactly what the reference's csv.writer(delimiter='\t') would emit
    assert data == b"0\tpremier document\n1\tsecond text\n2\ttroisieme\n"
    back = read_id_text_tsv(spark, p, ids_increment=True)
    assert {(r["doc_id"], r["text"]) for r in back.collect()} == {
        (1, "premier document"), (2, "second text"), (3, "troisieme")
    }

    qrels = spark.createDataFrame([(5, 9, 1), (6, 2, 1)], "qid long, doc_id long, rel int")
    q = str(tmp_path / "dec_qrels")
    write_qrels_tsv(qrels.coalesce(1).sortWithinPartitions("qid"), q, ids_decrement=True)
    qdata = b"".join(open(f, "rb").read() for f in sorted(glob.glob(q + "/part-*")))
    assert qdata == b"4\t0\t8\t1\n5\t0\t1\t1\n"


def test_porter_stemmer_original_algorithm_vectors():
    """Original Porter (1980) — full-pipeline outputs, incl. the cases where
    the original differs from NLTK's extended variant (dies→di, saying→sai)."""
    from fusion_spark.tokenize import porter_stem

    vecs = {
        "caresses": "caress", "ponies": "poni", "flies": "fli", "dies": "di",
        "agreed": "agre", "plastered": "plaster", "motoring": "motor",
        "hopping": "hop", "falling": "fall", "filing": "file", "sized": "size",
        "happy": "happi", "saying": "sai", "relational": "relat",
        "conditional": "condit", "itemization": "item", "sensational": "sensat",
        "traditional": "tradit", "reference": "refer", "colonizer": "colon",
        "plotted": "plot", "electrical": "electr", "university": "univers",
        "running": "run", "generalization": "gener", "oscillators": "oscil",
        "controlled": "control", "argument": "argument", "arguments": "argument",
        "roll": "roll", "sky": "sky", "a": "a", "is": "is",
    }
    got = {w: porter_stem(w) for w in vecs}
    assert got == vecs


def test_reference_porter_mode_pipeline(spark):
    """reference_porter keeps the exact preprocessor pipeline order (filters
    before lemma, lowercase after) with Porter at the plug-point."""
    from fusion_spark.tokenize import tokenize

    docs = spark.createDataFrame(
        [(1, "Running ponies !!! 3cats The falling"), (2, "")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["tokens"] for r in tokenize(docs, mode="reference_porter").collect()}
    # "!!!" punct-dropped, "3cats" digit-dropped, "The" stopword-dropped,
    # rest Porter-stemmed then lowercased
    assert out[1] == ["run", "poni", "fall"]
    assert out[2] == []


def test_read_corpus_table_dispatch(spark, tmp_path):
    """read_corpus_table: catalog-name refs go through spark.read.table
    (the Iceberg path on a configured cluster); path refs read parquet —
    identical DataFrames above the scan."""
    from fusion_spark.sources import read_corpus_table

    docs = spark.createDataFrame(
        [("o/r", "a.py", "c1", "python", "def f(): pass")],
        "repo string, path string, commit string, lang string, content string",
    )
    p = str(tmp_path / "docs_pq")
    docs.write.parquet(p)
    via_path = read_corpus_table(spark, p)
    docs.createOrReplaceTempView("corpus_tbl")
    via_table = read_corpus_table(spark, "corpus_tbl")
    assert sorted(map(tuple, via_path.collect())) == sorted(map(tuple, via_table.collect()))
    assert via_path.schema == via_table.schema


def test_read_lleqa_dataset_layout(spark, tmp_path):
    """Local-dump counterpart of the reference's HF loads (lleqa.py:176-210):
    corpus (id, article) -> (doc_id, text); questions split 'dev' maps to
    the stored 'validation' file; the one-row negatives quirk (columns =
    question ids, cells = doc-id lists) melts to (qid, neg_ids)."""
    from pyspark.sql import functions as F

    from fusion_spark.sources import read_lleqa_dataset

    root = str(tmp_path)
    spark.createDataFrame(
        [(1, "first article"), (2, "second article")], "id int, article string"
    ).write.parquet(f"{root}/corpus.parquet")
    spark.createDataFrame(
        [(7, "what is q7", [1, 2]), (9, "what is q9", [2])],
        "id int, question string, article_ids array<int>",
    ).write.parquet(f"{root}/questions_validation.parquet")
    spark.createDataFrame(
        [([1, 2], [2])], "`7` array<int>, `9` array<int>"
    ).write.parquet(f"{root}/negatives_bm25.parquet")

    corpus = read_lleqa_dataset(spark, root, "corpus")
    assert corpus.columns == ["doc_id", "text"]
    assert {tuple(r) for r in corpus.collect()} == {(1, "first article"), (2, "second article")}

    qs = read_lleqa_dataset(spark, root, "questions", split="dev")  # dev -> validation
    assert qs.columns == ["qid", "question", "article_ids"]
    assert {r["qid"] for r in qs.collect()} == {7, 9}
    assert dict(qs.schema["article_ids"].dataType.jsonValue().items())["elementType"] == "long"

    negs = {r["qid"]: r["neg_ids"] for r in
            read_lleqa_dataset(spark, root, "negatives", split="bm25").collect()}
    assert negs == {7: [1, 2], 9: [2]}

    import pytest as _pytest
    with _pytest.raises(ValueError, match="unknown lleqa config"):
        read_lleqa_dataset(spark, root, "nope")


def test_read_lleqa_dataset_validates_split_and_qid_columns(spark, tmp_path):
    """r4 advice: questions/negatives without split= built a nonsense path
    ('questions_None.parquet'), and a malformed negatives dump with
    non-numeric column names melted into NULL qids silently — both raise."""
    import pandas as pd

    from fusion_spark.sources import read_lleqa_dataset

    root = str(tmp_path)
    with pytest.raises(ValueError, match="needs split"):
        read_lleqa_dataset(spark, root, "questions")
    with pytest.raises(ValueError, match="needs split"):
        read_lleqa_dataset(spark, root, "negatives")
    pd.DataFrame({"12": [[1, 2]], "oops": [[3]]}).to_parquet(
        f"{root}/negatives_bad.parquet"
    )
    with pytest.raises(ValueError, match="non-integer question-id"):
        read_lleqa_dataset(spark, root, "negatives", split="bad")


def _iceberg_runtime_jar():
    """Locate an iceberg-spark-runtime jar: $ICEBERG_JAR, the pyspark jars
    dir, or $SPARK_HOME/jars. None → the round-trip test skips (the sandbox
    ships no Iceberg runtime; the dispatcher's parquet stand-in and lexical
    routing are covered by test_read_corpus_table_dispatch)."""
    import glob
    import os

    import pyspark

    env = os.environ.get("ICEBERG_JAR")
    if env and os.path.exists(env):
        return env
    for d in (
        os.path.join(os.path.dirname(pyspark.__file__), "jars"),
        os.path.join(os.environ.get("SPARK_HOME", "/nonexistent"), "jars"),
    ):
        hits = glob.glob(os.path.join(d, "iceberg-spark-runtime*.jar"))
        if hits:
            return hits[0]
    return None


@pytest.mark.skipif(
    _iceberg_runtime_jar() is None,
    reason="no iceberg-spark-runtime jar on this machine (north_rule names "
    "Iceberg tables; set ICEBERG_JAR or install the runtime to exercise the "
    "real round-trip — the dispatcher itself is covered via parquet/table)",
)
def test_read_corpus_table_iceberg_round_trip(tmp_path):
    """With the Iceberg runtime available, read_corpus_table must read a real
    Iceberg catalog table (both the catalog-name route and fmt='iceberg'
    path route) identically to the parquet stand-in. Runs in a SUBPROCESS:
    spark.sql.extensions and the catalog conf are JVM-construction-time
    settings, so the shared test session can't be reused."""
    import os
    import subprocess
    import sys

    script = f"""
import sys
sys.path.insert(0, {repr(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))})
from pyspark.sql import SparkSession
from fusion_spark.sources import read_corpus_table

wh = {repr(str(tmp_path))} + "/warehouse"
spark = (
    SparkSession.builder.master("local[2]").appName("iceberg-rt")
    .config("spark.jars", {repr(_iceberg_runtime_jar())})
    .config("spark.sql.extensions",
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions")
    .config("spark.sql.catalog.local", "org.apache.iceberg.spark.SparkCatalog")
    .config("spark.sql.catalog.local.type", "hadoop")
    .config("spark.sql.catalog.local.warehouse", wh)
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
rows = [(0, "alpha doc"), (1, "bravo doc"), (2, "charlie doc")]
df = spark.createDataFrame(rows, "doc_id long, text string")
df.writeTo("local.db.documents").create()

via_catalog = read_corpus_table(spark, "local.db.documents")
via_path = read_corpus_table(spark, wh + "/db/documents", fmt="iceberg")
pq = {repr(str(tmp_path))} + "/pq"
df.write.parquet(pq)
via_parquet = read_corpus_table(spark, pq)

want = sorted(rows)
for frame in (via_catalog, via_path, via_parquet):
    got = sorted((r["doc_id"], r["text"]) for r in frame.select("doc_id", "text").collect())
    assert got == want, got
print("ICEBERG_RT_OK")
spark.stop()
"""
    out = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True, timeout=600
    )
    assert "ICEBERG_RT_OK" in out.stdout, out.stdout[-2000:] + out.stderr[-2000:]

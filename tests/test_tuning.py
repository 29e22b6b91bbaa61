"""Tuning grids: small k1/b grid matches per-combo direct evaluation; the
weight simplex enumerates the right count and sums to 1."""

import pytest

from fusion_spark import synth
from fusion_spark.indexing import build_index
from fusion_spark.metrics import compute_all_metrics
from fusion_spark.scoring import search
from fusion_spark.tuning import bm25_grid, weight_simplex


def test_weight_simplex_counts():
    combos = weight_simplex(["a", "b"], step=0.5)
    assert sorted(tuple(sorted(c.items())) for c in combos) == sorted(
        [
            (("a", 0.0), ("b", 1.0)),
            (("a", 0.5), ("b", 0.5)),
            (("a", 1.0), ("b", 0.0)),
        ]
    )
    full = weight_simplex(["a", "b", "c"], step=0.05)
    assert all(abs(sum(w.values()) - 1.0) < 1e-9 for w in full)
    assert len(full) == 231  # C(20+2, 2)


def test_bm25_grid_matches_direct(spark, docs_df, queries_df, qrel_rows):
    idx = build_index(docs_df, doc_id_col="doc_id", text_col="content")
    qrels = spark.createDataFrame(qrel_rows)
    grid = bm25_grid(
        idx, queries_df, qrels, k1_values=[0.5, 2.5], b_values=[0.2], top_k=20,
        recall_k=(10,),
    ).collect()
    assert len(grid) == 2
    for row in grid:
        ranked = search(idx, queries_df, k=20, k1=row["k1"], b=row["b"])
        direct = compute_all_metrics(
            ranked.select("qid", "doc_id", "rank"), qrels,
            recall_k=(10,), map_k=(), mrr_k=(), ndcg_k=(),
        )
        assert row["recall_10"] == pytest.approx(direct["recall@10"], abs=1e-9)


def test_bm25_grid_fused_matches_loop(spark, docs_df, queries_df, qrel_rows):
    """The one-plan grid must equal the per-combo driver loop cell for cell
    (scores are bit-identical by construction — same join, same term-sorted
    fold, same op order)."""
    from fusion_spark.tuning import bm25_grid_fused

    idx = build_index(docs_df, doc_id_col="doc_id", text_col="content")
    qrels = spark.createDataFrame(qrel_rows)
    kw = dict(k1_values=[0.5, 1.5, 2.5], b_values=[0.2, 0.75], top_k=20, recall_k=(5, 10))
    loop = {(r["k1"], r["b"]): r for r in bm25_grid(idx, queries_df, qrels, **kw).collect()}
    fused = {(r["k1"], r["b"]): r for r in bm25_grid_fused(idx, queries_df, qrels, **kw).collect()}
    assert set(loop) == set(fused) and len(fused) == 6
    for cell in loop:
        for m in ("recall_5", "recall_10"):
            assert fused[cell][m] == pytest.approx(loop[cell][m], abs=1e-12), (cell, m)


def test_bm25_grid_fused_single_scan_plan(spark, docs_df, queries_df, qrel_rows):
    """The fused grid's plan must contain exactly ONE scan of the postings
    side regardless of grid size (the loop version scans per combo)."""
    import contextlib
    import io

    from fusion_spark.tuning import bm25_grid_fused

    idx = build_index(docs_df, doc_id_col="doc_id", text_col="content")
    qrels = spark.createDataFrame(qrel_rows)
    grid = bm25_grid_fused(idx, queries_df, qrels, k1_values=[0.5, 1.5, 2.5],
                           b_values=[0.2, 0.75], top_k=20, recall_k=(10,))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        grid.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan  # combos join is broadcast


def test_nsf_weight_grid_fused_matches_loop(spark, query_rows):
    from fusion_spark import synth
    from fusion_spark.tuning import nsf_weight_grid, nsf_weight_grid_fused

    legs = spark.createDataFrame(synth.make_score_lists(query_rows, n_docs=40))
    qrels = spark.createDataFrame(
        [{"qid": q["qid"], "article_ids": [d for d in range(0, 40, 7)]} for q in query_rows]
    )
    kw = dict(normalization="min-max", step=0.5, return_topk=20, recall_k=(10,))
    loop = {
        tuple(sorted((c, v) for c, v in r.asDict().items() if c.startswith("weight_"))):
            r["recall_10"]
        for r in nsf_weight_grid(legs, qrels, **kw).collect()
    }
    fused = {
        tuple(sorted((c, v) for c, v in r.asDict().items() if c.startswith("weight_"))):
            r["recall_10"]
        for r in nsf_weight_grid_fused(legs, qrels, **kw).collect()
    }
    assert set(loop) == set(fused) and len(fused) >= 3
    for cell in loop:
        assert fused[cell] == pytest.approx(loop[cell], abs=1e-12), cell


def test_write_grid_artifacts(spark, docs_df, queries_df, qrel_rows, tmp_path):
    """Reference tuning artifacts (bm25.py:241-246): grid CSV with %.5f
    floats and hyperparameter columns first; heatmap pivot with k1 rows
    DESCENDING and values ×100 — written as CSV here (no plotting stack in
    the container; the PDF branch activates when seaborn imports)."""
    import os

    from fusion_spark.tuning import bm25_grid, write_grid_artifacts

    idx = build_index(docs_df, doc_id_col="doc_id", text_col="content")
    qrels = spark.createDataFrame(qrel_rows)
    grid = bm25_grid(
        idx, queries_df, qrels, k1_values=[0.5, 2.5], b_values=[0.2, 0.75],
        top_k=20, recall_k=(10,),
    )
    out = str(tmp_path / "artifacts")
    pivot = write_grid_artifacts(grid, out, metric="recall_10")

    with open(os.path.join(out, "bm25_tuning_results.csv")) as f:
        header, *rows = [ln.strip() for ln in f if ln.strip()]
    assert header.split(",")[:2] == ["k1", "b"] and len(rows) == 4
    assert all(len(cell.split(".")[-1]) == 5 for cell in rows[0].split(","))  # %.5f

    assert list(pivot.index) == [2.5, 0.5]  # k1 DESCENDING (reference [::-1])
    assert list(pivot.columns) == [0.2, 0.75]
    g = {(r["k1"], r["b"]): r["recall_10"] for r in grid.collect()}
    assert pivot.loc[2.5, 0.2] == pytest.approx(g[(2.5, 0.2)] * 100)
    assert os.path.exists(os.path.join(out, "bm25_tuning_heatmap.csv"))  # stand-in


def test_write_grid_artifacts_byte_parity(spark, tmp_path):
    """r4 verdict #6: pin the artifact BYTES, not just the structure. A
    hand-written expected CSV (the reference's to_csv options: sep=',',
    float_format='%.5f', index=False, hyperparameter columns first —
    bm25.py:241) and heatmap pivot CSV (×100, one decimal, k1 DESCENDING)
    must match the writer's output byte-for-byte."""
    import os

    from fusion_spark.tuning import write_grid_artifacts

    grid = spark.createDataFrame(
        [(0.5, 0.2, 0.5), (0.5, 0.75, 0.25), (2.5, 0.2, 1.0), (2.5, 0.75, 0.125)],
        "k1 double, b double, recall_100 double",
    )
    out = str(tmp_path / "parity")
    write_grid_artifacts(grid, out, metric="recall_100")

    want_csv = (
        "k1,b,recall_100\n"
        "0.50000,0.20000,0.50000\n"
        "0.50000,0.75000,0.25000\n"
        "2.50000,0.20000,1.00000\n"
        "2.50000,0.75000,0.12500\n"
    )
    with open(os.path.join(out, "bm25_tuning_results.csv"), "rb") as f:
        assert f.read() == want_csv.encode()

    want_heat = (
        "k1,0.2,0.75\n"
        "2.5,100.0,12.5\n"
        "0.5,50.0,25.0\n"
    )
    with open(os.path.join(out, "bm25_tuning_heatmap.csv"), "rb") as f:
        assert f.read() == want_heat.encode()


def test_reference_187_combo_grid_shape(spark, docs_df, queries_df, qrel_rows, tmp_path):
    """The reference's actual tuning sweep (bm25.py:227-229): k1∈[0,8]
    step 0.5 × b∈[0,1] step 0.1 = 187 combos, run through the fused
    one-plan grid and the artifact writer. Asserts the full-size CSV shape
    (187 rows, hyperparameters-first header) and the 17×11 pivot with k1
    rows descending 8.0→0.0 — the reference heatmap's exact axes."""
    import os

    import numpy as np

    from fusion_spark.tuning import bm25_grid_fused, write_grid_artifacts

    idx = build_index(docs_df, doc_id_col="doc_id", text_col="content")
    qrels = spark.createDataFrame(qrel_rows)
    k1s = [round(x, 1) for x in np.arange(0.0, 8.5, 0.5)]
    bs = [round(x, 1) for x in np.arange(0.0, 1.1, 0.1)]
    grid = bm25_grid_fused(
        idx, queries_df, qrels, k1_values=k1s, b_values=bs,
        top_k=100, recall_k=(100,), score_round=6,
    )
    out = str(tmp_path / "full")
    pivot = write_grid_artifacts(grid, out, metric="recall_100")

    with open(os.path.join(out, "bm25_tuning_results.csv")) as f:
        header, *rows = [ln for ln in f.read().splitlines() if ln]
    assert header == "k1,b,recall_100"
    assert len(rows) == 187
    assert pivot.shape == (17, 11)
    assert list(pivot.index) == sorted(k1s, reverse=True)
    assert list(pivot.columns) == bs
    assert float(pivot.max().max()) <= 100.0 and float(pivot.min().min()) >= 0.0

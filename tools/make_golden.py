"""Generate the committed golden files (FIXTURES.md §7) from the vendored
pure-Python oracle over the seed-42 synthetic corpus. Pure Python — no Spark.

Usage: python tools/make_golden.py   (writes tests/golden/*.json)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fusion_spark import oracle, synth  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "golden")


def main():
    os.makedirs(OUT, exist_ok=True)
    corpus_rows = synth.make_corpus(64)
    queries = synth.make_queries(12)
    qrels = synth.make_qrels(corpus_rows, queries)
    corpus = {r["doc_id"]: r["content"] for r in corpus_rows}
    qmap = {q["qid"]: q["question"] for q in queries}

    o = oracle.OracleIndex(corpus, variant="bm25")
    golden_topk = {}
    for tag, (k1, b) in {"tuned": (2.5, 0.2), "default": (1.5, 0.75)}.items():
        ranked = o.search_all(qmap, top_k=20, k1=k1, b=b)
        golden_topk[tag] = {
            str(qid): [[d, round(s, 10)] for d, s in rows] for qid, rows in ranked.items()
        }
    with open(f"{OUT}/golden_bm25_topk.json", "w") as f:
        json.dump(golden_topk, f, indent=1, sort_keys=True)

    # fused golden: bm25 + tfidf legs (k=20 each) through every fusion mode
    ot = oracle.OracleIndex(corpus, variant="tfidf")
    legs = {
        "bm25": o.search_all(qmap, top_k=20, k1=2.5, b=0.2),
        "tfidf": ot.search_all(qmap, top_k=20),
    }
    golden_fused = {}
    for method, norm in [("bcf", None), ("rrf", None), ("nsf", "min-max"),
                         ("nsf", "z-score"), ("nsf", "arctan")]:
        fused = oracle.fuse(legs, method=method, normalization=norm)
        key = method if norm is None else f"{method}_{norm}"
        golden_fused[key] = {
            str(qid): [[d, round(float(s), 7)] for d, s in rows[:10]]
            for qid, rows in fused.items()
        }
    with open(f"{OUT}/golden_fused_topk.json", "w") as f:
        json.dump(golden_fused, f, indent=1, sort_keys=True)

    ranked = o.search_all(qmap, top_k=20, k1=2.5, b=0.2)
    all_gt = [next(r["article_ids"] for r in qrels if r["qid"] == q["qid"]) for q in queries]
    all_preds = [[d for d, _ in ranked[q["qid"]]] for q in queries]
    metrics = oracle.compute_all_metrics(
        all_gt, all_preds, recall_k=(5, 10, 20), map_k=(10,), mrr_k=(10,), ndcg_k=(10,)
    )
    with open(f"{OUT}/golden_metrics.json", "w") as f:
        json.dump({k: round(v, 10) for k, v in metrics.items()}, f, indent=1, sort_keys=True)
    print("golden files written to", OUT)


if __name__ == "__main__":
    main()

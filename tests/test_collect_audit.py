"""Registry-wide collect audit (round-7 verdict item 1).

Every ``.collect()`` in the engine package must be DIMENSION-bounded —
its row count fixed by a constant (k centroids, d dimensions, top-k
limit, a 25-nation matrix, a 3-row format union, one scalar) rather
than by the data scale. A data-scale collect is a driver OOM at 100 TB,
so any NEW collect site fails this test until it is reviewed and added
to the allowlist below with its bound documented.

The former offender — ``stream_foreachbatch_merge``'s final-state
materialization (per-user state grows with the data) — now returns a
lazy ``spark.read.parquet`` of the last merged version instead
(``operators/streaming_queries.py``), so it is intentionally NOT in
this allowlist.
"""

import ast
import pathlib

import hadoop_spark_pspd_spark as pkg

PKG_ROOT = pathlib.Path(pkg.__file__).parent

# (module-relative path, enclosing function) -> documented bound
ALLOWED = {
    # CLI entry point: explicit .limit(args.limit) before the collect.
    ("__main__.py", "main"),
    # Plan assertion helper: test-support, evaluates a already-bounded df.
    ("plans/checks.py", "has_wholestage_codegen"),
    # BPE trainer: .limit(VOCAB_TOP) (constant) word histogram.
    ("operators/bpe.py", "_train_merges"),
    # PCA fit: d per-dimension fixed-point sums + d*d gram cells (d=DIM).
    ("operators/embeddings_linalg.py", "_fit_pca"),
    # BFS root: single MIN() scalar.
    ("operators/graph.py", "graph_bfs_hops"),
    # HITS kernel gate: ONE (count, sum) stats row off the aggregated
    # bipartite edge table.
    ("operators/graph.py", "graph_hits_bipartite"),
    # 25^2 nation weight matrix + 25-row name map (dimension-bounded
    # driver fold, the ml_bradley_terry class)
    ("operators/graph.py", "graph_spectral_partition"),
    # Conformal/boosted-stump training: per-round histograms bounded by
    # (_PCP_DIM+1) x 17 buckets, plus one SSE scalar per round.
    ("operators/inference.py", "_pass"),
    ("operators/inference.py", "infer_boosted_stumps"),
    # Bradley-Terry: nation x nation win matrix (<= 25*24 rows).
    ("operators/llm_extras.py", "ml_bradley_terry"),
    # UCB replay: event-type-bounded reward prefix (arms x 64 pulls).
    ("operators/ml_data.py", "ml_ucb_bandit"),
    # IVF/PQ trainers: .limit(_QUANT_SAMPLE) (constant 256) sample rows.
    ("operators/similarity.py", "_train_coarse_quantizer"),
    # bounded by _QUANT_SAMPLE=256 (the IVF-sample bounded-collect class)
    ("operators/similarity.py", "_train_residual_codebooks"),
    ("operators/similarity.py", "_train_pq_codebooks"),
    # int8 recall: d per-dimension min/max rows (d=DIM).
    ("operators/similarity.py", "sim_int8_recall"),
    # k-center: _KC_K sequential argmax picks, one row each.
    ("operators/similarity.py", "sim_kcenter_coreset"),
    # blocked-matmul screen: k_cells occupancy rows.
    ("operators/similarity.py", "neardup_candidates"),
    # multi-format roundtrip: 3-row (one per format) aggregate, must be
    # materialized before the scratch files are deleted.
    ("operators/sources_roundtrip.py", "q_multiformat_roundtrip"),
    # partition-pruning proof: one row per pruned partition (2), must be
    # materialized before the scratch tree is deleted.
    ("operators/sources_roundtrip.py", "q_partition_pruning_scan"),
    # schema evolution: <= 6-row aggregate (priority dimension + missing),
    # materialized before scratch cleanup.
    ("operators/sources_roundtrip.py", "q_schema_evolution"),
    # corrupt-record CSV audit: single summary row before scratch cleanup.
    ("operators/sources_roundtrip.py", "q_csv_corrupt_records"),
}

# Same discipline for toPandas(): driver-side materialization.
ALLOWED_TOPANDAS: set = set()


def _call_sites(attr: str):
    sites = set()
    for path in sorted(PKG_ROOT.rglob("*.py")):
        tree = ast.parse(path.read_text())
        spans = [
            (n.lineno, n.end_lineno, n.name)
            for n in ast.walk(tree)
            if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
        ]
        for node in ast.walk(tree):
            if (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr == attr
            ):
                enclosing = [
                    name
                    for a, b, name in spans
                    if a <= node.lineno <= b
                ]
                sites.add(
                    (
                        str(path.relative_to(PKG_ROOT)),
                        enclosing[-1] if enclosing else "<module>",
                    )
                )
    return sites


def test_every_collect_site_is_allowlisted():
    extra = _call_sites("collect") - ALLOWED
    assert not extra, (
        "NEW driver-side .collect() site(s) — prove each is "
        f"dimension-bounded and allowlist it: {sorted(extra)}"
    )


def test_no_unaudited_topandas():
    extra = _call_sites("toPandas") - ALLOWED_TOPANDAS
    assert not extra, (
        "NEW driver-side .toPandas() site(s) — prove each is "
        f"dimension-bounded and allowlist it: {sorted(extra)}"
    )


def test_allowlist_has_no_stale_entries():
    live = _call_sites("collect")
    stale = ALLOWED - live
    assert not stale, f"allowlisted collect sites no longer exist: {sorted(stale)}"

"""Persisted IVF-PQ index: fit-once/load-many must be bit-identical to
the refit-per-query funnel, guard against stale configs, and never
re-train when a matching index exists."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_quickstart_iac_spark.operators.ann_index import (
    build_ivfpq_index,
    load_ivfpq_index,
    load_or_build_ivfpq_index,
    query_ivfpq_index,
)
from iceberg_quickstart_iac_spark.operators.similarity import (
    ivf_index,
    ivfpq_topk,
    pq_encode,
    pq_fit,
)

CONF = {"n_cells": 4, "m": 4, "n_codes": 8, "fit_sample": 200}


@pytest.fixture()
def corpus(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    rows = [(i, [float(x) for x in rng.normal(size=16)]) for i in range(200)]
    return spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")


def test_persisted_index_matches_refit_exactly(spark, corpus, tmp_path):
    root = tmp_path / "idx"
    t, centroids, books = load_or_build_ivfpq_index(spark, corpus, root, **CONF)
    # the stored model equals an in-process refit (deterministic fits)
    sample = [
        r["embedding"]
        for r in corpus.orderBy("vec_id").limit(CONF["fit_sample"]).collect()
    ]
    tagged, cent2 = ivf_index(
        corpus, n_cells=CONF["n_cells"], max_iter=8, seed=42,
        assign="fold", sample_vectors=sample,
    )
    books2 = pq_fit(
        corpus, m=CONF["m"], n_codes=CONF["n_codes"], max_iter=8, seed=7,
        sample_vectors=sample,
    )
    assert centroids == cent2
    assert books == books2
    # stored (cell, codes) equal the fold-encode recomputation
    enc2 = {
        r["vec_id"]: (r["cell"], list(r["codes"]))
        for r in pq_encode(tagged, books2, assign="fold")
        .select("vec_id", "cell", "codes").collect()
    }
    stored = {
        r["vec_id"]: (r["cell"], list(r["codes"]))
        for r in t.read(spark).collect()
    }
    assert stored == enc2
    # end to end: the search result over the persisted index equals the
    # refit funnel's
    queries = [(i, [float(x) for x in sample[i]]) for i in range(3)]
    via_index = query_ivfpq_index(spark, root, queries, k=5, nprobe=2).collect()
    direct = ivfpq_topk(
        pq_encode(tagged, books2, assign="fold"), cent2, books2, queries,
        k=5, nprobe=2,
    ).collect()
    assert sorted(map(tuple, via_index)) == sorted(map(tuple, direct))


def test_load_skips_training_and_conf_mismatch_rebuilds(spark, corpus, tmp_path):
    root = tmp_path / "idx"
    t1, *_ = load_or_build_ivfpq_index(spark, corpus, root, **CONF)
    built_at = t1.current_snapshot()["snapshot_id"]
    # second call LOADS: no new snapshot commit, same table
    t2, *_ = load_or_build_ivfpq_index(spark, corpus, root, **CONF)
    assert t2.current_snapshot()["snapshot_id"] == built_at
    # changed parameters must not silently serve the stale index
    with pytest.raises(ValueError, match="different parameters"):
        load_ivfpq_index(root, expect_conf={**_full_conf(), "n_cells": 8})


def _full_conf() -> dict:
    return {
        "n_cells": CONF["n_cells"], "m": CONF["m"], "n_codes": CONF["n_codes"],
        "ivf_max_iter": 8, "pq_max_iter": 8, "ivf_seed": 42, "pq_seed": 7,
        "fit_sample": CONF["fit_sample"], "order_col": "vec_id",
        "corpus_id": "vec_id", "corpus_vec": "embedding", "assign": "fold",
    }


def test_index_table_is_cell_partitioned(spark, corpus, tmp_path):
    """The 100 TB shape: identity partitioning by cell means a probe of c
    cells is a c-directory pruned scan, not a full-corpus filter."""
    root = tmp_path / "idx"
    t, *_ = load_or_build_ivfpq_index(spark, corpus, root, **CONF)
    cells = sorted(
        p.name for p in t.data_dir.iterdir() if p.is_dir()
    )
    [data_dir] = cells
    subdirs = sorted(p.name for p in (t.data_dir / data_dir).iterdir() if p.is_dir())
    assert subdirs and all(s.startswith("__p_cell=") for s in subdirs)
    pruned = t.read(spark, filters=[("cell", "=", 0)])
    assert all("__p_cell=0" in f for f in pruned.inputFiles())


def test_rebuild_guard_is_not_table_not_found(spark, corpus, tmp_path):
    from iceberg_quickstart_iac_spark.tables import SnapTable, TableNotFoundError

    plain = SnapTable.create(
        tmp_path / "plain",
        {"name": "p", "namespace": "x",
         "columns": [{"name": "k", "type": "long"}]},
    )
    plain.append(spark.createDataFrame([(1,)], "k LONG"))
    with pytest.raises(TableNotFoundError, match="not an ANN index"):
        load_ivfpq_index(plain.root)


def test_extend_index_appends_with_stored_model(spark, corpus, tmp_path):
    """FAISS add-after-train: new vectors are encoded with the PERSISTED
    quantizer/codebooks (no refit) and land as an append commit; the
    encoded rows are bit-identical to encoding them against the loaded
    model directly, and searches see old + new rows."""
    import numpy as np

    from iceberg_quickstart_iac_spark.operators.ann_index import (
        extend_ivfpq_index,
    )

    root = tmp_path / "idx"
    t, centroids, books = load_or_build_ivfpq_index(spark, corpus, root, **CONF)
    pre_rows = t.read(spark).count()
    pre_snap = t.current_snapshot()["snapshot_id"]

    rng = np.random.default_rng(99)
    new = spark.createDataFrame(
        [(1000 + i, [float(x) for x in rng.normal(size=16)]) for i in range(40)],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    out = extend_ivfpq_index(spark, root, new)
    assert out["row_count"] == pre_rows + 40
    t2, cent2, books2 = load_ivfpq_index(root)
    assert (cent2, books2) == (centroids, books)  # model untouched
    assert t2.current_snapshot()["parent_id"] == pre_snap  # one append commit
    stored_new = {
        r["vec_id"] for r in t2.read(spark).filter("vec_id >= 1000").collect()
    }
    assert stored_new == {1000 + i for i in range(40)}
    # a query vector equal to a NEW row finds it (self-hit) via the index
    qv = new.filter("vec_id = 1005").collect()[0]["embedding"]
    hits = query_ivfpq_index(spark, root, [(777, list(qv))], k=3, nprobe=CONF["n_cells"])
    assert 1005 in {r["vec_id"] for r in hits.collect()}


def test_probe_scan_is_partition_pruned(spark, corpus, tmp_path):
    """query_ivfpq_index pushes the probed cell set into the read as an
    IN filter: with nprobe=1 and one query, the scan's input files come
    from exactly one cell directory."""
    from iceberg_quickstart_iac_spark.operators.similarity import (
        route_queries_python,
    )

    root = tmp_path / "idx"
    _, centroids, _ = load_or_build_ivfpq_index(spark, corpus, root, **CONF)
    qv = corpus.filter("vec_id = 3").collect()[0]["embedding"]
    queries = [(3, [float(x) for x in qv])]
    [(_, cell)] = route_queries_python(centroids, queries, 1)
    out = query_ivfpq_index(spark, root, queries, k=5, nprobe=1)
    files = set(out.inputFiles())
    assert files and all(f"__p_cell={cell}" in f for f in files)
    # and the self-hit still comes back
    assert 3 in {r["vec_id"] for r in out.collect()}


def test_index_rerank_improves_recall_and_is_exact_on_self(spark, corpus, tmp_path):
    """query_ivfpq_index_rerank: ADC candidates from the compact index,
    exact distances from the raw corpus. Self-queries must rank
    themselves first with exact_d2 == 0, and recall@5 vs brute force
    must be at least as good as the raw ADC ranking's."""
    import numpy as np

    from iceberg_quickstart_iac_spark.operators.ann_index import (
        query_ivfpq_index_rerank,
    )

    root = tmp_path / "idx"
    load_or_build_ivfpq_index(spark, corpus, root, **CONF)
    rows = corpus.collect()
    queries = [(int(r["vec_id"]), [float(x) for x in r["embedding"]])
               for r in rows[:5]]
    out = query_ivfpq_index_rerank(
        spark, root, corpus, queries, k=5, nprobe=CONF["n_cells"], k_cand=30,
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, hits in by_q.items():
        hits.sort(key=lambda r: r["rank"])
        assert hits[0]["vec_id"] == qid  # exact self-hit first
        assert hits[0]["exact_d2"] == 0.0
    # recall@5 vs numpy brute force
    mat = np.array([r["embedding"] for r in rows])
    ids = np.array([r["vec_id"] for r in rows])
    hit = 0
    for qid, qv in queries:
        d2 = ((mat - np.array(qv)) ** 2).sum(1)
        truth = set(ids[np.argsort(d2)[:5]])
        got = {r["vec_id"] for r in by_q[qid]}
        hit += len(truth & got)
    assert hit / (5 * len(queries)) >= 0.8  # nprobe=all, k_cand=30: high recall


def test_adc_gemm_scorer_bit_identical_to_fold(spark, corpus, tmp_path):
    """The Arrow-batched gather-sum ADC scorer must produce EXACTLY the
    fold/SQL form's distances (same accumulation order; the leading
    0.0 + is exact) — full result-set equality including float bits."""
    from iceberg_quickstart_iac_spark.operators.similarity import (
        ivf_index, ivfpq_topk, pq_adc_topk, pq_encode, pq_fit,
    )

    sample = [r["embedding"] for r in corpus.orderBy("vec_id").limit(200).collect()]
    tagged, cent = ivf_index(corpus, n_cells=4, max_iter=8, seed=42,
                             assign="fold", sample_vectors=sample)
    books = pq_fit(corpus, m=4, n_codes=8, max_iter=8, seed=7,
                   sample_vectors=sample)
    enc = pq_encode(tagged, books, assign="fold").persist()
    try:
        queries = [(i, [float(x) for x in sample[i]]) for i in range(6)]
        for fn, kw in ((pq_adc_topk, {}), (ivfpq_topk, {"nprobe": 2})):
            args = (enc, books, queries) if fn is pq_adc_topk else (enc, cent, books, queries)
            fold = fn(*args, k=7, method="fold", **kw).collect()
            gemm = fn(*args, k=7, method="gemm", **kw).collect()
            assert sorted(map(tuple, fold)) == sorted(map(tuple, gemm))
    finally:
        enc.unpersist()


def test_build_at_mismatched_root_swaps_in_new_index(spark, corpus, tmp_path):
    """Changing ANN parameters at an existing root must REPLACE the stale
    index (the full train is not wasted, and the final load serves the
    requested quantizer) — not silently keep the old one and then error."""
    root = tmp_path / "idx"
    load_or_build_ivfpq_index(spark, corpus, root, **CONF)
    changed = {**CONF, "n_cells": CONF["n_cells"] + 1}
    t2, centroids2, _ = load_or_build_ivfpq_index(spark, corpus, root, **changed)
    assert len(centroids2) == changed["n_cells"]
    # and the persisted index at root now matches the NEW conf
    want = {**_full_conf(), "n_cells": changed["n_cells"]}
    t3, *_ = load_ivfpq_index(root, expect_conf=want)
    assert t3.current_snapshot()["snapshot_id"] == t2.current_snapshot()["snapshot_id"]


def test_query_with_no_queries_returns_typed_empty(spark, corpus, tmp_path):
    root = tmp_path / "idx"
    load_or_build_ivfpq_index(spark, corpus, root, **CONF)
    out = query_ivfpq_index(spark, root, [], k=5)
    assert out.count() == 0
    assert out.columns == ["query_id", "vec_id", "adc_d2", "rank"]

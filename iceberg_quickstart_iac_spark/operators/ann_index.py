"""Persisted IVF-PQ index: fit once, query many (SURVEY §2.13 X26 —
the production shape of the ANN funnel).

The catalog's composed funnel (:func:`~.similarity.ivfpq_topk`) is
certified by refitting the quantizer + codebooks inside the query so a
SQL oracle can replay the whole pipeline; a production engine at 100 TB
does neither per query. FAISS separates ``train``/``add`` from
``search``; Milvus/Vespa persist the trained index next to the data.
This module is that separation on the snapstore table format:

- :func:`build_ivfpq_index` — ONE sample collect, one IVF fit, one PQ
  fit, one distributed encode pass; the (vec_id, cell, codes) corpus
  lands in a SnapTable **partitioned by cell** (every probe can prune
  whole cell directories before a scan), and the trained model —
  centroids, codebooks, fit/encode configuration — rides in the table's
  own properties (table metadata IS the index metadata; snapshot commits
  version the index like any other table).
- :func:`load_ivfpq_index` — reopen the table, verify the stored
  configuration matches, deserialize the model. No fit, no encode.
- :func:`query_ivfpq_index` — route + ADC-score against the stored
  codes; cost is O(probed cells), independent of index build cost.

Reference parity: the reference materializes derived assets once and
serves queries from the materialized form (``docs/architecture.md``);
this is the same asset/query split for the ANN index. Determinism: the
fit is a seeded pure-numpy Lloyd's over an ``ORDER BY order_col LIMIT
fit_sample`` sample and the fold-encode is element-ordered SQL, so a
freshly built index is bit-identical to a refit with the same config —
which is what lets the certified catalog query serve from the persisted
index while its DuckDB oracle refits from the raw parquet.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iceberg_quickstart_iac_spark.operators.similarity import (
    ivf_index,
    ivfpq_topk,
    pq_encode,
    pq_fit,
)
from iceberg_quickstart_iac_spark.tables import SnapTable, TableNotFoundError

#: properties keys the trained model is stored under
_PROP_MODEL = "ann_ivfpq_model"
_PROP_CONF = "ann_ivfpq_conf"


def build_ivfpq_index(
    spark: SparkSession,
    corpus: DataFrame,
    root: str | Path,
    *,
    n_cells: int,
    m: int,
    n_codes: int,
    ivf_max_iter: int = 8,
    pq_max_iter: int = 8,
    ivf_seed: int = 42,
    pq_seed: int = 7,
    fit_sample: int = 100_000,
    order_col: str = "vec_id",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
    assign: str = "fold",
) -> SnapTable:
    """Train and materialize an IVF-PQ index table at ``root``.

    One deterministic sample collect feeds BOTH fits (the funnel's
    shared-sample contract); the corpus is then cell-tagged and
    PQ-encoded in one distributed pass and written partitioned by
    ``cell``. Build is atomic: everything lands in a temp directory that
    is renamed into place, so a crashed build never leaves a loadable
    half-index and a concurrent winner is kept, not clobbered.
    """
    root = Path(root)
    conf = {
        "n_cells": n_cells, "m": m, "n_codes": n_codes,
        "ivf_max_iter": ivf_max_iter, "pq_max_iter": pq_max_iter,
        "ivf_seed": ivf_seed, "pq_seed": pq_seed,
        "fit_sample": fit_sample, "order_col": order_col,
        "corpus_id": corpus_id, "corpus_vec": corpus_vec, "assign": assign,
    }
    sample = [
        r["__v"]
        for r in corpus.orderBy(order_col)
        .limit(fit_sample)
        .select(F.col(corpus_vec).alias("__v"))
        .collect()
    ]
    tagged, centroids = ivf_index(
        corpus, n_cells=n_cells, max_iter=ivf_max_iter, seed=ivf_seed,
        corpus_vec=corpus_vec, assign=assign, sample_vectors=sample,
    )
    books = pq_fit(
        corpus, m=m, n_codes=n_codes, max_iter=pq_max_iter, seed=pq_seed,
        corpus_vec=corpus_vec, sample_vectors=sample,
    )
    encoded = pq_encode(tagged, books, corpus_vec=corpus_vec, assign=assign)

    tmp = root.parent / f".build-{uuid.uuid4().hex}"
    t = SnapTable.create(
        tmp,
        {
            "name": root.name,
            "namespace": "ann",
            "columns": [
                {"name": corpus_id, "type": "long"},
                {"name": "cell", "type": "int"},
                {"name": "codes", "type": "list<int>"},
            ],
            # identity-partition by cell: a probe of c cells scans c dirs
            "partition_spec": [{"column": "cell", "transform": "identity"}],
            "sort_order": [{"column": corpus_id, "direction": "asc"}],
            "properties": {
                _PROP_MODEL: json.dumps(
                    {"centroids": centroids, "codebooks": books}
                ),
                _PROP_CONF: json.dumps(conf, sort_keys=True),
            },
        },
    )
    t.overwrite(encoded.select(corpus_id, "cell", "codes"))
    try:
        os.rename(tmp, root)
    except OSError:
        # Something already sits at root. Only a SAME-CONFIG concurrent
        # builder is a benign race (bit-identical index — keep the winner);
        # a different-config index must not be silently served from.
        try:
            existing = SnapTable.load(root)
            stored = json.loads(
                existing.meta.get("properties", {}).get(_PROP_CONF, "{}")
            )
        except Exception:
            stored = None
        if stored == json.loads(json.dumps(conf, sort_keys=True)):
            shutil.rmtree(tmp, ignore_errors=True)
        else:
            # stale/mismatched index: swap the fresh build into place
            # (move the old one aside first — rename over a non-empty dir
            # fails on POSIX), so a parameter change rebuilds rather than
            # wasting the train and then erroring at load time
            stale = root.parent / f".stale-{uuid.uuid4().hex}"
            try:
                os.rename(root, stale)
                os.rename(tmp, root)
                shutil.rmtree(stale, ignore_errors=True)
            except OSError:
                shutil.rmtree(tmp, ignore_errors=True)
                raise ValueError(
                    f"ANN index root {root} holds an index built with "
                    "different parameters and could not be replaced — "
                    "remove it or build at a fresh root"
                ) from None
    return SnapTable.load(root)


def load_ivfpq_index(
    root: str | Path, expect_conf: dict | None = None
) -> tuple[SnapTable, list[list[float]], list[list[list[float]]]]:
    """Reopen a persisted index: (table, centroids, codebooks).

    ``expect_conf`` (the kwargs :func:`build_ivfpq_index` was called
    with) guards against serving a stale index built under different
    parameters — a mismatch raises instead of silently answering from
    the wrong quantizer.
    """
    t = SnapTable.load(root)
    props = t.meta.get("properties", {})
    if _PROP_MODEL not in props:
        raise TableNotFoundError(f"{root} is not an ANN index table")
    if expect_conf is not None:
        stored = json.loads(props.get(_PROP_CONF, "{}"))
        want = json.loads(json.dumps(expect_conf, sort_keys=True))
        if stored != want:
            raise ValueError(
                f"ANN index at {root} was built with different parameters "
                f"(stored {stored} != requested {want}) — rebuild it"
            )
    model = json.loads(props[_PROP_MODEL])
    return t, model["centroids"], model["codebooks"]


#: query-count threshold at which the Arrow-batched gemm scorer beats the
#: codegen fold form: the fold plan grows with |queries| (each query's ADC
#: table is a literal in the expression) while gemm pays a fixed Arrow
#: batch-transfer cost per call — measured crossover sits well under 8
#: queries on local[32] (single query: fold ~0.7 s vs gemm ~1.2 s; at 50
#: queries gemm is ~7x faster; SCALE_SWEEP_r06 annserve)
_GEMM_MIN_QUERIES = 8


def query_ivfpq_index(
    spark: SparkSession,
    index: SnapTable | str | Path,
    queries: list[tuple],
    k: int = 10,
    nprobe: int = 6,
    corpus_id: str = "vec_id",
    method: str = "auto",
) -> DataFrame:
    """Search a persisted index: route each query to ``nprobe`` cells and
    ADC-score the stored codes — no fit, no encode, no raw vectors.

    The probed cell set is pushed into the table read as a
    ``("cell", "in", cells)`` filter: the index is identity-partitioned
    by cell, so the scan lists ONLY the probed cells' directories before
    Spark sees a file — at 100 TB the search touches nprobe/n_cells of
    the index, physically, not just logically (the in-query funnel can
    only filter after a full scan).

    ``method``: ``'auto'`` (default) picks the ADC scorer by query count —
    the codegen fold expression for small batches, the Arrow-batched gemm
    gather-sum for ≥ ``_GEMM_MIN_QUERIES`` (both bit-identical, pinned by
    test); ``'fold'``/``'gemm'`` force one."""
    from iceberg_quickstart_iac_spark.operators.similarity import (
        route_queries_python,
    )

    root = index.root if isinstance(index, SnapTable) else index
    t, centroids, books = load_ivfpq_index(root)
    if not queries:
        # zero queries -> zero rows, typed — the scorers cannot build an
        # expression over an empty ADC-table set
        return spark.createDataFrame(
            [], f"query_id LONG, {corpus_id} LONG, adc_d2 DOUBLE, rank LONG"
        )
    probed = sorted({c for _, c in route_queries_python(centroids, queries, nprobe)})
    encoded = t.read(spark, filters=[("cell", "in", probed)])
    if method == "auto":
        method = "gemm" if len(queries) >= _GEMM_MIN_QUERIES else "fold"
    return ivfpq_topk(
        encoded, centroids, books, queries,
        k=k, nprobe=nprobe, corpus_id=corpus_id, method=method,
    )


def query_ivfpq_index_rerank(
    spark: SparkSession,
    index: SnapTable | str | Path,
    corpus: DataFrame,
    queries: list[tuple],
    k: int = 10,
    nprobe: int = 6,
    k_cand: int = 50,
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> DataFrame:
    """The full production retrieval pipeline over a persisted index:
    route → ADC over stored codes in the probed cells (``k_cand``
    candidates per query) → EXACT re-rank against the raw vectors in
    ``corpus``. The index stays compact (codes only, by design — the 32×
    compression is the point); full-precision vectors are read from the
    source table only for the O(queries × k_cand) candidate set. Returns
    (query_id, corpus_id, exact_d2, rank)."""
    from iceberg_quickstart_iac_spark.operators.similarity import exact_rerank

    cand = query_ivfpq_index(
        spark, index, queries, k=k_cand, nprobe=nprobe, corpus_id=corpus_id
    ).select("query_id", corpus_id)
    return exact_rerank(
        cand, corpus, queries, k=k, corpus_id=corpus_id, corpus_vec=corpus_vec
    )


def extend_ivfpq_index(
    spark: SparkSession,
    root: str | Path,
    new_vectors: DataFrame,
) -> dict:
    """Incrementally ADD vectors to a persisted index — FAISS's
    ``add`` after ``train``: the stored quantizer/codebooks encode the
    new batch (cell tag + PQ codes, one distributed map-only pass) and
    the rows land as an append commit on the index table. O(batch), no
    refit, no touch of existing rows; searches see the union immediately.

    The standard IVF-PQ caveat applies and is deliberately inherited:
    the model is NOT refit, so if the new data's distribution drifts far
    from the training sample, recall degrades until a rebuild — drift
    monitoring belongs to the governance layer, rebuild is
    :func:`build_ivfpq_index` at a fresh root.
    """
    t, centroids, books = load_ivfpq_index(root)
    conf = json.loads(t.meta["properties"][_PROP_CONF])
    corpus_vec, corpus_id = conf["corpus_vec"], conf["corpus_id"]
    # encode with the STORED model: cell assignment against persisted
    # centroids, codes against persisted codebooks
    from iceberg_quickstart_iac_spark.operators.similarity import (
        nearest_cell_sql,
    )

    vn2 = F.aggregate(
        F.transform(F.col(corpus_vec), lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    tagged = (
        new_vectors.withColumn("__vn2", vn2)
        .withColumn(
            "cell",
            F.expr(nearest_cell_sql(f"`{corpus_vec}`", "__vn2", centroids)),
        )
        .drop("__vn2")
    )
    encoded = pq_encode(tagged, books, corpus_vec=corpus_vec, assign=conf["assign"])
    entry = t.append(encoded.select(corpus_id, "cell", "codes"))
    return {"appended_snapshot": entry["snapshot_id"], "row_count": entry["row_count"]}


def load_or_build_ivfpq_index(
    spark: SparkSession,
    corpus: DataFrame,
    root: str | Path,
    **conf,
) -> tuple[SnapTable, list[list[float]], list[list[list[float]]]]:
    """The query-side entry point: serve from the persisted index when
    one with matching parameters exists, otherwise build it once."""
    full = {
        "n_cells": conf["n_cells"], "m": conf["m"], "n_codes": conf["n_codes"],
        "ivf_max_iter": conf.get("ivf_max_iter", 8),
        "pq_max_iter": conf.get("pq_max_iter", 8),
        "ivf_seed": conf.get("ivf_seed", 42),
        "pq_seed": conf.get("pq_seed", 7),
        "fit_sample": conf.get("fit_sample", 100_000),
        "order_col": conf.get("order_col", "vec_id"),
        "corpus_id": conf.get("corpus_id", "vec_id"),
        "corpus_vec": conf.get("corpus_vec", "embedding"),
        "assign": conf.get("assign", "fold"),
    }
    try:
        return load_ivfpq_index(root, expect_conf=full)
    except (TableNotFoundError, ValueError):
        build_ivfpq_index(spark, corpus, root, **full)
        return load_ivfpq_index(root, expect_conf=full)

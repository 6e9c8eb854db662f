"""Lexical + hybrid retrieval over the document corpus (round 10;
SURVEY §2.13 extension X39): BM25 term-weighted search and
reciprocal-rank fusion with the embedding ANN stack — the retrieval
front end a training-data pipeline uses for targeted corpus slicing
(benchmark-adjacent document hunts, topic mining) and the classic
hybrid-search serving shape (Cormack et al.'s RRF over a lexical and a
vector ranker).

Scale design:

- The token explode is O(total tokens) and map-only, and it runs ONCE:
  document length and every per-term tf come out of a single
  pivot-style aggregation (the term list is the QUERY's — fixed and
  small), so the only corpus-sized shuffle keys on the doc id with
  map-side partials.
- Corpus constants (N, total tokens) and per-term document frequencies
  reduce the compact per-doc frame to ONE row, joined back as a
  broadcast scalar (the established bounded-crossJoin shape).
- Scoring stays in whole-stage codegen: a ``stack`` unpivot plus one
  arithmetic expression per (doc, matched term) row, no UDFs.

Cross-engine determinism (the oracle contract): every BM25 input is an
exact integer (tf, df, dl, N, total) far below 2^53, so int→double
conversion and each double * and / are correctly-rounded IEEE ops that
produce bit-identical values in Spark and DuckDB when the expression
text is the same. The idf uses the RATIO form
``(N - df + 0.5) / (df + 0.5)`` — the exponential of the classic
log-idf — precisely so the expression needs no transcendental function
(``ln`` is *not* guaranteed correctly rounded and may differ by 1 ulp
between JVM and libm). Per-document sums over the (few) query terms go
through the repo's exact-decimal sum policy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from iceberg_quickstart_iac_spark.operators.text import word_tokens

#: exact intermediate type for order-insensitive float sums (same policy
#: as plans/queries.py)
_DEC = "decimal(18,6)"

#: the per-(doc, term) BM25 score with k1=1.2, b=0.75 — kept as ONE
#: expression string so the Spark plan and the DuckDB oracle evaluate
#: byte-identical arithmetic (see module docstring). Placeholders:
#: tf/df/dl/n_docs/total_tokens column names.
BM25_TERM_EXPR = (
    "(((CAST(n_docs - df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))"
    " * (2.2 * CAST(tf AS DOUBLE)))"
    " / (CAST(tf AS DOUBLE) + 0.3"
    " + (0.9 * ((CAST(dl AS DOUBLE) * CAST(n_docs AS DOUBLE))"
    " / CAST(total_tokens AS DOUBLE))))"
)


def bm25_scores(
    docs: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 (k1=1.2, b=0.75, ratio-idf — module docstring) of every
    document that matches at least one query term.

    Returns ``(id, score DOUBLE, matched_terms BIGINT)`` — unordered;
    compose with :func:`top_k_ranks` for the ranked head.
    """
    if not terms:
        raise ValueError("bm25_scores: empty query term list")
    terms = list(terms)
    from iceberg_quickstart_iac_spark.operators.dedup import _spread

    # spread BEFORE the explode (r14, guide §2.3/§2.5): a one-file corpus
    # otherwise tokenizes on a single core, and the id-keyed repartition
    # moves |docs| rows where the post-explode groupBy would move |tokens|
    # rows — the per-doc aggregation then reuses the id partitioning with
    # no further exchange
    toks = _spread(docs, id_col).select(
        F.col(id_col), F.explode(word_tokens(F.col(text_col))).alias("tok")
    ).filter(F.col("tok") != "")
    # ONE pass over the exploded tokens: dl and every per-term tf come
    # out of a single pivot-style aggregation (the term list is the
    # QUERY's, fixed and small), so the scan + explode run once and the
    # only corpus-sized shuffle keys on the doc id with map-side
    # partials. Everything after operates on the compact per-doc frame.
    per_doc = toks.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("dl"),
        *[
            F.sum(F.when(F.col("tok") == t, 1).otherwise(0)).alias(f"tf_{i}")
            for i in range(len(terms))
            for t in [terms[i]]
        ],
    )
    # corpus constants + per-term document frequencies: one tiny agg of
    # the per-doc frame -> a single broadcast row
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_tokens"),
        *[
            F.sum(F.when(F.col(f"tf_{i}") > 0, 1).otherwise(0)).alias(
                f"df_{i}"
            )
            for i in range(len(terms))
        ],
    )
    stack_args = ", ".join(
        f"{i}, tf_{i}, df_{i}" for i in range(len(terms))
    )
    per_term = (
        per_doc.crossJoin(F.broadcast(stats))
        .select(
            id_col,
            "dl",
            "n_docs",
            "total_tokens",
            F.expr(
                f"stack({len(terms)}, {stack_args}) AS (term_idx, tf, df)"
            ),
        )
        .filter(F.col("tf") > 0)
        .withColumn("term_score", F.expr(BM25_TERM_EXPR))
    )
    return per_term.groupBy(id_col).agg(
        F.sum(F.col("term_score").cast(_DEC)).cast("double").alias("score"),
        F.count(F.lit(1)).alias("matched_terms"),
    )


def top_k_ranks(
    scored: DataFrame,
    k: int,
    id_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """Dense top-k of a scored frame: ``(id, score, rank)``, rank 1-based
    by (score DESC, id ASC) — the deterministic tie-break every ranked
    catalog query uses. Spark's rank-limit rewrite plans a PARTIAL
    WindowGroupLimit before the exchange (pinned by the cosine_topk plan
    test), so the full sort never materializes."""
    from pyspark.sql import Window as W

    w = W.orderBy(F.desc(score_col), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def rrf_fuse(
    lex_ranks: DataFrame,
    vec_ranks: DataFrame,
    id_col: str = "doc_id",
    k: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion of a lexical and a vector ranking:
    ``rrf = Σ_lists 1/(k + rank)``, a document absent from a list
    contributes 0 from it. Returns
    ``(id, rank_lex, rank_vec, rrf DOUBLE)`` — unordered.

    Each reciprocal is one IEEE double division of exact integers and
    the sum is two terms in fixed textual order, so the fused score is
    bit-identical across engines. The join is |list|-bounded (two top-k
    heads), never corpus-sized."""
    lex = lex_ranks.select(F.col(id_col), F.col("rank").alias("rank_lex"))
    vec = vec_ranks.select(F.col(id_col), F.col("rank").alias("rank_vec"))
    fused = lex.join(vec, id_col, "full_outer")
    contrib = (
        f"(CASE WHEN rank_lex IS NULL THEN 0.0"
        f" ELSE 1.0 / ({k}.0 + CAST(rank_lex AS DOUBLE)) END)"
        f" + (CASE WHEN rank_vec IS NULL THEN 0.0"
        f" ELSE 1.0 / ({k}.0 + CAST(rank_vec AS DOUBLE)) END)"
    )
    return fused.withColumn("rrf", F.expr(contrib))


def bm25_batch_scores(
    docs: DataFrame,
    query_terms: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_col: str = "query_id",
    term_col: str = "term",
) -> DataFrame:
    """BM25 for a BATCH of queries — the production serving shape: the
    queries arrive as a ``(query_id, term)`` TABLE, not literals, so one
    pass scores every query.

    Returns ``(query_id, id, score, matched_terms)`` — unordered; window
    per query for the ranked heads.

    Scale shape vs :func:`bm25_scores`: the fixed-term pivot is replaced
    by a broadcast equi-join of the exploded tokens against the term
    table (bounded by the BATCH's total term count — a serving batch,
    not the corpus), then per-(query, doc, term) tf is one
    partial-aggregated shuffle. Document length still comes from the
    single per-doc aggregation; df per term is ``countDistinct`` over
    the matched (doc, term) pairs — |terms|-bounded output, broadcast
    back. Same bit-exact arithmetic as :data:`BM25_TERM_EXPR`.
    """
    from iceberg_quickstart_iac_spark.operators.dedup import _spread

    # spread before the explode — same shape as :func:`bm25_scores` (r14):
    # `toks` is consumed twice (dl + tf), so a single-split scan would run
    # the tokenize serially TWICE; spread parallelizes both passes and the
    # per-doc dl aggregation reuses the id partitioning exchange-free
    toks = _spread(docs, id_col).select(
        F.col(id_col), F.explode(word_tokens(F.col(text_col))).alias("tok")
    ).filter(F.col("tok") != "")
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    corpus = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_tokens"),
    )
    terms = query_terms.select(
        F.col(query_col), F.col(term_col).alias("tok")
    ).distinct()
    # doc-term tf over the batch's term vocabulary (query-independent)
    vocab = terms.select("tok").distinct()
    tf = (
        toks.join(F.broadcast(vocab), "tok")
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("tok").agg(F.countDistinct(id_col).alias("df"))
    scored = (
        tf.join(F.broadcast(df_), "tok")
        .join(F.broadcast(terms), "tok")
        .join(dl, id_col)
        .crossJoin(F.broadcast(corpus))
        .withColumn("term_score", F.expr(BM25_TERM_EXPR))
    )
    return scored.groupBy(query_col, id_col).agg(
        F.sum(F.col("term_score").cast(_DEC)).cast("double").alias("score"),
        F.count(F.lit(1)).alias("matched_terms"),
    )

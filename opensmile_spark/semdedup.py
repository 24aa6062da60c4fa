"""Semantic deduplication (SemDeDup) over an embedding column.

Implements the cluster-then-prune semantic dedup of Abbas et al. 2023
("SemDeDup: Data-efficient learning at web-scale through semantic
deduplication", arXiv:2303.09540): embeddings are k-means clustered, and
within each cluster an example is pruned when its cosine similarity to
ANY higher-priority cluster member exceeds a threshold — the paper's
upper-triangular max over the per-cluster similarity matrix. Priority is
similarity-to-centroid DESC (ties by id), so the surviving exemplar of a
duplicate set is the one FARTHEST from the centroid — the variant the
paper found best for downstream model quality ("keeping examples with
low similarity to cluster centroids").

Relation to the neighbouring ops: `dedup.embedding_near_dups` finds
near-duplicate PAIRS via random-hyperplane LSH (recall-bounded);
`semdedup` makes per-document KEEP/PRUNE decisions and bounds the
quadratic work by the cluster partition instead of by hash collisions —
O(sum c_i^2) with c_i ~ n/k, the paper's operating point (they run
k = 11k clusters over 233M LAION embeddings, ~20k per cluster).

100 TB design: the k-means fit sees only a deterministic bounded sample
(~`sample_per_centroid` rows per centroid, hash-selected — one filter,
no shuffle); assignment is a map-only Arrow kernel against broadcast
centroids; the pairwise pass shuffles each row ONCE on its cell id and
runs blocked (block x d) @ (d x block) BLAS matmuls per cluster — the
Gram matrix is never materialized whole (peak memory O(block² + c_i·d),
block = SPARK_GRAFT_SEMDEDUP_BLOCK, default 8192), so a pathological
mega-cluster costs quadratic TIME but bounded MEMORY. Cluster size is
still the skew axis — pick n_clusters so n/k rows fit an executor
(20k x 64 doubles = 10 MB), and cap truly pathological cells with
`max_cluster_size` (rows beyond the cap, in priority order, are kept
without pruning and flagged — bounded work, conservative output).

The whole chain is deterministic for a fixed input table (no RNG, no
partitioning dependence): the fit sample is hash-selected and sorted,
Lloyd's iterations are plain numpy, and the prune rule is a strict
priority order — which is what lets the driver gate inject the SAME
centroids into a DuckDB twin and hash-compare end to end.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kmeans_fit_np(X, k: int, n_iter: int = 10):
    """Deterministic Lloyd's k-means on a (n, d) float64 array: init =
    first k rows (caller supplies a hash-shuffled, id-sorted sample, so
    this is a deterministic random init), empty clusters keep their old
    centroid, fixed iteration count (no tolerance early-exit — keeps the
    oracle twin bit-identical regardless of convergence noise)."""
    import numpy as np

    X = np.asarray(X, dtype=np.float64)
    n = X.shape[0]
    if n < k:
        raise ValueError(f"fit sample has {n} rows < k={k}")
    C = X[:k].copy()
    for _ in range(n_iter):
        # argmin ||x-c||^2 = argmin |c|^2 - 2 x.c  (BLAS form)
        d2 = (C * C).sum(axis=1)[None, :] - 2.0 * (X @ C.T)
        a = d2.argmin(axis=1)
        for j in range(k):
            m = a == j
            if m.any():
                C[j] = X[m].mean(axis=0)
    return C


def _fit_sample(docs: DataFrame, id_col: str, vec_col: str, k: int,
                sample_per_centroid: int):
    """Deterministic bounded fit sample: md5-hash-select ~2x the target
    (one map-only filter at scale), order by hash (a deterministic
    shuffle, so init centroids are not id-correlated), truncate. The
    md5 idiom matches the oracle side exactly."""
    import numpy as np

    target = sample_per_centroid * k
    n = docs.count()
    frac = min(1.0, (2.0 * target) / max(n, 1))
    h = F.conv(F.substring(F.md5(F.concat_ws(
        ":", F.lit("semfit"), F.col(id_col).cast("string"))), 1, 8), 16, 10) \
        .cast("bigint")
    cand = (docs.select(F.col(id_col).alias("__id"),
                        F.col(vec_col).alias("__v"), h.alias("__h"))
            .filter(F.col("__h") < int(frac * 2**32))
            .orderBy("__h", "__id").limit(target).collect())
    X = np.stack([np.asarray(r["__v"], dtype=np.float64) for r in cand])
    nrm = np.sqrt((X * X).sum(axis=1, keepdims=True))
    return X / np.maximum(nrm, 1e-12)


def semdedup(docs: DataFrame, threshold: float = 0.7, n_clusters: int = 8,
             id_col: str = "vec_id", vec_col: str = "embedding",
             n_iter: int = 10, sample_per_centroid: int = 200,
             centroids=None, max_cluster_size: int = 200_000) -> DataFrame:
    """Per-document semantic-dedup decision table.

    Returns one row per input doc: (id, cell, sim_centroid,
    max_prior_sim, keep) where `keep` is false iff some SAME-CLUSTER doc
    with higher priority (sim_centroid DESC, id ASC) has cosine
    similarity > threshold. Vectors are compared L2-normalized;
    assignment is argmin Euclidean distance to the (unnormalized-space
    irrelevant — fit already normalized) centroids, ties to the lowest
    cell id.

    `centroids`: optional (k, d) array to skip the fit (tests/oracle).
    """
    import numpy as np

    if centroids is None:
        X = _fit_sample(docs, id_col, vec_col, n_clusters,
                        sample_per_centroid)
        centroids = kmeans_fit_np(X, n_clusters, n_iter)
    C = np.asarray(centroids, dtype=np.float64)
    cnorm = np.sqrt((C * C).sum(axis=1))
    cc = (C * C).sum(axis=1)
    thr = float(threshold)
    id_ddl = docs.schema[id_col].dataType.simpleString()

    def assign(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            nrm = np.sqrt((V * V).sum(axis=1, keepdims=True))
            V = V / np.maximum(nrm, 1e-12)
            G = V @ C.T                              # (n, k)
            d2 = cc[None, :] - 2.0 * G               # argmin ||v-c||^2
            cell = d2.argmin(axis=1)                 # ties -> lowest cell
            sim = G[np.arange(len(V)), cell] / np.maximum(cnorm[cell], 1e-12)
            yield pd.DataFrame({
                "__id": pdf[id_col],
                "cell": cell.astype("int32"),
                "sim_centroid": sim,
                "__nv": list(V),
            })

    assigned = docs.select(id_col, vec_col).mapInPandas(
        assign,
        schema=(f"__id {id_ddl}, cell int, sim_centroid double, "
                "__nv array<double>"))

    def _max_prior_sim(V: "np.ndarray", block: int) -> "np.ndarray":
        """max cosine of each row to any STRICTLY higher-priority row
        (rows are already priority-sorted), computed in priority-order
        blocks: each chunk scores against all prior rows block-by-block
        plus its own strict upper triangle. Peak memory is O(block² +
        n·d) instead of the dense O(n²) Gram matrix — the r4-verdict
        fix for pathological clusters (a 200k-row cell would otherwise
        materialize a 320 GB Gram and OOM the executor; the quadratic
        FLOPs are inherent to the exact SemDedup variant, the memory
        is not)."""
        n = len(V)
        mps = np.full(n, -np.inf)
        for s in range(0, n, block):
            e = min(s + block, n)
            chunk = V[s:e]
            best = np.full(e - s, -np.inf)
            for ps in range(0, s, block):
                pe = min(ps + block, s)
                S = chunk @ V[ps:pe].T               # (chunk, prior-block)
                np.maximum(best, S.max(axis=1), out=best)
            G = chunk @ chunk.T
            G[np.tril_indices_from(G)] = -np.inf
            np.maximum(best, G.max(axis=0), out=best)
            mps[s:e] = best
        return mps

    block_rows = int(os.environ.get("SPARK_GRAFT_SEMDEDUP_BLOCK", "8192"))

    def prune(key, pdf):
        import pandas as pd

        pdf = pdf.sort_values(
            ["sim_centroid", "__id"], ascending=[False, True],
            kind="mergesort").reset_index(drop=True)
        head = pdf.iloc[:max_cluster_size]
        mps = np.full(len(pdf), -np.inf)
        if len(head):
            V = np.stack(head["__nv"].to_numpy())
            mps[:len(head)] = _max_prior_sim(V, block_rows)
        out = pd.DataFrame({
            "__id": pdf["__id"],
            "cell": pdf["cell"],
            "sim_centroid": pdf["sim_centroid"],
            "max_prior_sim": mps,
            "keep": ~(mps > thr),
            "capped": np.arange(len(pdf)) >= max_cluster_size,
        })
        out.loc[out["capped"], "max_prior_sim"] = -np.inf
        out.loc[out["capped"], "keep"] = True
        return out

    pruned = assigned.groupBy("cell").applyInPandas(
        prune,
        schema=(f"__id {id_ddl}, cell int, sim_centroid double, "
                "max_prior_sim double, keep boolean, capped boolean"))
    return pruned.select(
        F.col("__id").alias(id_col), "cell", "sim_centroid",
        F.when(F.col("max_prior_sim") == float("-inf"), F.lit(None))
        .otherwise(F.col("max_prior_sim")).alias("max_prior_sim"),
        "keep", "capped")

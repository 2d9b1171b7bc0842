"""Similarity search over embedding columns (array<float>).

Two paths, per the scale plan:
  - brute-force top-k cosine: broadcast the (small) query set against the
    corpus; exact, the correctness baseline. Cosine is JVM-side
    ``zip_with``/``aggregate`` (functions/vector.py), rank via window.
  - IVF-style bucketed search: corpus pre-partitioned by coarse centroid
    assignment; queries probe only their nearest ``nprobe`` buckets —
    the 100 TB path (touches 1/nlist of the corpus per query).

This generalizes the reference's only similarity operator — the OCO-2
nearest-centroid association (ref processors/OCO2Processor.py:400-435) —
from 2-D points to d-dim embeddings.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import vector


def brute_force_knn(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kernel: str = "arrow",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query (excluding self).
    Returns (query_id, neighbor_id, rank, cos).

    ``kernel='arrow'`` (default): the query matrix is a Spark broadcast
    variable; each corpus partition computes ONE numpy matmul against it
    inside ``mapInPandas`` and emits only its local top-k per query — the
    final per-query window ranks |partitions|·|Q|·k tiny rows. Local top-k
    uses the same (cos desc, id asc) order as the global window, so rows a
    partition drops can never reach the global top-k. The corpus is never
    shuffled; per-task work is one (batch × d) · (d × |Q|) BLAS product —
    ~100× the throughput of per-pair interpreted expression folds.

    ``kernel='sql'``: the pure-relational form (broadcast nested-loop join
    + higher-order-function dot products) — same results, kept as the
    no-Arrow fallback and as the differential-testing reference."""
    if kernel == "sql":
        return _brute_force_knn_sql(corpus, queries, k, id_col, vec_col)
    import numpy as np
    import pandas as pd

    qp = queries.select(id_col, vec_col).toPandas()  # small by contract
    if qp.empty:
        return _brute_force_knn_sql(corpus, queries, k, id_col, vec_col)
    q_ids = qp[id_col].to_numpy()
    Q = np.stack(qp[vec_col].to_numpy()).astype(np.float64)
    q_norm = np.linalg.norm(Q, axis=1)
    b = corpus.sparkSession.sparkContext.broadcast((q_ids, Q, q_norm))
    out_schema = (
        f"query_id {queries.schema[id_col].dataType.simpleString()}, "
        f"neighbor_id {corpus.schema[id_col].dataType.simpleString()}, "
        "cos double"
    )

    def local_topk(batches, _k=k, _id=id_col, _vec=vec_col):
        q_ids, Q, q_norm = b.value
        for pdf in batches:
            if not len(pdf):
                continue
            C = np.stack(pdf[_vec].to_numpy()).astype(np.float64)
            cid = pdf[_id].to_numpy()
            c_norm = np.linalg.norm(C, axis=1)
            S = (C @ Q.T) / np.outer(c_norm, q_norm)
            for j, qid in enumerate(q_ids):
                mask = cid != qid
                ids, cs = cid[mask], S[mask, j]
                if not ids.size:
                    continue
                order = np.lexsort((ids, -cs))[: min(_k, ids.size)]
                yield pd.DataFrame(
                    {"query_id": qid, "neighbor_id": ids[order], "cos": cs[order]}
                )

    local = corpus.select(id_col, vec_col).mapInPandas(local_topk, out_schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def _batch_cosine():
    """Arrow-batched cosine of two array<float> columns (built per call so
    each query plan owns its UDF instance)."""

    @F.pandas_udf("double")
    def cos(a: pd.Series, b: pd.Series) -> pd.Series:
        A = np.stack(a.to_numpy()).astype(np.float64)
        B = np.stack(b.to_numpy()).astype(np.float64)
        return pd.Series(
            (A * B).sum(axis=1)
            / (np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1))
        )

    return cos


def _brute_force_knn_sql(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    # norms are precomputed per VECTOR (not per pair): the dot/norm folds are
    # higher-order expressions evaluated outside codegen, so computing each
    # row's norm once instead of |Q| (resp. |corpus|) times cuts 2/3 of the
    # per-pair arithmetic; identical doubles (same fold, same order).
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
        ).withColumn("q_norm", vector.norm(F.col("q_vec")))
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    ).withColumn("c_norm", vector.norm(F.col("c_vec")))
    scored = (
        c.crossJoin(q)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cos",
            vector.dot(F.col("q_vec"), F.col("c_vec"))
            / (F.col("q_norm") * F.col("c_norm")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def cosine_neardup_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = None,
    kernel: str = "arrow",
) -> DataFrame:
    """Embedding near-duplicate pairs: cosine >= threshold, id_a < id_b.
    With ``block_col`` (e.g. an LSH bucket or IVF cell) the self-join is
    blocked — the scale path; without it, exact all-pairs (test scale).

    ``kernel='arrow'`` (default, blocked path only): each block's pair
    search is one query-chunked numpy Gram product in ``applyInPandas``
    emitting only the above-threshold pairs — the same BLAS-vs-
    interpreted-folds win as :func:`mutual_knn` (a fixed block count
    makes the relational pair join corpus-quadratic in FOLD work even
    though the plan shape is bounded). ``kernel='sql'`` (and the
    unblocked path) keeps the fold-order relational form, bit-aligned
    with the DuckDB oracle and used as the differential reference."""
    if block_col and kernel == "arrow":
        import numpy as np
        import pandas as pd

        id_t = df.schema[id_col].dataType.simpleString()
        out_schema = f"id_a {id_t}, id_b {id_t}, cos double"
        thr = float(threshold)

        def block_pairs(_key, pdf):
            n = len(pdf)
            if n < 2:
                return pd.DataFrame({"id_a": [], "id_b": [], "cos": []})
            ids = pdf["__id"].to_numpy()
            order = np.argsort(ids, kind="mergesort")
            ids = ids[order]
            M = np.stack(pdf["__vec"].to_numpy())[order].astype(np.float64)
            norm = np.linalg.norm(M, axis=1)
            # zero-norm guard: cosine is undefined there — the relational
            # form yields NULL and the filter drops it; mask to match
            ok = norm > 0.0
            safe = np.where(ok, norm, 1.0)
            frames = []
            chunk = max(1, min(n, 4_000_000 // n))
            for lo in range(0, n, chunk):
                hi = min(lo + chunk, n)
                S = (M[lo:hi] @ M.T) / np.outer(safe[lo:hi], safe)
                for r in range(hi - lo):
                    i = lo + r
                    cs = S[r, i + 1 :]  # ids sorted: emit id_a < id_b once
                    hit = np.nonzero((cs >= thr) & ok[i + 1 :] & ok[i])[0]
                    if hit.size:
                        frames.append(
                            pd.DataFrame(
                                {
                                    "id_a": ids[i],
                                    "id_b": ids[i + 1 + hit],
                                    "cos": cs[hit],
                                }
                            )
                        )
            if not frames:
                return pd.DataFrame({"id_a": [], "id_b": [], "cos": []})
            return pd.concat(frames, ignore_index=True)

        sub = df.select(
            F.col(id_col).alias("__id"),
            F.col(vec_col).alias("__vec"),
            F.col(block_col).alias("__blk"),
        ).filter(F.col("__blk").isNotNull())  # equi-join NULL semantics: match sql kernel/oracle
        return sub.groupBy("__blk").applyInPandas(block_pairs, out_schema)
    cols = [F.col(id_col).alias("id"), F.col(vec_col).alias("vec")]
    if block_col:
        cols.append(F.col(block_col).alias("blk"))
    base = df.select(*cols).withColumn("nrm", vector.norm(F.col("vec")))
    a, b = base.alias("a"), base.alias("b")
    cond = F.col("a.id") < F.col("b.id")
    if block_col:
        cond = cond & (F.col("a.blk") == F.col("b.blk"))
    return (
        a.join(b, cond)
        .withColumn(
            "cos",
            # try_divide: a zero-norm vector has undefined cosine -> NULL,
            # which the threshold filter drops (ANSI mode would raise)
            F.try_divide(
                vector.dot(F.col("a.vec"), F.col("b.vec")),
                F.col("a.nrm") * F.col("b.nrm"),
            ),
        )
        .filter(F.col("cos") >= threshold)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), "cos")
    )


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cent_id: str = "cell",
    cent_vec: str = "centroid",
    kernel: str = "arrow",
    drop_vec: bool = False,
) -> DataFrame:
    """Assign each corpus vector to its nearest centroid cell (broadcast
    centroids + per-vector argmax) — the IVF build step. Centroids typically
    come from a sampled k-means (or, as in the oracle tests, label means).

    ``drop_vec=True`` omits ``vec_col`` from the output: callers that only
    need the (id, cell) membership (e.g. IVF-PQ, which never touches raw
    corpus vectors again) skip serializing the vector back across the
    Arrow boundary — guide §4: pass only the columns the function needs,
    in BOTH directions.

    ``kernel='arrow'`` (default): the centroid bank (sorted by cell id) is a
    Spark broadcast variable; each corpus partition computes one numpy
    matmul + row argmax inside ``mapInPandas`` and emits its rows with the
    cell attached — a pure per-partition projection, ZERO shuffle (the
    relational form below shuffles once for its aggregate). ``np.argmax``
    returns the first maximum, which on the ascending-sorted bank is the
    lowest cell id — the same tiebreak as the relational form.

    ``kernel='sql'``: the argmax is a groupBy ``max(struct(cos, -cell,
    ...))`` rather than a rank-1 window: the aggregate combines map-side, so
    the shuffle carries one row per vector instead of nlist rows per vector
    — the difference between shuffling 1× and nlist× the corpus at 100 TB.
    Ties break to the lowest cell id (struct field 2), identical to the
    window form. Falls back to the window when the cell id is a non-numeric
    type (no negation for the tiebreak)."""
    if kernel == "arrow":
        import numpy as np
        import pandas as pd

        cp = (
            centroids.select(cent_id, cent_vec)
            .toPandas()
            .sort_values(cent_id, kind="mergesort")  # argmax tiebreak = lowest cell
        )
        if cp.empty:
            raise ValueError("ivf_assign: empty centroid table")
        cells = cp[cent_id].to_numpy()
        B = np.stack(cp[cent_vec].to_numpy()).astype(np.float64)
        b_norm = np.linalg.norm(B, axis=1)
        bank = corpus.sparkSession.sparkContext.broadcast((cells, B, b_norm))
        out_fields = [
            f
            for f in corpus.schema.fields
            if not (drop_vec and f.name == vec_col)
        ]
        out_schema = ", ".join(
            [f"{f.name} {f.dataType.simpleString()}" for f in out_fields]
            + [f"{cent_id} {centroids.schema[cent_id].dataType.simpleString()}"]
        )

        def assign(batches, _vec=vec_col, _cell=cent_id, _drop=drop_vec):
            cells, B, b_norm = bank.value
            for pdf in batches:
                if not len(pdf):
                    continue
                V = np.stack(pdf[_vec].to_numpy()).astype(np.float64)
                v_norm = np.linalg.norm(V, axis=1)
                S = (V @ B.T) / np.outer(v_norm, b_norm)
                out = pdf.drop(columns=[_vec]) if _drop else pdf.copy()
                out[_cell] = cells[np.argmax(S, axis=1)]
                yield out

        return corpus.mapInPandas(assign, out_schema)
    cents = F.broadcast(
        centroids.select(F.col(cent_id), F.col(cent_vec)).withColumn(
            "__cn", vector.norm(F.col(cent_vec))
        )
    )
    scored = (
        corpus.withColumn("__vn", vector.norm(F.col(vec_col)))
        .crossJoin(cents)
        .withColumn(
            "__cos",
            vector.dot(F.col(vec_col), F.col(cent_vec))
            / (F.col("__vn") * F.col("__cn")),
        )
    )
    carry = [
        c
        for c in corpus.columns
        if c != id_col and not (drop_vec and c == vec_col)
    ]
    numeric = dict(centroids.dtypes).get(cent_id) in (
        "tinyint", "smallint", "int", "bigint", "float", "double",
    )
    if numeric:
        best = scored.groupBy(id_col).agg(
            F.max(
                F.struct(
                    F.col("__cos").alias("__c"),
                    (-F.col(cent_id)).alias("__nc"),
                    F.col(cent_id).alias("__cell"),
                    *[F.col(c).alias(c) for c in carry],
                )
            ).alias("__best")
        )
        return best.select(
            F.col(id_col),
            *[F.col(f"__best.{c}").alias(c) for c in carry],
            F.col("__best.__cell").alias(cent_id),
        )
    w = Window.partitionBy(id_col).orderBy(F.desc("__cos"), F.asc(cent_id))
    drops = ["__rk", "__cos", "__vn", "__cn", cent_vec]
    if drop_vec:
        drops.append(vec_col)
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .drop(*drops)
    )


def probe_cells(
    queries: DataFrame,
    centroids: DataFrame,
    nprobe: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cent_id: str = "cell",
    cent_vec: str = "centroid",
) -> DataFrame:
    """Route each query to its ``nprobe`` nearest cells by cosine:
    ``(query_id, q_vec, q_norm, cell)``, nprobe rows per query.

    A pure projection, not a window: the (small by construction) centroid
    bank folds into ONE broadcast array row, and each query picks its
    top-``nprobe`` cells with ``slice(array_sort(transform(bank, ...)))``
    — no crossJoin row explosion, no shuffle, no sort of |Q|*nlist rows.
    Ties break (cos desc, cell asc) via the struct sort on (-cos, cell).
    Shared by ivf_knn and ivfpq_knn.
    """
    bank = F.broadcast(
        centroids.select(
            F.struct(
                F.col(cent_id).alias("cell"),
                F.col(cent_vec).alias("cv"),
                vector.norm(F.col(cent_vec)).alias("cn"),
            ).alias("__c")
        ).agg(F.collect_list("__c").alias("__bank"))
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    ).withColumn("q_norm", vector.norm(F.col("q_vec")))
    return (
        q.crossJoin(bank)
        .withColumn(
            "__scored",
            F.transform(
                "__bank",
                lambda c: F.struct(
                    (
                        -(
                            vector.dot(F.col("q_vec"), c["cv"])
                            / (F.col("q_norm") * c["cn"])
                        )
                    ).alias("negcos"),
                    c["cell"].alias("cell"),
                ),
            ),
        )
        .select(
            "query_id",
            "q_vec",
            "q_norm",
            F.explode(
                F.slice(F.array_sort("__scored"), 1, nprobe)["cell"]
            ).alias(cent_id),
        )
    )


def ivf_knn(
    assigned_corpus: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cent_id: str = "cell",
    cent_vec: str = "centroid",
) -> DataFrame:
    """IVF search: route each query to its ``nprobe`` nearest cells, then
    exact top-k within those cells only. Returns (query_id, neighbor_id,
    rank, cos). At 100 TB the cell equi-join key makes this a partitioned
    hash join touching nprobe/nlist of the corpus.

    Probe routing is a pure projection, not a window: the (small by
    construction) centroid bank is folded into ONE broadcast array row, and
    each query picks its top-``nprobe`` cells with
    ``slice(array_sort(transform(bank, ...)))`` — no crossJoin row
    explosion, no shuffle, no sort of |Q|·nlist rows. Ordering matches the
    old rank window exactly: cos desc, cell asc tiebreak (struct sort on
    (-cos, cell))."""
    probes = probe_cells(
        queries, centroids, nprobe, id_col, vec_col, cent_id, cent_vec
    )
    c = assigned_corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"), F.col(cent_id)
    )
    # candidate scoring is Arrow-batched (one numpy matrix op per batch of
    # joined rows) — the per-pair HOF fold is interpreted and dominates the
    # probe join's cost once candidates ≫ queries
    scored = (
        probes.join(c, cent_id)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", _batch_cosine()(F.col("q_vec"), F.col("c_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def kmeans_centroids(
    corpus: DataFrame,
    k: int,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_fraction: float | None = None,
    seed: int = 13,
) -> DataFrame:
    """IVF build step: spherical k-means over (a sample of) the corpus,
    returning a (cell, centroid) DataFrame ready for :func:`ivf_assign` /
    :func:`ivf_knn`.

    Scale shape — no shuffle of the corpus at all:
      - assignment + per-cell partial sums run inside ``mapInPandas``
        (Arrow-batched numpy: normalize, one matmul against the broadcast
        centroid bank, ``np.add.at`` scatter) emitting k rows per partition;
      - the driver reduces k×partitions tiny rows into new centroids.
    Lloyd iterations are driver-coordinated like the reference's tools use
    driver loops, but each pass is one corpus scan. ``sample_fraction``
    bounds build cost on a 100 TB corpus (IVF quality needs only a sample).
    Empty cells keep their previous centroid. Init is deterministic: the k
    vectors with the smallest ids.
    """
    import numpy as np
    import pandas as pd

    base = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    if sample_fraction:
        base = base.sample(fraction=sample_fraction, seed=seed)
    init = base.orderBy("id").limit(k).select("vec").collect()
    if len(init) < k:
        raise ValueError(f"corpus has fewer than k={k} vectors")
    cents = np.array([r.vec for r in init], dtype=np.float64)
    dim = cents.shape[1]
    vecs = base.select("vec")

    for _ in range(iters):
        bank = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)

        def partials(batches, _bank=bank):
            sums = np.zeros((k, dim))
            counts = np.zeros(k, dtype=np.int64)
            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.stack(pdf["vec"].to_numpy()).astype(np.float64)
                Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
                assign = np.argmax(Xn @ _bank.T, axis=1)  # first-index ties
                np.add.at(sums, assign, X)
                np.add.at(counts, assign, 1)
            yield pd.DataFrame(
                {"cell": range(k), "s": list(sums), "n": counts}
            )

        agg = vecs.mapInPandas(
            partials, schema="cell int, s array<double>, n long"
        ).toPandas()
        sums = np.zeros((k, dim))
        counts = np.zeros(k, dtype=np.int64)
        for _, row in agg.iterrows():
            sums[row["cell"]] += np.asarray(row["s"])
            counts[row["cell"]] += row["n"]
        nonempty = counts > 0
        cents[nonempty] = sums[nonempty] / counts[nonempty, None]

    spark = corpus.sparkSession
    return spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(cents)],
        "cell int, centroid array<double>",
    )


# ---------------------------------------------------------------------------
# Signed-random-projection (hyperplane) LSH — the embedding-space analog of
# MinHash banding: bucket key = sign bits of projections onto a fixed
# hyperplane bank; near-identical vectors agree on whole bit-bands.
# ---------------------------------------------------------------------------

def srp_hyperplanes(n_bits: int, dim: int, seed: int = 7) -> list[list[float]]:
    """Deterministic hyperplane bank (committed seed; 6-dp literals so the
    SQL oracle embeds the exact same doubles)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return [[round(float(x), 6) for x in row] for row in rng.normal(size=(n_bits, dim))]


def srp_band_rows(
    df: DataFrame,
    hyperplanes: list[list[float]],
    bands: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, band, bucket) rows: bucket = the band's sign-bit string."""
    n_bits = len(hyperplanes)
    per = n_bits // bands
    bits = [
        F.when(
            vector.dot(F.col(vec_col), F.array(*[F.lit(x) for x in h])) >= 0, "1"
        ).otherwise("0")
        for h in hyperplanes
    ]
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat(*bits[b * per : (b + 1) * per]).alias("bucket"),
        )
        for b in range(bands)
    ]
    return df.select(
        F.col(id_col).alias("id"), F.explode(F.array(*band_structs)).alias("bb")
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def srp_lsh_pairs(
    df: DataFrame,
    threshold: float,
    n_bits: int = 16,
    bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    kernel: str = "arrow",
) -> DataFrame:
    """LSH-bucketed cosine near-dup: candidates share >= 1 sign-bit band,
    then exact cosine verify. Deterministic end-to-end (fixed hyperplane
    bank), so the candidate set — and therefore the result — is
    oracle-reproducible. At corpus scale the pair work is blocked on
    (band, bucket): each vector meets only its 2^{-bits/band}-fraction
    bucket peers instead of the whole corpus.

    ``kernel='arrow'`` (default, r10): each bucket's pair search is a
    chunked numpy Gram product inside ``applyInPandas`` used as a
    CONSERVATIVE pre-filter (``cos_np >= threshold - 1e-6``; the numpy
    vs expression-fold summation discrepancy on 64-dim doubles is
    ~1e-13, so no qualifying pair can be lost), and the surviving
    candidates are re-scored with the same sequential expression-fold
    cosine as before — the RESULT is bit-identical to the relational
    form, including the 6-dp cos values the oracle hash-checks. The
    pre-r10 bucket self-join expanded 51.5M pair rows at the sf1
    fixture (16 buckets/band at these parameters) and fed every one
    through an interpreted 64-dim fold: 80 s; the Gram kernel does the
    same arithmetic as blocked matmuls (~6 Gflop) and only
    near-threshold pairs reach the fold. Chunked row-blocks bound task
    memory on skewed buckets.

    ``kernel='sql'``: the original relational bucket self-join —
    differential check (``test_srp_kernels_identical``)."""
    hp = srp_hyperplanes(n_bits, dim)
    vecs = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("vec")
    ).withColumn("nrm", vector.norm(F.col("vec")))
    if kernel == "arrow":
        import numpy as np
        import pandas as pd

        id_t = df.schema[id_col].dataType.simpleString()
        margin = float(threshold) - 1e-6

        def bucket_prefilter(pdf: pd.DataFrame) -> pd.DataFrame:
            ids = pdf["id"].to_numpy()
            V = np.stack(pdf["vec"].to_numpy()).astype(np.float64)
            nrm = np.linalg.norm(V, axis=1)
            nz = nrm == 0.0
            if nz.any():
                nrm = np.where(nz, 1.0, nrm)
            U = V / nrm[:, None]
            k = len(U)
            out_a, out_b = [], []
            # row-block chunking bounds the Gram block at ~chunk*k floats
            chunk = max(1, min(k, 4_194_304 // max(k, 1) + 1))
            for s in range(0, k, chunk):
                e = min(s + chunk, k)
                G = U[s:e] @ U.T  # (e-s, k)
                ii, jj = np.nonzero(G >= margin)
                gi = ii + s
                keep = jj > gi  # upper triangle: each unordered pair once
                gi, jj = gi[keep], jj[keep]
                a, b = ids[gi], ids[jj]
                lo = np.minimum(a, b)
                hi = np.maximum(a, b)
                out_a.append(lo)
                out_b.append(hi)
            if out_a:
                return pd.DataFrame(
                    {"id_a": np.concatenate(out_a), "id_b": np.concatenate(out_b)}
                )
            return pd.DataFrame({"id_a": ids[:0], "id_b": ids[:0]})

        # band rows carry the vector through the explode — no join back
        # to the vector table, no id-keyed exchange; the 16 sign-bit dots
        # stay the EXACT expression folds (a numpy sign could flip a
        # boundary bucket vs the oracle's sequential fold)
        per = n_bits // bands
        bits = [
            F.when(
                vector.dot(F.col(vec_col), F.array(*[F.lit(x) for x in h]))
                >= 0,
                "1",
            ).otherwise("0")
            for h in hp
        ]
        band_structs = [
            F.struct(
                F.lit(b).alias("band"),
                F.concat(*bits[b * per : (b + 1) * per]).alias("bucket"),
            )
            for b in range(bands)
        ]
        banded_v = df.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("vec"),
            F.explode(F.array(*band_structs)).alias("bb"),
        ).select("id", "vec", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
        cands = (
            banded_v.groupBy("band", "bucket")
            .applyInPandas(bucket_prefilter, f"id_a {id_t}, id_b {id_t}")
            .dropDuplicates(["id_a", "id_b"])
        )
    else:
        banded = srp_band_rows(df, hp, bands, id_col, vec_col)
        cands = (
            banded.alias("a")
            .join(
                banded.alias("b"),
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a.id") < F.col("b.id")),
            )
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .distinct()
        )
    out = (
        cands.join(
            vecs.select(F.col("id").alias("id_a"), F.col("vec").alias("va"),
                        F.col("nrm").alias("na")), "id_a")
        .join(
            vecs.select(F.col("id").alias("id_b"), F.col("vec").alias("vb"),
                        F.col("nrm").alias("nb")), "id_b")
        .withColumn("cos", vector.dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")))
        .filter(F.col("cos") >= threshold)
    )
    return out.select("id_a", "id_b", "cos")

def semantic_dedup(
    corpus: DataFrame,
    centroids: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kernel: str = "arrow",
) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023): assign every
    vector to its k-means cell, find within-cell cosine near-duplicates,
    and drop every vector with a smaller-id neighbor above ``threshold``
    (keep-first policy). Returns the per-cell prune profile
    ``(cell, n_vectors, n_dropped, n_kept)``.

    Scale shape: the O(n²) cosine search is confined to cells — pair work
    is Σ|cell|² instead of corpus², and nlist grows with the corpus so
    cells stay bounded (SemDeDup's own prescription).

    ``kernel='arrow'`` (default): each cell's pair search is ONE numpy
    Gram-matrix product inside ``applyInPandas`` — exactly the original
    SemDeDup computation, ~50× faster than expression-tree cosine per pair
    (measured at the 10× fixture: 2500-vector cells → 25M pair cosines).
    The groupBy(cell) shuffle moves each vector once; a cell's |cell|²
    float64 Gram block must fit a task (bounded by nlist sizing; chunk the
    matmul row-wise if a cell ever outgrows memory).

    ``kernel='sql'``: relational form — cell equi-join + fold-order cosine
    (AQE skew-splits a hot cell). Bit-aligned with the DuckDB oracle's
    ``list_dot_product`` and kept as the differential check.
    """
    flags = semantic_dedup_flags(
        corpus, centroids, threshold, id_col=id_col, vec_col=vec_col, kernel=kernel
    )
    return (
        flags.groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.sum(F.col("dropped").cast("long")).alias("n_dropped"),
        )
        .withColumn("n_kept", F.col("n_vectors") - F.col("n_dropped"))
    )


def semantic_dedup_flags(
    corpus: DataFrame,
    centroids: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kernel: str = "arrow",
) -> DataFrame:
    """Per-vector semantic-dedup decision: ``(id, cell, dropped)`` — the
    pruned corpus a pipeline actually feeds downstream is
    ``flags.filter(~dropped)`` joined back to the payload. Same kernels as
    :func:`semantic_dedup` (which aggregates these flags into its
    per-cell profile)."""
    assigned = ivf_assign(
        corpus.select(id_col, vec_col), centroids, id_col=id_col, vec_col=vec_col
    )
    if kernel == "arrow":
        import numpy as np
        import pandas as pd

        def prune(pdf: "pd.DataFrame") -> "pd.DataFrame":
            ids = pdf[id_col].to_numpy()
            order = np.argsort(ids, kind="mergesort")
            ids = ids[order]
            X = np.stack(pdf[vec_col].to_numpy())[order].astype(np.float64)
            # zero-norm clamp: a zero vector otherwise yields NaN cosine
            # (NaN >= threshold is False — under-drops silently)
            nr = np.maximum(np.linalg.norm(X, axis=1), 1e-12)
            g = (X @ X.T) / np.outer(nr, nr)
            # ids ascending => upper triangle (i<j) is exactly id_i < id_j;
            # a column j with any above-threshold entry has a smaller-id
            # near-neighbor -> dropped
            hit = np.triu(g >= threshold, k=1)
            return pd.DataFrame(
                {
                    id_col: ids,
                    "cell": pdf["cell"].iloc[0],
                    "dropped": hit.any(axis=0),
                }
            )

        return assigned.groupBy("cell").applyInPandas(
            prune, f"{id_col} long, cell int, dropped boolean"
        )

    pairs = cosine_neardup_pairs(
        assigned, threshold, id_col=id_col, vec_col=vec_col, block_col="cell"
    )
    dropped = (
        pairs.select(F.col("id_b").alias(id_col))
        .distinct()
        .select(id_col, F.lit(True).alias("__dropped"))
    )
    return assigned.join(dropped, id_col, "left").select(
        id_col, "cell", F.coalesce("__dropped", F.lit(False)).alias("dropped")
    )

def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    kernel: str = "arrow",
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query, the
    top-k most-similar corpus vectors with a DIFFERENT label (the
    "confusable but wrong" examples a retrieval/embedding model learns
    most from). Returns (query_id, neighbor_id, rank, cos).

    ``kernel='arrow'``: brute_force_knn's broadcast-matmul shape with the
    same-label pairs masked to -inf BEFORE the local top-k, so the
    exclusion is exact (a post-filter on an unmasked top-k would be
    unsound — all k nearest could share the query's label). Corpus never
    shuffles; the final window ranks |partitions|*|Q|*k rows.

    ``kernel='sql'``: broadcast nested-loop join with the label-mismatch
    predicate in the join condition — the differential reference.
    """
    if kernel == "sql":
        base = corpus.select(
            F.col(id_col).alias("nid"),
            F.col(vec_col).alias("nvec"),
            F.col(label_col).alias("nlabel"),
        )
        q = queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qvec"),
            F.col(label_col).alias("qlabel"),
        )
        scored = (
            base.join(F.broadcast(q), F.col("nlabel") != F.col("qlabel"))
            .withColumn(
                "cos",
                vector.dot(F.col("qvec"), F.col("nvec"))
                / (vector.norm(F.col("qvec")) * vector.norm(F.col("nvec"))),
            )
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cos").desc(), F.col("nid")
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", F.col("nid").alias("neighbor_id"), "rank", "cos")
        )

    import numpy as np
    import pandas as pd

    qp = queries.select(id_col, vec_col, label_col).toPandas()
    if qp.empty:
        return hard_negatives(
            corpus, queries, k, id_col, vec_col, label_col, kernel="sql"
        )
    q_ids = qp[id_col].to_numpy()
    Q = np.stack(qp[vec_col].to_numpy()).astype(np.float64)
    # zero-norm clamp: NaN cosine sorts ABOVE every real value in Spark's
    # descending order, so an unguarded zero vector would rank as the #1
    # hard negative for every query
    q_norm = np.maximum(np.linalg.norm(Q, axis=1), 1e-12)
    q_labels = qp[label_col].to_numpy()
    b = corpus.sparkSession.sparkContext.broadcast((q_ids, Q, q_norm, q_labels))
    out_schema = (
        f"query_id {queries.schema[id_col].dataType.simpleString()}, "
        f"neighbor_id {corpus.schema[id_col].dataType.simpleString()}, "
        "cos double"
    )

    def local_topk(batches, _k=k):
        q_ids, Q, q_norm, q_labels = b.value
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy()
            labels = pdf[label_col].to_numpy()
            C = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            c_norm = np.maximum(np.linalg.norm(C, axis=1), 1e-12)
            S = (C @ Q.T) / np.outer(c_norm, q_norm)  # |batch| x |Q|
            for j, qid in enumerate(q_ids):
                mask = labels != q_labels[j]  # the exact exclusion, pre-top-k
                nids, cs = ids[mask], S[mask, j]
                if not nids.size:
                    continue
                order = np.lexsort((nids, -cs))[: min(_k, nids.size)]
                yield pd.DataFrame(
                    {"query_id": qid, "neighbor_id": nids[order], "cos": cs[order]}
                )

    scored = corpus.select(id_col, vec_col, label_col).mapInPandas(
        local_topk, schema=out_schema
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


# ---------------------------------------------------------------------------
# Product quantization (Jegou et al. 2011): compress each d-dim vector into
# m sub-codes (argmin codeword per subspace) so 100 TB of embeddings fits
# memory-resident (64 float32 dims -> 8 bytes at m=8), and serve KNN from
# the codes via asymmetric distance (ADC) lookup tables. This is the
# compression layer under Faiss-style IVFPQ; IVF (above) handles routing,
# PQ handles residence.
# ---------------------------------------------------------------------------

def pq_codebooks(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    dsub: int = 8,
    n_codes: int = 16,
    salt: str = "pq-seed",
) -> DataFrame:
    """Deterministic PQ codebooks: ``(subspace, code, codeword)``.

    Codewords are the subspace slices of the ``n_codes`` hash-ranked sample
    vectors (same committed-hash sampling as every sampler here, so the
    DuckDB oracle derives the identical books). A production build would
    k-means each subspace (exactly :func:`kmeans_centroids` per slice —
    one extra Lloyd loop, same plan shape); the seeded variant keeps the
    encode/search path fully declarative and oracle-checkable.

    Plan: TakeOrdered(n_codes) on the hash — the corpus never shuffles.
    The n_codes survivors come to the driver (control-plane collect, 16
    rows — the same motion as the k-means init) and return as a local
    relation, so consumers that reference the books several times (encode
    + LUT + routing in one IVF-PQ plan) don't re-evaluate the sampling
    subtree; float32 -> float64 slice conversion is exact, so the rows are
    bit-identical to the oracle CTE's.
    """
    from ..functions import hashing

    h = hashing.portable_hash64(
        F.concat(F.col("__id").cast("string"), F.lit(":" + salt))
    )
    seeds = (
        corpus.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
        .withColumn("__h", h)
        .orderBy("__h", "__id")
        .limit(n_codes)
        .collect()
    )
    rows = [
        (s, code, [float(x) for x in r["__v"][s * dsub : (s + 1) * dsub]])
        for code, r in enumerate(seeds)
        for s in range(m)
    ]
    return corpus.sparkSession.createDataFrame(
        rows, "subspace int, code int, codeword array<double>"
    )


def pq_encode(
    corpus: DataFrame,
    codebooks: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dsub: int = 8,
    kernel: str = "arrow",
    layout: str = "long",
) -> DataFrame:
    """Encode every vector: ``(id, subspace, code, dist)`` with ``dist``
    the squared-L2 quantization error of the chosen codeword.

    ``kernel='arrow'`` (default): codebooks ride as a Spark broadcast
    variable; each Arrow batch computes all subspace argmins with numpy
    broadcasting in ONE task — encode is row-local, so the plan has ZERO
    corpus exchanges (the m rows per vector are emitted directly). The
    production path: at 100 TB encoding is a map-only scan.

    ``kernel='sql'``: the pure-relational form — codebook broadcast cross
    join, argmin via ``min(struct(dist, code))`` (a MAP-SIDE-combining
    aggregate, not a rank window), one exchange on (id, subspace). Ties
    break to the smallest code in both engines (lexicographic struct
    compare); this is the DuckDB-oracle-checkable reference the arrow
    kernel is differentially tested against
    (tests/test_sketch.py::test_pq_encode_kernels_agree).

    ``layout='array'`` (arrow kernel only): ONE row per vector —
    ``(id, codes array<int>)`` with ``codes[s]`` the subspace-``s`` code.
    This is the serving layout ADC wants (r10): the per-vector fold over
    subspaces becomes row-local array indexing, so a downstream ADC scan
    needs NO per-(query, vector) aggregate at all — m times fewer rows
    than the long layout, and the quantization-error column (which ADC
    never reads) is not produced.
    """
    if kernel == "sql":
        if layout != "long":
            raise ValueError("layout='array' requires kernel='arrow'")
        # pre-explode each vector into its dsub-dim subspace slices ONCE,
        # then an equi-join on subspace meets only that subspace's k
        # codewords (r10): the k-way expansion rows carry an 8-dim slice
        # instead of the full vector, and the slice expression runs once
        # per (vec, subspace) instead of once per (vec, subspace, code).
        # dist doubles are identical (same slice values, same fold).
        nsub = (F.size(F.col(vec_col)) / F.lit(dsub)).cast("int")
        slices = F.transform(
            F.sequence(F.lit(0), nsub - F.lit(1)),
            lambda s: F.slice(F.col(vec_col), s * dsub + 1, dsub),
        )
        sub_rows = corpus.select(
            id_col, F.posexplode(slices).alias("subspace", "__sub")
        )
        dist = vector.l2sq(F.col("__sub"), F.col("codeword"))
        return (
            sub_rows.join(F.broadcast(codebooks), "subspace")
            .select(id_col, "subspace", "code", dist.alias("dist"))
            .groupBy(id_col, "subspace")
            .agg(F.min(F.struct("dist", "code")).alias("m"))
            .select(
                id_col,
                "subspace",
                F.col("m.code").alias("code"),
                F.col("m.dist").alias("dist"),
            )
        )

    bp = codebooks.orderBy("subspace", "code").toPandas()  # m*n_codes rows
    banks = {
        int(s): np.stack(g.sort_values("code")["codeword"].to_numpy())
        for s, g in bp.groupby("subspace")
    }
    b = corpus.sparkSession.sparkContext.broadcast(banks)
    id_type = corpus.schema[id_col].dataType.simpleString()

    if layout == "array":
        def enc_arr(batches, _id=id_col, _vec=vec_col, _d=dsub):
            _banks = b.value
            subs = sorted(_banks)
            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.stack(pdf[_vec].to_numpy()).astype(np.float64)
                cols = np.empty((len(pdf), len(subs)), dtype=np.int32)
                for j, s in enumerate(subs):
                    Xs = X[:, s * _d : (s + 1) * _d]
                    C = _banks[s]
                    d2 = ((Xs[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
                    cols[:, j] = np.argmin(d2, axis=1)
                yield pd.DataFrame(
                    {_id: pdf[_id].to_numpy(), "codes": list(cols)}
                )

        return corpus.select(id_col, vec_col).mapInPandas(
            enc_arr, f"{id_col} {id_type}, codes array<int>"
        )

    out_schema = f"{id_col} {id_type}, subspace int, code int, dist double"

    def enc(batches, _id=id_col, _vec=vec_col, _d=dsub):
        _banks = b.value
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[_vec].to_numpy()).astype(np.float64)
            ids = pdf[_id].to_numpy()
            for s, C in _banks.items():
                Xs = X[:, s * _d : (s + 1) * _d]
                # (n, k) squared distances; clamp tiny negative fp residue
                # so a seed's self-match stays exactly 0.0 like the fold
                d2 = ((Xs[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
                code = np.argmin(d2, axis=1)  # first min = smallest code
                yield pd.DataFrame(
                    {
                        _id: ids,
                        "subspace": s,
                        "code": code.astype("int32"),
                        "dist": np.maximum(d2[np.arange(len(ids)), code], 0.0),
                    }
                )

    return corpus.select(id_col, vec_col).mapInPandas(enc, out_schema)


def pq_adc_knn(
    codes: DataFrame,
    codebooks: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dsub: int = 8,
    n_codes: int = 16,
) -> DataFrame:
    """Asymmetric-distance top-k from PQ codes: the query stays exact, the
    corpus is its codes. Approx dist(q, x) = sum_s ||q_s - codeword(x_s)||².

    ``codes`` may be the long layout ``(id, subspace, code)`` or the
    array layout ``(id, codes)`` from ``pq_encode(layout='array')``
    (detected by column name). Array layout is the serving shape (r10):
    the per-query distance table collapses to ONE broadcast array of
    m * n_codes doubles (ordered by (subspace, code) — ``n_codes`` must
    match the books), and adist is a row-local fold over the code array
    in ascending-subspace order — so the corpus never enters a
    per-(query, vector) aggregate at all; the long layout pays that
    aggregate on m rows per (query, vector) pair. Both fold in subspace
    order, so adist is bit-identical between layouts and cross-engine —
    a plain SUM would add in partition order and flip equal-distance
    ranks. Top-k is one rank window per query (WindowGroupLimit prunes
    to k per partition before the exchange), never a global sort.
    """
    qsub = F.slice(
        F.col(vec_col), F.col("subspace") * dsub + 1, F.lit(dsub)
    )
    lut = (
        queries.select(F.col(id_col).alias("query_id"), vec_col)
        .crossJoin(F.broadcast(codebooks))
        .select(
            "query_id",
            "subspace",
            "code",
            vector.l2sq(qsub, F.col("codeword")).alias("d"),
        )
    )
    if "codes" in codes.columns:
        # (subspace, code) is unique per query, so the lexicographic
        # array_sort orders the collected structs exactly by
        # subspace * n_codes + code — element_at below inverts that.
        lut_arr = lut.groupBy("query_id").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("subspace", "code", "d"))),
                lambda x: x["d"],
            ).alias("__lut")
        )
        adist = F.aggregate(
            F.sequence(F.lit(1), F.size("codes")),
            F.lit(0.0),
            lambda acc, s: acc
            + F.element_at(
                F.col("__lut"),
                ((s - 1) * n_codes + F.element_at(F.col("codes"), s) + 1).cast(
                    "int"
                ),
            ),
        )
        folded = (
            codes.crossJoin(F.broadcast(lut_arr))
            .filter(F.col(id_col) != F.col("query_id"))
            .select("query_id", id_col, adist.alias("adist"))
        )
    else:
        folded = (
            codes.join(F.broadcast(lut), ["subspace", "code"])
            .filter(F.col(id_col) != F.col("query_id"))
            .groupBy("query_id", id_col)
            .agg(
                F.aggregate(
                    F.array_sort(F.collect_list(F.struct("subspace", "d"))),
                    F.lit(0.0),
                    lambda acc, x: acc + x["d"],
                ).alias("adist")
            )
        )
    w = Window.partitionBy("query_id").orderBy("adist", id_col)
    return (
        folded.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col(id_col).alias("neighbor_id"), "rank", "adist")
    )


def ivfpq_knn(
    codes: DataFrame,
    assigned: DataFrame,
    codebooks: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    k: int,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dsub: int = 8,
) -> DataFrame:
    """IVF-PQ search — the Faiss serving composition: coarse IVF routing
    picks ``nprobe`` cells per query, then asymmetric PQ distance ranks
    only the CODES of vectors in those cells. Returns
    ``(query_id, neighbor_id, rank, adist)``.

    The 100 TB shape multiplies both savings: the cell equi-join touches
    nprobe/nlist of the corpus, and what it touches is 8-byte codes, not
    float vectors (32x less IO) — queries never see a raw corpus vector at
    all. Routing is the shared broadcast-bank projection
    (:func:`probe_cells`, zero shuffle); the per-query lookup table
    broadcasts; the subspace fold sums in sorted order for cross-engine
    bit-identical totals (same discipline as :func:`pq_adc_knn`).
    """
    probes = probe_cells(
        queries, centroids, nprobe, id_col, vec_col
    ).select("query_id", "cell")
    cands = (
        probes.join(assigned.select(id_col, "cell"), "cell")
        .filter(F.col(id_col) != F.col("query_id"))
        .select("query_id", id_col)
    )
    qsub = F.slice(
        F.col(vec_col), F.col("subspace") * dsub + 1, F.lit(dsub)
    )
    lut = (
        queries.select(F.col(id_col).alias("query_id"), vec_col)
        .crossJoin(F.broadcast(codebooks))
        .select(
            "query_id",
            "subspace",
            "code",
            vector.l2sq(qsub, F.col("codeword")).alias("d"),
        )
    )
    folded = (
        codes.join(cands, id_col)
        .join(F.broadcast(lut), ["query_id", "subspace", "code"])
        .groupBy("query_id", id_col)
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("subspace", "d"))),
                F.lit(0.0),
                lambda acc, x: acc + x["d"],
            ).alias("adist")
        )
    )
    w = Window.partitionBy("query_id").orderBy("adist", id_col)
    return (
        folded.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col(id_col).alias("neighbor_id"), "rank", "adist")
    )


def pq_codebooks_kmeans(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    dsub: int = 8,
    n_codes: int = 16,
    iters: int = 1,
    salt: str = "pq-seed",
) -> DataFrame:
    """Per-subspace Lloyd (L2 k-means) refinement of the PQ codebooks —
    the production training path :func:`pq_codebooks` documents: init from
    the hash-ranked sample books, then each iteration assigns every
    vector's subspace slice to its nearest codeword and recomputes each
    codeword as its cell's mean. ``iters=0`` returns the sampled books
    unchanged.

    Scale shape mirrors :func:`kmeans_centroids`: the corpus NEVER
    shuffles. All ``m`` subspaces train in one ``mapInPandas`` pass per
    iteration (broadcast codeword banks; per-batch numpy argmin + scatter
    sums), emitting m x n_codes partial rows per partition; the driver
    reduces those into the new books (control-plane, m*n_codes rows).
    Empty cells keep their previous codeword; ties break to the smallest
    code (np.argmin first index — matching the relational
    min(struct(dist, code)) form, so an unrolled SQL oracle replays the
    identical rounds).
    """
    import numpy as np
    import pandas as pd

    init = pq_codebooks(corpus, id_col, vec_col, m, dsub, n_codes, salt)
    bp = init.orderBy("subspace", "code").toPandas()
    books = {
        int(s): np.stack(g.sort_values("code")["codeword"].to_numpy())
        for s, g in bp.groupby("subspace")
    }
    sc = corpus.sparkSession.sparkContext
    vecs = corpus.select(F.col(vec_col).alias("vec"))

    for _ in range(iters):
        b = sc.broadcast(books)

        def partials(batches, _d=dsub, _m=m, _k=n_codes):
            _books = b.value
            sums = {s: np.zeros((_k, _d)) for s in range(_m)}
            counts = {s: np.zeros(_k, dtype=np.int64) for s in range(_m)}
            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.stack(pdf["vec"].to_numpy()).astype(np.float64)
                for s in range(_m):
                    Xs = X[:, s * _d : (s + 1) * _d]
                    C = _books[s]
                    d2 = ((Xs[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
                    assign = np.argmin(d2, axis=1)  # first-index ties
                    np.add.at(sums[s], assign, Xs)
                    np.add.at(counts[s], assign, 1)
            yield pd.DataFrame(
                {
                    "subspace": [s for s in range(_m) for _ in range(_k)],
                    "code": [c for _ in range(_m) for c in range(_k)],
                    "s": [sums[s][c] for s in range(_m) for c in range(_k)],
                    "n": [counts[s][c] for s in range(_m) for c in range(_k)],
                }
            )

        agg = vecs.mapInPandas(
            partials, schema="subspace int, code int, s array<double>, n long"
        ).toPandas()
        new_books = {s: books[s].copy() for s in range(m)}
        sums = {s: np.zeros((n_codes, dsub)) for s in range(m)}
        counts = {s: np.zeros(n_codes, dtype=np.int64) for s in range(m)}
        for _, row in agg.iterrows():
            sums[int(row["subspace"])][int(row["code"])] += np.asarray(row["s"])
            counts[int(row["subspace"])][int(row["code"])] += int(row["n"])
        for s in range(m):
            nonempty = counts[s] > 0
            new_books[s][nonempty] = (
                sums[s][nonempty] / counts[s][nonempty, None]
            )
        books = new_books

    rows = [
        (s, c, [float(x) for x in books[s][c]])
        for s in range(m)
        for c in range(n_codes)
    ]
    return corpus.sparkSession.createDataFrame(
        rows, "subspace int, code int, codeword array<double>"
    )


def mutual_knn(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    block_col: str,
    k: int = 10,
    kernel: str = "arrow",
    query_splits: int | str = "auto",
) -> DataFrame:
    """Block-scoped mutual-kNN graph: an undirected edge (a, b) exists iff
    b is in a's top-k cosine neighbors AND a is in b's — the symmetric
    neighborhood graph that graph-based semantic dedup / agglomerative
    clustering pipelines build before community detection (mutuality is
    the classic noise filter: hubs collect thousands of one-way inbound
    neighbors but reciprocate only genuine ones).

    Returns ``(id_a, id_b, rank_ab, rank_ba, cos)`` with ``id_a < id_b``.

    Scale shape: candidates are generated ONLY within ``block_col`` (an
    IVF cell / cluster id / LSH bucket — nlist grows with the corpus so
    |block| stays bounded, the q87 contract), so pair work is Σ|block|²,
    never |corpus|². ``kernel='arrow'`` (default): each block's top-k is
    ONE chunked numpy matmul inside ``applyInPandas`` — the Gram rows
    stream in query-chunks (bounded memory) and only |block|·k rows
    leave the task. Measured: the relational pair join spends 188 s at
    the 10× fixture (two 25k-vector blocks → 625M interpreted expression
    folds) where the kernel's BLAS product is ~100× cheaper — the same
    q34 lesson. ``kernel='sql'`` keeps the pure-relational form (the
    no-Arrow fallback and differential-testing reference; per-query
    top-k as a rank-1 window with WindowGroupLimit pushdown).
    Mutualization is one self-equi-join of the (already k-bounded) kNN
    table on the reversed key — |corpus|·k rows a side.

    ``query_splits``: parallelism floor for the arrow kernel when the
    block COUNT is below the cluster width (measured: the 2-block 100×
    fixture ran its 4-TFLOP Gram stage as 2 tasks, 30 cores idle). Each
    block's QUERY rows are hash-split into S sub-groups and its corpus
    rows replicated to all S — every query still scores against the
    full block, so results are bit-identical; the price is an S× vector
    shuffle (vectors are d doubles — cheap) for an S× compute fan-out.
    ``"auto"`` probes the block count (one control-plane aggregate) and
    sets S = ceil(parallelism / n_blocks), skipping both the probe and
    the salt column entirely when blocks already cover the cluster.
    """
    sub = vectors.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__vec"),
        F.col(block_col).alias("__blk"),
    ).filter(
        # NULL block ids never match an equi-join; drop them up front so
        # the arrow groupBy kernel shares the sql kernel's / oracle's
        # NULL semantics instead of forming a spurious NULL-block group
        F.col("__blk").isNotNull()
    )
    if kernel == "sql":
        a, b = sub.alias("a"), sub.alias("b")
        scored = a.join(
            b,
            (F.col("a.__blk") == F.col("b.__blk"))
            & (F.col("a.__id") != F.col("b.__id")),
        ).select(
            F.col("a.__id").alias("qid"),
            F.col("b.__id").alias("nid"),
            vector.cosine(F.col("a.__vec"), F.col("b.__vec")).alias("cos"),
        )
        w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("nid"))
        knn = (
            scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select("qid", "nid", "rnk", "cos")
        )
    else:
        import numpy as np
        import pandas as pd

        id_t = vectors.schema[id_col].dataType.simpleString()
        out_schema = f"qid {id_t}, nid {id_t}, rnk int, cos double"

        _k = k

        def _topk_frames(q_ids, Q, q_norm, c_ids, C, c_norm):
            frames = []
            n = len(c_ids)
            chunk = max(1, min(len(q_ids), 4_000_000 // max(n, 1)))
            for lo in range(0, len(q_ids), chunk):
                hi = min(lo + chunk, len(q_ids))
                # dot-then-divide, the q34 kernel's float shape (closest
                # to the SQL fold's dot/(sqrt·sqrt)); memory is
                # chunk×|block| doubles, never |block|²
                S = (Q[lo:hi] @ C.T) / np.outer(q_norm[lo:hi], c_norm)
                for r in range(hi - lo):
                    row = S[r]
                    mask = c_ids != q_ids[lo + r]  # exclude self by ID
                    nid, cs = c_ids[mask], row[mask]
                    if not nid.size:
                        continue
                    # same total order as the window: cos desc, id asc
                    order = np.lexsort((nid, -cs))[: min(_k, nid.size)]
                    frames.append(
                        pd.DataFrame(
                            {
                                "qid": q_ids[lo + r],
                                "nid": nid[order],
                                "rnk": np.arange(1, order.size + 1),
                                "cos": cs[order],
                            }
                        )
                    )
            return frames

        _empty = {"qid": [], "nid": [], "rnk": [], "cos": []}

        def block_topk(_key, pdf):
            if len(pdf) < 2:
                return pd.DataFrame(_empty)
            ids = pdf["__id"].to_numpy()
            M = np.stack(pdf["__vec"].to_numpy()).astype(np.float64)
            norm = np.linalg.norm(M, axis=1)
            frames = _topk_frames(ids, M, norm, ids, M, norm)
            if not frames:
                return pd.DataFrame(_empty)
            return pd.concat(frames, ignore_index=True)

        def split_topk(_key, pdf):
            isq = pdf["__isq"].to_numpy()
            if (~isq).sum() < 2 or not isq.any():
                return pd.DataFrame(_empty)
            c_pdf, q_pdf = pdf[~isq], pdf[isq]
            c_ids = c_pdf["__id"].to_numpy()
            C = np.stack(c_pdf["__vec"].to_numpy()).astype(np.float64)
            c_norm = np.linalg.norm(C, axis=1)
            q_ids = q_pdf["__id"].to_numpy()
            Q = np.stack(q_pdf["__vec"].to_numpy()).astype(np.float64)
            q_norm = np.linalg.norm(Q, axis=1)
            frames = _topk_frames(q_ids, Q, q_norm, c_ids, C, c_norm)
            if not frames:
                return pd.DataFrame(_empty)
            return pd.concat(frames, ignore_index=True)

        splits = query_splits
        if splits == "auto":
            # control-plane probe: with fewer blocks than cores, the
            # quadratic Gram stage would run that many tasks wide
            n_blocks = sub.select("__blk").distinct().count()
            par = sub.sparkSession.sparkContext.defaultParallelism
            splits = max(1, -(-par // max(n_blocks, 1)))
        splits = min(int(splits), 64)  # bound the corpus replication
        if splits <= 1:
            knn = sub.groupBy("__blk").applyInPandas(block_topk, out_schema)
        else:
            q_side = sub.select(
                "*",
                F.pmod(F.xxhash64("__id"), F.lit(splits))
                .cast("int")
                .alias("__salt"),
                F.lit(True).alias("__isq"),
            )
            c_side = sub.select(
                "*",
                F.explode(
                    F.array(*[F.lit(i) for i in range(splits)])
                ).alias("__salt"),
                F.lit(False).alias("__isq"),
            )
            knn = (
                q_side.unionByName(c_side)
                .groupBy("__blk", "__salt")
                .applyInPandas(split_topk, out_schema)
            )
    x, y = knn.alias("x"), knn.alias("y")
    return (
        x.join(
            y,
            (F.col("x.qid") == F.col("y.nid"))
            & (F.col("x.nid") == F.col("y.qid"))
            & (F.col("x.qid") < F.col("x.nid")),
        )
        .select(
            F.col("x.qid").alias("id_a"),
            F.col("x.nid").alias("id_b"),
            F.col("x.rnk").alias("rank_ab"),
            F.col("y.rnk").alias("rank_ba"),
            F.col("x.cos").alias("cos"),
        )
    )

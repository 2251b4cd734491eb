"""Similarity search over an embedding column (array<float>).

Brute-force cosine top-k is the exact baseline; the sign-LSH bucketed
variants are the scale path (bucket first, search within buckets —
turns the O(N·Q) score matrix into per-bucket joins), and IVF probing
is the trained-quantizer analog. Round 2 ships the full search path:
``lsh_bucketed_topk`` / ``ivf_probed_topk`` actually answer queries
with the routing tables the round-1 operators only computed
(VERDICT #3), and ``embedding_near_dups`` routes through multi-table
LSH instead of the exact all-pairs cartesian (VERDICT #7).

Scale notes:
- the query set is small by construction (vec_id % ANN_QUERY_EVERY == 0)
  → broadcast it; the candidate side streams, so scoring never
  shuffles the big side;
- multi-table sign-LSH (OR-amplification): a pair is a candidate if it
  shares a bucket in ANY of ANN_LSH_TABLES tables of
  ANN_LSH_PLANES_PER_TABLE hyperplanes — recall for true near-dups
  rises as 1-(1-p^planes)^tables while per-table buckets stay coarse.
  At 10^12 vectors, scale planes_per_table ~ log2(N / target_bucket)
  and keep tables fixed; the constants here are fixture-tier.
- bucket pair fan-out is OOM-safe: window-count cap before any
  collect_list (shared _bucket_pairs helper);
- norms are precomputed once per vector;
- dot products run as JVM higher-order functions (zip_with +
  aggregate), not Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.textsql import ANN_QUERY_EVERY, ANN_TOP_K
from .dedup import _bucket_pairs

# Multi-table LSH configuration (shared with the DuckDB oracle twins).
ANN_LSH_TABLES = 8
ANN_LSH_PLANES_PER_TABLE = 4
# multi-probe: per table, queries also probe the bucket with their
# lowest-|projection| bit flipped — the cheapest neighbor cell, since a
# small margin means the hyperplane nearly grazed the query. Lifts
# recall at FIXED table count (candidate set ~2x, table count and
# bucket granularity unchanged). 0 or 1; the DuckDB twin mirrors it.
ANN_MULTIPROBE = 1
EMB_MAX_BUCKET = 4096  # cap never binds at fixture scale; guards 10^12
EMB_DIMS = 64  # the testdata embeddings width — callers that know their
# corpus (the driver contract, the oracle twins) pass it to skip the
# width probe; operators themselves default to probing (n_dims=None)
IVF_PROBES = 4


def _probe_dims(df) -> int:
    """Actual embedding width, 0 for an empty/null-headed frame (a
    None-subscript here used to crash the driver on empty corpora)."""
    row = df.filter(F.col("e").isNotNull()).select(F.size("e").alias("n")).first()
    return int(row["n"]) if row is not None and row["n"] is not None else 0


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _with_norm(embeddings: DataFrame) -> DataFrame:
    e = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return embeddings.select(
        "vec_id", e.alias("e")
    ).withColumn("nrm", F.sqrt(_dot(F.col("e"), F.col("e"))))


def cosine_topk(
    embeddings: DataFrame,
    query_every: int = ANN_QUERY_EVERY,
    k: int = ANN_TOP_K,
) -> DataFrame:
    """Exact brute-force cosine top-k for the query cohort
    (vec_id % query_every == 0), ties broken by neighbor_id.
    Output: (query_id, rank, neighbor_id).

    Optimization shape (r6): the N×Q score matrix runs as vectorized
    NumPy inside one mapInArrow pass over the candidate scan instead of
    a BroadcastNestedLoopJoin evaluating an interpreted zip_with/
    aggregate fold per pair (the old plan spent its whole wall there —
    28.9 s at 20k vectors; the N×Q dots are ~0.5 s of raw double
    arithmetic). Scores are BIT-IDENTICAL to the former JVM fold: the
    accumulation loops over dimensions left-to-right, each product and
    each add individually rounded (no FMA, no pairwise summation — see
    _score_chunk), the denominator is the same single-rounded qn*nrm
    product, so the (score DESC, vec_id ASC) order cannot differ.
    Each task emits only its local top-k per query (exact: any global
    top-k row is in its task's top-k under the same ordering), and a
    tiny window merges tasks×Q×k rows. The query cohort is collected
    and broadcast — the same boundedness contract as the broadcast
    join build side it replaces (at 10^12 vectors the driver batches
    the query set, as for the ANN LUTs)."""
    rows = (
        embeddings.filter(F.col("vec_id") % query_every == 0)
        .select("vec_id", "embedding")
        .collect()
    )
    out_schema = "query_id long, score double, neighbor_id long"
    if not rows:
        return (
            embeddings.select(
                F.col("vec_id").alias("query_id"),
                F.lit(0).cast("long").alias("rank"),
                F.col("vec_id").alias("neighbor_id"),
            ).limit(0)
        )
    import numpy as np

    q_ids = np.array([r[0] for r in rows], dtype=np.int64)
    qm = np.array([[float(x) for x in r[1]] for r in rows], dtype=np.float64)
    qn = _np_row_norms(qm)
    bc = embeddings.sparkSession.sparkContext.broadcast((q_ids, qm, qn))

    def score_partition(batches):
        import numpy as _np

        ids_b, qm_b, qn_b = bc.value
        yield from _topk_stream(batches, ids_b, qm_b, qn_b, k, _np)

    from .dedup import _maybe_spread

    parts = _maybe_spread(
        embeddings.select("vec_id", "embedding"), "vec_id"
    ).mapInArrow(score_partition, out_schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        parts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("long").alias("rank"), "neighbor_id")
    )


# chunk size for the streaming top-k: bounds the in-flight score matrix
# at CHUNK×Q doubles per task regardless of partition size
_TOPK_CHUNK = 8192


def _np_row_norms(m):
    """sqrt of the left-to-right self-dot per row — the exact FP
    operation sequence of the JVM fold sqrt(aggregate(zip_with(e,e,*),
    0.0, +)): one rounded multiply and one rounded add per dimension,
    in dimension order (0.0 + v0 == v0 exactly). NumPy ufuncs neither
    fuse multiply-add nor reorder the explicit python-level loop, so
    every intermediate equals the JVM's bit for bit."""
    import numpy as np

    acc = np.zeros(m.shape[0], dtype=np.float64)
    for d in range(m.shape[1]):
        t = m[:, d] * m[:, d]
        acc = acc + t
    return np.sqrt(acc)


def _score_chunk(cand_e, cand_ids, q_ids, qm, qn, np):
    """Exact cosine scores for a candidate chunk against all queries,
    replicating the JVM expression dot/(qn*nrm) rounding-for-rounding
    (see _np_row_norms for the fold argument). Self-pairs are masked to
    -inf (dropped before emit — the join condition vec_id != query_id
    removed them entirely). Returns (B, Q) scores."""
    nrm = _np_row_norms(cand_e)
    num = np.zeros((cand_e.shape[0], qm.shape[0]), dtype=np.float64)
    for d in range(cand_e.shape[1]):
        t = np.multiply.outer(cand_e[:, d], qm[:, d])
        num = num + t
    den = np.multiply.outer(nrm, qn)
    s = num / den
    s[cand_ids[:, None] == q_ids[None, :]] = -np.inf
    return s


def _topk_stream(batches, q_ids, qm, qn, k, np):
    """Per-task streaming top-k: accumulate Arrow batches to chunks,
    score each chunk, keep the per-query best (score DESC, vec_id ASC)
    candidates, emit one Arrow batch of <= chunks*Q*k rows at the end.
    Tie-breaks use lexsort((ids, -score)) — primary score descending,
    secondary id ascending, matching the JVM window order."""
    import pyarrow as pa

    dims = qm.shape[1]
    pend_ids: list = []
    pend_vecs: list = []
    pend_rows = 0
    keep_q: list = []
    keep_s: list = []
    keep_n: list = []

    def flush():
        nonlocal pend_rows
        if not pend_rows:
            return
        ids = np.concatenate(pend_ids)
        e = np.concatenate(pend_vecs)
        pend_ids.clear()
        pend_vecs.clear()
        pend_rows = 0
        s = _score_chunk(e, ids, q_ids, qm, qn, np)
        cut = min(k, s.shape[0])
        for j in range(s.shape[1]):
            col = s[:, j]
            order = np.lexsort((ids, -col))[:cut]
            sel = col[order]
            valid = sel != -np.inf  # drop masked self-pairs only
            if valid.any():
                keep_q.append(np.full(int(valid.sum()), q_ids[j]))
                keep_s.append(sel[valid])
                keep_n.append(ids[order][valid])

    for batch in batches:
        tbl = pa.Table.from_batches([batch])
        vid = tbl.column("vec_id")
        emb = tbl.column("embedding")
        ids = vid.to_numpy(zero_copy_only=False).astype(np.int64)
        mat = _list_col_matrix(emb, dims, np)
        if mat is None:  # ragged/null rows: densify the clean subset
            keep_rows = []
            raw = emb.to_pylist()
            for i, v in enumerate(raw):
                if v is not None and len(v) == dims:
                    keep_rows.append(i)
            mat = np.array(
                [[float(x) for x in raw[i]] for i in keep_rows], dtype=np.float64
            ).reshape(len(keep_rows), dims)
            ids = ids[keep_rows]
        if len(ids):
            pend_ids.append(ids)
            pend_vecs.append(mat)
            pend_rows += len(ids)
        if pend_rows >= _TOPK_CHUNK:
            flush()
    flush()
    if keep_q:
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(np.concatenate(keep_q), type=pa.int64()),
                pa.array(np.concatenate(keep_s), type=pa.float64()),
                pa.array(np.concatenate(keep_n), type=pa.int64()),
            ],
            names=["query_id", "score", "neighbor_id"],
        )


def _list_col_matrix(chunked, dims, np):
    """(rows, dims) float64 matrix from an Arrow list<float> column, or
    None when any row is null/ragged (caller densifies those)."""
    import pyarrow as pa

    mats = []
    for chunk in chunked.chunks if hasattr(chunked, "chunks") else [chunked]:
        if chunk.null_count:
            return None
        offs = chunk.offsets.to_numpy(zero_copy_only=False)
        if len(offs) > 1 and not (np.diff(offs) == dims).all():
            return None
        flat = chunk.values.to_numpy(zero_copy_only=False).astype(np.float64)
        mats.append(flat[int(offs[0]):int(offs[-1])].reshape(-1, dims))
    return np.concatenate(mats) if len(mats) != 1 else mats[0]


NEAR_DUP_COSINE = 0.42  # calibrated to the synthetic corpus (max ~0.51)


def embedding_near_dups_exact(
    embeddings: DataFrame, threshold: float = NEAR_DUP_COSINE
) -> DataFrame:
    """Exact all-pairs near-dup reference (O(N^2) — verification-grade
    only; never run this at scale). Output: (vec_a, vec_b, cos_pct)."""
    base = _with_norm(embeddings)
    a = base.select(
        F.col("vec_id").alias("vec_a"), F.col("e").alias("ea"), F.col("nrm").alias("na")
    )
    b = base.select(
        F.col("vec_id").alias("vec_b"), F.col("e").alias("eb"), F.col("nrm").alias("nb")
    )
    cos = _dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos", cos)
        .filter(F.col("cos") > threshold)
        .select("vec_a", "vec_b", F.floor(F.col("cos") * 100).cast("long").alias("cos_pct"))
    )


def lsh_table_buckets(
    embeddings: DataFrame,
    n_tables: int = ANN_LSH_TABLES,
    planes_per_table: int = ANN_LSH_PLANES_PER_TABLE,
    n_dims: int | None = None,
) -> DataFrame:
    """Multi-table sign-LSH routing: one (vec_id, t, bucket) row per
    table; table t hashes with planes [t*ppt, (t+1)*ppt). All tables
    derive from one deterministic plane family, so the DuckDB oracle
    can inline identical constants. Output keeps the id only — vectors
    are re-joined AFTER candidate dedup so the bucket shuffle never
    carries embeddings.

    ``n_dims=None`` probes the actual width (one tiny driver job);
    pass it explicitly (the driver contract passes 64) to skip the
    probe. NEVER default to a constant: zip_with against a wrong-width
    plane literal yields null dots → every bit '0' → one global
    bucket, silently."""
    e = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    df = embeddings.select("vec_id", e.alias("e"))
    if n_dims is None:
        n_dims = _probe_dims(df)
    if not n_dims:  # empty corpus: empty routing table, not a crash
        return (
            df.select("vec_id", F.lit(0).cast("int").alias("t"),
                      F.lit("").alias("bucket")).limit(0)
        )
    planes = lsh_plane_signs(n_dims, n_tables * planes_per_table)

    tables = []
    for t in range(n_tables):
        bits = []
        for j in range(planes_per_table):
            signs = planes[t * planes_per_table + j]
            proj = _dot(F.col("e"), F.array(*[F.lit(s) for s in signs]))
            bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
        tables.append(
            F.struct(F.lit(t).cast("int").alias("t"), F.concat(*bits).alias("bucket"))
        )
    return df.select(
        "vec_id", F.explode(F.array(*tables)).alias("tb")
    ).select("vec_id", "tb.t", "tb.bucket")


def lsh_query_probes(
    embeddings: DataFrame,
    query_every: int = ANN_QUERY_EVERY,
    n_tables: int = ANN_LSH_TABLES,
    planes_per_table: int = ANN_LSH_PLANES_PER_TABLE,
    n_dims: int | None = None,
    multiprobe: int = ANN_MULTIPROBE,
) -> DataFrame:
    """Query-side LSH routing rows INCLUDING multi-probe cells: per
    table, the query's own bucket plus (multiprobe=1) the bucket with
    its lowest-|projection| bit flipped. Tie on |projection| breaks to
    the lowest plane index — the DuckDB twin implements the identical
    argmin, so candidate sets match bit-for-bit.
    Output: (query_id, t, bucket)."""
    assert multiprobe in (0, 1), "oracle twin mirrors 0/1 only"
    e = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    df = embeddings.filter(F.col("vec_id") % query_every == 0).select(
        F.col("vec_id").alias("query_id"), e.alias("e")
    )
    if n_dims is None:
        n_dims = _probe_dims(df)
    if not n_dims:
        return df.select(
            "query_id", F.lit(0).cast("int").alias("t"), F.lit("").alias("bucket")
        ).limit(0)
    planes = lsh_plane_signs(n_dims, n_tables * planes_per_table)

    rows = []
    for t in range(n_tables):
        projs = [
            _dot(F.col("e"), F.array(*[F.lit(s) for s in planes[t * planes_per_table + j]]))
            for j in range(planes_per_table)
        ]
        bits = [
            F.when(p >= 0, F.lit("1")).otherwise(F.lit("0")) for p in projs
        ]
        rows.append(
            F.struct(F.lit(t).cast("int").alias("t"), F.concat(*bits).alias("bucket"))
        )
        if multiprobe:
            absv = [F.abs(p) for p in projs]

            def argmin_cond(j: int):
                cond = F.lit(True)
                for i in range(planes_per_table):
                    if i < j:
                        cond = cond & (absv[i] > absv[j])
                    elif i > j:
                        cond = cond & (absv[i] >= absv[j])
                return cond

            def flipped(j: int):
                out = list(bits)
                out[j] = F.when(projs[j] >= 0, F.lit("0")).otherwise(F.lit("1"))
                return F.concat(*out)

            flip = F.when(argmin_cond(0), flipped(0))
            for j in range(1, planes_per_table):
                flip = flip.when(argmin_cond(j), flipped(j))
            rows.append(F.struct(F.lit(t).cast("int").alias("t"), flip.alias("bucket")))
    return df.select(
        "query_id", F.explode(F.array(*rows)).alias("tb")
    ).select("query_id", "tb.t", "tb.bucket")


def embedding_near_dups(
    embeddings: DataFrame,
    threshold: float = NEAR_DUP_COSINE,
    max_bucket: int = EMB_MAX_BUCKET,
    n_dims: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via multi-table LSH
    blocking + exact cosine within candidates (the scale path — no
    cartesian anywhere; VERDICT round 1 #7). A pair is considered iff
    it shares a bucket in >=1 of the ANN_LSH_TABLES tables; recall for
    pairs at the threshold is 1-(1-p^planes)^tables where
    p = 1 - angle/pi. Output: (vec_a, vec_b, cos_pct BIGINT)."""
    buckets = lsh_table_buckets(embeddings, n_dims=n_dims)
    # merge hint: the candidate-pair frame's size is unknowable to the
    # planner (double-explode fan-out behind a distinct) — a broadcast
    # guess here is an unbounded driver-memory build at scale (observed
    # OOM at 50k vectors with correlated buckets); sort-merge never
    # builds anything in one memory
    pairs = _bucket_pairs(buckets, ["t", "bucket"], "vec_id", max_bucket).select(
        F.col("doc_a").alias("vec_a"), F.col("doc_b").alias("vec_b")
    ).hint("merge")
    base = _with_norm(embeddings)
    a = base.select(F.col("vec_id").alias("vec_a"), F.col("e").alias("ea"), F.col("nrm").alias("na"))
    b = base.select(F.col("vec_id").alias("vec_b"), F.col("e").alias("eb"), F.col("nrm").alias("nb"))
    cos = _dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb"))
    return (
        pairs.join(a, "vec_a").join(b, "vec_b")
        .withColumn("cos", cos)
        .filter(F.col("cos") > threshold)
        .select("vec_a", "vec_b", F.floor(F.col("cos") * 100).cast("long").alias("cos_pct"))
    )


def lsh_bucketed_topk(
    embeddings: DataFrame,
    query_every: int = ANN_QUERY_EVERY,
    k: int = ANN_TOP_K,
    max_bucket: int = EMB_MAX_BUCKET,
    n_dims: int | None = None,
    multiprobe: int = ANN_MULTIPROBE,
) -> DataFrame:
    """ANN search WITHIN the LSH routing tables (the operator the
    round-1 bucket columns existed to serve): candidates for a query
    are vectors sharing any (table, bucket) cell — including each
    table's multi-probe cell (lowest-|margin| bit flipped; see
    ``lsh_query_probes``); exact cosine ranks them; top-k per query.
    May return <k rows for a query when its cells hold fewer
    candidates — that's the accuracy/cost dial.
    Degenerate cells larger than ``max_bucket`` are dropped from the
    candidate side before the join fan-out (window count, same
    OOM-guard as the pair generators); the DuckDB twin mirrors the
    cap. Output: (query_id, rank, neighbor_id); recall vs the exact
    ``cosine_topk`` is reported in BENCH.md."""
    if n_dims is None:
        # resolve once: lsh_table_buckets and lsh_query_probes would
        # otherwise each fire their own driver-side width-probe job
        e = F.transform(F.col("embedding"), lambda x: x.cast("double"))
        n_dims = _probe_dims(embeddings.select("vec_id", e.alias("e")))
    buckets = lsh_table_buckets(embeddings, n_dims=n_dims)
    qb = lsh_query_probes(
        embeddings, query_every=query_every, n_dims=n_dims, multiprobe=multiprobe
    )
    w = Window.partitionBy("t", "bucket")
    capped = buckets.withColumn("_csz", F.count(F.lit(1)).over(w)).filter(
        F.col("_csz") <= max_bucket
    )
    # broadcast the tiny query-side routing rows; candidate ids dedupe
    # before any vector is joined back in
    cand = (
        capped.join(F.broadcast(qb), ["t", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .distinct()
        # candidate cardinality is planner-opaque: never let it be the
        # broadcast-build side of the vector join (see embedding_near_dups)
        .hint("merge")
    )
    base = _with_norm(embeddings)
    queries = base.filter(F.col("vec_id") % query_every == 0).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe"), F.col("nrm").alias("qn")
    )
    scored = (
        cand.join(base.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id")
        .join(F.broadcast(queries), "query_id")
        .withColumn("score", _dot(F.col("qe"), F.col("e")) / (F.col("qn") * F.col("nrm")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("long").alias("rank"), "neighbor_id")
    )


def lsh_plane_signs(n_dims: int, n_planes: int = 8) -> list:
    """Deterministic ±1 hyperplanes: plane j keeps dimension i with
    sign +1 iff md5("{i}|{j}") starts with hex digit 0-7. Shared by the
    Spark operator and the DuckDB oracle (inlined as list literals)."""
    import hashlib

    return [
        [
            1.0 if hashlib.md5(f"{i}|{j}".encode()).hexdigest()[0] < "8" else -1.0
            for i in range(n_dims)
        ]
        for j in range(n_planes)
    ]


def lsh_sign_buckets(
    embeddings: DataFrame, n_planes: int = 8, n_dims: int | None = None
) -> DataFrame:
    """Sign-LSH bucket per vector: bit j = sign of the projection onto a
    deterministic ±1 hyperplane. Bucket-join variant of ANN: at 10^12
    vectors, equal buckets become the join key and brute force runs
    only within buckets. Pass ``n_dims`` explicitly to skip the
    driver-side width probe (never default it to a constant — a wrong
    width nulls every projection and collapses all vectors into one
    bucket). Output: (vec_id, bucket)."""
    e = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    df = embeddings.select("vec_id", e.alias("e"))
    if n_dims is None:
        n_dims = _probe_dims(df)
    if not n_dims:  # empty corpus: empty result, not a crash
        return df.select("vec_id", F.lit("").alias("bucket")).limit(0)

    bits = []
    for signs in lsh_plane_signs(n_dims, n_planes):
        proj = _dot(F.col("e"), F.array(*[F.lit(s) for s in signs]))
        bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
    return df.select("vec_id", F.concat(*bits).alias("bucket"))


IVF_CENTROID_EVERY = 50
# The seed cohort must NOT scale with the corpus: vec_id % 50 alone
# gives N/50 cells — 2·10^10 at 10^12 vectors, and the round-5 scaling
# curve measured the blowup at a mere 10x (ann_ivf_topk 1.6 s → 167 s:
# 1000-centroid literal folds). Real IVF fixes the cell count, so the
# effective stride grows with N: every = max(centroid_every,
# ceil(N / IVF_MAX_CENTROIDS)) — pure integer arithmetic, mirrored
# bit-exactly by the DuckDB twins.
IVF_MAX_CENTROIDS = 256


def _effective_every(embeddings: DataFrame, centroid_every: int) -> int:
    n = embeddings.count()
    return max(centroid_every, (n + IVF_MAX_CENTROIDS - 1) // IVF_MAX_CENTROIDS)

# Lloyd's iterations for the IVF cells and PQ sub-codebooks (round-5
# verdict #3: the quantizers were untrained sampled cohorts). Training
# runs in INTEGER micro-unit space so centroid sums are exact and
# order-independent — the one property that lets the DuckDB oracle
# replay the identical iterations and land on bit-identical centroids
# regardless of either engine's aggregation order.
IVF_TRAIN_ITERS = 2
MICRO = 1_000_000.0
# assignment/ranking comparisons quantize scores to integers so a
# sub-ulp engine difference in FP summation can never flip an
# assignment (which training would then amplify into divergent
# centroids): cosines to 1e-12 units, micro-scale L2 to whole units
# (double ulp at the 1e12-1e13 magnitudes involved is ~1e-4 — five
# orders below the quantum).
SCORE_SCALE = 1_000_000_000_000.0

# Product quantization: split the vector into PQ_SUBSPACES contiguous
# sub-vectors; each gets its own codebook (trained per subspace by the
# same integer-space Lloyd's, seeded from the deterministic cohort). A
# vector is stored as PQ_SUBSPACES small codes — at 10^12 vectors the
# search scans CODES (a few bytes/vector), not raw floats; queries
# score candidates via ADC (asymmetric distance: per-subspace lookup
# tables of query-to-centroid dots, summed).
PQ_SUBSPACES = 4

# ADC quantization loses within-cohort order (cohort-mates share codes,
# so their ADC scores tie); production PQ pipelines close that gap with
# an exact re-rank of the top-C ADC candidates — only C vectors per
# query ever move, the code-only scan is unchanged. C sizes against
# expected cell density: on the realistic Zipf-clustered corpus the
# head cluster's vectors collapse onto few code combinations, so ADC
# ties push true neighbors past a narrow cut (measured clustered
# recall 0.74 @ C=64 → 0.91 @ C=192; BENCH.md r5). C·Q stays tiny.
PQ_RERANK_C = 192


def _l2(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _subspace_rows(frame: DataFrame, id_alias: str, n_dims: int,
                   n_sub: int = PQ_SUBSPACES) -> DataFrame:
    """(id, m, se): one row per (vector, subspace) with the sub-vector.
    Requires n_dims % n_sub == 0."""
    width = n_dims // n_sub
    subs = [
        F.struct(
            F.lit(m).cast("int").alias("m"),
            F.slice(F.col("e"), m * width + 1, width).alias("se"),
        )
        for m in range(n_sub)
    ]
    return frame.select(
        F.col("vec_id").alias(id_alias), F.explode(F.array(*subs)).alias("s")
    ).select(id_alias, "s.m", "s.se")


def _quantized(embeddings: DataFrame) -> DataFrame:
    """(vec_id, qe, e, nrm): coordinates floored to BIGINT micro-units
    (qe) plus their exact double image (e, micro scale — cosine is
    scale-invariant so all IVF/PQ math runs here). The integer column
    is what makes Lloyd's centroid sums order-independent."""
    q = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") * F.lit(MICRO) + F.lit(0.5)).cast("long"),
    )
    return (
        embeddings.select("vec_id", q.alias("qe"))
        .withColumn("e", F.transform(F.col("qe"), lambda x: x.cast("double")))
        .withColumn("nrm", F.sqrt(_dot(F.col("e"), F.col("e"))))
    )


def _py_norm(coords: list) -> float:
    # mirrors sqrt(list_dot_product(x, x)): strict left-to-right fold
    acc = 0.0
    for x in coords:
        acc += x * x
    import math

    return math.sqrt(acc)


def _cent_array(centroids: list) -> Column:
    """Literal array<struct<cid,ce,cn>> from [(cid, coords, norm)].
    C·D literals constant-fold once — per-row cost is the fold itself."""
    return F.array(*[
        F.struct(
            F.lit(int(cid)).cast("long").alias("cid"),
            F.array(*[F.lit(float(x)) for x in ce]).alias("ce"),
            F.lit(float(cn)).cast("double").alias("cn"),
        )
        for cid, ce, cn in centroids
    ])


def _centroid_frame(spark, centroids: list) -> DataFrame:
    """Tiny (centroid_id, ce, cn) frame from [(cid, coords, norm)] —
    the broadcast side of every assignment join."""
    return spark.createDataFrame(
        [
            (int(cid), [float(x) for x in ce], float(cn))
            for cid, ce, cn in centroids
        ],
        "centroid_id long, ce array<double>, cn double",
    )


def _cosine_score_q(e: Column, nrm: Column, ce: Column, cn: Column) -> Column:
    """Quantized cosine (1e-12 units, BIGINT) — integer comparisons, so
    a sub-ulp engine difference can never flip an argmax."""
    return F.floor(
        _dot(e, ce) / (nrm * cn) * F.lit(SCORE_SCALE) + F.lit(0.5)
    ).cast("long")


def _assign_cosine(base: DataFrame, centroids: list, carry: list = ()) -> DataFrame:
    """Nearest centroid by cosine: broadcast-join the C-row centroid
    table against the (vec_id, e, nrm) frame and take the per-vector
    argmax as min(struct(-score_q, cid)) — a HASH AGGREGATE with
    map-side partials, so the N×C scored rows never leave their input
    partitions; the only exchange carries N (vec_id, best) rows. (The
    r4 row_number window shuffled all N×C rows; a literal-array argmax
    fold avoids even the N-row exchange but runs on the interpreted
    HOF path — measured 10-16× more CPU at 10x scale, the wrong
    trade.) Ties break to the lowest centroid id via the struct
    ordering; integer scores make that exact. Output: (vec_id,
    centroid_id [, carry...])."""
    cdf = _centroid_frame(base.sparkSession, centroids)
    sc = F.struct(
        (-_cosine_score_q(F.col("e"), F.col("nrm"), F.col("ce"), F.col("cn"))).alias("neg"),
        F.col("centroid_id").alias("cid"),
    )
    aggs = [F.min("sc").alias("best")] + [F.first(c).alias(c) for c in carry]
    return (
        base.join(F.broadcast(cdf))
        .select("vec_id", *carry, sc.alias("sc"))
        .groupBy("vec_id")
        .agg(*aggs)
        .select(
            "vec_id", F.col("best.cid").alias("centroid_id"), *carry
        )
    )


def train_ivf_centroids(
    embeddings: DataFrame,
    centroid_every: int = IVF_CENTROID_EVERY,
    iters: int = IVF_TRAIN_ITERS,
    n_dims: int | None = None,
) -> list:
    """Distributed Lloyd's for the IVF cells, seeded from the
    deterministic cohort (vec_id % centroid_every == 0). Each round:
    map-only assignment against broadcast-literal centroids, then a
    map-side-partial groupBy of exact INTEGER coordinate sums; only the
    C×(D+1) aggregate rows ever reach the driver — the per-iteration
    driver materialization of C centroids is the k-means contract
    (MLlib's KMeans does the same). Cluster ids stay the seed vec_ids.
    Empty clusters keep their previous centroid. Returns
    [(cid, coords_micro, norm)] sorted by cid — deterministic on any
    partitioning because every cross-row reduction is integer. The
    seed stride is widened so the cell count never exceeds
    IVF_MAX_CENTROIDS (see _effective_every)."""
    base = _quantized(embeddings)
    if n_dims is None:
        n_dims = _probe_dims(base)
    if not n_dims:
        return []
    centroid_every = _effective_every(embeddings, centroid_every)
    seeds = (
        base.filter(F.col("vec_id") % centroid_every == 0).select("vec_id", "e").collect()
    )
    cents = sorted((int(r["vec_id"]), [float(x) for x in r["e"]]) for r in seeds)
    if not cents:
        return []
    for _ in range(iters):
        asg = _assign_cosine(
            base, [(cid, ce, _py_norm(ce)) for cid, ce in cents], carry=["qe"]
        )
        sums = (
            asg.groupBy("centroid_id")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                *[F.sum(F.col("qe")[d]).alias(f"s{d}") for d in range(n_dims)],
            )
            .collect()
        )
        upd = {
            int(r["centroid_id"]): [
                float(r[f"s{d}"]) / float(r["cnt"]) for d in range(n_dims)
            ]
            for r in sums
        }
        cents = [(cid, upd.get(cid, ce)) for cid, ce in cents]
    return [(cid, ce, _py_norm(ce)) for cid, ce in cents]


def _l2_d2_q(se: Column, ce: Column) -> Column:
    """Quantized micro-scale L2 (whole integer units, BIGINT) — double
    ulp at the 1e12-1e13 magnitudes involved is ~1e-4, five orders
    below the quantum, so the argmin is engine-exact."""
    return F.floor(_l2(se, ce) + F.lit(0.5)).cast("long")


def _assign_l2(sub: DataFrame, books, key_cols, carry: list = ()) -> DataFrame:
    """Nearest codeword by L2 — the same join-then-partial-argmin shape
    as _assign_cosine: broadcast the (m, cid, ce) codeword table, score
    in place, take min(struct(d2_q, cid)) per ``key_cols`` group
    (map-side partials; only id-rows exchange). ``books`` is
    {m: [(cid, coords)]}. Output: (*key_cols, cid [, carry...])."""
    bdf = sub.sparkSession.createDataFrame(
        [
            (int(m), int(cid), [float(x) for x in ce])
            for m, book in sorted(books.items())
            for cid, ce in book
        ],
        "m long, cid long, ce array<double>",
    )
    sc = F.struct(
        _l2_d2_q(F.col("se"), F.col("ce")).alias("d2"),
        F.col("cid").alias("cid"),
    )
    aggs = [F.min("sc").alias("best")] + [F.first(c).alias(c) for c in carry]
    return (
        sub.join(F.broadcast(bdf), "m")
        .select(*key_cols, *carry, sc.alias("sc"))
        .groupBy(*key_cols)
        .agg(*aggs)
        .select(*key_cols, F.col("best.cid").alias("cid"), *carry)
    )


def train_pq_codebooks(
    embeddings: DataFrame,
    n_dims: int,
    centroid_every: int = IVF_CENTROID_EVERY,
    n_sub: int = PQ_SUBSPACES,
    iters: int = IVF_TRAIN_ITERS,
) -> dict:
    """Per-subspace integer-space Lloyd's (L2 metric — the standard PQ
    objective), seeded from the cohort's sub-vectors. Same determinism
    contract as train_ivf_centroids. Returns {m: [(cid, coords)]}.
    Subspaces train as separate tiny jobs — training is the offline
    path; at scale it runs on a sample, never the full corpus."""
    assert n_dims % n_sub == 0, "dims must split evenly into subspaces"
    w = n_dims // n_sub
    centroid_every = _effective_every(embeddings, centroid_every)
    base = _quantized(embeddings)
    books: dict = {}
    for m in range(n_sub):
        sub = base.select(
            F.lit(m).cast("long").alias("m"),
            "vec_id",
            F.slice(F.col("qe"), m * w + 1, w).alias("sq"),
            F.slice(F.col("e"), m * w + 1, w).alias("se"),
        )
        seeds = (
            sub.filter(F.col("vec_id") % centroid_every == 0)
            .select("vec_id", "se")
            .collect()
        )
        book = sorted((int(r["vec_id"]), [float(x) for x in r["se"]]) for r in seeds)
        if not book:
            return {}
        for _ in range(iters):
            asg = _assign_l2(sub, {m: book}, ["vec_id"], carry=["sq"])
            sums = (
                asg.groupBy("cid")
                .agg(
                    F.count(F.lit(1)).alias("cnt"),
                    *[F.sum(F.col("sq")[d]).alias(f"s{d}") for d in range(w)],
                )
                .collect()
            )
            upd = {
                int(r["cid"]): [float(r[f"s{d}"]) / float(r["cnt"]) for d in range(w)]
                for r in sums
            }
            book = [(cid, upd.get(cid, ce)) for cid, ce in book]
        books[m] = book
    return books


def pq_assign(
    embeddings: DataFrame,
    n_dims: int,
    centroid_every: int = IVF_CENTROID_EVERY,
    n_sub: int = PQ_SUBSPACES,
    codebooks: dict | None = None,
) -> DataFrame:
    """Product-quantization encoding: per (vector, subspace) the id of
    the nearest TRAINED codeword by L2 (ties → lowest centroid id).
    Round-5 verdict #2 shape: one generate (subspace explode) + one
    broadcast join against the codeword table + a per-(vector,
    subspace) argmin as min(struct(d2_q, cid)) with MAP-SIDE partial
    aggregation — the only exchange carries N·n_sub id-rows, never the
    N·n_sub·C scored rows the old row_number window shuffled. Zero
    Window (plan-asserted in tests/test_similarity_scale.py).
    Output: (vec_id, m, code_cid)."""
    if codebooks is None:
        codebooks = train_pq_codebooks(embeddings, n_dims, centroid_every, n_sub)
    if not codebooks:
        return embeddings.select(
            "vec_id",
            F.lit(0).cast("long").alias("m"),
            F.lit(0).cast("long").alias("code_cid"),
        ).limit(0)
    base = _quantized(embeddings)
    vexp = _subspace_rows(base.select("vec_id", "e"), "vec_id", n_dims, n_sub)
    vexp = vexp.withColumn("m", F.col("m").cast("long"))
    return _assign_l2(vexp, codebooks, ["vec_id", "m"]).select(
        "vec_id", "m", F.col("cid").alias("code_cid")
    )


def pq_adc_topk(
    embeddings: DataFrame,
    n_dims: int,
    centroid_every: int = IVF_CENTROID_EVERY,
    n_sub: int = PQ_SUBSPACES,
    query_every: int = ANN_QUERY_EVERY,
    k: int = ANN_TOP_K,
    rerank_c: int = PQ_RERANK_C,
    train_iters: int = IVF_TRAIN_ITERS,
) -> DataFrame:
    """PQ search via ADC: queries build per-subspace lookup tables of
    (query-sub · centroid-sub) inner products plus the centroids'
    squared norms (Q × M × K rows — tiny, broadcast); every vector's
    codes join the LUT and the per-query sums yield the COSINE between
    the query and the vector's code reconstruction:
    cos = Σ part / (|q| · sqrt(Σ |c_code|²)) — subspaces decompose
    orthogonally, so the reconstruction norm is exactly the root of the
    summed centroid norms, still computable from codes alone (an
    unnormalized dot would systematically favor large-norm vectors over
    true cosine neighbors). The scan side touches only (vec_id, m,
    code) — never raw vectors.

    Ranking is two-stage (the standard production ADC shape): the code
    scan keeps the top ``rerank_c`` candidates per query by ADC score,
    then ONLY those C·Q ids come back for their raw vectors and are
    re-ranked by exact cosine — ADC score ties among cohort-mates
    (vectors sharing codes) can no longer scramble the final top-k.
    Both scores are rounded to micro-units (BIGINT) so FP summation
    order can't flip equal-score neighbors; ties break by neighbor id.
    Codebooks are TRAINED (per-subspace integer-space Lloyd's); codes
    come from the map-only pq_assign. ADC scoring runs in the micro
    scale (cosine is scale-invariant); the exact re-rank scores RAW
    vectors. Output: (query_id, rank, neighbor_id)."""
    codebooks = train_pq_codebooks(
        embeddings, n_dims, centroid_every, n_sub, iters=train_iters
    )
    if not codebooks:
        return embeddings.select(
            F.col("vec_id").alias("query_id"),
            F.lit(0).cast("long").alias("rank"),
            F.col("vec_id").alias("neighbor_id"),
        ).limit(0)
    spark = embeddings.sparkSession
    cexp = spark.createDataFrame(
        [
            (int(m), int(cid), [float(x) for x in ce])
            for m, book in sorted(codebooks.items())
            for cid, ce in book
        ],
        "m long, cid long, ce array<double>",
    )
    codes = pq_assign(embeddings, n_dims, centroid_every, n_sub,
                      codebooks=codebooks)
    base = _quantized(embeddings)
    v = base.select("vec_id", "e")
    qexp = _subspace_rows(
        v.filter(F.col("vec_id") % query_every == 0), "query_id", n_dims, n_sub
    ).withColumnRenamed("se", "qe")
    qnorm = (
        base.filter(F.col("vec_id") % query_every == 0)
        .select(F.col("vec_id").alias("query_id"), F.col("nrm").alias("qn"))
    )
    lut = qexp.join(cexp, "m").select(
        "query_id", "m", "cid",
        _dot(F.col("qe"), F.col("ce")).alias("part"),
        _dot(F.col("ce"), F.col("ce")).alias("cn2"),
    )
    scored = (
        codes.join(F.broadcast(lut),
                   (codes.m == lut.m) & (codes.code_cid == lut.cid))
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("part").alias("num"), F.sum("cn2").alias("rn2"))
        .join(F.broadcast(qnorm), "query_id")
        .select(
            "query_id", "vec_id",
            F.round(F.col("num") / (F.col("qn") * F.sqrt("rn2")) * 1e6)
            .cast("long").alias("score_u"),
        )
    )
    wc = Window.partitionBy("query_id").orderBy(F.desc("score_u"), F.asc("vec_id"))
    cand = (
        scored.withColumn("rnc", F.row_number().over(wc))
        .filter(F.col("rnc") <= rerank_c)
        .select("query_id", "vec_id")
    )
    # Exact re-rank: the candidate list is hard-capped at C rows per
    # query by the row_number cut above, so broadcasting it turns the
    # raw-vector fetch into a map-side hash join against the embedding
    # scan — the big side still never shuffles. (At 10^12 scale the
    # driver batches queries, keeping C·Q bounded — same contract as
    # the broadcast LUT.)
    qfull = (
        v.filter(F.col("vec_id") % query_every == 0)
        .select(F.col("vec_id").alias("query_id"), F.col("e").alias("qe"))
    )
    exact = (
        v.join(F.broadcast(cand), "vec_id")
        .join(F.broadcast(qfull), "query_id")
        .select(
            "query_id", "vec_id",
            F.round(
                _dot(F.col("e"), F.col("qe"))
                / (F.sqrt(_dot(F.col("e"), F.col("e")))
                   * F.sqrt(_dot(F.col("qe"), F.col("qe"))))
                * 1e6
            ).cast("long").alias("exact_u"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("exact_u"), F.asc("vec_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("long").alias("rank"),
                F.col("vec_id").alias("neighbor_id"))
    )


def ivf_assign(
    embeddings: DataFrame,
    centroid_every: int = IVF_CENTROID_EVERY,
    centroids: list | None = None,
    n_dims: int | None = None,
) -> DataFrame:
    """IVF coarse quantization against TRAINED centroids (Lloyd's,
    seeded from the vec_id % centroid_every cohort; cluster ids stay
    the seed vec_ids): every vector goes to its nearest centroid by
    cosine (ties → lowest centroid id). Round-5 verdict #2 shape: the
    broadcast-join scores stay in their input partitions and the
    per-vector argmax is a hash aggregate with MAP-SIDE PARTIALS —
    the only exchange carries N (vec_id, best) id-rows, never the N×C
    scored rows the old row_number window shuffled (at 10^12 vectors
    × 100 centroids that shuffle IS the job). Zero Window, a single
    id-row Exchange — plan-asserted. Pass ``centroids`` (from
    train_ivf_centroids) to share one trained table across assignment
    + search. Output: (vec_id, centroid_id)."""
    if centroids is None:
        centroids = train_ivf_centroids(embeddings, centroid_every, n_dims=n_dims)
    if not centroids:
        return embeddings.select(
            "vec_id", F.lit(0).cast("long").alias("centroid_id")
        ).limit(0)
    return _assign_cosine(_quantized(embeddings), centroids)


def ivf_probed_topk(
    embeddings: DataFrame,
    centroid_every: int = IVF_CENTROID_EVERY,
    n_probe: int = IVF_PROBES,
    query_every: int = ANN_QUERY_EVERY,
    k: int = ANN_TOP_K,
    n_dims: int | None = None,
    train_iters: int = IVF_TRAIN_ITERS,
) -> DataFrame:
    """IVF search: queries probe their ``n_probe`` nearest TRAINED
    centroids and brute-force only the vectors assigned to those cells.
    Assignment is the map-only literal-fold (see ivf_assign); query
    probing sorts the per-row scored centroid array (array_sort with a
    score-desc/cid-asc comparator) and slices the top n_probe — also
    map-only on the tiny query side. Candidate scoring joins on the
    cell id, so no stage ever shuffles the full vector set against the
    queries. Output: (query_id, rank, neighbor_id)."""
    centroids = train_ivf_centroids(
        embeddings, centroid_every, iters=train_iters, n_dims=n_dims
    )
    if not centroids:
        return embeddings.select(
            F.col("vec_id").alias("query_id"),
            F.lit(0).cast("long").alias("rank"),
            F.col("vec_id").alias("neighbor_id"),
        ).limit(0)
    assign = ivf_assign(embeddings, centroid_every, centroids=centroids)
    base = _quantized(embeddings)

    queries = base.filter(F.col("vec_id") % query_every == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("e").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    cscored = F.transform(
        _cent_array(centroids),
        lambda c: F.struct(
            F.floor(
                _dot(F.col("qv"), c["ce"]) / (F.col("qn") * c["cn"])
                * F.lit(SCORE_SCALE) + F.lit(0.5)
            ).cast("long").alias("score_q"),
            c["cid"].alias("cid"),
        ),
    )
    by_score = F.array_sort(
        cscored,
        lambda left, right: F.when(left["score_q"] > right["score_q"], F.lit(-1))
        .when(left["score_q"] < right["score_q"], F.lit(1))
        .when(left["cid"] < right["cid"], F.lit(-1))
        .when(left["cid"] > right["cid"], F.lit(1))
        .otherwise(F.lit(0)),
    )
    probes = queries.select(
        "query_id",
        "qv",
        "qn",
        F.explode(
            F.transform(F.slice(by_score, 1, n_probe), lambda s: s["cid"])
        ).alias("centroid_id"),
    )

    cand = assign.join(F.broadcast(probes), "centroid_id").filter(
        F.col("vec_id") != F.col("query_id")
    ).hint("merge")  # planner-opaque cardinality; see embedding_near_dups
    scored = cand.join(base, "vec_id").withColumn(
        "score_q",
        F.floor(
            _dot(F.col("qv"), F.col("e")) / (F.col("qn") * F.col("nrm"))
            * F.lit(SCORE_SCALE) + F.lit(0.5)
        ).cast("long"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score_q"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("long").alias("rank"),
            F.col("vec_id").alias("neighbor_id"),
        )
    )

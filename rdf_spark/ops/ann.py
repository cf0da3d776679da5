"""Approximate nearest-neighbor search over embedding columns.

* ``brute_force_topk`` — exact cosine top-k; the dot product is a pure
  JVM ``zip_with``/``aggregate`` expression (no Python), queries are
  broadcast, so the plan is scan → broadcast-join → window.  Correctness
  baseline and perfectly adequate when |queries| is small.
* ``lsh_topk`` — random-hyperplane (signed projection) LSH: signatures in
  a narrow pandas stage (all tables in one matmul), bucket-join candidate
  union over ``n_tables`` tables, exact rerank.  The scale path:
  candidate count ≈ T·n/2^bits per query instead of n, recall tunable
  via the table count.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# guard on the ivf_pq_topk query-side driver collect (queries are the
# small side by contract; a 1M × 64-double query dict is ~0.5 GB —
# past this, shard the query set and union the per-shard top-k)
MAX_QUERIES = 1_000_000


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def cosine_col(a, b):
    """Cosine similarity between two array<float/double> columns (JVM-side)."""
    num = _dot(a, b)
    den = F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b))
    return F.when(den > 0, num / den).otherwise(F.lit(0.0))


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k neighbors per query: (query_id, vec_id, sim, rank).

    ``queries(query_id, embedding)`` is broadcast; similarity is computed
    in whole-stage codegen; ties break on vec_id for determinism.
    """
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).cast("array<double>").alias("_qv")
    )
    e = embeddings.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("_ev"))
    sim = F.round(cosine_col(F.col("_qv"), F.col("_ev")), 6)
    scored = e.crossJoin(F.broadcast(q)).select(
        query_id_col, id_col, sim.alias("sim")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("sim"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def hyperplane_signatures(
    df: DataFrame,
    dim: int,
    n_bits: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    n_tables: int = 1,
) -> DataFrame:
    """Sign-of-projection LSH signatures → (id, table, bucket) rows.

    ``n_tables`` independent hash tables (disjoint hyperplane blocks from
    one seeded draw) raise recall: a pair is a candidate if it collides in
    ANY table, P[found] = 1-(1-p^b)^T.  All tables are computed in ONE
    narrow numpy pass (a single (dim, T·b) matmul per batch), so extra
    tables cost no extra scans — only a T× larger (still uniform)
    candidate shuffle.
    """

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rng = np.random.RandomState(seed)
        planes = rng.randn(dim, n_tables * n_bits)
        powers = 1 << np.arange(n_bits, dtype=np.int64)
        for pdf in it:
            n = len(pdf)
            if n == 0:
                continue
            mat = np.vstack(pdf[vec_col].map(np.asarray).to_numpy())
            bits = (mat @ planes) > 0
            buckets = bits.reshape(n, n_tables, n_bits) @ powers  # (n, T)
            yield pd.DataFrame({
                id_col: np.repeat(pdf[id_col].to_numpy(), n_tables),
                "table": np.tile(np.arange(n_tables, dtype=np.int32), n),
                "bucket": buckets.reshape(-1),
            })

    return df.mapInPandas(run, f"{id_col} long, table int, bucket long")


def _exact_rerank(
    cands: DataFrame,
    embeddings: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
    query_id_col: str,
) -> DataFrame:
    """Shared tail of every approximate path: exact cosine over the
    candidate (query, vector) pairs, deterministic top-k per query."""
    e = embeddings.select(id_col, F.col(vec_col).cast("array<double>").alias("_ev"))
    q = queries.select(query_id_col, F.col(vec_col).cast("array<double>").alias("_qv"))
    sim = F.round(cosine_col(F.col("_qv"), F.col("_ev")), 6)
    scored = (
        cands.join(e, id_col)
        .join(F.broadcast(q), query_id_col)
        .select(query_id_col, id_col, sim.alias("sim"))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("sim"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_bits: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
    n_tables: int = 4,
) -> DataFrame:
    """LSH-bucketed ANN: only vectors sharing one of the query's
    hyperplane buckets (any of ``n_tables`` tables) are reranked exactly.
    Candidates are deduped per (query, vector) before scoring, so extra
    tables raise recall without rescoring repeats."""
    e_sig = hyperplane_signatures(embeddings, dim, n_bits, id_col, vec_col, seed, n_tables)
    q_sig = hyperplane_signatures(
        queries.withColumnRenamed(query_id_col, id_col), dim, n_bits, id_col, vec_col,
        seed, n_tables,
    ).withColumnRenamed(id_col, query_id_col)

    cands = (
        e_sig.join(F.broadcast(q_sig), ["table", "bucket"])
        .select(query_id_col, id_col)
        .dropDuplicates([query_id_col, id_col])
    )
    return _exact_rerank(cands, embeddings, queries, k, id_col, vec_col, query_id_col)


def train_ivf_centroids(
    embeddings: DataFrame,
    dim: int,
    n_lists: int = 64,
    vec_col: str = "embedding",
    sample_size: int = 50_000,
    n_iter: int = 10,
    seed: int = 42,
    sample_fraction: float | None = None,
) -> "np.ndarray":
    """Train the IVF coarse quantizer: k-means on a bounded driver-side
    sample (spherical: vectors L2-normalized, assignment by max dot
    product = cosine).  The sample collect is the ONLY driver-side data
    movement in the IVF path and is capped at ``sample_size`` rows — at
    100 TB you train on a sample regardless; assignment and search stay
    distributed.  ``sample_fraction`` draws a uniform sample first
    (recommended at scale; the default ``limit`` alone is cheaper — no
    extra pass — but partition-biased).  Deterministic (seeded init,
    fixed iterations)."""
    src = embeddings.select(vec_col)
    if sample_fraction is not None:
        src = src.sample(fraction=sample_fraction, seed=seed)
    sample = src.limit(sample_size).collect()
    if not sample:
        raise ValueError("cannot train IVF centroids on an empty embeddings table")
    mat = np.array([r[0] for r in sample], dtype=np.float64)
    if mat.shape[1] != dim:
        raise ValueError(
            f"embedding dim {mat.shape[1]} does not match dim={dim}"
        )
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    n_lists = min(n_lists, len(mat))
    centroids = mat[rng.choice(len(mat), size=n_lists, replace=False)]
    for _ in range(n_iter):
        assign = (mat @ centroids.T).argmax(axis=1)
        for c in range(n_lists):
            members = mat[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids /= np.maximum(np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)
    return centroids


def ivf_assign(
    df: DataFrame,
    centroids: "np.ndarray",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 1,
) -> DataFrame:
    """(id, list_id) assignment rows — each vector's ``n_probe`` nearest
    centroids (data side uses n_probe=1; the query side probes several).
    One narrow numpy pass; the centroid matrix rides the task closure
    (n_lists × dim floats — broadcast-sized by construction)."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n = len(pdf)
            if n == 0:
                continue
            mat = np.vstack(pdf[vec_col].map(np.asarray).to_numpy()).astype(np.float64)
            mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            sims = mat @ centroids.T
            top = np.argsort(-sims, axis=1)[:, :n_probe]
            yield pd.DataFrame({
                id_col: np.repeat(pdf[id_col].to_numpy(), n_probe),
                "list_id": top.reshape(-1).astype(np.int32),
            })

    return df.mapInPandas(run, f"{id_col} long, list_id int")


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_lists: int = 64,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
    centroids: "np.ndarray | None" = None,
) -> DataFrame:
    """IVF ANN: coarse k-means quantizer → inverted lists → probe the
    ``n_probe`` nearest lists per query → exact cosine rerank.

    The scale shape: candidates ≈ n·(n_probe/n_lists) per query instead
    of n, the inverted-list join shuffles on uniform-ish list ids, and
    recall is tuned by ``n_probe`` (monotone: n_probe=n_lists degrades to
    exact brute force).  Pass a pre-trained ``centroids`` matrix to share
    one quantizer across jobs (IVF's index-build/search split)."""
    if centroids is None:
        centroids = train_ivf_centroids(
            embeddings, dim, n_lists, vec_col, seed=seed
        )
    e_assign = ivf_assign(embeddings, centroids, id_col, vec_col, n_probe=1)
    q_assign = ivf_assign(
        queries.withColumnRenamed(query_id_col, id_col), centroids, id_col, vec_col,
        n_probe=n_probe,
    ).withColumnRenamed(id_col, query_id_col)
    cands = (
        e_assign.join(F.broadcast(q_assign), "list_id")
        .select(query_id_col, id_col)
        .dropDuplicates([query_id_col, id_col])
    )
    return _exact_rerank(cands, embeddings, queries, k, id_col, vec_col, query_id_col)


def train_pq_codebooks(
    embeddings: DataFrame,
    dim: int,
    m: int = 8,
    n_codes: int = 256,
    vec_col: str = "embedding",
    sample_size: int = 50_000,
    n_iter: int = 10,
    seed: int = 42,
) -> "np.ndarray":
    """Train product-quantization codebooks: the (L2-normalized) vector is
    split into ``m`` subvectors of ``dim // m`` dims; each subspace gets
    its own ``n_codes``-centroid k-means (Euclidean — PQ quantizes
    subvector positions, not angles).  Returns an ``(m, n_codes, dim/m)``
    tensor.  Like :func:`train_ivf_centroids`, training runs on a bounded
    driver-side sample (the only driver data movement); encoding and
    search stay distributed.  Deterministic (seeded init, fixed
    iterations)."""
    if dim % m:
        raise ValueError(f"dim={dim} must be divisible by m={m}")
    if n_codes > 256:
        raise ValueError("n_codes > 256 does not fit the 1-byte PQ code")
    sample = embeddings.select(vec_col).limit(sample_size).collect()
    if not sample:
        raise ValueError("cannot train PQ codebooks on an empty embeddings table")
    mat = np.array([r[0] for r in sample], dtype=np.float64)
    if mat.shape[1] != dim:
        raise ValueError(f"embedding dim {mat.shape[1]} does not match dim={dim}")
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    dsub = dim // m
    rng = np.random.RandomState(seed)
    k = min(n_codes, len(mat))
    books = np.empty((m, k, dsub), dtype=np.float64)
    for sub in range(m):
        x = mat[:, sub * dsub:(sub + 1) * dsub]
        cent = x[rng.choice(len(x), size=k, replace=False)]
        for _ in range(n_iter):
            # ||x-c||² = |x|² - 2x·c + |c|²; |x|² is constant per row, so
            # argmin needs only the last two terms (one matmul, no n×k×d)
            d = (cent ** 2).sum(axis=1)[None, :] - 2.0 * (x @ cent.T)
            assign = d.argmin(axis=1)
            for c in range(k):
                members = x[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        books[sub] = cent
    return books


def pq_encode(
    df: DataFrame,
    codebooks: "np.ndarray",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes) rows — per subspace the nearest codebook entry, packed
    ONE BYTE per subspace into a ``binary`` column: an m-byte code per
    vector instead of dim×8 bytes of doubles (d=64, m=8 → 64× smaller).
    Narrow numpy pass; the codebook tensor (m × 256 × dim/m doubles)
    rides the task closure — broadcast-sized by construction."""
    m, n_codes, dsub = codebooks.shape
    cb_norms = (codebooks ** 2).sum(axis=2)  # (m, n_codes)

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n = len(pdf)
            if n == 0:
                continue
            mat = np.vstack(pdf[vec_col].map(np.asarray).to_numpy()).astype(np.float64)
            mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            codes = np.empty((n, m), dtype=np.uint8)
            for sub in range(m):
                x = mat[:, sub * dsub:(sub + 1) * dsub]
                # argmin ||x-c||² = argmin |c|² - 2x·c (|x|² constant per row)
                d = cb_norms[sub][None, :] - 2.0 * (x @ codebooks[sub].T)
                codes[:, sub] = d.argmin(axis=1)
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "codes": [c.tobytes() for c in codes],
            })

    return df.mapInPandas(run, f"{id_col} long, codes binary")


def ivf_pq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_lists: int = 64,
    n_probe: int = 4,
    m: int = 8,
    n_codes: int = 256,
    shortlist: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
    centroids: "np.ndarray | None" = None,
    codebooks: "np.ndarray | None" = None,
) -> DataFrame:
    """IVF-PQ ANN: coarse quantizer → inverted lists → asymmetric-distance
    (ADC) scoring over m-byte PQ codes → exact full-vector rerank on the
    per-query top-``shortlist`` only.

    Why this exists at 100 TB: plain :func:`ivf_topk` reranks EVERY
    probed candidate against its full vector — candidate-side I/O is
    n·(n_probe/n_lists)·dim×8 bytes per query.  Here candidates carry
    only their m-byte code through the probe join; each query builds one
    (m × n_codes) lookup table (LUT[sub][c] = q_sub · codebook[sub][c]),
    scores candidates by m table lookups, and only ``shortlist`` rows per
    query touch full vectors again — a dim·8/m-fold cut in candidate
    bytes moved (64-dim, m=8 → 64×).  ADC error only affects shortlist
    MEMBERSHIP; returned similarities are exact (the rerank recomputes
    cosine on full vectors).  Identical planted vectors get identical
    codes and therefore identical ADC scores — twin recall is structural,
    like ivf_topk's.  The query set is collected to the driver for LUT
    construction (queries are the small side by contract, exactly as
    brute_force_topk broadcasts them)."""
    if centroids is None:
        centroids = train_ivf_centroids(embeddings, dim, n_lists, vec_col, seed=seed)
    if codebooks is None:
        codebooks = train_pq_codebooks(
            embeddings, dim, m, n_codes, vec_col, seed=seed
        )
    m_, _, dsub = codebooks.shape
    e_assign = ivf_assign(embeddings, centroids, id_col, vec_col, n_probe=1)
    e_codes = pq_encode(embeddings, codebooks, id_col, vec_col)
    index = e_assign.join(e_codes, id_col)  # (id, list_id, codes): the PQ index
    q_assign = ivf_assign(
        queries.withColumnRenamed(query_id_col, id_col), centroids, id_col,
        vec_col, n_probe=n_probe,
    ).withColumnRenamed(id_col, query_id_col)
    cands = (
        index.join(F.broadcast(q_assign), "list_id")
        .select(query_id_col, id_col, "codes")
        .dropDuplicates([query_id_col, id_col])
    )
    # query vectors ride an sc.broadcast (one torrent transfer shared by
    # all tasks), NOT closure capture (pickled into every task), with an
    # embedding_decontaminate-style size guard folded into the ONE
    # collect job (limit bounds both the job and driver memory)
    qrows = queries.select(query_id_col, vec_col).limit(
        MAX_QUERIES + 1
    ).collect()
    if len(qrows) > MAX_QUERIES:
        raise ValueError(
            f"query set exceeds max {MAX_QUERIES} rows; "
            "shard the query set and union the top-k results"
        )
    qvecs = {}
    for r in qrows:
        v = np.asarray(r[1], dtype=np.float64)
        qvecs[r[0]] = v / max(float(np.linalg.norm(v)), 1e-12)
    bc_qvecs = queries.sparkSession.sparkContext.broadcast(qvecs)
    del qvecs, qrows

    def adc(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qvecs = bc_qvecs.value
        luts: dict = {}
        sub_idx = np.arange(m_)
        for pdf in it:
            n = len(pdf)
            if n == 0:
                continue
            scores = np.empty(n, dtype=np.float64)
            codes_mat = np.frombuffer(
                b"".join(pdf["codes"]), dtype=np.uint8
            ).reshape(n, m_)
            for qid, idx in pdf.groupby(query_id_col).indices.items():
                lut = luts.get(qid)
                if lut is None:
                    qv = qvecs[qid]
                    lut = np.stack([
                        codebooks[sub] @ qv[sub * dsub:(sub + 1) * dsub]
                        for sub in range(m_)
                    ])  # (m, n_codes)
                    luts[qid] = lut
                scores[idx] = lut[sub_idx[None, :], codes_mat[idx]].sum(axis=1)
            yield pd.DataFrame({
                query_id_col: pdf[query_id_col],
                id_col: pdf[id_col],
                "adc": scores,
            })

    scored = cands.mapInPandas(
        adc, f"{query_id_col} long, {id_col} long, adc double"
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("adc"), F.asc(id_col))
    short = (
        scored.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= shortlist)
        .select(query_id_col, id_col)
    )
    return _exact_rerank(short, embeddings, queries, k, id_col, vec_col, query_id_col)


def embedding_near_duplicates(
    embeddings: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_bits: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    n_tables: int = 4,
) -> DataFrame:
    """Embedding-cosine near-dup pairs via shared LSH bucket + exact verify.

    ``n_tables`` hash tables (candidate union, deduped before the exact
    rerank) control recall at a given threshold: one 10-bit table misses
    pairs already at cos≈0.95; four tables put recall ≳0.95 there
    (P[found] = 1-(1-p^b)^T with p = 1-θ/π).
    """
    sig = hyperplane_signatures(embeddings, dim, n_bits, id_col, vec_col, seed, n_tables)
    cands = (
        sig.join(sig.withColumnRenamed(id_col, "_b"), ["table", "bucket"])
        .filter(F.col(id_col) < F.col("_b"))
        .select(F.col(id_col).alias("a"), F.col("_b").alias("b"))
        .dropDuplicates(["a", "b"])
    )
    e = embeddings.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v"))
    pairs = (
        cands.join(e.select(F.col(id_col).alias("a"), F.col("_v").alias("_va")), "a")
        .join(e.select(F.col(id_col).alias("b"), F.col("_v").alias("_vb")), "b")
    )
    sim = F.round(cosine_col(F.col("_va"), F.col("_vb")), 6)
    return (
        pairs.select("a", "b", sim.alias("sim"))
        .filter(F.col("sim") >= threshold)
    )


def label_centroids(
    embeddings: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    round_to: int = 6,
    flat: bool = False,
) -> DataFrame:
    """Per-label centroid (element-wise mean) → (label, n_vecs, centroid).

    With ``flat=True`` the array re-assembly is skipped and the result is
    one scalar row per dimension — (label, pos, value, n_vecs) — the
    exchange format for cross-engine comparison (array cells are not
    hashable downstream) and for feeding per-dimension consumers; it is
    also one aggregation cheaper than the array form.

    The class-prototype operator: centroids seed IVF quantizers
    (:func:`train_ivf`), label-balance audits, and nearest-class-mean
    classification.  Entirely JVM-side: posexplode → two map-side-
    combinable aggregations → deterministic array re-assembly with
    ``array_sort(collect_list(struct(pos, v)))`` (sorts by position, so
    the result is partitioning-independent).  Aggregation state is
    labels × dim rows and the collect_list is bounded by dim — no Python,
    no driver movement, no skew exposure at any corpus size.

    Per-dimension means are rounded to ``round_to`` before assembly so
    the result is reproducible across engines and partitionings (double
    summation order perturbs only ~1e-15, far inside the rounding).
    """
    ex = embeddings.select(
        F.col(label_col).alias("label"), F.posexplode(vec_col).alias("pos", "v")
    )
    agg = ex.groupBy("label", "pos").agg(F.round(F.avg("v"), round_to).alias("v"))
    n = embeddings.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).alias("n_vecs")
    )
    if flat:
        return agg.join(n, "label").select(
            "label", "pos", F.col("v").alias("value"), "n_vecs"
        )
    cent = agg.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "v"))), lambda s: s["v"]
        ).alias("centroid")
    )
    return n.join(cent, "label")


def embedding_covariance(
    embeddings: DataFrame,
    dim: int,
    vec_col: str = "embedding",
    round_to: int = 9,
) -> DataFrame:
    """Exact population covariance of an embedding column →
    ``(i, j, cov)`` for the upper triangle (i ≤ j) — the input to PCA /
    whitening before ANN indexing.

    Reproducible-numerics contract: per-row coordinate products (and
    coordinates, for the mean) are float32→double widened (exact),
    IEEE-multiplied, rounded to 12 dp and summed as DECIMAL(38,12) —
    partitioning/order can't change the sums; the final
    ``Sxy/n − (Sx/n)(Sy/n)`` combine is three IEEE ops rounded to
    ``round_to``, so DuckDB replays it bit-for-bit.

    Scale shape: one scan explodes d(d+1)/2 product cells per row into
    a partial+final HashAggregate over ≤ d² keys (bounded state; for
    d=64 that is 2080 reducer keys regardless of corpus size).  At
    extreme corpus×dim the documented swap is Arrow-batch partials
    (numpy ``X.T @ X`` per batch, like the IVF trainer) — same plan
    shape, float tolerance instead of exactness.
    """
    v = F.col(vec_col)
    rows = embeddings.filter(v.isNotNull() & (F.size(v) == dim))

    def el(i):
        return F.element_at(v, (i + F.lit(1)).cast("int")).cast("double")

    idx = F.sequence(F.lit(0), F.lit(dim - 1))
    pairs = F.flatten(F.transform(idx, lambda i: F.transform(
        F.sequence(i, F.lit(dim - 1)),
        lambda j: F.struct(
            i.cast("int").alias("i"),
            j.cast("int").alias("j"),
            F.round(el(i) * el(j), 12).cast("decimal(38,12)").alias("p"),
        ),
    )))
    sxy = (
        rows.select(F.explode(pairs).alias("e"))
        .select("e.i", "e.j", "e.p")
        .groupBy("i", "j")
        .agg(F.sum("p").alias("sxy"))
    )
    sx = (
        rows.select(F.posexplode(v).alias("i", "x"))
        .select(
            "i",
            F.round(F.col("x").cast("double"), 12)
            .cast("decimal(38,12)").alias("x"),
        )
        .groupBy("i")
        .agg(F.sum("x").alias("sx"))
    )
    n = rows.agg(F.count(F.lit(1)).cast("double").alias("_n"))
    si = sx.select(F.col("i").alias("_ki"), F.col("sx").alias("sxi"))
    sj = sx.select(F.col("i").alias("_kj"), F.col("sx").alias("sxj"))
    return (
        sxy.join(F.broadcast(si), sxy["i"] == si["_ki"])
        .join(F.broadcast(sj), sxy["j"] == sj["_kj"])
        .crossJoin(F.broadcast(n))
        .select(
            "i", "j",
            F.round(
                F.col("sxy").cast("double") / F.col("_n")
                - (F.col("sxi").cast("double") / F.col("_n"))
                * (F.col("sxj").cast("double") / F.col("_n")),
                round_to,
            ).alias("cov"),
        )
    )


def pca_model(
    embeddings: DataFrame,
    dim: int,
    k: int,
    vec_col: str = "embedding",
) -> dict:
    """Fit a PCA model from the exact covariance: returns
    ``{"mean": [d], "components": [k][d], "variances": [k]}`` with
    components ordered by descending eigenvalue and sign-fixed (largest
    |coordinate| positive) for determinism.

    Driver-side work is one bounded collect of d(d+1)/2 covariance
    cells + a d×d ``eigh`` — the same "train small, apply wide"
    contract as the IVF/PQ trainers (ann.py k-means); the corpus-wide
    pass is the distributed covariance aggregate.
    """
    if not 1 <= k <= dim:
        raise ValueError("k must be in [1, dim]")
    cov_rows = embedding_covariance(
        embeddings, dim, vec_col, round_to=12
    ).collect()
    cov = np.zeros((dim, dim))
    for r in cov_rows:
        cov[r.i, r.j] = cov[r.j, r.i] = r.cov
    sx = (
        embeddings.filter(
            F.col(vec_col).isNotNull() & (F.size(vec_col) == dim)
        )
        .select(F.posexplode(vec_col).alias("i", "x"))
        .groupBy("i")
        .agg(F.avg(F.col("x").cast("double")).alias("m"))
        .collect()
    )
    mean = np.zeros(dim)
    for r in sx:
        mean[r.i] = r.m
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T  # k × d
    for c in comps:  # deterministic sign: largest-|coord| positive
        amax = int(np.argmax(np.abs(c)))
        if c[amax] < 0:
            c *= -1.0
    return {
        "mean": mean.tolist(),
        "components": comps.tolist(),
        "variances": [float(vals[o]) for o in order],
    }


def pca_project(
    embeddings: DataFrame,
    model: dict,
    vec_col: str = "embedding",
    out_col: str = "pca",
    whiten: bool = False,
    eps: float = 1e-9,
) -> DataFrame:
    """Project embeddings onto a :func:`pca_model` → ``out_col`` as
    ``array<double>`` of length k.  ``whiten=True`` scales each
    component by 1/√variance (unit-variance output — the standard
    prep before cosine/L2 ANN).

    Arrow-batched pandas UDF doing one numpy matmul per batch; each
    output row depends only on its input row, so results are
    batch- and partitioning-exact.  The model ships in the closure
    (k×d doubles — KBs)."""
    from pyspark.sql.types import ArrayType, DoubleType
    from pyspark.sql.functions import pandas_udf

    mean = np.asarray(model["mean"], dtype=np.float64)
    comps = np.asarray(model["components"], dtype=np.float64)
    if whiten:
        scale = 1.0 / np.sqrt(np.maximum(model["variances"], eps))
        comps = comps * scale[:, None]

    def project(s):
        out = []
        for vec in s:
            if vec is None or len(vec) != mean.shape[0]:
                out.append(None)
                continue
            x = np.asarray(vec, dtype=np.float64) - mean
            out.append((comps @ x).tolist())
        return pd.Series(out)

    fn = pandas_udf(project, ArrayType(DoubleType()))
    return embeddings.withColumn(out_col, fn(F.col(vec_col)))

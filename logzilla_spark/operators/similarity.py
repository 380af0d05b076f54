"""Similarity search over embedding columns (training-data pipeline).

Approximate-nearest-neighbor over ``array<float>`` embeddings:

- ``cosine_topk``            : brute-force exact top-k (baseline + recall
                               oracle for the LSH path)
- ``signlsh_buckets``        : deterministic random-hyperplane sign
                               buckets (Charikar '02)
- ``cosine_topk_lsh``        : bucketed ANN with hamming-1 multiprobe
- ``embedding_neardup_lsh``  : near-dup pairs restricted to shared
                               buckets (the scale path for
                               dedup.embedding_neardup_pairs)

All cosine math uses the sequential-fold expression from
``operators.dedup.cosine_expr`` so the DuckDB oracle reproduces the
exact double bits (no float-ordering drift — see that docstring).
Hyperplanes come from ``functions.hashing.hyperplanes`` — md5-derived
±1 literals inlined into BOTH engines' plans, one source of truth.

Scale notes (100 TB / 1000 executors):
- Brute force is O(probes × corpus) — fine only when the probe side is
  small enough to broadcast (we broadcast it explicitly). The corpus
  side streams: no shuffle of the big table at all.
- The LSH path shuffles the corpus ONCE on bucket id (uniform by
  construction — sign bits of random projections), then joins the
  (tiny, broadcast) probe multiprobe set against it. Per-bucket
  candidate lists are bounded; raise ``n_planes`` as the corpus grows
  (buckets ~ corpus/2^planes).
- Top-k per probe is a window over candidates only, never the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from logzilla_spark.functions.caching import persist_tracked
from logzilla_spark.functions.hashing import hyperplanes
from logzilla_spark.operators.dedup import COSINE_THRESHOLD, cosine_expr, dot_expr

N_PLANES = 8
EMB_DIM = 64
DEFAULT_K = 5


def bucket_expr(vec_col: str, n_planes: int = N_PLANES, dim: int = EMB_DIM) -> str:
    """Sign-LSH bucket id: bit j set iff dot(vec, hyperplane_j) >= 0.

    Semantic form: per plane, the pinned left-to-right fold
    ``aggregate(zip_with(vec, plane, (p, q) -> cast(p as double) *
    cast(q as double)), 0.0, (acc, v) -> acc + v)`` with the md5 ±1
    plane literals — an interpreted higher-order expression costing
    ~20us x n_planes per row. Emitted form, bit-identical and
    whole-stage-codegen: the plane values are ±1, so each product is
    an exact sign application (p * 1.0 = p, p * -1.0 = -p, and IEEE
    defines a - b as a + (-b)), letting the dot unroll into a bare
    add/subtract chain over the same left-associative order and 0.0
    seed. The single width guard is exact too: for ANY vector not
    exactly ``dim`` wide (or NULL), zip_with pads with NULLs, every
    plane dot folds to NULL, every ``IF(dot >= 0, bit, 0)`` term
    yields 0 — so the fold's value is the constant 0L the guard's
    else-branch returns (a dim-wide vector containing a NULL element
    takes the unrolled branch, where the NULL propagates to the same
    per-plane 0). Keeping the else-branch a literal instead of the
    fold also keeps the expression tree small enough that Catalyst
    analysis + codegen compile stay off the per-query critical path
    (measured: the guarded fold-fallback form cost ~1.3s of pure
    plan/compile overhead per LSH query at CI scale)."""
    hps = hyperplanes(n_planes, dim)
    terms = []
    for j, hp in enumerate(hps):
        chain = "".join(
            f" {'+' if hp[i - 1] > 0 else '-'} "
            f"cast(element_at({vec_col}, {i}) as double)"
            for i in range(1, int(dim) + 1)
        )
        terms.append(f"IF((cast(0 as double){chain}) >= 0, {1 << j}L, 0L)")
    planes_sum = " + ".join(terms)
    return f"IF(size({vec_col}) = {int(dim)}, {planes_sum}, 0L)"


def signlsh_buckets(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = N_PLANES,
    dim: int = EMB_DIM,
) -> DataFrame:
    """(id, embedding, bucket) — one narrow projection, no shuffle."""
    return emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("embedding"),
        F.expr(bucket_expr(vec_col, n_planes, dim)).alias("bucket"),
    )


def _topk(scored: DataFrame, k: int) -> DataFrame:
    """Deterministic top-k per probe: cosine desc, id asc tiebreak."""
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("probe_id", "neighbor_id", "cosine", "rank")
    )


def cosine_topk(
    emb: DataFrame,
    probes: DataFrame,
    k: int = DEFAULT_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force top-k cosine neighbors for each probe.

    The probe side is broadcast; the corpus side is scanned once with
    no shuffle. Self-matches (same id) are excluded.
    """
    # Self-dots hoisted OUT of the O(probes x corpus) pair loop: each
    # side's norm term is computed once per ROW (identical expression
    # tree -> identical IEEE bits vs the per-pair form, which
    # re-evaluated both self-dots for every pair).
    p = probes.select(
        F.col(id_col).alias("probe_id"), F.col(vec_col).alias("_pe")
    ).withColumn("_pd2", F.expr(dot_expr("_pe", "_pe")))
    c = emb.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_ce")
    ).withColumn("_cd2", F.expr(dot_expr("_ce", "_ce")))
    scored = (
        c.join(F.broadcast(p), F.col("probe_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            F.expr(f"try_divide({dot_expr('_pe', '_ce')}, sqrt(_pd2 * _cd2))"),
        )
        .select("probe_id", "neighbor_id", "cosine")
    )
    return _topk(scored, k)


def cosine_topk_lsh(
    emb: DataFrame,
    probes: DataFrame,
    k: int = DEFAULT_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = N_PLANES,
    dim: int = EMB_DIM,
) -> DataFrame:
    """Approximate top-k: candidates = corpus rows whose sign-LSH bucket
    is within hamming distance 1 of the probe's bucket (multiprobe).

    The corpus is bucketed once (no shuffle — projection only); the
    probe×(1+n_planes) multiprobe key set is broadcast and hash-joined
    against it. Exact cosine is computed for candidates only.
    """
    # Self-dots hoisted out of the candidate loop (the cosine_topk
    # note): per-row norm terms, identical bits by construction.
    cb = signlsh_buckets(emb, id_col, vec_col, n_planes, dim).select(
        F.col("id").alias("neighbor_id"),
        F.col("embedding").alias("_ce"),
        "bucket",
    ).withColumn("_cd2", F.expr(dot_expr("_ce", "_ce", dim)))
    pb = signlsh_buckets(probes, id_col, vec_col, n_planes, dim).select(
        F.col("id").alias("probe_id"),
        F.col("embedding").alias("_pe"),
        F.col("bucket").alias("_pbucket"),
    ).withColumn("_pd2", F.expr(dot_expr("_pe", "_pe", dim)))
    flips = "array(" + ", ".join(
        ["_pbucket"] + [f"_pbucket ^ {1 << j}L" for j in range(n_planes)]
    ) + ")"
    probe_keys = pb.select(
        "probe_id", "_pe", "_pd2", F.explode(F.expr(flips)).alias("bucket")
    )
    scored = (
        cb.join(F.broadcast(probe_keys), "bucket")
        .filter(F.col("probe_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            F.expr(
                f"try_divide({dot_expr('_pe', '_ce', dim)}, sqrt(_pd2 * _cd2))"
            ),
        )
        .select("probe_id", "neighbor_id", "cosine")
        .distinct()
    )
    return _topk(scored, k)


def embedding_neardup_lsh(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = COSINE_THRESHOLD,
    n_planes: int = N_PLANES,
    dim: int = EMB_DIM,
) -> DataFrame:
    """Near-dup pairs restricted to same-bucket candidates — the scale
    path for ``dedup.embedding_neardup_pairs`` (which is its recall
    oracle at CI scale). One shuffle on bucket id, exact cosine verify
    inside buckets only."""
    # Self-dots hoisted out of the per-bucket pair loop (the
    # cosine_topk note): one norm term per row, identical bits.
    b = signlsh_buckets(emb, id_col, vec_col, n_planes, dim).withColumn(
        "_d2", F.expr(dot_expr("embedding", "embedding", dim))
    )
    a = b.select(
        F.col("id").alias("vec_a"), F.col("embedding").alias("_ea"),
        F.col("_d2").alias("_da"), "bucket",
    )
    c = b.select(
        F.col("id").alias("vec_b"), F.col("embedding").alias("_eb"),
        F.col("_d2").alias("_db"), "bucket",
    )
    return (
        a.join(c, "bucket")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn(
            "cosine",
            F.expr(
                f"try_divide({dot_expr('_ea', '_eb', dim)}, sqrt(_da * _db))"
            ),
        )
        .filter(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", "cosine")
        .distinct()
    )


# IVF coarse quantization: cells, and how many nearest cells a probe
# searches (nprobe). Raise IVF_CELLS with corpus size (cell occupancy
# ~ corpus / cells); raise IVF_NPROBE for recall.
IVF_CELLS = 16
IVF_NPROBE = 2

# fixed-point scale for k-means centroid means (ivf_train_kmeans /
# pq_train_kmeans): components quantize to floor(v * 2^24) BIGINTs so
# the mean is a pure function of exact integers — order-independent,
# hence bit-portable to the DuckDB twin (see ivf_train_kmeans)
IVF_FP_BITS = 24
_FP_ONE = float(1 << IVF_FP_BITS)


def _fp_quantize(v_col: str):
    """floor(v * 2^IVF_FP_BITS) as BIGINT — both steps exact (the
    multiply is an exponent shift on a float-to-double-widened value,
    floor has no half-rounding ambiguity), so the integer is identical
    in Spark and DuckDB for the same input bits."""
    return F.expr(f"cast(floor({v_col} * {_FP_ONE!r}) as bigint)")


def _fp_mean(fv_col: str):
    """Quantized mean of fixed-point components: floor(sum/n) back at
    float scale. sum is an exact BIGINT (order-independent); the one
    double division and floor are IEEE-deterministic; the final
    division by 2^IVF_FP_BITS is an exact exponent shift."""
    n = F.count(F.lit(1))
    return (
        F.floor(F.sum(fv_col).cast("double") / n).cast("double")
        / F.lit(_FP_ONE)
    )


# Rejected this round (measured): fusing the posexplode -> per-pos
# mean -> regroup pipeline into ONE per-group aggregation with
# 2 x dim statically-widened sum/count aggregates. Bit-identical, one
# less shuffle per Lloyd iteration — but a 129-aggregate
# HashAggregate loses codegen efficiency and measured SLOWER at sf1.0
# (IVF train 6.9s -> 9.7s steady-state, 32 cores). The exploded form
# stays; its per-iteration shuffles carry only k x dim key rows after
# map-side partials.


def ivf_seeds(
    emb: DataFrame,
    n_cells: int = IVF_CELLS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(cell, seed): the ``n_cells`` lowest-id vectors as cell
    centroids — a deterministic coarse quantizer with zero training
    cost, and the k-means init used by :func:`ivf_train_kmeans` (whose
    fixed-point means make the TRAINED quantizer bit-portable too).
    Both keep the IVF plan shape (assign -> invert -> probe nprobe
    cells) exact and oracle-checkable; swap any (cell, seed) frame
    into the functions below.

    The global orderBy+limit runs on k rows only (single tiny task);
    the row_number window is over the k-row result, not the corpus.
    """
    w = Window.orderBy("id")
    return (
        emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("seed"))
        .orderBy("id")
        .limit(int(n_cells))
        .withColumn("cell", (F.row_number().over(w) - 1).cast("int"))
        .select("cell", "seed")
    )


def ivf_assign(
    emb: DataFrame,
    seeds: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, embedding, cell): each vector joins its nearest seed by
    cosine (ties -> lowest cell). The k-row seed table is broadcast, so
    the k candidate rows per vector are co-located and the max_by
    partial aggregation completes map-side: the only shuffle carries
    ONE row per vector. No corpus-sized broadcast, no window over the
    corpus."""
    # Vector self-dot hoisted out of the k-candidate loop; seed
    # self-dots computed once per seed row (identical bits — the
    # cosine_topk note).
    a = (
        emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("embedding"))
        .withColumn("_ed2", F.expr(dot_expr("embedding", "embedding")))
        .crossJoin(
            F.broadcast(
                seeds.withColumn("_sd2", F.expr(dot_expr("seed", "seed")))
            )
        )
        .withColumn(
            "_cos",
            F.expr(
                f"try_divide({dot_expr('embedding', 'seed')}, sqrt(_ed2 * _sd2))"
            ),
        )
    )
    picked = a.groupBy("id").agg(
        F.max_by(
            F.struct("cell", "embedding"),
            F.struct(F.col("_cos"), (-F.col("cell")).alias("_nc")),
        ).alias("_k")
    )
    return picked.select(
        "id",
        F.col("_k.embedding").alias("embedding"),
        F.col("_k.cell").alias("cell"),
    )


def probe_nearest_cells(
    probes: DataFrame,
    seeds: DataFrame,
    nprobe: int = IVF_NPROBE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(probe_id, _pe, cell): each probe's ``nprobe`` nearest cells by
    centroid cosine (ties -> lowest cell). The k-row centroid table is
    broadcast; the row_number window partitions by probe, so it runs
    over the (tiny) probe side only — shared by every IVF-family
    query path and the persisted-index server (operators.ann_index)."""
    # Probe self-dot hoisted out of the k-candidate loop (identical
    # bits — the cosine_topk note).
    pc = (
        probes.select(F.col(id_col).alias("probe_id"), F.col(vec_col).alias("_pe"))
        .withColumn("_pd2", F.expr(dot_expr("_pe", "_pe")))
        .crossJoin(
            F.broadcast(
                seeds.withColumn("_sd2", F.expr(dot_expr("seed", "seed")))
            )
        )
        .withColumn(
            "_cos",
            F.expr(f"try_divide({dot_expr('_pe', 'seed')}, sqrt(_pd2 * _sd2))"),
        )
    )
    wp = Window.partitionBy("probe_id").orderBy(
        F.col("_cos").desc(), F.col("cell").asc()
    )
    return (
        pc.withColumn("_rn", F.row_number().over(wp))
        .filter(F.col("_rn") <= int(nprobe))
        .select("probe_id", "_pe", "cell")
    )


def cosine_topk_ivf(
    emb: DataFrame,
    probes: DataFrame,
    k: int = DEFAULT_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = IVF_CELLS,
    nprobe: int = IVF_NPROBE,
) -> DataFrame:
    """Approximate top-k via IVF: exact cosine only against corpus
    vectors living in each probe's ``nprobe`` nearest cells.

    The corpus is assigned to cells once (one row-per-vector shuffle,
    uniform-ish by seed geometry) and joined on cell id against the
    broadcast probe->cells set. A corpus vector lives in exactly ONE
    cell and a probe's nprobe cells are distinct, so candidate pairs
    are already unique — no distinct needed (unlike the LSH multiprobe
    path). Complements cosine_topk_lsh: IVF buckets adapt to the data
    (seeds come from the corpus), LSH buckets are data-independent.
    """
    seeds = ivf_seeds(emb, n_cells, id_col, vec_col)
    corpus = ivf_assign(emb, seeds, id_col, vec_col).select(
        F.col("id").alias("neighbor_id"),
        F.col("embedding").alias("_ce"),
        "cell",
    ).withColumn("_cd2", F.expr(dot_expr("_ce", "_ce")))
    probe_cells = probe_nearest_cells(
        probes, seeds, nprobe, id_col, vec_col
    ).withColumn("_pd2", F.expr(dot_expr("_pe", "_pe")))
    scored = (
        corpus.join(F.broadcast(probe_cells), "cell")
        .filter(F.col("probe_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            F.expr(f"try_divide({dot_expr('_pe', '_ce')}, sqrt(_pd2 * _cd2))"),
        )
        .select("probe_id", "neighbor_id", "cosine")
    )
    return _topk(scored, k)


IVF_TRAIN_ITERS = 5


def ivf_train_kmeans(
    emb: DataFrame,
    n_cells: int = IVF_CELLS,
    n_iters: int = IVF_TRAIN_ITERS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Trained IVF coarse quantizer: deterministic Lloyd k-means over
    cosine assignment (spherical k-means without the normalization
    step — ivf_assign already scores by cosine, so centroid SCALE never
    changes an assignment). Returns (cell, seed) — a drop-in
    replacement for :func:`ivf_seeds`'s output that adapts cells to
    the data distribution (measured recall uplift:
    BENCH/ANN_RECALL.md).

    Deterministic by construction: init = ivf_seeds (lowest-id
    vectors), a FIXED iteration count (no data-dependent convergence
    test), deterministic tie-breaks in the assignment, and per-cell
    means computed in FIXED-POINT: each component is quantized to
    ``floor(v * 2^IVF_FP_BITS)`` (an exact operation — the multiply is
    an exponent shift, floor has no rounding-mode ambiguity), summed
    as BIGINT (associative/commutative — order-INDEPENDENT, unlike a
    float sum under Spark's partial aggregation), and the quantized
    mean ``floor(sum/n) / 2^IVF_FP_BITS`` is a pure function of exact
    integers. Training is therefore bit-portable across engines and
    the trained query is HASH-gated against the DuckDB twin
    (oracle_dataops.cosine_topk_ivf_trained_sql); recall is graded in
    BENCH/ANN_RECALL.md. Quantization error per component is
    < 2^-IVF_FP_BITS — orders of magnitude below the centroid noise
    floor of k-means itself. Exactness bound: |sum| < 2^53 needs
    fewer than 2^(53-IVF_FP_BITS) ~ 536M vectors per cell (components
    are O(1)); size cells accordingly.

    Scale shape: each iteration is ivf_assign's one-row-per-vector
    shuffle plus a (cell, pos) mean over the exploded corpus —
    corpus×dim rows into a two-phase avg with map-side partials
    (uniform keys: pos is uniform, cells are bounded by the quantizer),
    then a k×dim regroup to rebuild centroid arrays. No corpus-sized
    broadcast, no window over the corpus, no driver-side data moves.
    Empty cells keep their previous centroid (left-join coalesce), so
    k never silently shrinks. The k-row seed frame is lineage-truncated
    every iteration (the CC-loop discipline): ``seeds`` has two
    consumers per round (the assignment and the empty-cell fallback),
    so an untruncated loop would DOUBLE the lazy plan each iteration —
    2^n_iters clones of the corpus scan by the time a consumer runs.
    """
    from logzilla_spark.functions.caching import persist_tracked
    from logzilla_spark.functions.lineage import truncate

    seeds = ivf_seeds(emb, n_cells, id_col, vec_col)
    # every Lloyd iteration re-reads the vector frame (assignment) —
    # persist it ONCE for the loop instead of n_iters parquet scans
    # (tracked: functions/caching.py). Measured NEUTRAL at sf0.1
    # (5.6s -> 5.8s best-of-3, within noise: the toy table scans in
    # ~ms and the loop is stage-latency-bound), but n_iters scans of a
    # production-scale training sample is the term that dominates at
    # 100 TB — the persist is for that regime.
    vecs = persist_tracked(
        emb.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding"))
    )
    for _ in range(int(n_iters)):
        assigned = ivf_assign(vecs, seeds, "vec_id", "embedding")
        dims = assigned.select(
            "cell", F.posexplode("embedding").alias("pos", "v")
        ).select("cell", "pos", _fp_quantize("v").alias("fv"))
        means = dims.groupBy("cell", "pos").agg(_fp_mean("fv").alias("m"))
        new_seeds = means.groupBy("cell").agg(
            F.expr(
                "transform(array_sort(collect_list(struct(pos, m))), s -> s.m)"
            ).alias("seed")
        )
        seeds = truncate(
            seeds.select("cell", F.col("seed").alias("_old"))
            .join(new_seeds, "cell", "left")
            .select("cell", F.coalesce("seed", "_old").alias("seed")),
            None,
        )
    return seeds


def cosine_topk_ivf_trained(
    emb: DataFrame,
    probes: DataFrame,
    k: int = DEFAULT_K,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = IVF_CELLS,
    nprobe: int = IVF_NPROBE,
    n_iters: int = IVF_TRAIN_ITERS,
) -> DataFrame:
    """cosine_topk_ivf with k-means-trained centroids instead of the
    seeded quantizer — same plan shape (assign -> invert -> probe
    nprobe cells), better cell geometry. Hash-gated: fixed-point
    training (ivf_train_kmeans) makes the whole query bit-portable to
    oracle_dataops.cosine_topk_ivf_trained_sql; recall vs the exact
    baseline is quantified in BENCH/ANN_RECALL.md.
    """
    seeds = ivf_train_kmeans(emb, n_cells, n_iters, id_col, vec_col)
    corpus = ivf_assign(emb, seeds, id_col, vec_col).select(
        F.col("id").alias("neighbor_id"),
        F.col("embedding").alias("_ce"),
        "cell",
    ).withColumn("_cd2", F.expr(dot_expr("_ce", "_ce")))
    probe_cells = probe_nearest_cells(
        probes, seeds, nprobe, id_col, vec_col
    ).withColumn("_pd2", F.expr(dot_expr("_pe", "_pe")))
    scored = (
        corpus.join(F.broadcast(probe_cells), "cell")
        .filter(F.col("probe_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            F.expr(f"try_divide({dot_expr('_pe', '_ce')}, sqrt(_pd2 * _cd2))"),
        )
        .select("probe_id", "neighbor_id", "cosine")
    )
    return _topk(scored, k)


# SemDeDup cell-size guard: cells larger than this skip the pairwise
# stage entirely (all members kept) — the MAX_LSH_BUCKET posture: a
# degenerate quantizer (all embeddings identical) must not buy a
# corpus-squared join. Raise n_cells, don't raise the guard.
MAX_SEMDEDUP_CELL = 10_000


def semdedup(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = COSINE_THRESHOLD,
    n_cells: int = IVF_CELLS,
    max_cell: int = MAX_SEMDEDUP_CELL,
    cache_assign: bool = True,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic dedup via embedding
    clusters — assign every vector to its nearest coarse-quantizer
    cell, compare pairs WITHIN a cell only, and for every near-dup
    relation keep the member FARTHEST from the cell centroid (the
    paper's keep-low-centroid-similarity rule: the most atypical
    member carries the most information). A vector is dropped iff some
    same-cell vector y has cosine(x, y) >= ``threshold`` and y wins
    the keep-priority ((centroid_cos ASC, id ASC) — deterministic,
    exact-double comparison, both engines agree bit-for-bit).

    Output: one row per vector — (id, cell, centroid_cos, is_kept).
    Near-dups in DIFFERENT cells survive (the paper's documented
    recall trade; embedding_neardup_lsh is the data-independent
    counterpart whose buckets don't adapt to the data).

    Scale shape: cells come from ``ivf_seeds``/``ivf_assign`` (one
    row-per-vector shuffle; the seed table broadcasts). The pairwise
    stage shuffles on cell id and is quadratic per cell, so cell
    occupancy is the lever: size ``n_cells ~ corpus / target_cell``
    (SemDeDup itself runs k-means with k in the tens of thousands at
    LAION scale). ``max_cell`` guards the degenerate case — oversized
    cells keep all members rather than detonating the join, mirrored
    bit-for-bit in the DuckDB twin.
    """
    seeds = ivf_seeds(emb, n_cells, id_col, vec_col)
    # Self-dot hoisted and CARRIED through the persisted assignment
    # (_d2): the pairwise stage below then pays one unrolled dot per
    # pair instead of three folds — identical bits (cosine_topk note).
    assigned = (
        ivf_assign(emb, seeds, id_col, vec_col)
        .withColumn("_d2", F.expr(dot_expr("embedding", "embedding")))
        .join(
            F.broadcast(
                seeds.withColumn("_sd2", F.expr(dot_expr("seed", "seed")))
            ),
            "cell",
        )
        .withColumn(
            "centroid_cos",
            F.expr(
                f"try_divide({dot_expr('embedding', 'seed')}, sqrt(_d2 * _sd2))"
            ),
        )
        .select("id", "embedding", "cell", "centroid_cos", "_d2")
    )
    # Four consumers (cell sizes, both pair sides, the final flag join)
    # would each recompute the assignment's crossJoin + max_by shuffle
    # — the minhash_lsh_pairs persist rationale verbatim; rows are one
    # embedding + three scalars, MEMORY_AND_DISK spills instead of
    # OOMing, lineage recomputes on executor loss.
    if cache_assign:
        assigned = persist_tracked(assigned)
    sizes = assigned.groupBy("cell").agg(F.count(F.lit(1)).alias("_csz"))
    small = assigned.join(F.broadcast(sizes), "cell").filter(
        F.col("_csz") <= int(max_cell)
    )
    x = small.select(
        F.col("id").alias("_xid"), F.col("embedding").alias("_xe"),
        F.col("centroid_cos").alias("_xc"), F.col("_d2").alias("_xd2"), "cell",
    )
    y = small.select(
        F.col("id").alias("_yid"), F.col("embedding").alias("_ye"),
        F.col("centroid_cos").alias("_yc"), F.col("_d2").alias("_yd2"), "cell",
    )
    dropped = (
        x.join(y, "cell")
        .filter(F.col("_xid") != F.col("_yid"))
        .filter(
            F.expr(
                f"try_divide({dot_expr('_xe', '_ye')}, sqrt(_xd2 * _yd2))"
            )
            >= threshold
        )
        .filter(
            (F.col("_yc") < F.col("_xc"))
            | ((F.col("_yc") == F.col("_xc")) & (F.col("_yid") < F.col("_xid")))
        )
        .select(F.col("_xid").alias("id"))
        .distinct()
        .withColumn("_dropped", F.lit(True))
    )
    return assigned.join(dropped, "id", "left").select(
        "id", "cell", "centroid_cos",
        F.col("_dropped").isNull().alias("is_kept"),
    )


# --------------------------------------------------------------------------
# Product quantization (Jégou, Douze, Schmid, "Product Quantization for
# Nearest Neighbor Search", TPAMI 2011 — public): split the embedding
# into PQ_M subvectors and quantize each against a PQ_KSUB-codeword
# codebook. A float vector (dim x 4 B) becomes PQ_M small ints — the
# compression that makes 100 TB-scale ANN memory-resident (the corpus
# scan for a query touches codes, never raw vectors). Scoring is ADC
# (asymmetric distance computation): per probe, an m x ksub lookup
# table of partial L2^2 distances; a candidate's score is m table
# lookups summed.
#
# Exactness pattern (same as the IVF quantizer above): codebooks are
# SEEDED — subvectors of the ksub lowest-id corpus vectors — so codes
# and ADC scores are bit-reproducible in the DuckDB twin (every fold
# below is a pinned left-to-right aggregate; see dedup.cosine_expr).
# Trained (k-means) codebooks are a deployment swap, exactly like
# ivf_train_kmeans for cells.
# --------------------------------------------------------------------------

PQ_M = 8       # subspaces (dim 64 -> 8-dim subvectors)
PQ_KSUB = 16   # codewords per subspace (codes fit 4 bits; stored int)


def l2sq_expr(a_col: str, b_col: str, dim: int | None = None) -> str:
    """Pinned-order squared-L2 fold — bit-identical in DuckDB (the
    same discipline as ``dedup.cosine_expr``: zip_with then a
    left-to-right aggregate, all doubles).

    ``dim`` enables the dot_expr-style codegen-unrolled fast path
    (guarded on exact array width; identical bits — see
    dedup.dot_expr). PQ callers pass the subvector width dim // m."""
    fold = (
        f"aggregate(zip_with({a_col}, {b_col}, (p, q) -> "
        "(cast(p as double) - cast(q as double)) * "
        "(cast(p as double) - cast(q as double))), "
        "cast(0 as double), (acc, v) -> acc + v)"
    )
    if dim is None:
        return fold
    terms = " + ".join(
        f"(cast(element_at({a_col}, {i}) as double) - "
        f"cast(element_at({b_col}, {i}) as double)) * "
        f"(cast(element_at({a_col}, {i}) as double) - "
        f"cast(element_at({b_col}, {i}) as double))"
        for i in range(1, int(dim) + 1)
    )
    return (
        f"IF(size({a_col}) = {int(dim)} AND size({b_col}) = {int(dim)}, "
        f"(cast(0 as double) + {terms}), {fold})"
    )


def _subvectors(vec_col: str, m: int, dim: int) -> str:
    """array of (sub, subvector) structs — one narrow expression."""
    dsub = dim // m
    return (
        f"transform(sequence(0, {m - 1}), s -> "
        f"named_struct('sub', cast(s as int), "
        f"'sv', slice({vec_col}, s * {dsub} + 1, {dsub})))"
    )


def pq_codebooks_seeded(
    emb: DataFrame,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    dim: int = EMB_DIM,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(sub, code, codeword): codewords are the subvectors of the
    ``ksub`` lowest-id corpus vectors (deterministic; the global
    window runs on ksub rows only, like ivf_seeds)."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    w = Window.orderBy("id")
    base = (
        emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .orderBy("id")
        .limit(int(ksub))
        .withColumn("code", (F.row_number().over(w) - 1).cast("int"))
    )
    return base.select(
        "code", F.explode(F.expr(_subvectors("v", m, dim))).alias("_s")
    ).select(F.col("_s.sub").alias("sub"), "code", F.col("_s.sv").alias("codeword"))


def pq_encode(
    emb: DataFrame,
    codebooks: DataFrame,
    m: int = PQ_M,
    dim: int = EMB_DIM,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, codes array<int>): per subspace, the L2^2-nearest
    codeword (ties -> lowest code).

    Scale shape: the corpus explodes to m rows per vector, joins the
    broadcast (m x ksub)-row codebook, and the argmin is a min_by that
    completes map-side — the only shuffles carry m rows then 1 row per
    vector. No corpus broadcast, no window over the corpus.
    """
    sv = emb.select(
        F.col(id_col).alias("vec_id"),
        F.explode(F.expr(_subvectors(vec_col, m, dim))).alias("_s"),
    ).select("vec_id", F.col("_s.sub").alias("sub"), F.col("_s.sv").alias("sv"))
    scored = sv.join(F.broadcast(codebooks), "sub").withColumn(
        "_d", F.expr(l2sq_expr("sv", "codeword", dim // m))
    )
    picked = scored.groupBy("vec_id", "sub").agg(
        F.min_by("code", F.struct(F.col("_d"), F.col("code"))).alias("code")
    )
    return picked.groupBy("vec_id").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(sub, code))), s -> s.code)"
        ).alias("codes")
    )


# ADC fold over (codes, luts): partial L2^2 per subspace summed
# left-to-right (pinned order -> the DuckDB twin reproduces the exact
# double bits). `luts` is ordered by sub; `codes` is 0-based.
ADC_EXPR = (
    "aggregate(zip_with(codes, luts, (c, l) -> element_at(l, c + 1)), "
    "cast(0 as double), (acc, v) -> acc + v)"
)


def adc_expr(m: int | None = PQ_M) -> str:
    """ADC score with the dot_expr-style codegen fast path: when both
    arrays are exactly ``m`` wide the m lookups are unrolled into a
    left-associative sum (identical bits — same order, same 0.0 seed);
    any other width takes the interpreted fold (ADC_EXPR)."""
    if m is None:
        return ADC_EXPR
    terms = " + ".join(
        f"element_at(element_at(luts, {i}), element_at(codes, {i}) + 1)"
        for i in range(1, int(m) + 1)
    )
    return (
        f"IF(size(codes) = {int(m)} AND size(luts) = {int(m)}, "
        f"(cast(0 as double) + {terms}), {ADC_EXPR})"
    )


def pq_probe_luts(
    probes: DataFrame,
    codebooks: DataFrame,
    m: int = PQ_M,
    dim: int = EMB_DIM,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(probe_id, luts): per-probe ADC lookup tables — for each
    subspace, the L2^2 distance from the probe's subvector to every
    codeword, ordered by code (luts[sub][code]). m x ksub doubles per
    probe: tiny by the probes-are-small contract, always broadcast by
    callers. Shared by pq_topk / pq_topk_ivf / pq_topk_trained and the
    persisted-index server (operators.ann_index)."""
    psv = probes.select(
        F.col(id_col).alias("probe_id"),
        F.explode(F.expr(_subvectors(vec_col, m, dim))).alias("_s"),
    ).select("probe_id", F.col("_s.sub").alias("sub"), F.col("_s.sv").alias("sv"))
    lut_sub = (
        psv.join(F.broadcast(codebooks), "sub")
        .withColumn("_pd", F.expr(l2sq_expr("sv", "codeword", dim // m)))
        .groupBy("probe_id", "sub")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(code, _pd))), s -> s._pd)"
            ).alias("lut")
        )
    )
    return lut_sub.groupBy("probe_id").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(sub, lut))), s -> s.lut)"
        ).alias("luts")
    )


def adc_topk(pairs: DataFrame, k: int = DEFAULT_K, m: int = PQ_M) -> DataFrame:
    """Rank candidate pairs carrying (probe_id, neighbor_id, codes,
    luts) by the ADC fold: smallest summed partial L2^2 wins (adc ASC,
    id ASC tiebreak). The window runs over candidates only."""
    scored = pairs.withColumn("adc", F.expr(adc_expr(m))).select(
        "probe_id", "neighbor_id", "adc"
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.col("adc").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(k))
        .select("probe_id", "neighbor_id", "adc", "rank")
    )


def pq_topk(
    emb: DataFrame,
    probes: DataFrame,
    k: int = DEFAULT_K,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    dim: int = EMB_DIM,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k by ADC over PQ codes: smallest summed partial
    L2^2 wins (rank by adc ASC, id ASC tiebreak).

    The probe LUTs (m x ksub doubles per probe) are broadcast; the
    corpus side is the CODES table — m ints per vector — so the scan
    that serves a query never touches raw embeddings. The adc fold is
    zip_with(codes, luts) ordered by sub, pinned left-to-right, so the
    DuckDB twin reproduces the exact double bits.
    """
    codebooks = pq_codebooks_seeded(emb, m, ksub, dim, id_col, vec_col)
    codes = pq_encode(emb, codebooks, m, dim, id_col, vec_col).select(
        F.col("vec_id").alias("neighbor_id"), "codes"
    )
    luts = pq_probe_luts(probes, codebooks, m, dim, id_col, vec_col)
    pairs = codes.join(
        F.broadcast(luts), F.col("probe_id") != F.col("neighbor_id")
    )
    return adc_topk(pairs, k)


def pq_topk_ivf(
    emb: DataFrame,
    probes: DataFrame,
    k: int = DEFAULT_K,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    dim: int = EMB_DIM,
    n_cells: int = IVF_CELLS,
    nprobe: int = IVF_NPROBE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF x PQ — prune-then-compress, the full-scale ANN shape
    (FAISS's IVFPQ index family, from the public Jégou '11 paper):
    the IVF coarse quantizer restricts candidates to each probe's
    ``nprobe`` nearest cells, and those candidates are scored by ADC
    over PQ codes — the serving scan touches (cell, codes) rows only,
    never raw embeddings.

    Both quantizers are the SEEDED oracle-exact variants (swap in
    ivf_train_kmeans cells / trained codebooks at deployment). At
    100 TB: the corpus is assigned and encoded ONCE (one row per
    vector through each shuffle), the codes table is the only thing a
    query reads, and per-query work is nprobe cells x m lookups per
    candidate.
    """
    seeds = ivf_seeds(emb, n_cells, id_col, vec_col)
    assigned = ivf_assign(emb, seeds, id_col, vec_col).select(
        F.col("id").alias("neighbor_id"), "cell"
    )
    codebooks = pq_codebooks_seeded(emb, m, ksub, dim, id_col, vec_col)
    codes = pq_encode(emb, codebooks, m, dim, id_col, vec_col).select(
        F.col("vec_id").alias("neighbor_id"), "codes"
    )
    corpus = codes.join(assigned, "neighbor_id")

    probe_cells = probe_nearest_cells(probes, seeds, nprobe, id_col, vec_col)
    luts = pq_probe_luts(probes, codebooks, m, dim, id_col, vec_col)
    probe_side = probe_cells.select("probe_id", "cell").join(luts, "probe_id")

    pairs = corpus.join(F.broadcast(probe_side), "cell").filter(
        F.col("probe_id") != F.col("neighbor_id")
    )
    return adc_topk(pairs, k)


PQ_TRAIN_ITERS = 5


def pq_train_kmeans(
    emb: DataFrame,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    dim: int = EMB_DIM,
    n_iters: int = PQ_TRAIN_ITERS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Trained PQ codebooks: deterministic Lloyd k-means run PER
    SUBSPACE, all m subspaces in ONE lineage (the sub column keys the
    aggregations — no per-subspace jobs). Drop-in for
    :func:`pq_codebooks_seeded`'s output; same determinism contract as
    :func:`ivf_train_kmeans` (seeded init, fixed iterations, (d, code)
    tie-breaks) and the same FIXED-POINT means (exact BIGINT sums,
    quantized division — see ivf_train_kmeans), so trained codebooks
    are bit-portable and HASH-gated against the DuckDB twin
    (oracle_dataops.pq_topk_trained_sql) as well as recall-graded.

    Scale shape per iteration: corpus x m rows join the broadcast
    (m x ksub)-row codebook, the argmin min_by completes map-side (one
    row per (vector, sub) crosses the shuffle), then a
    (sub, code, pos) mean over the exploded subvectors — uniform keys,
    two-phase with map-side partials. The codebook frame is
    lineage-truncated every iteration (the CC-loop discipline).
    """
    from logzilla_spark.functions.caching import persist_tracked
    from logzilla_spark.functions.lineage import truncate

    cb = pq_codebooks_seeded(emb, m, ksub, dim, id_col, vec_col)
    sv = persist_tracked(
        emb.select(
            F.col(id_col).alias("vec_id"),
            F.explode(F.expr(_subvectors(vec_col, m, dim))).alias("_s"),
        ).select("vec_id", F.col("_s.sub").alias("sub"), F.col("_s.sv").alias("sv"))
    )
    for _ in range(int(n_iters)):
        assigned = (
            sv.join(F.broadcast(cb), "sub")
            .withColumn("_d", F.expr(l2sq_expr("sv", "codeword", dim // m)))
            .groupBy("vec_id", "sub")
            .agg(
                F.min_by(
                    F.struct("code", "sv"), F.struct(F.col("_d"), F.col("code"))
                ).alias("_k")
            )
            .select("sub", F.col("_k.code").alias("code"), F.col("_k.sv").alias("sv"))
        )
        means = assigned.select(
            "sub", "code", F.posexplode("sv").alias("pos", "v")
        ).select(
            "sub", "code", "pos", _fp_quantize("v").alias("fv")
        ).groupBy("sub", "code", "pos").agg(_fp_mean("fv").alias("m"))
        new_cb = means.groupBy("sub", "code").agg(
            F.expr(
                "transform(array_sort(collect_list(struct(pos, m))), s -> s.m)"
            ).alias("codeword")
        )
        cb = truncate(
            cb.select("sub", "code", F.col("codeword").alias("_old"))
            .join(new_cb, ["sub", "code"], "left")
            .select(
                "sub", "code", F.coalesce("codeword", "_old").alias("codeword")
            ),
            None,
        )
    return cb


def pq_topk_trained(
    emb: DataFrame,
    probes: DataFrame,
    k: int = DEFAULT_K,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    dim: int = EMB_DIM,
    n_iters: int = PQ_TRAIN_ITERS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """pq_topk with k-means-trained codebooks — hash-gated against
    oracle_dataops.pq_topk_trained_sql (fixed-point training, see
    pq_train_kmeans) and recall-graded in BENCH/ANN_RECALL.md."""
    codebooks = pq_train_kmeans(emb, m, ksub, dim, n_iters, id_col, vec_col)
    codes = pq_encode(emb, codebooks, m, dim, id_col, vec_col).select(
        F.col("vec_id").alias("neighbor_id"), "codes"
    )
    luts = pq_probe_luts(probes, codebooks, m, dim, id_col, vec_col)
    pairs = codes.join(
        F.broadcast(luts), F.col("probe_id") != F.col("neighbor_id")
    )
    return adc_topk(pairs, k)

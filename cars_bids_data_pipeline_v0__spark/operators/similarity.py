"""Similarity search over embedding columns (``array<float>``).

Two tiers, mirroring how ANN is deployed on real clusters:

* **brute-force cosine top-k** — exact; a broadcast of the (small) query
  set against the full corpus: one scan, no shuffle until the final
  per-query top-k window.  The correctness baseline.
* **random-hyperplane LSH** — the scale path: sign-bit signatures bucket
  the corpus; candidates come from equality joins on (table, bucket);
  exact cosine re-ranks the candidates.  Probes = extra signatures per
  query trade recall for fan-out.  An IVF variant would swap the bucket
  function for nearest-centroid assignment; the plumbing is identical.

All expressions are native (`zip_with`/`aggregate`); embeddings are cast to
double before any arithmetic so results are bit-stable across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..cache import track


def as_double(v: Column | str) -> Column:
    col = F.col(v) if isinstance(v, str) else v
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    ``queries`` is expected to be small (it is broadcast); the corpus is
    scanned once.  Ties broken by corpus id for determinism.  Returns
    ``(q_id, vec_id, cosine_sim, rank)``.
    """
    from .dedup_docs import fan_out

    q = queries.select(F.col(q_id).alias("__qid"), as_double(q_vec).alias("__qv"))
    c = fan_out(corpus).select(
        F.col(c_id).alias("__cid"), as_double(c_vec).alias("__cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .select(
            F.col("__qid").alias(q_id),
            F.col("__cid").alias(c_id),
            F.round(cosine(F.col("__qv"), F.col("__cv")), 6).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy(q_id).orderBy(
        F.col("cosine_sim").desc(), F.col(c_id).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# ---------------------------------------------------------------------------
# random-hyperplane LSH
# ---------------------------------------------------------------------------


def _plane_sign(dim: int, plane: int, salt: str, j: int) -> int:
    """Deterministic Rademacher (±1) hyperplane component sign for
    (salt, plane, component j) — the sign bit of a sha256-derived 64-bit
    value.  Stable across sessions — no RNG state.  ±1 components are the
    standard sign-random-projection LSH family (collision probability
    ≈ 1 - θ/π, same as Gaussian planes)."""
    import hashlib

    h = hashlib.sha256(f"{salt}:{plane}:{j}".encode()).digest()
    v = int.from_bytes(h[:8], "big", signed=True)
    return 1 if v >= 0 else -1


def _plane_signs(dim: int, plane: int, salt: str) -> list[float]:
    """One plane's ±1.0 components — used by oracle-SQL twins that inline
    the planes so a second engine can recompute the identical buckets."""
    return [float(_plane_sign(dim, plane, salt, j)) for j in range(dim)]


def _sign_masks(dim: int, num_planes: int, salt: str) -> list[int]:
    """Per-COMPONENT bit masks: bit p of ``masks[j]`` is 1 iff plane p's
    component j is +1.  Packing the plane matrix column-wise means the
    Spark plan carries ``dim`` long literals instead of
    ``num_planes × dim`` float literals — the round-2 q55 planning
    blow-up (25.9 s compile at sf0.01) was exactly that literal
    explosion."""
    masks = []
    for j in range(dim):
        m = 0
        for p in range(num_planes):
            if _plane_sign(dim, p, salt, j) > 0:
                m |= 1 << p
        masks.append(m)
    return masks


def hyperplane_signature(
    vec: Column | str, dim: int, num_planes: int = 16, salt: str = "rhp"
) -> Column:
    """``num_planes`` sign bits packed into a long: bit p = 1 iff
    vec · plane_p ≥ 0, with ±1 plane components.

    ONE fold over the vector computes all plane dot-products at once
    (accumulator = array of ``num_planes`` running sums; component j adds
    ``±v[j]`` to each, signs unpacked from a per-component bit mask with
    ``getbit``).  Expression size is O(dim) literals + O(1) machinery —
    independent of num_planes — vs the previous O(num_planes × dim)
    literal inlining whose Catalyst compile cost dominated runtime (the
    round-2 q55 25.9 s outlier).  The whole expression is built as one
    SQL string parsed JVM-side: constructing it with nested Column
    lambdas costs thousands of py4j round-trips per call site.

    ``vec`` may be a column name (fast path) or a Column expression.
    """
    if not isinstance(vec, str):
        # Column path: wrap via a SQL fragment over a transformed alias is
        # impossible without a name, so fall back to the string builder on
        # the column's SQL form.  Callers on hot paths pass names.
        vec_sql = vec._jc.toString() if hasattr(vec, "_jc") else str(vec)
    else:
        vec_sql = f"`{vec}`"
    masks_sql = ",".join(f"{m}L" for m in _sign_masks(dim, num_planes, salt))
    last = num_planes - 1
    # index-order fold: sum order matches the oracle's list_dot_product so
    # the (never observed, but theoretically possible) sum==0 sign tie
    # breaks identically in both engines
    sums = (
        f"aggregate("
        f"zip_with(transform({vec_sql}, x -> cast(x as double)),"
        f" array({masks_sql}), (x, m) -> named_struct('x', x, 'm', m)),"
        f" array_repeat(cast(0.0 as double), {num_planes}),"
        f" (acc, s) -> zip_with(acc, sequence(0, {last}),"
        f" (a, p) -> a + case when getbit(s.m, p) = 1 then s.x else -s.x end)"
        f")"
    )
    sig = (
        f"aggregate("
        f"zip_with({sums}, sequence(0, {last}),"
        f" (sm, p) -> named_struct('s', sm, 'p', p)),"
        f" cast(0 as bigint),"
        f" (acc, sp) -> acc + case when sp.s >= 0"
        f" then cast(pow(cast(2.0 as double), sp.p) as bigint)"
        f" else cast(0 as bigint) end"
        f")"
    )
    return F.expr(sig)


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    dim: int,
    k: int = 10,
    num_planes: int = 12,
    num_tables: int = 4,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates from ``num_tables`` independent
    hyperplane-LSH bucketings, re-ranked by exact cosine.

    Per table the corpus groups by a ``num_planes``-bit bucket (expected
    bucket size = N / 2^planes); only matching buckets join.  Recall grows
    with num_tables at linear cost.  Same output schema as `cosine_topk`.

    Tuning: P[two vectors agree on one plane] = 1 - θ/π.  For *near-dup*
    targets (cos ≥ 0.95, θ ≤ 18°) many planes are fine; for general top-k
    where the true neighbors may only reach cos ≈ 0.5 (θ ≈ 60°, p ≈ 0.66),
    use FEW planes and MANY tables (e.g. 4 planes × 16 tables → per-pair
    recall ≈ 1-(1-0.19)^16 ≈ 0.97) — otherwise buckets are precise but the
    neighbors you want never collide.
    """
    q = queries.select(F.col(q_id).alias("__qid"), as_double(q_vec).alias("__qv"))
    c = corpus.select(F.col(c_id).alias("__cid"), as_double(c_vec).alias("__cv"))

    def with_buckets(df, vec_col):
        return df.select(
            "*",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("table"),
                            hyperplane_signature(
                                vec_col, dim, num_planes, salt=f"t{t}"
                            ).alias("bucket"),
                        )
                        for t in range(num_tables)
                    ]
                )
            ).alias("tb"),
        ).select(*df.columns, "tb.table", "tb.bucket")

    cq = with_buckets(q, "__qv")
    cc = with_buckets(c, "__cv")
    cands = (
        cc.join(F.broadcast(cq), on=["table", "bucket"])
        .select("__qid", "__cid", "__qv", "__cv")
        .dropDuplicates(["__qid", "__cid"])
    )
    scored = cands.select(
        F.col("__qid").alias(q_id),
        F.col("__cid").alias(c_id),
        F.round(cosine(F.col("__qv"), F.col("__cv")), 6).alias("cosine_sim"),
    )
    w = Window.partitionBy(q_id).orderBy(
        F.col("cosine_sim").desc(), F.col(c_id).asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — centroid-bucketed scale path
# ---------------------------------------------------------------------------


def _centroid_lit(centroids: list[list[float]]) -> Column:
    """The centroid table as ONE literal array column — nearest-centroid
    assignment is then a per-row fold (O(nlist·dim) expression work, no
    row amplification, no shuffle).  At 100 TB this is the property that
    matters: the corpus is scanned once and each row does constant work
    against a broadcast-literal codebook."""
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("cid"),
                F.array(*[F.lit(float(x)) for x in c]).alias("cv"),
            )
            for i, c in enumerate(centroids)
        ]
    )


def nearest_centroid_ids(v: Column, centroids: list[list[float]], nprobe: int) -> Column:
    """ids of the ``nprobe`` centroids nearest to ``v`` by cosine
    (ties broken by centroid id — deterministic)."""
    scored = F.transform(
        _centroid_lit(centroids),
        lambda c: F.struct(
            (-cosine(v, c["cv"])).alias("neg_sim"), c["cid"].alias("cid")
        ),
    )
    ranked = F.transform(F.array_sort(scored), lambda s: s["cid"])
    return F.slice(ranked, 1, nprobe)


def kmeans_centroids(
    corpus: DataFrame,
    nlist: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic k-means codebook for IVF.

    Seeds = the ``nlist`` corpus vectors with smallest ``xxhash64(id)``
    (stable pseudo-random sample, no RNG state).  Each Lloyd iteration is
    fully distributed: assign (per-row fold over the literal codebook) →
    per-component mean via posexplode + groupBy.  Only nlist·dim scalars
    ever reach the driver.
    """
    base = corpus.select(F.col(id_col).alias("id"), as_double(vec_col).alias("v"))
    seeds = (
        base.withColumn("h", F.xxhash64(F.col("id")))
        .orderBy("h", "id")
        .limit(nlist)
        .select("v")
        .collect()
    )
    centroids = [list(r.v) for r in seeds]
    for _ in range(iters):
        assigned = base.select(
            nearest_centroid_ids(F.col("v"), centroids, 1)[0].alias("cid"), "v"
        )
        rows = (
            assigned.select("cid", F.posexplode("v").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("cv")
            )
            .collect()
        )
        new = {r.cid: list(r.cv) for r in rows}
        # empty cells keep their previous centroid (standard Lloyd handling)
        centroids = [new.get(i, centroids[i]) for i in range(nlist)]
    return centroids


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    iters: int = 2,
    centroids: list[list[float]] | None = None,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
    exclude_self: bool = False,
) -> DataFrame:
    """IVF-flat approximate top-k: corpus rows live in their nearest-centroid
    cell; each query probes its ``nprobe`` nearest cells and exact cosine
    re-ranks the candidates.

    ``nprobe == nlist`` degenerates to exact brute force (every cell
    probed) — that mode is oracle-checked; recall at nprobe < nlist is
    pinned in tests/test_extensions.py.  At scale the cell assignment is a
    narrow map over the scan and the candidate join shuffles only
    |corpus|·nprobe/nlist rows instead of |corpus|·|queries|.
    Same output schema as `cosine_topk`.

    In the exact mode (``nprobe >= nlist``) every (query, corpus) pair is
    scored regardless of cells, so k-means is skipped entirely: the
    un-exploded query table is broadcast once and the fanned-out corpus
    scan streams against it (the q54 brute-force shape plus
    ``exclude_self``).  Replicating queries per cell first would inflate
    the broadcast payload ``nlist``-fold for zero extra parallelism —
    the broadcast already reaches every task.  Results are bit-identical
    either way.
    """
    from .dedup_docs import fan_out

    exact = nprobe >= nlist
    if not exact and centroids is None:
        centroids = kmeans_centroids(
            corpus, nlist=nlist, iters=iters, id_col=c_id, vec_col=c_vec
        )
    c = fan_out(corpus).select(
        F.col(c_id).alias("__cid"), as_double(c_vec).alias("__cv")
    )
    q = queries.select(F.col(q_id).alias("__qid"), as_double(q_vec).alias("__qv"))
    if exact:
        joined = c.crossJoin(F.broadcast(q))
    else:
        c = c.withColumn(
            "cell", nearest_centroid_ids(F.col("__cv"), centroids, 1)[0]
        )
        q = q.withColumn(
            "cell",
            F.explode(nearest_centroid_ids(F.col("__qv"), centroids, nprobe)),
        )
        joined = c.join(F.broadcast(q), on="cell")
    if exclude_self:
        # kNN-of-the-corpus-itself mode (label-error mining): drop the
        # q==c pair BEFORE the per-query window so top-k semantics match
        # a "neighbors other than me" oracle exactly.
        joined = joined.filter(F.col("__qid") != F.col("__cid"))
    # No dedup needed: a corpus row lives in exactly one cell and
    # nearest_centroid_ids returns distinct cells, so each (q, c) pair
    # appears at most once — a dropDuplicates here would be a pure extra
    # shuffle of the full scored pair set.
    scored = joined.select(
        F.col("__qid").alias(q_id),
        F.col("__cid").alias(c_id),
        F.round(cosine(F.col("__qv"), F.col("__cv")), 6).alias("cosine_sim"),
    )
    w = Window.partitionBy(q_id).orderBy(F.col("cosine_sim").desc(), F.col(c_id).asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 10,
    num_tables: int = 6,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine ≥
    threshold) via hyperplane-LSH blocking + exact verify — the semantic
    sibling of `minhash_lsh_dedup`."""
    c = df.select(F.col(id_col).alias("id"), as_double(vec_col).alias("v"))
    buckets = c.select(
        "id", "v",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("table"),
                        hyperplane_signature(
                            "v", dim, num_planes, salt=f"nd{t}"
                        ).alias("bucket"),
                    )
                    for t in range(num_tables)
                ]
            )
        ).alias("tb"),
    ).select("id", "v", "tb.table", "tb.bucket")
    # the self-join below reads `buckets` twice; without a persist each
    # side recomputes every signature (2× the fold work and 2× codegen)
    buckets = track(buckets.persist())
    return (
        buckets.alias("x")
        .join(buckets.alias("y"), on=["table", "bucket"])
        .filter(F.col("x.id") < F.col("y.id"))
        .select(
            F.col("x.id").alias("id_a"),
            F.col("y.id").alias("id_b"),
            F.col("x.v").alias("va"),
            F.col("y.v").alias("vb"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("cosine_sim", F.round(cosine(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cosine_sim") >= threshold)
        .select("id_a", "id_b", "cosine_sim")
    )


def kcenter_traverse(
    e: DataFrame, k: int, batch: int = 1, alpha: float = 0.5
) -> list[tuple]:
    """Greedy k-center / farthest-point traversal (Sener 2018 core-sets,
    the classic 2-approximation): seed = lowest id, then k-1 rounds of
    "the point farthest from every chosen center".  Returns
    ``[(step, vec_id, sq_dist_at_selection | None, vector)]``.

    ``e`` must have columns ``vec_id`` and ``v`` (array<double>).
    Inherently sequential in k, so each round is ONE bounded argmax
    aggregate back to the driver (min(struct(-dist, id, vec)) — the
    q266 centroid-fetch .collect() class) while all distance math stays
    distributed.  The per-point min distance is maintained as a RUNNING
    column across rounds (persisted; ``least(md, <dist to the newest
    center>)`` — exactly the nested-least chain the q277/q281 oracles
    unroll), so each round evaluates ONE 64-element fold per point, not
    s of them: the naive least-of-all-centers form re-evaluated
    ``<v,v>`` per center term and cost O(k²) interpreted HOF folds —
    measured 122 s vs 10.6 s for k=32 over 20k×64d (~0.33 s/round,
    the bounded-aggregate job floor — the BPE batch=1 analogy).  ``<v,v>`` is
    projected once up front and ``<c,c>`` folds on the driver (same
    left-to-right order as the in-plan fold, so the identity
    ``<v,v> - 2<v,c> + <c,c>`` stays bit-equal to the oracle's).
    Driver traffic is k rows; the corpus is scanned once per round.

    ``batch > 1`` amortizes the ~0.33 s/round job floor the same way
    q266's symbol-disjoint BPE batching did (round-10 VERDICT
    directive 2): each round takes the top-``batch`` points by current
    distance in ONE bounded TakeOrdered (batch rows to the driver —
    the same bounded-collect class as the argmax), then a driver-side
    greedy prune accepts candidates far from both the existing centers
    AND each other: candidate c is accepted iff
    ``min(md(c), min_dist²(c, accepted-this-round)) ≥ alpha² · dmax²``
    where dmax² is the round's global max (so the FIRST accepted point
    is exactly the sequential pick).  Every accepted center therefore
    sits ≥ alpha·R from all other centers and the final uncovered
    radius R, and the Gonzalez pigeonhole gives a (2/alpha)-approx
    (alpha=0.5 → 4-approx guaranteed; near-sequential in practice —
    see tests/test_similarity_r11.py's constructed geometries).  The
    running-min update folds ALL the round's accepted centers in ONE
    projection (``least(md, d₁..dₘ)``), so a k=256/batch=16 run pays
    16 job round-trips, not 256.  ``batch=1`` is byte-identical to the
    sequential path (the oracled q277/q281 shape).  Driver-side
    candidate pruning does O(batch²·dim) float ops — trivial for
    batch ≤ 1024."""
    # alpha > 1 makes the acceptance threshold alpha²·dmax² exceed even
    # the round's OWN maximum, so no candidate (not even the sequential
    # pick) is ever accepted and `while len(centers) < k` spins forever
    # — refuse up front rather than burn Spark jobs with no progress
    if not (0.0 < alpha <= 1.0):
        raise ValueError(
            f"alpha must be in (0, 1] (got {alpha}): it scales the "
            "batch-acceptance threshold alpha^2 * dmax^2, and above 1 "
            "no candidate can ever pass it"
        )
    # a coreset source is often one small parquet file → 1 input split;
    # every round would then run on ONE core.  Spread it once up front
    # (row-wise math is partitioning-invariant, argmax/TakeOrdered stay
    # deterministic via the vec_id tiebreak), sized ~4k rows/partition
    # so a small corpus is not shattered into per-round multi-task
    # scheduling overhead (k rounds of 32-task jobs on 20k rows
    # measured SLOWER than 1 task — the per-round compute is ms; the
    # spread matters for the 100k×high-dim single-file case).  The
    # sizing count only ever runs on a few-split input, never an
    # at-scale table (those already exceed defaultParallelism and
    # short-circuit).
    spread = e.sparkSession.sparkContext.defaultParallelism
    nparts = e.rdd.getNumPartitions()
    if nparts < spread:
        want = min(spread, max(1, e.count() // 4096))
        if want > nparts:
            e = e.repartition(want)
    vv = dot(F.col("v"), F.col("v"))
    cur = e.select("vec_id", "v", vv.alias("__vv"))

    def dist_to(center: list[float]) -> Column:
        # HOF fold, NOT unrolled per-element arithmetic: an unrolled
        # ``Σ v[i]·cᵢ`` is whole-stage-codegen'd, and because each
        # round's center literals differ, EVERY round pays a fresh
        # Janino class compile (~0.5 s) — measured 2.4× on the whole
        # sequential traversal (k=32: 12 → 30 s).  The HOF fold is
        # interpreted (CodegenFallback): slightly slower per row, zero
        # compiles, and bit-identical values.
        c = F.array(*[F.lit(float(x)) for x in center])
        cc = 0.0
        for x in center:  # left fold — the in-plan accumulation order
            cc = cc + float(x) * float(x)
        return F.col("__vv") - 2 * dot(F.col("v"), c) + F.lit(cc)

    seed = cur.orderBy("vec_id").select("vec_id", "v").first()
    centers: list[tuple] = [(1, int(seed["vec_id"]), None, list(seed["v"]))]
    cur = cur.select("vec_id", "v", "__vv", dist_to(centers[0][3]).alias("__md"))
    prev_persisted = None
    seq_round = 0
    while len(centers) < k:
        persisted_this_round = False
        if batch <= 1:
            # lazy persist: ONE job per round (the argmax materializes
            # the cache) — but the logical plan still chains every
            # round's projection, and the serialized task binary grows
            # ~10–90 KB/round until the driver heap dies (measured OOM
            # at k=64 on 20k rows, 8 GiB heap).  Every 8th round an
            # eager localCheckpoint truncates the lineage to a
            # LogicalRDD: plan depth stays ≤ 8 for ~1 extra job per 8
            # rounds (checkpointing EVERY round measured 2× on k=32).
            seq_round += 1
            if seq_round % 8 == 0:
                cur = cur.localCheckpoint(eager=True)
                if prev_persisted is not None:
                    prev_persisted.unpersist(blocking=False)
                    prev_persisted = None
            else:
                cur = track(cur.persist())
                persisted_this_round = True
        else:
            # localCheckpoint, not persist: persist() caches DATA but
            # the logical plan still chains every prior round's
            # projection, so plan size (and driver analysis + task
            # binaries) grows O(round) → O(k²) total — measured OOM at
            # k=256/batch=16 with unrolled distance expressions.
            # Eager localCheckpoint truncates the lineage to a
            # LogicalRDD each round (it costs a second job per round,
            # which is why the batch=1 path keeps lazy persist:
            # measured k=32 sequential 10.6 → 24 s under per-round
            # checkpoints).  Losing replayability is safe HERE because
            # ``__md`` is a pure function of (e, centers-so-far):
            # recovery after executor loss is one rebuild of the
            # distance column from the driver's center list, not a
            # lineage replay.
            cur = cur.localCheckpoint(eager=True)
        if batch <= 1:
            row = (
                cur.agg(
                    F.min(
                        F.struct(
                            (-F.col("__md")).alias("nd"),
                            F.col("vec_id").alias("vec_id"),
                            F.col("v").alias("v"),
                        )
                    ).alias("m")
                )
                .select("m.nd", "m.vec_id", "m.v")
                .first()
            )
            accepted = [(int(row["vec_id"]), float(-row["nd"]), list(row["v"]))]
            if persisted_this_round:
                if prev_persisted is not None:
                    prev_persisted.unpersist(blocking=False)
                prev_persisted = cur
        else:
            rows = (
                cur.orderBy(F.col("__md").desc(), F.col("vec_id").asc())
                .select("vec_id", "__md", "v")
                .limit(min(batch, k - len(centers)))
                .collect()
            )
            if not rows:
                break
            thresh = (alpha * alpha) * float(rows[0]["__md"])
            accepted = []
            for r in rows:
                eff = float(r["__md"])
                rv = r["v"]
                for _, _, av in accepted:
                    d2 = 0.0
                    for x, y in zip(rv, av):
                        d = x - y
                        d2 += d * d
                    if d2 < eff:
                        eff = d2
                        if eff < thresh:
                            break
                if eff >= thresh:
                    accepted.append((int(r["vec_id"]), eff, list(rv)))
        for cid, eff, cv in accepted:
            centers.append((len(centers) + 1, cid, eff, cv))
        if len(accepted) == 1:
            upd = F.least(F.col("__md"), dist_to(accepted[0][2]))
        else:
            # m new centers in ONE compact fold over an array-of-structs
            # literal: m unrolled distance expressions made the
            # projection O(m·dim) expression NODES, which at batch=64
            # overflowed Janino's method limits (codegen compile
            # failure → interpreted fallback of a giant tree).  The
            # fold keeps the tree O(m) literals + one lambda; eval is
            # the same m·dim multiplies.  `least` is an exact min, so
            # fold order can't change the value.
            def _cc(c: list[float]) -> float:
                acc = 0.0
                for x in c:
                    acc = acc + float(x) * float(x)
                return acc

            pairs = F.array(
                *[
                    F.struct(
                        F.array(
                            *[F.lit(float(x)) for x in cv]
                        ).alias("c"),
                        F.lit(_cc(cv)).alias("cc"),
                    )
                    for _, _, cv in accepted
                ]
            )
            upd = F.aggregate(
                pairs,
                F.col("__md"),
                lambda acc, p: F.least(
                    acc,
                    F.col("__vv") - 2 * dot(F.col("v"), p["c"]) + p["cc"],
                ),
            )
        # batched rounds' checkpointed blocks (MEMORY_AND_DISK) are
        # dropped by the ContextCleaner once the next checkpoint
        # materializes and the old frame goes unreferenced
        cur = cur.select("vec_id", "v", "__vv", upd.alias("__md"))
    if prev_persisted is not None:
        prev_persisted.unpersist(blocking=False)
    return centers

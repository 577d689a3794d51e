"""Product quantization (PQ) for embedding columns — the compression tier
of the similarity-search stack (operators/similarity.py).

The reference has no vector path at all; at training-data scale the corpus
embedding table is often too large to scan as raw floats.  PQ splits each
D-dim vector into M subvectors, snaps each subvector to its nearest entry
in a per-subspace codebook of K codewords, and stores only the M small
codes (M bytes at K ≤ 256 vs 4·D bytes of float32 — 32× for D=64, M=8).
Search uses asymmetric distance computation (ADC): per query, one
O(M·K·D/M) table of subspace dot products is built ONCE, then every
corpus row is scored with M table lookups instead of a D-length dot.

Scale shape: encoding is a narrow map over the corpus scan (no shuffle);
codebooks travel as broadcast literals; ADC scoring is a broadcast join of
the (small) query set against the code table, with the per-row work O(M).
Only the final per-query top-k ranks shuffle.  Jégou et al., "Product
Quantization for Nearest Neighbor Search", IEEE TPAMI 2011.

Two codebook sources:

* :func:`pq_codebooks_random` — deterministic sha256-derived codewords
  (no RNG state, no data dependence).  Lower recall than trained
  codebooks but exactly reproducible anywhere — the oracle-checked query
  (q95) inlines these very floats into its DuckDB twin.
* :func:`pq_train` — distributed per-subspace Lloyd iterations; all M
  subspaces train in the same Spark jobs (explode → assign → per-cell
  mean), so job count is independent of M.
"""

from __future__ import annotations

import hashlib
import struct

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .similarity import as_double, dot, l2_norm

Codebooks = list[list[list[float]]]  # [m][k][component]


def _unit_interval(salt: str, *idx: int) -> float:
    """Deterministic float in [-1, 1) from a sha256 of (salt, *idx)."""
    h = hashlib.sha256(
        (salt + ":" + ":".join(str(i) for i in idx)).encode()
    ).digest()
    (u,) = struct.unpack(">Q", h[:8])
    return (u / 2**63) - 1.0


def pq_codebooks_random(
    dim: int, m: int, k: int, salt: str = "pq"
) -> Codebooks:
    """Data-independent codebooks: K unit-scaled pseudo-random codewords
    per subspace.  Same floats on every machine and engine."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    ds = dim // m
    return [
        [
            [_unit_interval(salt, mi, ki, d) for d in range(ds)]
            for ki in range(k)
        ]
        for mi in range(m)
    ]


def _codebook_lit(codebooks: Codebooks) -> Column:
    """[m][k][component] as one nested literal array column."""
    return F.array(
        *[
            F.array(
                *[
                    F.array(*[F.lit(float(x)) for x in code])
                    for code in sub
                ]
            )
            for sub in codebooks
        ]
    )


def _subvectors(v: Column, m: int, ds: int) -> Column:
    """Split a vector column into the array of its m subvectors.

    ``v`` is let-bound through a single-element ``transform`` so the
    inner lambda's ``slice`` reads a bound variable — inlining ``v``
    (usually a cast-transform chain) into the lambda body re-evaluates
    it once per subvector (the word_shingles round-10 fix, bounded ×m
    here)."""
    return F.flatten(
        F.transform(
            F.array(v),
            lambda vb: F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda mi: F.slice(vb, mi * ds + 1, ds),
            ),
        )
    )


def pq_encode(
    df: DataFrame,
    codebooks: Codebooks,
    vec_col: str = "embedding",
    code_col: str = "pq_codes",
    center: Column | None = None,
) -> DataFrame:
    """Append ``code_col``: array<int> of length M, ``codes[m]`` = index of
    the codeword nearest (squared L2) to subvector m, ties to the lowest
    index.  Pure expression work — a narrow map over the scan.

    ``center`` (optional, an array<double> Column of the same dim)
    switches to RESIDUAL encoding: the codes quantize ``vec − center``
    instead of the raw vector — the FAISS IVFPQ layout, where each
    cell's residuals cluster near the origin so a shared codebook
    covers them far more densely than it covers raw vectors.  Still a
    pure function of (vec, center, codebooks): batch and streaming
    encodes agree bit-for-bit."""
    m, k, ds = len(codebooks), len(codebooks[0]), len(codebooks[0][0])
    cb = _codebook_lit(codebooks)
    v = as_double(vec_col)
    if center is not None:
        v = F.zip_with(v, center, lambda a, b: a - b)

    def nearest(sub_and_cb: Column) -> Column:
        sub = sub_and_cb["sub"]
        # (dist², k) structs sort ascending: nearest first, ties → low k
        scored = F.transform(
            sub_and_cb["cb"],
            lambda code, ki: F.struct(
                dot(
                    F.zip_with(sub, code, lambda a, b: a - b),
                    F.zip_with(sub, code, lambda a, b: a - b),
                ).alias("d2"),
                ki.alias("k"),
            ),
        )
        return F.array_sort(scored)[0]["k"]

    pairs = F.zip_with(
        _subvectors(v, m, ds),
        cb,
        lambda sub, sub_cb: F.struct(sub.alias("sub"), sub_cb.alias("cb")),
    )
    return df.withColumn(code_col, F.transform(pairs, nearest))


def pq_decode(codes: Column, codebooks: Codebooks) -> Column:
    """Reconstruct the (lossy) vector from its codes — flatten of the
    selected codeword per subspace."""
    cb = _codebook_lit(codebooks)
    return F.flatten(
        F.zip_with(codes, cb, lambda c, sub: F.element_at(sub, c + 1))
    )


def _codeword_norm2_lit(codebooks: Codebooks) -> Column:
    """``‖codeword‖²`` table, [m][k] literal."""
    return F.array(
        *[
            F.array(
                *[F.lit(float(sum(x * x for x in code))) for code in sub]
            )
            for sub in codebooks
        ]
    )


def _query_side(queries: DataFrame, codebooks: Codebooks,
                q_id: str, q_vec: str) -> DataFrame:
    """Per-query ADC lookup table + norm: ``(__qid, __qtab, __qnorm)``."""
    m, _, ds = len(codebooks), len(codebooks[0]), len(codebooks[0][0])
    cb = _codebook_lit(codebooks)
    qv = as_double(q_vec)
    return queries.select(
        F.col(q_id).alias("__qid"),
        F.zip_with(
            _subvectors(qv, m, ds),
            cb,
            lambda sub, sub_cb: F.transform(
                sub_cb, lambda code: dot(sub, code)
            ),
        ).alias("__qtab"),
        l2_norm(qv).alias("__qnorm"),
        "*",
    ).drop(q_id, q_vec)


def _adc_rank(joined: DataFrame, codebooks: Codebooks, k: int,
              q_id: str, c_id: str, code_col: str) -> DataFrame:
    """Shared ADC scoring + per-query top-k over a frame holding
    ``(__qid, __qtab, __qnorm, c_id, code_col)`` rows.  The single place
    the scoring math lives — pq_topk_adc and ivf_pq_topk must stay in
    lockstep."""
    ntab = _codeword_norm2_lit(codebooks)
    codes = F.col(code_col)
    num = F.aggregate(
        F.zip_with(
            codes, F.col("__qtab"), lambda c, tab: F.element_at(tab, c + 1)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    rnorm2 = F.aggregate(
        F.zip_with(codes, ntab, lambda c, tab: F.element_at(tab, c + 1)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = joined.select(
        F.col("__qid").alias(q_id),
        F.col(c_id),
        F.round(num / (F.col("__qnorm") * F.sqrt(rnorm2)), 6).alias(
            "adc_sim"
        ),
    )
    w = Window.partitionBy(q_id).orderBy(
        F.col("adc_sim").desc(), F.col(c_id).asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def pq_topk_adc(
    queries: DataFrame,
    corpus_codes: DataFrame,
    codebooks: Codebooks,
    k: int = 10,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    c_id: str = "vec_id",
    code_col: str = "pq_codes",
) -> DataFrame:
    """Approximate cosine top-k via ADC over PQ codes.

    Per query: ``qtab[m][k] = dot(q_m, codeword_mk)`` built once (narrow
    map over the small query frame, broadcast).  Per corpus row:
    ``approx_cos = Σ_m qtab[m][codes[m]] / (|q| · ‖decode(codes)‖)`` — M
    array lookups, never a D-length dot.  The codeword-norm table is a
    literal, so the corpus side needs only its code column.  Output:
    ``(q_id, c_id, adc_sim, rank)``, rank 1..k per query (ties on the
    rounded score break by ``c_id`` — deterministic).
    """
    q = _query_side(
        queries.select(q_id, q_vec), codebooks, q_id, q_vec
    )
    joined = corpus_codes.join(F.broadcast(q))
    return _adc_rank(joined, codebooks, k, q_id, c_id, code_col)


def _residual_tables(
    centroids: list[list[float]], codebooks: Codebooks
) -> tuple[list[float], list[list[list[float]]]]:
    """Driver-side norm tables for residual ADC:

    * ``cnorm2[cell]``  = ‖centroid_cell‖²
    * ``cross[cell][m][k]`` = 2·⟨centroid_cell,m, codeword_mk⟩ +
      ‖codeword_mk‖²

    so that ``‖centroid_cell + decode(codes)‖² = cnorm2[cell] +
    Σ_m cross[cell][m][codes[m]]`` — M lookups per row, no D-length
    math.  Table size is nlist·M·K floats (2k at the q95 setting);
    ship it as a broadcast join side instead of a literal if a config
    ever pushes nlist·M·K past ~10⁵."""
    m, ds = len(codebooks), len(codebooks[0][0])
    cnorm2 = [float(sum(x * x for x in c)) for c in centroids]
    cross = []
    for cent in centroids:
        subs = [cent[mi * ds:(mi + 1) * ds] for mi in range(m)]
        cross.append(
            [
                [
                    float(
                        2.0 * sum(a * b for a, b in zip(subs[mi], code))
                        + sum(b * b for b in code)
                    )
                    for code in codebooks[mi]
                ]
                for mi in range(m)
            ]
        )
    return cnorm2, cross


def _adc_rank_residual(
    joined: DataFrame,
    codebooks: Codebooks,
    centroids: list[list[float]],
    k: int,
    q_id: str,
    c_id: str,
    code_col: str,
) -> DataFrame:
    """Residual-ADC scoring + per-query top-k.  ``joined`` rows carry
    ``(__qid, __qtab, __qnorm, __qcdot, cell, c_id, code_col)``;
    the reconstruction is ``centroid_cell + decode(codes)``, so

        cos ≈ (⟨q, centroid⟩ + Σ_m qtab[m][code_m])
              / (‖q‖ · √(cnorm2[cell] + Σ_m cross[cell][m][code_m]))
    """
    cnorm2, cross = _residual_tables(centroids, codebooks)
    cn_lit = F.array(*[F.lit(x) for x in cnorm2])
    cross_lit = F.array(
        *[
            F.array(
                *[
                    F.array(*[F.lit(x) for x in row])
                    for row in cell_tab
                ]
            )
            for cell_tab in cross
        ]
    )
    codes = F.col(code_col)
    num = F.col("__qcdot") + F.aggregate(
        F.zip_with(
            codes, F.col("__qtab"), lambda c, tab: F.element_at(tab, c + 1)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    rnorm2 = F.element_at(cn_lit, F.col("cell") + 1) + F.aggregate(
        F.zip_with(
            codes,
            F.element_at(cross_lit, F.col("cell") + 1),
            lambda c, tab: F.element_at(tab, c + 1),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = joined.select(
        F.col("__qid").alias(q_id),
        F.col(c_id),
        F.round(
            num / (F.col("__qnorm") * F.sqrt(rnorm2)), 6
        ).alias("adc_sim"),
    )
    w = Window.partitionBy(q_id).orderBy(
        F.col("adc_sim").desc(), F.col(c_id).asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def pq_train(
    corpus: DataFrame,
    dim: int,
    m: int = 8,
    k: int = 16,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    salt: str = "pq",
) -> Codebooks:
    """Per-subspace Lloyd refinement of the deterministic random seeds.

    One explode puts every (row, subspace) pair in a single frame; each
    iteration is assign (fold over the codebook literal) → per-(m, cell,
    component) mean — ALL subspaces share the same two shuffles, so cost
    does not grow with M.  Empty cells keep their previous codeword.
    Only m·k·(dim/m) scalars reach the driver per iteration.
    """
    ds = dim // m
    codebooks = pq_codebooks_random(dim, m, k, salt=salt)
    base = corpus.select(
        F.col(id_col).alias("id"),
        F.posexplode(_subvectors(as_double(vec_col), m, ds)).alias(
            "m", "sub"
        ),
    )
    for _ in range(iters):
        cb = _codebook_lit(codebooks)
        assigned = base.select(
            "m",
            "sub",
            F.array_sort(
                F.transform(
                    F.element_at(cb, F.col("m") + 1),
                    lambda code, ki: F.struct(
                        dot(
                            F.zip_with(F.col("sub"), code, lambda a, b: a - b),
                            F.zip_with(F.col("sub"), code, lambda a, b: a - b),
                        ).alias("d2"),
                        ki.alias("k"),
                    ),
                )
            )[0]["k"].alias("cell"),
        )
        rows = (
            assigned.select("m", "cell", F.posexplode("sub").alias("pos", "x"))
            .groupBy("m", "cell", "pos")
            .agg(F.avg("x").alias("mu"))
            .groupBy("m", "cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "mu"))),
                    lambda s: s["mu"],
                ).alias("code")
            )
            .collect()
        )
        # F.avg merges double partials in shuffle-arrival order, which can
        # drift by an ulp between runs; rounding the collected means far
        # above that noise floor keeps the trained codebook bit-identical
        # across runs (the determinism every other operator here promises)
        new = {
            (r["m"], r["cell"]): [round(v, 12) for v in r["code"]]
            for r in rows
        }
        codebooks = [
            [new.get((mi, ki), codebooks[mi][ki]) for ki in range(k)]
            for mi in range(m)
        ]
    return codebooks


def ivf_pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    codebooks: Codebooks,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    centroids: list[list[float]] | None = None,
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
    residual: bool = False,
) -> DataFrame:
    """IVF-PQ: coarse centroid cells prune the candidate set, PQ-ADC
    scores the survivors — the standard billion-scale ANN shape (one
    scan assigns cells + codes; the probe join moves only
    |corpus|·nprobe/nlist rows of M-byte codes, never raw floats).

    ``residual=False`` (default) quantizes raw vectors: recall equals
    plain ADC restricted to the probed cells, and ``nprobe == nlist``
    is EXACTLY :func:`pq_topk_adc` — pinned in tests, so the cell
    plumbing sits under the same contract.

    ``residual=True`` is the FAISS IVFPQ layout: codes quantize
    ``vec − centroid[cell]`` — residuals cluster near the origin, so
    the same codebook budget covers them much more densely (lower
    reconstruction error, higher recall; pinned in
    tests/test_pq_residual.py).  Scoring reconstructs through the
    driver-side norm tables of :func:`_residual_tables` — per row the
    work is still M lookups.  Codes stay a pure function of
    (vec, frozen centroids+codebooks), so streaming and batch encodes
    agree bit-for-bit.  Output schema matches ``pq_topk_adc``.
    """
    from .similarity import kmeans_centroids, nearest_centroid_ids

    if centroids is None:
        centroids = kmeans_centroids(
            corpus, nlist=nlist, id_col=c_id, vec_col=c_vec
        )
    with_cell = corpus.withColumn(
        "cell",
        nearest_centroid_ids(as_double(c_vec), centroids, 1)[0],
    )
    if residual:
        cent_lit = F.array(
            *[
                F.array(*[F.lit(float(x)) for x in c])
                for c in centroids
            ]
        )
        coded = pq_encode(
            with_cell,
            codebooks,
            vec_col=c_vec,
            center=F.element_at(cent_lit, F.col("cell") + 1),
        ).select(c_id, "pq_codes", "cell")
    else:
        coded = pq_encode(with_cell, codebooks, vec_col=c_vec).select(
            c_id, "pq_codes", "cell"
        )
    # per-query ADC table once, THEN fan out over probed cells — and no
    # dedup after the join: each corpus row lives in exactly one cell and
    # a query's probed cells are distinct, so (q, c) pairs are already
    # unique (a dropDuplicates here would add a full extra shuffle of the
    # candidate set for no behavioral effect)
    q = _query_side(queries.select(q_id, q_vec), codebooks, q_id, q_vec)
    probe_cols = [
        F.col(q_id).alias("__jqid"),
        F.explode(
            nearest_centroid_ids(as_double(q_vec), centroids, nprobe)
        ).alias("cell"),
    ]
    if residual:
        cent_lit = F.array(
            *[
                F.array(*[F.lit(float(x)) for x in c])
                for c in centroids
            ]
        )
        probed_q = (
            queries.select(*probe_cols, as_double(q_vec).alias("__qv"))
            .withColumn(
                "__qcdot",
                dot(
                    F.col("__qv"),
                    F.element_at(cent_lit, F.col("cell") + 1),
                ),
            )
            .drop("__qv")
            .join(q, F.col("__jqid") == F.col("__qid"))
            .drop("__jqid")
        )
        joined = coded.join(F.broadcast(probed_q), on="cell")
        return _adc_rank_residual(
            joined, codebooks, centroids, k, q_id, c_id, "pq_codes"
        )
    probed_q = (
        queries.select(*probe_cols)
        .join(q, F.col("__jqid") == F.col("__qid"))
        .drop("__jqid")
    )
    joined = coded.join(F.broadcast(probed_q), on="cell")
    return _adc_rank(joined, codebooks, k, q_id, c_id, "pq_codes")

"""Round-10 batch (q270+): the release capstone's selection math under
the driver's value hash.

* **q270 DSIR budget selection**: q267 scores, q269 races — this runs
  the paper's actual SELECTION: keep the Gumbel-max race's leading
  documents until a token budget fills (`operators/dsir.dsir_resample`,
  the stage `plans/release.py` wires into the capstone).  The engine
  computes the cumulative cutoff with the two-phase distributed prefix
  sum (no single-partition window); the DuckDB twin uses a plain
  cumulative window — same math, different physics, which is exactly
  what the hash gate is for.  Race keys are rounded to 4 decimals
  BEFORE ordering (doc id breaks ties): the weight is a float sum whose
  last ulp is aggregation-order-dependent, so only the rounded race is
  cross-engine total-ordered.

* **q271 quantile-normalized release gate**: `quantile_release_gate`
  (q191's Q-Q table applied — the capstone's fairness gate) as an
  oracled query: drop each source's bottom length-decile, emit the
  Q-Q-normalized score.  Interpolated percentiles (Spark `percentile`
  == DuckDB `quantile_cont`, both the standard (n-1)·p linear rule
  over the same doubles).

Reference parity: none — extensions of the LLM-pipeline family
(SURVEY §2 addenda); these put the release capstone's two non-dedup
stages under cumulative driver-hash evidence.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .queries import _t, register
from .queries_r9 import _Q267_B, _q267_oracle

_Q270_BUDGET = 2_000  # whitespace tokens
_Q270_HASH_SPACE = float(1 << 60)


def _q270_oracle() -> str:
    base = _q267_oracle()
    head = base[: base.rindex("SELECT doc_id, lang,")]
    return (
        head
        + f""", doc_w AS (
        SELECT doc_id, lang, sum(w) AS w
        FROM hashed JOIN bucket_w USING (b)
        GROUP BY doc_id, lang
    ), raced AS (
        SELECT dw.doc_id, dw.lang,
               round(dw.w - ln(-ln(
                   (CAST(('0x' || substr(md5('gum:' || CAST(dw.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) + 1.0)
                   / ({_Q270_HASH_SPACE} + 2.0)
               )), 4) AS race_key,
               CAST(len(regexp_split_to_array(trim(d.text), '\\s+'))
                    AS BIGINT) AS n_toks
        FROM doc_w dw JOIN documents d ON d.doc_id = dw.doc_id
    ), cum AS (
        SELECT doc_id, lang, race_key, n_toks,
               sum(n_toks) OVER (
                   ORDER BY race_key DESC, doc_id
                   ROWS UNBOUNDED PRECEDING) AS cum_toks
        FROM raced
    )
    SELECT doc_id, lang, race_key, n_toks
    FROM cum WHERE cum_toks <= {_Q270_BUDGET}
    ORDER BY race_key DESC, doc_id
    """
    )


@register(
    "q270_dsir_budget_selection",
    _q270_oracle(),
    doc=(
        "DSIR selection to a token budget (Xie 2023's end-to-end, the "
        "release capstone's selection stage): score every doc vs the "
        "English target slice (q267's hashed-ngram models), race by "
        "Gumbel-max (q269), and keep the race's leaders while the "
        "cumulative whitespace-token count stays within the budget.  "
        "The cumulative cutoff runs as the two-phase distributed "
        "prefix sum (rankstats.prefix_sums_by_value — one range "
        "exchange, never a single-partition window), so the selection "
        "scales like a sort, not like a reduce-to-one; RNG-free race "
        "keys make the selection deterministic across engines and "
        "cluster layouts"
    ),
)
def q270(spark, sf_dir):
    from ..operators.dsir import dsir_resample
    from ..operators.text import token_count

    d = _t(spark, sf_dir, "documents")
    sel = dsir_resample(
        d,
        F.col("lang") == "en",
        _Q270_BUDGET,
        n_buckets=_Q267_B,
        key_decimals=4,
    )
    return sel.select(
        "doc_id",
        "lang",
        "race_key",
        token_count("text").cast("long").alias("n_toks"),
    ).orderBy(F.col("race_key").desc(), "doc_id")


_Q271_PS = [i / 10.0 for i in range(1, 10)]


@register(
    "q271_quantile_release_gate",
    f"""
    WITH d AS (
        SELECT doc_id, source, CAST(len(text) AS INT) AS n_chars
        FROM documents
    ), per AS (
        SELECT source,
               quantile_cont(n_chars, {_Q271_PS}) AS src_cuts
        FROM d GROUP BY source
    ), gl AS (
        SELECT quantile_cont(n_chars, {_Q271_PS}) AS gcuts FROM d
    ), bucketed AS (
        SELECT d.doc_id, d.source, d.n_chars,
               len(list_filter(per.src_cuts, c -> d.n_chars >= c))
                   AS bucket
        FROM d JOIN per USING (source)
    )
    SELECT doc_id, source, n_chars,
           round(gl.gcuts[least(bucket, 9)], 4) AS score_norm
    FROM bucketed CROSS JOIN gl
    WHERE bucket >= 1
    ORDER BY doc_id
    """,
    doc=(
        "the release capstone's Q-Q fairness gate as an oracled query "
        "(plans/release.quantile_release_gate): per-source length "
        "deciles and global deciles from two partial-merging "
        "aggregates broadcast back (|sources|x9 and 9 values — never "
        "a per-row window), drop each source's bottom decile (a fixed "
        "absolute cutoff would gut short-document sources), and emit "
        "score_norm = the GLOBAL cut at the row's within-source "
        "decile — the Q-Q-normalized score downstream samplers mix on "
        "without per-source bias"
    ),
)
def q271(spark, sf_dir):
    from .release import quantile_release_gate

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.length("text").cast("int").alias("n_chars"),
    )
    kept = quantile_release_gate(d, "n_chars", "source")
    return kept.select(
        "doc_id",
        "source",
        "n_chars",
        F.round("score_norm", 4).alias("score_norm"),
    ).orderBy("doc_id")

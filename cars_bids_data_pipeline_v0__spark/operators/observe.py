"""Zero-pass pipeline metrics via Spark's Observation API.

The reference computes its load-time counts with separate queries (e.g.
the row counts psycopg2 reports per insert batch, load_lambda/main.py) —
a second scan per metric.  Spark's ``df.observe`` attaches aggregate
metrics to the SAME action that materializes the data: at 100 TB, a
quality dashboard (row counts, null rates, domain violations) costs ZERO
extra scans because the metrics accumulate inside the one pass the sink
already pays for.

Batch: :func:`observe_quality` returns the wrapped frame plus the
``Observation`` handle — run any ONE action (the sink write), then read
``observation.get``.  Streaming: :func:`observe_stream` tags the stream;
each micro-batch's metrics surface in ``StreamingQueryProgress.
observedMetrics`` (and to any ``StreamingQueryListener``), the standard
Structured Streaming monitoring channel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def quality_metrics(
    df: DataFrame, null_cols: list[str] | None = None
) -> dict[str, Column]:
    """The default metric set: row count + per-column null counts.

    Extend/override freely — any aggregate expression works, evaluated
    map-side while rows stream through (Observation restriction: no
    distinct aggregates)."""
    metrics: dict[str, Column] = {"n_rows": F.count(F.lit(1))}
    for c in null_cols or []:
        metrics[f"null_{c}"] = F.sum(
            F.col(c).isNull().cast("long")
        )
    return metrics


def observe_quality(
    df: DataFrame,
    metrics: dict[str, Column],
    name: str = "quality",
) -> tuple[DataFrame, Observation]:
    """Attach metrics to a batch frame's next action.

    Returns ``(observed_df, observation)``; after exactly one action on
    ``observed_df`` (a write, a count — whatever the pipeline was going
    to do anyway), ``observation.get`` yields ``{metric: value}``.
    """
    obs = Observation(name)
    out = df.observe(
        obs, *[expr.alias(alias) for alias, expr in metrics.items()]
    )
    return out, obs


def observe_stream(
    df: DataFrame,
    metrics: dict[str, Column],
    name: str = "quality",
) -> DataFrame:
    """Attach per-micro-batch metrics to a streaming frame.

    Metrics appear under ``name`` in every batch's
    ``query.lastProgress["observedMetrics"]`` — the hook monitoring
    systems subscribe to via ``StreamingQueryListener`` without touching
    the data path."""
    return df.observe(
        name, *[expr.alias(alias) for alias, expr in metrics.items()]
    )

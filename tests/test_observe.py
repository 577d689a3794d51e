"""Observation-based zero-pass metrics (operators/observe.py)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from cars_bids_data_pipeline_v0__spark.operators.observe import (
    observe_quality,
    observe_stream,
    quality_metrics,
)


def test_batch_metrics_ride_the_sink_action(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c"), (4, None)],
        "k long, v string",
    )
    observed, obs = observe_quality(
        df, quality_metrics(df, null_cols=["v"]), name="silver_gate"
    )
    # the ONE action the pipeline pays for anyway — the write
    observed.write.mode("overwrite").parquet(str(tmp_path / "out"))
    got = obs.get
    assert got["n_rows"] == 4
    assert got["null_v"] == 2
    # and the data itself is untouched by the observation
    assert spark.read.parquet(str(tmp_path / "out")).count() == 4


def test_custom_aggregates_and_domain_violations(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (3, 0.0), (4, 99.9)],
        "k long, price double",
    )
    observed, obs = observe_quality(
        df,
        {
            "n_rows": F.count(F.lit(1)),
            "neg_prices": F.sum((F.col("price") < 0).cast("long")),
            "max_price": F.max("price"),
        },
    )
    observed.write.format("noop").mode("overwrite").save()
    got = obs.get
    assert got == {"n_rows": 4, "neg_prices": 1, "max_price": 99.9}


def test_stream_metrics_surface_in_query_progress(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(
        [(1, "x"), (2, None), (3, "z")], "k long, v string"
    ).coalesce(1).write.mode("overwrite").json(str(src))

    stream = (
        spark.readStream.schema("k long, v string").json(str(src))
    )
    observed = observe_stream(
        stream,
        {
            "n_rows": F.count(F.lit(1)),
            "null_v": F.sum(F.col("v").isNull().cast("long")),
        },
        name="ingest_gate",
    )
    q = (
        observed.writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    # progress events are posted asynchronously; poll briefly
    metrics = None
    for _ in range(50):
        for p in q.recentProgress:
            om = p["observedMetrics"] if "observedMetrics" in p else {}
            if "ingest_gate" in om:
                metrics = om["ingest_gate"]
        if metrics:
            break
        time.sleep(0.2)
    assert metrics is not None, "observedMetrics never surfaced"
    assert metrics["n_rows"] == 3 and metrics["null_v"] == 1

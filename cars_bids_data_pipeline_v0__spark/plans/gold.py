"""Entry point B — silver→gold star-schema maintenance (SURVEY §2.9, §3.2).

The reference runs 11 SQL statements in fixed dependency order against
Postgres (update_dims.sql:1-223; order list load_lambda/main.py:16-28):
8 insert-if-absent dimension loads, 1 vehicle upsert, 1 fact insert-ignore.

Spark-first: each statement becomes a DataFrame merge (operators.merge) over
parquet-backed tables held in a `GoldStore`; surrogate keys come from
``row_number`` over the new-rows slice offset by the existing max (M4).
All dimension joins are broadcast (dims are tiny relative to the fact);
the OR-predicate state join (J1) stays a broadcast nested-loop join —
correct and cheap at 51 rows — mirroring Postgres' plan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import norm_key_lower, norm_key_upper
from ..operators.keys import next_id_start, with_surrogate_key
from ..operators.merge import insert_if_absent, upsert_overwrite


class GoldStore:
    """Parquet-backed gold tables (Delta-ready interface: swap read/write
    for ``MERGE INTO`` when a transactional format is available).

    SINGLE-WRITER-INSTANCE invariant: ``read`` memoizes reader frames and
    only this instance's ``append``/``overwrite`` invalidate them — a
    second GoldStore over the same root, or any external writer, can
    leave this instance serving a stale file index.  One store instance
    owns a root for the duration of a build (the engine's pipelines
    already work this way); call ``invalidate()`` after any out-of-band
    write."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._cache: dict[str, DataFrame] = {}

    def invalidate(self, name: str | None = None) -> None:
        """Drop memoized reader frames (all of them, or one table's)
        after an out-of-band write to this root — see the class
        docstring's single-writer-instance invariant."""
        if name is None:
            self._cache.clear()
        else:
            self._cache.pop(name, None)

    def path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def read(self, name: str) -> DataFrame | None:
        if name in self._cache:
            return self._cache[name]
        p = self.path(name)
        if not os.path.exists(p):
            return None
        # memoize the reader frame: every spark.read.parquet builds a fresh
        # file index + footer schema read on the driver (~0.2 s each, and
        # the star build re-reads several dims 2-3x); append/overwrite
        # already invalidate via _cache.pop (round-13 optimization pass)
        df = self.spark.read.parquet(p)
        self._cache[name] = df
        return df

    def append(self, name: str, df: DataFrame) -> None:
        df.write.mode("append").parquet(self.path(name))
        self._cache.pop(name, None)

    def overwrite(self, name: str, df: DataFrame) -> None:
        """Overwrite a table whose current files may feed ``df``'s plan:
        write distributed to a temp path first, then swap directories —
        never a driver-side collect, so table size is unbounded."""
        import shutil

        final = self.path(name)
        tmp = final + ".__tmp__"
        df.write.mode("overwrite").parquet(tmp)
        self._cache.pop(name, None)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(tmp, final)


def _merge_dim(
    store: GoldStore, name: str, new_rows: DataFrame, key: list[str],
    order_by: list[str] | None = None,
) -> DataFrame:
    """M1 + M4 — insert-if-absent with surrogate ids; returns the full dim."""
    existing = store.read(name)
    existing_keys = existing.drop("id") if existing is not None else None
    fresh = insert_if_absent(existing_keys, new_rows, key)
    fresh = with_surrogate_key(
        fresh,
        order_by=order_by or key,
        start_at=next_id_start(existing),
        num_partitions=1,  # dims are bounded-cardinality (SURVEY §2.3)
    ).select("id", *new_rows.columns)
    if existing is None:
        store.overwrite(name, fresh)
    else:
        store.append(name, fresh)
    return store.read(name)


def seed_state_dim(store: GoldStore, states: DataFrame) -> None:
    """The reference assumes a pre-seeded state_dim(id, state, state_abbr)
    (update_dims.sql:82-83,216-217; not created by the repo)."""
    store.overwrite("state_dim", states)


def build_star_schema(store: GoldStore, staging: DataFrame) -> dict[str, DataFrame]:
    """M6 — run the 11 merges respecting the reference's dependency order
    (load_lambda/main.py:16-28).  ``staging`` is a silver frame.

    The reference executes all 11 statements sequentially; the only REAL
    dependencies are make→model→vehicle→fact and {enum dims, city}→fact.
    The 8 independent merges (6 enum dims, city, make) run as concurrent
    Spark jobs from a thread pool — on a cluster each is a small job, and
    concurrent submission overlaps their scheduling + IO instead of
    serializing 8 round-trips.  The staging cache is materialized ONCE
    before the fan-out so the parallel jobs read the cache rather than
    racing to compute it.
    """
    from concurrent.futures import ThreadPoolExecutor

    from ..session import size_coalesced_shuffle

    # Every statement below is window/anti-join/write-shaped with tiny
    # (dimension-sized) or batch-sized shuffles; size-first AQE coalescing
    # collapses their no-op post-shuffle tasks (round-13 optimization pass
    # — see size_coalesced_shuffle's docstring for the measurement and the
    # scale argument).
    with size_coalesced_shuffle(staging.sparkSession):
        return _build_star_schema_inner(store, staging)


def _build_star_schema_inner(
    store: GoldStore, staging: DataFrame
) -> dict[str, DataFrame]:
    from concurrent.futures import ThreadPoolExecutor

    staging = staging.cache()
    staging.count()  # materialize before concurrent consumers
    dims: dict[str, DataFrame] = {}

    def distinct_notnull(expr: F.Column, alias: str) -> DataFrame:
        return (
            staging.filter(expr.isNotNull())
            .select(expr.alias(alias))
            .distinct()
        )

    # city_dim source: J1 OR-predicate state join (update_dims.sql:79-86)
    state_dim = store.read("state_dim")
    if state_dim is None:
        raise ValueError("state_dim must be seeded first (seed_state_dim)")
    city_src = (
        staging.filter(F.col("city").isNotNull())
        .join(
            F.broadcast(
                state_dim.select(
                    F.col("id").alias("state_id"),
                    F.col("state").alias("__sd_state"),
                    F.col("state_abbr").alias("__sd_abbr"),
                )
            ),
            (F.col("title_state") == F.col("__sd_abbr"))
            | (F.col("title_state") == F.col("__sd_state")),
            "left",
        )
        .select(F.trim(F.col("city")).alias("city_name"), "state_id")
        .distinct()
    )

    # -- phase 1: the 8 independent merges, concurrent ---------------------
    # (6 enum dims update_dims.sql:8-69, city :79-86, make :95-101)
    phase1: dict[str, tuple[DataFrame, list[str]]] = {
        "auction_status_dim": (
            distinct_notnull(norm_key_lower("auction_status"), "status"),
            ["status"],
        ),
        "reserve_status_dim": (
            distinct_notnull(norm_key_lower("reserve_status"), "status"),
            ["status"],
        ),
        "body_style_dim": (
            distinct_notnull(norm_key_lower("body_style"), "body_style"),
            ["body_style"],
        ),
        "seller_type_dim": (
            distinct_notnull(norm_key_lower("seller_type"), "seller_type"),
            ["seller_type"],
        ),
        "drivetrain_dim": (
            distinct_notnull(norm_key_upper("drivetrain"), "drivetrain"),
            ["drivetrain"],
        ),
        "transmission_dim": (
            distinct_notnull(norm_key_lower("transmission_type"), "transmission"),
            ["transmission"],
        ),
        "city_dim": (city_src, ["city_name", "state_id"]),
        "vehicle_make_dim": (
            distinct_notnull(F.trim(F.col("make")), "make"), ["make"],
        ),
    }
    with ThreadPoolExecutor(max_workers=len(phase1)) as ex:
        futures = {
            name: ex.submit(_merge_dim, store, name, src, key)
            for name, (src, key) in phase1.items()
        }
        for name, fut in futures.items():
            dims[name] = fut.result()

    # -- model (composite key referencing make ids; update_dims.sql:104-114)
    model_src = (
        staging.filter(F.col("model").isNotNull())
        .join(
            F.broadcast(
                dims["vehicle_make_dim"].select(
                    F.col("id").alias("make_id"), F.trim(F.col("make")).alias("__mk")
                )
            ),
            F.trim(F.col("make")) == F.col("__mk"),
            "left",
        )
        .select(F.trim(F.col("model")).alias("model"), "make_id")
        .distinct()
    )
    dims["vehicle_model_dim"] = _merge_dim(
        store, "vehicle_model_dim", model_src, ["model", "make_id"],
        order_by=["model", "make_id"],
    )

    # -- vehicle_dim upsert (M2; update_dims.sql:122-177) -------------------
    vehicle_src = (
        staging.alias("s")
        .join(
            F.broadcast(
                dims["vehicle_make_dim"].select(
                    F.col("id").alias("make_id"), F.col("make").alias("__mk")
                )
            ),
            F.trim(F.col("s.make")) == F.col("__mk"), "left",
        )
        .join(
            F.broadcast(
                dims["vehicle_model_dim"].select(
                    F.col("id").alias("model_id"),
                    F.col("model").alias("__md"),
                    F.col("make_id").alias("__md_mk"),
                )
            ),
            (F.trim(F.col("s.model")) == F.col("__md"))
            & (F.col("make_id") == F.col("__md_mk")),
            "left",
        )
        .join(
            F.broadcast(
                dims["body_style_dim"].select(
                    F.col("id").alias("body_style_id"), F.col("body_style").alias("__bs")
                )
            ),
            norm_key_lower(F.col("s.body_style")) == F.col("__bs"), "left",
        )
        .join(
            F.broadcast(
                dims["transmission_dim"].select(
                    F.col("id").alias("transmission_id"),
                    F.col("transmission").alias("__tr"),
                )
            ),
            norm_key_lower(F.col("s.transmission_type")) == F.col("__tr"), "left",
        )
        .join(
            F.broadcast(
                dims["drivetrain_dim"].select(
                    F.col("id").alias("drivetrain_id"), F.col("drivetrain").alias("__dt")
                )
            ),
            norm_key_upper(F.col("s.drivetrain")) == F.col("__dt"), "left",
        )
        .select(
            F.trim(F.col("s.vin")).alias("vin"),
            F.col("s.auction_id").alias("auction_id"),
            "make_id", "model_id", "body_style_id",
            F.col("s.manufacture_year").alias("manufacture_year"),
            F.col("s.mileage").alias("mileage"),
            F.col("s.engine").alias("engine"),
            "transmission_id",
            F.col("s.gears").alias("gear_count"),
            "drivetrain_id",
            F.col("s.exterior_color").alias("exterior_color"),
            F.col("s.interior_color").alias("interior_color"),
            F.col("s.title_status_cleaned").alias("title_status"),
            F.col("s.title_state").alias("title_state"),
            F.col("s.equipment_count").alias("equipment_count"),
            F.col("s.mod_count").alias("mod_count"),
            F.col("s.flaw_count").alias("flaw_count"),
            F.col("s.service_count").alias("service_count"),
            F.col("s.included_items_count").alias("included_items_count"),
        )
    )
    existing_vehicle = store.read("vehicle_dim")
    if existing_vehicle is not None:
        merged = upsert_overwrite(
            existing_vehicle.drop("vehicle_id"), vehicle_src, ["vin", "auction_id"]
        )
        # keep prior surrogate ids, mint new ones for fresh keys
        id_map = existing_vehicle.select("vehicle_id", "vin", "auction_id")
        merged = merged.join(id_map, ["vin", "auction_id"], "left")
        has_id = merged.filter(F.col("vehicle_id").isNotNull())
        needs_id = with_surrogate_key(
            merged.filter(F.col("vehicle_id").isNull()).drop("vehicle_id"),
            order_by=["vin", "auction_id"],
            id_col="vehicle_id",
            start_at=next_id_start(existing_vehicle, "vehicle_id"),
            num_partitions=1,  # fresh keys per batch are batch-bounded
        )
        vehicle_dim = has_id.unionByName(needs_id)
    else:
        # Persist the deduped source before keying: the distributed key
        # assignment's range-boundary sampling re-reads its input, and
        # without this the whole 5-broadcast-join chain would run twice.
        vehicle_keyed_src = vehicle_src.dropDuplicates(
            ["vin", "auction_id"]
        ).persist()
        vehicle_dim = with_surrogate_key(
            vehicle_keyed_src,
            order_by=["vin", "auction_id"],
            id_col="vehicle_id",
        )
    store.overwrite("vehicle_dim", vehicle_dim)
    if existing_vehicle is None:
        vehicle_keyed_src.unpersist()
    dims["vehicle_dim"] = store.read("vehicle_dim")

    # -- auction_fact (M3; update_dims.sql:185-223) --------------------------
    sd = store.read("state_dim")
    fact_src = (
        staging.alias("s")
        .filter(F.col("s.auction_id").isNotNull())
        .join(
            dims["vehicle_dim"].select(
                "vehicle_id", F.col("vin").alias("__vin"),
                F.col("auction_id").alias("__vaid"),
            ),
            (F.trim(F.col("s.vin")) == F.col("__vin"))
            & (F.col("s.auction_id") == F.col("__vaid")),
            "left",
        )
        .join(
            F.broadcast(
                dims["auction_status_dim"].select(
                    F.col("id").alias("auction_status_id"), F.col("status").alias("__as")
                )
            ),
            norm_key_lower(F.col("s.auction_status")) == F.col("__as"), "left",
        )
        .join(
            F.broadcast(
                dims["reserve_status_dim"].select(
                    F.col("id").alias("reserve_status_id"), F.col("status").alias("__rs")
                )
            ),
            norm_key_lower(F.col("s.reserve_status")) == F.col("__rs"), "left",
        )
        .join(
            F.broadcast(
                sd.select(F.col("id").alias("auction_state"), F.col("state_abbr").alias("__sab"))
            ),
            norm_key_upper(F.col("s.title_state")) == F.col("__sab"), "left",
        )
        .join(
            F.broadcast(
                dims["city_dim"].select(
                    F.col("id").alias("auction_city"),
                    F.col("city_name").alias("__cn"),
                    F.col("state_id").alias("__cs"),
                )
            ),
            (F.trim(F.col("s.city")) == F.col("__cn"))
            & (F.col("auction_state") == F.col("__cs")),  # J7: depends on the state join
            "left",
        )
        .join(
            F.broadcast(
                dims["seller_type_dim"].select(
                    F.col("id").alias("seller_type_id"), F.col("seller_type").alias("__st")
                )
            ),
            norm_key_lower(F.col("s.seller_type")) == F.col("__st"), "left",
        )
        .select(
            F.col("s.auction_id").alias("auction_id"),
            F.col("s.auction_date").alias("auction_time"),  # C22 stays TimestampType
            "vehicle_id",
            F.col("auction_status_id").alias("auction_status"),
            F.col("reserve_status_id").alias("reserve_status"),
            "auction_state", "auction_city",
            F.col("seller_type_id").alias("seller_type"),
            F.col("s.view_count").alias("view_count"),
            F.col("s.watcher_count").alias("watcher_count"),
            F.col("s.bid_count").alias("bid_count"),
            F.col("s.max_bid").alias("max_bid"),
            F.col("s.min_bid").alias("min_bid"),
            F.col("s.mean_bid").alias("mean_bid"),
            F.col("s.median_bid").alias("median_bid"),
            F.col("s.bid_range").alias("bid_range"),
            F.col("s.bids").alias("bids"),
            F.col("s.highlight_count").alias("highlight_count"),
            F.col("s.video_count").alias("video_count"),
            F.col("s.auction_title").alias("auction_title"),
            F.col("s.auction_subtitle").alias("auction_subtitle"),
            F.col("s.auction_url").alias("auction_url"),
        )
    )
    existing_fact = store.read("auction_fact")
    fresh_fact = insert_if_absent(existing_fact, fact_src, ["auction_id"])
    if existing_fact is None:
        store.overwrite("auction_fact", fresh_fact)
    else:
        store.append("auction_fact", fresh_fact)
    dims["auction_fact"] = store.read("auction_fact")

    staging.unpersist()
    return dims

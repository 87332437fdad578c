"""The dataset-load job — the reference's main path (SURVEY.md §3.1),
recomposed Spark-first.

Reference lifecycle (extract-load-service.ts:242-345): message → pre-delete
→ BEGIN → zip stream → per-entry token pipeline → per-kind batched INSERTs
→ per-file metadata → COMMIT → stats proc → publish. Here the same
semantics are one declarative plan per stage:

    binaryFile → zip_fanout → route_case → explode(features) →
    decompose → strip-Z/elevation → per-kind key-scoped overwrite →
    metadata pivot → stats aggregation → result dict

Atomicity: the reference wraps all inserts in one Postgres transaction
(O18). Spark's analogue here is per-sink dynamic-partition overwrite keyed
on the dataset (each dataset's partition directory swap is the commit
point), with ``sinks.writers.staged_swap_write`` available when one commit
must span sinks. Stage timers mirror the reference's ``console.time``
instrumentation (:301,:322,:327,:336).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tdei_extract_load_service_spark.functions.feature_json import process_feature_json
from tdei_extract_load_service_spark.functions.geometry import process_geometry_elevation_cols
from tdei_extract_load_service_spark.sinks.writers import overwrite_by_key
from tdei_extract_load_service_spark.sources.geojson import (
    assemble_feature_json,
    decompose_feature,
    explode_features,
    header_json,
)
from tdei_extract_load_service_spark.sources.zip_fanout import (
    read_zip_archives,
    routed_entries,
    zip_fanout,
)

#: kind -> sink table name (content.<table>, extract-load-service.ts:378,
#: 426,478,689,736,783,830).
SINK_TABLES = {
    "nodes": "node",
    "edges": "edge",
    "points": "extension_point",
    "lines": "extension_line",
    "polygons": "extension_polygon",
    "zones": "zone",
    "extension": "extension",
}

#: kind -> content.dataset metadata column (extract-load-service.ts:89-118;
#: note edges → event_info is the reference's own mapping).
META_COLUMNS = {
    "nodes": "node_info",
    "edges": "event_info",
    "points": "ext_point_info",
    "lines": "ext_line_info",
    "polygons": "ext_polygon_info",
    "zones": "zone_info",
}


#: column schema of each sink table (A5, FIXTURES.md; INSERT shapes
#: extract-load-service.ts:378,426,478,689,736,783,830)
def sink_schema(table: str) -> str:
    base = "tdei_dataset_id string, feature string, requested_by string, entry string"
    if table == "extension":
        return "tdei_dataset_id string, ext_file_id bigint, feature string, requested_by string, entry string"
    if table == "extension_file":
        return "id bigint, tdei_dataset_id string, name string, file_meta string, requested_by string"
    if table == "dataset":
        cols = ", ".join(f"{c} string" for c in META_COLUMNS.values())
        return f"tdei_dataset_id string, {cols}"
    if table == "dataset_stats":
        return (
            "tdei_dataset_id string, kind string, n_features bigint, "
            "n_files bigint, n_with_elevation bigint"
        )
    return base


def read_sink(spark: SparkSession, warehouse: str, table: str) -> DataFrame:
    """Read a sink table, returning a correctly-typed empty frame when the
    table has no data yet (a freshly-deleted dataset can leave a partition
    directory with zero files — a metastore-backed table would carry the
    schema; this helper is the file-layout equivalent).

    Manifest warehouses (``load_dataset(commit_mode="manifest")``) are
    resolved through the pointer file, so the read is a consistent
    snapshot even while a load is committing."""
    from tdei_extract_load_service_spark.sinks.manifest import (
        is_manifest_warehouse,
        read_table,
    )

    if is_manifest_warehouse(warehouse):
        return read_table(spark, warehouse, table, schema=sink_schema(table))
    path = os.path.join(warehouse, table)
    try:
        return spark.read.schema(sink_schema(table)).parquet(path)
    except Exception:  # noqa: BLE001 — missing directory
        return spark.createDataFrame([], sink_schema(table))


class NoGeoJsonEntriesError(Exception):
    """Archive contained zero .geojson entries
    (extract-load-service.ts:319-321)."""


class MalformedGeoJsonError(Exception):
    """A .geojson entry failed to parse — the reference normalizes JSON
    syntax errors into a friendly pipeline failure (geoJsonPipeError,
    extract-load-service.ts:41-49)."""


@dataclass
class LoadResult:
    """The response message payload (O20, extract-load-service.ts:854-861;
    format README.md:75-84)."""

    success: bool
    message: str
    tdei_dataset_id: str
    feature_counts: dict[str, int] = field(default_factory=dict)
    timings: dict[str, float] = field(default_factory=dict)


@F.pandas_udf(T.StringType())
def _meta_json_udf(header: pd.Series) -> pd.Series:
    """Metadata projection value coercion: null header values -> ''
    (updateAdditionalFileData/updateExtensionFileData,
    extract-load-service.ts:500,:521)."""

    def one(h: str | None) -> str | None:
        if h is None:
            return None
        doc = json.loads(h)
        return json.dumps(
            {k: ("" if v is None else v) for k, v in doc.items()}, separators=(", ", ": ")
        )

    return pd.Series([one(h) for h in header])


#: Memoized transform expression trees, keyed by fidelity. Building the
#: geometry/elevation when-chains costs ~0.9s of py4j round-trips per call
#: (measured: the "transform" bench stage was dominated by driver-side
#: DataFrame CONSTRUCTION, not execution) — but the Columns are unresolved
#: name-based expressions, immutable and reusable across every load in the
#: process, so one build serves the lifetime of the queue consumer.
_TRANSFORM_EXPRS: dict[str, tuple] = {}


def _transform_exprs(fidelity: str) -> tuple:
    if fidelity not in _TRANSFORM_EXPRS:
        if fidelity == "exact":
            _TRANSFORM_EXPRS[fidelity] = (
                process_feature_json("feature_raw", "kind"),
            )
        else:
            parsed = decompose_feature("feature_raw")
            decompose_cols = {
                "_ftype": parsed["type"],
                "_gtype": parsed["geometry"]["type"],
                "_coords": parsed["geometry"]["coordinates"],
                "_props": parsed["properties"],
            }
            new_coords, new_props = process_geometry_elevation_cols(
                "kind", "_gtype", "_coords", "_props"
            )
            has_geometry = (
                F.col("_gtype").isNotNull()
                & F.col("_coords").isNotNull()
                & (F.trim(F.col("_coords")) != "null")
            )
            assembled = assemble_feature_json(
                F.col("_ftype"), F.col("_gtype"), F.col("_coords"), F.col("_props")
            )
            # no geometry / null coordinates -> original document untouched
            # (extract-load-service.ts:613-615)
            feature = F.when(has_geometry, assembled).otherwise(F.col("feature_raw"))
            _TRANSFORM_EXPRS[fidelity] = (
                decompose_cols,
                {"_coords": new_coords, "_props": new_props},
                feature,
            )
    return _TRANSFORM_EXPRS[fidelity]


def transform_features(features_df: DataFrame, fidelity: str = "jvm") -> DataFrame:
    """O10/O11 over exploded feature rows -> adds ``feature`` (the final
    JSON document for the JSONB-shaped sink column).

    ``fidelity='jvm'``: decomposed columns + higher-order functions — whole
    plan stays in codegen; canonical envelope on re-serialization.
    ``fidelity='exact'``: Arrow-batched pandas UDF — byte-faithful envelope
    (unknown feature-level keys survive), arbitrary nesting depth.
    """
    if fidelity == "exact":
        (feature,) = _transform_exprs(fidelity)
        return features_df.withColumn("feature", feature)
    decompose_cols, geom_cols, feature = _transform_exprs(fidelity)
    df = features_df.withColumns(decompose_cols)
    df = df.withColumns(geom_cols)
    return df.withColumn("feature", feature).drop("_ftype", "_gtype", "_coords", "_props")


def load_dataset(
    spark: SparkSession,
    archive_path: str,
    tdei_dataset_id: str,
    user_id: str,
    warehouse: str,
    fidelity: str = "jvm",
    commit_mode: str = "partition",
) -> LoadResult:
    """Run the full extract-load lifecycle for one dataset.

    Returns a LoadResult (never raises for data errors — O21 error
    normalization, extract-load-service.ts:41-49: failures become a
    friendly failure message, matching the publish-failure path :343).

    ``commit_mode``:

    - ``"partition"`` (default) — each sink commits independently via
      dynamic partition overwrite. Crash-safe per table, but a reader
      racing the load can see table A updated before table B.
    - ``"manifest"`` — the full multi-sink load publishes through ONE
      atomic pointer swap (``sinks.manifest``), matching the reference's
      single-transaction visibility (O18, data-source.ts:33-65): a reader
      sees the complete old state or the complete new state of ALL
      tables, and a mid-load crash publishes nothing. Readers must go
      through ``read_sink`` / ``sinks.manifest.read_table``.
    """
    timings: dict[str, float] = {}
    all_tables = (*SINK_TABLES.values(), "extension_file", "dataset", "dataset_stats")
    txn = None
    from tdei_extract_load_service_spark.sinks.manifest import is_manifest_warehouse

    if commit_mode == "manifest":
        # refuse to overlay a manifest onto a partition-layout warehouse:
        # the first pointer swap would HIDE every dataset already loaded
        # there (read_sink resolves only the manifest once one exists)
        if not is_manifest_warehouse(warehouse) and any(
            os.path.isdir(os.path.join(warehouse, t)) for t in all_tables
        ):
            raise ValueError(
                f"warehouse {warehouse!r} already holds partition-mode "
                "tables; loading it with commit_mode='manifest' would make "
                "them invisible. Use a fresh root or keep commit_mode='partition'."
            )
        from tdei_extract_load_service_spark.sinks.manifest import ManifestTxn

        txn = ManifestTxn(warehouse)
    elif commit_mode == "partition":
        # the reverse mix is just as silent: partition writes under a
        # manifest root are invisible to read_sink and never deleted by
        # the manifest's staged deletes
        if is_manifest_warehouse(warehouse):
            raise ValueError(
                f"warehouse {warehouse!r} is a manifest warehouse; load it "
                "with commit_mode='manifest' (partition-mode writes there "
                "would be invisible to readers)."
            )
    else:
        raise ValueError(f"unknown commit_mode {commit_mode!r}")

    def sink_write(table: str, df) -> None:
        if txn is not None:
            txn.write(table, df, tdei_dataset_id)
        else:
            overwrite_by_key(df, os.path.join(warehouse, table))

    try:
        # -- pre-delete: wipe all prior rows of this dataset (O17,
        # delete_dataset_records_by_id extract-load-service.ts:290-295 —
        # runs before the load, so a kind absent from the new archive
        # can't leave stale rows behind). In manifest mode the deletes are
        # STAGED and land atomically with the writes at commit.
        t0 = time.perf_counter()
        if txn is not None:
            for table in all_tables:
                txn.delete(table, tdei_dataset_id)
        else:
            from tdei_extract_load_service_spark.sinks.writers import delete_by_key

            for table in all_tables:
                delete_by_key(os.path.join(warehouse, table), tdei_dataset_id)
        timings["delete"] = time.perf_counter() - t0

        # -- extract: archive -> routed entries -------------------------
        t0 = time.perf_counter()
        entries = routed_entries(zip_fanout(read_zip_archives(spark, archive_path)))
        # entries feed features, headers and stats: one fan-out, cached
        entries = entries.persist()
        # ONE materializing pass returns the malformed-entry gate (O21,
        # geoJsonPipeError extract-load-service.ts:41-49) AND the per-file
        # header metadata that the extension-registration (O16) and
        # metadata (O15) stages consume — previously each of those ran its
        # own job re-scanning the persisted entries through the header
        # UDF.  Collected volume is ONE small row per FILE (kind, entry
        # name, header scalars — never feature data), the same O(files)
        # bound the metadata stage always collected; header extraction is
        # null-safe on malformed JSON, so running it before the gate check
        # costs nothing on the failure path.
        is_bad = F.from_json("entry_text", "map<string,string>").isNull()
        per_entry = entries.select(
            "kind",
            "entry",
            is_bad.alias("bad"),
            _meta_json_udf(header_json("entry_text")).alias("meta"),
            F.length("entry_text").alias("entry_bytes"),
        ).collect()
        n_entries = len(per_entry)
        if n_entries == 0:
            raise NoGeoJsonEntriesError(
                f"No GeoJSON files found in the archive for dataset {tdei_dataset_id}"
            )
        bad_entry = min((r["entry"] for r in per_entry if r["bad"]), default=None)
        if bad_entry is not None:
            raise MalformedGeoJsonError(
                f"Unable to parse GeoJSON: invalid JSON in entry {bad_entry}"
            )
        n_ext = sum(1 for r in per_entry if r["kind"] == "extension")
        total_entry_bytes = sum(r["entry_bytes"] or 0 for r in per_entry)
        timings["extract"] = time.perf_counter() - t0

        # -- transform: features + per-kind routing ---------------------
        t0 = time.perf_counter()
        features = explode_features(entries)
        # explode-skew fix: feature rows inherit the ENTRY partitioning
        # (one task per input file), so one giant .geojson would pin its
        # millions of features to a single core through the whole
        # parse/transform. A round-robin shuffle of the raw feature text
        # right after the explode spreads the per-feature work across the
        # cluster; its cost is one pass over bytes we are about to parse,
        # re-serialize and write anyway. The shuffle WIDTH is sized to
        # the archive (one task per ~1 MB of entry text, bounded by 4x
        # parallelism): a fixed defaultParallelism width put 32
        # near-empty tasks under a 10k-feature load and their scheduling
        # overhead dominated the stage (r10 A/B: 0.45s vs 0.80s per
        # dataset at bench scale), while a 300 MB single-file archive
        # still fans out to hundreds of tasks.
        n_repart = min(
            max(4, -(-total_entry_bytes // (1 << 20))),
            4 * spark.sparkContext.defaultParallelism,
        )
        features = features.repartition(n_repart)
        features = transform_features(features, fidelity=fidelity)
        features = features.withColumns(
            {
                "tdei_dataset_id": F.lit(tdei_dataset_id),
                "requested_by": F.lit(user_id),
            }
        )
        # extension features carry the extension_file FK
        # (extract-load-service.ts:473-479); surrogate id = stable hash of
        # (dataset, entry) instead of a DB sequence — distributed-safe
        features = features.withColumn(
            "ext_file_id",
            F.when(
                F.col("kind") == "extension",
                F.xxhash64(F.lit(tdei_dataset_id), F.col("entry")),
            ),
        )
        features = features.persist()
        # ONE materializing aggregation returns the per-kind counts AND the
        # per-kind statistics (O19) — previously a second full pass over
        # the persisted features recomputed them in the stats stage. Rows
        # collected = kinds present (bounded taxonomy): a model, not data.
        kind_aggs = (
            features.groupBy("kind")
            .agg(
                F.count("*").alias("n"),
                F.countDistinct("entry").alias("n_files"),
                F.sum(
                    F.when(F.col("feature").contains('"ext:elevation"'), 1).otherwise(0)
                ).alias("n_with_elevation"),
            )
            .collect()
        )
        counts = {r["kind"]: r["n"] for r in kind_aggs}
        timings["transform"] = time.perf_counter() - t0

        # -- load: one parameterized writer, 7 sinks (O12) ---------------
        # the per-kind writes are independent jobs on disjoint sink roots —
        # submit them concurrently (the reference necessarily serialized
        # its 7 bulkInsert* calls on one DB transaction; Spark's scheduler
        # interleaves the write stages, and per-path locks in the writer
        # keep same-table commits safe)
        t0 = time.perf_counter()
        from concurrent.futures import ThreadPoolExecutor

        def write_kind(kind_table: tuple[str, str]) -> None:
            kind, table = kind_table
            sink_cols = ["tdei_dataset_id", "feature", "requested_by", "entry"]
            if kind == "extension":
                sink_cols.insert(1, "ext_file_id")
            kind_df = features.where(F.col("kind") == kind).select(*sink_cols)
            # file sizing: the filtered frame inherits the transform's full
            # partitioning, so a small kind would write one near-empty file
            # per partition (32 tiny files for 5k rows here; at scale, tiny
            # files x kinds x datasets is the classic small-files problem).
            # counts[kind] is already known — coalesce (narrow, no shuffle)
            # to ~250k rows/file, floor 1.
            n_files = max(1, counts.get(kind, 0) // 250_000)
            sink_write(table, kind_df.coalesce(n_files))

        # pre-delete already cleared any prior rows; an empty
        # dynamic-overwrite write is a no-op Spark job — skip it
        nonempty = [(k, t) for k, t in SINK_TABLES.items() if counts.get(k, 0) > 0]
        if nonempty:
            with ThreadPoolExecutor(max_workers=min(len(nonempty), 4)) as pool:
                list(pool.map(write_kind, nonempty))

        # extension-file registration (O16, extract-load-service.ts:515-536):
        # one row per extension entry, created even when it has 0 features
        # (empty-insert fallback O14, :230). The gate pass already collected
        # each extension entry's header meta, so the write's input is an
        # Arrow-backed local frame — no re-scan of the archive, no second
        # pandas-UDF job; only the id keeps Spark's xxhash64 so it matches
        # the ext_file_id stamped on the feature rows above. Zero extension
        # entries skip the write job outright.
        if n_ext > 0:
            ext_pdf = pd.DataFrame(
                [[r["entry"], r["meta"]] for r in per_entry if r["kind"] == "extension"],
                columns=["entry", "file_meta"],
            )
            ext_files = spark.createDataFrame(
                ext_pdf,
                T.StructType(
                    [
                        T.StructField("entry", T.StringType()),
                        T.StructField("file_meta", T.StringType()),
                    ]
                ),
            ).select(
                F.xxhash64(F.lit(tdei_dataset_id), F.col("entry")).alias("id"),
                F.lit(tdei_dataset_id).alias("tdei_dataset_id"),
                F.regexp_extract(F.element_at(F.split("entry", "/"), -1), r"^(.*?)(\.[^.]*)?$", 1).alias("name"),
                F.col("file_meta"),
                F.lit(user_id).alias("requested_by"),
            )
            # one row per extension entry — bounded; don't scatter it over
            # the full shuffle partitioning as near-empty files
            sink_write(
                "extension_file", ext_files.coalesce(max(1, n_ext // 250_000))
            )
        timings["load"] = time.perf_counter() - t0

        # -- metadata: per-kind header -> dataset row (O15) --------------
        # an archive of only extension files updates no metadata column in
        # the reference's per-kind switch — skip the write job outright
        t0 = time.perf_counter()
        if n_entries - n_ext > 0:
            # header extraction already ran distributed in the extract
            # gate pass (one small header-JSON string per FILE came to the
            # driver there) — this stage is now pure driver-side assembly
            # plus the one-row Arrow write, no Spark job over the entries.
            # Several files of one kind each overwrite the same column in
            # the reference's sequential processing — last write wins;
            # entry-name order is the deterministic distributed equivalent
            # (== the previous max_by(meta, entry) pivot)
            last_meta: dict[str, str] = {}
            for r in sorted(
                (r for r in per_entry if r["kind"] != "extension"),
                key=lambda r: r["entry"],
            ):
                last_meta[r["kind"]] = r["meta"]
            # Arrow-backed local frame: a plain Python-list createDataFrame
            # scans through a pickled Python RDD — measured 3.5s per 2-row
            # write vs 0.2s for the Arrow path
            dataset_row = spark.createDataFrame(
                pd.DataFrame(
                    [[tdei_dataset_id, *[last_meta.get(k) for k in META_COLUMNS]]],
                    columns=["tdei_dataset_id", *META_COLUMNS.values()],
                ),
                sink_schema("dataset"),
            )
            # exactly one row per dataset -> one file; the write itself
            # is submitted below, concurrently with the stats write
            meta_write = lambda: sink_write("dataset", dataset_row.coalesce(1))  # noqa: E731
        else:
            meta_write = None
        timings["metadata"] = time.perf_counter() - t0

        # -- stats: the tdei_update_osw_stats analogue (O19) -------------
        # already aggregated in the counts pass — materialize the bounded
        # (dataset, kind) rows without re-scanning the features
        t0 = time.perf_counter()
        stats_write = None
        if kind_aggs:
            stats_df = spark.createDataFrame(
                pd.DataFrame(
                    [
                        [tdei_dataset_id, r["kind"], r["n"], r["n_files"], r["n_with_elevation"]]
                        for r in kind_aggs
                    ],
                    columns=[
                        "tdei_dataset_id", "kind", "n_features", "n_files", "n_with_elevation",
                    ],
                ),
                sink_schema("dataset_stats"),
            )
            stats_write = lambda: sink_write("dataset_stats", stats_df.coalesce(1))  # noqa: E731
        # the two one-file writes touch DISJOINT sink roots and are both
        # tiny scheduled jobs — submit them together (the same rationale
        # as the concurrent per-kind loads; writers hold per-path locks
        # and ManifestTxn.write is thread-safe). Each future times ITSELF
        # into its own stage key (ADVICE r10: the deferred metadata write
        # must not be billed to "stats") — so "metadata"/"stats" stay
        # attribution-honest while overlapping in wall-clock; the
        # concurrent section's sum of stages may exceed elapsed time.
        timings["stats"] = time.perf_counter() - t0

        def _timed(key: str, fn) -> object:
            def run() -> None:
                t = time.perf_counter()
                fn()
                timings[key] = timings.get(key, 0.0) + (
                    time.perf_counter() - t
                )

            return run

        pending = [
            _timed(key, w)
            for key, w in (("metadata", meta_write), ("stats", stats_write))
            if w is not None
        ]
        if len(pending) == 2:
            from concurrent.futures import ThreadPoolExecutor as _TPE

            with _TPE(max_workers=2) as pool:
                list(pool.map(lambda w: w(), pending))
        elif pending:
            pending[0]()

        # -- commit: in manifest mode, ONE pointer swap publishes every
        # sink written above (the reference's single COMMIT) -------------
        if txn is not None:
            t0 = time.perf_counter()
            txn.commit()
            timings["commit"] = time.perf_counter() - t0

        features.unpersist()
        entries.unpersist()
        return LoadResult(
            success=True,
            message="Extract load request processed successfully",
            tdei_dataset_id=tdei_dataset_id,
            feature_counts=counts,
            timings={k: round(v, 4) for k, v in timings.items()},
        )
    except Exception as exc:  # noqa: BLE001 — O21: normalize into a failure publish
        if txn is not None:
            # rollback: the pointer was never swapped, so no reader saw
            # anything; just reap this transaction's staged directories
            txn.abort()
        from tdei_extract_load_service_spark.errors import DatabaseError, classify_db_error

        exc = classify_db_error(exc)
        message = str(exc)
        if isinstance(exc, DatabaseError):
            # typed integrity failure (23505/23503) — reference
            # data-source.ts:96-107 surfaces the class name + short message
            message = f"{type(exc).__name__}: {message}"
        elif "JSON" in message or "Malformed" in message:
            message = f"Invalid GeoJSON content: {message[:200]}"
        return LoadResult(
            success=False,
            message=message,
            tdei_dataset_id=tdei_dataset_id,
            timings={k: round(v, 4) for k, v in timings.items()},
        )

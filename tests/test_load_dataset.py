"""End-to-end dataset-load tests — the Spark equivalent of the reference's
mocked-pipeline specs (test/unit/extract-load-service.test.ts:81-404,
mock zip test/common/mock-utils.ts:8-27), but against real files and real
sinks instead of SQL-spy assertions.
"""

from __future__ import annotations

import io
import json
import os
import zipfile

import pytest
from pyspark.sql import functions as F

from tdei_extract_load_service_spark.plans.load_dataset import load_dataset

NODES = {
    "type": "FeatureCollection",
    "name": "node-file",
    "features": [
        {"type": "Feature", "geometry": {"type": "Point", "coordinates": [-122.1, 47.6, 123.45]},
         "properties": {"_id": "n1"}},
        {"type": "Feature", "geometry": {"type": "Point", "coordinates": [-122.2, 47.7, 0]},
         "properties": {"_id": "n2"}},
        {"type": "Feature", "geometry": {"type": "Point", "coordinates": [-122.3, 47.8]},
         "properties": {"_id": "n3", "ext:elevation": 99}},
    ],
}

# header keys AFTER features (late-header capture, ref test :293-322),
# including a null header value (-> '' in metadata, src :500)
EDGES_TEXT = json.dumps(
    {
        "type": "FeatureCollection",
        "features": [
            {"type": "Feature",
             "geometry": {"type": "LineString",
                          "coordinates": [[-122.1, 47.6, 100.0], [-122.2, 47.7, 200.0]]},
             "properties": {"_id": "e1"}},
        ],
        "name": "edge-file",
        "edge_count": 1,
        "note": None,
    }
)

ZONES = {
    "type": "FeatureCollection",
    "name": "zone-file",
    "features": [
        {"type": "Feature",
         "geometry": {"type": "Polygon",
                      "coordinates": [[[-122.1, 47.6, 5.0], [-122.2, 47.7, 6.0], [-122.1, 47.6, 5.0]]]},
         "properties": {"_id": "z1"}},
    ],
}

EXTENSION = {
    "type": "FeatureCollection",
    "name": "custom-layer",
    "features": [
        {"type": "Feature", "geometry": {"type": "Point", "coordinates": [1.0, 2.0, 3.0]},
         "properties": {"_id": "x1"}},
        {"type": "Feature", "geometry": {"type": "Point", "coordinates": [4.0, 5.0]},
         "properties": {"_id": "x2"}},
    ],
}

EMPTY_POINTS = {"type": "FeatureCollection", "name": "empty-points", "features": []}


def make_zip(path: str, entries: dict[str, str]) -> None:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, text in entries.items():
            zf.writestr(name, text)
    with open(path, "wb") as fh:
        fh.write(buf.getvalue())


@pytest.fixture(scope="module", params=["jvm", "exact"])
def loaded(spark, tmp_path_factory, request):
    root = tmp_path_factory.mktemp(f"load_{request.param}")
    archive = os.path.join(root, "osw.zip")
    make_zip(
        archive,
        {
            "data/nodes.geojson": json.dumps(NODES),
            "data/edges.geojson": EDGES_TEXT,
            "data/zones.geojson": json.dumps(ZONES),
            "data/custom.geojson": json.dumps(EXTENSION),
            "data/points.geojson": json.dumps(EMPTY_POINTS),
            "data/readme.txt": "not geojson",            # skipped (ref :303)
            "__MACOSX/data/nodes.geojson": "junk",        # skipped (ref :303)
        },
    )
    warehouse = os.path.join(root, "warehouse")
    result = load_dataset(
        spark, archive, "ds-1", "user-7", warehouse, fidelity=request.param
    )
    return spark, warehouse, result


def _read(spark, warehouse, table):
    return spark.read.parquet(os.path.join(warehouse, table))


def test_result_and_counts(loaded):
    spark, warehouse, result = loaded
    assert result.success, result.message
    assert result.feature_counts == {"nodes": 3, "edges": 1, "zones": 1, "extension": 2}
    assert set(result.timings) == {"delete", "extract", "transform", "load", "metadata", "stats"}


def test_node_elevation_semantics(loaded):
    spark, warehouse, _ = loaded
    rows = _read(spark, warehouse, "node").collect()
    feats = {json.loads(r.feature)["properties"]["_id"]: json.loads(r.feature) for r in rows}
    # 3D node: stripped + ext:elevation (ref :768-787)
    assert feats["n1"]["geometry"]["coordinates"] == [-122.1, 47.6]
    assert feats["n1"]["properties"]["ext:elevation"] == 123.45
    # zero-Z: stripped, no property (ref :789-808)
    assert feats["n2"]["geometry"]["coordinates"] == [-122.2, 47.7]
    assert "ext:elevation" not in feats["n2"]["properties"]
    # 2D with pre-existing ext:elevation: untouched, no suffix key added
    assert feats["n3"]["geometry"]["coordinates"] == [-122.3, 47.8]
    assert feats["n3"]["properties"]["ext:elevation"] == 99
    assert "ext:elevation_1" not in feats["n3"]["properties"]
    # lineage column (requested_by = user_id, ref :684)
    assert all(r.requested_by == "user-7" for r in rows)


def test_edge_strip_only(loaded):
    spark, warehouse, _ = loaded
    feat = json.loads(_read(spark, warehouse, "edge").collect()[0].feature)
    assert feat["geometry"]["coordinates"] == [[-122.1, 47.6], [-122.2, 47.7]]
    assert "ext:elevation" not in feat["properties"]


def test_zone_polygon_strip(loaded):
    spark, warehouse, _ = loaded
    feat = json.loads(_read(spark, warehouse, "zone").collect()[0].feature)
    assert feat["geometry"]["coordinates"] == [[[-122.1, 47.6], [-122.2, 47.7], [-122.1, 47.6]]]


def test_extension_gets_elevation_stripped_not_extracted(loaded):
    spark, warehouse, _ = loaded
    rows = _read(spark, warehouse, "extension").collect()
    feats = {json.loads(r.feature)["properties"]["_id"]: json.loads(r.feature) for r in rows}
    # extension kind: strip-only (ref :641-647)
    assert feats["x1"]["geometry"]["coordinates"] == [1.0, 2.0]
    assert "ext:elevation" not in feats["x1"]["properties"]


def test_extension_file_registration_and_fk(loaded):
    spark, warehouse, _ = loaded
    ext_files = _read(spark, warehouse, "extension_file").collect()
    assert len(ext_files) == 1
    ef = ext_files[0]
    # name = basename sans extension (ref :531)
    assert ef.name == "custom"
    assert json.loads(ef.file_meta) == {"name": "custom-layer"}
    # every extension feature carries the file's id (ref :473-479)
    fks = {r.ext_file_id for r in _read(spark, warehouse, "extension").collect()}
    assert fks == {ef.id}


def test_metadata_columns_and_late_header(loaded):
    spark, warehouse, _ = loaded
    ds = _read(spark, warehouse, "dataset").collect()[0]
    assert json.loads(ds.node_info) == {"name": "node-file"}
    # late header captured; null -> '' (ref :293-322, :500); edges->event_info
    assert json.loads(ds.event_info) == {"name": "edge-file", "edge_count": 1, "note": ""}
    assert json.loads(ds.zone_info) == {"name": "zone-file"}
    # empty-features points file still writes metadata (O14, ref :149-158)
    assert json.loads(ds.ext_point_info) == {"name": "empty-points"}
    assert ds.ext_line_info is None and ds.ext_polygon_info is None


def test_stats_table(loaded):
    spark, warehouse, _ = loaded
    stats = {r.kind: r for r in _read(spark, warehouse, "dataset_stats").collect()}
    assert stats["nodes"].n_features == 3
    assert stats["nodes"].n_with_elevation == 2  # n1 extracted + n3 pre-existing
    assert stats["extension"].n_files == 1


def test_idempotent_reload(loaded, tmp_path):
    spark, warehouse, first = loaded
    # rerun the same dataset: delete-then-reload (O17) -> identical state
    archive2 = str(tmp_path / "osw2.zip")
    make_zip(archive2, {"data/nodes.geojson": json.dumps(NODES)})
    r2 = load_dataset(spark, archive2, "ds-1", "user-7", warehouse)
    assert r2.success
    nodes = _read(spark, warehouse, "node").where(F.col("tdei_dataset_id") == "ds-1")
    assert nodes.count() == 3  # replaced, not appended


def test_two_datasets_coexist(spark, tmp_path):
    warehouse = str(tmp_path / "wh")
    for ds in ("ds-a", "ds-b"):
        archive = str(tmp_path / f"{ds}.zip")
        make_zip(archive, {"nodes.geojson": json.dumps(NODES)})
        assert load_dataset(spark, archive, ds, "u", warehouse).success
    nodes = spark.read.parquet(os.path.join(warehouse, "node"))
    assert nodes.select("tdei_dataset_id").distinct().count() == 2
    assert nodes.count() == 6


def test_no_geojson_entries_fails(spark, tmp_path):
    archive = str(tmp_path / "empty.zip")
    make_zip(archive, {"readme.txt": "nope"})
    result = load_dataset(spark, archive, "ds-x", "u", str(tmp_path / "wh2"))
    assert not result.success
    assert "No GeoJSON files" in result.message


def test_malformed_geojson_entry_fails(spark, tmp_path):
    # O21: JSON syntax error -> failure publish (geoJsonPipeError, ref :41-49)
    archive = str(tmp_path / "bad.zip")
    make_zip(archive, {"lines.geojson": '{"type": "FeatureCollection", "features": [{{{'})
    result = load_dataset(spark, archive, "ds-bad", "u", str(tmp_path / "wh3"))
    assert not result.success
    assert "lines.geojson" in result.message


def test_reload_clears_disappeared_kind(spark, tmp_path):
    # O17 pre-delete semantics: a kind present in load 1 but absent in
    # load 2 must leave NO stale rows (dynamic overwrite alone would)
    warehouse = str(tmp_path / "wh_stale")
    a1 = str(tmp_path / "v1.zip")
    make_zip(a1, {"nodes.geojson": json.dumps(NODES), "zones.geojson": json.dumps(ZONES)})
    assert load_dataset(spark, a1, "ds-r", "u", warehouse).success
    assert spark.read.parquet(os.path.join(warehouse, "zone")).count() == 1
    a2 = str(tmp_path / "v2.zip")
    make_zip(a2, {"nodes.geojson": json.dumps(NODES)})  # zones gone
    assert load_dataset(spark, a2, "ds-r", "u", warehouse).success
    from tdei_extract_load_service_spark.plans.load_dataset import read_sink

    zones = read_sink(spark, warehouse, "zone").where(F.col("tdei_dataset_id") == "ds-r")
    assert zones.count() == 0
    assert spark.read.parquet(os.path.join(warehouse, "node")).count() == 3

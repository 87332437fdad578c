"""Property-based coverage of the geometry transforms (beyond the
reference's example-based suite — SURVEY.md §5 notes it has no randomized
testing).

Fast invariants run through Hypothesis on the pure-Python port; a
seeded-random batch then proves the JVM typed-dispatch path and the
pandas-UDF exact path agree feature-for-feature in one Spark job.
"""

from __future__ import annotations

import json
import random

from hypothesis import given, settings
from hypothesis import strategies as st

from tdei_extract_load_service_spark.functions import feature_json as FJ
from tdei_extract_load_service_spark.functions import geometry as G

coord = st.floats(-180, 180, allow_nan=False, width=32).map(lambda x: round(x, 6))
leaf = st.lists(coord, min_size=2, max_size=3)

geometry_strategies = {
    "Point": leaf,
    "MultiPoint": st.lists(leaf, min_size=1, max_size=4),
    "LineString": st.lists(leaf, min_size=2, max_size=5),
    "MultiLineString": st.lists(st.lists(leaf, min_size=2, max_size=4), min_size=1, max_size=3),
    "Polygon": st.lists(st.lists(leaf, min_size=3, max_size=5), min_size=1, max_size=2),
    "MultiPolygon": st.lists(
        st.lists(st.lists(leaf, min_size=3, max_size=4), min_size=1, max_size=2),
        min_size=1,
        max_size=2,
    ),
}

kinds = st.sampled_from(["nodes", "points", "edges", "lines", "polygons", "zones", "extension"])
gtypes = st.sampled_from(sorted(geometry_strategies))


def _leaves(c):
    if isinstance(c, list) and c and all(isinstance(x, (int, float)) for x in c):
        return [c]
    return [l for sub in c for l in _leaves(sub)] if isinstance(c, list) else []


@settings(max_examples=200, deadline=None)
@given(data=st.data(), kind=kinds, gtype=gtypes)
def test_python_port_invariants(data, kind, gtype):
    coords = data.draw(geometry_strategies[gtype])
    feature = {
        "type": "Feature",
        "geometry": {"type": gtype, "coordinates": coords},
        "properties": {"_id": "p"},
    }
    original_first_z = next(
        (l[2] for l in _leaves(coords) if len(l) >= 3), None
    )
    out = FJ.process_geometry_elevation(json.loads(json.dumps(feature)), kind)
    new_coords = out["geometry"]["coordinates"]
    # every leaf is exactly 2D afterwards
    assert all(len(l) == 2 for l in _leaves(new_coords))
    # x,y of every leaf preserved in order
    assert [l[:2] for l in _leaves(coords)] == _leaves(new_coords)
    # elevation only for nodes/points, first-Z, zero-skip
    if kind in ("nodes", "points") and original_first_z not in (None, 0):
        assert out["properties"]["ext:elevation"] == original_first_z
    else:
        assert "ext:elevation" not in out["properties"]
    # idempotence: transforming again changes nothing
    again = FJ.process_geometry_elevation(json.loads(json.dumps(out)), kind)
    assert again == out


@settings(max_examples=100, deadline=None)
@given(props=st.dictionaries(
    st.sampled_from(["ext:elevation", "ext:elevation_1", "ext:elevation_2", "other", "ext:elev"]),
    st.integers(0, 500),
    max_size=5,
))
def test_suffix_rule_matches_prefix_count(props):
    n = FJ.count_existing_elevation_properties(props)
    assert n == sum(1 for k in props if k.startswith("ext:elevation"))
    feature = {"type": "Feature", "geometry": {"type": "Point", "coordinates": [1.0, 2.0, 7.5]},
               "properties": dict(props)}
    out = FJ.process_geometry_elevation(feature, "nodes")
    expected_key = "ext:elevation" if n == 0 else f"ext:elevation_{n}"
    assert out["properties"][expected_key] == 7.5


def test_jvm_and_udf_paths_agree_on_random_batch(spark):
    rng = random.Random(42)

    def rand_leaf():
        return [round(rng.uniform(-180, 180), 6) for _ in range(rng.choice([2, 3]))]

    def rand_coords(gtype):
        if gtype == "Point":
            return rand_leaf()
        if gtype in ("MultiPoint", "LineString"):
            return [rand_leaf() for _ in range(rng.randint(2, 5))]
        if gtype in ("MultiLineString", "Polygon"):
            return [[rand_leaf() for _ in range(rng.randint(3, 5))] for _ in range(rng.randint(1, 3))]
        return [[[rand_leaf() for _ in range(rng.randint(3, 4))] for _ in range(rng.randint(1, 2))]
                for _ in range(rng.randint(1, 2))]

    kinds_l = ["nodes", "points", "edges", "lines", "polygons", "zones", "extension"]
    gtypes_l = list(geometry_strategies)
    rows = []
    for i in range(300):
        gtype = rng.choice(gtypes_l)
        feature = {
            "type": "Feature",
            "geometry": {"type": gtype, "coordinates": rand_coords(gtype)},
            "properties": {"_id": f"f{i}"},
        }
        rows.append((i, rng.choice(kinds_l), gtype, json.dumps(feature)))
    df = spark.createDataFrame(rows, "i int, kind string, gtype string, feature_raw string")

    from pyspark.sql import functions as F

    parsed = df.select(
        "i", "kind",
        F.col("gtype").alias("geom_type"),
        F.get_json_object("feature_raw", "$.geometry.coordinates").alias("coords_json"),
        F.get_json_object("feature_raw", "$.properties").alias("props_json"),
        "feature_raw",
    )
    new_coords, new_props = G.process_geometry_elevation_cols(
        "kind", "geom_type", "coords_json", "props_json"
    )
    jvm = {r.i: (r.c, r.p) for r in parsed.select("i", new_coords.alias("c"), new_props.alias("p")).collect()}
    udf = {
        r.i: r.f
        for r in df.select("i", FJ.process_feature_json("feature_raw", "kind").alias("f")).collect()
    }
    for i, _, _, _ in rows:
        exact = json.loads(udf[i])
        assert json.loads(jvm[i][0]) == exact["geometry"]["coordinates"], f"coords diverge at {i}"
        assert json.loads(jvm[i][1]) == exact["properties"], f"props diverge at {i}"

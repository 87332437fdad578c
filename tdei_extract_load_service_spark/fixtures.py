"""Deterministic synthetic OSW archive builders shared by the catalog's
end-to-end ETL entry, the bench harness, and the test suites.

The generated archive mirrors the reference's input contract (one ZIP,
``nodes.geojson`` + ``edges.geojson`` FeatureCollections — reference:
src/service/extract-load-service.ts): Point nodes with a third Z
coordinate of ``i % 3`` (so the zero-Z-means-missing rule drops every
third node), LineString edges with mixed 2D/3D coordinates."""

from __future__ import annotations

import io
import json
import os
import zipfile


def write_osw_archive(
    path: str, n_nodes: int = 100, n_edges: int = 50, name: str = "synthetic"
) -> str:
    """Write a deterministic nodes+edges OSW ZIP at ``path``; returns it.
    Nodes are Points with z = i % 3; edges are 3D->2D LineStrings."""
    doc = {
        "type": "FeatureCollection",
        "name": name,
        "features": [
            {
                "type": "Feature",
                "geometry": {
                    "type": "Point",
                    "coordinates": [i * 0.5, -i * 0.25, float(i % 3)],
                },
                "properties": {"_id": f"n{i}"},
            }
            for i in range(n_nodes)
        ],
    }
    edges = {
        "type": "FeatureCollection",
        "name": f"{name}-edges",
        "features": [
            {
                "type": "Feature",
                "geometry": {
                    "type": "LineString",
                    "coordinates": [[i, i, 1.0], [i + 1, i + 1, 2.0]],
                },
                "properties": {"_id": f"e{i}"},
            }
            for i in range(n_edges)
        ],
    }
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("nodes.geojson", json.dumps(doc))
        zf.writestr("edges.geojson", json.dumps(edges))
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as fh:
        fh.write(buf.getvalue())
    return path

"""Env-gate honesty asserts (VERDICT r12 #7).

Three features are gated on artifacts this sandbox lacks — the live
Kafka connector jar, delta-spark, and a live Postgres. Nothing can be
built against them here, but each gate's skip/error text must name the
EXACT missing artifact so a future environment upgrade lights the real
tests up automatically (the PG module un-skips itself the moment
``SPARK_GRAFT_PG_URL`` is exported; the Kafka/Delta gate tests flip from
raise-path to live-path the moment the package appears). These tests pin
that contract by introspection — no Spark session needed.
"""

from __future__ import annotations

import ast
import importlib.util
import os


def _module_source(relpath: str) -> str:
    root = os.path.join(os.path.dirname(__file__), "..")
    with open(os.path.join(root, relpath)) as fh:
        return fh.read()


def test_pg_gate_names_the_env_var_and_self_activates():
    """The live-PG module must skip on SPARK_GRAFT_PG_URL (the exact
    artifact: a jdbc:postgresql:// URL) and un-skip when it is set."""
    import tests.test_pg_staged_swap as pg

    mark = pg.pytestmark  # single module-level skipif (bare, not a list)
    if isinstance(mark, list):
        (mark,) = mark
    assert mark.name == "skipif"
    assert "SPARK_GRAFT_PG_URL" in mark.kwargs["reason"]
    assert "jdbc:postgresql://" in mark.kwargs["reason"]
    # the condition is the env var itself: set -> condition False -> runs
    assert mark.args[0] == (not os.environ.get("SPARK_GRAFT_PG_URL", ""))


def test_kafka_gate_names_the_jar_coordinate():
    """The Kafka source gate must name the exact connector coordinate a
    cluster operator would pass to --packages."""
    src = _module_source("tdei_extract_load_service_spark/streaming/consumer.py")
    assert "org.apache.spark:spark-sql-kafka-0-10_2.13" in src
    # and the pytest that exercises the gate self-deactivates when the
    # jar IS present (skip, not fail)
    tsrc = _module_source("tests/test_streaming.py")
    assert "kafka connector present on this classpath" in tsrc


def test_delta_gate_names_the_package_and_session_recipe():
    """The Delta adapter gate must name delta-spark AND the session
    wiring (extension class) — the full recipe to light it up."""
    src = _module_source("tdei_extract_load_service_spark/sinks/writers.py")
    assert "delta-spark" in src
    assert "io.delta.sql.DeltaSparkSessionExtension" in src
    # gate currently matches reality: delta importable <-> no raise path
    have_delta = importlib.util.find_spec("delta") is not None
    if have_delta:
        import delta  # noqa: F401  (upgrade happened: gate must be open)


def test_protobuf_gate_names_the_pip_requirement():
    """The transformWithStateInPandas gate must carry the pip install
    line and the in-sandbox alternative."""
    src = _module_source("tdei_extract_load_service_spark/streaming/windows.py")
    assert "protobuf>=4.25" in src
    assert "stream_session_timeout" in src


def test_gate_messages_are_raised_not_swallowed():
    """Every gate raises NotImplementedError (loud), never returns None
    or logs-and-continues: scan the three gate functions for a raise of
    NotImplementedError in their body."""
    targets = {
        "tdei_extract_load_service_spark/streaming/consumer.py": "request_stream_from_kafka",
        "tdei_extract_load_service_spark/sinks/writers.py": "overwrite_by_key_delta",
        "tdei_extract_load_service_spark/streaming/windows.py": "stream_session_tws",
    }
    for relpath, fn_name in targets.items():
        tree = ast.parse(_module_source(relpath))
        fns = [
            n
            for n in ast.walk(tree)
            if isinstance(n, ast.FunctionDef) and n.name == fn_name
        ]
        assert fns, f"{fn_name} missing from {relpath}"
        raises = [
            n
            for n in ast.walk(fns[0])
            if isinstance(n, ast.Raise)
            and isinstance(n.exc, ast.Call)
            and getattr(n.exc.func, "id", "") == "NotImplementedError"
        ]
        assert raises, f"{fn_name} no longer raises NotImplementedError"

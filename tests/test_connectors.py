"""Live-store connectors (mongo / es / s3a): the no-jar error contract
always runs; the live integration paths are OPT-IN and skip cleanly
when the connector jar or a reachable store is absent (this image
bundles neither — see README "Connector jar matrix" for the exact
spark-submit --packages lines).

Reference parity: mongo and es are the reference's primary backends
(/root/reference/etl_cli/etl.py:230-240, requirements.txt:4-5); here
they are format mappings behind `sources/registry.py::_read_connector`
with a tested error seam, so a deployment that adds the jars gets the
same `backend/ns/name` addressing with zero code changes."""

from __future__ import annotations

import os

import pytest

from etl_cli_spark.sources.registry import read_dataset, write_dataset
from etl_cli_spark.uri import parse_ds


def _jvm_has_class(spark, cls: str) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(cls)
        return True
    except Exception:
        return False


# --------------------------------------------------------------------------
# no-jar error contract — always runs (this image has no connector jars)
# --------------------------------------------------------------------------


@pytest.mark.parametrize("uri", ["mongo/appdb/users", "es/logs/events"])
def test_connector_read_without_jar_raises_clear_contract(spark, uri):
    ds = parse_ds(uri)
    if _jvm_has_class(
        spark,
        {
            "mongo": "com.mongodb.spark.sql.connector.MongoTableProvider",
            "es": "org.elasticsearch.spark.sql.DefaultSource",
        }[ds.backend],
    ):
        pytest.skip(f"{ds.backend} connector jar IS on the classpath here")
    with pytest.raises(RuntimeError, match="connector jar"):
        read_dataset(spark, ds, root="/tmp", options={})


@pytest.mark.parametrize("uri", ["mongo/appdb/users", "es/logs/events"])
def test_connector_write_without_jar_raises_clear_contract(spark, engine, uri):
    ds = parse_ds(uri)
    if _jvm_has_class(
        spark,
        {
            "mongo": "com.mongodb.spark.sql.connector.MongoTableProvider",
            "es": "org.elasticsearch.spark.sql.DefaultSource",
        }[ds.backend],
    ):
        pytest.skip(f"{ds.backend} connector jar IS on the classpath here")
    df = engine.read("region")
    with pytest.raises(RuntimeError, match="connector jar"):
        write_dataset(df, ds, root="/tmp", mode="append", options={})


# --------------------------------------------------------------------------
# live integration — opt-in: needs the jar on the classpath AND a
# reachable store named by env var; skips (never fails) otherwise.
# Run e.g.:
#   ETL_MONGO_URI=mongodb://localhost:27017 pyspark --packages \
#     org.mongodb.spark:mongo-spark-connector_2.13:10.4.1 ...
# --------------------------------------------------------------------------


def test_mongo_roundtrip_live(spark, engine):
    if not _jvm_has_class(
        spark, "com.mongodb.spark.sql.connector.MongoTableProvider"
    ):
        pytest.skip("mongo-spark-connector jar not on the classpath")
    uri = os.environ.get("ETL_MONGO_URI")
    if not uri:
        pytest.skip("set ETL_MONGO_URI to a reachable mongod to run")
    ds = parse_ds("mongo/etl_cli_spark_it/region")
    src = engine.read("region")
    write_dataset(
        src, ds, root="/tmp", mode="overwrite",
        options={"connection.uri": uri},
    )
    back = read_dataset(spark, ds, root="/tmp", options={"connection.uri": uri})
    assert back.count() == src.count()
    assert set(back.columns) >= set(src.columns)


def test_es_roundtrip_live(spark, engine):
    if not _jvm_has_class(spark, "org.elasticsearch.spark.sql.DefaultSource"):
        pytest.skip("elasticsearch-spark jar not on the classpath")
    nodes = os.environ.get("ETL_ES_NODES")
    if not nodes:
        pytest.skip("set ETL_ES_NODES (host:port) to a reachable ES to run")
    ds = parse_ds("es/etl-cli-spark-it/region")
    src = engine.read("region")
    write_dataset(
        src, ds, root="/tmp", mode="overwrite", options={"es.nodes": nodes}
    )
    back = read_dataset(spark, ds, root="/tmp", options={"es.nodes": nodes})
    assert back.count() == src.count()


def test_s3a_roundtrip_live(spark, engine):
    if not _jvm_has_class(spark, "org.apache.hadoop.fs.s3a.S3AFileSystem"):
        pytest.skip("hadoop-aws (S3AFileSystem) not on the classpath")
    bucket = os.environ.get("ETL_S3_BUCKET")
    if not bucket:
        pytest.skip("set ETL_S3_BUCKET to a writable bucket to run")
    ds = parse_ds(f"s3/{bucket}/etl_cli_spark_it/region.parquet")
    src = engine.read("region")
    write_dataset(src, ds, root="/tmp", mode="overwrite", options={})
    back = read_dataset(spark, ds, root="/tmp", options={})
    assert back.count() == src.count()

"""http-backed merger/target (--murl/--turl/--surl) + --tmap named schemas."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from etl_cli_spark.engine import Engine

MERGER_PAYLOAD = [
    {"m_regionkey": 0, "m_label": "zero"},
    {"m_regionkey": 1, "m_label": "one"},
    {"m_regionkey": 2, "m_label": "two"},
]


@pytest.fixture(scope="module")
def http_server():
    posts: list[list[dict]] = []

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            body = json.dumps(MERGER_PAYLOAD).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            posts.append(json.loads(self.rfile.read(n).decode()))
            self.send_response(200)
            self.end_headers()

        def log_message(self, *a):  # quiet
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}/api", posts
    srv.shutdown()


def test_murl_merger_from_http(spark, engine, http_server):
    url, _ = http_server
    res = engine.etl(
        "region",
        merger="mrg_api",  # dataset name is nominal; the url backs it
        murl=url,
        mkeys="r_regionkey:m_regionkey",
        mmd="m2s",
        mrm=True,
    )
    rows = {r.r_regionkey: r.m_label for r in res.df.collect()}
    assert rows == {0: "zero", 1: "one", 2: "two"}


def test_surl_source_from_http(spark, engine, http_server):
    url, _ = http_server
    df = engine.read("ignored", [f"_url={url}", "m_regionkey__gte=1"])
    assert df.count() == 2


def test_turl_posts_batches(spark, tmp_engine, http_server):
    url, posts = http_server
    posts.clear()
    res = tmp_engine.spark.range(7).toDF("x")
    res.write.parquet(f"{tmp_engine.root}/seven.parquet")
    tmp_engine.etl("seven", target="out/http_sink", turl=url, batch_size=3)
    got = sorted(rec["x"] for batch in posts for rec in batch)
    assert got == list(range(7))
    assert all(len(b) <= 3 for b in posts)


def test_turl_timestamps_serialized(spark, tmp_engine, http_server):
    url, posts = http_server
    posts.clear()
    spark.sql(
        "SELECT 1 AS id, TIMESTAMP '2024-05-06 07:08:09' AS ts"
    ).write.parquet(f"{tmp_engine.root}/tsrow.parquet")
    tmp_engine.etl("tsrow", target="out/http_sink", turl=url)
    (batch,) = posts
    assert batch[0]["ts"].startswith("2024-05-06")


def test_tmap_conform_on_write(spark, tmp_engine):
    from etl_cli_spark.schemas import register_schema

    register_schema(
        "slim_orders", "o_orderkey BIGINT, o_totalprice DOUBLE, note STRING"
    )
    spark.createDataFrame(
        [(1, 10.5, "F", "x")], "o_orderkey INT, o_totalprice DOUBLE, o_orderstatus STRING, junk STRING"
    ).write.parquet(f"{tmp_engine.root}/src_orders.parquet")
    tmp_engine.etl("src_orders", target="out/mapped", op="create", tmap="slim_orders")
    out = tmp_engine.read("out/mapped")
    assert [f.name for f in out.schema.fields] == ["o_orderkey", "o_totalprice", "note"]
    assert out.schema["o_orderkey"].dataType.simpleString() == "bigint"
    row = out.first()
    assert row.o_orderkey == 1 and row.note is None


def test_tmap_unknown_raises(tmp_engine, spark):
    spark.range(1).toDF("a").write.parquet(f"{tmp_engine.root}/one.parquet")
    with pytest.raises(KeyError, match="unknown tmap"):
        tmp_engine.etl("one", target="out/x", op="create", tmap="never_registered")


def test_cli_flags_parse():
    from etl_cli_spark.cli import build_parser

    a = build_parser().parse_args(
        ["--root", "/tmp", "-s", "src", "-m", "mrg", "--mmd", "m2s",
         "--murl", "http://h/m", "--turl", "http://h/t", "--surl", "http://h/s",
         "--tmap", "myschema", "-t", "out/t"]
    )
    assert a.murl == "http://h/m" and a.turl == "http://h/t"
    assert a.surl == "http://h/s" and a.tmap == "myschema"

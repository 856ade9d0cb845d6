"""Partitioned bulk-HTTP DataSource (sources/http_bulk.py)."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

from etl_cli_spark.sources.http_bulk import read_http_bulk

ROWS = [{"id": i, "name": f"row{i}", "score": i * 0.5, "flag": i % 2 == 0} for i in range(1000)]


@pytest.fixture(scope="module")
def paged_server():
    hits: list[str] = []

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            q = parse_qs(urlparse(self.path).query)
            off = int(q.get("offset", ["0"])[0])
            lim = int(q.get("limit", ["100"])[0])
            hits.append(self.path)
            body = json.dumps({"data": ROWS[off : off + lim]}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_port}/data?offset={{offset}}&limit={{limit}}", hits
    srv.shutdown()


def test_offset_template_fanout(spark, paged_server):
    url, hits = paged_server
    df = read_http_bulk(
        spark,
        schema="id long, name string, score double, flag boolean",
        url=url,
        total=1000,
        rows_per_part=250,
    )
    assert df.rdd.getNumPartitions() == 4  # ceil(1000/250) input partitions
    got = df.collect()
    assert len(got) == 1000
    assert {r.id for r in got} == set(range(1000))
    sample = next(r for r in got if r.id == 3)
    assert (sample.name, sample.score, sample.flag) == ("row3", 1.5, False)
    # every range was requested exactly once
    offsets = sorted(int(parse_qs(urlparse(h).query)["offset"][0]) for h in hits)
    assert offsets == [0, 250, 500, 750]


def test_explicit_url_list(spark, paged_server):
    url, _ = paged_server
    u1 = url.replace("{offset}", "0").replace("{limit}", "300")
    u2 = url.replace("{offset}", "300").replace("{limit}", "300")
    df = read_http_bulk(spark, schema="id long, name string", urls=f"{u1};{u2}")
    assert df.rdd.getNumPartitions() == 2
    assert df.count() == 600


def test_schema_inference_peeks_one_partition(spark, paged_server):
    url, hits = paged_server
    hits.clear()
    df = read_http_bulk(spark, url=url, total=1000, rows_per_part=500)
    assert dict((f.name, f.dataType.simpleString()) for f in df.schema.fields) == {
        "id": "bigint",
        "name": "string",
        "score": "double",
        "flag": "boolean",
    }
    # inference fetched only the first partition, not the dataset
    assert len(hits) == 1
    assert df.count() == 1000


def test_missing_keys_are_null(spark):
    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            body = json.dumps([{"id": 1, "name": "a"}, {"id": 2}]).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        df = read_http_bulk(
            spark,
            schema="id long, name string",
            url=f"http://127.0.0.1:{srv.server_port}/x",
        )
        rows = {r.id: r.name for r in df.collect()}
        assert rows == {1: "a", 2: None}
    finally:
        srv.shutdown()


def test_bad_options_raise(spark):
    with pytest.raises(Exception, match="total > 0"):
        read_http_bulk(spark, schema="id long", url="http://x/{offset}/{limit}").collect()
    with pytest.raises(Exception, match="'url'"):
        read_http_bulk(spark, schema="id long").collect()

from __future__ import annotations

import pytest

from etl_cli_spark.uri import DatasetURI, expand_wildcard, parse_ds, resolve_path, template_target


def test_parse_backend_ns_name():
    ds = parse_ds("parquet/ns1/sub/regions")
    assert ds == DatasetURI("parquet", "ns1/sub", "regions")


def test_parse_bare_name_defaults():
    assert parse_ds("region") == DatasetURI("parquet", "", "region")


def test_parse_unknown_backend_treated_as_ns():
    ds = parse_ds("standards/regions")
    assert ds == DatasetURI("parquet", "standards", "regions")


def test_today_macro():
    ds = parse_ds("parquet/ns/log_%TODAY%")
    assert "%TODAY%" not in ds.name
    assert ds.name.startswith("log_2")  # log_YYYY_MM_DD


def test_resolve_path():
    assert resolve_path(DatasetURI("parquet", "a/b", "t"), "/root") == "/root/a/b/t.parquet"
    assert resolve_path(DatasetURI("parquet", "", "t"), "/root") == "/root/t.parquet"


def test_wildcard_expansion(tmp_path):
    for n in ("a_one", "a_two", "b_one"):
        (tmp_path / f"{n}.parquet").mkdir()
    got = expand_wildcard(DatasetURI("parquet", "", "a_*"), str(tmp_path))
    assert [d.name for d in got] == ["a_one", "a_two"]


def test_template_target():
    src = DatasetURI("parquet", "in", "events.csv")
    tgt = template_target(DatasetURI("parquet", "out", "*_clean"), src)
    assert tgt.name == "events_clean"


def test_empty_uri_raises():
    with pytest.raises(ValueError):
        parse_ds("")

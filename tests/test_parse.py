"""Parser parity tests: unit semantics + committed golden + Spark plumbing."""

import hashlib
import json
import os

import pytest

from log_server_spark.datagen import gen_pages
from log_server_spark.parse_ref import (
    ERR_BAD_DATE,
    ERR_MISSING_TABLE,
    ERR_NO_NEWLINE,
    OK,
    detect_decode,
    java_trim,
    parse_page,
    split_chunks,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "parse_golden.json")


class TestChunking:
    def test_single_chunk(self):
        assert split_chunks(b"---- x\nbody") == [b"---- x\nbody"]

    def test_delimiter_kept_on_later_chunks(self):
        data = b"---- a\nb1\n\n---- c\nb2"
        assert split_chunks(data) == [b"---- a\nb1", b"\n\n---- c\nb2"]

    def test_leading_delimiter_yields_empty_first_chunk(self):
        data = b"\n\n---- a\nb"
        assert split_chunks(data) == [b"", b"\n\n---- a\nb"]

    def test_delimiter_inside_body_splits(self):
        # the reference splitter has no escaping — a body containing the
        # delimiter genuinely splits (InputStreamSplitter.java:98-114)
        data = b"---- h\nbody\n\n---- fake"
        assert split_chunks(data) == [b"---- h\nbody", b"\n\n---- fake"]


class TestDecode:
    def test_utf8_passthrough(self):
        assert detect_decode("привет".encode("utf-8")) == "привет"

    def test_cp1251_fallback(self):
        raw = "привет мир".encode("cp1251")
        assert detect_decode(raw) == "привет мир"

    def test_java_trim_only_low_chars(self):
        # java trim strips <= U+0020 only; NBSP (U+00A0) survives
        assert java_trim("\n\t x \x00") == "x"
        assert java_trim(" x ") == " x "


class TestParsePage:
    def test_ok_record(self):
        html = b"---- 2024-03-01 10:00:00 level:INFO table:users id:42 op:create\nbody line"
        [r] = parse_page(html)
        assert r.status == OK
        assert r.table == "users"
        assert r.record_id == "42"
        assert r.ts_millis == 1709287200000  # 2024-03-01T10:00:00Z
        assert r.text.startswith("---- 2024-03-01")

    def test_ros_prefix_normalized(self):
        html = b"---- 2024-03-01 10:00:00 table:ros.users id:1\nb"
        [r] = parse_page(html)
        assert r.table == "users"

    def test_missing_id_is_empty(self):
        html = b"---- 2024-03-01 10:00:00 table:users op:read\nb"
        [r] = parse_page(html)
        assert r.status == OK and r.record_id is None

    def test_no_newline_routes_error(self):
        [r] = parse_page(b"---- 2024-03-01 10:00:00 table:users header-only")
        assert r.status == ERR_NO_NEWLINE

    def test_bad_date_routes_error(self):
        [r] = parse_page(b"---- garbage-date-here!! table:users id:1\nbody")
        assert r.status == ERR_BAD_DATE

    def test_missing_table_routes_error(self):
        [r] = parse_page(b"---- 2024-03-01 10:00:00 id:1 op:x\nbody")
        assert r.status == ERR_MISSING_TABLE

    def test_multi_record_page(self):
        html = (
            b"---- 2024-03-01 10:00:00 table:users id:1\nfirst"
            b"\n\n---- 2024-03-01 10:01:00 table:users id:2\nsecond"
        )
        rs = parse_page(html)
        assert [r.status for r in rs] == [OK, OK]
        assert [r.record_id for r in rs] == ["1", "2"]
        assert rs[1].ts_millis - rs[0].ts_millis == 60_000
        # chunk 2's leading delimiter is trimmed to the uniform prefix
        assert rs[1].text.startswith("---- 2024-03-01 10:01:00")

    def test_empty_page(self):
        [r] = parse_page(b"")
        assert r.status == ERR_NO_NEWLINE

    def test_cp1251_body_byte_identity(self):
        body = "запись журнала"
        html = f"---- 2024-03-01 10:00:00 table:users id:7\n{body}".encode("cp1251")
        [r] = parse_page(html)
        assert r.status == OK
        assert body in r.text


def test_golden_fixture_pinned():
    """parse_ref drift guard: committed golden regenerated must be identical."""
    with open(GOLDEN) as f:
        golden = json.load(f)
    tbl = gen_pages(seed=42, n=400)
    i = 0
    for url, html in zip(tbl["url"].to_pylist(), tbl["html"].to_pylist()):
        for r in parse_page(html):
            g = golden[i]
            data = r.text.encode("utf-8")
            assert (url, r.seq, r.status, r.table or "", r.record_id or "", r.ts_millis) == (
                g["url"], g["seq"], g["status"], g["table"], g["record_id"], g["ts_millis"]
            ), f"golden mismatch at row {i}"
            assert hashlib.sha256(data).hexdigest() == g["text_sha256"], f"text drift at row {i}"
            assert len(data) == g["text_bytes"]
            i += 1
    assert i == len(golden)


def test_spark_parse_matches_reference_parser(spark, tmp_path):
    """The Spark mapInPandas stage must equal driver-side parse_ref output
    per (url, seq) — the byte-identity invariant through real plumbing."""
    import pyarrow.parquet as pq

    from log_server_spark.functions.parse import parse_pages

    tbl = gen_pages(seed=7, n=300)
    pq.write_table(tbl, str(tmp_path / "pages.parquet"))
    df = spark.read.parquet(str(tmp_path / "pages.parquet"))
    got = sorted(
        (r["url"], r["seq"], r["status"], r["table"], r["record_id"], r["ts_millis"], r["text"], r["n_bytes"])
        for r in parse_pages(df).collect()
    )
    want = sorted(
        (url, r.seq, r.status, r.table or "", r.record_id or "", r.ts_millis, r.text, len(r.text.encode("utf-8")))
        for url, html in zip(tbl["url"].to_pylist(), tbl["html"].to_pylist())
        for r in parse_page(html)
    )
    assert got == want

"""Property-based tests (hypothesis) for the parity-critical kernels."""

import hypothesis.strategies as st
from hypothesis import given, settings

from log_server_spark.functions.hashing import murmur3_32, murmur3_32_batch
from log_server_spark.parse_ref import DELIMITER, java_trim, parse_page, split_chunks


@given(st.binary(max_size=512), st.integers(min_value=0, max_value=2**32 - 1))
@settings(max_examples=300, deadline=None)
def test_murmur_batch_equals_scalar(data, seed):
    assert int(murmur3_32_batch([data], seed=seed)[0]) == murmur3_32(data, seed)


@given(st.lists(st.binary(max_size=64), min_size=1, max_size=50))
@settings(max_examples=100, deadline=None)
def test_murmur_batch_order_independent(datas):
    got = murmur3_32_batch(datas)
    for i, d in enumerate(datas):
        assert int(got[i]) == murmur3_32(d)


@given(st.binary(max_size=400))
@settings(max_examples=300, deadline=None)
def test_split_chunks_reassembles(data):
    """Chunk boundaries are a partition of the input: lossless."""
    chunks = split_chunks(data)
    assert b"".join(chunks) == data
    # every chunk after the first starts with the delimiter
    for c in chunks[1:]:
        assert c.startswith(DELIMITER)
    # no chunk except the first contains an *interior* delimiter occurrence
    for c in chunks[1:]:
        assert c.find(DELIMITER, len(DELIMITER)) == -1
    assert chunks[0].find(DELIMITER) == -1


@given(st.binary(max_size=300))
@settings(max_examples=300, deadline=None)
def test_parse_page_total(data):
    """The parser never raises and classifies every chunk exactly once."""
    records = parse_page(data)
    assert len(records) >= 1
    for r in records:
        assert r.status in {"ok", "err_no_newline", "err_bad_date", "err_missing_table", "err_oversize"}
        if r.status == "ok":
            assert r.table and r.ts_millis is not None


@given(st.text(max_size=100))
@settings(max_examples=200, deadline=None)
def test_java_trim_semantics(s):
    """Java trim strips exactly the <= U+0020 prefix/suffix chars."""
    t = java_trim(s)
    assert t == s.strip("".join(chr(c) for c in range(0x21)))
    if t:
        assert ord(t[0]) > 0x20 and ord(t[-1]) > 0x20

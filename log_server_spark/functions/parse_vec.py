"""Vectorized (Arrow/numpy) twin of :mod:`log_server_spark.parse_ref`.

``parse_ref.parse_page`` stays the semantic truth — per-record pure Python,
byte-exact by construction, cited line-by-line into the reference. This
module restates it for the ~95% common case so the pipeline's hottest stage
runs at C speed inside the Python worker:

- **Pure-ASCII pages** (no byte >= 0x80) are parsed with pyarrow compute
  kernels (C++: ``split_pattern`` for the chunking, ``ascii_ltrim/rtrim``
  for the Java-style trim, RE2 ``extract_regex`` for the id/table tokens)
  plus numpy (strict fixed-slice date -> epoch millis via the civil-days
  formula, and the reference murmur3+ts-fold content hash computed directly
  over the Arrow string buffer, zero-copy). ASCII makes the equivalence
  airtight: UTF-8 decode is the identity, the cp1251 sniff
  (SourceUtils.scala:8-13) can never trigger, and RE2/Java/Python regex
  classes agree once ``\\S`` is spelled out as an explicit ASCII class
  (parse_ref._JAVA_NON_WS).
- **Anything non-ASCII** routes through ``parse_ref.parse_page`` unchanged
  (the residue path), and the two outputs concatenate.

Row-for-row equality of the two paths over every planted error class +
adversarial edge pages (incl. cp1251/UTF-8/invalid-byte torture cases) is
enforced by tests/test_parse_fastpath.py. The reference analogue of this
split is the zero-allocation Scala hot loop (OldLogReader.scala:19-61) vs
its tolerant fallback.

Why not JVM codegen? A whole-stage-codegen restatement was measured at
~1.6x the user-cpu of even the per-record Python path (Java regex over
multi-KB strings + a second full-text Arrow round-trip to Python for the
content hash). The Arrow-native path does one Python crossing, no pandas
object materialization, and no per-row Python on the hot subset.

Why is the residue path still per-record Python (ROADMAP round-3 #5)?
Because a full vectorization was BUILT and MEASURED SLOWER (round 4): a
numpy structural UTF-8 validator + batched-C-codec cp1251 decode feeding
these same kernels ran at 0.3-0.7x the per-record path on both a pure-
cp1251 record-dense corpus (16 vs 21 MB/s/core) and the datagen non-ASCII
residue (18 vs 54 MB/s/core, interleaved best-of-8 cpu-seconds). Pages
are KB-sized with 1-3 records, so the per-record overhead (~8 us) is
amortized over C-codec decode work that is already vectorized inside
CPython, while the "vectorized" restatement paid ~25 full-buffer kernel
passes. Same verdict as the JVM-codegen attempt: measured, rejected, and
the per-record path kept on evidence. (The measurement also surfaced this
host's real pathology — glibc munmap of large numpy temporaries costing
200x in first-touch page faults — fixed globally in session.py via
MALLOC_MMAP_THRESHOLD_.)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from log_server_spark.functions.hashing import record_hash_offsets
from log_server_spark.parse_ref import (
    ERR_BAD_DATE,
    ERR_MISSING_TABLE,
    ERR_NO_NEWLINE,
    ERR_OVERSIZE,
    MAX_PAYLOAD_BYTES,
    OK,
    _JAVA_NON_WS,
    parse_page,
)

_WS = "".join(chr(c) for c in range(0x21))  # Java trim: chars <= U+0020
_ID_PAT = rf" id:(?P<t>{_JAVA_NON_WS}+)"
_TABLE_PAT = rf" table:(?P<t>{_JAVA_NON_WS}+)"
_STATUS_LOOKUP = pa.array([OK, ERR_NO_NEWLINE, ERR_BAD_DATE, ERR_MISSING_TABLE, ERR_OVERSIZE])
_DAYS_IN_MONTH = np.array([0, 31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31], dtype=np.int64)

OUT_FIELDS = [
    ("url", None),  # type copied from input
    ("warc_ts", None),
    ("lang", None),
    ("seq", pa.int32()),
    ("status", pa.string()),
    ("table", pa.string()),
    ("record_id", pa.string()),
    ("ts_millis", pa.int64()),
    ("text", pa.string()),
    ("n_bytes", pa.int64()),
    ("record_hash", pa.int32()),
]


def _str_buf(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(data buffer as uint8, row offsets int64) of a string/binary array —
    zero-copy views into the Arrow buffers."""
    odt = np.int64 if pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type) else np.int32
    off_buf, data_buf = arr.buffers()[1], arr.buffers()[2]
    if off_buf is None:  # degenerate empty array: no offsets allocated
        return np.empty(0, np.uint8), np.zeros(len(arr) + 1, np.int64)
    offs = np.frombuffer(off_buf, dtype=odt)[arr.offset : arr.offset + len(arr) + 1]
    buf = (
        np.frombuffer(data_buf, dtype=np.uint8) if data_buf is not None else np.empty(0, np.uint8)
    )
    return buf, offs.astype(np.int64)


def _ascii_mask(html: pa.Array) -> np.ndarray:
    """Per-row "no byte >= 0x80" over a (null-free) binary array.

    High bytes are sparse in a web-text batch, so locate them directly
    (``nonzero``) and map each position to its row with one binary search —
    no O(buffer) prefix sum unless high bytes are actually dense."""
    buf, offs = _str_buf(html)
    mask = np.ones(len(html), dtype=bool)
    if len(buf) == 0:
        return mask
    hi = buf >= 0x80
    n_hi = int(np.count_nonzero(hi))
    if n_hi == 0:
        return mask
    if n_hi > len(buf) >> 3:
        # dense (e.g. a Cyrillic-heavy corpus): prefix sum beats
        # materializing the high-byte positions — and the per-row interval
        # sum is naturally immune to slice/padding bytes outside
        # [offs[0], offs[-1]). Accumulator dtype follows the buffer size:
        # _str_buf supports large_binary (int64 offsets, >2 GiB buffers),
        # where an int32 cumsum would overflow past 2^31 high bytes and
        # silently misclassify rows as ASCII.
        cs_dt = np.int32 if len(buf) < (1 << 31) else np.int64
        cs = np.zeros(len(buf) + 1, dtype=cs_dt)
        np.cumsum(hi, out=cs[1:])
        return (cs[offs[1:]] - cs[offs[:-1]]) == 0
    pos = np.nonzero(hi)[0]
    # a sliced array (or buffer padding) can expose data-buffer bytes
    # outside [offs[0], offs[-1]); mapping those through searchsorted would
    # yield row -1 (silently flags the last row) or n (IndexError) — drop
    # them first
    pos = pos[(pos >= offs[0]) & (pos < offs[-1])]
    if len(pos) == 0:
        return mask
    rows = np.searchsorted(offs, pos, side="right") - 1
    mask[rows] = False
    return mask


def _canonical_ids(token: pa.Array) -> pa.Array:
    """Vectorized ``RecordId.parse`` coercion (RecordId.scala:61-75): int
    first — optional sign, leading zeros canonicalized, int32 overflow falls
    back to the String variant. All C++ kernels over short header tokens."""
    is_int = pc.match_substring_regex(token, r"^[+-]?[0-9]+$")
    neg = pc.match_substring_regex(token, r"^-")
    digits = pc.replace_substring_regex(token, r"^[+-]", "")
    stripped = pc.replace_substring_regex(digits, r"^0+", "")
    stripped = pc.if_else(pc.equal(stripped, ""), "0", stripped)
    # <= 18 significant digits fits int64 exactly; more can never be int32
    small = pc.less_equal(pc.utf8_length(stripped), 18)
    vals = pc.if_else(pc.and_(is_int, small), stripped, "0")
    v = pc.cast(vals, pa.int64())
    v = pc.if_else(neg, pc.negate_checked(v), v)
    in_range = pc.and_(pc.greater_equal(v, -(1 << 31)), pc.less_equal(v, (1 << 31) - 1))
    ok = pc.and_(pc.and_(is_int, small), in_range)
    return pc.if_else(ok, pc.cast(v, pa.string()), token)


def _parse_dates(buf: np.ndarray, starts: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """Strict ``yyyy-MM-dd HH:mm:ss`` over each row's [5, 24) byte slice ->
    UTC epoch millis (int64), -1 where invalid. Position-exact ASCII digits
    + real-calendar validity, numpy end-to-end (parity twin of
    parse_ref.parse_ts_millis; epoch math is the civil-days formula).
    Byte slice == char slice because callers only hand this pure-ASCII
    rows."""
    n = len(starts)
    out = np.full(n, -1, dtype=np.int64)
    cand = np.nonzero(lengths >= 24)[0]
    if len(cand) == 0:
        return out
    idx = starts[cand, None] + np.arange(5, 24, dtype=np.int64)[None, :]
    m = buf[idx].astype(np.int64)  # (k, 19) — the header-slice bytes
    sep_ok = (m[:, 4] == 0x2D) & (m[:, 7] == 0x2D) & (m[:, 10] == 0x20) & (m[:, 13] == 0x3A) & (m[:, 16] == 0x3A)
    d = m - 0x30
    dig = (d >= 0) & (d <= 9)
    dig_cols = [0, 1, 2, 3, 5, 6, 8, 9, 11, 12, 14, 15, 17, 18]
    shape_ok = sep_ok & dig[:, dig_cols].all(axis=1)
    y = d[:, 0] * 1000 + d[:, 1] * 100 + d[:, 2] * 10 + d[:, 3]
    mo = d[:, 5] * 10 + d[:, 6]
    dy = d[:, 8] * 10 + d[:, 9]
    hh = d[:, 11] * 10 + d[:, 12]
    mi = d[:, 14] * 10 + d[:, 15]
    se = d[:, 17] * 10 + d[:, 18]
    mo_c = np.clip(mo, 1, 12)
    leap = ((y % 4 == 0) & (y % 100 != 0)) | (y % 400 == 0)
    dim = _DAYS_IN_MONTH[mo_c] + (leap & (mo_c == 2))
    valid = (
        shape_ok
        & (y >= 1) & (mo >= 1) & (mo <= 12) & (dy >= 1) & (dy <= dim)
        & (hh <= 23) & (mi <= 59) & (se <= 59)
    )
    # days since 1970-01-01 (Howard Hinnant's civil-days algorithm)
    yy = y - (mo <= 2)
    era = yy // 400
    yoe = yy - era * 400
    mp = np.where(mo > 2, mo - 3, mo + 9)
    doy = (153 * mp + 2) // 5 + dy - 1
    doe = yoe * 365 + yoe // 4 - yoe // 100 + doy
    days = era * 146097 + doe - 719468
    ms = (days * 86400 + hh * 3600 + mi * 60 + se) * 1000
    out[cand] = np.where(valid, ms, -1)
    return out


def parse_pages_ascii(
    url: pa.Array, warc_ts: pa.Array, lang: pa.Array, html: pa.Array
) -> pa.Table:
    """Vectorized parse of null-free, pure-ASCII page bytes -> records table."""
    s = pc.cast(html, pa.string())
    splits = pc.split_pattern(s, "\n\n---- ")
    counts = pc.list_value_length(splits).to_numpy(zero_copy_only=False).astype(np.int64)
    segs = splits.flatten()
    return _records_from_segments(url, warc_ts, lang, segs, counts)


def _records_from_segments(
    url: pa.Array,
    warc_ts: pa.Array,
    lang: pa.Array,
    segs: pa.Array,
    counts: np.ndarray,
) -> pa.Table:
    """Decoded per-chunk ASCII strings (+ per-page chunk counts) ->
    records table."""
    total = int(counts.sum())
    page_idx = pa.array(np.repeat(np.arange(len(counts), dtype=np.int64), counts))
    page_starts = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(counts[:-1], out=page_starts[1:])
    seq = np.arange(total, dtype=np.int64) - np.repeat(page_starts, counts)
    is_first = pa.array(seq == 0)

    # Java trim parity (OldLogReader.scala:50): chunk 0 trims both ends;
    # chunk k>=1 re-gains its split-away leading delimiter as a uniform
    # "---- " prefix and right-trims (rtrim before concat == rtrim after,
    # with the all-whitespace segment collapsing to exactly "----")
    rt = pc.ascii_rtrim(segs, characters=_WS)
    text = pc.if_else(
        is_first,
        pc.ascii_ltrim(rt, characters=_WS),
        pc.if_else(
            pc.equal(rt, ""), "----", pc.binary_join_element_wise(pa.scalar("----"), rt, " ")
        ),
    )
    if isinstance(text, pa.ChunkedArray):  # pragma: no cover - small batches stay flat
        text = text.combine_chunks()

    buf, offs = _str_buf(text)
    starts, lengths = offs[:-1], np.diff(offs)
    nl_pos = pc.find_substring(text, "\n").to_numpy(zero_copy_only=False)
    has_nl = nl_pos >= 0

    first_line = pc.list_element(pc.split_pattern(text, "\n", max_splits=1), 0)
    id_token = pc.struct_field(pc.extract_regex(first_line, _ID_PAT), "t")
    record_id = pc.fill_null(_canonical_ids(id_token), "")
    tbl_token = pc.struct_field(pc.extract_regex(first_line, _TABLE_PAT), "t")
    table_norm = pc.fill_null(
        pc.if_else(
            pc.starts_with(tbl_token, "ros."), pc.utf8_slice_codeunits(tbl_token, 4), tbl_token
        ),
        "",
    )
    has_table = pc.not_equal(table_norm, "").to_numpy(zero_copy_only=False)

    ts = _parse_dates(buf, starts, lengths)
    ts_ok = ts >= 0
    oversize = lengths > MAX_PAYLOAD_BYTES  # ASCII: bytes == chars

    # status precedence identical to parse_ref.parse_page's early returns
    codes = np.zeros(len(lengths), dtype=np.int64)  # 0 = OK
    codes[oversize] = 4
    codes[~has_table] = 3
    codes[~ts_ok] = 2
    codes[~has_nl] = 1
    status = pc.take(_STATUS_LOOKUP, pa.array(codes))

    hashes = record_hash_offsets(buf, starts, lengths, np.where(ts_ok, ts, 0))

    table_out = pc.if_else(pa.array((codes == 0) | (codes == 4)), table_norm, "")
    rid_out = pc.if_else(pa.array(codes == 1), "", record_id)
    ts_out = pa.array(np.where(ts_ok, ts, 0), pa.int64(), mask=(~ts_ok) | (codes == 1))
    hash_out = pa.array(hashes, pa.int32(), mask=codes != 0)

    return pa.table(
        {
            "url": pc.take(url, page_idx),
            "warc_ts": pc.take(warc_ts, page_idx),
            "lang": pc.take(lang, page_idx),
            "seq": pa.array(seq.astype(np.int32)),
            "status": status,
            "table": table_out,
            "record_id": rid_out,
            "ts_millis": ts_out,
            "text": text,
            "n_bytes": pa.array(lengths, pa.int64()),
            "record_hash": hash_out,
        }
    )


def parse_pages_residue(
    url: pa.Array, warc_ts: pa.Array, lang: pa.Array, html: pa.Array
) -> pa.Table:
    """Per-record parse_ref path for the non-ASCII residue, assembled
    straight into Arrow arrays (no pandas)."""
    cols: dict[str, list] = {k: [] for k in ("pidx", "seq", "status", "table", "record_id", "ts", "text")}
    for i, hv in enumerate(html):
        for r in parse_page(hv.as_py()):
            cols["pidx"].append(i)
            cols["seq"].append(r.seq)
            cols["status"].append(r.status)
            cols["table"].append(r.table or "")
            cols["record_id"].append(r.record_id or "")
            cols["ts"].append(r.ts_millis)
            cols["text"].append(r.text)
    pidx = pa.array(cols["pidx"], pa.int64())
    datas = [t.encode("utf-8") for t in cols["text"]]
    from log_server_spark.functions.hashing import record_hash_batch

    ts_arr = np.array([t if t is not None else 0 for t in cols["ts"]], dtype=np.int64)
    hashes = record_hash_batch(datas, ts_arr)
    ok = np.array([st == OK for st in cols["status"]], dtype=bool)
    return pa.table(
        {
            "url": pc.take(url, pidx),
            "warc_ts": pc.take(warc_ts, pidx),
            "lang": pc.take(lang, pidx),
            "seq": pa.array(cols["seq"], pa.int32()),
            "status": pa.array(cols["status"], pa.string()),
            "table": pa.array(cols["table"], pa.string()),
            "record_id": pa.array(cols["record_id"], pa.string()),
            "ts_millis": pa.array(cols["ts"], pa.int64()),
            "text": pa.array(cols["text"], pa.string()),
            "n_bytes": pa.array([len(d) for d in datas], pa.int64()),
            "record_hash": pa.array(
                [int(h) if o else None for h, o in zip(hashes, ok)], pa.int32()
            ),
        }
    )


def parse_record_batch(batch: pa.RecordBatch) -> pa.Table:
    """One Arrow batch of pages -> records table (ASCII + mixed-encoding
    vectorized paths; both end in the shared segment kernels)."""
    url, warc_ts, lang = batch.column(0), batch.column(1), batch.column(2)
    html = pc.fill_null(batch.column(3), b"")
    mask = _ascii_mask(html)
    parts = []
    if mask.all():
        return parse_pages_ascii(url, warc_ts, lang, html)
    a_idx = pa.array(np.nonzero(mask)[0])
    r_idx = pa.array(np.nonzero(~mask)[0])
    if len(a_idx):
        parts.append(
            parse_pages_ascii(
                pc.take(url, a_idx), pc.take(warc_ts, a_idx), pc.take(lang, a_idx), pc.take(html, a_idx)
            )
        )
    if len(r_idx):
        parts.append(
            parse_pages_residue(
                pc.take(url, r_idx), pc.take(warc_ts, r_idx), pc.take(lang, r_idx), pc.take(html, r_idx)
            )
        )
    return pa.concat_tables(parts)

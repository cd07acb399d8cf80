"""Deterministic synthetic pages + lookup-table generator.

Pure function of ``(seed, n)`` — no external data (FIXTURES.md §1). Produces
the ``input_hint`` table ``(url string, warc_ts timestamp, html binary,
text string, lang string)`` where ``html`` embeds 1..3 parseable legacy log
records (header ``---- yyyy-MM-dd HH:mm:ss ... table:<t> id:<n>`` + body,
records separated by a blank line so the on-page byte stream contains the
reference delimiter ``\\n\\n---- ``).

Planted row classes (deterministic by row index; FIXTURES.md §1):
- exact duplicates (same url/warc_ts/html)       -> dedup keeps one
- same-url new versions (different html/ts)      -> all kept
- malformed: header-only (no newline), bad date slice, missing table tag
- cp1251-encoded pages (invalid UTF-8, valid cp1251)
- ``ros.``-prefixed stream tags                  -> normalization path
- hot-domain skew: domain[0] holds ``hot_pct`` of rows

Also emits the broadcast-join lookup sides ``lang_lookup`` and
``domain_lookup`` (FIXTURES.md §2; a few page domains are absent from
domain_lookup to exercise the left-join null path).
"""

from __future__ import annotations

import os
from datetime import datetime, timedelta, timezone

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

LANGS = ["en", "ru", "de", "fr", "es", "zh", "ja", "pt", "it", "nl"]
_LANG_PROBS = np.array([0.38, 0.14, 0.10, 0.09, 0.08, 0.06, 0.05, 0.04, 0.03, 0.03])
TABLES = ["users", "orders", "events", "payments", "sessions"]
OPS = ["create", "update", "delete", "read", "sync"]
_WORDS = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi "
    "omicron pi rho sigma tau upsilon phi chi psi omega request response batch "
    "commit rollback shard replica index scan merge flush"
).split()
_RU_WORDS = "привет мир тест данные запись журнал сервер индекс поток сегмент".split()

N_DOMAINS = 100
BASE_TS = datetime(2024, 3, 1, tzinfo=timezone.utc)
WINDOW_SECONDS = 30 * 24 * 3600


def _domains() -> list[str]:
    tlds = ["com", "org", "net", "io", "dev"]
    return [f"d{k:03d}.example.{tlds[k % 5]}" for k in range(N_DOMAINS)]


def _fmt(dt: datetime) -> str:
    return dt.strftime("%Y-%m-%d %H:%M:%S")


def _body_pool(rng: np.random.Generator, size: int = 512, mean_words: int = 160) -> list[str]:
    """Deterministic pool of page bodies (~1-3 KB each — Common-Crawl-ish
    text volume so parse/hash compute, not per-row overhead, dominates)."""
    pool = []
    for _ in range(size):
        n_words = int(rng.integers(mean_words // 2, mean_words * 2))
        idx = rng.integers(0, len(_WORDS), size=n_words)
        pool.append(" ".join(_WORDS[i] for i in idx))
    return pool


def _record(ts: datetime, table: str, rid: int | str | None, op: str, body: str, ru: bool) -> str:
    idtok = f" id:{rid}" if rid is not None else ""
    header = f"---- {_fmt(ts)} level:INFO table:{table}{idtok} op:{op}"
    if ru:
        body = body + " " + " ".join(_RU_WORDS[:4])
    return f"{header}\n{body}\nstatus=done bytes={len(body)}"


def gen_pages(seed: int = 42, n: int = 10_000, hot_pct: float = 0.30) -> pa.Table:
    rng = np.random.default_rng(seed)
    domains = _domains()

    hot = rng.random(n) < hot_pct
    dom_idx = np.where(hot, 0, 1 + rng.integers(0, N_DOMAINS - 1, size=n))
    lang_choice = rng.choice(len(LANGS), size=n, p=_LANG_PROBS)
    ts_off = rng.integers(0, WINDOW_SECONDS, size=n)
    pool = _body_pool(rng)
    body_idx = rng.integers(0, len(pool), size=n)
    rid_draw = rng.integers(1, 1_000_000, size=n)
    op_idx = rng.integers(0, len(OPS), size=n)
    tbl_idx = rng.integers(0, len(TABLES), size=n)

    urls: list[str] = []
    tss: list[datetime] = []
    htmls: list[bytes] = []
    texts: list[str] = []
    langs: list[str] = []

    for i in range(n):
        if i % 13 == 6 and i > 0:
            # exact duplicate of the previous page (LogServerSpecInt:40-41)
            urls.append(urls[-1])
            tss.append(tss[-1])
            htmls.append(htmls[-1])
            texts.append(texts[-1])
            langs.append(langs[-1])
            continue

        is_ru = i % 19 == 3
        lang = "ru" if is_ru else LANGS[lang_choice[i]]
        dom = domains[dom_idx[i]]
        same_url_new_version = i % 17 == 9 and i > 0
        url = urls[-1] if same_url_new_version else f"https://{dom}/p/{i:09d}"
        ts = BASE_TS + timedelta(seconds=int(ts_off[i]))
        table = TABLES[tbl_idx[i]]
        if i % 11 == 5:
            table = "ros." + table
        rid: int | str | None = None if i % 7 == 2 else int(rid_draw[i])
        if i % 29 == 21 and rid is not None:
            # string RecordId variant (RecordId.scala:67-75): a non-numeric
            # token exercises the String branch of RecordId.parse coercion
            rid = f"u{rid}"
        elif i % 29 == 13 and rid is not None:
            # zero-padded numeric token: RecordId.parse canonicalizes to int
            rid = f"{rid:09d}"
        op = OPS[op_idx[i]]
        body = f"{pool[body_idx[i]]} uniq{i}"

        if i % 23 == 7:
            # malformed: header only, no newline -> err_no_newline
            html_s = f"---- {_fmt(ts)} level:WARN table:{table} lonely-header-no-body"
        elif i % 23 == 11:
            # malformed: corrupt date slice -> err_bad_date
            html_s = f"---- not-a-valid-datetime! table:{table} id:{rid or 1}\n" + body
        elif i % 23 == 15:
            # malformed: no table tag -> err_missing_table
            html_s = f"---- {_fmt(ts)} level:INFO id:{rid or 1} op:{op}\n" + body
        else:
            recs = [_record(ts, table, rid, op, body, is_ru)]
            if i % 5 == 0:
                recs.append(
                    _record(ts + timedelta(seconds=60), table, rid, OPS[(op_idx[i] + 1) % len(OPS)], pool[(body_idx[i] + 1) % len(pool)], is_ru)
                )
            html_s = "\n\n".join(recs)

        html = html_s.encode("cp1251", errors="replace") if is_ru else html_s.encode("utf-8")
        urls.append(url)
        tss.append(ts)
        htmls.append(html)
        texts.append(html_s)
        langs.append(lang)

    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us", tz="UTC")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def gen_lang_lookup() -> pa.Table:
    families = {
        "en": "germanic", "de": "germanic", "nl": "germanic",
        "ru": "slavic", "fr": "romance", "es": "romance", "pt": "romance",
        "it": "romance", "zh": "sinitic", "ja": "japonic",
    }
    names = {
        "en": "English", "ru": "Russian", "de": "German", "fr": "French",
        "es": "Spanish", "zh": "Chinese", "ja": "Japanese", "pt": "Portuguese",
        "it": "Italian", "nl": "Dutch",
    }
    extra = [f"x{k:02d}" for k in range(20)]
    langs = LANGS + extra
    return pa.table(
        {
            "lang": pa.array(langs),
            "lang_name": pa.array([names.get(l, f"Lang-{l}") for l in langs]),
            "lang_family": pa.array([families.get(l, "other") for l in langs]),
        }
    )


def gen_domain_lookup() -> pa.Table:
    # 90 of the 100 page domains; every 10th is deliberately absent
    doms = [d for k, d in enumerate(_domains()) if k % 10 != 9]
    cats = ["news", "blog", "shop", "docs", "forum"]
    return pa.table(
        {
            "domain": pa.array(doms),
            "category": pa.array([cats[k % 5] for k in range(len(doms))]),
            "country": pa.array([["us", "de", "ru", "fr", "jp"][k % 5] for k in range(len(doms))]),
            "is_error_prone": pa.array([k % 7 == 0 for k in range(len(doms))]),
        }
    )


def write_dataset(out_dir: str, seed: int = 42, n: int = 10_000, num_files: int = 8, hot_pct: float = 0.30) -> str:
    """Write pages/ (num_files parquet parts = resume/lineage units) + lookups."""
    os.makedirs(os.path.join(out_dir, "pages"), exist_ok=True)
    tbl = gen_pages(seed=seed, n=n, hot_pct=hot_pct)
    per = (tbl.num_rows + num_files - 1) // num_files
    for f in range(num_files):
        part = tbl.slice(f * per, per)
        if part.num_rows == 0:
            break
        pq.write_table(part, os.path.join(out_dir, "pages", f"part-{f:05d}.parquet"), compression="zstd")
    pq.write_table(gen_lang_lookup(), os.path.join(out_dir, "lang_lookup.parquet"))
    pq.write_table(gen_domain_lookup(), os.path.join(out_dir, "domain_lookup.parquet"))
    return out_dir


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--n", type=int, default=10_000)
    ap.add_argument("--num-files", type=int, default=8)
    ap.add_argument("--hot-pct", type=float, default=0.30)
    a = ap.parse_args()
    print(write_dataset(a.out_dir, a.seed, a.n, a.num_files, a.hot_pct))

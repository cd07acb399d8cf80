"""Regenerate tests/golden/parse_golden.json from parse_ref over
gen_pages(seed=42, n=400).

The golden pins parse_ref's semantics; regenerate ONLY on a deliberate,
documented semantics change (e.g. the round-2 RecordId.parse string-id
generalization), never to paper over drift.
"""

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from log_server_spark.datagen import gen_pages  # noqa: E402
from log_server_spark.parse_ref import parse_page  # noqa: E402

out = []
tbl = gen_pages(seed=42, n=400)
for url, html in zip(tbl["url"].to_pylist(), tbl["html"].to_pylist()):
    for r in parse_page(html):
        data = r.text.encode("utf-8")
        out.append(
            {
                "url": url,
                "seq": r.seq,
                "status": r.status,
                "table": r.table or "",
                "record_id": r.record_id or "",
                "ts_millis": r.ts_millis,
                "text_sha256": hashlib.sha256(data).hexdigest(),
                "text_bytes": len(data),
            }
        )

path = os.path.join(os.path.dirname(__file__), "..", "tests", "golden", "parse_golden.json")
with open(path, "w") as f:
    json.dump(out, f, indent=0)
print(f"wrote {len(out)} rows to {path}")

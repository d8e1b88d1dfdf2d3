#!/usr/bin/env python
"""Generate the hash-strength expectation for the rows-only driver query
``text_bpe_suite`` 'tokens' leg (round-7 verdict item 6; fused round 15).

Uses ONLY the pure-python reference encoder (`bpe_encode_word`) over the
sf0.01 documents parquet — no Spark, no pandas_udf — so the pinned digest
is an INDEPENDENT implementation's answer, not a snapshot of the engine's
own output.  ``tests/test_bpe_tokenize.py::
test_bpe_stats_sf001_match_reference_digest`` recomputes the digest from
the engine's Arrow-batched path and must reproduce it bit-for-bit.

Usage: python scripts/gen_bpe_fixture.py  # rewrites tests/fixtures/...
"""

from __future__ import annotations

import hashlib
import json
import sys
from pathlib import Path

import pyarrow.parquet as pq

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from global_market_index_etl_spark.operators.tokenize import (  # noqa: E402
    DEFAULT_MERGES,
    bpe_encode_word,
)

SF_DIR = "/root/testdata/sf0.01"
OUT = REPO / "tests" / "fixtures" / "bpe_stats_sf0.01.json"


def main() -> None:
    table = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    rows = []
    for doc_id, text in zip(
        table["doc_id"].to_pylist(), table["text"].to_pylist()
    ):
        total = single = 0
        for w in (text or "").lower().split():
            pieces = bpe_encode_word(w, DEFAULT_MERGES)
            total += len(pieces)
            single += sum(1 for p in pieces if len(p) == 1)
        rows.append((doc_id, total, single))
    rows.sort()
    digest = hashlib.sha256(
        "\n".join(f"{d}\t{t}\t{s}" for d, t, s in rows).encode()
    ).hexdigest()
    OUT.parent.mkdir(parents=True, exist_ok=True)
    OUT.write_text(
        json.dumps(
            {
                "sf_dir": SF_DIR,
                "n_docs": len(rows),
                "sum_tokens": sum(t for _, t, _ in rows),
                "sum_singletons": sum(s for _, _, s in rows),
                "sha256": digest,
                "generator": "scripts/gen_bpe_fixture.py (pure-python path)",
            },
            indent=1,
        )
        + "\n"
    )
    print(f"wrote {OUT}: {len(rows)} docs, sha256={digest[:16]}…")


if __name__ == "__main__":
    main()

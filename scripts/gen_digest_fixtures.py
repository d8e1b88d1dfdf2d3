#!/usr/bin/env python
"""Pin full-table sha256 digests for the rows-only driver rows that
previously validated by execution + pytest twins alone (round-9 verdict
item 4): ``ann_pq_rerank`` and ``mm_real_decode_stats`` at sf0.01.

Both queries are deterministic BY CONSTRUCTION and their arithmetic is
independently parity-tested (PQ: pure-numpy encode/ADC reference +
rerank>=corpus ≡ brute force, tests/test_extensions.py; codecs: byte-level
PNG/GIF/JPEG/WAV/AVI round-trips, tests/test_gif_codec.py). What execution
checks CANNOT catch is silent drift — a changed seed-pool bound, a codec
tweak, a reordered fold — so this script freezes the exact full-table
output once and tests/test_oracle_parity.py re-derives the digest every
run: any value change fails loudly and must re-pin HERE, with intent.

Run from the repo root:  python scripts/gen_digest_fixtures.py
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF_DIR = "/root/testdata/sf0.01"
# Round 10 widened the pin set from the original two to EVERY rows-only
# registry row that reproduced bit-identically across disjoint parallelism
# settings (local[5]/5 shuffle partitions vs local[17]/23 — verified before
# pinning): seeded LSH hyperplanes, bounded hash-ordered IVF training,
# xxhash64 SimHash, the deterministic market-source walk, the stub codec
# features, and the HLL++/quantile sketch profile are all pure functions
# of the input multiset. text_bpe_suite's legs keep their own
# dedicated fixture pins (tests/test_bpe_tokenize.py).
QUERIES = [
    "mm_real_decode_stats",
    # round 14: ann_ivf_topk graduated to a FULL oracle (exhaustive dial
    # ≡ brute force — the brute SQL applies verbatim); the engine-side
    # production dial keeps its value pin as a named builder. Round 15:
    # ann_pq_rerank graduated the same way; its production dial
    # (rerank=20) pins here as ann_pq_prod.
    "ann_ivf_prod",
    "ann_pq_prod",
    "dedup_semantic",
    # dedup_simhash graduated to a full DuckDB oracle in round 11;
    # ann_lsh_topk followed in round 12 (md5-derived Rademacher planes)
    "e1_pipeline_market_bars",
    "mm_decode_features",
    "sketch_event_profile",
    # round 12: incremental pHash vs the persisted signature index —
    # byte-exact PNG codec + exact DCT-II, reproducibility across
    # disjoint parallelism verified before pinning
    "dedup_incremental_phash",
]


def render_cell(v) -> str:
    """Canonical, type-faithful cell rendering (repr keeps float bits)."""
    if v is None:
        return "∅"
    if isinstance(v, float):
        return repr(v)
    return str(v)


def table_digest(df) -> tuple[int, str]:
    cols = sorted(df.columns)
    rows = sorted(
        "\t".join(render_cell(r[c]) for c in cols) for r in df.collect()
    )
    return len(rows), hashlib.sha256("\n".join(rows).encode()).hexdigest()


def _builders():
    """Pinned callables that are NOT registry rows (the registry row
    covers a fully-oracled dial; the engine-side dial pins here)."""
    from global_market_index_etl_spark.plans.textdata import (
        ann_ivf_prod_leg,
        ann_pq_prod_leg,
    )

    return {"ann_ivf_prod": ann_ivf_prod_leg, "ann_pq_prod": ann_pq_prod_leg}


def main() -> None:
    from global_market_index_etl_spark.plans import REGISTRY
    from global_market_index_etl_spark.session import get_spark

    # optional argv filter: re-pin only the named queries (adding a new
    # pin must not silently re-freeze every existing fixture — a drifted
    # digest should fail the suite and be re-pinned with intent)
    names = sys.argv[1:] or QUERIES
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"not in the pin set {unknown}; add to QUERIES first")
    spark = get_spark(app_name="gmie-digest-fixtures")
    builders = _builders()
    for name in names:
        build = builders.get(name) or REGISTRY[name].spark
        df = build(spark, SF_DIR)
        n, digest = table_digest(df)
        out = os.path.join(
            ROOT, "tests", "fixtures", f"{name}_digest_sf0.01.json"
        )
        with open(out, "w", encoding="utf-8") as fh:
            json.dump(
                {
                    "query": name,
                    "sf_dir": SF_DIR,
                    "columns": sorted(df.columns),
                    "n_rows": n,
                    "sha256": digest,
                },
                fh,
                indent=1,
            )
        print(f"{name}: {n} rows, sha256={digest[:16]}… → {out}")


if __name__ == "__main__":
    main()

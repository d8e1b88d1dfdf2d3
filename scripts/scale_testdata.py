"""Scale the driver's sf0.1 fixtures to an sf1-equivalent dataset.

The driver ships sf{0.001,0.01,0.1} only; the scale-headroom validation
(BASELINE.md "sf0.1 -> sf1 growth") needs a 10x dataset with the SAME
workload shape. This script builds one deterministically from sf0.1:

- dimension tables (region, nation) are copied unchanged — scale factor
  does not grow them in TPC-H either;
- every keyed table becomes REPLICAS key-offset copies, with offsets
  applied consistently across fact/dim pairs (l_orderkey and o_orderkey
  shift together, o_custkey and c_custkey together, ...) so join
  fan-out, selectivities, and group cardinalities scale linearly;
- nationkey columns are NOT offset (nation stays 25 rows);
- documents.text is perturbed per copy by deleting every (i+2)-th word:
  each deleted word kills the 3 shingles covering it, so replica i sits
  at 3-gram Jaccard ~0.6 or less against the original and against every
  other replica (deletion strides differ), while EXACT dup pairs inside
  one replica map to exact dup pairs — near-dup cluster sizes stay
  original-sized and dedup pair counts grow ~linearly, instead of
  quadratically like naive row duplication (every copy a near-dup of
  every other) would;
- embeddings are circularly rotated by i components per copy: norms and
  component distributions are untouched, but rotations of random vectors
  are near-orthogonal, so near-dup pairs do not form between replicas;
- timestamps/dates/measures are left untouched — per-key densities and
  per-window row counts grow exactly 10x.

Usage: python scripts/scale_testdata.py [--out /tmp/sf1] [--replicas 10]
"""

from __future__ import annotations

import argparse
import shutil
from pathlib import Path

import duckdb

SRC = "/root/testdata/sf0.1"

# table -> {column: offset-group}; every column in one group shifts by the
# same per-replica stride (that group's global max key + 1)
KEYED = {
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {
        "l_orderkey": "order",
        "l_partkey": "part",
        "l_suppkey": "supp",
    },
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}
COPY_ONLY = ["region", "nation"]

GROUP_SOURCE = {  # offset-group -> (table, column) holding the global max
    "cust": ("customer", "c_custkey"),
    "supp": ("supplier", "s_suppkey"),
    "part": ("part", "p_partkey"),
    "order": ("orders", "o_orderkey"),
    "event": ("events", "event_id"),
    "user": ("events", "user_id"),
    "doc": ("documents", "doc_id"),
    "vec": ("embeddings", "vec_id"),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/sf1")
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--src", default=SRC)
    ap.add_argument(
        "--tables",
        default=None,
        help="comma-separated subset to build (default: all); the "
        "30x scale smoke only needs documents,embeddings",
    )
    ap.add_argument(
        "--hot-every",
        type=int,
        default=0,
        help="adversarial-skew plant (round-13 verdict item 5): append "
        "ONE fixed 50-token block to every document whose source doc_id "
        "is divisible by this value (1 = every doc), across ALL "
        "replicas. The block is a single window fingerprint with "
        "n_docs/hot_every occurrences — the mega-hot license-header "
        "shape that concentrates on one reducer under an unsalted "
        "fingerprint reduction. 0 (default) disables.",
    )
    ap.add_argument(
        "--unique-every",
        type=int,
        default=0,
        help="mostly-unique-window variant (round-14 verdict item 5): "
        "insert a replica+position-unique marker token before every "
        "N-th word of each i>0 replica's documents (AFTER the standard "
        "perturbation). With N < k every k-token window contains a "
        "marker no other replica shares, so cross-replica window "
        "fingerprints are singletons — the corpus grows 30x in SIZE "
        "while per-window occupancy stays at the 1x corpus's level, "
        "the shape where occupancy-adaptive salting should show "
        "near-linear span-tier growth (the plain replicate corpus "
        "makes every window ~30-doc hot by construction, so it "
        "structurally cannot). Within-replica exact-dup structure is "
        "preserved (pure function of the text). 0 (default) disables.",
    )
    args = ap.parse_args()
    subset = set(args.tables.split(",")) if args.tables else None
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    con = duckdb.connect()
    strides = {
        g: con.sql(
            f"SELECT max({c}) + 1 FROM '{args.src}/{t}.parquet'"
        ).fetchone()[0]
        for g, (t, c) in GROUP_SOURCE.items()
    }

    for t in COPY_ONLY:
        if subset is not None and t not in subset:
            continue
        shutil.copyfile(f"{args.src}/{t}.parquet", out / f"{t}.parquet")
        print(f"{t}: copied")

    # 50 tokens no real/junk word shares ('hotw<j>' vs 'r<i>w<k>'): one
    # window fingerprint at min_len=50 (and 43 k=8 windows) per planted doc.
    hot_block = " ".join(f"hotw{j}" for j in range(50))

    for t, key_groups in KEYED.items():
        if subset is not None and t not in subset:
            continue
        selects = []
        cols = con.sql(f"SELECT * FROM '{args.src}/{t}.parquet' LIMIT 0").columns
        for i in range(args.replicas):
            proj = []
            for c in cols:
                if c in key_groups:
                    proj.append(f"{c} + {i * strides[key_groups[c]]} AS {c}")
                elif t == "documents" and c == "text" and i > 0:
                    # Two stacked perturbations so replicas stay below the
                    # 0.8 Jaccard near-dup threshold at ANY replica count:
                    # (a) delete every (i+2)-th word — strong for small i,
                    #     weakens as the stride grows (~3/(i+2) of shingles
                    #     die, and a stride longer than the doc deletes
                    #     nothing); (b) prefix max(n/5, 9) VARIED
                    #     replica-unique junk words ('r{i}w{k}') — adds
                    #     that many distinct shingles no other replica
                    #     shares, capping J at ≤ ~0.75 even when the
                    #     deletion is inert (the floor covers short docs,
                    #     where 2 junk words left J at 0.81 — observed as
                    #     quadratic cross-replica pairs at 30 replicas).
                    #     Exact-dup structure within a replica is preserved
                    #     (the transform is a pure function of the text).
                    body = (
                        "list_filter(string_split(text, ' '),"
                        f" (w, j) -> j % {i + 2} != 0)"
                    )
                    junk = (
                        "list_transform(range(1, greatest(10, "
                        f"len(string_split(text, ' ')) // 5 + 1)), x -> "
                        f"'r{i}w' || x::VARCHAR)"
                    )
                    proj.append(
                        f"array_to_string(list_concat({junk}, {body}), ' ')"
                        " AS text"
                    )
                elif t == "embeddings" and c == "embedding" and i > 0:
                    # circular rotation: same norm/distribution, rotations
                    # of random vectors are near-orthogonal
                    proj.append(
                        f"embedding[{i + 1}:] || embedding[1:{i}] AS embedding"
                    )
                else:
                    proj.append(c)
            if t == "documents" and args.unique_every > 0 and i > 0:
                # wrap the (already-perturbed) text with a marker token
                # 'u<i>p<block>' before every N-th word: replica- AND
                # position-unique, so no k>N window fingerprint can
                # repeat across replicas; applied BEFORE any hot plant
                # so a planted block would stay intact.
                for idx, p in enumerate(proj):
                    if p == "text" or p.endswith(" AS text"):
                        base = (
                            "text" if p == "text"
                            else p[: -len(" AS text")]
                        )
                        proj[idx] = (
                            "array_to_string(list_transform("
                            f"string_split({base}, ' '), (w, j) -> "
                            f"CASE WHEN j % {args.unique_every} = 0 "
                            f"THEN 'u{i}p' || (j // {args.unique_every})"
                            "::VARCHAR || ' ' || w "
                            "ELSE w END), ' ') AS text"
                        )
            if t == "documents" and args.hot_every > 0:
                # append the hot block AFTER perturbation so every planted
                # copy carries the intact 50-token window; key off the
                # SOURCE doc_id (pre-offset) so the plant rate is uniform
                # across replicas.
                for idx, p in enumerate(proj):
                    if p == "text" or p.endswith(" AS text"):
                        base = (
                            "text" if p == "text"
                            else p[: -len(" AS text")]
                        )
                        proj[idx] = (
                            f"CASE WHEN doc_id % {args.hot_every} = 0 "
                            f"THEN ({base}) || ' {hot_block}' "
                            f"ELSE ({base}) END AS text"
                        )
            selects.append(
                f"SELECT {', '.join(proj)} FROM '{args.src}/{t}.parquet'"
            )
        sql = " UNION ALL ".join(selects)
        con.sql(
            f"COPY ({sql}) TO '{out / (t + '.parquet')}' (FORMAT PARQUET)"
        )
        n = con.sql(f"SELECT count(*) FROM '{out / (t + '.parquet')}'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()

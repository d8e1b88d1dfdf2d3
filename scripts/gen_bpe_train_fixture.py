#!/usr/bin/env python
"""Generate the pinned merge-list expectation for the rows-only driver
query ``text_bpe_suite`` 'train' leg (round-8 verdict item 3; fused round 15).

Like gen_bpe_fixture.py this uses ONLY pure python — an independent
from-scratch BPE trainer that recounts every pair each iteration (no
Spark, no incremental updates) over the sf0.01 documents parquet — so the
pinned 16-merge list is an independent implementation's answer, not a
snapshot of the engine's own output.  ``tests/test_bpe_tokenize.py::
test_bpe_train_sf001_matches_pinned_fixture`` runs the engine's FORCED
DISTRIBUTED trainer (the exact configuration of the driver row) and must
reproduce the list exactly.

Usage: python scripts/gen_bpe_train_fixture.py  # rewrites tests/fixtures/...
"""

from __future__ import annotations

import json
from collections import Counter
from pathlib import Path

import pyarrow.parquet as pq

REPO = Path(__file__).resolve().parent.parent

SF_DIR = "/root/testdata/sf0.01"
K = 16  # must match the text_bpe_suite 'train' leg
OUT = REPO / "tests" / "fixtures" / "bpe_train_merges_sf0.01.json"


def naive_trainer(texts: list[str], k: int) -> list[tuple[str, str]]:
    """Deliberately the dumbest correct trainer: full pair recount per
    iteration, ties broken lexicographically (the engine's contract)."""
    words: Counter = Counter()
    for t in texts:
        for w in (t or "").lower().split():
            if w:
                words[tuple(w)] += 1
    vocab = dict(words)
    merges: list[tuple[str, str]] = []
    for _ in range(k):
        pairs: Counter = Counter()
        for syms, c in vocab.items():
            for p in zip(syms, syms[1:]):
                pairs[p] += c
        live = [(p, c) for p, c in pairs.items() if c > 0]
        if not live:
            break
        best = min(live, key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        new_vocab: dict = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def main() -> None:
    table = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["text"])
    merges = naive_trainer(table["text"].to_pylist(), K)
    OUT.parent.mkdir(parents=True, exist_ok=True)
    OUT.write_text(
        json.dumps(
            {
                "sf_dir": SF_DIR,
                "k": K,
                "merges": [
                    {"rank": i, "left": a, "right": b, "merged": a + b}
                    for i, (a, b) in enumerate(merges)
                ],
            },
            indent=1,
        )
        + "\n"
    )
    print(f"wrote {OUT} ({len(merges)} merges)")


if __name__ == "__main__":
    main()

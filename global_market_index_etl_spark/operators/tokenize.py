"""Byte-pair-encoding tokenizer — real merges, Arrow-batched execution.

The text tier counts tokens two cheap ways (whitespace, BPE-ish regex —
operators/text.py); a training-data pipeline ultimately needs the REAL
thing: the iterative greedy merge procedure of Sennrich et al. / GPT-2,
whose output length is what token budgets, packing, and billing actually
measure.  The merge loop is inherently sequential per word — no SQL or
codegen form exists — so this is a legitimate Python-path operator: a
``pandas_udf`` batch maps each text through the encoder with Arrow
transfer, the same discipline as the media codecs (operators/jpeg.py).

The merge table is a FIXED, documented constant (common English pairs in
priority order), not trained at runtime: encoding is a pure deterministic
function of the input, reproducible across runs/partitions/engines, and a
production vocabulary swaps in via the ``merges`` argument without
touching the machinery.  Word-level results are memoized per batch (Zipf:
a few thousand distinct words cover most text), which is what makes the
Python loop tractable at Arrow-batch granularity.

Scale: embarrassingly parallel over rows; no shuffle.  The cost model is
pure CPU on the executor Python workers — on a 100 TB corpus the operator
pipelines behind the scan exactly like the JPEG decode path, and the
memo hit-rate rises with batch size.
"""

from __future__ import annotations

from functools import lru_cache

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["DEFAULT_MERGES", "bpe_encode_word", "bpe_token_stats"]

# Priority-ordered merge rules (earlier = higher priority), the public BPE
# formulation: start from characters, repeatedly apply the highest-priority
# rule whose pair is adjacent. A small English-frequency table — stand-in
# for a trained vocabulary, swappable without changing the algorithm.
DEFAULT_MERGES: tuple[tuple[str, str], ...] = (
    ("t", "h"), ("th", "e"), ("i", "n"), ("e", "r"), ("a", "n"),
    ("r", "e"), ("o", "n"), ("a", "t"), ("e", "n"), ("o", "r"),
    ("e", "s"), ("t", "i"), ("a", "r"), ("te", "r"), ("a", "l"),
    ("s", "t"), ("in", "g"), ("an", "d"), ("o", "u"), ("i", "s"),
    ("i", "t"), ("o", "f"), ("t", "o"), ("e", "d"), ("c", "o"),
    ("er", "s"), ("l", "e"), ("l", "i"), ("the", "r"), ("at", "i"),
)


def _encode(word: str, ranks: dict[tuple[str, str], int]) -> tuple[str, ...]:
    parts = list(word)
    while len(parts) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(parts) - 1):
            r = ranks.get((parts[i], parts[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        parts[best_i : best_i + 2] = [parts[best_i] + parts[best_i + 1]]
    return tuple(parts)


def bpe_encode_word(
    word: str, merges: tuple[tuple[str, str], ...] = DEFAULT_MERGES
) -> tuple[str, ...]:
    """Encode one word — the pure-python reference the UDF is tested against."""
    return _encode(word, {pair: i for i, pair in enumerate(merges)})


def bpe_token_stats(
    docs: DataFrame,
    *,
    text_col: str = "text",
    merges: tuple[tuple[str, str], ...] = DEFAULT_MERGES,
) -> DataFrame:
    """Append real-BPE token statistics per document.

    Adds ``n_bpe_tokens`` (total BPE pieces) and ``n_bpe_singletons``
    (pieces that stayed single characters — the OOV-pressure signal a
    vocabulary report tracks).
    """
    ranks = {pair: i for i, pair in enumerate(merges)}

    @F.pandas_udf("n_bpe_tokens long, n_bpe_singletons long")
    def stats(texts: pd.Series) -> pd.DataFrame:
        @lru_cache(maxsize=65536)
        def enc(word: str) -> tuple[int, int]:
            pieces = _encode(word, ranks)
            return len(pieces), sum(1 for p in pieces if len(p) == 1)

        n_tok, n_single = [], []
        for t in texts:
            total = single = 0
            for w in (t or "").lower().split():
                a, b = enc(w)
                total += a
                single += b
            n_tok.append(total)
            n_single.append(single)
        return pd.DataFrame(
            {"n_bpe_tokens": n_tok, "n_bpe_singletons": n_single}
        )

    return (
        docs.withColumn("__bpe", stats(F.col(text_col)))
        .withColumns(
            {
                "n_bpe_tokens": F.col("__bpe.n_bpe_tokens"),
                "n_bpe_singletons": F.col("__bpe.n_bpe_singletons"),
            }
        )
        .drop("__bpe")
    )

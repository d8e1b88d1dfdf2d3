"""Corpus term statistics: TF-IDF scoring, document frequency, heavy
hitters (driver north star; training-data text-analysis tier alongside
operators/text.py).

Where text.py is strictly per-row (scan-speed, zero shuffle), these
operators are the *corpus-level* statistics — vocabulary discovery,
stopword/boilerplate identification, per-document salient terms — and
every shuffle is keyed and partially aggregated:

- TF: one shuffle on (doc, word) with map-side combine;
- DF: one shuffle on word over the already-unique (doc, word) pairs;
- top-k per doc: one shuffle on doc for the ranking window.

No corpus-sized broadcast anywhere: the vocabulary can be millions of
terms at 100 TB, so DF joins back to TF as an ordinary keyed shuffle join
(AQE converts it to broadcast when the filtered vocabulary is small). The
only broadcast is the 1-row corpus size.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from .text import words
from .util import parallelize_small as _parallelize_small


def term_frequencies(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, word, tf) — whitespace terms, lowercased. One partial-aggregated
    shuffle on (id, word)."""
    prepared = _parallelize_small(df.select(id_col, text_col)).withColumn(
        "__words", words(F.lower(F.col(text_col)))
    )
    return (
        prepared.select(F.col(id_col), F.explode("__words").alias("word"))
        .groupBy(id_col, "word")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def document_frequencies(tf: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(word, df) from the TF table — (id, word) is already unique there,
    so DF is a count, not a count-distinct (no second dedup shuffle)."""
    return tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))


def tfidf_top_terms(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    min_df: int = 1,
) -> DataFrame:
    """Top-k salient terms per document by smoothed TF-IDF:
    ``tf * (ln((N+1)/(df+1)) + 1)``, ties broken by word for a fully
    deterministic ranking. ``min_df`` drops hapax noise before the join.

    N is the total corpus document count, carried as a broadcast 1-row
    relation (no driver-side ``.count()`` action in the plan).
    """
    tf = term_frequencies(docs, id_col, text_col)
    dfreq = document_frequencies(tf, id_col)
    if min_df > 1:
        dfreq = dfreq.filter(F.col("df") >= min_df)
    n_docs = docs.agg(F.count(F.lit(1)).alias("__n_docs"))
    scored = (
        tf.join(dfreq, "word")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.col("tf")
            * (
                F.log(
                    (F.col("__n_docs") + F.lit(1)).cast("double")
                    / (F.col("df") + F.lit(1)).cast("double")
                )
                + F.lit(1.0)
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("tfidf"), F.asc("word")
    )
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= k)
        .select(id_col, "term_rank", "word", "tf", "df", "tfidf")
    )


def top_terms_global(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 20,
    by_document_frequency: bool = False,
) -> DataFrame:
    """Corpus heavy hitters: the k most frequent terms, by total occurrence
    count (default) or by document frequency. Partial-aggregated shuffle on
    word, then a TakeOrderedAndProject (no global sort materialization).
    Ties broken by word ascending.
    """
    if by_document_frequency:
        counts = document_frequencies(
            term_frequencies(docs, id_col, text_col), id_col
        ).select("word", F.col("df").alias("n"))
    else:
        prepared = _parallelize_small(docs.select(text_col)).withColumn(
            "__words", words(F.lower(F.col(text_col)))
        )
        counts = (
            prepared.select(F.explode("__words").alias("word"))
            .groupBy("word")
            .agg(F.count(F.lit(1)).alias("n"))
        )
    return counts.orderBy(F.desc("n"), F.asc("word")).limit(k)


def _cms_cell(term_col: str, row: int, width: int):
    """Row-``row`` cell index of a term — md5-derived, engine-portable
    (DuckDB: ``CAST(CONCAT('0x', substr(md5(i || ':' || term), 1, 8)) AS
    BIGINT) % width`` yields the identical integer)."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{row}:"), F.col(term_col))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        % width
    )


def count_min_cells(
    df: DataFrame,
    *,
    text_col: str = "text",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Count-min sketch of corpus term frequencies, built EXACTLY and
    distributively: ``(row, cell, cnt)`` — depth × width cells.

    Why a sketch when ``top_terms_global`` is exact: the exact heavy-hitter
    pass shuffles one row per DISTINCT term (vocabulary-sized — millions of
    keys at 100 TB, and the long tail dominates the shuffle); the sketch's
    shuffle key-space is FIXED at depth × width cells regardless of
    vocabulary, with partial aggregation collapsing each task's counts to
    ≤ depth·width rows before the exchange. The standard CMS guarantee
    holds (estimate ≥ true count; overestimate ≤ εN with prob 1−δ for
    width = e/ε, depth = ln 1/δ — Cormode & Muthukrishnan, J.Alg 2005).

    The cell hash is md5-derived (like operators/spans.py) so DuckDB
    reproduces the SAME sketch bit-for-bit — construction is
    oracle-checkable even though the sketch is approximate: approximation
    lives in the data structure, not in any nondeterminism.

    The sketch's ``depth``/``width`` ride along as literal columns on
    every cell row, so a persisted sketch (parquet deltas in
    streaming/sketches.py, the storage layer) is never dimensionless:
    :func:`count_min_estimate` reads the dimensions back from the cells
    and REFUSES a probe with mismatched dimensions — probing a 4×1024
    sketch with width 512 would hash into the wrong cells and could
    UNDERestimate (even return 0), the one direction the CMS contract
    forbids (round-8 review fix). Two int columns on ≤ depth·width rows
    cost nothing.
    """
    if depth < 1 or width < 2:
        raise ValueError(f"need depth >= 1, width >= 2; got {depth}, {width}")
    from .text import words

    terms = df.select(
        F.explode(words(F.lower(F.col(text_col)))).alias("__t")
    ).filter(F.col("__t") != "")
    rows = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"), _cms_cell("__t", i, width).alias("cell")
            )
            for i in range(depth)
        ]
    )
    return (
        terms.select(F.explode(rows).alias("__rc"))
        .groupBy(
            F.col("__rc.row").alias("row"), F.col("__rc.cell").alias("cell")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("depth", F.lit(int(depth)))
        .withColumn("width", F.lit(int(width)))
    )


def count_min_params(eps: float, delta: float) -> tuple[int, int]:
    """Size a sketch from an error budget: ``(depth, width)`` such that
    for every term, ``estimate ≤ true + eps·N`` (N = total term
    occurrences) with probability ≥ ``1 − delta`` — the standard CMS
    contract (Cormode & Muthukrishnan, J.Alg 2005): ``width = ⌈e/eps⌉``,
    ``depth = ⌈ln(1/delta)⌉``. Feed the result to
    :func:`count_min_cells`; the ``estimate ≥ true`` direction holds
    unconditionally."""
    import math

    if not 0.0 < eps < 1.0:
        raise ValueError(f"eps must be in (0, 1), got {eps}")
    if not 0.0 < delta < 1.0:
        raise ValueError(f"delta must be in (0, 1), got {delta}")
    width = max(2, math.ceil(math.e / eps))
    depth = max(1, math.ceil(math.log(1.0 / delta)))
    return depth, width


def count_min_estimate(
    cells: DataFrame,
    queries: DataFrame,
    *,
    term_col: str = "term",
    depth: int | None = None,
    width: int | None = None,
) -> DataFrame:
    """Point-estimate each query term against a :func:`count_min_cells`
    sketch: ``(term, cms_estimate)`` where estimate = min over the depth
    rows (0 when a cell is empty — the term never occurred).

    ``depth``/``width`` default to the dimensions RECORDED ON the sketch
    itself (count_min_cells stamps them on every cell row); passing them
    explicitly cross-checks against the recorded values and raises on
    mismatch — a dimension mismatch probes the wrong cells and can
    UNDERestimate, violating the ``estimate ≥ true`` contract (round-8
    review fix). The check is DELIBERATELY eager and driver-side: a
    wrong-width probe usually hashes into cells the sketch never
    occupied, so a lazy matched-row assertion would see no match and
    silently return the forbidden 0. To keep the eager read from
    doubling the work, the cells plan is ``localCheckpoint``-ed first —
    one bounded materialization (the merged sketch is ≤ depth × width
    rows by construction; for persisted state that's the one
    delta-merge pass the estimate needs anyway) that BOTH the dimension
    read and the lookup join reuse, instead of the dims aggregate and
    the join each re-executing the merge (round-9 review fix). A sketch
    with NO rows carries no dimensions, so an empty sketch requires
    explicit depth/width (estimates are then 0 — an empty corpus).

    ``queries`` is a bounded term list (heavy-hitter candidates, an
    allowlist); the fixed-size cell table (depth × width rows) is the
    broadcast side of the lookup join, so neither side ever shuffles.
    """
    # one materialization of the (≤ depth·width row) merge, shared by
    # the dims read below and the broadcast join — never two passes
    cells = cells.localCheckpoint(eager=True)
    dims = cells.agg(
        F.min("depth"), F.max("depth"), F.min("width"), F.max("width")
    ).first()
    if dims[0] is None:  # empty sketch — dimensions must come from the caller
        if depth is None or width is None:
            raise ValueError(
                "empty sketch carries no dimensions — pass depth and width"
            )
    else:
        if dims[0] != dims[1] or dims[2] != dims[3]:
            raise ValueError(
                f"sketch mixes dimensions (depth {dims[0]}..{dims[1]}, "
                f"width {dims[2]}..{dims[3]}) — deltas from differently-"
                "sized sketches cannot be merged"
            )
        if depth is None:
            depth = int(dims[0])
        elif depth != dims[0]:
            raise ValueError(
                f"depth {depth} does not match the sketch's recorded "
                f"depth {dims[0]}"
            )
        if width is None:
            width = int(dims[2])
        elif width != dims[2]:
            raise ValueError(
                f"width {width} does not match the sketch's recorded "
                f"width {dims[2]}"
            )
    probes = queries.select(term_col).distinct()
    probe_cells = probes.select(
        term_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        _cms_cell(term_col, i, width).alias("cell"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("__rc"),
    ).select(
        term_col,
        F.col("__rc.row").alias("row"),
        F.col("__rc.cell").alias("cell"),
    )
    # broadcast the CELL TABLE (depth × width rows — fixed-size by design):
    # a left-outer join can only build-broadcast its right side, so hinting
    # the probe side of the former right-join could never be honored and
    # silently degraded to a shuffle (round-8 review fix)
    joined = probe_cells.join(F.broadcast(cells), ["row", "cell"], "left")
    return joined.groupBy(term_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_estimate")
    )


def _hll_h60(key_col: str):
    """60-bit md5-derived hash of a key — engine-portable (DuckDB:
    ``CAST(('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 15)) AS BIGINT)``
    yields the identical integer; 15 hex chars keep the value positive
    in a signed 64-bit lane on every engine)."""
    return F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10
    ).cast("bigint")


def hll_registers(
    df: DataFrame,
    key_col: str,
    *,
    p: int = 10,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Portable HyperLogLog registers for approx-distinct of ``key_col``:
    ``(*group_cols, bucket, max_rho, p)`` — at most ``2^p`` rows per
    group, regardless of key cardinality.

    Why this exists next to ``approx_count_distinct`` (which is also a
    correct, mergeable HLL++): Spark's sketch lives inside an opaque
    engine-specific binary buffer, so persisted state can never be
    checked by another system. These registers are built from the
    md5-derived :func:`_hll_h60` hash — a pure function of the key any
    engine reproduces — so a DuckDB oracle rebuilds the IDENTICAL
    register table bit-for-bit (the driver row ``sketch_portable_suite``
    does exactly that): approximation lives in the data structure, not
    in any nondeterminism. Same portability move as
    :func:`count_min_cells` / SimHash / the LSH hyperplanes.

    Standard HLL shape (Flajolet et al. 2007): bucket = top ``p`` hash
    bits, rho = leading-zero count of the remaining ``60 - p`` bits + 1
    (computed EXACTLY via the binary-string length — no float log2 at
    power-of-two boundaries), register = max rho per bucket. One
    partial-aggregated shuffle of ≤ groups × 2^p rows; registers are
    max-mergeable across corpus shards / streaming ticks
    (:func:`hll_merge`), which is the whole point at 100 TB: count
    distinct users per key WITHOUT a distinct-shuffle of the key space.

    ``p`` rides along as a literal column so persisted registers are
    never dimensionless (the count-min discipline):
    :func:`hll_estimate` reads it back and refuses a mismatched merge.
    """
    if not 4 <= p <= 18:
        raise ValueError(f"need 4 <= p <= 18, got {p}")
    group_cols = list(group_cols or [])
    # NULL keys are not a distinct value (count_distinct semantics and
    # approx_count_distinct both ignore them); without the filter a NULL
    # key would md5 to NULL and mint a phantom NULL-bucket register
    df = df.filter(F.col(key_col).isNotNull())
    w = 60 - p  # remainder bits
    h = _hll_h60(key_col)
    rem = h.bitwiseAND(F.lit((1 << w) - 1))
    rho = F.when(rem == 0, F.lit(w + 1)).otherwise(
        F.lit(w + 1) - F.length(F.bin(rem))
    )
    return (
        df.select(
            *group_cols,
            F.shiftright(h, w).alias("bucket"),
            rho.cast("int").alias("__rho"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("__rho").alias("max_rho"))
        .withColumn("p", F.lit(int(p)))
    )


def hll_merge(*register_tables: DataFrame) -> DataFrame:
    """Merge register tables from disjoint corpus shards / ticks:
    elementwise max per (group, bucket). ``registers(a ∪ b) ≡
    merge(registers(a), registers(b))`` exactly — the additivity that
    makes HLL maintainable incrementally (asserted in tests)."""
    if not register_tables:
        raise ValueError("need at least one register table")
    merged = register_tables[0]
    for t in register_tables[1:]:
        merged = merged.unionByName(t)
    keys = [c for c in merged.columns if c not in ("max_rho",)]
    return merged.groupBy(*keys).agg(F.max("max_rho").alias("max_rho")).select(
        *merged.columns
    )


def _bloom_pos(key_col: str, j: int, m_bits: int):
    """``j``-th Bloom bit position of a key: the :func:`_hll_h60`-style
    md5-derived 60-bit integer of ``'<j>:' || key``, mod ``m_bits`` —
    engine-portable (DuckDB: ``CAST(('0x' || substr(md5(j || ':' || k),
    1, 15)) AS BIGINT) % m_bits`` yields the identical position; 15 hex
    chars keep the lane positive so ``%`` agrees across engines)."""
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(F.lit(f"{j}:"), F.col(key_col).cast("string"))
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    return h % F.lit(int(m_bits))


def bloom_registers(
    df: DataFrame,
    key_col: str,
    *,
    m_bits: int = 1 << 20,
    k_hashes: int = 3,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Portable Bloom-filter registers for set membership of ``key_col``:
    ``(*group_cols, word_idx, bits, m_bits, k_hashes)`` — at most
    ``m_bits/32`` rows per group (only OCCUPIED 32-bit words are
    emitted), regardless of key cardinality.

    The missing member of the portable-sketch family (count-min counts,
    HLL distinct-counts, quantile histogram ranks — this one answers
    MEMBERSHIP): at 100 TB the shape is a decontamination / revisit
    pre-filter — broadcast a fixed-size filter of the eval-set (or
    already-ingested) fingerprints instead of shipping the fingerprints
    themselves, and pay the exact check only for probes the filter
    cannot rule out. No false negatives ever; false-positive rate
    ``(1 - e^(-k·n/m))^k``, so size ``m_bits ∝ n`` (~10 bits/key for
    ~1%). Same portability discipline as :func:`hll_registers`: bit
    positions derive from md5 (:func:`_bloom_pos`), a pure function of
    the key every engine reproduces, so a DuckDB oracle rebuilds the
    IDENTICAL packed-word table bit-for-bit — approximation lives in
    the data structure, never in nondeterminism.

    Packing: position ``pos`` sets bit ``pos % 32`` of word ``pos DIV
    32`` — 32-bit words in a BIGINT lane stay positive, so ``bit_or``
    / ``<<`` / ``>>`` agree across engines with no sign edge cases.
    One partial-aggregated ``bit_or`` shuffle; registers are
    OR-mergeable across corpus shards / streaming ticks
    (:func:`bloom_merge` — ``registers(a ∪ b) ≡ merge(registers(a),
    registers(b))``). ``m_bits``/``k_hashes`` ride on every row so
    persisted filters are never dimensionless; :func:`bloom_contains`
    validates them IN-PLAN and refuses a mismatch (the count-min /
    quantile-histogram discipline)."""
    if not 64 <= m_bits <= 1 << 30 or m_bits % 32:
        raise ValueError(
            f"need 64 <= m_bits <= 2^30 and m_bits % 32 == 0, got {m_bits}"
        )
    if not 1 <= k_hashes <= 16:
        raise ValueError(f"need 1 <= k_hashes <= 16, got {k_hashes}")
    g = list(group_cols or [])
    # NULL keys are not members of any set (the hll_registers rule);
    # without the filter NULL would md5 to NULL and mint phantom rows
    df = df.filter(F.col(key_col).isNotNull())
    pos = F.explode(
        F.array(*[_bloom_pos(key_col, j, m_bits) for j in range(k_hashes)])
    )
    return (
        df.select(*g, pos.alias("__pos"))
        .select(
            *g,
            F.expr("__pos DIV 32").alias("word_idx"),
            # SQL form: shiftleft's Python wrapper takes only a literal
            # shift, the expression form takes a column
            F.expr(
                "shiftleft(cast(1 as bigint), cast(__pos % 32 as int))"
            ).alias("__bit"),
        )
        .groupBy(*g, "word_idx")
        .agg(F.bit_or("__bit").alias("bits"))
        .withColumn("m_bits", F.lit(int(m_bits)))
        .withColumn("k_hashes", F.lit(int(k_hashes)))
    )


def bloom_merge(*register_tables: DataFrame) -> DataFrame:
    """Merge Bloom registers from disjoint corpus shards / ticks:
    elementwise ``bit_or`` per (group, word). Mismatched dimensions
    (``m_bits``/``k_hashes`` are grouping keys) can never silently mix
    — and :func:`bloom_contains` refuses a table carrying more than
    one dimension pair in-plan."""
    if not register_tables:
        raise ValueError("need at least one register table")
    merged = register_tables[0]
    for t in register_tables[1:]:
        merged = merged.unionByName(t)
    keys = [c for c in merged.columns if c != "bits"]
    return merged.groupBy(*keys).agg(F.bit_or("bits").alias("bits")).select(
        *merged.columns
    )


def bloom_contains(
    filters: DataFrame,
    probes: DataFrame,
    key_col: str,
    *,
    id_cols: list[str],
    m_bits: int = 1 << 20,
    k_hashes: int = 3,
) -> DataFrame:
    """Probe a Bloom register table: ``probes`` + a ``bloom_hit``
    boolean — true iff EVERY one of the key's ``k_hashes`` bit
    positions is set (possibly-present; false ⇒ definitely absent).

    Plan shape for 100-TB probes: the probe side explodes to its ≤
    ``k_hashes`` DISTINCT positions, the filter side is the bounded
    packed-word table (≤ ``m_bits/32`` rows — broadcastable by stats),
    so the probe is one equi-join on ``word_idx`` + an all-bits-set
    aggregate: never a fingerprint-set shuffle. The caller's declared
    ``m_bits``/``k_hashes`` are validated IN-PLAN against the stamped
    columns — probing with the wrong dimensions would silently compute
    wrong positions, so a mismatched row raises instead (the langid
    ``prefix_chars`` / count-min discipline)."""
    if not id_cols:
        raise ValueError("id_cols must name the probe identity columns")
    guard_ok = (F.col("m_bits") == F.lit(int(m_bits))) & (
        F.col("k_hashes") == F.lit(int(k_hashes))
    )
    checked = filters.select(
        F.when(
            guard_ok, F.col("word_idx")
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "bloom_contains: filter dimensions do not match "
                        f"the declared (m_bits={m_bits}, "
                        f"k_hashes={k_hashes}): got ("
                    ),
                    F.col("m_bits").cast("string"),
                    F.lit(", "),
                    F.col("k_hashes").cast("string"),
                    F.lit(")"),
                )
            ).cast("bigint")
        ).alias("word_idx"),
        "bits",
    )
    pos = F.explode(
        F.array_distinct(
            F.array(
                *[_bloom_pos(key_col, j, m_bits) for j in range(k_hashes)]
            )
        )
    )
    probe_pos = probes.filter(F.col(key_col).isNotNull()).select(
        *id_cols, pos.alias("__pos")
    )
    hit_per_pos = probe_pos.join(
        checked,
        F.expr("__pos DIV 32") == checked["word_idx"],
        "left",
    ).select(
        *id_cols,
        (
            F.col("bits").isNotNull()
            & (
                F.expr(
                    "shiftright(bits, cast(__pos % 32 as int)) & 1"
                )
                == 1
            )
        ).alias("__set"),
    )
    return hit_per_pos.groupBy(*id_cols).agg(
        F.bool_and("__set").alias("bloom_hit")
    )


def bloom_prefilter(
    filters: DataFrame,
    df: DataFrame,
    key_col: str,
    *,
    m_bits: int = 1 << 20,
    k_hashes: int = 3,
) -> DataFrame:
    """Scan-speed possibly-present pre-filter: ``df`` minus the rows
    whose key the Bloom filter can RULE OUT.

    Unlike :func:`bloom_contains` (which explodes each probe to its
    positions and aggregates an all-bits-set verdict — one shuffle on
    the probe identity), this NEVER shuffles ``df``: each of the
    ``k_hashes`` positions is checked by its own broadcast equi-join
    against the packed-word table (≤ ``m_bits/32`` rows — broadcastable
    by stats at any corpus size), so the filter composes with
    corpus-scale probe sides at scan speed — the decontamination /
    revisit pre-filter shape (see
    ``decontaminate.contamination_hits_bloom``). Rows with a NULL key
    pass through (a pre-filter must not invent a verdict for keys the
    build side ignored).

    Guarantee: drops ONLY definitely-absent rows (no false negatives),
    so ``exact(bloom_prefilter(df)) ≡ exact(df)`` for any downstream
    exact membership check — result identity, not approximation
    (asserted in tests). The same in-plan dimension guard as
    bloom_contains refuses a mismatched filter."""
    guard_ok = (F.col("m_bits") == F.lit(int(m_bits))) & (
        F.col("k_hashes") == F.lit(int(k_hashes))
    )
    checked = filters.select(
        F.when(guard_ok, F.col("word_idx"))
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "bloom_prefilter: filter dimensions do not match "
                        f"the declared (m_bits={m_bits}, "
                        f"k_hashes={k_hashes}): got ("
                    ),
                    F.col("m_bits").cast("string"),
                    F.lit(", "),
                    F.col("k_hashes").cast("string"),
                    F.lit(")"),
                )
            ).cast("bigint")
        )
        .alias("word_idx"),
        "bits",
    )
    out = df
    for j in range(k_hashes):
        fj = checked.select(
            F.col("word_idx").alias(f"__w{j}"), F.col("bits").alias(f"__b{j}")
        )
        pos = _bloom_pos(key_col, j, m_bits)
        out = (
            out.withColumn(f"__p{j}", pos)
            .join(
                F.broadcast(fj),
                F.expr(f"__p{j} DIV 32") == F.col(f"__w{j}"),
                "left",
            )
            .filter(
                F.col(key_col).isNull()
                | (
                    F.col(f"__b{j}").isNotNull()
                    & (
                        F.expr(
                            f"shiftright(__b{j},"
                            f" cast(__p{j} % 32 as int)) & 1"
                        )
                        == 1
                    )
                )
            )
            .drop(f"__p{j}", f"__w{j}", f"__b{j}")
        )
    return out


def hll_estimate(
    registers: DataFrame,
    *,
    group_cols: list[str] | None = None,
    p: int | None = None,
) -> DataFrame:
    """Distinct-count estimate from :func:`hll_registers` output:
    ``(*group_cols, approx_distinct)`` with the standard bias-corrected
    estimator + small-range correction (Flajolet et al. 2007):
    ``E = alpha_m * m^2 / (V + sum 2^-rho)`` over the ``m = 2^p``
    registers (empty buckets contribute ``2^0 = 1`` each, V of them);
    if ``E <= 2.5 m`` and ``V > 0``, linear counting ``m ln(m/V)``
    takes over. Relative error ≈ ``1.04/sqrt(m)`` (3.25% at p=10).

    ``p`` defaults to the value RECORDED on the registers and a
    mismatched explicit ``p`` raises — estimating with the wrong ``m``
    silently mis-scales, the same failure mode the count-min dimension
    stamp exists to prevent."""
    import math

    group_cols = list(group_cols or [])
    registers = registers.localCheckpoint(eager=True)
    dims = registers.agg(F.min("p"), F.max("p")).first()
    if dims[0] is None:
        if p is None:
            raise ValueError("empty registers carry no p — pass p explicitly")
    else:
        if dims[0] != dims[1]:
            raise ValueError(
                f"registers mix precisions p={dims[0]}..{dims[1]} — "
                "tables from differently-sized sketches cannot be merged"
            )
        if p is None:
            p = int(dims[0])
        elif p != dims[0]:
            raise ValueError(
                f"p {p} does not match the registers' recorded p {dims[0]}"
            )
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    # the UNGROUPED aggregate emits one row even over zero registers
    # (sum → NULL): coalesce to 0 so the empty-corpus estimate is the
    # linear-counting 0 (V = m ⇒ m·ln(1)), not a NULL row
    agg = registers.groupBy(*group_cols).agg(
        F.coalesce(
            F.sum(F.pow(F.lit(2.0), -F.col("max_rho"))), F.lit(0.0)
        ).alias("__s"),
        F.count(F.lit(1)).alias("__nb"),
    )
    v = F.lit(float(m)) - F.col("__nb")  # empty buckets
    raw = F.lit(alpha * m * m) / (F.col("__s") + v)
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / v)
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0), linear
    ).otherwise(raw)
    return agg.select(
        *group_cols, F.round(est).cast("bigint").alias("approx_distinct")
    )


# ---------------------------------------------------------------------------
# portable quantile histogram (round 13) — the missing member of the
# portable-sketch family: count-min (frequencies), HLL (distincts),
# SimHash/LSH (similarity) are all engine-checkable; quantiles only had
# percentile_approx's opaque engine-internal KLL buffer
# (sketch_event_profile). Same move as hll_registers: approximation
# lives in the DATA STRUCTURE, construction is bit-deterministic on any
# engine.


def quantile_buckets(
    df: DataFrame,
    value_col: str,
    *,
    group_cols: list[str] | None = None,
    bits: int = 6,
    scale_bits: int = 20,
) -> DataFrame:
    """Log-bucketed quantile histogram (the HDR-histogram / DDSketch
    relative-accuracy scheme, integer-exact): ``(*group_cols, bucket,
    cnt, bits, scale_bits)`` with at most ``2^(bits+1) + 62·2^bits``
    buckets per sign lane — FIXED state regardless of row count.

    Arithmetic (all integer, engine-portable — no float log at bucket
    boundaries, the hll_registers discipline): the magnitude is
    fixed-pointed as ``q = round(|v| · 2^scale_bits)``; values with
    ``q < 2^(bits+1)`` get their own exact bucket; larger values keep
    their top ``bits+1`` binary digits — ``shift = bitlength(q) -
    (bits+1)`` (via the exact binary-string length), ``bucket =
    (q DIV 2^shift) + shift · 2^bits`` — so every bucket spans a
    relative width ≤ 2^-bits. Negative values mirror to negative bucket
    ids; the id is monotone in the value, which is what lets
    :func:`quantile_estimate` walk a cumulative sum. NULLs are excluded
    (percentile semantics); |v| must stay below ``2^(62-scale_bits)``
    (BIGINT lane) and be a real number — far beyond any fixture or price
    domain, and ENFORCED: an out-of-domain row (including NaN, which no
    ordering-based bucket can represent) raises instead of silently
    saturating the
    non-ANSI double→bigint cast into a wrong bucket (where Spark's clamp
    and DuckDB's erroring CAST would also diverge — the portability
    contract fails loudly on both engines instead of quietly on one).

    One partial-aggregated shuffle of ≤ groups × buckets rows; counts
    are ADDITIVE across shards/ticks (:func:`quantile_histogram_merge`
    — the count-min merge law, not HLL's max). ``bits``/``scale_bits``
    ride on every row so persisted histograms are never dimensionless
    and mismatched merges are refused (count_min_cells discipline).
    """
    if not 1 <= bits <= 16:
        raise ValueError(f"need 1 <= bits <= 16, got {bits}")
    if not 0 <= scale_bits <= 30:
        raise ValueError(f"need 0 <= scale_bits <= 30, got {scale_bits}")
    g = list(group_cols or [])
    v = F.col(value_col)
    qd = F.round(F.abs(v) * F.lit(float(1 << scale_bits)))
    # domain guard (advice): one codegen comparison per row; beyond
    # 2^62 the bigint cast would clamp to Long.MAX_VALUE and bucket the
    # row wrongly with no signal. NaN must be caught explicitly (r14
    # advice item 2): NaN >= 2^62 is false, so without the isnan arm a
    # NaN would fall to the otherwise branch where Spark's non-ANSI
    # double→bigint cast yields 0 (silently bucketed at 0) while
    # DuckDB's CAST errors — the exact quiet-on-one-engine divergence
    # this guard exists to eliminate.
    q_checked = F.when(
        (qd >= F.lit(float(1 << 62))) | F.isnan(v.cast("double")),
        F.raise_error(
            F.concat(
                F.lit(
                    "quantile_buckets: value is NaN or |value| exceeds the "
                    f"BIGINT lane (2^{62 - scale_bits} at "
                    f"scale_bits={scale_bits}): "
                ),
                v.cast("string"),
            )
        ).cast("bigint"),
    ).otherwise(qd.cast("bigint"))
    base = df.where(v.isNotNull()).select(
        *g,
        F.when(v < 0, F.lit(-1)).otherwise(F.lit(1)).alias("__sign"),
        q_checked.alias("__q"),
    )
    octave = F.length(F.bin(F.col("__q")))
    shift = F.greatest(octave - F.lit(bits + 1), F.lit(0)).cast("bigint")
    staged = base.select(
        *g,
        "__sign",
        "__q",
        shift.alias("__shift"),
        F.pow(F.lit(2.0), shift.cast("double")).cast("bigint").alias("__den"),
    )
    mag = F.expr("__q DIV __den") + F.col("__shift") * F.lit(1 << bits)
    return (
        staged.select(
            *g,
            F.when(F.col("__q") == 0, F.lit(0))
            .otherwise(F.col("__sign") * mag)
            .alias("bucket"),
        )
        .groupBy(*g, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("bits", F.lit(int(bits)))
        .withColumn("scale_bits", F.lit(int(scale_bits)))
    )


def quantile_histogram_merge(*tables: DataFrame) -> DataFrame:
    """Merge histograms by ADDING counts per (group, bucket) — shards,
    streaming ticks, or partial corpus passes compose exactly
    (merge ≡ build-over-the-union, pinned by test). Refuses mixed
    ``bits``/``scale_bits``: adding counts across different grids would
    silently place mass in the wrong value ranges."""
    if not tables:
        raise ValueError("nothing to merge")
    unioned = tables[0]
    for t in tables[1:]:
        unioned = unioned.unionByName(t)
    dims = unioned.select("bits", "scale_bits").distinct().collect()
    if len(dims) > 1:
        raise ValueError(
            f"cannot merge histograms with mixed grids: {sorted(map(tuple, dims))}"
        )
    # len(dims) == 0: every input empty (e.g. pre-first-commit streaming
    # state) — the merge of nothing is the empty histogram, not an error
    keys = [c for c in unioned.columns if c not in ("cnt",)]
    return (
        unioned.groupBy(*keys)
        .agg(F.sum("cnt").alias("cnt"))
        .select(*tables[0].columns)
    )


def quantile_estimate(
    buckets: DataFrame,
    probs: list[float],
    *,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Estimate quantiles from a :func:`quantile_buckets` histogram:
    ``(*group_cols, p, approx_value)`` — one row per group × prob, the
    bucket-midpoint of the first bucket whose cumulative count reaches
    ``ceil(p · n)`` (the lower-rank convention; p=0 → min bucket). The
    true quantile lies INSIDE that bucket, so the estimate's relative
    error is bounded by half the bucket's relative width (≤ 2^-(bits+1))
    plus the 2^-(scale_bits+1) fixed-point quantization — a guarantee,
    not a heuristic. Grid parameters are read off the histogram itself.

    Plan shape: one cumulative-sum window over ≤ buckets rows per group
    (the histogram is sketch-sized, not data-sized), then a groups ×
    probs aggregate — nothing here touches the original corpus.
    """
    from pyspark.sql import Window

    if not probs:
        # the per-prob union below would silently return None — fail at
        # the API boundary instead of at the caller's .collect() (advice)
        raise ValueError("probs must be non-empty")
    for p in probs:
        if not 0.0 <= p <= 1.0:
            raise ValueError(f"probs must be in [0, 1], got {p}")
    g = list(group_cols or [])
    dims = buckets.select("bits", "scale_bits").distinct().collect()
    if len(dims) > 1:
        raise ValueError(
            f"histogram has mixed grids: {sorted(map(tuple, dims))}"
        )
    if not dims:
        # empty histogram (e.g. streaming state before the first commit,
        # read_quantile_state's documented empty path): no groups exist,
        # so the estimate is the empty frame — not a grid error. Group
        # column types are taken from the (empty) input itself.
        return buckets.select(
            *g,
            F.lit(None).cast("double").alias("p"),
            F.lit(None).cast("double").alias("approx_value"),
        ).where(F.lit(False))
    bits, scale_bits = int(dims[0][0]), int(dims[0][1])
    w = Window.partitionBy(*g).orderBy("bucket") if g else Window.orderBy(
        "bucket"
    )
    cum = buckets.select(
        *g,
        "bucket",
        F.sum("cnt").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("__cum"),
        F.sum("cnt").over(
            w.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("__n"),
    )
    # decode the bucket midpoint: invert bucket -> (shift, sub) -> value.
    # A shift-0 bucket holds EXACTLY the fixed-point integer sub (values
    # that ROUNDED to it, i.e. (sub±0.5)·2^-scale_bits), so its midpoint
    # is sub itself — decoding it at sub+0.5 would sit on the interval's
    # upper edge and double the quantization term of the documented
    # bound (code-review fix). Wider buckets span [sub, sub+1)·2^shift
    # of q-space and keep the +0.5 midpoint.
    amag = F.abs(F.col("bucket"))
    d = F.expr(f"abs(bucket) DIV {1 << bits}")
    shift = F.when(d >= 2, d - 1).otherwise(F.lit(0)).cast("bigint")
    sub = amag - shift * F.lit(1 << bits)
    unit = F.pow(F.lit(2.0), shift.cast("double"))
    center = F.when(shift == 0, sub.cast("double")).otherwise(
        (sub.cast("double") + 0.5) * unit
    )
    mid = center / F.lit(float(1 << scale_bits))
    value = (
        F.when(F.col("bucket") == 0, F.lit(0.0))
        .otherwise(F.signum(F.col("bucket").cast("double")) * mid)
    )
    decoded = cum.withColumn("__val", value)
    out = None
    for p in probs:
        target = F.greatest(F.ceil(F.lit(float(p)) * F.col("__n")), F.lit(1))
        hit = (
            decoded.where(F.col("__cum") >= target)
            .groupBy(*g)
            .agg(F.min_by("__val", "bucket").alias("approx_value"))
            .select(*g, F.lit(float(p)).alias("p"), "approx_value")
        )
        out = hit if out is None else out.unionByName(hit)
    return out


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_col: str = "query_text",
    k: int = 10,
    k1: float = 1.25,
    b: float = 0.75,
    scale: int = 1_000_000_000,
) -> DataFrame:
    """Okapi BM25 top-k retrieval: for each query row, the ``k``
    best-scoring documents (reference parity: the reference exposes no
    retrieval operator — this is part of the training-data tier, e.g.
    retrieval-based decontamination and curation audits).

    Scoring is the Lucene-style always-positive variant over DISTINCT
    query terms::

        idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
        score   = sum_t idf(t) * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

    Plan shape for a 100-TB corpus — NO corpus-sized shuffle at all:

    - the exploded token stream is semi-joined against the broadcast
      query vocabulary BEFORE the TF aggregate. Scoring only ever
      consumes TF rows for query terms (the scoring join is inner on
      word), and the doc length is captured at explode time (``dl =
      size(words)``, carried as a constant-per-doc ``min``), so the
      filter loses nothing — and the (doc, term) TF shuffle carries
      only CANDIDATE tokens, not the corpus. The full-corpus work is
      one scan+explode+broadcast-filter pass at scan speed.
    - per-term DF aggregates the already-filtered, already-unique
      (doc, term) pairs — the full vocabulary table is never built.
    - corpus stats (N, Σdl) are a second column-pruned scan reduced to
      ONE row (no shuffle), broadcast into the scoring relation.
    - the scoring join is TF ⋈ broadcast(query terms × per-term df ×
      corpus stats); only candidate rows reach the (query, doc) score
      aggregation, and top-k is a per-query ranking window over
      per-query candidate sets.

    Determinism (the lm.py integer-scaling discipline): every per-term
    contribution is computed in IEEE doubles from exact integer inputs
    with a fixed operation order, scaled to ``floor(x*scale + 0.5)``
    BIGINT, and summed as integers — associative, so partition order
    cannot reorder a float sum; ties rank by ``doc_id`` ascending. The
    DEFAULT constants (k1=1.25, b=0.75, and the derived 2.25/0.25) are
    exactly representable binary fractions, so both engines evaluate
    them bit-identically from their decimal literals; the residual
    cross-engine surface is libm's ``ln`` (same caveat class as the
    trained-langid oracle, documented there).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if scale < 1:
        raise ValueError(f"scale must be >= 1, got {scale}")
    prepared = _parallelize_small(docs.select(id_col, text_col)).select(
        F.col(id_col), words(F.lower(F.col(text_col))).alias("__words")
    )
    qterms = (
        queries.select(
            query_id_col,
            F.explode(words(F.lower(F.col(query_col)))).alias("word"),
        )
        .distinct()
    )
    # candidate tokens only: dl is captured BEFORE the vocabulary filter
    # (so it stays the full doc length), then the broadcast semi-join
    # drops every non-query token before anything shuffles — the (doc,
    # term) TF aggregate is candidate-sized, not corpus-sized
    tf = (
        prepared.select(
            id_col,
            F.size("__words").cast("long").alias("dl"),
            F.explode("__words").alias("word"),
        )
        .join(F.broadcast(qterms.select("word").distinct()), "word",
              "left_semi")
        .groupBy(id_col, "word")
        .agg(F.count(F.lit(1)).alias("tf"), F.min("dl").alias("dl"))
    )
    # per-term df over the filtered, already-unique (doc, term) pairs
    qdf = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    stats = prepared.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("__words").cast("long")).alias("sum_dl"),
    )
    qrel = (
        qterms.join(qdf, "word")
        .crossJoin(F.broadcast(stats))
    )
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    idf = F.log(
        F.lit(1.0)
        + ((F.col("n_docs") - F.col("df")).cast("double") + F.lit(0.5))
        / (F.col("df").cast("double") + F.lit(0.5))
    )
    tf_d = F.col("tf").cast("double")
    contrib = (
        idf
        * (tf_d * F.lit(k1 + 1.0))
        / (
            tf_d
            + F.lit(k1)
            * (
                F.lit(1.0 - b)
                + F.lit(b) * (F.col("dl").cast("double") / avgdl)
            )
        )
    )
    cand = tf.join(F.broadcast(qrel), "word").select(
        query_id_col,
        id_col,
        F.floor(contrib * F.lit(float(scale)) + F.lit(0.5))
        .cast("bigint")
        .alias("__contrib"),
    )
    scores = cand.groupBy(query_id_col, id_col).agg(
        F.sum("__contrib").alias("score_scaled")
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("score_scaled"), F.asc(id_col)
    )
    return (
        scores.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= k)
        .select(
            query_id_col,
            "rnk",
            id_col,
            "score_scaled",
            (F.col("score_scaled").cast("double") / F.lit(float(scale)))
            .alias("score"),
        )
    )

"""Differential tests: every SQL-expressible declared query vs its DuckDB
oracle — the same comparison the driver performs (CORRECTNESS_r{N}.json),
run here at sf0.001 for fast iteration (set SPARK_GRAFT_TEST_SF to raise).

Values are compared exactly (float_rtol=0): the engine's declared queries
are designed to be bit-deterministic across engines (integer-scaled money
sums, per-row IEEE arithmetic, rounded+tie-broken rankings).
"""

from __future__ import annotations

import pytest

from global_market_index_etl_spark.plans import REGISTRY

from .conftest import SF_SMALL, assert_matches_oracle

SQL_CHECKED = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_query_matches_oracle(spark, name):
    qd = REGISTRY[name]
    assert_matches_oracle(spark, name, qd.spark, qd.oracle, SF_SMALL)


def test_ngram_jaccard_prefix_path_matches_oracle(spark):
    """Force the PPJoin prefix path through the FULL DuckDB oracle at the
    driver's correctness SF (r15 verdict item 2): the registry row's
    ``auto`` dispatch takes the naive branch below the ~1M-shingle
    crossover, so without this pin the prefix/positional-filter code is
    never oracle-exercised at correctness scale."""
    from global_market_index_etl_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )
    from global_market_index_etl_spark.plans.textdata import load_table

    from .conftest import SF_ORACLE

    qd = REGISTRY["dedup_ngram_jaccard"]
    assert_matches_oracle(
        spark,
        "dedup_ngram_jaccard[prefix]",
        lambda s, d: ngram_jaccard_pairs(
            load_table(s, d, "documents"), n=3, threshold=0.8,
            strategy="prefix",
        ),
        qd.oracle,
        SF_ORACLE,
    )


def test_oracle_output_types_spark_mappable():
    """Registry-wide typeof lint: bind (not execute) every oracle against
    DuckDB and reject any output type outside the Spark-mappable allowlist.
    DuckDB's sum(BIGINT) → HUGEINT is the canonical offender (r9 driver hash
    failures on curation_pipeline_v3 / text_ppl_buckets): values identical,
    representation divergent. Binding is cheap — this sweeps all 80+ oracles
    in under a second."""
    from .conftest import ORACLE_TYPE_ALLOWLIST, duck_connection

    con = duck_connection(SF_SMALL)
    bad = []
    for name in SQL_CHECKED:
        rel = con.sql(REGISTRY[name].oracle)
        for col, ty in zip(rel.columns, rel.types):
            if str(ty) not in ORACLE_TYPE_ALLOWLIST:
                bad.append((name, col, str(ty)))
    con.close()
    assert not bad, f"oracle columns outside Spark-mappable type set: {bad}"


def test_oracle_type_lint_catches_seeded_hugeint():
    """The lint must flag the exact regression class it exists for: an
    uncast sum(BIGINT) whose bound type is HUGEINT."""
    from .conftest import ORACLE_TYPE_ALLOWLIST, duck_connection

    con = duck_connection(SF_SMALL)
    rel = con.sql("SELECT sum(o_orderkey) AS s FROM orders")
    types = [str(t) for t in rel.types]
    con.close()
    assert types == ["HUGEINT"]
    assert "HUGEINT" not in ORACLE_TYPE_ALLOWLIST


@pytest.mark.parametrize(
    "name",
    [
        "mm_real_decode_stats",
        # round 10: every remaining rows-only row whose output reproduced
        # bit-identically across disjoint parallelism settings before
        # pinning (scripts/gen_digest_fixtures.py has the verification
        # note) — the BPE rows keep their dedicated fixture pins.
        # round 14: ann_ivf_topk graduated to a FULL oracle (exhaustive
        # dial ≡ brute force); the engine-side production dial keeps its
        # value pin as the non-registry builder ann_ivf_prod. Round 15:
        # ann_pq_rerank graduated the same way; its production dial
        # (rerank=20, identical params to the retired registry dial, so
        # the frozen digest carries over) pins as ann_pq_prod.
        "ann_ivf_prod",
        "ann_pq_prod",
        "dedup_semantic",
        # dedup_simhash graduated to a FULL DuckDB oracle in round 11
        # (md5-derived word hashes made the signatures portable);
        # ann_lsh_topk followed in round 12 (md5-derived Rademacher
        # hyperplanes — its digest pin is retired)
        "e1_pipeline_market_bars",
        "mm_decode_features",
        "sketch_event_profile",
        # round 12: incremental pHash vs the persisted index (byte-exact
        # codec + exact DCT-II; parallelism-reproducibility verified)
        "dedup_incremental_phash",
    ],
)
def test_rows_only_queries_match_pinned_digest(spark, name):
    """Value-pin the rows-only rows at fixture strength (round-9 verdict
    item 4, widened to the full rows-only set in round 10): the FULL
    sf0.01 table must reproduce, bit-for-bit, the sha256 frozen by
    scripts/gen_digest_fixtures.py. Each query is deterministic by
    construction (seeded LSH hyperplanes, bounded hash-ordered IVF/PQ
    training, fixed-order ADC folds, byte-exact codecs, the seeded
    market-source walk, commutative sketch merges), with the arithmetic
    independently parity-tested against exact counterparts or pure-numpy
    references — the digest catches silent drift those per-component
    twins cannot see."""
    import hashlib
    import json
    from pathlib import Path

    fixture = json.loads(
        (
            Path(__file__).parent
            / "fixtures"
            / f"{name}_digest_sf0.01.json"
        ).read_text()
    )
    if name in ("ann_ivf_prod", "ann_pq_prod"):
        from global_market_index_etl_spark.plans import textdata

        build = getattr(textdata, f"{name}_leg")
    else:
        build = REGISTRY[name].spark
    df = build(spark, fixture["sf_dir"])
    assert sorted(df.columns) == fixture["columns"]
    cols = fixture["columns"]

    def render(v):
        if v is None:
            return "∅"
        if isinstance(v, float):
            return repr(v)
        return str(v)

    rows = sorted(
        "\t".join(render(r[c]) for c in cols) for r in df.collect()
    )
    assert len(rows) == fixture["n_rows"]
    digest = hashlib.sha256("\n".join(rows).encode()).hexdigest()
    assert digest == fixture["sha256"]


def test_all_queries_return_dataframes(spark):
    """Rows-only queries (no oracle) still execute and have stable schemas."""
    for name, qd in REGISTRY.items():
        if qd.oracle is None:
            df = qd.spark(spark, SF_SMALL)
            assert df.columns, f"{name}: empty schema"
            df.limit(5).collect()

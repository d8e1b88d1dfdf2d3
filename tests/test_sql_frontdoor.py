"""E3 — ad-hoc SQL as the user-facing query path (SURVEY.md §3 E3).

The reference delegates ad-hoc SQL to Postgres; here ``spark.sql`` over the
registered views IS the query processor. The documented Q1-Q3 queries run
verbatim-shaped SQL and must agree with the DataFrame declarations.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from global_market_index_etl_spark.plans import REGISTRY
from global_market_index_etl_spark.sources import register_views

from .conftest import SF_SMALL


def test_sql_frontdoor_matches_dataframe_queries(spark):
    register_views(spark, SF_SMALL)
    # README.md:322-331 (Q1 shape)
    via_sql = spark.sql(
        """
        SELECT o_orderkey, o_orderdate, o_totalprice
        FROM orders WHERE o_custkey = 42
        ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 5
        """
    )
    via_df = (
        REGISTRY["q_sort_limit_suite"]
        .spark(spark, SF_SMALL)
        .filter("leg = 'recent5'")
        .select(
            F.col("k1").alias("o_orderkey"),
            F.col("ts").alias("o_orderdate"),
            F.col("v").alias("o_totalprice"),
        )
    )
    assert sorted(map(tuple, via_sql.collect())) == sorted(
        map(tuple, via_df.collect())
    )
    # README.md:350-357 (Q3 shape — now the 'catalog' leg of the fused
    # sort/rank suite)
    via_sql = spark.sql(
        """
        SELECT CAST(n_nationkey AS BIGINT) AS k1, n_name AS s1, r_name AS s2
        FROM nation JOIN region ON n_regionkey = r_regionkey
        ORDER BY n_name
        """
    )
    via_df = (
        REGISTRY["q_sort_limit_suite"]
        .spark(spark, SF_SMALL)
        .filter("leg = 'catalog'")
        .select("k1", "s1", "s2")
    )
    assert sorted(map(tuple, via_sql.collect())) == sorted(
        map(tuple, via_df.collect())
    )


def test_sql_frontdoor_window_query(spark):
    register_views(spark, SF_SMALL)
    out = spark.sql(
        """
        SELECT event_type, ts, value,
               avg(value) OVER (PARTITION BY event_type ORDER BY ts
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS mavg
        FROM events LIMIT 10
        """
    )
    assert out.count() == 10
    assert set(out.columns) == {"event_type", "ts", "value", "mavg"}


# --------------------------------------------------------------------- #
# round-7 operators — SQL front door (round-7 verdict item 5)
# --------------------------------------------------------------------- #


def test_sql_frontdoor_scd2(spark):
    """SCD2 compression expressed as plain spark.sql window functions must
    equal the operator (null-safe change detection, row_number first-row)."""
    from global_market_index_etl_spark.operators.scd2 import (
        scd2_from_changelog,
    )

    rows = [
        (1, 10, "a"), (1, 20, "a"), (1, 30, "b"), (1, 50, "a"),
        (2, 10, None), (2, 20, None), (2, 30, "x"),
    ]
    df = spark.createDataFrame(rows, "k long, seq long, attr string")
    df.createOrReplaceTempView("changelog")
    via_sql = spark.sql(
        """
        WITH ordered AS (
          SELECT k, seq, attr,
                 row_number() OVER (PARTITION BY k ORDER BY seq) AS rn,
                 lag(attr) OVER (PARTITION BY k ORDER BY seq) AS prev_attr
          FROM changelog
        ), versions AS (
          SELECT * FROM ordered WHERE rn = 1 OR NOT (attr <=> prev_attr)
        )
        SELECT k, attr, seq AS valid_from,
               lead(seq) OVER (PARTITION BY k ORDER BY seq) AS valid_to,
               lead(seq) OVER (PARTITION BY k ORDER BY seq) IS NULL
                 AS is_current
        FROM versions
        """
    )
    via_df = scd2_from_changelog(
        df, key_cols=["k"], order_cols=["seq"], attr_cols=["attr"]
    )
    assert sorted(map(tuple, via_sql.collect()), key=str) == sorted(
        map(tuple, via_df.select(*via_sql.columns).collect()), key=str
    )


def test_sql_frontdoor_interval_join(spark):
    """The plain non-equi SQL join IS the user-facing semantics; the
    bucketized operator must return the identical pair set."""
    from global_market_index_etl_spark.operators.rangejoin import (
        interval_join_bucketed,
    )

    p = spark.createDataFrame(
        [(i, t) for i, t in enumerate(range(0, 300, 7))], "pid long, pt long"
    )
    i = spark.createDataFrame(
        [(100, 0, 50), (101, 40, 45), (102, 200, 290), (103, 299, 300)],
        "iid long, lo long, hi long",
    )
    p.createOrReplaceTempView("pts")
    i.createOrReplaceTempView("ivals")
    via_sql = spark.sql(
        "SELECT pid, iid FROM pts JOIN ivals ON pt >= lo AND pt < hi"
    )
    via_df = interval_join_bucketed(
        p, i, ts_col="pt", lo_col="lo", hi_col="hi"
    ).select("pid", "iid")
    assert sorted(map(tuple, via_sql.collect())) == sorted(
        map(tuple, via_df.collect())
    )


def test_sql_frontdoor_session_window(spark):
    """spark.sql's native session_window(...) must agree with the batch
    sessionizer the registry query uses."""
    register_views(spark, SF_SMALL)
    via_sql = spark.sql(
        """
        SELECT user_id,
               session_window.start AS session_start,
               session_window.end AS session_end_exclusive,
               CAST(count(*) AS BIGINT) AS n_events
        FROM events
        GROUP BY user_id, session_window(ts, '6 hours')
        """
    )
    via_df = REGISTRY["w_session_window_native"].spark(spark, SF_SMALL)
    got_sql = sorted(
        (r.user_id, r.session_start, r.n_events) for r in via_sql.collect()
    )
    got_df = sorted(
        (r.user_id, r.session_start, r.n_events) for r in via_df.collect()
    )
    assert got_sql == got_df


def test_sql_frontdoor_span_profile(spark):
    """duplicate_window_profile re-expressed as one spark.sql statement
    (same transform/sequence/md5 expressions) must match the operator on
    the fixture corpus."""
    from global_market_index_etl_spark.operators.spans import (
        duplicate_window_profile,
    )

    register_views(spark, SF_SMALL)
    via_sql = spark.sql(
        r"""
        WITH toks AS (
          SELECT doc_id,
                 split(trim(regexp_replace(lower(text), '\\s+', ' ')), ' ')
                   AS t
          FROM documents
        ), sized AS (
          SELECT * FROM toks WHERE size(t) >= 8
        ), wins AS (
          SELECT doc_id,
                 explode(transform(sequence(1, size(t) - 7),
                   i -> md5(concat_ws(' ', slice(t, i, 8))))) AS w
          FROM sized
        ), per_doc AS (
          SELECT doc_id, w, count(*) AS c FROM wins GROUP BY doc_id, w
        ), freq AS (
          SELECT doc_id, c, count(*) OVER (PARTITION BY w) AS df FROM per_doc
        )
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_windows,
               CAST(sum(CASE WHEN df > 1 THEN c ELSE 0 END) AS BIGINT)
                 AS n_dup_windows
        FROM freq GROUP BY doc_id
        """
    )
    docs = spark.table("documents")
    via_df = duplicate_window_profile(docs, doc_id="doc_id", text_col="text")
    assert sorted(map(tuple, via_sql.collect())) == sorted(
        map(tuple, via_df.collect())
    )


def test_sql_frontdoor_bigram_lm_scoring(spark):
    """Bigram-LM training + integer-scaled perplexity scoring expressed as
    ONE spark.sql statement (round-8 verdict item 7 — the operator is pure
    relational algebra) must equal lm.score_bigram_bits_scaled."""
    from global_market_index_etl_spark.operators.lm import (
        score_bigram_bits_scaled,
        train_bigram_lm,
    )

    register_views(spark, SF_SMALL)
    via_sql = spark.sql(
        r"""
        WITH toks AS (
          SELECT doc_id, concat(array(chr(2) || '<s>'),
                 filter(CASE WHEN length(trim(text)) = 0
                          THEN array()
                          ELSE split(trim(lower(text)), '\\s+') END,
                        x -> x != chr(2) || '<s>')) AS t
          FROM documents
        ), big AS (
          SELECT doc_id, t[i - 1] AS w1, t[i] AS w2
          FROM toks LATERAL VIEW explode(sequence(1, size(t) - 1)) s AS i
          WHERE size(t) >= 2
        ), model AS (
          SELECT w1, w2, count(*) AS c12 FROM big GROUP BY 1, 2
        ), ctx AS (
          SELECT w1, sum(c12) AS c1 FROM model GROUP BY 1
        ), v AS (
          SELECT greatest(count(DISTINCT w2), 1) AS v FROM model
        ), cost AS (
          SELECT b.doc_id,
                 CAST(round(-log2((coalesce(m.c12, 0) + 1.0D)
                      / (coalesce(c.c1, 0) + 1.0D * v.v)) * 1000000000D)
                   AS BIGINT) AS nano
          FROM big b
          LEFT JOIN model m ON b.w1 = m.w1 AND b.w2 = m.w2
          LEFT JOIN ctx c ON b.w1 = c.w1
          CROSS JOIN v
        )
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
               sum(nano) AS bits_scaled
        FROM cost GROUP BY doc_id
        """
    )
    docs = spark.table("documents").select("doc_id", "text")
    via_df = score_bigram_bits_scaled(
        docs, train_bigram_lm(docs)
    ).filter("n_bigrams >= 1")
    assert sorted(map(tuple, via_sql.collect())) == sorted(
        map(tuple, via_df.collect())
    )


def test_sql_frontdoor_temperature_mix(spark):
    """Temperature-scaled corpus mixing as plain spark.sql (round-8
    verdict item 7): the unnormalized quota derivation
    floor(sqrt(c * min_c)) + md5-prefix survivors must equal
    sampling.corpus_mix_temperature_inplan at alpha = 0.5."""
    from global_market_index_etl_spark.operators.sampling import (
        corpus_mix_temperature_inplan,
    )

    register_views(spark, SF_SMALL)
    via_sql = spark.sql(
        """
        WITH cnt AS (
          SELECT lang, count(*) AS c FROM documents GROUP BY lang
        ), tm AS (
          SELECT min(c) AS mn FROM cnt
        ), q AS (
          SELECT lang, CAST(floor(sqrt(CAST(c * mn AS DOUBLE))) AS BIGINT)
                   AS quota
          FROM cnt CROSS JOIN tm
        ), r AS (
          SELECT d.doc_id, d.lang, q.quota, row_number() OVER (
            PARTITION BY d.lang
            ORDER BY md5(CAST(d.doc_id AS STRING)), d.doc_id) AS rk
          FROM documents d JOIN q USING (lang)
        )
        SELECT doc_id, lang FROM r WHERE rk <= quota
        """
    )
    via_df = corpus_mix_temperature_inplan(
        spark.table("documents").select("doc_id", "lang"),
        "lang",
        0.5,
        "doc_id",
    ).select("doc_id", "lang")
    assert sorted(map(tuple, via_sql.collect())) == sorted(
        map(tuple, via_df.collect())
    )


def test_sql_frontdoor_token_mix(spark):
    """Token-weighted temperature mixing as plain spark.sql: the
    kept-token quota floor(sqrt(W * minW)) + cumulative md5-prefix must
    equal sampling.corpus_mix_temperature_tokens at alpha = 0.5."""
    from global_market_index_etl_spark.operators.sampling import (
        corpus_mix_temperature_tokens,
    )

    register_views(spark, SF_SMALL)
    via_sql = spark.sql(
        """
        WITH w AS (
          SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
          FROM documents
        ), cnt AS (
          SELECT lang, sum(n_chars) AS tw FROM w GROUP BY lang
        ), tm AS (
          SELECT min(tw) AS mn FROM cnt
        ), q AS (
          SELECT lang,
                 CAST(floor(sqrt(CAST(tw AS DOUBLE) * CAST(mn AS DOUBLE)))
                   AS BIGINT) AS quota
          FROM cnt CROSS JOIN tm
        ), r AS (
          SELECT w.doc_id, w.lang, w.n_chars, q.quota,
                 sum(n_chars) OVER (
                   PARTITION BY w.lang
                   ORDER BY md5(CAST(doc_id AS STRING)), doc_id
                   ROWS UNBOUNDED PRECEDING) AS cum
          FROM w JOIN q USING (lang)
        )
        SELECT doc_id, lang, n_chars FROM r WHERE cum <= quota
        """
    )
    via_df = corpus_mix_temperature_tokens(
        spark.table("documents").select(
            "doc_id",
            "lang",
            spark.table("documents").n_chars.cast("long").alias("n_chars"),
        ),
        "lang",
        0.5,
        "doc_id",
        "n_chars",
    ).select("doc_id", "lang", "n_chars")
    assert sorted(map(tuple, via_sql.collect())) == sorted(
        map(tuple, via_df.collect())
    )


def test_sql_frontdoor_count_min_sketch(spark):
    """The count-min construction re-expressed as one spark.sql statement
    (same md5-derived cells) must equal the operator."""
    from global_market_index_etl_spark.operators.terms import (
        count_min_cells,
    )

    register_views(spark, SF_SMALL)
    via_sql = spark.sql(
        r"""
        WITH terms AS (
          SELECT explode(split(trim(lower(text)), '\\s+')) AS t
          FROM documents WHERE length(trim(text)) > 0
        ), nz AS (
          SELECT t FROM terms WHERE t <> ''
        ), cells AS (
          SELECT r.i AS row,
                 CAST(conv(substr(md5(CONCAT(r.i, ':', t)), 1, 8), 16, 10)
                      AS BIGINT) % 64 AS cell
          FROM nz LATERAL VIEW explode(sequence(0, 3)) r AS i
        )
        SELECT row, cell, count(*) AS cnt
        FROM cells GROUP BY row, cell
        """
    )
    docs = spark.table("documents")
    via_df = count_min_cells(docs, depth=4, width=64).select(
        "row", "cell", "cnt"
    )
    assert sorted(map(tuple, via_sql.collect())) == sorted(
        map(tuple, via_df.collect())
    )


def test_sql_frontdoor_dsir_select(spark):
    """DSIR importance resampling as plain spark.sql: hashed unigram+bigram
    features, add-one-smoothed bucket multinomials, nano-nat log-ratio
    rounding, Gumbel top-k from md5(doc_id) — the full derivation in
    Spark SQL must equal sampling.dsir_select row-for-row (every integer
    column, not just the selected ids)."""
    from global_market_index_etl_spark.operators.sampling import dsir_select

    register_views(spark, SF_SMALL)
    import pyspark.sql.functions as F

    via_sql = spark.sql(
        r"""
        WITH toks AS (
          SELECT doc_id, lang,
                 CASE WHEN length(trim(text)) = 0 THEN array()
                      ELSE split(trim(lower(text)), '\\s+') END AS t
          FROM documents
        ), feats AS (
          SELECT doc_id, lang, f
          FROM toks
          LATERAL VIEW explode(
            concat(t, zip_with(slice(t, 1, greatest(size(t) - 1, 0)),
                               slice(t, 2, greatest(size(t) - 1, 0)),
                               (a, b) -> concat(a, chr(1), b)))) AS f
        ), feat AS (
          SELECT doc_id, lang,
                 CAST(conv(substring(md5(f), 1, 8), 16, 10) AS BIGINT) % 512
                   AS bucket,
                 count(*) AS cnt
          FROM feats GROUP BY 1, 2, 3
        ), models AS (
          SELECT bucket, sum(cnt) AS rc,
                 sum(CASE WHEN lang = 'en' THEN cnt ELSE 0 END) AS tc
          FROM feat GROUP BY 1
        ), tot AS (
          SELECT sum(rc) AS rn, sum(tc) AS tn FROM models
        ), lam AS (
          SELECT m.bucket,
                 CAST(round((ln((m.tc + 1.0)
                                / (CAST(tot.tn AS DOUBLE) + 512.0))
                           - ln((m.rc + 1.0)
                                / (CAST(tot.rn AS DOUBLE) + 512.0)))
                          * 1000000000) AS BIGINT) AS lambda_nano
          FROM models m CROSS JOIN tot
        ), w AS (
          SELECT f.doc_id,
                 CAST(sum(f.cnt) AS BIGINT) AS n_feat,
                 CAST(sum(f.cnt * l.lambda_nano) AS BIGINT) AS w_nano
          FROM feat f JOIN lam l USING (bucket)
          GROUP BY 1
        )
        SELECT doc_id, n_feat, w_nano,
               CAST(w_nano + CAST(round(-ln(-ln(
                   (CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 13),
                              16, 10) AS DOUBLE) + 0.5)
                   / 4503599627370496.0)) * 1000000000) AS BIGINT)
                 AS BIGINT) AS key_nano
        FROM w
        ORDER BY key_nano DESC, md5(CAST(doc_id AS STRING)), doc_id
        LIMIT 15
        """
    )
    via_df = dsir_select(
        spark.table("documents"), F.col("lang") == "en", 15, n_buckets=512
    )
    assert sorted(map(tuple, via_sql.collect())) == sorted(
        map(tuple, via_df.collect())
    )


def test_sql_frontdoor_simhash_signatures(spark):
    """SimHash signatures re-expressed as one spark.sql statement — possible
    since round 11 because the word hash is md5-derived (portable hex)
    rather than Spark-internal xxhash64. The 64 per-bit majority votes and
    the signed bit-63 reassembly are generated the same way as the DuckDB
    oracle's, so operator ≡ SQL front door ≡ oracle share one arithmetic."""
    from global_market_index_etl_spark.operators.dedup import simhash64

    register_views(spark, SF_SMALL)
    votes = []
    for i in range(64):
        half = "lo" if i < 32 else "hi"
        shift = i if i < 32 else i - 32
        votes.append(
            f"sum(CASE WHEN (shiftright({half}, {shift}) & 1) = 1 "
            f"THEN 1 ELSE -1 END) AS b{i}"
        )
    sig_terms = [
        "(CASE WHEN b63 > 0 THEN CAST(-9223372036854775808 AS BIGINT) "
        "ELSE CAST(0 AS BIGINT) END)"
    ] + [
        f"(CASE WHEN b{i} > 0 THEN CAST({1 << i} AS BIGINT) "
        f"ELSE CAST(0 AS BIGINT) END)"
        for i in range(63)
    ]
    via_sql = spark.sql(
        rf"""
        WITH wt AS (
          SELECT doc_id, explode(split(trim(lower(text)), '\\s+')) AS w
          FROM documents WHERE length(trim(text)) > 0
        ), wh AS (
          SELECT doc_id,
                 CAST(conv(substring(md5(w), 1, 8), 16, 10) AS BIGINT) AS hi,
                 CAST(conv(substring(md5(w), 9, 8), 16, 10) AS BIGINT) AS lo
          FROM wt
        ), votes AS (
          SELECT doc_id, {", ".join(votes)} FROM wh GROUP BY doc_id
        )
        SELECT doc_id, {" + ".join(sig_terms)} AS simhash FROM votes
        """
    )
    via_op = simhash64(spark.table("documents"))
    assert sorted(map(tuple, via_sql.collect())) == sorted(
        map(tuple, via_op.collect())
    )


def test_sql_frontdoor_exact_substring(spark):
    """ExactSubstr (round 12) through the SQL front door: the stride-1
    L-gram cover + keep-first survivor expressed as pure spark.sql over
    the registered views must equal the operator row for row — the
    DataFrame declaration adds nothing a SQL user cannot write."""
    from global_market_index_etl_spark.operators.spans import (
        exact_substring_dedup,
    )

    register_views(spark, SF_SMALL)
    L = 8
    via_sql = spark.sql(f"""
        WITH toks AS (
          SELECT doc_id,
                 split(trim(regexp_replace(lower(text), '\\\\s+', ' ')), ' ')
                   AS t
          FROM documents WHERE length(trim(text)) > 0
        ), occ AS (
          SELECT doc_id, pos + 1 AS i, w
          FROM toks
          LATERAL VIEW posexplode(
            transform(sequence(1, size(t) - {L - 1}),
                      i -> md5(concat_ws(' ', slice(t, i, {L}))))) AS pos, w
          WHERE size(t) >= {L}
        ), marked AS (
          SELECT doc_id, i,
                 count(*) OVER (PARTITION BY w) AS cnt,
                 min(struct(doc_id, i)) OVER (PARTITION BY w) AS surv
          FROM occ
        ), covered AS (
          SELECT DISTINCT doc_id, j
          FROM (SELECT doc_id, i FROM marked
                WHERE cnt >= 2
                  AND NOT (surv.doc_id = doc_id AND surv.i = i))
          LATERAL VIEW explode(sequence(i, i + {L - 1})) AS j
        ), toksp AS (
          SELECT doc_id, pos + 1 AS j, tok
          FROM toks LATERAL VIEW posexplode(t) AS pos, tok
        ), kept AS (
          SELECT t.doc_id, t.j, t.tok
          FROM toksp t LEFT ANTI JOIN covered c
            ON t.doc_id = c.doc_id AND t.j = c.j
        )
        SELECT b.doc_id,
               concat_ws(' ', transform(
                 sort_array(collect_list(struct(k.j, k.tok))),
                 x -> x.tok)) AS cleaned_text,
               CAST(any_value(b.n) AS BIGINT) AS n_tokens,
               CAST(any_value(b.n) - count(k.tok) AS BIGINT)
                 AS n_removed_tokens
        FROM (SELECT doc_id, size(t) AS n FROM toks) b
        LEFT JOIN kept k ON b.doc_id = k.doc_id
        GROUP BY b.doc_id
    """)
    via_op = exact_substring_dedup(
        spark.read.parquet(f"{SF_SMALL}/documents.parquet"), min_len=L
    )
    assert sorted(map(tuple, via_sql.collect())) == sorted(
        map(tuple, via_op.collect())
    )


def test_sql_frontdoor_hll_registers(spark):
    """The portable-HLL register construction re-expressed as one
    spark.sql statement (same md5-derived 60-bit hash, same exact
    binary-string leading-zero rho) must equal the operator."""
    from global_market_index_etl_spark.operators.terms import hll_registers

    register_views(spark, SF_SMALL)
    via_sql = spark.sql(
        """
        WITH h AS (
          SELECT event_type,
                 CAST(conv(substr(md5(CAST(user_id AS STRING)), 1, 15),
                           16, 10) AS BIGINT) AS h60
          FROM events WHERE user_id IS NOT NULL
        ), parts AS (
          SELECT event_type, shiftright(h60, 50) AS bucket,
                 h60 & 1125899906842623 AS rem
          FROM h
        ), rho AS (
          SELECT event_type, bucket,
                 CASE WHEN rem = 0 THEN 51
                      ELSE 51 - length(bin(rem)) END AS rho
          FROM parts
        )
        SELECT event_type, bucket, CAST(max(rho) AS INT) AS max_rho,
               10 AS p
        FROM rho GROUP BY event_type, bucket
        """
    )
    via_df = hll_registers(
        spark.table("events"), "user_id", p=10, group_cols=["event_type"]
    )
    assert sorted(map(tuple, via_sql.collect())) == sorted(
        map(tuple, via_df.collect())
    )


def test_sql_frontdoor_quantile_histogram(spark):
    """The portable quantile-histogram construction re-expressed as one
    spark.sql statement (same fixed-point round, same exact
    binary-string bit-length, same integer DIV bucketing) must equal
    the operator — the E3 front door covers the sketch tier's newest
    member like it covers count-min/SimHash/HLL."""
    from global_market_index_etl_spark.operators.terms import (
        quantile_buckets,
    )

    register_views(spark, SF_SMALL)
    bits, scale_bits = 6, 20
    via_sql = spark.sql(
        f"""
        WITH q AS (
          SELECT event_type,
                 CASE WHEN value < 0 THEN -1 ELSE 1 END AS sign,
                 CAST(round(abs(value) * {1 << scale_bits}) AS BIGINT) AS q
          FROM events WHERE value IS NOT NULL
        ), s AS (
          SELECT event_type, sign, q,
                 CAST(greatest(length(bin(q)) - {bits + 1}, 0) AS BIGINT)
                   AS shift
          FROM q
        ), b AS (
          SELECT event_type,
                 CASE WHEN q = 0 THEN 0
                      ELSE sign * ((q DIV CAST(pow(2, shift) AS BIGINT))
                                   + shift * {1 << bits})
                 END AS bucket
          FROM s
        )
        SELECT event_type, bucket, count(*) AS cnt,
               {bits} AS bits, {scale_bits} AS scale_bits
        FROM b GROUP BY event_type, bucket
        """
    )
    via_df = quantile_buckets(
        spark.table("events"),
        "value",
        group_cols=["event_type"],
        bits=bits,
        scale_bits=scale_bits,
    )
    assert sorted(map(tuple, via_sql.collect())) == sorted(
        map(tuple, via_df.collect())
    )


def test_sql_frontdoor_bloom_registers(spark):
    """The portable Bloom-filter construction re-expressed as one
    spark.sql statement (same md5-derived positions via conv(), same
    32-bit word packing, same bit_or) must equal the operator — the E3
    front door covers the sketch family's membership member like it
    covers count-min/SimHash/HLL/quantile."""
    from global_market_index_etl_spark.operators.terms import (
        bloom_registers,
    )

    register_views(spark, SF_SMALL)
    m_bits, k = 4096, 3
    via_sql = spark.sql(
        f"""
        WITH keys AS (
          SELECT md5(text) AS fp FROM documents WHERE text IS NOT NULL
        ), pos AS (
          SELECT CAST(conv(substring(md5(concat(j, ':', fp)), 1, 15),
                           16, 10) AS BIGINT) % {m_bits} AS pos
          FROM keys
          LATERAL VIEW explode(sequence(0, {k - 1})) t AS j
        )
        SELECT pos DIV 32 AS word_idx,
               bit_or(shiftleft(CAST(1 AS BIGINT),
                                CAST(pos % 32 AS INT))) AS bits,
               {m_bits} AS m_bits, {k} AS k_hashes
        FROM pos GROUP BY pos DIV 32
        """
    )
    via_df = bloom_registers(
        spark.table("documents").selectExpr("md5(text) AS fp"),
        "fp",
        m_bits=m_bits,
        k_hashes=k,
    )
    assert sorted(map(tuple, via_sql.collect())) == sorted(
        map(tuple, via_df.collect())
    )


def test_sql_frontdoor_bm25_topk(spark):
    """The BM25 registry row is reproducible verbatim through spark.sql —
    same tokenization, query-vocabulary pre-filter, idf, integer-scaled
    contributions and ranking as operators/terms.py bm25_topk (double
    literals written with the D suffix so Spark SQL doesn't parse them
    as decimals)."""
    register_views(spark, SF_SMALL)
    via_sql = spark.sql(
        """
        WITH q AS (
          SELECT * FROM VALUES
            (1, 'key hash join'), (2, 'fast scan filter'),
            (3, 'customer order line'), (4, 'window group agg'),
            (5, 'vector batch merge') AS q(query_id, query_text)
        ), tok AS (
          SELECT doc_id,
                 CASE WHEN length(trim(lower(text))) = 0
                      THEN CAST(array() AS ARRAY<STRING>)
                      ELSE split(trim(lower(text)), '\\\\s+') END AS arr
          FROM documents
        ), ex AS (
          SELECT doc_id, size(arr) AS dl, explode(arr) AS word FROM tok
        ), qt AS (
          SELECT DISTINCT query_id, word FROM (
            SELECT query_id,
                   explode(split(trim(lower(query_text)), '\\\\s+')) AS word
            FROM q
          )
        ), tf AS (
          SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf,
                 CAST(min(dl) AS BIGINT) AS dl
          FROM ex WHERE word IN (SELECT word FROM qt)
          GROUP BY 1, 2
        ), dfreq AS (
          SELECT word, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
        ), stats AS (
          SELECT CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(size(arr)) AS BIGINT) AS sum_dl
          FROM tok
        ), cand AS (
          SELECT qt.query_id, tf.doc_id,
                 CAST(floor(
                   ln(1.0D + (CAST(n_docs - df AS DOUBLE) + 0.5D)
                            / (CAST(df AS DOUBLE) + 0.5D))
                   * (CAST(tf AS DOUBLE) * 2.25D)
                   / (CAST(tf AS DOUBLE)
                      + 1.25D * (0.25D + 0.75D * (CAST(dl AS DOUBLE)
                          / (CAST(sum_dl AS DOUBLE)
                             / CAST(n_docs AS DOUBLE)))))
                   * 1000000000.0D + 0.5D) AS BIGINT) AS contrib
          FROM tf JOIN qt USING (word) JOIN dfreq USING (word)
               CROSS JOIN stats
        ), scores AS (
          SELECT query_id, doc_id,
                 CAST(sum(contrib) AS BIGINT) AS score_scaled
          FROM cand GROUP BY 1, 2
        )
        SELECT query_id, CAST(rnk AS INT) AS rnk, doc_id, score_scaled,
               CAST(score_scaled AS DOUBLE) / 1000000000.0D AS score
        FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
                        ORDER BY score_scaled DESC, doc_id) AS rnk
          FROM scores
        ) WHERE rnk <= 10
        """
    )
    via_df = REGISTRY["text_bm25_topk"].spark(spark, SF_SMALL)
    assert sorted(map(tuple, via_sql.collect())) == sorted(
        map(tuple, via_df.collect())
    )

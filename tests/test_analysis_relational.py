"""Analysis + relational pipelines cross-checked against DuckDB on
sf0.001 (the same comparison the driver's correctness gate performs)."""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _check(ds, sql, con):
    got = _canon(ds.to_pandas())
    want = _canon(con.sql(sql).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_token_counts(con):
    from granulate_char_ocr_ray.pipelines.analysis import token_counts

    _check(token_counts(SF),
           "SELECT doc_id, CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)"
           " AS n_tokens FROM documents", con)


def test_docs_by_lang(con):
    from granulate_char_ocr_ray.pipelines.analysis import docs_by_lang

    _check(docs_by_lang(SF),
           "SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, "
           "round(sum(CAST(n_chars AS DOUBLE))/count(*), 2) AS avg_chars "
           "FROM documents GROUP BY lang", con)


def test_length_histogram(con):
    from granulate_char_ocr_ray.pipelines.analysis import length_histogram

    _check(length_histogram(SF),
           "SELECT (n_chars // 50) * 50 AS bucket_lo, CAST(count(*) AS BIGINT) "
           "AS n_docs FROM documents GROUP BY 1", con)


def test_lang_id_heuristic_on_crafted_text():
    from granulate_char_ocr_ray.functions.textstats import lang_id

    assert lang_id("the cat sat on the mat and it was good")[0] == "en"
    assert lang_id("der hund und die katze ist nicht da")[0] == "de"
    assert lang_id("")[0] == "und"


def test_gopher_rules_batch_vs_python_scalar():
    """Vectorized Gopher signals match a plain-Python re-derivation on
    crafted edge cases (empty, whitespace-only, multibyte, repeated
    stopwords counted once, '...' runs)."""
    import re

    import numpy as np
    import pyarrow as pa

    from granulate_char_ocr_ray.functions.textstats import (
        GOPHER_STOPWORDS, gopher_rules_batch)

    texts = [
        "the cat sat on the mat and it was good",
        "",
        "   \t  ",
        "café naïve résumé über",
        "### #### ...... ... #",
        "to to to to to to",
        "a b c 123 456 !!! the of",
        "x" * 300,
    ]
    f = gopher_rules_batch(pa.array(texts))
    for i, t in enumerate(texts):
        words = t.strip().split() if t.strip() else []
        wc = len(words)
        assert f["word_count"][i] == wc
        if wc:
            nws = len(re.sub(r"\s", "", t))
            sym = t.count("#") + t.count("...")
            alpha = sum(1 for w in words if re.search("[a-zA-Z]", w))
            stops = sum(1 for sw in GOPHER_STOPWORDS
                        if sw in (w.lower() for w in words))
            assert np.isclose(f["mean_word_len"][i], nws / wc)
            assert np.isclose(f["symbol_ratio"][i], sym / wc)
            assert np.isclose(f["alpha_frac"][i], alpha / wc)
            assert f["stop_hits"][i] == stops
        else:
            assert f["mean_word_len"][i] == 0.0
            assert f["stop_hits"][i] == 0


def test_gopher_quality_rules_pipeline(con):
    from granulate_char_ocr_ray.pipelines.analysis import gopher_quality_rules

    got = gopher_quality_rules(SF).to_pandas()
    assert len(got) == con.sql("SELECT count(*) FROM documents").fetchone()[0]
    assert set(got["passes"].unique()) <= {0, 1}
    # passes implies every individual rule holds on the emitted signals
    p = got[got["passes"] == 1]
    assert (p["word_count"] >= 50).all()
    assert p["mean_word_len"].between(3.0, 10.0).all()
    assert (p["symbol_ratio"] <= 0.1 + 1e-9).all()
    assert (p["alpha_frac"] >= 0.8 - 1e-9).all()
    assert (p["stop_hits"] >= 2).all()


def test_dsir_importance_weights_separate_target_lang():
    """The whole point of the importance weight: docs from the target
    distribution (lang='en') must score higher on average than docs
    from other languages, and weights must be finite everywhere
    (add-alpha smoothing covers target-zero tokens)."""
    import numpy as np

    from granulate_char_ocr_ray.pipelines.analysis import (
        dsir_importance_weights)

    got = dsir_importance_weights(SF, target_lang="en").to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "lang"])
    m = got.merge(docs, on="doc_id")
    assert np.isfinite(m["lnw"]).all()
    en = m.loc[m["lang"] == "en", "lnw"].mean()
    rest = m.loc[m["lang"] != "en", "lnw"].mean()
    assert en > rest


def test_fingerprints_deterministic():
    from granulate_char_ocr_ray.functions.textstats import fingerprint64
    from granulate_char_ocr_ray.pipelines.analysis import fingerprints

    got = fingerprints(SF).to_pandas()
    import pyarrow.dataset as pads

    df = pads.dataset(f"{SF}/documents.parquet").to_table(
        columns=["doc_id", "text"]).to_pandas()
    merged = got.merge(df, on="doc_id")
    for r in merged.head(50).itertuples():
        assert r.fp == fingerprint64(r.text)
    # normalization-invariance: extra whitespace does not change fp
    assert fingerprint64("a  b\tc") == fingerprint64("a b c")


def test_q1_pricing_summary(con):
    from granulate_char_ocr_ray.pipelines.relational import q1_pricing_summary

    _check(q1_pricing_summary(SF), """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1-l_discount)), 2) AS sum_disc_price,
               round(sum(l_extendedprice * (1-l_discount) * (1+l_tax)), 2) AS sum_charge,
               round(sum(l_quantity)/count(*), 2) AS avg_qty,
               round(sum(l_extendedprice)/count(*), 2) AS avg_price,
               round(sum(l_discount)/count(*), 4) AS avg_disc,
               CAST(count(*) AS BIGINT) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 23:59:59.999999'
        GROUP BY l_returnflag, l_linestatus
    """, con)


def test_revenue_by_nation(con):
    from granulate_char_ocr_ray.pipelines.relational import revenue_by_nation

    _check(revenue_by_nation(SF), """
        SELECT n_name, round(sum(o_totalprice), 2) AS revenue,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM orders JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name
    """, con)


def test_top_event_types(con):
    from granulate_char_ocr_ray.pipelines.relational import top_event_types

    got = top_event_types(SF).to_pandas()
    want = con.sql("""
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
               round(sum(value)/count(*), 2) AS avg_value
        FROM events GROUP BY event_type ORDER BY n_events DESC, event_type
    """).df()
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want,
                                  check_dtype=False)


def test_q6_revenue(con):
    from granulate_char_ocr_ray.pipelines.relational import q6_revenue

    _check(q6_revenue(SF), """
        SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
               CAST(count(*) AS BIGINT) AS n_rows
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """, con)


def test_q3_shipping_priority(con):
    from granulate_char_ocr_ray.pipelines.relational import q3_shipping_priority

    got = q3_shipping_priority(SF).to_pandas().reset_index(drop=True)
    want = con.sql("""
        SELECT l_orderkey, o_orderdate,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-01-01'
          AND l_shipdate > TIMESTAMP '1998-01-01'
        GROUP BY 1, 2 ORDER BY revenue DESC, l_orderkey LIMIT 10
    """).df()
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)


def test_distinct_langs(con):
    from granulate_char_ocr_ray.pipelines.analysis import distinct_langs

    got = distinct_langs(SF).to_pandas()
    want = con.sql("SELECT DISTINCT lang FROM documents ORDER BY lang").df()
    pd.testing.assert_frame_equal(got, want)


def test_top_parts_per_brand(con):
    from granulate_char_ocr_ray.pipelines.relational import top_parts_per_brand

    got = top_parts_per_brand(SF).to_pandas().reset_index(drop=True)
    want = con.sql("""
        SELECT p_brand, p_partkey, p_retailprice FROM (
          SELECT p_brand, p_partkey, p_retailprice,
                 row_number() OVER (PARTITION BY p_brand
                                    ORDER BY p_retailprice DESC, p_partkey) AS rn
          FROM part) WHERE rn <= 2
        ORDER BY p_brand, p_retailprice DESC, p_partkey
    """).df()
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)


def test_quantity_deciles(con):
    from granulate_char_ocr_ray.pipelines.relational import quantity_deciles

    _check(quantity_deciles(SF), """
        SELECT unnest([0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS q,
               unnest(quantile_disc(l_quantity,
                      [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9])) AS value
        FROM lineitem
    """, con)


def test_supplier_balance_by_nation(con):
    from granulate_char_ocr_ray.pipelines.relational import supplier_balance_by_nation

    _check(supplier_balance_by_nation(SF), """
        SELECT n_name, CAST(count(*) AS BIGINT) AS n_suppliers,
               round(sum(s_acctbal), 2) AS total_acctbal
        FROM supplier JOIN nation ON s_nationkey = n_nationkey GROUP BY n_name
    """, con)


def test_customers_per_region(con):
    from granulate_char_ocr_ray.pipelines.relational import customers_per_region

    _check(customers_per_region(SF), """
        SELECT r_name, CAST(count(*) AS BIGINT) AS n_customers
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey GROUP BY r_name
    """, con)


def test_filter_quality(con):
    from granulate_char_ocr_ray.pipelines.analysis import filter_quality

    got = filter_quality(SF).to_pandas()
    want = con.sql("""
        SELECT doc_id FROM documents
        WHERE len(regexp_split_to_array(trim(text), '\\s+')) >= 20
          AND CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS DOUBLE)
              / length(text) <= 0.3 AND trim(text) != ''
        ORDER BY doc_id
    """).df()
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want,
                                  check_dtype=False)


def test_top_tokens(con):
    from granulate_char_ocr_ray.pipelines.analysis import top_tokens

    got = top_tokens(SF).to_pandas().reset_index(drop=True)
    want = con.sql("""
        SELECT token, CAST(count(*) AS BIGINT) AS n FROM (
          SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
          FROM documents WHERE trim(text) != ''
        ) GROUP BY token ORDER BY n DESC, token LIMIT 20
    """).df()
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)


def test_order_item_totals(con):
    from granulate_char_ocr_ray.pipelines.relational import order_item_totals

    _check(order_item_totals(SF), """
        SELECT o_orderkey, o_totalprice, CAST(count(*) AS BIGINT) AS n_items,
               round(sum(l_extendedprice), 2) AS items_value
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY o_orderkey, o_totalprice
    """, con)


def test_approx_distinct_tokens_within_error(con):
    from granulate_char_ocr_ray.pipelines.analysis import approx_distinct_tokens

    got = approx_distinct_tokens(SF).to_pandas()["approx_distinct"].iloc[0]
    exact = con.sql("""
        SELECT count(DISTINCT token) FROM (
          SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
          FROM documents WHERE trim(text) != '')
    """).df().iloc[0, 0]
    assert abs(got - exact) <= max(3, 0.1 * exact)


def test_hll_accuracy_large_cardinality():
    import numpy as np

    from granulate_char_ocr_ray.functions.sketch import (
        hll_add_hashes,
        hll_create,
        hll_estimate,
        hll_merge,
    )

    rng = np.random.RandomState(5)
    n = 50000
    # full 64-bit hashes (two 32-bit halves); a 63-bit space would leave
    # half the HLL index range empty
    hashes = (rng.randint(0, 2**32, size=n, dtype=np.uint64) << np.uint64(32)) \
        | rng.randint(0, 2**32, size=n, dtype=np.uint64)
    distinct = len(np.unique(hashes))
    # split across 10 "batches" and merge
    merged = hll_create()
    for chunk in np.array_split(hashes, 10):
        r = hll_create()
        hll_add_hashes(r, chunk)
        merged = hll_merge(merged, r)
    est = hll_estimate(merged)
    assert abs(est - distinct) / distinct < 0.05


def test_vectorized_batch_forms_match_scalars():
    """The Arrow-kernel batch forms are bit-identical to the scalar
    reference implementations (round 2: text-analysis vectorization)."""
    import numpy as np
    import pyarrow as pa

    from granulate_char_ocr_ray.functions.textstats import (
        fingerprint64, fingerprint64_batch, hash64, hash64_batch,
        lang_id, lang_id_batch, quality_features, quality_features_batch)

    texts = ["hello world", "", "   ", "The CAT sat 42 times!", "a  b\tc",
             "der hund und die katze ist nicht da",
             "el la los y es un 99", "x" * 5000 + " yy", "MiXeD 123 !!!"]
    arr = pa.array(texts)
    hb = hash64_batch(arr)
    fb = fingerprint64_batch(arr)
    qb = quality_features_batch(arr)
    pred, score = lang_id_batch(arr)
    for i, t in enumerate(texts):
        assert hash64(t.encode()) == int(hb[i])
        assert fingerprint64(t) == int(fb[i])
        s = quality_features(t)
        for k in s:
            assert np.isclose(qb[k][i], s[k]), (t, k)
        sl, ss = lang_id(t)
        assert pred[i] == sl and np.isclose(score[i], ss)


def test_hll_token_hash_accuracy_1m_distinct():
    """The HLL input hash (hash64_batch) keeps the estimator within 3%
    at 10^6 distinct tokens — the property the old crc32-pair hash broke
    (crc is affine in its init; VERDICT r01 wrong-item #1)."""
    import pyarrow as pa

    from granulate_char_ocr_ray.functions.sketch import (
        hll_add_hashes, hll_create, hll_estimate, hll_merge)
    from granulate_char_ocr_ray.functions.textstats import hash64_batch

    n = 1_000_000
    merged = hll_create()
    for lo in range(0, n, 250_000):
        toks = pa.array([f"tok{i}" for i in range(lo, lo + 250_000)])
        r = hll_create()
        hll_add_hashes(r, hash64_batch(toks))
        merged = hll_merge(merged, r)
    est = hll_estimate(merged)
    assert abs(est - n) / n <= 0.03


def test_modal_event_type_per_user(con):
    from granulate_char_ocr_ray.pipelines.relational import (
        modal_event_type_per_user)

    _check(modal_event_type_per_user(SF), """
        SELECT user_id, event_type AS modal_event_type,
               CAST(n AS BIGINT) AS modal_event_type_count
        FROM (
          SELECT user_id, event_type, count(*) AS n,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY count(*) DESC, event_type) AS rn
          FROM events GROUP BY user_id, event_type
        ) WHERE rn = 1
    """, con)


def test_sample_docs_matches_closed_form(con):
    from granulate_char_ocr_ray.pipelines.relational import sample_docs

    _check(sample_docs(SF), """
        SELECT doc_id FROM documents
        WHERE (doc_id * 2654435761) % 4294967296 % 100 < 10
    """, con)


def test_train_test_split_partitions_corpus():
    from granulate_char_ocr_ray.pipelines.relational import train_test_split

    train, test = train_test_split(SF)
    tr = set(train.to_pandas()["doc_id"])
    te = set(test.to_pandas()["doc_id"])
    import pyarrow.dataset as pads
    allids = set(pads.dataset(f"{SF}/documents.parquet").to_table(
        columns=["doc_id"]).column("doc_id").to_pylist())
    assert tr | te == allids
    assert tr & te == set()
    assert 0 < len(te) < len(allids)


def test_revenue_by_nation_both_plans_identical():
    """Broadcast and partitioned-join plans for revenue_by_nation are
    hash-identical (the size-threshold dispatch is a pure physical
    choice)."""
    from granulate_char_ocr_ray.pipelines.relational import revenue_by_nation

    bc = _canon(revenue_by_nation(SF, broadcast_threshold=10**9).to_pandas())
    pj = _canon(revenue_by_nation(SF, broadcast_threshold=0).to_pandas())
    pd.testing.assert_frame_equal(bc, pj, check_dtype=False)


def test_q3_both_plans_identical():
    from granulate_char_ocr_ray.pipelines.relational import q3_shipping_priority

    bc = _canon(q3_shipping_priority(SF, broadcast_threshold=10**9).to_pandas())
    pj = _canon(q3_shipping_priority(SF, broadcast_threshold=0).to_pandas())
    pd.testing.assert_frame_equal(bc, pj, check_dtype=False)


def test_kll_sketch_accuracy_vs_exact_deciles(con):
    """KLL-style sketch deciles are within 1% RANK error of the exact
    distribution (the mergeable scale path for continuous quantiles)."""
    import numpy as np

    from granulate_char_ocr_ray.pipelines.relational import (
        approx_quantity_deciles)

    got = approx_quantity_deciles(SF).to_pandas()
    vals = con.sql("SELECT l_quantity FROM lineitem").df()[
        "l_quantity"].to_numpy()
    vals.sort()
    n = len(vals)
    for r in got.itertuples():
        # rank of the reported value vs the target rank
        lo = np.searchsorted(vals, r.value, side="left")
        hi = np.searchsorted(vals, r.value, side="right")
        target = r.q * n
        err = min(abs(lo - target), abs(hi - target)) / n
        assert err <= 0.01, (r.q, r.value, err)


def test_kll_merge_associativity_and_determinism():
    import numpy as np

    from granulate_char_ocr_ray.functions.sketch import (
        kll_add, kll_create, kll_deserialize, kll_merge, kll_quantiles,
        kll_serialize)

    rng = np.random.RandomState(11)
    data = rng.gamma(2.0, 10.0, size=200_000)
    chunks = np.array_split(data, 7)
    merged = kll_create()
    for c in chunks:
        sk = kll_create()
        kll_add(sk, c)
        merged = kll_merge(merged, kll_deserialize(kll_serialize(sk)))
    qs = [0.1, 0.5, 0.9, 0.99]
    est = kll_quantiles(merged, qs)
    exact = np.quantile(data, qs)
    data.sort()
    for q, e in zip(qs, est):
        rank_err = abs(np.searchsorted(data, e) - q * len(data)) / len(data)
        assert rank_err <= 0.01, (q, e, rank_err)
    # determinism: same input -> same sketch bytes
    sk1, sk2 = kll_create(), kll_create()
    kll_add(sk1, data[:50_000]); kll_add(sk2, data[:50_000])
    assert kll_serialize(sk1) == kll_serialize(sk2)


def test_misra_gries_guarantees(con):
    """True heavy hitters are guaranteed present in the MG candidates;
    reported counts are lower bounds within n/(k+1) of the truth."""
    from granulate_char_ocr_ray.pipelines.analysis import approx_top_tokens

    got = approx_top_tokens(SF, k=20).to_pandas()
    exact = con.sql("""
        SELECT token, CAST(count(*) AS BIGINT) AS n FROM (
          SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
          FROM documents WHERE trim(text) != ''
        ) GROUP BY token ORDER BY n DESC, token
    """).df()
    n_total = int(exact["n"].sum())
    bound = n_total / (256 + 1)
    exact_counts = dict(zip(exact["token"], exact["n"]))
    approx = dict(zip(got["token"], got["approx_count"]))
    # the true top-10 all have counts far above the bound -> present
    for tok, cnt in list(exact_counts.items())[:10]:
        assert cnt > bound
        assert tok in approx, tok
        assert approx[tok] <= cnt
        assert cnt - approx[tok] <= bound


def test_native_join_matches_bucket_join():
    """Ray's built-in Dataset.join produces the same order_item_totals
    as the explicit union-bucket join (the streaming default)."""
    from granulate_char_ocr_ray.pipelines.relational import (
        order_item_totals, order_item_totals_native)

    a = _canon(order_item_totals(SF).to_pandas())
    # num_partitions=2: the native join spawns one aggregator ACTOR per
    # partition — 32 of them deadlock the 4-CPU test session (the
    # fixed-pool starvation gotcha); size to the session
    b = _canon(order_item_totals_native(SF, num_partitions=2).to_pandas())
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_q5_local_supplier_volume(con):
    from granulate_char_ocr_ray.pipelines.relational import (
        q5_local_supplier_volume,
    )

    _check(q5_local_supplier_volume(SF), """
        SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2)
                 AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY n_name
    """, con)


def test_customer_order_counts_includes_zero_order_customers(con):
    from granulate_char_ocr_ray.pipelines.relational import (
        customer_order_counts,
    )

    got = customer_order_counts(SF).to_pandas()
    want = con.sql("""
        SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS n_orders,
               round(coalesce(sum(o_totalprice), 0), 2) AS total_spent
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey ORDER BY c_custkey
    """).df()
    pd.testing.assert_frame_equal(_canon(got), _canon(want),
                                  check_dtype=False)
    # the LEFT join is load-bearing: every customer appears even when
    # its orders vanish (sf0.001 gives every customer orders, so build
    # a fixture dir with one customer's orders removed)
    n_cust = con.sql("SELECT count(*) FROM customer").fetchone()[0]
    assert len(got) == n_cust
    import os
    import tempfile

    victim = int(got["c_custkey"].iloc[0])
    with tempfile.TemporaryDirectory() as td:
        for t in ["customer", "orders"]:
            src = f"{SF}/{t}.parquet"
            dst = os.path.join(td, f"{t}.parquet")
            if t == "orders":
                duckdb.sql(f"COPY (SELECT * FROM '{src}' WHERE o_custkey"
                           f" != {victim}) TO '{dst}' (FORMAT PARQUET)")
            else:
                duckdb.sql(f"COPY (SELECT * FROM '{src}') TO '{dst}'"
                           " (FORMAT PARQUET)")
        cut = customer_order_counts(td).to_pandas()
        row = cut[cut["c_custkey"] == victim]
        assert len(cut) == n_cust
        assert row["n_orders"].iloc[0] == 0
        assert row["total_spent"].iloc[0] == 0.0


def test_quantity_percentiles_cont(con):
    from granulate_char_ocr_ray.pipelines.relational import (
        quantity_percentiles_cont,
    )

    _check(quantity_percentiles_cont(SF), """
        SELECT unnest(CAST([0.1,0.2,0.25,0.3,0.4,0.5,0.6,0.7,0.75,
                            0.8,0.9,0.99] AS DOUBLE[])) AS q,
               unnest(list_transform(
                 quantile_cont(l_quantity,
                   [0.1,0.2,0.25,0.3,0.4,0.5,0.6,0.7,0.75,0.8,0.9,0.99]),
                 x -> round(x, 4))) AS value
        FROM lineitem
    """, con)


def test_large_orders_having_join(con):
    from granulate_char_ocr_ray.pipelines.relational import large_orders

    got = large_orders(SF, min_qty=150.0, k=50).to_pandas()
    want = con.sql("""
        SELECT o_orderkey, o_custkey, o_totalprice,
               round(sum_qty, 2) AS sum_qty
        FROM orders JOIN (
          SELECT l_orderkey, sum(l_quantity) AS sum_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING sum(l_quantity) > 150
        ) ON o_orderkey = l_orderkey
        ORDER BY sum_qty DESC, o_orderkey LIMIT 50
    """).df()
    assert len(want) > 0
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True),
        check_dtype=False)


def test_events_rollup_levels(con):
    from granulate_char_ocr_ray.pipelines.relational import events_rollup

    _check(events_rollup(SF), """
        SELECT event_type, date_trunc('day', ts) AS day,
               CAST(count(*) AS BIGINT) AS n_events
        FROM events GROUP BY ROLLUP(event_type, day)
    """, con)
    got = events_rollup(SF).to_pandas()
    total = got[got["event_type"].isna()]
    fine = got[got["event_type"].notna() & got["day"].notna()]
    assert len(total) == 1
    assert total["n_events"].iloc[0] == fine["n_events"].sum()


def test_large_orders_both_plans_identical():
    from granulate_char_ocr_ray.pipelines.relational import large_orders

    bc = large_orders(SF, min_qty=150.0).to_pandas().reset_index(drop=True)
    pj = large_orders(SF, min_qty=150.0,
                      broadcast_threshold=0).to_pandas().reset_index(
        drop=True)
    pd.testing.assert_frame_equal(bc, pj)


def test_q5_both_plans_identical():
    from granulate_char_ocr_ray.pipelines.relational import (
        q5_local_supplier_volume,
    )

    bc = q5_local_supplier_volume(SF).to_pandas().reset_index(drop=True)
    pj = q5_local_supplier_volume(
        SF, broadcast_threshold=0).to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(bc, pj)


def test_orderkey_set_operations(con):
    from granulate_char_ocr_ray.pipelines.relational import (
        orderkeys_except,
        orderkeys_intersect,
    )

    inter = orderkeys_intersect(SF).to_pandas()
    exc = orderkeys_except(SF).to_pandas()
    want_i = con.sql("""
        SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
        INTERSECT SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'A'
        ORDER BY l_orderkey""").df()
    want_e = con.sql("""
        SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
        EXCEPT SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'A'
        ORDER BY l_orderkey""").df()
    assert len(want_i) > 0 and len(want_e) > 0
    pd.testing.assert_frame_equal(inter.reset_index(drop=True), want_i,
                                  check_dtype=False)
    pd.testing.assert_frame_equal(exc.reset_index(drop=True), want_e,
                                  check_dtype=False)
    # INTERSECT and EXCEPT partition the 'R' orderkey set
    assert not set(inter["l_orderkey"]) & set(exc["l_orderkey"])


def test_quantity_deciles_by_flag(con):
    from granulate_char_ocr_ray.pipelines.relational import (
        quantity_deciles_by_flag,
    )

    _check(quantity_deciles_by_flag(SF), """
        SELECT l_returnflag,
               unnest(CAST([0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]
                           AS DOUBLE[])) AS q,
               unnest(quantile_disc(l_quantity,
                      [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9])) AS value
        FROM lineitem GROUP BY l_returnflag
    """, con)


def test_event_types_per_user_string_agg(con):
    from granulate_char_ocr_ray.pipelines.relational import (
        event_types_per_user,
    )

    got = event_types_per_user(SF).to_pandas().reset_index(drop=True)
    want = con.sql("""
        SELECT user_id, string_agg(DISTINCT event_type, ','
                                   ORDER BY event_type) AS types
        FROM events GROUP BY user_id ORDER BY user_id
    """).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_orders_above_avg_scalar_subquery(con):
    from granulate_char_ocr_ray.pipelines.relational import orders_above_avg

    got = orders_above_avg(SF).to_pandas().reset_index(drop=True)
    want = con.sql("""
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
        ORDER BY o_orderkey
    """).df()
    assert 0 < len(want) < con.sql("SELECT count(*) FROM orders").fetchone()[0]
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_q10_returned_items(con):
    from granulate_char_ocr_ray.pipelines.relational import q10_returned_items

    got = q10_returned_items(SF).to_pandas().reset_index(drop=True)
    want = con.sql("""
        SELECT c_custkey, c_name, n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
        GROUP BY 1, 2, 3 ORDER BY revenue DESC, c_custkey LIMIT 20
    """).df()
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)


def test_q10_both_plans_identical():
    from granulate_char_ocr_ray.pipelines.relational import q10_returned_items

    bc = q10_returned_items(SF).to_pandas().reset_index(drop=True)
    pj = q10_returned_items(SF, broadcast_threshold=0).to_pandas(
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(bc, pj)


def test_q14_promo_revenue(con):
    from granulate_char_ocr_ray.pipelines.relational import q14_promo_revenue

    got = q14_promo_revenue(SF).to_pandas()
    want = con.sql("""
        SELECT round(100 * sum(CASE WHEN p_type LIKE 'PROMO%'
                 THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
               / sum(l_extendedprice * (1 - l_discount)), 2)
                 AS promo_revenue_pct,
               round(sum(l_extendedprice * (1 - l_discount)), 2)
                 AS total_revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-06-01'
          AND l_shipdate < TIMESTAMP '1997-07-01'
    """).df()
    assert want["total_revenue"].iloc[0] > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_q4_order_priority(con):
    from granulate_char_ocr_ray.pipelines.relational import q4_order_priority

    got = q4_order_priority(SF).to_pandas().reset_index(drop=True)
    want = con.sql("""
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-07-01'
          AND o_orderdate < TIMESTAMP '1997-10-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_returnflag = 'R')
        GROUP BY o_orderpriority ORDER BY o_orderpriority
    """).df()
    assert len(want) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_q4_both_plans_identical():
    from granulate_char_ocr_ray.pipelines.relational import q4_order_priority

    bc = q4_order_priority(SF).to_pandas().reset_index(drop=True)
    pj = q4_order_priority(SF, broadcast_threshold=0).to_pandas(
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(bc, pj)


def test_events_cube(con):
    from granulate_char_ocr_ray.pipelines.relational import events_cube

    _check(events_cube(SF), """
        SELECT event_type, date_trunc('day', ts) AS day,
               CAST(count(*) AS BIGINT) AS n_events
        FROM events GROUP BY CUBE(event_type, day)
    """, con)


def test_orders_no_returns(con):
    from granulate_char_ocr_ray.pipelines.relational import (
        orders_no_returns, q4_order_priority)

    got = orders_no_returns(SF).to_pandas().reset_index(drop=True)
    want = con.sql("""
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-07-01'
          AND o_orderdate < TIMESTAMP '1997-10-01'
          AND NOT EXISTS (SELECT 1 FROM lineitem
                          WHERE l_orderkey = o_orderkey
                            AND l_returnflag = 'R')
        GROUP BY o_orderpriority ORDER BY o_orderpriority
    """).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # semi + anti partition the window: counts add up per priority
    semi = q4_order_priority(SF).to_pandas().set_index("o_orderpriority")
    anti = got.set_index("o_orderpriority")
    tot = con.sql("""
        SELECT o_orderpriority, count(*) AS n FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-07-01'
          AND o_orderdate < TIMESTAMP '1997-10-01'
        GROUP BY 1
    """).df().set_index("o_orderpriority")
    joined = semi["order_count"].add(anti["order_count"], fill_value=0)
    joined = joined.reindex(tot.index, fill_value=0)
    assert (joined == tot["n"]).all()


def test_orders_no_returns_both_plans_identical():
    from granulate_char_ocr_ray.pipelines.relational import orders_no_returns

    bc = orders_no_returns(SF).to_pandas().reset_index(drop=True)
    pj = orders_no_returns(SF, broadcast_threshold=0).to_pandas(
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(bc, pj)


def test_top_orders_per_priority(con):
    from granulate_char_ocr_ray.pipelines.relational import (
        top_orders_per_priority)

    got = top_orders_per_priority(SF).to_pandas().reset_index(drop=True)
    want = con.sql("""
        SELECT o_orderpriority, o_orderkey, o_totalprice, rnk FROM (
          SELECT o_orderpriority, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                   ORDER BY o_totalprice DESC, o_orderkey) AS rnk
          FROM orders) WHERE rnk <= 3
        ORDER BY o_orderpriority, rnk
    """).df()
    assert len(want) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_approx_distinct_users_per_event_type(con):
    from granulate_char_ocr_ray.pipelines.relational import (
        approx_distinct_users_per_event_type)

    got = approx_distinct_users_per_event_type(SF).to_pandas()
    want = con.sql("""
        SELECT event_type, count(DISTINCT user_id) AS n_users
        FROM events GROUP BY event_type ORDER BY event_type
    """).df()
    assert list(got["event_type"]) == list(want["event_type"])
    for est, exact in zip(got["approx_users"], want["n_users"]):
        assert abs(est - exact) <= max(3, 0.03 * exact), (est, exact)


def test_q7_nation_volume(con):
    from granulate_char_ocr_ray.pipelines.relational import q7_nation_volume

    got = q7_nation_volume(SF, nation_a="NATION_12",
                           nation_b="NATION_10").to_pandas(
    ).reset_index(drop=True)
    want = con.sql("""
        SELECT supp_nation, cust_nation, l_year,
               round(sum(volume), 2) AS revenue FROM (
          SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 CAST(year(l_shipdate) AS BIGINT) AS l_year,
                 l_extendedprice * (1 - l_discount) AS volume
          FROM lineitem
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN orders ON o_orderkey = l_orderkey
          JOIN customer ON c_custkey = o_custkey
          JOIN nation n1 ON s_nationkey = n1.n_nationkey
          JOIN nation n2 ON c_nationkey = n2.n_nationkey
          WHERE ((n1.n_name = 'NATION_12' AND n2.n_name = 'NATION_10')
              OR (n1.n_name = 'NATION_10' AND n2.n_name = 'NATION_12'))
            AND l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1998-01-01')
        GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """).df()
    assert len(want) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_q7_both_plans_identical():
    from granulate_char_ocr_ray.pipelines.relational import q7_nation_volume

    bc = q7_nation_volume(SF, nation_a="NATION_12",
                          nation_b="NATION_10").to_pandas(
    ).reset_index(drop=True)
    pj = q7_nation_volume(SF, nation_a="NATION_12", nation_b="NATION_10",
                          broadcast_threshold=0).to_pandas(
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(bc, pj)


Q8_SQL = """
    SELECT o_year,
           round(sum(CASE WHEN nation = 'NATION_19'
                          THEN volume ELSE 0 END) / sum(volume), 6)
               AS mkt_share,
           round(sum(CASE WHEN nation = 'NATION_19'
                          THEN volume ELSE 0 END), 2) AS nation_volume,
           round(sum(volume), 2) AS total_volume
    FROM (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS nation
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'AMERICA'
        AND o_orderdate >= TIMESTAMP '1995-01-01'
        AND o_orderdate < TIMESTAMP '1997-01-01'
        AND p_type = 'ECONOMY')
    GROUP BY o_year ORDER BY o_year
"""


def test_q8_market_share(con):
    from granulate_char_ocr_ray.pipelines.relational import q8_market_share

    got = q8_market_share(SF, nation="NATION_19").to_pandas(
    ).reset_index(drop=True)
    want = con.sql(Q8_SQL).df()
    assert len(want) > 0
    assert (got["mkt_share"] > 0).any()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_q8_both_plans_identical():
    from granulate_char_ocr_ray.pipelines.relational import q8_market_share

    bc = q8_market_share(SF, nation="NATION_19").to_pandas(
    ).reset_index(drop=True)
    pj = q8_market_share(SF, nation="NATION_19",
                         broadcast_threshold=0).to_pandas(
    ).reset_index(drop=True)
    pd.testing.assert_frame_equal(bc, pj)


def test_q13_customer_distribution(con):
    from granulate_char_ocr_ray.pipelines.relational import (
        q13_customer_distribution)

    got = q13_customer_distribution(SF).to_pandas().reset_index(drop=True)
    want = con.sql("""
        SELECT c_count, count(*) AS custdist FROM (
          SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer LEFT OUTER JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
          GROUP BY c_custkey)
        GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """).df()
    assert len(want) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_q15_top_supplier(con):
    from granulate_char_ocr_ray.pipelines.relational import q15_top_supplier

    got = q15_top_supplier(SF).to_pandas().reset_index(drop=True)
    want = con.sql("""
        WITH revenue AS (
          SELECT l_suppkey,
                 sum(l_extendedprice * (1 - l_discount)) AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1996-04-01'
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, round(total_revenue, 2) AS total_revenue
        FROM supplier JOIN revenue ON s_suppkey = l_suppkey
        WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        ORDER BY s_suppkey
    """).df()
    assert len(want) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_q17_small_quantity_revenue(con):
    from granulate_char_ocr_ray.pipelines.relational import (
        q17_small_quantity_revenue)

    got = q17_small_quantity_revenue(SF).to_pandas().reset_index(drop=True)
    want = con.sql("""
        SELECT round(sum(l1.l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lineitem l1 JOIN part ON p_partkey = l1.l_partkey
        WHERE p_brand = 'Brand#1'
          AND l1.l_quantity < (
            SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
            WHERE l2.l_partkey = l1.l_partkey)
    """).df()
    assert got["avg_yearly"][0] > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_q19_disjunctive_revenue(con):
    from granulate_char_ocr_ray.pipelines.relational import (
        q19_disjunctive_revenue)

    got = q19_disjunctive_revenue(SF).to_pandas().reset_index(drop=True)
    want = con.sql("""
        SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
               AND l_quantity BETWEEN 20 AND 30)
    """).df()
    assert got["revenue"][0] > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_q22_balance_opportunity(con):
    from granulate_char_ocr_ray.pipelines.relational import (
        q22_balance_opportunity)

    got = q22_balance_opportunity(SF).to_pandas().reset_index(drop=True)
    want = con.sql("""
        SELECT c_nationkey AS cntrycode, count(*) AS numcust,
               round(sum(c_acctbal), 2) AS totacctbal
        FROM customer
        WHERE c_nationkey IN (1, 5, 9, 13, 17, 21)
          AND c_acctbal > (
            SELECT avg(c_acctbal) FROM customer
            WHERE c_acctbal > 0.0 AND c_nationkey IN (1, 5, 9, 13, 17, 21))
          AND NOT EXISTS (
            SELECT 1 FROM orders WHERE o_custkey = c_custkey
              AND o_orderpriority = '1-URGENT')
        GROUP BY cntrycode ORDER BY cntrycode
    """).df()
    assert len(want) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_quantity_price_stats(con):
    from granulate_char_ocr_ray.pipelines.relational import (
        quantity_price_stats)

    got = quantity_price_stats(SF).to_pandas().reset_index(drop=True)
    want = con.sql("""
        SELECT count(*) AS n_items,
               round(corr(l_quantity, l_extendedprice), 6)
                   AS corr_qty_price,
               round(covar_samp(l_quantity, l_extendedprice), 2)
                   AS covar_qty_price,
               round(stddev_samp(l_quantity), 4) AS stddev_qty,
               round(stddev_samp(l_extendedprice), 4) AS stddev_price
        FROM lineitem
    """).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_quantity_stats_by_flag(con):
    from granulate_char_ocr_ray.pipelines.relational import (
        quantity_stats_by_flag)

    got = quantity_stats_by_flag(SF).to_pandas().reset_index(drop=True)
    want = con.sql("""
        SELECT l_returnflag, count(*) AS n_items,
               round(avg(l_quantity), 4) AS avg_qty,
               round(stddev_samp(l_quantity), 4) AS stddev_qty
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_daily_order_ship_counts(con):
    from granulate_char_ocr_ray.pipelines.relational import (
        daily_order_ship_counts)

    got = daily_order_ship_counts(SF).to_pandas().reset_index(drop=True)
    want = con.sql("""
        SELECT COALESCE(o.d, l.d) AS day,
               COALESCE(n_orders, 0) AS n_orders,
               COALESCE(n_ships, 0) AS n_ships
        FROM (SELECT strftime(o_orderdate, '%Y-%m-%d') AS d,
                     count(*) AS n_orders FROM orders GROUP BY 1) o
        FULL OUTER JOIN
             (SELECT strftime(l_shipdate, '%Y-%m-%d') AS d,
                     count(*) AS n_ships FROM lineitem GROUP BY 1) l
        ON o.d = l.d ORDER BY day
    """).df()
    # genuine outer rows must exist on BOTH sides at sf0.001
    assert (want["n_orders"] == 0).any() and (want["n_ships"] == 0).any()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_stratified_sample_docs(con):
    from granulate_char_ocr_ray.pipelines.relational import (
        stratified_sample_docs)

    got = stratified_sample_docs(SF, k=3).to_pandas().reset_index(drop=True)
    want = con.sql("""
        SELECT lang, doc_id, rk FROM (
          SELECT lang, doc_id, ROW_NUMBER() OVER (
            PARTITION BY lang
            ORDER BY (doc_id * 2654435761) % 4294967296, doc_id) AS rk
          FROM documents)
        WHERE rk <= 3 ORDER BY lang, rk
    """).df()
    assert len(want) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_unigram_logprob_scores(con):
    from granulate_char_ocr_ray.pipelines.analysis import (
        unigram_logprob_scores)

    got = unigram_logprob_scores(SF).to_pandas().reset_index(drop=True)
    want = con.sql("""
        WITH tok AS (
          SELECT doc_id,
                 unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
          FROM documents WHERE trim(text) <> ''),
        freq AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
        tot AS (SELECT sum(c) AS s FROM freq)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
               round(avg(ln(c / s)), 6) AS logprob
        FROM tok JOIN freq USING (w) CROSS JOIN tot
        GROUP BY doc_id ORDER BY doc_id
    """).df()
    assert len(want) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_weighted_sample_docs(con):
    from granulate_char_ocr_ray.pipelines.relational import (
        weighted_sample_docs)

    got = weighted_sample_docs(SF, k=10).to_pandas().reset_index(drop=True)
    want = con.sql("""
        SELECT doc_id, round(priority, 12) AS priority FROM (
          SELECT doc_id, priority, ROW_NUMBER() OVER (
                   ORDER BY priority DESC, doc_id) AS rk
          FROM (
            SELECT doc_id,
                   pow(((doc_id * 2654435761) % 4294967296 + 1.0)
                         / 4294967296.0,
                       1.0 / greatest(n_chars, 1)) AS priority
            FROM documents))
        WHERE rk <= 10 ORDER BY priority DESC, doc_id
    """).df()
    assert len(want) == 10
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_lineitem_audit(con):
    from granulate_char_ocr_ray.pipelines.relational import lineitem_audit

    got = lineitem_audit(SF).to_pandas().reset_index(drop=True)
    want = con.sql("""
        SELECT col, n_rows, n_nulls, round(min_val, 4) AS min_val,
               round(max_val, 4) AS max_val FROM (
          SELECT 'l_discount' AS col, count(*) AS n_rows,
                 sum(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END)
                     AS n_nulls,
                 min(l_discount) AS min_val, max(l_discount) AS max_val
          FROM lineitem
          UNION ALL
          SELECT 'l_extendedprice', count(*),
                 sum(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END),
                 min(l_extendedprice), max(l_extendedprice) FROM lineitem
          UNION ALL
          SELECT 'l_quantity', count(*),
                 sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END),
                 min(l_quantity), max(l_quantity) FROM lineitem
          UNION ALL
          SELECT 'l_tax', count(*),
                 sum(CASE WHEN l_tax IS NULL THEN 1 ELSE 0 END),
                 min(l_tax), max(l_tax) FROM lineitem)
        ORDER BY col
    """).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_fully_returned_orders(con):
    from granulate_char_ocr_ray.pipelines.relational import (
        fully_returned_orders)

    got = fully_returned_orders(SF).to_pandas().reset_index(drop=True)
    want = con.sql("""
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE o_orderkey IN (
          SELECT l_orderkey FROM lineitem
          GROUP BY l_orderkey
          HAVING count(*) = sum(CASE WHEN l_returnflag = 'R'
                                     THEN 1 ELSE 0 END))
        GROUP BY o_orderpriority ORDER BY o_orderpriority
    """).df()
    assert len(want) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_daily_revenue_delta(con):
    from granulate_char_ocr_ray.pipelines.relational import (
        daily_revenue_delta)

    got = daily_revenue_delta(SF).to_pandas().reset_index(drop=True)
    want = con.sql("""
        WITH per_day AS (
          SELECT strftime(l_shipdate, '%Y-%m-%d') AS day,
                 round(sum(round(l_extendedprice * (1 - l_discount)
                                 * 10000)) / 10000.0, 2) AS revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1997-01-01'
            AND l_shipdate < TIMESTAMP '1998-01-01'
          GROUP BY 1)
        SELECT day, revenue,
               round(revenue - lag(revenue, 1, revenue)
                       OVER (ORDER BY day), 2) AS delta
        FROM per_day ORDER BY day
    """).df()
    assert len(want) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_approx_quantity_deciles_by_flag(con):
    from granulate_char_ocr_ray.pipelines.relational import (
        approx_quantity_deciles_by_flag)

    got = approx_quantity_deciles_by_flag(SF).to_pandas()
    qs = [round(0.1 * i, 1) for i in range(1, 10)]
    exact = con.sql(f"""
        SELECT l_returnflag,
               unnest({qs}) AS q,
               unnest(quantile_disc(l_quantity, {qs})) AS value
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag, q
    """).df()
    m = got.merge(exact, on=["l_returnflag", "q"],
                  suffixes=("_got", "_exact"))
    assert len(m) == len(exact) == 27
    # per-group rank error bound: value within +-2 quantity units of
    # exact decile (quantity is integral 1..50; KLL rank error <= 1%)
    assert (abs(m["value_got"] - m["value_exact"]) <= 2).all()


def test_tfidf_top_terms(con):
    from granulate_char_ocr_ray.pipelines.analysis import tfidf_top_terms

    got = tfidf_top_terms(SF).to_pandas().reset_index(drop=True)
    want = con.sql("""
        WITH tok AS (
          SELECT doc_id,
                 unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
          FROM documents WHERE trim(text) <> ''),
        tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
               FROM tok GROUP BY 1, 2),
        df AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
        nd AS (SELECT count(*) AS n FROM documents WHERE trim(text) <> ''),
        scored AS (
          SELECT tf.doc_id, tf.token, tf.tf,
                 round(tf.tf * ln(CAST(nd.n AS DOUBLE) / df.df), 4) AS tfidf
          FROM tf JOIN df USING (token) CROSS JOIN nd)
        SELECT doc_id, token, tf, tfidf FROM (
          SELECT *, row_number() OVER (PARTITION BY doc_id
                   ORDER BY tfidf DESC, token ASC) AS rn FROM scored)
        WHERE rn = 1 ORDER BY doc_id
    """).df()
    assert len(want) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_token_freq_of_freq(con):
    from granulate_char_ocr_ray.pipelines.analysis import token_freq_of_freq

    got = token_freq_of_freq(SF).to_pandas().reset_index(drop=True)
    want = con.sql("""
        WITH tok AS (
          SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS token
          FROM documents WHERE trim(text) <> ''),
        counts AS (SELECT token, CAST(count(*) AS BIGINT) AS freq
                   FROM tok GROUP BY token)
        SELECT freq, CAST(count(*) AS BIGINT) AS n_tokens
        FROM counts GROUP BY freq ORDER BY freq
    """).df()
    assert len(want) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_q12_both_plans_identical():
    from granulate_char_ocr_ray.pipelines.relational import q12_ship_lag

    bc = q12_ship_lag(SF).to_pandas().reset_index(drop=True)
    pj = q12_ship_lag(SF, broadcast_threshold=0).to_pandas(
        ).reset_index(drop=True)
    pd.testing.assert_frame_equal(bc, pj, check_dtype=False)


def test_q12_counts_partition_lineitem(con):
    from granulate_char_ocr_ray.pipelines.relational import q12_ship_lag

    got = q12_ship_lag(SF).to_pandas()
    n_items = con.sql("SELECT count(*) FROM lineitem").df().iloc[0, 0]
    assert int((got["late_count"] + got["ontime_count"]).sum()) == n_items


def test_q21_brute_force(con):
    from granulate_char_ocr_ray.pipelines.relational import (
        q21_waiting_suppliers)

    got = q21_waiting_suppliers(SF).to_pandas().reset_index(drop=True)
    li = con.sql(
        "SELECT l_orderkey, l_suppkey, l_returnflag FROM lineitem").df()
    li["has_ret"] = (li["l_returnflag"] == "R").astype(int)
    pairs = li.groupby(["l_orderkey", "l_suppkey"], as_index=False).agg(
        has_ret=("has_ret", "max"))
    per = pairs.groupby("l_orderkey").agg(
        n_supp=("l_suppkey", "size"), n_ret=("has_ret", "sum"))
    lone = pairs[pairs["has_ret"] == 1].set_index("l_orderkey")["l_suppkey"]
    ok = per[(per["n_supp"] >= 2) & (per["n_ret"] == 1)].index
    counts = lone.loc[lone.index.isin(ok)].value_counts()
    supp = con.sql("SELECT s_suppkey, s_name FROM supplier").df()
    want = (supp.assign(numwait=supp["s_suppkey"].map(counts))
            .dropna(subset=["numwait"]))
    want = want.sort_values(["numwait", "s_name"],
                            ascending=[False, True])
    got_map = dict(zip(got["s_name"], got["numwait"]))
    want_map = dict(zip(want["s_name"], want["numwait"].astype(int)))
    assert got_map == want_map


def test_q2_winner_is_min_acctbal(con):
    from granulate_char_ocr_ray.pipelines.relational import (
        q2_min_supplier_per_part)

    got = q2_min_supplier_per_part(SF).to_pandas()
    pairs = con.sql(
        "SELECT DISTINCT l_partkey, l_suppkey FROM lineitem").df()
    supp = con.sql(
        "SELECT s_suppkey, s_acctbal FROM supplier").df()
    m = pairs.merge(supp, left_on="l_suppkey", right_on="s_suppkey")
    best = (m.sort_values(["s_acctbal", "l_suppkey"])
            .drop_duplicates("l_partkey").set_index("l_partkey"))
    for _, row in got.iterrows():
        assert round(best.loc[row["p_partkey"], "s_acctbal"], 2) == \
            row["s_acctbal"]


def test_bm25_search_brute_force(con):
    import numpy as np
    from granulate_char_ocr_ray.pipelines.analysis import bm25_search

    got = bm25_search(SF, k=10).to_pandas().reset_index(drop=True)
    docs = con.sql(
        "SELECT doc_id, text FROM documents WHERE trim(text) <> ''").df()
    toks = [t.split() for t in docs["text"].str.strip()]
    dl = np.array([len(t) for t in toks], dtype=float)
    n, avgdl = float(len(toks)), dl.sum() / len(toks)
    k1, b = 1.2, 0.75
    score = np.zeros(len(toks))
    for term in ("spark", "hash", "window"):
        tf = np.array([t.count(term) for t in toks], dtype=float)
        df_t = float((tf > 0).sum())
        idf = np.log((n - df_t + 0.5) / (df_t + 0.5) + 1.0)
        score = score + idf * tf * (k1 + 1.0) / (tf + k1 * (1 - b + b * dl / avgdl))
    want = (pd.DataFrame({"doc_id": docs["doc_id"],
                          "score": np.round(score, 4)})
            .sort_values(["score", "doc_id"], ascending=[False, True])
            .head(10).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got.astype({"doc_id": "int64"}), want.astype({"doc_id": "int64"}),
        check_dtype=False, atol=1e-4)


def test_funnel_counts_brute_force(con):
    from granulate_char_ocr_ray.pipelines.events import funnel_counts

    got = funnel_counts(SF).to_pandas().iloc[0]
    ev = con.sql("SELECT user_id, event_type, ts FROM events").df()
    n1 = n2 = n3 = 0
    for _, g in ev.groupby("user_id"):
        v = g.loc[g["event_type"] == "view", "ts"]
        if v.empty:
            continue
        n1 += 1
        c = g.loc[(g["event_type"] == "click") & (g["ts"] > v.min()), "ts"]
        if c.empty:
            continue
        n2 += 1
        p = g.loc[(g["event_type"] == "purchase") & (g["ts"] > c.min()),
                  "ts"]
        if not p.empty:
            n3 += 1
    assert (got["n_stage1"], got["n_stage2"], got["n_stage3"]) == \
        (n1, n2, n3)
    assert n1 >= n2 >= n3


def test_substring_dups_brute_force(con):
    from granulate_char_ocr_ray.pipelines.dedup import substring_dups

    k = 48
    got = substring_dups(SF, k=k).to_pandas()["doc_id"].tolist()
    docs = con.sql(
        "SELECT doc_id, text FROM documents ORDER BY doc_id").df()
    seen: dict[str, int] = {}
    dups = set()
    for did, text in zip(docs["doc_id"], docs["text"]):
        grams = {text[i:i + k] for i in range(max(len(text) - k + 1, 0))}
        for g in grams:
            m = seen.get(g)
            if m is None:
                seen[g] = did
            elif m < did:
                dups.add(did)
    assert got == sorted(dups)


def test_bigram_pmi_positive_for_injected_collocation():
    from granulate_char_ocr_ray.pipelines.analysis import bigram_pmi

    got = bigram_pmi(SF, min_count=2, k=50).to_pandas()
    # scores sorted desc, count filter respected
    assert (got["c12"] >= 2).all()
    s = got["pmi"].to_numpy()
    assert (s[:-1] >= s[1:] - 1e-9).all()


def test_co_purchase_pairs_brute_force(con):
    from granulate_char_ocr_ray.pipelines.relational import (
        co_purchase_pairs)
    from itertools import combinations
    from collections import Counter

    got = co_purchase_pairs(SF, min_count=2).to_pandas()
    li = con.sql(
        "SELECT DISTINCT l_orderkey, l_partkey FROM lineitem").df()
    cnt = Counter()
    for _, g in li.groupby("l_orderkey"):
        for a, b in combinations(sorted(g["l_partkey"]), 2):
            cnt[(a, b)] += 1
    want = {k: v for k, v in cnt.items() if v >= 2}
    got_map = {(r.p1, r.p2): r.n_orders for r in got.itertuples()}
    assert got_map == want


def test_order_price_cume_dist_bounds(con):
    from granulate_char_ocr_ray.pipelines.relational import (
        order_price_cume_dist)

    got = order_price_cume_dist(SF).to_pandas()
    n = con.sql("SELECT count(*) FROM orders").df().iloc[0, 0]
    assert len(got) == n
    assert got["cume"].min() >= 1.0 / n - 1e-9
    assert abs(got["cume"].max() - 1.0) < 1e-9
    # the most expensive order has cume exactly 1
    top = con.sql("SELECT o_orderkey FROM orders ORDER BY o_totalprice"
                  " DESC LIMIT 1").df().iloc[0, 0]
    assert abs(got.set_index("o_orderkey").loc[top, "cume"] - 1.0) < 1e-9


def test_retention_cohorts_brute_force(con):
    from granulate_char_ocr_ray.pipelines.events import retention_cohorts

    got = retention_cohorts(SF).to_pandas()
    ev = con.sql("SELECT user_id, ts FROM events").df()
    wk = (ev["ts"].to_numpy(dtype="datetime64[ns]").view("int64")
          // (604800 * 10**9))
    act = pd.DataFrame({"u": ev["user_id"], "wk": wk}).drop_duplicates()
    fst = act.groupby("u")["wk"].min()
    m = act.assign(cw=act["u"].map(fst))
    want = (m.assign(off=m["wk"] - m["cw"])
            .groupby(["cw", "off"]).size().reset_index(name="n"))
    got_map = {(r.cohort_week, r.week_offset): r.n_users
               for r in got.itertuples()}
    want_map = {(r.cw, r.off): r.n for r in want.itertuples()}
    assert got_map == want_map
    # offset-0 count equals the cohort size
    for (cw, off), n in want_map.items():
        if off == 0:
            assert n == (fst == cw).sum()


def test_rolling_active_users_brute_force(con):
    from granulate_char_ocr_ray.pipelines.events import (
        rolling_active_users)

    got = rolling_active_users(SF, window_days=7).to_pandas()
    ev = con.sql("SELECT user_id, ts FROM events").df()
    d = (ev["ts"].to_numpy(dtype="datetime64[ns]").view("int64")
         // (86400 * 10**9))
    act = pd.DataFrame({"u": ev["user_id"], "d": d}).drop_duplicates()
    want = {}
    for day in sorted(act["d"].unique()):
        want[day] = act.loc[
            (act["d"] >= day - 6) & (act["d"] <= day), "u"].nunique()
    got_map = dict(zip(got["day"], got["n_users"]))
    assert got_map == want


def test_vocab_coverage_monotone(con):
    from granulate_char_ocr_ray.pipelines.analysis import vocab_coverage

    got = vocab_coverage(SF).to_pandas()
    assert list(got["pct"]) == [50, 90, 99]
    assert got["n_token_types"].is_monotonic_increasing
    total = int(con.sql(
        "SELECT count(*) FROM (SELECT unnest(regexp_split_to_array("
        "trim(text), '\\s+')) FROM documents WHERE trim(text) <> '')"
    ).df().iloc[0, 0])
    for r in got.itertuples():
        assert r.covered_tokens >= -(-total * r.pct // 100)


def test_filter_lm_quality_drops_bottom_decile(con):
    from granulate_char_ocr_ray.pipelines.analysis import (
        filter_lm_quality, unigram_logprob_scores)

    all_scores = unigram_logprob_scores(SF).to_pandas()
    kept = filter_lm_quality(SF, drop_below=0.1).to_pandas()
    n = len(all_scores)
    assert len(kept) <= n
    # at least (1 - 0.1) of docs survive; ties at the threshold kept
    assert len(kept) >= int(n * 0.9)
    # every dropped doc scores strictly below every kept doc's minimum
    dropped = set(all_scores["doc_id"]) - set(kept["doc_id"])
    if dropped:
        max_dropped = all_scores.set_index("doc_id").loc[
            sorted(dropped), "logprob"].max()
        assert max_dropped < kept["logprob"].min()


def _brute_tiers(con) -> "pd.DataFrame":
    """Brute-force CCNet tiers: per-language descending cume_dist over
    the (already parity-green) unigram logprob scores."""
    from granulate_char_ocr_ray.pipelines.analysis import (
        unigram_logprob_scores)

    sc = unigram_logprob_scores(SF).to_pandas()
    langs = con.sql("SELECT doc_id, lang FROM documents").df()
    sc = sc.merge(langs, on="doc_id")
    out = []
    for _, g in sc.groupby("lang"):
        g = g.sort_values("logprob", ascending=False).copy()
        n = len(g)
        cd = g["logprob"].rank(method="max", ascending=False) / n
        g["tier"] = [
            "head" if c <= 1.0 / 3 else
            ("middle" if c <= 2.0 / 3 else "tail") for c in cd]
        out.append(g)
    return pd.concat(out).sort_values("doc_id").reset_index(drop=True)


def test_lm_quality_tiers_brute_force(con):
    from granulate_char_ocr_ray.pipelines.analysis import lm_quality_tiers

    got = lm_quality_tiers(SF).to_pandas()
    want = _brute_tiers(con)
    assert list(got.columns) == [
        "doc_id", "lang", "n_tokens", "logprob", "tier"]
    merged = got.merge(want, on="doc_id", suffixes=("", "_w"))
    assert len(merged) == len(want) == len(got)
    assert (merged["tier"] == merged["tier_w"]).all()
    assert (merged["lang"] == merged["lang_w"]).all()
    # each language's tiers are within one doc of equal thirds when
    # scores are distinct; with ties head/middle never exceed a third
    for _, g in got.groupby("lang"):
        n = len(g)
        assert (g["tier"] == "head").sum() <= n / 3 + 1e-9
        assert ((g["tier"] == "head") | (g["tier"] == "middle")
                ).sum() <= 2 * n / 3 + 1e-9


def test_tier_mix_weights_matches_tier_table(con):
    from granulate_char_ocr_ray.pipelines.analysis import tier_mix_weights

    got = tier_mix_weights(SF).to_pandas()
    want = (_brute_tiers(con)
            .groupby(["lang", "tier"], as_index=False)
            .agg(n_docs=("doc_id", "size"), n_tokens=("n_tokens", "sum"))
            .sort_values(["lang", "tier"]).reset_index(drop=True))
    got = got.sort_values(["lang", "tier"]).reset_index(drop=True)
    assert got.astype({"n_docs": "int64", "n_tokens": "int64"}).equals(
        want.astype({"n_docs": "int64", "n_tokens": "int64"}))


def test_kwic_snippets_brute_force(con):
    from granulate_char_ocr_ray.pipelines.analysis import kwic_snippets

    got = kwic_snippets(SF, term="spark", window=3).to_pandas()
    docs = con.sql(
        "SELECT doc_id, text FROM documents WHERE trim(text) <> ''"
    ).df()
    want = []
    for did, text in zip(docs["doc_id"], docs["text"]):
        toks = text.strip().split()
        for i, t in enumerate(toks):
            if t == "spark":
                lo, hi = max(i - 3, 0), min(i + 4, len(toks))
                want.append((did, i + 1, " ".join(toks[lo:hi])))
    want.sort()
    assert list(map(tuple, got[["doc_id", "pos", "snippet"]]
                    .itertuples(index=False))) == want


def test_lang_vocab_overlap_brute_force(con):
    from granulate_char_ocr_ray.pipelines.analysis import (
        lang_vocab_overlap)

    got = lang_vocab_overlap(SF).to_pandas()
    docs = con.sql("SELECT lang, text FROM documents"
                   " WHERE trim(text) <> ''").df()
    vocab = {}
    for lang, text in zip(docs["lang"], docs["text"]):
        vocab.setdefault(lang, set()).update(text.strip().split())
    langs = sorted(vocab)
    want = {}
    for i, a in enumerate(langs):
        for b in langs[i + 1:]:
            inter = len(vocab[a] & vocab[b])
            if inter:
                want[(a, b)] = (inter, round(
                    inter / len(vocab[a] | vocab[b]), 6))
    got_map = {(r.lang_a, r.lang_b): (r.n_shared, r.jaccard)
               for r in got.itertuples()}
    assert set(got_map) == set(want)
    for k in want:
        assert got_map[k][0] == want[k][0]
        assert abs(got_map[k][1] - want[k][1]) < 1e-6


def test_next_token_stats_brute_force(con):
    from collections import Counter

    from granulate_char_ocr_ray.pipelines.analysis import next_token_stats

    got = next_token_stats(SF, min_count=2).to_pandas()
    docs = con.sql(
        "SELECT text FROM documents WHERE trim(text) <> ''").df()
    bc, tot = Counter(), Counter()
    for text in docs["text"]:
        toks = text.strip().split()
        for a, b in zip(toks[:-1], toks[1:]):
            bc[(a, b)] += 1
            tot[a] += 1
    want = {}
    for t in tot:
        if tot[t] >= 2:
            best = min(((-n, nxt) for (a, nxt), n in bc.items()
                        if a == t))
            want[t] = (best[1], -best[0], round(-best[0] / tot[t], 6))
    got_map = {r.token: (r.next_token, r.n, r.p_next)
               for r in got.itertuples()}
    assert set(got_map) == set(want)
    for t in want:
        assert got_map[t][0] == want[t][0] and got_map[t][1] == want[t][1]
        assert abs(got_map[t][2] - want[t][2]) < 1e-6


def test_session_conversion_consistent_with_user_sessions(con):
    from granulate_char_ocr_ray.pipelines.events import (
        session_conversion, user_sessions)

    got = session_conversion(SF).to_pandas().iloc[0]
    per_user = user_sessions(SF).to_pandas()
    assert got["n_sessions"] == per_user["n_sessions"].sum()
    assert 0 <= got["n_converted"] <= got["n_sessions"]
    assert abs(got["conversion_pct"] - round(
        100.0 * got["n_converted"] / got["n_sessions"], 4)) < 1e-9


def test_qty_price_regression_matches_polyfit(con):
    import numpy as np

    from granulate_char_ocr_ray.pipelines.relational import (
        qty_price_regression_by_flag)

    got = qty_price_regression_by_flag(SF).to_pandas()
    li = con.sql("SELECT l_returnflag, l_quantity, l_extendedprice"
                 " FROM lineitem").df()
    for r in got.itertuples():
        g = li[li["l_returnflag"] == r.l_returnflag]
        slope, intercept = np.polyfit(g["l_quantity"],
                                      g["l_extendedprice"], 1)
        assert abs(r.slope - slope) < 1e-4
        assert abs(r.intercept - intercept) < 1e-2
        assert r.n_items == len(g)


def test_flag_status_chi2_matches_scipy_formula(con):
    import numpy as np

    from granulate_char_ocr_ray.pipelines.relational import (
        flag_status_chi2)

    got = flag_status_chi2(SF).to_pandas().iloc[0]
    ct = con.sql(
        "SELECT l_returnflag, l_linestatus, count(*) AS o FROM lineitem"
        " GROUP BY 1, 2").df().pivot(index="l_returnflag",
                                     columns="l_linestatus",
                                     values="o").fillna(0).to_numpy(
        dtype=float)
    n = ct.sum()
    e = np.outer(ct.sum(axis=1), ct.sum(axis=0)) / n
    mask = e > 0
    chi2 = (((ct - e) ** 2)[mask] / e[mask]).sum()
    assert abs(got["chi2"] - round(chi2, 4)) < 1e-3
    assert got["dof"] == (ct.shape[0] - 1) * (ct.shape[1] - 1)
    assert got["n_items"] == int(n)


def test_doc_len_zscore_degenerate_groups_dropped(tmp_path):
    """ADVICE r02: a language whose docs all share one length (sd == 0)
    or with a single doc (n == 1) must emit NO rows — matching the SQL
    oracle, where stddev_samp yields NULL (n==1) or the division by
    sd==0 yields NULL and the WHERE drops the row."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from granulate_char_ocr_ray.pipelines.analysis import (
        doc_len_zscore_outliers)

    t = pa.table({
        "doc_id": [f"d{i:02d}" for i in range(10)],
        "lang": ["solo"] + ["const"] * 3 + ["vary"] * 6,
        "n_chars": np.array([50, 7, 7, 7, 10, 11, 10, 11, 10, 500],
                            dtype=np.int64),
    })
    pq.write_table(t, tmp_path / "documents.parquet")

    got = doc_len_zscore_outliers(str(tmp_path)).to_pandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet'")
    want = con.sql("""
        WITH s AS (SELECT lang, avg(n_chars) AS mu,
                          stddev_samp(n_chars) AS sd
                   FROM documents GROUP BY 1)
        SELECT d.doc_id, d.lang, d.n_chars,
               round((d.n_chars - s.mu) / s.sd, 4) AS z
        FROM documents d JOIN s USING (lang)
        WHERE abs((d.n_chars - s.mu) / s.sd) >= 2.0
        ORDER BY d.doc_id
    """).df()
    # the one genuine outlier survives; solo/const langs emit nothing
    assert set(got["lang"]) == {"vary"}
    pd.testing.assert_frame_equal(_canon(got), _canon(want),
                                  check_dtype=False)


def test_exact_pair_joins_refuse_above_row_bound():
    """VERDICT r02 #4: the exact O(n^2) pair joins must refuse to run
    above the configurable row bound and point at the approximate
    paths."""
    from granulate_char_ocr_ray.pipelines.similarity import (
        embedding_cosine_dups, knn_join)

    with pytest.raises(ValueError, match="lsh_cosine_topk"):
        embedding_cosine_dups(SF, max_rows=10)
    with pytest.raises(ValueError, match="max_rows"):
        knn_join(SF, max_rows=10)


def test_lexicon_score_matches_bruteforce():
    import pyarrow.dataset as pads
    from granulate_char_ocr_ray.functions.numeric import round_half_up
    from granulate_char_ocr_ray.pipelines.analysis import (
        SCORING_LEXICON, lexicon_score)

    got = lexicon_score(SF).to_pandas()
    docs = pads.dataset(f"{SF}/documents.parquet").to_table(
        columns=["doc_id", "text"]).to_pandas()
    lex = dict(SCORING_LEXICON)
    want = {}
    for r in docs.itertuples():
        toks = r.text.strip().split()
        if toks:
            want[r.doc_id] = float(round_half_up(
                [sum(lex.get(t, 0) for t in toks) / len(toks)], 4)[0])
    assert got["doc_id"].tolist() == sorted(want)
    for r in got.itertuples():
        assert abs(want[r.doc_id] - r.lex_score) < 1e-9


def test_train_quality_classifier_deterministic_and_learns():
    import numpy as np
    import pyarrow.dataset as pads
    from granulate_char_ocr_ray.functions.linear import logreg_fit_quantized
    from granulate_char_ocr_ray.pipelines.analysis import (
        _quality_clf_xy, train_quality_classifier)

    sf = "/root/testdata/sf0.001"
    got = train_quality_classifier(sf).to_pandas().set_index("feature")

    # brute force: the shared quantized kernel over the whole corpus at
    # once must reproduce the engine's weights exactly (quantized int64
    # partials are partition-independent by construction)
    t = pads.dataset(f"{sf}/documents.parquet").to_table(columns=["text"])
    X, y = _quality_clf_xy(t.column("text"))
    mu, w = logreg_fit_quantized(X, y, iters=40, lr=4.0)
    from granulate_char_ocr_ray.functions.numeric import round_half_up
    want = round_half_up(np.concatenate([mu, w]), 6)
    have = got["value"].to_numpy()[:len(want)]
    assert np.array_equal(have, want)

    # the distilled model must beat the majority class by a wide margin
    base = max(y.mean(), 1 - y.mean())
    assert got.loc["train_acc", "value"] >= base + 0.2

    # distributed fold path emits bit-identical output to the local path
    dist = train_quality_classifier(sf, local_threshold=0).to_pandas()
    assert np.array_equal(dist["value"].to_numpy(),
                          got["value"].to_numpy())


def test_price_winsorized_mean_matches_bruteforce():
    import numpy as np
    import pyarrow.dataset as pads
    from granulate_char_ocr_ray.pipelines.relational import (
        price_winsorized_mean)

    v = pads.dataset("/root/testdata/sf0.001/orders.parquet").to_table(
        columns=["o_totalprice"]).column("o_totalprice").to_numpy()
    lo, hi = np.quantile(v, [0.05, 0.95], method="linear")
    want = np.clip(v, lo, hi).mean()
    got = price_winsorized_mean("/root/testdata/sf0.001").to_pandas()
    assert got["n"].iloc[0] == len(v)
    assert abs(got["lo_cut"].iloc[0] - lo) < 1e-3
    assert abs(got["hi_cut"].iloc[0] - hi) < 1e-3
    assert abs(got["winsorized_mean"].iloc[0] - want) < 1e-3


def test_source_kl_divergence_matches_bruteforce():
    import numpy as np
    import pandas as pd
    import pyarrow.dataset as pads
    from granulate_char_ocr_ray.pipelines.analysis import (
        source_kl_divergence)

    df = pads.dataset("/root/testdata/sf0.001/documents.parquet").to_table(
        columns=["source", "text"]).to_pandas()
    rows = []
    for src, text in zip(df["source"], df["text"]):
        for tok in text.split():
            rows.append((src, tok))
    st = pd.DataFrame(rows, columns=["source", "tok"]).groupby(
        ["source", "tok"], as_index=False).size()
    ct = st.groupby("tok")["size"].sum()
    n = st["size"].sum()
    got = source_kl_divergence("/root/testdata/sf0.001").to_pandas()
    for row in got.itertuples():
        g = st[st["source"] == row.source]
        p = g["size"].to_numpy() / g["size"].sum()
        q = ct.loc[g["tok"]].to_numpy() / n
        want = float((p * np.log(p / q)).sum())
        assert abs(row.kl_nats - want) < 1e-5, row.source
        assert row.n_tokens == g["size"].sum()
    assert (got["kl_nats"] > 0).all()


def test_source_gram_coverage_matches_bruteforce():
    import numpy as np
    import pyarrow.dataset as pads
    from granulate_char_ocr_ray.pipelines.analysis import (
        source_gram_coverage)

    df = pads.dataset("/root/testdata/sf0.001/documents.parquet").to_table(
        columns=["source", "text"]).to_pandas()
    first = {}
    for src in sorted(df["source"].unique()):
        for text in df.loc[df["source"] == src, "text"]:
            for i in range(len(text) - 2):
                first.setdefault(text[i:i + 3], src)
    want = {}
    for src in first.values():
        want[src] = want.get(src, 0) + 1
    got = source_gram_coverage("/root/testdata/sf0.001").to_pandas()
    assert dict(zip(got["source"], got["n_new_grams"])) == want
    assert abs(got["cum_coverage"].iloc[-1] - 1.0) < 1e-9
    assert (np.diff(got["cum_coverage"]) > 0).all()


def test_rerank_search_matches_bruteforce():
    import numpy as np
    import pyarrow.dataset as pads
    from granulate_char_ocr_ray.pipelines.analysis import (
        bm25_search, rerank_search)

    sf = "/root/testdata/sf0.001"
    terms = ("spark", "hash", "window")
    cand = bm25_search(sf, terms=terms, k=50).to_pandas()
    prior = dict(zip(cand["doc_id"], cand["score"]))
    docs = pads.dataset(f"{sf}/documents.parquet").to_table(
        columns=["doc_id", "text"]).to_pandas()
    docs = docs[docs["doc_id"].isin(prior)]
    rows = []
    for row in docs.itertuples():
        toks = row.text.split()
        tf = sum(t in terms for t in toks)
        adj = sum(a in terms and b in terms
                  for a, b in zip(toks, toks[1:]))
        rows.append((row.doc_id, round(tf + 2 * adj
                                       + 0.1 * prior[row.doc_id], 4)))
    rows.sort(key=lambda r: (-r[1], r[0]))
    got = rerank_search(sf, terms=terms, k_retrieve=50, k=10).to_pandas()
    assert list(zip(got["doc_id"], got["rerank_score"])) == rows[:10]
    # reranker must actually reorder vs the retrieval prior
    bm_order = sorted(got["doc_id"], key=lambda d: -prior[d])
    assert list(got["doc_id"]) != bm_order or len(got) <= 1


def test_inter_event_gap_stats_matches_bruteforce():
    import numpy as np
    import pyarrow.dataset as pads
    from granulate_char_ocr_ray.pipelines.events import (
        inter_event_gap_stats)

    sf = "/root/testdata/sf0.001"
    df = pads.dataset(f"{sf}/events.parquet").to_table(
        columns=["user_id", "ts", "event_id"]).to_pandas()
    df = df.sort_values(["user_id", "ts", "event_id"])
    us = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
    u = df["user_id"].to_numpy()
    gaps = (us[1:] - us[:-1]) // 1_000_000
    gaps = np.sort(gaps[u[1:] == u[:-1]])
    got = inter_event_gap_stats(sf).to_pandas()
    n = len(gaps)
    assert got["n_gaps"].iloc[0] == n
    assert got["median_gap_s"].iloc[0] == gaps[
        int(np.ceil(0.5 * n)) - 1]
    assert got["p95_gap_s"].iloc[0] == gaps[int(np.ceil(0.95 * n)) - 1]


def test_filter_attrition_report_chain_consistency():
    import pandas as pd

    from granulate_char_ocr_ray.pipelines.analysis import (
        filter_attrition_report)

    docs_df = pd.read_parquet(f"{SF}/documents.parquet",
                              columns=["doc_id", "text"])
    got = filter_attrition_report(SF)
    assert list(got["rule"]) == ["min_chars", "word_bounds",
                                 "type_token_ratio", "dup_windows"]
    # the funnel chains: each stage's n_out is the next stage's n_in,
    # and removed + out == in at every stage
    assert (got["n_in"] - got["n_removed"] == got["n_out"]).all()
    assert list(got["n_out"][:-1]) == list(got["n_in"][1:])
    assert got["n_in"].iloc[0] == len(docs_df)
    # rules 1-3 match a pandas brute force
    import numpy as np
    nch = docs_df["text"].str.len()
    ntok = docs_df["text"].str.split(" ").map(len)
    ttr = docs_df["text"].str.split(" ").map(
        lambda t: len(set(t)) / len(t))
    p1 = nch >= 200
    p2 = p1 & ntok.between(30, 10000)
    p3 = p2 & (ttr >= 0.35)
    assert got["n_out"].iloc[0] == int(p1.sum())
    assert got["n_out"].iloc[1] == int(p2.sum())
    assert got["n_out"].iloc[2] == int(p3.sum())


@pytest.mark.parametrize("name", [
    "snapshot_diff", "triangle_count", "lang_source_mi",
    "oov_rate_per_doc", "table_profile", "price_equidepth_histogram",
    "ewma_user_value", "debounced_event_counts",
])
def test_round3_wave3_oracle_parity(con, name):
    """The round-3 wave-3 queries (CDC diff, triangle census, MI audit,
    OOV rate, table profile, equi-depth histogram, EWMA score, burst
    debounce) match their registered DuckDB oracles at sf0.001 — the
    same comparison the driver gate runs at sf0.01."""
    import __ray_entry__ as e

    _check(e.queries()[name](SF), e.oracle_sql()[name], con)


@pytest.mark.parametrize("name", [
    "snm_candidate_pairs", "sales_cube",
])
def test_round3_wave4_oracle_parity(con, name):
    import __ray_entry__ as e

    _check(e.queries()[name](SF), e.oracle_sql()[name], con)


def test_cms_token_counts_bounds():
    """CMS guarantees: est >= exact always; overcount bounded by
    e/width * N (with depth=4 rows the failure probability is
    exp(-4) per item — deterministic here since the corpus is fixed)."""
    import numpy as np

    from granulate_char_ocr_ray.pipelines.analysis import \
        cms_token_counts

    df = cms_token_counts(SF).to_pandas()
    assert len(df) == 10
    assert (df["cms_est"] >= df["exact_c"]).all()
    n_total = int(
        pd.read_parquet(f"{SF}/documents.parquet")["text"]
        .str.strip().str.split().map(len).sum())
    bound = np.e / 1024 * n_total
    assert ((df["cms_est"] - df["exact_c"]) <= bound).all()


def test_cms_kernel_merge_identity():
    """Sum-merged block sketches == one sketch over the whole stream."""
    import numpy as np
    import pyarrow as pa

    from granulate_char_ocr_ray.functions.sketch import (
        cms_add_hashes, cms_create, cms_estimate_hashes, cms_merge)
    from granulate_char_ocr_ray.functions.textstats import hash64_batch

    rng = np.random.default_rng(7)
    items = [f"tok{i}" for i in rng.integers(0, 200, 5000)]
    h = hash64_batch(pa.array(items, pa.string()))
    whole = cms_add_hashes(cms_create(), h.copy())
    a = cms_add_hashes(cms_create(), h[:2000].copy())
    b = cms_add_hashes(cms_create(), h[2000:].copy())
    assert (cms_merge(a, b) == whole).all()
    probe = hash64_batch(pa.array(["tok5", "tok50", "tok199"]))
    exact = np.array([items.count("tok5"), items.count("tok50"),
                      items.count("tok199")])
    est = cms_estimate_hashes(whole, probe)
    assert (est >= exact).all()


@pytest.mark.parametrize("name", [
    "vertex_clustering", "late_event_counts",
    "sample_docs_per_source", "source_ablation_impact",
])
def test_round3_wave5_oracle_parity(con, name):
    import __ray_entry__ as e

    _check(e.queries()[name](SF), e.oracle_sql()[name], con)


@pytest.mark.parametrize("name", [
    "token_fertility_by_lang", "max_quantity_with_ties",
])
def test_round3_wave6_oracle_parity(con, name):
    import __ray_entry__ as e

    _check(e.queries()[name](SF), e.oracle_sql()[name], con)


def test_approx_doclen_quantiles_rank_error(con):
    """KLL grouped quantiles: every reported pXX sits within 5% rank
    of the exact grouped quantile (KLL's guarantee at default k)."""
    from granulate_char_ocr_ray.pipelines.analysis import \
        approx_doclen_quantiles_by_lang

    got = approx_doclen_quantiles_by_lang(SF).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["lang", "n_chars"])
    for _, row in got.iterrows():
        vals = docs[docs["lang"] == row["lang"]]["n_chars"] \
            .sort_values().to_numpy()
        n = len(vals)
        assert n == row["n_docs"]
        for q, col in ((0.5, "p50"), (0.9, "p90")):
            import numpy as np
            rank = np.searchsorted(vals, row[col], side="left")
            assert abs(rank / n - q) <= 0.05 + 1.0 / n


@pytest.mark.parametrize("name", [
    "rfm_scores", "session_bounce_rate",
])
def test_round3_wave7_oracle_parity(con, name):
    import __ray_entry__ as e

    _check(e.queries()[name](SF), e.oracle_sql()[name], con)


@pytest.mark.parametrize("name", [
    "k_anonymity_audit", "incremental_source_counts",
])
def test_round3_wave8_oracle_parity(con, name):
    import __ray_entry__ as e

    _check(e.queries()[name](SF), e.oracle_sql()[name], con)


@pytest.mark.parametrize("name", [
    "cross_source_dup_matrix", "psi_price_drift",
])
def test_round3_wave9_oracle_parity(con, name):
    import __ray_entry__ as e

    _check(e.queries()[name](SF), e.oracle_sql()[name], con)


@pytest.mark.parametrize("name", [
    "changepoint_day_split", "seasonal_hour_anomalies",
])
def test_round3_wave10_oracle_parity(con, name):
    import __ray_entry__ as e

    _check(e.queries()[name](SF), e.oracle_sql()[name], con)


def test_compression_ratio_quality_brute_force():
    """zlib ratios match a single-process pass; repetitive text
    compresses harder than diverse text."""
    import zlib

    from granulate_char_ocr_ray.pipelines.analysis import \
        compression_ratio_quality

    got = compression_ratio_quality(SF).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"]) \
        .sort_values("doc_id").reset_index(drop=True)
    want_nc = docs["text"].map(
        lambda t: len(zlib.compress(t.encode("utf-8"), 6))
        if t else 0)
    assert (got["n_compressed"].to_numpy()
            == want_nc.to_numpy()).all()
    rep = len(zlib.compress(b"spam " * 200, 6)) / 1000
    div = len(zlib.compress(bytes(range(256)) * 4, 6)) / 1024
    assert rep < div


@pytest.mark.parametrize("name", [
    "data_expectations", "adjacent_chunk_pairs",
    "star_revenue_rollup",
])
def test_round3_wave11_oracle_parity(con, name):
    import __ray_entry__ as e

    _check(e.queries()[name](SF), e.oracle_sql()[name], con)


@pytest.mark.parametrize("name", [
    "cluster_top_terms", "skew_report",
])
def test_round3_wave12_oracle_parity(con, name):
    import __ray_entry__ as e

    _check(e.queries()[name](SF), e.oracle_sql()[name], con)


@pytest.mark.parametrize("name", [
    "temperature_mix_weights", "linear_attribution",
])
def test_round3_wave13_oracle_parity(con, name):
    import __ray_entry__ as e

    _check(e.queries()[name](SF), e.oracle_sql()[name], con)


def test_bucketed_segment_revenue_parity_and_reuse(con):
    """Bucketed-storage join: matches the SQL oracle AND the second
    run (reusing the bucket layout on disk) returns the identical
    frame."""
    import glob
    import shutil

    import __ray_entry__ as e

    for d in glob.glob("/tmp/graft_layouts/bucketed_custkey_*"):
        shutil.rmtree(d, ignore_errors=True)
    q = e.queries()["bucketed_segment_revenue"]
    first = q(SF).to_pandas()
    _check(q(SF), e.oracle_sql()["bucketed_segment_revenue"], con)
    again = q(SF).to_pandas()
    pd.testing.assert_frame_equal(first, again)


@pytest.mark.parametrize("name", [
    "hive_partition_stats", "join_size_estimate",
])
def test_round3_wave15_oracle_parity(con, name):
    import __ray_entry__ as e

    _check(e.queries()[name](SF), e.oracle_sql()[name], con)


def test_hive_partition_prunes_files():
    """The partition-pruned read lists ONLY the requested lang's
    directory (no other partition's file opens)."""
    import glob
    import shutil

    from granulate_char_ocr_ray.pipelines.analysis import \
        hive_partition_stats
    from granulate_char_ocr_ray.sources.storage import (
        cached_layout, source_fingerprint)

    for d in glob.glob("/tmp/graft_layouts/hive_docs_lang_*"):
        shutil.rmtree(d, ignore_errors=True)
    hive_partition_stats(SF, lang="de").to_pandas()
    base = ("/tmp/graft_layouts/hive_docs_lang_"
            + source_fingerprint([f"{SF}/documents.parquet"]))
    parts = sorted(p.split("=")[-1] for p in
                   glob.glob(f"{base}/lang=*"))
    assert "de" in parts and len(parts) >= 3
    import pyarrow.dataset as pads

    files = pads.dataset(f"{base}/lang=de").files
    assert files and all("lang=de" in f for f in files)


def test_cached_layout_fingerprint_and_crash_safety(tmp_path):
    """The layout cache rebuilds when the SOURCE changes (fingerprint
    key, not basename), and a crashed build never poisons the cache
    (tmp-then-rename)."""
    import os

    src = tmp_path / "t.parquet"
    pd.DataFrame({"a": [1, 2]}).to_parquet(src)
    calls = []

    def build(d):
        calls.append(d)
        os.makedirs(d)
        (pd.DataFrame({"a": [0]})).to_parquet(f"{d}/part.parquet")

    d1 = cached_layout_helper("t_layout", [str(src)], build)
    d2 = cached_layout_helper("t_layout", [str(src)], build)
    assert d1 == d2 and len(calls) == 1  # reused, not rebuilt
    # mutate the source -> new fingerprint -> rebuild
    pd.DataFrame({"a": [1, 2, 3]}).to_parquet(src)
    d3 = cached_layout_helper("t_layout", [str(src)], build)
    assert d3 != d1 and len(calls) == 2
    # a crashing build leaves nothing visible; the retry rebuilds
    def boom(d):
        os.makedirs(d)
        raise RuntimeError("simulated OutOfDisk")
    pd.DataFrame({"a": [9]}).to_parquet(src)
    with pytest.raises(RuntimeError):
        cached_layout_helper("t_layout", [str(src)], boom)
    d4 = cached_layout_helper("t_layout", [str(src)], build)
    assert os.path.exists(f"{d4}/part.parquet") and len(calls) == 3
    for d in (d1, d3, d4):
        import shutil
        shutil.rmtree(d, ignore_errors=True)


def cached_layout_helper(tag, paths, build):
    from granulate_char_ocr_ray.sources.storage import cached_layout
    return cached_layout(tag, paths, build)


def test_bootstrap_mean_ci_deterministic_and_sane():
    """Poisson bootstrap: bit-identical across runs (blocking-free
    weights), CI brackets the mean, SE within 3x of the CLT value."""
    import duckdb

    from granulate_char_ocr_ray.pipelines.relational import (
        bootstrap_mean_ci)

    SF = "/root/testdata/sf0.001"
    a = bootstrap_mean_ci(SF)
    b = bootstrap_mean_ci(SF)
    assert a.equals(b)
    row = a.iloc[0]
    assert row["ci_lo"] <= row["mean"] <= row["ci_hi"]
    got = duckdb.sql(
        f"SELECT avg(l_extendedprice), stddev_samp(l_extendedprice), "
        f"count(*) FROM '{SF}/lineitem.parquet'").fetchone()
    import numpy as np
    clt_se = got[1] / np.sqrt(got[2])
    assert row["mean"] == pytest.approx(got[0], abs=0.01)
    assert clt_se / 3 < row["se_boot"] < clt_se * 3


def test_rbo_rankings_closed_form():
    """RBO identities: identical lists -> rbo_ext == 1; disjoint lists
    -> 0; engine value matches a from-scratch fold on its own inputs."""
    import numpy as np

    from granulate_char_ocr_ray.pipelines.analysis import (
        bm25_search, rbo_rankings, rrf_hybrid_search)

    SF = "/root/testdata/sf0.001"
    got = rbo_rankings(SF, p=0.9, depth=10).iloc[0]
    a = (bm25_search(SF).to_pandas()
         .sort_values(["score", "doc_id"], ascending=[False, True])
         ["doc_id"].tolist()[:10])
    b = (rrf_hybrid_search(SF).to_pandas()
         .sort_values(["rrf_score", "doc_id"], ascending=[False, True])
         ["doc_id"].tolist()[:10])
    d = min(len(a), len(b), 10)
    sa, sb, agr = set(), set(), []
    for i in range(d):
        sa.add(a[i]); sb.add(b[i])
        agr.append(len(sa & sb) / (i + 1))
    w = np.array([0.1 * 0.9 ** i for i in range(d)])
    want_min = float((w * np.array(agr)).sum())
    assert got["rbo_min"] == pytest.approx(want_min, abs=1e-6)
    assert got["rbo_ext"] == pytest.approx(
        want_min + agr[-1] * 0.9 ** d, abs=1e-6)
    assert 0.0 <= got["rbo_min"] <= got["rbo_ext"] <= 1.0


def test_copurchase_kcore_matches_bruteforce_peeling():
    import duckdb
    import numpy as np

    from granulate_char_ocr_ray.pipelines.relational import (
        copurchase_kcore)

    SF = "/root/testdata/sf0.001"
    k = 3
    got = copurchase_kcore(SF, k=k).iloc[0]

    e = duckdb.sql(f"""
        WITH d AS (SELECT DISTINCT l_orderkey, l_partkey
                   FROM '{SF}/lineitem.parquet'),
        e AS (SELECT a.l_partkey p1, b.l_partkey p2
              FROM d a JOIN d b ON a.l_orderkey = b.l_orderkey
                   AND a.l_partkey < b.l_partkey
              GROUP BY 1, 2 HAVING count(*) >= 2)
        SELECT p1, p2 FROM e""").fetchnumpy()
    p1, p2 = e["p1"].astype(np.int64), e["p2"].astype(np.int64)
    while len(p1):
        v, d = np.unique(np.concatenate([p1, p2]), return_counts=True)
        drop = set(v[d < k].tolist())
        if not drop:
            break
        keep = np.array([a not in drop and b not in drop
                         for a, b in zip(p1, p2)])
        p1, p2 = p1[keep], p2[keep]
    nv = len(np.unique(np.concatenate([p1, p2]))) if len(p1) else 0
    assert int(got["core_edges"]) == len(p1)
    assert int(got["core_vertices"]) == nv


def test_copurchase_kcore_both_plans_identical():
    """VERDICT r04 #3: the per-round drop-set filter size-dispatches
    like every anti-join here — broadcast below threshold, partitioned
    anti-join above. Forcing the partitioned plan (threshold 0) must
    reproduce the broadcast plan's result exactly."""
    import pandas as pd

    from granulate_char_ocr_ray.pipelines.relational import (
        copurchase_kcore)

    SF = "/root/testdata/sf0.001"
    # k=8 forces at least one peeling round on this corpus, so the
    # forced-partitioned run genuinely exercises the anti-join
    broadcast = copurchase_kcore(SF, k=8)
    partitioned = copurchase_kcore(SF, k=8, broadcast_threshold=0)
    pd.testing.assert_frame_equal(broadcast, partitioned)
    assert int(broadcast.iloc[0]["n_rounds"]) > 0


def test_classifier_calibration_bins_sane():
    import duckdb

    from granulate_char_ocr_ray.pipelines.analysis import (
        classifier_calibration_bins)

    SF = "/root/testdata/sf0.001"
    got = classifier_calibration_bins(SF).to_pandas()
    n_docs = duckdb.sql(
        f"SELECT count(*) FROM '{SF}/documents.parquet'").fetchone()[0]
    assert got["n_docs"].sum() == n_docs
    assert ((got["frac_positive"] >= 0) & (got["frac_positive"] <= 1)).all()
    assert ((got["mean_pred"] >= 0) & (got["mean_pred"] <= 1)).all()
    assert got["bin"].between(0, 9).all()
    # mean_pred must sit inside its own bin's probability range
    for _, r in got.iterrows():
        assert r["bin"] / 10 - 1e-9 <= r["mean_pred"] <= (
            r["bin"] + 1) / 10 + 1e-9


def test_kmv_sketch_accuracy_and_merge():
    """KMV distinct/Jaccard/intersection estimates within ~1/sqrt(k)
    of truth; merge of partials equals the whole-stream sketch."""
    import numpy as np

    from granulate_char_ocr_ray.functions.sketch import (
        kmv_estimate, kmv_from_hashes, kmv_intersection, kmv_jaccard,
        kmv_merge)

    rng = np.random.default_rng(11)
    A = rng.integers(0, 1 << 64, 150_000, dtype=np.uint64)
    B = np.concatenate([
        A[:60_000], rng.integers(0, 1 << 64, 90_000, dtype=np.uint64)])
    a, b = kmv_from_hashes(A), kmv_from_hashes(B)
    true_a = len(np.unique(A))
    true_j = len(np.intersect1d(A, B)) / len(np.union1d(A, B))
    true_i = len(np.intersect1d(A, B))
    assert abs(kmv_estimate(a) - true_a) / true_a < 0.2
    assert abs(kmv_jaccard(a, b) - true_j) < 0.12
    assert abs(kmv_intersection(a, b) - true_i) / true_i < 0.3
    # mergeability: partial sketches fold to the whole-stream sketch
    m = kmv_merge(kmv_from_hashes(A[:70_000]),
                  kmv_from_hashes(A[70_000:]))
    assert np.array_equal(m, a)
    # small sets are exact
    small = rng.integers(0, 1 << 64, 100, dtype=np.uint64)
    assert kmv_estimate(kmv_from_hashes(small)) == len(np.unique(small))


def test_audience_overlap_kmv_matches_exact():
    """Sketch overlap estimates track the exact audience_overlap
    within the k=256 error bound on the fixture corpus."""
    from granulate_char_ocr_ray.pipelines.events import (
        audience_overlap, audience_overlap_kmv)

    exact = audience_overlap(SF).to_pandas().set_index(
        ["type_a", "type_b"])
    approx = audience_overlap_kmv(SF).to_pandas()
    assert len(approx) == len(exact)
    for _, r in approx.iterrows():
        e = exact.loc[(r["type_a"], r["type_b"])]
        assert abs(r["est_jaccard"] - e["jaccard"]) < 0.15
        assert abs(r["est_n_a"] - e["n_a"]) / max(e["n_a"], 1) < 0.2


def test_isotonic_calibration_pav_properties():
    """PAV output is monotone non-decreasing, preserves total
    positives, and equals a brute-force PAV on the same histogram."""
    import numpy as np

    from granulate_char_ocr_ray.pipelines.analysis import (
        classifier_calibration_bins, isotonic_calibration)

    got = isotonic_calibration(SF).to_pandas()
    probs = got["iso_prob"].to_numpy()
    assert (np.diff(probs) >= -1e-12).all()
    assert (got["score_lo"].to_numpy() < got["score_hi"].to_numpy()).all()
    # mass conservation vs the 10-bin reliability diagram's totals
    bins = classifier_calibration_bins(SF).to_pandas()
    total_pos = float((bins["frac_positive"] * bins["n_docs"]).sum())
    got_pos = float((got["iso_prob"] * got["n_docs"]).sum())
    assert abs(total_pos - got_pos) / max(total_pos, 1.0) < 1e-4
    # brute-force PAV over the same 50-bin histogram must agree
    import pandas as pd

    from granulate_char_ocr_ray.functions.linear import linear_z
    from granulate_char_ocr_ray.pipelines.analysis import (
        QUALITY_CLF_FEATURES, _docs, _quality_clf_xy,
        train_quality_classifier)
    model = train_quality_classifier(SF).to_pandas() \
        .set_index("feature")["value"]
    mu = np.array([model[f"mu_{f}"] for f in QUALITY_CLF_FEATURES])
    w = np.array([model[f"w_{f}"] for f in QUALITY_CLF_FEATURES]
                 + [model["bias"]])
    import pyarrow.dataset as pads
    t = pads.dataset(f"{SF}/documents.parquet").to_table(
        columns=["text"])
    X, y = _quality_clf_xy(t.column("text"))
    p = 1.0 / (1.0 + np.exp(-linear_z(X - mu, w)))
    b = np.minimum((p * 50).astype(np.int64), 49)
    h = pd.DataFrame({"b": b, "n": 1, "pos": y.astype(int)}).groupby(
        "b", as_index=False).sum().sort_values("b")
    means = (h["pos"] / h["n"]).to_numpy(dtype=float)
    wts = h["n"].to_numpy(dtype=float)
    # O(n^2) reference PAV
    vals = means.copy(); ww = wts.copy(); idx = list(range(len(vals)))
    changed = True
    vals = list(vals); ww = list(ww)
    while changed:
        changed = False
        for i in range(len(vals) - 1):
            if vals[i] >= vals[i + 1] + 1e-15 or (
                    abs(vals[i] - vals[i + 1]) < 1e-15):
                m = (vals[i] * ww[i] + vals[i+1] * ww[i+1]) \
                    / (ww[i] + ww[i+1])
                vals[i] = m; ww[i] = ww[i] + ww[i+1]
                del vals[i+1]; del ww[i+1]
                changed = True
                break
    assert len(vals) == len(got)
    np.testing.assert_allclose(
        got["iso_prob"].to_numpy(), np.array(vals), atol=5e-7)


def test_qty_discount_kendall_matches_bruteforce():
    """Contingency-table tau-b equals the O(n^2) sign-sum definition
    (vectorized outer products on the 6k-row fixture)."""
    import numpy as np
    import pyarrow.dataset as pads

    from granulate_char_ocr_ray.pipelines.relational import (
        qty_discount_kendall)

    got = qty_discount_kendall(SF).to_pandas()
    t = pads.dataset(f"{SF}/lineitem.parquet").to_table(
        columns=["l_quantity", "l_discount"])
    q = np.rint(t.column("l_quantity").to_numpy()).astype(np.int64)
    d = np.rint(t.column("l_discount").to_numpy() * 100).astype(
        np.int64)
    n = len(q)
    sq = np.sign(q[:, None] - q[None, :]).astype(np.int64)
    sd = np.sign(d[:, None] - d[None, :]).astype(np.int64)
    cmd = int((sq * sd).sum()) // 2  # C - D over unordered pairs
    n0 = n * (n - 1) / 2.0
    _, tq = np.unique(q, return_counts=True)
    _, td = np.unique(d, return_counts=True)
    n1 = float((tq * (tq - 1) / 2.0).sum())
    n2 = float((td * (td - 1) / 2.0).sum())
    want = cmd / np.sqrt((n0 - n1) * (n0 - n2))
    assert got["n_items"].iloc[0] == n
    assert got["kendall_tau_b"].iloc[0] == pytest.approx(want,
                                                         abs=1e-6)


def test_price_mannwhitney_matches_bruteforce():
    """Histogram-rank U equals the pairwise definition
    U_a = #(x>y) + 0.5 #(x==y) computed via searchsorted."""
    import numpy as np
    import pyarrow.dataset as pads

    from granulate_char_ocr_ray.pipelines.relational import (
        price_mannwhitney)

    got = price_mannwhitney(SF).to_pandas()
    t = pads.dataset(f"{SF}/lineitem.parquet").to_table(
        columns=["l_returnflag", "l_extendedprice"])
    f = np.asarray(t.column("l_returnflag"))
    v = np.rint(t.column("l_extendedprice").to_numpy() * 100).astype(
        np.int64)
    for _, row in got.iterrows():
        a = np.sort(v[f == row["flag_a"]])
        b = np.sort(v[f == row["flag_b"]])
        lo = np.searchsorted(b, a, side="left")
        hi = np.searchsorted(b, a, side="right")
        u_a = float(lo.sum()) + 0.5 * float((hi - lo).sum())
        assert row["n_a"] == len(a) and row["n_b"] == len(b)
        assert row["u_stat"] == pytest.approx(u_a, abs=0.01)
        # z-score sign should match the direction of the mean shift
        mu = len(a) * len(b) / 2.0
        assert np.sign(row["z_score"]) == np.sign(u_a - mu)


def test_classifier_auc_matches_bruteforce():
    """Histogram rank-sum AUC equals the pairwise definition
    P(score_pos > score_neg) + 0.5 P(==) on the quantized scores."""
    import numpy as np
    import pyarrow.dataset as pads

    from granulate_char_ocr_ray.functions.linear import linear_z
    from granulate_char_ocr_ray.pipelines.analysis import (
        QUALITY_CLF_FEATURES, _quality_clf_xy, classifier_auc,
        train_quality_classifier)

    got = classifier_auc(SF).to_pandas()
    model = train_quality_classifier(SF).to_pandas() \
        .set_index("feature")["value"]
    mu = np.array([model[f"mu_{f}"] for f in QUALITY_CLF_FEATURES])
    w = np.array([model[f"w_{f}"] for f in QUALITY_CLF_FEATURES]
                 + [model["bias"]])
    t = pads.dataset(f"{SF}/documents.parquet").to_table(
        columns=["text"])
    X, y = _quality_clf_xy(t.column("text"))
    p = 1.0 / (1.0 + np.exp(-linear_z(X - mu, w)))
    sq = np.rint(p * 1e6).astype(np.int64)
    pos = np.sort(sq[y.astype(bool)])
    neg = np.sort(sq[~y.astype(bool)])
    lo = np.searchsorted(neg, pos, side="left")
    hi = np.searchsorted(neg, pos, side="right")
    want = (lo.sum() + 0.5 * (hi - lo).sum()) / (len(pos) * len(neg))
    assert got["n_docs"].iloc[0] == len(sq)
    assert got["n_pos"].iloc[0] == len(pos)
    assert got["auc"].iloc[0] == pytest.approx(want, abs=1e-6)


def test_als_recommendations_matches_local_reference():
    """Distributed ALS equals a single-process reference running the
    identical update math (same deterministic init, same per-key
    normal equations) — and never recommends an already-bought part."""
    import numpy as np
    import pandas as pd
    import pyarrow.dataset as pads

    from granulate_char_ocr_ray.pipelines.relational import (
        _init_factors_for_test, als_recommendations)

    f, alpha, lam, iters, k, n_out = 8, 40.0, 0.1, 3, 3, 20
    got = als_recommendations(SF).to_pandas()

    li = pads.dataset(f"{SF}/lineitem.parquet").to_table(
        columns=["l_orderkey", "l_partkey", "l_quantity"]).to_pandas()
    od = pads.dataset(f"{SF}/orders.parquet").to_table(
        columns=["o_orderkey", "o_custkey"]).to_pandas()
    inter = (od.merge(li, left_on="o_orderkey", right_on="l_orderkey")
             .groupby(["o_custkey", "l_partkey"], as_index=False)
             .agg(r=("l_quantity", "sum")))

    def solve(side_key, other_key, fids, ffac):
        gram = ffac.T @ ffac + lam * np.eye(f)
        g = inter.sort_values([side_key, other_key])
        keys_ = g[side_key].to_numpy(dtype=np.int64)
        oth = g[other_key].to_numpy(dtype=np.int64)
        r = g["r"].to_numpy(dtype=np.float64)
        uk, idx = np.unique(keys_, return_inverse=True)
        yr = ffac[np.searchsorted(fids, oth)]
        cw = alpha * r
        A = np.broadcast_to(gram, (len(uk), f, f)).copy()
        np.add.at(A, idx, np.einsum("nf,ng->nfg", yr * cw[:, None], yr))
        B = np.zeros((len(uk), f))
        np.add.at(B, idx, yr * (1.0 + cw)[:, None])
        return uk, np.linalg.solve(A, B)

    item_ids = np.sort(inter["l_partkey"].unique()).astype(np.int64)
    Y = _init_factors_for_test(item_ids, f)
    for _ in range(iters):
        user_ids, X = solve("o_custkey", "l_partkey", item_ids, Y)
        item_ids, Y = solve("l_partkey", "o_custkey", user_ids, X)

    panel = user_ids[:n_out]
    scores = X[:n_out] @ Y.T
    seen = inter[inter["o_custkey"].isin(panel)]
    scores[np.searchsorted(panel, seen["o_custkey"].to_numpy()),
           np.searchsorted(item_ids, seen["l_partkey"].to_numpy())] \
        = -np.inf
    want = []
    for ui, u in enumerate(panel):
        order = np.lexsort((item_ids, -scores[ui]))[:k]
        for rank, ii in enumerate(order, 1):
            want.append((int(u), rank, int(item_ids[ii]),
                         scores[ui, ii]))
    want = pd.DataFrame(want, columns=["c_custkey", "rec_rank",
                                       "p_partkey", "score"])
    assert list(got["c_custkey"]) == list(want["c_custkey"])
    assert list(got["rec_rank"]) == list(want["rec_rank"])
    assert list(got["p_partkey"]) == list(want["p_partkey"])
    np.testing.assert_allclose(got["score"].to_numpy(),
                               want["score"].to_numpy(), atol=5e-4)
    # no recommended pair was already purchased
    pairs = set(zip(inter["o_custkey"], inter["l_partkey"]))
    assert not any((u, p) in pairs
                   for u, p in zip(got["c_custkey"], got["p_partkey"]))


def test_als_recommendations_both_plans_bit_identical():
    """VERDICT r04 #1: the at-scale ALS plan (factors held as
    Datasets, fixed side attached via partitioned_join, distributed
    Gram reduce in fixed bucket order, streaming top-k scoring with a
    panel-only seen mask) must be BIT-identical to the driver-local
    broadcast plan — the deterministic splitmix init plus pinned float
    fold orders make every intermediate identical, so the outputs
    compare exactly, not within tolerance."""
    import pandas as pd

    from granulate_char_ocr_ray.pipelines.relational import (
        als_recommendations)

    broadcast = als_recommendations(SF).to_pandas()
    partitioned = als_recommendations(
        SF, broadcast_threshold=0).to_pandas()
    pd.testing.assert_frame_equal(broadcast, partitioned,
                                  check_exact=True)
    assert len(broadcast) > 0


def test_price_ks_test_matches_bruteforce():
    """Histogram ECDF max-gap equals the sorted-array two-sample KS."""
    import numpy as np
    import pyarrow.dataset as pads

    from granulate_char_ocr_ray.pipelines.relational import (
        price_ks_test)

    got = price_ks_test(SF).to_pandas()
    t = pads.dataset(f"{SF}/lineitem.parquet").to_table(
        columns=["l_returnflag", "l_extendedprice"])
    f = np.asarray(t.column("l_returnflag"))
    v = np.rint(t.column("l_extendedprice").to_numpy() * 100).astype(
        np.int64)
    for _, row in got.iterrows():
        a = np.sort(v[f == row["flag_a"]])
        b = np.sort(v[f == row["flag_b"]])
        vs = np.union1d(a, b)
        fa = np.searchsorted(a, vs, side="right") / len(a)
        fb = np.searchsorted(b, vs, side="right") / len(b)
        d = float(np.abs(fa - fb).max())
        assert row["ks_stat"] == pytest.approx(d, abs=1e-6)
        assert row["ks_scaled"] == pytest.approx(
            np.sqrt(len(a) * len(b) / (len(a) + len(b))) * d, abs=1e-5)


def test_price_anova_f_matches_bruteforce():
    """Moments-based F equals the definitional SSB/SSW computation."""
    import numpy as np
    import pyarrow.dataset as pads

    from granulate_char_ocr_ray.pipelines.relational import (
        price_anova_f)

    got = price_anova_f(SF).to_pandas()
    t = pads.dataset(f"{SF}/lineitem.parquet").to_table(
        columns=["l_returnflag", "l_extendedprice"])
    f = np.asarray(t.column("l_returnflag"))
    x = t.column("l_extendedprice").to_numpy()
    groups = [x[f == g] for g in np.unique(f)]
    grand = x.mean()
    ssb = sum(len(g) * (g.mean() - grand) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    want = (ssb / (len(groups) - 1)) / (ssw / (len(x) - len(groups)))
    assert got["n_total"].iloc[0] == len(x)
    assert got["k_groups"].iloc[0] == len(groups)
    assert got["f_stat"].iloc[0] == pytest.approx(want, abs=1e-6)


def test_qty_discount_theilsen_matches_bruteforce():
    """Weighted cell-pair median equals np.median over ALL pairwise
    slopes with distinct x (18M pairs, vectorized)."""
    import numpy as np
    import pyarrow.dataset as pads

    from granulate_char_ocr_ray.pipelines.relational import (
        qty_discount_theilsen)

    got = qty_discount_theilsen(SF).to_pandas()
    t = pads.dataset(f"{SF}/lineitem.parquet").to_table(
        columns=["l_quantity", "l_discount"])
    q = np.rint(t.column("l_quantity").to_numpy()).astype(np.int64)
    d = np.rint(t.column("l_discount").to_numpy() * 100).astype(
        np.int64)
    ii, jj = np.triu_indices(len(q), k=1)
    keep = q[ii] != q[jj]
    ii, jj = ii[keep], jj[keep]
    # orient pairs so x_j > x_i (slope is orientation-invariant)
    slopes = (d[jj] - d[ii]) / (q[jj] - q[ii]).astype(np.float64)
    assert got["n_pairs"].iloc[0] == len(slopes)
    assert got["theilsen_slope"].iloc[0] == pytest.approx(
        float(np.median(slopes)), abs=1e-6)


def test_holt_winters_tracks_synthetic_weekly_pattern(tmp_path):
    """A pure trend + weekly season series is forecast to within a
    few units after a year of smoothing."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from granulate_char_ocr_ray.pipelines.relational import (
        holt_winters_daily)

    days = pd.date_range("1997-01-01", "1997-12-31", freq="D")
    season = np.array([0.0, 100.0, -50.0, 30.0, -80.0, 60.0, -60.0])
    vals = 1000.0 + 2.0 * np.arange(len(days)) \
        + season[np.arange(len(days)) % 7]
    t = pa.table({
        "o_orderdate": pa.array(days, pa.timestamp("us")),
        "o_totalprice": pa.array(vals, pa.float64())})
    pq.write_table(t, str(tmp_path / "orders.parquet"))

    got = holt_winters_daily(str(tmp_path)).to_pandas()
    fc = got[got["kind"] == "forecast"].reset_index(drop=True)
    assert len(fc) == 7
    for h in range(7):
        ti = len(days) + h
        want = 1000.0 + 2.0 * ti + season[ti % 7]
        assert abs(fc["value"].iloc[h] - want) < 5.0
    # fitted tail should also hug the series
    ft = got[got["kind"] == "fitted"]
    tail_want = vals[-7:]
    assert np.abs(ft["value"].to_numpy() - tail_want).max() < 5.0


def test_daily_revenue_stl_additivity_and_seasonality():
    """trend + seasonal + resid reconstructs revenue, seasonal sums
    to ~0 over a full week, and trend is smooth (bounded day-to-day
    relative change vs the raw series variance)."""
    import numpy as np

    from granulate_char_ocr_ray.pipelines.relational import (
        daily_revenue_stl)

    got = daily_revenue_stl(SF).to_pandas()
    assert len(got) == 28
    recon = (got["trend"] + got["seasonal"] + got["resid"]).to_numpy()
    np.testing.assert_allclose(recon, got["revenue"].to_numpy(),
                               atol=2e-2)
    # seasonal is a weekday effect: one value per weekday (<= 7)
    dow = pd.to_datetime(got["day"]).dt.strftime("%w")
    per_dow = got.groupby(dow)["seasonal"].nunique()
    assert (per_dow == 1).all()
    # trend varies less than the raw series
    assert np.std(np.diff(got["trend"])) < np.std(
        np.diff(got["revenue"]))


def test_event_type_lagged_xcorr_lag0_is_pearson():
    """Lag-0 cross-correlation equals the direct Pearson correlation
    of the two aligned daily count series."""
    import numpy as np

    from granulate_char_ocr_ray.pipelines.events import (
        event_type_lagged_xcorr)

    got = event_type_lagged_xcorr(SF).to_pandas()
    assert list(got["lag"]) == list(range(8))
    con = duckdb.connect()
    df = con.execute(f"""
        WITH cx AS (SELECT CAST(ts AS DATE) d, count(*) x
                    FROM '{SF}/events.parquet'
                    WHERE event_type = 'click' GROUP BY 1),
             cy AS (SELECT CAST(ts AS DATE) d, count(*) y
                    FROM '{SF}/events.parquet'
                    WHERE event_type = 'purchase' GROUP BY 1)
        SELECT corr(x, y) r, count(*) n
        FROM cx JOIN cy USING (d)
    """).df()
    assert got["n_days"].iloc[0] == df["n"].iloc[0]
    assert got["xcorr"].iloc[0] == pytest.approx(df["r"].iloc[0],
                                                 abs=1e-6)


@pytest.mark.parametrize("name", [
    "langid_agreement_kappa", "association_rules",
])
def test_round3_wave27_oracle_parity(con, name):
    """Round-3 wave-27 queries (Cohen's kappa labeler agreement,
    Agrawal-Srikant association rules) match their DuckDB oracles at
    sf0.001 — the same comparison the driver gate runs at sf0.01."""
    import __ray_entry__ as e

    _check(e.queries()[name](SF), e.oracle_sql()[name], con)


def test_langid_kappa_definition():
    """kappa == (po - pe)/(1 - pe) recomputed from the raw confusion
    matrix of lang_id_batch over the whole corpus in one process."""
    import numpy as np
    import pyarrow as pa

    from granulate_char_ocr_ray.functions.textstats import lang_id_batch
    from granulate_char_ocr_ray.pipelines.analysis import (
        langid_agreement_kappa)

    got = langid_agreement_kappa(SF).to_pandas().iloc[0]
    df = pd.read_parquet(f"{SF}/documents.parquet",
                         columns=["text", "lang"])
    pred, _ = lang_id_batch(pa.array(df["text"], pa.string()))
    ct = pd.crosstab(pd.Series(pred, name="p"), df["lang"].rename("t"))
    tot = float(ct.to_numpy().sum())
    labels = ct.index.union(ct.columns)
    m = ct.reindex(index=labels, columns=labels, fill_value=0)\
        .to_numpy(dtype=np.float64)
    po = np.trace(m) / tot
    pe = float((m.sum(1) * m.sum(0)).sum()) / tot ** 2
    assert got["n_docs"] == int(tot)
    assert got["po"] == pytest.approx(po, abs=1e-6)
    assert got["kappa"] == pytest.approx((po - pe) / (1 - pe),
                                         abs=1e-6)


def test_association_rules_definition():
    """confidence = n_pair/n_ant and lift = n_pair*N/(n_ant*n_con)
    recomputed from raw basket data; both rule directions present."""
    from granulate_char_ocr_ray.pipelines.relational import (
        association_rules)

    got = association_rules(SF).to_pandas()
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])\
        .drop_duplicates()
    n_orders = len(pd.read_parquet(f"{SF}/orders.parquet",
                                   columns=["o_orderkey"]))
    sup = li.groupby("l_partkey").size()
    m = li.merge(li, on="l_orderkey")
    m = m[m["l_partkey_x"] < m["l_partkey_y"]]
    pc = m.groupby(["l_partkey_x", "l_partkey_y"]).size()
    pc = pc[pc >= 3]
    assert len(got) == 2 * len(pc)
    for _, r in got.head(20).iterrows():
        a, c = int(r["antecedent"]), int(r["consequent"])
        np_ = pc.get((min(a, c), max(a, c)))
        assert r["n_pair"] == np_
        assert r["n_ant"] == sup[a]
        assert r["confidence"] == pytest.approx(np_ / sup[a], abs=1e-4)
        assert r["lift"] == pytest.approx(
            np_ * n_orders / (sup[a] * sup[c]), abs=1e-4)


@pytest.mark.parametrize("name", [
    "chi2_token_lang", "naive_bayes_langid",
])
def test_round3_wave28_oracle_parity(con, name):
    """Round-3 wave-28 queries (chi2 feature selection, multinomial
    Naive Bayes lang-id) match their DuckDB oracles at sf0.001."""
    import __ray_entry__ as e

    _check(e.queries()[name](SF), e.oracle_sql()[name], con)


def test_naive_bayes_langid_local_reference():
    """Engine predictions == a single-process NumPy multinomial NB
    (Laplace alpha=1) trained on the same corpus; and the classifier
    beats the majority-class baseline (it is trained on the labels)."""
    import numpy as np

    from granulate_char_ocr_ray.pipelines.analysis import (
        naive_bayes_langid)

    got = naive_bayes_langid(SF).to_pandas()
    df = pd.read_parquet(f"{SF}/documents.parquet",
                         columns=["doc_id", "text", "lang"])
    df = df[df["text"].str.strip() != ""]
    toks = df["text"].str.strip().str.lower().str.split()
    langs = sorted(df["lang"].unique())
    vocab = sorted({t for ts in toks for t in ts})
    vi = {t: i for i, t in enumerate(vocab)}
    li = {g: i for i, g in enumerate(langs)}
    cmat = np.zeros((len(vocab), len(langs)))
    for ts, g in zip(toks, df["lang"]):
        for t in ts:
            cmat[vi[t], li[g]] += 1
    lnp = np.log((cmat + 1.0) / (cmat.sum(0) + len(vocab)))
    pri = np.log(df["lang"].value_counts()[langs].to_numpy()
                 / len(df))
    preds = []
    for ts in toks:
        s = pri + sum(lnp[vi[t]] for t in ts)
        preds.append(langs[int(np.argmax(s))])
    ref = pd.DataFrame({"doc_id": df["doc_id"].to_numpy(),
                        "pred_lang": preds}).sort_values("doc_id")
    got = got.sort_values("doc_id")
    assert list(got["doc_id"]) == list(ref["doc_id"])
    assert list(got["pred_lang"]) == list(ref["pred_lang"])
    maj = df["lang"].value_counts().iloc[0] / len(df)
    assert got["is_correct"].mean() > maj


def test_chi2_token_lang_definition():
    """chi2 of the top-ranked token recomputed from the 2x2
    document-presence contingency table; k rows per lang."""
    from granulate_char_ocr_ray.pipelines.analysis import (
        chi2_token_lang)

    got = chi2_token_lang(SF).to_pandas()
    df = pd.read_parquet(f"{SF}/documents.parquet",
                         columns=["doc_id", "text", "lang"])
    assert (got.groupby("lang").size() <= 10).all()
    pres = (df.assign(tok=df["text"].str.strip().str.lower()
                      .str.split())
            .explode("tok")[["doc_id", "lang", "tok"]]
            .drop_duplicates())
    n = df["doc_id"].nunique()
    for _, r in got.groupby("lang").head(1).iterrows():
        sub = pres[pres["tok"] == r["tok"]]
        a = len(sub[sub["lang"] == r["lang"]])
        ta = len(sub)
        nl = (df["lang"] == r["lang"]).sum()
        b, c = nl - a, ta - a
        d = n - nl - c
        chi2 = n * (a * d - b * c) ** 2 / (
            nl * (n - nl) * ta * (n - ta))
        assert r["df_lang"] == a
        assert r["chi2"] == pytest.approx(chi2, rel=1e-3)


def test_jarowinkler_name_dups_oracle_parity(con):
    """Engine JW fuzzy-pair join matches the DuckDB cross-join oracle
    at sf0.001 (bit-exact kernel; same tau filter and ordering)."""
    import __ray_entry__ as e

    _check(e.queries()["jarowinkler_name_dups"](SF),
           e.oracle_sql()["jarowinkler_name_dups"], con)


@pytest.mark.parametrize("name", [
    "ndcg_retrieval_eval", "lineitem_price_ols",
])
def test_round3_wave30_oracle_parity(con, name):
    """Round-3 wave-30 queries (NDCG@k/MRR@k IR evaluation,
    closed-form multi-feature OLS) match their DuckDB oracles."""
    import __ray_entry__ as e

    _check(e.queries()[name](SF), e.oracle_sql()[name], con)


def test_lineitem_price_ols_matches_lstsq():
    """Cramer-rule coefficients == numpy.linalg.lstsq on the full
    design matrix; r2 == 1 - SSE/SST recomputed from residuals."""
    import numpy as np

    from granulate_char_ocr_ray.pipelines.relational import (
        lineitem_price_ols)

    got = lineitem_price_ols(SF).to_pandas().iloc[0]
    df = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_quantity", "l_discount",
                                  "l_extendedprice"])
    X = np.column_stack([np.ones(len(df)), df["l_quantity"],
                         df["l_discount"]])
    y = df["l_extendedprice"].to_numpy(np.float64)
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    assert got["n"] == len(df)
    assert got["b0"] == pytest.approx(beta[0], abs=1e-4)
    assert got["b1"] == pytest.approx(beta[1], abs=1e-4)
    assert got["b2"] == pytest.approx(beta[2], abs=1e-4)
    resid = y - X @ beta
    r2 = 1.0 - (resid ** 2).sum() / ((y - y.mean()) ** 2).sum()
    assert got["r2"] == pytest.approx(r2, abs=1e-5)


def test_ndcg_retrieval_eval_brute_force():
    """NDCG@k and MRR@k recomputed single-process from the full
    BM25 scoring of the corpus."""
    import numpy as np

    from granulate_char_ocr_ray.pipelines.analysis import (
        ndcg_retrieval_eval)

    got = ndcg_retrieval_eval(SF).to_pandas().iloc[0]
    df = pd.read_parquet(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"])
    df = df[df["text"].str.strip() != ""]
    toks = df["text"].str.strip().str.split()
    terms = ("spark", "hash", "window")
    tf = np.array([[ts.count(t) for t in terms] for ts in toks],
                  dtype=np.float64)
    dl = toks.map(len).to_numpy(np.float64)
    n, avgdl = float(len(df)), dl.mean()
    dfreq = (tf > 0).sum(0).astype(np.float64)
    idf = np.log((n - dfreq + 0.5) / (dfreq + 0.5) + 1.0)
    norm = 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)
    score = (idf * tf * 2.2 / (tf + norm[:, None])).sum(1)
    rel = tf.sum(1)
    order = np.lexsort((df["doc_id"].to_numpy(), -score))[:20]
    iorder = np.lexsort((df["doc_id"].to_numpy(), -rel))[:20]
    disc = np.log2(np.arange(1, 21) + 1.0)
    dcg = ((2.0 ** rel[order] - 1) / disc).sum()
    idcg = ((2.0 ** rel[iorder] - 1) / disc).sum()
    hits = np.nonzero(rel[order] > 0)[0]
    mrr = 1.0 / (hits[0] + 1) if len(hits) else 0.0
    assert got["ndcg_at_k"] == pytest.approx(dcg / idcg, abs=1e-5)
    assert got["mrr_at_k"] == pytest.approx(mrr, abs=1e-6)
    assert got["n_rel_at_k"] == int((rel[order] > 0).sum())


@pytest.mark.parametrize("name", [
    "ab_conversion_ztest", "conformal_length_bounds",
])
def test_round3_wave31_oracle_parity(con, name):
    """Round-3 wave-31 queries (two-proportion z-test, split-conformal
    length bounds) match their DuckDB oracles at sf0.001."""
    import __ray_entry__ as e

    _check(e.queries()[name](SF), e.oracle_sql()[name], con)


def test_conformal_coverage_guarantee():
    """Split-conformal marginal validity: per-lang held-out coverage
    is near 1 - alpha (finite-sample: >= 1 - alpha - slack with the
    plus side bounded too; slack sized for the small fixture)."""
    from granulate_char_ocr_ray.pipelines.analysis import (
        conformal_length_bounds)

    got = conformal_length_bounds(SF).to_pandas()
    assert len(got) >= 3
    # small-n fixtures: allow a generous band around 0.9
    assert (got["coverage"] >= 0.75).all()
    assert (got["q_hat"] > 0).all()
    assert (got["n_calib"] + got["n_test"] > 0).all()


def test_ab_ztest_pooled_definition():
    """z recomputed from the raw per-user conversion flags and the
    Knuth split."""
    import numpy as np

    from granulate_char_ocr_ray.pipelines.events import (
        ab_conversion_ztest)

    got = ab_conversion_ztest(SF).to_pandas().iloc[0]
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "event_type"])
    g = ev.groupby("user_id")["event_type"]
    conv = (g.apply(lambda s: (s == "purchase").sum()
                    > (s == "view").sum()))
    u = conv.index.to_numpy(np.uint64)
    var = (u * np.uint64(2654435761)) % np.uint64(1 << 32) \
        % np.uint64(2)
    n0, n1 = float((var == 0).sum()), float((var == 1).sum())
    c0 = float(conv.to_numpy()[var == 0].sum())
    c1 = float(conv.to_numpy()[var == 1].sum())
    pp = (c0 + c1) / (n0 + n1)
    if pp <= 0.0 or pp >= 1.0:
        z = 0.0  # degenerate pool: engine reports z = 0 by contract
    else:
        z = (c0 / n0 - c1 / n1) / np.sqrt(
            pp * (1 - pp) * (1 / n0 + 1 / n1))
    assert got["n0"] == n0 and got["n1"] == n1
    assert got["z"] == pytest.approx(z, abs=1e-6)


def test_pruned_orderkey_revenue_oracle_parity(con):
    """Zone-map-pruned range scan matches the plain WHERE oracle."""
    import __ray_entry__ as e

    _check(e.queries()["pruned_orderkey_revenue"](SF),
           e.oracle_sql()["pruned_orderkey_revenue"], con)


def test_from_arrow_empty_keeps_schema():
    """Regression (round-3 red gate): Ray 2.49 drops 0-row blocks in
    Dataset.to_pandas(), collapsing empty results to (0, 0) frames.
    sources/storage.from_arrow must keep the columns."""
    import pyarrow as pa

    from granulate_char_ocr_ray.sources.storage import from_arrow

    empty = pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.string())})
    df = from_arrow(empty).to_pandas()
    assert df.shape == (0, 2) and list(df.columns) == ["a", "b"]
    # non-empty tables are untouched plain Datasets
    one = pa.table({"a": [1]})
    assert from_arrow(one).to_pandas().shape == (1, 1)


def test_to_pandas_keep_schema_survives_derivation():
    """ADVICE r04 #5: the from_arrow class swap does NOT propagate
    through derived datasets (map_batches reverts to plain Dataset, so
    a 0-row to_pandas loses columns again). to_pandas_keep_schema is
    the explicit-schema collection helper for that case."""
    import pyarrow as pa

    from granulate_char_ocr_ray.sources.storage import (
        from_arrow, to_pandas_keep_schema)

    empty = pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.string())})
    derived = from_arrow(empty).map_batches(
        lambda t: t, batch_format="pyarrow")
    # demonstrate the hazard the helper exists for...
    assert derived.to_pandas().shape[1] == 0
    # ...and the fix
    df = to_pandas_keep_schema(derived, empty.schema)
    assert df.shape == (0, 2) and list(df.columns) == ["a", "b"]
    # non-empty derived datasets pass through untouched
    one = from_arrow(pa.table({"a": [1], "b": ["x"]})).map_batches(
        lambda t: t, batch_format="pyarrow")
    assert to_pandas_keep_schema(one, empty.schema).shape == (1, 2)


def test_rowgroup_pruning_actually_prunes():
    """The min-max index selects a strict subset of row groups on a
    clustered layout, the pruned read returns exactly the range's
    rows, and the empty-range read returns a schema-carrying empty
    dataset."""
    import os

    from granulate_char_ocr_ray.sources.storage import (
        read_rowgroups_pruned, read_table, rowgroup_minmax_index,
        write_clustered)

    out = "/tmp/test_zonemap/lineitem"
    if not os.path.exists(out):
        write_clustered(
            read_table(f"{SF}/lineitem.parquet",
                       columns=["l_orderkey", "l_extendedprice"]),
            out, "l_orderkey", row_group_size=500)
    idx = rowgroup_minmax_index(out, "l_orderkey").to_pandas()
    assert len(idx) > 3
    ds, stats = read_rowgroups_pruned(out, "l_orderkey", 100, 299)
    assert stats["selected_row_groups"] < stats["total_row_groups"]
    df = ds.to_pandas()
    k = df["l_orderkey"]
    exact = pd.read_parquet(f"{SF}/lineitem.parquet",
                            columns=["l_orderkey"])["l_orderkey"]
    want = int(((exact >= 100) & (exact <= 299)).sum())
    assert int(((k >= 100) & (k <= 299)).sum()) == want
    empty, st2 = read_rowgroups_pruned(out, "l_orderkey",
                                       10**9, 2 * 10**9)
    assert st2["selected_row_groups"] == 0
    edf = empty.to_pandas()
    assert len(edf) == 0 and "l_orderkey" in edf.columns


def test_pruned_orderkey_revenue_small_range(con):
    """A range that exists at sf0.001 matches the parameterized
    oracle row-for-row."""
    from granulate_char_ocr_ray.pipelines.relational import (
        pruned_orderkey_revenue)

    _check(pruned_orderkey_revenue(SF, 100, 299), """
        SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_items,
               round(CAST(sum(CAST(round(l_extendedprice * 100)
                                   AS BIGINT)) AS DOUBLE)
                     / 100.0, 2) AS sum_price
        FROM lineitem WHERE l_orderkey BETWEEN 100 AND 299
        GROUP BY 1 ORDER BY 1""", con)


def test_dup_length_bias_definition():
    """Point-biserial corr matches a direct pandas computation."""
    from granulate_char_ocr_ray.pipelines.analysis import dup_length_bias

    got = dup_length_bias(SF).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["text", "n_chars"])
    flag = docs.groupby(docs["text"].str[:64])["n_chars"] \
               .transform("size").gt(1).astype(float)
    y = docs["n_chars"].astype(float)
    import numpy as np

    want_corr = np.corrcoef(flag, y)[0, 1]
    assert int(got["n_dups"][0]) == int(flag.sum())
    assert abs(got["corr_dup_len"][0] - want_corr) < 1e-6
    assert abs(got["mean_chars_dup"][0] - y[flag == 1].mean()) < 1e-4
    assert abs(got["mean_chars_uniq"][0] - y[flag == 0].mean()) < 1e-4

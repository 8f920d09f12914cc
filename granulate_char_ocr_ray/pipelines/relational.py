"""Relational pipelines over the TPC-H-ish tables: grouped aggregates
with explicit partial pre-aggregation, broadcast joins, top-k. These
generalize the reference's evaluation aggregates (G2-G4: global stats,
grouped stats, pair counts + top-10, ``evaluate_new_testdata.py:82-163``)
to the standard relational shapes the engine must serve.

Scale patterns demonstrated here:
- partial aggregation inside map_batches so the groupby shuffles one
  row per (block, key) instead of one per input row;
- dimension tables (customer, nation) broadcast once via ray.put and
  joined with a vectorized pandas merge per batch — no shuffle join;
- top-k via per-block partials + tiny global sort.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.dataset as pads
import ray
import ray.data as rd

from ..functions.tables import table_from_pandas
from ray.data.aggregate import Sum

from ..functions.numeric import round_half_up

from ..sources.storage import read_table


def q1_pricing_summary(sf_dir: str, cutoff: str = "1998-09-02") -> rd.Dataset:
    """TPC-H Q1 shape: filtered lineitem grouped by (returnflag,
    linestatus) with sum/avg/count. The date filter is pushed into the
    parquet read (row-group pruning); partial sums are computed per
    batch so the shuffle is tiny. Money aggregates rounded to 2."""
    cutoff_ts = np.datetime64(cutoff + "T23:59:59.999999")
    ds = read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
                 "l_discount", "l_tax", "l_shipdate"],
        filter_expr=pads.field("l_shipdate") <= cutoff_ts,
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df[df["l_shipdate"] <= pd.Timestamp(cutoff + " 23:59:59.999999")]
        df["disc_price"] = df["l_extendedprice"] * (1 - df["l_discount"])
        df["charge"] = df["disc_price"] * (1 + df["l_tax"])
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("l_quantity", "sum"),
            sum_base_price=("l_extendedprice", "sum"),
            sum_disc_price=("disc_price", "sum"),
            sum_charge=("charge", "sum"),
            sum_disc=("l_discount", "sum"),
            count_order=("l_quantity", "size"),
        )
        return table_from_pandas(g, preserve_index=False)

    # partials: one row per (block, key); coalesce before the shuffle so
    # the sort-based aggregate does not pay per-block overhead at low key
    # cardinality (6 groups)
    part = ds.map_batches(partial, batch_format="pyarrow").repartition(4)
    agg = part.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty", alias_name="sum_qty"),
        Sum("sum_base_price", alias_name="sum_base_price"),
        Sum("sum_disc_price", alias_name="sum_disc_price"),
        Sum("sum_charge", alias_name="sum_charge"),
        Sum("sum_disc", alias_name="sum_disc"),
        Sum("count_order", alias_name="count_order"),
    )

    def final(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        n = df["count_order"].astype(np.float64)
        out = pd.DataFrame(
            {
                "l_returnflag": df["l_returnflag"],
                "l_linestatus": df["l_linestatus"],
                "sum_qty": round_half_up(df["sum_qty"], 2),
                "sum_base_price": round_half_up(df["sum_base_price"], 2),
                "sum_disc_price": round_half_up(df["sum_disc_price"], 2),
                "sum_charge": round_half_up(df["sum_charge"], 2),
                "avg_qty": round_half_up(df["sum_qty"] / n, 2),
                "avg_price": round_half_up(df["sum_base_price"] / n, 2),
                "avg_disc": round_half_up(df["sum_disc"] / n, 4),
                "count_order": df["count_order"],
            }
        )
        return table_from_pandas(out, preserve_index=False)

    return agg.map_batches(final, batch_format="pyarrow")


def top_event_types(sf_dir: str) -> rd.Dataset:
    """Event-type frequency + mean value, sorted desc — the confusion
    pair-count + top-k shape (G4, evaluate_new_testdata.py:137-163)."""
    ds = read_table(f"{sf_dir}/events.parquet", columns=["event_type", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("event_type", as_index=False).agg(
            n_events=("value", "size"), sum_value=("value", "sum")
        )
        return table_from_pandas(g, preserve_index=False)

    agg = ds.map_batches(partial, batch_format="pyarrow").repartition(4).groupby("event_type").aggregate(
        Sum("n_events", alias_name="n_events"), Sum("sum_value", alias_name="sum_value")
    )

    def final(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["avg_value"] = round_half_up(df["sum_value"] / df["n_events"], 2)
        return table_from_pandas(
            df[["event_type", "n_events", "avg_value"]], preserve_index=False
        )

    return agg.map_batches(final, batch_format="pyarrow").sort(
        ["n_events", "event_type"], descending=[True, False]
    )


from ..sources.storage import parquet_num_rows as _parquet_num_rows


# build sides below this row count broadcast (the
# autoBroadcastJoinThreshold pattern); larger sides take the
# partitioned hash join. Both plans are hash-identical (tested).
BROADCAST_ROW_THRESHOLD = 1_000_000


def revenue_by_nation(sf_dir: str,
                      broadcast_threshold: int = BROADCAST_ROW_THRESHOLD
                      ) -> rd.Dataset:
    """Total order value per customer nation.

    CUSTOMER is a fact-sized table at TPC-H scale, not a dimension
    (round-1 review item #5). The plan dispatches on the build side's
    parquet-metadata row count: below ``broadcast_threshold`` the
    custkey->nationkey map broadcasts once via ray.put (cheap constant);
    above it, orders x customer runs as a partitioned hash join
    (stages/join.partitioned_join) with per-bucket pre-aggregation —
    never a driver-side pandas frame either way. Only the genuinely-tiny
    NATION table (25 rows) rides in the closure. Both plans produce
    hash-identical output (tested at sf0.001)."""
    from ..stages.join import partitioned_join

    nation = pads.dataset(f"{sf_dir}/nation.parquet").to_table(
        columns=["n_nationkey", "n_name"]).to_pandas()
    nation_map = dict(zip(nation["n_nationkey"], nation["n_name"]))

    orders = read_table(f"{sf_dir}/orders.parquet",
                        columns=["o_custkey", "o_totalprice"])

    if _parquet_num_rows(f"{sf_dir}/customer.parquet") <= broadcast_threshold:
        cust_t = pads.dataset(f"{sf_dir}/customer.parquet").to_table(
            columns=["c_custkey", "c_nationkey"])
        lookup_ref = ray.put(dict(zip(
            cust_t.column("c_custkey").to_pylist(),
            (nation_map[k] for k in cust_t.column("c_nationkey").to_pylist()))))

        def partial(batch: pa.Table) -> pa.Table:
            lookup = ray.get(lookup_ref)
            df = batch.to_pandas()
            df["n_name"] = df["o_custkey"].map(lookup)
            g = df.groupby("n_name", as_index=False).agg(
                revenue=("o_totalprice", "sum"),
                n_orders=("o_totalprice", "size"))
            return table_from_pandas(g, preserve_index=False)

        part = orders.map_batches(partial, batch_format="pyarrow")
    else:
        cust = read_table(f"{sf_dir}/customer.parquet",
                          columns=["c_custkey", "c_nationkey"])

        def join_agg(o_df: pd.DataFrame, c_df: pd.DataFrame) -> pd.DataFrame:
            m = o_df.merge(c_df, left_on="o_custkey", right_on="c_custkey",
                           how="inner")
            m["n_name"] = m["c_nationkey"].map(nation_map)
            return m.groupby("n_name", as_index=False).agg(
                revenue=("o_totalprice", "sum"),
                n_orders=("o_totalprice", "size"))

        part = partitioned_join(
            orders, cust, "o_custkey", "c_custkey", join_agg,
            left_schema=pa.schema([("o_custkey", pa.int64()),
                                   ("o_totalprice", pa.float64())]),
            right_schema=pa.schema([("c_custkey", pa.int64()),
                                    ("c_nationkey", pa.int64())]))
    agg = part.repartition(4).groupby("n_name").aggregate(
        Sum("revenue", alias_name="revenue"), Sum("n_orders", alias_name="n_orders")
    )

    def final(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["revenue"] = round_half_up(df["revenue"], 2)
        return table_from_pandas(
            df[["n_name", "revenue", "n_orders"]], preserve_index=False
        )

    return agg.map_batches(final, batch_format="pyarrow")


def part_brand_stats(sf_dir: str) -> rd.Dataset:
    """Per-brand part stats (count, avg retail price, max size)."""
    from ray.data.aggregate import Max

    ds = read_table(f"{sf_dir}/part.parquet",
                    columns=["p_brand", "p_retailprice", "p_size"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("p_brand", as_index=False).agg(
            n_parts=("p_retailprice", "size"),
            sum_price=("p_retailprice", "sum"),
            max_size=("p_size", "max"),
        )
        return table_from_pandas(g, preserve_index=False)

    agg = ds.map_batches(partial, batch_format="pyarrow").repartition(4).groupby("p_brand").aggregate(
        Sum("n_parts", alias_name="n_parts"),
        Sum("sum_price", alias_name="sum_price"),
        Max("max_size", alias_name="max_size"),
    )

    def final(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["avg_price"] = round_half_up(df["sum_price"] / df["n_parts"], 2)
        return table_from_pandas(
            df[["p_brand", "n_parts", "avg_price", "max_size"]], preserve_index=False
        )

    return agg.map_batches(final, batch_format="pyarrow")


def q6_revenue(sf_dir: str, year: str = "1997") -> rd.Dataset:
    """TPC-H Q6 shape: single-row filtered aggregate with read-time
    predicate pushdown (shipdate within ``year``, discount in
    [0.05, 0.07], quantity < 24). Output: (revenue, n_rows)."""
    lo = np.datetime64(f"{year}-01-01", "us")
    hi = np.datetime64(f"{int(year) + 1}-01-01", "us")
    ds = read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_extendedprice", "l_discount", "l_quantity", "l_shipdate"],
        filter_expr=(pads.field("l_shipdate") >= lo) & (pads.field("l_shipdate") < hi),
    )

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df[
            (df["l_shipdate"] >= pd.Timestamp(str(lo)))
            & (df["l_shipdate"] < pd.Timestamp(str(hi)))
            & (df["l_discount"] >= 0.05)
            & (df["l_discount"] <= 0.07)
            & (df["l_quantity"] < 24)
        ]
        return pa.Table.from_pydict(
            {
                "key": [1],
                "rev": [float((df["l_extendedprice"] * df["l_discount"]).sum())],
                "n": [len(df)],
            }
        )

    agg = ds.map_batches(partial, batch_format="pyarrow").repartition(2).groupby(
        "key"
    ).aggregate(Sum("rev", alias_name="rev"), Sum("n", alias_name="n"))

    def final(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        return pa.Table.from_pydict(
            {
                "revenue": round_half_up(df["rev"], 2),
                "n_rows": df["n"].astype(np.int64),
            }
        )

    return agg.map_batches(final, batch_format="pyarrow")


def q3_shipping_priority(sf_dir: str, segment: str = "BUILDING",
                         cutoff: str = "1998-01-01", k: int = 10,
                         broadcast_threshold: int = BROADCAST_ROW_THRESHOLD
                         ) -> rd.Dataset:
    """TPC-H Q3 shape: 3-table join via two broadcast semi-joins, then a
    grouped revenue top-k.

    customer (segment filter) -> broadcast custkey set -> orders filter
    (semi-join, o_orderdate < cutoff) -> broadcast orderkey->orderdate
    map -> lineitem filter (l_shipdate > cutoff) + revenue -> hash agg
    by (l_orderkey, o_orderdate) -> top-k by rounded revenue
    (tie-break l_orderkey). At 100TB the orderkey map becomes a
    hash-partitioned join; the semi-join side stays a broadcast (or a
    Bloom filter)."""
    from ..stages.hashagg import hash_groupby_agg

    from ..stages.join import partitioned_join

    cutoff_ts = pd.Timestamp(cutoff)
    # semi-join side: segment-filtered custkeys are a genuinely small
    # fraction of one dimension-ish table -> broadcast the key SET once
    # (VERDICT r01: "the semi-join side stays a broadcast"); at extreme
    # scale this set becomes a Bloom filter (see media.docs_without_media)
    cust = pads.dataset(f"{sf_dir}/customer.parquet").to_table(
        columns=["c_custkey", "c_mktsegment"],
        filter=pads.field("c_mktsegment") == segment,
    )
    custkeys_ref = ray.put(
        np.sort(cust.column("c_custkey").to_numpy(zero_copy_only=False)))

    # orders stay DISTRIBUTED: date filter pushed to the read, semi-join
    # against the broadcast key set inside map_batches (round-1 review
    # item #5 removed the driver pandas materialization + odate dict)
    orders = read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter_expr=pads.field("o_orderdate") < np.datetime64(cutoff, "us"),
    )

    def semi(batch: pa.Table) -> pa.Table:
        keys = ray.get(custkeys_ref)
        ck = batch.column("o_custkey").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(keys, ck)
        pos[pos >= len(keys)] = len(keys) - 1 if len(keys) else 0
        mask = (keys[pos] == ck) if len(keys) else np.zeros(len(ck), bool)
        return batch.filter(pa.array(mask)).select(
            ["o_orderkey", "o_orderdate"])

    orders_f = orders.map_batches(semi, batch_format="pyarrow")

    items = read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter_expr=pads.field("l_shipdate") > np.datetime64(cutoff, "us"),
    )

    if _parquet_num_rows(f"{sf_dir}/orders.parquet") <= broadcast_threshold:
        # small-orders plan: collect the (already distributed-filtered)
        # orderkey->orderdate pairs, broadcast once, vectorized probe
        # per lineitem batch. Bounded by the threshold — never an
        # unconditional driver materialization (round-1 review item).
        o_df = orders_f.to_pandas()
        keys = o_df["o_orderkey"].to_numpy(dtype=np.int64)
        order_sort = np.argsort(keys)
        odate_ref = ray.put((keys[order_sort],
                             o_df["o_orderdate"].to_numpy()[order_sort]))

        def join_probe(batch: pa.Table) -> pa.Table:
            ks, dates = ray.get(odate_ref)
            df = batch.to_pandas()
            df = df[df["l_shipdate"] > cutoff_ts]
            lk = df["l_orderkey"].to_numpy(dtype=np.int64)
            pos = np.searchsorted(ks, lk)
            pos[pos >= len(ks)] = len(ks) - 1 if len(ks) else 0
            hit = (ks[pos] == lk) if len(ks) else np.zeros(len(lk), bool)
            df = df[hit]
            df["o_orderdate"] = dates[pos[hit]]
            df["rev"] = df["l_extendedprice"] * (1 - df["l_discount"])
            g = df.groupby(["l_orderkey", "o_orderdate"], as_index=False).agg(
                rev=("rev", "sum"))
            return table_from_pandas(g, preserve_index=False)

        partial = items.map_batches(join_probe, batch_format="pyarrow")
        agg = hash_groupby_agg(partial, ["l_orderkey", "o_orderdate"],
                               {"rev": ("rev", "sum")}, num_parts=16)
    else:
        def join_agg(o_df: pd.DataFrame, l_df: pd.DataFrame) -> pd.DataFrame:
            l_df = l_df[l_df["l_shipdate"] > cutoff_ts]
            m = l_df.merge(o_df, left_on="l_orderkey", right_on="o_orderkey",
                           how="inner")
            m["rev"] = m["l_extendedprice"] * (1 - m["l_discount"])
            # an orderkey lives in exactly one bucket -> this per-bucket
            # aggregate IS the full groupby for its keys (no 2nd shuffle)
            return m.groupby(["l_orderkey", "o_orderdate"],
                             as_index=False).agg(rev=("rev", "sum"))

        agg = partitioned_join(
            orders_f, items, "o_orderkey", "l_orderkey", join_agg,
            left_schema=pa.schema([("o_orderkey", pa.int64()),
                                   ("o_orderdate", pa.timestamp("us"))]),
            right_schema=pa.schema([("l_orderkey", pa.int64()),
                                    ("l_extendedprice", pa.float64()),
                                    ("l_discount", pa.float64()),
                                    ("l_shipdate", pa.timestamp("us"))]))

    def final(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["revenue"] = round_half_up(df["rev"], 2)
        return table_from_pandas(
            df[["l_orderkey", "o_orderdate", "revenue"]], preserve_index=False
        )

    return agg.map_batches(final, batch_format="pyarrow").sort(
        ["revenue", "l_orderkey"], descending=[True, False]
    ).limit(k)


def modal_event_type_per_user(sf_dir: str) -> rd.Dataset:
    """Per-user modal (most frequent) event type — the per-group
    majority-vote aggregate (G5; reference analog: per-circle color
    vote, extract_from_reference.py:352-356). Ties break to the
    alphabetically-first event type; output (user_id,
    modal_event_type, modal_event_type_count)."""
    from ..stages.hashagg import hash_groupby_mode

    ds = read_table(f"{sf_dir}/events.parquet",
                    columns=["user_id", "event_type"])
    return hash_groupby_mode(ds, ["user_id"], "event_type",
                             out_col="modal_event_type").sort("user_id")


def sample_docs(sf_dir: str, pct: int = 10) -> rd.Dataset:
    """Deterministic random sample (O5): keep a doc iff
    ``(doc_id * 2654435761) mod 2^32 mod 100 < pct`` — Knuth's
    multiplicative hash, closed-form reproducible in ANSI SQL so the
    sample is hash-verifiable (a seeded RNG sample would be
    order-dependent). Reference analog: train/test random_split,
    train_cnn_model.py:334-340; ``train_test_split`` below derives both
    halves from the same hash so they partition the corpus exactly."""
    ds = read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            h = (ids.astype(np.uint64) * np.uint64(2654435761)) \
                % np.uint64(1 << 32) % np.uint64(100)
        return batch.filter(pa.array(h < pct))

    return ds.map_batches(keep, batch_format="pyarrow").repartition(4).sort("doc_id")


def stratified_sample_docs(sf_dir: str, k: int = 5) -> rd.Dataset:
    """Stratified deterministic sample (O5 grouped variant): the k
    docs with the smallest Knuth multiplicative hash PER LANGUAGE —
    per-stratum sampling with a closed-form, SQL-reproducible rank
    (reference analog: per-class balanced sampling for training
    splits, train_cnn_model.py:334-340).

    Scale plan: every block keeps only its k smallest (hash, doc_id)
    rows per stratum — a partial top-k — so at most
    k x |strata| x |blocks| rows leave the scan; the final per-stratum
    rank runs on that tiny set. Output: (lang, doc_id, rk) with
    rk = 1..k in hash order, ordered by (lang, rk)."""
    ds = read_table(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "lang"])

    def hashed(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(dtype=np.int64)
        with np.errstate(over="ignore"):
            h = (ids.astype(np.uint64) * np.uint64(2654435761)) \
                % np.uint64(1 << 32)
        out = pd.DataFrame({"lang": df["lang"], "doc_id": ids,
                            "h": h.astype(np.int64)})
        return (out.sort_values(["h", "doc_id"])
                .groupby("lang", as_index=False).head(k))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["lang", "h", "doc_id"])
        df = df.groupby("lang", as_index=False).head(k).copy()
        df["rk"] = df.groupby("lang").cumcount() + 1
        return df[["lang", "doc_id", "rk"]].astype(
            {"doc_id": np.int64, "rk": np.int64})

    return (ds.map_batches(hashed, batch_format="pandas")
            .repartition(1).map_batches(final, batch_format="pandas")
            .sort(["lang", "rk"]))


def weighted_sample_docs(sf_dir: str, k: int = 20) -> rd.Dataset:
    """Weighted priority sample (Efraimidis–Spirakis A-Res): the k docs
    with the largest priority u^(1/w), u = deterministic doc hash in
    (0,1], w = doc length — longer docs proportionally likelier, yet
    the whole draw is closed-form reproducible in SQL (a seeded RNG
    would be order-dependent).

    Scale plan: priorities are computed vectorized per block and each
    block forwards only its local top-k — the A-Res property that the
    global top-k of priorities IS the weighted sample makes this a
    one-pass, k-x-blocks-shuffle operator. Output: (doc_id, priority
    rounded to 12) ordered by rank."""
    ds = read_table(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "n_chars"])

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(dtype=np.int64)
        w = df["n_chars"].to_numpy(dtype=np.float64)
        with np.errstate(over="ignore"):
            h = (ids.astype(np.uint64) * np.uint64(2654435761)) \
                % np.uint64(1 << 32)
        u = (h.astype(np.float64) + 1.0) / float(1 << 32)
        pr = u ** (1.0 / np.maximum(w, 1.0))
        out = pd.DataFrame({"doc_id": ids, "priority": pr})
        return out.sort_values(["priority", "doc_id"],
                               ascending=[False, True]).head(k)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["priority", "doc_id"],
                            ascending=[False, True]).head(k)
        return pd.DataFrame({
            "doc_id": df["doc_id"].astype(np.int64),
            "priority": round_half_up(df["priority"].to_numpy(), 12)})

    return (ds.map_batches(local_topk, batch_format="pandas")
            .repartition(1).map_batches(final, batch_format="pandas"))


def lineitem_audit(sf_dir: str) -> rd.Dataset:
    """Data-quality audit (the validation pass a pipeline runs before
    training ingest): per numeric column, row count, null count, min
    and max — one streaming pass, mergeable per-block partials, one
    tiny |columns|-row shuffle. Output: (col, n_rows, n_nulls,
    min_val, max_val) ordered by col."""
    from ..stages.hashagg import hash_groupby_agg

    cols = ["l_discount", "l_extendedprice", "l_quantity", "l_tax"]
    ds = read_table(f"{sf_dir}/lineitem.parquet", columns=cols)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for c in cols:
            v = df[c]
            rows.append({"col": c, "n_rows": len(v),
                         "n_nulls": int(v.isna().sum()),
                         "min_val": float(v.min()),
                         "max_val": float(v.max())})
        return pd.DataFrame(rows)

    agg = hash_groupby_agg(
        ds.map_batches(partial, batch_format="pandas"), ["col"],
        {"n_rows": ("n_rows", "sum"), "n_nulls": ("n_nulls", "sum"),
         "min_val": ("min_val", "min"), "max_val": ("max_val", "max")},
        num_parts=2)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "col": df["col"],
            "n_rows": df["n_rows"].astype(np.int64),
            "n_nulls": df["n_nulls"].astype(np.int64),
            "min_val": round_half_up(df["min_val"].to_numpy(), 4),
            "max_val": round_half_up(df["max_val"].to_numpy(), 4)})

    return agg.map_batches(final, batch_format="pandas").sort("col")


def train_test_split(sf_dir: str, test_pct: int = 20
                     ) -> tuple[rd.Dataset, rd.Dataset]:
    """Deterministic (train, test) split by the sample_docs hash: the
    two halves partition the corpus exactly (tested)."""
    ds = read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def part(batch: pa.Table, want_test: bool) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            h = (ids.astype(np.uint64) * np.uint64(2654435761)) \
                % np.uint64(1 << 32) % np.uint64(100)
        mask = (h < test_pct) if want_test else (h >= test_pct)
        return batch.filter(pa.array(mask))

    train = ds.map_batches(part, batch_format="pyarrow",
                           fn_kwargs={"want_test": False})
    test = ds.map_batches(part, batch_format="pyarrow",
                          fn_kwargs={"want_test": True})
    return train, test


def top_parts_per_brand(sf_dir: str, k: int = 2) -> rd.Dataset:
    """Grouped top-k (window-rank shape): the k most expensive parts per
    brand, ties broken by p_partkey. groupby(brand) -> per-group sorted
    head inside map_groups — the distributed equivalent of
    row_number() OVER (PARTITION BY brand ORDER BY price DESC)."""
    ds = read_table(f"{sf_dir}/part.parquet",
                    columns=["p_brand", "p_partkey", "p_retailprice"])

    def top(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["p_retailprice", "p_partkey"],
                          ascending=[False, True]).head(k)
        return g[["p_brand", "p_partkey", "p_retailprice"]]

    return ds.groupby("p_brand").map_groups(top, batch_format="pandas").sort(
        ["p_brand", "p_retailprice", "p_partkey"], descending=[False, True, False]
    )


def quantity_deciles(sf_dir: str) -> rd.Dataset:
    """Exact discrete quantiles of l_quantity via a distributed value
    histogram: per-batch value counts -> hash-aggregated global counts
    -> rank selection (rank = ceil(q * n), DuckDB quantile_disc
    semantics). Exact for any column with bounded distinct values; for
    continuous columns at scale this becomes a KLL/t-digest sketch."""
    from ..stages.hashagg import hash_groupby_agg

    qs = [round(0.1 * i, 1) for i in range(1, 10)]
    ds = read_table(f"{sf_dir}/lineitem.parquet", columns=["l_quantity"])

    def counts(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().groupby("l_quantity", as_index=False).size()
        return table_from_pandas(df.rename(columns={"size": "c"}),
                                    preserve_index=False)

    hist = hash_groupby_agg(
        ds.map_batches(counts, batch_format="pyarrow"),
        ["l_quantity"], {"c": ("c", "sum")}, num_parts=8,
    ).repartition(1)

    def select(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().sort_values("l_quantity")
        cum = df["c"].cumsum().to_numpy()
        n = int(cum[-1]) if len(cum) else 0
        vals = df["l_quantity"].to_numpy()
        out_q, out_v = [], []
        for q in qs:
            rank = int(np.ceil(q * n))
            idx = int(np.searchsorted(cum, rank))
            out_q.append(q)
            out_v.append(float(vals[idx]))
        return pa.Table.from_pydict(
            {"q": pa.array(out_q, pa.float64()), "value": pa.array(out_v, pa.float64())}
        )

    return hist.map_batches(select, batch_format="pyarrow")


def supplier_balance_by_nation(sf_dir: str) -> rd.Dataset:
    """Supplier account balances per nation (broadcast dim join +
    partial sums). Output: (n_name, n_suppliers, total_acctbal)."""
    nation = pads.dataset(f"{sf_dir}/nation.parquet").to_table(
        columns=["n_nationkey", "n_name"]).to_pandas()
    lookup_ref = ray.put(dict(zip(nation["n_nationkey"], nation["n_name"])))
    ds = read_table(f"{sf_dir}/supplier.parquet",
                    columns=["s_nationkey", "s_acctbal"])

    def partial(batch: pa.Table) -> pa.Table:
        lookup = ray.get(lookup_ref)
        df = batch.to_pandas()
        df["n_name"] = df["s_nationkey"].map(lookup)
        g = df.groupby("n_name", as_index=False).agg(
            n_suppliers=("s_acctbal", "size"), total_acctbal=("s_acctbal", "sum"))
        return table_from_pandas(g, preserve_index=False)

    agg = ds.map_batches(partial, batch_format="pyarrow").repartition(2).groupby(
        "n_name").aggregate(
        Sum("n_suppliers", alias_name="n_suppliers"),
        Sum("total_acctbal", alias_name="total_acctbal"))

    def final(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["n_suppliers"] = df["n_suppliers"].astype(np.int64)
        df["total_acctbal"] = round_half_up(df["total_acctbal"], 2)
        return table_from_pandas(df, preserve_index=False)

    return agg.map_batches(final, batch_format="pyarrow")


def customers_per_region(sf_dir: str) -> rd.Dataset:
    """Customer counts per region: two chained broadcast dimension
    joins (customer -> nation -> region). Output: (r_name, n_customers)."""
    nation = pads.dataset(f"{sf_dir}/nation.parquet").to_table(
        columns=["n_nationkey", "n_regionkey"]).to_pandas()
    region = pads.dataset(f"{sf_dir}/region.parquet").to_table(
        columns=["r_regionkey", "r_name"]).to_pandas()
    dim = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")
    lookup_ref = ray.put(dict(zip(dim["n_nationkey"], dim["r_name"])))
    ds = read_table(f"{sf_dir}/customer.parquet", columns=["c_nationkey"])

    def partial(batch: pa.Table) -> pa.Table:
        lookup = ray.get(lookup_ref)
        df = batch.to_pandas()
        df["r_name"] = df["c_nationkey"].map(lookup)
        g = df.groupby("r_name", as_index=False).size()
        return table_from_pandas(
            g.rename(columns={"size": "n_customers"}), preserve_index=False)

    agg = ds.map_batches(partial, batch_format="pyarrow").repartition(2).groupby(
        "r_name").aggregate(Sum("n_customers", alias_name="n_customers"))

    def final(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["n_customers"] = df["n_customers"].astype(np.int64)
        return table_from_pandas(df, preserve_index=False)

    return agg.map_batches(final, batch_format="pyarrow")


def order_item_totals(sf_dir: str, num_buckets: int = 32) -> rd.Dataset:
    """Large-large partitioned hash join: orders JOIN lineitem on
    orderkey with NO broadcast side.

    Both tables are tagged with ``bucket = orderkey % num_buckets`` and
    a side marker, unioned, shuffled once on the SMALL bucket key space,
    and joined per bucket with a vectorized pandas merge — the explicit
    partitioned hash-join pattern for two tables that both exceed
    broadcast size (skewed orderkeys would be salted into sub-buckets).
    Output: (o_orderkey, o_totalprice, n_items, items_value)."""
    orders = read_table(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_totalprice"])
    items = read_table(f"{sf_dir}/lineitem.parquet",
                       columns=["l_orderkey", "l_extendedprice"])

    def tag_orders(batch: pa.Table) -> pa.Table:
        key = batch.column("o_orderkey").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {
                "bucket": (key % num_buckets).astype(np.int64),
                "key": key.astype(np.int64),
                "price": batch.column("o_totalprice"),
                "is_order": pa.array(np.ones(len(key), dtype=bool)),
            }
        )

    def tag_items(batch: pa.Table) -> pa.Table:
        key = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {
                "bucket": (key % num_buckets).astype(np.int64),
                "key": key.astype(np.int64),
                "price": batch.column("l_extendedprice"),
                "is_order": pa.array(np.zeros(len(key), dtype=bool)),
            }
        )

    tagged = orders.map_batches(tag_orders, batch_format="pyarrow").union(
        items.map_batches(tag_items, batch_format="pyarrow")
    )

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["is_order"]]
        l = g[~g["is_order"]]
        agg = l.groupby("key", as_index=False).agg(
            n_items=("price", "size"), items_value=("price", "sum"))
        m = o.merge(agg, on="key", how="inner")
        return pd.DataFrame(
            {
                "o_orderkey": m["key"].astype(np.int64),
                "o_totalprice": m["price"],
                "n_items": m["n_items"].astype(np.int64),
                "items_value": round_half_up(m["items_value"], 2),
            }
        )

    return tagged.groupby("bucket").map_groups(join_bucket, batch_format="pandas")


def approx_quantity_deciles_by_flag(sf_dir: str) -> pa.Table:
    """GROUPED approximate quantiles: one mergeable KLL sketch per
    (block, returnflag), merged per key on the driver — the grouped
    counterpart of ``approx_quantity_deciles`` and the sketch-side
    mirror of ``quantity_deciles_by_flag`` (exact). The shuffle is
    |keys| x |blocks| serialized sketches (bounded size), never
    values; at high key cardinality the same sketch rows feed
    ``hash_groupby_agg``-style partitioned merging instead of the
    driver. Output: (l_returnflag, q, value) — rows-only under the
    driver gate (approximate by design; accuracy pytest bounds the
    rank error vs the exact grouped deciles)."""
    from ..functions.sketch import (
        kll_add,
        kll_create,
        kll_deserialize,
        kll_merge,
        kll_quantiles,
        kll_serialize,
    )

    ds = read_table(f"{sf_dir}/lineitem.parquet",
                    columns=["l_returnflag", "l_quantity"])

    def sketch_batch(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        flags, blobs = [], []
        for flag, g in df.groupby("l_returnflag"):
            sk = kll_create()
            kll_add(sk, g["l_quantity"].to_numpy())
            flags.append(flag)
            blobs.append(kll_serialize(sk))
        return pa.Table.from_pydict(
            {"flag": flags, "sketch": blobs},
            schema=pa.schema([("flag", pa.string()),
                              ("sketch", pa.binary())]))

    parts = ds.map_batches(sketch_batch, batch_format="pyarrow").to_pandas()
    qs = [round(0.1 * i, 1) for i in range(1, 10)]
    out_flag, out_q, out_v = [], [], []
    for flag in sorted(parts["flag"].unique()):
        merged = kll_create()
        for blob in parts.loc[parts["flag"] == flag, "sketch"]:
            merged = kll_merge(merged, kll_deserialize(blob))
        vals = kll_quantiles(merged, qs)
        out_flag.extend([flag] * len(qs))
        out_q.extend(qs)
        out_v.extend(float(v) for v in vals)
    return pa.Table.from_pydict(
        {"l_returnflag": out_flag, "q": out_q, "value": out_v},
        schema=pa.schema([("l_returnflag", pa.string()),
                          ("q", pa.float64()), ("value", pa.float64())]))


def approx_quantity_deciles(sf_dir: str) -> pa.Table:
    """Approximate deciles of l_quantity via a mergeable KLL-style
    quantile sketch: one bounded sketch per batch, merged on the driver
    — the shuffle-free scale path that `quantity_deciles` (exact
    histogram) names for continuous columns. Rank error is O(1/k) of n
    (accuracy pytest asserts <= 1% rank error vs the exact deciles).
    Output: (q, value) — rows-only under the driver gate (approximate
    by design)."""
    from ..functions.sketch import (
        kll_add,
        kll_create,
        kll_deserialize,
        kll_merge,
        kll_quantiles,
        kll_serialize,
    )

    ds = read_table(f"{sf_dir}/lineitem.parquet", columns=["l_quantity"])

    def sketch_batch(batch: pa.Table) -> pa.Table:
        sk = kll_create()
        kll_add(sk, batch.column("l_quantity").to_numpy(zero_copy_only=False))
        return pa.Table.from_pydict({"sketch": [kll_serialize(sk)]})

    parts = ds.map_batches(sketch_batch, batch_format="pyarrow").to_pandas()
    merged = kll_create()
    for blob in parts["sketch"]:
        merged = kll_merge(merged, kll_deserialize(blob))
    qs = [round(0.1 * i, 1) for i in range(1, 10)]
    vals = kll_quantiles(merged, qs)
    return pa.Table.from_pydict(
        {"q": pa.array(qs, pa.float64()),
         "value": pa.array(vals, pa.float64())})


def distinct_users_per_event_type(sf_dir: str) -> rd.Dataset:
    """Exact grouped distinct count: distinct users per event type.
    Two-phase: the (event_type, user_id) pair set dedups through the
    hash aggregate (narrow shuffle — one row per distinct pair per
    batch), then a per-type count. The exact counterpart of the HLL
    sketch path (approx_distinct_tokens) for grouped cardinality."""
    from ..stages.hashagg import hash_groupby_agg

    ds = read_table(f"{sf_dir}/events.parquet",
                    columns=["event_type", "user_id"])

    def distinct_pairs(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().drop_duplicates()
        return table_from_pandas(df, preserve_index=False)

    pairs = hash_groupby_agg(
        ds.map_batches(distinct_pairs, batch_format="pyarrow"),
        ["event_type", "user_id"], {"_n": ("user_id", "count")},
        num_parts=16)
    counts = hash_groupby_agg(
        pairs, ["event_type"], {"n_users": ("user_id", "count")},
        num_parts=4)
    return counts.map_batches(
        lambda t: t.select(["event_type", "n_users"]),
        batch_format="pyarrow").sort("event_type")


def approx_distinct_users_per_event_type(sf_dir: str) -> rd.Dataset:
    """GROUPED approximate distinct count via per-group mergeable
    HyperLogLog sketches: approx distinct users per event type — the
    sketch counterpart of ``distinct_users_per_event_type``.

    Scale shape: each input block folds its user_ids into ONE 4 KiB
    register blob per event_type present, so the shuffle carries
    |types| x blocks sketch rows (KBs) instead of the distinct pair
    set (the exact plan's cost); ``map_groups`` max-merges the
    registers per type and reads the estimator (~1.6% standard error
    at p=12). At 100 TB this is the only grouped-cardinality plan
    whose exchange volume is independent of user cardinality. user_id
    hashing is the splitmix64 finalizer (full avalanche — sequential
    ids would otherwise bias the rank bits). No SQL oracle (approx by
    construction); pytest bounds the error vs the exact query at 3%.
    Output: (event_type, approx_users)."""
    from ..functions.sketch import (hll_add_hashes, hll_create,
                                    hll_estimate)
    from ..functions.textstats import _splitmix64

    ds = read_table(f"{sf_dir}/events.parquet",
                    columns=["event_type", "user_id"])

    def sketch(df: pd.DataFrame) -> pd.DataFrame:
        types, blobs = [], []
        for et, g in df.groupby("event_type"):
            regs = hll_create()
            ids = g["user_id"].to_numpy().astype(np.uint64)
            hll_add_hashes(regs, _splitmix64(ids))
            types.append(et)
            blobs.append(regs.tobytes())
        return pd.DataFrame({"event_type": types, "sketch": blobs})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        stack = np.stack([np.frombuffer(b, dtype=np.uint8)
                          for b in g["sketch"]])
        est = hll_estimate(stack.max(axis=0))
        return pd.DataFrame({"event_type": [g["event_type"].iloc[0]],
                             "approx_users": [int(round(est))]})

    return (ds.map_batches(sketch, batch_format="pandas")
            .groupby("event_type")
            .map_groups(merge, batch_format="pandas")
            .sort("event_type"))


def order_item_totals_native(sf_dir: str, num_partitions: int = 32
                             ) -> rd.Dataset:
    """`order_item_totals` on Ray Data's built-in hash join
    (``Dataset.join``, Ray 2.49) instead of the explicit bucket join —
    kept as the API-native alternative and asserted output-identical in
    tests. Tradeoff (from the API contract): the native join requires
    ALL inputs materialized in the object store before executing, while
    the explicit union-bucket form streams; at 100 TB that
    materialization is the difference between spill-bounded and
    OOM-bounded, so the explicit form stays the default."""
    orders = read_table(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_totalprice"])
    items = read_table(f"{sf_dir}/lineitem.parquet",
                       columns=["l_orderkey", "l_extendedprice"])
    joined = orders.join(items, join_type="inner",
                         num_partitions=num_partitions,
                         on=("o_orderkey",), right_on=("l_orderkey",))

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby(["o_orderkey", "o_totalprice"], as_index=False).agg(
            n_items=("l_extendedprice", "size"),
            items_value=("l_extendedprice", "sum"))
        return table_from_pandas(g, preserve_index=False)

    from ..stages.hashagg import hash_groupby_agg

    agg = hash_groupby_agg(
        joined.map_batches(partial, batch_format="pyarrow"),
        ["o_orderkey", "o_totalprice"],
        {"n_items": ("n_items", "sum"), "items_value": ("items_value", "sum")},
        num_parts=16)

    def final(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        return pa.Table.from_pydict({
            "o_orderkey": df["o_orderkey"].astype(np.int64),
            "o_totalprice": df["o_totalprice"],
            "n_items": df["n_items"].astype(np.int64),
            "items_value": round_half_up(df["items_value"], 2),
        })

    return agg.map_batches(final, batch_format="pyarrow")


def q5_local_supplier_volume(sf_dir: str, region: str = "ASIA",
                             year: str = "1996",
                             broadcast_threshold: int = BROADCAST_ROW_THRESHOLD
                             ) -> rd.Dataset:
    """TPC-H Q5 shape: revenue per nation from lineitems whose customer
    AND supplier share a nation inside ``region`` — a 6-table join.

    Plan, with each join tier dispatched on its build side's size (the
    same rule as revenue_by_nation; both plans hash-identical, tested):

    - nation x region (25 x 5 rows) reduce to an in-closure
      nationkey->name map for the region;
    - customer tier: below the threshold the region-filtered
      custkey->nationkey pairs broadcast once as sorted arrays and
      orders (date-filtered at the read) probe them vectorized; above
      it, customer stays distributed and joins orders through the
      partitioned hash join -> (o_orderkey, c_nationkey);
    - lineitem tier: the (orderkey, nationkey) build side is already
      date+region-pruned, so it is materialized (REDUCED table only)
      and counted — small builds broadcast, large ones take a second
      partitioned join; inside either, the supplier side rides as a
      broadcast sorted (suppkey, nationkey) array pair — supplier is
      the smallest fact table (10k rows/SF); above ~1M suppliers it
      becomes a third partitioned join, same merge body;
    - the c_nationkey == s_nationkey equality ("local" supplier) is a
      vectorized mask, then a per-task partial sum by nation feeds the
      tiny final groupby.

    Output: (n_name, revenue) sorted by revenue desc.
    """
    from ..stages.join import partitioned_join

    nation = pads.dataset(f"{sf_dir}/nation.parquet").to_table(
        columns=["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = pads.dataset(f"{sf_dir}/region.parquet").to_table().to_pandas()
    rkeys = set(reg.loc[reg["r_name"] == region, "r_regionkey"])
    nation = nation[nation["n_regionkey"].isin(rkeys)]
    nation_map = dict(zip(nation["n_nationkey"].astype(int),
                          nation["n_name"]))
    region_nkeys = np.sort(np.fromiter(nation_map, dtype=np.int64))

    lo = np.datetime64(f"{year}-01-01", "us")
    hi = np.datetime64(f"{int(year) + 1}-01-01", "us")
    orders = read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter_expr=(pads.field("o_orderdate") >= lo)
        & (pads.field("o_orderdate") < hi),
    )

    if _parquet_num_rows(f"{sf_dir}/customer.parquet") <= broadcast_threshold:
        cust_t = pads.dataset(f"{sf_dir}/customer.parquet").to_table(
            columns=["c_custkey", "c_nationkey"],
            filter=pads.field("c_nationkey").isin(
                [int(k) for k in region_nkeys]))
        ck = cust_t.column("c_custkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        cn = cust_t.column("c_nationkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        cs = np.argsort(ck)
        cust_ref = ray.put((ck[cs], cn[cs]))

        def oc_probe(batch: pa.Table) -> pa.Table:
            cks, cns = ray.get(cust_ref)
            ok = batch.column("o_custkey").to_numpy(zero_copy_only=False)
            pos = np.searchsorted(cks, ok)
            pos[pos >= len(cks)] = len(cks) - 1 if len(cks) else 0
            hit = (cks[pos] == ok) if len(cks) else np.zeros(len(ok), bool)
            m = batch.filter(pa.array(hit))
            return pa.Table.from_pydict({
                "o_orderkey": m.column("o_orderkey"),
                "c_nationkey": pa.array(cns[pos[hit]], pa.int64()),
            })

        oc = orders.map_batches(oc_probe, batch_format="pyarrow")
    else:
        cust = read_table(f"{sf_dir}/customer.parquet",
                          columns=["c_custkey", "c_nationkey"])

        def keep_region(batch: pa.Table) -> pa.Table:
            nk = batch.column("c_nationkey").to_numpy(zero_copy_only=False)
            return batch.filter(pa.array(np.isin(nk, region_nkeys)))

        cust_f = cust.map_batches(keep_region, batch_format="pyarrow")

        def oc_merge(o_df: pd.DataFrame, c_df: pd.DataFrame) -> pd.DataFrame:
            m = o_df.merge(c_df, left_on="o_custkey", right_on="c_custkey",
                           how="inner")
            return m[["o_orderkey", "c_nationkey"]]

        oc = partitioned_join(
            orders, cust_f, "o_custkey", "c_custkey", oc_merge,
            left_schema=pa.schema([("o_orderkey", pa.int64()),
                                   ("o_custkey", pa.int64()),
                                   ("o_orderdate", pa.timestamp("us"))]),
            right_schema=pa.schema([("c_custkey", pa.int64()),
                                    ("c_nationkey", pa.int64())]))

    supp = pads.dataset(f"{sf_dir}/supplier.parquet").to_table(
        columns=["s_suppkey", "s_nationkey"])
    sk = supp.column("s_suppkey").to_numpy(zero_copy_only=False)
    order_s = np.argsort(sk)
    supp_ref = ray.put((
        sk[order_s].astype(np.int64),
        supp.column("s_nationkey").to_numpy(
            zero_copy_only=False)[order_s].astype(np.int64)))

    items = read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])

    def local_partial(m: pd.DataFrame) -> pd.DataFrame:
        """Rows joined with their customer nation -> per-nation partial
        revenue over the 'local supplier' mask (shared by both plans)."""
        skeys, snation = ray.get(supp_ref)
        if not len(m):
            return pd.DataFrame({"n_name": pd.Series([], dtype=object),
                                 "revenue": pd.Series([], dtype=np.float64)})
        lk = m["l_suppkey"].to_numpy(dtype=np.int64)
        pos = np.searchsorted(skeys, lk)
        pos[pos >= len(skeys)] = len(skeys) - 1 if len(skeys) else 0
        hit = (skeys[pos] == lk) if len(skeys) else np.zeros(len(lk), bool)
        local = hit & (snation[pos] == m["c_nationkey"].to_numpy())
        m = m[local].copy()
        m["revenue"] = m["l_extendedprice"] * (1 - m["l_discount"])
        m["n_name"] = m["c_nationkey"].map(nation_map)
        return m.groupby("n_name", as_index=False).agg(
            revenue=("revenue", "sum"))

    # the build side is date+region-pruned — a small fraction of orders;
    # materialize the REDUCED pairs and dispatch on the actual count
    oc_m = oc.materialize()
    if oc_m.count() <= broadcast_threshold:
        oc_df = oc_m.to_pandas()
        oks = oc_df["o_orderkey"].to_numpy(dtype=np.int64)
        os_ = np.argsort(oks)
        oc_ref = ray.put((oks[os_],
                          oc_df["c_nationkey"].to_numpy(dtype=np.int64)[os_]))

        def li_probe(batch: pa.Table) -> pa.Table:
            oks2, onat = ray.get(oc_ref)
            lk = batch.column("l_orderkey").to_numpy(zero_copy_only=False)
            pos = np.searchsorted(oks2, lk)
            pos[pos >= len(oks2)] = len(oks2) - 1 if len(oks2) else 0
            hit = (oks2[pos] == lk) if len(oks2) else np.zeros(len(lk), bool)
            m = batch.filter(pa.array(hit)).to_pandas()
            m["c_nationkey"] = onat[pos[hit]]
            return table_from_pandas(
                local_partial(m),
                schema=pa.schema([("n_name", pa.string()),
                                  ("revenue", pa.float64())]),
                preserve_index=False)

        part = items.map_batches(li_probe, batch_format="pyarrow")
    else:
        def li_merge(oc_df: pd.DataFrame,
                     l_df: pd.DataFrame) -> pd.DataFrame:
            m = l_df.merge(oc_df, left_on="l_orderkey",
                           right_on="o_orderkey", how="inner")
            return local_partial(m)

        part = partitioned_join(
            oc_m, items, "o_orderkey", "l_orderkey", li_merge,
            left_schema=pa.schema([("o_orderkey", pa.int64()),
                                   ("c_nationkey", pa.int64())]),
            right_schema=pa.schema([("l_orderkey", pa.int64()),
                                    ("l_suppkey", pa.int64()),
                                    ("l_extendedprice", pa.float64()),
                                    ("l_discount", pa.float64())]))

    agg = part.repartition(2).groupby("n_name").aggregate(
        Sum("revenue", alias_name="revenue"))

    def final(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["revenue"] = round_half_up(df["revenue"], 2)
        return table_from_pandas(df[["n_name", "revenue"]],
                                    preserve_index=False)

    return agg.map_batches(final, batch_format="pyarrow").sort(
        ["revenue", "n_name"], descending=[True, False])


def customer_order_counts(sf_dir: str) -> rd.Dataset:
    """LEFT OUTER join exposure: per-customer order count and total
    spend INCLUDING customers with zero orders. Orders pre-aggregate to
    one row per custkey (two-phase hash agg — the narrow-shuffle
    combiner), then customer left-joins that reduced side through the
    partitioned hash join; the outer rows materialize as fillna(0) in
    the per-bucket merge. Output: (c_custkey, n_orders, total_spent)."""
    from ..stages.hashagg import hash_groupby_agg
    from ..stages.join import partitioned_join

    orders = read_table(f"{sf_dir}/orders.parquet",
                        columns=["o_custkey", "o_totalprice"])
    per_cust = hash_groupby_agg(
        orders, ["o_custkey"],
        {"n_orders": ("o_totalprice", "count"),
         "total_spent": ("o_totalprice", "sum")},
        num_parts=32)

    cust = read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey"])

    def left_merge(c_df: pd.DataFrame, o_df: pd.DataFrame) -> pd.DataFrame:
        m = c_df.merge(o_df, left_on="c_custkey", right_on="o_custkey",
                       how="left")
        return pd.DataFrame({
            "c_custkey": m["c_custkey"].astype(np.int64),
            "n_orders": m["n_orders"].fillna(0).astype(np.int64),
            "total_spent": round_half_up(
                m["total_spent"].fillna(0.0).to_numpy(), 2),
        })

    out = partitioned_join(
        cust, per_cust, "c_custkey", "o_custkey", left_merge,
        left_schema=pa.schema([("c_custkey", pa.int64())]),
        right_schema=pa.schema([("o_custkey", pa.int64()),
                                ("n_orders", pa.int64()),
                                ("total_spent", pa.float64())]))
    return out.sort("c_custkey")


def quantity_percentiles_cont(sf_dir: str) -> rd.Dataset:
    """INTERPOLATED (continuous) quantiles of l_quantity — the
    percentile_cont counterpart of `quantity_deciles` (quantile_disc).
    Same distributed value-histogram plan; the selection step linearly
    interpolates at fractional rank p = q*(n-1) between the two
    enclosing order statistics (DuckDB quantile_cont semantics).
    Output: (q, value)."""
    from ..stages.hashagg import hash_groupby_agg

    qs = [round(0.1 * i, 1) for i in range(1, 10)] + [0.25, 0.75, 0.99]
    ds = read_table(f"{sf_dir}/lineitem.parquet", columns=["l_quantity"])

    def counts(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().groupby("l_quantity", as_index=False).size()
        return table_from_pandas(df.rename(columns={"size": "c"}),
                                    preserve_index=False)

    hist = hash_groupby_agg(
        ds.map_batches(counts, batch_format="pyarrow"),
        ["l_quantity"], {"c": ("c", "sum")}, num_parts=8,
    ).repartition(1)

    def select(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().sort_values("l_quantity")
        cum = df["c"].cumsum().to_numpy()
        n = int(cum[-1]) if len(cum) else 0
        vals = df["l_quantity"].to_numpy(dtype=np.float64)

        def at(rank0: int) -> float:
            # value at 0-based order statistic `rank0`
            return float(vals[int(np.searchsorted(cum, rank0 + 1))])

        out_q, out_v = [], []
        for q in sorted(qs):
            p = q * (n - 1)
            k = int(np.floor(p))
            lo_v = at(k)
            hi_v = at(min(k + 1, n - 1))
            out_q.append(q)
            out_v.append(lo_v + (p - k) * (hi_v - lo_v))
        return pa.Table.from_pydict(
            {"q": pa.array(out_q, pa.float64()),
             "value": pa.array(round_half_up(out_v, 4), pa.float64())})

    return hist.map_batches(select, batch_format="pyarrow")


def large_orders(sf_dir: str, min_qty: float = 250.0, k: int = 50,
                 broadcast_threshold: int = BROADCAST_ROW_THRESHOLD
                 ) -> rd.Dataset:
    """TPC-H Q18 shape (large-volume customers): orders whose total
    lineitem quantity exceeds ``min_qty`` — a grouped HAVING filter
    followed by a join back to the order header.

    Plan: lineitem pre-aggregates to one row per orderkey through the
    two-phase hash aggregate (narrow shuffle), the HAVING predicate
    prunes INSIDE the final combine (the reduced side shrinks before
    the join), and the surviving minority joins orders via the
    partitioned hash join. Output: (o_orderkey, o_custkey,
    o_totalprice, sum_qty) top-k by sum_qty desc (tie-break orderkey).
    """
    from ..stages.hashagg import hash_groupby_agg
    from ..stages.join import partitioned_join

    items = read_table(f"{sf_dir}/lineitem.parquet",
                       columns=["l_orderkey", "l_quantity"])
    per_order = hash_groupby_agg(
        items, ["l_orderkey"], {"sum_qty": ("l_quantity", "sum")},
        num_parts=32)

    def having(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["sum_qty"] > min_qty]

    # the HAVING survivors are a tiny fraction of the already-reduced
    # per-order table -> materialize the REDUCED survivors (never the
    # input) and dispatch on their actual size, like revenue_by_nation
    big = per_order.map_batches(having, batch_format="pandas").materialize()

    orders = read_table(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_custkey", "o_totalprice"])

    if big.count() <= broadcast_threshold:
        b_df = big.to_pandas()
        keys = b_df["l_orderkey"].to_numpy(dtype=np.int64)
        order_s = np.argsort(keys)
        big_ref = ray.put((keys[order_s],
                           b_df["sum_qty"].to_numpy()[order_s]))

        def probe(batch: pa.Table) -> pa.Table:
            ks, qty = ray.get(big_ref)
            ok = batch.column("o_orderkey").to_numpy(zero_copy_only=False)
            pos = np.searchsorted(ks, ok)
            pos[pos >= len(ks)] = len(ks) - 1 if len(ks) else 0
            hit = (ks[pos] == ok) if len(ks) else np.zeros(len(ok), bool)
            m = batch.filter(pa.array(hit))
            return pa.Table.from_pydict({
                "o_orderkey": m.column("o_orderkey"),
                "o_custkey": m.column("o_custkey"),
                "o_totalprice": m.column("o_totalprice"),
                "sum_qty": pa.array(round_half_up(qty[pos[hit]], 2)),
            })

        out = orders.map_batches(probe, batch_format="pyarrow")
    else:
        def merge(o_df: pd.DataFrame, b_df: pd.DataFrame) -> pd.DataFrame:
            m = o_df.merge(b_df, left_on="o_orderkey",
                           right_on="l_orderkey", how="inner")
            return pd.DataFrame({
                "o_orderkey": m["o_orderkey"].astype(np.int64),
                "o_custkey": m["o_custkey"].astype(np.int64),
                "o_totalprice": m["o_totalprice"],
                "sum_qty": round_half_up(m["sum_qty"].to_numpy(), 2),
            })

        out = partitioned_join(
            orders, big, "o_orderkey", "l_orderkey", merge,
            num_buckets=16,
            left_schema=pa.schema([("o_orderkey", pa.int64()),
                                   ("o_custkey", pa.int64()),
                                   ("o_totalprice", pa.float64())]),
            right_schema=pa.schema([("l_orderkey", pa.int64()),
                                    ("sum_qty", pa.float64())]))
    return out.sort(["sum_qty", "o_orderkey"],
                    descending=[True, False]).limit(k)


def events_rollup(sf_dir: str) -> rd.Dataset:
    """ROLLUP aggregate: event counts at three grouping levels —
    (event_type, day), (event_type), and grand total — with NULL
    markers for the rolled-up columns (SQL ``GROUP BY ROLLUP``).

    Scale shape: the raw stream reduces ONCE through the two-phase
    hash aggregate at the finest level; the coarser levels re-aggregate
    the already-reduced table (|types| x |days| rows), so the rollup
    adds no second pass over the input. Output: (event_type, day,
    n_events)."""
    from ..stages.hashagg import hash_groupby_agg

    ds = read_table(f"{sf_dir}/events.parquet",
                    columns=["event_type", "ts"])

    def to_day(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["day"] = df["ts"].dt.floor("D")
        df["one"] = np.int64(1)
        return table_from_pandas(df[["event_type", "day", "one"]],
                                    preserve_index=False)

    base = hash_groupby_agg(
        ds.map_batches(to_day, batch_format="pyarrow"),
        ["event_type", "day"], {"n_events": ("one", "sum")},
        num_parts=16)

    def levels(df: pd.DataFrame) -> pd.DataFrame:
        # runs once on the reduced table (repartition(1) below)
        fine = df[["event_type", "day", "n_events"]].copy()
        by_type = df.groupby("event_type", as_index=False).agg(
            n_events=("n_events", "sum"))
        by_type["day"] = pd.NaT
        total = pd.DataFrame({"event_type": [None],
                              "day": [pd.NaT],
                              "n_events": [df["n_events"].sum()]})
        out = pd.concat(
            [fine, by_type[["event_type", "day", "n_events"]], total],
            ignore_index=True)
        out["n_events"] = out["n_events"].astype(np.int64)
        return out

    return base.repartition(1).map_batches(levels, batch_format="pandas")


def events_cube(sf_dir: str) -> rd.Dataset:
    """CUBE aggregate: event counts at ALL FOUR grouping levels —
    (event_type, day), (event_type), (day), and grand total — with
    NULL markers for the rolled-up columns (SQL ``GROUP BY CUBE``).

    Same scale shape as ``events_rollup``: the raw stream reduces ONCE
    through the two-phase hash aggregate at the finest (event_type,
    day) level; every coarser grouping set re-aggregates the already
    reduced |types| x |days| table, so the cube costs one pass over the
    input regardless of the number of grouping sets. Output:
    (event_type, day, n_events)."""
    from ..stages.hashagg import hash_groupby_agg

    ds = read_table(f"{sf_dir}/events.parquet",
                    columns=["event_type", "ts"])

    def to_day(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["day"] = df["ts"].dt.floor("D")
        df["one"] = np.int64(1)
        return table_from_pandas(df[["event_type", "day", "one"]],
                                    preserve_index=False)

    base = hash_groupby_agg(
        ds.map_batches(to_day, batch_format="pyarrow"),
        ["event_type", "day"], {"n_events": ("one", "sum")},
        num_parts=16)

    def levels(df: pd.DataFrame) -> pd.DataFrame:
        # runs once on the reduced table (repartition(1) below)
        fine = df[["event_type", "day", "n_events"]].copy()
        by_type = df.groupby("event_type", as_index=False).agg(
            n_events=("n_events", "sum"))
        by_type["day"] = pd.NaT
        by_day = df.groupby("day", as_index=False).agg(
            n_events=("n_events", "sum"))
        by_day["event_type"] = None
        total = pd.DataFrame({"event_type": [None],
                              "day": [pd.NaT],
                              "n_events": [df["n_events"].sum()]})
        cols = ["event_type", "day", "n_events"]
        out = pd.concat([fine, by_type[cols], by_day[cols], total],
                        ignore_index=True)
        out["n_events"] = out["n_events"].astype(np.int64)
        return out

    return base.repartition(1).map_batches(levels, batch_format="pandas")


def _orderkey_flag_presence(sf_dir: str, flags: tuple[str, str]):
    """Per-orderkey presence indicators for two returnflag values,
    reduced through the two-phase hash aggregate (shuffle volume: one
    row per (batch, orderkey)). The scale-right lowering of INTERSECT /
    EXCEPT over a fact stream — grouped boolean aggregation instead of
    materialized distinct-set unions."""
    from ..stages.hashagg import hash_groupby_agg

    a, b = flags
    ds = read_table(f"{sf_dir}/lineitem.parquet",
                    columns=["l_orderkey", "l_returnflag"])

    def ind(batch: pa.Table) -> pa.Table:
        rf = batch.column("l_returnflag").to_pandas()
        return pa.Table.from_pydict({
            "l_orderkey": batch.column("l_orderkey"),
            "has_a": pa.array((rf == a).to_numpy().astype(np.int64)),
            "has_b": pa.array((rf == b).to_numpy().astype(np.int64)),
        })

    return hash_groupby_agg(
        ds.map_batches(ind, batch_format="pyarrow"),
        ["l_orderkey"],
        {"has_a": ("has_a", "max"), "has_b": ("has_b", "max")},
        num_parts=16)


def orderkeys_intersect(sf_dir: str, flag_a: str = "R",
                        flag_b: str = "A") -> rd.Dataset:
    """INTERSECT: orderkeys having BOTH a returned ('R') and an
    accepted ('A') lineitem. Output: (l_orderkey)."""
    agg = _orderkey_flag_presence(sf_dir, (flag_a, flag_b))

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        out = df[(df["has_a"] > 0) & (df["has_b"] > 0)]
        return pd.DataFrame({"l_orderkey": out["l_orderkey"].astype(np.int64)})

    return agg.map_batches(keep, batch_format="pandas").sort("l_orderkey")


def orderkeys_except(sf_dir: str, flag_a: str = "R",
                     flag_b: str = "A") -> rd.Dataset:
    """EXCEPT: orderkeys with a returned lineitem but NO accepted one.
    Output: (l_orderkey)."""
    agg = _orderkey_flag_presence(sf_dir, (flag_a, flag_b))

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        out = df[(df["has_a"] > 0) & (df["has_b"] == 0)]
        return pd.DataFrame({"l_orderkey": out["l_orderkey"].astype(np.int64)})

    return agg.map_batches(keep, batch_format="pandas").sort("l_orderkey")


def quantity_deciles_by_flag(sf_dir: str) -> rd.Dataset:
    """GROUPED exact quantiles: per-returnflag deciles of l_quantity
    via the same distributed value-histogram plan as quantity_deciles,
    keyed by (flag, value); rank selection runs per flag on the reduced
    histogram. Output: (l_returnflag, q, value)."""
    from ..stages.hashagg import hash_groupby_agg

    qs = [round(0.1 * i, 1) for i in range(1, 10)]
    ds = read_table(f"{sf_dir}/lineitem.parquet",
                    columns=["l_returnflag", "l_quantity"])

    def counts(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().groupby(["l_returnflag", "l_quantity"],
                                       as_index=False).size()
        return table_from_pandas(df.rename(columns={"size": "c"}),
                                    preserve_index=False)

    hist = hash_groupby_agg(
        ds.map_batches(counts, batch_format="pyarrow"),
        ["l_returnflag", "l_quantity"], {"c": ("c", "sum")}, num_parts=8,
    ).repartition(1)

    def select(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        out_f, out_q, out_v = [], [], []
        for flag, g in df.groupby("l_returnflag"):
            g = g.sort_values("l_quantity")
            cum = g["c"].cumsum().to_numpy()
            n = int(cum[-1]) if len(cum) else 0
            vals = g["l_quantity"].to_numpy()
            for q in qs:
                rank = int(np.ceil(q * n))
                out_f.append(flag)
                out_q.append(q)
                out_v.append(float(vals[int(np.searchsorted(cum, rank))]))
        return pa.Table.from_pydict(
            {"l_returnflag": pa.array(out_f, pa.string()),
             "q": pa.array(out_q, pa.float64()),
             "value": pa.array(out_v, pa.float64())})

    return hist.map_batches(select, batch_format="pyarrow").sort(
        ["l_returnflag", "q"])


def event_types_per_user(sf_dir: str) -> rd.Dataset:
    """Grouped string-concat aggregate (SQL string_agg / collect_list):
    each user's DISTINCT event types, sorted and comma-joined. Two
    narrow phases: the (user, type) pair set dedups through the hash
    aggregate (one row per distinct pair per batch), then a per-part
    pandas groupby joins the handful of types per user — the
    collect-list shuffle never carries more than |distinct pairs|.
    Output: (user_id, types)."""
    from ..stages.hashagg import hash_groupby_agg, stable_hash_column

    ds = read_table(f"{sf_dir}/events.parquet",
                    columns=["user_id", "event_type"])

    def distinct_pairs(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().drop_duplicates()
        return table_from_pandas(df, preserve_index=False)

    pairs = hash_groupby_agg(
        ds.map_batches(distinct_pairs, batch_format="pyarrow"),
        ["user_id", "event_type"], {"_n": ("event_type", "count")},
        num_parts=16)

    def tag(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["_upart"] = (stable_hash_column(df["user_id"])
                        % np.uint64(16)).astype(np.int64)
        return table_from_pandas(df[["user_id", "event_type", "_upart"]],
                                    preserve_index=False)

    def concat(g: pd.DataFrame) -> pd.DataFrame:
        out = g.sort_values(["user_id", "event_type"]).groupby(
            "user_id", as_index=False).agg(
            types=("event_type", lambda s: ",".join(s)))
        out["user_id"] = out["user_id"].astype(np.int64)
        return out

    return pairs.map_batches(tag, batch_format="pyarrow").groupby(
        "_upart").map_groups(concat, batch_format="pandas").sort("user_id")


def orders_above_avg(sf_dir: str) -> rd.Dataset:
    """Correlated-scalar-subquery shape: orders priced above the GLOBAL
    average order price. Pass 1 reduces (sum, count) per batch to a
    driver scalar (O(blocks) rows — never the table); pass 2 filters
    with the broadcast scalar. Output: (o_orderkey, o_totalprice)."""
    ds = read_table(f"{sf_dir}/orders.parquet",
                    columns=["o_orderkey", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column("o_totalprice").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict({
            "s": pa.array([float(v.sum())]),
            "n": pa.array([len(v)], pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    # single-scalar exchange; summation order fixed by block index is
    # irrelevant at the 2-decimal comparison boundary (prices sit far
    # from the mean relative to double rounding)
    avg = float(parts["s"].sum() / parts["n"].sum())

    def above(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        return batch.filter(_pc.greater(batch.column("o_totalprice"), avg))

    return ds.map_batches(above, batch_format="pyarrow").sort("o_orderkey")


def q10_returned_items(sf_dir: str, k: int = 20,
                       broadcast_threshold: int = BROADCAST_ROW_THRESHOLD
                       ) -> rd.Dataset:
    """TPC-H Q10 shape (returned-item reporting): revenue lost to
    returned lineitems per customer, top-k. lineitem filters to
    returnflag 'R' at the read and pre-aggregates per orderkey (narrow
    shuffle), orders joins the reduced side through the partitioned
    hash join and re-aggregates per custkey, then customer + nation
    attach — customer via the size-dispatched plan (broadcast sorted
    arrays below the threshold, partitioned join above), nation always
    in-closure. Output: (c_custkey, c_name, n_name, revenue) top-k by
    revenue desc (tie-break custkey)."""
    from ..stages.hashagg import hash_groupby_agg
    from ..stages.join import partitioned_join

    items = read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount",
                 "l_returnflag"],
        filter_expr=pads.field("l_returnflag") == "R")

    def rev(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df[df["l_returnflag"] == "R"]
        df["rev"] = df["l_extendedprice"] * (1 - df["l_discount"])
        g = df.groupby("l_orderkey", as_index=False).agg(rev=("rev", "sum"))
        return table_from_pandas(g, preserve_index=False)

    per_order = hash_groupby_agg(
        items.map_batches(rev, batch_format="pyarrow"),
        ["l_orderkey"], {"rev": ("rev", "sum")}, num_parts=32)

    orders = read_table(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_custkey"])

    def o_merge(o_df: pd.DataFrame, r_df: pd.DataFrame) -> pd.DataFrame:
        m = o_df.merge(r_df, left_on="o_orderkey", right_on="l_orderkey",
                       how="inner")
        # an orderkey lives in one bucket -> per-bucket custkey partials
        return m.groupby("o_custkey", as_index=False).agg(rev=("rev", "sum"))

    per_cust = hash_groupby_agg(
        partitioned_join(
            orders, per_order, "o_orderkey", "l_orderkey", o_merge,
            num_buckets=16,
            left_schema=pa.schema([("o_orderkey", pa.int64()),
                                   ("o_custkey", pa.int64())]),
            right_schema=pa.schema([("l_orderkey", pa.int64()),
                                    ("rev", pa.float64())])),
        ["o_custkey"], {"rev": ("rev", "sum")}, num_parts=8)

    nation = pads.dataset(f"{sf_dir}/nation.parquet").to_table(
        columns=["n_nationkey", "n_name"]).to_pandas()
    nation_map = dict(zip(nation["n_nationkey"].astype(int),
                          nation["n_name"]))

    if _parquet_num_rows(f"{sf_dir}/customer.parquet") <= broadcast_threshold:
        cust_t = pads.dataset(f"{sf_dir}/customer.parquet").to_table(
            columns=["c_custkey", "c_name", "c_nationkey"])
        ck = cust_t.column("c_custkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        cs = np.argsort(ck)
        cust_ref = ray.put((
            ck[cs],
            np.asarray(cust_t.column("c_name").to_pylist(),
                       dtype=object)[cs],
            cust_t.column("c_nationkey").to_numpy(
                zero_copy_only=False).astype(np.int64)[cs]))

        def attach(df: pd.DataFrame) -> pd.DataFrame:
            cks, cnames, cnat = ray.get(cust_ref)
            keys = df["o_custkey"].to_numpy(dtype=np.int64)
            pos = np.searchsorted(cks, keys)
            pos[pos >= len(cks)] = len(cks) - 1 if len(cks) else 0
            hit = (cks[pos] == keys) if len(cks) else np.zeros(
                len(keys), bool)
            df = df[hit].copy()
            p = pos[hit]
            return pd.DataFrame({
                "c_custkey": df["o_custkey"].astype(np.int64).to_numpy(),
                "c_name": cnames[p],
                "n_name": pd.Series(cnat[p]).map(nation_map).to_numpy(),
                "revenue": round_half_up(df["rev"].to_numpy(), 2),
            })

        out = per_cust.map_batches(attach, batch_format="pandas")
    else:
        cust = read_table(f"{sf_dir}/customer.parquet",
                          columns=["c_custkey", "c_name", "c_nationkey"])

        def c_merge(c_df: pd.DataFrame, r_df: pd.DataFrame) -> pd.DataFrame:
            m = c_df.merge(r_df, left_on="c_custkey", right_on="o_custkey",
                           how="inner")
            return pd.DataFrame({
                "c_custkey": m["c_custkey"].astype(np.int64),
                "c_name": m["c_name"],
                "n_name": m["c_nationkey"].map(nation_map),
                "revenue": round_half_up(m["rev"].to_numpy(), 2),
            })

        out = partitioned_join(
            cust, per_cust, "c_custkey", "o_custkey", c_merge,
            num_buckets=16,
            left_schema=pa.schema([("c_custkey", pa.int64()),
                                   ("c_name", pa.string()),
                                   ("c_nationkey", pa.int64())]),
            right_schema=pa.schema([("o_custkey", pa.int64()),
                                    ("rev", pa.float64())]))
    return out.sort(["revenue", "c_custkey"],
                    descending=[True, False]).limit(k)


def q14_promo_revenue(sf_dir: str, year: str = "1997",
                      month: int = 6) -> rd.Dataset:
    """TPC-H Q14 shape (promotion effect): the percentage of one
    month's lineitem revenue from PROMO-type parts — a join + two
    conditional sums collapsing to a single row. The part side ships
    once as a broadcast sorted (partkey, is_promo) pair (at 100 TB the
    part table crosses the threshold and this becomes a partitioned
    join; the shape of the conditional partial sums is unchanged).
    Output: (promo_revenue_pct, total_revenue)."""
    lo = np.datetime64(f"{year}-{month:02d}-01", "us")
    nxt_y, nxt_m = (int(year) + 1, 1) if month == 12 else (int(year),
                                                           month + 1)
    hi = np.datetime64(f"{nxt_y}-{nxt_m:02d}-01", "us")

    part_t = pads.dataset(f"{sf_dir}/part.parquet").to_table(
        columns=["p_partkey", "p_type"])
    pk = part_t.column("p_partkey").to_numpy(
        zero_copy_only=False).astype(np.int64)
    promo = np.asarray(
        [t.startswith("PROMO") for t in part_t.column("p_type").to_pylist()],
        dtype=bool)
    ps = np.argsort(pk)
    part_ref = ray.put((pk[ps], promo[ps]))

    items = read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter_expr=(pads.field("l_shipdate") >= lo)
        & (pads.field("l_shipdate") < hi))

    def partial(batch: pa.Table) -> pa.Table:
        pks, ispromo = ray.get(part_ref)
        df = batch.to_pandas()
        df = df[(df["l_shipdate"] >= pd.Timestamp(str(lo)))
                & (df["l_shipdate"] < pd.Timestamp(str(hi)))]
        rev = (df["l_extendedprice"] * (1 - df["l_discount"])).to_numpy()
        lk = df["l_partkey"].to_numpy(dtype=np.int64)
        pos = np.searchsorted(pks, lk)
        pos[pos >= len(pks)] = len(pks) - 1 if len(pks) else 0
        hit = (pks[pos] == lk) if len(pks) else np.zeros(len(lk), bool)
        p = np.zeros(len(lk), dtype=bool)
        p[hit] = ispromo[pos[hit]]
        return pa.Table.from_pydict({
            "promo": pa.array([float(rev[p].sum())]),
            "total": pa.array([float(rev.sum())])})

    parts = items.map_batches(partial, batch_format="pyarrow").to_pandas()
    promo_sum, total = float(parts["promo"].sum()), float(parts["total"].sum())
    pct = 100.0 * promo_sum / total if total else 0.0
    return pa.Table.from_pydict({
        "promo_revenue_pct": pa.array(round_half_up([pct], 2)),
        "total_revenue": pa.array(round_half_up([total], 2))})


def _order_priority_check(sf_dir: str, date_lo: str, date_hi: str,
                          flag: str, broadcast_threshold: int,
                          anti: bool) -> rd.Dataset:
    """Shared EXISTS / NOT EXISTS lowering for the Q4-shape queries:
    count orders per o_orderpriority within a date window that DO
    (``anti=False``, semi-join) or do NOT (``anti=True``, anti-join)
    have a lineitem with ``l_returnflag = flag``. lineitem reduces to
    DISTINCT qualifying orderkeys (two-phase hash aggregate, shuffle
    volume one row per (batch, orderkey)); below the broadcast
    threshold the keyset ships once as a sorted array probed per
    batch, above it the check runs through ``partitioned_join`` (inner
    merge for the semi case, left merge + indicator for the anti
    case). Counts pre-aggregate per bucket so the final groupby
    shuffles ~5 rows per partial."""
    from ..stages.hashagg import hash_groupby_agg
    from ..stages.join import partitioned_join

    lo = np.datetime64(date_lo, "us")
    hi = np.datetime64(date_hi, "us")
    orders = read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority", "o_orderdate"],
        filter_expr=(pads.field("o_orderdate") >= lo)
        & (pads.field("o_orderdate") < hi))

    def _date_mask(df: pd.DataFrame) -> pd.Series:
        return ((df["o_orderdate"] >= pd.Timestamp(str(lo)))
                & (df["o_orderdate"] < pd.Timestamp(str(hi))))

    if _parquet_num_rows(f"{sf_dir}/lineitem.parquet") <= broadcast_threshold:
        keys_t = pads.dataset(f"{sf_dir}/lineitem.parquet").to_table(
            columns=["l_orderkey"],
            filter=pads.field("l_returnflag") == flag)
        keys = np.unique(keys_t.column("l_orderkey").to_numpy(
            zero_copy_only=False).astype(np.int64))
        keys_ref = ray.put(keys)

        def probe(df: pd.DataFrame) -> pd.DataFrame:
            ks = ray.get(keys_ref)
            df = df[_date_mask(df)]
            ok = df["o_orderkey"].to_numpy(dtype=np.int64)
            pos = np.searchsorted(ks, ok)
            pos[pos >= len(ks)] = len(ks) - 1 if len(ks) else 0
            hit = (ks[pos] == ok) if len(ks) else np.zeros(len(ok), bool)
            sel = ~hit if anti else hit
            return (df[sel].groupby("o_orderpriority", as_index=False)
                    .agg(order_count=("o_orderkey", "size")))

        part = orders.map_batches(probe, batch_format="pandas")
    else:
        items = read_table(f"{sf_dir}/lineitem.parquet",
                           columns=["l_orderkey", "l_returnflag"],
                           filter_expr=pads.field("l_returnflag") == flag)

        def distinct_keys(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            ok = np.unique(df.loc[df["l_returnflag"] == flag, "l_orderkey"]
                           .to_numpy(dtype=np.int64))
            return pa.Table.from_pydict({
                "l_orderkey": pa.array(ok, pa.int64()),
                "present": pa.array(np.ones(len(ok), dtype=np.int64))})

        keyset = hash_groupby_agg(
            items.map_batches(distinct_keys, batch_format="pyarrow"),
            ["l_orderkey"], {"present": ("present", "max")}, num_parts=32)

        def check(o_df: pd.DataFrame, k_df: pd.DataFrame) -> pd.DataFrame:
            o_df = o_df[_date_mask(o_df)]
            if anti:
                m = o_df.merge(k_df[["l_orderkey"]],
                               left_on="o_orderkey",
                               right_on="l_orderkey", how="left",
                               indicator=True)
                m = m[m["_merge"] == "left_only"]
            else:
                m = o_df.merge(k_df[["l_orderkey"]],
                               left_on="o_orderkey",
                               right_on="l_orderkey", how="inner")
            return (m.groupby("o_orderpriority", as_index=False)
                    .agg(order_count=("o_orderkey", "size")))

        part = partitioned_join(
            orders, keyset, "o_orderkey", "l_orderkey", check,
            num_buckets=16,
            left_schema=pa.schema([("o_orderkey", pa.int64()),
                                   ("o_orderpriority", pa.string()),
                                   ("o_orderdate", pa.timestamp("us"))]),
            right_schema=pa.schema([("l_orderkey", pa.int64()),
                                    ("present", pa.int64())]))

    agg = (part.repartition(4).groupby("o_orderpriority")
           .aggregate(Sum("order_count", alias_name="order_count")))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df["order_count"] = df["order_count"].astype(np.int64)
        return df[["o_orderpriority", "order_count"]]

    return agg.map_batches(final, batch_format="pandas").sort(
        "o_orderpriority")


def q4_order_priority(sf_dir: str, date_lo: str = "1997-07-01",
                      date_hi: str = "1997-10-01", flag: str = "R",
                      broadcast_threshold: int = BROADCAST_ROW_THRESHOLD
                      ) -> rd.Dataset:
    """TPC-H Q4 shape (order priority checking): count orders per
    o_orderpriority within one quarter where EXISTS a lineitem of the
    order with ``l_returnflag = flag`` (stand-in predicate — the
    driver corpus carries no commit/receipt dates). Output:
    (o_orderpriority, order_count) sorted by priority.

    Reference analogue: the per-category presence counts of
    ``evaluate_new_testdata.py:137-163`` generalized to an EXISTS
    semi-join over a fact-fact pair; lowering in
    ``_order_priority_check``."""
    return _order_priority_check(sf_dir, date_lo, date_hi, flag,
                                 broadcast_threshold, anti=False)


def orders_no_returns(sf_dir: str, date_lo: str = "1997-07-01",
                      date_hi: str = "1997-10-01", flag: str = "R",
                      broadcast_threshold: int = BROADCAST_ROW_THRESHOLD
                      ) -> rd.Dataset:
    """NOT EXISTS anti-join over a fact-fact pair: count orders per
    o_orderpriority within the window having NO lineitem with
    ``l_returnflag = flag`` — the complement of ``q4_order_priority``
    through the same distinct-keyset reduction and size-dispatched
    plan (sorted-array probe below the threshold, partitioned left
    merge + indicator above). Output: (o_orderpriority, order_count)
    sorted by priority."""
    return _order_priority_check(sf_dir, date_lo, date_hi, flag,
                                 broadcast_threshold, anti=True)


def q7_nation_volume(sf_dir: str, nation_a: str = "NATION_1",
                     nation_b: str = "NATION_2",
                     date_lo: str = "1996-01-01",
                     date_hi: str = "1998-01-01",
                     broadcast_threshold: int = BROADCAST_ROW_THRESHOLD
                     ) -> rd.Dataset:
    """TPC-H Q7 shape (volume shipping): yearly revenue flowing
    between two nations — the 5-table join (lineitem x supplier x
    orders x customer x nation x nation), the join-heaviest plan in
    the engine.

    Scale plan (ONE fact-fact shuffle total):
    - supplier and nation are dimensions: a sorted (suppkey ->
      supp_nation) pair broadcasts once; lineitem batches filter to
      the two supplier nations IMMEDIATELY (selectivity ~2/|nations|),
      attach supp_nation, and pre-aggregate volume per (l_orderkey,
      supp_nation, l_year) — the surviving partial set is orders-of-
      magnitude smaller than lineitem before anything shuffles.
    - customer attaches cust_nation to orders: broadcast sorted
      arrays below the threshold, else a ``partitioned_join``
      (customer is fact-sized at TPC-H scale).
    - the reduced lineitem partials meet orders through
      ``partitioned_join`` on orderkey; per-bucket merges keep only
      the two cust nations and emit (supp_nation, cust_nation,
      l_year) partial sums, so the final groupby shuffles a handful
      of rows. Output: (supp_nation, cust_nation, l_year, revenue)
      sorted."""
    from ..stages.hashagg import hash_groupby_agg
    from ..stages.join import partitioned_join

    lo = np.datetime64(date_lo, "us")
    hi = np.datetime64(date_hi, "us")
    wanted = {nation_a, nation_b}

    nation = pads.dataset(f"{sf_dir}/nation.parquet").to_table(
        columns=["n_nationkey", "n_name"]).to_pandas()
    nation_map = dict(zip(nation["n_nationkey"].astype(int),
                          nation["n_name"]))

    supp = pads.dataset(f"{sf_dir}/supplier.parquet").to_table(
        columns=["s_suppkey", "s_nationkey"]).to_pandas()
    supp["nat"] = supp["s_nationkey"].map(nation_map)
    supp = supp[supp["nat"].isin(wanted)]
    sk = supp["s_suppkey"].to_numpy(dtype=np.int64)
    order_s = np.argsort(sk)
    supp_ref = ray.put((sk[order_s],
                        supp["nat"].to_numpy(dtype=object)[order_s]))

    items = read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount", "l_shipdate"],
        filter_expr=(pads.field("l_shipdate") >= lo)
        & (pads.field("l_shipdate") < hi))

    def l_partial(df: pd.DataFrame) -> pd.DataFrame:
        sks, snat = ray.get(supp_ref)
        df = df[(df["l_shipdate"] >= pd.Timestamp(str(lo)))
                & (df["l_shipdate"] < pd.Timestamp(str(hi)))]
        lk = df["l_suppkey"].to_numpy(dtype=np.int64)
        pos = np.searchsorted(sks, lk)
        pos[pos >= len(sks)] = len(sks) - 1 if len(sks) else 0
        hit = (sks[pos] == lk) if len(sks) else np.zeros(len(lk), bool)
        df = df[hit].copy()
        df["supp_nation"] = snat[pos[hit]]
        df["l_year"] = df["l_shipdate"].dt.year.astype(np.int64)
        df["volume"] = df["l_extendedprice"] * (1 - df["l_discount"])
        return (df.groupby(["l_orderkey", "supp_nation", "l_year"],
                           as_index=False).agg(volume=("volume", "sum")))

    per_order = hash_groupby_agg(
        items.map_batches(l_partial, batch_format="pandas"),
        ["l_orderkey", "supp_nation", "l_year"],
        {"volume": ("volume", "sum")}, num_parts=16)

    orders = read_table(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_custkey"])

    if _parquet_num_rows(f"{sf_dir}/customer.parquet") <= broadcast_threshold:
        cust = pads.dataset(f"{sf_dir}/customer.parquet").to_table(
            columns=["c_custkey", "c_nationkey"]).to_pandas()
        cust["nat"] = cust["c_nationkey"].map(nation_map)
        cust = cust[cust["nat"].isin(wanted)]
        ck = cust["c_custkey"].to_numpy(dtype=np.int64)
        order_c = np.argsort(ck)
        cust_ref = ray.put((ck[order_c],
                            cust["nat"].to_numpy(dtype=object)[order_c]))

        def with_cust(df: pd.DataFrame) -> pd.DataFrame:
            cks, cnat = ray.get(cust_ref)
            ok = df["o_custkey"].to_numpy(dtype=np.int64)
            pos = np.searchsorted(cks, ok)
            pos[pos >= len(cks)] = len(cks) - 1 if len(cks) else 0
            hit = (cks[pos] == ok) if len(cks) else np.zeros(
                len(ok), bool)
            df = df[hit].copy()
            df["cust_nation"] = cnat[pos[hit]]
            return df[["o_orderkey", "cust_nation"]]

        orders_nat = orders.map_batches(with_cust, batch_format="pandas")
    else:
        cust_ds = read_table(f"{sf_dir}/customer.parquet",
                             columns=["c_custkey", "c_nationkey"])

        def c_tag(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            df["cust_nation"] = df["c_nationkey"].map(nation_map)
            df = df[df["cust_nation"].isin(wanted)]
            return table_from_pandas(
                df[["c_custkey", "cust_nation"]], preserve_index=False)

        def oc_merge(o_df: pd.DataFrame, c_df: pd.DataFrame
                     ) -> pd.DataFrame:
            m = o_df.merge(c_df, left_on="o_custkey",
                           right_on="c_custkey", how="inner")
            return m[["o_orderkey", "cust_nation"]]

        orders_nat = partitioned_join(
            orders, cust_ds.map_batches(c_tag, batch_format="pyarrow"),
            "o_custkey", "c_custkey", oc_merge, num_buckets=16,
            left_schema=pa.schema([("o_orderkey", pa.int64()),
                                   ("o_custkey", pa.int64())]),
            right_schema=pa.schema([("c_custkey", pa.int64()),
                                    ("cust_nation", pa.string())]))

    def ol_merge(o_df: pd.DataFrame, l_df: pd.DataFrame) -> pd.DataFrame:
        m = o_df.merge(l_df, left_on="o_orderkey", right_on="l_orderkey",
                       how="inner")
        # both ends restricted to the two nations; cross pairs only
        m = m[m["supp_nation"] != m["cust_nation"]]
        return (m.groupby(["supp_nation", "cust_nation", "l_year"],
                          as_index=False).agg(volume=("volume", "sum")))

    part = partitioned_join(
        orders_nat, per_order, "o_orderkey", "l_orderkey", ol_merge,
        num_buckets=16,
        left_schema=pa.schema([("o_orderkey", pa.int64()),
                               ("cust_nation", pa.string())]),
        right_schema=pa.schema([("l_orderkey", pa.int64()),
                                ("supp_nation", pa.string()),
                                ("l_year", pa.int64()),
                                ("volume", pa.float64())]))

    agg = (part.repartition(4)
           .groupby(["supp_nation", "cust_nation", "l_year"])
           .aggregate(Sum("volume", alias_name="volume")))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "supp_nation": df["supp_nation"],
            "cust_nation": df["cust_nation"],
            "l_year": df["l_year"].astype(np.int64),
            "revenue": round_half_up(df["volume"].to_numpy(), 2)})

    return agg.map_batches(final, batch_format="pandas").sort(
        ["supp_nation", "cust_nation", "l_year"])


def q8_market_share(sf_dir: str, nation: str = "NATION_1",
                    region: str = "AMERICA", p_type_val: str = "ECONOMY",
                    date_lo: str = "1995-01-01",
                    date_hi: str = "1997-01-01",
                    broadcast_threshold: int = BROADCAST_ROW_THRESHOLD
                    ) -> rd.Dataset:
    """TPC-H Q8 shape (national market share): the fraction of revenue
    for one part type, sold to customers of one region, that was
    supplied by one nation, per order year. Eight logical tables; the
    widest query in the engine.

    Scale plan (ONE fact-fact shuffle total, same budget as Q7):
    - part is filtered to the type and broadcast as a sorted partkey
      array; lineitem batches keep only matching parts (selectivity
      ~1/|types|) BEFORE anything else happens.
    - supplier x nation broadcasts (suppkey -> supp_nation) once —
      every supplier nation is needed because the denominator is
      all-nation volume.
    - the surviving lineitem rows partial-aggregate volume per
      (l_orderkey, supp_nation); only those partials shuffle.
    - orders are date-pruned AT THE READ, and the region filter on
      customers either broadcasts (sorted custkey array of the
      region's customers, below threshold) or becomes a
      ``partitioned_join`` — customer is fact-sized at TPC-H scale.
    - the reduced lineitem partials meet (o_orderkey, o_year) through
      ``partitioned_join`` on orderkey; per-bucket merges emit
      (o_year, supp_nation) partial sums, so the final groupby moves
      ~|years| x |nations| rows. The market-share division runs on
      that tiny table. Output: (o_year, mkt_share, nation_volume,
      total_volume) sorted by year."""
    from ..stages.hashagg import hash_groupby_agg
    from ..stages.join import partitioned_join

    lo = np.datetime64(date_lo, "us")
    hi = np.datetime64(date_hi, "us")

    nat_t = pads.dataset(f"{sf_dir}/nation.parquet").to_table(
        columns=["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    nation_map = dict(zip(nat_t["n_nationkey"].astype(int),
                          nat_t["n_name"]))
    reg_t = pads.dataset(f"{sf_dir}/region.parquet").to_table(
        columns=["r_regionkey", "r_name"]).to_pandas()
    region_keys = set(reg_t.loc[reg_t["r_name"] == region,
                                "r_regionkey"].astype(int))
    region_nationkeys = set(
        nat_t.loc[nat_t["n_regionkey"].astype(int).isin(region_keys),
                  "n_nationkey"].astype(int))

    part_t = pads.dataset(f"{sf_dir}/part.parquet").to_table(
        columns=["p_partkey", "p_type"],
        filter=pads.field("p_type") == p_type_val)
    part_keys = np.sort(part_t.column("p_partkey").to_numpy(
        zero_copy_only=False).astype(np.int64))
    part_ref = ray.put(part_keys)

    supp = pads.dataset(f"{sf_dir}/supplier.parquet").to_table(
        columns=["s_suppkey", "s_nationkey"]).to_pandas()
    supp["nat"] = supp["s_nationkey"].map(nation_map)
    sk = supp["s_suppkey"].to_numpy(dtype=np.int64)
    order_s = np.argsort(sk)
    supp_ref = ray.put((sk[order_s],
                        supp["nat"].to_numpy(dtype=object)[order_s]))

    items = read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey",
                 "l_extendedprice", "l_discount"])

    def l_partial(df: pd.DataFrame) -> pd.DataFrame:
        pks = ray.get(part_ref)
        lp = df["l_partkey"].to_numpy(dtype=np.int64)
        pos = np.searchsorted(pks, lp)
        pos[pos >= len(pks)] = len(pks) - 1 if len(pks) else 0
        hit = (pks[pos] == lp) if len(pks) else np.zeros(len(lp), bool)
        df = df[hit].copy()
        sks, snat = ray.get(supp_ref)
        ls = df["l_suppkey"].to_numpy(dtype=np.int64)
        spos = np.searchsorted(sks, ls)
        spos[spos >= len(sks)] = len(sks) - 1 if len(sks) else 0
        df["supp_nation"] = snat[spos]
        df["volume"] = df["l_extendedprice"] * (1 - df["l_discount"])
        return (df.groupby(["l_orderkey", "supp_nation"],
                           as_index=False).agg(volume=("volume", "sum")))

    per_order = hash_groupby_agg(
        items.map_batches(l_partial, batch_format="pandas"),
        ["l_orderkey", "supp_nation"],
        {"volume": ("volume", "sum")}, num_parts=16)

    orders = read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter_expr=(pads.field("o_orderdate") >= lo)
        & (pads.field("o_orderdate") < hi))

    if _parquet_num_rows(f"{sf_dir}/customer.parquet") <= broadcast_threshold:
        cust = pads.dataset(f"{sf_dir}/customer.parquet").to_table(
            columns=["c_custkey", "c_nationkey"]).to_pandas()
        cust = cust[cust["c_nationkey"].astype(int).isin(
            region_nationkeys)]
        cust_keys = np.sort(cust["c_custkey"].to_numpy(dtype=np.int64))
        cust_ref = ray.put(cust_keys)

        def o_keep(df: pd.DataFrame) -> pd.DataFrame:
            cks = ray.get(cust_ref)
            df = df[(df["o_orderdate"] >= pd.Timestamp(str(lo)))
                    & (df["o_orderdate"] < pd.Timestamp(str(hi)))]
            ok = df["o_custkey"].to_numpy(dtype=np.int64)
            pos = np.searchsorted(cks, ok)
            pos[pos >= len(cks)] = len(cks) - 1 if len(cks) else 0
            hit = (cks[pos] == ok) if len(cks) else np.zeros(
                len(ok), bool)
            df = df[hit].copy()
            df["o_year"] = df["o_orderdate"].dt.year.astype(np.int64)
            return df[["o_orderkey", "o_year"]]

        orders_kept = orders.map_batches(o_keep, batch_format="pandas")
    else:
        cust_ds = read_table(f"{sf_dir}/customer.parquet",
                             columns=["c_custkey", "c_nationkey"])
        keep_nk = region_nationkeys

        def c_tag(batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            df = df[df["c_nationkey"].astype(int).isin(keep_nk)]
            return table_from_pandas(
                df[["c_custkey"]], preserve_index=False)

        def o_year(df: pd.DataFrame) -> pd.DataFrame:
            df = df[(df["o_orderdate"] >= pd.Timestamp(str(lo)))
                    & (df["o_orderdate"] < pd.Timestamp(str(hi)))].copy()
            df["o_year"] = df["o_orderdate"].dt.year.astype(np.int64)
            return df[["o_orderkey", "o_custkey", "o_year"]]

        def oc_merge(o_df: pd.DataFrame, c_df: pd.DataFrame
                     ) -> pd.DataFrame:
            m = o_df.merge(c_df, left_on="o_custkey",
                           right_on="c_custkey", how="inner")
            return m[["o_orderkey", "o_year"]]

        orders_kept = partitioned_join(
            orders.map_batches(o_year, batch_format="pandas"),
            cust_ds.map_batches(c_tag, batch_format="pyarrow"),
            "o_custkey", "c_custkey", oc_merge, num_buckets=16,
            left_schema=pa.schema([("o_orderkey", pa.int64()),
                                   ("o_custkey", pa.int64()),
                                   ("o_year", pa.int64())]),
            right_schema=pa.schema([("c_custkey", pa.int64())]))

    def ol_merge(o_df: pd.DataFrame, l_df: pd.DataFrame) -> pd.DataFrame:
        m = o_df.merge(l_df, left_on="o_orderkey", right_on="l_orderkey",
                       how="inner")
        return (m.groupby(["o_year", "supp_nation"],
                          as_index=False).agg(volume=("volume", "sum")))

    part = partitioned_join(
        orders_kept, per_order, "o_orderkey", "l_orderkey", ol_merge,
        num_buckets=16,
        left_schema=pa.schema([("o_orderkey", pa.int64()),
                               ("o_year", pa.int64())]),
        right_schema=pa.schema([("l_orderkey", pa.int64()),
                                ("supp_nation", pa.string()),
                                ("volume", pa.float64())]))

    agg = (part.repartition(4)
           .groupby(["o_year", "supp_nation"])
           .aggregate(Sum("volume", alias_name="volume")))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        # tiny table: |years| x |nations| rows — safe to fold per block
        # after a repartition(1) barrier below
        g_tot = df.groupby("o_year", as_index=False).agg(
            total=("volume", "sum"))
        nat = df[df["supp_nation"] == nation].groupby(
            "o_year", as_index=False).agg(nat_vol=("volume", "sum"))
        m = g_tot.merge(nat, on="o_year", how="left")
        m["nat_vol"] = m["nat_vol"].fillna(0.0)
        return pd.DataFrame({
            "o_year": m["o_year"].astype(np.int64),
            "mkt_share": round_half_up(
                (m["nat_vol"] / m["total"]).to_numpy(), 6),
            "nation_volume": round_half_up(m["nat_vol"].to_numpy(), 2),
            "total_volume": round_half_up(m["total"].to_numpy(), 2)})

    return (agg.repartition(1)
            .map_batches(final, batch_format="pandas")
            .sort("o_year"))


def q13_customer_distribution(sf_dir: str,
                              exclude_priority: str = "1-URGENT"
                              ) -> rd.Dataset:
    """TPC-H Q13 shape (customer distribution): histogram of
    per-customer order counts INCLUDING zero-order customers — the
    left-outer-join-then-double-aggregate plan.

    Scale plan: orders reduce to one row per custkey first (two-phase
    hash agg — the narrow shuffle), then customer left-joins that
    reduced side through ``partitioned_join``; each bucket folds its
    joined rows straight into a count-histogram partial, so the final
    groupby moves ~|distinct counts| x |buckets| rows. Output:
    (c_count, custdist) ordered by custdist desc, c_count desc."""
    from ..stages.hashagg import hash_groupby_agg
    from ..stages.join import partitioned_join

    orders = read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderpriority"],
        filter_expr=pads.field("o_orderpriority") != exclude_priority)

    def o_filter(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["o_orderpriority"] != exclude_priority][
            ["o_custkey", "o_orderpriority"]]

    per_cust = hash_groupby_agg(
        orders.map_batches(o_filter, batch_format="pandas"),
        ["o_custkey"], {"c_count": ("o_orderpriority", "count")},
        num_parts=32)

    cust = read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey"])

    def hist_merge(c_df: pd.DataFrame, o_df: pd.DataFrame) -> pd.DataFrame:
        m = c_df.merge(o_df, left_on="c_custkey", right_on="o_custkey",
                       how="left")
        cc = m["c_count"].fillna(0).astype(np.int64)
        return (cc.value_counts().rename_axis("c_count")
                .reset_index(name="custdist"))

    part = partitioned_join(
        cust, per_cust, "c_custkey", "o_custkey", hist_merge,
        left_schema=pa.schema([("c_custkey", pa.int64())]),
        right_schema=pa.schema([("o_custkey", pa.int64()),
                                ("c_count", pa.int64())]))

    agg = (part.repartition(4).groupby("c_count")
           .aggregate(Sum("custdist", alias_name="custdist")))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "c_count": df["c_count"].astype(np.int64),
            "custdist": df["custdist"].astype(np.int64)})

    return agg.map_batches(final, batch_format="pandas").sort(
        ["custdist", "c_count"], descending=[True, True])


def q15_top_supplier(sf_dir: str, date_lo: str = "1996-01-01"
                     ) -> rd.Dataset:
    """TPC-H Q15 shape (top supplier): the supplier(s) whose 3-month
    revenue equals the global maximum — an aggregate feeding a scalar
    max back into a filter over itself.

    Scale plan: lineitem reduces to one row per suppkey (two-phase
    hash agg); that REDUCED table is materialized once (it is
    supplier-cardinality, the only safe thing to multi-consume), the
    max is a driver scalar over it, and the ties-at-max filter plus
    the supplier-name attach (dimension broadcast) run per batch.
    Output: (s_suppkey, s_name, total_revenue) ordered by suppkey."""
    from ..stages.hashagg import hash_groupby_agg

    lo = np.datetime64(date_lo, "us")
    y, m = int(date_lo[:4]), int(date_lo[5:7])
    ny, nm = (y + 1, m - 9) if m > 9 else (y, m + 3)
    hi = np.datetime64(f"{ny}-{nm:02d}-01", "us")

    items = read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount",
                 "l_shipdate"],
        filter_expr=(pads.field("l_shipdate") >= lo)
        & (pads.field("l_shipdate") < hi))

    def l_partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[(df["l_shipdate"] >= pd.Timestamp(str(lo)))
                & (df["l_shipdate"] < pd.Timestamp(str(hi)))].copy()
        df["rev"] = df["l_extendedprice"] * (1 - df["l_discount"])
        return df.groupby("l_suppkey", as_index=False).agg(
            total_revenue=("rev", "sum"))

    rev = hash_groupby_agg(
        items.map_batches(l_partial, batch_format="pandas"),
        ["l_suppkey"], {"total_revenue": ("total_revenue", "sum")},
        num_parts=16).materialize()
    mx = rev.max("total_revenue")

    supp = pads.dataset(f"{sf_dir}/supplier.parquet").to_table(
        columns=["s_suppkey", "s_name"]).to_pandas()
    sk = supp["s_suppkey"].to_numpy(dtype=np.int64)
    order_s = np.argsort(sk)
    supp_ref = ray.put((sk[order_s],
                        supp["s_name"].to_numpy(dtype=object)[order_s]))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["total_revenue"] == mx].copy()
        sks, snames = ray.get(supp_ref)
        pos = np.searchsorted(sks, df["l_suppkey"].to_numpy(np.int64))
        return pd.DataFrame({
            "s_suppkey": df["l_suppkey"].astype(np.int64),
            "s_name": snames[pos],
            "total_revenue": round_half_up(
                df["total_revenue"].to_numpy(), 2)})

    return rev.map_batches(final, batch_format="pandas").sort("s_suppkey")


def q17_small_quantity_revenue(sf_dir: str, brand: str = "Brand#1",
                               qty_factor: float = 0.2) -> rd.Dataset:
    """TPC-H Q17 shape (small-quantity-order revenue): revenue from
    lineitems of one brand whose quantity is below 20% of that part's
    own average — the correlated per-group-average subquery.

    Scale plan: the brand filter broadcasts a sorted partkey array so
    both passes over lineitem keep only ~1/|brands| of rows at the
    read edge; pass 1 reduces to per-part (sum, count) via the
    two-phase hash agg; pass 2 re-meets the filtered rows through a
    ``partitioned_join`` on partkey whose per-bucket merge applies the
    qty < factor x avg cut and folds straight to one partial-revenue
    row — so only |buckets| rows reach the final fold (the SQL scans
    lineitem twice the same way). Output: one row
    (avg_yearly = sum(l_extendedprice)/7, per the TPC-H formula)."""
    from ..stages.hashagg import hash_groupby_agg
    from ..stages.join import partitioned_join

    part_t = pads.dataset(f"{sf_dir}/part.parquet").to_table(
        columns=["p_partkey"],
        filter=pads.field("p_brand") == brand)
    pks = np.sort(part_t.column("p_partkey").to_numpy(
        zero_copy_only=False).astype(np.int64))
    part_ref = ray.put(pks)

    def kept(sf: str) -> rd.Dataset:
        items = read_table(
            f"{sf}/lineitem.parquet",
            columns=["l_partkey", "l_quantity", "l_extendedprice"])

        def keep(df: pd.DataFrame) -> pd.DataFrame:
            ks = ray.get(part_ref)
            lp = df["l_partkey"].to_numpy(dtype=np.int64)
            pos = np.searchsorted(ks, lp)
            pos[pos >= len(ks)] = len(ks) - 1 if len(ks) else 0
            hit = (ks[pos] == lp) if len(ks) else np.zeros(len(lp), bool)
            return df[hit]

        return items.map_batches(keep, batch_format="pandas")

    per_part = hash_groupby_agg(
        kept(sf_dir), ["l_partkey"],
        {"sum_qty": ("l_quantity", "sum"),
         "n_items": ("l_quantity", "count")}, num_parts=16)

    def cut_merge(l_df: pd.DataFrame, a_df: pd.DataFrame) -> pd.DataFrame:
        a_df = a_df.rename(columns={"l_partkey": "p_key"})
        m = l_df.merge(a_df, left_on="l_partkey", right_on="p_key",
                       how="inner")
        avg_q = m["sum_qty"] / m["n_items"]
        kept_rev = m.loc[m["l_quantity"] < qty_factor * avg_q,
                         "l_extendedprice"].sum()
        return pd.DataFrame({"rev": [float(kept_rev)]})

    part = partitioned_join(
        kept(sf_dir), per_part, "l_partkey", "l_partkey", cut_merge,
        num_buckets=16,
        left_schema=pa.schema([("l_partkey", pa.int64()),
                               ("l_quantity", pa.float64()),
                               ("l_extendedprice", pa.float64())]),
        right_schema=pa.schema([("l_partkey", pa.int64()),
                                ("sum_qty", pa.float64()),
                                ("n_items", pa.int64())]))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"avg_yearly": round_half_up(
            np.array([df["rev"].sum() / 7.0]), 2)})

    return part.repartition(1).map_batches(final, batch_format="pandas")


def q19_disjunctive_revenue(
        sf_dir: str,
        branches: tuple = (("Brand#1", 1, 15, 1.0, 11.0),
                           ("Brand#2", 1, 25, 10.0, 20.0),
                           ("Brand#3", 1, 35, 20.0, 30.0))
        ) -> rd.Dataset:
    """TPC-H Q19 shape (discounted revenue, disjunctive predicate):
    revenue from lineitems matching ANY of several (brand, size-range,
    quantity-range) conjunctions — the OR-of-conjunctions join filter
    that defeats naive predicate pushdown.

    Scale plan: part compiles once into a broadcast sorted
    (partkey, branch-bitmask) pair — bit i set iff the part satisfies
    branch i's brand+size terms; every lineitem batch then evaluates
    the whole disjunction vectorized (bitmask lookup AND quantity
    range per branch) and folds to one partial-revenue row, so
    nothing but |blocks| scalars ever shuffles. Output: one row
    (revenue)."""
    part_t = pads.dataset(f"{sf_dir}/part.parquet").to_table(
        columns=["p_partkey", "p_brand", "p_size"])
    pk = part_t.column("p_partkey").to_numpy(
        zero_copy_only=False).astype(np.int64)
    brand_arr = np.asarray(part_t.column("p_brand").to_pylist(),
                           dtype=object)
    size_arr = part_t.column("p_size").to_numpy(
        zero_copy_only=False).astype(np.int64)
    mask = np.zeros(len(pk), dtype=np.uint8)
    for i, (b, s_lo, s_hi, _, _) in enumerate(branches):
        mask |= ((brand_arr == b) & (size_arr >= s_lo)
                 & (size_arr <= s_hi)).astype(np.uint8) << i
    keep = mask != 0
    order = np.argsort(pk[keep])
    part_ref = ray.put((pk[keep][order], mask[keep][order]))
    qty_ranges = [(q_lo, q_hi) for (_, _, _, q_lo, q_hi) in branches]

    items = read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice",
                 "l_discount"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ks, ms = ray.get(part_ref)
        lp = df["l_partkey"].to_numpy(dtype=np.int64)
        pos = np.searchsorted(ks, lp)
        pos[pos >= len(ks)] = len(ks) - 1 if len(ks) else 0
        hit = (ks[pos] == lp) if len(ks) else np.zeros(len(lp), bool)
        bm = np.where(hit, ms[pos], 0)
        qty = df["l_quantity"].to_numpy(dtype=np.float64)
        sel = np.zeros(len(df), dtype=bool)
        for i, (q_lo, q_hi) in enumerate(qty_ranges):
            sel |= ((bm & (1 << i)) != 0) & (qty >= q_lo) & (qty <= q_hi)
        rev = (df["l_extendedprice"].to_numpy()[sel]
               * (1 - df["l_discount"].to_numpy()[sel])).sum()
        return pd.DataFrame({"rev": [float(rev)]})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"revenue": round_half_up(
            np.array([df["rev"].sum()]), 2)})

    return (items.map_batches(partial, batch_format="pandas")
            .repartition(1).map_batches(final, batch_format="pandas"))


def q22_balance_opportunity(sf_dir: str,
                            nationkeys: tuple = (1, 5, 9, 13, 17, 21),
                            exclude_priority: str = "1-URGENT"
                            ) -> rd.Dataset:
    """TPC-H Q22 shape (global sales opportunity): customers from a
    set of country codes with above-average positive balance and NO
    urgent order — scalar-average subquery + anti-join + group.

    Scale plan: the average is a driver scalar folded from one-row
    per-block partials (never the rows); the anti side reduces orders
    to one row per urgent custkey via the two-phase hash agg BEFORE
    the ``partitioned_join``, whose per-bucket merge does the
    left-anti mask and folds straight to per-nation partials. Output:
    (cntrycode, numcust, totacctbal) ordered by cntrycode."""
    from ..stages.hashagg import hash_groupby_agg
    from ..stages.join import partitioned_join

    keyset = set(int(k) for k in nationkeys)

    cust = read_table(f"{sf_dir}/customer.parquet",
                      columns=["c_custkey", "c_nationkey", "c_acctbal"])

    def avg_partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df[(df["c_nationkey"].astype(int).isin(keyset))
               & (df["c_acctbal"] > 0.0)]
        return pd.DataFrame({"s": [float(d["c_acctbal"].sum())],
                             "n": [int(len(d))]})

    stats = cust.map_batches(
        avg_partial, batch_format="pandas").to_pandas()
    avg_bal = float(stats["s"].sum()) / max(int(stats["n"].sum()), 1)

    def c_filter(df: pd.DataFrame) -> pd.DataFrame:
        d = df[(df["c_nationkey"].astype(int).isin(keyset))
               & (df["c_acctbal"] > avg_bal)]
        return d[["c_custkey", "c_nationkey", "c_acctbal"]]

    cand = cust.map_batches(c_filter, batch_format="pandas")

    orders = read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderpriority"],
        filter_expr=pads.field("o_orderpriority") == exclude_priority)

    def o_filter(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["o_orderpriority"] == exclude_priority][
            ["o_custkey", "o_orderpriority"]]

    urgent = hash_groupby_agg(
        orders.map_batches(o_filter, batch_format="pandas"),
        ["o_custkey"], {"n_urgent": ("o_orderpriority", "count")},
        num_parts=16)

    def anti_merge(c_df: pd.DataFrame, o_df: pd.DataFrame) -> pd.DataFrame:
        keep = ~c_df["c_custkey"].isin(o_df["o_custkey"])
        d = c_df[keep]
        return (d.groupby("c_nationkey", as_index=False)
                .agg(numcust=("c_custkey", "size"),
                     totacctbal=("c_acctbal", "sum")))

    part = partitioned_join(
        cand, urgent, "c_custkey", "o_custkey", anti_merge,
        num_buckets=16,
        left_schema=pa.schema([("c_custkey", pa.int64()),
                               ("c_nationkey", pa.int64()),
                               ("c_acctbal", pa.float64())]),
        right_schema=pa.schema([("o_custkey", pa.int64()),
                                ("n_urgent", pa.int64())]))

    agg = (part.repartition(4).groupby("c_nationkey")
           .aggregate(Sum("numcust", alias_name="numcust"),
                      Sum("totacctbal", alias_name="totacctbal")))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "cntrycode": df["c_nationkey"].astype(np.int64),
            "numcust": df["numcust"].astype(np.int64),
            "totacctbal": round_half_up(df["totacctbal"].to_numpy(), 2)})

    return agg.map_batches(final, batch_format="pandas").sort("cntrycode")


def quantity_price_stats(sf_dir: str) -> rd.Dataset:
    """Distributed second-moment statistics: Pearson correlation,
    sample covariance and sample standard deviations of
    (l_quantity, l_extendedprice) — the mergeable-moments pattern
    (generalizes the reference's global eval stats G2,
    ``evaluate_new_testdata.py:82-118``, from means to covariance).

    Scale plan: each block folds to ONE row of raw power sums
    (n, sx, sy, sxx, syy, sxy) — the classic mergeable sufficient
    statistic — so the exchange is |blocks| rows regardless of input
    size; the closed-form corr/covar/stddev runs once on the driver-
    side fold. No shuffle, no second pass. Output: one row
    (n_items, corr_qty_price, covar_qty_price, stddev_qty,
    stddev_price)."""
    ds = read_table(f"{sf_dir}/lineitem.parquet",
                    columns=["l_quantity", "l_extendedprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = df["l_quantity"].to_numpy(dtype=np.float64)
        y = df["l_extendedprice"].to_numpy(dtype=np.float64)
        return pd.DataFrame({
            "n": [len(x)], "sx": [x.sum()], "sy": [y.sum()],
            "sxx": [(x * x).sum()], "syy": [(y * y).sum()],
            "sxy": [(x * y).sum()]})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        n = float(df["n"].sum())
        sx, sy = df["sx"].sum(), df["sy"].sum()
        sxx, syy, sxy = df["sxx"].sum(), df["syy"].sum(), df["sxy"].sum()
        covar = (sxy - sx * sy / n) / (n - 1)
        varx = (sxx - sx * sx / n) / (n - 1)
        vary = (syy - sy * sy / n) / (n - 1)
        corr = covar / np.sqrt(varx * vary)
        return pd.DataFrame({
            "n_items": [int(n)],
            "corr_qty_price": round_half_up(np.array([corr]), 6),
            "covar_qty_price": round_half_up(np.array([covar]), 2),
            "stddev_qty": round_half_up(np.array([np.sqrt(varx)]), 4),
            "stddev_price": round_half_up(np.array([np.sqrt(vary)]), 4)})

    return (ds.map_batches(partial, batch_format="pandas")
            .repartition(1).map_batches(final, batch_format="pandas"))


def quantity_stats_by_flag(sf_dir: str) -> rd.Dataset:
    """GROUPED second-moment statistics: per-returnflag mean and
    sample standard deviation of l_quantity via the same mergeable
    power sums, pushed through the two-phase hash aggregate — the
    grouped variant of ``quantity_price_stats``. Output:
    (l_returnflag, n_items, avg_qty, stddev_qty) sorted by flag."""
    from ..stages.hashagg import hash_groupby_agg

    ds = read_table(f"{sf_dir}/lineitem.parquet",
                    columns=["l_returnflag", "l_quantity"])

    def derive(df: pd.DataFrame) -> pd.DataFrame:
        q = df["l_quantity"].to_numpy(dtype=np.float64)
        return pd.DataFrame({"l_returnflag": df["l_returnflag"],
                             "q": q, "qq": q * q})

    agg = hash_groupby_agg(
        ds.map_batches(derive, batch_format="pandas"),
        ["l_returnflag"],
        {"n_items": ("q", "count"), "sq": ("q", "sum"),
         "sqq": ("qq", "sum")}, num_parts=4)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n_items"].to_numpy(dtype=np.float64)
        sq = df["sq"].to_numpy()
        sqq = df["sqq"].to_numpy()
        var = (sqq - sq * sq / n) / (n - 1)
        return pd.DataFrame({
            "l_returnflag": df["l_returnflag"],
            "n_items": df["n_items"].astype(np.int64),
            "avg_qty": round_half_up(sq / n, 4),
            "stddev_qty": round_half_up(np.sqrt(var), 4)})

    return agg.map_batches(final, batch_format="pandas").sort(
        "l_returnflag")


def fully_returned_orders(sf_dir: str, flag: str = "R") -> rd.Dataset:
    """Relational DIVISION (FOR-ALL semantics): orders where EVERY
    lineitem carries return flag ``flag``, counted per order priority —
    the universal-quantifier shape (HAVING count(*) = count(matching)).

    Scale plan: lineitem reduces to per-order (n_items, n_match)
    partials inside map_batches, the two-phase hash agg finishes them,
    the division predicate filters order-cardinality rows, and the
    surviving keyset joins orders through ``partitioned_join`` with a
    per-bucket grouped count — one fact-fact shuffle total. Output:
    (o_orderpriority, order_count) ordered by priority."""
    from ..stages.hashagg import hash_groupby_agg
    from ..stages.join import partitioned_join

    items = read_table(f"{sf_dir}/lineitem.parquet",
                       columns=["l_orderkey", "l_returnflag"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["m"] = (df["l_returnflag"] == flag).astype(np.int64)
        return df.groupby("l_orderkey", as_index=False).agg(
            n_items=("m", "size"), n_match=("m", "sum"))

    per_order = hash_groupby_agg(
        items.map_batches(partial, batch_format="pandas"),
        ["l_orderkey"],
        {"n_items": ("n_items", "sum"), "n_match": ("n_match", "sum")},
        num_parts=16)

    def divide(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["n_items"] == df["n_match"]][["l_orderkey"]]

    keys = per_order.map_batches(divide, batch_format="pandas")

    orders = read_table(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_orderpriority"])

    def count_merge(o_df: pd.DataFrame, k_df: pd.DataFrame) -> pd.DataFrame:
        m = o_df[o_df["o_orderkey"].isin(k_df["l_orderkey"])]
        return (m.groupby("o_orderpriority", as_index=False)
                .agg(order_count=("o_orderkey", "size")))

    part = partitioned_join(
        orders, keys, "o_orderkey", "l_orderkey", count_merge,
        num_buckets=16,
        left_schema=pa.schema([("o_orderkey", pa.int64()),
                               ("o_orderpriority", pa.string())]),
        right_schema=pa.schema([("l_orderkey", pa.int64())]))

    agg = (part.repartition(2).groupby("o_orderpriority")
           .aggregate(Sum("order_count", alias_name="order_count")))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_orderpriority": df["o_orderpriority"],
            "order_count": df["order_count"].astype(np.int64)})

    return agg.map_batches(final, batch_format="pandas").sort(
        "o_orderpriority")


def daily_revenue_delta(sf_dir: str, year: str = "1997") -> rd.Dataset:
    """Ordered time-series window AFTER aggregation: one year's
    per-day lineitem revenue with the day-over-day delta (LAG over the
    globally ordered day series — the series is day-cardinality, so
    the ordered window runs on one block after the distributed
    reduce). Output: (day, revenue, delta) ordered by day; the first
    day's delta is 0."""
    from ..stages.hashagg import hash_groupby_agg

    lo = np.datetime64(f"{year}-01-01", "us")
    hi = np.datetime64(f"{int(year) + 1}-01-01", "us")
    items = read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_shipdate", "l_extendedprice", "l_discount"],
        filter_expr=(pads.field("l_shipdate") >= lo)
        & (pads.field("l_shipdate") < hi))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[(df["l_shipdate"] >= pd.Timestamp(str(lo)))
                & (df["l_shipdate"] < pd.Timestamp(str(hi)))].copy()
        df["day"] = df["l_shipdate"].dt.strftime("%Y-%m-%d")
        # FIXED-POINT money sum: price x (1-discount) is exact at 4
        # decimals, so summing integral 10^-4 units keeps every partial
        # exact in doubles (< 2^53) and the total ORDER-INDEPENDENT —
        # a float sum can land within 1e-9 of a .xx5 boundary and round
        # differently from the oracle depending on summation order
        # (observed at sf0.01).
        df["rev"] = np.rint(df["l_extendedprice"].to_numpy()
                            * (1 - df["l_discount"].to_numpy()) * 1e4)
        return df.groupby("day", as_index=False).agg(rev=("rev", "sum"))

    per_day = hash_groupby_agg(
        items.map_batches(partial, batch_format="pandas"),
        ["day"], {"rev": ("rev", "sum")}, num_parts=8)

    def window(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("day").reset_index(drop=True)
        rev = round_half_up(df["rev"].to_numpy() / 1e4, 2)
        prev = np.concatenate([rev[:1], rev[:-1]])
        return pd.DataFrame({
            "day": df["day"],
            "revenue": rev,
            "delta": round_half_up(rev - prev, 2)})

    return (per_day.repartition(1)
            .map_batches(window, batch_format="pandas").sort("day"))


def daily_order_ship_counts(sf_dir: str) -> rd.Dataset:
    """FULL OUTER join exposure: per-day order counts vs per-day
    lineitem ship counts, keeping days present on EITHER side (the
    date ranges genuinely differ at both ends, so outer rows exist on
    both sides).

    Scale plan: each fact table reduces to one row per day (two-phase
    hash agg, day-cardinality output) BEFORE the join; the
    ``partitioned_join`` bucket merge is a pandas outer merge whose
    key is coalesced and missing counts filled with 0 — no broadcast,
    no driver materialization. Output: (day, n_orders, n_ships)
    ordered by day."""
    from ..stages.hashagg import hash_groupby_agg
    from ..stages.join import partitioned_join

    orders = read_table(f"{sf_dir}/orders.parquet",
                        columns=["o_orderdate"])

    def o_day(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"d": df["o_orderdate"].dt.strftime("%Y-%m-%d")})

    per_day_o = hash_groupby_agg(
        orders.map_batches(o_day, batch_format="pandas"),
        ["d"], {"n_orders": ("d", "count")}, num_parts=8)

    items = read_table(f"{sf_dir}/lineitem.parquet",
                       columns=["l_shipdate"])

    def l_day(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"ld": df["l_shipdate"].dt.strftime("%Y-%m-%d")})

    per_day_l = hash_groupby_agg(
        items.map_batches(l_day, batch_format="pandas"),
        ["ld"], {"n_ships": ("ld", "count")}, num_parts=8)

    def outer_merge(o_df: pd.DataFrame, l_df: pd.DataFrame) -> pd.DataFrame:
        m = o_df.merge(l_df, left_on="d", right_on="ld", how="outer")
        day = m["d"].where(m["d"].notna(), m["ld"])
        return pd.DataFrame({
            "day": day,
            "n_orders": m["n_orders"].fillna(0).astype(np.int64),
            "n_ships": m["n_ships"].fillna(0).astype(np.int64)})

    out = partitioned_join(
        per_day_o, per_day_l, "d", "ld", outer_merge, num_buckets=16,
        left_schema=pa.schema([("d", pa.string()),
                               ("n_orders", pa.int64())]),
        right_schema=pa.schema([("ld", pa.string()),
                                ("n_ships", pa.int64())]))
    return out.sort("day")


def top_orders_per_priority(sf_dir: str, k: int = 3) -> rd.Dataset:
    """Explicit ranking window: the k highest-totalprice orders per
    o_orderpriority WITH their rank column — SQL ``ROW_NUMBER() OVER
    (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC,
    o_orderkey)`` filtered to rnk <= k (deterministic tie-break on
    orderkey so row_number == rank).

    Plan: per-batch partial top-k per priority (each input block
    contributes at most k x |priorities| rows — the partial top-k
    pattern of O3), then a tiny ``groupby(priority).map_groups`` final
    sort assigns ranks; the shuffle carries k x blocks x 5 rows, never
    the orders table. Output: (o_orderpriority, o_orderkey,
    o_totalprice, rnk) sorted by (priority, rnk)."""
    ds = read_table(f"{sf_dir}/orders.parquet",
                    columns=["o_orderkey", "o_orderpriority",
                             "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values(["o_totalprice", "o_orderkey"],
                               ascending=[False, True])
                .groupby("o_orderpriority", as_index=False).head(k))

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_totalprice", "o_orderkey"],
                          ascending=[False, True]).head(k).copy()
        g["rnk"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["o_orderpriority", "o_orderkey", "o_totalprice",
                  "rnk"]]

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby("o_orderpriority")
            .map_groups(final, batch_format="pandas")
            .sort(["o_orderpriority", "rnk"]))


def q9_product_type_profit(sf_dir: str, name_like: str = "red"
                           ) -> rd.Dataset:
    """TPC-H Q9 shape (product-type profit): revenue from parts whose
    name contains ``name_like``, grouped by the supplier's nation and
    the order year. Five tables; the only fact-fact edge is
    lineitem->orders (for the year), taken through ONE partitioned
    orderkey shuffle of per-(orderkey, nation) partial sums — never raw
    lineitem rows. part ships as a broadcast sorted matching-key array
    and supplier->nation as a broadcast dim map (supplier/nation are
    dims; at 100 TB part crosses the threshold and the match set
    becomes a partitioned semi-join, the downstream shape unchanged).
    Money partials are fixed-point 1e-4 units (order-independent exact
    sums). Output: (nation, o_year, profit) sorted nation asc, year
    desc.

    Reference analogue: the per-category grouped revenue shape of
    evaluate_new_testdata.py:82-163 widened to a multi-dim fact join."""
    from ..stages.hashagg import hash_groupby_agg
    from ..stages.join import partitioned_join

    part_t = pads.dataset(f"{sf_dir}/part.parquet").to_table(
        columns=["p_partkey", "p_name"])
    pk = part_t.column("p_partkey").to_numpy(
        zero_copy_only=False).astype(np.int64)
    match = np.asarray(
        [name_like in n for n in part_t.column("p_name").to_pylist()],
        dtype=bool)
    pkeys = np.sort(pk[match])

    supp_t = pads.dataset(f"{sf_dir}/supplier.parquet").to_table(
        columns=["s_suppkey", "s_nationkey"])
    nation_t = pads.dataset(f"{sf_dir}/nation.parquet").to_table(
        columns=["n_nationkey", "n_name"])
    nmap = dict(zip(nation_t.column("n_nationkey").to_pylist(),
                    nation_t.column("n_name").to_pylist()))
    sk = supp_t.column("s_suppkey").to_numpy(
        zero_copy_only=False).astype(np.int64)
    snat = np.asarray([nmap[k] for k in
                       supp_t.column("s_nationkey").to_pylist()],
                      dtype=object)
    ss = np.argsort(sk)
    side_ref = ray.put((pkeys, sk[ss], snat[ss]))

    items = read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey",
                 "l_extendedprice", "l_discount"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        pks, sks, nats = ray.get(side_ref)
        lp = df["l_partkey"].to_numpy(dtype=np.int64)
        pos = np.searchsorted(pks, lp)
        pos[pos >= len(pks)] = len(pks) - 1 if len(pks) else 0
        hit = (pks[pos] == lp) if len(pks) else np.zeros(len(lp), bool)
        df = df[hit].copy()
        lsk = df["l_suppkey"].to_numpy(dtype=np.int64)
        spos = np.searchsorted(sks, lsk)
        df["nation"] = nats[spos]
        # fixed-point 1e-4 money units: exact, order-independent
        df["rev"] = np.rint(df["l_extendedprice"].to_numpy()
                            * (1 - df["l_discount"].to_numpy())
                            * 1e4).astype(np.int64)
        return df.groupby(["l_orderkey", "nation"], as_index=False).agg(
            rev=("rev", "sum"))

    lpart = items.map_batches(partial, batch_format="pandas")
    orders = read_table(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_orderdate"])

    def merge(lf: pd.DataFrame, of: pd.DataFrame) -> pd.DataFrame:
        m = lf.merge(of, left_on="l_orderkey", right_on="o_orderkey",
                     how="inner")
        m["o_year"] = m["o_orderdate"].dt.year.astype(np.int64)
        return m.groupby(["nation", "o_year"], as_index=False).agg(
            rev=("rev", "sum"))

    joined = partitioned_join(
        lpart, orders, "l_orderkey", "o_orderkey", merge,
        num_buckets=32,
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("nation", pa.string()),
                               ("rev", pa.int64())]),
        right_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("o_orderdate", pa.timestamp("us"))]))

    agg = hash_groupby_agg(joined, ["nation", "o_year"],
                           {"rev": ("rev", "sum")}, num_parts=4)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "nation": df["nation"],
            "o_year": df["o_year"].astype(np.int64),
            "profit": round_half_up(df["rev"].to_numpy() / 1e4, 2)})

    return (agg.map_batches(final, batch_format="pandas")
            .sort(["nation", "o_year"], descending=[False, True]))


def q11_important_parts(sf_dir: str, nationkey: int = 3,
                        fraction: float = 0.001) -> rd.Dataset:
    """TPC-H Q11 shape (important stock): per-part revenue from
    suppliers of one nation, keeping parts whose value exceeds
    ``fraction`` of the nation's total — a grouped aggregate HAVING a
    GLOBAL scalar threshold. The per-part reduce runs once and is
    materialized (REDUCED, part-cardinality — the q15 pattern for
    multi-consumer intermediates); the scalar total folds from one-row
    block partials (O(blocks) exchange), then a broadcast filter. The
    supplier->nation restriction is a broadcast dim keyset. Fixed-point
    1e-4 money units keep the threshold compare exact and
    order-independent. Output: (l_partkey, value) sorted value desc,
    partkey."""
    from ..stages.hashagg import hash_groupby_agg

    supp_t = pads.dataset(f"{sf_dir}/supplier.parquet").to_table(
        columns=["s_suppkey", "s_nationkey"],
        filter=pads.field("s_nationkey") == nationkey)
    skeys = np.sort(supp_t.column("s_suppkey").to_numpy(
        zero_copy_only=False).astype(np.int64))
    skeys_ref = ray.put(skeys)

    items = read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_extendedprice",
                 "l_discount"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ks = ray.get(skeys_ref)
        lsk = df["l_suppkey"].to_numpy(dtype=np.int64)
        pos = np.searchsorted(ks, lsk)
        pos[pos >= len(ks)] = len(ks) - 1 if len(ks) else 0
        hit = (ks[pos] == lsk) if len(ks) else np.zeros(len(lsk), bool)
        df = df[hit].copy()
        df["v"] = np.rint(df["l_extendedprice"].to_numpy()
                          * (1 - df["l_discount"].to_numpy())
                          * 1e4).astype(np.int64)
        return df.groupby("l_partkey", as_index=False).agg(v=("v", "sum"))

    reduced = hash_groupby_agg(
        items.map_batches(partial, batch_format="pandas"),
        ["l_partkey"], {"v": ("v", "sum")}, num_parts=16).materialize()

    total_parts = reduced.map_batches(
        lambda df: pd.DataFrame({"t": [np.int64(df["v"].sum())]}),
        batch_format="pandas").to_pandas()
    total = float(total_parts["t"].sum())
    thresh = total * fraction

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["v"].to_numpy() > thresh].copy()
        return pd.DataFrame({
            "l_partkey": df["l_partkey"].astype(np.int64),
            "value": round_half_up(df["v"].to_numpy() / 1e4, 2)})

    return (reduced.map_batches(final, batch_format="pandas")
            .sort(["value", "l_partkey"], descending=[True, False]))


def q12_ship_lag(sf_dir: str, lag_days: int = 90,
                 broadcast_threshold: int = BROADCAST_ROW_THRESHOLD
                 ) -> rd.Dataset:
    """TPC-H Q12 shape (shipping-mode delay classes, adapted — the
    corpus carries no commit/receipt dates or shipmode): per
    o_orderpriority, how many lineitems shipped MORE than ``lag_days``
    after their order date (late) vs within it (ontime) — a fact-fact
    join whose predicate needs columns from BOTH sides (cross-table
    date arithmetic), then a conditional aggregate. Below the
    broadcast threshold the order side ships once as sorted
    (orderkey, date-int64, priority-code) arrays probed per lineitem
    batch; above it the same classify runs inside ``partitioned_join``
    buckets. Counts pre-aggregate per batch/bucket so the final
    exchange is ~5 rows per partial. Output: (o_orderpriority,
    late_count, ontime_count) sorted by priority."""
    from ..stages.hashagg import hash_groupby_agg
    from ..stages.join import partitioned_join

    items = read_table(f"{sf_dir}/lineitem.parquet",
                       columns=["l_orderkey", "l_shipdate"])
    lag_ns = np.int64(lag_days) * np.int64(86_400_000_000_000)

    if _parquet_num_rows(f"{sf_dir}/orders.parquet") <= broadcast_threshold:
        ot = pads.dataset(f"{sf_dir}/orders.parquet").to_table(
            columns=["o_orderkey", "o_orderdate", "o_orderpriority"])
        ok = ot.column("o_orderkey").to_numpy(
            zero_copy_only=False).astype(np.int64)
        od = ot.column("o_orderdate").to_pandas().to_numpy(
            dtype="datetime64[ns]").view(np.int64)
        prio = np.asarray(ot.column("o_orderpriority").to_pylist(),
                          dtype=object)
        os_ = np.argsort(ok)
        side_ref = ray.put((ok[os_], od[os_], prio[os_]))

        def probe(df: pd.DataFrame) -> pd.DataFrame:
            oks, ods, prios = ray.get(side_ref)
            lk = df["l_orderkey"].to_numpy(dtype=np.int64)
            pos = np.searchsorted(oks, lk)
            ship = df["l_shipdate"].to_numpy(
                dtype="datetime64[ns]").view(np.int64)
            late = ship > ods[pos] + lag_ns
            out = pd.DataFrame({
                "o_orderpriority": prios[pos],
                "late": late.astype(np.int64),
                "ontime": (~late).astype(np.int64)})
            return out.groupby("o_orderpriority", as_index=False).agg(
                late_count=("late", "sum"), ontime_count=("ontime", "sum"))

        part = items.map_batches(probe, batch_format="pandas")
    else:
        orders = read_table(f"{sf_dir}/orders.parquet",
                            columns=["o_orderkey", "o_orderdate",
                                     "o_orderpriority"])

        def merge(lf: pd.DataFrame, of: pd.DataFrame) -> pd.DataFrame:
            m = lf.merge(of, left_on="l_orderkey", right_on="o_orderkey",
                         how="inner")
            ship = m["l_shipdate"].to_numpy(
                dtype="datetime64[ns]").view(np.int64)
            od = m["o_orderdate"].to_numpy(
                dtype="datetime64[ns]").view(np.int64)
            late = ship > od + lag_ns
            m["late"] = late.astype(np.int64)
            m["ontime"] = (~late).astype(np.int64)
            return m.groupby("o_orderpriority", as_index=False).agg(
                late_count=("late", "sum"), ontime_count=("ontime", "sum"))

        part = partitioned_join(
            items, orders, "l_orderkey", "o_orderkey", merge,
            num_buckets=32,
            left_schema=pa.schema([("l_orderkey", pa.int64()),
                                   ("l_shipdate", pa.timestamp("us"))]),
            right_schema=pa.schema([("o_orderkey", pa.int64()),
                                    ("o_orderdate", pa.timestamp("us")),
                                    ("o_orderpriority", pa.string())]))

    agg = hash_groupby_agg(part, ["o_orderpriority"],
                           {"late_count": ("late_count", "sum"),
                            "ontime_count": ("ontime_count", "sum")},
                           num_parts=4)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df["late_count"] = df["late_count"].astype(np.int64)
        df["ontime_count"] = df["ontime_count"].astype(np.int64)
        return df[["o_orderpriority", "late_count", "ontime_count"]]

    return (agg.map_batches(final, batch_format="pandas")
            .sort("o_orderpriority"))


def q16_part_supplier_counts(sf_dir: str) -> rd.Dataset:
    """TPC-H Q16 shape (parts/supplier relationship): the number of
    DISTINCT suppliers that have shipped each (p_brand, p_size)
    combination, excluding "complaint" suppliers (stand-in predicate:
    s_acctbal < 0 — the corpus carries no comment column). The corpus
    has no partsupp table, so lineitem is the part-supplier bridge:
    the (partkey, suppkey) pair set dedups through the two-phase hash
    aggregate (shuffle volume one row per distinct pair per batch),
    the exclusion set broadcasts (dim-bounded), part attributes
    broadcast as sorted arrays (at 100 TB part crosses the threshold
    and attaches via partitioned join — the downstream double-distinct
    shape is unchanged), then (brand, size, suppkey) dedups again and
    a grouped count finishes. Output: (p_brand, p_size, supplier_cnt)
    sorted cnt desc, brand, size."""
    from ..stages.hashagg import hash_groupby_agg

    excl_t = pads.dataset(f"{sf_dir}/supplier.parquet").to_table(
        columns=["s_suppkey"], filter=pads.field("s_acctbal") < 0)
    excl = np.sort(excl_t.column("s_suppkey").to_numpy(
        zero_copy_only=False).astype(np.int64))

    part_t = pads.dataset(f"{sf_dir}/part.parquet").to_table(
        columns=["p_partkey", "p_brand", "p_size"])
    pk = part_t.column("p_partkey").to_numpy(
        zero_copy_only=False).astype(np.int64)
    brand = np.asarray(part_t.column("p_brand").to_pylist(), dtype=object)
    size = part_t.column("p_size").to_numpy(
        zero_copy_only=False).astype(np.int64)
    ps = np.argsort(pk)
    side_ref = ray.put((excl, pk[ps], brand[ps], size[ps]))

    items = read_table(f"{sf_dir}/lineitem.parquet",
                       columns=["l_partkey", "l_suppkey"])

    def distinct_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates()

    pairs = hash_groupby_agg(
        items.map_batches(distinct_pairs, batch_format="pandas"),
        ["l_partkey", "l_suppkey"], {"_n": ("l_suppkey", "count")},
        num_parts=32)

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        ex, pks, brands, sizes = ray.get(side_ref)
        sk = df["l_suppkey"].to_numpy(dtype=np.int64)
        pos = np.searchsorted(ex, sk)
        pos[pos >= len(ex)] = len(ex) - 1 if len(ex) else 0
        bad = (ex[pos] == sk) if len(ex) else np.zeros(len(sk), bool)
        df = df[~bad].copy()
        lp = df["l_partkey"].to_numpy(dtype=np.int64)
        ppos = np.searchsorted(pks, lp)
        df["p_brand"] = brands[ppos]
        df["p_size"] = sizes[ppos]
        # local pre-dedup: many parts share (brand, size); one row per
        # (brand, size, suppkey) leaves the block
        return df[["p_brand", "p_size", "l_suppkey"]].drop_duplicates()

    triples = hash_groupby_agg(
        pairs.map_batches(attach, batch_format="pandas"),
        ["p_brand", "p_size", "l_suppkey"], {"_n": ("l_suppkey", "count")},
        num_parts=16)
    counts = hash_groupby_agg(
        triples, ["p_brand", "p_size"],
        {"supplier_cnt": ("l_suppkey", "count")}, num_parts=4)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df["p_size"] = df["p_size"].astype(np.int64)
        df["supplier_cnt"] = df["supplier_cnt"].astype(np.int64)
        return df[["p_brand", "p_size", "supplier_cnt"]]

    return (counts.map_batches(final, batch_format="pandas")
            .sort(["supplier_cnt", "p_brand", "p_size"],
                  descending=[True, False, False]))


def q20_excess_shipments(sf_dir: str, name_prefix: str = "small",
                         year: str = "1997", min_qty: float = 40.0
                         ) -> rd.Dataset:
    """TPC-H Q20 shape (potential part promotion): suppliers that
    shipped MORE than ``min_qty`` units of some part whose name starts
    with ``name_prefix`` during one year — a nested semi-join chain:
    part match set (broadcast) -> per-(suppkey, partkey) quantity
    reduce with the HAVING prune applied inside the finish -> distinct
    qualifying suppkeys (dim-bounded, collected once) -> broadcast
    semi-filter over supplier. The date window pushes into the parquet
    read. Quantities are integral floats, so sums are exact in
    doubles. Output: (s_name, s_acctbal) sorted by s_name."""
    from ..stages.hashagg import hash_groupby_agg

    lo = np.datetime64(f"{year}-01-01", "us")
    hi = np.datetime64(f"{int(year) + 1}-01-01", "us")

    part_t = pads.dataset(f"{sf_dir}/part.parquet").to_table(
        columns=["p_partkey", "p_name"])
    pk = part_t.column("p_partkey").to_numpy(
        zero_copy_only=False).astype(np.int64)
    match = np.asarray(
        [n.startswith(name_prefix)
         for n in part_t.column("p_name").to_pylist()], dtype=bool)
    pkeys_ref = ray.put(np.sort(pk[match]))

    items = read_table(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"],
        filter_expr=(pads.field("l_shipdate") >= lo)
        & (pads.field("l_shipdate") < hi))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        pks = ray.get(pkeys_ref)
        df = df[(df["l_shipdate"] >= pd.Timestamp(str(lo)))
                & (df["l_shipdate"] < pd.Timestamp(str(hi)))]
        lp = df["l_partkey"].to_numpy(dtype=np.int64)
        pos = np.searchsorted(pks, lp)
        pos[pos >= len(pks)] = len(pks) - 1 if len(pks) else 0
        hit = (pks[pos] == lp) if len(pks) else np.zeros(len(lp), bool)
        df = df[hit]
        return df.groupby(["l_suppkey", "l_partkey"], as_index=False).agg(
            qty=("l_quantity", "sum"))

    per_pair = hash_groupby_agg(
        items.map_batches(partial, batch_format="pandas"),
        ["l_suppkey", "l_partkey"], {"qty": ("qty", "sum")}, num_parts=16)

    def qualifying(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["qty"].to_numpy() > min_qty]
        return df[["l_suppkey"]].drop_duplicates()

    # distinct qualifying suppkeys are bounded by the supplier dim
    sup_keys = np.unique(per_pair.map_batches(
        qualifying, batch_format="pandas").to_pandas()["l_suppkey"]
        .to_numpy(dtype=np.int64))

    supp = pads.dataset(f"{sf_dir}/supplier.parquet").to_table(
        columns=["s_suppkey", "s_name", "s_acctbal"]).to_pandas()
    out = supp[supp["s_suppkey"].isin(sup_keys)].sort_values("s_name")
    return pa.Table.from_pydict({
        "s_name": pa.array(out["s_name"], pa.string()),
        "s_acctbal": pa.array(
            round_half_up(out["s_acctbal"].to_numpy(), 2), pa.float64())})


def q21_waiting_suppliers(sf_dir: str, flag: str = "R") -> rd.Dataset:
    """TPC-H Q21 shape (suppliers who kept orders waiting, adapted —
    the corpus carries no commit/receipt dates, so ``l_returnflag ==
    flag`` stands in for "failed delivery"): count, per supplier, the
    multi-supplier orders where that supplier was the ONLY one with a
    returned line. Three chained narrow reduces, no raw-row shuffle:
    (1) distinct (orderkey, suppkey, has_ret-max) pairs through the
    two-phase hash aggregate; (2) per-order fold computing n_supp /
    n_ret / the lone returned suppkey (min over a sentinel-masked
    column — valid exactly when n_ret == 1); (3) a per-suppkey count
    of qualifying orders (dim-bounded output). s_name attaches from
    the broadcast supplier dim. All-integer arithmetic — exact under
    any partitioning. Output: (s_name, numwait) sorted numwait desc,
    name."""
    from ..stages.hashagg import hash_groupby_agg

    _SENT = np.int64(2**62)
    items = read_table(f"{sf_dir}/lineitem.parquet",
                       columns=["l_orderkey", "l_suppkey",
                                "l_returnflag"])

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["has_ret"] = (df["l_returnflag"] == flag).astype(np.int64)
        return df.groupby(["l_orderkey", "l_suppkey"],
                          as_index=False).agg(has_ret=("has_ret", "max"))

    pairs = hash_groupby_agg(
        items.map_batches(pair_partial, batch_format="pandas"),
        ["l_orderkey", "l_suppkey"], {"has_ret": ("has_ret", "max")},
        num_parts=32)

    def mask(df: pd.DataFrame) -> pd.DataFrame:
        sk = df["l_suppkey"].to_numpy(dtype=np.int64)
        df = df.copy()
        df["ret_supp"] = np.where(df["has_ret"].to_numpy() == 1, sk, _SENT)
        return df

    per_order = hash_groupby_agg(
        pairs.map_batches(mask, batch_format="pandas"),
        ["l_orderkey"],
        {"n_supp": ("l_suppkey", "count"),
         "n_ret": ("has_ret", "sum"),
         "ret_supp": ("ret_supp", "min")}, num_parts=32)

    def qualify(df: pd.DataFrame) -> pd.DataFrame:
        df = df[(df["n_supp"] >= 2) & (df["n_ret"] == 1)]
        return df[["ret_supp"]]

    numwait = hash_groupby_agg(
        per_order.map_batches(qualify, batch_format="pandas"),
        ["ret_supp"], {"numwait": ("ret_supp", "count")}, num_parts=4)

    supp_t = pads.dataset(f"{sf_dir}/supplier.parquet").to_table(
        columns=["s_suppkey", "s_name"])
    sk = supp_t.column("s_suppkey").to_numpy(
        zero_copy_only=False).astype(np.int64)
    names = np.asarray(supp_t.column("s_name").to_pylist(), dtype=object)
    ss = np.argsort(sk)
    dim_ref = ray.put((sk[ss], names[ss]))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        sks, nm = ray.get(dim_ref)
        rs = df["ret_supp"].to_numpy(dtype=np.int64)
        pos = np.searchsorted(sks, rs)
        return pd.DataFrame({
            "s_name": nm[pos],
            "numwait": df["numwait"].astype(np.int64)})

    return (numwait.map_batches(final, batch_format="pandas")
            .sort(["numwait", "s_name"], descending=[True, False]))


def q2_min_supplier_per_part(sf_dir: str, max_size: int = 10,
                             ptype: str = "ECONOMY") -> rd.Dataset:
    """TPC-H Q2 shape (minimum-cost supplier, adapted — the corpus has
    no partsupp, so s_acctbal stands in for supply cost and lineitem
    is the part-supplier bridge): for each part of ``ptype`` with size
    <= ``max_size``, the supplier with the LOWEST account balance
    among those who shipped it (ties to the smallest suppkey) — a
    correlated-min subquery lowered to the keep-best two-phase reduce
    (``hash_groupby_best``: each block keeps its local winner per
    partkey, the shuffle carries one row per (block, partkey)).
    Supplier attributes broadcast (dim); part attributes broadcast as
    sorted arrays (partitioned-join above the threshold). No float
    arithmetic — min/compare only, exact. Output: (p_partkey, s_name,
    s_acctbal) sorted acctbal desc, partkey."""
    from ..stages.hashagg import hash_groupby_agg, hash_groupby_best

    supp_t = pads.dataset(f"{sf_dir}/supplier.parquet").to_table(
        columns=["s_suppkey", "s_name", "s_acctbal"])
    sk = supp_t.column("s_suppkey").to_numpy(
        zero_copy_only=False).astype(np.int64)
    sname = np.asarray(supp_t.column("s_name").to_pylist(), dtype=object)
    sbal = supp_t.column("s_acctbal").to_numpy(zero_copy_only=False)
    ss = np.argsort(sk)

    part_t = pads.dataset(f"{sf_dir}/part.parquet").to_table(
        columns=["p_partkey", "p_size", "p_type"])
    keep = ((part_t.column("p_size").to_numpy(zero_copy_only=False)
             <= max_size)
            & np.asarray([t == ptype for t in
                          part_t.column("p_type").to_pylist()], bool))
    pkeys = np.sort(part_t.column("p_partkey").to_numpy(
        zero_copy_only=False).astype(np.int64)[keep])
    side_ref = ray.put((sk[ss], sname[ss], sbal[ss], pkeys))

    items = read_table(f"{sf_dir}/lineitem.parquet",
                       columns=["l_partkey", "l_suppkey"])

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        sks, _, bals, pks = ray.get(side_ref)
        # prune to qualifying parts FIRST: the keep-best reduce then
        # carries only filtered-part rows
        lp = df["l_partkey"].to_numpy(dtype=np.int64)
        pos = np.searchsorted(pks, lp)
        pos[pos >= len(pks)] = len(pks) - 1 if len(pks) else 0
        hit = (pks[pos] == lp) if len(pks) else np.zeros(len(lp), bool)
        df = df[hit].drop_duplicates().copy()
        spos = np.searchsorted(sks, df["l_suppkey"].to_numpy(np.int64))
        df["s_acctbal"] = bals[spos]
        return df

    pairs = items.map_batches(pair_partial, batch_format="pandas")
    best = hash_groupby_best(pairs, ["l_partkey"],
                             ["s_acctbal", "l_suppkey"],
                             ascending=[True, True], num_parts=8)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        sks, nm, _, _ = ray.get(side_ref)
        pos = np.searchsorted(sks, df["l_suppkey"].to_numpy(np.int64))
        return pd.DataFrame({
            "p_partkey": df["l_partkey"].astype(np.int64),
            "s_name": nm[pos],
            "s_acctbal": round_half_up(df["s_acctbal"].to_numpy(), 2)})

    return (best.map_batches(final, batch_format="pandas")
            .sort(["s_acctbal", "p_partkey"], descending=[True, False]))


def _co_purchase_edges(sf_dir: str, min_count: int) -> rd.Dataset:
    """Shared edge builder for :func:`co_purchase_pairs` and
    :func:`triangle_count`: distinct part pairs co-ordered at least
    ``min_count`` times, oriented p1 < p2, as an UNSORTED dataset of
    (p1, p2, n_orders). See co_purchase_pairs for the plan notes."""
    from ..stages.hashagg import _stable_partition, hash_groupby_agg

    items = read_table(f"{sf_dir}/lineitem.parquet",
                       columns=["l_orderkey", "l_partkey"])

    def distinct_partial(df: pd.DataFrame) -> pd.DataFrame:
        # partition on ORDERKEY (not the pair) so the single shuffle
        # both dedups the pairs AND co-locates whole orders — pair
        # expansion then happens inside the same final combine (one
        # exchange instead of dedup-shuffle + re-bucket-shuffle)
        df = df.drop_duplicates()
        df = df[["l_orderkey", "l_partkey"]].copy()
        df["_obucket"] = _stable_partition(df, ["l_orderkey"], 32)
        return df

    def dedup_and_expand(g: pd.DataFrame) -> pd.DataFrame:
        g = g[["l_orderkey", "l_partkey"]].drop_duplicates()
        m = g.merge(g, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        return (m.groupby(["l_partkey_x", "l_partkey_y"],
                          as_index=False)
                .agg(n_orders=("l_orderkey", "size"))
                .rename(columns={"l_partkey_x": "p1",
                                 "l_partkey_y": "p2"}))

    per_bucket = (items.map_batches(distinct_partial,
                                    batch_format="pandas")
                  .groupby("_obucket")
                  .map_groups(dedup_and_expand, batch_format="pandas"))

    counts = hash_groupby_agg(per_bucket, ["p1", "p2"],
                              {"n_orders": ("n_orders", "sum")},
                              num_parts=8)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["n_orders"] >= min_count].copy()
        df["p1"] = df["p1"].astype(np.int64)
        df["p2"] = df["p2"].astype(np.int64)
        df["n_orders"] = df["n_orders"].astype(np.int64)
        return df[["p1", "p2", "n_orders"]]

    return counts.map_batches(final, batch_format="pandas")


def co_purchase_pairs(sf_dir: str, min_count: int = 3) -> rd.Dataset:
    """Market-basket co-occurrence: part pairs appearing together in at
    least ``min_count`` orders — the classic self-join-within-group
    shape (frequent-itemset mining at pair size 2). Plan: the distinct
    (orderkey, partkey) pairs reduce through the two-phase hash
    aggregate, re-partition on ORDERKEY alone (every part of an order
    lands in one bucket), each bucket expands its orders' pairs
    VECTORIZED (one self-merge per bucket, p1 < p2 — quadratic only in
    the per-order basket size, bounded by order width), and the pair
    counts reduce through a final hash aggregate with the HAVING prune
    inside the finish. No raw lineitem row is ever shuffled twice.
    Output: (p1, p2, n_orders) sorted n desc, p1, p2."""
    return (_co_purchase_edges(sf_dir, min_count)
            .repartition(1)
            .sort(["n_orders", "p1", "p2"],
                  descending=[True, False, False]))


def triangle_count(sf_dir: str, min_count: int = 2) -> rd.Dataset:
    """Triangle census of the co-purchase graph (vertices = parts,
    edges = pairs co-ordered >= ``min_count`` times): the classic
    distributed-graph primitive behind clustering coefficients and
    community detection (Suri & Vassilvitskii, WWW'11 MapReduce
    triangle counting). Generalizes the reference's pairwise confusion
    analysis (evaluate_new_testdata.py:120-163) from pair counts to
    closed-triple structure.

    Plan: edges are oriented p1 < p2 at construction (each triangle
    a<b<c counted exactly once). Wedge phase: ONE exchange partitions
    edges by the PIVOT vertex p1; each partition expands wedges
    (a,b,c) = (a,b)x(a,c), b<c, via a vectorized per-pivot self-merge
    — quadratic only in pivot degree (the documented skew axis; a
    degree-ordered orientation is the standard mitigation and our
    id-orientation approximates it on this graph). Closing phase: ONE
    exchange co-partitions wedges keyed (b,c) with edges keyed
    (p1,p2); each partition counts wedge/edge key matches with a
    sorted searchsorted probe — no all-pairs work. Wedge volume never
    sits in one place: both exchanges are hash-partitioned.
    Output: one row (n_edges, n_wedges, n_triangles)."""
    from ..stages.hashagg import _stable_partition

    edges = _co_purchase_edges(sf_dir, min_count).materialize()

    def make_wedges(df: pd.DataFrame) -> pd.DataFrame:
        df = df[["p1", "p2"]]
        m = df.merge(df, on="p1")
        m = m[m["p2_x"] < m["p2_y"]]
        out = pd.DataFrame({"a": m["p2_x"].to_numpy(dtype=np.int64),
                            "b": m["p2_y"].to_numpy(dtype=np.int64),
                            "is_edge": np.int64(0)})
        return out

    def tag_pivot(df: pd.DataFrame) -> pd.DataFrame:
        df = df[["p1", "p2"]].copy()
        df["_part"] = _stable_partition(df, ["p1"], 16)
        return df

    wedges = (edges.map_batches(tag_pivot, batch_format="pandas")
              .groupby("_part")
              .map_groups(make_wedges, batch_format="pandas"))

    def tag_edge(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"a": df["p1"].to_numpy(dtype=np.int64),
                            "b": df["p2"].to_numpy(dtype=np.int64),
                            "is_edge": np.int64(1)})
        return out

    both = wedges.union(edges.map_batches(tag_edge,
                                          batch_format="pandas"))

    def tag_key(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_kpart"] = _stable_partition(df, ["a", "b"], 16)
        return df

    def close_partial(g: pd.DataFrame) -> pd.DataFrame:
        # composite 128-bit key folded to one int64 pair-lexsort probe:
        # sort the partition's EDGE keys once, binary-search every
        # wedge key against them (ids are < 2**31 so (a<<32)|b is exact)
        k = (g["a"].to_numpy(dtype=np.int64) << np.int64(32)) | \
            g["b"].to_numpy(dtype=np.int64)
        is_e = g["is_edge"].to_numpy(dtype=np.int64) == 1
        ek = np.sort(k[is_e])
        wk = k[~is_e]
        pos = np.searchsorted(ek, wk)
        pos = np.clip(pos, 0, max(len(ek) - 1, 0))
        hit = int((ek[pos] == wk).sum()) if len(ek) else 0
        return pd.DataFrame({"n_wedges": [np.int64(len(wk))],
                             "n_triangles": [np.int64(hit)]})

    closed = (both.map_batches(tag_key, batch_format="pandas")
              .groupby("_kpart")
              .map_groups(close_partial, batch_format="pandas"))

    n_edges = edges.count()

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "n_edges": [np.int64(n_edges)],
            "n_wedges": [np.int64(df["n_wedges"].sum())],
            "n_triangles": [np.int64(df["n_triangles"].sum())],
        })

    return closed.repartition(1).map_batches(finish,
                                             batch_format="pandas")


def order_price_cume_dist(sf_dir: str) -> rd.Dataset:
    """Global CUME_DIST window over a fact table: for every order, the
    fraction of orders priced at or below it — ``cume_dist() OVER
    (ORDER BY o_totalprice)`` without a global sort. Prices are exact
    at 2 decimals, so the distribution reduces to a DOMAIN-BOUNDED
    integer-cents value histogram (two-phase hash aggregate; the
    histogram is price-domain-sized, not table-sized), its cumulative
    counts broadcast once as a sorted array, and every batch probes by
    searchsorted — an O(1)-exchange window over arbitrarily many rows.
    Output: (o_orderkey, cume) by orderkey, cume rounded to 6."""
    from ..stages.hashagg import hash_groupby_agg

    orders = read_table(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c = np.rint(df["o_totalprice"].to_numpy() * 100).astype(np.int64)
        return (pd.DataFrame({"cents": c})
                .groupby("cents", as_index=False).size()
                .rename(columns={"size": "n"}))

    hist = hash_groupby_agg(
        orders.map_batches(partial, batch_format="pandas"),
        ["cents"], {"n": ("n", "sum")}, num_parts=16).to_pandas()
    hist = hist.sort_values("cents")
    cents_sorted = hist["cents"].to_numpy(dtype=np.int64)
    cum = np.cumsum(hist["n"].to_numpy(dtype=np.int64))
    n_total = float(cum[-1]) if len(cum) else 0.0
    cdf_ref = ray.put((cents_sorted, cum))

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        cs, cm = ray.get(cdf_ref)
        c = np.rint(df["o_totalprice"].to_numpy() * 100).astype(np.int64)
        pos = np.searchsorted(cs, c, side="right")
        cume = cm[pos - 1] / n_total
        return pd.DataFrame({
            "o_orderkey": df["o_orderkey"].astype(np.int64),
            "cume": round_half_up(cume, 6)})

    return orders.map_batches(probe,
                              batch_format="pandas").sort("o_orderkey")


def qty_price_regression_by_flag(sf_dir: str) -> rd.Dataset:
    """Grouped ordinary-least-squares fit: per l_returnflag, the slope
    and intercept of extendedprice ~ quantity (SQL ``regr_slope`` /
    ``regr_intercept``) — the distributed-regression closure of the
    mergeable-moments family. Each block folds to one row of raw power
    sums PER GROUP (n, sx, sy, sxx, sxy), the two-phase hash aggregate
    merges them (exchange = blocks x groups rows), and the closed-form
    OLS finish runs on the tiny grouped table. Output: (l_returnflag,
    n_items, slope, intercept) sorted by flag."""
    from ..stages.hashagg import hash_groupby_agg

    ds = read_table(f"{sf_dir}/lineitem.parquet",
                    columns=["l_returnflag", "l_quantity",
                             "l_extendedprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = df["l_quantity"].to_numpy(dtype=np.float64)
        y = df["l_extendedprice"].to_numpy(dtype=np.float64)
        t = pd.DataFrame({"l_returnflag": df["l_returnflag"],
                          "n": 1.0, "sx": x, "sy": y,
                          "sxx": x * x, "sxy": x * y})
        return t.groupby("l_returnflag", as_index=False).sum()

    agg = hash_groupby_agg(
        ds.map_batches(partial, batch_format="pandas"),
        ["l_returnflag"],
        {c: (c, "sum") for c in ("n", "sx", "sy", "sxx", "sxy")},
        num_parts=4)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].to_numpy(dtype=np.float64)
        sx = df["sx"].to_numpy(dtype=np.float64)
        sy = df["sy"].to_numpy(dtype=np.float64)
        sxx = df["sxx"].to_numpy(dtype=np.float64)
        sxy = df["sxy"].to_numpy(dtype=np.float64)
        slope = (sxy - sx * sy / n) / (sxx - sx * sx / n)
        intercept = (sy - slope * sx) / n
        return pd.DataFrame({
            "l_returnflag": df["l_returnflag"],
            "n_items": n.astype(np.int64),
            "slope": round_half_up(slope, 6),
            "intercept": round_half_up(intercept, 4)})

    return (agg.map_batches(final, batch_format="pandas")
            .sort("l_returnflag"))


def flag_status_chi2(sf_dir: str) -> rd.Dataset:
    """Chi-square test of independence between l_returnflag and
    l_linestatus — the categorical-association audit a data-quality
    pass runs over paired labels. The contingency table reduces
    through per-block partial counts (|flags| x |statuses| cells —
    tiny), margins and the statistic finish closed-form on the
    driver. Output: one row (n_items, chi2, dof)."""
    from ..stages.hashagg import hash_groupby_agg

    ds = read_table(f"{sf_dir}/lineitem.parquet",
                    columns=["l_returnflag", "l_linestatus"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby(["l_returnflag", "l_linestatus"],
                           as_index=False).agg(
            o=("l_returnflag", "size")))

    cells = hash_groupby_agg(
        ds.map_batches(partial, batch_format="pandas"),
        ["l_returnflag", "l_linestatus"], {"o": ("o", "sum")},
        num_parts=4).to_pandas().sort_values(
        ["l_returnflag", "l_linestatus"])

    o = cells["o"].to_numpy(dtype=np.float64)
    n = o.sum()
    rf = cells.groupby("l_returnflag")["o"].transform("sum").to_numpy(
        dtype=np.float64)
    cf = cells.groupby("l_linestatus")["o"].transform("sum").to_numpy(
        dtype=np.float64)
    e = rf * cf / n
    chi2 = float((((o - e) ** 2) / e).sum())
    dof = ((cells["l_returnflag"].nunique() - 1)
           * (cells["l_linestatus"].nunique() - 1))
    return pa.Table.from_pydict({
        "n_items": pa.array([int(n)], pa.int64()),
        "chi2": pa.array(round_half_up([chi2], 4), pa.float64()),
        "dof": pa.array([int(dof)], pa.int64())})


def _hist_quantile_cont(vals: np.ndarray, cnts: np.ndarray, q: float) -> float:
    """Interpolated quantile (DuckDB quantile_cont / percentile_cont
    semantics) from a SORTED value histogram: p = q*(n-1), linear
    interpolation between the enclosing order statistics."""
    cum = np.cumsum(cnts)
    n = int(cum[-1]) if len(cum) else 0
    if n == 0:
        return float("nan")
    p = q * (n - 1)
    k = int(np.floor(p))
    lo = float(vals[int(np.searchsorted(cum, k + 1))])
    hi = float(vals[int(np.searchsorted(cum, min(k + 1, n - 1) + 1))])
    return lo + (p - k) * (hi - lo)


def quantity_mad_outliers(sf_dir: str, k_sigma: float = 3.0) -> rd.Dataset:
    """Robust outlier audit of l_quantity: median, MAD (median absolute
    deviation, DuckDB ``mad()`` = median(|x - median(x)|)), and the
    count/share of rows with |x - median| > k * MAD.

    Plan (ONE distributed pass): the bounded-domain value histogram
    (per-batch value counts -> two-phase hash agg, same plan as
    quantity_deciles). Everything downstream — median, the |x-med|
    deviation histogram (a local transform of the SAME histogram, no
    second data pass), MAD, and the outlier tail mass — is computed on
    the single tiny reduced block. Output: one row (median_qty,
    mad_qty, n_outliers, outlier_pct)."""
    from ..stages.hashagg import hash_groupby_agg

    ds = read_table(f"{sf_dir}/lineitem.parquet", columns=["l_quantity"])

    def counts(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().groupby("l_quantity", as_index=False).size()
        return table_from_pandas(df.rename(columns={"size": "c"}),
                                    preserve_index=False)

    hist = hash_groupby_agg(
        ds.map_batches(counts, batch_format="pyarrow"),
        ["l_quantity"], {"c": ("c", "sum")}, num_parts=8,
    ).repartition(1)

    def select(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().sort_values("l_quantity")
        vals = df["l_quantity"].to_numpy(dtype=np.float64)
        cnts = df["c"].to_numpy(dtype=np.int64)
        n = int(cnts.sum())
        med = _hist_quantile_cont(vals, cnts, 0.5)
        # deviation histogram = |v - med| with counts re-merged (two
        # source values can map to one deviation) — local, no new pass
        dev = pd.DataFrame({"d": np.abs(vals - med), "c": cnts}).groupby(
            "d", as_index=False)["c"].sum().sort_values("d")
        mad = _hist_quantile_cont(dev["d"].to_numpy(),
                                  dev["c"].to_numpy(dtype=np.int64), 0.5)
        n_out = int(cnts[np.abs(vals - med) > k_sigma * mad].sum())
        return pa.Table.from_pydict({
            "median_qty": pa.array(round_half_up([med], 4), pa.float64()),
            "mad_qty": pa.array(round_half_up([mad], 4), pa.float64()),
            "n_outliers": pa.array([n_out], pa.int64()),
            "outlier_pct": pa.array(
                round_half_up([100.0 * n_out / n if n else 0.0], 4),
                pa.float64()),
        })

    return hist.map_batches(select, batch_format="pyarrow")


def _percentile_cont_cutoffs(ds: "rd.Dataset", col: str, qs: list,
                             num_buckets: int) -> tuple:
    """EXACT interpolated ``percentile_cont`` order statistics of a
    CONTINUOUS column without materializing it (the shared engine under
    the robust-mean family):

      1. one narrow pass folds per-block (count, min, max) partials;
      2. one pass histograms values into ``num_buckets`` uniform
         buckets over [min, max] — the reduce moves at most
         num_buckets rows regardless of input size; cumulative bucket
         counts locate the buckets holding the order statistics
         floor/ceil(q*(n-1)) for every requested q;
      3. one pass pulls ONLY those buckets' values — an
         O(n/num_buckets) expected sliver — and interpolates the exact
         cutoffs from their within-bucket ranks.

    Returns (n, cutoffs) with cutoffs aligned to ``qs``."""
    from ..stages.hashagg import hash_groupby_agg

    # pass 1: global count/min/max from per-block partials
    def mm(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict({
            "n": pa.array([len(v)], pa.int64()),
            "lo": pa.array([float(v.min()) if len(v) else np.inf]),
            "hi": pa.array([float(v.max()) if len(v) else -np.inf])})

    p = ds.map_batches(mm, batch_format="pyarrow").to_pandas()
    n = int(p["n"].sum())
    lo, hi = float(p["lo"].min()), float(p["hi"].max())
    width = (hi - lo) or 1.0

    def bucket_of(v: np.ndarray) -> np.ndarray:
        return np.clip(((v - lo) / width * num_buckets).astype(np.int64),
                       0, num_buckets - 1)

    # pass 2: uniform-bucket histogram (<= num_buckets rows shuffled)
    def bcounts(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy(zero_copy_only=False)
        b, c = np.unique(bucket_of(v), return_counts=True)
        return pa.Table.from_pydict({"b": pa.array(b, pa.int64()),
                                     "c": pa.array(c, pa.int64())})

    bh = hash_groupby_agg(
        ds.map_batches(bcounts, batch_format="pyarrow"),
        ["b"], {"c": ("c", "sum")}, num_parts=4,
    ).to_pandas().sort_values("b")
    cum = bh["c"].cumsum().to_numpy()
    bids = bh["b"].to_numpy()

    # which bucket holds 0-based order statistic k?
    def bucket_for_rank(k: int) -> int:
        return int(bids[int(np.searchsorted(cum, k + 1))])

    need_ranks = []
    for q in qs:
        pos = q * (n - 1)
        need_ranks += [int(np.floor(pos)), min(int(np.floor(pos)) + 1, n - 1)]
    need_buckets = sorted({bucket_for_rank(k) for k in need_ranks})
    # rows ranked below each needed bucket (global offset of its values)
    base_rank = {b: int(cum[np.searchsorted(bids, b)] - bh["c"].to_numpy()[
        np.searchsorted(bids, b)]) for b in need_buckets}
    nb_ref = ray.put(np.asarray(need_buckets, dtype=np.int64))

    # pass 3: pull only the cutoff buckets' values (tiny sliver)
    def sliver(batch: pa.Table) -> pa.Table:
        need = ray.get(nb_ref)
        v = batch.column(col).to_numpy(zero_copy_only=False)
        b = bucket_of(v)
        m = np.isin(b, need)
        return pa.Table.from_pydict({"v": pa.array(v[m], pa.float64()),
                                     "b": pa.array(b[m], pa.int64())})

    sl = ds.map_batches(sliver, batch_format="pyarrow").to_pandas()

    def order_stat(k: int) -> float:
        bkt = bucket_for_rank(k)
        inside = np.sort(sl.loc[sl["b"] == bkt, "v"].to_numpy())
        return float(inside[k - base_rank[bkt]])

    cuts = []
    for q in qs:
        pos = q * (n - 1)
        k = int(np.floor(pos))
        a, b_ = order_stat(k), order_stat(min(k + 1, n - 1))
        cuts.append(a + (pos - k) * (b_ - a))
    return n, cuts


def price_trimmed_mean(sf_dir: str, q_lo: float = 0.1, q_hi: float = 0.9,
                       num_buckets: int = 4096) -> rd.Dataset:
    """Trimmed mean of l_extendedprice between the EXACT interpolated
    [q_lo, q_hi] percentiles — the robust-mean shape for a CONTINUOUS
    column, where the bounded-domain histogram trick (quantity_deciles)
    does not apply because distinct values grow with the data.

    Exact at any scale with no full-column materialization: cutoffs
    come from :func:`_percentile_cont_cutoffs` (3 narrow passes), then
    one pass computes the filtered sum/count BETWEEN the cutoffs.
    Output: one row (lo_cut, hi_cut, n_kept, trimmed_mean)."""
    path = f"{sf_dir}/lineitem.parquet"
    col = "l_extendedprice"
    ds = read_table(path, columns=[col])
    _, (t_lo, t_hi) = _percentile_cont_cutoffs(
        ds, col, [q_lo, q_hi], num_buckets)

    # pass 4: filtered sum/count between the exact cutoffs
    def keep(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy(zero_copy_only=False)
        m = (v >= t_lo) & (v <= t_hi)
        return pa.Table.from_pydict({
            "s": pa.array([float(v[m].sum())]),
            "k": pa.array([int(m.sum())], pa.int64())})

    f = ds.map_batches(keep, batch_format="pyarrow").to_pandas()
    kept, total = int(f["k"].sum()), float(f["s"].sum())
    return pa.Table.from_pydict({
        "lo_cut": pa.array(round_half_up([t_lo], 4), pa.float64()),
        "hi_cut": pa.array(round_half_up([t_hi], 4), pa.float64()),
        "n_kept": pa.array([kept], pa.int64()),
        "trimmed_mean": pa.array(round_half_up([total / kept if kept else 0.0],
                                               4), pa.float64()),
    })



def price_winsorized_mean(sf_dir: str, q_lo: float = 0.05,
                          q_hi: float = 0.95,
                          num_buckets: int = 4096) -> pa.Table:
    """Winsorized mean of o_totalprice: values below the exact
    interpolated q_lo percentile clip UP to it, values above q_hi clip
    DOWN — the robust-mean variant that keeps every row (trimming
    drops the tails instead). Cutoffs come from
    :func:`_percentile_cont_cutoffs` (3 narrow passes); one more pass
    folds per-block (sum of clipped values, count) partials. Output:
    one row (lo_cut, hi_cut, n, winsorized_mean)."""
    path = f"{sf_dir}/orders.parquet"
    col = "o_totalprice"
    ds = read_table(path, columns=[col])
    n, (t_lo, t_hi) = _percentile_cont_cutoffs(
        ds, col, [q_lo, q_hi], num_buckets)

    def clip_sum(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict({
            "s": pa.array([float(np.clip(v, t_lo, t_hi).sum())]),
            "k": pa.array([len(v)], pa.int64())})

    f = ds.map_batches(clip_sum, batch_format="pyarrow").to_pandas()
    total, k = float(f["s"].sum()), int(f["k"].sum())
    return pa.Table.from_pydict({
        "lo_cut": pa.array(round_half_up([t_lo], 4), pa.float64()),
        "hi_cut": pa.array(round_half_up([t_hi], 4), pa.float64()),
        "n": pa.array([k], pa.int64()),
        "winsorized_mean": pa.array(
            round_half_up([total / k if k else 0.0], 4), pa.float64()),
    })


def revenue_gini(sf_dir: str, num_buckets: int = 64) -> pa.Table:
    """Gini coefficient of per-customer revenue concentration —
    G = 2·Σ rank·x / (n·Σx) − (n+1)/n over ascending 1-based ranks.

    Rank·value sums normally force a global sort; this stays exact and
    sort-free by bucketing: revenues reduce to one cents-integer row
    per customer (fixed-point, order-independent), a tiny uniform
    value-histogram pass yields each bucket's BASE rank (rows in lower
    buckets), and a per-bucket map_groups sorts only ITS rows, emitting
    Σ(local_rank)·x and Σx partials — Σ rank·x = Σ_b [local + base_b·Σx_b]
    combines on one final block. Equal values always share a bucket, so
    tie order cannot change the sum. All partials are integers < 2^63:
    bit-exact at any parallelism. Output: one row
    (n_customers, total_revenue, gini)."""
    from ..stages.hashagg import hash_groupby_agg

    ds = read_table(f"{sf_dir}/orders.parquet",
                    columns=["o_custkey", "o_totalprice"])

    def cents(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["cents"] = np.rint(df["o_totalprice"].to_numpy() * 100)
        return df.groupby("o_custkey", as_index=False).agg(
            cents=("cents", "sum"))

    per_cust = hash_groupby_agg(
        ds.map_batches(cents, batch_format="pandas"),
        ["o_custkey"], {"cents": ("cents", "sum")}, num_parts=8,
    ).materialize()

    # bucket bounds + per-bucket counts (histogram rows <= num_buckets)
    p = per_cust.map_batches(
        lambda b: pa.Table.from_pydict({
            "lo": pa.array([float(np.min(b.column("cents").to_numpy()))]),
            "hi": pa.array([float(np.max(b.column("cents").to_numpy()))]),
        }), batch_format="pyarrow").to_pandas()
    lo, hi = float(p["lo"].min()), float(p["hi"].max())
    width = (hi - lo) or 1.0

    def bucket_of(v: np.ndarray) -> np.ndarray:
        return np.clip(((v - lo) / width * num_buckets).astype(np.int64),
                       0, num_buckets - 1)

    def bpartials(df: pd.DataFrame) -> pd.DataFrame:
        x = np.sort(df["cents"].to_numpy(dtype=np.int64))
        local = np.arange(1, len(x) + 1, dtype=np.int64)
        return pd.DataFrame({
            "b": [int(df["_b"].iloc[0])],
            "n": [len(x)],
            "sx": [int(x.sum())],
            "srx": [int((local * x).sum())]})

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_b"] = bucket_of(df["cents"].to_numpy(dtype=np.float64))
        return df

    parts = (per_cust.map_batches(tag, batch_format="pandas")
             .groupby("_b").map_groups(bpartials, batch_format="pandas")
             .to_pandas().sort_values("b"))
    n_b = parts["n"].to_numpy(dtype=np.int64)
    base = np.concatenate([[0], np.cumsum(n_b)[:-1]])
    n = int(n_b.sum())
    tot = int(parts["sx"].sum())
    s_rank_x = int((parts["srx"].to_numpy(dtype=object)
                    + base.astype(object) * parts["sx"].to_numpy(dtype=object)
                    ).sum())
    gini = 2.0 * s_rank_x / (n * float(tot)) - (n + 1.0) / n
    return pa.Table.from_pydict({
        "n_customers": pa.array([n], pa.int64()),
        "total_revenue": pa.array(round_half_up([tot / 100.0], 2),
                                  pa.float64()),
        "gini": pa.array(round_half_up([gini], 6), pa.float64())})


def _skyline_block(df: pd.DataFrame) -> pd.DataFrame:
    """Non-dominated (min price, max size) rows of one block — a sweep
    over price groups ascending, keeping a group's max-size rows iff
    that max strictly exceeds every smaller-price group's max (<= on
    price with < on either axis is domination; exact ties on BOTH axes
    survive together). Vectorized: group maxima via first-in-group
    after a (price asc, size desc) sort, then a shifted running max."""
    d = df.sort_values(["p_retailprice", "p_size"],
                       ascending=[True, False], kind="mergesort")
    price = d["p_retailprice"].to_numpy()
    size = d["p_size"].to_numpy(dtype=np.int64)
    first = np.concatenate([[True], price[1:] != price[:-1]])
    gidx = np.cumsum(first) - 1          # group id per row
    gmax = size[first]                   # max size per price group
    prev_best = np.concatenate(
        [[np.iinfo(np.int64).min], np.maximum.accumulate(gmax)[:-1]])
    keep_group = gmax > prev_best
    keep = keep_group[gidx] & (size == gmax[gidx])
    return d.loc[keep].reset_index(drop=True)


def price_size_skyline(sf_dir: str) -> rd.Dataset:
    """Pareto frontier (skyline) of the part table on (p_retailprice ↓,
    p_size ↑): parts no other part beats on both axes.

    Skylines distribute for free: the global frontier is a subset of
    every block's local frontier, so one map_batches pass shrinks each
    block to its (typically tiny) frontier and the same sweep re-runs
    once on the unioned survivors — no shuffle, final work bounded by
    Σ|local frontiers|. Output: (p_partkey, p_retailprice, p_size)
    sorted by p_partkey."""
    from ..sources.storage import rows_to_blocks

    path = f"{sf_dir}/part.parquet"
    ds = read_table(path, columns=["p_partkey", "p_retailprice", "p_size"],
                    num_blocks=rows_to_blocks(path))
    return (ds.map_batches(_skyline_block, batch_format="pandas")
            .repartition(1)
            .map_batches(_skyline_block, batch_format="pandas")
            .sort("p_partkey"))


def weighted_median_price(sf_dir: str, num_buckets: int = 4096) -> pa.Table:
    """Quantity-weighted median of l_extendedprice — the lower weighted
    median: the smallest price whose cumulative weight reaches half the
    total. The weighted generalization of the exact-selection shape in
    price_trimmed_mean, for when rows carry multiplicities.

    Plan (exact, no full-column pull): pass 1 folds per-block (weight
    total, price min/max); pass 2 ships a <= num_buckets-row weighted
    histogram whose cumulative sums locate the single bucket containing
    the crossing; pass 3 pulls only that bucket's (price, weight)
    sliver and finishes the scan locally. All weights are integral, so
    every cumulative sum is exact and order-independent. Output: one
    row (total_weight, weighted_median)."""
    from ..stages.hashagg import hash_groupby_agg

    path = f"{sf_dir}/lineitem.parquet"
    ds = read_table(path, columns=["l_extendedprice", "l_quantity"])

    def mm(batch: pa.Table) -> pa.Table:
        v = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
        w = np.rint(batch.column("l_quantity").to_numpy(
            zero_copy_only=False)).astype(np.int64)
        return pa.Table.from_pydict({
            "w": pa.array([int(w.sum())], pa.int64()),
            "lo": pa.array([float(v.min()) if len(v) else np.inf]),
            "hi": pa.array([float(v.max()) if len(v) else -np.inf])})

    p = ds.map_batches(mm, batch_format="pyarrow").to_pandas()
    tot = int(p["w"].sum())
    lo, hi = float(p["lo"].min()), float(p["hi"].max())
    width = (hi - lo) or 1.0
    half = tot / 2.0

    def bucket_of(v: np.ndarray) -> np.ndarray:
        return np.clip(((v - lo) / width * num_buckets).astype(np.int64),
                       0, num_buckets - 1)

    def bw(batch: pa.Table) -> pa.Table:
        v = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
        w = np.rint(batch.column("l_quantity").to_numpy(
            zero_copy_only=False)).astype(np.int64)
        df = pd.DataFrame({"b": bucket_of(v), "w": w}).groupby(
            "b", as_index=False)["w"].sum()
        return table_from_pandas(df, preserve_index=False)

    bh = hash_groupby_agg(
        ds.map_batches(bw, batch_format="pyarrow"),
        ["b"], {"w": ("w", "sum")}, num_parts=4,
    ).to_pandas().sort_values("b")
    cum = bh["w"].cumsum().to_numpy(dtype=np.int64)
    idx = int(np.searchsorted(cum, half))          # first cum >= half
    target = int(bh["b"].to_numpy()[idx])
    base = int(cum[idx - 1]) if idx else 0         # weight below bucket

    def sliver(batch: pa.Table) -> pa.Table:
        v = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
        w = np.rint(batch.column("l_quantity").to_numpy(
            zero_copy_only=False)).astype(np.int64)
        m = bucket_of(v) == target
        return pa.Table.from_pydict({
            "v": pa.array(v[m], pa.float64()),
            "w": pa.array(w[m], pa.int64())})

    sl = (ds.map_batches(sliver, batch_format="pyarrow").to_pandas()
          .groupby("v", as_index=False)["w"].sum().sort_values("v"))
    cw = base + sl["w"].cumsum().to_numpy(dtype=np.int64)
    med = float(sl["v"].to_numpy()[int(np.searchsorted(cw, half))])
    return pa.Table.from_pydict({
        "total_weight": pa.array([tot], pa.int64()),
        "weighted_median": pa.array(round_half_up([med], 4),
                                    pa.float64())})


def loo_mean_price_by_priority(sf_dir: str) -> rd.Dataset:
    """Leave-one-out target encoding (the standard leakage-free
    categorical encoder for model features): each order's priority
    class mean of o_totalprice EXCLUDING the order itself,
    loo = (sum_class - x) / (n_class - 1).

    Plan: per-batch fixed-point partials (cents sum + count per
    priority) reduce to a |priorities|-row table on the driver, then
    one embarrassingly-parallel vectorized pass encodes every row
    against the broadcast class sums — two narrow passes, no row
    shuffle, exact integer arithmetic until the final division.
    Output: (o_orderkey, o_orderpriority, loo_mean) by orderkey."""
    import ray as _ray

    ds = read_table(f"{sf_dir}/orders.parquet",
                    columns=["o_orderkey", "o_orderpriority",
                             "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["cents"] = np.rint(df["o_totalprice"].to_numpy() * 100)
        return df.groupby("o_orderpriority", as_index=False).agg(
            sc=("cents", "sum"), n=("cents", "size"))

    stats = (ds.map_batches(partial, batch_format="pandas")
             .repartition(2).groupby("o_orderpriority").aggregate(
                 Sum("sc", alias_name="sc"), Sum("n", alias_name="n"))
             .to_pandas())
    lut = _ray.put({p: (int(s), int(n)) for p, s, n in zip(
        stats["o_orderpriority"], stats["sc"], stats["n"])})

    def encode(df: pd.DataFrame) -> pd.DataFrame:
        m = _ray.get(lut)
        sc = df["o_orderpriority"].map(lambda p: m[p][0]).to_numpy(
            dtype=np.float64)
        n = df["o_orderpriority"].map(lambda p: m[p][1]).to_numpy(
            dtype=np.float64)
        x = np.rint(df["o_totalprice"].to_numpy() * 100)
        return pd.DataFrame({
            "o_orderkey": df["o_orderkey"],
            "o_orderpriority": df["o_orderpriority"],
            "loo_mean": round_half_up((sc - x) / 100.0 / (n - 1.0), 4)})

    return (ds.map_batches(encode, batch_format="pandas")
            .sort("o_orderkey"))


def benford_first_digit(sf_dir: str) -> rd.Dataset:
    """Benford's-law audit of o_totalprice: observed first-significant-
    digit distribution vs the Benford expectation log10(1 + 1/d) — the
    classic fraud/synthetic-data smell test for a money column.

    Plan: one narrow pass folds per-batch digit counts (9-row partials;
    first digit via integer repeated division — no log10, whose
    libm edge cases at exact powers of ten differ across engines), a
    tiny combine, and a local finish. Output: (digit, n, observed_pct,
    expected_pct)."""
    ds = read_table(f"{sf_dir}/orders.parquet", columns=["o_totalprice"])

    def digit_counts(batch: pa.Table) -> pa.Table:
        x = np.floor(batch.column("o_totalprice").to_numpy(
            zero_copy_only=False)).astype(np.int64)
        while (x >= 10).any():
            x = np.where(x >= 10, x // 10, x)
        d, c = np.unique(x, return_counts=True)
        return pa.Table.from_pydict({"digit": pa.array(d, pa.int64()),
                                     "n": pa.array(c, pa.int64())})

    agg = (ds.map_batches(digit_counts, batch_format="pyarrow")
           .repartition(1))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("digit", as_index=False)["n"].sum()
        g["n"] = g["n"].astype(np.int64)
        tot = float(g["n"].sum())
        g["observed_pct"] = round_half_up(100.0 * g["n"] / tot, 4)
        g["expected_pct"] = round_half_up(
            100.0 * np.log10(1.0 + 1.0 / g["digit"].to_numpy(
                dtype=np.float64)), 4)
        return g.sort_values("digit").reset_index(drop=True)

    return agg.map_batches(final, batch_format="pandas")


def table_profile(sf_dir: str) -> rd.Dataset:
    """ANALYZE-style one-pass column profile of the orders table —
    the optimizer/data-quality statistics block every warehouse emits
    (row counts, null counts, min/max, means, exact NDVs). Engine twin
    of the reference's corpus summary print (evaluate_new_testdata.py:
    82-104) generalized to arbitrary columns.

    Plan: ONE read + ONE map_batches folds, per block, (a) closed-form
    numeric partials (count/nulls/min/max/sum) and (b) the per-block
    DISTINCT VALUE sets of the NDV columns encoded as rows — bounded
    by column cardinality x blocks, never by row count (the documented
    assumption: NDV columns are categorical/date-grade; a high-card
    NDV needs the HLL sketch path instead). One repartition(1) combine
    finishes both kinds. Output: (column, metric, value) long-form,
    sorted."""
    ds = read_table(f"{sf_dir}/orders.parquet",
                    columns=["o_orderkey", "o_custkey", "o_orderstatus",
                             "o_orderpriority", "o_orderdate",
                             "o_totalprice"])
    ndv_cols = ["o_custkey", "o_orderstatus", "o_orderpriority",
                "o_orderdate"]

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        rows: list[tuple[str, str, float, str]] = []
        n = batch.num_rows
        for col in ("o_orderkey", "o_totalprice"):
            a = batch.column(col)
            rows.append((col, "count", float(n - a.null_count), ""))
            rows.append((col, "n_nulls", float(a.null_count), ""))
            rows.append((col, "min", float(pc.min(a).as_py()), ""))
            rows.append((col, "max", float(pc.max(a).as_py()), ""))
        rows.append(("o_totalprice", "sum",
                     float(pc.sum(batch.column("o_totalprice")).as_py()),
                     ""))
        out = pd.DataFrame(rows, columns=["column", "metric", "value",
                                          "sval"])
        vals = []
        for col in ndv_cols:
            u = pc.unique(batch.column(col)).cast(pa.string())
            vals.append(pd.DataFrame({
                "column": col, "metric": "__val", "value": 0.0,
                "sval": u.to_pandas()}))
        return table_from_pandas(pd.concat([out] + vals,
                                           ignore_index=True))

    agg = ds.map_batches(partial, batch_format="pyarrow").repartition(1)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        stats = df[df["metric"] != "__val"]
        g = stats.groupby(["column", "metric"])["value"]
        out = []
        for (col, met), s in g:
            if met in ("count", "n_nulls"):
                out.append((col, met, float(s.sum())))
            elif met == "min":
                out.append((col, met, float(s.min())))
            elif met == "max":
                out.append((col, met, float(s.max())))
        cnt = stats[(stats["column"] == "o_totalprice")
                    & (stats["metric"] == "count")]["value"].sum()
        tot = stats[(stats["column"] == "o_totalprice")
                    & (stats["metric"] == "sum")]["value"].sum()
        out.append(("o_totalprice", "mean",
                    float(round_half_up(np.array([tot / cnt]), 4)[0])))
        dv = df[df["metric"] == "__val"]
        for col, s in dv.groupby("column")["sval"]:
            out.append((col, "n_distinct", float(s.nunique())))
        res = pd.DataFrame(out, columns=["column", "metric", "value"])
        return res.sort_values(["column", "metric"]).reset_index(
            drop=True)

    return agg.map_batches(finish, batch_format="pandas")


def price_equidepth_histogram(sf_dir: str, nbins: int = 10) -> rd.Dataset:
    """Equi-depth (equal-frequency) histogram of l_extendedprice — the
    optimizer-statistics primitive (NTILE boundaries with DETERMINISTIC
    tie handling: every row of one value shares the bin of that
    value's MIN rank, so the result is independent of scan order,
    unlike raw NTILE).

    Plan: prices are exact integer cents, so per-block (cents, count)
    partials reduce through the two-phase hash aggregate to a
    value-histogram sized by DISTINCT price count; one tiny
    repartition(1) finish computes cumulative ranks on the sorted
    histogram and folds bins locally. No row-level sort, no full-column
    shuffle — the same domain-bounded-histogram trick as
    order_price_cume_dist. Output: (bin, n_rows, lo, hi)."""
    from ..stages.hashagg import hash_groupby_agg

    ds = read_table(f"{sf_dir}/lineitem.parquet",
                    columns=["l_extendedprice"])

    def cents_counts(batch: pa.Table) -> pa.Table:
        p = batch.column("l_extendedprice").to_numpy(
            zero_copy_only=False)
        cents = np.rint(p * 100.0).astype(np.int64)
        v, c = np.unique(cents, return_counts=True)
        return pa.Table.from_pydict({
            "cents": pa.array(v, pa.int64()),
            "c": pa.array(c.astype(np.int64), pa.int64())})

    hist = hash_groupby_agg(
        ds.map_batches(cents_counts, batch_format="pyarrow"),
        ["cents"], {"c": ("c", "sum")}, num_parts=8)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("cents").reset_index(drop=True)
        c = df["c"].to_numpy(dtype=np.int64)
        n = int(c.sum())
        cum_before = np.concatenate(([0], np.cumsum(c)[:-1]))
        rank_min = cum_before + 1  # rank() of every row of this value
        bins = (rank_min - 1) * np.int64(nbins) // np.int64(n) + 1
        cents = df["cents"].to_numpy(dtype=np.int64)
        out = pd.DataFrame({"bin": bins, "cents": cents, "c": c})
        g = out.groupby("bin", as_index=False).agg(
            n_rows=("c", "sum"), lo_c=("cents", "min"),
            hi_c=("cents", "max"))
        return pd.DataFrame({
            "bin": g["bin"].astype(np.int64),
            "n_rows": g["n_rows"].astype(np.int64),
            "lo": round_half_up(g["lo_c"].to_numpy() / 100.0, 2),
            "hi": round_half_up(g["hi_c"].to_numpy() / 100.0, 2),
        }).sort_values("bin").reset_index(drop=True)

    return hist.repartition(1).map_batches(finish,
                                           batch_format="pandas")


def sales_cube(sf_dir: str) -> rd.Dataset:
    """GROUP BY CUBE (l_returnflag, l_linestatus): all four grouping
    sets — (flag, status), (flag), (status), () — in ONE pass, the
    warehouse reporting primitive completing the ROLLUP already in the
    engine. NULL grouping keys are emitted as the literal 'ALL' so the
    row identity survives the order-insensitive hash compare.

    Plan: each block folds all four grouping sets locally (cells
    bounded by the 3x2 key domain x 4 sets), one repartition(1)
    combine finishes — no shuffle wider than the cube itself.
    Output: (l_returnflag, l_linestatus, n, sum_qty, revenue)."""
    ds = read_table(f"{sf_dir}/lineitem.parquet",
                    columns=["l_returnflag", "l_linestatus",
                             "l_quantity", "l_extendedprice",
                             "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["rev"] = df["l_extendedprice"] * (1.0 - df["l_discount"])
        frames = []
        for keys in ((["l_returnflag", "l_linestatus"]),
                     (["l_returnflag"]), (["l_linestatus"]), ([])):
            if keys:
                g = df.groupby(keys, as_index=False).agg(
                    n=("rev", "size"), sum_qty=("l_quantity", "sum"),
                    revenue=("rev", "sum"))
            else:
                g = pd.DataFrame({
                    "n": [len(df)],
                    "sum_qty": [df["l_quantity"].sum()],
                    "revenue": [df["rev"].sum()]})
            for col in ("l_returnflag", "l_linestatus"):
                if col not in g.columns:
                    g[col] = "ALL"
            frames.append(g[["l_returnflag", "l_linestatus", "n",
                             "sum_qty", "revenue"]])
        return table_from_pandas(pd.concat(frames, ignore_index=True))

    agg = ds.map_batches(partial, batch_format="pyarrow").repartition(1)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["l_returnflag", "l_linestatus"],
                       as_index=False).agg(
            n=("n", "sum"), sum_qty=("sum_qty", "sum"),
            revenue=("revenue", "sum"))
        g["n"] = g["n"].astype(np.int64)
        g["sum_qty"] = round_half_up(g["sum_qty"].to_numpy(), 2)
        g["revenue"] = round_half_up(g["revenue"].to_numpy(), 2)
        return g.sort_values(["l_returnflag", "l_linestatus"]
                             ).reset_index(drop=True)

    return agg.map_batches(finish, batch_format="pandas")


def vertex_clustering(sf_dir: str, min_count: int = 2,
                      top: int = 20) -> rd.Dataset:
    """Per-vertex triangle counts + local clustering coefficient over
    the co-purchase graph (2*tri / deg*(deg-1)) — the node-level
    community signal on top of :func:`triangle_count`'s global census.

    Plan: same two hash exchanges as triangle_count (pivot-partitioned
    wedge expansion, wedge/edge co-partitioned close) except the close
    emits per-vertex triangle partials (each confirmed wedge (a,b,c)
    credits all three corners); degrees fold from the edge list in a
    |V|-bounded reduce; both tiny tables meet in one repartition(1)
    finish. Output: top-``top`` by (n_triangles desc, part) with
    degree and clustering coefficient."""
    from ..stages.hashagg import _stable_partition, hash_groupby_agg

    edges = _co_purchase_edges(sf_dir, min_count).materialize()

    def tag_pivot(df: pd.DataFrame) -> pd.DataFrame:
        df = df[["p1", "p2"]].copy()
        df["_part"] = _stable_partition(df, ["p1"], 16)
        return df

    def make_wedges(df: pd.DataFrame) -> pd.DataFrame:
        df = df[["p1", "p2"]]
        m = df.merge(df, on="p1")
        m = m[m["p2_x"] < m["p2_y"]]
        return pd.DataFrame({
            "a": m["p2_x"].to_numpy(dtype=np.int64),
            "b": m["p2_y"].to_numpy(dtype=np.int64),
            "pivot": m["p1"].to_numpy(dtype=np.int64),
            "is_edge": np.int64(0)})

    wedges = (edges.map_batches(tag_pivot, batch_format="pandas")
              .groupby("_part")
              .map_groups(make_wedges, batch_format="pandas"))

    def tag_edge(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "a": df["p1"].to_numpy(dtype=np.int64),
            "b": df["p2"].to_numpy(dtype=np.int64),
            "pivot": np.int64(0), "is_edge": np.int64(1)})

    both = wedges.union(edges.map_batches(tag_edge,
                                          batch_format="pandas"))

    def tag_key(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_kpart"] = _stable_partition(df, ["a", "b"], 16)
        return df

    def close_partial(g: pd.DataFrame) -> pd.DataFrame:
        k = (g["a"].to_numpy(dtype=np.int64) << np.int64(32)) | \
            g["b"].to_numpy(dtype=np.int64)
        is_e = g["is_edge"].to_numpy(dtype=np.int64) == 1
        ek = np.sort(k[is_e])
        wk = k[~is_e]
        if not len(ek) or not len(wk):
            return pd.DataFrame({"part": np.zeros(0, np.int64),
                                 "t": np.zeros(0, np.int64)})
        pos = np.clip(np.searchsorted(ek, wk), 0, len(ek) - 1)
        hit = ek[pos] == wk
        ga = g[~is_e]
        verts = np.concatenate([
            ga["a"].to_numpy(dtype=np.int64)[hit],
            ga["b"].to_numpy(dtype=np.int64)[hit],
            ga["pivot"].to_numpy(dtype=np.int64)[hit]])
        v, c = np.unique(verts, return_counts=True)
        return pd.DataFrame({"part": v, "t": c.astype(np.int64)})

    tri = hash_groupby_agg(
        (both.map_batches(tag_key, batch_format="pandas")
         .groupby("_kpart")
         .map_groups(close_partial, batch_format="pandas")),
        ["part"], {"t": ("t", "sum")}, num_parts=4)

    def deg_partial(df: pd.DataFrame) -> pd.DataFrame:
        v = np.concatenate([df["p1"].to_numpy(dtype=np.int64),
                            df["p2"].to_numpy(dtype=np.int64)])
        u, c = np.unique(v, return_counts=True)
        return pd.DataFrame({"part": u, "d": c.astype(np.int64)})

    deg = hash_groupby_agg(
        edges.map_batches(deg_partial, batch_format="pandas"),
        ["part"], {"d": ("d", "sum")}, num_parts=4)

    def mark(side: int, col: str):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "part": df["part"].to_numpy(dtype=np.int64),
                "val": df[col].to_numpy(dtype=np.int64),
                "_side": np.int64(side)})
        return f

    merged = (tri.map_batches(mark(0, "t"), batch_format="pandas")
              .union(deg.map_batches(mark(1, "d"),
                                     batch_format="pandas")))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        t = df[df["_side"] == 0].rename(columns={"val": "t"})[
            ["part", "t"]]
        d = df[df["_side"] == 1].rename(columns={"val": "d"})[
            ["part", "d"]]
        m = t.merge(d, on="part")
        dd = m["d"].to_numpy(dtype=np.float64)
        m["clustering"] = round_half_up(
            2.0 * m["t"].to_numpy(dtype=np.float64)
            / (dd * (dd - 1.0)), 4)
        m = m.sort_values(["t", "part"],
                          ascending=[False, True]).head(top)
        return pd.DataFrame({
            "part": m["part"].astype(np.int64),
            "n_triangles": m["t"].astype(np.int64),
            "degree": m["d"].astype(np.int64),
            "clustering": m["clustering"]}).reset_index(drop=True)

    return merged.repartition(1).map_batches(finish,
                                             batch_format="pandas")


def max_quantity_with_ties(sf_dir: str) -> rd.Dataset:
    """ARGMAX-with-ties per group: the maximum l_quantity per return
    flag AND how many rows share it — the dense_rank()=1 "top with
    ties" semantics as ONE associative aggregate instead of a window
    (partial = per-block (group, max, count-at-max); combine keeps the
    larger max and sums counts only on equality — no second pass, no
    row shuffle). Output: (l_returnflag, max_qty, n_at_max)."""
    ds = read_table(f"{sf_dir}/lineitem.parquet",
                    columns=["l_returnflag", "l_quantity"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        mx = df.groupby("l_returnflag")["l_quantity"].transform("max")
        at = df[df["l_quantity"] == mx]
        g = at.groupby("l_returnflag", as_index=False).agg(
            max_qty=("l_quantity", "max"),
            n_at_max=("l_quantity", "size"))
        return table_from_pandas(g)

    agg = ds.map_batches(partial, batch_format="pyarrow").repartition(1)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        mx = df.groupby("l_returnflag")["max_qty"].transform("max")
        at = df[df["max_qty"] == mx]
        g = at.groupby("l_returnflag", as_index=False).agg(
            max_qty=("max_qty", "max"), n_at_max=("n_at_max", "sum"))
        g["max_qty"] = round_half_up(g["max_qty"].to_numpy(), 2)
        g["n_at_max"] = g["n_at_max"].astype(np.int64)
        return g.sort_values("l_returnflag").reset_index(drop=True)

    return agg.map_batches(finish, batch_format="pandas")


def rfm_scores(sf_dir: str, nbins: int = 5) -> rd.Dataset:
    """RFM customer segmentation (recency / frequency / monetary
    quintiles) — the canonical BI scoring table. Quintiles use the
    deterministic rank-min rule (floor((rank-1)*5/n)+1, ties share
    the bin of their value's MIN rank) so the result is scan-order
    independent, unlike raw NTILE.

    Plan: ONE |customers|-bounded two-phase reduce folds (last order
    date, order count, fixed-point revenue cents) per customer; the
    quintile cuts and scores are local transforms of the REDUCED
    table (documented bound: |customers| rows sort in one partition —
    at 10^9+ customers the cuts would come from the engine's
    value-histogram rank path instead, as order_price_cume_dist does).
    R scores ascending by days-since-last (5 = most recent).
    Output: (c_custkey, r_days, f_orders, m_cents, r_score, f_score,
    m_score)."""
    from ..stages.hashagg import hash_groupby_agg

    ds = read_table(f"{sf_dir}/orders.parquet",
                    columns=["o_custkey", "o_orderdate",
                             "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["d"] = df["o_orderdate"].to_numpy(
            dtype="datetime64[D]").astype(np.int64)
        df["cents"] = np.rint(
            df["o_totalprice"].to_numpy() * 100.0).astype(np.int64)
        g = df.groupby("o_custkey", as_index=False).agg(
            last_d=("d", "max"), n=("d", "size"),
            cents=("cents", "sum"))
        return table_from_pandas(g)

    agg = hash_groupby_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["o_custkey"], {"last_d": ("last_d", "max"),
                        "n": ("n", "sum"),
                        "cents": ("cents", "sum")}, num_parts=8)

    def _rank_bins(v: np.ndarray, nb: int) -> np.ndarray:
        # rank-min quintile: all rows of one value share a bin
        order = np.argsort(v, kind="stable")
        ranks = np.empty(len(v), dtype=np.int64)
        sv = v[order]
        starts = np.ones(len(v), dtype=bool)
        starts[1:] = sv[1:] != sv[:-1]
        rmin = np.maximum.accumulate(
            np.where(starts, np.arange(len(v)), 0))
        ranks[order] = rmin
        return ranks * np.int64(nb) // np.int64(len(v)) + 1

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        last_d = df["last_d"].to_numpy(dtype=np.int64)
        r_days = last_d.max() - last_d
        n = df["n"].to_numpy(dtype=np.int64)
        cents = df["cents"].to_numpy(dtype=np.int64)
        out = pd.DataFrame({
            "c_custkey": df["o_custkey"].astype(np.int64),
            "r_days": r_days,
            "f_orders": n,
            "m_cents": cents,
            # recency: FEWER days -> HIGHER score
            "r_score": nbins + 1 - _rank_bins(r_days, nbins),
            "f_score": _rank_bins(n, nbins),
            "m_score": _rank_bins(cents, nbins),
        })
        return out.sort_values("c_custkey").reset_index(drop=True)

    return agg.repartition(1).map_batches(finish,
                                          batch_format="pandas")


def k_anonymity_audit(sf_dir: str, k: int = 10) -> rd.Dataset:
    """Data-governance audit: quasi-identifier groups
    (c_mktsegment, c_nationkey) smaller than ``k`` — rows re-
    identifiable by the combination — plus each group's l-diversity
    (distinct sensitive-value buckets, acctbal/1000) so l=1 groups
    leak the sensitive attribute outright. The release-gate check any
    privacy-aware pipeline runs before publishing microdata.

    Plan: one pass folds (quasi, bucket) cell partials (bounded by the
    quasi x bucket domain, never by rows), one two-phase reduce, then
    group size + diversity fold locally from the reduced cells.
    Output: violating groups (c_mktsegment, c_nationkey, n,
    l_distinct), sorted."""
    from ..stages.hashagg import hash_groupby_agg

    ds = read_table(f"{sf_dir}/customer.parquet",
                    columns=["c_mktsegment", "c_nationkey",
                             "c_acctbal"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["bucket"] = np.floor(
            df["c_acctbal"].to_numpy() / 1000.0).astype(np.int64)
        g = df.groupby(["c_mktsegment", "c_nationkey", "bucket"],
                       as_index=False).size()
        return table_from_pandas(g.rename(columns={"size": "n"}))

    cells = hash_groupby_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["c_mktsegment", "c_nationkey", "bucket"],
        {"n": ("n", "sum")}, num_parts=4)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["c_mktsegment", "c_nationkey"],
                       as_index=False).agg(
            n=("n", "sum"), l_distinct=("bucket", "nunique"))
        g = g[g["n"] < k].copy()
        g["c_nationkey"] = g["c_nationkey"].astype(np.int64)
        g["n"] = g["n"].astype(np.int64)
        g["l_distinct"] = g["l_distinct"].astype(np.int64)
        return g.sort_values(["c_mktsegment", "c_nationkey"]
                             ).reset_index(drop=True)

    return cells.repartition(1).map_batches(finish,
                                            batch_format="pandas")


def psi_price_drift(sf_dir: str, nbins: int = 10) -> rd.Dataset:
    """Population-stability-index drift report between two order
    populations (odd vs even orderkey — the A/B split stand-in for
    "last week vs this week"): PSI = sum (p_a - p_b) * ln(p_a / p_b)
    over ``nbins`` equi-width bins of o_totalprice — the standard
    ML-ops input-drift gate (PSI < 0.1 stable, > 0.25 shifted).

    Plan: pass 1 folds the global (min, max) in per-block partials;
    pass 2 folds per-(population, bin) counts (2 x nbins cells per
    block); the PSI terms are a closed-form finish on the reduced
    cells. Output: (bin, n_a, n_b, pct_a, pct_b, psi_term, psi_total)."""
    path = f"{sf_dir}/orders.parquet"

    def minmax(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        p = batch.column("o_totalprice")
        return pa.Table.from_pydict({
            "lo": pa.array([pc.min(p).as_py()], pa.float64()),
            "hi": pa.array([pc.max(p).as_py()], pa.float64())})

    mm = (read_table(path, columns=["o_totalprice"])
          .map_batches(minmax, batch_format="pyarrow")
          .to_pandas())
    lo, hi = float(mm["lo"].min()), float(mm["hi"].max())

    def bin_counts(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        p = df["o_totalprice"].to_numpy(dtype=np.float64)
        b = np.minimum(np.floor((p - lo) * nbins / (hi - lo)),
                       nbins - 1).astype(np.int64)
        pop = (df["o_orderkey"].to_numpy(dtype=np.int64)
               % 2).astype(np.int64)
        out = pd.DataFrame({"bin": b, "pop": pop})
        g = out.groupby(["bin", "pop"], as_index=False).size()
        return table_from_pandas(g.rename(columns={"size": "n"}))

    agg = (read_table(path, columns=["o_orderkey", "o_totalprice"])
           .map_batches(bin_counts, batch_format="pyarrow")
           .repartition(1))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["bin", "pop"], as_index=False)["n"].sum()
        wide = g.pivot(index="bin", columns="pop",
                       values="n").fillna(0).astype(np.int64)
        n_a = wide.get(0, pd.Series(0, index=wide.index)).to_numpy(
            dtype=np.float64)
        n_b = wide.get(1, pd.Series(0, index=wide.index)).to_numpy(
            dtype=np.float64)
        pa_ = n_a / n_a.sum()
        pb_ = n_b / n_b.sum()
        term = (pa_ - pb_) * np.log(pa_ / pb_)
        return pd.DataFrame({
            "bin": wide.index.to_numpy(dtype=np.int64),
            "n_a": n_a.astype(np.int64),
            "n_b": n_b.astype(np.int64),
            "pct_a": round_half_up(pa_, 6),
            "pct_b": round_half_up(pb_, 6),
            "psi_term": round_half_up(term, 6),
            "psi_total": round_half_up(
                np.full(len(wide), term.sum()), 6),
        }).sort_values("bin").reset_index(drop=True)

    return agg.map_batches(finish, batch_format="pandas")


def data_expectations(sf_dir: str) -> rd.Dataset:
    """Constraint-validation suite over orders (the dbt-test / Great
    Expectations shape): per-check violation counts in one report —
    (a) o_orderkey NOT NULL, (b) o_orderkey UNIQUE, (c) o_totalprice
    in (0, 1e7), (d) o_orderdate within [1990-01-01, 2010-01-01),
    (e) referential integrity o_custkey -> customer.c_custkey.

    Plan: checks a/c/d fold per-block counter partials (scalar rows);
    uniqueness reduces (key, n) two-phase and counts n > 1 keys;
    referential integrity hash-partitions BOTH key sets on the same
    key so each partition anti-joins locally with a sorted probe — no
    broadcast of the dimension (dimension-sized sides stay
    partitioned; the Bloom-prefilter variant in media.docs_without_
    media is the alternative when the probe side dominates).
    Output: (check_name, n_violations) sorted."""
    from ..functions.tables import table_from_pandas
    from ..stages.hashagg import _stable_partition, hash_groupby_agg

    orders = read_table(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_custkey",
                                 "o_totalprice", "o_orderdate"])

    def scalar_checks(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        p = df["o_totalprice"].to_numpy(dtype=np.float64)
        d = df["o_orderdate"].to_numpy(dtype="datetime64[D]")
        rows = [
            ("orderkey_not_null",
             int(df["o_orderkey"].isna().sum())),
            ("totalprice_in_range",
             int(((p <= 0) | (p >= 1e7)).sum())),
            ("orderdate_in_range",
             int(((d < np.datetime64("1990-01-01"))
                  | (d >= np.datetime64("2010-01-01"))).sum())),
        ]
        return table_from_pandas(pd.DataFrame(
            rows, columns=["check_name", "n_violations"]))

    scalars = hash_groupby_agg(
        orders.map_batches(scalar_checks, batch_format="pyarrow"),
        ["check_name"], {"n_violations": ("n_violations", "sum")},
        num_parts=2)

    def key_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("o_orderkey", as_index=False).size() \
            .rename(columns={"size": "n"})
        return table_from_pandas(g)

    key_counts = hash_groupby_agg(
        orders.map_batches(key_partial, batch_format="pyarrow"),
        ["o_orderkey"], {"n": ("n", "sum")}, num_parts=8)

    def dup_fold(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "check_name": ["orderkey_unique"],
            "n_violations": [np.int64((df["n"] > 1).sum())]})

    uniq = (key_counts.repartition(1)
            .map_batches(dup_fold, batch_format="pandas"))

    # referential integrity: co-partition fact keys and dim keys
    def fact_keys(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()[["o_custkey"]].drop_duplicates()
        out = pd.DataFrame({"key": df["o_custkey"].to_numpy(
            dtype=np.int64), "side": np.int64(0)})
        out["_part"] = _stable_partition(out, ["key"], 8)
        return table_from_pandas(out)

    def dim_keys(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()[["c_custkey"]].drop_duplicates()
        out = pd.DataFrame({"key": df["c_custkey"].to_numpy(
            dtype=np.int64), "side": np.int64(1)})
        out["_part"] = _stable_partition(out, ["key"], 8)
        return table_from_pandas(out)

    customer = read_table(f"{sf_dir}/customer.parquet",
                          columns=["c_custkey"])
    both = (orders.map_batches(fact_keys, batch_format="pyarrow")
            .union(customer.map_batches(dim_keys,
                                        batch_format="pyarrow")))

    def anti(g: pd.DataFrame) -> pd.DataFrame:
        fact = np.unique(g[g["side"] == 0]["key"].to_numpy(
            dtype=np.int64))
        dim = np.unique(g[g["side"] == 1]["key"].to_numpy(
            dtype=np.int64))
        if len(dim):
            pos = np.clip(np.searchsorted(dim, fact), 0,
                          len(dim) - 1)
            missing = int((dim[pos] != fact).sum())
        else:
            missing = len(fact)
        return pd.DataFrame({"check_name": ["custkey_in_customer"],
                             "n_violations": [np.int64(missing)]})

    ref = hash_groupby_agg(
        both.groupby("_part").map_groups(anti, batch_format="pandas"),
        ["check_name"], {"n_violations": ("n_violations", "sum")},
        num_parts=2)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.astype({"n_violations": "int64"})
        return df.sort_values("check_name").reset_index(drop=True)

    return (scalars.union(uniq).union(ref)
            .repartition(1)
            .map_batches(finish, batch_format="pandas"))


def star_revenue_rollup(sf_dir: str) -> rd.Dataset:
    """Star-schema rollup: lineitem revenue by (p_brand, supplier
    nation, l_returnflag) with BOTH dimension joins fused into ONE
    map_batches pass — each dim (part -> brand, supplier -> nation ->
    name) broadcasts once via ray.put and resolves with a vectorized
    take per batch; the only exchange is the final
    |brands x nations x flags|-bounded aggregate. The multi-dim
    broadcast-join fusion a star query compiles to when every
    dimension fits in memory (TPC-H Q9's shape without the orders
    fact join). Output: (p_brand, n_name, l_returnflag, revenue)."""
    import pyarrow.dataset as pads

    from ..stages.hashagg import hash_groupby_agg

    part = pads.dataset(f"{sf_dir}/part.parquet").to_table(
        columns=["p_partkey", "p_brand"])
    supp = pads.dataset(f"{sf_dir}/supplier.parquet").to_table(
        columns=["s_suppkey", "s_nationkey"])
    nation = pads.dataset(f"{sf_dir}/nation.parquet").to_table(
        columns=["n_nationkey", "n_name"])

    pk = part.column("p_partkey").to_numpy()
    brand_lut = np.empty(pk.max() + 1, dtype=object)
    brand_lut[pk] = part.column("p_brand").to_numpy(
        zero_copy_only=False)
    sk = supp.column("s_suppkey").to_numpy()
    snat = np.zeros(sk.max() + 1, dtype=np.int64)
    snat[sk] = supp.column("s_nationkey").to_numpy()
    nk = nation.column("n_nationkey").to_numpy()
    nname = np.empty(nk.max() + 1, dtype=object)
    nname[nk] = nation.column("n_name").to_numpy(
        zero_copy_only=False)
    lut_ref = ray.put((brand_lut, snat, nname))

    ds = read_table(f"{sf_dir}/lineitem.parquet",
                    columns=["l_partkey", "l_suppkey", "l_returnflag",
                             "l_extendedprice", "l_discount"])

    def enrich(batch: pa.Table) -> pa.Table:
        bl, sn, nn = ray.get(lut_ref)
        df = batch.to_pandas()
        # fixed-point: price has 2dp, discount 2dp -> revenue is an
        # exact integer in 1e-4-dollar units; int64 partials make the
        # grouped sum bit-identical under ANY block split (the float
        # path differed from DuckDB by one cent on .xx5 boundaries)
        pc = np.rint(df["l_extendedprice"].to_numpy()
                     * 100.0).astype(np.int64)
        dc = np.rint(df["l_discount"].to_numpy()
                     * 100.0).astype(np.int64)
        out = pd.DataFrame({
            "p_brand": bl[df["l_partkey"].to_numpy(dtype=np.int64)],
            "n_name": nn[sn[df["l_suppkey"].to_numpy(
                dtype=np.int64)]],
            "l_returnflag": df["l_returnflag"].to_numpy(),
            "rev4": pc * (100 - dc)})
        g = out.groupby(["p_brand", "n_name", "l_returnflag"],
                        as_index=False)["rev4"].sum()
        return table_from_pandas(g)

    agg = hash_groupby_agg(
        ds.map_batches(enrich, batch_format="pyarrow"),
        ["p_brand", "n_name", "l_returnflag"],
        {"rev4": ("rev4", "sum")}, num_parts=8)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["revenue"] = round_half_up(
            df["rev4"].to_numpy(dtype=np.float64) / 1e4, 2)
        return df[["p_brand", "n_name", "l_returnflag", "revenue"]]

    return (agg.map_batches(finish, batch_format="pandas")
            .repartition(1)
            .sort(["p_brand", "n_name", "l_returnflag"]))


def bucketed_segment_revenue(sf_dir: str,
                             num_buckets: int = 16) -> rd.Dataset:
    """Order revenue per customer market segment computed through the
    BUCKETED-STORAGE path: both tables are written hash-bucketed on
    the customer key once (`sources/storage.write_bucketed` — the
    Hive/Iceberg bucket-transform layout), then joined bucket-aligned
    with ZERO exchange (`bucket_aligned_join`: one task per bucket
    reads both sides' bucket files and merges locally). The recurring
    big join a warehouse pays for at write time instead of per query;
    the final aggregate is a |segments|-bounded reduce. Fixed-point
    cents keep the sum bit-identical. Output: (c_mktsegment, n_orders,
    revenue)."""
    from ..sources.storage import (bucket_aligned_join, cached_layout,
                                   write_bucketed)
    from ..stages.hashagg import hash_groupby_agg

    osrc = f"{sf_dir}/orders.parquet"
    csrc = f"{sf_dir}/customer.parquet"

    def build(d: str) -> None:
        # bucket layout is a persistent artifact, written once per
        # (corpus fingerprint, bucket count)
        write_bucketed(
            read_table(osrc, columns=["o_custkey", "o_totalprice"]),
            f"{d}/orders", "o_custkey", num_buckets)
        write_bucketed(
            read_table(csrc, columns=["c_custkey", "c_mktsegment"]),
            f"{d}/customer", "c_custkey", num_buckets)

    base = cached_layout(f"bucketed_custkey_b{num_buckets}",
                         [osrc, csrc], build)
    od, cd = f"{base}/orders", f"{base}/customer"

    def merge(left: pd.DataFrame, right: pd.DataFrame
              ) -> pd.DataFrame:
        m = left.merge(right, left_on="o_custkey",
                       right_on="c_custkey")
        m["cents"] = np.rint(
            m["o_totalprice"].to_numpy() * 100.0).astype(np.int64)
        return m.groupby("c_mktsegment", as_index=False).agg(
            n_orders=("cents", "size"), cents=("cents", "sum"))

    joined = bucket_aligned_join(od, cd, merge, num_buckets)
    agg = hash_groupby_agg(joined, ["c_mktsegment"],
                           {"n_orders": ("n_orders", "sum"),
                            "cents": ("cents", "sum")}, num_parts=2)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.astype({"n_orders": "int64", "cents": "int64"})
        df["revenue"] = round_half_up(
            df["cents"].to_numpy(dtype=np.float64) / 100.0, 2)
        return df[["c_mktsegment", "n_orders", "revenue"]]

    return (agg.map_batches(finish, batch_format="pandas")
            .repartition(1).sort("c_mktsegment"))


def join_size_estimate(sf_dir: str, nbuckets: int = 256) -> rd.Dataset:
    """Join-cardinality estimation (the optimizer statistic that
    decides broadcast vs partitioned plans): |orders join lineitem on
    orderkey| computed two ways WITHOUT running the join — exactly,
    as sum over keys of n_a(k) * n_b(k) from the two (key, count)
    reduces; and approximately from ``nbuckets`` coarse key-bucket
    histograms (what a real optimizer keeps when per-key counts don't
    fit — always an OVERestimate since collisions multiply).

    Plan: each side folds (key % nbuckets, key, n) partials; one
    co-partitioned exchange merges the two count tables; both
    statistics fold from the merged table. Output: one row
    (exact_pairs, bucket_estimate, overcount_pct)."""
    from ..functions.tables import table_from_pandas
    from ..stages.hashagg import _stable_partition

    def side(path: str, key: str, tag: int) -> rd.Dataset:
        def partial(batch: pa.Table) -> pa.Table:
            k, c = np.unique(batch.column(key).to_numpy(
                zero_copy_only=False), return_counts=True)
            out = pd.DataFrame({"key": k.astype(np.int64),
                                "n": c.astype(np.int64),
                                "side": np.int64(tag)})
            # partition by BUCKET (not key hash) so every bucket's
            # keys land whole in one part — the bucket histogram then
            # folds exactly from per-part pieces, and the oracle can
            # express the same modulo arithmetic
            out["_part"] = (out["key"] % nbuckets) % 16
            return table_from_pandas(out)

        return read_table(path, columns=[key]).map_batches(
            partial, batch_format="pyarrow")

    both = side(f"{sf_dir}/orders.parquet", "o_orderkey", 0).union(
        side(f"{sf_dir}/lineitem.parquet", "l_orderkey", 1))

    def merge_counts(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby(["key", "side"], as_index=False)["n"].sum()
        a = c[c["side"] == 0][["key", "n"]]
        b = c[c["side"] == 1][["key", "n"]]
        m = a.merge(b, on="key", suffixes=("_a", "_b"))
        exact = int((m["n_a"].to_numpy(dtype=np.int64)
                     * m["n_b"].to_numpy(dtype=np.int64)).sum())
        # bucket histograms: sum na per bucket x sum nb per bucket
        ab = a.assign(bk=a["key"] % nbuckets).groupby("bk")["n"].sum()
        bb = b.assign(bk=b["key"] % nbuckets).groupby("bk")["n"].sum()
        j = ab.to_frame("na").join(bb.to_frame("nb"), how="inner")
        est = int((j["na"].to_numpy(dtype=np.int64)
                   * j["nb"].to_numpy(dtype=np.int64)).sum())
        return pd.DataFrame({"exact": [np.int64(exact)],
                             "est": [np.int64(est)]})

    parts = both.groupby("_part").map_groups(merge_counts,
                                             batch_format="pandas")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        exact = int(df["exact"].sum())
        est = int(df["est"].sum())
        return pd.DataFrame({
            "exact_pairs": [np.int64(exact)],
            "bucket_estimate": [np.int64(est)],
            "overcount_pct": round_half_up(
                np.array([100.0 * (est - exact) / exact]), 4),
        })

    return parts.repartition(1).map_batches(finish,
                                            batch_format="pandas")


def lineitem_corr_matrix(sf_dir: str) -> rd.Dataset:
    """Pairwise Pearson correlation matrix over the lineitem numeric
    measures (discount, extendedprice, quantity, tax) — the
    column-association profile a feature-engineering / data-audit pass
    computes before modeling. One streaming pass folds each block to a
    SINGLE row of raw power sums (n, Σx, Σx² per column, Σxy per pair);
    the combine is |blocks| rows to one, so there is no keyed exchange
    at all, and the closed-form corr finish runs on scalars. Upper
    triangle only (x < y lexicographically). Output: (x, y, pearson_r)
    sorted by (x, y), r rounded to 6.

    Generalizes the mergeable-moments family (qty_price_regression /
    quantity_price_stats) from one pair to the full matrix; reference
    analogue: the global stats of evaluate_new_testdata.py:82-118."""
    cols = ["l_discount", "l_extendedprice", "l_quantity", "l_tax"]
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1:]]
    ds = read_table(f"{sf_dir}/lineitem.parquet", columns=cols)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = {c: df[c].to_numpy(dtype=np.float64) for c in cols}
        out = {"n": np.float64(len(df))}
        for c in cols:
            out[f"s_{c}"] = v[c].sum()
            out[f"ss_{c}"] = (v[c] * v[c]).sum()
        for a, b in pairs:
            out[f"sp_{a}_{b}"] = (v[a] * v[b]).sum()
        return pd.DataFrame([out])

    def final(df: pd.DataFrame) -> pd.DataFrame:
        t = df.sum()
        n = float(t["n"])
        rows = []
        for a, b in pairs:
            cov = t[f"sp_{a}_{b}"] - t[f"s_{a}"] * t[f"s_{b}"] / n
            va = t[f"ss_{a}"] - t[f"s_{a}"] ** 2 / n
            vb = t[f"ss_{b}"] - t[f"s_{b}"] ** 2 / n
            rows.append({"x": a, "y": b,
                         "pearson_r": float(round_half_up(
                             cov / np.sqrt(va * vb), 6))})
        return pd.DataFrame(rows)

    return (ds.map_batches(partial, batch_format="pandas")
            .repartition(1)
            .map_batches(final, batch_format="pandas")
            .sort(["x", "y"]))


def _ntile_of_rank0(rank0: np.ndarray, n: int, k: int) -> np.ndarray:
    """SQL NTILE bucket (1-based) for 0-based ranks in a group of n
    rows: the first n % k buckets hold ceil(n/k) rows, the rest
    floor(n/k)."""
    q, r = divmod(n, k)
    cut = (q + 1) * r
    lo = rank0 < cut
    out = np.empty(len(rank0), dtype=np.int64)
    out[lo] = rank0[lo] // (q + 1)
    if q > 0:
        out[~lo] = r + (rank0[~lo] - cut) // q
    return out + 1


def priority_price_ntile(sf_dir: str, k: int = 4) -> rd.Dataset:
    """Exact distributed NTILE(k) window — ``ntile(k) OVER (PARTITION
    BY o_orderpriority ORDER BY o_totalprice, o_orderkey)`` — without
    any global sort. Prices are exact at 2 decimals, so each
    priority's ordering reduces to a DOMAIN-BOUNDED integer-cents
    value histogram (one two-phase hash aggregate, sized by the price
    domain not the table); tile spans resolve on the driver from
    cumulative counts, and only tie groups that STRADDLE a tile
    boundary — at most k-1 per priority — are re-ranked by orderkey
    via a tiny filtered gather. Every other row's tile is a broadcast
    histogram probe, and the output aggregate is another tiny keyed
    exchange on (priority, tile). Money sums stay in integer cents so
    the per-tile average is exact. Output: (o_orderpriority, tile,
    n_orders, avg_price) sorted, avg rounded to 4."""
    from ..stages.hashagg import hash_groupby_agg

    orders = read_table(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_orderpriority",
                                 "o_totalprice"])

    def hist_partial(df: pd.DataFrame) -> pd.DataFrame:
        c = np.rint(df["o_totalprice"].to_numpy() * 100).astype(np.int64)
        return (pd.DataFrame({"pri": df["o_orderpriority"].to_numpy(),
                              "cents": c})
                .groupby(["pri", "cents"], as_index=False).size()
                .rename(columns={"size": "n"}))

    hist = hash_groupby_agg(
        orders.map_batches(hist_partial, batch_format="pandas"),
        ["pri", "cents"], {"n": ("n", "sum")},
        num_parts=8).to_pandas().sort_values(["pri", "cents"])

    # driver: resolve each (pri, cents) tie group to a tile, or mark it
    # boundary-straddling (its rows need orderkey ranks)
    probe_tab: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
    boundary: dict[tuple[str, int], int] = {}  # -> rank0 of first row
    for pri, g in hist.groupby("pri", sort=False):
        cents = g["cents"].to_numpy(dtype=np.int64)
        cnt = g["n"].to_numpy(dtype=np.int64)
        cum = np.cumsum(cnt)
        first0 = cum - cnt                      # 0-based rank of first
        n_pri = int(cum[-1])
        t_first = _ntile_of_rank0(first0, n_pri, k)
        t_last = _ntile_of_rank0(cum - 1, n_pri, k)
        tiles = np.where(t_first == t_last, t_first, np.int64(-1))
        probe_tab[pri] = (cents, tiles, first0)
        for c0, f0 in zip(cents[tiles == -1], first0[tiles == -1]):
            boundary[(pri, int(c0))] = int(f0)
    n_per_pri = {p: int(hist[hist["pri"] == p]["n"].sum())
                 for p in hist["pri"].unique()}

    # tiny gather: orderkeys of boundary-straddling tie groups only
    bkey_tiles: dict[int, int] = {}
    if boundary:
        bset = set(boundary)

        def grab(df: pd.DataFrame) -> pd.DataFrame:
            c = np.rint(df["o_totalprice"].to_numpy() * 100).astype(
                np.int64)
            pri = df["o_orderpriority"].to_numpy()
            keep = np.fromiter(
                ((p, int(cc)) in bset for p, cc in zip(pri, c)),
                dtype=bool, count=len(df))
            return pd.DataFrame({
                "pri": pri[keep], "cents": c[keep],
                "o_orderkey": df["o_orderkey"].to_numpy()[keep]})

        tie_rows = (orders.map_batches(grab, batch_format="pandas")
                    .to_pandas().sort_values(["pri", "cents",
                                              "o_orderkey"]))
        for (pri, c0), g in tie_rows.groupby(["pri", "cents"],
                                             sort=False):
            f0 = boundary[(pri, int(c0))]
            r0 = f0 + np.arange(len(g), dtype=np.int64)
            tl = _ntile_of_rank0(r0, n_per_pri[pri], k)
            for key, t in zip(g["o_orderkey"].to_numpy(), tl):
                bkey_tiles[int(key)] = int(t)

    bkeys = np.array(sorted(bkey_tiles), dtype=np.int64)
    btiles = np.array([bkey_tiles[int(x)] for x in bkeys],
                      dtype=np.int64)
    lut_ref = ray.put((probe_tab, bkeys, btiles))

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        tab, bk, bt = ray.get(lut_ref)
        c = np.rint(df["o_totalprice"].to_numpy() * 100).astype(np.int64)
        pri = df["o_orderpriority"].to_numpy()
        key = df["o_orderkey"].to_numpy(dtype=np.int64)
        tile = np.empty(len(df), dtype=np.int64)
        for p in pd.unique(pri):
            m = pri == p
            cents_s, tiles_s, _ = tab[p]
            tile[m] = tiles_s[np.searchsorted(cents_s, c[m])]
        ties = tile == -1
        if ties.any():
            tile[ties] = bt[np.searchsorted(bk, key[ties])]
        return (pd.DataFrame({"o_orderpriority": pri, "tile": tile,
                              "cents": c})
                .groupby(["o_orderpriority", "tile"], as_index=False)
                .agg(n_orders=("cents", "size"), s=("cents", "sum")))

    agg = hash_groupby_agg(
        orders.map_batches(assign, batch_format="pandas"),
        ["o_orderpriority", "tile"],
        {"n_orders": ("n_orders", "sum"), "s": ("s", "sum")},
        num_parts=2)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["n_orders"] = df["n_orders"].astype(np.int64)
        df["avg_price"] = round_half_up(
            df["s"].to_numpy(dtype=np.float64)
            / (100.0 * df["n_orders"].to_numpy()), 4)
        return df[["o_orderpriority", "tile", "n_orders", "avg_price"]]

    return (agg.map_batches(finish, batch_format="pandas")
            .repartition(1).sort(["o_orderpriority", "tile"]))


def qty_price_spearman(sf_dir: str) -> rd.Dataset:
    """Exact Spearman rank correlation between l_quantity and
    l_extendedprice WITHOUT any global sort: both columns are exact at
    fixed decimals, so average ranks (the tie-aware ranks Spearman
    needs) come from DOMAIN-BOUNDED value histograms — rank_avg(v) =
    |{x < v}| + (|{x = v}| + 1) / 2. One melted pass folds both
    histograms through a single keyed exchange sized by the two value
    domains; ranks broadcast as sorted arrays; a second pass probes by
    searchsorted, CENTERS the ranks by (n+1)/2 (kills the float
    cancellation a raw power sum would hit at fact scale) and folds
    one moment row per block. Output: (n_items, spearman_rho)."""
    from ..stages.hashagg import hash_groupby_agg

    ds = read_table(f"{sf_dir}/lineitem.parquet",
                    columns=["l_quantity", "l_extendedprice"])

    def hist_partial(df: pd.DataFrame) -> pd.DataFrame:
        q = np.rint(df["l_quantity"].to_numpy() * 100).astype(np.int64)
        p = np.rint(df["l_extendedprice"].to_numpy() * 100).astype(
            np.int64)
        m = pd.DataFrame({
            "col": np.repeat(np.array(["q", "p"]), len(df)),
            "v": np.concatenate([q, p])})
        return (m.groupby(["col", "v"], as_index=False).size()
                .rename(columns={"size": "n"}))

    hist = hash_groupby_agg(
        ds.map_batches(hist_partial, batch_format="pandas"),
        ["col", "v"], {"n": ("n", "sum")},
        num_parts=8).to_pandas().sort_values(["col", "v"])

    luts = {}
    n_total = 0
    for col, g in hist.groupby("col", sort=False):
        v = g["v"].to_numpy(dtype=np.int64)
        c = g["n"].to_numpy(dtype=np.int64)
        cum_less = np.cumsum(c) - c
        rank_avg = cum_less + (c + 1) / 2.0
        luts[col] = (v, rank_avg)
        n_total = int(c.sum())
    center = (n_total + 1) / 2.0
    lut_ref = ray.put((luts, center))

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        lu, ctr = ray.get(lut_ref)
        q = np.rint(df["l_quantity"].to_numpy() * 100).astype(np.int64)
        p = np.rint(df["l_extendedprice"].to_numpy() * 100).astype(
            np.int64)
        vq, rq = lu["q"]
        vp, rp = lu["p"]
        x = rq[np.searchsorted(vq, q)] - ctr
        y = rp[np.searchsorted(vp, p)] - ctr
        return pd.DataFrame([{"sxy": (x * y).sum(),
                              "sxx": (x * x).sum(),
                              "syy": (y * y).sum()}])

    def final(df: pd.DataFrame) -> pd.DataFrame:
        t = df.sum()
        rho = t["sxy"] / np.sqrt(t["sxx"] * t["syy"])
        return pd.DataFrame({
            "n_items": np.array([n_total], dtype=np.int64),
            "spearman_rho": round_half_up(np.array([rho]), 6)})

    return (ds.map_batches(moments, batch_format="pandas")
            .repartition(1).map_batches(final, batch_format="pandas"))


def price_theil_by_priority(sf_dir: str) -> rd.Dataset:
    """Theil T inequality index of order value per priority class —
    the decomposable inequality measure (sibling of the exact Gini
    already in revenue_gini) in its GROUPED form. Theil is fully
    mergeable: T = Σ x·ln(x) / Σx − ln(Σx / n), so each block folds to
    one (priority, n, Σx, Σ x·ln x) row and the only exchange is
    |priorities| x blocks partials. Output: (o_orderpriority,
    n_orders, theil) sorted, rounded to 6."""
    from ..stages.hashagg import hash_groupby_agg

    ds = read_table(f"{sf_dir}/orders.parquet",
                    columns=["o_orderpriority", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = df["o_totalprice"].to_numpy(dtype=np.float64)
        t = pd.DataFrame({"o_orderpriority": df["o_orderpriority"],
                          "n": 1.0, "s": x, "sxl": x * np.log(x)})
        return t.groupby("o_orderpriority", as_index=False).sum()

    agg = hash_groupby_agg(
        ds.map_batches(partial, batch_format="pandas"),
        ["o_orderpriority"],
        {c: (c, "sum") for c in ("n", "s", "sxl")}, num_parts=2)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].to_numpy(dtype=np.float64)
        s = df["s"].to_numpy(dtype=np.float64)
        sxl = df["sxl"].to_numpy(dtype=np.float64)
        return pd.DataFrame({
            "o_orderpriority": df["o_orderpriority"],
            "n_orders": n.astype(np.int64),
            "theil": round_half_up(sxl / s - np.log(s / n), 6)})

    return (agg.map_batches(final, batch_format="pandas")
            .repartition(1).sort("o_orderpriority"))


def customer_reorder_gaps(sf_dir: str) -> rd.Dataset:
    """Repeat-purchase cadence: the distribution of day gaps between a
    customer's consecutive orders — n, mean, and EXACT interpolated
    median — the retention metric behind replenishment forecasting.
    Plan: ONE coarse hash(custkey) % 16 shuffle co-locates each
    customer's orders; a single vectorized ordered scan per bucket
    diffs order dates inside customer segments; the gap values are
    small integers (days), so the global median needs only a
    DOMAIN-BOUNDED day histogram — each bucket folds (gap, count)
    partials plus one (n, Σgap) row and the interpolated selection
    runs on the reduced histogram. No global sort. Output: one row
    (n_gaps, mean_gap_days, median_gap_days)."""
    from ..stages.hashagg import _stable_partition, hash_groupby_agg

    ds = read_table(f"{sf_dir}/orders.parquet",
                    columns=["o_custkey", "o_orderkey", "o_orderdate"])

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_b"] = _stable_partition(df, ["o_custkey"], 16)
        return df

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
        c = g["o_custkey"].to_numpy(dtype=np.int64)
        d = g["o_orderdate"].to_numpy(
            dtype="datetime64[D]").view(np.int64)
        same = np.zeros(len(g), dtype=bool)
        same[1:] = c[1:] == c[:-1]
        gaps = (d[1:] - d[:-1])[same[1:]]
        if len(gaps) == 0:
            return pd.DataFrame({"gap": pd.Series([], dtype=np.int64),
                                 "n": pd.Series([], dtype=np.int64)})
        h = (pd.DataFrame({"gap": gaps})
             .groupby("gap", as_index=False).size()
             .rename(columns={"size": "n"}))
        return h

    hist = hash_groupby_agg(
        ds.map_batches(tag, batch_format="pandas")
        .groupby("_b").map_groups(per_bucket, batch_format="pandas"),
        ["gap"], {"n": ("n", "sum")}, num_parts=4).repartition(1)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("gap")
        g = df["gap"].to_numpy(dtype=np.float64)
        c = df["n"].to_numpy(dtype=np.int64)
        cum = np.cumsum(c)
        n = int(cum[-1]) if len(cum) else 0
        mean = float((g * c).sum() / n) if n else 0.0

        def at(rank0: int) -> float:
            return float(g[int(np.searchsorted(cum, rank0 + 1))])

        p = 0.5 * (n - 1)
        k = int(np.floor(p))
        med = at(k) + (p - k) * (at(min(k + 1, n - 1)) - at(k)) \
            if n else 0.0
        return pd.DataFrame({
            "n_gaps": np.array([n], dtype=np.int64),
            "mean_gap_days": round_half_up(np.array([mean]), 4),
            "median_gap_days": round_half_up(np.array([med]), 4)})

    return hist.map_batches(finish, batch_format="pandas")


def bootstrap_mean_ci(sf_dir: str, n_resamples: int = 32) -> pd.DataFrame:
    """Poisson-bootstrap confidence interval for the mean of
    l_extendedprice (Chamandy et al. 2012, "Estimating Uncertainty for
    Massive Data Streams" — the bootstrap that works in one streaming
    pass because resample membership is drawn PER ROW, Poisson(1), no
    global n needed). Determinism: the resample weight of row r in
    replicate b is the inverse-CDF lookup of a splitmix64 mix of
    (orderkey * 10007 + linenumber, b) — independent of blocking, so
    any cluster size reproduces the same CI bit-for-bit. Each block
    folds (Σ w_b·x, Σ w_b) for all B replicates plus the base (n, Σx)
    — a (2B + 2)-number partial, combined once; the percentile CI runs
    on the B replicate means. Output: one row (n_items, mean,
    se_boot, ci_lo, ci_hi) — rows-only (per-row pseudo-random weights
    are not SQL-expressible; determinism + statistical-sanity pytest)."""
    # Poisson(1) CDF, enough mass to 1 - 1e-13
    from math import exp, factorial
    cdf = np.cumsum([exp(-1.0) / factorial(k) for k in range(18)])

    def mix64(v: np.ndarray) -> np.ndarray:
        # splitmix64 finalizer (public domain, Steele et al.)
        v = v.astype(np.uint64)
        with np.errstate(over="ignore"):
            v = (v ^ (v >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            v = (v ^ (v >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return v ^ (v >> np.uint64(31))

    B = n_resamples
    ds = read_table(f"{sf_dir}/lineitem.parquet",
                    columns=["l_orderkey", "l_linenumber",
                             "l_extendedprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = df["l_extendedprice"].to_numpy(dtype=np.float64)
        key = (df["l_orderkey"].to_numpy(dtype=np.int64)
               * np.int64(10007)
               + df["l_linenumber"].to_numpy(dtype=np.int64))
        out = {"n": np.float64(len(x)), "sx": x.sum()}
        for b in range(B):
            u = mix64(key.astype(np.uint64)
                      + np.uint64(b) * np.uint64(0x9E3779B97F4A7C15)) \
                .astype(np.float64) / 18446744073709551616.0
            w = np.searchsorted(cdf, u).astype(np.float64)
            out[f"swx_{b}"] = (w * x).sum()
            out[f"sw_{b}"] = w.sum()
        return pd.DataFrame([out])

    parts = (ds.map_batches(partial, batch_format="pandas")
             .repartition(1).to_pandas().sum())
    n = float(parts["n"])
    mean = parts["sx"] / n
    means = np.array([parts[f"swx_{b}"] / parts[f"sw_{b}"]
                      for b in range(B)])
    se = float(means.std(ddof=1))
    lo, hi = np.percentile(means, [2.5, 97.5])
    return pd.DataFrame({
        "n_items": np.array([n], dtype=np.int64),
        "mean": round_half_up(np.array([mean]), 4),
        "se_boot": round_half_up(np.array([se]), 4),
        "ci_lo": round_half_up(np.array([lo]), 4),
        "ci_hi": round_half_up(np.array([hi]), 4)})


def copurchase_degree_powerlaw(sf_dir: str, min_count: int = 2
                               ) -> rd.Dataset:
    """Power-law fit of the co-purchase degree distribution: the
    continuous MLE alpha = 1 + n / Σ ln(d / (dmin − 0.5)) of
    Clauset–Shalizi–Newman (SIAM Rev. 2009) at dmin = 1 — the
    graph-health diagnostic (heavy-tail exponent) run before any
    degree-sensitive algorithm (the wedge phase of triangle_count is
    quadratic in degree, so alpha IS the skew forecast). Degrees fold
    from the shared edge table through ONE vertex-keyed exchange (both
    endpoints exploded, partial-counted per block); the MLE is a
    mergeable (n, Σ ln d) fold on the |vertices| table. Output: one
    row (n_nodes, max_degree, alpha) rounded to 6."""
    from ..stages.hashagg import hash_groupby_agg

    edges = _co_purchase_edges(sf_dir, min_count)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        v = np.concatenate([df["p1"].to_numpy(dtype=np.int64),
                            df["p2"].to_numpy(dtype=np.int64)])
        return (pd.DataFrame({"v": v}).groupby("v", as_index=False)
                .size().rename(columns={"size": "d"}))

    deg = hash_groupby_agg(
        edges.map_batches(explode, batch_format="pandas"),
        ["v"], {"d": ("d", "sum")}, num_parts=8)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df["d"].to_numpy(dtype=np.float64)
        return pd.DataFrame([{
            "n": np.float64(len(d)),
            "slnd": np.log(d / 0.5).sum(),
            "dmax": d.max() if len(d) else 0.0}])

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].sum()
        return pd.DataFrame({
            "n_nodes": np.array([n], dtype=np.int64),
            "max_degree": np.array([df["dmax"].max()], dtype=np.int64),
            "alpha": round_half_up(
                np.array([1.0 + n / df["slnd"].sum()]), 6)})

    return (deg.map_batches(partial, batch_format="pandas")
            .repartition(1).map_batches(finish, batch_format="pandas"))


def copurchase_kcore(sf_dir: str, k: int = 3,
                     min_count: int = 2,
                     broadcast_threshold: int = 2_000_000
                     ) -> pd.DataFrame:
    """k-core decomposition of the co-purchase graph by iterative
    peeling (Matula & Beck 1983): repeatedly delete vertices with
    degree < k until the residual graph is stable — the standard
    dense-substructure extractor (community seeds, spam rings).
    Distributed shape: each round is ONE vertex-keyed degree exchange
    over the CURRENT edge set plus a drop-set anti-filter; the edge
    table is already reduced (distinct co-ordered pairs) and only
    SHRINKS, and each round's survivor set is materialized so the next
    round never re-executes prior lineage. Peeling rounds are
    inherently sequential (each depends on the previous residual).

    The per-round drop-set filter follows the repo's standard size
    dispatch (VERDICT r04 #3 — this was the one anti-join without it):
    the degree table stays a DATASET; below ``broadcast_threshold``
    drop vertices, only the FILTERED drop rows reach the driver and
    broadcast once via ``ray.put`` (sorted searchsorted anti-filter
    per batch); above, a hash-partitioned anti-join on each endpoint
    (two narrow (v) exchanges per round, nothing on the driver). Both
    plans emit identical residuals (tested). Output: one row (k,
    n_rounds, core_vertices, core_edges) — rows-only (iterative
    fixpoint is not SQL-expressible; brute-force peeling pytest)."""
    import pyarrow.compute as pc
    import ray as _ray

    from ..stages.hashagg import hash_groupby_agg
    from ..stages.join import partitioned_join

    def _explode_deg(df: pd.DataFrame) -> pd.DataFrame:
        v = np.concatenate([df["p1"].to_numpy(dtype=np.int64),
                            df["p2"].to_numpy(dtype=np.int64)])
        return (pd.DataFrame({"v": v}).groupby("v", as_index=False)
                .size().rename(columns={"size": "d"}))

    edge_schema = pa.schema([("p1", pa.int64()), ("p2", pa.int64())])
    drop_schema = pa.schema([("v", pa.int64())])

    edges = _co_purchase_edges(sf_dir, min_count) \
        .select_columns(["p1", "p2"]).materialize()
    rounds = 0
    while True:
        if edges.count() == 0:
            break
        # degrees fold DISTRIBUTED and stay distributed; the reduce to
        # the drop-set (deg < k) happens before anything is collected
        deg = hash_groupby_agg(
            edges.map_batches(_explode_deg, batch_format="pandas"),
            ["v"], {"d": ("d", "sum")}, num_parts=4)
        drop_ds = deg.map_batches(
            lambda t: t.filter(pc.less(t.column("d"), k)),
            batch_format="pyarrow").select_columns(["v"]).materialize()
        n_drop = drop_ds.count()
        if n_drop == 0:
            break
        rounds += 1

        if n_drop <= broadcast_threshold:
            drop_ref = _ray.put(np.sort(
                drop_ds.to_pandas()["v"].to_numpy(dtype=np.int64)))

            def keep(batch: pa.Table) -> pa.Table:
                dr = _ray.get(drop_ref)
                p1 = batch.column("p1").to_numpy(zero_copy_only=False)
                p2 = batch.column("p2").to_numpy(zero_copy_only=False)

                def hit(x):
                    pos = np.searchsorted(dr, x)
                    pos[pos >= len(dr)] = len(dr) - 1 if len(dr) else 0
                    return (dr[pos] == x) if len(dr) else np.zeros(
                        len(x), bool)

                return batch.filter(pa.array(~(hit(p1) | hit(p2))))

            edges = edges.map_batches(
                keep, batch_format="pyarrow").materialize()
        else:
            # partitioned anti-join per endpoint: co-partition edges
            # with the drop-set on the endpoint key; a bucket-local
            # left merge marks hits, survivors pass through
            for col in ("p1", "p2"):
                def anti(lf: pd.DataFrame, rf: pd.DataFrame,
                         col=col) -> pd.DataFrame:
                    rf2 = rf.rename(columns={"v": col})
                    rf2 = rf2.assign(_hit=np.int64(1))
                    m = lf.merge(rf2, on=col, how="left")
                    keep_rows = m["_hit"].isna()
                    return pd.DataFrame({
                        "p1": m.loc[keep_rows, "p1"]
                        .to_numpy(dtype=np.int64),
                        "p2": m.loc[keep_rows, "p2"]
                        .to_numpy(dtype=np.int64)})

                edges = partitioned_join(
                    edges, drop_ds, col, "v", anti, num_buckets=32,
                    left_schema=edge_schema, right_schema=drop_schema)
            edges = edges.materialize()

    ne = edges.count()
    nv = hash_groupby_agg(
        edges.map_batches(_explode_deg, batch_format="pandas"),
        ["v"], {"d": ("d", "sum")}, num_parts=4).count() if ne else 0
    return pd.DataFrame({
        "k": np.array([k], dtype=np.int64),
        "n_rounds": np.array([rounds], dtype=np.int64),
        "core_vertices": np.array([nv], dtype=np.int64),
        "core_edges": np.array([ne], dtype=np.int64)})


def frequent_triples(sf_dir: str, min_count: int = 2,
                     k: int = 20) -> rd.Dataset:
    """Frequent-itemset mining at size 3: part triples co-ordered in
    at least ``min_count`` orders, top-k by support — one Apriori rung
    above :func:`co_purchase_pairs`. Same single-exchange basket plan:
    distinct (orderkey, partkey) pairs dedup AND co-locate through ONE
    orderkey-bucket shuffle; each bucket expands its baskets' triples
    with a vectorized three-way self-merge ordered p1 < p2 < p3
    (cubic only in basket width, bounded — order width caps at tens);
    triple supports reduce through the two-phase hash aggregate with
    the HAVING prune in the finish and a per-block partial top-k ahead
    of the tiny output sort. Output: (p1, p2, p3, n_orders) sorted
    support desc then triple asc, top-k."""
    from ..stages.hashagg import _stable_partition, hash_groupby_agg

    items = read_table(f"{sf_dir}/lineitem.parquet",
                       columns=["l_orderkey", "l_partkey"])

    def distinct_partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates()
        df = df[["l_orderkey", "l_partkey"]].copy()
        df["_obucket"] = _stable_partition(df, ["l_orderkey"], 32)
        return df

    def expand_triples(g: pd.DataFrame) -> pd.DataFrame:
        g = g[["l_orderkey", "l_partkey"]].drop_duplicates()
        m = g.merge(g, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        m = m.merge(g, on="l_orderkey")
        m = m[m["l_partkey_y"] < m["l_partkey"]]
        return (pd.DataFrame({
            "p1": m["l_partkey_x"].to_numpy(dtype=np.int64),
            "p2": m["l_partkey_y"].to_numpy(dtype=np.int64),
            "p3": m["l_partkey"].to_numpy(dtype=np.int64)})
            .groupby(["p1", "p2", "p3"], as_index=False)
            .size().rename(columns={"size": "n_orders"}))

    per_bucket = (items.map_batches(distinct_partial,
                                    batch_format="pandas")
                  .groupby("_obucket")
                  .map_groups(expand_triples, batch_format="pandas"))

    counts = hash_groupby_agg(per_bucket, ["p1", "p2", "p3"],
                              {"n_orders": ("n_orders", "sum")},
                              num_parts=8)

    def topk_partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["n_orders"] >= min_count].copy()
        df = df.sort_values(["n_orders", "p1", "p2", "p3"],
                            ascending=[False, True, True, True])
        for c in ("p1", "p2", "p3", "n_orders"):
            df[c] = df[c].astype(np.int64)
        return df.head(k)

    return (counts.map_batches(topk_partial, batch_format="pandas")
            .repartition(1)
            .map_batches(topk_partial, batch_format="pandas")
            .sort(["n_orders", "p1", "p2", "p3"],
                  descending=[True, False, False, False]))


def qty_discount_kendall(sf_dir: str) -> rd.Dataset:
    """Exact Kendall tau-b rank correlation between l_quantity and
    l_discount WITHOUT any pairwise join over rows: both columns live
    on tiny bounded domains (integer quantities, percent-step
    discounts), so the full 2-D CONTINGENCY TABLE is the sufficient
    statistic. One keyed exchange folds per-block (q, d) cell counts
    (<= |Q|x|D| rows per block); the driver computes concordant /
    discordant pair counts from 2-D suffix sums over the cell matrix
    and the tie corrections from the marginals — tau-b = (C - D) /
    sqrt((n0 - n1)(n0 - n2)) (Kendall 1945 tie-adjusted form; same
    histogram-not-rows trick as qty_price_spearman above). Output:
    (n_items, kendall_tau_b) rounded to 6."""
    from ..stages.hashagg import hash_groupby_agg

    ds = read_table(f"{sf_dir}/lineitem.parquet",
                    columns=["l_quantity", "l_discount"])

    def cell_partial(df: pd.DataFrame) -> pd.DataFrame:
        q = np.rint(df["l_quantity"].to_numpy()).astype(np.int64)
        d = np.rint(df["l_discount"].to_numpy() * 100).astype(np.int64)
        return (pd.DataFrame({"q": q, "d": d})
                .groupby(["q", "d"], as_index=False).size()
                .rename(columns={"size": "n"}))

    cells = hash_groupby_agg(
        ds.map_batches(cell_partial, batch_format="pandas"),
        ["q", "d"], {"n": ("n", "sum")},
        num_parts=4).to_pandas()

    qs = np.sort(cells["q"].unique())
    dvs = np.sort(cells["d"].unique())
    M = np.zeros((len(qs), len(dvs)), dtype=np.int64)
    M[np.searchsorted(qs, cells["q"].to_numpy()),
      np.searchsorted(dvs, cells["d"].to_numpy())] = \
        cells["n"].to_numpy(dtype=np.int64)

    # suffix sums: G[i,j] = sum of M over (i' > i, j' > j); H over
    # (i' > i, j' < j). Each unordered pair is counted exactly once.
    below = np.cumsum(M[::-1], axis=0)[::-1]  # rows >= i
    strict_rows = np.vstack([below[1:], np.zeros((1, M.shape[1]),
                                                 dtype=np.int64)])
    csum = np.cumsum(strict_rows, axis=1)
    G = strict_rows.sum(axis=1, keepdims=True) - csum  # j' > j
    H = csum - strict_rows                             # j' < j
    C = int((M * G).sum())
    D = int((M * H).sum())

    n = int(M.sum())
    n0 = n * (n - 1) / 2.0
    tq = M.sum(axis=1).astype(np.float64)
    td = M.sum(axis=0).astype(np.float64)
    n1 = float((tq * (tq - 1) / 2.0).sum())
    n2 = float((td * (td - 1) / 2.0).sum())
    tau = (C - D) / np.sqrt((n0 - n1) * (n0 - n2))

    out = pa.Table.from_pydict({
        "n_items": pa.array([n], pa.int64()),
        "kendall_tau_b": pa.array(
            round_half_up(np.array([tau]), 6), pa.float64())})
    return rd.from_arrow(out)


def price_mannwhitney(sf_dir: str) -> rd.Dataset:
    """Mann-Whitney U rank-sum test of l_extendedprice between every
    pair of l_returnflag groups — the non-parametric two-sample
    location test (Mann & Whitney 1947), with tie-corrected normal
    approximation. No global sort: prices are exact at cents, so one
    keyed exchange folds the (flag, cents) histogram (domain-bounded,
    the order_price_cume_dist trick); the driver derives PER-PAIR
    tie-aware average ranks from the two groups' merged histograms
    (vectorized over the value domain, never over rows) and computes
    U_a = R_a - n_a(n_a+1)/2 and z = (U_a - mu) / sigma with the
    tie-corrected sigma. Output: (flag_a, flag_b, n_a, n_b, u_stat,
    z_score) by (flag_a, flag_b), rounded to 6 / u to 2."""
    from ..stages.hashagg import hash_groupby_agg

    ds = read_table(f"{sf_dir}/lineitem.parquet",
                    columns=["l_returnflag", "l_extendedprice"])

    def hist_partial(df: pd.DataFrame) -> pd.DataFrame:
        v = np.rint(df["l_extendedprice"].to_numpy() * 100).astype(
            np.int64)
        return (pd.DataFrame({"f": df["l_returnflag"].to_numpy(),
                              "v": v})
                .groupby(["f", "v"], as_index=False).size()
                .rename(columns={"size": "n"}))

    hist = hash_groupby_agg(
        ds.map_batches(hist_partial, batch_format="pandas"),
        ["f", "v"], {"n": ("n", "sum")},
        num_parts=8).to_pandas().sort_values(["f", "v"])

    flags = sorted(hist["f"].unique())
    by_flag = {f: (g["v"].to_numpy(dtype=np.int64),
                   g["n"].to_numpy(dtype=np.int64))
               for f, g in hist.groupby("f", sort=True)}

    rows = []
    for i in range(len(flags)):
        for j in range(i + 1, len(flags)):
            fa, fb = flags[i], flags[j]
            va, na_ = by_flag[fa]
            vb, nb_ = by_flag[fb]
            vs = np.union1d(va, vb)
            ca = np.zeros(len(vs), dtype=np.int64)
            cb = np.zeros(len(vs), dtype=np.int64)
            ca[np.searchsorted(vs, va)] = na_
            cb[np.searchsorted(vs, vb)] = nb_
            cn = ca + cb
            cum_less = np.cumsum(cn) - cn
            ravg = cum_less + (cn + 1) / 2.0
            n_a = int(ca.sum())
            n_b = int(cb.sum())
            r_a = float((ca * ravg).sum())
            u_a = r_a - n_a * (n_a + 1) / 2.0
            nn = n_a + n_b
            tie3 = float((cn.astype(np.float64) ** 3 - cn).sum())
            mu = n_a * n_b / 2.0
            sig = np.sqrt(n_a * n_b / 12.0
                          * ((nn + 1) - tie3 / (nn * (nn - 1.0))))
            rows.append({"flag_a": fa, "flag_b": fb,
                         "n_a": n_a, "n_b": n_b,
                         "u_stat": u_a, "z": (u_a - mu) / sig})

    df = pd.DataFrame(rows)
    out = pa.Table.from_pydict({
        "flag_a": pa.array(df["flag_a"], pa.string()),
        "flag_b": pa.array(df["flag_b"], pa.string()),
        "n_a": pa.array(df["n_a"], pa.int64()),
        "n_b": pa.array(df["n_b"], pa.int64()),
        "u_stat": pa.array(
            round_half_up(df["u_stat"].to_numpy(), 2), pa.float64()),
        "z_score": pa.array(
            round_half_up(df["z"].to_numpy(), 6), pa.float64())})
    return rd.from_arrow(out)


def _init_factors_for_test(ids: np.ndarray, nf: int) -> np.ndarray:
    """Deterministic splitmix64-style ALS factor init: per-(id, dim)
    hash mapped to uniform [0, 0.1] — reproducible across workers and
    parallelism levels (module-level so the pytest local reference can
    share it verbatim)."""
    j = np.arange(nf, dtype=np.uint64)
    with np.errstate(over="ignore"):
        h = (ids.astype(np.uint64)[:, None]
             * np.uint64(0x9E3779B97F4A7C15)
             + (j + np.uint64(1)) * np.uint64(0xBF58476D1CE4E5B9))
        h ^= h >> np.uint64(31)
        h *= np.uint64(0x94D049BB133111EB)
        h ^= h >> np.uint64(29)
    return (h / np.float64(2 ** 64)) * 0.1


def als_recommendations(sf_dir: str, f: int = 8, alpha: float = 40.0,
                        lam: float = 0.1, iters: int = 3, k: int = 3,
                        n_users_out: int = 20,
                        broadcast_threshold: int = 2_000_000
                        ) -> rd.Dataset:
    """Implicit-feedback ALS matrix factorization (Hu, Koren &
    Volinsky 2008) over the customer x part purchase matrix, emitting
    top-k unseen-part recommendations for a deterministic user panel.
    The reference has no recommender; this is the canonical iterative
    alternating-solve workload a training-data platform runs on
    interaction logs.

    The (custkey, partkey, qty) interaction table is built with ONE
    orderkey-partitioned join (lineitem x orders) + a (cust, part)
    hash aggregate, then MATERIALIZED once (reduced table — one row
    per distinct pair, not per lineitem). Per-key normal equations
    A_u = YtY + lam*I + alpha Σ r y yᵀ, b_u = Σ (1+alpha r) y fold
    with np.add.at over f x f outer products and ONE batched
    np.linalg.solve per bucket — no per-user Python loop.

    Size dispatch (VERDICT r04 #1 — this was the last driver-side
    materialization in a benched pipeline). Below
    ``broadcast_threshold`` interaction pairs, factors are
    driver-collected between half-steps and the fixed side ships once
    per step via ray.put (one keyed exchange per half-step). Above,
    NOTHING unbounded touches the driver: factors stay DATASETS, each
    half-step attaches the fixed side with
    ``stages/join.partitioned_join`` on the fixed key then buckets by
    the solved key (two narrow exchanges), the f x f Gram reduces as
    per-bucket partials summed in fixed bucket order, and scoring
    streams the item-factor table against the broadcast n_users_out x
    f panel block with per-block top-k partials; the seen-item mask
    pulls only the PANEL users' pairs. Both plans are BIT-IDENTICAL
    (tested): the Gram is canonically computed as ordered per-bucket
    partial sums in both, attachment supplies the same float64 y
    vectors the broadcast lookup does, each bucket folds on the same
    total (key, other) order, and scoring uses the same elementwise
    einsum — so no summation order depends on block arrival. Init is
    deterministic (splitmix-style hash of the item id). Output:
    (c_custkey, rec_rank, p_partkey, score) for the n_users_out
    smallest custkeys, scores rounded to 4, ties broken by partkey."""
    from ..stages.hashagg import (_stable_partition,
                                  hash_groupby_agg,
                                  stable_hash_column)
    from ..stages.join import partitioned_join

    NB = 16
    fcols = [f"f{i}" for i in range(f)]

    items = read_table(f"{sf_dir}/lineitem.parquet",
                       columns=["l_orderkey", "l_partkey",
                                "l_quantity"])
    orders = read_table(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_custkey"])

    def merge(o_df: pd.DataFrame, l_df: pd.DataFrame) -> pd.DataFrame:
        m = o_df.merge(l_df, left_on="o_orderkey",
                       right_on="l_orderkey")
        return (m.groupby(["o_custkey", "l_partkey"], as_index=False)
                .agg(r=("l_quantity", "sum")))

    inter = hash_groupby_agg(
        partitioned_join(
            orders, items, "o_orderkey", "l_orderkey", merge,
            left_schema=pa.schema([("o_orderkey", pa.int64()),
                                   ("o_custkey", pa.int64())]),
            right_schema=pa.schema([("l_orderkey", pa.int64()),
                                    ("l_partkey", pa.int64()),
                                    ("l_quantity", pa.float64())])),
        ["o_custkey", "l_partkey"], {"r": ("r", "sum")},
        num_parts=16).materialize()

    _init_factors = _init_factors_for_test

    def _id_bucket(ids: np.ndarray) -> np.ndarray:
        # raw-array mirror of _stable_partition([...], NB) on one int
        # key — the factor-block bucketing MUST match the solve
        # bucketing so each factor block is one complete Gram bucket
        return _stable_partition(
            pd.DataFrame({"id": ids}), ["id"], NB)

    def _canonical_gram(ids_sorted: np.ndarray,
                        fac: np.ndarray) -> np.ndarray:
        # Gram as ordered per-bucket partial sums: the ONE float fold
        # both plans share, so the distributed reduce (one partial
        # per factor block, summed in bucket order) is bit-equal to
        # the driver-local computation
        b = _id_bucket(ids_sorted)
        g = np.zeros((f, f))
        for bb in range(NB):
            sub = np.ascontiguousarray(fac[b == bb])
            if len(sub):
                g = g + sub.T @ sub
        return g + lam * np.eye(f)

    def _solve_fold(g: pd.DataFrame, yr: np.ndarray,
                    gr: np.ndarray, key: str) -> pd.DataFrame:
        # shared normal-equation fold: g sorted by (key, other), yr
        # the fixed-side vectors row-aligned to g
        keys_ = g[key].to_numpy(dtype=np.int64)
        r = g["r"].to_numpy(dtype=np.float64)
        uk, idx = np.unique(keys_, return_inverse=True)
        cw = alpha * r
        A = np.broadcast_to(gr, (len(uk), f, f)).copy()
        contrib = np.einsum("nf,ng->nfg", yr * cw[:, None], yr)
        np.add.at(A, idx, contrib)
        B = np.zeros((len(uk), f))
        np.add.at(B, idx, yr * (1.0 + cw)[:, None])
        X = np.linalg.solve(A, B)
        out = pd.DataFrame(X, columns=fcols)
        out.insert(0, "id", uk)
        return out

    def _topk_rows(panel: np.ndarray, item_ids: np.ndarray,
                   scores: np.ndarray, kk: int) -> pd.DataFrame:
        rows = []
        for ui, u in enumerate(panel):
            order = np.lexsort((item_ids, -scores[ui]))[:kk]
            for rank, ii in enumerate(order, 1):
                rows.append((int(u), rank, int(item_ids[ii]),
                             float(scores[ui, ii])))
        return pd.DataFrame(rows, columns=["c_custkey", "rec_rank",
                                           "p_partkey", "score"])

    def _finish(df: pd.DataFrame) -> rd.Dataset:
        out = pa.Table.from_pydict({
            "c_custkey": pa.array(df["c_custkey"], pa.int64()),
            "rec_rank": pa.array(df["rec_rank"], pa.int64()),
            "p_partkey": pa.array(df["p_partkey"], pa.int64()),
            "score": pa.array(
                round_half_up(df["score"].to_numpy(np.float64), 4),
                pa.float64())})
        return rd.from_arrow(out)

    def _seen_pairs(panel: np.ndarray) -> pd.DataFrame:
        # seen-item mask for the PANEL only: a bounded
        # (n_users_out x their items) pull, never the full pair table
        panel_ref = ray.put(np.sort(panel))

        def flt(batch: pa.Table) -> pa.Table:
            p = ray.get(panel_ref)
            ids = batch.column("o_custkey").to_numpy(
                zero_copy_only=False)
            pos = np.searchsorted(p, ids)
            pos[pos >= len(p)] = len(p) - 1 if len(p) else 0
            hit = (p[pos] == ids) if len(p) else np.zeros(
                len(ids), bool)
            return batch.filter(pa.array(hit))

        return (inter.map_batches(flt, batch_format="pyarrow")
                .select_columns(["o_custkey", "l_partkey"])
                .to_pandas())

    # ---------- broadcast plan (pairs fit the driver budget) ----------
    if inter.count() <= broadcast_threshold:
        # The pair table is driver-bounded here BY DISPATCH, so no
        # half-step needs an exchange at all: ship the pair arrays +
        # both bucket labelings ONCE via ray.put and solve each bucket
        # as an independent rd.range(NB) map task (6 exchanges -> 0;
        # 10.3 s -> see BENCH round 5). Per-bucket rows, sort order and
        # float folds are exactly the groupby plan's, so the
        # broadcast/partitioned bit-identity test still pins both.
        pairs_df = inter.to_pandas()
        pairs = {
            "o_custkey": pairs_df["o_custkey"].to_numpy(np.int64),
            "l_partkey": pairs_df["l_partkey"].to_numpy(np.int64),
            "r": pairs_df["r"].to_numpy(np.float64),
            "_b_o_custkey": _stable_partition(
                pairs_df, ["o_custkey"], NB),
            "_b_l_partkey": _stable_partition(
                pairs_df, ["l_partkey"], NB),
        }
        pairs_ref = ray.put(pairs)

        def _solve_side(key: str, other: str, fixed_ids: np.ndarray,
                        fixed_fac: np.ndarray) -> pd.DataFrame:
            gram = _canonical_gram(fixed_ids, fixed_fac)
            ref = ray.put((fixed_ids, fixed_fac, gram))

            def solve_buckets(batch: pa.Table) -> pd.DataFrame:
                P = ray.get(pairs_ref)
                fids, ffac, gr = ray.get(ref)
                bcol = P[f"_b_{key}"]
                outs = []
                for b in batch.column("id").to_pylist():
                    m = bcol == b
                    if not m.any():
                        continue
                    g = pd.DataFrame({key: P[key][m],
                                      other: P[other][m],
                                      "r": P["r"][m]})
                    g = g.sort_values([key, other])
                    oth = g[other].to_numpy(dtype=np.int64)
                    yr = ffac[np.searchsorted(fids, oth)]
                    outs.append(_solve_fold(g, yr, gr, key))
                if not outs:
                    return pd.DataFrame(
                        {"id": np.empty(0, np.int64),
                         **{c: np.empty(0, np.float64)
                            for c in fcols}})
                return pd.concat(outs, ignore_index=True)

            return (rd.range(NB, override_num_blocks=NB)
                    .map_batches(solve_buckets, batch_format="pyarrow")
                    .to_pandas().sort_values("id"))

        ids_df = pairs_df[["o_custkey", "l_partkey"]]
        item_ids = np.sort(
            ids_df["l_partkey"].unique()).astype(np.int64)
        Y = _init_factors(item_ids, f)

        for _ in range(iters):
            xdf = _solve_side("o_custkey", "l_partkey", item_ids, Y)
            user_ids = xdf["id"].to_numpy(dtype=np.int64)
            X = xdf[fcols].to_numpy()
            ydf = _solve_side("l_partkey", "o_custkey", user_ids, X)
            item_ids = ydf["id"].to_numpy(dtype=np.int64)
            Y = ydf[fcols].to_numpy()

        panel = user_ids[:n_users_out]
        Xp = np.ascontiguousarray(X[:n_users_out])
        # elementwise einsum (fixed f-order reduction) — identical
        # under any chunking of the item axis, see partitioned plan
        scores = np.einsum("uf,if->ui", Xp, Y)
        seen = ids_df[ids_df["o_custkey"].isin(panel)]
        u_idx = np.searchsorted(panel, seen["o_custkey"].to_numpy())
        i_idx = np.searchsorted(item_ids, seen["l_partkey"].to_numpy())
        scores[u_idx, i_idx] = -np.inf
        return _finish(_topk_rows(panel, item_ids, scores, k))

    # ---------- partitioned plan (factors never touch the driver) -----
    inter_schema = pa.schema([("o_custkey", pa.int64()),
                              ("l_partkey", pa.int64()),
                              ("r", pa.float64())])
    fac_schema = pa.schema([("id", pa.int64())]
                           + [(c, pa.float64()) for c in fcols])

    def _init_item_factors() -> rd.Dataset:
        # distinct item ids reduce distributed, then one bucket
        # exchange lays factors out one complete bucket per block
        # (uk-sorted) — the invariant the Gram reduce relies on
        iid = hash_groupby_agg(
            inter.map_batches(
                lambda t: pa.Table.from_pydict(
                    {"id": t.column("l_partkey")}),
                batch_format="pyarrow"),
            ["id"], {"_n": ("id", "count")}, num_parts=8)

        def tag(df: pd.DataFrame) -> pd.DataFrame:
            df = df[["id"]].copy()
            df["_b"] = _stable_partition(df, ["id"], NB)
            return df

        def init_bucket(g: pd.DataFrame) -> pd.DataFrame:
            ids = np.sort(g["id"].to_numpy(dtype=np.int64))
            fac = _init_factors(ids, f)
            out = pd.DataFrame(fac, columns=fcols)
            out.insert(0, "id", ids)
            return out

        return (iid.map_batches(tag, batch_format="pandas")
                .groupby("_b")
                .map_groups(init_bucket, batch_format="pandas")
                .materialize())

    def _gram_from_ds(fac_ds: rd.Dataset) -> np.ndarray:
        gcols = [f"g{i}" for i in range(f * f)]

        def part(df: pd.DataFrame) -> pd.DataFrame:
            ids = df["id"].to_numpy(dtype=np.int64)
            b = _id_bucket(ids)
            rows = []
            for bb in np.unique(b):
                sub = df.loc[b == bb].sort_values("id")
                m = np.ascontiguousarray(
                    sub[fcols].to_numpy(np.float64))
                gg = m.T @ m
                row = {"b": np.int64(bb),
                       "min_id": np.int64(sub["id"].min())}
                row.update({c: v for c, v in
                            zip(gcols, gg.ravel())})
                rows.append(row)
            return pd.DataFrame(
                rows, columns=["b", "min_id"] + gcols)

        parts = (fac_ds.map_batches(part, batch_format="pandas")
                 .to_pandas().sort_values(["b", "min_id"]))
        g = np.zeros((f, f))
        for _, row in parts.iterrows():
            g = g + row[gcols].to_numpy(np.float64).reshape(f, f)
        return g + lam * np.eye(f)

    def _solve_side_ds(key: str, other: str, fixed_ds: rd.Dataset
                       ) -> rd.Dataset:
        gram_ref = ray.put(_gram_from_ds(fixed_ds))

        def attach(lf: pd.DataFrame, rf: pd.DataFrame
                   ) -> pd.DataFrame:
            return lf.merge(rf.rename(columns={"id": other}),
                            on=other, how="inner")

        joined = partitioned_join(
            inter, fixed_ds, other, "id", attach, num_buckets=NB,
            left_schema=inter_schema, right_schema=fac_schema)

        def tag(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["_b"] = _stable_partition(df, [key], NB)
            return df

        def solve_bucket(g: pd.DataFrame) -> pd.DataFrame:
            gr = ray.get(gram_ref)
            g = g.sort_values([key, other])
            yr = np.ascontiguousarray(g[fcols].to_numpy(np.float64))
            return _solve_fold(g, yr, gr, key)

        return (joined.map_batches(tag, batch_format="pandas")
                .groupby("_b")
                .map_groups(solve_bucket, batch_format="pandas")
                .materialize())

    item_fac = _init_item_factors()
    user_fac = None
    for _ in range(iters):
        user_fac = _solve_side_ds("o_custkey", "l_partkey", item_fac)
        item_fac = _solve_side_ds("l_partkey", "o_custkey", user_fac)

    # panel: the n_users_out smallest user ids — per-block bottom-n
    # partials, a bounded driver combine
    def bottom_ids(df: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(df["id"].to_numpy(dtype=np.int64))
        return pd.DataFrame({"id": ids[:n_users_out]})

    panel = np.sort(user_fac.map_batches(
        bottom_ids, batch_format="pandas")
        .to_pandas()["id"].to_numpy(np.int64))[:n_users_out]

    panel_ref = ray.put(panel)

    def panel_rows(df: pd.DataFrame) -> pd.DataFrame:
        p = ray.get(panel_ref)
        return df[df["id"].isin(p)]

    pf = (user_fac.map_batches(panel_rows, batch_format="pandas")
          .to_pandas().sort_values("id"))
    Xp = np.ascontiguousarray(pf[fcols].to_numpy(np.float64))

    seen = _seen_pairs(panel)
    seen_key = (seen["o_custkey"].to_numpy(np.int64) << np.int64(32)) \
        | seen["l_partkey"].to_numpy(np.int64)
    seen_key = np.sort(seen_key)
    score_ref = ray.put((panel, Xp, seen_key))

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        p, xp, sk = ray.get(score_ref)
        ids = df["id"].to_numpy(dtype=np.int64)
        yb = np.ascontiguousarray(df[fcols].to_numpy(np.float64))
        sc = np.einsum("uf,if->ui", xp, yb)
        # mask this block's seen pairs to -inf (same semantics as the
        # broadcast plan: masked items still rank, at -inf)
        for ui, u in enumerate(p):
            keys = (np.int64(u) << np.int64(32)) | ids
            pos = np.searchsorted(sk, keys)
            pos[pos >= len(sk)] = len(sk) - 1 if len(sk) else 0
            hit = (sk[pos] == keys) if len(sk) else np.zeros(
                len(keys), bool)
            sc[ui, hit] = -np.inf
        return _topk_rows(p, ids, sc, k)

    cand = (item_fac.map_batches(block_topk, batch_format="pandas")
            .to_pandas())
    # exact global top-k per user from the per-block candidates (the
    # global best-k by (score desc, partkey asc) is contained in the
    # union of per-block best-k under the same total order)
    rows = []
    for u in panel:
        cu = cand[cand["c_custkey"] == u]
        iid = cu["p_partkey"].to_numpy(np.int64)
        sc = cu["score"].to_numpy(np.float64)
        order = np.lexsort((iid, -sc))[:k]
        for rank, ii in enumerate(order, 1):
            rows.append((int(u), rank, int(iid[ii]),
                         float(sc[ii])))
    return _finish(pd.DataFrame(
        rows, columns=["c_custkey", "rec_rank", "p_partkey",
                       "score"]))


def price_ks_test(sf_dir: str) -> rd.Dataset:
    """Two-sample Kolmogorov-Smirnov statistic of l_extendedprice
    between every pair of l_returnflag groups: D = max_v |F_a(v) -
    F_b(v)| plus the sample-size-scaled statistic
    sqrt(n_a n_b / (n_a + n_b)) * D (Smirnov 1939). Same
    domain-bounded plan as price_mannwhitney: ONE (flag, cents)
    histogram exchange; the driver takes per-pair ECDF differences on
    the merged value domain — D is a max over <=|domain| exact
    fractions, never a row scan. Output: (flag_a, flag_b, n_a, n_b,
    ks_stat, ks_scaled) by pair, rounded to 6."""
    from ..stages.hashagg import hash_groupby_agg

    ds = read_table(f"{sf_dir}/lineitem.parquet",
                    columns=["l_returnflag", "l_extendedprice"])

    def hist_partial(df: pd.DataFrame) -> pd.DataFrame:
        v = np.rint(df["l_extendedprice"].to_numpy() * 100).astype(
            np.int64)
        return (pd.DataFrame({"f": df["l_returnflag"].to_numpy(),
                              "v": v})
                .groupby(["f", "v"], as_index=False).size()
                .rename(columns={"size": "n"}))

    hist = hash_groupby_agg(
        ds.map_batches(hist_partial, batch_format="pandas"),
        ["f", "v"], {"n": ("n", "sum")},
        num_parts=8).to_pandas().sort_values(["f", "v"])

    flags = sorted(hist["f"].unique())
    by_flag = {f: (g["v"].to_numpy(dtype=np.int64),
                   g["n"].to_numpy(dtype=np.int64))
               for f, g in hist.groupby("f", sort=True)}

    rows = []
    for i in range(len(flags)):
        for j in range(i + 1, len(flags)):
            fa, fb = flags[i], flags[j]
            va, na_ = by_flag[fa]
            vb, nb_ = by_flag[fb]
            vs = np.union1d(va, vb)
            ca = np.zeros(len(vs), dtype=np.int64)
            cb = np.zeros(len(vs), dtype=np.int64)
            ca[np.searchsorted(vs, va)] = na_
            cb[np.searchsorted(vs, vb)] = nb_
            n_a, n_b = int(ca.sum()), int(cb.sum())
            fa_cdf = np.cumsum(ca) / n_a
            fb_cdf = np.cumsum(cb) / n_b
            d = float(np.abs(fa_cdf - fb_cdf).max())
            rows.append({
                "flag_a": fa, "flag_b": fb, "n_a": n_a, "n_b": n_b,
                "ks": d,
                "kss": np.sqrt(n_a * n_b / (n_a + n_b)) * d})

    df = pd.DataFrame(rows)
    out = pa.Table.from_pydict({
        "flag_a": pa.array(df["flag_a"], pa.string()),
        "flag_b": pa.array(df["flag_b"], pa.string()),
        "n_a": pa.array(df["n_a"], pa.int64()),
        "n_b": pa.array(df["n_b"], pa.int64()),
        "ks_stat": pa.array(round_half_up(df["ks"].to_numpy(), 6),
                            pa.float64()),
        "ks_scaled": pa.array(round_half_up(df["kss"].to_numpy(), 6),
                              pa.float64())})
    return rd.from_arrow(out)


def price_anova_f(sf_dir: str) -> rd.Dataset:
    """One-way ANOVA F statistic of l_extendedprice across the
    l_returnflag groups from MERGEABLE MOMENTS only: each block folds
    per-group (n, Σx, Σx²) rows (|groups| x blocks exchange), and the
    driver forms SSB = Σ_g n_g (x̄_g - x̄)² and SSW = Σ_g (Σx² -
    (Σx)²/n_g) — the classic sufficient-statistic decomposition, no
    second pass and no row retention. Output: (n_total, k_groups,
    f_stat) rounded to 6."""
    from ..stages.hashagg import hash_groupby_agg

    ds = read_table(f"{sf_dir}/lineitem.parquet",
                    columns=["l_returnflag", "l_extendedprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = df["l_extendedprice"].to_numpy()
        g = pd.DataFrame({"f": df["l_returnflag"].to_numpy(),
                          "n": np.int64(1), "sx": x, "sxx": x * x})
        return g.groupby("f", as_index=False).sum()

    agg = hash_groupby_agg(
        ds.map_batches(partial, batch_format="pandas"),
        ["f"], {"n": ("n", "sum"), "sx": ("sx", "sum"),
                "sxx": ("sxx", "sum")}, num_parts=2).to_pandas()

    n = agg["n"].to_numpy(dtype=np.float64)
    sx = agg["sx"].to_numpy(dtype=np.float64)
    sxx = agg["sxx"].to_numpy(dtype=np.float64)
    nt = float(n.sum())
    k = len(agg)
    grand = sx.sum() / nt
    ssb = float((n * (sx / n - grand) ** 2).sum())
    ssw = float((sxx - sx * sx / n).sum())
    f_stat = (ssb / (k - 1)) / (ssw / (nt - k))

    out = pa.Table.from_pydict({
        "n_total": pa.array([int(nt)], pa.int64()),
        "k_groups": pa.array([k], pa.int64()),
        "f_stat": pa.array(round_half_up(np.array([f_stat]), 6),
                           pa.float64())})
    return rd.from_arrow(out)


def qty_discount_theilsen(sf_dir: str) -> rd.Dataset:
    """Theil-Sen robust slope of l_discount (in percent steps) on
    l_quantity — the median of all pairwise slopes (y_j - y_i) /
    (x_j - x_i) over pairs with distinct x (Theil 1950, Sen 1968) —
    WITHOUT the O(n²) pair scan: both columns live on tiny bounded
    domains, so the |Q|x|D| contingency table (one keyed exchange, the
    qty_discount_kendall plan) carries every pair as a weighted
    cell-pair. The driver expands <=(|Q||D|)²/2 weighted slopes and
    takes the exact WEIGHTED median (average of the two straddling
    positions for even totals, matching the unweighted definition).
    Output: (n_pairs, theilsen_slope) rounded to 6."""
    from ..stages.hashagg import hash_groupby_agg

    ds = read_table(f"{sf_dir}/lineitem.parquet",
                    columns=["l_quantity", "l_discount"])

    def cell_partial(df: pd.DataFrame) -> pd.DataFrame:
        q = np.rint(df["l_quantity"].to_numpy()).astype(np.int64)
        d = np.rint(df["l_discount"].to_numpy() * 100).astype(np.int64)
        return (pd.DataFrame({"q": q, "d": d})
                .groupby(["q", "d"], as_index=False).size()
                .rename(columns={"size": "n"}))

    cells = hash_groupby_agg(
        ds.map_batches(cell_partial, batch_format="pandas"),
        ["q", "d"], {"n": ("n", "sum")},
        num_parts=4).to_pandas().sort_values(["q", "d"])

    q = cells["q"].to_numpy(dtype=np.int64)
    d = cells["d"].to_numpy(dtype=np.int64)
    n = cells["n"].to_numpy(dtype=np.int64)
    ii, jj = np.triu_indices(len(cells), k=1)
    keep = q[ii] != q[jj]
    ii, jj = ii[keep], jj[keep]
    slopes = (d[jj] - d[ii]) / (q[jj] - q[ii]).astype(np.float64)
    wts = n[ii] * n[jj]

    order = np.argsort(slopes, kind="stable")
    slopes = slopes[order]
    wts = wts[order]
    cum = np.cumsum(wts)
    total = int(cum[-1])
    k1 = (total + 1) // 2
    k2 = (total + 2) // 2
    s1 = slopes[np.searchsorted(cum, k1)]
    s2 = slopes[np.searchsorted(cum, k2)]
    med = (s1 + s2) / 2.0

    out = pa.Table.from_pydict({
        "n_pairs": pa.array([total], pa.int64()),
        "theilsen_slope": pa.array(
            round_half_up(np.array([med]), 6), pa.float64())})
    return rd.from_arrow(out)


def holt_winters_daily(sf_dir: str, alpha: float = 0.3,
                       beta: float = 0.1, gamma: float = 0.2,
                       m: int = 7, horizon: int = 7,
                       year: str = "1997") -> rd.Dataset:
    """Additive Holt-Winters triple exponential smoothing (Holt 1957 /
    Winters 1960) of one year's daily order revenue, with a weekly
    (m=7) season — level + trend + seasonality fitted in one pass and
    an h-step-ahead forecast. The smoothing recursion is inherently
    sequential but runs over the DAY-CARDINALITY series only: the
    distributed work is the same fixed-point daily-cents reduce as
    daily_revenue_delta (exchange bounded by days x blocks), and the
    driver recursion is O(365). Missing days enter as 0 (explicit
    reindex over the calendar span). Output: the last `horizon` fitted
    values and the `horizon` forecasts — (day, kind, value) with kind
    in {fitted, forecast}, values in dollars rounded to 2, by day."""
    from ..stages.hashagg import hash_groupby_agg

    lo = np.datetime64(f"{year}-01-01", "us")
    hi = np.datetime64(f"{int(year) + 1}-01-01", "us")
    orders = read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderdate", "o_totalprice"],
        filter_expr=(pads.field("o_orderdate") >= lo)
        & (pads.field("o_orderdate") < hi))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[(df["o_orderdate"] >= pd.Timestamp(str(lo)))
                & (df["o_orderdate"] < pd.Timestamp(str(hi)))].copy()
        df["day"] = df["o_orderdate"].dt.strftime("%Y-%m-%d")
        df["rev"] = np.rint(df["o_totalprice"].to_numpy() * 100)
        return df.groupby("day", as_index=False).agg(rev=("rev", "sum"))

    daily = hash_groupby_agg(
        orders.map_batches(partial, batch_format="pandas"),
        ["day"], {"rev": ("rev", "sum")},
        num_parts=2).to_pandas().sort_values("day")

    idx = pd.date_range(str(lo)[:10], periods=(hi - lo).astype(
        "timedelta64[D]").astype(int), freq="D")
    series = (daily.set_index(pd.to_datetime(daily["day"]))["rev"]
              .reindex(idx, fill_value=0.0).to_numpy(dtype=np.float64)
              / 100.0)

    y = series
    lvl = float(y[:m].mean())
    trd = float((y[m:2 * m].mean() - y[:m].mean()) / m)
    season = (y[:m] - lvl).astype(np.float64)
    fitted = np.empty(len(y))
    for t in range(len(y)):
        s_old = season[t % m]
        fitted[t] = lvl + trd + s_old
        lvl_new = alpha * (y[t] - s_old) + (1 - alpha) * (lvl + trd)
        trd = beta * (lvl_new - lvl) + (1 - beta) * trd
        season[t % m] = gamma * (y[t] - lvl_new) + (1 - gamma) * s_old
        lvl = lvl_new

    days_fit = [d.strftime("%Y-%m-%d") for d in idx[-horizon:]]
    days_fc = [(idx[-1] + pd.Timedelta(days=h)).strftime("%Y-%m-%d")
               for h in range(1, horizon + 1)]
    vals_fc = [lvl + h * trd + season[(len(y) + h - 1) % m]
               for h in range(1, horizon + 1)]

    out = pa.Table.from_pydict({
        "day": pa.array(days_fit + days_fc, pa.string()),
        "kind": pa.array(["fitted"] * horizon
                         + ["forecast"] * horizon, pa.string()),
        "value": pa.array(round_half_up(
            np.concatenate([fitted[-horizon:], vals_fc]), 2),
            pa.float64())})
    return rd.from_arrow(out)


def daily_revenue_stl(sf_dir: str, year: str = "1997",
                      tail_days: int = 28) -> rd.Dataset:
    """STL-lite seasonal-trend decomposition of one year's daily order
    revenue (Cleveland et al. 1990 shape, single-pass moving-average
    variant): trend = centered 7-day moving average over the observed
    day series, seasonal = mean-centered weekday averages of the
    detrended series, residual = the rest. Distributed work is ONE
    fixed-point daily-cents reduce (day x blocks exchange); the
    decomposition runs on the day-cardinality series driver-side.
    Edge days without a full trend window are excluded (standard).
    Output: the last `tail_days` decomposed days — (day, revenue,
    trend, seasonal, resid) by day, revenue rounded to 2, the
    components to 4."""
    from ..stages.hashagg import hash_groupby_agg

    lo = np.datetime64(f"{year}-01-01", "us")
    hi = np.datetime64(f"{int(year) + 1}-01-01", "us")
    orders = read_table(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderdate", "o_totalprice"],
        filter_expr=(pads.field("o_orderdate") >= lo)
        & (pads.field("o_orderdate") < hi))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[(df["o_orderdate"] >= pd.Timestamp(str(lo)))
                & (df["o_orderdate"] < pd.Timestamp(str(hi)))].copy()
        df["day"] = df["o_orderdate"].dt.strftime("%Y-%m-%d")
        df["rev"] = np.rint(df["o_totalprice"].to_numpy() * 100)
        return df.groupby("day", as_index=False).agg(rev=("rev", "sum"))

    daily = hash_groupby_agg(
        orders.map_batches(partial, batch_format="pandas"),
        ["day"], {"rev": ("rev", "sum")},
        num_parts=2).to_pandas().sort_values("day").reset_index(
        drop=True)

    rev = daily["rev"].to_numpy(dtype=np.float64) / 100.0
    dow = pd.to_datetime(daily["day"]).dt.strftime("%w").astype(
        int).to_numpy()
    n = len(rev)
    # centered 7-day MA over observed-row positions (matches the SQL
    # ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING window on full windows)
    trend = np.convolve(rev, np.ones(7), mode="valid") / 7.0
    valid = slice(3, n - 3)
    det = rev[valid] - trend
    dv = dow[valid]
    sw = {w: float(det[dv == w].mean()) for w in np.unique(dv)}
    center = float(np.mean(list(sw.values())))
    seasonal = np.array([sw[w] - center for w in dv])
    resid = det - seasonal

    days_v = daily["day"].to_numpy()[valid]
    k = min(tail_days, len(days_v))
    out = pa.Table.from_pydict({
        "day": pa.array(days_v[-k:], pa.string()),
        "revenue": pa.array(round_half_up(rev[valid][-k:], 2),
                            pa.float64()),
        "trend": pa.array(round_half_up(trend[-k:], 4), pa.float64()),
        "seasonal": pa.array(round_half_up(seasonal[-k:], 4),
                             pa.float64()),
        "resid": pa.array(round_half_up(resid[-k:], 4), pa.float64())})
    return rd.from_arrow(out)


def association_rules(sf_dir: str, min_count: int = 3) -> rd.Dataset:
    """Market-basket association rules over the co-purchase graph:
    for every part pair co-ordered >= ``min_count`` times, both
    directed rules a=>b with support count, confidence
    P(b|a) = n_pair/n_a and lift P(a,b)/(P(a)P(b)) — the Agrawal-
    Srikant output the pair-count query stops short of. Generalizes
    the reference's confusion-PAIR counts (evaluate_new_testdata.py:
    120-163) to scored implication rules.

    Plan: pair counts reuse :func:`_co_purchase_edges` (one orderkey
    exchange + pair hash-agg). Item supports are a second distinct
    (orderkey, partkey) reduce keyed by part — part-cardinality, a
    DIM-scale table, broadcast as sorted arrays (at 100 TB the part
    side stays dim-sized; a fact-sized item domain would swap this
    for a partitioned join on antecedent). Total basket count is a
    free parquet metadata read. The finish attaches supports with two
    searchsorted probes and emits both rule directions vectorized.
    Output: (antecedent, consequent, n_pair, n_ant, confidence, lift)
    sorted lift desc, confidence desc, antecedent, consequent."""
    from ..stages.hashagg import _stable_partition, hash_groupby_agg

    items = read_table(f"{sf_dir}/lineitem.parquet",
                       columns=["l_orderkey", "l_partkey"])

    def distinct_partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates()[["l_orderkey", "l_partkey"]].copy()
        df["_obucket"] = _stable_partition(df, ["l_orderkey"], 32)
        return df

    def support_partial(g: pd.DataFrame) -> pd.DataFrame:
        g = g[["l_orderkey", "l_partkey"]].drop_duplicates()
        return (g.groupby("l_partkey", as_index=False)
                .agg(n=("l_orderkey", "size")))

    sup = hash_groupby_agg(
        items.map_batches(distinct_partial, batch_format="pandas")
        .groupby("_obucket")
        .map_groups(support_partial, batch_format="pandas"),
        ["l_partkey"], {"n": ("n", "sum")}, num_parts=8).to_pandas()
    sk = sup["l_partkey"].to_numpy(dtype=np.int64)
    sn = sup["n"].to_numpy(dtype=np.int64)
    order = np.argsort(sk)
    sup_ref = ray.put((sk[order], sn[order]))
    n_orders = float(_parquet_num_rows(f"{sf_dir}/orders.parquet"))

    pairs = _co_purchase_edges(sf_dir, min_count)

    def rules(df: pd.DataFrame) -> pd.DataFrame:
        keys, counts = ray.get(sup_ref)
        p1 = df["p1"].to_numpy(dtype=np.int64)
        p2 = df["p2"].to_numpy(dtype=np.int64)
        np_pair = df["n_orders"].to_numpy(dtype=np.int64)
        n1 = counts[np.searchsorted(keys, p1)].astype(np.float64)
        n2 = counts[np.searchsorted(keys, p2)].astype(np.float64)
        ant = np.concatenate([p1, p2])
        con = np.concatenate([p2, p1])
        npair2 = np.concatenate([np_pair, np_pair])
        na = np.concatenate([n1, n2])
        nc = np.concatenate([n2, n1])
        npf = npair2.astype(np.float64)
        return pd.DataFrame({
            "antecedent": ant, "consequent": con,
            "n_pair": npair2,
            "n_ant": na.astype(np.int64),
            "confidence": round_half_up(npf / na, 4),
            "lift": round_half_up(npf * n_orders / (na * nc), 4)})

    return (pairs.map_batches(rules, batch_format="pandas")
            .repartition(1)
            .sort(["lift", "confidence", "antecedent", "consequent"],
                  descending=[True, True, False, False]))


def lineitem_price_ols(sf_dir: str) -> rd.Dataset:
    """Closed-form multiple linear regression of l_extendedprice on
    (l_quantity, l_discount) with intercept — distributed ML via
    sufficient statistics: every worker folds the same ten power
    sums (X'X and X'y entries for the 3-parameter design), the
    partials add, and the 3x3 normal equations solve by Cramer's
    rule in the finish — the textbook "train a linear model with one
    MapReduce pass" shape (Chu et al. NIPS'06, map-reduce ML), and
    the multi-feature generalization of the regr_slope folds used by
    :func:`zipf_fit_by_source`.

    Plan: ONE narrow three-column read; ONE ten-number partial per
    block; repartition(1) combine; O(1) finish. The Cramer
    determinant expansion is written identically in the SQL oracle
    so both engines evaluate the same float expression tree. Output:
    one row (n, b0, b1, b2, r2) rounded to 6."""
    ds = read_table(f"{sf_dir}/lineitem.parquet",
                    columns=["l_quantity", "l_discount",
                             "l_extendedprice"])

    def partial(batch: pa.Table) -> pa.Table:
        x1 = batch.column("l_quantity").to_numpy(
            zero_copy_only=False).astype(np.float64)
        x2 = batch.column("l_discount").to_numpy(
            zero_copy_only=False).astype(np.float64)
        y = batch.column("l_extendedprice").to_numpy(
            zero_copy_only=False).astype(np.float64)
        return pa.Table.from_pydict({
            "n": pa.array([float(len(y))]),
            "s1": pa.array([float(x1.sum())]),
            "s2": pa.array([float(x2.sum())]),
            "s11": pa.array([float((x1 * x1).sum())]),
            "s12": pa.array([float((x1 * x2).sum())]),
            "s22": pa.array([float((x2 * x2).sum())]),
            "sy": pa.array([float(y.sum())]),
            "s1y": pa.array([float((x1 * y).sum())]),
            "s2y": pa.array([float((x2 * y).sum())]),
            "syy": pa.array([float((y * y).sum())])})

    agg = ds.map_batches(partial,
                         batch_format="pyarrow").repartition(1)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n = float(df["n"].sum())
        s1, s2 = float(df["s1"].sum()), float(df["s2"].sum())
        s11, s12 = float(df["s11"].sum()), float(df["s12"].sum())
        s22 = float(df["s22"].sum())
        sy = float(df["sy"].sum())
        s1y, s2y = float(df["s1y"].sum()), float(df["s2y"].sum())
        syy = float(df["syy"].sum())
        # Cramer's rule on [[n,s1,s2],[s1,s11,s12],[s2,s12,s22]] b =
        # [sy,s1y,s2y] — the same expansion, term for term, as the
        # SQL oracle
        det = (n * (s11 * s22 - s12 * s12)
               - s1 * (s1 * s22 - s12 * s2)
               + s2 * (s1 * s12 - s11 * s2))
        b0 = (sy * (s11 * s22 - s12 * s12)
              - s1 * (s1y * s22 - s12 * s2y)
              + s2 * (s1y * s12 - s11 * s2y)) / det
        b1 = (n * (s1y * s22 - s12 * s2y)
              - sy * (s1 * s22 - s12 * s2)
              + s2 * (s1 * s2y - s1y * s2)) / det
        b2 = (n * (s11 * s2y - s1y * s12)
              - s1 * (s1 * s2y - s1y * s2)
              + sy * (s1 * s12 - s11 * s2)) / det
        sse = syy - b0 * sy - b1 * s1y - b2 * s2y
        sst = syy - sy * sy / n
        r2 = 1.0 - sse / sst
        return pd.DataFrame({
            "n": [np.int64(n)],
            "b0": round_half_up(np.array([b0]), 6),
            "b1": round_half_up(np.array([b1]), 6),
            "b2": round_half_up(np.array([b2]), 6),
            "r2": round_half_up(np.array([r2]), 6)})

    return agg.map_batches(finish, batch_format="pandas")


def pruned_orderkey_revenue(sf_dir: str, lo: int = 3000,
                            hi: int = 8999) -> rd.Dataset:
    """Key-range revenue scan through a zone-map-pruned clustered
    layout: lineitem is written ONCE clustered on l_orderkey with
    small row groups (`sources/storage.write_clustered` — the
    Iceberg/Delta sort-order + zone-map pattern), then the range
    query touches ONLY the row groups whose min/max zone intersects
    [lo, hi] (`read_rowgroups_pruned`: one Ray task per surviving
    group, zero data pages read elsewhere). At 100 TB this is the
    difference between a full-table scan and a handful of tasks.
    Rows are re-filtered exactly inside the surviving groups; the
    aggregate is a |returnflags|-bounded fold on fixed-point cents.
    Output: (l_returnflag, n_items, sum_price) sorted by flag."""
    from ..sources.storage import (cached_layout,
                                   read_rowgroups_pruned,
                                   write_clustered)
    from ..stages.hashagg import hash_groupby_agg

    src = f"{sf_dir}/lineitem.parquet"
    out = cached_layout(
        "clustered_lineitem_orderkey_rg5000", [src],
        lambda d: write_clustered(
            read_table(src,
                       columns=["l_orderkey", "l_returnflag",
                                "l_extendedprice"]),
            d, "l_orderkey", row_group_size=5_000))

    ds, _stats = read_rowgroups_pruned(
        out, "l_orderkey", lo, hi,
        columns=["l_orderkey", "l_returnflag", "l_extendedprice"])
    if _stats["selected_row_groups"] == 0:
        # schema-carrying empty result (zone map proved the range
        # empty without reading a page)
        from ..sources.storage import from_arrow
        return from_arrow(pa.table({
            "l_returnflag": pa.array([], pa.string()),
            "n_items": pa.array([], pa.int64()),
            "sum_price": pa.array([], pa.float64())}))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        k = df["l_orderkey"].to_numpy(dtype=np.int64)
        m = (k >= lo) & (k <= hi)
        df = df[m]
        cents = np.rint(df["l_extendedprice"].to_numpy()
                        * 100).astype(np.int64)
        return (pd.DataFrame({"l_returnflag": df["l_returnflag"]
                              .to_numpy(),
                              "n_items": np.int64(1),
                              "cents": cents})
                .groupby("l_returnflag", as_index=False).sum())

    agg = hash_groupby_agg(
        ds.map_batches(partial, batch_format="pandas"),
        ["l_returnflag"],
        {"n_items": ("n_items", "sum"), "cents": ("cents", "sum")},
        num_parts=2)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "l_returnflag": df["l_returnflag"].to_numpy(),
            "n_items": df["n_items"].astype(np.int64),
            "sum_price": round_half_up(
                df["cents"].to_numpy(np.float64) / 100.0, 2)})

    return (agg.repartition(1)
            .map_batches(finish, batch_format="pandas")
            .sort("l_returnflag"))

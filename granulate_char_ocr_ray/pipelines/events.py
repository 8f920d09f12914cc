"""Event-stream pipelines: tumbling event-time windows and gap-based
sessionization over the events table.

Ray Data has no watermark/window primitives; the engine expresses
windows as derived-key grouped aggregates (tumbling) and coarse
user-bucketed ordered scans (sessions / as-of / range probes / window
frames) — the documented pattern for stream-shaped workloads
(SURVEY.md §2.9: the reference has no streaming constructs; these are
graft additions). Partitioning assumption: per-user semantics require
all events of a user in one group; that is provided by ONE
hash(user) % B coarse-bucket shuffle (B fixed, small) — NOT a native
per-user-key groupby, which dispatches a Python call per user and is
pathologically slow at web-scale user cardinality (CLAUDE.md footgun).
Inside a bucket every operator is a single vectorized ordered scan
over ALL of the bucket's users at once, with per-user resets expressed
as boundary masks on the sorted (user, ts, event_id) order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..functions.tables import table_from_pandas
from ray.data.aggregate import Sum

from ..functions.numeric import round_half_up
from ..sources.storage import read_table


def events_hourly(sf_dir: str) -> rd.Dataset:
    """Tumbling 1-hour windows per event_type: (event_type, hour,
    n_events, sum_value). Partial aggregation per batch precedes the
    (event_type, hour) groupby."""
    ds = read_table(f"{sf_dir}/events.parquet",
                    columns=["event_type", "ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["hour"] = df["ts"].dt.floor("h")
        g = df.groupby(["event_type", "hour"], as_index=False).agg(
            n_events=("value", "size"), sum_value=("value", "sum")
        )
        return table_from_pandas(g, preserve_index=False)

    agg = ds.map_batches(partial, batch_format="pyarrow").groupby(
        ["event_type", "hour"]
    ).aggregate(
        Sum("n_events", alias_name="n_events"),
        Sum("sum_value", alias_name="sum_value"),
    )

    def final(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["n_events"] = df["n_events"].astype(np.int64)
        df["sum_value"] = round_half_up(df["sum_value"], 2)
        return table_from_pandas(df, preserve_index=False)

    return agg.map_batches(final, batch_format="pyarrow")


def _user_bucketed(ds: rd.Dataset, nbuckets: int = 16) -> "rd.grouped_data.GroupedData":
    """Tag each row with hash(user_id) % nbuckets and group by the tag.

    ONE coarse shuffle co-locates every user's events while keeping the
    group count fixed at ``nbuckets`` regardless of user cardinality —
    the scale-safe replacement for ``groupby("user_id")`` (whose native
    dispatch is per-key Python at web-scale cardinality)."""
    from ..stages.hashagg import _stable_partition

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_ubucket"] = _stable_partition(df, ["user_id"], nbuckets)
        return df

    return ds.map_batches(tag, batch_format="pandas").groupby("_ubucket")


def _segment_starts(u: np.ndarray) -> np.ndarray:
    """Boolean mask: True where a new user segment begins in a sorted
    user-id array."""
    starts = np.ones(len(u), dtype=bool)
    starts[1:] = u[1:] != u[:-1]
    return starts


def user_sessions(sf_dir: str, gap_minutes: int = 30) -> rd.Dataset:
    """Gap-based sessionization: a new session starts when the time
    since the user's previous event exceeds ``gap_minutes``. Users
    co-locate through one coarse hash(user) % 16 shuffle; each bucket
    runs a single vectorized ordered scan over ALL its users (session
    breaks = gap OR user change; per-user totals via segment reduceat).
    Output: (user_id, n_events, n_sessions)."""
    ds = read_table(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    gap_ns = np.int64(gap_minutes) * np.int64(60_000_000_000)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"])
        u = g["user_id"].to_numpy(dtype=np.int64)
        ts = g["ts"].to_numpy(dtype="datetime64[ns]").view(np.int64)
        starts = _segment_starts(u)
        new_s = starts.copy()
        new_s[1:] |= ts[1:] - ts[:-1] > gap_ns
        idx = np.flatnonzero(starts)
        counts = np.diff(np.append(idx, len(u)))
        return pd.DataFrame({
            "user_id": u[idx],
            "n_events": counts.astype(np.int64),
            "n_sessions": np.add.reduceat(
                new_s.astype(np.int64), idx),
        })

    return _user_bucketed(ds).map_groups(per_bucket, batch_format="pandas")


def purchases_with_prev_click(sf_dir: str) -> rd.Dataset:
    """AS-OF join within the events stream: for every 'purchase' event,
    the value of the same user's latest STRICTLY PRIOR 'click' event
    (null if none) — ordering (ts, event_id) so ties are deterministic.

    One coarse user-bucket shuffle; inside a bucket the as-of lookup is
    a single vectorized scan over the (user, ts, event_id)-sorted rows:
    ``maximum.accumulate`` over click positions gives every row its
    latest click at-or-before, a one-row shift makes it strictly prior,
    and a segment-start mask nulls lookups that would cross a user
    boundary. Output: (event_id, user_id, prev_click_value)."""
    ds = read_table(f"{sf_dir}/events.parquet",
                    columns=["event_id", "user_id", "ts", "event_type", "value"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        u = g["user_id"].to_numpy(dtype=np.int64)
        et = g["event_type"].to_numpy()
        val = g["value"].to_numpy(dtype=np.float64)
        n = len(g)
        pos = np.arange(n, dtype=np.int64)
        click_pos = np.where(et == "click", pos, np.int64(-1))
        last_incl = np.maximum.accumulate(click_pos)
        prev = np.empty(n, dtype=np.int64)
        prev[0] = -1
        prev[1:] = last_incl[:-1]
        starts = _segment_starts(u)
        seg_first = pos[starts]
        seg_of_row = np.repeat(seg_first, np.diff(
            np.append(seg_first, n)))
        prev[prev < seg_of_row] = -1
        keep = et == "purchase"
        pk = prev[keep]
        out_val = np.where(pk >= 0, val[np.maximum(pk, 0)], np.nan)
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy()[keep],
            "user_id": u[keep],
            "prev_click_value": out_val,
        })

    return _user_bucketed(ds).map_groups(
        per_bucket, batch_format="pandas").sort("event_id")


def clicks_before_purchase(sf_dir: str, window_minutes: int = 60) -> rd.Dataset:
    """Range join within the events stream: for each 'purchase', the
    number of the same user's 'click' events in the half-open window
    (ts - window, ts].

    One coarse user-bucket shuffle; inside a bucket the range probe is
    vectorized across ALL users at once: timestamps densify to ranks
    against the bucket's unique-ts axis, (user, rank) collapse to one
    monotone int64 composite key, and the per-purchase count is two
    ``searchsorted`` calls into the bucket's sorted click-key array —
    no per-user loop. Output: (event_id, user_id, n_clicks)."""
    ds = read_table(f"{sf_dir}/events.parquet",
                    columns=["event_id", "user_id", "ts", "event_type"])
    win = np.timedelta64(window_minutes, "m")

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ts = g["ts"].to_numpy(dtype="datetime64[ns]")
        uidx, _ = pd.factorize(g["user_id"].to_numpy(dtype=np.int64))
        uidx = uidx.astype(np.int64)
        axis = np.unique(ts)
        stride = np.int64(len(axis) + 1)
        is_click = (g["event_type"].to_numpy() == "click")
        ckeys = np.sort(uidx[is_click] * stride
                        + np.searchsorted(axis, ts[is_click]))
        keep = g["event_type"].to_numpy() == "purchase"
        pu = uidx[keep] * stride
        # clicks with ts <= t have rank < searchsorted(axis, t, 'right')
        hi = np.searchsorted(ckeys, pu + np.searchsorted(
            axis, ts[keep], side="right"))
        lo = np.searchsorted(ckeys, pu + np.searchsorted(
            axis, ts[keep] - win, side="right"))
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy()[keep],
            "user_id": g["user_id"].to_numpy(dtype=np.int64)[keep],
            "n_clicks": (hi - lo).astype(np.int64),
        })

    return _user_bucketed(ds).map_groups(
        per_bucket, batch_format="pandas").sort("event_id")


# pivot requires a DECLARED value domain on a distributed engine (the
# Spark rule: pivot without values = an extra distinct pass); the synth
# events table has exactly these five types.
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def events_pivot(sf_dir: str,
                 event_types: tuple[str, ...] = EVENT_TYPES) -> rd.Dataset:
    """PIVOT: one row per user with one count column per event type
    (n_click, n_error, ...). Each batch lowers the pivot to vectorized
    indicator columns (one comparison per declared type), then the
    two-phase hash aggregate sums them per user — shuffle volume is one
    row per (batch, user), never the raw events. Output: (user_id,
    n_<type>...)."""
    from ..stages.hashagg import hash_groupby_agg

    ds = read_table(f"{sf_dir}/events.parquet",
                    columns=["user_id", "event_type"])

    def indicators(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type").to_pandas()
        cols = {"user_id": batch.column("user_id")}
        for t in event_types:
            cols[f"n_{t}"] = pa.array(
                (et == t).to_numpy().astype(np.int64), pa.int64())
        return pa.Table.from_pydict(cols)

    agg = hash_groupby_agg(
        ds.map_batches(indicators, batch_format="pyarrow"),
        ["user_id"],
        {f"n_{t}": (f"n_{t}", "sum") for t in event_types},
        num_parts=16)

    def final(df: pa.Table) -> pa.Table:
        pdf = df.to_pandas()
        out = {"user_id": pdf["user_id"].astype(np.int64)}
        for t in event_types:
            out[f"n_{t}"] = pdf[f"n_{t}"].astype(np.int64)
        return pa.Table.from_pydict(out)

    return agg.map_batches(final, batch_format="pyarrow").sort("user_id")


def user_event_windows(sf_dir: str) -> rd.Dataset:
    """Per-row window FRAME aggregates over the event stream — the
    lag / running-total / moving-average family (SQL ``OVER (PARTITION
    BY user_id ORDER BY ts, event_id ROWS ...)``), which Ray Data has
    no primitive for. Partitioned by user (one groupby shuffle); inside
    a group everything is a vectorized ordered scan: ``shift`` for lag,
    ``cumsum`` for the running frame, a rolling sum for the 3-row
    moving average.

    Float policy: running/moving sums are computed on CENTS (int64,
    ``round(value*100)``) so the result is exact under ANY summation
    order — a windowed double sum would expose the fp-association
    difference between this scan and DuckDB's segment-tree window
    aggregator.

    One coarse user-bucket shuffle; inside a bucket every frame is a
    vectorized scan over the (user, ts, event_id)-sorted rows with
    per-user resets as boundary masks: lag masks the first row of each
    segment, the running sum subtracts each segment's prefix base, and
    the 3-row window is two shifted adds gated on position-in-segment.
    Output: (event_id, user_id, prev_value, cum_value_cents,
    movavg3_value).
    """
    ds = read_table(f"{sf_dir}/events.parquet",
                    columns=["event_id", "user_id", "ts", "value"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        u = g["user_id"].to_numpy(dtype=np.int64)
        val = g["value"].to_numpy(dtype=np.float64)
        cents = np.asarray(
            round_half_up(val * 100.0, 0)).astype(np.int64)
        n = len(g)
        starts = _segment_starts(u)
        idx = np.flatnonzero(starts)
        seg_first = np.repeat(idx, np.diff(np.append(idx, n)))
        pos_in_seg = np.arange(n, dtype=np.int64) - seg_first

        prev = np.empty(n, dtype=np.float64)
        prev[0] = np.nan
        prev[1:] = val[:-1]
        prev[starts] = np.nan

        csum = np.cumsum(cents)
        base = np.where(seg_first > 0, csum[seg_first - 1], 0)
        cum = csum - base

        msum = cents.astype(np.int64).copy()
        m1 = np.zeros(n, dtype=np.int64)
        m1[1:] = cents[:-1]
        m2 = np.zeros(n, dtype=np.int64)
        m2[2:] = cents[:-2]
        msum += np.where(pos_in_seg >= 1, m1, 0)
        msum += np.where(pos_in_seg >= 2, m2, 0)
        frame_n = np.minimum(pos_in_seg + 1, 3)

        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(),
                "user_id": u,
                "prev_value": prev,
                "cum_value_cents": cum,
                "movavg3_value": round_half_up(
                    msum / (100.0 * frame_n), 2),
            }
        )

    return _user_bucketed(ds).map_groups(
        per_bucket, batch_format="pandas").sort("event_id")


def events_sliding(sf_dir: str, window_hours: int = 2,
                   step_hours: int = 1) -> rd.Dataset:
    """Sliding (hopping) event-time windows per event_type: every event
    contributes to the ``window_hours / step_hours`` windows covering
    it. Expressed as a vectorized window-explode (one row per (event,
    covering window)) + partial aggregation + the usual derived-key
    groupby — the streaming-window shape on a batch engine. Output:
    (event_type, window_start, n_events, sum_value)."""
    assert window_hours % step_hours == 0
    n_win = window_hours // step_hours
    ds = read_table(f"{sf_dir}/events.parquet",
                    columns=["event_type", "ts", "value"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        base = df["ts"].dt.floor(f"{step_hours}h")
        parts = []
        for i in range(n_win):
            p = pd.DataFrame({
                "event_type": df["event_type"],
                "window_start": base - pd.Timedelta(hours=i * step_hours),
                "value": df["value"],
            })
            parts.append(p)
        ex = pd.concat(parts, ignore_index=True)
        g = ex.groupby(["event_type", "window_start"], as_index=False).agg(
            n_events=("value", "size"), sum_value=("value", "sum"))
        return table_from_pandas(g, preserve_index=False)

    agg = ds.map_batches(partial, batch_format="pyarrow").repartition(
        4).groupby(["event_type", "window_start"]).aggregate(
        Sum("n_events", alias_name="n_events"),
        Sum("sum_value", alias_name="sum_value"))

    def final(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["n_events"] = df["n_events"].astype(np.int64)
        df["sum_value"] = round_half_up(df["sum_value"], 2)
        return table_from_pandas(df, preserve_index=False)

    return agg.map_batches(final, batch_format="pyarrow")


def event_props_k_stats(sf_dir: str) -> rd.Dataset:
    """Semi-structured (JSON) column processing: extract the integer
    ``k`` property from each event's JSON ``props`` payload and
    aggregate per event type. Extraction is one Arrow RE2
    ``extract_regex`` kernel per batch (for a flat int property the
    regex is exactly the JSON grammar; nested payloads would swap in a
    real JSON parser behind the same stage); aggregation is the usual
    partial-sums + tiny groupby. DuckDB's JSON operator (`->>`) is the
    oracle, so the kernels are proven equivalent to a JSON reader on
    this shape. Output: (event_type, n_events, sum_k, avg_k)."""
    import pyarrow.compute as pc

    ds = read_table(f"{sf_dir}/events.parquet",
                    columns=["event_type", "props"])

    def partial(batch: pa.Table) -> pa.Table:
        ks = pc.struct_field(
            pc.extract_regex(batch.column("props"),
                             r'"k": (?P<k>[0-9]+)'), "k")
        df = pd.DataFrame({
            "event_type": batch.column("event_type").to_pandas(),
            "k": pc.cast(ks, pa.int64()).to_numpy(zero_copy_only=False),
        })
        g = df.groupby("event_type", as_index=False).agg(
            n_events=("k", "size"), sum_k=("k", "sum"))
        return table_from_pandas(g, preserve_index=False)

    agg = ds.map_batches(partial, batch_format="pyarrow").repartition(
        4).groupby("event_type").aggregate(
        Sum("n_events", alias_name="n_events"),
        Sum("sum_k", alias_name="sum_k"))

    def final(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["n_events"] = df["n_events"].astype(np.int64)
        df["sum_k"] = df["sum_k"].astype(np.int64)
        df["avg_k"] = round_half_up(df["sum_k"] / df["n_events"], 2)
        return table_from_pandas(
            df[["event_type", "n_events", "sum_k", "avg_k"]],
            preserve_index=False)

    return agg.map_batches(final, batch_format="pyarrow").sort("event_type")


def funnel_counts(sf_dir: str,
                  stages: tuple[str, str, str] = ("view", "click",
                                                  "purchase"),
                  broadcast_threshold: int = 1_000_000) -> "pa.Table":
    """Ordered event-sequence funnel: how many users performed stage 1,
    then stage 2 STRICTLY AFTER their first stage-1 event, then stage 3
    strictly after that first qualifying stage-2 event. The canonical
    product-analytics funnel, expressed as three chained user-keyed
    min reduces — each stage's frontier is per-user min(ts) under a
    predicate that references the previous frontier. Size dispatch per
    step: below the broadcast threshold the previous frontier ships
    once as sorted (user, ts) arrays probed per batch (each step is
    then ONE narrow user-cardinality exchange); above it the frontier
    attaches via a partitioned user join (users are fact-cardinality
    at web scale). All comparisons are on exact int64 timestamps.
    Output: one row (n_stage1, n_stage2, n_stage3).

    Reference analogue: the staged presence counts of
    evaluate_new_testdata.py:137-163 with an ordering constraint."""
    import ray

    from ..sources.storage import parquet_num_rows
    from ..stages.hashagg import hash_groupby_agg
    from ..stages.join import partitioned_join

    small = (parquet_num_rows(f"{sf_dir}/events.parquet")
             <= broadcast_threshold)

    def _events() -> rd.Dataset:
        from ..sources.storage import rows_to_blocks
        path = f"{sf_dir}/events.parquet"
        return read_table(path, columns=["user_id", "event_type", "ts"],
                          num_blocks=rows_to_blocks(path))

    def _stage_min(stage: str) -> rd.Dataset:
        def partial(df: pd.DataFrame) -> pd.DataFrame:
            df = df[df["event_type"] == stage]
            return df.groupby("user_id", as_index=False).agg(
                t=("ts", "min"))

        return hash_groupby_agg(
            _events().map_batches(partial, batch_format="pandas"),
            ["user_id"], {"t": ("t", "min")}, num_parts=16)

    def _next_frontier(prev: rd.Dataset, stage: str) -> rd.Dataset:
        """min ts of `stage` events strictly after the user's previous
        frontier."""
        if small:
            # frontier is user-cardinality and under the threshold:
            # ship it once, probe each batch, reduce the partial mins
            pf = prev.to_pandas()
            uk = pf["user_id"].to_numpy(dtype=np.int64)
            ts = pf["t"].to_numpy(dtype="datetime64[ns]").view(np.int64)
            o = np.argsort(uk)
            front_ref = ray.put((uk[o], ts[o]))

            def probe(df: pd.DataFrame) -> pd.DataFrame:
                uks, tss = ray.get(front_ref)
                df = df[df["event_type"] == stage]
                u = df["user_id"].to_numpy(dtype=np.int64)
                pos = np.searchsorted(uks, u)
                pos[pos >= len(uks)] = len(uks) - 1 if len(uks) else 0
                hit = (uks[pos] == u) if len(uks) else np.zeros(
                    len(u), bool)
                ev_ts = df["ts"].to_numpy(
                    dtype="datetime64[ns]").view(np.int64)
                after = np.zeros(len(u), dtype=bool)
                after[hit] = ev_ts[hit] > tss[pos[hit]]
                return (df[after].groupby("user_id", as_index=False)
                        .agg(t=("ts", "min")))

            return hash_groupby_agg(
                _events().map_batches(probe, batch_format="pandas"),
                ["user_id"], {"t": ("t", "min")}, num_parts=16)

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            # the frontier cut is per user, so candidates stay raw
            # (the join-side filter applies the cut)
            df = df[df["event_type"] == stage]
            return df[["user_id", "ts"]]

        cand = _events().map_batches(partial, batch_format="pandas")

        def merge(cf: pd.DataFrame, pf: pd.DataFrame) -> pd.DataFrame:
            m = cf.merge(pf, on="user_id", how="inner")
            m = m[m["ts"] > m["t"]]
            return m.groupby("user_id", as_index=False).agg(
                t=("ts", "min"))

        return partitioned_join(
            cand, prev, "user_id", "user_id", merge, num_buckets=16,
            left_schema=pa.schema([("user_id", pa.int64()),
                                   ("ts", pa.timestamp("us"))]),
            right_schema=pa.schema([("user_id", pa.int64()),
                                    ("t", pa.timestamp("us"))]))

    # every frontier materializes once (REDUCED, user-cardinality), so
    # each count() is a metadata read — no extra execution per stage
    f1 = _stage_min(stages[0]).materialize()
    f2 = _next_frontier(f1, stages[1]).materialize()
    f3 = _next_frontier(f2, stages[2]).materialize()

    return pa.Table.from_pydict({
        "n_stage1": pa.array([f1.count()], pa.int64()),
        "n_stage2": pa.array([f2.count()], pa.int64()),
        "n_stage3": pa.array([f3.count()], pa.int64())})


def retention_cohorts(sf_dir: str,
                      broadcast_threshold: int = 1_000_000
                      ) -> rd.Dataset:
    """Cohort retention matrix: users grouped by the epoch-week of
    their FIRST event; for each (cohort_week, week_offset), how many
    of that cohort's users were active offset weeks later — the
    standard product-analytics retention triangle. Weeks are integer
    epoch-seconds // 604800 (timezone-free, exact).

    Plan: the distinct (user, week) activity pairs reduce through the
    two-phase hash aggregate (one row per pair per batch), the
    per-user first week reduces from those SAME pairs (a second narrow
    exchange over pair-cardinality, not raw events), and the cohort
    tag attaches by size dispatch — broadcast sorted arrays below the
    threshold, a partitioned user join above. The final (cohort,
    offset) aggregate is triangle-sized. Output: (cohort_week,
    week_offset, n_users) sorted."""
    import ray

    from ..sources.storage import parquet_num_rows, rows_to_blocks
    from ..stages.hashagg import hash_groupby_agg
    from ..stages.join import partitioned_join

    path = f"{sf_dir}/events.parquet"
    ds = read_table(path, columns=["user_id", "ts"],
                    num_blocks=rows_to_blocks(path))
    wk_div = np.int64(604_800) * np.int64(1_000_000_000)

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        wk = (df["ts"].to_numpy(dtype="datetime64[ns]").view(np.int64)
              // wk_div)
        return (pd.DataFrame({"user_id": df["user_id"].to_numpy(
            dtype=np.int64), "wk": wk}).drop_duplicates())

    act = hash_groupby_agg(
        ds.map_batches(pair_partial, batch_format="pandas"),
        ["user_id", "wk"], {"_n": ("wk", "count")},
        num_parts=16).materialize()

    fst = hash_groupby_agg(act, ["user_id"],
                           {"cohort_wk": ("wk", "min")}, num_parts=16)

    if parquet_num_rows(path) <= broadcast_threshold:
        fdf = fst.to_pandas()
        uk = fdf["user_id"].to_numpy(dtype=np.int64)
        cw = fdf["cohort_wk"].to_numpy(dtype=np.int64)
        o = np.argsort(uk)
        ref = ray.put((uk[o], cw[o]))

        def attach(df: pd.DataFrame) -> pd.DataFrame:
            uks, cws = ray.get(ref)
            u = df["user_id"].to_numpy(dtype=np.int64)
            pos = np.searchsorted(uks, u)
            out = pd.DataFrame({
                "cohort_week": cws[pos],
                "week_offset": df["wk"].to_numpy(dtype=np.int64)
                - cws[pos]})
            return out.groupby(["cohort_week", "week_offset"],
                               as_index=False).agg(
                n_users=("cohort_week", "size"))

        part = act.map_batches(attach, batch_format="pandas")
    else:
        def merge(af: pd.DataFrame, ff: pd.DataFrame) -> pd.DataFrame:
            m = af.merge(ff, on="user_id", how="inner")
            m["cohort_week"] = m["cohort_wk"].astype(np.int64)
            m["week_offset"] = (m["wk"] - m["cohort_wk"]).astype(np.int64)
            return m.groupby(["cohort_week", "week_offset"],
                             as_index=False).agg(
                n_users=("cohort_week", "size"))

        part = partitioned_join(
            act, fst, "user_id", "user_id", merge, num_buckets=16,
            left_schema=pa.schema([("user_id", pa.int64()),
                                   ("wk", pa.int64()),
                                   ("_n", pa.int64())]),
            right_schema=pa.schema([("user_id", pa.int64()),
                                    ("cohort_wk", pa.int64())]))

    agg = hash_groupby_agg(part, ["cohort_week", "week_offset"],
                           {"n_users": ("n_users", "sum")}, num_parts=4)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        for c in ("cohort_week", "week_offset", "n_users"):
            df[c] = df[c].astype(np.int64)
        return df[["cohort_week", "week_offset", "n_users"]]

    return (agg.map_batches(final, batch_format="pandas")
            .sort(["cohort_week", "week_offset"]))


def rolling_active_users(sf_dir: str, window_days: int = 7
                         ) -> rd.Dataset:
    """Sliding-window DISTINCT count: for every active day, how many
    distinct users were active in the trailing ``window_days`` window
    — rolling 7-day actives, the standard engagement metric. Distinct
    is not windowable by subtraction, so the engine lowers it to the
    window-explode pattern over the DEDUPED (user, day) pairs: each
    pair replicates to the <= window_days window-days it contributes
    to (pair-cardinality x window, never raw events), dedups again on
    (window_day, user) — replication cannot create duplicates, but
    the reduce bounds the exchange — and a per-day count finishes.
    Output: (day, n_users) for days with activity, sorted.

    Day identity is integer epoch-days (timezone-free, exact)."""
    from ..sources.storage import rows_to_blocks
    from ..stages.hashagg import hash_groupby_agg

    path = f"{sf_dir}/events.parquet"
    ds = read_table(path, columns=["user_id", "ts"],
                    num_blocks=rows_to_blocks(path))
    day_div = np.int64(86_400) * np.int64(1_000_000_000)

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        d = (df["ts"].to_numpy(dtype="datetime64[ns]").view(np.int64)
             // day_div)
        return (pd.DataFrame({"user_id": df["user_id"].to_numpy(
            dtype=np.int64), "d": d}).drop_duplicates())

    act = hash_groupby_agg(
        ds.map_batches(pair_partial, batch_format="pandas"),
        ["user_id", "d"], {"_n": ("d", "count")},
        num_parts=16).materialize()

    # the set of ACTIVE days (output domain) — day-cardinality
    active_days = np.unique(act.map_batches(
        lambda df: df[["d"]].drop_duplicates(), batch_format="pandas")
        .to_pandas()["d"].to_numpy(dtype=np.int64))
    import ray
    days_ref = ray.put(active_days)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        days = ray.get(days_ref)
        u = df["user_id"].to_numpy(dtype=np.int64)
        d = df["d"].to_numpy(dtype=np.int64)
        # replicate each pair to the ACTIVE days within [d, d+window)
        lo = np.searchsorted(days, d, side="left")
        hi = np.searchsorted(days, d + window_days, side="left")
        reps = (hi - lo).astype(np.int64)
        ui = np.repeat(u, reps)
        # window-day index per replica: days[lo_i + k], offsets built
        # vectorized (arange minus repeated segment starts)
        total = int(reps.sum())
        starts = np.concatenate([[0], np.cumsum(reps)[:-1]])
        offs = np.arange(total) - np.repeat(starts, reps)
        wd = days[np.repeat(lo, reps) + offs]
        return (pd.DataFrame({"day": wd, "user_id": ui})
                .drop_duplicates())

    pairs2 = hash_groupby_agg(
        act.map_batches(explode, batch_format="pandas"),
        ["day", "user_id"], {"_n": ("user_id", "count")}, num_parts=16)

    counts = hash_groupby_agg(pairs2, ["day"],
                              {"n_users": ("user_id", "count")},
                              num_parts=4)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df["day"] = df["day"].astype(np.int64)
        df["n_users"] = df["n_users"].astype(np.int64)
        return df[["day", "n_users"]]

    return (counts.map_batches(final, batch_format="pandas")
            .sort("day"))


def session_conversion(sf_dir: str, gap_minutes: int = 30
                       ) -> "pa.Table":
    """Sessionized conversion rate: of all gap-delimited sessions (a
    new session starts when a user's inter-event gap exceeds
    ``gap_minutes``), what fraction contains a purchase — the
    sessionization pattern (user_sessions) extended with per-session
    flags. Users co-locate through ONE coarse-bucket shuffle (hash
    (user) % 16 — Ray's native per-key groupby dispatch is
    pathologically slow at user cardinality, CLAUDE.md footgun); each
    bucket runs a single vectorized ordered scan over ALL its users at
    once (session breaks = gap OR user change) and emits two ints.
    Output: one row (n_sessions, n_converted, conversion_pct)."""
    from ..sources.storage import rows_to_blocks
    from ..stages.hashagg import _stable_partition

    path = f"{sf_dir}/events.parquet"
    ds = read_table(path,
                    columns=["user_id", "ts", "event_id", "event_type"],
                    num_blocks=rows_to_blocks(path))
    gap_ns = np.int64(gap_minutes) * np.int64(60_000_000_000)

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_ubucket"] = _stable_partition(df, ["user_id"], 16)
        return df

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        u = g["user_id"].to_numpy(dtype=np.int64)
        ts = g["ts"].to_numpy(dtype="datetime64[ns]").view(np.int64)
        new_s = np.ones(len(g), dtype=np.int64)
        new_s[1:] = ((u[1:] != u[:-1])
                     | (ts[1:] - ts[:-1] > gap_ns)).astype(np.int64)
        sid = np.cumsum(new_s)
        conv = (g["event_type"].to_numpy() == "purchase")
        per = pd.DataFrame({"sid": sid, "conv": conv}).groupby(
            "sid")["conv"].any()
        return pd.DataFrame({
            "n_sessions": np.array([len(per)], dtype=np.int64),
            "n_converted": np.array([int(per.sum())], dtype=np.int64)})

    part = (ds.map_batches(tag, batch_format="pandas")
            .groupby("_ubucket")
            .map_groups(per_bucket, batch_format="pandas").to_pandas())
    n_sessions = int(part["n_sessions"].sum())
    n_conv = int(part["n_converted"].sum())
    pct = 100.0 * n_conv / n_sessions if n_sessions else 0.0
    return pa.Table.from_pydict({
        "n_sessions": pa.array([n_sessions], pa.int64()),
        "n_converted": pa.array([n_conv], pa.int64()),
        "conversion_pct": pa.array(round_half_up([pct], 4),
                                   pa.float64())})


def event_transition_probs(sf_dir: str) -> rd.Dataset:
    """First-order Markov transition matrix over the event stream:
    P(next event_type | current event_type) per user, ordering ties
    broken by event_id — the distributed form of
    ``lead(event_type) OVER (PARTITION BY user_id ORDER BY ts,
    event_id)`` followed by a grouped normalize.

    Plan (one exchange): events are tagged with a coarse 16-way user
    bucket so the per-group scan sees ALL of a user's events at once
    (same trick as session_conversion) but the shuffle moves only 16
    groups; inside a bucket one vectorized ordered scan pairs each
    event with its successor (masked at user boundaries) and emits the
    bucket's (from_type, to_type) counts — at most k*k rows for k
    event types. The global combine and row-normalize then run on a
    single tiny block. Output: (from_type, to_type, n, prob) with
    prob = n / sum(n) over from_type.
    """
    from ..sources.storage import rows_to_blocks
    from ..stages.hashagg import _stable_partition

    path = f"{sf_dir}/events.parquet"
    ds = read_table(path,
                    columns=["user_id", "ts", "event_id", "event_type"],
                    num_blocks=rows_to_blocks(path))

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_ubucket"] = _stable_partition(df, ["user_id"], 16)
        return df

    def pair_counts(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        u = g["user_id"].to_numpy(dtype=np.int64)
        et = g["event_type"].to_numpy()
        same_user = u[1:] == u[:-1]
        pairs = pd.DataFrame({"from_type": et[:-1][same_user],
                              "to_type": et[1:][same_user]})
        out = pairs.groupby(["from_type", "to_type"], as_index=False).size()
        return out.rename(columns={"size": "n"})

    part = (ds.map_batches(tag, batch_format="pandas")
            .groupby("_ubucket")
            .map_groups(pair_counts, batch_format="pandas")
            .repartition(1))

    def normalize(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["from_type", "to_type"], as_index=False)["n"].sum()
        g["n"] = g["n"].astype(np.int64)
        tot = g.groupby("from_type")["n"].transform("sum")
        g["prob"] = round_half_up(g["n"] / tot, 6)
        return g.sort_values(["from_type", "to_type"]).reset_index(drop=True)

    return part.map_batches(normalize, batch_format="pandas")


def _merge_intervals(df: pd.DataFrame) -> pd.DataFrame:
    """Union of [s, e] intervals within one block (gaps-and-islands):
    sorted by (s, e), an interval opens a new island iff its start
    strictly exceeds the running max end (touching endpoints merge).
    Vectorized sweep; associative — re-running on the concatenated
    per-block islands yields the exact global union."""
    d = df.sort_values(["s", "e"], kind="mergesort")
    s = d["s"].to_numpy(dtype=np.int64)
    e = d["e"].to_numpy(dtype=np.int64)
    prev_max = np.concatenate(
        [[np.iinfo(np.int64).min], np.maximum.accumulate(e)[:-1]])
    iid = np.cumsum((s > prev_max).astype(np.int64))
    g = pd.DataFrame({"iid": iid, "s": s, "e": e}).groupby(
        "iid", as_index=False).agg(s=("s", "min"), e=("e", "max"))
    return g[["s", "e"]]


def session_time_coverage(sf_dir: str, gap_minutes: int = 30
                          ) -> "pa.Table":
    """Global union of session time (gaps-and-islands across ALL
    users): how much wall-clock the platform had at least one live
    session, in how many contiguous islands — the coverage/uptime
    shape (interval union after sessionization).

    Plan: sessions co-locate per user through the ONE coarse-bucket
    exchange (session_conversion pattern) and reduce to one (start,
    end) row each; the interval table is session-cardinality, far
    smaller than the event stream. Ray's range sort then partitions it
    by start time, each block collapses to its local islands (the
    merge is associative), and one final tiny re-merge emits the exact
    global union. Output: one row (n_sessions, n_islands,
    covered_minutes)."""
    from ..sources.storage import rows_to_blocks
    from ..stages.hashagg import _stable_partition

    path = f"{sf_dir}/events.parquet"
    ds = read_table(path, columns=["user_id", "ts"],
                    num_blocks=rows_to_blocks(path))
    gap_ns = np.int64(gap_minutes) * np.int64(60_000_000_000)

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_ubucket"] = _stable_partition(df, ["user_id"], 16)
        return df

    def intervals(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"])
        u = g["user_id"].to_numpy(dtype=np.int64)
        ts = g["ts"].to_numpy(dtype="datetime64[ns]").view(np.int64)
        new_s = np.ones(len(g), dtype=np.int64)
        new_s[1:] = ((u[1:] != u[:-1])
                     | (ts[1:] - ts[:-1] > gap_ns)).astype(np.int64)
        sid = np.cumsum(new_s)
        per = pd.DataFrame({"sid": sid, "ts": ts}).groupby(
            "sid", as_index=False).agg(s=("ts", "min"), e=("ts", "max"))
        return per[["s", "e"]]

    iv = (ds.map_batches(tag, batch_format="pandas")
          .groupby("_ubucket")
          .map_groups(intervals, batch_format="pandas")
          .materialize())
    n_sessions = iv.count()

    merged = (iv.sort("s")
              .map_batches(_merge_intervals, batch_format="pandas")
              .repartition(1)
              .map_batches(_merge_intervals, batch_format="pandas")
              .to_pandas())
    covered_ns = (merged["e"].to_numpy(dtype=np.int64)
                  - merged["s"].to_numpy(dtype=np.int64)).sum()
    return pa.Table.from_pydict({
        "n_sessions": pa.array([int(n_sessions)], pa.int64()),
        "n_islands": pa.array([len(merged)], pa.int64()),
        "covered_minutes": pa.array(
            round_half_up([covered_ns / 60e9], 4), pa.float64())})


def event_rate_anomalies(sf_dir: str, trail: int = 24,
                         factor: int = 2) -> rd.Dataset:
    """Trailing-window rate-spike detection over the event stream: for
    each (event_type, hour) bucket, compare the hourly event count to
    the mean of the previous ``trail`` present hourly counts (SQL
    ``ROWS BETWEEN trail PRECEDING AND 1 PRECEDING``) and flag hours
    running above ``factor`` x that mean — the streaming
    anomaly-detection shape lowered to batch.

    Scale plan: the heavy distributed step is the two-phase hourly
    count reduce (shuffle volume one row per (block, type, hour), never
    raw events); the reduced series is calendar-bounded (hours x
    event types — ~44k rows PER YEAR at any corpus size), so the
    windowed scan collapses it to one block and runs a single
    vectorized clipped-prefix-sum pass over all types at once. The
    spike gate is ALL-INTEGER (n * trail_n > factor * trail_sum) — no
    float threshold to disagree with the oracle at the boundary; the
    reported trail_mean is display-rounded only. Rows without history
    (each type's first hour) are dropped, mirroring the oracle's
    ``trail_n > 0`` filter. Output: (event_type, hour, n_events,
    trail_mean, is_spike) sorted by (event_type, hour)."""
    from ..stages.hashagg import hash_groupby_agg

    ds = read_table(f"{sf_dir}/events.parquet", columns=["event_type", "ts"])

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["hour"] = df["ts"].dt.floor("h")
        g = df.groupby(["event_type", "hour"], as_index=False).agg(
            n_events=("ts", "size"))
        return table_from_pandas(g, preserve_index=False)

    hourly = hash_groupby_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "hour"], {"n_events": ("n_events", "sum")},
        num_parts=16)

    def windowed(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["event_type", "hour"]).reset_index(drop=True)
        n = df["n_events"].to_numpy(dtype=np.int64)
        et = df["event_type"].to_numpy()
        starts = _segment_starts(et)
        idx = np.flatnonzero(starts)
        seg_first = np.repeat(idx, np.diff(np.append(idx, len(df))))
        pos = np.arange(len(df), dtype=np.int64)
        lo = np.maximum(seg_first, pos - trail)
        prefix = np.concatenate(([0], np.cumsum(n)))
        trail_sum = prefix[pos] - prefix[lo]
        trail_n = pos - lo
        keep = trail_n > 0
        mean = trail_sum[keep] / trail_n[keep]
        return pd.DataFrame({
            "event_type": et[keep],
            "hour": df["hour"].to_numpy()[keep],
            "n_events": n[keep],
            "trail_mean": np.asarray(round_half_up(mean, 4)),
            "is_spike": (n[keep] * trail_n[keep]
                         > factor * trail_sum[keep]),
        })

    return hourly.repartition(1).map_batches(
        windowed, batch_format="pandas")


def approx_distinct_users_by_type(sf_dir: str) -> rd.Dataset:
    """Approximate distinct users per event_type via GROUPED mergeable
    HyperLogLog sketches — the sketch-inside-a-groupby pattern: each
    batch folds one 4 KiB register array per event_type it sees, the
    exchange then moves only (groups x blocks) sketch rows instead of
    every (event_type, user) pair, and per-group register-max merges
    finish the estimate. The exact variant
    (relational.distinct_users_per_event_type) shuffles the full
    distinct-pair table; at 100 TB the sketch exchange is smaller by
    the ratio corpus-pairs : 4 KiB x groups x blocks and is the only
    plan that stays narrow for billion-user cardinalities (~1.6%
    standard error at p=12; accuracy pytest vs exact). Output:
    (event_type, approx_distinct) sorted."""
    from ..functions.sketch import (
        hll_add_hashes,
        hll_create,
        hll_estimate,
        hll_merge,
    )
    from ..functions.textstats import _splitmix64

    ds = read_table(f"{sf_dir}/events.parquet",
                    columns=["event_type", "user_id"])

    def sketch_batch(df: pd.DataFrame) -> pd.DataFrame:
        rows_t, rows_s = [], []
        for et, g in df.groupby("event_type", sort=False):
            h = _splitmix64(g["user_id"].to_numpy(np.int64).view(np.uint64))
            regs = hll_create()
            hll_add_hashes(regs, h)
            rows_t.append(et)
            rows_s.append(regs.tobytes())
        return pd.DataFrame({"event_type": rows_t, "sketch": rows_s})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        regs = hll_create()
        for blob in g["sketch"]:
            regs = hll_merge(regs, np.frombuffer(blob, dtype=np.uint8))
        return pd.DataFrame({
            "event_type": [g["event_type"].iloc[0]],
            "approx_distinct": np.array([round(hll_estimate(regs))],
                                        dtype=np.int64)})

    return (ds.map_batches(sketch_batch, batch_format="pandas")
            .repartition(2).groupby("event_type")
            .map_groups(merge, batch_format="pandas")
            .repartition(1).sort("event_type"))


def inter_event_gap_stats(sf_dir: str) -> rd.Dataset:
    """Global distribution of per-user inter-event gaps — the
    event-stream cadence audit (bot bursts show as a collapsed median;
    abandoned accounts stretch the tail). Gap = seconds between a
    user's consecutive events in (ts, event_id) order.

    Plan: ONE coarse user-bucket exchange; inside each bucket the gaps
    of ALL users fall out of one sorted diff with a segment-boundary
    mask (no per-user loop); gaps then reduce to an integer-seconds
    VALUE HISTOGRAM (distinct-gap cardinality, not corpus cardinality)
    from which exact quantile_disc ranks select the median/p95 on the
    driver — the bounded-domain trick of quantity_deciles_by_flag.
    Output: one row (n_gaps, median_gap_s, p95_gap_s)."""
    from ..stages.hashagg import hash_groupby_agg

    ds = read_table(f"{sf_dir}/events.parquet",
                    columns=["user_id", "ts", "event_id"])

    def gap_hist(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort")
        u = g["user_id"].to_numpy(dtype=np.int64)
        ts = g["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        if len(g) < 2:
            return pd.DataFrame({"sec": pd.Series(dtype=np.int64),
                                 "c": pd.Series(dtype=np.int64)})
        gaps = (ts[1:] - ts[:-1]) // 1_000_000   # floor to seconds
        same_user = u[1:] == u[:-1]
        sec, c = np.unique(gaps[same_user], return_counts=True)
        return pd.DataFrame({"sec": sec.astype(np.int64),
                             "c": c.astype(np.int64)})

    hist = hash_groupby_agg(
        _user_bucketed(ds).map_groups(gap_hist, batch_format="pandas"),
        ["sec"], {"c": ("c", "sum")}, num_parts=4)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("sec")
        c = df["c"].to_numpy(dtype=np.int64)
        sec = df["sec"].to_numpy(dtype=np.int64)
        n = int(c.sum())
        cum = np.cumsum(c)

        def qdisc(q: float) -> int:
            rank = int(np.ceil(q * n))
            return int(sec[int(np.searchsorted(cum, rank))])

        return pd.DataFrame({
            "n_gaps": np.array([n], dtype=np.int64),
            "median_gap_s": np.array([qdisc(0.5)], dtype=np.int64),
            "p95_gap_s": np.array([qdisc(0.95)], dtype=np.int64)})

    return hist.repartition(1).map_batches(final, batch_format="pandas")


def interarrival_exp_fit(sf_dir: str) -> rd.Dataset:
    """Exponential fit of the per-user inter-event gap distribution
    plus a Kolmogorov-Smirnov goodness-of-fit statistic — the Poisson-
    process health check a streaming platform runs on arrival cadence
    (human traffic is over-dispersed vs exponential; bot bursts are
    under-dispersed; a KS jump flags either). MLE lambda = 1/mean gap;
    D = sup_x |ECDF(x) - (1 - e^(-x/mean))| evaluated exactly at every
    distinct gap value from BOTH ECDF sides.

    Plan: identical ONE user-bucket exchange + integer-seconds gap
    VALUE HISTOGRAM as :func:`inter_event_gap_stats` (domain-bounded,
    never corpus-bounded); mean, lambda and the exact KS sup all fold
    from the histogram on one block. Float ops mirror the SQL oracle
    operand-for-operand (sec/mean inside exp) so the 6-dp rounding is
    bit-stable. Output: one row (n_gaps, mean_gap_s, lambda_hat,
    ks_stat)."""
    from ..stages.hashagg import hash_groupby_agg

    ds = read_table(f"{sf_dir}/events.parquet",
                    columns=["user_id", "ts", "event_id"])

    def gap_hist(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort")
        u = g["user_id"].to_numpy(dtype=np.int64)
        ts = g["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        if len(g) < 2:
            return pd.DataFrame({"sec": pd.Series(dtype=np.int64),
                                 "c": pd.Series(dtype=np.int64)})
        gaps = (ts[1:] - ts[:-1]) // 1_000_000
        same_user = u[1:] == u[:-1]
        sec, c = np.unique(gaps[same_user], return_counts=True)
        return pd.DataFrame({"sec": sec.astype(np.int64),
                             "c": c.astype(np.int64)})

    hist = hash_groupby_agg(
        _user_bucketed(ds).map_groups(gap_hist, batch_format="pandas"),
        ["sec"], {"c": ("c", "sum")}, num_parts=4)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("sec")
        sec = df["sec"].to_numpy(dtype=np.int64).astype(np.float64)
        c = df["c"].to_numpy(dtype=np.int64)
        n = int(c.sum())
        mean = float(np.sum(sec * c)) / n
        cum = np.cumsum(c).astype(np.float64)
        cdf = 1.0 - np.exp(-(sec / mean))
        ks = float(np.max(np.maximum(np.abs(cum / n - cdf),
                                     np.abs((cum - c) / n - cdf))))
        return pd.DataFrame({
            "n_gaps": np.array([n], dtype=np.int64),
            "mean_gap_s": round_half_up(np.array([mean]), 6),
            "lambda_hat": round_half_up(np.array([1.0 / mean]), 6),
            "ks_stat": round_half_up(np.array([ks]), 6)})

    return hist.repartition(1).map_batches(final, batch_format="pandas")


def events_with_last_order(sf_dir: str) -> rd.Dataset:
    """Cross-table AS-OF join: enrich every event with the same
    customer's most recent order at-or-before the event time — the
    canonical point-in-time feature-attach (feature stores call it the
    time-travel join; Ray Data has no as-of primitive, so the engine
    lowers it explicitly).

    Plan: orders pre-reduce to one row per (custkey, orderdate) (max
    total in integer cents — removes right-side timestamp ties, which
    an ASOF join otherwise resolves arbitrarily); both tables tag with
    the SAME hash(user) coarse bucket and union, so ONE exchange
    co-locates each user's events with their orders; per bucket one
    ``pd.merge_asof(by=user)`` — a single sort-merge over all the
    bucket's users, no per-user loop. Output: (event_id, user_id,
    last_order_date, last_order_total) sorted by event_id, NULLs when
    the user never ordered before the event."""
    from ..stages.hashagg import _stable_partition, hash_groupby_agg

    ev = read_table(f"{sf_dir}/events.parquet",
                    columns=["event_id", "user_id", "ts"])
    orders = read_table(f"{sf_dir}/orders.parquet",
                        columns=["o_custkey", "o_orderdate",
                                 "o_totalprice"])

    def order_cents(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["cents"] = np.rint(
            df["o_totalprice"].to_numpy() * 100).astype(np.int64)
        g = df.groupby(["o_custkey", "o_orderdate"], as_index=False).agg(
            cents=("cents", "max"))
        return g

    od = hash_groupby_agg(
        orders.map_batches(order_cents, batch_format="pandas"),
        ["o_custkey", "o_orderdate"], {"cents": ("cents", "max")},
        num_parts=8)

    def tag_orders(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "user_id": df["o_custkey"].astype(np.int64),
            "t": df["o_orderdate"],
            "event_id": np.int64(-1),
            "cents": df["cents"].astype(np.int64)})
        out["_ubucket"] = _stable_partition(out, ["user_id"], 16)
        return out

    def tag_events(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "user_id": df["user_id"].astype(np.int64),
            "t": df["ts"],
            "event_id": df["event_id"].astype(np.int64),
            "cents": np.int64(0)})
        out["_ubucket"] = _stable_partition(out, ["user_id"], 16)
        return out

    both = ev.map_batches(tag_events, batch_format="pandas").union(
        od.map_batches(tag_orders, batch_format="pandas"))

    def asof(g: pd.DataFrame) -> pd.DataFrame:
        is_ev = g["event_id"].to_numpy() >= 0
        e = g.loc[is_ev, ["event_id", "user_id", "t"]].sort_values(
            "t", kind="mergesort")
        o = g.loc[~is_ev, ["user_id", "t", "cents"]].sort_values(
            "t", kind="mergesort")
        o = o.assign(odate=o["t"])
        if not len(e):
            return pd.DataFrame({
                "event_id": pd.Series(dtype=np.int64),
                "user_id": pd.Series(dtype=np.int64),
                "last_order_date": pd.Series(dtype="datetime64[us]"),
                "last_order_total": pd.Series(dtype=np.float64)})
        m = pd.merge_asof(e, o, on="t", by="user_id",
                          direction="backward")
        return pd.DataFrame({
            "event_id": m["event_id"].astype(np.int64),
            "user_id": m["user_id"].astype(np.int64),
            "last_order_date": m["odate"].astype("datetime64[us]"),
            "last_order_total": round_half_up(
                m["cents"].to_numpy(dtype=np.float64) / 100.0, 2)})

    return both.groupby("_ubucket").map_groups(
        asof, batch_format="pandas").repartition(4).sort("event_id")


def ewma_user_value(sf_dir: str, alpha: float = 0.9) -> rd.Dataset:
    """Exponential recency-weighted mean of each user's event values —
    the standard freshness-decayed engagement/feature score (latest
    event weight 1, previous alpha, then alpha^2, ...), normalized so
    the score stays on the value scale.

    Plan: ONE coarse hash(user) % 16 exchange co-locates users; each
    bucket runs a single vectorized pass — sort by (user, ts desc,
    event_id desc), per-segment position k via arange minus repeated
    segment starts, weights alpha**k, numerator/denominator via
    segment reduceat. Output: (user_id, n_events, ewma) sorted by
    user."""
    ds = read_table(f"{sf_dir}/events.parquet",
                    columns=["user_id", "ts", "event_id", "value"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          ascending=[True, False, False])
        u = g["user_id"].to_numpy(dtype=np.int64)
        v = g["value"].to_numpy(dtype=np.float64)
        starts = _segment_starts(u)
        idx = np.flatnonzero(starts)
        counts = np.diff(np.append(idx, len(u)))
        k = np.arange(len(u), dtype=np.int64) - np.repeat(idx, counts)
        w = np.power(alpha, k.astype(np.float64))
        num = np.add.reduceat(w * v, idx)
        den = np.add.reduceat(w, idx)
        return pd.DataFrame({
            "user_id": u[idx],
            "n_events": counts.astype(np.int64),
            "ewma": round_half_up(num / den, 4),
        })

    return (_user_bucketed(ds).map_groups(per_bucket,
                                          batch_format="pandas")
            .repartition(1).sort("user_id"))


def debounced_event_counts(sf_dir: str, cooldown_s: int = 60
                           ) -> rd.Dataset:
    """Burst debounce audit: an event is KEPT if it is the first of
    its (user, event_type) stream or arrived more than ``cooldown_s``
    after the previous event of that stream (lag-based, so the rule is
    order-deterministic and window-expressible — not the greedy
    collapse, which depends on which predecessor was kept). The
    standard click/telemetry de-bounce before counting engagement.

    Plan: ONE coarse hash(user) % 16 exchange; each bucket sorts by
    (user, type, ts, event_id) once and evaluates gaps with a
    vectorized segment-masked diff; per-type partials fold to a
    |types|-row combine. Output: (event_type, n_total, n_kept,
    n_dropped) sorted by type."""
    ds = read_table(f"{sf_dir}/events.parquet",
                    columns=["user_id", "event_type", "ts", "event_id"])
    gap_ns = np.int64(cooldown_s) * np.int64(1_000_000_000)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "event_type", "ts", "event_id"])
        u = g["user_id"].to_numpy(dtype=np.int64)
        et = g["event_type"].to_numpy()
        ts = g["ts"].to_numpy(dtype="datetime64[ns]").view(np.int64)
        starts = np.ones(len(g), dtype=bool)
        starts[1:] = (u[1:] != u[:-1]) | (et[1:] != et[:-1])
        kept = starts.copy()
        kept[1:] |= ts[1:] - ts[:-1] > gap_ns
        out = pd.DataFrame({"event_type": et,
                            "kept": kept.astype(np.int64)})
        p = out.groupby("event_type", as_index=False).agg(
            n_total=("kept", "size"), n_kept=("kept", "sum"))
        return p

    partials = _user_bucketed(ds).map_groups(per_bucket,
                                             batch_format="pandas")

    from ..stages.hashagg import hash_groupby_agg
    agg = hash_groupby_agg(partials, ["event_type"],
                           {"n_total": ("n_total", "sum"),
                            "n_kept": ("n_kept", "sum")}, num_parts=4)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.astype({"n_total": "int64", "n_kept": "int64"})
        df["n_dropped"] = (df["n_total"] - df["n_kept"]).astype(
            np.int64)
        return df[["event_type", "n_total", "n_kept", "n_dropped"]]

    return (agg.map_batches(finish, batch_format="pandas")
            .repartition(1).sort("event_type"))


def late_event_counts(sf_dir: str, watermark_s: int = 300
                      ) -> rd.Dataset:
    """Streaming watermark audit: an event is LATE if its timestamp
    trails the maximum timestamp already seen for that user (arrival
    order = event_id) by more than ``watermark_s`` — the out-of-order
    fraction a streaming engine must tolerate before finalizing
    windows (Ray Data is batch, so this is the exactness check a
    window operator's watermark choice needs).

    Plan: ONE coarse hash(user) % 16 exchange; each bucket sorts by
    (user, event_id) and computes the per-user running max with
    cython-backed grouped cummax + shift — no Python loop; |types|-row
    partials fold through the two-phase hash aggregate.
    Output: (event_type, n_total, n_late, late_frac) sorted."""
    from ..functions.numeric import round_half_up
    from ..stages.hashagg import hash_groupby_agg

    ds = read_table(f"{sf_dir}/events.parquet",
                    columns=["user_id", "event_type", "ts", "event_id"])
    wm_ns = np.int64(watermark_s) * np.int64(1_000_000_000)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "event_id"])
        ts = g["ts"].to_numpy(dtype="datetime64[ns]").view(np.int64)
        g = g.assign(_ts=ts)
        prev_max = g.groupby("user_id")["_ts"].cummax().groupby(
            g["user_id"]).shift(1)
        late = prev_max.notna().to_numpy() & (
            g["_ts"].to_numpy()
            < prev_max.fillna(np.iinfo(np.int64).min).to_numpy(
                dtype=np.int64) - wm_ns)
        out = pd.DataFrame({"event_type": g["event_type"].to_numpy(),
                            "late": late.astype(np.int64)})
        return out.groupby("event_type", as_index=False).agg(
            n_total=("late", "size"), n_late=("late", "sum"))

    partials = _user_bucketed(ds).map_groups(per_bucket,
                                             batch_format="pandas")
    agg = hash_groupby_agg(partials, ["event_type"],
                           {"n_total": ("n_total", "sum"),
                            "n_late": ("n_late", "sum")}, num_parts=4)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.astype({"n_total": "int64", "n_late": "int64"})
        df["late_frac"] = round_half_up(
            df["n_late"].to_numpy() / df["n_total"].to_numpy(), 4)
        return df[["event_type", "n_total", "n_late", "late_frac"]]

    return (agg.map_batches(finish, batch_format="pandas")
            .repartition(1).sort("event_type"))


def session_bounce_rate(sf_dir: str, gap_minutes: int = 30
                        ) -> rd.Dataset:
    """Per-day bounce rate: fraction of sessions (30-min-gap
    sessionization, keyed to the session's FIRST event day) containing
    exactly one event — the canonical web-analytics KPI, here as a
    two-level composition: per-user sessionize, then calendar
    re-aggregate.

    Plan: ONE coarse hash(user) % 16 exchange; each bucket runs the
    same vectorized session scan as user_sessions but emits per-(start
    day) partials (session count, bounce count via segment reduceat of
    the one-event mask); a |days|-bounded hash aggregate finishes.
    Output: (day, n_sessions, n_bounce, bounce_rate) sorted by day."""
    from ..functions.numeric import round_half_up
    from ..stages.hashagg import hash_groupby_agg

    ds = read_table(f"{sf_dir}/events.parquet",
                    columns=["user_id", "ts", "event_id"])
    gap_ns = np.int64(gap_minutes) * np.int64(60_000_000_000)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        u = g["user_id"].to_numpy(dtype=np.int64)
        ts = g["ts"].to_numpy(dtype="datetime64[ns]").view(np.int64)
        starts = _segment_starts(u)
        new_s = starts.copy()
        new_s[1:] |= ts[1:] - ts[:-1] > gap_ns
        sidx = np.flatnonzero(new_s)
        slen = np.diff(np.append(sidx, len(u)))
        day = (ts[sidx] // np.int64(86_400_000_000_000)).astype(
            np.int64)
        out = pd.DataFrame({
            "day": day,
            "one": (slen == 1).astype(np.int64),
            "n": np.int64(1)})
        return out.groupby("day", as_index=False).agg(
            n_sessions=("n", "sum"), n_bounce=("one", "sum"))

    partials = _user_bucketed(ds).map_groups(per_bucket,
                                             batch_format="pandas")
    agg = hash_groupby_agg(partials, ["day"],
                           {"n_sessions": ("n_sessions", "sum"),
                            "n_bounce": ("n_bounce", "sum")},
                           num_parts=4)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.astype({"day": "int64", "n_sessions": "int64",
                        "n_bounce": "int64"})
        out = pd.DataFrame({
            "day": pd.to_datetime(df["day"] * 86_400_000_000_000)
            .dt.strftime("%Y-%m-%d"),
            "n_sessions": df["n_sessions"],
            "n_bounce": df["n_bounce"],
            "bounce_rate": round_half_up(
                df["n_bounce"].to_numpy()
                / df["n_sessions"].to_numpy(), 4)})
        return out

    return (agg.map_batches(finish, batch_format="pandas")
            .repartition(1).sort("day"))


def changepoint_day_split(sf_dir: str) -> rd.Dataset:
    """Single-changepoint detection on the daily event-count series
    (binary-segmentation step: the split day t maximizing the
    |mean(before) - mean(after)| gap, normalized by the pooled
    standard error) — the monitoring primitive behind "did traffic
    shift on day X".

    Plan: ONE |days|-bounded two-phase reduce builds the daily series;
    the split scan is a closed-form pass over cumulative sums of the
    REDUCED table (every candidate split scored from prefix sums — no
    per-split re-aggregation). Output: one row (split_day, mean_before,
    mean_after, t_stat) with the maximizing split (ties -> earliest
    day)."""
    from ..functions.numeric import round_half_up
    from ..stages.hashagg import hash_groupby_agg

    ds = read_table(f"{sf_dir}/events.parquet", columns=["ts"])

    def day_counts(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").to_numpy(
            zero_copy_only=False).astype("datetime64[D]")
        d, c = np.unique(ts.astype(np.int64), return_counts=True)
        return pa.Table.from_pydict({
            "day": pa.array(d, pa.int64()),
            "n": pa.array(c.astype(np.int64), pa.int64())})

    daily = hash_groupby_agg(
        ds.map_batches(day_counts, batch_format="pyarrow"),
        ["day"], {"n": ("n", "sum")}, num_parts=4)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("day").reset_index(drop=True)
        n = df["n"].to_numpy(dtype=np.float64)
        days = df["day"].to_numpy(dtype=np.int64)
        m = len(n)
        cum = np.cumsum(n)
        tot = cum[-1]
        # split AFTER position i (before = 0..i, after = i+1..m-1)
        i = np.arange(m - 1)
        nb, na = i + 1.0, m - 1.0 - i
        mb = cum[:-1] / nb
        ma = (tot - cum[:-1]) / na
        # pooled-variance t statistic from prefix sums of squares
        cum2 = np.cumsum(n * n)
        ssb = cum2[:-1] - nb * mb * mb
        ssa = (cum2[-1] - cum2[:-1]) - na * ma * ma
        dof = np.maximum(nb + na - 2.0, 1.0)
        sp2 = (ssb + ssa) / dof
        se = np.sqrt(sp2 * (1.0 / nb + 1.0 / na))
        t = np.where(se > 0, np.abs(mb - ma) / se, 0.0)
        best = int(np.argmax(t))  # argmax takes the FIRST maximum
        return pd.DataFrame({
            "split_day": [pd.to_datetime(
                days[best] * np.int64(86_400_000_000_000)
            ).strftime("%Y-%m-%d")],
            "mean_before": round_half_up(np.array([mb[best]]), 4),
            "mean_after": round_half_up(np.array([ma[best]]), 4),
            "t_stat": round_half_up(np.array([t[best]]), 4),
        })

    return daily.repartition(1).map_batches(finish,
                                            batch_format="pandas")


def seasonal_hour_anomalies(sf_dir: str, factor: float = 2.0
                            ) -> rd.Dataset:
    """Seasonal-baseline anomaly detection: (day, hour) cells whose
    event count exceeds ``factor`` x that HOUR-OF-DAY's mean across
    all days — the calendar-profile complement to the trailing-window
    detector (event_rate_anomalies): a 9am spike is judged against
    9am's own baseline, not the adjacent hours.

    Plan: ONE (day, hour)-bounded reduce builds the cell table; the
    24-row hourly profile and the flags are local transforms of the
    reduced cells. Output: (day, hour, n, expected, ratio) sorted."""
    from ..functions.numeric import round_half_up
    from ..stages.hashagg import hash_groupby_agg

    ds = read_table(f"{sf_dir}/events.parquet", columns=["ts"])

    def cells(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").to_numpy(zero_copy_only=False)
        day = ts.astype("datetime64[D]").astype(np.int64)
        hour = (ts.astype("datetime64[h]").astype(np.int64)
                % 24).astype(np.int64)
        df = pd.DataFrame({"day": day, "hour": hour})
        g = df.groupby(["day", "hour"], as_index=False).size()
        from ..functions.tables import table_from_pandas
        return table_from_pandas(g.rename(columns={"size": "n"}))

    agg = hash_groupby_agg(
        ds.map_batches(cells, batch_format="pyarrow"),
        ["day", "hour"], {"n": ("n", "sum")}, num_parts=4)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.astype({"day": "int64", "hour": "int64",
                        "n": "int64"})
        prof = df.groupby("hour")["n"].mean()
        exp = df["hour"].map(prof).to_numpy(dtype=np.float64)
        ratio = df["n"].to_numpy(dtype=np.float64) / exp
        out = df[ratio > factor].copy()
        out["expected"] = round_half_up(exp[ratio > factor], 4)
        out["ratio"] = round_half_up(ratio[ratio > factor], 4)
        out["day"] = pd.to_datetime(
            out["day"] * np.int64(86_400_000_000_000)
        ).dt.strftime("%Y-%m-%d")
        return out[["day", "hour", "n", "expected", "ratio"]] \
            .sort_values(["day", "hour"]).reset_index(drop=True)

    return agg.repartition(1).map_batches(finish,
                                          batch_format="pandas")


def skew_report(sf_dir: str, top: int = 10) -> rd.Dataset:
    """Shuffle-skew diagnosis for a groupby key (user_id): the top
    hot keys with their share of all rows, plus how many keys cover
    50% of the data — the numbers that decide whether a key needs
    salting before a wide exchange (the engine's own hot-key
    mitigation notes reference exactly this distribution).

    Plan: ONE |keys|-bounded count reduce; the hot-key pick and the
    half-coverage scan are local transforms of the reduced table.
    Output: (rank, user_id, n_events, pct, keys_to_half) — the last
    column repeated (scalar audit result)."""
    from ..functions.numeric import round_half_up
    from ..stages.hashagg import hash_groupby_agg

    ds = read_table(f"{sf_dir}/events.parquet", columns=["user_id"])

    def partial(batch: pa.Table) -> pa.Table:
        u, c = np.unique(batch.column("user_id").to_numpy(
            zero_copy_only=False), return_counts=True)
        return pa.Table.from_pydict({
            "user_id": pa.array(u.astype(np.int64), pa.int64()),
            "n": pa.array(c.astype(np.int64), pa.int64())})

    counts = hash_groupby_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["user_id"], {"n": ("n", "sum")}, num_parts=8)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.astype({"user_id": "int64", "n": "int64"})
        df = df.sort_values(["n", "user_id"],
                            ascending=[False, True]).reset_index(
            drop=True)
        tot = df["n"].sum()
        cum = df["n"].cumsum()
        keys_to_half = int((cum < tot / 2.0).sum()) + 1
        head = df.head(top)
        return pd.DataFrame({
            "rank": np.arange(1, len(head) + 1, dtype=np.int64),
            "user_id": head["user_id"].to_numpy(),
            "n_events": head["n"].to_numpy(),
            "pct": round_half_up(
                100.0 * head["n"].to_numpy() / tot, 4),
            "keys_to_half": np.int64(keys_to_half)})

    return counts.repartition(1).map_batches(finish,
                                             batch_format="pandas")


def linear_attribution(sf_dir: str, window_minutes: int = 60
                       ) -> rd.Dataset:
    """Multi-touch linear attribution: each purchase's value splits
    equally across the user's touch events (view/click) in the
    preceding ``window_minutes``; purchases with no touches keep
    their value unattributed ('direct'). The marketing-analytics
    join-and-allocate shape (last-touch's fairer sibling).

    Plan: ONE coarse hash(user) % 16 exchange; each bucket sorts by
    the TOTAL order (user, ts, event_id) once, then for every purchase
    counts its touch window with two searchsorted probes over
    composite (user-offset) keys and allocates credit to the touches
    via a vectorized interval-add (difference array + cumsum) — no
    per-purchase loop over touches. Per-touch credit is quantized to
    EXACT integer micro-dollars (floor(value/n * 1e6 + 0.5), the same
    IEEE double ops the oracle SQL performs) so every sum is int64 and
    order-independent: credit values sit intrinsically near half-cent
    boundaries and float folds on EITHER side can flip a rounded cent —
    DuckDB's own 16-thread parallel sum was observed flipping
    406.455±1ulp run-to-run in round 5, so pinning the engine's order
    (the round-4 fix) was insufficient. Output:
    (channel, n_touches_credited, credit) where channel in
    {view, click, direct}, credit = round(micros/1e6, 2)."""
    from ..functions.numeric import round_half_up

    ds = read_table(f"{sf_dir}/events.parquet",
                    columns=["user_id", "event_type", "ts", "value",
                             "event_id"])
    win_ns = np.int64(window_minutes) * np.int64(60_000_000_000)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        bucket = int(g["_ubucket"].iloc[0]) if len(g) else -1
        g = g.sort_values(["user_id", "ts", "event_id"]) \
             .reset_index(drop=True)
        u = g["user_id"].to_numpy(dtype=np.int64)
        ts = g["ts"].to_numpy(dtype="datetime64[ns]").view(np.int64)
        et = g["event_type"].to_numpy()
        val = g["value"].to_numpy(dtype=np.float64)
        is_touch = (et == "view") | (et == "click")
        is_purch = et == "purchase"
        # composite key makes user boundaries absolute: consecutive
        # users sit further apart than any probe window can reach
        # (span > max time delta + window), so a purchase's window
        # can never leak into the previous user's key range. Bound:
        # users-per-bucket x span must fit int64 — at 30-day data
        # that allows ~3e3 users per bucket per ns... i.e. millions;
        # beyond that, raise nbuckets.
        ui = np.unique(u, return_inverse=True)[1].astype(np.int64)
        delta = ts - ts.min()
        span = delta.max() + win_ns + np.int64(2)
        key = ui * span + delta
        tkey = key[is_touch]
        tpos = np.flatnonzero(is_touch)
        pk = key[is_purch]
        lo = np.searchsorted(tkey, pk - win_ns)
        hi = np.searchsorted(tkey, pk)  # strictly before the purchase
        n_touch = (hi - lo).astype(np.int64)
        pval = val[is_purch]
        # credit each touch in [lo, hi): difference array over touch
        # slots, one weight per purchase
        w = np.where(n_touch > 0, pval / np.maximum(n_touch, 1), 0.0)
        # exact micro-dollar grid: identical double ops to the oracle's
        # floor(value / n * 1000000 + 0.5) — all sums below are int64
        w_int = np.floor(w * 1e6 + 0.5).astype(np.int64)
        diff = np.zeros(len(tkey) + 1, dtype=np.int64)
        np.add.at(diff, lo, w_int)
        np.add.at(diff, hi, -w_int)
        credit = np.cumsum(diff[:-1])
        touched = np.zeros(len(tkey) + 1, dtype=np.int64)
        np.add.at(touched, lo, 1)
        np.add.at(touched, hi, -1)
        times_credited = np.cumsum(touched[:-1])
        out = pd.DataFrame({
            "channel": et[tpos],
            "n": (times_credited > 0).astype(np.int64),
            "credit": credit})
        direct = pd.DataFrame({
            "channel": ["direct"],
            "n": [np.int64((n_touch == 0).sum())],
            "credit": [np.floor(pval[n_touch == 0] * 1e6 + 0.5)
                       .astype(np.int64).sum()]})
        out = pd.concat([out, direct], ignore_index=True)
        part = out.groupby("channel", as_index=False).agg(
            n_touches_credited=("n", "sum"), credit=("credit", "sum"))
        part["_b"] = bucket
        return part

    partials = _user_bucketed(ds).map_groups(per_bucket,
                                             batch_format="pandas")

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        # partials carry int64 micro-dollars: the fold is exact in any
        # order (the round-4 float-order pinning became moot in round 5)
        g = df.groupby("channel", as_index=False, sort=True).agg(
            n_touches_credited=("n_touches_credited", "sum"),
            credit=("credit", "sum"))
        g["n_touches_credited"] = g["n_touches_credited"].astype(
            np.int64)
        g["credit"] = round_half_up(
            g["credit"].to_numpy(np.int64) / 1e6, 2)
        return g[["channel", "n_touches_credited", "credit"]]

    return (partials.repartition(1)
            .map_batches(finish, batch_format="pandas")
            .sort("channel"))


def windowed_funnel_counts(sf_dir: str,
                           stages: tuple[str, str, str] = (
                               "view", "click", "purchase"),
                           max_gap_days: int = 7) -> "pa.Table":
    """Time-bounded ordered funnel: stage N+1 must happen STRICTLY
    AFTER the user's stage-N frontier AND within ``max_gap_days`` of
    it — the conversion-window funnel every product-analytics stack
    ships (unbounded ``funnel_counts`` is the degenerate case). Same
    chained user-keyed min-reduce plan as funnel_counts, with the same
    size dispatch: below the broadcast threshold the previous frontier
    ships once as sorted (user, ts) arrays probed by searchsorted with
    the two-sided (t_prev, t_prev + gap] cut applied vectorized; above
    it the frontier attaches via a partitioned user join (users are
    fact-cardinality at web scale). All comparisons on exact int64
    nanoseconds. Output: one row (n_stage1, n_stage2, n_stage3).

    Reference analogue: the staged presence counts of
    evaluate_new_testdata.py:137-163 with ordering + recency bounds."""
    import ray

    from ..sources.storage import parquet_num_rows
    from ..stages.hashagg import hash_groupby_agg
    from ..stages.join import partitioned_join

    small = (parquet_num_rows(f"{sf_dir}/events.parquet") <= 1_000_000)

    gap_ns = np.int64(max_gap_days) * np.int64(86_400_000_000_000)

    def _events() -> rd.Dataset:
        from ..sources.storage import rows_to_blocks
        path = f"{sf_dir}/events.parquet"
        return read_table(path, columns=["user_id", "event_type", "ts"],
                          num_blocks=rows_to_blocks(path))

    def _stage_min(stage: str) -> rd.Dataset:
        def partial(df: pd.DataFrame) -> pd.DataFrame:
            df = df[df["event_type"] == stage]
            return df.groupby("user_id", as_index=False).agg(
                t=("ts", "min"))

        return hash_groupby_agg(
            _events().map_batches(partial, batch_format="pandas"),
            ["user_id"], {"t": ("t", "min")}, num_parts=16)

    def _next_frontier(prev: rd.Dataset, stage: str) -> rd.Dataset:
        if small:
            pf = prev.to_pandas()
            uk = pf["user_id"].to_numpy(dtype=np.int64)
            ts = pf["t"].to_numpy(dtype="datetime64[ns]").view(np.int64)
            o = np.argsort(uk)
            front_ref = ray.put((uk[o], ts[o]))

            def probe(df: pd.DataFrame) -> pd.DataFrame:
                uks, tss = ray.get(front_ref)
                df = df[df["event_type"] == stage]
                u = df["user_id"].to_numpy(dtype=np.int64)
                pos = np.searchsorted(uks, u)
                pos[pos >= len(uks)] = len(uks) - 1 if len(uks) else 0
                hit = (uks[pos] == u) if len(uks) else np.zeros(
                    len(u), bool)
                ev_ts = df["ts"].to_numpy(
                    dtype="datetime64[ns]").view(np.int64)
                ok = np.zeros(len(u), dtype=bool)
                ok[hit] = ((ev_ts[hit] > tss[pos[hit]])
                           & (ev_ts[hit] <= tss[pos[hit]] + gap_ns))
                return (df[ok].groupby("user_id", as_index=False)
                        .agg(t=("ts", "min")))

            return hash_groupby_agg(
                _events().map_batches(probe, batch_format="pandas"),
                ["user_id"], {"t": ("t", "min")}, num_parts=16)

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            df = df[df["event_type"] == stage]
            return df[["user_id", "ts"]]

        cand = _events().map_batches(partial, batch_format="pandas")

        def merge(cf: pd.DataFrame, pf: pd.DataFrame) -> pd.DataFrame:
            m = cf.merge(pf, on="user_id", how="inner")
            ev = m["ts"].to_numpy(dtype="datetime64[ns]").view(np.int64)
            ft = m["t"].to_numpy(dtype="datetime64[ns]").view(np.int64)
            m = m[(ev > ft) & (ev <= ft + gap_ns)]
            return m.groupby("user_id", as_index=False).agg(
                t=("ts", "min"))

        return partitioned_join(
            cand, prev, "user_id", "user_id", merge, num_buckets=16,
            left_schema=pa.schema([("user_id", pa.int64()),
                                   ("ts", pa.timestamp("us"))]),
            right_schema=pa.schema([("user_id", pa.int64()),
                                    ("t", pa.timestamp("us"))]))

    # frontiers are REDUCED (user-cardinality) — materialize makes each
    # count() a free metadata read, per the repo's multi-consumer rule
    f1 = _stage_min(stages[0]).materialize()
    f2 = _next_frontier(f1, stages[1]).materialize()
    f3 = _next_frontier(f2, stages[2]).materialize()

    return pa.Table.from_pydict({
        "n_stage1": pa.array([f1.count()], pa.int64()),
        "n_stage2": pa.array([f2.count()], pa.int64()),
        "n_stage3": pa.array([f3.count()], pa.int64())})


def session_paths_topk(sf_dir: str, gap_minutes: int = 30,
                       k: int = 10) -> rd.Dataset:
    """Top-k most frequent session PATHS — the ordered event_type
    sequence of each gap-delimited session joined with '>' — the
    navigation-pattern report behind every clickstream product. Plan:
    ONE coarse hash(user) % 16 shuffle co-locates users; each bucket
    sessionizes with the same vectorized gap scan as user_sessions and
    builds every path string with a single sorted grouped join (no
    per-session Python); per-bucket path counts then reduce through a
    path-keyed hash aggregate (exchange sized by DISTINCT paths, not
    sessions) and the top-k is a per-block partial + one tiny sort.
    Ordering inside a session is (ts, event_id) so ties are
    deterministic. Output: (path, n_sessions) by count desc, path asc."""
    from ..stages.hashagg import hash_groupby_agg

    ds = read_table(f"{sf_dir}/events.parquet",
                    columns=["user_id", "ts", "event_id", "event_type"])
    gap_ns = np.int64(gap_minutes) * np.int64(60_000_000_000)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        u = g["user_id"].to_numpy(dtype=np.int64)
        ts = g["ts"].to_numpy(dtype="datetime64[ns]").view(np.int64)
        new_s = _segment_starts(u)
        new_s[1:] |= ts[1:] - ts[:-1] > gap_ns
        sid = np.cumsum(new_s)          # global session id within bucket
        paths = (pd.Series(g["event_type"].to_numpy(), copy=False)
                 .groupby(sid).agg(">".join))
        return (paths.value_counts().rename_axis("path")
                .reset_index(name="n").astype({"n": np.int64}))

    partials = _user_bucketed(ds).map_groups(per_bucket,
                                             batch_format="pandas")
    agg = hash_groupby_agg(partials, ["path"], {"n": ("n", "sum")},
                           num_parts=8)

    def topk_partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["n", "path"], ascending=[False, True])
        return df.head(k)

    out = (agg.map_batches(topk_partial, batch_format="pandas")
           .repartition(1)
           .map_batches(topk_partial, batch_format="pandas"))

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["n_sessions"] = df["n"].astype(np.int64)
        return df[["path", "n_sessions"]]

    return (out.map_batches(finish, batch_format="pandas")
            .sort(["n_sessions", "path"], descending=[True, False]))


def purchase_view_band_join(sf_dir: str,
                            window_hours: int = 24) -> rd.Dataset:
    """Range (band) join inside the event stream: for every 'purchase',
    the count and value-sum of the same user's 'view' events in
    [t_purchase - window, t_purchase) — the interval-predicate join
    Ray Data has no primitive for (SURVEY custom-operator family:
    as-of / range joins). Plan: ONE coarse hash(user) % 16 shuffle;
    inside a bucket, rows sort once by (user, ts, event_id) and each
    purchase probes the view side with two searchsorted calls on a
    composite (dense-user x span + delta) key — user boundaries sit
    further apart than any window can reach, so probes never leak
    across users (same bound as linear_attribution: users-per-bucket x
    span must fit int64; raise nbuckets beyond that). The window SUM
    is a prefix-sum difference, so per-bucket work is O(rows log rows)
    with no pair materialization. Output: (event_id, user_id,
    n_views_24h, sum_view_value) per purchase, by event_id."""
    ds = read_table(f"{sf_dir}/events.parquet",
                    columns=["event_id", "user_id", "ts", "event_type",
                             "value"])
    win_ns = np.int64(window_hours) * np.int64(3_600_000_000_000)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        u = g["user_id"].to_numpy(dtype=np.int64)
        ts = g["ts"].to_numpy(dtype="datetime64[ns]").view(np.int64)
        et = g["event_type"].to_numpy()
        val = g["value"].to_numpy(dtype=np.float64)
        is_v = et == "view"
        is_p = et == "purchase"
        ui = np.unique(u, return_inverse=True)[1].astype(np.int64)
        delta = ts - ts.min() if len(ts) else ts
        span = (delta.max() if len(delta) else np.int64(0)) \
            + win_ns + np.int64(2)
        key = ui * span + delta
        vkey = key[is_v]
        cumv = np.concatenate(([0.0], np.cumsum(val[is_v])))
        pk = key[is_p]
        lo = np.searchsorted(vkey, pk - win_ns, side="left")
        hi = np.searchsorted(vkey, pk, side="left")  # strictly before
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy()[is_p],
            "user_id": u[is_p],
            "n_views_24h": (hi - lo).astype(np.int64),
            "sum_view_value": round_half_up(cumv[hi] - cumv[lo], 2)})

    # coalesce the 16 bucket outputs before the tiny output sort —
    # a range exchange over near-empty blocks costs seconds (footgun)
    return (_user_bucketed(ds).map_groups(per_bucket,
                                          batch_format="pandas")
            .repartition(2).sort("event_id"))


def markov_removal_effect(sf_dir: str) -> pd.DataFrame:
    """First-order Markov attribution with REMOVAL EFFECTS (Anderl et
    al. 2016 shape): model each user's journey as a chain
    start -> touch channels -> conversion ('purchase') / null, estimate
    transition probabilities from observed consecutive pairs, then
    credit each channel by how much the start->conversion absorption
    probability drops when that channel is removed (its transitions
    redirected to null). Distributed shape: journeys never leave the
    cluster — ONE user-bucket exchange builds per-bucket transition
    PAIR COUNTS (vectorized shift compare), the |states|^2-sized count
    table reduces through a tiny keyed aggregate, and the absorbing-
    chain solves (one (k x k) linear system per removal, k = #channels
    + 3) run on the driver over that state-cardinality table only.
    Journey rule: events sorted by (ts, event_id); a journey ends at
    the first 'purchase' (conversion) and restarts after it; a user's
    trailing unconverted touches end in null. Output: (channel,
    removal_effect, attribution) — rows-only (absorbing-chain solve is
    not SQL-expressible; closed-form pytest oracle on a tiny chain)."""
    from ..stages.hashagg import hash_groupby_agg

    ds = read_table(f"{sf_dir}/events.parquet",
                    columns=["user_id", "ts", "event_id", "event_type"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        u = g["user_id"].to_numpy(dtype=np.int64)
        et = g["event_type"].to_numpy()
        n = len(g)
        conv = et == "purchase"
        # state sequence per user with start/terminal injection,
        # expressed as pair lists without building Python journeys:
        # pair (a, b) for consecutive rows of the same user where a is
        # not a terminal; terminal rows (purchase) emit (prev, conv)
        # and restart the chain (next same-user row pairs with start).
        starts = _segment_starts(u)
        frm = np.empty(n, dtype=object)
        frm[:] = et
        frm[conv] = "conversion"
        to_prev = np.empty(n, dtype=object)
        # transitions INTO each row: from previous row unless the
        # previous row converted or the user changed -> from 'start'
        to_prev[0] = "start"
        to_prev[1:] = frm[:-1]
        restart = starts.copy()
        restart[1:] |= conv[:-1]
        to_prev[restart] = "start"
        pairs = pd.DataFrame({"src": to_prev, "dst": frm})
        # trailing unconverted rows: user's last row (or last before a
        # user switch) that is not a conversion emits (row, null)
        last = np.zeros(n, dtype=bool)
        last[-1] = True
        last[:-1] = starts[1:]
        tail = last & ~conv
        nulls = pd.DataFrame({"src": et[tail], "dst": "null"})
        allp = pd.concat([pairs, nulls], ignore_index=True)
        return allp.groupby(["src", "dst"], as_index=False).size() \
            .rename(columns={"size": "n"})

    counts = hash_groupby_agg(
        _user_bucketed(ds).map_groups(per_bucket,
                                      batch_format="pandas"),
        ["src", "dst"], {"n": ("n", "sum")}, num_parts=2).to_pandas()

    # driver: absorbing-chain conversion probability from 'start'
    states = sorted(set(counts["src"]) | set(counts["dst"])
                    - {"conversion", "null"})
    if "start" in states:
        states.remove("start")
    order = ["start"] + states            # transient states
    idx = {s: i for i, s in enumerate(order)}
    k = len(order)

    def conv_prob(removed: str | None) -> float:
        q = np.zeros((k, k))              # transient -> transient
        r = np.zeros(k)                   # transient -> conversion
        tot = np.zeros(k)
        for src, dst, n in counts.itertuples(index=False):
            if src in ("conversion", "null") or src == removed:
                continue
            i = idx[src]
            tot[i] += n
            if dst == removed or dst == "null":
                continue                  # removed/null absorb to null
            elif dst == "conversion":
                r[i] += n
            else:
                q[i, idx[dst]] += n
        tot[tot == 0] = 1.0
        q /= tot[:, None]
        r /= tot
        # p = (I - Q)^-1 r, start component
        p = np.linalg.solve(np.eye(k) - q, r)
        return float(p[0])

    base = conv_prob(None)
    rows = []
    for ch in states:
        eff = 1.0 - (conv_prob(ch) / base if base > 0 else 0.0)
        rows.append({"channel": ch, "removal_effect": eff})
    tot_eff = sum(max(r["removal_effect"], 0.0) for r in rows) or 1.0
    from ..functions.numeric import round_half_up as _r
    return pd.DataFrame(
        [{"channel": r["channel"],
          "removal_effect": float(_r(r["removal_effect"], 6)),
          "attribution": float(_r(
              max(r["removal_effect"], 0.0) / tot_eff, 6))}
         for r in rows]).sort_values("channel").reset_index(drop=True)


def user_value_scd2(sf_dir: str) -> rd.Dataset:
    """SCD-2 dimension build (gaps-and-islands): compress each user's
    event stream into validity intervals of the coarse value state
    ``floor(value / 100)`` — consecutive events in the same state fold
    into one row (user_id, state, valid_from, valid_to), the
    slowly-changing-dimension type-2 shape every warehouse load job
    needs. Plan: ONE coarse hash(user) % 16 shuffle; inside a bucket a
    single vectorized ordered scan marks island starts (user change OR
    state change), reduceats the first timestamp per island and takes
    each island's valid_to from the NEXT island of the same user (open
    intervals close at the 2200-01-01 sentinel — the ns-safe stand-in
    for SQL's 9999 high date). Output sorted by (user_id, valid_from)."""
    ds = read_table(f"{sf_dir}/events.parquet",
                    columns=["user_id", "ts", "event_id", "value"])
    sentinel = np.datetime64("2200-01-01T00:00:00", "ns")

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        u = g["user_id"].to_numpy(dtype=np.int64)
        ts = g["ts"].to_numpy(dtype="datetime64[ns]")
        v = np.floor(g["value"].to_numpy(dtype=np.float64)
                     / 100.0).astype(np.int64)
        starts = _segment_starts(u)
        isl = starts.copy()
        isl[1:] |= v[1:] != v[:-1]
        idx = np.flatnonzero(isl)
        iu = u[idx]
        ifrom = ts[idx]
        ito = np.empty(len(idx), dtype="datetime64[ns]")
        ito[:-1] = ifrom[1:]
        ito[-1] = sentinel
        # islands whose NEXT island belongs to another user close open
        nxt_other = np.empty(len(idx), dtype=bool)
        nxt_other[:-1] = iu[1:] != iu[:-1]
        nxt_other[-1] = True
        ito[nxt_other] = sentinel
        return pd.DataFrame({"user_id": iu, "state": v[idx],
                             "valid_from": ifrom, "valid_to": ito})

    return (_user_bucketed(ds).map_groups(per_bucket,
                                          batch_format="pandas")
            .sort(["user_id", "valid_from"]))


def ab_test_report(sf_dir: str) -> rd.Dataset:
    """Deterministic A/B assignment + conversion report: users split
    into two variants by the repo's standard Knuth multiplicative hash
    (consistent with train_test_split / leakage_safe_split), conversion
    = the user has at least one 'purchase'. ONE user-cardinality
    exchange reduces each user to a (variant, converted) flag row; the
    |variants| aggregate and rate finish are tiny. Output:
    (variant, n_users, n_converted, conv_rate) sorted by variant."""
    from ..stages.hashagg import hash_groupby_agg

    ds = read_table(f"{sf_dir}/events.parquet",
                    columns=["user_id", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (pd.DataFrame({
            "user_id": df["user_id"].to_numpy(dtype=np.int64),
            "conv": (df["event_type"].to_numpy() == "purchase")
            .astype(np.int64)})
            .groupby("user_id", as_index=False).agg(conv=("conv",
                                                          "max")))

    users = hash_groupby_agg(
        ds.map_batches(partial, batch_format="pandas"),
        ["user_id"], {"conv": ("conv", "max")}, num_parts=16)

    def to_variant(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].to_numpy(dtype=np.int64)
        with np.errstate(over="ignore"):
            var = ((u.astype(np.uint64) * np.uint64(2654435761))
                   % np.uint64(1 << 32) % np.uint64(2)).astype(np.int64)
        return (pd.DataFrame({"variant": var,
                              "n_users": np.int64(1),
                              "n_converted": df["conv"].to_numpy(
                                  dtype=np.int64)})
                .groupby("variant", as_index=False).sum())

    agg = hash_groupby_agg(
        users.map_batches(to_variant, batch_format="pandas"),
        ["variant"],
        {"n_users": ("n_users", "sum"),
         "n_converted": ("n_converted", "sum")}, num_parts=2)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["n_users"] = df["n_users"].astype(np.int64)
        df["n_converted"] = df["n_converted"].astype(np.int64)
        df["conv_rate"] = round_half_up(
            df["n_converted"].to_numpy(dtype=np.float64)
            / df["n_users"].to_numpy(dtype=np.float64), 6)
        return df[["variant", "n_users", "n_converted", "conv_rate"]]

    return (agg.map_batches(finish, batch_format="pandas")
            .repartition(1).sort("variant"))


def daily_value_percentiles(sf_dir: str) -> rd.Dataset:
    """GROUPED exact interpolated percentiles — percentile_cont(.5/.9/
    .99) of event value PER DAY, the latency-dashboard shape — without
    sorting anything: values are exact at 2 decimals, so each day's
    distribution reduces to an integer-cents histogram ((day, cents)
    keyed two-phase aggregate, sized by days x value domain, never by
    events); the per-day interpolated selection then runs inside a
    |days|-cardinality map_groups (native per-key dispatch is fine at
    calendar cardinality — the footgun is per-USER keys). Output:
    (day, n_events, p50, p90, p99) by day, values rounded to 4."""
    from ..stages.hashagg import hash_groupby_agg

    ds = read_table(f"{sf_dir}/events.parquet", columns=["ts", "value"])

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        return (pd.DataFrame({
            "day": df["ts"].dt.strftime("%Y-%m-%d"),
            "cents": np.rint(df["value"].to_numpy() * 100)
            .astype(np.int64)})
            .groupby(["day", "cents"], as_index=False).size()
            .rename(columns={"size": "c"}))

    hist = hash_groupby_agg(
        ds.map_batches(counts, batch_format="pandas"),
        ["day", "cents"], {"c": ("c", "sum")}, num_parts=8)

    def select(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("cents")
        cum = g["c"].cumsum().to_numpy()
        n = int(cum[-1])
        vals = g["cents"].to_numpy(dtype=np.float64) / 100.0

        def at(rank0: int) -> float:
            return float(vals[int(np.searchsorted(cum, rank0 + 1))])

        out = {"day": g["day"].iloc[0], "n_events": np.int64(n)}
        for name, q in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
            p = q * (n - 1)
            k = int(np.floor(p))
            lo, hi = at(k), at(min(k + 1, n - 1))
            out[name] = float(round_half_up(lo + (p - k) * (hi - lo), 4))
        return pd.DataFrame([out])

    return (hist.groupby("day").map_groups(select,
                                           batch_format="pandas")
            .repartition(1).sort("day"))


def daily_value_ohlc(sf_dir: str) -> rd.Dataset:
    """Daily OHLC candles over the event-value stream: per day the
    OPEN (value of the earliest event), CLOSE (latest), HIGH, LOW and
    count — the time-series downsampling shape (Gorilla/TSDB rollups)
    that needs order-dependent FIRST/LAST aggregates Ray Data lacks.
    first/last ARE associative once each partial carries its candidate
    row: every block folds one (day, first_ts, first_id, open, last_ts,
    last_id, close, high, low, n) row, and the |days|-cardinality
    merge keeps the earlier/later candidate per side ((ts, event_id)
    total order, ties deterministic). Exchange = days x blocks rows.
    Output: (day, open, high, low, close, n_events) by day."""
    ds = read_table(f"{sf_dir}/events.parquet",
                    columns=["ts", "event_id", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ts", "event_id"])
        day = df["ts"].dt.strftime("%Y-%m-%d")
        g = df.assign(day=day).groupby("day", sort=True)
        out = pd.DataFrame({
            "day": g.size().index,
            "first_ts": g["ts"].first().to_numpy(),
            "first_id": g["event_id"].first().to_numpy(),
            "open": g["value"].first().to_numpy(),
            "last_ts": g["ts"].last().to_numpy(),
            "last_id": g["event_id"].last().to_numpy(),
            "close": g["value"].last().to_numpy(),
            "high": g["value"].max().to_numpy(),
            "low": g["value"].min().to_numpy(),
            "n": g.size().to_numpy().astype(np.int64)})
        return out

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["first_ts", "first_id"])
        fo = g.iloc[0]
        gl = g.sort_values(["last_ts", "last_id"])
        lo = gl.iloc[-1]
        return pd.DataFrame([{
            "day": fo["day"],
            "open": round(float(fo["open"]), 2),
            "high": round(float(g["high"].max()), 2),
            "low": round(float(g["low"].min()), 2),
            "close": round(float(lo["close"]), 2),
            "n_events": np.int64(g["n"].sum())}])

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby("day").map_groups(combine, batch_format="pandas")
            .repartition(1).sort("day"))


def transition_entropy(sf_dir: str) -> rd.Dataset:
    """Per-state entropy of the first-order Markov next-event
    distribution: for each event_type, H(next | current) in bits plus
    the outgoing-transition count — the sequence-predictability audit
    run over clickstreams before sequence-model training (a peaked
    next-event distribution means the state is near-deterministic).

    Plan: identical single coarse user-bucket exchange as
    :func:`event_transition_probs` (the k x k transition-count table is
    tiny by construction); entropy folds on the one final block.
    Output: (from_type, n_out, n_dest, entropy_bits) by from_type.
    Graft addition (no reference counterpart; SURVEY.md §2.9)."""
    from ..sources.storage import rows_to_blocks
    from ..stages.hashagg import _stable_partition

    path = f"{sf_dir}/events.parquet"
    ds = read_table(path,
                    columns=["user_id", "ts", "event_id", "event_type"],
                    num_blocks=rows_to_blocks(path))

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_ubucket"] = _stable_partition(df, ["user_id"], 16)
        return df

    def pair_counts(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        u = g["user_id"].to_numpy(dtype=np.int64)
        et = g["event_type"].to_numpy()
        same_user = u[1:] == u[:-1]
        pairs = pd.DataFrame({"from_type": et[:-1][same_user],
                              "to_type": et[1:][same_user]})
        out = pairs.groupby(["from_type", "to_type"], as_index=False).size()
        return out.rename(columns={"size": "n"})

    part = (ds.map_batches(tag, batch_format="pandas")
            .groupby("_ubucket")
            .map_groups(pair_counts, batch_format="pandas")
            .repartition(1))

    def entropy(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["from_type", "to_type"], as_index=False)["n"].sum()
        tot = g.groupby("from_type")["n"].transform("sum")
        p = g["n"] / tot
        g["_h"] = -p * np.log2(p)
        out = g.groupby("from_type", as_index=False).agg(
            n_out=("n", "sum"), n_dest=("to_type", "size"),
            entropy_bits=("_h", "sum"))
        out["n_out"] = out["n_out"].astype(np.int64)
        out["n_dest"] = out["n_dest"].astype(np.int64)
        out["entropy_bits"] = round_half_up(out["entropy_bits"], 6)
        return out.sort_values("from_type").reset_index(drop=True)

    return part.map_batches(entropy, batch_format="pandas")


def audience_overlap(sf_dir: str) -> rd.Dataset:
    """Pairwise audience Jaccard between event types: for every
    unordered pair (type_a < type_b), how many distinct users fired
    both, each, and the Jaccard |A∩B| / |A∪B| — the audience-overlap
    matrix used to spot redundant events and build funnels.

    Plan: ONE exchange. Each block folds its distinct (user_id,
    event_type) pairs; a 64-way user-hash coarse shuffle co-locates
    each user's pairs; inside a bucket one vectorized sorted scan
    re-dedupes and expands each user's type set into type-pair credits
    via a k²-bounded merge (k = |event types|, a constant), emitting
    at most k + k² partial rows per bucket. The final combine and
    Jaccard run on one tiny block. Output: (type_a, type_b, n_both,
    n_a, n_b, jaccard) by (type_a, type_b)."""
    from ..sources.storage import rows_to_blocks
    from ..stages.hashagg import _stable_partition

    path = f"{sf_dir}/events.parquet"
    ds = read_table(path, columns=["user_id", "event_type"],
                    num_blocks=rows_to_blocks(path))

    def distinct_pairs(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["user_id", "event_type"]].drop_duplicates()
        out = out.copy()
        out["_ubucket"] = _stable_partition(out, ["user_id"], 64)
        return out

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g[["user_id", "event_type"]].drop_duplicates()
        # per-user type sets -> pair credits, vectorized: self-merge on
        # user_id is bounded by k types per user
        m = g.merge(g, on="user_id")
        both = m[m["event_type_x"] < m["event_type_y"]]
        pairs = both.groupby(["event_type_x", "event_type_y"],
                             as_index=False).size()
        pairs.columns = ["type_a", "type_b", "n_both"]
        singles = g.groupby("event_type", as_index=False)["user_id"] \
                   .size().rename(columns={"event_type": "t",
                                           "size": "n"})
        pairs["kind"] = "pair"
        singles = pd.DataFrame({"type_a": singles["t"],
                                "type_b": singles["t"],
                                "n_both": singles["n"],
                                "kind": "single"})
        return pd.concat([pairs, singles], ignore_index=True)

    part = (ds.map_batches(distinct_pairs, batch_format="pandas")
            .groupby("_ubucket")
            .map_groups(per_bucket, batch_format="pandas")
            .repartition(1))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby(["kind", "type_a", "type_b"],
                         as_index=False)["n_both"].sum()
        singles = agg[agg["kind"] == "single"].set_index("type_a")[
            "n_both"]
        pairs = agg[agg["kind"] == "pair"].copy()
        pairs["n_a"] = pairs["type_a"].map(singles).astype(np.int64)
        pairs["n_b"] = pairs["type_b"].map(singles).astype(np.int64)
        pairs["n_both"] = pairs["n_both"].astype(np.int64)
        union = pairs["n_a"] + pairs["n_b"] - pairs["n_both"]
        pairs["jaccard"] = round_half_up(pairs["n_both"] / union, 6)
        out = pairs[["type_a", "type_b", "n_both", "n_a", "n_b",
                     "jaccard"]]
        return out.sort_values(["type_a", "type_b"]).reset_index(
            drop=True)

    return part.map_batches(final, batch_format="pandas")


def daily_value_acf(sf_dir: str, max_lag: int = 7) -> "pa.Table":
    """Autocorrelation of the daily event-value total at lags
    1..max_lag: Pearson correlation between (day d, day d+lag) pairs
    over days where BOTH exist — the seasonality screen run before
    forecasting (lag-7 spikes mean weekly cycles).

    Plan: per-block partial daily sums fold to a |days|-cardinality
    table (calendar-bounded, NOT data-bounded — safe to collect);
    the per-lag pair alignment and sample correlation then run
    driver-side on the tiny series. Output: (lag, n_pairs, acf)."""
    ds = read_table(f"{sf_dir}/events.parquet", columns=["ts", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(day=df["ts"].dt.floor("D"))
        return df.groupby("day", as_index=False).agg(v=("value", "sum"))

    daily = (ds.map_batches(partial, batch_format="pandas")
             .repartition(4).to_pandas())
    daily = daily.groupby("day", as_index=False)["v"].sum()
    days = daily["day"].to_numpy(dtype="datetime64[D]").astype(np.int64)
    vals = daily["v"].to_numpy(dtype=np.float64)
    order = np.argsort(days)
    days, vals = days[order], vals[order]

    lags, n_pairs, acfs = [], [], []
    for lag in range(1, max_lag + 1):
        # align day d with day d+lag via sorted-array membership
        pos = np.searchsorted(days, days + lag)
        pos_c = np.clip(pos, 0, len(days) - 1)
        ok = days[pos_c] == days + lag
        x, y = vals[ok], vals[pos_c[ok]]
        n = int(ok.sum())
        if n >= 2:
            xm, ym = x - x.mean(), y - y.mean()
            denom = np.sqrt((xm * xm).sum() * (ym * ym).sum())
            r = float((xm * ym).sum() / denom) if denom > 0 else None
        else:
            r = None
        lags.append(lag)
        n_pairs.append(n)
        acfs.append(round_half_up([r], 6)[0] if r is not None else None)

    return pa.Table.from_pydict({
        "lag": pa.array(lags, pa.int64()),
        "n_pairs": pa.array(n_pairs, pa.int64()),
        "acf": pa.array(acfs, pa.float64())})


def hopping_event_counts(sf_dir: str, window_s: int = 3600,
                         hop_s: int = 900) -> rd.Dataset:
    """Hopping (sliding) event-time windows: count and value-sum of
    events per 1-hour window advancing every 15 minutes — the
    overlapping-window stream aggregate Ray Data has no primitive for.
    Each event contributes to exactly window_s / hop_s consecutive
    windows, so the engine REPLICATES rows by that constant factor
    (vectorized np.repeat on the derived hop index — no watermark
    state needed for a bounded batch corpus) and folds per-block
    partials before ONE hop-keyed exchange whose cardinality is
    calendar-bounded (windows in the time range), not data-bounded.
    Output: (win_start_s, n_events, sum_value) by win_start_s; windows
    with zero events are absent. Graft addition (SURVEY.md §2.9)."""
    from ..stages.hashagg import hash_groupby_agg

    if window_s % hop_s:
        raise ValueError("window_s must be a multiple of hop_s")
    fan = window_s // hop_s
    ds = read_table(f"{sf_dir}/events.parquet", columns=["ts", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        sec = df["ts"].to_numpy(dtype="datetime64[ns]").view(np.int64) \
            // 1_000_000_000
        hop = sec // hop_s
        hops = np.repeat(hop, fan) - np.tile(
            np.arange(fan, dtype=np.int64), len(hop))
        vals = np.repeat(df["value"].to_numpy(dtype=np.float64), fan)
        g = pd.DataFrame({"h": hops, "v": vals}).groupby(
            "h", as_index=False).agg(n=("v", "size"), v=("v", "sum"))
        g["n"] = g["n"].astype(np.int64)
        return g

    agg = hash_groupby_agg(
        ds.map_batches(partial, batch_format="pandas"),
        keys=["h"], aggs={"n_events": ("n", "sum"),
                          "sum_value": ("v", "sum")}, num_parts=8)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "win_start_s": (df["h"] * hop_s).astype(np.int64),
            "n_events": df["n_events"].astype(np.int64),
            "sum_value": round_half_up(df["sum_value"], 2)})
        return out

    return (agg.map_batches(final, batch_format="pandas")
            .repartition(1).sort("win_start_s"))


def weekday_hour_profile(sf_dir: str) -> rd.Dataset:
    """Seasonality profile: event count and mean value per (ISO
    weekday, hour-of-day) cell — the 7x24 heatmap behind load-shaping
    and anomaly baselines. Partial (dow, hour, n, sum) folds per block;
    the exchange carries at most 168 keys x blocks rows. Output:
    (dow, hour, n_events, avg_value) by (dow, hour)."""
    from ..stages.hashagg import hash_groupby_agg

    ds = read_table(f"{sf_dir}/events.parquet", columns=["ts", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({
            "dow": (df["ts"].dt.dayofweek + 1).astype(np.int64),
            "hour": df["ts"].dt.hour.astype(np.int64),
            "v": df["value"].to_numpy(dtype=np.float64)})
        g = d.groupby(["dow", "hour"], as_index=False).agg(
            n=("v", "size"), s=("v", "sum"))
        g["n"] = g["n"].astype(np.int64)
        return g

    agg = hash_groupby_agg(
        ds.map_batches(partial, batch_format="pandas"),
        keys=["dow", "hour"], aggs={"n_events": ("n", "sum"),
                                    "s": ("s", "sum")}, num_parts=4)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["n_events"] = df["n_events"].astype(np.int64)
        df["avg_value"] = round_half_up(df["s"] / df["n_events"], 4)
        return df[["dow", "hour", "n_events", "avg_value"]]

    return (agg.map_batches(final, batch_format="pandas")
            .repartition(1).sort(["dow", "hour"]))


def audience_overlap_kmv(sf_dir: str, k: int = 256) -> "pa.Table":
    """Approximate audience overlap via KMV/theta distinct sketches
    (Beyer et al., SIGMOD 2007): estimated distinct users per event
    type plus pairwise union / intersection / Jaccard estimates — the
    sketch answer to :func:`audience_overlap` when exact distinct
    (user, type) pairs are too wide to shuffle at 100 TB. Unlike HLL,
    KMV supports intersections (the union sketch is a uniform sample
    of A∪B), which is exactly what the pairwise matrix needs.

    Plan: NO shuffle at all. Each block folds one k-minimum-values
    sketch per event type over its users' multiply-xorshift hashes
    (k x 8 bytes, |types|-bounded rows per block); sketches are
    associative, so the |types| x blocks partial table reduces on one
    tiny block and the k²-pair estimates run there. Output: (type_a,
    type_b, est_n_a, est_n_b, est_union, est_intersection,
    est_jaccard). Accuracy ~1/sqrt(k); pytest bounds it against the
    exact audience_overlap."""
    from ..functions.sketch import (kmv_estimate, kmv_from_hashes,
                                    kmv_intersection, kmv_jaccard,
                                    kmv_merge)

    ds = read_table(f"{sf_dir}/events.parquet",
                    columns=["user_id", "event_type"])
    mix = np.uint64(0x9E3779B97F4A7C15)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        # |event types| is a small constant; the per-type loop is
        # bounded by it, not by rows
        for t, g in df.groupby("event_type"):
            with np.errstate(over="ignore"):
                h = g["user_id"].to_numpy(dtype=np.int64) \
                    .astype(np.uint64) * mix
                h ^= h >> np.uint64(32)
                h *= mix
                h ^= h >> np.uint64(29)
            rows.append({"event_type": t,
                         "sk": kmv_from_hashes(h, k).tobytes()})
        return pd.DataFrame(rows, columns=["event_type", "sk"])

    part = (ds.map_batches(partial, batch_format="pandas")
            .repartition(1).to_pandas())

    merged: dict[str, np.ndarray] = {}
    for t, g in part.groupby("event_type"):
        sk = np.frombuffer(b"", dtype=np.uint64)
        for raw in g["sk"]:
            sk = kmv_merge(sk, np.frombuffer(raw, dtype=np.uint64), k)
        merged[t] = sk

    types = sorted(merged)
    out = {c: [] for c in ["type_a", "type_b", "est_n_a", "est_n_b",
                           "est_union", "est_intersection",
                           "est_jaccard"]}
    for i, ta in enumerate(types):
        for tb in types[i + 1:]:
            a, b = merged[ta], merged[tb]
            out["type_a"].append(ta)
            out["type_b"].append(tb)
            out["est_n_a"].append(round(kmv_estimate(a, k), 1))
            out["est_n_b"].append(round(kmv_estimate(b, k), 1))
            out["est_union"].append(
                round(kmv_estimate(kmv_merge(a, b, k), k), 1))
            out["est_intersection"].append(
                round(kmv_intersection(a, b, k), 1))
            out["est_jaccard"].append(round(kmv_jaccard(a, b, k), 4))
    return pa.Table.from_pydict({
        "type_a": pa.array(out["type_a"], pa.string()),
        "type_b": pa.array(out["type_b"], pa.string()),
        "est_n_a": pa.array(out["est_n_a"], pa.float64()),
        "est_n_b": pa.array(out["est_n_b"], pa.float64()),
        "est_union": pa.array(out["est_union"], pa.float64()),
        "est_intersection": pa.array(out["est_intersection"],
                                     pa.float64()),
        "est_jaccard": pa.array(out["est_jaccard"], pa.float64())})


def decayed_user_value(sf_dir: str, half_life_days: float = 7.0,
                       topk: int = 100) -> rd.Dataset:
    """Exponentially time-decayed user value at the corpus horizon:
    score(u) = Σ value_i · 2^(−(T−ts_i)/half_life) with T the global
    max event time — the recency-weighted LTV behind churn and
    ranking features. The decayed sum is associative once T is fixed,
    so the plan is two passes: a tiny max-ts fold to pin T, then
    per-block decayed partials into ONE user-keyed hash exchange;
    top-k emits through per-block partial top-k + one tiny sort.
    Output: (user_id, decayed_value) for the top-k users,
    by decayed_value desc, user_id asc."""
    from ..stages.hashagg import hash_groupby_agg

    path = f"{sf_dir}/events.parquet"
    ds = read_table(path, columns=["user_id", "ts", "value"])

    def max_ts(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {"m": np.array([ts.max()], dtype="datetime64[us]")},
            schema=pa.schema([("m", pa.timestamp("us"))]))

    part = ds.map_batches(max_ts, batch_format="pyarrow").to_pandas()
    horizon = part["m"].max().to_datetime64().astype(
        "datetime64[ns]").view(np.int64)
    hl_ns = half_life_days * 86_400e9

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        age = (horizon - df["ts"].to_numpy(
            dtype="datetime64[ns]").view(np.int64)) / hl_ns
        w = df["value"].to_numpy(dtype=np.float64) * np.exp2(-age)
        g = pd.DataFrame({"user_id": df["user_id"], "v": w}).groupby(
            "user_id", as_index=False)["v"].sum()
        return g

    agg = hash_groupby_agg(
        ds.map_batches(partial, batch_format="pandas"),
        keys=["user_id"], aggs={"v": ("v", "sum")}, num_parts=16)

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        # keep unrounded values through BOTH selections so the k
        # boundary matches the SQL ORDER BY on exact sums
        return df.sort_values(["v", "user_id"],
                              ascending=[False, True]).head(topk)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        d = local_topk(df).reset_index(drop=True)
        return pd.DataFrame({
            "user_id": d["user_id"].astype(np.int64),
            "decayed_value": round_half_up(d["v"], 4)})

    return (agg.map_batches(local_topk, batch_format="pandas")
            .repartition(1)
            .map_batches(final, batch_format="pandas"))


def session_duration_km(sf_dir: str, gap_minutes: int = 30
                        ) -> "pa.Table":
    """Kaplan-Meier survival curve of SESSION durations (Kaplan &
    Meier 1958): S(t) = \u03a0_{u\u2264t} (1 \u2212 d_u / n_u) over observed
    session-end times in minutes, with sessions still open near the
    corpus horizon right-censored \u2014 the censoring-aware dwell-time
    curve (naive mean session length is biased low by truncation).

    Plan: ONE coarse user-bucket exchange sessionizes (the
    session_conversion pattern \u2014 per-bucket vectorized gap scan); each
    bucket folds its sessions straight into a MINUTE-cardinality
    (t, n_churned, n_censored) histogram partial, so the exchange and
    the driver-side sequential product are bounded by the time domain,
    never by session count. The horizon is pinned by a tiny max-ts
    fold first. Output: (t_minutes, n_risk, n_events, survival) for
    minutes with \u22651 completed session, by t_minutes."""
    from ..sources.storage import rows_to_blocks
    from ..stages.hashagg import _stable_partition

    path = f"{sf_dir}/events.parquet"
    ds = read_table(path, columns=["user_id", "ts", "event_id"],
                    num_blocks=rows_to_blocks(path))
    gap_ns = np.int64(gap_minutes) * np.int64(60_000_000_000)

    def max_ts(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {"m": np.array([ts.max()], dtype="datetime64[us]")},
            schema=pa.schema([("m", pa.timestamp("us"))]))

    horizon = int(read_table(path, columns=["ts"])
                  .map_batches(max_ts, batch_format="pyarrow")
                  .to_pandas()["m"].max().to_datetime64()
                  .astype("datetime64[ns]").view(np.int64))

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_ubucket"] = _stable_partition(df, ["user_id"], 16)
        return df

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        u = g["user_id"].to_numpy(dtype=np.int64)
        ts = g["ts"].to_numpy(dtype="datetime64[ns]").view(np.int64)
        new_s = np.ones(len(g), dtype=np.int64)
        new_s[1:] = ((u[1:] != u[:-1])
                     | (ts[1:] - ts[:-1] > gap_ns)).astype(np.int64)
        sid = np.cumsum(new_s)
        per = pd.DataFrame({"sid": sid, "ts": ts}).groupby("sid").agg(
            st=("ts", "min"), en=("ts", "max"))
        dur = (per["en"].to_numpy() - per["st"].to_numpy()) \
            // np.int64(60_000_000_000)
        censored = per["en"].to_numpy() >= horizon - gap_ns
        hist = pd.DataFrame({
            "t": dur, "d": (~censored).astype(np.int64),
            "c": censored.astype(np.int64)}).groupby(
            "t", as_index=False).sum()
        return hist

    part = (ds.map_batches(tag, batch_format="pandas")
            .groupby("_ubucket")
            .map_groups(per_bucket, batch_format="pandas").to_pandas())

    hist = part.groupby("t", as_index=False).sum().sort_values("t")
    n_total = int((hist["d"] + hist["c"]).sum())
    dropped = np.concatenate(
        [[0], np.cumsum((hist["d"] + hist["c"]).to_numpy())[:-1]])
    n_risk = n_total - dropped
    with np.errstate(divide="ignore", invalid="ignore"):
        factors = 1.0 - hist["d"].to_numpy(dtype=np.float64) / n_risk
    surv = np.cumprod(factors)
    keep = hist["d"].to_numpy() > 0
    from ..functions.numeric import round_half_up as _r
    return pa.Table.from_pydict({
        "t_minutes": pa.array(hist["t"].to_numpy()[keep], pa.int64()),
        "n_risk": pa.array(n_risk[keep].astype(np.int64), pa.int64()),
        "n_events": pa.array(
            hist["d"].to_numpy()[keep].astype(np.int64), pa.int64()),
        "survival": pa.array(_r(surv[keep], 6), pa.float64())})


def event_type_lagged_xcorr(sf_dir: str, type_x: str = "click",
                            type_y: str = "purchase",
                            max_lag: int = 7) -> "pa.Table":
    """Lagged cross-correlation between two event types' daily counts:
    corr(x_d, y_{d+lag}) for lag 0..max_lag — the lead-lag screen
    (does click volume predict purchase volume days later?). Sibling
    of daily_value_acf, but across series. ONE (type, day) count
    exchange (calendar-bounded); the per-lag alignment joins days
    where BOTH series exist (inner-join semantics, documented) and
    the correlation is computed from exact INTEGER count moments —
    deterministic across block orders. Output: (lag, n_days, xcorr)
    by lag, rounded to 6."""
    ds = read_table(f"{sf_dir}/events.parquet",
                    columns=["ts", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"].isin([type_x, type_y])]
        df = df.assign(day=df["ts"].dt.floor("D"))
        return (df.groupby(["event_type", "day"], as_index=False)
                .size().rename(columns={"size": "n"}))

    daily = (ds.map_batches(partial, batch_format="pandas")
             .repartition(4).to_pandas())
    daily = daily.groupby(["event_type", "day"], as_index=False)[
        "n"].sum()

    def series(t: str) -> tuple[np.ndarray, np.ndarray]:
        g = daily[daily["event_type"] == t].sort_values("day")
        return (g["day"].to_numpy(dtype="datetime64[D]").astype(
            np.int64), g["n"].to_numpy(dtype=np.int64))

    dx, vx = series(type_x)
    dy, vy = series(type_y)

    lags, n_days, xc = [], [], []
    for lag in range(0, max_lag + 1):
        pos = np.searchsorted(dy, dx + lag)
        pos_c = np.clip(pos, 0, len(dy) - 1)
        ok = dy[pos_c] == dx + lag
        x = vx[ok].astype(np.float64)
        y = vy[pos_c[ok]].astype(np.float64)
        n = int(ok.sum())
        if n >= 2:
            sx, sy = x.sum(), y.sum()
            sxy = (x * y).sum()
            sxx, syy = (x * x).sum(), (y * y).sum()
            den = np.sqrt((sxx - sx * sx / n) * (syy - sy * sy / n))
            r = float((sxy - sx * sy / n) / den) if den > 0 else None
        else:
            r = None
        lags.append(lag)
        n_days.append(n)
        xc.append(round_half_up([r], 6)[0] if r is not None else None)

    return pa.Table.from_pydict({
        "lag": pa.array(lags, pa.int64()),
        "n_days": pa.array(n_days, pa.int64()),
        "xcorr": pa.array(xc, pa.float64())})


def ab_conversion_ztest(sf_dir: str) -> rd.Dataset:
    """Two-proportion pooled z-test on the deterministic A/B split of
    :func:`ab_test_report` — the significance statistic every
    experimentation pipeline reports next to the raw conversion
    rates: z = (p0 - p1) / sqrt(p_pool (1 - p_pool) (1/n0 + 1/n1)).

    Conversion is the scale-free per-user flag "more purchases than
    views" (an everyone-purchases corpus makes the has-any-purchase
    flag of ab_test_report degenerate at every scale).

    Plan: identical single user-cardinality exchange as
    ab_test_report (per-user count pair), a |variants| fold, and
    the closed-form finish on four integers. The normal-CDF p-value
    is deliberately left to the caller (no erf in ANSI SQL — the z
    statistic itself is the oracle-checkable surface). Output: one
    row (n0, n1, conv0, conv1, p0, p1, z) rounded to 6."""
    from ..stages.hashagg import hash_groupby_agg

    ds = read_table(f"{sf_dir}/events.parquet",
                    columns=["user_id", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        et = df["event_type"].to_numpy()
        return (pd.DataFrame({
            "user_id": df["user_id"].to_numpy(dtype=np.int64),
            "np_": (et == "purchase").astype(np.int64),
            "nv": (et == "view").astype(np.int64)})
            .groupby("user_id", as_index=False).sum())

    users = hash_groupby_agg(
        ds.map_batches(partial, batch_format="pandas"),
        ["user_id"], {"np_": ("np_", "sum"), "nv": ("nv", "sum")},
        num_parts=16)

    def to_variant(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].to_numpy(dtype=np.int64)
        with np.errstate(over="ignore"):
            var = ((u.astype(np.uint64) * np.uint64(2654435761))
                   % np.uint64(1 << 32) % np.uint64(2)).astype(
                       np.int64)
        conv = (df["np_"].to_numpy(np.int64)
                > df["nv"].to_numpy(np.int64)).astype(np.int64)
        return (pd.DataFrame({"variant": var,
                              "n_users": np.int64(1),
                              "n_converted": conv})
                .groupby("variant", as_index=False).sum())

    agg = hash_groupby_agg(
        users.map_batches(to_variant, batch_format="pandas"),
        ["variant"],
        {"n_users": ("n_users", "sum"),
         "n_converted": ("n_converted", "sum")}, num_parts=2)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        # ADVICE r03: a tiny/skewed corpus can hash every user to one
        # parity — reindex to both variants with NULL fill so the
        # missing arm's columns come out NULL (the oracle's
        # max(CASE...) semantics) instead of a ValueError unpack
        df = df.set_index("variant").reindex([0, 1])
        n0, n1 = df["n_users"].to_numpy(np.float64)
        c0, c1 = df["n_converted"].to_numpy(np.float64)
        if np.isnan(n0) or np.isnan(n1):
            return pd.DataFrame({
                "n0": [n0], "n1": [n1], "conv0": [c0], "conv1": [c1],
                "p0": [np.nan if np.isnan(n0) else
                       round_half_up(np.array([c0 / n0]), 6)[0]],
                "p1": [np.nan if np.isnan(n1) else
                       round_half_up(np.array([c1 / n1]), 6)[0]],
                "z": [np.nan]})
        p0, p1 = c0 / n0, c1 / n1
        pp = (c0 + c1) / (n0 + n1)
        # degenerate pools (all or none converted) have zero pooled
        # variance — report z = 0 instead of 0/0 (same CASE guard as
        # the SQL oracle)
        if pp <= 0.0 or pp >= 1.0:
            z = 0.0
        else:
            z = (p0 - p1) / np.sqrt(pp * (1.0 - pp)
                                    * (1.0 / n0 + 1.0 / n1))
        return pd.DataFrame({
            "n0": [np.int64(n0)], "n1": [np.int64(n1)],
            "conv0": [np.int64(c0)], "conv1": [np.int64(c1)],
            "p0": round_half_up(np.array([p0]), 6),
            "p1": round_half_up(np.array([p1]), 6),
            "z": round_half_up(np.array([z]), 6)})

    return agg.repartition(1).map_batches(finish,
                                          batch_format="pandas")

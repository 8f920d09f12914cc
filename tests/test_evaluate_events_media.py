"""Evaluation harness, event windows/sessions, media metadata —
cross-checked against DuckDB / pure-python references on sf0.001."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ["events", "documents"]:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


def test_char_acc_function():
    from granulate_char_ocr_ray.pipelines.evaluate import _char_acc

    assert _char_acc("ABC", "ABC") == 1.0
    assert _char_acc("ABC", "ABD") == pytest.approx(2 / 3)
    assert _char_acc("ABC", "CBA") == pytest.approx(1 / 3)
    assert _char_acc("AB", "ABCD") == pytest.approx(2 / 4)
    assert _char_acc("", "") == 1.0


def test_ocr_char_accuracy_degraded_docs():
    from granulate_char_ocr_ray.pipelines.evaluate import ocr_char_accuracy
    from granulate_char_ocr_ray.synth import word_for_doc

    df = ocr_char_accuracy(SF).to_pandas()
    for r in df.itertuples():
        d = int(r.doc_id[4:])
        assert r.expected == word_for_doc(d)
        if d % 7 == 0:
            assert r.recognized == r.expected[::-1]
        else:
            assert r.recognized == r.expected
            assert r.char_acc == 1.0 and r.word_acc == 1


def test_ocr_eval_stats_consistent_with_per_doc():
    from granulate_char_ocr_ray.pipelines.evaluate import (
        ocr_char_accuracy,
        ocr_eval_stats,
    )

    per_doc = ocr_char_accuracy(SF).to_pandas()
    stats = ocr_eval_stats(SF).to_pandas()
    assert len(stats) == 1
    assert stats["n_docs"].iloc[0] == len(per_doc)
    assert stats["mean_char_acc"].iloc[0] == pytest.approx(
        per_doc["char_acc"].mean(), abs=1e-4)
    assert stats["mean_word_acc"].iloc[0] == pytest.approx(
        per_doc["word_acc"].mean(), abs=1e-4)


def test_ocr_confusions_against_bruteforce():
    from granulate_char_ocr_ray.pipelines.evaluate import (
        ocr_char_accuracy,
        ocr_confusions,
    )

    per_doc = ocr_char_accuracy(SF).to_pandas()
    counts: dict[tuple[str, str], int] = {}
    for r in per_doc.itertuples():
        for a, b in zip(r.expected, r.recognized):
            if a != b:
                counts[(a, b)] = counts.get((a, b), 0) + 1
    got = ocr_confusions(SF).to_pandas()
    got_counts = {(r.expected_char, r.recognized_char): r.n for r in got.itertuples()}
    assert got_counts == counts
    assert got["n"].is_monotonic_decreasing


def test_events_hourly_matches_duckdb(con):
    from granulate_char_ocr_ray.pipelines.events import events_hourly

    got = events_hourly(SF).to_pandas()
    want = con.sql("""
        SELECT event_type, date_trunc('hour', ts) AS hour,
               CAST(count(*) AS BIGINT) AS n_events,
               round(sum(value), 2) AS sum_value
        FROM events GROUP BY 1, 2
    """).df()
    got = got.sort_values(["event_type", "hour"]).reset_index(drop=True)
    want = want.sort_values(["event_type", "hour"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)


def test_user_sessions_matches_duckdb(con):
    from granulate_char_ocr_ray.pipelines.events import user_sessions

    got = user_sessions(SF).to_pandas().sort_values("user_id").reset_index(drop=True)
    want = con.sql("""
        WITH o AS (
          SELECT user_id,
                 CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                      > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
          FROM events)
        SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
               CAST(1 + sum(brk) AS BIGINT) AS n_sessions
        FROM o GROUP BY user_id ORDER BY user_id
    """).df()
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)


def test_media_dimensions_closed_form():
    from granulate_char_ocr_ray.pipelines.media import media_dimensions

    got = media_dimensions(SF).to_pandas()
    assert (got["height"] == 64).all()
    n = got["media_ref"].str.len() - len("glyph:")
    assert (got["width"] == 80 * n + 16).all()
    assert (got["n_glyphs"] == n).all()


def test_media_jpeg_metadata_detects_modes():
    """Header-only JPEG metadata (VERDICT r03 #9): progressive-framed
    payloads (even doc ids) are detected with exact dimensions — no
    pixel decode, no empty-result swallow."""
    from granulate_char_ocr_ray.pipelines.media import media_jpeg_metadata

    got = media_jpeg_metadata(SF).to_pandas()
    ids = got["doc_id"].str[4:].astype(int)
    assert (ids % 3 == 0).all() and len(got) > 0
    assert (got["mode"] == np.where(ids % 2 == 0, "progressive",
                                    "baseline")).all()
    assert (got["height"] == 64).all()
    n = ids.astype(str).str.len()
    assert (got["width"] == 80 * n + 16).all()


def test_docs_without_media_anti_join():
    from granulate_char_ocr_ray.pipelines.media import docs_without_media

    got = docs_without_media(SF).to_pandas()
    ids = got["doc_id"].str[4:].astype(int)
    assert (ids % 3 != 0).all()
    import pyarrow.dataset as pads

    all_ids = pads.dataset(f"{SF}/documents.parquet").to_table(
        columns=["doc_id"]).column("doc_id").to_pylist()
    expected_n = sum(1 for d in all_ids if d % 3 != 0)
    assert len(got) == expected_n


def test_purchases_prev_click_matches_duckdb(con):
    from granulate_char_ocr_ray.pipelines.events import purchases_with_prev_click

    got = purchases_with_prev_click(SF).to_pandas().reset_index(drop=True)
    want = con.sql("""
        SELECT event_id, user_id, prev_click_value FROM (
          SELECT event_id, user_id, event_type,
                 LAST_VALUE(CASE WHEN event_type = 'click' THEN value END
                            IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS prev_click_value
          FROM events
        ) WHERE event_type = 'purchase' ORDER BY event_id
    """).df()
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)


def test_clicks_before_purchase_matches_duckdb(con):
    from granulate_char_ocr_ray.pipelines.events import clicks_before_purchase

    got = clicks_before_purchase(SF).to_pandas().reset_index(drop=True)
    want = con.sql("""
        SELECT e.event_id, e.user_id, CAST(count(c.event_id) AS BIGINT) AS n_clicks
        FROM events e
        LEFT JOIN events c
          ON c.user_id = e.user_id AND c.event_type = 'click'
         AND c.ts > e.ts - INTERVAL 60 MINUTE AND c.ts <= e.ts
        WHERE e.event_type = 'purchase'
        GROUP BY e.event_id, e.user_id ORDER BY e.event_id
    """).df()
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)


def test_docs_without_media_both_plans_identical():
    """Broadcast-searchsorted and Bloom+partitioned-join plans are
    hash-identical (size-threshold dispatch is a physical choice)."""
    import pandas as pd

    from granulate_char_ocr_ray.pipelines.media import docs_without_media

    bc = docs_without_media(SF, broadcast_threshold=10**9).to_pandas()
    bl = docs_without_media(SF, broadcast_threshold=0).to_pandas()
    pd.testing.assert_frame_equal(bc.reset_index(drop=True),
                                  bl.reset_index(drop=True))


def test_user_event_windows_matches_duckdb(con):
    from granulate_char_ocr_ray.pipelines.events import user_event_windows

    got = user_event_windows(SF).to_pandas()
    want = con.sql("""
        SELECT event_id, user_id, prev_value, cum_value_cents,
               movavg3_value FROM (
          SELECT event_id, user_id,
                 lag(value) OVER w AS prev_value,
                 CAST(SUM(CAST(round(value * 100) AS BIGINT))
                   OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS BIGINT) AS cum_value_cents,
                 round(SUM(CAST(round(value * 100) AS BIGINT))
                   OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                   / (100.0 * least(row_number() OVER w, 3)), 2)
                   AS movavg3_value
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ) ORDER BY event_id
    """).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True),
        check_dtype=False)
    # a user's first event has no lag value
    first = got.groupby("user_id").head(1)
    assert first["prev_value"].isna().all()


def test_events_pivot_matches_duckdb(con):
    from granulate_char_ocr_ray.pipelines.events import events_pivot

    got = events_pivot(SF).to_pandas()
    want = con.sql("""
        SELECT user_id,
               CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT)
                 AS n_click,
               CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT)
                 AS n_error,
               CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
                 AS n_purchase,
               CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT)
                 AS n_signup,
               CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT)
                 AS n_view
        FROM events GROUP BY user_id ORDER BY user_id
    """).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True),
        check_dtype=False)
    # pivot columns jointly account for every event
    n_events = con.sql("SELECT count(*) FROM events").fetchone()[0]
    assert int(got[[c for c in got.columns if c.startswith("n_")]]
               .to_numpy().sum()) == n_events


def test_ocr_cer_matches_duckdb_levenshtein(con):
    from granulate_char_ocr_ray.pipelines.evaluate import ocr_cer

    got = ocr_cer(SF).to_pandas().reset_index(drop=True)
    want = con.sql("""
        SELECT doc_id, expected, recognized,
               CAST(levenshtein(expected, recognized) AS BIGINT)
                 AS edit_dist,
               round(CAST(levenshtein(expected, recognized) AS DOUBLE)
                     / greatest(length(expected), 1), 4) AS cer
        FROM (
          SELECT 'doc-' || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS doc_id,
                 translate(CAST(doc_id AS VARCHAR),
                           '0123456789', 'ABCDEFGHIJ') AS expected,
                 CASE WHEN doc_id % 7 = 0
                      THEN reverse(translate(CAST(doc_id AS VARCHAR),
                                             '0123456789', 'ABCDEFGHIJ'))
                      ELSE translate(CAST(doc_id AS VARCHAR),
                                     '0123456789', 'ABCDEFGHIJ') END
                   AS recognized
          FROM documents
        ) ORDER BY doc_id
    """).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # degraded (reversed) docs have nonzero CER; clean docs are zero
    deg = got[got["expected"] != got["recognized"]]
    assert len(deg) > 0 and (deg["edit_dist"] > 0).all()
    clean = got[got["expected"] == got["recognized"]]
    assert (clean["edit_dist"] == 0).all()


def test_event_props_k_stats_json_extraction(con):
    from granulate_char_ocr_ray.pipelines.events import event_props_k_stats

    got = event_props_k_stats(SF).to_pandas().reset_index(drop=True)
    want = con.sql("""
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
               round(CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS DOUBLE)
                     / count(*), 2) AS avg_k
        FROM events GROUP BY event_type ORDER BY event_type
    """).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert (got["sum_k"] > 0).all()


def test_event_rate_anomalies_matches_bruteforce():
    import pandas as pd
    import pyarrow.dataset as pads
    from granulate_char_ocr_ray.pipelines.events import event_rate_anomalies

    got = event_rate_anomalies(SF).to_pandas().reset_index(drop=True)

    ev = pads.dataset(f"{SF}/events.parquet").to_table(
        columns=["event_type", "ts"]).to_pandas()
    ev["hour"] = ev["ts"].dt.floor("h")
    hourly = ev.groupby(["event_type", "hour"], as_index=False).agg(
        n_events=("ts", "size")).sort_values(
        ["event_type", "hour"]).reset_index(drop=True)
    rows = []
    for et, g in hourly.groupby("event_type"):
        n = g["n_events"].to_numpy()
        for i in range(1, len(g)):
            lo = max(0, i - 24)
            ts_, tn = int(n[lo:i].sum()), i - lo
            rows.append((et, g["hour"].iloc[i], int(n[i]),
                         round(ts_ / tn, 4), n[i] * tn > 2 * ts_))
    want = pd.DataFrame(rows, columns=[
        "event_type", "hour", "n_events", "trail_mean", "is_spike"])
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(
        got.astype({"n_events": "int64"}), want.astype({"n_events": "int64"}),
        check_dtype=False)


def test_semantic_decontaminate_matches_bruteforce():
    import numpy as np
    import pyarrow.dataset as pads
    from granulate_char_ocr_ray.pipelines.similarity import (
        semantic_decontaminate)

    got = semantic_decontaminate(SF).to_pandas()
    t = pads.dataset(f"{SF}/embeddings.parquet").to_table(
        columns=["vec_id", "embedding"]).to_pandas().sort_values("vec_id")
    m = np.array(t["embedding"].tolist(), dtype=np.float64)
    ids = t["vec_id"].to_numpy()
    bench = m[ids < 10]
    corpus, cids = m[ids >= 10], ids[ids >= 10]
    bn = bench / np.linalg.norm(bench, axis=1, keepdims=True)
    cn = corpus / np.linalg.norm(corpus, axis=1, keepdims=True)
    mc = np.round((cn @ bn.T).max(axis=1), 4)
    keep = mc >= 0.3
    assert got["vec_id"].tolist() == sorted(cids[keep].tolist())
    want = dict(zip(cids[keep], mc[keep]))
    for r in got.itertuples():
        assert abs(want[r.vec_id] - r.max_cos) < 1e-9


def test_image_phash_dups_matches_bruteforce():
    import itertools

    import numpy as np
    import pyarrow.dataset as pads
    from granulate_char_ocr_ray.functions.glyphs import decode_media_ref
    from granulate_char_ocr_ray.functions.image import phash64
    from granulate_char_ocr_ray.pipelines.media import image_phash_dups
    from granulate_char_ocr_ray.synth import derive_docs_batch

    got = image_phash_dups(SF).to_pandas()
    got_pairs = {(r.d1, r.d2): r.hamming for r in got.itertuples()}

    t = pads.dataset(f"{SF}/documents.parquet").to_table(
        columns=["doc_id", "text"])
    tab = derive_docs_batch(t.column("doc_id").to_numpy(),
                            t.column("text").to_pylist())
    items = []
    for did, row in zip(tab.column("doc_id").to_pylist(),
                        tab.column("spans").to_pylist()):
        for s in row:
            if s["kind"] == "media":
                img = decode_media_ref(s["media_ref"])
                items.append((did, int(phash64(img))))
    want = {}
    for (da, ha), (db, hb) in itertools.combinations(items, 2):
        d = bin(ha ^ hb).count("1")
        if d <= 7:
            d1, d2 = sorted((da, db))
            want[(d1, d2)] = d
    assert got_pairs == want
    assert len(want) > 0  # fixture must exercise the operator


def test_approx_distinct_users_by_type_accuracy():
    import pyarrow.dataset as pads
    from granulate_char_ocr_ray.pipelines.events import (
        approx_distinct_users_by_type)

    sf = "/root/testdata/sf0.001"
    got = approx_distinct_users_by_type(sf).to_pandas()
    df = pads.dataset(f"{sf}/events.parquet").to_table(
        columns=["event_type", "user_id"]).to_pandas()
    exact = df.groupby("event_type")["user_id"].nunique()
    assert set(got["event_type"]) == set(exact.index)
    for row in got.itertuples():
        e = exact[row.event_type]
        # p=12 HLL: ~1.6% std error; 5% bound is > 3 sigma
        assert abs(row.approx_distinct - e) <= max(0.05 * e, 1), \
            row.event_type


def test_keyframe_stage_picks_highest_motion_frames():
    import base64

    import numpy as np
    import pyarrow as pa
    from granulate_char_ocr_ray.functions.codecs import encode_frames
    from granulate_char_ocr_ray.pipelines.media import (
        KeyframeStage, media_keyframes)

    # frames: constant 0, 0 (no motion), jump to 200 (big), 201
    # (tiny), jump to 50 (medium) -> top-2 diffs are frames 2 and 4
    levels = [0, 0, 200, 201, 50]
    frames = [np.full((4, 4), v, dtype=np.uint8) for v in levels]
    blob = "framesb64:" + base64.b64encode(encode_frames(frames)).decode()
    batch = pa.Table.from_pydict(
        {"doc_id": ["d0"], "media_ref": [blob]})
    out = KeyframeStage(k=3)(batch).to_pandas()
    assert out["n_frames"].iloc[0] == 5
    assert out["keyframes"].iloc[0] == "0,2,4"

    # tie-break: equal diffs resolve to the LOWER index
    frames = [np.full((4, 4), v, dtype=np.uint8) for v in [0, 10, 20, 30]]
    blob = "framesb64:" + base64.b64encode(encode_frames(frames)).decode()
    out = KeyframeStage(k=2)(pa.Table.from_pydict(
        {"doc_id": ["d1"], "media_ref": [blob]})).to_pandas()
    assert out["keyframes"].iloc[0] == "0,1"

    # pipeline end-to-end: every media doc emits ascending indices
    got = media_keyframes("/root/testdata/sf0.001").to_pandas()
    assert len(got) > 0
    for row in got.itertuples():
        idx = [int(i) for i in row.keyframes.split(",")]
        assert idx[0] == 0 and idx == sorted(idx)
        assert len(idx) <= min(3, row.n_frames)


def test_events_with_last_order_boundary_semantics(tmp_path):
    """The fixture's order dates all precede the event window, so every
    event matches the user's LAST order — exercise the real as-of
    boundaries (exact-match inclusive, strictly-later excluded, no
    order at all -> NULL) on a synthetic interleaved pair of tables."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    from granulate_char_ocr_ray.pipelines.events import (
        events_with_last_order)

    d = str(tmp_path)
    ts = lambda s: np.datetime64(f"2024-01-{s:02d}", "us")
    events = pd.DataFrame({
        "event_id": np.arange(5, dtype=np.int64),
        "user_id": np.array([1, 1, 1, 2, 3], dtype=np.int64),
        "ts": [ts(5), ts(10), ts(20), ts(7), ts(9)],
        "event_type": ["view"] * 5,
        "value": [0.0] * 5,
        "props": ["{}"] * 5,
    })
    orders = pd.DataFrame({
        "o_orderkey": np.arange(4, dtype=np.int64),
        "o_custkey": np.array([1, 1, 2, 2], dtype=np.int64),
        "o_orderstatus": ["F"] * 4,
        "o_totalprice": [100.25, 200.5, 300.75, 400.0],
        "o_orderdate": [ts(10), ts(15), ts(8), ts(7)],
        "o_orderpriority": ["1-URGENT"] * 4,
    })
    pq.write_table(pa.Table.from_pandas(events, preserve_index=False),
                   f"{d}/events.parquet")
    pq.write_table(pa.Table.from_pandas(orders, preserve_index=False),
                   f"{d}/orders.parquet")

    got = events_with_last_order(d).to_pandas()
    # event 0 (day 5): user 1 has no order yet -> NULL
    assert pd.isna(got.loc[0, "last_order_total"])
    # event 1 (day 10): exact-date order matches (>= is inclusive)
    assert got.loc[1, "last_order_total"] == 100.25
    # event 2 (day 20): picks day-15 order, not the earlier one
    assert got.loc[2, "last_order_total"] == 200.5
    # event 3 (user 2, day 7): day-8 order is LATER -> only day-7
    assert got.loc[3, "last_order_total"] == 400.0
    # event 4 (user 3): no orders at all -> NULL
    assert pd.isna(got.loc[4, "last_order_total"])


def test_markov_removal_effect_tiny_chain(tmp_path):
    """Hand-built journeys -> independently coded absorbing-chain
    oracle (journeys enumerated as tuples, not extracted from pairs)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    # user 0: view -> purchase            (converts via view)
    # user 1: view -> click -> purchase   (converts via view+click)
    # user 2: click -> (null)
    # user 3: view -> (null)
    rows = [
        (0, 0, "view"), (1, 0, "purchase"),
        (2, 1, "view"), (3, 1, "click"), (4, 1, "purchase"),
        (5, 2, "click"),
        (6, 3, "view"),
    ]
    base = pd.Timestamp("2024-01-01")
    df = pd.DataFrame({
        "event_id": [r[0] for r in rows],
        "user_id": [r[1] for r in rows],
        "ts": [base + pd.Timedelta(minutes=r[0]) for r in rows],
        "event_type": [r[2] for r in rows],
        "value": 1.0,
    })
    pq.write_table(pa.Table.from_pandas(df),
                   str(tmp_path / "events.parquet"))

    from granulate_char_ocr_ray.pipelines.events import (
        markov_removal_effect)

    got = markov_removal_effect(str(tmp_path))

    # independent oracle: journeys as state tuples
    journeys = [("start", "view", "conversion"),
                ("start", "view", "click", "conversion"),
                ("start", "click", "null"),
                ("start", "view", "null")]
    states = ["start", "click", "view"]
    idx = {s: i for i, s in enumerate(states)}

    def conv(removed):
        import numpy as np
        k = len(states)
        q = np.zeros((k, k)); r = np.zeros(k); tot = np.zeros(k)
        for j in journeys:
            for a, b in zip(j, j[1:]):
                if a in ("conversion", "null") or a == removed:
                    continue
                tot[idx[a]] += 1
                if b == removed or b == "null":
                    continue
                if b == "conversion":
                    r[idx[a]] += 1
                else:
                    q[idx[a], idx[b]] += 1
        tot[tot == 0] = 1
        q /= tot[:, None]; r /= tot
        return float(np.linalg.solve(np.eye(k) - q, r)[0])

    base_p = conv(None)
    for ch in ["click", "view"]:
        want = 1.0 - conv(ch) / base_p
        row = got[got["channel"] == ch]
        assert len(row) == 1
        assert row["removal_effect"].iloc[0] == pytest.approx(want,
                                                              abs=1e-6)
    # attribution shares sum to 1 over positive effects
    assert got["attribution"].sum() == pytest.approx(1.0, abs=1e-5)


def test_doc_row_numbers_fallback_on_unsorted_blocks(tmp_path):
    """Shuffled doc_ids across row groups force the sort fallback; the
    assignment must still be the exact global row_number."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.RandomState(7)
    ids = rng.permutation(200).astype(np.int64)
    t = pa.table({"doc_id": ids,
                  "text": ["x"] * 200,
                  "lang": ["en"] * 200,
                  "source": ["s"] * 200,
                  "n_chars": np.ones(200, dtype=np.int64)})
    pq.write_table(t, str(tmp_path / "documents.parquet"),
                   row_group_size=16)

    from granulate_char_ocr_ray.pipelines.analysis import doc_row_numbers

    got = doc_row_numbers(str(tmp_path)).to_pandas()
    assert list(got["doc_id"]) == sorted(ids.tolist())
    assert list(got["rn"]) == list(range(1, 201))


def test_session_duration_km_properties():
    """KM survival is in [0,1], non-increasing, n_risk strictly
    decreasing, and the first factor equals 1 - d_0/n_total."""
    from granulate_char_ocr_ray.pipelines.events import (
        session_duration_km)

    got = session_duration_km(SF).to_pandas()
    assert len(got) > 0
    s = got["survival"].to_numpy()
    assert (s >= 0).all() and (s <= 1).all()
    assert (np.diff(s) <= 1e-12).all()
    nr = got["n_risk"].to_numpy()
    assert (np.diff(nr) < 0).all()
    assert (got["n_events"].to_numpy() > 0).all()
    d0, n0 = got["n_events"].iloc[0], got["n_risk"].iloc[0]
    assert s[0] == pytest.approx(1.0 - d0 / n0, abs=1e-6)


def test_interarrival_exp_fit_definition():
    """KS + MLE match a direct numpy computation on the raw events."""
    from granulate_char_ocr_ray.pipelines.events import (
        interarrival_exp_fit)

    got = interarrival_exp_fit(SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "event_id"])
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    ts = ev["ts"].to_numpy("datetime64[us]").astype(np.int64)
    u = ev["user_id"].to_numpy()
    gaps = ((ts[1:] - ts[:-1]) // 1_000_000)[u[1:] == u[:-1]]
    n = len(gaps)
    mean = gaps.sum() / n
    xs = np.sort(gaps).astype(np.float64)
    sec, c = np.unique(xs, return_counts=True)
    cum = np.cumsum(c)
    cdf = 1.0 - np.exp(-(sec / mean))
    ks = max(np.abs(cum / n - cdf).max(),
             np.abs((cum - c) / n - cdf).max())
    assert int(got["n_gaps"][0]) == n
    assert abs(got["mean_gap_s"][0] - mean) < 1e-4
    assert abs(got["ks_stat"][0] - ks) < 1e-6
    assert 0.0 <= got["ks_stat"][0] <= 1.0

"""Checkpoint / lineage / resume (FIXTURES.md §4): a killed job resumes
from the last committed partition and produces output identical to an
uninterrupted run."""

import os

import pyarrow.parquet as pq
import pytest

from granulate_char_ocr_ray import oracle, synth
from granulate_char_ocr_ray.sources.storage import write_arrow
from granulate_char_ocr_ray.state.checkpoint import (
    committed_partitions,
    partition_of,
    read_job_output,
    run_extract_job,
)


@pytest.fixture()
def docs_path(tmp_path):
    p = str(tmp_path / "docs.parquet")
    write_arrow(synth.docs_interleaved(60), p)
    return p


def test_kill_and_resume_identical_output(docs_path, tmp_path):
    out_killed = str(tmp_path / "out_killed")
    out_clean = str(tmp_path / "out_clean")

    # uninterrupted reference run
    s0 = run_extract_job(docs_path, out_clean, num_partitions=4, concurrency=2)
    assert sorted(s0["processed"]) == [0, 1, 2, 3]

    # killed after 2 partitions
    s1 = run_extract_job(docs_path, out_killed, num_partitions=4,
                         concurrency=2, stop_after=2)
    assert len(s1["processed"]) == 2
    manifest = committed_partitions(out_killed)
    assert sorted(manifest) == sorted(s1["processed"])

    # resume: must skip the committed partitions and finish the rest
    s2 = run_extract_job(docs_path, out_killed, num_partitions=4, concurrency=2)
    assert sorted(s2["skipped"]) == sorted(s1["processed"])
    assert sorted(s1["processed"] + s2["processed"]) == [0, 1, 2, 3]

    got = read_job_output(out_killed)
    want = read_job_output(out_clean)
    assert got.select(["doc_id", "order", "kind", "text", "media_ref"]).equals(
        want.select(["doc_id", "order", "kind", "text", "media_ref"])
    )

    # and both equal the oracle
    expected = oracle.extract_spans_table(synth.docs_interleaved(60))
    assert got.select(expected.column_names).equals(expected)


def test_manifest_lineage_rows(docs_path, tmp_path):
    out = str(tmp_path / "out")
    run_extract_job(docs_path, out, num_partitions=3, concurrency=2)
    manifest = committed_partitions(out)
    assert sorted(manifest) == [0, 1, 2]
    table = oracle.extract_spans_table(synth.docs_interleaved(60))
    doc_ids = set(table.column("doc_id").to_pylist())
    for pid, row in manifest.items():
        part_docs = {d for d in doc_ids if partition_of(d, 3) == pid}
        assert row["docs"] == len(part_docs)
        assert row["state"] == "committed"
        assert row["wall_s"] > 0
        assert row["spans"] > 0
        part_file_rows = pq.read_table(os.path.join(out, f"part={pid}")).num_rows
        assert part_file_rows == row["spans"]
    assert sum(r["spans"] for r in manifest.values()) == table.num_rows


def test_rerun_committed_is_idempotent(docs_path, tmp_path):
    out = str(tmp_path / "out")
    run_extract_job(docs_path, out, num_partitions=2, concurrency=2)
    before = read_job_output(out)
    # resume=False forces reprocessing everything; output must not change
    run_extract_job(docs_path, out, num_partitions=2, concurrency=2, resume=False)
    after = read_job_output(out)
    assert before.equals(after)


def test_resume_with_different_partition_count_rejected(docs_path, tmp_path):
    out = str(tmp_path / "out")
    run_extract_job(docs_path, out, num_partitions=4, concurrency=2, stop_after=2)
    with pytest.raises(ValueError, match="num_partitions"):
        run_extract_job(docs_path, out, num_partitions=8, concurrency=2)


def test_staged_input_matches_unstaged_and_resumes(tmp_path, docs_path):
    """stage_input=True (single input scan, hive-pruned slices) yields
    byte-identical output to the O(P)-rescan path, and a killed staged
    run resumes correctly reusing the staged layout."""
    out_a = str(tmp_path / "unstaged")
    out_b = str(tmp_path / "staged")
    out_c = str(tmp_path / "staged_killed")
    run_extract_job(docs_path, out_a, num_partitions=4, concurrency=2)
    run_extract_job(docs_path, out_b, num_partitions=4, concurrency=2,
                    stage_input=True)
    assert read_job_output(out_b).equals(read_job_output(out_a))
    import os
    assert os.path.isdir(os.path.join(out_b, "_staged"))

    s1 = run_extract_job(docs_path, out_c, num_partitions=4, concurrency=2,
                         stage_input=True, stop_after=2)
    assert len(s1["processed"]) == 2
    s2 = run_extract_job(docs_path, out_c, num_partitions=4, concurrency=2,
                         stage_input=True)
    assert sorted(s2["skipped"]) == sorted(s1["processed"])
    assert read_job_output(out_c).equals(read_job_output(out_a))


def test_generic_transform_job_kill_and_resume(docs_path, tmp_path):
    """The checkpoint harness is pipeline-agnostic: a custom transform
    (doc-level token-count projection) runs partition-by-partition,
    survives a kill, and the resumed output is byte-identical to an
    uninterrupted run."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def span_count_transform(docs):
        def count(batch: pa.Table) -> pa.Table:
            n = pc.list_value_length(batch.column("spans"))
            return pa.Table.from_arrays(
                [batch.column("doc_id"), pc.cast(n, pa.int64())],
                names=["doc_id", "n_spans"])

        return docs.map_batches(count, batch_format="pyarrow")

    out_clean = str(tmp_path / "t_clean")
    out_killed = str(tmp_path / "t_killed")

    s0 = run_extract_job(docs_path, out_clean, num_partitions=4,
                         transform=span_count_transform)
    assert sorted(s0["processed"]) == [0, 1, 2, 3]

    s1 = run_extract_job(docs_path, out_killed, num_partitions=4,
                         transform=span_count_transform, stop_after=2)
    assert len(s1["processed"]) == 2
    s2 = run_extract_job(docs_path, out_killed, num_partitions=4,
                         transform=span_count_transform)
    assert sorted(s1["processed"] + s2["processed"]) == [0, 1, 2, 3]
    assert s2["skipped"] == s1["processed"]

    a = read_job_output(out_clean).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    b = read_job_output(out_killed).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert a.equals(b)
    # lineage rows carry generic metrics (docs == distinct doc_ids)
    man = committed_partitions(out_killed)
    assert sum(r["docs"] for r in man.values()) == 60


def test_dedup_job_kill_and_resume(tmp_path):
    """VERDICT r04 #7: the end-to-end checkpointed dedup job — decision
    drop-set committed once, apply phase killed after 1 partition,
    resumed — equals (a) an uninterrupted dedup job and (b) the
    non-checkpointed dedup_survivors pipeline on the same pair tier;
    the decision artifact is NOT recomputed on resume."""
    import pandas as pd

    from granulate_char_ocr_ray.pipelines.dedup import dedup_survivors
    from granulate_char_ocr_ray.state.checkpoint import run_dedup_job

    sf = "/root/testdata/sf0.001"
    out_clean = str(tmp_path / "d_clean")
    out_killed = str(tmp_path / "d_killed")

    # out_clean runs UNSTAGED; out_killed uses the staged default —
    # their equality below also pins the two input paths identical
    s0 = run_dedup_job(sf, out_clean, pair_source="ngram",
                       num_partitions=4, stage_input=False)
    assert sorted(s0["processed"]) == [0, 1, 2, 3]

    s1 = run_dedup_job(sf, out_killed, pair_source="ngram",
                       num_partitions=4, stop_after=1)
    assert len(s1["processed"]) == 1
    meta = str(tmp_path / "d_killed" / "_dedup_state" / "meta.json")
    mtime = os.path.getmtime(meta)
    s2 = run_dedup_job(sf, out_killed, pair_source="ngram",
                       num_partitions=4)
    assert s2["skipped"] == s1["processed"]
    assert sorted(s1["processed"] + s2["processed"]) == [0, 1, 2, 3]
    assert os.path.getmtime(meta) == mtime  # decision reused, not redone

    a = read_job_output(out_clean).to_pandas()
    b = read_job_output(out_killed).to_pandas()
    pd.testing.assert_frame_equal(a, b)
    want = dedup_survivors(sf).to_pandas()["doc_id"].tolist()
    assert sorted(a["doc_id"].tolist()) == want
    # surviving rows keep their text payload
    assert a["text"].notna().all()


def test_dedup_job_state_mismatch_rejected(tmp_path):
    from granulate_char_ocr_ray.state.checkpoint import run_dedup_job

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "d_mismatch")
    run_dedup_job(sf, out, pair_source="ngram", num_partitions=4,
                  stop_after=0)
    with pytest.raises(ValueError, match="mismatched drop-set"):
        run_dedup_job(sf, out, pair_source="ngram", num_partitions=8)


def test_clustered_write_prunes_row_groups(tmp_path):
    """write_clustered sorts by the key before writing, so a range
    predicate selects a small fraction of row groups; the same data
    written unsorted (hash-scattered) selects nearly all of them."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.dataset as pads
    import ray.data as rd

    from granulate_char_ocr_ray.sources.storage import (
        pruning_stats, write_clustered)

    n = 100_000
    rng = np.random.default_rng(7)
    t = pa.table({"k": rng.permutation(n).astype("int64"),
                  "v": np.arange(n, dtype="int64")})
    ds = rd.from_arrow(t).repartition(4)

    clustered = str(tmp_path / "clustered")
    scattered = str(tmp_path / "scattered")
    write_clustered(ds, clustered, "k", row_group_size=5_000)
    ds.write_parquet(scattered, row_group_size=5_000)

    pred = (pads.field("k") >= 10_000) & (pads.field("k") < 15_000)
    s_clu = pruning_stats(clustered, pred)
    s_sca = pruning_stats(scattered, pred)
    assert s_clu["total_rows"] == n and s_sca["total_rows"] == n
    # the clustered layout prunes to a handful of groups; the scattered
    # layout must touch (nearly) every group for the same predicate
    assert s_clu["selected_row_groups"] * 4 <= s_clu["total_row_groups"]
    assert s_sca["selected_row_groups"] * 2 >= s_sca["total_row_groups"]
    assert (s_clu["selected_row_groups"]
            < s_sca["selected_row_groups"])


def test_compact_job_output_preserves_content(docs_path, tmp_path):
    from granulate_char_ocr_ray.state.checkpoint import compact_job_output

    out = str(tmp_path / "out")
    run_extract_job(docs_path, out, num_partitions=6, concurrency=2)
    before = read_job_output(out)
    stats = compact_job_output(out, target_rows_per_file=10_000)
    assert stats["rows"] == before.num_rows
    assert stats["files_after"] <= stats["files_before"]
    assert stats["files_after"] == 1  # tiny corpus -> one file
    compacted = pq.read_table(os.path.join(out, "_compacted"))
    a = before.to_pandas().sort_values(["doc_id", "order"]).reset_index(
        drop=True)
    b = (compacted.to_pandas()[a.columns.tolist()]
         .sort_values(["doc_id", "order"]).reset_index(drop=True))
    assert a.equals(b)


def test_zordered_write_prunes_on_both_columns(tmp_path):
    """write_zordered sorts by the Morton interleave of two keys, so a
    range predicate on EITHER column prunes row groups; a single-key
    clustered layout only serves its own sort key."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq
    import ray.data as rd

    from granulate_char_ocr_ray.sources.storage import (
        pruning_stats, write_clustered, write_zordered)

    n = 100_000
    rng = np.random.default_rng(11)
    t = pa.table({"a": rng.permutation(n).astype("int64"),
                  "b": rng.permutation(n).astype("int64"),
                  "v": np.arange(n, dtype="int64")})
    ds = rd.from_arrow(t).repartition(4)

    zordered = str(tmp_path / "zordered")
    one_key = str(tmp_path / "one_key")
    write_zordered(ds, zordered, "a", "b", row_group_size=5_000)
    write_clustered(ds, one_key, "a", row_group_size=5_000)

    # content identity: same rows, z-key helper column dropped
    za = pq.read_table(zordered).to_pandas().sort_values("v")
    assert list(za.columns) == ["a", "b", "v"]
    assert (za["a"].to_numpy()
            == t["a"].to_numpy()[za["v"].to_numpy()]).all()

    pred_a = (pads.field("a") >= 10_000) & (pads.field("a") < 15_000)
    pred_b = (pads.field("b") >= 10_000) & (pads.field("b") < 15_000)
    z_a = pruning_stats(zordered, pred_a)
    z_b = pruning_stats(zordered, pred_b)
    k_b = pruning_stats(one_key, pred_b)
    # z-order prunes meaningfully on BOTH axes ...
    assert z_a["selected_row_groups"] * 2 <= z_a["total_row_groups"]
    assert z_b["selected_row_groups"] * 2 <= z_b["total_row_groups"]
    # ... while the single-key layout cannot prune the other axis
    assert k_b["selected_row_groups"] * 2 >= k_b["total_row_groups"]


def test_zordered_write_is_block_layout_invariant(tmp_path):
    """ADVICE r02 (medium): quantization must use GLOBAL column ranges.
    With per-batch ranges, pre-sorted input (each block holding a
    disjoint slice of `a`) produced z-keys on incomparable scales and a
    broken global Morton order. Global ranges make the written row
    order identical regardless of how the input was blocked."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from granulate_char_ocr_ray.sources.storage import write_zordered

    n = 50_000  # <= 2^16 so quantization is injective -> unique z-keys
    rng = np.random.default_rng(12)
    a = rng.permutation(n).astype("int64")
    b = rng.permutation(n).astype("int64")
    t = pa.table({"a": a, "b": b, "v": np.arange(n, dtype="int64")})
    t_sorted = t.sort_by("a")  # blocks get disjoint `a` ranges

    out_shuf = str(tmp_path / "z_shuffled")
    out_sort = str(tmp_path / "z_presorted")
    write_zordered(rd.from_arrow(t).repartition(4), out_shuf, "a", "b",
                   row_group_size=2_000)
    write_zordered(rd.from_arrow(t_sorted).repartition(4), out_sort, "a",
                   "b", row_group_size=2_000)

    v_shuf = pq.read_table(out_shuf).column("v").to_numpy()
    v_sort = pq.read_table(out_sort).column("v").to_numpy()
    assert (v_shuf == v_sort).all()


def test_expr_to_sql_matches_pyarrow_semantics():
    """expr_to_sql (the lance filter pushdown translation) must select
    exactly the rows the pyarrow dataset expression selects — validated
    by running the translated SQL through DuckDB on the same table."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.dataset as pads

    from granulate_char_ocr_ray.sources.storage import expr_to_sql

    n = 1000
    rng = np.random.default_rng(7)
    tbl = pa.table({
        "a": rng.integers(0, 50, n),
        "b": rng.random(n) * 10,
        "flag": rng.choice(["R", "N", "A"], n),
        "ts": pa.array(
            np.datetime64("1995-01-01", "us")
            + rng.integers(0, 4 * 365, n) * np.timedelta64(1, "D"),
            pa.timestamp("us")),
    })
    exprs = [
        pads.field("a") <= 20,
        pads.field("flag") == "R",
        pads.field("flag") != "1-URGENT",
        (pads.field("a") >= 10) & (pads.field("b") < 2.5),
        (pads.field("ts") >= np.datetime64("1996-01-01", "us"))
        & (pads.field("ts") < np.datetime64("1997-06-15", "us")),
        ((pads.field("a") >= 1) & (pads.field("a") < 40))
        & (pads.field("flag") == "N"),
        (pads.field("a") == 3) | (pads.field("flag") == "A"),
    ]
    con = duckdb.connect()
    con.register("t", tbl)
    for e in exprs:
        sql = expr_to_sql(e)
        want = pads.dataset(tbl).to_table(filter=e).num_rows
        got = con.sql(f"SELECT count(*) AS c FROM t WHERE {sql}").df()["c"][0]
        assert got == want, (str(e), sql, got, want)

    import pytest
    with pytest.raises(NotImplementedError):
        expr_to_sql(pads.field("a").isin([1, 2, 3]))


def test_expr_to_sql_covers_every_repo_filter_form():
    """Contract (VERDICT r03 #8): the lance pushdown translator must
    round-trip EVERY filter form the repo's own reads emit. Forms
    enumerated from all `read_table(filter_expr=...)` call sites
    (relational.py:42,245,317,334,995,1575,1695,1744,1774,1908,2106,
    2222,2283,2495,2691,3165,6015,6085): ts <=, ts-range & ts-range,
    ts < / >, string == / !=, and conjunctions thereof. If a new
    call-site form appears, add it here — an untranslatable predicate
    must raise, never silently full-scan."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.dataset as pads

    from granulate_char_ocr_ray.sources.storage import expr_to_sql

    lo = np.datetime64("1994-01-01", "us")
    hi = np.datetime64("1995-01-01", "us")
    site_forms = [
        # q1: field <= fractional-seconds cutoff (relational.py:42)
        pads.field("ts") <= np.datetime64("1998-09-02T23:59:59.999999"),
        # q6/q5/...: (field >= lo) & (field < hi) (relational.py:245)
        (pads.field("ts") >= lo) & (pads.field("ts") < hi),
        # field < ts / field > ts (relational.py:317,334)
        pads.field("ts") < hi,
        pads.field("ts") > lo,
        # string equality / inequality (relational.py:1575,2222,2495)
        pads.field("flag") == "R",
        pads.field("flag") != "1-URGENT",
    ]
    n = 500
    rng = np.random.default_rng(11)
    tbl = pa.table({
        "flag": rng.choice(["R", "N", "A"], n),
        "ts": pa.array(
            np.datetime64("1993-01-01", "us")
            + rng.integers(0, 6 * 365, n) * np.timedelta64(1, "D"),
            pa.timestamp("us")),
    })
    con = duckdb.connect()
    con.register("t", tbl)
    for e in site_forms:
        sql = expr_to_sql(e)
        want = pads.dataset(tbl).to_table(filter=e).num_rows
        got = con.sql(
            f"SELECT count(*) AS c FROM t WHERE {sql}").df()["c"][0]
        assert got == want, (str(e), sql, got, want)


def test_profile_stats_parses_operators(ray_session):
    import ray.data as rd

    from granulate_char_ocr_ray.state.metrics import profile_dataset

    ds = rd.range(1000).map_batches(lambda b: b)
    prof = profile_dataset(ds)
    assert len(prof) >= 1
    assert (prof["wall_s"] >= 0).all()
    assert prof["rows_out"].iloc[-1] == 1000
    assert prof["operator"].str.contains("MapBatches").any()

"""Checkpointed, resumable extraction job with per-partition lineage.

Design (north rule; no reference analog — the reference's only resume
is a training warm-start, ``retrain_with_new_data.py:188-193``):

- Documents are hash-range-partitioned: ``partition_id =
  crc32(doc_id) % num_partitions``, computed at the read (stable across
  processes — never Python ``hash()``).
- Each partition runs as its own streaming pipeline and writes to
  ``out_dir/part={pid}/`` ATOMICALLY: write to a tmp dir, fsync-free
  directory rename, then append one manifest row (the commit record) to
  ``out_dir/_manifest/part-{pid}.parquet``.
- Resume: scan the manifest, skip partitions with state='committed'.
  A killed run re-processes only its uncommitted partitions; rerunning
  a committed partition is idempotent (same input slice, deterministic
  ops, directory overwrite).
- Lineage + metrics per partition: docs/spans/glyphs counts, wall time,
  per-stage metrics JSON (CHECKPOINT_SCHEMA).

On a multi-node cluster each partition is itself fully parallel (the
pipeline fans out over blocks); partition granularity only bounds the
re-processing unit after a failure.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
import zlib
from datetime import datetime, timezone

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from ..schema import CHECKPOINT_SCHEMA


def partition_of(doc_id: str, num_partitions: int) -> int:
    return zlib.crc32(doc_id.encode("utf-8")) % num_partitions


def _manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest")


def committed_partitions(out_dir: str) -> dict[int, dict]:
    """partition_id -> manifest row dict for committed partitions."""
    mdir = _manifest_dir(out_dir)
    if not os.path.isdir(mdir):
        return {}
    out: dict[int, dict] = {}
    for f in sorted(os.listdir(mdir)):
        if not f.endswith(".parquet"):
            continue
        for row in pq.read_table(os.path.join(mdir, f)).to_pylist():
            if row["state"] == "committed":
                out[row["partition_id"]] = row
    return out


def _commit_manifest_row(out_dir: str, row: dict) -> None:
    mdir = _manifest_dir(out_dir)
    os.makedirs(mdir, exist_ok=True)
    table = pa.Table.from_pylist([row], schema=CHECKPOINT_SCHEMA)
    tmp = os.path.join(mdir, f".tmp-{row['partition_id']}-{row['run_id']}.parquet")
    pq.write_table(table, tmp)
    os.replace(tmp, os.path.join(mdir, f"part-{row['partition_id']}.parquet"))


def run_extract_job(
    input_path: str,
    out_dir: str,
    *,
    num_partitions: int = 8,
    run_id: str | None = None,
    resume: bool = True,
    mode: str = "fused",
    concurrency: int | tuple[int, int] = (1, 8),
    stop_after: int | None = None,
) -> dict:
    """Run the extraction pipeline partition-by-partition with commits.

    ``stop_after`` processes at most that many (uncommitted) partitions
    then returns — the test hook simulating a killed job. Returns a
    summary dict {run_id, processed, skipped, partitions}.
    """
    from ..pipelines.extract import extract_spans, read_docs

    run_id = run_id or uuid.uuid4().hex[:12]
    if not resume and os.path.isdir(out_dir):
        # fresh run into an existing out_dir: stale part=*/manifest
        # entries from a previous (possibly differently-partitioned) run
        # would otherwise survive and be silently concatenated by
        # read_job_output (ADVICE r01) — remove them up front
        for d in os.listdir(out_dir):
            if d.startswith("part=") or d == "_manifest" or d.startswith(".tmp-"):
                shutil.rmtree(os.path.join(out_dir, d), ignore_errors=True)
    done = committed_partitions(out_dir) if resume else {}
    # a manifest written under a different partition count denotes
    # DIFFERENT document subsets per pid — resuming across it would
    # silently skip/duplicate documents
    for pid, row in done.items():
        prev = json.loads(row["stage_metrics"]).get("num_partitions")
        if prev is not None and prev != num_partitions:
            raise ValueError(
                f"manifest partition {pid} was committed with "
                f"num_partitions={prev}; resuming with {num_partitions} "
                "would mix incompatible partitionings — use a fresh "
                "out_dir or resume=False")
    processed, skipped = [], []

    for pid in range(num_partitions):
        if pid in done:
            skipped.append(pid)
            continue
        if stop_after is not None and len(processed) >= stop_after:
            break
        t0 = time.time()

        def in_partition(batch: pa.Table, pid: int = pid) -> pa.Table:
            ids = batch.column("doc_id").to_pylist()
            mask = pa.array(
                [partition_of(d, num_partitions) == pid for d in ids],
                type=pa.bool_(),
            )
            return batch.filter(mask)

        # NOTE: the input is re-scanned once per partition (O(P) reads).
        # This keeps each partition an independent, individually
        # committable pipeline; when input scans dominate, stage the
        # corpus once into a partition_id-partitioned layout and point
        # each iteration at its slice (same commit protocol).
        docs = read_docs(input_path).map_batches(in_partition, batch_format="pyarrow")
        spans = extract_spans(docs, mode=mode, concurrency=concurrency)

        part_dir = os.path.join(out_dir, f"part={pid}")
        tmp_dir = os.path.join(out_dir, f".tmp-part={pid}-{run_id}")
        shutil.rmtree(tmp_dir, ignore_errors=True)
        spans.write_parquet(tmp_dir)
        if os.path.isdir(part_dir):
            shutil.rmtree(part_dir)
        os.replace(tmp_dir, part_dir)

        # lineage metrics from the committed partition output (small)
        out_table = pads.dataset(part_dir).to_table(columns=["doc_id", "kind", "text"])
        n_spans = out_table.num_rows
        n_docs = len(pc.unique(out_table.column("doc_id")))
        media_mask = pc.equal(out_table.column("kind"), "media")
        glyphs = int(
            pc.sum(
                pc.utf8_length(pc.if_else(media_mask, out_table.column("text"), ""))
            ).as_py()
            or 0
        )
        wall = time.time() - t0
        _commit_manifest_row(
            out_dir,
            {
                "run_id": run_id,
                "partition_id": pid,
                "state": "committed",
                "docs": n_docs,
                "spans": n_spans,
                "glyphs": glyphs,
                "wall_s": wall,
                "stage_metrics": json.dumps(
                    {"mode": mode, "num_partitions": num_partitions,
                     "spans_per_s": round(n_spans / wall, 2) if wall > 0 else None}
                ),
                "committed_at": datetime.now(timezone.utc).isoformat(),
            },
        )
        processed.append(pid)

    return {
        "run_id": run_id,
        "processed": processed,
        "skipped": skipped,
        "partitions": num_partitions,
    }


def read_job_output(out_dir: str) -> pa.Table:
    """All COMMITTED partition outputs, sorted by (doc_id, order).

    Reads only partitions present in the manifest — a stale ``part=``
    directory left by an older run under a different partitioning is
    never silently included (ADVICE r01)."""
    done = committed_partitions(out_dir)
    if not done:
        raise FileNotFoundError(f"no committed partitions in {out_dir}")
    parts = [os.path.join(out_dir, f"part={pid}") for pid in sorted(done)]
    table = pa.concat_tables([pads.dataset(p).to_table() for p in parts])
    return table.sort_by([("doc_id", "ascending"), ("order", "ascending")])

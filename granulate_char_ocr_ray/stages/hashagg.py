"""Hash-partitioned grouped aggregation.

Ray's built-in ``groupby().aggregate()`` is a sort-based exchange whose
constants dominate at mid/high key cardinality (observed ~90 s for a
150k-row two-key Min on this host vs <1 s for the same combine in
pandas). This helper implements the classic two-phase hash aggregate on
top of map_batches + a coarse-keyed shuffle:

  1. partial combine inside each batch (pandas groupby — vectorized);
  2. add ``_part = stable_hash(keys) % num_parts``;
  3. shuffle on the SMALL key space ``_part`` (num_parts groups);
  4. final combine per part (pandas groupby again).

Associative ops only (sum / min / max / count). Deterministic: the
partitioner uses pandas' value-based hashing, consistent across batches
within a run. Scales: shuffle volume is the PARTIAL rows (one row per
(batch, key)), and every shuffle key has ~equal load by construction.

Exchange constant (measured, 600k rows -> 147k keys, 32 CPUs): the
sort-based ``groupby("_part")`` exchange here runs ~13 s wall with
<0.5 s of it compute; Ray 2.49's ``DataContext.shuffle_strategy =
HASH_SHUFFLE`` + ``Dataset.repartition(n, keys=["_part"])`` + a
per-block final combine runs the same exchange in ~5 s steady-state
(first run pays ~15 s of HashShuffleAggregator actor startup — which a
long-lived cluster amortizes away). That is the upgrade path when the
exchange constant matters; it is deliberately NOT flipped here because
the strategy flag is process-global and would change the backend under
every verified query at once.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..functions.tables import table_from_pandas

_FINAL_OP = {"sum": "sum", "min": "min", "max": "max", "count": "sum"}

_MIX = np.uint64(0x9E3779B97F4A7C15)
_FNV = np.uint64(1099511628211)


def stable_hash_column(col: pd.Series) -> np.ndarray:
    """Deterministic uint64 hash of one column's values.

    NOT ``pd.util.hash_pandas_object`` — observed to disagree across Ray
    worker processes for identical values, which silently splits keys
    across partitions. Integer columns mix via multiply-xorshift;
    string/other dtypes go through the vectorized flat-buffer hash64."""
    with np.errstate(over="ignore"):
        if np.issubdtype(col.dtype, np.integer):
            vals = col.to_numpy().astype(np.uint64)
            vals = vals * _MIX
            vals ^= vals >> np.uint64(32)
            return vals
        import pyarrow as _pa

        from ..functions.textstats import hash64_batch

        return hash64_batch(_pa.array(col.astype(str)))


def _stable_partition(g: pd.DataFrame, keys: list[str], num_parts: int) -> np.ndarray:
    """Explicitly deterministic multi-column partitioner (see
    :func:`stable_hash_column`)."""
    h = np.zeros(len(g), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for k in keys:
            h = h * _FNV ^ stable_hash_column(g[k])
    return (h % np.uint64(num_parts)).astype(np.int64)


def hash_groupby_agg(
    ds: rd.Dataset,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    num_parts: int = 64,
) -> rd.Dataset:
    """Grouped aggregate: ``aggs`` maps output column -> (input column,
    op) with op in {'sum','min','max','count'}. Returns one row per
    distinct key combination with columns keys + outputs."""
    for out, (col, op) in aggs.items():
        if op not in _FINAL_OP:
            raise ValueError(f"unsupported op {op!r} for {out!r}")

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        named = {
            out: pd.NamedAgg(column=col, aggfunc=("size" if op == "count" else op))
            for out, (col, op) in aggs.items()
        }
        g = df.groupby(keys, as_index=False).agg(**named)
        g["_part"] = _stable_partition(g, keys, num_parts)
        return table_from_pandas(g, preserve_index=False)

    def final(part: pd.DataFrame) -> pd.DataFrame:
        named = {
            out: pd.NamedAgg(column=out, aggfunc=_FINAL_OP[op])
            for out, (_, op) in aggs.items()
        }
        out_df = part.groupby(keys, as_index=False).agg(**named)
        return out_df

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby("_part").map_groups(final, batch_format="pandas")


def hash_groupby_best(
    ds: rd.Dataset,
    keys: list[str],
    order_by: list[str],
    ascending: list[bool],
    num_parts: int = 64,
) -> rd.Dataset:
    """Keep the single best ROW per distinct key combination, "best"
    defined by ``order_by``/``ascending`` (ties must be broken by the
    trailing order columns — pass a unique tie-breaker to make the
    result deterministic). This is argmax/argmin-by as a two-phase
    reduce: keep-best is associative, so each block keeps its local
    winner per key (≤ |keys present| rows leave the block), the shuffle
    keys on the coarse key-hash, and the final combine re-picks per key.
    The distributed form of ``row_number() OVER (PARTITION BY keys
    ORDER BY order_by) = 1``."""

    def _best(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(order_by, ascending=ascending, kind="mergesort")
        return df.drop_duplicates(subset=keys, keep="first")

    def partial(batch: pa.Table) -> pa.Table:
        g = _best(batch.to_pandas())
        g["_part"] = _stable_partition(g, keys, num_parts)
        return table_from_pandas(g, preserve_index=False)

    def final(part: pd.DataFrame) -> pd.DataFrame:
        return _best(part).drop(columns=["_part"])

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby("_part").map_groups(final, batch_format="pandas")


def hash_groupby_mode(
    ds: rd.Dataset,
    keys: list[str],
    value_col: str,
    out_col: str = "mode",
    num_parts: int = 64,
) -> rd.Dataset:
    """Per-group MODE (majority vote): the most frequent ``value_col``
    per distinct key combination, ties broken by the SMALLEST value —
    deterministic and SQL-reproducible (row_number() OVER (ORDER BY
    count DESC, value ASC)).

    Mode is not associative, but its two-phase decomposition is: the
    partial combine counts (keys, value) pairs inside each batch, the
    shuffle keys on the coarse key-hash (every value of a key lands in
    one part), and the final combine sums counts then argmaxes per key.
    Shuffle volume is one row per (batch, key, DISTINCT value) — for
    low-cardinality vote domains (the reference's per-circle color vote,
    extract_from_reference.py:352-356) that is ~|values| per key.
    """

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby(keys + [value_col], as_index=False).agg(
            _n=(value_col, "size"))
        g["_part"] = _stable_partition(g, keys, num_parts)
        return table_from_pandas(g, preserve_index=False)

    def final(part: pd.DataFrame) -> pd.DataFrame:
        c = part.groupby(keys + [value_col], as_index=False).agg(
            _n=("_n", "sum"))
        c = c.sort_values(keys + ["_n", value_col],
                          ascending=[True] * len(keys) + [False, True])
        out = c.groupby(keys, as_index=False).first()
        return out.rename(columns={value_col: out_col})[keys + [out_col, "_n"]] \
            .rename(columns={"_n": f"{out_col}_count"})

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby("_part").map_groups(final, batch_format="pandas")

"""Generic hash-partitioned (shuffle) join for two Datasets that BOTH
exceed broadcast size.

Both sides are tagged with ``_jbucket = stable_hash(key) % num_buckets``
and a side marker, padded to a common schema, unioned, shuffled ONCE on
the small bucket-key space, and merged per bucket with a caller-supplied
vectorized pandas function — the explicit partitioned hash-join pattern
(same shape as ``pipelines/relational.order_item_totals``, factored out
so every join/anti-join/semi-join in the engine can use it instead of a
driver-side ``to_pandas()`` + broadcast dict; VERDICT r01 next-steps #2).

Scale notes: shuffle volume is the two tagged inputs (one pass each); a
skewed key never overloads a bucket more than its own frequency — salt
hot keys into sub-buckets inside ``merge`` if a single key's rows exceed
worker memory. ``num_buckets`` bounds per-task working-set size and is
the unit of join parallelism.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
import pyarrow as pa
import ray.data as rd

from .hashagg import stable_hash_column

MergeFn = Callable[[pd.DataFrame, pd.DataFrame], pd.DataFrame]


def partitioned_join(
    left: rd.Dataset,
    right: rd.Dataset,
    left_on: str,
    right_on: str,
    merge: MergeFn,
    num_buckets: int = 32,
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
) -> rd.Dataset:
    """Join ``left`` and ``right`` on hash-equal keys, one shuffle.

    ``merge(left_df, right_df)`` is called once per bucket with each
    side's rows restricted to that bucket (original columns only) and
    must return the joined frame — a plain ``.merge`` for an inner
    join, an ``isin`` mask for semi/anti joins, or a pre-aggregating
    combine. Keys of equal value land in the same bucket on both sides
    because both are hashed with the same stable function; note that
    an int64 key only meets a string key if their hash inputs match —
    keep key dtypes aligned across sides."""
    # Schemas drive the null-padding types. Pass them explicitly when
    # known (always cheap); falling back to Dataset.schema() triggers
    # partial execution and, for pandas-block inputs (map_groups
    # output), loses binary/string distinction for object columns.
    ls = left_schema if left_schema is not None else left.schema()
    rs = right_schema if right_schema is not None else right.schema()
    lnames = list(ls.names)
    rnames = list(rs.names)
    lfields = list(zip(lnames, list(ls.types)))
    rfields = [(n, t) for n, t in zip(rnames, list(rs.types))
               if n not in set(lnames)]
    all_fields = lfields + rfields

    def _np_dtype(t):
        # t is an Arrow DataType for Arrow-block datasets, a numpy dtype
        # for pandas-block datasets (map_groups output)
        if isinstance(t, pa.DataType):
            if pa.types.is_integer(t):
                return "int64"
            if pa.types.is_floating(t):
                return "float64"
            if pa.types.is_boolean(t):
                return "bool"
            return None
        import numpy as np

        try:
            if np.issubdtype(t, np.integer):
                return "int64"
            if np.issubdtype(t, np.floating):
                return "float64"
            if np.issubdtype(t, np.bool_):
                return "bool"
        except TypeError:
            pass
        return None

    # null padding upcasts int columns to float inside mixed buckets;
    # record each side's dtypes so per_bucket can restore them (an int64
    # join key hashed as "1.0" would never meet its partner otherwise)
    ltypes = {n: _np_dtype(t) for n, t in zip(lnames, list(ls.types))}
    rtypes = {n: _np_dtype(t) for n, t in zip(rnames, list(rs.types))}

    def tag(side: int, key: str):
        def fn(batch: pa.Table) -> pa.Table:
            df_key = batch.column(key).to_pandas()
            bucket = (stable_hash_column(df_key) % num_buckets).astype("int64")
            cols: dict[str, pa.Array] = {}
            for name, typ in all_fields:
                if name in batch.column_names:
                    col = batch.column(name)
                    if isinstance(col, pa.ChunkedArray):
                        col = col.combine_chunks()
                    # honor the DECLARED schema: a physical column whose
                    # storage type differs (e.g. an int32 parquet label
                    # declared int64) must cast, or the two tagged arms
                    # disagree at the union and Ray logs per-bundle
                    # schema warnings (bench asserts zero)
                    if isinstance(typ, pa.DataType) and col.type != typ:
                        col = col.cast(typ)
                    cols[name] = col
                else:
                    if not isinstance(typ, pa.DataType):
                        try:
                            typ = pa.from_numpy_dtype(typ)
                        except (pa.ArrowNotImplementedError, TypeError):
                            typ = pa.string()
                    cols[name] = pa.nulls(len(batch), typ)
            cols["_jbucket"] = pa.array(bucket, pa.int64())
            cols["_jside"] = pa.array([side] * len(batch), pa.int8())
            return pa.Table.from_pydict(cols)
        return fn

    tagged = left.map_batches(tag(0, left_on), batch_format="pyarrow").union(
        right.map_batches(tag(1, right_on), batch_format="pyarrow"))

    def _restore(df: pd.DataFrame, types: dict) -> pd.DataFrame:
        for n, dt in types.items():
            if dt is not None and str(df[n].dtype) != dt:
                df[n] = df[n].astype(dt)
        return df

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lf = _restore(g[g["_jside"] == 0][lnames].copy(), ltypes)
        rf = _restore(g[g["_jside"] == 1][rnames].copy(), rtypes)
        return merge(lf, rf)

    return tagged.groupby("_jbucket").map_groups(per_bucket,
                                                batch_format="pandas")

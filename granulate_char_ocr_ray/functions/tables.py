"""Arrow<->pandas conversion helpers shared by every partial-combine
UDF (pure — no ray import)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def table_from_pandas(df: pd.DataFrame, preserve_index: bool = False,
                      schema: pa.Schema | None = None) -> pa.Table:
    """``pa.Table.from_pandas`` minus the embedded pandas metadata.

    ``from_pandas`` stores a ``b'pandas'`` blob in the schema metadata,
    which makes the schema UNHASHABLE (``hash(schema)`` raises
    ``unhashable type: 'dict'``). Ray's block-unify fast path hashes
    schemas to dedupe them (transform_pyarrow.unify_schemas); every
    metadata-carrying block therefore logs "Failed to hash the schemas"
    and falls through to the expensive field-by-field unify (VERDICT
    r02 next-steps #6). Stripping metadata restores the O(1) dedupe —
    and is a behavior no-op: nothing downstream reads the pandas blob.
    """
    t = pa.Table.from_pandas(df, schema=schema, preserve_index=preserve_index)
    return t.replace_schema_metadata(None)

"""Driver-side compatibility patch for Ray Data 2.49: schema-carrying
empty bundles (VERDICT r04 #2).

Ray's range sort (the exchange under ``groupby`` / ``sort`` /
``map_groups``) emits EMPTY blocks for key ranges that received no
rows, and those bundles carry no schema. The streaming executor's
per-operator schema validation
(``streaming_executor_state.dedupe_schemas_with_validation``) is
asymmetric: an empty OLD schema is treated as compatible, but an empty
NEW schema counts as divergence — so every sort/groupby whose
partition count exceeds its distinct-key count logs "Operator produced
a RefBundle with a different schema ... new schema: ." once per
operator (380 per bench run in BENCH_r04.json), and the schema-less
empties flow downstream (the root of the hash-agg-finalize-on-empty
hazard noted in CLAUDE.md and the 0-row ``to_pandas`` column loss that
``storage.from_arrow`` works around).

The patch makes the validation symmetric: a 0-row bundle whose schema
is empty ADOPTS the stream's schema — exactly what Ray already does in
the mirrored case — so empties are uniformly schema-carrying at every
operator boundary and the warning goes quiet because the condition is
gone, not because it is suppressed. Genuine divergence between two
non-empty schemas still warns.

Idempotent; installed on import of ``sources.storage`` (every pipeline
passes through it). Guarded so a changed Ray internal API degrades to
a no-op (the warnings return, nothing breaks) rather than an import
error. Driver-only: the validation runs in the executor loop, never in
workers.
"""

from __future__ import annotations


def install() -> bool:
    """Install the empty-bundle schema-adoption patch. Returns True if
    active (or already installed), False if the Ray internals moved."""
    try:
        from ray.data._internal.execution import (
            streaming_executor_state as _ses,
        )
        from ray.data._internal.execution.interfaces.ref_bundle import (
            RefBundle,
        )
        from ray.data.block import _is_empty_schema
        _orig = _ses.dedupe_schemas_with_validation
    except Exception:
        return False
    if getattr(_orig, "_graft_empty_safe", False):
        return True

    def dedupe_schemas_with_validation(old_schema, bundle, warn=True,
                                       enforce_schemas=False):
        if (not _is_empty_schema(old_schema)
                and _is_empty_schema(bundle.schema)
                and bundle.num_rows() == 0):
            # 0 rows, no schema: adopt the stream's schema (the
            # constructor-kwarg mirror of Ray's own keep-old-schema
            # branch), no divergence.
            return RefBundle(
                bundle.blocks,
                schema=old_schema,
                owns_blocks=bundle.owns_blocks,
                output_split_idx=bundle.output_split_idx,
                _cached_object_meta=bundle._cached_object_meta,
                _cached_preferred_locations=(
                    bundle._cached_preferred_locations),
            ), False
        return _orig(old_schema, bundle, warn=warn,
                     enforce_schemas=enforce_schemas)

    dedupe_schemas_with_validation._graft_empty_safe = True
    _ses.dedupe_schemas_with_validation = dedupe_schemas_with_validation
    return True

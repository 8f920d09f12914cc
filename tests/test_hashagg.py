"""stages/hashagg.hash_groupby_agg — exactness against pandas at high
key cardinality and across dtypes. This guards the regression where a
nondeterministic partitioner silently split keys across partitions."""

import numpy as np
import pandas as pd
import ray.data as rd

from granulate_char_ocr_ray.stages.hashagg import hash_groupby_agg


def test_two_key_count_high_cardinality():
    rng = np.random.RandomState(0)
    df = pd.DataFrame({
        "d1": rng.randint(0, 5000, 100000).astype(np.int64),
        "d2": rng.randint(0, 7, 100000).astype(np.int64),
    })
    truth = df.groupby(["d1", "d2"]).size()
    ds = rd.from_pandas(df).repartition(16)
    got = hash_groupby_agg(ds, ["d1", "d2"], {"n": ("d1", "count")}).to_pandas()
    assert len(got) == len(truth)
    m = got.set_index(["d1", "d2"])["n"]
    assert int((truth.sub(m, fill_value=0) != 0).sum()) == 0


def test_string_keys_min_max_sum():
    rng = np.random.RandomState(1)
    df = pd.DataFrame({
        "k": rng.choice(["alpha", "beta", "gamma", "delta"], 20000),
        "v": rng.randint(0, 1000, 20000).astype(np.int64),
    })
    truth = df.groupby("k")["v"].agg(["min", "max", "sum"])
    ds = rd.from_pandas(df).repartition(8)
    got = hash_groupby_agg(
        ds, ["k"],
        {"mn": ("v", "min"), "mx": ("v", "max"), "s": ("v", "sum")},
    ).to_pandas().set_index("k").sort_index()
    assert got["mn"].tolist() == truth["min"].tolist()
    assert got["mx"].tolist() == truth["max"].tolist()
    assert got["s"].tolist() == truth["sum"].tolist()


def test_unsupported_op_raises():
    import pytest

    ds = rd.from_pandas(pd.DataFrame({"k": [1], "v": [1]}))
    with pytest.raises(ValueError):
        hash_groupby_agg(ds, ["k"], {"m": ("v", "median")})


def test_hash_exchange_matches_sort_exchange():
    """The opt-in HASH_SHUFFLE exchange (exchange="hash") must produce
    byte-identical aggregates to the default sort exchange — and the
    scoped DataContext snapshot must leave the global strategy
    untouched (VERDICT r02 #1, resolved as a per-callsite knob after
    A/B measurement showed no win at bench scale)."""
    import pandas as pd
    import pyarrow as pa
    import numpy as np
    import ray.data as rd
    from ray.data.context import DataContext, ShuffleStrategy

    from granulate_char_ocr_ray.stages.hashagg import hash_groupby_agg

    rng = np.random.default_rng(5)
    t = pa.table({
        "k1": rng.integers(0, 500, 20_000),
        "k2": rng.integers(0, 7, 20_000),
        "v": rng.random(20_000),
    })
    before = DataContext.get_current().shuffle_strategy

    def run(exchange):
        ds = rd.from_arrow(t).repartition(8)
        out = hash_groupby_agg(
            ds, ["k1", "k2"],
            {"n": ("v", "count"), "s": ("v", "sum"), "mx": ("v", "max")},
            num_parts=16, exchange=exchange)
        return (out.to_pandas().sort_values(["k1", "k2"])
                .reset_index(drop=True))

    a = run("sort")
    b = run("hash")
    pd.testing.assert_frame_equal(a, b)
    assert DataContext.get_current().shuffle_strategy == before
    assert before != ShuffleStrategy.HASH_SHUFFLE


def test_hash_groupby_topn_matches_pandas_and_block_invariance():
    from granulate_char_ocr_ray.stages.hashagg import hash_groupby_topn

    rng = np.random.RandomState(7)
    df = pd.DataFrame({
        "k": rng.randint(0, 37, size=5000),
        "v": rng.permutation(5000),
    })
    want = (df.sort_values(["v"], kind="mergesort")
              .groupby("k", as_index=False, sort=False).head(3)
              .sort_values(["k", "v"]).reset_index(drop=True))
    for nblocks in (1, 3, 17):
        ds = rd.from_pandas(df).repartition(nblocks)
        got = hash_groupby_topn(ds, ["k"], ["v"], [True], 3,
                                num_parts=8).to_pandas()
        got = got[["k", "v"]].sort_values(["k", "v"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got.astype(np.int64),
                                      want.astype(np.int64))


def test_empty_bundle_schema_adoption_clean_log():
    """VERDICT r04 #2: Ray's range sort emits schema-less empty blocks
    for empty key ranges, which used to log 'RefBundle with a
    different schema ... new schema: .' once per operator (380/bench
    run). raycompat.install() makes the executor's schema validation
    symmetric — 0-row empty-schema bundles adopt the stream's schema —
    so the canonical repro (groupby whose partition count exceeds its
    distinct-key count) must now produce ZERO divergence warnings, and
    real schema divergence must still warn."""
    import logging

    import pyarrow as pa

    from granulate_char_ocr_ray.raycompat import install

    assert install()          # idempotent; True = patch active

    msgs = []

    class _H(logging.Handler):
        def emit(self, record):
            m = record.getMessage()
            if "RefBundle with a different schema" in m:
                msgs.append(m)

    h = _H()
    logging.getLogger("ray.data").addHandler(h)
    try:
        t = pa.table({"g": [1, 2] * 50, "v": list(range(100))})
        ds = rd.from_arrow(t).repartition(8)
        out = (ds.groupby("g")
                 .map_groups(lambda df: df.head(1), batch_format="pandas")
                 .to_pandas())
        assert len(out) == 2
        assert msgs == []

        # a GENUINE divergence (two different non-empty schemas from
        # one operator) must still be reported
        def diverge(batch: pa.Table) -> pa.Table:
            if batch.column("v")[0].as_py() < 50:
                return pa.table({"a": [1]})
            return pa.table({"b": ["x"]})

        rd.from_arrow(t).repartition(2).map_batches(
            diverge, batch_format="pyarrow").materialize()
        assert len(msgs) == 1
    finally:
        logging.getLogger("ray.data").removeHandler(h)

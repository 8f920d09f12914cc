"""Dedup + similarity pipelines cross-checked against brute-force
single-process references on sf0.001."""

import itertools

import numpy as np
import pyarrow.dataset as pads
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_df():
    return pads.dataset(f"{SF}/documents.parquet").to_table(
        columns=["doc_id", "text"]).to_pandas()


def test_exact_dedup_matches_bruteforce(docs_df):
    from granulate_char_ocr_ray.pipelines.dedup import exact_dedup

    got = sorted(exact_dedup(SF).to_pandas()["doc_id"])
    want = sorted(docs_df.groupby("text")["doc_id"].min())
    assert got == want


@pytest.fixture(scope="module")
def exact_pairs_df():
    from granulate_char_ocr_ray.pipelines.dedup import ngram_jaccard_dups

    return ngram_jaccard_dups(SF, threshold=0.8).to_pandas()


def test_ngram_jaccard_matches_bruteforce(docs_df, exact_pairs_df):
    from granulate_char_ocr_ray.functions.sketch import char_shingles

    threshold = 0.8
    got = exact_pairs_df
    got_pairs = {(r.d1, r.d2) for r in got.itertuples()}
    shingles = {r.doc_id: char_shingles(r.text) for r in docs_df.itertuples()}
    want_pairs = set()
    for (da, sa), (db, sb) in itertools.combinations(shingles.items(), 2):
        inter = len(sa & sb)
        if inter / (len(sa) + len(sb) - inter) >= threshold:
            d1, d2 = sorted((da, db))
            want_pairs.add((d1, d2))
    assert got_pairs == want_pairs


def test_minhash_estimates_track_exact_jaccard(docs_df):
    from granulate_char_ocr_ray.functions.sketch import (
        exact_jaccard,
        minhash_signature,
        shingle_hashes,
    )

    rows = list(docs_df.itertuples())[:40]
    sigs = {r.doc_id: minhash_signature(shingle_hashes(r.text)) for r in rows}
    errs = []
    for a, b in itertools.combinations(rows, 2):
        est = float((sigs[a.doc_id] == sigs[b.doc_id]).mean())
        errs.append(abs(est - exact_jaccard(a.text, b.text)))
    # 128 permutations -> standard error ~0.044; mean error well under 0.1
    assert np.mean(errs) < 0.08
    assert np.max(errs) < 0.25


def test_minhash_lsh_finds_high_jaccard_pairs(docs_df, exact_pairs_df):
    """Every pair the exact join flags at >=0.8 must be caught by LSH
    (32 bands x 4 rows: P(catch | j=0.8) ~ 1 - (1-0.41)^32 ~ 1.0)."""
    from granulate_char_ocr_ray.pipelines.dedup import minhash_lsh_dups

    exact = exact_pairs_df
    lsh = minhash_lsh_dups(SF, threshold=0.5).to_pandas()
    exact_pairs = {(r.d1, r.d2) for r in exact.itertuples()}
    lsh_pairs = {(r.d1, r.d2) for r in lsh.itertuples()}
    assert exact_pairs <= lsh_pairs


def test_minhash_plan_dispatch_equivalence():
    """The fused small-corpus plan and the signature-table large-corpus
    plan must be row-identical (same pairs, same estimates) — the size
    dispatch in minhash_lsh_dups may never change answers."""
    from granulate_char_ocr_ray.pipelines.dedup import (
        _minhash_lsh_fused,
        _minhash_lsh_sigtable,
    )

    fused = _minhash_lsh_fused(SF, 3, 128, 16, 0.5).to_pandas()
    sigt = _minhash_lsh_sigtable(SF, 3, 128, 16, 0.5).to_pandas()
    key = ["d1", "d2"]
    fused = fused.sort_values(key).reset_index(drop=True)[key + ["est_jaccard"]]
    sigt = sigt.sort_values(key).reset_index(drop=True)[key + ["est_jaccard"]]
    assert fused.equals(sigt)


def test_simhash_near_dups_symmetry_and_determinism(docs_df):
    from granulate_char_ocr_ray.functions.sketch import hamming64, simhash64
    from granulate_char_ocr_ray.pipelines.dedup import simhash_near_dups

    got = simhash_near_dups(SF, max_hamming=3).to_pandas()
    sims = {r.doc_id: simhash64(r.text) for r in docs_df.itertuples()}
    for r in got.itertuples():
        assert r.d1 < r.d2
        assert hamming64(sims[r.d1], sims[r.d2]) == r.hamming <= 3


def test_cosine_topk_matches_bruteforce():
    from granulate_char_ocr_ray.pipelines.similarity import cosine_topk

    t = pads.dataset(f"{SF}/embeddings.parquet").to_table()
    ids = t.column("vec_id").to_numpy()
    mat = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    q = mat[ids == 0][0]
    cos = mat @ q / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    cos = np.floor(cos * 10000 + 0.5) / 10000
    mask = ids != 0
    order = np.lexsort((ids[mask], -cos[mask]))[:10]
    want = list(zip(ids[mask][order].tolist(), cos[mask][order].tolist()))

    got_df = cosine_topk(SF, k=10).to_pandas()
    got = list(zip(got_df["vec_id"].tolist(), got_df["cos_sim"].tolist()))
    assert got == want


def test_lsh_topk_is_subset_of_corpus_with_valid_scores():
    from granulate_char_ocr_ray.pipelines.similarity import lsh_cosine_topk

    got = lsh_cosine_topk(SF, k=10).to_pandas()
    assert len(got) <= 10
    assert got["cos_sim"].is_monotonic_decreasing
    assert (got["vec_id"] != 0).all()


def test_label_centroids_counts():
    from granulate_char_ocr_ray.pipelines.similarity import label_centroids

    got = label_centroids(SF).to_pandas()
    t = pads.dataset(f"{SF}/embeddings.parquet").to_table(columns=["label"])
    counts = t.to_pandas()["label"].value_counts()
    assert sorted(got["label"]) == sorted(counts.index)
    for r in got.itertuples():
        assert r.n == counts[r.label]


def test_centroid_assign_matches_bruteforce():
    from granulate_char_ocr_ray.pipelines.similarity import centroid_assign

    t = pads.dataset(f"{SF}/embeddings.parquet").to_table()
    ids = t.column("vec_id").to_numpy()
    labels = t.column("label").to_numpy()
    mat = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    uniq = np.sort(np.unique(labels))
    cents = np.stack([mat[labels == u].mean(axis=0) for u in uniq])
    d2 = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    want = uniq[d2.argmin(axis=1)]
    got = centroid_assign(SF).to_pandas().sort_values("vec_id")
    order = np.argsort(ids)
    assert got["assigned_label"].to_numpy().tolist() == want[order].tolist()


def test_media_thumbnails_deterministic():
    from granulate_char_ocr_ray.pipelines.media import MediaResize, media_thumbnails

    got = media_thumbnails(SF).to_pandas()
    assert len(got) > 0
    import pyarrow as pa

    # same payload -> same hash through the raw stage
    stage = MediaResize()
    batch = pa.Table.from_pydict(
        {"doc_id": ["a", "b"], "media_ref": ["glyph:ABC", "glyph:ABC"]})
    out = stage(batch).to_pandas()
    assert out["thumb_hash"].iloc[0] == out["thumb_hash"].iloc[1]


def test_frame_sample_and_audio_features_real_paths():
    """The video/audio seams are REAL for uncompressed containers:
    length-prefixed PGM frames and PCM WAV; compressed formats still
    raise (a codec plugs in beside those branches)."""
    import base64

    import numpy as np
    import pytest as _pytest

    from granulate_char_ocr_ray.functions.codecs import (
        encode_frames, encode_wav_pcm16)
    from granulate_char_ocr_ray.pipelines.media import (
        audio_features, frame_sample)

    frames = [np.full((4, 5), i, dtype=np.uint8) for i in range(7)]
    ref = "framesb64:" + base64.b64encode(encode_frames(frames)).decode()
    got = frame_sample(ref, every_n=3)
    assert len(got) == 3
    assert all(np.array_equal(g, frames[i * 3]) for i, g in enumerate(got))
    with _pytest.raises(NotImplementedError):
        frame_sample("video:xyz")

    samples = np.full(16000, 700, dtype=np.int16)     # 1s constant tone
    wref = "wavb64:" + base64.b64encode(encode_wav_pcm16(samples)).decode()
    feats = audio_features(wref, frame_ms=25)
    assert feats.shape == (40, 2)
    assert np.allclose(feats[:, 0], 700.0)            # RMS of constant
    assert np.allclose(feats[:, 1], 0.0)              # no zero crossings
    with _pytest.raises(NotImplementedError):
        audio_features("mp3:xyz")


def test_embedding_cosine_dups_matches_bruteforce():
    from granulate_char_ocr_ray.pipelines.similarity import embedding_cosine_dups

    t = pads.dataset(f"{SF}/embeddings.parquet").to_table()
    ids = t.column("vec_id").to_numpy()
    mat = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    n = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    cos = n @ n.T
    iu, ju = np.triu_indices(len(ids), 1)
    keep = cos[iu, ju] >= 0.4
    want = {(min(ids[i], ids[j]), max(ids[i], ids[j]))
            for i, j in zip(iu[keep], ju[keep])}
    got_df = embedding_cosine_dups(SF, threshold=0.4).to_pandas()
    got = {(r.v1, r.v2) for r in got_df.itertuples()}
    assert got == want


def test_bloom_filter_no_false_negatives_and_low_fp():
    from granulate_char_ocr_ray.functions.sketch import (
        bloom_add,
        bloom_contains,
        bloom_create,
    )

    rng = np.random.RandomState(9)
    members = (rng.randint(0, 2**32, 20000, dtype=np.uint64) << np.uint64(32)) \
        | rng.randint(0, 2**32, 20000, dtype=np.uint64)
    others = (rng.randint(0, 2**32, 20000, dtype=np.uint64) << np.uint64(32)) \
        | rng.randint(0, 2**32, 20000, dtype=np.uint64)
    others = np.setdiff1d(others, members)
    f = bloom_create(len(members), fp_rate=0.01)
    bloom_add(f, members)
    assert bloom_contains(f, members).all()          # no false negatives
    fp = bloom_contains(f, others).mean()
    assert fp < 0.03                                  # ~1% target


def test_embedding_cosine_dups_blockpair_matches_bruteforce():
    """The distributed block-pair exact join equals the broadcast
    all-pairs oracle row-for-row (round 2: scale-safe plan swap)."""
    from granulate_char_ocr_ray.pipelines.similarity import (
        embedding_cosine_dups, embedding_cosine_dups_bruteforce)

    got = embedding_cosine_dups(SF).to_pandas().sort_values(
        ["v1", "v2"]).reset_index(drop=True)
    want = embedding_cosine_dups_bruteforce(SF).to_pandas().sort_values(
        ["v1", "v2"]).reset_index(drop=True)
    import pandas as pd
    pd.testing.assert_frame_equal(got[["v1", "v2", "cos_sim"]],
                                  want[["v1", "v2", "cos_sim"]])


def test_dup_clusters_matches_union_find(docs_df, exact_pairs_df):
    """Distributed min-label propagation equals single-process
    union-find over the same pair graph."""
    from granulate_char_ocr_ray.pipelines.dedup import dup_clusters

    got = dup_clusters(SF, threshold=0.8).to_pandas()
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in exact_pairs_df.itertuples():
        ra, rb = find(r.d1), find(r.d2)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}
    assert dict(zip(got["doc_id"], got["cluster_id"])) == want


def test_ivf_topk_full_probe_equals_exact_and_partial_is_subset():
    from granulate_char_ocr_ray.pipelines.similarity import (
        cosine_topk, ivf_cosine_topk)

    exact = cosine_topk(SF, k=10).to_pandas()
    full = ivf_cosine_topk(SF, k=10, nprobe=10).to_pandas()
    import pandas as pd
    pd.testing.assert_frame_equal(full, exact)
    part = ivf_cosine_topk(SF, k=10, nprobe=2).to_pandas()
    assert len(part) <= 10
    assert part["cos_sim"].is_monotonic_decreasing
    assert (part["vec_id"] != 0).all()


def test_kmeans_matches_local_reference():
    """Distributed Lloyd's == the same algorithm run single-process
    (deterministic init, argmin ties to lowest cluster)."""
    import numpy as np
    import pyarrow.dataset as pads

    from granulate_char_ocr_ray.pipelines.similarity import kmeans_assign

    k, iters = 8, 5
    t = pads.dataset(f"{SF}/embeddings.parquet").to_table(
        columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy()
    mat = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    cents = mat[np.isin(ids, np.arange(k))][np.argsort(ids[np.isin(ids, np.arange(k))])]
    for _ in range(iters):
        d2 = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        best = d2.argmin(axis=1)
        new = cents.copy()
        for c in range(k):
            if (best == c).any():
                new[c] = mat[best == c].mean(axis=0)
        cents = new
    d2 = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    want = dict(zip(ids.tolist(), d2.argmin(axis=1).tolist()))

    got = kmeans_assign(SF, k=k, iters=iters).to_pandas()
    assert dict(zip(got["vec_id"], got["cluster"])) == want


def test_dedup_survivors_composition():
    from granulate_char_ocr_ray.pipelines.dedup import (
        dedup_survivors,
        dup_clusters,
    )

    surv = set(dedup_survivors(SF).to_pandas()["doc_id"])
    cl = dup_clusters(SF).to_pandas()
    import pandas as pd

    all_ids = set(pd.read_parquet(f"{SF}/documents.parquet",
                                  columns=["doc_id"])["doc_id"])
    dropped = set(cl.loc[cl["doc_id"] != cl["cluster_id"], "doc_id"])
    # survivors = corpus minus non-representative cluster members, and
    # every cluster keeps exactly its label
    assert surv == all_ids - dropped
    assert set(cl["cluster_id"]) <= surv
    assert len(dropped) > 0


def test_dedup_survivors_both_plans_identical():
    """Broadcast anti-filter vs partitioned anti-join (VERDICT r03 #5:
    no unconditional driver-side pull of the cluster table) emit
    identical survivor sets."""
    from granulate_char_ocr_ray.pipelines.dedup import dedup_survivors

    bc = dedup_survivors(SF).to_pandas()
    pj = dedup_survivors(SF, broadcast_threshold=0).to_pandas()
    import pandas as pd

    pd.testing.assert_frame_equal(bc.reset_index(drop=True),
                                  pj.reset_index(drop=True))


def test_dup_clusters_both_plans_identical():
    from granulate_char_ocr_ray.pipelines.dedup import dup_clusters

    import pandas as pd

    local = dup_clusters(SF, threshold=0.8).to_pandas(
    ).reset_index(drop=True)
    dist = dup_clusters(SF, threshold=0.8, local_threshold=0).to_pandas(
    ).sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(local, dist, check_dtype=False)


def test_leakage_safe_split_invariants():
    from granulate_char_ocr_ray.pipelines.dedup import (
        dup_clusters, leakage_safe_split)

    got = leakage_safe_split(SF).to_pandas()
    docs = pads.dataset(f"{SF}/documents.parquet").to_table(
        columns=["doc_id"]).to_pandas()
    # every doc appears exactly once
    assert sorted(got["doc_id"]) == sorted(docs["doc_id"])
    # clusters never straddle the split
    per_cluster = got.groupby("cluster_id")["split"].nunique()
    assert (per_cluster == 1).all()
    # split decided by the Knuth hash of the cluster id
    h = (got["cluster_id"].to_numpy(np.uint64) * np.uint64(2654435761)) \
        % np.uint64(1 << 32) % np.uint64(100)
    assert (np.where(h < 20, "test", "train") == got["split"]).all()
    # cluster ids agree with dup_clusters for pair-graph members
    cl = dup_clusters(SF, threshold=0.8).to_pandas()
    merged = got.merge(cl, on="doc_id", suffixes=("", "_cc"))
    assert (merged["cluster_id"] == merged["cluster_id_cc"]).all()
    # and both dup sides actually exist in the fixture
    assert {"train", "test"} == set(got["split"])


def test_leakage_safe_split_both_plans_identical():
    import pandas as pd

    from granulate_char_ocr_ray.pipelines.dedup import leakage_safe_split

    bc = leakage_safe_split(SF).to_pandas().reset_index(drop=True)
    part = leakage_safe_split(SF, broadcast_threshold=0).to_pandas(
    ).sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(bc, part, check_dtype=False)


def test_contamination_check():
    import duckdb
    from granulate_char_ocr_ray.pipelines.dedup import contamination_check

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    got = contamination_check(SF).to_pandas().reset_index(drop=True)
    want = con.sql("""
        WITH bench AS (
          SELECT doc_id, text FROM documents
          WHERE (doc_id * 2654435761) % 4294967296 % 100 < 2),
        bgrams AS (
          SELECT DISTINCT substr(text, CAST(i AS INT), 24) AS g
          FROM bench,
               UNNEST(range(1, greatest(length(text) - 22, 1))) AS t(i)
          WHERE length(text) >= 24),
        cand AS (
          SELECT doc_id, text FROM documents
          WHERE (doc_id * 2654435761) % 4294967296 % 100 >= 2),
        cgrams AS (
          SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 24) AS g
          FROM cand,
               UNNEST(range(1, greatest(length(text) - 22, 1))) AS t(i)
          WHERE length(text) >= 24)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits
        FROM cgrams JOIN bgrams USING (g)
        GROUP BY doc_id HAVING count(*) >= 2 ORDER BY doc_id
    """).df()
    import pandas as pd
    assert len(want) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_pagerank_both_plans_identical():
    import pandas as pd
    from granulate_char_ocr_ray.pipelines.dedup import pagerank_dups

    local = pagerank_dups(SF, threshold=0.8).to_pandas(
    ).reset_index(drop=True)
    dist = pagerank_dups(SF, threshold=0.8, local_threshold=0).to_pandas(
    ).sort_values("doc_id").reset_index(drop=True)
    assert len(local) > 0
    assert abs(local["rank"].sum() - 1.0) < 1e-6  # probability mass
    pd.testing.assert_frame_equal(local, dist, check_dtype=False)


def test_embedding_covariance_matches_numpy():
    import numpy as np
    import pyarrow.dataset as pads
    from granulate_char_ocr_ray.pipelines.similarity import (
        embedding_covariance)

    got = embedding_covariance(SF).to_pandas()
    t = pads.dataset(f"{SF}/embeddings.parquet").to_table(
        columns=["embedding"])
    mat = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    want = np.cov(mat, rowvar=False, ddof=1)
    d = mat.shape[1]
    assert len(got) == d * d
    got_m = got.sort_values(["i", "j"])["cov"].to_numpy().reshape(d, d)
    assert np.allclose(got_m, want, atol=1e-7)


def test_embedding_pca_matches_numpy():
    import numpy as np
    import pyarrow.dataset as pads
    from granulate_char_ocr_ray.pipelines.similarity import embedding_pca

    got = embedding_pca(SF, k=4).to_pandas()
    t = pads.dataset(f"{SF}/embeddings.parquet").to_table(
        columns=["embedding"])
    mat = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    w = np.sort(np.linalg.eigvalsh(np.cov(mat, rowvar=False, ddof=1)))[::-1]
    assert len(got) == 4
    assert np.allclose(got["eigenvalue"].to_numpy(), w[:4], atol=1e-6)
    assert (got["explained_ratio"].to_numpy() > 0).all()


def test_embedding_quantize_roundtrip():
    import numpy as np
    import pyarrow.dataset as pads
    from granulate_char_ocr_ray.pipelines.similarity import (
        embedding_quantize)

    got = embedding_quantize(SF).to_pandas()
    t = pads.dataset(f"{SF}/embeddings.parquet").to_table(
        columns=["vec_id", "embedding"])
    assert len(got) == t.num_rows
    mat = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    d = mat.shape[1]
    # every code blob is d bytes; reconstruction error bounded by the
    # global per-dim half-step
    assert got["codes"].map(len).eq(2 * d).all()
    lo, hi = mat.min(axis=0), mat.max(axis=0)
    half_step = ((hi - lo) / 255.0).max() / 2 + 1e-12
    assert (got["max_err"] <= half_step + 1e-6).all()
    # determinism
    again = embedding_quantize(SF).to_pandas()
    assert (got["codes"] == again["codes"]).all()


def test_semantic_dedup_matches_local_composition():
    """Distributed SemDeDup == the same composition run single-process:
    local Lloyd's (bit-identical per test_kmeans) -> per-cluster
    pairwise cosine -> drop any vector with a smaller-id neighbor at
    cos >= threshold."""
    import numpy as np
    import pyarrow.dataset as pads

    from granulate_char_ocr_ray.pipelines.similarity import semantic_dedup

    k, iters, thr = 8, 5, 0.4
    t = pads.dataset(f"{SF}/embeddings.parquet").to_table(
        columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy()
    mat = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    sel = np.isin(ids, np.arange(k))
    cents = mat[sel][np.argsort(ids[sel])]
    for _ in range(iters):
        d2 = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        best = d2.argmin(axis=1)
        new = cents.copy()
        for c in range(k):
            if (best == c).any():
                new[c] = mat[best == c].mean(axis=0)
        cents = new
    d2 = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    cluster = d2.argmin(axis=1)
    nn = np.linalg.norm(mat, axis=1)
    nn[nn == 0] = 1.0
    normed = mat / nn[:, None]
    want_keep = {}
    for c in range(k):
        m = cluster == c
        cids, cmat = ids[m], normed[m]
        cos = cmat @ cmat.T
        dup = ((cos >= thr) & (cids[None, :] > cids[:, None])).any(axis=0)
        for v, kp in zip(cids.tolist(), (~dup).tolist()):
            want_keep[v] = kp

    got = semantic_dedup(SF, k=k, iters=iters, threshold=thr).to_pandas()
    assert len(got) == len(ids)
    assert dict(zip(got["vec_id"], got["cluster"])) == dict(
        zip(ids.tolist(), cluster.tolist()))
    assert dict(zip(got["vec_id"], got["keep"])) == want_keep
    # some duplicates must actually exist at this threshold, and the
    # survivors must dominate (sanity that the rule did something)
    n_drop = int((~got["keep"]).sum())
    assert 0 < n_drop < len(got) / 2


def test_knn_join_matches_bruteforce():
    import duckdb
    import numpy as np

    from granulate_char_ocr_ray.pipelines.similarity import knn_join

    SF = "/root/testdata/sf0.001"
    got = knn_join(SF).to_pandas()
    t = duckdb.sql(
        f"SELECT vec_id, embedding FROM "
        f"read_parquet('{SF}/embeddings.parquet') ORDER BY vec_id").df()
    ids = t["vec_id"].to_numpy()
    mat = np.stack(t["embedding"].to_numpy()).astype(np.float64)
    nn = np.linalg.norm(mat, axis=1)
    nn[nn == 0] = 1.0
    normed = mat / nn[:, None]
    cos = normed @ normed.T
    np.fill_diagonal(cos, -np.inf)
    want_nn = ids[np.argmax(cos, axis=1)]
    got = got.set_index("vec_id")
    for i, vid in enumerate(ids):
        assert got.loc[vid, "nn_id"] == want_nn[i]
        assert abs(got.loc[vid, "cos_sim"]
                   - round(cos[i].max(), 4)) < 1e-9


def test_fuzzy_token_pairs_no_false_negatives():
    """FastSS blocking must find EVERY pair within the distance bound
    (deletion-neighborhood completeness), verified against the O(V^2)
    scan."""
    import duckdb

    from granulate_char_ocr_ray.pipelines.dedup import fuzzy_token_pairs

    SF = "/root/testdata/sf0.001"
    got = fuzzy_token_pairs(SF, max_dist=2).to_pandas()
    want = duckdb.sql(f"""
        WITH v AS (SELECT DISTINCT
            unnest(regexp_split_to_array(trim(text), '\\s+')) AS t
          FROM read_parquet('{SF}/documents.parquet')
          WHERE trim(text) <> '')
        SELECT a.t AS token_a, b.t AS token_b,
               levenshtein(a.t, b.t) AS dist
        FROM v a JOIN v b ON a.t < b.t AND levenshtein(a.t, b.t) <= 2
        ORDER BY token_a, token_b""").df()
    assert len(got) == len(want)
    assert (got["token_a"].tolist() == want["token_a"].tolist()
            and got["token_b"].tolist() == want["token_b"].tolist()
            and got["dist"].tolist() == want["dist"].tolist())


def test_incremental_dedup_matches_bruteforce(docs_df):
    from granulate_char_ocr_ray.pipelines.dedup import incremental_dedup

    got = incremental_dedup(SF).to_pandas()["doc_id"].tolist()
    base_texts = set(
        docs_df.loc[docs_df["doc_id"] % 4 != 0, "text"])
    new = docs_df[docs_df["doc_id"] % 4 == 0]
    survivors = new[~new["text"].isin(base_texts)]
    want = sorted(survivors.groupby("text")["doc_id"].min())
    assert got == want
    assert got == sorted(got)  # output contract: sorted by doc_id


def test_incremental_dedup_bloom_path_identical(docs_df):
    # broadcast_threshold=0 forces the Bloom + exact-anti-join plan;
    # both plans must produce identical survivors
    from granulate_char_ocr_ray.pipelines.dedup import incremental_dedup

    bc = incremental_dedup(SF).to_pandas()["doc_id"].tolist()
    bl = incremental_dedup(
        SF, broadcast_threshold=0).to_pandas()["doc_id"].tolist()
    assert bc == bl


def test_hard_negatives_matches_bruteforce():
    import pyarrow.dataset as pads
    from granulate_char_ocr_ray.pipelines.similarity import hard_negatives

    got = hard_negatives(SF).to_pandas()
    t = pads.dataset(f"{SF}/embeddings.parquet").to_table(
        columns=["vec_id", "embedding", "label"]).to_pandas(
    ).sort_values("vec_id").reset_index(drop=True)
    m = np.array(t["embedding"].tolist(), dtype=np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    ids = t["vec_id"].to_numpy()
    labs = t["label"].to_numpy()
    q, c = ids < 10, ids >= 10
    cos = np.round(m[c] @ m[q].T, 4)
    want = []
    for j, (qid, qlab) in enumerate(zip(ids[q], labs[q])):
        for kind, mask in (("neg", labs[c] != qlab),
                           ("pos", labs[c] == qlab)):
            if not mask.any():
                continue
            cc, ci = cos[mask, j], ids[c][mask]
            best = np.lexsort((ci, -cc))[0]
            want.append((qid, kind, ci[best], cc[best]))
    want.sort()
    got_rows = [(r.qid, r.kind, r.vec_id, r.cos) for r in got.itertuples()]
    assert got_rows == want


def test_ngram_containment_matches_bruteforce(docs_df):
    from granulate_char_ocr_ray.functions.sketch import char_shingles
    from granulate_char_ocr_ray.pipelines.dedup import ngram_containment_dups

    got = ngram_containment_dups(SF, threshold=0.9).to_pandas()
    got_pairs = {(r.d1, r.d2) for r in got.itertuples()}
    shingles = {r.doc_id: char_shingles(r.text) for r in docs_df.itertuples()}
    want_pairs = set()
    for (da, sa), (db, sb) in itertools.combinations(shingles.items(), 2):
        if len(sa & sb) / min(len(sa), len(sb)) >= 0.9:
            want_pairs.add(tuple(sorted((da, db))))
    assert got_pairs == want_pairs


def test_paragraph_dedup_matches_bruteforce(docs_df):
    from granulate_char_ocr_ray.pipelines.dedup import paragraph_dedup

    P = 16
    # brute force: first corpus-wide occurrence of each exact paragraph
    # (ordered by doc_id, pidx) survives; docs rebuild in pidx order
    occurrences = []
    for doc_id, text in zip(docs_df["doc_id"], docs_df["text"]):
        tk = text.split(" ")
        for i in range(-(-len(tk) // P)):
            occurrences.append((doc_id, i, " ".join(tk[i * P:(i + 1) * P])))
    first = {}
    for doc_id, i, para in sorted(occurrences):
        first.setdefault(para, (doc_id, i))
    want = {}
    for doc_id, i, para in occurrences:
        kept = first[para] == (doc_id, i)
        n, k, parts = want.get(doc_id, (0, 0, []))
        want[doc_id] = (n + 1, k + kept, parts + ([para] if kept else []))

    got = paragraph_dedup(SF, para_tokens=P).to_pandas()
    assert len(got) == len(want)
    for row in got.itertuples():
        n, k, parts = want[row.doc_id]
        assert (row.n_paras, row.n_kept) == (n, k)
        assert row.clean_text == " ".join(parts)
    # the corpus actually exercises removal
    assert got["n_kept"].sum() < got["n_paras"].sum()


def test_incremental_minhash_matches_full_lsh_cross_pairs():
    from granulate_char_ocr_ray.pipelines.dedup import (
        incremental_minhash_dups, minhash_lsh_dups)

    got = incremental_minhash_dups(SF, mod=4, threshold=0.5).to_pandas()
    full = minhash_lsh_dups(SF, threshold=0.5).to_pandas()
    want = {}
    for r in full.itertuples():
        n1, n2 = r.d1 % 4 == 0, r.d2 % 4 == 0
        if n1 != n2:   # exactly one side new
            new, base = (r.d1, r.d2) if n1 else (r.d2, r.d1)
            want[(new, base)] = r.est_jaccard
    have = {(r.new_doc, r.base_doc): r.est_jaccard
            for r in got.itertuples()}
    assert have == want
    assert len(have) > 0


def test_boilerplate_removal_matches_bruteforce(docs_df):
    from granulate_char_ocr_ray.pipelines.dedup import boilerplate_removal

    P = 16
    # brute force: a window survives iff its exact string occurs in
    # fewer than min_df=2 distinct docs (ALL occurrences of cross-doc
    # boilerplate are removed, unlike paragraph_dedup's keep-first)
    occurrences = []
    for doc_id, text in zip(docs_df["doc_id"], docs_df["text"]):
        tk = text.split(" ")
        for i in range(-(-len(tk) // P)):
            occurrences.append((doc_id, i, " ".join(tk[i * P:(i + 1) * P])))
    docs_per_para = {}
    for doc_id, _, para in occurrences:
        docs_per_para.setdefault(para, set()).add(doc_id)
    want = {}
    for doc_id, i, para in occurrences:
        kept = len(docs_per_para[para]) < 2
        n, k, parts = want.get(doc_id, (0, 0, []))
        want[doc_id] = (n + 1, k + kept, parts + ([para] if kept else []))

    got = boilerplate_removal(SF, para_tokens=P).to_pandas()
    assert len(got) == len(want)
    for row in got.itertuples():
        n, k, parts = want[row.doc_id]
        assert (row.n_paras, row.n_kept) == (n, k)
        assert row.clean_text == " ".join(parts)
    # the corpus actually exercises removal, and boilerplate removal is
    # strictly more aggressive than keep-first dedup
    assert got["n_kept"].sum() < got["n_paras"].sum()


def test_dup_window_fraction_matches_bruteforce(docs_df):
    from granulate_char_ocr_ray.pipelines.dedup import dup_window_fraction

    K = 48
    grams = {}           # doc_id -> set of distinct k-char windows
    for doc_id, text in zip(docs_df["doc_id"], docs_df["text"]):
        if len(text) >= K:
            grams[doc_id] = {text[i:i + K] for i in range(len(text) - K + 1)}
    docs_per_gram = {}
    for doc_id, gs in grams.items():
        for g in gs:
            docs_per_gram.setdefault(g, set()).add(doc_id)

    got = dup_window_fraction(SF, k=K).to_pandas()
    assert set(got["doc_id"]) == set(grams)
    for row in got.itertuples():
        gs = grams[row.doc_id]
        ndup = sum(1 for g in gs if len(docs_per_gram[g]) > 1)
        assert row.n_grams == len(gs)
        assert row.n_dup_grams == ndup
        assert abs(row.dup_frac - round(ndup / len(gs), 4)) <= 5e-5
    # corpus exercises both pure and duplicated docs
    assert got["n_dup_grams"].sum() > 0
    assert (got["n_dup_grams"] < got["n_grams"]).any()


def test_mutual_nn_pairs_matches_bruteforce():
    import numpy as np
    import pyarrow.dataset as pads
    from granulate_char_ocr_ray.pipelines.similarity import mutual_nn_pairs

    t = pads.dataset(f"{SF}/embeddings.parquet").to_table()
    ids = t.column("vec_id").to_numpy(zero_copy_only=False)
    lab = t.column("label").to_numpy(zero_copy_only=False)
    mat = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    K = 4
    s, tg = lab == 0, lab == 1
    si, ti = ids[s], ids[tg]
    cos = mat[s] @ mat[tg].T

    def side_stats(c, cand_ids):
        o = np.argsort(cand_ids)
        c, cand_ids = c[:, o], cand_ids[o]
        top = np.argsort(-c, axis=1, kind="stable")[:, :K]
        best = cand_ids[top[:, 0]]
        kmean = np.take_along_axis(c, top, axis=1).mean(axis=1)
        bcos = c[np.arange(len(c)), top[:, 0]]
        return best, bcos, kmean

    bs, cs_, ms = side_stats(cos, ti)            # src -> tgt
    bt, _, mt = side_stats(cos.T, si)            # tgt -> src
    want = []
    for i, x in enumerate(si):
        y = bs[i]
        j = np.where(ti == y)[0][0]
        if bt[j] == x:
            margin = cs_[i] / ((ms[i] + mt[j]) / 2)
            want.append((x, y, round(cs_[i], 4), round(margin, 4)))
    want.sort()

    got = mutual_nn_pairs(SF).to_pandas()
    got_rows = [(r.src_id, r.tgt_id, r.cos_sim, r.margin)
                for r in got.itertuples()]
    assert len(want) > 0
    assert got_rows == want


def test_pq_recall_matches_brute_force():
    """The distributed PQ train/encode/search pipeline is bit-identical
    to a single-process reference (same deterministic init, same
    empty-cluster rule, same (dist, vec_id) tie pinning)."""
    import numpy as np
    import pyarrow.parquet as pq_

    from granulate_char_ocr_ray.pipelines.similarity import pq_recall

    sf = "/root/testdata/sf0.001"
    df = pq_recall(sf).to_pandas()

    t = pq_.read_table(f"{sf}/embeddings.parquet")
    ids = t.column("vec_id").to_numpy()
    mat = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    m, ksub, iters = 4, 16, 5
    books = mat[:ksub].reshape(ksub, m, -1).transpose(1, 0, 2).copy()
    sub = mat.reshape(len(mat), m, -1)
    for _ in range(iters):
        new = books.copy()
        for j in range(m):
            d2 = ((sub[:, j, None, :] - books[j][None]) ** 2).sum(axis=2)
            best = d2.argmin(axis=1)
            for c in range(ksub):
                sel = best == c
                if sel.any():
                    new[j][c] = sub[sel, j].mean(axis=0)
        books = new
    codes = np.stack([
        np.argmin(((sub[:, j, None, :] - books[j][None]) ** 2
                   ).sum(axis=2), axis=1) for j in range(m)], axis=1)
    mse = 0.0
    for j in range(m):
        mse += (((sub[:, j] - books[j][codes[:, j]]) ** 2)
                .sum(axis=1)).sum()
    mse /= len(mat)
    for q in range(5):
        qsub = mat[q].reshape(m, -1)
        lut = ((qsub[:, None, :] - books) ** 2).sum(axis=2)
        approx = lut[np.arange(m)[None, :], codes].sum(axis=1)
        exact = ((mat - mat[q][None]) ** 2).sum(axis=1)
        keep = ids != q
        ta = set(ids[keep][np.lexsort((ids[keep], approx[keep]))[:10]])
        te = set(ids[keep][np.lexsort((ids[keep], exact[keep]))[:10]])
        want = round(len(ta & te) / 10, 4)
        assert df["recall_at_k"].iloc[q] == want
    assert abs(df["corpus_mse"].iloc[0] - round(mse, 4)) <= 1e-9
    # compression must beat the zero-information quantizer
    assert df["corpus_mse"].iloc[0] < mat.var(axis=0).sum()


def test_ivfpq_topk_matches_brute_force():
    """IVF-PQ (coarse Lloyd's + residual PQ + nprobe search) is
    bit-identical to a single-process reference implementation."""
    import numpy as np
    import pyarrow.parquet as pq_

    from granulate_char_ocr_ray.pipelines.similarity import ivfpq_topk

    sf = "/root/testdata/sf0.001"
    got = ivfpq_topk(sf).to_pandas()

    t = pq_.read_table(f"{sf}/embeddings.parquet")
    ids = t.column("vec_id").to_numpy()
    mat = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    kcoarse, m, ksub, iters, nprobe, k, nq = 8, 4, 16, 5, 2, 10, 5
    # coarse Lloyd's (deterministic init, empty keeps previous)
    cents = mat[:kcoarse].copy()
    for _ in range(iters):
        d2 = ((mat[:, None, :] - cents[None]) ** 2).sum(axis=2)
        best = d2.argmin(axis=1)
        new = cents.copy()
        for c in range(kcoarse):
            sel = best == c
            if sel.any():
                new[c] = mat[sel].mean(axis=0)
        cents = new
    cell = ((mat[:, None, :] - cents[None]) ** 2).sum(axis=2).argmin(
        axis=1)
    res = mat - cents[cell]
    sub = res.reshape(len(mat), m, -1)
    a0 = ((mat[:ksub, None, :] - cents[None]) ** 2).sum(
        axis=2).argmin(axis=1)
    books = (mat[:ksub] - cents[a0]).reshape(
        ksub, m, -1).transpose(1, 0, 2).copy()
    for _ in range(iters):
        new = books.copy()
        for j in range(m):
            d2 = ((sub[:, j, None, :] - books[j][None]) ** 2).sum(
                axis=2)
            best = d2.argmin(axis=1)
            for c in range(ksub):
                sel = best == c
                if sel.any():
                    new[j][c] = sub[sel, j].mean(axis=0)
        books = new
    codes = np.stack([
        np.argmin(((sub[:, j, None, :] - books[j][None]) ** 2
                   ).sum(axis=2), axis=1) for j in range(m)], axis=1)
    dsub = mat.shape[1] // m
    for q in range(nq):
        qc = np.argsort(((mat[q][None, :] - cents) ** 2).sum(
            axis=1))[:nprobe]
        probe = np.isin(cell, qc) & (ids != q)
        pi = np.flatnonzero(probe)
        approx = np.empty(len(pi))
        for cl in qc:
            sel = cell[pi] == cl
            if not sel.any():
                continue
            qres = (mat[q] - cents[cl]).reshape(m, dsub)
            lut = ((qres[:, None, :] - books) ** 2).sum(axis=2)
            approx[sel] = lut[np.arange(m)[None, :],
                              codes[pi[sel]]].sum(axis=1)
        ordk = np.lexsort((ids[pi], approx))[:k]
        want_ids = list(ids[pi][ordk])
        g = got[got["query_vec_id"] == q].sort_values("rank")
        assert list(g["vec_id"]) == want_ids
        assert np.allclose(g["approx_d"].to_numpy(),
                           np.round(approx[ordk], 4), atol=1e-9)


def test_dim_truncation_recall_brute_force():
    """Truncated-dim recall matches a single-process reference and is
    monotone-ish: the full-dim prefix always recalls itself."""
    import numpy as np
    import pyarrow.parquet as pq_

    from granulate_char_ocr_ray.pipelines.similarity import \
        dim_truncation_recall

    sf = "/root/testdata/sf0.001"
    got = dim_truncation_recall(sf).to_pandas()

    t = pq_.read_table(f"{sf}/embeddings.parquet")
    ids = t.column("vec_id").to_numpy()
    mat = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    for d in (8, 16, 32):
        for q in range(5):
            keep = ids != q
            full = ((mat - mat[q][None]) ** 2).sum(axis=1)
            trunc = ((mat[:, :d] - mat[q][None, :d]) ** 2).sum(axis=1)
            tf = set(ids[keep][np.lexsort((ids[keep],
                                           full[keep]))[:10]])
            tt = set(ids[keep][np.lexsort((ids[keep],
                                           trunc[keep]))[:10]])
            want = round(len(tf & tt) / 10, 4)
            row = got[(got["dim"] == d)
                      & (got["query_vec_id"] == q)]
            assert row["recall_at_k"].iloc[0] == want


def _emb_matrix():
    t = pads.dataset(f"{SF}/embeddings.parquet").to_table(
        columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy(zero_copy_only=False)
    mat = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    return ids, mat


def test_mmr_rerank_matches_bruteforce():
    """Greedy MMR replayed single-process over the same candidate set."""
    from granulate_char_ocr_ray.functions.numeric import round_half_up
    from granulate_char_ocr_ray.pipelines.similarity import mmr_rerank

    k, n_cand, lam, qid = 5, 20, 0.7, 0
    got = mmr_rerank(SF, k=k, n_candidates=n_cand, query_id=qid,
                     lam=lam)
    assert list(got.columns) == ["rank", "vec_id", "relevance",
                                 "mmr_score"]

    ids, mat = _emb_matrix()
    q = mat[ids == qid][0]
    keep = ids != qid
    ids, mat = ids[keep], mat[keep]
    norms = np.linalg.norm(mat, axis=1) * np.linalg.norm(q)
    norms[norms == 0] = 1.0
    rel = mat @ q / norms
    # candidate set: top n_cand by (rounded rel desc, vec_id asc)
    order = np.lexsort((ids, -round_half_up(rel, 6)))[:n_cand]
    cid, cmat, crel = ids[order], mat[order], rel[order]
    un = cmat / np.where(np.linalg.norm(cmat, axis=1) == 0, 1.0,
                         np.linalg.norm(cmat, axis=1))[:, None]
    max_sim = np.full(len(cid), -np.inf)
    avail = np.ones(len(cid), dtype=bool)
    want = []
    for rank in range(1, k + 1):
        div = np.where(np.isfinite(max_sim), max_sim, 0.0)
        score = round_half_up(lam * crel - (1 - lam) * div, 6)
        sm = np.where(avail, score, -np.inf)
        best = np.flatnonzero(sm == sm.max())
        j = best[np.argmin(cid[best])]
        want.append((rank, int(cid[j]), float(score[j])))
        avail[j] = False
        max_sim = np.maximum(max_sim, un @ un[j])
    got_t = [(int(r["rank"]), int(r["vec_id"]), float(r["mmr_score"]))
             for _, r in got.iterrows()]
    assert got_t == want


def test_kcenter_coreset_matches_bruteforce():
    from granulate_char_ocr_ray.functions.numeric import round_half_up
    from granulate_char_ocr_ray.pipelines.similarity import (
        kcenter_coreset)

    k = 6
    got = kcenter_coreset(SF, k=k)
    assert list(got.columns) == ["sel_order", "vec_id",
                                 "dist_to_centers"]
    assert len(got) == k

    ids, mat = _emb_matrix()
    centers = [int(ids.min())]
    want = [(1, centers[0], 0.0)]
    for step in range(2, k + 1):
        cm = mat[np.isin(ids, centers)]
        d = np.sqrt(np.maximum(
            (np.sum(mat * mat, axis=1)[:, None] - 2 * mat @ cm.T
             + np.sum(cm * cm, axis=1)[None, :]).min(axis=1), 0.0))
        dr = round_half_up(d, 6)
        dr[np.isin(ids, centers)] = -np.inf
        best = np.flatnonzero(dr == dr.max())
        j = best[np.argmin(ids[best])]
        centers.append(int(ids[j]))
        want.append((step, int(ids[j]), float(dr[j])))
    got_t = [(int(r["sel_order"]), int(r["vec_id"]),
              float(r["dist_to_centers"])) for _, r in got.iterrows()]
    assert got_t == want
    # covering property: every selected center is distinct
    assert len({v for _, v, _ in got_t}) == k


def test_label_mmd_rff_matches_local_and_separates():
    """RFF-MMD from the distributed pipeline equals a local
    single-pass computation (mergeable partials), is ~0 between
    same-distribution groups, and grows under a mean shift."""
    from granulate_char_ocr_ray.pipelines.similarity import label_mmd_rff

    got = label_mmd_rff(SF).to_pandas()
    # local reference: identical seeded RFF means
    emb = pads.dataset(f"{SF}/embeddings.parquet").to_table(
        columns=["label", "embedding"]).to_pandas()
    mat = np.stack(emb["embedding"].to_numpy())
    d = mat.shape[1]
    rng = np.random.default_rng(20240817)
    W = rng.normal(0.0, 1.0 / 8.0, size=(d, 512))
    b = rng.uniform(0.0, 2.0 * np.pi, size=512)
    phi = np.sqrt(2.0 / 512) * np.cos(mat @ W + b)
    labels = emb["label"].to_numpy()
    means = {int(l): phi[labels == l].mean(axis=0)
             for l in np.unique(labels)}
    for _, r in got.iterrows():
        diff = means[int(r["label_a"])] - means[int(r["label_b"])]
        assert abs(r["mmd2"] - float(diff @ diff)) < 1e-6
    # two-sample behavior on synthetic gaussians
    rng2 = np.random.default_rng(3)
    X = rng2.normal(0, 1, (400, d))
    Y_same = rng2.normal(0, 1, (400, d))
    Y_shift = rng2.normal(0.8, 1, (400, d))
    def mmd2(A, B):
        pa_ = np.sqrt(2.0 / 512) * np.cos(A @ W + b)
        pb_ = np.sqrt(2.0 / 512) * np.cos(B @ W + b)
        df = pa_.mean(axis=0) - pb_.mean(axis=0)
        return float(df @ df)
    assert mmd2(X, Y_same) < 0.01
    assert mmd2(X, Y_shift) > 5 * mmd2(X, Y_same)


def test_dbscan_embeddings_two_blobs(tmp_path):
    """Two well-separated Gaussian blobs -> exactly 2 clusters with
    the right sizes and zero noise."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from granulate_char_ocr_ray.pipelines.similarity import (
        dbscan_embeddings)

    rng = np.random.default_rng(0)
    dim, n_blob = 8, 100
    a = rng.normal(0.0, 0.5, size=(n_blob, dim))
    a[:, 0] += 10.0
    b = rng.normal(0.0, 0.5, size=(n_blob, dim))
    b[:, 0] -= 10.0
    mat = np.vstack([a, b]).astype(np.float32)
    t = pa.table({
        "vec_id": pa.array(np.arange(2 * n_blob, dtype=np.int64)),
        "embedding": pa.array(list(mat), pa.list_(pa.float32())),
        "label": pa.array(np.zeros(2 * n_blob, dtype=np.int32))})
    pq.write_table(t, str(tmp_path / "embeddings.parquet"))

    got = dbscan_embeddings(str(tmp_path)).to_pandas()
    clusters = got[got["cluster_id"] >= 0]
    noise = got[got["cluster_id"] < 0]
    assert len(clusters) == 2
    assert sorted(clusters["n_points"]) == [n_blob, n_blob]
    assert noise["n_points"].iloc[0] == 0


def test_dbscan_embeddings_fixture_partitions_corpus():
    """On the real fixture: cluster sizes + noise partition all rows,
    every cluster has >= min_pts points, and the result is stable
    across two runs (deterministic projection + cell labels)."""
    import pandas as pd

    from granulate_char_ocr_ray.pipelines.similarity import (
        dbscan_embeddings)

    g1 = dbscan_embeddings(SF).to_pandas()
    g2 = dbscan_embeddings(SF).to_pandas()
    pd.testing.assert_frame_equal(g1, g2)
    n = pads.dataset(f"{SF}/embeddings.parquet").count_rows()
    assert g1["n_points"].sum() == n
    assert (g1[g1["cluster_id"] >= 0]["n_points"] >= 5).all()


def test_jarowinkler_name_dups_scale_guard():
    """The exact quadratic form refuses domains above max_names."""
    import pytest as _pytest

    from granulate_char_ocr_ray.pipelines.dedup import (
        jarowinkler_name_dups)

    with _pytest.raises(ValueError, match="max_names"):
        jarowinkler_name_dups(SF, max_names=3)


def test_ngram_jaccard_dense_and_sparse_plans_identical(monkeypatch):
    """Round-4 vocab-size dispatch: the dense bitmask block-pair plan
    (small gram vocabularies — the degenerate regime where the
    inverted index explodes O(sum df^2); 145 GB of spill at sf0.1
    pre-fix) and the inverted-index plan emit IDENTICAL pairs, for
    both jaccard and containment kernels."""
    import pandas as pd

    import granulate_char_ocr_ray.pipelines.dedup as d

    def run(score, thr):
        return (d.ngram_jaccard_dups(SF, threshold=thr, score=score)
                .to_pandas().sort_values(["d1", "d2"])
                .reset_index(drop=True))

    for score, thr in (("jaccard", 0.8), ("containment", 0.9)):
        dense = run(score, thr)
        monkeypatch.setattr(d, "DENSE_VOCAB_MAX", 0)
        sparse = run(score, thr)
        monkeypatch.undo()
        pd.testing.assert_frame_equal(dense, sparse)
        assert len(dense) > 0


def test_ngram_jaccard_pair_mass_guard(monkeypatch):
    """The inverted plan refuses (fail-loud, with remedy) when
    sum(df^2) exceeds the pair budget, instead of spill-exploding —
    and the guard does NOT fire through the dense plan."""
    import granulate_char_ocr_ray.pipelines.dedup as d

    # force the inverted plan and a tiny budget -> must raise
    monkeypatch.setattr(d, "DENSE_VOCAB_MAX", 0)
    monkeypatch.setattr(d, "EXACT_NGRAM_PAIR_BUDGET", 10.0)
    with pytest.raises(ValueError, match="minhash_lsh_dups"):
        d.ngram_jaccard_dups(SF, threshold=0.8).to_pandas()
    monkeypatch.undo()
    # dense plan path: same corpus, no guard, still exact
    assert len(d.ngram_jaccard_dups(SF, threshold=0.8)
               .to_pandas()) > 0


def test_ngram_jaccard_capped_path_guarded_and_prefiltered(monkeypatch):
    """ADVICE r04 #4: with max_doc_freq set, (a) a cap loose enough to
    drop nothing reproduces the uncapped result exactly (the stop-gram
    PRE-filter + bucket backstop change nothing when no gram exceeds
    the cap — cross-plan, since uncapped dispatches dense on this
    corpus); (b) the pair-mass budget now applies to the POST-cap
    document frequencies, so a loose cap over a degenerate vocabulary
    fails loud instead of spill-exploding; (c) a tight cap passes the
    same budget that the uncapped plan fails, because capped buckets
    contribute zero pairs."""
    import pandas as pd

    import granulate_char_ocr_ray.pipelines.dedup as d

    uncapped = (d.ngram_jaccard_dups(SF, threshold=0.8)
                .to_pandas().sort_values(["d1", "d2"])
                .reset_index(drop=True))
    capped = (d.ngram_jaccard_dups(SF, threshold=0.8,
                                   max_doc_freq=10 ** 9)
              .to_pandas().sort_values(["d1", "d2"])
              .reset_index(drop=True))
    pd.testing.assert_frame_equal(uncapped, capped)
    assert len(uncapped) > 0

    # (b) loose cap, tiny budget -> the capped path refuses too
    monkeypatch.setattr(d, "EXACT_NGRAM_PAIR_BUDGET", 10.0)
    with pytest.raises(ValueError, match="max_doc_freq=1000000000"):
        d.ngram_jaccard_dups(SF, threshold=0.8,
                             max_doc_freq=10 ** 9).to_pandas()
    monkeypatch.undo()
    # (c) a cap of 1 zeroes every pair-capable bucket -> no pairs,
    # and the (restored) budget sees only singleton mass
    assert len(d.ngram_jaccard_dups(SF, threshold=0.8,
                                    max_doc_freq=1).to_pandas()) == 0

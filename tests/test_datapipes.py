"""Tests for data-pipeline operators over the sf0.001 testdata tables."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from raygraph.data import dedup, knn, multimodal, text, windows

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs():
    return rd.read_parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def docs_df():
    import pyarrow.parquet as pq

    return pq.read_table(f"{SF}/documents.parquet").to_pandas()


def test_exact_dedup(docs, docs_df):
    out = dedup.exact_dedup(docs).to_pandas()
    import hashlib

    h = docs_df["text"].map(lambda t: hashlib.md5(t.encode()).hexdigest())
    want = docs_df.assign(h=h).groupby("h")["doc_id"].agg(["min", "count"])
    assert len(out) == len(want)
    got = out.sort_values("doc_id").reset_index(drop=True)
    w = want.sort_values("min").reset_index(drop=True)
    assert np.array_equal(got["doc_id"].to_numpy(), w["min"].to_numpy())
    assert np.array_equal(got["n_copies"].to_numpy(), w["count"].to_numpy())


def test_minhash_near_dedup_plants_duplicates():
    texts = [
        "the quick brown fox jumps over the lazy dog again and again in the sun",
        "the quick brown fox jumps over the lazy dog again and again in the rain",
        "completely different content about graph engines and arrow batches",
        "another unrelated document discussing distributed shuffles at scale",
    ]
    df = pd.DataFrame({"doc_id": [1, 2, 3, 4], "text": texts})
    out = dedup.near_dedup_minhash(
        rd.from_pandas(df), num_perm=64, bands=16, threshold=0.5
    )
    assert set(out["doc_id"]) == {1, 2}
    assert out["dup_group"].nunique() == 1


def test_minhash_oracle_sql_matches_pipeline(docs):
    """The generated DuckDB replay (shingle hash → permutation minima →
    splitmix64 band fold → capped bucket pairs → Jaccard verify →
    components) is bit-exact vs near_dedup_minhash — guards the baked
    constants against kernel changes."""
    import duckdb

    from raygraph.pipelines import _minhash_oracle_sql

    got = (
        dedup.near_dedup_minhash(docs, threshold=0.7)
        .sort_values("doc_id").reset_index(drop=True).astype("int64")
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    want = (
        con.execute(_minhash_oracle_sql(threshold=0.7)).fetchdf()
        .sort_values("doc_id").reset_index(drop=True).astype("int64")
    )
    assert len(got) > 0
    assert got.equals(want)


def test_walks_oracle_sql_matches_pipeline():
    """The step-unrolled DuckDB replay of the splitmix64 walk-draw chain
    is bit-exact vs the superstep walk kernel on the int-keyed graph —
    guards the counter-RNG constants and the CSR candidate order."""
    import duckdb

    from raygraph.pipelines import QUERIES, _walks_oracle_sql

    got = QUERIES["walks_int"](SF)
    got = (got.to_pandas() if hasattr(got, "to_pandas") else got)
    cols = ["walker", "step", "vertex"]
    got = got[cols].sort_values(cols).reset_index(drop=True).astype("int64")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF}/lineitem.parquet')"
    )
    want = (
        con.execute(_walks_oracle_sql()).fetchdf()[cols]
        .sort_values(cols).reset_index(drop=True).astype("int64")
    )
    assert len(got) > 6  # walks actually advanced past step 0
    assert got.equals(want)


def test_biased_walks_oracle_sql_matches_pipeline():
    """The weight-proportional draw (first dst-sorted neighbor whose
    running integer weight sum exceeds u·total) replayed in SQL is
    bit-exact vs the engine's row-local binary-search inverse-CDF —
    guards the exact-float contract of walk_step_scatter's biased path."""
    import duckdb

    from raygraph.pipelines import QUERIES, _biased_walks_oracle_sql

    got = QUERIES["biased_walks_int"](SF)
    got = (got.to_pandas() if hasattr(got, "to_pandas") else got)
    cols = ["walker", "step", "vertex"]
    got = got[cols].sort_values(cols).reset_index(drop=True).astype("int64")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF}/lineitem.parquet')"
    )
    want = (
        con.execute(_biased_walks_oracle_sql()).fetchdf()[cols]
        .sort_values(cols).reset_index(drop=True).astype("int64")
    )
    assert len(got) > 6
    assert got.equals(want)


def test_bigram_pmi_matches_oracle():
    """Corpus-wide bigram PMI: tokenization, counts, scalar totals and
    the PMI float expression all match the DuckDB replay exactly."""
    import duckdb

    from raygraph.pipelines import ORACLES, QUERIES

    got = QUERIES["bigram_pmi"](SF)
    got = (got.to_pandas() if hasattr(got, "to_pandas") else got)
    cols = ["w1", "w2", "c12", "pmi_e6"]
    got = got[cols].sort_values(cols).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    want = (
        con.execute(ORACLES["bigram_pmi"]).fetchdf()[cols]
        .sort_values(cols).reset_index(drop=True)
    )
    assert len(got) > 0
    assert got["c12"].astype("int64").equals(want["c12"].astype("int64"))
    assert got[["w1", "w2"]].equals(want[["w1", "w2"]])
    # scaled-int gate column: exact equality, no float tie ambiguity
    assert got["pmi_e6"].astype("int64").equals(
        want["pmi_e6"].astype("int64"))


def test_node2vec_oracle_sql_matches_pipeline():
    """The node2vec α-weighted draw (1/p return, 1 adjacent, 1/q explore;
    p=2, q=0.5 → power-of-two α, exact dyadic cumsums) replayed in SQL is
    bit-exact vs the engine's vectorized segmented draw — guards the
    3-exchange n2v kernel (membership flags + draw) end-to-end."""
    import duckdb

    from raygraph.pipelines import QUERIES, _node2vec_oracle_sql

    got = QUERIES["node2vec_int"](SF)
    got = (got.to_pandas() if hasattr(got, "to_pandas") else got)
    cols = ["walker", "step", "vertex"]
    got = got[cols].sort_values(cols).reset_index(drop=True).astype("int64")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF}/lineitem.parquet')"
    )
    want = (
        con.execute(_node2vec_oracle_sql()).fetchdf()[cols]
        .sort_values(cols).reset_index(drop=True).astype("int64")
    )
    assert len(got) > 6
    assert got.equals(want)


def test_neighbor_sample_oracle_sql_matches_pipeline():
    """ROW_NUMBER over the per-edge splitmix64 uniforms reproduces the
    stable-argsort fanout selection of uniform_neighbor_sample exactly."""
    import duckdb

    from raygraph.pipelines import QUERIES, _neighbor_sample_oracle_sql

    got = QUERIES["neighbor_sample_int"](SF)
    got = (got.to_pandas() if hasattr(got, "to_pandas") else got)
    cols = ["hop", "src", "dst"]
    got = got[cols].sort_values(cols).reset_index(drop=True).astype("int64")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF}/lineitem.parquet')"
    )
    want = (
        con.execute(_neighbor_sample_oracle_sql()).fetchdf()[cols]
        .sort_values(cols).reset_index(drop=True).astype("int64")
    )
    assert len(got) > 0
    assert got.equals(want)


def test_minhash_scale_paths_match(docs):
    # the join-verify path (broadcast_limit=0) and the engine components
    # path (engine_pair_limit=0) must reproduce the default result exactly
    base = dedup.near_dedup_minhash(docs, threshold=0.7)
    engine = dedup.near_dedup_minhash(docs, threshold=0.7, engine_pair_limit=0)
    a = base.sort_values("doc_id").reset_index(drop=True)
    b = engine.sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)

    sigs = dedup.minhash_signatures(docs)
    cand = dedup.lsh_candidate_pairs(sigs)
    vb = dedup.verify_jaccard_pairs(docs, cand, threshold=0.7).to_pandas()
    vj = dedup.verify_jaccard_pairs(
        docs, cand, threshold=0.7, broadcast_limit=0
    ).to_pandas()
    key = ["a", "b"]
    vb = vb.sort_values(key).reset_index(drop=True)
    vj = vj.sort_values(key).reset_index(drop=True)
    assert np.array_equal(vb[key].to_numpy(), vj[key].to_numpy())
    assert np.allclose(vb["jaccard"].to_numpy(), vj["jaccard"].to_numpy())


def test_minhash_deterministic(docs):
    a = dedup.minhash_signatures(docs.limit(50)).to_pandas().sort_values("doc_id")
    b = dedup.minhash_signatures(docs.limit(50)).to_pandas().sort_values("doc_id")
    assert a.reset_index(drop=True).equals(b.reset_index(drop=True))


def test_simhash_near_identical_docs_close():
    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "alpha beta gamma delta epsilon zeta eta theta",
                "alpha beta gamma delta epsilon zeta eta iota",
                "one two three four five six seven eight nine ten",
            ],
        }
    )
    out = dedup.simhash_signatures(rd.from_pandas(df)).to_pandas().set_index("doc_id")
    d12 = bin(out.loc[1, "simhash"] ^ out.loc[2, "simhash"]).count("1")
    d13 = bin(out.loc[1, "simhash"] ^ out.loc[3, "simhash"]).count("1")
    assert d12 < d13


def test_token_count_and_quality(docs, docs_df):
    tc = text.token_count(docs).to_pandas().set_index("doc_id")
    row = docs_df.iloc[0]
    import re

    assert tc.loc[row["doc_id"], "n_tokens"] == len(re.split(r"\s+", row["text"].strip()))
    q = text.quality_scores(docs).to_pandas().set_index("doc_id")
    assert q.loc[row["doc_id"], "n_chars"] == len(row["text"])


def test_language_id_runs(docs):
    out = text.language_id(docs.limit(100)).to_pandas()
    assert len(out) == 100
    assert set(out.columns) == {"doc_id", "lang_pred", "lang_score"}


def test_fingerprint_shift_robustness():
    base = "x" * 3 + "the core fingerprint content stays identical here" * 2
    shifted = "y" * 7 + "the core fingerprint content stays identical here" * 2
    df = pd.DataFrame({"doc_id": [1, 2], "text": [base, shifted]})
    out = text.fingerprint(rd.from_pandas(df)).to_pandas().set_index("doc_id")
    assert out.loc[1, "fp"] == out.loc[2, "fp"]


def test_knn_bruteforce_matches_numpy():
    import pyarrow.parquet as pq

    emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    X = np.stack([np.asarray(v, np.float64) for v in emb["embedding"]])
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    ids = emb["vec_id"].to_numpy(np.int64)
    q = Xn[:3]
    got = knn.knn_bruteforce(
        rd.read_parquet(f"{SF}/embeddings.parquet"), q, ids[:3], k=5
    )
    sims = q @ Xn.T
    for qi, qid in enumerate(ids[:3]):
        s = np.round(sims[qi], 6)
        order = sorted(
            [(float(-s[j]), int(ids[j])) for j in range(len(ids)) if ids[j] != qid]
        )[:5]
        want = [v for _, v in order]
        have = got[got["query_id"] == qid].sort_values("rank")["neighbor_id"].tolist()
        assert have == want


def test_knn_bruteforce_block_count_invariant():
    """VERDICT r3 #3: the driver merge is bounded by grouped_topk, and the
    result must not depend on how the dataset is blocked."""
    import pyarrow.parquet as pq

    emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    X = np.stack([np.asarray(v, np.float64) for v in emb["embedding"]])
    ids = emb["vec_id"].to_numpy(np.int64)
    q = X[:3]
    cols = ["query_id", "neighbor_id", "rank"]
    base = knn.knn_bruteforce(
        rd.read_parquet(f"{SF}/embeddings.parquet"), q, ids[:3], k=7
    )[cols].reset_index(drop=True)
    many = knn.knn_bruteforce(
        rd.read_parquet(f"{SF}/embeddings.parquet").repartition(37),
        q, ids[:3], k=7,
    )[cols].reset_index(drop=True)
    assert base.equals(many)


def test_knn_ivf_mostly_agrees_with_exact():
    ds = rd.read_parquet(f"{SF}/embeddings.parquet")
    import pyarrow.parquet as pq

    emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    X = np.stack([np.asarray(v, np.float64) for v in emb["embedding"]])
    ids = emb["vec_id"].to_numpy(np.int64)
    q = X[:2]
    exact = knn.knn_bruteforce(ds, q, ids[:2], k=5)
    approx = knn.knn_ivf(ds, q, ids[:2], k=5, nprobe=8, num_centroids=8)
    # recall@5 of at least 0.6 on this tiny set with generous probing
    inter = 0
    for qid in ids[:2]:
        e = set(exact[exact["query_id"] == qid]["neighbor_id"])
        a = set(approx[approx["query_id"] == qid]["neighbor_id"])
        inter += len(e & a)
    assert inter >= 6


def test_tumbling_window_counts():
    ev = rd.read_parquet(f"{SF}/events.parquet")
    out = windows.tumbling_window(ev, width_sec=3600).to_pandas()
    import pyarrow.parquet as pq

    df = pq.read_table(f"{SF}/events.parquet").to_pandas()
    us = df["ts"].astype("datetime64[us]").astype(np.int64)
    width = 3600 * 1_000_000
    df["window_start"] = (us // width) * width
    want = df.groupby(["user_id", "window_start"]).agg(
        n_events=("event_id", "size"), sum_value=("value", "sum")
    )
    assert len(out) == len(want)
    m = out.set_index(["user_id", "window_start"]).sort_index()
    assert np.array_equal(m["n_events"].to_numpy(), want.sort_index()["n_events"].to_numpy())


def test_session_windows():
    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2],
            "ts": pd.to_datetime(
                ["2024-01-01 00:00", "2024-01-01 00:10", "2024-01-01 02:00",
                 "2024-01-01 00:00"]
            ),
            "event_id": [1, 2, 3, 4],
        }
    )
    out = windows.session_windows(rd.from_pandas(df), gap_sec=1800).to_pandas()
    u1 = out[out["user_id"] == 1]
    assert len(u1) == 2  # 2h gap splits sessions
    assert sorted(u1["n_events"]) == [1, 2]


def test_hopping_window_multi_assignment():
    # one event at t=250s in 300s/100s hopping windows → starts 0,100,200
    df = pd.DataFrame(
        {
            "user_id": [1],
            "ts": pd.to_datetime(["2024-01-01 00:04:10"]),
            "value": [2.0],
        }
    )
    out = windows.hopping_window(
        rd.from_pandas(df), width_sec=300, slide_sec=100
    ).to_pandas().sort_values("window_start")
    base = pd.Timestamp("2024-01-01").value // 1000  # µs epoch of midnight
    assert list(out["window_start"] - base) == [0, 100_000_000, 200_000_000]
    assert (out["n_events"] == 1).all() and (out["sum_value"] == 2.0).all()


def test_hopping_window_reduces_to_tumbling():
    # slide == width → exactly the tumbling result
    ev = rd.read_parquet(f"{SF}/events.parquet")
    hop = windows.hopping_window(ev, width_sec=3600, slide_sec=3600).to_pandas()
    tum = windows.tumbling_window(ev, width_sec=3600).to_pandas()
    k = ["user_id", "window_start"]
    a = hop.sort_values(k).reset_index(drop=True)
    b = tum.sort_values(k).reset_index(drop=True)
    assert np.array_equal(a["n_events"].to_numpy(), b["n_events"].to_numpy())
    assert np.allclose(a["sum_value"], b["sum_value"])


def test_interval_join_attributes_points():
    from raygraph.joins import interval_join

    iv = pd.DataFrame(
        {
            "k": [1, 1, 2],
            "lo": [0, 100, 50],
            "hi": [10, 110, 60],
            "tag": ["a", "b", "c"],
        }
    )
    pts = pd.DataFrame(
        {
            "k": [1, 1, 1, 2, 2],
            "x": [5, 100, 50, 55, 200],
            "pid": [10, 11, 12, 13, 14],
        }
    )
    out = interval_join(
        rd.from_pandas(pts), rd.from_pandas(iv),
        on="x", by="k", start_col="lo", end_col="hi",
    ).to_pandas().sort_values("pid")
    # pid 10 → a (5∈[0,10]); 11 → b (100∈[100,110]); 12 unmatched
    # (50∉ either k=1 interval); 13 → c; 14 unmatched
    assert list(out["pid"]) == [10, 11, 13]
    assert list(out["tag"]) == ["a", "b", "c"]


def test_multimodal_fake_decode():
    payloads = [b"img-bytes-1", b"img-bytes-2" * 100]
    df = pd.DataFrame({"item_id": [1, 2], "payload": payloads})
    import pyarrow as pa

    t = pa.table({"item_id": pa.array([1, 2], pa.int64()),
                  "payload": pa.array(payloads, pa.binary())})
    out = multimodal.decode_images(rd.from_arrow(t), fake=True).to_pandas()
    assert set(out.columns) == {"item_id", "width", "height", "channels", "feature"}
    assert (out["width"] > 0).all()
    # deterministic
    out2 = multimodal.decode_images(rd.from_arrow(t), fake=True).to_pandas()
    assert np.array_equal(out["width"].to_numpy(), out2["width"].to_numpy())
    with pytest.raises(Exception):
        multimodal.decode_images(rd.from_arrow(t), fake=False).to_pandas()


def test_frame_sample_plan():
    import pyarrow as pa

    t = pa.table({"item_id": pa.array([7], pa.int64()),
                  "duration_sec": pa.array([4.0], pa.float64())})
    out = multimodal.frame_sample_plan(rd.from_arrow(t), fps=0.5).to_pandas()
    assert list(out["frame_ts"]) == [0.0, 2.0]


def test_ivf_index_persisted_matches_fresh(tmp_path):
    emb = rd.read_parquet(f"{SF}/embeddings.parquet")
    import pyarrow.parquet as pq

    edf = pq.read_table(f"{SF}/embeddings.parquet").to_pandas().sort_values("vec_id").head(3)
    Q = np.stack([np.asarray(v, np.float64) for v in edf["embedding"]])
    qids = edf["vec_id"].to_numpy(np.int64)
    idx = knn.IvfIndex.build(emb, num_centroids=8, out_dir=str(tmp_path / "ivf"))
    a = idx.query(Q, qids, k=10, nprobe=4)
    # reload from disk and re-query — identical
    idx2 = knn.IvfIndex.load(str(tmp_path / "ivf"))
    b = idx2.query(Q, qids, k=10, nprobe=4)
    assert a.equals(b)
    # matches the unpersisted path with the same centroids
    c = knn.knn_ivf(emb, Q, qids, k=10, nprobe=4, centroids=idx.centroids)
    assert a.equals(c)


def test_embedding_near_dup_exact_matches_numpy():
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    X = np.stack([np.asarray(v, np.float64) for v in t["embedding"]])
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    S = Xn @ Xn.T
    ids = t["vec_id"].to_numpy(np.int64)
    thresh = 0.4
    want = set()
    iu, ju = np.triu_indices(len(ids), k=1)
    for i, j in zip(iu[S[iu, ju] >= thresh], ju[S[iu, ju] >= thresh]):
        want.add((min(ids[i], ids[j]), max(ids[i], ids[j])))
    got = dedup.embedding_near_dup_pairs(
        rd.read_parquet(f"{SF}/embeddings.parquet"), threshold=thresh
    ).to_pandas()
    assert set(zip(got["a"], got["b"])) == want


def test_embedding_near_dup_lsh_recall():
    thresh = 0.4
    exact = dedup.embedding_near_dup_pairs(
        rd.read_parquet(f"{SF}/embeddings.parquet"), threshold=thresh
    ).to_pandas()
    approx = dedup.embedding_near_dup_lsh(
        rd.read_parquet(f"{SF}/embeddings.parquet"), threshold=thresh,
        num_planes=32, bands=16,
    ).to_pandas()
    te = set(zip(exact["a"], exact["b"]))
    ta = set(zip(approx["a"], approx["b"]))
    # LSH results are a subset of the exact pairs (verify step is exact)...
    assert ta <= te
    # ...with usable recall at these band settings on this data
    if te:
        assert len(ta) / len(te) >= 0.5


def test_ngram_jaccard_dedup_matches_bruteforce():
    import itertools
    import re

    import ray.data as rd

    from raygraph.data.dedup import ngram_jaccard_dedup

    docs = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),
        (2, "a completely different document about graphs"),
        (3, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
        (4, "another unrelated text with no shared trigrams at all"),
    ]
    ds = rd.from_pandas(pd.DataFrame(docs, columns=["doc_id", "text"]))
    got = (
        ngram_jaccard_dedup(ds, n=3, threshold=0.2, max_doc_freq=10)
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    )

    word = re.compile(r"\w+")

    def gramset(t):
        ws = word.findall(t.lower())
        return {" ".join(ws[i:i + 3]) for i in range(len(ws) - 2)}

    sets = {i: gramset(t) for i, t in docs}
    want = []
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        if inter == 0:
            continue
        j = round(inter / len(sets[a] | sets[b]), 6)
        if j >= 0.2:
            want.append((a, b, j))
    want = pd.DataFrame(want, columns=["a", "b", "jaccard"])
    assert got[["a", "b"]].values.tolist() == want[["a", "b"]].values.tolist()
    assert np.allclose(got["jaccard"], want["jaccard"])
    # the exact dup pair scores 1.0
    assert got.set_index(["a", "b"]).loc[(0, 3), "jaccard"] == 1.0


def test_hash_sample_deterministic_and_rate():
    from raygraph.data.sample import hash_sample
    import hashlib

    df = pd.DataFrame({"doc_id": np.arange(4000, dtype=np.int64)})
    out = hash_sample(rd.from_pandas(df), "doc_id", rate=0.25).to_pandas()
    # exact membership oracle
    want = [
        i for i in range(4000)
        if int.from_bytes(hashlib.md5(str(i).encode()).digest()[:4], "big")
        < int(0.25 * 2 ** 32)
    ]
    assert sorted(out["doc_id"]) == want
    assert abs(len(out) / 4000 - 0.25) < 0.03
    # re-run picks the identical subset
    out2 = hash_sample(rd.from_pandas(df), "doc_id", rate=0.25).to_pandas()
    assert sorted(out2["doc_id"]) == sorted(out["doc_id"])


def test_hash_split_stable_and_partitioned():
    from raygraph.data.sample import hash_split

    df = pd.DataFrame({"doc_id": np.arange(5000, dtype=np.int64)})
    out = hash_split(
        rd.from_pandas(df), "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    ).to_pandas()
    assert len(out) == 5000  # every row labeled exactly once
    frac = out["split"].value_counts(normalize=True)
    assert abs(frac["train"] - 0.8) < 0.03
    assert abs(frac["val"] - 0.1) < 0.02
    assert abs(frac["test"] - 0.1) < 0.02
    # membership is a pure function of the id: a salted split differs,
    # the same salt reproduces
    a = hash_split(rd.from_pandas(df), "doc_id", {"a": 0.5, "b": 0.5}).to_pandas()
    b = hash_split(rd.from_pandas(df), "doc_id", {"a": 0.5, "b": 0.5}).to_pandas()
    assert a.sort_values("doc_id")["split"].tolist() == \
        b.sort_values("doc_id")["split"].tolist()
    s = hash_split(rd.from_pandas(df), "doc_id", {"a": 0.5, "b": 0.5},
                   salt="other").to_pandas()
    assert s.sort_values("doc_id")["split"].tolist() != \
        a.sort_values("doc_id")["split"].tolist()


def test_hash_split_rejects_bad_weights():
    from raygraph.data.sample import hash_split

    df = pd.DataFrame({"doc_id": [1, 2]})
    with pytest.raises(ValueError):
        hash_split(rd.from_pandas(df), "doc_id", {"a": 0.5, "b": 0.3})


def test_tfidf_top_terms_small_oracle():
    from raygraph.data.text import tfidf_top_terms

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "apple apple banana",
                "banana cherry cherry cherry",
                "apple banana cherry durian",
            ],
        }
    )
    out = tfidf_top_terms(rd.from_pandas(df), k=2).to_pandas()
    # numpy reference
    import re

    docs = {r.doc_id: re.findall(r"\w+", r.text.lower()) for r in df.itertuples()}
    dfreq = {}
    for ws in docs.values():
        for w in set(ws):
            dfreq[w] = dfreq.get(w, 0) + 1
    rows = []
    for d, ws in docs.items():
        terms, counts = np.unique(ws, return_counts=True)
        scores = np.round(counts * np.log(3.0 / np.array([dfreq[t] for t in terms])), 6)
        order = sorted(zip(-scores, terms))[:2]
        rows += [(d, t, -s) for s, t in order]
    want = pd.DataFrame(rows, columns=["doc_id", "term", "tfidf"])
    key = ["doc_id", "term"]
    a = out.sort_values(key).reset_index(drop=True)[want.columns]
    b = want.sort_values(key).reset_index(drop=True)
    assert a.equals(b)
    # durian (df=1) dominates doc 3
    assert out[(out["doc_id"] == 3)].sort_values("tfidf").iloc[-1]["term"] == "durian"


def test_hll_estimate_accuracy_and_determinism():
    from raygraph.data.sketch import approx_distinct, hll_registers, hll_estimate

    n = 20000
    df = pd.DataFrame({"v": (np.arange(n) % 7919).astype(np.int64)})
    true = 7919
    est = approx_distinct(rd.from_pandas(df), "v", b=10)
    assert abs(est - true) / true < 0.08  # 1.04/sqrt(1024) ≈ 3.3% expected
    # registers identical at different parallelism (pure function of set)
    a = hll_registers(rd.from_pandas(df), "v", b=10).to_pandas()
    b = hll_registers(
        rd.from_pandas(df).repartition(7), "v", b=10
    ).to_pandas()
    key = ["bucket"]
    assert a.sort_values(key).reset_index(drop=True).equals(
        b.sort_values(key).reset_index(drop=True)
    )


def test_hll_linear_counting_small_range():
    from raygraph.data.sketch import approx_distinct

    df = pd.DataFrame({"v": np.arange(40, dtype=np.int64)})
    est = approx_distinct(rd.from_pandas(df), "v", b=10)
    assert abs(est - 40) < 4  # linear counting is near-exact here


def test_repetition_scores_small_oracle():
    from raygraph.data.quality import repetition_scores

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "a b\na b\nc d",  # dup line; bigrams a-b,b-a,a-b,b-c,c-d → top 2/5
                "unique line one\nanother line",
                "word",                    # <2 tokens → bigram frac 0
            ],
        }
    )
    out = repetition_scores(rd.from_pandas(df)).to_pandas().set_index("doc_id")
    assert out.loc[1, "n_lines"] == 3
    # scores are rounded to 6 decimals inside the operator
    assert abs(out.loc[1, "dup_line_frac"] - (1 - 2 / 3)) < 1e-6
    assert abs(out.loc[1, "top_bigram_frac"] - 2 / 5) < 1e-6
    assert out.loc[2, "dup_line_frac"] == 0.0
    assert out.loc[3, "top_bigram_frac"] == 0.0


def test_quantiles_disc_matches_duckdb():
    from raygraph.data.stats import quantiles_disc
    import duckdb

    rng = np.random.RandomState(7)
    df = pd.DataFrame({"v": rng.randint(1, 51, 3000).astype(np.float64)})
    qs = [0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0]
    got = quantiles_disc(rd.from_pandas(df), "v", qs)
    con = duckdb.connect()
    con.register("t", df)
    for q, v in zip(got["q"], got["value"]):
        want = con.execute(f"SELECT quantile_disc(v, {q}) FROM t").fetchone()[0]
        assert v == want, (q, v, want)


def _ppm_bytes(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    return b"P6\n# comment\n%d %d\n255\n" % (w, h) + img.tobytes()


def _bmp_bytes(img: np.ndarray, top_down=False) -> bytes:
    import struct

    h, w, _ = img.shape
    stride = ((24 * w + 31) // 32) * 4
    rows = img if top_down else img[::-1]
    body = b"".join(
        rows[y, :, ::-1].tobytes() + b"\x00" * (stride - 3 * w)
        for y in range(h)
    )
    dib = struct.pack("<IiiHHIIiiII", 40, w, -h if top_down else h, 1, 24,
                      0, len(body), 2835, 2835, 0, 0)
    hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 14 + 40)
    return hdr + dib + body


def _wav_bytes(samples: np.ndarray, rate=8000) -> bytes:
    import struct

    n, ch = samples.shape
    data = (samples * 32767.0).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


def test_multimodal_real_pnm_bmp_decode():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (5, 3, 3), dtype=np.uint8)
    # byte-level decoders round-trip exactly
    np.testing.assert_array_equal(multimodal.decode_pnm(_ppm_bytes(img)), img)
    np.testing.assert_array_equal(multimodal.decode_bmp(_bmp_bytes(img)), img)
    np.testing.assert_array_equal(
        multimodal.decode_bmp(_bmp_bytes(img, top_down=True)), img
    )
    gray = rng.integers(0, 256, (4, 6), dtype=np.uint8)
    pgm = b"P5\n6 4\n255\n" + gray.tobytes()
    np.testing.assert_array_equal(
        multimodal.decode_pnm(pgm), gray[:, :, None]
    )
    # the Ray actor-pool stage with fake=False is REAL for these formats
    import pyarrow as pa

    t = pa.table({
        "item_id": pa.array([1, 2], pa.int64()),
        "payload": pa.array([_ppm_bytes(img), _bmp_bytes(img)], pa.binary()),
    })
    out = multimodal.decode_images(
        rd.from_arrow(t), fake=False, feature_dim=4
    ).to_pandas().sort_values("item_id")
    assert list(out["width"]) == [3, 3] and list(out["height"]) == [5, 5]
    assert list(out["channels"]) == [3, 3]
    # both encodings of the same pixels → identical real features
    f1, f2 = out["feature"].tolist()
    np.testing.assert_allclose(f1, f2)
    assert all(0.0 <= v <= 1.0 for v in f1)


def test_multimodal_real_wav_decode():
    t_ = np.arange(800) / 8000.0
    stereo = np.stack(
        [0.5 * np.sin(2 * np.pi * 440 * t_), 0.25 * np.ones(800)], axis=1
    )
    wav = _wav_bytes(stereo)
    samples, rate = multimodal.decode_wav(wav)
    assert rate == 8000 and samples.shape == (800, 2)
    # encode truncates to int16 (scale 32767), decode divides by 32768
    np.testing.assert_allclose(samples, stereo, atol=2.5 / 32768)

    import pyarrow as pa

    t = pa.table({"item_id": pa.array([9], pa.int64()),
                  "payload": pa.array([wav], pa.binary())})
    out = multimodal.decode_audio(rd.from_arrow(t), feature_dim=4).to_pandas()
    assert out.loc[0, "sample_rate"] == 8000
    assert out.loc[0, "channels"] == 2
    assert out.loc[0, "n_samples"] == 800
    mono = stereo.mean(axis=1)
    exp = [np.sqrt(np.mean(mono[k * 200:(k + 1) * 200] ** 2))
           for k in range(4)]
    np.testing.assert_allclose(out.loc[0, "feature"], exp, atol=1e-4)


def test_duplicate_ngram_spans_semantics():
    # Lee et al.-style exact-substring span dedup: two docs share a
    # 12-token run; spans must cover exactly the shared run's token
    # indices in each doc (merged from the 5 overlapping 8-grams), and a
    # third unrelated doc must yield no span.
    import ray.data as rd

    from raygraph.data.dedup import duplicate_ngram_spans

    shared = "the quick brown fox jumps over the lazy dog again and again"
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [
            "alpha beta " + shared + " gamma delta",
            "start words here then " + shared + " end of doc two",
            "completely different text with no overlap at all whatsoever",
        ],
    })
    out = (
        duplicate_ngram_spans(rd.from_pandas(docs), n=8)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert out.to_dict("list") == {
        "doc_id": [1, 2],
        "span_start": [2, 4],     # shared run starts at token 2 / 4
        "span_end": [14, 16],     # 12 shared tokens
        "n_grams": [5, 5],        # 12 - 8 + 1 overlapping grams merged
    }

    # within-doc repetition alone (one doc) is NOT a cross-doc duplicate
    solo = pd.DataFrame({
        "doc_id": [7],
        "text": [(shared + " ") * 3],
    })
    assert duplicate_ngram_spans(rd.from_pandas(solo), n=8).count() == 0

    # touching spans merge: doc 8 duplicates doc 9's text twice
    # back-to-back, so doc 8's two hit regions form one merged span
    two = pd.DataFrame({
        "doc_id": [8, 9],
        "text": [shared + " " + shared, shared],
    })
    got = (
        duplicate_ngram_spans(rd.from_pandas(two), n=8)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    d8 = got[got["doc_id"] == 8]
    assert len(d8) == 1 and int(d8["span_start"].iloc[0]) == 0
    assert int(d8["span_end"].iloc[0]) == 24


def test_remove_duplicate_spans_cuts_original_text():
    import ray.data as rd

    from raygraph.data.dedup import duplicate_ngram_spans, remove_duplicate_spans

    shared = "one two three four five six seven eight nine ten eleven twelve"
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [
            "Keep-A " + shared + " Keep-B",
            shared,
            "untouched document with completely different words inside it",
        ],
    })
    ds = rd.from_pandas(docs)
    spans = duplicate_ngram_spans(ds, n=8)
    out = (
        remove_duplicate_spans(ds, spans)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    # doc 1: the 12 shared tokens (chars of "one ... twelve") cut out,
    # surrounding original text (case, punctuation, spacing) preserved
    assert out.loc[0, "text"] == "Keep-A  Keep-B"
    assert out.loc[0, "n_removed_tokens"] == 12
    assert out.loc[1, "text"] == ""  # fully duplicated doc -> emptied
    assert out.loc[1, "n_removed_tokens"] == 12
    # doc 3 passes through untouched
    assert out.loc[2, "text"] == docs.loc[2, "text"]
    assert out.loc[2, "n_removed_tokens"] == 0


def test_extract_json_field_fast_path_and_fallback():
    import ray.data as rd

    from raygraph.data.semistructured import extract_json_field

    df = pd.DataFrame({
        "id": [1, 2, 3, 4, 5, 6],
        "props": [
            '{"k": 42, "name": "alpha"}',          # flat -> regex fast path
            '{"other": 1}',                         # absent -> NA
            '{"nested": {"k": 9}, "k": 7}',         # fallback: loads top-level k
            '{"k": -3.5}',                          # float in int context
            '{"name": "with \\"quote\\""}',         # escaped string -> fallback
            'not json at all',                      # unparseable -> NA
        ],
    })
    ds = rd.from_pandas(df)
    out = (
        extract_json_field(ds, "k", as_type="int64")
        .to_pandas().sort_values("id").reset_index(drop=True)
    )
    ks = out["k"].tolist()
    assert ks[0] == 42 and pd.isna(ks[1]) and ks[2] == 7
    assert ks[3] == -3  # non-integral payloads truncate toward zero
    assert pd.isna(ks[5])

    names = (
        extract_json_field(ds, "name", as_type="string")
        .to_pandas().sort_values("id")["name"].tolist()
    )
    assert names[0] == "alpha"
    assert names[4] == 'with "quote"'  # escaped string via json.loads


def test_quantiles_cont_matches_exact_order_stats():
    from raygraph.data.stats import quantiles_cont

    rng = np.random.RandomState(11)
    # continuous values incl. negatives, ties, and NaNs (ignored)
    v = np.concatenate([
        rng.randn(5000) * 100.0,
        np.repeat(3.25, 40),
        [np.nan, np.nan, -0.0, 0.0],
    ])
    df = pd.DataFrame({"v": v})
    clean = np.sort(v[~np.isnan(v)])
    qs = [0.0, 0.01, 0.25, 0.5, 0.75, 0.99, 1.0]

    def want(q):
        return clean[max(1, int(np.ceil(q * len(clean)))) - 1]

    got = quantiles_cont(rd.from_pandas(df), "v", qs)
    for q, val in zip(got["q"], got["value"]):
        assert val == want(q), (q, val, want(q))
    # forced full-radix path (never pulls; resolves all 64 bits from counts)
    got2 = quantiles_cont(rd.from_pandas(df), "v", qs, pull_limit=0)
    assert got2["value"].tolist() == got["value"].tolist()


def test_stratified_sample_matches_hash_rank_oracle():
    from raygraph.data.sample import stratified_sample
    import hashlib

    rng = np.random.RandomState(5)
    df = pd.DataFrame({
        "doc_id": np.arange(2000, dtype=np.int64),
        "g": rng.choice(["en", "de", "fr", "rare"], 2000,
                        p=[0.7, 0.15, 0.14, 0.01]),
    })
    out = stratified_sample(rd.from_pandas(df), "g", "doc_id", 7).to_pandas()

    h = df["doc_id"].map(
        lambda i: int.from_bytes(
            hashlib.md5(str(i).encode()).digest()[:4], "big")
    )
    want = (
        df.assign(__h=h)
        .sort_values(["g", "__h", "doc_id"])
        .groupby("g", sort=False)
        .head(7)[["doc_id", "g"]]
    )
    assert sorted(out.columns) == ["doc_id", "g"]
    got = out.sort_values(["g", "doc_id"]).reset_index(drop=True)
    exp = want.sort_values(["g", "doc_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)
    # every group capped at 7; the rare group keeps all its rows if < 7
    sizes = got.groupby("g").size()
    assert (sizes <= 7).all()
    assert sizes["rare"] == min(7, (df["g"] == "rare").sum())


def _png_bytes(img: np.ndarray, filters=None, ctype=None) -> bytes:
    """Minimal PNG encoder for fixtures: 8-bit non-interlaced, one
    chosen filter per row (exercises every unfilter branch)."""
    import struct
    import zlib

    h, w = img.shape[:2]
    ch = 1 if img.ndim == 2 else img.shape[2]
    if ctype is None:
        ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    flat = img.reshape(h, w * ch).astype(np.int32)
    filters = filters or [0] * h
    raster = bytearray()
    prev = np.zeros(w * ch, np.int32)
    for y in range(h):
        f = filters[y]
        cur = flat[y]
        if f == 0:
            enc = cur
        elif f == 1:  # Sub
            left = np.zeros_like(cur)
            left[ch:] = cur[:-ch]
            enc = (cur - left) % 256
        elif f == 2:  # Up
            enc = (cur - prev) % 256
        elif f == 3:  # Average
            left = np.zeros_like(cur)
            left[ch:] = cur[:-ch]
            enc = (cur - (left + prev) // 2) % 256
        elif f == 4:  # Paeth
            left = np.zeros_like(cur)
            left[ch:] = cur[:-ch]
            ul = np.zeros_like(cur)
            ul[ch:] = prev[:-ch]
            p = left + prev - ul
            pa_, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where((pa_ <= pb) & (pa_ <= pc), left,
                            np.where(pb <= pc, prev, ul))
            enc = (cur - pred) % 256
        raster.append(f)
        raster.extend(enc.astype(np.uint8).tobytes())
        prev = cur

    def chunk(cid, body):
        return (struct.pack(">I", len(body)) + cid + body
                + struct.pack(">I", zlib.crc32(cid + body)))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raster)))
            + chunk(b"IEND", b""))


def test_multimodal_real_png_decode():
    """Real PNG decode (stdlib zlib): every filter type, gray / RGB /
    RGBA / palette color types, and the decode_images pipeline."""
    import pyarrow as pa

    rng = np.random.RandomState(11)
    rgb = rng.randint(0, 256, size=(7, 5, 3), dtype=np.uint8)
    for filters in ([0] * 7, [1] * 7, [2] * 7, [3] * 7, [4] * 7,
                    [0, 1, 2, 3, 4, 2, 1]):
        got = multimodal.decode_png(_png_bytes(rgb, filters=filters))
        np.testing.assert_array_equal(got, rgb)
    gray = rng.randint(0, 256, size=(4, 6), dtype=np.uint8)
    np.testing.assert_array_equal(
        multimodal.decode_png(_png_bytes(gray, filters=[4, 3, 2, 1])),
        gray[:, :, None],
    )
    rgba = rng.randint(0, 256, size=(3, 3, 4), dtype=np.uint8)
    np.testing.assert_array_equal(
        multimodal.decode_png(_png_bytes(rgba, filters=[1, 4, 3])), rgba
    )
    # palette: encode indices with ctype 3 + hand-built PLTE chunk
    import struct
    import zlib as _z
    pal = rng.randint(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.randint(0, 16, size=(5, 4), dtype=np.uint8)
    png = _png_bytes(idx, filters=[0, 1, 2, 3, 4], ctype=3)
    plte_body = pal.tobytes()
    plte = (struct.pack(">I", len(plte_body)) + b"PLTE" + plte_body
            + struct.pack(">I", _z.crc32(b"PLTE" + plte_body)))
    head_end = 8 + 12 + 13  # magic + IHDR chunk
    png = png[:head_end] + plte + png[head_end:]
    np.testing.assert_array_equal(multimodal.decode_png(png), pal[idx])
    # dispatch + pipeline
    np.testing.assert_array_equal(
        multimodal.decode_image_bytes(_png_bytes(rgb)), rgb)
    ds = rd.from_arrow(pa.table({
        "item_id": pa.array([1, 2], pa.int64()),
        "payload": pa.array(
            [_png_bytes(rgb, filters=[4] * 7), _png_bytes(gray)],
            pa.binary()),
    }))
    out = multimodal.decode_images(ds, feature_dim=4).to_pandas()
    out = out.sort_values("item_id").reset_index(drop=True)
    assert list(out["width"]) == [5, 6] and list(out["height"]) == [7, 4]
    assert list(out["channels"]) == [3, 1]
    # interlaced / 16-bit rejected honestly
    bad = bytearray(_png_bytes(rgb))
    bad[8 + 8 + 12] = 1  # interlace byte inside IHDR
    with pytest.raises(NotImplementedError):
        multimodal.decode_png(bytes(bad))

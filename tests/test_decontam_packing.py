"""Tests for benchmark decontamination and sequence-packing offsets."""

import numpy as np
import pandas as pd
import ray.data as rd

from raygraph.data import decontam, packing
from raygraph.data.text import _WORD


def _gramset(t, n):
    ws = _WORD.findall(t.lower())
    return {" ".join(ws[j : j + n]) for j in range(len(ws) - n + 1)}


BENCH = [
    "the quick brown fox jumps over the lazy dog",
    "to be or not to be that is the question",
]
CORPUS = [
    (0, "a totally clean document about distributed prefix sums"),
    (1, "he said the quick brown fox jumps over whatever"),  # 1 shared 5-gram? check below
    (2, "to be or not to be that is the question entirely verbatim"),
    (3, "short"),
    (4, "be or not to be that is the question AND the quick brown fox jumps over it"),
    (5, "fox jumps over the lazy dog said nobody ever"),
]


def test_contamination_report_matches_set_oracle():
    n = 5
    ref = decontam.build_benchmark(BENCH, n)
    bench_grams = set().union(*(_gramset(t, n) for t in BENCH))
    want = {}
    for i, t in CORPUS:
        c = len(_gramset(t, n) & bench_grams)
        if c:
            want[i] = c
    assert want, "fixture must plant at least one contaminated doc"
    ds = rd.from_pandas(
        pd.DataFrame({"doc_id": [i for i, _ in CORPUS], "text": [t for _, t in CORPUS]})
    )
    out = decontam.contamination_report(ds, ref).to_pandas()
    got = dict(zip(out["doc_id"], out["n_hit_grams"]))
    assert got == want


def test_decontaminate_drops_exactly_the_hits():
    n = 5
    ref = decontam.build_benchmark(BENCH, n)
    bench_grams = set().union(*(_gramset(t, n) for t in BENCH))
    keep_ids = {i for i, t in CORPUS if not (_gramset(t, n) & bench_grams)}
    ds = rd.from_pandas(
        pd.DataFrame({"doc_id": [i for i, _ in CORPUS], "text": [t for _, t in CORPUS]})
    )
    out = decontam.decontaminate(ds, ref).to_pandas()
    assert set(out["doc_id"]) == keep_ids
    assert list(out.columns) == ["doc_id", "text"]  # all input columns kept


def test_member_rescans_duplicate_hash_range():
    # Construct a synthetic duplicate-hash benchmark: two entries with the
    # query gram's hash but only the second string actually matching.
    qg = np.array(["a b c"], dtype=object)
    qh = pd.util.hash_array(qg)[0]
    bench_h = np.array([qh, qh], dtype=np.uint64)
    bench_g = np.array(["not it", "a b c"], dtype=object)
    assert decontam._member(bench_h, bench_g, qg).tolist() == [True]
    # ... and a pure hash collision with NO string match stays a miss.
    bench_g2 = np.array(["not it", "also not"], dtype=object)
    assert decontam._member(bench_h, bench_g2, qg).tolist() == [False]


def test_empty_benchmark_and_short_docs():
    ref = decontam.build_benchmark([], 5)
    ds = rd.from_pandas(pd.DataFrame({"doc_id": [1], "text": ["tiny"]}))
    assert decontam.contamination_report(ds, ref).to_pandas().empty
    assert len(decontam.decontaminate(ds, ref).to_pandas()) == 1


def test_sequence_offsets_matches_pandas_scan():
    rng = np.random.default_rng(42)
    ids = rng.permutation(500)  # shuffled, unique, dense
    counts = rng.integers(1, 300, size=500)
    df = pd.DataFrame({"doc_id": ids, "n_tokens": counts})
    out = (
        packing.sequence_offsets(
            rd.from_pandas(df), "n_tokens", "doc_id", seq_len=128, num_buckets=7
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = df.sort_values("doc_id").reset_index(drop=True)
    start = np.concatenate(([0], np.cumsum(want["n_tokens"].to_numpy())[:-1]))
    assert np.array_equal(out["doc_id"].to_numpy(), want["doc_id"].to_numpy())
    assert np.array_equal(out["n_tokens"].to_numpy(), want["n_tokens"].to_numpy())
    assert np.array_equal(out["start_offset"].to_numpy(), start)
    assert np.array_equal(out["first_seq"].to_numpy(), start // 128)
    assert np.array_equal(
        out["last_seq"].to_numpy(),
        (start + want["n_tokens"].to_numpy() - 1) // 128,
    )


def test_sequence_offsets_sparse_ids_and_known_max():
    # Non-contiguous ids and an explicit order_max (skips the max() pass).
    df = pd.DataFrame({"k": [1000, 5, 70, 999999], "c": [3, 10, 1, 2]})
    out = (
        packing.sequence_offsets(
            rd.from_pandas(df), "c", "k", seq_len=4, order_max=999999, num_buckets=3
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert out["start_offset"].tolist() == [0, 10, 11, 14]
    assert out["first_seq"].tolist() == [0, 2, 2, 3]
    assert out["last_seq"].tolist() == [2, 2, 3, 3]

"""Tests for the Bloom filter semi-join primitive."""

import hashlib

import numpy as np
import pandas as pd
import ray.data as rd

from raygraph.data import bloom


def _ref_bits(values, k, m):
    out = set()
    for v in set(values):
        for i in range(k):
            out.add(
                int.from_bytes(
                    hashlib.md5(f"{i}:{v}".encode()).digest()[:4], "big"
                ) % m
            )
    return out


def test_bloom_bits_matches_sequential_oracle():
    vals = list(np.random.default_rng(3).integers(0, 200, size=1000))
    ds = rd.from_pandas(pd.DataFrame({"k": vals})).repartition(8)
    got = set(bloom.bloom_bits(ds, "k", m_bits=4096, k=3).to_pandas()["bit"])
    assert got == _ref_bits(vals, 3, 4096)


def test_no_false_negatives_and_bounded_false_positives():
    member = np.arange(500)
    ds = rd.from_pandas(pd.DataFrame({"k": member})).repartition(4)
    bf = bloom.bloom_build(ds, "k", m_bits=1 << 14, k=4)
    assert bloom.bloom_probe(bf, member).all()  # never a false negative
    absent = np.arange(10_000, 12_000)
    fp = bloom.bloom_probe(bf, absent).mean()
    # theoretical fp ≈ (1-e^{-kn/m})^4 ≈ 1.2e-4 at n=500,m=16384,k=4
    assert fp < 0.01


def test_bloom_semi_join_exact_mode():
    big = pd.DataFrame({"k": np.arange(5000) % 700, "v": np.arange(5000)})
    small = pd.DataFrame({"k": [3, 77, 699, 699]})
    bf = bloom.bloom_build(rd.from_pandas(small), "k", m_bits=1 << 12, k=3)
    # approximate: superset of the true matches, no false negatives
    approx = bloom.bloom_semi_join(
        rd.from_pandas(big).repartition(4), bf, "k"
    ).to_pandas()
    want = set(big[big["k"].isin([3, 77, 699])]["v"])
    assert want <= set(approx["v"])
    # exact mode: precisely the inner-semi-join rows
    exact = bloom.bloom_semi_join(
        rd.from_pandas(big).repartition(4), bf, "k",
        exact_with=rd.from_pandas(small),
    ).to_pandas()
    assert set(exact["v"]) == want
    assert list(exact.columns)[:2] == ["k", "v"]


def test_empty_sides():
    bf = bloom.bloom_build(
        rd.from_pandas(pd.DataFrame({"k": pd.Series(dtype=np.int64)})),
        "k", m_bits=256, k=2,
    )
    assert bloom.bloom_probe(bf, [1, 2]).sum() == 0
    big = rd.from_pandas(pd.DataFrame({"k": [1, 2], "v": [10, 20]}))
    assert len(bloom.bloom_semi_join(big, bf, "k").to_pandas()) == 0

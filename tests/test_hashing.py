"""Murmur2 golden vectors (OutboxTest.java:263-268,429-431) + vectorized
kernel equivalence. Pure Python/numpy — no Ray."""

import random

import numpy as np
import pyarrow as pa

from connect_smts_ray.core.hashing import (
    murmur2,
    murmur2_positive,
    murmur2_positive_many,
    sha256_hex,
)


def test_golden_vectors():
    assert murmur2_positive(b"some-partition-key") % 3 == 1
    assert murmur2_positive(b"another-partition-key") % 3 == 2
    assert murmur2_positive(b"1234-5678") % 3 == 2


def test_murmur2_signed_range():
    # murmur2 returns a signed 32-bit value like Java
    for s in [b"", b"a", b"ab", b"abc", b"abcd", b"abcde"]:
        v = murmur2(s)
        assert -(2**31) <= v < 2**31


def test_vectorized_matches_scalar():
    rng = random.Random(7)
    keys = [
        bytes(rng.randrange(256) for _ in range(rng.randrange(0, 40)))
        for _ in range(500)
    ]
    got = murmur2_positive_many(keys)
    want = np.array([murmur2_positive(k) for k in keys], dtype=np.uint32)
    assert (got == want).all()


def test_vectorized_arrow_string_input():
    arr = pa.array(["some-partition-key", "another-partition-key", "1234-5678"])
    got = murmur2_positive_many(arr) % 3
    assert list(got) == [1, 2, 2]


def test_sha256():
    assert sha256_hex("abc") == (
        "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad"
    )

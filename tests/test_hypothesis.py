"""Property-based tests (hypothesis) on the pure-Python pieces -- no Spark
session needed, so hundreds of generated examples run in seconds.  The
reference has no property-based testing (SURVEY.md §5); this is the extra
leg our strategy adds on top of round-trip and oracle-parity tests."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from json_format_in_parquet_benchmark_spark.formats.jsonc_tape import (
    decode_tape,
    encode_tape,
)
from json_format_in_parquet_benchmark_spark.functions.hashing import (
    P31,
    perm_consts,
)
from json_format_in_parquet_benchmark_spark.operators.similarity import (
    centroids,
    hyperplanes,
)

# Finite doubles only: the tape's number pool is float64 but JSON itself has
# no NaN/Inf (the reference's corpora never contain them either).
json_values = st.recursive(
    st.none()
    | st.booleans()
    | st.floats(allow_nan=False, allow_infinity=False)
    | st.text(max_size=20),
    lambda children: st.lists(children, max_size=5)
    | st.dictionaries(st.text(max_size=10), children, max_size=5),
    max_leaves=25,
)


@given(json_values)
@settings(max_examples=300, deadline=None)
def test_tape_roundtrip_any_json_value(v):
    """encode_tape/decode_tape is lossless for every JSON value whose
    numbers are float64-representable (mirrors reference jsonc semantics)."""
    assert decode_tape(*encode_tape(v)) == v


@given(st.integers(min_value=1, max_value=64))
@settings(max_examples=50, deadline=None)
def test_perm_consts_are_valid_universal_hash_params(k):
    consts = perm_consts(k)
    assert len(consts) == k
    assert len(set(consts)) == k  # distinct permutations
    for a, b in consts:
        assert 1 <= a < P31 and 0 <= b < P31
        # closure under the permutation: exact int64 arithmetic guaranteed
        assert a * (P31 - 1) + b < 2**63


@given(st.integers(min_value=0, max_value=2**60 - 1))
@settings(max_examples=200, deadline=None)
def test_permutations_stay_in_field(h):
    for a, b in perm_consts(16):
        out = (a * (h % P31) + b) % P31
        assert 0 <= out < P31


def test_deterministic_geometry_is_stable():
    """Hyperplanes/centroids must never drift across calls or processes --
    every oracle SQL literal depends on these exact values."""
    h1, h2 = hyperplanes(4, 8), hyperplanes(4, 8)
    c1, c2 = centroids(4, 8), centroids(4, 8)
    assert h1 == h2 and c1 == c2
    assert all(abs(x) <= 1.0 and math.isfinite(x) for w in h1 + c1 for x in w)
    # spot-pin two values so accidental scheme changes fail loudly
    assert h1[0][0] == hyperplanes(1, 1)[0][0]

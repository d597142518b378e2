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


# --- round-6 interval/geometry semantics, independent of both engines --------

_intervals = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=400),
        st.integers(min_value=1, max_value=120),
    ),
    min_size=1,
    max_size=40,
)


@given(_intervals, st.integers(min_value=10, max_value=100))
@settings(max_examples=300, deadline=None)
def test_sweep_bucket_decomposition_matches_bruteforce(raw, width):
    """events_concurrency_peak semantics: the bucketed two-phase sweep
    (per-bucket peer-inclusive running sums + carry offsets, ends before
    starts at equal t) must equal brute-force concurrency counting of
    half-open intervals [s, e) evaluated at every boundary instant.
    This is an INDEPENDENT check: the DuckDB oracle shares the sweep
    formulation, so only a from-scratch counter can catch a tie or
    frame-semantics bug in both engines at once."""
    ivals = [(s, s + d) for s, d in raw]
    bounds = [(s, 1) for s, _ in ivals] + [(e, -1) for _, e in ivals]

    # Two-phase sweep exactly as the query computes it: bucket by
    # t // width, within-bucket RANGE-frame cumsum over (t, delta)
    # order (peer-inclusive), carry = total delta of earlier buckets.
    from collections import defaultdict

    per_bucket: dict[int, list[tuple[int, int]]] = defaultdict(list)
    for t, d in bounds:
        per_bucket[t // width].append((t, d))
    carry, sweep_peak = 0, {}
    for b in sorted(per_bucket):
        rows = sorted(per_bucket[b])
        # peer-inclusive running sum: all rows with the same (t, delta)
        # key see the sum through the END of their peer group
        pref, i, vals = 0, 0, []
        while i < len(rows):
            j = i
            while j < len(rows) and rows[j][:2] == rows[i][:2]:
                j += 1
            pref += sum(d for _, d in rows[i:j])
            vals.extend([pref] * (j - i))
            i = j
        sweep_peak[b] = carry + max(vals)
        carry += pref

    # Brute force: concurrency of [s, e) at each boundary instant.
    def conc_at(t: int) -> int:
        return sum(1 for s, e in ivals if s <= t < e)

    for b, peak in sweep_peak.items():
        brute = max(
            conc_at(t) for t, _ in per_bucket[b]
        )
        assert peak == brute, (b, peak, brute, ivals)


_pip_edge = st.tuples(
    st.integers(min_value=0, max_value=1000),  # y1
    st.integers(min_value=0, max_value=1000),  # x1
    st.integers(min_value=1, max_value=1000),  # dy > 0
    st.integers(min_value=-1000, max_value=1000),  # dx
)


@given(
    _pip_edge,
    st.integers(min_value=0, max_value=2000),
    st.integers(min_value=0, max_value=2000),
)
@settings(max_examples=500, deadline=None)
def test_pip_integer_left_test_matches_rational(edge, py, px):
    """join_point_in_polygon's division-free crossing test
    (2*py+1-2*y1)*dx < (2*px+1-2*x1)*dy must agree with the exact
    rational x-intersection comparison x1 + (py+0.5-y1)*dx/dy < px+0.5
    for every integer point and dy>0 edge.  For AXIS-PARALLEL edges the
    half-integer offsets make exact ties impossible; a diagonal edge CAN
    cross exactly at px + 1/2 (hypothesis found (1,1,1,1)/py=1/px=1) --
    there the strict < resolves the tie identically in both
    formulations, which is what the parity needs."""
    from fractions import Fraction

    y1, x1, dy, dx = edge
    y2 = y1 + dy
    if not (y1 <= py < y2):
        return  # ray does not cross; both formulations skip the edge
    x_int = Fraction(x1) + (Fraction(py) + Fraction(1, 2) - y1) * Fraction(
        dx, dy
    )
    rational = x_int < Fraction(px) + Fraction(1, 2)
    integer = (2 * py + 1 - 2 * y1) * dx < (2 * px + 1 - 2 * x1) * dy
    assert rational == integer, (edge, py, px)
    if dx == 0:
        # axis-parallel edges can never tie the half-integer ray
        assert x_int != Fraction(px) + Fraction(1, 2)

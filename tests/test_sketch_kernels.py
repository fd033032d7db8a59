"""Kernel unit tests mirroring the reference's test strategy (SURVEY §5):
distribution sweeps with the reference's own tolerances
(quantile atol 0.012 / cdf atol 0.005, crick/tests/test_tdigest.py:99-107),
merge ≡ whole-data equivalence, exact top-k recovery on skewed data
(crick/tests/test_space_saving.py:34-41), and numpy moment oracles
(crick/tests/test_stats.py:26-88 uses scipy; we compute the same forms
directly)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from crick_spark.sketches import Moments, SpaceSaving, TDigest

N = 100_000
rng = np.random.default_rng(42)

# the reference's 8 distribution shapes (crick/tests/test_tdigest.py:9-49)
DISTS = {
    "gamma": rng.gamma(0.1, 0.1, N),
    "uniform": rng.uniform(0, 1, N),
    "normal_narrow": rng.normal(0, 1e-5, N),
    "sequential": np.arange(N) * 1e-5,
    "reverse_sequential": np.arange(N, 0, -1) * 1e-5,
    "mixed": rng.permutation(
        np.concatenate([rng.normal(0, 1e-5, N // 2), rng.uniform(-1, 1, N // 2)])
    ),
    "step": rng.permutation(np.repeat(np.arange(N // 100), 100)).astype(float),
    "sorted_step": np.repeat(np.arange(N // 100), 100).astype(float),
}

QS = np.array([0.001, 0.01, 0.1, 0.3, 0.5, 0.7, 0.9, 0.99, 0.999])


def true_quantile_error(data: np.ndarray, est: np.ndarray, qs: np.ndarray) -> np.ndarray:
    """Error measured in q-space like the reference (test_tdigest.py:87-102):
    |cdf_true(q̂_est) − q|."""
    s = np.sort(data)
    lt = np.searchsorted(s, est, side="left")
    rt = np.searchsorted(s, est, side="right")
    cdf_at_est = (lt + rt) / 2.0 / len(s)
    return np.abs(cdf_at_est - qs)


def true_cdf(data: np.ndarray, xs: np.ndarray) -> np.ndarray:
    s = np.sort(data)
    lt = np.searchsorted(s, xs, side="left")
    rt = np.searchsorted(s, xs, side="right")
    return (lt + rt) / 2.0 / len(s)


# ---------------------------------------------------------------------------
# TDigest
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("dist", list(DISTS))
def test_tdigest_quantile_accuracy(dist):
    data = DISTS[dist]
    d = TDigest.from_values(data)
    est = d.quantile(QS)
    err = true_quantile_error(data, est, QS)
    assert err.max() <= 0.012, f"{dist}: max q-error {err.max():.4f}"


@pytest.mark.parametrize("dist", list(DISTS))
def test_tdigest_cdf_accuracy(dist):
    data = DISTS[dist]
    d = TDigest.from_values(data)
    xs = np.quantile(data, QS)
    err = np.abs(d.cdf(xs) - true_cdf(data, xs))
    assert err.max() <= 0.005, f"{dist}: max cdf-error {err.max():.4f}"


@pytest.mark.parametrize("dist", ["gamma", "uniform", "step"])
def test_tdigest_merge_accuracy(dist):
    """Merged disjoint digests keep the bounds (test_tdigest.py:377-405)."""
    data = DISTS[dist]
    parts = np.array_split(data, 8)
    merged = TDigest(compression=100.0).merge(
        *[TDigest.from_values(p) for p in parts]
    )
    est = merged.quantile(QS)
    err = true_quantile_error(data, est, QS)
    assert err.max() <= 0.012
    assert merged.min() == data.min() and merged.max() == data.max()
    assert math.isclose(merged.size(), len(data))


def test_tdigest_invariants():
    data = DISTS["gamma"]
    d = TDigest.from_values(data)
    qs = np.linspace(0, 1, 101)
    est = d.quantile(qs)
    assert np.all(np.diff(est) >= -1e-12)  # monotone (test_tdigest.py:72-78)
    assert est.min() >= data.min() and est.max() <= data.max()
    cdfs = d.cdf(np.linspace(data.min(), data.max(), 101))
    assert np.all((cdfs >= 0) & (cdfs <= 1))
    # bounded state (tdigest_stubs.c:65): ≤ 2·ceil(c) centroids
    assert d.means.size <= 2 * math.ceil(d.compression)


def test_tdigest_edge_cases():
    empty = TDigest.from_values(np.array([]))
    assert math.isnan(empty.quantile(0.5)) and math.isnan(empty.cdf(1.0))
    single = TDigest.from_values(np.array([7.0]))
    assert single.quantile(0.5) == 7.0
    assert single.cdf(7.0) == 0.5  # midpoint convention
    assert single.cdf(8.0) == 1.0 and single.cdf(6.0) == 0.0
    # NaN/Inf skipped (tdigest_stubs.c:283-286)
    d = TDigest.from_values(np.array([1.0, np.nan, np.inf, -np.inf, 3.0]))
    assert d.size() == 2.0
    # exact min/max
    assert d.min() == 1.0 and d.max() == 3.0


def test_tdigest_weighted():
    """Weighted ingest ≈ repeated values (test_tdigest.py:347-361): the
    weighted digest must hit the repeated stream's quantiles within the
    reference tolerance."""
    r = np.random.default_rng(5)
    x = np.round(r.uniform(0, 100, 10_000), 1)
    w = r.integers(1, 4, x.size).astype(float)
    d = TDigest.from_values(x, w)
    repeated = np.repeat(x, w.astype(int))
    est = d.quantile(QS)
    err = true_quantile_error(repeated, est, QS)
    assert err.max() <= 0.012
    assert math.isclose(d.size(), w.sum())


def test_tdigest_scale():
    d = TDigest.from_values(DISTS["uniform"])
    s = d.scale(0.5)
    assert math.isclose(s.size(), d.size() * 0.5)
    assert np.allclose(s.quantile(QS), d.quantile(QS))
    with pytest.raises(ValueError):
        d.scale(-1.0)


def test_tdigest_histogram():
    data = DISTS["uniform"]
    d = TDigest.from_values(data)
    hist, edges = d.histogram(bins=10, range=(0.0, 1.0))
    true_hist, _ = np.histogram(data, bins=10, range=(0.0, 1.0))
    assert math.isclose(hist.sum(), len(data), rel_tol=1e-6)
    assert np.abs(hist - true_hist).max() / len(data) <= 0.005
    with pytest.raises(ValueError):
        d.histogram(bins=10, range=(1.0, 0.0))


# ---------------------------------------------------------------------------
# SpaceSaving
# ---------------------------------------------------------------------------
def _skewed_items(seed: int, n: int = 10_000) -> np.ndarray:
    r = np.random.default_rng(seed)
    return np.round(r.gamma(0.1, 0.1, n), 2) * 100  # test_space_saving.py:11-14


def test_spacesaving_exact_recovery():
    """Top-10 of skewed data exact at capacity 20 (test_space_saving.py:34-41)."""
    items = _skewed_items(42)
    sk = SpaceSaving.from_batch(items, capacity=20)
    uniq, cnt = np.unique(items, return_counts=True)
    order = np.lexsort((uniq, -cnt))
    true_top = [(uniq[i], cnt[i]) for i in order[:10]]
    est = sk.topk(10)
    for (ti, tc), (ei, ec, ee) in zip(true_top, est):
        assert ti == ei and tc == ec, (true_top, est)


def test_spacesaving_error_bounds():
    """Overestimate bound count−error ≤ actual ≤ count (the C eviction
    semantics, space_saving_stubs.c.in:226-237; the pyx docstring's
    inverted form is an adjudicated reference doc bug — SURVEY §7.3),
    via merge of partitioned streams."""
    items = _skewed_items(7, 50_000)
    parts = np.array_split(items, 16)
    sks = [SpaceSaving.from_batch(p, capacity=50) for p in parts]
    merged = sks[0].merge(*sks[1:])
    exact = dict(zip(*np.unique(items, return_counts=True)))
    for item, count, error in merged.topk(50):
        actual = exact[item]
        assert count - error <= actual <= count, (item, count, error, actual)


def test_spacesaving_merge_equals_whole_for_top_items():
    items = _skewed_items(3, 40_000)
    whole = SpaceSaving.from_batch(items, capacity=40)
    parts = np.array_split(items, 8)
    merged = SpaceSaving(capacity=40).merge(
        *[SpaceSaving.from_batch(p, capacity=40) for p in parts]
    )
    # heavy hitters agree exactly between single-pass and merged
    top_w = [(i, c) for i, c, _ in whole.topk(5)]
    top_m = [(i, c) for i, c, _ in merged.topk(5)]
    assert top_w == top_m


def test_spacesaving_weighted_and_types():
    sk = SpaceSaving.from_batch(
        np.array(["a", "b", "a", "c"]), np.array([5, 2, 1, 1]), capacity=10
    )
    assert sk.topk(2) == [("a", 6, 0), ("b", 2, 0)]
    with pytest.raises(ValueError):
        SpaceSaving(capacity=0)


def test_spacesaving_bounded_state():
    items = np.arange(10_000)  # all distinct
    sk = SpaceSaving.from_batch(items, capacity=20)
    assert sk.size() <= 20


# ---------------------------------------------------------------------------
# Moments
# ---------------------------------------------------------------------------
def _np_skew(x):
    d = x - x.mean()
    return (d**3).mean() / (d**2).mean() ** 1.5


def _np_kurt(x):
    d = x - x.mean()
    return (d**4).mean() / (d**2).mean() ** 2 - 3.0


def test_moments_vs_numpy():
    x = np.random.default_rng(1).normal(50, 100, 10_000)
    x[::10] = np.nan  # 10% NaN like the reference fixture (test_stats.py:9-11)
    m = Moments.from_values(x)
    clean = x[~np.isnan(x)]
    assert m.n == clean.size
    assert math.isclose(m.s, clean.sum(), rel_tol=1e-12)
    assert math.isclose(m.mean, clean.mean(), rel_tol=1e-12)
    assert math.isclose(m.var(0), clean.var(), rel_tol=1e-10)
    assert math.isclose(m.var(1), clean.var(ddof=1), rel_tol=1e-10)
    assert math.isclose(m.skew(), _np_skew(clean), rel_tol=1e-8)
    assert math.isclose(m.kurt(), _np_kurt(clean), rel_tol=1e-8)


def test_moments_bias_corrections():
    """Bias-corrected forms match the closed formulas
    (crick/stats_stubs.c:121,134)."""
    x = np.random.default_rng(2).gamma(2, 3, 5_000)
    m = Moments.from_values(x)
    n = float(m.n)
    g1 = _np_skew(x)
    assert math.isclose(
        m.skew(bias=False), math.sqrt(n * (n - 1)) / (n - 2) * g1, rel_tol=1e-8
    )
    g2 = _np_kurt(x)
    expect = ((n * n - 1) * (g2 + 3) - 9 * n + 15) / ((n - 2) * (n - 3)) - 3
    assert math.isclose(m.kurt(bias=False), expect, rel_tol=1e-8)


def test_moments_merge_equals_whole():
    """Split-half merge ≡ whole (test_stats.py:148-163), any split count."""
    x = np.random.default_rng(3).normal(0, 1, 9_999)
    whole = Moments.from_values(x)
    for nsplit in (2, 7, 32):
        parts = np.array_split(x, nsplit)
        merged = Moments()
        for p in parts:
            merged = merged.merge(Moments.from_values(p))
        assert merged.n == whole.n
        assert math.isclose(merged.m2, whole.m2, rel_tol=1e-10)
        assert math.isclose(merged.m3, whole.m3, rel_tol=1e-8, abs_tol=1e-6)
        assert math.isclose(merged.m4, whole.m4, rel_tol=1e-8)
        assert math.isclose(merged.skew(), whole.skew(), rel_tol=1e-7)
        assert math.isclose(merged.kurt(), whole.kurt(), rel_tol=1e-7)


def test_moments_empty_and_constant():
    empty = Moments.from_values(np.array([]))
    assert empty.n == 0 and math.isnan(empty.skew()) and math.isnan(empty.kurt())
    assert Moments().merge(empty).n == 0  # empty-merge idempotent
    const = Moments.from_values(np.full(100, 3.5))
    assert math.isnan(const.skew()) and math.isnan(const.kurt())  # homogeneous guard
    assert const.var(0) == 0.0
    m = Moments.from_values(np.array([1.0, 2.0]))
    assert m.merge(empty).n == 2


def test_moments_merge_homogeneous_tracking():
    a = Moments.from_values(np.full(10, 2.0))
    b = Moments.from_values(np.full(10, 2.0))
    c = Moments.from_values(np.full(10, 3.0))
    assert math.isnan(a.merge(b).skew())  # still constant
    assert not a.merge(c).homogeneous
    assert not math.isnan(a.merge(c).skew())


# ---------------------------------------------------------------------------
# Count-Min Sketch (family extension)
# ---------------------------------------------------------------------------
class TestCountMinSketch:
    def _zipf_keys(self, n=200_000, distinct=5_000):
        r = np.random.default_rng(7)
        return r.zipf(1.3, n).clip(1, distinct).astype(np.int64)

    def test_never_underestimates_and_bound_holds(self):
        from crick_spark.sketches import CountMinSketch

        keys = self._zipf_keys()
        sk = CountMinSketch.from_batch(keys, width=4096, depth=4)
        uniq, true = np.unique(keys, return_counts=True)
        est = sk.query(uniq)
        assert (est >= true).all()
        # additive bound (e/w)·N holds w.p. ≥ 1 − e^(−4) ≈ 98.2% per key;
        # allow a 2% violation share
        over = est - true
        assert (over <= sk.error_bound()).mean() > 0.97

    def test_absent_key_small_estimate(self):
        from crick_spark.sketches import CountMinSketch

        sk = CountMinSketch.from_batch(self._zipf_keys(), width=4096, depth=4)
        est = sk.query(np.array([10**12 + 7], dtype=np.int64))
        assert 0 <= est[0] <= sk.error_bound()

    def test_merge_equals_whole(self):
        from crick_spark.sketches import CountMinSketch

        keys = self._zipf_keys()
        whole = CountMinSketch.from_batch(keys, width=1024, depth=3)
        parts = [
            CountMinSketch.from_batch(c, width=1024, depth=3)
            for c in np.array_split(keys, 7)
        ]
        merged = parts[0].merge(*parts[1:])
        # CMS merge is exact table addition — bit-for-bit equal, any order
        assert (merged.table == whole.table).all()
        assert merged.n == whole.n
        rev = parts[-1].merge(*parts[:-1][::-1])
        assert (rev.table == whole.table).all()

    def test_weighted_counts(self):
        from crick_spark.sketches import CountMinSketch

        keys = np.array([1, 2, 1], dtype=np.int64)
        sk = CountMinSketch.from_batch(keys, np.array([5, 3, 2]), width=64, depth=4)
        assert sk.n == 10
        assert sk.query(np.array([1]))[0] >= 7

    def test_shape_validation(self):
        from crick_spark.sketches import CountMinSketch

        with pytest.raises(ValueError):
            CountMinSketch(width=1000)  # not a power of two
        with pytest.raises(ValueError):
            CountMinSketch(depth=99)
        a = CountMinSketch(width=64, depth=2)
        b = CountMinSketch(width=128, depth=2)
        with pytest.raises(ValueError):
            a.merge(b)


def test_tdigest_cdf_subnormal_span_regression():
    """cdf between support points separated by a subnormal must stay in
    [0,1] (hypothesis-found: np.interp's slope-first lerp overflowed to
    inf on pos diff 2.2e-313)."""
    from crick_spark.sketches import TDigest

    vals = np.array([2.22507386e-313, 0.0])
    d = TDigest.from_values(vals[:1]).merge(TDigest.from_values(vals[1:]))
    probes = np.linspace(0.0, 2.22507386e-313, 9)
    c = d.cdf(probes)
    assert np.all(c >= 0.0) and np.all(c <= 1.0)
    assert np.all(np.diff(c) >= -1e-12)


def test_cms_inner_product_join_size_guarantees():
    """Join-size estimate: never underestimates, within (e/w)*Na*Nb, and
    partition-invariant under merge (build split vs whole)."""
    import numpy as np

    from crick_spark.sketches.cms import CountMinSketch

    rng = np.random.default_rng(42)
    a_keys = rng.integers(0, 300, 15000)
    b_keys = rng.integers(0, 300, 25000)
    exact = int(
        (np.bincount(a_keys, minlength=300) * np.bincount(b_keys, minlength=300)).sum()
    )
    A = CountMinSketch.from_batch(a_keys, width=4096, depth=4)
    B = CountMinSketch.from_batch(b_keys, width=4096, depth=4)
    est = A.inner_product(B)
    assert exact <= est <= exact + A.inner_product_error_bound(B)
    # merge invariance: sketch built in halves == whole, bit-for-bit
    A2 = CountMinSketch.from_batch(a_keys[:7000], width=4096, depth=4).merge(
        CountMinSketch.from_batch(a_keys[7000:], width=4096, depth=4)
    )
    assert (A2.table == A.table).all() and A2.inner_product(B) == est
    # shape mismatch refuses
    import pytest as _pytest

    with _pytest.raises(ValueError):
        A.inner_product(CountMinSketch.from_batch(b_keys, width=8192, depth=4))


def test_cms_inner_product_exact_beyond_float53():
    """Integer accumulation: per-row dot products past 2^53 must stay
    exact (float64 would round below the true value and break the
    never-underestimates guarantee)."""
    import numpy as np

    from crick_spark.sketches.cms import CountMinSketch

    a = CountMinSketch(width=4, depth=1)
    b = CountMinSketch(width=4, depth=1)
    big = 3**34  # ~1.67e16 > 2^53
    a.table[0, 0] = big
    b.table[0, 0] = big + 1
    assert a.inner_product(b) == big * (big + 1)


class TestBloomFilter:
    """Bloom membership kernel (crick_spark/sketches/bloom.py): one-sided
    error, exact OR-merge, state roundtrip."""

    def test_no_false_negatives(self):
        from crick_spark.sketches.bloom import BloomFilter

        rng = np.random.default_rng(7)
        keys = rng.integers(-(2**62), 2**62, size=5_000, dtype=np.int64)
        bf = BloomFilter.from_batch(keys, n_bits=1 << 16, n_hashes=5)
        assert bf.contains_batch(keys).all()

    def test_fpp_bounded(self):
        from crick_spark.sketches.bloom import BloomFilter

        rng = np.random.default_rng(11)
        members = rng.integers(0, 2**62, size=4_000, dtype=np.int64)
        bf = BloomFilter.from_batch(members, n_bits=1 << 16, n_hashes=5)
        # disjoint probe set (negative range)
        probes = rng.integers(-(2**62), -1, size=20_000, dtype=np.int64)
        measured = bf.contains_batch(probes).mean()
        expected = BloomFilter.expected_fpp(4_000, 1 << 16, 5)
        assert measured <= max(2.5 * expected, 0.01)
        # the realised-fill estimate agrees with the a-priori one
        assert abs(bf.fpp() - expected) <= max(0.5 * expected, 0.005)

    def test_merge_exact_and_partition_invariant(self):
        from crick_spark.sketches.bloom import BloomFilter

        rng = np.random.default_rng(3)
        keys = rng.integers(0, 2**62, size=6_000, dtype=np.int64)
        whole = BloomFilter.from_batch(keys, n_bits=1 << 15, n_hashes=4)
        for n_parts in (2, 3, 7):
            parts = [
                BloomFilter.from_batch(c, n_bits=1 << 15, n_hashes=4)
                for c in np.array_split(keys, n_parts)
            ]
            merged = parts[0].merge(*parts[1:])
            assert np.array_equal(merged.words, whole.words)
            assert merged.n_added == whole.n_added

    def test_merge_shape_mismatch_rejected(self):
        from crick_spark.sketches.bloom import BloomFilter

        a = BloomFilter(n_bits=1 << 10, n_hashes=3)
        b = BloomFilter(n_bits=1 << 11, n_hashes=3)
        with pytest.raises(ValueError):
            a.merge(b)

    def test_ctor_validation(self):
        from crick_spark.sketches.bloom import BloomFilter

        with pytest.raises(ValueError):
            BloomFilter(n_bits=1000)  # not a power of two
        with pytest.raises(ValueError):
            BloomFilter(n_bits=1 << 10, n_hashes=0)

    def test_pickle_roundtrip(self):
        import pickle

        from crick_spark.sketches.bloom import BloomFilter

        rng = np.random.default_rng(5)
        keys = rng.integers(0, 2**62, size=1_000, dtype=np.int64)
        bf = BloomFilter.from_batch(keys, n_bits=1 << 12, n_hashes=6)
        bf2 = pickle.loads(pickle.dumps(bf))
        assert np.array_equal(bf.words, bf2.words)
        assert (bf2.n_bits, bf2.n_hashes, bf2.n_added) == (
            bf.n_bits,
            bf.n_hashes,
            bf.n_added,
        )
        assert bf2.contains_batch(keys).all()
        # restored buffer is writable (frombuffer copy) — adding works
        bf2.add_batch(np.array([123456789], dtype=np.int64))

    def test_empty(self):
        from crick_spark.sketches.bloom import BloomFilter

        bf = BloomFilter(n_bits=1 << 10, n_hashes=4)
        bf.add_batch(np.array([], dtype=np.int64))
        assert bf.fill_ratio() == 0.0 and bf.fpp() == 0.0
        assert not bf.contains_batch(
            np.array([1, 2, 3], dtype=np.int64)
        ).any()

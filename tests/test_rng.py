import numpy as np

from mlimgsynth_tpu.rng import RngPhilox, philox_randn

# Golden values from the reference Philox test (reference: src/test_rng.c:11-24)
GOLDEN_SEED0 = [
    -0.92466259, -0.42534414, -2.64384580, 0.14518388,
    -0.12086648, -0.57972562, -0.62285119, -0.32838708,
    -1.07454228, -0.36314407, -1.67105067, 2.26550508,
]


def test_philox_golden_seed0():
    out = philox_randn(0, 0, 12)
    np.testing.assert_allclose(out, GOLDEN_SEED0, atol=1e-7)


def test_offset_increments_per_call():
    rng = RngPhilox(seed=0)
    a = rng.randn(4)
    assert rng.offset == 1
    b = rng.randn(4)
    assert rng.offset == 2
    # different offsets must give different draws
    assert not np.allclose(a, b)
    # first call must match the stateless helper
    np.testing.assert_array_equal(a, philox_randn(0, 0, 4))
    np.testing.assert_array_equal(b, philox_randn(0, 1, 4))


def test_prefix_consistency():
    # element i only depends on (seed, offset, i): prefixes must agree
    long = philox_randn(1234, 7, 1000)
    short = philox_randn(1234, 7, 10)
    np.testing.assert_array_equal(long[:10], short)


def test_seed_dependence():
    a = philox_randn(1, 0, 64)
    b = philox_randn(2, 0, 64)
    assert not np.allclose(a, b)
    # high seed word used too
    c = philox_randn(1 << 40, 0, 64)
    assert not np.allclose(a, c)


def test_distribution_sane():
    x = philox_randn(42, 0, 100000)
    assert abs(float(x.mean())) < 0.02
    assert abs(float(x.std()) - 1.0) < 0.02

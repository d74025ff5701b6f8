"""Number-theory tests (reference: src/math_utils.rs unit tests)."""
import math

import pytest

from rustfft_tpu.math_utils import (
    PartialFactors,
    PrimeFactors,
    distinct_prime_factors,
    extended_gcd,
    is_prime,
    mod_inverse,
    modular_exponent,
    primitive_root,
)


def test_is_prime():
    primes = {2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 1009, 7919, 65537}
    for n in range(2, 100):
        naive = all(n % d for d in range(2, n))
        assert is_prime(n) == naive, n
    for p in primes:
        assert is_prime(p)
    assert not is_prime(0)
    assert not is_prime(1)
    assert not is_prime(561)  # Carmichael number


def test_primitive_root():
    # reference math_utils.rs test: known primitive roots
    known = {3: 2, 5: 2, 7: 3, 11: 2, 13: 2, 17: 3, 19: 2, 23: 5, 29: 2, 31: 3}
    for p, g in known.items():
        assert primitive_root(p) == g
    # validate the defining property for a spread of primes
    for p in [37, 101, 1009, 7919]:
        g = primitive_root(p)
        seen = set()
        x = 1
        for _ in range(p - 1):
            x = x * g % p
            seen.add(x)
        assert len(seen) == p - 1


def test_modular_exponent():
    for base in range(1, 20):
        for exp in range(0, 20):
            for mod in range(2, 20):
                assert modular_exponent(base, exp, mod) == pow(base, exp, mod)


def test_distinct_prime_factors():
    assert distinct_prime_factors(2 * 2 * 3 * 5 * 5 * 7) == [2, 3, 5, 7]
    assert distinct_prime_factors(1009) == [1009]
    assert distinct_prime_factors(1024) == [2]


def test_extended_gcd_and_inverse():
    for a in range(1, 50):
        for m in range(2, 50):
            g, x, y = extended_gcd(a, m)
            assert a * x + m * y == g == math.gcd(a, m)
            if g == 1:
                assert a * mod_inverse(a, m) % m == 1


class TestPrimeFactors:
    def test_compute(self):
        f = PrimeFactors.compute(2**3 * 3**2 * 5 * 7 * 11**2)
        assert f.get_power_of_two() == 3
        assert f.get_power_of_three() == 2
        assert [(pf.value, pf.count) for pf in f.get_other_factors()] == [
            (5, 1),
            (7, 1),
            (11, 2),
        ]
        assert f.get_product() == 2**3 * 3**2 * 5 * 7 * 11**2
        assert f.get_total_factor_count() == 3 + 2 + 1 + 1 + 2
        assert f.get_distinct_factor_count() == 5
        assert not f.is_prime()

    def test_prime(self):
        for p in [2, 3, 5, 1009, 7919]:
            assert PrimeFactors.compute(p).is_prime()
        assert not PrimeFactors.compute(4).is_prime()

    def test_has_factors(self):
        f = PrimeFactors.compute(5 * 11)
        assert f.has_factors_leq(7)  # 5 <= 7
        assert f.has_factors_gt(7)  # 11 > 7
        assert not f.has_factors_gt(11)
        f2 = PrimeFactors.compute(13 * 17)
        assert not f2.has_factors_leq(7)

    def test_product_above(self):
        f = PrimeFactors.compute(2**2 * 5 * 11 * 13)
        assert f.product_above(7) == 11 * 13
        assert f.product_above(11) == 13

    @pytest.mark.parametrize(
        "n",
        [4, 36, 144, 1024, 729, 5**4, 2 * 3 * 5 * 7, 2**5 * 3**3, 1234, 9604],
    )
    def test_partition_factors(self, n):
        left, right = PrimeFactors.compute(n).partition_factors()
        assert left.get_product() * right.get_product() == n
        assert left.get_product() > 1
        assert right.get_product() > 1

    def test_partition_perfect_square(self):
        left, right = PrimeFactors.compute(144).partition_factors()
        assert left.get_product() == right.get_product() == 12

    def test_partition_single_factor(self):
        left, right = PrimeFactors.compute(2**7).partition_factors()
        assert {left.get_product(), right.get_product()} == {2**4, 2**3}


class TestPartialFactors:
    def test_compute_and_divide(self):
        f = PartialFactors.compute(2**3 * 3 * 5 * 7 * 11 * 13)
        assert f.power2 == 3
        assert f.power3 == 1
        assert f.power5 == 1
        assert f.power7 == 1
        assert f.power11 == 1
        assert f.other_factors == 13
        assert f.get_product() == 2**3 * 3 * 5 * 7 * 11 * 13
        g = PartialFactors.compute(2 * 5)
        q = f.divide_by(g)
        assert q is not None
        assert q.get_product() == f.get_product() // 10
        assert f.divide_by(PartialFactors.compute(17)) is None

// plancore: native planner core for rustfft_tpu.
//
// C++ implementation of the planner's hot setup path: prime factorization,
// primality, primitive roots, and the full scalar-parity recipe design tree
// (the behavioral equivalent of reference src/math_utils.rs and
// src/plan.rs:412-665, re-implemented — not translated — for the TPU build's
// planner layer).  Exposed through a C ABI consumed via ctypes
// (rustfft_tpu/native.py); Python falls back to its own implementation when
// this library is absent.
//
// Recipe serialization: postfix int64 token stream with stack semantics.
//   1 len        -> Dft(len)
//   2 len        -> Butterfly(len)
//   3 k          -> Radix4(k, pop())
//   4 m f1..fm   -> RadixN((f1..fm), pop())
//   5            -> MixedRadix(popl, popr)
//   6            -> MixedRadixSmall(popl, popr)
//   7            -> GoodThomas(popl, popr)
//   8            -> GoodThomasSmall(popl, popr)
//   9            -> Raders(pop())
//  10 len        -> Bluesteins(len, pop())
// Children are emitted before their parent; for two-child nodes the left
// child is emitted first.

#include <cstdint>
#include <cmath>
#include <cstring>
#include <vector>

namespace {

using u64 = uint64_t;
using u128 = unsigned __int128;

u64 mulmod(u64 a, u64 b, u64 m) { return (u64)((u128)a * b % m); }

u64 powmod(u64 b, u64 e, u64 m) {
  u64 r = 1;
  b %= m;
  while (e) {
    if (e & 1) r = mulmod(r, b, m);
    b = mulmod(b, b, m);
    e >>= 1;
  }
  return r;
}

bool is_prime_u64(u64 n) {
  if (n < 2) return false;
  for (u64 p : {2ull, 3ull, 5ull, 7ull, 11ull, 13ull, 17ull, 19ull, 23ull,
                29ull, 31ull, 37ull}) {
    if (n % p == 0) return n == p;
  }
  u64 d = n - 1;
  int r = 0;
  while ((d & 1) == 0) {
    d >>= 1;
    ++r;
  }
  for (u64 a : {2ull, 3ull, 5ull, 7ull, 11ull, 13ull, 17ull, 19ull, 23ull,
                29ull, 31ull, 37ull}) {
    u64 x = powmod(a, d, n);
    if (x == 1 || x == n - 1) continue;
    bool composite = true;
    for (int i = 0; i < r - 1; ++i) {
      x = mulmod(x, x, n);
      if (x == n - 1) {
        composite = false;
        break;
      }
    }
    if (composite) return false;
  }
  return true;
}

struct Factor {
  u64 value;
  uint32_t count;
};

// Mirrors PrimeFactors semantics (reference math_utils.rs:82-368).
struct PrimeFactors {
  std::vector<Factor> other;  // factors >= 5, ascending
  u64 n = 0;
  uint32_t p2 = 0, p3 = 0, total = 0, distinct = 0;

  static PrimeFactors compute(u64 n) {
    PrimeFactors f;
    f.n = n;
    if (n > 0) {
      while ((n & 1) == 0) {
        n >>= 1;
        ++f.p2;
      }
    }
    f.total += f.p2;
    if (f.p2) ++f.distinct;
    while (n % 3 == 0) {
      n /= 3;
      ++f.p3;
    }
    f.total += f.p3;
    if (f.p3) ++f.distinct;
    if (n > 1) {
      u64 d = 5;
      u64 limit = (u64)std::sqrt((double)n) + 1;
      while (d < limit) {
        uint32_t c = 0;
        while (n % d == 0) {
          n /= d;
          ++c;
        }
        if (c) {
          f.other.push_back({d, c});
          f.total += c;
          ++f.distinct;
          limit = (u64)std::sqrt((double)n) + 1;
        }
        d += 2;
      }
      if (n > 1) {
        f.other.push_back({n, 1});
        ++f.total;
        ++f.distinct;
      }
    }
    return f;
  }

  bool is_prime() const { return total == 1; }
  bool has_factors_leq(u64 v) const {
    return p2 > 0 || p3 > 0 || (!other.empty() && other.front().value <= v);
  }
  bool has_factors_gt(u64 v) const {
    if (v < 2 && p2 > 0) return true;
    if (v < 3 && p3 > 0) return true;
    return !other.empty() && other.back().value > v;
  }
  u64 product_above(u64 v) const {
    u64 prod = 1;
    for (auto& f : other)
      if (f.value > v) {
        u64 pw = 1;
        for (uint32_t i = 0; i < f.count; ++i) pw *= f.value;
        prod *= pw;
      }
    return prod;
  }

  // reference math_utils.rs:269-368
  void partition(u64* left, u64* right) const {
    bool square = (p2 % 2 == 0) && (p3 % 2 == 0);
    for (auto& f : other) square = square && (f.count % 2 == 0);
    if (square) {
      u64 half = (u64)1 << (p2 / 2);
      for (uint32_t i = 0; i < p3 / 2; ++i) half *= 3;
      for (auto& f : other)
        for (uint32_t i = 0; i < f.count / 2; ++i) half *= f.value;
      *left = half;
      *right = half;
      return;
    }
    if (distinct == 1) {
      if (!other.empty()) {
        auto& f = other.front();
        uint32_t hc = f.count / 2;
        u64 l = 1, r = 1;
        for (uint32_t i = 0; i < f.count - hc; ++i) l *= f.value;
        for (uint32_t i = 0; i < hc; ++i) r *= f.value;
        *left = l;
        *right = r;
      } else if (p2 > 0) {
        uint32_t h = p2 / 2;
        *left = (u64)1 << (p2 - h);
        *right = (u64)1 << h;
      } else {
        uint32_t h = p3 / 2;
        u64 l = 1, r = 1;
        for (uint32_t i = 0; i < p3 - h; ++i) l *= 3;
        for (uint32_t i = 0; i < h; ++i) r *= 3;
        *left = l;
        *right = r;
      }
      return;
    }
    u64 lp = 1, rp = 1;
    for (auto& f : other) {
      u64 grp = 1;
      for (uint32_t i = 0; i < f.count; ++i) grp *= f.value;
      if (lp <= rp)
        lp *= grp;
      else
        rp *= grp;
    }
    if (lp <= rp)
      lp <<= p2;
    else
      rp <<= p2;
    if (p3 > 0) {
      u64 t3 = 1;
      for (uint32_t i = 0; i < p3; ++i) t3 *= 3;
      if (lp <= rp)
        lp *= t3;
      else
        rp *= t3;
    }
    *left = lp;
    *right = rp;
  }
};

constexpr u64 kMaxRadixNFactor = 7;
constexpr u64 kMaxRaderPrimeFactor = 23;

bool is_butterfly(u64 n) {
  switch (n) {
    case 2: case 3: case 4: case 5: case 6: case 7: case 8: case 9:
    case 11: case 12: case 13: case 16: case 17: case 19: case 23:
    case 24: case 27: case 29: case 31: case 32:
      return true;
    default:
      return false;
  }
}

// butterfly-product candidate set (plan.rs:433-435: no 12)
constexpr u64 kProductButterflies[] = {2,  3,  4,  5,  6,  7,  8,  9,  11, 13,
                                       16, 17, 19, 23, 24, 27, 29, 31, 32};

u64 gcd_u64(u64 a, u64 b) {
  while (b) {
    u64 t = a % b;
    a = b;
    b = t;
  }
  return a;
}

struct Emitter {
  int64_t* out;
  int64_t cap;
  int64_t len = 0;
  bool overflow = false;
  void push(int64_t v) {
    if (len < cap)
      out[len++] = v;
    else
      overflow = true;
  }
};

void design_len(u64 n, Emitter& e);

void design_with_factors(u64 n, const PrimeFactors& f, Emitter& e);

// plan.rs:427-472
bool design_butterfly_product(u64 n, Emitter& e) {
  if (n > 992 || (n & (n - 1)) == 0) return false;
  u64 limit = (u64)std::ceil(std::sqrt((double)n)) + 1;
  u64 best_sum = ~0ull, bl = 0, br = 0;
  for (u64 left : kProductButterflies) {
    if (left >= limit) break;
    u64 right = n / left;
    if (left * right == n) {
      bool ok = false;
      for (u64 b : kProductButterflies) ok = ok || (b == right);
      if (ok && left + right < best_sum) {
        best_sum = left + right;
        bl = left;
        br = right;
      }
    }
  }
  if (!bl) return false;
  design_len(bl, e);
  design_len(br, e);
  e.push(gcd_u64(bl, br) == 1 ? 8 : 6);  // GoodThomasSmall : MixedRadixSmall
  return true;
}

// plan.rs:508-607
void design_radixn(const PrimeFactors& f, Emitter& e) {
  uint32_t p2 = f.p2, p3 = f.p3, p5 = 0, p7 = 0;
  for (auto& x : f.other) {
    if (x.value == 5) p5 = x.count;
    if (x.value == 7) p7 = x.count;
  }
  u64 base_len;
  if (f.has_factors_gt(kMaxRadixNFactor)) {
    base_len = f.product_above(kMaxRadixNFactor);
  } else if (p7 == 0 && p5 == 0 && p3 < 2) {
    if (p3 == 0)
      base_len = (p2 % 2 == 1) ? 8 : 16;
    else
      base_len = (p2 % 2 == 1) ? 24 : 12;
  } else if (p2 > 0 && p3 > 0) {
    uint32_t excess = p2 > p3 ? p2 - p3 : 0;
    base_len = excess == 0 ? 6 : (excess == 1 ? 12 : 24);
  } else if (p3 > 2) {
    base_len = 27;
  } else if (p3 > 1) {
    base_len = 9;
  } else if (p7 > 0) {
    base_len = 7;
  } else {
    base_len = 5;
  }
  design_len(base_len, e);
  u64 cross = f.n / base_len;
  if ((cross & (cross - 1)) == 0) {
    int bits = 0;
    for (u64 c = cross; c > 1; c >>= 1) ++bits;
    if (bits % 2 == 0) {
      e.push(3);  // Radix4
      e.push(bits / 2);
      return;
    }
  }
  std::vector<int64_t> factors;
  for (u64 fac : {7ull, 6ull, 5ull, 3ull}) {
    while (cross % fac == 0) {
      cross /= fac;
      factors.push_back((int64_t)fac);
    }
  }
  int bits = 0;
  for (u64 c = cross; c > 1; c >>= 1) ++bits;
  if (bits % 2 == 1) factors.push_back(2);
  for (int i = 0; i < bits / 2; ++i) factors.push_back(4);
  e.push(4);  // RadixN
  e.push((int64_t)factors.size());
  for (auto v : factors) e.push(v);
}

// plan.rs:636-665
void design_prime(u64 n, Emitter& e) {
  PrimeFactors rf = PrimeFactors::compute(n - 1);
  bool hard = false;
  for (auto& x : rf.other) hard = hard || (x.value > kMaxRaderPrimeFactor);
  if (hard) {
    u64 min_inner = 2 * n - 1;
    u64 pow2 = 1;
    while (pow2 < min_inner) pow2 <<= 1;
    u64 f3 = pow2 / 4 * 3;
    u64 inner = f3 >= min_inner ? f3 : pow2;
    design_len(inner, e);
    e.push(10);  // Bluesteins
    e.push((int64_t)n);
  } else {
    design_with_factors(n - 1, rf, e);
    e.push(9);  // Raders
  }
}

// plan.rs:474-506
void design_mixed_radix(u64 ln, const PrimeFactors& lf, u64 rn,
                        const PrimeFactors& rf, Emitter& e) {
  design_with_factors(ln, lf, e);
  design_with_factors(rn, rf, e);
  if (ln < 31 && rn < 31)
    e.push(gcd_u64(ln, rn) == 1 ? 8 : 6);
  else
    e.push(5);  // MixedRadix
}

// plan.rs:412-425
void design_with_factors(u64 n, const PrimeFactors& f, Emitter& e) {
  if (is_butterfly(n)) {
    e.push(2);
    e.push((int64_t)n);
    return;
  }
  if (f.is_prime()) {
    design_prime(n, e);
    return;
  }
  if (design_butterfly_product(n, e)) return;
  if (f.has_factors_leq(kMaxRadixNFactor)) {
    design_radixn(f, e);
    return;
  }
  u64 ln, rn;
  f.partition(&ln, &rn);
  design_mixed_radix(ln, PrimeFactors::compute(ln), rn,
                     PrimeFactors::compute(rn), e);
}

// plan.rs:312-314
void design_len(u64 n, Emitter& e) {
  if (n < 2) {
    e.push(1);
    e.push((int64_t)n);
    return;
  }
  design_with_factors(n, PrimeFactors::compute(n), e);
}

}  // namespace

extern "C" {

int pc_is_prime(u64 n) { return is_prime_u64(n) ? 1 : 0; }

// distinct prime factors; returns count written (up to cap)
int64_t pc_distinct_prime_factors(u64 n, u64* out, int64_t cap) {
  int64_t k = 0;
  auto emit = [&](u64 p) {
    if (k < cap) out[k] = p;
    ++k;
  };
  if (n % 2 == 0) {
    while (n % 2 == 0) n /= 2;
    emit(2);
  }
  u64 d = 3;
  u64 limit = (u64)std::sqrt((double)n) + 1;
  while (d < limit) {
    if (n % d == 0) {
      while (n % d == 0) n /= d;
      emit(d);
      limit = (u64)std::sqrt((double)n) + 1;
    }
    d += 2;
  }
  if (n > 1) emit(n);
  return k;
}

// smallest primitive root mod prime, 0 if none found
u64 pc_primitive_root(u64 prime) {
  u64 factors[64];
  int64_t nf = pc_distinct_prime_factors(prime - 1, factors, 64);
  for (u64 cand = 2; cand < prime; ++cand) {
    bool ok = true;
    for (int64_t i = 0; i < nf && ok; ++i)
      ok = powmod(cand, (prime - 1) / factors[i], prime) != 1;
    if (ok) return cand;
  }
  return 0;
}

// factorize: writes (value, count) pairs; returns pair count (up to cap)
int64_t pc_factorize(u64 n, u64* values, u64* counts, int64_t cap) {
  PrimeFactors f = PrimeFactors::compute(n);
  int64_t k = 0;
  auto emit = [&](u64 v, u64 c) {
    if (k < cap) {
      values[k] = v;
      counts[k] = c;
    }
    ++k;
  };
  if (f.p2) emit(2, f.p2);
  if (f.p3) emit(3, f.p3);
  for (auto& x : f.other) emit(x.value, x.count);
  return k;
}

// design the scalar-parity recipe for n; returns token count, or -1 if the
// output buffer is too small
int64_t pc_design_recipe(u64 n, int64_t* out, int64_t cap) {
  Emitter e{out, cap};
  design_len(n, e);
  return e.overflow ? -1 : e.len;
}

// fill twiddle table out[i] = (re, im interleaved) of e^(-2*pi*i*idx[i]/len)
void pc_twiddles(const int64_t* indices, int64_t count, double fft_len,
                 int conjugate, double* out_interleaved) {
  const double c = -2.0 * M_PI / fft_len;
  for (int64_t i = 0; i < count; ++i) {
    double a = c * (double)indices[i];
    out_interleaved[2 * i] = std::cos(a);
    out_interleaved[2 * i + 1] = conjugate ? -std::sin(a) : std::sin(a);
  }
}

}  // extern "C"

// ---- table tier: plan-time constant generation (reference twiddles.rs) ----
// All angles computed in f64 with exponents reduced in exact integer
// arithmetic first, matching the Python implementations bit-for-bit in
// structure (twiddles.py); conjugate=1 gives the inverse-direction tables.

extern "C" {

// out[j*n + k] = e^(-2*pi*i*((j*k) mod n)/n), interleaved re/im (2*n*n doubles)
void pc_dft_matrix(u64 n, int conjugate, double* out) {
  const double c = -2.0 * M_PI / (double)n;
  for (u64 j = 0; j < n; ++j) {
    for (u64 k = 0; k < n; ++k) {
      u64 e = (u64)(((unsigned __int128)j * k) % n);
      double a = c * (double)e;
      out[2 * (j * n + k)] = std::cos(a);
      out[2 * (j * n + k) + 1] = conjugate ? -std::sin(a) : std::sin(a);
    }
  }
}

// out[k1*q + j2] = e^(-2*pi*i*((k1*j2) mod (p*q))/(p*q)), interleaved (2*p*q)
void pc_twiddle_table(u64 p, u64 q, int conjugate, double* out) {
  const u64 n = p * q;
  const double c = -2.0 * M_PI / (double)n;
  for (u64 k1 = 0; k1 < p; ++k1) {
    for (u64 j2 = 0; j2 < q; ++j2) {
      u64 e = (u64)(((unsigned __int128)k1 * j2) % n);
      double a = c * (double)e;
      out[2 * (k1 * q + j2)] = std::cos(a);
      out[2 * (k1 * q + j2) + 1] = conjugate ? -std::sin(a) : std::sin(a);
    }
  }
}

// Bluestein chirp out[k] = e^(-2*pi*i*((k*k) mod 2n)/(2n)), interleaved (2*n).
// The k^2 mod 2n reduction runs in 128-bit integers — the precision trick of
// reference twiddles.rs:25-57, exact for any n below 2^63.
void pc_bluestein_chirp(u64 n, int conjugate, double* out) {
  const u64 twice = 2 * n;
  const double c = -2.0 * M_PI / (double)twice;
  for (u64 k = 0; k < n; ++k) {
    u64 e = (u64)(((unsigned __int128)k * k) % twice);
    double a = c * (double)e;
    out[2 * k] = std::cos(a);
    out[2 * k + 1] = conjugate ? -std::sin(a) : std::sin(a);
  }
}

}  // extern "C"

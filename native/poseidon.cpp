// Native host-side Poseidon over BLS12-381 Fr.
//
// The sparse-Merkle witness generators are Poseidon-bound on the host
// (reference hot loop: src/zk/state/mod.rs:343-416 — one hash per tree
// level per touched leaf); this mirrors the reference's compiled-native
// footing (its Poseidon is compiled Rust).  4x64-limb Montgomery
// arithmetic with __uint128_t products; parameters are injected from
// Python at init (same golden params as the JAX kernels).
//
// C ABI (ctypes): field elements are 32-byte little-endian buffers.

#include <cstdint>
#include <cstring>
#include <vector>

typedef unsigned __int128 u128;
typedef uint64_t u64;

// BLS12-381 Fr modulus, little-endian limbs
static const u64 P[4] = {0xffffffff00000001ULL, 0x53bda402fffe5bfeULL,
                         0x3339d80809a1d805ULL, 0x73eda753299d7d48ULL};
// -p^{-1} mod 2^64
static const u64 PINV = 0xfffffffeffffffffULL;
// R^2 mod p (R = 2^256)
static const u64 R2[4] = {0xc999e990f3f29c6dULL, 0x2b6cedcb87925c23ULL,
                          0x05d314967254398fULL, 0x0748d9d99f59ff11ULL};

struct Fr {
    u64 v[4];
};

static inline bool geq_p(const u64 a[4]) {
    for (int i = 3; i >= 0; i--) {
        if (a[i] > P[i]) return true;
        if (a[i] < P[i]) return false;
    }
    return true;  // equal
}

static inline void sub_p(u64 a[4]) {
    u128 borrow = 0;
    for (int i = 0; i < 4; i++) {
        u128 t = (u128)a[i] - P[i] - borrow;
        a[i] = (u64)t;
        borrow = (t >> 64) & 1;
    }
}

static inline void fr_add(Fr &out, const Fr &a, const Fr &b) {
    u128 carry = 0;
    for (int i = 0; i < 4; i++) {
        u128 t = (u128)a.v[i] + b.v[i] + carry;
        out.v[i] = (u64)t;
        carry = t >> 64;
    }
    if (carry || geq_p(out.v)) sub_p(out.v);
}

// CIOS Montgomery multiplication
static inline void fr_mul(Fr &out, const Fr &a, const Fr &b) {
    u64 t[6] = {0, 0, 0, 0, 0, 0};
    for (int i = 0; i < 4; i++) {
        u128 carry = 0;
        for (int j = 0; j < 4; j++) {
            u128 cur = (u128)t[j] + (u128)a.v[i] * b.v[j] + carry;
            t[j] = (u64)cur;
            carry = cur >> 64;
        }
        u128 cur = (u128)t[4] + carry;
        t[4] = (u64)cur;
        t[5] = (u64)(cur >> 64);

        u64 m = t[0] * PINV;
        carry = ((u128)t[0] + (u128)m * P[0]) >> 64;
        for (int j = 1; j < 4; j++) {
            u128 cur2 = (u128)t[j] + (u128)m * P[j] + carry;
            t[j - 1] = (u64)cur2;
            carry = cur2 >> 64;
        }
        cur = (u128)t[4] + carry;
        t[3] = (u64)cur;
        t[4] = t[5] + (u64)(cur >> 64);
        t[5] = 0;
    }
    u64 r[4] = {t[0], t[1], t[2], t[3]};
    if (t[4] || geq_p(r)) sub_p(r);
    memcpy(out.v, r, sizeof(r));
}

static inline void to_mont(Fr &out, const Fr &a) {
    Fr r2;
    memcpy(r2.v, R2, sizeof(R2));
    fr_mul(out, a, r2);
}

static inline void from_mont(Fr &out, const Fr &a) {
    Fr one;
    one.v[0] = 1; one.v[1] = one.v[2] = one.v[3] = 0;
    fr_mul(out, a, one);
}

static inline void sbox(Fr &x) {
    Fr x2, x4;
    fr_mul(x2, x, x);
    fr_mul(x4, x2, x2);
    fr_mul(x, x4, x);
}

// per-width parameters (Montgomery form)
struct Params {
    int t = 0;
    int full_rounds = 0;
    int partial_rounds = 0;
    std::vector<Fr> rc;   // (full+partial)*t
    std::vector<Fr> mds;  // t*t
};

static Params PARAMS[18];

extern "C" {

// rc, mds: little-endian 32-byte scalars, standard form
void poseidon_init(int t, int full_rounds, int partial_rounds,
                   const uint8_t *rc, int rc_count, const uint8_t *mds,
                   int mds_count) {
    Params &p = PARAMS[t];
    p.t = t;
    p.full_rounds = full_rounds;
    p.partial_rounds = partial_rounds;
    p.rc.resize(rc_count);
    for (int i = 0; i < rc_count; i++) {
        Fr x;
        memcpy(x.v, rc + 32 * i, 32);
        to_mont(p.rc[i], x);
    }
    p.mds.resize(mds_count);
    for (int i = 0; i < mds_count; i++) {
        Fr x;
        memcpy(x.v, mds + 32 * i, 32);
        to_mont(p.mds[i], x);
    }
}

// inputs: arity*32 bytes standard form; out: 32 bytes
void poseidon_hash(int arity, const uint8_t *inputs, uint8_t *out) {
    int t = arity + 1;
    const Params &p = PARAMS[t];
    std::vector<Fr> el(t), nxt(t);
    memset(el[0].v, 0, 32);
    for (int i = 0; i < arity; i++) {
        Fr x;
        memcpy(x.v, inputs + 32 * i, 32);
        to_mont(el[i + 1], x);
    }
    int off = 0;
    int total = p.full_rounds + p.partial_rounds;
    int half = p.full_rounds / 2;
    for (int r = 0; r < total; r++) {
        bool full = (r < half) || (r >= half + p.partial_rounds);
        for (int i = 0; i < t; i++) fr_add(el[i], el[i], p.rc[off + i]);
        off += t;
        if (full) {
            for (int i = 0; i < t; i++) sbox(el[i]);
        } else {
            sbox(el[0]);
        }
        for (int j = 0; j < t; j++) {
            Fr acc;
            memset(acc.v, 0, 32);
            for (int k = 0; k < t; k++) {
                Fr prod;
                fr_mul(prod, p.mds[j * t + k], el[k]);
                fr_add(acc, acc, prod);
            }
            nxt[j] = acc;
        }
        el.swap(nxt);
    }
    Fr res;
    from_mont(res, el[1]);
    memcpy(out, res.v, 32);
}

// batch: n hashes of the same arity; inputs n*arity*32 bytes; out n*32
void poseidon_hash_batch(int arity, int n, const uint8_t *inputs,
                         uint8_t *out) {
    for (int i = 0; i < n; i++) {
        poseidon_hash(arity, inputs + (size_t)i * arity * 32, out + (size_t)i * 32);
    }
}

}  // extern "C"

// Native host-side scalar-vector utilities.
//
// The Groth16 prover's duplicate-scalar pre-reduction needs the witness
// vector grouped by value once per proof (ops/pallas_msm._DedupPlan).
// numpy's np.unique on (N, 16)-u32 void rows lexsorts with generic
// 64-byte compares (~5s at N = 2^20 — 25% of a warm proof); this is
// the same grouping as an index sort with inlined u64 compares.
//
// C ABI (ctypes): rows is N*16 uint32 little-endian limb rows.

#include <algorithm>
#include <cstdint>
#include <cstring>

typedef uint32_t u32;
typedef uint64_t u64;
typedef int32_t i32;
typedef int64_t i64;

// lexicographic on the value: compare u64 words from most significant
static inline int cmp_rows(const u32* a, const u32* b) {
    for (int w = 7; w >= 0; w--) {
        u64 av, bv;
        std::memcpy(&av, a + 2 * w, 8);
        std::memcpy(&bv, b + 2 * w, 8);
        if (av < bv) return -1;
        if (av > bv) return 1;
    }
    return 0;
}

extern "C" i64 group_rows16(const u32* rows, i64 n, i32* order,
                            i32* inverse, i32* counts) {
    // order: index sort of rows (ascending); inverse[i] = group id of
    // row i; counts[g] = group size.  Returns the number of groups.
    for (i64 i = 0; i < n; i++) order[i] = (i32)i;
    std::sort(order, order + n, [rows](i32 x, i32 y) {
        int c = cmp_rows(rows + (i64)x * 16, rows + (i64)y * 16);
        if (c != 0) return c < 0;
        return x < y;  // stable tie-break
    });
    i64 g = -1;
    const u32* prev = nullptr;
    for (i64 k = 0; k < n; k++) {
        const u32* r = rows + (i64)order[k] * 16;
        if (prev == nullptr || cmp_rows(prev, r) != 0) {
            g++;
            counts[g] = 0;
        }
        counts[g]++;
        inverse[order[k]] = (i32)g;
        prev = r;
    }
    return g + 1;
}

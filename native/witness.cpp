// Native witness limb encoder: a Python list of field elements ->
// (n, 16) uint16 little-endian limb rows, in one C pass.
//
// The TPU prover's witness encode was the last pure-Python O(vars)
// stage: 13M `int.to_bytes` calls + a 13M-element `v % P` list
// comprehension cost ~27 s per mainnet proof (PERFORMANCE.md round-4
// breakdown).  This replaces both with a single pass over the list
// using CPython's bigint byte export; values already < 2^256 (the
// overwhelming case -- the constraint system keeps assignments
// reduced) hit _PyLong_AsByteArray directly, and the rare
// out-of-range/negative value falls back to PyNumber_Remainder.
//
// Reference analog: bellman's assignment vectors are already native
// (Vec<Scalar>); this closes the gap from the Python side.
// Loaded via ctypes.PyDLL (the GIL must be HELD: we touch PyObjects).

#include <Python.h>

#include <cstdint>
#include <cstring>

extern "C" int64_t encode_fr_rows16(PyObject *seq, PyObject *modulus,
                                    const uint8_t *mod_le, uint16_t *out,
                                    int64_t cap) {
    // seq: sequence of Python ints; modulus: the field modulus (int);
    // mod_le: its 32-byte little-endian form (for the fast compare);
    // out: cap*16 uint16 buffer.  Returns rows written, < 0 on error.
    PyObject *fast = PySequence_Fast(seq, "encode_fr_rows16: not a sequence");
    if (fast == nullptr) {
        return -1;
    }
    int64_t len = PySequence_Fast_GET_SIZE(fast);
    if (len > cap) {
        Py_DECREF(fast);
        return -2;
    }
    for (int64_t i = 0; i < len; ++i) {
        PyObject *v = PySequence_Fast_GET_ITEM(fast, i);  // borrowed
        uint8_t buf[32];
        bool need_mod = false;
        if (_PyLong_AsByteArray(reinterpret_cast<PyLongObject *>(v), buf, 32,
                                /*little_endian=*/1, /*is_signed=*/0) < 0) {
            PyErr_Clear();  // negative or >= 2^256
            need_mod = true;
        } else {
            // reduce iff v >= modulus (compare from the high byte)
            for (int b = 31; b >= 0; --b) {
                if (buf[b] != mod_le[b]) {
                    need_mod = buf[b] > mod_le[b];
                    break;
                }
                if (b == 0) {
                    need_mod = true;  // v == modulus
                }
            }
        }
        if (need_mod) {
            PyObject *red = PyNumber_Remainder(v, modulus);
            if (red == nullptr ||
                _PyLong_AsByteArray(reinterpret_cast<PyLongObject *>(red),
                                    buf, 32, 1, 0) < 0) {
                Py_XDECREF(red);
                Py_DECREF(fast);
                return -3;
            }
            Py_DECREF(red);
        }
        std::memcpy(out + i * 16, buf, 32);
    }
    Py_DECREF(fast);
    return len;
}

"""Native (C++) host runtime components, loaded via ctypes.

The host side of the framework mirrors the reference's compiled-native
footing where it's hot: Poseidon hashing dominates witness generation
(sparse-tree rehash paths), so it runs in a C++ engine with 4x64-limb
Montgomery arithmetic.  Built on first use with g++ (no pip deps);
falls back silently to the pure-Python twin if no toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native", "poseidon.cpp")
_SO = os.path.join(os.path.expanduser("~/.cache"), "bazuka_tpu_native", "poseidon.so")

_lib = None
_lock = threading.Lock()
_initialized_widths = set()


def _build() -> bool:
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def load():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.poseidon_init.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p, ctypes.c_int,
        ]
        lib.poseidon_hash.argtypes = [
            ctypes.c_int, ctypes.c_char_p, ctypes.c_char_p,
        ]
        lib.poseidon_hash_batch.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_char_p, ctypes.c_char_p,
        ]
        _lib = lib
        return _lib


def _ensure_width(t: int):
    if t in _initialized_widths:
        return
    from ..zk.poseidon_host import params_for_width

    p = params_for_width(t)
    rc = b"".join(int(x).to_bytes(32, "little") for x in p.round_constants)
    mds = b"".join(
        int(x).to_bytes(32, "little") for row in p.mds for x in row
    )
    _lib.poseidon_init(
        t, p.full_rounds, p.partial_rounds,
        rc, len(p.round_constants), mds, t * t,
    )
    _initialized_widths.add(t)


def native_poseidon(vals) -> int | None:
    """Hash via the native engine; None if the engine is unavailable."""
    lib = load()
    if lib is None:
        return None
    arity = len(vals)
    t = arity + 1
    with _lock:
        _ensure_width(t)
    buf = b"".join(int(v).to_bytes(32, "little") for v in vals)
    out = ctypes.create_string_buffer(32)
    lib.poseidon_hash(arity, buf, out)
    return int.from_bytes(out.raw, "little")


_SRC2 = os.path.join(os.path.dirname(_SRC), "scalarops.cpp")
_SO2 = os.path.join(os.path.dirname(_SO), "scalarops.so")
_lib2 = None


def load_scalarops():
    """Load (building if needed) the scalar-utils library; None if
    unavailable."""
    global _lib2
    with _lock:
        if _lib2 is not None:
            return _lib2
        if not os.path.exists(_SO2) or os.path.getmtime(_SO2) < os.path.getmtime(_SRC2):
            try:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", _SO2, _SRC2],
                    check=True, capture_output=True, timeout=120,
                )
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_SO2)
        except OSError:
            return None
        lib.group_rows16.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.group_rows16.restype = ctypes.c_int64
        _lib2 = lib
        return _lib2


def native_group_rows16(rows):
    """(N, 16) uint32 array -> (order, inverse, counts, n_groups) via
    the C++ index sort, or None if the native lib is unavailable.
    Grouping semantics match np.unique(return_inverse, return_counts)
    on value-lexicographic order."""
    import numpy as np

    lib = load_scalarops()
    if lib is None:
        return None
    rows = np.ascontiguousarray(rows, dtype=np.uint32)
    n = rows.shape[0]
    order = np.empty(n, np.int32)
    inverse = np.empty(n, np.int32)
    counts = np.empty(n, np.int32)
    ng = lib.group_rows16(
        rows.ctypes.data, n, order.ctypes.data, inverse.ctypes.data,
        counts.ctypes.data,
    )
    return order, inverse, counts[:ng], int(ng)


def native_poseidon_batch(arity: int, flat_vals) -> list | None:
    """Hash n inputs of the same arity; flat_vals length n*arity ints."""
    lib = load()
    if lib is None:
        return None
    n = len(flat_vals) // arity
    t = arity + 1
    with _lock:
        _ensure_width(t)
    buf = b"".join(int(v).to_bytes(32, "little") for v in flat_vals)
    out = ctypes.create_string_buffer(32 * n)
    lib.poseidon_hash_batch(arity, n, buf, out)
    return [
        int.from_bytes(out.raw[32 * i : 32 * (i + 1)], "little") for i in range(n)
    ]


_SRC3 = os.path.join(os.path.dirname(_SRC), "witness.cpp")
_SO3 = os.path.join(os.path.dirname(_SO), "witness.so")
_lib3 = None


def load_witness():
    """Load (building if needed) the witness limb encoder.  Needs the
    CPython headers (Python.h) at build time and ctypes.PyDLL at load
    time — the function walks PyObjects, so the GIL must stay held.
    None if unavailable (callers fall back to the bytes path)."""
    global _lib3
    import sysconfig

    with _lock:
        if _lib3 is not None:
            return _lib3
        if (not os.path.exists(_SO3)
                or os.path.getmtime(_SO3) < os.path.getmtime(_SRC3)):
            inc = sysconfig.get_paths()["include"]
            try:
                subprocess.run(
                    ["g++", "-O2", "-shared", "-fPIC", "-I", inc,
                     "-o", _SO3, _SRC3],
                    check=True, capture_output=True, timeout=120,
                )
            except Exception:
                return None
        try:
            lib = ctypes.PyDLL(_SO3)
        except OSError:
            return None
        lib.encode_fr_rows16.argtypes = [
            ctypes.py_object, ctypes.py_object,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ]
        lib.encode_fr_rows16.restype = ctypes.c_int64
        _lib3 = lib
        return _lib3


def native_encode_fr16(values, modulus: int):
    """Sequence of ints -> (len, 16) uint16 limb rows (little-endian
    16-bit limbs), reduced mod `modulus`; None if the native encoder is
    unavailable.  One C pass replaces the per-element `v % P` +
    `int.to_bytes` Python path (~10x at 13M witness elements)."""
    import numpy as np

    lib = load_witness()
    if lib is None:
        return None
    n = len(values)
    out = np.empty((n, 16), np.uint16)
    mod_le = np.frombuffer(
        int(modulus).to_bytes(32, "little"), np.uint8
    ).copy()
    got = lib.encode_fr_rows16(values, modulus, mod_le.ctypes.data,
                               out.ctypes.data, n)
    if got != n:
        return None
    return out

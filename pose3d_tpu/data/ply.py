"""PLY vertex loading — replaces the reference's pymesh2 dependency.

The reference calls `pymesh.load_mesh(path).vertices` per __getitem__
(auxiliary/dataset.py:130), reloading the same .ply every epoch — the
dominant loader cost per SURVEY.md §3.5. Here:

  * a native C++ parser (native/ply_reader.cpp, loaded via ctypes) for the
    hot path, with a pure-numpy fallback when the shared lib isn't built;
  * an in-process LRU-ish cache keyed by path, so each mesh is parsed once
    per process instead of once per sample per epoch.

Supports ascii 1.0 and binary_little_endian 1.0 with float/double x,y,z as
the first three vertex properties (the `compressed.ply` files the reference
consumes are exactly this).
"""

from __future__ import annotations

import ctypes
import os
import threading

import numpy as np

_NATIVE_LIB_NAMES = ("libply_reader.so",)
_native = None
_native_checked = False
_cache: dict[str, np.ndarray] = {}
_cache_lock = threading.Lock()

_PROP_SIZES = {
    "char": 1, "uchar": 1, "int8": 1, "uint8": 1,
    "short": 2, "ushort": 2, "int16": 2, "uint16": 2,
    "int": 4, "uint": 4, "int32": 4, "uint32": 4, "float": 4, "float32": 4,
    "double": 8, "float64": 8,
}


def _find_native():
    global _native, _native_checked
    if _native_checked:
        return _native
    _native_checked = True
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    candidates = [os.path.join(here, "native", n) for n in _NATIVE_LIB_NAMES]
    env = os.environ.get("POSE3D_PLY_LIB")
    if env:
        candidates.insert(0, env)
    for c in candidates:
        if os.path.exists(c):
            try:
                lib = ctypes.CDLL(c)
                lib.ply_read_vertices.argtypes = [
                    ctypes.c_char_p,
                    ctypes.POINTER(ctypes.c_long),
                ]
                lib.ply_read_vertices.restype = ctypes.POINTER(ctypes.c_float)
                lib.ply_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
                _native = lib
                break
            except OSError:
                continue
    return _native


def _load_native(path: str) -> np.ndarray | None:
    lib = _find_native()
    if lib is None:
        return None
    n = ctypes.c_long(0)
    ptr = lib.ply_read_vertices(path.encode(), ctypes.byref(n))
    if not ptr or n.value <= 0:
        return None
    try:
        arr = np.ctypeslib.as_array(ptr, shape=(n.value, 3)).copy()
    finally:
        lib.ply_free(ptr)
    return arr.astype(np.float32)


def _parse_header(f):
    magic = f.readline().strip()
    if magic != b"ply":
        raise ValueError("not a PLY file")
    fmt = None
    n_vertices = 0
    vertex_props: list[tuple[str, str]] = []
    current_element = None
    while True:
        line = f.readline()
        if not line:
            raise ValueError("unterminated PLY header")
        tokens = line.decode("ascii", "replace").split()
        if not tokens:
            continue
        if tokens[0] == "format":
            fmt = tokens[1]
        elif tokens[0] == "element":
            current_element = tokens[1]
            if current_element == "vertex":
                n_vertices = int(tokens[2])
        elif tokens[0] == "property" and current_element == "vertex":
            if tokens[1] == "list":
                raise ValueError("list property in vertex element unsupported")
            vertex_props.append((tokens[1], tokens[2]))
        elif tokens[0] == "end_header":
            break
    return fmt, n_vertices, vertex_props


def _load_numpy(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        fmt, n, props = _parse_header(f)
        names = [p[1] for p in props]
        if names[:3] != ["x", "y", "z"]:
            # be tolerant: find x/y/z positions
            ix = {nm: i for i, nm in enumerate(names)}
            if not all(k in ix for k in "xyz"):
                raise ValueError(f"PLY vertex element lacks x/y/z: {names}")
        if fmt == "ascii":
            out = np.empty((n, 3), np.float32)
            xi = names.index("x"); yi = names.index("y"); zi = names.index("z")
            for i in range(n):
                vals = f.readline().split()
                out[i, 0] = float(vals[xi])
                out[i, 1] = float(vals[yi])
                out[i, 2] = float(vals[zi])
            return out
        if fmt in ("binary_little_endian", "binary_big_endian"):
            endian = "<" if fmt == "binary_little_endian" else ">"
            np_types = {1: "i1", 2: "i2", 4: "f4", 8: "f8"}
            dtype_fields = []
            for j, (ptype, pname) in enumerate(props):
                size = _PROP_SIZES[ptype]
                base = {"float": "f4", "float32": "f4", "double": "f8", "float64": "f8"}.get(
                    ptype, np_types[size]
                )
                dtype_fields.append((pname if pname else f"p{j}", endian + base))
            dt = np.dtype(dtype_fields)
            raw = np.frombuffer(f.read(n * dt.itemsize), dtype=dt, count=n)
            return np.stack(
                [raw["x"].astype(np.float32), raw["y"].astype(np.float32),
                 raw["z"].astype(np.float32)], axis=1
            )
        raise ValueError(f"unsupported PLY format {fmt}")


def load_vertices(path: str, cache: bool = True) -> np.ndarray:
    """Read the (V, 3) float32 vertex array of a PLY file.

    Cached per process by default (kills the reference's per-item reload).
    """
    if cache:
        with _cache_lock:
            hit = _cache.get(path)
        if hit is not None:
            return hit
    arr = _load_native(path)
    if arr is None:
        arr = _load_numpy(path)
    if cache:
        with _cache_lock:
            _cache[path] = arr
    return arr


def write_ply(path: str, vertices: np.ndarray, binary: bool = True) -> None:
    """Write a minimal vertex-only PLY (used by synthetic fixtures/tests)."""
    v = np.asarray(vertices, np.float32)
    with open(path, "wb") as f:
        hdr = [
            b"ply",
            b"format binary_little_endian 1.0" if binary else b"format ascii 1.0",
            b"element vertex %d" % len(v),
            b"property float x",
            b"property float y",
            b"property float z",
            b"end_header",
        ]
        f.write(b"\n".join(hdr) + b"\n")
        if binary:
            f.write(v.astype("<f4").tobytes())
        else:
            for row in v:
                f.write(("%.9g %.9g %.9g\n" % tuple(row)).encode())


def clear_cache() -> None:
    with _cache_lock:
        _cache.clear()

"""ctypes bindings for the native C++ VTK writer.

Builds ``libvtkwriter.so`` from vtkwriter.cc on first use (g++ is part
of the toolchain); falls back transparently to the pure-Python writer
in tpufluids/io/vtk.py when a compiler is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libvtkwriter.so")
_SRC = os.path.join(_HERE, "vtkwriter.cc")
_lock = threading.Lock()
_lib = None


def build(force: bool = False) -> str:
    """Compile the shared library if needed; returns its path."""
    with _lock:
        if force or not os.path.exists(_SO) or (
                os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                 "-o", _SO, _SRC],
                check=True, capture_output=True)
    return _SO


def load():
    """Load (building if necessary) the native library, or raise."""
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(build())
        i32p = ctypes.POINTER(ctypes.c_int32)
        f32p = ctypes.POINTER(ctypes.c_float)
        charpp = ctypes.POINTER(ctypes.c_char_p)
        f32pp = ctypes.POINTER(f32p)
        lib.vw_write_point_mesh.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int64, f32p,
            ctypes.c_int, i32p, charpp, f32pp]
        lib.vw_write_unstructured_mesh.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int64, f32p,
            ctypes.c_int64, i32p, i32p, ctypes.c_int, i32p, i32p,
            charpp, f32pp]
        lib.vw_write_rectilinear_mesh.argtypes = [
            ctypes.c_char_p, ctypes.c_int, i32p, f32p, f32p, f32p,
            ctypes.c_int, i32p, i32p, charpp, f32pp]
        lib.vw_write_regular_mesh.argtypes = [
            ctypes.c_char_p, ctypes.c_int, i32p, ctypes.c_int, i32p, i32p,
            charpp, f32pp]
        lib.vw_write_curvilinear_mesh.argtypes = [
            ctypes.c_char_p, ctypes.c_int, i32p, f32p, ctypes.c_int, i32p,
            i32p, charpp, f32pp]
        for fn in ("vw_write_point_mesh", "vw_write_unstructured_mesh",
                   "vw_write_rectilinear_mesh", "vw_write_regular_mesh",
                   "vw_write_curvilinear_mesh"):
            getattr(lib, fn).restype = ctypes.c_int
        _lib = lib
    return _lib


def available() -> bool:
    try:
        load()
        return True
    except Exception:
        return False


def _f32(a):
    return np.ascontiguousarray(a, np.float32)


def _i32(a):
    return np.ascontiguousarray(a, np.int32)


def _varargs(vardim, varnames, vars_):
    n = len(varnames)
    dims = _i32(list(vardim))
    names = (ctypes.c_char_p * n)(*[v.encode() for v in varnames])
    arrs = [_f32(np.asarray(v).reshape(-1)) for v in vars_]
    ptrs = (ctypes.POINTER(ctypes.c_float) * n)(
        *[a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) for a in arrs])
    return n, dims, names, ptrs, arrs  # keep arrs alive


def _ip(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _fp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def write_point_mesh(filename, use_binary, npts, pts, nvars=None,
                     vardim=(), varnames=(), vars_=()):
    lib = load()
    pts = _f32(np.asarray(pts).reshape(-1))
    n, dims, names, ptrs, keep = _varargs(vardim, varnames, vars_)
    rc = lib.vw_write_point_mesh(
        str(filename).encode(), int(use_binary), int(npts), _fp(pts),
        n, _ip(dims), names, ptrs)
    if rc:
        raise IOError(f"native vtk writer failed with code {rc}")


def write_unstructured_mesh(filename, use_binary, npts, pts, ncells,
                            celltypes, conn, nvars=None, vardim=(),
                            centering=(), varnames=(), vars_=()):
    lib = load()
    pts = _f32(np.asarray(pts).reshape(-1))
    ct = _i32(celltypes)
    cn = _i32(np.asarray(conn).reshape(-1))
    cent = _i32(list(centering))
    n, dims, names, ptrs, keep = _varargs(vardim, varnames, vars_)
    rc = lib.vw_write_unstructured_mesh(
        str(filename).encode(), int(use_binary), int(npts), _fp(pts),
        int(ncells), _ip(ct), _ip(cn), n, _ip(dims), _ip(cent), names, ptrs)
    if rc:
        raise IOError(f"native vtk writer failed with code {rc}")


def write_rectilinear_mesh(filename, use_binary, dims, x, y, z, nvars=None,
                           vardim=(), centering=(), varnames=(), vars_=()):
    lib = load()
    d = _i32(list(dims))
    x, y, z = _f32(x), _f32(y), _f32(z)
    cent = _i32(list(centering))
    n, vdims, names, ptrs, keep = _varargs(vardim, varnames, vars_)
    rc = lib.vw_write_rectilinear_mesh(
        str(filename).encode(), int(use_binary), _ip(d), _fp(x), _fp(y),
        _fp(z), n, _ip(vdims), _ip(cent), names, ptrs)
    if rc:
        raise IOError(f"native vtk writer failed with code {rc}")


def write_regular_mesh(filename, use_binary, dims, nvars=None, vardim=(),
                       centering=(), varnames=(), vars_=()):
    lib = load()
    d = _i32(list(dims))
    cent = _i32(list(centering))
    n, vdims, names, ptrs, keep = _varargs(vardim, varnames, vars_)
    rc = lib.vw_write_regular_mesh(
        str(filename).encode(), int(use_binary), _ip(d), n, _ip(vdims),
        _ip(cent), names, ptrs)
    if rc:
        raise IOError(f"native vtk writer failed with code {rc}")


def write_curvilinear_mesh(filename, use_binary, dims, pts, nvars=None,
                           vardim=(), centering=(), varnames=(), vars_=()):
    lib = load()
    d = _i32(list(dims))
    pts = _f32(np.asarray(pts).reshape(-1))
    cent = _i32(list(centering))
    n, vdims, names, ptrs, keep = _varargs(vardim, varnames, vars_)
    rc = lib.vw_write_curvilinear_mesh(
        str(filename).encode(), int(use_binary), _ip(d), _fp(pts), n,
        _ip(vdims), _ip(cent), names, ptrs)
    if rc:
        raise IOError(f"native vtk writer failed with code {rc}")

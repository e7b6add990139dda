"""Legacy-VTK writers with visit_writer parity.

Reimplements the full library surface of the vendored LLNL visit_writer
(visit_writer.cpp/.h — public-domain VisIt boilerplate) used by the
reference drivers:

* ``write_point_mesh``        (visit_writer.cpp:673-719, the one the
                               drivers call: solver-unidyn.cu:487)
* ``write_unstructured_mesh`` (:801-853)
* ``write_rectilinear_mesh``  (:894-932)
* ``write_regular_mesh``      (:968-991, delegates to rectilinear)
* ``write_curvilinear_mesh``  (:1032-1061)

Format parity details reproduced exactly:

* header ``# vtk DataFile Version 2.0`` / ``Written using VisIt writer``
  / ``ASCII|BINARY`` (visit_writer.cpp:327-335)
* ASCII floats as ``%20.12e `` and ints as ``%d ``, 9 values per line
  (visit_writer.cpp:256-312)
* binary values are 4-byte **big-endian** (``force_big_endian``,
  visit_writer.cpp:182-204), with no newlines between binary blocks
  (matching visit_writer, which only newlines in ASCII mode)
* variable layout (``write_variables``, visit_writer.cpp:358-644):
  CELL_DATA section then POINT_DATA; the first scalar becomes
  ``SCALARS name float`` + ``LOOKUP_TABLE default``, the first vector
  ``VECTORS name float``; all remaining scalars are grouped in one
  ``FIELD FieldData`` block and remaining vectors in another (the
  VTK-reader workaround documented at visit_writer.cpp:342-351).

A fast C implementation with the same semantics lives in
tpufluids/io/native; ``set_backend("native")`` switches to it.
"""

from __future__ import annotations

import numpy as np

VISIT_VERTEX = 1
VISIT_LINE = 3
VISIT_TRIANGLE = 5
VISIT_QUAD = 9
VISIT_TETRA = 10
VISIT_HEXAHEDRON = 12
VISIT_WEDGE = 13
VISIT_PYRAMID = 14

_CELL_NPTS = {
    VISIT_VERTEX: 1, VISIT_LINE: 2, VISIT_TRIANGLE: 3, VISIT_QUAD: 4,
    VISIT_TETRA: 4, VISIT_HEXAHEDRON: 8, VISIT_WEDGE: 6, VISIT_PYRAMID: 5,
}


class _Writer:
    """Mirror of visit_writer's global fp/useBinary/numInColumn state
    machine (visit_writer.cpp:92-335)."""

    def __init__(self, filename: str, use_binary: bool):
        if not filename.endswith(".vtk"):
            filename = filename + ".vtk"
        self.f = open(filename, "wb")
        self.binary = use_binary
        self.col = 0

    def string(self, s: str):
        self.f.write(s.encode("ascii"))

    def end_line(self):
        if not self.binary:
            self.f.write(b"\n")
            self.col = 0

    def new_section(self):
        if self.col != 0:
            self.end_line()
        self.col = 0

    def ints(self, vals):
        vals = np.asarray(vals, ">i4").ravel()
        if self.binary:
            self.f.write(vals.tobytes())
        else:
            self._ascii(vals, "%d ")

    def floats(self, vals):
        vals = np.asarray(vals, np.float32).ravel()
        if self.binary:
            self.f.write(vals.astype(">f4").tobytes())
        else:
            self._ascii(vals, "%20.12e ")

    def _ascii(self, vals, fmt):
        # 9 values per line, carrying the running column count across
        # calls exactly like numInColumn (visit_writer.cpp:268, 307)
        out = []
        col = self.col
        for v in vals.tolist():
            out.append(fmt % v)
            col += 1
            if col % 9 == 0:
                out.append("\n")
                col = 0
        self.col = col
        self.f.write("".join(out).encode("ascii"))

    def header(self):
        self.string("# vtk DataFile Version 2.0\n")
        self.string("Written using VisIt writer\n")
        self.string("BINARY\n" if self.binary else "ASCII\n")

    def close(self):
        self.end_line()
        self.f.close()


def _write_variables(w: _Writer, vardim, centering, varnames, vars_,
                     npts, ncells):
    """Port of write_variables (visit_writer.cpp:358-644)."""
    for want_point, count, label in ((0, ncells, "CELL_DATA"),
                                     (1, npts, "POINT_DATA")):
        w.new_section()
        w.string(f"{label} {count}\n")
        first_scalar = first_vector = False
        extra_scalars, extra_vectors = [], []
        for name, dim, cent, data in zip(varnames, vardim, centering, vars_):
            is_point = 1 if cent != 0 else 0
            if is_point != want_point:
                continue
            if dim == 1:
                if not first_scalar:
                    w.string(f"SCALARS {name} float\n")
                    w.string("LOOKUP_TABLE default\n")
                    w.floats(np.asarray(data)[: count * dim])
                    w.end_line()
                    first_scalar = True
                else:
                    extra_scalars.append((name, data))
            elif dim == 3:
                if not first_vector:
                    w.string(f"VECTORS {name} float\n")
                    w.floats(np.asarray(data)[: count * dim])
                    w.end_line()
                    first_vector = True
                else:
                    extra_vectors.append((name, data))
            # other dims are ignored with a warning in the reference
        if extra_scalars:
            w.string(f"FIELD FieldData {len(extra_scalars)}\n")
            for name, data in extra_scalars:
                w.string(f"{name} 1 {count} float\n")
                w.floats(np.asarray(data)[:count])
                w.end_line()
        if extra_vectors:
            w.string(f"FIELD FieldData {len(extra_vectors)}\n")
            for name, data in extra_vectors:
                w.string(f"{name} 3 {count} float\n")
                w.floats(np.asarray(data)[: count * 3])
                w.end_line()


def write_point_mesh(filename, use_binary, npts, pts, nvars=None,
                     vardim=(), varnames=(), vars_=()):
    """Point mesh of VISIT_VERTEX cells, one per particle
    (visit_writer.cpp:673-719). ``pts`` is flat xyz interleaved or
    (npts, 3). All variables are point-centered."""
    pts = np.asarray(pts, np.float32).reshape(-1)
    if nvars is None:
        nvars = len(varnames)
    w = _Writer(filename, use_binary)
    w.header()
    w.string("DATASET UNSTRUCTURED_GRID\n")
    w.string(f"POINTS {npts} float\n")
    w.floats(pts[: 3 * npts])
    w.new_section()
    w.string(f"CELLS {npts} {2 * npts}\n")
    cells = np.empty((npts, 2), np.int64)
    cells[:, 0] = 1
    cells[:, 1] = np.arange(npts)
    if w.binary:
        w.ints(cells)
    else:
        for i in range(npts):
            w.ints(cells[i])
            w.end_line()
    w.new_section()
    w.string(f"CELL_TYPES {npts}\n")
    if w.binary:
        w.ints(np.full(npts, VISIT_VERTEX))
    else:
        for _ in range(npts):
            w.ints([VISIT_VERTEX])
            w.end_line()
    _write_variables(w, list(vardim), [1] * nvars, list(varnames),
                     list(vars_), npts, npts)
    w.close()


def write_unstructured_mesh(filename, use_binary, npts, pts, ncells,
                            celltypes, conn, nvars=None, vardim=(),
                            centering=(), varnames=(), vars_=()):
    """General unstructured mesh (visit_writer.cpp:801-853)."""
    pts = np.asarray(pts, np.float32).reshape(-1)
    celltypes = list(celltypes)
    conn = np.asarray(conn, np.int64).reshape(-1)
    if nvars is None:
        nvars = len(varnames)
    w = _Writer(filename, use_binary)
    w.header()
    w.string("DATASET UNSTRUCTURED_GRID\n")
    w.string(f"POINTS {npts} float\n")
    w.floats(pts[: 3 * npts])
    w.new_section()
    conn_size = sum(_CELL_NPTS[c] + 1 for c in celltypes)
    w.string(f"CELLS {ncells} {conn_size}\n")
    off = 0
    for ct in celltypes:
        k = _CELL_NPTS[ct]
        w.ints([k])
        w.ints(conn[off:off + k])
        w.end_line()
        off += k
    w.new_section()
    w.string(f"CELL_TYPES {ncells}\n")
    for ct in celltypes:
        w.ints([ct])
        w.end_line()
    _write_variables(w, list(vardim), list(centering), list(varnames),
                     list(vars_), npts, ncells)
    w.close()


def write_rectilinear_mesh(filename, use_binary, dims, x, y, z,
                           nvars=None, vardim=(), centering=(),
                           varnames=(), vars_=()):
    """Rectilinear mesh (visit_writer.cpp:894-932)."""
    if nvars is None:
        nvars = len(varnames)
    npts = dims[0] * dims[1] * dims[2]
    ncells = max(dims[0] - 1, 1) * max(dims[1] - 1, 1) * max(dims[2] - 1, 1)
    w = _Writer(filename, use_binary)
    w.header()
    w.string("DATASET RECTILINEAR_GRID\n")
    w.string(f"DIMENSIONS {dims[0]} {dims[1]} {dims[2]}\n")
    for label, coords, d in (("X", x, dims[0]), ("Y", y, dims[1]),
                             ("Z", z, dims[2])):
        w.string(f"{label}_COORDINATES {d} float\n")
        w.floats(np.asarray(coords, np.float32)[:d])
        w.new_section()
    _write_variables(w, list(vardim), list(centering), list(varnames),
                     list(vars_), npts, ncells)
    w.close()


def write_regular_mesh(filename, use_binary, dims, nvars=None, vardim=(),
                       centering=(), varnames=(), vars_=()):
    """Regular mesh: rectilinear with identity coordinates
    (visit_writer.cpp:968-991)."""
    write_rectilinear_mesh(
        filename, use_binary, dims,
        np.arange(dims[0], dtype=np.float32),
        np.arange(dims[1], dtype=np.float32),
        np.arange(dims[2], dtype=np.float32),
        nvars, vardim, centering, varnames, vars_)


def write_curvilinear_mesh(filename, use_binary, dims, pts, nvars=None,
                           vardim=(), centering=(), varnames=(), vars_=()):
    """Curvilinear (structured) mesh (visit_writer.cpp:1032-1061)."""
    if nvars is None:
        nvars = len(varnames)
    npts = dims[0] * dims[1] * dims[2]
    ncells = max(dims[0] - 1, 1) * max(dims[1] - 1, 1) * max(dims[2] - 1, 1)
    w = _Writer(filename, use_binary)
    w.header()
    w.string("DATASET STRUCTURED_GRID\n")
    w.string(f"DIMENSIONS {dims[0]} {dims[1]} {dims[2]}\n")
    w.string(f"POINTS {npts} float\n")
    w.floats(np.asarray(pts, np.float32).reshape(-1)[: 3 * npts])
    _write_variables(w, list(vardim), list(centering), list(varnames),
                     list(vars_), npts, ncells)
    w.close()


def write_particle_snapshot(filename, state, cfg=None, varnames=(
        "mass", "surface_level"), use_binary=False):
    """Convenience: dump a ParticleState the way the drivers do.

    unidyn writes positions + mass + |diffusion|^2 "surface_level"
    (solver-unidyn.cu:118, 462-466, 487); base stages dens + cellnumber
    (solver.cu:108, FluidGPU.cu:408-416).  Dead slots are excluded.
    """
    import numpy as _np
    alive = _np.asarray(state.alive)
    pos = _np.asarray(state.pos)[alive]
    fields = {
        "mass": lambda: _np.asarray(state.mass)[alive],
        "surface_level": lambda: _np.sum(
            _np.asarray(state.diffusion)[alive] ** 2, axis=-1),
        "dens": lambda: _np.asarray(state.dens)[alive],
        "press": lambda: _np.asarray(state.press)[alive],
        "solid": lambda: _np.asarray(state.solid)[alive],
        "vel": lambda: _np.asarray(state.vel)[alive].reshape(-1),
    }
    if cfg is not None:
        from tpufluids.binning import cell_id as _cid

        def _cellnumber():
            cid, _ = _cid(state.pos, state.alive, cfg)
            return _np.asarray(cid, _np.float32)[alive]

        fields["cellnumber"] = _cellnumber
    vardim = [3 if n == "vel" else 1 for n in varnames]
    vars_ = [fields[n]() for n in varnames]
    write_point_mesh(filename, int(use_binary), pos.shape[0], pos,
                     len(varnames), vardim, list(varnames), vars_)

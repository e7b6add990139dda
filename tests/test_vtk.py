"""VTK writer tests: format parity (header, ASCII layout, binary
big-endianness) and byte-for-byte agreement between the pure-Python and
native C++ writers for all five mesh types in both modes."""

import struct

import numpy as np
import pytest

from tpufluids.io import native, vtk


@pytest.fixture
def sample():
    rng = np.random.default_rng(0)
    npts = 23
    pts = rng.normal(size=(npts, 3)).astype(np.float32)
    scal1 = rng.normal(size=npts).astype(np.float32)
    scal2 = rng.normal(size=npts).astype(np.float32)
    vec1 = rng.normal(size=(npts, 3)).astype(np.float32)
    vec2 = rng.normal(size=(npts, 3)).astype(np.float32)
    return npts, pts, scal1, scal2, vec1, vec2


def test_point_mesh_ascii_layout(tmp_path, sample):
    npts, pts, s1, s2, v1, v2 = sample
    f = tmp_path / "pm"
    vtk.write_point_mesh(str(f), 0, npts, pts, 2, [1, 1],
                         ["dens", "cellnumber"], [s1, s2])
    text = (tmp_path / "pm.vtk").read_text()
    lines = text.splitlines()
    assert lines[0] == "# vtk DataFile Version 2.0"
    assert lines[1] == "Written using VisIt writer"
    assert lines[2] == "ASCII"
    assert lines[3] == "DATASET UNSTRUCTURED_GRID"
    assert lines[4] == f"POINTS {npts} float"
    assert f"CELLS {npts} {2 * npts}" in text
    assert f"CELL_TYPES {npts}" in text
    assert "SCALARS dens float" in text
    assert "LOOKUP_TABLE default" in text
    assert "FIELD FieldData 1" in text
    assert f"cellnumber 1 {npts} float" in text
    # ASCII floats 9 per line: the points block has ceil(69/9) = 8 lines
    pts_lines = lines[5:13]
    count = sum(len(l.split()) for l in pts_lines)
    assert count == 3 * npts
    # %20.12e formatting
    first = lines[5].split()[0]
    assert "e" in first and len(first.split("e")[0].split(".")[1]) == 12
    # values round-trip
    flat = np.array([float(x) for l in pts_lines for x in l.split()],
                    np.float32)
    np.testing.assert_array_equal(flat, pts.reshape(-1))


def test_point_mesh_binary_big_endian(tmp_path, sample):
    npts, pts, s1, s2, v1, v2 = sample
    f = tmp_path / "pmb"
    vtk.write_point_mesh(str(f), 1, npts, pts, 1, [1], ["mass"], [s1])
    raw = (tmp_path / "pmb.vtk").read_bytes()
    head = f"# vtk DataFile Version 2.0\nWritten using VisIt writer\nBINARY\nDATASET UNSTRUCTURED_GRID\nPOINTS {npts} float\n".encode()
    assert raw.startswith(head)
    off = len(head)
    vals = struct.unpack(f">{3 * npts}f", raw[off:off + 12 * npts])
    np.testing.assert_allclose(np.array(vals, np.float32),
                               pts.reshape(-1), rtol=0)


def test_vector_variable_promotion(tmp_path, sample):
    npts, pts, s1, s2, v1, v2 = sample
    f = tmp_path / "vec"
    vtk.write_point_mesh(str(f), 0, npts, pts, 4, [1, 3, 1, 3],
                         ["a", "v", "b", "w"], [s1, v1, s2, v2])
    text = (tmp_path / "vec.vtk").read_text()
    assert "SCALARS a float" in text
    assert "VECTORS v float" in text
    # second scalar and second vector go to separate FIELD groups
    assert text.count("FIELD FieldData 1") == 2
    assert f"b 1 {npts} float" in text
    assert f"w 3 {npts} float" in text


def test_rectilinear_and_regular(tmp_path):
    dims = [3, 4, 2]
    x = np.arange(3, dtype=np.float32)
    y = np.arange(4, dtype=np.float32) * 0.5
    z = np.arange(2, dtype=np.float32) + 2
    npts = 24
    ncells = 2 * 3 * 1
    pdata = np.arange(npts, dtype=np.float32)
    cdata = np.arange(ncells, dtype=np.float32)
    f = tmp_path / "rect"
    vtk.write_rectilinear_mesh(str(f), 0, dims, x, y, z, 2, [1, 1],
                               [1, 0], ["p", "c"], [pdata, cdata])
    text = (tmp_path / "rect.vtk").read_text()
    assert "DATASET RECTILINEAR_GRID" in text
    assert "DIMENSIONS 3 4 2" in text
    assert "X_COORDINATES 3 float" in text
    assert f"CELL_DATA {ncells}" in text
    assert f"POINT_DATA {npts}" in text
    assert "SCALARS c float" in text  # cell-centered primary scalar
    assert "SCALARS p float" in text

    f2 = tmp_path / "reg"
    vtk.write_regular_mesh(str(f2), 0, dims, 1, [1], [1], ["p"], [pdata])
    t2 = (tmp_path / "reg.vtk").read_text()
    assert "X_COORDINATES 3 float" in t2


def test_unstructured_mesh(tmp_path):
    pts = np.array([[0, 0, 0], [0, 1, 0], [1, 1, 0], [1, 0, 0]],
                   np.float32)
    conn = [0, 1, 2, 0, 2, 3]
    f = tmp_path / "un"
    vtk.write_unstructured_mesh(str(f), 0, 4, pts, 2,
                                [vtk.VISIT_TRIANGLE, vtk.VISIT_TRIANGLE],
                                conn, 1, [1], [1], ["s"],
                                [np.arange(4, dtype=np.float32)])
    text = (tmp_path / "un.vtk").read_text()
    assert "CELLS 2 8" in text
    assert "CELL_TYPES 2" in text


def test_curvilinear_mesh(tmp_path):
    dims = [2, 2, 2]
    pts = np.random.default_rng(1).normal(size=(8, 3)).astype(np.float32)
    f = tmp_path / "cur"
    vtk.write_curvilinear_mesh(str(f), 0, dims, pts, 1, [1], [1], ["s"],
                               [np.arange(8, dtype=np.float32)])
    text = (tmp_path / "cur.vtk").read_text()
    assert "DATASET STRUCTURED_GRID" in text
    assert "DIMENSIONS 2 2 2" in text


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
@pytest.mark.parametrize("binary", [0, 1])
def test_native_matches_python_bytes(tmp_path, sample, binary):
    npts, pts, s1, s2, v1, v2 = sample
    args = (npts, pts, 4, [1, 3, 1, 3], ["a", "v", "b", "w"],
            [s1, v1, s2, v2])
    vtk.write_point_mesh(str(tmp_path / "py"), binary, *args)
    native.write_point_mesh(str(tmp_path / "nat"), binary, *args)
    assert (tmp_path / "py.vtk").read_bytes() == (
        tmp_path / "nat.vtk").read_bytes()

    dims = [3, 4, 2]
    x, y, z = (np.arange(3, dtype=np.float32),
               np.arange(4, dtype=np.float32),
               np.arange(2, dtype=np.float32))
    pdata = np.arange(24, dtype=np.float32)
    cdata = np.arange(6, dtype=np.float32)
    rect_args = (dims, x, y, z, 2, [1, 1], [1, 0], ["p", "c"],
                 [pdata, cdata])
    vtk.write_rectilinear_mesh(str(tmp_path / "rpy"), binary, *rect_args)
    native.write_rectilinear_mesh(str(tmp_path / "rnat"), binary, *rect_args)
    assert (tmp_path / "rpy.vtk").read_bytes() == (
        tmp_path / "rnat.vtk").read_bytes()

    reg_args = (dims, 1, [1], [1], ["p"], [pdata])
    vtk.write_regular_mesh(str(tmp_path / "gpy"), binary, *reg_args)
    native.write_regular_mesh(str(tmp_path / "gnat"), binary, *reg_args)
    assert (tmp_path / "gpy.vtk").read_bytes() == (
        tmp_path / "gnat.vtk").read_bytes()

    tri_pts = np.array([[0, 0, 0], [0, 1, 0], [1, 1, 0], [1, 0, 0]],
                       np.float32)
    un_args = (4, tri_pts, 2, [vtk.VISIT_TRIANGLE, vtk.VISIT_TRIANGLE],
               [0, 1, 2, 0, 2, 3], 1, [1], [1], ["s"],
               [np.arange(4, dtype=np.float32)])
    vtk.write_unstructured_mesh(str(tmp_path / "upy"), binary, *un_args)
    native.write_unstructured_mesh(str(tmp_path / "unat"), binary, *un_args)
    assert (tmp_path / "upy.vtk").read_bytes() == (
        tmp_path / "unat.vtk").read_bytes()

    cur_args = ([2, 2, 2], np.arange(24, dtype=np.float32), 1, [1], [1],
                ["s"], [np.arange(8, dtype=np.float32)])
    vtk.write_curvilinear_mesh(str(tmp_path / "cpy"), binary, *cur_args)
    native.write_curvilinear_mesh(str(tmp_path / "cnat"), binary, *cur_args)
    assert (tmp_path / "cpy.vtk").read_bytes() == (
        tmp_path / "cnat.vtk").read_bytes()


def test_particle_snapshot(tmp_path):
    from tpufluids.config import UNIDYN_CONFIG
    from tpufluids.scenes import random_blob
    state = random_blob(20, seed=3, cfg=UNIDYN_CONFIG, capacity=30)
    vtk.write_particle_snapshot(str(tmp_path / "snap"), state,
                                cfg=UNIDYN_CONFIG,
                                varnames=("mass", "surface_level",
                                          "cellnumber"))
    text = (tmp_path / "snap.vtk").read_text()
    assert "POINTS 20 float" in text  # dead slots excluded
    assert "SCALARS mass float" in text
    assert "surface_level 1 20 float" in text

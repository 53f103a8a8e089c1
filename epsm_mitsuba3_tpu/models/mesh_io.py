"""Mesh loading: OBJ / PLY / serialized parsers.

TPU analog of ``src/shapes/{obj,ply,serialized}.cpp``.  Parsing happens on
the host with numpy (a C++ fast path for large meshes lives in
``native/meshio.cpp``); the result is plain arrays handed to the Scene
builder, after which all geometry lives in device HBM as SoA.
"""
from __future__ import annotations

import os
import struct

import numpy as np


def _load_obj_native(path: str):
    """C++ fast-path OBJ loader (native/meshio.cpp) via ctypes; returns
    None when the native library is unavailable."""
    import ctypes
    from ..ops.bvh import _load_native

    lib = _load_native()
    if lib is None or not hasattr(lib, "epsm_obj_parse"):
        return None
    lib.epsm_obj_parse.restype = ctypes.c_void_p
    lib.epsm_obj_parse.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32)]
    lib.epsm_obj_copy.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32)]
    lib.epsm_obj_free.argtypes = [ctypes.c_void_p]

    nv = ctypes.c_int64()
    nf = ctypes.c_int64()
    hn = ctypes.c_int32()
    hu = ctypes.c_int32()
    h = lib.epsm_obj_parse(path.encode(), ctypes.byref(nv), ctypes.byref(nf),
                           ctypes.byref(hn), ctypes.byref(hu))
    if not h:
        return None
    try:
        pos = np.empty((nv.value, 3), np.float32)
        nrm = np.empty((nv.value, 3), np.float32)
        uv = np.empty((nv.value, 2), np.float32)
        faces = np.empty((nf.value, 3), np.int32)
        lib.epsm_obj_copy(
            h, pos.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            nrm.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            uv.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    finally:
        lib.epsm_obj_free(h)
    out = {"vertices": pos, "faces": faces}
    if hn.value:
        out["normals"] = nrm
    if hu.value:
        out["uvs"] = uv
    return out


def load_obj(path: str, flip_tex_coords: bool = True):
    """Wavefront OBJ loader (triangulates polygons, fan style).

    Uses the native C++ fast path (native/meshio.cpp) when available,
    falling back to the pure-python parser.  Returns dict with float32
    ``vertices`` (V,3), int32 ``faces`` (F,3), optional ``normals`` (V,3)
    and ``uvs`` (V,2) resolved per-vertex (OBJ's independent index spaces
    are de-duplicated like obj.cpp:176-280).
    """
    if flip_tex_coords:
        native = _load_obj_native(path)
        if native is not None:
            return native
    positions, normals, texcoords = [], [], []
    vert_map = {}
    out_pos, out_nrm, out_uv, faces = [], [], [], []

    def resolve(token: str) -> int:
        if token in vert_map:
            return vert_map[token]
        parts = token.split("/")
        pi = int(parts[0])
        pi = pi - 1 if pi > 0 else len(positions) + pi
        ti = ni = -1
        if len(parts) > 1 and parts[1]:
            ti = int(parts[1])
            ti = ti - 1 if ti > 0 else len(texcoords) + ti
        if len(parts) > 2 and parts[2]:
            ni = int(parts[2])
            ni = ni - 1 if ni > 0 else len(normals) + ni
        idx = len(out_pos)
        out_pos.append(positions[pi])
        out_nrm.append(normals[ni] if ni >= 0 else None)
        if ti >= 0:
            u, v = texcoords[ti]
            out_uv.append((u, 1.0 - v) if flip_tex_coords else (u, v))
        else:
            out_uv.append(None)
        vert_map[token] = idx
        return idx

    with open(path, "r", errors="replace") as f:
        for line in f:
            if line.startswith("v "):
                positions.append(tuple(float(x) for x in line.split()[1:4]))
            elif line.startswith("vn "):
                normals.append(tuple(float(x) for x in line.split()[1:4]))
            elif line.startswith("vt "):
                t = line.split()[1:3]
                texcoords.append((float(t[0]), float(t[1])))
            elif line.startswith("f "):
                tokens = line.split()[1:]
                idx = [resolve(t) for t in tokens]
                for k in range(1, len(idx) - 1):
                    faces.append((idx[0], idx[k], idx[k + 1]))

    v = np.asarray(out_pos, np.float32).reshape(-1, 3)
    f_arr = np.asarray(faces, np.int32).reshape(-1, 3)
    result = {"vertices": v, "faces": f_arr}
    if any(n is not None for n in out_nrm):
        n = np.asarray(
            [x if x is not None else (0.0, 0.0, 0.0) for x in out_nrm], np.float32
        )
        result["normals"] = n
    if any(u is not None for u in out_uv):
        uv = np.asarray(
            [x if x is not None else (0.0, 0.0) for x in out_uv], np.float32
        )
        result["uvs"] = uv
    return result


def load_ply(path: str):
    """PLY loader (ascii + binary_little_endian), analog of ply.cpp."""
    with open(path, "rb") as f:
        if f.readline().strip() != b"ply":
            raise ValueError(f"{path}: not a PLY file")
        fmt = None
        elements = []  # (name, count, [(prop_name, dtype) or ('list', idx_t, cnt_t, name)])
        while True:
            line = f.readline().strip().decode()
            if line.startswith("comment"):
                continue
            if line.startswith("format"):
                fmt = line.split()[1]
            elif line.startswith("element"):
                _, name, cnt = line.split()
                elements.append([name, int(cnt), []])
            elif line.startswith("property"):
                parts = line.split()
                if parts[1] == "list":
                    elements[-1][2].append(("list", parts[2], parts[3], parts[4]))
                else:
                    elements[-1][2].append((parts[2], parts[1]))
            elif line == "end_header":
                break

        type_map = {
            "float": "f4", "float32": "f4", "double": "f8", "float64": "f8",
            "uchar": "u1", "uint8": "u1", "char": "i1", "int8": "i1",
            "ushort": "u2", "uint16": "u2", "short": "i2", "int16": "i2",
            "uint": "u4", "uint32": "u4", "int": "i4", "int32": "i4",
        }
        verts = norms = uvs = colors = None
        faces = []
        for name, count, props in elements:
            if fmt == "ascii":
                rows = [f.readline().split() for _ in range(count)]
                if name == "vertex":
                    cols = [p[0] for p in props]
                    arr = np.asarray(rows, np.float32)
                    verts, norms, uvs, colors = _ply_vertex_cols(arr, cols)
                elif name == "face":
                    for r in rows:
                        n = int(r[0])
                        idx = [int(x) for x in r[1 : n + 1]]
                        for k in range(1, n - 1):
                            faces.append((idx[0], idx[k], idx[k + 1]))
            else:  # binary little endian
                if name == "vertex":
                    dt = np.dtype([(p[0], "<" + type_map[p[1]]) for p in props])
                    data = np.frombuffer(f.read(dt.itemsize * count), dt)
                    cols = [p[0] for p in props]
                    arr = np.stack(
                        [data[c].astype(np.float32) for c in cols], axis=-1
                    )
                    verts, norms, uvs, colors = _ply_vertex_cols(arr, cols)
                elif name == "face":
                    (tag, cnt_t, idx_t, _) = props[0]
                    cnt_dt = np.dtype("<" + type_map[cnt_t])
                    idx_dt = np.dtype("<" + type_map[idx_t])
                    for _ in range(count):
                        n = int(np.frombuffer(f.read(cnt_dt.itemsize), cnt_dt)[0])
                        idx = np.frombuffer(f.read(idx_dt.itemsize * n), idx_dt)
                        for k in range(1, n - 1):
                            faces.append((int(idx[0]), int(idx[k]), int(idx[k + 1])))

    result = {
        "vertices": verts,
        "faces": np.asarray(faces, np.int32).reshape(-1, 3),
    }
    if norms is not None:
        result["normals"] = norms
    if uvs is not None:
        result["uvs"] = uvs
    if colors is not None:
        result["colors"] = colors
    return result


def _ply_vertex_cols(arr, cols):
    def get3(names):
        if all(n in cols for n in names):
            return np.stack([arr[:, cols.index(n)] for n in names], -1)
        return None

    verts = get3(["x", "y", "z"])
    norms = get3(["nx", "ny", "nz"])
    uv = None
    for names in (["u", "v"], ["s", "t"], ["texture_u", "texture_v"]):
        if all(n in cols for n in names):
            uv = np.stack([arr[:, cols.index(n)] for n in names], -1)
            break
    colors = get3(["red", "green", "blue"])
    if colors is not None and colors.max() > 1.0:
        colors = colors / 255.0
    return verts, norms, uv, colors


def load_serialized(path: str, shape_index: int = 0):
    """Mitsuba .serialized mesh format (src/shapes/serialized.cpp).

    Layout: magic 0x041C (u16) + version (u16), zlib-compressed stream per
    mesh: flags u32, [name \\0], vertex_count u64, face_count u64,
    positions, [normals], [texcoords], [colors], faces (u32).  An offset
    table at EOF locates additional meshes.
    """
    import zlib

    with open(path, "rb") as f:
        data = f.read()
    magic, version = struct.unpack_from("<HH", data, 0)
    if magic != 0x041C:
        raise ValueError(f"{path}: not a .serialized mesh (magic {magic:#x})")

    # locate mesh start offsets: trailing table of u32/u64 offsets + count
    count = struct.unpack_from("<I", data, len(data) - 4)[0]
    off_size = 8 if version >= 4 else 4
    table_start = len(data) - 4 - count * off_size
    offsets = struct.unpack_from(
        f"<{count}{'Q' if off_size == 8 else 'I'}", data, table_start)
    if shape_index >= count:
        raise ValueError(f"{path}: shape_index {shape_index} >= {count}")

    start = offsets[shape_index] + 4  # skip per-mesh magic+version
    raw = zlib.decompress(data[start:table_start])

    pos = 0
    (flags,) = struct.unpack_from("<I", raw, pos)
    pos += 4
    if version >= 4:  # null-terminated name
        end = raw.index(b"\x00", pos)
        pos = end + 1
    v_count, f_count = struct.unpack_from("<QQ", raw, pos)
    pos += 16
    double_prec = bool(flags & 0x2000)
    fsize = 8 if double_prec else 4
    ftype = "<f8" if double_prec else "<f4"

    def read_block(n):
        nonlocal pos
        arr = np.frombuffer(raw, ftype, count=n, offset=pos)
        pos += n * fsize
        return arr.astype(np.float32)

    verts = read_block(v_count * 3).reshape(-1, 3)
    result = {"vertices": verts}
    if flags & 0x0001:  # has normals
        result["normals"] = read_block(v_count * 3).reshape(-1, 3)
    if flags & 0x0002:  # has texcoords
        result["uvs"] = read_block(v_count * 2).reshape(-1, 2)
    if flags & 0x0008:  # vertex colors (skipped)
        read_block(v_count * 3)
    faces = np.frombuffer(raw, "<u4", count=f_count * 3, offset=pos)
    result["faces"] = faces.astype(np.int32).reshape(-1, 3)
    return result


def load_mesh_file(path: str, shape_index: int = 0):
    ext = os.path.splitext(path)[1].lower()
    if ext == ".obj":
        return load_obj(path)
    if ext == ".ply":
        return load_ply(path)
    if ext == ".serialized":
        return load_serialized(path, shape_index)
    raise ValueError(f"Unsupported mesh format: {path}")


def compute_vertex_normals(vertices: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """Area-weighted vertex normals (mesh.cpp ``recompute_vertex_normals``)."""
    p0 = vertices[faces[:, 0]]
    p1 = vertices[faces[:, 1]]
    p2 = vertices[faces[:, 2]]
    fn = np.cross(p1 - p0, p2 - p0)
    vn = np.zeros_like(vertices)
    for k in range(3):
        np.add.at(vn, faces[:, k], fn)
    norm = np.linalg.norm(vn, axis=-1, keepdims=True)
    return (vn / np.maximum(norm, 1e-20)).astype(np.float32)

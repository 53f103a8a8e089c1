"""Procedural shapes as triangle meshes.

TPU analog of ``src/shapes/{rectangle,cube,disk,sphere,cylinder}.cpp``.
All shapes become triangle meshes up front (the reference keeps spheres
analytic; on TPU a single unified triangle path keeps the intersection
kernel branch-free — spheres tessellate at construction).
"""
from __future__ import annotations

import numpy as np


def rectangle():
    """Unit rectangle on the XY plane, z=0, spanning [-1,1]^2 (rectangle.cpp)."""
    v = np.array(
        [[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], np.float32
    )
    f = np.array([[0, 1, 2], [2, 3, 0]], np.int32)
    n = np.tile(np.array([[0, 0, 1]], np.float32), (4, 1))
    uv = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    return {"vertices": v, "faces": f, "normals": n, "uvs": uv}


def cube():
    """Axis-aligned cube spanning [-1,1]^3 (cube.cpp), outward normals."""
    verts, faces, normals = [], [], []
    axes = [
        ((0, 0, 1), (1, 0, 0), (0, 1, 0)),   # +z
        ((0, 0, -1), (0, 1, 0), (1, 0, 0)),  # -z
        ((1, 0, 0), (0, 1, 0), (0, 0, 1)),   # +x
        ((-1, 0, 0), (0, 0, 1), (0, 1, 0)),  # -x
        ((0, 1, 0), (0, 0, 1), (1, 0, 0)),   # +y
        ((0, -1, 0), (1, 0, 0), (0, 0, 1)),  # -y
    ]
    for n, u, v in axes:
        n = np.array(n, np.float32)
        u = np.array(u, np.float32)
        v = np.array(v, np.float32)
        base = len(verts)
        for su, sv in [(-1, -1), (1, -1), (1, 1), (-1, 1)]:
            verts.append(n + su * u + sv * v)
            normals.append(n)
        faces.append([base, base + 1, base + 2])
        faces.append([base + 2, base + 3, base])
    return {
        "vertices": np.asarray(verts, np.float32),
        "faces": np.asarray(faces, np.int32),
        "normals": np.asarray(normals, np.float32),
    }


def disk(segments: int = 32):
    """Unit disk on XY plane (disk.cpp), triangle fan around the origin."""
    ang = np.linspace(0.0, 2.0 * np.pi, segments, endpoint=False)
    rim = np.stack([np.cos(ang), np.sin(ang), np.zeros_like(ang)], -1)
    v = np.concatenate([np.zeros((1, 3)), rim], axis=0).astype(np.float32)
    f = np.asarray(
        [[0, 1 + i, 1 + (i + 1) % segments] for i in range(segments)], np.int32
    )
    n = np.tile(np.array([[0, 0, 1]], np.float32), (len(v), 1))
    return {"vertices": v, "faces": f, "normals": n}


def sphere(radius: float = 1.0, center=(0.0, 0.0, 0.0), subdiv: int = 32):
    """UV-sphere tessellation (sphere.cpp analytic shape -> mesh)."""
    lat = subdiv
    lon = subdiv * 2
    theta = np.linspace(0.0, np.pi, lat + 1)
    phi = np.linspace(0.0, 2.0 * np.pi, lon, endpoint=False)
    t, p = np.meshgrid(theta, phi, indexing="ij")
    x = np.sin(t) * np.cos(p)
    y = np.sin(t) * np.sin(p)
    z = np.cos(t)
    pts = np.stack([x, y, z], -1).reshape(-1, 3)
    v = (pts * radius + np.asarray(center, np.float32)).astype(np.float32)
    n = pts.astype(np.float32)

    def vid(i, j):
        return i * lon + (j % lon)

    faces = []
    for i in range(lat):
        for j in range(lon):
            a, b = vid(i, j), vid(i, j + 1)
            c, d = vid(i + 1, j + 1), vid(i + 1, j)
            if i > 0:
                faces.append([a, b, c])
            if i < lat - 1:
                faces.append([a, c, d])
    return {
        "vertices": v,
        "faces": np.asarray(faces, np.int32),
        "normals": n,
    }


def cylinder(radius: float = 1.0, segments: int = 32):
    """Open cylinder along +Z, z in [0,1] (cylinder.cpp)."""
    ang = np.linspace(0.0, 2.0 * np.pi, segments, endpoint=False)
    ring = np.stack([radius * np.cos(ang), radius * np.sin(ang)], -1)
    v0 = np.concatenate([ring, np.zeros((segments, 1))], -1)
    v1 = np.concatenate([ring, np.ones((segments, 1))], -1)
    v = np.concatenate([v0, v1], axis=0).astype(np.float32)
    n = np.concatenate(
        [np.concatenate([ring / radius, np.zeros((segments, 1))], -1)] * 2, 0
    ).astype(np.float32)
    faces = []
    for i in range(segments):
        j = (i + 1) % segments
        faces.append([i, j, segments + j])
        faces.append([segments + j, segments + i, i])
    return {"vertices": v, "faces": np.asarray(faces, np.int32), "normals": n}

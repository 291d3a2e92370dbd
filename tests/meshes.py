"""Tiny procedural meshes for tests."""

import numpy as np


def icosphere(subdiv: int = 1, radius: float = 1.0):
    """Icosahedron refined `subdiv` times -> (V (v,3) f32, F (f,3) i32)."""
    t = (1.0 + np.sqrt(5.0)) / 2.0
    verts = np.array([
        [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
        [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
        [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
    ], dtype=np.float64)
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    faces = np.array([
        [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
        [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
        [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
        [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
    ], dtype=np.int64)

    for _ in range(subdiv):
        cache = {}
        verts = list(verts)

        def midpoint(a, b):
            key = (min(a, b), max(a, b))
            if key not in cache:
                m = (np.asarray(verts[a]) + np.asarray(verts[b])) / 2
                m /= np.linalg.norm(m)
                cache[key] = len(verts)
                verts.append(m)
            return cache[key]

        new_faces = []
        for a, b, c in faces:
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            new_faces += [[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]]
        faces = np.asarray(new_faces)
        verts = np.asarray(verts)

    return (radius * np.asarray(verts)).astype(np.float32), faces.astype(np.int32)


def uv_sphere(segments: int = 40, rings: int = 21, radius: float = 1.0):
    """Lat-long sphere: 2 * segments * (rings - 1) triangles — face counts
    between icosphere's 20 * 4^k steps (e.g. 40x21 -> 1600 faces, which
    1:4-subdivides to 102,400: just past the reference's >= 100K init
    floor, train_mesh_gaussian.py:60)."""
    verts = [(0.0, radius, 0.0)]
    for r in range(1, rings):
        phi = np.pi * r / rings
        for s in range(segments):
            th = 2 * np.pi * s / segments
            verts.append((radius * np.sin(phi) * np.cos(th),
                          radius * np.cos(phi),
                          radius * np.sin(phi) * np.sin(th)))
    verts.append((0.0, -radius, 0.0))
    last = len(verts) - 1
    faces = []
    for s in range(segments):
        faces.append([0, 1 + (s + 1) % segments, 1 + s])
    for r in range(rings - 2):
        a0 = 1 + r * segments
        b0 = a0 + segments
        for s in range(segments):
            s1 = (s + 1) % segments
            faces.append([a0 + s, a0 + s1, b0 + s])
            faces.append([a0 + s1, b0 + s1, b0 + s])
    b0 = 1 + (rings - 2) * segments
    for s in range(segments):
        faces.append([b0 + s, b0 + (s + 1) % segments, last])
    return (np.asarray(verts, np.float32), np.asarray(faces, np.int32))

"""Small host-side utilities (reference upright_core/src/upright_core/util.py)."""

from __future__ import annotations

import numpy as np


def sort_canonical(A):
    """Sort an nd-array into a canonical order, axis by axis (util.py:6-11)."""
    B = np.copy(A)
    for i in range(len(B.shape)):
        B.sort(axis=-i - 1)
    return B


def allclose_unordered(A, B, tol=1e-8):
    """True if the rows of A and B match one-to-one in any order
    (util.py:14-34)."""
    A, B = np.asarray(A), np.asarray(B)
    assert A.shape == B.shape
    used = np.zeros(A.shape[0], dtype=bool)
    for a in A:
        residuals = np.linalg.norm(B - a, axis=1)
        candidates = np.nonzero((residuals < tol) & ~used)[0]
        if candidates.size == 0:
            return False
        used[candidates[0]] = True
    return True


def support_area_distance(com_height, support_vertices, normal, C_we):
    """Distance of the gravity-projected CoM outside the support area at EE
    orientation C_we (util.py:37-58).

    ``support_vertices`` are the 2-D support-polygon vertices in the tangent
    basis, CCW; negative return means the CoM projects inside.
    """
    from upright_tpu.core.polyhedron import orth2d, plane_span

    normal = np.asarray(normal, dtype=float)
    r_com_e = com_height * normal
    r_com_w = C_we @ r_com_e

    # intersection point of the vertical line through the CoM with the support
    # plane, in the EE frame
    A = np.empty((3, 3))
    A[:2] = C_we[:2]
    A[2] = normal
    b = np.zeros(3)
    b[:2] = r_com_w[:2]
    c = np.linalg.solve(A, b)

    span = plane_span(normal)
    p = span @ c

    # signed distance of p to the CCW support polygon boundary
    n = support_vertices.shape[0]
    dists = []
    for i in range(n):
        v1 = support_vertices[i]
        edge = support_vertices[(i + 1) % n] - v1
        inward = orth2d(edge / np.linalg.norm(edge))
        dists.append(-inward @ (p - v1))
    return float(np.max(dists))

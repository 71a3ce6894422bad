"""Tests for the host-side convex-polyhedron geometry.

Mirrors the reference coverage (upright_core/tests/test_polyhedron.py):
factories, transforms, axis queries, plane slicing, clipping, contact patches.
"""

import numpy as np

from upright_tpu.core import polyhedron as poly
from upright_tpu.core.util import allclose_unordered, sort_canonical


def test_box_factory():
    box = poly.ConvexPolyhedron.box([0.5, 1.0, 1.5])
    assert box.nv == 8
    assert box.nf == 6
    assert np.allclose(box.limits_along_axis([1, 0, 0]), [-0.5, 0.5])
    assert np.allclose(box.limits_along_axis([0, 1, 0]), [-1.0, 1.0])
    assert np.allclose(box.limits_along_axis([0, 0, 1]), [-1.5, 1.5])
    assert np.isclose(box.height(), 3.0)
    assert np.isclose(box.length_along_axis([1, 1, 1]), 2 * (0.5 + 1.0 + 1.5) / np.sqrt(3))


def test_box_transform():
    box = poly.ConvexPolyhedron.box([1, 1, 1])
    t = np.array([1.0, 2.0, 3.0])
    moved = box.transform(translation=t)
    assert np.allclose(moved.position, t)
    assert allclose_unordered(moved.vertices, box.vertices + t)

    # rotate 45 deg about z: x-extent becomes sqrt(2)
    from upright_tpu.core.math import rotz

    R = np.asarray(rotz(np.pi / 4))
    rot = box.transform(rotation=R)
    assert np.isclose(rot.length_along_axis([1, 0, 0]), 2 * np.sqrt(2))
    assert np.isclose(rot.height(), 2.0)


def test_wedge_factory():
    w = poly.ConvexPolyhedron.wedge([1.0, 1.0, 0.5])
    assert w.nv == 6
    # slope normal has positive x and z components, zero y
    n = w.normals[-1]
    assert n[0] > 0 and n[2] > 0 and np.isclose(n[1], 0)
    assert np.isclose(np.linalg.norm(n), 1.0)
    # slope normal orthogonal to the hypotenuse edge
    edge = np.array([2.0, 0, -1.0])
    assert np.isclose(n @ edge, 0)


def test_distance_from_centroid_to_boundary():
    box = poly.ConvexPolyhedron.box([0.5, 1.0, 1.5], position=[1, 1, 1])
    assert np.isclose(box.distance_from_centroid_to_boundary([0, 0, -1]), 1.5)
    assert np.isclose(box.distance_from_centroid_to_boundary([1, 0, 0]), 0.5)
    d = box.distance_from_centroid_to_boundary([0, 0, 1], offset=[0, 0, 1.0])
    assert np.isclose(d, 0.5)
    # diagonal direction hits a face plane, not the corner
    d = box.distance_from_centroid_to_boundary([1, 1, 1])
    assert np.isclose(d, 0.5 * np.sqrt(3))


def test_max_vertex_along_axis():
    box = poly.ConvexPolyhedron.box([1, 2, 3])
    v = box.max_vertex_along_axis([1, 1, 1])
    assert np.allclose(v, [1, 2, 3])


def test_get_polygon_in_plane():
    box = poly.ConvexPolyhedron.box([0.5, 0.75, 1.0])
    point = np.array([0, 0, 1.0])
    normal = np.array([0, 0, 1.0])
    span = poly.plane_span(normal)
    V = box.get_polygon_in_plane(point, normal, span)
    assert V.shape == (4, 2)
    # polygon has the box's x-y extents (in the span basis, up to rotation)
    lengths = np.linalg.norm(V[:, None, :] - V[None, :, :], axis=-1)
    assert np.isclose(lengths.max(), np.sqrt(1.0**2 + 1.5**2))


def test_clip_polygon_with_half_space():
    square = np.array([[1.0, 1], [-1, 1], [-1, -1], [1, -1]])
    square = poly.wind_polygon_vertices(square)[0]
    # clip by half space x <= 0.5 (normal -x through (0.5, 0))
    out = poly.clip_polygon_with_half_space(square, np.array([0.5, 0.0]), np.array([-1.0, 0.0]))
    assert out is not None
    assert np.isclose(out[:, 0].max(), 0.5)
    assert np.isclose(out[:, 0].min(), -1.0)
    assert out.shape[0] == 4

    # clip everything away
    out = poly.clip_polygon_with_half_space(square, np.array([2.0, 0.0]), np.array([1.0, 0.0]))
    assert out is None


def test_clip_polygon_with_polygon():
    sq1 = poly.wind_polygon_vertices(np.array([[1.0, 1], [-1, 1], [-1, -1], [1, -1]]))[0]
    sq2 = poly.wind_polygon_vertices(np.array([[2.0, 2], [0, 2], [0, 0], [2, 0]]))[0]
    out = poly.clip_polygon_with_polygon(sq1, sq2)
    expected = np.array([[0.0, 0], [1, 0], [1, 1], [0, 1]])
    assert allclose_unordered(out, expected)

    # disjoint squares
    sq3 = sq2 + 5.0
    assert poly.clip_polygon_with_polygon(sq1, sq3) is None


def test_axis_aligned_contact_stacked_boxes():
    tray = poly.ConvexPolyhedron.box([0.25, 0.25, 0.01], position=[0, 0, -0.01])
    obj = poly.ConvexPolyhedron.box([0.05, 0.05, 0.1], position=[0.1, 0.0, 0.1])
    V, n = poly.axis_aligned_contact(tray, obj)
    assert V is not None
    # normal points into the first shape (tray below -> -z)
    assert np.allclose(n, [0, 0, -1])
    # contact patch is the small box's footprint at z=0
    expected = np.array(
        [[0.15, 0.05, 0], [0.15, -0.05, 0], [0.05, 0.05, 0], [0.05, -0.05, 0]]
    )
    assert allclose_unordered(sort_canonical(V), sort_canonical(expected))


def test_axis_aligned_contact_order_swap():
    tray = poly.ConvexPolyhedron.box([0.25, 0.25, 0.01], position=[0, 0, -0.01])
    obj = poly.ConvexPolyhedron.box([0.05, 0.05, 0.1], position=[0.0, 0.0, 0.1])
    V1, n1 = poly.axis_aligned_contact(tray, obj)
    V2, n2 = poly.axis_aligned_contact(obj, tray)
    assert np.allclose(n1, -np.asarray(n2))
    assert allclose_unordered(sort_canonical(V1), sort_canonical(V2))


def test_axis_aligned_contact_separated():
    a = poly.ConvexPolyhedron.box([1, 1, 1])
    b = poly.ConvexPolyhedron.box([1, 1, 1], position=[0, 0, 5.0])
    V, n = poly.axis_aligned_contact(a, b)
    assert V is None and n is None


def test_axis_aligned_contact_partial_overlap():
    a = poly.ConvexPolyhedron.box([1, 1, 1])
    b = poly.ConvexPolyhedron.box([1, 1, 1], position=[1.0, 1.0, 2.0])
    V, n = poly.axis_aligned_contact(a, b)
    assert V is not None
    assert np.allclose(np.abs(n), [0, 0, 1])
    expected = np.array([[0, 0, 1.0], [1, 0, 1], [0, 1, 1], [1, 1, 1]])
    assert allclose_unordered(sort_canonical(V), sort_canonical(expected))


def test_wedge_slope_contact():
    """A block resting on a wedge's slope: contact normal is the slope normal."""
    from upright_tpu.core.math import roty

    w = poly.ConvexPolyhedron.wedge([1.0, 1.0, 0.5])
    # slope angle
    angle = np.arctan2(1.0, 2.0)
    n_slope = w.normals[-1]
    # box rotated to sit flush on the slope, touching at the slope plane
    R = np.asarray(roty(angle))
    # place box center along slope normal from a point on the slope face
    mid_slope = 0.5 * (np.array([1.0, 0, -0.5]) + np.array([-1.0, 0, 0.5]))
    h = 0.25
    box = poly.ConvexPolyhedron.box([0.3, 0.3, h]).transform(
        translation=mid_slope + h * n_slope, rotation=R
    )
    V, n = poly.axis_aligned_contact(w, box)
    assert V is not None
    assert np.allclose(n, -n_slope)  # points into the wedge
    assert V.shape[0] == 4


def test_plane_span_properties():
    rng = np.random.default_rng(0)
    for _ in range(5):
        n = rng.standard_normal(3)
        n /= np.linalg.norm(n)
        S = poly.plane_span(n)
        assert np.allclose(S @ n, 0, atol=1e-12)
        assert np.allclose(S @ S.T, np.eye(2), atol=1e-12)

"""Random crop-window sampling inside a warped image quadrilateral.

Reference: sunflower/utils/geometry.py (shrink_quadrilateral / sample_point /
sample_rectangle) used by the homography augmentation to pick a crop window
fully covered by valid (warped) pixels. The reference leans on shapely's
buffer(-d); here the inset is computed directly (each edge moved inward along
its normal) and points are sampled by rejection — same contract, no shapely.
"""

from __future__ import annotations

import numpy as np

__all__ = ["shrink_quadrilateral", "point_in_quad", "sample_point_in_quad",
           "sample_rectangle"]


def _edge_normals_inward(quad: np.ndarray) -> np.ndarray:
    """Inward unit normals of each edge of a convex CCW/CW quad (4, 2)."""
    c = quad.mean(0)
    normals = []
    for i in range(4):
        a, b = quad[i], quad[(i + 1) % 4]
        e = b - a
        n = np.array([-e[1], e[0]])
        n = n / max(np.linalg.norm(n), 1e-9)
        if np.dot(c - a, n) < 0:
            n = -n
        normals.append(n)
    return np.array(normals)


def shrink_quadrilateral(quad: np.ndarray, d: float) -> np.ndarray:
    """Inset a convex quad by distance d (reference geometry.py:5-34:
    shapely buffer(-d) with mitre joins == intersecting the inward-offset
    edge lines for a convex polygon)."""
    quad = np.asarray(quad, float)
    normals = _edge_normals_inward(quad)
    # Offset edge lines: point a_i + d*n_i with direction e_i.
    pts = []
    for i in range(4):
        a1 = quad[i] + d * normals[i]
        e1 = quad[(i + 1) % 4] - quad[i]
        j = (i - 1) % 4
        a2 = quad[j] + d * normals[j]
        e2 = quad[(j + 1) % 4] - quad[j]
        # Intersect line(a1, e1) with line(a2, e2).
        A = np.array([e1, -e2]).T
        if abs(np.linalg.det(A)) < 1e-9:
            pts.append(quad[i] + d * normals[i])
            continue
        t = np.linalg.solve(A, a2 - a1)
        pts.append(a1 + t[0] * e1)
    return np.array(pts)


def point_in_quad(p: np.ndarray, quad: np.ndarray) -> bool:
    """Convex-quad containment via consistent cross-product signs."""
    sign = 0
    for i in range(4):
        a, b = quad[i], quad[(i + 1) % 4]
        cr = (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0])
        s = 1 if cr > 0 else (-1 if cr < 0 else 0)
        if s == 0:
            continue
        if sign == 0:
            sign = s
        elif s != sign:
            return False
    return True


def sample_point_in_quad(quad: np.ndarray, rng: np.random.Generator,
                         max_tries: int = 256) -> np.ndarray | None:
    """Uniform rejection sampling inside a quad (geometry.py:37-55)."""
    lo = quad.min(0)
    hi = quad.max(0)
    for _ in range(max_tries):
        p = rng.uniform(lo, hi)
        if point_in_quad(p, quad):
            return p
    return None


def sample_rectangle(quad: np.ndarray, rect_w: float, rect_h: float,
                     rng: np.random.Generator) -> np.ndarray | None:
    """Sample an axis-aligned (rect_w, rect_h) window fully inside the quad
    (geometry.py:58-77): inset the quad by half the rect diagonal-safe margin,
    sample the center, return [xmin, ymin, xmax, ymax]. None if impossible."""
    quad = np.asarray(quad, float)
    margin = 0.5 * float(np.hypot(rect_w, rect_h))
    inner = shrink_quadrilateral(quad, margin)

    def signed_area(q):
        x, y = q[:, 0], q[:, 1]
        return 0.5 * float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))

    # An inset larger than the quad inverts it (orientation flips) — no
    # rectangle fits (shapely's buffer(-d) returns an empty polygon there).
    if signed_area(inner) * signed_area(quad) <= 0:
        return None
    if not all(point_in_quad(v, quad) for v in inner):
        return None
    c = sample_point_in_quad(inner, rng)
    if c is None:
        return None
    return np.array([c[0] - rect_w / 2, c[1] - rect_h / 2,
                     c[0] + rect_w / 2, c[1] + rect_h / 2])

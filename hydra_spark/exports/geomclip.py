"""Geometry kernels for the tiling sink: rectangle clipping and
simplification — the computational-geometry half of what tippecanoe
does per tile (reference shells out to tippecanoe,
data_formats/geojson/to_pmtiles.py:16-47; we re-implement the subset
needed for Point/LineString/Polygon tiles).

Pure-python/numpy-free on purpose: these run inside the per-tile
applyInPandas over ring/line vertex lists that are already small after
per-zoom simplification.
"""

from __future__ import annotations

Pt = tuple[float, float]


def signed_area(ring: list[Pt]) -> float:
    """Surveyor's formula (positive = counter-clockwise in math axes;
    in MVT's y-down tile space positive means clockwise on screen,
    which is the spec's exterior-ring orientation)."""
    s = 0.0
    n = len(ring)
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        s += x1 * y2 - x2 * y1
    return s / 2.0


def clip_ring(ring: list[Pt], lo: float, hi: float) -> list[Pt]:
    """Sutherland–Hodgman clip of a closed ring against the square
    [lo, hi]². Returns the clipped ring (possibly empty). The clip
    region is convex, so one ring in → one ring out."""
    def clip_edge(pts: list[Pt], inside, intersect) -> list[Pt]:
        out: list[Pt] = []
        n = len(pts)
        for i in range(n):
            cur, nxt = pts[i], pts[(i + 1) % n]
            cin, nin = inside(cur), inside(nxt)
            if cin:
                out.append(cur)
                if not nin:
                    out.append(intersect(cur, nxt))
            elif nin:
                out.append(intersect(cur, nxt))
        return out

    def x_at(p: Pt, q: Pt, x: float) -> Pt:
        t = (x - p[0]) / (q[0] - p[0])
        return (x, p[1] + t * (q[1] - p[1]))

    def y_at(p: Pt, q: Pt, y: float) -> Pt:
        t = (y - p[1]) / (q[1] - p[1])
        return (p[0] + t * (q[0] - p[0]), y)

    pts = ring
    for inside, intersect in (
        (lambda p: p[0] >= lo, lambda p, q: x_at(p, q, lo)),
        (lambda p: p[0] <= hi, lambda p, q: x_at(p, q, hi)),
        (lambda p: p[1] >= lo, lambda p, q: y_at(p, q, lo)),
        (lambda p: p[1] <= hi, lambda p, q: y_at(p, q, hi)),
    ):
        if not pts:
            return []
        pts = clip_edge(pts, inside, intersect)
    return pts


def clip_line(pts: list[Pt], lo: float, hi: float) -> list[list[Pt]]:
    """Clip a polyline to [lo, hi]², splitting into parts where it
    leaves the square (Liang–Barsky per segment)."""
    parts: list[list[Pt]] = []
    cur: list[Pt] = []
    for i in range(len(pts) - 1):
        seg = _clip_segment(pts[i], pts[i + 1], lo, hi)
        if seg is None:
            if cur:
                parts.append(cur)
                cur = []
            continue
        a, b = seg
        if not cur:
            cur = [a, b]
        elif cur[-1] == a:
            cur.append(b)
        else:
            parts.append(cur)
            cur = [a, b]
    if cur:
        parts.append(cur)
    return [p for p in parts if len(p) >= 2]


def _clip_segment(p: Pt, q: Pt, lo: float, hi: float) -> tuple[Pt, Pt] | None:
    """Liang–Barsky: the portion of segment pq inside [lo, hi]²."""
    x0, y0 = p
    dx, dy = q[0] - x0, q[1] - y0
    t0, t1 = 0.0, 1.0
    for num, den in (
        (lo - x0, dx), (x0 - hi, -dx),
        (lo - y0, dy), (y0 - hi, -dy),
    ):
        if den == 0:
            if num > 0:
                return None
            continue
        t = num / den
        if den > 0:
            if t > t1:
                return None
            t0 = max(t0, t)
        else:
            if t < t0:
                return None
            t1 = min(t1, t)
    if t0 > t1:
        return None
    return (
        (x0 + t0 * dx, y0 + t0 * dy),
        (x0 + t1 * dx, y0 + t1 * dy),
    )


def simplify(pts: list[Pt], tolerance: float) -> list[Pt]:
    """Douglas–Peucker (iterative), keeping endpoints. tolerance in the
    same units as the points (tile pixels here)."""
    if len(pts) <= 2 or tolerance <= 0:
        return list(pts)
    keep = [False] * len(pts)
    keep[0] = keep[-1] = True
    stack = [(0, len(pts) - 1)]
    t2 = tolerance * tolerance
    while stack:
        a, b = stack.pop()
        ax, ay = pts[a]
        bx, by = pts[b]
        vx, vy = bx - ax, by - ay
        vlen2 = vx * vx + vy * vy
        best, best_d2 = -1, t2
        for i in range(a + 1, b):
            px, py = pts[i][0] - ax, pts[i][1] - ay
            if vlen2 == 0:
                d2 = px * px + py * py
            else:
                t = max(0.0, min(1.0, (px * vx + py * vy) / vlen2))
                ex, ey = px - t * vx, py - t * vy
                d2 = ex * ex + ey * ey
            if d2 > best_d2:
                best, best_d2 = i, d2
        if best >= 0:
            keep[best] = True
            stack += [(a, best), (best, b)]
    return [p for p, k in zip(pts, keep) if k]

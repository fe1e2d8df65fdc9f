"""Rupture plot sink (S10, reference plotting/rupture.py:18-49).

The reference collects rupture fault polygons and renders a PyGMT map.
Plotting is inherently a driver-side sink: the data-plane part — computing
the map region and the per-plane polygon rings from collected geometry —
is pure NumPy and fully tested. Rendering picks the best available
backend: matplotlib when installed (API-compatible with the reference's
fig.plot loop), else a self-contained NumPy rasterizer + stdlib-zlib PNG
encoder — so the sink always produces a real image file, even in this
container where neither pygmt nor matplotlib is installed.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

try:  # pragma: no cover - backend not present in this environment
    import matplotlib.pyplot as _plt

    _HAVE_BACKEND = True
except ImportError:
    _plt = None
    _HAVE_BACKEND = False


def plot_region(faults) -> tuple[float, float, float, float]:
    """Map region (lon_min, lon_max, lat_min, lat_max) with the reference's
    padding (0.5° lon, 0.25° lat — plotting/rupture.py:31-37)."""
    corners = np.vstack([fault.corners for fault in faults])
    return (
        float(corners[:, 1].min() - 0.5),
        float(corners[:, 1].max() + 0.5),
        float(corners[:, 0].min() - 0.25),
        float(corners[:, 0].max() + 0.25),
    )


def plane_rings(faults) -> list[tuple[list[float], list[float]]]:
    """Closed (x=lon, y=lat) polygon rings, one per plane (the reference's
    fig.plot loop, plotting/rupture.py:39-47)."""
    rings = []
    for fault in faults:
        for plane in fault.planes:
            c = plane.corners
            rings.append(
                (
                    c[:, 1].tolist() + [float(c[0, 1])],
                    c[:, 0].tolist() + [float(c[0, 0])],
                )
            )
    return rings


def _polygon_mask(
    xs: np.ndarray, ys: np.ndarray, width: int, height: int
) -> np.ndarray:
    """Even-odd (ray-casting) fill of one polygon over a raster grid,
    fully vectorized: for every pixel center, count edges whose span
    crosses the pixel row with the intersection right of the pixel."""
    px = np.arange(width)[None, :] + 0.5
    py = np.arange(height)[:, None] + 0.5
    inside = np.zeros((height, width), dtype=bool)
    n = len(xs)
    for i in range(n):
        x0, y0 = xs[i], ys[i]
        x1, y1 = xs[(i + 1) % n], ys[(i + 1) % n]
        if y0 == y1:
            continue
        crosses = ((y0 <= py) & (py < y1)) | ((y1 <= py) & (py < y0))
        t = (py - y0) / (y1 - y0)
        x_at = x0 + t * (x1 - x0)
        inside ^= crosses & (px < x_at)
    return inside


def _write_png(rgb: np.ndarray, path: str, title: str) -> None:
    """Minimal PNG encoder (stdlib zlib/struct): 8-bit RGB + a tEXt chunk
    carrying the title (no font rendering in the numpy backend)."""
    h, w, _ = rgb.shape

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    raw = b"".join(b"\x00" + rgb[r].tobytes() for r in range(h))
    out = b"\x89PNG\r\n\x1a\n"
    out += chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
    out += chunk(b"tEXt", b"Title\x00" + title.encode("latin-1", "replace"))
    out += chunk(b"IDAT", zlib.compress(raw, 6))
    out += chunk(b"IEND", b"")
    with open(path, "wb") as f:
        f.write(out)


def _render_numpy_png(
    title: str, faults, output_filepath, width: int = 480, height: int = 360
) -> None:
    """Backend-free rendering: rasterize the plane rings into an RGB
    array (red fill, black 1-px edge via mask erosion) and PNG-encode it."""
    lon_min, lon_max, lat_min, lat_max = plot_region(faults)
    rgb = np.full((height, width, 3), 255, dtype=np.uint8)

    def to_px(lons, lats):
        xs = (np.asarray(lons) - lon_min) / (lon_max - lon_min) * (width - 1)
        # image rows grow downward; latitude grows upward
        ys = (lat_max - np.asarray(lats)) / (lat_max - lat_min) * (height - 1)
        return xs, ys

    for ring_x, ring_y in plane_rings(faults):
        xs, ys = to_px(ring_x[:-1], ring_y[:-1])  # drop the closing point
        mask = _polygon_mask(xs, ys, width, height)
        interior = mask.copy()
        interior[1:, :] &= mask[:-1, :]
        interior[:-1, :] &= mask[1:, :]
        interior[:, 1:] &= mask[:, :-1]
        interior[:, :-1] &= mask[:, 1:]
        edge = mask & ~interior
        rgb[interior] = (220, 60, 50)
        rgb[edge] = (0, 0, 0)

    _write_png(rgb, str(output_filepath), title)


def plot_rupture(title: str, faults, output_filepath) -> None:
    """Render the rupture's fault polygons to an image file.

    Driver-side sink over collected geometry (the Spark side ends at
    ``NSHMDB.get_rupture_faults``). Uses matplotlib when available
    (mirroring the reference's pygmt fig.plot loop,
    plotting/rupture.py:39-47), else the built-in NumPy/PNG backend."""
    if not _HAVE_BACKEND:
        _render_numpy_png(title, faults, output_filepath)
        return
    region = plot_region(faults)
    fig, ax = _plt.subplots()
    ax.set_title(title)
    ax.set_xlim(region[0], region[1])
    ax.set_ylim(region[2], region[3])
    for xs, ys in plane_rings(faults):
        ax.fill(xs, ys, facecolor="red", edgecolor="black", linewidth=1.0)
    fig.savefig(output_filepath)

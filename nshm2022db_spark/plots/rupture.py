"""Rupture plot sink (S10, reference plotting/rupture.py:18-49).

The reference collects rupture fault polygons and renders a PyGMT map.
Plotting is inherently a driver-side sink: the data-plane part — computing
the map region and the per-plane polygon rings from collected geometry —
is pure NumPy here and fully tested; the actual rendering needs a plotting
backend (pygmt/matplotlib) that is not in this container, so ``plot_rupture``
is STUBBED behind an import-try and raises ``NotImplementedError`` with
the missing dependency named, per the multimodal-stub convention.
"""

from __future__ import annotations

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


def plot_rupture(title: str, faults, output_filepath) -> None:
    """Render the rupture's fault polygons to an image file.

    Driver-side sink over collected geometry (the Spark side ends at
    ``NSHMDB.get_rupture_faults``). Requires a plotting backend."""
    if not _HAVE_BACKEND:
        raise NotImplementedError(
            "plot_rupture needs matplotlib (or pygmt, as the reference uses); "
            "neither is installed in this environment. The data-plane parts "
            "(plot_region, plane_rings) are pure and available."
        )
    region = plot_region(faults)
    fig, ax = _plt.subplots()
    ax.set_title(title)
    ax.set_xlim(region[0], region[1])
    ax.set_ylim(region[2], region[3])
    for xs, ys in plane_rings(faults):
        ax.fill(xs, ys, facecolor="red", edgecolor="black", linewidth=1.0)
    fig.savefig(output_filepath)

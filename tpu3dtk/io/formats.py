"""Table-driven scan format registry.

Replaces the reference's dlopen plugin zoo (one shared library per format,
``src/scanio/scan_io.cc:45-95``) with declarative column specs, the same
way each plugin declares ``IODataType spec[]`` + a coordinate transform
(e.g. ``src/scanio/scan_io_uos.cc:27``, ``scan_io_uosr.cc:20``,
``helper.cc:63-72`` for the xyz->uos transform).

A format is: filename pattern (prefix/suffix for data and pose files),
column layout, and a linear coordinate transform into the internal "uos"
frame (left-handed, cm).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import numpy as np

# Column tags (subset of the reference's IODataType, io_types.h)
XYZ = "xyz"  # 3 columns
REFLECTANCE = "reflectance"
RGB = "rgb"  # 3 columns, uint8
TEMPERATURE = "temperature"
AMPLITUDE = "amplitude"
TYPE = "type"
DEVIATION = "deviation"
NORMAL = "normal"  # 3 columns
DUMMY = "dummy"  # skipped column

_NCOLS = {XYZ: 3, RGB: 3, NORMAL: 3, DUMMY: 1}


def _t_identity(xyz: np.ndarray) -> np.ndarray:
    return xyz


def _t_xyz(xyz: np.ndarray) -> np.ndarray:
    """Right-handed metres -> uos left-handed cm (ref helper.cc:63-72)."""
    out = np.empty_like(xyz)
    out[:, 0] = -100.0 * xyz[:, 1]
    out[:, 1] = 100.0 * xyz[:, 2]
    out[:, 2] = 100.0 * xyz[:, 0]
    return out


def _t_pts(xyz: np.ndarray) -> np.ndarray:
    """pts: negate z (ref helper.cc:74-80)."""
    out = xyz.copy()
    out[:, 2] = -out[:, 2]
    return out


@dataclasses.dataclass(frozen=True)
class FormatSpec:
    name: str
    columns: tuple[str, ...]  # channel per column group
    transform: Callable[[np.ndarray], np.ndarray] = _t_identity
    data_prefix: str = "scan"
    data_suffix: str = ".3d"
    pose_prefix: str = "scan"
    pose_suffix: str = ".pose"
    skip_header_lines: int = 0
    pose_in_data_file: bool = False  # "old" style formats

    @property
    def ncols(self) -> int:
        return sum(_NCOLS.get(c, 1) for c in self.columns)


FORMATS: dict[str, FormatSpec] = {}


def register(spec: FormatSpec) -> FormatSpec:
    FORMATS[spec.name] = spec
    return spec


# ref scan_io_uos.cc:22-28
register(FormatSpec("uos", (XYZ,)))
# ref scan_io_uosr.cc:20
register(FormatSpec("uosr", (XYZ, REFLECTANCE)))
# ref scan_io_uos_rgb.cc:20-21
register(FormatSpec("uos_rgb", (XYZ, RGB)))
# ref scan_io_uos_rrgbt.cc:22-24 (refl, rgb, temperature)
register(FormatSpec("uos_rrgbt", (XYZ, REFLECTANCE, RGB, TEMPERATURE)))
# ref scan_io_uos_rrgb.cc
register(FormatSpec("uos_rrgb", (XYZ, REFLECTANCE, RGB)))
# ref scan_io_xyz.cc:20-23
register(FormatSpec("xyz", (XYZ,), transform=_t_xyz))
# ref scan_io_xyzr.cc:20-23
register(FormatSpec("xyzr", (XYZ, REFLECTANCE), transform=_t_xyz))
# ref scan_io_xyz_rgb.cc:20-23
register(FormatSpec("xyz_rgb", (XYZ, RGB), transform=_t_xyz))
# ref scan_io_pts.cc
register(FormatSpec("pts", (XYZ,), transform=_t_pts, data_suffix=".pts"))
# ref scan_io_uos_normal.cc
register(FormatSpec("uos_normal", (XYZ, NORMAL)))
# ref scan_io_xyz_normal.cc
register(FormatSpec("xyz_normal", (XYZ, NORMAL), transform=_t_xyz))


def get_format(name: str) -> FormatSpec:
    try:
        return FORMATS[name]
    except KeyError:
        raise ValueError(
            f"unknown scan format {name!r}; known: {sorted(FORMATS)}"
        ) from None


def parse_scan_text(
    raw: np.ndarray, spec: FormatSpec
) -> dict[str, np.ndarray]:
    """Split a loaded [N, ncols] float array into named channels and apply
    the format's coordinate transform.  Returns {"xyz": [N,3], ...}.
    """
    if raw.ndim == 1:
        raw = raw.reshape(1, -1)
    channels: dict[str, np.ndarray] = {}
    col = 0
    for c in spec.columns:
        w = _NCOLS.get(c, 1)
        if c == DUMMY:
            col += w
            continue
        data = raw[:, col : col + w]
        if w == 1:
            data = data[:, 0]
        channels[c] = np.ascontiguousarray(data)
        col += w
    channels[XYZ] = spec.transform(np.asarray(channels[XYZ], dtype=np.float64))
    if RGB in channels:
        channels[RGB] = channels[RGB].astype(np.uint8)
    return channels

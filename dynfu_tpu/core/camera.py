"""Pinhole camera intrinsics with pyramid-level scaling.

Mirrors kfusion::Intr (include/kfusion/types.hpp:17-40, src/kfusion/precomp.cpp:10-13):
level scaling divides focal length and center by 2**level.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Intr:
    fx: float
    fy: float
    cx: float
    cy: float

    def level(self, index: int) -> "Intr":
        div = 1 << index
        return Intr(self.fx / div, self.fy / div, self.cx / div, self.cy / div)

    def project(self, p):
        """Camera-space points (..., 3) -> pixel coords (..., 2) [u, v].

        Matches device::Projector (device.hpp:40-45): u = fx*x/z + cx.
        """
        z = p[..., 2]
        u = self.fx * p[..., 0] / z + self.cx
        v = self.fy * p[..., 1] / z + self.cy
        return jnp.stack([u, v], axis=-1)

    def reproject(self, u, v, z):
        """Pixel coords + depth -> camera-space points (..., 3).

        Matches device::Reprojector (device.hpp:50-54).
        """
        x = z * (u - self.cx) / self.fx
        y = z * (v - self.cy) / self.fy
        return jnp.stack([x, y, z], axis=-1)

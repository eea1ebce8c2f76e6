"""Dataset loading and point-cloud/mesh export (pure Python, no OpenCV/PCL).

Replaces the reference's I/O surface:
* 16-bit depth PNG loading via cv::imread (demo.cpp:85-90) -> PIL/numpy;
* pcl::io::savePCDFileASCII warped-cloud export (demo.cpp:21-31) -> save_pcd;
* pcl::io::saveVTKFile mesh export (demo.cpp:33-37) -> save_vtk;
* plus .ply export (the modern default for downstream tools).

The mesh writers take the engine's triangle soup (3 consecutive vertices per
triangle) and apply the reference's winding (0, 2, 1 — convertToMesh,
kinfu.cpp:250-257).
"""

from __future__ import annotations

import os
from typing import List, Tuple

import numpy as np


def load_depth_png(path: str) -> np.ndarray:
    """16-bit depth PNG in millimeters -> (H, W) int32."""
    from PIL import Image

    img = Image.open(path)
    arr = np.asarray(img)
    if arr.ndim == 3:  # some tools save depth replicated across channels
        arr = arr[..., 0]
    return arr.astype(np.int32)


def load_color_png(path: str) -> np.ndarray:
    """8-bit color PNG -> (H, W, 3) uint8 (the reference's cv::imread of
    the color/ directory, demo.cpp:46-55; the pipeline's math never reads
    it — the frame API carries it for parity)."""
    from PIL import Image

    img = Image.open(path).convert("RGB")
    return np.asarray(img, dtype=np.uint8)


def list_dataset(root: str) -> Tuple[List[str], List[str]]:
    """Sorted depth/ and color/ file lists (DynFuApp::loadFiles,
    demo.cpp:39-55). color/ may be absent (depth-only pipeline)."""
    depth_dir = os.path.join(root, "depth")
    if not os.path.isdir(depth_dir):
        raise FileNotFoundError(
            f"dataset dir {root!r} must contain a depth/ subdirectory"
        )
    depths = sorted(
        os.path.join(depth_dir, f)
        for f in os.listdir(depth_dir)
        if f.lower().endswith((".png", ".pgm"))
    )
    color_dir = os.path.join(root, "color")
    colors = (
        sorted(
            os.path.join(color_dir, f)
            for f in os.listdir(color_dir)
            if f.lower().endswith((".png", ".jpg", ".jpeg"))
        )
        if os.path.isdir(color_dir)
        else []
    )
    return depths, colors


def save_pcd(path: str, points: np.ndarray) -> None:
    """ASCII PCD v0.7 (x y z), matching pcl::io::savePCDFileASCII output."""
    points = np.asarray(points, np.float32)
    n = len(points)
    header = (
        "# .PCD v0.7 - Point Cloud Data file format\n"
        "VERSION 0.7\nFIELDS x y z\nSIZE 4 4 4\nTYPE F F F\nCOUNT 1 1 1\n"
        f"WIDTH {n}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\nPOINTS {n}\nDATA ascii\n"
    )
    with open(path, "w") as f:
        f.write(header)
        np.savetxt(f, points, fmt="%.9g")


def _soup_to_indexed(tri_soup: np.ndarray):
    """Triangle soup (3N, 3) -> (unique vertices, faces) with the reference
    winding 0,2,1 (convertToMesh, kinfu.cpp:250-257)."""
    tri_soup = np.asarray(tri_soup, np.float32)
    n_tris = len(tri_soup) // 3
    soup = tri_soup[: 3 * n_tris]
    q = np.round(soup.astype(np.float64) / 1e-7).astype(np.int64)
    uniq, inv = np.unique(q, axis=0, return_inverse=True)
    verts = uniq.astype(np.float64) * 1e-7
    faces = inv.reshape(-1, 3)[:, [0, 2, 1]]
    return verts.astype(np.float32), faces.astype(np.int64)


def save_vtk(path: str, tri_soup: np.ndarray) -> None:
    """Legacy ASCII VTK PolyData, like pcl::io::saveVTKFile."""
    verts, faces = _soup_to_indexed(tri_soup)
    with open(path, "w") as f:
        f.write("# vtk DataFile Version 3.0\nvtk output\nASCII\nDATASET POLYDATA\n")
        f.write(f"POINTS {len(verts)} float\n")
        np.savetxt(f, verts, fmt="%.9g")
        f.write(f"POLYGONS {len(faces)} {len(faces) * 4}\n")
        np.savetxt(
            f,
            np.concatenate([np.full((len(faces), 1), 3), faces], axis=1),
            fmt="%d",
        )


def save_ply(path: str, tri_soup: np.ndarray) -> None:
    """Binary-less ASCII PLY triangle mesh."""
    verts, faces = _soup_to_indexed(tri_soup)
    with open(path, "w") as f:
        f.write(
            "ply\nformat ascii 1.0\n"
            f"element vertex {len(verts)}\n"
            "property float x\nproperty float y\nproperty float z\n"
            f"element face {len(faces)}\n"
            "property list uchar int vertex_indices\nend_header\n"
        )
        np.savetxt(f, verts, fmt="%.9g")
        np.savetxt(
            f,
            np.concatenate([np.full((len(faces), 1), 3), faces], axis=1),
            fmt="%d",
        )


def save_ply_indexed(path: str, verts: np.ndarray, faces: np.ndarray) -> None:
    """ASCII PLY from an already-indexed (verts, faces) mesh."""
    with open(path, "w") as f:
        f.write(
            "ply\nformat ascii 1.0\n"
            f"element vertex {len(verts)}\n"
            "property float x\nproperty float y\nproperty float z\n"
            f"element face {len(faces)}\n"
            "property list uchar int vertex_indices\nend_header\n"
        )
        np.savetxt(f, np.asarray(verts, np.float32), fmt="%.9g")
        np.savetxt(
            f,
            np.concatenate(
                [np.full((len(faces), 1), 3), np.asarray(faces)], axis=1
            ),
            fmt="%d",
        )


def save_depth_png(path: str, depth_mm: np.ndarray) -> None:
    """16-bit depth PNG writer (for the synthetic dataset generator)."""
    from PIL import Image

    Image.fromarray(np.asarray(depth_mm).astype(np.uint16)).save(path)


def save_image_png(path: str, img: np.ndarray) -> None:
    from PIL import Image

    Image.fromarray(np.asarray(img)).save(path)

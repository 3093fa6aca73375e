"""Mesh loading and robot mesh assembly (host-side numpy).

Replaces the reference's pytorch3d/trimesh mesh plumbing
(lib/utils/mesh_renderer.py:92-136 STL/OBJ preload) and the
roboticstoolbox fkine link posing (mesh_renderer.py:22-71 `PandaArm`)
— link poses come from the framework's own FK chain instead, removing a
whole dependency (SURVEY.md §2.4).

Formats: binary/ascii STL and OBJ parsed with numpy (no trimesh); URDF
box/cylinder/sphere primitives tessellated procedurally so robots without
shipped mesh files (our built-in chains) still render.
"""

from __future__ import annotations

import os
import struct
from typing import List, Sequence, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# file formats
# ---------------------------------------------------------------------------

def load_stl(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Binary or ASCII STL -> (verts (V,3), faces (F,3))."""
    with open(path, "rb") as f:
        head = f.read(5)
    if head == b"solid":
        try:
            return _load_stl_ascii(path)
        except Exception:
            pass  # some binary files start with 'solid'
    return _load_stl_binary(path)


def _load_stl_binary(path):
    with open(path, "rb") as f:
        f.seek(80)
        (n,) = struct.unpack("<I", f.read(4))
        data = np.frombuffer(f.read(n * 50), dtype=np.uint8).reshape(n, 50)
    tris = data[:, 12:48].copy().view("<f4").reshape(n, 3, 3)
    return _dedup(tris)


def _load_stl_ascii(path):
    verts = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if parts and parts[0] == "vertex":
                verts.append([float(v) for v in parts[1:4]])
    tris = np.asarray(verts, np.float32).reshape(-1, 3, 3)
    return _dedup(tris)


def _dedup(tris):
    """Triangle soup -> indexed mesh."""
    flat = tris.reshape(-1, 3)
    uniq, inv = np.unique(flat.round(7), axis=0, return_inverse=True)
    return uniq.astype(np.float32), inv.reshape(-1, 3).astype(np.int32)


def load_obj(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Minimal OBJ: v/f records, polygon fan triangulation."""
    verts, faces = [], []
    with open(path) as f:
        for line in f:
            p = line.split()
            if not p:
                continue
            if p[0] == "v":
                verts.append([float(v) for v in p[1:4]])
            elif p[0] == "f":
                idx = [int(tok.split("/")[0]) - 1 for tok in p[1:]]
                for k in range(1, len(idx) - 1):
                    faces.append([idx[0], idx[k], idx[k + 1]])
    return np.asarray(verts, np.float32), np.asarray(faces, np.int32)


def load_mesh(path: str):
    ext = os.path.splitext(path)[1].lower()
    if ext == ".stl":
        return load_stl(path)
    if ext == ".obj":
        return load_obj(path)
    raise ValueError(f"unsupported mesh format: {path}")


# ---------------------------------------------------------------------------
# procedural primitives (URDF geometry fallbacks)
# ---------------------------------------------------------------------------

def box_mesh(size) -> Tuple[np.ndarray, np.ndarray]:
    sx, sy, sz = np.asarray(size, np.float32) / 2
    v = np.array(
        [[x, y, z] for x in (-sx, sx) for y in (-sy, sy) for z in (-sz, sz)],
        np.float32,
    )
    f = np.array(
        [
            [0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
            [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
            [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3],
        ],
        np.int32,
    )
    return v, f


def cylinder_mesh(radius: float, length: float, n: int = 16):
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
    circ = np.stack([radius * np.cos(ang), radius * np.sin(ang)], axis=-1)
    top = np.concatenate([circ, np.full((n, 1), length / 2)], axis=-1)
    bot = np.concatenate([circ, np.full((n, 1), -length / 2)], axis=-1)
    v = np.concatenate([top, bot, [[0, 0, length / 2]], [[0, 0, -length / 2]]]).astype(
        np.float32
    )
    f = []
    ct, cb = 2 * n, 2 * n + 1
    for i in range(n):
        j = (i + 1) % n
        f += [[i, j, n + i], [j, n + j, n + i], [ct, j, i], [cb, n + i, n + j]]
    return v, np.asarray(f, np.int32)


def sphere_mesh(radius: float, n: int = 12):
    us = np.linspace(0, np.pi, n)
    vs = np.linspace(0, 2 * np.pi, n, endpoint=False)
    verts = []
    for u in us:
        for v in vs:
            verts.append(
                [
                    radius * np.sin(u) * np.cos(v),
                    radius * np.sin(u) * np.sin(v),
                    radius * np.cos(u),
                ]
            )
    verts = np.asarray(verts, np.float32)
    faces = []
    for i in range(n - 1):
        for j in range(n):
            a = i * n + j
            b = i * n + (j + 1) % n
            c = (i + 1) * n + j
            d = (i + 1) * n + (j + 1) % n
            faces += [[a, b, c], [b, d, c]]
    return verts, np.asarray(faces, np.int32)


def capsule_link_mesh(length: float, radius: float = 0.03):
    """Default link geometry when no mesh/primitive is declared: a
    cylinder along +z spanning [0, length]."""
    v, f = cylinder_mesh(radius, max(length, 2 * radius))
    v = v + np.array([0, 0, max(length, 2 * radius) / 2], np.float32)
    return v, f


# ---------------------------------------------------------------------------
# robot mesh assembly
# ---------------------------------------------------------------------------

class RobotMesh:
    """Static per-link meshes + device-side posed assembly.

    The analogue of RobotMeshRenderer.get_robot_mesh
    (mesh_renderer.py:181-225), but link poses come from our FK chain and
    the posing is batched jnp (differentiable w.r.t. joint angles).
    """

    def __init__(self, chain, link_meshes: dict[str, tuple]):
        """link_meshes: link name -> (verts (V,3) np, faces (F,3) np)."""
        import jax.numpy as jnp

        self.chain = chain
        names, offsets, counts = [], [], []
        all_v, all_f = [], []
        base = 0
        self.pose_index = []
        for link, (v, f) in link_meshes.items():
            if link not in chain._link_index:
                continue
            self.pose_index.append(chain._link_index[link])
            all_v.append(np.asarray(v, np.float32))
            all_f.append(np.asarray(f, np.int32) + base)
            counts.append(len(v))
            base += len(v)
        self.verts0 = jnp.asarray(np.concatenate(all_v))  # (V, 3)
        self.faces = jnp.asarray(np.concatenate(all_f))  # (F, 3)
        self.vert_link = jnp.asarray(
            np.repeat(np.arange(len(counts)), counts).astype(np.int32)
        )
        self.pose_index = np.asarray(self.pose_index, np.int32)

    def posed_verts(self, q, base2cam=None):
        """FK-pose the assembly: q (B, dof) -> verts (B, V, 3).

        base2cam: optional (B, 4, 4) base->camera transform applied on top.
        """
        import jax.numpy as jnp

        poses = self.chain.link_poses(q)[:, self.pose_index]  # (B, L, 4, 4)
        if base2cam is not None:
            poses = base2cam[:, None] @ poses
        R = poses[..., :3, :3][:, self.vert_link]  # (B, V, 3, 3)
        t = poses[..., :3, 3][:, self.vert_link]  # (B, V, 3)
        return jnp.einsum("bvij,vj->bvi", R, self.verts0) + t


def default_link_meshes(chain) -> dict:
    """Procedural capsule meshes sized by each link's child-joint offsets —
    a usable silhouette when the robot ships no mesh files."""
    meshes = {}
    # length of each link = distance to its farthest child joint origin
    child_off = {name: 0.05 for name in chain.link_names}
    for j in chain.joints:
        d = float(np.linalg.norm(j.origin[:3, 3]))
        child_off[j.parent_link] = max(child_off.get(j.parent_link, 0.0), d)
    for name in chain.link_names:
        meshes[name] = capsule_link_mesh(child_off.get(name, 0.05))
    return meshes

"""Host-side URDF XML parsing into static chain specs.

Replaces the reference's 4k-line urdfpytorch object model
(lib/utils/urdfpytorch/urdf.py) with a minimal stdlib-xml parser that
extracts exactly what the framework needs: the joint tree (origins, axes,
types, mimics, limits) for FK, and visual/collision mesh references for the
renderer. No torch, no trimesh/networkx/lxml dependencies.
"""

from __future__ import annotations

import dataclasses
import os
import xml.etree.ElementTree as ET

import numpy as np

from .chain import FIXED, PRISMATIC, REVOLUTE, JointSpec, KinematicChain

_TYPE_MAP = {
    "fixed": FIXED,
    "revolute": REVOLUTE,
    "continuous": REVOLUTE,
    "prismatic": PRISMATIC,
    # planar/floating are not used by any supported robot; treat as fixed.
    "planar": FIXED,
    "floating": FIXED,
}


def rpy_to_matrix(r: float, p: float, y: float) -> np.ndarray:
    """URDF fixed-axis XYZ convention: R = Rz(y) @ Ry(p) @ Rx(r)."""
    cr, sr = np.cos(r), np.sin(r)
    cp, sp = np.cos(p), np.sin(p)
    cy, sy = np.cos(y), np.sin(y)
    Rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
    Ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
    Rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
    return Rz @ Ry @ Rx


def origin_to_T(elem) -> np.ndarray:
    """<origin xyz rpy> element -> 4x4 (identity when absent)."""
    T = np.eye(4)
    if elem is None:
        return T
    xyz = [float(v) for v in elem.get("xyz", "0 0 0").split()]
    rpy = [float(v) for v in elem.get("rpy", "0 0 0").split()]
    T[:3, :3] = rpy_to_matrix(*rpy)
    T[:3, 3] = xyz
    return T


def make_origin(
    xyz=(0.0, 0.0, 0.0), rpy=(0.0, 0.0, 0.0)
) -> np.ndarray:
    T = np.eye(4)
    T[:3, :3] = rpy_to_matrix(*rpy)
    T[:3, 3] = xyz
    return T


@dataclasses.dataclass
class VisualSpec:
    """Mesh/primitive attached to a link (for rendering)."""

    link: str
    kind: str  # 'mesh' | 'box' | 'cylinder' | 'sphere'
    origin: np.ndarray  # (4, 4) link->geometry
    mesh_path: str | None = None
    scale: np.ndarray | None = None  # (3,)
    size: np.ndarray | None = None  # box size / (radius, length) / (radius,)


@dataclasses.dataclass
class ParsedURDF:
    name: str
    joints: list
    root_link: str
    links: list
    visuals: list
    joint_limits: dict  # joint name -> (lower, upper)


def parse_urdf(path: str) -> ParsedURDF:
    tree = ET.parse(path)
    robot = tree.getroot()
    assert robot.tag == "robot", f"not a URDF file: {path}"
    base_dir = os.path.dirname(os.path.abspath(path))

    links = [l.get("name") for l in robot.findall("link")]
    visuals: list[VisualSpec] = []
    for l in robot.findall("link"):
        for vis in l.findall("visual") + l.findall("collision"):
            geom = vis.find("geometry")
            if geom is None:
                continue
            origin = origin_to_T(vis.find("origin"))
            mesh = geom.find("mesh")
            if mesh is not None:
                fn = mesh.get("filename", "")
                fn = fn.replace("package://", "")
                if not os.path.isabs(fn):
                    fn = os.path.join(base_dir, fn)
                scale = np.array(
                    [float(v) for v in mesh.get("scale", "1 1 1").split()]
                )
                visuals.append(
                    VisualSpec(l.get("name"), "mesh", origin, fn, scale)
                )
            elif geom.find("box") is not None:
                size = np.array(
                    [float(v) for v in geom.find("box").get("size").split()]
                )
                visuals.append(VisualSpec(l.get("name"), "box", origin, size=size))
            elif geom.find("cylinder") is not None:
                c = geom.find("cylinder")
                size = np.array([float(c.get("radius")), float(c.get("length"))])
                visuals.append(
                    VisualSpec(l.get("name"), "cylinder", origin, size=size)
                )
            elif geom.find("sphere") is not None:
                size = np.array([float(geom.find("sphere").get("radius"))])
                visuals.append(
                    VisualSpec(l.get("name"), "sphere", origin, size=size)
                )
            break  # one geometry per link is enough for silhouettes

    raw_joints = []
    mimics = {}
    limits = {}
    for j in robot.findall("joint"):
        name = j.get("name")
        jtype = _TYPE_MAP[j.get("type", "fixed")]
        parent = j.find("parent").get("link")
        child = j.find("child").get("link")
        origin = origin_to_T(j.find("origin"))
        axis_el = j.find("axis")
        axis = np.array(
            [float(v) for v in axis_el.get("xyz").split()]
            if axis_el is not None
            else [1.0, 0.0, 0.0]
        )
        n = np.linalg.norm(axis)
        if n > 0:
            axis = axis / n
        mimic_el = j.find("mimic")
        if mimic_el is not None:
            mimics[name] = (
                mimic_el.get("joint"),
                float(mimic_el.get("multiplier", 1.0)),
                float(mimic_el.get("offset", 0.0)),
            )
        limit_el = j.find("limit")
        if limit_el is not None and jtype != FIXED:
            limits[name] = (
                float(limit_el.get("lower", 0.0)),
                float(limit_el.get("upper", 0.0)),
            )
        raw_joints.append((name, jtype, parent, child, origin, axis))

    children = {child for (_, _, _, child, _, _) in raw_joints}
    roots = [l for l in links if l not in children]
    assert len(roots) >= 1, "no root link found"
    root_link = roots[0]
    return ParsedURDF(
        name=robot.get("name", "robot"),
        joints=raw_joints,
        root_link=root_link,
        links=links,
        visuals=visuals,
        joint_limits=limits,
    )


def chain_from_urdf(
    path: str,
    keypoint_links,
    actuated_joint_names,
    keypoint_offsets=None,
    name: str | None = None,
) -> KinematicChain:
    """Build a `KinematicChain` from a URDF file.

    `actuated_joint_names` fixes the joint-vector ordering (the reference
    orders by const.JOINT_NAMES, urdf_robot.py:56); mimic joints resolve to
    their driver's index (urdfpytorch link_fk_batch mimic handling,
    urdf.py:3143-3148).
    """
    parsed = parse_urdf(path)
    act_index = {n: i for i, n in enumerate(actuated_joint_names)}

    # mimic resolution
    mimic = {}
    tree = ET.parse(path)
    for j in tree.getroot().findall("joint"):
        m = j.find("mimic")
        if m is not None:
            mimic[j.get("name")] = (
                m.get("joint"),
                float(m.get("multiplier", 1.0)),
                float(m.get("offset", 0.0)),
            )

    specs = []
    for jname, jtype, parent, child, origin, axis in parsed.joints:
        ai, mult, off = -1, 1.0, 0.0
        if jname in act_index:
            ai = act_index[jname]
        elif jname in mimic:
            drv, mult, off = mimic[jname]
            ai = act_index.get(drv, -1)
        elif jtype != FIXED:
            # unactuated movable joint: freeze at zero
            jtype = FIXED
        specs.append(
            JointSpec(jname, parent, child, jtype, origin, axis, ai, mult, off)
        )
    return KinematicChain(
        specs,
        parsed.root_link,
        keypoint_links,
        keypoint_offsets,
        actuated_joint_names,
        name=name or parsed.name,
    )

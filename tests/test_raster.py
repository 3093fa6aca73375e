"""Device rasterizer (render/raster.py) vs host scanline renderer.

render_flat_batch is the data-generator's TPU twin of
render.shade.render_phong; they must agree pixel-for-pixel (same camera
model, inside test, perspective-correct 1/z depth, double-sided Lambert)
so datasets generated on-device match the host-rendered fixtures."""

import sys

import numpy as np

sys.path.insert(0, "tests")
import jax.numpy as jnp

from hrpe_tpu.data.const import JOINT_BOUNDS
from hrpe_tpu.kinematics import load_robot
from hrpe_tpu.render import RobotMesh, default_link_meshes
from hrpe_tpu.render.raster import render_flat_batch_np, render_flat_batch_rgba
from hrpe_tpu.render.shade import render_phong


def _scenes(B=2, seed=0):
    robot = load_robot("dofbot")
    rm = RobotMesh(robot, default_link_meshes(robot))
    rng = np.random.RandomState(seed)
    bounds = np.asarray(JOINT_BOUNDS["dofbot"])
    qs, Ts, lights, ambs, difs, cols = [], [], [], [], [], []
    for i in range(B):
        q = rng.uniform(bounds[:, 0], bounds[:, 1])
        T = np.eye(4)
        R = np.linalg.qr(rng.randn(3, 3))[0]
        if np.linalg.det(R) < 0:
            R *= -1
        T[:3, :3] = R
        T[:3, 3] = [0.02 * i, -0.05, 0.6 + 0.1 * i]
        l = rng.randn(3)
        qs.append(q)
        Ts.append(T)
        lights.append(l / np.linalg.norm(l))
        ambs.append(rng.uniform(0.25, 0.5))
        difs.append(rng.uniform(0.5, 0.75))
        cols.append(0.25 + 0.6 * rng.rand(3))
    verts = np.asarray(
        rm.posed_verts(
            jnp.asarray(np.array(qs), jnp.float32),
            jnp.asarray(np.array(Ts), jnp.float32),
        )
    )
    return rm, verts, np.array(lights), np.array(ambs), np.array(difs), np.array(cols)


def test_raster_matches_host_phong():
    rm, verts, lights, ambs, difs, cols = _scenes()
    K = np.array([[251.0, 0, 160], [0, 251.0, 120], [0, 0, 1]])
    hw = (240, 320)
    rgb, z = render_flat_batch_np(
        verts, np.asarray(rm.faces), K, hw, lights, ambs, difs, cols
    )
    for i in range(len(verts)):
        img_ref, z_ref = render_phong(
            verts[i].astype(np.float64),
            np.asarray(rm.faces),
            K,
            hw,
            light_dir=tuple(lights[i]),
            ambient=ambs[i],
            diffuse=difs[i],
            color=tuple(cols[i]),
            background=None,
        )
        m_ref, m_new = np.isfinite(z_ref), np.isfinite(z[i])
        union = (m_ref | m_new).sum()
        assert union > 500  # robot actually visible
        iou = (m_ref & m_new).sum() / union
        assert iou > 0.995, iou
        both = m_ref & m_new
        # host renderer rounds to uint8; device returns float — agree to
        # within quantization everywhere they both cover
        dc = np.abs(img_ref.astype(np.float64) - rgb[i])[both]
        assert np.percentile(dc, 99) < 1.5, dc.mean()
        dz = np.abs(z_ref[both] - z[i][both])
        assert dz.max() < 1e-4


def test_rgba_pack_matches_float_path():
    rm, verts, lights, ambs, difs, cols = _scenes(B=1, seed=3)
    K = np.array([[125.5, 0, 80], [0, 125.5, 60], [0, 0, 1]])
    hw = (120, 160)
    rgb, z = render_flat_batch_np(
        verts, np.asarray(rm.faces), K, hw, lights, ambs, difs, cols
    )
    rgba = np.asarray(
        render_flat_batch_rgba(
            jnp.asarray(verts),
            rm.faces,
            jnp.asarray(K),
            hw,
            jnp.asarray(lights),
            jnp.asarray(ambs),
            jnp.asarray(difs),
            jnp.asarray(cols),
        )
    )
    np.testing.assert_array_equal(rgba[..., 3] > 0, np.isfinite(z))
    both = np.isfinite(z)
    diff = np.abs(rgba[..., :3].astype(np.float64) - rgb)[both]
    assert diff.max() <= 0.5 + 1e-6

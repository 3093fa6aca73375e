"""Rasterizer tests: coverage correctness, differentiability, robot masks."""

import jax
import jax.numpy as jnp
import numpy as np

from hrpe_tpu.render import RobotMesh, default_link_meshes, soft_silhouette
from hrpe_tpu.render.mesh import box_mesh, cylinder_mesh, sphere_mesh
from hrpe_tpu.kinematics import load_robot

K = jnp.asarray([[100.0, 0, 32.0], [0, 100.0, 32.0], [0, 0, 1.0]])
HW = (64, 64)


def test_box_silhouette_coverage():
    v, f = box_mesh((0.2, 0.2, 0.2))
    verts = jnp.asarray(v) + jnp.asarray([0.0, 0.0, 1.0])
    mask = np.asarray(soft_silhouette(verts, jnp.asarray(f), K, HW, sigma=1e-5))
    assert mask.shape == HW
    # box spans +-0.1 at z in [0.9, 1.1]: projected half-size ~100*0.1/1.0=10px
    assert mask[32, 28] > 0.9  # interior (off the triangle diagonal)
    assert mask[1, 1] < 0.05  # corner empty
    # coverage area roughly (2*10)^2 = 400 px at nominal depth
    area = mask.sum()
    assert 250 < area < 650, area


def test_silhouette_empty_behind_camera():
    v, f = box_mesh((0.2, 0.2, 0.2))
    verts = jnp.asarray(v) + jnp.asarray([0.0, 0.0, -1.0])
    mask = np.asarray(soft_silhouette(verts, jnp.asarray(f), K, HW))
    assert mask.max() < 0.05


def test_silhouette_gradients():
    v, f = sphere_mesh(0.1)

    def loss(tz):
        verts = jnp.asarray(v) + jnp.stack([tz * 0, tz * 0, 1.0 + tz])
        m = soft_silhouette(verts, jnp.asarray(f), K, HW, sigma=1e-3)
        return jnp.sum(m)

    g = jax.grad(loss)(jnp.asarray(0.0))
    # moving the sphere away shrinks the silhouette: negative gradient
    assert float(g) < 0, float(g)


def test_robot_mesh_silhouette():
    robot = load_robot("panda")
    rm = RobotMesh(robot, default_link_meshes(robot))
    q = jnp.zeros((1, 8), jnp.float32)
    base2cam = jnp.eye(4)[None]
    base2cam = base2cam.at[:, 2, 3].set(1.5)  # robot 1.5 m in front
    base2cam = base2cam.at[:, :3, :3].set(
        jnp.asarray([[1.0, 0, 0], [0, 0, -1.0], [0, 1.0, 0]])
    )
    verts = rm.posed_verts(q, base2cam)
    assert verts.shape[0] == 1 and verts.shape[2] == 3
    mask = np.asarray(soft_silhouette(verts[0], rm.faces, K, HW, sigma=1e-4))
    assert mask.max() > 0.9
    assert 0 < mask.sum() < HW[0] * HW[1] * 0.8


def test_robot_mesh_grad_wrt_joints():
    robot = load_robot("dofbot")
    rm = RobotMesh(robot, default_link_meshes(robot))
    base2cam = jnp.eye(4)[None].at[:, 2, 3].set(0.6)

    def loss(q):
        verts = rm.posed_verts(q[None], base2cam)[0]
        return jnp.sum(soft_silhouette(verts, rm.faces, K, HW, sigma=1e-3))

    g = jax.grad(loss)(jnp.zeros(6, jnp.float32))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_phong_render_matches_silhouette():
    # the shaded host-side render (render/shade.py) must cover the same
    # pixels as the differentiable silhouette at a hard sigma
    import jax.numpy as jnp
    import numpy as np

    from hrpe_tpu.kinematics import load_robot
    from hrpe_tpu.render import RobotMesh, default_link_meshes, soft_silhouette
    from hrpe_tpu.render.shade import render_phong

    robot = load_robot("dofbot")
    rm = RobotMesh(robot, default_link_meshes(robot))
    q = jnp.zeros((1, robot.dof))
    base2cam = jnp.asarray(
        [[1.0, 0, 0, 0], [0, 0, -1.0, 0.0], [0, 1.0, 0, 0.6], [0, 0, 0, 1.0]]
    )[None]
    verts = rm.posed_verts(q, base2cam)[0]
    K = np.asarray([[120.0, 0, 64.0], [0, 120.0, 48.0], [0, 0, 1.0]])
    hw = (96, 128)

    img, zbuf = render_phong(np.asarray(verts), np.asarray(rm.faces), K, hw)
    covered = np.isfinite(zbuf)
    assert covered.any(), "nothing rendered"
    assert img[covered].max() > 40  # lit pixels
    assert (img[~covered] == 0).all()  # background untouched

    sil = np.asarray(
        soft_silhouette(verts, rm.faces, jnp.asarray(K), hw, sigma=1e-5)
    )
    hard = sil > 0.5
    inter = (hard & covered).sum()
    union = (hard | covered).sum()
    assert inter / max(union, 1) > 0.7, inter / max(union, 1)

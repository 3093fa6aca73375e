"""Differentiable batched PnP, pure JAX.

Replaces the reference's BPnP (lib/utils/BPnP.py): its forward is a host
round-trip into OpenCV `cv.solvePnP` per sample (EPNP init + ITERATIVE
refine, BPnP.py:36-41,141-145) and its backward hand-builds implicit-
function-theorem Jacobians with six autograd passes per sample
(BPnP.py:49-111). Here:

  forward  = DLT initialization + fixed-count Gauss-Newton refinement,
             batched with vmap — one XLA program, no host sync;
  backward = implicit differentiation at the optimum via jax.custom_vjp:
             at theta*, g(theta*, x) := J_r^T r = 0, so
             dtheta*/dx = -H^{-1} dg/dx. One 6x6 solve per sample.

Output convention matches BPnP: (B, 6) = [axis-angle rvec | tvec], the
pose that maps model points into the camera frame.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.geometry import axis_angle_to_rotmat, rotmat_to_axis_angle

Array = jax.Array

_GN_ITERS = 12
_DAMPING = 1e-6


def reproject(theta: Array, pts3d: Array, K: Array) -> Array:
    """theta (..., 6) -> projected 2D points (..., N, 2).

    Equivalent of BPnP's `batch_project` (BPnP.py:359-376).
    """
    R = axis_angle_to_rotmat(theta[..., :3])
    t = theta[..., 3:]
    cam = jnp.einsum("...ij,...nj->...ni", R, pts3d) + t[..., None, :]
    p = jnp.einsum("...ij,...nj->...ni", K, cam)
    return p[..., :2] / jnp.maximum(p[..., 2:3], 1e-9)


# ---------------------------------------------------------------------------
# single-sample solver pieces (vmapped over batch)
# ---------------------------------------------------------------------------

def _dlt_init(pts2d: Array, pts3d: Array, K: Array) -> Array:
    """DLT estimate of [rvec|t] from n>=6 correspondences.

    Conditioning: 2D points are pre-multiplied by K^-1 (normalized camera
    coordinates) and 3D points are centered/scaled (Hartley-style) before
    building the 2n x 12 system, so the f32 eigen-solve of A^T A stays
    well-conditioned. Sign disambiguated by positive centroid depth.
    Accuracy only needs to land in the GN basin.
    """
    n = pts2d.shape[0]
    # normalized image coordinates
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    u = ((pts2d[:, 0] - cx) / fx)[:, None]
    v = ((pts2d[:, 1] - cy) / fy)[:, None]
    # normalized 3D points
    c3 = jnp.mean(pts3d, axis=0)
    s3 = jnp.maximum(jnp.mean(jnp.linalg.norm(pts3d - c3, axis=-1)), 1e-6)
    Xn = (pts3d - c3) / s3
    X_h = jnp.concatenate([Xn, jnp.ones((n, 1), pts3d.dtype)], axis=-1)  # (n,4)
    zeros = jnp.zeros_like(X_h)
    rows_u = jnp.concatenate([X_h, zeros, -u * X_h], axis=-1)  # (n, 12)
    rows_v = jnp.concatenate([zeros, X_h, -v * X_h], axis=-1)
    A = jnp.concatenate([rows_u, rows_v], axis=0)  # (2n, 12)
    # smallest right singular vector via eigh of A^T A (12x12, cheap)
    _, vecs = jnp.linalg.eigh(A.T @ A)
    P = vecs[:, 0].reshape(3, 4)  # ~ lam * [s3*R | R@c3 + t] in normalized 3D
    M3 = P[:, :3]

    def rt_for(sign):
        # rotation closest to sign*M3 (polar projection with det fix)
        Us, Ss, Vts = jnp.linalg.svd(sign * M3)
        d = jnp.linalg.det(Us @ Vts)
        Vts_fix = jnp.concatenate([Vts[:2], Vts[2:] * d], axis=0)
        R = Us @ Vts_fix
        inv_lam_s3 = 3.0 / jnp.maximum(jnp.sum(Ss), 1e-9)  # = 1/(lam*s3)
        t = sign * inv_lam_s3 * s3 * P[:, 3] - R @ c3
        return R, t

    Rp, tp = rt_for(1.0)
    Rn, tn = rt_for(-1.0)
    zp = (Rp @ c3 + tp)[2]
    pos = zp > 0
    R = jnp.where(pos, Rp, Rn)
    t = jnp.where(pos, tp, tn)
    return jnp.concatenate([rotmat_to_axis_angle(R[None])[0], t], axis=-1)


def _residual(theta: Array, pts2d: Array, pts3d: Array, K: Array) -> Array:
    return (reproject(theta[None], pts3d[None], K[None])[0] - pts2d).reshape(-1)


def _gn_refine_rt(R0: Array, t0: Array, pts2d, pts3d, K):
    """Fixed-count Gauss-Newton on SE(3) with an ANALYTIC Jacobian.

    Local SO(3) parameterization (R <- exp(dw) R): for q = R X,
    d(pcam)/d(dw) = -[q]x, so the Jacobian rows are simple cross products —
    no autodiff in the solver (fast to compile, better conditioned than raw
    axis-angle). Jacobi-preconditioned 6x6 solve per step.
    """
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]

    def cost_rt(R, t):
        p = pts3d @ R.T + t
        zi = 1.0 / jnp.maximum(p[:, 2], 1e-6)
        u = fx * p[:, 0] * zi + cx
        v = fy * p[:, 1] * zi + cy
        return jnp.sum((u - pts2d[:, 0]) ** 2 + (v - pts2d[:, 1]) ** 2)

    def body(_, Rt):
        R, t = Rt
        q = pts3d @ R.T  # (n, 3)
        p = q + t
        x, y, z = p[:, 0], p[:, 1], p[:, 2]
        zi = 1.0 / jnp.maximum(z, 1e-6)
        u = fx * x * zi + cx
        v = fy * y * zi + cy
        r = jnp.concatenate([u - pts2d[:, 0], v - pts2d[:, 1]])  # (2n,)
        zero = jnp.zeros_like(zi)
        Ju = jnp.stack([fx * zi, zero, -fx * x * zi * zi], axis=-1)  # (n,3)
        Jv = jnp.stack([zero, fy * zi, -fy * y * zi * zi], axis=-1)
        # row a of du/dp composed with dp/dw = -[q]x gives  q x a
        Jwu = jnp.cross(q, Ju)
        Jwv = jnp.cross(q, Jv)
        J = jnp.concatenate(
            [
                jnp.concatenate([Jwu, Ju], axis=-1),
                jnp.concatenate([Jwv, Jv], axis=-1),
            ],
            axis=0,
        )  # (2n, 6) columns: [dw | dt]
        H = J.T @ J
        g = J.T @ r
        d = jax.lax.rsqrt(jnp.maximum(jnp.diagonal(H), 1e-12))
        Hs = H * d[:, None] * d[None, :] + _DAMPING * jnp.eye(6, dtype=r.dtype)
        delta = d * jnp.linalg.solve(Hs, d * g)
        ok = jnp.all(jnp.isfinite(delta))
        delta = jnp.where(ok, delta, 0.0)
        dR = axis_angle_to_rotmat((-delta[:3])[None])[0]
        return (dR @ R, t - delta[3:])

    R, t = jax.lax.fori_loop(0, _GN_ITERS, body, (R0, t0))
    return R, t, cost_rt(R, t)


def _solve_one(pts2d, pts3d, K):
    """Two-start GN (DLT init + canonical front-facing init), best cost wins.

    The second start guards against DLT landing in the mirror basin on
    noisy/near-planar configurations — the robustness role RANSAC/EPNP
    retries play in the OpenCV path.
    """
    th0 = _dlt_init(pts2d, pts3d, K)
    R_a, t_a, c_a = _gn_refine_rt(
        axis_angle_to_rotmat(th0[:3][None])[0], th0[3:], pts2d, pts3d, K
    )
    z0 = jnp.maximum(jnp.mean(jnp.linalg.norm(pts3d, axis=-1)) * 4.0, 0.5)
    R_b, t_b, c_b = _gn_refine_rt(
        jnp.eye(3, dtype=pts3d.dtype),
        jnp.array([0.0, 0.0, 1.0], pts3d.dtype) * z0,
        pts2d, pts3d, K,
    )
    pick_a = c_a <= c_b
    R = jnp.where(pick_a, R_a, R_b)
    t = jnp.where(pick_a, t_a, t_b)
    return jnp.concatenate([rotmat_to_axis_angle(R[None])[0], t], axis=-1)


def _grad_stationarity(theta, pts2d, pts3d, K):
    """g = d(0.5||r||^2)/dtheta; zero at the optimum."""
    r = _residual(theta, pts2d, pts3d, K)
    J = jax.jacfwd(_residual)(theta, pts2d, pts3d, K)
    return J.T @ r


# ---------------------------------------------------------------------------
# public API with implicit-diff gradients
# ---------------------------------------------------------------------------

@jax.custom_vjp
def pnp_pose(pts2d: Array, pts3d: Array, K: Array) -> Array:
    """Batched PnP: (B,n,2), (B,n,3), (3,3)|(B,3,3) -> (B,6) [rvec|t].

    Drop-in for BPnP_m3d.apply (BPnP.py:114-151). Differentiable in all
    three inputs via the implicit function theorem.
    """
    K_b = _broadcast_K(K, pts2d.shape[0])
    return jax.vmap(_solve_one)(pts2d, pts3d, K_b)


def _broadcast_K(K, B):
    return jnp.broadcast_to(K, (B, 3, 3)) if K.ndim == 2 else K


def _fwd(pts2d, pts3d, K):
    theta = pnp_pose(pts2d, pts3d, K)
    return theta, (theta, pts2d, pts3d, K)


def _bwd(res, g_out):
    theta, pts2d, pts3d, K = res
    B = pts2d.shape[0]
    K_b = _broadcast_K(K, B)

    def one(theta_i, p2_i, p3_i, K_i, g_i):
        H = jax.jacfwd(_grad_stationarity, argnums=0)(theta_i, p2_i, p3_i, K_i)
        # lambda^T = -g_i^T H^{-1}; grads: dx = lambda^T dg/dx
        lam = -jnp.linalg.solve(H.T, g_i)
        _, vjp = jax.vjp(
            lambda p2, p3, Km: _grad_stationarity(theta_i, p2, p3, Km),
            p2_i, p3_i, K_i,
        )
        return vjp(lam)

    d2, d3, dK = jax.vmap(one)(theta, pts2d, pts3d, K_b, g_out)
    if K.ndim == 2:
        dK = jnp.sum(dK, axis=0)
    return d2, d3, dK


pnp_pose.defvjp(_fwd, _bwd)


def pnp_pose_rt(pts2d: Array, pts3d: Array, K: Array):
    """Convenience: returns (R (B,3,3), t (B,3))."""
    theta = pnp_pose(pts2d, pts3d, K)
    return axis_angle_to_rotmat(theta[..., :3]), theta[..., 3:]

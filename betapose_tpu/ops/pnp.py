"""Batched Perspective-n-Point solver in pure JAX.

TPU-native replacement for the reference's `cv2.solvePnP` (iterative LM,
`utils/utils.py:17-41`): DLT initialization (SVD on the normalized-coordinate
design matrix) followed by a fixed-iteration Levenberg-Marquardt refinement of
the axis-angle + translation parameters against pixel-space reprojection
error.  Everything is static-shaped and vmappable, so a whole eval batch of
(50-keypoint, camera) problems solves as one fused XLA computation — no host
round-trip per frame.

Accuracy: with the ~50 well-spread designated keypoints the solution matches
cv2.solvePnP to ~1e-6 in R and t (see tests/test_pnp.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def rodrigues(rvec: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (3,) -> rotation matrix (3,3)."""
    theta = jnp.linalg.norm(rvec)
    # Guard the theta->0 limit: use the series-safe normalized axis.
    safe = jnp.where(theta < 1e-12, 1.0, theta)
    k = rvec / safe
    kx, ky, kz = k[0], k[1], k[2]
    zero = jnp.zeros(())
    K = jnp.array([[zero, -kz, ky],
                   [kz, zero, -kx],
                   [-ky, kx, zero]])
    s, c = jnp.sin(theta), jnp.cos(theta)
    R = jnp.eye(3) + s * K + (1.0 - c) * (K @ K)
    return jnp.where(theta < 1e-12, jnp.eye(3), R)


def inverse_rodrigues(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (3,3) -> axis-angle (3,).

    Uses atan2(|v|/2, (tr-1)/2) for the angle (well-conditioned everywhere
    except theta ~ pi, which gets its own branch from the diagonal of R)."""
    v = jnp.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    vnorm = jnp.linalg.norm(v)
    cos_theta = jnp.clip((jnp.trace(R) - 1.0) / 2.0, -1.0, 1.0)
    theta = jnp.arctan2(vnorm / 2.0, cos_theta)
    # Generic case: axis = v / |v|
    axis = v / jnp.where(vnorm < 1e-8, 1.0, vnorm)
    generic = axis * theta
    # theta ~ pi: |v| -> 0, recover axis from diagonal of (R + I)/2 with
    # signs fixed from off-diagonal products.
    d = jnp.sqrt(jnp.clip((jnp.diag(R) + 1.0) / 2.0, 0.0, None))
    axis_pi = d * jnp.array([1.0,
                             jnp.where(R[0, 1] < 0, -1.0, 1.0),
                             jnp.where(R[0, 2] < 0, -1.0, 1.0)])
    axis_pi = axis_pi / jnp.maximum(jnp.linalg.norm(axis_pi), 1e-12)
    near_pi = vnorm < 1e-5
    near_zero = theta < 1e-8
    out = jnp.where(near_pi, axis_pi * theta, generic)
    return jnp.where(near_zero, jnp.zeros(3), out)


def _dlt_init(pts3d, pts2d_norm, w=None):
    """DLT estimate of [R|t] from normalized image coordinates, with Hartley
    normalization of both point sets so the design matrix stays
    well-conditioned in float32 (the init must land in the global basin for
    the LM refinement — an unnormalized f32 DLT is only good to ~1e-3, which
    can fall into a nearby spurious PnP minimum).

    pts3d: (N,3); pts2d_norm: (N,2) in K^-1 homogeneous coordinates.
    w: optional (N,) nonnegative point weights (robust re-estimation —
    zeroed rows drop outliers while keeping shapes static).
    Returns (R (3,3), t (3,)).
    """
    dtype = pts3d.dtype
    n = pts3d.shape[0]
    if w is None:
        w = jnp.ones((n,), dtype)
    w = w.astype(dtype)
    wsum = jnp.maximum(jnp.sum(w), 1e-12)

    # Hartley normalization (weighted): 3D -> centroid 0, RMS radius sqrt(3)
    c3 = jnp.sum(pts3d * w[:, None], axis=0) / wsum
    p3 = pts3d - c3
    s3 = jnp.sqrt(3.0) / jnp.maximum(
        jnp.sqrt(jnp.sum(w * jnp.sum(p3 * p3, axis=1)) / wsum), 1e-12)
    p3 = p3 * s3
    # 2D -> centroid 0, RMS radius sqrt(2)
    c2 = jnp.sum(pts2d_norm * w[:, None], axis=0) / wsum
    p2 = pts2d_norm - c2
    s2 = jnp.sqrt(2.0) / jnp.maximum(
        jnp.sqrt(jnp.sum(w * jnp.sum(p2 * p2, axis=1)) / wsum), 1e-12)
    p2 = p2 * s2

    X = jnp.concatenate([p3, jnp.ones((n, 1), dtype)], axis=1)  # (N,4)
    zeros = jnp.zeros_like(X)
    u = p2[:, 0:1]
    v = p2[:, 1:2]
    sw = jnp.sqrt(w)[:, None]
    rows_u = sw * jnp.concatenate([X, zeros, -u * X], axis=1)   # (N,12)
    rows_v = sw * jnp.concatenate([zeros, X, -v * X], axis=1)   # (N,12)
    A = jnp.concatenate([rows_u, rows_v], axis=0)          # (2N,12)
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    Pn = vt[-1].reshape(3, 4)

    # Denormalize: x2 = inv(T2) x2n,  X3n = T3 X3  =>  P = inv(T2) Pn T3
    T3 = jnp.array([[s3, 0, 0, -s3 * c3[0]],
                    [0, s3, 0, -s3 * c3[1]],
                    [0, 0, s3, -s3 * c3[2]],
                    [0, 0, 0, 1]], dtype)
    T2_inv = jnp.array([[1 / s2, 0, c2[0]],
                        [0, 1 / s2, c2[1]],
                        [0, 0, 1]], dtype)
    P = T2_inv @ Pn @ T3

    # Sign: points must be in front of the camera (positive depth).
    centroid = jnp.mean(pts3d, axis=0)
    depth = P[2, :3] @ centroid + P[2, 3]
    P = P * jnp.where(depth < 0, -1.0, 1.0)
    M = P[:, :3]
    # Scale/orthogonalize so that R is a proper rotation.
    U, S, Vt = jnp.linalg.svd(M)
    scale = jnp.mean(S)
    R = U @ Vt
    det = jnp.linalg.det(R)
    D = jnp.diag(jnp.array([1.0, 1.0, jnp.sign(det)], dtype))
    R = U @ D @ Vt
    t = P[:, 3] / scale
    return R, t


def _hat(v):
    zero = jnp.zeros((), v.dtype)
    return jnp.array([[zero, -v[2], v[1]],
                      [v[2], zero, -v[0]],
                      [-v[1], v[0], zero]])


@functools.partial(jax.jit, static_argnames=("iters",))
def solve_pnp(points_3d: jnp.ndarray, points_2d: jnp.ndarray,
              cam_K: jnp.ndarray, iters: int = 20):
    """Solve a single PnP problem. Returns (R (3,3), t (3,)).

    points_3d: (N,3) model points; points_2d: (N,2) pixel observations;
    cam_K: (3,3) intrinsics. No distortion (the reference passes zero
    distCoeffs, `utils/utils.py:20`).

    Refinement is Levenberg-Marquardt on normalized-coordinate residuals with
    a multiplicative SO(3) update (left perturbation) and analytic Jacobians —
    residuals and Jacobian entries are O(1), keeping the 6x6 normal equations
    well-conditioned in float32 so the solver runs natively on TPU.  All
    matmuls are pinned to float32 precision: the TPU MXU default (bfloat16
    inputs) is far too coarse for geometry of this conditioning, and these
    tiny matrices are nowhere near the FLOPs budget anyway.
    """
    with jax.default_matmul_precision("float32"):
        return _solve_pnp_impl(points_3d, points_2d, cam_K, iters)


def _normalize_obs(points_2d, cam_K, dtype):
    pts2d = points_2d.astype(dtype)
    K = cam_K.astype(dtype)
    xn = (pts2d[:, 0] - K[0, 2]) / K[0, 0]
    yn = (pts2d[:, 1] - K[1, 2]) / K[1, 1]
    return jnp.stack([xn, yn], axis=1)  # (N,2)


def _lm_refine(pts3d, obs, R0, t0, iters, w=None, z_prior=None,
               z_lambda=0.0):
    """Weighted LM refinement from (R0, t0); w: optional (N,) weights
    (sqrt-applied to residual/Jacobian rows — zero drops a point).

    z_prior/z_lambda: optional soft depth prior — one extra residual
    row sqrt(z_lambda) * (t_z - z_prior) / z_prior (relative depth
    error, so z_lambda is comparable to the normalized-pixel residuals).
    z_lambda == 0 leaves the solution numerically identical (the zero
    row perturbs the float32 QR by ~1e-6; z_prior=None skips the row
    entirely and is bit-identical)."""
    dtype = pts3d.dtype
    n = pts3d.shape[0]
    sw = jnp.ones((n,), dtype) if w is None else jnp.sqrt(w.astype(dtype))
    sw2 = jnp.repeat(sw, 2)  # residual vector interleaves (u,v) per point
    use_prior = z_prior is not None
    if use_prior:
        zp = jnp.asarray(z_prior, dtype)
        pw = jnp.sqrt(jnp.asarray(z_lambda, dtype)) / jnp.maximum(zp, 1e-6)
        # d(prior_row)/d(state): rotation 0, t = [0,0,pw]
        J_prior = jnp.zeros((1, 6), dtype).at[0, 5].set(pw)

    def prior_res(t):
        return ((t[2] - zp) * pw)[None] if use_prior \
            else jnp.zeros((0,), dtype)

    def residual(R, t):
        pc = pts3d @ R.T + t               # (N,3)
        z = pc[:, 2:3]
        proj = pc[:, :2] / z
        return (proj - obs), pc

    def lm_step(carry, _):
        R, t, lam = carry
        r, pc = residual(R, t)
        X, Y, Z = pc[:, 0], pc[:, 1], pc[:, 2]
        iz = 1.0 / Z
        iz2 = iz * iz
        # d(proj)/d(pc): (N,2,3)
        zeros = jnp.zeros_like(iz)
        dpi = jnp.stack([
            jnp.stack([iz, zeros, -X * iz2], axis=1),
            jnp.stack([zeros, iz, -Y * iz2], axis=1)], axis=1)
        # Left perturbation exp(dw) applied to R only: pc(dw) = exp(dw) R p + t,
        # so dpc/d(delta_omega) = -[R p]x = -[pc - t]x; dpc/d(delta_t) = I.
        dpc_dw = -jax.vmap(_hat)(pc - t)                       # (N,3,3)
        J_w = jnp.einsum("nij,njk->nik", dpi, dpc_dw)          # (N,2,3)
        J_t = dpi                                              # (N,2,3)
        J = jnp.concatenate([J_w, J_t], axis=2).reshape(-1, 6)  # (2N,6)
        J = J * sw2[:, None]
        rv = r.reshape(-1) * sw2
        if use_prior:
            J = jnp.concatenate([J, J_prior], axis=0)
            rv = jnp.concatenate([rv, prior_res(t)], axis=0)
        # Damped least squares via QR on the augmented system — float32-safe
        # (cond(J) instead of cond(J)^2 of the normal equations).
        col_norm = jnp.sqrt(jnp.sum(J * J, axis=0))
        damp = jnp.sqrt(lam) * jnp.diag(col_norm + 1e-12)
        J_aug = jnp.concatenate([J, damp], axis=0)
        r_aug = jnp.concatenate([rv, jnp.zeros(6, dtype)], axis=0)
        Q, Rq = jnp.linalg.qr(J_aug)
        step = jax.scipy.linalg.solve_triangular(Rq, Q.T @ r_aug)
        dw, dt = -step[:3], -step[3:]
        R_new = rodrigues(dw) @ R
        t_new = t + dt
        r_new, _ = residual(R_new, t_new)
        e_new = (jnp.sum((r_new.reshape(-1) * sw2) ** 2)
                 + jnp.sum(prior_res(t_new) ** 2))
        improved = e_new < jnp.sum(rv ** 2)
        R = jnp.where(improved, R_new, R)
        t = jnp.where(improved, t_new, t)
        lam = jnp.clip(jnp.where(improved, lam * 0.1, lam * 10.0),
                       1e-14, 1e6)
        return (R, t, lam), None

    (R, t, _), _ = jax.lax.scan(
        lm_step, (R0, t0, jnp.asarray(1e-6, dtype)), None, length=iters)
    return R, t


def _solve_pnp_impl(points_3d, points_2d, cam_K, iters):
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    pts3d = points_3d.astype(dtype)
    obs = _normalize_obs(points_2d, cam_K, dtype)
    R0, t0 = _dlt_init(pts3d, obs)
    return _lm_refine(pts3d, obs, R0, t0, iters)


def _point_err(pts3d, obs, R, t):
    pc = pts3d @ R.T + t
    proj = pc[:, :2] / pc[:, 2:3]
    return jnp.sqrt(jnp.sum((proj - obs) ** 2, axis=1))  # (N,)


@functools.partial(jax.jit, static_argnames=("iters", "rounds"))
def solve_pnp_robust(points_3d, points_2d, cam_K, iters: int = 20,
                     rounds: int = 2, keep: float = 0.7, w=None,
                     z_prior=None, z_lambda=0.0):
    """Outlier-robust PnP: trimmed IRLS restarts, static-shaped/vmappable.

    A handful of grossly-wrong 2D points (a keypoint detector firing on the
    wrong feature) corrupts the least-squares DLT badly enough that LM
    converges in the wrong basin — cv2.solvePnP (what the reference calls,
    `utils/utils.py:17-41`) has the same failure mode, which is why this is
    an OPTIONAL extension (off by default; `solve_pnp` is the parity path).

    Each round: per-point reprojection errors under the current pose ->
    keep the best `keep` quantile (weights 1/0, shapes stay static) ->
    weighted-DLT restart + weighted LM -> accept if the trimmed error
    improves.  Deterministic RANSAC-lite without the dynamic loop.

    w: optional (N,) confidence weights (e.g. keypoint heatmap scores^k)
    applied to the initial DLT/LM and multiplied into every trim mask —
    soft down-weighting of low-confidence correspondences on top of the
    hard trimming.  w=None keeps the unweighted behavior bit-for-bit.
    Measured on the occlusion selftest tier, kp_score^4 weights lift
    ADD<0.1d from 0.69 (hard top-13 pruning) to 0.88.

    z_prior/z_lambda: optional soft depth prior on t_z (see _lm_refine)
    — e.g. the bbox-scale estimate f * diameter / box_size.  The prior
    enters every LM refinement but NOT the reprojection-error trimming.
    """
    with jax.default_matmul_precision("float32"):
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        pts3d = points_3d.astype(dtype)
        obs = _normalize_obs(points_2d, cam_K, dtype)
        w0 = None if w is None else w.astype(dtype)
        R0, t0 = _dlt_init(pts3d, obs, w0)
        R, t = _lm_refine(pts3d, obs, R0, t0, iters, w0,
                          z_prior, z_lambda)
        for _ in range(rounds):
            err = _point_err(pts3d, obs, R, t)
            if w0 is None:
                thr = jnp.quantile(err, keep)
                w2 = (err <= thr).astype(dtype)
            else:
                # quantile over the points that actually carry weight
                thr = jnp.quantile(jnp.where(w0 > 0, err, jnp.inf), keep)
                w2 = w0 * (err <= thr)
            R0w, t0w = _dlt_init(pts3d, obs, w2)
            R2, t2 = _lm_refine(pts3d, obs, R0w, t0w, iters, w2,
                                z_prior, z_lambda)
            # accept on the trimmed metric (same inlier set for both)
            e_old = jnp.sum(w2 * _point_err(pts3d, obs, R, t) ** 2)
            e_new = jnp.sum(w2 * _point_err(pts3d, obs, R2, t2) ** 2)
            better = e_new < e_old
            R = jnp.where(better, R2, R)
            t = jnp.where(better, t2, t)
        return R, t


# Batched variant: (B,N,3),(B,N,2),(3,3) -> (B,3,3),(B,3)
solve_pnp_batch = jax.jit(
    jax.vmap(lambda p3, p2, K: solve_pnp(p3, p2, K), in_axes=(0, 0, None)))


def pnp(points_3D: np.ndarray, points_2D: np.ndarray, cameraMatrix: np.ndarray):
    """Drop-in replacement for reference `utils/utils.py:17` `pnp`:
    returns (R (3,3) np.ndarray, t (3,1) np.ndarray)."""
    R, t = solve_pnp(jnp.asarray(points_3D), jnp.asarray(points_2D[:, :2]),
                     jnp.asarray(cameraMatrix))
    return np.asarray(R), np.asarray(t).reshape(3, 1)

"""Batched Kalman filter on the DeepSORT state, vectorized over tracks.

Contract: SURVEY.md Appendix A (reference: deep_sort/sort/kalman_filter.py).
Oracle: specs/kalman_np.py.

TPU-first design: instead of one 8x8 filter object per Python track, every
operation is written for a single state and `jax.vmap`-ed over the MAX_TRACKS
axis. The motion model F is applied as slice arithmetic (position += velocity)
rather than a dense 8x8 matmul -- XLA fuses the whole predict step into a
handful of VPU ops. Cholesky factorizations are on tiny 4x4 projected
covariances, batched over tracks.

All math is float32; the projected innovation covariance is well-conditioned
by construction (R adds sigma^2 >= (h/20)^2 > 0 on the diagonal).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

# chi-square 0.95 gate for 4 degrees of freedom (kalman_filter.py chi2inv95[4]).
CHI2INV95_4DOF = 9.4877
CHI2INV95_2DOF = 5.9915

_STD_W_POS = 1.0 / 20
_STD_W_VEL = 1.0 / 160

# Noise floor on the height used for std scaling. Real boxes are >= pixels
# tall so this never binds on data; it keeps the projected covariance positive
# definite (Cholesky-safe) for padded all-zero track slots in the fixed-shape
# tracker state.
_H_FLOOR = 1e-2


def initiate(measurement: jnp.ndarray):
    """(..., 4) xyah measurement -> (mean (..., 8), cov (..., 8, 8))."""
    mean = jnp.concatenate(
        [measurement, jnp.zeros_like(measurement)], axis=-1
    )
    h = jnp.maximum(measurement[..., 3], _H_FLOOR)
    std = jnp.stack(
        [
            2 * _STD_W_POS * h,
            2 * _STD_W_POS * h,
            jnp.full_like(h, 1e-2),
            2 * _STD_W_POS * h,
            10 * _STD_W_VEL * h,
            10 * _STD_W_VEL * h,
            jnp.full_like(h, 1e-5),
            10 * _STD_W_VEL * h,
        ],
        axis=-1,
    )
    cov = jnp.zeros(mean.shape + (8,)).at[
        ..., jnp.arange(8), jnp.arange(8)
    ].set(jnp.square(std))
    return mean, cov


def _motion_std(h: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack(
        [
            _STD_W_POS * h,
            _STD_W_POS * h,
            jnp.full_like(h, 1e-2),
            _STD_W_POS * h,
            _STD_W_VEL * h,
            _STD_W_VEL * h,
            jnp.full_like(h, 1e-5),
            _STD_W_VEL * h,
        ],
        axis=-1,
    )


def predict(mean: jnp.ndarray, cov: jnp.ndarray):
    """One constant-velocity step. mean (8,), cov (8,8); vmap for batches.

    F = [[I, I], [0, I]] (dt=1) applied structurally:
      mean'  = [pos + vel, vel]
      P'     = F P F^T + Q, with F P F^T computed blockwise.
    """
    h = jnp.maximum(mean[3], _H_FLOOR)
    q = jnp.square(_motion_std(h))

    new_mean = mean.at[:4].add(mean[4:])
    # Blockwise F P F^T: with P = [[A, B], [B^T, C]],
    # F P F^T = [[A + B + B^T + C, B + C], [B^T + C, C]]
    a, b = cov[:4, :4], cov[:4, 4:]
    c = cov[4:, 4:]
    top_left = a + b + b.T + c
    top_right = b + c
    new_cov = jnp.block([[top_left, top_right], [top_right.T, c]])
    new_cov = new_cov + jnp.diag(q)
    return new_mean, new_cov


def project(mean: jnp.ndarray, cov: jnp.ndarray):
    """State -> measurement space. Returns (mean4, S=HPH^T+R (4,4))."""
    h = jnp.maximum(mean[3], _H_FLOOR)
    std = jnp.stack(
        [_STD_W_POS * h, _STD_W_POS * h, jnp.asarray(1e-1, mean.dtype), _STD_W_POS * h]
    )
    s = cov[:4, :4] + jnp.diag(jnp.square(std))
    return mean[:4], s


def update(mean: jnp.ndarray, cov: jnp.ndarray, measurement: jnp.ndarray):
    """Kalman correction via Cholesky solve (kalman_filter.py:~150-190)."""
    proj_mean, s = project(mean, cov)
    chol = jsl.cho_factor(s, lower=True)
    # K = P H^T S^-1 ; P H^T = cov[:, :4]
    gain = jsl.cho_solve(chol, cov[:, :4].T).T  # (8, 4)
    innovation = measurement - proj_mean
    new_mean = mean + gain @ innovation
    new_cov = cov - gain @ s @ gain.T
    return new_mean, new_cov


def gating_distance(
    mean: jnp.ndarray,
    cov: jnp.ndarray,
    measurements: jnp.ndarray,
    only_position: bool = False,
) -> jnp.ndarray:
    """Squared Mahalanobis distance of (N, 4) xyah measurements to one state.

    only_position restricts to (cx, cy) with the 2-dof gate (not used on the
    reference's default path but part of its API)."""
    proj_mean, s = project(mean, cov)
    d = measurements - proj_mean  # (N, 4)
    if only_position:
        s = s[:2, :2]
        d = d[:, :2]
    chol = jnp.linalg.cholesky(s)
    z = jsl.solve_triangular(chol, d.T, lower=True)  # (4, N)
    return jnp.sum(z * z, axis=0)


# Batched-over-tracks forms (leading MAX_TRACKS axis).
initiate_batch = jax.vmap(initiate)
predict_batch = jax.vmap(predict)
update_batch = jax.vmap(update)
# (T, 8), (T, 8, 8), (N, 4) -> (T, N)
gating_distance_matrix = jax.vmap(
    partial(gating_distance, only_position=False), in_axes=(0, 0, None)
)

"""JAX batched Kalman filter vs the numpy oracle (specs/kalman_np.py)."""

import numpy as np
import pytest

from specs.kalman_np import KalmanFilterNp
from yolo_deepsort_tpu.tracking import kalman as K


@pytest.fixture(scope="module")
def oracle():
    return KalmanFilterNp()


def random_measurements(rng, n):
    cx = rng.uniform(0, 1000, n)
    cy = rng.uniform(0, 600, n)
    a = rng.uniform(0.3, 0.8, n)
    h = rng.uniform(40, 300, n)
    return np.stack([cx, cy, a, h], axis=1)


def test_initiate_matches_oracle(oracle):
    rng = np.random.default_rng(0)
    z = random_measurements(rng, 5)
    mean_j, cov_j = K.initiate_batch(z.astype(np.float32))
    for i in range(5):
        mean_o, cov_o = oracle.initiate(z[i])
        np.testing.assert_allclose(np.asarray(mean_j[i]), mean_o, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(cov_j[i]), cov_o, rtol=1e-4)


def test_predict_update_sequence_matches_oracle(oracle):
    rng = np.random.default_rng(1)
    z0 = random_measurements(rng, 3)
    means_o, covs_o = [], []
    for i in range(3):
        m, c = oracle.initiate(z0[i])
        means_o.append(m)
        covs_o.append(c)
    mean_j, cov_j = K.initiate_batch(z0.astype(np.float32))

    for step in range(10):
        mean_j, cov_j = K.predict_batch(mean_j, cov_j)
        z = z0 + rng.normal(0, 2, z0.shape) * np.array([1, 1, 0.01, 1])
        mean_j, cov_j = K.update_batch(mean_j, cov_j, z.astype(np.float32))
        for i in range(3):
            means_o[i], covs_o[i] = oracle.predict(means_o[i], covs_o[i])
            means_o[i], covs_o[i] = oracle.update(means_o[i], covs_o[i], z[i])
    for i in range(3):
        np.testing.assert_allclose(np.asarray(mean_j[i]), means_o[i], rtol=2e-4, atol=2e-3)
        np.testing.assert_allclose(np.asarray(cov_j[i]), covs_o[i], rtol=2e-3, atol=2e-3)


def test_gating_distance_matrix_matches_oracle(oracle):
    rng = np.random.default_rng(2)
    z0 = random_measurements(rng, 4)  # 4 tracks
    zq = random_measurements(rng, 6)  # 6 detections
    mean_j, cov_j = K.initiate_batch(z0.astype(np.float32))
    mean_j, cov_j = K.predict_batch(mean_j, cov_j)
    d_j = np.asarray(K.gating_distance_matrix(mean_j, cov_j, zq.astype(np.float32)))
    assert d_j.shape == (4, 6)
    for i in range(4):
        m, c = oracle.initiate(z0[i])
        m, c = oracle.predict(m, c)
        d_o = oracle.gating_distance(m, c, zq)
        np.testing.assert_allclose(d_j[i], d_o, rtol=2e-4, atol=1e-3)


def test_padded_slots_stay_finite():
    # all-zero (padded) track slots must not poison anything with NaNs
    z = np.zeros((3, 4), np.float32)
    mean, cov = K.initiate_batch(z)
    for _ in range(5):
        mean, cov = K.predict_batch(mean, cov)
    mean, cov = K.update_batch(mean, cov, z)
    d = K.gating_distance_matrix(mean, cov, np.zeros((2, 4), np.float32))
    assert np.isfinite(np.asarray(mean)).all()
    assert np.isfinite(np.asarray(cov)).all()
    assert np.isfinite(np.asarray(d)).all()

"""End-to-end tracking-quality parity: the JAX tracker and the numpy
reference oracle on the same synthetic MOT scene must reach near-identical
MOTA / ID-switch counts (SURVEY.md section 4.3, BASELINE gate metric).

A CI-sized version of benchmarks/mot_eval.py --synthetic (whose full-size
run measured MOTA 79.8% jax vs 79.3% oracle, IDsw 29 vs 31)."""

import sys

sys.path.insert(0, "/root/repo/benchmarks")

from mot_eval import synthetic_eval  # noqa: E402


def test_synthetic_mot_parity():
    m_jax, m_oracle = synthetic_eval(seed=3, n_frames=40, n_objects=4,
                                     feat_dim=32)
    # both trackers must actually track...
    assert m_jax.mota > 0.5, m_jax
    assert m_oracle.mota > 0.5, m_oracle
    # ...and agree tightly (measured: delta 0.0 at this size; the full-size
    # run differs by 0.0057 MOTA / 2 IDsw from same-frame id-order
    # permutations interacting with CLEAR-MOT matching). Round-1 review
    # flagged the old 0.06 tolerance as loose; frame-level fuzz in
    # test_tracker.py is the stronger evidence, this pins the metric level.
    assert abs(m_jax.mota - m_oracle.mota) < 0.015, (m_jax, m_oracle)
    assert abs(m_jax.id_switches - m_oracle.id_switches) <= 1, (
        m_jax, m_oracle,
    )

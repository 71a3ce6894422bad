"""Density-realizable (moment-SDP) parameter-set verification tests.

Validates the jax barrier interior-point in robust/realizable.py against
analytic moment bounds and Monte-Carlo densities — the oracle role MOSEK
plays for the reference (process_sim_runs.py:134-250).
"""

import numpy as np
import pytest

from upright_tpu.robust.realizable import (
    RealizableSet,
    pseudo_inertia,
    realizable_max_linear,
)

MASS = 0.8
BOX_L = np.array([-0.04, -0.04, 0.0])
BOX_U = np.array([0.04, 0.04, 0.12])
COM_C = np.array([0.0, 0.0, 0.05])


@pytest.fixture(scope="module")
def rset():
    return RealizableSet(
        lower=BOX_L,
        upper=BOX_U,
        com_lower=COM_C - 1e-3,
        com_upper=COM_C + 1e-3,
        mass=MASS,
    )


def test_mass_objective_exact(rset):
    mu = np.zeros(10)
    mu[0] = 1.0
    vals, _ = realizable_max_linear(mu[None], rset)
    assert vals[0] == pytest.approx(MASS, rel=1e-6)


def test_com_objective_hits_com_box(rset):
    # maximize h_z = m c_z: bound is m * com_upper_z
    mu = np.zeros(10)
    mu[3] = 1.0
    vals, _ = realizable_max_linear(mu[None], rset)
    assert vals[0] == pytest.approx(MASS * (COM_C[2] + 1e-3), rel=5e-3)


def test_second_moment_two_point_density(rset):
    """max E[z^2] with E[z] = m c_z on support [l_z, u_z]: achieved by the
    two-point density at the box faces; the per-axis moment constraint is
    tight there, so the relaxation equals the true value
    (l+u) m c_z - l u m."""
    # S_zz = 0.5 (Ixx + Iyy - Izz) in vech order (xx,xy,xz,yy,yz,zz)
    mu = np.zeros(10)
    mu[4 + 0] = 0.5
    mu[4 + 3] = 0.5
    mu[4 + 5] = -0.5
    vals, thetas = realizable_max_linear(mu[None], rset)
    l, u, cz = BOX_L[2], BOX_U[2], COM_C[2]
    exact = (l + u) * MASS * cz - l * u * MASS
    assert vals[0] == pytest.approx(exact, rel=2e-2)
    # the maximizer stays PSD
    J = np.asarray(pseudo_inertia(thetas[0]))
    assert np.linalg.eigvalsh(J).min() > -1e-5


def test_monte_carlo_densities_are_inside(rset):
    """Random point-mass densities on the box with the right CoM must never
    beat the barrier max (set containment), and the best sampled density
    should come within a few percent of it (tightness)."""
    rng = np.random.default_rng(42)
    mus = rng.standard_normal((4, 10))
    mus[:, 0] = 0.0  # mass is fixed; exclude it from the comparison
    vals, _ = realizable_max_linear(mus, rset)

    best = np.full(len(mus), -np.inf)
    for _ in range(3000):
        k = rng.integers(2, 6)
        pts = rng.uniform(BOX_L, BOX_U, size=(k, 3))
        w = rng.dirichlet(np.ones(k)) * MASS
        com = (w[:, None] * pts).sum(axis=0) / MASS
        if np.any(np.abs(com - COM_C) > 1e-3):
            # shift all points so the CoM lands exactly on target, if the
            # shifted points stay inside the box
            pts_s = pts + (COM_C - com)
            if np.any(pts_s < BOX_L) or np.any(pts_s > BOX_U):
                continue
            pts = pts_s
        S = (w[:, None, None] * pts[:, :, None] * pts[:, None, :]).sum(axis=0)
        I = np.trace(S) * np.eye(3) - S
        h = (w[:, None] * pts).sum(axis=0)
        theta = np.concatenate(
            [[MASS], h, [I[0, 0], I[0, 1], I[0, 2], I[1, 1], I[1, 2], I[2, 2]]]
        )
        best = np.maximum(best, mus @ theta)

    # containment: no sampled density beats the relaxation
    assert np.all(best <= vals + 5e-3 * np.abs(vals) + 1e-4), (best, vals)
    # tightness: sampling gets reasonably close (relaxation + finite
    # sampling, so not exact; absolute slack covers near-zero objectives)
    assert np.all(best >= vals - 0.35 * np.abs(vals) - 0.01), (best, vals)

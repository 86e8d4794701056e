"""GAE backend equivalence tests.

Test matrix mirrors the reference's Triton GAE tests
(/root/reference/tests/test_triton_gae.py): numpy-loop reference equality,
backend cross-equality, all-done / no-done edges, value_size > 1, and the
env-var dispatch switch.
"""

import os

import numpy as np
import pytest

from rl_games_tpu.ops.gae import (
    compute_gae,
    gae_associative,
    gae_pallas,
    gae_scan,
    discounted_returns,
)


def numpy_gae(rewards, values, dones, last_values, last_dones, gamma, lam):
    T = rewards.shape[0]
    advs = np.zeros_like(rewards)
    lastgaelam = 0.0
    for t in reversed(range(T)):
        if t == T - 1:
            nnt = 1.0 - last_dones
            nv = last_values
        else:
            nnt = 1.0 - dones[t + 1]
            nv = values[t + 1]
        nnt = nnt[:, None]
        delta = rewards[t] + gamma * nv * nnt - values[t]
        advs[t] = lastgaelam = delta + gamma * lam * nnt * lastgaelam
    return advs


def make_case(T=16, N=8, V=1, seed=0, done_p=0.15):
    rng = np.random.default_rng(seed)
    rewards = rng.normal(size=(T, N, V)).astype(np.float32)
    values = rng.normal(size=(T, N, V)).astype(np.float32)
    dones = (rng.random((T, N)) < done_p).astype(np.float32)
    last_values = rng.normal(size=(N, V)).astype(np.float32)
    last_dones = (rng.random(N) < done_p).astype(np.float32)
    return rewards, values, dones, last_values, last_dones


BACKENDS = {
    "scan": gae_scan,
    "associative": gae_associative,
    "pallas": lambda *a: gae_pallas(*a, interpret=True),
}


@pytest.mark.parametrize("backend", sorted(BACKENDS))
@pytest.mark.parametrize("V", [1, 3])
def test_matches_numpy_reference(backend, V):
    args = make_case(T=12, N=6, V=V, seed=1)
    expected = numpy_gae(*args, gamma=0.99, lam=0.95)
    got = np.asarray(BACKENDS[backend](*args, 0.99, 0.95))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("backend", sorted(BACKENDS))
@pytest.mark.parametrize("done_p", [0.0, 1.0])
def test_done_edges(backend, done_p):
    args = make_case(T=8, N=4, V=1, seed=2, done_p=done_p)
    expected = numpy_gae(*args, gamma=0.9, lam=0.9)
    got = np.asarray(BACKENDS[backend](*args, 0.9, 0.9))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


def test_nonaligned_env_count_pallas():
    # env*value count not a multiple of 128 exercises the pad/unpad path
    args = make_case(T=5, N=7, V=2, seed=3)
    expected = numpy_gae(*args, gamma=0.99, lam=0.95)
    got = np.asarray(gae_pallas(*args, 0.99, 0.95, interpret=True))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


def test_dispatch_env_var(monkeypatch):
    args = make_case(T=6, N=4, seed=4)
    expected = numpy_gae(*args, gamma=0.99, lam=0.95)
    for name in ["scan", "associative"]:
        monkeypatch.setenv("RLG_TPU_GAE_BACKEND", name)
        got = np.asarray(compute_gae(*args, 0.99, 0.95))
        np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


def test_discounted_returns_bootstrap():
    T, N, V = 4, 2, 1
    rewards = np.ones((T, N, V), np.float32)
    dones = np.zeros((T, N), np.float32)
    last_values = 10.0 * np.ones((N, V), np.float32)
    last_dones = np.zeros(N, np.float32)
    rets = np.asarray(
        discounted_returns(rewards, dones, last_values, last_dones, 0.5)
    )
    # R_3 = 1 + 0.5*10 = 6; R_2 = 1 + 0.5*6 = 4; R_1 = 3; R_0 = 2.5
    np.testing.assert_allclose(rets[:, 0, 0], [2.5, 3.0, 4.0, 6.0])

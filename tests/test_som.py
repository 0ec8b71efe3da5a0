"""Kohonen SOM tests: spec/grid geometry, BMU search, batch Hebbian update."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nvit_tpu.som import kohonen as som


def test_spec_grid_layout():
    # ≙ reference kohonen.py:52-54: m=floor(sqrt(N)), n=N//m
    spec = som.make_spec(16, 32)
    assert (spec.m, spec.n) == (5, 6)
    assert spec.num_nodes == 30
    assert spec.sigma == pytest.approx(np.sqrt(30) / 2)


def test_spec_square():
    spec = som.make_spec(8, 16)
    assert (spec.m, spec.n, spec.num_nodes) == (4, 4, 16)


def test_bmu_finds_nearest():
    spec = som.make_spec(4, 16)
    nodes = som.init_nodes(jax.random.PRNGKey(0), spec)
    # query exactly at node 5 (+ tiny noise) must return node 5
    x = nodes[5][None, :] + 1e-4
    repr_, idx = som.bmu(nodes, x)
    assert int(idx[0]) == 5
    np.testing.assert_allclose(np.asarray(repr_[0]), np.asarray(nodes[5]), rtol=1e-6)


def test_bmu_matches_bruteforce():
    spec = som.make_spec(6, 25)
    nodes = som.init_nodes(jax.random.PRNGKey(1), spec)
    x = jax.random.normal(jax.random.PRNGKey(2), (3, 7, 6))
    _, idx = som.bmu(nodes, x)
    d = np.linalg.norm(np.asarray(x)[:, :, None, :] - np.asarray(nodes)[None, None], axis=-1)
    np.testing.assert_array_equal(np.asarray(idx), d.argmin(-1))


def test_bmu_gradient_flows_to_nodes():
    spec = som.make_spec(4, 9)
    nodes = som.init_nodes(jax.random.PRNGKey(3), spec)
    x = jax.random.normal(jax.random.PRNGKey(4), (5, 4))

    def loss(nodes):
        repr_, _ = som.bmu(nodes, x)
        return jnp.sum(repr_**2)

    g = jax.grad(loss)(nodes)
    assert float(jnp.abs(g).sum()) > 0  # gather routes gradients into the codebook


def test_neighborhood_kernel_properties():
    spec = som.make_spec(4, 16)
    K = np.asarray(som.neighborhood_kernel(spec))
    assert K.shape == (16, 16)
    np.testing.assert_allclose(np.diag(K), 1.0)  # zero distance to self
    np.testing.assert_allclose(K, K.T, rtol=1e-6)  # torus distance is symmetric
    assert (K > 0).all()


def test_neighborhood_kernel_periodic_wrap():
    spec = som.make_spec(2, 16)  # 4x4 torus
    K = np.asarray(som.neighborhood_kernel(spec))
    # node (0,0)=0 and node (0,3)=3 are distance 1 on the torus (wrap), same
    # as adjacent (0,1)=1
    np.testing.assert_allclose(K[0, 3], K[0, 1], rtol=1e-6)
    # (0,0) ↔ (3,3)=15 wraps to diagonal distance sqrt(2)
    np.testing.assert_allclose(K[0, 15], np.exp(-2.0 / (2 * spec.sigma**2)), rtol=1e-6)


def test_hebbian_delta_pulls_toward_input():
    spec = som.make_spec(3, 16)
    nodes = som.init_nodes(jax.random.PRNGKey(5), spec)
    K = som.neighborhood_kernel(spec)
    x = jnp.ones((10, 3)) * 4.0
    _, idx = som.bmu(nodes, x)
    delta = som.hebbian_delta(nodes, K, x, idx, lr=0.5, alpha=0.1)
    moved = nodes + delta
    # every node moves strictly closer to the common input point
    before = np.linalg.norm(np.asarray(nodes) - 4.0, axis=-1)
    after = np.linalg.norm(np.asarray(moved) - 4.0, axis=-1)
    assert (after < before).all()


def test_hebbian_delta_matches_naive_batch_update():
    """Δ must equal the sum over samples of lr·α·K[bmu_i]·(x_i − nodes)."""
    spec = som.make_spec(4, 9)
    nodes = som.init_nodes(jax.random.PRNGKey(6), spec)
    K = np.asarray(som.neighborhood_kernel(spec))
    x = np.asarray(jax.random.normal(jax.random.PRNGKey(7), (6, 4)))
    _, idx = som.bmu(nodes, jnp.asarray(x))
    idx = np.asarray(idx)
    lr, alpha = 0.3, 0.05
    expected = np.zeros_like(np.asarray(nodes))
    for i in range(len(x)):
        strength = lr * alpha * K[idx[i]]  # [N]
        expected += strength[:, None] * (x[i][None, :] - np.asarray(nodes))
    got = np.asarray(som.hebbian_delta(nodes, jnp.asarray(K), jnp.asarray(x), jnp.asarray(idx), lr, alpha))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_hebbian_delta_zero_lr():
    spec = som.make_spec(3, 9)
    nodes = som.init_nodes(jax.random.PRNGKey(8), spec)
    K = som.neighborhood_kernel(spec)
    x = jax.random.normal(jax.random.PRNGKey(9), (4, 3))
    _, idx = som.bmu(nodes, x)
    delta = som.hebbian_delta(nodes, K, x, idx, lr=0.0, alpha=0.1)
    np.testing.assert_allclose(np.asarray(delta), 0.0)


def test_hebbian_delta_batched_input_shapes():
    """[B, T, d] inputs flatten to B·T samples — no zip-truncation (the
    reference's loop silently used only the first B of B·T samples,
    kohonen.py:138)."""
    spec = som.make_spec(4, 9)
    nodes = som.init_nodes(jax.random.PRNGKey(10), spec)
    K = som.neighborhood_kernel(spec)
    x3 = jax.random.normal(jax.random.PRNGKey(11), (2, 5, 4))
    _, idx3 = som.bmu(nodes, x3)
    d3 = som.hebbian_delta(nodes, K, x3, idx3, 0.1, 0.1)
    d2 = som.hebbian_delta(nodes, K, x3.reshape(10, 4), idx3.reshape(10), 0.1, 0.1)
    np.testing.assert_allclose(np.asarray(d3), np.asarray(d2), rtol=1e-5)


def test_neighborhood_kernel_non_periodic():
    spec = som.make_spec(2, 16, periodic=False)  # 4x4, no wrap
    K = np.asarray(som.neighborhood_kernel(spec))
    # corner (0,0) ↔ (0,3): distance 3 without wrap (vs 1 with wrap)
    assert K[0, 3] == pytest.approx(np.exp(-9.0 / (2 * spec.sigma**2)))
    # and strictly smaller than the adjacent-node affinity
    assert K[0, 3] < K[0, 1]


def test_sigma_override():
    spec = som.make_spec(4, 16, sigma=1.0)
    assert spec.sigma == 1.0
    K = np.asarray(som.neighborhood_kernel(spec))
    # tighter sigma → sharper neighborhood
    wide = np.asarray(som.neighborhood_kernel(som.make_spec(4, 16)))
    assert K[0, 1] < wide[0, 1]


def test_som_self_organizes():
    """Training property: after repeated Hebbian updates on clustered data,
    nodes move toward the data and the quantization error drops."""
    spec = som.make_spec(4, 16, alpha=0.5)
    nodes = som.init_nodes(jax.random.PRNGKey(20), spec) * 5.0
    K = som.neighborhood_kernel(spec)
    data = jax.random.normal(jax.random.PRNGKey(21), (64, 4)) * 0.5 + 2.0

    def qerror(nodes):
        repr_, _ = som.bmu(nodes, data)
        return float(jnp.mean(jnp.sum((repr_ - data) ** 2, axis=-1)))

    e0 = qerror(nodes)
    for _ in range(20):
        _, idx = som.bmu(nodes, data)
        nodes = nodes + som.hebbian_delta(nodes, K, data, idx, lr=0.1, alpha=spec.alpha)
    assert qerror(nodes) < 0.5 * e0


def test_kohonen_spec_alpha_honors_scheduler():
    """≙ reference model.py:313-322: the map's base alpha is
    scheduler_min_lr when the LR scheduler is enabled, so the effective
    Hebbian strength is sched(step)·min_lr (advisor round-1 finding)."""
    from nvit_tpu.configs.schema import ViTConfig
    from nvit_tpu.models.vit import kohonen_spec

    base = dict(kohonen_nodes=32, use_kohonen=True, kohonen_alpha=0.02,
                kohonen_scheduler_min_lr=0.001)
    assert kohonen_spec(ViTConfig(kohonen_scheduler_enabled=True, **base)).alpha == 0.001
    assert kohonen_spec(ViTConfig(kohonen_scheduler_enabled=False, **base)).alpha == 0.02

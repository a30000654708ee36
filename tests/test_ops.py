"""Pallas kernel tests (interpret mode on CPU): fused decayed InfoNCE
forward + custom VJP vs the XLA reference formulation."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mscl_tpu.ops import decayed_infonce_neg, decayed_infonce_neg_xla


@pytest.fixture
def data():
    rng = np.random.default_rng(0)
    b, c, k = 8, 128, 4096
    q = rng.normal(size=(b, c)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    queue = rng.normal(size=(c, k)).astype(np.float32)
    queue /= np.linalg.norm(queue, axis=0, keepdims=True)
    count = rng.integers(0, 2000, size=(k,)).astype(np.int32)
    return jnp.asarray(q), jnp.asarray(queue), jnp.asarray(count)


def test_forward_matches_xla(data):
    q, queue, count = data
    out = decayed_infonce_neg(q, queue, count, 0.99999, 1024, True)
    ref, _ = decayed_infonce_neg_xla(q, queue, count)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_gradient_matches_xla(data):
    q, queue, count = data

    def loss_pallas(q):
        return decayed_infonce_neg(q, queue, count, 0.99999, 1024,
                                   True).sum()

    def loss_xla(q):
        return decayed_infonce_neg_xla(q, queue, count)[0].sum()

    g_pallas = jax.grad(loss_pallas)(q)
    g_xla = jax.grad(loss_xla)(q)
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_xla),
                               rtol=1e-4, atol=1e-4)


def test_decay_actually_applied(data):
    q, queue, count = data
    out_decay = decayed_infonce_neg(q, queue, count, 0.9, 1024, True)
    out_nodecay = decayed_infonce_neg(q, queue,
                                      jnp.zeros_like(count), 0.9,
                                      1024, True)
    assert not np.allclose(np.asarray(out_decay),
                           np.asarray(out_nodecay))
    # column j scaled by 0.9**count[j]
    scale = 0.9 ** np.asarray(count, np.float32)
    np.testing.assert_allclose(np.asarray(out_decay),
                               np.asarray(out_nodecay) * scale[None, :],
                               rtol=1e-4, atol=1e-5)

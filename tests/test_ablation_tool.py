"""Host/device batch-assembly exactness for the ablation-ordering tool.

tools/analysis/ablation_ordering.py trains with on-device batch
assembly (assemble_batch_device) because per-step host->device batch
transfers leak their staging buffers in the axon client. This guards
the contract that the device path builds bit-equal batches (rgb exact;
flow to f32 rounding of the FRA rotation) from the same RNG stream as
the host reference path (make_batch).
"""
import numpy as np
import pytest

from tools.analysis.ablation_ordering import (ARMS, assemble_batch_device,
                                              make_batch, make_videos,
                                              sample_batch_idx)


@pytest.fixture(scope='module')
def data():
    return make_videos(n_per_class=3, hw=32, T=4, seed=7)


@pytest.mark.parametrize('arm', ARMS)
def test_device_assembly_matches_host(arm, data):
    import jax
    T, batch = 4, 6
    train_idx = np.arange(len(data['labels']))[::2]
    rng_host = np.random.default_rng(3)
    rng_dev = np.random.default_rng(3)

    host = make_batch(rng_host, data, train_idx, arm, batch, T)
    vids, offs, angs = sample_batch_idx(rng_dev, data, train_idx, arm,
                                        batch, T)
    # identical RNG consumption order across the two paths
    assert rng_host.integers(0, 1 << 30) == rng_dev.integers(0, 1 << 30)

    dev = jax.jit(
        lambda v, o, a: assemble_batch_device(
            jax.numpy.asarray(data['rgb']),
            None if arm == 'moco' else jax.numpy.asarray(data['flow']),
            v, o, a, arm, T))(vids, offs, angs)

    assert set(host) == set(dev)
    for b in (0, 1):
        np.testing.assert_array_equal(host['imgs'][b],
                                      np.asarray(dev['imgs'][b]))
        if arm != 'moco':
            np.testing.assert_allclose(host['flow_imgs'][b],
                                       np.asarray(dev['flow_imgs'][b]),
                                       rtol=1e-6, atol=1e-6)


def test_fra_arms_get_double_t(data):
    T, batch = 4, 4
    train_idx = np.arange(len(data['labels']))
    rng = np.random.default_rng(0)
    b = make_batch(rng, data, train_idx, 'mscl', batch, T)
    assert b['flow_imgs'][0].shape[2] == 2 * T   # NCTHW, FRA concat on T
    assert b['imgs'][0].shape[2] == T

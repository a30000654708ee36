"""Test config: force an 8-device CPU mesh so all sharding/collective code
paths (DP mesh, all_gather queue updates, psum'd metrics) are unit-testable
without TPU hardware — the deterministic fake of the distributed axis that
the reference never had (SURVEY.md §4).

Note: the TPU (axon) PJRT plugin registers itself in sitecustomize before
pytest starts, so jax is already imported here — the platform must be
forced via jax.config, not env vars.
"""
import os
import sys

flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

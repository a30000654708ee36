"""Localizer helpers."""
from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp


def parse_losses_localizer(losses: Dict) -> Tuple[jnp.ndarray, Dict]:
    log_vars = {k: jnp.asarray(v).mean() for k, v in losses.items()}
    return log_vars['loss'], log_vars

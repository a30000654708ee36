"""Forward-hook equivalents for a functional model.

Parity targets:
  - OutputHook (reference mmaction/core/hooks/output.py:8-58): capture
    named layers' outputs during a forward. Torch uses mutable forward
    hooks; flax exposes the same capability through
    ``capture_intermediates``, so OutputHook here is a thin context
    manager over it with the reference's name-list API.
  - register_module_hooks / GPUNormalize (reference
    mmaction/utils/module_hooks.py:1-80): pre-forward input transforms.
    Functionally these are input adapters composed around ``apply``.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..registry import Registry, build_from_cfg

MODULE_HOOKS = Registry('module_hooks')


class OutputHook:
    """Capture intermediate outputs of named flax submodules.

    Usage (mirrors the reference's context-manager protocol)::

        with OutputHook(model, variables, outputs=['backbone']) as h:
            scores = h.apply(imgs, train=False)
        feats = h.layer_outputs['backbone']

    ``outputs`` entries match flax module *paths* ('/'-joined); a bare
    name matches any path whose last component equals it.
    """

    def __init__(self, module, variables, outputs: Sequence[str],
                 as_tensor: bool = False):
        self.module = module
        self.variables = variables
        self.outputs = list(outputs or [])
        self.as_tensor = as_tensor
        self.layer_outputs: Dict[str, Any] = {}

    def _filter(self, mdl, method_name):
        path = '/'.join(str(p) for p in mdl.path)
        return any(path == name or path.endswith(f'/{name}') or
                   (mdl.name == name) for name in self.outputs)

    def apply(self, *args, mutable=None, **kwargs):
        mutable = list(mutable or []) + ['intermediates']
        out, aux = self.module.apply(
            self.variables, *args, mutable=mutable,
            capture_intermediates=self._filter, **kwargs)
        inter = aux.get('intermediates', {})

        def walk(tree, prefix=''):
            for k, v in tree.items():
                path = f'{prefix}/{k}' if prefix else k
                if isinstance(v, dict):
                    walk(v, path)
                elif k == '__call__':
                    val = v[0] if isinstance(v, tuple) else v
                    for name in self.outputs:
                        if prefix == name or \
                                prefix.endswith(f'/{name}'):
                            self.layer_outputs[name] = val if \
                                self.as_tensor else np.asarray(val)

        walk(inter)
        return out

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc_val, exc_tb):
        return False


@MODULE_HOOKS.register_module()
class GPUNormalize:
    """Device-side input normalization (reference
    mmaction/utils/module_hooks.py:36-80): divides out the CPU
    Normalize step by normalizing the batched uint8/float input right
    before the jitted forward, in the layout given by input_format."""

    _formats = ('NCTHW', 'NCHW', 'NCHW_Flow', 'NPTCHW')

    def __init__(self, input_format, mean, std):
        if input_format not in self._formats:
            raise ValueError(f'invalid input format {input_format}')
        shape = {'NCTHW': (1, -1, 1, 1, 1), 'NCHW': (1, -1, 1, 1),
                 'NCHW_Flow': (1, -1, 1, 1),
                 'NPTCHW': (1, 1, 1, -1, 1, 1)}[input_format]
        self._mean = jnp.asarray(mean, jnp.float32).reshape(shape)
        self._std = jnp.asarray(std, jnp.float32).reshape(shape)

    def hook_func(self) -> Callable:
        def pre_forward(imgs):
            return (imgs.astype(jnp.float32) - self._mean) / self._std
        return pre_forward


def register_module_hooks(apply_fn: Callable,
                          module_hooks_list: Sequence[dict],
                          arg_index: int = 0) -> Callable:
    """Compose pre-forward input hooks around an apply function
    (reference utils/module_hooks.py:9-33; only 'forward_pre' has a
    functional equivalent — the transform stays inside jit)."""
    hooks = []
    for cfg in module_hooks_list:
        cfg = dict(cfg)
        cfg.pop('hooked_module', None)
        pos = cfg.pop('hook_pos', 'forward_pre')
        if pos != 'forward_pre':
            raise NotImplementedError(
                f'hook_pos {pos}: only forward_pre input hooks exist '
                'in the functional model')
        hooks.append(build_from_cfg(cfg, MODULE_HOOKS).hook_func())

    def wrapped(*args, **kwargs):
        args = list(args)
        for h in hooks:
            args[arg_index] = h(args[arg_index])
        return apply_fn(*args, **kwargs)

    return wrapped

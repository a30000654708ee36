#!/usr/bin/env python
"""Same-hardware cross-framework anchor: a torch r3d_18 fwd+bwd train
step vs our jitted flax VideoResNet step on this host's CPU.

bench.py's vs_baseline divides by a FLOPs-*estimated* A100 reference
throughput (documented in its header). This script adds a *measured*
datapoint on identical hardware: both frameworks run the same
architecture (torchvision r3d_18 semantics), same batch, same dtype
(f32 — torch CPU bf16 matmuls are not representative), CE loss + SGD.
"""
import sys
import time

sys.path.insert(0, __file__.rsplit('/tools', 1)[0])


def bench_torch(x_np, y_np, iters):
    import torch
    import torch.nn as tnn
    sys.path.insert(0, 'tests')
    from test_r3d_torch_parity import TorchBasicBlock, torch_basic_stem

    class R3D18(tnn.Module):
        def __init__(self):
            super().__init__()
            self.stem = torch_basic_stem(3, 64, (3, 7, 7), (1, 2, 2),
                                         (1, 3, 3))
            layers = []
            cin = 64
            for i, w in enumerate([64, 128, 256, 512]):
                for b in range(2):
                    layers.append(TorchBasicBlock(
                        cin, w, 2 if (i > 0 and b == 0) else 1))
                    cin = w
            self.layers = tnn.Sequential(*layers)
            self.fc = tnn.Linear(512, 101)

        def forward(self, x):
            f = self.layers(self.stem(x))
            return self.fc(f.mean(dim=(2, 3, 4)))

    model = R3D18().train()
    opt = torch.optim.SGD(model.parameters(), lr=0.01, momentum=0.9)
    x = torch.from_numpy(x_np).permute(0, 4, 1, 2, 3)
    y = torch.from_numpy(y_np)
    ce = tnn.CrossEntropyLoss()

    def step():
        opt.zero_grad()
        loss = ce(model(x), y)
        loss.backward()
        opt.step()
        return float(loss)

    step()
    t0 = time.time()
    for _ in range(iters):
        step()
    return (time.time() - t0) / iters


def bench_jax(x_np, y_np, iters):
    import jax
    jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    import optax
    from mscl_tpu.models import BACKBONES
    from mscl_tpu.models.losses import cross_entropy

    bb = BACKBONES.get('torchvision.r3d_18')(single_out=True)
    x = jnp.asarray(x_np)
    y = jnp.asarray(y_np)
    rng = jax.random.PRNGKey(0)
    v = bb.init(rng, x)
    import flax.linen as nn

    head_w = jax.random.normal(rng, (512, 101)) * 0.01
    tx = optax.sgd(0.01, momentum=0.9)
    params = {'bb': v['params'], 'fc': head_w}
    opt_state = tx.init(params)
    stats = v['batch_stats']

    @jax.jit
    def step(params, stats, opt_state):
        def loss_fn(p):
            feat, aux = bb.apply(
                {'params': p['bb'], 'batch_stats': stats}, x,
                train=True, mutable=['batch_stats'])
            logits = feat.mean(axis=(1, 2, 3)) @ p['fc']
            return cross_entropy(logits, y), aux['batch_stats']
        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), new_stats, \
            opt_state, loss

    params, stats, opt_state, loss = step(params, stats, opt_state)
    _ = float(loss)
    t0 = time.time()
    for _ in range(iters):
        params, stats, opt_state, loss = step(params, stats, opt_state)
    _ = float(loss)
    return (time.time() - t0) / iters


def main():
    import numpy as np
    rng = np.random.default_rng(0)
    bs, t, hw = 2, 8, 112
    x_np = rng.normal(size=(bs, t, hw, hw, 3)).astype(np.float32)
    y_np = rng.integers(0, 101, bs).astype(np.int64)
    iters = 3
    dt_j = bench_jax(x_np, y_np, iters)
    print(f'jax  r3d_18 train step (cpu, bs{bs}): {dt_j:.2f} s',
          flush=True)
    dt_t = bench_torch(x_np, y_np, iters)
    print(f'torch r3d_18 train step (cpu, bs{bs}): {dt_t:.2f} s',
          flush=True)
    print(f'ratio torch/jax: {dt_t / dt_j:.2f}x', flush=True)


if __name__ == '__main__':
    main()

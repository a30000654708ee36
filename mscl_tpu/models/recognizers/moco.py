"""MoCo / MoCoV2 recognizers — momentum-contrast towers as pure state.

Parity: reference mmaction/models/recognizers/moco.py —
  - two encoders + necks + mlp projections, key side frozen
    (moco.py:318-408); EMA momentum update, cosine-annealed for V2:
    m = 1 - 0.5*(1-m_base)*(cos(pi*min(iters/max_iters,1))+1)
    (moco.py:408-421), iters counted in SAMPLES and advanced by the global
    batch on every training forward (moco.py:506-507 — note the reference
    quirk: a tower called twice per step, like MSCL's flow tower, anneals
    2x faster; reproduced faithfully)
  - negative queue (dim, K) with ptr + age count buffers
    (moco.py:390-397), temporal-decay weighting
    weight = t_decay**count * queue (moco.py:483-489)
  - InfoNCE logits [l_pos | q . weight]/T, labels = 0 (moco.py:480-498)
  - queue update from the (globally gathered) keys (moco.py:423-440);
    'update_queue=False' skips enqueue for the FRA-rotated flow pass
  - returned features {q, q_mlvl, k, k_mlvl, q_neg} + the decayed weight
    for the composite model (moco.py:512-515)

TPU-native state design: queue/ptr/count/iters live in the 'moco_state'
flax collection — explicit pytree state threaded through the jitted step,
replicated over the mesh. Under jit the batch is globally visible, so the
reference's concat_all_gather is simply the identity (XLA partitions the
matmul and inserts the collectives); ShuffleBN (moco.py:146-191) is
replaced by global-batch BN statistics — the MoCo paper's SyncBN
alternative — which removes the leak ShuffleBN works around. The EMA
key-encoder copy runs in the train step *before* the forward
(core/train_loop.py pre_update), matching the reference's call order.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..builder import (BACKBONES, HEADS, NECKS, RECOGNIZERS, SSL_AUGS,
                       build_ssl_aug)
from .base import parse_losses
from .recognizer3d import to_nthwc

# q-side -> k-side submodule name pairs (EMA + init-sync + freezing)
Q2K_PAIRS = (('encoder_q', 'encoder_k'), ('neck_q', 'neck_k'),
             ('mlp_q', 'mlp_k'))
KEY_PATTERNS = tuple(k for _, k in Q2K_PAIRS)


def _is_tower_root(node: Dict) -> bool:
    return isinstance(node, dict) and 'encoder_q' in node


def tree_ema_pairs(params: Dict, m) -> Dict:
    """k = m*k + (1-m)*q for every q/k pair found at this level."""
    out = dict(params)
    for qn, kn in Q2K_PAIRS:
        if qn in params and kn in params:
            out[kn] = jax.tree.map(
                lambda pk, pq: pk * m + pq * (1.0 - m),
                params[kn], params[qn])
    return out


def tree_copy_pairs(tree: Dict) -> Dict:
    """k <- q exact copy (init sync, reference moco.py:379-387).
    Materializes fresh buffers — aliased q/k arrays would break input
    donation in the jitted step."""
    out = dict(tree)
    for qn, kn in Q2K_PAIRS:
        if qn in tree and kn in tree:
            out[kn] = jax.tree.map(lambda x: jnp.array(x, copy=True),
                                   tree[qn])
    return out


def sync_key_variables(variables: Dict) -> Dict:
    """Recursively copy q->k params AND batch_stats at init."""
    def rec(node):
        if not isinstance(node, dict):
            return node
        node = {k: rec(v) for k, v in node.items()}
        if _is_tower_root(node):
            node = tree_copy_pairs(node)
        return node

    out = dict(variables)
    for coll in ('params', 'batch_stats'):
        if coll in out:
            out[coll] = rec(out[coll])
    return out


class MLP(nn.Module):
    """MoCo v2 projection: Linear-ReLU-Linear (reference moco.py:368-371);
    torch Linear default init (uniform +-1/sqrt(fan_in))."""
    dim_in: int
    dim: int
    mlp: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        init = nn.initializers.variance_scaling(1 / 3, 'fan_in', 'uniform')

        def bias_init_fn(fan_in):
            bound = 1.0 / (fan_in ** 0.5)
            return lambda key, shape, dtype=jnp.float32: jax.random.uniform(
                key, shape, dtype, -bound, bound)

        if self.mlp:
            x = nn.Dense(self.dim_in, kernel_init=init,
                         bias_init=bias_init_fn(self.dim_in),
                         dtype=self.dtype, name='fc1')(x)
            x = nn.relu(x)
            x = nn.Dense(self.dim, kernel_init=init,
                         bias_init=bias_init_fn(self.dim_in),
                         dtype=self.dtype, name='fc2')(x)
        else:
            x = nn.Dense(self.dim, kernel_init=init,
                         bias_init=bias_init_fn(self.dim_in),
                         dtype=self.dtype, name='fc1')(x)
        return x


class _MoCoBase(nn.Module):
    backbone: Any = None
    neck: Any = None
    moco_head: Any = None
    im_key: str = 'imgs'
    dim_in: int = 512
    dim: int = 128
    K: int = 65536
    m: float = 0.999            # MoCo v1 fixed momentum
    m_base: float = 0.994       # MoCoV2 annealed momentum base
    t_decay: float = 0.99999
    max_iters: int = 1
    T: float = 0.07
    mlp: bool = False
    aux_info: Any = ()
    aug: Any = None
    train_cfg: Any = None
    test_cfg: Any = None
    dtype: Any = jnp.float32

    anneal_momentum: bool = False
    # ShuffleBN semantics (reference moco.py:146-191). 0/1 = OFF: key
    # encoder BN statistics are computed over the global batch (SyncBN
    # alternative from the MoCo paper — round-1 default). g > 1 = the
    # faithful variant: a shared-PRNG global permutation, then the key
    # encoder runs per group of B/g samples so each group computes its
    # own BN batch statistics — exactly the per-GPU stats DDP ShuffleBN
    # produces with world size g. See PARITY.md for the A/B.
    shuffle_bn: int = 0

    def setup(self):
        bb_cfg = dict(self.backbone)
        bb_type = bb_cfg.pop('type')
        bb_cfg.pop('pretrained', None)
        factory = BACKBONES.get(bb_type)
        if factory is None:
            raise KeyError(f'unknown backbone {bb_type}')
        self.encoder_q = factory(dtype=self.dtype, **bb_cfg)
        self.encoder_k = factory(dtype=self.dtype, **bb_cfg)

        neck_cfg = dict(self.neck)
        neck_type = neck_cfg.pop('type')
        self.neck_q = NECKS.get(neck_type)(dtype=self.dtype, **neck_cfg)
        self.neck_k = NECKS.get(neck_type)(dtype=self.dtype, **neck_cfg)

        self.mlp_q = MLP(self.dim_in, self.dim, self.mlp, dtype=self.dtype)
        self.mlp_k = MLP(self.dim_in, self.dim, self.mlp, dtype=self.dtype)

        head_cfg = dict(self.moco_head)
        head_type = head_cfg.pop('type')
        self.moco_head_m = HEADS.get(head_type)(**head_cfg)

        self.aug_gpu = build_ssl_aug(dict(self.aug or
                                          dict(type='IdentityAug')))

        # ------------------------------------------------------- state
        # (reference moco.py:390-397 buffers; 'iters' promoted to state
        # so momentum annealing survives resume — SURVEY §5 fidelity fix)
        def queue_init():
            q = jax.random.normal(self.make_rng('params'),
                                  (self.dim, self.K), jnp.float32)
            return q / jnp.linalg.norm(q, axis=0, keepdims=True)

        self.queue = self.variable('moco_state', 'queue', queue_init)
        self.queue_ptr = self.variable('moco_state', 'queue_ptr',
                                       lambda: jnp.zeros((), jnp.int32))
        self.count = self.variable('moco_state', 'count',
                                   lambda: jnp.zeros((self.K,), jnp.int32))
        self.iters = self.variable('moco_state', 'iters',
                                   lambda: jnp.zeros((), jnp.int32))

    def _queue_vars(self):
        return self.queue, self.queue_ptr, self.count, self.iters

    # --------------------------------------------------------- forward
    def _key_forward(self, im_k, train: bool):
        k_mlvl = self.encoder_k(im_k, train=train)
        k_emb, k_mlvl = self.neck_k(k_mlvl, train=train)
        return self.mlp_k(k_emb), k_mlvl

    def extract_feat(self, im_q, im_k, train: bool):
        q_mlvl = self.encoder_q(im_q, train=train)
        q_emb, q_mlvl = self.neck_q(q_mlvl, train=train)
        q = self.mlp_q(q_emb)
        q = q / jnp.linalg.norm(q, axis=1, keepdims=True).clip(1e-12)

        # key branch: gradient-free (EMA-updated params). Default:
        # global-batch BN stats (replaces ShuffleBN, module docstring);
        # shuffle_bn > 1 enables the faithful per-group variant.
        if train and self.shuffle_bn > 1 and not self.is_initializing():
            g = self.shuffle_bn
            b = im_k.shape[0]
            assert b % g == 0, f'batch {b} % shuffle_bn groups {g} != 0'
            perm = jax.random.permutation(self.make_rng('moco'), b)
            inv = jnp.argsort(perm)
            shuffled = im_k[perm]
            ks, kmls = [], []
            for i in range(g):
                k_i, kml_i = self._key_forward(
                    shuffled[i * b // g:(i + 1) * b // g], train)
                ks.append(k_i)
                kmls.append(kml_i)
            k = jnp.concatenate(ks)[inv]
            k_mlvl = [jnp.concatenate(parts)[inv]
                      for parts in zip(*kmls)]
        else:
            k, k_mlvl = self._key_forward(im_k, train)
        k = k / jnp.linalg.norm(k, axis=1, keepdims=True).clip(1e-12)
        k = jax.lax.stop_gradient(k)
        k_mlvl = [jax.lax.stop_gradient(x) for x in k_mlvl]
        return q, q_mlvl, k, k_mlvl

    def _instance_loss(self, q, q_mlvl, k, k_mlvl, aux_info,
                       update_queue: bool, train: bool):
        """Everything after the tower forwards: decayed-queue InfoNCE,
        queue/count/iters bookkeeping, head loss. Shared by
        forward_train and forward_train_pair so the batched-pass variant
        keeps state math identical (reference moco.py:477-498)."""
        queue, ptr, count, iters = self._queue_vars()

        # === INSTANCE (reference moco.py:477-498) ===
        l_pos = jnp.einsum('nc,nc->n', q, k)[:, None]
        decay = self.t_decay ** count.value.astype(jnp.float32)
        weight = jax.lax.stop_gradient(queue.value * decay[None, :])
        l_neg = jnp.einsum('nc,ck->nk', q, weight)
        logits = jnp.concatenate([l_pos, l_neg], axis=1) / self.T
        ssl_label = jnp.zeros((logits.shape[0],), jnp.int32)

        batch_size = k.shape[0]
        if update_queue and not self.is_initializing():
            # under jit, k already covers the global batch (the reference
            # concat_all_gathers here, moco.py:423-440)
            assert self.K % batch_size == 0, \
                f'K={self.K} % global batch={batch_size} != 0'
            p = ptr.value
            queue.value = jax.lax.dynamic_update_slice(
                queue.value, k.T.astype(queue.value.dtype), (0, p))
            idx = jnp.arange(self.K, dtype=jnp.int32)
            in_window = (idx >= p) & (idx < p + batch_size)
            count.value = jnp.where(in_window, 1, count.value + 1)
            ptr.value = (p + batch_size) % self.K
        if train and not self.is_initializing():
            iters.value = iters.value + batch_size

        aux = dict(aux_info)
        aux['q_mlvl'] = q_mlvl
        aux['k_mlvl'] = k_mlvl
        losses = self.moco_head_m.loss(logits, ssl_label, **aux)
        return losses, dict(q=q, q_mlvl=q_mlvl, k=k, k_mlvl=k_mlvl,
                            q_neg=l_neg, weight=weight)

    def forward_train(self, im_q, im_k, aux_info=None,
                      return_features: bool = False,
                      update_queue: bool = True, train: bool = True):
        """im_q/im_k: (B, T, H, W, C). Returns losses (, features)."""
        aux_info = dict(aux_info or {})
        if not return_features:
            im_q, im_k, aux_info = self.aug_gpu(
                self.make_rng('moco'), im_q, im_k, aux_info)
        q, q_mlvl, k, k_mlvl = self.extract_feat(im_q, im_k, train)
        losses, features = self._instance_loss(
            q, q_mlvl, k, k_mlvl, aux_info, update_queue, train)
        if return_features:
            return losses, features
        return losses

    def forward_train_pair(self, im_q_a, im_k_a, im_q_b, im_k_b,
                           aux_info=None, update_queue_b: bool = True,
                           train: bool = True):
        """Two forward_train passes with ONE batched tower forward.

        Stacks (a, b) on the batch axis so the slim flow-tower convs run
        at 2B (half the kernel launches / BN fusions), then splits the
        features and applies the loss + queue bookkeeping sequentially
        per pass — state math identical to two forward_train calls (a
        enqueues first, b only if update_queue_b), per reference
        mscl.py:239-245. DIVERGENCE (opt-in, see PARITY.md): BN batch
        statistics are computed JOINTLY over the 2B stacked batch; the
        reference computes them per pass.
        """
        aux_info = dict(aux_info or {})
        b = im_q_a.shape[0]
        q2, q_mlvl2, k2, k_mlvl2 = self.extract_feat(
            jnp.concatenate([im_q_a, im_q_b], axis=0),
            jnp.concatenate([im_k_a, im_k_b], axis=0), train)
        losses_a, feats_a = self._instance_loss(
            q2[:b], [m[:b] for m in q_mlvl2], k2[:b],
            [m[:b] for m in k_mlvl2], aux_info, True, train)
        losses_b, feats_b = self._instance_loss(
            q2[b:], [m[b:] for m in q_mlvl2], k2[b:],
            [m[b:] for m in k_mlvl2], aux_info, update_queue_b, train)
        return (losses_a, feats_a), (losses_b, feats_b)

    def __call__(self, im_q, im_k, aux_info=None, return_loss=True,
                 train: bool = True, **kwargs):
        if not return_loss:
            raise NotImplementedError('MoCo does not support test mode')
        return self.forward_train(im_q, im_k, aux_info, train=train,
                                  **kwargs)

    def train_step(self, batch, train: bool = True):
        """(reference moco.py:442-458): batch[self.im_key] is the [q, k]
        pair list in NCTHW; aux_info keys are forwarded."""
        im_q = to_nthwc(batch[self.im_key][0], self.dtype)
        im_k = to_nthwc(batch[self.im_key][1], self.dtype)
        aux_info = {item: batch[item] for item in self.aux_info}
        losses = self.forward_train(im_q, im_k, aux_info, train=train)
        loss, log_vars = parse_losses(losses)
        return loss, log_vars


@RECOGNIZERS.register_module()
class MoCo(_MoCoBase):
    """Fixed-momentum MoCo (reference moco.py:31-315)."""
    anneal_momentum: bool = False


@RECOGNIZERS.register_module()
class MoCoV2(_MoCoBase):
    """Cosine-annealed momentum MoCo (reference moco.py:318-554)."""
    anneal_momentum: bool = True


# ------------------------------------------------------------- EMA hooks
# The EMA key-encoder copy is a pure pytree op built from the model config
# (outside flax apply); the train step runs it BEFORE the forward
# (reference calls _momentum_update_key_encoder at the top of
# extract_feat, moco.py:528-530).

def momentum_schedule_from_cfg(rec_type: str, cfg: Dict):
    """sample-count iters -> momentum m, per recognizer config dict."""
    if rec_type == 'MoCoV2':
        m_base = cfg.get('m_base', 0.994)
        max_iters = cfg.get('max_iters', 1)

        def sched(iters):
            factor = jnp.minimum(iters / max_iters, 1.0)
            return 1.0 - 0.5 * (1.0 - m_base) * (
                jnp.cos(jnp.pi * factor) + 1.0)
        return sched
    m = cfg.get('m', 0.999)
    return lambda iters: jnp.asarray(m)


def build_ema_fn(model):
    """(params, moco_state) -> params with key towers EMA-updated.
    Returns None for models without MoCo towers."""
    if isinstance(model, _MoCoBase):
        if model.anneal_momentum:
            sched = momentum_schedule_from_cfg(
                'MoCoV2', dict(m_base=model.m_base,
                               max_iters=model.max_iters))
        else:
            sched = momentum_schedule_from_cfg('MoCo', dict(m=model.m))

        def fn(params, moco_state):
            return tree_ema_pairs(params, sched(moco_state['iters']))
        return fn

    # composite models carry sub-recognizer configs as dataclass fields
    rec_cfg = getattr(model, 'recognizer', None)
    flow_cfg = getattr(model, 'recognizer_flow', None)
    if isinstance(rec_cfg, dict) and isinstance(flow_cfg, dict):
        sched_rgb = momentum_schedule_from_cfg(rec_cfg['type'], rec_cfg)
        sched_flow = momentum_schedule_from_cfg(flow_cfg['type'], flow_cfg)
        # MSCLWithAug runs the flow tower twice per step (base + FRA), and
        # the reference momentum-updates the key encoder inside EVERY
        # forward (moco.py:528-530) — so the flow tower's per-step EMA is
        # m applied twice; reproduce with m_eff = m**passes.
        flow_passes = 2 if type(model).__name__ == 'MSCLWithAug' else 1

        def fn(params, moco_state):
            out = dict(params)
            out['recognizer_m'] = tree_ema_pairs(
                params['recognizer_m'],
                sched_rgb(moco_state['recognizer_m']['iters']))
            m_flow = sched_flow(
                moco_state['recognizer_flow_m']['iters']) ** flow_passes
            out['recognizer_flow_m'] = tree_ema_pairs(
                params['recognizer_flow_m'], m_flow)
            return out
        return fn
    return None

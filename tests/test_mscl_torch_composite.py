"""Full-composite shared-weight cross-check: one MSCLWithAug train step,
flax vs an independently hand-built torch implementation.

The block-level parity campaign (test_r3d_torch_parity.py) locks the
backbones; this test locks the COMPOSITE math the way the reference wires
it (reference mmaction/models/recognizers/mscl.py:225-277 +
moco.py:473-515): both MoCo towers with decayed queues, FRA base/rotated
flow chunking, the cross-modal MxHead (moco_head_v2.py:38-53), the LMCL
PosHeadV2 (local_cl_head.py:10-81), the EMA momentum pre-update
(including the flow tower's double-update m**2 quirk), the queue
ptr/count/iters state transition, and the backward pass (selected
q-side gradients of the summed total loss).

Shared weights flow flax -> torch (k-side deliberately de-synced from
q by a deterministic perturbation so the EMA update and the key forward
are non-trivially exercised). Everything is f32, IdentityAug (the
stochastic aug path has its own dense parity tests in test_moco.py /
ssl_aug tests), global-batch BN on both sides (this repo's documented
ShuffleBN replacement, docs/design.md).

One deliberate divergence is encoded here exactly as documented: the
reference momentum-updates the key encoder inside EVERY forward
(moco.py:528-530), so its base-flow pass runs on k1 = m*k0+(1-m)*q and
its rotated pass on k2 = m*k1+(1-m)*q; this repo applies one pre-step
update with m**2 (core/train_loop.py pre_update), i.e. both flow passes
run on k2. The torch twin below implements the pre-step m**2 form, and
`test_flow_double_ema_reference_order_gap` bounds the k1-vs-k2 gap the
approximation introduces on the base pass.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

from mscl_tpu.apis.train import build_model_from_cfg
from mscl_tpu.models.recognizers import build_ema_fn, sync_key_variables
from mscl_tpu.ops import conv3d as _c3

pytestmark = pytest.mark.slow  # multi-minute campaign (suite tiering, VERDICT r3 weak #4)


@pytest.fixture(scope='module', autouse=True)
def _pin_conv_impl():
    """The cross-framework comparison is about the composite MATH, not
    the conv lowering: tap2d ('auto' default since round 3) changes
    accumulation order, and the 1/T=14x logit scaling amplifies those
    f32 reassociation diffs through the InfoNCE losses. Pin the direct
    lowering for this module."""
    prev = _c3.get_conv3d_impl()
    _c3.set_conv3d_impl('xla3d')
    yield
    _c3.set_conv3d_impl(prev)

B, T, HW, FHW = 4, 8, 32, 16
K, DIM, T_DECAY, TEMP, M_BASE = 32, 32, 0.99999, 0.07, 0.994
RGB_W, FLOW_W = 16, 2          # rgb stage1 C == flow stage4 C == 16


def tiny_cfg():
    def moco(backbone, dim_in):
        return dict(
            type='MoCoV2', backbone=backbone, neck=dict(type='BaseMoCo'),
            moco_head=dict(type='MoCoHead',
                           basename='flow' if dim_in == FLOW_W * 8 else '',
                           loss_cls=dict(type='CrossEntropyLoss_torch',
                                         ignore_index=-1)),
            dim_in=dim_in, dim=DIM, K=K, m_base=M_BASE,
            max_iters=10 ** 9, T=TEMP, t_decay=T_DECAY, mlp=True,
            aux_info=[], aug=dict(type='IdentityAug'))

    return dict(
        type='MSCLWithAug',
        recognizer=moco(dict(type='torchvision.r3d_18',
                             layers=(1, 1, 1, 1), base_width=RGB_W),
                        RGB_W * 8),
        recognizer_flow=moco(dict(type='resnet_flow.r2d_18',
                                  layers=(1, 1, 1, 1), base_width=FLOW_W),
                             FLOW_W * 8),
        moco_mx_head=dict(type='MSCLWithAugMxHead', basename='mx',
                          loss_cls=dict(type='CrossEntropyLoss_torch',
                                        ignore_index=-1),
                          same_kn=True, T=TEMP),
        sup_head=dict(type='MSCLWithAugPosHeadV2', basename='',
                      loss_pos=dict(type='CrossEntropyLoss_torch',
                                    ignore_index=-1),
                      bkb_channels=(None, None), t=T // 2, T=TEMP,
                      aux_keys=dict(
                          im_features=dict(q_mlvl='q_mlvl'),
                          base_flow_features=dict(q_mlvl='q_flow_mlvl'),
                          aug_flow_features=dict(
                              q_mlvl='q_aug_flow_mlvl'))),
        im_key='imgs', flow_key='flow_imgs', aux_info=[],
        update_aug_flow=False, weight_aug_flow=(1.0, 1.0),
        aug=dict(type='IdentityAug'), same_kn=True)


# ------------------------------------------------------- torch twin
def t_convbn(cin, cout, k, s, p, relu=True):
    mods = [tnn.Conv3d(cin, cout, k, stride=s, padding=p, bias=False),
            tnn.BatchNorm3d(cout)]
    if relu:
        mods.append(tnn.ReLU())
    return tnn.Sequential(*mods)


_MAKERS = {  # kernel, stride, pad per conv-maker (torchvision semantics)
    'simple3d': lambda s: (3, (s, s, s), 1),
    'no_temporal': lambda s: ((1, 3, 3), (1, s, s), (0, 1, 1)),
}


class TBlock(tnn.Module):
    def __init__(self, cin, planes, maker, stride):
        super().__init__()
        k, s3, p = _MAKERS[maker](stride)
        k1, _, p1 = _MAKERS[maker](1)
        self.conv1 = t_convbn(cin, planes, k, s3, p)
        self.conv2 = t_convbn(planes, planes, k1, 1, p1, relu=False)
        self.downsample = None
        if stride != 1 or cin != planes:
            ds = (stride,) * 3 if maker == 'simple3d' else (1, stride,
                                                            stride)
            self.downsample = t_convbn(cin, planes, 1, ds, 0, relu=False)

    def forward(self, x):
        res = x if self.downsample is None else self.downsample(x)
        return F.relu(self.conv2(self.conv1(x)) + res)


class TTinyVRN(tnn.Module):
    """1-block-per-stage VideoResNet twin (r3d / flow_basic stems)."""

    def __init__(self, cin, width, stem, maker):
        super().__init__()
        if stem == 'r3d':
            self.stem = t_convbn(cin, width, (3, 7, 7), (1, 2, 2),
                                 (1, 3, 3))
        else:                                  # flow_basic
            self.stem = t_convbn(cin, width, (1, 7, 7), (2, 2, 2),
                                 (0, 3, 3))
        chans = [width * 2 ** i for i in range(4)]
        self.layers = tnn.ModuleList([
            TBlock(width if i == 0 else chans[i - 1], chans[i], maker,
                   1 if i == 0 else 2) for i in range(4)])

    def forward(self, x):
        x = self.stem(x)
        outs = []
        for blk in self.layers:
            x = blk(x)
            outs.append(x)
        return outs


class TMLP(tnn.Module):
    def __init__(self, dim_in, dim):
        super().__init__()
        self.fc1 = tnn.Linear(dim_in, dim_in)
        self.fc2 = tnn.Linear(dim_in, dim)

    def forward(self, x):
        return self.fc2(F.relu(self.fc1(x)))


class TTower(tnn.Module):
    """MoCo tower twin: encoder+GAP+MLP both sides, decayed queue
    (reference moco.py:390-397,473-515)."""

    def __init__(self, cin, width, stem, maker, dim_in):
        super().__init__()
        self.encoder_q = TTinyVRN(cin, width, stem, maker)
        self.encoder_k = TTinyVRN(cin, width, stem, maker)
        self.mlp_q = TMLP(dim_in, DIM)
        self.mlp_k = TMLP(dim_in, DIM)
        self.register_buffer('queue', torch.zeros(DIM, K))
        self.register_buffer('count', torch.zeros(K, dtype=torch.long))
        self.ptr = 0
        self.iters = 0

    @staticmethod
    def _gap(x):
        return x.mean(dim=(2, 3, 4))

    def ema(self, m):
        with torch.no_grad():
            for pk, pq in zip(
                    list(self.encoder_k.parameters()) +
                    list(self.mlp_k.parameters()),
                    list(self.encoder_q.parameters()) +
                    list(self.mlp_q.parameters())):
                pk.mul_(m).add_(pq, alpha=1 - m)

    def forward_train(self, im_q, im_k, update_queue=True):
        q_mlvl = self.encoder_q(im_q)
        q = F.normalize(self.mlp_q(self._gap(q_mlvl[-1])), dim=1)
        with torch.no_grad():
            k_mlvl = self.encoder_k(im_k)
            k = F.normalize(self.mlp_k(self._gap(k_mlvl[-1])), dim=1)
        l_pos = (q * k).sum(1, keepdim=True)
        decay = T_DECAY ** self.count.float()
        weight = (self.queue * decay[None, :]).detach()
        logits = torch.cat([l_pos, q @ weight], dim=1) / TEMP
        labels = torch.zeros(logits.shape[0], dtype=torch.long)
        loss = F.cross_entropy(logits, labels)
        if update_queue:
            with torch.no_grad():
                p = self.ptr
                self.queue[:, p:p + B] = k.T
                idx = torch.arange(K)
                win = (idx >= p) & (idx < p + B)
                self.count = torch.where(
                    win, torch.ones_like(self.count), self.count + 1)
                self.ptr = (p + B) % K
        self.iters += B
        return loss, dict(q=q, k=k, weight=weight, q_mlvl=q_mlvl)


class TMSCL(tnn.Module):
    def __init__(self):
        super().__init__()
        self.rgb = TTower(3, RGB_W, 'r3d', 'simple3d', RGB_W * 8)
        self.flow = TTower(2, FLOW_W, 'flow_basic', 'no_temporal',
                           FLOW_W * 8)

    def train_step(self, im_q, im_k, flow_q, flow_k):
        """One composite step per reference mscl.py:225-277 (pre-step
        EMA form: flow momentum applied as m**2, module docstring)."""
        self.rgb.ema(M_BASE)
        self.flow.ema(M_BASE ** 2)
        losses = {}
        losses['loss_cls'], imf = self.rgb.forward_train(im_q, im_k)
        t = flow_q.shape[2] // 2
        bq, aq = flow_q[:, :, :t], flow_q[:, :, t:]
        bk, ak = flow_k[:, :, :t], flow_k[:, :, t:]
        losses['loss_cls_flow'], bff = self.flow.forward_train(bq, bk)
        laf, aff = self.flow.forward_train(aq, ak, update_queue=False)
        losses['loss_cls_flow_aug'] = laf * 1.0     # weight_aug_flow[0]

        def mx(qr, kf, qf, kr, w, wf):
            rf = torch.cat([(qr * kf).sum(1, keepdim=True), qr @ wf],
                           dim=1) / TEMP
            fr = torch.cat([(qf * kr).sum(1, keepdim=True), qf @ w],
                           dim=1) / TEMP
            lbl = torch.zeros(rf.shape[0], dtype=torch.long)
            return (F.cross_entropy(rf, lbl), F.cross_entropy(fr, lbl))

        losses['loss_cls_mx'], losses['loss_cls_mx_r'] = mx(
            imf['q'], bff['k'], bff['q'], imf['k'], imf['weight'],
            bff['weight'])
        losses['loss_cls_mx_aug'], losses['loss_cls_mx_r_aug'] = mx(
            imf['q'], aff['k'], aff['q'], imf['k'], imf['weight'],
            bff['weight'])

        # LMCL (local_cl_head.py:10-81): rgb stage1 vs concat flow stage4
        x_q = imf['q_mlvl'][0].mean(dim=(3, 4)).transpose(1, 2)
        x_f = torch.cat([bff['q_mlvl'][-1], aff['q_mlvl'][-1]],
                        dim=2).mean(dim=(3, 4)).transpose(1, 2)
        x_q = F.normalize(x_q, dim=-1)
        x_f = F.normalize(x_f, dim=-1)
        sim = torch.einsum('btc,bsc->bts', x_q, x_f)
        b, t_ = sim.shape[:2]
        losses['loss_pos'] = F.cross_entropy(
            sim.reshape(b * t_, -1) / TEMP,
            torch.arange(t_).repeat(b))
        return losses


# --------------------------------------------------- weight transfer
def copy_convbn(p, s, seq):
    seq[0].weight.data = torch.from_numpy(np.transpose(
        np.asarray(p['conv']['kernel']), (4, 3, 0, 1, 2)).copy())
    seq[1].weight.data = torch.from_numpy(np.asarray(p['bn']['scale']))
    seq[1].bias.data = torch.from_numpy(np.asarray(p['bn']['bias']))
    seq[1].running_mean.data = torch.from_numpy(np.asarray(s['bn']['mean']))
    seq[1].running_var.data = torch.from_numpy(np.asarray(s['bn']['var']))


def copy_encoder(p, s, enc):
    copy_convbn(p['stem'], s['stem'], enc.stem)
    for i in range(4):
        bp, bs = p[f'layer{i + 1}_0'], s[f'layer{i + 1}_0']
        copy_convbn(bp['conv1'], bs['conv1'], enc.layers[i].conv1)
        copy_convbn(bp['conv2'], bs['conv2'], enc.layers[i].conv2)
        if enc.layers[i].downsample is not None:
            copy_convbn(bp['downsample'], bs['downsample'],
                        enc.layers[i].downsample)


def copy_mlp(p, mlp):
    for name, lin in (('fc1', mlp.fc1), ('fc2', mlp.fc2)):
        lin.weight.data = torch.from_numpy(
            np.asarray(p[name]['kernel']).T.copy())
        lin.bias.data = torch.from_numpy(np.asarray(p[name]['bias']))


def copy_tower(p, s, ms, tower):
    copy_encoder(p['encoder_q'], s['encoder_q'], tower.encoder_q)
    copy_encoder(p['encoder_k'], s['encoder_k'], tower.encoder_k)
    copy_mlp(p['mlp_q'], tower.mlp_q)
    copy_mlp(p['mlp_k'], tower.mlp_k)
    tower.queue.data = torch.from_numpy(np.asarray(ms['queue']))
    tower.count.data = torch.from_numpy(
        np.asarray(ms['count']).astype(np.int64))
    tower.ptr = int(ms['queue_ptr'])
    tower.iters = int(ms['iters'])


def _perturb_k_side(params):
    """De-sync k from q deterministically so EMA + key forward are
    non-trivial (k = 1.02*q + 0.001)."""
    out = {}
    for tower_name, tower in params.items():
        tower = dict(tower)
        for kn in ('encoder_k', 'mlp_k'):
            tower[kn] = jax.tree.map(lambda x: x * 1.02 + 0.001,
                                     tower[kn])
        out[tower_name] = tower
    return out


@pytest.fixture(scope='module')
def shared_setup():
    rng = np.random.default_rng(42)
    batch = {
        'imgs': [rng.uniform(size=(B, 3, T, HW, HW)).astype(np.float32)
                 for _ in range(2)],
        'flow_imgs': [rng.normal(size=(B, 2, 2 * T, FHW, FHW))
                      .astype(np.float32) * 0.5 for _ in range(2)],
    }
    model = build_model_from_cfg(tiny_cfg())
    key = jax.random.PRNGKey(0)
    variables = sync_key_variables(model.init(
        {'params': key, 'dropout': key, 'moco': key}, batch,
        method='train_step'))
    params = dict(variables['params'])
    params = _perturb_k_side(params)
    stats, ms = variables['batch_stats'], variables['moco_state']

    # flax side: EMA pre-update, then one train step with grads
    ema_fn = build_ema_fn(model)
    params2 = ema_fn(params, ms)

    def loss_fn(p):
        (loss, log_vars), new_vars = model.apply(
            {'params': p, 'batch_stats': stats, 'moco_state': ms},
            batch, method='train_step',
            mutable=['batch_stats', 'moco_state'],
            rngs={'dropout': jax.random.PRNGKey(1),
                  'moco': jax.random.PRNGKey(2)})
        return loss, (log_vars, new_vars)

    (loss, (log_vars, new_vars)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(params2)

    # torch side: identical weights, independent implementation
    tmodel = TMSCL()
    copy_tower(params['recognizer_m'], stats['recognizer_m'],
               ms['recognizer_m'], tmodel.rgb)
    copy_tower(params['recognizer_flow_m'], stats['recognizer_flow_m'],
               ms['recognizer_flow_m'], tmodel.flow)
    tmodel.train()
    tin = [torch.from_numpy(batch['imgs'][0]),
           torch.from_numpy(batch['imgs'][1]),
           torch.from_numpy(batch['flow_imgs'][0]),
           torch.from_numpy(batch['flow_imgs'][1])]
    tlosses = tmodel.train_step(*tin)
    ttotal = sum(tlosses.values())
    ttotal.backward()
    return dict(log_vars=log_vars, new_vars=new_vars, grads=grads,
                params2=params2, tlosses=tlosses, tmodel=tmodel,
                ttotal=ttotal, loss=loss)


LOSS_KEYS = ['loss_cls', 'loss_cls_flow', 'loss_cls_flow_aug',
             'loss_cls_mx', 'loss_cls_mx_r', 'loss_cls_mx_aug',
             'loss_cls_mx_r_aug', 'loss_pos']


def test_every_loss_family_matches(shared_setup):
    lv, tl = shared_setup['log_vars'], shared_setup['tlosses']
    for k in LOSS_KEYS:
        assert k in lv, f'{k} missing from flax log_vars'
        np.testing.assert_allclose(
            float(lv[k]), float(tl[k]), rtol=2e-4, atol=2e-4,
            err_msg=f'loss family {k} diverges')
    np.testing.assert_allclose(float(shared_setup['loss']),
                               float(shared_setup['ttotal']),
                               rtol=2e-4, atol=2e-4)


def test_queue_state_transition_matches(shared_setup):
    nv, tm = shared_setup['new_vars'], shared_setup['tmodel']
    for name, tower in (('recognizer_m', tm.rgb),
                        ('recognizer_flow_m', tm.flow)):
        ms = nv['moco_state'][name]
        np.testing.assert_allclose(np.asarray(ms['queue']),
                                   tower.queue.numpy(), atol=2e-5,
                                   err_msg=f'{name} queue')
        np.testing.assert_array_equal(np.asarray(ms['count']),
                                      tower.count.numpy())
        assert int(ms['queue_ptr']) == tower.ptr
        assert int(ms['iters']) == tower.iters
    # flow tower ran twice (base + rotated): iters advance 2B, queue B
    assert int(nv['moco_state']['recognizer_flow_m']['iters']) == 2 * B
    assert int(nv['moco_state']['recognizer_m']['iters']) == B


def test_ema_update_matches(shared_setup):
    """Pre-step EMA: rgb k' = m*k+(1-m)*q; flow k' = m^2*k+(1-m^2)*q
    (the double-forward quirk, moco.py:528-530 called twice)."""
    p2, tm = shared_setup['params2'], shared_setup['tmodel']
    pairs = [
        (p2['recognizer_m']['encoder_k']['stem']['conv']['kernel'],
         tm.rgb.encoder_k.stem[0].weight, (4, 3, 0, 1, 2)),
        (p2['recognizer_flow_m']['encoder_k']['stem']['conv']['kernel'],
         tm.flow.encoder_k.stem[0].weight, (4, 3, 0, 1, 2)),
        (p2['recognizer_flow_m']['mlp_k']['fc2']['kernel'],
         tm.flow.mlp_k.fc2.weight, (1, 0)),
    ]
    for fx, tw, perm in pairs:
        np.testing.assert_allclose(
            np.transpose(np.asarray(fx), perm),
            tw.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_backward_gradients_match(shared_setup):
    """Total-loss gradients on representative q-side leaves (conv
    kernels at both ends of both towers + both MLPs)."""
    g, tm = shared_setup['grads'], shared_setup['tmodel']
    pairs = [
        (g['recognizer_m']['encoder_q']['stem']['conv']['kernel'],
         tm.rgb.encoder_q.stem[0].weight.grad, (4, 3, 0, 1, 2)),
        (g['recognizer_m']['encoder_q']['layer4_0']['conv2']['bn']
         ['scale'], tm.rgb.encoder_q.layers[3].conv2[1].weight.grad,
         None),
        (g['recognizer_m']['mlp_q']['fc2']['kernel'],
         tm.rgb.mlp_q.fc2.weight.grad, (1, 0)),
        (g['recognizer_flow_m']['encoder_q']['stem']['conv']['kernel'],
         tm.flow.encoder_q.stem[0].weight.grad, (4, 3, 0, 1, 2)),
        (g['recognizer_flow_m']['mlp_q']['fc1']['bias'],
         tm.flow.mlp_q.fc1.bias.grad, None),
    ]
    for fx, tw, perm in pairs:
        fx = np.asarray(fx)
        if perm is not None:
            fx = np.transpose(fx, perm)
        # atol absorbs f32 accumulation noise on near-zero grad entries
        np.testing.assert_allclose(fx, tw.numpy(), rtol=5e-3, atol=1e-4)


def test_flow_double_ema_reference_order_gap():
    """Bound the documented EMA-order approximation: the reference's
    base-flow pass runs on k1 = m*k0+(1-m)*q, ours on k2 = m^2*k0+
    (1-m^2)*q. For any leaf, |k2-k1| = m(1-m)|k0-q| — at m=0.994 that
    is <0.6% of the q/k de-sync, vanishing as training syncs the
    towers. Checked numerically on a scalar."""
    k0, q = 1.02, 1.0
    m = M_BASE
    k1 = m * k0 + (1 - m) * q
    k2 = m * k1 + (1 - m) * q
    ours = m ** 2 * k0 + (1 - m ** 2) * q
    assert abs(ours - k2) < 1e-12           # our form IS the ref pass-2
    assert abs(k2 - k1) <= m * (1 - m) * abs(k0 - q) + 1e-12

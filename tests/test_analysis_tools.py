"""Parsing regressions for the offline profile-attribution tooling.

categorize_step.py / attribute_fusions.py join a saved profiler trace
with compiled-HLO text via regexes; these fixtures lock the contract
(fusion->computation mapping, op_name extraction, conv-first
bucketing) so an HLO-format drift fails loudly instead of silently
mis-bucketing a future profile."""
import gzip
import json
import sys

sys.path.insert(0, __file__.rsplit('/tests', 1)[0])

from tools.analysis.attribute_fusions import (load_trace_times,
                                              parse_hlo_computations)
from tools.analysis.categorize_step import bucket_of, fusion_meta_paths

HLO = '''\
HloModule jit_train_step

%fused_computation.1 (p0: bf16[2,4,4,8]) -> bf16[2,4,4,8] {
  %p0 = bf16[2,4,4,8] parameter(0)
  %c = bf16[2,4,4,8] convolution(%p0, %p0), metadata={op_name="jit(train_step)/MSCLWithAug.forward_train/recognizer_m.forward_train/recognizer_m.extract_feat/encoder_q/layer1_0/conv1/conv/conv_general_dilated"}
  ROOT %r = bf16[2,4,4,8] add(%c, %p0), metadata={op_name="jit(train_step)/MSCLWithAug.forward_train/recognizer_flow_m.forward_train/bn/add"}
}

%fused_computation.2 (p1: f32[8]) -> f32[8] {
  %p1 = f32[8] parameter(0)
  ROOT %r2 = f32[8] multiply(%p1, %p1), metadata={op_name="jit(train_step)/MSCLWithAug.forward_train/recognizer_flow_m.forward_train/recognizer_flow_m.extract_feat/encoder_q/stem/bn/mul"}
}

ENTRY %main (a: bf16[2,4,4,8]) -> bf16[2,4,4,8] {
  %a = bf16[2,4,4,8] parameter(0)
  %fusion.1 = bf16[2,4,4,8] fusion(%a), kind=kOutput, calls=%fused_computation.1
  %gte = f32[8] constant(0)
  %fusion.2 = f32[8] fusion(%gte), kind=kLoop, calls=%fused_computation.2
  ROOT %out = bf16[2,4,4,8] copy(%fusion.1)
}
'''


def test_parse_hlo_computations():
    comps = parse_hlo_computations(HLO)
    assert 'fused_computation.1' in comps
    assert any('convolution' in op for op in comps['fused_computation.1'])
    assert 'fused_computation.2' in comps


def test_fusion_meta_conv_first_bucketing():
    metas = fusion_meta_paths(HLO)
    assert set(metas) == {'fusion.1', 'fusion.2'}
    # fusion.1 mixes an RGB conv with a flow-labeled elementwise op —
    # the conv op_name must come first and win the bucket
    assert 'encoder_q/layer1_0/conv1' in metas['fusion.1'][0]
    assert bucket_of(metas['fusion.1']) == 'rgb q tower'
    # fusion.2 is a pure-VPU flow fusion
    assert bucket_of(metas['fusion.2']) == 'flow tower'
    assert bucket_of([]) == 'no-metadata'


def test_load_trace_times(tmp_path):
    d = tmp_path / 'plugins' / 'profile' / '2026_01_01_00_00_00'
    d.mkdir(parents=True)
    events = [
        {'ph': 'M', 'name': 'process_name', 'pid': 7,
         'args': {'name': '/device:TPU:0'}},
        {'ph': 'M', 'name': 'process_name', 'pid': 9,
         'args': {'name': 'python host'}},
        {'ph': 'X', 'pid': 7, 'name': 'fusion.1', 'dur': 3000, 'ts': 0},
        {'ph': 'X', 'pid': 7, 'name': 'fusion.1', 'dur': 3000, 'ts': 9},
        {'ph': 'X', 'pid': 7, 'name': 'jit_train_step', 'dur': 9000,
         'ts': 0},                      # program-level row: excluded
        {'ph': 'X', 'pid': 9, 'name': 'fusion.1', 'dur': 500, 'ts': 0},
    ]
    with gzip.open(d / 'x.trace.json.gz', 'wt') as f:
        json.dump({'traceEvents': events}, f)
    times = load_trace_times(str(tmp_path), iters=3)
    # two TPU-pid occurrences of fusion.1, host pid + jit_ rows ignored
    assert set(times) == {'fusion.1'}
    assert abs(times['fusion.1'] - (6000 / 1e3 / 3)) < 1e-9

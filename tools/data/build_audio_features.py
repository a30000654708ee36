#!/usr/bin/env python
"""Precompute log-mel spectrogram features from wav files.

Parity: reference tools/data/build_audio_features.py (librosa lognorm
mel features); here the from-scratch numpy mel pipeline
(mscl_tpu/datasets/audio_dataset.py) produces the .npy features
consumed by AudioFeatureDataset.
"""
import argparse
import glob
import multiprocessing as mp
import os
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(
    osp.abspath(__file__)))))

from mscl_tpu.datasets.audio_dataset import (AudioDecodeInit,  # noqa
                                             MelSpectrogram)


def build_one(args):
    wav, out_root, n_mels, fixed_length = args
    name = osp.splitext(osp.basename(wav))[0]
    out = osp.join(out_root, name + '.npy')
    if osp.exists(out):
        return
    results = AudioDecodeInit()(dict(audio_path=wav))
    results['audios'] = results['audios'][None]
    mel = MelSpectrogram(n_mels=n_mels, fixed_length=fixed_length)(
        results)['audios'][0]
    np.save(out, mel.astype(np.float32))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('audio_root')
    p.add_argument('out_root')
    p.add_argument('--n-mels', type=int, default=80)
    p.add_argument('--fixed-length', type=int, default=640,
                   help='mel frames kept per clip (10 s at defaults)')
    p.add_argument('--num-workers', type=int, default=4)
    args = p.parse_args()
    os.makedirs(args.out_root, exist_ok=True)
    wavs = glob.glob(osp.join(args.audio_root, '**', '*.wav'),
                     recursive=True)
    with mp.Pool(args.num_workers) as pool:
        pool.map(build_one, [(w, args.out_root, args.n_mels,
                              args.fixed_length) for w in wavs])
    print(f'{len(wavs)} wavs -> {args.out_root}')


if __name__ == '__main__':
    main()

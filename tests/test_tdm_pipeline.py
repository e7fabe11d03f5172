"""TDM curriculum + pipeline tests."""
import numpy as np

from seld_tpu.data.tdm import build_event_banks
from seld_tpu.data.tdm_pipeline import (TDMCurriculum, extract_clip_features,
                                        make_tdm_trainset)


def test_curriculum_schedule():
    c = TDMCurriculum()
    # warmup: nothing grows
    for e in range(0, 21):
        c.advance(e)
    assert (c.overlap_num, c.overlap_sec) == (1, 1)
    # epoch 22, 24, 26: sec 2, 3, then num bumps
    c.advance(22)
    assert c.overlap_sec == 2
    c.advance(24)
    assert c.overlap_sec == 3
    c.advance(26)
    assert (c.overlap_num, c.overlap_sec) == (2, 1)
    # odd epochs don't advance
    c.advance(27)
    assert (c.overlap_num, c.overlap_sec) == (2, 1)
    # saturates at max
    for e in range(28, 60, 2):
        c.advance(e)
    assert (c.overlap_num, c.overlap_sec) == (3, 3)


def test_make_tdm_trainset_end_to_end():
    rng = np.random.RandomState(0)
    sr = 24000
    n_classes = 14
    frames = 100  # 10 s clips

    wavs, labels = [], []
    for _ in range(2):
        wav = rng.randn(4, frames * 2400).astype(np.float32) * 0.05
        label = np.zeros((frames, 4 * n_classes), np.float32)
        label[10:40, 1] = 1.0
        label[10:40, 1 + n_classes] = 1.0  # x = 1
        wavs.append(wav)
        labels.append(label)

    banks = build_event_banks(list(zip(wavs, labels)), sr=sr,
                              n_classes=n_classes)
    curriculum = TDMCurriculum()
    ds = make_tdm_trainset(wavs, labels, banks, rng, batch_size=2,
                           curriculum=curriculum)
    x, y = next(iter(ds))
    assert x.shape[1:] == (300, 64, 7)
    assert y.shape[1:] == (60, 4 * n_classes)
    # features are normalized over the set
    assert abs(float(ds.x.mean())) < 0.1


def test_extract_clip_features_pads():
    rng = np.random.RandomState(1)
    wavs = [rng.randn(4, 24000).astype(np.float32)]
    feats = extract_clip_features(wavs, max_frames=100)
    assert feats.shape == (1, 100, 64, 7)
    assert feats[0, 60:].sum() == 0  # padded tail

"""Wav-native pipeline (seld_tpu.data.wav_pipeline): raw wavs through the
on-device front-end must reproduce the offline .npy path exactly
(feature_extractor.py:15-50 extraction + :218-234 normalization), and the
resulting datasets must have the offline path's window geometry."""
import os
import wave

import numpy as np
import pytest

from seld_tpu.data.wav_pipeline import (features_from_wavs,
                                        make_wav_datasets,
                                        wav_feature_splits)
from seld_tpu.ops.features import (apply_normalizer, calculate_statistics,
                                   extract_features, extract_labels,
                                   preprocess_features_labels)

SR = 24000


def _write_wav(path, samples):
    data = (np.clip(samples, -1, 1) * 32767).astype(np.int16)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(samples.shape[1])
        w.setsampwidth(2)
        w.setframerate(SR)
        w.writeframes(data.tobytes())


def _make_wav_tree(root, folds=(1, 1, 5, 6), seconds=1.0):
    rng = np.random.RandomState(3)
    wav_dir = root / "foa_dev"
    meta_dir = root / "metadata_dev"
    os.makedirs(wav_dir)
    os.makedirs(meta_dir)
    for i, fold in enumerate(folds):
        name = f"fold{fold}_room1_mix{i:03d}"
        _write_wav(wav_dir / f"{name}.wav",
                   rng.randn(int(SR * seconds), 4) * 0.05)
        with open(meta_dir / f"{name}.csv", "w") as f:
            for fr in range(2, 12):
                f.write(f"{fr},{(i + 2) % 12},0,45,-10\n")
    return str(wav_dir), str(meta_dir)


def test_wav_native_matches_offline_path(tmp_path):
    """wav_feature_splits == extract-per-clip + preprocess + train-split
    stats + normalize (what scripts/extract_features.py writes to disk)."""
    import jax.numpy as jnp

    wav_dir, meta_dir = _make_wav_tree(tmp_path)
    splits, stats = wav_feature_splits(
        wav_dir, meta_dir, n_classes=12, max_label_length=50)

    # offline reference: the exact scripts/extract_features.py computation
    from seld_tpu.data.loader import load_wav_clips
    offline = {}
    for mode in ("train", "val", "test"):
        wavs, labels = load_wav_clips(wav_dir, meta_dir, mode, n_classes=12,
                                      max_label_length=50)
        fs, ls = [], []
        for wav, lab in zip(wavs, labels):
            f = np.asarray(extract_features(jnp.asarray(wav), sample_rate=SR,
                                            mode="foa", n_fft=1024,
                                            win_length=960, hop_length=480))
            f, lab = preprocess_features_labels(f, np.asarray(lab),
                                                max_label_length=50)
            fs.append(f)
            ls.append(lab)
        offline[mode] = (np.stack(fs), np.stack(ls))

    mean, std = calculate_statistics(
        offline["train"][0].reshape(-1, 64, 7))
    np.testing.assert_allclose(np.asarray(stats[0]), mean, atol=1e-6)
    for mode in ("train", "val", "test"):
        want_x = np.asarray(apply_normalizer(offline[mode][0], mean, std))
        np.testing.assert_allclose(np.asarray(splits[mode][0]), want_x,
                                   atol=1e-5, err_msg=mode)
        np.testing.assert_array_equal(splits[mode][1], offline[mode][1])


def test_wav_native_dataset_geometry(tmp_path):
    wav_dir, meta_dir = _make_wav_tree(tmp_path)
    datasets, splits, stats = make_wav_datasets(
        wav_dir, meta_dir, batch=2, loop_time=1, n_classes=12,
        max_label_length=60)
    assert stats is not None and stats[0].shape[-2:] == (64, 7)
    x, y = next(iter(datasets["train"]))
    assert x.shape == (2, 300, 64, 7)
    assert y.shape == (2, 60, 48)
    # full clips kept for the sliding-window ensemble evaluator
    assert splits["test"][0].shape == (1, 300, 64, 7)
    # eval batches = whole clips
    xe, _ = next(iter(datasets["test"]))
    assert xe.shape[0] == 1  # 60 label frames -> 1 window per clip
    # label content survived the pipeline (class one-hot at annotated frames)
    lab = splits["train"][1][0]
    assert lab[2].reshape(4, 12)[0, 2] == 1.0


def test_features_from_wavs_label_passthrough(tmp_path):
    wav_dir, meta_dir = _make_wav_tree(tmp_path, folds=(1,))
    from seld_tpu.data.loader import load_wav_clips
    wavs, labels = load_wav_clips(wav_dir, meta_dir, "train", n_classes=12,
                                  max_label_length=20)
    x, y = features_from_wavs(wavs, labels, max_label_length=20)
    assert x.shape == (1, 100, 64, 7)
    assert y.shape == (1, 20, 48)


def _write_mic_tree(root, folds=(1, 1, 5, 6), seconds=1.0):
    rng = np.random.RandomState(11)
    mic_dir = root / "mic_dev"
    os.makedirs(mic_dir)
    for i, fold in enumerate(folds):
        name = f"fold{fold}_room1_mix{i:03d}"
        _write_wav(mic_dir / f"{name}.wav",
                   rng.randn(int(SR * seconds), 4) * 0.05)
    return str(mic_dir)


def test_wav_native_mic_matches_offline_path(tmp_path):
    """--wav_mode mic: the 10-channel GCC-PHAT stack built on device must
    equal the offline per-clip extraction + train-split normalization
    (reference feature_extractor.py:196-214)."""
    import jax.numpy as jnp
    _, meta_dir = _make_wav_tree(tmp_path)
    mic_dir = _write_mic_tree(tmp_path)

    splits, stats = wav_feature_splits(
        mic_dir, meta_dir, mode="mic", n_classes=12, max_label_length=50)
    assert splits["train"][0].shape[-1] == 10
    assert stats[0].shape[-2:] == (64, 10)

    from seld_tpu.data.loader import load_wav_clips
    offline = {}
    for mode in ("train", "val", "test"):
        wavs, labels = load_wav_clips(mic_dir, meta_dir, mode, n_classes=12,
                                      max_label_length=50)
        fs = []
        for wav, lab in zip(wavs, labels):
            f = np.asarray(extract_features(jnp.asarray(wav), sample_rate=SR,
                                            mode="mic", n_fft=1024,
                                            win_length=960, hop_length=480))
            f, _ = preprocess_features_labels(f, np.asarray(lab),
                                              max_label_length=50)
            fs.append(f)
        offline[mode] = np.stack(fs)
    mean, std = calculate_statistics(offline["train"].reshape(-1, 64, 10))
    for mode in ("train", "val", "test"):
        want = np.asarray(apply_normalizer(offline[mode], mean, std))
        np.testing.assert_allclose(np.asarray(splits[mode][0]), want,
                                   atol=1e-5, err_msg=mode)


def test_wav_native_joint_17ch(tmp_path):
    """--from_wav --use_both: joint 17-channel splits == separately
    normalized FOA and MIC stacks concatenated on channels — exactly
    load_joint_seldnet_data's offline layout (train.py:178-208)."""
    from seld_tpu.data.wav_pipeline import joint_wav_feature_splits
    wav_dir, meta_dir = _make_wav_tree(tmp_path)
    mic_dir = _write_mic_tree(tmp_path)

    splits, stats = joint_wav_feature_splits(
        wav_dir, mic_dir, meta_dir, n_classes=12, max_label_length=50)
    assert splits["train"][0].shape[-1] == 17
    assert stats[0].shape[-2:] == (64, 17)

    foa_splits, _ = wav_feature_splits(wav_dir, meta_dir, mode="foa",
                                       n_classes=12, max_label_length=50)
    mic_splits, _ = wav_feature_splits(mic_dir, meta_dir, mode="mic",
                                       n_classes=12, max_label_length=50)
    for mode in ("train", "val", "test"):
        want = np.concatenate([np.asarray(foa_splits[mode][0]),
                               np.asarray(mic_splits[mode][0])], axis=-1)
        np.testing.assert_allclose(np.asarray(splits[mode][0]), want,
                                   atol=1e-6, err_msg=mode)
        np.testing.assert_array_equal(splits[mode][1], foa_splits[mode][1])


def test_make_wav_datasets_joint_geometry(tmp_path):
    from seld_tpu.data.wav_pipeline import make_wav_datasets
    wav_dir, meta_dir = _make_wav_tree(tmp_path)
    mic_dir = _write_mic_tree(tmp_path)
    datasets, splits, stats = make_wav_datasets(
        wav_dir, meta_dir, mic_dir=mic_dir, batch=2, loop_time=1,
        n_classes=12, max_label_length=60)
    x, y = next(iter(datasets["train"]))
    assert x.shape == (2, 300, 64, 17)
    assert y.shape == (2, 60, 48)
    assert stats[0].shape[-2:] == (64, 17)


def test_joint_rejects_diverging_clip_sets(tmp_path):
    """foa_dev {a,b} vs mic_dev {a,c}: counts match, so a bare count check
    would pair b's FOA features with c's MIC features — the joint builder
    must reject on the clip-stem divergence instead."""
    from seld_tpu.data.wav_pipeline import joint_wav_feature_splits
    wav_dir, meta_dir = _make_wav_tree(tmp_path, folds=(1, 1, 5, 6))
    mic_dir = _write_mic_tree(tmp_path, folds=(1, 1, 5, 6))
    old = os.path.join(mic_dir, "fold1_room1_mix001.wav")
    new = os.path.join(mic_dir, "fold1_room1_mix999.wav")
    os.rename(old, new)
    with open(os.path.join(tmp_path, "metadata_dev",
                           "fold1_room1_mix999.csv"), "w") as f:
        f.write("2,3,0,45,-10\n")
    with pytest.raises(ValueError, match="diverge"):
        joint_wav_feature_splits(wav_dir, mic_dir, meta_dir, n_classes=12,
                                 max_label_length=50)

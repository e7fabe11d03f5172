"""Golden tests for the feature front-end.

STFT is validated against torch.stft (the exact primitive the reference's
torchaudio call wraps, feature_extractor.py:153-173); the mel filterbank
against an independently-written HTK construction; FOA-IV/GCC against
straightforward numpy re-derivations of the defining formulas.
"""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from seld_tpu.ops import (
    stft,
    complex_spec,
    extract_features,
    foa_intensity_vectors,
    gcc_features,
    mel_filterbank,
    amplitude_to_db,
    extract_labels,
    preprocess_features_labels,
    calculate_statistics,
    apply_normalizer,
)
from seld_tpu.ops.mel import hz_to_mel, mel_to_hz


RNG = np.random.RandomState(42)


def _torch_stft(x, n_fft, hop, win):
    return torch.stft(
        torch.from_numpy(x),
        n_fft=n_fft,
        hop_length=hop,
        win_length=win,
        window=torch.hann_window(win),
        center=True,
        pad_mode="reflect",
        normalized=False,
        return_complex=True,
    ).numpy()  # [..., freq, time]


@pytest.mark.parametrize("method", ["fft", "matmul"])
@pytest.mark.parametrize("n_fft,win,hop", [(1024, 960, 480), (512, 512, 256)])
def test_stft_matches_torch(method, n_fft, win, hop):
    x = RNG.randn(2, 9600).astype(np.float32)
    ours = stft(jnp.asarray(x), n_fft=n_fft, win_length=win, hop_length=hop,
                method=method)
    ours = np.swapaxes(np.asarray(ours), -1, -2)  # [chan, freq, time]
    ref = _torch_stft(x, n_fft, hop, win)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-4)


def test_complex_spec_orientation():
    x = RNG.randn(4, 4800).astype(np.float32)
    spec = complex_spec(jnp.asarray(x), n_fft=1024, win_length=960,
                        hop_length=480, method="fft")
    assert spec.shape == (4, 513, 11)  # [chan, freq, time]


def test_mel_filterbank_htk_independent():
    """Compare against a from-scratch HTK fbank built with a different method."""
    n_freqs, n_mels, sr = 513, 64, 24000
    fb = np.asarray(mel_filterbank(n_freqs, n_mels, sr))

    # independent construction: explicit triangle per filter
    freqs = np.linspace(0, sr / 2, n_freqs)
    mel_pts = np.linspace(0.0, 2595.0 * np.log10(1 + (sr / 2) / 700.0), n_mels + 2)
    hz_pts = 700.0 * (10 ** (mel_pts / 2595.0) - 1)
    expected = np.zeros((n_freqs, n_mels))
    for m in range(n_mels):
        lo, c, hi = hz_pts[m], hz_pts[m + 1], hz_pts[m + 2]
        rising = (freqs - lo) / (c - lo)
        falling = (hi - freqs) / (hi - c)
        expected[:, m] = np.clip(np.minimum(rising, falling), 0, None)

    np.testing.assert_allclose(fb, expected, atol=1e-5)


def test_mel_scale_round_trip():
    f = np.array([0.0, 700.0, 1000.0, 12000.0])
    np.testing.assert_allclose(mel_to_hz(hz_to_mel(f)), f, rtol=1e-10)
    assert hz_to_mel(700.0) == pytest.approx(2595.0 * np.log10(2.0))


def test_amplitude_to_db_top_db_floor():
    x = jnp.asarray(np.array([1.0, 1e-4, 1e-20]))
    db = np.asarray(amplitude_to_db(x, top_db=80.0))
    assert db[0] == pytest.approx(0.0)
    assert db[1] == pytest.approx(-40.0)
    assert db[2] == pytest.approx(-80.0)  # floored at max - 80


def test_foa_intensity_vectors_formula():
    spec = (RNG.randn(4, 16, 5) + 1j * RNG.randn(4, 16, 5)).astype(np.complex64)
    iv = np.asarray(foa_intensity_vectors(jnp.asarray(spec)))
    w = np.conj(spec[0])
    raw = np.stack([np.real(w * spec[3]), np.real(w * spec[1]),
                    np.real(w * spec[2])])
    norm = np.maximum(np.linalg.norm(raw, axis=0), 1e-8)
    np.testing.assert_allclose(iv, raw / norm, atol=1e-5)
    # unit norm everywhere (up to eps flooring)
    np.testing.assert_allclose(np.linalg.norm(iv, axis=0), 1.0, atol=1e-4)


def test_gcc_features_matches_torch_irfft():
    n_fft = 64
    spec = (RNG.randn(4, n_fft // 2 + 1, 7)
            + 1j * RNG.randn(4, n_fft // 2 + 1, 7)).astype(np.complex64)
    n_mels = 16
    ours = np.asarray(gcc_features(jnp.asarray(spec), n_mels=n_mels))
    assert ours.shape == (6, n_mels, 7)

    idx = 0
    for m in range(4):
        for n in range(m + 1, 4):
            r = np.conj(spec[m]) * spec[n]
            cc = torch.fft.irfft(torch.from_numpy(np.exp(1j * np.angle(r))),
                                 dim=0).numpy()
            cc = np.concatenate([cc[-n_mels // 2:], cc[: (n_mels + 1) // 2]], axis=0)
            np.testing.assert_allclose(ours[idx], cc, atol=1e-4)
            idx += 1


@pytest.mark.parametrize("mode,chans", [("foa", 7), ("mic", 10)])
def test_extract_features_shapes(mode, chans):
    wav = jnp.zeros((4, 24000))  # 1 s at 24 kHz
    feats = extract_features(wav, mode=mode, method="fft")
    assert feats.shape == (51, 64, chans)  # ceil(24000/480)+1 frames
    assert np.all(np.isfinite(np.asarray(feats)))


def test_extract_labels(tmp_path):
    csv = tmp_path / "fold1_mix001.csv"
    csv.write_text("10,3,0,90,0\n10,5,0,0,90\n25,3,0,-90,0\n")
    labels = extract_labels(str(csv), n_classes=14)
    assert labels.shape == (26, 56)
    frame10 = labels[10].reshape(4, 14)
    assert frame10[0, 3] == 1.0 and frame10[0, 5] == 1.0
    # class 3 at azi 90: x=0, y=1, z=0
    np.testing.assert_allclose(frame10[1:, 3], [0.0, 1.0, 0.0], atol=1e-7)
    # class 5 at ele 90: z=1
    np.testing.assert_allclose(frame10[1:, 5], [0.0, 0.0, 1.0], atol=1e-7)
    assert labels[11].sum() == 0


def test_preprocess_pad_and_crop():
    f = np.ones((100, 64, 7), np.float32)
    l = np.ones((20, 56), np.float32)
    f2, l2 = preprocess_features_labels(f, l)
    assert f2.shape == (3000, 64, 7) and l2.shape == (600, 56)
    assert f2[100:].sum() == 0 and l2[20:].sum() == 0

    f3, l3 = preprocess_features_labels(np.ones((4000, 64, 7), np.float32),
                                        np.ones((700, 56), np.float32))
    assert f3.shape == (3000, 64, 7) and l3.shape == (600, 56)


def test_normalizer_round_trip():
    feats = RNG.randn(500, 64, 7).astype(np.float32) * 3 + 5
    mean, std = calculate_statistics(feats)
    normed = apply_normalizer(feats, mean, std)
    assert abs(normed.mean()) < 1e-4
    assert abs(normed.std() - 1.0) < 1e-3


def test_salsa_lite_features():
    from seld_tpu.ops.features import salsa_lite_features
    rng2 = np.random.RandomState(9)
    spec = (rng2.randn(4, 513, 11) + 1j * rng2.randn(4, 513, 11)
            ).astype(np.complex64)
    out = np.asarray(salsa_lite_features(jnp.asarray(spec)))
    assert out.shape == (11, 513, 7)  # 4 log-power + 3 NIPD
    assert np.isfinite(out).all()
    # NIPD channels vanish above the aliasing frequency
    freqs = np.arange(513) * (24000 / 1024)
    hi = freqs > 9000
    assert np.abs(out[:, hi, 4:]).max() == 0.0
    assert np.abs(out[:, ~hi, 4:]).sum() > 0


def test_gcc_silent_frame_matches_reference_semantics():
    """Zero cross-spectrum bins must give unit phase (angle(0)=0 ->
    exp(0)=1 -> a delta at lag 0), like the reference's
    exp(1j*angle(R)) (feature_extractor.py:210) — not zeros."""
    from seld_tpu.ops.features import gcc_features
    spec = jnp.zeros((2, 17, 3), jnp.complex64)  # digital silence
    gcc = np.asarray(gcc_features(spec, n_mels=8))
    assert gcc.shape == (1, 8, 3)
    # irfft of all-ones phase = delta at lag 0 (centered at index n_mels//2)
    assert abs(gcc[0, 4, 0] - 1.0) < 1e-5
    np.testing.assert_allclose(np.delete(gcc[0, :, 0], 4), 0.0, atol=1e-5)


def test_salsa_lite_masks_low_and_aliased_bins():
    """NIPD is zeroed below 50 Hz (the 1/f scale near DC would emit ~55x
    outliers for DC-offset pairs) and above the aliasing limit."""
    from seld_tpu.ops.features import salsa_lite_features
    rng = np.random.RandomState(0)
    spec = jnp.asarray(rng.randn(4, 65, 6) + 1j * rng.randn(4, 65, 6),
                       jnp.complex64)
    out = np.asarray(salsa_lite_features(spec, sample_rate=24000, n_fft=128))
    nipd = out[..., 4:]                      # [time, freq, M-1]
    freqs = np.arange(65) * (24000 / 128)
    np.testing.assert_allclose(nipd[:, freqs < 50, :], 0.0)
    np.testing.assert_allclose(nipd[:, freqs > 9000, :], 0.0)
    assert np.abs(nipd[:, (freqs >= 50) & (freqs <= 4000), :]).max() > 0


@pytest.mark.parametrize("mode", ["foa", "mic"])
def test_extract_features_clips_matches_per_clip(mode):
    """The batched (vmapped, chunked, shape-bucketed) front-end must equal
    the per-clip dispatch exactly, across mixed lengths and chunk tails."""
    import jax.numpy as jnp
    from seld_tpu.ops import extract_features, extract_features_clips

    rng = np.random.RandomState(7)
    # 5 clips: 3 of one length, 2 of another -> two buckets; chunk_size=2
    # exercises a full chunk + a tail in the first bucket
    wavs = [rng.randn(4, 4800).astype(np.float32) for _ in range(3)]
    wavs += [rng.randn(4, 6240).astype(np.float32) for _ in range(2)]
    order = [3, 0, 4, 1, 2]  # interleave buckets to test order restoration
    wavs = [wavs[i] for i in order]

    batched = extract_features_clips(wavs, chunk_size=2, sample_rate=24000,
                                     mode=mode, n_fft=512, win_length=480,
                                     hop_length=240)
    for w, got in zip(wavs, batched):
        want = np.asarray(extract_features(jnp.asarray(w), sample_rate=24000,
                                           mode=mode, n_fft=512,
                                           win_length=480, hop_length=240))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_extract_features_int16_pcm_feed_exact():
    """Integer PCM input (the on-disk wav format, shipped to the device at
    half the bytes) must produce bit-identical features to the host-scaled
    float path: the front-end's on-device int/2^(bits-1) conversion is the
    same float32 op as load_wav_clips' host conversion."""
    import jax.numpy as jnp
    from seld_tpu.ops import extract_features

    rng = np.random.RandomState(11)
    pcm = (rng.randn(4, 4800) * 8000).astype(np.int16)
    as_float = pcm.astype(np.float32) / 32768.0

    kw = dict(sample_rate=24000, n_fft=512, win_length=480, hop_length=240)
    got = np.asarray(extract_features(jnp.asarray(pcm), **kw))
    want = np.asarray(extract_features(jnp.asarray(as_float), **kw))
    np.testing.assert_array_equal(got, want)

    pcm32 = (pcm.astype(np.int64) << 16).astype(np.int32)  # same samples
    got32 = np.asarray(extract_features(jnp.asarray(pcm32), **kw))
    np.testing.assert_array_equal(got32, want)


def test_extract_features_clips_mixed_pcm_widths():
    """Same-length int16 and int32 clips must land in different vmap
    buckets: stacking them together would promote int16 -> int32 WITHOUT
    rescaling, making those clips' features ~2^16 too small (mixed-width
    wav dirs are legal in load_wav_clips)."""
    import jax.numpy as jnp
    from seld_tpu.ops import extract_features
    from seld_tpu.ops.features import extract_features_clips

    rng = np.random.RandomState(12)
    pcm16 = (rng.randn(4, 4800) * 8000).astype(np.int16)
    pcm32 = (rng.randn(4, 4800) * 5e8).astype(np.int32)

    kw = dict(sample_rate=24000, n_fft=512, win_length=480, hop_length=240)
    out = extract_features_clips([pcm16, pcm32, pcm16], chunk_size=8, **kw)
    # oracle: homogeneous-dtype batched calls (bit-identical bucket path;
    # single-clip extract_features differs by vmap reduction-order noise)
    want16 = extract_features_clips([pcm16, pcm16], chunk_size=8, **kw)
    want32 = extract_features_clips([pcm32], chunk_size=8, **kw)
    np.testing.assert_array_equal(out[0], want16[0])
    np.testing.assert_array_equal(out[1], want32[0])
    np.testing.assert_array_equal(out[2], want16[1])
    # and the scale is right (the bug made int16 features ~2^16 too small)
    single16 = np.asarray(extract_features(jnp.asarray(pcm16), **kw))
    np.testing.assert_allclose(out[0], single16, atol=1e-4)

"""Streaming inference (seld_tpu/inference/streaming.py): the incremental
engine must reproduce the offline trunk-once fast path frame for frame."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from seld_tpu.config import get_model_config
from seld_tpu.models import build_model
from seld_tpu.inference import ensemble_outputs
from seld_tpu.inference.streaming import StreamingSELD, measure_trunk_halo


@pytest.fixture(scope="module")
def ss5_small():
    cfg = get_model_config("SS5", search_paths=[])
    cfg["n_classes"] = 12
    m = build_model("conv_temporal", (50, 16, 7), cfg)
    v = m.init({"params": jax.random.PRNGKey(0)},
               jnp.zeros((2, 50, 16, 7)), train=False)
    return m, v


@pytest.mark.heavy
def test_streaming_matches_offline_fast_path(ss5_small):
    """Push a 200-frame clip in ragged pieces; the concatenated emitted
    frames must equal ensemble_outputs(fast=True) on the full clip."""
    m, v = ss5_small
    x = np.random.RandomState(2).randn(200, 16, 7).astype(np.float32)

    off = ensemble_outputs(m.apply, v, [jnp.asarray(x)], win_size=50,
                           step_size=5, batch_size=8, fast=True)
    off_sed, off_doa = np.asarray(off[0][0]), np.asarray(off[0][1])

    sp = StreamingSELD(m.apply, v, feat_shape=(16, 7), win_size=50,
                       step_size=5, time_down=5, chunk=4)
    got = []
    for lo in range(0, 200, 33):  # ragged pushes exercise host buffering
        got.extend(sp.push(x[lo:lo + 33]))
    got.extend(sp.finalize())

    assert len(got) == off_sed.shape[0] == 40
    sed = np.stack([s for s, _ in got])
    doa = np.stack([d for _, d in got])
    np.testing.assert_allclose(sed, off_sed, atol=1e-5)
    np.testing.assert_allclose(doa, off_doa, atol=1e-5)


@pytest.mark.heavy
def test_streaming_reset_reuses_jit(ss5_small):
    """reset() starts a new clip with warm caches; a second different clip
    must also match offline."""
    m, v = ss5_small
    sp = StreamingSELD(m.apply, v, feat_shape=(16, 7), win_size=50,
                       step_size=5, time_down=5, chunk=5, halo=4)
    for seed in (3, 4):
        x = np.random.RandomState(seed).randn(100, 16, 7).astype(np.float32)
        got = list(sp.push(x)) + list(sp.finalize())
        off = ensemble_outputs(m.apply, v, [jnp.asarray(x)], win_size=50,
                               step_size=5, batch_size=8, fast=True)
        np.testing.assert_allclose(np.stack([s for s, _ in got]),
                                   np.asarray(off[0][0]), atol=1e-5)
        sp.reset()


def test_streaming_rejects_bad_geometry(ss5_small):
    m, v = ss5_small
    with pytest.raises(ValueError, match="step_size == time_down"):
        StreamingSELD(m.apply, v, feat_shape=(16, 7), win_size=50,
                      step_size=10, time_down=5, halo=4)


@pytest.mark.heavy
def test_measure_trunk_halo_is_small_and_sufficient(ss5_small):
    """SS5's trunk (7x7 stem + 3x3 mother convs at pooled rate) has a small
    edge receptive field; the probe must find a halo that makes interior
    frames shift-invariant."""
    m, v = ss5_small
    halo = measure_trunk_halo(m.apply, v, (16, 7), time_down=5)
    assert 1 <= halo <= 12

    # sufficiency: trunk of a suffix matches the full trunk beyond `halo`
    x = np.random.RandomState(5).randn(300, 16, 7).astype(np.float32)
    full = np.asarray(m.apply(v, jnp.asarray(x)[None], train=False,
                              stage="trunk")[0])
    suf = np.asarray(m.apply(v, jnp.asarray(x[50:])[None], train=False,
                             stage="trunk")[0])
    np.testing.assert_allclose(full[10 + halo:], suf[halo:], atol=1e-5)


@pytest.mark.heavy
def test_streaming_short_clip_fallback(ss5_small):
    """A clip shorter than the bootstrap length (l_f) takes the eager
    two-call path and must still match offline."""
    m, v = ss5_small
    sp = StreamingSELD(m.apply, v, feat_shape=(16, 7), win_size=50,
                       step_size=5, time_down=5, chunk=20, halo=8)
    assert sp.l_f == (20 + 16) * 5  # 180 > the 100-frame clip below
    x = np.random.RandomState(6).randn(100, 16, 7).astype(np.float32)
    assert sp.push(x) == []  # below bootstrap threshold: nothing emitted
    got = sp.finalize()
    off = ensemble_outputs(m.apply, v, [jnp.asarray(x)], win_size=50,
                           step_size=5, batch_size=8, fast=True)
    assert len(got) == np.asarray(off[0][0]).shape[0]
    np.testing.assert_allclose(np.stack([s for s, _ in got]),
                               np.asarray(off[0][0]), atol=1e-5)
    np.testing.assert_allclose(np.stack([d for _, d in got]),
                               np.asarray(off[0][1]), atol=1e-5)


@pytest.mark.heavy
def test_streaming_frontend_matches_offline_extraction():
    """StreamingFrontEnd in ragged pushes == extract_features on the whole
    clip (centered STFT + reflect padding, frame for frame)."""
    from seld_tpu.ops.features import extract_features
    from seld_tpu.inference.streaming_wav import StreamingFrontEnd

    kw = dict(mode="foa", sample_rate=24000, n_mels=16, n_fft=512,
              win_length=480, hop_length=240)
    rng = np.random.RandomState(7)
    wav = (rng.randn(4, 48000) * 0.1).astype(np.float32)
    want = np.asarray(extract_features(jnp.asarray(wav), **kw))

    fe = StreamingFrontEnd(chunk_frames=20, **kw)
    got = []
    for lo in range(0, 48000, 7000):  # ragged sample pushes
        got.extend(fe.push(wav[:, lo:lo + 7000]))
    got.extend(fe.finalize())
    got = np.stack(got)
    assert got.shape == want.shape == (201, 16, 7)
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.heavy
def test_streaming_wav_end_to_end_matches_offline(ss5_small):
    """Raw audio through StreamingSELDWav == offline extract + crop +
    normalize + ensemble_outputs(fast=True)."""
    from seld_tpu.ops.features import extract_features
    from seld_tpu.inference.streaming_wav import StreamingSELDWav

    m, v = ss5_small
    kw = dict(mode="foa", sample_rate=24000, n_mels=16, n_fft=512,
              win_length=480, hop_length=240)
    rng = np.random.RandomState(8)
    wav = (rng.randn(4, 48000) * 0.1).astype(np.float32)

    feats = np.asarray(extract_features(jnp.asarray(wav), **kw))[:200]
    mean = feats.mean(axis=0)
    std = feats.std(axis=0) + 1e-6
    norm = (feats - mean) / std
    off = ensemble_outputs(m.apply, v, [jnp.asarray(norm)], win_size=50,
                           step_size=5, batch_size=8, fast=True)

    sw = StreamingSELDWav(m.apply, v, normalizer=(mean, std),
                          win_size=50, time_down=5, chunk=4, halo=4,
                          n_mels=16, n_fft=512, win_length=480,
                          hop_length=240)
    got = []
    for lo in range(0, 48000, 9600):
        got.extend(sw.push(wav[:, lo:lo + 9600]))
    got.extend(sw.finalize())
    assert len(got) == np.asarray(off[0][0]).shape[0] == 40
    np.testing.assert_allclose(np.stack([s for s, _ in got]),
                               np.asarray(off[0][0]), atol=1e-4)
    np.testing.assert_allclose(np.stack([d for _, d in got]),
                               np.asarray(off[0][1]), atol=1e-4)


@pytest.mark.heavy
def test_multi_stream_lockstep_matches_independent(ss5_small):
    """n_streams=3: one dispatch per tick must reproduce three independent
    single-stream runs (equivalently, the offline fast path per stream)."""
    m, v = ss5_small
    rng = np.random.RandomState(9)
    clips = rng.randn(3, 150, 16, 7).astype(np.float32)

    sp = StreamingSELD(m.apply, v, feat_shape=(16, 7), win_size=50,
                       step_size=5, time_down=5, chunk=4, halo=4,
                       n_streams=3)
    got = []
    for lo in range(0, 150, 40):
        got.extend(sp.push(clips[:, lo:lo + 40]))
    got.extend(sp.finalize())
    assert len(got) == 30
    sed = np.stack([s for s, _ in got], axis=1)   # [3, 30, C]
    doa = np.stack([d for _, d in got], axis=1)

    for k in range(3):
        off = ensemble_outputs(m.apply, v, [jnp.asarray(clips[k])],
                               win_size=50, step_size=5, batch_size=8,
                               fast=True)
        np.testing.assert_allclose(sed[k], np.asarray(off[0][0]),
                                   atol=1e-5, err_msg=f"stream {k}")
        np.testing.assert_allclose(doa[k], np.asarray(off[0][1]),
                                   atol=1e-5, err_msg=f"stream {k}")


def test_streaming_finalize_error_is_retryable(ss5_small):
    """A finalize() that fails validation must not latch _finalized: the
    retry should raise again (or succeed after a fix), never silently
    return []."""
    m, v = ss5_small
    sp = StreamingSELD(m.apply, v, feat_shape=(16, 7), win_size=50,
                       step_size=5, time_down=5, chunk=4, halo=4)
    sp.push(np.zeros((52, 16, 7), np.float32))  # not a multiple of 5
    with pytest.raises(ValueError, match="multiple of"):
        sp.finalize()
    sp.push(np.zeros((3, 16, 7), np.float32))   # pad to 55
    assert len(sp.finalize()) == 11             # 55 // 5 frames


def test_frontend_rejects_unsigned_and_casts_blocks():
    from seld_tpu.inference.streaming_wav import StreamingFrontEnd
    fe = StreamingFrontEnd(n_mels=16, n_fft=512, win_length=480,
                           hop_length=240, chunk_frames=20)
    with pytest.raises(ValueError, match="unsigned"):
        fe.push(np.zeros((4, 100), np.uint8))
    fe.push(np.zeros((4, 100), np.float64))
    fe.push(np.zeros((4, 100), np.float32))
    assert fe._pending.dtype == np.float32
    with pytest.raises(ValueError, match="no samples|multiple"):
        StreamingFrontEnd(n_mels=16).finalize()


def test_frontend_double_finalize_is_a_clean_error():
    from seld_tpu.inference.streaming_wav import StreamingFrontEnd
    fe = StreamingFrontEnd(n_mels=16, n_fft=512, win_length=480,
                           hop_length=240, chunk_frames=20)
    fe.push(np.random.RandomState(0).randn(4, 2400).astype(np.float32))
    assert len(fe.finalize()) == 11  # 2400 // 240 + 1
    with pytest.raises(ValueError, match="already finalized"):
        fe.finalize()
    fe.reset()
    fe.push(np.zeros((4, 2400), np.float32))
    assert len(fe.finalize()) == 11  # reset() starts a new clip

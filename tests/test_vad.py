"""VAD vertical tests: features, windowing round trip, trainer, NAS space."""
import pytest

pytestmark = pytest.mark.heavy  # compile-heavy: excluded from `make test-fast`
import jax.numpy as jnp
import numpy as np
import pytest

from seld_tpu.data import vad as V
from seld_tpu.train.vad import VADTrainer, binary_auc, binary_metrics


def test_preprocess_window():
    np.testing.assert_array_equal(
        V.preprocess_window([-19, -10, -1, 0, 1, 10, 19]),
        [0, 9, 18, 19, 20, 29, 38])
    np.testing.assert_array_equal(V.preprocess_window(3), [0, 1, 2])


def test_vad_features_shape_and_range():
    rng = np.random.RandomState(0)
    wav = jnp.asarray(rng.randn(1, 16000).astype(np.float32))
    feats = V.vad_features_from_wav(wav)
    assert feats.shape[1:] == (80, 1)
    f = np.asarray(feats)
    assert f.min() >= 0.0 and f.max() <= 1.0 + 1e-6


def test_vad_labels_from_samples():
    labels = np.zeros(4096, np.float32)
    labels[:2048] = 1.0
    framed = V.vad_labels_from_samples(labels, n_fft=1024)
    assert framed.shape == (7,)
    assert framed[0] == 1.0 and framed[-1] == 0.0


def test_seq_windows_round_trip():
    window = [-19, -10, -1, 0, 1, 10, 19]
    seq = np.random.RandomState(1).rand(100).astype(np.float32)
    w = V.seq_to_windows(seq, window)
    assert w.shape == (62, 7)
    back = V.windows_to_seq(w[..., None], window)[..., 0]
    # interior frames are perfectly reconstructed (averaging identical values)
    np.testing.assert_allclose(back[19:-19], seq[19:81], atol=1e-5)


def test_vad_dataset_iteration():
    rng = np.random.RandomState(0)
    pairs = [(rng.rand(100, 16, 1).astype(np.float32),
              (rng.rand(100) > 0.5).astype(np.float32)) for _ in range(3)]
    ds = V.VadDataset(pairs, batch_size=2, train=True, n_repeat=2)
    batches = list(ds)
    assert sum(b[0].shape[0] for b in batches) == 6
    assert batches[0][0].shape[1:] == (7, 16, 1)
    ds_eval = V.VadDataset(pairs, batch_size=64, train=False)
    eval_batches = list(ds_eval)
    assert sum(b[0].shape[0] for b in eval_batches) == 3 * 62


def test_binary_auc():
    labels = np.asarray([0, 0, 1, 1])
    assert binary_auc(labels, np.asarray([0.1, 0.2, 0.8, 0.9])) == 1.0
    assert binary_auc(labels, np.asarray([0.9, 0.8, 0.2, 0.1])) == 0.0
    assert binary_auc(labels, np.asarray([0.5, 0.5, 0.5, 0.5])) == 0.5
    m = binary_metrics(labels, np.asarray([0.1, 0.9, 0.8, 0.9]))
    assert m["recall"] == 1.0 and m["precision"] == pytest.approx(2 / 3)


def _vad_pairs(rng, n=4, t=120, mels=16):
    pairs = []
    for _ in range(n):
        label = (rng.rand(t) > 0.5).astype(np.float32)
        # features correlate with the label -> learnable
        feat = rng.rand(t, mels, 1).astype(np.float32) * 0.1
        feat += label[:, None, None] * 0.5
        pairs.append((feat, label))
    return pairs


def test_vad_trainer_learns():
    rng = np.random.RandomState(0)
    pairs = _vad_pairs(rng)
    window = [-2, -1, 0, 1, 2]
    train = V.VadDataset(pairs, window=window, batch_size=16, n_repeat=20)
    val = V.VadDataset(pairs, window=window, batch_size=64, train=False)

    cfg = {"flatten": True, "last_unit": 5,
           "BLOCK0": "simple_dense_block",
           "BLOCK0_ARGS": {"units": [32], "dense_activation": "relu"}}
    trainer = VADTrainer(cfg, input_shape=(5, 16, 1), lr=3e-3)
    result = trainer.fit(train, val, epochs=5, verbose=False)
    assert result["best_val_auc"] > 0.8

    seq_metrics = trainer.evaluate_sequences(pairs, window)
    assert seq_metrics["auc"] > 0.8


def test_spectro_temporal_vad_trainer_step():
    rng = np.random.RandomState(0)
    pairs = _vad_pairs(rng, n=2)
    window = [-2, -1, 0, 1, 2]
    train = V.VadDataset(pairs, window=window, batch_size=8, n_repeat=2)
    cfg = {"T": 2, "Nc": 4, "Np": 16, "Nt": 8, "H": 2}
    trainer = VADTrainer(cfg, input_shape=(5, 16, 1),
                         model_name="spectro_temporal_attention_based_VAD",
                         lr=1e-3)
    result = trainer.fit(train, epochs=1, verbose=False)
    assert np.isfinite(result["history"][0]["loss"])


def test_vad_nas_sampler():
    from seld_tpu.nas.sampler import vad_architecture_sampler, sample_constraint
    space_2d = {"mother_stage": {
        "depth": [1], "filters0": [0, 4], "filters1": [4, 8], "filters2": [0],
        "kernel_size0": [0], "kernel_size1": [3], "kernel_size2": [0],
        "connect0": [[1]], "connect1": [[1, 0]], "connect2": [[1, 0, 1]],
        "strides": [(1, 1), (1, 2)]}}
    space_1d = {"simple_dense_block": {"units": [[16], [32]],
                                       "dense_activation": [None, "relu"]}}
    from seld_tpu.nas.sampler import mother_stage_postprocess
    cfg = vad_architecture_sampler(
        space_2d, space_1d, n_blocks=2, input_shape=(7, 16, 1),
        default_config={"flatten": False, "last_unit": 7},
        config_postprocess_fn=mother_stage_postprocess,
        constraint=sample_constraint(min_flops=None, max_flops=10_000_000))
    assert "BLOCK0" in cfg and "SED" not in cfg


def test_vad_rehearsal_synthesizer_labels_track_energy():
    # scripts/vad_rehearsal.py: bursts must be audible above the floor and
    # the sample-level labels must cover exactly the burst regions
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "vad_rehearsal", os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts", "vad_rehearsal.py"))
    vr = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(vr)

    rng = np.random.default_rng(0)
    wav, label = vr.synthesize_clip(rng, seconds=4.0, sr=16000)
    assert wav.shape == label.shape == (64000,)
    assert wav.dtype == np.float32
    assert set(np.unique(label)) <= {0.0, 1.0}
    assert 0.05 < label.mean() < 0.95  # both classes present
    speech_rms = np.sqrt(np.mean(wav[label == 1] ** 2))
    floor_rms = np.sqrt(np.mean(wav[label == 0] ** 2))
    assert speech_rms > 3 * floor_rms
    assert np.max(np.abs(wav)) <= 0.99 + 1e-6

    # PCM wav round trip through the shipped reader
    import tempfile
    from scripts.extract_features import read_wav
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "x.wav")
        vr.write_wav(path, wav, 16000)
        back, sr = read_wav(path)
    assert sr == 16000 and back.shape == (1, 64000)
    # int16 write truncates toward zero and the read scale is 1/32768,
    # so the round-trip error bound is ~2 LSB
    np.testing.assert_allclose(back[0], wav, atol=2.0 / 32768)

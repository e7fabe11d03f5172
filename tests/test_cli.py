"""CLI smoke tests: drive the real script entry points in subprocesses."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_dataset(root, n_classes=12, folds=(1, 5, 6), label_frames=120):
    rng = np.random.RandomState(0)
    feat_dir = os.path.join(root, "DCASE2021/feat_label/foa_dev_norm")
    lab_dir = os.path.join(root, "DCASE2021/feat_label/foa_dev_label")
    gt_test = os.path.join(root, "metadata_dev/dev-test")
    gt_val = os.path.join(root, "metadata_dev/dev-val")
    for d in (feat_dir, lab_dir, gt_test, gt_val):
        os.makedirs(d, exist_ok=True)
    for fold in folds:
        name = f"fold{fold}_room1_mix001"
        np.save(os.path.join(feat_dir, name + ".npy"),
                rng.randn(label_frames * 5, 64, 7).astype(np.float32))
        lab = np.zeros((label_frames, 4 * n_classes), np.float32)
        lab[5:20, 2] = 1.0
        lab[5:20, n_classes + 2] = 1.0
        np.save(os.path.join(lab_dir, name + ".npy"), lab)
        if fold in (5, 6):
            gt_dir = gt_test if fold == 6 else gt_val
            with open(os.path.join(gt_dir, name + ".csv"), "w") as f:
                for fr in range(5, 20):
                    f.write(f"{fr},2,0,0,0\n")


def _run(args, cwd):
    env = dict(os.environ, SELD_PLATFORM="cpu", PYTHONPATH=REPO,
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    return subprocess.run([sys.executable] + args, cwd=cwd, env=env,
                          capture_output=True, text=True, timeout=900)


@pytest.mark.slow
def test_train_cli_end_to_end(tmp_path):
    _make_dataset(str(tmp_path / "data"))
    with open(tmp_path / "mc.json", "w") as f:
        json.dump({
            "FIRST": "simple_conv_block",
            "FIRST_ARGS": {"filters": [8], "pool_size": [[5, 4]]},
            "SECOND": "bidirectional_GRU_block", "SECOND_ARGS": {"units": [8]},
            "SED": "simple_dense_block", "SED_ARGS": {"units": [8]},
            "DOA": "simple_dense_block", "DOA_ARGS": {"units": [8]},
        }, f)
    os.makedirs(tmp_path / "model_config", exist_ok=True)
    os.replace(tmp_path / "mc.json", tmp_path / "model_config" / "tiny.json")

    r = _run([os.path.join(REPO, "scripts/train.py"), "--name", "smoke",
              "--model", "seldnet", "--model_config", "tiny",
              "--abspath", "./data", "--ans_path", "./data/metadata_dev/",
              "--batch", "4", "--epoch", "1", "--loop_time", "1"],
             cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "best val seld score" in r.stdout
    ckpts = list((tmp_path / "saved_model").rglob("bestscore_*"))
    assert ckpts, r.stdout[-2000:]

    # fine-tune journey: warm-start a NEW run from the produced weights
    # (--init_from takes any weights-only-loadable checkpoint, e.g. the
    # import_tf_weights.py output)
    ckpt = str(min(p for p in ckpts if not str(p).endswith(".meta.json")))
    r2 = _run([os.path.join(REPO, "scripts/train.py"), "--name", "finetune",
               "--model", "seldnet", "--model_config", "tiny",
               "--abspath", "./data", "--ans_path", "./data/metadata_dev/",
               "--batch", "4", "--epoch", "1", "--loop_time", "1",
               "--init_from", ckpt],
              cwd=str(tmp_path))
    assert r2.returncode == 0, r2.stderr[-2000:]
    assert f"initialized params from {ckpt}" in r2.stdout
    assert "best val seld score" in r2.stdout

    # --resume + --init_from is ambiguous and must refuse loudly
    r3 = _run([os.path.join(REPO, "scripts/train.py"), "--name", "finetune",
               "--model", "seldnet", "--model_config", "tiny",
               "--abspath", "./data", "--batch", "4", "--epoch", "2",
               "--resume", "--init_from", ckpt],
              cwd=str(tmp_path))
    assert r3.returncode != 0
    assert "pick one" in r3.stderr


@pytest.mark.slow
def test_train_cli_device_data(tmp_path):
    """--device_data: the train split is staged in HBM once and batches are
    gathered on device (8-way virtual mesh -> batch must divide 8)."""
    _make_dataset(str(tmp_path / "data"), label_frames=480)  # 8 train windows
    os.makedirs(tmp_path / "model_config", exist_ok=True)
    with open(tmp_path / "model_config" / "tiny.json", "w") as f:
        json.dump({
            "FIRST": "simple_conv_block",
            "FIRST_ARGS": {"filters": [8], "pool_size": [[5, 4]]},
            "SECOND": "simple_dense_block", "SECOND_ARGS": {"units": [8]},
            "SED": "simple_dense_block", "SED_ARGS": {"units": [8]},
            "DOA": "simple_dense_block", "DOA_ARGS": {"units": [8]},
        }, f)
    r = _run([os.path.join(REPO, "scripts/train.py"), "--name", "devdata",
              "--model", "seldnet", "--model_config", "tiny",
              "--abspath", "./data", "--ans_path", "./data/metadata_dev/",
              "--batch", "8", "--epoch", "2", "--loop_time", "1",
              "--device_data"],
             cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "device_data: staged 8 windows" in r.stdout, r.stdout[-2000:]
    assert "best val seld score" in r.stdout
    assert list((tmp_path / "saved_model").rglob("bestscore_*"))


@pytest.mark.slow
def test_bench_runs_on_cpu(tmp_path):
    env = dict(os.environ, PYTHONPATH=REPO, BENCH_BATCH="4", BENCH_STEPS="2",
               JAX_PLATFORMS="cpu")
    # force cpu inside bench via jax config (env alone is overridden by axon)
    code = ("import jax; jax.config.update('jax_platforms','cpu');"
            "import runpy; runpy.run_path('" + os.path.join(REPO, "bench.py")
            + "', run_name='__main__')")
    r = subprocess.run([sys.executable, "-c", code], env=env, cwd=str(tmp_path),
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    rec = json.loads(line)
    assert rec["metric"] == "ss5_train_throughput"
    assert rec["value"] > 0 and "vs_baseline" in rec


@pytest.mark.slow
def test_extract_features_cli_matches_ondevice(tmp_path):
    """Offline .npy extraction == on-device extract_features (wav round trip
    through int16 quantization)."""
    import wave

    rng = np.random.RandomState(0)
    os.makedirs(tmp_path / "wavs")
    os.makedirs(tmp_path / "meta")
    data = (rng.randn(24000, 4) * 0.05 * 32767).astype(np.int16)
    with wave.open(str(tmp_path / "wavs" / "fold1_room1_mix001.wav"), "wb") as w:
        w.setnchannels(4)
        w.setsampwidth(2)
        w.setframerate(24000)
        w.writeframes(data.tobytes())
    (tmp_path / "meta" / "fold1_room1_mix001.csv").write_text("3,2,0,45,-10\n")

    r = _run([os.path.join(REPO, "scripts/extract_features.py"),
              "--mode", "foa", "--wav_dir", "wavs", "--label_dir", "meta",
              "--out_dir", "feat", "--label_out_dir", "feat_label"],
             cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]

    feats = np.load(tmp_path / "feat" / "fold1_room1_mix001.npy")
    labels = np.load(tmp_path / "feat_label" / "fold1_room1_mix001.npy")
    assert feats.shape == (3000, 64, 7)
    assert labels.shape == (600, 56)
    assert labels[3].reshape(4, 14)[0, 2] == 1.0

    # parity with the in-process on-device path
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from seld_tpu.ops import extract_features
    wav = data.astype(np.float32).T / 32768.0
    expected = np.asarray(extract_features(
        jnp.asarray(wav), sample_rate=24000, mode="foa",
        n_fft=1024, win_length=960, hop_length=480))
    np.testing.assert_allclose(feats[:expected.shape[0]], expected, atol=1e-3)
    assert feats[expected.shape[0]:].sum() == 0  # zero padding to 3000


@pytest.mark.slow
def test_smoke_script(tmp_path):
    r = _run([os.path.join(REPO, "scripts/smoke.py")], cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "SMOKE PASS" in r.stdout


def _make_wav_dataset(root, seconds=6.0, n_classes=12, mic=False):
    """Raw foa_dev (+ optional mic_dev) wavs + metadata CSVs for the
    --from_wav journeys."""
    import wave as wave_mod
    rng = np.random.RandomState(1)
    wav_dir = os.path.join(root, "foa_dev")
    mic_dir = os.path.join(root, "mic_dev")
    meta_dir = os.path.join(root, "metadata_dev")
    os.makedirs(wav_dir, exist_ok=True)
    os.makedirs(meta_dir, exist_ok=True)
    if mic:
        os.makedirs(mic_dir, exist_ok=True)
    for fold in (1, 5, 6):
        name = f"fold{fold}_room1_mix001"
        dirs = [wav_dir, mic_dir] if mic else [wav_dir]
        for d in dirs:
            data = (rng.randn(int(24000 * seconds), 4) * 0.05 * 32767)
            data = np.clip(data, -32767, 32767).astype(np.int16)
            with wave_mod.open(os.path.join(d, name + ".wav"), "wb") as w:
                w.setnchannels(4)
                w.setsampwidth(2)
                w.setframerate(24000)
                w.writeframes(data.tobytes())
        with open(os.path.join(meta_dir, name + ".csv"), "w") as f:
            for fr in range(5, 20):
                f.write(f"{fr},2,0,0,0\n")
    return wav_dir, meta_dir


@pytest.mark.slow
def test_train_cli_from_wav(tmp_path):
    """--from_wav: raw wavs through the on-device front-end, features never
    written to disk (VERDICT round-1 item 3; SURVEY §7 steps 2-3)."""
    _make_wav_dataset(str(tmp_path / "data"))
    os.makedirs(tmp_path / "model_config", exist_ok=True)
    with open(tmp_path / "model_config" / "tiny.json", "w") as f:
        json.dump({
            "FIRST": "simple_conv_block",
            "FIRST_ARGS": {"filters": [8], "pool_size": [[5, 4]]},
            "SECOND": "bidirectional_GRU_block", "SECOND_ARGS": {"units": [8]},
            "SED": "simple_dense_block", "SED_ARGS": {"units": [8]},
            "DOA": "simple_dense_block", "DOA_ARGS": {"units": [8]},
        }, f)

    r = _run([os.path.join(REPO, "scripts/train.py"), "--name", "wavsmoke",
              "--model", "seldnet", "--model_config", "tiny",
              "--abspath", "./data", "--ans_path", "./data/metadata_dev/",
              "--from_wav", "--batch", "4", "--epoch", "1",
              "--loop_time", "1"],
             cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "best val seld score" in r.stdout
    # features never touch disk: no .npy anywhere under the data root
    data_npys = list((tmp_path / "data").rglob("*.npy"))
    assert not data_npys, data_npys


@pytest.mark.slow
def test_train_cli_from_wav_joint_acs(tmp_path):
    """--from_wav --use_both --use_acs: the 17-channel joint FOA+MIC journey
    built ENTIRELY from raw wavs (both modalities through the batched
    on-device front-end) with acs_aug channel swaps in the train step —
    the round-2 VERDICT Missing #2 acceptance run."""
    _make_wav_dataset(str(tmp_path / "data"), mic=True)
    os.makedirs(tmp_path / "model_config", exist_ok=True)
    with open(tmp_path / "model_config" / "tiny.json", "w") as f:
        json.dump({
            "FIRST": "simple_conv_block",
            "FIRST_ARGS": {"filters": [8], "pool_size": [[5, 4]]},
            "SECOND": "bidirectional_GRU_block", "SECOND_ARGS": {"units": [8]},
            "SED": "simple_dense_block", "SED_ARGS": {"units": [8]},
            "DOA": "simple_dense_block", "DOA_ARGS": {"units": [8]},
        }, f)

    r = _run([os.path.join(REPO, "scripts/train.py"), "--name", "jointwav",
              "--model", "seldnet", "--model_config", "tiny",
              "--abspath", "./data", "--ans_path", "./data/metadata_dev/",
              "--from_wav", "--use_both", "--use_acs", "--batch", "4",
              "--epoch", "1", "--loop_time", "1"],
             cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "best val seld score" in r.stdout
    # the 17-channel normalizer was persisted for serving
    norm = np.load(next((tmp_path / "saved_model").rglob("normalizer.npz")))
    assert norm["mean"].shape[-2:] == (64, 17)
    # features never touch disk
    assert not list((tmp_path / "data").rglob("*.npy"))


@pytest.mark.slow
def test_train_cli_from_wav_mic_mode(tmp_path):
    """--from_wav --wav_mode mic: 10-channel GCC-PHAT training straight
    from mic_dev wavs."""
    _make_wav_dataset(str(tmp_path / "data"), mic=True)
    os.makedirs(tmp_path / "model_config", exist_ok=True)
    with open(tmp_path / "model_config" / "tiny.json", "w") as f:
        json.dump({
            "FIRST": "simple_conv_block",
            "FIRST_ARGS": {"filters": [8], "pool_size": [[5, 4]]},
            "SECOND": "bidirectional_GRU_block", "SECOND_ARGS": {"units": [8]},
            "SED": "simple_dense_block", "SED_ARGS": {"units": [8]},
            "DOA": "simple_dense_block", "DOA_ARGS": {"units": [8]},
        }, f)
    r = _run([os.path.join(REPO, "scripts/train.py"), "--name", "micwav",
              "--model", "seldnet", "--model_config", "tiny",
              "--abspath", "./data", "--ans_path", "./data/metadata_dev/",
              "--from_wav", "--wav_mode", "mic", "--batch", "4",
              "--epoch", "1", "--loop_time", "1"],
             cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "best val seld score" in r.stdout
    norm = np.load(next((tmp_path / "saved_model").rglob("normalizer.npz")))
    assert norm["mean"].shape[-2:] == (64, 10)


@pytest.mark.slow
def test_train_cli_use_both_joint_foa_mic(tmp_path):
    """--use_both --use_acs: the 17-channel joint FOA+MIC journey with
    acs_aug channel swaps (reference train.py get_both_dataset, :178-208)."""
    root = str(tmp_path / "data")
    rng = np.random.RandomState(0)
    gt_dir = os.path.join(root, "metadata_dev/dev-test")
    os.makedirs(gt_dir, exist_ok=True)
    for kind, n_ch in (("foa", 7), ("mic", 10)):
        feat_dir = os.path.join(root, f"DCASE2021/feat_label/{kind}_dev_norm")
        lab_dir = os.path.join(root, f"DCASE2021/feat_label/{kind}_dev_label")
        os.makedirs(feat_dir, exist_ok=True)
        os.makedirs(lab_dir, exist_ok=True)
        for fold in (1, 5, 6):
            name = f"fold{fold}_room1_mix001"
            np.save(os.path.join(feat_dir, name + ".npy"),
                    rng.randn(600, 64, n_ch).astype(np.float32))
            lab = np.zeros((120, 48), np.float32)
            lab[5:20, 2] = 1.0
            lab[5:20, 12 + 2] = 1.0
            np.save(os.path.join(lab_dir, name + ".npy"), lab)
    with open(os.path.join(gt_dir, "fold6_room1_mix001.csv"), "w") as f:
        for fr in range(5, 20):
            f.write(f"{fr},2,0,0,0\n")

    os.makedirs(tmp_path / "model_config", exist_ok=True)
    with open(tmp_path / "model_config" / "tiny.json", "w") as f:
        json.dump({
            "FIRST": "simple_conv_block",
            "FIRST_ARGS": {"filters": [8], "pool_size": [[5, 4]]},
            "SECOND": "bidirectional_GRU_block", "SECOND_ARGS": {"units": [8]},
            "SED": "simple_dense_block", "SED_ARGS": {"units": [8]},
            "DOA": "simple_dense_block", "DOA_ARGS": {"units": [8]},
        }, f)

    r = _run([os.path.join(REPO, "scripts/train.py"), "--name", "bothsmoke",
              "--model", "seldnet", "--model_config", "tiny",
              "--abspath", "./data", "--ans_path", "./data/metadata_dev/",
              "--use_both", "--use_acs", "--batch", "4", "--epoch", "1",
              "--loop_time", "1"],
             cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "best val seld score" in r.stdout


@pytest.mark.slow
def test_make_answer_cli_after_training(tmp_path):
    """The full user journey: train 1 epoch via the train CLI, then run the
    ensemble/submission CLI on the produced orbax checkpoint."""
    _make_dataset(str(tmp_path / "data"))
    os.makedirs(tmp_path / "model_config", exist_ok=True)
    with open(tmp_path / "model_config" / "tiny.json", "w") as f:
        json.dump({
            "FIRST": "simple_conv_block",
            "FIRST_ARGS": {"filters": [8], "pool_size": [[5, 4]]},
            "SECOND": "bidirectional_GRU_block", "SECOND_ARGS": {"units": [8]},
            "SED": "simple_dense_block", "SED_ARGS": {"units": [8]},
            "DOA": "simple_dense_block", "DOA_ARGS": {"units": [8]},
        }, f)

    r = _run([os.path.join(REPO, "scripts/train.py"), "--name", "mk",
              "--model", "seldnet", "--model_config", "tiny",
              "--abspath", "./data", "--ans_path", "./data/metadata_dev/",
              "--batch", "4", "--epoch", "1", "--loop_time", "1"],
             cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    ckpts = sorted((tmp_path / "saved_model").rglob("bestscore_*"))
    assert ckpts

    # per-class threshold search on the val split (reference search_best.py)
    r = _run([os.path.join(REPO, "scripts/search_best.py"),
              "--data", "./data/DCASE2021/feat_label",
              "--model", "seldnet",
              "--models", f"model_config/tiny.json:{ckpts[0]}",
              "--ans_path", "./data/metadata_dev/",
              "--output_path", "./sb_out", "--batch", "16"],
             cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    line = [l for l in r.stdout.splitlines()
            if l.startswith("THRESHOLDS_JSON:")]
    assert line, r.stdout[-2000:]
    table = json.loads(line[0].split(":", 1)[1])["thresholds"]
    assert len(table) == 12

    r = _run([os.path.join(REPO, "scripts/make_answer.py"),
              "--data", "./data/DCASE2021/feat_label", "--mode", "test",
              "--model", "seldnet",
              "--models", f"model_config/tiny.json:{ckpts[0]}",
              "--ans_path", "./data/metadata_dev/",
              "--thresholds", ",".join(f"{t:.2f}" for t in table),
              "--output_path", "./answer", "--batch", "16"],
             cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "SELD:" in r.stdout, r.stdout[-2000:]
    csvs = list((tmp_path / "answer").rglob("*.csv"))
    assert csvs, r.stdout[-2000:]

    # --quantize int8 scores the fake-quantized deployment (what a
    # --quantize exported artifact computes) through the same journey
    r = _run([os.path.join(REPO, "scripts/make_answer.py"),
              "--data", "./data/DCASE2021/feat_label", "--mode", "test",
              "--model", "seldnet",
              "--models", f"model_config/tiny.json:{ckpts[0]}",
              "--ans_path", "./data/metadata_dev/",
              "--quantize", "int8",
              "--output_path", "./answer_q", "--batch", "16"],
             cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "SELD:" in r.stdout, r.stdout[-2000:]


@pytest.mark.slow
def test_vad_cli_chain(tmp_path):
    """prepare_vad -> nas_search --task vad: the VAD vertical end to end
    from raw wavs to a resumable NAS results JSON."""
    import wave as wave_mod
    rng = np.random.RandomState(2)
    wav_dir = tmp_path / "wavs"
    lab_dir = tmp_path / "labels"
    os.makedirs(wav_dir)
    os.makedirs(lab_dir)
    n = 16000 * 2
    for i in range(3):
        data = (rng.randn(n) * 0.05 * 32767).astype(np.int16)
        with wave_mod.open(str(wav_dir / f"clip{i}.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(data.tobytes())
        np.save(lab_dir / f"clip{i}.npy",
                (rng.rand(n) < 0.5).astype(np.float32))

    r = _run([os.path.join(REPO, "scripts/prepare_vad.py"),
              "--wav_dir", str(wav_dir), "--label_dir", str(lab_dir),
              "--out", "pairs.npz"], cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    assert (tmp_path / "pairs.npz").exists()

    r = _run([os.path.join(REPO, "scripts/nas_search.py"), "--task", "vad",
              "--name", "vadnas", "--vad_pairs", "pairs.npz",
              "--n_samples", "1", "--batch_size", "16", "--n_repeat", "1",
              "--min_flops", "1", "--max_flops", "100000000"],
             cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    with open(tmp_path / "vadnas.json") as f:
        res = json.load(f)
    assert "000" in res and "val_auc" in res["000"]["perf"]


@pytest.mark.slow
def test_predict_wav_cli_serving_journey(tmp_path):
    """The deployment journey: train --from_wav (persists the normalizer),
    then predict_wav on new raw wavs — no offline features anywhere."""
    _make_wav_dataset(str(tmp_path / "data"))
    os.makedirs(tmp_path / "model_config", exist_ok=True)
    with open(tmp_path / "model_config" / "tiny.json", "w") as f:
        json.dump({
            "FIRST": "simple_conv_block",
            "FIRST_ARGS": {"filters": [8], "pool_size": [[5, 4]]},
            "SECOND": "bidirectional_GRU_block", "SECOND_ARGS": {"units": [8]},
            "SED": "simple_dense_block", "SED_ARGS": {"units": [8]},
            "DOA": "simple_dense_block", "DOA_ARGS": {"units": [8]},
        }, f)

    r = _run([os.path.join(REPO, "scripts/train.py"), "--name", "serve",
              "--model", "seldnet", "--model_config", "tiny",
              "--abspath", "./data", "--ans_path", "./data/metadata_dev/",
              "--from_wav", "--batch", "4", "--epoch", "1",
              "--loop_time", "1"],
             cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    # the run name is composed ({model}_{config}_{loss}_{name})
    norms = sorted((tmp_path / "saved_model").rglob("normalizer.npz"))
    assert norms, list((tmp_path / "saved_model").rglob("*"))
    norm = norms[0]
    ckpts = sorted(norm.parent.glob("bestscore_*"))
    assert ckpts

    r = _run([os.path.join(REPO, "scripts/predict_wav.py"),
              "--wav_dir", "./data/foa_dev", "--model", "seldnet",
              "--model_config", "model_config/tiny.json",
              "--ckpt", str(ckpts[0]), "--normalizer", str(norm),
              "--output_path", "./answer", "--batch", "16",
              "--thresholds", "0.5"],
             cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    csvs = sorted((tmp_path / "answer").glob("*.csv"))
    assert len(csvs) == 3, r.stdout[-1000:]


@pytest.mark.slow
def test_train_cli_bf16(tmp_path):
    """--bf16: bf16 compute with fp32 master params AND a bf16 dataset feed
    (features cast once at build, SeldDataset feature_dtype) through the
    full CLI journey incl. the ensemble eval + SWA finalization."""
    _make_dataset(str(tmp_path / "data"))
    os.makedirs(tmp_path / "model_config", exist_ok=True)
    with open(tmp_path / "model_config" / "tiny.json", "w") as f:
        json.dump({
            "FIRST": "simple_conv_block",
            "FIRST_ARGS": {"filters": [8], "pool_size": [[5, 4]]},
            "SECOND": "bidirectional_GRU_block", "SECOND_ARGS": {"units": [8]},
            "SED": "simple_dense_block", "SED_ARGS": {"units": [8]},
            "DOA": "simple_dense_block", "DOA_ARGS": {"units": [8]},
        }, f)
    r = _run([os.path.join(REPO, "scripts/train.py"), "--name", "bf16smoke",
              "--model", "seldnet", "--model_config", "tiny",
              "--abspath", "./data", "--ans_path", "./data/metadata_dev/",
              "--bf16", "--batch", "4", "--epoch", "2", "--loop_time", "1",
              "--swa_start", "1", "--swa_freq", "1"],
             cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "best val seld score" in r.stdout
    assert "SWA seld score" in r.stdout
    score = float(r.stdout.split("best val seld score:")[1].split()[0])
    assert np.isfinite(score)


@pytest.mark.slow
def test_predict_wav_stream_matches_fast(tmp_path):
    """predict_wav --stream (live-serving engine, 1 s pushes) writes the
    same predictions as --fast (offline trunk-once) from the same
    checkpoint on the same wavs."""
    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp
    from seld_tpu.models import build_model

    _make_wav_dataset(str(tmp_path / "data"), seconds=12.0)
    cfg = {
        "filters": 4, "first_kernel_size": 7, "first_pool_size": [5, 4],
        "n_classes": 12,
        "BLOCK0": "bidirectional_GRU_block", "BLOCK0_ARGS": {"units": [8]},
        "SED": "simple_dense_block", "SED_ARGS": {"units": [8]},
        "DOA": "simple_dense_block", "DOA_ARGS": {"units": [8]},
    }
    os.makedirs(tmp_path / "model_config", exist_ok=True)
    with open(tmp_path / "model_config" / "ct.json", "w") as f:
        json.dump(cfg, f)

    model = build_model("conv_temporal", (300, 64, 7), cfg)
    v = model.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((1, 300, 64, 7)), train=False)
    ckpt_dir = tmp_path / "ckpt" / "bestscore_1.0"
    ocp.PyTreeCheckpointer().save(
        str(ckpt_dir), {"params": v["params"],
                        "batch_stats": v["batch_stats"]})
    np.savez(tmp_path / "normalizer.npz",
             mean=np.zeros((64, 7), np.float32),
             std=np.ones((64, 7), np.float32))

    common = ["--wav_dir", "./data/foa_dev", "--model", "conv_temporal",
              "--model_config", "model_config/ct.json",
              "--ckpt", str(ckpt_dir), "--normalizer", "./normalizer.npz",
              "--thresholds", "0.5", "--max_label_frames", "120"]
    r = _run([os.path.join(REPO, "scripts/predict_wav.py"), *common,
              "--fast", "--output_path", "./ans_fast"], cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    r = _run([os.path.join(REPO, "scripts/predict_wav.py"), *common,
              "--stream", "--output_path", "./ans_stream"],
             cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]

    fast_csvs = sorted((tmp_path / "ans_fast").glob("*.csv"))
    stream_csvs = sorted((tmp_path / "ans_stream").glob("*.csv"))
    assert len(fast_csvs) == len(stream_csvs) == 3
    for a, b in zip(fast_csvs, stream_csvs):
        fa = [l.split(",") for l in a.read_text().splitlines()]
        fb = [l.split(",") for l in b.read_text().splitlines()]
        assert len(fa) == len(fb), (a.name, len(fa), len(fb))
        for ra, rb in zip(fa, fb):
            assert ra[:2] == rb[:2], (a.name, ra, rb)  # frame, class
            np.testing.assert_allclose([float(x) for x in ra[2:]],
                                       [float(x) for x in rb[2:]],
                                       atol=1e-3, err_msg=a.name)

"""Tests for the config subsystem (registry, zoo, versioned store, CLI)."""
import argparse
import json
import os

import pytest

from seld_tpu.config import get_config, get_model_config, load_config
from seld_tpu.config.zoo import MODEL_CONFIGS, dump_model_configs
from seld_tpu.config.params import get_param


def _ns(**kw):
    return argparse.Namespace(**kw)


def test_zoo_has_all_reference_configs():
    for name in ["seldnet", "seldnet_v1", "SS5", "conv_temp", "dense_gru",
                 "resnet_gru", "resnet50_gru", "xception_gru", "Condseldnet"]:
        cfg = get_model_config(name, search_paths=[])
        assert isinstance(cfg, dict) and cfg


def test_zoo_returns_copies():
    a = get_model_config("SS5", search_paths=[])
    a["BLOCK0_ARGS"]["depth"] = 999
    b = get_model_config("SS5", search_paths=[])
    assert b["BLOCK0_ARGS"]["depth"] == 2


def test_model_config_disk_overrides_zoo(tmp_path):
    custom = {"FIRST": "identity_block", "FIRST_ARGS": {}}
    with open(tmp_path / "SS5.json", "w") as f:
        json.dump(custom, f)
    cfg = get_model_config("SS5", search_paths=[str(tmp_path)])
    assert cfg == custom


def test_get_config_saves_v0(tmp_path):
    cfg = get_config("run", _ns(lr=0.001, batch=256, gpus="-1"), path=str(tmp_path))
    assert cfg.name == "run_v_0"
    saved = load_config(str(tmp_path), "run_v_0")
    assert saved["lr"] == 0.001
    assert "gpus" not in saved


def test_get_config_dedupes_identical(tmp_path):
    get_config("run", _ns(lr=0.001), path=str(tmp_path))
    cfg2 = get_config("run", _ns(lr=0.001), path=str(tmp_path))
    assert cfg2.name == "run_v_0"
    assert len(os.listdir(tmp_path)) == 1


def test_get_config_versions_differing(tmp_path):
    get_config("run", _ns(lr=0.001), path=str(tmp_path))
    cfg2 = get_config("run", _ns(lr=0.01), path=str(tmp_path))
    assert cfg2.name == "run_v_1"
    assert len(os.listdir(tmp_path)) == 2


def test_get_config_load_mode(tmp_path):
    get_config("run", _ns(lr=0.001, batch=8), path=str(tmp_path))
    loaded = get_config("run_v_0", _ns(lr=0.5), path=str(tmp_path), mode="lo")
    assert loaded.lr == 0.001
    # 'l' overwrites loaded values with current flags (may bump version)
    merged = get_config("run_v_0", _ns(lr=0.5), path=str(tmp_path), mode="l")
    assert merged.lr == 0.5


def test_get_config_o_alone_raises(tmp_path):
    with pytest.raises(ValueError):
        get_config("run", _ns(lr=1.0), path=str(tmp_path), mode="o")


def test_get_param_composes_name(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    config, model_config = get_param(
        ["--name", "exp1", "--model", "seldnet"], config_path=str(tmp_path / "config"))
    assert config.name.startswith("seldnet_seldnet_MSE_exp1")
    assert model_config["FIRST"] == "simple_conv_block"
    assert config.batch == 256
    assert config.loss_weight == "1,1000"


def test_dump_model_configs_round_trip(tmp_path):
    dump_model_configs(str(tmp_path))
    for name in MODEL_CONFIGS:
        on_disk = get_model_config(name, search_paths=[str(tmp_path)])
        assert on_disk == json.loads(json.dumps(MODEL_CONFIGS[name]))


def test_resume_flag_dedupes_to_existing_version(tmp_path):
    """--resume must not bump the config version (else the checkpoint dir
    changes and resume can never find it — a reference landmine)."""
    get_config("run", _ns(lr=0.001, resume=False), path=str(tmp_path))
    cfg = get_config("run", _ns(lr=0.001, resume=True), path=str(tmp_path))
    assert cfg.name == "run_v_0"
    assert len(os.listdir(tmp_path)) == 1


def test_version_store_past_ten(tmp_path):
    """Versions must be compared numerically: lexicographic sort puts _v_9
    after _v_10, which stuck the store at version 10 and silently
    overwrote it for every later distinct config."""
    import argparse
    from seld_tpu.config.manager import get_config

    for i in range(12):
        cfg = argparse.Namespace(name="runA", lr=1e-3 * (i + 1),
                                 resume=False)
        out = get_config("runA", cfg, path=str(tmp_path))
    assert out.name == "runA_v_11"
    import json
    with open(tmp_path / "runA_v_10.json") as f:
        assert json.load(f)["lr"] == 1e-3 * 11  # not overwritten by v_11


def test_swa_flag_parses_on_off_and_rejects_garbage(tmp_path, monkeypatch):
    """--swa takes on/off (plus true/false/1/0); anything else must be a
    clean argparse usage error (SystemExit), not a raw KeyError — argparse
    only converts ValueError/TypeError from `type` callables."""
    monkeypatch.chdir(tmp_path)
    for val, want in (("on", True), ("off", False), ("TRUE", True),
                      ("0", False)):
        config, _ = get_param(
            ["--name", f"s_{val}", "--swa", val],
            config_path=str(tmp_path / "config"))
        assert config.swa is want, val
    with pytest.raises(SystemExit):
        get_param(["--name", "bad", "--swa", "yes"],
                  config_path=str(tmp_path / "config"))

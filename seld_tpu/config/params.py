"""CLI flag parsing for training entry points.

Parity with reference params.py:7-75: the same flag surface (lr/decay/batch/
agc/epoch/loss_weight/mask sizes/acs/tdm/tfm toggles/loop_time/SED loss
choice/DOA loss choice/doa threshold), resolution of `model_config/<name>.json`
(with zoo fallback), the composed run name
`{model}_{model_config}_{doa_loss}_{name}`, and persistence through the
versioned config store.

TPU-specific additions (new flags, default-off so reference commands work
verbatim): --mesh (device-mesh spec, e.g. "data:8"), --bf16 (mixed-precision
compute), --label_smoothing, --swa_start/--swa_freq (trainv2.py:300 defaults).
"""
from __future__ import annotations

import argparse
from typing import Optional, Sequence, Tuple

from seld_tpu.config.manager import get_config
from seld_tpu.config.zoo import get_model_config


def build_parser() -> argparse.ArgumentParser:
    args = argparse.ArgumentParser()

    args.add_argument('--name', type=str, required=True)

    args.add_argument('--gpus', type=str, default='-1')  # accepted, unused on TPU
    args.add_argument('--resume', action='store_true')
    args.add_argument('--abspath', type=str, default='./')
    args.add_argument('--config_mode', type=str, default='')
    args.add_argument('--doa_loss', type=str, default='MSE',
                      choices=['MAE', 'MSE', 'MSLE', 'MMSE'])
    args.add_argument('--model', type=str, default='seldnet')
    args.add_argument('--model_config', type=str, default='')
    args.add_argument('--output_path', type=str, default='./output')
    args.add_argument('--ans_path', type=str, default='./metadata_dev/')

    # training
    args.add_argument('--lr', type=float, default=0.001)
    args.add_argument('--decay', type=float, default=0.5)
    args.add_argument('--batch', type=int, default=256)
    args.add_argument('--agc', type=bool, default=False)
    args.add_argument('--epoch', type=int, default=1000)
    args.add_argument('--loss_weight', type=str, default='1,1000')
    args.add_argument('--lr_patience', type=int, default=80,
                      help='learning rate decay patience for plateau')
    args.add_argument('--patience', type=int, default=100,
                      help='early stop patience')
    args.add_argument('--freq_mask_size', type=int, default=16)
    args.add_argument('--time_mask_size', type=int, default=24)
    args.add_argument('--tfm_period', type=int, default=100)
    args.add_argument('--use_acs', action='store_true')
    args.add_argument('--use_tdm', action='store_true')
    args.add_argument('--use_tfm', action='store_true')
    args.add_argument('--loop_time', type=int, default=5,
                      help='times of train dataset iter for an epoch')
    args.add_argument('--tdm_epoch', type=int, default=2,
                      help='epochs of applying tdm augmentation. If 0, do not use it.')

    # metric
    args.add_argument('--lad_doa_thresh', type=int, default=20)
    args.add_argument('--sed_loss', type=str, default='BCE',
                      choices=['BCE', 'FOCAL'])
    args.add_argument('--focal_g', type=float, default=2)
    args.add_argument('--focal_a', type=float, default=0.25)

    # TPU-native additions
    args.add_argument('--mesh', type=str, default='data:-1',
                      help='device mesh spec "axis:size[,axis:size]"; -1 = all devices')
    args.add_argument('--bf16', action='store_true',
                      help='bfloat16 compute (params stay fp32)')
    args.add_argument('--label_smoothing', type=float, default=0.0)
    args.add_argument('--swa_start', type=int, default=80)
    args.add_argument('--swa_freq', type=int, default=2)

    return args


def get_param(argv: Optional[Sequence[str]] = None,
              config_path: str = './config') -> Tuple[argparse.Namespace, dict]:
    """Parse flags -> (run config namespace, model config dict)."""
    config = build_parser().parse_args(argv)

    if len(config.model_config) == 0:
        config.model_config = config.model
    import os
    config.model_config = os.path.splitext(config.model_config)[0]
    model_config = get_model_config(
        config.model_config,
        search_paths=[os.path.join(config.abspath, 'model_config'), './model_config'],
    )

    config.name = f'{config.model}_{config.model_config}_{config.doa_loss}_{config.name}'
    config = get_config(config.name, config, path=config_path, mode=config.config_mode)
    return config, model_config

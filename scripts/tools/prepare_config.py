"""Derive per-dataset experiment configs from a template experiment
(reference ``scripts/tools/prepare_config.py``): take an experiment file
written for one subject (the template), and for every data file
``base_*.yaml`` of the chosen datasets, emit a config that swaps the
experiment-specific keys (exp_name, parent_cfg, relighting_cfg paths) with
the subject's name substituted.

    python scripts/tools/prepare_config.py --experiments nerf brute \
        --exp-file-template configs/synthetic_human/base_synthetic_jody.yaml
"""
from __future__ import annotations

import argparse
import os
from glob import glob
from os.path import join, splitext

import yaml

EXP_KEYS = ['relighting_cfg', 'exp_name', 'parent_cfg',
            'geometry_mesh', 'geometry_pretrain']


def walk_config(exp: dict, data: dict, exp_name: str, data_name: str,
                exp_keys) -> None:
    """Copy experiment-specific string values into the data config with the
    subject name substituted (reference prepare_config.py:14-22)."""
    for key in exp_keys:
        if key in exp and key in data:
            if isinstance(exp[key], dict) and isinstance(data[key], dict):
                walk_config(exp[key], data[key], exp_name, data_name, exp_keys)
            elif isinstance(exp[key], str) and isinstance(data[key], str):
                data[key] = exp[key].replace(exp_name, data_name)
            else:
                raise NotImplementedError('unsupported config type to replace')


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument('--exp-keys', nargs='+', default=EXP_KEYS)
    ap.add_argument('--experiments', nargs='+', default=['nerf', 'neuralbody', 'brute'])
    ap.add_argument('--datasets', nargs='+', default=['mobile_stage', 'synthetic_human'])
    ap.add_argument('--data-file-prefix', default='base')
    ap.add_argument('--exp-file-template',
                    default='configs/synthetic_human/base_synthetic_jody.yaml')
    ap.add_argument('--configs-root', default='configs')
    a = ap.parse_args()

    for dataset in a.datasets:
        data_files = glob(join(a.configs_root, dataset, f'{a.data_file_prefix}*'))
        for experiment in a.experiments:
            for data_file in data_files:
                exp_file = a.exp_file_template.replace(a.data_file_prefix,
                                                       experiment)
                if not os.path.exists(exp_file):
                    print(f'skip (no template): {exp_file}')
                    continue
                exp_name = '_'.join(splitext(exp_file)[0].split('_')[-2:])
                data_name = '_'.join(splitext(data_file)[0].split('_')[-2:])
                out_file = data_file.replace(a.data_file_prefix, experiment)
                with open(exp_file) as f:
                    exp = yaml.safe_load(f)
                with open(data_file) as f:
                    data = yaml.safe_load(f)
                walk_config(exp, data, exp_name, data_name, a.exp_keys)
                with open(out_file, 'w') as f:
                    yaml.safe_dump(data, f, sort_keys=False)
                print(f'wrote {out_file}')


if __name__ == '__main__':
    main()

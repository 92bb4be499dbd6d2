"""Test-time dispatcher — CLI identical to the reference's ``run.py``:

    python run.py -t {visualize,evaluate,network,dataset} -c cfg.yaml k v ...

Tasks (reference run.py:21-98): dataset (data-only iteration), network
(render-only timing), evaluate (PSNR/SSIM/LPIPS protocol), visualize (write
all enabled Output maps + videos).
"""
from __future__ import annotations

import time

import numpy as np
import tqdm


def run_dataset(cfg):
    from relightableavatar_tpu.data.datasets import make_data_loader
    from relightableavatar_tpu.utils.log import log
    loader = make_data_loader(cfg, is_train=False)
    for i, batch in enumerate(tqdm.tqdm(loader)):
        if i == 0:  # smoke-mode visibility: what a batch actually carries
            shapes = {k: tuple(v.shape) for k, v in batch.items()
                      if hasattr(v, 'shape')}
            log(f'first batch: {shapes}')


def run_network(cfg):
    import jax
    from relightableavatar_tpu.data.datasets import make_data_loader
    from relightableavatar_tpu.models.factory import make_network, make_renderer
    params, mcfg = make_network(cfg)
    renderer = make_renderer(cfg, params, mcfg)
    loader = make_data_loader(cfg, is_train=False)
    net_time = []
    for batch in tqdm.tqdm(loader):
        t0 = time.perf_counter()
        out = renderer.render(batch)
        jax.block_until_ready(out.get('rgb_map', list(out.values())[0]))
        net_time.append(time.perf_counter() - t0)
    if len(net_time) > 1:
        diff = np.asarray(net_time[1:])  # first call includes compile
        print(f'mean render time: {diff.mean():.4f}s, fps: {1.0 / diff.mean():.2f}')


def run_evaluate(cfg):
    from relightableavatar_tpu.data.datasets import make_data_loader
    from relightableavatar_tpu.models.factory import (make_evaluator,
                                                      make_network,
                                                      make_renderer)
    params, mcfg = make_network(cfg)
    renderer = make_renderer(cfg, params, mcfg)
    evaluator = make_evaluator(cfg)
    loader = make_data_loader(cfg, is_train=False)
    for batch in tqdm.tqdm(loader):
        out = renderer.render(batch)
        evaluator.evaluate(out, batch)
    evaluator.summarize()


def run_visualize(cfg):
    from relightableavatar_tpu.data.datasets import make_data_loader
    from relightableavatar_tpu.models.factory import (make_network,
                                                      make_renderer,
                                                      make_visualizer)
    params, mcfg = make_network(cfg)
    renderer = make_renderer(cfg, params, mcfg)
    visualizer = make_visualizer(cfg)
    loader = make_data_loader(cfg, is_train=False)
    for batch in tqdm.tqdm(loader):
        out = renderer.render(batch)
        visualizer.visualize(out, batch)
    visualizer.summarize()


def main():
    from relightableavatar_tpu.config import setup
    from relightableavatar_tpu.utils.log import post_mortem_on_crash
    cfg, args = setup()
    with post_mortem_on_crash():
        globals()['run_' + args.type](cfg)


if __name__ == '__main__':
    main()

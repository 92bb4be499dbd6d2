"""Training driver — CLI identical to the reference's ``train.py``:

    python train.py -c configs/exp.yaml [--test] k v ...

Epoch loop with save/eval cadence and checkpoint resume
(reference train.py:24-85, 114-146).  Data parallelism comes from XLA
sharding inside the jitted train step (no torchrun / NCCL).
"""
from __future__ import annotations

import os


def train(cfg):
    import jax
    from relightableavatar_tpu.data.datasets import make_data_loader
    from relightableavatar_tpu.models.factory import make_evaluator, make_network
    from relightableavatar_tpu.train.checkpoints import load_model, save_model
    from relightableavatar_tpu.train.trainer import Trainer
    from relightableavatar_tpu.utils.log import log

    if not cfg.resume:
        # delete BEFORE make_network: it bootstraps params from
        # trained_model_dir/latest if present (reference net_utils.py:1398-1400
        # semantics — resume=False must mean a cold start)
        import shutil
        if os.path.exists(cfg.trained_model_dir):
            shutil.rmtree(cfg.trained_model_dir)

    params, mcfg = make_network(cfg)
    trainer = Trainer(cfg, params, mcfg)

    begin_epoch = 0
    start_it = 0
    aux = {}
    if cfg.resume:
        state, epoch, aux = load_model(cfg.trained_model_dir,
                                       dict(net=trainer.params,
                                            opt=trainer.opt_state))
        if state is not None:
            trainer.params = state['net']
            trainer.opt_state = state['opt']
            begin_epoch = epoch
            start_it = trainer.load_aux(aux)

    if cfg.dry_run:
        n_params = sum(x.size for x in jax.tree_util.tree_leaves(trainer.params))
        log(f'network parameters: {n_params / 1e6:.2f}M', 'green')
        return

    train_loader = make_data_loader(cfg, is_train=True)
    # fallback epoch = one dataset pass in BATCHES (the infinite loader
    # cycles, so len() alone would make an epoch batch_size passes long)
    ep_iter = cfg.ep_iter if cfg.ep_iter > 0 else max(
        len(train_loader) // int(cfg.train.batch_size), 1)

    # Legacy checkpoints (net+opt only, no aux): reconstruct recorder.step,
    # which drives the iter_step loss-weight anneal (anneal_loss_weight in
    # train/loss.py) and the LOGGED lr — the optimizer's actual lr count is
    # part of opt_state and resumed by load_model itself (ADVICE r3).
    # New checkpoints carry the recorder in aux, restored above exactly.
    if begin_epoch and 'recorder' not in aux:
        # make_lr_schedule uses max(int(cfg.ep_iter), 1); the derivations
        # must agree or the logged lr diverges from the optax schedule
        assert cfg.ep_iter > 0, (
            'resuming a legacy checkpoint with cfg.ep_iter <= 0: the '
            'loader-derived ep_iter would disagree with the lr schedule')
        trainer.recorder.step = begin_epoch * ep_iter
        trainer.recorder.epoch = begin_epoch

    def _save(epoch_done: int, it_in_epoch: int = 0, latest: bool = True):
        save_model(cfg.trained_model_dir,
                   dict(net=trainer.params, opt=trainer.opt_state),
                   epoch_done, latest=latest,
                   aux=trainer.aux_state(it_in_epoch))

    for epoch in range(begin_epoch, cfg.train.epoch):
        train_loader.set_epoch(epoch)
        trainer.train_epoch(train_loader, epoch, ep_iter,
                            start_it=start_it if epoch == begin_epoch else 0,
                            save_cb=lambda it: _save(epoch, it))

        if (epoch + 1) % cfg.save_latest_ep == 0:
            _save(epoch + 1)
        if (epoch + 1) % cfg.save_ep == 0:
            _save(epoch + 1, latest=False)
        if (epoch + 1) % cfg.eval_ep == 0 and not cfg.skip_eval:
            try:
                test_loader = make_data_loader(cfg, is_train=False)
                evaluator = make_evaluator(cfg)
                trainer.val(test_loader, evaluator)
            except Exception as e:  # eval must not kill training (train.py:77-82)
                log(f'eval failed: {e}', 'red')

    trainer.profiler.close()  # flush an in-flight trace (xplane written on stop)
    return trainer


def test(cfg):
    from relightableavatar_tpu.data.datasets import make_data_loader
    from relightableavatar_tpu.models.factory import (make_evaluator,
                                                      make_network,
                                                      make_renderer)
    params, mcfg = make_network(cfg)
    renderer = make_renderer(cfg, params, mcfg)
    evaluator = make_evaluator(cfg)
    loader = make_data_loader(cfg, is_train=False)
    for batch in loader:
        out = renderer.render(batch)
        evaluator.evaluate(out, batch)
    evaluator.summarize()


def main():
    from relightableavatar_tpu.config import setup
    from relightableavatar_tpu.utils.log import post_mortem_on_crash
    cfg, args = setup()
    if cfg.detect_anomaly:
        # reference gates torch.autograd.detect_anomaly (train.py:141-146);
        # the JAX analogue re-runs NaN-producing computations eagerly
        import jax
        jax.config.update('jax_debug_nans', True)
    with post_mortem_on_crash():
        if args.test:
            test(cfg)
        else:
            train(cfg)


if __name__ == '__main__':
    main()

"""CLI: LwD/BFM training recipes (reference train_fitv2_lwd*.py, train.py).

Covers the reference's LwD entry-script matrix with one config-driven
command (the reference ships ~10 near-identical scripts; recipes here
select the train step):

  reflow (default)   random-segment reflow + REPA
                     (train_fitv2_lwd.py:680-790, train.py:328-385)
  --distillation     teacher-trajectory targets from a frozen FiTv2
                     (train_fitv2_lwd.py:212-219, 414-453; needs
                     --teacher-ckpt [+ --teacher-config])
  --multi-scale      per-tier resolution schedule
                     (train_fitv2_lwd_ms.py:240-243, 620-634, 682-886)
  --finetune MODE    frozen-trunk mid-block representation forecasting,
                     MODE in {replace, residual, blend}
                     (train_fitv2_lwd_finetune.py:649-741)
  CIFAR-GAN          the GAN-guided CIFAR recipe lives in
                     examples/train_cifar_gan.py (train_fitv2_lwd_cifar_gan)

Usage:
    python -m fitv2_tpu.cli.train_lwd --cfgdir configs/fitv2_xl_lwd.yaml \
        [--distillation --teacher-ckpt ckpt.safetensors] [--multi-scale]
        [--finetune replace] [--max-steps N] [--output-dir DIR]
"""

from __future__ import annotations

import argparse
import logging


def parse_args(argv=None):
    p = argparse.ArgumentParser(description='LwD/BFM TPU training')
    p.add_argument('--cfgdir', nargs='+', required=True,
                   help='YAML config(s), merged left to right')
    p.add_argument('--output-dir', default=None)
    p.add_argument('--max-steps', type=int, default=None)
    p.add_argument('--seed', type=int, default=None)
    p.add_argument('--resume', action='store_true', default=True)
    p.add_argument('--no-resume', dest='resume', action='store_false')
    # recipe flags (reference train_fitv2_lwd*.py argparse)
    p.add_argument('--distillation', action='store_true',
                   help='distill from a frozen teacher FiTv2 '
                        '(reference --distillation)')
    p.add_argument('--teacher-ckpt', default=None,
                   help='teacher safetensors/bin checkpoint')
    p.add_argument('--teacher-config', nargs='+', default=None,
                   help='teacher network YAML (defaults to '
                        'distillation_network_config in --cfgdir)')
    p.add_argument('--teacher-cfg-scale', type=float, default=0.0,
                   help='CFG scale while rolling the teacher (0 = off)')
    p.add_argument('--multi-scale', action='store_true',
                   help='multi-scale tier training (reference --multi_scale)')
    p.add_argument('--multi-scale-indices', type=int, nargs='+',
                   default=None, help='segment indices starting new tiers '
                                      '(default from config or (2, 7))')
    p.add_argument('--finetune', default=None,
                   choices=['replace', 'residual', 'blend'],
                   help='mid-block forecaster finetuning mode')
    p.add_argument('--repa-weight', type=float, default=None,
                   help='REPA alignment weight (reference 0.5, train.py:383)')
    return p.parse_args(argv)


def _build_teacher_apply(args, cfg):
    """Frozen teacher velocity closure (x, t, batch) -> v."""
    import jax.numpy as jnp

    from fitv2_tpu.ckpt.torch_import import load_torch_state_dict, \
        convert_fit_state_dict
    from fitv2_tpu.utils import config_to_model
    from fitv2_tpu.utils.config import _to_plain, load_config

    if args.teacher_config:
        tcfg = _to_plain(load_config(args.teacher_config))
        net = tcfg['diffusion']['network_config']
    else:
        net = cfg['diffusion'].get('distillation_network_config') \
            or cfg['diffusion']['network_config']
    teacher = config_to_model(net)
    sd = load_torch_state_dict(args.teacher_ckpt)
    params = convert_fit_state_dict(
        sd, depth=teacher.depth, adaln_type=teacher.adaln_type,
        num_heads=teacher.num_heads, rope_layout=teacher.rope_layout)

    scale = args.teacher_cfg_scale

    def teacher_apply(x, t, batch):
        if scale > 0:  # CFG-guided teacher rollout (train_fitv2_lwd.py:430)
            def dup(a):
                return jnp.concatenate([a, a], axis=0)
            y2 = jnp.concatenate([
                batch['label'],
                jnp.full_like(batch['label'], teacher.num_classes)])
            size = batch.get('size')
            out = teacher.apply(
                {'params': params}, dup(x), dup(t), y2, dup(batch['grid']),
                dup(batch['mask']), dup(size) if size is not None else None)
            cond, uncond = jnp.split(out, 2, axis=0)
            return (uncond + scale * (cond - uncond)).astype(jnp.float32)
        v = teacher.apply({'params': params}, x, t, batch['label'],
                          batch['grid'], batch['mask'], batch.get('size'))
        return v.astype(jnp.float32)

    return teacher_apply


def build_trainer(cfg, args):
    from fitv2_tpu.train.lwd_trainer import LwDTrainer, LwDTrainerConfig
    from fitv2_tpu.utils import config_to_model

    model = config_to_model(cfg['diffusion']['network_config'])
    acc = cfg.get('accelerate', {})
    tc = LwDTrainerConfig(
        max_steps=args.max_steps or int(acc.get('max_train_steps', 400_000)),
        learning_rate=float(acc.get('learning_rate', 1e-4)),
        max_grad_norm=float(acc.get('max_grad_norm', 1.0)),
        repa_weight=(args.repa_weight if args.repa_weight is not None
                     else float(acc.get('repa_weight', 0.5))),
        seed=args.seed if args.seed is not None else int(
            acc.get('seed', 42)),
        output_dir=args.output_dir or acc.get('output_dir', 'runs/lwd'),
        checkpointing_steps=int(acc.get('checkpointing_steps', 4000)),
        checkpoints_total_limit=acc.get('checkpoints_total_limit', 4),
        mesh_fsdp=int(acc.get('mesh_fsdp', 1)),
        mesh_tensor=int(acc.get('mesh_tensor', 1)),
    )
    teacher_apply = None
    if args.distillation:
        if not args.teacher_ckpt:
            raise SystemExit('--distillation needs --teacher-ckpt')
        teacher_apply = _build_teacher_apply(args, cfg)
    recipe = 'reflow'
    if args.multi_scale:
        recipe = 'multiscale'
    elif args.finetune:
        recipe = 'finetune'
    ms = tuple(args.multi_scale_indices
               or cfg['diffusion']['network_config'].get('params', {}).get(
                   'multi_scale_indices', (2, 7)))
    return LwDTrainer(model, tc, teacher_apply=teacher_apply,
                      recipe=recipe, finetune_mode=args.finetune or 'replace',
                      multi_scale_indices=ms), tc


def make_batch_iterator(cfg, tc, model):
    """Latent-shard batches shaped for the LwD steps (full square grids)."""
    from fitv2_tpu.data import IN1kLatentDataset, PrefetchLoader, \
        get_train_sampler

    data = cfg.get('data', {}).get('params', {}).get('train', {})
    loader_cfg = data.get('loader', {})
    batch = int(loader_cfg.get('batch_size', 16))
    ds = IN1kLatentDataset(data.get('data_path', ''),
                           target_len=int(data.get('target_len', 256)),
                           random=data.get('random', 'random'))
    stream = get_train_sampler(len(ds), batch, tc.max_steps, 0, seed=tc.seed)
    return PrefetchLoader(ds, stream, batch_size=batch,
                          num_workers=int(loader_cfg.get('num_workers', 4)),
                          seed=tc.seed)


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    args = parse_args(argv)
    from fitv2_tpu.utils.config import _to_plain, load_config
    cfg = _to_plain(load_config(args.cfgdir))
    trainer, tc = build_trainer(cfg, args)
    batches = make_batch_iterator(cfg, tc, trainer.model)
    trainer.train(batches, max_steps=args.max_steps, resume=args.resume)


if __name__ == '__main__':
    main()

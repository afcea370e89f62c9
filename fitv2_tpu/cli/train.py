"""CLI: FiTv2 flow-matching training (reference train_fitv2.py parity).

Usage (mirrors tools/train_fitv2_xl.sh):
    python -m fitv2_tpu.cli.train --cfgdir configs/fitv2_xl.yaml \
        [--resume] [--output-dir runs/xl]

The YAML uses the reference's section layout: ``diffusion`` (network_config
target/params + transport), ``data`` and ``accelerate`` (optimizer/ckpt)
(configs/fitv2/config_fitv2_xl.yaml structure).
"""

from __future__ import annotations

import argparse
import logging


def parse_args(argv=None):
    p = argparse.ArgumentParser(description='FiTv2 TPU training')
    p.add_argument('--cfgdir', nargs='+', required=True,
                   help='YAML config(s), merged left to right')
    p.add_argument('--output-dir', default=None)
    p.add_argument('--resume', action='store_true', default=True)
    p.add_argument('--no-resume', dest='resume', action='store_false')
    p.add_argument('--max-steps', type=int, default=None)
    p.add_argument('--seed', type=int, default=None)
    p.add_argument('--came', action='store_true',
                   help='train with the CAME optimizer '
                        '(reference train_fitv2.py --came)')
    return p.parse_args(argv)


def build_trainer(cfg, args):
    import jax

    from fitv2_tpu.flow import create_transport
    from fitv2_tpu.train.trainer import Trainer, TrainerConfig
    from fitv2_tpu.utils import config_to_model

    diff = cfg['diffusion']
    model = config_to_model(diff['network_config'])
    tcfg = diff.get('transport', {})
    transport = create_transport(
        tcfg.get('path_type', 'Linear'), tcfg.get('prediction', 'velocity'),
        snr_type=tcfg.get('snr_type', 'lognorm'))
    # FiTv1 (learn_sigma, configs/fit_xl.yaml) trains with improved
    # diffusion instead of the flow transport (reference train_fit.py)
    net_params = diff['network_config'].get('params', {})
    objective = 'ddpm' if net_params.get('learn_sigma') else 'flow'

    # reference data layout: data.params.train.{data_path,target_len,random,
    # loader.batch_size} (config_fitv2_xl.yaml:48-58); batch_size is per host
    data = cfg.get('data', {}).get('params', {}).get('train', {})
    loader_cfg = data.get('loader', {})
    per_host = int(loader_cfg.get('batch_size', 16))
    acc = cfg.get('accelerate', {})
    opt = acc.get('optimizer', {}).get('params', {})

    tc = TrainerConfig(
        data_path=data.get('data_path', ''),
        target_len=int(data.get('target_len', 256)),
        random_mode=data.get('random', 'random'),
        global_batch_size=per_host * jax.process_count(),
        num_workers=int(loader_cfg.get('num_workers', 8)),
        max_steps=args.max_steps or int(acc.get('max_train_steps',
                                                2_000_000)),
        learning_rate=float(acc.get('learning_rate', 1e-4)),
        scale_lr=bool(acc.get('learning_rate_base_batch_size', 0)),
        lr_schedule=acc.get('lr_scheduler', 'constant_with_warmup'),
        lr_warmup_steps=int(acc.get('lr_warmup_steps', 1000)),
        max_grad_norm=float(acc.get('max_grad_norm', 1.0)),
        weight_decay=float(opt.get('weight_decay', 0.0)),
        # reference --came flag / optimizer target (train_fitv2.py:43,351-356)
        optimizer='came' if (args.came or 'came' in str(
            acc.get('optimizer', {}).get('target', '')).lower()) else 'adamw',
        grad_accum_steps=int(acc.get('gradient_accumulation_steps', 1)),
        seed=args.seed if args.seed is not None else int(
            acc.get('seed', 42)),
        output_dir=args.output_dir or acc.get('output_dir', 'runs/fitv2'),
        checkpointing_steps=int(acc.get('checkpointing_steps', 4000)),
        checkpoints_total_limit=acc.get('checkpoints_total_limit', 4),
        milestone_steps=tuple(acc.get('checkpointing_steps_list', ()) or ()),
        mesh_stage=int(acc.get('mesh_stage', 1)),
        mesh_fsdp=int(acc.get('mesh_fsdp', 1)),
        mesh_tensor=int(acc.get('mesh_tensor', 1)),
        pp_microbatches=int(acc.get('pp_microbatches', 4)),
        objective=objective,
        diffusion_steps=int(diff.get('diffusion_steps', 1000)),
    )
    return Trainer(model, tc, transport=transport)


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    args = parse_args(argv)
    from fitv2_tpu.utils.config import _to_plain, load_config
    cfg = _to_plain(load_config(args.cfgdir))
    trainer = build_trainer(cfg, args)
    trainer.train(max_steps=args.max_steps, resume=args.resume)


if __name__ == '__main__':
    main()

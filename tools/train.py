#!/usr/bin/env python
"""Train / evaluate CLI.

Mirrors the reference exp-file flags
(/root/reference/exps/sgv3d/...r50...py:496-535):
  python tools/train.py sgv3d_r50_128 [-e] [-b N] [--ckpt_path P]
      [--data_root D] [--val_info_path P] [--seed S] [--max_steps N]
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("exp", help="experiment name (see sgv3d_tpu.configs)")
    parser.add_argument("-e", "--evaluate", action="store_true")
    parser.add_argument("-b", "--batch_size_per_device", type=int)
    parser.add_argument("--ckpt_path", type=str, default=None)
    parser.add_argument("--ckpt_step", type=int, default=None,
                        help="evaluate only this checkpoint step "
                             "(default: every step in --ckpt_path)")
    parser.add_argument("--data_root", type=str, default=None)
    parser.add_argument("--val_info_path", type=str, default=None)
    parser.add_argument("--train_info_path", type=str, default=None)
    parser.add_argument("--output_dir", type=str, default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--max_steps", type=int, default=None)
    parser.add_argument("--no_resume", action="store_true")
    parser.add_argument("--fast_lift", action="store_true",
                        help="evaluate with the exp's top-k deploy lift "
                             "instead of the exact all-bin default")
    parser.add_argument("--bf16", action="store_true",
                        help="evaluate with a bf16 backbone (default: fp32, "
                             "parity-grade)")
    parser.add_argument("--bf16_head", action="store_true",
                        help="evaluate with the bf16 BEV head (serving "
                             "approximation; default fp32)")
    parser.add_argument("--exact_lift", action="store_true",
                        help=argparse.SUPPRESS)  # legacy: now the default
    parser.add_argument("--fp32", action="store_true",
                        help="train full fp32 (reference precision=32 "
                             "parity). Default: bf16 backbone convs on TPU "
                             "(geometry/heads/losses are fp32 either way)")
    parser.add_argument("--trace", type=str, default=None, metavar="DIR",
                        help="record a jax.profiler TensorBoard trace of "
                             "the training run into DIR (pair with a small "
                             "--max_steps)")
    parser.add_argument("--no_backup", action="store_true",
                        help="skip the train-start codebase backup into "
                             "<output_dir>/backup")
    parser.add_argument("--train_lift_top_k", type=int, default=None,
                        help="opt-in TRAINING speed knob: pool only the "
                             "top-k height bins per pixel during training "
                             "(differentiable; unselected bins get zero "
                             "height gradient). Default: exact all-bin "
                             "lift, reference-parity gradients")
    parser.add_argument("--multihost", action="store_true",
                        help="multi-host run: call jax.distributed."
                             "initialize() before anything touches devices. "
                             "On TPU pod slices coordinator/process id are "
                             "auto-detected; elsewhere pass "
                             "--coordinator/--nproc/--pid. The reference's "
                             "'--gpus N' DDP equivalent: launch this CLI "
                             "once per host")
    parser.add_argument("--coordinator", type=str, default=None,
                        metavar="HOST:PORT",
                        help="with --multihost: coordinator address when "
                             "not auto-detectable (CPU/GPU clusters)")
    parser.add_argument("--nproc", type=int, default=None,
                        help="with --coordinator: total process count")
    parser.add_argument("--pid", type=int, default=None,
                        help="with --coordinator: this process's id")
    args = parser.parse_args()

    # jax.distributed.initialize(addr, num_processes=None, process_id=None)
    # fails opaquely deep in the coordination service; surface a usage error
    # instead (ADVICE r4).
    if args.coordinator and (args.nproc is None or args.pid is None):
        parser.error("--coordinator requires both --nproc and --pid")

    if args.multihost:
        import jax
        if args.coordinator:
            jax.distributed.initialize(args.coordinator,
                                       num_processes=args.nproc,
                                       process_id=args.pid)
        else:
            jax.distributed.initialize()  # TPU pod auto-detection

    from sgv3d_tpu.configs import get_exp
    from sgv3d_tpu import runner

    cfg = get_exp(args.exp)
    if args.batch_size_per_device:
        cfg = dataclasses.replace(
            cfg, batch_size_per_device=args.batch_size_per_device)
    if args.evaluate:
        cfg = dataclasses.replace(cfg, is_train_height=False)
        runner.evaluate(cfg, ckpt_path=args.ckpt_path,
                        data_root=args.data_root,
                        output_dir=args.output_dir,
                        val_info_path=args.val_info_path,
                        ckpt_step=args.ckpt_step,
                        fast_lift=args.fast_lift, bf16=args.bf16,
                        bf16_head=args.bf16_head)
    else:
        if args.train_lift_top_k is not None:
            cfg = dataclasses.replace(cfg, backbone=dataclasses.replace(
                cfg.backbone, train_lift_top_k=args.train_lift_top_k))
        runner.train(cfg, data_root=args.data_root,
                     output_dir=args.output_dir,
                     max_steps=args.max_steps,
                     resume=not args.no_resume,
                     train_info_path=args.train_info_path,
                     seed=args.seed,
                     backup=not args.no_backup,
                     use_bf16=not args.fp32,
                     trace_dir=args.trace)


if __name__ == "__main__":
    main()

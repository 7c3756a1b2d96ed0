#!/usr/bin/env python
"""Run the ACTUAL reference torch pipeline on our synthetic data (CPU).

This is the strongest available yardstick in this environment (the
reference's GPU stack is absent): the reference's own dataset/sampler/
calibration/model/loss code — not a re-implementation — consuming the same
synthetic Vaihingen3D root this repo trains on, timed per training step.
Proves end-to-end data-format interop (our raw plys through the
reference's prepare/subsample/anchor path) and yields an honest
reference-CPU points/s baseline, cached for bench.py.

Prereq (one-time): compile the reference's cpp_wrappers OUT OF TREE
(/root/reference is read-only; numpy>=2 needs PyArray_* casts):

    cp -r /root/reference/cpp_wrappers /tmp/refbuild/cpp_wrappers
    sed -i -E 's/PyArray_(DATA|NDIM|DIM|SIZE|TYPE)\\(([a-zA-Z_][a-zA-Z0-9_.]*)\\)/PyArray_\\1((PyArrayObject*)\\2)/g; \
               s/PyArray_DIM\\(([a-zA-Z_][a-zA-Z0-9_]*),/PyArray_DIM((PyArrayObject*)\\1,/g' \
        /tmp/refbuild/cpp_wrappers/cpp_{subsampling,neighbors}/wrapper.cpp
    # then g++ -shared -fPIC -O3 -std=c++11 -w <sources> -I<numpy>/core/include \
    #   -I<python-include> -o <module><EXT_SUFFIX>  (see this script's header)
    mkdir /tmp/refshadow && ln -s /root/reference/* /tmp/refshadow/ \
        && ln -sfn /tmp/refbuild/cpp_wrappers /tmp/refshadow/cpp_wrappers

Usage:
    # timing probe (12 steps, cached into .bench_baseline.json)
    python scripts/run_reference_baseline.py --data_root <dir with
        Vaihingen3D_{Training,Testing}.ply> [--steps 12] [--workers 4]

    # quality-trajectory run (VERDICT r2 #1): the reference's OWN
    # ModelTrainer at a scaled budget, with its own per-epoch validation —
    # writes training_iteration0.txt / val_IoUs.txt under --saving_path in
    # the reference's log format (plot with plot_convergence / compared by
    # scripts/compare_quality.py)
    python scripts/run_reference_baseline.py --data_root <root> \
        --train_epochs 3 --epoch_steps 200 --validation_size 50 \
        --saving_path /tmp/refrun/results/WeakLabel/Log_comparison
"""

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SHADOW = "/tmp/refshadow"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", required=True,
                    help="dir containing the synthetic Vaihingen3D plys")
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--workdir", default="/tmp/refrun")
    ap.add_argument("--out", default=os.path.join(REPO,
                                                  ".bench_baseline.json"))
    ap.add_argument("--train_epochs", type=int, default=0,
                    help="run the reference ModelTrainer for N epochs "
                         "instead of the timing probe")
    ap.add_argument("--epoch_steps", type=int, default=200)
    ap.add_argument("--validation_size", type=int, default=50)
    ap.add_argument("--saving_path", default=None,
                    help="results dir for the training run (reference log "
                         "format)")
    ap.add_argument("--initial_labels", type=int, default=None,
                    help="override initial_labels_per_file (small smoke "
                         "roots have fewer anchors than the default 600)")
    ap.add_argument("--resume_chkp", default=None,
                    help="reference current_chkp.tar to restore (model + "
                         "optimizer + epoch); trains only the epochs "
                         "remaining up to --train_epochs. Use a FRESH "
                         "--saving_path: the reference trainer truncates "
                         "training_iteration0.txt on start "
                         "(trainer_WeakLabel.py:137-144); merge the two "
                         "dirs' logs afterwards.")
    ap.add_argument("--val_first", action="store_true",
                    help="with --resume_chkp: run one validation pass on "
                         "the restored weights before training (recovers a "
                         "val_IoUs row lost when a run died mid-validation)")
    args = ap.parse_args()

    # Reference code runs cwd-relative: stage data under the workdir
    os.makedirs(os.path.join(args.workdir, "data"), exist_ok=True)
    dst = os.path.join(args.workdir, "data", "Vaihingen3D")
    if not os.path.isdir(dst):
        os.makedirs(dst)
        for name in os.listdir(args.data_root):
            if name.endswith(".ply"):
                shutil.copy(os.path.join(args.data_root, name),
                            os.path.join(dst, name))
    os.chdir(args.workdir)

    sys.path.insert(0, REPO)
    from weasal_tpu.utils.torch_interop import install_reference_shims
    install_reference_shims()
    sys.path.insert(0, SHADOW)

    import numpy as np
    import torch
    from torch.utils.data import DataLoader

    torch.set_num_threads(os.cpu_count() or 1)

    from train_Vaihingen3D_WeakLabel import Vaihingen3DWLConfig  # noqa
    from datasets.Vaihingen3D_WeakLabel import (  # noqa
        Vaihingen3DWLCollate, Vaihingen3DWLDataset, Vaihingen3DWLSampler)
    from models.architectures import KPFCNN_mprm  # noqa

    config = Vaihingen3DWLConfig()
    config.input_threads = args.workers
    config.saving = False
    config.epoch_steps = args.steps
    config.max_epoch = 1
    if args.initial_labels is not None:
        config.initial_labels_per_file = args.initial_labels
    if args.train_epochs:
        # Reference quirk: with saving=True the PID kill-file is removed at
        # the START of epoch max_epoch-1 and every step checks it
        # (trainer_WeakLabel.py:171-173,187-188), so the final configured
        # epoch trains zero steps (validation/checkpoint only). Configure
        # +1 so exactly `train_epochs` epochs actually train.
        config.max_epoch = args.train_epochs + 1
        config.epoch_steps = args.epoch_steps
        config.validation_size = args.validation_size
        if args.saving_path:
            config.saving = True
            config.saving_path = args.saving_path
            os.makedirs(args.saving_path, exist_ok=True)

    t0 = time.time()
    training_dataset = Vaihingen3DWLDataset(
        config, set="training", use_potentials=True, al_iteration=0)
    training_sampler = Vaihingen3DWLSampler(training_dataset)
    training_loader = DataLoader(training_dataset, batch_size=1,
                                 sampler=training_sampler,
                                 collate_fn=Vaihingen3DWLCollate,
                                 num_workers=args.workers,
                                 pin_memory=False)
    training_sampler.calibration(training_loader, verbose=True)
    t_prep = time.time() - t0
    print(f"reference data prep + calibration: {t_prep:.1f}s")

    if args.train_epochs:
        from utils.trainer_WeakLabel import ModelTrainer  # noqa

        validation_dataset = Vaihingen3DWLDataset(
            config, set="validation", use_potentials=True)
        validation_sampler = Vaihingen3DWLSampler(validation_dataset)
        validation_loader = DataLoader(validation_dataset, batch_size=1,
                                       sampler=validation_sampler,
                                       collate_fn=Vaihingen3DWLCollate,
                                       num_workers=args.workers,
                                       pin_memory=False)
        validation_sampler.calibration(validation_loader, verbose=True)

        net = KPFCNN_mprm(config, training_dataset.label_values,
                          training_dataset.ignored_labels)
        trainer = ModelTrainer(net, config, chkp_path=args.resume_chkp)
        if args.resume_chkp:
            # The restored self.epoch counts epochs already trained, and the
            # reference loop breaks at `self.epoch == config.max_epoch`
            # (trainer_WeakLabel.py:296-297), so max_epoch = the TOTAL
            # target trains exactly the remainder. The fresh-run `+1` quirk
            # doesn't apply: the kill file is removed at LOOP epoch
            # max_epoch-1 (counted from 0 on this resumed loop), which the
            # break makes unreachable.
            config.max_epoch = args.train_epochs
            trainer.al_iteration = 0
            if args.val_first:
                net.eval()
                trainer.validation(net, validation_loader, config)
                net.train()
        t1 = time.time()
        trainer.train(net, training_loader, validation_loader, config,
                      al_iteration=0)
        t_train = time.time() - t1
        print(f"reference training run: {config.max_epoch} epochs x "
              f"{config.epoch_steps} steps in {t_train / 3600:.2f} h "
              f"(logs under {config.saving_path})")
        return

    net = KPFCNN_mprm(config, training_dataset.label_values,
                      training_dataset.ignored_labels)
    net.train()
    optimizer = torch.optim.SGD(net.parameters(), lr=config.learning_rate,
                                momentum=config.momentum,
                                weight_decay=config.weight_decay)

    times, points, losses = [], [], []
    steps_done = 0
    for epoch in range(4):                 # loop epochs until enough steps
        for batch in training_loader:
            if not any(batch.region):        # trainer_WeakLabel.py:180-183
                continue
            t1 = time.time()
            optimizer.zero_grad()
            outputs, cla_outputs, cam = net(batch, config)
            loss = net.region_mprm_loss(cam, batch.region,
                                        batch.region_lb,
                                        batch.lengths[0])
            loss.backward()
            torch.nn.utils.clip_grad_value_(net.parameters(),
                                            config.grad_clip_norm)
            optimizer.step()
            times.append(time.time() - t1)
            points.append(int(batch.points[0].shape[0]))
            losses.append(float(loss.detach()))
            steps_done += 1
            print(f"step {steps_done}: {times[-1]:.2f}s "
                  f"{points[-1]} pts loss {losses[-1]:.3f}", flush=True)
            if steps_done >= args.steps:
                break
        if steps_done >= args.steps:
            break

    # Skip the first (lazy-init) step for the rate
    rate = (sum(points[1:]) / sum(times[1:])) if len(times) > 1 else \
        points[0] / times[0]
    print(f"reference torch-CPU: {np.mean(times[1:]):.2f} s/step, "
          f"{rate:.0f} points/s; losses {losses[0]:.3f} -> {losses[-1]:.3f}")

    cache = {}
    if os.path.exists(args.out):
        try:
            with open(args.out) as f:
                cache = json.load(f)
        except Exception:
            cache = {}
    cache["reference_torch_cpu_points_per_sec"] = rate
    cache["reference_torch_cpu_sec_per_step"] = float(np.mean(times[1:]))
    with open(args.out, "w") as f:
        json.dump(cache, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

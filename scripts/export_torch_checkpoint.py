#!/usr/bin/env python
"""Export one of this framework's checkpoints to the reference's torch
format, so a model trained here can be handed back to the reference stack
(its strict restore: utils/trainer_WeakLabel.py:100-112, tester:76-80).

Usage:
    python scripts/export_torch_checkpoint.py \
        results/WeakLabel/Log_x/checkpoints/current_chkp.tar out_chkp.tar \
        [--log results/WeakLabel/Log_x]   # read lr/momentum/class_w from
                                          # the run's parameters.txt
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint")
    ap.add_argument("out")
    ap.add_argument("--log", default=None,
                    help="results dir with parameters.txt (defaults to the "
                         "checkpoint's grandparent)")
    args = ap.parse_args()

    from weasal_tpu.config import Config
    from weasal_tpu.train.trainer import load_checkpoint_file
    from weasal_tpu.utils.torch_interop import save_torch_checkpoint

    log = args.log or os.path.dirname(
        os.path.dirname(os.path.abspath(args.checkpoint)))
    config = None
    model_name = "KPFCNN_mprm"
    class_w = None
    if os.path.exists(os.path.join(log, "parameters.txt")):
        config = Config()
        config.load(log)
        model_name = getattr(config, "model_name", model_name)
        if getattr(config, "class_w", None):
            class_w = list(config.class_w)

    payload = load_checkpoint_file(args.checkpoint)
    save_torch_checkpoint(args.out, payload["model_state_dict"],
                          epoch=payload.get("epoch", 0),
                          saving_path=payload.get("saving_path"),
                          config=config, class_weights=class_w,
                          model_name=model_name)
    print(f"wrote {args.out} (epoch {payload.get('epoch', 0)}, "
          f"model {model_name})")


if __name__ == "__main__":
    main()

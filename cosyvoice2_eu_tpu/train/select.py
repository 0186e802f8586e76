"""Checkpoint selection tools.

Reference: cosy_repo/cosyvoice/bin/select_best_checkpoint.py:15 (best-val
picker) and bin/average_model.py:44-75 (top-N averaging, exposed from
train/executor.py).  Naming of exported finals follows run.sh stage 6:
``{model}-{hours}-averaged-{bb}-{LANG}``.
"""

from __future__ import annotations

import argparse
import json
import os

from cosyvoice2_eu_tpu.train.executor import average_checkpoints, list_checkpoints


def select_best(model_dir: str, metric: str = "cv_loss") -> dict:
    infos = [i for i in list_checkpoints(model_dir) if metric in i]
    assert infos, f"no checkpoints with {metric} in {model_dir}"
    return min(infos, key=lambda i: i[metric])


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("command", choices=["best", "average"])
    parser.add_argument("--model_dir", required=True)
    parser.add_argument("--num", type=int, default=5)
    parser.add_argument("--metric", default="cv_loss")
    parser.add_argument("--out", default=None, help="output tag for the averaged ckpt")
    args = parser.parse_args(argv)

    if args.command == "best":
        info = select_best(args.model_dir, args.metric)
        print(json.dumps(info, indent=2))
        return info

    # average: needs a template pytree — load the best checkpoint first
    from cosyvoice2_eu_tpu.runtime.checkpoint import load_pytree, save_pytree

    best = select_best(args.model_dir, args.metric)
    like = load_pytree(os.path.join(args.model_dir, best["tag"]))
    avg, tags = average_checkpoints(args.model_dir, like, args.num, args.metric)
    out_tag = args.out or f"averaged_top{args.num}"
    save_pytree(os.path.join(args.model_dir, out_tag), avg)
    print(json.dumps({"tag": out_tag, "averaged_from": tags}, indent=2))


if __name__ == "__main__":
    main()

"""Extract a trained checkpoint into an inference model dir (native path).

The reference ships ``extract_model_for_inference.py`` (cosy_repo root:21-40):
it strips training metadata and the GAN wrapper's ``generator.`` prefix, then
drops the result into the model directory under the run-id naming matrix that
``CosyVoice2``/the eval pipeline resolve (cli/cosyvoice.py:239-268).

This is the TPU-native equivalent: training here saves orbax pytrees
(train/executor.py save_checkpoint), so extraction is pytree surgery — take
the ``generator`` subtree of a GAN ``epoch_X_whole`` checkpoint (or the whole
tree for llm/flow), leave the optimizer sidecar behind, and write a native
checkpoint dir named ``{llm|flow|hift}-{run_id}`` (or the bare component name
with ``--final``) that ``cosyvoice2_eu_tpu.load()`` resolves exactly like the
reference's ``.pt`` files.

Usage (run.sh stage 7):
  python tools/extract_for_inference.py \
      --exp-dir exp/llm-fr --component llm --tag averaged-fr \
      --out-dir models/eu --run-id 1500-averaged-blanken-FR
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# output component key per --component flag (hifigan trains the hift generator)
_KEYS = {"llm": "llm", "flow": "flow", "hifigan": "hift"}


def extract(
    exp_dir: str,
    component: str,
    out_dir: str,
    tag: str | None = None,
    run_id: str | None = None,
    final: bool = False,
) -> str:
    """Returns the written checkpoint path."""
    from cosyvoice2_eu_tpu.runtime.checkpoint import load_pytree, save_pytree
    from cosyvoice2_eu_tpu.train.executor import latest_checkpoint
    from cosyvoice2_eu_tpu.train.select import select_best

    key = _KEYS[component]
    if tag is None:
        try:
            tag = select_best(exp_dir)["tag"]  # best CV loss by default
        except AssertionError:
            info = latest_checkpoint(exp_dir)  # GAN runs log no cv_loss
            if info is None:
                raise FileNotFoundError(f"no checkpoints under {exp_dir}")
            tag = info["tag"]
    tree = load_pytree(os.path.join(exp_dir, tag))
    # GAN whole checkpoints wrap {generator, discriminator}; inference wants
    # the generator only (reference strips the 'generator.' prefix)
    if isinstance(tree, dict) and "generator" in tree:
        tree = tree["generator"]

    name = key if final else f"{key}-{run_id or tag}"
    out_path = os.path.join(out_dir, name)
    os.makedirs(out_dir, exist_ok=True)
    save_pytree(out_path, tree)
    return out_path


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("--exp-dir", required=True, help="training dir with checkpoints")
    parser.add_argument("--component", required=True, choices=sorted(_KEYS))
    parser.add_argument("--out-dir", required=True, help="inference model dir")
    parser.add_argument("--tag", default=None, help="checkpoint tag (default: best cv_loss)")
    parser.add_argument("--run-id", default=None, help="output run id (default: the tag)")
    parser.add_argument(
        "--final", action="store_true",
        help="write the unsuffixed component name (the 'final' matrix slot)",
    )
    args = parser.parse_args(argv)
    path = extract(
        args.exp_dir, args.component, args.out_dir,
        tag=args.tag, run_id=args.run_id, final=args.final,
    )
    print(json.dumps({"written": path}))
    return path


if __name__ == "__main__":
    main()

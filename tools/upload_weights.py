"""Upload trained checkpoints to the HuggingFace Hub.

Reference: cosy_repo/cosyvoice/bin/upload_weights.py (best-checkpoint
resolution per model + HfApi upload).  Network-gated: degrades to a dry-run
listing when huggingface_hub is unavailable or --dry-run is given, so the
packaging logic is testable offline.

Usage:
  python tools/upload_weights.py --exp_dir exp/cosyvoice2 \
      --hf_repo_id user/model [--models llm flow hifigan] [--dry-run]
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def find_best_checkpoint(model_dir: str) -> str | None:
    """Best checkpoint for one model dir: averaged > best-by-cv > latest.

    Mirrors the reference's preference order (upload_weights.py:48-80) over
    this repo's artifacts (orbax dirs + JSON sidecars, train/executor.py).
    """
    model_name = os.path.basename(model_dir.rstrip("/"))
    for cand in (f"{model_name}_averaged", "averaged_model", "averaged"):
        p = os.path.join(model_dir, cand)
        if os.path.isdir(p) or os.path.exists(p + ".pt"):
            return p if os.path.isdir(p) else p + ".pt"
    try:
        from cosyvoice2_eu_tpu.train.executor import (
            latest_checkpoint,
            list_checkpoints,
        )

        ckpts = list_checkpoints(model_dir)
        with_cv = [c for c in ckpts if c.get("cv_loss") is not None]
        info = (min(with_cv, key=lambda c: c["cv_loss"]) if with_cv
                else latest_checkpoint(model_dir))
        if info and info.get("tag"):
            return os.path.join(model_dir, info["tag"])
    except Exception:
        logging.exception("checkpoint listing failed for %s", model_dir)
    return None


def collect_uploads(exp_dir: str, models: list[str]) -> dict[str, str]:
    """{repo_path: local_path} for the best checkpoint of each model, plus
    config/tokenizer sidecars found at the experiment root."""
    uploads: dict[str, str] = {}
    for model in models:
        mdir = os.path.join(exp_dir, model)
        if not os.path.isdir(mdir):
            logging.warning("missing model dir %s", mdir)
            continue
        best = find_best_checkpoint(mdir)
        if best is None:
            logging.warning("no checkpoint found under %s", mdir)
            continue
        name = "hift" if model == "hifigan" else model
        ext = "" if os.path.isdir(best) else os.path.splitext(best)[1]
        uploads[f"{name}{ext or ''}"] = best
    for sidecar in ("config.json", "tokenizer.json", "tokenizer_config.json",
                    "vocab.json", "merges.txt", "cosyvoice2.yaml"):
        p = os.path.join(exp_dir, sidecar)
        if os.path.exists(p):
            uploads[sidecar] = p
    return uploads


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--exp_dir", required=True)
    parser.add_argument("--hf_repo_id", required=True)
    parser.add_argument("--hf_token", default=None)
    parser.add_argument("--models", nargs="+", default=["llm", "flow", "hifigan"])
    parser.add_argument("--dry-run", action="store_true",
                        help="list what would upload, no network")
    args = parser.parse_args(argv)

    uploads = collect_uploads(args.exp_dir, args.models)
    if not uploads:
        raise SystemExit("nothing to upload")
    for repo_path, local in sorted(uploads.items()):
        print(f"{repo_path}  <-  {local}")
    if args.dry_run:
        return uploads

    try:
        from huggingface_hub import HfApi
    except ImportError:
        raise SystemExit(
            "huggingface_hub is not installed; re-run with --dry-run to "
            "inspect the upload set"
        )
    api = HfApi(token=args.hf_token or os.environ.get("HF_TOKEN"))
    api.create_repo(args.hf_repo_id, exist_ok=True, repo_type="model")
    for repo_path, local in uploads.items():
        if os.path.isdir(local):
            api.upload_folder(folder_path=local, path_in_repo=repo_path,
                              repo_id=args.hf_repo_id)
        else:
            api.upload_file(path_or_fileobj=local, path_in_repo=repo_path,
                            repo_id=args.hf_repo_id)
    print(f"uploaded {len(uploads)} artifacts to {args.hf_repo_id}")
    return uploads


if __name__ == "__main__":
    main()

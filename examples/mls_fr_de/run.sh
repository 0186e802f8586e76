#!/usr/bin/env bash
# MLS FR/DE training recipe — TPU-native counterpart of the reference's
# examples/libritts/cosyvoice2/run.sh (stages -1..8).
#
# Stages:
#  0  prepare wav.scp/text/utt2spk from the MLS directory layout
#  1  extract FSQ speech tokens + CAM++ x-vectors, write parquet shards
#  2  train the speech LM
#  3  train the flow (CFM) model
#  4  train the HiFT vocoder (GAN)
#  5  average top-5 checkpoints by CV loss and export finals
#  6  evaluate (RTF + objective metrics)
#  7  export for inference: extract trained checkpoints into the model dir
#     (run-id naming matrix) + precompile the shippable AOT store
#  8  upload the model dir to Hugging Face (reference run.sh stage 8)
#
# Knobs: FINETUNE=lora|dpo adds the fine-tuning mode to stage 2 (DPO needs
# reject_speech_token columns in the parquet); WANDB=1 logs to W&B; multi-host
# runs set JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/JAX_PROCESS_ID per host
# (data shards split by process rank automatically).
set -euo pipefail

stage=${1:-0}
stop_stage=${2:-6}
model_dir=${MODEL_DIR:-models/cosyvoice2-eu}
hours=${HOURS:-1500}
backbone_tag=${BACKBONE_TAG:-blanken}
data_root=${DATA_ROOT:-data/mls}
exp=${EXP:-exp}
lang=${LANG_CODE:-fr}
tokenizer_params=${TOKENIZER_PARAMS:-}   # orbax pytree of the FSQ tokenizer
campplus_params=${CAMPPLUS_PARAMS:-}     # orbax pytree of CAM++

if [ "$stage" -le 0 ] && [ "$stop_stage" -ge 0 ]; then
  echo "stage 0: kaldi-style lists from MLS layout (audio/ + transcripts.txt)"
  python - <<'PY'
import os, sys
root = os.environ.get("DATA_ROOT", "data/mls")
out = os.path.join(root, "lists")
os.makedirs(out, exist_ok=True)
wav, txt, u2s = [], [], []
trans = os.path.join(root, "transcripts.txt")
for line in open(trans):
    utt, text = line.strip().split("\t", 1)
    spk = utt.split("_")[0]
    path = os.path.join(root, "audio", spk, utt.split("_")[1], utt + ".wav")
    if os.path.exists(path):
        wav.append(f"{utt} {path}"); txt.append(f"{utt} {text}"); u2s.append(f"{utt} {spk}")
open(os.path.join(out, "wav.scp"), "w").write("\n".join(wav) + "\n")
open(os.path.join(out, "text"), "w").write("\n".join(txt) + "\n")
open(os.path.join(out, "utt2spk"), "w").write("\n".join(u2s) + "\n")
print(f"wrote {len(wav)} utterances")
PY
fi

if [ "$stage" -le 1 ] && [ "$stop_stage" -ge 1 ]; then
  echo "stage 1: features -> parquet"
  python tools/prepare_data.py \
    --wav_scp "$data_root/lists/wav.scp" --text "$data_root/lists/text" \
    --utt2spk "$data_root/lists/utt2spk" --out_dir "$data_root/parquet" \
    ${tokenizer_params:+--tokenizer_params "$tokenizer_params"} \
    ${campplus_params:+--campplus_params "$campplus_params"}
  # 90/10 train/cv split of the shard list
  python - <<'PY'
import os
root = os.environ.get("DATA_ROOT", "data/mls")
shards = open(os.path.join(root, "parquet/data.list")).read().split()
n_cv = max(1, len(shards) // 10)
open(os.path.join(root, "train.list"), "w").write("\n".join(shards[n_cv:]) + "\n")
open(os.path.join(root, "cv.list"), "w").write("\n".join(shards[:n_cv]) + "\n")
PY
fi

if [ "$stage" -le 2 ] && [ "$stop_stage" -ge 2 ]; then
  echo "stage 2: train LM"
  finetune_flags=""
  case "${FINETUNE:-}" in
    lora) finetune_flags="--lora" ;;
    dpo)  finetune_flags="--dpo" ;;
  esac
  python -m cosyvoice2_eu_tpu.train.train --model llm \
    --train_data "$data_root/train.list" --cv_data "$data_root/cv.list" \
    --model_dir "$exp/llm-$lang" --resume \
    ${WANDB:+--wandb} $finetune_flags
fi

if [ "$stage" -le 3 ] && [ "$stop_stage" -ge 3 ]; then
  echo "stage 3: train flow"
  python -m cosyvoice2_eu_tpu.train.train --model flow \
    --train_data "$data_root/train.list" --cv_data "$data_root/cv.list" \
    --model_dir "$exp/flow-$lang" --resume
fi

if [ "$stage" -le 4 ] && [ "$stop_stage" -ge 4 ]; then
  echo "stage 4: train HiFT (GAN)"
  python -m cosyvoice2_eu_tpu.train.train_gan \
    --train_data "$data_root/train.list" --model_dir "$exp/hift-$lang"
fi

if [ "$stage" -le 5 ] && [ "$stop_stage" -ge 5 ]; then
  echo "stage 5: average top-5 by CV loss"
  for m in llm flow; do
    python -m cosyvoice2_eu_tpu.train.select average \
      --model_dir "$exp/$m-$lang" --num 5 --out "averaged-$lang"
  done
fi

if [ "$stage" -le 6 ] && [ "$stop_stage" -ge 6 ]; then
  echo "stage 6: evaluate (hours x setting matrix + charts)"
  python -m cosyvoice2_eu_tpu.eval.pipeline \
    --config examples/eval_config.yaml \
    --dataset "$data_root/test" --language "$lang"
  python -m cosyvoice2_eu_tpu.eval.report --results-dir eval_results --language "$lang"
fi

if [ "$stage" -le 7 ] && [ "$stop_stage" -ge 7 ]; then
  echo "stage 7: export trained checkpoints for inference + AOT warmup store"
  lang_upper=$(echo "$lang" | tr '[:lower:]' '[:upper:]')
  run_id="$hours-averaged-$backbone_tag-$lang_upper"
  python tools/extract_for_inference.py --exp-dir "$exp/llm-$lang" \
    --component llm --tag "averaged-$lang" --out-dir "$model_dir" --run-id "$run_id"
  python tools/extract_for_inference.py --exp-dir "$exp/flow-$lang" \
    --component flow --tag "averaged-$lang" --out-dir "$model_dir" --run-id "$run_id"
  # best GAN epoch -> hift (generator subtree only)
  python tools/extract_for_inference.py --exp-dir "$exp/hift-$lang" \
    --component hifigan --out-dir "$model_dir" --run-id "$run_id" || true
  # precompile + package the AOT executable store with the model so a fresh
  # machine's first audio skips the cold XLA compile (cli.py warmup)
  python -m cosyvoice2_eu_tpu.cli warmup --model-dir "$model_dir" || true
fi

if [ "$stage" -le 8 ] && [ "$stop_stage" -ge 8 ]; then
  echo "stage 8: upload trained checkpoints to Hugging Face"
  python tools/upload_weights.py --exp_dir "$exp" \
    --models "llm-$lang" "flow-$lang" "hift-$lang" \
    --hf_repo_id "${HF_REPO:-local/cosyvoice2-eu-tpu}" ${HF_DRY_RUN:+--dry-run}
fi

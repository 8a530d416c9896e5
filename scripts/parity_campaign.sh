#!/usr/bin/env bash
# Convergence-parity campaign (VERDICT r1 next-round #1).
#
# Trains the five BASELINE.md anchor configs at the reference's
# examples.org hyperparameters for the full 100 epochs. The reference's
# floorplans dataset is unobtainable here (zero egress; the reference
# itself loaded it from private local file lists — hem/data/floorplan.py),
# so the campaign runs on the synthetic image distribution with the SAME
# global batch (512), optimizer, learning rate, epoch count, and model
# sizes. Dataset: 32,768 train / 4,096 eval images, 64x64x3, shipped
# uint8 and normalized on-chip.
#
# Results are summarized into PARITY.md by scripts/parity_report.py.
set -u
cd "$(dirname "$0")/.."
W=workspace/parity
mkdir -p "$W"
# liveness marker for scripts/round4_chain.sh (checked with kill -0;
# never by process-name pattern matching)
echo $$ > "$W/campaign.pid"

COMMON="--dataset synthetic --synthetic_count 16384 --synthetic_eval_count 4096 \
 --synthetic_u8 --synthetic_shape 64 64 3 --batch_size 512 --epochs 100 \
 --max_to_keep 3 --seed 7"

run() {
  local name="$1"; shift
  if [ -f "$W/$name.done" ]; then echo "skip $name (done)"; return; fi
  echo "=== $name: $(date) ==="
  # repeat.sh semantics: restart on crash (exit != 1), resume from checkpoint
  local tries=0
  until python train.py $COMMON "$@" --dir "$W/$name" >"$W/$name.log" 2>&1; do
    code=$?
    tries=$((tries+1))
    echo "$name exited $code (try $tries)"
    if [ "$code" -eq 1 ] || [ "$tries" -ge 3 ]; then return; fi
    sleep 30
  done
  touch "$W/$name.done"
  echo "=== $name finished: $(date) ==="
}

# examples.org rows (reference: /root/reference/examples/examples.org).
# Order: cnn and iwgan first — they are the two runs the FID artifact
# depends on (bench.py --fid uses the cnn run as the trained feature
# extractor and scores the iwgan run), so the round's critical-path
# artifacts unblock even if a later run is cut short.
# iwgan keeps EVERY epoch's checkpoint (--max_to_keep 0, overriding
# COMMON's 3 — argparse last-wins) so scripts/fid_trajectory.py can score
# FID at epochs 10/50/100 (VERDICT r3 missing #2).
run cnn   --model cnn   --optimizer rmsprop --lr 1e-4
run iwgan --model iwgan --optimizer adam --lr 1e-4 --beta1 0.5 --beta2 0.9 \
          --n_disc_train 5 --max_to_keep 0
run vae   --model vae   --optimizer rmsprop --lr 1e-3 --latent_size 200
run gan   --model gan   --optimizer rmsprop --lr 2.5e-5
run wgan  --model wgan  --optimizer rmsprop --lr 2.5e-5 --n_disc_train 5

# FID-context runs beyond the five anchors (scored by fid_trajectory.py):
# (a) the corrected per-sample GP norm ablation at the same budget;
# (b) 200 extra epochs on a COPY of the finished iwgan anchor (resume
#     semantics pick up from checkpoint-100) — does FID keep improving,
#     i.e. is the epoch-100 number training-limited or
#     architecture-limited?
run iwgan_gps --model iwgan --optimizer adam --lr 1e-4 --beta1 0.5 \
          --beta2 0.9 --n_disc_train 5 --gp_per_sample
# (b) is staged and disk-bounded: a full-dir copy + --max_to_keep 0 would
# cost ~80 GB next to the finished campaign. The script seeds only
# checkpoint-100, trains to the 150/200/300 waypoints under
# max_to_keep 3, and preserves exactly those checkpoints for
# fid_trajectory.py.
if [ -f "$W/iwgan.done" ] && [ ! -f "$W/iwgan300.done" ]; then
  bash scripts/iwgan300_extension.sh
fi
echo "=== campaign complete: $(date) ==="

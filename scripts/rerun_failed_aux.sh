#!/usr/bin/env bash
# Rerun the aux-artifact steps that failed in the first round-3 pass:
# paper_standalone (crashed on the eigen int32 overflow at its step-0
# summary, so fullimage/metrics saw an untrained checkpoint-0), its three
# dependents, and the transiently-failed iwgan e2e bench.
set -u
cd "$(dirname "$0")/.."
A=workspace/artifacts
rm -f "$A/standalone.done"
rm -rf "$A/standalone"

echo "=== standalone retrain: $(date)"
python train.py --model paper_standalone --model_version mean_adjusted \
    --dataset synthetic --synthetic_count 8192 --synthetic_eval_count 1024 \
    --synthetic_shape 65 65 3 --synthetic_u8 \
    --batch_size 256 --epochs 25 --optimizer adam --g_lr 1e-4 \
    --g_beta1 0.5 --g_beta2 0.999 --max_to_keep 2 --seed 7 \
    --dir "$A/standalone" > "$A/standalone.log" 2>&1 \
  && touch "$A/standalone.done" || echo "standalone failed"

echo "=== fullimage rerun: $(date)"
python paper_fullimage.py --dir "$A/standalone" --n_scenes 6 \
    --strides 4 1 --chunk 256 --scene_shape 96 96 3 \
    > "$A/fullimage.log" 2>&1 || echo "fullimage failed"

echo "=== paper_metrics rerun: $(date)"
python paper_metrics.py --dir "$A/standalone" --max_batches 8 \
    > "$A/metrics.log" 2>&1 || echo "paper_metrics failed"

echo "=== paper_visualize rerun: $(date)"
python paper_visualize.py "$A/standalone" --out "$A/experiment_charts.pdf" \
    > "$A/paper_visualize.log" 2>&1 || echo "paper_visualize failed"

echo "=== e2e rerun: $(date)"
python bench.py --e2e > "$A/e2e.json" 2> "$A/e2e.log" || echo "e2e failed"

echo "=== rerun complete: $(date)"

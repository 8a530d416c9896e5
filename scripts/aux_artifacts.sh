#!/usr/bin/env bash
# Post-campaign round artifacts (VERDICT r1 #2, #3, #8):
#   1. FID of the parity IWGAN run (pixel + trained-cnn-encoder extractors)
#   2. end-to-end pipeline benchmark on the real chip
#   3. paper_standalone trained on 65px synthetic scenes, then
#      paper_fullimage over >=4 larger scenes at strides 4 and 1
# Results land in workspace/artifacts/ and are summarized into PARITY.md /
# PERF.md by hand.
#
# Ordering contract (VERDICT r3 weak #2): the plain `python bench.py`
# compute run comes LAST, after every e2e/fid artifact it snapshots into
# its detail file, so the embedded sections always equal the sibling
# artifact JSONs from the SAME session. bench.py stamps provenance
# (measured_utc + argv) into every result, and tags each attached block
# with its source file + mtime, so any later mixing is self-describing.
set -u
cd "$(dirname "$0")/.."
A=workspace/artifacts
mkdir -p "$A"

echo "=== fid: $(date)"
python bench.py --fid --dir workspace/parity/iwgan \
    --fid_encoder_dir workspace/parity/cnn --out "$A/fid.json" \
    > /dev/null 2> "$A/fid.log" || echo "fid failed"

echo "=== e2e bench: $(date)"
python bench.py --e2e --out "$A/e2e.json" > /dev/null 2> "$A/e2e.log" \
    || echo "e2e failed"

echo "=== e2e bench (cnn, the reference transcript's workload): $(date)"
# at the transcript's OWN global batch 1024 so vs_baseline is 1:1
python bench.py --e2e --model cnn --batch 1024 --out "$A/e2e_cnn.json" \
    > /dev/null 2> "$A/e2e_cnn.log" || echo "e2e cnn failed"

echo "=== e2e bench (cnn, device-resident cache): $(date)"
python bench.py --e2e --model cnn --batch 1024 --device_cache \
    --out "$A/e2e_cnn_cached.json" > /dev/null 2> "$A/e2e_cnn_cached.log" \
    || echo "e2e cnn cached failed"

echo "=== e2e bench (device-resident cache, the training default): $(date)"
python bench.py --e2e --device_cache --out "$A/e2e_cached.json" \
    > /dev/null 2> "$A/e2e_cached.log" || echo "e2e cached failed"

echo "=== compute bench (LAST: snapshots the fresh e2e/fid above): $(date)"
python bench.py --out "$A/compute.json" > /dev/null 2> "$A/compute.log" \
    || echo "bench failed"

echo "=== paper_standalone train: $(date)"
if [ ! -f "$A/standalone.done" ]; then
  python train.py --model paper_standalone --model_version mean_adjusted \
      --dataset synthetic --synthetic_count 8192 --synthetic_eval_count 1024 \
      --synthetic_shape 65 65 3 --synthetic_u8 \
      --batch_size 256 --epochs 25 --optimizer adam --g_lr 1e-4 \
      --g_beta1 0.5 --g_beta2 0.999 --max_to_keep 2 --seed 7 \
      --dir "$A/standalone" > "$A/standalone.log" 2>&1 \
    && touch "$A/standalone.done"
fi

echo "=== paper_fullimage: $(date)"
python paper_fullimage.py --dir "$A/standalone" --n_scenes 6 \
    --strides 4 1 --chunk 256 --scene_shape 96 96 3 \
    > "$A/fullimage.log" 2>&1 || echo "fullimage failed"

echo "=== paper_metrics: $(date)"
python paper_metrics.py --dir "$A/standalone" --max_batches 8 \
    > "$A/metrics.log" 2>&1 || echo "paper_metrics failed"

echo "=== visualize (parity iwgan): $(date)"
python visualize.py --dir workspace/parity/iwgan --all \
    > "$A/visualize.log" 2>&1 || echo "visualize failed"

echo "=== paper_visualize (standalone metrics charts): $(date)"
python paper_visualize.py "$A/standalone" --out "$A/experiment_charts.pdf" \
    > "$A/paper_visualize.log" 2>&1 || echo "paper_visualize failed"

echo "=== events loss curves (all five anchors): $(date)"
python events.py workspace/parity/cnn workspace/parity/vae \
    --out "$A/parity_ae_losses.pdf" > /dev/null 2>&1 || true
python events.py workspace/parity/gan workspace/parity/wgan \
    workspace/parity/iwgan --tags g_loss d_loss \
    --out "$A/parity_gan_losses.pdf" > /dev/null 2>&1 || true

echo "=== aux artifacts complete: $(date)"

echo "=== mirror measured JSONs into the tracked artifacts/: $(date)"
# workspace/ is gitignored and wiped between sessions; the tracked copies
# are what bench.py's _attach_artifacts falls back to (and what the
# end-of-round BENCH_r*.json detail pointer resolves to) when the fresh
# ones are gone. Commit artifacts/ after a successful chain.
mkdir -p artifacts
for j in fid.json e2e.json e2e_cnn.json e2e_cached.json e2e_cnn_cached.json \
         compute.json bench_detail.json fid_trajectory.json \
         e2e_ungrouped.json e2e_cnn_g8.json perf_analysis.json; do
  if [ -s "$A/$j" ] && python -c "import json,sys; json.load(open('$A/$j'))" \
      2>/dev/null; then
    cp "$A/$j" "artifacts/$j"
  fi
done

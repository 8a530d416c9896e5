#!/usr/bin/env bash
# Train the run layout the paper_visualize.py --experiment presets read
# (reference paper_visualize.py:339-381 hard-coded these runs under
# /mnt/storage/thesis; hemx reproduces the same layout under --root,
# default workspace/thesis), then render experiment1/1b/2.pdf.
#
# Short synthetic-scene runs: the figures demonstrate the REPRODUCIBLE
# pipeline (runs -> tags -> fixed layouts), not thesis-scale training;
# raise EPOCHS for real curves. NYUv2 itself needs a manual download
# (reference hem/data/nyuv2.py:1-13).
set -u
cd "$(dirname "$0")/.."
ROOT=${ROOT:-workspace/thesis}
EPOCHS=${EPOCHS:-12}
A=workspace/artifacts
mkdir -p "$ROOT" "$A"

COMMON="--dataset synthetic --synthetic_count 4096 --synthetic_eval_count 512 \
 --synthetic_shape 65 65 3 --synthetic_u8 --batch_size 256 \
 --epochs $EPOCHS --max_to_keep 1 --seed 7"

run() {
  local dir="$1"; shift
  if [ -f "$ROOT/$dir/.done" ]; then echo "skip $dir (done)"; return; fi
  echo "=== thesis run $dir: $(date)"
  if python train.py $COMMON "$@" --dir "$ROOT/$dir" \
      > "$ROOT/${dir//\//_}.log" 2>&1; then
    touch "$ROOT/$dir/.done"
  else
    echo "$dir FAILED (see $ROOT/${dir//\//_}.log)"
  fi
}

# experiment 1 / 1b rows: standalone (supervised) + cgan per model_version
for v in baseline mean_adjusted mean_provided; do
  run "standalone/$v" --model paper_standalone --model_version "$v" \
      --optimizer adam --g_lr 1e-4 --g_beta1 0.5 --g_beta2 0.999
  run "cgan/$v" --model paper_cgan --model_version "$v" \
      --optimizer adam --g_lr 1e-4 --d_lr 1e-4 \
      --g_beta1 0.5 --g_beta2 0.999 --d_beta1 0.5 --d_beta2 0.999
done

# experiment 2 rows: paper_sampler per noise-injection site (reference
# run table uses e4-512 for its e4 bar)
for site in x e1 e2 e3 e4-512 d2 d3 d4; do
  run "sampler/baseline_$site" --model paper_sampler --noise_layer "$site" \
      --optimizer adam --g_lr 1e-4 --d_lr 1e-4 \
      --g_beta1 0.5 --g_beta2 0.999 --d_beta1 0.5 --d_beta2 0.999
done

echo "=== rendering the three preset figures: $(date)"
for exp in 1 1b 2; do
  python paper_visualize.py --experiment "$exp" --root "$ROOT" \
      --out "$A/experiment$exp.pdf" \
      || echo "experiment$exp render failed"
done
echo "=== thesis figures complete: $(date)"

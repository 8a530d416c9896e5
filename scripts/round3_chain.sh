#!/usr/bin/env bash
# Post-campaign chain: wait for the parity campaign to finish, then
# regenerate PARITY.md and produce every TPU-dependent round artifact.
# Run detached (setsid nohup) so it survives the driving session.
set -u
cd "$(dirname "$0")/.."
A=workspace/artifacts
mkdir -p "$A"

all_done() {
  # the campaign runs cnn/iwgan first (FID deps), then vae/gan/wgan —
  # wait for every anchor so parity_report and the loss-curve PDFs see
  # complete runs
  for m in cnn iwgan vae gan wgan; do
    [ -f "workspace/parity/$m.done" ] || return 1
  done
  return 0
}

echo "=== chain: waiting for campaign ($(date))"
until all_done; do
  # bail out if the campaign process died without finishing
  if ! pgrep -f "scripts/parity_campaign.sh" > /dev/null \
     && ! pgrep -f "train.py.*workspace/parity" > /dev/null; then
    sleep 10
    if ! all_done; then
      echo "=== chain: campaign process gone but runs not done ($(date)) — aborting"
      exit 255
    fi
  fi
  sleep 30
done
echo "=== chain: campaign done ($(date))"

echo "=== chain: parity report"
python scripts/parity_report.py > "$A/parity_report.log" 2>&1 \
  || echo "parity_report failed"

echo "=== chain: aux artifacts"
bash scripts/aux_artifacts.sh > "$A/aux_artifacts.log" 2>&1 \
  || echo "aux_artifacts failed"

echo "=== chain: parity report (rerun — now fid.json exists, so the"
echo "    regenerated PARITY.md carries the Sample-quality section)"
python scripts/parity_report.py > "$A/parity_report2.log" 2>&1 \
  || echo "parity_report rerun failed"

echo "=== chain: deconv A/B on the real chip"
python bench.py > "$A/bench_deconv_dilated.json" \
  2> "$A/bench_deconv_dilated.log" || echo "deconv dilated bench failed"
python bench.py --deconv_impl phase_split \
  > "$A/bench_deconv_phase_split.json" \
  2> "$A/bench_deconv_phase_split.log" || echo "deconv phase_split bench failed"

echo "=== chain: complete ($(date))"
touch "$A/chain.done"

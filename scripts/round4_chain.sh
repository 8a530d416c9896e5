#!/usr/bin/env bash
# Round-4 post-campaign chain: wait for the parity campaign, then produce
# every TPU-dependent round artifact. Run detached (setsid nohup) so it
# survives the driving session. Campaign liveness is checked via the PID
# file the launcher writes (workspace/parity/campaign.pid) — never by
# process-name pattern matching.
set -u
cd "$(dirname "$0")/.."
A=workspace/artifacts
W=workspace/parity
mkdir -p "$A"

anchors_done() {
  for m in cnn iwgan vae gan wgan; do
    [ -f "$W/$m.done" ] || return 1
  done
  return 0
}

all_done() {
  anchors_done || return 1
  for m in iwgan_gps iwgan300; do
    [ -f "$W/$m.done" ] || return 1
  done
  return 0
}

campaign_alive() {
  [ -f "$W/campaign.pid" ] && kill -0 "$(cat "$W/campaign.pid")" 2>/dev/null
}

echo "=== chain: waiting for campaign ($(date))"
until all_done; do
  if ! campaign_alive; then
    sleep 10
    if ! all_done; then
      if anchors_done; then
        echo "=== chain: campaign gone; anchors done, extras missing — continuing ($(date))"
        break
      fi
      echo "=== chain: campaign process gone but anchors not done ($(date)) — aborting"
      exit 255
    fi
  fi
  sleep 30
done
echo "=== chain: campaign done ($(date))"

echo "=== chain: parity report"
python scripts/parity_report.py > "$A/parity_report.log" 2>&1 \
  || echo "parity_report failed"

echo "=== chain: fid trajectory (epochs 10/50/100 + gan/wgan + ablations)"
python scripts/fid_trajectory.py > "$A/fid_trajectory.log" 2>&1 \
  || echo "fid_trajectory failed"

echo "=== chain: aux artifacts (fid/e2e/compute benches + fullimage etc.)"
bash scripts/aux_artifacts.sh > "$A/aux_artifacts.log" 2>&1 \
  || echo "aux_artifacts failed"

echo "=== chain: parity report (rerun — fid artifacts now exist)"
python scripts/parity_report.py > "$A/parity_report2.log" 2>&1 \
  || echo "parity_report rerun failed"

echo "=== chain: thesis figure runs + experiment1/1b/2.pdf"
bash scripts/thesis_runs.sh > "$A/thesis_runs.log" 2>&1 \
  || echo "thesis_runs failed"

echo "=== chain: perf analysis (critic + generator rooflines)"
python scripts/perf_analysis.py > "$A/perf_analysis.json" \
  2> "$A/perf_analysis.log" || echo "perf_analysis failed"
python scripts/perf_analysis.py --deconv_impl phase_split \
  > "$A/perf_analysis_phase_split.json" \
  2> "$A/perf_analysis_phase_split.log" \
  || echo "perf_analysis phase_split failed"

echo "=== chain: interleaved deconv A/B"
python scripts/deconv_ab.py > "$A/deconv_ab.log" 2>&1 \
  || echo "deconv_ab failed"

echo "=== chain: final mirror of late artifacts into tracked artifacts/"
for j in perf_analysis.json perf_analysis_phase_split.json \
         fid_trajectory.json e2e_ungrouped.json e2e_cnn_g8.json; do
  if [ -s "$A/$j" ] && python -c "import json; json.load(open('$A/$j'))" \
      2>/dev/null; then
    cp "$A/$j" "artifacts/$j"
  fi
done

echo "=== chain: complete ($(date))"
touch "$A/chain.done"

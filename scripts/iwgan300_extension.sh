#!/usr/bin/env bash
# 200-epoch extension of the finished parity IWGAN anchor (FID-context
# run (b) in parity_campaign.sh — does FID keep improving past the
# reference's fixed 100-epoch recipe, i.e. is the epoch-100 number
# training-limited or architecture-limited?).
#
# parity_campaign.sh's own iwgan300 step copies the whole anchor dir and
# keeps EVERY checkpoint (--max_to_keep 0): ~27 GB copy + ~54 GB of new
# checkpoints, which does not fit this host's disk next to the finished
# campaign. This staged variant gets the identical training trajectory
# (same resume semantics, same hyperparameters) at ~1 GB: seed the run
# dir with only checkpoint-100, train to the 150/200/300 waypoints with
# --max_to_keep 3, and park each waypoint checkpoint outside the
# manager's checkpoint-*.msgpack glob until the end so pruning can't eat
# it. fid_trajectory.py then scores iwgan@{150,200,300}.
set -u
cd "$(dirname "$0")/.."
W=workspace/parity
SRC="$W/iwgan"
DST="$W/iwgan300"
echo $$ > "$W/iwgan300_ext.pid"

if [ ! -f "$SRC/checkpoint-100.msgpack" ]; then
  echo "no finished iwgan anchor to extend" >&2; exit 1
fi
# a previous campaign invocation left an empty dir + stale done marker
if [ ! -f "$DST/checkpoint-100.msgpack" ]; then
  rm -rf "$DST" "$DST.done"
  mkdir -p "$DST"
  cp "$SRC/checkpoint-100.msgpack" "$SRC/options.config" \
     "$SRC/options.json" "$DST/"
fi

COMMON="--dataset synthetic --synthetic_count 16384 --synthetic_eval_count 4096 \
 --synthetic_u8 --synthetic_shape 64 64 3 --batch_size 512 \
 --max_to_keep 3 --seed 7 --model iwgan --optimizer adam --lr 1e-4 \
 --beta1 0.5 --beta2 0.9 --n_disc_train 5"

stage() {
  local target="$1"
  if [ -f "$DST/checkpoint-$target.msgpack.keep" ]; then
    echo "skip stage $target (waypoint kept)"; return 0
  fi
  local tries=0
  until python train.py $COMMON --epochs "$target" --dir "$DST" \
        >>"$W/iwgan300.log" 2>&1; do
    code=$?
    tries=$((tries+1))
    echo "iwgan300 stage $target exited $code (try $tries)"
    if [ "$code" -eq 1 ] || [ "$tries" -ge 3 ]; then return 1; fi
    sleep 30
  done
  cp "$DST/checkpoint-$target.msgpack" "$DST/checkpoint-$target.msgpack.keep"
  echo "=== iwgan300 reached epoch $target: $(date) ==="
}

stage 150 && stage 200 && stage 300
rc=$?
# restore the parked waypoints into the manager's namespace
for k in "$DST"/checkpoint-*.msgpack.keep; do
  [ -e "$k" ] || continue
  if [ -e "${k%.keep}" ]; then rm -f "$k"; else mv "$k" "${k%.keep}"; fi
done
[ "$rc" -eq 0 ] && touch "$DST.done"
echo "=== iwgan300 extension finished rc=$rc: $(date) ==="

#!/usr/bin/env bash
# Five-trial collection protocol (reference collect_split_seq_results.sh /
# collect_euroc_two_seq_results.sh: run each configuration 5 times, file
# outputs under trial0..4, then aggregate with genstats).
#
# Usage: ./collect_results.sh <driver-args...> -o <outdir>
# Example:
#   ./analysis/collect_results.sh -t stereo_kitti -n 2 \
#       -d /data/kitti/sequences/00 -s kitti.yaml -v voc.npz -o results/kitti00
set -euo pipefail

ARGS=("$@")
OUT=""
for ((i = 0; i < ${#ARGS[@]}; i++)); do
    if [[ "${ARGS[$i]}" == "-o" ]]; then
        OUT="${ARGS[$((i + 1))]}"
    fi
done
[[ -n "$OUT" ]] || { echo "need -o <outdir>"; exit 1; }

for trial in 0 1 2 3 4; do
    echo "=== trial $trial ==="
    TRIAL_ARGS=()
    for ((i = 0; i < ${#ARGS[@]}; i++)); do
        if [[ "${ARGS[$i]}" == "-o" ]]; then
            TRIAL_ARGS+=("-o" "$OUT/trial$trial")
            i=$((i + 1))
        else
            TRIAL_ARGS+=("${ARGS[$i]}")
        fi
    done
    python -m multiagent_orb_slam2_tpu.drivers.generic_split_seq \
        "${TRIAL_ARGS[@]}"
done
echo "collected 5 trials under $OUT/trial{0..4}"

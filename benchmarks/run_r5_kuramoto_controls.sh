#!/bin/sh
# Round-5 Kuramoto controls (VERDICT r4 item 2): complete the 2x2 of
# {ELBO, deterministic MAP} x {warm-regressed encoder, constructive
# encoder} against the committed ws8k ELBO+regressed record (omega corr
# 0.949 warm -> 0.426 after ELBO training). All runs share the ws8k
# recipe: spread-0.5 workload, known lift, anchor k=1 weight 3,
# progressive 20->100 over 1500, 2500 epochs, pop4.
set -e
cd "$(dirname "$0")/.."

run() {
  tag=$1; shift
  echo "=== kuramoto $tag ==="
  timeout 3000 python benchmarks/quality_kuramoto.py --tag "$tag" \
    --seeds 4 --epochs 2500 --omega-spread 0.5 --known-lift \
    --anchor-weight 3.0 --anchor-frames 1 \
    --progressive --prog-duration 1500 "$@" \
    2>&1 | tee "benchmarks/qk_${tag}.log" | tail -3
}

# (b) deterministic control of ws8k: is the warm-basin erosion
#     variational-specific?
run kuramoto_ws8k_det --warm-start 8000 --end-beta 1e-5 --deterministic

# (a) constructive encoder: assignment removed at the encoder input;
#     short warm regression for the remaining RNN/head path
run kuramoto_constr_elbo --constructive-encoder --warm-start 4000 \
  --end-beta 1e-5

# (a)+(b): constructive + deterministic
run kuramoto_constr_det --constructive-encoder --warm-start 4000 \
  --end-beta 1e-5 --deterministic

echo CONTROLS_DONE

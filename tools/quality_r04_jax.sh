#!/bin/bash
# Round-4 paired-seed quality experiment: miner_tpu legs on the real TPU
# (fp32 + float32 matmul precision, comparable to the torch fp32 CPU legs).
# Pairs with tools/quality_r04_torch.sh — same shared corpus, same
# (init, stream) seeds, shared torch init.
set -u
cd /root/repo
ROOT=/tmp/q4
for i in 301 302 303 304 305 306 307 308; do
  mkdir -p $ROOT/pair$i
  [ -e $ROOT/pair$i/data ] || ln -s $ROOT/shared/data $ROOT/pair$i/data
  if grep -q "init=$i seed=$i" /root/repo/QUALITY_r04_jax_raw.md 2>/dev/null; then
    echo "pair $i jax leg already done, skipping"; continue
  fi
  echo "=== jax leg pair $i start $(date) ==="
  timeout 7200 python tools/quality_run.py \
    --preset mid --epochs 2 --events 12500 --eval_lines 5000 \
    --init_seed $i --train_seed $i --skip-torch --tpu --dtype fp32 \
    --out $ROOT/pair$i --report /root/repo/QUALITY_r04_jax_raw.md \
    > $ROOT/pair$i/jax.log 2>&1
  echo "=== jax leg pair $i rc=$? done $(date) ==="
done
echo "ALL JAX LEGS DONE $(date)"

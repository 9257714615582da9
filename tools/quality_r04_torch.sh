#!/bin/bash
# Round-4 powered paired-seed quality experiment: torch legs (VERDICT r3 item 1).
# 8 independent (init, stream) pairs at the mid-scale corpus, 2 epochs.
# Serial queue (1 CPU core). Paired jax legs run via quality_r04_jax.sh.
set -u
cd /root/repo
ROOT=/tmp/q4
mkdir -p $ROOT
# shared corpus, generated once (deterministic: same args -> same bits)
if [ ! -f $ROOT/shared/data/behaviors.tsv ]; then
  JAX_PLATFORMS=cpu python - <<'EOF'
import sys; sys.path.insert(0, ".")
from tools.synth_mind import make_synth_mind
make_synth_mind("/tmp/q4/shared/data", n_news=1200, n_train_lines=12500,
                n_users=1250, n_eval_lines=5000, hist_len=(20, 24))
print("corpus ready")
EOF
fi
for i in 301 302 303 304 305 306 307 308; do
  mkdir -p $ROOT/pair$i
  [ -e $ROOT/pair$i/data ] || ln -s $ROOT/shared/data $ROOT/pair$i/data
  if grep -q "init=$i seed=$i" /root/repo/QUALITY_r04_torch_raw.md 2>/dev/null; then
    echo "pair $i torch leg already done, skipping"; continue
  fi
  echo "=== torch leg pair $i start $(date) ==="
  JAX_PLATFORMS=cpu timeout 7200 python tools/quality_run.py \
    --preset mid --epochs 2 --events 12500 --eval_lines 5000 \
    --init_seed $i --train_seed $i --skip-ours \
    --out $ROOT/pair$i --report /root/repo/QUALITY_r04_torch_raw.md \
    > $ROOT/pair$i/torch.log 2>&1
  echo "=== torch leg pair $i rc=$? done $(date) ==="
done
echo "ALL TORCH LEGS DONE $(date)"

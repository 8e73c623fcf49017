#!/bin/bash
# 400-step trajectory gate for the spectral_bf16_grads train lever (round-5
# HLO-audit lever 1: bf16-rounded spectral BACKWARD intermediates, ~8.5 GB of
# f32 cotangent HBM writes -> the biggest remaining train dtype lever).
#
# Methodology = round-3 campaign gate (BASELINE.md "uint8 input wire"): same
# shipped big-lama protocol as probes/_campaign_r5.sh (5 epochs x 80 steps,
# same seed/data), lever ON, then compare the per-epoch monitor trajectory
# (checkpoints/index.json) against the lever-OFF baseline run. PASS = every
# epoch's val_ssim_total_mean within the baseline run's own epoch-to-epoch
# noise band (round 3 used ~2e-3).
#
# Prereq: /root/run_r5 exists (the campaign's baseline train run).
# Run: nohup bash probes/_traj_gate_g16.sh > /root/traj_gate_g16.log 2>&1 &
set -e
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
DATA=/root/synth_places
RUN=/root/run_r5_g16
export LAMA_DATA_ROOT=$DATA
export LAMA_EXPERIMENTS_ROOT=/root/exp_r5
export LAMA_TB_ROOT=/root/exp_r5/tb
export TORCH_HOME=/root/exp_r5/torch

step() { echo "=== [$(date -u +%H:%M:%S)] $1 ==="; }

[ -f /root/run_r5/checkpoints/index.json ] || {
  echo "baseline /root/run_r5 missing - run probes/_campaign_r5.sh first"; exit 1; }

step "train: shipped protocol + spectral_bf16_grads=true (5 x 80 steps)"
timeout 5400 python -u bin/train.py -cn big-lama run_dir=$RUN \
  trainer.kwargs.max_epochs=5 trainer.kwargs.limit_train_batches=80 \
  trainer.kwargs.input_transfer_dtype=uint8 \
  generator.spectral_kwargs.spectral_bf16_grads=true \
  losses.resnet_pl.allow_random_weights=true \
  trainer.checkpoint_kwargs.monitor=val_ssim_total_mean \
  evaluator.lpips=false evaluator.fid=false evaluator.integral_kind=null

step "compare monitor trajectories"
python - <<'EOF'
import json
base = {r['epoch']: r['value']
        for r in json.load(open('/root/run_r5/checkpoints/index.json'))}
g16 = {r['epoch']: r['value']
       for r in json.load(open('/root/run_r5_g16/checkpoints/index.json'))}
print(f'{"epoch":>5} {"baseline":>10} {"g16":>10} {"delta":>9}')
worst = 0.0
for e in sorted(set(base) & set(g16)):
    d = g16[e] - base[e]
    worst = max(worst, abs(d))
    print(f'{e:>5} {base[e]:>10.4f} {g16[e]:>10.4f} {d:>+9.4f}')
print(f'worst |delta| = {worst:.4f}  (round-3 noise band ~0.002)')
print('GATE:', 'PASS' if worst <= 0.004 else 'FAIL')
EOF
step "GATE DONE"

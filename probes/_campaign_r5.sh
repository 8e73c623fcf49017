#!/bin/bash
# Round-5 end-to-end chip campaign (VERDICT r4 item 7): train 400 steps of
# the EXACT shipped big-lama protocol on the real v5e -> select best epoch(s)
# by monitor -> tensor-average + deployment surgery -> export a
# reference-loadable torch .ckpt -> serve the val suite at the round-5
# HEADLINE mode (int8 + static scales + zero-pad + bf16 spectral store +
# phase-conv out head) -> offline-evaluate the predictions.
#
# Artifacts land under /root (survives /tmp wipes): /root/run_r5 (train run),
# /root/deploy_r5 (deployment export, also feeds the quality probes),
# /root/pred_r5 (served predictions), /root/campaign_r5_metrics.csv.
#
# Run: nohup bash probes/_campaign_r5.sh > /root/campaign_r5.log 2>&1 &
set -e
cd /root/repo
# APPEND to PYTHONPATH — the default /root/.axon_site registers the axon
# PJRT plugin; clobbering it kills the TPU backend (verify skill 2026-08-20)
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
DATA=/root/synth_places
RUN=/root/run_r5
DEPLOY=/root/deploy_r5
PRED=/root/pred_r5
export LAMA_DATA_ROOT=$DATA
export LAMA_EXPERIMENTS_ROOT=/root/exp_r5
export LAMA_TB_ROOT=/root/exp_r5/tb
export TORCH_HOME=/root/exp_r5/torch
mkdir -p /root/exp_r5/tb /root/exp_r5/torch

step() { echo "=== [$(date -u +%H:%M:%S)] $1 ==="; }

if [ ! -f $DATA/train/img00799.jpg ]; then
  step "generate synthetic places dataset (800 train + 20 val + 4 vis)"
  python probes/_gen_synth_places.py $DATA 800
fi

step "train: big-lama shipped protocol, 5 epochs x 80 steps = 400 steps"
timeout 5400 python -u bin/train.py -cn big-lama run_dir=$RUN \
  trainer.kwargs.max_epochs=5 trainer.kwargs.limit_train_batches=80 \
  trainer.kwargs.input_transfer_dtype=uint8 \
  losses.resnet_pl.allow_random_weights=true \
  trainer.checkpoint_kwargs.monitor=val_ssim_total_mean \
  evaluator.lpips=false evaluator.fid=false evaluator.integral_kind=null

step "deployment surgery: best epoch by monitor -> $DEPLOY"
rm -rf $DEPLOY
timeout 900 python -u bin/make_checkpoint.py $RUN $DEPLOY

step "export reference-loadable torch .ckpt"
timeout 900 python -u bin/export_torch_checkpoint.py $DEPLOY \
  /root/deploy_r5_ref.ckpt --device cpu

step "serve val suite at the round-5 headline mode (phase-conv out head)"
rm -rf $PRED
timeout 3000 python -u bin/predict.py model.path=$DEPLOY indir=$DATA/val \
  outdir=$PRED dataset.img_suffix=.png \
  precision=int8 quant_calibration=4 quant_zero_pad=true \
  spectral_bf16_store=true s2d_out_head=true

step "offline evaluation (SSIM + mask-area bins) of the served suite"
timeout 3000 python -u bin/evaluate_predicts.py configs/eval2.yaml \
  $DATA/val $PRED /root/campaign_r5_metrics.csv
cat /root/campaign_r5_metrics.csv

step "CAMPAIGN DONE"

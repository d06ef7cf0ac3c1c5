#!/bin/bash
# r5 mechanism FIX attempt: prediction-aware AE (--ae_pred_w) on the mov family.
# AE (pair batches + co-trained predictor) -> recon evals -> encode code64p ->
# predictability probe -> integrator on the new codes -> 400-step holdout eval.
set -u
cd /root/repo
PY="python -m deepfluids_tpu.main"
AE=logs/smoke_mov200_f400_m_aez64p

echo "=== AE pred train start $(date +%T)"
python tools/supervise.py --restart_on any --max_restarts 10 -- \
  --arch ae --dataset smoke_mov200_f400_m --z_num 64 --loss_norm l2 --beta1 0.9 \
  --eval_holdout_scenes 5 --steps_per_call 16 --device_data_cache true \
  --ae_pred_w 1.0 --watchdog_secs 300 --tag aez64p 2>/dev/null
echo "=== AE done rc=$? $(date +%T)"

echo "=== AE eval holdout $(date +%T)"
timeout 3600 python tools/eval_run.py $AE 128 \
  "r5 prediction-aware AE z=64 pred_w=1 (holdout recon)" 2>/dev/null
echo "=== AE eval train pool $(date +%T)"
timeout 3600 python tools/eval_run.py $AE 128 \
  "r5 prediction-aware AE z=64 pred_w=1 (train pool)" --pool train 2>/dev/null

echo "=== encode start $(date +%T)"
timeout 7200 $PY --arch ae --is_train false --dataset smoke_mov200_f400_m \
  --load_path $AE --code_suffix p 2>/dev/null
echo "=== encode done rc=$? $(date +%T)"

echo "=== probe on code64p $(date +%T)"
timeout 1800 python tools/latent_predictability.py data/smoke_mov200_f400_m 64 5 p \
  "r5 pred-aware AE codes: H=1" 2>/dev/null
timeout 1800 python tools/latent_predictability.py data/smoke_mov200_f400_m 64 5 p \
  --history 4 "r5 pred-aware AE codes: H=4" 2>/dev/null

echo "=== nn train start $(date +%T)"
python tools/supervise.py --restart_on any --max_restarts 10 -- \
  --arch nn --dataset smoke_mov200_f400_m --z_num 64 --w_num 60 --nn_noise 0.03 \
  --eval_holdout_scenes 5 --code_suffix p --ae_load_path $AE --watchdog_secs 300 --tag nnz64p 2>/dev/null
echo "=== nn done rc=$? $(date +%T)"

echo "=== nn eval $(date +%T)"
timeout 5400 python tools/eval_run.py logs/smoke_mov200_f400_m_nnz64p 5 \
  "r5 integrator on prediction-aware codes (H=1, w=60, noise .03)" --profile_scenes 5 2>/dev/null
echo "=== pipeline done $(date +%T)"

#!/bin/bash
# Round-5 queue, take 4 — the honest-calibration decision matrix plus the
# two jobs the sandbox reset killed mid-queue_r5c (scheduled-at-scale died
# at step 3300/12000; slow-suite timing never started).
#
# Context (DEMO.md "The same_* recall mystery solved"): per-function conf
# operating points lifted same_color recall 0.078->0.786 and overall to
# 0.648, but (1) thresholds were fit on the eval questions themselves and
# (2) the box_roi-only x per-fn cell was never run (its r4 training run
# predates trained-params checkpointing, and the r5 acc_ckpts were lost to
# the reset).  Jobs 1-2 retrain both cells with DEMO_CONF_FIT=train so the
# roi_sim/count_embed promotion decision compares box_roi vs the combined
# channels AT per-function operating points, both fit out-of-sample.
#
# Launch DETACHED (survives agent-session loss):
#   setsid nohup bash jobs/queue_r5d.sh \
#     > results/queue_r5d.log 2>&1 < /dev/null &
set -u
cd "$(dirname "$0")/.."
mkdir -p results
echo $$ > /tmp/queue_r5d.pid
mark() { echo "[queue_r5d] $(date -u +%H:%M:%S) $*" ; }

# (1) box_roi-only flagship, per-function conf, thresholds fit on TRAIN
# chains.  Same corpus/protocol/seed as the r4 0.632 headline.
mark "flagship box_roi-only, per-fn conf train-fit, starting"
DEMO_SCENES=1400 DEMO_EXE_STEPS=24000 DEMO_LR_SCHEDULE=cosine \
  DEMO_DMODEL=192 DEMO_LAYERS=3 \
  DEMO_PER_FN_CONF=1 DEMO_CONF_FIT=train \
  DEMO_OUT=results/flagship_boxroi_perfn.md \
  timeout 10800 python scripts/demo_accuracy_table.py \
  >> results/flagship_boxroi_perfn.log 2>&1
mark "flagship box_roi-only per-fn done rc=$?"

# (2) roi_sim(K=4)+count_embed flagship, same honest calibration.  The
# promotion candidate: beats box_roi at per-fn operating points (0.648 vs
# unknown) -> promote both channels; loses -> they stay opt-in with the
# eval-fit caveat recorded.
mark "flagship roi_sim+count_embed, per-fn conf train-fit, starting"
DEMO_SCENES=1400 DEMO_EXE_STEPS=24000 DEMO_LR_SCHEDULE=cosine \
  DEMO_DMODEL=192 DEMO_LAYERS=3 \
  DEMO_ROI_SIM=1 DEMO_SIM_HEADS=4 DEMO_COUNT_EMBED=1 \
  DEMO_PER_FN_CONF=1 DEMO_CONF_FIT=train \
  DEMO_OUT=results/flagship_roisim_trainfit.md \
  timeout 10800 python scripts/demo_accuracy_table.py \
  >> results/flagship_roisim_trainfit.log 2>&1
mark "flagship roi_sim+count_embed per-fn train-fit done rc=$?"

# (3) Scheduled sampling at flagship scale (VERDICT r3 #6 / r4 #5).
# Seed-resumable via results/scheduled_at_scale_ckpt.json.
mark "scheduled-at-scale starting"
timeout 12600 python scripts/demo_scheduled_at_scale.py \
  >> results/sched_scale_r5.log 2>&1
mark "scheduled-at-scale done rc=$?"

# (4) Slow-suite cold vs warm timing (VERDICT r4 #6: compilation-cache
# benefit is asserted, not measured).
mark "slow suite cold (builds cache)"
timeout 9000 python -m pytest tests/ -q -m slow > results/slowsuite_cold.log 2>&1
mark "slow suite cold rc=$?"
mark "slow suite warm (measures cache benefit)"
timeout 9000 python -m pytest tests/ -q -m slow > results/slowsuite_warm.log 2>&1
mark "slow suite warm rc=$?"
mark "queue complete"

#!/bin/sh
# reference: paper_scripts/paper_table1_k400/finetune/*.sh (UCF101 full finetune)
. "$(dirname "$0")/../common.sh"
python -m dualvar_tpu.train.classifier --preset paper_table1_ucf_ft \
  --pretrain "log/paper_table1_k400/pretrain/$EXP_NAME/model" $DATA_ARGS

#!/bin/sh
# reference: paper_scripts/paper_table2_moco_r21d/finetune/*.sh (UCF101 full finetune)
. "$(dirname "$0")/../common.sh"
python -m dualvar_tpu.train.classifier --preset paper_table1_ucf_ft \
  --pretrain "log/paper_table2_moco_r21d/pretrain/$EXP_NAME/model" $DATA_ARGS

#!/bin/sh
# reference: paper_scripts/paper_table2_re_simclr_r21d/finetune_hmdb/*.sh
. "$(dirname "$0")/../common.sh"
python -m dualvar_tpu.train.classifier --preset paper_table1_hmdb_ft \
  --pretrain "log/paper_table2_re_simclr_r21d/pretrain/$EXP_NAME/model" $DATA_ARGS

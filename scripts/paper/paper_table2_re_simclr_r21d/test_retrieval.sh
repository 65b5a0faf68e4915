#!/bin/sh
# reference: paper_scripts/paper_table2_re_simclr_r21d/test_retrieval/*.sh (k-NN retrieval, ds=4)
. "$(dirname "$0")/../common.sh"
python -m dualvar_tpu.train.classifier --preset paper_table1_ucf_ft \
  --test retrieval --pretrain "log/paper_table2_re_simclr_r21d/pretrain/$EXP_NAME/model" $DATA_ARGS

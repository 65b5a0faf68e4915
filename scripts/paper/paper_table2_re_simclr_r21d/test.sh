#!/bin/sh
# reference: paper_scripts/paper_table2_re_simclr_r21d/test/*.sh (temporal 10-clip protocol)
. "$(dirname "$0")/../common.sh"
python -m dualvar_tpu.train.classifier --preset paper_table1_ucf_ft \
  --test temporal_ten_clip --resume "log/paper_table2_re_simclr_r21d/ft/$EXP_NAME/ucf/model" $DATA_ARGS

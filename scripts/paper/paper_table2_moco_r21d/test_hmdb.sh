#!/bin/sh
# reference: paper_scripts/paper_table2_moco_r21d/test_hmdb/*.sh
. "$(dirname "$0")/../common.sh"
python -m dualvar_tpu.train.classifier --preset paper_table1_hmdb_ft \
  --test temporal_ten_clip --resume "log/paper_table2_moco_r21d/ft/$EXP_NAME/hmdb/model" $DATA_ARGS

#!/bin/sh
# reference: paper_scripts/paper_table1_k400/pretrain/*.sh
. "$(dirname "$0")/../common.sh"
python -m dualvar_tpu.train.pretrain --preset paper_table1_k400 --name_prefix "$EXP_NAME" $DATA_ARGS

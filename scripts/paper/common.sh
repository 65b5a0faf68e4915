# Shared launcher bits for the paper experiment scripts.
# Equivalent role to the reference's paper_scripts/*/*.sh: encode the
# published hyperparameters (they live in dualvar_tpu/core/config.py presets)
# and chain pretrain -> finetune -> test -> retrieval.
# DATA_ROOT: dir with ClassInd.txt + split CSVs; DB_PATH: frame JPEG root.
set -e
REPO="$(cd "$(dirname "$0")/../../.." && pwd)"
cd "$REPO"
EXP_NAME="${EXP_NAME:-$(basename "$0" .sh)}"
DATA_ARGS=""
[ -n "$DATA_ROOT" ] && DATA_ARGS="$DATA_ARGS --data_root $DATA_ROOT"
[ -n "$DB_PATH" ] && DATA_ARGS="$DATA_ARGS --db_path $DB_PATH"

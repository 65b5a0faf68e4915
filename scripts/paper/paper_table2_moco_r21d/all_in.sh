#!/bin/sh
# reference: paper_scripts/paper_table2_moco_r21d/all_in/*.sh — the full chain (alias of run)
exec sh "$(dirname "$0")/run.sh"

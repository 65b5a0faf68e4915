#!/bin/sh
# reference: paper_scripts/paper_table1_k400/finetune_test/*.sh — finetune then test
set -e
d="$(dirname "$0")"
sh "$d/finetune.sh"
sh "$d/test.sh"

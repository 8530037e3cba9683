#!/bin/bash
# Eval entry — same CLI contract as the reference do_test.sh:1-6.
# Usage: ./do_test.sh $collection $visual_feature $root_path $model_dir
set -e

collection=$1
visual_feature=$2
root_path=$3
model_dir=$4

python -m dldkd_tpu.infer --collection $collection --visual_feature $visual_feature \
    --root_path "$root_path" --dset_name $collection --model_dir "$model_dir" "${@:5}"

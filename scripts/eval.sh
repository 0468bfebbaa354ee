#!/bin/bash
# eval.sh <dataset_dir> <dataset_name> <tag>
# The reference's datasets/eval.sh:1-5 flow (metricEvaluator with
# translational {1,1,1,0,0,0} and rotational {0,0,0,1,1,1} weight
# vectors) using the built-in relations-ATE evaluator.
cd "$(dirname "$0")/.."
python -m sparse_gslam_tpu.eval.cli "$1" "$2" "${3:-run}"

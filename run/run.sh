#!/bin/bash
# batch: train every config, metric every val/, collect CSV
# (reference run/run.sh:1-4)
set -e
CONFIG_DIR=${1:-configs/release}
RESULT_DIR=${2:-output/release}
python run/train.py --config-dir "$CONFIG_DIR"
python run/eval.py --result-dir "$RESULT_DIR"
python run/read_results.py --result-dir "$RESULT_DIR" --out results.csv

#!/bin/bash
# Mine -> train -> evaluate demo loop (reference run_ft_demo.sh), fully
# on-device; defaults to the synthetic task so it runs with zero egress.
set -e

CONFIG=${1:-configs/smoke.yaml}

python -m opensearch_sparse_model_tuning_sample_tpu.cli.mine "$CONFIG"
python -m opensearch_sparse_model_tuning_sample_tpu.cli.train_ir "$CONFIG"
python -m opensearch_sparse_model_tuning_sample_tpu.cli.evaluate_beir "$CONFIG"

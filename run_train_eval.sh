#!/bin/bash
# Train + evaluate each config in sequence (reference run_train_eval.sh).
# TPU: no torchrun — the framework uses all local devices via the mesh.
set -e

if [ $# -eq 0 ]; then
    echo "Usage: $0 <config1.yaml> [config2.yaml] ..."
    exit 1
fi

for CONFIG_PATH in "$@"; do
    echo "Processing config file: $CONFIG_PATH"
    if [ ! -f "$CONFIG_PATH" ]; then
        echo "Config file not found: $CONFIG_PATH. Skipping..."
        continue
    fi
    python -m opensearch_sparse_model_tuning_sample_tpu.cli.train_ir "$CONFIG_PATH"
    python -m opensearch_sparse_model_tuning_sample_tpu.cli.evaluate_beir "$CONFIG_PATH"
    echo "Completed processing $CONFIG_PATH"
    echo "----------------------------------------"
done

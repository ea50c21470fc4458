#!/bin/bash
# Sequentially fine-tune and then run BEIR evaluation for every config given
# on the command line. TPU: no torchrun — the framework uses all local
# devices via the mesh.
set -e

if [ $# -eq 0 ]; then
    echo "Usage: $0 <config1.yaml> [config2.yaml] ..."
    exit 1
fi

for CONFIG_PATH in "$@"; do
    if [ ! -f "$CONFIG_PATH" ]; then
        echo "warning: no such config '$CONFIG_PATH', skipping"
        continue
    fi
    echo "=== train+eval: $CONFIG_PATH ==="
    python -m opensearch_sparse_model_tuning_sample_tpu.cli.train_ir "$CONFIG_PATH"
    python -m opensearch_sparse_model_tuning_sample_tpu.cli.evaluate_beir "$CONFIG_PATH"
    echo "=== done: $CONFIG_PATH ==="
done

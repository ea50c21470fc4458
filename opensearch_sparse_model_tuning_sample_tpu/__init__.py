"""TPU-native learned-sparse retrieval framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
zhichao-aws/opensearch-sparse-model-tuning-sample (inference-free learned
sparse retrieval: SPLADE-doc training, FLOPS/L0 regularization, knowledge
distillation with teacher ensembles, BEIR evaluation, hard-negative mining)
with the external OpenSearch/Lucene retrieval engine replaced by an on-device
sharded sparse index.

Layout:
    core/      mesh + sharding + dtype policy + config system
    models/    functional BERT-MLM backbone, sparse encoder, tokenizer, HF import
    ops/       pure-fn losses, FLOPS/L0 regularizers, activations, top-k
    parallel/  collective helpers over the device mesh
    train/     jitted train step, optimizer, checkpointing, teacher ensembles
    data/      datasets, samplers, collators (static-shape, TPU-friendly)
    index/     the on-device sparse retrieval engine (dense oracle + inverted)
    eval/      BEIR harness + trec-eval metrics + metrics sink
    mine/      hard-negative mining loop
    cli/       train / evaluate / mine entry points (YAML-config compatible)
"""

__version__ = "0.1.0"

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


def __getattr__(name):
    """Lazy top-level API (keeps `import opensearch_sparse_model_tuning_sample_tpu`
    light; jax only loads when something real is touched)."""
    if name in ("build_model", "BatchEncoder", "SparseEncoderModel"):
        from .models import sparse_encoder as _se

        return getattr(_se, name)
    if name in ("SparseIndex", "IndexConfig"):
        from .index import engine as _engine

        return getattr(_engine, name)
    if name == "Trainer":
        from .train.trainer import Trainer

        return Trainer
    if name in ("WordPieceTokenizer", "ByteLevelBPETokenizer", "load_tokenizer"):
        from .models import tokenizer as _tok

        return getattr(_tok, name)
    if name == "make_mesh":
        from .core.mesh import make_mesh

        return make_mesh
    raise AttributeError(name)

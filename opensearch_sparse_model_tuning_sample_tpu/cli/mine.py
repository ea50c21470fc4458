"""Hard-negative mining entry point (reference demo_train_data.py).

Usage: `python -m ...cli.mine config.yaml` — mines top-k hard negatives for
the train split of the configured BEIR dataset with the current model and
saves `data/{ds}_train` for the training recipes.
"""

from __future__ import annotations

import logging
import os

from ..core.config import parse_config
from ..core.mesh import make_mesh, maybe_init_distributed
from ..eval.beir import resolve_dataset
from ..mine.hard_negatives import mine_hard_negatives
from ..models import sparse_encoder as se
from ..utils.logging_utils import set_logging

logger = logging.getLogger(__name__)


def main(config_source=None):
    model_args, data_args, training_args, mining_args = parse_config(
        config_source, with_mining=True
    )
    set_logging(training_args.output_dir, "mine.log", training_args.log_level)
    # MiningArguments parity (reference args.py:76-79, declared there but
    # demo_train_data.py reads beir_datasets): mine_datasets wins when set;
    # `source` points the mining encoder at a specific checkpoint.
    if mining_args.source:
        model_args.model_name_or_path = mining_args.source
        # unconditional, like evaluate_beir.prepare_model_args: __post_init__
        # already defaulted tokenizer_name to the YAML's model path, so an
        # is-None guard would leave mining encoding with the OLD
        # checkpoint's vocab while using the source checkpoint's weights
        model_args.tokenizer_name = mining_args.source
    datasets = (mining_args.mine_datasets or data_args.beir_datasets).split(",")
    if len(datasets) != 1:
        raise ValueError("can only accept one beir dataset")
    name = datasets[0]

    maybe_init_distributed()
    import jax

    rank, world_size = jax.process_index(), jax.process_count()
    if world_size > 1:
        # per-rank stripe indexes are process-local; only rank 0 searches
        # (same reasoning as eval/beir.evaluate_datasets)
        mesh = make_mesh(devices=jax.local_devices())
    else:
        mesh = make_mesh(training_args.dp_size)
    model = se.from_model_args(model_args, seed=training_args.seed)

    corpus, queries, qrels = resolve_dataset(name, data_args.beir_dir, split="train")

    save_path = os.path.join("data", f"{name}_train")
    rows = mine_hard_negatives(
        corpus, queries, qrels, model,
        out_dir=os.path.join(training_args.output_dir, "tmp"),
        index_name=name.lower(),
        save_path=save_path,
        max_length=data_args.max_seq_length,
        batch_size=training_args.per_device_eval_batch_size,
        result_size=50,
        inf_free=model_args.inf_free,
        mesh=mesh,
        # lexical (idf-weighted bag-of-tokens) doc index: the offline
        # bootstrap when no pretrained encoder exists (the reference mines
        # with a pretrained doc-v2 model, demo_train_data.py:23-25)
        doc_inf_free=data_args.mine_doc_inf_free,
        rank=rank, world_size=world_size,
    )
    if rank == 0:
        logger.info("mined %d rows -> %s", len(rows), save_path)
    return rows


if __name__ == "__main__":
    main()

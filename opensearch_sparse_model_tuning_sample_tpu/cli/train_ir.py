"""Training entry point: `python -m ...cli.train_ir config.yaml`.

Reference: /root/reference/train_ir.py:30-150 — same single-YAML interface
(reference configs port 1:1; see configs/).
"""

from __future__ import annotations

import logging
import os
import shutil
import sys

import jax

from ..core.config import parse_config, snapshot_config
from ..core.mesh import make_mesh, maybe_init_distributed
from ..data.collator import build_collator
from ..data.datasets import load_dataset, load_datasets
from ..data.loader import DataLoader, epochs
from ..models import sparse_encoder as se
from ..ops.losses import build_loss_specs
from ..train.trainer import Trainer
from ..utils.logging_utils import set_logging

logger = logging.getLogger(__name__)


def main(config_source=None):
    model_args, data_args, training_args = parse_config(config_source)
    set_logging(training_args.output_dir, "train.log", training_args.log_level)
    # config snapshot for reproducibility (reference train_ir.py:33-44)
    argv_yaml = (
        config_source is None and len(sys.argv) == 2
        and sys.argv[1].endswith((".yaml", ".yml"))  # not a bare --flag
    )
    if isinstance(config_source, str) or argv_yaml:
        src = config_source or sys.argv[1]
        shutil.copy(src, os.path.join(training_args.output_dir, "train_config.yaml"))
    else:
        snapshot_config(
            model_args, data_args, training_args,
            os.path.join(training_args.output_dir, "config.yaml"),
        )

    dist = maybe_init_distributed()  # torchrun-analog launch (README.md:64-68)
    mesh = make_mesh(training_args.dp_size)
    logger.info(
        "mesh: %s devices (%s)%s", mesh.devices.size, jax.devices()[0].platform,
        f" process {jax.process_index()}/{jax.process_count()}" if dist else "",
    )

    # precomputed-embedding store for "remote" teachers (train_ir.py:50-57)
    embedding_store = None
    kd_kwargs = data_args.kd_ensemble_teacher_kwargs
    if kd_kwargs and "remote" in kd_kwargs.get("types", []):
        from ..train.embedding_store import EmbeddingStore, LocalVectorStore

        store_root = kd_kwargs.get("store_root", "data/embedding_store")
        embedding_store = EmbeddingStore(LocalVectorStore(store_root))
        logger.info("embedding store ready at %s", store_root)

    model = se.from_model_args(model_args, seed=training_args.seed)
    logger.info(
        "model: %s hidden=%d layers=%d vocab=%d",
        model_args.model_name_or_path or model_args.arch,
        model.cfg.hidden_size, model.cfg.num_hidden_layers, model.cfg.vocab_size,
    )

    # ensemble before collator: the collator derives its per-teacher feature
    # specs (wordpiece / raw-texts-for-torch-host / remote) from the built
    # teachers
    teacher_ensemble = None
    if kd_kwargs:
        from ..train.teachers import build_ensemble

        teacher_ensemble = build_ensemble(
            kd_kwargs, data_args.use_in_batch_negatives,
            max_length=data_args.max_seq_length,
        )
        logger.info("kd-ensemble teachers: %s", kd_kwargs.get("types"))

    collator = build_collator(
        data_args.data_type,
        model.tokenizer,
        data_args.max_seq_length,
        teacher_tokenizer_ids=kd_kwargs.get("teacher_tokenizer_ids", []),
        seq_buckets=data_args.seq_buckets,
        embedding_store=embedding_store,
        teacher_ensemble=teacher_ensemble,
    )

    loss_specs = build_loss_specs(data_args)
    logger.info("losses: %s", loss_specs)

    # global batch = per_device * mesh size (DP semantics parity with
    # torchrun --nproc_per_node=N per-device batches). In a multi-process
    # run the loader produces this process's LOCAL slice; the trainer
    # assembles the global batch without cross-host movement.
    global_batch = training_args.per_device_train_batch_size * mesh.devices.size
    # one loader batch per OPTIMIZER step: with gradient accumulation the
    # trainer slices it into A microbatches (HF effective batch semantics:
    # per_device * n_dev * gradient_accumulation_steps samples per update)
    global_batch *= max(1, training_args.gradient_accumulation_steps)
    loader_batch = (
        global_batch // jax.process_count() if dist else global_batch
    )
    if data_args.train_file is not None:
        dataset = load_dataset(
            data_args.train_file, data_args.data_type,
            swap_times=data_args.swap_times,
            sample_num_one_query=data_args.sample_num_one_query,
            first_rank_thresh=data_args.first_rank_thresh,
            score_scale=data_args.score_scale,
            shuffle_seed=training_args.seed,
        )
        if dist:
            # single-file datasets shard across processes here (the dir path
            # load_datasets shards internally; reference DDPDatasetWithRank)
            from ..data.datasets import HostShardDataset

            dataset = HostShardDataset(
                dataset, jax.process_index(), jax.process_count(),
                drop=True,  # equal shard sizes: ranks agree on batch counts
            )
    elif data_args.train_file_dir is not None:
        dataset = load_datasets(
            data_args.train_file_dir, data_args.data_type,
            swap_times=data_args.swap_times,
            sample_num_one_query=data_args.sample_num_one_query,
            first_rank_thresh=data_args.first_rank_thresh,
            score_scale=data_args.score_scale,
            shuffle_seed=training_args.seed,
        )
    else:
        raise ValueError("train_file or train_file_dir must be specified")

    loader = DataLoader(
        dataset, batch_size=loader_batch, collate_fn=collator,
        drop_last=training_args.dataloader_drop_last, seed=training_args.seed,
        prefetch=training_args.dataloader_prefetch_factor or 0,
    )

    trainer = Trainer(
        model, model_args, data_args, training_args,
        loss_specs=loss_specs, teacher_ensemble=teacher_ensemble, mesh=mesh,
    )
    if training_args.resume:
        state_dir = os.path.join(
            os.path.abspath(training_args.output_dir), "train_state"
        )
        if os.path.isdir(state_dir):
            trainer.restore_train_state(state_dir)
            logger.info("resumed from %s at step %d", state_dir,
                        int(trainer.state.step))
        else:
            logger.info("resume requested but no train_state at %s; fresh run",
                        state_dir)

    def batches():
        # exact resume: fast-forward the data stream to the restored step so
        # the resumed run sees the same batch sequence as an uninterrupted one
        for batch in epochs(loader, training_args.max_steps,
                            start=int(trainer.state.step)):
            if embedding_store is not None:
                batch = collator.resolve_pending(batch)
            yield batch

    trainer.train(batches())
    trainer.save_train_state()
    logger.info("training complete at step %d", int(trainer.state.step))
    return trainer


if __name__ == "__main__":
    main()

# Convenience targets. The `env -u PALLAS_AXON_POOL_IPS` on CPU runs prevents
# test processes from claiming the tunnelled TPU session (see
# .claude/skills/verify/SKILL.md for the environment notes).

.PHONY: test native bench smoke

test:
	env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python -m pytest tests/ -q

native:
	bash native/build.sh

bench:
	python bench.py

smoke:
	python -m opensearch_sparse_model_tuning_sample_tpu.cli.mine configs/smoke.yaml
	python -m opensearch_sparse_model_tuning_sample_tpu.cli.train_ir configs/smoke.yaml
	python -m opensearch_sparse_model_tuning_sample_tpu.cli.evaluate_beir configs/smoke.yaml

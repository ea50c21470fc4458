"""Test configuration: force an 8-device virtual CPU mesh.

The JAX-native analog of a fake distributed backend (the reference has none —
SURVEY.md §4): every multi-device code path is exercised on CPU with
XLA_FLAGS=--xla_force_host_platform_device_count=8.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"
# do NOT claim the tunnelled TPU from test processes (the axon plugin
# registers — and holds a device session — for any process importing jax
# while PALLAS_AXON_POOL_IPS is set, even if tests then run on CPU)
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

import jax  # noqa: E402
import pytest  # noqa: E402

# The environment pins JAX_PLATFORMS=axon (real TPU) via sitecustomize; tests
# must run on the virtual 8-device CPU mesh, so override after import.
jax.config.update("jax_platforms", "cpu")


@pytest.fixture(scope="session")
def mesh8():
    from opensearch_sparse_model_tuning_sample_tpu.core.mesh import make_mesh

    assert len(jax.devices()) == 8
    return make_mesh(8)


@pytest.fixture(scope="session")
def tiny_model():
    from opensearch_sparse_model_tuning_sample_tpu.models import sparse_encoder as se

    return se.build_model(arch="tiny", idf_path="assets/idf.npz", seed=0)

"""Test env: CPU backend with 8 virtual devices (the idiomatic JAX way to
test shard_map/pjit collectives without a TPU pod — SURVEY.md §4).

NOTE: this image's sitecustomize registers an 'axon' TPU backend and
overwrites jax_platforms, so the env var alone is not enough — we must
update jax.config after import, before any backend is initialized.
"""

import os

if os.environ.get("MMNAS_TEST_TPU", "0") != "1":
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )

    import jax  # noqa: E402

    jax.config.update("jax_platforms", "cpu")
# MMNAS_TEST_TPU=1 leaves the real TPU backend active (for the TPU-only
# test modules, e.g. tests/test_pallas_dropout_tpu.py).

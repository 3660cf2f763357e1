"""Test configuration.

Tests run on CPU with 8 virtual devices by default so that sharding /
collective code paths are exercised without a TPU pod (per SURVEY.md §4).
Set VALIDA_TPU_TESTS_ON_TPU=1 to run against the real chip instead.

Note: the environment's sitecustomize registers the `axon` TPU platform at
interpreter start and forces jax_platforms="axon,cpu", so we must override
via jax.config *after* import — plain env vars are ignored.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("VALIDA_TPU_TESTS_ON_TPU", "0") != "1":
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

    # run the proving pipeline on the numpy backend by default: identical
    # code paths, no per-op dispatch/compile overhead on host
    from valida_tpu import backend

    backend.set_backend("numpy")

"""Test configuration: run everything on a virtual 8-device CPU mesh.

The environment registers a remote-TPU ("axon") PJRT plugin at interpreter
start and force-sets jax_platforms to it; tests must run on CPU with 8
virtual devices, so we (a) set the XLA host-device-count flag before any
backend initializes and (b) override the jax_platforms *config* (the env var
alone is ignored because the plugin registration overwrote the config).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# persistent compile cache: the 8-device shard_map grad programs cost
# minutes each to compile on CPU; cached, repeat suite runs drop from
# ~40 min to minutes. Keyed on program + flags, so code changes that
# alter a program recompile as usual.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.default_backend() == "cpu"
assert len(jax.devices()) == 8


@pytest.fixture
def rng():
    return np.random.default_rng(0)

import os
import subprocess
import sys

# Tests run on the CPU backend with 8 virtual devices so sharding tests
# exercise a real multi-device mesh without TPU hardware.
os.environ["JAX_PLATFORMS"] = "cpu"  # override the session's axon default
# CPU cache entries load fine; the no-cache guard is a TPU-relay fix
os.environ.setdefault("SALT_TPU_VERIFY_CACHE", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# jax is pre-imported by the environment's startup hook, so the env vars
# above are too late for its config snapshot — set the config directly.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pytest  # noqa: E402

ORACLE_DIR = "/tmp/oracle"
REF_BIN = "/tmp/refbuild/Bin"


def have_oracle():
    return os.path.isdir(ORACLE_DIR) and os.path.exists(os.path.join(ORACLE_DIR, "idx.ref"))


requires_oracle = pytest.mark.skipif(
    not have_oracle(), reason="reference oracle data not present in /tmp/oracle"
)

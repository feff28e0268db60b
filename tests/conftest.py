import os
import sys

# Force CPU with 8 virtual devices so sharding tests run anywhere.
# Real-TPU benchmarking uses bench.py, which does NOT import this conftest.
# NOTE: a sitecustomize may have latched jax_platforms from the environment
# already, so update the jax config directly (env vars alone are ignored
# after the config module is imported).
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DATA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")
GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")

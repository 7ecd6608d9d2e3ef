"""Test config: run everything on CPU with 8 virtual devices.

The standard JAX trick for testing pjit/shard_map without hardware:
``xla_force_host_platform_device_count`` (set before first backend init).

Note: this image's sitecustomize pre-imports jax and registers a remote
TPU backend in every process; backend *initialization* is lazy, so forcing
``jax_platforms=cpu`` via jax.config here (before any jax use) keeps tests
off the TPU tunnel entirely.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
# CPU-only tests: skip heavy backend optimization passes (big compile speedup)
if "xla_backend_optimization_level" not in flags:
    flags += " --xla_backend_optimization_level=0"
os.environ["XLA_FLAGS"] = flags.strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the suite's wall-time is dominated by jit
# compiles of model train/eval steps; caching them across runs cuts
# re-runs to a fraction of the cold time.
_cache_dir = os.path.join(
    os.path.expanduser("~"), ".cache", "unet_zoo_tpu", "jax_test_cache")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

assert jax.device_count() >= 8, (
    "tests expect >=8 virtual CPU devices; got "
    f"{jax.device_count()} on {jax.devices()[0].platform}"
)

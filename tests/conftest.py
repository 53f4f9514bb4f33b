"""Test configuration: run the whole suite on a virtual 8-device CPU mesh
so sharding paths are exercised without TPU hardware (SURVEY.md section 4's
planned test pyramid, item 4)."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Persistent compilation cache: the suite is compile-dominated on CPU.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

# The axon TPU plugin in this image ignores the JAX_PLATFORMS env var;
# the config knob does take effect.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# this jax build ignores the JAX_COMPILATION_CACHE_DIR env var too — only
# the config knobs initialize the persistent compile cache (verified via
# jax._src.compilation_cache debug logs); without these the whole suite
# recompiles every run (~28 min vs ~? with cache hits)
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

"""Test configuration: run the whole suite on a virtual 8-device CPU mesh
so sharding paths are exercised without TPU hardware (SURVEY.md section 4's
planned test pyramid, item 4)."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_backend_optimization_level" not in flags:
    # the suite is XLA:CPU-compile-dominated and tests only need
    # correctness; opt level 0 measured ~15% faster end-to-end on the
    # heavy train-step tests (2026-08-21) with identical pass/fail
    flags = (flags + " --xla_backend_optimization_level=0").strip()
os.environ["XLA_FLAGS"] = flags

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Persistent compilation cache: the suite is compile-dominated on CPU.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

# The axon TPU plugin in this image ignores the JAX_PLATFORMS env var;
# the config knob does take effect.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
if os.environ.get("MULACTSEG_TEST_CPU_CACHE"):
    # OPT-IN persistent compile cache for the CPU suite (see the warning
    # below for why it is not on by default): point the env var at a
    # cache dir to make warm suite runs compile-free. Revalidated
    # 2026-08-21: entries load with a machine-feature WARNING
    # (+prefer-no-scatter) but correct results; delete the dir if a
    # hang is ever observed again.
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["MULACTSEG_TEST_CPU_CACHE"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
# DO NOT enable the persistent compile cache here. This jax build ignores
# the JAX_COMPILATION_CACHE_DIR env var (only the config knobs work), but
# enabling it for the CPU backend is a trap: the cached XLA:CPU AOT
# executables record machine features (+prefer-no-scatter/+prefer-no-
# gather) that fail the host feature check on reload — XLA warns about
# SIGILL and loaded programs were observed to HANG (tests stuck in
# ALTrainer construction for 9+ min). TPU-side scripts (bench.py,
# tools_dev/*) keep the knobs — the TPU cache serializes portable
# executables and works.

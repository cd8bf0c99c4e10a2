"""Test configuration.

Preferred backend: CPU with 8 virtual devices, so (a) tests are
deterministic and runnable anywhere, and (b) the multi-chip sharding path
(orb_slam2_e_tpu.parallel) is exercised without TPU hardware.

Caveat: some environments ship a patched jax whose remote-TPU plugin
("axon" tunnel) ignores/overrides JAX_PLATFORMS — there, tests run on the
tunneled TPU chip regardless. The "axon" *alias* backend has proven flaky
(worker crashes); selecting the empty string lets jax pick the direct
"tpu" plugin, which is stable. On normal installs the cpu forcing below
works as intended.
"""

import os

if os.environ.get("JAX_PLATFORMS") == "axon":
    # patched-jax tunnel environment: the axon alias is flaky; '' lets jax
    # resolve the direct tpu plugin (JAX_PLATFORMS=cpu is ignored there).
    os.environ["JAX_PLATFORMS"] = ""
else:
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent compilation cache: repeated test runs over the tunneled TPU
# otherwise recompile every program (~minutes per run).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

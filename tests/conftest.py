"""Test configuration: force CPU with 8 virtual devices so (a) tests are
deterministic and runnable anywhere, and (b) the multi-chip sharding path
(orb_slam2_e_tpu.parallel) is exercised without TPU hardware.

Note: the session environment may preset JAX_PLATFORMS (e.g. a TPU tunnel),
so this must override, not setdefault."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

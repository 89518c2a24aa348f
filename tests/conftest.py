"""Test config: run JAX on a virtual 8-device CPU mesh so sharding and
kernel tests execute anywhere (interpret-mode Pallas, shard_map over 8
virtual devices).  Must run before the first `import jax`."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

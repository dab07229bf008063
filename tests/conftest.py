"""Test configuration: run JAX on a virtual 8-device CPU mesh.

This is the TPU-world equivalent of a fake cluster (SURVEY.md §4): all
sharding/pjit tests run against 8 XLA host devices so multi-chip code is
exercised without TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
import re as _re

flags = os.environ.get("XLA_FLAGS", "")
_m = _re.search(r"--xla_force_host_platform_device_count=(\d+)", flags)
if _m is None:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
elif int(_m.group(1)) < 8:
    os.environ["XLA_FLAGS"] = flags.replace(
        _m.group(0), "--xla_force_host_platform_device_count=8")

# The axon TPU plugin overrides JAX_PLATFORMS on load; force CPU explicitly.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

"""Probe wrapper: AOT-compile the PRODUCTION-dims (ViT-L, 1536^2)
multi-chip programs on a fake 8-device CPU mesh (VERDICT r3 #3).

The actual compile-and-audit logic lives in
`__graft_entry__._certify_full_dims` — the driver-run certifier — so
there is exactly ONE HLO collective parser and one program builder to
maintain (an earlier standalone copy of this flow had a divergent
regex that over-counted collectives from HLO metadata).

Run: python scripts/fulldims_compile_probe.py | tee scripts/fulldims_compile_probe.out
"""

import os
import sys

sys.path.insert(0, "/root/repo")

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import __graft_entry__ as g

g._certify_full_dims(8)

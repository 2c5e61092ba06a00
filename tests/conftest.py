"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on 8 virtual CPU devices (`xla_force_host_platform_device_count`),
and the driver separately dry-runs the multi-chip path via
`__graft_entry__.dryrun_multichip`.

NOTE: this environment injects an `axon` remote-TPU PJRT plugin via
sitecustomize which force-sets `jax_platforms="axon,cpu"` at interpreter
start (overriding the JAX_PLATFORMS env var).  Tests must re-update the
config AFTER importing jax — env vars alone do not stick.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    # must be set before the CPU backend is first initialized
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu", jax.devices()

"""Test config: run everything on a virtual 8-device CPU mesh.

The shell exports JAX_PLATFORMS=axon (the real TPU tunnel) and the axon PJRT
plugin can override the env var during backend init, so env mutation alone is
unreliable — tests were silently landing on the TPU, where f32 matmuls run in
bfloat16 (observed matmul error 0.2 vs 4e-5 on CPU) and eager ops pay ~30 ms
tunnel RTT. Forcing the platform through jax.config before any backend use is
authoritative.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.devices()

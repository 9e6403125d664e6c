"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-chip shardings are validated without TPU hardware by forcing the host
platform to expose 8 devices (SURVEY.md §4 implication; driver contract).
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

"""Test environment: force CPU with 8 virtual devices (multi-chip emulation).

The container's sitecustomize registers the 'axon' TPU-tunnel backend and
calls ``jax.config.update("jax_platforms", "axon,cpu")`` at interpreter
startup, which overrides the JAX_PLATFORMS env var. Tests must not touch the
(single, contended) TPU tunnel, so re-update the config to cpu here — this
runs before any test module imports jax-using code.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

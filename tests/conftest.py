"""Test harness setup.

Tests run on CPU jax with a virtual 8-device mesh so sharding logic is
exercised without TPU hardware (the driver separately dry-runs the
multi-chip path; bench.py runs on the real chip).

NOTE: this environment pre-imports jax via sitecustomize with
``jax_platforms = axon,cpu`` (the real TPU tunnel), so setting
``JAX_PLATFORMS`` here is too late — we must flip the live config instead.
``XLA_FLAGS`` still works because the CPU client only parses it at first
backend initialization, which hasn't happened yet at conftest time.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

"""Test config: force a virtual 8-device CPU mesh.

The reference has no multi-node test fakes (SURVEY.md §4); here every test
runs against JAX's CPU backend with 8 virtual devices so sharding/collective
code paths are exercised without TPU hardware.

Note: this image's sitecustomize registers the TPU PJRT plugin at
interpreter start (jax is already imported before conftest runs), so the
platform must be forced through jax.config, not env vars.
"""
import os

import jax

if os.environ.get("E4T_TEST_ON_TPU", "0") != "1":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

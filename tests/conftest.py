"""Test configuration: force CPU with 8 virtual devices (multi-chip tests run on
a virtual mesh, per SURVEY.md §4.3) before jax is imported anywhere."""

import os

# The ambient environment pins JAX_PLATFORMS=axon (the real TPU tunnel) and a
# sitecustomize registers the axon backend in every interpreter; tests must run
# on the virtual CPU mesh, so force cpu both via env and jax.config.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import sys
from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

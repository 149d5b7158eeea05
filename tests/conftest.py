"""Test configuration: force CPU with 8 virtual devices so multi-chip sharding
logic is exercised without TPU hardware (SURVEY §4: multi-chip tests runnable
on CPU via xla_force_host_platform_device_count)."""

import os

# Force CPU even when the environment preselects a TPU platform (the axon
# tunnel overrides JAX_PLATFORMS from the environment, so the jax.config
# update below is also required).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import pathlib
import sys

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """XLA's CPU backend has segfaulted inside backend_compile_and_load /
    executable serialization after ~130 tests' worth of accumulated compiled
    programs (observed twice at different suite positions, never in any
    subset run).  Dropping executable references between modules keeps the
    live-compilation footprint bounded; reruns within a module still hit the
    in-memory cache."""
    yield
    jax.clear_caches()


REFERENCE = pathlib.Path("/root/reference")
SMALL_CODE_FILE = REFERENCE / "J_3_K_3_L_6_P_7_s_2_t_3.txt"
CODE610_FILE = REFERENCE / "QEC_LDPC" / "code610.txt"


@pytest.fixture(scope="session")
def small_code():
    from qec_ldpc_tpu.codes import load_code_file

    return load_code_file(str(SMALL_CODE_FILE))


@pytest.fixture(scope="session")
def code610():
    from qec_ldpc_tpu.codes import load_code_file

    return load_code_file(str(CODE610_FILE))


@pytest.fixture(scope="session")
def small_graphs(small_code):
    from qec_ldpc_tpu.decoder import CodeGraphs

    return CodeGraphs.build(small_code)


@pytest.fixture(scope="session")
def small_code_file():
    return str(SMALL_CODE_FILE)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)

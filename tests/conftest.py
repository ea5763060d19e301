"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh so that multi-chip sharding logic is
exercised without TPU hardware (the flags must be set before jax imports)."""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

# The sandbox's sitecustomize force-registers a remote-TPU backend and
# overrides jax_platforms at interpreter startup; reset it so tests run on
# the local 8-device virtual CPU mesh.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the slow e2e/sharding tests spend most of
# their wall-time in XLA:CPU compiles of the same graphs every run; caching
# them cuts repeat runs dramatically (VERDICT r3 #7).  Repo-local but
# gitignored (binary, XLA-version-keyed artifacts) — NOTE: the sandbox
# resets between sessions and only committed files survive, so the warm
# benefit applies to repeat runs WITHIN a session, not across rounds.
_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_compilation_cache",
)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import json
import pathlib

import pytest

DATA_DIR = pathlib.Path(__file__).parent / "data"
REFERENCE_DIR = pathlib.Path("/root/reference/code")


@pytest.fixture(scope="session")
def golden():
    with open(DATA_DIR / "golden_reference.json") as f:
        return json.load(f)


@pytest.fixture(scope="session")
def golden_synthetic():
    with open(DATA_DIR / "golden_synthetic.json") as f:
        return json.load(f)


@pytest.fixture(scope="session")
def fixture_scene():
    path = REFERENCE_DIR / "inspecting_scripts" / "CLEVR_val_scenes_first.json"
    if not path.exists():
        pytest.skip("reference fixtures unavailable")
    with open(path) as f:
        return json.load(f)["scenes"][0]


@pytest.fixture(scope="session")
def fixture_val_question():
    path = REFERENCE_DIR / "inspecting_scripts" / "CLEVR_val_questions_first.json"
    if not path.exists():
        pytest.skip("reference fixtures unavailable")
    with open(path) as f:
        return json.load(f)["questions"][0]


@pytest.fixture(scope="session")
def fixture_train_question():
    path = REFERENCE_DIR / "examples" / "CLEVR_train_questions_first.json"
    if not path.exists():
        pytest.skip("reference fixtures unavailable")
    with open(path) as f:
        return json.load(f)["questions"][0]

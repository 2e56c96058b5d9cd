"""Test configuration.

JAX device tests run on a virtual 8-device CPU mesh (the standard trick
for testing pod sharding without a pod) — must be set before jax import.
"""

import os
import pathlib
import shutil
import subprocess

import pytest

os.environ.pop("PALLAS_AXON_POOL_IPS", None)  # keep the axon TPU plugin out
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

# The environment's sitecustomize may have imported jax and pinned the
# TPU platform before this file runs; the config update below still wins
# as long as no backend has been initialized yet.
import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

REPO = pathlib.Path(__file__).resolve().parent.parent
ORACLE_DIR = REPO / "tests" / "oracle"
ORACLE_BIN = ORACLE_DIR / "bin" / "alignasm_ref"
DATA_DIR = REPO / "tests" / "data"


@pytest.fixture(scope="session")
def oracle_bin() -> pathlib.Path:
    """Build (if needed) and return the reference oracle binary."""
    if not ORACLE_BIN.exists():
        subprocess.run(["make", "-C", str(ORACLE_DIR)], check=True, capture_output=True)
    return ORACLE_BIN


def run_oracle(oracle: pathlib.Path, paf: pathlib.Path, workdir: pathlib.Path, extra=()):
    """Run the oracle on a copy of ``paf`` inside ``workdir``; returns the
    three output paths."""
    local = workdir / paf.name
    if local.resolve() != paf.resolve():
        shutil.copy(paf, local)
    subprocess.run(
        [str(oracle), str(local), *extra],
        check=True, capture_output=True, cwd=workdir,
    )
    stem = str(local)[: -len(".paf")]
    return (
        pathlib.Path(stem + ".aln.paf"),
        pathlib.Path(stem + ".aln.alt.paf"),
        pathlib.Path(stem + ".aln.all.paf"),
    )

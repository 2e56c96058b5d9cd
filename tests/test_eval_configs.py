"""The BASELINE evaluation configs through every engine vs the oracle."""

import copy
import pathlib

import pytest

import dataclasses

from alignasm_tpu import native
from alignasm_tpu.config import DEFAULT_CONFIG
from alignasm_tpu.engine.exact import solve_dataset
from alignasm_tpu.io.paf import read_paf
from alignasm_tpu.runtime.scheduler import solve_dataset_tpu
from alignasm_tpu.testing.synth import EVAL_CONFIGS
from tests.conftest import run_oracle


@pytest.mark.parametrize("name", sorted(EVAL_CONFIGS))
def test_eval_config_all_engines(oracle_bin, tmp_path, name):
    paf = tmp_path / f"{name}.paf"
    paf.write_text(EVAL_CONFIGS[name]())
    oracle_outs = run_oracle(oracle_bin, paf, tmp_path)

    # native engine: byte-identical files
    nat = tmp_path / f"n_{name}.paf"
    nat.write_bytes(paf.read_bytes())
    native.run(str(nat), threads=4)
    for o, suffix in zip(oracle_outs, ("", ".alt", ".all")):
        got = pathlib.Path(str(nat)[:-4] + f".aln{suffix}.paf")
        assert o.read_bytes() == got.read_bytes(), f"{name} aln{suffix} (native)"

    # device engine: byte-identical files ON DISK through the full
    # native write path (not just structural equality with exact)
    ds = read_paf(paf)
    ds2 = copy.deepcopy(ds)
    dev = tmp_path / f"d_{name}.paf"
    dev.write_bytes(paf.read_bytes())
    device_cfg = dataclasses.replace(DEFAULT_CONFIG,
                                     device_routing="always")
    solve_dataset_tpu(read_paf(dev), device_cfg,
                      src_paths=(str(dev), None),
                      write_prefix=str(dev)[:-4])
    for o, suffix in zip(oracle_outs, ("", ".alt", ".all")):
        got = pathlib.Path(str(dev)[:-4] + f".aln{suffix}.paf")
        assert o.read_bytes() == got.read_bytes(), f"{name} aln{suffix} (device)"

    # and the in-memory device path equals the exact engine structurally
    t = solve_dataset_tpu(ds, device_cfg, src_paths=(str(paf), None))
    assert t == solve_dataset(ds2, DEFAULT_CONFIG), f"{name} (device)"

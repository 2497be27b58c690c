"""Multi-PROCESS SPMD execution (VERDICT r4 item 1, SURVEY §2d P4 / §7 step
7): the mesh SLAM engine runs across 2 OS processes (4 virtual CPU devices
each) joined into one global 8-device mesh by jax.distributed, with gloo
carrying every collective across the process boundary — and the result is
bit-identical to the single-process 8-device run of the same program.

Spawns real subprocesses (the distributed runtime cannot be formed inside
the already-initialized test process); ~4-8 min wall on 2 cores, dominated
by per-process XLA compiles."""

import importlib.util
import os
import shutil

import pytest

_SPEC = importlib.util.spec_from_file_location(
    "run_mp_spmd", os.path.join(os.path.dirname(__file__), "..", "tools",
                                "run_mp_spmd.py"))
_MOD = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(_MOD)
launch = _MOD.launch


@pytest.mark.slow
def test_two_process_mesh_bit_identical(tmp_path):
    cmp = launch(scans=24, radius=12.0, port=29641,
                 workdir=str(tmp_path / "mp"))
    assert cmp["mp_topology"]["process_count"] == 2
    assert cmp["mp_topology"]["global_devices"] == 8
    assert cmp["sp_topology"]["process_count"] == 1
    assert cmp["procs_agree"], cmp
    assert cmp["bit_identical_to_single_process"], cmp
    assert cmp["kf_count"] > 5
    shutil.rmtree(tmp_path / "mp", ignore_errors=True)

"""2-process CPU simulation of the multi-host harness (VERDICT r1 item 9;
SURVEY §5 distributed backend): real-pod numbers are blocked on hardware,
so the full flow — jax.distributed.initialize, global mesh over two
processes, global arrays from process-local shards, sharded EM steps with
psum Gram reductions — is validated by spawning two coordinated CPU
processes and checking they agree with a single-process run on the SAME
deterministic global batch."""

import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HARNESS = os.path.join(REPO, "examples", "multihost_dict_learning.py")

COMMON = ["--batch", "64", "--dim", "16", "--atoms", "32",
          "--steps", "3", "--maxiter", "30"]


def _env(n_local_devices):
    env = dict(os.environ)
    # strip the axon sitecustomize pin so JAX_PLATFORMS=cpu works in the
    # children; keep the repo importable
    pyp = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
           if p and "axon" not in p]
    env["PYTHONPATH"] = os.pathsep.join([REPO] + pyp)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = ("--xla_force_host_platform_device_count="
                        f"{n_local_devices}")
    return env


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _parse_report(stdout):
    for line in stdout.strip().splitlines():
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise AssertionError(f"no JSON report in output:\n{stdout}")


def _run_topologies(extra, n_procs=2, local_devices=2):
    """Run the harness ``n_procs``-process (``local_devices`` simulated
    devices each) and single-process (same global device count) on the
    same global batch; return (report_multi, report_single)."""
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    procs = [
        subprocess.Popen(
            [sys.executable, HARNESS, "--coordinator", coord,
             "--num-processes", str(n_procs), "--process-id", str(i)]
            + COMMON + extra,
            env=_env(local_devices), stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True)
        for i in range(n_procs)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"child failed rc={rc}\nstdout:{out}\nstderr:{err}"
    report_multi = _parse_report(outs[0][1])

    single = subprocess.run(
        [sys.executable, HARNESS] + COMMON + extra,
        env=_env(n_procs * local_devices), capture_output=True, text=True,
        timeout=600)
    assert single.returncode == 0, single.stderr
    return report_multi, _parse_report(single.stdout)


@pytest.mark.slow
@pytest.mark.parametrize("dict_update", ["sequential", "block"])
def test_two_process_constrained_matches_single_process(dict_update):
    """Constrained (unit-norm-atom) training across 2 simulated hosts
    (VERDICT r2 items 3+7): the per-atom psum'd sequential M-step and the
    block M-step must reproduce the single-process EM trajectory."""
    report2, report1 = _run_topologies(
        ["--constrained", "--dict-update", dict_update])
    assert report2["processes"] == 2
    assert abs(report2["final_loss"] - report1["final_loss"]) \
        <= 1e-4 * max(1.0, abs(report1["final_loss"]))


@pytest.mark.slow
def test_two_process_cpu_simulation_matches_single_process():
    port = _free_port()
    coord = f"127.0.0.1:{port}"

    procs = [
        subprocess.Popen(
            [sys.executable, HARNESS, "--coordinator", coord,
             "--num-processes", "2", "--process-id", str(i)] + COMMON,
            env=_env(2), stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"child failed rc={rc}\nstdout:{out}\nstderr:{err}"

    report2 = _parse_report(outs[0][1])
    assert report2["processes"] == 2
    assert report2["devices"] == 4  # 2 procs x 2 local devices
    assert report2["value"] > 0

    # single-process run on the SAME deterministic global batch
    single = subprocess.run(
        [sys.executable, HARNESS] + COMMON,
        env=_env(4), capture_output=True, text=True, timeout=300)
    assert single.returncode == 0, single.stderr
    report1 = _parse_report(single.stdout)

    # the sharded EM trajectory must agree across process topologies
    assert abs(report2["final_loss"] - report1["final_loss"]) \
        <= 1e-4 * max(1.0, abs(report1["final_loss"]))


@pytest.mark.slow
def test_four_process_matches_single_process():
    """4 simulated hosts x 2 devices (VERDICT r3 item 8): four-way
    contiguous process-local batch splits over an 8-device data axis —
    a process-to-mesh mapping 2 processes cannot exercise (each process
    owns a strict minority of the axis)."""
    report4, report1 = _run_topologies([], n_procs=4, local_devices=2)
    assert report4["processes"] == 4
    assert report4["devices"] == 8
    assert abs(report4["final_loss"] - report1["final_loss"]) \
        <= 1e-4 * max(1.0, abs(report1["final_loss"]))


@pytest.mark.slow
def test_four_process_2d_mesh_model_parallel():
    """4 hosts x 2 devices with a ('data'=4, 'model'=2) mesh: the model
    (atom-sharding) axis lives INSIDE each process while the data axis
    crosses process boundaries — the 2-D process-to-mesh mapping of a
    real pod slice. The GSPMD route's all-gathers and the psum'd ridge
    must reproduce the single-process trajectory."""
    report4, report1 = _run_topologies(["--model-parallel", "2"],
                                       n_procs=4, local_devices=2)
    assert report4["processes"] == 4
    assert report4["devices"] == 8
    assert abs(report4["final_loss"] - report1["final_loss"]) \
        <= 1e-4 * max(1.0, abs(report1["final_loss"]))

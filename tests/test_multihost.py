"""Multi-host bootstrap (v1t_tpu/parallel/multihost.py): single-process
no-op semantics, host-local batch stitching on the virtual mesh, and a real
2-process jax.distributed run over localhost (CPU backend)."""

import os
import socket
import subprocess
import sys
import textwrap

import jax
import numpy as np
import pytest

from v1t_tpu.parallel.multihost import (
    global_mesh,
    host_local_batch_to_global,
    initialize_distributed,
)


def test_initialize_is_noop_single_process():
    # must not raise and must not try to contact a coordinator
    initialize_distributed()
    initialize_distributed(num_processes=1)
    assert jax.process_count() == 1


def test_global_mesh_covers_all_devices():
    mesh = global_mesh()
    assert mesh.devices.size == len(jax.devices())
    assert mesh.axis_names == ("data",)


def test_host_local_batch_to_global_single_process():
    """Single process: the 'local' batch IS the global batch; values and
    sharding must match DataParallel.shard_batch."""
    mesh = global_mesh()
    rng = np.random.default_rng(0)
    batch = {
        "image": rng.normal(size=(16, 1, 4, 6)).astype(np.float32),
        "response": rng.normal(size=(16, 8)).astype(np.float32),
        "mouse_id": "A",  # non-array passthrough
    }
    out = host_local_batch_to_global(mesh, batch)
    assert out["mouse_id"] == "A"
    for key in ("image", "response"):
        np.testing.assert_array_equal(np.asarray(out[key]), batch[key])
        assert out[key].sharding.spec[0] == "data"


_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    sys.path.insert(0, {repo!r})
    from v1t_tpu.parallel.multihost import (
        global_mesh, host_local_batch_to_global, initialize_distributed,
    )

    pid = int(sys.argv[1])
    initialize_distributed(
        coordinator_address=sys.argv[2], num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4  # 2 hosts x 2 local devices

    mesh = global_mesh()
    # each host contributes rows [pid*4, pid*4+4) of a global batch of 8
    local = {{
        "x": (np.arange(4 * 3).reshape(4, 3) + pid * 12).astype(np.float32)
    }}
    out = host_local_batch_to_global(mesh, local)
    assert out["x"].shape == (8, 3)
    total = jax.jit(lambda a: a.sum())(out["x"])
    expected = float(np.arange(24, dtype=np.float32).sum())
    assert float(total) == expected, (float(total), expected)
    print(f"proc {{pid}} OK", flush=True)
    """
)


_STEP_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    sys.path.insert(0, {repo!r})
    sys.path.insert(0, {testdir!r})
    from v1t_tpu.parallel.mesh import DataParallel
    from v1t_tpu.parallel.multihost import global_mesh, initialize_distributed
    import multihost_step_common as common

    pid = int(sys.argv[1])
    initialize_distributed(
        coordinator_address=sys.argv[2], num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2, jax.process_count()
    mesh = DataParallel(global_mesh())
    assert mesh.num_devices == 4  # 2 hosts x 2 local devices

    # host-local rows: process 0 takes [0, 4), process 1 takes [4, 8)
    gb = common.make_global_batch()
    half = common.GLOBAL_BATCH // 2
    local = {{k: v[pid * half:(pid + 1) * half] for k, v in gb.items()}}
    params, metrics = common.train_two_steps(mesh, local)
    loss = float(metrics["loss/total_loss"])
    assert np.isfinite(loss), loss
    flat = {{
        "/".join(map(str, path)): np.asarray(leaf)
        for path, leaf in jax.tree_util.tree_leaves_with_path(params)
    }}
    np.savez(sys.argv[3] + f"_proc{{pid}}.npz", loss=loss, **flat)
    print(f"proc {{pid}} step OK", flush=True)
    """
)


@pytest.mark.slow
def test_two_process_trained_step_equals_single(tmp_path):
    """VERDICT r4 #8: one full optimizer step (two-mouse gradient
    accumulation) through the real Trainer on a 2-process jax.distributed
    CPU job — host-local rows stitched to global arrays, gradients
    all-reduced across processes — must produce the SAME updated
    parameters as the identical single-process run."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coordinator = f"127.0.0.1:{port}"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    testdir = os.path.join(repo, "tests")
    script = tmp_path / "step_worker.py"
    script.write_text(_STEP_WORKER.format(repo=repo, testdir=testdir))
    out_prefix = str(tmp_path / "params")

    env = {
        k: v for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), coordinator, out_prefix],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for pid in (0, 1)
    ]
    outputs = [p.communicate(timeout=600)[0] for p in procs]
    for pid, (proc, out) in enumerate(zip(procs, outputs)):
        assert proc.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"proc {pid} step OK" in out

    # single-process oracle on this process's CPU backend
    import multihost_step_common as common

    oracle_params, oracle_metrics = common.train_two_steps(
        None, common.make_global_batch()
    )
    oracle = {
        "/".join(map(str, path)): np.asarray(leaf)
        for path, leaf in jax.tree_util.tree_leaves_with_path(oracle_params)
    }

    got = dict(np.load(out_prefix + "_proc0.npz"))
    got1 = dict(np.load(out_prefix + "_proc1.npz"))
    loss = got.pop("loss")
    got1.pop("loss")
    # both processes hold identical replicated params
    assert set(got) == set(got1)
    for k in got:
        np.testing.assert_array_equal(got[k], got1[k])
    # and they equal the single-process trained step
    assert set(got) == set(oracle), (
        set(oracle) - set(got), set(got) - set(oracle),
    )
    np.testing.assert_allclose(
        float(loss), float(oracle_metrics["loss/total_loss"]),
        rtol=1e-5, atol=1e-7,
    )
    max_rel = 0.0
    for k in sorted(oracle):
        a, b = oracle[k].astype(np.float64), got[k].astype(np.float64)
        np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-6, err_msg=k)
        denom = np.maximum(np.abs(a), 1e-6)
        if a.size:
            max_rel = max(max_rel, float(np.max(np.abs(a - b) / denom)))
    print(f"2-process trained-step equality: max rel err {max_rel:.3e}")


@pytest.mark.slow
def test_two_process_distributed_cpu(tmp_path):
    """Real jax.distributed over localhost: 2 processes x 2 virtual CPU
    devices stitch host-local batches into one global array and reduce it."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coordinator = f"127.0.0.1:{port}"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.format(repo=repo))

    env = {
        k: v for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), coordinator],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for pid in (0, 1)
    ]
    outputs = [p.communicate(timeout=300)[0] for p in procs]
    for pid, (proc, out) in enumerate(zip(procs, outputs)):
        assert proc.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"proc {pid} OK" in out

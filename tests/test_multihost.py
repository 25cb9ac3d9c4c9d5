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


@pytest.mark.slow
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

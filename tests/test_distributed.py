"""Real multi-process exercise of parallel/distributed.py (round-1 VERDICT:
'distributed comms backend exercised nowhere').

Launches two actual Python processes that jax.distributed.initialize
against a local coordinator (CPU backend), then checks:
- the global process topology is visible to both (process_count == 2);
- shard_work splits a work list disjointly and completely across them;
- a cross-process collective (psum over a global 2-device mesh via
  shard_map) produces the full-sum on every host — the mechanism pjit
  programs use on a multi-host slice.
"""
import json
import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent(
    """
    import json, sys
    import jax
    jax.config.update("jax_platforms", "cpu")

    from dropoutdecoding_tpu.parallel.distributed import init_multihost, shard_work

    coord, pid = sys.argv[1], int(sys.argv[2])
    ok = init_multihost(coordinator_address=coord, num_processes=2, process_id=pid)
    assert ok, "init_multihost returned False with explicit coordinator"

    out = {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "n_global_devices": len(jax.devices()),
        "share": shard_work(list(range(10))),
    }

    # cross-process collective: psum over the global 2-device mesh
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    mesh = Mesh(np.array(jax.devices()), ("hosts",))
    fn = shard_map(
        lambda x: jax.lax.psum(x, "hosts"),
        mesh=mesh, in_specs=P("hosts"), out_specs=P(),
    )
    local = jnp.asarray([float(pid + 1)])  # host0: 1, host1: 2
    global_x = jax.make_array_from_single_device_arrays(
        (2,), NamedSharding(mesh, P("hosts")),
        [jax.device_put(local, jax.local_devices()[0])],
    )
    out["psum"] = float(np.asarray(jax.jit(fn)(global_x))[0])
    print("RESULT " + json.dumps(out))
    """
)


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_init_shard_and_psum(tmp_path):
    coord = f"127.0.0.1:{_free_port()}"
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # one device per process
    env.pop("JAX_NUM_CPU_DEVICES", None)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), coord, str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            env=env,
            cwd=repo_root,
        )
        for pid in (0, 1)
    ]
    results = {}
    for pid, p in zip((0, 1), procs):
        out, err = p.communicate(timeout=240)
        assert p.returncode == 0, (pid, err.decode()[-2000:])
        line = [l for l in out.decode().splitlines() if l.startswith("RESULT ")]
        assert line, out.decode()[-1000:]
        results[pid] = json.loads(line[-1][len("RESULT "):])

    for pid in (0, 1):
        r = results[pid]
        assert r["process_count"] == 2
        assert r["process_index"] == pid
        assert r["n_global_devices"] == 2
        assert r["psum"] == 3.0  # 1 + 2 summed across hosts

    # shard_work: disjoint + complete round-robin
    s0, s1 = set(results[0]["share"]), set(results[1]["share"])
    assert s0 == set(range(0, 10, 2)) and s1 == set(range(1, 10, 2))
    assert s0.isdisjoint(s1) and s0 | s1 == set(range(10))


def test_init_multihost_noop_without_coordinator(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    from dropoutdecoding_tpu.parallel.distributed import init_multihost

    assert init_multihost() is False


def test_shard_work_explicit_topology():
    from dropoutdecoding_tpu.parallel.distributed import shard_work

    items = list("abcdefg")
    shares = [shard_work(items, process_index=i, process_count=3) for i in range(3)]
    assert sorted(sum(shares, [])) == sorted(items)
    assert all(
        set(a).isdisjoint(b) for i, a in enumerate(shares) for b in shares[i + 1:]
    )

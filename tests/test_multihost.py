"""Multi-host scaffolding: single-process process-group init, global-batch
assembly, async orbax checkpointing. Run in subprocesses — process-group
init is global state the shared test process must not absorb."""

import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_py(code, timeout=540):
    return subprocess.run([sys.executable, "-c", textwrap.dedent(code)],
                          cwd=REPO, capture_output=True, text=True,
                          timeout=timeout)


@pytest.mark.slow
def test_initialize_and_global_batch_single_process():
    r = run_py("""
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 4)
        import numpy as np
        from d3dp_tpu.parallel import (
            initialize_multihost, global_batch, host_slice, make_mesh)

        idx, count = initialize_multihost(
            coordinator_address="localhost:12355", num_processes=1,
            process_id=0)
        assert (idx, count) == (0, 1), (idx, count)
        mesh = make_mesh(dp=4, tp=1)
        local = np.arange(4 * 3 * 2, dtype=np.float32).reshape(4, 3, 2)
        g = global_batch(mesh, local)
        assert g.shape == (4, 3, 2), g.shape
        np.testing.assert_array_equal(np.asarray(g), local)
        a, b = global_batch(mesh, local, local + 1)
        np.testing.assert_array_equal(np.asarray(b), local + 1)
        assert host_slice(8) == (0, 8)
        print("MULTIHOST_OK")
    """)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "MULTIHOST_OK" in r.stdout


_WORKER = """
    import sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    import numpy as np
    from d3dp_tpu.parallel import (
        initialize_multihost, global_batch, host_slice, make_mesh)

    pid = int(sys.argv[1])
    idx, count = initialize_multihost(
        coordinator_address="localhost:%d", num_processes=2, process_id=pid)
    assert (idx, count) == (pid, 2), (idx, count)
    assert len(jax.devices()) == 4, jax.devices()  # 2 local x 2 processes

    # the full deterministic global batch; each process contributes its
    # host_slice (the generators' pad_last contract: identical shapes)
    full = np.arange(4 * 3 * 2, dtype=np.float32).reshape(4, 3, 2)
    lo, hi = host_slice(4)
    assert (lo, hi) == (2 * pid, 2 * pid + 2), (pid, lo, hi)

    mesh = make_mesh(dp=4, tp=1)
    g = global_batch(mesh, full[lo:hi])
    assert g.shape == (4, 3, 2), g.shape

    # every locally-addressable shard must hold exactly its dp-slice of the
    # global batch -- the actual multi-process assembly seam
    for shard in g.addressable_shards:
        row = shard.index[0].start or 0
        np.testing.assert_array_equal(np.asarray(shard.data)[0], full[row])

    # and a jitted global reduction over the sharded array must see ALL
    # rows (XLA inserts the cross-process collective)
    total = float(jax.jit(lambda x: x.sum())(g))
    assert abs(total - full.sum()) < 1e-6, (total, full.sum())
    print("MULTIHOST2_OK", pid)
"""


@pytest.mark.slow
def test_global_batch_two_processes():
    """The only previously-untested seam: global_batch's multi-process
    assembly (parallel/multihost.py:38-53) with process_count == 2 — two
    real jax.distributed CPU processes joined through a coordinator."""
    import socket
    import textwrap

    with socket.socket() as s:  # free port for the coordinator
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    code = textwrap.dedent(_WORKER % port)
    procs = [
        subprocess.Popen([sys.executable, "-c", code, str(i)], cwd=REPO,
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True)
        for i in range(2)
    ]
    outs = []
    try:
        for i, p in enumerate(procs):
            out, err = p.communicate(timeout=540)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"process {i} failed:\n{err[-2000:]}"
        assert f"MULTIHOST2_OK {i}" in out


_TRAIN_WORKER = """
    import sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    import numpy as np
    import jax.numpy as jnp
    from d3dp_tpu.parallel import (
        initialize_multihost, make_mesh, shard_batch_fn, shard_params)
    from d3dp_tpu.diffusion import D3DP, D3DPConfig
    from d3dp_tpu.models import MixSTEConfig
    from d3dp_tpu.train.state import TrainState, make_optimizer, make_train_step

    pid = int(sys.argv[1])
    idx, count = initialize_multihost(
        coordinator_address="localhost:%d", num_processes=2, process_id=pid)
    mesh = make_mesh(dp=4, tp=1)

    d3dp = D3DP(D3DPConfig(
        model=MixSTEConfig(num_frames=9, embed_dim=64, depth=2),
        num_proposals=2, sampling_timesteps=2))
    params = d3dp.init_params(jax.random.PRNGKey(0))
    tx = make_optimizer(1e-4)
    state = TrainState.create(
        {"params": shard_params(params["params"], mesh)}, tx, mesh=mesh)
    step = make_train_step(d3dp, tx, donate=False)

    # every host sees the identical global batch (deterministic
    # generators); shard_batch_fn slices each host's share internally
    rng = np.random.RandomState(0)
    b3 = rng.randn(3, 9, 17, 3).astype(np.float32)  # 3 rows: pads to 4
    b2 = rng.randn(3, 9, 17, 2).astype(np.float32)
    w = np.ones(3, np.float32)
    cam, b3, b2, w = shard_batch_fn(mesh)((None, b3, b2, w))
    state, loss = step(state, jax.random.PRNGKey(1), b2, b3, jnp.asarray(w))
    print("TRAIN_LOSS", float(loss))
"""


@pytest.mark.slow
def test_train_step_two_processes():
    """The CLI's sharded train path end-to-end across two jax.distributed
    processes: shard_batch_fn assembles each host's slice into the global
    dp-sharded batch and the jitted step's loss equals the single-process
    value (put_global seam, parallel/mesh.py)."""
    import socket
    import textwrap

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    code = textwrap.dedent(_TRAIN_WORKER % port)
    procs = [
        subprocess.Popen([sys.executable, "-c", code, str(i)], cwd=REPO,
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True)
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=540)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    losses = []
    for i, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"process {i} failed:\n{err[-2000:]}"
        losses.append(float(out.split("TRAIN_LOSS")[1].split()[0]))
    assert losses[0] == losses[1], losses

    # single-process control on 4 local devices, same global batch
    r = run_py("""
        import jax
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 4)
        import numpy as np
        import jax.numpy as jnp
        from d3dp_tpu.parallel import make_mesh, shard_batch_fn, shard_params
        from d3dp_tpu.diffusion import D3DP, D3DPConfig
        from d3dp_tpu.models import MixSTEConfig
        from d3dp_tpu.train.state import (
            TrainState, make_optimizer, make_train_step)

        mesh = make_mesh(dp=4, tp=1)
        d3dp = D3DP(D3DPConfig(
            model=MixSTEConfig(num_frames=9, embed_dim=64, depth=2),
            num_proposals=2, sampling_timesteps=2))
        params = d3dp.init_params(jax.random.PRNGKey(0))
        tx = make_optimizer(1e-4)
        state = TrainState.create(
            {"params": shard_params(params["params"], mesh)}, tx, mesh=mesh)
        step = make_train_step(d3dp, tx, donate=False)
        rng = np.random.RandomState(0)
        b3 = rng.randn(3, 9, 17, 3).astype(np.float32)
        b2 = rng.randn(3, 9, 17, 2).astype(np.float32)
        w = np.ones(3, np.float32)
        cam, b3, b2, w = shard_batch_fn(mesh)((None, b3, b2, w))
        state, loss = step(state, jax.random.PRNGKey(1), b2, b3,
                           jnp.asarray(w))
        print("TRAIN_LOSS", float(loss))
    """)
    assert r.returncode == 0, r.stderr[-2000:]
    ref = float(r.stdout.split("TRAIN_LOSS")[1].split()[0])
    assert abs(losses[0] - ref) < 1e-5, (losses[0], ref)


_CKPT_WORKER = """
    import sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    import numpy as np
    from d3dp_tpu.parallel import initialize_multihost, make_mesh, shard_params
    from d3dp_tpu.train.checkpoint_io import save_checkpoint, load_checkpoint

    pid = int(sys.argv[1]); path = sys.argv[2]
    initialize_multihost(coordinator_address="localhost:%d",
                         num_processes=2, process_id=pid)
    mesh = make_mesh(dp=2, tp=2)  # tp spans the two processes
    params = {"qkv": {"kernel": np.arange(64 * 192, dtype=np.float32)
                      .reshape(64, 192)}}
    sharded = shard_params(params, mesh)
    assert not sharded["qkv"]["kernel"].is_fully_addressable
    # collective gather inside save; only process 0 writes
    save_checkpoint(path, epoch=1, lr=1e-4, params=sharded)
    if pid == 0:
        out = load_checkpoint(path)
        np.testing.assert_array_equal(out["params"]["qkv"]["kernel"],
                                      params["qkv"]["kernel"])
    print("CKPT_OK", pid)
"""


@pytest.mark.slow
def test_tp_sharded_checkpoint_two_processes(tmp_path):
    """Saving a tp-sharded (non-fully-addressable) state under
    jax.distributed: the collective gather in _to_numpy plus the
    process-0-only write (checkpoint_io.py)."""
    import socket
    import textwrap

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    path = str(tmp_path / "tp_sharded.ckpt")
    code = textwrap.dedent(_CKPT_WORKER % port)
    procs = [
        subprocess.Popen([sys.executable, "-c", code, str(i), path],
                         cwd=REPO, stdout=subprocess.PIPE,
                         stderr=subprocess.PIPE, text=True)
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=540)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"process {i} failed:\n{err[-2000:]}"
        assert f"CKPT_OK {i}" in out
    assert os.path.exists(path)


def test_async_orbax_roundtrip(tmp_path):
    from d3dp_tpu.train.checkpoint_io import (
        save_checkpoint_orbax, load_checkpoint_orbax, wait_for_checkpoints)

    params = {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}
    d = str(tmp_path / "ck_async")
    save_checkpoint_orbax(d, epoch=3, lr=1e-4, params=params, wait=False)
    wait_for_checkpoints()
    out = load_checkpoint_orbax(d)
    assert out["epoch"] == 3
    np.testing.assert_array_equal(out["params"]["w"], params["w"])

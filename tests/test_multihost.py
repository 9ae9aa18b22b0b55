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

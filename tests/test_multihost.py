"""Multi-host logic via jax.distributed loopback (SURVEY §4: multi-chip tests
runnable on CPU; §5 distributed backend).

Two OS processes, 4 virtual CPU devices each, form an 8-device global mesh
through a loopback coordinator — the same code path a real multi-host TPU
slice uses (jax.distributed + process-spanning Mesh + psum over DCN).  The
psum-reduced counters must agree across processes AND bit-match a
single-process 8-device run, because per-sample PRNG keys derive from the
global device index (partition-independent reproducibility — the design that
replaces the reference's thread-count-dependent locked RNG,
DecoderCPU.h:411,448-459).
"""

import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_two_process_loopback_matches_single_process(small_code, small_graphs):
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, f"127.0.0.1:{port}", "2", str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            out, err = p.communicate()
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)

    counters = []
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("COUNTERS")][0]
        counters.append([int(x) for x in line.split()[1].split(",")])
    assert counters[0] == counters[1], "processes disagree on psum counters"

    # single-process 8-device reference run: identical statistics
    from qec_ldpc_tpu.decoder import BPConfig
    from qec_ldpc_tpu.parallel import make_mesh, make_sharded_chunk

    mesh = make_mesh(num_data=8)
    chunk_fn = make_sharded_chunk(mesh, small_graphs, weight=2,
                                  cfg=BPConfig(max_iters=20),
                                  batch_per_device=16)
    ref, _ = chunk_fn(jnp.asarray(small_code.i_minus_p),
                      jax.random.PRNGKey(7), jnp.float32(0.02),
                      jnp.arange(2, dtype=jnp.uint32), None)
    assert counters[0] == np.asarray(ref).tolist()

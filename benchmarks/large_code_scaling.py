"""Large-code graph-sharding artifact: where one chip runs out, and the
measured (data x graph) statistics pipeline on codes that need the graph axis.

VERDICT r2 #3: everything benchmarked so far fits one chip; this runs codes
where the graph axis PAYS — a P=521 Hagiwara–Imai code ([[5210,521]]-class,
8.5x the flagship's variables) and the BB [[756,16,34]] gross-family code —
through the INTEGRATED graph-parallel Monte-Carlo statistics path
(parallel/mc_graph.py) at every admissible graph-axis size, and writes one
JSONL artifact with:

* functional results (counters per mesh shape — the exact-decoder bit-match
  across shapes is the correctness gate, asserted in-run);
* measured wall times per shape.  HONESTY NOTE: this host exposes
  N VIRTUAL CPU devices over few physical cores, so wall times are a
  functional proxy (all shards timeshare the same cores) — they bound
  per-shard COMPUTE scaling, not real ICI behavior;
* the analytic communication/memory model per shape: per-iteration
  collective bytes per device (the all_gather halo of
  parallel/graph_sharded.py / the ppermute halo of lifted_sharded.py) vs
  resident edge-state bytes — the ratio that must fall with G for the
  design to scale;
* the single-chip memory math: at which (code, batch) the fused-kernel VMEM
  budget and the dense-classification O(4n^2) wall are hit (the latter now
  removed by the rank-basis test, recorded for comparison).

Usage:  python -m benchmarks.large_code_scaling [out.jsonl]
(runs on the CPU test mesh; set XLA_FLAGS/JAX_PLATFORMS as in tests/conftest)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

VMEM_BYTES = 128 * 2**20      # v5e per-core VMEM
HBM_BYTES = 16 * 2**30        # v5e HBM


def _memory_model(name, n, edges_x, edges_z, rank_x, rank_z, batch=2048,
                  tile_batch=128):
    """Single-chip memory math for one code (f32 message state)."""
    edge_state = (edges_x + edges_z) * 4  # bytes per batch lane (v only)
    # fused kernel VMEM residency per tile: v + e + two scratch views
    kernel_vmem = 4 * edge_state * tile_batch
    dense_classify = (2 * n) ** 2          # int8 iMinusP
    basis_classify = (rank_x + rank_z) * n  # int8 RREF rows
    return {
        "code": name, "n": n, "edges": edges_x + edges_z,
        "edge_state_bytes_per_lane": edge_state,
        "kernel_vmem_bytes_at_tile": kernel_vmem,
        "kernel_fits_vmem_at_tile128": kernel_vmem < VMEM_BYTES,
        "hbm_bytes_at_batch": edge_state * batch,
        "fits_hbm_at_batch2048": edge_state * batch < HBM_BYTES,
        "dense_classify_bytes": dense_classify,
        "rank_basis_classify_bytes": basis_classify,
        "classify_shrink_factor": round(dense_classify / basis_classify, 1),
    }


def main(out_path: str = "benchmarks/data/large_code_scaling_r3.jsonl") -> int:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from qec_ldpc_tpu.codes import construct_code, known_bicycle_code
    from qec_ldpc_tpu.decoder import BPConfig, CodeGraphs
    from qec_ldpc_tpu.parallel import (
        make_graph_sharded_chunk,
        make_mesh,
        make_sharded_chunk,
    )
    from qec_ldpc_tpu.sampling.classify import make_rank_basis_test

    devices = jax.devices()
    records = []

    def run_shapes(name, graphs, ltest, shapes, cfg, weight, p, batch,
                   comm_model):
        """One record per (data, graph) shape; exact-decoder counters must
        bit-match across shapes (same num_data)."""
        key = jax.random.PRNGKey(17)
        ids = jnp.arange(1, dtype=jnp.uint32)
        baseline = None
        for (nd, ng) in shapes:
            mesh = make_mesh(num_data=nd, num_graph=ng,
                             devices=devices[: nd * ng])
            if ng > 1:
                fn = make_graph_sharded_chunk(mesh, graphs, weight=weight,
                                              cfg=cfg, batch_per_device=batch)
            else:
                fn = make_sharded_chunk(mesh, graphs, weight=weight, cfg=cfg,
                                        batch_per_device=batch)
            c, it = fn(ltest, key, jnp.float32(p), ids, None)
            c = np.asarray(c)  # also blocks
            t0 = time.perf_counter()
            c2, it2 = fn(ltest, key, jnp.float32(p), ids, None)
            c2 = np.asarray(c2)
            dt = time.perf_counter() - t0
            assert np.array_equal(c, c2)
            if baseline is None:
                baseline = c
            else:
                assert np.array_equal(baseline, c), (
                    f"{name} {nd}x{ng}: counters diverged\n{baseline}\n{c}")
            rec = {
                "code": name, "num_data": nd, "num_graph": ng,
                "batch_per_data_shard": batch, "weight": weight, "p": p,
                "algorithm": cfg.algorithm, "max_iters": cfg.max_iters,
                "counters": c.tolist(),
                "lane_iters": np.asarray(it2).tolist(),
                "wall_seconds": round(dt, 3),
                "wall_note": ("virtual-device CPU mesh on a few-core host: "
                              "functional proxy, not ICI scaling"),
                **comm_model(nd, ng),
            }
            records.append(rec)
            print(f"{name} data={nd} graph={ng}: {dt:.2f}s "
                  f"counters={c.tolist()}", flush=True)

    # ---- P=521 circulant QC code: [[5210]]-class, L=10 -> G in {2, 5} ----
    code = construct_code(4, 5, 10, 521, 25, 1)
    graphs = CodeGraphs.build(code)
    ltest = make_rank_basis_test(code)
    B_x, B_z, L, Pc = 4, 5, 10, 521

    def qc_comm(nd, ng, batch=16):
        # graph_sharded halo: one all_gather of (B, P*bt) partials per
        # iteration per graph; bytes RECEIVED per device per iteration:
        rows = (B_x + B_z) * Pc
        recv = (ng - 1) * rows * batch * 4 if ng > 1 else 0
        resident = (B_x + B_z) * L // max(ng, 1) * Pc * batch * 4
        return {
            "halo_bytes_recv_per_dev_per_iter": recv,
            "resident_edge_bytes_per_dev": resident,
            "comm_compute_ratio": round(recv / resident, 3) if resident else 0,
        }

    run_shapes(f"qc_P521 {code}", graphs, ltest,
               [(1, 1), (1, 2), (1, 5)],
               BPConfig(max_iters=30, algorithm="min-sum"),
               weight=220, p=0.01, batch=16, comm_model=qc_comm)

    # ---- BB [[756,16,34]]: lift group (21, 18) -> G in {3, 7} ----
    bb = known_bicycle_code("[[756,16,34]]")
    bb_graphs = bb.build_graphs()
    bb_test = make_rank_basis_test(bb)

    def bb_comm(nd, ng, batch=16):
        # lifted_sharded halo: ppermute of whole local bands per l-axis roll;
        # each iteration routes every edge block twice (to_var + to_chk);
        # worst case every roll crosses bands: bytes ~ 2 * local edge state
        l, m = bb_graphs.x.group if hasattr(bb_graphs.x, "group") else (21, 18)
        edge_blocks = bb_graphs.x.num_edge_blocks + bb_graphs.z.num_edge_blocks
        local_lanes = (l // max(ng, 1)) * m
        resident = edge_blocks * local_lanes * batch * 4
        recv = 2 * resident if ng > 1 else 0
        return {
            "halo_bytes_recv_per_dev_per_iter_upper": recv,
            "resident_edge_bytes_per_dev": resident,
            "comm_compute_ratio_upper": round(recv / resident, 3)
            if resident else 0,
        }

    run_shapes(f"bb_{bb}", bb_graphs, bb_test,
               [(1, 1), (1, 3), (1, 7)],
               BPConfig(max_iters=30, algorithm="min-sum"),
               weight=24, p=0.01, batch=16, comm_model=bb_comm)

    # ---- single-chip memory model table ----
    mem = [
        _memory_model("qc_P61_[[610,61]]", 610, 4 * 10 * 61, 5 * 10 * 61,
                      244, 305),
        _memory_model("qc_P521_[[5210]]", 5210, 4 * 10 * 521, 5 * 10 * 521,
                      int(np.asarray(ltest.basis_x).shape[0]),
                      int(np.asarray(ltest.basis_z).shape[0])),
        _memory_model("bb_[[756,16,34]]", 756,
                      bb_graphs.x.num_edges, bb_graphs.z.num_edges,
                      int(np.asarray(bb_test.basis_x).shape[0]),
                      int(np.asarray(bb_test.basis_z).shape[0])),
        _memory_model("qc_P4099_[[40990]]-class", 40990, 4 * 10 * 4099,
                      5 * 10 * 4099, 16000, 20000),
    ]

    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        f.write(json.dumps({
            "artifact": "large_code_scaling",
            "devices": len(devices),
            "device_kind": devices[0].device_kind,
            "note": ("graph-parallel statistics pipeline on codes needing "
                     "the graph axis; CPU-mesh walls are functional "
                     "proxies; memory model uses v5e VMEM=128MB HBM=16GB"),
        }) + "\n")
        for r in records:
            f.write(json.dumps(r) + "\n")
        for m in mem:
            f.write(json.dumps({"memory_model": m}) + "\n")
    print(f"wrote {out_path}: {len(records)} runs + {len(mem)} memory rows")
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))

"""Measured collective structure of the sharded engines vs the analytic model.

VERDICT r3 weak #2 / next-step #4: the ICI communication claims
(``parallel/graph_sharded.py``: one fused all_gather halo per flooding BP
iteration; ``parallel/lifted_sharded.py``: offset-grouped ppermutes) were
analytic prose.  This benchmark lowers the production sharded programs on an
8-virtual-device mesh, counts the collectives INSIDE the BP while-loop
bodies from the compiled StableHLO (qec_ldpc_tpu/harness/hlo_inspect.py),
and records the measured per-iteration collective bytes next to the
analytic halo model of ``large_code_scaling.py``.  The same numbers are
asserted as a regression gate by tests/test_hlo_collectives.py.

Run on any backend (lowering is backend-agnostic):
    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \\
        python -m benchmarks.collective_structure [out.json]
"""

from __future__ import annotations

import json
import os
import sys


def main(out_path: str = "benchmarks/data/collective_structure_r4.json") -> int:
    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # the axon sitecustomize pre-registers its backend; the env var
        # alone does not win (memory: tpu-tunnel-quirks) — force it
        jax.config.update("jax_platforms", "cpu")
    if len(jax.devices()) < 8:
        raise SystemExit("need >= 8 devices (set "
                         "XLA_FLAGS=--xla_force_host_platform_device_count=8)")
    import jax.numpy as jnp

    from qec_ldpc_tpu.codes import construct_code, known_bicycle_code
    from qec_ldpc_tpu.decoder import BPConfig, CodeGraphs
    from qec_ldpc_tpu.harness.hlo_inspect import loop_collective_summary
    from qec_ldpc_tpu.parallel import make_mesh
    from qec_ldpc_tpu.parallel.graph_sharded import make_graph_sharded_decoder
    from qec_ldpc_tpu.parallel.lifted_sharded import make_lifted_sharded_decoder

    records = []

    # flagship [[610,61]] at a production-like shape: G=5 | L=10, batch 256
    code = construct_code(4, 5, 10, 61, 9, 49)
    graphs = CodeGraphs.build(code)
    Gq, batch = 5, 256
    mesh = make_mesh(num_data=8 // Gq or 1, num_graph=Gq)
    nd = dict(mesh.shape)["data"]
    bt_local = batch // nd
    sx = jnp.zeros((code.num_eqs_x, batch), jnp.int32)
    sz = jnp.zeros((code.num_eqs_z, batch), jnp.int32)
    for algo in ("sum-product", "min-sum", "layered-min-sum"):
        cfg = BPConfig(max_iters=50, algorithm=algo, kernel="xla")
        dec = make_graph_sharded_decoder(mesh, graphs, cfg)
        s = loop_collective_summary(jax.jit(dec).lower(sx, sz, 0.02).as_text())
        # analytic halo model (graph_sharded.py docstring): each device
        # RECEIVES (G-1) * B * P * bt_local partial floats per iteration,
        # packed x2 for the (min, sign) LLR exchanges
        pack = 1 if algo == "sum-product" else 2
        analytic_recv = {
            "x": pack * (Gq - 1) * code.hc.shape[0] * code.P * bt_local * 4,
            "z": pack * (Gq - 1) * code.hd.shape[0] * code.P * bt_local * 4,
        }
        bodies = s["bodies"]
        measured_recv = [
            b.result_bytes["all_gather"] * (Gq - 1) // Gq for b in bodies
        ]  # gather result holds all G shards; (G-1)/G of it arrives over ICI
        records.append({
            "engine": "graph_sharded(block-column)", "code": str(code),
            "algorithm": algo, "mesh": {"data": nd, "graph": Gq},
            "batch_global": batch,
            "all_gathers_per_iteration_per_graph":
                [b.counts["all_gather"] for b in bodies],
            "collective_permutes_in_loop":
                [b.counts["collective_permute"] for b in bodies],
            "measured_halo_recv_bytes_per_dev_per_iter": measured_recv,
            "analytic_halo_recv_bytes_per_dev_per_iter":
                [analytic_recv["x"], analytic_recv["z"]],
        })

    # BB [[144,12,12]] lane-sharded: ppermute halo rolls, offset-grouped
    bb = known_bicycle_code("[[144,12,12]]")
    bgraphs = bb.build_graphs()
    bmesh = make_mesh(num_data=2, num_graph=4)
    bsx = jnp.zeros((bb.num_eqs_x, 16), jnp.int32)
    bsz = jnp.zeros((bb.num_eqs_z, 16), jnp.int32)
    cfg = BPConfig(max_iters=50, algorithm="min-sum", kernel="xla")
    dec = make_lifted_sharded_decoder(bmesh, bgraphs, cfg)
    s = loop_collective_summary(jax.jit(dec).lower(bsx, bsz, 0.02).as_text())
    records.append({
        "engine": "lifted_sharded(lane-band)", "code": "BB[[144,12,12]]",
        "algorithm": "min-sum", "mesh": {"data": 2, "graph": 4},
        "batch_global": 16,
        "collective_permutes_per_iteration_per_graph":
            [b.counts["collective_permute"] for b in s["bodies"]],
        "all_gathers_in_loop": [b.counts["all_gather"] for b in s["bodies"]],
        "measured_permute_bytes_per_iter":
            [b.result_bytes["collective_permute"] for b in s["bodies"]],
        "naive_per_block_permute_count": 2 * bb.build_graphs().x.num_edge_blocks,
        "note": "offset-grouped: O(#distinct ring offsets) = 2 permutes per "
                "iteration vs O(edge blocks) naive",
    })

    out = {
        "artifact": "collective_structure",
        "source": "StableHLO of the jitted shard_map programs "
                  "(8-virtual-device CPU mesh; lowering is backend-agnostic)",
        "claims_validated": [
            "flooding: ONE fused all_gather halo per BP iteration per graph",
            "min-sum packs (min, sign) into that single gather",
            "layered: one packed gather per block-row layer per sweep",
            "lifted: offset-grouped ppermutes, no gathers in the loop",
        ],
        "records": records,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {out_path}")
    for r in records:
        print({k: r[k] for k in list(r)[:6]})
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))

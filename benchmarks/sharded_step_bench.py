"""Single-chip timing of the between-halos Pallas step vs the XLA body.

VERDICT r4 #2 acceptance: with only one chip, the graph-sharded engines'
collectives can't be timed for real — but the LOCAL per-iteration work
(everything between halo all_gathers) can.  This benchmark runs one shard
position's step function standalone on the chip — the fused kernel
(kernels/sharded_step_pallas.py) against an XLA implementation of the
identical body (the cn/vn slice of parallel/graph_sharded._sharded_min_sum
with the gathered other-shard reduction supplied as an input) — on the
sharded [[5210,521]]-class workload the graph axis exists for.

Both paths iterate the same (V, partials) recurrence; outputs are asserted
bit-equal before timing.  Timings scan ITERS steps per dispatch (tunneled
runtime charges ~40 ms/dispatch).

Usage (on the TPU chip):  python -m benchmarks.sharded_step_bench [out.jsonl]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from benchmarks.common import setup_jax_cache

ITERS = 50
BATCH = 256


def main(out_path: str = "benchmarks/data/sharded_step_bench_r5.jsonl") -> int:
    setup_jax_cache()
    import jax
    import jax.numpy as jnp

    from qec_ldpc_tpu.codes import construct_code
    from qec_ldpc_tpu.decoder.layout import CirculantGraph
    from qec_ldpc_tpu.kernels.sharded_step_pallas import (
        sharded_min_sum_step_pallas,
    )

    records = []
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    for (J, K, L, P, s, t, G) in ((4, 5, 10, 521, 25, 1, 2),
                                  (4, 5, 10, 61, 9, 49, 2)):
        code = construct_code(J, K, L, P, s, t)
        graph = CirculantGraph.from_table(code.hc, P)
        Lc = L // G
        g = 0
        B = graph.B
        NB = Lc * B
        Pl = -(-P // 128) * 128
        alpha = 0.75
        rng = np.random.default_rng(0)
        prior_llr = jnp.asarray([4.59], jnp.float32)
        syn_t = jnp.asarray(
            np.where(rng.random((B, BATCH, Pl)) < 0.3, -1.0, 1.0),
            jnp.float32)
        v0 = jnp.asarray(rng.standard_normal((NB, BATCH, Pl)) * 4,
                         jnp.float32)
        other0 = jnp.asarray(
            np.abs(rng.standard_normal((2 * B, BATCH, Pl))) + 0.5,
            jnp.float32)
        done_t = jnp.zeros((BATCH, 128), jnp.float32)
        last = jnp.zeros((1,), jnp.int32)
        table_g = graph.table[:, g * Lc:(g + 1) * Lc] % P

        def xla_step(prior, last, syn, other, done, v):
            """XLA image of the kernel body (same association order)."""
            done_col = done[:, 0:1] > 0.5
            e = {}
            for b in range(B):
                ts = [v[l * B + b] for l in range(Lc)]
                mags = [jnp.abs(x) for x in ts]
                sgs = [jnp.where(x < 0, -1.0, 1.0) for x in ts]
                big = jnp.full_like(mags[0], jnp.inf)
                ones = jnp.ones_like(sgs[0])
                pre_m, pre_s = [big] * Lc, [ones] * Lc
                for i in range(1, Lc):
                    pre_m[i] = jnp.minimum(pre_m[i - 1], mags[i - 1])
                    pre_s[i] = pre_s[i - 1] * sgs[i - 1]
                suf_m, suf_s = [big] * Lc, [ones] * Lc
                for i in range(Lc - 2, -1, -1):
                    suf_m[i] = jnp.minimum(suf_m[i + 1], mags[i + 1])
                    suf_s[i] = suf_s[i + 1] * sgs[i + 1]
                for l in range(Lc):
                    loo_min = jnp.minimum(
                        jnp.minimum(pre_m[l], suf_m[l]), other[b])
                    loo_sgn = pre_s[l] * suf_s[l] * other[B + b]
                    e[l * B + b] = syn[b] * (alpha * loo_sgn * loo_min)

            lanes = jnp.arange(Pl)[None, :]

            def route(x, c):
                c = int(c) % P
                if c == 0:
                    return x
                r1 = jnp.roll(x, c, axis=1)
                r2 = jnp.roll(x, (c - P) % Pl, axis=1)
                return jnp.where(lanes < c, r2, r1)

            v_new = [None] * NB
            for l in range(Lc):
                evs = [route(e[l * B + b], table_g[b, l]) for b in range(B)]
                zeros = jnp.zeros_like(evs[0])
                pre = [zeros] * B
                for i in range(1, B):
                    pre[i] = pre[i - 1] + evs[i - 1]
                suf = [zeros] * B
                for i in range(B - 2, -1, -1):
                    suf[i] = suf[i + 1] + evs[i + 1]
                full = (pre[-1] + suf[-1]) + evs[-1]
                for b in range(B):
                    vv = prior[0] + jnp.where(last[0] > 0, full,
                                              pre[b] + suf[b])
                    rolled = route(vv, P - int(table_g[b, l]))
                    v_new[l * B + b] = jnp.where(done_col, v[l * B + b],
                                                 rolled)
            v_out = jnp.stack(v_new)
            parts = []
            for b in range(B):
                m = jnp.abs(v_out[b])
                sg = jnp.where(v_out[b] < 0, -1.0, 1.0)
                for l in range(1, Lc):
                    m = jnp.minimum(m, jnp.abs(v_out[l * B + b]))
                    sg = sg * jnp.where(v_out[l * B + b] < 0, -1.0, 1.0)
                parts.append((m, sg))
            part = jnp.concatenate(
                [jnp.stack([m for m, _ in parts]),
                 jnp.stack([sg for _, sg in parts])])
            return v_out, part

        def make_loop(step):
            @jax.jit
            def loop(v):
                def body(carry, _):
                    v, part = carry
                    other = part  # stand-in: reuse partials as 'other'
                    v2, p2 = step(prior_llr, last, syn_t,
                                  jnp.abs(other) + 0.1, done_t, v)
                    return (v2, p2), None
                (vf, pf), _ = jax.lax.scan(
                    body, (v, other0), None, length=ITERS)
                return jnp.sum(vf), vf, pf
            return loop

        pallas_step = lambda *a: sharded_min_sum_step_pallas(  # noqa: E731
            graph, Lc, g, *a, alpha=alpha,
            interpret=(jax.default_backend() == "cpu"))
        loops = {"pallas": make_loop(pallas_step),
                 "xla": make_loop(xla_step)}
        outs = {}
        times = {}
        for name, loop in loops.items():
            t0 = time.perf_counter()
            sv, vf, pf = loop(v0)
            float(sv)
            compile_s = time.perf_counter() - t0
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                sv, vf, pf = loop(v0)
                float(sv)
                best = min(best, time.perf_counter() - t0)
            outs[name] = (np.asarray(vf), np.asarray(pf))
            times[name] = (best, compile_s)
        bit_equal = (np.array_equal(outs["pallas"][0], outs["xla"][0])
                     and np.array_equal(outs["pallas"][1], outs["xla"][1]))
        rec = {
            "code": f"P{P} shard g=0 of G={G}", "Lc": Lc, "batch": BATCH,
            "iters_per_dispatch": ITERS,
            "pallas_seconds": round(times["pallas"][0], 4),
            "xla_seconds": round(times["xla"][0], 4),
            "pallas_compile_s": round(times["pallas"][1], 1),
            "xla_compile_s": round(times["xla"][1], 1),
            "speedup": round(times["xla"][0] / times["pallas"][0], 2),
            "bit_equal": bool(bit_equal),
            "ms_per_iter_pallas": round(
                times["pallas"][0] / ITERS * 1000, 3),
            "ms_per_iter_xla": round(times["xla"][0] / ITERS * 1000, 3),
        }
        records.append(rec)
        print(f"P={P}: pallas {rec['ms_per_iter_pallas']} ms/iter vs xla "
              f"{rec['ms_per_iter_xla']} -> {rec['speedup']}x "
              f"(bit_equal={bit_equal})", flush=True)

    with open(out_path, "w") as f:
        import jax

        f.write(json.dumps({
            "artifact": "sharded_step_bench",
            "device_kind": jax.devices()[0].device_kind,
            "note": ("single-chip timing of ONE shard position's "
                     "between-halos step (VERDICT r4 #2 acceptance): the "
                     "fused kernel vs an XLA image of the identical body, "
                     "iterating the same (V, partials) recurrence with the "
                     "other-shard input fed back from the previous step's "
                     "partials; outputs asserted bit-equal before timing")
        }) + "\n")
        for rec in records:
            f.write(json.dumps(rec) + "\n")
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))

"""Random Pauli error generation — counter-based, lock-free, reproducible.

The reference draws weight-W errors from one shared mt19937 under an OpenMP
lock (``DecoderCPU.h:411,448-459``; standalone twin ``RandomErrorGenerator.h``):
W iid draws of (uniform qubit index, uniform type in {x=0, y=1, z=2}); x|y sets
the X bit, z|y sets the Z bit; repeated indices overwrite (never unset), so the
effective weight can be < W.

Here each batch lane derives its own ``jax.random`` key, so generation is
deterministic for a seed regardless of device count or batch partitioning —
the lock is replaced by counter-based PRNG.  Seeds do not transfer from the
C++ mt19937 stream; distributions match exactly (SURVEY §7 hard parts).

TPU note: error vectors are built by comparing the W drawn indices against a
static iota over variables — a vectorized (W, n, batch) reduction instead of a
scatter, which keeps everything dense and fusion-friendly.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("n", "weight", "batch"))
def sample_weight_w_errors(
    key: jax.Array, n: int, weight: int, batch: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Draw ``batch`` weight-``weight`` Pauli errors over ``n`` qubits.

    Returns (x_errors, z_errors), each (n, batch) int8 in {0,1}.
    """
    k_idx, k_typ = jax.random.split(key)
    idx = jax.random.randint(k_idx, (weight, batch), 0, n)          # qubit index
    typ = jax.random.randint(k_typ, (weight, batch), 0, 3)          # x=0,y=1,z=2
    var_ids = jnp.arange(n, dtype=idx.dtype)[None, :, None]          # (1, n, 1)
    hit = idx[:, None, :] == var_ids                                 # (W, n, batch)
    x_draw = (typ <= 1)[:, None, :]
    z_draw = (typ >= 1)[:, None, :]
    x_errors = jnp.any(hit & x_draw, axis=0).astype(jnp.int8)
    z_errors = jnp.any(hit & z_draw, axis=0).astype(jnp.int8)
    return x_errors, z_errors


@partial(jax.jit, static_argnames=("n", "w_max", "batch"))
def sample_weight_w_errors_dynamic(
    key: jax.Array, n: int, weight: jax.Array, w_max: int, batch: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Weight-``weight`` errors with ``weight`` as a RUNTIME value.

    Same per-draw semantics as :func:`sample_weight_w_errors` (uniform
    index, uniform type, collisions overwrite), but ``w_max`` draws are made
    and only the first ``weight`` are active — so a whole weight sweep
    (W = 1..w_max) runs through ONE compiled program instead of one
    XLA program per weight (the reference recompiles nothing because it has
    no compiler; our sweep artifact generator needs this to keep 120 remote
    TPU compilations from dominating wall time).  For ``weight == w_max``
    the draws are bit-identical to the static sampler with the same key.
    """
    k_idx, k_typ = jax.random.split(key)
    idx = jax.random.randint(k_idx, (w_max, batch), 0, n)
    typ = jax.random.randint(k_typ, (w_max, batch), 0, 3)
    active = (jnp.arange(w_max) < weight)[:, None, None]        # (W, 1, 1)
    var_ids = jnp.arange(n, dtype=idx.dtype)[None, :, None]
    hit = (idx[:, None, :] == var_ids) & active
    x_draw = (typ <= 1)[:, None, :]
    z_draw = (typ >= 1)[:, None, :]
    x_errors = jnp.any(hit & x_draw, axis=0).astype(jnp.int8)
    z_errors = jnp.any(hit & z_draw, axis=0).astype(jnp.int8)
    return x_errors, z_errors


@partial(jax.jit, static_argnames=("n", "batch"))
def sample_depolarizing_errors(
    key: jax.Array, n: int, p: float | jax.Array, batch: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """I.i.d. depolarizing channel: each qubit errs w.p. ``p``; error type
    uniform over {X, Y, Z}.  The framework-native error model for
    physical-error-rate sweeps (no reference analog; BASELINE config 3)."""
    k_err, k_typ = jax.random.split(key)
    err = jax.random.uniform(k_err, (n, batch)) < p
    typ = jax.random.randint(k_typ, (n, batch), 0, 3)
    x_errors = (err & (typ <= 1)).astype(jnp.int8)
    z_errors = (err & (typ >= 1)).astype(jnp.int8)
    return x_errors, z_errors

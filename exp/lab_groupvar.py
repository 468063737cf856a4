"""KNN group-variance regularizer backward A/B (REG_MXU: autodiff
scatter-add vs sort + MXU segment reduce), ABAB in ONE process at
production shapes (300k obj gaussians, obj_capacity/K anchors, K=8,
xyz_deform [No,3,17] + gs_time_sigma [No,2] — BOTH regularizers like a
lambda_sigma_reg run).

Run: python exp/lab_groupvar.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

No = int(os.environ.get("LAB_NO", 300_000))
K = 8
CX = 17
REPS = 10
RTT = 0.0


def fetch(o):
    leaves = jax.tree.leaves(o)
    return float(jnp.sum(leaves[0].ravel()[:2].astype(jnp.float32)))


def chain_time(fn, *args):
    out = fn(*args)
    _ = fetch(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    _ = fetch(out)
    return (time.perf_counter() - t0 - RTT) / REPS * 1e3


def main():
    global RTT
    print(f"backend: {jax.default_backend()}", flush=True)
    from adgs_tpu.train import losses

    tiny = jnp.ones((8, 8), jnp.float32)
    f_tiny = jax.jit(lambda x: x + 1.0)
    _ = fetch(f_tiny(tiny))
    t0 = time.perf_counter()
    for _ in range(10):
        _ = fetch(f_tiny(tiny))
    RTT = (time.perf_counter() - t0) / 10
    print(f"RTT {RTT*1e3:.1f} ms", flush=True)

    rng = np.random.default_rng(0)
    A = No // K
    deform = jnp.asarray(rng.normal(size=(No, 3, CX)).astype(np.float32))
    sigma = jnp.asarray(rng.normal(size=(No, 2)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, No, (A, K)), jnp.int32)
    valid = jnp.asarray(np.ones(A, bool))

    def make_arm(mxu):
        losses.REG_MXU = mxu

        def loss(d, s):
            if mxu:
                ra, sa = losses._group_variance_pair(d, s, idx, valid)
                return ra + sa
            return (losses._group_variance_loss(d, idx, valid)
                    + losses._group_variance_loss(s, idx, valid))
        return jax.jit(jax.value_and_grad(loss, argnums=(0, 1)))

    arms, grads = {}, {}
    for name, m in (("scatter", 0), ("mxu", 1), ("sorted_ss", 2)):
        f = make_arm(m)
        l, g = f(deform, sigma)
        arms[name] = f
        grads[name] = (float(l), g)
        print(f"arm {name} compiled, loss={float(l):.6f}", flush=True)

    l0, g0 = grads["scatter"]
    l1, g1 = grads["sorted_ss"]
    rel = max(
        float(jnp.max(jnp.abs(a - b))) / (float(jnp.max(jnp.abs(a))) + 1e-30)
        for a, b in zip(g0, g1))
    print(f"|dloss| = {abs(l0 - l1):.3e}  max|dgrad|rel = {rel:.3e}",
          flush=True)

    acc = {n: [] for n in arms}
    for rnd in range(3):
        for name, f in arms.items():
            acc[name].append(chain_time(f, deform, sigma))
        print(f"round {rnd}: " + "  ".join(
            f"{n}={acc[n][-1]:.2f}" for n in arms), flush=True)

    print("\nboth-regularizers fwd+bwd medians (ms):", flush=True)
    for n in arms:
        print(f"  {n:8s} {sorted(acc[n])[1]:8.2f}", flush=True)


if __name__ == "__main__":
    main()

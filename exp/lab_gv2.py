"""Decompose the REG_MXU group-variance cost (exp/lab_groupvar follow-up)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp

No, K, CX, REPS = 300_000, 8, 17, 10
RTT = 0.0
def fetch(o):
    return float(jnp.sum(jax.tree.leaves(o)[0].ravel()[:2].astype(jnp.float32)))
def T(name, fn, *a):
    out = fn(*a); _ = fetch(out)
    t0 = time.perf_counter()
    for _ in range(REPS): out = fn(*a)
    _ = fetch(out)
    print(f"{name:44s} {(time.perf_counter()-t0-RTT)/REPS*1e3:8.2f} ms", flush=True)

def main():
    global RTT
    print(f"backend: {jax.default_backend()}", flush=True)
    from adgs_tpu.train import losses
    tiny = jnp.ones((8, 8), jnp.float32)
    ft = jax.jit(lambda x: x + 1.0); _ = fetch(ft(tiny))
    t0 = time.perf_counter()
    for _ in range(10): _ = fetch(ft(tiny))
    RTT = (time.perf_counter() - t0) / 10
    print(f"RTT {RTT*1e3:.1f} ms", flush=True)

    rng = np.random.default_rng(0)
    A = No // K
    R = A * K
    vflat = jnp.asarray(rng.normal(size=(No, 3*CX)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, No, (A, K)), jnp.int32)
    dg = jnp.asarray(rng.normal(size=(A, K, 3*CX)).astype(np.float32))
    flat = idx.reshape(R).astype(jnp.int32)

    T("fwd gather [A,K,D]", jax.jit(lambda v: v[idx]), vflat)
    T("fwd gather flat [R,D]", jax.jit(lambda v: v[flat]), vflat)
    T("sort (flat ids + iota)", jax.jit(lambda f: jax.lax.sort(
        (f, jnp.arange(R, dtype=jnp.int32)), num_keys=1, is_stable=False)), flat)
    s, _ = jax.lax.sort((flat, jnp.arange(R, dtype=jnp.int32)), num_keys=1)
    T("searchsorted No over R", jax.jit(lambda ss: jnp.searchsorted(
        ss, jnp.arange(No, dtype=jnp.int32), side="left")), s)
    T("full _group_gather bwd", jax.jit(jax.grad(
        lambda v: jnp.sum(losses._group_gather(v, idx) * dg))), vflat)
    # segment reduce alone
    from adgs_tpu.raster.pallas.render import SEG_C, _round8, segment_reduce_contiguous
    D = 3*CX; Gc = _round8(D)
    R_seg = -(-R // SEG_C) * SEG_C + SEG_C
    cols = jnp.asarray(rng.normal(size=(Gc, R_seg)).astype(np.float32))
    gs = jnp.searchsorted(s, jnp.arange(No, dtype=jnp.int32), side="left").astype(jnp.int32)
    T("segment_reduce alone", jax.jit(
        lambda c: segment_reduce_contiguous(c, gs, jnp.int32(R), No)), cols)
    T("transpose [R_seg,Gc]->[Gc,R_seg]", jax.jit(lambda x: x.T.sum()),
      jnp.asarray(rng.normal(size=(R_seg, Gc)).astype(np.float32)))

if __name__ == "__main__":
    main()

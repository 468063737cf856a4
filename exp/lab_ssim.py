"""SSIM depthwise-conv vs shifted-add tier A/B on-chip, ABAB in one
process at KITTI frame size (fwd and fwd+bwd)."""
import os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp

H, W, K = 375, 1242, 10
RTT = 0.0
def fetch(o): return float(jnp.sum(jax.tree.leaves(o)[0].ravel()[:2]))
def chain(fn, *a):
    out = fn(*a); _ = fetch(out)
    t0 = time.perf_counter()
    for _ in range(K): out = fn(*a)
    _ = fetch(out)
    return (time.perf_counter() - t0 - RTT) / K * 1e3

def main():
    global RTT
    print("backend:", jax.default_backend(), flush=True)
    from adgs_tpu.ops import image as I
    tiny = jnp.ones((8, 8), jnp.float32)
    ft = jax.jit(lambda x: x + 1.0); _ = fetch(ft(tiny))
    t0 = time.perf_counter()
    for _ in range(10): _ = fetch(ft(tiny))
    RTT = (time.perf_counter() - t0) / 10
    print(f"RTT {RTT*1e3:.1f} ms", flush=True)
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(size=(3, H, W)).astype(np.float32))
    b = jnp.asarray(rng.uniform(size=(3, H, W)).astype(np.float32))
    arms = {}
    for name, sh in (("conv", False), ("shift", True)):
        I.SSIM_SHIFT = sh
        f = jax.jit(lambda x: I.ssim(x, b))
        g = jax.jit(jax.value_and_grad(lambda x: I.ssim(x, b)))
        _ = fetch(f(a)); _ = fetch(g(a))
        arms[name] = (f, g)
    I.SSIM_SHIFT = True
    v1, gr1 = arms["shift"][1](a)
    v0, gr0 = arms["conv"][1](a)
    rel = float(jnp.max(jnp.abs(gr1-gr0)))/(float(jnp.max(jnp.abs(gr0)))+1e-30)
    print(f"|dssim| {abs(float(v1)-float(v0)):.2e} grad rel {rel:.2e}", flush=True)
    acc = {}
    for rnd in range(3):
        for name, (f, g) in arms.items():
            acc.setdefault((name,"fwd"), []).append(chain(f, a))
            acc.setdefault((name,"fb"), []).append(chain(g, a))
    for name in arms:
        print(f"{name:6s} fwd {sorted(acc[(name,'fwd')])[1]:7.2f} ms   "
              f"fwd+bwd {sorted(acc[(name,'fb')])[1]:7.2f} ms", flush=True)

if __name__ == "__main__":
    main()

"""One-off: separate per-dispatch overhead from device compute on the
tunneled axon backend.  If chaining an op K times inside one jit costs ~the
same as 1x, the micro-bench numbers are dispatch-bound lies."""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    n = 7_000_000
    x = jnp.asarray(rng.integers(0, 2**31, size=n).astype(np.int32))

    def hard_sync(out):
        np.asarray(np.asarray(out).reshape(-1)[:4])

    def timeit(name, fn, *a, iters=16):
        out = fn(*a)
        hard_sync(out)
        out = fn(*a)
        hard_sync(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
        hard_sync(out)
        ms = (time.perf_counter() - t0) / iters * 1000
        print(f"{name:44s} {ms:8.2f} ms", flush=True)

    timeit("tiny: x[:128]+1", jax.jit(lambda a: a[:128] + 1), x)
    timeit("7M i32: x+1 (1 op)", jax.jit(lambda a: a + 1), x)

    def chain(k):
        def f(a):
            for _ in range(k):
                a = (a ^ 123) + 7
            return a
        return jax.jit(f)

    timeit("7M i32: 2 ops", chain(1), x)
    timeit("7M i32: 20 ops", chain(10), x)
    timeit("7M i32: 200 ops", chain(100), x)

    xf = x.astype(jnp.float32)
    timeit("7M f32: x*1.5+2 (2 ops)", jax.jit(lambda a: a * 1.5 + 2.0), xf)

    def fchain(k):
        def f(a):
            for _ in range(k):
                a = a * 1.000001 + 0.5
            return a
        return jax.jit(f)

    timeit("7M f32: 20 ops", fchain(10), xf)
    timeit("7M f32: 200 ops", fchain(100), xf)


if __name__ == "__main__":
    main()

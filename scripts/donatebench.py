"""One-off: can input donation / output feedback avoid the ~45ms
large-output program-boundary cost on the tunneled backend?"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=7_000_000).astype(np.float32))

    def hard_sync(out):
        np.asarray(np.asarray(out).reshape(-1)[:4])

    def timeit(name, fn, x, feedback=False, iters=16):
        out = fn(x)
        hard_sync(out)
        out = fn(x if not feedback else out)
        hard_sync(out)
        t0 = time.perf_counter()
        cur = out if feedback else x
        for _ in range(iters):
            cur2 = fn(cur)
            if feedback:
                cur = cur2
        hard_sync(cur2)
        ms = (time.perf_counter() - t0) / iters * 1000
        print(f"{name:46s} {ms:8.2f} ms", flush=True)

    f_plain = jax.jit(lambda a: a * 1.000001 + 0.5)
    f_donate = jax.jit(lambda a: a * 1.000001 + 0.5, donate_argnums=0)

    timeit("7M f32 x*c+d, fresh output each call", f_plain, x0)
    timeit("7M f32 x*c+d, feedback x=f(x)", f_plain, x0, feedback=True)
    x1 = jnp.asarray(rng.normal(size=7_000_000).astype(np.float32))
    timeit("7M f32 x*c+d, donated input", f_donate, x1, feedback=True)

    # multiple large outputs (like a scene-grad pytree)
    f_multi = jax.jit(lambda a: (a + 1, a * 2, a - 3, a * a))
    def g(a):
        return f_multi(a)[0]
    timeit("7M f32 -> 4 large outputs (112MB)", jax.jit(lambda a: f_multi(a)), x0)


if __name__ == "__main__":
    main()
